from .json_config import JsonConfig
from .parsing import parse_steps
from .rng import RngStream

__all__ = ["JsonConfig", "parse_steps", "RngStream"]
