from . import rotation
from .scaler import StandardScaler

__all__ = ["rotation", "StandardScaler"]
