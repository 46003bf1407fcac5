from . import pivots, quaternions, rotation
from .scaler import StandardScaler

__all__ = ["pivots", "quaternions", "rotation", "StandardScaler"]
