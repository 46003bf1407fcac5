from .generator import Generator, GestureStream

__all__ = ["Generator", "GestureStream"]
