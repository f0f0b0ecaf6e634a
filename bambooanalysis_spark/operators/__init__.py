from . import collections as ops

__all__ = ["ops"]
