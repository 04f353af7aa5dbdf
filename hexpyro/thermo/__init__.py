from . import nasa7

__all__ = ["nasa7"]
