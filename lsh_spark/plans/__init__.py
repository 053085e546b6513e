from .cache import release_intermediates, track
from .session import get_spark

__all__ = ["get_spark", "release_intermediates", "track"]
