from . import hashing, maps, text

__all__ = ["hashing", "maps", "text"]
