from . import dedup, geo, scalar, similarity, text

__all__ = ["dedup", "geo", "scalar", "similarity", "text"]
