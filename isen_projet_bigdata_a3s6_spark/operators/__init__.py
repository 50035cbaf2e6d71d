from . import aggregations, cleaning, joins, merge, setops, windows

__all__ = ["aggregations", "cleaning", "joins", "merge", "setops", "windows"]
