from . import aggregations, cleaning, joins, setops, windows

__all__ = ["aggregations", "cleaning", "joins", "setops", "windows"]
