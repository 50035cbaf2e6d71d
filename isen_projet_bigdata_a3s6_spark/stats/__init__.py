from . import descriptive, distributions, inference, regression

__all__ = ["descriptive", "distributions", "inference", "regression"]
