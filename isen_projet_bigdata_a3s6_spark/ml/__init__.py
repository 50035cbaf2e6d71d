from .pipeline import (
    confusion_matrix,
    fit_logistic,
    fit_multiple_ols,
    score_and_filter,
)

__all__ = [
    "confusion_matrix",
    "fit_logistic",
    "fit_multiple_ols",
    "score_and_filter",
]
