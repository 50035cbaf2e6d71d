from . import report_queries
from .trees_pipeline import clean_trees, trees_fixture

__all__ = ["clean_trees", "report_queries", "trees_fixture"]
