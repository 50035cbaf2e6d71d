"""Grouped-aggregate pandas UDFs (UDAF surface, SURVEY §2.12).

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers
the UDAF shape from REAL type hints (``pd.Series -> scalar``); stringified
annotations break the inference.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geo_mean(v: pd.Series) -> float:
    """Geometric mean of a positive series — one vectorized numpy
    reduction per group (Arrow-shipped)."""
    return float(np.exp(np.log(v.to_numpy()).mean()))
