"""PySpark-native analytics engine with the query/data-processing surface of
arthur5775/ISEN_projet_BigData_A3S6 (reference: a single R analytics script,
``R_groupe4.R``), re-expressed Spark-first.

Layout
------
- ``session``      SparkSession factory tuned for local[32] and 100 TB posture
- ``sources``      scans (parquet/CSV/JSON/binary) and sinks
- ``operators``    relational operators: cleaning, projection, filters,
                   joins (incl. 1-NN spatial), aggregations, windows, set ops
- ``functions``    scalar/column function library: strings, geo (CRS), text
                   analysis, dedup (exact/MinHash/SimHash), similarity search
- ``stats``        statistics-as-aggregation: cov/corr matrices, chi-square,
                   ANOVA, closed-form OLS + p-value special functions
- ``ml``           Spark ML wrappers (multiple OLS w/ inference, logistic)
- ``plans``        the reference's six-part pipeline over a ``trees`` table
- ``streaming``    event-time windows (tumbling/sliding/session) + streaming
- ``multimodal``   binary image/audio columns: schema + batch plumbing (stubs)

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join strategy and AQE; Python UDFs appear only where Spark has no builtin
(CRS reprojection) and then only as Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
