"""Deterministic fixed-round Lloyd KMeans (q69/q70's oracle-checkable
twin; r09).

Spark ML's KMeans (k-means|| init, engine-internal float reduction order)
can never hash across engines. This module runs Lloyd's algorithm as a
FIXED number of one-pass aggregations with every cross-engine float hazard
removed:

- init: the k lowest-id vectors (deterministic by contract; the quality
  init for production stays k-means|| via Spark ML — this operator's point
  is the verifiable pipeline shape);
- assignment: squared-euclidean distance as the same left-fold expression
  on both engines — raw float32 elements widen to double exactly and the
  centroid doubles are bit-equal by construction, so distances and
  arg-min assignments (ties → lowest cell) are IDENTICAL;
- update: per-dimension means over ROUND9-QUANTIZED elements summed in
  DECIMAL(38,9) — order-independent and, verified on the full embeddings
  fixture, bit-equal across engines (the bare float→decimal cast is NOT:
  Spark and DuckDB round differently at scale 18; per-element
  round-then-cast is the parity-safe route) — divided once in doubles.
  Empty clusters keep their previous centroid.

Per round ONE distributed aggregate (k·(dim+1) cells to the driver — the
bounded-collect contract) — the standard scalable Lloyd shape; the DuckDB
twin unrolls rounds as materialized CTEs with the decimal sums routed
through VARCHAR before the double cast (the repo's decimal→double
convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sqdist_to_literal(vec_col: str, center: list[float]) -> Column:
    """Σ (x_i − c_i)² as the canonical left fold (bit-identical to the SQL
    twin's list_reduce — 0.0-init vs first-element-init differ only in the
    sign of zero, unobservable through >=/argmin)."""
    arr = F.array(*[F.lit(float(c)) for c in center])
    return F.aggregate(
        F.zip_with(
            F.col(vec_col), arr,
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int = 10,
    dim: int = 64,
) -> tuple[DataFrame, list[list[float]]] | None:
    """Returns (assigned, centroids) where assigned = df columns +
    ``cell`` (int) under the FINAL centroids, and centroids is the k×dim
    list. None on empty input (EMPTY-IN/EMPTY-OUT)."""
    base = df.select(F.col(id_col), F.col(vec_col))
    seed_rows = base.orderBy(F.col(id_col).asc()).limit(k).collect()
    if not seed_rows:
        return None
    cents = [[float(x) for x in r[vec_col]] for r in seed_rows]
    while len(cents) < k:  # corpus smaller than k: duplicate last seed
        cents.append(list(cents[-1]))
    proj = base.persist()
    try:
        for _ in range(iters):
            prev_cents = cents
            cell = _assign_cell(vec_col, cents)
            aggs = [F.count(F.lit(1)).alias("cnt")]
            for i in range(dim):
                aggs.append(
                    F.sum(
                        F.round(F.col(vec_col)[i].cast("double"), 9).cast(
                            "decimal(38,9)"
                        )
                    ).alias(f"s_{i}")
                )
            rows = proj.withColumn("__cell", cell).groupBy("__cell").agg(*aggs).collect()
            by_cell = {r["__cell"]: r for r in rows}
            new_cents = []
            for c in range(k):
                r = by_cell.get(c)
                if r is None or not r["cnt"]:
                    new_cents.append(list(cents[c]))  # empty: keep previous
                else:
                    cnt = float(r["cnt"])
                    new_cents.append(
                        [float(r[f"s_{i}"]) / cnt for i in range(dim)]
                    )
            cents = new_cents
            # fixed-point early stop (r09 verdict item 4): centroids are a
            # pure function of the previous centroids, so once a round
            # reproduces its input EXACTLY (sign-strict — a -0.0/+0.0 swap
            # would change the returned literals), every remaining round
            # is the identity and stopping is bit-identical to running all
            # ``iters``. The unrolled SQL oracle runs its full depth and
            # converges to the same state, so parity is unaffected.
            if _cents_equal(cents, prev_cents):
                break
        assigned = df.withColumn("cell", _assign_cell(vec_col, cents))
        return assigned, cents
    finally:
        proj.unpersist()


def _cents_equal(a: list[list[float]], b: list[list[float]]) -> bool:
    """Bitwise float equality including the sign of zero (−0.0 == 0.0 is
    True in Python, but they are different literals downstream)."""
    import math

    return all(
        x == y and math.copysign(1.0, x) == math.copysign(1.0, y)
        for ca, cb in zip(a, b)
        for x, y in zip(ca, cb)
    )


def _assign_cell(vec_col: str, cents: list[list[float]]) -> Column:
    """Arg-min cell under the current centroid literals: first position of
    the minimum distance (ties → lowest cell), 0-based int."""
    darr = F.array(*[_sqdist_to_literal(vec_col, c) for c in cents])
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def kmeans_lloyd_ctes(
    table: str,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 10,
    dim: int = 64,
    prefix: str = "",
) -> tuple[list[str], str, str]:
    """DuckDB CTE chain replaying :func:`kmeans_lloyd`. Returns
    (ctes, final_centroid_cte, final_assign_cte): the centroid CTE has
    (cell, c DOUBLE[]); the assign CTE has (vid, v, cell). ``vec_col``
    may be any list-valued SQL expression (q207 passes slices);
    ``prefix`` namespaces the CTEs so several chains coexist in one
    WITH (q207 trains 8 codebooks)."""
    sq = (
        f"list_reduce(list_transform(range(1, {dim + 1}), i ->"
        f" (CAST(v[i] AS DOUBLE) - c[i]) * (CAST(v[i] AS DOUBLE) - c[i])),"
        " (a, b) -> a + b)"
    )
    sums = ", ".join(
        f"SUM(CAST(ROUND(CAST(v[{i + 1}] AS DOUBLE), 9) AS DECIMAL(38,9)))"
        f" AS s_{i}"
        for i in range(dim)
    )
    mean_list = ", ".join(
        f"CAST(CAST(s_{i} AS VARCHAR) AS DOUBLE) / cnt" for i in range(dim)
    )
    ctes = [
        f"{prefix}vecs AS MATERIALIZED (SELECT {id_col} AS vid,"
        f" {vec_col} AS v FROM {table})",
        # init: the k lowest-id vectors, cell = dense 0-based rank
        f"{prefix}cent0 AS MATERIALIZED (SELECT CAST(ROW_NUMBER() OVER (ORDER BY vid)"
        " AS INT) - 1 AS cell, CAST(v AS DOUBLE[]) AS c"
        f" FROM (SELECT vid, v FROM {prefix}vecs ORDER BY vid LIMIT {k}) s)",
    ]
    prev = f"{prefix}cent0"
    for t in range(1, iters + 1):
        asg = (
            f"{prefix}asg{t} AS MATERIALIZED (SELECT vid, v, cell FROM ("
            f"SELECT {prefix}vecs.vid, {prefix}vecs.v, {prev}.cell,"
            f" ROW_NUMBER() OVER (PARTITION BY {prefix}vecs.vid"
            f" ORDER BY {sq}, {prev}.cell) AS rn"
            f" FROM {prefix}vecs CROSS JOIN {prev}) x WHERE rn = 1)"
        )
        upd = (
            f"{prefix}sums{t} AS MATERIALIZED (SELECT cell, COUNT(*) AS cnt, {sums}"
            f" FROM {prefix}asg{t} GROUP BY cell)"
        )
        cent = (
            f"{prefix}cent{t} AS MATERIALIZED (SELECT p.cell,"
            f" CASE WHEN s.cnt IS NOT NULL AND s.cnt > 0"
            f" THEN [{mean_list}] ELSE p.c END AS c"
            f" FROM {prev} p LEFT JOIN {prefix}sums{t} s ON s.cell = p.cell)"
        )
        ctes.extend([asg, upd, cent])
        prev = f"{prefix}cent{t}"
    final_asg = (
        f"{prefix}asgF AS MATERIALIZED (SELECT vid, v, cell FROM ("
        f"SELECT {prefix}vecs.vid, {prefix}vecs.v, {prev}.cell,"
        f" ROW_NUMBER() OVER (PARTITION BY {prefix}vecs.vid"
        f" ORDER BY {sq}, {prev}.cell) AS rn"
        f" FROM {prefix}vecs CROSS JOIN {prev}) x WHERE rn = 1)"
    )
    ctes.append(final_asg)
    return ctes, prev, f"{prefix}asgF"
