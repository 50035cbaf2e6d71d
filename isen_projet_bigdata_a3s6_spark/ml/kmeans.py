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


def _sqdist_to_literal(vec_col: str | Column, center: list[float]) -> Column:
    """Σ (x_i − c_i)² as the canonical left fold (bit-identical to the SQL
    twin's list_reduce — 0.0-init vs first-element-init differ only in the
    sign of zero, unobservable through >=/argmin). No query-path caller:
    ``_assign_cell`` and ``kmeans_lloyd_blocks`` inline the same fold over
    nested centroid literals; this single-centroid form is kept as the
    reference expression the inertia cross-check test
    (tests/test_round9_kmeans.py) evaluates independently of them."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    arr = F.array(*[F.lit(float(c)) for c in center])
    return F.aggregate(
        F.zip_with(
            vec, arr,
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
    the minimum distance (ties → lowest cell), 0-based int.

    The k distances are a data-driven ``transform`` over ONE nested
    literal array, not k unrolled fold expressions over k·dim scalar
    literals — the unrolled form cost more in py4j literal construction
    and Catalyst/codegen compile per round than the aggregate cost to run
    (the kmeans_lloyd_blocks lesson; q70 built 512 scalar literals per
    round). The fold evaluates the identical zip_with (x−c)² and
    0.0-seeded left fold on the same double values, so assignments are
    bit-equal to the unrolled form. The distance array binds once as a
    lambda variable (the q202 pattern) so argmin doesn't re-evaluate it."""
    cb = F.lit([[float(x) for x in c] for c in cents])  # k × dim, ONE literal
    vec = F.col(vec_col)
    darr = F.transform(
        cb,
        lambda c: F.aggregate(
            F.zip_with(
                vec, c,
                lambda x, cc: (x.cast("double") - cc) * (x.cast("double") - cc),
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )
    return F.element_at(
        F.transform(
            F.array(darr),
            lambda d: (F.array_position(d, F.array_min(d)) - 1).cast("int"),
        ),
        1,
    )


def kmeans_lloyd_blocks(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int,
    n_blocks: int,
    dsub: int,
) -> list[list[list[float]]] | None:
    """Train ``n_blocks`` independent per-subspace Lloyd codebooks (block m
    reads dims [m·dsub, (m+1)·dsub)) in ONE distributed aggregate per round
    instead of one per (block, round) — bit-identical to calling
    :func:`kmeans_lloyd` once per sliced subspace, proven term-by-term:

    - seeds: the k lowest-id vectors are the same rows for every block
      (the per-block call orders the SAME ids), so block seeds are slices
      of one seed collect;
    - assignment: each block's distances fold over ``slice(vec, m·dsub+1,
      dsub)`` against its own centroid literals — the identical
      expressions the per-block call evaluates on its pre-sliced column;
    - update: addends are ``ROUND(vec[m·dsub+i], 9)`` cast to
      DECIMAL(38,9), summed per (block, cell) group — same multiset of
      addends per group as the per-block groupBy, and decimal sums are
      order-independent, so the means are bit-equal;
    - early stop: a block whose centroids reproduce is in a fixed point —
      its further rounds are the identity — so iterating converged blocks
      until ALL converge (or ``iters`` runs out) returns the exact
      per-block-stopped state.

    Why it exists: PQ training (q207) runs n_blocks=8 codebooks; the
    per-block loop costs 8×iters sequential driver-coordinated jobs whose
    scheduling dominates wall clock at every SF (the q274 lesson). This
    shape is 8× fewer barriers — the difference between ~88 and ~11
    round-trips on a 1000-executor cluster, with the same k·(dim+1)
    bounded collect per round. Returns codebooks[m][cell][i]; None on
    empty input (empty-in/empty-out)."""
    base = df.select(F.col(id_col), F.col(vec_col))
    seed_rows = base.orderBy(F.col(id_col).asc()).limit(k).collect()
    if not seed_rows:
        return None
    full = [[float(x) for x in r[vec_col]] for r in seed_rows]
    while len(full) < k:  # corpus smaller than k: duplicate last seed
        full.append(list(full[-1]))
    cents: list[list[list[float]]] = [
        [s[m * dsub : (m + 1) * dsub] for s in full] for m in range(n_blocks)
    ]
    proj = base.persist()
    try:
        for _ in range(iters):
            prev = [[list(c) for c in cm] for cm in cents]
            # One NESTED-LITERAL codebook array + data-driven folds instead
            # of n_blocks·k unrolled distance expressions: the unrolled
            # round plan costs more in Catalyst/codegen COMPILE than the
            # 250-row aggregate costs to run (measured: 8×16 unrolled folds
            # ≈ 4 s/round at sf0.001, compile-bound). The transform fold
            # evaluates the IDENTICAL arithmetic — same zip_with (x−c)²,
            # same 0.0-seeded left fold, same values from the literal
            # array — so assignments stay bit-equal to the unrolled form.
            cb_lit = F.lit(cents)  # n_blocks × k × dsub doubles, ONE literal

            def _dists(m):
                # k distances of this row's m-th subvector to block m's
                # centroids — same zip_with (x−c)² and 0.0-seeded left fold
                # as _sqdist_to_literal, values from the literal array
                return F.transform(
                    F.element_at(cb_lit, m + 1),
                    lambda c: F.aggregate(
                        F.zip_with(
                            F.slice(F.col("__v"), m * dsub + 1, dsub),
                            c,
                            lambda x, cc: (x.cast("double") - cc)
                            * (x.cast("double") - cc),
                        ),
                        F.lit(0.0),
                        lambda acc, d: acc + d,
                    ),
                )

            mc_arr = F.transform(
                F.sequence(F.lit(0), F.lit(n_blocks - 1)),
                lambda m: F.struct(
                    m.cast("int").alias("m"),
                    # bind the distance array ONCE as a lambda variable
                    # (the q202 pattern) so argmin doesn't re-evaluate it
                    F.element_at(
                        F.transform(
                            F.array(_dists(m)),
                            lambda d: (
                                F.array_position(d, F.array_min(d)) - 1
                            ).cast("int"),
                        ),
                        1,
                    ).alias("cell"),
                ),
            )
            ex = proj.select(F.col(vec_col).alias("__v")).select(
                "__v", F.explode(mc_arr).alias("mc")
            )
            aggs = [F.count(F.lit(1)).alias("cnt")]
            for i in range(dsub):
                idx = F.col("mc.m") * dsub + (i + 1)  # element_at is 1-based
                aggs.append(
                    F.sum(
                        F.round(
                            F.element_at(F.col("__v"), idx).cast("double"), 9
                        ).cast("decimal(38,9)")
                    ).alias(f"s_{i}")
                )
            rows = (
                ex.groupBy(
                    F.col("mc.m").alias("__m"), F.col("mc.cell").alias("__cell")
                )
                .agg(*aggs)
                .collect()
            )
            by_key = {(r["__m"], r["__cell"]): r for r in rows}
            for m in range(n_blocks):
                new_cm = []
                for c in range(k):
                    r = by_key.get((m, c))
                    if r is None or not r["cnt"]:
                        new_cm.append(list(cents[m][c]))  # empty: keep previous
                    else:
                        cnt = float(r["cnt"])
                        new_cm.append(
                            [float(r[f"s_{i}"]) / cnt for i in range(dsub)]
                        )
                cents[m] = new_cm
            if all(_cents_equal(cents[m], prev[m]) for m in range(n_blocks)):
                break
        return cents
    finally:
        proj.unpersist()


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
