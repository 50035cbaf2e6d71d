"""Join operators (SURVEY §2.4 J1-J3, §2.10 G3).

Reference joins: left equi-joins of a table against its own tiny aggregate
(R_groupe4.R:200-203, 630-631, 681-682, 723-724) and a 1-nearest-neighbor
spatial join used for imputation (R_groupe4.R:110-142 — an O(n·m)
interpreted loop there; here a broadcast cross join + ``min_by``, and a
grid-bucketed variant for the 100 TB path).

The engine otherwise exposes Spark's full join surface
(inner/left/right/full/semi/anti/cross) directly via ``df.join``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import euclidean_distance


def decorate_with_group_agg(
    df: DataFrame, agg_df: DataFrame, on: str | list[str], how: str = "left"
) -> DataFrame:
    """J1/J2: attach a per-group aggregate back onto the fact table.
    The aggregate side is |groups| rows → broadcast hash join, no shuffle
    of the fact side."""
    return df.join(F.broadcast(agg_df), on, how)


def knn_join_1nn(
    probes: DataFrame,
    known: DataFrame,
    probe_id: str,
    probe_coords: tuple[str, str],
    known_coords: tuple[str, str],
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """J3/G3: for each probe row, the payload of the Euclidean-nearest known
    row (reference: per-row distance scan + ``which.min``,
    R_groupe4.R:110-142).

    Physical plan: broadcast-nested-loop of the (small) known side against
    probes, then a single ``min_by`` aggregate per probe — no shuffle of the
    probe side beyond the final per-probe aggregation. Correct whenever the
    known side fits in a broadcast (the reference's case: ≤10⁴ rows).
    For big×big, use :func:`knn_join_1nn_grid`.

    Ties on distance break on ``tiebreak`` (ascending) for determinism —
    the reference's ``which.min`` keeps the first index, an ingest-order
    artifact we pin explicitly instead.
    """
    px, py = probe_coords
    kx, ky = known_coords
    k = known.select(
        F.col(kx).alias("__kx"),
        F.col(ky).alias("__ky"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        *( [F.col(tiebreak).alias("__tb")] if tiebreak else [] ),
    )
    dist = euclidean_distance(F.col(px), F.col(py), F.col("__kx"), F.col("__ky"))
    # the cross join multiplies per-row work by |known| — spread probes over
    # all cores first (single-row-group inputs otherwise scan as ONE task)
    par = probes.sparkSession.sparkContext.defaultParallelism
    joined = (
        probes.repartition(par)
        .join(F.broadcast(k), how="cross")
        .withColumn("__dist", dist)
    )
    order = F.struct(
        *( [F.col("__dist"), F.col("__tb")] if tiebreak else [F.col("__dist")] )
    )
    pay = F.struct(*[F.col(f"__p_{c}") for c in payload_cols])
    first_probe_cols = [c for c in probes.columns]
    best = joined.groupBy(probe_id).agg(
        F.min_by(pay, order).alias("__best"),
        *[
            F.first(c).alias(c)
            for c in first_probe_cols
            if c != probe_id
        ],
    )
    out = best.select(
        *first_probe_cols,
        *[F.col(f"__best.__p_{c}").alias(c) for c in payload_cols],
    )
    return out


def knn_join_1nn_grid(
    probes: DataFrame,
    known: DataFrame,
    probe_id: str,
    probe_coords: tuple[str, str],
    known_coords: tuple[str, str],
    payload_cols: list[str],
    cell_size: float,
    tiebreak: str | None = None,
) -> DataFrame:
    """J3 at scale: grid-bucketed 1-NN — bucket both sides into cells of
    ``cell_size``, equi-join each probe cell against its 3×3 neighborhood,
    take per-probe min_by. Turns the cross join into an equi-join keyed on
    cell id (shuffle both sides on the cell key; no broadcast needed).

    Correct when the true nearest neighbor is within one cell of the probe
    (pick ``cell_size`` ≥ max expected NN distance); callers needing a
    guarantee re-run the residual probes with a doubled cell size.
    """
    px, py = probe_coords
    kx, ky = known_coords

    def cell(c: Column, size: float) -> Column:
        return F.floor(c / F.lit(size)).cast("long")

    k = known.select(
        F.col(kx).alias("__kx"),
        F.col(ky).alias("__ky"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
        *( [F.col(tiebreak).alias("__tb")] if tiebreak else [] ),
    ).withColumns({"__kcx": cell(F.col("__kx"), cell_size), "__kcy": cell(F.col("__ky"), cell_size)})

    # each known row is replicated into its 3x3 neighborhood so the probe
    # side joins on its own cell only (replicate the smaller side)
    offsets = F.expr("explode(arrays_zip(array(-1,-1,-1,0,0,0,1,1,1), array(-1,0,1,-1,0,1,-1,0,1)))")
    k_rep = k.select("*", offsets.alias("__o")).withColumns(
        {
            "__jcx": F.col("__kcx") + F.col("__o.0"),
            "__jcy": F.col("__kcy") + F.col("__o.1"),
        }
    ).drop("__o", "__kcx", "__kcy")

    p = probes.withColumns(
        {"__jcx": cell(F.col(px), cell_size), "__jcy": cell(F.col(py), cell_size)}
    )
    joined = p.join(k_rep, ["__jcx", "__jcy"], "inner").withColumn(
        "__dist", euclidean_distance(F.col(px), F.col(py), F.col("__kx"), F.col("__ky"))
    )
    order = F.struct(
        *( [F.col("__dist"), F.col("__tb")] if tiebreak else [F.col("__dist")] )
    )
    pay = F.struct(*[F.col(f"__p_{c}") for c in payload_cols])
    probe_cols = [c for c in probes.columns]
    best = joined.groupBy(probe_id).agg(
        F.min_by(pay, order).alias("__best"),
        *[F.first(c).alias(c) for c in probe_cols if c != probe_id],
    )
    return best.select(
        *probe_cols,
        *[F.col(f"__best.__p_{c}").alias(c) for c in payload_cols],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """As-of join (most recent right row at-or-before each left row, per key).
    Not in the reference; standard engine surface. Composition: union both
    sides tagged, one window sort per key carries the last right payload
    forward — one shuffle, no range explosion.
    """
    from pyspark.sql import Window as W

    l = left.withColumn("__side", F.lit(1)).withColumn("__t", F.col(left_time))
    r = (
        right.select(on, right_time, *payload_cols)
        .withColumn("__side", F.lit(0))
        .withColumn("__t", F.col(right_time))
    )
    lp = l.select(
        on, "__t", "__side",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__pay_{c}") for c in payload_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    rp = r.select(
        on, "__t", "__side",
        *[F.col(c).alias(f"__pay_{c}") for c in payload_cols],
        F.lit(None).cast(lp.schema["__row"].dataType).alias("__row"),
    )
    u = lp.unionByName(rp)
    w = W.partitionBy(on).orderBy(F.col("__t").asc(), F.col("__side").asc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    filled = u.withColumns(
        {f"__pay_{c}": F.last(f"__pay_{c}", ignorenulls=True).over(w) for c in payload_cols}
    )
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns],
        *[F.col(f"__pay_{c}").alias(c) for c in payload_cols],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: salt the (big, skewed) left side into
    ``salt_buckets`` sub-keys and replicate the right side across buckets,
    then join on (key, salt). Turns one hot key's single straggler task into
    ``salt_buckets`` parallel tasks.

    AQE's skew-join splitting (enabled in the session factory) handles most
    cases automatically; explicit salting is for deterministic layouts or
    non-AQE engines. Replication factor = salt_buckets on the right side —
    keep it small and the right side the smaller input.
    """
    salted_l = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_r = right.join(
        F.broadcast(
            left.sparkSession.range(salt_buckets).select(
                F.col("id").cast("int").alias("__salt")
            )
        ),
        how="cross",
    )
    out = salted_l.join(salted_r, [on, "__salt"], how)
    return out.drop("__salt")


def knn_join_1nn_grid_exact(
    probes: DataFrame,
    known: DataFrame,
    probe_id: str,
    probe_coords: tuple[str, str],
    known_coords: tuple[str, str],
    payload_cols: list[str],
    cell_size: float,
    tiebreak: str | None = None,
    max_rounds: int = 8,
) -> DataFrame:
    """Exact big×big 1-NN: grid-bucketed rounds with doubling cell size.

    A 3×3-neighborhood candidate is provably the true NN only if its
    distance ≤ cell_size (anything outside the neighborhood is > cell_size
    away). Round k resolves the probes that pass that certificate; the
    residual probes re-run with cell_size×2. Every round is a pure
    equi-join — no cross join at any scale; typical data resolves ≥99% of
    probes in round 1.
    """
    px, py = probe_coords
    kx, ky = known_coords
    from ..functions.scalar import euclidean_distance

    resolved_parts: list[DataFrame] = []
    remaining = probes
    size = cell_size
    for _round in range(max_rounds):
        cand = knn_join_1nn_grid(
            remaining, known, probe_id, probe_coords, known_coords,
            payload_cols=[*payload_cols, kx, ky],
            cell_size=size, tiebreak=tiebreak,
        ).withColumn(
            "__d", euclidean_distance(F.col(px), F.col(py), F.col(kx), F.col(ky))
        )
        certified = cand.filter(F.col("__d") <= F.lit(size)).drop("__d", kx, ky)
        resolved_parts.append(certified)
        unresolved = cand.filter(F.col("__d") > F.lit(size)).select(probe_id)
        no_cand = remaining.join(cand.select(probe_id), probe_id, "left_anti").select(probe_id)
        # checkpoint per round: the residual plan would otherwise nest the
        # whole previous round's join and recompute it every iteration
        remaining = (
            remaining.join(
                unresolved.unionByName(no_cand).distinct(), probe_id, "left_semi"
            ).localCheckpoint(eager=True)
        )
        size *= 2.0
        if remaining.limit(1).count() == 0:
            break
    out = resolved_parts[0]
    for part in resolved_parts[1:]:
        out = out.unionByName(part)
    return out
