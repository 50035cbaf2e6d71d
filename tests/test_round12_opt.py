"""Round-12 optimization pins.

Every optimization this round must leave declared query results identical;
these tests pin the equivalence arguments at the operator level:

- q218's Arrow per-cluster scorer (functions/similarity.py::
  cluster_pair_scores) against the JVM zip_with/aggregate fold it replaced,
  on clusters that exercise every edge the fold handles (zero-norm vectors,
  NaN elements, NULL elements, ragged lengths, duplicate ids, NULL labels);
- q202's once-per-doc codepoint-array gram hashing against the old per-gram
  ascii(substr(...)) arithmetic, including supplementary-plane codepoints;
- q202's least()-based window minimum against array_min(slice(...)).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.functions.similarity import (
    cluster_pair_scores,
    dot,
    norm,
)


def _fold_pairs(e):
    """The exact pre-r12 q218 pair pipeline (per-pair JVM fold)."""
    ee = e.withColumn("nrm", norm(F.col("v")))
    a = ee.select(
        F.col("vec_id").alias("u"),
        F.col("label").alias("label_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = ee.select(
        "vec_id", "label", F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        a.join(
            b,
            (F.col("label_a") == F.col("label")) & (F.col("u") < F.col("vec_id")),
        )
        .select(
            "vec_id",
            "label",
            "u",
            F.try_divide(
                dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")
            ).alias("score_raw"),
        )
    )


def _collect_scores(df):
    rows = df.collect()
    out = {}
    for r in rows:
        key = (r["vec_id"], r["label"], r["u"])
        v = r["score_raw"]
        # NaN keys can't compare; keep as float('nan') marker
        out[key] = v
    return out


def test_cluster_pair_scores_bitwise_vs_fold(spark):
    nan, inf = float("nan"), float("inf")
    rows = [
        # ordinary cluster
        (1, 0, [1.0, 2.0, 3.0]),
        (2, 0, [1.0, 2.0, 3.0000001]),
        (3, 0, [-1.0, 0.5, 0.25]),
        # zero-norm vector: try_divide -> NULL against every partner
        (4, 0, [0.0, 0.0, 0.0]),
        # NaN element: score NaN (kept by the engine's >= as largest)
        (5, 0, [nan, 1.0, 1.0]),
        # inf element: inf/inf -> NaN, finite/inf -> 0-ish
        (6, 0, [inf, 1.0, 1.0]),
        # ragged length: every cross-length pair NULL-pads -> never survives
        (7, 0, [1.0, 2.0]),
        (8, 0, [2.0, 1.0]),
        # NULL element: dot/norm NULL against every partner
        (9, 0, [1.0, None, 2.0]),
        # second cluster
        (10, 1, [1.0, 0.0, 0.0]),
        (11, 1, [0.70710678, 0.70710678, 0.0]),
        # NULL label: the fold's equi-join never matches NULL = NULL
        (12, None, [1.0, 1.0, 1.0]),
        (13, None, [1.0, 1.0, 1.0]),
        # NULL vector
        (14, 1, None),
    ]
    e = spark.createDataFrame(
        rows, "vec_id long, label int, v array<double>"
    )
    old = _collect_scores(_fold_pairs(e))
    new = _collect_scores(cluster_pair_scores(e, "vec_id", "label", "v"))

    # the fold emits NULL-score rows for null-element/ragged/zero-norm
    # pairs; the scorer drops what can never survive the caller's filter —
    # compare on the survivable set (non-NULL scores) plus explicit checks
    old_nonnull = {k: v for k, v in old.items() if v is not None}
    new_nonnull = {k: v for k, v in new.items() if v is not None}
    assert set(old_nonnull) == set(new_nonnull)
    for k, v in old_nonnull.items():
        w = new_nonnull[k]
        if math.isnan(v):
            assert math.isnan(w), k
        else:
            # bitwise: same IEEE double, including signed zero
            assert v == w and math.copysign(1.0, v) == math.copysign(1.0, w), (
                k, v.hex(), w.hex(),
            )
    # and the scorer's extra rows (if any) must all be NULL-score
    assert all(v is None for k, v in new.items() if k not in old_nonnull)
    # NULL-label / NULL-vector rows never pair on either side
    assert not any(k[1] is None for k in old)
    assert not any(k[1] is None for k in new)


def test_cluster_pair_scores_duplicate_ids_never_self_pair(spark):
    e = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (1, 0, [0.0, 1.0]), (2, 0, [1.0, 1.0])],
        "vec_id long, label int, v array<double>",
    )
    new = _collect_scores(cluster_pair_scores(e, "vec_id", "label", "v"))
    old = _collect_scores(_fold_pairs(e))
    assert set(new) == set(old)
    assert all(k[2] < k[0] for k in new)  # strict u < vec_id


def test_cluster_pair_scores_prefilter_is_conservative(spark):
    # scores straddling the q218 boundary: the 0.299999 prefilter must keep
    # everything the engine-side round6 >= 0.30 keeps
    import numpy as np

    rows = []
    base = np.array([1.0, 0.0])
    for i, target in enumerate(
        [0.29, 0.2999990, 0.2999994, 0.2999996, 0.30, 0.31, 0.9]
    ):
        th = math.acos(target)
        rows.append((100 + i, 0, [math.cos(0.0), 0.0]))
        rows.append((200 + i, 0, [math.cos(th), math.sin(th)]))
    e = spark.createDataFrame(rows, "vec_id long, label int, v array<double>")
    full = cluster_pair_scores(e, "vec_id", "label", "v")
    pre = cluster_pair_scores(e, "vec_id", "label", "v", prefilter=0.299999)

    def survivors(df):
        return sorted(
            (r["u"], r["vec_id"])
            for r in df.select(
                "u", "vec_id", F.round("score_raw", 6).alias("s")
            )
            .filter(F.col("s") >= 0.30)
            .collect()
        )

    assert survivors(full) == survivors(pre)
    assert len(survivors(full)) > 0


def test_cluster_pair_scores_block_rows_invariant(spark):
    # block-chunked accumulation must emit the identical pair set
    import random

    rng = random.Random(7)
    rows = [
        (i, i % 2, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    e = spark.createDataFrame(rows, "vec_id long, label int, v array<double>")
    a = _collect_scores(cluster_pair_scores(e, "vec_id", "label", "v"))
    b = _collect_scores(
        cluster_pair_scores(e, "vec_id", "label", "v", block_rows=7)
    )
    assert set(a) == set(b)
    for k in a:
        x, y = a[k], b[k]
        assert (x is None and y is None) or x == y or (
            math.isnan(x) and math.isnan(y)
        )


# --------------------------------------------------------------------------
# q202 winnowing arithmetic equivalences
# --------------------------------------------------------------------------

_PW = [1, 31, 961, 29791, 923521]


def _old_hashes():
    gram = lambda i: (  # noqa: E731
        sum(
            F.ascii(F.col("__t").substr(i + F.lit(j), F.lit(1))).cast("long")
            * F.lit(_PW[j])
            for j in range(5)
        )
        % F.lit(1000003)
    )
    return F.transform(F.sequence(F.lit(1), F.col("__n") - 4), gram)


def _new_hashes():
    cps = F.transform(F.split(F.col("__t"), ""), lambda c: F.ascii(c).cast("long"))
    gram = lambda cp, i: (  # noqa: E731
        sum(F.element_at(cp, i + F.lit(j)) * F.lit(_PW[j]) for j in range(5))
        % F.lit(1000003)
    )
    return F.flatten(
        F.transform(
            F.array(cps),
            lambda cp: F.transform(
                F.sequence(F.lit(1), F.col("__n") - 4),
                lambda i: gram(cp, i),
            ),
        )
    )


@pytest.mark.parametrize(
    "text",
    [
        "the quick brown fox jumps over the lazy dog",
        "abcdefgh",
        "a\U0010FFFFbcdefghé中文 winnowing",  # supplementary + BMP
        "\t mixed   WS\nand\x0bpunct!?",
        "aaaaaaaaaaaaaaaa",
    ],
)
def test_winnowing_codepoint_array_matches_substr(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    t = F.lower(F.col("text"))
    base = df.select(t.alias("__t"), F.length(t).alias("__n")).filter(
        F.col("__n") >= 8
    )
    row = base.select(
        _old_hashes().alias("oh"), _new_hashes().alias("nh")
    ).collect()
    assert len(row) == 1
    assert row[0]["oh"] == row[0]["nh"]


def test_winnowing_window_min_least_matches_array_min_slice(spark):
    df = spark.createDataFrame(
        [("sometext here with enough characters to window",)], "text string"
    )
    t = F.lower(F.col("text"))
    base = df.select(t.alias("__t"), F.length(t).alias("__n"))
    h = _new_hashes()
    win_slice = F.flatten(
        F.transform(
            F.array(h),
            lambda hh: F.transform(
                F.sequence(F.lit(1), F.size(hh) - 3),
                lambda w: F.array_min(F.slice(hh, w, 4)),
            ),
        )
    )
    win_least = F.flatten(
        F.transform(
            F.array(h),
            lambda hh: F.transform(
                F.sequence(F.lit(1), F.size(hh) - 3),
                lambda w: F.least(
                    *[F.element_at(hh, w + F.lit(j)) for j in range(4)]
                ),
            ),
        )
    )
    row = base.select(
        win_slice.alias("a"), win_least.alias("b")
    ).collect()[0]
    assert row["a"] == row["b"]


# --------------------------------------------------------------------------
# q260's in-place rank attachment (operators/windows.py::global_midranks)
# --------------------------------------------------------------------------

def _distinct_table_midranks(df, col, out):
    """The pre-r12 q260 rank attachment: distinct values + prefix scan +
    equi-join back — the reference semantics global_midranks must match."""
    from isen_projet_bigdata_a3s6_spark.operators.windows import (
        global_prefix_sum,
    )

    dv = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    pref = global_prefix_sum(dv, col, ["cnt"])
    ranks = pref.select(
        col,
        (2 * (F.col("cnt_cum") - F.col("cnt")) + F.col("cnt") + 1)
        .cast("long")
        .alias(out),
    )
    return df.join(ranks, col)


@pytest.mark.parametrize("n_rows", [1, 7, 500])
def test_global_midranks_matches_distinct_table_path(spark, n_rows):
    import random

    from isen_projet_bigdata_a3s6_spark.operators.windows import (
        global_midranks,
    )

    rng = random.Random(n_rows)
    vals = [float(rng.randint(0, 20)) for _ in range(n_rows)]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    old = {
        r["id"]: r["w"]
        for r in _distinct_table_midranks(df, "v", "w").collect()
    }
    new = {
        r["id"]: r["w"]
        for r in global_midranks(df, "v", "w")
        .filter(F.col("v").isNotNull())
        .collect()
    }
    assert old == new


def test_global_midranks_degenerate_values(spark):
    from isen_projet_bigdata_a3s6_spark.operators.windows import (
        global_midranks,
    )

    nan = float("nan")
    rows = [
        (1, -0.0),
        (2, 0.0),        # ±0.0 must form ONE tie group (groupBy semantics)
        (3, 0.0),
        (4, nan),
        (5, nan),        # NaNs group together, sort last
        (6, None),       # NULL rows count into every c_less, then drop
        (7, -1.5),
        (8, 1e300),
        (9, 1.5),
        (10, 1.5),
    ]
    df = spark.createDataFrame(rows, "id long, v double")
    old = {
        r["id"]: r["w"]
        for r in _distinct_table_midranks(df, "v", "w").collect()
    }
    new = {
        r["id"]: r["w"]
        for r in global_midranks(df, "v", "w")
        .filter(F.col("v").isNotNull())
        .collect()
    }
    assert old == new
    # the ±0.0 group: c_less = 1 NULL + 1 (-1.5) = 2 -> 2r = 2*2 + 3 + 1 = 8
    assert new[1] == new[2] == new[3] == 8


# --------------------------------------------------------------------------
# dedup_keep_first's min_by aggregation vs the window row_number it replaced
# --------------------------------------------------------------------------

def _window_keep_first(df, keys, order_by):
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(*[F.asc(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def test_dedup_keep_first_matches_window_with_null_edges(spark):
    from isen_projet_bigdata_a3s6_spark.operators.cleaning import (
        dedup_keep_first,
    )

    nan = float("nan")
    rows = [
        # key 1: NULL order value sorts FIRST under asc — must be kept
        (1, None, 10.0, "a"),
        (1, 5, 11.0, "b"),
        # key 2: NaN sorts LAST under asc — non-NaN row kept
        (2, 7, nan, "c"),
        (2, 7, 1.0, "d"),
        # NULL key: groups together on both paths
        (None, 3, 2.0, "e"),
        (None, 1, 3.0, "f"),
        # key 4: order tie broken by the second order column
        (4, 2, 5.0, "g"),
        (4, 2, 4.0, "h"),
    ]
    df = spark.createDataFrame(rows, "k int, o1 int, o2 double, payload string")
    old = {tuple(r) for r in _window_keep_first(df, ["k"], ["o1", "o2"]).collect()}
    new = {tuple(r) for r in dedup_keep_first(df, ["k"], ["o1", "o2"]).collect()}
    assert old == new
    assert ("a" in {r[3] for r in new})  # NULL order kept first
    assert ("d" in {r[3] for r in new})  # NaN ordered last
    assert ("h" in {r[3] for r in new})  # tie broken on o2


# --------------------------------------------------------------------------
# knuth_bucket congruence arithmetic vs the decimal(38,0) multiply
# --------------------------------------------------------------------------

def test_knuth_bucket_matches_decimal_spelling(spark):
    from isen_projet_bigdata_a3s6_spark.operators.sampling import (
        _KNUTH,
        knuth_bucket,
    )

    keys = [
        0, 1, -1, 3, 9999, 10000, 10001, -10000, 3_400_000_000,
        2**40, -(2**40), 2**62, -(2**62), 2**63 - 1, -(2**63), 123456789012345,
    ]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    for m in (5, 10_000):
        cmp = df.select(
            "k",
            knuth_bucket("k", buckets=m).alias("fast"),
            F.pmod(
                F.col("k").cast("decimal(38,0)") * F.lit(_KNUTH), F.lit(m)
            ).cast("long").alias("exact"),
        ).collect()
        for r in cmp:
            assert r["fast"] == r["exact"], (m, r)


# --------------------------------------------------------------------------
# ks_two_sample's single-pass argmax vs the max + join-back + MIN pipeline
# --------------------------------------------------------------------------

def test_ks_argmax_single_pass_parity(spark):
    from isen_projet_bigdata_a3s6_spark.stats.ranktests import ks_two_sample

    # two-group data engineered so the max gap is attained at a TIE of
    # values, including a NULL and a NaN value row in the counts
    nan = float("nan")
    rows = (
        [(float(i), 1) for i in range(10)]          # group 1: 0..9
        + [(float(i) + 20, 2) for i in range(10)]   # group 2: 20..29
        + [(nan, 1), (None, 2)]
    )
    df = spark.createDataFrame(rows, "v double, g int")
    out = ks_two_sample(df, "v", F.col("g")).collect()
    assert len(out) == 1
    r = out[0]
    # full separation: D = 1 at the largest group-1 value (9.0): the gap
    # is maximal from v=9.0 up to just below 20.0 — d_location must be
    # the SMALLEST value attaining it, and never the NULL row
    assert r["d_location"] == 9.0
    assert r["n1"] == 11 and r["n2"] == 11


def test_ks_argmax_all_null_location(spark):
    from isen_projet_bigdata_a3s6_spark.stats.ranktests import ks_two_sample

    # degenerate: every value NULL -> counts has a single NULL-v row;
    # old pipeline returned NULL d_location (MIN over empty non-null set)
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (None, 1)], "v double, g int"
    )
    out = ks_two_sample(df, "v", F.col("g")).collect()
    assert len(out) == 1
    assert out[0]["d_location"] is None
