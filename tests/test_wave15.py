"""Wave-15 tests: two-phase global prefix scan, KS / Mann–Whitney rank
tests pinned against independent Python implementations, ACF/CUSUM shapes.
"""

import math
import random

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark import queries as Q
from isen_projet_bigdata_a3s6_spark.operators.windows import global_prefix_sum
from isen_projet_bigdata_a3s6_spark.stats.ranktests import (
    ks_two_sample,
    mannwhitney_u,
)

SF = "/root/testdata/sf0.001"


def test_global_prefix_sum_matches_single_window(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(-5, 5), rng.randint(0, 3)) for i in range(1000)]
    # unique order keys (shuffled insert order to exercise the range shuffle)
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["k", "a", "b"]).repartition(7)
    got = {
        r["k"]: (r["a_cum"], r["b_cum"])
        for r in global_prefix_sum(df, "k", ["a", "b"]).collect()
    }
    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = {
        r["k"]: (r["ac"], r["bc"])
        for r in df.select(
            "k", F.sum("a").over(w).alias("ac"), F.sum("b").over(w).alias("bc")
        ).collect()
    }
    assert got == want


def _py_ks(x1, x2):
    n1, n2 = len(x1), len(x2)
    values = sorted(set(x1) | set(x2))
    from bisect import bisect_right

    s1, s2 = sorted(x1), sorted(x2)
    best, loc = -1, None
    for v in values:
        gap = abs(bisect_right(s1, v) * n2 - bisect_right(s2, v) * n1)
        if gap > best:
            best, loc = gap, v
    return best / (n1 * n2), loc


def test_ks_matches_python(spark):
    rng = random.Random(11)
    x1 = [round(rng.gauss(0, 1), 3) for _ in range(400)]
    x2 = [round(rng.gauss(0.4, 1.3), 3) for _ in range(300)]
    df = spark.createDataFrame(
        [(v, 1) for v in x1] + [(v, 2) for v in x2], ["v", "g"]
    )
    row = ks_two_sample(df, "v", F.col("g")).collect()[0]
    d, loc = _py_ks(x1, x2)
    assert row["n1"] == 400 and row["n2"] == 300
    assert abs(row["d_stat"] - d) < 1e-6
    assert row["d_location"] == loc
    # clearly shifted samples at these sizes must reject
    assert row["reject_05"]


def _py_mwu(x1, x2):
    pooled = sorted([(v, 1) for v in x1] + [(v, 2) for v in x2])
    n1, n2 = len(x1), len(x2)
    n = n1 + n2
    # midranks
    r1 = 0.0
    i = 0
    tie_sum = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        t = j - i
        midrank = (i + 1 + j) / 2.0  # average of ranks i+1..j
        r1 += midrank * sum(1 for k in range(i, j) if pooled[k][1] == 1)
        tie_sum += t * t * t - t
        i = j
    u1 = r1 - n1 * (n1 + 1) / 2.0
    mean_u = n1 * n2 / 2.0
    var_u = n1 * n2 / 12.0 * ((n + 1) - tie_sum / (n * (n - 1)))
    z = (u1 - mean_u) / math.sqrt(var_u)
    return u1, z


def test_mwu_matches_python_with_ties(spark):
    rng = random.Random(13)
    # coarse rounding forces heavy ties to exercise the midrank path
    x1 = [round(rng.gauss(0, 1), 1) for _ in range(250)]
    x2 = [round(rng.gauss(0.5, 1), 1) for _ in range(200)]
    df = spark.createDataFrame(
        [(v, 1) for v in x1] + [(v, 2) for v in x2], ["v", "g"]
    )
    row = mannwhitney_u(df, "v", F.col("g")).collect()[0]
    u1, z = _py_mwu(x1, x2)
    assert row["u_stat"] == u1
    assert abs(row["z_score"] - z) < 1e-6
    rb = 1.0 - 2.0 * u1 / (250 * 200)
    assert abs(row["rank_biserial"] - rb) < 1e-6


def test_identical_samples_accept(spark):
    x = [float(i % 37) for i in range(300)]
    df = spark.createDataFrame(
        [(v, 1) for v in x] + [(v, 2) for v in x], ["v", "g"]
    )
    ks = ks_two_sample(df, "v", F.col("g")).collect()[0]
    assert ks["d_stat"] == 0.0 and not ks["reject_05"]
    mwu = mannwhitney_u(df, "v", F.col("g")).collect()[0]
    # identical samples: U = n1*n2/2 exactly, z = 0
    assert mwu["u_stat"] == 300 * 300 / 2.0
    assert mwu["z_score"] == 0.0


def test_acf_lag0_normalization_and_bounds(spark):
    out = Q._QUERIES["q235_acf"](spark, SF).collect()
    assert len(out) == 5  # one row per priority
    for r in out:
        for k in (1, 2, 3, 7):
            assert abs(r[f"acf_{k}"]) <= 1.0 + 1e-9


def test_cusum_rows_and_normalization(spark):
    out = Q._QUERIES["q236_cusum_changepoint"](spark, SF).collect()
    assert len(out) == 5
    # normalized statistic is bounded by sqrt(n) scaling; sanity: finite,
    # sorted by |s| descending
    vals = [abs(r["cusum_norm"]) for r in out]
    assert vals == sorted(vals, reverse=True)


# --- WordPiece -------------------------------------------------------------

def test_wordpiece_greedy_longest_match():
    from isen_projet_bigdata_a3s6_spark.functions.wordpiece import encode_word

    vocab = {"un", "##aff", "##able", "aff", "##ab", "##le", "hug", "##s"}
    assert encode_word("unaffable", vocab) == ["un", "##aff", "##able"]
    assert encode_word("hugs", vocab) == ["hug", "##s"]
    # no multi-char matches -> falls back to single chars (##-marked after 0)
    assert encode_word("xyz", vocab) == ["x", "##y", "##z"]
    # longest match wins over shorter prefixes
    vocab2 = {"a", "ab", "abc", "##d"}
    assert encode_word("abcd", vocab2) == ["abc", "##d"]
    assert encode_word("x" * 200, vocab) == ["[UNK]"]


def test_wordpiece_stats_counts(spark):
    from isen_projet_bigdata_a3s6_spark.functions.wordpiece import (
        wordpiece_stats,
    )

    df = spark.createDataFrame(
        [(1, "unaffable hugs"), (2, None), (3, "un un")],
        ["doc_id", "text"],
    )
    vocab = {"un", "##aff", "##able", "hug", "##s"}
    out = {r["doc_id"]: r for r in wordpiece_stats(df, "text", vocab).collect()}
    assert (out[1]["n_words"], out[1]["n_pieces"], out[1]["n_split_words"]) == (2, 5, 2)
    assert (out[2]["n_words"], out[2]["n_pieces"]) == (0, 0)
    assert (out[3]["n_words"], out[3]["n_pieces"], out[3]["n_split_words"]) == (2, 2, 0)


def test_vocab_from_bpe_strips_eow():
    from isen_projet_bigdata_a3s6_spark.functions.wordpiece import (
        vocab_from_bpe,
    )

    rules = [("t", "h", 10), ("th", "e</w>", 9)]
    v = vocab_from_bpe(rules)
    assert "th" in v and "##th" in v and "the" in v and "##the" in v
    assert not any("</w>" in p for p in v)


# --- k-center --------------------------------------------------------------

def _py_kcenter(vecs, k):
    import math

    ids = sorted(vecs)
    chosen = [ids[0]]
    radii = [None]
    d = {
        i: sum((a - b) ** 2 for a, b in zip(vecs[i], vecs[chosen[0]]))
        for i in ids
        if i != chosen[0]
    }
    for _ in range(k - 1):
        if not d:
            break
        far = max(d.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        radii.append(round(math.sqrt(d.pop(far)), 6))
        chosen.append(far)
        for i in list(d):
            nd = sum((a - b) ** 2 for a, b in zip(vecs[i], vecs[far]))
            if nd < d[i]:
                d[i] = nd
    return chosen, radii


def test_kcenter_matches_numpy_reference(spark):
    from isen_projet_bigdata_a3s6_spark.functions.similarity import (
        kcenter_select,
    )

    rng = random.Random(5)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(4)] for i in range(60)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    out = kcenter_select(df, "embedding", "vec_id", k=6).collect()
    chosen, radii = _py_kcenter(vecs, 6)
    assert [r["vec_id"] for r in sorted(out, key=lambda r: r["step"])] == chosen
    got_radii = [r["radius"] for r in sorted(out, key=lambda r: r["step"])]
    assert got_radii[0] is None
    for g, w in zip(got_radii[1:], radii[1:]):
        assert abs(g - w) < 1e-6
    # coverage radius is non-increasing
    rs = [r for r in got_radii[1:]]
    assert all(a >= b - 1e-9 for a, b in zip(rs, rs[1:]))


# --- label propagation ------------------------------------------------------

def _py_lpa(edges, rounds=5):
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in adj:
            c = Counter(labels[m] for m in adj[n])
            top = max(c.values())
            new[n] = min(l for l, v in c.items() if v == top)
        labels = new
    return labels


def test_lpa_matches_python_two_cliques(spark):
    from isen_projet_bigdata_a3s6_spark.operators.graph import (
        label_propagation,
    )

    # two 5-cliques joined by a single bridge edge
    edges = [
        (a, b) for grp in ([1, 2, 3, 4, 5], [11, 12, 13, 14, 15])
        for i, a in enumerate(grp) for b in grp[i + 1:]
    ] + [(5, 11)]
    df = spark.createDataFrame(edges, ["a", "b"])
    got = {
        r["node"]: r["label"] for r in label_propagation(df, rounds=5).collect()
    }
    want = _py_lpa(edges, rounds=5)
    assert got == want
    # the two cliques must end in different communities
    assert len({got[n] for n in [1, 2, 3, 4]}) == 1
    assert len({got[n] for n in [12, 13, 14, 15]}) == 1
    assert got[1] != got[15]


def test_wordpiece_local_encoder_parity_with_module_fn(spark):
    # the UDF's by-value closure must stay in sync with encode_word
    from isen_projet_bigdata_a3s6_spark.functions.wordpiece import (
        encode_word,
        wordpiece_stats,
    )

    words = ["unaffable", "hugs", "zebra", "aa", "x"]
    vocab = {"un", "##aff", "##able", "hug", "##s", "ze", "##bra", "aa"}
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["n_pieces"] for r in wordpiece_stats(df, "text", vocab).collect()}
    for i, w in enumerate(words):
        assert out[i] == len(encode_word(w, vocab)), w
