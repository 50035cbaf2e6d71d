"""Round-10 ADVICE fixes.

1. Executor-side tokenization (bpe_encode / wordpiece_stats) now splits on
   the Java ``\\s`` class — the same class as the Spark-SQL train path —
   instead of Python ``str.split()``'s all-Unicode whitespace, so documents
   containing U+00A0/U+2007/U+2028 tokenize identically train-vs-encode and
   engine-vs-oracle.
2. The HLL linear-counting branch's ln (java.lang.Math.log vs libm) is
   pinned EXHAUSTIVELY over its whole finite domain (the estimate depends
   only on the integer empty-register count V), closing the round4
   knife-edge rather than calling it unlikely.
3. ``bpe_oracle._merge_pass_ctes`` takes an explicit ``per_word`` flag —
   regression-pinned to emit the same join shapes as the old tag sniffing.
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.functions.bpe import (
    bpe_encode,
    bpe_train,
    java_ws_tokens,
)
from isen_projet_bigdata_a3s6_spark.functions import bpe_oracle
from isen_projet_bigdata_a3s6_spark.oracle_check import compare_frames


# ---------------------------------------------------------------------------
# 1. Java-class tokenization
# ---------------------------------------------------------------------------
NBSP_DOCS = [
    (1, "aa\u00a0bb aa bb"),  # U+00A0 NO-BREAK SPACE inside
    (2, "aa\u2007bb\u2028cc aa"),  # figure space + line separator
    (3, "\u00a0aa bb\u00a0"),  # leading/trailing non-ASCII ws
    (4, "aa\tbb\ncc\fdd\ree"),  # the ASCII members of the class
    (5, "plain words only here"),
    (6, None),
]


def test_java_ws_tokens_matches_spark_sql_split(spark):
    df = spark.createDataFrame(NBSP_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["t"]) if r["t"] is not None else []
        for r in df.select(
            "doc_id",
            F.filter(
                F.split(F.lower(F.trim("text")), "\\s+"), lambda t: t != ""
            ).alias("t"),
        ).collect()
    }
    for did, text in NBSP_DOCS:
        if text is None:
            assert got[did] == []
        else:
            assert got[did] == java_ws_tokens(text), (did, got[did])


def test_java_ws_tokens_differs_from_str_split_on_unicode_ws():
    # the r09 advisory case: str.split() would have produced ['aa', 'bb']
    assert java_ws_tokens("aa\u00a0bb") == ["aa\u00a0bb"]
    assert java_ws_tokens("aa\u2028bb") == ["aa\u2028bb"]
    assert java_ws_tokens("aa\u00a0 bb") == ["aa\u00a0", "bb"]
    # and the Java class itself still splits where it should
    assert java_ws_tokens("aa\x0bbb") == ["aa", "bb"]
    assert java_ws_tokens("AA bb\tcc") == ["aa", "bb", "cc"]
    assert java_ws_tokens(None) == []


def test_bpe_encode_oracle_parity_with_unicode_whitespace(spark, tmp_path):
    # end-to-end q150 shape on a corpus CONTAINING non-ASCII whitespace:
    # train on Spark, encode on Spark, replay both in DuckDB — hash parity
    # (pre-fix, str.split() tokenized doc 1/2/3 differently and this failed)
    df = spark.createDataFrame(
        [(d, t) for d, t in NBSP_DOCS if t is not None],
        "doc_id long, text string",
    )
    pq = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(pq)
    rules = bpe_train(df, "text", num_merges=4)
    got = bpe_encode(df, "text", rules, max_passes=8).toPandas()
    sql = bpe_oracle.bpe_encode_oracle_sql(
        "documents", "text", "doc_id", num_merges=4, max_passes=8
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    exp = con.execute(sql).fetchdf()
    con.close()
    res = compare_frames("bpe_unicode_ws", got, exp)
    assert res.ok, str(res)


# ---------------------------------------------------------------------------
# 2. HLL linear-counting ln parity — exhaustive over the finite domain
# ---------------------------------------------------------------------------
def test_hll_linear_counting_ln_parity_exhaustive(spark):
    from isen_projet_bigdata_a3s6_spark.operators.sketches import HLL_M

    m = float(HLL_M)
    vs = list(range(1, HLL_M))  # every V the branch can ever see
    sdf = spark.createDataFrame([(v,) for v in vs], "v int")
    got = {
        r["v"]: r["est"]
        for r in sdf.select(
            "v",
            F.round(
                F.lit(m) * F.log(F.lit(m) / F.col("v").cast("double")), 4
            ).alias("est"),
        ).collect()
    }
    con = duckdb.connect()
    exp = dict(
        con.execute(
            f"SELECT v, ROUND({m}e0 * ln({m}e0 / v), 4) FROM unnest(range(1, {HLL_M})) t(v)"
        ).fetchall()
    )
    con.close()
    assert len(got) == HLL_M - 1
    for v in vs:
        assert got[v] == exp[v] and math.copysign(1.0, got[v]) == math.copysign(
            1.0, exp[v]
        ), (v, got[v], exp[v])


# ---------------------------------------------------------------------------
# 3. explicit per_word flag
# ---------------------------------------------------------------------------
def test_merge_pass_per_word_flag_controls_join_shape():
    per_word = bpe_oracle._merge_pass_ctes("s0", "w1", "e1", "e1m", per_word=True)
    global_rule = bpe_oracle._merge_pass_ctes("s0", "top1", "s1", "t1", per_word=False)
    assert "LEFT JOIN w1 r USING (w)" in per_word
    assert "ON TRUE" not in per_word
    assert "LEFT JOIN top1 r ON TRUE" in global_rule
    assert "USING (w)" not in global_rule
    # an e-prefixed tag no longer implies the per-word join (the old
    # stringly-typed contract): the flag decides
    sneaky = bpe_oracle._merge_pass_ctes("s0", "top1", "s1", "e9x", per_word=False)
    assert "LEFT JOIN top1 r ON TRUE" in sneaky


# ---------------------------------------------------------------------------
# 4. registry-wide TRIM convention audit
# ---------------------------------------------------------------------------
def test_no_one_arg_trim_in_any_oracle():
    # DuckDB's default TRIM strips Unicode space-category characters while
    # Spark's trim strips ASCII space only — every oracle TRIM must pin
    # the trim set explicitly (TRIM(x, ' ')). A one-arg trim anywhere in a
    # registered oracle reintroduces the unicode-whitespace drift class
    # (tools/degenerate_sweep.py --mode unicodews).
    import re

    from isen_projet_bigdata_a3s6_spark.queries import oracle_sql

    offenders = {}
    for name, sql in oracle_sql().items():
        for m in re.finditer(r"(?i)(?<![\w.])trim\(", sql):
            j = m.end()
            depth, k = 1, j
            while k < len(sql) and depth:
                if sql[k] == "(":
                    depth += 1
                elif sql[k] == ")":
                    depth -= 1
                k += 1
            inner = sql[j : k - 1]
            if not inner.rstrip().endswith("' '"):
                offenders.setdefault(name, []).append(inner[:60])
    assert not offenders, f"one-arg TRIM in oracles: {offenders}"
