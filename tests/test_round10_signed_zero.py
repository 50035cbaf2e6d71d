"""Round-10: the signed-zero gate class (VERDICT r09 items 1-2).

The r09 q43 red row: DuckDB's ROUND of a tiny negative emits -0.0, Spark's
BigDecimal HALF_UP round emits 0.0 — numerically equal (-0.0 == 0.0 is
True), but the driver's stringifying value hash differs. The local gate
compared floats with ``==`` and could not see it. These tests pin:

1. the hardened comparator DISTINGUISHES ±0.0 (the class can't hide),
2. the ``round_disp`` / ``+ 0e0`` convention erases the divergence on
   both engines,
3. the cross-engine behavior itself (DuckDB ROUND keeps the sign, Spark
   ROUND does not) — the premise the convention rests on.
"""

import math

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from isen_projet_bigdata_a3s6_spark.functions.scalar import round_disp
from isen_projet_bigdata_a3s6_spark.oracle_check import (
    _values_equal,
    compare_frames,
)


# ---------------------------------------------------------------------------
# 1. the hardened comparator
# ---------------------------------------------------------------------------
def test_values_equal_distinguishes_signed_zero():
    assert not _values_equal(0.0, -0.0)
    assert not _values_equal(-0.0, 0.0)
    assert _values_equal(-0.0, -0.0)
    assert _values_equal(0.0, 0.0)
    # the rest of the float contract is unchanged
    assert _values_equal(1.5, 1.5)
    assert not _values_equal(1.5, 1.5000001)
    assert _values_equal(float("nan"), float("nan"))


def test_gate_fails_on_signed_zero_frame():
    # a literal frame whose only difference is the zero sign MUST fail —
    # this is exactly the q43 cell the r09 driver saw and the old gate
    # (af == bf) waved through
    spark_pdf = pd.DataFrame({"feature": ["a"], "t_value": [0.0]})
    oracle_pdf = pd.DataFrame({"feature": ["a"], "t_value": [-0.0]})
    res = compare_frames("signed_zero_probe", spark_pdf, oracle_pdf)
    assert not res.ok
    assert any("t_value" in m for m in res.mismatches)


def test_gate_passes_after_normalization():
    # + 0.0 on both sides (IEEE -0.0 + 0.0 = +0.0) restores parity
    spark_pdf = pd.DataFrame({"feature": ["a"], "t_value": [0.0 + 0.0]})
    oracle_pdf = pd.DataFrame({"feature": ["a"], "t_value": [-0.0 + 0.0]})
    assert compare_frames("normalized_probe", spark_pdf, oracle_pdf).ok


# ---------------------------------------------------------------------------
# 2. the convention, engine-side
# ---------------------------------------------------------------------------
def test_duckdb_round_keeps_negative_zero_and_plus_zero_clears_it():
    con = duckdb.connect()
    raw, norm = con.execute(
        "SELECT ROUND(-0.003e0, 2), ROUND(-0.003e0, 2) + 0e0"
    ).fetchone()
    con.close()
    assert raw == 0.0 and math.copysign(1.0, raw) == -1.0  # -0.0
    assert norm == 0.0 and math.copysign(1.0, norm) == 1.0  # +0.0
    assert str(raw) == "-0.0" and str(norm) == "0.0"  # what the hash sees


def test_spark_round_has_no_signed_zero_and_round_disp_matches(spark):
    row = (
        spark.range(1)
        .select(
            F.round(F.lit(-0.003), 2).alias("raw"),
            round_disp(F.lit(-0.003), 2).alias("norm"),
            # round_disp must not disturb ordinary values
            round_disp(F.lit(-1.2345678), 4).alias("neg"),
            round_disp(F.lit(2.5), 0).alias("half_up"),
            round_disp(F.lit(None).cast("double"), 2).alias("nul"),
        )
        .collect()[0]
    )
    # Spark's BigDecimal HALF_UP round already yields unsigned zero …
    assert math.copysign(1.0, row["raw"]) == 1.0
    # … and round_disp pins it there while passing other values through
    assert math.copysign(1.0, row["norm"]) == 1.0
    assert row["neg"] == -1.2346
    assert row["half_up"] == 3.0  # HALF_UP semantics preserved
    assert row["nul"] is None


def test_python_round_emits_signed_zero():
    # the q81 coefficient path: Python round of a tiny negative IS -0.0
    # (stringifies "-0.0"), which is why the display projection adds +0.0
    q = round(-1e-12, 6)
    assert q == 0.0 and math.copysign(1.0, q) == -1.0
    assert str(q) == "-0.0"
    assert math.copysign(1.0, q + 0.0) == 1.0
