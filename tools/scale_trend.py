"""Scale-trend table for an arbitrary query subset at two fixture dirs.

tools/scale_probe.py grades the BENCH HEADLINE set (sub-second to
few-second queries, where the fixed-overhead floor dominates the small
side). This tool is its sibling for the EXPENSIVE tail — the sanctioned
exact baselines and iterative graph operators the r07 verdict asked to
extend past sf1: both measurement points are tens of seconds, so the raw
time ratio IS the growth signal and no overhead-floor correction is
needed.

For each named query it times one noop-sink run at the small dir and one
at the large dir (driver GC + cache clear before each, same hygiene as
scale_smoke: a sanctioned cartesian's shuffle files must not disk-starve
the next query), then reports t_large/t_small against the query's PRIMARY
input-table row growth. flagged iff time ratio > growth ratio * slack
(slack 1.5, the box's documented run-to-run noise) — a linear operator
rides ~growth, a quadratic one shows ~growth² and trips the flag.

Errors are recorded per query, not fatal (the smoke convention).

Usage:
  python tools/scale_trend.py SMALL_DIR LARGE_DIR q1,q2,...  [--budget N]

Writes one JSON line to stdout; per-query progress to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from isen_projet_bigdata_a3s6_spark import queries as registry  # noqa: E402
from isen_projet_bigdata_a3s6_spark.session import get_spark  # noqa: E402

SLACK = 1.5

# primary input table per expensive-tail query (the table whose growth the
# time ratio is graded against); anything unlisted is graded vs lineitem
PRIMARY = {
    "q274_bradley_terry": "lineitem",
    "q247_recursive_bfs": "lineitem",
    "q267_hits": "lineitem",
    "q136_pagerank": "lineitem",
    "q159_pagerank_convergence": "lineitem",
    "q40_ngram_jaccard_pairs": "documents",
    "q287_containment_join": "documents",
    "q161_jaccard_prefix_join": "documents",
    "q218_semantic_dedup": "embeddings",
    "q72_embedding_dedup_exact": "embeddings",
    "q73_embedding_dedup_lsh": "embeddings",
    # wave-3 deterministic-Lloyd family (r09): expensive since promotion
    "q207_pq_ann": "embeddings",
    "q69_kmeans_clusters": "embeddings",
    "q70_ann_ivf": "embeddings",
}


def parse_argv(argv: list[str]) -> tuple[str, str, list[str], float]:
    positional: list[str] = []
    budget = 5400.0
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--budget":
            if i + 1 >= len(argv):
                raise SystemExit("scale_trend: --budget requires a value")
            try:
                budget = float(argv[i + 1])
            except ValueError:
                raise SystemExit(
                    f"scale_trend: --budget requires a number, got {argv[i + 1]!r}"
                ) from None
            i += 2
        elif a.startswith("--budget="):
            try:
                budget = float(a.split("=", 1)[1])
            except ValueError:
                raise SystemExit(
                    f"scale_trend: --budget requires a number, got {a!r}"
                ) from None
            i += 1
        elif a.startswith("--"):
            raise SystemExit(f"scale_trend: unrecognized flag {a!r}")
        else:
            positional.append(a)
            i += 1
    if len(positional) != 3:
        raise SystemExit(
            "scale_trend: usage SMALL_DIR LARGE_DIR q1,q2,... [--budget N]"
        )
    small, large, names_csv = positional
    names = [n for n in names_csv.split(",") if n]
    qs = registry.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"scale_trend: unknown queries {unknown!r}")
    return small, large, names, budget


def _timed_run(spark, fn, sf_dir: str) -> tuple[float | None, str | None]:
    spark.catalog.clearCache()
    try:
        spark._jvm.System.gc()
    except Exception:
        pass
    t0 = time.perf_counter()
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2), None
    except Exception as exc:  # noqa: BLE001 — record, don't abort the table
        return None, str(exc).split("\n", 1)[0][:200]


def main() -> None:
    small, large, names, budget = parse_argv(sys.argv[1:])
    spark = get_spark(app_name="scale_trend")
    qs = registry.queries()

    growth: dict[str, float] = {}
    for tbl in sorted({PRIMARY.get(n, "lineitem") for n in names}):
        try:
            n_small = spark.read.parquet(f"{small}/{tbl}.parquet").count()
            n_large = spark.read.parquet(f"{large}/{tbl}.parquet").count()
            growth[tbl] = round(n_large / n_small, 3) if n_small else float("nan")
        except Exception:
            growth[tbl] = float("nan")

    t_start = time.perf_counter()
    rows: dict[str, dict] = {}
    flagged: list[str] = []
    for i, name in enumerate(names):
        if time.perf_counter() - t_start > budget:
            rows[name] = {"skipped": "budget exhausted"}
            continue
        t_s, err_s = _timed_run(spark, qs[name], small)
        t_l, err_l = _timed_run(spark, qs[name], large)
        tbl = PRIMARY.get(name, "lineitem")
        g = growth.get(tbl, float("nan"))
        row: dict = {"t_small": t_s, "t_large": t_l, "table": tbl, "growth": g}
        if err_s or err_l:
            row["error"] = err_s or err_l
        elif t_s and t_s > 0:
            ratio = round(t_l / t_s, 2)
            row["ratio"] = ratio
            if g == g and ratio > g * SLACK:  # g==g filters NaN
                flagged.append(name)
        rows[name] = row
        print(f"[{i + 1}/{len(names)}] {name}: {row}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "scale_trend",
                "small": small,
                "large": large,
                "slack": SLACK,
                "growth": growth,
                "queries": rows,
                "flagged": flagged,
            }
        )
    )


if __name__ == "__main__":
    main()
