"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end through the noop sink (full materialization,
no driver collect overhead) — the honest analog of a cluster job.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from isen_projet_bigdata_a3s6_spark import queries as registry  # noqa: E402
from isen_projet_bigdata_a3s6_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_grouped_agg",        # scan + 6-agg groupBy (TPC-H Q1 shape)
    "q03_summary_stats_grouped",  # exact grouped percentiles
    "q04_dedup_keep_first",   # window dedup over full lineitem
    "q11_join_topk_revenue",  # 3-way join + agg + top-k
    "q12_join_multiway",      # 6-way join
    "q16_knn_1nn",            # auto-dispatched 1-NN (grid-exact at scale)
    "q18_running_sum",        # window running aggregate
    "q24_tumbling_window",    # event-time tumbling windows
    "q26_sessionize",         # lag+cumsum sessionization
    "q29_json_extract",       # JSON path extraction
    "q36_language_id",        # text: n-gram language ID
    "q37_dedup_exact",        # text: exact dedup via fingerprint
    "q38_minhash_pairs",      # text: MinHash LSH near-dup
    "q41_ann_bruteforce",     # embeddings: exact cosine top-k
    "q30_cov_corr",           # stats as aggregation
    # round-2 additions (kept after the round-1 15 so per-query timings stay
    # comparable across rounds; the total now spans 18 queries)
    "q83_asof_join",          # union+window as-of join (no join in plan)
    "q87_tfidf",              # explode→groupBy corpus statistics
    "q94_topk_salted",        # skew-safe two-stage grouped top-k
    # round-2 wave-2 additions (appended, earlier timings stay comparable)
    "q116_heavy_hitters",     # MG sketch candidates + exact verify
    "q124_ohlc_resample",     # min_by/max_by single-agg OHLC bars
    "q126_editdist_pairs",    # SymSpell delete-variant blocking join
    # round-2 wave-4+ additions (appended, earlier timings stay comparable)
    "q158_bloom_join_prune",  # literal bloom predicate below the shuffle
    "q161_jaccard_prefix_join",  # SSJoin prefix-filtered similarity join
    "q167_kfold_cv_ols",      # one-pass 5-fold CV aggregate algebra
    # round-3 additions (appended, earlier timings stay comparable)
    "q176_sequence_packing",  # concat-chunk packing, per-source window
    "q179_gopher_rules",      # quality-rule report, one doc-keyed shuffle
    "q187_embedding_quantize",  # int8 quantization, zero-exchange
    # round-4 additions (appended, earlier timings stay comparable)
    "q196_tpch_q6_forecast_revenue",  # pure pushdown scan-filter-sum
    "q199_chunk_dedup",       # cross-doc chunk dedup (CCNet stage)
    "q202_winnowing_fingerprints",  # MOSS winnowing, in-row window mins
    # wave-11/12 additions (appended, earlier timings stay comparable)
    "q213_inverted_index",    # explode→groupBy posting-list build
    "q218_semantic_dedup",    # per-cluster pairwise cosine (SemDeDup)
    "q221_variant_shred",     # VARIANT parse + typed path extraction
    # wave-15 additions (appended, earlier timings stay comparable)
    "q233_ks_two_sample",     # two-phase global prefix scan (no 1-reducer)
    "q235_acf",               # per-group daily series + lag windows
    # wave-16/17/20 additions (appended, earlier timings stay comparable)
    "q240_bm25_topk",         # term-filtered BM25 ranked retrieval
    "q245_dau_mau",           # 30-day exact distinct via contribution explode
    "q259_association_rules", # order-keyed pair join, broadcast marginals
    "q260_spearman_corr",     # prefix-scan midranks + exact moment algebra
    "q300_curation_pipeline", # end-to-end curation: gate->dedup->select->manifest
]

# primary input table per headline query — row counts go into the bench JSON
# so round-over-round deltas are attributable (rows/sec, not just sec, on a
# box with ±50% timing noise)
_INPUT_TABLE = {
    "q01_grouped_agg": "lineitem",
    "q03_summary_stats_grouped": "orders",
    "q04_dedup_keep_first": "lineitem",
    "q11_join_topk_revenue": "lineitem",
    "q12_join_multiway": "lineitem",
    "q16_knn_1nn": "customer",
    "q18_running_sum": "events",
    "q24_tumbling_window": "events",
    "q26_sessionize": "events",
    "q29_json_extract": "events",
    "q36_language_id": "documents",
    "q37_dedup_exact": "documents",
    "q38_minhash_pairs": "documents",
    "q41_ann_bruteforce": "embeddings",
    "q30_cov_corr": "lineitem",
    "q83_asof_join": "events",
    "q87_tfidf": "documents",
    "q94_topk_salted": "lineitem",
    "q116_heavy_hitters": "lineitem",
    "q124_ohlc_resample": "events",
    "q126_editdist_pairs": "customer",
    "q158_bloom_join_prune": "lineitem",
    "q161_jaccard_prefix_join": "documents",
    "q167_kfold_cv_ols": "lineitem",
    "q176_sequence_packing": "documents",
    "q179_gopher_rules": "documents",
    "q187_embedding_quantize": "embeddings",
    "q196_tpch_q6_forecast_revenue": "lineitem",
    "q199_chunk_dedup": "documents",
    "q202_winnowing_fingerprints": "documents",
    "q213_inverted_index": "documents",
    "q218_semantic_dedup": "embeddings",
    "q221_variant_shred": "events",
    "q233_ks_two_sample": "orders",
    "q235_acf": "orders",
    "q240_bm25_topk": "documents",
    "q245_dau_mau": "events",
    "q259_association_rules": "lineitem",
    "q260_spearman_corr": "lineitem",
    "q300_curation_pipeline": "documents",
}


def _spark_jvms() -> list[tuple[int, bool]]:
    """Every live Spark JVM on the box as (pid, is_ours): a java process
    whose cmdline mentions spark, tagged by whether its parent chain
    reaches THIS python process (our own driver JVM is a direct child).

    Exists because the r06 driver capture was uniformly +15-30% against
    the same-commit solo probe — a leftover JVM from a prior run was
    stealing cores, and nothing in the bench output made that
    machine-distinguishable from a real regression. NOTES documented the
    signature after the fact; this makes bench.py detect it up front."""
    me = os.getpid()

    def ppid(pid: int) -> int:
        try:
            with open(f"/proc/{pid}/stat") as f:
                return int(f.read().rsplit(")", 1)[1].split()[1])
        except Exception:
            return 0

    out: list[tuple[int, bool]] = []
    try:
        entries = os.listdir("/proc")
    except Exception:
        return out
    for d in entries:
        if not d.isdigit():
            continue
        pid = int(d)
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode("utf-8", "replace")
        except Exception:
            continue
        if "java" not in cmd or "spark" not in cmd.lower():
            continue
        p, ours = pid, False
        for _ in range(32):  # ancestry walk, bounded against /proc races
            if p == me:
                ours = True
                break
            p = ppid(p)
            if p <= 1:
                break
        out.append((pid, ours))
    return out


def _foreign_spark_jvms() -> int:
    return sum(1 for _, ours in _spark_jvms() if not ours)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # preflight BEFORE our own JVM exists: any spark java process now is a
    # contender (a concurrent pytest/driver sweep, or a leftover session)
    foreign_pre = _foreign_spark_jvms()
    if foreign_pre:
        print(
            f"bench: WARNING {foreign_pre} foreign Spark JVM(s) running — "
            "timings will read 15-30% inflated (r06 contention signature); "
            'the output line carries "contended": true',
            file=sys.stderr,
        )
    spark = get_spark(app_name="bench")
    qs = registry.queries()

    # warmup: JIT + codegen + arrow init, not the data. First pass at the
    # smallest SF initializes every path cheaply; second pass at sf0.01
    # actually heats the inner loops (C2 needs realistic iteration counts —
    # a 500-row warmup leaves the widest stages interpreted and the first
    # timed runs pay compilation instead of the query)
    for warm_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        if os.path.isdir(warm_dir):
            for name in HEADLINE:
                try:
                    qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
                except Exception:
                    pass
            spark.catalog.clearCache()

    # best-of-3 per query, the three runs CONSECUTIVE (not interleaved
    # passes): running 23 other queries between repetitions churns the JIT
    # code cache and the widest codegen stages never reach steady state
    # (measured: q161 7.3 s interleaved vs 4.5 s consecutive, identical
    # code). Caches are cleared before EVERY measurement so best-of-N is
    # honest: no run may reuse a persisted frame a previous run built (the
    # round-1 q38 signature-cache leak, and any operator-internal lazy
    # persist).
    timings: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    # mid-run contention samples: the pre/post probes alone have a blind
    # window — a foreign JVM that starts AND exits entirely within the
    # timed loop inflates mid-run timings while both endpoint probes read
    # clean. One cheap /proc scan per headline query closes most of it.
    foreign_mid = False
    for name in HEADLINE:
        fn = qs[name]
        # 3 standard reps; queries still above 3 s get up to 2 extra reps —
        # measured on q161, the widest codegen stages only reach C2
        # steady state on the 4th-5th execution and run-to-run variance on
        # this box is ±50%, so exactly the entries worth watching are the
        # ones best-of-3 under-samples
        reps = 3
        rep = 0
        # one UNTIMED rep at the target SF first: the small-SF warmup
        # passes above don't reach the iteration counts that tier C2-compiles
        # the widest stages (q233 measured 7.6 s cold vs 1.1-1.4 s steady at
        # sf0.1 — NOTES r05 item 11), so without this the driver's capture
        # can sample a mid-warm-up number and read it as a regression
        spark.catalog.clearCache()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        while rep < reps:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            rep_times.setdefault(name, []).append(dt)
            rep += 1
            if rep == 3 and timings[name] > 3.0:
                reps = 5
        foreign_mid = foreign_mid or bool(_foreign_spark_jvms())

    # input-row counts per primary table (parquet footer metadata — cheap)
    table_rows: dict[str, int] = {}
    for tbl in sorted(set(_INPUT_TABLE.values())):
        try:
            table_rows[tbl] = spark.read.parquet(f"{sf_dir}/{tbl}.parquet").count()
        except Exception:
            table_rows[tbl] = -1

    # re-check after the timed loop; OR in the per-query mid-run samples so
    # a contender that lived only inside the loop still marks the run
    contended = bool(foreign_pre or foreign_mid or _foreign_spark_jvms())

    total = round(sum(timings.values()), 3)
    input_rows = {name: table_rows.get(_INPUT_TABLE.get(name, ""), -1) for name in HEADLINE}
    rows_per_sec = {
        name: round(input_rows[name] / timings[name])
        if timings.get(name) and input_rows[name] > 0
        else None
        for name in HEADLINE
    }
    # The driver captures only the last ~2000 chars of stdout and tries to
    # json-parse the capture (BENCH_r03..r05 all show parsed=None because
    # the line, with diagnostics inlined, ran ~3.5 KB). Keep stdout to ONE
    # line under 2000 chars — contract fields only — so the tail capture IS
    # the complete line and parses; ship the derivable diagnostics
    # (input_rows, rows_per_sec) to stderr instead.
    print(
        json.dumps({"input_rows": input_rows, "rows_per_sec": rows_per_sec}),
        file=sys.stderr,
    )
    # per-query relative rep spread (max−min)/min: how noisy THIS capture
    # was, so a round-over-round delta can be judged against the measured
    # same-run variance instead of guessed. Full per-query vectors go to
    # stderr; stdout carries two compact percentiles (the 2 KB tail budget
    # can't fit 40 more floats).
    spreads = {
        n: round((max(v) - min(v)) / min(v), 3) if min(v) > 0 else 0.0
        for n, v in rep_times.items()
    }
    print(
        json.dumps({"rep_times": rep_times, "rep_spread": spreads}),
        file=sys.stderr,
    )
    sp = sorted(spreads.values())
    spread_p50 = round(sp[len(sp) // 2], 3) if sp else 0.0
    spread_p90 = round(sp[int(len(sp) * 0.9)], 3) if sp else 0.0
    # queries still > 3 s after 3 reps get up to 5 (the q161-class C2
    # settling), so "best_of: 3" alone misdescribes slow queries — emit the
    # actual rep-count range; per-query counts are len(rep_times[n]) on
    # stderr (r08 advisory)
    rep_counts = [len(v) for v in rep_times.values()] or [0]
    def _line(q: dict[str, float]) -> str:
        return json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "unit": "sec",
                "queries": q,
                "value": total,
                "sf": float(sf),
                "contended": contended,
                "best_of": min(rep_counts),
                "best_of_max": max(rep_counts),
                "spread_p50": spread_p50,
                "spread_p90": spread_p90,
            }
        )

    line = _line(timings)
    if len(line) > 1900:  # stay inside the tail window: shed precision, not keys
        line = _line({k: round(v, 2) for k, v in timings.items()})
    print(line)


if __name__ == "__main__":
    main()
