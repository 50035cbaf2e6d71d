"""Capture formatted physical plans of flagship queries into PLANS.md.

Run: python tools/capture_plans.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from isen_projet_bigdata_a3s6_spark import queries as registry
from isen_projet_bigdata_a3s6_spark.session import get_spark

ANNOTATED = {
    "q01_grouped_agg": "TPC-H Q1 shape: pushed timestamp filter + pruned "
    "6-column ReadSchema -> partial/final HashAggregate, ONE exchange.",
    "q11_join_topk_revenue": "3-way join: every filter pushed to its scan, "
    "both dimension sides broadcast, top-k as TakeOrderedAndProject "
    "(per-partition k, no global sort).",
    "q12_join_multiway": "6-way TPC-H Q5 shape: the 5-row ASIA nation "
    "slice broadcasts onto the customer and supplier legs BEFORE the fact "
    "joins (each leg shrinks ~5x), so the two big equi-joins carry 1/5 of "
    "the naive probe rows; single aggregation exchange.",
    "q16_knn_1nn": "1-NN join via knn_join_1nn_auto: below the work "
    "threshold the known side broadcasts (reference regime); above it the "
    "grid-exact doubling-cell path runs pure equi-joins — no "
    "BroadcastNestedLoopJoin at scale.",
    "q04_dedup_keep_first": "keep-first dedup: one shuffle on the key, "
    "window row_number inside each partition.",
    "q24_tumbling_window": "event-time tumbling window: window struct is "
    "computed map-side, ordinary two-phase aggregation.",
    "q83_asof_join": "AS-OF join as union+tag+window: NO Join node anywhere "
    "— one exchange on user_id, one sort, last_value(ignorenulls) carries "
    "the build payload onto probes.",
    "q84_interval_join": "keyless range join via time bucketing: "
    "SortMergeJoin/ShuffledHashJoin on the bucket key (equi!), range "
    "predicate as post-join filter — no cartesian product.",
    "q87_tfidf": "TF-IDF: explode → two-phase (doc,word) count, vocab-sized "
    "DF side broadcast back — no row ever leaves codegen.",
    "q92_partitioned_layout": "clustered-layout read-back: PartitionFilters "
    "prune 7 of ~30 hive dirs before file listing; ReadSchema is the single "
    "aggregated column.",
    "q94_topk_salted": "skew-safe top-k: two WindowGroupLimit stages — "
    "per-(group,salt) limit spreads a hot group over 32 reducers, "
    "final per-group limit sees ≤ k·32 rows.",
    "q109_min_cost_supplier": "TPC-H Q2 shape: the correlated min is a "
    "window MIN over the natural join key — ONE exchange on l_partkey, no "
    "decorrelated re-join; part/supplier dims join unhinted (broadcast "
    "while they fit, shuffle at scale).",
    "q110_large_orders": "TPC-H Q18 shape: the HAVING aggregate is computed "
    "once and reused as both semi-join filter and output column — lineitem "
    "scanned and shuffled exactly once.",
    "q111_waiting_suppliers": "TPC-H Q21 shape: EXISTS + NOT EXISTS double "
    "correlation collapsed into one per-(order,supplier) aggregate — one "
    "lineitem⋈orders shuffle instead of Catalyst's aggregate-twice "
    "decorrelation; status filter pushed to the orders scan.",
    "q116_heavy_hitters": "sketch-first heavy hitters: Misra–Gries "
    "per-partition candidates (bounded rows out of mapInPandas), broadcast "
    "semi join prunes the exact count to candidates only — the wide "
    "groupBy never shuffles the full key space.",
    "q120_dedup_canonical": "canonical-per-cluster: shuffle key is the "
    "64-bit fingerprint (8 bytes/row, never the document); row_number and "
    "cluster-count share one window partition spec.",
    "q124_ohlc_resample": "OHLC bars: single two-phase aggregate — min_by/"
    "max_by pick open/close with no window pass, no self-join, one "
    "exchange on (user, bucket).",
    "q126_editdist_pairs": "SymSpell pair mining: delete-variant explode → "
    "equi-join on variant strings → exact levenshtein verify — no "
    "cartesian/nested-loop node anywhere.",
    "q128_zorder_layout": "Z-ordered read-back: both range predicates reach "
    "the scan as PushedFilters; the Morton-clustered row groups make those "
    "min/max filters selective on BOTH columns.",
    "q130_weighted_sample": "weighted sampling: priority top-k compiles to "
    "TakeOrderedAndProject — per-partition k, no global sort, no window.",
    "q135_oov_rate": "OOV rate: vocab top-k is TakeOrderedAndProject over "
    "the two-phase token counts; the 50-row vocab broadcasts back — the "
    "corpus explode is scanned once.",
    "q139_max_concurrency": "interval sweep: union is map-side; the only "
    "shuffle is the day-partitioned window — no global ordering anywhere.",
    "q141_bucketed_join": "bucketed co-located join: at sf0.01 the planner "
    "broadcasts the small side (cheaper still); with broadcast disabled "
    "the bucketed SortMergeJoin runs with NO Exchange under it (asserted "
    "on the final AQE plan in tests/test_joins.py) — at scale the join "
    "shuffle is paid once at write time.",
    "q153_shipping_priority": "TPC-H Q3 shape: date filters pushed to both "
    "fact scans, segment-filtered customer joined unhinted (broadcast "
    "while it fits), top-10 compiles to "
    "TakeOrderedAndProject — per-partition k, no global sort.",
    "q158_bloom_join_prune": "Bloom join pruning, literal-predicate form "
    "(Spark's own runtime-bloom move): the 8 KB sketch is inlined as a "
    "bit-test Filter directly above the lineitem scan — below the "
    "exchange, unhoistable — so the semi-join shuffle carries only "
    "probable matches; the false-positive-removing semi join is UNHINTED "
    "(broadcast here where the build side is tiny; sort-merge at scale — "
    "both regimes pinned in tests/test_round3_fixes.py).",
    "q161_jaccard_prefix_join": "prefix-filtered set-similarity join, "
    "fully lazy (round-3 rework — no eager checkpoint, the tree below is "
    "the real one): candidates come from an equi-join on the rarest "
    "prefix tokens only with PPJoin length + positional filters fused "
    "into the join condition; verify joins carry no broadcast hint (the "
    "optimizer broadcasts the doc-set table locally, shuffle-joins at "
    "scale); explicit numPartitions repartitions pin parallelism on the "
    "CPU-bound stages where AQE's byte-based coalescing would "
    "under-provision.",
    "q163_pareto_contribution": "Pareto contribution: the running share "
    "is a two-phase global_running scan over the |parts| aggregate — "
    "range-repartition on (revenue DESC, part), per-partition window "
    "keyed by partition id, |partitions|-row offset broadcast back; no "
    "unpartitioned Window node, the grand total is a one-row broadcast.",
    "q167_kfold_cv_ols": "5-fold CV in one pass: a single two-phase "
    "aggregate builds all per-fold decimal moments; everything after is "
    "5-row algebra — no per-fold rescans, no row duplication.",
    "q176_sequence_packing": "concat-then-chunk sequence packing: ONE "
    "exchange (the per-source window), token counting and the pack-index "
    "arithmetic all inside codegen above it — the sequential dependency "
    "is confined to each source stream, never a global ordering.",
    "q187_embedding_quantize": "per-vector int8 quantization: no "
    "data-sized exchange at scale — higher-order array expressions in one "
    "Project, then a Generate (posexplode) flattening for the driver "
    "canonicalizer; embarrassingly row-parallel at any corpus size (the "
    "round-robin exchange appears only on the single-split local bench "
    "input, see the q202 pattern).",
    "q233_ks_two_sample": "KS via two-phase parallel prefix scan: the only "
    "data-sized exchanges are the groupBy on distinct values and ONE "
    "rangepartitioning; the per-partition windows run in parallel and the "
    "offset window is over |partitions| rows — no single-reducer global "
    "window anywhere.",
    "q240_bm25_topk": "BM25: the term IN-filter reaches the scan side "
    "before the tf groupBy — the corpus never shuffles, only the 3 "
    "posting lists; the |terms|-row df frame joins unhinted, (N, avgdl) "
    "is a 1-row broadcast; top-10 is TakeOrderedAndProject.",
    "q243_weighted_median": "grouped weighted median: distinct-value "
    "weight collapse first, then per-group windows over the SAME "
    "partitioning (one exchange reused by both window frames).",
    "q245_dau_mau": "DAU/MAU stickiness: the feed collapses to distinct "
    "user-days FIRST; the 30× contribution explode runs over that reduced "
    "frame — no distinct-over-range window, one groupBy per granularity.",
    "q257_roc_curve": "ROC/AUC: distinct-threshold collapse, then the "
    "cumulative TP/FP via the two-phase prefix scan (rangepartitioning + "
    "per-partition windows) — no single-reducer window; totals arrive as "
    "a one-row broadcast; trapezoid terms are lag-free arithmetic.",
    "q259_association_rules": "association rules: pair generation is an "
    "equi-join ON THE ORDER KEY over the deduped basket table (cost "
    "Σ basket², never |items|² globally); both item-marginal joins and "
    "the order-count join are broadcasts.",
    "q260_spearman_corr": "Spearman: each variable's midranks come from a "
    "distinct-value collapse + prefix scan (the 50-value quantity table "
    "broadcasts back; the price table shuffle-joins); the moment "
    "aggregate is one two-phase pass over exact integers.",
    "q261_cooccurrence_pmi": "co-occurrence PMI: skip-gram pairs are "
    "zip_with(slice,slice) array codegen INSIDE the row — no self-join, "
    "no posexplode pair join; the only exchanges are the two count "
    "groupBys; vocab-sized marginals join unhinted, scalar totals "
    "broadcast.",
    "q262_cohort_ltv": "cohort LTV: revenue collapses to (cohort, age) "
    "before the cumulative window, which is PARTITIONED BY COHORT — "
    "parallel across cohorts; cohort sizes broadcast.",
    "q266_session_paths": "session paths: sessionize + rank + first-3 "
    "pivot all share the per-user exchange (window specs aligned); the "
    "path count reduces to ≤ |event_types|³ rows.",
    "q272_negative_sampling": "negative sampling: the 8-trial explode "
    "runs over the DISTINCT-customer frame (8·|customers| rows, not "
    "8·|facts|); the anti join shuffles on (cust, item); keep-3 is a "
    "per-customer window above the same exchange.",
    "q275_mahalanobis_outliers": "Mahalanobis outliers: group moments in "
    "one two-phase aggregate; the |groups|-row covariance table "
    "broadcasts onto the scoring pass — the feed is scanned twice, "
    "shuffled never (both aggregates are map-side-combining).",
    "q278_quantile_normalization": "quantile normalization: per-source "
    "midrank windows (partition-parallel), pooled CDF collapsed to "
    "distinct values + prefix scan, and the interval join broadcasts "
    "the value-resolution-bounded CDF table.",
    "q281_retrieval_metrics": "retrieval metrics: the 10-row query set "
    "broadcasts; scoring stays in codegen; per-query ranking is a "
    "partitioned window; the DCG discount curve is a literal array — "
    "no libm at query time.",
    "q282_fairness_audit": "fairness audit: one size-dispatched fact-dim join, "
    "a |segments|-group aggregate of integer counts, and a 1-row gap "
    "frame broadcast back onto the rates.",
    "q287_containment_join": "containment join: one-sided prefix filter — "
    "only the contained side's rarest shingles are join keys against the "
    "container's full token index; candidates dedupe before the "
    "array_intersect verify; no broadcast hints (optimizer decides).",
    "q288_abc_xyz": "ABC-XYZ: both classification axes collapse to the "
    "|parts| frame first; the cumulative share is the q163 two-phase "
    "global_running scan (range partition + offset correction) and the "
    "grand total a 1-row scalar broadcast — no unpartitioned Window over "
    "any frame, never the fact feed.",
    "q290_interval_coverage": "interval coverage: ±1 marks double the "
    "rows map-side; ONE per-user exchange serves the depth window, the "
    "lead, and implicitly the final aggregate's partial phase.",
    "q293_bootstrap_ci": "bootstrap CI: the 50x replicate explode feeds "
    "a 50-group map-side-combining aggregate — rows are expanded in "
    "codegen, never shuffled raw; the CI is a percentile over 50 rows.",
    "q298_energy_distance": "energy distance: both samples collapse to "
    "distinct values behind pushed filters; the three pairwise "
    "expectations are broadcast cross joins over |distinct|-row frames "
    "— value-resolution bounded, never row-level.",
    "q300_curation_pipeline": "curation capstone: ONE lazy plan end to "
    "end — pushdown quality predicates, a single dedup exchange on the "
    "text, per-language window for selection, small-group manifest "
    "aggregate; no ExistingRDD, no eager stage anywhere (asserted in "
    "tests/test_wave33.py).",
}


def _git_head() -> str:
    try:
        import subprocess

        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def main() -> None:
    spark = get_spark(app_name="plans")
    qs = registry.queries()
    out = [
        "# PLANS — captured physical plans (generated by tools/capture_plans.py)",
        "",
        f"Generated from the code state of commit {_git_head()}; this file "
        "lands in the immediately-following docs-only commit, which changes "
        "no query code and therefore no plan.",
        "",
        "Evidence that the engine's plans are the plans you'd want: filters",
        "reach the scans (`PushedFilters`), projections prune (`ReadSchema`),",
        "small sides broadcast, top-k avoids global sorts, aggregations are",
        "two-phase with a single exchange.",
        "",
    ]
    for name, note in ANNOTATED.items():
        df = qs[name](spark, "/root/testdata/sf0.01")
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        # keep the tree + scan details; drop per-node verbosity
        lines = plan.splitlines()
        tree_end = next(
            (i for i, l in enumerate(lines) if l.startswith("(1)")), len(lines)
        )
        tree = lines[:tree_end]
        details = [
            l
            for l in lines[tree_end:]
            if any(
                k in l
                for k in ("PushedFilters", "ReadSchema", "(1) Scan", "Scan parquet")
            )
        ]
        out += [f"## {name}", "", note, "", "```"]
        out += [l.rstrip() for l in tree if l.strip()]
        out += details
        out += ["```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
