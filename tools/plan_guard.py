"""Registry-wide scale-killer plan guard.

Sweeps EVERY registered query (not just the bench headline set, which
tests/test_round4_fixes.py guards on each pytest run) and flags physical
plans containing a CartesianProduct or a data-sized BroadcastNestedLoopJoin
— the two join strategies that turn into cluster-killers at 100 TB. Runs at
sf0.001 with the broadcast threshold DISABLED (the large-build regime where
nested-loop fallbacks appear; AQE may hide them under the default config).

Sanctioned patterns, each bounded by CONTRACT rather than data volume:
  - 1-row scalar broadcasts (crossJoin of a global aggregate) — the build
    side is exactly one row at any scale;
  - the knn 1-NN small-work regime (auto-dispatches to grid-exact above
    the work threshold);
  - ANN query-side broadcasts (query set ≤ k rows by contract);
  - documented oracle-baseline quadratics (exact all-pairs verification
    twins whose scale path is the LSH/prefix-filter sibling).

Usage: python tools/plan_guard.py [--only q72,q161]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# name -> rationale; every entry must state why the pattern is bounded
SANCTIONED = {
    "q16_knn_1nn": "small-work regime broadcasts the known side; grid-exact "
    "equi-join dispatches above the work threshold (tests/test_joins.py)",
    "q41_ann_bruteforce": "broadcasts the QUERY vectors (bounded-query "
    "contract, functions/similarity.py), corpus side streams",
    "q70_ann_ivf": "broadcasts the probed-query set (bounded-query "
    "contract) and the 8-row centroid table; corpus side streams",
    "q72_embedding_dedup_exact": "exact all-pairs twin is the documented "
    "oracle BASELINE; the scale path is q73 (SRP-LSH banding)",
    "q171_histogram_quantiles": "|qs|-row literal quantile frame x "
    "<=bins-row sketch — both sides bounded by construction, never data",
    "q172_ann_recall": "broadcasts the sampled query set (<=5 rows by "
    "contract) for both the exact and LSH rankings it compares",
    "q193_quantized_ann_recall": "same bounded-query contract as q172, "
    "over the int8-quantized corpus",
    "q206_minhash_eval": "all-pairs ground truth bounded to doc_id < 150 "
    "(~11k pairs) by construction — the tune-before-trust sample",
    "q241_theil_sen": "pairwise slopes over the BOUNDED calendar axis "
    "(|days|^2 after the daily collapse), never row-level pairs",
    "q248_naive_bayes_lang": "per-class scoring cross against the "
    "|langs|-row class table (ISO-language domain, ~10^2 max) — the "
    "token-level work joins by word, never crosses",
    "q278_quantile_normalization": "pooled-CDF build is DISTINCT length "
    "VALUES + prefix sums — value-resolution bounded (docstring), not "
    "row-sized",
    "q298_energy_distance": "pairwise expectations over DISTINCT quantity "
    "values (|v|^2 = 2500 cells after the collapse-first reduction), "
    "never row-level pairs",
    "q273_sequence_pattern": "broadcasts the 3-row literal pattern table "
    "against per-user sequences",
    "q281_retrieval_metrics": "broadcasts the 10-query evaluation set "
    "(bounded-query contract) against the corpus scan",
    "q289_knn_classifier": "broadcasts the held-out test-query set "
    "(bounded by the split contract) against the train scan",
    "q297_haversine_knn": "broadcasts the supplier side (dimension-sized "
    "by schema); the docstring notes the geohash-bucketed equi-join as "
    "the both-sides-large path",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from isen_projet_bigdata_a3s6_spark.queries import queries
    from isen_projet_bigdata_a3s6_spark.session import get_spark

    spark = get_spark(app_name="plan_guard")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    names = sorted(queries())
    if args.only:
        pref = [p.strip() for p in args.only.split(",")]
        names = [n for n in names if any(n.startswith(p) for p in pref)]

    from isen_projet_bigdata_a3s6_spark.plans.guard import scale_killer_flags

    qs = queries()
    offenders, sanctioned_hits, errs, ok = {}, [], [], 0
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            # per-NODE judgment (plans/guard.py): each CartesianProduct /
            # BroadcastNestedLoopJoin is exempt only when its OWN build
            # side is bounded by construction (key-free aggregate or
            # driver-literal scan) — the r03/r04 plan-wide scalar-agg
            # count let a data-sized cartesian hide behind an unrelated
            # global scalar elsewhere in the same query
            flags = scale_killer_flags(df)
        except Exception as e:
            errs.append(f"{name}: {type(e).__name__}")
            continue
        if not flags:
            ok += 1
        elif name in SANCTIONED:
            sanctioned_hits.append(f"{name}: {'+'.join(flags)}")
        else:
            offenders[name] = "+".join(flags)
            print(f"OFFENDER {name}: {offenders[name]}", flush=True)
    for s in sanctioned_hits:
        print(f"SANCTIONED {s}", flush=True)
    for e in errs:
        print(f"ERR {e}", flush=True)
    print(
        f"== plan guard: {ok} clean, {len(sanctioned_hits)} sanctioned, "
        f"{len(offenders)} offenders, {len(errs)} errs / {len(names)} queries"
    )
    return 1 if offenders else 0


if __name__ == "__main__":
    raise SystemExit(main())
