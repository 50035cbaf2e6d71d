"""Scale-trend probe: run the headline bench at two scale factors and flag
queries whose runtime grows FASTER than the data.

The driver's bench only ever sees one SF; this probe is the missing axis —
the 100 TB question is not "how fast at sf0.1" but "what is the exponent".
For each headline query it compares best-of-N times at the small and large
SF and reports the observed time ratio against the data ratio. Because
small-SF times are dominated by fixed job-scheduling overhead (~0.1-0.3 s
per query on local[32]), raw ratios UNDERSTATE growth; we therefore flag on
the large-SF-side work rate instead:

    flagged  iff  t_large > floor  and  t_large / max(t_small, floor)
                  > data_ratio * slack

with floor = 0.4 s (below that, both measurements are scheduling noise) and
slack = 1.5 (box noise is ±50% per NOTES). A query that is linear-in-data
has ratio ≈ data_ratio once t_small clears the overhead floor; a quadratic
one shows ~data_ratio² and trips the flag well before it matters at 100 TB.

data_ratio is PER QUERY, not the nominal sf ratio: the testdata tables do
not all grow uniformly (embeddings grows 4x between sf0.01 and sf0.1 while
every other table grows 10x), so a nominal-ratio flag would grade q218/q41
against data they never read. bench.py already emits per-query input_rows
on stderr; the probe parses that from both runs and falls back to the
sf-suffix ratio only for queries whose input table count is missing.

Usage:  python tools/scale_probe.py [small_sf_dir] [large_sf_dir]
Writes one JSON line to stdout; human table to stderr.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR_S = 0.4
SLACK = 1.5


def run_bench(sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    bench = json.loads(line)
    # the input_rows diagnostics line is on stderr, interleaved with Spark
    # log4j output — find the one line that parses as JSON with that key
    bench["input_rows"] = {}
    for raw in out.stderr.splitlines():
        raw = raw.strip()
        if raw.startswith("{") and '"input_rows"' in raw:
            try:
                bench["input_rows"] = json.loads(raw)["input_rows"]
                break
            except (json.JSONDecodeError, KeyError):
                continue
    return bench


def data_ratio(small: str, large: str) -> float:
    # derive from the sf suffix (testdata dirs are named sf<factor>)
    s = float(small.rstrip("/").rsplit("sf", 1)[-1])
    l = float(large.rstrip("/").rsplit("sf", 1)[-1])
    return l / s


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    large = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dr_nominal = data_ratio(small, large)
    b_small = run_bench(small)
    b_large = run_bench(large)
    rows = []
    flagged = []
    for name, t_l in b_large["queries"].items():
        t_s = b_small["queries"].get(name)
        if t_s is None:
            continue
        r_s = b_small["input_rows"].get(name) or 0
        r_l = b_large["input_rows"].get(name) or 0
        dr = r_l / r_s if r_s > 0 and r_l > 0 else dr_nominal
        ratio = t_l / max(t_s, FLOOR_S)
        is_flagged = t_l > FLOOR_S and ratio > dr * SLACK
        rows.append((name, t_s, t_l, round(ratio, 2), round(dr, 2), is_flagged))
        if is_flagged:
            flagged.append(name)
    print(
        f"{'query':36s} {'t_small':>8s} {'t_large':>8s} {'ratio':>6s} {'data':>6s}  (flag: ratio > data * {SLACK})",
        file=sys.stderr,
    )
    for name, t_s, t_l, ratio, dr, is_f in sorted(rows, key=lambda r: -r[3] / r[4]):
        mark = "  <-- SUPERLINEAR" if is_f else ""
        print(
            f"{name:36s} {t_s:8.3f} {t_l:8.3f} {ratio:6.2f} {dr:5.0f}x{mark}",
            file=sys.stderr,
        )
    print(json.dumps({
        "metric": "scale_probe",
        "data_ratio_nominal": dr_nominal,
        "flagged": flagged,
        "total_small": b_small["value"],
        "total_large": b_large["value"],
        "ratios": {name: r for name, _, _, r, _, _ in rows},
        "data_ratios": {name: d for name, _, _, _, d, _ in rows},
    }))


if __name__ == "__main__":
    main()
