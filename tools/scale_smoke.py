"""Full-registry scale smoke: execute EVERY registered query at a given
sf_dir end-to-end (noop sink), recording ok/error and wall seconds.

The bench and the scale probe cover the 40 headline queries; the other 260
registry entries only ever execute at sf0.001/sf0.01 (pytest + driver
oracle gates), where int64 overflows, buffer blowups, and quadratic
stages hide below tiny key ranges and row counts. Running the whole
registry once against the sf1 upscale fixture (tools/upscale.py: keys at
the 2^40 shard stride, 10x sf0.1 rows) is the cheapest way to surface the
class of bug the r06 probe caught twice in the headline set alone
(ARITHMETIC_OVERFLOW in multiplicative hashes at production key ranges —
q89/q123/q130/q167/q180/q195 via sampling.py, q279/q300 checksums).

No per-query timeout: local[32] has no safe in-process job kill; instead a
global wall budget (--budget, default 3600 s) stops launching new queries
once exhausted, and the report marks the rest SKIPPED. Queries run in
registry order, so a re-run with a bigger budget extends coverage.

Usage: python tools/scale_smoke.py [sf_dir] [--budget SECONDS]
One JSON line to stdout: {"metric": "scale_smoke", "sf_dir": ...,
"ok": N, "errors": {...}, "skipped": [...], "slowest": {...}}.
Human progress to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from isen_projet_bigdata_a3s6_spark import queries as registry  # noqa: E402
from isen_projet_bigdata_a3s6_spark.session import get_spark  # noqa: E402


def parse_argv(argv: list[str]) -> tuple[str, float]:
    """(sf_dir, budget) from CLI args; hand-rolled so BOTH documented
    forms parse: --budget=N and --budget N. (The old split-on-= loop
    silently ignored the space form and the bare number landed in
    positionals, where it could become sf_dir.) Unknown flags and extra
    positionals are hard errors, never silently absorbed."""
    positional: list[str] = []
    budget = 3600.0
    i = 0

    def _parse_budget(raw: str) -> float:
        # clean SystemExit instead of a raw float() traceback — the
        # docstring promises hard errors for EVERY malformed form
        try:
            return float(raw)
        except ValueError:
            raise SystemExit(
                f"scale_smoke: --budget requires a number, got {raw!r}"
            ) from None

    while i < len(argv):
        a = argv[i]
        if a == "--budget":
            if i + 1 >= len(argv):
                raise SystemExit("scale_smoke: --budget requires a value")
            budget = _parse_budget(argv[i + 1])
            i += 2
        elif a.startswith("--budget="):
            budget = _parse_budget(a.split("=", 1)[1])
            i += 1
        elif a.startswith("--"):
            raise SystemExit(f"scale_smoke: unrecognized flag {a!r}")
        else:
            positional.append(a)
            i += 1
    if len(positional) > 1:
        raise SystemExit(
            f"scale_smoke: unexpected positional arguments {positional[1:]!r}"
        )
    sf_dir = positional[0] if positional else "/tmp/a3s6_scale/sf1"
    return sf_dir, budget


def main() -> None:
    sf_dir, budget = parse_argv(sys.argv[1:])
    spark = get_spark(app_name="scale_smoke")
    qs = registry.queries()
    t_start = time.perf_counter()
    ok, errors, skipped, times = 0, {}, [], {}
    for i, name in enumerate(sorted(qs)):
        if time.perf_counter() - t_start > budget:
            skipped = sorted(qs)[i:]
            break
        spark.catalog.clearCache()
        # prompt the ContextCleaner: shuffle files of UNREFERENCED frames
        # are only deleted after a driver GC notices the references died.
        # Without this, one sanctioned cartesian baseline (q72: 4e8 pairs
        # at sf1) leaves ~70 GB of map outputs on disk and the next two
        # spill-heavy queries die with SPILL_OUT_OF_MEMORY / no-space —
        # observed on the first full sf1 run (q40/q73 collateral failures).
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
        t0 = time.perf_counter()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 2)
            times[name] = dt
            ok += 1
            print(f"[{i + 1}/{len(qs)}] {name}: ok {dt}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — smoke must survive anything
            dt = round(time.perf_counter() - t0, 2)
            msg = str(exc).split("\n", 1)[0][:200]
            errors[name] = msg
            print(f"[{i + 1}/{len(qs)}] {name}: ERROR {dt}s {msg}", file=sys.stderr)
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({
        "metric": "scale_smoke",
        "sf_dir": sf_dir,
        "ok": ok,
        "n_errors": len(errors),
        "errors": errors,
        "n_skipped": len(skipped),
        "skipped": skipped[:20],
        "slowest": slowest,
        "total_sec": round(time.perf_counter() - t_start, 1),
    }))


if __name__ == "__main__":
    main()
