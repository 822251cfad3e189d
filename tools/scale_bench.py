"""Scaling-exponent bench: time a query set at sf0.1 and sf1 in ONE JVM.

VERDICT r7 #6 asks for a decade scale step: generate sf1 (tools/gen_sf.py),
run the tier-1 headline + the dedup ladder + ANN + graph k-hop at both
scales, and record per-query scaling EXPONENTS

    alpha = log(t_sf1 / t_sf0.1) / log(10)

so a super-linear query (alpha > 1) is visible before it matters at 100 TB.
alpha <= ~1 means at-worst-linear growth; alpha < 0.5 means fixed overhead
(JVM/planning/shuffle setup) still dominates at this size — both are fine.

Methodology: one untimed warm-up pass per sf (codegen, parquet footers,
Arrow init), then ITERS timed passes, median per query. Both scales run in
the same JVM back-to-back so compilation state is identical; shared-plan
caches are dropped between scales via unpersist_all().

Writes SCALING_SF1.json at the repo root and prints a summary table.

Usage:  python tools/scale_bench.py [sf_small_dir sf_big_dir]
        (defaults: /root/testdata/sf0.1  /tmp/testdata_sf1/sf1)
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import BENCH_QUERIES, run_query  # noqa: E402
from opencode_hive_archon_spark import registry  # noqa: E402
from opencode_hive_archon_spark.session import (  # noqa: E402
    TABLE_NAMES,
    get_spark,
    read_table,
    unpersist_all,
)

# EXTRA is DERIVED from the registry, not hand-maintained (ADVICE r9: the
# literal list silently skipped late additions). Every registered query
# outside the tier-1 headline set gets decade evidence, so the scaling
# artifact always covers the full inventory — n_queries == len(registry).
EXTRA = [n for n in registry.all_specs() if n not in set(BENCH_QUERIES)]
QUERIES = BENCH_QUERIES + EXTRA

# Auxiliary runs can restrict to a subset (comma-separated names) so new
# queries get decade evidence without re-timing the whole fleet; pair with
# SPARK_GRAFT_SCALE_OUT so the main artifact is never clobbered.
_only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
if _only:
    _only_set = {n.strip() for n in _only.split(",") if n.strip()}
    unknown = _only_set - set(QUERIES)
    if unknown:
        sys.exit(f"SPARK_GRAFT_SCALE_ONLY names not in QUERIES: {sorted(unknown)}")
    QUERIES = [q for q in QUERIES if q in _only_set]

ITERS = int(os.environ.get("SPARK_GRAFT_SCALE_ITERS", "2"))


def time_at(spark, specs, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    for t in TABLE_NAMES:
        read_table(spark, sf_dir, t).count()
    failures: dict[str, str] = {}
    for name in QUERIES:  # warm-up
        try:
            run_query(specs[name].fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 - harness isolation
            failures.setdefault(name, f"warmup {type(exc).__name__}")
    samples: dict[str, list[float]] = {n: [] for n in QUERIES}
    for _ in range(ITERS):
        for name in QUERIES:
            t0 = time.perf_counter()
            try:
                run_query(specs[name].fn(spark, sf_dir))
            except Exception as exc:  # noqa: BLE001
                failures[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:120]}"
                continue
            samples[name].append(time.perf_counter() - t0)
            print(f"[scale] {os.path.basename(sf_dir)} {name} "
                  f"{samples[name][-1]:.2f}s", file=sys.stderr, flush=True)
    timings = {n: round(statistics.median(ts), 3)
               for n, ts in samples.items() if ts}
    return timings, failures


def main() -> None:
    if len(sys.argv) not in (1, 3):
        sys.exit("usage: scale_bench.py [sf_small_dir sf_big_dir]")
    small = sys.argv[1] if len(sys.argv) == 3 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) == 3 else "/tmp/testdata_sf1/sf1"
    # row-count ratio between the two scales (10 for sf0.1->sf1; e.g. 3 for
    # the sf1->sf3 second decade step); output path overridable so the
    # committed SCALING_SF1.json is never clobbered by auxiliary runs
    ratio = float(os.environ.get("SPARK_GRAFT_SCALE_RATIO", "10"))
    out_name = os.environ.get("SPARK_GRAFT_SCALE_OUT", "SCALING_SF1.json")
    spark = get_spark("scale-bench")
    specs = registry.all_specs()
    spark.range(1000).count()

    t_small, fail_small = time_at(spark, specs, small)
    unpersist_all()
    t_big, fail_big = time_at(spark, specs, big)
    unpersist_all()

    rows = {}
    for name in QUERIES:
        a, b = t_small.get(name), t_big.get(name)
        if a is None or b is None:
            continue
        alpha = math.log(max(b, 1e-3) / max(a, 1e-3)) / math.log(ratio)
        rows[name] = {"t_sf0.1": a, "t_sf1": b, "exponent": round(alpha, 3)}

    out = {
        "ratio": ratio,
        "iters": ITERS,
        "sf_small": small,
        "sf_big": big,
        "tier1_total_sf0.1": round(
            sum(t_small.get(n, 0.0) for n in BENCH_QUERIES), 3),
        "tier1_total_sf1": round(
            sum(t_big.get(n, 0.0) for n in BENCH_QUERIES), 3),
        "n_queries": len(rows),
        "n_fail": len(set(fail_small) | set(fail_big)),
        "failures": {**fail_small, **fail_big},
        # exponent estimates from median-of-2 passes carry ~±0.05 noise;
        # flag only meaningfully super-linear growth (alpha > 1.1 ≈ >26%
        # over linear per decade), and report every exponent verbatim below
        "superlinear": sorted(
            n for n, r in rows.items() if r["exponent"] > 1.1),
        "queries": rows,
    }
    path = os.path.join(REPO, out_name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}", file=sys.stderr)
    for name, r in sorted(rows.items(), key=lambda kv: -kv[1]["exponent"]):
        print(f"{r['exponent']:+.3f}  {r['t_sf0.1']:7.2f}s -> "
              f"{r['t_sf1']:7.2f}s  {name}")
    print(f"superlinear (>1.0): {out['superlinear'] or 'none'}")


if __name__ == "__main__":
    main()
