"""Focused bench: time a named subset of registered queries (noop sink,
warm-up + median-of-N) with the same calibration probe as bench.py, so
single-query optimization loops don't pay the full 200-query sweep.

Usage:
    python tools/mini_bench.py [--iters N] query [query ...]
    python tools/mini_bench.py --tier1           # the frozen headline set
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opencode_hive_archon_spark import registry
from opencode_hive_archon_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    iters = 3
    if "--iters" in args:
        i = args.index("--iters")
        iters = int(args[i + 1])
        del args[i : i + 2]
    if "--tier1" in args:
        import bench

        names = list(bench.BENCH_QUERIES)
    else:
        names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mini_bench")
    specs = registry.all_specs()
    spark.range(1000).count()
    from opencode_hive_archon_spark.session import TABLE_NAMES, read_table

    for t in TABLE_NAMES:
        read_table(spark, sf_dir, t).count()

    import bench as B

    calib = B._calibrate(spark)
    print(f"calibration: {calib}", file=sys.stderr)

    for name in names:  # warm-up
        spark.sparkContext.setJobDescription(f"warmup {name}")
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"[warm] {name} {time.perf_counter()-t0:.2f}s", file=sys.stderr)
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(iters):
        for name in names:
            spark.sparkContext.setJobDescription(f"timed {name}")
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            print(f"[timed] {name} {dt:.2f}s", file=sys.stderr)
    calib2 = B._calibrate(spark)
    print(f"calibration (post): {calib2}", file=sys.stderr)
    timings = {
        n: round(statistics.median(ts), 3) for n, ts in samples.items()
    }
    print(
        json.dumps(
            {
                "queries": timings,
                "total": round(sum(timings.values()), 3),
                "calibration_pre": calib,
                "calibration_post": calib2,
            }
        )
    )


if __name__ == "__main__":
    main()
