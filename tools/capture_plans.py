"""Capture .explain('formatted') for named registered queries into
plans/<tag>/<query>_<suffix>.txt — the judge-checkable plan evidence for
optimization rounds.

Usage:
    python tools/capture_plans.py <tag> <suffix> query [query ...]
e.g.
    python tools/capture_plans.py r18 before join_shuffle dedup_near
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opencode_hive_archon_spark import registry
from opencode_hive_archon_spark.session import get_spark


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture_plans")
    specs = registry.all_specs()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
