"""Per-query cost split: DataFrame BUILD (registry call — Python
expression construction) vs FIRST noop execution (analysis + optimize
+ codegen + run) vs STEADY re-execution of the same DataFrame object.

Usage: python scripts/phase_split.py q1 q2 ...

Classifies each query as planning-bound (build+first >> steady) or
data-bound (steady dominates) — guide §1's "decide where the time
goes" step, specialized to the bench's per-call methodology (every
sample pays a fresh registry call).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from data_pipeline_and_visualization_dashboard_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="phase_split")
    registry = entrymod.queries()

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    # warm the JVM + artifact caches once
    noop(registry[names[0]](spark, sf_dir))
    print(f"{'query':38s} {'build':>7s} {'first':>7s} {'steady':>7s}")
    for name in names:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = registry[name](spark, sf_dir)
        t1 = time.perf_counter()
        noop(df)
        t2 = time.perf_counter()
        steady = float("inf")
        for _ in range(2):
            t3 = time.perf_counter()
            noop(df)
            steady = min(steady, time.perf_counter() - t3)
        print(
            f"{name:38s} {t1 - t0:7.3f} {t2 - t1:7.3f} {steady:7.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
