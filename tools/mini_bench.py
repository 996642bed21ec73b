"""Subset bench: bench.py's exact methodology on named queries.

Usage: python tools/mini_bench.py <query> [...] [--passes=2]

Same session construction, warm-up, noop-sink timing, per-query
min-of-passes and >1.5s retry as bench.py — so numbers compare 1:1
against BENCH_detail.json entries — but only for the named queries
(optimization-round inner loop; the full bench still runs at round
close). Prints one JSON line {name: best_sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.path.normpath(
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 2
    for a in sys.argv[1:]:
        if a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])

    from psd_project_spark.session import get_spark
    from psd_project_spark.registry import queries

    spark = get_spark(app_name="psd-mini-bench")
    qs = queries()
    from pyspark.sql import functions as F
    from psd_project_spark.sources.registry import TABLES, load_table

    for t in TABLES:
        load_table(spark, SF_DIR, t).count()
    warm = F.pandas_udf(lambda s: s, "double")
    spark.range(64).select(warm(F.col("id").cast("double"))).count()

    timings: dict[str, float] = {}

    def run_once(name: str, tag) -> None:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = min(timings.get(name, dt), dt)
        print(f"[mini] {tag} {name}: {dt}s", file=sys.stderr, flush=True)
        spark.catalog.clearCache()

    for p in range(passes):
        for name in names:
            run_once(name, f"pass{p}")
    for name in [n for n in names if timings[n] > 1.5]:
        run_once(name, "retry")
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
