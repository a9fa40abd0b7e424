"""Isolated per-query A/B timing for optimization work (guide §1.4):
time NAMED declared queries with the noop sink in one warm session.

Not the driver bench (bench.py owns that contract) — this exists so a
candidate change can be measured on exactly the queries it touches
without paying a full 225-query pass per iteration.

Usage: python tools/minibench.py [-n RUNS] <query> [<query> ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    import __spark_entry__ as mod
    from jobanalytics_bigdataproject_spark.session import get_spark

    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("minibench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from jobanalytics_bigdataproject_spark.sources.readers import (
        STAR_TABLES,
        read_table,
    )

    for t in STAR_TABLES:
        read_table(spark, sf_dir, t).count()

    qmap = mod.queries()
    for name in names:
        if name not in qmap:
            print(f"unknown query: {name}", file=sys.stderr)
            return 1
        fn = qmap[name]
        spark.sparkContext.setJobDescription(f"minibench:{name}")
        # one untimed warm run (first-call index/model builds land here,
        # matching bench.py's priming-pass methodology)
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {e}", file=sys.stderr)
            return 1
        runs = []
        for _ in range(n):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        print(
            f"{name}: median={statistics.median(runs):.3f} "
            f"min={min(runs):.3f} runs={[round(r, 3) for r in runs]}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
