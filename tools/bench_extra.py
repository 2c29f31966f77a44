"""Per-query isolation bench (guide §1.4): times declared queries with the
noop sink so every column of every row is computed and the sink costs
nothing.  NOT the frozen bench.py — numbers here are for optimization
work-loop evidence (OPTIMIZATION_r06.md).

Usage: python tools/bench_extra.py [sf_dir] [repeats] [query ...]
Defaults: /root/testdata/sf1.0, 2 repeats, all driver-table bench queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sys.argv[3:] or [
        "pricing_summary", "attr_attach", "dsl_score", "row_number",
        "ngram_dedup", "cosine_topk", "text_stats",
    ]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from netascore_spark.session import build_session
    import __spark_entry__ as E

    spark = build_session(
        app_name="bench-extra", master=f"local[{cpus}]", shuffle_partitions=64,
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = {**E.queries(), **E.extra_queries()}
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        runs = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = runs
        print(f"{name}: {runs}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": int(cpus), "noop_runs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
