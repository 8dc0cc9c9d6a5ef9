"""Single scaling-measurement run: extraction job over a pre-materialized
pages parquet at a given local[N] parallelism. Prints one JSON line
{"cores": N, "docs": n, "sec": s, "docs_per_sec": r}.

Used by bench.py (subprocess per parallelism level) to evidence the
north_rule scaling criterion: same job, same input, N vs 4N cores.

The corpus is replicated REPLICATE x (distinct urls per replica) before
timing: a ~10 s job is dominated by fixed scheduling/stage-barrier cost
(~2.5 s floor measured with a pass-through UDF), which a production job
over 10^12 docs amortizes to nothing. Replication keeps the measured
ratio about steady-state throughput, which is what the north_rule's
cluster-scaling criterion is about.

Usage: python tools/scaling_run.py <cores> <pages_parquet_path> [replicate] [passes]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"scaling-run-{cores}")
        .config("spark.sql.shuffle.partitions", str(2 * cores))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from paddleocr_spark.plans.pipeline import extract_pages

    # Fixed partition count at BOTH parallelism levels: partitions are
    # sized by the data (as on a real cluster), not by executor count, so
    # the job is literally identical and only the core count varies.
    num_partitions = 64 * replicate

    from pyspark.sql import functions as F

    base = spark.read.parquet(pages_path)
    pages = base.select(
        F.concat(F.col("url"), F.lit("#0")).alias("url"), "html"
    )
    for i in range(1, replicate):
        pages = pages.unionAll(
            base.select(
                F.concat(F.col("url"), F.lit(f"#{i}")).alias("url"), "html"
            )
        )
    # Warm the python workers + JIT so the timed run measures throughput,
    # not process spin-up (the reference does 10 warmup iterations too,
    # tools/infer/predict_system.py:201-205).
    extract_pages(pages.limit(4 * cores), num_partitions=cores).write.format(
        "noop"
    ).mode("overwrite").save()

    best = None
    n = 0
    for _ in range(passes):
        t0 = time.time()
        n = extract_pages(pages, num_partitions=num_partitions).count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n,
                "sec": round(best, 2),
                "docs_per_sec": round(n / best, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
