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
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    cores = int(sys.argv[1])
    pages_path = sys.argv[2]
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from pyspark.sql import SparkSession

    # SPARK_GRAFT_MASTER=spark://host:7077 switches from local[N] to a
    # standalone cluster: `cores` becomes spark.cores.max over fixed
    # 8-core executors, so cores=8 vs cores=32 is literally 1 executor
    # vs 4 executors — the north_rule's N vs 4N cluster sizes, each
    # executor a separate JVM with its own shuffle/Arrow/python workers.
    master = os.environ.get("SPARK_GRAFT_MASTER", "")
    builder = (
        SparkSession.builder.appName(f"scaling-run-{cores}")
        .config("spark.sql.shuffle.partitions", str(2 * cores))
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        # PNG payloads are incompressible: shuffle compression is pure
        # CPU burn on the dominant stage
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.shuffle.file.buffer", "1m")
    )
    # Shuffle spill on fast local storage (tmpfs) — the cluster-node
    # analogue of local NVMe shuffle dirs. Measured at 32 cores: the
    # single-JVM machinery share (passthrough job) drops 4.05 -> 2.99 s
    # because 32 concurrent shuffle writers stop contending on the
    # root disk; at 8 cores the effect is small (3.97 -> 3.74 s), so
    # this directly raises the local-mode scaling ceiling.
    # gated on free tmpfs space + SPARK_GRAFT_NO_TMPFS_SHUFFLE opt-out
    # (paddleocr_spark/tuning.py) — never spill into a tight RAM disk
    from paddleocr_spark.tuning import tmpfs_shuffle_dir

    _shm = tmpfs_shuffle_dir()
    if _shm:
        builder = builder.config("spark.local.dir", _shm)
    if master:
        builder = (
            builder.master(master)
            .config("spark.executor.cores", "8")
            .config("spark.cores.max", str(cores))
            .config("spark.executor.memory", "20g")
            .config("spark.executorEnv.PYTHONPATH", _REPO)
        )
    else:
        builder = builder.master(f"local[{cores}]").config(
            "spark.driver.memory", "16g"
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from paddleocr_spark.plans.pipeline import extract_pages

    # Fixed partition count at BOTH parallelism levels: partitions are
    # sized by the data (as on a real cluster), not by executor count, so
    # the job is literally identical and only the core count varies. 128
    # measured best (vs 256: Arrow-batch + task overhead per python
    # worker ate ~15% at 32 cores; vs 64: tail imbalance at 8).
    num_partitions = 128

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
    # SPARK_GRAFT_PASSTHROUGH=1: run the IDENTICAL plan shape (scan ->
    # salted repartition -> mapInPandas) with a UDF that only touches
    # payload lengths — isolates the Spark machinery share (scan +
    # shuffle + Arrow encode/decode + task scheduling) from the kernel
    # share for the scaling decomposition (see tools/decompose_run.py).
    passthrough = os.environ.get("SPARK_GRAFT_PASSTHROUGH", "") == "1"

    def _job(df, num_partitions):
        if not passthrough:
            return extract_pages(df, num_partitions=num_partitions)
        import pandas as pd

        from paddleocr_spark.plans.pipeline import salted_repartition

        def pt(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {"url": pdf["url"], "n": [len(b) for b in pdf["html"]]}
                )

        return salted_repartition(df, num_partitions).mapInPandas(
            pt, "url string, n long"
        )

    # Warm the python workers + JIT so the timed run measures throughput,
    # not process spin-up (the reference does 10 warmup iterations too,
    # tools/infer/predict_system.py:201-205).
    _job(pages.limit(4 * cores), num_partitions=cores).write.format(
        "noop"
    ).mode("overwrite").save()

    best = None
    n = 0
    for _ in range(passes):
        t0 = time.time()
        n = _job(pages, num_partitions=num_partitions).count()
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
