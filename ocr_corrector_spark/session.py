"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _java_opts(cpus: int) -> str:
    """Driver-JVM GC options, width-aware.

    On a wide local[] JVM the Java 17 G1 defaults size the GC worker pool
    from the MACHINE's core count (~5/8 · cores), so every young-gen pause
    spins ~20 GC threads against 32 already-busy task threads —
    measured 0.51 s GC at local[8] vs 5.92 s at local[32] on the identical
    job (BENCH/SCALING_DIAGNOSIS.md).  Capping the GC pool to a fraction
    of the TASK width (not the machine width) keeps collection cost
    proportional to the work.  On a real cluster each executor JVM is
    narrow and per-node G1 defaults are fine; this knob matters only for
    the single-JVM local[4N] protocol.  Override with SPARK_GRAFT_JAVA_OPTS.
    """
    override = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if override is not None:
        return override
    gc_threads = max(2, min(8, cpus // 2))
    return (
        f"-XX:ParallelGCThreads={gc_threads} "
        f"-XX:ConcGCThreads={max(1, gc_threads // 4)}"
    )


def get_spark(
    app_name: str = "ocr_corrector_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """local[cpus] session with AQE + Arrow enabled.

    On a real cluster the same confs apply (drop the master); AQE handles
    runtime skew-join splitting and partition coalescing, Arrow batches
    bound Python-worker memory for the UDF stages.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    if shuffle_partitions is None:
        shuffle_partitions = max(32, cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # cap Arrow batch size so Python correction workers stay memory-bound
        # regardless of input partition size (SURVEY.md §4); overridable for
        # width-tuning experiments (smaller batches trade per-batch overhead
        # for cache residency at high local[] width)
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"),
        )
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # stragglers: occasional tasks blocked on environment flakiness get
        # speculatively re-launched — the standard cluster answer, effective
        # in local mode too
        .config("spark.speculation", "true")
        .config("spark.speculation.multiplier", "2")
        .config("spark.speculation.quantile", "0.75")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.driver.extraJavaOptions", _java_opts(cpus))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
