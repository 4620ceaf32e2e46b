"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mircv-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    - Arrow enabled: every Python crossing is a vectorized pandas UDF.
    - AQE enabled (+ skew-join handling): runtime re-planning is the
      second line of defense after our explicit head-term salting.
    - shuffle partitions default to 2x cores locally; on a real cluster
      pass an explicit value sized to the input (see operators/index_build).
    - window/object-agg in-memory thresholds raised: the defaults spill
      any window partition over 4096 rows and fall back to sort-based
      aggregation past 128 hash keys — both pessimal for the docid
      window and the per-term collect_list agg on a machine with RAM to
      spare.  Memory-pressure-based spilling still applies.
    - Arrow memory pool pinned to the system allocator: pyarrow's
      bundled jemalloc madvise(MADV_HUGEPAGE)s its arenas, and on this
      sandbox kernel that feeds khugepaged collapse storms (measured
      >11 cores of pure kernel time + TLB-shootdown stalls across all
      JVM threads during wide pandas-UDF stages).  Same reason local
      dirs stay on disk rather than tmpfs: RAM-backed shuffle files
      wake khugepaged/compaction the same way.  Overridable via the
      standard ARROW_DEFAULT_MEMORY_POOL / SPARK_GRAFT_LOCAL_DIR envs.
    """
    cpus = os.cpu_count() or 4
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", cpus)) * 2

    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # 32g on the 128 GiB sandbox = 1 GiB per local[32] worker
        # thread — still lean vs the 2-4 GiB/core a real cluster
        # executor gets.  The previous 12g (375 MiB/thread) OOM'd the
        # 8x data-axis build (4M turns): stage caches + reduce-side
        # collect buffers are sized per task, and task memory must
        # scale with per-core share, not stay flat while parallelism
        # grows.  Overridable via SPARK_GRAFT_DRIVER_MEM.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        # No console progress bars: the bench/driver artifacts capture a
        # bounded output tail, and the \r-escape progress spam can push
        # the headline JSON line out of that capture window.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.windowExec.buffer.in.memory.threshold", "4194304")
        .config("spark.sql.windowExec.buffer.spill.threshold", "4194304")
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()
