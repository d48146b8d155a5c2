"""SparkSession factory.

One place to configure the engine the way the 100 TB posture demands:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
UTC session timezone (so timestamp results agree with external oracles),
Arrow enabled (fast toPandas / pandas_udf), and a shuffle-partition count
sized for the local test harness but overridable for a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32

# Conf that is correct at every scale; cluster-size-dependent knobs
# (shuffle partitions, maxPartitionBytes) are parameters below.
_BASE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # dims (part/nation/region/supplier) stay broadcast-able well past sf1
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
    # silence the noisy progress bar in test output
    "spark.ui.showConsoleProgress": "false",
    # testdata events.parquet stores TIMESTAMP(NANOS); Spark's reader
    # rejects it unless nanos surface as long (converted to a real
    # timestamp in sources.tables.load_table)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def streaming_conf(rocksdb: bool = True) -> dict[str, str]:
    """Conf for production stateful streaming, to pass as ``extra_conf``.

    The default (HDFS-backed) state store keeps every key in executor
    heap — fine for the test suite's tiny state, an OOM at 100 TB of
    session/window state. RocksDB spills state to local disk with
    bounded block-cache memory, and changelog checkpointing uploads
    per-batch deltas instead of full snapshots, so checkpoint cost
    follows update rate, not state size. Static conf — set before the
    JVM starts (``get_spark(extra_conf=streaming_conf())``).

    Trigger/rate policy (set per-query, not per-session; documented in
    SCALE.md): ``trigger(processingTime=...)`` + per-source rate limits
    (e.g. ``maxFilesPerTrigger``/``maxOffsetsPerTrigger``) for steady
    state, ``trigger(availableNow=True)`` for bounded backfills.
    """
    if not rocksdb:
        return {}
    return {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
        ".enabled": "true",
    }


def get_spark(
    app_name: str = "bigdata1-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the configured SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (``local[*]`` when
    unset) so the same entry points run on the driver harness and on a
    cluster (where ``master`` is supplied by spark-submit and this arg is
    ignored by passing ``master=""``).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_BASE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    )
    if master.startswith("local"):
        # Local mode packs driver + all executor threads into ONE JVM,
        # and Spark's 1g default Xmx starves 32 threads (~31 MB each):
        # measured at sf1, assoc_rules' hash aggregation OOMed the
        # whole context. Size the heap for the harness box instead —
        # env-overridable, and only for local masters (under
        # spark-submit the driver JVM is already running and this conf
        # would be silently ignored).
        conf.setdefault(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
