"""SparkSession factory tuned for the engine's workload profile.

The reference engine is single-threaded row-at-a-time Python
(wstlr/extractor.py:130-194); here every knob is chosen for distributed
execution: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), broadcast threshold raised so dimension tables
(region/nation/concept-maps) never shuffle, and Arrow enabled for the few
pandas-UDF escape hatches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf applied to every session the engine creates. All are runtime-safe
#: defaults that also make sense on a real cluster; cluster deployments
#: override via spark-submit --conf.
ENGINE_CONF: dict[str, str] = {
    # Runtime adaptivity: re-plan joins/aggregations with real statistics,
    # coalesce tiny shuffle partitions, split skewed ones.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region/nation/supplier, ConceptMaps, id-maps) are
    # tiny next to fact tables — keep them broadcast so fact-side data
    # never shuffles for a dim join.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for pandas_udf / mapInPandas escape hatches.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp behavior regardless of host timezone.
    "spark.sql.session.timeZone": "UTC",
    # Progress bars corrupt harness/CI output.
    "spark.ui.showConsoleProgress": "false",
    "spark.ui.enabled": "false",
    # The events table is written with parquet TIMESTAMP(NANOS); Spark has
    # no nanos type, so read as long and convert (catalog.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


#: Selectable streaming state-store backends
#: (spark.sql.streaming.stateStore.providerClass). "hdfs" is Spark's
#: default executor-heap provider; "rocksdb" is the disk-backed provider
#: (bundled with Spark) for state that outgrows heap — at 100× state the
#: heap provider is the first thing to fall over, so production
#: checkpoints should start life on RocksDB. The provider is part of the
#: checkpoint's on-disk format: pick one per checkpoint lifetime.
STATE_STORE_PROVIDERS: dict[str, str] = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def get_spark(
    app_name: str = "ncpi-whistler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    state_store: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores when the
    env var is unset); on a real cluster pass ``None`` and let spark-submit
    decide.

    ``state_store`` selects the streaming state-store backend for queries
    started on this session: a :data:`STATE_STORE_PROVIDERS` key
    ("hdfs"/"rocksdb") or a full provider class name. Runtime-settable,
    so it also applies when ``getOrCreate`` returns an existing session.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(ENGINE_CONF)
    if master.startswith("local"):
        # In local mode the driver JVM IS the executor; Spark's 1g default
        # heap OOMs real workloads (first seen: 20k-doc shingle join).
        # Static conf — only effective for the session that starts the JVM.
        conf.setdefault(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        )
        # ~90 registry queries x whole-stage codegen ≈ thousands of
        # generated classes; HotSpot's 240m default code cache fills and
        # silently stops JIT-compiling (later queries run interpreted).
        conf.setdefault(
            "spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m"
        )
    if shuffle_partitions is None:
        # local[N]: one shuffle partition per core is the right grain;
        # AQE coalesces further when maps are small.
        shuffle_partitions = os.cpu_count() or 8
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if state_store is not None:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            STATE_STORE_PROVIDERS.get(state_store, state_store),
        )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an externally-created session
    (e.g. the verification driver's). Static conf is skipped silently."""
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
