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


def get_spark(
    app_name: str = "ncpi-whistler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores when the
    env var is unset); on a real cluster pass ``None`` and let spark-submit
    decide.
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
