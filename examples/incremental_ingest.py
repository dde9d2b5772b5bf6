"""Incremental ingest with CDC — the "stop re-extracting the world"
example.

The reference pipeline (wstlr/play.py) re-extracts a whole study every
run; this example shows the engine's incremental path on the fixture
tables: bootstrap a versioned base table from `orders`, stream two
days' worth of synthetic change batches (updates, deletes, late
re-inserts) through the replay-idempotent streaming merge, then query
the live table, time-travel to the pre-change version, and vacuum.

Everything here is the tested production surface — operators/cdc.py and
streaming/cdc.py — not demo-only code.

Run:  PYTHONPATH=/root/repo python examples/incremental_ingest.py \
          [sf_dir] [table_dir]
Defaults: /root/testdata/sf0.01  /tmp/orders_cdc
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F


def run(spark, sf_dir: str, table_dir: str) -> None:
    from ncpi_whistler_spark.catalog import load_table
    from ncpi_whistler_spark.streaming.cdc import VersionedTable, run_cdc_stream

    shutil.rmtree(table_dir, ignore_errors=True)
    src = os.path.join(table_dir, "_changes")
    os.makedirs(src)

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )

    # ---- bootstrap: the existing table is version -1, laid out in
    # 32 key-hash buckets so every later publish is INCREMENTAL (only
    # buckets containing changed keys are rewritten; the rest carry
    # over by hard link — O(delta) I/O per batch, not O(base)) --------
    table = VersionedTable(
        os.path.join(table_dir, "table"),
        bucket_cols=["o_orderkey"],
        num_buckets=32,
    )
    table.publish(base, -1)
    print(f"bootstrap: {base.count()} rows -> version -1 (32 buckets)")

    key = F.col("o_orderkey")
    # day 1: price corrections on ~14% of orders; day 2: cancellations
    # plus a second correction wave on a subset of day 1's keys
    days = [
        base.where(key % 7 == 1)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
        .withColumn("__seq", F.lit(1))
        .withColumn("__op", F.lit("U")),
        base.where(key % 11 == 3)
        .withColumn("__seq", F.lit(2))
        .withColumn("__op", F.lit("D"))
        .unionByName(
            base.where(key % 14 == 1)
            .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(2000.0))
            .withColumn("__seq", F.lit(2))
            .withColumn("__op", F.lit("U"))
        ),
    ]

    # stage THEN drain, one day at a time — each drain is a NEW streaming
    # query recovering from the shared checkpoint (a restart boundary);
    # a crash anywhere in between replays the half-applied batch, which
    # the latest-wins merge absorbs as a fixpoint
    for day, batch in enumerate(days, start=1):
        batch.coalesce(1).write.mode("append").parquet(src)
        table = run_cdc_stream(
            spark,
            src,
            batch.schema,
            os.path.join(table_dir, "table"),
            keys=["o_orderkey"],
            seq_col="__seq",
            op_col="__op",
            bucket_cols=["o_orderkey"],
            num_buckets=32,
            vacuum_keep=4,  # bound retention; links keep carried files alive
        )
        live = table.read(spark)
        print(
            f"after day {day}: version {table.current_version()}, "
            f"{live.count()} rows, "
            f"sum_price={live.agg(F.sum('o_totalprice')).first()[0]:.2f}"
        )

    # ---- change feed OUT (what a downstream consumer replays) ----------
    cdf = table.diff(spark, -1, table.current_version(), keys=["o_orderkey"])
    counts = {r["change_op"]: r["count"] for r in cdf.groupBy("change_op").count().collect()}
    print(f"change feed bootstrap->current: {counts}")

    # ---- time travel + retention ---------------------------------------
    v0 = table.read(spark, version=-1)
    print(f"time travel to bootstrap: {v0.count()} rows (deletes undone)")
    removed = table.vacuum(keep=2)
    print(f"vacuum(keep=2) removed {len(removed)} superseded version dirs")
    print(f"retained versions: {table.versions()}")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    table_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/orders_cdc"
    from ncpi_whistler_spark import get_spark

    spark = get_spark(app_name="incremental-ingest-example")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        run(spark, sf_dir, table_dir)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
