"""Testdata catalog: load the driver-generated parquet tables and
register them as temp views so both the DataFrame API and spark.sql
can address them by name.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings.

Scale note: these are plain parquet scans — Catalyst pushes filters
and prunes columns into the scan (verify with .explain: PushedFilters,
ReadSchema). At 100 TB the same code works against a partitioned
table root; nothing here materializes or collects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "load_table", "load_all", "register_views", "default_sf_dir"]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that are always broadcast-join candidates.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # With spark.sql.legacy.parquet.nanosAsLong=true the TIMESTAMP
        # (NANOS) column arrives as long epoch-nanos. Convert with
        # integer division (`div`, exact — a double round-trip would
        # lose precision at 1e18 ns) to match DuckDB's native
        # TIMESTAMP_NS view truncated to Spark's microsecond unit.
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the dict."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
