"""Snowflake-like staging view — the reference's ingested table shape.

The reference ingests exactly one table whose schema is the all-string Avro
record ``SnowFlakeTable`` (PRICE, CATEGORY, NAME, UPDATED_AT —
``flink-snowflake/src/main/resources/avro/SnowFlakeTable.avdl:3-8``), with
NAME suggested as shard column and UPDATED_AT as sort column
(reference ``README.md:80-82``). We emulate it as a derived view over the
``orders`` fixture (FIXTURES.md §1), which also exercises the
cast-projection whitelist in both directions: typed → string (staging) and
string → typed (ingest).

This is a pure projection — Catalyst collapses it into the parquet scan, so
the "staging table" costs nothing at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import cast_projection

#: Typed target of the ingest cast (string staging → typed), exercising
#: DOUBLE / VARCHAR / BIGINT / TIMESTAMP branches of the whitelist
#: (SnowflakeToRowDataMapFunction.java:66-84).
SNOWFLAKE_LIKE_TYPED = T.StructType(
    [
        T.StructField("PRICE", T.DoubleType()),
        T.StructField("CATEGORY", T.StringType()),
        T.StructField("NAME", T.LongType()),
        T.StructField("UPDATED_AT", T.TimestampType()),
    ]
)


def snowflake_like(orders: DataFrame) -> DataFrame:
    """All-string staging view shaped like the AVDL record (FIXTURES.md §1)."""
    return orders.select(
        F.col("o_totalprice").cast("string").alias("PRICE"),
        F.col("o_orderpriority").alias("CATEGORY"),      # shard column
        F.col("o_orderkey").cast("string").alias("NAME"),  # unique key
        F.col("o_orderdate").cast("string").alias("UPDATED_AT"),  # sort column
    )


def snowflake_like_typed(orders: DataFrame) -> DataFrame:
    """Round-trip: staging strings cast back to the typed schema (O9)."""
    return cast_projection(snowflake_like(orders), SNOWFLAKE_LIKE_TYPED)
