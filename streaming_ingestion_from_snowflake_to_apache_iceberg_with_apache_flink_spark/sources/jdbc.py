"""JDBC source — the real-Snowflake path, shard-parallel.

The reference reads Snowflake twice: a polling ``SELECT DISTINCT <shard>``
(``Operators/Source/ColumnSource.java:38-54``) and a per-shard paginated
``SELECT * ... WHERE shard=? ORDER BY sort LIMIT ? OFFSET ?``
(``Operators/Process/SnowflakeProcessFunction.java:87-119``). Spark-native
form: ``spark.read.jdbc`` with one *predicate per shard value* — each
predicate becomes one input partition, so shards are fetched concurrently by
executors exactly like the reference's keyBy fan-out (README.md:18-20), but
with N executors instead of one task per key.

No JDBC driver is present in the sandbox, so this module only *builds* the
reader; tests exercise the parquet stand-in. The SQL the reference pushes
down (DISTINCT, WHERE, ORDER BY, LIMIT/OFFSET) is all expressible through
Catalyst's JDBC pushdown or the explicit ``predicates=[...]`` list below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import SnowflakeSourceConfig

SNOWFLAKE_DRIVER = "net.snowflake.client.jdbc.SnowflakeDriver"  # ColumnSource.java:35


def read_distinct_shards(spark: SparkSession, cfg: SnowflakeSourceConfig) -> DataFrame:
    """O1: ``SELECT DISTINCT <shard_col> FROM <table>`` pushed to the source
    (ColumnSource.java:42)."""
    query = f"SELECT DISTINCT {cfg.shard_column} FROM {cfg.table}"
    return (
        spark.read.format("jdbc")
        .option("url", cfg.jdbc_url())
        .option("driver", SNOWFLAKE_DRIVER)
        .option("query", query)
        .load()
    )


def read_shards_parallel(
    spark: SparkSession, cfg: SnowflakeSourceConfig, shard_values: list[str]
) -> DataFrame:
    """O3+O6: one JDBC partition per shard value — the reference's keyBy
    fan-out (StreamingJob.java:95-103) as Spark input partitioning."""
    predicates = [f"{cfg.shard_column} = '{v}'" for v in shard_values]
    return spark.read.jdbc(
        url=cfg.jdbc_url(),
        table=cfg.table,
        predicates=predicates,
        properties={"driver": SNOWFLAKE_DRIVER},
    )
