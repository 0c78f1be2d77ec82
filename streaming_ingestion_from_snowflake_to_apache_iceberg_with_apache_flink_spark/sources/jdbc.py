"""JDBC source — the real-Snowflake path, shard-parallel.

The reference reads Snowflake twice: a polling ``SELECT DISTINCT <shard>``
(``Operators/Source/ColumnSource.java:38-54``) and a per-shard paginated
``SELECT * ... WHERE shard=? ORDER BY sort LIMIT ? OFFSET ?``
(``Operators/Process/SnowflakeProcessFunction.java:87-119``). Spark-native
form: ``spark.read.jdbc`` with one *predicate per shard value* — each
predicate becomes one input partition, so shards are fetched concurrently by
executors exactly like the reference's keyBy fan-out (README.md:18-20), but
with N executors instead of one task per key.

No Snowflake driver jar ships in the sandbox, but the module is executed
for real against Spark's bundled embedded Derby (``cfg.jdbc_url_override``
+ ``cfg.jdbc_driver`` point any JDBC endpoint in) — the SQL the reference
pushes down (DISTINCT, WHERE, ORDER BY, LIMIT/OFFSET) is all expressible
through Catalyst's JDBC pushdown or the explicit ``predicates=[...]`` list
below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import SnowflakeSourceConfig

SNOWFLAKE_DRIVER = "net.snowflake.client.jdbc.SnowflakeDriver"  # ColumnSource.java:35


def _driver(cfg: SnowflakeSourceConfig) -> str:
    return cfg.jdbc_driver or SNOWFLAKE_DRIVER


def read_distinct_shards(spark: SparkSession, cfg: SnowflakeSourceConfig) -> DataFrame:
    """O1: ``SELECT DISTINCT <shard_col> FROM <table>`` pushed to the source
    (ColumnSource.java:42)."""
    query = f"SELECT DISTINCT {cfg.shard_column} FROM {cfg.table}"
    return (
        spark.read.format("jdbc")
        .option("url", cfg.jdbc_url())
        .option("driver", _driver(cfg))
        .option("query", query)
        .load()
    )


def _quote_literal(value: str) -> str:
    """SQL string literal with embedded quotes escaped by doubling — the
    ANSI form every JDBC backend (Snowflake, Derby, Postgres) accepts.
    Spark's ``predicates=`` API takes WHERE fragments as text, so this is
    the closest available analogue of the reference's parameter binding
    (SnowflakeProcessFunction.java:97, ``setString``): a shard value
    containing ``'`` must not break — or rewrite — the predicate."""
    return "'" + str(value).replace("'", "''") + "'"


def read_shards_parallel(
    spark: SparkSession, cfg: SnowflakeSourceConfig, shard_values: list[str]
) -> DataFrame:
    """O3+O6: one JDBC partition per shard value — the reference's keyBy
    fan-out (StreamingJob.java:95-103) as Spark input partitioning."""
    predicates = [
        f"{cfg.shard_column} = {_quote_literal(v)}" for v in shard_values
    ]
    return spark.read.jdbc(
        url=cfg.jdbc_url(),
        table=cfg.table,
        predicates=predicates,
        properties={"driver": _driver(cfg)},
    )


def read_sharded_source(spark: SparkSession, cfg: SnowflakeSourceConfig) -> DataFrame:
    """The reference's full input composition: poll the distinct shard set
    (ColumnSource.java:38-54), then fan the table read out one JDBC
    partition per shard (SnowflakeProcessFunction.java:87-119's per-shard
    queries, concurrently). The shard list is driver-materialized — it is
    tiny by design in the reference too (one timer per shard value)."""
    shards = [
        str(r[0]) for r in read_distinct_shards(spark, cfg).collect() if r[0] is not None
    ]
    return read_shards_parallel(spark, cfg, sorted(shards))
