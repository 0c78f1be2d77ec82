"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is one operator from SURVEY.md §2.6, expressed as a
pure DataFrame function over the fixture tables; ``oracle_sql()`` holds the
DuckDB twin. Conventions for oracle parity (FIXTURES.md §3):

* every computed column is aliased identically on both sides;
* timestamp outputs are epoch-milliseconds bigints (``*_ms``) — parquet ns
  truncates to µs in both engines, ms-epoch makes hashes deterministic;
* float aggregates are rounded to 4 decimals on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark import (
    operators as ops,
)
from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.schema import (
    ts_ms,
)
from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.sources.parquet import (
    load_table,
)
from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.sources.staging import (
    snowflake_like_typed,
)

SF_SMOKE = "/root/testdata/sf0.001"

# Pipeline roles on the fixtures (FIXTURES.md §1): shard column, sort
# column, upsert equality field per table.
ORDERS_SHARD, ORDERS_SORT, ORDERS_KEY = "o_orderpriority", "o_orderdate", "o_orderkey"
EVENTS_SHARD, EVENTS_SORT, EVENTS_KEY = "event_type", "ts", "event_id"

_ORDERS_OUT = """o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority"""


def _orders_out(df: DataFrame) -> DataFrame:
    """Canonical comparable projection of an orders-shaped DataFrame."""
    return df.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        ts_ms("o_orderdate").alias("o_orderdate_ms"),
        "o_orderpriority",
    )


def _events_out(df: DataFrame) -> DataFrame:
    return df.select(
        "event_id",
        ts_ms("ts").alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference pipeline as one deterministic batch query
    (SURVEY.md §2.6) — snowflake-like staging of sf0.001 ``orders`` → cast
    projection (O9) → per-shard top-N pages (O3+O6) → last-writer-wins
    upsert dedup (O12) → ingested DataFrame."""
    orders = load_table(spark, SF_SMOKE, "orders")
    typed = snowflake_like_typed(orders)  # PRICE,CATEGORY,NAME,UPDATED_AT
    topn = ops.shard_fanout_topn(
        typed, "CATEGORY", "UPDATED_AT", "NAME", n=50, descending=True
    )
    merged = ops.merge_upsert(
        topn.drop("rn"), ["NAME"], "UPDATED_AT", tiebreakers=["PRICE"]
    )
    return merged.select(
        F.col("NAME").alias("order_key"),
        F.col("CATEGORY").alias("category"),
        F.col("PRICE").alias("price"),
        ts_ms("UPDATED_AT").alias("updated_at_ms"),
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_distinct_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2 (ColumnSource.java:42,47): distinct shard values + column name."""
    return ops.distinct_shards(load_table(spark, sf_dir, "customer"), "c_mktsegment")


def q_shard_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 WHERE (SnowflakeProcessFunction.java:93-97): one equality predicate."""
    orders = load_table(spark, sf_dir, "orders")
    return _orders_out(ops.shard_filter(orders, ORDERS_SHARD, "1-URGENT"))


def q_page_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 LIMIT/OFFSET (SnowflakeProcessFunction.java:93-94), deterministic
    via row_number over (sort, key)."""
    orders = load_table(spark, sf_dir, "orders")
    pg = ops.page(
        orders, ORDERS_SHARD, "1-URGENT", ORDERS_SORT, ORDERS_KEY, offset=100, size=100
    )
    return pg.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        ts_ms("o_orderdate").alias("o_orderdate_ms"),
        "o_orderpriority",
        "rn",
    )


def q_incremental_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6+O7 completeness: union of successive pages == the full shard."""
    orders = load_table(spark, sf_dir, "orders")
    total = ops.shard_filter(orders, ORDERS_SHARD, "1-URGENT").count()
    # ~6 pages at any scale factor: page size scales with the shard so the
    # plan stays a bounded union (completeness is independent of page size).
    size = max(500, -(-total // 6))
    n_pages = max(1, -(-total // size))
    un = ops.pages_union(
        orders, ORDERS_SHARD, "1-URGENT", ORDERS_SORT, ORDERS_KEY, size, n_pages
    )
    return _orders_out(un.drop("rn"))


def q_cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9 (SnowflakeToRowDataMapFunction.java:61-85): all-string staging view
    cast to the typed target schema through the whitelist."""
    typed = snowflake_like_typed(load_table(spark, sf_dir, "orders"))
    return typed.select(
        F.col("PRICE").alias("price"),
        F.col("CATEGORY").alias("category"),
        F.col("NAME").alias("order_key"),
        ts_ms("UPDATED_AT").alias("updated_at_ms"),
    )


def q_highwater_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 as a mutation-safe watermark: events beyond each shard's max(ts)
    from a first slice (ts < 2024-01-20)."""
    events = load_table(spark, sf_dir, "events")
    baseline = events.filter(F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
    inc = ops.highwater_increment(events, baseline, EVENTS_SHARD, EVENTS_SORT)
    return _events_out(inc)


def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O12 upsert (IcebergSinkBuilder.java:36-38) batch form: last-writer-
    wins per equality key by version desc."""
    events = load_table(spark, sf_dir, "events")
    merged = ops.merge_upsert(
        events, [EVENTS_KEY], EVENTS_SORT, tiebreakers=["user_id", "value"]
    )
    return _events_out(merged)


def q_overwrite_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O12 overwrite (IcebergSinkBuilder.java:39-40) batch form: replace one
    identity partition's rows with a recomputed slice."""
    orders = load_table(spark, sf_dir, "orders")
    replacement = orders.withColumn("o_orderstatus", F.lit("REPLACED"))
    out = ops.overwrite_partition(orders, replacement, ORDERS_SHARD, "3-MEDIUM")
    return _orders_out(out)


def q_partitioned_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O11 (IcebergTableManager.java:75-81): identity-partition row counts."""
    return ops.partitioned_layout(load_table(spark, sf_dir, "orders"), ORDERS_SHARD)


def q_shard_fanout_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3+O6 composed (StreamingJob.java:95-103): per-shard top-10 by sort
    column — the whole fan-out pipeline as one query."""
    orders = load_table(spark, sf_dir, "orders")
    top = ops.shard_fanout_topn(
        orders, ORDERS_SHARD, ORDERS_SORT, ORDERS_KEY, n=10, descending=True
    )
    return top.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        ts_ms("o_orderdate").alias("o_orderdate_ms"),
        "o_orderpriority",
        "rn",
    )


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min) of events per user — batch twin of
    the streaming session_window operator."""
    events = load_table(spark, sf_dir, "events")
    return ops.session_stats(events, "user_id", EVENTS_SORT, EVENTS_KEY, 1800)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_distinct_shards": q_distinct_shards,
        "q_shard_filter": q_shard_filter,
        "q_page_offset": q_page_offset,
        "q_incremental_union": q_incremental_union,
        "q_cast_projection": q_cast_projection,
        "q_highwater_increment": q_highwater_increment,
        "q_upsert_merge": q_upsert_merge,
        "q_overwrite_partition": q_overwrite_partition,
        "q_partitioned_layout": q_partitioned_layout,
        "q_shard_fanout_topn": q_shard_fanout_topn,
        "q_session_window": q_session_window,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB)
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    return {
        "q_distinct_shards": """
            SELECT DISTINCT 'c_mktsegment' AS shard_col,
                   CAST(c_mktsegment AS VARCHAR) AS shard_value
            FROM customer
        """,
        "q_shard_filter": f"""
            SELECT {_ORDERS_OUT}
            FROM orders WHERE o_orderpriority = '1-URGENT'
        """,
        "q_page_offset": f"""
            SELECT {_ORDERS_OUT}, rn FROM (
                SELECT *, CAST(row_number() OVER (
                    PARTITION BY o_orderpriority
                    ORDER BY o_orderdate, o_orderkey) AS INT) AS rn
                FROM orders
            ) WHERE o_orderpriority = '1-URGENT' AND rn BETWEEN 101 AND 200
        """,
        "q_incremental_union": f"""
            SELECT {_ORDERS_OUT}
            FROM orders WHERE o_orderpriority = '1-URGENT'
        """,
        "q_cast_projection": """
            SELECT CAST(PRICE AS DOUBLE) AS price,
                   CATEGORY AS category,
                   CAST(NAME AS BIGINT) AS order_key,
                   epoch_ms(CAST(UPDATED_AT AS TIMESTAMP)) AS updated_at_ms
            FROM (
                SELECT CAST(o_totalprice AS VARCHAR) AS PRICE,
                       o_orderpriority AS CATEGORY,
                       CAST(o_orderkey AS VARCHAR) AS NAME,
                       CAST(o_orderdate AS VARCHAR) AS UPDATED_AT
                FROM orders
            )
        """,
        "q_highwater_increment": """
            WITH wm AS (
                SELECT event_type, max(ts) AS w
                FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00'
                GROUP BY event_type
            )
            SELECT e.event_id, epoch_ms(e.ts) AS ts_ms, e.user_id,
                   e.event_type, e.value, e.props
            FROM events e LEFT JOIN wm ON e.event_type = wm.event_type
            WHERE wm.w IS NULL OR e.ts > wm.w
        """,
        "q_upsert_merge": """
            SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type,
                   value, props
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY event_id
                    ORDER BY ts DESC, user_id DESC, value DESC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "q_overwrite_partition": f"""
            SELECT {_ORDERS_OUT}
            FROM orders WHERE o_orderpriority <> '3-MEDIUM'
            UNION ALL
            SELECT o_orderkey, o_custkey, 'REPLACED', o_totalprice,
                   epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority
            FROM orders WHERE o_orderpriority = '3-MEDIUM'
        """,
        "q_partitioned_layout": """
            SELECT o_orderpriority AS partition_value,
                   count(*) AS row_count
            FROM orders GROUP BY 1
        """,
        "q_shard_fanout_topn": f"""
            SELECT {_ORDERS_OUT}, rn FROM (
                SELECT *, CAST(row_number() OVER (
                    PARTITION BY o_orderpriority
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS INT) AS rn
                FROM orders
            ) WHERE rn <= 10
        """,
        "q_session_window": """
            WITH flagged AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN prev IS NULL
                                 OR epoch_us(ts) - epoch_us(prev) > 1800000000
                            THEN 1 ELSE 0 END AS is_new
                FROM (
                    SELECT user_id, event_id, ts,
                           lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
                    FROM events
                )
            ), sess AS (
                SELECT user_id, ts,
                       sum(is_new) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
                FROM flagged
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   min(epoch_us(ts)) // 1000 AS start_ms,
                   max(epoch_us(ts)) // 1000 AS end_ms
            FROM sess GROUP BY user_id, session_id
        """,
    }
