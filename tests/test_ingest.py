"""End-to-end tests of the ingestion runtime (SURVEY.md §5.2/5.3): golden
pipeline on sf0.001, pagination-completeness across cycles, upsert replay
safety, new-shard discovery between cycles, and the Structured Streaming
wrapper."""

from __future__ import annotations

import sys
import uuid

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.config import (
    IcebergSinkConfig,
    PipelineConfig,
    SnowflakeSourceConfig,
)
from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.sinks.catalog import (
    CatalogSink,
)
from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.sources.parquet import (
    load_table,
)
from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.streaming.ingest import (
    SnowflakeLikeIngestor,
    stream_ingest,
)

SF = "/root/testdata/sf0.001"


def _uniq(prefix: str) -> str:
    return f"{prefix}_{uuid.uuid4().hex[:8]}"


def _cfg(table: str, operation: str = "upsert") -> PipelineConfig:
    return PipelineConfig(
        source=SnowflakeSourceConfig(
            table="orders",
            shard_column="o_orderpriority",
            sort_column="o_orderdate",
            query_size=200,
        ),
        sink=IcebergSinkConfig(
            db="default",
            table_name=table,
            partition_fields=("o_orderpriority",),
            upsert_fields=("o_orderkey", "o_orderpriority"),
            operation=operation,
        ),
    )


@pytest.fixture()
def staging(spark, tmp_path):
    """Half of orders as the initial staging snapshot; the rest arrives
    later (growing-source simulation)."""
    orders = load_table(spark, SF, "orders")
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    rest = orders.filter(F.col("o_orderkey") % 2 == 1)
    path = str(tmp_path / "staging")
    first.write.mode("overwrite").parquet(path)
    return path, first, rest, orders


@pytest.mark.parametrize("mode", ["unseen", "offset"])
def test_ingest_drains_source_exactly_once(spark, staging, tmp_path, mode):
    path, first, rest, orders = staging
    ing = SnowflakeLikeIngestor(
        spark, _cfg(_uniq("t_drain")), path, str(tmp_path / "state"), "o_orderkey",
        mode=mode,
    )
    stats = ing.run_until_drained()
    assert stats[-1].rows_ingested == 0
    got = ing.sink.read()
    assert got.count() == first.count()
    assert got.select("o_orderkey").distinct().count() == first.count()
    # golden: table contents equal the source slice exactly
    assert got.select(*first.columns).exceptAll(first).count() == 0


def test_ingest_growing_source_and_new_shards(spark, staging, tmp_path):
    path, first, rest, orders = staging
    cfg = _cfg(_uniq("t_grow"))
    ing = SnowflakeLikeIngestor(spark, cfg, path, str(tmp_path / "state"), "o_orderkey")
    ing.run_until_drained()

    # second wave arrives, including a brand-new shard value
    extra = rest.withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("6-NEW-SHARD")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    extra.write.mode("append").parquet(path)
    stats = ing.run_until_drained()
    assert any(s.new_shards > 0 for s in stats)

    got = ing.sink.read()
    assert got.count() == orders.count()
    assert got.filter(F.col("o_orderpriority") == "6-NEW-SHARD").count() > 0


def test_upsert_replay_is_idempotent(spark, staging, tmp_path):
    """Re-running a committed epoch (ledger) and re-ingesting old rows
    (MERGE keys) both leave the table unchanged."""
    path, first, _, _ = staging
    cfg = _cfg(_uniq("t_replay"))
    ing = SnowflakeLikeIngestor(spark, cfg, path, str(tmp_path / "state"), "o_orderkey")
    ing.run_until_drained()
    before = sorted(r.o_orderkey for r in ing.sink.read().collect())

    # ledger replay: same epoch id again
    some = spark.read.parquet(path).limit(50)
    assert ing.sink.write_batch(some, epoch=1) == "skipped-replay"
    # MERGE replay: old rows at a fresh epoch
    assert ing.sink.write_batch(some, epoch=9999) == "upsert"
    after = sorted(r.o_orderkey for r in ing.sink.read().collect())
    assert before == after


def test_append_and_overwrite_modes(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    t = _uniq("t_modes")
    app = CatalogSink(
        spark,
        IcebergSinkConfig(
            db="default", table_name=t, partition_fields=("o_orderpriority",),
            operation="append",
        ),
    )
    batch = orders.limit(100)
    app.write_batch(batch, 1)
    app.write_batch(batch, 2)
    assert app.read().count() == 200  # append duplicates

    ow = CatalogSink(
        spark,
        IcebergSinkConfig(
            db="default", table_name=_uniq("t_ow"),
            partition_fields=("o_orderpriority",), operation="overwrite",
        ),
    )
    ow.write_batch(orders, 1)
    # dynamic overwrite: replacing one partition leaves the others intact
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "o_totalprice", F.lit(0.0)
    )
    ow.write_batch(urgent, 2)
    got = ow.read()
    assert got.count() == orders.count()
    assert got.filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") != 0)).count() == 0
    assert got.filter(F.col("o_orderpriority") != "1-URGENT").filter(F.col("o_totalprice") == 0).count() == 0


def test_stream_ingest_available_now(spark, staging, tmp_path):
    path, first, _, _ = staging
    cfg = _cfg(_uniq("t_stream"))
    schema = load_table(spark, SF, "orders").schema
    q = stream_ingest(
        spark, cfg, path, str(tmp_path / "ckpt"), schema, available_now=True
    )
    q.awaitTermination(120)
    sink = CatalogSink(spark, cfg.sink)
    assert sink.read().count() == first.count()
