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


def test_schema_drift_added_column_tolerated(spark, staging, tmp_path):
    """The reference tears down and rebuilds on any source schema change
    (README.md:66-67). With a declared target schema the ingestor absorbs
    an *added* source column mid-stream: the new column is dropped by the
    cast projection, every row still lands, and the target schema never
    moves."""
    path, first, rest, orders = staging
    target = orders.schema
    ing = SnowflakeLikeIngestor(
        spark,
        _cfg(_uniq("t_drift")),
        path,
        str(tmp_path / "state"),
        "o_orderkey",
        target_schema=target,
    )
    ing.run_until_drained()
    schema_before = ing.sink.read().schema

    # second wave drifts: a brand-new column appears in the source
    rest.withColumn("o_surprise", F.lit("drifted")).write.mode(
        "append"
    ).parquet(path)
    stats = ing.run_until_drained()
    assert sum(s.rows_ingested for s in stats) == rest.count()
    got = ing.sink.read()
    assert got.schema == schema_before
    assert "o_surprise" not in got.columns
    assert got.count() == orders.count()


def test_schema_drift_bad_value_dead_letters(spark, tmp_path):
    """A value that fails its declared cast must not kill the job
    (SnowflakeToRowDataMapFunction.java:82-83 throws; at scale one bad row
    cannot): with a dead-letter path the row lands with the field nulled
    and the failure is ledgered as (row_key, field, raw)."""
    import pyspark.sql.types as T

    src = spark.createDataFrame(
        [("1", "PRI", "10.5"), ("2", "PRI", "oops"), ("3", "SEC", "7.25")],
        "k string, shard string, price string",
    )
    path = str(tmp_path / "drift_src")
    src.write.mode("overwrite").parquet(path)
    target = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("shard", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    cfg = PipelineConfig(
        source=SnowflakeSourceConfig(
            table="drift", shard_column="shard", sort_column="k", query_size=100
        ),
        sink=IcebergSinkConfig(
            db="default",
            table_name=_uniq("t_dead"),
            partition_fields=("shard",),
            upsert_fields=("k", "shard"),
            operation="upsert",
        ),
    )
    dl = str(tmp_path / "dead_letter")
    ing = SnowflakeLikeIngestor(
        spark,
        cfg,
        path,
        str(tmp_path / "state"),
        "k",
        target_schema=target,
        dead_letter_path=dl,
    )
    ing.run_until_drained()
    got = ing.sink.read()
    assert got.count() == 3  # the bad row still landed
    assert got.filter(F.col("k") == "2").head().price is None
    dead = spark.read.parquet(dl)
    rows = [(r.row_key, r.field, r.raw) for r in dead.collect()]
    assert ("2", "price", "oops") in rows
    assert len([r for r in rows if r[0] == "2"]) == 1


def test_upsert_writes_one_file_per_partition(spark, staging, tmp_path):
    """The partition-aligned repartition before the COW overwrite must
    bound the commit to one file per touched partition — without it every
    shuffle task writes a sliver of every partition and the unseen-mode
    anti-join re-reads the fragments each cycle."""
    import glob

    path, first, rest, orders = staging
    cfg = _cfg(_uniq("t_onefile"))
    ing = SnowflakeLikeIngestor(
        spark, cfg, path, str(tmp_path / "state"), "o_orderkey", mode="unseen"
    )
    ing.run_until_drained()
    n_parts = first.select("o_orderpriority").distinct().count()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    files = glob.glob(f"{wh}/{cfg.sink.table_name}/*/*.parquet")
    assert 0 < len(files) <= n_parts, (
        f"{len(files)} files for {n_parts} partitions"
    )


def test_pagerank_restores_shuffle_conf(spark):
    """The graph-sized shuffle-partition override must be scoped to the
    superstep loop — leaking it would shrink every later query's shuffles."""
    from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.operators.dedup import (
        pagerank_pairs,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    pagerank_pairs(pairs).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_iceberg_branch_sql_generation(spark):
    """The Iceberg-conditional sink branch: generated DDL must match the
    reference's table spec (IcebergTableManager.java:75-90 — identity
    partitioning, format-version 2, merge-on-read upsert) and the MERGE
    must key on the equality fields (IcebergSinkBuilder.java:31-43)."""
    sink = CatalogSink(spark, _cfg(_uniq("t_ice")).sink, version_column="o_orderdate")
    like = load_table(spark, SF, "orders")
    ddl = sink.iceberg_create_sql(like)
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (o_orderpriority)" in ddl
    assert "'format-version'='2'" in ddl
    assert "'write.upsert.enabled'='true'" in ddl
    assert "merge-on-read" in ddl
    merge = sink.iceberg_merge_sql("batch_v")
    assert merge.startswith(f"MERGE INTO {sink.table} t USING batch_v s ON ")
    assert "t.`o_orderkey` = s.`o_orderkey`" in merge
    assert "t.`o_orderpriority` = s.`o_orderpriority`" in merge
    assert "WHEN MATCHED THEN UPDATE SET *" in merge
    assert "WHEN NOT MATCHED THEN INSERT *" in merge


def test_glue_catalog_conf_mapping():
    """The Glue+S3FileIO conf set must mirror the reference's catalog
    properties (IcebergTableManager.java:66-73) in Spark-conf form."""
    from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.sinks.catalog import (
        glue_catalog_confs,
    )

    confs = glue_catalog_confs("glue", "s3://bkt/wh", region="eu-west-1")
    assert confs["spark.sql.catalog.glue"] == "org.apache.iceberg.spark.SparkCatalog"
    assert (
        confs["spark.sql.catalog.glue.catalog-impl"]
        == "org.apache.iceberg.aws.glue.GlueCatalog"
    )
    assert confs["spark.sql.catalog.glue.io-impl"] == "org.apache.iceberg.aws.s3.S3FileIO"
    assert confs["spark.sql.catalog.glue.warehouse"] == "s3://bkt/wh"
    assert confs["spark.sql.catalog.glue.client.region"] == "eu-west-1"
    assert "IcebergSparkSessionExtensions" in confs["spark.sql.extensions"]


def test_iceberg_detection(spark):
    """Capability probe: off in this sandbox; on when the session carries
    the Iceberg extensions or an Iceberg catalog implementation."""

    class _Conf:
        def __init__(self, d):
            self._d = d

        def get(self, k, default=None):
            return self._d.get(k, default)

        def getAll(self):
            return list(self._d.items())

    class _Sess:
        def __init__(self, d):
            self.conf = _Conf(d)
            self.sparkContext = type("SC", (), {"getConf": lambda s: _Conf(d)})()

    assert CatalogSink._iceberg_available(spark) is False
    ext = {"spark.sql.extensions":
           "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"}
    assert CatalogSink._iceberg_available(_Sess(ext)) is True
    cat = {"spark.sql.catalog.glue": "org.apache.iceberg.spark.SparkCatalog"}
    assert CatalogSink._iceberg_available(_Sess(cat)) is True


class _RecordingIcebergSession:
    """SparkSession proxy that makes `_iceberg_available` answer True and
    RECORDS every Iceberg-only SQL statement (CREATE … USING iceberg,
    MERGE INTO, CREATE TAG, VERSION AS OF) instead of executing it — no
    Iceberg jars needed — while delegating everything else (parquet DDL
    for the commits ledger, temp views, conf) to the real session. The
    jar-free twin of `test_iceberg_write_batch_executes` below: it proves
    the SEQUENCE the real cluster would execute."""

    def __init__(self, real):
        self._real = real
        self.recorded: list[str] = []
        self._iceberg_tables: set[str] = set()
        proxy = self

        class _Conf:
            def get(self, k, default=None):
                if k == "spark.sql.extensions":
                    return (
                        "org.apache.iceberg.spark.extensions."
                        "IcebergSparkSessionExtensions"
                    )
                return real.conf.get(k, default)

            def set(self, k, v):
                real.conf.set(k, v)

        class _Catalog:
            def tableExists(self, name):
                if name in proxy._iceberg_tables:
                    return True
                return real.catalog.tableExists(name)

            def __getattr__(self, item):
                return getattr(real.catalog, item)

        self.conf = _Conf()
        self.catalog = _Catalog()

    @staticmethod
    def _iceberg_only(q: str) -> bool:
        return (
            "USING iceberg" in q
            or q.startswith("MERGE INTO")
            or "CREATE OR REPLACE TAG" in q
            or "VERSION AS OF" in q
        )

    def sql(self, q: str):
        if self._iceberg_only(q):
            self.recorded.append(q)
            if "USING iceberg" in q:
                name = q.split("CREATE TABLE IF NOT EXISTS ")[1].split(" ")[0]
                self._iceberg_tables.add(name)
            return self._real.createDataFrame([], "ok int")
        return self._real.sql(q)

    def table(self, name: str):
        if name in self._iceberg_tables:
            # stand-in for the (never actually created) Iceberg table:
            # only its column ORDER is consumed (the _aligned projection)
            return self._real.createDataFrame([], self._like_schema)
        return self._real.table(name)

    def __getattr__(self, item):
        return getattr(self._real, item)


def test_iceberg_commit_sequence_recorded(spark):
    """The jar-free exactly-once contract of the Iceberg branch
    (`_iceberg_write` + `write_batch`, sinks/catalog.py): epoch 1 must
    execute CREATE TABLE … USING iceberg → MERGE INTO (on the equality
    fields) → CREATE TAG epoch_1 in that order; replaying epoch 1 must
    execute NOTHING (ledger skip); epoch 2 must merge+tag WITHOUT a
    second create; and read_as_of must address the epoch tag via
    VERSION AS OF — the commit discipline the reference gets from
    FlinkSink+IcebergTableManager (IcebergSinkBuilder.java:31-43,
    IcebergTableManager.java:75-90)."""
    rec = _RecordingIcebergSession(spark)
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    )
    rec._like_schema = orders.schema
    cfg = _cfg(_uniq("t_icerec")).sink
    sink = CatalogSink(rec, cfg, version_column="o_orderdate", snapshots=True)
    assert sink.iceberg, "proxy must register as an Iceberg session"
    try:
        b1 = orders.limit(50)
        assert sink.write_batch(b1, epoch=1) == "iceberg-upsert"
        seq1 = list(rec.recorded)
        kinds1 = [
            "create" if "USING iceberg" in q
            else "merge" if q.startswith("MERGE INTO")
            else "tag"
            for q in seq1
        ]
        assert kinds1 == ["create", "merge", "tag"], kinds1
        assert "'format-version'='2'" in seq1[0]
        assert "PARTITIONED BY (o_orderpriority)" in seq1[0]
        assert "t.`o_orderkey` = s.`o_orderkey`" in seq1[1]
        assert "t.`o_orderpriority` = s.`o_orderpriority`" in seq1[1]
        assert "WHEN MATCHED THEN UPDATE SET *" in seq1[1]
        assert seq1[2].endswith("CREATE OR REPLACE TAG `epoch_1`")

        # replay: the ledger already holds epoch 1 — nothing may execute
        assert sink.write_batch(b1, epoch=1) == "skipped-replay"
        assert rec.recorded == seq1, "replayed epoch re-executed SQL"

        # epoch 2: merge + tag, no second create-if-not-exists DDL
        assert sink.write_batch(orders.limit(80), epoch=2) == "iceberg-upsert"
        seq2 = rec.recorded[len(seq1):]
        assert [q.startswith("MERGE INTO") for q in seq2] == [True, False]
        assert seq2[1].endswith("CREATE OR REPLACE TAG `epoch_2`")

        # restart parity: a NEW sink over the same ledger skips both
        sink2 = CatalogSink(
            rec, cfg, version_column="o_orderdate", snapshots=True
        )
        n = len(rec.recorded)
        assert sink2.write_batch(b1, epoch=1) == "skipped-replay"
        assert sink2.write_batch(b1, epoch=2) == "skipped-replay"
        assert len(rec.recorded) == n

        # native time travel addresses the epoch tag
        sink.read_as_of(1)
        assert rec.recorded[-1].endswith("VERSION AS OF 'epoch_1'")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {sink.commits}")


@pytest.mark.skipif(
    True,
    reason="no Iceberg jars in this sandbox (package installation is "
    "disallowed). To run on a real cluster: start the session with "
    "--packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:1.5.2 "
    "(or the matching Spark/Scala build), plus "
    "spark.sql.extensions=org.apache.iceberg.spark.extensions."
    "IcebergSparkSessionExtensions and a catalog, e.g. "
    "spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog with "
    "type=hadoop and warehouse=<path>; then drop this skipif. The "
    "jar-free recording stub above pins the same create→MERGE→tag "
    "sequence this test executes for real",
)
def test_iceberg_write_batch_executes(spark, staging, tmp_path):
    """On an Iceberg-enabled session the same write_batch path must commit
    through MERGE INTO and report the iceberg action."""
    path, first, rest, orders = staging
    ing = SnowflakeLikeIngestor(
        spark, _cfg(_uniq("t_icew")), path, str(tmp_path / "state"), "o_orderkey"
    )
    stats = ing.run_until_drained()
    assert any(s.action == "iceberg-upsert" for s in stats)


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


def test_compaction_reduces_files_preserves_data(spark, staging, tmp_path):
    """Table maintenance (Iceberg rewrite_data_files parity): after many
    append commits accrete small files, compact() rewrites each partition
    to one file and the table contents are unchanged."""
    path, first, rest, orders = staging
    cfg = _cfg(_uniq("t_compact"), operation="append")
    sink = CatalogSink(spark, cfg.sink, version_column="o_orderdate")
    batches = first.randomSplit([1.0] * 5, seed=7)
    for i, b in enumerate(batches):
        sink.write_batch(b, epoch=i + 1)
    before = len(sink._data_files())
    total_before = sink.read().count()
    n_parts = sink.read().select("o_orderpriority").distinct().count()
    assert before > n_parts, "test setup should accrete small files"
    after = sink.compact()
    assert after <= n_parts
    assert sink.read().count() == total_before
    spark.sql(f"DROP TABLE IF EXISTS {sink.table}")
    spark.sql(f"DROP TABLE IF EXISTS {sink.commits}")


def test_expire_commits_keeps_trailing_window(spark, staging, tmp_path):
    path, first, rest, orders = staging
    cfg = _cfg(_uniq("t_expire"), operation="append")
    sink = CatalogSink(spark, cfg.sink, version_column="o_orderdate")
    small = first.limit(10)
    for e in range(1, 8):
        sink.write_batch(small, epoch=e)
    assert spark.table(sink.commits).count() == 7
    sink.expire_commits(keep_last=3)
    kept = [r.epoch for r in spark.table(sink.commits).collect()]
    assert sorted(kept) == [5, 6, 7]
    # replay detection still works inside the window
    assert sink.write_batch(small, epoch=7) == "skipped-replay"
    spark.sql(f"DROP TABLE IF EXISTS {sink.table}")
    spark.sql(f"DROP TABLE IF EXISTS {sink.commits}")


def test_iceberg_compact_sql_generation(spark):
    cfg = _cfg(_uniq("t_icecompact"))
    sink = CatalogSink(spark, cfg.sink)
    sql = sink.iceberg_compact_sql()
    assert "rewrite_data_files" in sql and sink.table in sql


def test_stream_ingest_restart_recovers_checkpoint(spark, staging, tmp_path):
    """Fault-tolerance contract (SURVEY §3.4: Spark's commit log plays
    Flink's checkpoint barrier): drain the first half, STOP, land more
    files, restart with the SAME checkpoint — the restarted stream must
    ingest only the new files, never re-deliver old ones, and the final
    table equals the full source exactly once."""
    path, first, rest, orders = staging
    cfg = _cfg(_uniq("t_restart"))
    schema = load_table(spark, SF, "orders").schema
    ckpt = str(tmp_path / "ckpt")

    q1 = stream_ingest(spark, cfg, path, ckpt, schema, available_now=True)
    q1.awaitTermination(120)
    sink = CatalogSink(spark, cfg.sink)
    assert sink.read().count() == first.count()

    # the source grows between runs (the reference's continuous-poll case)
    rest.write.mode("append").parquet(path)
    q2 = stream_ingest(spark, cfg, path, ckpt, schema, available_now=True)
    q2.awaitTermination(120)

    got = sink.read()
    assert got.count() == orders.count()
    assert got.select("o_orderkey").distinct().count() == orders.count()
    assert got.select(*orders.columns).exceptAll(orders).count() == 0
    spark.sql(f"DROP TABLE IF EXISTS {sink.table}")
    spark.sql(f"DROP TABLE IF EXISTS {sink.commits}")


def test_snapshot_time_travel_reconstructs_each_epoch(spark):
    """snapshots=True: read_as_of(e) must equal the table state right
    after commit e, for every e — including partitions untouched by later
    commits (reconstructed from their last snapshot) and partitions that
    didn't exist yet (absent). expire_snapshots keeps the current state
    reconstructible."""
    sink = CatalogSink(
        spark,
        _cfg(_uniq("t_tt")).sink,
        version_column="o_orderdate",
        snapshots=True,
    )
    orders = load_table(spark, SF, "orders")
    batches = [
        orders.filter(F.col("o_orderpriority") == "1-URGENT").limit(50),
        orders.filter(F.col("o_orderpriority") == "5-LOW").limit(40),
        # epoch 3 updates URGENT again (same keys re-upserted)
        orders.filter(F.col("o_orderpriority") == "1-URGENT").limit(20),
    ]
    states = {}
    for e, b in enumerate(batches, start=1):
        sink.write_batch(b, e)
        states[e] = {
            tuple(r) for r in sink.read().select("o_orderkey", "o_orderpriority").collect()
        }
    for e in (1, 2, 3):
        got = {
            tuple(r)
            for r in sink.read_as_of(e).select("o_orderkey", "o_orderpriority").collect()
        }
        assert got == states[e], f"epoch {e} reconstruction mismatch"
    # epoch 1 must NOT contain the 5-LOW partition yet
    assert all(p == "1-URGENT" for _, p in states[1])
    # expiry: drop everything but the trailing 1 commit; current state
    # stays reconstructible (each partition keeps its newest snapshot)
    sink.expire_snapshots(keep_last=1)
    got = {
        tuple(r)
        for r in sink.read_as_of(3).select("o_orderkey", "o_orderpriority").collect()
    }
    assert got == states[3]


def test_snapshot_replay_is_idempotent(spark):
    """A crash between the snapshot write and the ledger record makes the
    replayed epoch re-run _snapshot; the dynamic-overwrite write must
    leave the history identical, never doubled."""
    sink = CatalogSink(
        spark,
        _cfg(_uniq("t_ttr")).sink,
        version_column="o_orderdate",
        snapshots=True,
    )
    orders = load_table(spark, SF, "orders")
    batch = orders.filter(F.col("o_orderpriority") == "1-URGENT").limit(30)
    sink.write_batch(batch, 1)
    before = sink.spark.table(sink.history).count()
    sink._snapshot(batch, 1)  # simulated replay of the unrecorded write
    after = sink.spark.table(sink.history).count()
    assert after == before
    got = {tuple(r) for r in sink.read_as_of(1).select("o_orderkey").collect()}
    cur = {tuple(r) for r in sink.read().select("o_orderkey").collect()}
    assert got == cur


def test_iceberg_time_travel_sql_generation(spark):
    """Under an Iceberg catalog, time travel is native: each commit tags
    its snapshot with the epoch and read_as_of addresses the tag — the
    generated SQL must carry both halves."""
    sink = CatalogSink(
        spark, _cfg(_uniq("t_ice_tt")).sink,
        version_column="o_orderdate", snapshots=True,
    )
    tag = sink.iceberg_tag_sql(7)
    assert tag.startswith(f"ALTER TABLE {sink.table} ")
    assert "CREATE OR REPLACE TAG `epoch_7`" in tag
    as_of = sink.iceberg_as_of_sql(7)
    assert as_of == f"SELECT * FROM {sink.table} VERSION AS OF 'epoch_7'"


def test_ingest_with_snapshots_records_history(spark, staging, tmp_path):
    """snapshots=True through the config surface: a drained ingest leaves
    a reconstructible history whose final as-of state equals the table."""
    path, first, rest, orders = staging
    cfg = _cfg(_uniq("t_snap_ing"))
    cfg = PipelineConfig(
        source=cfg.source,
        sink=IcebergSinkConfig(
            db=cfg.sink.db,
            table_name=cfg.sink.table_name,
            partition_fields=cfg.sink.partition_fields,
            upsert_fields=cfg.sink.upsert_fields,
            operation=cfg.sink.operation,
            snapshots=True,
        ),
    )
    ing = SnowflakeLikeIngestor(
        spark, cfg, path, str(tmp_path / "state"), "o_orderkey"
    )
    ing.run_until_drained()
    hi = ing.sink.last_epoch()
    assert hi >= 1
    cur = {r.o_orderkey for r in ing.sink.read().select("o_orderkey").collect()}
    asof = {
        r.o_orderkey
        for r in ing.sink.read_as_of(hi).select("o_orderkey").collect()
    }
    assert asof == cur


def test_ingest_through_python_datasource_connector(spark, staging, tmp_path):
    """The COMPLETE reference pipeline composed from our own parts: the
    sharded_parquet Python DataSource connector as the ingest engine's
    source_reader (O1 poll + O3 fan-out + O6 paging inside the
    connector), drained by the cycle engine into the catalog sink —
    custom source → runtime → sink, end to end."""
    from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.sources import (
        pysource,
    )

    path, first, rest, orders = staging
    pysource.register(spark)

    def read_via_connector():
        return (
            spark.read.format("sharded_parquet")
            .option("path", path)
            .option("shard_column", "o_orderpriority")
            .option("sort_column", "o_orderdate")
            .load()
        )

    cfg = _cfg(_uniq("t_conn"))
    ing = SnowflakeLikeIngestor(
        spark,
        cfg,
        path,
        str(tmp_path / "state"),
        "o_orderkey",
        mode="unseen",
        source_reader=read_via_connector,
    )
    try:
        ing.run_cycle()
        got = ing.sink.read()
        assert got.count() == first.count()
        # growing source: second cycle picks up exactly the delta
        orders.write.mode("overwrite").parquet(path)
        ing.run_cycle()
        assert ing.sink.read().count() == orders.count()
    finally:
        for t in (ing.sink.table, ing.sink.commits, ing.sink.history):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_purge_keys_erases_live_and_history(spark, tmp_path):
    """Right-to-be-forgotten: after purge_keys the key is gone from the
    live table AND from every time-travel reconstruction; untouched rows
    and epochs survive; an entirely-purged partition disappears."""
    from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.sinks.catalog import (
        CatalogSink,
    )

    cfg = _cfg(_uniq("t_purge")).sink
    sink = CatalogSink(spark, cfg, version_column="o_orderdate", snapshots=True)
    orders = load_table(spark, SF, "orders")
    half = orders.filter(F.col("o_orderkey") % 2 == 0)
    try:
        sink.write_batch(half, 1)
        sink.write_batch(orders, 2)
        victim = orders.orderBy("o_orderkey").limit(1).select(
            "o_orderkey", "o_orderpriority"
        )
        vkey = victim.collect()[0].o_orderkey
        sink.purge_keys(victim)
        assert sink.read().filter(F.col("o_orderkey") == vkey).count() == 0
        for e in (1, 2):
            assert (
                sink.read_as_of(e).filter(F.col("o_orderkey") == vkey).count()
                == 0
            ), f"epoch {e} still exposes the purged key"
        # collateral check: everything else intact
        assert sink.read().count() == orders.count() - 1
        assert sink.read_as_of(2).count() == orders.count() - 1

        # empty-partition case: purge an entire priority class
        wipe = orders.filter(
            F.col("o_orderpriority") == "5-LOW"
        ).select("o_orderkey", "o_orderpriority")
        n_wipe = wipe.count()
        sink.purge_keys(wipe)
        assert sink.read().filter(F.col("o_orderpriority") == "5-LOW").count() == 0
        assert (
            sink.read_as_of(2).filter(F.col("o_orderpriority") == "5-LOW").count()
            == 0
        )
        assert sink.read().count() == orders.count() - 1 - n_wipe
    finally:
        for t in (sink.table, sink.commits, sink.history):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_purge_keys_survives_static_session_mode(spark):
    """The GDPR-path data-loss hazard (round-4 advice): every overwrite
    site must scope partitionOverwriteMode itself.  With the session conf
    forced to 'static' (simulating a crash between snapshot expiry's
    set/restore, or any external caller), purge_keys must still remove
    ONLY the purged key — not every partition that contained no key."""
    cfg = _cfg(_uniq("t_purge_static")).sink
    sink = CatalogSink(spark, cfg, version_column="o_orderdate", snapshots=True)
    orders = load_table(spark, SF, "orders")
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    try:
        sink.write_batch(orders, 1)
        victim = orders.orderBy("o_orderkey").limit(1).select(
            "o_orderkey", "o_orderpriority"
        )
        vkey = victim.collect()[0].o_orderkey
        spark.conf.set(key, "static")  # hostile session state
        sink.purge_keys(victim)
        assert spark.conf.get(key) == "static", "conf not restored"
        assert sink.read().filter(F.col("o_orderkey") == vkey).count() == 0
        # the static-mode hazard: a full-table overwrite would have left
        # only the victim's partition — every other partition must survive
        assert sink.read().count() == orders.count() - 1
        assert sink.read_as_of(1).count() == orders.count() - 1
    finally:
        spark.conf.set(key, prev)
        for t in (sink.table, sink.commits, sink.history):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_purge_keys_null_key_rejected_before_mutation(spark):
    """NULL key values can never match the purge anti-join (the rows would
    silently survive), so purge_keys must validate up front and leave BOTH
    tables untouched — no half-applied purge."""
    cfg = _cfg(_uniq("t_purge_null")).sink
    sink = CatalogSink(spark, cfg, version_column="o_orderdate", snapshots=True)
    orders = load_table(spark, SF, "orders")
    try:
        sink.write_batch(orders, 1)
        n_live = sink.read().count()
        bad = spark.createDataFrame(
            [(1, None), (None, "1-URGENT")],
            "o_orderkey bigint, o_orderpriority string",
        )
        with pytest.raises(ValueError, match="NULL"):
            sink.purge_keys(bad)
        assert sink.read().count() == n_live, "live table mutated"
        assert sink.read_as_of(1).count() == n_live, "history mutated"
    finally:
        for t in (sink.table, sink.commits, sink.history):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


class _IcebergStubSession:
    """Recording stand-in for a Spark session wired to a real Iceberg
    catalog: Iceberg-only statements (CREATE … USING iceberg, MERGE INTO,
    CREATE TAG, VERSION AS OF) are intercepted and logged instead of
    executed — the jar-free proof of the reference's commit discipline
    (IcebergSinkBuilder.java:31-43, IcebergTableManager.java:75-90) —
    while everything else (parquet ledger DDL, temp views, catalog calls)
    delegates to the real session."""

    _INTERCEPT = ("USING iceberg", "MERGE INTO", "CREATE OR REPLACE TAG",
                  "VERSION AS OF")

    def __init__(self, spark, fake_table: str, fake_df):
        self._spark = spark
        self._fake_table = fake_table
        self._fake_df = fake_df
        self.log: list[str] = []
        self.catalog = self._Catalog(spark, fake_table)

    class _Catalog:
        def __init__(self, spark, fake_table):
            self._c = spark.catalog
            self._fake = fake_table

        def tableExists(self, name):
            if name == self._fake:
                return False  # the intercepted CREATE never materializes
            return self._c.tableExists(name)

        def __getattr__(self, item):
            return getattr(self._c, item)

    class _Conf:
        def __init__(self, conf):
            self._c = conf

        def get(self, key, default=None):
            if key == "spark.sql.extensions":
                return "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
            return self._c.get(key, default)

        def __getattr__(self, item):
            return getattr(self._c, item)

    @property
    def conf(self):
        return self._Conf(self._spark.conf)

    def sql(self, statement, *a, **k):
        if any(tok in statement for tok in self._INTERCEPT):
            self.log.append(statement)
            return self._fake_df.limit(0)
        return self._spark.sql(statement, *a, **k)

    def table(self, name):
        if name == self._fake_table:
            return self._fake_df
        return self._spark.table(name)

    def __getattr__(self, item):
        return getattr(self._spark, item)


def test_iceberg_commit_discipline_stub_catalog(spark):
    """Jar-free contract test of the Iceberg branch: per commit the sink
    issues create-if-absent → MERGE INTO (on the equality fields, UPDATE
    SET * / INSERT *) → epoch tag, in that order; a replayed epoch issues
    neither merge nor tag; a second epoch merges and tags again."""
    table = _uniq("ice_stub")
    batch = load_table(spark, SF, "orders").limit(50)
    cfg = _cfg(table).sink
    stub = _IcebergStubSession(spark, f"default.{table}", batch)
    sink = CatalogSink(stub, cfg, version_column="o_orderdate", snapshots=True)
    try:
        assert sink.iceberg, "stub session must probe as Iceberg-capable"

        assert sink.write_batch(batch, 1) == "iceberg-upsert"
        creates = [i for i, s in enumerate(stub.log) if "USING iceberg" in s]
        merges = [i for i, s in enumerate(stub.log) if "MERGE INTO" in s]
        tags = [i for i, s in enumerate(stub.log) if "CREATE OR REPLACE TAG" in s]
        assert len(creates) == 1 and len(merges) == 1 and len(tags) == 1
        assert creates[0] < merges[0] < tags[0], stub.log
        ddl = stub.log[creates[0]]
        assert "'format-version'='2'" in ddl
        assert "'write.upsert.enabled'='true'" in ddl
        assert "PARTITIONED BY (o_orderpriority)" in ddl
        merge = stub.log[merges[0]]
        assert f"MERGE INTO default.{table} t" in merge
        assert "t.`o_orderkey` = s.`o_orderkey`" in merge
        assert "t.`o_orderpriority` = s.`o_orderpriority`" in merge
        assert "WHEN MATCHED THEN UPDATE SET *" in merge
        assert "WHEN NOT MATCHED THEN INSERT *" in merge
        assert "`epoch_1`" in stub.log[tags[0]]

        # replayed epoch: ledger-skipped, no new merge/tag
        n = len(stub.log)
        assert sink.write_batch(batch, 1) == "skipped-replay"
        replay_tail = stub.log[n:]
        assert not [s for s in replay_tail if "MERGE INTO" in s]
        assert not [s for s in replay_tail if "TAG" in s]

        # next epoch: merge + tag again, ordered
        assert sink.write_batch(batch, 2) == "iceberg-upsert"
        merges2 = [i for i, s in enumerate(stub.log) if "MERGE INTO" in s]
        tags2 = [i for i, s in enumerate(stub.log) if "CREATE OR REPLACE TAG" in s]
        assert len(merges2) == 2 and len(tags2) == 2
        assert merges2[1] < tags2[1]
        assert "`epoch_2`" in stub.log[tags2[1]]

        # native as-of addresses the epoch tag
        stub.log.clear()
        sink.read_as_of(2)
        assert any("VERSION AS OF 'epoch_2'" in s for s in stub.log)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS default.{table}__commits")


def test_overwrite_mode_scoping_is_thread_atomic(spark):
    """Two threads scoping different partitionOverwriteMode values through
    the same session must never observe each other's mode inside their
    scope, and the session conf is restored afterward — the data-loss
    interleave _overwrite_mode's lock exists to prevent."""
    import threading

    table = _uniq("ovw_lock")
    cfg = _cfg(table).sink
    sink = CatalogSink(spark, cfg)
    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key, "static")
    seen, errors = [], []

    def worker(mode):
        try:
            for _ in range(10):
                with sink._overwrite_mode(mode):
                    observed = spark.conf.get(key)
                    if observed != mode:
                        seen.append((mode, observed))
        except Exception as e:  # pragma: no cover - diagnostic
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(m,))
        for m in ("dynamic", "static", "dynamic", "static")
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert not seen, f"mode leaked across scopes: {seen[:3]}"
    assert spark.conf.get(key, "static") == before


def test_diff_versions_classifies_changes(spark, tmp_path):
    """Changelog between two committed versions: inserted / deleted /
    updated / unchanged classification with NULL-safe value comparison,
    and counts conserve the union of both states."""
    table = _uniq("diff")
    cfg = _cfg(table).sink
    sink = CatalogSink(spark, cfg, version_column="O_ORDERDATE", snapshots=True)
    schema = (
        "o_orderkey long, o_orderpriority string, o_orderdate string, v string"
    )
    e1 = spark.createDataFrame(
        [(1, "A", "2024-01-01", "x"), (2, "A", "2024-01-01", "y"),
         (3, "B", "2024-01-01", None)],
        schema,
    ).withColumnRenamed("o_orderdate", "O_ORDERDATE")
    # epoch2: key 1 updated, key 2 unchanged, key 3 null->value update,
    # key 4 inserted; deletions need tombstones so none here
    e2 = spark.createDataFrame(
        [(1, "A", "2024-01-01", "x2"), (2, "A", "2024-01-01", "y"),
         (3, "B", "2024-01-01", "z"), (4, "B", "2024-01-01", "w")],
        schema,
    ).withColumnRenamed("o_orderdate", "O_ORDERDATE")
    try:
        sink.write_batch(e1, 1)
        sink.write_batch(e2, 2)
        got = {
            (r.o_orderkey, r.o_orderpriority): r.change_type
            for r in sink.diff_versions(1, 2).collect()
        }
        assert got == {
            (1, "A"): "updated",
            (2, "A"): "unchanged",
            (3, "B"): "updated",
            (4, "B"): "inserted",
        }
        # the reverse diff sees the same history from the other side:
        # the epoch-2 insert becomes a deletion
        rev = {
            (r.o_orderkey, r.o_orderpriority): r.change_type
            for r in sink.diff_versions(2, 1).collect()
        }
        assert rev[(4, "B")] == "deleted"
        assert rev[(2, "A")] == "unchanged"
    finally:
        for t in (sink.table, sink.commits, sink.history):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
