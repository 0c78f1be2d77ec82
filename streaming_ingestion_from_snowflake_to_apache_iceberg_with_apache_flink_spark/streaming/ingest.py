"""The reference job, Spark-native: incremental shard-parallel ingestion.

Reference dataflow (``StreamingJob.java:95-126``): poll distinct shard
values over JDBC → keyBy(shard) → per-key state {offset, timer} → paginated
``SELECT ... LIMIT size OFFSET offset`` per shard → cast → Iceberg sink.

Spark-native re-expression (SURVEY.md §3.4): a micro-batch cycle engine.
Each ``run_cycle``:

1. **discover** — distinct shard values of the source (O1); newcomers are
   bootstrapped at offset 0 (O4; ``new_shards`` diff — the reference
   re-emits everything and no-ops repeats, we diff declaratively);
2. **fetch** — ONE plan computes every shard's next page: rank rows per
   shard with ``row_number`` over (sort, tiebreak) (deterministic fix of
   the reference's bare LIMIT/OFFSET, SURVEY.md §2.2), broadcast-join the
   per-shard offsets, keep ``offset < rn ≤ offset+size``. All shards fetch
   in parallel — the reference's keyBy fan-out became a partition-parallel
   window, no per-key loops, no driver iteration over shards;
3. **cast** — the O9 whitelist projection;
4. **commit** — mode-dispatched sink write (O12) with an epoch ledger, then
   advance offsets transactionally-after-commit (state only moves forward
   once data is durable; replays are absorbed by the epoch ledger and, in
   upsert mode, by the MERGE keys).

Offsets live in a parquet control table keyed by shard value — the
checkpointable analogue of the reference's ``ValueState<Integer>``
(``SnowflakeProcessFunction.java:21-23``). The per-key processing-time
timers (O5) collapse into the cycle cadence: every cycle touches every
shard, which is what the reference converges to when all timers share one
interval.

The Structured Streaming wrapper (``stream_ingest``) runs the same commit
path from ``foreachBatch`` over a file stream, with the checkpoint dir
playing Flink's checkpoint role.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..sinks.catalog import CatalogSink


@dataclass
class CycleStats:
    cycle: int
    shards_seen: int
    new_shards: int
    rows_ingested: int
    action: str


class SnowflakeLikeIngestor:
    """Micro-batch incremental ingestion over a parquet staging source
    standing in for Snowflake (the JDBC path plugs in via
    ``sources.jdbc.read_shards_parallel`` with identical semantics)."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: PipelineConfig,
        source_path: str,
        state_dir: str,
        tiebreaker: str,
        mode: str = "unseen",
        source_reader=None,
        target_schema=None,
        dead_letter_path: str | None = None,
    ):
        """``mode`` picks the incremental-fetch strategy:

        * ``"unseen"`` (default) — mutation-safe: each cycle anti-joins the
          source against the target's equality keys and pages the remaining
          rows per shard. Correct even when late rows interleave in sort
          order (the §2.2 hazard the reference's offsets cannot survive);
          state recovery is free because the target table *is* the state.
          At 100 TB the anti-join is a key-only shuffle join — with a real
          Iceberg target you'd push a bloom filter of target keys instead.
        * ``"offset"`` — reference-faithful per-shard row offsets
          (SnowflakeProcessFunction.java:87-119) made deterministic with a
          tiebreaker; requires sort-stable append-only sources, skips
          nothing under that assumption and never touches target keys.

        ``source_reader`` (optional ``() -> DataFrame``) replaces the
        parquet staging read — e.g. ``lambda: jdbc.read_sharded_source(
        spark, cfg.source)`` for the real JDBC path; everything downstream
        is source-agnostic.

        ``target_schema`` (optional StructType) pins the sink contract and
        turns on schema-drift tolerance: the staging read merges file
        schemas, columns the source *adds* are dropped by the O9 cast
        projection, and the target table's schema never moves. The
        reference requires a teardown/rebuild on any schema change
        (README.md:66-67); here drift is absorbed declaratively. With
        ``dead_letter_path`` set, source values that fail their declared
        cast are additionally recorded as (row_key, field, raw) parquet
        rows (schema.cast_deadletter) instead of silently nulling — the
        job survives, nothing is lost.
        """
        if mode not in ("unseen", "offset"):
            raise ValueError(f"unknown ingest mode {mode!r}")
        if mode == "unseen" and not cfg.sink.upsert_fields:
            raise ValueError("'unseen' mode needs sink.upsert_fields as the key set")
        self.spark = spark
        self.cfg = cfg
        self.mode = mode
        self.source_path = source_path
        self.source_reader = source_reader
        self.target_schema = target_schema
        self.dead_letter_path = dead_letter_path
        self.offsets_path = os.path.join(state_dir, "offsets")
        self.tiebreaker = tiebreaker
        self.sink = CatalogSink(
            spark,
            cfg.sink,
            version_column=cfg.source.sort_column,
            snapshots=cfg.sink.snapshots,
        )
        # resume the epoch counter past durable commits so a restarted
        # driver never reuses a ledgered epoch id
        self._cycle = self.sink.last_epoch()

    # -- state (the ValueState analogue) ------------------------------------

    def load_offsets(self) -> DataFrame:
        if os.path.exists(self.offsets_path):
            return self.spark.read.parquet(self.offsets_path)
        return self.spark.createDataFrame([], "shard_value string, offset long")

    def _save_offsets(self, offsets: DataFrame) -> None:
        tmp = self.offsets_path + ".tmp"
        offsets.coalesce(1).write.mode("overwrite").parquet(tmp)
        back = self.spark.read.parquet(tmp)
        back.write.mode("overwrite").parquet(self.offsets_path)

    # -- one micro-batch cycle ---------------------------------------------

    def _source(self) -> DataFrame:
        if self.source_reader is not None:
            return self.source_reader()
        if self.target_schema is not None:
            # drift tolerance needs the union of file schemas, not the
            # footer of whichever file the reader samples first
            return self.spark.read.option("mergeSchema", "true").parquet(
                self.source_path
            )
        return self.spark.read.parquet(self.source_path)

    def pending_unseen(self, src: DataFrame, shard_vals: list[str]) -> DataFrame:
        """Source rows whose equality keys are not yet in the target.

        The anti-join's target side is pruned to the partitions this batch
        can touch: ``shard_vals`` (the batch's distinct shard set) is tiny
        and already driver-materialized — the reference polls distinct
        shards the same way (``StreamingJob.java:95-101``) — so the literal
        ``isin`` lands in the target scan's ``PartitionFilters``. At 100 TB
        the target read is bounded by the batch's shards, never the table.
        Assumes a key's shard value is stable across cycles (the
        reference's routing assumption: shard IS the key-by column).
        """
        if not self.spark.catalog.tableExists(self.sink.table):
            return src
        keys = list(self.cfg.sink.upsert_fields)
        shard_c = self.cfg.source.shard_column
        tgt = self.sink.read().filter(
            F.col(shard_c).cast("string").isin(shard_vals)
        )
        return src.join(tgt.select(*keys), keys, "left_anti")

    def run_cycle(self) -> CycleStats:
        cfg = self.cfg.source
        src = self._source()
        shard_c = cfg.shard_column

        # O1+O4: discover shards, bootstrap newcomers at offset 0
        current = src.select(
            F.col(shard_c).cast("string").alias("shard_value")
        ).distinct()
        if self.mode == "offset":
            known = self.load_offsets()
        elif self.spark.catalog.tableExists(self.sink.table):
            # unseen mode: the target table is the state — known shards are
            # the partition values already ingested
            known = self.sink.read().select(
                F.col(shard_c).cast("string").alias("shard_value")
            ).distinct().withColumn("offset", F.lit(0))
        else:
            known = self.load_offsets()  # empty schema helper
        offsets = (
            current.join(known.select("shard_value", "offset"), "shard_value", "left")
            .select("shard_value", F.coalesce("offset", F.lit(0)).alias("offset"))
        )
        n_shards = offsets.count()
        n_new = current.join(known.select("shard_value"), "shard_value", "left_anti").count()

        # O6/O7: every shard's next page in one ranked plan
        w = Window.partitionBy(shard_c).orderBy(
            F.col(cfg.sort_column).asc(), F.col(self.tiebreaker).asc()
        )
        if self.mode == "offset":
            ranked = src.withColumn("__rn", F.row_number().over(w))
            page = (
                ranked.join(
                    F.broadcast(offsets),
                    ranked[shard_c].cast("string") == offsets["shard_value"],
                )
                .filter(
                    (F.col("__rn") > F.col("offset"))
                    & (F.col("__rn") <= F.col("offset") + cfg.query_size)
                )
                .drop("shard_value", "offset", "__rn")
            )
        else:  # "unseen": page over rows whose equality keys aren't ingested
            shard_vals = [r.shard_value for r in current.collect()]
            page = (
                self.pending_unseen(src, shard_vals)
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= cfg.query_size)
                .drop("__rn")
            )

        # O9: cast projection against the declared contract — added source
        # columns are dropped, declared columns are cast, failed casts are
        # ledgered to the dead-letter path; without a declared schema the
        # staging is already typed and the cast is the identity.
        if self.target_schema is not None:
            from ..schema import cast_deadletter, cast_projection

            if self.dead_letter_path is not None:
                key = list(self.cfg.sink.upsert_fields)[0]
                cast_deadletter(page, self.target_schema, key).write.mode(
                    "append"
                ).parquet(self.dead_letter_path)
            # with a dead-letter ledger the main path survives bad values
            # (try_cast ⇒ null, the failure already recorded); without one,
            # keep the reference's fail-fast ANSI cast
            page = cast_projection(
                page, self.target_schema, lenient=self.dead_letter_path is not None
            )

        # O12: commit batch
        self._cycle += 1
        rows = page.count()
        action = self.sink.write_batch(page, epoch=self._cycle) if rows else "empty"

        # O7: advance offsets only after the commit is durable
        if rows and self.mode == "offset":
            ingested = (
                page.groupBy(F.col(shard_c).cast("string").alias("shard_value"))
                .agg(F.count(F.lit(1)).alias("__n"))
            )
            advanced = (
                offsets.join(ingested, "shard_value", "left")
                .select(
                    "shard_value",
                    (F.col("offset") + F.coalesce("__n", F.lit(0))).alias("offset"),
                )
            )
            self._save_offsets(advanced)
        return CycleStats(self._cycle, n_shards, n_new, rows, action)

    def run_until_drained(self, max_cycles: int = 100) -> list[CycleStats]:
        """Drain the source: cycles until a pass ingests nothing (the batch
        analogue of ``Trigger.AvailableNow``)."""
        out = []
        for _ in range(max_cycles):
            st = self.run_cycle()
            out.append(st)
            if st.rows_ingested == 0:
                break
        return out


def stream_ingest(
    spark: SparkSession,
    cfg: PipelineConfig,
    source_path: str,
    checkpoint_dir: str,
    schema,
    available_now: bool = True,
    path_glob_filter: str | None = None,
):
    """Structured Streaming wrapper: file-stream source → ``foreachBatch``
    commit through the same CatalogSink (SURVEY.md §3.4). The checkpoint
    dir carries source progress; the sink's epoch ledger absorbs batch
    replays after failure — together: effectively-once.

    ``path_glob_filter`` lets the stream consume one table's files inside
    a shared directory (the file-stream source requires a directory base
    path) — streaming straight off a landing zone without a staging copy.
    """
    sink = CatalogSink(
        spark,
        cfg.sink,
        version_column=cfg.source.sort_column,
        snapshots=cfg.sink.snapshots,
    )

    reader = spark.readStream.schema(schema)
    if path_glob_filter:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    stream = reader.parquet(source_path)

    def commit(batch: DataFrame, epoch: int) -> None:
        if not batch.isEmpty():
            sink.write_batch(batch, epoch)

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{cfg.source.query_interval_ms} milliseconds")
    return writer.start()
