"""Partitioned catalog sink — the engine's Iceberg-shaped table layer.

Mirrors the reference's sink semantics (``IcebergSinkBuilder.java:23-46`` +
``IcebergTableManager.java:27-90``). When the session advertises an Iceberg
catalog (``_iceberg_available``), DDL/DML go through the real thing:
``USING iceberg`` format-v2 merge-on-read tables, ``MERGE INTO`` upsert,
``overwritePartitions`` — the reference's equality-delete write profile.
Otherwise (this sandbox) the same operations fall back to parquet tables in
the session catalog with partition-scoped copy-on-write, and nothing above
this module changes:

* ``ensure_table`` — create-if-not-exists, identity-partitioned (O11);
* ``append``     — plain insert (documented by the reference's README,
  rejected by its code; we support it and keep the mode validation);
* ``overwrite``  — *dynamic* partition overwrite: only partitions present
  in the batch are replaced (O12-overwrite);
* ``upsert``     — last-writer-wins MERGE equivalent (O12-upsert): union
  the batch with the current rows of only the *affected partitions*, rank
  per equality key, dynamic-overwrite those partitions back. This is
  copy-on-write merge scoped to touched partitions — at 100 TB the rewrite
  cost is bounded by the partitions a batch touches, never the table.

Exactly-once: every committed batch records its epoch in a ``__commits``
ledger table; ``write_batch`` skips epochs already present, which makes the
``foreachBatch`` replay after a crash idempotent (the Spark commit-log role
of Flink's checkpoint barrier — SURVEY.md §3.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import threading

from ..config import IcebergSinkConfig, UnsupportedOperationError
from ..operators.merge import merge_upsert

#: serializes set→write→restore of the session-global
#: partitionOverwriteMode conf across writer threads (see _overwrite_mode)
_OVERWRITE_MODE_LOCK = threading.RLock()


def glue_catalog_confs(
    catalog_name: str, warehouse: str, *, region: str | None = None
) -> dict[str, str]:
    """Spark-session conf set that wires an Iceberg Glue catalog with
    S3FileIO — the Spark-submit equivalent of the reference's
    CatalogLoader.custom("glue", {type=iceberg, io-impl=S3FileIO,
    warehouse=…, impl=GlueCatalog}) (IcebergTableManager.java:66-73).

    Apply at session build (``for k, v in confs.items():
    builder.config(k, v)``); ``_iceberg_available`` then detects the
    catalog and CatalogSink routes DDL/DML through the Iceberg branch.
    """
    base = f"spark.sql.catalog.{catalog_name}"
    confs = {
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        base: "org.apache.iceberg.spark.SparkCatalog",
        f"{base}.catalog-impl": "org.apache.iceberg.aws.glue.GlueCatalog",
        f"{base}.io-impl": "org.apache.iceberg.aws.s3.S3FileIO",
        f"{base}.warehouse": warehouse,
    }
    if region:
        confs[f"{base}.client.region"] = region
    return confs


class CatalogSink:
    def __init__(
        self,
        spark: SparkSession,
        cfg: IcebergSinkConfig,
        version_column: str | None = None,
        snapshots: bool = False,
    ):
        """``version_column`` orders last-writer-wins for upsert mode (the
        reference relies on Iceberg sequence numbers for this; a batch MERGE
        needs the ordering to be explicit).

        ``snapshots=True`` keeps a per-commit history table enabling
        ``read_as_of(epoch)`` time travel on the parquet fallback (under a
        real Iceberg catalog, ``VERSION AS OF`` is native and the history
        table is unnecessary — see ``read_as_of``)."""
        self.spark = spark
        self.cfg = cfg
        self.version_column = version_column
        self.snapshots = snapshots
        self.table = f"{cfg.db}.{cfg.table_name}"
        self.commits = f"{cfg.db}.{cfg.table_name}__commits"
        self.history = f"{cfg.db}.{cfg.table_name}__history"
        self.iceberg = self._iceberg_available(spark)
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {cfg.db}")

    def _overwrite_mode(self, mode: str):
        """Scope ``spark.sql.sources.partitionOverwriteMode`` around ONE
        write and restore it in ``finally`` — every overwrite site names
        the mode it needs instead of trusting session state.  Relying on a
        session-wide default was a data-loss hazard: if a crash (or any
        other caller) left the conf ``static`` while a dynamic-overwrite
        site ran, the write would erase every partition not present in
        its batch — on the GDPR purge path that is mass deletion.

        The conf is SESSION-global, so two writer threads in one
        SparkSession could still interleave set/restore (e.g. a streaming
        foreachBatch overwrite racing expire_snapshots' static write) and
        execute a dynamic site under static — the process-wide lock below
        makes the set→write→restore sequence atomic.  Serializing
        overwrite WRITES (reads and non-overwrite writes are unaffected)
        is the correct trade: on a real Iceberg catalog overwrite
        atomicity comes from the table format and this fallback path is
        not taken."""
        import contextlib

        key = "spark.sql.sources.partitionOverwriteMode"
        spark = self.spark

        @contextlib.contextmanager
        def scoped():
            with _OVERWRITE_MODE_LOCK:
                prev = spark.conf.get(key, "static")
                spark.conf.set(key, mode)
                try:
                    yield
                finally:
                    spark.conf.set(key, prev)

        return scoped()

    # -- Iceberg branch (format-v2 merge-on-read parity) ---------------------

    @staticmethod
    def _iceberg_available(spark: SparkSession) -> bool:
        """True when the session is wired for Iceberg: the Iceberg SQL
        extensions are loaded or any configured catalog implementation
        mentions Iceberg (the reference assumes this unconditionally via
        its Glue catalog-loader, IcebergTableManager.java:66-73; here it is
        a capability probe so the same sink runs in both worlds)."""
        try:
            ext = spark.conf.get("spark.sql.extensions", "") or ""
        except Exception:
            ext = ""
        if "IcebergSparkSessionExtensions" in ext:
            return True
        try:
            confs = spark.sparkContext.getConf().getAll()
        except Exception:
            return False
        return any(
            k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
            for k, v in confs
        )

    def iceberg_create_sql(self, like: DataFrame) -> str:
        """CREATE TABLE … USING iceberg with identity partitioning and the
        format-v2 + merge-on-read upsert properties the reference sets
        (IcebergTableManager.java:75-90: create-if-absent, then upgrade to
        format-version 2 with upsert enabled; IcebergSinkBuilder.java:36-38
        turns on equality-delete upsert)."""
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in like.schema.fields
        )
        parts = list(self.cfg.partition_fields)
        part_clause = (
            f" PARTITIONED BY ({', '.join(parts)})" if parts else ""
        )
        props = (
            "'format-version'='2', 'write.upsert.enabled'='true', "
            "'write.delete.mode'='merge-on-read', "
            "'write.update.mode'='merge-on-read', "
            "'write.merge.mode'='merge-on-read'"
        )
        return (
            f"CREATE TABLE IF NOT EXISTS {self.table} ({cols}) USING iceberg"
            f"{part_clause} TBLPROPERTIES ({props})"
        )

    def iceberg_merge_sql(self, batch_view: str) -> str:
        """MERGE INTO on the equality fields — the declarative form of the
        reference's equality-delete upsert (IcebergSinkBuilder.java:31-43:
        upsert(true) + equalityFieldColumns). Last-writer-wins comes from
        Iceberg sequence numbers, so no explicit version ordering here."""
        keys = list(self.cfg.upsert_fields)
        on = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
        return (
            f"MERGE INTO {self.table} t USING {batch_view} s ON {on} "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )

    def _iceberg_write(self, batch: DataFrame) -> None:
        """Mode dispatch on a real Iceberg catalog: MERGE INTO for upsert,
        overwritePartitions for overwrite, appendTo for append — the
        metadata-commit forms whose write amplification is per-delete-file,
        not per-partition-rewrite (the COW fallback's profile)."""
        op = self.cfg.operation
        if op == "append":
            batch.writeTo(self.table).append()
        elif op == "overwrite":
            batch.writeTo(self.table).overwritePartitions()
        else:  # upsert
            view = f"__batch_{self.cfg.table_name}"
            batch.createOrReplaceTempView(view)
            try:
                self.spark.sql(self.iceberg_merge_sql(view))
            finally:
                self.spark.catalog.dropTempView(view)

    def iceberg_tag_sql(self, epoch: int) -> str:
        """Name the commit's snapshot after its epoch — Iceberg's native
        durable version handle (``ALTER TABLE … CREATE TAG``), letting
        ``read_as_of`` address commits by epoch instead of snapshot id."""
        return (
            f"ALTER TABLE {self.table} "
            f"CREATE OR REPLACE TAG `epoch_{int(epoch)}`"
        )

    def iceberg_as_of_sql(self, epoch: int) -> str:
        """Native time travel by epoch tag (``VERSION AS OF``) — under an
        Iceberg catalog the snapshot-history table is unnecessary."""
        return (
            f"SELECT * FROM {self.table} VERSION AS OF 'epoch_{int(epoch)}'"
        )

    # -- DDL (O11) ----------------------------------------------------------

    def _managed_location(self, table_name: str) -> str:
        wh = self.spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        db_part = "" if self.cfg.db == "default" else f"{self.cfg.db}.db/"
        return f"{wh}/{db_part}{table_name}"

    def _create_or_reattach(
        self,
        name: str,
        like: DataFrame,
        partitioned: bool,
        part_override: list[str] | None = None,
    ) -> None:
        """Create the table at its managed location via explicit-schema DDL.
        If data files survive from a previous session while the (in-memory)
        catalog registration did not, the same DDL re-attaches them and
        partition recovery restores state — a driver restart resumes
        instead of crashing (the reference gets this from Glue being a
        persistent catalog, IcebergTableManager.java:66-73)."""
        import os

        loc = self._managed_location(name.split(".")[-1])
        if part_override is not None:
            parts = list(part_override)
        else:
            parts = list(self.cfg.partition_fields) if partitioned else []
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in like.schema.fields
        )
        part_clause = f"PARTITIONED BY ({', '.join(parts)})" if parts else ""
        existed = os.path.exists(loc)
        self.spark.sql(
            f"CREATE TABLE {name} ({cols}) USING parquet {part_clause} LOCATION '{loc}'"
        )
        if parts and existed:
            self.spark.catalog.recoverPartitions(name)

    def ensure_table(self, like: DataFrame) -> None:
        """Create-if-not-exists with identity partitioning
        (IcebergTableManager.java:75-90; under an Iceberg catalog the DDL
        carries the format-v2 + merge-on-read TBLPROPERTIES directly)."""
        if not self.spark.catalog.tableExists(self.table):
            if self.iceberg:
                self.spark.sql(self.iceberg_create_sql(like))
            else:
                self._create_or_reattach(self.table, like, partitioned=True)
        if not self.spark.catalog.tableExists(self.commits):
            self._create_or_reattach(
                self.commits,
                self.spark.createDataFrame([], "epoch long"),
                partitioned=False,
            )
        if (
            self.snapshots
            and not self.iceberg  # native tags replace the history table
            and not self.spark.catalog.tableExists(self.history)
        ):
            self._create_or_reattach(
                self.history,
                like.withColumn("__epoch", F.lit(0).cast("long")),
                partitioned=True,
                part_override=["__epoch"] + list(self.cfg.partition_fields),
            )

    def read(self) -> DataFrame:
        return self.spark.table(self.table)

    # -- snapshots / time travel (Iceberg VERSION AS OF parity) --------------

    def _snapshot(
        self, batch: DataFrame, epoch: int, post_state: DataFrame | None = None
    ) -> None:
        """Record the post-commit state of every partition the commit
        touched, tagged with the commit epoch — the parquet fallback's
        manifest: (epoch, partition) → rows.  Write amplification is the
        touched partitions once more per commit, the same bound as the
        upsert COW itself; untouched partitions are never re-recorded
        (their reconstruction reuses their last snapshot).

        ``post_state`` short-circuits the target read-back when the write
        path already materialized the touched partitions' new rows (the
        upsert's checkpointed merge, the overwrite's batch) — the
        snapshot then costs one write, zero extra table scans."""
        parts = list(self.cfg.partition_fields)
        if post_state is not None:
            state = post_state
        else:
            state = self.read()
            if parts:
                touched = batch.select(*parts).distinct()
                state = state.join(
                    F.broadcast(touched), on=parts, how="left_semi"
                )
        snap = state.withColumn("__epoch", F.lit(int(epoch)).cast("long"))
        cols = self.spark.table(self.history).columns
        # dynamic-overwrite the (epoch, partition) directories instead of
        # appending: a crash between this write and the ledger record makes
        # the foreachBatch replay re-run the epoch, and an append would
        # then double every row of the epoch's snapshots. Overwriting the
        # same partitions is idempotent under replay.
        with self._overwrite_mode("dynamic"):
            snap.select(*cols).write.format("parquet").mode(
                "overwrite"
            ).insertInto(self.history, overwrite=True)

    def read_as_of(self, epoch: int) -> DataFrame:
        """The table's state as of commit ``epoch`` (inclusive) — Iceberg's
        ``SELECT … VERSION AS OF`` on the parquet fallback.  Per partition
        value, the rows of its newest snapshot ≤ epoch; partitions first
        written later don't exist yet.  The ``__epoch <= epoch`` predicate
        prunes history partitions at scan time (history is partitioned by
        ``__epoch``), and the newest-snapshot selection is one window over
        the partition columns — metadata-shaped, not table-shaped, because
        only touched-partition snapshots exist.

        Under a real Iceberg catalog use
        ``spark.sql(f"SELECT * FROM {table} VERSION AS OF …")`` instead —
        the history table is a fallback-only artifact."""
        if not self.snapshots:
            raise ValueError("sink built with snapshots=False")
        if self.iceberg:
            return self.spark.sql(self.iceberg_as_of_sql(epoch))
        from pyspark.sql import Window as W

        h = self.spark.table(self.history).filter(F.col("__epoch") <= int(epoch))
        parts = list(self.cfg.partition_fields)
        w = W.partitionBy(*parts) if parts else W.partitionBy(F.lit(1))
        return (
            h.withColumn("__max_e", F.max("__epoch").over(w))
            .filter(F.col("__epoch") == F.col("__max_e"))
            .drop("__epoch", "__max_e")
        )

    def diff_versions(self, from_epoch: int, to_epoch: int) -> DataFrame:
        """Changelog view between two committed versions — Iceberg's
        changelog scan (``table_changes`` / CDC read) on the snapshot
        fallback: every row keyed by the sink's equality fields is
        classified ``inserted`` (absent at ``from_epoch``), ``deleted``
        (absent at ``to_epoch``), ``updated`` (present in both, any
        non-key column differs — NULL-safe comparison), or ``unchanged``.

        Scale shape: one full-outer equi-join of the two as-of states on
        the equality keys (both sides are snapshot reconstructions that
        scan only touched-partition history); classification is a
        map-side projection. Downstream CDC consumers filter out
        ``unchanged`` — kept here so audits can assert conservation
        (counts sum to the union of both states).
        """
        keys = list(self.cfg.upsert_fields)
        a = self.read_as_of(from_epoch)
        b = self.read_as_of(to_epoch)
        vals = [c for c in a.columns if c not in keys]
        al = a.select(
            *[F.col(k).alias(k) for k in keys],
            *[F.col(c).alias(f"__a_{c}") for c in vals],
            F.lit(1).alias("__in_a"),
        )
        bl = b.select(
            *[F.col(k).alias(k) for k in keys],
            *[F.col(c).alias(f"__b_{c}") for c in vals],
            F.lit(1).alias("__in_b"),
        )
        j = al.join(bl, on=keys, how="full_outer")
        changed = None
        for c in vals:
            d = ~F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
            changed = d if changed is None else (changed | d)
        change = (
            F.when(F.col("__in_a").isNull(), F.lit("inserted"))
            .when(F.col("__in_b").isNull(), F.lit("deleted"))
            .when(
                changed if changed is not None else F.lit(False),
                F.lit("updated"),
            )
            .otherwise(F.lit("unchanged"))
        )
        return j.select(*keys, change.alias("change_type"))

    def expire_snapshots(self, keep_last: int = 100) -> None:
        """Iceberg ``expire_snapshots`` parity for the fallback history:
        drop snapshots older than the trailing window EXCEPT each
        partition's newest one (dropping that would lose the partition
        from every reconstruction, current included — the reason Iceberg
        expiry never removes files referenced by the current snapshot)."""
        from pyspark.sql import Window as W

        hi = self.last_epoch()
        parts = list(self.cfg.partition_fields)
        w = W.partitionBy(*parts) if parts else W.partitionBy(F.lit(1))
        h = self.spark.table(self.history)
        keep = (
            h.withColumn("__max_e", F.max("__epoch").over(w))
            .filter(
                (F.col("__epoch") > hi - keep_last)
                | (F.col("__epoch") == F.col("__max_e"))
            )
            .drop("__max_e")
        )
        cols = self.spark.table(self.history).columns
        materialized = keep.select(*cols).localCheckpoint(eager=True)
        # static overwrite: expired epochs' partition directories must GO;
        # dynamic mode would leave them in place because no kept row lands
        # in them.
        with self._overwrite_mode("static"):
            materialized.write.format("parquet").mode("overwrite").insertInto(
                self.history, overwrite=True
            )

    def purge_keys(self, keys: DataFrame) -> None:
        """GDPR-style hard delete: remove every row matching ``keys`` (on
        the sink's equality/upsert fields) from the LIVE table AND from
        every retained snapshot — the right-to-be-forgotten operation
        snapshot stores make hard, because an ordinary delete commit
        leaves the data readable through time travel.

        Scale shape: both rewrites are pruned to the partitions the keys
        live in (the equality fields contain the partition fields, the
        upsert-config invariant), so the cost is touched-partitions
        rewritten once — the equality-delete-compaction bound, not a full
        table rewrite.  Partitions left EMPTY by the purge are dropped via
        DDL (a dynamic overwrite cannot express "this partition now has
        zero rows").  Under an Iceberg catalog issue ``DELETE FROM`` and
        run snapshot expiry instead — tagged snapshots retain purged rows
        until expired, which is exactly why this fallback rewrites its
        history table in place.

        Out-of-band maintenance: no epoch is consumed; ``read_as_of``
        reconstructions afterwards are purge-consistent by construction.
        """
        kcols = list(self.cfg.upsert_fields)
        if not kcols:
            raise ValueError("purge_keys needs upsert_fields as the key set")
        # Validate BEFORE mutating anything: a NULL in any key field can
        # never match the anti-join (such rows would silently survive the
        # purge), and a NULL partition value cannot be expressed in a DROP
        # PARTITION spec — failing mid-loop would leave a half-applied
        # purge (live table rewritten, history not).
        null_pred = None
        for k in kcols:
            c = F.col(k).isNull()
            null_pred = c if null_pred is None else (null_pred | c)
        if keys.filter(null_pred).limit(1).count() > 0:
            raise ValueError(
                "purge_keys: NULL values in key fields "
                f"{kcols} — NULL keys never match rows and cannot be purged"
            )
        if self.iceberg:
            keys.createOrReplaceTempView("__purge_keys")
            on = " AND ".join(f"t.{k} = p.{k}" for k in kcols)
            self.spark.sql(
                f"DELETE FROM {self.table} t WHERE EXISTS ("
                f"SELECT 1 FROM __purge_keys p WHERE {on})"
            )
            return
        parts = list(self.cfg.partition_fields)
        kset = keys.select(*kcols).distinct().localCheckpoint(eager=True)
        targets = [(self.table, parts)]
        if self.snapshots and self.spark.catalog.tableExists(self.history):
            targets.append((self.history, ["__epoch"] + parts))
        for name, pcols in targets:
            tbl = self.spark.table(name)
            scoped = (
                tbl.join(F.broadcast(kset.select(*parts).distinct()), on=parts,
                         how="left_semi")
                if parts
                else tbl
            )
            kept = scoped.join(F.broadcast(kset), on=kcols, how="left_anti")
            cols = tbl.columns
            materialized = kept.select(*cols).localCheckpoint(eager=True)
            if pcols:
                # partitions the purge emptied entirely: no kept row lands
                # there, so the dynamic overwrite skips them — drop by DDL
                before = scoped.select(*pcols).distinct()
                after = materialized.select(*pcols).distinct()

                def _part_lit(val):
                    # always a quoted, quote-escaped string literal: the
                    # partition spec parser casts to the partition type, so
                    # dates/ints round-trip; naked interpolation broke on
                    # dates, quotes, and NULLs
                    if val is None:
                        raise ValueError(
                            "purge_keys: NULL partition value cannot be "
                            "dropped via partition spec"
                        )
                    return "'" + str(val).replace("'", "''") + "'"

                for r in before.exceptAll(after).collect():
                    spec = ", ".join(f"`{c}` = {_part_lit(r[c])}" for c in pcols)
                    self.spark.sql(
                        f"ALTER TABLE {name} DROP IF EXISTS PARTITION ({spec})"
                    )
            # dynamic mode scoped HERE, not inherited from the session: a
            # static overwrite at this point would erase every partition
            # that contained no purge key.
            with self._overwrite_mode("dynamic"):
                materialized.write.format("parquet").mode("overwrite").insertInto(
                    name, overwrite=True
                )

    # -- exactly-once ledger ------------------------------------------------

    # The epoch ledger is METADATA — one row per commit — so its reads and
    # appends are driver-side file operations, not distributed jobs: a
    # one-row Spark write costs a full job-launch round trip (~0.5 s of
    # scheduler latency at ANY data scale, three times per commit), which
    # is why Iceberg's own commit protocol does its metadata writes on the
    # driver. The ledger stays a registered parquet TABLE (external
    # readers and expire_commits use spark.table) — the driver appends
    # atomically (write temp + rename) into its location and refreshes the
    # catalog's cached file listing. In-memory epoch set is a cache only;
    # a fresh sink instance rebuilds it from the files (restart-safe under
    # the documented single-writer-per-table contract).

    def _ledger_location(self) -> str:
        return self._managed_location(f"{self.cfg.table_name}__commits")

    def _ledger_epochs(self) -> set[int]:
        if getattr(self, "_epochs_cache", None) is None:
            import glob
            import os

            import pyarrow.parquet as pq

            loc = self._ledger_location()
            epochs: set[int] = set()
            for p in glob.glob(os.path.join(loc, "*")):
                base = os.path.basename(p)
                if not os.path.isfile(p) or base.startswith((".", "_")):
                    continue
                col = pq.read_table(p, columns=["epoch"]).column("epoch")
                epochs.update(int(v) for v in col.to_pylist() if v is not None)
            self._epochs_cache = epochs
        return self._epochs_cache

    def _ledger_invalidate(self) -> None:
        self._epochs_cache = None

    def last_epoch(self) -> int:
        """Highest committed epoch (0 if none) — lets a restarted driver
        resume its epoch counter past what is already durable."""
        epochs = self._ledger_epochs()
        return max(epochs) if epochs else 0

    def _committed(self, epoch: int) -> bool:
        return int(epoch) in self._ledger_epochs()

    def _record(self, epoch: int) -> None:
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        loc = self._ledger_location()
        os.makedirs(loc, exist_ok=True)
        name = f"epoch-{int(epoch)}-{uuid.uuid4().hex[:8]}.parquet"
        tmp = os.path.join(loc, f".{name}.tmp")  # dot-prefixed: invisible to scans
        pq.write_table(
            pa.table({"epoch": pa.array([int(epoch)], type=pa.int64())}), tmp
        )
        os.rename(tmp, os.path.join(loc, name))  # atomic publish
        self._ledger_epochs().add(int(epoch))
        # drop the catalog's cached file listing so spark.table(commits)
        # sees the new marker (driver-only, no job)
        self.spark.catalog.refreshTable(self.commits)

    # -- modes (O12) --------------------------------------------------------

    def write_batch(self, batch: DataFrame, epoch: int) -> str:
        """Mode-dispatched commit; replayed epochs are no-ops. Returns the
        action taken (for tests/observability)."""
        self.ensure_table(batch)
        if self._committed(epoch):
            return "skipped-replay"
        op = self.cfg.operation
        if self.iceberg:
            if op not in ("append", "overwrite", "upsert"):
                raise UnsupportedOperationError(op)
            self._iceberg_write(self._aligned(batch))
            if self.snapshots:
                # tag the fresh snapshot with the epoch: the durable
                # version handle native VERSION AS OF addresses
                self.spark.sql(self.iceberg_tag_sql(epoch))
            self._record(epoch)
            return f"iceberg-{op}"
        post: DataFrame | None = None
        if op == "append":
            self._append(batch)  # post-state needs the read-back
        elif op == "overwrite":
            post = self._overwrite(batch)
        elif op == "upsert":
            post = self._upsert(batch)
        else:  # unreachable: config validates, but keep the reference's throw
            raise UnsupportedOperationError(op)
        if self.snapshots:
            self._snapshot(batch, epoch, post_state=post)
        self._record(epoch)
        return op

    def _aligned(self, df: DataFrame) -> DataFrame:
        """insertInto is positional and partitioned tables store partition
        columns last — reorder to the table's physical column order."""
        return df.select(*self.read().columns)

    def _append(self, batch: DataFrame) -> None:
        self._aligned(batch).write.format("parquet").mode("append").insertInto(self.table)

    def _overwrite(self, batch: DataFrame) -> DataFrame:
        # dynamic mode: only partitions present in `batch` are replaced —
        # the batch IS the touched partitions' post-state
        with self._overwrite_mode("dynamic"):
            self._aligned(batch).write.format("parquet").mode(
                "overwrite"
            ).insertInto(self.table)
        return batch

    def _upsert(self, batch: DataFrame) -> DataFrame:
        keys = list(self.cfg.upsert_fields)
        version = self.version_column or keys[-1]
        parts = list(self.cfg.partition_fields)
        current = self.read()
        # Bootstrap fast path: against an EMPTY target (first commit /
        # initial load) the merge degenerates to batch-internal dedup —
        # skip the target union AND the localCheckpoint barrier (which
        # exists only because the merged plan otherwise self-joins the
        # table being overwritten). Saves a full batch materialization
        # on exactly the commit that carries the most rows.
        # Emptiness comes from the LEDGER, not a table scan (isEmpty is a
        # distributed job; the ledger read is cached driver metadata):
        # under the single-writer contract no committed epochs ⇒ the only
        # possible target rows are a crashed write of THIS epoch's batch,
        # and the bootstrap write below dynamic-overwrites exactly those
        # partitions — replay-idempotent either way.
        target_empty = not self._ledger_epochs()
        if parts and not target_empty:
            # restrict the rewrite to partitions the batch touches: the
            # MERGE ON <equality fields> target-side partition pruning
            touched = batch.select(*parts).distinct()
            current = current.join(F.broadcast(touched), on=parts, how="left_semi")
        src = batch.withColumn("__src", F.lit(1))
        if not target_empty:
            src = current.withColumn("__src", F.lit(0)).unionByName(src)
        merged = merge_upsert(src, keys, version, tiebreakers=["__src"]).drop(
            "__src"
        )
        # Align writer tasks with table partitions: without this every
        # shuffle partition writes a sliver of every touched partition
        # (tasks × partitions small files per commit, and the unseen-mode
        # anti-join re-reads the target each cycle). One file per touched
        # partition per commit; for a partition too big for one task,
        # add a bucketing term to the repartition key.
        if parts:
            merged = merged.repartition(*parts)
        if not target_empty:
            # self-join on the target table: materialize before overwriting
            merged = merged.localCheckpoint(eager=True)
        with self._overwrite_mode("dynamic"):
            self._aligned(merged).write.format("parquet").mode(
                "overwrite"
            ).insertInto(self.table)
        # the checkpointed merge is exactly the touched partitions'
        # post-state — hand it to the snapshot path to skip the read-back
        return merged


    # -- maintenance (Iceberg rewrite_data_files / expire_snapshots parity) --

    def iceberg_compact_sql(self) -> str:
        """The Iceberg-catalog form: bin-packing data-file rewrite via the
        stored procedure (Spark action of `rewrite_data_files`) — what this
        sink would run instead of the COW fallback below."""
        cat = "spark_catalog"
        return (
            f"CALL {cat}.system.rewrite_data_files(table => '{self.table}', "
            "options => map('min-input-files','2'))"
        )

    def compact(self) -> int:
        """Small-file compaction for the parquet fallback: every streaming
        commit writes ≥1 file per touched partition, so a long-running
        ingest accretes files until scans drown in open/seek overhead —
        the reason Iceberg ships rewrite_data_files. Rewrites each
        partition to ONE file (writer tasks aligned with partitions via
        repartition; for partitions larger than a task add a bucketing
        term). Returns the number of data files after compaction.

        At 100 TB you'd run this per-partition with a size predicate
        (only partitions whose file count exceeds a threshold), off the
        ingest path; the rewrite cost is bounded by the partitions
        compacted, exactly like the upsert COW.
        """
        if self.iceberg:
            self.spark.sql(self.iceberg_compact_sql())
            return -1
        parts = list(self.cfg.partition_fields)
        current = self.read()
        compacted = current.repartition(*parts) if parts else current.coalesce(1)
        with self._overwrite_mode("dynamic"):
            self._aligned(compacted.localCheckpoint(eager=True)).write.format(
                "parquet"
            ).mode("overwrite").insertInto(self.table)
        return len(self._data_files())

    def _data_files(self) -> list[str]:
        import glob
        import os

        loc = self._managed_location(self.cfg.table_name)
        return [
            p
            for p in glob.glob(os.path.join(loc, "**", "*"), recursive=True)
            if os.path.isfile(p) and not os.path.basename(p).startswith((".", "_"))
        ]

    def expire_commits(self, keep_last: int = 100) -> None:
        """Ledger hygiene (Iceberg expire_snapshots parity): the epoch
        ledger grows one row per commit forever; keep the trailing window
        that replay detection actually needs (a restarted stream can only
        replay epochs since its checkpoint)."""
        hi = self.last_epoch()
        keep = self.spark.table(self.commits).filter(
            F.col("epoch") > hi - keep_last
        )
        keep.localCheckpoint(eager=True).write.format("parquet").mode(
            "overwrite"
        ).insertInto(self.commits)
        self._ledger_invalidate()  # rewritten by a Spark job, not _record


def write_audit_publish(
    spark: SparkSession,
    staging: "CatalogSink",
    final: "CatalogSink",
    batch: DataFrame,
    key_field: str,
    epoch: int = 1,
) -> DataFrame:
    """The Iceberg Write-Audit-Publish pattern over two sinks: commit the
    batch to a STAGING table first, audit the staged state (duplicate
    keys, NULL keys, non-positive price — the contract the reference's
    MERGE assumes, `IcebergSinkBuilder.java:31-43` commit discipline),
    and only if every audit passes, publish by committing the staged
    read-back to the FINAL table. Consumers read only the final table,
    so a bad batch never becomes visible — the difference between "we
    can roll back" and "nobody ever saw it".

    Emits the audit report plus the published row count (0 when any
    audit fails and publication is withheld). The publish decision is
    one driver-side boolean off three counter aggregates — the same
    orchestration altitude as the reference's job driver; nothing
    row-sized is collected.
    """
    staging.write_batch(batch, epoch)
    staged = staging.read()
    price = F.col("o_totalprice")
    audits = staged.agg(
        (F.count(F.lit(1)) - F.countDistinct(key_field)).alias("dup_keys"),
        F.sum(F.col(key_field).isNull().cast("int")).alias("null_keys"),
        F.sum((price <= 0).cast("int")).alias("bad_price"),
    ).collect()[0]
    checks = [
        ("staged.key unique", int(audits.dup_keys or 0)),
        ("staged.key not_null", int(audits.null_keys or 0)),
        ("staged.price positive", int(audits.bad_price or 0)),
    ]
    publish = all(v == 0 for _, v in checks)
    n_published = 0
    if publish:
        # count the rows THIS publish appends (the staged batch), not the
        # final table's total — the final table may already hold rows from
        # earlier epochs/runs, and reporting its full count as
        # "n_published" would overstate this batch's contribution
        n_published = staged.count()
        final.write_batch(staged, epoch)
    rows = [
        (name, v, v == 0, publish, n_published) for name, v in checks
    ]
    return spark.createDataFrame(
        rows,
        "check_name string, n_violations bigint, passed boolean,"
        " published boolean, n_published bigint",
    )
