"""Data-layout optimization: Z-order clustering with a min/max pruning
audit — the ``OPTIMIZE ... ZORDER BY`` shape of Iceberg/Delta table
maintenance (the reference's Iceberg sink writes identity-partitioned files;
at 100 TB the *within-partition* file layout decides how much of a scan
min/max file statistics can prune, which is exactly what Z-ordering buys on
multi-column predicates).

The operator computes, for the same rows, two candidate layouts — linear
(sorted by the first column only) and Z-order (sorted by the interleaved
bits of both columns) — carves each into equal-frequency "files", and
reports per-file min/max ranges plus whether a reference box predicate
could prune the file.  The verdict is the classic one: linear layout prunes
on the leading column only; Z-order prunes on both.

Exactness: the Z-value is a pure integer bit-interleave (two 16-bit keys →
one 32-bit Morton code) via the standard parallel bit-spread, written in
portable SQL (``&``, ``|``, ``<<`` on bigints) so DuckDB reproduces it bit
for bit; file carving is ``ntile`` over the total (z, tiebreak) order —
deterministic everywhere.

Scale shape: file membership is the SQL ``ntile`` over the total
(z, tiebreak) order, but computed PARALLEL — no single-partition window.
``_global_ntile`` range-partitions by the sort key (the writer's
``orderBy(z)`` shape), takes a per-range-partition ``row_number`` (window
partitioned by physical partition id, so every partition ranks
independently), adds collected per-partition offsets (metadata-sized: one
count per range partition), and applies the exact ntile bucket formula to
the resulting global rank.  The rank — and therefore file membership — is
bit-deterministic and independent of the sampled range boundaries, which
is what keeps the oracle's plain ``ntile`` as the ground truth.  The audit
aggregation is a partial agg per file id and the output is metadata-sized
(n_files rows).  The fact table is scanned once per layout, never joined.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spread16(v: str, shl: Callable[[str, int], str]) -> str:
    """Bit-spread a 16-bit value so its bits occupy even positions of a
    32-bit word (Morton/Z-curve component), as portable integer SQL."""
    e = f"(({v}) & 65535)"
    e = f"(({e} | {shl(e, 8)}) & 16711935)"  # 0x00FF00FF
    e = f"(({e} | {shl(e, 4)}) & 252645135)"  # 0x0F0F0F0F
    e = f"(({e} | {shl(e, 2)}) & 858993459)"  # 0x33333333
    e = f"(({e} | {shl(e, 1)}) & 1431655765)"  # 0x55555555
    return e


def zvalue_sql(x: str, y: str, shl: Callable[[str, int], str]) -> str:
    """Morton code of two 16-bit keys: spread(x) | spread(y) << 1."""
    return f"({_spread16(x, shl)} | {shl(_spread16(y, shl), 1)})"


def _spark_shl(e: str, n: int) -> str:
    return f"shiftleft({e}, {n})"


def _duck_shl(e: str, n: int) -> str:
    return f"(({e}) << {n})"


# The two clustering keys over ``orders``, bucketed monotonically into 16
# bits so min/max ranges stay order-meaningful (documented cap: keys beyond
# 65535 saturate — at real scale the bucketizer would be a per-column
# quantile map, same contract).
BX = "least(65535, cast(o_custkey as bigint))"
BY = "least(65535, cast(floor(o_totalprice / 8.0) as bigint))"

# Reference box predicate for the pruning audit.
BOX_X_LO, BOX_X_HI = 100, 300
BOX_Y_LO, BOX_Y_HI = 2000, 6000


def _global_ntile(
    df: DataFrame, order_cols: list, k: int, num_parts: int | None = None
) -> DataFrame:
    """Exact SQL-``ntile(k)`` bucket ids over a UNIQUE total order,
    computed without a single-partition window: the shared two-phase
    global rank (``ranks.global_row_number`` — range-partition, pinned,
    per-partition ``row_number``, broadcast-joined offsets; the offset
    join is O(1) per row at ANY partition count, unlike a ``create_map``
    literal which is O(P) per row and can fall out of codegen at
    thousands of range partitions), then the exact ntile formula on the
    global rank: with N rows the first ``N mod k`` buckets get
    ``ceil(N/k)`` rows, the rest ``floor(N/k)`` — bit-identical to the
    oracle's ``ntile`` because the order is total (unique tiebreak), so
    ranks don't depend on the sampled range boundaries.
    """
    from .ranks import global_ntile

    return global_ntile(
        df, order_cols, k, bucket_col="file_id", num_parts=num_parts
    )


def _carve_parts(spark, n_rows: int) -> int:
    """Range-partition count for a layout carve, sized from the CARVED
    table's own row count (~2M rows per range slice) and clamped to the
    session shuffle setting: a fixture-sized input stops paying
    session-level task scheduling for metadata-sized work, while at real
    scale rows/2M exceeds the session setting and the clamp makes this
    exactly the default behavior (no change in the exchange)."""
    session = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(2, min(session, max(8, n_rows // 2_000_000)))


def zorder_layout(orders: DataFrame, n_files: int = 64) -> DataFrame:
    """Per-(layout, file) min/max stats + box-pruning verdict for the
    linear vs Z-order layouts of the same rows.

    Output: (layout, file_id, n_rows, min_x, max_x, min_y, max_y,
    can_prune) where ``can_prune`` is true iff the file's [min, max] box
    provably misses the reference predicate on BOTH layouts' statistics
    — i.e. the file would be skipped by a min/max-pruning scan.
    """
    spark = orders.sparkSession
    base = (
        orders.select(
            F.expr(BX).alias("bx"),
            F.expr(BY).alias("by"),
            F.col("o_orderkey").alias("okey"),
        )
        .withColumn("z", F.expr(zvalue_sql("bx", "by", _spark_shl)))
        # one narrow materialization shared by both carves' pins (each
        # pin otherwise re-reads the scan twice: boundary sample + shuffle)
        .localCheckpoint(eager=True)
    )
    carve_parts = _carve_parts(spark, base.count())

    def carve(df: DataFrame, order_cols: list, layout: str) -> DataFrame:
        return (
            _global_ntile(df, order_cols, n_files, num_parts=carve_parts)
            .groupBy("file_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("bx").alias("min_x"),
                F.max("bx").alias("max_x"),
                F.min("by").alias("min_y"),
                F.max("by").alias("max_y"),
            )
            .select(F.lit(layout).alias("layout"), "*")
        )

    linear = carve(base, [F.col("bx").asc(), F.col("okey").asc()], "linear")
    zorder = carve(base, [F.col("z").asc(), F.col("okey").asc()], "zorder")
    stats = linear.unionByName(zorder)
    miss = (
        (F.col("max_x") < BOX_X_LO)
        | (F.col("min_x") > BOX_X_HI)
        | (F.col("max_y") < BOX_Y_LO)
        | (F.col("min_y") > BOX_Y_HI)
    )
    return stats.withColumn("can_prune", miss)


def duck_zorder_sql(n_files: int = 64) -> str:
    """DuckDB twin: identical bucketing, Morton code, ntile carve, and
    pruning verdict."""
    z = zvalue_sql("bx", "by", _duck_shl)
    return f"""
        WITH base AS (
            SELECT {BX} AS bx, {BY} AS by, o_orderkey AS okey
            FROM orders
        ), zb AS (
            SELECT *, {z} AS z FROM base
        ), lin AS (
            SELECT 'linear' AS layout,
                   ntile({n_files}) OVER (ORDER BY bx, okey) AS file_id,
                   bx, by
            FROM zb
        ), zo AS (
            SELECT 'zorder' AS layout,
                   ntile({n_files}) OVER (ORDER BY z, okey) AS file_id,
                   bx, by
            FROM zb
        ), files AS (
            SELECT layout, file_id, count(*) AS n_rows,
                   min(bx) AS min_x, max(bx) AS max_x,
                   min(by) AS min_y, max(by) AS max_y
            FROM (SELECT * FROM lin UNION ALL SELECT * FROM zo)
            GROUP BY 1, 2
        )
        SELECT layout, file_id, n_rows, min_x, max_x, min_y, max_y,
               (max_x < {BOX_X_LO} OR min_x > {BOX_X_HI}
                OR max_y < {BOX_Y_LO} OR min_y > {BOX_Y_HI}) AS can_prune
        FROM files
    """


def compaction_plan(
    events: DataFrame, target_bytes: int = 262_144
) -> DataFrame:
    """Small-file compaction planner — the ``rewrite_data_files`` /
    ``OPTIMIZE`` bin-packing step of Iceberg/Delta table maintenance.  A
    streaming ingest (the reference writes one commit per poll cycle)
    leaves partitions full of small files; this plans which files merge
    into which target-sized output, without reading data.

    File inventory is metadata-shaped: one row per (partition, file) with
    its byte size — here simulated deterministically from the events
    table as (event_type, day) units sized by encoded row width, standing
    in for the Iceberg manifest `file_size_in_bytes` listing.  The pack is
    next-fit over files ordered (size DESC, day ASC) per partition:
    ``group = floor(running_bytes_before / target)`` — one window cumsum,
    deterministic everywhere, within one max-file-size of the greedy
    first-fit plan.  Groups may overshoot ``target`` by at most one file,
    the same guarantee Iceberg's binPack planner gives.

    Scale shape: the planner runs over the FILE LISTING (metadata, ~1e6
    rows per large table), never the data — one partition-local window
    sort; the output is plan-sized. Returns one row per planned output
    file: (event_type, group_id, n_files, total_bytes, largest_file).
    """
    files = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(
            F.lit(32) + F.length(F.coalesce(F.col("props"), F.lit("")))
        ).cast("long").alias("bytes")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        # NULLS LAST explicitly: Spark's ASC default is NULLS FIRST but
        # DuckDB's is NULLS LAST — a NULL-day file tying on bytes would
        # otherwise cumsum in a different order than the oracle
        .orderBy(F.col("bytes").desc(), F.col("day").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.select(
        "event_type",
        "day",
        "bytes",
        F.floor(
            F.coalesce(F.sum("bytes").over(w), F.lit(0)) / F.lit(target_bytes)
        ).cast("int").alias("group_id"),
    )
    return planned.groupBy("event_type", "group_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        F.max("bytes").alias("largest_file"),
    )


def duck_compaction_sql(target_bytes: int = 262_144) -> str:
    """DuckDB oracle twin of :func:`compaction_plan`."""
    return f"""
        WITH files AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(sum(32 + length(coalesce(props, ''))) AS BIGINT)
                       AS bytes
            FROM events GROUP BY 1, 2
        ), planned AS (
            SELECT event_type, bytes,
                   CAST(floor(coalesce(sum(bytes) OVER (
                       PARTITION BY event_type
                       ORDER BY bytes DESC, day ASC NULLS LAST
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / {target_bytes}) AS INT) AS group_id
            FROM files
        )
        SELECT event_type, group_id,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(bytes) AS BIGINT) AS total_bytes,
               max(bytes) AS largest_file
        FROM planned GROUP BY 1, 2
    """


def zonemap_prune_audit(
    orders: DataFrame,
    rows_per_file: int = 128,
    lo: str = "1998-01-01",
    hi: str = "1999-01-01",
) -> DataFrame:
    """Zone-map (min/max statistics) file-skipping audit — the question a
    table-format layout decision hangs on: for files carved in INSERTION
    order (contiguous ``o_orderkey`` ranges, what a streaming ingest
    naturally produces), how many files can a date-range predicate skip
    on min/max stats alone, and how many scanned rows are stats-true but
    predicate-false?

    One row: file/row totals, skipped counts, the skip ratio, and the
    false-positive row ratio among scanned files — exactly the inputs to
    "do we need to re-cluster this table" (``zorder_layout`` is the fix;
    ``compaction_plan`` the sibling audit). A file is skippable iff
    ``max < lo`` or ``min >= hi`` — the Iceberg/Parquet row-group pruning
    rule (reference reads ride on it implicitly via
    IcebergTableManager's partitioned DDL, IcebergTableManager.java:86).

    Scale shape: one scan → file-keyed partial agg (file count = N /
    rows_per_file, metadata-sized relative to rows) → one-row rollup; the
    exact-match count reuses the same scan stage, no second pass over
    unmatched columns. All counts exact bigints; the two ratios are one
    final rounded division each.
    """
    f = F.col("o_orderdate")
    in_pred = (f >= F.lit(lo).cast("timestamp")) & (
        f < F.lit(hi).cast("timestamp")
    )
    files = (
        orders.select(
            F.expr(f"o_orderkey div {rows_per_file}").alias("file_id"),
            f.alias("d"),
            in_pred.cast("bigint").alias("m"),
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("d").alias("mn"),
            F.max("d").alias("mx"),
            F.sum("m").alias("n_match"),
        )
    )
    lo_ts = F.lit(lo).cast("timestamp")
    hi_ts = F.lit(hi).cast("timestamp")
    skipped = (F.col("mx") < lo_ts) | (F.col("mn") >= hi_ts)
    return files.select(
        F.lit(1).alias("g"),
        F.col("n_rows"),
        F.col("n_match"),
        skipped.cast("bigint").alias("s"),
    ).groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("s").alias("n_skipped_files"),
        F.sum("n_rows").alias("n_rows_total"),
        F.sum(F.when(F.col("s") == 1, F.col("n_rows")).otherwise(0)).alias(
            "n_rows_skipped"
        ),
        F.sum("n_match").alias("n_rows_matching"),
        F.round(F.sum("s") / F.count(F.lit(1)), 4).alias("skip_ratio"),
        F.round(
            (
                F.sum(F.when(F.col("s") == 0, F.col("n_rows")).otherwise(0))
                - F.sum("n_match")
            )
            / F.greatest(
                F.sum(F.when(F.col("s") == 0, F.col("n_rows")).otherwise(0)),
                F.lit(1),
            ),
            4,
        ).alias("false_positive_row_ratio"),
    )


def duck_zonemap_sql(
    rows_per_file: int = 128, lo: str = "1998-01-01", hi: str = "1999-01-01"
) -> str:
    """Oracle twin of :func:`zonemap_prune_audit`."""
    return f"""
        WITH files AS (
            SELECT o_orderkey // {rows_per_file} AS file_id,
                   count(*)::BIGINT AS n_rows,
                   min(o_orderdate) AS mn, max(o_orderdate) AS mx,
                   sum(CASE WHEN o_orderdate >= TIMESTAMP '{lo}'
                            AND o_orderdate < TIMESTAMP '{hi}'
                            THEN 1 ELSE 0 END)::BIGINT AS n_match
            FROM orders GROUP BY 1
        ), flags AS (
            SELECT n_rows, n_match,
                   CASE WHEN mx < TIMESTAMP '{lo}'
                        OR mn >= TIMESTAMP '{hi}' THEN 1 ELSE 0 END AS s
            FROM files
        )
        SELECT count(*)::BIGINT AS n_files,
               sum(s)::BIGINT AS n_skipped_files,
               sum(n_rows)::BIGINT AS n_rows_total,
               sum(CASE WHEN s = 1 THEN n_rows ELSE 0 END)::BIGINT
                   AS n_rows_skipped,
               sum(n_match)::BIGINT AS n_rows_matching,
               round(sum(s) / count(*), 4) AS skip_ratio,
               round((sum(CASE WHEN s = 0 THEN n_rows ELSE 0 END)
                        - sum(n_match))
                     / greatest(sum(CASE WHEN s = 0 THEN n_rows ELSE 0 END),
                                1), 4) AS false_positive_row_ratio
        FROM flags
    """


# ---------------------------------------------------------------------------
# Hilbert-curve layout — the other industrial clustering curve (Iceberg's
# rewrite_data_files supports both zorder and hilbert strategies; Hilbert
# has strictly better locality: consecutive curve positions are always
# grid-adjacent, so per-file min/max boxes are tighter than Morton's).
# ---------------------------------------------------------------------------

HILBERT_BITS = 16
_HN = 1 << HILBERT_BITS  # 65536: grid side; d ranges over [0, 2^32)


def hilbert_rounds(
    x: str = "hx", y: str = "hy", d: str = "hd"
) -> list[tuple[str, str, str]]:
    """The standard xy2d Hilbert transform (Wikipedia form) for two
    ``HILBERT_BITS``-bit keys, unrolled into one (d, x, y) expression
    triplet per bit — PORTABLE SQL text (CASE/&/*/+/- only, no engine
    bit-builtins), evaluated identically by Spark and DuckDB.

    Returned as a list of aliased ``(d, x, y)`` expression-string
    triplets, one round each (callers join or splat them).  Each
    round must be its own projection (Spark ``selectExpr`` chain / DuckDB
    CTE chain): the rotation references the previous round's x/y several
    times, so inlining all 16 rounds into one expression would grow
    exponentially — the chained form stays linear and Catalyst keeps the
    projections separate (the reused aliases are non-cheap, so
    CollapseProject leaves them materialized).

    Per round over s = 2^b, b = 15..0 (quadrant digit then rotate/flip):
    ``rx = (x & s) > 0; ry = (y & s) > 0; d += s*s*((3*rx) XOR ry)``,
    then ``ry=1 → identity; ry=0,rx=0 → swap; ry=0,rx=1 → reflect+swap``.
    The XOR of the 1-bit digits is written arithmetically
    (``3*rx + ry*(1 - 2*rx)``) to avoid engine-specific xor syntax.
    """
    rounds = []
    n1 = _HN - 1
    for b in range(HILBERT_BITS - 1, -1, -1):
        s = 1 << b
        rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
        quad = f"(3 * {rx} + {ry} * (1 - 2 * {rx}))"
        d_new = f"CAST({d} + CAST({s} AS BIGINT) * {s} * {quad} AS BIGINT)"
        x_new = (
            f"CASE WHEN {ry} = 1 THEN {x}"
            f" WHEN {rx} = 0 THEN {y} ELSE {n1} - {y} END"
        )
        y_new = (
            f"CASE WHEN {ry} = 1 THEN {y}"
            f" WHEN {rx} = 0 THEN {x} ELSE {n1} - {x} END"
        )
        rounds.append(
            (f"{d_new} AS {d}", f"{x_new} AS {x}", f"{y_new} AS {y}")
        )
    return rounds


def hilbert_layout(orders: DataFrame, n_files: int = 64) -> DataFrame:
    """Hilbert-curve vs Z-order file layout, same contract as
    :func:`zorder_layout`: carve the (bucketed) orders keys into
    ``n_files`` equal-frequency files along each curve, report per-file
    min/max boxes and the reference-box prune verdict.  The interesting
    read-out: Hilbert files can prune at least as often as Morton files
    on the same data (tighter boxes from guaranteed adjacency).

    Scale shape is zorder_layout's exactly: curve codes are fused into
    the scan (16 chained narrow projections, all integer CASE arithmetic,
    whole-stage codegen, no Python), the carve is the shared two-phase
    parallel ntile, the audit is an n_files-row partial agg. The
    transformed table is checkpointed ONCE as a narrow 5-column
    projection (the hx/hy rotation scratch dropped) and BOTH carves pin
    off it — one materialization instead of four recomputes of the
    16-round chain (two pins × sample + shuffle) — and the carve's range
    exchanges are sized from the carved table's own row count
    (``_carve_parts``; identical to the session default at real scale).
    """
    spark = orders.sparkSession
    base = orders.select(
        F.expr(BX).alias("bx"),
        F.expr(BY).alias("by"),
        F.col("o_orderkey").alias("okey"),
    ).withColumn("z", F.expr(zvalue_sql("bx", "by", _spark_shl)))
    # the 16-round transform is CPU-bound per row and runs in the SCAN
    # stage: at real scale the scan's many input splits parallelize it
    # for free, but a small fixture arrives as ONE split and would
    # serialize every row through one task — spread only in that case
    # (condition false at scale, so no extra corpus shuffle ever)
    par = spark.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < par:
        base = base.repartition(par)
    hil = base.selectExpr(
        "bx", "by", "okey", "z",
        "CAST(0 AS BIGINT) AS hd", "bx AS hx", "by AS hy",
    )
    for de, xe, ye in hilbert_rounds():
        hil = hil.selectExpr("bx", "by", "okey", "z", de, xe, ye)
    hil = hil.select("bx", "by", "okey", "z", "hd").localCheckpoint(
        eager=True
    )
    carve_parts = _carve_parts(spark, hil.count())

    def carve(df: DataFrame, order_cols: list, layout: str) -> DataFrame:
        return (
            _global_ntile(df, order_cols, n_files, num_parts=carve_parts)
            .groupBy("file_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("bx").alias("min_x"),
                F.max("bx").alias("max_x"),
                F.min("by").alias("min_y"),
                F.max("by").alias("max_y"),
            )
            .select(F.lit(layout).alias("layout"), "*")
        )

    hilbert = carve(hil, [F.col("hd").asc(), F.col("okey").asc()], "hilbert")
    zorder = carve(hil, [F.col("z").asc(), F.col("okey").asc()], "zorder")
    stats = hilbert.unionByName(zorder)
    miss = (
        (F.col("max_x") < BOX_X_LO)
        | (F.col("min_x") > BOX_X_HI)
        | (F.col("max_y") < BOX_Y_LO)
        | (F.col("min_y") > BOX_Y_HI)
    )
    return stats.withColumn("can_prune", miss)


def duck_hilbert_sql(n_files: int = 64) -> str:
    """DuckDB twin of :func:`hilbert_layout`: the identical unrolled
    Hilbert rounds as a CTE chain, the same Morton code, plain ``ntile``
    carves, and the same pruning verdict."""
    z = zvalue_sql("bx", "by", _duck_shl)
    ctes = [
        f"""
        WITH base AS (
            SELECT {BX} AS bx, {BY} AS by, o_orderkey AS okey, {z} AS z
            FROM orders
        ), h0 AS (
            SELECT bx, by, okey, z,
                   CAST(0 AS BIGINT) AS hd, bx AS hx, by AS hy
            FROM base
        )"""
    ]
    prev = "h0"
    for i, (de, xe, ye) in enumerate(hilbert_rounds(), start=1):
        ctes.append(
            f", h{i} AS (SELECT bx, by, okey, z, {de}, {xe}, {ye}"
            f" FROM {prev})"
        )
        prev = f"h{i}"
    ctes.append(
        f""", hil AS (
            SELECT 'hilbert' AS layout,
                   ntile({n_files}) OVER (ORDER BY hd, okey) AS file_id,
                   bx, by
            FROM {prev}
        ), zo AS (
            SELECT 'zorder' AS layout,
                   ntile({n_files}) OVER (ORDER BY z, okey) AS file_id,
                   bx, by
            FROM {prev}
        ), files AS (
            SELECT layout, file_id, count(*) AS n_rows,
                   min(bx) AS min_x, max(bx) AS max_x,
                   min(by) AS min_y, max(by) AS max_y
            FROM (SELECT * FROM hil UNION ALL SELECT * FROM zo)
            GROUP BY 1, 2
        )
        SELECT layout, file_id, n_rows, min_x, max_x, min_y, max_y,
               (max_x < {BOX_X_LO} OR min_x > {BOX_X_HI}
                OR max_y < {BOX_Y_LO} OR min_y > {BOX_Y_HI}) AS can_prune
        FROM files"""
    )
    return "".join(ctes)


# partition-evolution audit constants: the spec cutover and the probe box
_EVO_CUTOVER = "1996-01-01"   # files before this were written under spec v1
_EVO_LO, _EVO_HI = "1995-06-01", "1996-07-01"


def partition_evolution(orders: DataFrame) -> DataFrame:
    """Partition-spec EVOLUTION pruning audit — the Iceberg feature the
    reference's identity-partitioned sink (IcebergTableManager.java:86,
    PARTITION BY shard) grows into at scale: a table re-specs from
    day-granularity partitions to month-granularity, old files keep the
    old spec, and every scan must prune each file under THE SPEC IT WAS
    WRITTEN WITH. The audit simulates the two-era file inventory (one
    file per partition value per era: day files before the cutover,
    month files after), applies the reference date-range predicate to
    each file's partition-transform bounds, and reports per spec: file
    counts, pruned files, rows skipped vs scanned vs actually matching —
    the "did coarsening the spec hurt pruning" read-out (month files
    over-scan rows a day spec would have skipped).

    Exactness: pure date arithmetic on exact values — a day file prunes
    iff its day misses [lo, hi); a month file prunes iff its whole month
    does; row matches are exact predicate counts. Scale shape: ONE
    conditional partial agg over the fact table to the (spec,
    partition_value) inventory (metadata-sized); the verdict arithmetic
    runs on that inventory.
    """
    lo, hi, cut = (
        F.lit(_EVO_LO).cast("timestamp"),
        F.lit(_EVO_HI).cast("timestamp"),
        F.lit(_EVO_CUTOVER).cast("timestamp"),
    )
    inv = (
        orders.select(
            F.when(F.col("o_orderdate") < cut, F.lit("v1_day"))
            .otherwise(F.lit("v2_month"))
            .alias("spec"),
            F.when(
                F.col("o_orderdate") < cut, F.date_trunc("day", "o_orderdate")
            )
            .otherwise(F.date_trunc("month", "o_orderdate"))
            .alias("pval"),
            ((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
            .cast("int")
            .alias("match"),
        )
        .groupBy("spec", "pval")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("match").alias("n_match"),
        )
    )
    # a file prunes iff its partition-transform range misses [lo, hi):
    # day files span [pval, pval+1d); month files [pval, pval+1mo)
    upper = F.when(
        F.col("spec") == "v1_day", F.date_add(F.col("pval"), 1).cast("timestamp")
    ).otherwise(F.add_months(F.col("pval"), 1).cast("timestamp"))
    flagged = inv.select(
        "spec",
        "n_rows",
        "n_match",
        ((upper <= lo) | (F.col("pval") >= hi)).cast("int").alias("pruned"),
    )
    return flagged.groupBy("spec").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("pruned").cast("bigint").alias("n_pruned_files"),
        F.sum("n_rows").cast("bigint").alias("rows_total"),
        F.sum(F.when(F.col("pruned") == 1, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_skipped"),
        F.sum(F.when(F.col("pruned") == 0, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_scanned"),
        F.sum("n_match").cast("bigint").alias("rows_matching"),
    )


def duck_partition_evolution_sql() -> str:
    """Oracle twin of :func:`partition_evolution`."""
    return f"""
        WITH inv AS (
            SELECT CASE WHEN o_orderdate < TIMESTAMP '{_EVO_CUTOVER}'
                        THEN 'v1_day' ELSE 'v2_month' END AS spec,
                   CASE WHEN o_orderdate < TIMESTAMP '{_EVO_CUTOVER}'
                        THEN date_trunc('day', o_orderdate)
                        ELSE date_trunc('month', o_orderdate) END AS pval,
                   count(*) AS n_rows,
                   sum(CASE WHEN o_orderdate >= TIMESTAMP '{_EVO_LO}'
                            AND o_orderdate < TIMESTAMP '{_EVO_HI}'
                            THEN 1 ELSE 0 END) AS n_match
            FROM orders GROUP BY 1, 2
        ), flagged AS (
            SELECT spec, n_rows, n_match,
                   CASE WHEN (CASE WHEN spec = 'v1_day'
                                   THEN pval + INTERVAL 1 DAY
                                   ELSE pval + INTERVAL 1 MONTH END)
                             <= TIMESTAMP '{_EVO_LO}'
                        OR pval >= TIMESTAMP '{_EVO_HI}'
                        THEN 1 ELSE 0 END AS pruned
            FROM inv
        )
        SELECT spec, count(*)::BIGINT AS n_files,
               sum(pruned)::BIGINT AS n_pruned_files,
               sum(n_rows)::BIGINT AS rows_total,
               sum(CASE WHEN pruned = 1 THEN n_rows ELSE 0 END)::BIGINT
                   AS rows_skipped,
               sum(CASE WHEN pruned = 0 THEN n_rows ELSE 0 END)::BIGINT
                   AS rows_scanned,
               sum(n_match)::BIGINT AS rows_matching
        FROM flagged GROUP BY spec
    """


#: columns audited by encoding_audit: (name, kind) — strings model plain
#: storage as total byte length, numerics as 8 bytes/row
_ENC_COLS = (
    ("o_orderpriority", "string"),
    ("o_orderstatus", "string"),
    ("o_custkey", "numeric"),
    ("o_totalprice", "numeric"),
)


def encoding_audit(orders: DataFrame) -> DataFrame:
    """Dictionary-encoding choice audit — the Parquet/ORC writer decision
    modeled explicitly: per column, exact n / distinct / plain bytes vs
    the dictionary model (distinct values stored once + one index of
    ``floor(log2(d−1))+1`` bits per row), the compression ratio, and the
    encode verdict (dict iff ratio < 0.8 — low-cardinality columns win
    big, near-unique columns lose). This is the column-level read-out
    behind the zonemap/zorder file decisions.

    Exactness: byte models are pure integer arithmetic (log2 is exact on
    powers of two and floor-safe between them); the ratio divides exact
    integers once, rounded. Scale shape: ONE pass — the multi-distinct
    aggregate plans as a single Expand scan (the column_profile shape);
    the melt to per-column rows happens on the one aggregate row.
    """
    aggs = []
    for c, kind in _ENC_COLS:
        aggs.append(F.countDistinct(c).alias(f"d_{c}"))
        if kind == "string":
            aggs.append(
                F.sum(F.length(c)).cast("bigint").alias(f"w_{c}")
            )
            aggs.append(
                F.max(F.length(c)).cast("bigint").alias(f"mw_{c}")
            )
    row = orders.agg(F.count(F.lit(1)).alias("n"), *aggs)
    stacks = []
    for c, kind in _ENC_COLS:
        if kind == "string":
            plain = f"w_{c}"
            dict_vals = f"d_{c} * mw_{c}"
        else:
            plain = "n * 8"
            dict_vals = f"d_{c} * 8"
        bits = f"(cast(floor(log2(greatest(d_{c} - 1, 1))) as bigint) + 1)"
        dict_bytes = (
            f"cast({dict_vals} + (n * {bits} + 7) div 8 as bigint)"
        )
        stacks.append(
            f"'{c}', cast(d_{c} as bigint), cast({plain} as bigint),"
            f" {dict_bytes}"
        )
    melted = row.selectExpr(
        "n",
        f"stack({len(_ENC_COLS)}, {', '.join(stacks)})"
        " as (col, n_distinct, plain_bytes, dict_bytes)",
    )
    ratio = F.round(F.col("dict_bytes") / F.col("plain_bytes"), 4)
    return melted.select(
        "col",
        F.col("n").cast("bigint").alias("n_rows"),
        "n_distinct",
        "plain_bytes",
        "dict_bytes",
        ratio.alias("ratio"),
        (ratio < 0.8).alias("use_dict"),
    )


def duck_encoding_audit_sql() -> str:
    """Oracle twin of :func:`encoding_audit` — one aggregate per column,
    unioned."""
    parts = []
    for c, kind in _ENC_COLS:
        if kind == "string":
            plain = f"sum(length({c}))"
            dict_vals = f"count(DISTINCT {c}) * max(length({c}))"
        else:
            plain = "count(*) * 8"
            dict_vals = f"count(DISTINCT {c}) * 8"
        bits = (
            f"(CAST(floor(log2(greatest(count(DISTINCT {c}) - 1, 1)))"
            f" AS BIGINT) + 1)"
        )
        parts.append(f"""
        SELECT '{c}' AS col, count(*)::BIGINT AS n_rows,
               count(DISTINCT {c})::BIGINT AS n_distinct,
               CAST({plain} AS BIGINT) AS plain_bytes,
               CAST({dict_vals}
                    + (count(*) * {bits} + 7) // 8 AS BIGINT) AS dict_bytes,
               round(({dict_vals} + (count(*) * {bits} + 7) // 8)
                     / CAST({plain} AS DOUBLE), 4) AS ratio,
               round(({dict_vals} + (count(*) * {bits} + 7) // 8)
                     / CAST({plain} AS DOUBLE), 4) < 0.8 AS use_dict
        FROM orders""")
    return " UNION ALL ".join(parts)


def clustering_depth(orders: DataFrame, n_files: int = 64) -> DataFrame:
    """Clustering quality in ONE number per layout — the expected
    STABBING COUNT: for a uniform random point query on a key, the
    expected number of files whose [min, max] range contains it equals
    Σ(max−min+1)/domain over the files; 1.0 is perfect clustering, and
    the gap between layouts is exactly the pruning advantage the per-box
    audit (``hilbert_layout``) shows predicate-by-predicate. Reported
    per layout and per key (x, y) over the hilbert-vs-zorder carve.

    Exactness: integer range sums over the n_files-row stats table, one
    division per number, rounded(4). Scale shape: inherits the carve's
    cost; this is a metadata-sized rollup on its output.
    """
    return clustering_depth_from_stats(hilbert_layout(orders, n_files))


def clustering_depth_from_stats(stats: DataFrame) -> DataFrame:
    """The :func:`clustering_depth` rollup over an ALREADY-COMPUTED
    ``hilbert_layout`` stats table — split out so callers that share the
    carve across sibling queries (the entry memoizes the n_files·2-row
    stats, a deterministic function of (corpus, n_files)) pay the carve
    once, not per query."""
    domain = float(_HN)
    return stats.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.round(
            F.sum(F.col("max_x") - F.col("min_x") + 1) / F.lit(domain), 4
        ).alias("stab_x"),
        F.round(
            F.sum(F.col("max_y") - F.col("min_y") + 1) / F.lit(domain), 4
        ).alias("stab_y"),
    )


def duck_clustering_depth_sql(n_files: int = 64) -> str:
    """Oracle twin of :func:`clustering_depth` over the same carve."""
    return f"""
        WITH stats AS ({duck_hilbert_sql(n_files)})
        SELECT layout, count(*)::BIGINT AS n_files,
               round(sum(max_x - min_x + 1) / {float(_HN)!r}, 4) AS stab_x,
               round(sum(max_y - min_y + 1) / {float(_HN)!r}, 4) AS stab_y
        FROM stats GROUP BY layout
    """
