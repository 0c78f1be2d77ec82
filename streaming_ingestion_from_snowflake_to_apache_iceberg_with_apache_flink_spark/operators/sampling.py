"""Deterministic sampling / dataset splitting for training pipelines.

``df.sample()`` is seeded-random per partition — fine for exploration,
wrong for reproducible train/val/test membership (a repartition changes
the sample, and no other engine can replay it). The operators here derive
membership from a CONTENT hash of a key column, so:

* membership is a pure function of the row key — stable across runs,
  partitionings, engines (the oracle replays the same md5-h32 buckets);
* splits are disjoint and exhaustive by construction (one bucket value
  maps to exactly one split);
* it's a narrow map over the scan — no shuffle, no state, embarrassingly
  parallel at any scale.

The salt parameter decorrelates different splits over the same corpus
(e.g. a 1% eval carve-out this month vs a fresh one next month).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H

#: bucket resolution: split fractions are exact multiples of 1/10000
BUCKETS = 10_000


def _bucket_expr(key_col: str, salt: str) -> str:
    """Deterministic bucket in [0, BUCKETS): portable md5-h32 of the
    salted, stringified key — identical in Spark and DuckDB."""
    keyed = f"concat('{salt}', ':', cast({key_col} as string))"
    return f"pmod({H.spark_h32(keyed)}, {BUCKETS})"


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "v1",
) -> DataFrame:
    """Assign each row a split label from the hash of ``key_col``.

    ``splits`` maps label → fraction (must sum to 1 within 1/BUCKETS);
    labels are assigned in the given order over contiguous bucket ranges,
    so growing one split keeps the others' membership stable when it is
    the LAST entry.
    """
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    fracs = list(splits.values())
    if any(f < 0 for f in fracs) or abs(sum(fracs) - 1.0) > 1.0 / BUCKETS:
        raise ValueError(f"split fractions must be >=0 and sum to 1: {splits}")
    bucket = _bucket_expr(key_col, salt)
    expr = "CASE"
    hi = 0
    labels = list(splits)
    for i, (label, frac) in enumerate(splits.items()):
        hi = BUCKETS if i == len(labels) - 1 else hi + int(round(frac * BUCKETS))
        expr += f" WHEN {bucket} < {hi} THEN '{label}'"
    expr += " END"
    return df.withColumn("split", F.expr(expr))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "v1"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash (reproducible
    downsampling; same row set on every run and engine)."""
    if not 0 <= fraction <= 1:
        raise ValueError(f"fraction must be in [0,1]: {fraction}")
    cut = int(round(fraction * BUCKETS))
    return df.filter(F.expr(f"{_bucket_expr(key_col, salt)} < {cut}"))


def duck_bucket_expr(key_col: str, salt: str = "v1") -> str:
    """The oracle-side twin of ``_bucket_expr`` (DuckDB SQL fragment)."""
    keyed = f"concat('{salt}', ':', cast({key_col} as varchar))"
    # DuckDB % is remainder; h32 is non-negative so it equals pmod here
    return f"({H.duck_h32(keyed)} % {BUCKETS})"


def stratified_take(
    df: DataFrame, stratum_col: str, key_col: str, per_stratum: int, salt: str = "v1"
) -> DataFrame:
    """Deterministic per-stratum sample: the ``per_stratum`` rows with the
    smallest salted key hashes in each stratum (a balanced per-language /
    per-source carve-out that is stable across runs and engines).

    One shuffle on the stratum; Catalyst's WindowGroupLimit truncates to
    ``per_stratum`` rows per group map-side before the exchange."""
    from pyspark.sql import Window

    bucket = _bucket_expr(key_col, salt)
    w = Window.partitionBy(stratum_col).orderBy(
        F.expr(bucket).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= per_stratum)
        .drop("rn")
    )


def pack_bins(documents_with_len: DataFrame, n_bins: int = 8) -> DataFrame:
    """Sequence packing: assign length-ranked docs to ``n_bins`` bins in
    serpentine (boustrophedon) order — the classic balanced-batch
    approximation of bin packing for training shards (longest docs spread
    first, direction alternating so totals stay even).

    Needs (doc_id, n_tokens). The global length rank is the shared
    two-phase parallel rank (``ranks.global_row_number``: range-partition
    by (n_tokens desc, doc_id), per-partition ``row_number``, hybrid
    literal/broadcast offsets) — NO single-partition window ranks the
    corpus; the serpentine formula operates on the exact global rank
    unchanged, so the plain-window oracle stays the ground truth (the
    (n_tokens, doc_id) order is total). Measured rent at sf0.1: ~0.3 s of
    fixed metadata jobs (range sampling + pinned checkpoint + offset
    collect) over the single-window form it replaced — the price of not
    funneling the corpus through one task, amortized to noise at any
    real scale.
    """
    from .ranks import global_row_number

    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1: {n_bins}")
    ranked, _n = global_row_number(
        documents_with_len,
        [F.col("n_tokens").desc(), F.col("doc_id").asc()],
        rank_col="__rank",
    )
    r = F.col("__rank") - 1
    fwd = F.pmod(r, F.lit(n_bins))
    rev = F.lit(n_bins - 1) - fwd
    direction_fwd = F.pmod(F.floor(r / F.lit(n_bins)), F.lit(2)) == 0
    return ranked.select(
        "doc_id",
        "n_tokens",
        F.when(direction_fwd, fwd).otherwise(rev).cast("int").alias("bin"),
    )


def token_budget_shards(
    documents_with_len: DataFrame, capacity: int = 10_000
) -> DataFrame:
    """Token-budget contiguous sharding — the scalable form of greedy
    sequence packing: walk the corpus in a stable total order (doc_id),
    accumulate token counts, and cut a shard boundary every ``capacity``
    tokens. A doc belongs to the shard its START offset falls in (exact
    greedy first-fit is inherently sequential; boundary-cutting by
    cumulative offset is the form that parallelizes and is what
    fixed-token training shards actually need). Emits the per-shard
    manifest: (shard, n_docs, total_tokens, min_doc, max_doc).

    The running offset is a PARALLEL exclusive prefix sum — the same
    two-phase shape as ``ranks.global_row_number``: range-partition by
    doc_id (pinned), per-partition running sum windowed by the physical
    partition id, plus each partition's broadcast-joined offset = sum of
    all earlier partitions (metadata-sized). No single-partition window
    touches the corpus; the plain-window oracle stays the ground truth.
    """
    from pyspark.sql import Window

    from .ranks import (
        OFF,
        PID,
        exclusive_prefix,
        pin_range_partitions,
        with_offsets,
    )

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1: {capacity}")
    part = pin_range_partitions(
        documents_with_len.select("doc_id", "n_tokens"),
        [F.col("doc_id").asc()],
    )
    rows, _total = exclusive_prefix(
        part,
        F.sum("n_tokens"),
        lambda acc, v: acc + (0 if v is None else int(v)),
        0,
    )
    w = (
        Window.partitionBy(PID)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.coalesce(
        F.col(OFF), F.lit(0)
    )
    assigned = with_offsets(part, rows).select(
        "doc_id",
        "n_tokens",
        F.floor(start / F.lit(capacity)).cast("int").alias("shard"),
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def temperature_weights(documents: DataFrame, stratum_col: str = "lang") -> DataFrame:
    """Temperature-based multinomial rebalancing weights per stratum
    (mT5/XLM-R style: sample language l with p_l ∝ n_l^α, α<1 upweights
    low-resource strata). α is fixed at 0.25 = sqrt(sqrt(n)) because IEEE
    sqrt is correctly rounded in every engine — ``pow(n, 0.3)`` is libm-
    dependent and would break exact cross-engine checks.

    One partial-agg shuffle to (stratum, n_docs) — a handful of rows — then
    the normalizing sum is a single-partition window over that tiny frame
    (never over the corpus)."""
    counts = documents.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window

    w = Window.partitionBy()
    weight = F.sqrt(F.sqrt(F.col("n_docs").cast("double")))
    return (
        counts.withColumn("weight", weight)
        .select(
            stratum_col,
            "n_docs",
            F.round("weight", 6).alias("weight"),
            F.round(F.col("weight") / F.sum("weight").over(w), 6).alias("p_sample"),
            F.round(
                F.col("n_docs") / F.sum(F.col("n_docs")).over(w), 6
            ).alias("p_natural"),
        )
    )


def shard_assign(documents: DataFrame, n_shards: int = 16) -> DataFrame:
    """Deterministic output sharding: every doc lands in exactly one of
    ``n_shards`` shards by content-hash of its key — the write-side layout
    step of a training-data pipeline (stable across runs/engines, unlike a
    round-robin repartition). Emits the per-shard manifest: row count plus
    an order-insensitive checksum (sum of key hashes) and the key range —
    what a downstream consumer verifies before trusting a shard.

    One partial-agg shuffle on the shard id; the assignment itself is a
    narrow map fused into the scan.
    """
    h = H.spark_h32("cast(doc_id as string)")
    return (
        documents.selectExpr(
            "doc_id", f"cast(pmod({h}, {n_shards}) as int) as shard"
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr(H.spark_h32("cast(doc_id as string)"))).alias("checksum"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


#: per-source keep-rate percentages for interleave_sources (sources absent
#: from the map fall back to DEFAULT); a stand-in for the sampling weights a
#: data-mixture config assigns per corpus.
INTERLEAVE_WEIGHTS = {"src0": 100, "src1": 75, "src2": 50, "src3": 25}
INTERLEAVE_DEFAULT = 10


def interleave_sources(
    documents: DataFrame,
    weights: dict[str, int] | None = None,
    default: int = INTERLEAVE_DEFAULT,
    salt: str = "mix1",
) -> DataFrame:
    """Weighted corpus mixing: keep each doc with its source's keep-rate,
    decided by the salted content hash of (source, doc_id) — the
    deterministic replacement for weighted random interleaving when
    composing a training mixture from heterogeneous corpora. Emits the
    per-source audit: total docs, kept docs, exact kept fraction.

    Membership is a pure row-local predicate (no shuffle); the audit is one
    partial-agg. Changing the salt redraws the mixture without touching the
    weights.
    """
    weights = INTERLEAVE_WEIGHTS if weights is None else weights
    cases = " ".join(
        f"WHEN '{s}' THEN {w}" for s, w in sorted(weights.items())
    )
    rate = f"CASE source {cases} ELSE {default} END"
    bucket = _bucket_expr("concat(source, '/', doc_id)", salt)
    kept = f"cast({bucket} < ({rate}) * {BUCKETS // 100} as int)"
    return (
        documents.selectExpr("source", "doc_id", f"{kept} as kept")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            F.round(F.sum("kept") / F.count(F.lit(1)), 4).alias("kept_frac"),
        )
    )


def weighted_priority_sample(
    documents: DataFrame, k: int = 100, salt: str = "w1"
) -> DataFrame:
    """Deterministic weighted sampling without replacement: priority =
    h32(salt:doc_id) / weight, keep the ``k`` smallest — a longer doc
    (weight = n_chars) gets a proportionally smaller priority, so
    selection probability scales with weight, and the whole draw is a
    pure function of the keys (replayable across runs, partitionings,
    and engines — ``df.sample()`` is none of those).

    The priority is ONE exact integer-by-integer double division (no
    libm pow/log, which differ across engines — the reason this is not
    textbook Efraimidis-Spirakis; the weighting semantics are declared
    and oracle-mirrored). Top-k is TakeOrderedAndProject: each partition
    keeps k rows, no global sort. Zero-weight rows (an empty document)
    have selection probability 0 and are filtered before ranking — the
    NULL-priority alternative sorts FIRST in Spark and LAST in DuckDB,
    so the filter is the only portable semantics (round-9
    degenerate-text finding), mirrored in the oracle.
    """
    pr = F.expr(H.spark_h32(f"concat('{salt}:', cast(doc_id as string))")) / F.col(
        "n_chars"
    )
    return (
        documents.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(pr, 6).alias("priority"),
        )
        .orderBy(F.col("priority").asc(), F.col("doc_id").asc())
        .limit(k)
    )


def winsorize_prices(lineitem: DataFrame, pct: int = 99) -> DataFrame:
    """Per-group winsorization (outlier capping at the exact p``pct``):
    the robust data-cleaning step before aggregate features — cap, don't
    drop. The cap is the exact rank-selected percentile (no
    interpolation), computed per (returnflag) group and broadcast back
    onto the rows; output = per-group audit: rows capped, cents sum
    before/after (exact integers).

    Scale shape (round 10, second pass): the cap is an ORDER STATISTIC,
    so it comes from :func:`relational.fused_kth_by_group` — job 1 fuses
    the group stats INTO radix level 1 (one scan, in-Spark bucket
    selection), job 2 is one exact-value scan inside the chosen buckets
    with the pick driver-side over ≤ groups × 2^13 rows; the audit is
    then ONE partial-agg pass, 3 fully-parallel jobs total. The round-9
    version spent 4 jobs (separate stats scan + a 2-level in-Spark
    walk); before that, a ``Window.partitionBy(l_returnflag)`` rank
    sorted the whole corpus through 4 reducers at any cluster size just
    to read one row per group. Same values: the k-th smallest VALUE is
    tie-insensitive, so the oracle is unchanged. Negative measures ride
    the fast path natively; wide domains fall back to the full walk
    inside the helper.
    """
    from .relational import fused_kth_by_group

    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    base = lineitem.select("l_returnflag", cents.alias("c"))
    caps, _n = fused_kth_by_group(
        base,
        "l_returnflag",
        F.col("c"),
        # Integer k: Spark '/' is DOUBLE division, whose ulp exceeds the
        # 0.01 gap to an integer boundary once n*pct ≳ 2^46 — keep the
        # rank exact at any group size by dividing in DECIMAL (exact for
        # any bigint n) and flooring (ADVICE round 10).
        lambda n: F.greatest(
            F.lit(1).cast("bigint"),
            F.floor((n * pct).cast("decimal(38,0)") / 100).cast("bigint"),
        ),
    )
    if not caps:
        return base.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.lit(0).cast("bigint").alias("n_capped"),
            F.lit(0).cast("bigint").alias("cap_cents"),
            F.lit(0).cast("bigint").alias("sum_cents"),
            F.lit(0).cast("bigint").alias("sum_capped_cents"),
        )
    cap_map = F.create_map(
        *[x for g, c in caps.items() for x in (F.lit(g), F.lit(int(c)))]
    )
    cap = F.element_at(cap_map, F.col("l_returnflag"))
    return (
        base.select(
            "l_returnflag",
            "c",
            cap.alias("cap"),
            F.least(F.col("c"), cap).alias("capped"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((F.col("c") > F.col("cap")).cast("bigint")).alias("n_capped"),
            F.max("cap").alias("cap_cents"),
            F.sum("c").alias("sum_cents"),
            F.sum("capped").alias("sum_capped_cents"),
        )
    )


def mixture_waterfill(documents: DataFrame, budget_num: int = 1, budget_den: int = 2) -> DataFrame:
    """Water-filling allocation of a global character budget across
    sources — the training-mix solver: give every source an equal share,
    but a source with less material than its share contributes all of it
    and the slack re-spreads over the richer sources.

    Budget = ⌊total_chars · budget_num / budget_den⌋ (data-derived so the
    oracle can state it as the same scalar subquery).

    Closed form instead of iteration: with sources sorted by availability
    ascending, source i is saturated (takes all it has) iff
    ``avail_i · (S − i + 1) ≤ B − cum_{i−1}`` — an EXACT integer
    predicate; saturation is prefix-closed under this order, so the
    water line is one global pair of scalars (k = #saturated,
    sat = their total) and every unsaturated source gets
    ``(B − sat) / (S − k)``. No per-source iteration, no driver loop.

    Scale shape: one partial-agg shuffle collapses the corpus to
    source-dimension rows; everything after is TWO window passes over
    that tiny table, kept in the SAME plan branch — the global scalars
    (total, budget, water line) are unbounded windows, not agg +
    crossJoin, because each crossJoin branch would re-execute the
    corpus-scan subtree (measured: the two-crossJoin form planned 8
    scans of documents). The 100 TB cost is exactly one
    groupBy(source).
    """
    avail = documents.groupBy("source").agg(
        F.sum("n_chars").alias("avail_chars")
    )
    w = Window.orderBy(F.col("avail_chars").asc(), F.col("source").asc())
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = avail.select(
        "*",
        F.row_number().over(w).alias("i"),
        F.sum("avail_chars").over(w).alias("cum"),
        F.count(F.lit(1)).over(wall).alias("n_sources"),
        F.expr(
            f"(sum(avail_chars) over () * {budget_num}) div {budget_den}"
        )
        .cast("bigint")
        .alias("budget"),
    ).select(
        "*",
        (
            F.col("avail_chars") * (F.col("n_sources") - F.col("i") + 1)
            <= F.col("budget") - (F.col("cum") - F.col("avail_chars"))
        ).alias("saturated"),
    )
    lined = ranked.select(
        "*",
        F.sum(F.col("saturated").cast("bigint")).over(wall).alias("k_sat"),
        F.coalesce(
            F.sum(F.when(F.col("saturated"), F.col("avail_chars"))).over(
                wall
            ),
            F.lit(0),
        ).alias("sat_chars"),
    )
    return (
        lined.select(
            "source",
            "avail_chars",
            "saturated",
            F.when(F.col("saturated"), F.col("avail_chars").cast("double"))
            .otherwise(
                (F.col("budget") - F.col("sat_chars"))
                / F.nullif(
                    (F.col("n_sources") - F.col("k_sat")).cast("double"),
                    F.lit(0.0),
                )
            )
            .alias("alloc_raw"),
        )
        .select(
            "source",
            "avail_chars",
            "saturated",
            F.round("alloc_raw", 2).alias("alloc_chars"),
            F.round(F.col("alloc_raw") / F.col("avail_chars"), 6).alias(
                "sample_rate"
            ),
        )
    )


def quantile_normalize(documents: DataFrame) -> DataFrame:
    """Quantile normalization of document length across sources — the
    batch-effect correction that forces every source onto one reference
    length distribution: rank each document within its source, average
    the observed lengths at each rank position across sources, and map
    every document to that reference value. What remains source-specific
    after this is content, not crawler truncation policy.

    Per-source ranks come from ``ranks.grouped_row_number`` — the
    two-phase parallel per-group rank (range-partition by
    (source, n_chars, doc_id), rank locally per (partition id, source),
    attach the folded per-(partition, source) exclusive offsets). NO
    per-source single-partition window anywhere — the exact hazard the
    ``ranks`` primitives exist to kill — and no extra corpus pass: the
    previous formulation derived the same rank from a GLOBAL rank minus
    a per-source min-rank table, paying one more corpus groupBy + join
    for an identical result. The reference profile is a rank-keyed
    aggregate (rows = max source size), and the map-back is an equi-join
    on the rank.

    Exactness: ranks are exact integers; the reference value is an exact
    bigint sum over the sources present at that rank, divided once.
    """
    from . import ranks

    in_src = ranks.grouped_row_number(
        documents.select("doc_id", "source", "n_chars"),
        ["source"],
        [F.col("n_chars"), F.col("doc_id")],
        rank_col="src_rank",
    ).select("doc_id", "source", "n_chars", "src_rank")
    ref = in_src.groupBy("src_rank").agg(
        F.sum("n_chars").alias("__s"), F.count(F.lit(1)).alias("__c")
    )
    return in_src.join(ref, "src_rank").select(
        "doc_id",
        "source",
        "n_chars",
        "src_rank",
        F.round(F.col("__s") / F.col("__c"), 4).alias("norm_chars"),
    )


def epoch_order(
    documents: DataFrame,
    key_col: str = "doc_id",
    n_epochs: int = 3,
    head: int = 10,
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic per-EPOCH training-order reshuffle — the data-loader
    contract a multi-epoch run needs: every epoch visits the corpus in a
    different pseudo-random order, yet the order is a pure function of
    (salt, epoch, key), so a preempted job resumes mid-epoch bit-
    identically and two engines agree on it. Epoch e's permutation ranks
    rows by h32('{salt}:e:key'); returns the first ``head`` rows of each
    epoch's order — the slice checkpoint/verification tooling records.

    Scale shape: the epoch fan-out is an in-row explode (n_epochs copies
    of the KEY only, not the payload), and the per-epoch head is a
    row_number window that Catalyst truncates map-side
    (WindowGroupLimit), so each of the n_epochs groups ships only
    ``head`` candidate rows per partition to the final sort — never the
    corpus. Full-epoch iteration at 100 TB is the same expression as a
    sort key handed to the writer, no window at all.
    """
    keyed = (
        f"concat('{salt}', ':', cast(epoch as string), ':', "
        f"cast({key_col} as string))"
    )
    e = documents.select(
        key_col,
        F.explode(F.sequence(F.lit(1), F.lit(int(n_epochs)))).alias("epoch"),
    ).selectExpr(
        "cast(epoch as int) as epoch",
        key_col,
        f"{H.spark_h32(keyed)} as hkey",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("epoch").orderBy(
        F.col("hkey").asc(), F.col(key_col).asc()
    )
    return (
        e.withColumn("pos", F.row_number().over(w).cast("int"))
        .filter(F.col("pos") <= head)
        .select("epoch", "pos", key_col, "hkey")
    )


def duck_epoch_order_sql(
    key_col: str = "doc_id",
    n_epochs: int = 3,
    head: int = 10,
    salt: str = "epoch",
) -> str:
    """Oracle twin of :func:`epoch_order` over the ``documents`` view."""
    keyed = (
        f"concat('{salt}', ':', cast(epoch as varchar), ':', "
        f"cast({key_col} as varchar))"
    )
    return f"""
        WITH e AS (
            SELECT {key_col}, unnest(generate_series(1, {n_epochs})) AS epoch
            FROM documents
        ), h AS (
            SELECT CAST(epoch AS INT) AS epoch, {key_col},
                   {H.duck_h32(keyed)} AS hkey
            FROM e
        )
        SELECT epoch, CAST(rn AS INT) AS pos, {key_col}, hkey
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY epoch ORDER BY hkey, {key_col}) AS rn
            FROM h
        ) WHERE rn <= {head}
    """


def neyman_allocation(
    documents: DataFrame, budget: int = 1000, stratum_col: str = "source"
) -> DataFrame:
    """Optimal (Neyman) sample-allocation plan across strata — the
    sampling-design step BEFORE ``stratified_take``: given a total budget
    n, allocate n_h ∝ N_h·σ_h (more samples where the stratum is big or
    noisy), next to the proportional plan n_h ∝ N_h it improves on.
    Emits per stratum: size, exact mean, σ, both allocations, and the
    per-stratum variance contribution ratio — the table a survey/eval
    designer reads before drawing.

    Exactness: per-stratum (n, Σx, Σx²) are exact bigints from ONE
    conditional partial agg over the corpus (x = n_chars, integer);
    σ = sqrt of an exact rational and every allocation is a double
    expression of identical shape cross-engine, rounded once. The
    cross-strata totals ride as an unbounded window over the
    strata-sized aggregate (never a second corpus pass).
    """
    from pyspark.sql import Window

    g = documents.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum("n_chars").cast("bigint").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("sxx"),
    )
    # sample stddev: sqrt((Σx² − (Σx)²/n) / (n−1)) — exact rational
    # inside; a singleton stratum has no sample variance, so σ (and its
    # allocation weight) is NULL rather than an ANSI 0/0 error, mirrored
    # in the oracle (round-9 micro-fixture finding)
    sigma = F.when(
        F.col("n_h") > 1,
        F.sqrt(
            (
                F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx") / F.col("n_h")
            )
            / (F.col("n_h") - 1)
        ),
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    scored = g.select(
        "stratum",
        "n_h",
        F.round(F.col("sx") / F.col("n_h"), 4).alias("mean_chars"),
        sigma.alias("__sigma"),
        (F.col("n_h") * sigma).alias("__w"),
    ).select(
        "stratum",
        "n_h",
        "mean_chars",
        F.round("__sigma", 4).alias("sigma"),
        F.round(
            F.lit(budget) * F.col("__w")
            / F.nullif(F.sum("__w").over(w), F.lit(0.0)),
            4,
        ).alias("neyman_n"),
        F.round(
            F.lit(budget) * F.col("n_h") / F.sum("n_h").over(w), 4
        ).alias("proportional_n"),
        F.round(
            F.col("__w") / F.nullif(F.sum("__w").over(w), F.lit(0.0)), 6
        ).alias("weight_share"),
    )
    return scored


def duck_neyman_sql(budget: int = 1000, stratum_col: str = "source") -> str:
    """Oracle twin of :func:`neyman_allocation`."""
    return f"""
        WITH g AS (
            SELECT {stratum_col} AS stratum,
                   count(*)::BIGINT AS n_h,
                   sum(n_chars)::BIGINT AS sx,
                   sum(n_chars * n_chars)::BIGINT AS sxx
            FROM documents GROUP BY 1
        ), s AS (
            SELECT stratum, n_h,
                   round(sx / n_h, 4) AS mean_chars,
                   CASE WHEN n_h > 1 THEN
                       sqrt((sxx::DOUBLE - sx::DOUBLE * sx / n_h)
                            / (n_h - 1)) END AS sigma_raw,
                   CASE WHEN n_h > 1 THEN
                       n_h * sqrt((sxx::DOUBLE - sx::DOUBLE * sx / n_h)
                                  / (n_h - 1)) END AS w
            FROM g
        )
        SELECT stratum, n_h, mean_chars,
               round(sigma_raw, 4) AS sigma,
               round({budget} * w / nullif(sum(w) OVER (), 0), 4)
                   AS neyman_n,
               round({budget} * n_h / sum(n_h) OVER (), 4)
                   AS proportional_n,
               round(w / nullif(sum(w) OVER (), 0), 6) AS weight_share
        FROM s
    """
