"""Time-series similarity search over the events stream.

PAPERS.md: "Time Series Similarity Search for Streaming Data in
Distributed Systems" (EDBT 2019) / the top-k similarity-search family —
re-expressed Spark-first: each user's activity is a sparse integer vector
of per-day event counts, and similarity is cosine between those vectors.

Why integer count vectors: per-day COUNTS aggregate exactly (no
floating-point summation order), so dot products and squared norms are
exact integers and the final cosine is one IEEE division — bit-identical
in Spark and the DuckDB oracle, no rounding-boundary exposure.

Scale shape: the day-count aggregation is ONE partial-agg shuffle on
(user, day); the probe user's vector (≤ days rows) broadcasts into the
corpus side, so the candidate dot-product join never shuffles the corpus;
norms are a second small partial agg. For many-probe workloads this
becomes the blocked matrix-product shape of operators.similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: epoch microseconds per day (UTC session pinned by sources.parquet)
_DAY_US = 86_400_000_000


def daily_counts(events: DataFrame) -> DataFrame:
    """Sparse (user_id, day, c) activity vectors; day = epoch day."""
    return events.groupBy(
        "user_id",
        F.expr(f"cast(floor(unix_micros(ts) / {_DAY_US}) as bigint)").alias(
            "day"
        ),
    ).agg(F.count(F.lit(1)).alias("c"))


def topk_similar_users(
    events: DataFrame, probe_user: int = 0, k: int = 10
) -> DataFrame:
    """Top-k users whose daily-activity vector is most cosine-similar to
    ``probe_user``'s. Ties break on user_id ascending."""
    from pyspark.sql import Window

    daily = daily_counts(events)
    norms = daily.groupBy("user_id").agg(
        F.sum(F.col("c") * F.col("c")).alias("nsq")
    )
    probe = daily.filter(F.col("user_id") == probe_user).select(
        "day", F.col("c").alias("pc")
    )
    probe_norm = norms.filter(F.col("user_id") == probe_user).select(
        F.col("nsq").alias("pnsq")
    )
    dots = (
        daily.filter(F.col("user_id") != probe_user)
        .join(F.broadcast(probe), "day")
        .groupBy("user_id")
        .agg(F.sum(F.col("c") * F.col("pc")).alias("dot"))
    )
    sims = (
        dots.join(norms, "user_id")
        .crossJoin(F.broadcast(probe_norm))
        .select(
            "user_id",
            (
                F.col("dot") / (F.sqrt(F.col("nsq")) * F.sqrt(F.col("pnsq")))
            ).alias("cos_sim"),
        )
    )
    # top-k via orderBy().limit(k) → TakeOrderedAndProject (per-partition
    # heap + driver merge of k rows), NOT a corpus-wide single-partition
    # window; ranking then runs over the k-row result only.
    top = sims.orderBy(F.col("cos_sim").desc(), F.col("user_id").asc()).limit(k)
    w = Window.orderBy(F.col("cos_sim").desc(), F.col("user_id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("user_id", "cos_sim", "rank")
    )


def daily_anomaly(events: DataFrame, z_threshold: float = 2.0) -> DataFrame:
    """Volume-anomaly detection: events are counted per (event_type, day),
    then each day's count is scored against its type's across-days mean and
    sample stddev as a z-score; |z| >= ``z_threshold`` flags the day.
    Degenerate series score NULL, never throw: a single-day type has NULL
    sample stddev already, and a constant multi-day series (stddev 0)
    divides by ``nullif(stddev, 0)`` — mirrored in the oracle (round-9
    micro-fixture finding; ANSI mode turns 0/0 into a hard error).

    Scale shape: the expensive pass is the (type, day) count — partial-agg
    friendly, one shuffle. The z-score window runs over the *aggregated*
    table (|types| x |days| rows — trivially small at any input scale), so
    the second exchange moves almost nothing; no raw-row window anywhere.
    """
    day_ms = (F.unix_micros(F.date_trunc("day", F.col("ts"))) / F.lit(1000)).cast(
        "long"
    )
    daily = events.groupBy(
        "event_type", day_ms.alias("day_ms")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type")
    scored = daily.select(
        "event_type",
        "day_ms",
        "n_events",
        F.round(
            (F.col("n_events") - F.avg("n_events").over(w))
            / F.nullif(F.stddev_samp("n_events").over(w), F.lit(0.0)),
            6,
        ).alias("zscore"),
    )
    return scored.withColumn(
        "is_anomaly", F.abs(F.col("zscore")) >= F.lit(z_threshold)
    )


def trailing_revenue(orders: DataFrame, days: int = 7) -> DataFrame:
    """Trailing ``days``-day revenue over the daily totals: per day, the
    RANGE-framed sum/average of the last ``days`` calendar days (gaps in
    the calendar count — a missing day still ages older revenue out,
    which a ROWS frame would get wrong).

    Scale shape: raw orders collapse to one row per day in a partial-agg
    groupBy; the RANGE window then runs over |days in history| rows —
    negligible at any input scale, and the frame is a single ordered scan.
    """
    day = (F.unix_micros(F.date_trunc("day", F.col("o_orderdate"))) / F.lit(1000)).cast(
        "long"
    )
    daily = orders.groupBy(day.alias("day_ms")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = (
        Window.orderBy((F.col("day_ms") / F.lit(86400000)).cast("long"))
        .rangeBetween(-(days - 1), 0)
    )
    return daily.select(
        "day_ms",
        "revenue",
        F.round(F.sum("revenue").over(w), 2).alias("trail_total"),
        F.round(F.avg("revenue").over(w), 4).alias("trail_avg"),
        F.count(F.lit(1)).over(w).alias("trail_days"),
    )


def locf_fill(events: DataFrame) -> DataFrame:
    """Last-observation-carried-forward gap fill: treat only ``click``
    events as carrying a sensor reading; every other event row gets the
    user's most recent prior reading (IGNORE NULLS window semantics — the
    canonical sparse→dense time-series repair).

    Scale shape: one shuffle on user_id, one sort per partition; the
    ignore-nulls ``last`` is a running O(1) frame walk, not a rescan per
    row. Values pass through untouched (no arithmetic), so the oracle
    match is exact on raw doubles.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    reading = F.when(F.col("event_type") == "click", F.col("value"))
    from ..schema import ts_ms

    return events.select(
        "event_id",
        "user_id",
        ts_ms("ts").alias("ts_ms"),
        "event_type",
        reading.alias("reading"),
        F.last(reading, ignorenulls=True).over(w).alias("filled"),
    )


def ema_daily(events: DataFrame) -> DataFrame:
    """Exponential moving average (α = 1/2) over each type's daily count
    series — the smoothing pass dashboards and anomaly baselines run.

    Exactness trick: with α = 1/2, y_t = (x_t + y_{t-1})/2 has the closed
    form y_t = (Σ_{i≤t} x_i·2^i) / 2^(t+1) — the numerator is an exact
    integer RUNNING SUM (one window cumsum over the per-day aggregates,
    ≤ 2^53 for any realistic series length), and the division by a power
    of two is exact in IEEE. No recursive state, no libm pow: the
    iterative definition becomes one cumulative window, bit-identical in
    both engines. Windows run over the aggregated day table only.
    """
    ev = events.select(
        "event_type",
        F.floor(F.unix_micros("ts") / _DAY_US).cast("bigint").alias("day"),
    ).groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    run = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = F.row_number().over(w)
    return (
        ev.withColumn("t", t)
        .withColumn(
            "num",
            F.sum(F.col("n") * F.pow(F.lit(2.0), F.col("t")).cast("bigint")).over(
                run
            ),
        )
        .select(
            "event_type",
            (F.col("day") * 86_400_000).alias("day_ms"),
            "n",
            F.round(
                F.col("num") / F.pow(F.lit(2.0), F.col("t") + 1), 6
            ).alias("ema"),
        )
    )


def cusum_daily(events: DataFrame) -> DataFrame:
    """CUSUM change detection over each type's daily counts: cumulative
    deviation from the series mean (exact integer numerators: dev_t =
    Σ(n_i·T − N) with T = days, N = total — the ×T clearing of the mean
    division keeps everything integral). The max positive / negative
    excursions and their days are the change-point evidence.

    One partial agg to days, one broadcast of the per-type totals, one
    window cumsum over the tiny day table. The argmax picks are tie-proof
    (excursion, then earliest day).
    """
    ev = events.select(
        "event_type",
        F.floor(F.unix_micros("ts") / _DAY_US).cast("bigint").alias("day"),
    ).groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    # "tot"/"nd", not "N"/"T": Spark resolves case-insensitively, so a
    # column named N would collide with the per-day n after the join
    tot = ev.groupBy("event_type").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("nd")
    )
    run = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dev = (
        ev.join(F.broadcast(tot), "event_type")
        .withColumn(
            "cusum", F.sum(F.col("n") * F.col("nd") - F.col("tot")).over(run)
        )
    )
    return dev.groupBy("event_type").agg(
        F.max("cusum").alias("max_up"),
        F.min("cusum").alias("max_down"),
        # injective bigint arg-key: (-cusum)·2^20 + day (epoch days ≪ 2^20)
        # — struct ordering inside min_by is not portable to the oracle
        F.min_by(
            "day", (-F.col("cusum")) * F.lit(1_048_576) + F.col("day")
        ).alias("argmax_day"),
        F.any_value(F.col("nd")).alias("n_days"),
    )


def autocorr_daily(events: DataFrame) -> DataFrame:
    """Lag-1 autocorrelation of each type's daily counts (the seasonality
    / burstiness detector): Pearson r over (n_t, n_{t+1}) pairs computed
    from EXACT integer sums (Σx, Σy, Σxy, Σx², Σy², m) — one lead window
    over the day table, one aggregation, a single closed-form double
    expression at the end, bit-identical cross-engine.
    """
    ev = events.select(
        "event_type",
        F.floor(F.unix_micros("ts") / _DAY_US).cast("bigint").alias("day"),
    ).groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = (
        ev.withColumn("n_next", F.lead("n").over(w))
        .filter(F.col("n_next").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.sum("n").alias("sx"),
            F.sum("n_next").alias("sy"),
            F.sum(F.col("n") * F.col("n_next")).alias("sxy"),
            F.sum(F.col("n") * F.col("n")).alias("sxx"),
            F.sum(F.col("n_next") * F.col("n_next")).alias("syy"),
        )
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return pairs.select(
        "event_type",
        "m",
        # constant series ⇒ zero variance ⇒ undefined r: null, not ±inf
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("lag1_autocorr"),
    )


def retention_cohorts(events: DataFrame, max_offset: int = 7) -> DataFrame:
    """RATE view of the cohort retention triangle: the per-(cohort,
    day-offset) returning-user counts come from the existing counting
    kernel (``sessions.retention_cohorts`` — two partial-agg shuffles
    over (user, day) distincts, no raw-row window); this view caps the
    offset, joins each cohort's size back on, and emits the retention
    fraction. Cohort sizes are the triangle's OWN offset-0 rows (every
    member is active on day 0 by definition), so no extra corpus pass —
    and those rows reading retention 1.0 is a built-in self-check.
    """
    from .sessions import retention_cohorts as _triangle

    tri = _triangle(events).filter(F.col("day_offset") <= max_offset)
    sizes = tri.filter(F.col("day_offset") == 0).select(
        "cohort_day_ms", F.col("n_users").alias("cohort_n")
    )
    return tri.join(sizes, "cohort_day_ms").select(
        F.col("cohort_day_ms").alias("cohort_ms"),
        "day_offset",
        F.col("n_users").cast("bigint").alias("n_active"),
        F.col("cohort_n").cast("bigint").alias("n_users"),
        F.round(F.col("n_users") / F.col("cohort_n"), 6).alias("retention"),
    )


def xcorr_lag(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """Cross-correlation scan between event types' daily count series:
    Pearson r of (type_a's day-t count, type_b's day-(t+lag) count) for
    every ordered type pair a ≠ b and every lag in [0, max_lag] — the
    lead/lag detector ("signups spike 2 days after campaign events").

    Exactness: the aggregate is the same six exact-integer sums as
    ``autocorr_daily`` (Σx, Σy, Σxy, Σx², Σy², m); the only doubles are
    the final closed-form r, rounded once. Zero-variance legs emit null.

    Scale shape: the event scan collapses to a (type × day) table in ONE
    partial-agg shuffle; everything after runs on that metadata-sized
    table — the lag fan-out is a broadcast of (max_lag+1) literals and
    the pair join is day-table × day-table, both tiny at any corpus
    size. No raw-row window, no corpus re-scan per lag.
    """
    # persist: the lag join references the day table on BOTH sides, and
    # without pinning each branch would re-run the corpus scan + agg
    # (measured: 2 parquet scans, no exchange reuse). The cached table
    # is (types × days)-sized; cleanup follows the module contract
    # (callers clearCache per query, as bench/oracle harnesses do).
    day = (
        events.groupBy(
            "event_type",
            F.expr(
                f"cast(floor(unix_micros(ts) / {_DAY_US}) as bigint)"
            ).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    lags = F.explode(F.sequence(F.lit(0), F.lit(max_lag))).alias("lag")
    a = day.select(
        F.col("event_type").alias("type_a"),
        F.col("day").alias("day_a"),
        F.col("n").alias("x"),
    ).select("*", lags)
    b = day.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("day_b"),
        F.col("n").alias("y"),
    )
    pairs = a.join(
        b,
        (F.col("type_b") != F.col("type_a"))
        & (F.col("day_b") == F.col("day_a") + F.col("lag")),
    )
    s = pairs.groupBy("type_a", "type_b", "lag").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        "type_a",
        "type_b",
        F.col("lag").cast("bigint").alias("lag_days"),
        "m",
        F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("xcorr"),
    )


def ab_ztest(events: DataFrame) -> DataFrame:
    """Two-sample z-test of each event type's mean ``value`` against the
    REST of the stream — the guardrail-metric screen an experimentation
    pipeline runs per variant.

    One pass: values enter as exact cents (round(value·100) as bigint),
    so per-type (n, Σx, Σx²) aggregate exactly; the complement's moments
    are global-minus-group integer subtractions, with the global sums
    attached as unbounded windows over the per-type aggregate — no
    second corpus scan, no self-join. The only doubles are the
    final means/variances/z closed forms, each rounded once.

    z = (m̄₁ − m̄₂) / √(s₁²/n₁ + s₂²/n₂)  (Welch, sample variances).
    """
    cents = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cv"),
    )
    g = cents.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum("cv").alias("sx1"),
        F.sum(F.col("cv") * F.col("cv")).alias("sxx1"),
    )
    # Global moments as an unbounded window over the PER-TYPE aggregate:
    # the rollup is exact (moments are associative), the window input is
    # the |types|-row table (never the corpus), and keeping it in the
    # same plan branch means the events scan runs exactly once — a
    # second agg + crossJoin would execute the scan subtree twice.
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    j = g.select(
        "*",
        (F.sum("n1").over(wall) - F.col("n1")).alias("n2"),
        (F.sum("sx1").over(wall) - F.col("sx1")).alias("sx2"),
        (F.sum("sxx1").over(wall) - F.col("sxx1")).alias("sxx2"),
    )

    def _mean(s, n):
        # n2 is 0 when a single event type owns the whole stream — the
        # complement's mean (and z) is NULL, never an ANSI 0/0 error
        # (round-9 degenerate-events finding), mirrored in the oracle
        return (
            F.col(s) / F.nullif(F.col(n).cast("double"), F.lit(0.0))
            / F.lit(100.0)
        )

    def _var(sxx, sx, n):
        # sample variance in value units: cents² → /1e4. Σx enters the
        # square as a double (Σx < 2^53 so the cast is exact) because the
        # bigint product Σx·Σx overflows at corpus scale.
        return (
            (
                F.col(sxx)
                - F.col(sx).cast("double")
                * F.col(sx)
                / F.col(n).cast("double")
            )
            / F.nullif((F.col(n) - F.lit(1)).cast("double"), F.lit(0.0))
            / F.lit(10_000.0)
        )

    z = (_mean("sx1", "n1") - _mean("sx2", "n2")) / F.sqrt(
        _var("sxx1", "sx1", "n1") / F.col("n1")
        + _var("sxx2", "sx2", "n2")
        / F.nullif(F.col("n2").cast("double"), F.lit(0.0))
    )
    return j.select(
        "event_type",
        F.col("n1").alias("n"),
        F.round(_mean("sx1", "n1"), 4).alias("mean_value"),
        F.round(_mean("sx2", "n2"), 4).alias("mean_rest"),
        # + 0.0 canonicalizes IEEE −0.0 (a type's mean a hair under the
        # rest's rounds to −0.0 in one engine, 0.0 in the other)
        (F.round(z, 4) + F.lit(0.0)).alias("z_score"),
    )


def trend_robust(events: DataFrame) -> DataFrame:
    """Robust trend battery per event type over the daily-count series:
    the Mann–Kendall S statistic (Σ sign(n_j − n_i) over ordered day
    pairs — monotone-trend direction, pure integers) and the Theil–Sen
    slope (lower-median of all pairwise slopes — the outlier-resistant
    trend rate a burst day cannot hijack, unlike OLS).

    Exactness: S is a CASE-sum of {−1,0,1}; each slope is one division
    of two small exact integers and the median is an ORDER STATISTIC
    (row (m+1)÷2 under (slope, day_a, day_b) — no even-count averaging,
    no interpolation), so every output is deterministic cross-engine.

    Scale shape: the corpus collapses to the (type × day) table in ONE
    partial-agg shuffle; the pair self-join and the per-type windows run
    on that calendar-bounded table (≤ days² rows per type, independent
    of corpus size). The per-type scalars (pair count, S, day count)
    ride as windows in the SAME plan branch — no second scan.
    """
    # persist: the pair self-join reads the day table twice — pinning it
    # keeps the corpus scan single-execution (same rationale and cleanup
    # contract as xcorr_lag above)
    ev = (
        events.groupBy(
            "event_type",
            F.expr(
                f"cast(floor(unix_micros(ts) / {_DAY_US}) as bigint)"
            ).alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    wt = Window.partitionBy("event_type")
    evd = ev.select("*", F.count(F.lit(1)).over(wt).alias("n_days"))
    a = evd.select(
        F.col("event_type"),
        F.col("day").alias("day_a"),
        F.col("n").alias("na"),
        "n_days",
    )
    b = evd.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("day_b"),
        F.col("n").alias("nb"),
    )
    pairs = a.join(
        b,
        (F.col("type_b") == F.col("event_type"))
        & (F.col("day_b") > F.col("day_a")),
    ).select(
        "event_type",
        "n_days",
        "day_a",
        "day_b",
        F.when(F.col("nb") > F.col("na"), F.lit(1))
        .when(F.col("nb") < F.col("na"), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("sgn"),
        ((F.col("nb") - F.col("na")) / (F.col("day_b") - F.col("day_a"))).alias(
            "slope"
        ),
    )
    wo = Window.partitionBy("event_type").orderBy("slope", "day_a", "day_b")
    wall = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = pairs.select(
        "event_type",
        "n_days",
        "slope",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n_pairs"),
        F.sum("sgn").over(wall).alias("s_stat"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) div 2")
    ).select(
        "event_type",
        "n_days",
        "n_pairs",
        "s_stat",
        F.round("slope", 6).alias("sen_slope"),
    )


def changepoint_daily(events: DataFrame) -> DataFrame:
    """Single-changepoint detection per event type over the daily-count
    series — binary segmentation's first split: the day boundary that
    maximizes the between-segment variance reduction

        gain(t) = S1²/n1 + S2²/n2 − S²/n

    (equivalently: the split minimizing pooled SSE around the two segment
    means — the CUSUM/level-shift detector a pipeline runs when
    ``cusum_daily`` flags drift but the WHERE of the regime change is
    needed). Emits, per type, the best split boundary (last day of the
    left segment), the two segment means, and the gain.

    Exactness: prefix sums S1/S2 are exact integers (bigint counts); the
    gain is three IEEE divisions + two additions on integer-valued
    doubles — bit-identical cross-engine — and the argmax tie-breaks on
    the earliest day, so the selected row is deterministic even when two
    splits tie exactly.

    Scale shape: the corpus collapses to the (type × day) table in ONE
    partial-agg shuffle; every window below is PARTITIONED by event_type
    over that calendar-bounded series (≤ days rows per type, independent
    of corpus size), so no global-window stage exists and types scan
    their series in parallel.
    """
    daily = events.groupBy(
        "event_type",
        F.expr(f"cast(floor(unix_micros(ts) / {_DAY_US}) as bigint)").alias(
            "day"
        ),
    ).agg(F.count(F.lit(1)).alias("c"))
    wo = Window.partitionBy("event_type").orderBy("day")
    wall = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pref = daily.select(
        "event_type",
        "day",
        F.row_number().over(wo).alias("n1"),
        F.sum("c").over(wo).cast("double").alias("s1"),
        F.count(F.lit(1)).over(wall).alias("n_days"),
        F.sum("c").over(wall).cast("double").alias("s"),
    )
    cand = pref.filter(F.col("n1") < F.col("n_days")).select(
        "event_type",
        "day",
        "n_days",
        "n1",
        "s1",
        (F.col("n_days") - F.col("n1")).alias("n2"),
        (F.col("s") - F.col("s1")).alias("s2"),
        (
            F.col("s1") * F.col("s1") / F.col("n1")
            + (F.col("s") - F.col("s1"))
            * (F.col("s") - F.col("s1"))
            / (F.col("n_days") - F.col("n1"))
            - F.col("s") * F.col("s") / F.col("n_days")
        ).alias("gain"),
    )
    wbest = Window.partitionBy("event_type").orderBy(
        F.col("gain").desc(), F.col("day").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("day").alias("split_day"),
            F.round(F.col("s1") / F.col("n1"), 4).alias("mean_before"),
            F.round(F.col("s2") / F.col("n2"), 4).alias("mean_after"),
            F.round("gain", 4).alias("gain"),
        )
    )


def seasonal_decompose(events: DataFrame) -> DataFrame:
    """STL-lite additive decomposition of each event type's daily-count
    series: trend = centered 7-day moving average, seasonal = per
    day-of-week mean of the detrended series, residual = remainder —
    emitted for every day with a full trend window. The classical
    decomposition a capacity planner runs before alerting on "drops"
    that are just weekends.

    Exactness: every component is kept as an exact integer numerator
    over the common denominator 7·cnt until the final division —
    detr7 = 7c − Σ₇c is a bigint, the seasonal numerator is a bigint
    sum of bigints, residual7·cnt likewise — so the three emitted
    doubles are single IEEE divisions, bit-identical cross-engine, with
    no accumulation-order exposure anywhere.

    Scale shape: the corpus collapses to (type × day) in ONE partial-agg
    shuffle; the moving-average window is PARTITIONED by event_type, the
    seasonal window by (event_type, dow) — every window runs on a
    calendar-bounded series regardless of corpus size.
    """
    daily = events.groupBy(
        "event_type",
        F.expr(f"cast(floor(unix_micros(ts) / {_DAY_US}) as bigint)").alias(
            "day"
        ),
    ).agg(F.count(F.lit(1)).alias("c"))
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    framed = daily.select(
        "event_type",
        "day",
        "c",
        F.sum("c").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("n7"),
        (F.col("day") % 7).alias("dow"),
    ).filter(F.col("n7") == 7)
    detr = framed.select(
        "event_type",
        "day",
        "c",
        "s7",
        "dow",
        (F.lit(7) * F.col("c") - F.col("s7")).alias("detr7"),
    )
    wd = Window.partitionBy("event_type", "dow")
    comp = detr.select(
        "event_type",
        "day",
        "c",
        "s7",
        "detr7",
        F.sum("detr7").over(wd).alias("sd7"),
        F.count(F.lit(1)).over(wd).alias("cnt"),
    )
    denom = F.lit(7.0) * F.col("cnt")
    return comp.select(
        "event_type",
        "day",
        F.col("c").cast("bigint").alias("n_events"),
        F.round(F.col("s7") / F.lit(7.0), 4).alias("trend"),
        F.round(F.col("sd7") / denom, 4).alias("seasonal"),
        F.round(
            (F.col("detr7") * F.col("cnt") - F.col("sd7")) / denom, 4
        ).alias("residual"),
    )


def kaplan_meier(events: DataFrame) -> DataFrame:
    """Kaplan–Meier survival curve of user lifetime (days from first to
    last activity), right-censored at the corpus horizon: a user whose
    last event falls on the final observed day is censored, not churned.
    Emits one row per lifetime offset with any exit: at-risk count,
    churn count, censored count, and the product-limit survival estimate
    — the churn curve a retention team reads the media half-life off.

    Exactness: risk/churn counts are exact integers (the reverse
    cumulative sum of exits IS the risk set); the product limit is
    exp(Σ ln((n−d)/n)) over the offset-ordered window — a fixed-order
    chain of single IEEE ops, identical cross-engine — with extinction
    (n = d) short-circuited to survival 0 rather than ln(0).

    Scale shape: the corpus collapses to per-user (first, last) in ONE
    partial-agg shuffle, then to offset-level counts (≤ observation-span
    rows — calendar-bounded, so the unpartitioned offset windows run on
    a metadata-sized relation at any corpus scale, the same contract as
    the histogram quantile windows). The horizon rides as a window on
    the per-user relation, not a second scan.
    """
    days = events.select(
        "user_id",
        F.expr(f"cast(floor(unix_micros(ts) / {_DAY_US}) as bigint)").alias(
            "day"
        ),
    )
    per_user = days.groupBy("user_id").agg(
        F.min("day").alias("f"), F.max("day").alias("l")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lt = per_user.select(
        (F.col("l") - F.col("f")).alias("offset_days"),
        (F.col("l") < F.max("l").over(wall)).cast("int").alias("churned"),
    )
    counts = lt.groupBy("offset_days").agg(
        F.sum("churned").alias("d"),
        F.sum(F.lit(1) - F.col("churned")).alias("c"),
    )
    wrev = Window.orderBy("offset_days").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    wcum = Window.orderBy("offset_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = counts.select(
        "offset_days",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c")).over(wrev).alias("n"),
    )
    term = F.when(
        F.col("n") > F.col("d"),
        F.log((F.col("n") - F.col("d")) / F.col("n")),
    ).otherwise(F.lit(0.0))
    ext = F.max((F.col("n") == F.col("d")).cast("int")).over(wcum)
    curve = risk.select(
        "offset_days",
        F.col("n").cast("bigint").alias("n_at_risk"),
        F.col("d").cast("bigint").alias("n_churned"),
        F.col("c").cast("bigint").alias("n_censored"),
        F.sum(term).over(wcum).alias("__lncum"),
        ext.alias("__ext"),
    )
    return curve.select(
        "offset_days",
        "n_at_risk",
        "n_churned",
        "n_censored",
        F.when(F.col("__ext") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("__lncum")), 4))
        .alias("survival"),
    )


def cohort_ltv(events: DataFrame, max_offset: int = 7) -> DataFrame:
    """Cumulative lifetime value per signup cohort: revenue (purchase
    ``value``) attributed to each user's cohort day, accumulated over
    day offsets — the LTV triangle a growth team reads payback periods
    off, completing ``retention_cohorts`` (presence) with value.

    Exactness: revenue is 1e-4-quantized to exact bigint cents-of-cents
    BEFORE any sum (the ``_exact_sum_4dp`` convention), so both the
    per-offset and the cumulative sums are exact integer arithmetic;
    division by the cohort size happens once per emitted row.

    Scale shape: cohort days come from one (user → min day) partial agg;
    purchases join their user's cohort through a user-keyed equi-join
    (dimension-sized right side — no broadcast forced, AQE decides);
    everything after collapses to the (cohort × offset) triangle —
    calendar²-bounded — where the cumulative window is PARTITIONED by
    cohort.
    """
    day = F.expr(f"cast(floor(unix_micros(ts) / {_DAY_US}) as bigint)")
    cohorts = (
        events.select("user_id", day.alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        day.alias("day"),
        F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint").alias("v4"),
    )
    cohort_sizes = cohorts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_n")
    )
    cell = (
        purchases.join(cohorts, "user_id")
        .select(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
            "v4",
        )
        .filter(F.col("day_offset") <= max_offset)
        .groupBy("cohort_day", "day_offset")
        .agg(F.sum("v4").alias("rev4"), F.count(F.lit(1)).alias("n_purchases"))
    )
    wcum = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cell.join(cohort_sizes, "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            F.col("n_purchases").cast("bigint").alias("n_purchases"),
            F.round(F.col("rev4") / F.lit(10000.0), 4).alias("revenue"),
            F.round(F.sum("rev4").over(wcum) / F.lit(10000.0), 4).alias(
                "cum_revenue"
            ),
            F.col("cohort_n").cast("bigint").alias("cohort_n"),
            F.round(
                F.sum("rev4").over(wcum) / (F.lit(10000.0) * F.col("cohort_n")),
                4,
            ).alias("ltv_per_user"),
        )
    )


def stl_anomaly(events: DataFrame, z: float = 2.0) -> DataFrame:
    """Seasonality-aware anomaly flags: days whose ``seasonal_decompose``
    residual exceeds ``z`` residual standard deviations for their event
    type — the alert that stays quiet on weekends where a raw z-score
    (``daily_anomaly``) pages. Emits flagged days with the residual and
    its per-type z-score.

    Composes the decomposition operator; the residual moments are an
    algebraic aggregate of the calendar-bounded component table
    (population σ per type), broadcast back by type. Exactness: the
    1e-4-rounded residuals are re-quantized to exact bigints
    (floor(r·10⁴ + 0.5)) before the moment sums, so σ and every z-score
    are deterministic cross-engine and the FLAG SET itself (a membership
    decision, more fragile than a rounded value) cannot drift with
    accumulation order.
    """
    comp = seasonal_decompose(events).withColumn(
        "__r4", F.floor(F.col("residual") * 10000 + F.lit(0.5)).cast("bigint")
    )
    stats = comp.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__r4").alias("sr"),
        F.sum(F.col("__r4") * F.col("__r4")).alias("srr"),
    )
    joined = comp.join(F.broadcast(stats), "event_type")
    var = (
        F.col("srr").cast("double") - F.col("sr") * F.col("sr") / F.col("n")
    ) / F.col("n")
    zscore = F.col("__r4") / F.sqrt(var)
    return (
        joined.filter(F.abs(zscore) > z)
        .select(
            "event_type",
            "day",
            "n_events",
            "residual",
            F.round(zscore, 4).alias("res_z"),
        )
    )


def sax_motifs(events: DataFrame, alphabet: int = 3, word: int = 3) -> DataFrame:
    """SAX-style motif mining over per-user daily activity (Lin et al.
    2003's Symbolic Aggregate approXimation, with equal-frequency
    breakpoints instead of Gaussian ones so the discretization is exact
    integer rank arithmetic in both engines): each user's daily counts
    are binned into ``alphabet`` symbols by within-user ``ntile`` over
    the (count, day) total order, consecutive observed days form
    ``word``-length SAX words, and the motif table reports how often and
    across how many users each word occurs — the classic cheap motif /
    discord screen before any expensive subsequence matching.

    Scale shape: one (user, day) count shuffle, then ALL windows are
    partitioned by user_id (per-user series, never corpus-wide); the
    motif rollup is an alphabet^word-row partial agg. Ntile over a total
    order (count, day) is deterministic everywhere.
    """
    from pyspark.sql import Window

    daily = daily_counts(events)
    sym = daily.withColumn(
        "sym",
        F.ntile(alphabet).over(
            Window.partitionBy("user_id").orderBy("c", "day")
        ),
    ).withColumn("sym", F.char(F.col("sym") + 96))  # 1->a, 2->b, ...
    seq = Window.partitionBy("user_id").orderBy("day")
    parts = [F.lead("sym", i).over(seq) for i in range(word)]
    words = sym.select(
        "user_id", F.concat(*parts).alias("sax_word")
    ).filter(F.col("sax_word").isNotNull() & (F.length("sax_word") == word))
    return words.groupBy("sax_word").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


def did_estimator(events: DataFrame, split: str = "2024-01-15") -> DataFrame:
    """Difference-in-differences on mean event value: users hash-split
    50/50 into control/treatment (the portable salted-h32 assignment the
    sampling operators use — deterministic, engine-identical), the
    timeline split pre/post at ``split``; the estimator is the classic
    2×2: (treat_post − treat_pre) − (ctrl_post − ctrl_pre). The
    experiment-analysis kernel run against every natural-experiment
    rollout. Emits the four cell means, each cell's n, and the DiD
    estimate in one row.

    Exactness: values aggregate as exact cents (round(value·100)
    bigints) in ONE conditional-agg pass; only the four means and their
    differences are doubles (identical expression shapes cross-engine),
    rounded once.
    """
    from ..functions import hashing as H

    h = H.spark_h32("concat('did:', cast(user_id as string))")
    grp = f"pmod({h}, 2)"
    post = F.col("ts") >= F.lit(split).cast("timestamp")
    cv = F.round(F.col("value") * 100).cast("bigint")
    cells = events.selectExpr(
        f"cast({grp} as int) as treat", "ts", "value"
    ).select(
        "treat", post.alias("post"), cv.alias("cv")
    )
    agg = cells.groupBy().agg(
        *[
            a
            for t in (0, 1)
            for p in (False, True)
            for a in (
                F.sum(
                    F.when((F.col("treat") == t) & (F.col("post") == p), 1)
                    .otherwise(0)
                )
                .cast("bigint")
                .alias(f"n_{t}{int(p)}"),
                F.sum(
                    F.when(
                        (F.col("treat") == t) & (F.col("post") == p),
                        F.col("cv"),
                    ).otherwise(F.lit(0))
                )
                .cast("bigint")
                .alias(f"s_{t}{int(p)}"),
            )
        ]
    )
    # empty 2×2 cells mean NULL (nullif guard, mirrored in the oracle)
    # rather than an ANSI divide-by-zero error — micro-fixtures can miss
    # a (arm, period) cell entirely
    m = {
        f"m_{t}{p}": (
            f"cast(s_{t}{p} as double)"
            f" / nullif(cast(n_{t}{p} as double), 0.0) / 100.0"
        )
        for t in (0, 1)
        for p in (0, 1)
    }
    return agg.selectExpr(
        "n_00", "n_01", "n_10", "n_11",
        f"round({m['m_00']}, 4) as ctrl_pre",
        f"round({m['m_01']}, 4) as ctrl_post",
        f"round({m['m_10']}, 4) as treat_pre",
        f"round({m['m_11']}, 4) as treat_post",
        f"round(({m['m_11']} - {m['m_10']}) - ({m['m_01']} - {m['m_00']}), 4)"
        " as did",
    )


def duck_did_sql(split: str = "2024-01-15") -> str:
    """Oracle twin of :func:`did_estimator`."""
    from ..functions import hashing as H

    h = H.duck_h32("('did:' || user_id::VARCHAR)")
    grp = f"({h} % 2)"
    cells = []
    for t in (0, 1):
        for p in (0, 1):
            cond = (
                f"treat = {t} AND post = {str(bool(p)).upper()}"
            )
            cells.append(
                f"sum(CASE WHEN {cond} THEN 1 ELSE 0 END)::BIGINT AS n_{t}{p}"
            )
            cells.append(
                f"sum(CASE WHEN {cond} THEN cv ELSE 0 END)::BIGINT AS s_{t}{p}"
            )
    m = {
        f"m_{t}{p}": (
            f"(s_{t}{p}::DOUBLE / nullif(n_{t}{p}::DOUBLE, 0) / 100.0)"
        )
        for t in (0, 1)
        for p in (0, 1)
    }
    return f"""
        WITH cells AS (
            SELECT {grp} AS treat,
                   ts >= TIMESTAMP '{split}' AS post,
                   CAST(round(value * 100) AS BIGINT) AS cv
            FROM events
        ), agg AS (
            SELECT {", ".join(cells)} FROM cells
        )
        SELECT n_00, n_01, n_10, n_11,
               round({m["m_00"]}, 4) AS ctrl_pre,
               round({m["m_01"]}, 4) AS ctrl_post,
               round({m["m_10"]}, 4) AS treat_pre,
               round({m["m_11"]}, 4) AS treat_post,
               round(({m["m_11"]} - {m["m_10"]})
                     - ({m["m_01"]} - {m["m_00"]}), 4) AS did
        FROM agg
    """


def snaive_backtest(events: DataFrame, season: int = 7) -> DataFrame:
    """Seasonal-naive FORECAST BACKTEST per event type: predict each
    day's count with the count ``season`` days earlier and score the
    prediction (MAE and weighted MAPE = Σ|err|/Σactual) — the baseline
    every forecasting deployment must beat, measured the way a backtest
    actually runs (only days where both the target and its seasonal lag
    were observed are scored).

    Exactness: counts and absolute errors are exact integers; the two
    ratios divide exact sums once, rounded. Scale shape: the corpus
    collapses to the (type, day) table in one partial agg; the seasonal
    join is a self-equi-join ON that metadata-sized table; output is
    |types| rows.
    """
    daily = events.groupBy(
        "event_type",
        F.expr(f"cast(floor(unix_micros(ts) / {_DAY_US}) as bigint)").alias(
            "day"
        ),
    ).agg(F.count(F.lit(1)).alias("c"))
    lagged = daily.select(
        "event_type",
        (F.col("day") + season).alias("day"),
        F.col("c").alias("c_pred"),
    )
    scored = daily.join(lagged, ["event_type", "day"]).select(
        "event_type",
        F.abs(F.col("c") - F.col("c_pred")).alias("abs_err"),
        "c",
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days_scored"),
        F.round(F.sum("abs_err") / F.count(F.lit(1)), 4).alias("mae"),
        F.round(F.sum("abs_err") / F.sum("c"), 4).alias("wmape"),
    )


def duck_snaive_sql(season: int = 7) -> str:
    """Oracle twin of :func:`snaive_backtest`."""
    return f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
                   count(*) AS c
            FROM events GROUP BY 1, 2
        ), scored AS (
            SELECT a.event_type, abs(a.c - b.c) AS abs_err, a.c
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.day = b.day + {season}
        )
        SELECT event_type, count(*)::BIGINT AS n_days_scored,
               round(sum(abs_err) / count(*), 4) AS mae,
               round(sum(abs_err) / sum(c), 4) AS wmape
        FROM scored GROUP BY event_type
    """


def dau_mau(events: DataFrame) -> DataFrame:
    """Engagement stickiness: per day, DAU (distinct active users), the
    trailing-30-day MAU, and the DAU/MAU ratio — the product-health
    metric every activity dashboard leads with.

    Exactness: both counts are exact distincts; the ratio divides exact
    integers once, rounded. Scale shape: the corpus collapses to the
    distinct (user, day) relation in one shuffle; the trailing MAU joins
    day d to its 30-day window ON THAT relation via a range condition
    bounded by the 30-row day calendar per user-day — all work is
    |users|·|days|-bounded, never event-bounded.
    """
    # Materialized ONCE (round 12): the old persist()/unpersist() pair
    # released the cache before the lazy result ever ran, so all three
    # consumers (dau, the day calendar, the mau range join) re-ran the
    # corpus-sized distinct. localCheckpoint truncates lineage; the
    # bench's release sweep reclaims the blocks.
    ud = (
        events.select(
            "user_id",
            F.expr(
                f"cast(floor(unix_micros(ts) / {_DAY_US}) as bigint)"
            ).alias("day"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    dau = ud.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    days = ud.select("day").distinct()
    mau = (
        days.alias("d")
        .join(
            ud.alias("u"),
            (F.col("u.day") <= F.col("d.day"))
            & (F.col("u.day") > F.col("d.day") - 30),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").cast("bigint").alias("mau"))
    )
    out = dau.join(mau, "day").select(
        "day",
        "dau",
        "mau",
        F.round(F.col("dau") / F.col("mau"), 4).alias("stickiness"),
    )
    return out


def duck_dau_mau_sql() -> str:
    """Oracle twin of :func:`dau_mau`."""
    return """
        WITH ud AS (
            SELECT DISTINCT user_id,
                   CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
            FROM events
        ), dau AS (
            SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY day
        ), days AS (
            SELECT DISTINCT day FROM ud
        ), mau AS (
            SELECT d.day, count(DISTINCT u.user_id)::BIGINT AS mau
            FROM days d JOIN ud u
              ON u.day <= d.day AND u.day > d.day - 30
            GROUP BY d.day
        )
        SELECT day, dau, mau, round(dau / mau, 4) AS stickiness
        FROM dau JOIN mau USING (day)
    """


def max_drawdown(orders: DataFrame) -> DataFrame:
    """Maximum drawdown of the daily-revenue curve — the risk statistic
    (largest peak-to-trough drop) read over any cumulative series: daily
    revenue in exact cents, running cumulative, running peak, drawdown
    fraction per day, and the single worst day flagged.

    Exactness: cents are exact bigints through the cumulative and peak;
    the drawdown fraction divides exact integers once, rounded(6).
    Scale shape: the corpus collapses to the DAY table in one partial
    agg; the cumulative/peak windows run over that bounded calendar
    relation (the ks_test bounded-domain contract), output is day-sized.
    """
    from pyspark.sql import Window

    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    t = daily.select(
        "day",
        F.sum("cents").over(cum).alias("cum_cents"),
    ).select(
        "day",
        "cum_cents",
        F.max("cum_cents").over(cum).alias("peak_cents"),
    )
    dd_frac = F.round(
        (F.col("peak_cents") - F.col("cum_cents"))
        / F.col("peak_cents").cast("double"),
        6,
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return t.select(
        F.col("day").cast("string").alias("day"),
        "cum_cents",
        "peak_cents",
        dd_frac.alias("drawdown"),
        (dd_frac == F.max(dd_frac).over(wall)).alias("is_max_drawdown"),
    )


def duck_max_drawdown_sql() -> str:
    """Oracle twin of :func:`max_drawdown`."""
    return """
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
            FROM orders GROUP BY 1
        ), cum AS (
            SELECT day,
                   sum(cents) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum_cents
            FROM daily
        ), t AS (
            SELECT day, cum_cents,
                   max(cum_cents) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS peak_cents
            FROM cum
        )
        SELECT day::VARCHAR AS day, cum_cents::BIGINT AS cum_cents,
               peak_cents::BIGINT AS peak_cents,
               round((peak_cents - cum_cents) / peak_cents::DOUBLE, 6)
                   AS drawdown,
               round((peak_cents - cum_cents) / peak_cents::DOUBLE, 6)
                   = max(round((peak_cents - cum_cents)
                               / peak_cents::DOUBLE, 6)) OVER ()
                   AS is_max_drawdown
        FROM t
    """


def burstiness(events: DataFrame) -> DataFrame:
    """Traffic burstiness per event type: the index of dispersion
    (variance/mean of daily counts — 1 under Poisson arrivals) and the
    Goh–Barabási burstiness B = (σ−μ)/(σ+μ) ∈ (−1, 1) — the two numbers
    that say whether a stream is steady (provision for the mean) or
    bursty (provision for the spikes).

    Exactness: exact (n, Σc, Σc²) over the (type, day) table; σ and the
    two ratios are one closed-form double chain each, rounded(4). A type
    active on a single day has no sample variance — both stats are NULL
    via ``nullif(n_days − 1, 0)`` on both engines, never an ANSI
    divide-by-zero (round-9 micro-fixture finding).
    Scale shape: one corpus partial agg to (type, day), one |types|-row
    rollup.
    """
    daily = events.groupBy(
        "event_type",
        F.expr(f"cast(floor(unix_micros(ts) / {_DAY_US}) as bigint)").alias(
            "day"
        ),
    ).agg(F.count(F.lit(1)).alias("c"))
    agg = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("scc"),
    )
    return agg.selectExpr(
        "event_type",
        "n_days",
        "sc as n_events",
        """round((cast(scc as double) - cast(sc as double) * sc / n_days)
                 / nullif(n_days - 1, 0)
                 / (cast(sc as double) / n_days), 4) as dispersion""",
        """round((sqrt((cast(scc as double) - cast(sc as double) * sc / n_days)
                      / nullif(n_days - 1, 0)) - cast(sc as double) / n_days)
                 / (sqrt((cast(scc as double) - cast(sc as double) * sc / n_days)
                         / nullif(n_days - 1, 0)) + cast(sc as double) / n_days),
                 4) as burstiness""",
    )


def duck_burstiness_sql() -> str:
    """Oracle twin of :func:`burstiness`."""
    return """
        WITH daily AS (
            SELECT event_type,
                   CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
                   count(*) AS c
            FROM events GROUP BY 1, 2
        ), agg AS (
            SELECT event_type, count(*)::BIGINT AS n_days,
                   sum(c)::BIGINT AS sc, sum(c * c)::BIGINT AS scc
            FROM daily GROUP BY event_type
        )
        SELECT event_type, n_days, sc AS n_events,
               round((scc::DOUBLE - sc::DOUBLE * sc / n_days)
                     / nullif(n_days - 1, 0)
                     / (sc::DOUBLE / n_days), 4) AS dispersion,
               round((sqrt((scc::DOUBLE - sc::DOUBLE * sc / n_days)
                           / nullif(n_days - 1, 0)) - sc::DOUBLE / n_days)
                     / (sqrt((scc::DOUBLE - sc::DOUBLE * sc / n_days)
                             / nullif(n_days - 1, 0)) + sc::DOUBLE / n_days),
                     4) AS burstiness
        FROM agg
    """


def ab_srm(events: DataFrame) -> DataFrame:
    """Sample-Ratio Mismatch guard for the A/B assignment — the first
    check every experimentation platform runs (a biased randomizer
    invalidates the whole experiment before any metric is read): the
    same deterministic 50/50 user hash as :func:`did_estimator`, the
    per-arm USER counts (assignment is per user, not per event), and the
    one-degree chi² against the expected even split, with the
    conventional alarm at chi² > 3.84 (p < 0.05).

    Exactness: user counts exact; chi² = (n₀−n₁)²/(n₀+n₁) — one division
    of exact integers, rounded(4). One distinct-user reduction, one-row
    output.
    """
    from ..functions import hashing as H

    h = H.spark_h32("concat('did:', cast(user_id as string))")
    users = events.select("user_id").distinct().selectExpr(
        f"cast(pmod({h}, 2) as int) as arm"
    )
    agg = users.groupBy().agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_control"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_treatment"),
    )
    chi2 = F.round(
        (
            (F.col("n_control") - F.col("n_treatment"))
            * (F.col("n_control") - F.col("n_treatment"))
        ).cast("double")
        / (F.col("n_control") + F.col("n_treatment")),
        4,
    )
    return agg.select(
        "n_control",
        "n_treatment",
        chi2.alias("chi2"),
        (chi2 > 3.84).alias("srm_alarm"),
    )


def duck_ab_srm_sql() -> str:
    """Oracle twin of :func:`ab_srm`."""
    from ..functions import hashing as H

    h = H.duck_h32("('did:' || user_id::VARCHAR)")
    return f"""
        WITH users AS (
            SELECT DISTINCT user_id FROM events
        ), arms AS (
            SELECT ({h} % 2) AS arm FROM users
        ), agg AS (
            SELECT sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS n_control,
                   sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS n_treatment
            FROM arms
        )
        SELECT n_control, n_treatment,
               round((n_control - n_treatment)
                     * (n_control - n_treatment)
                     / (n_control + n_treatment)::DOUBLE, 4) AS chi2,
               round((n_control - n_treatment)
                     * (n_control - n_treatment)
                     / (n_control + n_treatment)::DOUBLE, 4) > 3.84
                   AS srm_alarm
        FROM agg
    """
