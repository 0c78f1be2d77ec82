"""Batch sessionization — gap-based session windows over an event log.

The reference has only processing-time timers (SURVEY.md §2.3); session
windows are part of the streaming category our engine must cover. The
streaming form is ``session_window()`` with a watermark
(``streaming`` package); this is the batch-checkable twin used by the
t2 oracle: classic lag + cumulative-sum session assignment.

Scale notes: one shuffle on the session key (``user_id``), then two window
passes over the same partitioning — Spark reuses the exchange (both windows
share partitionBy/orderBy). Session state never materializes per-row Python;
it's all lag/sum Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_column: str,
    ts_column: str,
    tiebreaker: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign 1-based ``session_id`` per key with a ``gap_seconds`` gap."""
    order = [F.col(ts_column).asc(), F.col(tiebreaker).asc()]
    w = Window.partitionBy(key_column).orderBy(*order)
    gap_us = gap_seconds * 1_000_000
    prev = F.lag(F.unix_micros(F.col(ts_column))).over(w)
    is_new = F.when(
        prev.isNull() | (F.unix_micros(F.col(ts_column)) - prev > gap_us), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(
            Window.partitionBy(key_column)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    key_column: str,
    ts_column: str,
    tiebreaker: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates: event count and start/end epoch-ms bounds."""
    s = sessionize(df, key_column, ts_column, tiebreaker, gap_seconds)
    return s.groupBy(key_column, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.min(F.unix_micros(F.col(ts_column))) / F.lit(1000)).cast("long").alias("start_ms"),
        (F.max(F.unix_micros(F.col(ts_column))) / F.lit(1000)).cast("long").alias("end_ms"),
    )


def funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    ts_column: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Sequential-pattern funnel (the batch twin of Flink CEP's
    ``A followedBy B followedBy C``): per user, the earliest time each
    stage was reached STRICTLY AFTER the previous stage — users are
    counted into stage k only if they did stage k after stage k-1.

    Plan shape: one filtered partial-agg per stage, each joined on the
    user key; stage k's aggregation input is pre-filtered by stage k-1's
    time, so the frames shrink monotonically down the funnel. All
    ``stages`` aggs shuffle on the same key, so Catalyst reuses one
    exchange partitioning. Emits (user, t_<stage>_ms ... nullable,
    stages_completed)."""
    from ..schema import ts_ms

    ts = F.col(ts_column)
    cur = (
        events.filter(F.col("event_type") == stages[0])
        .groupBy(key)
        .agg(F.min(ts).alias("t0"))
    )
    out_cols = [F.col("t0")]
    for i, stage in enumerate(stages[1:], start=1):
        nxt = (
            events.filter(F.col("event_type") == stage)
            .join(cur.select(key, F.col(f"t{i-1}")), key)
            .filter(ts > F.col(f"t{i-1}"))
            .groupBy(key)
            .agg(F.min(ts).alias(f"t{i}"))
        )
        cur = cur.join(nxt, key, "left")
        out_cols.append(F.col(f"t{i}"))
    completed = sum(
        (c.isNotNull().cast("int") for c in out_cols), F.lit(0)
    )
    return cur.select(
        key,
        *[ts_ms(f"t{i}").alias(f"t_{s}_ms") for i, s in enumerate(stages)],
        completed.cast("int").alias("stages_completed"),
    )


def retention_cohorts(
    events: DataFrame, ts_column: str = "ts", key: str = "user_id"
) -> DataFrame:
    """Daily cohort retention: users grouped by first-activity day, counted
    on each subsequent active day as (cohort_day, day_offset, n_users) —
    the classic triangle retention matrix, exact integers throughout.

    Two partial-agg shuffles on the user key (first-day, then distinct
    active days) + an equi-join of the per-user cohort back onto the
    activity days — both sides are already hash-partitioned on the user
    key, and the cohort side is USER-DIMENSION-sized, so the join is left
    to the optimizer (AQE broadcasts it while it fits; a forced broadcast
    would OOM the driver at billions of users); counts shuffle only
    (cohort, offset) pairs."""
    day = F.date_trunc("day", F.col(ts_column))
    first = events.groupBy(key).agg(F.min(day).alias("cohort_day"))
    active = events.select(key, day.alias("active_day")).distinct()
    day_ms = lambda c: (F.unix_micros(F.col(c)) / F.lit(1000)).cast("long")  # noqa: E731
    return (
        active.join(first, key)
        .select(
            day_ms("cohort_day").alias("cohort_day_ms"),
            ((day_ms("active_day") - day_ms("cohort_day")) / F.lit(86400000))
            .cast("int")
            .alias("day_offset"),
        )
        .groupBy("cohort_day_ms", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def activity_streaks(events: DataFrame) -> DataFrame:
    """Per-user activity streaks (the gaps-and-islands pattern): distinct
    active days per user, the number of maximal consecutive-day runs, and
    the longest run.

    Implemented exchange-lean: ONE shuffle total. Instead of the classic
    ``day - row_number()`` island trick (distinct shuffle on (user, day) +
    a window shuffle on user), each user's distinct day set is collected
    and sorted in a single groupBy, and a linear ``aggregate`` fold over
    the sorted array counts runs and tracks the maximum — integer-exact,
    JVM-side, O(days per user) memory (days, not events, bounded at ~365/yr).
    """
    day = "unix_micros(ts) div 86400000000"
    per_user = events.selectExpr("user_id", f"{day} as day").groupBy("user_id").agg(
        F.expr("sort_array(collect_set(day))").alias("days")
    )
    fold = """aggregate(
        days,
        named_struct('prev', cast(-9223372036854775808 as bigint),
                     'cur', 0, 'mx', 0, 'n', 0),
        (acc, d) -> CASE WHEN d = acc.prev + 1
            THEN named_struct('prev', d, 'cur', acc.cur + 1,
                              'mx', greatest(acc.mx, acc.cur + 1), 'n', acc.n)
            ELSE named_struct('prev', d, 'cur', 1,
                              'mx', greatest(acc.mx, 1), 'n', acc.n + 1) END,
        acc -> named_struct('n_streaks', acc.n, 'max_streak', acc.mx))"""
    return per_user.selectExpr(
        "user_id",
        "size(days) as n_active_days",
        f"{fold}.n_streaks as n_streaks",
        f"{fold}.max_streak as max_streak_days",
    )


def event_paths(events: DataFrame, k: int = 25) -> DataFrame:
    """Behavioral path mining: the top-``k`` most common 3-step event-type
    sequences (trigram paths) across all user timelines, ordered by
    frequency. The Flink-CEP-adjacent "what do users do next" query as two
    leads + a count.

    Scale shape: one shuffle on user_id for the ordered leads (both leads
    share the sort), one partial-aggregable count by path, and the top-k
    is TakeOrderedAndProject — no global sort."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
    )
    return (
        tri.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("n").desc(), F.col("path").asc())
            ),
        )
    )


def cep_patterns(events: DataFrame) -> DataFrame:
    """Complex-event-processing pattern matching — the MATCH_RECOGNIZE /
    Flink-CEP role — as regex over each user's time-ordered event-type
    sequence.  Every event type maps to its (distinct) initial letter;
    the per-user sequence is built with one key shuffle (sorted struct
    collect, total order on (ts, event_id) so replays are deterministic)
    and the patterns evaluate JVM-side per user:

    * ``n_funnels``  — non-overlapping matches of view→clicks*→purchase
      (``vc*p``), the classic conversion pattern with an arbitrary-length
      middle;
    * ``n_err_after_buy`` — ``pe`` adjacency: an error immediately after
      a purchase (the alerting pattern);
    * ``longest_click_run`` — the longest ``c+`` run length.

    Scale: the sequence is one string per user (events per user bounded
    in any real funnel window); pattern evaluation is per-row codegen'd
    regex — no joins, no state machine materialization.  Both engines'
    regex engines agree on these patterns (greedy, leftmost,
    non-overlapping), which the oracle relies on.
    """
    initial = F.substring("event_type", 1, 1)
    seq = (
        events.select(
            "user_id",
            F.struct(F.col("ts"), F.col("event_id"), initial.alias("i")).alias("s"),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s["i"]
                ),
            ).alias("seq")
        )
    )
    runs = F.expr(
        "coalesce(array_max(transform(filter(split(seq, '[^c]+'),"
        " x -> x <> ''), x -> length(x))), 0)"
    )
    return seq.select(
        "user_id",
        F.length("seq").alias("seq_len"),
        F.regexp_count("seq", F.lit("vc*p")).alias("n_funnels"),
        F.regexp_count("seq", F.lit("pe")).alias("n_err_after_buy"),
        runs.cast("int").alias("longest_click_run"),
    )


def markov_transitions(events: DataFrame) -> DataFrame:
    """First-order event-type transition matrix over user timelines:
    P(next = b | current = a) — the Sankey/flow-diagram staple product
    analytics builds from every clickstream, complementing
    ``event_paths`` (which enumerates top SEQUENCES; this normalizes
    one-step dynamics).

    Exactness: transition counts are exact integers; each probability
    is one division of the pair count by its row's windowed source
    total, rounded once.

    Scale shape: ONE lead per user timeline (the same user-partitioned
    sort ``event_paths`` shares — partitioned by user, so parallel
    across users at any scale), then a partial-agg groupBy to the
    |types|² pair table; the per-source totals ride as a window over
    that tiny matrix, same plan branch.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("src"),
        )
        .select("src", F.lead("src").over(w).alias("dst"))
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("src")
    return pairs.select(
        "src",
        "dst",
        "n",
        F.sum("n").over(wt).cast("bigint").alias("src_total"),
        F.round(F.col("n") / F.sum("n").over(wt), 6).alias("p"),
    )


def attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_ms: int = 86_400_000,
) -> DataFrame:
    """Multi-touch conversion attribution over user timelines: every
    ``conversion_type`` event distributes credit to the same user's
    preceding ``touch_types`` events inside the lookback window —
    last-touch (all credit to the latest touch) and linear (1/n to each
    of the n touches) side by side, rolled up per touch event type. The
    marketing-attribution kernel every clickstream warehouse runs.

    One row per touch type: conversions it participated in, touches
    credited, last-touch conversion count, linear credit (per-touch
    credit 1e-6-quantized to integer micro-credits, summed exactly).

    Scale shape: touches meet conversions through ONE user-keyed
    equi-join (both sides pre-filtered by event type before the
    shuffle); the in-window predicate prunes pairs inside the join
    stage; the per-conversion window (rank latest touch, count touches)
    is PARTITIONED by the conversion id, and the final rollup is a
    metadata-sized groupBy on touch type. Nothing corpus-sized crosses
    an unpartitioned boundary; a user's pair fan-out is bounded by their
    in-window touch count, the same bound the sessionize operators carry.
    """
    conv = events.filter(F.col("event_type") == conversion_type).select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("cts"),
    )
    touch = events.filter(F.col("event_type").isin(*touch_types)).select(
        F.col("user_id").alias("tu"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("tts"),
    )
    pairs = conv.join(
        touch,
        (F.col("cu") == F.col("tu"))
        & (F.col("tts") < F.col("cts"))
        & (
            F.col("tts")
            >= F.col("cts") - F.expr(f"INTERVAL {lookback_ms} MILLISECONDS")
        ),
    )
    wc = Window.partitionBy("conv_id")
    ranked = pairs.select(
        "conv_id",
        "touch_type",
        F.row_number()
        .over(
            Window.partitionBy("conv_id").orderBy(
                F.col("tts").desc(), F.col("touch_id").asc()
            )
        )
        .alias("recency_rank"),
        F.count(F.lit(1)).over(wc).alias("n_touches"),
    )
    return (
        ranked.groupBy("touch_type")
        .agg(
            F.countDistinct("conv_id").cast("bigint").alias("n_conversions"),
            F.count(F.lit(1)).cast("bigint").alias("n_touches_credited"),
            F.sum((F.col("recency_rank") == 1).cast("int"))
            .cast("bigint")
            .alias("last_touch_conversions"),
            # per-touch credit floor(1e6/n) in integer micro-credits:
            # the division is one deterministic IEEE op, the SUM is exact
            # bigint arithmetic — no cross-partition FP accumulation
            # order to diverge from the oracle
            F.round(
                F.sum(F.floor(F.lit(1_000_000.0) / F.col("n_touches")))
                / F.lit(1_000_000.0),
                4,
            ).alias("linear_credit"),
        )
        .orderBy("touch_type")
    )


def conversion_lag(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_ms: int = 86_400_000,
) -> DataFrame:
    """Time-to-convert percentiles per touch type: the lag distribution
    between each conversion and its in-lookback touches, reported as
    exact ORDER-STATISTIC P50/P90 on the minute-quantized lag histogram
    — the latency companion to :func:`attribution` (same pair join,
    answering "how long after the click" instead of "which click").

    Exactness: lags are integer minutes; percentiles are the smallest
    lag whose cumulative count reaches ceil(q·N) — no interpolation, no
    rounding boundary. The cumulative window is PARTITIONED by touch
    type over the minute-domain histogram (≤ lookback-minutes rows per
    type at any corpus scale).
    """
    conv = events.filter(F.col("event_type") == conversion_type).select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    touch = events.filter(F.col("event_type").isin(*touch_types)).select(
        F.col("user_id").alias("tu"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("tts"),
    )
    pairs = conv.join(
        touch,
        (F.col("cu") == F.col("tu"))
        & (F.col("tts") < F.col("cts"))
        & (
            F.col("tts")
            >= F.col("cts") - F.expr(f"INTERVAL {lookback_ms} MILLISECONDS")
        ),
    ).select(
        "touch_type",
        F.floor(
            (F.unix_micros(F.col("cts")) - F.unix_micros(F.col("tts")))
            / F.lit(60_000_000)
        )
        .cast("bigint")
        .alias("lag_min"),
    )
    hist = pairs.groupBy("touch_type", "lag_min").agg(
        F.count(F.lit(1)).alias("c")
    )
    wcum = (
        Window.partitionBy("touch_type")
        .orderBy("lag_min")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("touch_type")
    cum = hist.select(
        "touch_type",
        "lag_min",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
        F.max("lag_min").over(wall).alias("max_lag"),
    )
    p50 = F.col("cum") >= F.ceil(F.col("n") * 0.5)
    p90 = F.col("cum") >= F.ceil(F.col("n") * 0.9)
    return (
        cum.groupBy("touch_type")
        .agg(
            F.max("n").cast("bigint").alias("n_pairs"),
            F.min(F.when(p50, F.col("lag_min"))).alias("p50_lag_min"),
            F.min(F.when(p90, F.col("lag_min"))).alias("p90_lag_min"),
            F.max("max_lag").alias("max_lag_min"),
        )
        .orderBy("touch_type")
    )


def entropy_rate(events: DataFrame) -> DataFrame:
    """Behavioral predictability: the plug-in ENTROPY RATE of the
    first-order event-type chain — per source state the conditional
    entropy H(next | cur = s) = Σ_j (n_sj/n_s)·ln(n_s/n_sj) in nats, plus
    an ``__overall__`` row with the transition-frequency-weighted rate
    −Σ_ij (n_ij/N)·ln(n_ij/n_i) — the number that says how predictable
    the clickstream is (0 = deterministic next-event, ln(k) = uniform).

    Exactness: every ln takes an exact integer count; products pair an
    integer with one ln; the sums run over the |types|²-row matrix
    (metadata-sized), so cross-engine float drift is bounded far below
    the final round(4).

    Scale shape: reuses ``markov_transitions``' corpus pass (one
    user-partitioned lead + one partial agg to the tiny pair matrix);
    everything after is arithmetic on |types|² rows in the same plan.
    """
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("src"),
        )
        .select(
            "src",
            F.lead("src")
            .over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").asc(), F.col("event_id").asc()
                )
            )
            .alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("src")
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    terms = pairs.select(
        "src",
        "n",
        F.sum("n").over(wt).alias("n_src"),
        F.sum("n").over(wall).alias("n_all"),
    ).select(
        "src",
        "n",
        "n_src",
        "n_all",
        (
            F.col("n")
            * (F.log(F.col("n_src").cast("double")) - F.log(F.col("n").cast("double")))
        ).alias("t"),
    )
    per_src = terms.groupBy("src").agg(
        F.max("n_src").cast("bigint").alias("n_transitions"),
        F.round(F.sum("t") / F.max("n_src"), 4).alias("h_nats"),
    )
    overall = terms.groupBy().agg(
        F.max("n_all").cast("bigint").alias("n_transitions"),
        F.round(F.sum("t") / F.max("n_all"), 4).alias("h_nats"),
    ).select(F.lit("__overall__").alias("src"), "n_transitions", "h_nats")
    return per_src.unionByName(overall)


def duck_entropy_rate_sql() -> str:
    """Oracle twin of :func:`entropy_rate`."""
    return """
        WITH seq AS (
            SELECT event_type AS src,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS dst
            FROM events
        ), pairs AS (
            SELECT src, dst, count(*) AS n FROM seq
            WHERE dst IS NOT NULL GROUP BY src, dst
        ), terms AS (
            SELECT src, n,
                   sum(n) OVER (PARTITION BY src) AS n_src,
                   sum(n) OVER () AS n_all,
                   n * (ln((sum(n) OVER (PARTITION BY src))::DOUBLE)
                        - ln(n::DOUBLE)) AS t
            FROM pairs
        ), per_src AS (
            SELECT src, max(n_src)::BIGINT AS n_transitions,
                   round(sum(t) / max(n_src), 4) AS h_nats
            FROM terms GROUP BY src
        ), overall AS (
            SELECT '__overall__' AS src, max(n_all)::BIGINT AS n_transitions,
                   round(sum(t) / max(n_all), 4) AS h_nats
            FROM terms
        )
        SELECT * FROM per_src UNION ALL SELECT * FROM overall
    """


def markov_stationary(events: DataFrame, rounds: int = 8) -> DataFrame:
    """Stationary distribution of the first-order event-type chain —
    where user behavior settles in steady state (the long-run share of
    each event type, vs the empirical share that includes transient
    session starts): ``rounds`` unrolled power-iteration steps of
    π ← πP from the uniform start, over the |types|² transition matrix.

    Exactness: P's entries are exact count ratios; each power step sums
    |types| double products per entry — identical arithmetic shape
    cross-engine, far below the final round(6); fixed rounds keep the
    computation replayable by the unrolled-CTE oracle.

    Scale shape: ONE corpus pass (the markov_transitions lead + pair
    agg) collects the |types|²-row EXACT COUNT matrix to the driver —
    metadata-sized at any corpus scale (event-type vocabulary squared,
    the same altitude bound as k-means' k×dim centroids) — and the
    power iteration runs as driver math: 8 rounds over ≤|types|² doubles
    is the wrong size for cluster scheduling (each distributed step costs
    a join+agg job to move ~25 numbers).
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    counts = (
        events.select(
            "user_id", "ts", "event_id", F.col("event_type").alias("src")
        )
        .select("src", F.lead("src").over(w).alias("dst"))
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    n_out: dict[str, int] = {}
    for r in counts:
        n_out[r.src] = n_out.get(r.src, 0) + int(r.n)
    p = {(r.src, r.dst): int(r.n) / n_out[r.src] for r in counts}
    states = sorted(n_out)
    pi = {s: 1.0 / len(states) for s in states}
    for _ in range(rounds):
        nxt: dict[str, float] = {}
        # accumulate in sorted-src order: deterministic float sums. A src
        # state with NO incoming edge drops out of pi after round 1 (the
        # oracle's pi_r CTE joins on pi_{r-1}.state = p.src, so such a
        # state contributes nothing and is absent thereafter) — skip it
        # here too instead of KeyError-ing on pi[s].
        for s in states:
            if s not in pi:
                continue
            for d in states:
                if (s, d) in p:
                    nxt[d] = nxt.get(d, 0.0) + pi[s] * p[(s, d)]
        pi = nxt
    # INNER-join semantics, matching the oracle's final `pi8 JOIN emp`:
    # emit only src states that still carry stationary mass — a state that
    # only ever starts sessions (no incoming transition) is dropped, not
    # reported as 0.0. The empirical denominator is the oracle's
    # `sum(n_src) OVER ()` evaluated AFTER that join, i.e. transitions out
    # of the SURVIVING states only — both columns then sum to 1 over the
    # emitted rows.
    kept = [s for s in states if s in pi]
    total = sum(n_out[s] for s in kept)
    rows = [(s, round(pi[s], 6), round(n_out[s] / total, 6)) for s in kept]
    return events.sparkSession.createDataFrame(
        rows, "state string, stationary_share double, empirical_share double"
    )


def duck_markov_stationary_sql(rounds: int = 8) -> str:
    """Oracle twin of :func:`markov_stationary` — the iteration unrolled
    as CTEs."""
    ctes = [
        """
        WITH seq AS (
            SELECT event_type AS src,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS dst
            FROM events
        ), pairs AS (
            SELECT src, dst, count(*) AS n FROM seq
            WHERE dst IS NOT NULL GROUP BY src, dst
        ), p AS (
            SELECT src, dst,
                   n / sum(n) OVER (PARTITION BY src) AS p
            FROM pairs
        ), states AS (
            SELECT DISTINCT src AS state FROM p
        ), k AS (
            SELECT count(*) AS k FROM states
        ), pi0 AS (
            SELECT state, 1.0 / k AS pi FROM states CROSS JOIN k
        )"""
    ]
    prev = "pi0"
    for r in range(1, rounds + 1):
        ctes.append(
            f""", pi{r} AS (
            SELECT p.dst AS state, sum({prev}.pi * p.p) AS pi
            FROM p JOIN {prev} ON {prev}.state = p.src
            GROUP BY p.dst
        )"""
        )
        prev = f"pi{r}"
    ctes.append(
        f""", emp AS (
            SELECT src AS state, sum(n) AS n_src FROM pairs GROUP BY src
        )
        SELECT state, round({prev}.pi, 6) AS stationary_share,
               round(n_src / sum(n_src) OVER (), 6) AS empirical_share
        FROM {prev} JOIN emp USING (state)"""
    )
    return "".join(ctes)
