"""Declarative data-quality expectations — the dbt-test / Deequ-style
constraint battery a production table contract runs after every load.

Each check emits one row: (check_name, n_violations, passed).  The battery
covers the constraint classes a warehouse contract needs:

* **uniqueness** — key appears at most once (duplicate-key count);
* **not-null** — required column has no nulls;
* **referential integrity** — every foreign key resolves (anti join);
* **accepted values** — domain column stays inside its declared set;
* **range** — numeric sanity bound.

Scale shape: the single-table checks are partial-aggregable conditional
counts (uniqueness is one groupBy on the key counting cnt>1 groups); the
referential check is a LEFT ANTI against the broadcast dimension key set.
Nothing is row-materialized — every check reduces to counters before it
leaves its stage, so the battery is a handful of scans + one shuffle
(the key groupBy) regardless of table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check(name: str, violations) -> DataFrame:
    # coalesce pins empty-input semantics: sum() over zero rows is NULL in
    # Spark, and a NULL violation count would make `passed` NULL instead of
    # true — exactly the degenerate input a DQ battery exists to handle.
    n = F.coalesce(F.col("n"), F.lit(0)).cast("bigint")
    return violations.select(
        F.lit(name).alias("check_name"),
        n.alias("n_violations"),
        (n == 0).alias("passed"),
    )


def dq_checks(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """The expectations battery over the ingested ``orders`` contract."""
    dup_keys = _check(
        "orders.o_orderkey unique",
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("n")),
    )
    null_cust = _check(
        "orders.o_custkey not_null",
        orders.agg(
            F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("n")
        ),
    )
    ref = _check(
        "orders.o_custkey references customer.c_custkey",
        # NULL keys are excluded: they're the not_null check's finding, and
        # SQL NOT IN semantics (the oracle) never count a NULL as an RI
        # violation — without the filter the anti join would.
        orders.filter(F.col("o_custkey").isNotNull())
        .join(
            F.broadcast(customer.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n")),
    )
    accepted = _check(
        "orders.o_orderstatus accepted_values",
        orders.agg(
            F.sum(
                F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
            ).alias("n")
        ),
    )
    rng = _check(
        "orders.o_totalprice positive",
        orders.agg(
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("n")
        ),
    )
    out = dup_keys
    for c in (null_cust, ref, accepted, rng):
        out = out.unionByName(c)
    return out


DUCK_DQ_SQL = """
    SELECT 'orders.o_orderkey unique' AS check_name,
           CAST(coalesce(sum(c), 0) AS BIGINT) AS n_violations,
           coalesce(sum(c), 0) = 0 AS passed
    FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey
          HAVING count(*) > 1)
    UNION ALL
    SELECT 'orders.o_custkey not_null',
           CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT),
           count(*) FILTER (o_custkey IS NULL) = 0
    FROM orders
    UNION ALL
    SELECT 'orders.o_custkey references customer.c_custkey',
           CAST(count(*) AS BIGINT), count(*) = 0
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'orders.o_orderstatus accepted_values',
           CAST(count(*) FILTER (o_orderstatus NOT IN ('O','F','P'))
                AS BIGINT),
           count(*) FILTER (o_orderstatus NOT IN ('O','F','P')) = 0
    FROM orders
    UNION ALL
    SELECT 'orders.o_totalprice positive',
           CAST(count(*) FILTER (o_totalprice <= 0) AS BIGINT),
           count(*) FILTER (o_totalprice <= 0) = 0
    FROM orders
"""


def k_anonymity_audit(events: DataFrame, k: int = 5) -> DataFrame:
    """k-anonymity audit of a release projection — the data-governance
    gate a pipeline runs before publishing event-level data: any
    quasi-identifier combination shared by fewer than ``k`` rows
    re-identifies its subjects, so those rows must be suppressed or
    generalized. Quasi-identifiers here are the classic generalized
    triple (event_type, event day, value bucketed to 5s) — categorical +
    temporal + numeric, each coarsened exactly the way a release would
    coarsen them.

    Emits one row per event_type: rows, distinct QI groups, groups below
    k, rows at risk, and the suppression percentage (1e-6-quantized) —
    the number the governance decision is made on.

    Scale shape: one partial-aggregable groupBy on the QI triple (the
    only corpus-sized shuffle), then a per-type rollup of group counters
    (|types| × |days| × |buckets| rows — metadata-sized at any corpus
    scale). Nothing row-level survives the first aggregation.
    """
    day_ms = (F.unix_micros(F.date_trunc("day", F.col("ts"))) / F.lit(1000)).cast(
        "long"
    )
    bucket = F.floor(F.col("value") / F.lit(5.0)).cast("long")
    groups = (
        events.select(
            "event_type", day_ms.alias("day_ms"), bucket.alias("vb")
        )
        .groupBy("event_type", "day_ms", "vb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    small = F.col("c") < k
    return (
        groups.groupBy("event_type")
        .agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(small.cast("int")).cast("bigint").alias("n_small_groups"),
            F.sum(F.when(small, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("rows_at_risk"),
        )
        .select(
            "event_type",
            "n_rows",
            "n_groups",
            "n_small_groups",
            "rows_at_risk",
            F.round(
                F.col("rows_at_risk") / F.col("n_rows"), 6
            ).alias("suppression_rate"),
        )
    )


#: ordered (rule_name, spark_predicate_sql, duck_predicate_sql) stages of
#: the document-quality cascade — Gopher-rule-shaped bounds re-expressed
#: over the fixture corpus. Spark/Duck twins differ only where the engines'
#: regex dialects do (DuckDB needs the explicit 'g' flag).
FUNNEL_STAGES: tuple[tuple[str, str, str], ...] = (
    ("chars_in_50_20000", "n_chars BETWEEN 50 AND 20000", None),
    (
        "words_ge_10",
        "size(filter(split(text, ' '), x -> x != '')) >= 10",
        "len(list_filter(string_split(text, ' '), x -> x != '')) >= 10",
    ),
    # the two ratio rules nullif their denominators: a zero-word or
    # zero-char doc already failed an earlier stage, but the cumulative
    # conjunction still EVALUATES every predicate on every row, and ANSI
    # turns the 0-denominator into a hard error (round-9 degenerate-text
    # finding); false AND NULL = false, so the counts are unchanged
    (
        "mean_word_len_in_2_12",
        "length(replace(text, ' ', ''))"
        " / nullif(size(filter(split(text, ' '), x -> x != '')), 0)"
        " BETWEEN 2 AND 12",
        "length(replace(text, ' ', ''))"
        " / nullif(len(list_filter(string_split(text, ' '), x -> x != '')),"
        " 0) BETWEEN 2 AND 12",
    ),
    (
        "alpha_ratio_ge_06",
        "length(regexp_replace(text, '[^A-Za-z]', '')) / nullif(n_chars, 0)"
        " >= 0.6",
        "length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
        " / nullif(n_chars, 0) >= 0.6",
    ),
    (
        "has_stopword",
        "lower(text) LIKE '% the %' OR lower(text) LIKE '% and %'"
        " OR lower(text) LIKE '% of %'",
        None,
    ),
)


def filter_funnel(documents: DataFrame) -> DataFrame:
    """Quality-filter funnel over the document corpus — the Gopher-style
    rule cascade (char bounds → word count → mean word length → alpha
    ratio → stopword presence) with per-stage survival accounting: stage
    i's entrants are stage i−1's survivors, so the output is the curve a
    curation run publishes ("rule X removed Y% of what reached it").

    One row per stage: (stage, rule, n_enter, n_pass, n_fail,
    pass_rate). ``pass_rate`` is 1e-4-quantized; a stage with zero
    entrants reports rate 0 rather than NULL.

    Scale shape: ONE full scan computes every rule predicate and the
    cumulative-conjunction counters as a partial-aggregable conditional
    sum — a single map-side-combined aggregate to ONE driver row — then
    the per-stage unpivot (``stack``) runs on that scalar row. No
    shuffle carries row-level data; corpus size only widens the scan.
    """
    preds = [F.expr(spark_sql) for _, spark_sql, _ in FUNNEL_STAGES]
    cum = []
    acc = None
    for p in preds:
        acc = p if acc is None else (acc & p)
        cum.append(acc)
    agg = documents.agg(
        F.count(F.lit(1)).alias("n0"),
        *[
            F.sum(c.cast("int")).cast("bigint").alias(f"p{i + 1}")
            for i, c in enumerate(cum)
        ],
    )
    stage_rows = ", ".join(
        f"{i + 1}, '{name}', {'n0' if i == 0 else f'p{i}'}, p{i + 1}"
        for i, (name, _, _) in enumerate(FUNNEL_STAGES)
    )
    n = len(FUNNEL_STAGES)
    staged = agg.select(
        F.expr(
            f"stack({n}, {stage_rows}) AS (stage, rule, n_enter, n_pass)"
        )
    )
    return staged.select(
        F.col("stage").cast("int").alias("stage"),
        "rule",
        F.col("n_enter").cast("bigint").alias("n_enter"),
        F.col("n_pass").cast("bigint").alias("n_pass"),
        (F.col("n_enter") - F.col("n_pass")).cast("bigint").alias("n_fail"),
        F.when(F.col("n_enter") == 0, F.lit(0.0))
        .otherwise(F.round(F.col("n_pass") / F.col("n_enter"), 4))
        .alias("pass_rate"),
    )


def duck_filter_funnel_sql() -> str:
    """DuckDB twin of ``filter_funnel`` — same cumulative-conjunction
    counters, same stage unpivot."""
    conds = []
    acc_parts: list[str] = []
    for name, spark_sql, duck_sql in FUNNEL_STAGES:
        acc_parts.append(f"({duck_sql or spark_sql})")
        conds.append(" AND ".join(acc_parts))
    sums = ",\n               ".join(
        f"sum(CASE WHEN {c} THEN 1 ELSE 0 END)::BIGINT AS p{i + 1}"
        for i, c in enumerate(conds)
    )
    stages = "\n            UNION ALL ".join(
        f"SELECT {i + 1} AS stage, '{name}' AS rule, "
        f"{'n0' if i == 0 else f'p{i}'} AS n_enter, p{i + 1} AS n_pass "
        "FROM agg"
        for i, (name, _, _) in enumerate(FUNNEL_STAGES)
    )
    return f"""
        WITH agg AS (
            SELECT count(*)::BIGINT AS n0,
               {sums}
            FROM documents
        ), staged AS (
            {stages}
        )
        SELECT stage::INT AS stage, rule, n_enter, n_pass,
               (n_enter - n_pass)::BIGINT AS n_fail,
               CASE WHEN n_enter = 0 THEN 0.0
                    ELSE round(n_pass / n_enter, 4) END AS pass_rate
        FROM staged
    """


#: the fixture star schema's FK edges: (child, fk_col, parent, pk_col)
FK_EDGES: tuple[tuple[str, str, str, str], ...] = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def referential_audit(tables: dict[str, DataFrame]) -> DataFrame:
    """Join-graph referential-integrity profile of the star schema — per
    FK edge: child row volume, NULL-key rows, orphan rows (non-NULL keys
    that resolve to no parent), parent key count, parent keys actually
    referenced, and the referencing coverage ratio. The audit a pipeline
    runs before trusting its join graph: orphans mean silent row loss in
    every inner join downstream; low coverage means a dimension is
    mostly dead weight.

    Scale shape, per edge: the child collapses to (key, row_count) in ONE
    key-only partial-agg shuffle; the parent to its distinct key set; the
    FULL OUTER join then runs on key-dimension-sized relations (never
    child-row-sized), and everything reduces to counters before leaving
    the stage. No broadcast is forced — at 100 TB the orders/part parents
    are not broadcastable and AQE picks the strategy per edge.
    """
    out = None
    for child, fk, parent, pk in FK_EDGES:
        ck = (
            tables[child]
            .groupBy(F.col(fk).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        pks = tables[parent].select(F.col(pk).alias("pk")).distinct()
        j = ck.join(pks, F.col("k") == F.col("pk"), "full_outer")
        child_row = F.col("cnt").isNotNull()
        row = j.agg(
            F.coalesce(F.sum(F.when(child_row, F.col("cnt"))), F.lit(0))
            .cast("bigint")
            .alias("n_child_rows"),
            F.coalesce(
                F.sum(F.when(child_row & F.col("k").isNull(), F.col("cnt"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_null_rows"),
            F.coalesce(
                F.sum(
                    F.when(
                        child_row
                        & F.col("k").isNotNull()
                        & F.col("pk").isNull(),
                        F.col("cnt"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_orphan_rows"),
            F.count("pk").cast("bigint").alias("n_parent_keys"),
            F.sum((child_row & F.col("pk").isNotNull()).cast("int"))
            .cast("bigint")
            .alias("n_referenced_keys"),
        ).select(
            F.lit(f"{child}.{fk}->{parent}.{pk}").alias("fk"),
            "*",
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "fk",
        "n_child_rows",
        "n_null_rows",
        "n_orphan_rows",
        "n_parent_keys",
        "n_referenced_keys",
        F.when(F.col("n_parent_keys") == 0, F.lit(0.0))
        .otherwise(
            F.round(F.col("n_referenced_keys") / F.col("n_parent_keys"), 4)
        )
        .alias("coverage"),
    )


def duck_referential_audit_sql() -> str:
    """DuckDB twin of ``referential_audit`` — one CTE pair per FK edge,
    same FULL OUTER reduction, UNION ALL over the edges."""
    blocks = []
    for child, fk, parent, pk in FK_EDGES:
        blocks.append(f"""
        SELECT '{child}.{fk}->{parent}.{pk}' AS fk,
               coalesce(sum(cnt) FILTER (cnt IS NOT NULL), 0)::BIGINT
                   AS n_child_rows,
               coalesce(sum(cnt) FILTER (cnt IS NOT NULL AND k IS NULL),
                        0)::BIGINT AS n_null_rows,
               coalesce(sum(cnt) FILTER (cnt IS NOT NULL AND k IS NOT NULL
                        AND pk IS NULL), 0)::BIGINT AS n_orphan_rows,
               count(pk)::BIGINT AS n_parent_keys,
               sum(CASE WHEN cnt IS NOT NULL AND pk IS NOT NULL
                        THEN 1 ELSE 0 END)::BIGINT AS n_referenced_keys,
               CASE WHEN count(pk) = 0 THEN 0.0
                    ELSE round(sum(CASE WHEN cnt IS NOT NULL
                                        AND pk IS NOT NULL
                                        THEN 1 ELSE 0 END)
                               / count(pk), 4) END AS coverage
        FROM (
            SELECT * FROM
                (SELECT {fk} AS k, count(*) AS cnt FROM {child} GROUP BY 1)
                FULL OUTER JOIN
                (SELECT DISTINCT {pk} AS pk FROM {parent}) ON k = pk
        )""")
    return "\nUNION ALL".join(blocks)


def ks_test(
    documents: DataFrame, source_a: str = "src0", source_b: str = "src1"
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test between two sources' document-
    length distributions — the distribution-drift gate that catches what
    a mean/variance check can't (shape changes at equal moments). One
    row: sample sizes, the length at which the CDF gap peaks, the exact
    D statistic, and the asymptotic p-value approximation.

    Exactness: the CDFs stay exact rationals — the gap numerator
    |cum_a·n_b − cum_b·n_a| is a bigint (exact while n_a·n_b < 2⁶³;
    beyond ~3·10⁹ rows a side, pre-scale the counts), its argmax
    tie-breaks on the smallest value, and D divides once at the end. Only the p-value
    approximation (one exp) is floating point, and it is a chain of
    single IEEE ops on identical operands cross-engine.

    Scale shape: each side collapses to value-level counts in ONE
    partial-agg shuffle — the relation under the cumulative window is
    bounded by the VALUE DOMAIN (distinct document lengths), not the
    corpus, the same histogram-bounded-window contract as
    ``sketch.histogram_quantiles``; the peak is TakeOrderedAndProject.
    """
    counts = (
        documents.filter(F.col("source").isin(source_a, source_b))
        .groupBy("n_chars")
        .agg(
            F.sum((F.col("source") == source_a).cast("int")).alias("ca"),
            F.sum((F.col("source") == source_b).cast("int")).alias("cb"),
        )
    )
    w = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        "n_chars",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(wall).alias("n_a"),
        F.sum("cb").over(wall).alias("n_b"),
    ).select(
        "n_chars",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("gap_num"),
    )
    peak = cum.orderBy(F.col("gap_num").desc(), F.col("n_chars").asc()).limit(1)
    d = F.col("gap_num") / (F.col("n_a") * F.col("n_b"))
    ne = (F.col("n_a").cast("double") * F.col("n_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    lam = (F.sqrt(ne) + F.lit(0.12) + F.lit(0.11) / F.sqrt(ne)) * d
    return peak.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("n_chars").alias("ks_at_value"),
        F.round(d, 6).alias("ks_stat"),
        F.round(
            F.least(F.lit(1.0), F.lit(2.0) * F.exp(F.lit(-2.0) * lam * lam)),
            6,
        ).alias("p_approx"),
    )


def duck_ks_test_sql(source_a: str = "src0", source_b: str = "src1") -> str:
    """DuckDB twin of ``ks_test``."""
    return f"""
        WITH counts AS (
            SELECT n_chars,
                   sum(CASE WHEN source = '{source_a}' THEN 1 ELSE 0 END)
                       AS ca,
                   sum(CASE WHEN source = '{source_b}' THEN 1 ELSE 0 END)
                       AS cb
            FROM documents
            WHERE source IN ('{source_a}', '{source_b}')
            GROUP BY n_chars
        ), cum AS (
            SELECT n_chars,
                   sum(ca) OVER (ORDER BY n_chars) AS cum_a,
                   sum(cb) OVER (ORDER BY n_chars) AS cum_b,
                   sum(ca) OVER () AS n_a, sum(cb) OVER () AS n_b
            FROM counts
        ), gap AS (
            SELECT n_chars, n_a, n_b,
                   abs(cum_a * n_b - cum_b * n_a) AS gap_num
            FROM cum
        ), peak AS (
            SELECT * FROM gap ORDER BY gap_num DESC, n_chars LIMIT 1
        )
        SELECT n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
               n_chars AS ks_at_value,
               round(gap_num / (n_a * n_b), 6) AS ks_stat,
               round(least(1.0, 2.0 * exp(-2.0
                   * ((sqrt(n_a::DOUBLE * n_b / (n_a + n_b)) + 0.12
                       + 0.11 / sqrt(n_a::DOUBLE * n_b / (n_a + n_b)))
                      * (gap_num / (n_a * n_b)))
                   * ((sqrt(n_a::DOUBLE * n_b / (n_a + n_b)) + 0.12
                       + 0.11 / sqrt(n_a::DOUBLE * n_b / (n_a + n_b)))
                      * (gap_num / (n_a * n_b))))), 6) AS p_approx
        FROM peak
    """


def dp_mechanism_audit(events: DataFrame, epsilon: float = 1.0) -> DataFrame:
    """**NOT actually private — audit of the Laplace mechanism's shape
    only; never wire this into a real release path.** The noise is drawn
    deterministically from md5(event_type), i.e. it is a public function
    of the key, the 'release' is exactly invertible, and the effective
    ε-DP guarantee is ZERO (the output even carries ``n_true`` next to
    ``n_released`` so the audit can diff them).

    What it IS: a pipeline audit of the Laplace (sensitivity 1 / ε)
    count-release mechanism — inverse-CDF draw, clamp, and integer
    rounding — with the uniform replaced by a hash so the whole
    computation is reproducible and exactly oracle-checkable. In
    production the uniform comes from a CSPRNG and ``n_true``/``noise``
    are never emitted; the mechanism, clamp, and rounding are what this
    operator pins down. Completes the governance battery next to
    ``k_anonymity_audit``: suppression tells you what you may not
    release raw; this audits HOW a release would be computed.

    One row per type: true count, the noise drawn, and the released
    integer (noisy count, floor(x+0.5), clamped at 0). Scale shape: one
    partial-agg groupBy; the noise is a per-group scalar expression.
    """
    from ..functions import hashing as H

    u = F.expr(H.spark_h32("concat('dp:', event_type)")) / F.lit(
        float(1 << 32)
    )
    c = u - F.lit(0.5)
    noise = (
        -F.lit(1.0 / epsilon)
        * F.signum(c)
        * F.log(F.lit(1.0) - 2 * F.abs(c))
    )
    per = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_true")
    )
    return per.select(
        "event_type",
        F.col("n_true").cast("bigint").alias("n_true"),
        F.round(noise, 4).alias("noise"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.floor(F.col("n_true") + noise + F.lit(0.5)).cast("bigint"),
        ).alias("n_released"),
    )


def duck_dp_counts_sql(epsilon: float = 1.0) -> str:
    """DuckDB twin of ``dp_mechanism_audit`` (same hash-seeded inverse
    CDF — same NOT-actually-private caveat)."""
    from ..functions import hashing as H

    seed = "'dp:' || event_type"
    u = f"({H.duck_h32(seed)} / {float(1 << 32)})"
    c = f"({u} - 0.5)"
    noise = f"(-{1.0 / epsilon} * sign({c}) * ln(1.0 - 2 * abs({c})))"
    return f"""
        WITH per AS (
            SELECT event_type, count(*) AS n_true FROM events GROUP BY 1
        )
        SELECT event_type, n_true::BIGINT AS n_true,
               round({noise}, 4) AS noise,
               greatest(0, CAST(floor(n_true + {noise} + 0.5) AS BIGINT))
                   AS n_released
        FROM per
    """


def mann_whitney(
    documents: DataFrame, source_a: str = "src0", source_b: str = "src1"
) -> DataFrame:
    """Two-sample Mann–Whitney U (Wilcoxon rank-sum) between two sources'
    document-length distributions — the nonparametric location test that
    pairs with :func:`ks_test`'s shape test in a data-quality gate (KS
    asks "same distribution?", MWU asks "is one stochastically larger?").

    Exactness: tie-corrected rank arithmetic stays in doubled integers —
    avg rank ×2 of a tie group = 2·(count before) + (group size) + 1, so
    the rank sum, U, and the tie term Σ(t³−t) are exact bigints; the
    normal approximation (one sqrt, one division) runs once on identical
    operands cross-engine, rounded to 4.

    Scale shape: identical to ks_test — the corpus collapses to
    value-level counts in ONE partial-agg shuffle; the cumulative window
    ranges over the DISTINCT VALUE DOMAIN (document lengths), never the
    corpus; the final statistics are a one-row aggregate.
    """
    counts = (
        documents.filter(F.col("source").isin(source_a, source_b))
        .groupBy("n_chars")
        .agg(
            F.sum((F.col("source") == source_a).cast("int")).alias("ca"),
            F.sum((F.col("source") == source_b).cast("int")).alias("cb"),
        )
    )
    before = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = F.col("ca") + F.col("cb")
    ranked = counts.select(
        "ca",
        "cb",
        (
            F.col("ca").cast("bigint")
            * (
                2 * F.coalesce(F.sum(c).over(before), F.lit(0))
                + c
                + 1
            )
        ).alias("r1_x2_part"),
        (c.cast("bigint") * c * c - c).alias("tie_part"),
    )
    agg = ranked.agg(
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
        F.sum("r1_x2_part").cast("bigint").alias("r1_x2"),
        F.sum("tie_part").cast("bigint").alias("ties"),
    )
    return agg.selectExpr(
        "n_a",
        "n_b",
        "cast(r1_x2 - n_a * (n_a + 1) as bigint) as u1_x2",
        """round(
            (cast(r1_x2 - n_a * (n_a + 1) as double) - cast(n_a * n_b as double))
            / (2.0 * sqrt(
                cast(n_a as double) * cast(n_b as double) / 12.0
                * (cast(n_a + n_b + 1 as double)
                   - cast(ties as double)
                     / (cast(n_a + n_b as double)
                        * cast(n_a + n_b - 1 as double)))
            )), 4) as z""",
        """round(1.0 - cast(r1_x2 - n_a * (n_a + 1) as double)
                 / cast(n_a * n_b as double), 4) as rank_biserial""",
    )


def duck_mann_whitney_sql(
    source_a: str = "src0", source_b: str = "src1"
) -> str:
    """Oracle twin of :func:`mann_whitney` — identical doubled-integer
    rank arithmetic and the same one-shot normal approximation."""
    return f"""
        WITH counts AS (
            SELECT n_chars,
                   sum(CASE WHEN source = '{source_a}' THEN 1 ELSE 0 END)
                       AS ca,
                   sum(CASE WHEN source = '{source_b}' THEN 1 ELSE 0 END)
                       AS cb
            FROM documents WHERE source IN ('{source_a}', '{source_b}')
            GROUP BY n_chars
        ), ranked AS (
            SELECT ca, cb,
                   ca::BIGINT * (2 * coalesce(sum(ca + cb) OVER (
                       ORDER BY n_chars
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) + (ca + cb) + 1) AS r1_x2_part,
                   (ca + cb)::BIGINT * (ca + cb) * (ca + cb) - (ca + cb)
                       AS tie_part
            FROM counts
        ), agg AS (
            SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b,
                   sum(r1_x2_part)::BIGINT AS r1_x2,
                   sum(tie_part)::BIGINT AS ties
            FROM ranked
        )
        SELECT n_a, n_b,
               (r1_x2 - n_a * (n_a + 1))::BIGINT AS u1_x2,
               round(
                   ((r1_x2 - n_a * (n_a + 1))::DOUBLE - (n_a * n_b)::DOUBLE)
                   / (2.0 * sqrt(
                       n_a::DOUBLE * n_b::DOUBLE / 12.0
                       * ((n_a + n_b + 1)::DOUBLE
                          - ties::DOUBLE
                            / ((n_a + n_b)::DOUBLE * (n_a + n_b - 1)::DOUBLE))
                   )), 4) AS z,
               round(1.0 - (r1_x2 - n_a * (n_a + 1))::DOUBLE
                     / (n_a * n_b)::DOUBLE, 4) AS rank_biserial
        FROM agg
    """


def psi_drift(
    orders: DataFrame, split: str = "1995-01-01", n_bins: int = 20
) -> DataFrame:
    """Population Stability Index between the order-value distributions
    before and after ``split`` — THE model-monitoring drift number (PSI
    < 0.1 stable, 0.1–0.25 moderate, > 0.25 action): fixed equal-width
    bins over o_totalprice, Laplace-smoothed shares, PSI = Σ (p₁−p₀)·
    ln(p₁/p₀). One row per bin with its contribution plus a ``__total__``
    row with the verdict band.

    Exactness: bin counts exact from ONE conditional partial agg; each
    term is (exact-ratio difference)·(ln of exact integer products);
    the bin-level sums are metadata-sized. Scale shape: single fact
    pass, bins-sized everything after.
    """
    from pyspark.sql import Window

    b = F.least(
        F.lit(n_bins - 1),
        F.floor(F.col("o_totalprice") / F.lit(600000.0 / n_bins)).cast("int"),
    )
    post = F.col("o_orderdate") >= F.lit(split).cast("timestamp")
    bins = orders.select(b.alias("bin"), post.alias("post")).groupBy(
        "bin"
    ).agg(
        F.sum(F.when(~F.col("post"), 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("post"), 1).otherwise(0)).alias("c1"),
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = bins.select(
        "bin",
        "c0",
        "c1",
        F.sum("c0").over(wall).alias("n0"),
        F.sum("c1").over(wall).alias("n1"),
    )
    p0 = (F.col("c0") + 1) / (F.col("n0") + F.lit(n_bins))
    p1 = (F.col("c1") + 1) / (F.col("n1") + F.lit(n_bins))
    ln_ratio = (
        F.log((F.col("c1") + 1).cast("double"))
        - F.log((F.col("n1") + F.lit(n_bins)).cast("double"))
        - F.log((F.col("c0") + 1).cast("double"))
        + F.log((F.col("n0") + F.lit(n_bins)).cast("double"))
    )
    terms = t.select(
        "bin",
        F.col("c0").cast("bigint").alias("c0"),
        F.col("c1").cast("bigint").alias("c1"),
        ((p1 - p0) * ln_ratio).alias("term"),
    )
    per_bin = terms.select(
        "bin", "c0", "c1", F.round("term", 6).alias("psi_contrib")
    )
    total = terms.agg(
        F.lit(-1).cast("int").alias("bin"),
        F.sum("c0").cast("bigint").alias("c0"),
        F.sum("c1").cast("bigint").alias("c1"),
        F.round(F.sum("term"), 6).alias("psi_contrib"),
    )
    # per-bin rows carry the literal 'bin' marker, not NULL: a NULL in a
    # string output column breaks order-insensitive harnesses that sort
    # raw tuples (None vs str), and the verdict only exists for the total
    return per_bin.unionByName(total).withColumn(
        "band",
        F.when(F.col("bin") != -1, F.lit("bin")).otherwise(
            F.when(F.col("psi_contrib") < 0.1, "stable")
            .when(F.col("psi_contrib") < 0.25, "moderate")
            .otherwise("action")
        ),
    )


def duck_psi_sql(split: str = "1995-01-01", n_bins: int = 20) -> str:
    """Oracle twin of :func:`psi_drift`."""
    w = 600000.0 / n_bins
    return f"""
        WITH bins AS (
            SELECT least({n_bins - 1},
                         CAST(floor(o_totalprice / {w!r}) AS INT)) AS bin,
                   sum(CASE WHEN o_orderdate >= TIMESTAMP '{split}'
                            THEN 0 ELSE 1 END) AS c0,
                   sum(CASE WHEN o_orderdate >= TIMESTAMP '{split}'
                            THEN 1 ELSE 0 END) AS c1
            FROM orders GROUP BY 1
        ), t AS (
            SELECT bin, c0, c1,
                   sum(c0) OVER () AS n0, sum(c1) OVER () AS n1
            FROM bins
        ), terms AS (
            SELECT bin, c0::BIGINT AS c0, c1::BIGINT AS c1,
                   ((c1 + 1) / (n1 + {n_bins}) - (c0 + 1) / (n0 + {n_bins}))
                   * (ln((c1 + 1)::DOUBLE) - ln((n1 + {n_bins})::DOUBLE)
                      - ln((c0 + 1)::DOUBLE) + ln((n0 + {n_bins})::DOUBLE))
                       AS term
            FROM t
        ), unioned AS (
            SELECT bin, c0, c1, round(term, 6) AS psi_contrib FROM terms
            UNION ALL
            SELECT -1, sum(c0)::BIGINT, sum(c1)::BIGINT,
                   round(sum(term), 6) FROM terms
        )
        SELECT bin, c0, c1, psi_contrib,
               CASE WHEN bin <> -1 THEN 'bin'
                    WHEN psi_contrib < 0.1 THEN 'stable'
                    WHEN psi_contrib < 0.25 THEN 'moderate'
                    ELSE 'action' END AS band
        FROM unioned
    """


def l_diversity_audit(events: DataFrame, l_min: int = 3) -> DataFrame:
    """l-diversity audit — the governance gate k-anonymity alone misses:
    a QI group can be large (k-anonymous) yet expose everyone in it if
    the SENSITIVE attribute is uniform inside the group (homogeneity
    attack). Over the same generalized QI pair as ``k_anonymity_audit``
    (event day, value bucket), with ``event_type`` as the sensitive
    attribute: per-group distinct sensitive values, groups below
    ``l_min``, rows at risk, and the worst (most homogeneous big) group.

    Scale shape: one (QI, sensitive) partial agg — the only corpus-sized
    shuffle — then a QI-level rollup and a day-level report; everything
    after the first aggregation is metadata-sized.
    """
    day_ms = (
        F.unix_micros(F.date_trunc("day", F.col("ts"))) / F.lit(1000)
    ).cast("long")
    bucket = F.floor(F.col("value") / F.lit(5.0)).cast("long")
    cells = (
        events.select(
            day_ms.alias("day_ms"), bucket.alias("vb"), "event_type"
        )
        .groupBy("day_ms", "vb", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    groups = cells.groupBy("day_ms", "vb").agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("l_distinct"),
    )
    viol = F.col("l_distinct") < l_min
    return groups.groupBy("day_ms").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(viol.cast("int")).cast("bigint").alias("n_violating"),
        F.sum(F.when(viol, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.min("l_distinct").cast("bigint").alias("worst_l"),
        F.round(
            F.sum(F.when(viol, F.col("n_rows")).otherwise(0))
            / F.sum("n_rows"),
            6,
        ).alias("risk_fraction"),
    )


def duck_l_diversity_sql(l_min: int = 3) -> str:
    """Oracle twin of :func:`l_diversity_audit`."""
    return f"""
        WITH cells AS (
            SELECT CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS day_ms,
                   CAST(floor(value / 5.0) AS BIGINT) AS vb,
                   event_type, count(*) AS c
            FROM events GROUP BY 1, 2, 3
        ), groups AS (
            SELECT day_ms, vb, sum(c) AS n_rows,
                   count(*) AS l_distinct
            FROM cells GROUP BY 1, 2
        )
        SELECT day_ms, count(*)::BIGINT AS n_groups,
               sum(CASE WHEN l_distinct < {l_min} THEN 1 ELSE 0 END)::BIGINT
                   AS n_violating,
               sum(CASE WHEN l_distinct < {l_min} THEN n_rows ELSE 0
                   END)::BIGINT AS rows_at_risk,
               min(l_distinct)::BIGINT AS worst_l,
               round(sum(CASE WHEN l_distinct < {l_min} THEN n_rows ELSE 0
                         END) / sum(n_rows), 6) AS risk_fraction
        FROM groups GROUP BY day_ms
    """
