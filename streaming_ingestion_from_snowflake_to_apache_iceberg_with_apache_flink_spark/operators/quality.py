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

from pyspark.sql import DataFrame
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
