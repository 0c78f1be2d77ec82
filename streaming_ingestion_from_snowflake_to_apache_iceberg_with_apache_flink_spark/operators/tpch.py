"""The remaining classic TPC-H query shapes, adapted to the fixture schema.

The reference pipeline (SURVEY.md §0) has no SQL frontend; its "queries" are
the ingestion operators.  A user replacing it with this engine lands their
ingested Iceberg/parquet tables in exactly the TPC-H-ish layout of the
fixtures, so the canonical decision-support battery over those tables is the
natural "day 2" query surface.  Q1/Q3/Q5 shapes already exist
(``lineitem_pricing``, ``shipping_priority``, ``region_revenue``); this
module completes the set with the shapes that exercise operator machinery
nothing else in the repo does end-to-end: EXISTS / NOT-EXISTS decorrelation
(Q4, Q21, Q22), NOT-IN anti semantics (Q16), correlated per-group scalar
thresholds (Q2, Q11, Q15, Q17, Q20), disjunctive multi-column join
predicates (Q19), outer-join-then-reaggregate distributions (Q13), and
conditional-share aggregates (Q8, Q12, Q14).

Fixture adaptations (the fixtures have no ``partsupp``, ``l_shipmode``,
``l_commitdate``/``l_receiptdate``, phones or comments):

* part↔supplier relationships come from observed ``lineitem`` pairs;
* Q12's ship-mode axis becomes ``l_returnflag``;
* Q21's "kept waiting" becomes "sole last shipper": the unique supplier
  whose latest line in a multi-supplier 'F' order is strictly after every
  other supplier's lines;
* Q22's "no orders in 7 years" becomes "no 1-URGENT orders" (every fixture
  customer has orders, none would qualify verbatim).

Cross-engine exactness: money aggregates quantize per row to 1e-4 (or cents)
integers — ``floor(x * 1e4 + 0.5)`` — and sum as bigints, the repo-wide
convention (FIXTURES.md §3): both engines evaluate the identical IEEE double
product, so the quantized operand is bit-identical and the bigint sum is
order-independent.  Ratios ship as (numerator, denominator) integer pairs,
never as divided floats.  Thresholds that TPC-H states as fractions
(``0.2 * avg``, ``0.5 * sum``, ``avg(...)``) are cross-multiplied into pure
integer comparisons (``5·qty·cnt < sum``, ``2·sq > total``,
``cents·n > sum``), so no division ever happens on the comparison path.

Scale notes (the shapes are chosen so Catalyst's standard machinery carries
them to 100 TB):

* every dimension side (part 200M rows at 100 TB is still the SMALL side of
  a lineitem join; region/nation/supplier more so) is broadcast — the fact
  table never shuffles for a dimension;
* per-group thresholds (Q2/Q11/Q15/Q17/Q20) are one partial-agg shuffle on
  the group key followed by a broadcast or key-local join back — never a
  correlated re-scan per row;
* EXISTS/NOT EXISTS are LEFT SEMI / LEFT ANTI joins (no row multiplication,
  early-out probing); NOT IN over a nullable-free key is LEFT ANTI;
* top-k outputs go through ``orderBy().limit()`` =
  ``TakeOrderedAndProject`` — per-partition k, driver merge, no global sort.

Cache ownership: a few shapes ``persist()`` an aggregate that feeds both
the output and a scalar threshold (Q11/Q15/Q20) so the fact scan runs
once.  The handles are intentionally not unpersisted here — the returned
DataFrame is lazy, so the operator cannot know when materialization ends.
CALLERS own cleanup: run ``spark.catalog.clearCache()`` after consuming a
query (bench.py and the oracle harness both do, per query); a long-lived
session embedding these operators should do the same or unpersist via
``spark.catalog.uncacheTable``/``clearCache`` at its own batch boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _e4(col: Column) -> Column:
    """Quantize a double to an exact 1e-4 integer, identically in DuckDB."""
    return F.floor(col * F.lit(10000.0) + F.lit(0.5)).cast("long")


def _cents(col: Column) -> Column:
    return F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("long")


def _rev_e4() -> Column:
    """Per-row revenue operand: e4(l_extendedprice * (1 - l_discount))."""
    return _e4(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))


def _ts(s: str) -> Column:
    return F.lit(s).cast("timestamp")


def min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    min_size: int = 25,
    region_name: str = "EUROPE",
) -> DataFrame:
    """Q2 shape: for each large part, the supplier(s) that achieved the
    minimum observed price, restricted to suppliers of one region.

    The correlated ``MIN(price) per part`` subquery is one partial agg on
    ``l_partkey``; the observed (part, supplier, price) triples join back
    to it on the same key, so the two shuffles share a partitioning.
    Dimension filters (part size, supplier region) broadcast-prune before
    the fact join.
    """
    prices = lineitem.select(
        "l_partkey", "l_suppkey", _cents(F.col("l_extendedprice")).alias("price_c")
    )
    big_parts = part.filter(F.col("p_size") >= min_size).select("p_partkey", "p_name")
    region_supp = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    min_price = prices.groupBy("l_partkey").agg(F.min("price_c").alias("min_c"))
    best = (
        prices.join(min_price, on="l_partkey")
        .filter(F.col("price_c") == F.col("min_c"))
        .select("l_partkey", "l_suppkey", "min_c")
        .distinct()
    )
    return (
        best.join(F.broadcast(big_parts), best.l_partkey == big_parts.p_partkey)
        .join(F.broadcast(region_supp), best.l_suppkey == F.col("s_suppkey"))
        .select(
            _cents(F.col("s_acctbal")).alias("s_acctbal_c"),
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            F.col("min_c").alias("min_price_c"),
        )
    )


def priority_waiting(
    orders: DataFrame,
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-07-01",
) -> DataFrame:
    """Q4 shape: order counts per priority where at least one line shipped
    after the order date (EXISTS → LEFT SEMI; the semi join probes with
    the inequality attached to the equi key, no row multiplication)."""
    o = orders.filter(
        (F.col("o_orderdate") >= _ts(date_lo)) & (F.col("o_orderdate") < _ts(date_hi))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    sem = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def forecast_revenue(
    lineitem: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    disc_lo: float = 0.02,
    disc_hi: float = 0.06,
    max_qty: int = 24,
) -> DataFrame:
    """Q6 shape: single-scan filtered aggregate.  Every predicate pushes
    into the parquet scan (min/max row-group pruning on ship date at
    scale); the plan is scan → whole-stage-codegen'd partial agg → one
    row.  Revenue = Σ e4(extendedprice · discount) as an exact bigint."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts(date_lo))
            & (F.col("l_shipdate") < _ts(date_hi))
            & (F.col("l_discount") >= F.lit(disc_lo))
            & (F.col("l_discount") <= F.lit(disc_hi))
            & (F.col("l_quantity") < F.lit(float(max_qty)))
        )
        .agg(
            F.sum(_e4(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue_e4"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def _supp_region(supplier: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    return (
        supplier.join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", F.col("r_name").alias("supp_region"))
    )


def _cust_region(customer: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    return (
        customer.join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", F.col("r_name").alias("cust_region"))
    )


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_a: str = "EUROPE",
    region_b: str = "ASIA",
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """Q7 shape: cross-border trade volume between two regions per year,
    both directions.  Supplier-side and customer-side geography are two
    independent broadcast chains onto the fact; the either-direction pair
    predicate filters after both attach.  One final partial-agg shuffle."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= _ts(date_lo)) & (F.col("l_shipdate") < _ts(date_hi))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = orders.select("o_orderkey", "o_custkey")
    sr = _supp_region(supplier, nation, region)
    cr = _cust_region(customer, nation, region)
    pair = (
        (F.col("supp_region") == region_a) & (F.col("cust_region") == region_b)
    ) | ((F.col("supp_region") == region_b) & (F.col("cust_region") == region_a))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sr), F.col("l_suppkey") == sr.s_suppkey)
        .join(F.broadcast(cr), F.col("o_custkey") == cr.c_custkey)
        .filter(pair)
        .groupBy(
            "supp_region", "cust_region", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(_rev_e4()).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    cust_region: str = "ASIA",
    supp_region: str = "EUROPE",
    part_type: str = "STANDARD",
) -> DataFrame:
    """Q8 shape: per order-year, the share of volume (for one part type,
    sold into one customer region) that came from suppliers of one region.
    The share ships as an exact (numerator_e4, denominator_e4) bigint pair
    — a conditional aggregate over one joined pass, no second scan."""
    li = lineitem.select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    o = orders.select("o_orderkey", "o_custkey", "o_orderdate")
    pt = part.filter(F.col("p_type") == part_type).select("p_partkey")
    sr = _supp_region(supplier, nation, region)
    cr = _cust_region(customer, nation, region).filter(
        F.col("cust_region") == cust_region
    )
    joined = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cr), F.col("o_custkey") == cr.c_custkey)
        .join(F.broadcast(sr), F.col("l_suppkey") == sr.s_suppkey)
    )
    vol = _rev_e4()
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_region") == supp_region, vol).otherwise(F.lit(0))).alias(
                "share_num_e4"
            ),
            F.sum(vol).alias("share_den_e4"),
        )
    )


def nation_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    name_like: str = "%rod%",
) -> DataFrame:
    """Q9 shape: profit per (supplier nation, order year) for parts whose
    name matches a token.  Without ``partsupp``, cost is
    ``p_retailprice · quantity``.  Both money terms quantize per row
    before the subtraction, so the sum is exact; part and supplier
    broadcast, orders arrives by orderkey — one agg shuffle."""
    li = lineitem.select(
        "l_orderkey", "l_suppkey", "l_partkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    pt = part.filter(F.col("p_name").like(name_like)).select(
        "p_partkey", "p_retailprice"
    )
    sn = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    amount = _rev_e4() - _e4(F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(amount).alias("profit_e4"), F.count(F.lit(1)).alias("n_lines"))
    )


def returned_item_report(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """Q10 shape: top-k customers by revenue lost to returns in a quarter.
    Returned lines join quarter orders by key, customer+nation broadcast;
    the top-k is TakeOrderedAndProject with the custkey tiebreak making
    the cut deterministic."""
    o = orders.filter(
        (F.col("o_orderdate") >= _ts(date_lo)) & (F.col("o_orderdate") < _ts(date_hi))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    cn = customer.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cn), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_rev_e4()).alias("revenue_e4"),
            F.max(_cents(F.col("c_acctbal"))).alias("c_acctbal_c"),
        )
        .orderBy(F.col("revenue_e4").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def important_stock(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    fraction_denom: int = 1000,
) -> DataFrame:
    """Q11 shape: (nation, part) value concentrations above 1/N of the
    global total.  The global total is a 1-row broadcast (cross join of a
    scalar aggregate — the repo-wide scalar-total idiom); the comparison
    ``value · N > total`` stays in integers.  Two partial-agg passes over
    the same pre-joined relation, no correlated re-scan."""
    sn = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    base = lineitem.select("l_suppkey", "l_partkey", _rev_e4().alias("v")).join(
        F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey")
    )
    grouped = base.groupBy(F.col("n_name").alias("nation"), "l_partkey").agg(
        F.sum("v").alias("value_e4")
    ).persist()  # read by both the output and the scalar total: scan once
    total = grouped.agg(F.sum("value_e4").alias("total_e4"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("value_e4") * F.lit(fraction_denom) > F.col("total_e4"))
        .select("nation", "l_partkey", "value_e4")
    )


def shipment_priority_classes(
    lineitem: DataFrame,
    orders: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """Q12 shape (ship-mode axis → ``l_returnflag``): per flag, how many
    lines of a ship-year belong to high- vs low-priority orders — the
    canonical CASE-sum conditional aggregate after an equi join."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= _ts(date_lo)) & (F.col("l_shipdate") < _ts(date_hi))
    ).select("l_orderkey", "l_returnflag")
    o = orders.select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def customer_distribution(
    customer: DataFrame,
    orders: DataFrame,
    excl_priority: str = "1-URGENT",
) -> DataFrame:
    """Q13 shape: distribution of customers by how many qualifying orders
    they placed, *including the zero bucket* — the left-outer-join-then-
    reaggregate pattern.  Orders partial-agg to per-customer counts first,
    so the outer join is customer×1, never customer×orders."""
    per_cust = (
        orders.filter(F.col("o_orderpriority") != excl_priority)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    return (
        customer.select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    date_lo: str = "1996-03-01",
    date_hi: str = "1996-04-01",
    promo_type: str = "PROMO",
) -> DataFrame:
    """Q14 shape: promotional share of a month's revenue as an exact
    (numerator_e4, denominator_e4) pair.  Part broadcasts; one pass."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= _ts(date_lo)) & (F.col("l_shipdate") < _ts(date_hi))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    pt = part.select("p_partkey", "p_type")
    vol = _rev_e4()
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == promo_type, vol).otherwise(F.lit(0))).alias(
                "promo_revenue_e4"
            ),
            F.sum(vol).alias("total_revenue_e4"),
        )
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> DataFrame:
    """Q15 shape: supplier(s) with the maximum quarterly revenue.  The
    max is a 1-row broadcast joined back onto the per-supplier aggregate
    (the view + scalar subquery of the original); exact bigint revenue
    makes the max tie-stable, and genuine ties all surface, as in the
    spec."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts(date_lo)) & (F.col("l_shipdate") < _ts(date_hi))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_e4()).alias("total_revenue_e4"))
        # both the output and the scalar max read this aggregate: persist
        # the supplier-cardinality relation so the FACT scan runs once
        # (without it the max's subtree re-scans lineitem)
        .persist()
    )
    mx = rev.agg(F.max("total_revenue_e4").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue_e4") == F.col("mx"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue_e4")
    )


def parts_supplier_counts(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    excl_brand: str = "Brand#1",
    excl_type: str = "PROMO",
) -> DataFrame:
    """Q16 shape: distinct-supplier counts per (brand, type, size),
    excluding one brand/type and suppliers flagged by a subquery (here:
    negative account balance, the fixtures' stand-in for complaint
    comments).  The NOT IN is a LEFT ANTI on the non-null key; observed
    part↔supplier pairs come from lineitem, deduped before counting."""
    bad_supp = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        lineitem.select("l_partkey", "l_suppkey")
        .distinct()
        .join(bad_supp, F.col("l_suppkey") == bad_supp.s_suppkey, "left_anti")
    )
    pt = part.filter(
        (F.col("p_brand") != excl_brand) & (F.col("p_type") != excl_type)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(F.broadcast(pt), F.col("l_partkey") == pt.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    part_type: str = "STANDARD",
) -> DataFrame:
    """Q17 shape: revenue from lines whose quantity is below 20% of the
    part's average.  ``qty < 0.2·avg`` cross-multiplies to the integer
    test ``5·qty·cnt < sum_qty`` — no division, no float threshold.  The
    per-part aggregate and the join back share the ``l_partkey``
    partitioning; parts of the type broadcast-prune the fact first."""
    pt = part.filter(F.col("p_type") == part_type).select("p_partkey")
    li = (
        lineitem.join(F.broadcast(pt), F.col("l_partkey") == pt.p_partkey)
        .select(
            "l_partkey",
            F.col("l_quantity").cast("long").alias("qty"),
            "l_extendedprice",
            "l_discount",
        )
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        li.join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.sum(_rev_e4()).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def large_volume_customers(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_qty: int = 180,
    k: int = 100,
) -> DataFrame:
    """Q18 shape: customers whose single orders total more than a quantity
    threshold.  The HAVING is a partial-agg on orderkey; qualifying keys
    (a tiny set) broadcast back onto orders/customer.  Top-k by total
    price is TakeOrderedAndProject with full tiebreak."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == big.l_orderkey)
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate"),
            _cents(F.col("o_totalprice")).alias("o_totalprice_c"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice_c").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Q19 shape: revenue under a three-branch disjunction of correlated
    (brand, size, quantity) windows.  The join stays a plain equi join on
    partkey (part broadcasts); the OR-of-ANDs evaluates post-join inside
    whole-stage codegen — the shape that defeats naive pushdown but not a
    broadcast probe."""
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    pt = part.select("p_partkey", "p_brand", "p_size")
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((brand == "Brand#1") & size.between(1, 15) & qty.between(1.0, 20.0))
        | ((brand == "Brand#2") & size.between(10, 30) & qty.between(10.0, 30.0))
        | ((brand == "Brand#3") & size.between(20, 50) & qty.between(20.0, 40.0))
    )
    return (
        li.join(F.broadcast(pt), F.col("l_partkey") == pt.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_rev_e4()).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def excess_shippers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    name_like: str = "%rod%",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """Q20 shape: suppliers who shipped more than half of a part's annual
    volume (the original's "excess stock" nested-IN chain).  Per-(part,
    supplier) and per-part totals are two partial aggs sharing the
    ``l_partkey`` key; ``2·sq > total`` keeps the half-threshold in
    integers; the qualifying supplier set is a distinct broadcast back
    onto the supplier dim."""
    from pyspark.sql import Window as W

    pt = part.filter(F.col("p_name").like(name_like)).select("p_partkey")
    li = (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts(date_lo)) & (F.col("l_shipdate") < _ts(date_hi))
        )
        .join(F.broadcast(pt), F.col("l_partkey") == pt.p_partkey)
        .select("l_partkey", "l_suppkey", F.col("l_quantity").cast("long").alias("qty"))
    )
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("qty").alias("sq"))
    # the per-part total as a WINDOW over per_pair instead of a second
    # groupBy + self-join: one exchange of the pair relation by l_partkey
    # replaces (per-part agg exchange + SortMergeJoin sorts on both
    # sides + the persist the join-back needed) — round 13, guide §2.4;
    # integer sums, so the threshold compare is bit-identical
    total = F.sum("sq").over(W.partitionBy("l_partkey"))
    qualifying = (
        per_pair.withColumn("total_qty", total)
        .filter(F.lit(2) * F.col("sq") > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return supplier.join(
        F.broadcast(qualifying), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


def sole_last_shipper(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Q21 shape ("kept waiting" → "sole last shipper"): on finished
    multi-supplier orders, the unique supplier whose latest line is
    strictly after every other supplier's — the EXISTS / NOT-EXISTS pair
    of the original, computed as one window pass over per-(order,
    supplier) maxima: supplier count, order max, and count-at-max come
    from a single partition-by-order window, so the double correlated
    subquery costs one shuffle."""
    from pyspark.sql import Window as W

    fo = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    sm = (
        lineitem.join(fo, F.col("l_orderkey") == fo.o_orderkey, "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("ms"))
    )
    w = W.partitionBy("l_orderkey")
    ann = sm.select(
        "l_orderkey",
        "l_suppkey",
        "ms",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.max("ms").over(w).alias("mx"),
    ).withColumn(
        "n_at_max",
        F.sum(F.when(F.col("ms") == F.col("mx"), 1).otherwise(0)).over(w),
    )
    blamed = ann.filter(
        (F.col("n_supp") > 1) & (F.col("ms") == F.col("mx")) & (F.col("n_at_max") == 1)
    )
    return (
        blamed.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def idle_rich_customers(
    customer: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    excl_priority: str = "1-URGENT",
) -> DataFrame:
    """Q22 shape: customers richer than the average positive balance with
    no qualifying orders, rolled up by nation (the fixtures' stand-in for
    phone country codes).  ``cents·n > sum`` keeps the above-average test
    in integers; the order check is a LEFT ANTI against the filtered
    orders (key-only shuffle); the scalar average is a 1-row broadcast."""
    cents = _cents(F.col("c_acctbal"))
    pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("pos_sum"), F.count(F.lit(1)).alias("pos_n")
    )
    urgent = orders.filter(F.col("o_orderpriority") == excl_priority).select(
        "o_custkey"
    )
    rich = (
        customer.select("c_custkey", "c_nationkey", cents.alias("bal_c"))
        .crossJoin(F.broadcast(pos))
        .filter(F.col("bal_c") * F.col("pos_n") > F.col("pos_sum"))
        .join(urgent, F.col("c_custkey") == urgent.o_custkey, "left_anti")
    )
    return (
        rich.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_c").alias("totacctbal_c"),
        )
    )
