"""Parameterized cross-engine equivalence for the TPC-H shapes: hypothesis
draws the query parameters (date windows, quantity cuts, brand triples) and
Spark must agree with DuckDB on every draw — the oracle contract holds over
the parameter space, not just the published constants."""

from __future__ import annotations

import sys

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.operators.tpch import (  # noqa: E402
    discounted_revenue,
    forecast_revenue,
    priority_waiting,
)
from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.sources.parquet import (  # noqa: E402
    load_table,
)

from .oracle_harness import compare, duck_connection

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


REV = "CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)"


def test_q4_exists_over_random_date_windows(spark, duck):
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        start_year=st.integers(1995, 2000),
        start_month=st.integers(1, 12),
        months=st.integers(1, 9),
    )
    def check(start_year, start_month, months):
        lo = f"{start_year}-{start_month:02d}-01"
        em, ey = start_month + months, start_year
        while em > 12:
            em -= 12
            ey += 1
        hi = f"{ey}-{em:02d}-01"
        df = priority_waiting(
            load_table(spark, SF, "orders"),
            load_table(spark, SF, "lineitem"),
            date_lo=lo,
            date_hi=hi,
        )
        sql = f"""
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '{lo}'
              AND o_orderdate < TIMESTAMP '{hi}'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate)
            GROUP BY 1
        """
        compare(df, duck, sql, f"q4[{lo},{hi})")

    check()


def test_q6_filter_agg_over_random_cuts(spark, duck):
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        year=st.integers(1995, 2000),
        dlo=st.integers(0, 8),
        width=st.integers(0, 4),
        qty=st.integers(2, 50),
    )
    def check(year, dlo, width, qty):
        lo, hi = f"{year}-01-01", f"{year + 1}-01-01"
        disc_lo, disc_hi = dlo / 100.0, (dlo + width) / 100.0
        df = forecast_revenue(
            load_table(spark, SF, "lineitem"),
            date_lo=lo,
            date_hi=hi,
            disc_lo=disc_lo,
            disc_hi=disc_hi,
            max_qty=qty,
        )
        sql = f"""
            SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount
                       * 10000.0 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4,
                   count(*) AS n_lines
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{lo}'
              AND l_shipdate < TIMESTAMP '{hi}'
              AND l_discount >= {disc_lo} AND l_discount <= {disc_hi}
              AND l_quantity < {float(qty)}
        """
        compare(df, duck, sql, f"q6[{year},{disc_lo},{disc_hi},{qty}]")

    check()


def test_q19_disjunction_always_matches_reference_filter(spark, duck):
    """The disjunctive-predicate shape with the published constants must
    equal a row-level reference evaluation of the same three branches in
    DuckDB — guarding against predicate-pushdown miscompiles splitting
    the OR."""
    df = discounted_revenue(
        load_table(spark, SF, "lineitem"), load_table(spark, SF, "part")
    )
    sql = f"""
        SELECT CAST(sum({REV}) AS BIGINT) AS revenue_e4,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1.0 AND 20.0)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10.0 AND 30.0)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20.0 AND 40.0)
    """
    compare(df, duck, sql, "q19")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=500), min_size=0, max_size=60),
    capacity=st.integers(min_value=1, max_value=400),
    n_bins=st.integers(min_value=1, max_value=9),
)
def test_rank_machinery_matches_python_reference(spark, lens, capacity, n_bins):
    """The two-phase rank/prefix-sum operators agree with a sequential
    Python reference on arbitrary token-length lists — the property the
    plain-window oracles encode, held over the input space."""
    from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.operators import (
        sampling as smp,
    )

    rows = [(i, n) for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int") if rows else (
        spark.range(0).selectExpr("id as doc_id", "cast(id as int) as n_tokens")
    )

    got_shards = {
        r.shard: (r.n_docs, r.total_tokens, r.min_doc, r.max_doc)
        for r in smp.token_budget_shards(df, capacity=capacity).collect()
    }
    want: dict = {}
    start = 0
    for i, n in rows:
        s = start // capacity
        d = want.setdefault(s, [0, 0, i, i])
        d[0] += 1
        d[1] += n
        d[3] = i
        start += n
    assert got_shards == {s: tuple(v) for s, v in want.items()}

    got_bins = {r.doc_id: r.bin for r in smp.pack_bins(df, n_bins=n_bins).collect()}
    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    want_bins = {}
    for r, (i, _n) in enumerate(order):
        fwd = r % n_bins
        want_bins[i] = fwd if (r // n_bins) % 2 == 0 else n_bins - 1 - fwd
    assert got_bins == want_bins
