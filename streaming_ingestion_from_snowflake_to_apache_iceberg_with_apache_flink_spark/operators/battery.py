"""Scalar-function batteries: the engine's string / date / array / JSON
expression surface, each battery one whole-stage-codegen projection.

The reference's only scalar work is the per-field cast switch
(`Operators/Process/SnowflakeToRowDataMapFunction.java:61-85`) and a
`String.format` SQL assembly (`StreamingJob.java:92-93`); these batteries are
the north-star extension (BASELINE.json): the function surface a user needs
to express real pipelines, declared as Catalyst builtins (never Python UDFs)
with an exact DuckDB twin per expression. Functions whose cross-engine
semantics diverge on edge cases (initcap word rules, months_between
fractions, locale collation) are deliberately excluded — the battery is the
portable core, not the whole builtin list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def string_battery(customer: DataFrame) -> DataFrame:
    """String surface over `customer` text columns: case mapping, slicing,
    padding, search, replace, edit distance — one projection, all JVM
    builtins inside one codegen span."""
    return customer.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 10, 5).alias("name_mid"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("key_padded"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.regexp_replace("c_name", "0", "o").alias("name_o"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_folded"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).alias("seg_dist"),
        F.repeat(F.lit("*"), F.length("c_mktsegment")).alias("seg_mask"),
    )


def date_battery(orders: DataFrame) -> DataFrame:
    """Date/time surface over `o_orderdate`: calendar part extraction, ISO
    weekday/week, truncation, arithmetic, boundaries. Parts are chosen for
    identical cross-engine definitions (ISO week-of-year; isodow 1=Monday —
    Spark's `weekday()+1`)."""
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("dom"),
        F.dayofyear(d).alias("doy"),
        (F.weekday(d) + F.lit(1)).alias("isodow"),
        F.weekofyear(d).alias("isoweek"),
        (F.unix_timestamp(F.date_trunc("month", d)) * 1000).alias("month_start_ms"),
        F.last_day(d).cast("string").alias("month_end"),
        F.date_add(d.cast("date"), 30).cast("string").alias("plus30"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date")).alias(
            "days_to_eoy98"
        ),
    )


def array_battery(documents: DataFrame) -> DataFrame:
    """Array surface over the token array: size/dedup/sort/slice/search plus
    set algebra between the document's first and second half. Set-op results
    are sorted and joined to strings so the comparison is order-insensitive
    in both engines."""
    return (
        documents.selectExpr(
            "doc_id", "split(trim(text), '\\\\s+') as toks"
        )
        .selectExpr(
            "doc_id",
            "toks",
            "slice(toks, 1, cast(size(toks) / 2 as int)) as lo",
            "slice(toks, cast(size(toks) / 2 as int) + 1, size(toks)) as hi",
        )
        .selectExpr(
            "doc_id",
            "size(toks) as n_toks",
            "size(array_distinct(toks)) as n_uniq",
            "cast(array_contains(toks, 'the') as boolean) as has_the",
            "cast(array_position(toks, 'value') as int) as first_value_pos",
            "array_join(slice(array_sort(toks), 1, 5), ' ') as first5_sorted",
            "array_join(array_sort(array_distinct(array_intersect(lo, hi))), ' ')"
            " as half_overlap",
            "array_join(array_sort(array_distinct(array_except(lo, hi))), ' ')"
            " as lo_only",
            "size(array_distinct(array_union(lo, hi))) as n_union",
        )
    )


def json_battery(events: DataFrame) -> DataFrame:
    """JSON extraction + aggregation over the `props` payload column: parse
    the field JVM-side (no Python), then a per-type partial-agg rollup of
    the extracted value — extract fuses into the scan projection, so the
    JSON string itself never crosses the shuffle."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("k").alias("n_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


def map_battery(events: DataFrame) -> DataFrame:
    """MapType surface: construction (map_from_arrays), lookup
    (element_at), keys/values introspection, map_concat, and
    transform_values — the map side of the nested-type system. Outputs are
    scalars and sorted joined strings, so the oracle checks semantics
    without needing a cross-engine map representation."""
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("user")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    m2 = F.map_concat(
        m, F.create_map(F.lit("id"), F.col("event_id").cast("string"))
    )
    upper = F.transform_values(m2, lambda k, v: F.upper(v))
    return events.select(
        "event_id",
        F.size(m2).alias("n_entries"),
        F.element_at(m2, "type").alias("type_val"),
        F.element_at(m2, "missing").alias("missing_val"),
        F.array_join(F.array_sort(F.map_keys(m2)), ",").alias("keys_sorted"),
        F.array_join(F.array_sort(F.map_values(m2)), ",").alias("vals_sorted"),
        F.element_at(upper, "type").alias("type_upper"),
    )


def higher_order_battery(documents: DataFrame) -> DataFrame:
    """Higher-order-function surface over the token array: filter, exists,
    forall, aggregate (fold), and zip_with — the lambdas Catalyst compiles
    JVM-side, checked with exact integer/boolean outputs."""
    return documents.selectExpr(
        "doc_id", "split(trim(text), '\\\\s+') as tk"
    ).selectExpr(
        "doc_id",
        "size(filter(tk, t -> length(t) >= 5)) as n_long",
        "exists(tk, t -> t rlike '^[0-9]+$') as any_numeric",
        "forall(tk, t -> length(t) > 0) as all_nonempty",
        "aggregate(tk, 0, (acc, t) -> acc + length(t)) as total_chars",
        "aggregate(zip_with(tk, reverse(tk), (a, b) -> "
        "cast(a = b as int)), 0, (acc, x) -> acc + x) as palindrome_hits",
    )


def null_battery(events: DataFrame) -> DataFrame:
    """Null-semantics surface: a deterministically sparse reading (only
    ``click`` events carry one) driven through the null-handling builtins —
    null-safe equality (``equal_null`` / SQL ``<=>``), ``nullif``,
    ``nvl2``, ``coalesce`` — plus ``posexplode_outer``, the lateral that
    PRESERVES rows whose array is null (plain explode drops them, the
    classic silent-row-loss bug in enrichment pipelines).

    Pure projection + generate: zero shuffles, whole-stage codegen, and
    every output value is an exact function of the row, so the oracle
    states each builtin's semantics directly.
    """
    reading = F.when(F.col("event_type") == "click", F.col("value"))
    arr = F.when(F.col("event_type") == "click", F.array(F.col("value")))
    return events.select(
        "event_id",
        reading.alias("reading"),
        F.equal_null(reading, F.col("value")).alias("safe_eq"),
        F.nullif(F.col("value"), F.lit(0.0)).alias("nz_value"),
        F.nvl2(reading, F.lit("present"), F.lit("absent")).alias("tagged"),
        F.coalesce(reading, F.lit(-1.0)).alias("filled"),
        F.posexplode_outer(arr),
    ).withColumnsRenamed({"pos": "arr_pos", "col": "arr_val"})
