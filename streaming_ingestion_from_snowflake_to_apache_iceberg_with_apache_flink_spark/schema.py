"""Schema system: the reference's compile-time type whitelist as Spark types.

The reference converts rows field-by-field through a hard-coded switch
(``Operators/Process/SnowflakeToRowDataMapFunction.java:61-85``): VARCHAR,
INTEGER, BIGINT, DOUBLE, FLOAT, BOOLEAN, TIMESTAMP_WITHOUT_TIME_ZONE pass;
null passes through (lines 62-64); anything else throws
UnsupportedOperationException (82-83). In Spark the whole conversion is one
declarative ``select(cast(...))`` that Catalyst folds into the scan, but we
keep the whitelist and the throw-on-unknown semantics so configuration errors
surface at plan time, not at scale.

On a 100 TB run this matters because the cast projection is the difference
between a whole-stage-codegen'd columnar scan and a per-row Python hop: all
casts here are JVM-side Catalyst expressions; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import UnsupportedOperationError

#: The §1.3 whitelist (SnowflakeToRowDataMapFunction.java:66-84) mapped to
#: Spark types. TIMESTAMP_WITHOUT_TIME_ZONE maps to TimestampNTZType; the
#: fixture pipeline uses TimestampType (session-UTC) because the driver's
#: DuckDB oracle reads parquet instants — one convention, pinned here.
SUPPORTED_TYPES: tuple[type, ...] = (
    T.StringType,        # VARCHAR
    T.IntegerType,       # INTEGER
    T.LongType,          # BIGINT
    T.DoubleType,        # DOUBLE
    T.FloatType,         # FLOAT
    T.BooleanType,       # BOOLEAN
    T.TimestampType,     # TIMESTAMP (instant convention, see above)
    T.TimestampNTZType,  # TIMESTAMP_WITHOUT_TIME_ZONE
)


def validate_target_schema(schema: T.StructType) -> T.StructType:
    """Reject any field outside the reference's type whitelist
    (the UnsupportedOperationException branch, lines 82-83)."""
    for f in schema.fields:
        if not isinstance(f.dataType, SUPPORTED_TYPES):
            raise UnsupportedOperationError(
                f"type {f.dataType.simpleString()} of field {f.name!r} is "
                "outside the supported whitelist "
                "(string,int,bigint,double,float,boolean,timestamp)"
            )
    return schema


def cast_projection(df: DataFrame, target: T.StructType) -> DataFrame:
    """The reference's row-format conversion (O9) as one Catalyst projection.

    Reference: SnowflakeToRowDataMapFunction.java:29-85 — reflect each field
    out of the POJO and cast per logical type, null passing through. Spark
    form: ``select(col(name).cast(type))`` — a single whole-stage-codegen
    projection, pushed against the scan; nulls pass through ``cast`` natively.
    """
    validate_target_schema(target)
    missing = [f.name for f in target.fields if f.name not in df.columns]
    if missing:
        raise ValueError(f"cast_projection: source lacks fields {missing}")
    return df.select([F.col(f.name).cast(f.dataType).alias(f.name) for f in target.fields])


def ts_ms(col: str | Column) -> Column:
    """Canonical comparable form of a timestamp: epoch milliseconds (bigint).

    Fixture timestamps are parquet ns truncated to µs by both Spark and
    DuckDB (FIXTURES.md §2 events.ts note); comparing at ms-epoch makes the
    oracle hash deterministic across engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.unix_micros(c) / F.lit(1000)).cast("long")


def cast_deadletter(df: DataFrame, target: T.StructType, key: str) -> DataFrame:
    """The whitelist's throw-branch (SnowflakeToRowDataMapFunction.java:82-83)
    as DATA instead of a job-killing exception: rows whose source value is
    non-null but fails ``try_cast`` to the target type are routed to a
    dead-letter output of (key, field, raw) — one row per failed field.

    A Flink job hitting an uncastable value dies; at 100 TB a single bad
    row must not. The checks compile to one whole-stage-codegen projection
    (an array of per-field CASEs) + a generate — no shuffle, no Python,
    and the happy path pays only the try_cast it already needed.
    """
    validate_target_schema(target)
    checks = []
    for f in target.fields:
        if isinstance(f.dataType, T.StringType) or f.name == key:
            continue  # strings always cast; the key must be trustworthy
        t = f.dataType.simpleString()
        checks.append(
            f"CASE WHEN {f.name} IS NOT NULL "
            f"AND try_cast({f.name} AS {t}) IS NULL "
            f"THEN named_struct('field', '{f.name}', "
            f"'raw', cast({f.name} AS string)) END"
        )
    arr = ", ".join(checks)
    return df.selectExpr(
        f"{key} AS row_key",
        f"filter(array({arr}), x -> x IS NOT NULL) AS __bad",
    ).selectExpr("row_key", "inline(__bad)")
