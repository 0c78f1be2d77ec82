"""CSV / JSON-lines file sources.

The reference reads only JDBC (SURVEY.md §2.3 "Scans/sources"), but a
drop-in engine needs file-format ingestion for staging data that arrives as
exports. Both readers follow the reference's schema stance (SURVEY.md §1.2:
fixed, declared, no inference — `README.md:66-67`): an explicit
``StructType`` is REQUIRED and validated against the §1.3 type whitelist.
Never schema-infer at scale — inference is a full extra pass over 100 TB
before the real read starts.

Default parse mode is FAILFAST: a malformed row aborts the read instead of
silently nulling fields mid-corpus (PERMISSIVE with an explicit
``corrupt_col`` is available for quarantine-style pipelines, where bad rows
are routed to a side table instead of lost).

Scale notes: CSV and JSON-lines are splittable when uncompressed (and with
bzip2), so Spark parallelizes a large file by range; gzip is NOT splittable
— one 10 GB .csv.gz is one task. Both readers accept a directory / glob of
many files, which is the layout a 1000-executor cluster wants anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schema import SUPPORTED_TYPES

_MODES = ("FAILFAST", "PERMISSIVE", "DROPMALFORMED")


def _check(schema: T.StructType, mode: str) -> None:
    """File sources accept the reference whitelist (schema.SUPPORTED_TYPES)
    plus the engine-extension types its own operators produce: arrays of
    whitelisted primitives (embeddings) and binary (media payloads)."""
    if not isinstance(schema, T.StructType):
        raise TypeError("an explicit StructType schema is required (no inference)")
    for f in schema.fields:
        dt = f.dataType
        ok = (
            isinstance(dt, SUPPORTED_TYPES)
            or isinstance(dt, T.BinaryType)
            or (
                isinstance(dt, T.ArrayType)
                and isinstance(dt.elementType, SUPPORTED_TYPES)
            )
        )
        if not ok:
            raise ValueError(
                f"type {dt.simpleString()} of field {f.name!r} is outside "
                "the file-source whitelist (reference primitives, "
                "array<primitive>, binary)"
            )
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    mode: str = "FAILFAST",
    corrupt_col: str | None = None,
    **options: str,
) -> DataFrame:
    """Read CSV with a declared, whitelist-validated schema.

    ``corrupt_col`` (PERMISSIVE only) adds a string column capturing each
    malformed raw line for quarantine routing.
    """
    _check(schema, mode)
    if corrupt_col:
        if mode != "PERMISSIVE":
            raise ValueError("corrupt_col requires mode='PERMISSIVE'")
        schema = T.StructType(
            [*schema.fields, T.StructField(corrupt_col, T.StringType(), True)]
        )
        options["columnNameOfCorruptRecord"] = corrupt_col
    reader = (
        spark.read.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "FAILFAST",
    corrupt_col: str | None = None,
    **options: str,
) -> DataFrame:
    """Read JSON-lines with a declared, whitelist-validated schema."""
    _check(schema, mode)
    if corrupt_col:
        if mode != "PERMISSIVE":
            raise ValueError("corrupt_col requires mode='PERMISSIVE'")
        schema = T.StructType(
            [*schema.fields, T.StructField(corrupt_col, T.StringType(), True)]
        )
        options["columnNameOfCorruptRecord"] = corrupt_col
    reader = (
        spark.read.format("json")
        .schema(schema)
        .option("mode", mode)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_read_orc(
    df: DataFrame, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC round-trip: write a DataFrame as ORC and read it back with a
    DECLARED schema (same no-inference stance as the CSV/JSONL readers).
    ORC is the second columnar format large estates actually hold (Hive
    heritage); Spark's reader is vectorized and predicate-pushing exactly
    like parquet, so every operator in this engine runs on ORC-backed
    tables unchanged — this function is the conversion + proof path.
    """
    spark = df.sparkSession
    df.write.mode("overwrite").orc(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
