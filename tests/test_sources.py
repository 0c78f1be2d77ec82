"""CSV / JSON-lines source wrappers: declared-schema reads, FAILFAST
default, PERMISSIVE quarantine routing, whitelist validation."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.sources import (
    files,
)
from streaming_ingestion_from_snowflake_to_apache_iceberg_with_apache_flink_spark.sources.parquet import (
    load_table,
)

SF = "/root/testdata/sf0.001"

SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def orders3(spark):
    return load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


def test_csv_roundtrip(spark, orders3, tmp_path):
    path = str(tmp_path / "csv")
    orders3.write.option("header", "true").csv(path)
    back = files.read_csv(spark, path, SCHEMA)
    assert back.schema == SCHEMA
    assert back.exceptAll(orders3).count() == 0
    assert orders3.exceptAll(back).count() == 0


def test_jsonl_roundtrip(spark, orders3, tmp_path):
    path = str(tmp_path / "jsonl")
    orders3.write.json(path)
    back = files.read_jsonl(spark, path, SCHEMA)
    assert back.select(*SCHEMA.fieldNames()).exceptAll(orders3).count() == 0


def test_jsonl_array_column_roundtrip(spark, tmp_path):
    """Extension types: array<float> (embedding-shaped) survives."""
    emb = load_table(spark, SF, "embeddings").limit(50)
    path = str(tmp_path / "emb")
    emb.write.json(path)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    back = files.read_jsonl(spark, path, schema)
    assert back.count() == 50
    assert back.filter(F.size("embedding") <= 0).count() == 0


def test_csv_failfast_aborts_on_malformed(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text(
        "o_orderkey,o_totalprice,o_orderpriority\n"
        "1,10.5,1-URGENT\n"
        "not_a_number,xx,broken\n"
    )
    df = files.read_csv(spark, str(p), SCHEMA)
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        df.collect()


def test_csv_permissive_quarantines(spark, tmp_path):
    p = tmp_path / "bad2"
    p.mkdir()
    (p / "part.csv").write_text(
        "o_orderkey,o_totalprice,o_orderpriority\n"
        "1,10.5,1-URGENT\n"
        "oops,xx,broken\n"
    )
    df = files.read_csv(
        spark, str(p), SCHEMA, mode="PERMISSIVE", corrupt_col="_bad"
    )
    rows = df.collect()
    assert len(rows) == 2
    bad = [r for r in rows if r["_bad"] is not None]
    assert len(bad) == 1 and "oops" in bad[0]["_bad"]


def test_schema_validation(spark):
    with pytest.raises(TypeError):
        files.read_csv(spark, "/tmp/x", None)
    nested = T.StructType(
        [T.StructField("m", T.MapType(T.StringType(), T.StringType()))]
    )
    with pytest.raises(ValueError, match="whitelist"):
        files.read_csv(spark, "/tmp/x", nested)
    with pytest.raises(ValueError, match="mode"):
        files.read_csv(spark, "/tmp/x", SCHEMA, mode="YOLO")
    with pytest.raises(ValueError, match="PERMISSIVE"):
        files.read_csv(spark, "/tmp/x", SCHEMA, corrupt_col="_bad")
