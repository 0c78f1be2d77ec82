"""The remaining Pandas-UDF API surfaces — scalar vectorized, grouped
aggregate, and grouped map (``applyInPandas``) — each demonstrated on an
operator whose arithmetic is exact integers, so the Python stages sit inside
the DuckDB value-correctness gate like everything else.

UDFs are this engine's slow path by policy (multimodal decode and these
three are the only Python stages); when one is unavoidable the rules are:
Arrow batches only (never row-at-a-time pickling), integer or
integer-derived outputs where cross-engine checking matters, and metadata
pruned before the Python boundary so blobs/long strings don't cross it
needlessly.

Reference note: the reference has no user-function surface at all (its only
per-row Python/Java logic is the cast switch,
`Operators/Process/SnowflakeToRowDataMapFunction.java:61-85`); this module
is north-star extension surface (BASELINE.json).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def quantized_norm_sq(embeddings: DataFrame, scale: int = 127) -> DataFrame:
    """Scalar vectorized pandas_udf: exact integer sum-of-squares of the
    symmetric int8 quantization of each embedding (the norm a quantized
    ANN index stores). numpy does the per-batch work on Arrow arrays; all
    values are integers, so the result is bit-identical to the SQL fold.
    """
    import numpy as np

    @pandas_udf(T.LongType())
    def norm_sq(col: pd.Series) -> pd.Series:
        def one(vec) -> int:
            a = np.asarray(vec, dtype=np.float64)
            q = np.trunc(a * scale).astype(np.int64)
            return int((q * q).sum())

        return col.map(one)

    return embeddings.select(
        "vec_id", norm_sq(F.col("embedding").cast("array<double>")).alias("norm_sq")
    )


def grouped_minmax_scale(documents: DataFrame, buckets: int = 10_000) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-language min-max scaling of doc
    length onto [0, buckets] as exact integer floor arithmetic — the
    feature-normalization shape where the whole group must be visible at
    once (the canonical applyInPandas use case).

    One shuffle on the group key; each group is a pandas frame. Groups must
    fit an executor (languages do; at scale shard hot groups first).
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("scaled", T.LongType()),
        ]
    )

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = int(pdf["n_chars"].min()), int(pdf["n_chars"].max())
        span = max(hi - lo, 1)
        pdf = pdf.copy()
        # exact integer floor division — no FP, so the oracle matches
        pdf["scaled"] = (pdf["n_chars"] - lo) * buckets // span
        return pdf[["doc_id", "lang", "n_chars", "scaled"]]

    return (
        documents.select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(scale, schema=schema)
    )


def grouped_agg_charsum(documents: DataFrame) -> DataFrame:
    """Grouped-aggregate pandas_udf: per-(lang, source) row count and total
    characters as Arrow-batched Python aggregates (exact integer sums) —
    the UDAF surface of the engine. Both aggregates are pandas UDFs:
    Catalyst refuses to mix group-aggregate pandas UDFs with JVM aggregates
    in one Aggregate node (INVALID_PANDAS_UDF_PLACEMENT)."""

    @pandas_udf(T.LongType())
    def char_sum(col: pd.Series) -> int:
        return int(col.sum())

    @pandas_udf(T.LongType())
    def row_count(col: pd.Series) -> int:
        return int(len(col))

    return documents.groupBy("lang", "source").agg(
        row_count("doc_id").alias("n_docs"),
        char_sum("n_chars").alias("total_chars"),
    )


def cogrouped_reconcile(
    orders: DataFrame, events: DataFrame, key_mod: int = 20
) -> DataFrame:
    """Cogrouped-map ``applyInPandas`` — the fourth and last Pandas API
    shape (``groupBy().cogroup(other.groupBy())``): per entity key, both
    sides' rows arrive as two pandas frames in ONE task, the shape for
    custom two-source reconciliation that a join can't express row-wise
    (here: order count/cents vs event count per key, exact integers).

    One co-partitioned shuffle per side on the key; each key's pair of
    frames must fit an executor (entity-sized groups do). The equivalent
    relational form is a full-outer join of two partial aggs — which is
    exactly what the oracle states, value-checking the Python stage.
    Scope: every ``key_mod``-th entity (the declared audit sample — a
    cogroup pays one Python invocation PER KEY, so you sample entities,
    not rows, to bound the Python round-trips; the filter is pushed to
    both scans).
    """
    schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("n_orders", T.LongType()),
            T.StructField("order_cents", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )

    def reconcile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        key = int(left["k"].iloc[0]) if len(left) else int(right["k"].iloc[0])
        # per-row floor(x·100 + 0.5) then exact integer sum — the same
        # cents quantization the oracle states (engine round-half rules
        # and FP sum order never enter)
        cents = (
            int(np.floor(left["o_totalprice"].to_numpy() * 100 + 0.5).sum())
            if len(left)
            else 0
        )
        return pd.DataFrame(
            {
                "key": [key],
                "n_orders": [len(left)],
                "order_cents": [cents],
                "n_events": [len(right)],
            }
        )

    lo = orders.filter(F.col("o_custkey") % key_mod == 0).select(
        F.col("o_custkey").alias("k"), "o_totalprice"
    )
    ev = events.filter(F.col("user_id") % key_mod == 0).select(
        F.col("user_id").alias("k")
    )
    return (
        lo.groupBy("k")
        .cogroup(ev.groupBy("k"))
        .applyInPandas(reconcile, schema=schema)
    )
