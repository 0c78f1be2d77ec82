"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Cosine similarity is expressed with ``zip_with`` + ``aggregate`` (a
sequential left fold), which makes the floating-point evaluation order
identical to the DuckDB oracle's explicit fold — so similarity values match
bit-for-bit, not just approximately. Everything stays inside whole-stage
codegen; no Python, no UDF, no per-row serialization.

Scale: a brute-force top-k over N vectors × P probes is P·N dot products —
embarrassingly parallel, no shuffle for the scan side when the probe set is
broadcast. The LSH variant in ``operators.similarity`` bounds the candidate
set per probe for the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic FP order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """dot / (|a| * |b|) — mirrored exactly in oracle SQL (duck_cosine).
    A zero-norm vector (an empty document's embedding) has undefined
    cosine: NULL via nullif, never an ANSI divide-by-zero — NULL sinks
    below every real score under the nulls-last ordering both engines
    default to, and threshold filters drop it (round-9 zero-vector
    fixture finding)."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


# -- DuckDB oracle fragment (same fold order) -------------------------------


def duck_dot(a: str, b: str, dim: int) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {dim}), "
        f"i -> {a}[i] * {b}[i]), (acc, x) -> acc + x)"
    )


def duck_cosine(a: str, b: str, dim: int) -> str:
    return (
        f"({duck_dot(a, b, dim)} / "
        f"nullif(sqrt({duck_dot(a, a, dim)})"
        f" * sqrt({duck_dot(b, b, dim)}), 0))"
    )
