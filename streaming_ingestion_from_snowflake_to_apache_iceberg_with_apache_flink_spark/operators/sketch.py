"""Sketch-based approximate aggregation that is still exactly
oracle-checkable.

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) gives no
cross-engine reproducibility — DuckDB's ``approx_count_distinct`` uses a
different sketch, so the two estimates never match. The KMV (k-minimum
values) sketch over the portable h32 (functions.hashing) is fully
deterministic in BOTH engines: the estimate is a pure function of the k
smallest 32-bit hashes, so the oracle reproduces it bit-for-bit — an
*approximate* aggregate with an *exact* correctness check.

Estimator (Bar-Yossef et al., RANDOM'02): with h uniform on [0, M) and
h_(k) the k-th smallest distinct hash, D̂ = (k-1)·M / h_(k), computed in
exact integer arithmetic (floor division) to dodge FP entirely.

Scale shape: the per-partition distinct + global top-k is a
TakeOrderedAndProject — only k hashes per partition cross the wire, never
the full distinct set; this is the mergeable-summary pattern every
distributed sketch uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions.partitioning import spread

#: hash domain of the portable h32 (md5 hex prefix → 32-bit int)
HASH_DOMAIN = 1 << 32


def kmv_distinct_tokens(documents: DataFrame, k: int = 256) -> DataFrame:
    """KMV distinct-token estimate for the corpus vs the exact count.

    Works in hash space throughout (the estimator needs distinct *hash*
    values; a string-level collision would desynchronize the two counts),
    so ``n_exact`` is the exact number of distinct token hashes. One row:
    (k_used, kth_min_hash, n_est, n_exact, rel_err).
    """
    tok = H.spark_tokens("text")
    hashes = (
        spread(documents)
        .selectExpr(f"explode(array_distinct({tok})) as token")
        .selectExpr(H.spark_h32("token") + " as h")
        .distinct()
        .persist()
    )
    kth = (
        hashes.orderBy(F.col("h").asc())
        .limit(k)
        .agg(F.max("h").alias("kth_min_hash"), F.count(F.lit(1)).alias("k_used"))
    )
    exact = hashes.agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        kth.crossJoin(exact)
        .selectExpr(
            "cast(k_used as int) as k_used",
            "kth_min_hash",
            # (k-1)·M div h_(k): exact integer floor division, no FP
            f"cast((k_used - 1) * {HASH_DOMAIN}L div kth_min_hash as bigint)"
            " as n_est",
            "n_exact",
        )
        .selectExpr(
            "k_used",
            "kth_min_hash",
            "n_est",
            "n_exact",
            "cast(round((n_est - n_exact) / n_exact, 4) as double) as rel_err",
        )
    )


def duck_kmv_sql(k: int = 256) -> str:
    """DuckDB twin of ``kmv_distinct_tokens`` (shared constants)."""
    tok = H.duck_tokens("text")
    return f"""
        WITH h AS (
            SELECT DISTINCT {H.duck_h32("token")} AS h
            FROM (SELECT unnest(list_distinct({tok})) AS token FROM documents)
        ), kth AS (
            SELECT max(h) AS kth_min_hash, count(*) AS k_used
            FROM (SELECT h FROM h ORDER BY h ASC LIMIT {k})
        ), exact AS (SELECT count(*) AS n_exact FROM h)
        SELECT k_used::INT AS k_used, kth_min_hash,
               ((k_used - 1) * {HASH_DOMAIN} // kth_min_hash)::BIGINT AS n_est,
               n_exact,
               CAST(round((((k_used - 1) * {HASH_DOMAIN} // kth_min_hash)
                    - n_exact) / n_exact, 4) AS DOUBLE) AS rel_err
        FROM kth CROSS JOIN exact
    """


#: Count-min layout: d independent salted h32 rows, power-of-two width.
CMS_DEPTH = 4
CMS_WIDTH = 1024


def countmin_audit(documents: DataFrame, k: int = 20) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan '05) point-estimate audit:
    build a CMS_DEPTH x CMS_WIDTH sketch of corpus token counts, then for
    the top-``k`` tokens by exact count report exact vs CMS estimate.
    Deterministic throughout (salted portable h32 -> bucket), so the
    one-sided error guarantee est >= exact is oracle-checkable exactly.

    Scale shape: the sketch build is ONE partial-aggregable groupBy over
    (row, bucket) pairs — 4 narrow integer rows per token occurrence, map-
    side combinable down to <= d*w cells per partition regardless of input
    size (the mergeable-summary property that makes CMS distributable);
    the probe side is a broadcast of k tokens against the tiny cell table.
    """
    tok = H.spark_tokens("text")
    # aggregate to exact per-token counts FIRST: the d salted hashes then
    # run once per DISTINCT token (vocabulary-sized), not once per
    # occurrence — cell values are identical because a bucket's count is
    # the sum of its tokens' occurrence counts. The exact-count relation
    # is also the probe side, so one shuffle feeds both.
    counts = (
        spread(documents)
        .selectExpr(f"explode({tok}) as token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .persist()
    )
    buckets = ", ".join(
        f"named_struct('d', {d}, 'bucket', "
        + H.spark_h32(f"concat('cms{d}:', token)")
        + f" % {CMS_WIDTH})"
        for d in range(CMS_DEPTH)
    )
    cells = (
        counts.selectExpr("exact_n", f"explode(array({buckets})) as c")
        .groupBy("c.d", "c.bucket")
        .agg(F.sum("exact_n").alias("cell_n"))
    )
    top = counts.orderBy(F.col("exact_n").desc(), F.col("token").asc()).limit(k)
    probe = top.selectExpr(
        "token",
        "exact_n",
        f"explode(array({buckets})) as c",
    ).selectExpr("token", "exact_n", "c.d as d", "c.bucket as bucket")
    return (
        cells.join(F.broadcast(probe), ["d", "bucket"])
        .groupBy("token", "exact_n")
        .agg(F.min("cell_n").alias("est_n"))
        .select("token", "exact_n", "est_n")
    )
