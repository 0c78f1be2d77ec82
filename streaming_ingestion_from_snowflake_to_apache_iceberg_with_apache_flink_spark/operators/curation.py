"""End-to-end corpus curation: the composed training-data pipeline.

This is the query a user of this engine actually runs over a raw crawl:
language-ID → quality gate → exact + near-dup removal → per-doc token
stats for the survivors. Every stage is one of the engine's own operators
(operators.text, operators.dedup), composed as DataFrames — so the whole
pipeline is a single Catalyst plan, and the oracle SQL composes the same
stages' oracle queries verbatim.

Scale shape: the dedup leg (content-hash agg + inverted-index join) is the
heavy path and is bounded as documented in operators.dedup; the text legs
are pure per-row projections fused into the scans; the final assembly is
doc_id-keyed equi-joins — every shuffle is on the doc key, no broadcast of
anything corpus-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_corpus
from .text import lang_id, quality_score


def curate_corpus(
    documents: DataFrame,
    quality_min: float = 0.38,
    langs: Sequence[str] = ("en",),
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int = 100,
    survivors: DataFrame | None = None,
) -> DataFrame:
    """Surviving doc_ids with language, quality, and token stats.

    A document survives iff it (a) survives ``dedup_corpus`` (exact dups
    and the higher id of every near-dup pair die), (b) scores at least
    ``quality_min``, and (c) its predicted language is in ``langs``.

    ``survivors`` injects an already-materialized ``dedup_corpus`` result
    (the dedup leg is the expensive pass; the composed pipeline and the
    standalone dedup query share one checkpointed copy).
    """
    if survivors is None:
        survivors = dedup_corpus(documents, n, threshold, max_shingle_df)
    quality = quality_score(documents).select(
        "doc_id", "n_tokens", "uniq_ratio", "quality"
    )
    lang = lang_id(documents).select("doc_id", "predicted_lang")
    return (
        survivors.join(quality, "doc_id")
        .join(lang, "doc_id")
        .filter(
            (F.col("quality") >= quality_min)
            & F.col("predicted_lang").isin(*langs)
        )
        .select("doc_id", "predicted_lang", "n_tokens", "uniq_ratio", "quality")
    )


def keep_best_per_cluster(
    documents: DataFrame, pairs: DataFrame | None = None
) -> DataFrame:
    """Canonical-document selection: cluster the near-dup graph (connected
    components over exact-Jaccard pairs) and keep, per cluster, the
    highest-quality member — the curation decision naive min-id dedup gets
    wrong (it keeps an arbitrary copy; this keeps the best one).

    One row per multi-doc cluster: the kept doc, its quality, and how many
    near-copies it displaces. Singletons (docs with no near-dup edge) need
    no decision and are excluded by construction. Scale shape: the CC leg
    is the bounded iterative loop of ``connected_components``; quality is
    a per-row projection computed ONLY for clustered docs (the cluster
    membership — a sliver of the corpus — broadcast-semi-joins the corpus
    first, so the tokenize/score pass never touches the non-duplicated
    bulk); the argmax is one ``row_number`` window over the cluster key.

    ``pairs`` lets callers that already materialized the near-dup pair
    graph (the graph-metric battery shares one checkpointed copy) skip
    the shingle-index self-join — the corpus-sized leg.
    """
    from pyspark.sql import Window

    from .dedup import connected_components, ngram_jaccard_pairs

    if pairs is None:
        pairs = ngram_jaccard_pairs(documents)
    clusters = connected_components(pairs)
    in_cluster = documents.join(
        F.broadcast(clusters.select("doc_id")), "doc_id", "left_semi"
    )
    quality = quality_score(in_cluster).select("doc_id", "quality")
    joined = clusters.join(quality, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("quality").alias("kept_quality"),
            "cluster_size",
            (F.col("cluster_size") - F.lit(1)).alias("n_dropped"),
        )
    )


def decontaminate(
    documents: DataFrame, n: int = 8, eval_mod: int = 20
) -> DataFrame:
    """Benchmark decontamination: documents with ``doc_id % eval_mod == 0``
    form the held-out eval set; every training document sharing at least
    one word ``n``-gram with any eval document is flagged (the standard
    n-gram-overlap decontamination used for LLM training corpora). Output:
    one row per TRAINING doc with the count of distinct shared n-grams and
    the contamination flag.

    Scale shape: n-grams are hashed to bigints before the join (narrow
    shuffle keys); the eval side is a tiny distinct set — Spark broadcasts
    it under AQE so the training explode never shuffles; the per-doc hit
    count is a partial-aggregable groupBy on doc_id.
    """
    from .dedup import _hashed_shingles

    grams = _hashed_shingles(documents, n).selectExpr(
        "doc_id", "explode(shingles) as g"
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % eval_mod == 0).select("g").distinct()
    )
    train = grams.filter(F.col("doc_id") % eval_mod != 0)
    hits = (
        train.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    base = documents.filter(F.col("doc_id") % eval_mod != 0).select("doc_id")
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def split_leakage(documents: DataFrame, n: int = 8) -> DataFrame:
    """Eval-leakage audit across the standard content-hash train/val/test
    split: for each held-out split, the fraction of its documents sharing
    at least one word ``n``-gram with ANY training document — the leakage
    a per-document hash split cannot prevent (near-duplicate documents
    hash to different splits), and the number that decides whether a
    decontamination pass must run before the eval set is trusted.

    Scale shape: n-grams are hashed bigints; the train-side distinct gram
    set is the only relation crossing the held-out explode (semi-join —
    broadcast under AQE while it fits, hash join beyond); per-split
    counters aggregate doc-level flags, so nothing row-level survives
    past the distinct. Doc counts come from the labeled corpus itself, so
    shingle-less short docs still count in the denominator.
    """
    from .dedup import _hashed_shingles
    from .sampling import hash_split

    labeled = hash_split(documents.select("doc_id"), "doc_id")
    grams = _hashed_shingles(documents, n).selectExpr(
        "doc_id", "explode(shingles) as g"
    )
    # split is a pure hash expression of doc_id — evaluate it on the
    # gram rows instead of joining the label relation onto the exploded
    # corpus (round 12, guide §2.4: that join shuffled every gram row to
    # attach a label computable in-place; same labels by construction)
    lg = hash_split(grams, "doc_id")
    train_g = lg.filter(F.col("split") == "train").select("g").distinct()
    leaked = (
        lg.filter(F.col("split") != "train")
        .join(train_g, "g", "left_semi")
        .select("doc_id", "split")
        .distinct()
    )
    base = (
        labeled.filter(F.col("split") != "train")
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    lk = leaked.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_leaked")
    )
    return base.join(lk, "split", "left").select(
        "split",
        "n_docs",
        F.coalesce("n_leaked", F.lit(0)).cast("bigint").alias("n_leaked"),
        F.round(
            F.coalesce("n_leaked", F.lit(0)) / F.col("n_docs"), 6
        ).alias("leak_rate"),
    )


def dsir_weights(
    documents: DataFrame,
    target_lang: str = "en",
    buckets: int = 1024,
    k: int = 50,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169): score every raw document by how much more likely
    its hashed-unigram features are under the TARGET distribution (here
    the ``target_lang`` slice) than under the raw corpus, and keep the
    top-``k``.  The published recipe exactly: hashed n-gram bag-of-words
    features, two Laplace-smoothed categorical distributions, per-doc
    importance weight ``log w = Σ_b c_b·(ln p̂_t[b] − ln p̂_r[b])``.

    Exactness: the smoothed probabilities are exact integer ratios
    (``(cnt+1)`` over ``(total+B)``), ``ln`` is taken of those integers
    only, and the weight is rounded to 4 decimals BEFORE ranking
    (rounded-then-ranked, the engine convention for transcendental
    outputs); ties break on doc_id.

    Scale shape: two passes over the token stream.  Pass 1 folds BOTH
    distributions in one partial agg (conditional count per bucket —
    B-row result).  Pass 2 re-joins the B-row per-bucket delta table
    BROADCAST onto the stream and partial-aggregates per doc; the top-k
    is ``orderBy().limit(k)`` (TakeOrderedAndProject), never a global
    window.  Nothing corpus-sized crosses the driver or a broadcast.
    """
    from ..functions import hashing as H

    occ = documents.selectExpr(
        "doc_id",
        "lang",
        f"explode({H.spark_tokens('text')}) as token",
    ).selectExpr(
        "doc_id",
        "lang",
        f"pmod({H.spark_h32('token')}, {buckets}) as bucket",
    )
    per_bucket = occ.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_c"),
        F.sum(
            F.when(F.col("lang") == target_lang, 1).otherwise(0)
        ).alias("t_c"),
    )
    totals = per_bucket.agg(
        F.sum("raw_c").alias("raw_tot"), F.sum("t_c").alias("t_tot")
    )
    delta = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("t_c") + 1).cast("double"))
            - F.log((F.col("t_tot") + F.lit(buckets)).cast("double"))
            - F.log((F.col("raw_c") + 1).cast("double"))
            + F.log((F.col("raw_tot") + F.lit(buckets)).cast("double"))
        ).alias("delta"),
    )
    scored = (
        occ.join(F.broadcast(delta), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.round(F.sum("delta"), 4).alias("log_w"),
        )
    )
    return (
        scored.orderBy(F.col("log_w").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "lang", "n_tokens", "log_w")
    )


def duck_dsir_sql(
    target_lang: str = "en", buckets: int = 1024, k: int = 50
) -> str:
    """Oracle twin of :func:`dsir_weights` — same hashed buckets, same
    integer-ratio smoothing, same rounded-then-ranked top-k."""
    from ..functions import hashing as H

    toks = H.duck_tokens("text")
    return f"""
        WITH occ AS (
            SELECT doc_id, lang,
                   {H.duck_h32('token')} % {buckets} AS bucket
            FROM (
                SELECT doc_id, lang, unnest({toks}) AS token
                FROM documents
            )
        ), per_bucket AS (
            SELECT bucket, count(*) AS raw_c,
                   sum(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END)
                       AS t_c
            FROM occ GROUP BY bucket
        ), tot AS (
            SELECT sum(raw_c) AS raw_tot, sum(t_c) AS t_tot FROM per_bucket
        ), delta AS (
            SELECT bucket,
                   ln((t_c + 1)::DOUBLE) - ln((t_tot + {buckets})::DOUBLE)
                   - ln((raw_c + 1)::DOUBLE)
                   + ln((raw_tot + {buckets})::DOUBLE) AS delta
            FROM per_bucket CROSS JOIN tot
        ), scored AS (
            SELECT doc_id, lang, CAST(count(*) AS INT) AS n_tokens,
                   round(sum(delta), 4) AS log_w
            FROM occ JOIN delta USING (bucket)
            GROUP BY doc_id, lang
        )
        SELECT doc_id, lang, n_tokens, log_w
        FROM scored ORDER BY log_w DESC, doc_id ASC LIMIT {k}
    """
