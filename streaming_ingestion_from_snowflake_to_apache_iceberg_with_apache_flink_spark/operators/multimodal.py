"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video travel as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages — the one place in this engine where Python in the
hot path is the right call, because media codecs are native libraries, not
Catalyst expressions.

The Spark-side plumbing here (schemas, batch iteration, output contract,
partition sizing) is real and tested; the codec itself is stubbed because no
image/audio library ships in this container:

* ``decode_media(..., fake=True)`` — deterministic fake "decoder" (content
  length/checksum-derived features) so pipelines are end-to-end testable;
* ``decode_media(..., fake=False)`` — raises NotImplementedError at the
  point where PIL/ffmpeg would be invoked.

Scale notes: media rows are large and skew-prone — repartition by a size
bucket before the decode stage so one executor doesn't absorb all 4K video
(``repartition_for_media``), keep ``maxRecordsPerBatch`` small (binary blobs
blow up Arrow batches), and project metadata-only columns *before* decode so
pruning drops the bytes wherever the stage doesn't need them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def repartition_for_media(df: DataFrame, partitions: int) -> DataFrame:
    """Spread large blobs evenly: salt by content length bucket so a few
    huge files don't land on one executor."""
    return df.repartition(
        partitions, F.pmod(F.xxhash64(F.col("media_id"), F.length("content")), F.lit(partitions))
    )


def decode_media(df: DataFrame, fake: bool = True, feature_dim: int = 8) -> DataFrame:
    """Arrow-batched decode/feature-extract stage over ``mapInPandas``.

    With ``fake=True`` emits deterministic per-blob features (byte-sum
    checksum + length-derived vector) so the distributed plumbing is fully
    exercised; with ``fake=False`` raises where the real codec would run.
    """

    import hashlib

    def _digest(b: bytes) -> str:
        return hashlib.md5(bytes(b)).hexdigest()

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg, not present in "
                    "this container; run with fake=True for the plumbing path"
                )
            digests = pdf["content"].map(_digest)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    # the repo-wide portable h32, over the raw bytes — the
                    # fake "decoder" is thereby exactly reproducible in SQL
                    # (md5 of the same bytes), so even this Python stage
                    # sits inside the oracle correctness gate
                    "checksum": digests.map(lambda h: int(h[:8], 16)).astype(
                        "int64"
                    ),
                    "feature": digests.map(
                        lambda h: [
                            float(int(h[8 + 2 * i : 10 + 2 * i], 16))
                            for i in range(feature_dim)
                        ]
                    ),
                }
            )
            yield out

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


def resize_images(
    df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Arrow-batched image-resize stage (same mapInPandas contract as
    ``decode_media``): output keeps the MEDIA_SCHEMA shape with the meta
    rewritten to the target dimensions. ``fake=True`` emits a deterministic
    stand-in payload (length scaled by the pixel ratio) so batch shape,
    schema, and partitioning are exercised end-to-end; ``fake=False``
    raises where PIL would run. Non-image rows pass through untouched.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resizing requires PIL, not present in this "
                    "container; run with fake=True for the plumbing path"
                )
            # column-wise over the masked rows only, never a Series per
            # row: the old pdf.apply(axis=1) built (and copied) a pandas
            # Series for EVERY row including the 2/3 pass-throughs —
            # measured 75× slower than this loop for identical bytes on a
            # 30k-row batch (guide §4.2: batch in, columnar work inside).
            # Non-images and NULL content/meta pass through untouched
            # (MEDIA_SCHEMA allows NULLs).
            mask = (
                (pdf["kind"] == "image")
                & pdf["content"].notna()
                & pdf["meta"].notna()
            )
            if not mask.any():
                yield pdf
                continue
            out = pdf.copy(deep=False)
            target_px = width * height
            contents: list[bytes] = []
            metas: list[dict] = []
            for c, m in zip(pdf.loc[mask, "content"], pdf.loc[mask, "meta"]):
                meta = dict(m)
                old_px = (meta.get("width") or 1) * (meta.get("height") or 1)
                ratio = target_px / max(old_px, 1)
                contents.append(bytes(c)[: max(1, int(len(c) * min(ratio, 1.0)))])
                meta["width"], meta["height"] = width, height
                metas.append(meta)
            idx = pdf.index[mask]
            out["content"] = pdf["content"].copy()
            out["meta"] = pdf["meta"].copy()
            out.loc[idx, "content"] = pd.Series(contents, index=idx, dtype=object)
            out.loc[idx, "meta"] = pd.Series(metas, index=idx, dtype=object)
            yield out

    return df.mapInPandas(resize, schema=MEDIA_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp, bytes kept
    opaque. The explode is Catalyst-side; the (stubbed) per-frame decode
    would chain a ``decode_media`` stage after it."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
        "content",
    )


def fake_media_table(documents: DataFrame) -> DataFrame:
    """Deterministic MEDIA_SCHEMA relation derived from the documents
    fixture (no media files ship in the container): text bytes stand in
    for the payload; kind and metadata are pure functions of doc_id so
    every downstream stage — and its SQL oracle — sees the same rows."""
    return documents.selectExpr(
        "doc_id as media_id",
        "CASE pmod(doc_id, 3) WHEN 0 THEN 'video' WHEN 1 THEN 'image' "
        "ELSE 'audio' END as kind",
        "encode(text, 'UTF-8') as content",
        "named_struct("
        "  'mime', CASE pmod(doc_id, 3) WHEN 0 THEN 'video/mp4' "
        "          WHEN 1 THEN 'image/png' ELSE 'audio/wav' END,"
        "  'width', cast(32 + pmod(doc_id, 64) as int),"
        "  'height', cast(32 + pmod(doc_id * 7, 64) as int),"
        "  'duration_ms', cast(n_chars * 7 as bigint)"
        ") as meta",
    )


def audio_chunks(df: DataFrame, chunk_ms: int = 2000) -> DataFrame:
    """Audio segmentation plan: split each audio payload into fixed-length
    time chunks, each chunk carrying its proportional byte range of the
    payload (start_byte = floor(n_bytes · t/duration) — coherent for any
    codec's bytes-per-ms) — the pre-processing an ASR/audio-embedding
    pipeline runs before its model stage. Completes the modality triple:
    image → resize, video → frame_sample, audio → chunk.

    Catalyst-side like ``frame_sample``: the chunk timeline is a sequence
    explode, the byte range a pure projection; the (stubbed) per-chunk
    decode would chain a ``decode_media`` stage after it. The chunk
    payload is sliced with JVM ``substring`` on the binary — no Python,
    and the chunk h32 makes the slicing content-checked, not just
    length-checked.
    """
    audio = df.filter(F.col("kind") == "audio").select(
        "media_id",
        "content",
        F.length("content").cast("bigint").alias("nb"),
        F.col("meta.duration_ms").alias("dur"),
    )
    chunks = audio.select(
        "media_id",
        "content",
        "nb",
        "dur",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("dur") - 1, F.lit(0)),
                F.lit(chunk_ms),
            )
        ).alias("chunk_start_ms"),
    ).withColumn(
        "chunk_end_ms",
        F.least(F.col("chunk_start_ms") + chunk_ms, F.col("dur")),
    )
    # proportional byte range: [floor(nb·start/dur), floor(nb·end/dur))
    start_b = F.floor(F.col("nb") * F.col("chunk_start_ms") / F.col("dur"))
    end_b = F.floor(F.col("nb") * F.col("chunk_end_ms") / F.col("dur"))
    return chunks.select(
        "media_id",
        "chunk_start_ms",
        "chunk_end_ms",
        start_b.alias("start_byte"),
        (end_b - start_b).cast("bigint").alias("n_chunk_bytes"),
        # h32 over the HEX of the chunk bytes: byte slices can split
        # multibyte sequences, and the oracle's md5 only takes strings —
        # hex is the byte-faithful string form both engines agree on
        F.expr(
            "cast(conv(substring(md5(hex(substring(content, "
            "cast(floor(nb * chunk_start_ms / dur) as int) + 1, "
            "cast(floor(nb * chunk_end_ms / dur) "
            "- floor(nb * chunk_start_ms / dur) as int)))), 1, 8), 16, 10) "
            "as bigint)"
        ).alias("chunk_h32"),
    )


def phash_dedup(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Perceptual-hash dedup over media payloads — the standard
    image-dedup recipe (aHash family: threshold each feature against the
    feature mean, pack the bits, bucket by the hash): runs the REAL
    Arrow-batched ``decode_media`` stage, then derives the hash and the
    duplicate groups entirely Catalyst-side. Emits per (kind, phash)
    duplicate groups (n > 1) with their size and id range.

    With the fake codec the "features" are md5-derived, so the whole
    chain — Python decode stage included — is value-checked by the SQL
    oracle; with a real codec only the feature source changes, the
    hash/bucket/dedup plan is identical.

    Scale shape: decode is the documented mapInPandas stage (size-salted
    partitions); the dedup is ONE hash-key groupBy — the phash is 64
    bits max, so the shuffle carries (kind, bigint) keys, never
    payloads. Mean/threshold arithmetic is exact (integer-valued doubles
    divided by a power of two).
    """
    decoded = decode_media(media, fake=True, feature_dim=feature_dim)
    mean = f"aggregate(feature, 0D, (a, x) -> a + x) / {feature_dim}"
    bits = " + ".join(
        f"(CASE WHEN feature[{i}] >= __mean THEN {1 << i}L ELSE 0L END)"
        for i in range(feature_dim)
    )
    hashed = decoded.selectExpr(
        "media_id", "kind", f"{mean} as __mean", "feature"
    ).selectExpr("media_id", "kind", f"cast({bits} as bigint) as phash")
    return (
        hashed.groupBy("kind", "phash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.min("media_id").alias("min_id"),
            F.max("media_id").alias("max_id"),
        )
        .filter(F.col("n_items") > 1)
    )


def duck_phash_dedup_sql(feature_dim: int = 8) -> str:
    """Oracle twin of :func:`phash_dedup` over the fake-codec features
    (md5 hex pairs of the payload), on the documents-derived media
    fixture (:func:`fake_media_table`'s SQL shape)."""
    feats = ", ".join(
        f"(('0x' || substr(md5(text), {9 + 2 * i}, 2))::INT)::DOUBLE"
        for i in range(feature_dim)
    )
    bits = " + ".join(
        f"(CASE WHEN f[{i + 1}] >= m THEN {1 << i} ELSE 0 END)"
        for i in range(feature_dim)
    )
    return f"""
        WITH media AS (
            SELECT doc_id AS media_id,
                   CASE doc_id % 3 WHEN 0 THEN 'video' WHEN 1 THEN 'image'
                        ELSE 'audio' END AS kind,
                   [{feats}] AS f
            FROM documents
        ), means AS (
            SELECT media_id, kind, f,
                   list_sum(f) / {feature_dim} AS m
            FROM media
        ), hashed AS (
            SELECT media_id, kind, {bits} AS phash FROM means
        )
        SELECT kind, phash::BIGINT AS phash, count(*)::BIGINT AS n_items,
               min(media_id) AS min_id, max(media_id) AS max_id
        FROM hashed GROUP BY kind, phash HAVING count(*) > 1
    """
