"""Text analysis for training-data pipelines: token counting, per-language
corpus stats, language ID, quality scoring, and document fingerprinting.

All operators are single-pass Catalyst projections/aggregations over the
``documents`` table — no Python in the hot path, so at 100 TB each is one
parquet scan (+ one partial-agg shuffle where grouped). Each has an exact
DuckDB oracle twin in ``__spark_entry__`` built from the same expression
generators (functions.hashing), so "heuristic" does not mean "unchecked".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions.partitioning import spread

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deterministic and mirrored into the oracle SQL; real corpora
#: would load fastText-style profiles, but the *plan shape* (array_intersect
#: against broadcast literal arrays) is the production one.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "ich", "ein", "zu", "mit"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du", "est", "que"),
    "zh": ("的", "了", "是", "我", "不", "在", "有", "他", "这", "就"),
}

_TOKENS = H.spark_tokens("text")


def token_count(documents: DataFrame) -> DataFrame:
    """Whitespace + distinct token counts per document."""
    return documents.selectExpr(
        "doc_id",
        f"size({_TOKENS}) as n_tokens",
        f"size(array_distinct({_TOKENS})) as n_uniq_tokens",
        f"cast(round(size(array_distinct({_TOKENS})) / size({_TOKENS}), 4) as double)"
        " as uniq_ratio",
    )


#: Explicit whitespace class shared by both engines. Java's ``\s`` includes
#: vertical tab (\x0B) while RE2's does not — spelling the class out is the
#: only way the pattern means the same thing in Spark and DuckDB.
WS = r" \t\n\x0B\f\r"

#: Non-alphanumeric single-mark class (punct) on the shared WS definition.
NONWORD = rf"[^A-Za-z0-9{WS}]"

#: BPE-ish pre-tokenization pattern (the GPT-2-style split reduced to the
#: regex subset Java regex and RE2 treat identically): letter runs, digit
#: runs, and single non-alphanumeric marks each become one token.
BPE_ISH = rf"[A-Za-z]+|[0-9]+|{NONWORD}"


def token_classes(documents: DataFrame) -> DataFrame:
    """Per-document BPE-ish token counts by class (letters/digits/punct).

    Whitespace counting (``token_count``) approximates words; this is the
    pre-tokenizer a BPE vocabulary would consume, so its count tracks LLM
    token budgets far more closely. One Catalyst projection, no UDF."""
    text = F.col("text")
    return documents.select(
        "doc_id",
        F.size(F.regexp_extract_all(text, F.lit(BPE_ISH), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
        F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+"), F.lit(0))).alias(
            "n_words"
        ),
        F.size(F.regexp_extract_all(text, F.lit(r"[0-9]+"), F.lit(0))).alias(
            "n_numbers"
        ),
        F.size(F.regexp_extract_all(text, F.lit(NONWORD), F.lit(0))).alias(
            "n_punct"
        ),
    )


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-language corpus stats (the q_text_stats contract)."""
    toks = documents.selectExpr("lang", "n_chars", f"size({_TOKENS}) as n_tokens")
    return toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def lang_scores(documents: DataFrame) -> DataFrame:
    """Stopword-hit score per candidate language (distinct-token hits)."""
    cols = ["doc_id", "lang"]
    for lang, words in STOPWORDS.items():
        lit = ", ".join(f"'{w}'" for w in words)
        cols.append(
            f"size(array_intersect(array_distinct({_TOKENS}), array({lit})))"
            f" as score_{lang}"
        )
    return documents.selectExpr(*cols)


def lang_id(documents: DataFrame) -> DataFrame:
    """Predicted language = argmax stopword score, ties broken by language
    code order (deterministic)."""
    scored = lang_scores(documents)
    langs = sorted(STOPWORDS)
    pred = "CASE"
    for lang in langs:
        others = [f"score_{o}" for o in langs if o != lang]
        cond = " AND ".join(f"score_{lang} >= {o}" for o in others)
        pred += f" WHEN {cond} THEN '{lang}'"
    pred += " ELSE 'und' END"
    return scored.selectExpr(
        "doc_id", "lang", *[f"score_{lang}" for lang in langs], f"{pred} as predicted_lang"
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Length / stopword-ratio / repetition quality heuristic, 0..1-ish.

    quality = 0.4·min(tokens/100, 1) + 0.3·uniq_ratio + 0.3·stopword_ratio
    (the classic Gopher/C4-style shape: enough length, lexical diversity,
    enough function words).
    """
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return documents.selectExpr(
        "doc_id",
        "lang",
        f"size({_TOKENS}) as n_tokens",
        f"cast(round(size(array_distinct({_TOKENS})) / size({_TOKENS}), 4) as double)"
        " as uniq_ratio",
        f"cast(round(size(filter({_TOKENS}, t -> t in ({en}))) / size({_TOKENS}), 4)"
        " as double) as stopword_ratio",
    ).selectExpr(
        "doc_id",
        "lang",
        "n_tokens",
        "uniq_ratio",
        "stopword_ratio",
        # the weighted sum of 4-decimal ratios is an exact multiple of 1e-5,
        # so rounding at 4 decimals would sit on the half-way boundary and
        # flip between engines; 6 decimals is boundary-free.
        "cast(round(0.4 * least(n_tokens / 100.0, 1.0) + 0.3 * uniq_ratio"
        " + 0.3 * stopword_ratio, 6) as double) as quality",
    )


def fingerprint(documents: DataFrame, n: int = 3, keep: int = 4) -> DataFrame:
    """Min-k document fingerprint: the ``keep`` smallest portable 32-bit
    hashes of the distinct word ``n``-gram shingles (winnowing-style
    content signature; stable under small edits)."""
    sh = H.spark_shingles("toks", n)
    hashes = f"array_sort(transform({sh}, s -> {H.spark_h32('s')}))"
    return (
        spread(documents)
        .selectExpr("doc_id", f"{_TOKENS} as toks")
        .selectExpr(
            "doc_id",
            f"array_join(slice({hashes}, 1, {keep}), '-') as fingerprint",
        )
    )


def vocab(documents: DataFrame, k: int = 100) -> DataFrame:
    """Corpus vocabulary: top-``k`` lowercased whitespace tokens by
    frequency (ties broken lexically) — the first step of any tokenizer /
    BPE training run over a corpus.

    Scale shape: explode → groupBy is ONE shuffle with map-side partial
    counts (token cardinality, not row count, crosses the wire); the
    top-k is TakeOrderedAndProject — each partition keeps k rows and the
    driver merges, never a global sort.
    """
    toks = F.expr(H.spark_tokens("lower(text)"))
    return (
        documents.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(k)
    )


#: Deterministic lexicon for lexicon-based sentiment scoring (PAPERS.md:
#: "Large Scale Sentiment Analysis on Twitter with Spark", EDBT 2016 —
#: the standard distributed formulation: per-doc token-lexicon matching,
#: a pure projection, no model weights). Tuned to the fixture vocabulary.
POS_WORDS = ("fast", "big")
NEG_WORDS = ("slow", "small", "dup")


def sentiment(documents: DataFrame) -> DataFrame:
    """Lexicon sentiment per document: polarity = (pos-neg)/(pos+neg)
    token counts (with multiplicity), label by sign.

    The polarity is an UNROUNDED IEEE division of two small integers —
    both engines compute bit-identical doubles, so the oracle matches
    exactly without any rounding-boundary exposure. One codegen'd
    projection over the scan; no shuffle.
    """
    pos = ", ".join(f"'{w}'" for w in POS_WORDS)
    neg = ", ".join(f"'{w}'" for w in NEG_WORDS)
    return documents.selectExpr(
        "doc_id",
        f"size(filter({_TOKENS}, t -> t in ({pos}))) as n_pos",
        f"size(filter({_TOKENS}, t -> t in ({neg}))) as n_neg",
    ).selectExpr(
        "doc_id",
        "n_pos",
        "n_neg",
        "cast((n_pos - n_neg) / greatest(n_pos + n_neg, 1) as double)"
        " as polarity",
        "CASE WHEN n_pos > n_neg THEN 'pos'"
        " WHEN n_neg > n_pos THEN 'neg' ELSE 'neutral' END as label",
    )


def normalize_text(documents: DataFrame) -> DataFrame:
    """Canonical text cleanup: lowercase, trim, collapse whitespace runs
    to single spaces (the standard pre-dedup normalization pass — exact
    dedup over normalized text catches case/spacing-only copies). Pure
    projection; the `changed` flag lets a pipeline count normalization
    impact without a second diff pass."""
    # DataFrame-API regexp_replace: the pattern string reaches the regex
    # engine verbatim (a selectExpr SQL literal would eat the backslashes
    # in the WS class — '\\f' ⇒ literal 'f' — and corrupt text).
    # Collapse BEFORE trim: trim strips only ASCII spaces, so collapsing
    # first turns trailing tab/newline runs into one space trim can see.
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), f"[{WS}]+", " "))
    return documents.select(
        "doc_id",
        norm.alias("norm_text"),
        (norm != F.col("text")).cast("boolean").alias("changed"),
    )


def bigram_topk(documents: DataFrame, k: int = 100, n: int = 2) -> DataFrame:
    """Top-``k`` word n-grams by DOCUMENT frequency (how many docs contain
    the n-gram at least once — the shingle sets are distinct per doc).
    Same explode → partial-agg → TakeOrderedAndProject shape as ``vocab``;
    the shingle sets are distinct per doc, so each phrase string crosses
    the map-side partial agg once per containing doc."""
    sh = H.spark_shingles("t", n)
    return (
        documents.selectExpr(f"{_TOKENS} as t")
        .selectExpr(f"explode({sh}) as ngram")
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("ngram").asc())
        .limit(k)
    )


def bpe_pair_counts(documents: DataFrame, k: int = 100) -> DataFrame:
    """Top-``k`` adjacent character pairs by corpus-weighted frequency —
    the merge-candidate statistic of one BPE tokenizer-training iteration
    (the pair with the highest count is the next merge rule).

    Scale shape: the corpus collapses to its word-frequency table FIRST
    (one partial-agg shuffle on the token; the vocabulary is orders of
    magnitude smaller than the token stream), then pairs explode from the
    *vocabulary* weighted by frequency — the classic trick that makes BPE
    training corpus-size-independent after the first count. Top-k is
    TakeOrderedAndProject, never a full sort.
    """
    words = (
        documents.selectExpr(f"explode({_TOKENS}) as w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.selectExpr(
        "freq",
        "explode(transform(sequence(1, length(w) - 1), "
        "i -> substring(w, i, 2))) as pair",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(k)
    )


def tfidf_topk(documents: DataFrame, k: int = 5) -> DataFrame:
    """Top-``k`` TF-IDF terms per document (log-free inverse document
    frequency ``N / df`` so the score is an exact rational — cross-engine
    value-checkable without trusting two libm ``ln`` implementations).

    Plan shape: one explode feeds BOTH aggregations — tf is a partial-agg
    groupBy(doc_id, token); df re-aggregates the tf table (already one row
    per doc×token, so ``count(*)`` IS document frequency) — then the small
    vocabulary side is broadcast back onto the tf table and the per-doc
    top-k is a WindowGroupLimit, truncated map-side before the final
    shuffle. At 100 TB the vocab table stays small relative to the corpus
    (Heaps' law), so the broadcast holds; if it doesn't, drop the hint and
    AQE picks a shuffle join."""
    tf = (
        documents.selectExpr("doc_id", f"explode({_TOKENS}) as token")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = documents.select(F.count(F.lit(1)).alias("n_docs"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.col("n_docs") / F.col("df"), 6),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "df", "score", "rank")
    )


def repetition_stats(documents: DataFrame, n: int = 3, flag_at: float = 0.7) -> DataFrame:
    """Gopher-style repetition signals per document: the fraction of tokens
    that are repeats of an earlier token, and the fraction of word
    ``n``-grams that are repeats of an earlier n-gram. High values mark
    boilerplate/spam for a curation gate (Rae et al. 2021 use the same
    duplicate-line/-ngram fractions). Pure projection — one scan, ratios
    are exact rationals rounded at 6 (multiples of 1/n_tokens)."""
    # tokenize ONCE, materialize the gram array once — the naive inline
    # form re-ran split()/transform() per output column (6× the work)
    grams = (
        f"transform(sequence(1, greatest(size(t) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(t, i, {n})))"
    )
    return (
        documents.selectExpr("doc_id", f"{_TOKENS} as t")
        .selectExpr(
            "doc_id",
            "size(t) as n_tokens",
            "size(array_distinct(t)) as n_uniq",
            f"{grams} as g",
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "n_uniq",
            "size(g) as n_g",
            "size(array_distinct(g)) as n_g_uniq",
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "cast(round((n_tokens - n_uniq) / n_tokens, 6) as double)"
            " as dup_token_ratio",
            "cast(round((n_g - n_g_uniq) / n_g, 6) as double)"
            " as dup_ngram_ratio",
            f"(n_tokens - n_uniq) / n_tokens > {flag_at} as repetitive",
        )
    )


def chunk_documents(
    documents: DataFrame, chunk_tokens: int = 32, stride: int = 24
) -> DataFrame:
    """Token-window chunking for training-sequence construction: each doc
    yields overlapping windows of ``chunk_tokens`` tokens every ``stride``
    tokens (stride < chunk_tokens ⇒ context overlap, the usual LM packing
    prep). Emits the chunk's portable h32 so content — not just shape — is
    oracle-checked.

    Scale shape: posexplode(sequence) is a generator inside the same stage
    as the scan (no shuffle at all); output rows ≈ rows × n_tokens/stride.
    """
    if stride < 1 or chunk_tokens < 1:
        raise ValueError(f"chunk_tokens/stride must be >= 1: {chunk_tokens}/{stride}")
    n_starts = "cast(ceil(size(tk) / {0}.0) as int)".format(stride)
    chunk = f"concat_ws(' ', slice(tk, chunk_id * {stride} + 1, {chunk_tokens}))"
    return (
        documents.selectExpr("doc_id", f"{_TOKENS} as tk")
        .selectExpr(
            "doc_id",
            "tk",
            "size(tk) as n_tokens",
            f"explode(sequence(0, {n_starts} - 1)) as chunk_id",
        )
        .selectExpr(
            "doc_id",
            "cast(chunk_id as int) as chunk_id",
            f"cast(chunk_id * {stride} as int) as start_tok",
            f"cast(least({chunk_tokens}, n_tokens - chunk_id * {stride}) as int)"
            " as chunk_len",
            H.spark_h32(chunk) + " as chunk_h32",
        )
    )


def unigram_lm_score(documents: DataFrame) -> DataFrame:
    """Unigram language-model plausibility score per doc: the mean corpus
    frequency of the doc's tokens — the cheap LM-based quality signal
    (docs of globally-rare tokens score low, like a perplexity filter
    without the model). Exact cross-engine arithmetic: the numerator is an
    INTEGER sum of corpus counts divided once at the end, never an average
    of per-token floats (whose summation order would differ by engine).

    Plan: explode → corpus-count partial agg → broadcast the (small,
    Heaps-law) vocab back onto the token stream → integer sum per doc.
    """
    occ = documents.selectExpr("doc_id", f"explode({_TOKENS}) as token")
    counts = occ.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total_tokens"))
    return (
        occ.join(F.broadcast(counts), "token")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("sum_cnt"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.round(
                F.col("sum_cnt") / (F.col("n_tokens") * F.col("total_tokens")), 6
            ).alias("lm_score"),
        )
    )


#: PII patterns for redact_pii — the portable RE subset (no lookarounds,
#: no \d class shorthands that differ): identical match semantics in Java
#: regex (Spark) and RE2 (DuckDB).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = "[+]1-555-[0-9]{4}"


def redact_pii(documents: DataFrame) -> DataFrame:
    """PII redaction: strip emails and phone numbers from text, emitting the
    redacted text plus per-kind match counts (the audit trail a curation
    pipeline keeps). Pure row-local regexp work fused into the scan — no
    shuffle, no Python.

    The fixture corpus is synthetic word-salad with no planted PII, so the
    operator seeds each doc with deterministic contact strings derived from
    ``doc_id`` before redacting — the regexes genuinely fire and the oracle
    reproduces the exact same seeded text, redaction, and counts.
    """
    seeded = (
        "concat(text, ' contact user', cast(doc_id as string),"
        "  '@mail.example or +1-555-',"
        "  lpad(cast(pmod(doc_id, 10000) as string), 4, '0'))"
    )
    return documents.selectExpr(
        "doc_id",
        f"{seeded} as seeded",
    ).selectExpr(
        "doc_id",
        f"size(regexp_extract_all(seeded, '{EMAIL_RE}', 0)) as n_emails",
        f"size(regexp_extract_all(seeded, '{PHONE_RE}', 0)) as n_phones",
        f"regexp_replace(regexp_replace(seeded, '{EMAIL_RE}', '<EMAIL>'),"
        f" '{PHONE_RE}', '<PHONE>') as redacted",
    )


def bigram_lm(documents: DataFrame, min_count: int = 5) -> DataFrame:
    """Bigram language model table: P(w2 | w1) as the exact integer ratio
    count(w1 w2) / count(w1 *), for bigrams seen at least ``min_count``
    times — the count-based counterpart of ``unigram_lm`` and the data side
    of classic KN/Katz smoothing.

    One explode produces both the bigram and its prefix via a windowless
    pair zip; counts are two partial-agg shuffles over narrow string keys;
    the division is exact integer → double rounded at 4, portable.
    """
    pairs = documents.selectExpr(f"{_TOKENS} as t").selectExpr(
        "explode(zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
        " (a, b) -> struct(a as w1, b as w2))) as p"
    ).select("p.w1", "p.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    pre = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    return (
        big.filter(F.col("c12") >= min_count)
        .join(pre, "w1")
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            F.round(F.col("c12") / F.col("c1"), 4).alias("cond_p"),
        )
    )


def vocab_coverage(documents: DataFrame, k: int = 100) -> DataFrame:
    """Coverage of a top-``k`` corpus vocabulary per language: what
    fraction of each language's token stream the shared vocabulary
    explains — the go/no-go metric for a vocabulary size before training
    a tokenizer on a multilingual mix.

    The vocabulary is the deterministic top-k (freq desc, token asc); it
    broadcasts into the exploded token stream (corpus-sized side never
    re-shuffles), and coverage is one partial-agg per language.
    """
    occ = documents.select(
        "lang", F.explode(F.expr(H.spark_tokens("lower(text)"))).alias("token")
    ).filter(F.col("token") != "")
    top = (
        occ.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(k)
        .select("token", F.lit(1).alias("hit"))
    )
    return (
        occ.join(F.broadcast(top), "token", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("total_tokens"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("covered_tokens"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1)), 4
            ).alias("coverage"),
        )
    )


def bpe_train_merges(documents: DataFrame, rounds: int = 3) -> DataFrame:
    """BPE tokenizer TRAINING, ``rounds`` merge iterations (Sennrich et
    al. '16): start from character symbols over the word-frequency table,
    repeatedly pick the most frequent adjacent symbol pair (ties: lexical)
    and merge it greedily left-to-right corpus-wide. Returns the learned
    merge table (merge_round, left_sym, right_sym, n_occurrences) — the
    actual tokenizer artifact, not just one round's statistic.

    Representation: symbols as a DOUBLE-space-joined string ('  a  b  c  ').
    A merge is then ONE literal string replace of ' x  y ' with ' xy ':
    the pattern consumes one boundary space per side and the replacement
    restores it, so non-overlapping left-to-right replace == greedy BPE
    merge, and the double-space invariant survives — no re-normalization,
    and both engines' literal replace() agree by construction.

    Scale shape (the classic BPE trick): the corpus collapses to its
    vocabulary ONCE (one partial-agg shuffle); every round then runs over
    vocabulary-sized state — a pair count (partial agg) + a TakeOrdered
    top-1 + a map-only replace. Driver state per round = one merge rule.
    """
    spark = documents.sparkSession
    words = (
        documents.selectExpr(f"explode({_TOKENS}) as w")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("w") >= 2)
    )
    syms = words.select(
        F.concat(F.lit("  "), F.regexp_replace("w", "(.)", "$1  ")).alias("sym"),
        "freq",
    ).persist()
    rules = []
    for r in range(rounds):
        pairs = syms.selectExpr(
            "freq",
            "split(trim(sym), '  ') as l",
        ).selectExpr(
            "freq",
            "explode(transform(sequence(1, size(l) - 1), "
            "i -> named_struct('x', element_at(l, i), 'y', element_at(l, i + 1))"
            ")) as p",
        )
        top = (
            pairs.groupBy("p.x", "p.y")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("x").asc(), F.col("y").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        x, y, cnt = top[0].x, top[0].y, int(top[0].cnt)
        rules.append((r + 1, x, y, cnt))
        merged = syms.select(
            F.replace(
                F.col("sym"), F.lit(f" {x}  {y} "), F.lit(f" {x}{y} ")
            ).alias("sym"),
            "freq",
        ).persist()
        syms.unpersist()
        syms = merged
    syms.unpersist()
    return spark.createDataFrame(
        rules,
        "merge_round int, left_sym string, right_sym string, n_occurrences bigint",
    )


def _duck_bpe_rounds(rounds: int) -> str:
    """Shared CTE prefix: the unrolled training rounds (w, s0, p/m/s per
    round) used by both the train and the apply oracles."""
    toks = H.duck_tokens("text")
    parts = [
        f"""WITH w AS (
            SELECT w, count(*) AS freq
            FROM (SELECT unnest({toks}) AS w FROM documents)
            GROUP BY w HAVING length(w) >= 2
        ), s0 AS (
            SELECT '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS sym, freq
            FROM w
        )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f""", p{r} AS (
            SELECT p.x AS x, p.y AS y, sum(freq) AS cnt
            FROM (
                SELECT unnest(list_transform(generate_series(1, len(l) - 1),
                           i -> struct_pack(x := l[i], y := l[i + 1]))) AS p,
                       freq
                FROM (SELECT string_split(trim(sym), '  ') AS l, freq
                      FROM s{r - 1})
            )
            GROUP BY p.x, p.y
        ), m{r} AS (
            SELECT x, y, cnt FROM p{r} ORDER BY cnt DESC, x, y LIMIT 1
        ), s{r} AS (
            SELECT replace(sym,
                       ' ' || (SELECT x FROM m{r}) || '  '
                           || (SELECT y FROM m{r}) || ' ',
                       ' ' || (SELECT x || y FROM m{r}) || ' ') AS sym,
                   freq
            FROM s{r - 1}
        )""")
    return "".join(parts)


def duck_bpe_train_sql(rounds: int = 3) -> str:
    """DuckDB twin of ``bpe_train_merges`` — the merge loop unrolled as
    CTE rounds with scalar-subquery merge rules."""
    sel = "\nUNION ALL ".join(
        f"SELECT {r} AS merge_round, x AS left_sym, y AS right_sym,"
        f" cnt::BIGINT AS n_occurrences FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return _duck_bpe_rounds(rounds) + "\n" + sel


def bpe_encode_counts(
    documents: DataFrame, rounds: int = 3, rules=None
) -> DataFrame:
    """BPE tokenizer APPLY (encode): train ``rounds`` merges on the corpus
    (``bpe_train_merges``), then encode every document with the learned
    rules — per doc, the whitespace word count vs the BPE symbol count
    (the number an LLM token budget actually bills).

    Scale shape: encoding happens at the VOCABULARY level — each distinct
    word is merged once and its symbol count joins back onto the per-doc
    word counts (Σ cnt·n_sym), so the per-doc pass never re-runs string
    merges over the corpus; the vocabulary side broadcasts (Heaps' law,
    same justification as tfidf_topk).
    """
    # ``rules`` accepts pretrained (left_sym, right_sym) merge pairs —
    # tokenizer training state is a handful of driver strings, the same
    # memoizable unit as k-means centroids, so sibling queries (train /
    # apply / fertility) pay the training rounds once.
    if rules is None:
        rules = [
            (r.left_sym, r.right_sym)
            for r in bpe_train_merges(documents, rounds).collect()
        ]
    else:
        rules = [tuple(r)[:2] for r in rules]
    dt = (
        documents.selectExpr("doc_id", f"explode({_TOKENS}) as w")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sym = F.concat(F.lit("  "), F.regexp_replace("w", "(.)", "$1  "))
    for left, right in rules:
        sym = F.replace(
            sym,
            F.lit(f" {left}  {right} "),
            F.lit(f" {left}{right} "),
        )
    vs = dt.select("w").distinct().select(
        "w", F.size(F.split(F.trim(sym), "  ")).alias("n_sym")
    )
    return (
        dt.join(F.broadcast(vs), "w")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_sym")).alias("n_bpe_symbols"),
        )
    )


def duck_bpe_apply_sql(rounds: int = 3) -> str:
    """DuckDB twin of ``bpe_encode_counts``: the shared training rounds
    plus a vocabulary-level encode of ALL words (len-1 words included —
    merges never touch them) joined onto per-doc word counts."""
    toks = H.duck_tokens("text")
    enc = [
        f""", dt AS (
            SELECT doc_id, w, count(*) AS cnt
            FROM (SELECT doc_id, unnest({toks}) AS w FROM documents)
            GROUP BY doc_id, w
        ), e0 AS (
            SELECT w, '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS sym
            FROM (SELECT DISTINCT w FROM dt)
        )"""
    ]
    for r in range(1, rounds + 1):
        enc.append(f""", e{r} AS (
            SELECT w, replace(sym,
                       ' ' || (SELECT x FROM m{r}) || '  '
                           || (SELECT y FROM m{r}) || ' ',
                       ' ' || (SELECT x || y FROM m{r}) || ' ') AS sym
            FROM e{r - 1}
        )""")
    return (
        _duck_bpe_rounds(rounds)
        + "".join(enc)
        + f"""
        , vs AS (
            SELECT w, len(string_split(trim(sym), '  '))::INT AS n_sym
            FROM e{rounds}
        )
        SELECT doc_id, sum(cnt)::BIGINT AS n_words,
               sum(cnt * n_sym)::BIGINT AS n_bpe_symbols
        FROM dt JOIN vs USING (w) GROUP BY doc_id
        """
    )


def bpe_fertility(
    documents: DataFrame, rounds: int = 3, rules=None
) -> DataFrame:
    """Tokenizer fertility per language — BPE symbols emitted per
    whitespace word — the tokenizer-evaluation metric multilingual
    pipelines watch (a high-fertility language pays more of the token
    budget per word and trains on proportionally less text). Trains
    ``rounds`` merges on the corpus (``bpe_train_merges``), encodes at
    the vocabulary level (``bpe_encode_counts``), and rolls the per-doc
    counts up by language.

    Scale shape: inherits the vocabulary-level encode (no corpus-wide
    string merging); the rollup adds one metadata-sized groupBy over
    |langs| rows beyond the per-doc aggregation.
    """
    per_doc = bpe_encode_counts(documents, rounds, rules=rules)
    return (
        per_doc.join(documents.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_bpe_symbols").cast("bigint").alias("n_bpe_symbols"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_bpe_symbols",
            F.round(
                F.col("n_bpe_symbols") / F.col("n_words"), 6
            ).alias("fertility"),
        )
    )


def duck_bpe_fertility_sql(rounds: int = 3) -> str:
    """Oracle twin of :func:`bpe_fertility`: the per-doc encode SQL rolled
    up by language."""
    return f"""
        SELECT d.lang,
               count(*)::BIGINT AS n_docs,
               sum(b.n_words)::BIGINT AS n_words,
               sum(b.n_bpe_symbols)::BIGINT AS n_bpe_symbols,
               round(sum(b.n_bpe_symbols) / sum(b.n_words), 6) AS fertility
        FROM ({duck_bpe_apply_sql(rounds)}) b
        JOIN documents d USING (doc_id)
        GROUP BY d.lang
    """


def distribution_drift(documents: DataFrame, k: int = 10) -> DataFrame:
    """Corpus drift monitor: total-variation distance between the token
    distributions of two corpus snapshots (doc_id parity splits stand in
    for crawl N vs crawl N+1), plus the top-``k`` drifting tokens — the
    check a training pipeline runs before mixing a new crawl in.

    Exact arithmetic: TVD = Σ_t |p₀(t) − p₁(t)| / 2 is computed on the
    cross-cleared integer numerators |c₀·N₁ − c₁·N₀| (one division at the
    very end), so the statistic is engine-exact. ONE shuffle: both sides'
    counts come from a single conditional aggregation over the exploded
    tokens — never two scans or a join of two tf tables; top-k is
    TakeOrderedAndProject.
    """
    t = spread(documents).selectExpr(
        "doc_id % 2 as side", f"explode({_TOKENS}) as token"
    )
    tf = t.groupBy("token").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("c1"),
    )
    tot = tf.agg(
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
        F.count(F.lit(1)).alias("vocab"),
    )
    scored = tf.crossJoin(F.broadcast(tot)).withColumn(
        "drift_num", F.abs(F.col("c0") * F.col("n1") - F.col("c1") * F.col("n0"))
    )
    tvd = scored.agg(
        F.round(
            F.sum("drift_num")
            / (F.lit(2.0) * F.first("n0") * F.first("n1")),
            6,
        ).alias("tvd"),
        F.first("vocab").alias("vocab"),
    )
    top = (
        scored.orderBy(F.col("drift_num").desc(), F.col("token").asc())
        .limit(k)
        .select("token", "c0", "c1", "drift_num")
    )
    return top.crossJoin(F.broadcast(tvd)).select(
        "token", "c0", "c1", "drift_num", "tvd", "vocab"
    )


def bm25_topk(
    documents: DataFrame,
    query_terms: tuple[str, ...] = ("spark", "join", "stream"),
    k: int = 20,
) -> DataFrame:
    """BM25 retrieval: top-``k`` documents for a term-set query — the
    classic sparse ranking function (Robertson & Zaragoza 2009) that a
    training-data pipeline uses for corpus search, quality probes, and
    retrieval-based decontamination.

    Cross-engine exactness by pure rationals: with ``k1=1.2``, ``b=0.75``
    folded into integers, each per-term score is

        idf · tf_sat = (2N−2df+1)/(2df+1) · 44·tf·L / (20·tf·L + 6·L + 18·dl·N)

    where ``N`` = corpus size, ``L`` = total token count, ``dl`` = doc
    length — the log-free Robertson idf (same convention as
    ``tfidf_topk``: no libm ``ln`` to disagree across engines).  Numerator
    and denominator are exact bigints (< 2^53 through sf1, so the one
    double division is correctly rounded and bit-identical in both
    engines); each term contribution quantizes to a 1e-6 integer and the
    per-doc sum is a bigint — order-independent.  At larger scale the
    bigints exceed 2^53 and the products should move to double (ranking
    stays stable; only the oracle-exactness trick weakens).

    Plan shape: the doc length rides along the explode so tf already
    carries ``dl`` out of its partial-agg groupBy (pre-filtered to the
    query terms — the filter prunes the shuffle to query-term postings
    only, so the shuffled relation is hits-sized, never corpus-sized);
    df re-aggregates the tf table; the (N, L) scalars are one extra
    corpus scan reduced to a single broadcast row (a scan is cheaper
    than the corpus-sized doc_id shuffle join that looking lengths up
    post-hoc would cost); the top-k is ``orderBy().limit()`` =
    TakeOrderedAndProject.
    """
    terms = [t for t in query_terms]
    toks = documents.selectExpr("doc_id", f"{_TOKENS} as t")
    # corpus scalars: one row (N, L)
    nl = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("t")).alias("total_len"),
    )
    hits = (
        toks.select("doc_id", F.size("t").alias("dl"), F.explode("t").alias("token"))
        .filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )
    df = hits.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n, l_, tf_, df_, dlc = (
        F.col("n_docs"),
        F.col("total_len"),
        F.col("tf"),
        F.col("df"),
        F.col("dl"),
    )
    num = (2 * n - 2 * df_ + 1) * (44 * tf_ * l_)
    den = (2 * df_ + 1) * (20 * tf_ * l_ + 6 * l_ + 18 * dlc * n)
    term_e6 = F.floor(
        (num.cast("double") / den.cast("double")) * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    scored = (
        hits.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(nl))
        .groupBy("doc_id")
        .agg(
            F.sum(term_e6).alias("bm25_e6"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )
    return (
        scored.orderBy(F.col("bm25_e6").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "bm25_e6", "n_hits")
    )


def dataset_card(documents: DataFrame) -> DataFrame:
    """The one-row dataset card a training run records next to its data:
    corpus size, token volume, language spread, exact-duplicate rate, and
    emptiness — the numbers every data release publishes (HuggingFace
    dataset cards, Dolma/Pile papers) and every pipeline gate checks
    before a run.

    All integers/rationals: the dominant-language share ships as a
    1e-6-quantized fraction (floor(count·1e6/total)), duplicate docs as
    corpus minus distinct md5 contents.  Plan shape: ONE scan feeds every
    per-doc measure; the distinct-content count is the only extra
    shuffle (partial-agg on the md5); output is a single broadcast-sized
    row."""
    per_doc = documents.select(
        F.size(F.expr(_TOKENS)).alias("n_tok"),
        F.col("lang"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h"),
        (F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) == 0).alias(
            "empty"
        ),
    )
    lang_top = (
        per_doc.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("lang").asc())
        .limit(1)
        .select(
            F.col("lang").alias("top_lang"), F.col("c").alias("top_lang_docs")
        )
    )
    totals = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("h").alias("n_unique_contents"),
        F.sum(F.col("empty").cast("bigint")).alias("n_empty_docs"),
    )
    return (
        totals.crossJoin(F.broadcast(lang_top))
        .select(
            "n_docs",
            "total_tokens",
            F.floor(F.col("total_tokens") / F.col("n_docs")).alias(
                "mean_tokens"
            ),
            "n_langs",
            "top_lang",
            F.floor(
                F.col("top_lang_docs") * F.lit(1000000) / F.col("n_docs")
            ).alias("top_lang_share_e6"),
            (F.col("n_docs") - F.col("n_unique_contents")).alias("n_dup_docs"),
            "n_empty_docs",
        )
    )


def quality_calibration(
    documents: DataFrame, keep_num: int = 3, keep_den: int = 4
) -> DataFrame:
    """Per-language quality-filter calibration: the score threshold that
    keeps the top ``keep_num/keep_den`` of EACH language — so one global
    cutoff doesn't silently skew the language mix (low-resource languages
    score systematically lower on an English-tuned heuristic).

    Threshold is an ORDER STATISTIC on the 6-decimal score grid, not an
    interpolated percentile: scores histogram exactly (≤1e6 distinct
    values), a per-language cumulative count over the HISTOGRAM (never
    the corpus) finds the smallest suffix reaching the keep target, and
    ties at the threshold keep everything at that value — deterministic
    cross-engine, no interpolation-formula exposure.

    Scale shape: two partial-agg shuffles over the corpus (per-(lang,
    score) histogram + per-lang totals); the window runs on the
    histogram, whose size is bounded by the score grid, not the corpus.
    """
    q = (
        quality_score(documents)
        .select("lang", "quality")
        # a null score (empty-token doc) has no place on the grid, and
        # null ordering inside the cum window differs across engines
        .filter(F.col("quality").isNotNull())
    )
    hist = q.groupBy("lang", "quality").agg(F.count(F.lit(1)).alias("c"))
    totals = q.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    totals = totals.select(
        "*",
        F.expr(f"({keep_num} * n_docs + {keep_den - 1}) div {keep_den}")
        .cast("bigint")
        .alias("keep_target"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.col("quality").desc())
    cum = hist.select(
        "lang", "quality", F.sum("c").over(w).alias("cum")
    ).join(F.broadcast(totals), "lang")
    return (
        cum.filter(F.col("cum") >= F.col("keep_target"))
        .groupBy("lang", "n_docs", "keep_target")
        .agg(
            F.max("quality").alias("threshold"),
            F.min("cum").cast("bigint").alias("n_kept"),
        )
        .select(
            "lang",
            "n_docs",
            "keep_target",
            "threshold",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_docs"), 6).alias("keep_rate"),
        )
    )


def zipf_fit(documents: DataFrame, k: int = 100) -> DataFrame:
    """Zipf's-law fit of the corpus vocabulary: OLS regression of
    ln(freq) on ln(rank) over the top-``k`` terms — slope ≈ −1 is the
    Zipf signature; a flatter slope flags boilerplate-heavy or
    deduplicated-to-death corpora, a steeper one a vocabulary collapsed
    onto few types. Emits one row: term count, fitted slope/intercept,
    and R².

    The OLS moments (Σx, Σy, Σxx, Σxy, Σyy) are algebraic aggregates of
    the k-row vocabulary relation, so everything after the corpus-wide
    token count (``vocab``'s one explode+groupBy shuffle with a
    TakeOrderedAndProject head) is driver-trivial; the rank window runs
    on the k-row result, never the corpus (the ``event_paths`` post-limit
    idiom). Rounded where cross-partition FP accumulation order could
    differ between engines.
    """
    v = vocab(documents, k)
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    xy = v.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1)).cast("double")
    m = xy.agg(
        n.alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(cov / varx, 6).alias("slope"),
        F.round((F.col("sy") - (cov / varx) * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    )


def duck_zipf_fit_sql(k: int = 100) -> str:
    """DuckDB twin of ``zipf_fit`` — same top-k vocabulary, same OLS
    moments and rounding."""
    return f"""
        WITH v AS (
            SELECT token, count(*) AS freq FROM (
                SELECT unnest({H.duck_tokens("lower(text)")}) AS token
                FROM documents
            ) WHERE token != ''
            GROUP BY token ORDER BY freq DESC, token LIMIT {k}
        ), xy AS (
            SELECT ln((row_number() OVER (ORDER BY freq DESC, token)
                       )::DOUBLE) AS x,
                   ln(freq::DOUBLE) AS y
            FROM v
        ), m AS (
            SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
            FROM xy
        )
        SELECT n::BIGINT AS n_terms,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
               round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                     / n, 6) AS intercept,
               round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        FROM m
    """


def lang_entropy(documents: DataFrame) -> DataFrame:
    """Per-language unigram token entropy and perplexity — the
    vocabulary-diversity card a multilingual corpus publishes per
    language: H = ln(T) − (Σ c·ln c)/T over the token distribution
    (nats), perplexity = e^H (the effective vocabulary size a unigram LM
    sees). A language whose perplexity collapses relative to its type
    count is template/boilerplate-dominated.

    Scale shape: ONE explode → (lang, token) partial-agg shuffle (type
    cardinality crosses the wire, not token count); the per-language
    reduction Σ c·ln c is algebraic over the type-sized relation, and the
    language dimension is metadata-sized. Rounded where cross-partition
    FP accumulation order could differ.
    """
    toks = F.expr(H.spark_tokens("lower(text)"))
    counts = (
        documents.select("lang", F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_lang = counts.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
            "sclnc"
        ),
    )
    h = F.log(F.col("n_tokens").cast("double")) - F.col("sclnc") / F.col(
        "n_tokens"
    )
    return per_lang.select(
        "lang",
        "n_tokens",
        "n_types",
        F.round(h, 4).alias("entropy_nats"),
        F.round(F.exp(h), 2).alias("perplexity"),
    )


def duck_lang_entropy_sql() -> str:
    """DuckDB twin of ``lang_entropy``."""
    return f"""
        WITH counts AS (
            SELECT lang, token, count(*) AS c FROM (
                SELECT lang, unnest({H.duck_tokens("lower(text)")}) AS token
                FROM documents
            ) WHERE token != ''
            GROUP BY lang, token
        ), per_lang AS (
            SELECT lang, sum(c)::BIGINT AS n_tokens,
                   count(*)::BIGINT AS n_types,
                   sum(c::DOUBLE * ln(c::DOUBLE)) AS sclnc
            FROM counts GROUP BY lang
        )
        SELECT lang, n_tokens, n_types,
               round(ln(n_tokens::DOUBLE) - sclnc / n_tokens, 4)
                   AS entropy_nats,
               round(exp(ln(n_tokens::DOUBLE) - sclnc / n_tokens), 2)
                   AS perplexity
        FROM per_lang
    """


def heaps_fit(documents: DataFrame) -> DataFrame:
    """Heaps'-law fit of vocabulary growth across sources: each source
    contributes one (N = token count, V = type count) point; OLS of
    ln V on ln N gives V ≈ k·N^β — the sublinearity exponent β that
    predicts how much NEW vocabulary the next 10× of crawl will add (a
    β near 1 flags synthetic/ID-like tokens; natural text sits near
    0.4–0.6). Complements ``zipf_fit`` (frequency law) with the growth
    law. One row: point count, β, k, R².

    Scale shape: the (source, token) counts are ONE explode partial-agg
    shuffle; the per-source rollup is source-dimension-sized, and the
    OLS moments reduce those few rows — same two-aggregation shape as
    ``lang_entropy``.
    """
    toks = F.expr(H.spark_tokens("lower(text)"))
    per_tok = (
        documents.select("source", F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pts = per_tok.groupBy("source").agg(
        F.log(F.sum("c").cast("double")).alias("x"),
        F.log(F.count(F.lit(1)).cast("double")).alias("y"),
    )
    n = F.count(F.lit(1)).cast("double")
    m = pts.agg(
        n.alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    beta = cov / varx
    return m.select(
        F.col("n").cast("bigint").alias("n_sources"),
        F.round(beta, 6).alias("beta"),
        F.round(F.exp((F.col("sy") - beta * F.col("sx")) / F.col("n")), 4).alias(
            "k_coef"
        ),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    )


def duck_heaps_fit_sql() -> str:
    """DuckDB twin of ``heaps_fit``."""
    return f"""
        WITH per_tok AS (
            SELECT source, token, count(*) AS c FROM (
                SELECT source, unnest({H.duck_tokens("lower(text)")}) AS token
                FROM documents
            ) WHERE token != ''
            GROUP BY source, token
        ), pts AS (
            SELECT ln(sum(c)::DOUBLE) AS x, ln(count(*)::DOUBLE) AS y
            FROM per_tok GROUP BY source
        ), m AS (
            SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
            FROM pts
        )
        SELECT n::BIGINT AS n_sources,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta,
               round(exp((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx)
                          * sx) / n), 4) AS k_coef,
               round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        FROM m
    """


def keyness_chi2(documents: DataFrame, k: int = 5, min_df: int = 5) -> DataFrame:
    """Corpus-contrastive KEYNESS: the top-``k`` most over-represented
    terms per source by the chi-square statistic on the 2×2 document-
    frequency contingency table (token-in-source vs token-elsewhere) —
    the classic corpus-linguistics "what words characterize this slice"
    question that per-doc TF-IDF (``tfidf_topk``) cannot answer.

    Exactness: a/b/c/d are exact bigint doc counts; chi² =
    N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) is computed as DECIMAL(38,0)
    integer products (HUGEINT in the oracle) with ONE final double
    division, then rounded to 4 — both engines rank the same rounded
    values with a token tie-break, so the top-k set is deterministic.
    At a corpus where N·(ad−bc)² would pass 10³⁸ the statistic is far
    beyond any significance threshold anyway; saturate or go double.

    Plan shape at 100 TB: one distinct-token explode feeds a
    (source, token) partial agg; the token margin re-aggregates THAT
    (vocab-sized) table; source margins and N are metadata-sized
    broadcasts. The rank window partitions by source over vocab-sized
    groups — never corpus rows — and row_number ≤ k truncates map-side
    (WindowGroupLimit).
    """
    t = documents.selectExpr(
        "doc_id", "source", f"explode(array_distinct({_TOKENS})) as token"
    )
    st = t.groupBy("source", "token").agg(F.count(F.lit(1)).alias("a"))
    tok = st.groupBy("token").agg(F.sum("a").alias("df_all"))
    src = documents.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    n = documents.select(F.count(F.lit(1)).alias("n_docs"))
    cells = (
        st.join(F.broadcast(tok.filter(F.col("df_all") >= min_df)), "token")
        .join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(n))
        .withColumn("b", F.col("df_all") - F.col("a"))
        .withColumn("c", F.col("n_src") - F.col("a"))
        .withColumn(
            "d", F.col("n_docs") - F.col("df_all") - F.col("n_src") + F.col("a")
        )
    )
    chi = (
        cells.filter(
            (F.col("a") * F.col("d") > F.col("b") * F.col("c"))
            & ((F.col("a") + F.col("b")) * (F.col("c") + F.col("d")) > 0)
            & ((F.col("a") + F.col("c")) * (F.col("b") + F.col("d")) > 0)
        )
        .withColumn("adbc", (F.col("a") * F.col("d") - F.col("b") * F.col("c")).cast("decimal(20,0)"))
        .withColumn(
            "chi2",
            F.round(
                F.expr(
                    "CAST(CAST(n_docs AS DECIMAL(38,0)) * (adbc * adbc) AS DOUBLE)"
                    " / CAST((CAST(a+b AS DECIMAL(19,0)) * CAST(c+d AS DECIMAL(19,0)))"
                    "        * (CAST(a+c AS DECIMAL(19,0)) * CAST(b+d AS DECIMAL(19,0))) AS DOUBLE)"
                ),
                4,
            ),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("chi2").desc(), F.col("token").asc()
    )
    return (
        chi.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("source", "rank", "token", F.col("a").alias("df_src"), "chi2")
    )


def duck_keyness_sql(k: int = 5, min_df: int = 5) -> str:
    """Oracle twin of :func:`keyness_chi2` — HUGEINT products, identical
    rounded-then-ranked ordering."""
    toks = H.duck_tokens("text")
    return f"""
        WITH t AS (
            SELECT doc_id, source,
                   unnest(list_distinct({toks})) AS token
            FROM documents
        ), st AS (
            SELECT source, token, count(*)::BIGINT AS a FROM t GROUP BY 1, 2
        ), tok AS (
            SELECT token, sum(a)::BIGINT AS df_all FROM st GROUP BY 1
        ), src AS (
            SELECT source, count(*)::BIGINT AS n_src FROM documents GROUP BY 1
        ), n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
        cells AS (
            SELECT st.source, st.token, a,
                   df_all - a AS b,
                   n_src - a AS c,
                   n_docs - df_all - n_src + a AS d,
                   n_docs
            FROM st JOIN tok USING (token) JOIN src USING (source) CROSS JOIN n
            WHERE df_all >= {min_df}
        ), chi AS (
            SELECT source, token, a,
                   round((n_docs::HUGEINT
                            * ((a*d - b*c)::HUGEINT * (a*d - b*c)::HUGEINT))::DOUBLE
                         / ((a+b)::HUGEINT * (c+d)::HUGEINT
                            * (a+c)::HUGEINT * (b+d)::HUGEINT)::DOUBLE, 4) AS chi2
            FROM cells
            WHERE a*d > b*c AND (a+b)*(c+d) > 0 AND (a+c)*(b+d) > 0
        )
        SELECT source, CAST(rn AS INT) AS rank, token, a AS df_src, chi2
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY source ORDER BY chi2 DESC, token) AS rn
            FROM chi
        ) WHERE rn <= {k}
    """


def pmi_collocations(
    documents: DataFrame, k: int = 50, min_count: int = 5
) -> DataFrame:
    """Collocation mining by pointwise mutual information — the
    distributional-association statistic (Church & Hanks '90) that ranks
    "strongly bound" word pairs where raw frequency (``bigram_topk``)
    just ranks "common" ones: PMI(x,y) = ln(n_xy·N / (n_x·n_y)) over
    OCCURRENCE counts of adjacent token pairs, thresholded at
    ``min_count`` occurrences so hapax pairs don't saturate the top.

    Exactness: all four counts are exact integers from two partial aggs;
    the single ln takes the exact integer ratio's numerator/denominator
    separately (ln a − ln b of exact bigints), rounded BEFORE ranking
    (rounded-then-ranked, ties to the phrase string).

    Scale shape: one token-stream pass builds adjacent pairs with a
    per-doc transform (no self-join); unigram totals broadcast back onto
    the vocabulary-sized pair table (never onto the corpus); top-k is
    TakeOrderedAndProject.
    """
    # a single-token doc has NO adjacent pairs: guard explicitly —
    # sequence(1, 0) in Spark is the DESCENDING [1, 0], which would walk
    # t[-1]/t[1] out of bounds (round-9 degenerate-text finding); the
    # oracle's generate_series(1, 0) is already empty
    pairs_expr = (
        "if(size(t) < 2, array(),"
        " transform(sequence(1, size(t) - 1),"
        " i -> struct(t[i - 1] as x, t[i] as y)))"
    )
    # Materialized ONCE (round 12): persist()+pre-action unpersist()
    # cached nothing, so pair_counts / uni / total each re-tokenized the
    # corpus. localCheckpoint runs the token pass once; the bench's
    # release sweep reclaims the blocks.
    occ = (
        documents.selectExpr(f"{_TOKENS} as t")
        .selectExpr(f"explode({pairs_expr}) as p")
        .select("p.x", "p.y")
        .localCheckpoint(eager=True)
    )
    pair_counts = (
        occ.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .filter(F.col("n_xy") >= min_count)
    )
    uni = occ.groupBy(F.col("x").alias("w")).agg(
        F.count(F.lit(1)).alias("n_w")
    )
    # pair total N = total adjacent-pair occurrences; left-token counts
    # stand in for unigram frequencies (the standard bigram-PMI margin)
    total = occ.groupBy().agg(F.count(F.lit(1)).alias("n_all"))
    scored = (
        pair_counts.join(
            F.broadcast(uni.withColumnRenamed("w", "x").withColumnRenamed("n_w", "n_x")),
            "x",
        )
        .join(
            F.broadcast(uni.withColumnRenamed("w", "y").withColumnRenamed("n_w", "n_y")),
            "y",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "x",
            "y",
            "n_xy",
            "n_x",
            "n_y",
            F.round(
                F.log(F.col("n_xy").cast("double") * F.col("n_all"))
                - F.log(F.col("n_x").cast("double") * F.col("n_y")),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("x").asc(), F.col("y").asc()
    ).limit(k)


def duck_pmi_sql(k: int = 50, min_count: int = 5) -> str:
    """Oracle twin of :func:`pmi_collocations`."""
    toks = H.duck_tokens("text")
    return f"""
        WITH t AS (
            SELECT {toks} AS t FROM documents
        ), occ AS (
            SELECT unnest(list_transform(
                       generate_series(1, greatest(len(t) - 1, 0)),
                       i -> {{'x': t[i], 'y': t[i + 1]}})) AS p
            FROM t
        ), pairs AS (
            SELECT p.x AS x, p.y AS y, count(*) AS n_xy
            FROM occ GROUP BY 1, 2 HAVING count(*) >= {min_count}
        ), uni AS (
            SELECT p.x AS w, count(*) AS n_w FROM occ GROUP BY 1
        ), tot AS (
            SELECT count(*) AS n_all FROM occ
        )
        SELECT x, y, n_xy, ux.n_w AS n_x, uy.n_w AS n_y,
               round(ln(n_xy::DOUBLE * n_all)
                     - ln(ux.n_w::DOUBLE * uy.n_w), 4) AS pmi
        FROM pairs
        JOIN uni ux ON ux.w = x
        JOIN uni uy ON uy.w = y
        CROSS JOIN tot
        ORDER BY pmi DESC, x ASC, y ASC LIMIT {k}
    """


def _rake_phrases(documents: DataFrame, max_words: int) -> DataFrame:
    """(doc_id, seg, phrase, n_words) candidate-phrase relation: token
    runs between stopword boundaries, segmented by a PER-DOC window
    (partitioned by doc_id — never a corpus-wide single-partition
    WindowExec; the plan contract is pinned in tests/test_plans.py).
    Split out of ``rake_keyphrases`` so the window shape stays
    assertable after the caller checkpoints this relation."""
    stops = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    toks = documents.selectExpr(
        "doc_id", f"posexplode({_TOKENS}) as (pos, token)"
    ).withColumn("is_stop", F.expr(f"token in ({stops})"))
    seg = Window.partitionBy("doc_id").orderBy("pos")
    return (
        toks.withColumn(
            "seg", F.sum(F.col("is_stop").cast("int")).over(seg)
        )
        .filter(~F.col("is_stop"))
        .groupBy("doc_id", "seg")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "token"))
                    ),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .filter(F.col("n_words") <= max_words)
    )


def rake_keyphrases(
    documents: DataFrame, k: int = 25, max_words: int = 3
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): token runs between
    stopword boundaries are candidate phrases; each word scores
    degree/frequency over the candidate corpus (degree = Σ phrase length
    over its occurrences — words that live in long phrases rank up), and
    a phrase scores the sum of its word scores. The multi-word complement
    of ``pmi_collocations`` (PMI ranks PAIRS; RAKE surfaces variable-
    length domain phrases) and the classic zero-model keyphrase baseline.

    Exactness: word scores are integer-floor-scaled rationals
    (``deg·10⁶ div freq``), so a phrase's score is an exact INTEGER sum —
    no float summation order anywhere; one final /10⁶ display division.
    Rounded-then-ranked top-k, ties to the phrase string.

    Scale shape: phrase segmentation is a per-doc window (position-
    ordered, partitioned by doc — parallel across docs at any scale);
    word stats and phrase stats are two partial-agg shuffles over
    phrase-occurrence rows; the word-score join keys on the word. Top-k
    is TakeOrderedAndProject.
    """
    # Materialized ONCE (round 12): persist()+pre-action unpersist()
    # cached nothing, so the word-score and phrase-score branches
    # each re-ran the posexplode + window segmentation. The bench's
    # release sweep reclaims the blocks.
    phrases = _rake_phrases(documents, max_words).localCheckpoint(eager=True)
    words = phrases.select(
        F.explode(F.split("phrase", " ")).alias("word"), "n_words"
    )
    scores = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("n_words").alias("deg"),
    ).select(
        "word",
        F.expr("cast(deg * 1000000 div freq as bigint)").alias("wscore"),
    )
    phrase_words = phrases.select(
        "phrase", F.explode(F.split("phrase", " ")).alias("word")
    )
    pscore = (
        phrase_words.join(F.broadcast(scores), "word")
        .groupBy("phrase")
        .agg(F.sum("wscore").alias("pscore_num"))
    )
    occ = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.max("n_words").cast("int").alias("n_words"),
    )
    out = (
        occ.join(pscore, "phrase")
        .select(
            "phrase",
            "n_words",
            "n_occurrences",
            F.round(F.col("pscore_num") / 1e6, 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("phrase").asc())
        .limit(k)
    )
    return out


def duck_rake_sql(k: int = 25, max_words: int = 3) -> str:
    """Oracle twin of :func:`rake_keyphrases` — identical segmentation,
    integer-scaled word scores, rounded-then-ranked top-k."""
    stops = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    toks = H.duck_tokens("text")
    return f"""
        WITH t AS (
            SELECT doc_id, tok.i AS pos, tok.t AS token
            FROM (SELECT doc_id,
                         unnest(list_transform({toks},
                             (x, i) -> {{'t': x, 'i': i}})) AS tok
                  FROM documents)
        ), seg AS (
            SELECT doc_id, pos, token,
                   token IN ({stops}) AS is_stop,
                   sum(CASE WHEN token IN ({stops}) THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos) AS seg
            FROM t
        ), phrases AS (
            SELECT doc_id, seg,
                   string_agg(token, ' ' ORDER BY pos) AS phrase,
                   count(*) AS n_words
            FROM seg WHERE NOT is_stop
            GROUP BY doc_id, seg
            HAVING count(*) <= {max_words}
        ), words AS (
            SELECT unnest(string_split(phrase, ' ')) AS word, n_words
            FROM phrases
        ), scores AS (
            SELECT word,
                   CAST(sum(n_words) * 1000000 // count(*) AS BIGINT)
                       AS wscore
            FROM words GROUP BY word
        ), pw AS (
            SELECT phrase, unnest(string_split(phrase, ' ')) AS word
            FROM phrases
        ), ps AS (
            SELECT phrase, sum(wscore) AS pscore_num
            FROM pw JOIN scores USING (word) GROUP BY phrase
        ), occ AS (
            SELECT phrase, count(*)::BIGINT AS n_occurrences,
                   CAST(max(n_words) AS INT) AS n_words
            FROM phrases GROUP BY phrase
        )
        SELECT phrase, n_words, n_occurrences,
               round(pscore_num / 1000000.0, 4) AS score
        FROM occ JOIN ps USING (phrase)
        ORDER BY score DESC, phrase ASC LIMIT {k}
    """


def source_kl(documents: DataFrame, buckets: int = 1024) -> DataFrame:
    """Per-source distribution drift as KL(source ‖ corpus) over hashed
    unigram buckets (Laplace-smoothed) — the one-number-per-source
    mixture monitor that complements term-level ``keyness``: a source
    whose token distribution wanders from the corpus mix shows up here
    before any individual term is significant.

    Exactness: all counts exact from ONE token pass; every ln takes an
    exact integer; the per-source sum runs over the B-row bucket table
    (metadata-sized — float-order wobble bounded far below the final
    round(4)).

    Scale shape: one explode + (source, bucket) partial agg; corpus
    margins ride as windows over the (sources×B)-row table, never a
    second corpus pass.
    """
    from pyspark.sql import Window

    occ = documents.selectExpr(
        "source", f"explode({_TOKENS}) as token"
    ).selectExpr(
        "source", f"pmod({H.spark_h32('token')}, {buckets}) as bucket"
    )
    sb = occ.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("c_sb")
    )
    w_src = Window.partitionBy("source")
    w_bkt = Window.partitionBy("bucket")
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = sb.select(
        "source",
        "c_sb",
        F.sum("c_sb").over(w_src).alias("n_s"),
        F.sum("c_sb").over(w_bkt).alias("c_b"),
        F.sum("c_sb").over(wall).alias("n_all"),
    )
    ln = lambda c: F.log(c.cast("double"))  # noqa: E731
    term = (
        (F.col("c_sb") + 1)
        / (F.col("n_s") + F.lit(buckets))
        * (
            ln(F.col("c_sb") + 1)
            - ln(F.col("n_s") + F.lit(buckets))
            - ln(F.col("c_b") + 1)
            + ln(F.col("n_all") + F.lit(buckets))
        )
    )
    return t.groupBy("source").agg(
        F.max("n_s").cast("bigint").alias("n_tokens"),
        F.round(F.sum(term), 4).alias("kl_nats"),
    )


def duck_source_kl_sql(buckets: int = 1024) -> str:
    """Oracle twin of :func:`source_kl`."""
    toks = H.duck_tokens("text")
    return f"""
        WITH occ AS (
            SELECT source, {H.duck_h32('token')} % {buckets} AS bucket
            FROM (SELECT source, unnest({toks}) AS token FROM documents)
        ), sb AS (
            SELECT source, bucket, count(*) AS c_sb
            FROM occ GROUP BY 1, 2
        ), t AS (
            SELECT source, c_sb,
                   sum(c_sb) OVER (PARTITION BY source) AS n_s,
                   sum(c_sb) OVER (PARTITION BY bucket) AS c_b,
                   sum(c_sb) OVER () AS n_all
            FROM sb
        )
        SELECT source, max(n_s)::BIGINT AS n_tokens,
               round(sum((c_sb + 1) / (n_s + {buckets})
                         * (ln((c_sb + 1)::DOUBLE)
                            - ln((n_s + {buckets})::DOUBLE)
                            - ln((c_b + 1)::DOUBLE)
                            + ln((n_all + {buckets})::DOUBLE))), 4)
                   AS kl_nats
        FROM t GROUP BY source
    """


def langid_confusion(documents: DataFrame) -> DataFrame:
    """Confusion matrix of the stopword language-ID against the labeled
    ``lang`` column — the eval every classifier-backed curation gate
    needs before its predictions drive filtering: one row per
    (true, predicted) cell with count and the row-normalized rate, plus
    per-true-language recall riding in the same row.

    Exactness: counts exact; the two rates are single divisions of exact
    integers, rounded once. Scale shape: ``lang_id`` is a pure
    projection fused into the scan; the matrix is one partial agg to a
    |langs|²-row table; margins ride as windows on that table.
    """
    from pyspark.sql import Window

    pred = lang_id(documents).select("lang", "predicted_lang")
    cells = pred.groupBy(
        F.col("lang").alias("true_lang"),
        F.col("predicted_lang").alias("pred_lang"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("true_lang")
    return cells.select(
        "true_lang",
        "pred_lang",
        "n",
        F.sum("n").over(w).cast("bigint").alias("n_true"),
        F.round(F.col("n") / F.sum("n").over(w), 4).alias("rate"),
        F.round(
            F.when(F.col("true_lang") == F.col("pred_lang"), F.col("n"))
            .otherwise(0)
            / F.sum("n").over(w),
            4,
        ).alias("recall_if_diag"),
    )


def duck_langid_confusion_sql() -> str:
    """Oracle twin of :func:`langid_confusion`, composed over the same
    stopword-score argmax SQL as the q_lang_id oracle."""
    langs = sorted(STOPWORDS)
    scores = ", ".join(
        "len(list_intersect(list_distinct({toks}), [{words}]))::INT"
        " AS score_{lang}".format(
            toks=H.duck_tokens("text"),
            words=", ".join(f"'{w}'" for w in STOPWORDS[lang]),
            lang=lang,
        )
        for lang in langs
    )
    pred = "CASE"
    for lang in langs:
        cond = " AND ".join(
            f"score_{lang} >= score_{o}" for o in langs if o != lang
        )
        pred += f" WHEN {cond} THEN '{lang}'"
    pred += " ELSE 'und' END"
    return f"""
        WITH scored AS (
            SELECT lang, {scores} FROM documents
        ), pred AS (
            SELECT lang AS true_lang, {pred} AS pred_lang FROM scored
        ), cells AS (
            SELECT true_lang, pred_lang, count(*)::BIGINT AS n
            FROM pred GROUP BY 1, 2
        )
        SELECT true_lang, pred_lang, n,
               sum(n) OVER (PARTITION BY true_lang)::BIGINT AS n_true,
               round(n / sum(n) OVER (PARTITION BY true_lang), 4) AS rate,
               round(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END
                     / sum(n) OVER (PARTITION BY true_lang), 4)
                   AS recall_if_diag
        FROM cells
    """


def lix_readability(documents: DataFrame) -> DataFrame:
    """LIX readability grade per doc (Björnsson's läsbarhetsindex, the
    language-agnostic readability measure curation gates use where
    syllable counting is unreliable): LIX = words/sentences +
    100·longwords/words, long = more than 6 characters, sentences split
    on [.!?] runs. Emits the exact integer counts and the rounded grade,
    plus the conventional difficulty band (the <25 / 25-35 / 35-45 /
    45-55 / >55 ladder).

    Exactness: all three counts are exact integers from one projection
    (portable regexes — no lookarounds); the grade is two divisions of
    exact integers in one expression, rounded once. Pure row-local work
    fused into the scan — no shuffle at all before the output.
    """
    n_words = f"size({_TOKENS})"
    n_long = f"size(filter({_TOKENS}, t -> length(t) > 6))"
    n_sent = "greatest(size(split(text, '[.!?]+')) - 1, 1)"
    grade = (
        f"round(cast({n_words} as double) / {n_sent}"
        f" + 100.0 * {n_long} / {n_words}, 4)"
    )
    return documents.selectExpr(
        "doc_id",
        f"cast({n_words} as int) as n_words",
        f"cast({n_sent} as int) as n_sentences",
        f"cast({n_long} as int) as n_long_words",
        f"{grade} as lix",
        f"""CASE WHEN {grade} < 25 THEN 'very_easy'
                WHEN {grade} < 35 THEN 'easy'
                WHEN {grade} < 45 THEN 'medium'
                WHEN {grade} < 55 THEN 'hard'
                ELSE 'very_hard' END as band""",
    )


def duck_lix_sql() -> str:
    """Oracle twin of :func:`lix_readability`."""
    toks = H.duck_tokens("text")
    n_words = f"len({toks})"
    n_long = f"len(list_filter({toks}, t -> length(t) > 6))"
    n_sent = "greatest(len(string_split_regex(text, '[.!?]+')) - 1, 1)"
    grade = (
        f"round({n_words}::DOUBLE / {n_sent}"
        f" + 100.0 * {n_long} / {n_words}, 4)"
    )
    return f"""
        SELECT doc_id,
               CAST({n_words} AS INT) AS n_words,
               CAST({n_sent} AS INT) AS n_sentences,
               CAST({n_long} AS INT) AS n_long_words,
               {grade} AS lix,
               CASE WHEN {grade} < 25 THEN 'very_easy'
                    WHEN {grade} < 35 THEN 'easy'
                    WHEN {grade} < 45 THEN 'medium'
                    WHEN {grade} < 55 THEN 'hard'
                    ELSE 'very_hard' END AS band
        FROM documents
    """
