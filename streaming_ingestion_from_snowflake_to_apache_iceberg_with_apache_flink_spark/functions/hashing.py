"""Portable deterministic hashing — the backbone of the dedup suite.

Every hash here is defined so that Spark and DuckDB compute *identical*
values, which lets MinHash / SimHash / fingerprint queries be checked
against a SQL oracle exactly, not just statistically:

    h32(s) = int(md5(s)[0:8], 16)        (32-bit, from the md5 hex prefix)

Spark:   cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)
DuckDB:  ('0x' || substr(md5(s), 1, 8))::BIGINT

In production the faster ``xxhash64`` builtin is the better choice (one JVM
intrinsic vs md5); the md5 form is the cross-engine-verifiable one and both
are JVM-side Catalyst expressions — no Python per row. MinHash parameters
(k, the affine constants, the Mersenne-ish prime) live here so the Spark
operator and the oracle SQL generator share one source of truth.
"""

from __future__ import annotations

#: number of MinHash functions and LSH banding layout (bands × rows = k)
MINHASH_K = 16
LSH_BANDS = 4
LSH_ROWS = MINHASH_K // LSH_BANDS

#: prime > 2^32 for the affine permutations h_j(x) = (a_j * x + b_j) mod p
MINHASH_P = 4_294_967_311

#: SimHash pair-matching layout (Manku et al., WWW'07, scaled to 60 bits so
#: the signature stays inside a signed 64-bit integer in both engines): the
#: signature is two salted 30-bit halves; 4 bands × 15 bits guarantee every
#: pair within Hamming distance ≤ SIMHASH_BANDS-1 = 3 shares ≥ 1 band key.
SIMHASH_BITS = 60
SIMHASH_HALF = 30
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS


def minhash_coeffs(k: int = MINHASH_K) -> list[tuple[int, int]]:
    """Fixed affine coefficients (a_j odd, b_j) — deterministic, shared by
    the Spark expression and the DuckDB oracle."""
    return [(2 * j + 3, (1_000_003 * (j + 1)) % MINHASH_P) for j in range(k)]


# -- Spark SQL expression fragments (used via F.expr / selectExpr) ----------


def spark_h32(expr: str) -> str:
    return f"cast(conv(substring(md5({expr}), 1, 8), 16, 10) as bigint)"


def spark_h32b(expr: str) -> str:
    """Second independent 32-bit hash from the SAME md5 (hex chars 9-16) —
    two hash values for one digest computation."""
    return f"cast(conv(substring(md5({expr}), 9, 8), 16, 10) as bigint)"


def spark_tokens(col: str) -> str:
    """Whitespace tokenization; identical to the DuckDB regexp split."""
    return f"split(trim({col}), '\\\\s+')"


def spark_shingles(tokens_expr: str, n: int) -> str:
    """Distinct word n-gram shingles of a token array."""
    return (
        f"array_distinct(transform(sequence(1, greatest(size({tokens_expr}) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice({tokens_expr}, i, {n}))))"
    )


def spark_minhash(hashes_expr: str) -> str:
    """Array of MINHASH_K minimum affine-permuted hashes over an existing
    bigint hash array (hash each shingle once, permute k times)."""
    parts = ", ".join(
        f"array_min(transform({hashes_expr}, "
        f"h -> ({a}L * h + {b}L) % {MINHASH_P}L))"
        for a, b in minhash_coeffs()
    )
    return f"array({parts})"


def _simhash_sums(shift_fmt: str, lo: str, hi: str) -> list[str]:
    """±1 bit-vote partial sums b0..b59 over per-token hash columns ``lo``
    (bits 0-29) and ``hi`` (bits 30-59). ``shift_fmt`` is the dialect's
    right-shift template with {e} and {i} slots."""
    return [
        "sum(CASE WHEN ("
        + shift_fmt.format(e=(lo if i < SIMHASH_HALF else hi), i=i % SIMHASH_HALF)
        + f") & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    ]


def spark_simhash_sums(lo: str = "hl", hi: str = "hh") -> list[str]:
    return _simhash_sums("shiftright({e}, {i})", lo, hi)


def duck_simhash_sums(lo: str = "hl", hi: str = "hh") -> str:
    return ", ".join(_simhash_sums("({e} >> {i})", lo, hi))


def spark_simhash_sig() -> str:
    return " + ".join(
        f"(CASE WHEN b{i} > 0 THEN cast({1 << i} as bigint) ELSE 0L END)"
        for i in range(SIMHASH_BITS)
    )


def duck_simhash_sig() -> str:
    return " + ".join(
        f"(CASE WHEN b{i} > 0 THEN {1 << i}::BIGINT ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    )


def spark_simhash_bands(sig: str = "simhash") -> str:
    """Array of SIMHASH_BANDS band-key strings for the banding self-join."""
    mask = (1 << SIMHASH_BAND_BITS) - 1
    keys = ", ".join(
        f"concat('{b}:', cast(shiftright({sig}, {b * SIMHASH_BAND_BITS}) & {mask}"
        " as string))"
        for b in range(SIMHASH_BANDS)
    )
    return f"array({keys})"


def duck_simhash_bands(sig: str = "simhash") -> str:
    mask = (1 << SIMHASH_BAND_BITS) - 1
    keys = ", ".join(
        f"'{b}:' || (({sig} >> {b * SIMHASH_BAND_BITS}) & {mask})::VARCHAR"
        for b in range(SIMHASH_BANDS)
    )
    return f"[{keys}]"


# -- DuckDB oracle fragments ------------------------------------------------


def duck_h32(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def duck_h32b(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 9, 8))::BIGINT)"


def duck_tokens(col: str) -> str:
    return f"regexp_split_to_array(trim({col}), '\\s+')"


def duck_shingles(tokens_expr: str, n: int) -> str:
    """Mirror of ``spark_shingles``: Spark's slice+concat_ws CLAMPS at
    the array end, so a doc with fewer than ``n`` tokens yields one
    whole-doc shingle. DuckDB list slicing ``t[i : i+n-1]`` clamps the
    same way; the previous per-element ``t[i+d]`` form went out of
    bounds there (NULL gram, silently dropped by list_distinct) —
    divergent for ANY short document, not just empty text (round-9
    degenerate-text fixture finding)."""
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({tokens_expr}) - {n - 1}, 1)), "
        f"i -> array_to_string(({tokens_expr})[i : i + {n - 1}], ' ')))"
    )


def duck_minhash(hashes_expr: str) -> str:
    parts = ", ".join(
        f"list_min(list_transform({hashes_expr}, "
        f"h -> ({a} * h + {b}) % {MINHASH_P}))"
        for a, b in minhash_coeffs()
    )
    return f"[{parts}]"
