"""Python UDTF surface (Spark 4): table functions for per-row imperative
expansion logic, consumed via SQL ``LATERAL``.

Completes the Python API family alongside the Pandas surface
(``pandas_ops.py``: scalar / grouped-map / grouped-agg / cogrouped-map and
the ``mapInPandas`` multimodal stages): a UDTF is the right tool when one
input row expands to a *variable number* of output rows through stateful
per-row logic that neither a scalar expression nor ``explode`` of a
precomputed array expresses naturally.

Scale notes: UDTFs run in the Python worker per partition (Arrow transport)
— the same cost model as the Pandas surface; the expansion is map-only
(no shuffle), so the operator parallelizes with the scan.  Keep genuinely
relational work (the aggregation over the expanded rows) on the JVM side
above the UDTF.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="doc_id bigint, token string, run_start int, run_len int")
class TokenRunLength:
    """Run-length encoder over a document's space-delimited tokens: one
    output row per maximal run of consecutive equal tokens, with the
    1-based start position and run length — the immediate-repetition
    signal (stutter/boilerplate) at token granularity, which the
    set-shaped n-gram operators deliberately discard.

    Splitting is plain ``split(' ')`` with empty pieces kept, so positions
    agree exactly with the oracle's ``string_split``.
    """

    def eval(self, doc_id, text):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        run_token = None
        run_start = 0
        run_len = 0
        for pos, token in enumerate(text.split(" "), start=1):
            if token == run_token:
                run_len += 1
            else:
                if run_token is not None:
                    yield (doc_id, run_token, run_start, run_len)
                run_token, run_start, run_len = token, pos, 1
        if run_token is not None:
            yield (doc_id, run_token, run_start, run_len)


def register_all(spark) -> None:
    """Register every UDTF under its SQL name (idempotent)."""
    spark.udtf.register("token_run_length", TokenRunLength)
