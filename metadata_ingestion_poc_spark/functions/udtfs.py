"""Python user-defined table functions (Spark 4 `@udtf`) — the last
piece of the Python-eval surface (B11: pandas_udf, applyInPandas,
mapInPandas, applyInPandasWithState, and now UDTF).

UDTFs evaluate row-at-a-time in Python, so they are a CAPABILITY
surface, not a hot path: everything here has a JVM-expression twin
that production queries use (q68's sequence/slice chunker), and the
tests pin the UDTF ≡ twin so the two can never drift. Reach for a
UDTF only when the fan-out logic genuinely needs imperative Python
(recursive descent, external-library tokenizers); otherwise stay in
codegen.

Registration: ``spark.udtf.register("chunk_tokens", ChunkTokens)``
enables the SQL form, including correlated fan-out via LATERAL::

    SELECT t.doc_id, c.*
    FROM docs t, LATERAL chunk_tokens(t.text, 32, 24) c
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType=(
        "chunk_idx: int, start: int, chunk_len: int, chunk_text: string"
    )
)
class ChunkTokens:
    """Sliding-window token chunker: `size`-token chunks every
    `stride` tokens over whitespace-lowercased text — the exact
    semantics of q68's JVM sequence/slice chunker (differential
    test: tests/test_udtfs.py)."""

    def eval(self, text: str, size: int, stride: int):
        if text is None or size is None or stride is None:
            return
        if size < 1 or stride < 1:
            raise ValueError(
                f"size and stride must be >= 1, got {size}/{stride}"
            )
        toks = text.strip().lower().split()
        n = len(toks)
        # mirror q68's start grid: sequence(0, greatest(n - size//4 - 1,
        # 0), stride) — a final partial chunk starts while at least a
        # quarter-window of tokens remains
        last_start = max(n - (size // 4) - 1, 0)
        start = 0
        idx = 0
        while start <= last_start:
            window = toks[start : start + size]
            yield idx, start, len(window), " ".join(window)
            idx += 1
            start += stride


def register_udtfs(spark) -> None:
    """Register every UDTF on the session for SQL/LATERAL use."""
    spark.udtf.register("chunk_tokens", ChunkTokens)
