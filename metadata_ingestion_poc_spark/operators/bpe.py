"""Distributed byte-pair-encoding merge training.

BPE training (Sennrich et al. 2016; the GPT-2/tiktoken vocabulary
construction) looks sequential — each merge depends on the corpus
state the previous merge produced — but its data plane is exactly the
shape Spark executes well: every round is ONE pair-count aggregation
over the word-frequency table plus one map-only rewrite of the symbol
sequences. The word-frequency table is the key scale fact: real BPE
trainers never touch the corpus after the first pass — they train on
(word, count) rows, a frame bounded by the VOCABULARY, not the corpus,
so a 100 TB corpus costs one tokenizing scan and every merge round
runs on the (millions-row) vocab table.

Symbol sequences are kept as separator-delimited strings
(``|h|e|l|l|o|`` — outer separators included so a merge pattern
``|a|b|`` can never match inside a longer symbol), and a merge is
applied as a fixed chain of ``passes`` non-overlapping string
replaces: one replace pass merges at least every other occurrence in
a run of overlapping candidates, so ``passes`` = 6 is exact for
symbol runs up to 2^6 — far beyond any word here — and extra passes
are no-ops. Both this operator and the DuckDB oracle apply the
IDENTICAL replace chain, so the contract is closed under the engines
by construction; the greedy-left-to-right equivalence is pinned
separately against a reference Python BPE in tests/test_bpe.py.

Pair counts follow the classical convention: ALL adjacent symbol
pairs count (overlapping runs included), weighted by word frequency.
The winning pair per round maximizes (count, then lexicographic
(s1, s2) ascending) — all-integer/string comparisons, so the
trajectory is engine-independent with no float discipline at all.

Per round the driver collects exactly one winning pair and two
bounded census scalars (the q253 greedy-trajectory pattern) — never
data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "|"


def word_frequency_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) over whitespace-split lowered text — the one
    corpus-sized scan; everything after is vocab-bounded. Words that
    contain the symbol separator are rejected loudly rather than
    silently corrupting merge patterns."""
    words = (
        df.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # EAGER checkpoint: materializes the vocab-bounded frame fully
        # right here so every merge round (and the validation probe
        # below) reuses it. A lazy checkpoint + the LIMIT-1 validation
        # collect would only compute enough partitions to satisfy the
        # limit, so the corpus tokenize+aggregate (the expensive
        # stage) could largely re-run in merge round 1.
        .localCheckpoint(eager=True)
    )
    bad = words.filter(F.col("word").contains(SEP)).limit(1).collect()
    if bad:
        raise ValueError(
            f"word contains the symbol separator {SEP!r}: {bad[0]['word']!r}"
        )
    return words


def _delimited(col: str) -> F.Column:
    """'abc' -> '|a|b|c|' (one symbol per code point)."""
    return F.concat(
        F.lit(SEP), F.regexp_replace(F.col(col), "(.)", f"$1{SEP}")
    )


def _symbols(col: str) -> F.Column:
    return F.split(F.expr(f"trim(BOTH '{SEP}' FROM {col})"), r"\|")


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    rounds: int = 6,
    passes: int = 6,
) -> list[tuple[int, str, str, int, int, int]]:
    """Learn ``rounds`` BPE merges over the corpus.

    Returns the merge trajectory
    [(round, pair_a, pair_b, pair_count, total_symbols,
    distinct_symbols)] where pair_count is the winning pair's
    corpus-weighted adjacency count at selection time and the two
    census columns describe the corpus AFTER applying the merge.
    """
    if rounds < 1 or passes < 1:
        raise ValueError(f"rounds/passes must be positive: {rounds}, {passes}")
    w = (
        word_frequency_table(df, text_col)
        .select(_delimited("word").alias("s"), "cnt")
        .localCheckpoint(eager=False)
    )
    out: list[tuple[int, str, str, int, int, int]] = []
    for r in range(1, rounds + 1):
        pairs = (
            w.withColumn("a", _symbols("s"))
            .select(
                F.explode(
                    F.expr(
                        "arrays_zip(slice(a, 1, size(a) - 1),"
                        " slice(a, 2, size(a) - 1))"
                    )
                ).alias("p"),
                "cnt",
            )
            .select(
                F.col("p")["0"].alias("s1"),
                F.col("p")["1"].alias("s2"),
                "cnt",
            )
            .groupBy("s1", "s2")
            .agg(F.sum("cnt").cast("long").alias("c"))
        )
        top = (
            pairs.orderBy(F.col("c").desc(), "s1", "s2").limit(1).collect()
        )
        if not top:
            break  # every word is a single symbol
        a, b, c = top[0]["s1"], top[0]["s2"], int(top[0]["c"])
        pat = F.lit(f"{SEP}{a}{SEP}{b}{SEP}")
        rep = F.lit(f"{SEP}{a}{b}{SEP}")
        merged = F.col("s")
        for _ in range(passes):
            merged = F.replace(merged, pat, rep)
        w = w.select(merged.alias("s"), "cnt").localCheckpoint(eager=False)
        census = (
            w.withColumn("a", _symbols("s"))
            .select(F.explode("a").alias("sym"), "cnt")
            .agg(
                F.sum("cnt").cast("long").alias("total"),
                F.countDistinct("sym").cast("long").alias("distinct"),
            )
            .collect()[0]
        )
        out.append((r, a, b, c, int(census["total"]), int(census["distinct"])))
    return out
