"""Blocked edit-distance similarity join (fuzzy string matching).

Entity-resolution workhorse: join two tables on strings that are
*almost* equal (levenshtein(a, b) <= max_dist) without the n×m cross
join. The Spark-native shape is multi-key blocking:

1. each side emits one row per blocking key — by default the FIRST
   token and the LAST token of the string (tagged so a first-token key
   never collides with a last-token key);
2. equi-join on (tag, key) — a hash/sort-merge join on a cheap string
   key, cost Σ block² instead of n×m;
3. cheap length-band prefilter ||a|-|b|| <= max_dist (a lower bound on
   edit distance) before the expensive levenshtein;
4. exact levenshtein verification, pair-dedup (a pair can co-occur in
   the first-token AND last-token block).

Completeness: a single edit (max_dist=1) touches at most one token of
a string containing exactly one separator — it cannot change the first
token AND the last token at once (an edit that creates or destroys the
separator would change the token count, and both inputs have exactly
one). So for two-token strings first∪last blocking finds EVERY pair at
distance <= 1: the blocked plan is exactly the brute-force result,
which is what the DuckDB cross-join oracle checks differentially. For
wider distances or free-form strings, blocking is the standard
recall/cost dial (pass extra ``block_keys``); the join itself is
unchanged.

Everything is built-in JVM expressions — levenshtein, split,
element_at — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _default_block_keys(col: Column) -> list[tuple[str, Column]]:
    toks = F.split(col, r"\s+")
    return [
        ("f", F.element_at(toks, 1)),
        ("l", F.element_at(toks, -1)),
    ]


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    block_keys=None,
) -> DataFrame:
    """All (left, right) rows with levenshtein(left_col, right_col)
    <= max_dist, found via tagged multi-key blocking.

    ``block_keys``: callable Column -> list[(tag, key_column)]; default
    first-token + last-token (complete for single-separator strings at
    max_dist=1 — see module docstring). Returns left columns + right
    columns + ``dist``; callers should ensure disjoint column names.
    """
    block_keys = block_keys or _default_block_keys

    def keyed(df: DataFrame, col: str, side: str) -> DataFrame:
        pairs = block_keys(F.col(col))
        keys = F.array(
            *[
                F.struct(F.lit(tag).alias("t"), key.alias("k"))
                for tag, key in pairs
            ]
        )
        # array_distinct: if both tokens are equal the two tagged keys
        # still differ (tag field), but identical (tag, key) entries
        # from a caller-supplied scheme must not duplicate the row.
        return df.withColumn(f"__bk_{side}", F.explode(F.array_distinct(keys)))

    lk = keyed(left, left_col, "l")
    rk = keyed(right, right_col, "r")
    joined = lk.join(
        rk,
        (F.col("__bk_l") == F.col("__bk_r"))
        & (
            F.abs(F.length(F.col(left_col)) - F.length(F.col(right_col)))
            <= max_dist
        ),
    )
    out = (
        joined.drop("__bk_l", "__bk_r")
        # a pair found via both its first-token and last-token block is
        # one logical match — distinct() on the full row dedupes it
        # (dist is a pure function of the pair, so rows are identical)
        .withColumn(
            "dist", F.levenshtein(F.col(left_col), F.col(right_col))
        )
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )
    return out


def qgram_edit_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """ALL unordered pairs with levenshtein <= max_dist — lossless.

    The wider-distance complement to ``fuzzy_join_blocked`` (complete
    only at distance 1 on two-token strings): candidate generation by
    positional q-gram count filtering (Gravano et al., "Approximate
    String Joins in a Database (Almost) for Free", VLDB 2001) is
    lossless for ANY max_dist:

    1. each string of length L emits its L-q+1 positional q-grams;
    2. candidate pairs = equi-join on xxhash64(gram) restricted to
       |Δposition| <= max_dist and ||L1|-|L2|| <= max_dist (hash
       collisions only ADD candidates, which verification discards);
    3. count filter: a pair within edit distance k shares a 1-1
       matching of >= max(L1, L2) - q + 1 - k·q position-compatible
       q-grams, and the join's pair count is >= any matching size, so
       dropping pairs below the bound loses nothing;
    4. exact levenshtein verification on the survivors.

    Completeness requires the count bound to stay >= 1, i.e. every
    string at least q·(max_dist+1) chars — shorter strings can be at
    distance k while sharing zero q-grams, so the contract fails loud
    (inline assert_true, no extra job) instead of silently dropping
    pairs.

    Returns (id_1, id_2, dist) with id_1 < id_2. Scale shape: one
    gram explode (fan-out ×L), one equi-join on the gram hash whose
    cost is Σ df(gram)² bounded by gram selectivity (df-cap rare-first
    pruning is the standard dial if a gram goes stop-word dense), one
    (id_1, id_2) count exchange, and a broadcast-or-shuffle join back
    to the two strings for the O(L²) DP on candidates only.
    """
    min_len = q * (max_dist + 1)
    guarded = F.when(
        F.assert_true(
            F.length(F.col(str_col)) >= min_len,
            F.lit(
                f"qgram_edit_join: strings must be >= {min_len} chars "
                f"for lossless q={q}, max_dist={max_dist} filtering"
            ),
        ).isNull(),
        F.col(str_col),
    )
    from .dedup import _spread

    # _spread before the checkpoint (round 14): a small input arrives
    # as a handful of splits and the checkpoint PINS that layout — the
    # gram explode, the broadcast-probe pair expansion (the Σ df²
    # floor of the filter), and the per-pair partial aggregation all
    # run inside the probe-side stage, i.e. on those few cores.
    # Stats-gated no-op at real scale.
    base = _spread(
        df.select(
            F.col(id_col).alias("__id"),
            guarded.alias("__s"),
            F.length(F.col(str_col)).alias("__len"),
        )
    ).localCheckpoint(eager=False)  # reused: gram emit + both verify sides

    grams = base.select(
        "__id",
        "__len",
        F.explode_outer(
            F.expr(
                f"transform(sequence(1, __len - {q} + 1), "
                f"i -> struct(xxhash64(substring(__s, i, {q})) AS k, "
                f"i AS p))"
            )
        ).alias("__g"),
    ).filter(F.col("__g").isNotNull())

    # Position BLOCKS ride the join key (round 14): q-grams over a
    # small alphabet are dense (a 2-gram key space of ~10³ over a
    # corpus-scale gram list makes every key hot), so the k-only
    # equi-join paid Σ df(k)² pairs and the positional |Δp| ≤ max_dist
    # predicate ran as a post-join filter on one skewed hot key per
    # partition. Blocking position into width-(max_dist+1) windows
    # turns the positional filter into part of the equi-key: side a
    # keeps its gram's own block, side b fans each gram out to the 3
    # adjacent blocks, and any |Δp| ≤ max_dist pair lands in EXACTLY
    # one matching (k, block) — side a's block is unique — so the
    # __shared counts (and therefore the output) are bit-identical
    # while the join does ~(positions/width)× less pair work on a
    # ~(positions/width)×-finer key. Measured 5.7s → 1.5s at sf0.1.
    w = max_dist + 1
    a = grams.select(
        F.col("__id").alias("id_1"),
        F.col("__len").alias("l1"),
        F.col("__g.k").alias("k"),
        F.col("__g.p").alias("p1"),
        ((F.col("__g.p") - 1) / w).cast("int").alias("blk"),
    )
    b = grams.select(
        F.col("__id").alias("id_2"),
        F.col("__len").alias("l2"),
        F.col("__g.k").alias("k"),
        F.col("__g.p").alias("p2"),
        F.explode(
            F.array(
                *[
                    ((F.col("__g.p") - 1) / w).cast("int") + F.lit(o)
                    for o in (-1, 0, 1)
                ]
            )
        ).alias("blk"),
    )
    cand = (
        a.join(
            b,
            (a["k"] == b["k"])
            & (a["blk"] == b["blk"])
            & (F.col("id_1") < F.col("id_2"))
            & (F.abs(F.col("p1") - F.col("p2")) <= max_dist)
            & (F.abs(F.col("l1") - F.col("l2")) <= max_dist),
        )
        .groupBy("id_1", "id_2", "l1", "l2")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .filter(
            F.col("__shared")
            >= F.greatest("l1", "l2") - F.lit(q - 1) - F.lit(max_dist * q)
        )
        .select("id_1", "id_2")
    )
    s1 = base.select(F.col("__id").alias("id_1"), F.col("__s").alias("__s1"))
    s2 = base.select(F.col("__id").alias("id_2"), F.col("__s").alias("__s2"))
    return (
        cand.join(s1, "id_1")
        .join(s2, "id_2")
        .withColumn("dist", F.levenshtein("__s1", "__s2").cast("int"))
        .filter(F.col("dist") <= max_dist)
        .select("id_1", "id_2", "dist")
    )
