"""Audio fingerprint: determinism, planted-edit recovery, lossless
banding, and separation — the q262 pHash test pattern applied to the
audio member of the multimodal family."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.operators.multimodal import (
    audio_fingerprint64,
    audio_near_dup_pairs,
    hamming_banded_pairs,
)


@pytest.fixture(scope="module")
def audio_blobs(spark):
    """60 synthetic 'waveforms' (text bytes, the stub decode grid)
    plus a planted 2-byte edit of every 5th — known near-dup pairs
    (base_id, base_id + 1000)."""
    import random

    rng = random.Random(13)
    words = ["alpha", "bravo", "carol", "delta", "echos", "fotox",
             "golfy", "hotel", "india", "julie"]
    rows = []
    for i in range(60):
        txt = " ".join(rng.choice(words) for _ in range(60))
        rows.append((i, bytearray(txt.encode())))
        if i % 5 == 0:
            e = bytearray(txt.encode())
            e[10:12] = b"qq"
            rows.append((i + 1000, e))
    return spark.createDataFrame(
        [(i, bytes(b)) for i, b in rows], "blob_id long, content binary"
    ).cache()


def test_fingerprint_deterministic(spark, audio_blobs):
    a = {r.id: r.afp for r in audio_fingerprint64(audio_blobs).collect()}
    b = {r.id: r.afp for r in audio_fingerprint64(audio_blobs).collect()}
    assert a == b
    assert len(a) == 72


def test_planted_edit_recovery(spark, audio_blobs):
    got = {
        (r.id_a, r.id_b)
        for r in audio_near_dup_pairs(audio_blobs, max_hamming=6)
        .collect()
    }
    planted = {(i, i + 1000) for i in range(0, 60, 5)}
    found = {p for p in planted if p in got or (p[1], p[0]) in got}
    assert len(found) == len(planted), (
        f"missed planted edits: {sorted(planted - found)}"
    )


def test_banded_equals_brute_force_two_layouts(spark, audio_blobs):
    """The pigeonhole banding is LOSSLESS: at both the 8×8 (via
    max_hamming=6) and 16×4 (via max_hamming=10) layouts the banded
    join must return EXACTLY the brute-force pair set."""
    sig = audio_fingerprint64(audio_blobs).localCheckpoint(eager=True)
    a = sig.select(F.col("id").alias("id_a"), F.col("afp").alias("pa"))
    b = sig.select(F.col("id").alias("id_b"), F.col("afp").alias("pb"))
    brute = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
            .alias("hamming"),
        )
    )
    for mh in (6, 10):
        want = {
            (r.id_a, r.id_b, r.hamming)
            for r in brute.filter(F.col("hamming") <= mh).collect()
        }
        got = {
            (min(r.id_a, r.id_b), max(r.id_a, r.id_b), r.hamming)
            for r in hamming_banded_pairs(sig, mh, "afp").collect()
        }
        assert got == want, f"banding lost pairs at max_hamming={mh}"


def test_edit_vs_unrelated_separation(spark, audio_blobs):
    """Planted 2-byte edits stay within a small Hamming ball while
    distinct random waveforms stay far — the separation that makes
    the near-dup threshold meaningful (measured: edits ≤ 3-4,
    unrelated ≥ ~10 on the fixed stub grid)."""
    sig = {r.id: r.afp for r in audio_fingerprint64(audio_blobs).collect()}
    popcnt = lambda x: bin(x & (2**64 - 1)).count("1")
    edits = [popcnt(sig[i] ^ sig[i + 1000]) for i in range(0, 60, 5)]
    unrel = [popcnt(sig[i] ^ sig[i + 1]) for i in range(0, 59)]
    assert max(edits) <= 6
    assert min(unrel) > 6 or sum(u > 6 for u in unrel) / len(unrel) > 0.9


def test_validation_fails_before_planning(spark):
    with pytest.raises(ValueError, match=">= 0"):
        audio_near_dup_pairs(None, max_hamming=-1)
    with pytest.raises(ValueError, match="brute-force"):
        audio_near_dup_pairs(None, max_hamming=16)
