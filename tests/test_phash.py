"""Perceptual-hash image near-dup: dhash60 (pinned integer spec), the
perceptual_hash mapInPandas seam, and the generic hamming-band pair join
(shared by SimHash text near-dup and image phash near-dup)."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from remilia_spark.datapipe import codecs as C
from remilia_spark.datapipe import multimodal as M
from remilia_spark.datapipe.dedup import hamming_near_duplicates


def _dhash_ref(arr: np.ndarray) -> int:
    """Independent loop-based reimplementation of the pinned spec."""
    h, w = arr.shape[:2]
    grid = [[299 * int(arr[(gy * h) // 6][(gx * w) // 11][0])
             + 587 * int(arr[(gy * h) // 6][(gx * w) // 11][1])
             + 114 * int(arr[(gy * h) // 6][(gx * w) // 11][2])
             for gx in range(11)] for gy in range(6)]
    out = 0
    for gy in range(6):
        for gx in range(10):
            if grid[gy][gx] > grid[gy][gx + 1]:
                out |= 1 << (gy * 10 + gx)
    return out


def test_dhash60_matches_loop_reference():
    for seed, h, w in [(1, 6, 11), (2, 12, 16), (3, 3, 5), (4, 40, 7),
                       (5, 1, 1)]:
        img = np.random.RandomState(seed).randint(
            0, 256, (h, w, 3), dtype=np.uint8)
        got = C.dhash60(img)
        assert got == _dhash_ref(img)
        assert 0 <= got < (1 << 60)


def test_dhash60_alternating_rows_hand_value():
    # 11x6 image == its own grid; R alternates 1,0,1,0.. with G=B=0, so
    # every row contributes bits at even comparison positions
    img = np.zeros((6, 11, 3), dtype=np.uint8)
    img[:, ::2, 0] = 1
    row_bits = sum(1 << x for x in range(0, 10, 2))
    expected = sum(row_bits << (gy * 10) for gy in range(6))
    assert C.dhash60(img) == expected


def test_dhash60_near_dup_vs_distinct():
    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, (12, 16, 3), dtype=np.uint8)
    # brightening one image column moves one grid column: few bits flip
    tweaked = base.copy()
    tweaked[:, 0, :] = np.minimum(255, tweaked[:, 0, :].astype(int) + 90)
    other = rng.randint(0, 256, (12, 16, 3), dtype=np.uint8)
    d_near = bin(C.dhash60(base) ^ C.dhash60(tweaked)).count("1")
    d_far = bin(C.dhash60(base) ^ C.dhash60(other)).count("1")
    assert d_near <= 6
    assert d_far > 10


def test_perceptual_hash_spark_parity_and_null(spark):
    imgs = {i: np.random.RandomState(i).randint(
        0, 256, (12, 16, 3), dtype=np.uint8) for i in range(6)}
    rows = [(i, bytearray(C.encode_ppm(a))) for i, a in imgs.items()]
    rows.append((99, bytearray(b"JUNK")))   # undecodable -> NULL phash
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r["phash"]
           for r in M.perceptual_hash(df, decoder=C.decode_auto).collect()}
    for i, a in imgs.items():
        assert got[i] == C.dhash60(a)
    assert got[99] is None


def test_perceptual_hash_requires_decoder(spark):
    df = spark.createDataFrame([(1, bytearray(b""))],
                               "media_id long, payload binary")
    with pytest.raises(NotImplementedError):
        M.perceptual_hash(df)


def test_hamming_near_duplicates_equals_brute_force(spark):
    rng = np.random.RandomState(11)
    hashes = [int(x) for x in rng.randint(0, 1 << 60, 50, dtype=np.int64)]
    # plant close pairs: copies with 0 / 2 / 5 / 7 bits flipped
    hashes += [hashes[0],
               hashes[1] ^ 0b101,
               hashes[2] ^ ((1 << 59) | (1 << 30) | (1 << 13)
                            | (1 << 7) | 1)]
    hashes.append(hashes[3] ^ ((1 << 7) - 1))   # 7 bits: must NOT match
    hashes = [h & ((1 << 60) - 1) for h in hashes]
    df = spark.createDataFrame(list(enumerate(hashes)), "id long, h long")
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in
           hamming_near_duplicates(df, "id", "h", bits=60, n_bands=6,
                                   max_hamming=5).collect()}
    want = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(hashes), 2):
        d = bin(a ^ b).count("1")
        if d <= 5:
            want.add((i, j, d))
    assert got == want
    assert any(d == 0 for _, _, d in want)      # the planted exact dup
    assert any(d == 5 for _, _, d in want)      # the planted 5-bit pair


def test_hamming_near_duplicates_validates_bands():
    with pytest.raises(ValueError):
        hamming_near_duplicates(None, bits=48, n_bands=4, max_hamming=4)
