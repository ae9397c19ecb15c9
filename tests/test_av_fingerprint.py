"""Audio/video fingerprint specs (codecs.afp60, multimodal.audio_fingerprint
/ video_fingerprint): pinned bit math vs loop references, Spark parity over
real WAV/AVI payloads, NULL on undecodable input, middle-frame selection.

Reference parity: these extend the reference's dedup surface (remilia's
middleware dedup is URL-level) to media payloads, mirroring test_phash.py.
"""

from __future__ import annotations

import numpy as np
import pytest

from remilia_spark.datapipe import codecs as C
from remilia_spark.datapipe import multimodal as M


def _afp_loop(samples: np.ndarray) -> int | None:
    """Independent loop re-derivation of the afp60 spec."""
    n = len(samples)
    if n < 61:
        return None
    cl = n // 61
    t = [round(float(s) * 32768.0) for s in samples[: 61 * cl]]
    e = [sum(v * v for v in t[c * cl:(c + 1) * cl]) for c in range(61)]
    return sum(1 << c for c in range(60) if e[c + 1] > e[c])


def test_afp60_matches_loop_reference():
    rng = np.random.RandomState(7)
    for n in (61, 122, 500, 61 * 8 + 3):
        t = rng.randint(-32768, 32768, n).astype(np.int64)
        s = t / 32768.0
        assert C.afp60(s) == _afp_loop(s)


def test_afp60_short_input_is_none():
    assert C.afp60(np.zeros(60)) is None
    assert C.afp60(np.zeros(0)) is None


def test_afp60_single_chunk_bump_flips_at_most_two_bits():
    # bumping one chunk's energy perturbs only the two adjacent delta bits
    amp = (np.arange(61, dtype=np.int64) * 17 % 199) + 1
    base = np.repeat(amp, 8) / 256.0
    bumped = amp.copy()
    bumped[30] += 56
    bumped = np.repeat(bumped, 8) / 256.0
    d = C.afp60(base) ^ C.afp60(bumped)
    assert bin(d).count("1") <= 2
    assert d != 0          # the bump is big enough to flip something


def test_audio_fingerprint_spark_parity_and_null(spark):
    rng = np.random.RandomState(3)
    waves = {i: rng.randint(-32768, 32768, 61 * 8).astype(np.int64) / 32768.0
             for i in range(4)}
    rows = [(i, "audio", bytearray(C.encode_wav(8000, w)))
            for i, w in waves.items()]
    rows.append((98, "audio", bytearray(b"JUNK")))       # undecodable
    rows.append((99, "image", bytearray(b"P6")))         # wrong kind: dropped
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r["afp"]
           for r in M.audio_fingerprint(df, decoder=C.decode_wav).collect()}
    for i, w in waves.items():
        dec_rate, dec_samples = C.decode_wav(C.encode_wav(8000, w))
        assert got[i] == C.afp60(dec_samples)
    assert got[98] is None
    assert 99 not in got


def test_audio_fingerprint_requires_decoder(spark):
    df = spark.createDataFrame([(1, "audio", bytearray(b""))],
                               "media_id long, kind string, payload binary")
    with pytest.raises(NotImplementedError):
        M.audio_fingerprint(df)


def _frames(seed: int, n: int = 5, h: int = 12, w: int = 16):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n)]


def test_video_fingerprint_hashes_middle_frame(spark):
    vids = {i: _frames(i) for i in range(3)}
    vids[3] = _frames(50, n=1)                       # single frame: mid == 0
    rows = [(i, "video", bytearray(C.encode_avi(f, fps=10)))
            for i, f in vids.items()]
    rows.append((98, "video", bytearray(b"RIFFJUNK")))
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r["vfp"]
           for r in M.video_fingerprint(df, decoder=C.decode_avi).collect()}
    for i, f in vids.items():
        assert got[i] == C.dhash60(f[len(f) // 2]), i
    assert got[98] is None
    # middle-frame choice is load-bearing: first frame hash must differ
    assert got[0] != C.dhash60(vids[0][0])


def test_video_fingerprint_requires_decoder(spark):
    df = spark.createDataFrame([(1, "video", bytearray(b""))],
                               "media_id long, kind string, payload binary")
    with pytest.raises(NotImplementedError):
        M.video_fingerprint(df)
