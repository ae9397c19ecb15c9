"""WAV codec + audio features (codecs.decode_wav / multimodal.
extract_audio_features): real PCM round-trips, hand-computed RMS,
malformed-input contract, Arrow plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from remilia_spark.datapipe import codecs


def test_wav_roundtrip_exact_int16():
    rng = np.random.default_rng(7)
    pcm16 = rng.integers(-32767, 32767, size=800, dtype=np.int64)
    samples = pcm16 / 32767.0
    rate, got = codecs.decode_wav(codecs.encode_wav(16000, samples))
    assert rate == 16000 and len(got) == 800
    # encode quantizes to int16; decode divides by 2^15 — reconstruct
    np.testing.assert_array_equal(
        np.round(got * 32768.0).astype(np.int64),
        np.round(samples * 32767.0).astype(np.int64))


def test_constant_amplitude_rms():
    samples = np.full(1000, 0.5)
    payload = codecs.encode_wav(8000, samples)
    rate, got = codecs.decode_wav(payload)
    feat = codecs.audio_feature(rate, got, dim=4)
    # encode truncates toward zero (astype int16), decode divides by 2^15
    q = int(0.5 * 32767) / 32768.0
    assert feat.shape == (4,)
    np.testing.assert_allclose(feat, q, rtol=0, atol=1e-7)


def test_malformed_inputs():
    assert codecs.decode_wav(b"") is None
    assert codecs.decode_wav(None) is None
    assert codecs.decode_wav(b"RIFFgarbage") is None
    assert codecs.decode_wav(b"\x89" + b"PNG not audio") is None
    # image codec bytes are not audio
    img = codecs.encode_ppm(np.zeros((2, 2, 3), dtype=np.uint8))
    assert codecs.decode_wav(img) is None


def test_stereo_mixes_to_mono():
    import io
    import wave

    left = (np.full(100, 0.25) * 32767).astype("<i2")
    right = (np.full(100, 0.75) * 32767).astype("<i2")
    inter = np.empty(200, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(inter.tobytes())
    rate, got = codecs.decode_wav(buf.getvalue())
    assert rate == 44100 and len(got) == 100
    np.testing.assert_allclose(got, 0.5, atol=1e-3)


def test_map_in_pandas_plumbing(spark):
    from remilia_spark.datapipe import multimodal

    tone = codecs.encode_wav(8000, np.full(4000, 0.5))
    rows = [(1, "audio", bytearray(tone)),
            (2, "audio", bytearray(b"not a wav")),
            (3, "image", bytearray(b"ignored - wrong kind")),
            (4, "audio", None)]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary")
    out = {r["media_id"]: r for r in
           multimodal.extract_audio_features(df, dim=4).collect()}
    assert set(out) == {1, 2, 4}          # image row filtered by kind
    assert out[1]["sample_rate"] == 8000
    assert out[1]["n_samples"] == 4000
    assert out[1]["duration_ms"] == 500
    q = int(0.5 * 32767) / 32768.0
    assert out[1]["feature"] == pytest.approx([q] * 4, abs=1e-6)
    for bad in (2, 4):
        assert out[bad]["sample_rate"] == 0
        assert out[bad]["feature"] == [0.0] * 4
