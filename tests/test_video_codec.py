"""AVI codec + real frame sampling (codecs.encode_avi/decode_avi,
multimodal.frame_sample with a real decoder): exact frame round-trips,
timestamp->frame selection, malformed-input contract, Arrow plumbing."""

from __future__ import annotations

import numpy as np

from remilia_spark.datapipe import codecs, multimodal


def _frames(n, w=16, h=12, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            for _ in range(n)]


def test_avi_roundtrip_exact():
    frames = _frames(5)
    usec, got = codecs.decode_avi(codecs.encode_avi(frames, fps=10))
    assert usec == 100_000 and len(got) == 5
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a, b)


def test_avi_odd_width_padding():
    frames = _frames(2, w=7, h=3)  # stride 21 -> padded to 24
    usec, got = codecs.decode_avi(codecs.encode_avi(frames, fps=25))
    assert usec == 40_000
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a, b)


def test_avi_malformed():
    assert codecs.decode_avi(b"") is None
    assert codecs.decode_avi(None) is None
    assert codecs.decode_avi(b"RIFF" + b"\x00" * 20) is None
    good = codecs.encode_avi(_frames(2), fps=10)
    assert codecs.decode_avi(good[:60]) is None      # truncated
    wav = codecs.encode_wav(8000, np.zeros(10))
    assert codecs.decode_avi(wav) is None            # RIFF but WAVE


def test_frame_sample_real_decoder(spark):
    frames = _frames(5)  # fps 10 -> 100ms/frame, duration 500ms
    payload = codecs.encode_avi(frames, fps=10)
    rows = [(1, "video", bytearray(payload), 16, 12, 500),
            (2, "video", bytearray(b"not an avi"), 0, 0, 300),
            (3, "image", bytearray(b"filtered by kind"), 1, 1, 0)]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, width int, "
              "height int, duration_ms long")
    out = multimodal.frame_sample(df, every_ms=200,
                                  decoder=codecs.decode_avi, dim=4)
    got = {(r["media_id"], r["frame_ms"]): r["frame_feature"]
           for r in out.collect()}
    # video 1: ts 0,200,400 -> frames 0,2,4; features = real pixel chunks
    assert set(k for k in got if k[0] == 1) == {(1, 0), (1, 200), (1, 400)}
    for ms, fidx in ((0, 0), (200, 2), (400, 4)):
        want = codecs.pixel_feature(frames[fidx], 4).tolist()
        assert got[(1, ms)] == want, ms
    # undecodable payload: zero features, rows still emitted
    assert got[(2, 0)] == [0.0] * 4 and got[(2, 200)] == [0.0] * 4
    # image row filtered
    assert not [k for k in got if k[0] == 3]


def test_frame_sample_clamps_past_end(spark):
    payload = codecs.encode_avi(_frames(2), fps=10)  # 200ms of video
    df = spark.createDataFrame(
        [(1, "video", bytearray(payload), 16, 12, 900)],
        "media_id long, kind string, payload binary, width int, "
        "height int, duration_ms long")
    out = multimodal.frame_sample(df, every_ms=400,
                                  decoder=codecs.decode_avi, dim=4).collect()
    # ts 0,400,800: 400/800 clamp to the last frame
    by_ms = {r["frame_ms"]: r["frame_feature"] for r in out}
    assert by_ms[400] == by_ms[800]
    assert by_ms[0] != by_ms[400]
