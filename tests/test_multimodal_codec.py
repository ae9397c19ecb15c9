"""Real-codec proof for the multimodal seam (VERDICT r2 #6): a pure-Python
PPM/BMP decoder plugs into the same distributed plumbing the stub
exercises, and real pixels survive the Spark round-trip exactly."""

from __future__ import annotations

import numpy as np
import pytest

from remilia_spark.datapipe import codecs as C
from remilia_spark.datapipe import multimodal as M


def _img(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(
        0, 256, (h, w, 3), dtype=np.uint8)


def test_roundtrips_and_malformed():
    img = _img(1, 11, 7)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(img)), img)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)
    # BMP row padding differs when width % 4 != 0 — cover both
    img2 = _img(2, 5, 8)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img2)), img2)
    for bad in (None, b"", b"P6", b"P6\n2 2\n255\nxx", b"BM\0\0", b"JUNK",
                b"P6\n-3 2\n255\n" + b"\0" * 18):
        assert C.decode_auto(bad) is None
    # comments + inline whitespace in the PPM header
    ppm = b"P6 # c\n7 11\n# c2\n255\n" + img.tobytes()
    assert np.array_equal(C.decode_ppm(ppm), img)


def test_resize_nearest_exact():
    img = _img(3, 8, 4)
    r = C.resize_nearest(img, 4)
    assert r.shape == (4, 2, 3)
    # nearest-neighbor: every output pixel is literally a source pixel
    yi = (np.arange(4) * 2).astype(int)
    xi = (np.arange(2) * 2).astype(int)
    assert np.array_equal(r, img[yi][:, xi])
    assert C.resize_nearest(img, 16) is img  # no upscale


@pytest.fixture()
def media_df(spark):
    imgs = {i: _img(10 + i, 6 + i, 5 + i) for i in range(4)}
    rows = [
        (0, "image", bytearray(C.encode_ppm(imgs[0])),
         imgs[0].shape[1], imgs[0].shape[0], None),
        (1, "image", bytearray(C.encode_bmp(imgs[1])),
         imgs[1].shape[1], imgs[1].shape[0], None),
        (2, "image", bytearray(b"not an image"), None, None, None),
        (3, "image", bytearray(C.encode_ppm(imgs[3])),
         imgs[3].shape[1], imgs[3].shape[0], None),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA), imgs


def test_extract_features_with_real_decoder(spark, media_df):
    df, imgs = media_df
    out = {r["media_id"]: r
           for r in M.extract_features(df, dim=8,
                                       decoder=C.decode_auto).collect()}
    assert set(out) == {0, 1, 2, 3}
    for i in (0, 1, 3):
        want = C.pixel_feature(imgs[i], 8)
        got = np.array(out[i]["feature"], dtype=np.float32)
        assert np.allclose(got, want, atol=0), i  # exact float32 match
    # undecodable payload -> zero feature, not an exception
    assert all(v == 0.0 for v in out[2]["feature"])


def test_thumbnail_with_real_decoder(spark, media_df):
    df, imgs = media_df
    out = {r["media_id"]: r
           for r in M.thumbnail(df, max_side=4,
                                decoder=C.decode_auto).collect()}
    for i in (0, 1, 3):
        thumb = C.decode_ppm(bytes(out[i]["thumb"]))
        want = C.resize_nearest(imgs[i], 4)
        assert np.array_equal(thumb, want), i
        assert out[i]["thumb_h"] == want.shape[0]
        assert out[i]["thumb_w"] == want.shape[1]
    assert bytes(out[2]["thumb"]) == b""  # undecodable -> empty, no throw


def test_stub_path_still_default(spark, media_df):
    """decoder=None keeps the deterministic stub (sandbox default)."""
    df, _ = media_df
    rows = M.extract_features(df, dim=8).collect()
    assert len(rows) == 4 and all(len(r["feature"]) == 8 for r in rows)


def test_pil_branch_without_pil_returns_none():
    """Sandbox branch: no Pillow installed -> unknown magic bytes decode
    to None through decode_auto (the PPM/BMP fast paths are untouched)."""
    import importlib.util
    assert importlib.util.find_spec("PIL") is None  # sandbox precondition
    assert C.decode_auto(b"\x89PNG\r\n\x1a\nnot-a-real-png") is None
    assert C.decode_auto(b"\xff\xd8\xff\xe0jfif-ish") is None


def test_pil_branch_with_stub_pil(monkeypatch):
    """With-PIL branch: a stub PIL in sys.modules proves decode_auto
    routes non-PPM/BMP payloads through Image.open -> convert('RGB') ->
    ndarray, i.e. installing Pillow on a cluster activates real JPEG/PNG
    decode with no code change."""
    import sys
    import types

    want = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)

    class _Img:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def convert(self, mode):
            assert mode == "RGB"
            return want

    fake_image = types.SimpleNamespace(open=lambda fp: _Img())
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image",
                        types.ModuleType("PIL.Image"))
    got = C.decode_auto(b"\xff\xd8\xff\xe0fake-jpeg")
    assert np.array_equal(got, want)
    # PPM fast path does NOT go through the stub
    ppm = C.encode_ppm(want)
    assert np.array_equal(C.decode_auto(ppm), want)
