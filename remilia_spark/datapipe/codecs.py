"""Pure-Python image codecs — a REAL decoder for the multimodal seam.

The sandbox ships no Pillow/ffmpeg, so ``multimodal``'s default decode is a
stub.  This module proves the seam with two actual uncompressed formats
implementable in ~stdlib+numpy:

* **PPM (P6)** — the netpbm binary RGB format: ASCII header
  (magic, width, height, maxval, ``#`` comments) then a raw RGB raster.
* **BMP (24-bit BI_RGB)** — BITMAPFILEHEADER(14) + BITMAPINFOHEADER(40),
  bottom-up BGR rows padded to 4-byte boundaries.

``decode_auto`` dispatches on magic bytes and returns an ``(H, W, 3)``
uint8 array, or ``None`` for anything unparseable (corrupt header, short
raster, unsupported variant) — never raises, matching the crawl engine's
malformed-input contract.  ``multimodal.extract_features(...,
decoder=decode_auto)`` then runs real pixels through the same distributed
plumbing the stub exercises.
"""

from __future__ import annotations

import struct

import numpy as np


def _ppm_tokens(buf: bytes, n: int, pos: int) -> tuple[list[int], int] | None:
    """Read ``n`` whitespace-separated ASCII ints, skipping ``#`` comments.
    Returns (values, offset-after-last-token) or None on malformed input."""
    vals: list[int] = []
    i = pos
    while len(vals) < n:
        while i < len(buf) and buf[i:i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i:i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j:j + 1].isspace():
            j += 1
        if j == i:
            return None
        try:
            vals.append(int(buf[i:j]))
        except ValueError:
            return None
        i = j
    return vals, i


def decode_ppm(payload: bytes) -> np.ndarray | None:
    """Binary PPM (P6, maxval <= 255) -> (H, W, 3) uint8, or None."""
    if payload is None or not payload.startswith(b"P6"):
        return None
    parsed = _ppm_tokens(payload, 3, 2)
    if parsed is None:
        return None
    (w, h, maxval), i = parsed
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        return None
    i += 1  # exactly one whitespace byte after maxval, per spec
    need = w * h * 3
    raster = payload[i:i + need]
    if len(raster) < need:
        return None
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary PPM bytes (round-trips decode_ppm)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Uncompressed 24-bit BI_RGB BMP -> (H, W, 3) uint8 (RGB), or None."""
    if payload is None or len(payload) < 54 or not payload.startswith(b"BM"):
        return None
    try:
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
    except struct.error:
        return None
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        return None
    if w <= 0 or h == 0:
        return None
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_off + stride * h
    if len(payload) < need:
        return None
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    bgr = np.ascontiguousarray(arr[:, :, ::-1], dtype=np.uint8)
    raster[:, :w * 3] = bgr.reshape(h, w * 3)
    raster = raster[::-1]  # bottom-up
    body = raster.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                           len(body), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + body


def _pil_decode(payload: bytes) -> np.ndarray | None:
    """JPEG/PNG/WebP/… through Pillow when it is importable, else None.

    Kept import-lazy and failure-soft so the pure-Python PPM/BMP codecs
    remain the deterministic test twin everywhere (this sandbox has no
    PIL); on a real cluster `pip install pillow` on the executors makes
    every common web image format decode through the SAME seam with no
    code change."""
    try:
        from io import BytesIO

        from PIL import Image  # noqa: PLC0415 (optional dependency)
    except ImportError:
        return None
    try:
        with Image.open(BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)
    except Exception:
        return None  # corrupt/truncated payload: same contract as codecs


def decode_auto(payload: bytes) -> np.ndarray | None:
    """Magic-byte dispatch over the built-in formats, then the optional
    Pillow branch for everything else (JPEG/PNG/... when PIL is
    installed); None if nothing can decode it."""
    if payload is None:
        return None
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    return _pil_decode(payload)


def resize_nearest(arr: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor downscale so max(H, W) <= max_side (no upscale)."""
    h, w = arr.shape[:2]
    scale = max(h, w) / max_side
    if scale <= 1.0:
        return arr
    nh, nw = max(1, round(h / scale)), max(1, round(w / scale))
    yi = (np.arange(nh) * (h / nh)).astype(np.int64)
    xi = (np.arange(nw) * (w / nw)).astype(np.int64)
    return arr[yi][:, xi]


def dhash60(arr: np.ndarray) -> int:
    """60-bit perceptual difference hash (dHash) over real pixels.

    Pinned spec (integer-exact, so a SQL twin can replay it bit-for-bit):

    * luminance per pixel = ``299*R + 587*G + 114*B`` (plain ints — no
      float, no /1000: only comparisons matter);
    * nearest-neighbor downsample to an 11x6 grid with floor indexing —
      ``src = arr[(gy*H)//6][(gx*W)//11]`` (works for any image >= 1x1);
    * bit ``gy*10 + gx`` is set when grid[gy][gx] > grid[gy][gx+1]
      (6 rows x 10 horizontal comparisons = 60 bits).

    60 bits, not 64, for the same reason the text dedup ops hash lines
    and blocks to 60 bits: the value stays positive in a signed BIGINT
    on every engine (Spark long, DuckDB BIGINT), so band extraction can
    use plain integer division and XOR/bit_count never see a sign bit.
    """
    h, w = arr.shape[:2]
    lum = (299 * arr[:, :, 0].astype(np.int64)
           + 587 * arr[:, :, 1].astype(np.int64)
           + 114 * arr[:, :, 2].astype(np.int64))
    yi = (np.arange(6) * h) // 6
    xi = (np.arange(11) * w) // 11
    g = lum[yi][:, xi]                      # (6, 11) grid
    bits = g[:, :-1] > g[:, 1:]             # (6, 10) comparisons
    weights = (np.int64(1) << (np.arange(6)[:, None] * 10
                               + np.arange(10)[None, :]))
    return int((bits * weights).sum())


def pixel_feature(arr: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic dim-length float32 feature from real pixels: per-chunk
    luminance means over the row-major flattened image, normalized to
    [0, 1] (the real-codec analogue of multimodal._fake_decode)."""
    lum = (0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1]
           + 0.114 * arr[:, :, 2]).ravel()
    chunks = np.array_split(lum.astype(np.float64), dim)
    return (np.array([c.mean() if len(c) else 0.0 for c in chunks])
            / 255.0).astype(np.float32)


# ---------------------------------------------------------------------------
# audio: WAV (PCM) — the real decoder for the audio modality
# ---------------------------------------------------------------------------
# Same philosophy as PPM/BMP above: the sandbox has no soundfile/av, but
# RIFF/WAVE PCM is stdlib-decodable (`wave`), so the audio seam runs REAL
# samples end-to-end; compressed formats (mp3/ogg) plug into the same
# decode_wav signature via soundfile at deployment.

def decode_wav(payload: bytes) -> tuple[int, np.ndarray] | None:
    """(sample_rate, mono float64 samples in [-1, 1]) or None.

    Accepts 8/16/32-bit PCM, any channel count (channels average to mono).
    Never raises — corrupt headers/short payloads return None, matching
    the malformed-input contract.
    """
    import io
    import wave

    if not payload or not bytes(payload).startswith(b"RIFF"):
        return None
    try:
        with wave.open(io.BytesIO(bytes(payload))) as w:
            rate = w.getframerate()
            width = w.getsampwidth()
            nch = w.getnchannels()
            raw = w.readframes(w.getnframes())
    except Exception:
        return None
    if rate <= 0 or nch <= 0 or width not in (1, 2, 4):
        return None
    dt = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}[width]
    a = np.frombuffer(raw, dtype=dt)
    if nch > 1:
        a = a[: len(a) - len(a) % nch].reshape(-1, nch).mean(axis=1)
    a = a.astype(np.float64)
    if width == 1:          # unsigned 8-bit PCM centers on 128
        a = (a - 128.0) / 128.0
    else:
        a = a / float(1 << (8 * width - 1))
    return rate, a


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """Mono 16-bit PCM WAV from float samples in [-1, 1] (fixtures)."""
    import io
    import wave

    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(rate))
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def audio_feature(rate: int, samples: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic dim-length float32 feature from real samples:
    per-chunk RMS over the waveform (the audio analogue of
    ``pixel_feature``'s per-chunk luminance)."""
    chunks = np.array_split(np.asarray(samples, dtype=np.float64), dim)
    return np.array(
        [np.sqrt((c * c).mean()) if len(c) else 0.0 for c in chunks],
        dtype=np.float32)


def afp60(samples: np.ndarray) -> int | None:
    """60-bit audio fingerprint from decoded 16-bit PCM samples — the
    audio analogue of ``dhash60`` (energy-delta hash, a chromaprint-style
    reduction with the FFT stage dropped so the spec stays integer-exact).

    Pinned spec (a SQL twin can replay it bit-for-bit):

    * samples are assumed to come from 16-bit PCM as ``t / 32768`` with
      integer ``t``; the fingerprint reconstructs ``t = round(s * 32768)``
      and works in int64 throughout — no float summation anywhere;
    * the first ``61 * (n // 61)`` samples split into 61 equal chunks,
      chunk energy ``e[c] = sum(t^2)`` over the chunk;
    * bit ``c`` (0..59) is set when ``e[c+1] > e[c]``.

    60 bits for the same signed-BIGINT reason as ``dhash60``.  Returns
    None when fewer than 61 samples exist (no chunk structure to hash).
    """
    s = np.asarray(samples, dtype=np.float64)
    n = len(s)
    if n < 61:
        return None
    chunk_len = n // 61
    t = np.round(s[: 61 * chunk_len] * 32768.0).astype(np.int64)
    e = (t * t).reshape(61, chunk_len).sum(axis=1)
    bits = e[1:] > e[:-1]                   # (60,) comparisons
    return int((bits * (np.int64(1) << np.arange(60))).sum())


# ---------------------------------------------------------------------------
# video: uncompressed AVI (RIFF + BI_RGB '00db' frames) — the real decoder
# for the video modality
# ---------------------------------------------------------------------------
# Same philosophy again: no av/ffmpeg in the sandbox, but the classic AVI
# container with uncompressed DIB frames is struct-decodable, so frame
# sampling runs REAL frames end-to-end; compressed codecs plug into the
# same decode_avi signature via av at deployment.

def encode_avi(frames: list[np.ndarray], fps: int) -> bytes:
    """Minimal uncompressed AVI: RIFF('AVI ') / hdrl(avih + strl(strh
    vids/DIB + strf BITMAPINFOHEADER)) / movi('00db' bottom-up BGR frames
    padded to 4-byte rows).  Fixture writer for the decoder below."""
    if not frames or fps <= 0:
        raise ValueError("need frames and fps > 0")
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) // 4 * 4
    usec = 1_000_000 // int(fps)

    def chunk(cid: bytes, data: bytes) -> bytes:
        return cid + struct.pack("<I", len(data)) + data \
            + (b"\x00" if len(data) % 2 else b"")

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    def dib(arr: np.ndarray) -> bytes:
        rows = []
        for y in range(h - 1, -1, -1):           # bottom-up
            row = arr[y, :, ::-1].astype(np.uint8).tobytes()  # BGR
            rows.append(row + b"\x00" * (stride - len(row)))
        return b"".join(rows)

    avih = struct.pack("<14I", usec, stride * h * int(fps), 0, 0x10,
                       len(frames), 0, 1, stride * h, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIII4h", b"vids", b"DIB ", 0, 0, 0, 0,
                       1, int(fps), 0, len(frames), stride * h, 0xFFFF,
                       0, 0, 0, w, h)
    strf = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, stride * h,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[int, list[np.ndarray]] | None:
    """(usec_per_frame, [(H, W, 3) uint8 frames]) or None.

    Robust RIFF walk: unknown chunks skipped, truncated chunks end the
    walk; accepts '00db'/'00dc' frame chunks carrying BI_RGB rasters.
    Never raises, per the malformed-input contract.
    """
    b = bytes(payload or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    meta: dict = {}
    raws: list[bytes] = []

    def walk(off: int, end: int) -> None:
        while off + 8 <= end:
            cid = b[off:off + 4]
            sz = int.from_bytes(b[off + 4:off + 8], "little")
            ds, de = off + 8, off + 8 + sz
            if de > end:
                return                      # truncated chunk: stop
            if cid == b"LIST":
                walk(ds + 4, de)
            elif cid == b"avih" and sz >= 40:
                u, = struct.unpack_from("<I", b, ds)
                w, h = struct.unpack_from("<II", b, ds + 32)
                meta.update(usec=u, w=w, h=h)
            elif cid in (b"00db", b"00dc"):
                raws.append(b[ds:de])
            off = de + (sz & 1)

    try:
        walk(12, len(b))
    except Exception:
        return None
    w, h, usec = meta.get("w", 0), meta.get("h", 0), meta.get("usec", 0)
    if not raws or w <= 0 or h <= 0 or usec <= 0:
        return None
    stride = (w * 3 + 3) // 4 * 4
    frames = []
    for raw in raws:
        if len(raw) < stride * h:
            return None
        a = np.frombuffer(raw[: stride * h], dtype=np.uint8)
        a = a.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        frames.append(a[::-1, :, ::-1].copy())   # bottom-up BGR -> RGB
    return usec, frames
