"""Multimodal (image/audio/video) column plumbing.

Media payloads ride as opaque ``binary`` columns with typed metadata —
exactly like the crawl engine's ``html:binary``.  The Spark-side machinery
(schemas, Arrow batch shapes, ``mapInPandas`` signatures, partitioning) is
real and tested; the codec calls themselves are stubbed because this
container ships no media libraries (Pillow/ffmpeg):

* ``decoder=<callable>`` plugs a real ``bytes -> (H, W, 3) uint8 | None``
  decoder into the seam — ``datapipe.codecs.decode_auto`` is a pure-Python
  PPM/BMP implementation proving it with real pixels (tests/
  test_multimodal_codec.py); PIL.Image.open / av.open drop in the same way;
* ``decoder=None, decode_stub=True`` (default) runs a deterministic fake
  decoder so the full distributed path executes even with no codec libs;
* ``decoder=None, decode_stub=False`` raises ``NotImplementedError`` at
  the seam.

Batch-size note for 100 TB: media rows are orders of magnitude wider than
text — callers should set ``spark.sql.execution.arrow.maxRecordsPerBatch``
low (e.g. 64) and partition by size, not row count.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "width int, height int, duration_ms int")

FEATURES_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes long"

THUMB_SCHEMA = "media_id long, thumb binary, thumb_w int, thumb_h int"


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a pixel/sample decode: a dim-length
    float feature derived from byte statistics (stable across runs)."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    a = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(a.astype(np.float32), dim)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks],
                    dtype=np.float32) / 255.0


def extract_features(df: DataFrame, dim: int = 8,
                     decode_stub: bool = True,
                     decoder=None) -> DataFrame:
    """binary payload -> fixed-width float feature, via mapInPandas.

    ``decoder``: real ``bytes -> (H, W, 3) uint8 | None`` pixel decoder
    (e.g. ``codecs.decode_auto``); undecodable payloads yield a zero
    feature, never an exception (the crawl engine's malformed-input
    contract)."""
    from .codecs import pixel_feature

    def one(p, dim):
        if decoder is not None:
            arr = decoder(bytes(p) if p is not None else b"")
            return (pixel_feature(arr, dim) if arr is not None
                    else np.zeros(dim, dtype=np.float32))
        if not decode_stub:
            raise NotImplementedError(
                "real media decode needs a decoder callable (see "
                "datapipe.codecs) or Pillow/av; plug in here")
        return _fake_decode(p, dim)

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [one(p, dim).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0),
            })

    return df.select("media_id", "kind", "payload").mapInPandas(
        fn, FEATURES_SCHEMA)


PHASH_SCHEMA = "media_id long, phash long"


def perceptual_hash(df: DataFrame, decoder=None) -> DataFrame:
    """binary payload -> 60-bit perceptual dHash (``codecs.dhash60``).

    One decode + hash per payload per Arrow batch; undecodable payloads
    yield a NULL ``phash`` (filtered by the dedup join, never a fake
    bucket — hashing garbage would invent near-dup pairs).  Feed the
    output to ``dedup.hamming_near_duplicates`` for image near-dup
    detection; the hash rows are ~16 bytes each, so the dedup stage
    shuffles hashes, never pixels."""
    from .codecs import dhash60

    if decoder is None:
        raise NotImplementedError(
            "perceptual_hash needs a real pixel decoder (see "
            "datapipe.codecs.decode_auto) — a byte-statistics stub would "
            "hash compression artifacts, not image content")

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf["payload"]:
                arr = decoder(bytes(p) if p is not None else b"")
                hashes.append(dhash60(arr) if arr is not None else None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "phash": pd.array(hashes, dtype="Int64"),
            })

    return df.select("media_id", "payload").mapInPandas(fn, PHASH_SCHEMA)


def thumbnail(df: DataFrame, max_side: int = 32,
              decode_stub: bool = True, decoder=None) -> DataFrame:
    """Downscale thumbnails.  With a real ``decoder``, pixels are decoded,
    nearest-neighbor resized, and re-encoded as PPM bytes (codecs module);
    the default stub passes byte-truncated payloads through the same
    Arrow/binary plumbing (a real impl swaps the body, not the shape)."""
    from .codecs import encode_ppm, resize_nearest

    def real(p):
        arr = decoder(bytes(p) if p is not None else b"")
        if arr is None:
            return b"", 0, 0
        t = resize_nearest(arr, max_side)
        return encode_ppm(t), t.shape[1], t.shape[0]

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is not None:
                out = [real(p) for p in pdf["payload"]]
                yield pd.DataFrame({
                    "media_id": pdf["media_id"],
                    "thumb": [t for t, _, _ in out],
                    "thumb_w": [w for _, w, _ in out],
                    "thumb_h": [h for _, _, h in out],
                })
                continue
            if not decode_stub:
                raise NotImplementedError(
                    "real resize needs a decoder callable (see "
                    "datapipe.codecs) or Pillow; plug in here")
            cap = max_side * max_side
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "thumb": pdf["payload"].map(
                    lambda p: bytes(p[:cap]) if p is not None else b""),
                # nulls arrive as NaN in pandas — pd.notna, not truthiness
                "thumb_w": [min(max_side, int(w)) if pd.notna(w) else 0
                            for w in pdf["width"]],
                "thumb_h": [min(max_side, int(h)) if pd.notna(h) else 0
                            for h in pdf["height"]],
            })

    return df.select("media_id", "payload", "width", "height").mapInPandas(
        fn, THUMB_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000,
                 decode_stub: bool = True, decoder=None,
                 dim: int = 8) -> DataFrame:
    """Video frame sampling: one row per sampled timestamp; the explode
    happens in Spark (scales), only the per-frame decode runs in Python.

    ``decoder``: real ``bytes -> (usec_per_frame, [frames]) | None`` —
    ``codecs.decode_avi`` for uncompressed AVI in this sandbox (av/ffmpeg
    wrap to the same signature for compressed codecs at deployment).
    Each payload decodes ONCE per Arrow batch (cached by identity), then
    every sampled timestamp picks its frame and emits the per-chunk
    luminance feature; undecodable payloads yield zero features."""
    from pyspark.sql import functions as F

    ts = F.explode(
        F.sequence(F.lit(0),
                   F.greatest(F.coalesce("duration_ms", F.lit(0)) - 1,
                              F.lit(0)),
                   F.lit(every_ms))).alias("frame_ms")
    frames = df.where(F.col("kind") == "video").select(
        "media_id", "kind", "payload", ts)

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import pixel_feature

        for pdf in batches:
            if decoder is not None:
                # the Spark-side explode duplicates the payload per sampled
                # frame; key the decode cache on the bytes value so each
                # video still decodes once per batch
                cache: dict[bytes, tuple | None] = {}
                feats = []
                for p, t in zip(pdf["payload"], pdf["frame_ms"]):
                    key = bytes(p) if p is not None else b""
                    if key not in cache:
                        cache[key] = decoder(key)
                    dec = cache[key]
                    if dec is None:
                        feats.append([0.0] * dim)
                        continue
                    usec, frs = dec
                    idx = min(len(frs) - 1, int(t) * 1000 // max(1, usec))
                    feats.append(pixel_feature(frs[idx], dim).tolist())
                yield pd.DataFrame({
                    "media_id": pdf["media_id"],
                    "frame_ms": pdf["frame_ms"],
                    "frame_feature": feats,
                })
                continue
            if not decode_stub:
                raise NotImplementedError(
                    "real frame extraction needs a decoder callable (see "
                    "datapipe.codecs.decode_avi) or av/ffmpeg; plug in here")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "frame_ms": pdf["frame_ms"],
                "frame_feature": [
                    _fake_decode(
                        (bytes(p) if p is not None else b"") + int(t).to_bytes(4, "little"),
                        dim).tolist()
                    for p, t in zip(pdf["payload"], pdf["frame_ms"])],
            })

    return frames.mapInPandas(
        fn, "media_id long, frame_ms long, frame_feature array<float>")


AUDIO_FEATURES_SCHEMA = ("media_id long, kind string, sample_rate int, "
                         "n_samples long, duration_ms long, "
                         "feature array<float>")


def extract_audio_features(df: DataFrame, dim: int = 8,
                           decoder=None) -> DataFrame:
    """audio binary payload -> (rate, duration, per-chunk RMS feature).

    ``decoder``: ``bytes -> (rate, mono float64 samples) | None`` —
    ``codecs.decode_wav`` for real PCM in this sandbox; soundfile/av wrap
    to the same signature for compressed formats at deployment.
    Undecodable payloads yield rate 0 / empty-duration zero features,
    never an exception.  Same Arrow-batch shape notes as
    ``extract_features``.
    """
    from .codecs import audio_feature, decode_wav

    dec = decoder or decode_wav

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, counts, durs, feats = [], [], [], []
            for p in pdf["payload"]:
                out = dec(bytes(p) if p is not None else b"")
                if out is None:
                    rates.append(0)
                    counts.append(0)
                    durs.append(0)
                    feats.append([0.0] * dim)
                    continue
                rate, samples = out
                rates.append(int(rate))
                counts.append(int(len(samples)))
                durs.append(int(len(samples) * 1000 // max(1, rate)))
                feats.append(audio_feature(rate, samples, dim).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "sample_rate": rates,
                "n_samples": counts,
                "duration_ms": durs,
                "feature": feats,
            })

    return (df.where(F.col("kind") == "audio")
            .select("media_id", "kind", "payload")
            .mapInPandas(fn, AUDIO_FEATURES_SCHEMA))


AFP_SCHEMA = "media_id long, afp long"

VFP_SCHEMA = "media_id long, vfp long"


def audio_fingerprint(df: DataFrame, decoder=None) -> DataFrame:
    """audio binary payload -> 60-bit energy-delta fingerprint
    (``codecs.afp60``) — the audio twin of ``perceptual_hash``.

    One decode + hash per payload per Arrow batch; undecodable or
    too-short payloads yield NULL (filtered by the dedup join, never a
    fake bucket).  Feed the output to ``dedup.hamming_near_duplicates``
    for audio near-dup detection: only ~16-byte (id, hash) rows leave
    this stage, so the dedup shuffle moves hashes, never waveforms."""
    from .codecs import afp60, decode_wav

    dec = decoder
    if dec is None:
        raise NotImplementedError(
            "audio_fingerprint needs a real sample decoder (see "
            "datapipe.codecs.decode_wav) — a byte-statistics stub would "
            "hash container framing, not audio content")

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf["payload"]:
                out = dec(bytes(p) if p is not None else b"")
                hashes.append(afp60(out[1]) if out is not None else None)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "afp": pd.array(hashes, dtype="Int64"),
            })

    return (df.where(F.col("kind") == "audio")
            .select("media_id", "payload").mapInPandas(fn, AFP_SCHEMA))


def video_fingerprint(df: DataFrame, decoder=None) -> DataFrame:
    """video binary payload -> 60-bit perceptual hash of the MIDDLE frame
    (``codecs.dhash60`` over frame ``n_frames // 2``) — the video twin of
    ``perceptual_hash``.

    The middle frame (not the first) survives leading title cards /
    fade-ins; a production variant hashes k sampled frames and
    near-dups on any-band agreement, but one pinned frame keeps the
    spec SQL-replayable.  Undecodable payloads yield NULL.  Same
    hash-not-payload shuffle property as ``audio_fingerprint``."""
    from .codecs import dhash60

    if decoder is None:
        raise NotImplementedError(
            "video_fingerprint needs a real frame decoder (see "
            "datapipe.codecs.decode_avi) — av/ffmpeg wrap to the same "
            "(usec_per_frame, [frames]) signature at deployment")

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf["payload"]:
                out = decoder(bytes(p) if p is not None else b"")
                if out is None or not out[1]:
                    hashes.append(None)
                    continue
                frames = out[1]
                hashes.append(dhash60(frames[len(frames) // 2]))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "vfp": pd.array(hashes, dtype="Int64"),
            })

    return (df.where(F.col("kind") == "video")
            .select("media_id", "payload").mapInPandas(fn, VFP_SCHEMA))
