"""Multimodal span plumbing: media columns as opaque binary + typed metadata.

The interleaved ``documents.spans`` schema (driver input_hint) carries media
spans as ``media_ref`` URIs. This module provides the Spark-side plumbing a
training pipeline needs — schema, partitioning, Arrow batch shape — with the
actual codec work stubbed (no image/audio libs in this container):

- ``media_manifest``: explode media spans into a (doc_id, media_ref, kind,
  offset) manifest — pure DataFrame ops, preserves span order via offset.
- ``fetch_media_stub``: resolves refs to (bytes, content_type). Stubbed
  deterministically from the ref hash; a real deployment swaps the fetch
  closure for an object-store client. Shape (mapInPandas over Arrow
  batches, one connection per batch) is the production pattern.
- ``decode_image_features``: batch decode + feature extraction. Real
  decoders: PIL when importable (any format it knows), else pure-Python
  PPM (P6) and BMP parsers — width/height from the header, features a
  normalized byte histogram of the pixel stream. Undecodable payloads
  yield NULL columns (corrupt media must not kill a 100-TB batch job).
  ``fake=True`` replaces decode with a deterministic hash expansion of the
  payload so downstream operators (ANN, dedup) are testable end-to-end on
  the stub fetch's pseudo-blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def media_manifest(documents: DataFrame) -> DataFrame:
    """All media spans with document + position context (order-preserving
    projection; never mutates ``spans``)."""
    return (
        documents.select("doc_id", F.posexplode("spans").alias("pos", "s"))
        .where(F.col("s.kind") == "media")
        .select(
            "doc_id",
            F.col("pos").cast("int").alias("span_index"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
        )
    )


_FETCH_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("payload", BinaryType()),
        StructField("content_type", StringType()),
    ]
)


def fetch_media_stub(manifest: DataFrame) -> DataFrame:
    """Resolve media refs to payload bytes. STUB: payload is a deterministic
    64-byte pseudo-blob derived from the ref (sha-like expansion) — swap the
    inner closure for an object-store GET in production; the mapInPandas
    batch shape (vectorized, one client per batch) is the real pattern."""

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = [
                hashlib.sha256(ref.encode()).digest() * 2 if ref else None
                for ref in pdf["media_ref"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "payload": payloads,
                    "content_type": ["application/octet-stream"] * len(pdf),
                }
            )

    return manifest.select("doc_id", "media_ref").mapInPandas(_fetch, _FETCH_SCHEMA)


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _parse_ppm(b: bytes) -> tuple[int, int, bytes] | None:
    """Pure-Python binary PPM (P6) parser → (width, height, pixel bytes)."""
    if not b.startswith(b"P6"):
        return None
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3 and i < len(b):
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":  # comment runs to end of line
            while i < len(b) and b[i : i + 1] not in (b"\n", b"\r"):
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        toks.append(b[i:j])
        i = j
    if len(toks) < 3:
        return None
    i += 1  # exactly one whitespace byte after maxval, then raster
    try:
        w, h, maxval = (int(t) for t in toks)
    except ValueError:
        return None
    if w <= 0 or h <= 0:
        return None
    if maxval > 255:
        # 16-bit P6 uses TWO bytes per sample: slicing w*h*3 would hand a
        # mis-aligned half-raster to the histogram — plausible-looking but
        # wrong features. Undecodable here → the documented NULL path.
        return None
    return w, h, b[i : i + w * h * 3]


def _parse_bmp(b: bytes) -> tuple[int, int, bytes] | None:
    """BMP header parse (BITMAPINFOHEADER) → (width, height, pixel bytes).

    Only uncompressed 24/32-bpp bitmaps are decodable here: RLE-compressed or
    palette (1/4/8-bpp) payloads would yield a garbage pixel stream, so they
    return None → the documented NULL-for-undecodable path (ADVICE r2).
    Per-row padding (rows are 4-byte aligned) is stripped so the histogram
    sees pixel bytes only."""
    import struct

    if not b.startswith(b"BM") or len(b) < 54:
        return None
    pixel_off = struct.unpack_from("<I", b, 10)[0]
    w = struct.unpack_from("<i", b, 18)[0]
    h = abs(struct.unpack_from("<i", b, 22)[0])  # negative = top-down rows
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if w <= 0 or h <= 0 or pixel_off > len(b):
        return None
    if bpp not in (24, 32) or compression != 0:
        return None
    bytes_per_px = bpp // 8
    stride = (w * bytes_per_px + 3) & ~3  # rows padded to 4-byte boundaries
    raster = b[pixel_off : pixel_off + stride * h]
    if stride == w * bytes_per_px:
        return w, h, raster
    rows = [raster[r * stride : r * stride + w * bytes_per_px] for r in range(h)]
    return w, h, b"".join(rows)


def _byte_hist(pixels: bytes, dim: int) -> list[float]:
    """Normalized histogram of the pixel byte stream folded to ``dim``
    buckets — a cheap, codec-agnostic image feature."""
    if not pixels:
        return [0.0] * dim
    arr = np.frombuffer(pixels, dtype=np.uint8)
    hist = np.bincount(arr >> max(0, 8 - (dim - 1).bit_length()), minlength=dim)
    # fold any excess buckets (dim not a power of two) into the last one
    if len(hist) > dim:
        hist = np.concatenate([hist[: dim - 1], [hist[dim - 1 :].sum()]])
    return (hist.astype(np.float32) / np.float32(len(arr))).tolist()


def decode_image_features(
    media: DataFrame, fake: bool = False, feature_dim: int = 8
) -> DataFrame:
    """Decode payloads and emit (width, height, features).

    Real decoders, tried in order: PIL when importable (any format it
    knows), then pure-Python PPM (P6) and BMP header parsers. Features are
    a normalized byte histogram of the decoded pixel stream folded into
    ``feature_dim`` buckets. Undecodable or NULL payloads produce NULL
    width/height/features rather than failing the job.

    With ``fake=True`` decode is replaced by a deterministic hash expansion
    of the payload (the test double matching ``fetch_media_stub``'s
    pseudo-blobs), keeping downstream ANN/dedup operators testable without
    real images.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image

            have_pil = True
        except ImportError:
            have_pil = False

        def _real_one(payload: bytes):
            if have_pil:
                import io

                try:
                    with Image.open(io.BytesIO(payload)) as im:
                        w, h = im.size
                        return w, h, im.tobytes()
                except Exception:
                    pass  # fall through to the pure-Python parsers
            return _parse_ppm(payload) or _parse_bmp(payload)

        for pdf in batches:
            feats, ws, hs = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    ws.append(None)
                    hs.append(None)
                    continue
                payload = bytes(payload)
                if fake:
                    # same corrupt→NULL contract as the real path: a short
                    # or non-word-aligned payload must not kill the batch
                    # job (frombuffer raises on length % 4, raw[1] on < 8)
                    head = payload[: feature_dim * 4]
                    head = head[: len(head) - len(head) % 4]
                    if len(head) < 8:
                        feats.append(None)
                        ws.append(None)
                        hs.append(None)
                        continue
                    raw = np.frombuffer(head, dtype=np.uint32)
                    v = (raw % 1000).astype(np.float32) / 1000.0
                    feats.append(v.tolist())
                    ws.append(int(raw[0] % 1920) + 1)
                    hs.append(int(raw[1] % 1080) + 1)
                    continue
                parsed = _real_one(payload)
                if parsed is None:
                    feats.append(None)
                    ws.append(None)
                    hs.append(None)
                    continue
                w, h, pixels = parsed
                ws.append(w)
                hs.append(h)
                feats.append(_byte_hist(pixels, feature_dim))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "features": feats,
                }
            )

    return media.select("doc_id", "media_ref", "payload").mapInPandas(
        _decode, _DECODE_SCHEMA
    )
