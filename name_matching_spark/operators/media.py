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
- ``decode_image_features``: batch decode + feature extraction. The decode
  body is gated: uses PIL when importable, else raises NotImplementedError
  unless ``fake=True`` (deterministic fake features) — the Spark plumbing
  (schema, batching, column pruning) is real and tested either way.
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


def decode_image_features(
    media: DataFrame, fake: bool = False, feature_dim: int = 8
) -> DataFrame:
    """Decode payloads and emit (width, height, features).

    Real decode requires PIL (absent here): without it and ``fake=False``
    this raises NotImplementedError at execution time — clearly marking the
    stubbed codec. With ``fake=True`` features are a deterministic hash
    expansion of the payload so downstream operators (ANN, dedup) are
    testable end-to-end.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False
        for pdf in batches:
            if have_pil and not fake:
                raise NotImplementedError(
                    "real image decode path not exercised in this container"
                )
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL; pass fake=True for the "
                    "deterministic test double"
                )
            feats, ws, hs = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    ws.append(None)
                    hs.append(None)
                    continue
                raw = np.frombuffer(payload[: feature_dim * 4], dtype=np.uint32)
                v = (raw % 1000).astype(np.float32) / 1000.0
                feats.append(v.tolist())
                ws.append(int(raw[0] % 1920) + 1)
                hs.append(int(raw[1] % 1080) + 1)
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
