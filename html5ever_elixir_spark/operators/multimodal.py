"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested; the actual media decode
is STUBBED behind a deterministic fake because the sandbox has no
image/audio libraries — swap ``_decode_image_stub`` for a real decoder
(PIL/ffmpeg) in production and nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, mime:string>"
)

FEATURES_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, sha256 string, "
    "feature array<float>, decode_error string"
)


try:  # real decoder when the runtime has PIL; sandbox does not
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    Image = None
    _HAS_PIL = False


def _decode_image_stub(payload: bytes, n_dims: int = 8) -> list[float]:
    """Deterministic fake 'embedding': byte-histogram folded to n_dims.
    Used when PIL is unavailable (this sandbox); raising
    NotImplementedError per modality is also acceptable upstream."""
    if payload is None:
        raise ValueError("null payload")
    acc = [0] * n_dims
    for i, b in enumerate(payload):
        acc[i % n_dims] += b
    total = max(sum(acc), 1)
    return [round(a / total, 6) for a in acc]


def _decode_image(payload: bytes, n_dims: int = 8) -> list[float]:
    """Real path: decode → grayscale → thumbnail → mean-pooled pixel
    features. Falls back to the deterministic stub without PIL (the
    Spark-side plumbing — schema, batching, error rows — is identical
    either way)."""
    if not _HAS_PIL:
        return _decode_image_stub(payload, n_dims)
    import io

    img = Image.open(io.BytesIO(payload)).convert("L")
    img.thumbnail((n_dims, n_dims))
    px = list(img.getdata())
    total = max(sum(px), 1)
    acc = [0] * n_dims
    for i, v in enumerate(px):
        acc[i % n_dims] += v
    return [round(a / total, 6) for a in acc]


FRAMES_SCHEMA = (
    "media_id bigint, frame_idx bigint, n_bytes bigint, frame_sha256 string"
)


def sample_frames(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_frames: int = 4,
) -> DataFrame:
    """Deterministic frame sampling over opaque binary payloads: frame i
    covers bytes [i*L//n, (i+1)*L//n) (balanced split), emitted as one
    row per frame with its byte count and sha256. For real video this is
    where a decoder picks keyframes; the Spark-side shape — one binary
    payload in, N typed frame rows out, batch-wise via mapInPandas — is
    exactly the production plumbing, and the byte-range split keeps the
    whole operator oracle-checkable without media libraries."""
    import hashlib as _hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "n_bytes": [],
                   "frame_sha256": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                data = bytes(payload)
                ln = len(data)
                for i in range(n_frames):
                    lo = i * ln // n_frames
                    hi = (i + 1) * ln // n_frames
                    chunk = data[lo:hi]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["n_bytes"].append(len(chunk))
                    out["frame_sha256"].append(
                        _hashlib.sha256(chunk).hexdigest()
                    )
            yield pd.DataFrame(out)

    pruned = df.select(id_col, payload_col)
    return pruned.mapInPandas(fn, FRAMES_SCHEMA)


def extract_media_features(
    df: DataFrame, n_dims: int = 8, decoder=None
) -> DataFrame:
    """media(media_id, kind, payload, meta) → per-item features.

    mapInPandas with Arrow batches: payloads stay binary end-to-end
    (no base64/utf8 round trip); one Python call per batch.

    ``decoder`` defaults to :func:`_decode_image` (PIL when installed,
    deterministic stub otherwise). Pass :func:`_decode_image_stub`
    explicitly for environment-independent output — the driver-gated
    ``media_features`` query does, so its decode_error column stays
    NULL whether or not the runtime has Pillow."""
    decode = decoder or _decode_image

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0
                ),
                "sha256": pdf["payload"].map(
                    lambda p: hashlib.sha256(p).hexdigest() if p is not None else None
                ),
            }
            feats = []
            errs = []
            for p in pdf["payload"]:
                try:
                    feats.append(decode(p, n_dims))
                    errs.append(None)
                except Exception as e:  # decode failures are row-level
                    feats.append(None)
                    errs.append(str(e))
            out["feature"] = feats
            out["decode_error"] = errs
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, FEATURES_SCHEMA)
