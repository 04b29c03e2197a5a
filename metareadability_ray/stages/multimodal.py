"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE KERNEL IS A
DETERMINISTIC FAKE (clearly marked below); everything around it — the Arrow
schema (`payload: binary` + metadata columns), the actor-pool stage shape,
small batch sizes for large payloads, and the feature-extraction output
layout — is real and tested, so swapping in a real codec (PIL/ffmpeg) on a
real cluster changes ONE method.

Scale notes: payload rows are large → callers should use batch_size ≤ 64 and
let zero-copy Arrow keep bytes in the object store; features (small fixed
vectors) are what flows downstream.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
    ]
)

DECODED_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),
        ("n_bytes", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("feature", pa.list_(pa.float32())),  # fixed 16-dim descriptor
    ]
)

_FEATURE_DIM = 16


def _fake_decode(payload: bytes, media_type: str):
    """STUB DECODE — deterministic fake standing in for PIL/libav decode.

    A real deployment replaces this with the codec call; the pipeline
    contract (inputs/outputs/batching) is unchanged. Raises on empty payload
    like a real decoder would.
    """
    if not payload:
        raise ValueError("empty payload")
    digest = hashlib.blake2b(payload, digest_size=16).digest()
    w, h = 16 + digest[0], 16 + digest[1]
    n_frames = 1 if media_type == "image" else 1 + digest[2]
    # 16-dim "feature": bytes of the digest scaled to [0,1)
    feat = (np.frombuffer(digest, dtype=np.uint8).astype(np.float32) / 256.0)[:_FEATURE_DIM]
    return w, h, n_frames, feat


class MediaDecodeActor:
    """Actor-pool decode/feature stage (setup once per actor, work per batch)."""

    def __init__(self, feature_dim: int = _FEATURE_DIM):
        self.feature_dim = feature_dim  # a real impl loads the codec/model here
        self.decoded = 0
        self.failed = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        types = batch.column("media_type").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n = len(ids)
        widths, heights, frames = [0] * n, [0] * n, [0] * n
        feats: list[list[float]] = [[0.0] * self.feature_dim for _ in range(n)]
        nbytes = [0] * n
        for i in range(n):
            p = payloads[i] or b""
            nbytes[i] = len(p)
            try:
                w, h, nf, feat = _fake_decode(p, types[i])
                widths[i], heights[i], frames[i] = w, h, nf
                feats[i] = feat.tolist()
                self.decoded += 1
            except ValueError:
                self.failed += 1  # empty/corrupt payload → zeroed row, counted
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(types, pa.string()),
                "n_bytes": pa.array(nbytes, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_frames": pa.array(frames, pa.int32()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            },
            schema=DECODED_SCHEMA,
        )


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """documents → fake media table (deterministic: payload = utf-8 text bytes,
    type cycles by doc_id). Used by tests/QA — real data arrives as Parquet.

    Null-id docs are skipped (a media row is keyed by its id — the r5
    null-doc_id contract; ``None % 3`` crashed the type cycle before)."""
    import pyarrow.compute as pc

    batch = batch.filter(pc.is_valid(batch.column("doc_id")))
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    types = ["image", "audio", "video"]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array([types[i % 3] for i in ids], pa.string()),
            "payload": pa.array([(t or "").encode("utf-8") for t in texts], pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def frame_sample_batch(batch: pa.Table) -> pa.Table:
    """flat_map stage: video rows explode into ≤4 evenly-spaced frame rows
    (deterministic fake frame descriptors); images/audio pass through as one
    row. Output rows ≥ input rows — the flat_map/explode pattern."""
    out_id, out_type, out_frame, out_desc = [], [], [], []
    for mid, mtype, frames, feat in zip(
        batch.column("media_id").to_pylist(),
        batch.column("media_type").to_pylist(),
        batch.column("n_frames").to_pylist(),
        batch.column("feature").to_pylist(),
    ):
        n = max(1, min(4, frames))
        step = max(1, frames // n) if frames else 1
        for fi in range(0, n * step, step)[:n] if frames else [0]:
            out_id.append(mid)
            out_type.append(mtype)
            out_frame.append(fi)
            # per-frame descriptor: feature rotated by frame index (stub)
            out_desc.append(feat[fi % len(feat):] + feat[: fi % len(feat)] if feat else [])
    return pa.table(
        {
            "media_id": pa.array(out_id, pa.int64()),
            "media_type": pa.array(out_type, pa.string()),
            "frame_index": pa.array(out_frame, pa.int32()),
            "frame_feature": pa.array(out_desc, pa.list_(pa.float32())),
        }
    )


def media_frames(sf_dir: str) -> "ray.data.Dataset":
    """QA pipeline: decode stub → frame sampling (flat_map explode)."""
    return media_features(sf_dir).map_batches(
        frame_sample_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def media_features(sf_dir: str) -> "ray.data.Dataset":
    """QA pipeline: synth media from documents → actor-pool decode stub."""
    import os

    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    from metareadability_ray.util import auto_actor_concurrency

    media = ds.map_batches(synth_media_batch, batch_format="pyarrow", zero_copy_batch=True)
    return media.map_batches(
        MediaDecodeActor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,  # large payload rows → small batches
        concurrency=auto_actor_concurrency(cap=4),
        max_restarts=0,
    )
