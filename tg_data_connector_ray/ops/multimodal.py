"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so
the codec layer is stubbed: ``FakeCodec`` is a deterministic stand-in and
the real import is gated behind a try (``NotImplementedError`` surfaces
when a real codec is requested but unavailable).  Everything Ray-side —
schema, actor signature, batch sizing for large binary payloads, output
layout — is real and tested.

Batch-size guidance (encoded in DEFAULT_BATCH_SIZE): with payloads of
100 KB-10 MB a batch must be sized by BYTES not rows; blocks of wide
binary rows should keep `batch_size * payload <= ~64 MB` per actor so
`concurrency` actors fit the worker heap alongside the object store.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # images/video
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),  # audio/video
    ]
)

DEFAULT_BATCH_SIZE = 64  # rows; sized for ~1 MB payloads -> ~64 MB batches


class FakeCodec:
    """Deterministic stand-in for a media decoder: 'decodes' a payload into
    a fixed-size feature vector derived from its bytes."""

    def decode_image(self, payload: bytes, dim: int = 16) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
        return (raw % 1000).astype(np.float32) / 1000.0

    def sample_frames(self, payload: bytes, n: int = 4) -> "list[bytes]":
        step = max(1, len(payload) // n)
        return [payload[i * step : (i + 1) * step] for i in range(n)]


def get_codec(name: str = "fake"):
    if name == "fake":
        return FakeCodec()
    try:  # real codecs gated behind import-try; absent in this container
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"codec {name!r} requires media libraries not present in this "
            "environment; use codec='fake' for plumbing tests"
        )
    raise NotImplementedError(f"unknown codec {name!r}")


class MediaFeatureStage:
    """Actor-pool stage: codec constructed ONCE per actor; per-batch decode
    + feature extraction, vectorized where the codec allows."""

    def __init__(self, codec: str = "fake", feature_dim: int = 16):
        self.codec = get_codec(codec)
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.codec.decode_image(p, self.dim) if p is not None else np.zeros(self.dim, np.float32)
            for p in batch["payload"].to_pylist()
        ]
        out = batch.select(["media_id", "kind", "mime"])
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32()))
        )


class FrameSampleStage:
    """Video -> sampled frame rows (flat_map shape: one row per frame)."""

    def __init__(self, codec: str = "fake", n_frames: int = 4):
        self.codec = get_codec(codec)
        self.n = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            for i, fr in enumerate(self.codec.sample_frames(p or b"", self.n)):
                ids.append(mid)
                idxs.append(i)
                frames.append(fr)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.large_binary()),
            }
        )


def media_features(ds, codec: str = "fake", feature_dim: int = 16, concurrency: "int | None" = None):
    """documents-of-media -> feature table, as an actor-pool stage with
    byte-aware batch size."""
    from ..util import default_pool_size

    return ds.map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=DEFAULT_BATCH_SIZE,
        concurrency=concurrency or default_pool_size(),
        fn_constructor_kwargs={"codec": codec, "feature_dim": feature_dim},
    )


def make_fake_media_table(n: int = 32, seed: int = 9) -> pa.Table:
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(1_000, 20_000, size=n)]
    kinds = [["image", "audio", "video"][i % 3] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["application/octet-stream"] * n, pa.string()),
            "width": pa.array([64] * n, pa.int32()),
            "height": pa.array([64] * n, pa.int32()),
            "duration_ms": pa.array([1000] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
