"""Multimodal column plumbing (images/audio/video as opaque binary).

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so
the codec step is stubbed (instructions: "STUB the decode step behind a
clearly-marked NotImplementedError or a deterministic fake") — but the
Ray-side plumbing is real and tested: fixed Arrow schema with a binary
payload column + typed metadata, actor-pool ``map_batches`` stages whose
per-actor state loads once, small batch sizes for wide binary rows, and a
typed feature output layout.

Stages:
- ``MediaDecoder``    payload → (width, height, n_frames) metadata; real
                      decode raises NotImplementedError unless fake=True
- ``FeatureExtractor`` decoded meta + payload → fixed-size float feature
                      vector (deterministic fake: byte histogram)
- ``frame_sample``    per-video deterministic frame index sampling
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),  # JSON sidecar (codec, container, ...)
    ]
)

DECODED = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("payload", pa.binary()),
    ]
)

FEATURES = pa.schema(
    [
        ("media_id", pa.int64()),
        ("feature", pa.list_(pa.float32(), 64)),
    ]
)

# wide binary rows: keep batches small so batch × concurrency fits the heap
MEDIA_BATCH_SIZE = 64


def synthesize_media(n: int, kind: str = "image", payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table (payload = seeded pseudo-random bytes)."""
    rows = []
    for i in range(n):
        seed = hashlib.blake2b(f"{kind}:{i}".encode(), digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(seed, "little"))
        rows.append(rng.integers(0, 256, size=payload_bytes, dtype=np.uint8).tobytes())
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array([kind] * n, type=pa.string()),
            "payload": pa.array(rows, type=pa.binary()),
            "meta": pa.array(["{}"] * n, type=pa.string()),
        },
        schema=MEDIA,
    )


class MediaDecoder:
    """Actor-pool decode stage.  Real codecs are absent from this container:
    ``fake=False`` raises NotImplementedError (clearly-marked stub); the
    deterministic fake derives dims from the payload hash so tests are
    reproducible."""

    def __init__(self, fake: bool = True):
        self.fake = fake  # once-per-actor setup point (real: codec contexts)

    def _decode_one(self, kind: str, payload: bytes) -> tuple[int, int, int]:
        if not self.fake:
            raise NotImplementedError(
                "real image/audio/video decode requires PIL/ffmpeg, "
                "not available in this container — run with fake=True"
            )
        h = hashlib.blake2b(payload, digest_size=8).digest()
        w = 16 + h[0] % 64
        ht = 16 + h[1] % 64
        frames = 1 if kind == "image" else 1 + h[2] % 30
        return w, ht, frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        dims = [
            self._decode_one(k, p)
            for k, p in zip(batch["kind"].to_pylist(), batch["payload"].to_pylist())
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "width": pa.array([d[0] for d in dims], type=pa.int32()),
                "height": pa.array([d[1] for d in dims], type=pa.int32()),
                "n_frames": pa.array([d[2] for d in dims], type=pa.int32()),
                "payload": batch["payload"],
            },
            schema=DECODED,
        )


class FeatureExtractor:
    """Actor-pool feature stage: 64-bin byte histogram, L1-normalized
    (stands in for a model forward pass; model load would live in
    __init__ — once per actor, never per batch)."""

    def __init__(self):
        self.bins = np.linspace(0, 256, 65)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            b = np.frombuffer(p, dtype=np.uint8)
            hist, _ = np.histogram(b, bins=self.bins)
            total = hist.sum() or 1
            feats.append((hist / total).astype(np.float32))
        flat = pa.array(np.concatenate(feats) if feats else np.array([], dtype=np.float32))
        feature = pa.FixedSizeListArray.from_arrays(flat, 64)
        return pa.table(
            {"media_id": batch["media_id"], "feature": feature}, schema=FEATURES
        )


def frame_sample(n_frames: int, every: int = 5) -> list[int]:
    """Deterministic frame sampling: every k-th frame, always incl. first."""
    return sorted(set([0] + list(range(0, n_frames, every))))


def media_pipeline(media: pa.Table, concurrency: int = 2) -> pa.Table:
    """media → decode (actor pool) → features (actor pool) → FEATURES table.

    Input is pre-split into enough blocks that every actor in the pool gets
    work (functions/blocks.py) — one ``from_arrow`` block would starve the
    pool down to a single task.
    """
    import ray

    from ..functions.blocks import from_arrow_blocks

    n_blocks = max(concurrency, -(-media.num_rows // MEDIA_BATCH_SIZE))
    ds = (
        from_arrow_blocks(media, n_blocks)
        .map_batches(
            MediaDecoder,
            fn_constructor_kwargs={"fake": True},
            batch_size=MEDIA_BATCH_SIZE,
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        )
        .map_batches(
            FeatureExtractor,
            batch_size=MEDIA_BATCH_SIZE,
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        )
    )
    return pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()]).sort_by("media_id")
