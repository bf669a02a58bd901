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

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real image/audio/video decode requires PIL/ffmpeg, "
                "not available in this container — run with fake=True"
            )
        # hash straight off the Arrow values buffer via memoryview
        # segments (hashlib accepts memoryviews — no Python bytes
        # allocation per payload); dims derive vectorized from the
        # first digest bytes
        pay = batch["payload"].combine_chunks()
        offs, values = _binary_segments(pay)
        n = len(pay)
        d0 = np.empty(n, dtype=np.uint8)
        d1 = np.empty(n, dtype=np.uint8)
        d2 = np.empty(n, dtype=np.uint8)
        for i in range(n):
            d = hashlib.blake2b(
                values[offs[i]: offs[i + 1]], digest_size=8
            ).digest()
            d0[i], d1[i], d2[i] = d[0], d[1], d[2]
        import pyarrow.compute as pc

        is_image = pc.equal(batch["kind"], "image").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        frames = np.where(is_image, 1, 1 + (d2 % 30).astype(np.int32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "width": pa.array((16 + d0 % 64).astype(np.int32), type=pa.int32()),
                "height": pa.array((16 + d1 % 64).astype(np.int32), type=pa.int32()),
                "n_frames": pa.array(frames.astype(np.int32), type=pa.int32()),
                "payload": batch["payload"],
            },
            schema=DECODED,
        )


class FeatureExtractor:
    """Actor-pool feature stage: 64-bin byte histogram, L1-normalized
    (stands in for a model forward pass; model load would live in
    __init__ — once per actor, never per batch)."""

    def __init__(self):
        # 64 bins of width 4 over [0, 256): bin = byte >> 2 (identical to
        # np.histogram with edges linspace(0, 256, 65))
        self.n_bins = 64

    def __call__(self, batch: pa.Table) -> pa.Table:
        # one pass over the concatenated payload buffer: segment ids via
        # repeat(diff(offsets)), all histograms in a single bincount —
        # no per-payload Python loop
        pay = batch["payload"].combine_chunks()
        offs, values = _binary_segments(pay)
        n = len(pay)
        lengths = np.diff(offs)
        data = np.frombuffer(values, dtype=np.uint8)[offs[0]: offs[-1]]
        seg = np.repeat(np.arange(n, dtype=np.int64), lengths)
        hist = np.bincount(
            seg * self.n_bins + (data >> 2), minlength=n * self.n_bins
        ).reshape(n, self.n_bins)
        totals = np.maximum(hist.sum(axis=1), 1)
        feats = (hist / totals[:, None]).astype(np.float32)
        flat = pa.array(feats.ravel())
        feature = pa.FixedSizeListArray.from_arrays(flat, 64)
        return pa.table(
            {"media_id": batch["media_id"], "feature": feature}, schema=FEATURES
        )


def _binary_segments(arr: pa.Array) -> tuple[np.ndarray, memoryview]:
    """(offsets, values) views of a binary Array — zero-copy accessors
    for hashing/histogramming payload segments without to_pylist()."""
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset: arr.offset + len(arr) + 1
    ].astype(np.int64)
    values = arr.buffers()[2]
    return offs, memoryview(values) if values is not None else memoryview(b"")


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
