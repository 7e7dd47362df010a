"""Multimodal column plumbing (image/audio/video as opaque binary).

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container,
so the actual decoders are stubbed behind ``NotImplementedError`` — but
the Ray-side plumbing (schema, actor-pool stage shape, batch sizing for
large binary payloads, typed metadata output) is real and tested with a
deterministic fake decoder.

Scale notes baked into the design:
- binary payloads make rows wide: the stage uses a SMALL batch_size so
  batch x concurrency fits worker heaps (guide: memory-aware batching);
- decode state (codec contexts, models) is actor state, built once.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),       # image | audio | video
    ("payload", pa.binary()),    # opaque encoded bytes
    ("meta", pa.string()),       # JSON typed metadata
])


class MediaDecoder:
    """Actor-pool UDF: binary payload -> typed features.

    ``impl='real'`` raises NotImplementedError (decoder libs absent);
    ``impl='fake'`` produces deterministic features from the bytes so the
    pipeline plumbing is testable end-to-end.
    """

    def __init__(self, impl: str = "fake", feature_dim: int = 8):
        self.impl = impl
        self.dim = feature_dim

    def _decode_real(self, payload: bytes, kind: str) -> np.ndarray:
        raise NotImplementedError(
            "image/audio decode libs are not available in this environment; "
            "plug a real decoder here (PIL.Image.open / soundfile.read) — "
            "the surrounding Ray plumbing is complete")

    def _decode_fake(self, payload: bytes, kind: str) -> np.ndarray:
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "little"))
        return rng.random(self.dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_real if self.impl == "real" else self._decode_fake
        feats, sizes = [], []
        for payload, kind in zip(batch.column("payload").to_pylist(),
                                 batch.column("kind").to_pylist()):
            feats.append(decode(payload, kind))
            sizes.append(len(payload))
        flat = pa.array(np.concatenate(feats) if feats else
                        np.zeros(0), pa.float64())
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "payload_bytes": pa.array(sizes, pa.int64()),
            "features": pa.FixedSizeListArray.from_arrays(flat, self.dim),
        })


def decode_media(ds, *, impl: str = "fake", batch_size: int = 64,
                 concurrency: int = 2):
    """The multimodal decode stage: small batches (wide binary rows),
    actor pool, typed feature output."""
    return ds.map_batches(
        MediaDecoder, fn_constructor_kwargs={"impl": impl},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def synthetic_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    payloads = [rng.integers(0, 256, size=int(ln), dtype=np.uint8).tobytes()
                for ln in rng.integers(100, 5000, size=n)]
    import json

    metas = [json.dumps({"w": int(rng.integers(16, 512)),
                         "h": int(rng.integers(16, 512))}) for _ in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array([kinds[i % 3] for i in range(n)], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array(metas, pa.string()),
    })
