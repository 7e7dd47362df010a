"""Deterministic synthetic GloVe embeddings.

Stands in for ``glove.twitter.27B.25d.txt`` which the reference loads at
module import (/root/reference/search_engine.py:13-23) and uses for doc
centroids (/root/reference/indexer.py:54-61) and query vectors
(/root/reference/searcher.py:29-33).  The real file is not available in this
environment; both the engine and the test oracle use this same seeded-hash
vector function so centroids match exactly (FIXTURES.md §F4).

Membership model: the real GloVe vocabulary misses some words; we model
that deterministically — a word is "in glove" iff blake2(word) % 8 != 0
(~87.5% coverage) so the ``term in glove_dict`` miss path
(/root/reference/indexer.py:59, searcher.py:32) is exercised.
"""

from __future__ import annotations

import hashlib

import numpy as np

GLOVE_DIM = 25
_SEED_TAG = b"glove-v1:"


def glove_vector(word: str) -> "np.ndarray | None":
    """25-d float vector in [-1, 1] for `word`, or None if 'not in glove'."""
    h = hashlib.blake2b(_SEED_TAG + word.encode("utf-8"), digest_size=8).digest()
    if int.from_bytes(h, "little") % 8 == 0:
        return None
    rng = np.random.default_rng(int.from_bytes(h, "little"))
    return (rng.random(GLOVE_DIM, dtype=np.float64) * 2.0 - 1.0)


# per-process snapshot cache: a worker loads a given snapshot file ONCE
# and every GloveCache in that process shares it (the reference loads the
# txt once at module import, search_engine.py:13-23).  At cluster scale a
# driver-side load + ray.put broadcast would avoid N-workers×file reads;
# per-process lazy load keeps workers independent of driver lifetime,
# which the resumable build needs.
_SNAPSHOT_CACHE: dict[str, dict] = {}


def load_glove_snapshot(path: str, dim: int | None = None) -> dict:
    """word -> float64 vector from a real GloVe snapshot.

    Accepts the published txt format (``word v1 v2 ... vD`` per line,
    whitespace-separated — glove.twitter.27B.25d.txt) or a parquet file
    with (word: string, vector: list<float>) columns.  Loaded once per
    process; raises ValueError on a dim mismatch so a config/snapshot
    disagreement fails loudly instead of mis-shaping centroids."""
    cached = _SNAPSHOT_CACHE.get(path)
    if cached is not None:
        # the cache hit must STILL validate dim: a second GloveCache in
        # the same process with a different configured dim would
        # otherwise silently receive mismatched vectors
        if dim is not None and cached:
            v0 = next(iter(cached.values()))
            if len(v0) != dim:
                raise ValueError(
                    f"glove snapshot {path!r}: cached dim {len(v0)}, "
                    f"config expects {dim}")
        return cached
    vecs: dict[str, np.ndarray] = {}
    if path.endswith(".parquet"):
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["word", "vector"])
        for w, v in zip(t.column("word").to_pylist(),
                        t.column("vector").to_pylist()):
            vecs[w] = np.asarray(v, dtype=np.float64)
    else:
        with open(path, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split(" ")
                if len(parts) < 2:
                    continue
                vecs[parts[0]] = np.asarray(parts[1:], dtype=np.float64)
    if dim is not None:
        for w, v in vecs.items():
            if len(v) != dim:
                raise ValueError(
                    f"glove snapshot {path!r}: word {w!r} has dim "
                    f"{len(v)}, config expects {dim}")
    _SNAPSHOT_CACHE[path] = vecs
    return vecs


class GloveCache:
    """Per-actor memoizing cache — the stateful-stage pattern for ST3
    (SURVEY.md §2.3): state built once per worker, reused per batch.

    With ``snapshot_path`` set, lookups come from the real snapshot
    (absent word -> None, the reference's ``term in glove_dict`` miss
    path); otherwise the deterministic synthetic vectors stand in."""

    def __init__(self, snapshot_path: "str | None" = None,
                 dim: "int | None" = None):
        self._cache: dict[str, "np.ndarray | None"] = {}
        self._snap = (load_glove_snapshot(snapshot_path, dim)
                      if snapshot_path else None)

    def get(self, word: str) -> "np.ndarray | None":
        if self._snap is not None:
            return self._snap.get(word)
        v = self._cache.get(word, False)
        if v is False:
            v = glove_vector(word)
            self._cache[word] = v
        return v
