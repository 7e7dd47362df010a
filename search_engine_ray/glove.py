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


class GloveCache:
    """Per-actor memoizing cache — the stateful-stage pattern for ST3
    (SURVEY.md §2.3): state built once per worker, reused per batch."""

    def __init__(self):
        self._cache: dict[str, "np.ndarray | None"] = {}

    def get(self, word: str) -> "np.ndarray | None":
        v = self._cache.get(word, False)
        if v is False:
            v = glove_vector(word)
            self._cache[word] = v
        return v
