"""Stable document identifiers.

The reference keys documents by integer ``tweet_id``
(/root/reference/parser_module.py:111).  Common-Crawl-style pages are keyed
by ``url``; we derive a deterministic 63-bit id from the url so postings
stay fixed-width integers (delta+varbyte encodable) without a global
id-assignment shuffle.

Scale note: at 10^12 docs a 63-bit hash has a non-trivial birthday collision
probability; a production build would assign ids via a document directory
(partition_id << 40 | row_in_partition) during the parse checkpoint.  A
collision here merely merges two docs' postings (graceful degradation); the
correctness gates run at scales where collisions are absent.
"""

from __future__ import annotations

import hashlib


def doc_id_for_url(url: str) -> int:
    """63-bit stable id (positive int64) from a url."""
    h = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "little") & 0x7FFF_FFFF_FFFF_FFFF



def shard_of(doc_id: int, num_shards: int) -> int:
    return doc_id % num_shards


def term_bucket(term: str, num_buckets: int) -> int:
    h = hashlib.blake2b(term.encode("utf-8"), digest_size=4).digest()
    return int.from_bytes(h, "little") % num_buckets
