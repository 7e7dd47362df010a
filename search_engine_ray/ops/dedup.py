"""Deduplication operators (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine) — training-data pipeline staples, Ray-Data-first.

Patterns (scale notes in each fn):
- exact: content-hash column -> groupby(hash) -> keep min doc_id.
- MinHash+LSH: shingle -> k minhashes -> band buckets -> groupby(band,
  bucket) -> candidate pairs -> exact-Jaccard verify.  All shuffle volume
  is (band, bucket, doc_id) rows, never raw text.
- SimHash: 64-bit simhash; near-dup = bucket collisions on 16-bit bands,
  verified by Hamming distance.
- embedding: random-hyperplane LSH buckets -> in-bucket exact cosine.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

from search_engine_ray.text.tokenizer import simple_tokenize

_MINHASH_PERMS = 64
_BANDS = 16          # 16 bands x 4 rows
_ROWS_PER_BAND = _MINHASH_PERMS // _BANDS


def _hash64(data: bytes, seed: int = 0) -> int:
    h = hashlib.blake2b(data, digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


# ----------------------------------------------------------------- exact
def exact_dedup(sf_dir: str):
    """One surviving row per distinct text: (doc_id=min, text).
    SQL: SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text."""
    import ray.data
    from ray.data.aggregate import Min

    from search_engine_ray.ops.textstats import fingerprint64

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])

    def with_fp(batch: pa.Table) -> pa.Table:
        return batch.append_column("fp", fingerprint64(batch).column("fp"))

    # group on the 64-bit fingerprint (never shuffles full text twice);
    # carry min(doc_id) and a representative text via map_groups
    import pandas as pd

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        i = g["doc_id"].idxmin()
        return pd.DataFrame({"doc_id": [g.loc[i, "doc_id"]],
                             "text": [g.loc[i, "text"]]})

    return (ds.map_batches(with_fp, batch_format="pyarrow")
              .groupby("fp")
              .map_groups(keep_first, batch_format="pandas"))


# --------------------------------------------------------------- minhash
class MinHasher:
    """Actor-pool UDF: word-3-gram shingles -> 64 minhashes -> LSH band
    rows.  Permutation parameters built once per actor."""

    def __init__(self, num_perm: int = _MINHASH_PERMS, ngram: int = 3):
        rng = np.random.default_rng(42)
        self.ngram = ngram
        # a < 2^30, x < 2^32, b < 2^30 => a*x+b < 2^62: int64-safe
        self.M = np.int64((1 << 61) - 1)
        self.a = rng.integers(1, 1 << 30, size=num_perm, dtype=np.int64)
        self.b = rng.integers(0, 1 << 30, size=num_perm, dtype=np.int64)

    def shingles(self, text: str) -> np.ndarray:
        toks = simple_tokenize(text)
        if len(toks) < self.ngram:
            grams = [" ".join(toks)] if toks else []
        else:
            grams = [" ".join(toks[i:i + self.ngram])
                     for i in range(len(toks) - self.ngram + 1)]
        return np.unique(np.array(
            [_hash64(g.encode()) & 0xFFFF_FFFF for g in grams],
            dtype=np.int64))

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingles(text)
        if len(sh) == 0:
            return np.zeros(len(self.a), dtype=np.int64)
        prod = (sh[None, :] * self.a[:, None] + self.b[:, None]) % self.M
        return prod.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, buckets = [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            sig = self.signature(text)
            for b in range(_BANDS):
                band = sig[b * _ROWS_PER_BAND:(b + 1) * _ROWS_PER_BAND]
                doc_ids.append(did)
                bands.append(b)
                buckets.append(_hash64(band.tobytes()) & 0x7FFF_FFFF_FFFF_FFFF)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "band": pa.array(bands, pa.int32()),
            "bucket": pa.array(buckets, pa.int64()),
        })


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def minhash_near_dup_pairs(sf_dir: str, threshold: float = 0.6):
    """Candidate pairs from LSH buckets, verified by exact n-gram Jaccard.
    Returns (a, b, jaccard) with a < b, jaccard >= threshold."""
    import pandas as pd
    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    band_rows = ds.map_batches(MinHasher, batch_format="pyarrow",
                               concurrency=2)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"]))
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    cand = band_rows.groupby(["band", "bucket"]).map_groups(
        pairs_in_bucket, batch_format="pandas")
    cand_pd = cand.to_pandas()
    if len(cand_pd) == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    cand_pd = cand_pd.drop_duplicates(["a", "b"])
    # verify exact Jaccard (candidate set is small; broadcast text lookup)
    import duckdb  # only to read the needed rows without a full scan

    need = sorted(set(cand_pd["a"]) | set(cand_pd["b"]))
    import pyarrow.dataset as pads

    tbl = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(need))
    mh = MinHasher()
    shset = {d: set(mh.shingles(t).tolist())
             for d, t in zip(tbl.column("doc_id").to_pylist(),
                             tbl.column("text").to_pylist())}
    jac = [
        _jaccard(shset.get(a, set()), shset.get(b, set()))
        for a, b in zip(cand_pd["a"], cand_pd["b"])
    ]
    cand_pd["jaccard"] = jac
    out = cand_pd[cand_pd["jaccard"] >= threshold].sort_values(["a", "b"])
    return pa.table({
        "a": pa.array(out["a"].tolist(), pa.int64()),
        "b": pa.array(out["b"].tolist(), pa.int64()),
        "jaccard": pa.array(out["jaccard"].tolist(), pa.float64()),
    })


# ---------------------------------------------------------------- simhash
class SimHasher:
    """64-bit SimHash over simple tokens; emits 4x16-bit band keys for
    bucketing (Hamming<=3 dups collide in >=1 band by pigeonhole)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, sims, bands, keys = [], [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            toks = simple_tokenize(text)
            acc = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for t in toks:
                h = np.uint64(_hash64(t.encode()))
                bits = (h >> shifts) & np.uint64(1)
                acc += np.where(bits == 1, 1, -1)
            sim = int((np.left_shift(
                (acc > 0).astype(np.uint64), shifts)).sum(dtype=np.uint64))
            for b in range(4):
                doc_ids.append(did)
                sims.append(sim - (1 << 63) if sim >= (1 << 63) else sim)
                bands.append(b)
                keys.append((sim >> (16 * b)) & 0xFFFF)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "simhash": pa.array(sims, pa.int64()),
            "band": pa.array(bands, pa.int32()),
            "key": pa.array(keys, pa.int32()),
        })


def simhash_near_dup_pairs(sf_dir: str, max_hamming: int = 3):
    import pandas as pd
    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    rows = ds.map_batches(SimHasher, batch_format="pyarrow", concurrency=2)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        recs = sorted(set(zip(g["doc_id"], g["simhash"])))
        a_, b_, h_ = [], [], []
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                x = (recs[i][1] ^ recs[j][1]) & ((1 << 64) - 1)
                ham = bin(x).count("1")
                if ham <= max_hamming:
                    a_.append(recs[i][0])
                    b_.append(recs[j][0])
                    h_.append(ham)
        return pd.DataFrame({"a": a_, "b": b_, "hamming": h_})

    cand = rows.groupby(["band", "key"]).map_groups(
        pairs, batch_format="pandas").to_pandas()
    if len(cand) == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    out = cand.drop_duplicates(["a", "b"]).sort_values(["a", "b"])
    return pa.table({
        "a": pa.array(out["a"].tolist(), pa.int64()),
        "b": pa.array(out["b"].tolist(), pa.int64()),
        "hamming": pa.array(out["hamming"].tolist(), pa.int64()),
    })


# ------------------------------------------------------------- embeddings
def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.95,
                             num_planes: int = 12):
    """Near-dup vec pairs by cosine >= threshold: random-hyperplane LSH
    bucket (one sign-pattern key) then exact in-bucket cosine.  At scale
    use multiple plane tables to raise recall; single-table here."""
    import pandas as pd
    import ray.data

    rng = np.random.default_rng(42)

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))

    first = ds.take(1)[0]
    dim = len(first["embedding"])
    planes = rng.standard_normal((dim, num_planes))

    def bucketize(batch: pa.Table) -> pa.Table:
        embs = np.asarray(batch.column("embedding").to_pylist(),
                          dtype=np.float64)
        signs = (embs @ planes) > 0
        keys = (signs.astype(np.uint64)
                << np.arange(num_planes, dtype=np.uint64)).sum(axis=1)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "bucket": pa.array(keys.astype(np.int64), pa.int64()),
            "embedding": batch.column("embedding"),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        E = np.stack(g["embedding"].to_numpy())
        norms = np.linalg.norm(E, axis=1)
        norms[norms == 0] = 1
        En = E / norms[:, None]
        C = En @ En.T
        a_, b_, c_ = [], [], []
        iu = np.triu_indices(len(ids), k=1)
        for i, j in zip(*iu):
            if C[i, j] >= threshold:
                x, y = int(ids[i]), int(ids[j])
                if x > y:
                    x, y = y, x
                a_.append(x)
                b_.append(y)
                c_.append(float(C[i, j]))
        return pd.DataFrame({"a": a_, "b": b_, "cosine": c_})

    out = (ds.map_batches(bucketize, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(pairs, batch_format="pandas")).to_pandas()
    if len(out) == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    out = out.drop_duplicates(["a", "b"]).sort_values(["a", "b"])
    return pa.table({
        "a": pa.array(out["a"].tolist(), pa.int64()),
        "b": pa.array(out["b"].tolist(), pa.int64()),
        "cosine": pa.array(out["cosine"].tolist(), pa.float64()),
    })
