"""Substring (infix) search over the documents table, served from a
character-trigram index — the Google Code Search design (R. Cox,
"Regular Expression Matching with a Trigram Index", public 2012
writeup): the query's trigram posting lists are intersected to a small
candidate set, then candidates are verified EXACTLY, so serving a
subset of the query's trigrams is always sound.  The streaming scan op
(`substring_scan`) is the oracle and the <3-byte fallback; the index
pays for itself across repeated queries (`test_round5_ops` times it).

Scale shape: per-doc DISTINCT (tri, doc_id) pairs ride ONE tri-keyed
bucket shuffle; each bucket writes tri-sorted pair rows, so pyarrow
dataset filters prune reads to the row groups whose tri range matches.
Query-time driver traffic is two pruned reads: the tri column alone
for the needle's trigrams (per-tri df), then (tri, doc_id) postings
for only the ``_MAX_QUERY_TRIS`` rarest of them (rarest-first keeps
the first and largest intersection input as small as possible).
Verification reads only candidate docs through a doc_id-pruned read.
UTF-8 is self-synchronizing, so byte-level trigram extraction and
substring matching agree with character-level semantics exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

_TRI_IDX_CACHE: dict[str, str] = {}
_MAX_QUERY_TRIS = 8  # rarest-first cap; exact verify keeps this sound


def _tri_codes(data: bytes) -> np.ndarray:
    """All byte trigrams of ``data`` packed b0<<16|b1<<8|b2 (int64)."""
    b = np.frombuffer(data, np.uint8).astype(np.int64)
    if len(b) < 3:
        return np.zeros(0, np.int64)
    return (b[:-2] << 16) | (b[1:-1] << 8) | b[2:]


def _doc_ids_table(ids) -> pa.Table:
    return pa.table({"doc_id": pa.array(np.asarray(ids, np.int64),
                                        pa.int64())})


def substring_scan(sf_dir: str, needle: str = "ter scan") -> pa.Table:
    """doc_ids (ascending) of docs whose text CONTAINS ``needle`` — one
    streaming vectorized scan (pyarrow match_substring per batch).
    SQL: SELECT doc_id FROM documents WHERE contains(text, needle)."""
    import pyarrow.compute as pc
    import ray.data

    def part(batch: pa.Table) -> pa.Table:
        m = pc.match_substring(batch.column("text"), needle)
        return batch.filter(m).select(["doc_id"])

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    df = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    # an all-empty-blocks dataset can surface with no columns
    ids = df["doc_id"].to_numpy() if "doc_id" in df.columns \
        else np.zeros(0, np.int64)
    return _doc_ids_table(np.sort(ids))


def trigram_index(sf_dir: str) -> str:
    """Build (once per process per corpus content) the trigram index
    parquet under /tmp; returns its directory.  Keyed on the source
    file's (path, size, mtime) so a regenerated corpus is never served
    stale postings."""
    import hashlib
    import tempfile

    import ray.data

    from search_engine_ray.ops.shuffle import bucketed_apply

    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    st = os.stat(src)
    key = f"{src}|{st.st_size}|{st.st_mtime_ns}"
    hit = _TRI_IDX_CACHE.get(key)
    if hit is not None and os.path.exists(os.path.join(hit, "_DONE")):
        return hit
    tag = hashlib.blake2b(key.encode(), digest_size=6).hexdigest()
    out = os.path.join(tempfile.gettempdir(), f"se_ray_triidx_{tag}")
    if not os.path.exists(os.path.join(out, "_DONE")):
        import shutil

        shutil.rmtree(out, ignore_errors=True)

        def pairs(batch: pa.Table) -> pa.Table:
            texts = batch.column("text").to_pylist()
            ids = batch.column("doc_id").to_numpy()
            tri_parts, id_parts = [], []
            for i, t in enumerate(texts):
                tc = np.unique(_tri_codes(t.encode("utf-8")))
                if len(tc):
                    tri_parts.append(tc)
                    id_parts.append(np.full(len(tc), ids[i], np.int64))
            if not tri_parts:
                return pa.table({"tri": pa.array([], pa.int64()),
                                 "doc_id": pa.array([], pa.int64())})
            return pa.table({
                "tri": pa.array(np.concatenate(tri_parts), pa.int64()),
                "doc_id": pa.array(np.concatenate(id_parts), pa.int64())})

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            # plain (tri, doc_id) pair rows, tri-sorted so row-group
            # stats prune reads (a list<int64> column would round-trip
            # through Ray's tensor extension and break the dataset read)
            return g.sort_values(["tri", "doc_id"]).reset_index(drop=True)

        ds = ray.data.read_parquet(src, columns=["doc_id", "text"])
        (bucketed_apply(ds.map_batches(pairs, batch_format="pyarrow"),
                        ["tri"], per_bucket)
         .write_parquet(out))
        with open(os.path.join(out, "_DONE"), "w") as fh:
            fh.write("ok")
    _TRI_IDX_CACHE[key] = out
    return out


def substring_search(sf_dir: str, needle: str = "ter scan") -> pa.Table:
    """doc_ids (ascending) of docs containing ``needle``, served from
    the trigram index: pruned (tri, n) stats read, rarest-first posting
    intersection, exact verification over a doc_id-pruned candidate
    read.  Needles under 3 bytes have no trigram and fall back to the
    scan.  Same result contract as substring_scan (the oracle)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    nb = needle.encode("utf-8")
    if len(nb) < 3:
        return substring_scan(sf_dir, needle)
    need = np.unique(_tri_codes(nb))
    idx = pads.dataset(trigram_index(sf_dir))
    # phase 1: df per needle trigram from the (pruned) tri column alone
    flt = pads.field("tri").isin(pa.array(need, pa.int64()))
    seen = idx.to_table(filter=flt, columns=["tri"]).column(
        "tri").to_numpy()
    uniq, counts = np.unique(seen, return_counts=True)
    if len(uniq) < len(need):
        return _doc_ids_table([])  # some trigram absent -> no match
    pick = uniq[np.argsort(counts)][:_MAX_QUERY_TRIS]
    # phase 2: postings for only the rarest picks
    pairs = idx.to_table(
        filter=pads.field("tri").isin(pa.array(np.sort(pick), pa.int64())),
        columns=["tri", "doc_id"])
    tri_col = pairs.column("tri").to_numpy()
    id_col = pairs.column("doc_id").to_numpy()
    # rarest list first: the working set never exceeds the rarest df
    cand = None
    for t in pick:
        ids = np.sort(id_col[tri_col == t])
        cand = ids if cand is None else cand[
            np.isin(cand, ids, assume_unique=True)]
        if len(cand) == 0:
            return _doc_ids_table([])
    docs = pads.dataset(
        os.path.join(sf_dir, "documents.parquet")).to_table(
        filter=pads.field("doc_id").isin(pa.array(cand, pa.int64())),
        columns=["doc_id", "text"])
    m = pc.match_substring(docs.column("text"), needle)
    hits = docs.filter(m).column("doc_id").to_numpy()
    return _doc_ids_table(np.sort(hits))


def _required_literal(pattern: str) -> str | None:
    """The longest literal run a match MUST contain (>= 3 bytes), or
    None when the pattern resists conservative analysis.  Walks the
    pattern once: quantifiers that make the previous atom optional or
    repeatable drop/close the current run, classes/groups/wildcards
    close it, a TOP-LEVEL alternation invalidates everything (either
    branch may match).  Closed runs stay mandatory because every
    remaining construct (group, class, anchor, quantifier) constrains
    OTHER positions, never un-requires already-scanned plain literals.
    Conservative by construction: returning None only costs a scan."""
    import re as _re

    # inline flag groups ((?i), (?s:...), ...) change matching semantics
    # for the REST of the pattern — e.g. (?i)abc matches ABC, so "abc"
    # is no longer a mandatory byte literal.  Bail to the scan.
    if _re.search(r"\(\?[aiLmsux-]+[):]", pattern):
        return None
    runs: list[str] = []
    cur: list[str] = []

    def close():
        if cur:
            runs.append("".join(cur))
            cur.clear()

    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\":
            if i + 1 >= n:
                return None
            nxt = pattern[i + 1]
            if nxt.isalnum():  # \d \w \s \b \A \Z \1 ... -> class/anchor
                close()
            else:              # escaped punctuation is a literal
                # a quantifier after it must still drop it
                if i + 2 < n and pattern[i + 2] in "?*{":
                    close()
                else:
                    cur.append(nxt)
            i += 2
            continue
        if c == "|":
            return None  # top-level alternation: nothing is mandatory
        if c in "?*{":
            if cur:
                cur.pop()  # previous literal became optional/repeated
            close()
            if c == "{":
                j = pattern.find("}", i)
                if j < 0:
                    return None
                i = j + 1
                continue
        elif c == "+":
            close()  # previous char required, but contiguity ends
        elif c == "(":
            depth = 1
            j = i + 1
            while j < n and depth:
                if pattern[j] == "\\":
                    j += 2
                    continue
                depth += {"(": 1, ")": -1}.get(pattern[j], 0)
                j += 1
            if depth:
                return None
            close()
            i = j
            continue
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] == "^":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 2 if pattern[j] == "\\" else 1
            if j >= n:
                return None
            close()
            i = j + 1
            continue
        elif c in ".^$":
            close()
        else:
            cur.append(c)
        i += 1
    close()
    best = max(runs, key=lambda r: len(r.encode("utf-8")), default="")
    return best if len(best.encode("utf-8")) >= 3 else None


def regex_scan(sf_dir: str, pattern: str = "ter (scan|merge)") -> pa.Table:
    """doc_ids (ascending) whose text matches ``pattern`` — one
    streaming RE2 scan (pyarrow match_substring_regex; DuckDB's
    regexp_matches is the same RE2 engine, so the SQL mirror agrees
    on the full RE2 syntax, not just a tested subset)."""
    import pyarrow.compute as pc
    import ray.data

    def part(batch: pa.Table) -> pa.Table:
        m = pc.match_substring_regex(batch.column("text"), pattern)
        return batch.filter(m).select(["doc_id"])

    ds = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    df = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    # an all-empty-blocks dataset can surface with no columns
    ids = df["doc_id"].to_numpy() if "doc_id" in df.columns \
        else np.zeros(0, np.int64)
    return _doc_ids_table(np.sort(ids))


def regex_search(sf_dir: str, pattern: str = "ter (scan|merge)") -> pa.Table:
    """Regex search served from the trigram index (the design's actual
    use-case, Cox 2012): a mandatory literal extracted from the pattern
    prunes candidates through the trigram postings, then RE2 verifies
    exactly.  Patterns with no extractable >=3-byte literal fall back
    to the scan — same result contract either way."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    lit = _required_literal(pattern)
    if lit is None:
        return regex_scan(sf_dir, pattern)
    cand_tbl = substring_search(sf_dir, lit)
    cand = cand_tbl.column("doc_id").to_numpy()
    if len(cand) == 0:
        return _doc_ids_table([])
    docs = pads.dataset(
        os.path.join(sf_dir, "documents.parquet")).to_table(
        filter=pads.field("doc_id").isin(pa.array(cand, pa.int64())),
        columns=["doc_id", "text"])
    m = pc.match_substring_regex(docs.column("text"), pattern)
    hits = docs.filter(m).column("doc_id").to_numpy()
    return _doc_ids_table(np.sort(hits))
