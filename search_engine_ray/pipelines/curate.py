"""End-to-end training-corpus CURATION pipeline — the engine's flagship
composition for the 100-TB use case: quality gate -> exact dedup ->
near-dup removal -> benchmark decontamination -> source mixing ->
(optional) packed partitioned write, in one run.

Every stage reuses the individually-SQL-checked operator; the COMPOSED
result is value-checked against a single DuckDB query that chains the
same five rules, so the composition itself (not just the parts) is
gated.

Scale shape: the five keep-sets are Datasets of doc ids; their
intersection is ONE tagged-union hash shuffle on doc_id (count==5),
never a driver set.  The final per-lang rollup attaches (lang,
n_tokens) through the same shuffle and partial-combines before the
five-row groupby.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

N_KEEP_RULES = 5


def _ids_only(ds, col: str = "doc_id"):
    def pick(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column(col)})

    return ds.map_batches(pick, batch_format="pyarrow")


def _kept_ids(sf_dir: str):
    """The five-rule keep set (ids surviving ALL rules): ONE
    tagged-union hash shuffle on doc_id counting rule votes — shared by
    ``curate_summary`` and ``curate_write`` so the summary counts and
    the written corpus can never desynchronize."""
    from search_engine_ray.ops.dedup import exact_dedup_ids, near_dup_keep_ids
    from search_engine_ray.ops.shuffle import bucketed_apply
    from search_engine_ray.ops.textstats import (
        decontaminate_ids,
        quality_filter_ids,
        source_mix_sample,
    )

    sets = [
        quality_filter_ids(sf_dir).select_columns(["doc_id"]),
        exact_dedup_ids(sf_dir),
        near_dup_keep_ids(sf_dir),
        decontaminate_ids(sf_dir),
        _ids_only(source_mix_sample(sf_dir)),
    ]
    tagged = sets[0].union(*sets[1:])
    n_rules = len(sets)  # threshold derives from the list, not a constant
    assert n_rules == N_KEEP_RULES, "update N_KEEP_RULES (docs reference it)"

    def keep_if_all(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("doc_id", sort=False).size()
        return pd.DataFrame({
            "doc_id": cnt[cnt >= n_rules].index.to_numpy(np.int64)})

    return bucketed_apply(tagged, ["doc_id"], keep_if_all)


def curate_summary(sf_dir: str):
    """Per-lang curation summary: docs_in, docs_kept (surviving ALL five
    rules), tokens_kept.  Rules (identical constants to the standalone
    ops): quality gate (>=30 simple tokens, mean token length >= 4),
    exact dedup (keep min doc_id per byte-identical text), near-dup
    removal (3-gram Jaccard >= 0.6 connected components, keep min id),
    benchmark decontamination (drop docs sharing any 4-gram with the
    doc_id%97==0 benchmark slice, and the slice itself), source-weighted
    mixing (MIX_WEIGHTS hash-residue rule)."""
    import ray.data
    from ray.data.aggregate import Sum

    from search_engine_ray.ops.shuffle import bucketed_apply

    kept = _kept_ids(sf_dir)

    # attach (lang, n_tokens) through one more doc_id shuffle
    from search_engine_ray.text.tokenizer import simple_tokenize

    def stats(batch: pa.Table) -> pa.Table:
        n = [len(simple_tokenize(t))
             for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "n_tokens": pa.array(n, pa.int64()),
            "side": pa.array(np.zeros(batch.num_rows, dtype=np.int8))})

    def ktag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "lang": pa.array([""] * n, pa.string()),
            "n_tokens": pa.array(np.zeros(n, dtype=np.int64)),
            "side": pa.array(np.ones(n, dtype=np.int8))})

    docs = (ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"])
        .map_batches(stats, batch_format="pyarrow"))
    both = docs.union(kept.map_batches(ktag, batch_format="pyarrow"))

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["side"] == 0]
        k = (g.loc[g["side"] == 1, ["doc_id"]].drop_duplicates()
              .assign(__k=np.int64(1)))
        m = d.merge(k, on="doc_id", how="left")
        kept = m["__k"].fillna(0).astype(np.int64).to_numpy()
        return pd.DataFrame({
            "lang": m["lang"].to_numpy(),
            "one": np.ones(len(m), dtype=np.int64),
            "kept": kept,
            "tok_kept": kept * m["n_tokens"].to_numpy(np.int64)})

    per = bucketed_apply(both, ["doc_id"], per_doc)

    def combine(batch: pa.Table) -> pa.Table:
        df = pa.Table.to_pandas(batch)
        g = df.groupby("lang", sort=False).agg(
            one=("one", "sum"), kept=("kept", "sum"),
            tok_kept=("tok_kept", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (per.map_batches(combine, batch_format="pyarrow")
               .groupby("lang")
               .aggregate(Sum("one", alias_name="docs_in"),
                          Sum("kept", alias_name="docs_kept"),
                          Sum("tok_kept", alias_name="tokens_kept")))


def curate_write(sf_dir: str, out_dir: str, chunk_tokens: int = 512,
                 write_partitions: int = 32):
    """Materializing variant: writes the curated corpus as PARTITIONED
    parquet with the packing chunk map attached; returns rows written.

    Scale shape (no corpus-sized driver state anywhere): the keep set,
    the corpus rows and the packing-plan rows meet in ONE tagged-union
    hash shuffle on doc_id — the same intersection shape as
    ``curate_summary`` — and the kept rows stream straight from that
    shuffle into a hive-partitioned write (``pk = doc_id %
    write_partitions``; size write_partitions with the cluster — the
    partition dirs bound per-file size and make the output scannable
    per key range; a RERUN wipes and rewrites the whole output, since
    parquet appends cannot be deduplicated post-hoc).  The only driver
    state is ``packing_plan``'s per-group offsets table (one row per
    ``group_size`` docs, documented bounded in textstats.py)."""
    import shutil

    import ray.data

    from search_engine_ray.ops.shuffle import bucketed_apply
    from search_engine_ray.ops.textstats import packing_plan

    # clean slate: Ray's write_parquet APPENDS uniquely-named files, so
    # rerunning into a half-written or previously-written out_dir would
    # silently double rows — a rerun is a full rewrite.  Only wipe a
    # directory that LOOKS like prior curate output (pk=* hive layout or
    # empty); anything else is someone's unrelated data — refuse.
    if os.path.exists(out_dir):
        entries = os.listdir(out_dir)
        if entries and not all(e.startswith("pk=") or e.startswith(".")
                               for e in entries):
            raise ValueError(
                f"curate_write: {out_dir!r} exists and does not look "
                "like prior curate output (expected only pk=* partition "
                "dirs) — refusing to delete it; remove it explicitly or "
                "pick another out_dir")
        shutil.rmtree(out_dir)

    kept = _kept_ids(sf_dir)

    # --- tagged union on doc_id: side 0 = corpus row (payload), side 1 =
    # kept marker, side 2 = packing-plan row (chunk id); the groupby
    # routes all three to one reducer per doc — a co-partitioned join,
    # not a broadcast
    def doc_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "lang": batch.column("lang"),
            "source": batch.column("source"),
            "text": batch.column("text"),
            "chunk": pa.array(np.zeros(n, dtype=np.int64)),
            "side": pa.array(np.zeros(n, dtype=np.int8))})

    def marker_rows(side: int):
        def tag(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            chunk = (batch.column("chunk_first").cast(pa.int64())
                     if side == 2
                     else pa.array(np.zeros(n, dtype=np.int64)))
            return pa.table({
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "lang": pa.array([""] * n, pa.string()),
                "source": pa.array([""] * n, pa.string()),
                "text": pa.array([""] * n, pa.string()),
                "chunk": chunk,
                "side": pa.array(np.full(n, side, dtype=np.int8))})
        return tag

    docs = (ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "source", "text"])
        .map_batches(doc_rows, batch_format="pyarrow"))
    plan = packing_plan(sf_dir, chunk_tokens=chunk_tokens)
    both = docs.union(
        kept.map_batches(marker_rows(1), batch_format="pyarrow"),
        plan.map_batches(marker_rows(2), batch_format="pyarrow"))

    def emit_kept(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["side"] == 0]
        k = (g.loc[g["side"] == 1, ["doc_id"]].drop_duplicates()
              .assign(__k=np.int64(1)))
        p = (g.loc[g["side"] == 2, ["doc_id", "chunk"]]
              .drop_duplicates(subset=["doc_id"])
              .rename(columns={"chunk": "__chunk"}))
        m = d.merge(k, on="doc_id", how="left")
        m = m[m["__k"].notna()]
        m = m.merge(p, on="doc_id", how="left")
        out = m[["doc_id", "lang", "source", "text"]].copy()
        out["chunk"] = m["__chunk"].fillna(0).astype(np.int64).to_numpy()
        out["pk"] = (m["doc_id"].to_numpy(np.int64)
                     % write_partitions)
        return out

    (bucketed_apply(both, ["doc_id"], emit_kept)
         .write_parquet(out_dir, partition_cols=["pk"]))
    import pyarrow.dataset as pads

    return pads.dataset(out_dir).count_rows()
