"""Merge built indexes into one — the incremental-ingest path.

A corpus that grows by deltas should not re-run the expensive parse
stage over the whole history: build each delta into its own index
(``build_index``), then ``merge_indexes`` folds N indexes into one
whose dictionary, postings, corpus stats and docmeta equal a full
rebuild over the union corpus.  The merge never touches raw documents
— it regenerates the build's fused shuffle SPILL from the existing
indexes (posting rows decode back into SPIMI-run rows keyed by their
ORIG term; dict rows decompose back into (df, caps) partials) and then
runs the build's OWN phase-B reduce tasks (``_reduce_dict_part`` /
``_reduce_postings_part``) unchanged, so the output is produced by the
same deterministic code path as a direct build, with the same
per-partition commit log (a killed merge resumes).

Cost at cluster scale: ONE shuffle of the posting rows (index-sized,
typically 10-100x smaller than the raw corpus the parse stage would
re-read) plus a metadata-sized dict shuffle; docmeta partitions are
copied file-wise (disjoint doc sets concatenate).

Exactness: with ``prune_df1=False`` the merged index is semantically
identical to a full rebuild over the union corpus — the capitals
UPPER-rewrite verdict is re-derived globally (every term occurrence
writes a caps flag, so the per-generation verdicts AND together into
exactly the union verdict; rewritten postings re-route to the final
term's bucket through the shuffle).  Two reference quirk-rules are
destructive at build time and therefore CANNOT be re-evaluated across
generations (their pruned postings were never written):

- ``prune_df1=True``: a term df==1 inside one generation lost its
  posting row there; the merged df counts surviving rows only (the
  merged index equals a full rebuild over the SURVIVING postings, and
  the df==1 rule re-applies to the merged df).
- the entity<2 prune (near-dead as written, see apply_dict_rules): a
  term entity-pruned inside one generation stays gone; survivors are
  never newly pruned (entity counts only grow with more docs).

Preconditions: all source indexes share one config fingerprint, and
their doc-id sets are disjoint (delta semantics — the same document
indexed twice would duplicate its postings; ``doc_id_for_url`` makes
ids content-addressed, so disjoint input files give disjoint ids).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa

from search_engine_ray.config import EngineConfig
from search_engine_ray.index import manifest as mf
from search_engine_ray.index.build import (
    NDOCS_KEY,
    RUN_SCHEMA,
    _bucket_array,
    _reduce_dict_part,
    _reduce_postings_part,
    _run_part_tasks,
    _spill_base,
)

_POSTING_COLS = ["shard", "term", "orig", "n", "docids_vb", "tf_vb",
                 "dl_vb", "mtf_vb", "uniq_vb", "pos_vb"]


def _decode_run_rows(batch: pa.Table, term_buckets: int) -> pa.Table:
    """Final posting rows -> SPIMI-run rows keyed by ORIG term.

    The per-(term, doc-shard) delta+varbyte doc-id stream decodes back
    to absolute ids with ONE vectorized pass over the whole batch (flat
    decode, then a segment-rebased cumulative sum); the tf/dl/mtf/uniq/
    position varbyte streams are reused byte-for-byte (they encode
    plain per-posting values in the exact order FinalizeBucket will
    re-sort from)."""
    from search_engine_ray.index.encoding import varbyte_decode

    n = batch.column("n").to_numpy()
    total = int(n.sum())
    flat = varbyte_decode(b"".join(batch.column("docids_vb").to_pylist()),
                          count=total)
    cs = np.cumsum(flat)
    starts = np.concatenate(([0], np.cumsum(n)[:-1])).astype(np.int64)
    base = np.where(starts > 0, cs[starts - 1], 0)
    ids = cs - np.repeat(base, n)
    origs = batch.column("orig").to_pylist()
    rows = len(origs)
    docids = [ids[s:s + int(c)].tobytes()
              for s, c in zip(starts, n)]
    return pa.table({
        "tbucket": _bucket_array(origs, term_buckets),
        "sshard": batch.column("shard").cast(pa.int32()),
        "term": pa.array(origs, pa.string()),
        "n": batch.column("n").cast(pa.int64()),
        "docids": pa.array(docids, pa.binary()),
        "tfs": batch.column("tf_vb").cast(pa.binary()),
        "dls": batch.column("dl_vb").cast(pa.binary()),
        "mtfs": batch.column("mtf_vb").cast(pa.binary()),
        "uniqs": batch.column("uniq_vb").cast(pa.binary()),
        "poss": batch.column("pos_vb").cast(pa.binary()),
        "df_part": pa.nulls(rows, pa.int64()),
        "caps_part": pa.nulls(rows, pa.int8()),
        "ent_part": pa.nulls(rows, pa.int64()),
    }).cast(RUN_SCHEMA)


def _dict_partial_rows(batch: pa.Table, term_buckets: int) -> pa.Table:
    """Final dict rows -> (df, caps) partial rows keyed by ORIG term.

    Every term occurrence writes a caps flag at parse time, so a
    generation's ``rewritten`` verdict IS its caps-AND over its docs;
    re-emitting it as a caps partial makes the merged reduce's min()
    recompute exactly the union verdict.  Reserved ``\\x01`` corpus-stat
    rows ride through with summed df, same as in a direct build."""
    origs = batch.column("orig_term").to_pylist()
    rows = len(origs)
    caps = batch.column("rewritten").to_numpy(
        zero_copy_only=False).astype(np.int8)
    return pa.table({
        "tbucket": _bucket_array(origs, term_buckets),
        "sshard": pa.array(np.full(rows, -1, np.int32)),
        "term": pa.array(origs, pa.string()),
        "n": pa.nulls(rows, pa.int64()),
        "docids": pa.nulls(rows, pa.binary()),
        "tfs": pa.nulls(rows, pa.binary()),
        "dls": pa.nulls(rows, pa.binary()),
        "mtfs": pa.nulls(rows, pa.binary()),
        "uniqs": pa.nulls(rows, pa.binary()),
        "poss": pa.nulls(rows, pa.binary()),
        "df_part": batch.column("df").cast(pa.int64()),
        "caps_part": pa.array(caps, pa.int8()),
        "ent_part": pa.nulls(rows, pa.int64()),
    }).cast(RUN_SCHEMA)


def merge_indexes(src_dirs: list[str], out_dir: str) -> dict:
    """Fold the indexes at ``src_dirs`` into one index at ``out_dir``;
    returns the merged manifest.  See the module docstring for
    semantics, cost and preconditions.  Resumable: the dict/postings
    stages commit per partition exactly like ``build_index``."""
    import ray.data

    if len(src_dirs) < 2:
        raise ValueError("merge_indexes needs at least two source indexes")
    mans = [mf.read_manifest(d) for d in src_dirs]
    fps = {m["config_fp"] for m in mans}
    if len(fps) != 1:
        raise ValueError(
            f"source indexes disagree on config fingerprint: {sorted(fps)}")
    cfg = EngineConfig(**mans[0]["config"])
    cfg_fp = mans[0]["config_fp"]
    # merge lineage: the sources' own input fingerprints, order-free
    input_fp = mf.input_fingerprint(sorted(
        os.path.join(d, "manifest.json") for d in src_dirs))

    os.makedirs(out_dir, exist_ok=True)
    dict_dir = mf.stage_dir(out_dir, "dict")
    postings_dir = mf.stage_dir(out_dir, "postings")
    docmeta_dir = mf.stage_dir(out_dir, "docmeta")
    counters: dict = {"merged_indexes": len(src_dirs)}

    spill_dir = os.path.join(_spill_base(out_dir), "_merge_spill")
    spill_marker = os.path.join(spill_dir, "_SPILL_OK.json")

    def _ensure_spill() -> None:
        if os.path.exists(spill_marker):
            with open(spill_marker) as f:
                m = json.load(f)
            if (m.get("input_fp") == input_fp
                    and m.get("config_fp") == cfg_fp):
                return
        shutil.rmtree(spill_dir, ignore_errors=True)
        os.makedirs(spill_dir, exist_ok=True)
        B = cfg.term_buckets
        post_files = [f for d in src_dirs for f in sorted(glob.glob(
            os.path.join(mf.stage_dir(d, "postings"), "**", "*.parquet"),
            recursive=True))]
        if post_files:
            (ray.data.read_parquet(post_files, columns=_POSTING_COLS)
             .map_batches(lambda b: _decode_run_rows(b, B),
                          batch_format="pyarrow")
             .write_parquet(spill_dir, partition_cols=["tbucket", "sshard"],
                            compression="none"))
        dict_files = [f for d in src_dirs for f in sorted(glob.glob(
            os.path.join(mf.stage_dir(d, "dict"), "**", "*.parquet"),
            recursive=True))]
        if dict_files:
            (ray.data.read_parquet(
                dict_files, columns=["term", "orig_term", "df", "rewritten"])
             .map_batches(lambda b: _dict_partial_rows(b, B),
                          batch_format="pyarrow")
             .write_parquet(spill_dir, partition_cols=["tbucket", "sshard"],
                            compression="none"))
        with open(spill_marker + ".tmp", "w") as f:
            json.dump({"input_fp": input_fp, "config_fp": cfg_fp}, f)
        os.replace(spill_marker + ".tmp", spill_marker)

    dict_complete = mf.stage_complete(out_dir, "dict", input_fp, cfg_fp)
    postings_complete = mf.stage_complete(out_dir, "postings", input_fp,
                                          cfg_fp)
    if not (dict_complete and postings_complete):
        _ensure_spill()

    # ---- dict reduce: the build's own per-kbucket task, unchanged
    if not dict_complete:
        done = mf.committed_parts(out_dir, "dict", input_fp, cfg_fp)
        if not done:
            mf.clear_stage(out_dir, "dict")
        os.makedirs(dict_dir, exist_ok=True)
        for stray in glob.glob(os.path.join(dict_dir, "*.tmp-*")):
            os.remove(stray)
        kdirs = sorted(
            (int(tb.split("=", 1)[1]),
             os.path.join(spill_dir, tb, "sshard=-1"))
            for tb in os.listdir(spill_dir) if tb.startswith("tbucket=")
            if os.path.isdir(os.path.join(spill_dir, tb, "sshard=-1")))
        work = [(f"kbucket={tb}", (d, dict_dir, cfg.prune_df1, tb))
                for tb, d in kdirs if f"kbucket={tb}" not in done]
        _run_part_tasks(work, _reduce_dict_part, out_dir=out_dir,
                        stage="dict", input_fp=input_fp, config_fp=cfg_fp,
                        crash_env="GRAFT_CRASH_MERGE_DICT_AFTER")
        mf.commit_stage(out_dir, "dict", input_fp=input_fp,
                        config_fp=cfg_fp,
                        counters={"shuffle_partitions": len(kdirs),
                                  "resumed_partitions": len(done)})

    # corpus stats from the merged dict's reserved rows
    import pyarrow.dataset as pads

    stats_t = pads.dataset(dict_dir).to_table(
        filter=pads.field("term").isin([NDOCS_KEY, "\x01__sumdl__"]),
        columns=["term", "df"])
    stats = dict(zip(stats_t.column("term").to_pylist(),
                     stats_t.column("df").to_pylist()))
    n_docs = int(stats.get(NDOCS_KEY, 0))
    sum_dl = int(stats.get("\x01__sumdl__", 0))
    avg_dl = sum_dl / n_docs if n_docs else 0.0
    counters.update(n_docs=n_docs, sum_doc_length=sum_dl,
                    avg_doc_length=avg_dl)

    # ---- postings reduce: the build's own per-(tbucket, sshard) task
    if not postings_complete:
        done = mf.committed_parts(out_dir, "postings", input_fp, cfg_fp)
        if not done:
            mf.clear_stage(out_dir, "postings")
        os.makedirs(postings_dir, exist_ok=True)
        for stray in glob.glob(os.path.join(postings_dir, "**", "*.tmp-*"),
                               recursive=True):
            os.remove(stray)
        part_dirs = sorted(
            os.path.join(spill_dir, tb, sh)
            for tb in os.listdir(spill_dir) if tb.startswith("tbucket=")
            for sh in os.listdir(os.path.join(spill_dir, tb))
            if sh.startswith("sshard=") and not sh.endswith("=-1"))

        def part_key(d):
            parent, shpart = os.path.split(d.rstrip("/"))
            return f"{os.path.basename(parent)}/{shpart}"

        def dict_path(d):
            parent, _ = os.path.split(d.rstrip("/"))
            tb = int(os.path.basename(parent).rsplit("=", 1)[1])
            return os.path.join(dict_dir, f"part-kbucket={tb}.parquet")

        work = [(part_key(d), (d, dict_path(d), postings_dir, avg_dl, cfg))
                for d in part_dirs if part_key(d) not in done]
        _run_part_tasks(work, _reduce_postings_part, out_dir=out_dir,
                        stage="postings", input_fp=input_fp,
                        config_fp=cfg_fp,
                        crash_env="GRAFT_CRASH_MERGE_POSTINGS_AFTER")
        mf.commit_stage(out_dir, "postings", input_fp=input_fp,
                        config_fp=cfg_fp,
                        counters={"shuffle_partitions": len(part_dirs),
                                  "resumed_partitions": len(done)})
    shutil.rmtree(spill_dir, ignore_errors=True)
    try:
        os.rmdir(os.path.dirname(spill_dir))
    except OSError:
        pass

    # ---- docmeta: disjoint doc sets concatenate file-wise (at cluster
    # scale this is an object-store/fs move, not a recompute); the g{i}
    # prefix keeps names collision-free when two generations were built
    # from same-named inputs
    if not mf.stage_complete(out_dir, "docmeta", input_fp, cfg_fp):
        mf.clear_stage(out_dir, "docmeta")
        os.makedirs(docmeta_dir, exist_ok=True)
        n_files = 0
        for i, d in enumerate(src_dirs):
            for f in sorted(glob.glob(
                    os.path.join(mf.stage_dir(d, "docmeta"), "**",
                                 "*.parquet"), recursive=True)):
                dst = os.path.join(docmeta_dir,
                                   f"g{i:03d}-{os.path.basename(f)}")
                shutil.copy2(f, dst)
                n_files += 1
        mf.commit_stage(out_dir, "docmeta", input_fp=input_fp,
                        config_fp=cfg_fp, counters={"files": n_files})

    payload = {
        "version": 1,
        "config": mans[0]["config"],
        "config_fp": cfg_fp,
        "input_fp": input_fp,
        "n_docs": n_docs,
        "sum_doc_length": sum_dl,
        "avg_doc_length": avg_dl,
        "counters": counters,
    }
    mf.write_manifest(out_dir, payload)
    return payload
