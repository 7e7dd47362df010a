"""Adapter: driver `documents` table -> F1 pages shape (FIXTURES.md §Driver).

`/root/testdata/sf*/documents.parquet` has (doc_id:int64, text:string,
lang:string, source:string, n_chars:int64).  The adapter maps it to the
engine's input contract deterministically:
  url     = source + '/' + doc_id
  warc_ts = 2020-07-27T00:00:00Z + doc_id seconds
  html    = the F1 wrap rule (title "t{doc_id}")
"""

from __future__ import annotations

import pyarrow as pa

from search_engine_ray.text.extract import wrap_html

_BASE_TS_US = 1595808000_000_000


def documents_batch_to_pages(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    sources = batch.column("source").to_pylist()
    langs = batch.column("lang").to_pylist()
    urls = [f"{s}/{d}" for s, d in zip(sources, doc_ids)]
    tss = [_BASE_TS_US + d * 1_000_000 for d in doc_ids]
    htmls = [wrap_html(t, f"t{d}") for t, d in zip(texts, doc_ids)]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def documents_to_pages_parquet(sf_dir: str, out_path: str) -> str:
    """Materialize the adapted pages table once (streaming, no driver
    materialization); returns the output dir."""
    import os
    import shutil

    import pyarrow.parquet as pq

    # fresh output dir: a rerun that takes a different path (fast vs
    # distributed) would otherwise leave the previous run's part files
    # mixed in, and the downstream index would silently read two
    # snapshots
    if os.path.isdir(out_path):
        shutil.rmtree(out_path)
    os.makedirs(out_path, exist_ok=True)
    doc_path = os.path.join(sf_dir, "documents.parquet")
    md = pq.ParquetFile(doc_path).metadata
    if md.num_rows <= 200_000:
        # small-table fast path: the transform is milliseconds at this
        # size, while spinning the distributed pipeline costs seconds of
        # fixed overhead; identical rows + row-group layout either way
        out = documents_batch_to_pages(pq.read_table(doc_path))
        pq.write_table(out, os.path.join(out_path, "pages.parquet"),
                       row_group_size=512)
        return out_path

    import ray.data

    ds = ray.data.read_parquet(doc_path)
    # fine row groups: the build's parse partitions are row-group chunks
    # (build._parse_partitions never splits a group), so coarse groups
    # would cap the downstream build's parallelism at the file count
    ds.map_batches(documents_batch_to_pages,
                   batch_format="pyarrow").write_parquet(
        out_path, row_group_size=512)
    return out_path
