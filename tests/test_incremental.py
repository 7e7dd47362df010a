"""Incremental ingestion (per-file parse/docmeta lineage): adding input
files to an existing index re-parses ONLY the new files, and the updated
index is byte-identical to a from-scratch build on the union input;
removing a file rolls the index back byte-identically too."""

import glob
import json
import os

import pytest


def _file_map(root):
    out = {}
    for p in glob.glob(os.path.join(root, "**", "*.parquet"),
                       recursive=True):
        with open(p, "rb") as f:
            out[os.path.relpath(p, root)] = f.read()
    return out


def _stage_maps(out_dir):
    from search_engine_ray.index import manifest as mf

    return {st: _file_map(mf.stage_dir(out_dir, st))
            for st in ("parsed", "dict", "postings", "docmeta")}


def _marker_counters(out_dir, stage):
    from search_engine_ray.index import manifest as mf

    with open(os.path.join(mf.stage_dir(out_dir, stage),
                           mf.STAGE_MARKER)) as f:
        return json.load(f)["counters"]


def test_incremental_add_and_remove_byte_identical(ray_session,
                                                   tmp_path_factory):
    import pyarrow.parquet as pq

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.fixtures import gen_pages
    from search_engine_ray.index.build import build_index
    from search_engine_ray.query.engine import SearchEngine

    data_dir = tmp_path_factory.mktemp("inc_pages")
    for i in range(2):
        pq.write_table(gen_pages(250, seed=31 + i, start=250 * i),
                       str(data_dir / f"pages_{i}.parquet"),
                       row_group_size=64)
    cfg = EngineConfig(num_shards=4, term_buckets=4, parse_part_rows=128,
                       parser_concurrency=2)

    inc = str(tmp_path_factory.mktemp("idx_inc"))
    build_index(str(data_dir), inc, cfg)
    maps_ab = _stage_maps(inc)
    parse_mtimes = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(inc, "parsed", "*.parquet"))}
    docmeta_mtimes = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(inc, "docmeta", "*.parquet"))}

    # ---- ADD a third file; update the SAME index dir
    new_file = str(data_dir / "pages_2.parquet")
    pq.write_table(gen_pages(250, seed=33, start=500), new_file,
                   row_group_size=64)
    build_index(str(data_dir), inc, cfg)

    # only the new file's partitions were parsed (old outputs untouched)
    for p, mt in parse_mtimes.items():
        assert os.stat(p).st_mtime_ns == mt, f"re-parsed {p}"
    for p, mt in docmeta_mtimes.items():
        assert os.stat(p).st_mtime_ns == mt, f"re-centroided {p}"
    c = _marker_counters(inc, "parsed")
    assert c["resumed_partitions"] >= 2
    assert c["partitions"] > c["resumed_partitions"]

    # byte-identical to a from-scratch build on the union input
    full = str(tmp_path_factory.mktemp("idx_full"))
    build_index(str(data_dir), full, cfg)
    maps_full, maps_inc = _stage_maps(full), _stage_maps(inc)
    for st in ("parsed", "dict", "postings", "docmeta"):
        assert maps_full[st].keys() == maps_inc[st].keys(), st
        for rel in maps_full[st]:
            assert maps_full[st][rel] == maps_inc[st][rel], f"{st}/{rel}"

    ei, ef = SearchEngine(inc), SearchEngine(full)
    for q in ("covid vaccine", "the president said", "data"):
        assert ei.search(q, k=10, mode="bm25") == ef.search(
            q, k=10, mode="bm25")

    # ---- REMOVE the third file again: the update must roll back to the
    # original two-file index, byte for byte (stale parse/docmeta
    # outputs dropped, shuffles re-reduced)
    os.remove(new_file)
    build_index(str(data_dir), inc, cfg)
    maps_back = _stage_maps(inc)
    for st in ("parsed", "dict", "postings", "docmeta"):
        assert maps_back[st].keys() == maps_ab[st].keys(), st
        for rel in maps_ab[st]:
            assert maps_back[st][rel] == maps_ab[st][rel], f"{st}/{rel}"
