"""Per-partition resume (SURVEY §4/§5.4): a build killed between
partition commits resumes by re-running ONLY uncommitted partitions, and
the resumed index is byte-identical to a from-scratch build."""

import glob
import os
import time

import pytest


def _file_map(root):
    """relpath -> bytes for every parquet file under root."""
    out = {}
    for p in glob.glob(os.path.join(root, "**", "*.parquet"),
                       recursive=True):
        with open(p, "rb") as f:
            out[os.path.relpath(p, root)] = f.read()
    return out


@pytest.fixture(scope="module")
def resume_setup(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.fixtures import gen_pages

    data_dir = tmp_path_factory.mktemp("resume_pages")
    # two files, tiny row groups -> many deterministic parse partitions
    for i in range(2):
        t = gen_pages(200, seed=7 + i)
        pq.write_table(t, str(data_dir / f"pages_{i}.parquet"),
                       row_group_size=32)
    cfg = EngineConfig(num_shards=4, term_buckets=4, parse_part_rows=64,
                       parser_concurrency=2)
    return str(data_dir), cfg


def test_kill_midstage_resume_byte_identical(resume_setup,
                                             tmp_path_factory):
    from search_engine_ray.index import manifest as mf
    from search_engine_ray.index.build import InjectedCrash, build_index
    from search_engine_ray.query.engine import SearchEngine

    data_dir, cfg = resume_setup
    out_a = str(tmp_path_factory.mktemp("idx_full"))
    out_b = str(tmp_path_factory.mktemp("idx_killed"))

    build_index(data_dir, out_a, cfg)

    # ---- kill 1: mid-parse, after 3 partition commits
    os.environ["GRAFT_CRASH_PARSED_AFTER"] = "3"
    try:
        with pytest.raises(InjectedCrash):
            build_index(data_dir, out_b, cfg)
    finally:
        del os.environ["GRAFT_CRASH_PARSED_AFTER"]
    time.sleep(1.0)  # let force-cancelled in-flight tasks settle
    parsed_dir = mf.stage_dir(out_b, "parsed")
    from search_engine_ray.index.build import INDEX_FORMAT

    in_files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    input_fp = mf.input_fingerprint(in_files)
    cfg_fp = f"{cfg.fingerprint()}-pages-v{INDEX_FORMAT}"
    from search_engine_ray.index.build import PER_FILE_LINEAGE

    parse_keys = mf.committed_parts(out_b, "parsed", PER_FILE_LINEAGE,
                                    cfg_fp)
    assert len(parse_keys) >= 3
    committed_before = {}
    for key in parse_keys:
        p = os.path.join(parsed_dir, f"part-{key}.parquet")
        committed_before[p] = os.stat(p).st_mtime_ns

    # ---- kill 2: mid-dict-reduce
    os.environ["GRAFT_CRASH_DICT_AFTER"] = "1"
    try:
        with pytest.raises(InjectedCrash):
            build_index(data_dir, out_b, cfg)
    finally:
        del os.environ["GRAFT_CRASH_DICT_AFTER"]
    time.sleep(1.0)

    # ---- kill 3: mid-postings-reduce, after 2 partition commits
    os.environ["GRAFT_CRASH_POSTINGS_AFTER"] = "2"
    try:
        with pytest.raises(InjectedCrash):
            build_index(data_dir, out_b, cfg)
    finally:
        del os.environ["GRAFT_CRASH_POSTINGS_AFTER"]
    time.sleep(1.0)

    # ---- kill 4: mid-docmeta.  Docmeta OVERLAPS stages 2+3 (it depends
    # only on the parse checkpoint), so the kill-2/kill-3 runs already
    # completed it in their concurrent thread — clear it to get fresh
    # docmeta work for this crash, exactly like a new config would.
    mf.clear_stage(out_b, "docmeta")
    os.environ["GRAFT_CRASH_DOCMETA_AFTER"] = "2"
    try:
        with pytest.raises(InjectedCrash):
            build_index(data_dir, out_b, cfg)
    finally:
        del os.environ["GRAFT_CRASH_DOCMETA_AFTER"]
    time.sleep(1.0)
    postings_dir = mf.stage_dir(out_b, "postings")
    # snapshot only COMMITTED partitions' files: a task that finished
    # between the last commit and the crash legitimately re-runs (its
    # rewrite is byte-identical, but mtime moves)
    committed_keys = mf.committed_parts(out_b, "postings", input_fp, cfg_fp)
    assert len(committed_keys) >= 2
    suffixes = set()
    for key in committed_keys:  # "tbucket=N/sshard=M"
        tb = int(key.split("/")[0].split("=")[1])
        sh = int(key.split("/")[1].split("=")[1])
        suffixes.add(f"part-tb{tb:05d}-s{sh:05d}.parquet")
    postings_before = {
        p: os.stat(p).st_mtime_ns
        for p in glob.glob(os.path.join(postings_dir, "**", "*.parquet"),
                           recursive=True)
        if os.path.basename(p) in suffixes}
    assert len(postings_before) >= 1

    # ---- resume to completion
    man_b = build_index(data_dir, out_b, cfg)
    man_a = mf.read_manifest(out_a)

    # committed parse partitions were NOT re-run (mtime untouched)...
    for p, mt in committed_before.items():
        assert os.stat(p).st_mtime_ns == mt, f"re-parsed {p}"
    # ...and neither were committed postings partitions
    for p, mt in postings_before.items():
        assert os.stat(p).st_mtime_ns == mt, f"re-reduced {p}"
    # the resume actually skipped work (counters record it)
    postings_marker = os.path.join(postings_dir, mf.STAGE_MARKER)
    import json

    with open(postings_marker) as f:
        counters = json.load(f)["counters"]
    assert counters["resumed_partitions"] >= 2

    # byte-identical index: every file of every stage matches the
    # from-scratch build exactly (all four stages write deterministic
    # per-partition files)
    for stage in ("parsed", "dict", "postings", "docmeta"):
        a = _file_map(mf.stage_dir(out_a, stage))
        b = _file_map(mf.stage_dir(out_b, stage))
        assert a.keys() == b.keys(), stage
        for rel in a:
            assert a[rel] == b[rel], f"{stage}/{rel} differs"

    assert man_a["n_docs"] == man_b["n_docs"]
    assert man_a["avg_doc_length"] == man_b["avg_doc_length"]

    # and the engines agree
    ea, eb = SearchEngine(out_a), SearchEngine(out_b)
    for q in ("covid vaccine", "the president said", "data"):
        assert ea.search(q, k=10, mode="bm25") == eb.search(
            q, k=10, mode="bm25")
