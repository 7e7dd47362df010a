"""Stage manifests: checkpoint/resume + per-partition lineage records.

The reference has no resume story (SURVEY.md §4: rerun from scratch).
The rebuild writes each index stage (parsed / dict / postings / docmeta)
to its own directory and commits a ``_STAGE_OK.json`` marker atomically
(write temp + rename) AFTER the stage's parquet files land.  A marker
records the stage's input fingerprint, config fingerprint, per-file row
counts (lineage) and counters; ``build_index`` skips any stage whose
marker matches the current inputs — that is what "resumable from the
last committed checkpoint" means for this batch pipeline
(BASELINE.json north_rule).
"""

from __future__ import annotations

import json
import os
import time


STAGE_MARKER = "_STAGE_OK.json"


def stage_dir(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage)


def stage_complete(out_dir: str, stage: str, input_fp: str, config_fp: str) -> bool:
    path = os.path.join(stage_dir(out_dir, stage), STAGE_MARKER)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            m = json.load(f)
        return m.get("input_fp") == input_fp and m.get("config_fp") == config_fp
    except Exception:
        return False


def commit_stage(out_dir: str, stage: str, *, input_fp: str, config_fp: str,
                 counters: dict) -> dict:
    """Atomically write the stage marker with per-file lineage."""
    sdir = stage_dir(out_dir, stage)
    os.makedirs(sdir, exist_ok=True)  # a stage may legitimately write 0 files
    files = []
    for root, _, names in os.walk(sdir):
        for n in sorted(names):
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                files.append({
                    "path": os.path.relpath(p, sdir),
                    "bytes": os.path.getsize(p),
                })
    marker = {
        "stage": stage,
        "input_fp": input_fp,
        "config_fp": config_fp,
        "committed_at": time.time(),
        "files": files,
        "counters": counters,
    }
    tmp = os.path.join(sdir, STAGE_MARKER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(marker, f, indent=1)
    os.replace(tmp, os.path.join(sdir, STAGE_MARKER))
    return marker


PART_LOG = "_PARTS.jsonl"


def part_log_path(out_dir: str, stage: str) -> str:
    return os.path.join(stage_dir(out_dir, stage), PART_LOG)


def committed_parts(out_dir: str, stage: str, input_fp: str,
                    config_fp: str) -> set[str]:
    """Partition keys committed for this (stage, input, config) — the
    per-partition commit log.  A killed run resumes by skipping these.

    Entries for other fingerprints are ignored (a changed input/config
    restarts the stage from scratch)."""
    path = part_log_path(out_dir, stage)
    done: set[str] = set()
    if not os.path.exists(path):
        return done
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    e = json.loads(line)
                except Exception:
                    continue  # torn tail line from a crash mid-append
                if (e.get("input_fp") == input_fp
                        and e.get("config_fp") == config_fp):
                    done.add(e["part"])
    except OSError:
        return set()
    return done


def commit_part(out_dir: str, stage: str, part: str, *, input_fp: str,
                config_fp: str, meta: dict | None = None) -> None:
    """Append one partition-commit record (called AFTER the partition's
    output file is atomically renamed into place).  Single-writer append;
    a torn tail line is tolerated by committed_parts, which simply
    re-runs that partition — partition outputs are deterministic, so the
    rewrite is idempotent."""
    sdir = stage_dir(out_dir, stage)
    os.makedirs(sdir, exist_ok=True)
    rec = {"part": part, "input_fp": input_fp, "config_fp": config_fp,
           "committed_at": time.time()}
    if meta:
        rec["meta"] = meta
    with open(part_log_path(out_dir, stage), "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
        os.fsync(f.fileno())


def clear_stage(out_dir: str, stage: str) -> None:
    import shutil

    sdir = stage_dir(out_dir, stage)
    if os.path.exists(sdir):
        shutil.rmtree(sdir)


def input_fingerprint(paths) -> str:
    """Fingerprint of the input file set — gates whether a stage is
    resumed as complete, so it must rotate on ANY content change:
    path + size + st_mtime_ns (whole seconds miss same-second
    rewrites) + the parquet footer tail (copied-over files with
    preserved mtime still digest differently: the footer encodes
    row-group layout and column statistics)."""
    import hashlib

    h = hashlib.blake2b(digest_size=8)
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
        try:
            with open(p, "rb") as f:
                # last 8 bytes: <footer_len><'PAR1'>; digest the footer
                f.seek(max(0, st.st_size - 8))
                tail = f.read(8)
                if len(tail) == 8 and tail[4:] == b"PAR1":
                    flen = int.from_bytes(tail[:4], "little")
                    f.seek(max(0, st.st_size - 8 - flen))
                    h.update(f.read())
        except OSError:
            pass  # stat already contributed; unreadable tail is no worse
    return h.hexdigest()


def write_manifest(out_dir: str, payload: dict) -> None:
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))


def read_manifest(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "manifest.json")) as f:
        return json.load(f)


def load_df_map(out_dir: str) -> dict:
    """The query-time dictionary: final term -> global df (see
    load_df_and_orig for the collision rule)."""
    return load_df_and_orig(out_dir)[0]


def load_df_and_orig(out_dir: str) -> tuple[dict, dict]:
    """The query-time dictionary plus the capitals-collision winner map,
    shared by the in-process and distributed engines (ONE loader so a
    reserved-key or collision-rule change can never diverge between
    them).  Returns ``(df_map, caps_orig)``:

    - ``df_map``: final term -> global df.
    - ``caps_orig``: final term -> the WINNING orig term, only for final
      terms whose dict entry saw more than one orig term (capitals UPPER
      rewrite collisions, e.g. 'straße'/'strasse' -> 'STRASSE').  The
      posting readers use it to serve exactly the winner's rows — the
      losers' posting rows exist on disk (written by other reduce tasks,
      possibly in other tbuckets) and must be skipped.

    Reserved corpus-stat rows (\x01 current, \x00 legacy) are dropped.
    Duplicate FINAL terms can exist across bucket files when the
    capitals UPPER rewrite collides across term buckets (distinct orig
    terms, same final term); the reference's sorted-merge overwrite
    keeps the lexicographically GREATEST orig term's entry
    (indexer.py:161-166), so ties resolve by max orig_term here —
    deterministic regardless of file read order."""
    import glob

    import pyarrow.dataset as pads

    ddir = stage_dir(out_dir, "dict")
    if not glob.glob(os.path.join(ddir, "**", "*.parquet"),
                     recursive=True):
        return {}, {}  # zero-doc / fully-pruned index
    dt = pads.dataset(ddir).to_table(columns=["term", "orig_term", "df"])
    out: dict = {}
    best_orig: dict = {}
    dups: set = set()
    for t, o, d in zip(dt.column("term").to_pylist(),
                       dt.column("orig_term").to_pylist(),
                       dt.column("df").to_pylist()):
        if t.startswith(("\x00", "\x01")):
            continue
        if t in out:
            if best_orig[t] != o:
                dups.add(t)
            if o > best_orig[t]:
                out[t] = d
                best_orig[t] = o
        else:
            out[t] = d
            best_orig[t] = o
    return out, {t: best_orig[t] for t in dups}
