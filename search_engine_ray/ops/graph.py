"""Graph analytics over the events click stream.

The `events` table is a web click log: `props.k` is the page/item a
user touched, so consecutive events of one user (ordered by ts,
event_id) define a directed co-visitation edge k_prev -> k_next — the
classic click-graph construction behind "important pages" ranking
(Brin & Page's PageRank, public 1998 paper).

Scale shape: edge EXTRACTION is the 100-TB-sized work and runs fully
distributed — one user-keyed bucket shuffle (complete user streams per
bucket), vectorized sort+shift pairing per bucket, per-bucket partial
(src, dst, w) counts.  The NODE dimension (distinct `props.k`) is
bounded by construction (a catalog / page-id space, not the event
count), so the edge list the driver merges is at most |K|^2 rows and
the power iteration itself is a node-dimension-sized numpy loop —
the same partials-to-driver contract as label_centroids /
funnel_conversion.  For web-scale node sets (10^9 urls) the iteration
would instead route rank mass through a src-keyed shuffle join per
step; that variant shares click_edges unchanged.

All PageRank arithmetic is INTEGER (rank mass scaled by 1e12, floor
division) so per-node sums are order-free and the DuckDB mirror
(unrolled fixed-iteration CTEs, ops/sqlcheck.SQL_CLICK_PAGERANK)
hash-matches exactly: contribution of edge (j -> i, w) is
floor(r_j * w / wout_j), computed as the overflow-safe identity
(r//wout)*w + ((r%wout)*w)//wout  (exact for any ints; the remainder
product is < wout*w, so int64 holds it for wout, w < ~3e9), and
r_i' = floor(0.15*S/N) + floor(85 * sum(contrib) / 100).  Dangling
nodes (no out-edges) leak their mass — identically on both sides.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

RANK_SCALE = 10**12


_INT_TOKEN = None  # compiled lazily (module import stays light)


def _k_value(obj) -> int | None:
    """The node id of one parsed props object under the EXACT rule the
    SQL mirror applies — `json_extract_string(props, '$.k')` gated by
    an integer-token regex: top-level "k" only, JSON ints (in int64
    range) and integer-token strings count; floats (whose extracted
    token carries '.'/'e'), bools, nested objects, arrays and null do
    not.  A substring regex over the raw JSON would diverge on nested
    {"a":{"k":3}} and on float tokens — hence real parsing."""
    global _INT_TOKEN
    if _INT_TOKEN is None:
        import re

        # ASCII digits only: the mirror's '^-?[0-9]+$' never matches
        # Unicode digits, but Python's \d (and int()) would accept
        # them — '"٥٣"' must NOT become node 53 here
        _INT_TOKEN = re.compile(r"-?[0-9]+")
    v = obj.get("k") if isinstance(obj, dict) else None
    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return v if -(1 << 63) <= v < (1 << 63) else None
    if isinstance(v, str) and _INT_TOKEN.fullmatch(v):
        iv = int(v)
        return iv if -(1 << 63) <= iv < (1 << 63) else None
    return None


def _parse_k_batch(batch: pa.Table) -> pa.Table:
    """(event_id, ts, user_id, k) rows for events whose props carry an
    integer-valued top-level k (the click-graph node rule, shared by
    every click-graph op); malformed JSON and non-integer k drop."""
    import json

    ks = np.zeros(batch.num_rows, np.int64)
    ok = np.zeros(batch.num_rows, bool)
    for i, s in enumerate(batch.column("props").to_pylist()):
        try:
            v = _k_value(json.loads(s)) if s is not None else None
        except ValueError:
            v = None
        if v is not None:
            ks[i] = v
            ok[i] = True
    t = pa.table({"event_id": batch.column("event_id"),
                  "ts": batch.column("ts").cast(pa.int64()),
                  "user_id": batch.column("user_id"),
                  "k": pa.array(ks, pa.int64())})
    return t.filter(pa.array(ok))


def click_edges(sf_dir: str):
    """Directed co-visitation edges (src, dst, w): consecutive events
    of one user ordered by (ts, event_id), node = props.k (events with
    no integer-valued top-level k are dropped before pairing — see
    `_k_value`; malformed-JSON rows are dropped too, where the SQL
    oracle's json_extract would instead error).  Distributed: one
    user-keyed bucket shuffle; each bucket holds its users' COMPLETE
    streams, so sort+shift inside the bucket sees every consecutive
    pair; emitted rows are per-bucket (src, dst) partial counts."""
    import ray.data

    from search_engine_ray.ops.shuffle import bucketed_apply

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "props"])
    parse_k = _parse_k_batch

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        k = g["k"].to_numpy()
        if len(k) < 2:
            return pd.DataFrame({"src": np.zeros(0, np.int64),
                                 "dst": np.zeros(0, np.int64),
                                 "w": np.zeros(0, np.int64)})
        m = uid[:-1] == uid[1:]
        e = pd.DataFrame({"src": k[:-1][m], "dst": k[1:][m]})
        out = (e.groupby(["src", "dst"], sort=False).size()
                .rename("w").reset_index())
        return out.astype({"src": np.int64, "dst": np.int64,
                           "w": np.int64})

    return bucketed_apply(ds.map_batches(parse_k, batch_format="pyarrow"),
                          ["user_id"], pairs)


def _empty_ranks() -> pa.Table:
    return pa.table({"node": pa.array([], pa.int64()),
                     "rank_e12": pa.array([], pa.int64())})


def pagerank_from_edges(edges: pd.DataFrame, iters: int = 10,
                        damping_pct: int = 85) -> pa.Table:
    """Integer-exact power iteration over a merged (src, dst, w) edge
    frame; see module docstring for the arithmetic contract."""
    if edges.empty:
        return _empty_ranks()
    edges = (edges.groupby(["src", "dst"], sort=False)["w"].sum()
                  .reset_index())
    src = edges["src"].to_numpy(np.int64)
    dst = edges["dst"].to_numpy(np.int64)
    w = edges["w"].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    wout = np.zeros(n, np.int64)
    np.add.at(wout, si, w)
    jump_pct = 100 - damping_pct
    base = (jump_pct * RANK_SCALE) // (100 * n)
    r = np.full(n, RANK_SCALE // n, np.int64)
    wo = wout[si]  # > 0 for every edge's src by construction
    for _ in range(iters):
        rs = r[si]
        contrib = (rs // wo) * w + ((rs % wo) * w) // wo
        s = np.zeros(n, np.int64)
        np.add.at(s, di, contrib)
        r = base + (damping_pct * s) // 100
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "rank_e12": pa.array(r, pa.int64())})


def click_pagerank(sf_dir: str, iters: int = 10) -> pa.Table:
    """(node, rank_e12) PageRank of the click co-visitation graph,
    ascending by node.  rank_e12 is the integer rank mass scaled by
    1e12 (total mass <= 1e12; floor leak is deterministic)."""
    edges = click_edges(sf_dir).to_pandas()
    return pagerank_from_edges(edges, iters=iters)


def click_triangles(sf_dir: str) -> pa.Table:
    """Per-node triangle counts over the undirected click graph —
    cohesion analytics (how clustered is the co-visitation
    neighborhood).  Edge derivation is fully distributed (click_edges'
    user-keyed shuffle); the wedge-check runs vectorized on the driver
    because the click node set is catalog-dimension-bounded (the same
    boundedness argument as click_pagerank).  At web-scale node sets
    the identical wedge check rides two shuffles instead (Suri &
    Vassilvitskii 2011): orient each edge low-degree -> high-degree
    (out-degree then O(sqrt(m))), a node-keyed adjacency shuffle emits
    wedges, and an edge-keyed hash join closes them.

    Counting rule: simple undirected graph (direction, weights and
    self-loops dropped); each triangle {x<y<z} found once at its
    minimum node and credited to all three corners.  Returns (node,
    n_tri) for nodes in >= 1 triangle, node-ascending."""
    import pandas as pd

    edges = click_edges(sf_dir).to_pandas()
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "n_tri": pa.array([], pa.int64())})
    if not len(edges):
        return empty
    a = np.minimum(edges["src"].to_numpy(), edges["dst"].to_numpy())
    b = np.maximum(edges["src"].to_numpy(), edges["dst"].to_numpy())
    keep = a != b
    a, b = a[keep], b[keep]
    if not len(a):
        return empty
    # normalize node ids to a dense range so edge keys cannot overflow
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[:len(a)], inv[len(a):]
    M = np.int64(len(nodes))
    ukey = np.unique(ai * M + bi)          # distinct (a, b), a < b
    ua, ub = ukey // M, ukey % M           # sorted by (a, b)
    # enumerate wedges (y, z) per minimum-node group a (y < z because
    # neighbors are b-sorted within the group)
    _, starts_idx, counts = np.unique(ua, return_index=True,
                                      return_counts=True)
    ends = starts_idx + counts
    pos = np.arange(len(ua), dtype=np.int64)
    after = ends[np.searchsorted(starts_idx, pos, side="right") - 1] \
        - pos - 1
    total = int(after.sum())
    if total == 0:
        return empty
    i_idx = np.repeat(pos, after)
    off = np.concatenate([[0], np.cumsum(after)[:-1]])
    j_idx = i_idx + (np.arange(total, dtype=np.int64)
                     - np.repeat(off, after)) + 1
    wkey = ub[i_idx] * M + ub[j_idx]
    loc = np.searchsorted(ukey, wkey)
    loc_c = np.minimum(loc, len(ukey) - 1)
    hit = ukey[loc_c] == wkey
    x, y, z = ua[i_idx][hit], ub[i_idx][hit], ub[j_idx][hit]
    per = np.bincount(np.concatenate([x, y, z]), minlength=len(nodes))
    nz = np.flatnonzero(per)
    return pa.table({
        "node": pa.array(nodes[nz], pa.int64()),
        "n_tri": pa.array(per[nz].astype(np.int64), pa.int64()),
    })


def related_items(sf_dir: str, min_co: int = 2) -> pa.Table:
    """Item-item co-visitation similarity — the classic "people also
    viewed" collaborative-filtering op: for every item pair some user
    both clicked, ``co`` = users in common and ``jaccard_e6`` =
    floor(1e6 · |A∩B| / |A∪B|) over the items' user sets (integer, so
    both sides of the mirror agree bit-for-bit).  Distributed: ONE
    user-keyed bucket shuffle emits per-user distinct-item pairs
    (complete user streams per bucket), a pair-keyed bucketed sum
    merges co-counts, and the catalog-bounded per-item user counts
    join at the driver.  Per-user pair emission is quadratic in the
    user's DISTINCT item count — bounded here (catalog-sized); a
    web-scale deployment caps or samples degenerate power users and
    reports the drop, as the near-dup ops do with hot buckets.

    Returns (a, b, co, jaccard_e6), a < b, co >= ``min_co``,
    (a, b)-ascending."""
    import pandas as pd
    import ray.data

    from search_engine_ray.ops.shuffle import bucketed_sum, grouped_apply

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "props"])
    # materialize the parsed rows once: two downstream pipelines (pair
    # counts + per-item user counts) would otherwise each re-run the
    # scan AND the per-event JSON parse; the parsed table is narrow
    # (4 fixed-width-ish columns) and object-store-resident
    rows = ds.map_batches(_parse_k_batch,
                          batch_format="pyarrow").materialize()

    def user_pairs(g: pd.DataFrame) -> pd.DataFrame:
        items = np.unique(g["k"].to_numpy())
        n = len(items)
        if n < 2:
            return pd.DataFrame({"a": np.zeros(0, np.int64),
                                 "b": np.zeros(0, np.int64),
                                 "co": np.zeros(0, np.int64)})
        iu = np.triu_indices(n, k=1)
        return pd.DataFrame({"a": items[iu[0]], "b": items[iu[1]],
                             "co": np.ones(len(iu[0]), np.int64)})

    pair_partials = grouped_apply(rows, ["user_id"], user_pairs)
    co = bucketed_sum(pair_partials, ["a", "b"], ["co"]).to_pandas()
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "co": pa.array([], pa.int64()),
                      "jaccard_e6": pa.array([], pa.int64())})
    if not len(co):
        return empty
    co = co[co["co"] >= min_co]
    if not len(co):
        return empty

    def user_items(g: pd.DataFrame) -> pd.DataFrame:
        items = np.unique(g["k"].to_numpy())
        return pd.DataFrame({"k": items,
                             "n": np.ones(len(items), np.int64)})

    ic = bucketed_sum(grouped_apply(rows, ["user_id"], user_items),
                      ["k"], ["n"]).to_pandas()
    nmap = dict(zip(ic["k"], ic["n"]))
    a = co["a"].to_numpy()
    b = co["b"].to_numpy()
    c = co["co"].to_numpy()
    na = np.array([nmap[x] for x in a], np.int64)
    nb = np.array([nmap[x] for x in b], np.int64)
    jac = (1_000_000 * c) // (na + nb - c)
    order = np.lexsort((b, a))
    return pa.table({
        "a": pa.array(a[order], pa.int64()),
        "b": pa.array(b[order], pa.int64()),
        "co": pa.array(c[order], pa.int64()),
        "jaccard_e6": pa.array(jac[order], pa.int64()),
    })
