"""Relational pipelines over the TPC-H-ish tables — the engine's
general data-processing surface beyond text/search (scan-filter-agg,
broadcast dimension joins, big-big hash joins).

Join strategy by side size, the way a 100-TB plan must pick it:
- tiny dimensions (nation/region, a filtered customer segment) are
  BROADCAST: ``ray.put`` once, dict/set lookup inside ``map_batches`` —
  no shuffle;
- fact-fact joins (lineitem x orders) use ``Dataset.join`` — Ray Data's
  hash-shuffle join — with ``num_partitions`` sized to the cluster;
- every aggregate pre-combines per batch before the small groupby.

Money columns are per-ROW scaled to integers (cents / 1e-4) BEFORE any
sum, so aggregation is exact integer math on both the Ray and the SQL
side — no float-association drift in the value hash.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_US = 1_000_000


def _ts_us(date: str) -> int:
    """Epoch microseconds of a YYYY-MM-DD date (UTC)."""
    import datetime as dt

    d = dt.datetime.fromisoformat(date).replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp()) * _US


from search_engine_ray.ops.rounding import (  # noqa: E402
    e2_halfaway as _e2_halfaway,
    e4_halfaway as _e4_halfaway,
)


def _join_partitions() -> int:
    """``Dataset.join`` shuffle width, sized with the cluster (cpus/2).
    Hash-shuffle joins reserve aggregator actors per partition; a fixed
    width larger than the session can host DEADLOCKS the pipeline when
    two joins run concurrently (measured: two 16-partition joins hang a
    4-CPU session forever, two 8-partition joins run fine).  cpus/2
    keeps one pipeline's worth of aggregators schedulable beside the map
    stages at any cluster size."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 32)) \
            if ray.is_initialized() else 32
    except Exception:
        cpus = 32
    return max(2, cpus // 2)


def pricing_summary(sf_dir: str, cutoff: str = "1998-09-02"):
    """TPC-H Q1 shape: scan-filter lineitem, per-batch partial combine,
    tiny groupby on (l_returnflag, l_linestatus).

    Sums are exact: quantities are integral, prices scaled per row
    (cents; disc_price rounded half-away at 1e-4) before integer sums.
    """
    import ray.data
    from ray.data.aggregate import Sum

    cut = _ts_us(cutoff)

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = ts <= cut
        qty = batch.column("l_quantity").to_numpy()[keep]
        px = batch.column("l_extendedprice").to_numpy()[keep]
        disc = batch.column("l_discount").to_numpy()[keep]
        import pandas as pd

        df = pd.DataFrame({
            "l_returnflag":
                np.asarray(batch.column("l_returnflag").to_pylist(),
                           dtype=object)[keep],
            "l_linestatus":
                np.asarray(batch.column("l_linestatus").to_pylist(),
                           dtype=object)[keep],
            "qty": qty.astype(np.int64),
            "base_e4": _e4_halfaway(px),
            "disc_e4": _e4_halfaway(px * (1.0 - disc)),
            "one": np.ones(int(keep.sum()), dtype=np.int64),
        })
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            qty=("qty", "sum"), base_e4=("base_e4", "sum"),
            disc_e4=("disc_e4", "sum"), one=("one", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_returnflag", "l_linestatus",
                 "l_quantity", "l_extendedprice", "l_discount"])
    return (ds.map_batches(partials, batch_format="pyarrow")
              .groupby(["l_returnflag", "l_linestatus"])
              .aggregate(Sum("qty", alias_name="sum_qty"),
                         Sum("base_e4", alias_name="sum_base_e4"),
                         Sum("disc_e4", alias_name="sum_disc_e4"),
                         Sum("one", alias_name="n")))


def top_orders_by_revenue(sf_dir: str, segment: str = "BUILDING",
                          date: str = "1997-01-01", k: int = 10):
    """TPC-H Q3 shape: the segment's customers are BROADCAST into an
    orders filter (small side, no shuffle); the surviving orders hash-
    join lineitem with ``Dataset.join`` (big-big); revenue aggregates
    per order and the driver takes the k-row top (ties broken by
    orderkey so the limit is deterministic)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    cut = _ts_us(date)
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"])

    def custkeys(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch.column("c_mktsegment"), segment)
        return batch.filter(m).select(["c_custkey"])

    keys = np.sort(cust.map_batches(custkeys, batch_format="pyarrow")
                       .to_pandas()["c_custkey"].to_numpy())
    keys_ref = ray.put(keys)

    def ofilter(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        ts = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        ck = batch.column("o_custkey").to_numpy()
        keep = (ts < cut) & np.isin(ck, ks)
        return pa.table({"o_orderkey":
                         pa.array(batch.column("o_orderkey")
                                  .to_numpy()[keep], pa.int64())})

    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(ofilter, batch_format="pyarrow"))

    def lpart(batch: pa.Table) -> pa.Table:
        ts = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = ts > cut
        px = batch.column("l_extendedprice").to_numpy()[keep]
        disc = batch.column("l_discount").to_numpy()[keep]
        return pa.table({
            "l_orderkey": pa.array(batch.column("l_orderkey")
                                   .to_numpy()[keep], pa.int64()),
            "rev_e4": pa.array(_e4_halfaway(px * (1.0 - disc)),
                               pa.int64())})

    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])
        .map_batches(lpart, batch_format="pyarrow"))

    from search_engine_ray.ops.shuffle import bucketed_sum

    joined = li.join(orders, "inner", num_partitions=_join_partitions(),
                     on=("l_orderkey",), right_on=("o_orderkey",))
    agg = bucketed_sum(joined.select_columns(["l_orderkey", "rev_e4"]),
                       ["l_orderkey"], ["rev_e4"],
                       rename={"rev_e4": "revenue_e4"})
    top = agg.sort(["revenue_e4", "l_orderkey"],
                   descending=[True, False]).limit(k)
    return top


def nation_revenue(sf_dir: str):
    """Revenue per nation: the nation dimension (tiny) is broadcast as a
    custkey-side lookup via a customer hash join; orders x customer is
    ``Dataset.join`` (fact x dimension at shuffle scale); total prices
    are cents-scaled per row before the integer sum."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    nat = {r["n_nationkey"]: r["n_name"]
           for r in ray.data.read_parquet(
               os.path.join(sf_dir, "nation.parquet"),
               columns=["n_nationkey", "n_name"]).take_all()}
    # dense array indexed by nationkey (keys are 0..24): the per-batch
    # name attach is then one fancy-index, not a per-row dict lookup
    names_arr = np.empty(max(nat) + 1, dtype=object)
    for k_, v in nat.items():
        names_arr[k_] = v
    nat_ref = ray.put(names_arr)

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])

    def oprep(batch: pa.Table) -> pa.Table:
        tp = batch.column("o_totalprice").to_numpy()
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "price_e4": pa.array(_e4_halfaway(tp), pa.int64())})

    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"])
        .map_batches(oprep, batch_format="pyarrow"))

    joined = orders.join(cust, "inner", num_partitions=_join_partitions(),
                         on=("o_custkey",), right_on=("c_custkey",))

    def to_nation(batch: pa.Table) -> pa.Table:
        lookup = ray.get(nat_ref)
        nk = batch.column("c_nationkey").to_numpy().astype(np.int64)
        return pa.table({
            "n_name": pa.array(lookup[nk], pa.string()),
            "price_e4": batch.column("price_e4"),
            "one": pa.array(np.ones(len(nk), dtype=np.int64)),
        })

    return (joined.map_batches(to_nation, batch_format="pyarrow")
                  .groupby("n_name")
                  .aggregate(Sum("price_e4", alias_name="revenue_e4"),
                             Sum("one", alias_name="n_orders")))


def inactive_customers(sf_dir: str, since: str = "2001-01-01"):
    """ANTI-JOIN (TPC-H Q22 shape): customers with NO order on/after
    ``since``.  Expressed as the general big-big anti-join: both sides
    tagged and unioned, one hash shuffle on the key, groups with no
    probe row emit their build row.  (A filtered-side broadcast would
    also work when the probe side is small — the temporal-join modules
    show that variant.)"""
    import ray.data

    cut = _ts_us(since)

    def cprep(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch.column("c_custkey"),
            "c_mktsegment": batch.column("c_mktsegment"),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
        })

    def oprep(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        keep = ts >= cut
        ck = batch.column("o_custkey").to_numpy()[keep]
        return pa.table({
            "key": pa.array(ck, pa.int64()),
            "c_mktsegment": pa.array([""] * len(ck), pa.string()),
            "side": pa.array(np.ones(len(ck), dtype=np.int8)),
        })

    cust = (ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"])
        .map_batches(cprep, batch_format="pyarrow"))
    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"])
        .map_batches(oprep, batch_format="pyarrow"))

    def anti_bucket(g):
        import pandas as pd

        probe = set(g.loc[g["side"] == 1, "key"].to_numpy(np.int64))
        left = g[g["side"] == 0]
        m = ~left["key"].isin(probe)
        return pd.DataFrame({
            "c_custkey": left.loc[m, "key"].to_numpy(np.int64),
            "c_mktsegment": left.loc[m, "c_mktsegment"].to_numpy()})

    from search_engine_ray.ops.shuffle import bucketed_apply

    return bucketed_apply(cust.union(orders), ["key"], anti_bucket)


def returned_item_customers(sf_dir: str, qstart: str = "1997-01-01",
                            qend: str = "1997-04-01", k: int = 20):
    """TPC-H Q10 shape: revenue lost to returned items, per customer,
    for one quarter.  The two FACT sides (quarter-filtered orders,
    R-flag lineitem) meet in a ``Dataset.join`` hash shuffle; the
    per-customer aggregate that follows is tiny, so the k winners'
    attributes (name, nation) are attached by BROADCAST lookups against
    column-pruned dimension reads — no second shuffle.  Ties broken by
    c_custkey so the limit is deterministic."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    lo, hi = _ts_us(qstart), _ts_us(qend)

    def ofilter(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        keep = (ts >= lo) & (ts < hi)
        return pa.table({
            "o_orderkey": pa.array(batch.column("o_orderkey")
                                   .to_numpy()[keep], pa.int64()),
            "o_custkey": pa.array(batch.column("o_custkey")
                                  .to_numpy()[keep], pa.int64())})

    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(ofilter, batch_format="pyarrow"))

    def lpart(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("l_returnflag"), "R").to_numpy(
            zero_copy_only=False)
        px = batch.column("l_extendedprice").to_numpy()[keep]
        disc = batch.column("l_discount").to_numpy()[keep]
        return pa.table({
            "l_orderkey": pa.array(batch.column("l_orderkey")
                                   .to_numpy()[keep], pa.int64()),
            "rev_e4": pa.array(_e4_halfaway(px * (1.0 - disc)),
                               pa.int64())})

    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"])
        .map_batches(lpart, batch_format="pyarrow"))

    joined = li.join(orders, "inner", num_partitions=_join_partitions(),
                     on=("l_orderkey",), right_on=("o_orderkey",))
    agg = (joined.groupby("o_custkey")
                 .aggregate(Sum("rev_e4", alias_name="revenue_e4")))
    top = (agg.sort(["revenue_e4", "o_custkey"],
                    descending=[True, False]).limit(k).to_pandas())

    # winners are k rows: broadcast-style attribute attach on the driver
    import pandas as pd
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    want = set(top["o_custkey"].tolist())
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"],
        filters=pads.field("c_custkey").isin(list(want))).to_pandas()
    nat = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"]).to_pandas()
    out = (top.rename(columns={"o_custkey": "c_custkey"})
              .merge(cust, on="c_custkey")
              .merge(nat, left_on="c_nationkey", right_on="n_nationkey"))
    out = out[["c_custkey", "c_name", "n_name", "revenue_e4"]]
    return out.sort_values(["revenue_e4", "c_custkey"],
                           ascending=[False, True]).reset_index(drop=True)


def promo_revenue_share(sf_dir: str, month: str = "1996-03-01",
                        month_end: str = "1996-04-01"):
    """TPC-H Q14 shape: share of a month's revenue from PROMO parts.
    The promo flag is a SEMI-JOIN against a filtered dimension: the
    promo partkeys ship once as a sorted int64 array (``ray.put``) and
    each lineitem batch flags membership with one vectorized
    ``np.isin`` — no shuffle at all; the whole query is one streaming
    pass.  Returned as exact e4 integers (numerator, denominator)
    instead of the division, so the check is exact."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    lo, hi = _ts_us(month), _ts_us(month_end)

    def promo_keys(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch.column("p_type"), "PROMO")
        return batch.filter(m).select(["p_partkey"])

    keys = np.sort(ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_type"])
        .map_batches(promo_keys, batch_format="pyarrow")
        .to_pandas()["p_partkey"].to_numpy())
    keys_ref = ray.put(keys)

    def partials(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        ts = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = (ts >= lo) & (ts < hi)
        pk = batch.column("l_partkey").to_numpy()[keep]
        px = batch.column("l_extendedprice").to_numpy()[keep]
        disc = batch.column("l_discount").to_numpy()[keep]
        rev = _e4_halfaway(px * (1.0 - disc))
        promo = np.isin(pk, ks)
        return pa.table({
            "k": pa.array(np.zeros(1, dtype=np.int64)),
            "promo_e4": pa.array([int(rev[promo].sum())], pa.int64()),
            "total_e4": pa.array([int(rev.sum())], pa.int64())})

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])
    agg = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("k")
             .aggregate(Sum("promo_e4", alias_name="promo_revenue_e4"),
                        Sum("total_e4", alias_name="total_revenue_e4")))
    return agg.drop_columns(["k"])


def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          ystart: str = "1996-01-01",
                          yend: str = "1997-01-01"):
    """TPC-H Q5 shape: revenue per nation where the customer and the
    supplier share the nation, suppliers in one region, one order year.
    Plan: the two FACT joins (orders x customer, then x lineitem) are
    hash-shuffle ``Dataset.join``s on the reused order/customer keys;
    supplier and nation/region are BROADCAST lookups (suppkey ->
    nationkey dict, nationkey -> (name, regionkey)); the final groupby
    is five rows."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    lo, hi = _ts_us(ystart), _ts_us(yend)

    nat = {}
    for r in ray.data.read_parquet(
            os.path.join(sf_dir, "nation.parquet")).take_all():
        nat[int(r["n_nationkey"])] = (r["n_name"], int(r["n_regionkey"]))
    regions = {int(r["r_regionkey"]): r["r_name"]
               for r in ray.data.read_parquet(
                   os.path.join(sf_dir, "region.parquet")).take_all()}
    rkeys = {k for k, v in regions.items() if v == region}
    srows = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    order = np.argsort(srows["s_suppkey"].to_numpy())
    sup_keys = srows["s_suppkey"].to_numpy()[order]
    sup_nats = srows["s_nationkey"].to_numpy().astype(np.int64)[order]
    # nation names indexed by nationkey; -1 marks out-of-region
    max_nk = max(nat) if nat else 0
    nat_names = np.array([nat.get(i, ("", -1))[0]
                          for i in range(max_nk + 1)], dtype=object)
    in_region = np.array([nat.get(i, ("", -1))[1] in rkeys
                          for i in range(max_nk + 1)], dtype=bool)
    bc = ray.put((sup_keys, sup_nats, nat_names, in_region))

    def ofilter(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        keep = (ts >= lo) & (ts < hi)
        return pa.table({
            "o_orderkey": pa.array(batch.column("o_orderkey")
                                   .to_numpy()[keep], pa.int64()),
            "o_custkey": pa.array(batch.column("o_custkey")
                                  .to_numpy()[keep], pa.int64())})

    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(ofilter, batch_format="pyarrow"))
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])
    ord_nat = orders.join(cust, "inner", num_partitions=_join_partitions(),
                          on=("o_custkey",), right_on=("c_custkey",))

    def lprep(batch: pa.Table) -> pa.Table:
        px = batch.column("l_extendedprice").to_numpy()
        disc = batch.column("l_discount").to_numpy()
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "l_suppkey": batch.column("l_suppkey"),
            "rev_e4": pa.array(_e4_halfaway(px * (1.0 - disc)),
                               pa.int64())})

    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])
        .map_batches(lprep, batch_format="pyarrow"))
    joined = li.join(ord_nat, "inner", num_partitions=_join_partitions(),
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def localize(batch: pa.Table) -> pa.Table:
        sup_keys, sup_nats, nat_names, in_region = ray.get(bc)
        sk = batch.column("l_suppkey").to_numpy()
        cn = batch.column("c_nationkey").to_numpy().astype(np.int64)
        rev = batch.column("rev_e4").to_numpy()
        pos = np.searchsorted(sup_keys, sk).clip(0, len(sup_keys) - 1)
        found = sup_keys[pos] == sk
        snat = np.where(found, sup_nats[pos], -1)
        keep = found & (snat == cn) & in_region[snat.clip(0)]
        return pa.table({
            "n_name": pa.array(nat_names[snat[keep]].tolist(),
                               pa.string()),
            "rev_e4": pa.array(rev[keep], pa.int64())})

    return (joined.map_batches(localize, batch_format="pyarrow")
                  .groupby("n_name")
                  .aggregate(Sum("rev_e4", alias_name="revenue_e4")))


def customer_order_counts(sf_dir: str):
    """LEFT OUTER aggregate join: every customer with their order count,
    zero included.  The probe side is PRE-COMBINED per batch (custkey ->
    partial count) before the tagged union, so the single hash shuffle
    moves one row per (batch, customer) instead of one per order — the
    skew-safe left-join-then-aggregate plan."""
    import ray.data

    def cprep(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch.column("c_custkey"),
            "n": pa.array(np.zeros(n, dtype=np.int64)),
            "side": pa.array(np.zeros(n, dtype=np.int8))})

    def oprep(batch: pa.Table) -> pa.Table:
        k, c = np.unique(batch.column("o_custkey").to_numpy(),
                         return_counts=True)
        return pa.table({
            "key": pa.array(k, pa.int64()),
            "n": pa.array(c.astype(np.int64), pa.int64()),
            "side": pa.array(np.ones(len(k), dtype=np.int8))})

    cust = (ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"])
        .map_batches(cprep, batch_format="pyarrow"))
    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"])
        .map_batches(oprep, batch_format="pyarrow"))

    def left_count_bucket(g):
        import pandas as pd

        left = g.loc[g["side"] == 0, ["key"]].drop_duplicates()
        counts = (g.loc[g["side"] == 1]
                   .groupby("key", sort=False)["n"].sum()
                   .rename("n_orders").reset_index())
        m = left.merge(counts, on="key", how="left")
        return pd.DataFrame({
            "c_custkey": m["key"].to_numpy(np.int64),
            "n_orders": m["n_orders"].fillna(0).astype(np.int64)
                         .to_numpy()})

    from search_engine_ray.ops.shuffle import bucketed_apply

    return bucketed_apply(cust.union(orders), ["key"],
                          left_count_bucket)


def late_order_priority_counts(sf_dir: str, grace_days: int = 60):
    """TPC-H Q4 shape: per order priority, how many orders have at least
    one lineitem shipped more than ``grace_days`` after the order date
    (an EXISTS semi-join between two fact tables).

    Plan: the lineitem side is PRE-COMBINED per batch to one row per
    orderkey (its max ship date) before the tagged-union hash shuffle on
    orderkey, so shuffle volume is bounded by distinct orders per batch,
    not lineitems; the per-key group then applies the EXISTS predicate
    and emits the (tiny) priority row that a final count aggregates."""
    import ray.data
    from ray.data.aggregate import Sum

    grace_us = grace_days * 86_400 * _US

    def oprep(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch.column("o_orderkey"),
            "ts_us": batch.column("o_orderdate").cast(pa.int64()),
            "prio": batch.column("o_orderpriority"),
            "side": pa.array(np.zeros(n, dtype=np.int8))})

    def lprep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # ok[starts] IndexErrors on empty blocks
            return pa.table({
                "key": pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "prio": pa.array([], pa.string()),
                "side": pa.array([], pa.int8())})
        ok = batch.column("l_orderkey").to_numpy()
        ts = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        order = np.lexsort((ts, ok))
        ok, ts = ok[order], ts[order]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        ends = np.append(starts[1:], len(ok))
        return pa.table({
            "key": pa.array(ok[starts], pa.int64()),
            "ts_us": pa.array(ts[ends - 1], pa.int64()),  # max per order
            "prio": pa.array([""] * len(starts), pa.string()),
            "side": pa.array(np.ones(len(starts), dtype=np.int8))})

    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
        .map_batches(oprep, batch_format="pyarrow"))
    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"])
        .map_batches(lprep, batch_format="pyarrow"))

    def per_bucket(g):
        import pandas as pd

        o = g[g["side"] == 0]
        ships = (g.loc[g["side"] == 1]
                  .groupby("key", sort=False)["ts_us"].max()
                  .rename("max_ship").reset_index())
        m = o.merge(ships, on="key", how="left")
        late = m["max_ship"].notna() & (m["max_ship"]
                                        > m["ts_us"] + grace_us)
        out = (m.loc[late, ["prio"]]
                .rename(columns={"prio": "o_orderpriority"}))
        out["one"] = np.int64(1)
        return out

    from search_engine_ray.ops.shuffle import bucketed_apply

    return (bucketed_apply(orders.union(li), ["key"], per_bucket)
            .groupby("o_orderpriority")
            .aggregate(Sum("one", alias_name="n_late")))


def large_orders(sf_dir: str, min_qty: int = 120, k: int = 100):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    ``min_qty``, with customer name and order facts, top-``k`` by
    (totalprice desc, orderkey).

    Plan: lineitem pre-aggregates quantity per orderkey inside each
    batch, then ONE groupby(orderkey) finishes the sums; the HAVING
    filter leaves a tiny key set, so the order/customer attributes are
    attached by BROADCAST lookups instead of two more shuffles —
    fact-side heavy lifting first, dimension attach last."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def lprep(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy()
        qty = batch.column("l_quantity").to_numpy().astype(np.int64)
        keys, inv = np.unique(ok, return_inverse=True)
        sums = np.zeros(len(keys), dtype=np.int64)
        np.add.at(sums, inv, qty)
        return pa.table({"l_orderkey": pa.array(keys, pa.int64()),
                         "q": pa.array(sums, pa.int64())})

    from search_engine_ray.ops.shuffle import bucketed_sum

    qty = bucketed_sum(
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_quantity"])
        .map_batches(lprep, batch_format="pyarrow"),
        ["l_orderkey"], ["q"], rename={"q": "sum_qty"})
    big = qty.filter(expr=f"sum_qty > {int(min_qty)}")
    # the HAVING survivors — tiny by construction (the knob is chosen so
    # this is O(k) rows; at 100 TB the same plan holds because the
    # driver only ever sees keys past the threshold)
    big_t = big.to_pandas()
    # broadcast as SORTED parallel arrays: membership + value lookup are
    # then one searchsorted per batch (per-row `in dict` loops are
    # orders-of-magnitude slower on wide scans)
    order = np.argsort(big_t["l_orderkey"].to_numpy())
    want_keys = big_t["l_orderkey"].to_numpy().astype(np.int64)[order]
    want_vals = big_t["sum_qty"].to_numpy().astype(np.int64)[order]
    want_ref = ray.put((want_keys, want_vals))

    def oattach(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(want_ref)
        ok = batch.column("o_orderkey").to_numpy().astype(np.int64)
        if len(keys):
            pos = np.searchsorted(keys, ok).clip(0, len(keys) - 1)
            keep = keys[pos] == ok
        else:
            keep = np.zeros(len(ok), dtype=bool)
        if not np.any(keep):
            return pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "o_custkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "totalprice_e4": pa.array([], pa.int64()),
                "sum_qty": pa.array([], pa.int64())})
        sub = batch.filter(pa.array(keep))
        okk = sub.column("o_orderkey").to_numpy().astype(np.int64)
        return pa.table({
            "o_orderkey": sub.column("o_orderkey"),
            "o_custkey": sub.column("o_custkey"),
            "o_orderdate": sub.column("o_orderdate"),
            "totalprice_e4": pa.array(
                _e4_halfaway(sub.column("o_totalprice").to_numpy()),
                pa.int64()),
            "sum_qty": pa.array(
                vals[np.searchsorted(keys, okk)], pa.int64())})

    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
        .map_batches(oattach, batch_format="pyarrow"))
    hits = orders.to_pandas()  # O(k) rows

    want_ck = ray.put(np.unique(hits["o_custkey"].to_numpy()
                                .astype(np.int64)))

    def cfilter(batch: pa.Table) -> pa.Table:
        ks = ray.get(want_ck)
        ck = batch.column("c_custkey").to_numpy().astype(np.int64)
        return batch.filter(pa.array(np.isin(ck, ks)))

    names_df = (ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"])
        .map_batches(cfilter, batch_format="pyarrow").to_pandas())
    names = dict(zip(names_df["c_custkey"].astype("int64"),
                     names_df["c_name"]))
    hits["c_name"] = [names[int(x)] for x in hits["o_custkey"]]
    hits = hits.sort_values(["totalprice_e4", "o_orderkey"],
                            ascending=[False, True]).head(k)
    cols = ["c_name", "o_custkey", "o_orderkey", "o_orderdate",
            "totalprice_e4", "sum_qty"]
    return pa.Table.from_pandas(hits[cols], preserve_index=False)


def priority_shipstatus_counts(sf_dir: str):
    """TPC-H Q12 shape: per lineitem linestatus, how many lineitems
    belong to high-priority (1-URGENT / 2-HIGH) vs lower-priority
    orders.  The order side reduces to (orderkey, is_high int8) and
    joins lineitem with ``Dataset.join`` (big-big hash shuffle); the
    CASE aggregation pre-combines per batch after the join."""
    import ray.data
    from ray.data.aggregate import Sum

    def oprep(batch: pa.Table) -> pa.Table:
        prio = batch.column("o_orderpriority").to_pylist()
        hi = np.array([p in ("1-URGENT", "2-HIGH") for p in prio],
                      dtype=np.int64)
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "is_high": pa.array(hi, pa.int64())})

    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"])
        .map_batches(oprep, batch_format="pyarrow"))
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linestatus"])
    joined = li.join(orders, "inner", num_partitions=_join_partitions(),
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def combine(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "l_linestatus": batch.column("l_linestatus").to_pylist(),
            "high_count": batch.column("is_high").to_numpy(),
        })
        df["low_count"] = 1 - df["high_count"]
        g = (df.groupby("l_linestatus", sort=False)
               .agg(high_count=("high_count", "sum"),
                    low_count=("low_count", "sum")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    return (joined.map_batches(combine, batch_format="pyarrow")
            .groupby("l_linestatus")
            .aggregate(Sum("high_count", alias_name="high_count"),
                       Sum("low_count", alias_name="low_count")))


def nation_pair_volume(sf_dir: str, dstart: str = "1995-01-01",
                       dend: str = "1997-01-01"):
    """TPC-H Q7 shape: shipped revenue per (supplier nation, customer
    nation, ship year) over a two-year window — the engine's two-hop
    fact-fact join chain: lineitem JOIN orders (hash shuffle) JOIN
    customer (hash shuffle), supplier nationkey attached from a dense
    int8 BROADCAST array (suppkey -> nationkey is ~1 byte/supplier, MBs
    even at SF-1000), nation names from the 25-row dimension.  Revenue
    is per-row e4-scaled before the integer sum.  Unlike canonical Q7
    no nation pair is filtered out: the output is the full
    (supp_nation, cust_nation, year) matrix, which keeps the reduce
    small (25 x 25 x years rows) while both joins run at fact scale."""
    import ray
    import ray.data

    lo, hi = _ts_us(dstart), _ts_us(dend)

    sup = (ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas())
    snk = np.zeros(int(sup["s_suppkey"].max()) + 1, dtype=np.int8)
    snk[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
    snk_ref = ray.put(snk)

    nat = {r["n_nationkey"]: r["n_name"]
           for r in ray.data.read_parquet(
               os.path.join(sf_dir, "nation.parquet"),
               columns=["n_nationkey", "n_name"]).take_all()}
    names_arr = np.empty(max(nat) + 1, dtype=object)
    for k_, v in nat.items():
        names_arr[k_] = v
    nat_ref = ray.put(names_arr)

    def lprep(batch: pa.Table) -> pa.Table:
        ts = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = (ts >= lo) & (ts < hi)
        sub = batch.filter(pa.array(keep))
        sn = ray.get(snk_ref)
        sk = sub.column("l_suppkey").to_numpy().astype(np.int64)
        px = sub.column("l_extendedprice").to_numpy()
        disc = sub.column("l_discount").to_numpy()
        yrs = pc.year(sub.column("l_shipdate")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "l_orderkey": sub.column("l_orderkey"),
            "supp_nk": pa.array(sn[sk].astype(np.int64), pa.int64()),
            "l_year": pa.array(yrs, pa.int64()),
            "rev_e4": pa.array(_e4_halfaway(px * (1.0 - disc)),
                               pa.int64())})

    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"])
        .map_batches(lprep, batch_format="pyarrow"))

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"])
    j1 = li.join(orders, "inner", num_partitions=_join_partitions(),
                 on=("l_orderkey",), right_on=("o_orderkey",))

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])
    j2 = j1.join(cust, "inner", num_partitions=_join_partitions(),
                 on=("o_custkey",), right_on=("c_custkey",))

    def combine(batch: pa.Table) -> pa.Table:
        import pandas as pd

        names = ray.get(nat_ref)
        snn = batch.column("supp_nk").to_numpy().astype(np.int64)
        cnn = batch.column("c_nationkey").to_numpy().astype(np.int64)
        df = pd.DataFrame({
            "supp_nation": names[snn],
            "cust_nation": names[cnn],
            "l_year": batch.column("l_year").to_numpy(),
            "revenue_e4": batch.column("rev_e4").to_numpy()})
        g = (df.groupby(["supp_nation", "cust_nation", "l_year"],
                        sort=False)["revenue_e4"].sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    # per-batch pre-combine shrinks the shuffle to <= 25*25*years rows
    # per batch; the final groupby is tiny.  Single composite string key
    # would also work, but 3 keys over ~1900 distinct rows is cheap.
    return (j2.map_batches(combine, batch_format="pyarrow")
            .groupby(["supp_nation", "cust_nation", "l_year"])
            .aggregate(Sum("revenue_e4", alias_name="revenue_e4")))


def revenue_delta(sf_dir: str, dstart: str = "1996-01-01",
                  dend: str = "1997-01-01", disc_lo: int = 5,
                  disc_hi: int = 7, max_qty: int = 24):
    """TPC-H Q6 shape: forecast revenue change — one streaming
    filter-aggregate over lineitem, no join and no shuffle beyond the
    single-row partial combine.  The discount window compares e2-scaled
    integers (floats like 0.05 are rounded per row on BOTH sides), and
    the revenue term px*disc is e4-scaled per row, so the global sum is
    exact integer math regardless of reduce order."""
    import ray.data
    from ray.data.aggregate import Sum

    lo, hi = _ts_us(dstart), _ts_us(dend)

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        disc = batch.column("l_discount").to_numpy()
        disc_e2 = _e2_halfaway(disc)
        qty = batch.column("l_quantity").to_numpy()
        keep = ((ts >= lo) & (ts < hi)
                & (disc_e2 >= disc_lo) & (disc_e2 <= disc_hi)
                & (qty < max_qty))
        px = batch.column("l_extendedprice").to_numpy()[keep]
        rev = _e4_halfaway(px * disc[keep])
        return pa.table({
            "k": pa.array(np.zeros(1, dtype=np.int64)),
            "rev_e4": pa.array([int(rev.sum())], pa.int64()),
            "one": pa.array([int(keep.sum())], pa.int64())})

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"])
    agg = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("k")
             .aggregate(Sum("rev_e4", alias_name="revenue_e4"),
                        Sum("one", alias_name="n")))
    return agg.drop_columns(["k"])


def top_supplier(sf_dir: str, dstart: str = "1996-01-01",
                 dend: str = "1996-04-01"):
    """TPC-H Q15 shape: the quarter's maximum-revenue supplier(s).
    Per-supplier revenue is a bucketed integer sum (pre-combined per
    batch, so shuffle rows are bounded by distinct suppliers per batch);
    the global max is the only scalar that ever reaches the driver, and
    the winners (ties included) are O(1) rows whose names attach via a
    pruned supplier read — no supplier-table broadcast, no sort."""
    import ray
    import ray.data

    lo, hi = _ts_us(dstart), _ts_us(dend)

    def lprep(batch: pa.Table) -> pa.Table:
        ts = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        keep = (ts >= lo) & (ts < hi)
        sk = batch.column("l_suppkey").to_numpy()[keep]
        px = batch.column("l_extendedprice").to_numpy()[keep]
        disc = batch.column("l_discount").to_numpy()[keep]
        rev = _e4_halfaway(px * (1.0 - disc))
        keys, inv = np.unique(sk, return_inverse=True)
        sums = np.zeros(len(keys), dtype=np.int64)
        np.add.at(sums, inv, rev)
        return pa.table({"s_suppkey": pa.array(keys, pa.int64()),
                         "rev": pa.array(sums, pa.int64())})

    from search_engine_ray.ops.shuffle import bucketed_sum

    rev = bucketed_sum(
        ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                     "l_discount"])
        .map_batches(lprep, batch_format="pyarrow"),
        ["s_suppkey"], ["rev"], rename={"rev": "total_revenue_e4"})
    # pin the reduced per-supplier table: it is consumed twice (max +
    # filter) and without materialize() each consumption re-runs the
    # whole lineitem scan + shuffle
    rev = rev.materialize()
    mx = rev.max("total_revenue_e4")  # ONE scalar to the driver
    if mx is None:  # window matched zero lineitems
        return pa.table({
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "total_revenue_e4": pa.array([], pa.int64())})
    winners = rev.filter(
        expr=f"total_revenue_e4 == {int(mx)}").to_pandas()  # O(ties) rows

    want = np.unique(winners["s_suppkey"].to_numpy().astype(np.int64))

    def sfilter(batch: pa.Table) -> pa.Table:
        sk = batch.column("s_suppkey").to_numpy().astype(np.int64)
        return batch.filter(pa.array(np.isin(sk, want)))

    names = (ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"])
        .map_batches(sfilter, batch_format="pyarrow").to_pandas())
    out = winners.merge(names, on="s_suppkey")
    out = out.sort_values("s_suppkey").reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["s_suppkey", "s_name", "total_revenue_e4"]],
        preserve_index=False)


def small_qty_revenue(sf_dir: str, brand: str = "Brand#23",
                      min_size: int = 5):
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of their part's average order quantity, for one brand's larger
    parts.  The correlated per-part average is ONE tagged-union hash
    shuffle on partkey (filtered part keys side 0, lineitem facts side
    1): each bucket semi-joins, computes per-part (count, total qty)
    vectorized, and applies the avg predicate as exact integer math
    (5*qty*cnt < total ⇔ qty < 0.2*avg — quantities are integral), so
    lineitem is scanned ONCE and no part set is ever broadcast."""
    import ray.data
    from ray.data.aggregate import Sum

    def pprep(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(batch.column("p_brand"), brand),
                    pc.greater_equal(batch.column("p_size"), min_size))
        sub = batch.filter(m)
        n = sub.num_rows
        return pa.table({
            "key": sub.column("p_partkey").cast(pa.int64()),
            "qty": pa.array(np.zeros(n, dtype=np.int64)),
            "px_e4": pa.array(np.zeros(n, dtype=np.int64)),
            "side": pa.array(np.zeros(n, dtype=np.int8))})

    def lprep(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch.column("l_partkey").cast(pa.int64()),
            "qty": pa.array(batch.column("l_quantity").to_numpy()
                            .astype(np.int64), pa.int64()),
            "px_e4": pa.array(_e4_halfaway(
                batch.column("l_extendedprice").to_numpy()), pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8))})

    part = (ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"])
        .map_batches(pprep, batch_format="pyarrow"))
    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(lprep, batch_format="pyarrow"))

    def per_bucket(g):
        import pandas as pd

        wanted = g.loc[g["side"] == 0, "key"].to_numpy(np.int64)
        li_g = g[g["side"] == 1]
        keys = li_g["key"].to_numpy(np.int64)
        hit = np.isin(keys, wanted)
        keys = keys[hit]
        qty = li_g["qty"].to_numpy(np.int64)[hit]
        px = li_g["px_e4"].to_numpy(np.int64)[hit]
        uk, inv = np.unique(keys, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        tot = np.zeros(len(uk), dtype=np.int64)
        np.add.at(tot, inv, qty)
        small = 5 * qty * cnt[inv] < tot[inv]
        return pd.DataFrame({
            "k": np.zeros(1, dtype=np.int64),
            "px_e4": np.array([px[small].sum()], dtype=np.int64),
            "one": np.array([int(small.sum())], dtype=np.int64)})

    from search_engine_ray.ops.shuffle import bucketed_apply

    agg = (bucketed_apply(part.union(li), ["key"], per_bucket)
           .groupby("k")
           .aggregate(Sum("px_e4", alias_name="price_e4_sum"),
                      Sum("one", alias_name="n")))
    return agg.drop_columns(["k"])


def idle_rich_customers(sf_dir: str, since: str = "2000-01-01"):
    """TPC-H Q22 shape: customers with an above-average (positive)
    account balance and NO recent orders, rolled up per nation.  The
    global average is two integers (positive-balance sum + count) from
    one streaming customer pass — the threshold predicate is then exact
    integer math (bal_e2*cnt > sum_e2 ⇔ bal > avg, no float division).
    The "no orders since" test is a tagged-union ANTI-join hash shuffle
    on custkey (rich customers side 0, recent orders pre-deduped per
    batch side 1) — the big-big NOT EXISTS never materializes a key set
    on the driver."""
    import ray.data
    from ray.data.aggregate import Sum

    cut = _ts_us(since)

    def bal_partials(batch: pa.Table) -> pa.Table:
        bal_e2 = _e2_halfaway(batch.column("c_acctbal").to_numpy())
        pos = bal_e2 > 0
        return pa.table({
            "k": pa.array(np.zeros(1, dtype=np.int64)),
            "s": pa.array([int(bal_e2[pos].sum())], pa.int64()),
            "c": pa.array([int(pos.sum())], pa.int64())})

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    stats = (ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_acctbal"])
        .map_batches(bal_partials, batch_format="pyarrow")
        .groupby("k").aggregate(Sum("s", alias_name="s"),
                                Sum("c", alias_name="c"))
        .take_all())[0]
    s_e2, cnt = int(stats["s"]), int(stats["c"])

    def cprep(batch: pa.Table) -> pa.Table:
        bal = batch.column("c_acctbal").to_numpy()
        bal_e2 = _e2_halfaway(bal)
        keep = bal_e2 * cnt > s_e2
        sub = batch.filter(pa.array(keep))
        n = sub.num_rows
        return pa.table({
            "key": sub.column("c_custkey").cast(pa.int64()),
            "c_nationkey": sub.column("c_nationkey").cast(pa.int64()),
            "bal_e2": pa.array(bal_e2[keep], pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8))})

    def oprep(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        ck = batch.column("o_custkey").to_numpy()[ts >= cut]
        ck = np.unique(ck)  # per-batch pre-dedup bounds shuffle rows
        n = len(ck)
        return pa.table({
            "key": pa.array(ck.astype(np.int64), pa.int64()),
            "c_nationkey": pa.array(np.zeros(n, dtype=np.int64)),
            "bal_e2": pa.array(np.zeros(n, dtype=np.int64)),
            "side": pa.array(np.ones(n, dtype=np.int8))})

    cust = (ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=cust_cols)
        .map_batches(cprep, batch_format="pyarrow"))
    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"])
        .map_batches(oprep, batch_format="pyarrow"))

    def per_bucket(g):
        import pandas as pd

        active = g.loc[g["side"] == 1, "key"].to_numpy(np.int64)
        rich = g[g["side"] == 0]
        idle = rich[~np.isin(rich["key"].to_numpy(np.int64), active)]
        out = (idle.groupby("c_nationkey", sort=False)["bal_e2"]
               .agg(["count", "sum"]).reset_index())
        return pd.DataFrame({
            "c_nationkey": out["c_nationkey"].to_numpy(np.int64),
            "numcust": out["count"].to_numpy(np.int64),
            "tot_e2": out["sum"].to_numpy(np.int64)})

    from search_engine_ray.ops.shuffle import bucketed_apply

    return (bucketed_apply(cust.union(orders), ["key"], per_bucket)
            .groupby("c_nationkey")
            .aggregate(Sum("numcust", alias_name="numcust"),
                       Sum("tot_e2", alias_name="totacctbal_e2")))


_Q19_CLASSES = (("Brand#12", 1, 5, 1, 11),
                ("Brand#23", 1, 10, 10, 20),
                ("Brand#34", 1, 15, 20, 30))


def disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue from lineitems matching ANY of three
    (brand, size-range, quantity-range) classes — the disjunctive
    fact-dimension join predicate.  Parts carry their class id (brands
    are disjoint, so at most one) through ONE tagged-union partkey
    shuffle; each bucket maps lineitems to their part's class with a
    searchsorted gather and applies that class's quantity window, so
    the OR-of-ANDs never becomes three scans or a part broadcast."""
    import ray.data
    from ray.data.aggregate import Sum

    def pprep(batch: pa.Table) -> pa.Table:
        brand = np.asarray(batch.column("p_brand").to_pylist(),
                           dtype=object)
        size = batch.column("p_size").to_numpy()
        cls = np.full(len(brand), -1, dtype=np.int8)
        for ci, (b, slo, shi, _, _) in enumerate(_Q19_CLASSES):
            cls[(brand == b) & (size >= slo) & (size <= shi)] = ci
        keep = cls >= 0
        sub = batch.filter(pa.array(keep))
        n = sub.num_rows
        return pa.table({
            "key": sub.column("p_partkey").cast(pa.int64()),
            "cls": pa.array(cls[keep].astype(np.int64), pa.int64()),
            "qty": pa.array(np.zeros(n, dtype=np.int64)),
            "rev_e4": pa.array(np.zeros(n, dtype=np.int64)),
            "side": pa.array(np.zeros(n, dtype=np.int8))})

    def lprep(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        px = batch.column("l_extendedprice").to_numpy()
        disc = batch.column("l_discount").to_numpy()
        return pa.table({
            "key": batch.column("l_partkey").cast(pa.int64()),
            "cls": pa.array(np.full(n, -1, dtype=np.int64)),
            "qty": pa.array(batch.column("l_quantity").to_numpy()
                            .astype(np.int64), pa.int64()),
            "rev_e4": pa.array(_e4_halfaway(px * (1.0 - disc)),
                               pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8))})

    part = (ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"])
        .map_batches(pprep, batch_format="pyarrow"))
    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])
        .map_batches(lprep, batch_format="pyarrow"))

    qlo = np.array([c[3] for c in _Q19_CLASSES], dtype=np.int64)
    qhi = np.array([c[4] for c in _Q19_CLASSES], dtype=np.int64)

    def per_bucket(g):
        import pandas as pd

        p = g[g["side"] == 0]
        pk = p["key"].to_numpy(np.int64)
        pcls = p["cls"].to_numpy(np.int64)
        order = np.argsort(pk)
        pk, pcls = pk[order], pcls[order]
        li_g = g[g["side"] == 1]
        lk = li_g["key"].to_numpy(np.int64)
        if len(pk):
            pos = np.searchsorted(pk, lk).clip(0, len(pk) - 1)
            hit = pk[pos] == lk
            cls = np.where(hit, pcls[pos], 0)
        else:
            hit = np.zeros(len(lk), dtype=bool)
            cls = np.zeros(len(lk), dtype=np.int64)
        qty = li_g["qty"].to_numpy(np.int64)
        rev = li_g["rev_e4"].to_numpy(np.int64)
        ok = hit & (qty >= qlo[cls]) & (qty <= qhi[cls])
        return pd.DataFrame({
            "k": np.zeros(1, dtype=np.int64),
            "rev_e4": np.array([rev[ok].sum()], dtype=np.int64),
            "one": np.array([int(ok.sum())], dtype=np.int64)})

    from search_engine_ray.ops.shuffle import bucketed_apply

    agg = (bucketed_apply(part.union(li), ["key"], per_bucket)
           .groupby("k")
           .aggregate(Sum("rev_e4", alias_name="revenue_e4"),
                      Sum("one", alias_name="n")))
    return agg.drop_columns(["k"])


def market_share(sf_dir: str, region: str = "AMERICA",
                 supp_nation: str = "NATION_3",
                 dstart: str = "1995-01-01", dend: str = "1997-01-01"):
    """TPC-H Q8 shape: one supplier nation's share of the revenue sold
    into a region, per order year.  Same two-hop fact chain as Q7
    (lineitem JOIN orders JOIN customer), with the region's nationkeys
    and the supplier->nationkey map as tiny broadcasts; the share is
    returned as exact e4-integer (nation, total) revenue pairs per
    year — the division happens in the reader, not the shuffle."""
    import ray
    import ray.data

    lo, hi = _ts_us(dstart), _ts_us(dend)

    nat = ray.data.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = ray.data.read_parquet(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"]).to_pandas()
    rk = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    region_nk = np.sort(nat.loc[nat["n_regionkey"] == rk, "n_nationkey"]
                        .to_numpy(np.int64))
    target_nk = int(nat.loc[nat["n_name"] == supp_nation,
                            "n_nationkey"].iloc[0])

    sup = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    is_target = np.zeros(int(sup["s_suppkey"].max()) + 1, dtype=np.int8)
    is_target[sup.loc[sup["s_nationkey"] == target_nk, "s_suppkey"]
              .to_numpy()] = 1
    tgt_ref = ray.put(is_target)

    def lprep(batch: pa.Table) -> pa.Table:
        tgt = ray.get(tgt_ref)
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        px = batch.column("l_extendedprice").to_numpy()
        disc = batch.column("l_discount").to_numpy()
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "is_tgt": pa.array(tgt[sk].astype(np.int64), pa.int64()),
            "rev_e4": pa.array(_e4_halfaway(px * (1.0 - disc)),
                               pa.int64())})

    def oprep(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").cast(pa.int64()).to_numpy()
        sub = batch.filter(pa.array((ts >= lo) & (ts < hi)))
        yrs = pc.year(sub.column("o_orderdate")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "o_orderkey": sub.column("o_orderkey"),
            "o_custkey": sub.column("o_custkey"),
            "o_year": pa.array(yrs, pa.int64())})

    def cprep(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy().astype(np.int64)
        return (batch.filter(pa.array(np.isin(nk, region_nk)))
                .select(["c_custkey"]))

    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])
        .map_batches(lprep, batch_format="pyarrow"))
    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(oprep, batch_format="pyarrow"))
    cust = (ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"])
        .map_batches(cprep, batch_format="pyarrow"))

    j1 = li.join(orders, "inner", num_partitions=_join_partitions(),
                 on=("l_orderkey",), right_on=("o_orderkey",))
    j2 = j1.join(cust, "inner", num_partitions=_join_partitions(),
                 on=("o_custkey",), right_on=("c_custkey",))

    def combine(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "o_year": batch.column("o_year").to_numpy(),
            "rev": batch.column("rev_e4").to_numpy(),
            "tgt_rev": (batch.column("rev_e4").to_numpy()
                        * batch.column("is_tgt").to_numpy())})
        g = (df.groupby("o_year", sort=False)[["tgt_rev", "rev"]]
             .sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (j2.map_batches(combine, batch_format="pyarrow")
            .groupby("o_year")
            .aggregate(Sum("tgt_rev", alias_name="nation_revenue_e4"),
                       Sum("rev", alias_name="total_revenue_e4")))


def waiting_suppliers(sf_dir: str, grace_days: int = 60, k: int = 100):
    """TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    orders ('F'), count the late lineitems of suppliers who were the
    ONLY late supplier on a multi-supplier order — an EXISTS plus a
    NOT-EXISTS self-semi-join on lineitem, the hardest TPC-H join shape
    expressible without partsupp.  "Late" is adapted to the tables we
    have: ``l_shipdate > o_orderdate + grace_days`` (the testdata
    lineitem carries no commit/receipt dates).

    Plan: ONE tagged-union hash shuffle on orderkey co-partitions every
    order with all its lineitems; each bucket then vectorizes the whole
    exists/not-exists logic as two pandas groupbys (per (order,
    supplier) late/line counts, then per order distinct-supplier and
    late-supplier counts), emitting only (suppkey, n_late) partials.
    The supplier->name/nation attach is a broadcast dimension lookup on
    the tiny aggregated result."""
    import ray.data
    from ray.data.aggregate import Sum

    grace_us = grace_days * 86_400 * _US

    def oprep(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("o_orderstatus"), "F")
        sub = batch.filter(mask)
        n = sub.num_rows
        return pa.table({
            "key": sub.column("o_orderkey"),
            "supp": pa.array(np.zeros(n, dtype=np.int64)),
            "ts_us": sub.column("o_orderdate").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8))})

    def lprep(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": batch.column("l_orderkey"),
            "supp": batch.column("l_suppkey"),
            "ts_us": batch.column("l_shipdate").cast(pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8))})

    orders = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderstatus", "o_orderdate"])
        .map_batches(oprep, batch_format="pyarrow"))
    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"])
        .map_batches(lprep, batch_format="pyarrow"))

    def per_bucket(g):
        import pandas as pd

        o = (g.loc[g["side"] == 0, ["key", "ts_us"]]
              .rename(columns={"ts_us": "odate"}))
        l = g.loc[g["side"] == 1, ["key", "supp", "ts_us"]]
        m = l.merge(o, on="key", how="inner")
        if not len(m):
            return pd.DataFrame({
                "s_suppkey": np.array([], dtype=np.int64),
                "n_late": np.array([], dtype=np.int64)})
        late = (m["ts_us"].to_numpy()
                > m["odate"].to_numpy() + grace_us).astype(np.int64)
        per = (pd.DataFrame({"key": m["key"].to_numpy(),
                             "supp": m["supp"].to_numpy(),
                             "n_late": late})
               .groupby(["key", "supp"], sort=False)["n_late"].sum()
               .reset_index())
        per["is_late"] = (per["n_late"] > 0).astype(np.int64)
        po = (per.groupby("key", sort=False)
                 .agg(n_supp=("supp", "size"),
                      n_late_supp=("is_late", "sum")).reset_index())
        ok = po.loc[(po["n_supp"] >= 2) & (po["n_late_supp"] == 1), "key"]
        hit = per[(per["is_late"] == 1)
                  & per["key"].isin(set(ok.to_numpy()))]
        return pd.DataFrame({
            "s_suppkey": hit["supp"].to_numpy().astype(np.int64),
            "n_late": hit["n_late"].to_numpy().astype(np.int64)})

    from search_engine_ray.ops.shuffle import bucketed_apply

    agg = (bucketed_apply(orders.union(li), ["key"], per_bucket)
           .groupby("s_suppkey")
           .aggregate(Sum("n_late", alias_name="numwait"))
           .to_pandas())  # <= #suppliers rows — a dimension-sized result

    import ray.data as rd
    sup = rd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey"]).to_pandas()
    nat = rd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"]).to_pandas()
    sup = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    out = agg.merge(sup[["s_suppkey", "s_name", "n_name"]], on="s_suppkey")
    out = (out.sort_values(["numwait", "s_name"],
                           ascending=[False, True]).head(k))
    out["numwait"] = out["numwait"].astype("int64")
    return pa.Table.from_pandas(out[["s_name", "n_name", "numwait"]],
                                preserve_index=False)


def part_supplier_diversity(sf_dir: str, excl_brand: str = "Brand#13",
                            excl_type: str = "MEDIUM"):
    """TPC-H Q16 shape (parts/supplier relationship): per (brand, type,
    size) of non-excluded parts, how many DISTINCT suppliers shipped
    them — excluding a supplier blocklist subquery (here: names ending
    in '7', standing in for Q16's complaint-comment scan).

    Plan: part and the supplier blocklist are tiny dimensions —
    broadcast once (``ray.put``), vectorized ``np.isin``/searchsorted
    attach inside ``map_batches``; the distinct-count is per-batch
    deduped (drop_duplicates bounds shuffle volume by distinct pairs
    per batch) then ONE bucket shuffle on the group key counts uniques
    vectorized.  The group-key space is the part-attribute cross
    product — dimension-sized at any corpus scale."""
    import ray
    import ray.data
    import pandas as pd

    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"]).to_pandas()
    part = part[(part["p_brand"] != excl_brand)
                & (part["p_type"] != excl_type)]
    order = np.argsort(part["p_partkey"].to_numpy())
    pkeys = part["p_partkey"].to_numpy().astype(np.int64)[order]
    pattr = (part["p_brand"].to_numpy()[order],
             part["p_type"].to_numpy()[order],
             part["p_size"].to_numpy().astype(np.int64)[order])

    sup = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"]).to_pandas()
    bad = np.sort(sup.loc[sup["s_name"].str.endswith("7"),
                          "s_suppkey"].to_numpy().astype(np.int64))
    dims = ray.put((pkeys, pattr, bad))

    def lprep(batch: pa.Table) -> pa.Table:
        keys, attr, badk = ray.get(dims)
        pk = batch.column("l_partkey").to_numpy().astype(np.int64)
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        if not len(keys):
            pk = pk[:0]
            sk = sk[:0]
        pos = np.searchsorted(keys, pk).clip(0, max(len(keys) - 1, 0))
        keep = (keys[pos] == pk) & ~np.isin(sk, badk) \
            if len(pk) else np.zeros(0, dtype=bool)
        pos, sk = pos[keep], sk[keep]
        if not len(pos):
            # typed empty — a bare pandas empty frame would carry
            # null/float dtypes and poison the downstream schema union
            return pa.table({
                "p_brand": pa.array([], pa.string()),
                "p_type": pa.array([], pa.string()),
                "p_size": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "p_brand": attr[0][pos], "p_type": attr[1][pos],
            "p_size": attr[2][pos], "s": sk}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    li = (ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey"])
        .map_batches(lprep, batch_format="pyarrow"))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["p_brand", "p_type", "p_size"], sort=False)["s"]
                .nunique().rename("supplier_cnt").reset_index())
        out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
        out["p_size"] = out["p_size"].astype("int64")
        return out

    from search_engine_ray.ops.shuffle import bucketed_apply

    return bucketed_apply(li, ["p_brand", "p_type", "p_size"], per_bucket)


def customer_order_ranks(sf_dir: str):
    """Distributed WINDOW FUNCTION at fact scale: every order ranked
    within its customer by (totalprice desc, orderkey) — the
    `row_number() OVER (PARTITION BY ... ORDER BY ...)` shape, emitted
    for ALL rows (not just a per-group winner).

    Plan: ONE bucket shuffle on custkey; each bucket ranks all its
    customers vectorized (one sort + one groupby-cumcount — no per-key
    dispatch).  Money is e4-int BEFORE ranking so ties break exactly
    like the SQL mirror."""
    import ray.data

    from search_engine_ray.ops.shuffle import bucketed_apply

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "o_orderkey": batch.column("o_orderkey"),
            "totalprice_e4": pa.array(
                _e4_halfaway(batch.column("o_totalprice").to_numpy()),
                pa.int64())})

    ds = (ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow"))

    def per_bucket(g):
        import pandas as pd

        g = g.sort_values(["o_custkey", "totalprice_e4", "o_orderkey"],
                          ascending=[True, False, True]).reset_index(
            drop=True)
        g["rnk"] = (g.groupby("o_custkey", sort=False).cumcount()
                    + 1).astype("int64")
        return g[["o_custkey", "o_orderkey", "totalprice_e4", "rnk"]]

    return bucketed_apply(ds, ["o_custkey"], per_bucket)
