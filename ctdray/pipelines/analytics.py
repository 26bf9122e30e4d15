"""Relational demo pipelines over the TPC-H-ish testdata tables.

These exercise the engine's wide-operation patterns exactly as they must run
at 100 TB:

  * partial aggregation — each ``map_batches`` task pre-aggregates its batch
    with ``pyarrow.Table.group_by`` (combiner), so the ``groupby`` exchange
    carries (keys × n_batches) partial rows, never raw rows;
  * broadcast hash join — small dimension tables (customer, nation) are
    ``ray.put`` once and resolved per task, not re-shipped per batch and
    never shuffled;
  * deterministic top-k — sort with explicit tie-break keys + limit on the
    already-tiny aggregate;
  * tumbling windows — floor_temporal bucketing inside map_batches, then the
    same partial-agg reduce.

Every pipeline has an ANSI-SQL oracle in ``__ray_entry__.oracle_sql``;
aggregate outputs are integer-valued (counts, integral-double sums, min/max)
so value-hash comparison is exact.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..sources.tables import read_parquet_clean


# ---------------------------------------------------------------------------
# generic partial-agg → small-groupby reduce
# ---------------------------------------------------------------------------

_COMBINE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

_FIB64 = np.uint64(0x9E3779B97F4A7C15)


def bucket_ids(tbl: pa.Table, keys: list[str],
               n_buckets: int = 256) -> pa.Array:
    """Deterministic coarse hash bucket (int32 in [0, n_buckets)) of the
    key tuple, vectorized per column.  Coarse bucketing lets a groupby
    exchange carry ~n_buckets groups instead of one Python ``map_groups``
    call per distinct key — the per-call overhead is ~60 µs, so 150 k
    distinct keys cost ~9 s of pure call dispatch (measured round 1); a
    vectorized ``pa.Table.group_by`` inside 256 buckets costs none of it.
    Never use Python ``hash()`` here: string hashing is process-salted and
    map tasks run in different workers."""
    import zlib
    acc = np.zeros(len(tbl), dtype=np.uint64)
    shift = np.uint64(64 - int(n_buckets).bit_length() + 1)
    for k in keys:
        col = tbl.column(k)
        t = col.type
        if pa.types.is_integer(t) or pa.types.is_boolean(t):
            v = pc.fill_null(col.cast(pa.int64()), 0) \
                .to_numpy(zero_copy_only=False).astype(np.uint64)
        elif (pa.types.is_timestamp(t) or pa.types.is_date(t)
              or pa.types.is_time(t)):
            v = pc.fill_null(col.cast(pa.int64()), 0) \
                .to_numpy(zero_copy_only=False).astype(np.uint64)
        elif pa.types.is_floating(t):
            v = col.cast(pa.float64()).to_numpy(zero_copy_only=False) \
                .view(np.uint64).copy()
        else:  # string / binary: crc32 per row (C speed, deterministic)
            v = np.fromiter(
                (zlib.crc32(s.encode("utf-8", "surrogatepass"))
                 if isinstance(s, str)
                 else zlib.crc32(s or b"") for s in col.to_pylist()),
                dtype=np.uint64, count=len(col))
        acc = (acc ^ v) * _FIB64
    return pa.array(((acc * _FIB64) >> shift).astype(np.int32))


def partial_aggregate(ds: ray.data.Dataset, keys: list[str],
                      aggs: list[tuple[str, str, str]]) -> ray.data.Dataset:
    """aggs: (src_col, fn ∈ {sum,count,min,max}, out_name).  Per-batch
    pyarrow combiner, then one groupby over partials (SURVEY.md §2.7 AG2
    pattern — distributive, no shuffle of raw rows).  The exchange groups
    by a coarse hash bucket of the keys, so the reduce side makes ≤256
    Python calls total and combines each bucket with one vectorized
    ``pa.Table.group_by`` — high-cardinality keys (150 k+ distinct) cost
    the same dispatch overhead as 6."""
    _PB = "__pb"

    def partial(batch: pa.Table) -> pa.Table:
        gb = batch.group_by(keys)
        res = gb.aggregate([(src, fn) for src, fn, _ in aggs])
        cols = {k: res.column(k) for k in keys}
        for src, fn, out in aggs:
            cols[out] = res.column(f"{src}_{fn}")
        t = pa.table(cols)
        return t.append_column(_PB, bucket_ids(t, keys))

    def combine(group: pa.Table) -> pa.Table:
        in_types = {out: group.column(out).type for _, _, out in aggs}
        res = group.drop_columns([_PB]).group_by(keys).aggregate(
            [(out, _COMBINE[fn]) for _, fn, out in aggs])
        cols = {k: res.column(k) for k in keys}
        for _, fn, out in aggs:
            cols[out] = res.column(f"{out}_{_COMBINE[fn]}") \
                .cast(in_types[out])
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(_PB).map_groups(combine, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# pipelines
# ---------------------------------------------------------------------------


def lineitem_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped: per (returnflag, linestatus) row count and quantity
    sum (quantities are integral, so the double sum is order-independent and
    exact)."""
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def with_count(batch: pa.Table) -> pa.Table:
        return batch.append_column("one", pa.array(np.ones(len(batch), dtype=np.int64)))

    ds = ds.map_batches(with_count, batch_format="pyarrow")
    return partial_aggregate(
        ds, ["l_returnflag", "l_linestatus"],
        [("l_quantity", "sum", "sum_qty"), ("one", "sum", "n_rows")])


def top_customers_by_orders(sf_dir: str, n: int = 10) -> ray.data.Dataset:
    """Broadcast join orders→customer, count per customer, deterministic
    top-n (order count desc, custkey asc tie-break)."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    name_by_key = dict(zip(cust.column("c_custkey").to_pylist(),
                           cust.column("c_name").to_pylist()))
    cust_ref = ray.put(name_by_key)

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["o_custkey"]).aggregate([("o_custkey", "count")])
        return pa.table({"custkey": res.column("o_custkey"),
                         "n_orders": pc.cast(res.column("o_custkey_count"), pa.int64())})

    counts = (orders.map_batches(partial, batch_format="pyarrow")
                    .groupby("custkey")
                    .map_groups(lambda g: pa.table({
                        "custkey": g.column("custkey").slice(0, 1),
                        "n_orders": pa.array([pc.sum(g.column("n_orders")).as_py()],
                                             pa.int64())}),
                                batch_format="pyarrow"))
    top = counts.sort(["n_orders", "custkey"], descending=[True, False]).limit(n)

    def attach_name(batch: pa.Table) -> pa.Table:
        lookup = ray.get(cust_ref)
        names = [lookup.get(k, "") for k in batch.column("custkey").to_pylist()]
        return batch.append_column("c_name", pa.array(names, pa.string()))

    return top.map_batches(attach_name, batch_format="pyarrow")


def orders_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Two-hop broadcast join orders→customer→nation, count per nation."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    # Two-hop lookup vectorized as Arrow dictionary lookups: index_in against
    # the customer key array → take nationkey → index_in against nation keys
    # → take name.  Misses fall through as nulls and land on the "" slot.
    side_ref = ray.put((cust.column("c_custkey").combine_chunks(),
                        cust.column("c_nationkey").combine_chunks(),
                        nation.column("n_nationkey").combine_chunks(),
                        pa.concat_arrays([nation.column("n_name").combine_chunks(),
                                          pa.array([""], pa.string())])))

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        ckeys, cnkeys, nkeys, names_d = ray.get(side_ref)
        i1 = pc.index_in(batch.column("o_custkey"), value_set=ckeys)
        nkey = pc.take(cnkeys, i1)                      # null on miss
        i2 = pc.fill_null(pc.index_in(nkey, value_set=nkeys), len(nkeys))
        names = pc.take(names_d, i2)
        t = pa.table({"n_name": names})
        res = t.group_by(["n_name"]).aggregate([("n_name", "count")])
        return pa.table({"n_name": res.column("n_name"),
                         "n_orders": pc.cast(res.column("n_name_count"), pa.int64())})

    return (orders.map_batches(partial, batch_format="pyarrow")
                  .groupby("n_name")
                  .map_groups(lambda g: pa.table({
                      "n_name": g.column("n_name").slice(0, 1),
                      "n_orders": pa.array([pc.sum(g.column("n_orders")).as_py()],
                                           pa.int64())}),
                              batch_format="pyarrow"))


def part_type_stats(sf_dir: str) -> ray.data.Dataset:
    """Groupby over part types: count + exact min/max retail price."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                               columns=["p_type", "p_retailprice"])

    def with_one(batch: pa.Table) -> pa.Table:
        return batch.append_column("one", pa.array(np.ones(len(batch),
                                                           dtype=np.int64)))

    return partial_aggregate(
        ds.map_batches(with_one, batch_format="pyarrow"), ["p_type"],
        [("one", "sum", "n_parts"), ("p_retailprice", "min", "min_price"),
         ("p_retailprice", "max", "max_price")])


def shipped_1995_by_flag(sf_dir: str) -> ray.data.Dataset:
    """Filter-at-the-read demo: a pyarrow predicate is pushed into the
    Parquet scan (row groups outside 1995 never leave storage), then a
    partial-agg count per returnflag."""
    import datetime

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    lo = datetime.datetime(1995, 1, 1)
    hi = datetime.datetime(1996, 1, 1)
    expr = (pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi)
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                               columns=["l_returnflag", "l_shipdate"],
                               filter=expr)

    def partial(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["l_returnflag"]).aggregate([("l_returnflag", "count")])
        return pa.table({"l_returnflag": res.column("l_returnflag"),
                         "n_items": pc.cast(res.column("l_returnflag_count"),
                                            pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("l_returnflag")
              .map_groups(lambda g: pa.table({
                  "l_returnflag": g.column("l_returnflag").slice(0, 1),
                  "n_items": pa.array([pc.sum(g.column("n_items")).as_py()],
                                      pa.int64())}),
                          batch_format="pyarrow"))


def supplier_stats_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Broadcast join supplier→nation + count / min / max account balance."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    import ray as _ray

    side = _ray.put((nation.column("n_nationkey").combine_chunks(),
                     pa.concat_arrays([nation.column("n_name").combine_chunks(),
                                       pa.array([""], pa.string())])))
    sup = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                                columns=["s_nationkey", "s_acctbal"])

    def attach(batch: pa.Table) -> pa.Table:
        nkeys, names_d = _ray.get(side)
        idx = pc.fill_null(pc.index_in(batch.column("s_nationkey"),
                                       value_set=nkeys), len(nkeys))
        return pa.table({"n_name": pc.take(names_d, idx),
                         "s_acctbal": batch.column("s_acctbal"),
                         "one": pa.array(np.ones(len(batch), dtype=np.int64))})

    return partial_aggregate(
        sup.map_batches(attach, batch_format="pyarrow"), ["n_name"],
        [("one", "sum", "n_suppliers"), ("s_acctbal", "min", "min_acctbal"),
         ("s_acctbal", "max", "max_acctbal")])


def orders_monthly_by_priority(sf_dir: str) -> ray.data.Dataset:
    """Tumbling month window × priority: count of orders."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                               columns=["o_orderdate", "o_orderpriority"])

    def bucket(batch: pa.Table) -> pa.Table:
        month = pc.floor_temporal(batch.column("o_orderdate"), unit="month")
        return pa.table({"month": month,
                         "o_orderpriority": batch.column("o_orderpriority"),
                         "one": pa.array(np.ones(len(batch), dtype=np.int64))})

    return partial_aggregate(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["month", "o_orderpriority"], [("one", "sum", "n_orders")])


def orders_by_mktsegment(sf_dir: str) -> ray.data.Dataset:
    """Native distributed hash join (both sides shuffle on the key — the
    path for two large tables; functions.joins.hash_join) then partial-agg
    count per market segment."""
    from ..functions.joins import hash_join

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    joined = hash_join(orders, cust, on="o_custkey", right_on="c_custkey")

    def partial(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["c_mktsegment"]).aggregate([("c_mktsegment", "count")])
        return pa.table({"c_mktsegment": res.column("c_mktsegment"),
                         "n_orders": pc.cast(res.column("c_mktsegment_count"),
                                             pa.int64())})

    return (joined.map_batches(partial, batch_format="pyarrow")
                  .groupby("c_mktsegment")
                  .map_groups(lambda g: pa.table({
                      "c_mktsegment": g.column("c_mktsegment").slice(0, 1),
                      "n_orders": pa.array([pc.sum(g.column("n_orders")).as_py()],
                                           pa.int64())}),
                              batch_format="pyarrow"))


def events_sliding_2h(sf_dir: str) -> ray.data.Dataset:
    """Sliding window (size 2h, step 1h): each event replicates into the two
    windows covering it inside map_batches (vectorized), then the usual
    partial-agg reduce — the overlap factor, not a shuffle, carries the
    window semantics."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def explode_windows(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        prev = pc.subtract(hour, pa.scalar(3_600_000_000,
                                           pa.duration("us")))
        win = pa.concat_arrays([pc.cast(hour, pa.timestamp("us")).combine_chunks(),
                                pc.cast(prev, pa.timestamp("us")).combine_chunks()])
        etype = batch.column("event_type").combine_chunks()
        etype2 = pa.concat_arrays([etype, etype])
        return pa.table({"win_start": win, "event_type": etype2,
                         "one": pa.array(np.ones(2 * len(batch), dtype=np.int64))})

    return partial_aggregate(
        ds.map_batches(explode_windows, batch_format="pyarrow"),
        ["win_start", "event_type"], [("one", "sum", "n_events")])


def daily_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """Distributed exact distinct-count: per-batch (day, user) dedup shrinks
    the exchange, then per-day unique count in the reduce."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])

    def day_user(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"day": day, "user_id": batch.column("user_id")})
        return t.group_by(["day", "user_id"]).aggregate([])

    def count_unique(group: pa.Table) -> pa.Table:
        uniq = group.group_by(["user_id"]).aggregate([]).num_rows
        return pa.table({"day": group.column("day").slice(0, 1),
                         "n_users": pa.array([uniq], pa.int64())})

    return (ds.map_batches(day_user, batch_format="pyarrow")
              .groupby("day")
              .map_groups(count_unique, batch_format="pyarrow"))


def top_tokens(sf_dir: str, n: int = 20) -> ray.data.Dataset:
    """Corpus vocabulary top-n: explode tokens inside map_batches (Arrow
    list_flatten — no Python row loop), pre-count per batch, groupby-sum the
    partials, deterministic top-n (count desc, token asc)."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        t = pa.table({"token": toks})
        res = t.group_by(["token"]).aggregate([("token", "count")])
        return pa.table({"token": res.column("token"),
                         "n_occurrences": pc.cast(res.column("token_count"),
                                                  pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("token")
                .map_groups(lambda g: pa.table({
                    "token": g.column("token").slice(0, 1),
                    "n_occurrences": pa.array(
                        [pc.sum(g.column("n_occurrences")).as_py()], pa.int64())}),
                            batch_format="pyarrow"))
    return counts.sort(["n_occurrences", "token"],
                       descending=[True, False]).limit(n)


def sessionize_events(sf_dir: str, gap_seconds: int = 1800) -> ray.data.Dataset:
    """Gap-based sessionization per user — the stateful-per-key streaming op:
    ``groupby(user_id).map_groups`` sorts each user's events by time and
    counts sessions split at >gap_seconds silences.  Per-user event counts
    are small and bounded; the shuffle carries (user_id, ts) pairs only."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = np.sort(group.column("ts").to_numpy(zero_copy_only=False))
        # microsecond precision: casting to whole seconds would truncate a
        # 1800.5s gap to 1800 and disagree with the oracle's strict >
        gaps_us = np.diff(ts).astype("timedelta64[us]").astype(np.int64)
        n_sessions = 1 + int((gaps_us > gap_seconds * 1_000_000).sum()) \
            if len(ts) else 0
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "n_events": pa.array([len(ts)], pa.int64()),
            "n_sessions": pa.array([n_sessions], pa.int64()),
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling 1-hour window per event_type: count + exact min/max value."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        return pa.table({"hour": hour,
                         "event_type": batch.column("event_type"),
                         "value": batch.column("value"),
                         "one": pa.array(np.ones(len(batch), dtype=np.int64))})

    ds = ds.map_batches(bucket, batch_format="pyarrow")
    return partial_aggregate(
        ds, ["hour", "event_type"],
        [("one", "sum", "n_events"), ("value", "min", "min_value"),
         ("value", "max", "max_value")])


def asof_last_event(sf_dir: str, left_type: str = "purchase",
                    right_type: str = "view") -> ray.data.Dataset:
    """AS-OF join within the events stream: each ``left_type`` event gets
    the most recent ``right_type`` timestamp at-or-before it for the same
    user — the operator Ray Data lacks natively, composed as column-pruned
    read → early type filter (vectorized) → ``groupby(user_id)`` →
    per-group sort + ``np.searchsorted`` (SURVEY.md §2.11 custom-operator
    rule: partitioning key = user_id; per-user event counts are bounded, so
    groups stay small and only (ts, user_id, type) triples shuffle)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id", "event_type"])

    def keep_types(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column("event_type"),
                     value_set=pa.array([left_type, right_type]))
        return batch.filter(m)

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False)
        et = np.array(group.column("event_type").to_pylist())
        order = np.argsort(ts, kind="stable")
        ts, et = ts[order], et[order]
        left_sel = et == left_type
        right_ts = ts[et == right_type]
        lts = ts[left_sel]
        # greatest right ts <= left ts (ASOF semantics)
        idx = np.searchsorted(right_ts, lts, side="right") - 1
        matched = idx >= 0
        vals = np.full(len(lts), np.datetime64("NaT", "us"), dtype="datetime64[us]")
        if len(right_ts):
            vals[matched] = right_ts[idx[matched]].astype("datetime64[us]")
        uid = group.column("user_id").slice(0, 1).to_pylist()[0]
        return pa.table({
            "user_id": pa.array([uid] * len(lts),
                                group.column("user_id").type),
            "ts": pa.array(lts.astype("datetime64[us]"), pa.timestamp("us")),
            "last_view_ts": pa.array(vals, pa.timestamp("us"),
                                     from_pandas=True),
        })

    return (ds.map_batches(keep_types, batch_format="pyarrow")
              .groupby("user_id")
              .map_groups(per_user, batch_format="pyarrow"))


def interval_count_join(sf_dir: str, left_type: str = "purchase",
                        right_type: str = "view",
                        window_s: int = 60) -> ray.data.Dataset:
    """Banded INTERVAL (range) join: for each ``left_type`` event, count
    ``right_type`` events within ±``window_s`` seconds (any user) — the
    time-proximity join Ray Data lacks natively, expressed as the classic
    band trick: right rows land in their own ``window_s``-wide time bucket;
    left rows REPLICATE into the three buckets a qualifying partner could
    occupy (b-1, b, b+1), so each qualifying pair meets in exactly one
    group (the right row's home bucket) and is counted exactly once.  The
    per-bucket partial counts reduce with one tiny groupby — no all-pairs
    work, no skew beyond real temporal hot spots."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])
    w_us = window_s * 1_000_000

    def to_buckets(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        et = np.array(batch.column("event_type").to_pylist())
        left_ts = ts[et == left_type]
        right_ts = ts[et == right_type]
        lb = left_ts // w_us
        out_ts = np.concatenate([np.repeat(left_ts, 3), right_ts])
        out_bucket = np.concatenate(
            [(lb[:, None] + np.array([-1, 0, 1])).reshape(-1),
             right_ts // w_us])
        out_left = np.concatenate([np.ones(3 * len(left_ts), bool),
                                   np.zeros(len(right_ts), bool)])
        return pa.table({"bucket": pa.array(out_bucket, pa.int64()),
                         "ts_us": pa.array(out_ts, pa.int64()),
                         "is_left": pa.array(out_left, pa.bool_())})

    def bucket_counts(group: pa.Table) -> pa.Table:
        ts = group.column("ts_us").to_numpy(zero_copy_only=False)
        is_left = group.column("is_left").to_numpy(zero_copy_only=False)
        bucket = int(group.column("bucket").slice(0, 1).to_pylist()[0])
        lts = ts[is_left]
        rts = np.sort(ts[~is_left])
        # count right rows in THIS bucket within the window of each left
        lo = np.searchsorted(rts, lts - w_us, side="left")
        hi = np.searchsorted(rts, lts + w_us, side="right")
        n = hi - lo
        # emit the zero partial only from the left row's HOME bucket so
        # every left event appears exactly once after the reduce
        home = (lts // w_us) == bucket
        keep = home | (n > 0)
        return pa.table({"ts_us": pa.array(lts[keep], pa.int64()),
                         "n_partial": pa.array(n[keep], pa.int64())})

    def reduce_counts(group: pa.Table) -> pa.Table:
        total = pc.sum(group.column("n_partial")).as_py() or 0
        ts_us = group.column("ts_us").slice(0, 1).to_pylist()[0]
        return pa.table({
            "ts": pa.array(np.array([ts_us], dtype="datetime64[us]"),
                           pa.timestamp("us")),
            "n_nearby": pa.array([int(total)], pa.int64())})

    partials = (ds.map_batches(to_buckets, batch_format="pyarrow")
                  .groupby("bucket")
                  .map_groups(bucket_counts, batch_format="pyarrow"))
    return partials.groupby("ts_us").map_groups(reduce_counts,
                                                batch_format="pyarrow")


def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          year: int = 1996,
                          broadcast_cap: int = 4_000_000) -> ray.data.Dataset:
    """TPC-H Q5-shaped: revenue per nation where customer and supplier share
    an Asian nation, for orders placed in ``year``.

    Physical plan at 100 TB: region→nation→customer/supplier fold into
    BROADCAST lookup arrays (dimension side never shuffles).  Orders prune
    at the read (year predicate pushed into the Parquet scan), then the
    Asian-customer semi-join is applied per batch against the broadcast
    customer lookup BEFORE the big join — year ∧ region keeps ~1/35 of
    orders, so the join's build side shrinks 35× before any exchange.
    The orders×lineitem join is then chosen adaptively, Spark-style
    size-based broadcast: a ``limit(cap+1)`` probe materializes the
    filtered build side only if it is provably under ``broadcast_cap``
    rows (a bounded take, ~16 B/row), in which case lineitem streams once
    through a per-batch hash lookup and NOTHING shuffles; over the cap it
    falls back to the sort-bucket shuffle join (functions.joins — Ray
    2.49's native hash join chokes on schema-less empty partitions a
    row-group-pruned side produces).  Revenue is summed in integral 10^-4
    units (prices/discounts have 2 decimals) so the double→int sum is
    order-independent and hash-exact."""
    import datetime

    import pyarrow.dataset as pads

    region_t = pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = [r["r_regionkey"] for r in region_t.to_pylist()
             if r["r_name"] == region]
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet")
    asian = {r["n_nationkey"]: r["n_name"] for r in nation_t.to_pylist()
             if r["n_regionkey"] in rkeys}
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nkeys = pa.array(list(asian.keys()), pa.int64())
    side = ray.put((
        cust.column("c_custkey").combine_chunks(),
        cust.column("c_nationkey").combine_chunks(),
        supp.column("s_suppkey").combine_chunks(),
        supp.column("s_nationkey").combine_chunks(),
        nkeys,
        pa.array(list(asian.values()), pa.string()),
    ))

    lo = datetime.datetime(year, 1, 1)
    hi = datetime.datetime(year + 1, 1, 1)
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo)
               & (pads.field("o_orderdate") < hi))

    def stamp_cnat(b: pa.Table) -> pa.Table:
        """Asian-customer semi-join + c_nationkey stamp (build side)."""
        ckeys, cnk, _sk, _sn, nk, _nn = ray.get(side)
        ci = pc.index_in(b.column("o_custkey"), value_set=ckeys)
        c_nat = pc.take(cnk, ci)
        keep = pc.fill_null(pc.is_in(c_nat, value_set=nk), False)
        return pa.table({"o_orderkey": b.column("o_orderkey").filter(keep),
                         "c_nat": pc.cast(c_nat.filter(keep), pa.int64())})

    orders_asia = orders.map_batches(stamp_cnat, batch_format="pyarrow")
    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def fold(batch: pa.Table) -> pa.Table:
        """Shared tail: batch has (l_suppkey, l_extendedprice, l_discount,
        c_nat); supplier-nation lookup + same-nation filter + revenue fold."""
        _ck, _cn, skeys, snk, nk, nnames = ray.get(side)
        si = pc.index_in(batch.column("l_suppkey"), value_set=skeys)
        s_nat = pc.take(snk, si).to_numpy(zero_copy_only=False)
        c_nat = batch.column("c_nat").to_numpy(zero_copy_only=False)
        same = c_nat == s_nat
        t = batch.filter(pa.array(same))
        if len(t) == 0:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "revenue_e4": pa.array([], pa.int64())})
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        rev = np.round(price * (1.0 - disc) * 10_000).astype(np.int64)
        ni = pc.index_in(t.column("c_nat"), value_set=nk)
        names = pc.take(nnames, ni)
        part = pa.table({"n_name": names, "revenue_e4": pa.array(rev)})
        res = part.group_by(["n_name"]).aggregate([("revenue_e4", "sum")])
        return pa.table({"n_name": res.column("n_name"),
                         "revenue_e4": res.column("revenue_e4_sum")})

    # Size probe: bounded take of cap+1 rows decides broadcast vs shuffle.
    probe = orders_asia.limit(broadcast_cap + 1).take_all()
    if len(probe) <= broadcast_cap:
        okeys_np = np.array([r["o_orderkey"] for r in probe], dtype=np.int64)
        onat_np = np.array([r["c_nat"] for r in probe], dtype=np.int64)
        order_sorted = np.argsort(okeys_np, kind="stable")
        build = ray.put((okeys_np[order_sorted], onat_np[order_sorted]))

        def bjoin_fold(b: pa.Table) -> pa.Table:
            okeys, onat = ray.get(build)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(okeys, lk)
            pos_c = np.minimum(pos, len(okeys) - 1) if len(okeys) else pos
            hit = (len(okeys) > 0) & (okeys[pos_c] == lk) if len(okeys) \
                else np.zeros(len(lk), dtype=bool)
            t = b.filter(pa.array(hit))
            if len(t) == 0:
                return pa.table({"n_name": pa.array([], pa.string()),
                                 "revenue_e4": pa.array([], pa.int64())})
            t = t.append_column(
                "c_nat", pa.array(onat[pos_c[hit]], pa.int64()))
            return fold(t)

        partials = lineitem.map_batches(bjoin_fold, batch_format="pyarrow")
    else:  # over-cap fallback: the 100-TB path (tested vs broadcast at sf0.001)
        from ..functions.joins import shuffle_lookup_join

        joined = shuffle_lookup_join(
            lineitem, orders_asia, on="l_orderkey", right_on="o_orderkey",
            left_schema=pa.schema([
                ("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64())]),
            right_schema=pa.schema([
                ("o_orderkey", pa.int64()), ("c_nat", pa.int64())]))
        partials = joined.map_batches(fold, batch_format="pyarrow")
    # Final reduce driver-side: the combiner output is ≤ n_nations ×
    # n_blocks rows (25 × blocks here), so streaming it to the driver and
    # folding in Arrow replaces a whole Sort exchange with a bounded
    # collect — the same "small aggregated result" exemption as take-based
    # sinks.  At 100 TB the partial count grows only with block count,
    # never with data volume.
    parts = list(partials.iter_batches(batch_format="pyarrow",
                                       batch_size=None))
    empty = pa.table({"n_name": pa.array([], pa.string()),
                      "revenue_e4": pa.array([], pa.int64())})
    merged = pa.concat_tables(parts) if parts else empty
    if len(merged) == 0:
        return ray.data.from_arrow(empty)
    res = merged.group_by(["n_name"]).aggregate([("revenue_e4", "sum")])
    return ray.data.from_arrow(pa.table({
        "n_name": res.column("n_name"),
        "revenue_e4": pc.cast(res.column("revenue_e4_sum"), pa.int64())}))


def top_orders_per_customer(sf_dir: str, n: int = 2) -> ray.data.Dataset:
    """Distributed WINDOW FUNCTION: row_number() over (partition by
    customer, order by totalprice desc) ≤ n — per-key top-n without a
    global sort.  Keys hash into 256 buckets (one groupby exchange carrying
    only the projected columns) and each bucket ranks ALL its keys in one
    vectorized lexsort — no per-key Python, no skew beyond real key skew.
    Ties break on ascending o_orderkey so the result is deterministic and
    hash-exact."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey",
                                     "o_totalprice"])

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        b = ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(56)) \
            .astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def rank_bucket(group: pa.Table) -> pa.Table:
        cust = group.column("o_custkey").to_numpy(zero_copy_only=False)
        price = group.column("o_totalprice").to_numpy(zero_copy_only=False)
        okey = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        # one lexsort ranks every key in the bucket: (cust asc, price desc,
        # orderkey asc); rank = position within its key run
        order = np.lexsort((okey, -price, cust))
        cust_s = cust[order]
        run_start = np.flatnonzero(
            np.concatenate(([True], cust_s[1:] != cust_s[:-1])))
        pos = np.arange(len(cust_s))
        rank = pos - np.repeat(run_start, np.diff(
            np.concatenate((run_start, [len(cust_s)])))) + 1
        keep = rank <= n
        sel = order[keep]
        return pa.table({
            "custkey": pa.array(cust[sel], pa.int64()),
            "o_orderkey": pa.array(okey[sel], pa.int64()),
            "o_totalprice": pa.array(price[sel], pa.float64()),
            "rnk": pa.array(rank[keep].astype(np.int64)),
        })

    return (ds.map_batches(bucket, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(rank_bucket, batch_format="pyarrow"))


def top_bigrams(sf_dir: str, n: int = 20) -> ray.data.Dataset:
    """Corpus bigram top-n: adjacent-token pairs built fully vectorized from
    the flattened token values + list offsets (mask the last token of every
    document, binary_join the shifted arrays), pre-counted per batch, then
    the same tiny groupby-sum + deterministic top-n as :func:`top_tokens`.
    At 100 TB the exchange carries (distinct bigram × n_batches) partial
    counts only — never the exploded pairs."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        lists = batch.column("text")
        toks = pc.split_pattern(lists, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        m = len(flat)
        if m < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n_occurrences": pa.array([], pa.int64())})
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        valid = np.ones(m - 1, dtype=bool)
        ends = offsets[1:] - 1          # last-token index of each document
        ends = ends[(ends >= 0) & (ends < m - 1)]
        valid[ends] = False
        sel = pa.array(valid)
        left = flat.slice(0, m - 1).filter(sel)
        right = flat.slice(1, m - 1).filter(sel)
        bigram = pc.binary_join_element_wise(left, right, " ")
        t = pa.table({"bigram": bigram})
        res = t.group_by(["bigram"]).aggregate([("bigram", "count")])
        return pa.table({"bigram": res.column("bigram"),
                         "n_occurrences": pc.cast(res.column("bigram_count"),
                                                  pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("bigram")
                .map_groups(lambda g: pa.table({
                    "bigram": g.column("bigram").slice(0, 1),
                    "n_occurrences": pa.array(
                        [pc.sum(g.column("n_occurrences")).as_py()],
                        pa.int64())}),
                            batch_format="pyarrow"))
    return counts.sort(["n_occurrences", "bigram"],
                       descending=[True, False]).limit(n)


def doc_top_terms(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """TF-IDF-shaped distinctive-term extraction with an integer-exact rank:
    corpus-wide document frequency (per-batch per-doc distinct terms →
    partial counts → groupby-sum), DF table broadcast once via ``ray.put``
    (vocabulary is the bounded side — the tokenizer-vocab assumption every
    training pipeline makes; the unbounded alternative is a
    ``shuffle_lookup_join`` on term), then per-document terms ranked by
    (tf DESC, df ASC, term ASC) — idf is monotone-decreasing in df, so this
    ordering IS the tf-idf ordering without float ties.  Each document lives
    in one row, so tf and the rank are batch-local; nothing but the DF
    partials ever shuffles."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def df_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        # distinct terms per doc: explode with doc index, dedup (idx, term)
        flat = toks.flatten()
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(len(toks), dtype=np.int64),
                        np.diff(offsets))
        pairs = pa.table({"i": pa.array(idx), "term": flat})
        uniq = pairs.group_by(["i", "term"]).aggregate([])
        res = uniq.group_by(["term"]).aggregate([("term", "count")])
        return pa.table({"term": res.column("term"),
                         "df": pc.cast(res.column("term_count"), pa.int64())})

    df_tbl = (ds.map_batches(df_partial, batch_format="pyarrow")
                .groupby("term")
                .map_groups(lambda g: pa.table({
                    "term": g.column("term").slice(0, 1),
                    "df": pa.array([pc.sum(g.column("df")).as_py()],
                                   pa.int64())}),
                            batch_format="pyarrow"))
    df_at = pa.concat_tables(
        list(df_tbl.iter_batches(batch_format="pyarrow")),
        promote_options="default")
    df_ref = ray.put((df_at.column("term").combine_chunks(),
                      df_at.column("df").to_numpy(zero_copy_only=False)))

    def rank_terms(batch: pa.Table) -> pa.Table:
        terms_arr, df_vals = ray.get(df_ref)
        toks = pc.split_pattern(batch.column("text"), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(len(toks), dtype=np.int64),
                        np.diff(offsets))
        pairs = pa.table({"i": pa.array(idx), "term": flat})
        tf_tbl = pairs.group_by(["i", "term"]).aggregate([("term", "count")])
        i = tf_tbl.column("i").to_numpy(zero_copy_only=False)
        tf = tf_tbl.column("term_count").to_numpy(
            zero_copy_only=False).astype(np.int64)
        term_col = tf_tbl.column("term").combine_chunks()
        pos = pc.index_in(term_col, value_set=terms_arr)
        df = df_vals[pos.to_numpy(zero_copy_only=False)]
        # rank rows per doc by (tf desc, df asc, term asc): lexsort with the
        # term's position in its own sorted order as the final key
        term_rank = pc.rank(term_col, sort_keys="ascending",
                            tiebreaker="dense").to_numpy(zero_copy_only=False)
        order = np.lexsort((term_rank, df, -tf, i))
        i_s = i[order]
        run_start = np.flatnonzero(
            np.concatenate(([True], i_s[1:] != i_s[:-1])))
        rank = np.arange(len(i_s)) - np.repeat(run_start, np.diff(
            np.concatenate((run_start, [len(i_s)])))) + 1
        keep = rank <= k
        sel = order[keep]
        return pa.table({
            "doc_id": pa.array(doc_ids[i[sel]], pa.int64()),
            "term": term_col.take(pa.array(sel)),
            "tf": pa.array(tf[sel], pa.int64()),
            "df": pa.array(df[sel], pa.int64()),
            "rnk": pa.array(rank[keep].astype(np.int64)),
        })

    return ds.map_batches(rank_terms, batch_format="pyarrow")


def events_rollup(sf_dir: str) -> ray.data.Dataset:
    """Hierarchical (ROLLUP) aggregate from ONE raw scan: the finest
    (day, event_type) counts are computed with the usual partial-agg
    pattern, then the two coarser levels are derived by re-aggregating the
    finest partials — the raw table is never re-read and the exchange only
    ever carries aggregate rows.  'ALL' is the subtotal sentinel (matches
    the oracle's COALESCE over GROUP BY ROLLUP)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def bucket(batch: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(batch.column("ts"), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({"grp_day": day,
                         "grp_type": batch.column("event_type"),
                         "one": pa.array(np.ones(len(batch), dtype=np.int64))})

    finest = partial_aggregate(ds.map_batches(bucket, batch_format="pyarrow"),
                               ["grp_day", "grp_type"],
                               [("one", "sum", "n_events")])

    def expand_levels(batch: pa.Table) -> pa.Table:
        n = len(batch)
        all_s = pa.array(["ALL"] * n, pa.string())
        lvl1 = pa.table({"grp_day": batch.column("grp_day"),
                         "grp_type": all_s,
                         "n_events": batch.column("n_events")})
        lvl2 = pa.table({"grp_day": all_s, "grp_type": all_s,
                         "n_events": batch.column("n_events")})
        return pa.concat_tables([batch, lvl1, lvl2])

    return partial_aggregate(
        finest.map_batches(expand_levels, batch_format="pyarrow"),
        ["grp_day", "grp_type"], [("n_events", "sum", "n_events")])


def _hash60_str(s: str) -> int:
    """60-bit md5-prefix hash of a string — same fold the SQL oracles
    rebuild char-by-char (see __ray_entry__._fold60_sql)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def daily_users_hll(sf_dir: str, m: int = 64) -> ray.data.Dataset:
    """HyperLogLog register sketch for daily distinct users — the mergeable
    cardinality sketch a 100-TB pipeline uses instead of an exact
    distinct-count shuffle.  Register index = h mod m, rho = trailing-zero
    rank of h div m (bit_count(w XOR w-1), the SQL-replicable form).  The
    per-batch partial is already the (day, register)→max-rho sketch, so the
    exchange carries at most days × m rows per batch and register merges are
    associative max — exactly how sketches union across 256 nodes.  The
    float estimate stays out of the driver contract (registers are
    integer-exact; the harmonic-mean estimate is a pytest property)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id"])
    rho_zero = 60 - int(np.log2(m)) + 1  # rho when the remaining bits are 0

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        users = batch.column("user_id")
        uniq = pc.unique(users)
        hs = np.array([_hash60_str(str(u)) for u in uniq.to_pylist()],
                      dtype=np.uint64)
        mm = np.uint64(m)
        w = hs // mm
        wz = w == np.uint64(0)
        safe = np.where(wz, np.uint64(1), w)
        rho = _popcount64(safe ^ (safe - np.uint64(1))).astype(np.int64)
        rho[wz] = rho_zero
        reg = (hs % mm).astype(np.int64)
        pos = pc.index_in(users, value_set=uniq).to_numpy(
            zero_copy_only=False)
        t = pa.table({"day": day,
                      "register": pa.array(reg[pos]),
                      "max_rho": pa.array(rho[pos])})
        res = t.group_by(["day", "register"]).aggregate([("max_rho", "max")])
        return pa.table({"day": res.column("day"),
                         "register": res.column("register"),
                         "max_rho": res.column("max_rho_max")})

    return partial_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day", "register"], [("max_rho", "max", "max_rho")])


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) — numpy<2 has no bit_count ufunc."""
    x = x.astype(np.uint64).copy()
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + \
        ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def hll_estimate(registers: np.ndarray, m: int = 64) -> float:
    """Standard HLL harmonic-mean estimate from a full m-register vector
    (absent registers = 0), with the small-range linear-counting
    correction."""
    alpha = 0.709 if m == 64 else 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def docs_stratified_sample(sf_dir: str, per_stratum: int = 5) -> ray.data.Dataset:
    """Deterministic stratified sample: per language, the ``per_stratum``
    docs with the smallest md5(doc_id) — the held-out-split primitive that
    every worker and the SQL oracle agree on exactly.  Per-batch local
    top-n per stratum prunes the exchange to ≤ strata × n rows per batch
    before the per-stratum reduce."""
    import hashlib

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])

    def local_top(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        key = np.array([hashlib.md5(str(d).encode()).hexdigest()
                        for d in doc])
        lang_rank = pc.rank(batch.column("lang"), sort_keys="ascending",
                            tiebreaker="dense").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, key, lang_rank))
        l_s = lang_rank[order]
        run_start = np.flatnonzero(
            np.concatenate(([True], l_s[1:] != l_s[:-1])))
        rank = np.arange(len(l_s)) - np.repeat(run_start, np.diff(
            np.concatenate((run_start, [len(l_s)])))) + 1
        sel = order[rank <= per_stratum]
        return pa.table({"lang": pa.array(lang[sel]),
                         "doc_id": pa.array(doc[sel], pa.int64()),
                         "hkey": pa.array(key[sel])})

    def reduce_stratum(group: pa.Table) -> pa.Table:
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        key = group.column("hkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, key))[:per_stratum]
        return pa.table({
            "lang": pa.array([group.column("lang")[0].as_py()] * len(order)),
            "doc_id": pa.array(doc[order], pa.int64()),
            "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
        })

    return (ds.map_batches(local_top, batch_format="pyarrow")
              .groupby("lang")
              .map_groups(reduce_stratum, batch_format="pyarrow"))


def token_countmin(sf_dir: str, depth: int = 4,
                   width: int = 256) -> ray.data.Dataset:
    """Count-Min sketch of corpus token frequencies — the mergeable
    heavy-hitter structure a 100-TB pipeline uses when the exact vocabulary
    groupby is too wide.  Cell (d, h_d(tok) mod width) accumulates every
    occurrence; rows merge by plain sum, so the per-batch partial is already
    a sketch and the exchange carries ≤ depth·width rows per batch no matter
    the token volume.  Hash rows are md5-derived (``_hash60_str(f"{d}:{tok}")``)
    so the full register table is rebuilt exactly by the SQL oracle; the
    point-query guarantee (min over rows ≥ true count) is the pytest
    property."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        uniq = pc.unique(toks)
        uniq_py = uniq.to_pylist()
        occ = pc.index_in(toks, value_set=uniq).to_numpy(
            zero_copy_only=False)
        per_uniq = np.bincount(occ, minlength=len(uniq_py)).astype(np.int64)
        out_d, out_s, out_n = [], [], []
        for d in range(depth):
            slots = np.array([_hash60_str(f"{d}:{t}") % width
                              for t in uniq_py], dtype=np.int64)
            cnt = np.bincount(slots, weights=per_uniq,
                              minlength=width).astype(np.int64)
            nz = np.flatnonzero(cnt)
            out_d.extend([d] * len(nz))
            out_s.extend(nz.tolist())
            out_n.extend(cnt[nz].tolist())
        return pa.table({"depth": pa.array(out_d, pa.int64()),
                         "slot": pa.array(out_s, pa.int64()),
                         "n": pa.array(out_n, pa.int64())})

    return partial_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["depth", "slot"], [("n", "sum", "n")])


def countmin_point_query(sketch, token: str, depth: int = 4,
                         width: int = 256) -> int:
    """Min-over-rows estimate for one token from a materialized sketch
    table (pandas or pa.Table with depth/slot/n)."""
    import pandas as pd

    df = sketch.to_pandas() if not isinstance(sketch, pd.DataFrame) else sketch
    est = None
    for d in range(depth):
        slot = _hash60_str(f"{d}:{token}") % width
        row = df[(df.depth == d) & (df.slot == slot)]
        v = int(row.n.iloc[0]) if len(row) else 0
        est = v if est is None else min(est, v)
    return int(est or 0)


def viewers_not_purchasers(sf_dir: str) -> ray.data.Dataset:
    """Distributed set difference (EXCEPT) at (day, user) grain: user-days
    with ≥1 'view' and no 'purchase'.  One scan; the per-batch partial
    collapses to one row per (day, user) with max flags, so the exchange
    carries user-day rows, not events — the same flag-aggregation trick
    works for any k-way set algebra without materializing either side."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        t = pa.table({
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            "user_id": batch.column("user_id"),
            "viewed": pc.cast(pc.equal(et, "view"), pa.int64()),
            "purchased": pc.cast(pc.equal(et, "purchase"), pa.int64()),
        })
        res = t.group_by(["day", "user_id"]).aggregate([("viewed", "max"),
                                                        ("purchased", "max")])
        return pa.table({"day": res.column("day"),
                         "user_id": res.column("user_id"),
                         "viewed": res.column("viewed_max"),
                         "purchased": res.column("purchased_max")})

    def resolve(group: pa.Table) -> pa.Table:
        if (pc.max(group.column("viewed")).as_py() == 1
                and pc.max(group.column("purchased")).as_py() == 0):
            return group.slice(0, 1).select(["day", "user_id"])
        return group.slice(0, 0).select(["day", "user_id"])

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["day", "user_id"])
              .map_groups(resolve, batch_format="pyarrow"))


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_daily_pivot(sf_dir: str) -> ray.data.Dataset:
    """Pivot: per-day event counts widened to one column per event type —
    conditional partial sums inside map_batches (k indicator columns), then
    the standard tiny reduce; the exchange carries days × n_batches rows of
    k integers, never the raw events, and adding a type is adding a
    column, not a shuffle."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(batch.column("ts"), unit="day"),
                          format="%Y-%m-%d")
        et = batch.column("event_type")
        cols = {"day": day}
        for t in _EVENT_TYPES:
            cols[f"n_{t}"] = pc.cast(pc.equal(et, t), pa.int64())
        return pa.table(cols)

    return partial_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["day"],
        [(f"n_{t}", "sum", f"n_{t}") for t in _EVENT_TYPES])


# ---------------------------------------------------------------------------
# round-2 additions: outer join, sequence analytics, bloom semi-join,
# inverted index, per-key running max
# ---------------------------------------------------------------------------


def customer_urgent_order_counts(sf_dir: str) -> ray.data.Dataset:
    """LEFT OUTER equi-join: every customer row survives; customers with no
    URGENT orders keep zero counts.  Fact side pre-aggregates per custkey
    (partial combiners), then the generic groupby equi-join
    (``joins.shuffle_lookup_join(how="left")``) stamps the aggregate onto
    the dimension — unmatched rows carry typed NULLs, filled to 0 in a
    final vectorized pass.  Both sides shuffle once on the SAME key; no
    driver materialization."""
    from ..functions.joins import shuffle_lookup_join
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority", "o_totalprice"])

    def urgent_cents(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("o_orderpriority"),
                                  "1-URGENT"))
        tp = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
            "cents": pa.array(np.rint(tp * 100).astype(np.int64)),
        })

    agg = partial_aggregate(
        orders.map_batches(urgent_cents, batch_format="pyarrow"),
        ["o_custkey"],
        [("one", "sum", "n_urgent"), ("cents", "sum", "urgent_cents")])
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])
    joined = shuffle_lookup_join(
        cust, agg, on="c_custkey", right_on="o_custkey", how="left",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("c_mktsegment", pa.string())]),
        right_schema=pa.schema([("o_custkey", pa.int64()),
                                ("n_urgent", pa.int64()),
                                ("urgent_cents", pa.int64())]))

    def fill_zero(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "c_mktsegment": b.column("c_mktsegment"),
            "n_urgent": pc.fill_null(b.column("n_urgent"), 0),
            "urgent_cents": pc.fill_null(b.column("urgent_cents"), 0)})

    return joined.map_batches(fill_zero, batch_format="pyarrow")


def user_event_gaps(sf_dir: str) -> ray.data.Dataset:
    """LAG-style inter-event gap statistics per user: max/min gap and total
    active span in µs.  The consecutive-difference multiset over a user's
    sorted timestamps is tie-order invariant, so one per-key sort inside
    ``map_groups`` matches SQL's LAG window exactly; the exchange carries
    (user_id, ts) pairs only."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = np.sort(group.column("ts").to_numpy(zero_copy_only=False)
                     .astype("datetime64[us]").astype(np.int64))
        gaps = np.diff(ts)
        has = len(gaps) > 0
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "n_events": pa.array([len(ts)], pa.int64()),
            "max_gap_us": pa.array([int(gaps.max()) if has else None],
                                   pa.int64()),
            "min_gap_us": pa.array([int(gaps.min()) if has else None],
                                   pa.int64()),
            "span_us": pa.array([int(ts[-1] - ts[0])], pa.int64()),
        })

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def event_funnel(sf_dir: str, first_type: str = "view",
                 then_type: str = "purchase",
                 window_h: int = 24) -> ray.data.Dataset:
    """Sequential funnel: per user, the FIRST ``first_type`` event and the
    number of ``then_type`` events inside the following ``window_h``-hour
    window.  Early vectorized type filter (only funnel-relevant events
    shuffle), then one pass per user group — the standard conversion
    query that needs event-sequence semantics SQL expresses with a
    time-banded self-join."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])
    w_us = window_h * 3_600 * 1_000_000

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(
            batch.column("event_type"),
            value_set=pa.array([first_type, then_type])))

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        fts = ts[et == first_type]
        uid_t = group.column("user_id").type
        if len(fts) == 0:
            return pa.table({
                "user_id": pa.array([], uid_t),
                "first_view_ts": pa.array([], pa.timestamp("us")),
                "n_purchases_24h": pa.array([], pa.int64())})
        fv = int(fts.min())
        pts = ts[et == then_type]
        n = int(((pts >= fv) & (pts <= fv + w_us)).sum())
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "first_view_ts": pa.array(
                np.array([fv], dtype="datetime64[us]"), pa.timestamp("us")),
            "n_purchases_24h": pa.array([n], pa.int64())})

    return (ds.map_batches(keep, batch_format="pyarrow")
              .groupby("user_id")
              .map_groups(per_user, batch_format="pyarrow"))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) \
        & np.uint64(0xFFFFFFFFFFFFFFFF)
    return x ^ (x >> np.uint64(31))


def build_bloom_bits(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Vectorized Bloom insert: k double-hash probes per key into an
    ``m_bits``-bit array (uint64 words)."""
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    h1 = _splitmix64(keys.astype(np.uint64))
    h2 = _splitmix64(keys.astype(np.uint64) ^ np.uint64(0xDEADBEEF)) \
        | np.uint64(1)
    for i in range(k):
        h = ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.uint64)
        np.bitwise_or.at(bits, (h >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (h & np.uint64(63)))
    return bits


def bloom_probe(keys: np.ndarray, bits: np.ndarray, m_bits: int,
                k: int) -> np.ndarray:
    """Vectorized membership probe: True where ALL k probe bits are set
    (may include false positives, never false negatives)."""
    h1 = _splitmix64(keys.astype(np.uint64))
    h2 = _splitmix64(keys.astype(np.uint64) ^ np.uint64(0xDEADBEEF)) \
        | np.uint64(1)
    ok = np.ones(len(keys), dtype=bool)
    for i in range(k):
        h = ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.uint64)
        word = bits[(h >> np.uint64(6)).astype(np.int64)]
        ok &= (word >> (h & np.uint64(63))) & np.uint64(1) != 0
    return ok


def bloom_semi_volume(sf_dir: str, p_type: str = "PROMO",
                      m_bits: int = 1 << 17, k: int = 5) -> ray.data.Dataset:
    """Bloom-filter-accelerated semi-join: lineitem volume for parts of one
    type.  The filtered part keys fold into a 16 KiB Bloom bitmap
    (per-batch partial bitmaps, OR-merged — the fold input is one small
    binary row per block, bounded by block count, NOT by key count), the
    bitmap broadcasts via ``ray.put``, and the fact scan drops ~everything
    BEFORE the exact shuffled semi-join (``shuffle_lookup_join`` on the
    surviving rows removes bloom false positives).  At 100 TB this is the
    standard pattern when the build side exceeds the broadcast budget:
    16 KiB prunes the shuffle instead of shipping the key set."""
    from ..functions.joins import shuffle_lookup_join
    part = read_parquet_clean(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_type"])

    def part_keys(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("p_type"), p_type)) \
            .select(["p_partkey"])

    keys_ds = part.map_batches(part_keys, batch_format="pyarrow")

    def to_bitmap(b: pa.Table) -> pa.Table:
        ks = b.column("p_partkey").to_numpy(zero_copy_only=False)
        return pa.table({"bits": pa.array(
            [build_bloom_bits(ks, m_bits, k).tobytes()], pa.binary())})

    bitmap = np.zeros(m_bits // 64, dtype=np.uint64)
    for row in keys_ds.map_batches(to_bitmap,
                                   batch_format="pyarrow").take_all():
        bitmap |= np.frombuffer(row["bits"], dtype=np.uint64)
    bm_ref = ray.put(bitmap)

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_returnflag", "l_quantity"])

    def prune(batch: pa.Table) -> pa.Table:
        bits = ray.get(bm_ref)
        ks = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(bloom_probe(ks, bits, m_bits, k)))

    survivors = li.map_batches(prune, batch_format="pyarrow")
    verified = shuffle_lookup_join(
        survivors, keys_ds, on="l_partkey", right_on="p_partkey",
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("l_returnflag", pa.string()),
                               ("l_quantity", pa.float64())]),
        right_schema=pa.schema([("p_partkey", pa.int64())]))

    def qty(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "one": pa.array(np.ones(len(b), dtype=np.int64)),
            "qty": pa.array(q.astype(np.int64))})

    return partial_aggregate(
        verified.map_batches(qty, batch_format="pyarrow"),
        ["l_returnflag"],
        [("one", "sum", "n_items"), ("qty", "sum", "sum_qty")])


def token_postings(sf_dir: str, min_df: int = 100) -> ray.data.Dataset:
    """Inverted-index construction: (token, doc_id) posting pairs for
    tokens whose document frequency reaches ``min_df``.  Tokens explode
    vectorized (``split_pattern`` + ``list_parent_indices``), each batch
    emits DISTINCT local pairs, and one shuffle on token both dedups
    globally and applies the df threshold — the exchange carries distinct
    pairs, never raw token occurrences."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(batch.column("text"), " ")
        toks = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        docs = pc.take(batch.column("doc_id"), parent)
        t = pa.table({"token": toks, "doc_id": docs})
        res = t.group_by(["token", "doc_id"]).aggregate([])
        return res.select(["token", "doc_id"])

    def per_token(group: pa.Table) -> pa.Table:
        docs = pc.unique(group.column("doc_id"))
        if len(docs) < min_df:
            return group.slice(0, 0).select(["token", "doc_id"])
        n = len(docs)
        return pa.table({
            "token": pa.array([group.column("token")[0].as_py()] * n),
            "doc_id": docs})

    return (ds.map_batches(pairs, batch_format="pyarrow")
              .groupby("token")
              .map_groups(per_token, batch_format="pyarrow"))


def user_record_events(sf_dir: str) -> ray.data.Dataset:
    """Per-key running-max filter ("record" events): events whose value
    strictly exceeds every earlier value for the same user, ordered by
    (ts, event_id) for deterministic ties.  One shuffle on user_id; the
    per-group kernel is a lexsort + cumulative max (no Python loop).
    Pure comparisons on the stored doubles — no float arithmetic — so the
    output hashes identically to SQL's windowed MAX OVER PRECEDING."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        val = group.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        v = val[order]
        prev_max = np.maximum.accumulate(
            np.concatenate([[-np.inf], v]))[:-1]
        keep = order[v > prev_max]
        return pa.table({
            "user_id": pc.take(group.column("user_id"), pa.array(keep)),
            "ts": pc.take(group.column("ts"), pa.array(keep)),
            "event_id": pc.take(group.column("event_id"), pa.array(keep)),
            "value": pc.take(group.column("value"), pa.array(keep))})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def events_json_k_stats(sf_dir: str) -> ray.data.Dataset:
    """Semi-structured field extraction: pull the integer ``k`` out of the
    JSON ``props`` column with Arrow's vectorized RE2 kernel
    (``extract_regex`` — compiled once, no per-row Python JSON parse),
    then the standard partial-agg reduce per event type."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        keep = pc.is_valid(k)
        return pa.table({
            "event_type": batch.column("event_type"),
            "k": k,
            "one": pa.array(np.ones(len(batch), dtype=np.int64)),
        }).filter(keep)

    return partial_aggregate(
        ds.map_batches(extract, batch_format="pyarrow"), ["event_type"],
        [("one", "sum", "n_events"), ("k", "sum", "sum_k"),
         ("k", "min", "min_k"), ("k", "max", "max_k")])


def orders_cube(sf_dir: str) -> ray.data.Dataset:
    """CUBE (all 2² grouping sets) over (order year, priority) from ONE
    scan: finest-grain partial-agg, then each finest row expands into the
    four grouping sets and re-aggregates — the raw table is read once and
    the exchanges only carry aggregate rows ('ALL' = subtotal sentinel,
    matching GROUP BY CUBE + COALESCE)."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_orderpriority"])

    def bucket(batch: pa.Table) -> pa.Table:
        yr = pc.strftime(batch.column("o_orderdate"), format="%Y")
        return pa.table({"grp_year": yr,
                         "grp_priority": batch.column("o_orderpriority"),
                         "one": pa.array(np.ones(len(batch),
                                                 dtype=np.int64))})

    finest = partial_aggregate(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["grp_year", "grp_priority"], [("one", "sum", "n_orders")])

    def expand(batch: pa.Table) -> pa.Table:
        n = len(batch)
        all_s = pa.array(["ALL"] * n, pa.string())
        out = [batch,
               pa.table({"grp_year": batch.column("grp_year"),
                         "grp_priority": all_s,
                         "n_orders": batch.column("n_orders")}),
               pa.table({"grp_year": all_s,
                         "grp_priority": batch.column("grp_priority"),
                         "n_orders": batch.column("n_orders")}),
               pa.table({"grp_year": all_s, "grp_priority": all_s,
                         "n_orders": batch.column("n_orders")})]
        return pa.concat_tables(out)

    return partial_aggregate(
        finest.map_batches(expand, batch_format="pyarrow"),
        ["grp_year", "grp_priority"], [("n_orders", "sum", "n_orders")])


def _best_per_user(batch: pa.Table) -> pa.Table:
    """Lexicographic argmax (value DESC, event_id ASC) per user — used as
    both the per-batch combiner and the per-group reducer, because argmax
    with a deterministic tie-break is distributive."""
    uid = batch.column("user_id").to_numpy(zero_copy_only=False)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    val = batch.column("best_value").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, -val))
    first = np.unique(uid[order], return_index=True)[1]
    keep = pa.array(np.sort(order[first]))
    return pa.table({"user_id": pc.take(batch.column("user_id"), keep),
                     "event_id": pc.take(batch.column("event_id"), keep),
                     "best_value": pc.take(batch.column("best_value"),
                                           keep)})


def user_best_event(sf_dir: str) -> ray.data.Dataset:
    """Distributive ARG-MAX aggregate: each user's single best event
    (max value; ties → smallest event_id).  The per-batch combiner emits
    at most one row per (user, batch), so the exchange carries candidates,
    never raw events, and the per-group reduce applies the identical
    lexsort pick — no window-function sort of the full table."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        return _best_per_user(pa.table({
            "user_id": batch.column("user_id"),
            "event_id": batch.column("event_id"),
            "best_value": batch.column("value")}))

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("user_id")
              .map_groups(_best_per_user, batch_format="pyarrow"))


def cohort_retention(sf_dir: str) -> ray.data.Dataset:
    """Weekly cohort retention: users grouped by the week of their first
    'signup' event; for each week offset ≥ 0, how many of the cohort were
    active (any event).  Weeks are bucketed vectorized BEFORE the shuffle
    (Arrow floor_temporal, Monday-start — matches date_trunc('week')),
    each user group emits its DISTINCT (cohort_week, offset) pairs, and the
    count reduce is exact because a user contributes each pair once."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])
    WEEK_US = 7 * 86_400 * 1_000_000

    def to_weeks(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "week": pc.floor_temporal(batch.column("ts"), unit="week"),
            "is_signup": pc.equal(batch.column("event_type"), "signup")})

    def per_user(group: pa.Table) -> pa.Table:
        wk = group.column("week").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        sg = group.column("is_signup").to_numpy(zero_copy_only=False)
        empty = pa.table({
            "cohort_week": pa.array([], pa.timestamp("us")),
            "week_offset": pa.array([], pa.int64()),
            "one": pa.array([], pa.int64())})
        if not sg.any():
            return empty
        cw = wk[sg].min()
        offs = np.unique((wk[wk >= cw] - cw) // WEEK_US)
        return pa.table({
            "cohort_week": pa.array(
                np.full(len(offs), cw, dtype=np.int64)
                .astype("datetime64[us]"), pa.timestamp("us")),
            "week_offset": pa.array(offs, pa.int64()),
            "one": pa.array(np.ones(len(offs), dtype=np.int64))})

    pairs = (ds.map_batches(to_weeks, batch_format="pyarrow")
               .groupby("user_id")
               .map_groups(per_user, batch_format="pyarrow"))
    return partial_aggregate(pairs, ["cohort_week", "week_offset"],
                             [("one", "sum", "n_users")])


def lang_char_trigrams(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    """Character-trigram language profile: top-k char 3-grams per lang —
    the classic n-gram LM / language-ID feature build.  Per batch, all
    texts concatenate into ONE byte buffer; sliding 3-byte windows are
    packed into int codes with stride tricks and windows crossing document
    boundaries are masked out — no per-row Python.  Exchange carries
    (lang, code) partial counts; the final per-lang rank is a tiny
    map_groups."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        lens = pc.binary_length(texts).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        langs = batch.column("lang")
        buf = np.frombuffer(
            "".join(texts.to_pylist()).encode("ascii"), dtype=np.uint8) \
            .astype(np.int64)
        if len(buf) < 3:
            return pa.table({"lang": pa.array([], pa.string()),
                             "code": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        codes = buf[:-2] * 65536 + buf[1:-1] * 256 + buf[2:]
        ends = np.cumsum(lens)
        starts = ends - lens
        # valid window start positions: within a doc, ≥3 chars remaining
        doc_of = np.repeat(np.arange(len(lens)), lens)[:len(codes)]
        valid = np.arange(len(codes)) + 3 <= ends[doc_of]
        t = pa.table({
            "lang": pc.take(langs, pa.array(doc_of[valid])),
            "code": pa.array(codes[valid], pa.int64())})
        res = t.group_by(["lang", "code"]).aggregate([("code", "count")])
        return pa.table({"lang": res.column("lang"),
                         "code": res.column("code"),
                         "n": pc.cast(res.column("code_count"), pa.int64())})

    counts = partial_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "code"], [("n", "sum", "n")])

    def rank_lang(group: pa.Table) -> pa.Table:
        code = group.column("code").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((code, -n))[:k]
        tris = ["".join(chr((c >> s) & 0xFF) for s in (16, 8, 0))
                for c in code[order]]
        return pa.table({
            "lang": pa.array([group.column("lang")[0].as_py()] * len(order)),
            "tri": pa.array(tris, pa.string()),
            "n": pa.array(n[order], pa.int64()),
            "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64))})

    return counts.groupby("lang").map_groups(rank_lang,
                                             batch_format="pyarrow")


def frequent_token_pairs(sf_dir: str,
                         min_support: int = 50) -> ray.data.Dataset:
    """Frequent itemset mining (2-itemsets): token pairs co-occurring in
    ≥ ``min_support`` documents.  Per batch: distinct (doc, token) pairs
    sort by (doc, token); unordered pairs materialize via shifted-array
    passes (pair (t[i], t[i+s]) where both positions share a doc — tokens
    are sorted so t[i] < t[i+s] for free), one vectorized pass per shift,
    bounded by the per-doc distinct-token count, not the doc count.  The
    exchange carries per-batch pair counts only."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def pair_counts(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(batch.column("text"), " ")
        toks = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        t = pa.table({"d": parent, "tok": toks})
        dt = t.group_by(["d", "tok"]).aggregate([])
        d = dt.column("d").to_numpy(zero_copy_only=False)
        tok = np.asarray(dt.column("tok").to_pylist(), dtype=object)
        order = np.lexsort((tok, d))
        d, tok = d[order], tok[order]
        tas, tbs = [], []
        _, counts = np.unique(d, return_counts=True)
        max_len = int(counts.max()) if len(counts) else 0
        for s in range(1, max_len):
            same = d[:-s] == d[s:] if s < len(d) else np.array([], bool)
            tas.append(tok[:-s][same])
            tbs.append(tok[s:][same])
        if not tas:
            return pa.table({"ta": pa.array([], pa.string()),
                             "tb": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        p = pa.table({"ta": pa.array(np.concatenate(tas), pa.string()),
                      "tb": pa.array(np.concatenate(tbs), pa.string())})
        res = p.group_by(["ta", "tb"]).aggregate([("ta", "count")])
        return pa.table({"ta": res.column("ta"), "tb": res.column("tb"),
                         "n": pc.cast(res.column("ta_count"), pa.int64())})

    counts = partial_aggregate(
        ds.map_batches(pair_counts, batch_format="pyarrow"),
        ["ta", "tb"], [("n", "sum", "n")])
    return counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n"), min_support)),
        batch_format="pyarrow")


def order_status_transitions(sf_dir: str) -> ray.data.Dataset:
    """Markov transition counts over each customer's order-status sequence
    (orders sorted by (date, orderkey) per customer, consecutive pairs
    counted globally).  The per-group kernel emits LOCAL pair counts
    (≤ |statuses|² rows), so the final exchange carries tiny partials."""
    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus"])

    def per_customer(group: pa.Table) -> pa.Table:
        dt = group.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ok = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        st = np.asarray(group.column("o_orderstatus").to_pylist(),
                        dtype=object)
        order = np.lexsort((ok, dt))
        s = st[order]
        if len(s) < 2:
            return pa.table({"from_status": pa.array([], pa.string()),
                             "to_status": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        p = pa.table({"from_status": pa.array(s[:-1], pa.string()),
                      "to_status": pa.array(s[1:], pa.string())})
        res = p.group_by(["from_status", "to_status"]) \
            .aggregate([("from_status", "count")])
        return pa.table({
            "from_status": res.column("from_status"),
            "to_status": res.column("to_status"),
            "n": pc.cast(res.column("from_status_count"), pa.int64())})

    partials = ds.groupby("o_custkey").map_groups(per_customer,
                                                  batch_format="pyarrow")
    return partial_aggregate(partials, ["from_status", "to_status"],
                             [("n", "sum", "n")])


def doc_length_histogram(sf_dir: str, bin_width: int = 100
                         ) -> ray.data.Dataset:
    """Fixed-width integer histogram of document lengths: bin = n_chars //
    bin_width, with per-bin count and exact min/max — pure integer
    arithmetic so the SQL oracle hashes identically."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["n_chars"])

    def bucket(batch: pa.Table) -> pa.Table:
        n = batch.column("n_chars").to_numpy(zero_copy_only=False)
        return pa.table({
            "bin": pa.array(n // bin_width, pa.int64()),
            "n_chars": batch.column("n_chars"),
            "one": pa.array(np.ones(len(batch), dtype=np.int64))})

    return partial_aggregate(
        ds.map_batches(bucket, batch_format="pyarrow"), ["bin"],
        [("one", "sum", "n_docs"), ("n_chars", "min", "min_chars"),
         ("n_chars", "max", "max_chars")])


def doc_repetition_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-document repetition quality signals (Gopher-style) — a pure
    vectorized map, no exchange.  Kernel in
    ``functions.text.repetition_stats_batch``."""
    from ..functions.text import repetition_stats_batch
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    return ds.map_batches(repetition_stats_batch, batch_format="pyarrow")


def small_qty_part_revenue(sf_dir: str,
                           brand: str = "Brand#1") -> ray.data.Dataset:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20 % of the per-part average, for one brand's parts.  Pattern at
    100 TB: (1) the dimension filter yields a SMALL key set (one brand =
    1/25 of part) — broadcast it, semi-filter the fact scan ONCE and
    materialize the survivors (tiny fraction of lineitem); (2) per-part
    (sum_qty, cnt) via partial aggregation — the exchange carries
    per-batch partials; (3) the per-part stats table (≤ |brand parts|
    rows) broadcasts back and the survivors filter locally with the
    integer predicate 5·qty·cnt < sum_qty ⟺ qty < 0.2·avg(qty), then a
    scalar fold.  lineitem is scanned exactly once; nothing unbounded
    touches the driver."""
    part = read_parquet_clean(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_brand"])
    key_rows = part.map_batches(
        lambda b: b.filter(pc.equal(b.column("p_brand"), brand))
                   .select(["p_partkey"]),
        batch_format="pyarrow").take_all()  # bounded: one brand
    keys = pa.array(sorted(r["p_partkey"] for r in key_rows), pa.int64())
    keys_ref = ray.put(keys)

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def semi(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column("l_partkey"),
                                  value_set=ray.get(keys_ref)))
        q = t.column("l_quantity").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = np.rint(t.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return pa.table({"l_partkey": t.column("l_partkey"),
                         "q": pa.array(q), "cents": pa.array(cents)})

    survivors = li.map_batches(semi, batch_format="pyarrow").materialize()

    stats = partial_aggregate(
        survivors.map_batches(
            lambda b: pa.table({"l_partkey": b.column("l_partkey"),
                                "q": b.column("q"),
                                "one": pa.array(np.ones(len(b), np.int64))}),
            batch_format="pyarrow"),
        ["l_partkey"],
        [("q", "sum", "sum_q"), ("one", "sum", "cnt")]).take_all()
    pk = np.array([r["l_partkey"] for r in stats], np.int64)
    order = np.argsort(pk)
    side = (pk[order],
            np.array([r["sum_q"] for r in stats], np.int64)[order],
            np.array([r["cnt"] for r in stats], np.int64)[order])
    stats_ref = ray.put(side)

    def fold_small(batch: pa.Table) -> pa.Table:
        spk, ssq, scn = ray.get(stats_ref)
        k = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(spk, k)  # every k present by construction
        q = batch.column("q").to_numpy(zero_copy_only=False)
        keep = 5 * q * scn[pos] < ssq[pos]
        c = batch.column("cents").to_numpy(zero_copy_only=False)
        return pa.table({
            "revenue_cents": pa.array([int(c[keep].sum())], pa.int64()),
            "n_rows": pa.array([int(keep.sum())], pa.int64()),
            "_k": pa.array([0], pa.int64())})

    partials = survivors.map_batches(fold_small, batch_format="pyarrow")
    out = partial_aggregate(partials, ["_k"],
                            [("revenue_cents", "sum", "revenue_cents"),
                             ("n_rows", "sum", "n_rows")])
    return out.select_columns(["revenue_cents", "n_rows"])


_BM25_TERMS = ("join", "filter", "scan")


def bm25_top_docs(sf_dir: str, terms: tuple = _BM25_TERMS,
                  k: int = 20) -> ray.data.Dataset:
    """Integral BM25-variant retrieval: two passes over documents.
    Pass 1 reduces corpus stats to ONE row (N, total token count, per-term
    document frequency — a scalar fold of per-batch partials); pass 2
    broadcasts the stats and scores every document with pure int64
    arithmetic, then a distributed top-k (per-batch local top-k → global
    sort+limit on ≤ k·n_blocks rows).  Score per doc:
        L     = (dl · 1000 · N) // A          (≈ 1000 · dl / avgdl)
        idf_t = (1000 · N) // df_t
        sat_t = (tf · 3000) // (tf · 1000 + 500 + L)   (BM25-style
                saturation with length normalization in the denominator)
        score = Σ_t idf_t · sat_t
    Integer-exact, so the DuckDB oracle hashes identically."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cols = {"n_docs": pa.array([len(batch)], pa.int64()),
                "total_tokens": pa.array([int(nt.sum())], pa.int64()),
                "_k": pa.array([0], pa.int64())}
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        for t in terms:
            hit = pc.equal(flat, t).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            per_doc = np.zeros(len(batch), dtype=np.int64)
            np.add.at(per_doc, parents, hit)
            cols[f"df_{t}"] = pa.array([int((per_doc > 0).sum())], pa.int64())
        return pa.table(cols)

    aggs = [("n_docs", "sum", "n_docs"), ("total_tokens", "sum", "A")]
    aggs += [(f"df_{t}", "sum", f"df_{t}") for t in terms]
    srow = partial_aggregate(
        ds.map_batches(stats_partial, batch_format="pyarrow"),
        ["_k"], aggs).take_all()[0]
    n_docs, a_total = int(srow["n_docs"]), int(srow["A"])
    dfs = [max(1, int(srow[f"df_{t}"])) for t in terms]
    side_ref = ray.put((n_docs, a_total, dfs))

    def score(batch: pa.Table) -> pa.Table:
        n, a, df = ray.get(side_ref)
        toks = pc.split_pattern(batch.column("text"), " ")
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        big_l = (dl * 1000 * n) // a
        total = np.zeros(len(batch), dtype=np.int64)
        for t, d in zip(terms, df):
            hit = pc.equal(flat, t).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            tf = np.zeros(len(batch), dtype=np.int64)
            np.add.at(tf, parents, hit)
            idf = (1000 * n) // d
            sat = (tf * 3000) // (tf * 1000 + 500 + big_l)
            total += idf * sat
        out = pa.table({"doc_id": batch.column("doc_id"),
                        "score": pa.array(total)})
        out = out.filter(pc.greater(out.column("score"), 0))
        # local top-k so the global sort sees ≤ k rows per block
        idx = pa.table({"s": out.column("score"), "d": out.column("doc_id")})
        srt = idx.sort_by([("s", "descending"), ("d", "ascending")]) \
            .slice(0, k)
        return pa.table({"doc_id": srt.column("d"),
                         "score": srt.column("s")})

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score", "doc_id"],
                       descending=[True, False]).limit(k)


def user_value_trend(sf_dir: str) -> ray.data.Dataset:
    """Per-user linear trend of event value over time via DISTRIBUTED
    sufficient statistics: each batch folds (n, Σx, Σy, Σxy, Σx²) per user
    with x = days since 2024-01-01 (int) and y = value cents (int); the
    exchange carries only per-batch per-user partials.  The slope
    num/den = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) ships as exact integers —
    the consumer divides (or compares sign) without float drift."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])
    origin = np.datetime64("2024-01-01", "D").astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        x = (batch.column("ts").to_numpy(zero_copy_only=False)
             .astype("datetime64[D]").astype(np.int64) - origin)
        y = np.rint(batch.column("value").to_numpy(zero_copy_only=False)
                    * 100).astype(np.int64)
        t = pa.table({"user_id": batch.column("user_id"),
                      "one": pa.array(np.ones(len(batch), np.int64)),
                      "x": pa.array(x), "y": pa.array(y),
                      "xy": pa.array(x * y), "xx": pa.array(x * x)})
        return t.group_by(["user_id"]).aggregate(
            [("one", "sum"), ("x", "sum"), ("y", "sum"),
             ("xy", "sum"), ("xx", "sum")]).rename_columns(
            ["user_id", "n_events", "sum_x", "sum_y", "sum_xy", "sum_xx"])

    folded = partial_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["user_id"],
        [("n_events", "sum", "n_events"), ("sum_x", "sum", "sum_x"),
         ("sum_y", "sum", "sum_y"), ("sum_xy", "sum", "sum_xy"),
         ("sum_xx", "sum", "sum_xx")])

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_events").to_numpy(zero_copy_only=False)
        sx = b.column("sum_x").to_numpy(zero_copy_only=False)
        sy = b.column("sum_y").to_numpy(zero_copy_only=False)
        sxy = b.column("sum_xy").to_numpy(zero_copy_only=False)
        sxx = b.column("sum_xx").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "n_events": b.column("n_events"),
            "sum_x": b.column("sum_x"), "sum_y": b.column("sum_y"),
            "trend_num": pa.array(n * sxy - sx * sy),
            "trend_den": pa.array(n * sxx - sx * sx)})

    return folded.map_batches(finish, batch_format="pyarrow")


def views_purchases_full(sf_dir: str) -> ray.data.Dataset:
    """FULL OUTER join shape at (day, user) grain: per-day per-user view
    counts vs purchase counts, keeping keys present on EITHER side with
    zero-fill.  Because each side contributes at most one row per key
    after its own partial aggregation, the full-outer join IS a union +
    groupby-sum of zero-padded partials — no join operator, one exchange,
    no driver materialization, and no null-handling edge cases at scale."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(batch.column("ts"), unit="day"),
                      pa.timestamp("us"))
        et = batch.column("event_type")
        is_v = pc.cast(pc.equal(et, "view"), pa.int64())
        is_p = pc.cast(pc.equal(et, "purchase"), pa.int64())
        t = pa.table({"day": day, "user_id": batch.column("user_id"),
                      "v": is_v, "p": is_p})
        t = t.filter(pc.greater(pc.add(t.column("v"), t.column("p")), 0))
        return t

    counted = partial_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day", "user_id"],
        [("v", "sum", "n_views"), ("p", "sum", "n_purchases")])
    return counted


def daily_revenue_moving7(sf_dir: str) -> ray.data.Dataset:
    """Trailing 7-day moving revenue sum: the raw scan folds to ONE row
    per calendar day (partial-agg — bounded by the date range, ~2.5k days
    at any corpus size), and only that bounded aggregate flows through the
    single-group windowing kernel.  The window math itself is a vectorized
    cumsum difference."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(batch.column("o_orderdate"),
                                        unit="day"), pa.timestamp("us"))
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.table({"day": day, "cents": pa.array(cents),
                         "_k": pa.array(np.zeros(len(batch), np.int64))})

    daily = partial_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day", "_k"], [("cents", "sum", "revenue_cents")])

    def window(group: pa.Table) -> pa.Table:
        day = group.column("day").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        rev = group.column("revenue_cents").to_numpy(zero_copy_only=False)
        order = np.argsort(day)
        day, rev = day[order], rev[order]
        csum = np.concatenate([[0], np.cumsum(rev)])
        # trailing window includes days within [d-6, d]; days are dense in
        # TPC-H but handle gaps exactly via searchsorted on day values
        lo = np.searchsorted(day, day - 6, side="left")
        mov = csum[np.arange(1, len(day) + 1)] - csum[lo]
        return pa.table({
            "day": pa.array(day.astype("datetime64[D]")
                            .astype("datetime64[us]")),
            "revenue_cents": pa.array(rev),
            "moving7_cents": pa.array(mov)})

    return daily.groupby("_k").map_groups(window, batch_format="pyarrow") \
        .select_columns(["day", "revenue_cents", "moving7_cents"])


def global_event_rank(sf_dir: str) -> ray.data.Dataset:
    """Distributed zipWithIndex: the exact global rank of every event
    under ORDER BY (ts, event_id), without a single-node sort.  Pattern:
    (1) per-day counts via partial aggregation (bounded: calendar days);
    (2) driver computes exclusive prefix sums over the ~tiny day table
    and broadcasts them; (3) ``groupby(day).map_groups`` sorts each
    bucket locally and stamps offset + local position.  Rank assignment
    is bucket-parallel; no global exchange beyond the day groupby."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_id"])
    origin = np.datetime64("1970-01-01", "D").astype(np.int64)

    def day_partial(batch: pa.Table) -> pa.Table:
        day = (batch.column("ts").to_numpy(zero_copy_only=False)
               .astype("datetime64[D]").astype(np.int64) - origin)
        return pa.table({"day": pa.array(day),
                         "one": pa.array(np.ones(len(batch), np.int64))})

    daily = partial_aggregate(
        ds.map_batches(day_partial, batch_format="pyarrow"),
        ["day"], [("one", "sum", "n")]).take_all()  # bounded: ~days
    days = np.array([r["day"] for r in daily], np.int64)
    ns = np.array([r["n"] for r in daily], np.int64)
    order = np.argsort(days)
    days, ns = days[order], ns[order]
    offsets = np.concatenate([[0], np.cumsum(ns)[:-1]])
    side_ref = ray.put((days, offsets))

    def add_day(batch: pa.Table) -> pa.Table:
        day = (batch.column("ts").to_numpy(zero_copy_only=False)
               .astype("datetime64[D]").astype(np.int64) - origin)
        return batch.append_column("day", pa.array(day))

    def stamp(group: pa.Table) -> pa.Table:
        sdays, soffs = ray.get(side_ref)
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        local = np.lexsort((eid, ts))
        rnk = np.empty(len(group), dtype=np.int64)
        base = soffs[np.searchsorted(sdays, group.column("day")[0].as_py())]
        rnk[local] = base + 1 + np.arange(len(group), dtype=np.int64)
        return pa.table({"event_id": group.column("event_id"),
                         "rnk": pa.array(rnk)})

    return ds.map_batches(add_day, batch_format="pyarrow") \
        .groupby("day").map_groups(stamp, batch_format="pyarrow")


def user_top_event_type(sf_dir: str) -> ray.data.Dataset:
    """Grouped MODE: each user's most frequent event type (ties → type
    asc).  Two-level distributive plan: per-batch (user, type) counts →
    groupby-sum partials → per-batch local argmax (≤ 1 row per user per
    batch) → per-user final argmax.  The exchange never carries raw
    events, and the mode pick is a deterministic lexicographic reduce."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def count_partial(batch: pa.Table) -> pa.Table:
        t = batch.append_column(
            "one", pa.array(np.ones(len(batch), np.int64)))
        res = t.group_by(["user_id", "event_type"]).aggregate([("one", "sum")])
        return pa.table({"user_id": res.column("user_id"),
                         "top_type": res.column("event_type"),
                         "n": res.column("one_sum")})

    counts = partial_aggregate(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        ["user_id", "top_type"], [("n", "sum", "n")])

    def best(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        typ = np.asarray(batch.column("top_type").to_pylist(), dtype=object)
        order = np.lexsort((typ, -n))
        first = np.unique(uid[order], return_index=True)[1]
        keep = pa.array(np.sort(order[first]))
        return pa.table({"user_id": pc.take(batch.column("user_id"), keep),
                         "top_type": pc.take(batch.column("top_type"), keep),
                         "n": pc.take(batch.column("n"), keep)})

    return (counts.map_batches(best, batch_format="pyarrow")
                  .groupby("user_id")
                  .map_groups(best, batch_format="pyarrow"))


def heavy_hitter_tokens(sf_dir: str, threshold: int = 800,
                        per_batch_top: int = 256) -> ray.data.Dataset:
    """Exact heavy hitters (tokens with global count ≥ threshold) via the
    two-pass sketch-then-verify pattern: pass 1 keeps each batch's top-M
    local token counts and the M-th (dropped) count as that batch's error
    cap — a token absent from EVERY batch's top-M has global count
    ≤ Σ caps, so if Σ caps < threshold the candidate set is provably
    complete.  Pass 2 recounts ONLY the candidates exactly (broadcast
    id set, bounded by M · n_blocks) and filters ≥ threshold.  If the
    guarantee ever fails (Σ caps ≥ threshold), fall back to the exact
    full groupby — correctness is never sampled away.  Oracle-exact by
    construction."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def local_top(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        res = pa.table({"token": toks}).group_by(["token"]) \
            .aggregate([("token", "count")])
        n = res.column("token_count").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cap = 0
        if len(n) > per_batch_top:
            keep_idx = np.argpartition(-n, per_batch_top)[:per_batch_top]
            cap = int(np.delete(n, keep_idx).max())
            res = res.take(pa.array(np.sort(keep_idx)))
        tok = res.column("token")
        return pa.table({
            "token": pa.concat_arrays(
                [tok.combine_chunks(), pa.array([None], tok.type)]),
            "cap": pa.array([0] * len(res) + [cap], pa.int64())})

    cand_rows = ds.map_batches(local_top, batch_format="pyarrow") \
        .materialize()
    caps_sum = 0
    cand: set = set()
    for b in cand_rows.iter_batches(batch_format="pyarrow",
                                    batch_size=8192):
        toks = b.column("token")
        null = pc.is_null(toks)
        caps_sum += int(pc.sum(pc.if_else(
            null, b.column("cap"), pa.scalar(0, pa.int64()))).as_py() or 0)
        cand.update(b.filter(pc.invert(null)).column("token").to_pylist())

    ds2 = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["text"])
    if caps_sum >= threshold:  # pragma: no cover - guarantee never fails
        # at this vocabulary scale; exactness is preserved regardless
        cand_ref = None
    else:
        cand_ref = ray.put(pa.array(sorted(cand)))

    def recount(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        if cand_ref is not None:
            toks = toks.filter(pc.is_in(toks, value_set=ray.get(cand_ref)))
        res = pa.table({"token": toks}).group_by(["token"]) \
            .aggregate([("token", "count")])
        return pa.table({"token": res.column("token"),
                         "n": pc.cast(res.column("token_count"),
                                      pa.int64())})

    counts = partial_aggregate(
        ds2.map_batches(recount, batch_format="pyarrow"),
        ["token"], [("n", "sum", "n")])
    return counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n"), threshold)),
        batch_format="pyarrow")


def price_quartile_volumes(sf_dir: str) -> ray.data.Dataset:
    """Value-threshold quartile bucketing: exact quartile boundaries via
    the distributed histogram-refinement selection (one extra scan family,
    never a global sort), boundaries broadcast, rows bucketed with one
    searchsorted per batch, volumes reduced with partial aggregation.
    Bucket b = number of quartile boundaries strictly below the value —
    deterministic under ties, unlike SQL NTILE."""
    from ..functions.quantiles import exact_quantiles
    price = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                               columns=["l_extendedprice"])
    qt = exact_quantiles(price, "l_extendedprice", qs=(0.25, 0.5, 0.75),
                         collect_cap=10_000)
    bounds = np.sort(np.asarray(qt.column("value").to_pylist(),
                                dtype=np.float64))
    b_ref = ray.put(bounds)

    def bucket(batch: pa.Table) -> pa.Table:
        bs = ray.get(b_ref)
        v = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        bk = np.searchsorted(bs, v, side="left")   # boundaries < v
        cents = np.rint(v * 100).astype(np.int64)
        return pa.table({"bucket": pa.array(bk.astype(np.int64)),
                         "one": pa.array(np.ones(len(batch), np.int64)),
                         "cents": pa.array(cents)})

    return partial_aggregate(
        price.map_batches(bucket, batch_format="pyarrow"),
        ["bucket"], [("one", "sum", "n_rows"), ("cents", "sum", "sum_cents")])


def session_duration_stats(sf_dir: str,
                           gap_seconds: int = 1800) -> ray.data.Dataset:
    """Per-user session DURATION statistics (sessionize_events counts
    sessions; this measures them): sessions split at > gap_seconds
    silences, per user emit session count, total and longest session
    duration in exact microseconds.  Same single groupby(user) exchange —
    the per-group kernel is a vectorized diff/split."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = np.sort(group.column("ts").to_numpy(zero_copy_only=False)
                     .astype("datetime64[us]").astype(np.int64))
        gaps = np.diff(ts)
        brk = np.nonzero(gaps > gap_seconds * 1_000_000)[0]
        starts = np.concatenate([[0], brk + 1])
        ends = np.concatenate([brk, [len(ts) - 1]])
        durs = ts[ends] - ts[starts]
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "n_sessions": pa.array([len(durs)], pa.int64()),
            "total_dur_us": pa.array([int(durs.sum())], pa.int64()),
            "longest_dur_us": pa.array([int(durs.max())], pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def token_offset_packing(sf_dir: str,
                         chunk_tokens: int = 4096,
                         id_bucket: int = 1024) -> ray.data.Dataset:
    """Sequence-packing offsets for LLM pretraining: documents concatenate
    in doc_id order into one token stream chunked every ``chunk_tokens``;
    each doc gets its global start offset and chunk id (docs may straddle
    chunk boundaries — the GPT-style concat-then-chunk regime).  The
    global prefix sum is distributed exactly like ``global_event_rank``:
    per-id-range token counts reduce to a tiny table, the driver prefix-
    sums it, and each range stamps its docs bucket-parallel (requires the
    corpus's dense integer doc_id — the row-group ordinal any Lance/
    parquet corpus carries)."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def bucket_tokens(batch: pa.Table) -> pa.Table:
        nt = pc.list_value_length(pc.split_pattern(batch.column("text"),
                                                   " "))
        return pa.table({
            "bucket": pa.array(
                batch.column("doc_id").to_numpy(zero_copy_only=False)
                // id_bucket),
            "nt": pc.cast(nt, pa.int64())})

    per_bucket = partial_aggregate(
        ds.map_batches(bucket_tokens, batch_format="pyarrow"),
        ["bucket"], [("nt", "sum", "n")]).take_all()   # bounded: N/id_bucket
    bks = np.array([r["bucket"] for r in per_bucket], np.int64)
    ns = np.array([r["n"] for r in per_bucket], np.int64)
    order = np.argsort(bks)
    bks, ns = bks[order], ns[order]
    offsets = np.concatenate([[0], np.cumsum(ns)[:-1]])
    side = ray.put((bks, offsets))

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket", pa.array(
                batch.column("doc_id").to_numpy(zero_copy_only=False)
                // id_bucket))

    def stamp(group: pa.Table) -> pa.Table:
        sbks, soffs = ray.get(side)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        nt = pc.list_value_length(pc.split_pattern(group.column("text"),
                                                   " ")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        base = soffs[np.searchsorted(sbks, group.column("bucket")[0].as_py())]
        starts = np.empty(len(ids), np.int64)
        starts[order] = base + np.concatenate([[0], np.cumsum(nt[order])[:-1]])
        return pa.table({
            "doc_id": group.column("doc_id"),
            "n_tokens": pa.array(nt),
            "start_tok": pa.array(starts),
            "chunk_id": pa.array(starts // chunk_tokens)})

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(stamp, batch_format="pyarrow")


def decontaminate_5gram(sf_dir: str, eval_ids_below: int = 10,
                        k: int = 5) -> ray.data.Dataset:
    """Benchmark decontamination: for every training document, count its
    k-gram (default 5) windows that also appear in the EVAL set (docs
    with doc_id < ``eval_ids_below``) — the n-gram-overlap contamination
    check every serious pretraining pipeline runs against held-out
    benchmarks.  The eval shingle set is bounded (|eval docs| is fixed) —
    built once, broadcast via ``ray.put``; the corpus pass builds windows
    with vectorized object-array concatenation and counts membership with
    one ``pc.is_in`` + segmented sum per batch.  No exchange at all."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def windows(texts: pa.ChunkedArray | pa.Array):
        toks = pc.split_pattern(texts, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = np.asarray(toks.flatten().to_pylist(), dtype=object)
        off = toks.offsets.to_numpy(zero_copy_only=False)
        parents = np.repeat(np.arange(len(toks), dtype=np.int64),
                            np.diff(off))
        if len(flat) < k:
            return np.array([], dtype=object), np.array([], np.int64)
        n = len(flat) - k + 1
        joined = flat[:n].copy()
        for j in range(1, k):
            joined = joined + " "
            joined = joined + flat[j:j + n]
        same_doc = parents[:n] == parents[k - 1:]
        return joined[same_doc], parents[:n][same_doc]

    eval_rows = ds.map_batches(
        lambda b: b.filter(pc.less(b.column("doc_id"), eval_ids_below)),
        batch_format="pyarrow").take_all()            # bounded: eval set
    eval_texts = pa.array([r["text"] for r in eval_rows], pa.string())
    ev_grams, _ = windows(eval_texts)
    ev_ref = ray.put(pa.array(np.unique(ev_grams).tolist(), pa.string()))

    def count_matches(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch.column("doc_id"),
                                          eval_ids_below))
        if len(t) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_matches": pa.array([], pa.int64())})
        grams, parents = windows(t.column("text"))
        hits = np.zeros(len(t), dtype=np.int64)
        if len(grams):
            m = pc.is_in(pa.array(grams.tolist(), pa.string()),
                         value_set=ray.get(ev_ref)) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            np.add.at(hits, parents, m)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_matches": pa.array(hits)})

    return ds.map_batches(count_matches, batch_format="pyarrow")


def user_outlier_events(sf_dir: str, k_times_mean: int = 3
                        ) -> ray.data.Dataset:
    """Events whose value exceeds k× their user's mean — the
    compare-to-group-aggregate shape where the group-stats side is
    UNBOUNDED (one row per user), so unlike the Q17 pattern it must NOT
    broadcast: facts and their per-user (sum, n) partials meet in a
    ``shuffle_lookup_join`` on user_id (vectorized 256-bucket exchange).
    The outlier predicate is integer-exact: cents·n > k·sum_cents
    ⟺ value > k·mean."""
    from ..functions.joins import shuffle_lookup_join
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.table({"event_id": batch.column("event_id"),
                         "user_id": batch.column("user_id"),
                         "cents": pa.array(cents)})

    events = ds.map_batches(to_cents, batch_format="pyarrow")

    stats = partial_aggregate(
        events.map_batches(
            lambda b: pa.table({"user_id": b.column("user_id"),
                                "cents": b.column("cents"),
                                "one": pa.array(np.ones(len(b), np.int64))}),
            batch_format="pyarrow"),
        ["user_id"], [("cents", "sum", "sum_cents"), ("one", "sum", "n")])

    joined = shuffle_lookup_join(
        events, stats, on="user_id",
        left_schema=pa.schema([("event_id", pa.int64()),
                               ("user_id", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("user_id", pa.int64()),
                                ("sum_cents", pa.int64()),
                                ("n", pa.int64())]))

    def outliers(batch: pa.Table) -> pa.Table:
        c = batch.column("cents").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        s = batch.column("sum_cents").to_numpy(zero_copy_only=False)
        keep = c * n > k_times_mean * s
        return batch.filter(pa.array(keep)) \
            .select(["event_id", "user_id", "cents"])

    return joined.map_batches(outliers, batch_format="pyarrow")


def rolling_7d_active_users(sf_dir: str, window_days: int = 7
                            ) -> ray.data.Dataset:
    """Rolling 7-day active users per day — exact rolling DISTINCT via
    bounded window expansion: per-batch distinct (day, user) pairs each
    emit ``window_days`` (target_day, user) rows (a 7× row blowup of the
    already-tiny distinct pairs, NOT of raw events), then one
    groupby(day) with a vectorized unique-count kernel.  The alternative
    — a per-day scan-back self-join — reads the fact table 7×; this
    reads it once."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id"])

    def expand(batch: pa.Table) -> pa.Table:
        day = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        t = pa.table({"day": pa.array(day), "user_id": pa.array(uid)})
        t = t.group_by(["day", "user_id"]).aggregate([])       # distinct
        d = t.column("day").to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        offs = np.arange(window_days, dtype=np.int64)
        return pa.table({
            "day": pa.array((d[:, None] + offs[None, :]).reshape(-1)),
            "user_id": pa.array(np.repeat(u, window_days))})

    def count_unique(group: pa.Table) -> pa.Table:
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        day = int(group.column("day")[0].as_py())
        return pa.table({
            "day": pa.array(np.array([day], np.int64)
                            .astype("datetime64[D]")
                            .astype("datetime64[us]")),
            "wau": pa.array([len(np.unique(u))], pa.int64())})

    return (ds.map_batches(expand, batch_format="pyarrow")
              .groupby("day")
              .map_groups(count_unique, batch_format="pyarrow"))


def users_per_event_type(sf_dir: str, n_user_buckets: int = 16
                         ) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT) at scale: distinct users per event type.
    Per-key distinct sets don't pre-aggregate (a user seen in two batches
    must not double-count), so the classic fix is to SALT THE DISTINCT
    KEY: users hash into ``n_user_buckets`` disjoint partitions, each
    (type, bucket) group counts its own users exactly, and the per-bucket
    counts ADD because the partitions are disjoint.  The exchange carries
    per-batch-distinct (type, bucket, user) triples; no single group ever
    holds a full key's user set."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])

    def distinct_triples(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["event_type", "user_id"]).aggregate([])
        u = t.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        bk = ((u * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(60)) \
            .astype(np.int64) % n_user_buckets
        return t.append_column("bucket", pa.array(bk))

    def count_bucket(group: pa.Table) -> pa.Table:
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": group.column("event_type").slice(0, 1),
            "n_users": pa.array([len(np.unique(u))], pa.int64())})

    per_bucket = (ds.map_batches(distinct_triples, batch_format="pyarrow")
                  .groupby(["event_type", "bucket"])
                  .map_groups(count_bucket, batch_format="pyarrow"))
    return partial_aggregate(per_bucket, ["event_type"],
                             [("n_users", "sum", "n_users")])


def token_typo_pairs(sf_dir: str) -> ray.data.Dataset:
    """Fuzzy self-join: all pairs of distinct corpus tokens at edit
    distance exactly 1, WITHOUT the O(|V|²) comparison — the
    deletion-neighborhood join.  Each token emits (variant, pos) keys:
    itself at pos −1 and each one-char deletion at its position.  Bucket
    on the variant string: a (self, deletion) collision is an
    insert/delete pair; two deletions colliding at the SAME position are
    a substitution pair (the tokens differ at exactly that index).
    Structurally distance-exact — no verify pass needed; a final distinct
    dedupes pairs reachable through several variants.  Scales as
    Σ len(token) keys instead of |V|² comparisons."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def vocab_partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        return pa.table({"tok": toks}).group_by(["tok"]).aggregate([])

    vocab = (ds.map_batches(vocab_partial, batch_format="pyarrow")
             .groupby("tok")
             .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow"))

    def emit_variants(batch: pa.Table) -> pa.Table:
        toks = batch.column("tok").to_pylist()
        key, pos, orig = [], [], []
        for t in toks:                       # vocab rows, not corpus rows
            key.append(t); pos.append(-1); orig.append(t)
            for i in range(len(t)):
                key.append(t[:i] + t[i + 1:]); pos.append(i); orig.append(t)
        return pa.table({"key": pa.array(key, pa.string()),
                         "pos": pa.array(pos, pa.int32()),
                         "orig": pa.array(orig, pa.string())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        pos = group.column("pos").to_numpy(zero_copy_only=False)
        orig = np.asarray(group.column("orig").to_pylist(), dtype=object)
        selfs = orig[pos == -1]
        ta, tb = [], []
        for i in np.nonzero(pos >= 0)[0]:
            # insert/delete: deletion variant equals another whole token
            for s in selfs:
                if s != orig[i]:
                    a, b = sorted((s, orig[i]))
                    ta.append(a); tb.append(b)
        dels = np.nonzero(pos >= 0)[0]
        for ii in range(len(dels)):
            for jj in range(ii + 1, len(dels)):
                i, j = dels[ii], dels[jj]
                # substitution: same deletion position, different tokens
                if pos[i] == pos[j] and orig[i] != orig[j]:
                    a, b = sorted((orig[i], orig[j]))
                    ta.append(a); tb.append(b)
        return pa.table({"ta": pa.array(ta, pa.string()),
                         "tb": pa.array(tb, pa.string())})

    pairs = (vocab.map_batches(emit_variants, batch_format="pyarrow")
             .groupby("key")
             .map_groups(bucket_pairs, batch_format="pyarrow"))
    distinct = (pairs.groupby(["ta", "tb"])
                .map_groups(lambda g: g.slice(0, 1),
                            batch_format="pyarrow"))
    # The pair set is bounded by the vocabulary (the tokenizer-vocab
    # assumption, as in doc_top_terms), so collect to a TYPED pa.Table —
    # a 0-row ray Dataset drops its schema through to_pandas(), and a
    # legitimately pair-free corpus must still present (ta, tb).
    seed = pa.table({"ta": pa.array([], pa.string()),
                     "tb": pa.array([], pa.string())})
    got = list(distinct.iter_batches(batch_format="pyarrow",
                                     batch_size=8192))
    return pa.concat_tables([seed, *got], promote_options="default")


def nation_revenue_share_ppm(sf_dir: str) -> pa.Table:
    """Ratio-to-report: each nation's share of total order revenue in
    exact integer parts-per-million (cents·10⁶ // total).  The fact scan
    folds through the broadcast two-hop dim lookup into 25 partial rows;
    the share division happens on the already-tiny aggregate — the
    "percent of total" BI shape with zero extra passes."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    side_ref = ray.put((
        cust.column("c_custkey").combine_chunks(),
        cust.column("c_nationkey").combine_chunks(),
        nation.column("n_nationkey").combine_chunks(),
        pa.concat_arrays([nation.column("n_name").combine_chunks(),
                          pa.array([""], pa.string())])))
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        ckeys, cnkeys, nkeys, names_d = ray.get(side_ref)
        i1 = pc.index_in(batch.column("o_custkey"), value_set=ckeys)
        nkey = pc.take(cnkeys, i1)
        i2 = pc.fill_null(pc.index_in(nkey, value_set=nkeys), len(nkeys))
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"n_name": pc.take(names_d, i2),
                      "cents": pa.array(cents)})
        res = t.group_by(["n_name"]).aggregate([("cents", "sum")])
        return pa.table({"n_name": res.column("n_name"),
                         "cents": res.column("cents_sum")})

    agg = partial_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["n_name"], [("cents", "sum", "cents")]).take_all()  # ≤ |nation|
    total = sum(r["cents"] for r in agg)
    agg.sort(key=lambda r: r["n_name"])
    return pa.table({
        "n_name": pa.array([r["n_name"] for r in agg], pa.string()),
        "revenue_cents": pa.array([r["cents"] for r in agg], pa.int64()),
        "share_ppm": pa.array([r["cents"] * 1_000_000 // total for r in agg],
                              pa.int64())})


def region_priority_matrix(sf_dir: str) -> pa.Table:
    """Zero-filled cross-product report: order counts for EVERY
    (region, priority) combination, including empty cells — the
    dimension CROSS JOIN + LEFT JOIN COALESCE(0) shape.  The fact scan
    reduces through broadcast dims; the cross product materializes only
    on the driver-side dim grid (|region|·|priority| rows)."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    side_ref = ray.put((
        cust.column("c_custkey").combine_chunks(),
        cust.column("c_nationkey").combine_chunks(),
        nation.column("n_nationkey").combine_chunks(),
        nation.column("n_regionkey").combine_chunks(),
        region.column("r_regionkey").combine_chunks(),
        pa.concat_arrays([region.column("r_name").combine_chunks(),
                          pa.array([""], pa.string())])))
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"])

    def partial(batch: pa.Table) -> pa.Table:
        ck, cnk, nk, nrk, rk, rnames_d = ray.get(side_ref)
        i1 = pc.index_in(batch.column("o_custkey"), value_set=ck)
        nkey = pc.take(cnk, i1)
        i2 = pc.index_in(nkey, value_set=nk)
        rkey = pc.take(nrk, i2)
        i3 = pc.fill_null(pc.index_in(rkey, value_set=rk), len(rk))
        t = pa.table({"r_name": pc.take(rnames_d, i3),
                      "priority": batch.column("o_orderpriority"),
                      "one": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["r_name", "priority"]).aggregate([("one", "sum")])
        return pa.table({"r_name": res.column("r_name"),
                         "priority": res.column("priority"),
                         "n": res.column("one_sum")})

    agg = partial_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["r_name", "priority"], [("n", "sum", "n")]).take_all()
    got = {(r["r_name"], r["priority"]): r["n"] for r in agg}
    all_regions = sorted(region.column("r_name").to_pylist())
    all_prios = sorted({k[1] for k in got})
    rows = [(rn, pr, got.get((rn, pr), 0))
            for rn in all_regions for pr in all_prios]
    return pa.table({
        "r_name": pa.array([r[0] for r in rows], pa.string()),
        "priority": pa.array([r[1] for r in rows], pa.string()),
        "n_orders": pa.array([r[2] for r in rows], pa.int64())})


def selfjoin_cardinality_by_part(sf_dir: str) -> ray.data.Dataset:
    """Join-size computation WITHOUT executing the join: |lineitem ⋈
    lineitem on l_partkey| = Σ_k c(k)² by the count-product identity —
    the optimizer-statistics shape (exact here; swap the exact per-key
    counts for a Count-Min row to get the classic sketched estimate).
    One partial-agg exchange of per-key counts, then a scalar fold;
    nothing quadratic ever materializes."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey"])

    def key_counts(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["l_partkey"]).aggregate([("l_partkey",
                                                        "count")])
        return pa.table({"l_partkey": res.column("l_partkey"),
                         "c": pc.cast(res.column("l_partkey_count"),
                                      pa.int64())})

    counts = partial_aggregate(
        ds.map_batches(key_counts, batch_format="pyarrow"),
        ["l_partkey"], [("c", "sum", "c")])

    def square_fold(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        return pa.table({"join_rows": pa.array([int((c * c).sum())],
                                               pa.int64()),
                         "n_keys": pa.array([len(c)], pa.int64()),
                         "_k": pa.array([0], pa.int64())})

    out = partial_aggregate(
        counts.map_batches(square_fold, batch_format="pyarrow"),
        ["_k"], [("join_rows", "sum", "join_rows"),
                 ("n_keys", "sum", "n_keys")])
    return out.select_columns(["join_rows", "n_keys"])


def source_quality_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-source corpus quality rollup (the curation dashboard every
    training pipeline keeps per crawl/source): doc count, chars, tokens,
    stopwords — all integer sums composed from the text_stats kernel,
    reduced with partial aggregation on the low-cardinality source key."""
    from ..functions.text import text_stats_batch
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        stats = text_stats_batch(batch)
        return pa.table({
            "source": batch.column("source"),
            "one": pa.array(np.ones(len(batch), np.int64)),
            "n_chars": stats.column("n_chars"),
            "n_tokens": stats.column("n_tokens"),
            "stopword_count": stats.column("stopword_count")})

    return partial_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["source"],
        [("one", "sum", "n_docs"), ("n_chars", "sum", "total_chars"),
         ("n_tokens", "sum", "total_tokens"),
         ("stopword_count", "sum", "total_stopwords")])


def lineitem_orphans(sf_dir: str) -> ray.data.Dataset:
    """Referential-integrity audit: lineitems whose l_orderkey has no
    parent order — the data-quality gate every ingest pipeline runs.
    Exact anti-join of fact keys against the dimension keyset via
    ``shuffle_anti_join`` (keys hash-partition; neither side broadcasts,
    so the audit holds at any orders cardinality), reduced to one count
    row (always emitted, zero included — an audit that reports nothing
    on success is unverifiable)."""
    from ..functions.joins import shuffle_anti_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey"])
    ok = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey"])
    orphans = shuffle_anti_join(
        li, ok.map_batches(
            lambda b: pa.table({"l_orderkey": b.column("o_orderkey")}),
            batch_format="pyarrow"),
        "l_orderkey")

    def count_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"n_orphans": pa.array([len(batch)], pa.int64()),
                         "_k": pa.array([0], pa.int64())})

    seed = ray.data.from_arrow(pa.table({
        "n_orphans": pa.array([0], pa.int64()),
        "_k": pa.array([0], pa.int64())}))
    out = partial_aggregate(
        seed.union(orphans.map_batches(count_partial,
                                       batch_format="pyarrow")),
        ["_k"], [("n_orphans", "sum", "n_orphans")])
    return out.select_columns(["n_orphans"])


def daily_order_counts_dense(sf_dir: str) -> ray.data.Dataset:
    """Calendar-spine zero-fill: order counts for EVERY day in the data's
    date range, including order-free days — the generated-dimension LEFT
    JOIN shape.  The spine comes from ``ray.data.range`` (no driver loop
    building dates); the per-day counts (bounded by the range) broadcast
    into the spine as an Arrow dictionary lookup."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate"])

    def day_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"day": pa.array(d),
                         "one": pa.array(np.ones(len(batch), np.int64))})

    daily = partial_aggregate(
        ds.map_batches(day_partial, batch_format="pyarrow"),
        ["day"], [("one", "sum", "n_orders")]).take_all()  # bounded: days
    days = np.array([r["day"] for r in daily], np.int64)
    ns = np.array([r["n_orders"] for r in daily], np.int64)
    # partial_aggregate groups by hash bucket, so output order is arbitrary;
    # searchsorted below needs the spine side sorted
    order = np.argsort(days)
    days, ns = days[order], ns[order]
    lo, hi = int(days.min()), int(days.max())
    side = ray.put((days, ns, lo))

    spine = ray.data.range(hi - lo + 1)

    def fill(batch: pa.Table) -> pa.Table:
        sdays, sns, slo = ray.get(side)
        d = batch.column("id").to_numpy(zero_copy_only=False) + slo
        pos = np.searchsorted(sdays, d)
        pos_c = np.clip(pos, 0, len(sdays) - 1)
        n = np.where(sdays[pos_c] == d, sns[pos_c], 0)
        return pa.table({
            "day": pa.array(d.astype("datetime64[D]")
                            .astype("datetime64[us]")),
            "n_orders": pa.array(n.astype(np.int64))})

    return spine.map_batches(fill, batch_format="pyarrow")


def part_metrics_unpivot(sf_dir: str) -> ray.data.Dataset:
    """UNPIVOT/melt — the inverse of events_daily_pivot: part's metric
    columns become (p_partkey, metric, value) long-form rows.  Pure
    vectorized reshape inside map_batches (concat of column slices, no
    exchange at all); integer-exact values (retail price as cents)."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_size",
                                     "p_retailprice"])

    def melt(batch: pa.Table) -> pa.Table:
        n = len(batch)
        keys = batch.column("p_partkey").combine_chunks()
        size = pc.cast(batch.column("p_size"), pa.int64()).combine_chunks()
        cents = pa.array(np.rint(
            batch.column("p_retailprice").to_numpy(zero_copy_only=False)
            * 100).astype(np.int64))
        return pa.table({
            "p_partkey": pa.concat_arrays([keys, keys]),
            "metric": pa.array(["size"] * n + ["retail_cents"] * n,
                               pa.string()),
            "value": pa.concat_arrays([size, cents])})

    return ds.map_batches(melt, batch_format="pyarrow")


def user_path_prefixes(sf_dir: str, prefix_len: int = 3
                       ) -> ray.data.Dataset:
    """Sequence mining over user journeys: each user's first
    ``prefix_len`` event types (by ts, event_id) join into a path string;
    paths count globally.  The per-user kernel emits ONE row per user, so
    the second exchange carries |users| path rows and the path-count
    reduce is a standard partial aggregation."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        et = group.column("event_type").to_pylist()
        order = np.lexsort((eid, ts))[:prefix_len]
        path = ">".join(et[i] for i in order)
        return pa.table({"path": pa.array([path], pa.string()),
                         "one": pa.array([1], pa.int64())})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    return partial_aggregate(per, ["path"], [("one", "sum", "n_users")])


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1995-03-15", n: int = 10
                         ) -> ray.data.Dataset:
    """TPC-H Q3 shape: top-``n`` unshipped-revenue orders for one market
    segment.  customer is a broadcast dimension (segment keyset);
    qualifying orders (date-filtered) stay a Dataset and meet the
    lineitem revenue partials in a ``shuffle_lookup_join`` — the
    fact⋈filtered-fact equi-join where neither side is driver-bounded.
    Revenue is exact integer cent·percent (cents × (100 − disc_pct)), so
    the distributed sum is order-independent."""
    from ..functions.joins import shuffle_lookup_join
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    keyset = cust.filter(pc.equal(cust.column("c_mktsegment"), segment)) \
                 .column("c_custkey").combine_chunks()
    key_ref = ray.put(keyset)
    cut_us = np.datetime64(cutoff, "us")

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    def keep_orders(batch: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        m = pc.and_(pc.is_in(batch.column("o_custkey"), value_set=ks),
                    pc.less(batch.column("o_orderdate"),
                            pa.scalar(cut_us.item(), pa.timestamp("us"))))
        return batch.filter(m).drop_columns(["o_custkey"])

    orders_q = orders.map_batches(keep_orders, batch_format="pyarrow")

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def rev_partial(batch: pa.Table) -> pa.Table:
        m = pc.greater(batch.column("l_shipdate"),
                       pa.scalar(cut_us.item(), pa.timestamp("us")))
        b = batch.filter(m)
        cents = np.rint(b.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc = np.rint(b.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "revenue_cp": pa.array(cents * (100 - disc))})
        res = t.group_by(["l_orderkey"]).aggregate([("revenue_cp", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "revenue_cp": res.column("revenue_cp_sum")})

    rev = partial_aggregate(
        li.map_batches(rev_partial, batch_format="pyarrow"),
        ["l_orderkey"], [("revenue_cp", "sum", "revenue_cp")])
    joined = shuffle_lookup_join(
        rev, orders_q, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("revenue_cp", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_orderpriority", pa.string())]),
        how="inner")
    return joined.sort(["revenue_cp", "o_orderdate", "l_orderkey"],
                       descending=[True, False, False]).limit(n)


def late_ship_priority_counts(sf_dir: str, grace_days: int = 90
                              ) -> ray.data.Dataset:
    """TPC-H Q4-shaped EXISTS: count orders per priority having ANY
    lineitem shipped more than ``grace_days`` after the order date.  One
    exchange total: orders rows and per-batch (orderkey → max shipdate)
    lineitem partials union-tag into 256 Fibonacci-hash buckets; each
    bucket group reduces the partial maxes vectorized (lexsort +
    maximum.reduceat), probes them with searchsorted against its orders,
    and emits per-priority partial counts — the aggregate-then-semi-join
    fused into the groupby that EXISTS subqueries compile to."""
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])
    grace_us = np.int64(grace_days) * 86_400_000_000

    def bucket_of(keys: np.ndarray) -> pa.Array:
        return pa.array(((keys.astype(np.uint64)
                          * np.uint64(0x9E3779B97F4A7C15))
                         >> np.uint64(56)).astype(np.int32))

    def tag_orders(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "bkt": bucket_of(k), "key": batch.column("o_orderkey"),
            "odate": batch.column("o_orderdate").cast(pa.int64()),
            "priority": batch.column("o_orderpriority"),
            "is_order": pa.array(np.ones(len(batch), dtype=bool)),
            "max_ship": pa.nulls(len(batch), pa.int64())})

    def tag_lineitem(batch: pa.Table) -> pa.Table:
        t = pa.table({"key": batch.column("l_orderkey"),
                      "ship": batch.column("l_shipdate").cast(pa.int64())})
        res = t.group_by(["key"]).aggregate([("ship", "max")])
        k = res.column("key").to_numpy(zero_copy_only=False)
        return pa.table({
            "bkt": bucket_of(k), "key": res.column("key"),
            "odate": pa.nulls(len(res), pa.int64()),
            "priority": pa.nulls(len(res), pa.string()),
            "is_order": pa.array(np.zeros(len(res), dtype=bool)),
            "max_ship": res.column("ship_max")})

    tagged = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        li.map_batches(tag_lineitem, batch_format="pyarrow"))

    def reduce_bucket(group: pa.Table) -> pa.Table:
        side = group.column("is_order").to_numpy(zero_copy_only=False)
        keys = group.column("key").to_numpy(zero_copy_only=False)
        rk, rv = keys[~side], group.column("max_ship") \
            .to_numpy(zero_copy_only=False)[~side].astype(np.int64)
        if len(rk) == 0 or side.sum() == 0:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "n_late_orders": pa.array([], pa.int64())})
        order = np.argsort(rk, kind="stable")
        rk, rv = rk[order], rv[order]
        uk, starts = np.unique(rk, return_index=True)
        umax = np.maximum.reduceat(rv, starts)
        lk = keys[side]
        odate = group.column("odate").to_numpy(
            zero_copy_only=False)[side].astype(np.int64)
        idx = np.searchsorted(uk, lk)
        idx_c = np.clip(idx, 0, len(uk) - 1)
        hit = uk[idx_c] == lk
        late = hit & (umax[idx_c] > odate + grace_us)
        if not late.any():
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "n_late_orders": pa.array([], pa.int64())})
        pri = group.column("priority").filter(
            pa.array(side)).filter(pa.array(late))
        t = pa.table({"o_orderpriority": pri,
                      "one": pa.array(np.ones(len(pri), dtype=np.int64))})
        res = t.group_by(["o_orderpriority"]).aggregate([("one", "sum")])
        return pa.table({"o_orderpriority": res.column("o_orderpriority"),
                         "n_late_orders": res.column("one_sum")})

    per_bucket = tagged.groupby("bkt").map_groups(
        reduce_bucket, batch_format="pyarrow")
    return partial_aggregate(per_bucket, ["o_orderpriority"],
                             [("n_late_orders", "sum", "n_late_orders")])


def event_dedup_60s(sf_dir: str, min_gap_seconds: int = 60
                    ) -> ray.data.Dataset:
    """Bounded-window event throttle: drop an event when the SAME
    (user, event_type) produced another event less than
    ``min_gap_seconds`` earlier — LAG-against-previous-raw-row semantics
    (the greedy keep-chain variant is order-recursive and not
    SQL-expressible; this one carries an exact QUALIFY-lag oracle).
    Partitioned by user_id; each group lexsorts (type, ts, event_id) and
    keeps run heads plus rows whose in-type gap ≥ the threshold."""
    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
    gap_us = np.int64(min_gap_seconds) * 1_000_000

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(group.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, et.astype("U")))
        ts_s, et_s = ts[order], et[order]
        keep = np.ones(len(ts_s), dtype=bool)
        if len(ts_s) > 1:
            same_type = et_s[1:] == et_s[:-1]
            close = (ts_s[1:] - ts_s[:-1]) < gap_us
            keep[1:] = ~(same_type & close)
        sel = order[keep]
        return group.take(pa.array(np.sort(sel)))

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def q14_promo_revenue_ppm(sf_dir: str) -> pa.Table:
    """TPC-H Q14 shape: promo-typed parts' share of lineitem revenue as
    exact integer ppm.  part is a broadcast dimension (promo keyset); one
    fact scan folds two conditional integer sums (cent·percent) into a
    single row — the conditional-aggregate ratio report."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    promo = part.filter(pc.equal(part.column("p_type"), "PROMO")) \
                .column("p_partkey").combine_chunks()
    promo_ref = ray.put(promo)
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc = np.rint(batch.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        rev = cents * (100 - disc)
        is_promo = pc.is_in(batch.column("l_partkey"),
                            value_set=ray.get(promo_ref)) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"promo_cp": pa.array([int(rev[is_promo].sum())]),
                         "total_cp": pa.array([int(rev.sum())])})

    rows = li.map_batches(partial, batch_format="pyarrow").take_all()
    promo_cp = sum(r["promo_cp"] for r in rows)
    total_cp = sum(r["total_cp"] for r in rows)
    return pa.table({
        "promo_cp": pa.array([promo_cp], pa.int64()),
        "total_cp": pa.array([total_cp], pa.int64()),
        "promo_ppm": pa.array([promo_cp * 1_000_000 // total_cp], pa.int64()),
    })


def user_value_quartiles(sf_dir: str, k: int = 4) -> ray.data.Dataset:
    """NTILE(k) window function: each user's events bucket into k
    near-equal groups by (value, event_id) rank — SQL NTILE semantics
    exactly (first n%k buckets take the extra row).  Partitioned by
    user_id; the per-group kernel is one argsort + an integer bucket
    formula, no Python per row."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "value"])

    def per_user(group: pa.Table) -> pa.Table:
        val = group.column("value").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, val))
        n = len(order)
        idx = np.empty(n, dtype=np.int64)
        idx[order] = np.arange(n)
        big, small = n % k, n // k
        size_big = small + 1
        cut = big * size_big
        q = np.where(idx < cut,
                     idx // max(size_big, 1) + 1,
                     big + (idx - cut) // max(small, 1) + 1)
        return group.append_column("quartile",
                                   pa.array(q.astype(np.int64)))

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def major_parts_by_revenue(sf_dir: str, threshold_ppm: int = 600
                           ) -> ray.data.Dataset:
    """TPC-H Q11 shape: parts whose revenue exceeds ``threshold_ppm`` of
    the global total — HAVING against a whole-table scalar.  One fact
    scan builds per-part integer revenue partials; the per-part aggregate
    (bounded by |part|) materializes once, the driver folds the global
    total from it, and the ppm filter runs distributed with the scalar
    broadcast — no second scan of the fact table."""
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc = np.rint(batch.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "revenue_cp": pa.array(cents * (100 - disc))})
        res = t.group_by(["l_partkey"]).aggregate([("revenue_cp", "sum")])
        return pa.table({"l_partkey": res.column("l_partkey"),
                         "revenue_cp": res.column("revenue_cp_sum")})

    agg = partial_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_partkey"], [("revenue_cp", "sum", "revenue_cp")]).materialize()
    total = 0
    for b in agg.iter_batches(batch_format="pyarrow"):
        total += int(pc.sum(b.column("revenue_cp")).as_py() or 0)
    total_ref = ray.put(total)

    def keep_major(batch: pa.Table) -> pa.Table:
        tot = ray.get(total_ref)
        rev = batch.column("revenue_cp").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(rev * 1_000_000 > threshold_ppm * tot))

    return agg.map_batches(keep_major, batch_format="pyarrow")


def embedding_norm_stats_by_label(sf_dir: str) -> ray.data.Dataset:
    """Vector-column aggregate: per label, count and the sum/min/max of
    integer-scaled squared norms (components round to 1e-4 before
    squaring, so the distributed sum is exact and order-independent —
    the trick that lets float vector math carry a value-exact SQL
    oracle).  One scan, fixed-width numpy reshape per batch."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        flat = np.rint(emb.combine_chunks().flatten()
                       .to_numpy(zero_copy_only=False)
                       .astype(np.float64) * 10_000).astype(np.int64)
        dim = len(flat) // len(batch)
        norm2 = (flat.reshape(len(batch), dim) ** 2).sum(axis=1)
        t = pa.table({"label": pc.cast(batch.column("label"), pa.int64()),
                      "norm2_scaled": pa.array(norm2),
                      "one": pa.array(np.ones(len(batch), dtype=np.int64))})
        return t

    tagged = ds.map_batches(partial, batch_format="pyarrow")
    return partial_aggregate(
        tagged, ["label"],
        [("one", "sum", "n_vectors"), ("norm2_scaled", "sum", "norm2_sum"),
         ("norm2_scaled", "min", "norm2_min"),
         ("norm2_scaled", "max", "norm2_max")])


def lang_confusion_matrix(sf_dir: str) -> ray.data.Dataset:
    """Claimed-vs-detected language confusion counts: one documents scan
    runs the n-gram language heuristic per batch and partial-counts into
    (lang, lang_pred) cells — the model-QA crosstab every corpus audit
    starts with.  The exchange carries ≤ |langs|² partial rows."""
    from ..functions.text import langid_one
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        pred = pa.array([langid_one(t)
                         for t in batch.column("text").to_pylist()],
                        pa.string())
        t = pa.table({"lang": batch.column("lang"), "lang_pred": pred,
                      "one": pa.array(np.ones(len(batch), dtype=np.int64))})
        res = t.group_by(["lang", "lang_pred"]).aggregate([("one", "sum")])
        return pa.table({"lang": res.column("lang"),
                         "lang_pred": res.column("lang_pred"),
                         "one": res.column("one_sum")})

    return partial_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "lang_pred"], [("one", "sum", "n_docs")])


_Q19_CONJUNCTS = (("Brand#1", 1, 10), ("Brand#2", 10, 20),
                  ("Brand#3", 20, 30))


def q19_disjunctive_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q19 shape: revenue under an OR-of-conjuncts predicate
    ((brand, quantity-range) triples).  part broadcasts one partkey→brand
    dictionary; the disjunction evaluates vectorized per batch and the
    scan folds to a single (n_lines, revenue_cp) row — the multi-clause
    pushdown filter that defeats naive per-clause scans."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    side_ref = ray.put((part.column("p_partkey").combine_chunks(),
                        pa.concat_arrays([
                            part.column("p_brand").combine_chunks(),
                            pa.array([""], pa.string())])))
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        keys, brands = ray.get(side_ref)
        idx = pc.fill_null(pc.index_in(batch.column("l_partkey"),
                                       value_set=keys), len(keys))
        brand = np.asarray(pc.take(brands, idx).to_pylist(), dtype=object)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        m = np.zeros(len(batch), dtype=bool)
        for b, lo, hi in _Q19_CONJUNCTS:
            m |= (brand == b) & (qty >= lo) & (qty <= hi)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc = np.rint(batch.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        rev = (cents * (100 - disc))[m]
        return pa.table({"n_lines": pa.array([int(m.sum())]),
                         "revenue_cp": pa.array([int(rev.sum())])})

    rows = li.map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table({
        "n_lines": pa.array([sum(r["n_lines"] for r in rows)], pa.int64()),
        "revenue_cp": pa.array([sum(r["revenue_cp"] for r in rows)],
                               pa.int64())})


def idle_customers_by_nation(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q22 shape: customers who never placed an order, counted per
    nation — NOT EXISTS compiled to ``shuffle_anti_join`` (both sides
    hash-partition on custkey; nothing driver-materializes) followed by
    the broadcast-dimension nation rollup."""
    from ..functions.joins import shuffle_anti_join
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    side_ref = ray.put((nation.column("n_nationkey").combine_chunks(),
                        pa.concat_arrays([
                            nation.column("n_name").combine_chunks(),
                            pa.array([""], pa.string())])))
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey"])
    idle = shuffle_anti_join(
        cust, orders.map_batches(
            lambda b: pa.table({"c_custkey": b.column("o_custkey")}),
            batch_format="pyarrow"),
        "c_custkey")

    def partial(batch: pa.Table) -> pa.Table:
        nk, names = ray.get(side_ref)
        idx = pc.fill_null(pc.index_in(batch.column("c_nationkey"),
                                       value_set=nk), len(nk))
        t = pa.table({"n_name": pc.take(names, idx),
                      "one": pa.array(np.ones(len(batch), dtype=np.int64))})
        res = t.group_by(["n_name"]).aggregate([("one", "sum")])
        return pa.table({"n_name": res.column("n_name"),
                         "one": res.column("one_sum")})

    agg = partial_aggregate(
        idle.map_batches(partial, batch_format="pyarrow"),
        ["n_name"], [("one", "sum", "n_idle_customers")])
    # bounded (≤ |nation| rows) and legitimately empty when every customer
    # ordered — seed a typed table so an empty result keeps its schema
    seed = pa.table({"n_name": pa.array([], pa.string()),
                     "n_idle_customers": pa.array([], pa.int64())})
    return pa.concat_tables(
        [seed] + [b.select(["n_name", "n_idle_customers"])
                  for b in agg.iter_batches(batch_format="pyarrow")])


def event_type_jaccard(sf_dir: str) -> pa.Table:
    """Pairwise Jaccard similarity between event types over their user
    sets, computed WITHOUT the |users|² self-join: per-batch distinct
    (user, type) pairs → one user-keyed exchange folds each user to a
    single sorted type-set string → the type-set histogram (≤ 2^|types|
    rows) leaves the cluster and the driver expands it to per-pair
    intersection/union counts.  Only co-occurring pairs emit (matching
    the inner-join SQL oracle); similarity is exact integer ppm."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["user_id", "event_type"]) \
            .aggregate([([], "count_all")])
        return res.select(["user_id", "event_type"])

    def typeset(group: pa.Table) -> pa.Table:
        types = sorted(set(group.column("event_type").to_pylist()))
        return pa.table({"ts_key": pa.array(["|".join(types)], pa.string()),
                         "one": pa.array([1], pa.int64())})

    hist = partial_aggregate(
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
          .groupby("user_id").map_groups(typeset, batch_format="pyarrow"),
        ["ts_key"], [("one", "sum", "n_users")]).take_all()

    per_type: dict[str, int] = {}
    per_pair: dict[tuple[str, str], int] = {}
    for row in hist:
        types, n = row["ts_key"].split("|"), row["n_users"]
        for i, a in enumerate(types):
            per_type[a] = per_type.get(a, 0) + n
            for b in types[i + 1:]:
                per_pair[(a, b)] = per_pair.get((a, b), 0) + n
    pairs = sorted(per_pair)
    n_a = [per_type[a] for a, _ in pairs]
    n_b = [per_type[b] for _, b in pairs]
    n_both = [per_pair[p] for p in pairs]
    return pa.table({
        "type_a": pa.array([a for a, _ in pairs], pa.string()),
        "type_b": pa.array([b for _, b in pairs], pa.string()),
        "n_a": pa.array(n_a, pa.int64()),
        "n_b": pa.array(n_b, pa.int64()),
        "n_both": pa.array(n_both, pa.int64()),
        "jaccard_ppm": pa.array(
            [both * 1_000_000 // (a + b - both)
             for a, b, both in zip(n_a, n_b, n_both)], pa.int64())})


def docs_weighted_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic weighted Bernoulli sample: doc_id keeps with
    probability n_chars / max(n_chars) via a 48-bit md5 threshold test —
    the seedless, shard-order-independent sampler (same hash → same
    sample on any cluster shape).  48 bits (not 60) so threshold·weight
    stays inside int64 for the exact SQL mirror.  Pass 1 folds the global
    max from per-batch partials; pass 2 filters vectorized."""
    import hashlib
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"])
    mx = 0
    for b in ds.map_batches(
            lambda b: pa.table({"m": pa.array(
                [int(pc.max(b.column("n_chars")).as_py() or 0)])}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        mx = max(mx, int(pc.max(b.column("m")).as_py() or 0))
    mx_ref = ray.put(mx)

    def keep(batch: pa.Table) -> pa.Table:
        m = ray.get(mx_ref)
        h = np.array([int(hashlib.md5(str(d).encode()).hexdigest()[:12], 16)
                      for d in batch.column("doc_id").to_pylist()],
                     dtype=np.int64)
        n = batch.column("n_chars").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(h * m < n << 48))

    return ds.map_batches(keep, batch_format="pyarrow")


def doc_length_deciles(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Global NTILE(k) over (n_chars, doc_id) rank without a single-node
    sort: coarse length buckets partial-count (bounded: length range /
    width), the driver prefix-sums the tiny bucket table, and each bucket
    group stamps offset + local sorted position → exact global rank →
    SQL-NTILE bucket formula.  The global_event_rank pattern applied to
    the corpus-curation 'length decile' feature."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"])
    width = 64

    def bucket_partial(batch: pa.Table) -> pa.Table:
        bkt = batch.column("n_chars").to_numpy(zero_copy_only=False) // width
        return pa.table({"bkt": pa.array(bkt.astype(np.int64)),
                         "one": pa.array(np.ones(len(batch), np.int64))})

    per_bkt = partial_aggregate(
        ds.map_batches(bucket_partial, batch_format="pyarrow"),
        ["bkt"], [("one", "sum", "n")]).take_all()
    bks = np.array([r["bkt"] for r in per_bkt], np.int64)
    ns = np.array([r["n"] for r in per_bkt], np.int64)
    order = np.argsort(bks)
    bks, ns = bks[order], ns[order]
    offs = np.concatenate([[0], np.cumsum(ns)[:-1]])
    total = int(ns.sum())
    side_ref = ray.put((bks, offs, total))

    def add_bucket(batch: pa.Table) -> pa.Table:
        bkt = batch.column("n_chars").to_numpy(zero_copy_only=False) // width
        return batch.append_column("bkt", pa.array(bkt.astype(np.int64)))

    def stamp(group: pa.Table) -> pa.Table:
        sb, so, n = ray.get(side_ref)
        nc = group.column("n_chars").to_numpy(zero_copy_only=False)
        did = group.column("doc_id").to_numpy(zero_copy_only=False)
        local = np.lexsort((did, nc))
        rnk = np.empty(len(group), dtype=np.int64)
        base = so[np.searchsorted(sb, group.column("bkt")[0].as_py())]
        rnk[local] = base + np.arange(len(group), dtype=np.int64)
        big, small = n % k, n // k
        size_big = small + 1
        cut = big * size_big
        dec = np.where(rnk < cut,
                       rnk // max(size_big, 1) + 1,
                       big + (rnk - cut) // max(small, 1) + 1)
        return pa.table({"doc_id": group.column("doc_id"),
                         "n_chars": group.column("n_chars"),
                         "decile": pa.array(dec.astype(np.int64))})

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bkt").map_groups(stamp, batch_format="pyarrow")


def docs_with_hapax(sf_dir: str) -> ray.data.Dataset:
    """Docs containing at least one corpus-unique token (hapax legomenon)
    — the rare-content flag.  One scan emits distinct (token, doc_id)
    pairs; the token-keyed exchange lets every df=1 group emit its single
    owner doc_id; a second (≤ |docs|) exchange dedups owners.  No
    broadcast of the hapax vocabulary — at web scale that set is the
    LARGE side, which is why membership runs inside the token groupby."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        dids = np.repeat(
            batch.column("doc_id").to_numpy(zero_copy_only=False),
            lens.astype(np.int64))
        t = pa.table({"token": flat, "doc_id": pa.array(dids)})
        return t.group_by(["token", "doc_id"]) \
            .aggregate([([], "count_all")]).select(["token", "doc_id"])

    def hapax_owner(group: pa.Table) -> pa.Table:
        if len(group) != 1:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        return group.select(["doc_id"])

    owners = (ds.map_batches(pairs, batch_format="pyarrow")
                .groupby("token").map_groups(hapax_owner,
                                             batch_format="pyarrow"))
    distinct = owners.groupby("doc_id").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")
    # id-only result, legitimately empty on closed-vocabulary corpora —
    # seed a typed table so the schema survives zero rows
    seed = pa.table({"doc_id": pa.array([], pa.int64())})
    return pa.concat_tables(
        [seed] + [b.select(["doc_id"])
                  for b in distinct.iter_batches(batch_format="pyarrow")])


def bilateral_trade_volume(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q7 shape: revenue by (supplier nation, customer nation,
    ship year).  supplier/customer/nation broadcast as dictionaries; the
    lineitem→orders link (fact⋈fact) runs through one
    ``shuffle_lookup_join`` on orderkey AFTER lineitem pre-reduces to
    (orderkey, supp_nation, year) partials — the exchange carries
    partial sums, never raw lineitems."""
    from ..functions.joins import shuffle_lookup_join
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nk = nation.column("n_nationkey").combine_chunks()
    nnames = pa.concat_arrays([nation.column("n_name").combine_chunks(),
                               pa.array([""], pa.string())])
    side_ref = ray.put((
        sup.column("s_suppkey").combine_chunks(),
        pc.cast(sup.column("s_nationkey").combine_chunks(), pa.int64()),
        cust.column("c_custkey").combine_chunks(),
        pc.cast(cust.column("c_nationkey").combine_chunks(), pa.int64()),
        nk, nnames))
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])

    def li_partial(batch: pa.Table) -> pa.Table:
        sk, snk, _, _, nkeys, names = ray.get(side_ref)
        i = pc.index_in(batch.column("l_suppkey"), value_set=sk)
        j = pc.fill_null(pc.index_in(pc.take(snk, i), value_set=nkeys),
                         len(nkeys))
        year = batch.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc = np.rint(batch.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "supp_nation": pc.take(names, j),
                      "ship_year": pa.array(year),
                      "revenue_cp": pa.array(cents * (100 - disc))})
        res = t.group_by(["l_orderkey", "supp_nation", "ship_year"]) \
            .aggregate([("revenue_cp", "sum")])
        return pa.table({
            "l_orderkey": res.column("l_orderkey"),
            "supp_nation": res.column("supp_nation"),
            "ship_year": res.column("ship_year"),
            "revenue_cp": res.column("revenue_cp_sum")})

    pre = li.map_batches(li_partial, batch_format="pyarrow")
    joined = shuffle_lookup_join(
        pre, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("supp_nation", pa.string()),
                               ("ship_year", pa.int64()),
                               ("revenue_cp", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]),
        how="inner")

    def cust_nation(batch: pa.Table) -> pa.Table:
        _, _, ck, cnk, nkeys, names = ray.get(side_ref)
        i = pc.index_in(batch.column("o_custkey"), value_set=ck)
        j = pc.fill_null(pc.index_in(pc.take(cnk, i), value_set=nkeys),
                         len(nkeys))
        return pa.table({"supp_nation": batch.column("supp_nation"),
                         "cust_nation": pc.take(names, j),
                         "ship_year": batch.column("ship_year"),
                         "revenue_cp": batch.column("revenue_cp")})

    return partial_aggregate(
        joined.map_batches(cust_nation, batch_format="pyarrow"),
        ["supp_nation", "cust_nation", "ship_year"],
        [("revenue_cp", "sum", "revenue_cp")])


def customer_order_gap_median(sf_dir: str) -> ray.data.Dataset:
    """Per-customer inter-order cadence: for customers with ≥2 orders,
    the count and the LOWER-median (quantile_disc 0.5 — stays integer)
    of day gaps between consecutive orders.  Partitioned by custkey; the
    per-group kernel is one sort + diff + partition-select, and the
    exchange carries (custkey, orderdate) pairs only."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_orderkey"])

    def per_customer(group: pa.Table) -> pa.Table:
        ts = group.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        oid = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((oid, ts))
        days = ts[order] // 86_400_000_000
        gaps = np.diff(days)
        if len(gaps) == 0:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "n_gaps": pa.array([], pa.int64()),
                             "median_gap_days": pa.array([], pa.int64())})
        gaps.sort()
        med = int(gaps[(len(gaps) - 1) // 2])  # quantile_disc(0.5)
        return pa.table({
            "o_custkey": group.column("o_custkey").slice(0, 1),
            "n_gaps": pa.array([len(gaps)], pa.int64()),
            "median_gap_days": pa.array([med], pa.int64())})

    return ds.groupby("o_custkey").map_groups(per_customer,
                                              batch_format="pyarrow")


def daily_revenue_delta(sf_dir: str) -> pa.Table:
    """Day-over-day revenue movement: the LAG window over the daily
    aggregate.  The fact scan partial-sums into one row per calendar day
    (bounded), the tiny day table leaves the cluster ONCE, and the
    diff/ppm columns compute on the driver — windowing an aggregate
    never needs a second distributed pass."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("o_orderdate"), unit="day")
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"day": day, "cents": pa.array(cents)})
        res = t.group_by(["day"]).aggregate([("cents", "sum")])
        return pa.table({"day": res.column("day"),
                         "cents": res.column("cents_sum")})

    rows = partial_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], [("cents", "sum", "cents")]).take_all()
    rows.sort(key=lambda r: r["day"])
    cents = np.array([r["cents"] for r in rows], np.int64)
    prev = np.concatenate([[0], cents[:-1]])
    delta = cents - prev
    delta[0] = 0
    has_prev = np.arange(len(cents)) > 0
    # DuckDB's // truncates toward zero (numpy floors) — match it
    mag = np.abs(delta) * 1_000_000 // np.maximum(prev, 1)
    ppm = np.where(has_prev, np.sign(delta) * mag, 0)
    return pa.table({
        "day": pa.array([r["day"] for r in rows], pa.timestamp("us")),
        "revenue_cents": pa.array(cents),
        "delta_cents": pa.array(delta),
        "delta_ppm": pa.array(ppm.astype(np.int64))})


def cheapest_supplier_per_part(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q2 argmin shape: for every part, the supplier with the
    lowest total discounted spend (ties → smaller suppkey).  Per-batch
    (part, supplier) partial sums → pair groupby (the only exchange that
    matters; pair cardinality ≪ raw rows) → per-part lexicographic
    argmin, itself two-level distributive like user_best_event."""
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc = np.rint(batch.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "l_suppkey": batch.column("l_suppkey"),
                      "spend_cp": pa.array(cents * (100 - disc))})
        res = t.group_by(["l_partkey", "l_suppkey"]) \
            .aggregate([("spend_cp", "sum")])
        return pa.table({"l_partkey": res.column("l_partkey"),
                         "l_suppkey": res.column("l_suppkey"),
                         "spend_cp": res.column("spend_cp_sum")})

    pair = partial_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], [("spend_cp", "sum", "spend_cp")])

    def argmin_part(group: pa.Table) -> pa.Table:
        spend = group.column("spend_cp").to_numpy(zero_copy_only=False)
        supp = group.column("l_suppkey").to_numpy(zero_copy_only=False)
        i = np.lexsort((supp, spend))[0]
        return pa.table({
            "l_partkey": group.column("l_partkey").slice(0, 1),
            "best_suppkey": pa.array([int(supp[i])], pa.int64()),
            "spend_cp": pa.array([int(spend[i])], pa.int64())})

    return pair.groupby("l_partkey").map_groups(argmin_part,
                                                batch_format="pyarrow")


def q10_returned_revenue(sf_dir: str, n: int = 20) -> ray.data.Dataset:
    """TPC-H Q10 shape: top-``n`` customers by revenue on RETURNED
    lineitems.  Early returnflag filter inside the scan, per-batch
    orderkey partial sums, one ``shuffle_lookup_join`` to orders for the
    custkey, then the customer rollup + broadcast name attach and a
    deterministic top-n on the aggregate."""
    from ..functions.joins import shuffle_lookup_join
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    side_ref = ray.put((cust.column("c_custkey").combine_chunks(),
                        pa.concat_arrays([
                            cust.column("c_name").combine_chunks(),
                            pa.array([""], pa.string())])))
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        cents = np.rint(b.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc = np.rint(b.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "revenue_cp": pa.array(cents * (100 - disc))})
        res = t.group_by(["l_orderkey"]).aggregate([("revenue_cp", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "revenue_cp": res.column("revenue_cp_sum")})

    pre = partial_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey"], [("revenue_cp", "sum", "revenue_cp")])
    joined = shuffle_lookup_join(
        pre, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("revenue_cp", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]),
        how="inner")

    def by_cust(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["o_custkey"]).aggregate([("revenue_cp", "sum")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "revenue_cp": res.column("revenue_cp_sum")})

    per_cust = partial_aggregate(
        joined.map_batches(by_cust, batch_format="pyarrow"),
        ["o_custkey"], [("revenue_cp", "sum", "revenue_cp")])
    top = per_cust.sort(["revenue_cp", "o_custkey"],
                        descending=[True, False]).limit(n)

    def attach(batch: pa.Table) -> pa.Table:
        keys, names = ray.get(side_ref)
        i = pc.fill_null(pc.index_in(batch.column("o_custkey"),
                                     value_set=keys), len(keys))
        return batch.append_column("c_name", pc.take(names, i))

    return top.map_batches(attach, batch_format="pyarrow")


def order_count_distribution(sf_dir: str) -> pa.Table:
    """TPC-H Q13 shape: the distribution of per-customer order counts,
    INCLUDING the zero bucket.  Two distributive levels (custkey counts →
    count-of-counts) so the exchanges carry one row per customer then one
    row per distinct count; the zero bucket is total customers minus the
    ordering ones — a metadata count, never an outer join of the full
    customer table.  Returns a bounded typed table (≤ max orders/customer
    rows)."""
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey"])

    def ones(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "one": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["o_custkey"]).aggregate([("one", "sum")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "c_count": res.column("one_sum")})

    per_cust = partial_aggregate(
        orders.map_batches(ones, batch_format="pyarrow"),
        ["o_custkey"], [("c_count", "sum", "c_count")])

    def hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"c_count": batch.column("c_count"),
                      "one": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["c_count"]).aggregate([("one", "sum")])
        return pa.table({"c_count": res.column("c_count"),
                         "custdist": res.column("one_sum")})

    rows = partial_aggregate(
        per_cust.map_batches(hist, batch_format="pyarrow"),
        ["c_count"], [("custdist", "sum", "custdist")]).take_all()
    n_customers = read_parquet_clean(f"{sf_dir}/customer.parquet",
                                     columns=["c_custkey"]).count()
    zero = n_customers - sum(r["custdist"] for r in rows)
    if zero > 0:
        rows.append({"c_count": 0, "custdist": zero})
    rows.sort(key=lambda r: r["c_count"])
    return pa.table({
        "c_count": pa.array([r["c_count"] for r in rows], pa.int64()),
        "custdist": pa.array([r["custdist"] for r in rows], pa.int64())})


def q18_large_orders(sf_dir: str, min_qty: int = 300,
                     n: int = 100) -> ray.data.Dataset:
    """TPC-H Q18 shape: orders whose total quantity reaches ``min_qty``,
    with customer name, total price and the quantity sum, top-``n`` by
    price.  The HAVING filter runs on the per-orderkey aggregate (tiny)
    BEFORE any join, so the orders join probes a vanishing build side and
    the customer name attaches from a broadcast array."""
    from ..functions.joins import shuffle_lookup_join
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    side_ref = ray.put((cust.column("c_custkey").combine_chunks(),
                        pa.concat_arrays([
                            cust.column("c_name").combine_chunks(),
                            pa.array([""], pa.string())])))
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_quantity"])

    def per_order(batch: pa.Table) -> pa.Table:
        qty = np.rint(batch.column("l_quantity")
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "sum_qty": pa.array(qty)})
        res = t.group_by(["l_orderkey"]).aggregate([("sum_qty", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "sum_qty": res.column("sum_qty_sum")})

    big = partial_aggregate(
        li.map_batches(per_order, batch_format="pyarrow"),
        ["l_orderkey"], [("sum_qty", "sum", "sum_qty")]) \
        .map_batches(lambda b: b.filter(
            pc.greater_equal(b.column("sum_qty"), min_qty)),
            batch_format="pyarrow")

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    joined = shuffle_lookup_join(
        big, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("sum_qty", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_totalprice", pa.float64())]),
        how="inner")

    def finish(batch: pa.Table) -> pa.Table:
        keys, names = ray.get(side_ref)
        i = pc.fill_null(pc.index_in(batch.column("o_custkey"),
                                     value_set=keys), len(keys))
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.table({
            "c_name": pc.take(names, i),
            "o_custkey": batch.column("o_custkey"),
            "o_orderkey": batch.column("l_orderkey"),
            "o_orderdate": batch.column("o_orderdate"),
            "total_cents": pa.array(cents),
            "sum_qty": batch.column("sum_qty")})

    return joined.map_batches(finish, batch_format="pyarrow") \
        .sort(["total_cents", "o_orderkey"], descending=[True, False]) \
        .limit(n)


def q8_market_share(sf_dir: str, region: str = "ASIA",
                    nation: str = "NATION_2") -> pa.Table:
    """TPC-H Q8 shape: per order-year, the ppm share of revenue supplied
    by ``nation`` within the ``region`` customer market.  Supplier and
    customer dimensions fold into broadcast flag arrays (is-target /
    in-region); lineitem pre-aggregates to (orderkey, is_target) pairs —
    at most 2 rows per order — before the one real exchange (the orders
    join); the year rollup is the standard partial-agg reduce and the
    final share divides a ≤ #years-row table on the driver."""
    from ..functions.joins import shuffle_lookup_join
    region_t = pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = [r["r_regionkey"] for r in region_t.to_pylist()
             if r["r_name"] == region]
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet")
    region_nk = pa.array([r["n_nationkey"] for r in nation_t.to_pylist()
                          if r["n_regionkey"] in rkeys], pa.int64())
    target_nk = [r["n_nationkey"] for r in nation_t.to_pylist()
                 if r["n_name"] == nation]
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    side_ref = ray.put((
        supp.column("s_suppkey").combine_chunks(),
        pc.is_in(supp.column("s_nationkey").combine_chunks(),
                 value_set=pa.array(target_nk, pa.int64())),
        cust.column("c_custkey").combine_chunks(),
        pc.is_in(cust.column("c_nationkey").combine_chunks(),
                 value_set=region_nk)))

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def pre(batch: pa.Table) -> pa.Table:
        skeys, s_tgt, _ck, _cr = ray.get(side_ref)
        i = pc.index_in(batch.column("l_suppkey"), value_set=skeys)
        is_target = pc.fill_null(pc.take(s_tgt, i), False)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc = np.rint(batch.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "is_target": is_target,
                      "cp": pa.array(cents * (100 - disc))})
        res = t.group_by(["l_orderkey", "is_target"]).aggregate([("cp", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "is_target": res.column("is_target"),
                         "cp": res.column("cp_sum")})

    pre_agg = partial_aggregate(
        li.map_batches(pre, batch_format="pyarrow"),
        ["l_orderkey", "is_target"], [("cp", "sum", "cp")])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])
    joined = shuffle_lookup_join(
        pre_agg, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("is_target", pa.bool_()),
                               ("cp", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]),
        how="inner")

    def per_year(batch: pa.Table) -> pa.Table:
        _sk, _st, ckeys, c_reg = ray.get(side_ref)
        i = pc.index_in(batch.column("o_custkey"), value_set=ckeys)
        keep = pc.fill_null(pc.take(c_reg, i), False)
        b = batch.filter(keep)
        if len(b) == 0:
            return pa.table({"order_year": pa.array([], pa.int64()),
                             "total_cp": pa.array([], pa.int64()),
                             "nation_cp": pa.array([], pa.int64())})
        year = pc.cast(pc.year(b.column("o_orderdate")), pa.int64())
        cp = b.column("cp").to_numpy(zero_copy_only=False)
        tgt = b.column("is_target").to_numpy(zero_copy_only=False)
        t = pa.table({"order_year": year, "total_cp": pa.array(cp),
                      "nation_cp": pa.array(np.where(tgt, cp, 0))})
        res = t.group_by(["order_year"]).aggregate(
            [("total_cp", "sum"), ("nation_cp", "sum")])
        return pa.table({"order_year": res.column("order_year"),
                         "total_cp": res.column("total_cp_sum"),
                         "nation_cp": res.column("nation_cp_sum")})

    rows = partial_aggregate(
        joined.map_batches(per_year, batch_format="pyarrow"),
        ["order_year"], [("total_cp", "sum", "total_cp"),
                         ("nation_cp", "sum", "nation_cp")]).take_all()
    rows.sort(key=lambda r: r["order_year"])
    total = np.array([r["total_cp"] for r in rows], np.int64)
    nat = np.array([r["nation_cp"] for r in rows], np.int64)
    share = nat * 1_000_000 // np.maximum(total, 1)
    return pa.table({
        "order_year": pa.array([r["order_year"] for r in rows], pa.int64()),
        "total_cp": pa.array(total),
        "nation_cp": pa.array(nat),
        "share_ppm": pa.array(share)})


def chunk_dedup_stats(sf_dir: str, chunk_tokens: int = 8) -> ray.data.Dataset:
    """Boilerplate profiling for LLM curation: split every document into
    non-overlapping ``chunk_tokens``-token chunks and count, per document,
    how many chunk positions also occur in at least one OTHER document.
    The chunk shuffle is pre-reduced to (chunk, doc_id, n_occ) partials so
    each exchange row is one distinct chunk-per-doc (a chunk repeated
    inside one doc ships once); the per-chunk group then only counts
    distinct docs.  Docs shorter than one chunk are absent (0 chunks)."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])

    def emit(batch: pa.Table) -> pa.Table:
        ids, chunks, occs = [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            toks = text.split(" ")
            counts: dict = {}
            for k in range(len(toks) // chunk_tokens):
                c = " ".join(toks[k * chunk_tokens:(k + 1) * chunk_tokens])
                counts[c] = counts.get(c, 0) + 1
            for c, n in counts.items():
                ids.append(did)
                chunks.append(c)
                occs.append(n)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "chunk": pa.array(chunks, pa.string()),
                         "n_occ": pa.array(occs, pa.int64())})

    occ = partial_aggregate(docs.map_batches(emit, batch_format="pyarrow"),
                            ["chunk", "doc_id"], [("n_occ", "sum", "n_occ")])

    def per_chunk(group: pa.Table) -> pa.Table:
        dup = len(group) >= 2  # rows are distinct docs by construction
        n = group.column("n_occ")
        return pa.table({
            "doc_id": group.column("doc_id"),
            "n_chunks": n,
            "n_dup_chunks": n if dup else pa.array(
                np.zeros(len(group), np.int64))})

    flags = occ.groupby("chunk").map_groups(per_chunk,
                                            batch_format="pyarrow")
    return partial_aggregate(flags, ["doc_id"],
                             [("n_chunks", "sum", "n_chunks"),
                              ("n_dup_chunks", "sum", "n_dup_chunks")])


def label_centroid_dots(sf_dir: str) -> pa.Table:
    """Distributed vector-sum aggregation over the embedding column: per
    label, the exact integer sum vector (coords scaled ×10⁴), then every
    pairwise dot product label_a ≤ label_b (self-dot = squared norm of
    the sum vector).  Per-batch numpy matmul partials reduce to
    (label, dim) rows — the exchange carries ≤ labels × dims rows per
    batch, never an embedding — and the 640-value final table folds on
    the driver.  At petabyte scale the int64 dot can overflow; a real
    deployment widens to float128/int128 at the driver fold (the
    distributed sums themselves stay well inside int64)."""
    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["embedding", "label"])

    def partial(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column("embedding").to_pylist()) * 10_000
        # DuckDB round() is half-AWAY-from-zero; np.rint is half-even —
        # 2/32000 scaled coords at sf0.001 land exactly on .5 and diverge
        m = np.copysign(np.floor(np.abs(m) + 0.5), m).astype(np.int64)
        labels = np.asarray(batch.column("label").to_pylist())
        uniq = np.unique(labels)
        out_lab, out_dim, out_s = [], [], []
        for lab in uniq:
            s = m[labels == lab].sum(axis=0)
            out_lab.extend([lab] * m.shape[1])
            out_dim.extend(range(1, m.shape[1] + 1))
            out_s.extend(s.tolist())
        return pa.table({"label": pa.array(out_lab, pa.int64()),
                         "dim": pa.array(out_dim, pa.int64()),
                         "s": pa.array(out_s, pa.int64())})

    rows = partial_aggregate(emb.map_batches(partial, batch_format="pyarrow"),
                             ["label", "dim"], [("s", "sum", "s")]).take_all()
    labs = sorted({r["label"] for r in rows})
    ndim = max(r["dim"] for r in rows)
    mat = np.zeros((len(labs), ndim), np.int64)
    pos = {l: i for i, l in enumerate(labs)}
    for r in rows:
        mat[pos[r["label"]], r["dim"] - 1] = r["s"]
    la, lb, dots = [], [], []
    for i, a in enumerate(labs):
        for j in range(i, len(labs)):
            la.append(a)
            lb.append(labs[j])
            dots.append(int(mat[i] @ mat[j]))
    return pa.table({"label_a": pa.array(la, pa.int64()),
                     "label_b": pa.array(lb, pa.int64()),
                     "dot": pa.array(dots, pa.int64())})


def q21_last_ship_supplier(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q21 shape (adapted to the columns present): among orders
    fulfilled by ≥ 2 distinct suppliers, count per supplier how often it
    shipped the order's LAST line (max shipdate; date ties break to the
    smaller suppkey).  Lineitem pre-reduces to (orderkey, suppkey,
    max_ship) — bounded by suppliers-per-order — before the per-order
    argmax group, and the winner rows fold with the standard count
    reduce."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey",
                                     "l_shipdate"])

    def pre(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["l_orderkey", "l_suppkey"]) \
            .aggregate([("l_shipdate", "max")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "l_suppkey": res.column("l_suppkey"),
                         "max_ship": res.column("l_shipdate_max")})

    per_pair = partial_aggregate(
        li.map_batches(pre, batch_format="pyarrow"),
        ["l_orderkey", "l_suppkey"], [("max_ship", "max", "max_ship")])

    def last_supplier(group: pa.Table) -> pa.Table:
        if len(group) < 2:
            return pa.table({"l_suppkey": pa.array([], pa.int64())})
        ship = group.column("max_ship").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        supp = group.column("l_suppkey").to_numpy(zero_copy_only=False)
        i = np.lexsort((supp, -ship))[0]
        return pa.table({"l_suppkey": pa.array([int(supp[i])], pa.int64())})

    winners = per_pair.groupby("l_orderkey").map_groups(
        last_supplier, batch_format="pyarrow")

    def ones(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_suppkey": batch.column("l_suppkey"),
                      "one": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["l_suppkey"]).aggregate([("one", "sum")])
        return pa.table({"l_suppkey": res.column("l_suppkey"),
                         "n_last_ship_orders": res.column("one_sum")})

    return partial_aggregate(
        winners.map_batches(ones, batch_format="pyarrow"),
        ["l_suppkey"], [("n_last_ship_orders", "sum", "n_last_ship_orders")])


def docs_matching_all_terms(
        sf_dir: str,
        terms: tuple = ("table", "query", "value")) -> ray.data.Dataset:
    """Conjunctive boolean retrieval (AND of all ``terms`` as whole
    tokens) — the multi-term filter a training-data search runs before
    ranking.  Purely embarrassingly parallel: each batch pads the text
    with sentinel spaces and ANDs one vectorized substring kernel per
    term; nothing shuffles."""

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])

    def match(batch: pa.Table) -> pa.Table:
        padded = pc.binary_join_element_wise(
            " ", batch.column("text"), " ", "")
        keep = None
        for t in terms:
            m = pc.match_substring(padded, f" {t} ")
            keep = m if keep is None else pc.and_(keep, m)
        return pa.table({"doc_id": batch.column("doc_id").filter(keep)})

    return docs.map_batches(match, batch_format="pyarrow")


def value_mad_by_event_type(sf_dir: str) -> ray.data.Dataset:
    """Robust two-moment statistic: per event type, the lower-median of
    value (cents) and the median absolute deviation around it.  Raw rows
    NEVER shuffle: each batch pre-reduces to a (type, cents, n) histogram
    — event values are integral cents so the histogram is bounded by the
    distinct-value count — one exchange reduces it, and each type's group
    computes both quantiles from its weighted histogram in one pass
    (cumsum select at rank (n-1)//2, the quantile_disc 0.5 element)."""
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def hist(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({"event_type": batch.column("event_type"),
                      "cents": pa.array(cents),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["event_type", "cents"]).aggregate([("n", "sum")])
        return pa.table({"event_type": res.column("event_type"),
                         "cents": res.column("cents"),
                         "n": res.column("n_sum")})

    hg = partial_aggregate(ev.map_batches(hist, batch_format="pyarrow"),
                           ["event_type", "cents"], [("n", "sum", "n")])

    def weighted_lower_median(vals: np.ndarray, cnts: np.ndarray) -> int:
        order = np.argsort(vals, kind="stable")
        v, c = vals[order], cnts[order]
        total = int(c.sum())
        idx = (total - 1) // 2
        return int(v[np.searchsorted(np.cumsum(c), idx + 1)])

    def per_type(group: pa.Table) -> pa.Table:
        vals = group.column("cents").to_numpy(zero_copy_only=False)
        cnts = group.column("n").to_numpy(zero_copy_only=False)
        med = weighted_lower_median(vals, cnts)
        mad = weighted_lower_median(np.abs(vals - med), cnts)
        return pa.table({
            "event_type": group.column("event_type").slice(0, 1),
            "median_cents": pa.array([med], pa.int64()),
            "mad_cents": pa.array([mad], pa.int64()),
            "n_events": pa.array([int(cnts.sum())], pa.int64())})

    return hg.groupby("event_type").map_groups(per_type,
                                               batch_format="pyarrow")


def cross_source_dup_docs(sf_dir: str) -> ray.data.Dataset:
    """Incremental-ingest dedup shape: documents whose token-set key
    (sorted distinct tokens — the ``dedup_token_set`` normalization)
    also appears under a DIFFERENT source.  The exchange carries
    (key, doc_id, source) triples hashed by key; each key group scans
    its ≤ dup-set rows once, so cross-source containment never joins
    the corpus against itself."""
    from ..functions.text import token_set_key
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "source"])

    def keyed(batch: pa.Table) -> pa.Table:
        keys = [token_set_key(t) for t in
                batch.column("text").to_pylist()]
        return pa.table({"key": pa.array(keys, pa.string()),
                         "doc_id": batch.column("doc_id"),
                         "source": batch.column("source")})

    def per_key(group: pa.Table) -> pa.Table:
        src = group.column("source").to_pylist()
        if len(set(src)) < 2:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "source": pa.array([], pa.string())})
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        keep = [i for i, s in enumerate(src)
                if any(o != s for o in src)]
        return pa.table({"doc_id": pa.array(ids[keep], pa.int64()),
                         "source": pa.array([src[i] for i in keep])})

    return docs.map_batches(keyed, batch_format="pyarrow") \
        .groupby("key").map_groups(per_key, batch_format="pyarrow")


def user_value_1h_window(sf_dir: str) -> ray.data.Dataset:
    """Per-ROW time-range window (SQL ``RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW``): every event gets the sum of its user's
    value-cents over the trailing hour INCLUDING equal-timestamp peers
    after it, exactly the RANGE-frame peer rule.  One user-keyed
    exchange; inside each group a sort + prefix-cumsum + two
    searchsorteds — O(n log n) per user, no per-row work."""
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id", "ts", "value"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cents = np.rint(group.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts_s, c_s = ts[order], cents[order]
        csum = np.concatenate([[0], np.cumsum(c_s)])
        hour = 3_600_000_000
        hi = np.searchsorted(ts_s, ts_s, side="right")
        lo = np.searchsorted(ts_s, ts_s - hour, side="left")
        w = csum[hi] - csum[lo]
        out = np.empty_like(w)
        out[order] = w
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": group.column("user_id"),
            "ts": group.column("ts"),
            "w_cents": pa.array(out, pa.int64())})

    return ev.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def region_nation_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(region, nation) over order revenue: nation rows,
    region subtotals, and the grand total, super-level keys labelled
    'ALL'.  The fact scan partial-sums at the FINEST level only (≤ 25
    nation rows cross the wire); both super-levels fold from that tiny
    aggregate on the driver — a rollup never needs one exchange per
    level."""
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet")
    region_t = pq.read_table(f"{sf_dir}/region.parquet")
    rname = {r["r_regionkey"]: r["r_name"] for r in region_t.to_pylist()}
    nk2name = {r["n_nationkey"]: r["n_name"] for r in nation_t.to_pylist()}
    nk2region = {r["n_nationkey"]: rname[r["n_regionkey"]]
                 for r in nation_t.to_pylist()}
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    side_ref = ray.put((cust.column("c_custkey").combine_chunks(),
                        cust.column("c_nationkey").combine_chunks()))
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        ckeys, cnk = ray.get(side_ref)
        i = pc.index_in(batch.column("o_custkey"), value_set=ckeys)
        nk = pc.take(cnk, i)
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"nk": nk, "cents": pa.array(cents),
                      "one": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["nk"]).aggregate([("cents", "sum"), ("one", "sum")])
        return pa.table({"nk": res.column("nk"),
                         "cents": res.column("cents_sum"),
                         "n": res.column("one_sum")})

    rows = partial_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["nk"], [("cents", "sum", "cents"), ("n", "sum", "n")]).take_all()
    levels: dict = {}
    for r in rows:
        nk = r["nk"]
        for key in ((nk2region[nk], nk2name[nk]),
                    (nk2region[nk], "ALL"), ("ALL", "ALL")):
            c, n = levels.get(key, (0, 0))
            levels[key] = (c + r["cents"], n + r["n"])
    keys = sorted(levels)
    return pa.table({
        "region_name": pa.array([k[0] for k in keys], pa.string()),
        "nation_name": pa.array([k[1] for k in keys], pa.string()),
        "revenue_cents": pa.array([levels[k][0] for k in keys], pa.int64()),
        "n_orders": pa.array([levels[k][1] for k in keys], pa.int64())})


def top_chunk_overlap_pairs(sf_dir: str, chunk_tokens: int = 8,
                            max_chunk_df: int = 64,
                            n: int = 20) -> ray.data.Dataset:
    """Most-similar document pairs by EXACT shared-chunk count (the
    retrieval complement of chunk_dedup_stats): distinct 8-token chunks
    per doc, per-chunk pair emission with a document-frequency cap —
    chunks shared by more than ``max_chunk_df`` docs are boilerplate,
    not signal, and would emit O(df²) pairs — then a pair-count reduce
    and a deterministic top-``n``.  The cap is part of the operator's
    contract (the SQL oracle applies the same bound)."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])

    def emit(batch: pa.Table) -> pa.Table:
        ids, chunks = [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            toks = text.split(" ")
            seen = set()
            for k in range(len(toks) // chunk_tokens):
                c = " ".join(toks[k * chunk_tokens:(k + 1) * chunk_tokens])
                if c not in seen:
                    seen.add(c)
                    ids.append(did)
                    chunks.append(c)
        return pa.table({"chunk": pa.array(chunks, pa.string()),
                         "doc_id": pa.array(ids, pa.int64())})

    occ = partial_aggregate(
        docs.map_batches(emit, batch_format="pyarrow"),
        ["chunk", "doc_id"], [])

    def pairs(group: pa.Table) -> pa.Table:
        ids = np.sort(group.column("doc_id").to_numpy(zero_copy_only=False))
        if len(ids) < 2 or len(ids) > max_chunk_df:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "n_shared": pa.array([], pa.int64())})
        ai, bi = np.triu_indices(len(ids), k=1)
        return pa.table({"doc_a": pa.array(ids[ai], pa.int64()),
                         "doc_b": pa.array(ids[bi], pa.int64()),
                         "n_shared": pa.array(np.ones(len(ai), np.int64))})

    counted = partial_aggregate(
        occ.groupby("chunk").map_groups(pairs, batch_format="pyarrow"),
        ["doc_a", "doc_b"], [("n_shared", "sum", "n_shared")])
    return counted.sort(["n_shared", "doc_a", "doc_b"],
                        descending=[True, False, False]).limit(n)


def time_rollup_multigrain(sf_dir: str) -> pa.Table:
    """One-pass multi-granularity time rollup (hour → day → week): the
    fact scan partial-sums ONCE at hour grain; the day and week levels
    fold from the bounded hour table on the driver — never three scans,
    never three exchanges.  Week buckets are ISO Monday-start
    (pyarrow floor_temporal == DuckDB date_trunc('week'))."""
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])

    def per_hour(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"bucket": hour, "cents": pa.array(cents),
                      "one": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["bucket"]).aggregate(
            [("cents", "sum"), ("one", "sum")])
        return pa.table({"bucket": res.column("bucket"),
                         "cents": res.column("cents_sum"),
                         "n": res.column("one_sum")})

    hours = partial_aggregate(
        ev.map_batches(per_hour, batch_format="pyarrow"),
        ["bucket"], [("cents", "sum", "cents"), ("n", "sum", "n")]) \
        .take_all()
    out: dict = {}
    for r in hours:
        h = np.datetime64(r["bucket"], "us")
        day = h.astype("datetime64[D]")
        # ISO week: Monday start.  1970-01-01 was a Thursday (weekday 3).
        dayno = day.astype(np.int64)
        week = (day - (dayno + 3) % 7).astype("datetime64[us]")
        for grain, b in (("hour", h), ("day", day.astype("datetime64[us]")),
                         ("week", week)):
            c, n = out.get((grain, b.item()), (0, 0))
            out[(grain, b.item())] = (c + r["cents"], n + r["n"])
    keys = sorted(out, key=lambda k: (k[0], k[1]))
    return pa.table({
        "granularity": pa.array([k[0] for k in keys], pa.string()),
        "bucket": pa.array([k[1] for k in keys], pa.timestamp("us")),
        "n_events": pa.array([out[k][1] for k in keys], pa.int64()),
        "value_cents": pa.array([out[k][0] for k in keys], pa.int64())})


def pareto_customer_cutoff(sf_dir: str, ppm: int = 800_000) -> pa.Table:
    """Pareto concentration probe: the smallest prefix of customers
    (ranked by order revenue, ties → smaller custkey) whose cumulative
    revenue reaches ``ppm`` of the total.  Per-customer sums reduce
    distributed, the ranked aggregate streams back in sorted blocks via
    ``iter_batches`` and the driver keeps ONE running scalar, stopping
    at the crossing — the full customer ranking is never materialized."""
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "cents": pa.array(cents)})
        res = t.group_by(["o_custkey"]).aggregate([("cents", "sum")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "cents": res.column("cents_sum")})

    per_cust = partial_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"], [("cents", "sum", "cents")])
    total = sum(r["cents"] for r in
                per_cust.map_batches(
                    lambda b: pa.table({"cents": pa.array(
                        [pc.sum(b.column("cents")).as_py() or 0],
                        pa.int64())}),
                    batch_format="pyarrow").take_all())
    ranked = per_cust.sort(["cents", "o_custkey"],
                           descending=[True, False])
    cum, k = 0, 0
    for batch in ranked.iter_batches(batch_format="pyarrow"):
        for c in batch.column("cents").to_pylist():
            cum += c
            k += 1
            if cum * 1_000_000 >= ppm * total:
                return pa.table({
                    "n_customers": pa.array([k], pa.int64()),
                    "cum_cents": pa.array([cum], pa.int64()),
                    "total_cents": pa.array([total], pa.int64())})
    return pa.table({"n_customers": pa.array([k], pa.int64()),
                     "cum_cents": pa.array([cum], pa.int64()),
                     "total_cents": pa.array([total], pa.int64())})


def events_dow_hour_share(sf_dir: str) -> pa.Table:
    """Traffic heatmap: event counts by (ISO weekday, hour-of-day) with
    each cell's ppm share WITHIN its weekday row.  The exchange carries
    at most 7 × 24 partial rows per batch; shares divide the tiny final
    matrix on the driver."""
    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts"])

    def cells(batch: pa.Table) -> pa.Table:
        # pyarrow day_of_week: Monday=0 — ISO dow is that +1
        dow = pc.add(pc.day_of_week(batch.column("ts")), 1)
        hour = pc.hour(batch.column("ts"))
        t = pa.table({"isodow": pc.cast(dow, pa.int64()),
                      "hour": pc.cast(hour, pa.int64()),
                      "one": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["isodow", "hour"]).aggregate([("one", "sum")])
        return pa.table({"isodow": res.column("isodow"),
                         "hour": res.column("hour"),
                         "n": res.column("one_sum")})

    rows = partial_aggregate(
        ev.map_batches(cells, batch_format="pyarrow"),
        ["isodow", "hour"], [("n", "sum", "n")]).take_all()
    dow_tot: dict = {}
    for r in rows:
        dow_tot[r["isodow"]] = dow_tot.get(r["isodow"], 0) + r["n"]
    rows.sort(key=lambda r: (r["isodow"], r["hour"]))
    return pa.table({
        "isodow": pa.array([r["isodow"] for r in rows], pa.int64()),
        "hour": pa.array([r["hour"] for r in rows], pa.int64()),
        "n_events": pa.array([r["n"] for r in rows], pa.int64()),
        "share_ppm": pa.array(
            [r["n"] * 1_000_000 // dow_tot[r["isodow"]] for r in rows],
            pa.int64())})


def session_type_pairs(sf_dir: str,
                       gap_seconds: int = 1800) -> ray.data.Dataset:
    """Market-basket co-occurrence over sessions: for every unordered
    pair of event types, in how many sessions (the sessionize_events
    gap rule: new session after a strict >gap silence) both occur.
    One user-keyed exchange; each user group sessionizes with the
    cumsum-of-breaks trick and emits DISTINCT (session, type-pair) rows
    pre-counted per batch before the tiny pair reduce."""
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        types = np.asarray(group.column("event_type").to_pylist())
        order = np.argsort(ts, kind="stable")
        ts_s, ty_s = ts[order], types[order]
        gaps = np.diff(ts_s)
        sid = np.concatenate([[0], np.cumsum(
            gaps > gap_seconds * 1_000_000)])
        pa_, pb_, n_ = [], [], []
        pair_count: dict = {}
        for s in np.unique(sid):
            uniq = sorted(set(ty_s[sid == s]))
            for i in range(len(uniq)):
                for j in range(i + 1, len(uniq)):
                    key = (uniq[i], uniq[j])
                    pair_count[key] = pair_count.get(key, 0) + 1
        for (a, b), n in pair_count.items():
            pa_.append(a)
            pb_.append(b)
            n_.append(n)
        return pa.table({"type_a": pa.array(pa_, pa.string()),
                         "type_b": pa.array(pb_, pa.string()),
                         "n_sessions": pa.array(n_, pa.int64())})

    per_user_pairs = ev.groupby("user_id").map_groups(
        per_user, batch_format="pyarrow")
    return partial_aggregate(per_user_pairs, ["type_a", "type_b"],
                             [("n_sessions", "sum", "n_sessions")])


def q6_forecast_revenue(sf_dir: str, year: int = 1995,
                        min_disc: float = 0.05, max_disc: float = 0.07,
                        max_qty: int = 24) -> ray.data.Dataset:
    """TPC-H Q6: the canonical pushdown-scan scalar — revenue delta from
    a discount band on small-quantity lines shipped in ``year``.  The
    year predicate prunes row groups AT THE READ; the remaining band
    filters and the price×discount fold are one vectorized kernel per
    batch; the exchange carries one partial row per batch.  Revenue unit
    is 10⁻⁴ dollars (cents × discount-percent, both exact ints)."""
    import datetime

    import pyarrow.dataset as pads

    lo = datetime.datetime(year, 1, 1)
    hi = datetime.datetime(year + 1, 1, 1)
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo)
               & (pads.field("l_shipdate") < hi))
    lo_cp = int(round(min_disc * 100))
    hi_cp = int(round(max_disc * 100))

    def partial(batch: pa.Table) -> pa.Table:
        disc = np.rint(batch.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        qty = np.rint(batch.column("l_quantity")
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        keep = (disc >= lo_cp) & (disc <= hi_cp) & (qty < max_qty)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False)[keep] * 100) \
            .astype(np.int64)
        return pa.table({
            "grp": pa.array([0], pa.int64()),
            "revenue_e4": pa.array([int((cents * disc[keep]).sum())],
                                   pa.int64()),
            "n_lines": pa.array([int(keep.sum())], pa.int64())})

    out = partial_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["grp"], [("revenue_e4", "sum", "revenue_e4"),
                  ("n_lines", "sum", "n_lines")])
    return out.select_columns(["revenue_e4", "n_lines"])


def q9_profit_by_nation_year(sf_dir: str,
                             name_contains: str = "red") -> ray.data.Dataset:
    """TPC-H Q9 shape: revenue by supplier nation × order year for parts
    whose name matches a pattern.  The part filter folds to a broadcast
    partkey SET (semi-join applied per batch before anything else — the
    LIKE never touches the fact table), supplier→nation is a broadcast
    array, lineitem pre-aggregates to (orderkey, nation) pairs, and the
    single real exchange joins those pairs to orders for the year."""
    from ..functions.joins import shuffle_lookup_join
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    keep = pc.match_substring(part.column("p_name"), name_contains)
    pkeys = part.filter(keep).column("p_partkey").combine_chunks()
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet")
    nk = nation_t.column("n_nationkey").combine_chunks()
    nn = nation_t.column("n_name").combine_chunks()
    side_ref = ray.put((pkeys, supp.column("s_suppkey").combine_chunks(),
                        supp.column("s_nationkey").combine_chunks(), nk, nn))

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])

    def pre(batch: pa.Table) -> pa.Table:
        pk, sk, snk, nk_, nn_ = ray.get(side_ref)
        sel = pc.is_in(batch.column("l_partkey"), value_set=pk)
        b = batch.filter(sel)
        if len(b) == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "n_name": pa.array([], pa.string()),
                             "cp": pa.array([], pa.int64())})
        si = pc.index_in(b.column("l_suppkey"), value_set=sk)
        s_nat = pc.take(snk, si)
        ni = pc.index_in(s_nat, value_set=nk_)
        names = pc.take(nn_, ni)
        cents = np.rint(b.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc = np.rint(b.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "n_name": names,
                      "cp": pa.array(cents * (100 - disc))})
        res = t.group_by(["l_orderkey", "n_name"]).aggregate([("cp", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "n_name": res.column("n_name"),
                         "cp": res.column("cp_sum")})

    pre_agg = partial_aggregate(
        li.map_batches(pre, batch_format="pyarrow"),
        ["l_orderkey", "n_name"], [("cp", "sum", "cp")])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate"])
    joined = shuffle_lookup_join(
        pre_agg, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("n_name", pa.string()),
                               ("cp", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]),
        how="inner")

    def per_year(batch: pa.Table) -> pa.Table:
        year = pc.cast(pc.year(batch.column("o_orderdate")), pa.int64())
        t = pa.table({"n_name": batch.column("n_name"),
                      "order_year": year, "cp": batch.column("cp")})
        res = t.group_by(["n_name", "order_year"]).aggregate([("cp", "sum")])
        return pa.table({"n_name": res.column("n_name"),
                         "order_year": res.column("order_year"),
                         "revenue_cp": res.column("cp_sum")})

    return partial_aggregate(
        joined.map_batches(per_year, batch_format="pyarrow"),
        ["n_name", "order_year"], [("revenue_cp", "sum", "revenue_cp")])


def q15_top_supplier(sf_dir: str, start: str = "1995-01-01") -> pa.Table:
    """TPC-H Q15: supplier(s) achieving the MAXIMUM revenue over a
    3-month ship window — the scalar-subquery-equality shape, ties kept.
    The windowed read prunes at the scan, revenue reduces to one row per
    supplier (bounded: supplier is a dimension), and the max + equality
    filter fold over that tiny aggregate on the driver."""
    import datetime

    import pyarrow.dataset as pads

    lo = datetime.datetime.fromisoformat(start)
    mo = lo.month + 3
    hi = datetime.datetime(lo.year + (mo - 1) // 12, (mo - 1) % 12 + 1,
                           lo.day)
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo)
               & (pads.field("l_shipdate") < hi))

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        disc = np.rint(batch.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({"l_suppkey": batch.column("l_suppkey"),
                      "cp": pa.array(cents * (100 - disc))})
        res = t.group_by(["l_suppkey"]).aggregate([("cp", "sum")])
        return pa.table({"l_suppkey": res.column("l_suppkey"),
                         "cp": res.column("cp_sum")})

    rows = partial_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_suppkey"], [("cp", "sum", "cp")]).take_all()
    best = max((r["cp"] for r in rows), default=0)
    winners = sorted(r["l_suppkey"] for r in rows if r["cp"] == best)
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    name = dict(zip(supp.column("s_suppkey").to_pylist(),
                    supp.column("s_name").to_pylist()))
    return pa.table({
        "s_suppkey": pa.array(winners, pa.int64()),
        "s_name": pa.array([name[s] for s in winners], pa.string()),
        "total_cp": pa.array([best] * len(winners), pa.int64())})


def q20_dominant_suppliers(sf_dir: str,
                           ppm: int = 200_000) -> pa.Table:
    """TPC-H Q20 shape (adapted): suppliers who shipped STRICTLY more
    than ``ppm`` (default a fifth) of some part's total quantity, counted
    by how many parts they dominate.  The ratio joins two aggregates at
    different grains — (part, supplier) pairs vs part totals — inside
    one part-keyed group (the totals never broadcast, skew-safe), then
    the winners fold with the standard count reduce."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey",
                                     "l_quantity"])

    def pair(batch: pa.Table) -> pa.Table:
        qty = np.rint(batch.column("l_quantity")
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "l_suppkey": batch.column("l_suppkey"),
                      "q": pa.array(qty)})
        res = t.group_by(["l_partkey", "l_suppkey"]).aggregate([("q", "sum")])
        return pa.table({"l_partkey": res.column("l_partkey"),
                         "l_suppkey": res.column("l_suppkey"),
                         "q": res.column("q_sum")})

    pairs = partial_aggregate(
        li.map_batches(pair, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], [("q", "sum", "q")])

    def stamp(batch: pa.Table) -> pa.Table:
        return batch.append_column("__b",
                                   bucket_ids(batch, ["l_partkey"]))

    def dominant(group: pa.Table) -> pa.Table:
        # vectorized per BUCKET (≤256 groups): sort by part, segment-sum
        # totals via reduceat, filter winners, pre-count per supplier —
        # never one Python call per distinct part (150 k parts ≈ 9 s of
        # dispatch overhead at sf0.1, measured round 1)
        if len(group) == 0:
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "n_dominated_parts": pa.array([], pa.int64())})
        part = group.column("l_partkey").to_numpy(zero_copy_only=False)
        q = group.column("q").to_numpy(zero_copy_only=False)
        order = np.argsort(part, kind="stable")
        part_s, q_s = part[order], q[order]
        starts = np.flatnonzero(np.r_[True, part_s[1:] != part_s[:-1]])
        totals = np.add.reduceat(q_s, starts)
        runs = np.diff(np.r_[starts, len(part_s)])
        keep = q_s * 1_000_000 > ppm * np.repeat(totals, runs)
        t = pa.table({
            "l_suppkey": group.column("l_suppkey")
            .take(pa.array(order[keep])),
            "one": pa.array(np.ones(int(keep.sum()), np.int64))})
        res = t.group_by(["l_suppkey"]).aggregate([("one", "sum")])
        return pa.table({"l_suppkey": res.column("l_suppkey"),
                         "n_dominated_parts": res.column("one_sum")})

    winners = pairs.map_batches(stamp, batch_format="pyarrow") \
        .groupby("__b").map_groups(dominant, batch_format="pyarrow")

    agg = partial_aggregate(
        winners, ["l_suppkey"],
        [("n_dominated_parts", "sum", "n_dominated_parts")])
    # bounded (≤ |supplier| rows) and legitimately empty when no supplier
    # crosses the bar — seed a typed table so the schema survives 0 rows
    seed = pa.table({"l_suppkey": pa.array([], pa.int64()),
                     "n_dominated_parts": pa.array([], pa.int64())})
    return pa.concat_tables(
        [seed] + [b.select(["l_suppkey", "n_dominated_parts"])
                  for b in agg.iter_batches(batch_format="pyarrow")])


def q12_late_lines_by_priority(sf_dir: str, grace_days: int = 60
                               ) -> ray.data.Dataset:
    """TPC-H Q12 shape adapted to this schema (no l_shipmode /
    l_receiptdate in the testdata): per l_returnflag, count late-shipped
    lines (l_shipdate > o_orderdate + grace) split into high-priority
    (URGENT/HIGH) vs low-priority orders.  Order priority is resolved by
    ONE shuffle equi-join on orderkey; the priority CASE and the lateness
    predicate fold per batch, and the final groupby carries ≤ |flags|
    partial rows per task."""
    from ..functions.joins import shuffle_lookup_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_returnflag",
                                     "l_shipdate"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate",
                                         "o_orderpriority"])
    joined = shuffle_lookup_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_returnflag", pa.string()),
                               ("l_shipdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_orderpriority", pa.string())]),
        how="inner")
    grace_us = np.int64(grace_days) * 86_400_000_000

    def per_batch(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        odt = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        late = ship > odt + grace_us
        b = batch.filter(pa.array(late))
        if len(b) == 0:
            return pa.table({"l_returnflag": pa.array([], pa.string()),
                             "high_line_count": pa.array([], pa.int64()),
                             "low_line_count": pa.array([], pa.int64())})
        pri = b.column("o_orderpriority")
        hi = pc.or_(pc.equal(pri, "1-URGENT"), pc.equal(pri, "2-HIGH"))
        hi64 = pc.cast(hi, pa.int64())
        t = pa.table({"l_returnflag": b.column("l_returnflag"),
                      "high": hi64,
                      "low": pc.subtract(pa.scalar(1, pa.int64()), hi64)})
        res = t.group_by(["l_returnflag"]).aggregate(
            [("high", "sum"), ("low", "sum")])
        return pa.table({"l_returnflag": res.column("l_returnflag"),
                         "high_line_count": res.column("high_sum"),
                         "low_line_count": res.column("low_sum")})

    return partial_aggregate(
        joined.map_batches(per_batch, batch_format="pyarrow"),
        ["l_returnflag"], [("high_line_count", "sum", "high_line_count"),
                           ("low_line_count", "sum", "low_line_count")])


def q16_supplier_variety(sf_dir: str, excl_brand: str = "Brand#1"
                         ) -> ray.data.Dataset:
    """TPC-H Q16 shape adapted (no partsupp table): per (p_brand,
    p_size), the number of DISTINCT suppliers that shipped the part —
    excluding one brand and excluding "complaint" suppliers
    (s_acctbal < 0 stands in for the LIKE '%Complaints%' anti-join).
    Part attributes and the tiny excluded-supplier set broadcast; the
    fact table reduces to distinct (brand, size, suppkey) triples inside
    each batch, ONE exchange dedups them globally, and the final count
    is a second tiny aggregate."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    keep = pc.invert(pc.equal(part.column("p_brand"), excl_brand))
    part = part.filter(keep)
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_acctbal"])
    bad = supp.filter(pc.less(supp.column("s_acctbal"), 0.0)) \
        .column("s_suppkey").combine_chunks()
    side_ref = ray.put((part.column("p_partkey").combine_chunks(),
                        part.column("p_brand").combine_chunks(),
                        pc.cast(part.column("p_size"),
                                pa.int64()).combine_chunks(), bad))

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey"])

    def triples(batch: pa.Table) -> pa.Table:
        pk, brand, size, bad_s = ray.get(side_ref)
        b = batch.filter(pc.and_(
            pc.is_in(batch.column("l_partkey"), value_set=pk),
            pc.invert(pc.is_in(batch.column("l_suppkey"),
                               value_set=bad_s))))
        if len(b) == 0:
            return pa.table({"p_brand": pa.array([], pa.string()),
                             "p_size": pa.array([], pa.int64()),
                             "l_suppkey": pa.array([], pa.int64())})
        pi = pc.index_in(b.column("l_partkey"), value_set=pk)
        t = pa.table({"p_brand": pc.take(brand, pi),
                      "p_size": pc.take(size, pi),
                      "l_suppkey": b.column("l_suppkey")})
        res = t.group_by(["p_brand", "p_size", "l_suppkey"]) \
            .aggregate([])
        return res.select(["p_brand", "p_size", "l_suppkey"])

    distinct = partial_aggregate(
        li.map_batches(triples, batch_format="pyarrow"),
        ["p_brand", "p_size", "l_suppkey"], [])

    def count_suppliers(batch: pa.Table) -> pa.Table:
        t = pa.table({"p_brand": batch.column("p_brand"),
                      "p_size": batch.column("p_size"),
                      "one": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["p_brand", "p_size"]).aggregate([("one", "sum")])
        return pa.table({"p_brand": res.column("p_brand"),
                         "p_size": res.column("p_size"),
                         "supplier_cnt": res.column("one_sum")})

    return partial_aggregate(
        distinct.map_batches(count_suppliers, batch_format="pyarrow"),
        ["p_brand", "p_size"], [("supplier_cnt", "sum", "supplier_cnt")])


def doc_token_commonness(sf_dir: str) -> ray.data.Dataset:
    """Corpus-frequency document scoring, fully distributed: pass 1
    computes global token counts (partial-agg groupby over exploded
    tokens — the vocabulary is NOT assumed to fit on the driver); pass 2
    re-explodes each doc and joins the counts back by ONE shuffle
    equi-join on the token, then re-aggregates per doc to an integer
    commonness profile (sum + min of global counts, token count).  The
    rarest-token minimum is the classic rare-word quality signal."""
    from ..functions.joins import shuffle_lookup_join
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(batch.column("doc_id")
                        .to_numpy(zero_copy_only=False), n)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "tok": flat})

    exploded = docs.map_batches(explode, batch_format="pyarrow")

    def local_counts(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["tok"]).aggregate([("tok", "count")])
        return pa.table({"tok": res.column("tok"),
                         "n": pc.cast(res.column("tok_count"), pa.int64())})

    vocab = partial_aggregate(
        exploded.map_batches(local_counts, batch_format="pyarrow"),
        ["tok"], [("n", "sum", "n")])

    joined = shuffle_lookup_join(
        exploded, vocab, on="tok", right_on="tok",
        left_schema=pa.schema([("doc_id", pa.int64()),
                               ("tok", pa.string())]),
        right_schema=pa.schema([("tok", pa.string()),
                                ("n", pa.int64())]),
        how="inner")

    def per_doc(batch: pa.Table) -> pa.Table:
        t = pa.table({"doc_id": batch.column("doc_id"),
                      "n": batch.column("n"),
                      "one": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["doc_id"]).aggregate(
            [("n", "sum"), ("n", "min"), ("one", "sum")])
        return pa.table({"doc_id": res.column("doc_id"),
                         "sum_commonness": res.column("n_sum"),
                         "min_commonness": res.column("n_min"),
                         "n_tokens": res.column("one_sum")})

    return partial_aggregate(
        joined.map_batches(per_doc, batch_format="pyarrow"),
        ["doc_id"], [("sum_commonness", "sum", "sum_commonness"),
                     ("min_commonness", "min", "min_commonness"),
                     ("n_tokens", "sum", "n_tokens")])


def user_ping_pong_transitions(sf_dir: str) -> ray.data.Dataset:
    """Per-user A→B→A "ping-pong" pattern counts over the (ts, event_id)-
    ordered event-type sequence — the LAG/LEAD window shape with a
    3-term predicate (prev == next != cur).  The per-user kernel emits
    local (a_type, b_type) pattern counts, so the final exchange carries
    ≤ |types|² partials per group."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def per_user(group: pa.Table) -> pa.Table:
        empty = pa.table({"a_type": pa.array([], pa.string()),
                          "b_type": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if len(group) < 3:
            return empty
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(group.column("event_type").to_pylist(),
                        dtype=object)
        s = et[np.lexsort((eid, ts))]
        hit = (s[:-2] == s[2:]) & (s[:-2] != s[1:-1])
        if not hit.any():
            return empty
        p = pa.table({"a_type": pa.array(s[:-2][hit], pa.string()),
                      "b_type": pa.array(s[1:-1][hit], pa.string())})
        res = p.group_by(["a_type", "b_type"]) \
            .aggregate([("a_type", "count")])
        return pa.table({"a_type": res.column("a_type"),
                         "b_type": res.column("b_type"),
                         "n": pc.cast(res.column("a_type_count"),
                                      pa.int64())})

    partials = ds.groupby("user_id").map_groups(per_user,
                                                batch_format="pyarrow")
    return partial_aggregate(partials, ["a_type", "b_type"],
                             [("n", "sum", "n")])


def doc_chunks_sliding(sf_dir: str, chunk_tokens: int = 6,
                       stride: int = 4) -> ray.data.Dataset:
    """RAG/training-style sliding-window chunker: each document explodes
    into overlapping token windows (size ``chunk_tokens``, step
    ``stride``; the final partial window is kept).  Pure per-batch
    flat-map — no exchange at all; at 100 TB this is embarrassingly
    parallel and the chunk rows stream straight to the consumer."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])

    def chunker(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_idx, out_txt, out_n = [], [], [], []
        tl = toks.to_pylist()
        for did, n, tk in zip(ids, lens, tl):
            for ci, s in enumerate(range(0, int(n), stride)):
                w = tk[s:s + chunk_tokens]
                out_id.append(did)
                out_idx.append(ci)
                out_txt.append(" ".join(w))
                out_n.append(len(w))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "chunk_idx": pa.array(out_idx, pa.int64()),
                         "chunk_text": pa.array(out_txt, pa.string()),
                         "n_tokens": pa.array(out_n, pa.int64())})

    return docs.map_batches(chunker, batch_format="pyarrow")


def tokens_in_all_langs(sf_dir: str) -> ray.data.Dataset:
    """Relational division: tokens that appear in documents of EVERY
    language.  Distinct (token, lang) pairs reduce per batch, one
    exchange counts distinct langs per token, and the divisor (total
    distinct languages — a bounded dimension) comes from the same tiny
    aggregate; the qualifying tokens keep their corpus doc counts."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang"])

    def pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lang = np.repeat(np.asarray(batch.column("lang").to_pylist(),
                                    dtype=object), n)
        did = np.repeat(batch.column("doc_id")
                        .to_numpy(zero_copy_only=False), n)
        t = pa.table({"tok": pc.list_flatten(toks),
                      "lang": pa.array(lang, pa.string()),
                      "doc_id": pa.array(did, pa.int64())})
        return t.group_by(["tok", "lang", "doc_id"]).aggregate([]) \
            .select(["tok", "lang", "doc_id"])

    tld = partial_aggregate(
        docs.map_batches(pairs, batch_format="pyarrow"),
        ["tok", "lang", "doc_id"], [])

    def fold(batch: pa.Table) -> pa.Table:
        tl = batch.group_by(["tok", "lang"]).aggregate([])
        td = batch.group_by(["tok", "doc_id"]).aggregate([])
        a = pa.table({"tok": tl.column("tok"), "lang": tl.column("lang"),
                      "is_lang": pa.array(np.ones(len(tl), np.int64)),
                      "is_doc": pa.array(np.zeros(len(tl), np.int64))})
        b = pa.table({"tok": td.column("tok"),
                      "lang": pa.array([""] * len(td), pa.string()),
                      "is_lang": pa.array(np.zeros(len(td), np.int64)),
                      "is_doc": pa.array(np.ones(len(td), np.int64))})
        return pa.concat_tables([a, b])

    # (tok,lang,doc) triples are already distinct globally, so per-token
    # lang/doc counts are exact after ONE more exchange over the folded
    # marker rows (lang-distinct rows carry is_lang, doc-distinct is_doc).
    folded = partial_aggregate(
        tld.map_batches(fold, batch_format="pyarrow"),
        ["tok", "lang"], [("is_lang", "max", "is_lang"),
                          ("is_doc", "sum", "is_doc")])

    def per_tok(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["tok"]).aggregate(
            [("is_lang", "sum"), ("is_doc", "sum")])
        return pa.table({"tok": res.column("tok"),
                         "n_langs": res.column("is_lang_sum"),
                         "n_docs": res.column("is_doc_sum")})

    per = partial_aggregate(
        folded.map_batches(per_tok, batch_format="pyarrow"),
        ["tok"], [("n_langs", "sum", "n_langs"),
                  ("n_docs", "sum", "n_docs")]).materialize()
    total_langs = len(pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["lang"])
        .column("lang").unique())
    return per.filter(lambda r, t=total_langs: r["n_langs"] == t)


def customer_rfm_scores(sf_dir: str, k: int = 4) -> pa.Table:
    """RFM customer scoring: per-customer recency (last order date),
    frequency (order count) and monetary (total cents) reduce via ONE
    partial-agg exchange to a dimension-bounded table; the NTILE(k)
    scores over (metric, custkey) fold on the driver (bounded by
    |customer|, documented — the fact table never leaves the cluster).
    rfm_code = 100·r + 10·f + m, the classic segmentation key."""
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_orderdate",
                                         "o_totalprice"])

    def per_batch(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "last_us": pa.array(ts),
                      "cents": pa.array(cents),
                      "one": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["o_custkey"]).aggregate(
            [("last_us", "max"), ("cents", "sum"), ("one", "sum")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "last_us": res.column("last_us_max"),
                         "cents": res.column("cents_sum"),
                         "n_orders": res.column("one_sum")})

    agg = partial_aggregate(
        orders.map_batches(per_batch, batch_format="pyarrow"),
        ["o_custkey"], [("last_us", "max", "last_us"),
                        ("cents", "sum", "cents"),
                        ("n_orders", "sum", "n_orders")]).take_all()
    ck = np.array([r["o_custkey"] for r in agg], np.int64)
    last = np.array([r["last_us"] for r in agg], np.int64)
    cents = np.array([r["cents"] for r in agg], np.int64)
    nord = np.array([r["n_orders"] for r in agg], np.int64)
    n = len(ck)

    def ntile(metric: np.ndarray) -> np.ndarray:
        rnk = np.empty(n, np.int64)
        rnk[np.lexsort((ck, metric))] = np.arange(n)
        big, small = n % k, n // k
        size_big = small + 1
        cut = big * size_big
        return np.where(rnk < cut, rnk // max(size_big, 1) + 1,
                        big + (rnk - cut) // max(small, 1) + 1)

    r, f, m = ntile(last), ntile(nord), ntile(cents)
    order = np.argsort(ck)
    return pa.table({"o_custkey": pa.array(ck[order]),
                     "r_score": pa.array(r[order]),
                     "f_score": pa.array(f[order]),
                     "m_score": pa.array(m[order]),
                     "rfm_code": pa.array((100 * r + 10 * f + m)[order])})


def value_decile_matrix(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Cross-tab of event types against GLOBAL value deciles — the
    doc_length_deciles distributed-rank pattern (coarse value buckets →
    driver prefix-sum → per-bucket rank stamp → SQL NTILE formula) with
    a per-(type, decile) count reduce on top, so the output is the
    |types| × k contingency matrix and no single node ever sorts the
    fact table."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])
    width = 8.0

    def bucket_partial(batch: pa.Table) -> pa.Table:
        bkt = np.floor(batch.column("value")
                       .to_numpy(zero_copy_only=False) / width)
        return pa.table({"bkt": pa.array(bkt.astype(np.int64)),
                         "one": pa.array(np.ones(len(batch), np.int64))})

    per_bkt = partial_aggregate(
        ds.map_batches(bucket_partial, batch_format="pyarrow"),
        ["bkt"], [("one", "sum", "n")]).take_all()
    bks = np.array([r["bkt"] for r in per_bkt], np.int64)
    ns = np.array([r["n"] for r in per_bkt], np.int64)
    order = np.argsort(bks)
    bks, ns = bks[order], ns[order]
    offs = np.concatenate([[0], np.cumsum(ns)[:-1]])
    total = int(ns.sum())
    side_ref = ray.put((bks, offs, total))

    def add_bucket(batch: pa.Table) -> pa.Table:
        bkt = np.floor(batch.column("value")
                       .to_numpy(zero_copy_only=False) / width)
        return batch.append_column("bkt", pa.array(bkt.astype(np.int64)))

    def stamp(group: pa.Table) -> pa.Table:
        sb, so, n = ray.get(side_ref)
        v = group.column("value").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        local = np.lexsort((eid, v))
        rnk = np.empty(len(group), dtype=np.int64)
        base = so[np.searchsorted(sb, group.column("bkt")[0].as_py())]
        rnk[local] = base + np.arange(len(group), dtype=np.int64)
        big, small = n % k, n // k
        size_big = small + 1
        cut = big * size_big
        dec = np.where(rnk < cut,
                       rnk // max(size_big, 1) + 1,
                       big + (rnk - cut) // max(small, 1) + 1)
        t = pa.table({"event_type": group.column("event_type"),
                      "decile": pa.array(dec.astype(np.int64)),
                      "one": pa.array(np.ones(len(group), np.int64))})
        res = t.group_by(["event_type", "decile"]).aggregate(
            [("one", "sum")])
        return pa.table({"event_type": res.column("event_type"),
                         "decile": res.column("decile"),
                         "n": res.column("one_sum")})

    stamped = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bkt").map_groups(stamp, batch_format="pyarrow")
    return partial_aggregate(stamped, ["event_type", "decile"],
                             [("n", "sum", "n")])


def user_active_day_streaks(sf_dir: str) -> ray.data.Dataset:
    """Gaps-and-islands: per user, total distinct active days and the
    LONGEST run of consecutive calendar days.  Distinct (user, day)
    pairs reduce per batch, one exchange groups each user's day set, and
    the island scan is a vectorized diff over the sorted day ints — the
    SQL ``day - ROW_NUMBER()`` trick without ever materializing row
    numbers."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def days(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        t = pa.table({"user_id": batch.column("user_id"),
                      "day": pa.array(d)})
        return t.group_by(["user_id", "day"]).aggregate([]) \
            .select(["user_id", "day"])

    per_day = partial_aggregate(
        ds.map_batches(days, batch_format="pyarrow"),
        ["user_id", "day"], [])

    def per_user(group: pa.Table) -> pa.Table:
        d = np.sort(group.column("day").to_numpy(zero_copy_only=False))
        runs = np.split(np.arange(len(d)),
                        np.flatnonzero(np.diff(d) != 1) + 1)
        longest = max(len(r) for r in runs)
        return pa.table({
            "user_id": group.column("user_id")[:1],
            "n_active_days": pa.array([len(d)], pa.int64()),
            "longest_streak": pa.array([longest], pa.int64())})

    return per_day.groupby("user_id").map_groups(per_user,
                                                 batch_format="pyarrow")


def mutual_top_partner_nations(sf_dir: str) -> pa.Table:
    """Reciprocal-best-match over the directed trade-volume matrix:
    nation A's top partner (by supplier→customer revenue, ties by
    partner name) is B AND B's top partner is A.  The fact table
    resolves supplier nation per batch (broadcast), joins orders for the
    customer nation via ONE shuffle, and reduces to the |nations|²
    volume matrix; the argmax + mutuality fold over that tiny matrix on
    the driver."""
    from ..functions.joins import shuffle_lookup_join
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    side_ref = ray.put((
        supp.column("s_suppkey").combine_chunks(),
        supp.column("s_nationkey").combine_chunks(),
        cust.column("c_custkey").combine_chunks(),
        cust.column("c_nationkey").combine_chunks(),
        nation_t.column("n_nationkey").combine_chunks(),
        nation_t.column("n_name").combine_chunks()))

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey",
                                     "l_extendedprice"])

    def pre(batch: pa.Table) -> pa.Table:
        sk, snk, _, _, nk, nn = ray.get(side_ref)
        si = pc.index_in(batch.column("l_suppkey"), value_set=sk)
        ni = pc.index_in(pc.take(snk, si), value_set=nk)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "supp_nation": pc.take(nn, ni),
                      "cents": pa.array(cents)})
        res = t.group_by(["l_orderkey", "supp_nation"]).aggregate(
            [("cents", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "supp_nation": res.column("supp_nation"),
                         "cents": res.column("cents_sum")})

    pre_agg = partial_aggregate(
        li.map_batches(pre, batch_format="pyarrow"),
        ["l_orderkey", "supp_nation"], [("cents", "sum", "cents")])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    joined = shuffle_lookup_join(
        pre_agg, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("supp_nation", pa.string()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]),
        how="inner")

    def cust_nation(batch: pa.Table) -> pa.Table:
        _, _, ck, cnk, nk, nn = ray.get(side_ref)
        ci = pc.index_in(batch.column("o_custkey"), value_set=ck)
        ni = pc.index_in(pc.take(cnk, ci), value_set=nk)
        t = pa.table({"supp_nation": batch.column("supp_nation"),
                      "cust_nation": pc.take(nn, ni),
                      "cents": batch.column("cents")})
        res = t.group_by(["supp_nation", "cust_nation"]).aggregate(
            [("cents", "sum")])
        return pa.table({"supp_nation": res.column("supp_nation"),
                         "cust_nation": res.column("cust_nation"),
                         "cents": res.column("cents_sum")})

    mat = partial_aggregate(
        joined.map_batches(cust_nation, batch_format="pyarrow"),
        ["supp_nation", "cust_nation"],
        [("cents", "sum", "cents")]).take_all()
    vol = {}
    for r in mat:
        if r["supp_nation"] != r["cust_nation"]:
            vol[(r["supp_nation"], r["cust_nation"])] = r["cents"]
    best = {}
    for (a, b), v in sorted(vol.items()):
        cur = best.get(a)
        if cur is None or v > cur[1] or (v == cur[1] and b < cur[0]):
            best[a] = (b, v)
    rows = []
    for a, (b, v_ab) in sorted(best.items()):
        if a < b and b in best and best[b][0] == a:
            rows.append((a, b, v_ab, best[b][1]))
    return pa.table({
        "nation_a": pa.array([r[0] for r in rows], pa.string()),
        "nation_b": pa.array([r[1] for r in rows], pa.string()),
        "volume_ab": pa.array([r[2] for r in rows], pa.int64()),
        "volume_ba": pa.array([r[3] for r in rows], pa.int64())})


def embedding_quantize_int8(sf_dir: str) -> ray.data.Dataset:
    """Symmetric int8 quantization per vector (q = trunc(127·x/max|x|),
    the standard weight/embedding compression step): per-vector integer
    checksums (sum, min, max) plus the 1e6-scaled scale factor come out
    of ONE stateless map_batches — no exchange.  trunc (not round) keeps
    the oracle comparison exact across numpy and SQL rounding modes."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])

    def quant(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = pc.list_value_length(emb).to_numpy(zero_copy_only=False)
        mat = flat.reshape(len(batch), -1) if len(set(n)) == 1 else None
        if mat is None:  # ragged fallback
            out = []
            off = 0
            for ln in n:
                out.append(flat[off:off + ln])
                off += ln
            mats = out
        else:
            mats = mat
        sums, mins, maxs, scales = [], [], [], []
        for row in mats:
            m = np.abs(row).max()
            q = np.trunc(127.0 * row / m).astype(np.int64) if m > 0 \
                else np.zeros(len(row), np.int64)
            sums.append(int(q.sum()))
            mins.append(int(q.min()))
            maxs.append(int(q.max()))
            scales.append(int(np.trunc(m * 1_000_000)))
        return pa.table({"vec_id": batch.column("vec_id"),
                         "q_sum": pa.array(sums, pa.int64()),
                         "q_min": pa.array(mins, pa.int64()),
                         "q_max": pa.array(maxs, pa.int64()),
                         "scale_e6": pa.array(scales, pa.int64())})

    return ds.map_batches(quant, batch_format="pyarrow")


def daily_new_vs_returning(sf_dir: str) -> ray.data.Dataset:
    """Growth-accounting split: per calendar day, how many active users
    are NEW (first-ever activity) vs RETURNING.  Distinct (user, day)
    pairs reduce per batch; per-user first days come from the same
    partial-agg (min) exchange; new counts read off the first-day table
    directly (one row per user) and returning counts join each user's
    later days back by ONE shuffle on user_id."""
    from ..functions.joins import shuffle_lookup_join
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def days(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        t = pa.table({"user_id": batch.column("user_id"),
                      "day": pa.array(d)})
        return t.group_by(["user_id", "day"]).aggregate([]) \
            .select(["user_id", "day"])

    per_day = partial_aggregate(
        ds.map_batches(days, batch_format="pyarrow"),
        ["user_id", "day"], [])
    first = partial_aggregate(
        per_day, ["user_id"], [("day", "min", "first_day")])

    def new_counts(batch: pa.Table) -> pa.Table:
        t = pa.table({"day": batch.column("first_day"),
                      "new_users": pa.array(np.ones(len(batch),
                                                    np.int64)),
                      "returning_users": pa.array(np.zeros(len(batch),
                                                           np.int64))})
        return t.group_by(["day"]).aggregate(
            [("new_users", "sum"), ("returning_users", "sum")])

    news = first.map_batches(new_counts, batch_format="pyarrow") \
        .map_batches(lambda b: pa.table({
            "day": b.column("day"),
            "new_users": b.column("new_users_sum"),
            "returning_users": b.column("returning_users_sum")}),
            batch_format="pyarrow")

    joined = shuffle_lookup_join(
        per_day, first, on="user_id", right_on="user_id",
        left_schema=pa.schema([("user_id", pa.int64()),
                               ("day", pa.int64())]),
        right_schema=pa.schema([("user_id", pa.int64()),
                                ("first_day", pa.int64())]),
        how="inner")

    def ret_counts(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater(batch.column("day"),
                                    batch.column("first_day")))
        t = pa.table({"day": b.column("day"),
                      "new_users": pa.array(np.zeros(len(b), np.int64)),
                      "returning_users": pa.array(np.ones(len(b),
                                                          np.int64))})
        res = t.group_by(["day"]).aggregate(
            [("new_users", "sum"), ("returning_users", "sum")])
        return pa.table({"day": res.column("day"),
                         "new_users": res.column("new_users_sum"),
                         "returning_users":
                             res.column("returning_users_sum")})

    rets = joined.map_batches(ret_counts, batch_format="pyarrow")
    both = news.union(rets)
    agg = partial_aggregate(
        both, ["day"], [("new_users", "sum", "new_users"),
                        ("returning_users", "sum", "returning_users")])

    def to_date(batch: pa.Table) -> pa.Table:
        d = batch.column("day").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype("datetime64[us]")
        return pa.table({"day": pa.array(d),
                         "new_users": batch.column("new_users"),
                         "returning_users":
                             batch.column("returning_users")})

    return agg.map_batches(to_date, batch_format="pyarrow")


def lang_balanced_sample(sf_dir: str, per_lang: int = 40
                         ) -> ray.data.Dataset:
    """Balanced corpus resampling: exactly ``per_lang`` documents per
    language, picked by deterministic md5 order (reproducible across
    runs and cluster sizes).  Distributed top-N-per-group: every batch
    keeps its local N smallest (hash, doc_id) per lang, so the final
    per-lang groupby sees ≤ N·n_batches candidate rows — the fact table
    never shuffles, and group skew cannot matter because each group's
    input is already capped."""
    import hashlib
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keys = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
             for i in ids), np.int64, len(ids))
        return batch.append_column("hkey", pa.array(keys))

    def local_topn(batch: pa.Table) -> pa.Table:
        out = []
        for lang in pc.unique(batch.column("lang")).to_pylist():
            g = batch.filter(pc.equal(batch.column("lang"), lang))
            k = g.column("hkey").to_numpy(zero_copy_only=False)
            d = g.column("doc_id").to_numpy(zero_copy_only=False)
            order = np.lexsort((d, k))[:per_lang]
            out.append(g.take(pa.array(order)))
        return pa.concat_tables(out) if out else batch.slice(0, 0)

    def final_topn(group: pa.Table) -> pa.Table:
        k = group.column("hkey").to_numpy(zero_copy_only=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, k))[:per_lang]
        g = group.take(pa.array(order))
        return pa.table({"doc_id": g.column("doc_id"),
                         "lang": g.column("lang"),
                         "sample_rank": pa.array(
                             np.arange(1, len(g) + 1, dtype=np.int64))})

    return ds.map_batches(add_key, batch_format="pyarrow") \
        .map_batches(local_topn, batch_format="pyarrow") \
        .groupby("lang").map_groups(final_topn, batch_format="pyarrow")


def coordered_part_pairs(sf_dir: str, n: int = 20) -> ray.data.Dataset:
    """Market-basket over orders: top-N pairs of DISTINCT parts appearing
    in the same order.  Orders hash into coarse buckets (one vectorized
    kernel per bucket instead of one Python call per order — the 150k-key
    map_groups trap); within a bucket, per-order pair generation runs
    class-by-length with np.triu_indices, pair counts partial-aggregate,
    and the top-N sort sees only the aggregated pair table."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        bkt = ((ok.astype(np.uint64) * _FIB64) >> np.uint64(56)) \
            .astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = group.column("l_partkey").to_numpy(zero_copy_only=False)
        # distinct (order, part), sorted by order then part
        u = np.unique(np.stack([ok, pk], axis=1), axis=0)
        ok, pk = u[:, 0], u[:, 1]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, len(ok)])
        a_all, b_all = [], []
        for ln in np.unique(lens):
            if ln < 2:
                continue
            segs = starts[lens == ln]                     # (m,)
            mat = pk[segs[:, None] + np.arange(ln)]       # (m, ln)
            ii, jj = np.triu_indices(int(ln), k=1)
            a_all.append(mat[:, ii].ravel())
            b_all.append(mat[:, jj].ravel())
        if not a_all:
            return pa.table({"part_a": pa.array([], pa.int64()),
                             "part_b": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64())})
        t = pa.table({"part_a": pa.array(np.concatenate(a_all)),
                      "part_b": pa.array(np.concatenate(b_all)),
                      "one": pa.array(np.ones(
                          sum(len(a) for a in a_all), np.int64))})
        res = t.group_by(["part_a", "part_b"]).aggregate([("one", "sum")])
        return pa.table({"part_a": res.column("part_a"),
                         "part_b": res.column("part_b"),
                         "n_orders": res.column("one_sum")})

    pairs = li.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bkt").map_groups(bucket_pairs, batch_format="pyarrow")
    agg = partial_aggregate(pairs, ["part_a", "part_b"],
                            [("n_orders", "sum", "n_orders")])
    return agg.sort(["n_orders", "part_a", "part_b"],
                    descending=[True, False, False]).limit(n)


def dim_correlation_topk(sf_dir: str, n: int = 20) -> ray.data.Dataset:
    """Top-N most-correlated embedding dimension pairs by (1e4-scaled)
    integer dot product — the gradient/Gram aggregation shape: each
    batch computes its LOCAL 64×64 Xᵀ X in one numpy matmul, the
    exchange carries only the 2016 upper-triangle partials per task, and
    the final sort sees a dimension-bounded table."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])

    def gram(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d = pc.list_value_length(emb)[0].as_py()
        q = np.rint(flat.reshape(-1, d) * 10_000).astype(np.int64)
        g = q.T @ q                                     # (d, d) int64
        ii, jj = np.triu_indices(d, k=1)
        return pa.table({"dim_a": pa.array(ii.astype(np.int64)),
                         "dim_b": pa.array(jj.astype(np.int64)),
                         "dot_e8": pa.array(g[ii, jj])})

    agg = partial_aggregate(
        ds.map_batches(gram, batch_format="pyarrow"),
        ["dim_a", "dim_b"], [("dot_e8", "sum", "dot_e8")])
    return agg.sort(["dot_e8", "dim_a", "dim_b"],
                    descending=[True, False, False]).limit(n)


def part_graph_bfs(sf_dir: str, max_depth: int = 3) -> pa.Table:
    """Iterative BFS over the co-ordered-parts graph from the smallest
    partkey: round k broadcasts the frontier id set (bounded by the part
    DIMENSION, never the fact table) and one edge-table pass collects
    the next frontier — the BSP shape of dedup_clusters applied to graph
    traversal.  The DuckDB oracle is a recursive CTE with MIN(dist)."""
    seed = int(pc.min(pq.read_table(f"{sf_dir}/part.parquet",
                                    columns=["p_partkey"])
                      .column("p_partkey")).as_py())
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        bkt = ((ok.astype(np.uint64) * _FIB64) >> np.uint64(56)) \
            .astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt))

    def bucket_edges(group: pa.Table) -> pa.Table:
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = group.column("l_partkey").to_numpy(zero_copy_only=False)
        u = np.unique(np.stack([ok, pk], axis=1), axis=0)
        ok, pk = u[:, 0], u[:, 1]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, len(ok)])
        src_all, dst_all = [], []
        for ln in np.unique(lens):
            if ln < 2:
                continue
            segs = starts[lens == ln]
            mat = pk[segs[:, None] + np.arange(ln)]
            ii, jj = np.triu_indices(int(ln), k=1)
            a, b = mat[:, ii].ravel(), mat[:, jj].ravel()
            src_all += [a, b]
            dst_all += [b, a]
        if not src_all:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        t = pa.table({"src": pa.array(np.concatenate(src_all)),
                      "dst": pa.array(np.concatenate(dst_all))})
        return t.group_by(["src", "dst"]).aggregate([]) \
            .select(["src", "dst"])

    edges = li.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bkt").map_groups(bucket_edges, batch_format="pyarrow") \
        .materialize()

    dist = {seed: 0}
    frontier = {seed}
    for depth in range(1, max_depth + 1):
        f_arr = pa.array(sorted(frontier), pa.int64())

        def next_hop(batch: pa.Table, fa=f_arr) -> pa.Table:
            b = batch.filter(pc.is_in(batch.column("src"), value_set=fa))
            return pa.table({"dst": b.column("dst").combine_chunks()
                             .unique()})

        # frontier/visited are bounded by the part DIMENSION (tiny);
        # edges stream through the cluster each round.
        nxt = set()
        for b in edges.map_batches(next_hop, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            nxt.update(b.column("dst").to_pylist())
        frontier = {p for p in nxt if p not in dist}
        if not frontier:
            break
        for p in frontier:
            dist[p] = depth
    ids = sorted(dist)
    return pa.table({"part_id": pa.array(ids, pa.int64()),
                     "dist": pa.array([dist[i] for i in ids],
                                      pa.int64())})


def ngram_novelty_ratio(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Cross-corpus n-gram novelty (data-curation signal): per document,
    how many of its distinct word 3-grams appear in NO other document.
    Distinct (gram, doc) pairs reduce per batch, gram document-frequency
    comes from one partial-agg exchange, and the join-back on gram is
    the only other shuffle — text never moves after the explode."""
    from ..functions.joins import shuffle_lookup_join
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])

    def grams(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_g, out_d = [], []
        for did, tl in zip(ids, toks.to_pylist()):
            gs = {" ".join(tl[i:i + k]) for i in range(len(tl) - k + 1)}
            out_g.extend(gs)
            out_d.extend([did] * len(gs))
        return pa.table({"gram": pa.array(out_g, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64())})

    gd = docs.map_batches(grams, batch_format="pyarrow")

    def local_df(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["gram"]).aggregate([("gram", "count")])
        return pa.table({"gram": res.column("gram"),
                         "df": pc.cast(res.column("gram_count"),
                                       pa.int64())})

    df = partial_aggregate(
        gd.map_batches(local_df, batch_format="pyarrow"),
        ["gram"], [("df", "sum", "df")])
    joined = shuffle_lookup_join(
        gd, df, on="gram", right_on="gram",
        left_schema=pa.schema([("gram", pa.string()),
                               ("doc_id", pa.int64())]),
        right_schema=pa.schema([("gram", pa.string()),
                                ("df", pa.int64())]),
        how="inner")

    def per_doc(batch: pa.Table) -> pa.Table:
        uniq = pc.cast(pc.equal(batch.column("df"), 1), pa.int64())
        t = pa.table({"doc_id": batch.column("doc_id"),
                      "n_unique_grams": uniq,
                      "n_grams": pa.array(np.ones(len(batch),
                                                  np.int64))})
        res = t.group_by(["doc_id"]).aggregate(
            [("n_unique_grams", "sum"), ("n_grams", "sum")])
        return pa.table({"doc_id": res.column("doc_id"),
                         "n_unique_grams":
                             res.column("n_unique_grams_sum"),
                         "n_grams": res.column("n_grams_sum")})

    return partial_aggregate(
        joined.map_batches(per_doc, batch_format="pyarrow"),
        ["doc_id"], [("n_unique_grams", "sum", "n_unique_grams"),
                     ("n_grams", "sum", "n_grams")])


def fulfillment_lag_histogram(sf_dir: str, bucket_days: int = 7
                              ) -> ray.data.Dataset:
    """Weekly histogram of order→ship lag: ONE shuffle equi-join
    attaches the order date, the day difference and bucket fold per
    batch, and the exchange carries only (bucket, count, min, max)
    partials."""
    from ..functions.joins import shuffle_lookup_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate"])
    joined = shuffle_lookup_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_shipdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]),
        how="inner")

    def per_batch(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        odt = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        lag = ship - odt
        t = pa.table({"bucket_week": pa.array(lag // bucket_days),
                      "n_lines": pa.array(np.ones(len(batch), np.int64)),
                      "min_lag_days": pa.array(lag),
                      "max_lag_days": pa.array(lag)})
        res = t.group_by(["bucket_week"]).aggregate(
            [("n_lines", "sum"), ("min_lag_days", "min"),
             ("max_lag_days", "max")])
        return pa.table({"bucket_week": res.column("bucket_week"),
                         "n_lines": res.column("n_lines_sum"),
                         "min_lag_days": res.column("min_lag_days_min"),
                         "max_lag_days": res.column("max_lag_days_max")})

    return partial_aggregate(
        joined.map_batches(per_batch, batch_format="pyarrow"),
        ["bucket_week"], [("n_lines", "sum", "n_lines"),
                          ("min_lag_days", "min", "min_lag_days"),
                          ("max_lag_days", "max", "max_lag_days")])


def user_top_value_share(sf_dir: str) -> ray.data.Dataset:
    """Per-user value concentration: the share (ppm, integer floor
    division so the oracle hashes exactly) of the user's single largest
    event in their total — a skew/whale signal computed with one
    partial-agg exchange of (sum, max) pairs."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "value"])

    def per_batch(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"user_id": batch.column("user_id"),
                      "sum_c": pa.array(cents),
                      "max_c": pa.array(cents)})
        res = t.group_by(["user_id"]).aggregate(
            [("sum_c", "sum"), ("max_c", "max")])
        return pa.table({"user_id": res.column("user_id"),
                         "sum_c": res.column("sum_c_sum"),
                         "max_c": res.column("max_c_max")})

    agg = partial_aggregate(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        ["user_id"], [("sum_c", "sum", "sum_c"),
                      ("max_c", "max", "max_c")])

    def share(batch: pa.Table) -> pa.Table:
        s = batch.column("sum_c").to_numpy(zero_copy_only=False)
        m = batch.column("max_c").to_numpy(zero_copy_only=False)
        ppm = np.where(s != 0, (1_000_000 * m) // np.where(s == 0, 1, s),
                       0)
        return pa.table({"user_id": batch.column("user_id"),
                         "total_cents": pa.array(s),
                         "top_share_ppm": pa.array(ppm)})

    return agg.map_batches(share, batch_format="pyarrow")


def nation_supplier_hhi(sf_dir: str) -> ray.data.Dataset:
    """Herfindahl–Hirschman revenue-concentration index per supplier
    nation: lineitem reduces to (nation, supplier) revenue cents — a
    dimension-bounded table — via broadcast nation resolution + one
    partial-agg exchange; integer ppm shares and the Σ share² fold per
    nation group."""
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    side_ref = ray.put((supp.column("s_suppkey").combine_chunks(),
                        supp.column("s_nationkey").combine_chunks(),
                        nation_t.column("n_nationkey").combine_chunks(),
                        nation_t.column("n_name").combine_chunks()))
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_extendedprice"])

    def per_batch(batch: pa.Table) -> pa.Table:
        sk, snk, nk, nn = ray.get(side_ref)
        si = pc.index_in(batch.column("l_suppkey"), value_set=sk)
        ni = pc.index_in(pc.take(snk, si), value_set=nk)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"n_name": pc.take(nn, ni),
                      "s_suppkey": batch.column("l_suppkey"),
                      "cents": pa.array(cents)})
        res = t.group_by(["n_name", "s_suppkey"]).aggregate(
            [("cents", "sum")])
        return pa.table({"n_name": res.column("n_name"),
                         "s_suppkey": res.column("s_suppkey"),
                         "cents": res.column("cents_sum")})

    per_supp = partial_aggregate(
        li.map_batches(per_batch, batch_format="pyarrow"),
        ["n_name", "s_suppkey"], [("cents", "sum", "cents")])

    def hhi(group: pa.Table) -> pa.Table:
        c = group.column("cents").to_numpy(zero_copy_only=False)
        total = int(c.sum())
        share = (1_000_000 * c) // total if total else np.zeros_like(c)
        return pa.table({
            "n_name": group.column("n_name").slice(0, 1),
            "hhi_ppm2": pa.array([int((share * share).sum())],
                                 pa.int64()),
            "n_suppliers": pa.array([len(c)], pa.int64())})

    return per_supp.groupby("n_name").map_groups(hhi,
                                                 batch_format="pyarrow")


def user_activity_bitmask(sf_dir: str, anchor: str = "2024-01-01"
                          ) -> ray.data.Dataset:
    """Per-user 63-day activity bitmap (bit i = active on anchor+i),
    the roaring-bitmap-style presence encoding: distinct (user, offset)
    pairs reduce per batch, and the mask is Σ 2^offset over the distinct
    offsets — an integer SUM the oracle replicates with << — so the
    final exchange carries one int64 per user."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])
    anchor_day = np.datetime64(anchor, "D").astype(np.int64)

    def offsets(batch: pa.Table) -> pa.Table:
        off = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64) - anchor_day
        t = pa.table({"user_id": batch.column("user_id"),
                      "off": pa.array(off)})
        t = t.filter(pc.and_(pc.greater_equal(t.column("off"), 0),
                             pc.less(t.column("off"), 63)))
        return t.group_by(["user_id", "off"]).aggregate([]) \
            .select(["user_id", "off"])

    per_off = partial_aggregate(
        ds.map_batches(offsets, batch_format="pyarrow"),
        ["user_id", "off"], [])

    def to_bits(batch: pa.Table) -> pa.Table:
        off = batch.column("off").to_numpy(zero_copy_only=False)
        return pa.table({"user_id": batch.column("user_id"),
                         "mask": pa.array(np.int64(1) << off),
                         "n_days": pa.array(np.ones(len(batch),
                                                    np.int64))})

    return partial_aggregate(
        per_off.map_batches(to_bits, batch_format="pyarrow"),
        ["user_id"], [("mask", "sum", "mask"),
                      ("n_days", "sum", "n_days")])


def part_skyline(sf_dir: str) -> pa.Table:
    """Skyline (Pareto-front) operator: parts not dominated on
    (minimize retail price, maximize size).  Each batch computes its
    LOCAL skyline with one vectorized domination matrix; the global
    skyline equals the skyline of the unioned local skylines
    (domination is transitive), so the driver folds only the tiny
    surviving set — the distributed block-nested-loop scheme."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_retailprice",
                                     "p_size"])

    def _skyline(pk, price, size):
        n = len(pk)
        dom = ((price[:, None] <= price[None, :])
               & (size[:, None] >= size[None, :])
               & ((price[:, None] < price[None, :])
                  | (size[:, None] > size[None, :])))
        return ~dom.any(axis=0)

    def local_sky(batch: pa.Table) -> pa.Table:
        pk = batch.column("p_partkey").to_numpy(zero_copy_only=False)
        price = np.rint(batch.column("p_retailprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        size = pc.cast(batch.column("p_size"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = _skyline(pk, price, size)
        return pa.table({"p_partkey": pa.array(pk[keep]),
                         "price_cents": pa.array(price[keep]),
                         "p_size": pa.array(size[keep])})

    locals_ = ds.map_batches(local_sky, batch_format="pyarrow") \
        .take_all()
    pk = np.array([r["p_partkey"] for r in locals_], np.int64)
    price = np.array([r["price_cents"] for r in locals_], np.int64)
    size = np.array([r["p_size"] for r in locals_], np.int64)
    keep = _skyline(pk, price, size)
    order = np.argsort(pk[keep])
    return pa.table({"p_partkey": pa.array(pk[keep][order]),
                     "price_cents": pa.array(price[keep][order]),
                     "p_size": pa.array(size[keep][order])})


def customers_all_priorities(sf_dir: str) -> ray.data.Dataset:
    """Relational division over a FACT table: customers that placed
    orders in EVERY priority class.  Distinct (cust, priority) pairs
    and per-customer order counts reduce in parallel exchanges keyed the
    same way; the divisor (|priority classes|) is a bounded dimension."""
    from ..functions.joins import shuffle_lookup_join
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderpriority"])

    def pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["o_custkey", "o_orderpriority"]) \
            .aggregate([]).select(["o_custkey", "o_orderpriority"])

    distinct = partial_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["o_custkey", "o_orderpriority"], [])

    def pri_counts(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["o_custkey"]).aggregate(
            [("o_custkey", "count")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "n_pri": pc.cast(res.column("o_custkey_count"),
                                          pa.int64())})

    n_pri = partial_aggregate(
        distinct.map_batches(pri_counts, batch_format="pyarrow"),
        ["o_custkey"], [("n_pri", "sum", "n_pri")])

    def order_counts(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["o_custkey"]).aggregate(
            [("o_custkey", "count")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "n_orders": pc.cast(
                             res.column("o_custkey_count"), pa.int64())})

    n_ord = partial_aggregate(
        ds.map_batches(order_counts, batch_format="pyarrow"),
        ["o_custkey"], [("n_orders", "sum", "n_orders")])

    total = len(pq.read_table(f"{sf_dir}/orders.parquet",
                              columns=["o_orderpriority"])
                .column("o_orderpriority").unique())
    joined = shuffle_lookup_join(
        n_ord, n_pri, on="o_custkey", right_on="o_custkey",
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("n_orders", pa.int64())]),
        right_schema=pa.schema([("o_custkey", pa.int64()),
                                ("n_pri", pa.int64())]),
        how="inner")

    def keep(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("n_pri"), total))
        return pa.table({"o_custkey": b.column("o_custkey"),
                         "n_orders": b.column("n_orders")})

    return joined.map_batches(keep, batch_format="pyarrow")


def part_price_band_pairs(sf_dir: str, band_cents: int = 100
                          ) -> ray.data.Dataset:
    """Band (inequality) self-join: pairs of same-brand parts whose
    retail prices differ by ≤ band.  Each row replicates to its price
    bucket AND the one below, pairs generate inside (brand, bucket)
    groups, and the min-bucket convention counts each pair exactly once
    — the standard bucketed band-join that avoids any all-pairs
    exchange."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_brand",
                                     "p_retailprice"])

    def fan_out(batch: pa.Table) -> pa.Table:
        pk = batch.column("p_partkey").to_numpy(zero_copy_only=False)
        cents = np.rint(batch.column("p_retailprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        bkt = cents // band_cents
        brand = np.asarray(batch.column("p_brand").to_pylist(),
                           dtype=object)
        return pa.table({
            "p_brand": pa.array(np.concatenate([brand, brand]),
                                pa.string()),
            "grp": pa.array(np.concatenate([bkt, bkt - 1])),
            "own": pa.array(np.concatenate([bkt, bkt])),
            "p_partkey": pa.array(np.concatenate([pk, pk])),
            "cents": pa.array(np.concatenate([cents, cents]))})

    fanned = ds.map_batches(fan_out, batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        g = group.column("grp")[0].as_py()
        pk = group.column("p_partkey").to_numpy(zero_copy_only=False)
        c = group.column("cents").to_numpy(zero_copy_only=False)
        own = group.column("own").to_numpy(zero_copy_only=False)
        order = np.argsort(pk)
        pk, c, own = pk[order], c[order], own[order]
        n = len(pk)
        if n < 2:
            return pa.table({"part_a": pa.array([], pa.int64()),
                             "part_b": pa.array([], pa.int64()),
                             "price_diff_cents": pa.array([],
                                                          pa.int64())})
        ii, jj = np.triu_indices(n, k=1)
        diff = np.abs(c[ii] - c[jj])
        keep = (diff <= band_cents) \
            & (np.minimum(own[ii], own[jj]) == g) \
            & (pk[ii] != pk[jj])
        return pa.table({"part_a": pa.array(pk[ii[keep]]),
                         "part_b": pa.array(pk[jj[keep]]),
                         "price_diff_cents": pa.array(diff[keep])})

    return fanned.groupby(["p_brand", "grp"]).map_groups(
        pairs, batch_format="pyarrow")


def weighted_median_price(sf_dir: str) -> pa.Table:
    """Exact quantity-weighted median of the extended price, two-pass:
    pass 1 partial-sums weights into coarse price buckets (bounded), the
    driver prefix-sums to locate the median bucket, and pass 2 scans
    ONLY that bucket's rows (read pruned by the bucket predicate) for
    the exact within-bucket answer — no global sort, no full
    materialization."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_extendedprice", "l_quantity"])
    width = 1000  # 10-dollar buckets

    def bucketed(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        q = np.rint(batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        t = pa.table({"bkt": pa.array(c // width), "w": pa.array(q)})
        res = t.group_by(["bkt"]).aggregate([("w", "sum")])
        return pa.table({"bkt": res.column("bkt"),
                         "w": res.column("w_sum")})

    per_bkt = partial_aggregate(
        li.map_batches(bucketed, batch_format="pyarrow"),
        ["bkt"], [("w", "sum", "w")]).take_all()
    bks = np.array([r["bkt"] for r in per_bkt], np.int64)
    ws = np.array([r["w"] for r in per_bkt], np.int64)
    order = np.argsort(bks)
    bks, ws = bks[order], ws[order]
    cum = np.cumsum(ws)
    total = int(cum[-1])
    mi = int(np.searchsorted(cum * 2, total))
    target_bkt = int(bks[mi])
    before = int(cum[mi - 1]) if mi > 0 else 0

    def in_bucket(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        q = np.rint(batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        sel = (c // width) == target_bkt
        t = pa.table({"c": pa.array(c[sel]), "w": pa.array(q[sel])})
        res = t.group_by(["c"]).aggregate([("w", "sum")])
        return pa.table({"c": res.column("c"),
                         "w": res.column("w_sum")})

    inb = partial_aggregate(
        li.map_batches(in_bucket, batch_format="pyarrow"),
        ["c"], [("w", "sum", "w")]).take_all()
    cs = np.array([r["c"] for r in inb], np.int64)
    iws = np.array([r["w"] for r in inb], np.int64)
    o2 = np.argsort(cs)
    cs, iws = cs[o2], iws[o2]
    cum2 = before + np.cumsum(iws)
    median = int(cs[np.searchsorted(cum2 * 2, total)])
    return pa.table({"median_cents": pa.array([median], pa.int64()),
                     "total_weight": pa.array([total], pa.int64())})


def user_type_signature(sf_dir: str) -> ray.data.Dataset:
    """Behavioral-signature grouping: each user's sorted distinct
    event-type set folds to one comma-joined string, then users count
    per signature.  Distinct (user, type) pairs reduce per batch, the
    per-user fold emits ONE row, so the signature exchange carries
    |users| rows and the final reduce is a standard partial agg."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["user_id", "event_type"]).aggregate([]) \
            .select(["user_id", "event_type"])

    distinct = partial_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["user_id", "event_type"], [])

    def sig(group: pa.Table) -> pa.Table:
        types = sorted(group.column("event_type").to_pylist())
        return pa.table({"signature": pa.array([",".join(types)],
                                               pa.string()),
                         "one": pa.array([1], pa.int64())})

    per_user = distinct.groupby("user_id").map_groups(
        sig, batch_format="pyarrow")
    return partial_aggregate(per_user, ["signature"],
                             [("one", "sum", "n_users")])


def orders_above_group_median(sf_dir: str) -> ray.data.Dataset:
    """Aggregate→broadcast→re-scan: per priority class, exact group
    median (distributed histogram-refinement selection — no sort) then
    one more fact pass counting orders strictly above their OWN group's
    median.  The medians table is dimension-bounded and rides along as
    a broadcast."""
    from ..functions.quantiles import grouped_exact_quantiles
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderpriority",
                                         "o_totalprice"])
    med = grouped_exact_quantiles(orders, "o_orderpriority",
                                  "o_totalprice", qs=(0.5,),
                                  collect_cap=5_000)
    med_map = dict(zip(med.column("o_orderpriority").to_pylist(),
                       med.column("value").to_pylist()))
    med_ref = ray.put(med_map)

    def count_above(batch: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        pri = batch.column("o_orderpriority").to_pylist()
        v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        meds = np.array([m[p] for p in pri], np.float64)
        t = pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "median_cents": pa.array(np.rint(meds * 100)
                                     .astype(np.int64)),
            "n_above": pa.array((v > meds).astype(np.int64)),
            "n_total": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["o_orderpriority"]).aggregate(
            [("median_cents", "min"), ("n_above", "sum"),
             ("n_total", "sum")])
        return pa.table({
            "o_orderpriority": res.column("o_orderpriority"),
            "median_cents": res.column("median_cents_min"),
            "n_above": res.column("n_above_sum"),
            "n_total": res.column("n_total_sum")})

    return partial_aggregate(
        orders.map_batches(count_above, batch_format="pyarrow"),
        ["o_orderpriority"], [("median_cents", "min", "median_cents"),
                              ("n_above", "sum", "n_above"),
                              ("n_total", "sum", "n_total")])


def dedup_keep_longest(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup with a KEEP POLICY: within each content-fingerprint
    group survive the LONGEST document (ties → smallest doc_id) — the
    curation-grade "keep best representative" variant of exact_dedup
    (which keeps the smallest id).  Only (fingerprint, n_chars, doc_id)
    triples shuffle."""
    from ..functions.text import md5_fingerprint
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "n_chars"])

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table({
            "fingerprint": pa.array(md5_fingerprint(
                batch.column("text").to_pylist()), pa.string()),
            "doc_id": batch.column("doc_id"),
            "n_chars": batch.column("n_chars")})

    keyed = ds.map_batches(fp, batch_format="pyarrow")

    def best(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        n = group.column("n_chars").to_numpy(zero_copy_only=False)
        i = np.lexsort((d, -n))[0]
        return pa.table({"doc_id": pa.array([int(d[i])], pa.int64()),
                         "n_chars": pa.array([int(n[i])], pa.int64())})

    return keyed.groupby("fingerprint").map_groups(
        best, batch_format="pyarrow")


def customer_status_asof(sf_dir: str, asof: str = "1995-06-30"
                         ) -> ray.data.Dataset:
    """Point-in-time (SCD-style) snapshot: each customer's LATEST order
    on or before the as-of date (ties → largest orderkey).  Per-batch
    keep-best partials shrink the exchange to ≤ |customers| rows per
    task; the final keep-best runs per coarse hash bucket with one
    vectorized lexsort (never one Python call per customer)."""
    asof_us = np.datetime64(asof, "us").astype(np.int64)
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderkey",
                                     "o_orderdate", "o_orderstatus",
                                     "o_totalprice"])

    def keep_best(batch: pa.Table) -> pa.Table:
        dt = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        sel = dt <= asof_us
        b = batch.filter(pa.array(sel))
        if len(b) == 0:
            return b.select(["o_custkey", "o_orderkey", "o_orderdate",
                             "o_orderstatus", "o_totalprice"])
        dt = dt[sel]
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        ok = b.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, dt, ck))
        last = np.flatnonzero(np.r_[ck[order][1:] != ck[order][:-1],
                                    True])
        return b.take(pa.array(order[last])) \
            .select(["o_custkey", "o_orderkey", "o_orderdate",
                     "o_orderstatus", "o_totalprice"])

    partials = ds.map_batches(keep_best, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        bkt = ((ck.astype(np.uint64) * _FIB64) >> np.uint64(56)) \
            .astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt))

    def final_best(group: pa.Table) -> pa.Table:
        out = keep_best(group.drop_columns(["bkt"]))
        c = out.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "o_custkey": out.column("o_custkey"),
            "o_orderkey": out.column("o_orderkey"),
            "o_orderstatus": out.column("o_orderstatus"),
            "price_cents": pa.array(np.rint(c * 100).astype(np.int64))})

    return partials.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bkt").map_groups(final_best, batch_format="pyarrow")


def doc_char_class_profile(sf_dir: str) -> ray.data.Dataset:
    """Character-class profile per document (letters / spaces / vowels)
    — one pass of vectorized Arrow regex counts, no exchange at all;
    the classic cheap quality-signal extraction shape."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def profile(batch: pa.Table) -> pa.Table:
        txt = batch.column("text")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_letters": pc.cast(pc.count_substring_regex(txt, "[a-z]"),
                                 pa.int64()),
            "n_spaces": pc.cast(pc.count_substring(txt, " "),
                                pa.int64()),
            "n_vowels": pc.cast(pc.count_substring_regex(txt, "[aeiou]"),
                                pa.int64())})

    return ds.map_batches(profile, batch_format="pyarrow")


def value_first_digit_hist(sf_dir: str) -> ray.data.Dataset:
    """Benford-style first-significant-digit histogram over event value
    cents (fraud/data-quality check): digit extraction is integer→string
    (replicable exactly in SQL), counts partial-aggregate per batch."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["value"])

    def digits(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column("value")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        c = c[c > 0]
        # exact integer first-digit (no float log10 edge cases):
        # ≤ 19 vectorized halving-by-10 passes
        first = c.copy()
        while (first >= 10).any():
            first = np.where(first >= 10, first // 10, first)
        t = pa.table({"digit": pa.array(first),
                      "n": pa.array(np.ones(len(c), np.int64)),
                      "min_cents": pa.array(c),
                      "max_cents": pa.array(c)})
        res = t.group_by(["digit"]).aggregate(
            [("n", "sum"), ("min_cents", "min"), ("max_cents", "max")])
        return pa.table({"digit": res.column("digit"),
                         "n": res.column("n_sum"),
                         "min_cents": res.column("min_cents_min"),
                         "max_cents": res.column("max_cents_max")})

    return partial_aggregate(
        ds.map_batches(digits, batch_format="pyarrow"),
        ["digit"], [("n", "sum", "n"), ("min_cents", "min", "min_cents"),
                    ("max_cents", "max", "max_cents")])


def monthly_revenue_growth_ppm(sf_dir: str) -> pa.Table:
    """Month-over-month revenue growth (floor-ppm): monthly totals
    reduce via partial aggregation to a CALENDAR-bounded table; the LAG
    window folds on the driver (documented bounded — same contract as
    the SQL oracle's window over the grouped result)."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def monthly(batch: pa.Table) -> pa.Table:
        m = pc.floor_temporal(batch.column("o_orderdate"), unit="month")
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"month": m, "cents": pa.array(cents)})
        res = t.group_by(["month"]).aggregate([("cents", "sum")])
        return pa.table({"month": res.column("month"),
                         "cents": res.column("cents_sum")})

    rows = partial_aggregate(
        ds.map_batches(monthly, batch_format="pyarrow"),
        ["month"], [("cents", "sum", "cents")]).take_all()
    rows.sort(key=lambda r: r["month"])
    months = [r["month"] for r in rows]
    cents = np.array([r["cents"] for r in rows], np.int64)
    growth = np.floor(1_000_000.0 * (cents[1:] - cents[:-1])
                      / cents[:-1]).astype(np.int64)
    return pa.table({
        "month": pa.array(np.array(months[1:],
                                   dtype="datetime64[us]")),
        "revenue_cents": pa.array(cents[1:]),
        "prev_cents": pa.array(cents[:-1]),
        "growth_ppm": pa.array(growth)})


def part_supplier_degree_hist(sf_dir: str) -> ray.data.Dataset:
    """Bipartite degree distribution: histogram over parts of "how many
    distinct suppliers shipped this part" — the distribution-of-a-
    distribution shape.  Distinct (part, supplier) pairs reduce per
    batch, per-part degrees come from one exchange, the degree histogram
    from a second tiny one."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey"])

    def pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["l_partkey", "l_suppkey"]).aggregate([]) \
            .select(["l_partkey", "l_suppkey"])

    distinct = partial_aggregate(
        li.map_batches(pairs, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], [])

    def degree(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["l_partkey"]).aggregate(
            [("l_partkey", "count")])
        return pa.table({"l_partkey": res.column("l_partkey"),
                         "n_suppliers": pc.cast(
                             res.column("l_partkey_count"), pa.int64())})

    per_part = partial_aggregate(
        distinct.map_batches(degree, batch_format="pyarrow"),
        ["l_partkey"], [("n_suppliers", "sum", "n_suppliers")])

    def hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"n_suppliers": batch.column("n_suppliers"),
                      "n_parts": pa.array(np.ones(len(batch),
                                                  np.int64))})
        res = t.group_by(["n_suppliers"]).aggregate([("n_parts", "sum")])
        return pa.table({"n_suppliers": res.column("n_suppliers"),
                         "n_parts": res.column("n_parts_sum")})

    return partial_aggregate(
        per_part.map_batches(hist, batch_format="pyarrow"),
        ["n_suppliers"], [("n_parts", "sum", "n_parts")])


def top_tokens_per_lang(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    """Grouped top-k: the k most frequent tokens WITHIN each language
    (ties → lexicographic).  (lang, token) counts partial-aggregate; the
    per-lang top-k folds per group over the already-aggregated count
    table, so the heavy exchange carries counts, never token
    occurrences."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lang = np.repeat(np.asarray(batch.column("lang").to_pylist(),
                                    dtype=object), n)
        t = pa.table({"lang": pa.array(lang, pa.string()),
                      "tok": pc.list_flatten(toks),
                      "one": pa.array(np.ones(int(n.sum()), np.int64))})
        res = t.group_by(["lang", "tok"]).aggregate([("one", "sum")])
        return pa.table({"lang": res.column("lang"),
                         "tok": res.column("tok"),
                         "n": res.column("one_sum")})

    agg = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["lang", "tok"], [("n", "sum", "n")])

    def topk(group: pa.Table) -> pa.Table:
        n = group.column("n").to_numpy(zero_copy_only=False)
        tok = np.asarray(group.column("tok").to_pylist(), dtype=object)
        order = np.lexsort((tok, -n))[:k]
        g = group.take(pa.array(order))
        return pa.table({"lang": g.column("lang"),
                         "tok": g.column("tok"),
                         "n": g.column("n"),
                         "rnk": pa.array(np.arange(1, len(g) + 1,
                                                   dtype=np.int64))})

    return agg.groupby("lang").map_groups(topk, batch_format="pyarrow")


def parts_never_ordered(sf_dir: str) -> pa.Table:
    """Dimension-anti-fact join: parts with NO lineitem.  The fact table
    semi-reduces to its distinct partkey set (bounded by the part
    dimension) via partial aggregation; the anti filter then runs over
    the dimension with the key set broadcast — the fact table itself is
    never shuffled."""
    from ..functions.joins import broadcast_anti_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey"])

    def distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"l_partkey": batch.column("l_partkey")
                         .combine_chunks().unique()})

    used = partial_aggregate(
        li.map_batches(distinct, batch_format="pyarrow"),
        ["l_partkey"], [])
    part = read_parquet_clean(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_brand"])
    used_keys = used.map_batches(
        lambda b: pa.table({"p_partkey": b.column("l_partkey")}),
        batch_format="pyarrow")
    out = broadcast_anti_join(part, used_keys, "p_partkey")
    # dimension-bounded and legitimately often EMPTY → materialize as a
    # typed Table (Ray to_pandas drops columns on 0-row Datasets)
    seed = pa.table({"p_partkey": pa.array([], pa.int64()),
                     "p_brand": pa.array([], pa.string())})
    return pa.concat_tables(
        [seed] + [b.select(["p_partkey", "p_brand"])
                  for b in out.iter_batches(batch_format="pyarrow")])


def event_round_value_bias(sf_dir: str) -> ray.data.Dataset:
    """Round-number bias per event type (data-quality check): how many
    values are whole dollars / whole ten-dollars vs total — pure integer
    modulo folds per batch, one tiny exchange."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def per_batch(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column("value")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({
            "event_type": batch.column("event_type"),
            "n_whole_dollar": pa.array((c % 100 == 0)
                                       .astype(np.int64)),
            "n_whole_ten": pa.array((c % 1000 == 0).astype(np.int64)),
            "n_total": pa.array(np.ones(len(c), np.int64))})
        res = t.group_by(["event_type"]).aggregate(
            [("n_whole_dollar", "sum"), ("n_whole_ten", "sum"),
             ("n_total", "sum")])
        return pa.table({
            "event_type": res.column("event_type"),
            "n_whole_dollar": res.column("n_whole_dollar_sum"),
            "n_whole_ten": res.column("n_whole_ten_sum"),
            "n_total": res.column("n_total_sum")})

    return partial_aggregate(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        ["event_type"], [("n_whole_dollar", "sum", "n_whole_dollar"),
                         ("n_whole_ten", "sum", "n_whole_ten"),
                         ("n_total", "sum", "n_total")])


def token_length_hist(sf_dir: str) -> ray.data.Dataset:
    """Corpus-wide token-length distribution (tokenizer sanity stat):
    explode → per-batch length histogram → one tiny exchange of
    (length, count) partials."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def per_batch(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(batch.column("text"),
                                                " "))
        ln = pc.cast(pc.utf8_length(flat), pa.int64())
        t = pa.table({"tok_len": ln,
                      "n": pa.array(np.ones(len(flat), np.int64))})
        res = t.group_by(["tok_len"]).aggregate([("n", "sum")])
        return pa.table({"tok_len": res.column("tok_len"),
                         "n": res.column("n_sum")})

    return partial_aggregate(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        ["tok_len"], [("n", "sum", "n")])


def part_triangle_count(sf_dir: str) -> pa.Table:
    """Distributed triangle counting on the co-ordered-parts graph
    (node-iterator with ordered wedges): co-order edges (u<v) come from
    the coarse-bucket pair kernel; each middle node v emits its
    (lower, higher)-neighbor wedges; the closing-edge membership test is
    one vectorized is_in against the broadcast packed edge set.  Every
    triangle u<v<w is counted exactly once (as the wedge around its
    middle vertex)."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        bkt = ((ok.astype(np.uint64) * _FIB64) >> np.uint64(56)) \
            .astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt))

    def bucket_edges(group: pa.Table) -> pa.Table:
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = group.column("l_partkey").to_numpy(zero_copy_only=False)
        u = np.unique(np.stack([ok, pk], axis=1), axis=0)
        ok, pk = u[:, 0], u[:, 1]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, len(ok)])
        a_all, b_all = [], []
        for ln in np.unique(lens):
            if ln < 2:
                continue
            segs = starts[lens == ln]
            mat = pk[segs[:, None] + np.arange(ln)]
            ii, jj = np.triu_indices(int(ln), k=1)
            a_all.append(mat[:, ii].ravel())
            b_all.append(mat[:, jj].ravel())
        if not a_all:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        t = pa.table({"u": pa.array(np.concatenate(a_all)),
                      "v": pa.array(np.concatenate(b_all))})
        return t.group_by(["u", "v"]).aggregate([]).select(["u", "v"])

    edges = partial_aggregate(
        li.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bkt").map_groups(bucket_edges, batch_format="pyarrow"),
        ["u", "v"], []).materialize()
    n_edges = edges.count()

    # broadcast packed edge set (u<v; parts are dimension-bounded so the
    # edge set is |part|²-bounded — at web scale swap for a bloom filter)
    packed = []
    for b in edges.iter_batches(batch_format="pyarrow"):
        uu = b.column("u").to_numpy(zero_copy_only=False)
        vv = b.column("v").to_numpy(zero_copy_only=False)
        packed.append(uu * np.int64(1 << 31) + vv)
    edge_set = pa.array(np.concatenate(packed) if packed
                        else np.array([], np.int64))
    edge_ref = ray.put(edge_set)

    def adjacency(batch: pa.Table) -> pa.Table:
        uu = batch.column("u").combine_chunks()
        vv = batch.column("v").combine_chunks()
        # node = middle vertex; lower neighbors arrive via (u,v) rows
        # keyed v, higher neighbors via rows keyed u
        return pa.table({
            "node": pa.concat_arrays([vv, uu]),
            "nbr": pa.concat_arrays([uu, vv]),
            "is_lower": pa.array([True] * len(batch)
                                 + [False] * len(batch), pa.bool_())})

    adj = edges.map_batches(adjacency, batch_format="pyarrow")

    def wedges(group: pa.Table) -> pa.Table:
        mask = group.column("is_lower").to_numpy(zero_copy_only=False)
        nbr = group.column("nbr").to_numpy(zero_copy_only=False)
        lo, hi = nbr[mask], nbr[~mask]
        if len(lo) == 0 or len(hi) == 0:
            return pa.table({"n_wedges": pa.array([0], pa.int64()),
                             "n_closed": pa.array([0], pa.int64())})
        key = (lo[:, None] * np.int64(1 << 31) + hi[None, :]).ravel()
        es = ray.get(edge_ref)
        closed = pc.sum(pc.cast(pc.is_in(pa.array(key), value_set=es),
                                pa.int64())).as_py() or 0
        return pa.table({"n_wedges": pa.array([len(key)], pa.int64()),
                         "n_closed": pa.array([int(closed)],
                                              pa.int64())})

    per_node = adj.groupby("node").map_groups(wedges,
                                              batch_format="pyarrow")
    tot = partial_aggregate(per_node.map_batches(
        lambda b: b.append_column("k", pa.array(np.zeros(len(b),
                                                         np.int64))),
        batch_format="pyarrow"), ["k"],
        [("n_wedges", "sum", "n_wedges"),
         ("n_closed", "sum", "n_triangles")]).take_all()
    row = tot[0] if tot else {"n_wedges": 0, "n_triangles": 0}
    return pa.table({
        "n_triangles": pa.array([row["n_triangles"]], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_wedges": pa.array([row["n_wedges"]], pa.int64())})


def token_first_seen_hist(sf_dir: str, width: int = 64
                          ) -> ray.data.Dataset:
    """Vocabulary-growth profile (Heaps-law style): tokens grouped by
    the doc_id bucket in which they FIRST appear.  (token, min doc_id)
    reduces via a min-combiner exchange; the bucket histogram is a
    second tiny reduce."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def first_seen(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(batch.column("doc_id")
                        .to_numpy(zero_copy_only=False), n)
        t = pa.table({"tok": pc.list_flatten(toks),
                      "first_doc": pa.array(ids)})
        res = t.group_by(["tok"]).aggregate([("first_doc", "min")])
        return pa.table({"tok": res.column("tok"),
                         "first_doc": res.column("first_doc_min")})

    per_tok = partial_aggregate(
        ds.map_batches(first_seen, batch_format="pyarrow"),
        ["tok"], [("first_doc", "min", "first_doc")])

    def hist(batch: pa.Table) -> pa.Table:
        fd = batch.column("first_doc").to_numpy(zero_copy_only=False)
        t = pa.table({"doc_bucket": pa.array(fd // width),
                      "n_new_tokens": pa.array(np.ones(len(fd),
                                                       np.int64))})
        res = t.group_by(["doc_bucket"]).aggregate(
            [("n_new_tokens", "sum")])
        return pa.table({"doc_bucket": res.column("doc_bucket"),
                         "n_new_tokens": res.column("n_new_tokens_sum")})

    return partial_aggregate(
        per_tok.map_batches(hist, batch_format="pyarrow"),
        ["doc_bucket"], [("n_new_tokens", "sum", "n_new_tokens")])


def doc_intra_repeat_positions(sf_dir: str, chunk_tokens: int = 8
                               ) -> ray.data.Dataset:
    """Intra-document repetition localization: per doc, how many chunk
    START POSITIONS repeat a chunk already seen earlier in the SAME doc
    (the position-level signal behind repetition filters).  Pure
    per-batch kernel — no exchange."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])

    def per_doc(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rep, tot = [], []
        for tl in toks.to_pylist():
            npos = max(0, len(tl) - chunk_tokens + 1)
            seen: set = set()
            r = 0
            for i in range(npos):
                ch = tuple(tl[i:i + chunk_tokens])
                if ch in seen:
                    r += 1
                else:
                    seen.add(ch)
            rep.append(r)
            tot.append(npos)
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "n_repeat_positions": pa.array(rep, pa.int64()),
                      "n_positions": pa.array(tot, pa.int64())})
        # docs shorter than one chunk have no positions at all
        return t.filter(pc.greater(t.column("n_positions"), 0))

    return docs.map_batches(per_doc, batch_format="pyarrow")


def orders_open_per_day(sf_dir: str, open_days: int = 30) -> pa.Table:
    """Interval concurrency via the +1/−1 boundary sweep: each order
    contributes a start delta on its order day and an end delta
    ``open_days`` later; per-day deltas partial-aggregate (calendar-
    bounded) and ONE driver prefix-sum yields the number of
    simultaneously-open orders per day — no per-day interval join."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate"])

    def deltas(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        t = pa.table({"day": pa.array(np.concatenate([d,
                                                      d + open_days])),
                      "delta": pa.array(np.concatenate(
                          [np.ones(len(d), np.int64),
                           -np.ones(len(d), np.int64)]))})
        res = t.group_by(["day"]).aggregate([("delta", "sum")])
        return pa.table({"day": res.column("day"),
                         "delta": res.column("delta_sum")})

    rows = partial_aggregate(
        ds.map_batches(deltas, batch_format="pyarrow"),
        ["day"], [("delta", "sum", "delta")]).take_all()
    rows.sort(key=lambda r: r["day"])
    days = np.array([r["day"] for r in rows], np.int64)
    deltas_ = np.array([r["delta"] for r in rows], np.int64)
    # expand to the dense calendar so zero-delta days still carry the
    # running level
    full = np.arange(days[0], days[-1] + 1)
    dense = np.zeros(len(full), np.int64)
    dense[days - days[0]] = deltas_
    level = np.cumsum(dense)
    keep = level > 0
    return pa.table({
        "day": pa.array(full[keep].astype("datetime64[D]")
                        .astype("datetime64[us]")),
        "n_open": pa.array(level[keep])})


def knn_label_vote(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    """k-NN label classification audit: every vector is classified by
    majority vote of its k nearest neighbours (integer-scaled dot
    product, self excluded, ties → smallest vec_id then smallest label)
    and the (true, predicted) confusion matrix comes back.  The corpus
    matrix broadcasts once (same contract as knn_bruteforce; beyond
    broadcast scale use the IVF path) and each batch does ONE int64
    matmul — deterministic, so the SQL oracle hashes exactly."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    labels = t.column("label").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(t.column("embedding")) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    q = np.rint(flat.reshape(len(ids), -1) * 10_000).astype(np.int64)
    order = np.argsort(ids)
    side_ref = ray.put((ids[order], labels[order], q[order]))

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])

    def vote(batch: pa.Table) -> pa.Table:
        cids, clabels, cq = ray.get(side_ref)
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bl = batch.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bflat = pc.list_flatten(batch.column("embedding")) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        bq = np.rint(bflat.reshape(len(bids), -1) * 10_000) \
            .astype(np.int64)
        dots = bq @ cq.T                                  # (n, N)
        self_pos = np.searchsorted(cids, bids)
        # min+1, NOT min: the descending sort negates dots and
        # -int64_min overflows back to itself (self row would sort
        # FIRST instead of last)
        dots[np.arange(len(bids)), self_pos] = \
            np.iinfo(np.int64).min + 1
        preds = np.empty(len(bids), np.int64)
        for i in range(len(bids)):
            nn = np.lexsort((cids, -dots[i]))[:k]
            labs = clabels[nn]
            uniq, cnt = np.unique(labs, return_counts=True)
            preds[i] = uniq[np.lexsort((uniq, -cnt))[0]]
        tt = pa.table({"true_label": pa.array(bl),
                       "pred_label": pa.array(preds),
                       "n": pa.array(np.ones(len(bids), np.int64))})
        res = tt.group_by(["true_label", "pred_label"]).aggregate(
            [("n", "sum")])
        return pa.table({"true_label": res.column("true_label"),
                         "pred_label": res.column("pred_label"),
                         "n": res.column("n_sum")})

    return partial_aggregate(
        ds.map_batches(vote, batch_format="pyarrow"),
        ["true_label", "pred_label"], [("n", "sum", "n")])


def user_burst_max_5min(sf_dir: str, window_s: int = 300
                        ) -> ray.data.Dataset:
    """Burstiness: per user, the maximum number of events in any window
    [t, t+window] anchored at an event — the anchored sliding-window max
    done with one sorted two-pointer sweep per user group (never a
    per-pair self-join)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])
    win_us = np.int64(window_s) * 1_000_000

    def per_user(group: pa.Table) -> pa.Table:
        ts = np.sort(group.column("ts").to_numpy(zero_copy_only=False)
                     .astype("datetime64[us]").astype(np.int64))
        ends = np.searchsorted(ts, ts + win_us, side="right")
        burst = int((ends - np.arange(len(ts))).max())
        return pa.table({"user_id": group.column("user_id").slice(0, 1),
                         "max_burst": pa.array([burst], pa.int64()),
                         "n_events": pa.array([len(ts)], pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def repeat_purchase_stats(sf_dir: str) -> pa.Table:
    """Repeat-purchase audit: over (customer, part) pairs, how many
    recur across ≥2 distinct orders.  Custkey attaches by ONE shuffle
    equi-join; distinct (cust, part, order) triples reduce per batch;
    pair order-counts and the global summary come from two more tiny
    exchanges."""
    from ..functions.joins import shuffle_lookup_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    joined = shuffle_lookup_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_partkey", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]),
        how="inner")

    def triples(batch: pa.Table) -> pa.Table:
        return batch.group_by(
            ["o_custkey", "l_partkey", "l_orderkey"]).aggregate([]) \
            .select(["o_custkey", "l_partkey", "l_orderkey"])

    distinct = partial_aggregate(
        joined.map_batches(triples, batch_format="pyarrow"),
        ["o_custkey", "l_partkey", "l_orderkey"], [])

    def pair_counts(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["o_custkey", "l_partkey"]).aggregate(
            [("o_custkey", "count")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "l_partkey": res.column("l_partkey"),
                         "n_orders": pc.cast(
                             res.column("o_custkey_count"), pa.int64())})

    pairs = partial_aggregate(
        distinct.map_batches(pair_counts, batch_format="pyarrow"),
        ["o_custkey", "l_partkey"], [("n_orders", "sum", "n_orders")])

    def summary(batch: pa.Table) -> pa.Table:
        n = batch.column("n_orders").to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n_pairs": pa.array([len(n)], pa.int64()),
            "n_repeat_pairs": pa.array([int((n >= 2).sum())],
                                       pa.int64()),
            "max_repeats": pa.array([int(n.max()) if len(n) else 0],
                                    pa.int64())})

    tot = partial_aggregate(
        pairs.map_batches(summary, batch_format="pyarrow"),
        ["k"], [("n_pairs", "sum", "n_pairs"),
                ("n_repeat_pairs", "sum", "n_repeat_pairs"),
                ("max_repeats", "max", "max_repeats")]).take_all()
    r = tot[0]
    return pa.table({
        "n_pairs": pa.array([r["n_pairs"]], pa.int64()),
        "n_repeat_pairs": pa.array([r["n_repeat_pairs"]], pa.int64()),
        "max_repeats": pa.array([r["max_repeats"]], pa.int64())})


def dup_cluster_size_hist(sf_dir: str) -> ray.data.Dataset:
    """Observability for exact dedup: histogram of duplicate-cluster
    sizes (content fingerprint → cluster size → #clusters of that
    size).  Only 16-B fingerprints shuffle."""
    from ..functions.text import md5_fingerprint
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def fp_counts(batch: pa.Table) -> pa.Table:
        t = pa.table({"fp": pa.array(md5_fingerprint(
            batch.column("text").to_pylist()), pa.string()),
            "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["fp"]).aggregate([("n", "sum")])
        return pa.table({"fp": res.column("fp"),
                         "n": res.column("n_sum")})

    per_fp = partial_aggregate(
        ds.map_batches(fp_counts, batch_format="pyarrow"),
        ["fp"], [("n", "sum", "n")])

    def hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"cluster_size": batch.column("n"),
                      "n_clusters": pa.array(np.ones(len(batch),
                                                     np.int64))})
        res = t.group_by(["cluster_size"]).aggregate(
            [("n_clusters", "sum")])
        return pa.table({"cluster_size": res.column("cluster_size"),
                         "n_clusters": res.column("n_clusters_sum")})

    return partial_aggregate(
        per_fp.map_batches(hist, batch_format="pyarrow"),
        ["cluster_size"], [("n_clusters", "sum", "n_clusters")])


def supplier_revenue_pctile(sf_dir: str) -> ray.data.Dataset:
    """Grouped percent-rank, integer-exact: each supplier's revenue
    percentile within its nation as ((rank-1)·1e6) // (n-1) with RANK
    tie semantics (float PERCENT_RANK·1e6 can floor one off — 3/5 in
    IEEE is 0.5999…).  Fact reduces to the (nation, supplier) dimension
    table first; the rank fold runs per nation group."""
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    side_ref = ray.put((supp.column("s_suppkey").combine_chunks(),
                        supp.column("s_nationkey").combine_chunks(),
                        nation_t.column("n_nationkey").combine_chunks(),
                        nation_t.column("n_name").combine_chunks()))
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_extendedprice"])

    def per_batch(batch: pa.Table) -> pa.Table:
        sk, snk, nk, nn = ray.get(side_ref)
        si = pc.index_in(batch.column("l_suppkey"), value_set=sk)
        ni = pc.index_in(pc.take(snk, si), value_set=nk)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"n_name": pc.take(nn, ni),
                      "s_suppkey": batch.column("l_suppkey"),
                      "cents": pa.array(cents)})
        res = t.group_by(["n_name", "s_suppkey"]).aggregate(
            [("cents", "sum")])
        return pa.table({"n_name": res.column("n_name"),
                         "s_suppkey": res.column("s_suppkey"),
                         "cents": res.column("cents_sum")})

    per_supp = partial_aggregate(
        li.map_batches(per_batch, batch_format="pyarrow"),
        ["n_name", "s_suppkey"], [("cents", "sum", "cents")])

    def pct(group: pa.Table) -> pa.Table:
        c = group.column("cents").to_numpy(zero_copy_only=False)
        n = len(c)
        srt = np.sort(c)
        rnk = np.searchsorted(srt, c, side="left") + 1   # RANK ties
        ppm = np.zeros(n, np.int64) if n == 1 else \
            ((rnk - 1) * 1_000_000) // (n - 1)
        return pa.table({"n_name": group.column("n_name"),
                         "s_suppkey": group.column("s_suppkey"),
                         "cents": group.column("cents"),
                         "pct_ppm": pa.array(ppm.astype(np.int64))})

    return per_supp.groupby("n_name").map_groups(pct,
                                                 batch_format="pyarrow")


def lang_source_lift(sf_dir: str) -> pa.Table:
    """Association lift (ppm, integer) between document language and
    source: lift = N·n_ab / (n_a·n_b).  The crosstab and both marginals
    are dimension-bounded partial-agg results; the lift folds on the
    driver (int64-safe up to ~3e6 docs per cell — beyond that scale the
    ppm factor down)."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["lang", "source"])

    def counts(batch: pa.Table) -> pa.Table:
        t = batch.append_column("n", pa.array(np.ones(len(batch),
                                                      np.int64)))
        res = t.group_by(["lang", "source"]).aggregate([("n", "sum")])
        return pa.table({"lang": res.column("lang"),
                         "source": res.column("source"),
                         "n_ab": res.column("n_sum")})

    cells = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["lang", "source"], [("n_ab", "sum", "n_ab")]).take_all()
    n_a: dict = {}
    n_b: dict = {}
    total = 0
    for r in cells:
        n_a[r["lang"]] = n_a.get(r["lang"], 0) + r["n_ab"]
        n_b[r["source"]] = n_b.get(r["source"], 0) + r["n_ab"]
        total += r["n_ab"]
    rows = sorted(cells, key=lambda r: (r["lang"], r["source"]))
    return pa.table({
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "n_ab": pa.array([r["n_ab"] for r in rows], pa.int64()),
        "lift_ppm": pa.array(
            [(total * r["n_ab"] * 1_000_000)
             // (n_a[r["lang"]] * n_b[r["source"]]) for r in rows],
            pa.int64())})


def token_pair_lift_topk(sf_dir: str, n: int = 20, min_support: int = 5
                         ) -> ray.data.Dataset:
    """Association-rule mining over token co-occurrence: top-N token
    pairs by integer lift (N·n_ab·1e6 // (df_a·df_b)) with a minimum
    support.  Distinct-token pair counts partial-aggregate; marginal
    document frequencies are vocabulary-bounded and broadcast back for
    the lift stamp (same contract as top_tokens)."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def pair_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        a_all, b_all = [], []
        for tl in toks.to_pylist():
            u = sorted(set(tl))
            for i in range(len(u) - 1):
                a_all.extend(u[i] for _ in range(len(u) - 1 - i))
                b_all.extend(u[i + 1:])
        t = pa.table({"tok_a": pa.array(a_all, pa.string()),
                      "tok_b": pa.array(b_all, pa.string()),
                      "n_ab": pa.array(np.ones(len(a_all), np.int64))})
        res = t.group_by(["tok_a", "tok_b"]).aggregate([("n_ab", "sum")])
        return pa.table({"tok_a": res.column("tok_a"),
                         "tok_b": res.column("tok_b"),
                         "n_ab": res.column("n_ab_sum")})

    pairs = partial_aggregate(
        docs.map_batches(pair_counts, batch_format="pyarrow"),
        ["tok_a", "tok_b"], [("n_ab", "sum", "n_ab")])

    def df_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        out = []
        for tl in toks.to_pylist():
            out.extend(set(tl))
        t = pa.table({"tok": pa.array(out, pa.string()),
                      "df": pa.array(np.ones(len(out), np.int64))})
        res = t.group_by(["tok"]).aggregate([("df", "sum")])
        return pa.table({"tok": res.column("tok"),
                         "df": res.column("df_sum")})

    df_rows = partial_aggregate(
        docs.map_batches(df_counts, batch_format="pyarrow"),
        ["tok"], [("df", "sum", "df")]).take_all()
    df_map = {r["tok"]: r["df"] for r in df_rows}
    df_ref = ray.put(df_map)

    def lift(batch: pa.Table) -> pa.Table:
        m = ray.get(df_ref)
        b = batch.filter(pc.greater_equal(batch.column("n_ab"),
                                          min_support))
        ta = b.column("tok_a").to_pylist()
        tb = b.column("tok_b").to_pylist()
        nab = b.column("n_ab").to_numpy(zero_copy_only=False)
        ppm = np.array([(n_docs * int(x) * 1_000_000)
                        // (m[a] * m[bb])
                        for a, bb, x in zip(ta, tb, nab)], np.int64) \
            if len(b) else np.array([], np.int64)
        return pa.table({"tok_a": b.column("tok_a"),
                         "tok_b": b.column("tok_b"),
                         "n_ab": b.column("n_ab"),
                         "lift_ppm": pa.array(ppm)})

    stamped = pairs.map_batches(lift, batch_format="pyarrow")
    return stamped.sort(["lift_ppm", "tok_a", "tok_b"],
                        descending=[True, False, False]).limit(n)


def session_bounce_stats(sf_dir: str, gap_seconds: int = 1800
                         ) -> ray.data.Dataset:
    """Bounce analysis over gap-based sessions: per FIRST event type of
    a session, how many sessions start with it and how many bounce
    (single-event sessions).  The per-user kernel emits local
    (first_type, counts) partials, so the final exchange carries
    ≤ |types| rows per group."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])
    gap_us = np.int64(gap_seconds) * 1_000_000

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        et = np.asarray(group.column("event_type").to_pylist(),
                        dtype=object)
        order = np.lexsort((eid, ts))
        ts, et = ts[order], et[order]
        starts = np.flatnonzero(np.r_[True, np.diff(ts) > gap_us])
        sizes = np.diff(np.r_[starts, len(ts)])
        t = pa.table({
            "first_event_type": pa.array(et[starts], pa.string()),
            "n_sessions": pa.array(np.ones(len(starts), np.int64)),
            "n_bounce": pa.array((sizes == 1).astype(np.int64))})
        res = t.group_by(["first_event_type"]).aggregate(
            [("n_sessions", "sum"), ("n_bounce", "sum")])
        return pa.table({
            "first_event_type": res.column("first_event_type"),
            "n_sessions": res.column("n_sessions_sum"),
            "n_bounce": res.column("n_bounce_sum")})

    partials = ds.groupby("user_id").map_groups(per_user,
                                                batch_format="pyarrow")
    return partial_aggregate(partials, ["first_event_type"],
                             [("n_sessions", "sum", "n_sessions"),
                              ("n_bounce", "sum", "n_bounce")])


def events_peak_hour_per_type(sf_dir: str) -> ray.data.Dataset:
    """Argmax-per-group over a derived time dimension: each event type's
    busiest hour-of-day (ties → earliest hour).  (type, hour) counts
    partial-aggregate; the argmax folds per type group over ≤24 rows."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def counts(batch: pa.Table) -> pa.Table:
        hr = pc.cast(pc.hour(batch.column("ts")), pa.int64())
        t = pa.table({"event_type": batch.column("event_type"),
                      "hour": hr,
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["event_type", "hour"]).aggregate([("n", "sum")])
        return pa.table({"event_type": res.column("event_type"),
                         "hour": res.column("hour"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["event_type", "hour"], [("n", "sum", "n")])

    def argmax(group: pa.Table) -> pa.Table:
        n = group.column("n").to_numpy(zero_copy_only=False)
        h = group.column("hour").to_numpy(zero_copy_only=False)
        i = np.lexsort((h, -n))[0]
        return pa.table({
            "event_type": group.column("event_type").slice(0, 1),
            "peak_hour": pa.array([int(h[i])], pa.int64()),
            "n_events": pa.array([int(n[i])], pa.int64())})

    return agg.groupby("event_type").map_groups(argmax,
                                                batch_format="pyarrow")


def revenue_abc_classification(sf_dir: str, a_ppm: int = 800_000,
                               b_ppm: int = 950_000) -> pa.Table:
    """ABC (Pareto-class) inventory analysis: parts sorted by revenue
    descending; class A covers the first 80% of cumulative revenue, B to
    95%, C the tail — a part is in the first class whose threshold its
    INCLUSIVE cumulative share reaches.  The fact reduces to per-part
    revenue; the cumulative fold runs over that dimension-bounded table
    (ties broken by partkey, matching the SQL window order)."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_extendedprice"])

    def per_part(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "cents": pa.array(cents)})
        res = t.group_by(["l_partkey"]).aggregate([("cents", "sum")])
        return pa.table({"l_partkey": res.column("l_partkey"),
                         "cents": res.column("cents_sum")})

    rows = partial_aggregate(
        li.map_batches(per_part, batch_format="pyarrow"),
        ["l_partkey"], [("cents", "sum", "cents")]).take_all()
    pk = np.array([r["l_partkey"] for r in rows], np.int64)
    c = np.array([r["cents"] for r in rows], np.int64)
    order = np.lexsort((pk, -c))
    c = c[order]
    cum = np.cumsum(c)
    total = int(cum[-1])
    share_ppm = cum * 1_000_000 // total
    cls = np.where(share_ppm <= a_ppm, 0,
                   np.where(share_ppm <= b_ppm, 1, 2))
    names = np.array(["A", "B", "C"])
    out = {}
    for k in (0, 1, 2):
        sel = cls == k
        out[k] = (int(sel.sum()), int(c[sel].sum()))
    return pa.table({
        "abc_class": pa.array([str(names[k]) for k in (0, 1, 2)],
                              pa.string()),
        "n_parts": pa.array([out[k][0] for k in (0, 1, 2)], pa.int64()),
        "revenue_cents": pa.array([out[k][1] for k in (0, 1, 2)],
                                  pa.int64())})


def trimmed_price_sum(sf_dir: str, trim_ppm: int = 50_000) -> pa.Table:
    """Exact two-sided trimmed sum (robust mean numerator): drop the k
    lowest- and k highest-RANKED prices (k = ⌊trim·n⌋) without a global
    sort — quantile boundaries come from the distributed selection
    kernel, full-side sums from one conditional scan, and boundary-value
    duplicates are settled by exact counts."""
    from ..functions.quantiles import exact_quantiles
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_extendedprice"])
    n_rows = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    k = (trim_ppm * n_rows) // 1_000_000
    # half-offset fractions so ceil(q·n) lands EXACTLY on ranks k and
    # n-k+1 (q = k/n can float-round ceil to k+1)
    qt = exact_quantiles(li, "l_extendedprice",
                         qs=((k - 0.5) / n_rows,
                             (n_rows - k + 0.5) / n_rows))
    vals = qt.column("value").to_pylist()
    b_lo, b_hi = float(vals[0]), float(vals[1])

    def side_sums(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        lo_c = np.rint(b_lo * 100).astype(np.int64)
        hi_c = np.rint(b_hi * 100).astype(np.int64)
        return pa.table({
            "kk": pa.array([0], pa.int64()),
            "sum_all": pa.array([int(cents.sum())], pa.int64()),
            "n_lt_lo": pa.array([int((cents < lo_c).sum())], pa.int64()),
            "sum_lt_lo": pa.array([int(cents[cents < lo_c].sum())],
                                  pa.int64()),
            "n_gt_hi": pa.array([int((cents > hi_c).sum())], pa.int64()),
            "sum_gt_hi": pa.array([int(cents[cents > hi_c].sum())],
                                  pa.int64())})

    agg = partial_aggregate(
        li.map_batches(side_sums, batch_format="pyarrow"),
        ["kk"], [("sum_all", "sum", "sum_all"),
                 ("n_lt_lo", "sum", "n_lt_lo"),
                 ("sum_lt_lo", "sum", "sum_lt_lo"),
                 ("n_gt_hi", "sum", "n_gt_hi"),
                 ("sum_gt_hi", "sum", "sum_gt_hi")]).take_all()[0]
    lo_c = int(np.rint(b_lo * 100))
    hi_c = int(np.rint(b_hi * 100))
    # rank-based trim: k lowest = all strictly-below + boundary copies
    sum_low = agg["sum_lt_lo"] + (k - agg["n_lt_lo"]) * lo_c
    sum_high = agg["sum_gt_hi"] + (k - agg["n_gt_hi"]) * hi_c
    return pa.table({
        "sum_trimmed_cents": pa.array(
            [agg["sum_all"] - sum_low - sum_high], pa.int64()),
        "n_trimmed": pa.array([n_rows - 2 * k], pa.int64()),
        "k_each_side": pa.array([k], pa.int64())})


def supplier_first_month_cohort(sf_dir: str) -> ray.data.Dataset:
    """Supplier activation cohorts: suppliers grouped by the month of
    their FIRST shipment — min-combiner exchange then a tiny month
    histogram (the dimension-entity equivalent of token_first_seen)."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_shipdate"])

    def first_ship(batch: pa.Table) -> pa.Table:
        ts = batch.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        t = pa.table({"l_suppkey": batch.column("l_suppkey"),
                      "first_us": pa.array(ts)})
        res = t.group_by(["l_suppkey"]).aggregate([("first_us", "min")])
        return pa.table({"l_suppkey": res.column("l_suppkey"),
                         "first_us": res.column("first_us_min")})

    per_supp = partial_aggregate(
        li.map_batches(first_ship, batch_format="pyarrow"),
        ["l_suppkey"], [("first_us", "min", "first_us")])

    def cohort(batch: pa.Table) -> pa.Table:
        m = batch.column("first_us").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype("datetime64[M]") \
            .astype("datetime64[us]")
        t = pa.table({"cohort_month": pa.array(m),
                      "n_suppliers": pa.array(np.ones(len(batch),
                                                      np.int64))})
        res = t.group_by(["cohort_month"]).aggregate(
            [("n_suppliers", "sum")])
        return pa.table({"cohort_month": res.column("cohort_month"),
                         "n_suppliers": res.column("n_suppliers_sum")})

    return partial_aggregate(
        per_supp.map_batches(cohort, batch_format="pyarrow"),
        ["cohort_month"], [("n_suppliers", "sum", "n_suppliers")])


def order_total_consistency(sf_dir: str) -> pa.Table:
    """Referential-consistency audit: compare each order's stated total
    against the sum of its line extended prices (both in cents) and
    report match counts plus the largest absolute discrepancy.  Line
    sums reduce per batch keyed by orderkey; ONE shuffle equi-join
    attaches the stated total; the verdict folds to a single row."""
    from ..functions.joins import shuffle_lookup_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_extendedprice"])

    def line_sums(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "line_cents": pa.array(cents)})
        res = t.group_by(["l_orderkey"]).aggregate([("line_cents",
                                                     "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "line_cents": res.column("line_cents_sum")})

    sums = partial_aggregate(
        li.map_batches(line_sums, batch_format="pyarrow"),
        ["l_orderkey"], [("line_cents", "sum", "line_cents")])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_totalprice"])
    joined = shuffle_lookup_join(
        sums, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("line_cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_totalprice", pa.float64())]),
        how="inner")

    def verdict(batch: pa.Table) -> pa.Table:
        stated = np.rint(batch.column("o_totalprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        lines = batch.column("line_cents") \
            .to_numpy(zero_copy_only=False)
        diff = np.abs(stated - lines)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n_orders": pa.array([len(diff)], pa.int64()),
            "n_exact": pa.array([int((diff == 0).sum())], pa.int64()),
            "max_abs_diff_cents": pa.array(
                [int(diff.max()) if len(diff) else 0], pa.int64())})

    tot = partial_aggregate(
        joined.map_batches(verdict, batch_format="pyarrow"),
        ["k"], [("n_orders", "sum", "n_orders"),
                ("n_exact", "sum", "n_exact"),
                ("max_abs_diff_cents", "max", "max_abs_diff_cents")]) \
        .take_all()[0]
    return pa.table({
        "n_orders": pa.array([tot["n_orders"]], pa.int64()),
        "n_exact": pa.array([tot["n_exact"]], pa.int64()),
        "max_abs_diff_cents": pa.array([tot["max_abs_diff_cents"]],
                                       pa.int64())})


def lineitem_linenumber_gaps(sf_dir: str) -> pa.Table:
    """Data-integrity audit: orders whose line numbers are NOT a
    contiguous 1..n sequence (duplicates or holes).  Per-order
    (count, distinct-count, max) fold inside coarse orderkey buckets —
    one vectorized kernel per bucket, never one Python call per
    order."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        bkt = ((ok.astype(np.uint64) * _FIB64) >> np.uint64(56)) \
            .astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt))

    def audit(group: pa.Table) -> pa.Table:
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = pc.cast(group.column("l_linenumber"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        order = np.lexsort((ln, ok))
        ok, ln = ok[order], ln[order]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        ends = np.r_[starts[1:], len(ok)]
        cnt = ends - starts
        mx = ln[ends - 1]
        dup = np.add.reduceat(
            np.r_[(ln[1:] == ln[:-1]) & (ok[1:] == ok[:-1]), False]
            .astype(np.int64), starts)
        bad = (mx != cnt) | (dup > 0)
        return pa.table({
            "n_orders": pa.array([len(starts)], pa.int64()),
            "n_gapped": pa.array([int(bad.sum())], pa.int64())})

    agg = li.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bkt").map_groups(audit, batch_format="pyarrow")
    tot = partial_aggregate(agg.map_batches(
        lambda b: b.append_column("k", pa.array(np.zeros(len(b),
                                                         np.int64))),
        batch_format="pyarrow"), ["k"],
        [("n_orders", "sum", "n_orders"),
         ("n_gapped", "sum", "n_gapped")]).take_all()[0]
    return pa.table({
        "n_orders": pa.array([tot["n_orders"]], pa.int64()),
        "n_gapped": pa.array([tot["n_gapped"]], pa.int64())})


def embedding_norm_outlier_ids(sf_dir: str, q: float = 0.99
                               ) -> ray.data.Dataset:
    """Norm-based embedding outliers: vectors whose 1e8-scaled squared
    norm is STRICTLY above the q-quantile (quantile_disc semantics from
    the distributed selection kernel — no sort, no full collect)."""
    from ..functions.quantiles import exact_quantiles
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])

    def norms(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        qm = np.rint(flat.reshape(len(batch), -1) * 10_000) \
            .astype(np.int64)
        n2 = (qm * qm).sum(axis=1)
        return pa.table({"vec_id": batch.column("vec_id"),
                         "norm2_e8": pa.array(n2)})

    scored = ds.map_batches(norms, batch_format="pyarrow")
    qt = exact_quantiles(scored, "norm2_e8", qs=(q,))
    bound = int(qt.column("value")[0].as_py())
    return scored.map_batches(
        lambda b, bd=bound: b.filter(pc.greater(b.column("norm2_e8"),
                                                bd)),
        batch_format="pyarrow")


def order_value_concentration_hist(sf_dir: str, bucket_ppm: int = 100_000
                                   ) -> ray.data.Dataset:
    """How concentrated is each order's value in its single largest
    line?  Per-order (sum, max) reduce via one keyed exchange, the
    max-share ppm folds per batch, and the deciles-of-ppm histogram is a
    final tiny reduce — the feature-distribution shape for basket-skew
    features."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_extendedprice"])

    def per_order(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "sum_c": pa.array(cents),
                      "max_c": pa.array(cents)})
        res = t.group_by(["l_orderkey"]).aggregate(
            [("sum_c", "sum"), ("max_c", "max")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "sum_c": res.column("sum_c_sum"),
                         "max_c": res.column("max_c_max")})

    per = partial_aggregate(
        li.map_batches(per_order, batch_format="pyarrow"),
        ["l_orderkey"], [("sum_c", "sum", "sum_c"),
                         ("max_c", "max", "max_c")])

    def hist(batch: pa.Table) -> pa.Table:
        s = batch.column("sum_c").to_numpy(zero_copy_only=False)
        m = batch.column("max_c").to_numpy(zero_copy_only=False)
        ppm = np.where(s > 0, (1_000_000 * m) // np.where(s <= 0, 1, s),
                       0)
        t = pa.table({"share_bucket": pa.array(ppm // bucket_ppm),
                      "n_orders": pa.array(np.ones(len(s), np.int64))})
        res = t.group_by(["share_bucket"]).aggregate(
            [("n_orders", "sum")])
        return pa.table({"share_bucket": res.column("share_bucket"),
                         "n_orders": res.column("n_orders_sum")})

    return partial_aggregate(
        per.map_batches(hist, batch_format="pyarrow"),
        ["share_bucket"], [("n_orders", "sum", "n_orders")])


def doc_hash_shard_balance(sf_dir: str, n_shards: int = 16
                           ) -> ray.data.Dataset:
    """Partitioning-quality audit: docs assigned to md5-hash shards
    (the exact shard function a 100-TB layout would use) with per-shard
    row and byte counts — skew here predicts shuffle skew everywhere
    else.  One stateless pass + a tiny exchange."""
    import hashlib
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"])

    def shard(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sh = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
             % n_shards for i in ids), np.int64, len(ids))
        t = pa.table({"shard": pa.array(sh),
                      "n_docs": pa.array(np.ones(len(ids), np.int64)),
                      "n_chars": pc.cast(batch.column("n_chars"),
                                         pa.int64())})
        res = t.group_by(["shard"]).aggregate(
            [("n_docs", "sum"), ("n_chars", "sum")])
        return pa.table({"shard": res.column("shard"),
                         "n_docs": res.column("n_docs_sum"),
                         "n_chars": res.column("n_chars_sum")})

    return partial_aggregate(
        ds.map_batches(shard, batch_format="pyarrow"),
        ["shard"], [("n_docs", "sum", "n_docs"),
                    ("n_chars", "sum", "n_chars")])


def docs_with_phrase(sf_dir: str, phrase: str = "key agg row"
                     ) -> ray.data.Dataset:
    """Exact multi-token phrase search with word boundaries: pad the
    text with spaces and run ONE vectorized substring kernel per batch
    — the retrieval primitive behind phrase queries, no index
    required."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    needle = f" {phrase} "

    def match(batch: pa.Table) -> pa.Table:
        padded = pc.binary_join_element_wise(
            pa.array([" "] * len(batch)), batch.column("text"),
            pa.array([" "] * len(batch)), pa.scalar(""))
        keep = pc.match_substring(padded, needle)
        b = batch.filter(keep)
        return pa.table({"doc_id": b.column("doc_id")})

    return ds.map_batches(match, batch_format="pyarrow")


def top_revenue_day_per_nation(sf_dir: str) -> ray.data.Dataset:
    """Argmax over a JOINED fact: each supplier nation's highest-revenue
    ship day (ties → earliest day).  Nation resolves per batch
    (broadcast), (nation, day) revenues partial-aggregate, the argmax
    folds per nation group over a calendar-bounded table."""
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    side_ref = ray.put((supp.column("s_suppkey").combine_chunks(),
                        supp.column("s_nationkey").combine_chunks(),
                        nation_t.column("n_nationkey").combine_chunks(),
                        nation_t.column("n_name").combine_chunks()))
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_shipdate",
                                     "l_extendedprice"])

    def per_day(batch: pa.Table) -> pa.Table:
        sk, snk, nk, nn = ray.get(side_ref)
        si = pc.index_in(batch.column("l_suppkey"), value_set=sk)
        ni = pc.index_in(pc.take(snk, si), value_set=nk)
        day = pc.floor_temporal(batch.column("l_shipdate"), unit="day")
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"n_name": pc.take(nn, ni), "day": day,
                      "cents": pa.array(cents)})
        res = t.group_by(["n_name", "day"]).aggregate([("cents", "sum")])
        return pa.table({"n_name": res.column("n_name"),
                         "day": res.column("day"),
                         "cents": res.column("cents_sum")})

    agg = partial_aggregate(
        li.map_batches(per_day, batch_format="pyarrow"),
        ["n_name", "day"], [("cents", "sum", "cents")])

    def argmax(group: pa.Table) -> pa.Table:
        c = group.column("cents").to_numpy(zero_copy_only=False)
        d = group.column("day").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        i = np.lexsort((d, -c))[0]
        return pa.table({
            "n_name": group.column("n_name").slice(0, 1),
            "peak_day": group.column("day").take(pa.array([int(i)])),
            "revenue_cents": pa.array([int(c[i])], pa.int64())})

    return agg.groupby("n_name").map_groups(argmax,
                                            batch_format="pyarrow")


def lineitem_quantity_mode(sf_dir: str) -> pa.Table:
    """Exact statistical MODE of the quantity column (tie → smallest
    value): value counts partial-aggregate over the bounded distinct-
    value domain; the argmax folds on the driver."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity"])

    def counts(batch: pa.Table) -> pa.Table:
        q = np.rint(batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        t = pa.table({"qty": pa.array(q),
                      "n": pa.array(np.ones(len(q), np.int64))})
        res = t.group_by(["qty"]).aggregate([("n", "sum")])
        return pa.table({"qty": res.column("qty"),
                         "n": res.column("n_sum")})

    rows = partial_aggregate(
        li.map_batches(counts, batch_format="pyarrow"),
        ["qty"], [("n", "sum", "n")]).take_all()
    qs = np.array([r["qty"] for r in rows], np.int64)
    ns = np.array([r["n"] for r in rows], np.int64)
    i = np.lexsort((qs, -ns))[0]
    return pa.table({"mode_qty": pa.array([int(qs[i])], pa.int64()),
                     "n_occurrences": pa.array([int(ns[i])], pa.int64()),
                     "n_distinct": pa.array([len(qs)], pa.int64())})


def part_revenue_gini_ppm(sf_dir: str) -> pa.Table:
    """Gini coefficient (floor ppm) of revenue across parts — the
    inequality metric over a dimension-bounded aggregate: fact reduces
    to per-part revenue, the driver folds the classic
    Σ(2i−n−1)·x_(i) / (n·Σx) formula over the sorted bounded table
    (sort ties broken by partkey to match the SQL window)."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_extendedprice"])

    def per_part(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "cents": pa.array(cents)})
        res = t.group_by(["l_partkey"]).aggregate([("cents", "sum")])
        return pa.table({"l_partkey": res.column("l_partkey"),
                         "cents": res.column("cents_sum")})

    rows = partial_aggregate(
        li.map_batches(per_part, batch_format="pyarrow"),
        ["l_partkey"], [("cents", "sum", "cents")]).take_all()
    pk = np.array([r["l_partkey"] for r in rows], np.int64)
    c = np.array([r["cents"] for r in rows], np.int64)
    order = np.lexsort((pk, c))
    c = c[order]
    n = len(c)
    total = int(c.sum())
    num = int((((2 * np.arange(1, n + 1) - n - 1)) * c).sum())
    gini_ppm = (num * 1_000_000) // (n * total) if total else 0
    return pa.table({"gini_ppm": pa.array([gini_ppm], pa.int64()),
                     "n_parts": pa.array([n], pa.int64()),
                     "total_cents": pa.array([total], pa.int64())})


def customer_year_overlap_matrix(sf_dir: str) -> ray.data.Dataset:
    """Temporal cohort overlap: for every ordered pair of years, how
    many customers were active in BOTH.  Distinct (cust, year) pairs
    reduce per batch; each customer's year set folds to its year pairs
    (≤ |years|² rows per customer), and pair counts partial-aggregate —
    the co-occurrence matrix over a per-entity attribute set."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate"])

    def pairs(batch: pa.Table) -> pa.Table:
        y = pc.cast(pc.year(batch.column("o_orderdate")), pa.int64())
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "year": y})
        return t.group_by(["o_custkey", "year"]).aggregate([]) \
            .select(["o_custkey", "year"])

    distinct = partial_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["o_custkey", "year"], [])

    def year_pairs(group: pa.Table) -> pa.Table:
        y = np.sort(group.column("year").to_numpy(zero_copy_only=False))
        ii, jj = np.triu_indices(len(y), k=0)
        return pa.table({"year_a": pa.array(y[ii]),
                         "year_b": pa.array(y[jj]),
                         "n": pa.array(np.ones(len(ii), np.int64))})

    per = distinct.groupby("o_custkey").map_groups(
        year_pairs, batch_format="pyarrow")
    return partial_aggregate(per, ["year_a", "year_b"],
                             [("n", "sum", "n_customers")])


def view_to_purchase_lag_hist(sf_dir: str, bucket_s: int = 3600
                              ) -> ray.data.Dataset:
    """Funnel latency: per user, seconds from FIRST view to FIRST
    purchase (only users with both, purchase after view), folded into
    hour buckets.  Two min-combiner aggregates keyed the same way, one
    group fold, one tiny histogram exchange."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"])

    def firsts(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_in(batch.column("event_type"),
                                  value_set=pa.array(["view",
                                                      "purchase"])))
        ts = b.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        t = pa.table({"user_id": b.column("user_id"),
                      "event_type": b.column("event_type"),
                      "first_us": pa.array(ts)})
        res = t.group_by(["user_id", "event_type"]).aggregate(
            [("first_us", "min")])
        return pa.table({"user_id": res.column("user_id"),
                         "event_type": res.column("event_type"),
                         "first_us": res.column("first_us_min")})

    per = partial_aggregate(
        ds.map_batches(firsts, batch_format="pyarrow"),
        ["user_id", "event_type"], [("first_us", "min", "first_us")])

    def lag(group: pa.Table) -> pa.Table:
        et = group.column("event_type").to_pylist()
        us = group.column("first_us").to_numpy(zero_copy_only=False)
        d = dict(zip(et, us))
        empty = pa.table({"lag_bucket": pa.array([], pa.int64()),
                          "n_users": pa.array([], pa.int64())})
        if "view" not in d or "purchase" not in d:
            return empty
        lag_s = (int(d["purchase"]) - int(d["view"])) // 1_000_000
        if lag_s < 0:
            return empty
        return pa.table({"lag_bucket": pa.array([lag_s // bucket_s],
                                                pa.int64()),
                         "n_users": pa.array([1], pa.int64())})

    per_user = per.groupby("user_id").map_groups(lag,
                                                 batch_format="pyarrow")
    return partial_aggregate(per_user, ["lag_bucket"],
                             [("n_users", "sum", "n_users")])


def token_zipf_ranks(sf_dir: str) -> pa.Table:
    """Zipf profile: every token with its document frequency and
    frequency rank (ties → lexicographic) — the rank-frequency table
    behind vocabulary diagnostics.  Token df counts partial-aggregate
    (vocabulary-bounded); ranks fold on the driver."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def counts(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(batch.column("text"),
                                                " "))
        t = pa.table({"tok": flat,
                      "n": pa.array(np.ones(len(flat), np.int64))})
        res = t.group_by(["tok"]).aggregate([("n", "sum")])
        return pa.table({"tok": res.column("tok"),
                         "n": res.column("n_sum")})

    rows = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["tok"], [("n", "sum", "n")]).take_all()
    toks = np.asarray([r["tok"] for r in rows], dtype=object)
    ns = np.array([r["n"] for r in rows], np.int64)
    order = np.lexsort((toks, -ns))
    return pa.table({
        "tok": pa.array(toks[order], pa.string()),
        "n_occurrences": pa.array(ns[order]),
        "freq_rank": pa.array(np.arange(1, len(order) + 1,
                                        dtype=np.int64))})


def supplier_quadrant_counts(sf_dir: str) -> pa.Table:
    """Median-split quadrant analysis: suppliers classified by (account
    balance vs median, revenue vs median) into four quadrants — the
    2-D feature binning used for segment dashboards.  Fact reduces to
    per-supplier revenue; both medians use quantile_disc semantics over
    the bounded supplier dimension; counts fold on the driver."""
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_acctbal"])
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_extendedprice"])

    def per_supp(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"l_suppkey": batch.column("l_suppkey"),
                      "cents": pa.array(cents)})
        res = t.group_by(["l_suppkey"]).aggregate([("cents", "sum")])
        return pa.table({"l_suppkey": res.column("l_suppkey"),
                         "cents": res.column("cents_sum")})

    rows = partial_aggregate(
        li.map_batches(per_supp, batch_format="pyarrow"),
        ["l_suppkey"], [("cents", "sum", "cents")]).take_all()
    rev = {r["l_suppkey"]: r["cents"] for r in rows}
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False)
    bal_c = np.rint(supp.column("s_acctbal")
                    .to_numpy(zero_copy_only=False) * 100) \
        .astype(np.int64)
    rv = np.array([rev.get(int(k), 0) for k in sk], np.int64)

    def disc_median(v: np.ndarray) -> int:
        s = np.sort(v)
        return int(s[max(0, -(-len(s) // 2) - 1)])  # rank ceil(n/2)

    mb, mr = disc_median(bal_c), disc_median(rv)
    hi_b, hi_r = bal_c > mb, rv > mr
    names = ["hb_hr", "hb_lr", "lb_hr", "lb_lr"]
    counts = [int((hi_b & hi_r).sum()), int((hi_b & ~hi_r).sum()),
              int((~hi_b & hi_r).sum()), int((~hi_b & ~hi_r).sum())]
    keep = [i for i, c in enumerate(counts) if c > 0]  # match SQL GROUP BY
    return pa.table({
        "quadrant": pa.array([names[i] for i in keep], pa.string()),
        "n_suppliers": pa.array([counts[i] for i in keep], pa.int64())})


def doc_ttr_ppm(sf_dir: str) -> ray.data.Dataset:
    """Type-token ratio per document (distinct/total tokens, floor ppm)
    — the lexical-diversity curation signal; one stateless pass."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def ttr(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        distinct = np.fromiter((len(set(t)) for t in toks.to_pylist()),
                               np.int64, len(batch))
        ppm = np.where(n > 0,
                       (1_000_000 * distinct) // np.where(n == 0, 1, n),
                       0)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": pa.array(n.astype(np.int64)),
                         "n_distinct": pa.array(distinct),
                         "ttr_ppm": pa.array(ppm)})

    return ds.map_batches(ttr, batch_format="pyarrow")


def user_value_milestone(sf_dir: str, milestone_cents: int = 10_000
                         ) -> ray.data.Dataset:
    """Windowed-accumulator milestone: for each user, the FIRST event at
    which their running value total (ordered by ts, event_id) crosses
    the milestone — per-user vectorized cumsum, one keyed exchange, no
    driver loops.  Users that never cross are absent."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "value"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        cents = np.rint(group.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        order = np.lexsort((eid, ts))
        cum = np.cumsum(cents[order])
        hit = np.flatnonzero(cum >= milestone_cents)
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "event_id": pa.array([], pa.int64()),
                          "n_events_to_milestone": pa.array([],
                                                            pa.int64()),
                          "cum_cents": pa.array([], pa.int64())})
        if len(hit) == 0:
            return empty
        i = int(hit[0])
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "event_id": pa.array([int(eid[order][i])], pa.int64()),
            "n_events_to_milestone": pa.array([i + 1], pa.int64()),
            "cum_cents": pa.array([int(cum[i])], pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def part_name_bigram_topk(sf_dir: str, n: int = 10) -> ray.data.Dataset:
    """Top word bigrams over the part-name corpus (a second text column
    family): per-batch bigram counts, partial-agg reduce, deterministic
    top-k."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_name"])

    def counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("p_name"), " ")
        grams = []
        for tl in toks.to_pylist():
            grams.extend(f"{a} {b}" for a, b in zip(tl, tl[1:]))
        t = pa.table({"bigram": pa.array(grams, pa.string()),
                      "n": pa.array(np.ones(len(grams), np.int64))})
        res = t.group_by(["bigram"]).aggregate([("n", "sum")])
        return pa.table({"bigram": res.column("bigram"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["bigram"], [("n", "sum", "n")])
    return agg.sort(["n", "bigram"], descending=[True, False]).limit(n)


def user_second_event_type_dist(sf_dir: str) -> ray.data.Dataset:
    """Position-indexed selection: the distribution of each user's
    SECOND event type (by ts, event_id) — the 'what happens right after
    acquisition' profile.  Per-user fold emits one row; counts reduce
    via partial aggregation."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def second(group: pa.Table) -> pa.Table:
        if len(group) < 2:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64())})
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        i = np.lexsort((eid, ts))[1]
        return pa.table({
            "event_type": group.column("event_type")
            .take(pa.array([int(i)])),
            "n_users": pa.array([1], pa.int64())})

    per = ds.groupby("user_id").map_groups(second,
                                           batch_format="pyarrow")
    return partial_aggregate(per, ["event_type"],
                             [("n_users", "sum", "n_users")])


def user_longest_increasing_run(sf_dir: str) -> ray.data.Dataset:
    """Pattern mining: per user, the longest run of STRICTLY increasing
    event values over the (ts, event_id)-ordered stream — vectorized
    island detection per group, no row loops."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "value"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        cents = np.rint(group.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        order = np.lexsort((eid, ts))
        v = cents[order]
        if len(v) == 1:
            longest = 1
        else:
            brk = np.flatnonzero(v[1:] <= v[:-1])
            runs = np.diff(np.r_[0, brk + 1, len(v)])
            longest = int(runs.max())
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "longest_run": pa.array([longest], pa.int64()),
            "n_events": pa.array([len(v)], pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def order_seasonality_index(sf_dir: str) -> pa.Table:
    """Month-of-year seasonality index: each calendar month's revenue
    relative to the uniform monthly mean (floor ppm, ×12 integer
    arithmetic).  Month revenues partial-aggregate (12-bounded); the
    index folds on the driver."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def per_month(batch: pa.Table) -> pa.Table:
        m = pc.cast(pc.month(batch.column("o_orderdate")), pa.int64())
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"month_of_year": m, "cents": pa.array(cents)})
        res = t.group_by(["month_of_year"]).aggregate([("cents", "sum")])
        return pa.table({"month_of_year": res.column("month_of_year"),
                         "cents": res.column("cents_sum")})

    rows = partial_aggregate(
        ds.map_batches(per_month, batch_format="pyarrow"),
        ["month_of_year"], [("cents", "sum", "cents")]).take_all()
    rows.sort(key=lambda r: r["month_of_year"])
    total = sum(r["cents"] for r in rows)
    return pa.table({
        "month_of_year": pa.array([r["month_of_year"] for r in rows],
                                  pa.int64()),
        "revenue_cents": pa.array([r["cents"] for r in rows],
                                  pa.int64()),
        "seasonality_ppm": pa.array(
            [(r["cents"] * 12 * 1_000_000) // total for r in rows],
            pa.int64())})


def embedding_dim_range(sf_dir: str) -> ray.data.Dataset:
    """Per-dimension value ranges over the embedding corpus (feature
    scaling diagnostics): each batch folds its local per-dim min/max
    (1e4-scaled ints) and the exchange carries 64 rows per task."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])

    def ranges(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d = pc.list_value_length(emb)[0].as_py()
        q = np.rint(flat.reshape(-1, d) * 10_000).astype(np.int64)
        return pa.table({
            "dim": pa.array(np.arange(d, dtype=np.int64)),
            "min_e4": pa.array(q.min(axis=0)),
            "max_e4": pa.array(q.max(axis=0))})

    return partial_aggregate(
        ds.map_batches(ranges, batch_format="pyarrow"),
        ["dim"], [("min_e4", "min", "min_e4"),
                  ("max_e4", "max", "max_e4")])


def doc_top_token(sf_dir: str) -> ray.data.Dataset:
    """Per-document mode token (ties → lexicographic) with its count —
    per-doc argmax folded inside ONE stateless pass (documents are
    self-contained; nothing shuffles)."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def top(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_t, out_n = [], []
        for tl in toks.to_pylist():
            best, best_n = None, 0
            cnt: dict = {}
            for t in tl:
                cnt[t] = cnt.get(t, 0) + 1
            for t in sorted(cnt):
                if cnt[t] > best_n:
                    best, best_n = t, cnt[t]
            out_t.append(best)
            out_n.append(best_n)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "top_token": pa.array(out_t, pa.string()),
                         "n_occurrences": pa.array(out_n, pa.int64())})

    return ds.map_batches(top, batch_format="pyarrow")


def label_peak_dim(sf_dir: str) -> ray.data.Dataset:
    """Per-label peak embedding dimension: the dim with the largest
    ABSOLUTE centroid component (1e4-scaled integer sums; ties → lowest
    dim).  (label, dim) sums partial-aggregate — the gradient-shaped
    exchange — then a per-label argmax fold."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["label", "embedding"])

    def sums(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d = pc.list_value_length(emb)[0].as_py()
        q = np.rint(flat.reshape(-1, d) * 10_000).astype(np.int64)
        labels = pc.cast(batch.column("label"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        uniq = np.unique(labels)
        lab_out, dim_out, s_out = [], [], []
        for lb in uniq:
            s = q[labels == lb].sum(axis=0)
            lab_out.append(np.full(d, lb, np.int64))
            dim_out.append(np.arange(d, dtype=np.int64))
            s_out.append(s)
        return pa.table({"label": pa.array(np.concatenate(lab_out)),
                         "dim": pa.array(np.concatenate(dim_out)),
                         "s_e4": pa.array(np.concatenate(s_out))})

    agg = partial_aggregate(
        ds.map_batches(sums, batch_format="pyarrow"),
        ["label", "dim"], [("s_e4", "sum", "s_e4")])

    def argmax(group: pa.Table) -> pa.Table:
        s = group.column("s_e4").to_numpy(zero_copy_only=False)
        d = group.column("dim").to_numpy(zero_copy_only=False)
        i = np.lexsort((d, -np.abs(s)))[0]
        return pa.table({
            "label": group.column("label").slice(0, 1),
            "peak_dim": pa.array([int(d[i])], pa.int64()),
            "component_e4": pa.array([int(s[i])], pa.int64())})

    return agg.groupby("label").map_groups(argmax,
                                           batch_format="pyarrow")


def docs_term_first_pos(sf_dir: str, term: str = "key"
                        ) -> ray.data.Dataset:
    """Positional postings for one term: each containing document with
    the 1-based position of the term's FIRST occurrence — the retrieval
    primitive behind proximity scoring.  One stateless pass."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def first_pos(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_pos = [], []
        for did, tl in zip(ids, toks.to_pylist()):
            try:
                out_pos.append(tl.index(term) + 1)
                out_id.append(did)
            except ValueError:
                pass
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "first_pos": pa.array(out_pos, pa.int64())})

    return ds.map_batches(first_pos, batch_format="pyarrow")


def discount_tax_joint_hist(sf_dir: str) -> ray.data.Dataset:
    """Joint (discount%, tax%) contingency table over lineitems with
    integral-cent revenue per cell — the 2-D categorical histogram for
    pricing audits; pure partial aggregation."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_discount", "l_tax",
                                     "l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        disc = np.rint(batch.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        tax = np.rint(batch.column("l_tax")
                      .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"disc_pct": pa.array(disc),
                      "tax_pct": pa.array(tax),
                      "n_lines": pa.array(np.ones(len(disc), np.int64)),
                      "revenue_cents": pa.array(cents)})
        res = t.group_by(["disc_pct", "tax_pct"]).aggregate(
            [("n_lines", "sum"), ("revenue_cents", "sum")])
        return pa.table({"disc_pct": res.column("disc_pct"),
                         "tax_pct": res.column("tax_pct"),
                         "n_lines": res.column("n_lines_sum"),
                         "revenue_cents":
                             res.column("revenue_cents_sum")})

    return partial_aggregate(
        li.map_batches(cells, batch_format="pyarrow"),
        ["disc_pct", "tax_pct"],
        [("n_lines", "sum", "n_lines"),
         ("revenue_cents", "sum", "revenue_cents")])


def customer_value_trend_counts(sf_dir: str) -> pa.Table:
    """Per-customer trajectory classification (first vs last order
    value → up / down / flat) aggregated to global counts.  Per-batch
    keep-first/keep-last partials bound the exchange to ≤ |customers|
    rows per task; the classification folds per coarse bucket."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderkey",
                                     "o_orderdate", "o_totalprice"])

    def per_batch(batch: pa.Table) -> pa.Table:
        dt = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, dt, ck))
        ck_s = ck[order]
        first = np.flatnonzero(np.r_[True, ck_s[1:] != ck_s[:-1]])
        last = np.r_[first[1:] - 1, len(ck_s) - 1]
        return pa.concat_tables([
            batch.take(pa.array(order[first])),
            batch.take(pa.array(order[last]))])

    partials = ds.map_batches(per_batch, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        bkt = ((ck.astype(np.uint64) * _FIB64) >> np.uint64(56)) \
            .astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt))

    def classify(group: pa.Table) -> pa.Table:
        dt = group.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ck = group.column("o_custkey").to_numpy(zero_copy_only=False)
        ok = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        cents = np.rint(group.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        order = np.lexsort((ok, dt, ck))
        ck_s, c_s = ck[order], cents[order]
        first = np.flatnonzero(np.r_[True, ck_s[1:] != ck_s[:-1]])
        last = np.r_[first[1:] - 1, len(ck_s) - 1]
        f, l = c_s[first], c_s[last]
        return pa.table({
            "n_up": pa.array([int((l > f).sum())], pa.int64()),
            "n_down": pa.array([int((l < f).sum())], pa.int64()),
            "n_flat": pa.array([int((l == f).sum())], pa.int64())})

    per_bkt = partials.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bkt").map_groups(classify, batch_format="pyarrow")
    tot = partial_aggregate(per_bkt.map_batches(
        lambda b: b.append_column("k", pa.array(np.zeros(len(b),
                                                         np.int64))),
        batch_format="pyarrow"), ["k"],
        [("n_up", "sum", "n_up"), ("n_down", "sum", "n_down"),
         ("n_flat", "sum", "n_flat")]).take_all()[0]
    return pa.table({"n_up": pa.array([tot["n_up"]], pa.int64()),
                     "n_down": pa.array([tot["n_down"]], pa.int64()),
                     "n_flat": pa.array([tot["n_flat"]], pa.int64())})


def parts_multi_nation(sf_dir: str, min_nations: int = 3
                       ) -> ray.data.Dataset:
    """Parts sourced from ≥ N distinct supplier nations — the
    supply-chain-diversity filter: nation resolves per batch
    (broadcast), distinct (part, nation) pairs reduce, per-part nation
    counts filter."""
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    side_ref = ray.put((supp.column("s_suppkey").combine_chunks(),
                        pc.cast(supp.column("s_nationkey"),
                                pa.int64()).combine_chunks()))
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey"])

    def pairs(batch: pa.Table) -> pa.Table:
        sk, snk = ray.get(side_ref)
        si = pc.index_in(batch.column("l_suppkey"), value_set=sk)
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "nat": pc.take(snk, si)})
        return t.group_by(["l_partkey", "nat"]).aggregate([]) \
            .select(["l_partkey", "nat"])

    distinct = partial_aggregate(
        li.map_batches(pairs, batch_format="pyarrow"),
        ["l_partkey", "nat"], [])

    def counts(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["l_partkey"]).aggregate(
            [("l_partkey", "count")])
        return pa.table({"l_partkey": res.column("l_partkey"),
                         "n_nations": pc.cast(
                             res.column("l_partkey_count"), pa.int64())})

    per_part = partial_aggregate(
        distinct.map_batches(counts, batch_format="pyarrow"),
        ["l_partkey"], [("n_nations", "sum", "n_nations")])
    return per_part.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n_nations"),
                                            min_nations)),
        batch_format="pyarrow")


def top_value_events(sf_dir: str, n: int = 10) -> ray.data.Dataset:
    """Raw-fact top-k (no aggregation): the N highest-value events with
    deterministic tie-break — Ray's distributed sort over (value desc,
    event_id) then limit; only the head blocks materialize."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "user_id",
                                     "event_type", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.table({"event_id": batch.column("event_id"),
                         "user_id": batch.column("user_id"),
                         "event_type": batch.column("event_type"),
                         "value_cents": pa.array(cents)})

    return ds.map_batches(to_cents, batch_format="pyarrow") \
        .sort(["value_cents", "event_id"],
              descending=[True, False]).limit(n)


def event_weekend_share_ppm(sf_dir: str) -> ray.data.Dataset:
    """Weekend revenue share per event type (floor ppm): day-of-week
    folds per batch, (type) sums reduce once, the share stamps on the
    tiny aggregate."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "value"])

    def sums(batch: pa.Table) -> pa.Table:
        # ISO day of week: Monday=1 .. Sunday=7
        dow = pc.day_of_week(batch.column("ts"), count_from_zero=False,
                             week_start=1).to_numpy(
            zero_copy_only=False)
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        wknd = (dow >= 6).astype(np.int64)
        t = pa.table({"event_type": batch.column("event_type"),
                      "weekend_cents": pa.array(cents * wknd),
                      "total_cents": pa.array(cents)})
        res = t.group_by(["event_type"]).aggregate(
            [("weekend_cents", "sum"), ("total_cents", "sum")])
        return pa.table({"event_type": res.column("event_type"),
                         "weekend_cents": res.column(
                             "weekend_cents_sum"),
                         "total_cents": res.column("total_cents_sum")})

    agg = partial_aggregate(
        ds.map_batches(sums, batch_format="pyarrow"),
        ["event_type"], [("weekend_cents", "sum", "weekend_cents"),
                         ("total_cents", "sum", "total_cents")])

    def share(batch: pa.Table) -> pa.Table:
        w = batch.column("weekend_cents").to_numpy(zero_copy_only=False)
        t = batch.column("total_cents").to_numpy(zero_copy_only=False)
        ppm = np.where(t != 0,
                       (1_000_000 * w) // np.where(t == 0, 1, t), 0)
        return batch.append_column("weekend_share_ppm", pa.array(ppm))

    return agg.map_batches(share, batch_format="pyarrow")


def global_event_gap_topk(sf_dir: str, n: int = 10) -> pa.Table:
    """Top-N longest silences in the GLOBAL event stream — a total-order
    statistic WITHOUT a global sort: hour buckets compute their internal
    consecutive gaps locally; cross-bucket gaps come from the
    calendar-bounded per-hour (min, max) table on the driver.  Output
    is (gap_us, start_ts) pairs, ties → earliest start."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def bucket_stats(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        hour = ts // 3_600_000_000
        t = pa.table({"hour": pa.array(hour), "ts": pa.array(ts)})
        return t

    def within(group: pa.Table) -> pa.Table:
        ts = np.sort(group.column("ts").to_numpy(zero_copy_only=False))
        gaps = np.diff(ts)
        k = min(n, len(gaps))
        if k == 0:
            top_g = np.array([], np.int64)
            top_s = np.array([], np.int64)
        else:
            idx = np.lexsort((ts[:-1], -gaps))[:k]
            top_g, top_s = gaps[idx], ts[:-1][idx]
        return pa.table({
            "kind": pa.array(["gap"] * len(top_g) + ["edge"],
                             pa.string()),
            "gap_us": pa.array(np.r_[top_g, 0]),
            "start_us": pa.array(np.r_[top_s, 0]),
            "min_us": pa.array([0] * len(top_g) + [int(ts[0])],
                               pa.int64()),
            "max_us": pa.array([0] * len(top_g) + [int(ts[-1])],
                               pa.int64())})

    rows = ds.map_batches(bucket_stats, batch_format="pyarrow") \
        .groupby("hour").map_groups(within, batch_format="pyarrow") \
        .take_all()
    cand = [(r["gap_us"], r["start_us"]) for r in rows
            if r["kind"] == "gap"]
    edges = sorted((r["min_us"], r["max_us"]) for r in rows
                   if r["kind"] == "edge")
    for (m1, x1), (m2, x2) in zip(edges, edges[1:]):
        cand.append((m2 - x1, x1))
    cand.sort(key=lambda p: (-p[0], p[1]))
    cand = cand[:n]
    return pa.table({
        "gap_us": pa.array([c[0] for c in cand], pa.int64()),
        "start_ts": pa.array(
            np.array([c[1] for c in cand],
                     np.int64).astype("datetime64[us]"))})


def source_vocab_jaccard(sf_dir: str) -> ray.data.Dataset:
    """Vocabulary overlap between document sources: exact Jaccard
    numerators/denominators per source pair.  Distinct (token, source)
    pairs reduce; each token's source set folds to its source pairs
    (sources are a bounded dimension), and |A|, |B| ride along from the
    same aggregate — vocabulary never collects anywhere."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["source", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        src = batch.column("source").to_pylist()
        out_t, out_s = [], []
        for s_, tl in zip(src, toks.to_pylist()):
            u = set(tl)
            out_t.extend(u)
            out_s.extend([s_] * len(u))
        t = pa.table({"tok": pa.array(out_t, pa.string()),
                      "source": pa.array(out_s, pa.string())})
        return t.group_by(["tok", "source"]).aggregate([]) \
            .select(["tok", "source"])

    distinct = partial_aggregate(
        docs.map_batches(pairs, batch_format="pyarrow"),
        ["tok", "source"], [])

    def tok_pairs(group: pa.Table) -> pa.Table:
        srcs = sorted(group.column("source").to_pylist())
        a, b = [], []
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                a.append(srcs[i])
                b.append(srcs[j])
        # marginal rows (source, source) count |vocab(source)|
        a.extend(srcs)
        b.extend(srcs)
        return pa.table({"source_a": pa.array(a, pa.string()),
                         "source_b": pa.array(b, pa.string()),
                         "n": pa.array(np.ones(len(a), np.int64))})

    per_tok = distinct.groupby("tok").map_groups(tok_pairs,
                                                 batch_format="pyarrow")
    agg = partial_aggregate(per_tok, ["source_a", "source_b"],
                            [("n", "sum", "n")]).take_all()
    size = {r["source_a"]: r["n"] for r in agg
            if r["source_a"] == r["source_b"]}
    rows = sorted((r for r in agg if r["source_a"] != r["source_b"]),
                  key=lambda r: (r["source_a"], r["source_b"]))
    return pa.table({
        "source_a": pa.array([r["source_a"] for r in rows], pa.string()),
        "source_b": pa.array([r["source_b"] for r in rows], pa.string()),
        "inter_size": pa.array([r["n"] for r in rows], pa.int64()),
        "union_size": pa.array(
            [size[r["source_a"]] + size[r["source_b"]] - r["n"]
             for r in rows], pa.int64())})


def nation_cr4_ppm(sf_dir: str, k: int = 4) -> ray.data.Dataset:
    """CR-k concentration ratio per nation: the revenue share (floor
    ppm) of each nation's top k suppliers — the companion metric to the
    HHI, folded per nation group over the dimension-bounded supplier
    revenue table."""
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    side_ref = ray.put((supp.column("s_suppkey").combine_chunks(),
                        supp.column("s_nationkey").combine_chunks(),
                        nation_t.column("n_nationkey").combine_chunks(),
                        nation_t.column("n_name").combine_chunks()))
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_extendedprice"])

    def per_batch(batch: pa.Table) -> pa.Table:
        sk, snk, nk, nn = ray.get(side_ref)
        si = pc.index_in(batch.column("l_suppkey"), value_set=sk)
        ni = pc.index_in(pc.take(snk, si), value_set=nk)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"n_name": pc.take(nn, ni),
                      "s_suppkey": batch.column("l_suppkey"),
                      "cents": pa.array(cents)})
        res = t.group_by(["n_name", "s_suppkey"]).aggregate(
            [("cents", "sum")])
        return pa.table({"n_name": res.column("n_name"),
                         "s_suppkey": res.column("s_suppkey"),
                         "cents": res.column("cents_sum")})

    per_supp = partial_aggregate(
        li.map_batches(per_batch, batch_format="pyarrow"),
        ["n_name", "s_suppkey"], [("cents", "sum", "cents")])

    def cr(group: pa.Table) -> pa.Table:
        c = group.column("cents").to_numpy(zero_copy_only=False)
        sk = group.column("s_suppkey").to_numpy(zero_copy_only=False)
        total = int(c.sum())
        top = c[np.lexsort((sk, -c))[:k]]
        ppm = (1_000_000 * int(top.sum())) // total if total else 0
        return pa.table({
            "n_name": group.column("n_name").slice(0, 1),
            "cr4_ppm": pa.array([ppm], pa.int64()),
            "n_suppliers": pa.array([len(c)], pa.int64())})

    return per_supp.groupby("n_name").map_groups(cr,
                                                 batch_format="pyarrow")


def parts_above_brand_mean(sf_dir: str) -> ray.data.Dataset:
    """Deviation-from-group-mean WITHOUT division: a part is above its
    brand's mean retail price iff price·n_brand > brand_sum (exact
    integer cross-multiplication, no float mean).  Brand sums fold per
    group over the part dimension."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_brand",
                                     "p_retailprice"])

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("p_retailprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.table({"p_brand": batch.column("p_brand"),
                         "cents": pa.array(cents)})

    def per_brand(group: pa.Table) -> pa.Table:
        c = group.column("cents").to_numpy(zero_copy_only=False)
        n = len(c)
        s = int(c.sum())
        return pa.table({
            "p_brand": group.column("p_brand").slice(0, 1),
            "n_above": pa.array([int((c * n > s).sum())], pa.int64()),
            "n_total": pa.array([n], pa.int64())})

    return ds.map_batches(to_cents, batch_format="pyarrow") \
        .groupby("p_brand").map_groups(per_brand,
                                       batch_format="pyarrow")


def weekly_stickiness_ppm(sf_dir: str) -> ray.data.Dataset:
    """DAU/WAU stickiness per ISO-truncated week (floor ppm of the
    mean-daily-to-weekly ratio): distinct (user, day) pairs reduce once
    and serve BOTH the daily and the weekly distinct counts; the ratio
    folds per week."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def days(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        t = pa.table({"user_id": batch.column("user_id"),
                      "day": pa.array(d)})
        return t.group_by(["user_id", "day"]).aggregate([]) \
            .select(["user_id", "day"])

    per_day = partial_aggregate(
        ds.map_batches(days, batch_format="pyarrow"),
        ["user_id", "day"], [])

    def fold(group: pa.Table) -> pa.Table:
        d = group.column("day").to_numpy(zero_copy_only=False)
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        dau_sum = len(np.unique(np.stack([d, u], axis=1), axis=0))
        wau = len(np.unique(u))
        n_days = len(np.unique(d))
        ppm = (1_000_000 * dau_sum) // (n_days * wau) if wau else 0
        return pa.table({
            "week": group.column("week").slice(0, 1),
            "sum_dau": pa.array([dau_sum], pa.int64()),
            "wau": pa.array([wau], pa.int64()),
            "n_days": pa.array([n_days], pa.int64()),
            "stickiness_ppm": pa.array([ppm], pa.int64())})

    def add_week(batch: pa.Table) -> pa.Table:
        # ISO-agnostic Monday-aligned week: days since epoch (a
        # Thursday) shifted so weeks split on Monday boundaries
        d = batch.column("day").to_numpy(zero_copy_only=False)
        week = (d + 3) // 7
        return batch.append_column("week", pa.array(week))

    return per_day.map_batches(add_week, batch_format="pyarrow") \
        .groupby("week").map_groups(fold, batch_format="pyarrow")


def supplier_exclusive_parts(sf_dir: str) -> ray.data.Dataset:
    """Exclusive-supply audit: for each supplier, how many of its parts
    are shipped by NO other supplier.  Distinct (part, supplier) pairs
    reduce; single-supplier parts fold per part group and re-aggregate
    per supplier."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey"])

    def pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["l_partkey", "l_suppkey"]).aggregate([]) \
            .select(["l_partkey", "l_suppkey"])

    distinct = partial_aggregate(
        li.map_batches(pairs, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], [])

    def exclusive(group: pa.Table) -> pa.Table:
        if len(group) != 1:
            return pa.table({"l_suppkey": pa.array([], pa.int64()),
                             "n_exclusive_parts": pa.array([],
                                                           pa.int64())})
        return pa.table({"l_suppkey": group.column("l_suppkey"),
                         "n_exclusive_parts": pa.array([1], pa.int64())})

    per_part = distinct.groupby("l_partkey").map_groups(
        exclusive, batch_format="pyarrow")
    agg = partial_aggregate(per_part, ["l_suppkey"],
                            [("n_exclusive_parts", "sum",
                              "n_exclusive_parts")])
    # legitimately often EMPTY → typed Table (Ray to_pandas drops
    # columns on 0-row Datasets)
    seed = pa.table({"l_suppkey": pa.array([], pa.int64()),
                     "n_exclusive_parts": pa.array([], pa.int64())})
    return pa.concat_tables(
        [seed] + [b.select(["l_suppkey", "n_exclusive_parts"])
                  for b in agg.iter_batches(batch_format="pyarrow")])


def event_type_share_volatility(sf_dir: str) -> pa.Table:
    """Mix-shift volatility: per event type, the range (max − min) of
    its DAILY share (floor ppm) across days — (day, type) counts reduce
    once; the per-day shares and the per-type range fold over the
    calendar × types bounded table on the driver."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def counts(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        t = pa.table({"day": pa.array(d),
                      "event_type": batch.column("event_type"),
                      "n": pa.array(np.ones(len(d), np.int64))})
        res = t.group_by(["day", "event_type"]).aggregate([("n", "sum")])
        return pa.table({"day": res.column("day"),
                         "event_type": res.column("event_type"),
                         "n": res.column("n_sum")})

    rows = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["day", "event_type"], [("n", "sum", "n")]).take_all()
    day_tot: dict = {}
    for r in rows:
        day_tot[r["day"]] = day_tot.get(r["day"], 0) + r["n"]
    shares: dict = {}
    for r in rows:
        ppm = (1_000_000 * r["n"]) // day_tot[r["day"]]
        shares.setdefault(r["event_type"], []).append(ppm)
    types = sorted(shares)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "min_share_ppm": pa.array([min(shares[t]) for t in types],
                                  pa.int64()),
        "max_share_ppm": pa.array([max(shares[t]) for t in types],
                                  pa.int64()),
        "share_range_ppm": pa.array(
            [max(shares[t]) - min(shares[t]) for t in types],
            pa.int64())})


def price_last_digit_hist(sf_dir: str) -> ray.data.Dataset:
    """Last-digit uniformity audit (companion to the Benford first-digit
    check): distribution of the final cent digit of extended prices —
    pure integer modulo, one tiny exchange."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_extendedprice"])

    def digits(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"last_digit": pa.array(c % 10),
                      "n": pa.array(np.ones(len(c), np.int64))})
        res = t.group_by(["last_digit"]).aggregate([("n", "sum")])
        return pa.table({"last_digit": res.column("last_digit"),
                         "n": res.column("n_sum")})

    return partial_aggregate(
        li.map_batches(digits, batch_format="pyarrow"),
        ["last_digit"], [("n", "sum", "n")])


def user_resurrection_counts(sf_dir: str, churn_days: int = 7
                             ) -> ray.data.Dataset:
    """Churn-and-return accounting: histogram of per-user resurrection
    counts (gaps > churn_days between consecutive ACTIVE days).
    Distinct (user, day) pairs reduce; the per-user gap scan is one
    vectorized diff; the histogram a final tiny exchange."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def days(batch: pa.Table) -> pa.Table:
        d = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        t = pa.table({"user_id": batch.column("user_id"),
                      "day": pa.array(d)})
        return t.group_by(["user_id", "day"]).aggregate([]) \
            .select(["user_id", "day"])

    per_day = partial_aggregate(
        ds.map_batches(days, batch_format="pyarrow"),
        ["user_id", "day"], [])

    def per_user(group: pa.Table) -> pa.Table:
        d = np.sort(group.column("day").to_numpy(zero_copy_only=False))
        n_res = int((np.diff(d) > churn_days).sum())
        return pa.table({"n_resurrections": pa.array([n_res],
                                                     pa.int64()),
                         "n_users": pa.array([1], pa.int64())})

    per = per_day.groupby("user_id").map_groups(per_user,
                                                batch_format="pyarrow")
    return partial_aggregate(per, ["n_resurrections"],
                             [("n_users", "sum", "n_users")])


def doc_first_token_dist(sf_dir: str) -> ray.data.Dataset:
    """Distribution of document-initial tokens (template/boilerplate
    detector): one vectorized first-token extraction, counts
    partial-aggregate."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def firsts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        first = pc.list_element(toks, 0)
        t = pa.table({"first_token": first,
                      "n_docs": pa.array(np.ones(len(batch),
                                                 np.int64))})
        res = t.group_by(["first_token"]).aggregate([("n_docs", "sum")])
        return pa.table({"first_token": res.column("first_token"),
                         "n_docs": res.column("n_docs_sum")})

    return partial_aggregate(
        ds.map_batches(firsts, batch_format="pyarrow"),
        ["first_token"], [("n_docs", "sum", "n_docs")])


def order_ship_span_hist(sf_dir: str) -> ray.data.Dataset:
    """Fulfillment-span histogram: days between an order's FIRST and
    LAST line shipments — per-order (min, max) reduce via one keyed
    exchange, span fold per batch, tiny histogram reduce."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])

    def minmax(batch: pa.Table) -> pa.Table:
        d = batch.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "mn": pa.array(d), "mx": pa.array(d)})
        res = t.group_by(["l_orderkey"]).aggregate(
            [("mn", "min"), ("mx", "max")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "mn": res.column("mn_min"),
                         "mx": res.column("mx_max")})

    per = partial_aggregate(
        li.map_batches(minmax, batch_format="pyarrow"),
        ["l_orderkey"], [("mn", "min", "mn"), ("mx", "max", "mx")])

    def hist(batch: pa.Table) -> pa.Table:
        span = batch.column("mx").to_numpy(zero_copy_only=False) \
            - batch.column("mn").to_numpy(zero_copy_only=False)
        t = pa.table({"span_days": pa.array(span),
                      "n_orders": pa.array(np.ones(len(span),
                                                   np.int64))})
        res = t.group_by(["span_days"]).aggregate([("n_orders", "sum")])
        return pa.table({"span_days": res.column("span_days"),
                         "n_orders": res.column("n_orders_sum")})

    return partial_aggregate(
        per.map_batches(hist, batch_format="pyarrow"),
        ["span_days"], [("n_orders", "sum", "n_orders")])


def user_type_loyalty(sf_dir: str) -> ray.data.Dataset:
    """Per-user behavioral loyalty: the floor-ppm share of the user's
    single most frequent event type (ties irrelevant — only the max
    count matters).  (user, type) counts reduce once; the max/sum fold
    runs per user group over ≤ |types| rows."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def counts(batch: pa.Table) -> pa.Table:
        t = batch.append_column("n", pa.array(np.ones(len(batch),
                                                      np.int64)))
        res = t.group_by(["user_id", "event_type"]).aggregate(
            [("n", "sum")])
        return pa.table({"user_id": res.column("user_id"),
                         "event_type": res.column("event_type"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["user_id", "event_type"], [("n", "sum", "n")])

    def loyalty(group: pa.Table) -> pa.Table:
        n = group.column("n").to_numpy(zero_copy_only=False)
        tot = int(n.sum())
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "n_events": pa.array([tot], pa.int64()),
            "loyalty_ppm": pa.array(
                [(1_000_000 * int(n.max())) // tot if tot else 0],
                pa.int64())})

    return agg.groupby("user_id").map_groups(loyalty,
                                             batch_format="pyarrow")


def supplier_active_months(sf_dir: str) -> ray.data.Dataset:
    """Supplier activity continuity: distinct active months, the
    first→last month span, and the coverage share (floor ppm of active
    months within the span).  Distinct (supplier, month) pairs reduce;
    the continuity fold runs per supplier group."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_shipdate"])

    def months(batch: pa.Table) -> pa.Table:
        m = batch.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[M]").astype(np.int64)
        t = pa.table({"l_suppkey": batch.column("l_suppkey"),
                      "month": pa.array(m)})
        return t.group_by(["l_suppkey", "month"]).aggregate([]) \
            .select(["l_suppkey", "month"])

    per = partial_aggregate(
        li.map_batches(months, batch_format="pyarrow"),
        ["l_suppkey", "month"], [])

    def fold(group: pa.Table) -> pa.Table:
        m = group.column("month").to_numpy(zero_copy_only=False)
        span = int(m.max() - m.min()) + 1
        return pa.table({
            "l_suppkey": group.column("l_suppkey").slice(0, 1),
            "n_active_months": pa.array([len(m)], pa.int64()),
            "span_months": pa.array([span], pa.int64()),
            "coverage_ppm": pa.array([(1_000_000 * len(m)) // span],
                                     pa.int64())})

    return per.groupby("l_suppkey").map_groups(fold,
                                               batch_format="pyarrow")


def token_cooccurrence_degree(sf_dir: str) -> ray.data.Dataset:
    """Token co-occurrence graph degrees: for each token, how many
    DISTINCT other tokens share a document with it.  Distinct unordered
    token pairs reduce (the frequent-itemset exchange); degrees fold by
    exploding each pair both ways."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["text"])

    def pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        a_all, b_all = [], []
        for tl in toks.to_pylist():
            u = sorted(set(tl))
            for i in range(len(u) - 1):
                a_all.extend(u[i] for _ in range(len(u) - 1 - i))
                b_all.extend(u[i + 1:])
        t = pa.table({"tok_a": pa.array(a_all, pa.string()),
                      "tok_b": pa.array(b_all, pa.string())})
        return t.group_by(["tok_a", "tok_b"]).aggregate([]) \
            .select(["tok_a", "tok_b"])

    distinct = partial_aggregate(
        docs.map_batches(pairs, batch_format="pyarrow"),
        ["tok_a", "tok_b"], [])

    def degrees(batch: pa.Table) -> pa.Table:
        a = batch.column("tok_a").combine_chunks()
        b = batch.column("tok_b").combine_chunks()
        t = pa.table({"tok": pa.concat_arrays([a, b]),
                      "degree": pa.array(np.ones(2 * len(batch),
                                                 np.int64))})
        res = t.group_by(["tok"]).aggregate([("degree", "sum")])
        return pa.table({"tok": res.column("tok"),
                         "degree": res.column("degree_sum")})

    return partial_aggregate(
        distinct.map_batches(degrees, batch_format="pyarrow"),
        ["tok"], [("degree", "sum", "degree")])


def preferred_order_dow_dist(sf_dir: str) -> ray.data.Dataset:
    """Two-level argmax: each customer's preferred order day-of-week
    (max order count, ties → smallest ISO dow), then the distribution of
    customers over preferred days.  (cust, dow) counts reduce; the
    argmax folds per customer over ≤7 rows; a final tiny reduce."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate"])

    def counts(batch: pa.Table) -> pa.Table:
        dow = pc.day_of_week(batch.column("o_orderdate"),
                             count_from_zero=False, week_start=1)
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "dow": pc.cast(dow, pa.int64()),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["o_custkey", "dow"]).aggregate([("n", "sum")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "dow": res.column("dow"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["o_custkey", "dow"], [("n", "sum", "n")])

    def argmax(group: pa.Table) -> pa.Table:
        n = group.column("n").to_numpy(zero_copy_only=False)
        d = group.column("dow").to_numpy(zero_copy_only=False)
        i = np.lexsort((d, -n))[0]
        return pa.table({"preferred_dow": pa.array([int(d[i])],
                                                   pa.int64()),
                         "n_customers": pa.array([1], pa.int64())})

    per = agg.groupby("o_custkey").map_groups(argmax,
                                              batch_format="pyarrow")
    return partial_aggregate(per, ["preferred_dow"],
                             [("n_customers", "sum", "n_customers")])


def doc_adjacent_repeat_counts(sf_dir: str) -> ray.data.Dataset:
    """RLE-compressibility signal: per document, how many adjacent token
    pairs are equal (stutter/repetition artifact detector) — one
    vectorized pass, no exchange."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def repeats(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        reps = np.fromiter(
            (sum(a == b for a, b in zip(tl, tl[1:]))
             for tl in toks.to_pylist()), np.int64, len(batch))
        n = pc.cast(pc.list_value_length(toks), pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_adjacent_repeats": pa.array(reps),
                         "n_tokens": n})

    return ds.map_batches(repeats, batch_format="pyarrow")


def nation_customer_reach(sf_dir: str) -> ray.data.Dataset:
    """Market-reach audit per nation: how many customers exist vs how
    many ever ordered (floor-ppm reach).  The fact reduces to its
    distinct custkey set (bounded by the customer dimension), broadcast
    back over the dimension scan — the fact table never shuffles."""
    from ..functions.joins import broadcast_semi_join
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey"])

    def distinct(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": batch.column("o_custkey")
                         .combine_chunks().unique()})

    active = partial_aggregate(
        orders.map_batches(distinct, batch_format="pyarrow"),
        ["o_custkey"], [])
    active_keys = pa.array(
        sorted(r["o_custkey"] for r in active.take_all()))
    key_ref = ray.put(active_keys)
    nation_t = pq.read_table(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    side_ref = ray.put((nation_t.column("n_nationkey").combine_chunks(),
                        nation_t.column("n_name").combine_chunks()))
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])

    def per_batch(batch: pa.Table) -> pa.Table:
        keys = ray.get(key_ref)
        nk, nn = ray.get(side_ref)
        ni = pc.index_in(batch.column("c_nationkey"), value_set=nk)
        act = pc.cast(pc.is_in(batch.column("c_custkey"),
                               value_set=keys), pa.int64())
        t = pa.table({"n_name": pc.take(nn, ni),
                      "n_active": act,
                      "n_customers": pa.array(np.ones(len(batch),
                                                      np.int64))})
        res = t.group_by(["n_name"]).aggregate(
            [("n_active", "sum"), ("n_customers", "sum")])
        return pa.table({"n_name": res.column("n_name"),
                         "n_active": res.column("n_active_sum"),
                         "n_customers": res.column("n_customers_sum")})

    agg = partial_aggregate(
        cust.map_batches(per_batch, batch_format="pyarrow"),
        ["n_name"], [("n_active", "sum", "n_active"),
                     ("n_customers", "sum", "n_customers")])

    def reach(batch: pa.Table) -> pa.Table:
        a = batch.column("n_active").to_numpy(zero_copy_only=False)
        c = batch.column("n_customers").to_numpy(zero_copy_only=False)
        ppm = (1_000_000 * a) // np.where(c == 0, 1, c)
        return batch.append_column("reach_ppm", pa.array(ppm))

    return agg.map_batches(reach, batch_format="pyarrow")


def top_order_value_jumps(sf_dir: str, n: int = 10) -> ray.data.Dataset:
    """Largest order-over-order value INCREASES: per-customer
    consecutive diffs over the (date, orderkey)-ordered sequence, each
    customer's max jump, then a global deterministic top-N.  Per-user
    kernels emit one row; only the bounded jump table sorts."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderkey",
                                     "o_orderdate", "o_totalprice"])

    def per_cust(group: pa.Table) -> pa.Table:
        empty = pa.table({"o_custkey": pa.array([], pa.int64()),
                          "jump_cents": pa.array([], pa.int64())})
        if len(group) < 2:
            return empty
        dt = group.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ok = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        cents = np.rint(group.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        order = np.lexsort((ok, dt))
        d = np.diff(cents[order])
        mx = int(d.max())
        if mx <= 0:
            return empty
        return pa.table({"o_custkey": group.column("o_custkey")
                         .slice(0, 1),
                         "jump_cents": pa.array([mx], pa.int64())})

    per = ds.groupby("o_custkey").map_groups(per_cust,
                                             batch_format="pyarrow")
    return per.sort(["jump_cents", "o_custkey"],
                    descending=[True, False]).limit(n)


def event_minute_hist(sf_dir: str) -> ray.data.Dataset:
    """Minute-of-hour uniformity histogram (clock-skew / batching
    artifact detector) — one vectorized temporal kernel, tiny reduce."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts"])

    def minutes(batch: pa.Table) -> pa.Table:
        m = pc.cast(pc.minute(batch.column("ts")), pa.int64())
        t = pa.table({"minute": m,
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["minute"]).aggregate([("n", "sum")])
        return pa.table({"minute": res.column("minute"),
                         "n": res.column("n_sum")})

    return partial_aggregate(
        ds.map_batches(minutes, batch_format="pyarrow"),
        ["minute"], [("n", "sum", "n")])


def user_weekend_ratio_hist(sf_dir: str, bucket_ppm: int = 100_000
                            ) -> ray.data.Dataset:
    """Distribution of per-user weekend-activity ratios: each user's
    weekend event share (floor ppm) folds into deciles-of-ppm buckets —
    behavioral segmentation without materializing per-user rows
    anywhere central."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def sums(batch: pa.Table) -> pa.Table:
        dow = pc.day_of_week(batch.column("ts"), count_from_zero=False,
                             week_start=1).to_numpy(
            zero_copy_only=False)
        wknd = (dow >= 6).astype(np.int64)
        t = pa.table({"user_id": batch.column("user_id"),
                      "n_weekend": pa.array(wknd),
                      "n_total": pa.array(np.ones(len(batch),
                                                  np.int64))})
        res = t.group_by(["user_id"]).aggregate(
            [("n_weekend", "sum"), ("n_total", "sum")])
        return pa.table({"user_id": res.column("user_id"),
                         "n_weekend": res.column("n_weekend_sum"),
                         "n_total": res.column("n_total_sum")})

    per = partial_aggregate(
        ds.map_batches(sums, batch_format="pyarrow"),
        ["user_id"], [("n_weekend", "sum", "n_weekend"),
                      ("n_total", "sum", "n_total")])

    def hist(batch: pa.Table) -> pa.Table:
        w = batch.column("n_weekend").to_numpy(zero_copy_only=False)
        t = batch.column("n_total").to_numpy(zero_copy_only=False)
        ppm = (1_000_000 * w) // np.where(t == 0, 1, t)
        tb = pa.table({"ratio_bucket": pa.array(ppm // bucket_ppm),
                       "n_users": pa.array(np.ones(len(w), np.int64))})
        res = tb.group_by(["ratio_bucket"]).aggregate(
            [("n_users", "sum")])
        return pa.table({"ratio_bucket": res.column("ratio_bucket"),
                         "n_users": res.column("n_users_sum")})

    return partial_aggregate(
        per.map_batches(hist, batch_format="pyarrow"),
        ["ratio_bucket"], [("n_users", "sum", "n_users")])


def source_dup_stats(sf_dir: str) -> ray.data.Dataset:
    """Dedup observability per source: document count, distinct content
    fingerprints, and the duplicate ratio (floor ppm).  Distinct
    (source, fingerprint) pairs reduce alongside raw counts — only 16-B
    fingerprints shuffle."""
    from ..functions.text import md5_fingerprint
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table({
            "source": batch.column("source"),
            "fp": pa.array(md5_fingerprint(
                batch.column("text").to_pylist()), pa.string()),
            "n": pa.array(np.ones(len(batch), np.int64))})

    keyed = ds.map_batches(fp, batch_format="pyarrow")

    def pairs(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["source", "fp"]).aggregate([("n", "sum")])
        return pa.table({"source": res.column("source"),
                         "fp": res.column("fp"),
                         "n": res.column("n_sum")})

    per_fp = partial_aggregate(
        keyed.map_batches(pairs, batch_format="pyarrow"),
        ["source", "fp"], [("n", "sum", "n")])

    def fold(batch: pa.Table) -> pa.Table:
        t = pa.table({"source": batch.column("source"),
                      "n_docs": batch.column("n"),
                      "n_unique": pa.array(np.ones(len(batch),
                                                   np.int64))})
        res = t.group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("n_unique", "sum")])
        return pa.table({"source": res.column("source"),
                         "n_docs": res.column("n_docs_sum"),
                         "n_unique": res.column("n_unique_sum")})

    agg = partial_aggregate(
        per_fp.map_batches(fold, batch_format="pyarrow"),
        ["source"], [("n_docs", "sum", "n_docs"),
                     ("n_unique", "sum", "n_unique")])

    def ratio(batch: pa.Table) -> pa.Table:
        d = batch.column("n_docs").to_numpy(zero_copy_only=False)
        u = batch.column("n_unique").to_numpy(zero_copy_only=False)
        ppm = (1_000_000 * (d - u)) // np.where(d == 0, 1, d)
        return batch.append_column("dup_ratio_ppm", pa.array(ppm))

    return agg.map_batches(ratio, batch_format="pyarrow")


def user_hour_bitmask(sf_dir: str) -> ray.data.Dataset:
    """24-bit hour-of-day activity fingerprint per user (bit h = any
    event in hour h) plus the active-hour count — the behavioral
    fingerprint companion to the 63-day bitmask.  Distinct (user, hour)
    pairs reduce; the mask is Σ 2^hour."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def hours(batch: pa.Table) -> pa.Table:
        h = pc.cast(pc.hour(batch.column("ts")), pa.int64())
        t = pa.table({"user_id": batch.column("user_id"), "hour": h})
        return t.group_by(["user_id", "hour"]).aggregate([]) \
            .select(["user_id", "hour"])

    per = partial_aggregate(
        ds.map_batches(hours, batch_format="pyarrow"),
        ["user_id", "hour"], [])

    def bits(batch: pa.Table) -> pa.Table:
        h = batch.column("hour").to_numpy(zero_copy_only=False)
        return pa.table({"user_id": batch.column("user_id"),
                         "hour_mask": pa.array(np.int64(1) << h),
                         "n_active_hours": pa.array(
                             np.ones(len(h), np.int64))})

    return partial_aggregate(
        per.map_batches(bits, batch_format="pyarrow"),
        ["user_id"], [("hour_mask", "sum", "hour_mask"),
                      ("n_active_hours", "sum", "n_active_hours")])


def part_name_collisions(sf_dir: str) -> ray.data.Dataset:
    """Catalog-integrity audit: part NAMES used by more than one brand
    (distinct (name, brand) pairs → per-name brand counts → filter) —
    the attribute-collision detector."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_name", "p_brand"])

    def pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["p_name", "p_brand"]).aggregate([]) \
            .select(["p_name", "p_brand"])

    distinct = partial_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["p_name", "p_brand"], [])

    def counts(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["p_name"]).aggregate([("p_name", "count")])
        return pa.table({"p_name": res.column("p_name"),
                         "n_brands": pc.cast(res.column("p_name_count"),
                                             pa.int64())})

    per_name = partial_aggregate(
        distinct.map_batches(counts, batch_format="pyarrow"),
        ["p_name"], [("n_brands", "sum", "n_brands")])
    out = per_name.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n_brands"), 2)),
        batch_format="pyarrow")
    seed = pa.table({"p_name": pa.array([], pa.string()),
                     "n_brands": pa.array([], pa.int64())})
    return pa.concat_tables(
        [seed] + [b.select(["p_name", "n_brands"])
                  for b in out.iter_batches(batch_format="pyarrow")])


def referential_integrity_audit(sf_dir: str) -> ray.data.Dataset:
    """One-report FK-orphan audit across the star schema: for each
    foreign key, total fact rows and rows whose key is missing from the
    dimension.  Every dimension key set is ``ray.put`` ONCE and tested
    with ``pc.is_in`` inside map_batches (no shuffle; the fact tables
    stream).  Both lineitem FKs share a single scan.  For a fact→fact
    edge too big to broadcast, the shuffle anti-join pattern
    (``lineitem_orphans``) is the scale path."""
    import ray as _ray

    part_keys = _ray.put(pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey"]).column(0)
        .combine_chunks())
    supp_keys = _ray.put(pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey"]).column(0)
        .combine_chunks())
    cust_keys = _ray.put(pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]).column(0)
        .combine_chunks())
    nat_keys = _ray.put(pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey"]).column(0)
        .combine_chunks())

    def audit(fk_names: list[tuple[str, str, object]]):
        def fn(batch: pa.Table) -> pa.Table:
            fks, rows, orphans = [], [], []
            for col, label, ref in fk_names:
                keys = _ray.get(ref)
                v = batch.column(col)
                if v.type != keys.type:
                    v = v.cast(keys.type)
                hit = pc.is_in(v, value_set=keys)
                fks.append(label)
                rows.append(len(batch))
                orphans.append(len(batch)
                               - pc.sum(hit).as_py())
            return pa.table({"fk": pa.array(fks, pa.string()),
                             "n_rows": pa.array(rows, pa.int64()),
                             "n_orphans": pa.array(orphans, pa.int64())})
        return fn

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey"]) \
        .map_batches(audit([
            ("l_partkey", "lineitem.l_partkey->part", part_keys),
            ("l_suppkey", "lineitem.l_suppkey->supplier", supp_keys)]),
            batch_format="pyarrow")
    od = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey"]) \
        .map_batches(audit([
            ("o_custkey", "orders.o_custkey->customer", cust_keys)]),
            batch_format="pyarrow")
    cu = read_parquet_clean(f"{sf_dir}/customer.parquet",
                            columns=["c_nationkey"]) \
        .map_batches(audit([
            ("c_nationkey", "customer.c_nationkey->nation", nat_keys)]),
            batch_format="pyarrow")
    return partial_aggregate(
        li.union(od).union(cu), ["fk"],
        [("n_rows", "sum", "n_rows"), ("n_orphans", "sum", "n_orphans")])


def embedding_dim_sign_balance(sf_dir: str) -> ray.data.Dataset:
    """Per-dimension sign census of the embedding space (positive /
    negative / zero counts at e4 quantization) — the sanity probe for a
    mis-centered encoder.  Each batch folds its vectors into a 64-row
    partial; the exchange carries 64 × n_batches rows."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])

    def per_batch(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column("embedding")
                     .to_numpy(zero_copy_only=False))
        q = np.rint(m.astype(np.float64) * 10_000).astype(np.int64)
        return pa.table({
            "dim": pa.array(np.arange(q.shape[1], dtype=np.int64)),
            "n_pos": pa.array((q > 0).sum(axis=0).astype(np.int64)),
            "n_neg": pa.array((q < 0).sum(axis=0).astype(np.int64)),
            "n_zero": pa.array((q == 0).sum(axis=0).astype(np.int64))})

    return partial_aggregate(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        ["dim"], [("n_pos", "sum", "n_pos"), ("n_neg", "sum", "n_neg"),
                  ("n_zero", "sum", "n_zero")])


def avg_token_len_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Mean token length per language (floor ppm) WITHOUT tokenizing:
    for single-space-joined text, Σ len(token) = len(text) − n_spaces
    and n_tokens = n_spaces + n_docs — two string kernels replace the
    token explode, so the exchange carries 3 counters per lang."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text"])

    def counters(batch: pa.Table) -> pa.Table:
        chars = pc.utf8_length(batch.column("text"))
        spaces = pc.count_substring(batch.column("text"), " ")
        return pa.table({
            "lang": batch.column("lang"),
            "n_docs": pa.array(np.ones(len(batch), np.int64)),
            "n_tokens": pc.cast(pc.add(spaces, 1), pa.int64()),
            "tok_chars": pc.cast(pc.subtract(chars, spaces), pa.int64())})

    agg = partial_aggregate(
        ds.map_batches(counters, batch_format="pyarrow"),
        ["lang"], [("n_docs", "sum", "n_docs"),
                   ("n_tokens", "sum", "n_tokens"),
                   ("tok_chars", "sum", "tok_chars")])

    def ratio(batch: pa.Table) -> pa.Table:
        t = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        c = batch.column("tok_chars").to_numpy(zero_copy_only=False)
        ppm = (1_000_000 * c) // np.where(t == 0, 1, t)
        return batch.append_column("avg_len_ppm", pa.array(ppm))

    return agg.map_batches(ratio, batch_format="pyarrow")


def user_type_run_counts(sf_dir: str) -> ray.data.Dataset:
    """Run-length encoding of each user's event-type stream: number of
    maximal same-type runs and the longest run, over the
    (ts, event_id)-ordered sequence — vectorized break detection per
    group (the hash exchange carries only the group key)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        t = types[order]
        brk = np.flatnonzero(t[1:] != t[:-1])
        runs = np.diff(np.r_[0, brk + 1, len(t)])
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "n_runs": pa.array([len(runs)], pa.int64()),
            "longest_run": pa.array([int(runs.max())], pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def pagerank_nation_trade(sf_dir: str, iters: int = 3) -> ray.data.Dataset:
    """Integer fixed-point PageRank (damping 0.85, e6 scale, floor
    division — bit-exact vs the unrolled SQL oracle) over the nation
    trade graph: edge (customer nation → supplier nation) weighted by
    lineitem count.  The heavy work is the distributed edge build —
    lineitem pre-reduces per batch, the fact⋈fact orderkey link runs
    one shuffle_lookup_join — after which the graph is bounded by the
    nation DIMENSION (≤625 edges), so the power iterations fold on the
    driver; node count never scales with data volume."""
    from ..functions.joins import shuffle_lookup_join
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation_ids = pc.cast(pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey"]).column(0),
        pa.int64()).to_numpy(zero_copy_only=False)
    side = ray.put((sup.column("s_suppkey").combine_chunks(),
                    pc.cast(sup.column("s_nationkey").combine_chunks(),
                            pa.int64()),
                    cust.column("c_custkey").combine_chunks(),
                    pc.cast(cust.column("c_nationkey").combine_chunks(),
                            pa.int64())))

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])

    def li_partial(batch: pa.Table) -> pa.Table:
        sk, snk, _, _ = ray.get(side)
        i = pc.index_in(batch.column("l_suppkey"), value_set=sk)
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "supp_nk": pc.take(snk, i),
                      "w": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["l_orderkey", "supp_nk"]).aggregate([("w", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "supp_nk": res.column("supp_nk"),
                         "w": res.column("w_sum")})

    def ord_nat(batch: pa.Table) -> pa.Table:
        _, _, ck, cnk = ray.get(side)
        i = pc.index_in(batch.column("o_custkey"), value_set=ck)
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "cust_nk": pc.take(cnk, i)})

    joined = shuffle_lookup_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        orders.map_batches(ord_nat, batch_format="pyarrow"),
        on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("supp_nk", pa.int64()),
                               ("w", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("cust_nk", pa.int64())]))

    def fold(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["cust_nk", "supp_nk"]).aggregate([("w", "sum")])
        return pa.table({"u": res.column("cust_nk"),
                         "v": res.column("supp_nk"),
                         "w": res.column("w_sum")})

    edges = partial_aggregate(
        joined.map_batches(fold, batch_format="pyarrow"),
        ["u", "v"], [("w", "sum", "w")]).take_all()  # ≤ 625 rows (dim²)
    u = np.array([e["u"] for e in edges], np.int64)
    v = np.array([e["v"] for e in edges], np.int64)
    w = np.array([e["w"] for e in edges], np.int64)

    idx = {int(n): k for k, n in enumerate(nation_ids)}
    ui = np.array([idx[x] for x in u], np.int64) if len(u) else u
    vi = np.array([idx[x] for x in v], np.int64) if len(v) else v
    n = len(nation_ids)
    wout = np.zeros(n, np.int64)
    np.add.at(wout, ui, w)
    pr = np.full(n, 1_000_000, np.int64)
    for _ in range(iters):
        contrib = np.zeros(n, np.int64)
        if len(u):
            np.add.at(contrib, vi, (pr[ui] * w) // wout[ui])
        pr = 150_000 + (850 * contrib) // 1000
    return ray.data.from_arrow(pa.table({
        "nationkey": pa.array(nation_ids),
        "pr_e6": pa.array(pr)}))


def brand_name_lcp(sf_dir: str) -> ray.data.Dataset:
    """Longest-common-prefix length of all part names per brand WITHOUT
    shipping the names: LCP(group) = LCP(min(name), max(name)) — two
    order-statistic string aggregates replace an all-names reduction, so
    the exchange carries 2 strings per brand."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_brand", "p_name"])

    def mm(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["p_brand"]).aggregate(
            [("p_name", "min"), ("p_name", "max"),
             ("p_brand", "count")])
        return pa.table({"p_brand": res.column("p_brand"),
                         "mn": res.column("p_name_min"),
                         "mx": res.column("p_name_max"),
                         "n_parts": pc.cast(res.column("p_brand_count"),
                                            pa.int64())})

    agg = partial_aggregate(
        ds.map_batches(mm, batch_format="pyarrow"),
        ["p_brand"], [("mn", "min", "mn"), ("mx", "max", "mx"),
                      ("n_parts", "sum", "n_parts")])

    def lcp(batch: pa.Table) -> pa.Table:  # ≤ n_brands rows (dimension)
        import os.path
        mn = batch.column("mn").to_pylist()
        mx = batch.column("mx").to_pylist()
        out = [len(os.path.commonprefix([a, b])) for a, b in zip(mn, mx)]
        return pa.table({"p_brand": batch.column("p_brand"),
                         "n_parts": batch.column("n_parts"),
                         "lcp_len": pa.array(out, pa.int64())})

    return agg.map_batches(lcp, batch_format="pyarrow")


def embedding_top2_dims(sf_dir: str) -> ray.data.Dataset:
    """Histogram of each vector's two strongest dimensions (by e4-
    quantized value, ties to the smaller dim) — the per-row top-k over a
    list column, vectorized with one stable argsort per batch; only
    (dim1, dim2, count) partials shuffle."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])

    def per_batch(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column("embedding")
                     .to_numpy(zero_copy_only=False))
        q = np.rint(m.astype(np.float64) * 10_000).astype(np.int64)
        idx = np.argsort(-q, axis=1, kind="stable")
        t = pa.table({"dim1": pa.array(idx[:, 0].astype(np.int64)),
                      "dim2": pa.array(idx[:, 1].astype(np.int64)),
                      "n_vecs": pa.array(np.ones(len(q), np.int64))})
        res = t.group_by(["dim1", "dim2"]).aggregate([("n_vecs", "sum")])
        return pa.table({"dim1": res.column("dim1"),
                         "dim2": res.column("dim2"),
                         "n_vecs": res.column("n_vecs_sum")})

    return partial_aggregate(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        ["dim1", "dim2"], [("n_vecs", "sum", "n_vecs")])


def views_except_all_purchases(sf_dir: str) -> ray.data.Dataset:
    """Multiset difference (EXCEPT ALL at user grain): per user the
    surplus of 'view' events over 'purchase' events, keeping users with
    a positive surplus — bag semantics where viewers_not_purchasers is
    the set version.  Counts partial-aggregate; the subtraction folds on
    the already-small per-user rows."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def counts(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        return pa.table({
            "user_id": batch.column("user_id"),
            "n_view": pc.cast(pc.equal(et, "view"), pa.int64()),
            "n_purchase": pc.cast(pc.equal(et, "purchase"), pa.int64())})

    agg = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["user_id"], [("n_view", "sum", "n_view"),
                      ("n_purchase", "sum", "n_purchase")])

    def surplus(batch: pa.Table) -> pa.Table:
        nv = batch.column("n_view").to_numpy(zero_copy_only=False)
        np_ = batch.column("n_purchase").to_numpy(zero_copy_only=False)
        s = nv - np_
        keep = s > 0
        return pa.table({
            "user_id": pa.array(batch.column("user_id")
                                .to_numpy(zero_copy_only=False)[keep]),
            "surplus_views": pa.array(s[keep])})

    return agg.map_batches(surplus, batch_format="pyarrow")


def pretrain_pipeline_docs(sf_dir: str) -> ray.data.Dataset:
    """The flagship training-data composite: exact dedup (md5 key, keep
    smallest doc_id) → quality filter (token-count band + stopword
    ratio) → deterministic 1/16 hash sample — three operators CHAINED
    as one lazy Dataset, so blocks stream end-to-end with no
    materialization between stages."""
    from ..functions.dedup import exact_dedup
    from ..functions.text import (deterministic_sample_batch,
                                  quality_filter_batch)
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
    deduped = exact_dedup(ds)
    filtered = deduped.map_batches(quality_filter_batch,
                                   batch_format="pyarrow")
    sampled = filtered.map_batches(deterministic_sample_batch,
                                   batch_format="pyarrow")
    return sampled.select_columns(["doc_id", "text"])


def user_type_gini_ppm(sf_dir: str) -> ray.data.Dataset:
    """Gini impurity (1 − Σp², floor ppm) of each user's event-type
    mix — diversity WITHOUT logarithms, so the statistic is integer-
    exact: Σn_t and Σn_t² fold from the distinct (user, type) count
    partials."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def counts(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch.column("user_id"),
                      "event_type": batch.column("event_type"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["user_id", "event_type"]).aggregate([("n", "sum")])
        return pa.table({"user_id": res.column("user_id"),
                         "event_type": res.column("event_type"),
                         "n": res.column("n_sum")})

    per_type = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["user_id", "event_type"], [("n", "sum", "n")])

    def fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        return pa.table({"user_id": batch.column("user_id"),
                         "n_events": pa.array(n),
                         "n_sq": pa.array(n * n)})

    agg = partial_aggregate(
        per_type.map_batches(fold, batch_format="pyarrow"),
        ["user_id"], [("n_events", "sum", "n_events"),
                      ("n_sq", "sum", "n_sq")])

    def gini(batch: pa.Table) -> pa.Table:
        n = batch.column("n_events").to_numpy(zero_copy_only=False)
        sq = batch.column("n_sq").to_numpy(zero_copy_only=False)
        g = 1_000_000 - (1_000_000 * sq) // np.where(n == 0, 1, n * n)
        return pa.table({"user_id": batch.column("user_id"),
                         "n_events": pa.array(n),
                         "gini_ppm": pa.array(g)})

    return agg.map_batches(gini, batch_format="pyarrow")


def global_gap_median_us(sf_dir: str) -> pa.Table:
    """Exact global median of the DERIVED inter-event gap column: gaps
    materialize per user inside map_groups (a window over the keyed
    stream), then the multi-pass histogram-selection engine finds the
    exact rank without ever sorting or collecting the gaps."""
    from ..functions.quantiles import exact_quantiles
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id"])

    def gaps(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        t = ts[order]
        return pa.table({"gap_us": pa.array(np.diff(t).astype(np.float64))})

    gap_ds = ds.groupby("user_id").map_groups(gaps, batch_format="pyarrow")
    return exact_quantiles(gap_ds, "gap_us", qs=(0.5,))


def _count_inversions(a: np.ndarray) -> int:
    """Inversion count of ``a`` by bottom-up merge counting — each pass
    merges adjacent sorted runs and adds, for every right-run element,
    the count of left-run elements greater than it (one vectorized
    searchsorted per run pair); O(n log n), no Python per-element work."""
    n = len(a)
    inv = 0
    w = 64  # seed runs: O(w²) triangular count, w bounded
    runs = []
    for i in range(0, n, w):
        chunk = a[i:i + w]
        inv += int(np.sum(np.triu(chunk[:, None] > chunk[None, :], 1)))
        runs.append(np.sort(chunk, kind="stable"))
    while len(runs) > 1:
        nxt = []
        for i in range(0, len(runs) - 1, 2):
            left, right = runs[i], runs[i + 1]
            inv += int(np.sum(len(left)
                              - np.searchsorted(left, right, side="right")))
            nxt.append(np.concatenate([left, right]))
            nxt[-1].sort(kind="stable")
        if len(runs) % 2:
            nxt.append(runs[-1])
        runs = nxt
    return inv


def user_event_id_inversions(sf_dir: str) -> ray.data.Dataset:
    """Out-of-order-arrival audit: per user, the number of event pairs
    whose event_id order contradicts their strict ts order (the Kendall
    discordance numerator).  Counting runs inside each group with the
    O(n log n) merge counter — per-key streams are bounded by user
    activity, never by corpus size."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        # ties on ts sort by event_id and are NOT inversions; strict-ts
        # pairs with decreasing event_id are.  Equal-ts runs are already
        # eid-ascending after lexsort, contributing zero.
        inv = _count_inversions(eid[order])
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "n_inversions": pa.array([inv], pa.int64()),
            "n_events": pa.array([len(eid)], pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def doc_longest_token(sf_dir: str) -> ray.data.Dataset:
    """Per-document argmax over the token list (longest token, ties to
    the lexicographically smallest) — a ragged per-row reduction done
    with ONE vectorized explode + lexsort per batch; documents are
    atomic within a batch so no exchange is needed at all."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def per_batch(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(len(batch)), reps)
        lens = np.char.str_len(flat.astype(str))
        order = np.lexsort((flat, -lens, doc))
        first = np.unique(doc[order], return_index=True)[1]
        pick = order[first]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "longest_token": pa.array(flat[pick]),
            "token_len": pa.array(lens[pick].astype(np.int64))})

    return ds.map_batches(per_batch, batch_format="pyarrow")


def top_token_context_diversity(sf_dir: str, n_top: int = 20
                                ) -> ray.data.Dataset:
    """Context diversity of the corpus head: for each of the top-n
    tokens by occurrence, the number of DISTINCT tokens that immediately
    follow it.  Pass 1 finds the head (tiny, broadcast); pass 2 keeps
    only bigrams anchored on it, dedups pairs, counts per anchor — the
    'entropy probe' without a logarithm."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def tok_counts(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(batch.column("text"), " "))
        t = pa.table({"tok": flat,
                      "n": pa.array(np.ones(len(flat), np.int64))})
        res = t.group_by(["tok"]).aggregate([("n", "sum")])
        return pa.table({"tok": res.column("tok"),
                         "n": res.column("n_sum")})

    counts = partial_aggregate(
        ds.map_batches(tok_counts, batch_format="pyarrow"),
        ["tok"], [("n", "sum", "n")])
    head = counts.sort(["n", "tok"], descending=[True, False]) \
        .limit(n_top).take_all()
    head_ref = ray.put(pa.array([r["tok"] for r in head], pa.string()))

    def bigrams(batch: pa.Table) -> pa.Table:
        anchors = ray.get(head_ref)
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(len(batch)), reps)
        if len(flat) == 0:
            return pa.table({"tok": pa.array([], pa.string()),
                             "next_tok": pa.array([], pa.string())})
        same = doc[1:] == doc[:-1]
        first = pa.array(flat[:-1][same])
        second = pa.array(flat[1:][same])
        keep = pc.is_in(first, value_set=anchors)
        t = pa.table({"tok": pc.filter(first, keep),
                      "next_tok": pc.filter(second, keep)})
        return t.group_by(["tok", "next_tok"]).aggregate([]) \
            .select(["tok", "next_tok"])

    pairs = partial_aggregate(
        ds.map_batches(bigrams, batch_format="pyarrow"),
        ["tok", "next_tok"], [])

    def fold(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["tok"]).aggregate([("tok", "count")])
        return pa.table({"tok": res.column("tok"),
                         "n_contexts": pc.cast(res.column("tok_count"),
                                               pa.int64())})

    return partial_aggregate(
        pairs.map_batches(fold, batch_format="pyarrow"),
        ["tok"], [("n_contexts", "sum", "n_contexts")])


def customer_balance_peers(sf_dir: str, band_cents: int = 10_000
                           ) -> ray.data.Dataset:
    """Value-band self-join: per customer, how many OTHER same-nation
    customers hold an account balance within ±band — the scalar analog
    of the time-interval join, solved per nation group with one sort +
    two searchsorted sweeps instead of an O(n²) pair build."""
    ds = read_parquet_clean(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_nationkey",
                                     "c_acctbal"])

    def per_nation(group: pa.Table) -> pa.Table:
        cents = np.rint(group.column("c_acctbal")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        s = np.sort(cents, kind="stable")
        hi = np.searchsorted(s, cents + band_cents, side="right")
        lo = np.searchsorted(s, cents - band_cents, side="left")
        return pa.table({
            "c_custkey": group.column("c_custkey"),
            "n_peers": pa.array(hi - lo - 1)})  # minus self

    return ds.groupby("c_nationkey").map_groups(per_nation,
                                                batch_format="pyarrow")


def source_exclusive_vocab(sf_dir: str) -> ray.data.Dataset:
    """Per-source exclusive vocabulary: tokens observed in EXACTLY one
    source, counted per source — the set-difference profile of corpus
    provenance.  Distinct (token, source) pairs reduce, per-token
    source counts filter to 1, a count per source folds the survivors."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = pc.take(batch.column("source"),
                      pa.array(np.repeat(np.arange(len(batch)), reps)))
        t = pa.table({"tok": flat, "source": src})
        return t.group_by(["tok", "source"]).aggregate([]) \
            .select(["tok", "source"])

    distinct = partial_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["tok", "source"], [])

    def tok_partial(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["tok"]).aggregate(
            [("source", "min"), ("source", "max"), ("tok", "count")])
        return pa.table({"tok": res.column("tok"),
                         "src_min": res.column("source_min"),
                         "src_max": res.column("source_max"),
                         "n_sources": pc.cast(res.column("tok_count"),
                                              pa.int64())})

    # second exchange keyed on tok ALONE (the distinct output above is
    # keyed on the pair, so one token's rows may span batches): min/max
    # carry the source name, the sum carries the source count.
    per_tok = partial_aggregate(
        distinct.map_batches(tok_partial, batch_format="pyarrow"),
        ["tok"], [("src_min", "min", "src_min"),
                  ("src_max", "max", "src_max"),
                  ("n_sources", "sum", "n_sources")])

    def fold(batch: pa.Table) -> pa.Table:
        kept = batch.filter(pc.equal(batch.column("n_sources"), 1))
        return pa.table({
            "source": kept.column("src_min"),
            "n_exclusive": pa.array(np.ones(len(kept), np.int64))})

    out = partial_aggregate(
        per_tok.map_batches(fold, batch_format="pyarrow"),
        ["source"], [("n_exclusive", "sum", "n_exclusive")])
    # typed seed: an all-shared vocabulary yields ZERO rows and an empty
    # Dataset drops its schema — keep the (source, n_exclusive) contract
    seed = pa.table({"source": pa.array([], pa.string()),
                     "n_exclusive": pa.array([], pa.int64())})
    return pa.concat_tables(
        [seed] + [b.select(["source", "n_exclusive"])
                  for b in out.iter_batches(batch_format="pyarrow")])


def session_conversion_ppm(sf_dir: str, gap_seconds: int = 1800
                           ) -> ray.data.Dataset:
    """Session-level funnel conversion: of the 30-min-gap sessions that
    contain a 'view', the fraction that also contain a 'purchase'
    (floor ppm).  Each user's sessions fold to three counters inside
    map_groups, so the global reduce sums 3 integers per user."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        t, ty = ts[order], types[order]
        brk = np.r_[0, np.flatnonzero(np.diff(t)
                                      > gap_seconds * 1_000_000) + 1,
                    len(t)]
        sid = np.repeat(np.arange(len(brk) - 1), np.diff(brk))
        n_sessions = len(brk) - 1
        is_view = ty == "view"
        is_purch = ty == "purchase"
        has_view = np.zeros(n_sessions, bool)
        has_purch = np.zeros(n_sessions, bool)
        np.logical_or.at(has_view, sid, is_view)
        np.logical_or.at(has_purch, sid, is_purch)
        return pa.table({
            "n_sessions": pa.array([n_sessions], pa.int64()),
            "n_view_sessions": pa.array([int(has_view.sum())], pa.int64()),
            "n_converted": pa.array([int((has_view & has_purch).sum())],
                                    pa.int64())})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    rows = pa.concat_tables(list(per.iter_batches(batch_format="pyarrow",
                                                  batch_size=None)))
    ns = int(pc.sum(rows.column("n_sessions")).as_py() or 0)
    nv = int(pc.sum(rows.column("n_view_sessions")).as_py() or 0)
    nc = int(pc.sum(rows.column("n_converted")).as_py() or 0)
    ppm = (1_000_000 * nc) // nv if nv else 0
    return ray.data.from_arrow(pa.table({
        "n_sessions": pa.array([ns], pa.int64()),
        "n_view_sessions": pa.array([nv], pa.int64()),
        "n_converted": pa.array([nc], pa.int64()),
        "conversion_ppm": pa.array([ppm], pa.int64())}))


def daily_revenue_interpolated(sf_dir: str) -> ray.data.Dataset:
    """Gap-fill with integer linear interpolation: the daily order-
    revenue series densified over the full calendar, zero-order days
    getting floor((next−prev)·(d−pd)/(nd−pd)) + prev between their
    nearest revenue days (edges stay at 0).  Daily sums partial-
    aggregate; the interpolation folds on the calendar-bounded tail."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def daily(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("o_orderdate"), unit="day")
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"day": day, "cents": pa.array(cents)})
        res = t.group_by(["day"]).aggregate([("cents", "sum")])
        return pa.table({"day": res.column("day"),
                         "cents": res.column("cents_sum")})

    agg = partial_aggregate(
        ds.map_batches(daily, batch_format="pyarrow"),
        ["day"], [("cents", "sum", "cents")])
    rows = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow",
                                                  batch_size=None)))
    day = rows.column("day").to_numpy(zero_copy_only=False) \
        .astype("datetime64[D]").astype(np.int64)
    cents = rows.column("cents").to_numpy(zero_copy_only=False)
    order = np.argsort(day)
    day, cents = day[order], cents[order]
    if len(day) == 0:
        return ray.data.from_arrow(pa.table({
            "day": pa.array([], pa.timestamp("us")),
            "revenue_cents": pa.array([], pa.int64()),
            "interpolated": pa.array([], pa.int64())}))
    full = np.arange(day[0], day[-1] + 1)
    known = np.isin(full, day)
    out = np.zeros(len(full), np.int64)
    out[known] = cents
    # nearest known neighbor on each side (edges covered: first/last known)
    pos = np.searchsorted(day, full)          # next known index
    prev = day[np.clip(pos - 1, 0, len(day) - 1)]
    nxt = day[np.clip(pos, 0, len(day) - 1)]
    pv = cents[np.clip(pos - 1, 0, len(day) - 1)]
    nv = cents[np.clip(pos, 0, len(day) - 1)]
    miss = ~known
    interp = pv + ((nv - pv) * (full - prev)) // np.where(
        nxt == prev, 1, nxt - prev)
    out[miss] = interp[miss]
    return ray.data.from_arrow(pa.table({
        "day": pa.array(full.astype("datetime64[D]")
                        .astype("datetime64[us]")),
        "revenue_cents": pa.array(out),
        "interpolated": pa.array(miss.astype(np.int64))}))


def events_rate_limited(sf_dir: str, per_minute: int = 2
                        ) -> ray.data.Dataset:
    """Deterministic per-key rate limiter: at most ``per_minute`` events
    survive per (user, minute), kept in (ts, event_id) arrival order —
    the throttle/cap primitive of stream ingestion, ranked per user
    group with one lexsort and a vectorized per-minute cumulative
    counter (no Python loop)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        minute = ts.astype("datetime64[m]").astype(np.int64)
        order = np.lexsort((eid, ts.astype(np.int64), minute))
        m = minute[order]
        # position within each minute run: index − run start
        starts = np.r_[0, np.flatnonzero(np.diff(m)) + 1]
        runlen = np.diff(np.r_[starts, len(m)])
        posn = np.arange(len(m)) - np.repeat(starts, runlen)
        keep = posn < per_minute
        return pa.table({
            "event_id": pa.array(np.sort(eid[order][keep]))})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def order_first_ship_lag_hist(sf_dir: str) -> ray.data.Dataset:
    """Per-ORDER fulfillment latency: days from order date to the
    FIRST lineitem shipment, folded to a histogram — a two-level
    temporal aggregate (min over lines, count over orders) whose
    fact⋈fact link carries only (orderkey, min_ship) partials through
    one shuffle_lookup_join."""
    from ..functions.joins import shuffle_lookup_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate"])

    def li_min(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["l_orderkey"]).aggregate(
            [("l_shipdate", "min")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "first_ship": res.column("l_shipdate_min")})

    partial = partial_aggregate(
        li.map_batches(li_min, batch_format="pyarrow"),
        ["l_orderkey"], [("first_ship", "min", "first_ship")])

    joined = shuffle_lookup_join(
        partial, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("first_ship", pa.timestamp("us"))]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]))

    def hist(batch: pa.Table) -> pa.Table:
        ship = batch.column("first_ship").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        t = pa.table({"lag_days": pa.array(ship - od),
                      "n_orders": pa.array(np.ones(len(ship), np.int64))})
        res = t.group_by(["lag_days"]).aggregate([("n_orders", "sum")])
        return pa.table({"lag_days": res.column("lag_days"),
                         "n_orders": res.column("n_orders_sum")})

    return partial_aggregate(
        joined.map_batches(hist, batch_format="pyarrow"),
        ["lag_days"], [("n_orders", "sum", "n_orders")])


def user_late_events(sf_dir: str, watermark_seconds: int = 60
                     ) -> ray.data.Dataset:
    """Watermark lateness audit: an event is LATE when its timestamp
    trails the running max-ts of all earlier-sequenced events (by
    event_id) by more than the watermark — the out-of-order metric a
    streaming ingester alerts on.  Per-user running max is one
    np.maximum.accumulate over the event_id-ordered group."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.argsort(eid, kind="stable")
        t = ts[order]
        run_max = np.maximum.accumulate(t)
        late = np.zeros(len(t), bool)
        late[1:] = t[1:] < run_max[:-1] - watermark_seconds * 1_000_000
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "n_late": pa.array([int(late.sum())], pa.int64()),
            "n_events": pa.array([len(t)], pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def event_type_daily_dominance(sf_dir: str) -> ray.data.Dataset:
    """Rank-flip census: for every ordered pair of event types, the
    number of days on which type A logged strictly more events than
    type B.  Daily type counts partial-aggregate (calendar × types
    bounded); the pairwise comparison folds on that small matrix."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def daily(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"day": day,
                      "event_type": batch.column("event_type"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["day", "event_type"]).aggregate([("n", "sum")])
        return pa.table({"day": res.column("day"),
                         "event_type": res.column("event_type"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(daily, batch_format="pyarrow"),
        ["day", "event_type"], [("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow",
                                                  batch_size=None)))
    day = rows.column("day").to_numpy(zero_copy_only=False)
    et = rows.column("event_type").to_numpy(zero_copy_only=False)
    n = rows.column("n").to_numpy(zero_copy_only=False)
    types = np.unique(et)
    days, day_idx = np.unique(day, return_inverse=True)
    type_idx = np.searchsorted(types, et)
    mat = np.zeros((len(days), len(types)), np.int64)
    mat[day_idx, type_idx] = n
    ta, tb, wins = [], [], []
    for i, a in enumerate(types):
        for j, b in enumerate(types):
            if i == j:
                continue
            ta.append(a)
            tb.append(b)
            wins.append(int((mat[:, i] > mat[:, j]).sum()))
    return ray.data.from_arrow(pa.table({
        "type_a": pa.array(ta, pa.string()),
        "type_b": pa.array(tb, pa.string()),
        "n_days_a_wins": pa.array(wins, pa.int64())}))


def lineitem_table_checksum(sf_dir: str) -> ray.data.Dataset:
    """Order-independent dataset fingerprint: XOR of a 60-bit md5 prefix
    of each row's canonical key string — the replication/migration
    verifier that needs NO sort and NO shuffle (XOR is commutative, so
    each batch folds to 8 bytes and the driver XORs the per-batch
    words)."""
    import hashlib
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber",
                                     "l_quantity"])

    def per_batch(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = batch.column("l_linenumber").to_numpy(zero_copy_only=False)
        q = np.rint(batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        acc = np.int64(0)
        n = len(ok)
        for i in range(n):  # md5 has no Arrow kernel; C-speed hashlib
            s = f"{ok[i]}|{ln[i]}|{q[i]}"
            acc ^= np.int64(int(hashlib.md5(s.encode()).hexdigest()[:15],
                                16))
        return pa.table({"checksum": pa.array([acc], pa.int64()),
                         "n_rows": pa.array([n], pa.int64())})

    parts = pa.concat_tables(list(
        ds.map_batches(per_batch, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    cs = np.bitwise_xor.reduce(
        parts.column("checksum").to_numpy(zero_copy_only=False)) \
        if len(parts) else np.int64(0)
    nr = int(pc.sum(parts.column("n_rows")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "checksum": pa.array([int(cs)], pa.int64()),
        "n_rows": pa.array([nr], pa.int64())}))


def cust_supp_balance_matches(sf_dir: str, band_cents: int = 1_000
                              ) -> ray.data.Dataset:
    """Cross-entity blocking join: candidate (customer, supplier) pairs
    in the SAME nation with account balances within ±band — the entity-
    resolution primitive (block on nation, band on balance).  Both
    sides union into one keyed exchange; each nation group counts pairs
    with sort + two searchsorted sweeps, never building the pairs."""
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_nationkey", "c_acctbal"]) \
        .map_batches(lambda b: pa.table({
            "nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
            "cents": pa.array(np.rint(
                b.column("c_acctbal").to_numpy(zero_copy_only=False)
                * 100).astype(np.int64)),
            "side": pa.array(np.zeros(len(b), np.int8))}),
            batch_format="pyarrow")
    supp = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                              columns=["s_nationkey", "s_acctbal"]) \
        .map_batches(lambda b: pa.table({
            "nationkey": pc.cast(b.column("s_nationkey"), pa.int64()),
            "cents": pa.array(np.rint(
                b.column("s_acctbal").to_numpy(zero_copy_only=False)
                * 100).astype(np.int64)),
            "side": pa.array(np.ones(len(b), np.int8))}),
            batch_format="pyarrow")

    def per_nation(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        cents = group.column("cents").to_numpy(zero_copy_only=False)
        c = np.sort(cents[side == 0], kind="stable")
        s = cents[side == 1]
        hi = np.searchsorted(c, s + band_cents, side="right")
        lo = np.searchsorted(c, s - band_cents, side="left")
        n_pairs = int((hi - lo).sum())
        if n_pairs == 0:  # inner-join semantics: pairless nations vanish
            return pa.table({"nationkey": pa.array([], pa.int64()),
                             "n_pairs": pa.array([], pa.int64())})
        return pa.table({
            "nationkey": group.column("nationkey").slice(0, 1),
            "n_pairs": pa.array([n_pairs], pa.int64())})

    out = cust.union(supp).groupby("nationkey") \
        .map_groups(per_nation, batch_format="pyarrow")
    # bounded by |nation| (25): collect to a TYPED pa.Table so a
    # legitimately pair-free corpus (tiny sf) still presents the schema —
    # a 0-row ray Dataset drops its columns through to_pandas().
    seed = pa.table({"nationkey": pa.array([], pa.int64()),
                     "n_pairs": pa.array([], pa.int64())})
    got = list(out.iter_batches(batch_format="pyarrow", batch_size=8192))
    return pa.concat_tables([seed, *got], promote_options="default")


def embedding_dim_variance(sf_dir: str) -> ray.data.Dataset:
    """Per-dimension second-moment profile of the embedding space at e4
    quantization: n, Σq, Σq² and the integer variance numerator
    n·Σq² − (Σq)² (denominator n²) — the whitening / feature-scaling
    statistic, folded from 64-row batch partials."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])

    def per_batch(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column("embedding")
                     .to_numpy(zero_copy_only=False))
        q = np.rint(m.astype(np.float64) * 10_000).astype(np.int64)
        return pa.table({
            "dim": pa.array(np.arange(q.shape[1], dtype=np.int64)),
            "n": pa.array(np.full(q.shape[1], len(q), np.int64)),
            "sum_e4": pa.array(q.sum(axis=0)),
            "sumsq_e8": pa.array((q * q).sum(axis=0))})

    agg = partial_aggregate(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        ["dim"], [("n", "sum", "n"), ("sum_e4", "sum", "sum_e4"),
                  ("sumsq_e8", "sum", "sumsq_e8")])

    def fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        s = batch.column("sum_e4").to_numpy(zero_copy_only=False)
        ss = batch.column("sumsq_e8").to_numpy(zero_copy_only=False)
        return batch.append_column("var_num_e8", pa.array(n * ss - s * s))

    return agg.map_batches(fold, batch_format="pyarrow")


def dau_overlap_jaccard(sf_dir: str) -> ray.data.Dataset:
    """Day-over-day audience overlap: Jaccard (floor ppm) between each
    day's active-user set and the NEXT day's.  Per-user sorted active
    days emit intersection contributions (one keyed exchange bounded by
    |user×day| distinct pairs); daily totals and the ppm fold on the
    calendar-bounded tail."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def pairs(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"user_id": batch.column("user_id"), "day": day})
        return t.group_by(["user_id", "day"]).aggregate([]) \
            .select(["user_id", "day"])

    distinct = partial_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["user_id", "day"], [])

    def per_user(group: pa.Table) -> pa.Table:
        d = np.sort(group.column("day").to_numpy(zero_copy_only=False)
                    .astype("datetime64[D]").astype(np.int64))
        nxt = d[np.isin(d + 1, d)]
        return pa.table({
            "day": pa.array(nxt.astype("datetime64[D]")
                            .astype("datetime64[us]")),
            "n_both": pa.array(np.ones(len(nxt), np.int64))})

    inter = partial_aggregate(
        distinct.groupby("user_id").map_groups(per_user,
                                               batch_format="pyarrow"),
        ["day"], [("n_both", "sum", "n_both")])

    def day_counts(batch: pa.Table) -> pa.Table:
        t = pa.table({"day": batch.column("day"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["day"]).aggregate([("n", "sum")])
        return pa.table({"day": res.column("day"),
                         "n": res.column("n_sum")})

    daily = partial_aggregate(
        distinct.map_batches(day_counts, batch_format="pyarrow"),
        ["day"], [("n", "sum", "n")])

    # calendar-bounded tails fold on the driver
    dtab = pa.concat_tables(list(daily.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    itab = pa.concat_tables(list(inter.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    dd = dtab.column("day").to_numpy(zero_copy_only=False) \
        .astype("datetime64[D]").astype(np.int64)
    dn = dtab.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(dd)
    dd, dn = dd[order], dn[order]
    idx_next = np.searchsorted(dd, dd + 1)
    has_next = (idx_next < len(dd)) & \
        (dd[np.clip(idx_next, 0, len(dd) - 1)] == dd + 1)
    id_ = itab.column("day").to_numpy(zero_copy_only=False) \
        .astype("datetime64[D]").astype(np.int64)
    in_ = itab.column("n_both").to_numpy(zero_copy_only=False)
    imap = np.zeros(len(dd), np.int64)
    imap[np.searchsorted(dd, id_)] = in_
    today = dn[has_next]
    nextd = dn[idx_next[has_next]]
    both = imap[has_next]
    union = today + nextd - both
    ppm = (1_000_000 * both) // np.where(union == 0, 1, union)
    return ray.data.from_arrow(pa.table({
        "day": pa.array(dd[has_next].astype("datetime64[D]")
                        .astype("datetime64[us]")),
        "n_today": pa.array(today),
        "n_next": pa.array(nextd),
        "n_both": pa.array(both),
        "jaccard_ppm": pa.array(ppm)}))


def join_size_estimate(sf_dir: str) -> ray.data.Dataset:
    """Exact join-size estimation WITHOUT running the join (the query-
    planner statistic): per-key row counts on both sides co-group on
    the key, the dot product Σ cL(k)·cR(k) is the exact lineitem⋈orders
    output cardinality.  Only (key, count) partials shuffle."""
    from ..functions.joins import shuffle_lookup_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey"])

    def lcounts(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["l_orderkey"]).aggregate(
            [("l_orderkey", "count")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "nl": pc.cast(res.column("l_orderkey_count"),
                                       pa.int64())})

    def rcounts(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["o_orderkey"]).aggregate(
            [("o_orderkey", "count")])
        return pa.table({"o_orderkey": res.column("o_orderkey"),
                         "nr": pc.cast(res.column("o_orderkey_count"),
                                       pa.int64())})

    lagg = partial_aggregate(
        li.map_batches(lcounts, batch_format="pyarrow"),
        ["l_orderkey"], [("nl", "sum", "nl")])
    ragg = partial_aggregate(
        orders.map_batches(rcounts, batch_format="pyarrow"),
        ["o_orderkey"], [("nr", "sum", "nr")])
    joined = shuffle_lookup_join(
        lagg, ragg, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("nl", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("nr", pa.int64())]))

    def fold(batch: pa.Table) -> pa.Table:
        nl = batch.column("nl").to_numpy(zero_copy_only=False)
        nr = batch.column("nr").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_left_rows": pa.array([int(nl.sum())], pa.int64()),
            "n_keys_both": pa.array([len(nl)], pa.int64()),
            "est_join_rows": pa.array([int((nl * nr).sum())], pa.int64())})

    parts = pa.concat_tables(list(
        joined.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    return ray.data.from_arrow(pa.table({
        "n_left_rows": pa.array([int(pc.sum(
            parts.column("n_left_rows")).as_py() or 0)], pa.int64()),
        "n_keys_both": pa.array([int(pc.sum(
            parts.column("n_keys_both")).as_py() or 0)], pa.int64()),
        "est_join_rows": pa.array([int(pc.sum(
            parts.column("est_join_rows")).as_py() or 0)], pa.int64())}))


def event_value_log2_hist(sf_dir: str) -> ray.data.Dataset:
    """Exponential (log2-bucket) histogram of event values per type —
    the constant-size summary that replaces equi-width histograms when
    the value range is unknown a priori (the HdrHistogram/DDSketch
    bucket rule, exact here because bucket = floor(log2(cents)))."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        b = np.full(len(cents), -1, np.int64)
        pos = cents > 0
        b[pos] = np.floor(np.log2(cents[pos])).astype(np.int64)
        t = pa.table({"event_type": batch.column("event_type"),
                      "bucket": pa.array(b),
                      "n": pa.array(np.ones(len(b), np.int64))})
        res = t.group_by(["event_type", "bucket"]).aggregate([("n", "sum")])
        return pa.table({"event_type": res.column("event_type"),
                         "bucket": res.column("bucket"),
                         "n": res.column("n_sum")})

    return partial_aggregate(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["event_type", "bucket"], [("n", "sum", "n")])


def shipdate_zonemap_overlap(sf_dir: str, chunk_orders: int = 1_000
                             ) -> ray.data.Dataset:
    """Zone-map effectiveness audit: chunk lineitems by orderkey range,
    take each chunk's [min, max] shipdate envelope, and count envelope
    pairs that OVERLAP — high overlap means shipdate predicates cannot
    prune orderkey-clustered storage.  Envelopes partial-aggregate
    (bounded by chunk count); the pair count folds on that small table
    (sort+sweep replaces the O(C²) loop at larger C)."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])

    def env(batch: pa.Table) -> pa.Table:
        chunk = pc.divide(batch.column("l_orderkey"),
                          chunk_orders)
        t = pa.table({"chunk": pc.cast(chunk, pa.int64()),
                      "ship": batch.column("l_shipdate")})
        res = t.group_by(["chunk"]).aggregate(
            [("ship", "min"), ("ship", "max")])
        return pa.table({"chunk": res.column("chunk"),
                         "mn": res.column("ship_min"),
                         "mx": res.column("ship_max")})

    agg = partial_aggregate(
        ds.map_batches(env, batch_format="pyarrow"),
        ["chunk"], [("mn", "min", "mn"), ("mx", "max", "mx")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    mn = rows.column("mn").to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    mx = rows.column("mx").to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    c = len(mn)
    # overlap(i,j) ⇔ mn_j ≤ mx_i ∧ mn_i ≤ mx_j; count via sort+searchsorted:
    # pairs with mn_j ≤ mx_i (j≠i, each unordered pair counted once after
    # subtracting the ordered double-count of non-overlaps)
    order = np.argsort(mn, kind="stable")
    smn = mn[order]
    # for each i: number of j with mn_j <= mx_i  (includes i itself)
    le = np.searchsorted(smn, mx, side="right")
    # ordered pairs (i, j), i≠j, mn_j <= mx_i
    ordered = int(le.sum()) - c
    # non-overlapping ordered pairs counted once each (mx_j < mn_i side
    # never satisfies mn_j <= mx_i when intervals are disjoint with j
    # after i), so overlapping unordered pairs:
    n_pairs = (ordered - (c * (c - 1) - ordered)) // 2 \
        if c else 0
    total_pairs = c * (c - 1) // 2
    ppm = (1_000_000 * n_pairs) // total_pairs if total_pairs else 0
    return ray.data.from_arrow(pa.table({
        "n_chunks": pa.array([c], pa.int64()),
        "n_overlapping_pairs": pa.array([n_pairs], pa.int64()),
        "overlap_ppm": pa.array([ppm], pa.int64())}))


def source_weighted_jaccard(sf_dir: str) -> ray.data.Dataset:
    """Weighted Jaccard (Σmin/Σmax of token multiplicities, floor ppm)
    between every source pair.  Per-token count vectors pivot into one
    row per token (the source DIMENSION is bounded), each batch folds
    190 pair-partials of Σmin, and Σmax follows from per-source totals:
    Σmax = tA + tB − Σmin — so nothing quadratic in tokens ever ships."""
    src_list = sorted(pc.unique(pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["source"]).column(0)).to_pylist())
    k = len(src_list)
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def pivot(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = pc.take(batch.column("source"),
                      pa.array(np.repeat(np.arange(len(batch)), reps)))
        si = pc.index_in(src, value_set=pa.array(src_list)) \
            .to_numpy(zero_copy_only=False)
        tok_np = flat.to_numpy(zero_copy_only=False)
        uniq, ti = np.unique(tok_np, return_inverse=True)
        mat = np.zeros((len(uniq), k), np.int64)
        np.add.at(mat, (ti, si), 1)
        cols = {"tok": pa.array(uniq)}
        for j, s in enumerate(src_list):
            cols[f"n_{j}"] = pa.array(mat[:, j])
        return pa.table(cols)

    per_tok = partial_aggregate(
        ds.map_batches(pivot, batch_format="pyarrow"),
        ["tok"], [(f"n_{j}", "sum", f"n_{j}") for j in range(k)])

    def pair_fold(batch: pa.Table) -> pa.Table:
        mat = np.stack([batch.column(f"n_{j}")
                        .to_numpy(zero_copy_only=False)
                        for j in range(k)], axis=1)
        ia, ib, mins, tota, totb = [], [], [], [], []
        for a in range(k):
            for b in range(a + 1, k):
                ia.append(a)
                ib.append(b)
                mins.append(int(np.minimum(mat[:, a], mat[:, b]).sum()))
                tota.append(int(mat[:, a].sum()))
                totb.append(int(mat[:, b].sum()))
        return pa.table({"ia": pa.array(ia, pa.int64()),
                         "ib": pa.array(ib, pa.int64()),
                         "min_sum": pa.array(mins, pa.int64()),
                         "tot_a": pa.array(tota, pa.int64()),
                         "tot_b": pa.array(totb, pa.int64())})

    agg = partial_aggregate(
        per_tok.map_batches(pair_fold, batch_format="pyarrow"),
        ["ia", "ib"], [("min_sum", "sum", "min_sum"),
                       ("tot_a", "sum", "tot_a"),
                       ("tot_b", "sum", "tot_b")])

    def finish(batch: pa.Table) -> pa.Table:
        ia = batch.column("ia").to_numpy(zero_copy_only=False)
        ib = batch.column("ib").to_numpy(zero_copy_only=False)
        mn = batch.column("min_sum").to_numpy(zero_copy_only=False)
        ta = batch.column("tot_a").to_numpy(zero_copy_only=False)
        tb = batch.column("tot_b").to_numpy(zero_copy_only=False)
        keep = mn > 0           # inner-join semantics of the oracle
        mx = ta + tb - mn
        ppm = (1_000_000 * mn) // np.where(mx == 0, 1, mx)
        names = np.array(src_list)
        return pa.table({
            "source_a": pa.array(names[ia[keep]]),
            "source_b": pa.array(names[ib[keep]]),
            "min_sum": pa.array(mn[keep]),
            "max_sum": pa.array(mx[keep]),
            "wjaccard_ppm": pa.array(ppm[keep])})

    return agg.map_batches(finish, batch_format="pyarrow")


def qty_discount_cov_by_flag(sf_dir: str) -> ray.data.Dataset:
    """Column-pair covariance per group, integer-exact: for each
    returnflag the numerator n·Σxy − Σx·Σy (denominator n²) between
    quantity and discount cents — the correlation probe computed from
    four distributive sums."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_quantity",
                                     "l_discount"])

    def moments(batch: pa.Table) -> pa.Table:
        q = np.rint(batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        d = np.rint(batch.column("l_discount")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        t = pa.table({"l_returnflag": batch.column("l_returnflag"),
                      "n": pa.array(np.ones(len(q), np.int64)),
                      "sum_q": pa.array(q), "sum_d": pa.array(d),
                      "sum_qd": pa.array(q * d)})
        res = t.group_by(["l_returnflag"]).aggregate(
            [("n", "sum"), ("sum_q", "sum"), ("sum_d", "sum"),
             ("sum_qd", "sum")])
        return pa.table({"l_returnflag": res.column("l_returnflag"),
                         "n": res.column("n_sum"),
                         "sum_q": res.column("sum_q_sum"),
                         "sum_d": res.column("sum_d_sum"),
                         "sum_qd": res.column("sum_qd_sum")})

    agg = partial_aggregate(
        ds.map_batches(moments, batch_format="pyarrow"),
        ["l_returnflag"], [("n", "sum", "n"), ("sum_q", "sum", "sum_q"),
                           ("sum_d", "sum", "sum_d"),
                           ("sum_qd", "sum", "sum_qd")])

    def fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        sq = batch.column("sum_q").to_numpy(zero_copy_only=False)
        sd = batch.column("sum_d").to_numpy(zero_copy_only=False)
        sqd = batch.column("sum_qd").to_numpy(zero_copy_only=False)
        return batch.append_column("cov_num", pa.array(n * sqd - sq * sd))

    return agg.map_batches(fold, batch_format="pyarrow")


def priority_dow_independence(sf_dir: str) -> ray.data.Dataset:
    """Independence deviation of the (weekday × priority) contingency
    table: per cell the observed count and the integer deviation
    numerator obs·total − rowtotal·coltotal (positive ⇒ the combination
    is over-represented) — the χ²-free association test.  Cell counts
    partial-aggregate (7 × priorities bounded); marginals fold on the
    driver."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_orderpriority"])

    def cells(batch: pa.Table) -> pa.Table:
        dow = pc.cast(pc.day_of_week(batch.column("o_orderdate"),
                                     count_from_zero=False,
                                     week_start=1), pa.int64())
        t = pa.table({"dow": dow,
                      "priority": batch.column("o_orderpriority"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["dow", "priority"]).aggregate([("n", "sum")])
        return pa.table({"dow": res.column("dow"),
                         "priority": res.column("priority"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["dow", "priority"], [("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    dow = rows.column("dow").to_numpy(zero_copy_only=False)
    pri = rows.column("priority").to_numpy(zero_copy_only=False)
    n = rows.column("n").to_numpy(zero_copy_only=False)
    total = int(n.sum())
    dows, di = np.unique(dow, return_inverse=True)
    pris, pi = np.unique(pri, return_inverse=True)
    rowt = np.zeros(len(dows), np.int64)
    colt = np.zeros(len(pris), np.int64)
    np.add.at(rowt, di, n)
    np.add.at(colt, pi, n)
    dev = n * total - rowt[di] * colt[pi]
    return ray.data.from_arrow(pa.table({
        "dow": pa.array(dow), "priority": pa.array(pri),
        "obs": pa.array(n), "dev_num": pa.array(dev)}))


def same_month_ship_share_by_year(sf_dir: str) -> ray.data.Dataset:
    """Temporal alignment share: per order year, the fraction (floor
    ppm) of lineitems shipped in the SAME calendar month the order was
    placed — one shuffle_lookup_join carries (orderkey, ship month)
    partial counts against the order side."""
    from ..functions.joins import shuffle_lookup_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate"])

    def li_m(batch: pa.Table) -> pa.Table:
        m = pc.floor_temporal(batch.column("l_shipdate"), unit="month")
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "ship_month": m,
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["l_orderkey", "ship_month"]).aggregate(
            [("n", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "ship_month": res.column("ship_month"),
                         "n": res.column("n_sum")})

    joined = shuffle_lookup_join(
        li.map_batches(li_m, batch_format="pyarrow"),
        orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("ship_month", pa.timestamp("us")),
                               ("n", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]))

    def fold(batch: pa.Table) -> pa.Table:
        om = pc.floor_temporal(batch.column("o_orderdate"), unit="month")
        year = pc.cast(pc.year(batch.column("o_orderdate")), pa.int64())
        same = pc.cast(pc.equal(batch.column("ship_month"), om),
                       pa.int64())
        n = batch.column("n")
        t = pa.table({"order_year": year,
                      "n_lines": n,
                      "n_same_month": pc.multiply(same, n)})
        res = t.group_by(["order_year"]).aggregate(
            [("n_lines", "sum"), ("n_same_month", "sum")])
        return pa.table({"order_year": res.column("order_year"),
                         "n_lines": res.column("n_lines_sum"),
                         "n_same_month": res.column("n_same_month_sum")})

    agg = partial_aggregate(
        joined.map_batches(fold, batch_format="pyarrow"),
        ["order_year"], [("n_lines", "sum", "n_lines"),
                         ("n_same_month", "sum", "n_same_month")])

    def ppm(batch: pa.Table) -> pa.Table:
        nl = batch.column("n_lines").to_numpy(zero_copy_only=False)
        ns = batch.column("n_same_month").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "same_month_ppm",
            pa.array((1_000_000 * ns) // np.where(nl == 0, 1, nl)))

    return agg.map_batches(ppm, batch_format="pyarrow")


def priority_value_drift_l1(sf_dir: str, split_year: int = 1998
                            ) -> ray.data.Dataset:
    """Distribution-drift monitor: per priority, the scale-free integer
    L1 distance numerator Σ_b |n_a(b)·T_b − n_b(b)·T_a| between the
    order-value log2 histograms of the era before ``split_year`` and
    the era from it on (denominator T_a·T_b) — the PSI/KL stand-in that
    needs no floats.  Histogram cells partial-aggregate (priorities ×
    ~40 buckets bounded); the distance folds on that grid."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_orderpriority",
                                     "o_totalprice"])

    def cells(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        b = np.full(len(cents), -1, np.int64)
        pos = cents > 0
        b[pos] = np.floor(np.log2(cents[pos])).astype(np.int64)
        year = pc.year(batch.column("o_orderdate")) \
            .to_numpy(zero_copy_only=False)
        era = (year >= split_year).astype(np.int64)
        t = pa.table({"priority": batch.column("o_orderpriority"),
                      "bucket": pa.array(b), "era": pa.array(era),
                      "n": pa.array(np.ones(len(b), np.int64))})
        res = t.group_by(["priority", "bucket", "era"]).aggregate(
            [("n", "sum")])
        return pa.table({"priority": res.column("priority"),
                         "bucket": res.column("bucket"),
                         "era": res.column("era"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["priority", "bucket", "era"], [("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    pri = rows.column("priority").to_numpy(zero_copy_only=False)
    bkt = rows.column("bucket").to_numpy(zero_copy_only=False)
    era = rows.column("era").to_numpy(zero_copy_only=False)
    n = rows.column("n").to_numpy(zero_copy_only=False)
    pris, pi = np.unique(pri, return_inverse=True)
    bkts, bi = np.unique(bkt, return_inverse=True)
    na = np.zeros((len(pris), len(bkts)), np.int64)
    nb = np.zeros_like(na)
    old = era == 0
    np.add.at(na, (pi[old], bi[old]), n[old])
    np.add.at(nb, (pi[~old], bi[~old]), n[~old])
    ta = na.sum(axis=1)
    tb = nb.sum(axis=1)
    l1 = np.abs(na * tb[:, None] - nb * ta[:, None]).sum(axis=1)
    return ray.data.from_arrow(pa.table({
        "priority": pa.array(pris),
        "n_before": pa.array(ta), "n_after": pa.array(tb),
        "l1_num": pa.array(l1)}))


def quantity_ks_between_flags(sf_dir: str, flag_a: str = "A",
                              flag_b: str = "R") -> ray.data.Dataset:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    quantity distributions of two returnflags, as the integer numerator
    max_v |cumA(v)·nB − cumB(v)·nA| (denominator nA·nB) — computed from
    per-value counts (the quantity DOMAIN is bounded), never from
    sorted raw rows."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_quantity"])

    def cells(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("l_returnflag"),
                        value_set=pa.array([flag_a, flag_b]))
        t = batch.filter(keep)
        q = np.rint(t.column("l_quantity")
                    .to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        tt = pa.table({"flag": t.column("l_returnflag"),
                       "q": pa.array(q),
                       "n": pa.array(np.ones(len(q), np.int64))})
        res = tt.group_by(["flag", "q"]).aggregate([("n", "sum")])
        return pa.table({"flag": res.column("flag"),
                         "q": res.column("q"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["flag", "q"], [("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    fl = rows.column("flag").to_numpy(zero_copy_only=False)
    q = rows.column("q").to_numpy(zero_copy_only=False)
    n = rows.column("n").to_numpy(zero_copy_only=False)
    vals = np.unique(q)
    ca = np.zeros(len(vals), np.int64)
    cb = np.zeros(len(vals), np.int64)
    ia = fl == flag_a
    np.add.at(ca, np.searchsorted(vals, q[ia]), n[ia])
    np.add.at(cb, np.searchsorted(vals, q[~ia]), n[~ia])
    na, nb = int(ca.sum()), int(cb.sum())
    cuma = np.cumsum(ca)
    cumb = np.cumsum(cb)
    ks = int(np.abs(cuma * nb - cumb * na).max()) if len(vals) else 0
    return ray.data.from_arrow(pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "ks_num": pa.array([ks], pa.int64())}))


def dedup_survivorship_stats(sf_dir: str) -> ray.data.Dataset:
    """Dedup bias audit: do dropped duplicates differ from kept docs?
    Per outcome (kept = smallest doc_id of its text group), document
    count and total characters — the survivorship-skew check run AFTER
    classification, with only (fingerprint, min_id) pairs shuffling."""
    from ..functions.text import md5_fingerprint
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "fp": pa.array(md5_fingerprint(
                batch.column("text").to_pylist()), pa.string()),
            "n_chars": pc.cast(pc.utf8_length(batch.column("text")),
                               pa.int64())})

    keyed = ds.map_batches(fp, batch_format="pyarrow")

    def per_fp(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        ch = group.column("n_chars").to_numpy(zero_copy_only=False)
        kept = ids == ids.min()
        return pa.table({
            "status": pa.array(np.where(kept, "kept", "dropped")),
            "n_docs": pa.array(np.ones(len(ids), np.int64)),
            "total_chars": pa.array(ch)})

    per = keyed.groupby("fp").map_groups(per_fp, batch_format="pyarrow")
    return partial_aggregate(
        per, ["status"], [("n_docs", "sum", "n_docs"),
                          ("total_chars", "sum", "total_chars")])


def diversified_top_orders(sf_dir: str, n: int = 10, per_customer: int = 2
                           ) -> ray.data.Dataset:
    """Diversity-constrained top-k: the n highest-value orders with AT
    MOST ``per_customer`` per customer — per-key capping (one bucketed
    rank exchange) prunes the candidate set to ≤ per_customer·|keys|
    before the tiny global top-n sort."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey",
                                     "o_totalprice"])

    def per_cust(group: pa.Table) -> pa.Table:
        cents = np.rint(group.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        ok = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, -cents))[:per_customer]
        return pa.table({
            "o_orderkey": pa.array(ok[order]),
            "o_custkey": group.column("o_custkey").slice(0, 1)
            .to_numpy(zero_copy_only=False).repeat(len(order)),
            "price_cents": pa.array(cents[order])})

    capped = ds.groupby("o_custkey").map_groups(per_cust,
                                                batch_format="pyarrow")
    return capped.sort(["price_cents", "o_orderkey"],
                       descending=[True, False]).limit(n)


def coorder_degree_assortativity(sf_dir: str) -> ray.data.Dataset:
    """Degree-assortativity moments of the co-ordered-parts graph: over
    distinct edges, Σ deg(u)·deg(v), Σ(deg(u)+deg(v)) and the edge
    count — the integer numerators of Pearson assortativity.  Edges
    dedup through one pair exchange; degrees (bounded by the part
    DIMENSION) broadcast back onto edges."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    # orders hash into coarse buckets so every order's lines co-locate
    # (the coordered_part_pairs exchange); pair build is class-by-length
    def add_bucket(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        bkt = ((ok.astype(np.uint64) * _FIB64) >> np.uint64(56)) \
            .astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = group.column("l_partkey").to_numpy(zero_copy_only=False)
        u = np.unique(np.stack([ok, pk], axis=1), axis=0)
        ok, pk = u[:, 0], u[:, 1]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, len(ok)])
        a_all, b_all = [], []
        for ln in np.unique(lens):
            if ln < 2:
                continue
            segs = starts[lens == ln]
            mat = pk[segs[:, None] + np.arange(ln)]
            ii, jj = np.triu_indices(int(ln), k=1)
            a_all.append(mat[:, ii].ravel())
            b_all.append(mat[:, jj].ravel())
        if not a_all:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        a = np.concatenate(a_all)
        b = np.concatenate(b_all)
        t2 = pa.table({"u": pa.array(np.minimum(a, b)),
                       "v": pa.array(np.maximum(a, b))})
        return t2.group_by(["u", "v"]).aggregate([]).select(["u", "v"])

    edges = partial_aggregate(
        li.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bkt").map_groups(bucket_pairs, batch_format="pyarrow"),
        ["u", "v"], [])

    def deg_partial(batch: pa.Table) -> pa.Table:
        both = pa.concat_arrays([batch.column("u").combine_chunks(),
                                 batch.column("v").combine_chunks()])
        t = pa.table({"node": both,
                      "d": pa.array(np.ones(len(both), np.int64))})
        res = t.group_by(["node"]).aggregate([("d", "sum")])
        return pa.table({"node": res.column("node"),
                         "d": res.column("d_sum")})

    deg = partial_aggregate(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        ["node"], [("d", "sum", "d")])
    dtab = pa.concat_tables(list(deg.iter_batches(
        batch_format="pyarrow", batch_size=None)))  # part DIMENSION
    dref = ray.put((dtab.column("node").combine_chunks(),
                    dtab.column("d").to_numpy(zero_copy_only=False)))

    def fold(batch: pa.Table) -> pa.Table:
        nodes, d = ray.get(dref)
        du = d[pc.index_in(batch.column("u"), value_set=nodes)
               .to_numpy(zero_copy_only=False)]
        dv = d[pc.index_in(batch.column("v"), value_set=nodes)
               .to_numpy(zero_copy_only=False)]
        return pa.table({
            "n_edges": pa.array([len(du)], pa.int64()),
            "sum_dudv": pa.array([int((du * dv).sum())], pa.int64()),
            "sum_deg": pa.array([int((du + dv).sum())], pa.int64()),
            "sum_degsq": pa.array([int((du * du + dv * dv).sum())],
                                  pa.int64())})

    parts = pa.concat_tables(list(
        edges.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    out = {c: pa.array([int(pc.sum(parts.column(c)).as_py() or 0)],
                       pa.int64())
           for c in ("n_edges", "sum_dudv", "sum_deg", "sum_degsq")}
    return ray.data.from_arrow(pa.table(out))


def fingerprint_collision_audit(sf_dir: str, prefix_hex: int = 4
                                ) -> ray.data.Dataset:
    """Dedup-key risk audit: how crowded are truncated-fingerprint
    buckets?  Distinct texts hash to md5, group on the first
    ``prefix_hex`` hex chars, and the bucket-size histogram shows the
    collision exposure of a shortened key."""
    from ..functions.text import md5_fingerprint
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def fp(batch: pa.Table) -> pa.Table:
        fps = md5_fingerprint(batch.column("text").to_pylist())
        return pa.table({"fp": pa.array(fps, pa.string())})

    distinct = partial_aggregate(
        ds.map_batches(fp, batch_format="pyarrow"), ["fp"], [])

    def bucket(batch: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(batch.column("fp"), 0, prefix_hex)
        t = pa.table({"prefix": pref,
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["prefix"]).aggregate([("n", "sum")])
        return pa.table({"prefix": res.column("prefix"),
                         "n": res.column("n_sum")})

    per_bucket = partial_aggregate(
        distinct.map_batches(bucket, batch_format="pyarrow"),
        ["prefix"], [("n", "sum", "n")])

    def hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"bucket_size": batch.column("n"),
                      "n_buckets": pa.array(np.ones(len(batch),
                                                    np.int64))})
        res = t.group_by(["bucket_size"]).aggregate([("n_buckets", "sum")])
        return pa.table({"bucket_size": res.column("bucket_size"),
                         "n_buckets": res.column("n_buckets_sum")})

    return partial_aggregate(
        per_bucket.map_batches(hist, batch_format="pyarrow"),
        ["bucket_size"], [("n_buckets", "sum", "n_buckets")])


def brand_rank_churn(sf_dir: str) -> ray.data.Dataset:
    """Rank stability over time: each brand's revenue rank per order
    year, summed |rank_y − rank_{y+1}| across adjacent years — the
    leaderboard-churn metric.  The year×brand revenue grid partial-
    aggregates (bounded by both dimensions); ranking folds on it."""
    from ..functions.joins import shuffle_lookup_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey",
                                     "l_extendedprice"])
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    pref = ray.put((part.column("p_partkey").combine_chunks(),
                    part.column("p_brand").combine_chunks()))
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate"])

    def li_partial(batch: pa.Table) -> pa.Table:
        pk, pb = ray.get(pref)
        i = pc.index_in(batch.column("l_partkey"), value_set=pk)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "brand": pc.take(pb, i),
                      "cents": pa.array(cents)})
        res = t.group_by(["l_orderkey", "brand"]).aggregate(
            [("cents", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "brand": res.column("brand"),
                         "cents": res.column("cents_sum")})

    joined = shuffle_lookup_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("brand", pa.string()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]))

    def fold(batch: pa.Table) -> pa.Table:
        t = pa.table({"year": pc.cast(pc.year(
            batch.column("o_orderdate")), pa.int64()),
            "brand": batch.column("brand"),
            "cents": batch.column("cents")})
        res = t.group_by(["year", "brand"]).aggregate([("cents", "sum")])
        return pa.table({"year": res.column("year"),
                         "brand": res.column("brand"),
                         "cents": res.column("cents_sum")})

    agg = partial_aggregate(
        joined.map_batches(fold, batch_format="pyarrow"),
        ["year", "brand"], [("cents", "sum", "cents")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    yr = rows.column("year").to_numpy(zero_copy_only=False)
    br = rows.column("brand").to_numpy(zero_copy_only=False)
    cents = rows.column("cents").to_numpy(zero_copy_only=False)
    years = np.unique(yr)
    brands = np.unique(br)
    grid = np.zeros((len(years), len(brands)), np.int64)
    grid[np.searchsorted(years, yr), np.searchsorted(brands, br)] = cents
    # rank 1 = highest revenue; ties by brand name ascending
    churn = np.zeros(len(brands), np.int64)
    ranks = np.zeros_like(grid)
    for yi in range(len(years)):
        order = np.lexsort((brands, -grid[yi]))
        ranks[yi, order] = np.arange(1, len(brands) + 1)
    for yi in range(len(years) - 1):
        if years[yi + 1] == years[yi] + 1:  # value-adjacent years only
            churn += np.abs(ranks[yi + 1] - ranks[yi])
    return ray.data.from_arrow(pa.table({
        "brand": pa.array(brands),
        "rank_churn": pa.array(churn),
        "n_years": pa.array(np.full(len(brands), len(years), np.int64))}))


def events_hourly_ohlc(sf_dir: str) -> ray.data.Dataset:
    """OHLC downsampling (the time-series resampler): per (hour, type)
    the first, max, min and last value — FIRST/LAST are argmin/argmax
    over (ts, event_id), solved by hashing windows into coarse buckets
    and lexsorting each bucket ONCE (no per-window Python call)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_id", "event_type",
                                     "value"])

    def prep(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"hour": hour,
                      "event_type": batch.column("event_type"),
                      "ts": batch.column("ts"),
                      "event_id": batch.column("event_id"),
                      "cents": pa.array(cents)})
        return t.append_column("bkt", bucket_ids(t, ["hour",
                                                     "event_type"]))

    def per_bucket(group: pa.Table) -> pa.Table:
        hour = group.column("hour").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        cents = group.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, et, hour))
        h, e, c = hour[order], et[order], cents[order]
        new = np.r_[True, (h[1:] != h[:-1]) | (e[1:] != e[:-1])]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(h)] - 1
        highs = np.maximum.reduceat(c, starts)
        lows = np.minimum.reduceat(c, starts)
        return pa.table({
            "hour": pa.array(h[starts].astype("datetime64[us]")),
            "event_type": pa.array(e[starts]),
            "open_cents": pa.array(c[starts]),
            "high_cents": pa.array(highs),
            "low_cents": pa.array(lows),
            "close_cents": pa.array(c[ends])})

    return ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("bkt").map_groups(per_bucket, batch_format="pyarrow")


def user_daily_twap(sf_dir: str) -> ray.data.Dataset:
    """Time-weighted average position (TWAP numerator/denominator): per
    (user, day) Σ value·hold-duration where each event's value holds
    until the next event that day or midnight — the financial resample
    that weights by TIME, not by count.  Vectorized LEAD per user
    group."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "value"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        cents = np.rint(group.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        order = np.lexsort((eid, ts))
        t, c = ts[order], cents[order]
        day = t // 86_400_000_000
        day_end = (day + 1) * 86_400_000_000
        nxt = np.r_[t[1:], np.int64(0)]
        same_day = np.r_[day[1:] == day[:-1], False]
        hold_until = np.where(same_day, nxt, day_end)
        dur = hold_until - t
        tw = pa.table({
            "user_id": group.column("user_id").slice(0, 1)
            .to_numpy(zero_copy_only=False).repeat(len(t)),
            "day": pa.array((day * 86_400_000_000)
                            .astype("datetime64[us]")),
            "twap_num": pa.array(c * dur),
            "dur_us": pa.array(dur)})
        res = tw.group_by(["user_id", "day"]).aggregate(
            [("twap_num", "sum"), ("dur_us", "sum")])
        return pa.table({"user_id": res.column("user_id"),
                         "day": res.column("day"),
                         "twap_num": res.column("twap_num_sum"),
                         "dur_us": res.column("dur_us_sum")})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def order_overlap_pairs_per_customer(sf_dir: str) -> ray.data.Dataset:
    """Per-key interval self-overlap: for each customer, how many pairs
    of their orders' fulfillment spans [orderdate, last shipdate]
    intersect — queue-pressure per account.  Spans assemble through one
    shuffle_lookup_join; each customer's pair count is a sort + sweep,
    never an O(n²) build."""
    from ..functions.joins import shuffle_lookup_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])

    def li_max(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["l_orderkey"]).aggregate(
            [("l_shipdate", "max")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "last_ship": res.column("l_shipdate_max")})

    spans = shuffle_lookup_join(
        partial_aggregate(
            li.map_batches(li_max, batch_format="pyarrow"),
            ["l_orderkey"], [("last_ship", "max", "last_ship")]),
        orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("last_ship", pa.timestamp("us"))]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]))

    def per_cust(group: pa.Table) -> pa.Table:
        a = group.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        b = group.column("last_ship").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        # synthetic data allows ship-before-order; normalize the span
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        c = len(lo)
        order = np.argsort(lo, kind="stable")
        slo = lo[order]
        le = np.searchsorted(slo, hi, side="right")
        ordered = int(le.sum()) - c
        n_pairs = ordered - c * (c - 1) // 2
        return pa.table({
            "o_custkey": group.column("o_custkey").slice(0, 1),
            "n_orders": pa.array([c], pa.int64()),
            "n_overlap_pairs": pa.array([n_pairs], pa.int64())})

    return spans.groupby("o_custkey").map_groups(per_cust,
                                                 batch_format="pyarrow")


def supplier_borda_top10(sf_dir: str) -> ray.data.Dataset:
    """Rank aggregation (Borda count): suppliers ranked separately by
    lineitem revenue and by distinct parts supplied; the Borda score is
    the rank sum, lowest wins.  Both metrics partial-aggregate keyed on
    the supplier DIMENSION; ranking and blending fold on that bounded
    table."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_partkey",
                                     "l_extendedprice"])

    def partials(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"l_suppkey": batch.column("l_suppkey"),
                      "l_partkey": batch.column("l_partkey"),
                      "cents": pa.array(cents)})
        res = t.group_by(["l_suppkey", "l_partkey"]).aggregate(
            [("cents", "sum")])
        return pa.table({"l_suppkey": res.column("l_suppkey"),
                         "l_partkey": res.column("l_partkey"),
                         "cents": res.column("cents_sum")})

    per_sp = partial_aggregate(
        li.map_batches(partials, batch_format="pyarrow"),
        ["l_suppkey", "l_partkey"], [("cents", "sum", "cents")])

    def fold(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["l_suppkey"]).aggregate(
            [("cents", "sum"), ("l_partkey", "count")])
        return pa.table({"l_suppkey": res.column("l_suppkey"),
                         "revenue_cents": res.column("cents_sum"),
                         "n_parts": pc.cast(
                             res.column("l_partkey_count"), pa.int64())})

    agg = partial_aggregate(
        per_sp.map_batches(fold, batch_format="pyarrow"),
        ["l_suppkey"], [("revenue_cents", "sum", "revenue_cents"),
                        ("n_parts", "sum", "n_parts")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))  # supplier DIMENSION
    sk = rows.column("l_suppkey").to_numpy(zero_copy_only=False)
    rev = rows.column("revenue_cents").to_numpy(zero_copy_only=False)
    npart = rows.column("n_parts").to_numpy(zero_copy_only=False)
    r1 = np.empty(len(sk), np.int64)
    r1[np.lexsort((sk, -rev))] = np.arange(1, len(sk) + 1)
    r2 = np.empty(len(sk), np.int64)
    r2[np.lexsort((sk, -npart))] = np.arange(1, len(sk) + 1)
    borda = r1 + r2
    order = np.lexsort((sk, borda))[:10]
    return ray.data.from_arrow(pa.table({
        "l_suppkey": pa.array(sk[order]),
        "rank_revenue": pa.array(r1[order]),
        "rank_parts": pa.array(r2[order]),
        "borda": pa.array(borda[order])}))


def same_customer_yoy_delta(sf_dir: str, year_a: int = 1996,
                            year_b: int = 1997) -> ray.data.Dataset:
    """Comparable-cohort (same-store) comparison: customers ordering in
    BOTH years, with each year's revenue and the delta — the semi-join-
    both-periods pattern that removes mix effects.  Per (customer,
    year) partials reduce; the both-years filter is a per-key fold."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_totalprice"])

    def partials(batch: pa.Table) -> pa.Table:
        year = pc.year(batch.column("o_orderdate")) \
            .to_numpy(zero_copy_only=False)
        keep = (year == year_a) | (year == year_b)
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        isa = (year == year_a)[keep]
        t = pa.table({
            "o_custkey": pa.array(ck[keep]),
            "cents_a": pa.array(np.where(isa, cents[keep], 0)),
            "cents_b": pa.array(np.where(isa, 0, cents[keep])),
            "n_a": pa.array(isa.astype(np.int64)),
            "n_b": pa.array((~isa).astype(np.int64))})
        res = t.group_by(["o_custkey"]).aggregate(
            [("cents_a", "sum"), ("cents_b", "sum"),
             ("n_a", "sum"), ("n_b", "sum")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "cents_a": res.column("cents_a_sum"),
                         "cents_b": res.column("cents_b_sum"),
                         "n_a": res.column("n_a_sum"),
                         "n_b": res.column("n_b_sum")})

    agg = partial_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["o_custkey"], [("cents_a", "sum", "cents_a"),
                        ("cents_b", "sum", "cents_b"),
                        ("n_a", "sum", "n_a"), ("n_b", "sum", "n_b")])

    def fold(batch: pa.Table) -> pa.Table:
        both = pc.and_(pc.greater(batch.column("n_a"), 0),
                       pc.greater(batch.column("n_b"), 0))
        t = batch.filter(both)
        ca = t.column("cents_a").to_numpy(zero_copy_only=False)
        cb = t.column("cents_b").to_numpy(zero_copy_only=False)
        return pa.table({"o_custkey": t.column("o_custkey"),
                         "cents_a": pa.array(ca),
                         "cents_b": pa.array(cb),
                         "delta_cents": pa.array(cb - ca)})

    return agg.map_batches(fold, batch_format="pyarrow")


def type_coburst_hours(sf_dir: str) -> ray.data.Dataset:
    """Co-burst detection: for every event-type pair, hours where BOTH
    types ran strictly above their own median hourly volume.  Hourly
    counts partial-aggregate to a calendar×types grid; medians (lower
    median, quantile_disc semantics) and the joint count fold on it."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def hourly(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        t = pa.table({"hour": hour,
                      "event_type": batch.column("event_type"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["hour", "event_type"]).aggregate([("n", "sum")])
        return pa.table({"hour": res.column("hour"),
                         "event_type": res.column("event_type"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(hourly, batch_format="pyarrow"),
        ["hour", "event_type"], [("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    hr = rows.column("hour").to_numpy(zero_copy_only=False)
    et = rows.column("event_type").to_numpy(zero_copy_only=False)
    n = rows.column("n").to_numpy(zero_copy_only=False)
    hours, hi = np.unique(hr, return_inverse=True)
    types, ti = np.unique(et, return_inverse=True)
    grid = np.zeros((len(hours), len(types)), np.int64)
    grid[hi, ti] = n
    # lower median (quantile_disc 0.5) over the DENSE hour series
    med = np.sort(grid, axis=0)[(len(hours) - 1) // 2, :]
    above = grid > med[None, :]
    ta, tb, co = [], [], []
    for a in range(len(types)):
        for b in range(a + 1, len(types)):
            nco = int((above[:, a] & above[:, b]).sum())
            if nco > 0:         # inner-join semantics of the oracle
                ta.append(types[a])
                tb.append(types[b])
                co.append(nco)
    return ray.data.from_arrow(pa.table({
        "type_a": pa.array(ta, pa.string()),
        "type_b": pa.array(tb, pa.string()),
        "n_coburst_hours": pa.array(co, pa.int64())}))


def revenue_sigma_outlier_days(sf_dir: str) -> ray.data.Dataset:
    """2σ anomaly days WITHOUT floats: a day is anomalous when
    (n·x − S)² > 4·(n·SS − S²) — both sides n²-scaled, evaluated in
    exact arbitrary-precision integers on the calendar-bounded daily
    series (the squares exceed int64, so the fold uses Python ints)."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def daily(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("o_orderdate"), unit="day")
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"day": day, "cents": pa.array(cents)})
        res = t.group_by(["day"]).aggregate([("cents", "sum")])
        return pa.table({"day": res.column("day"),
                         "cents": res.column("cents_sum")})

    agg = partial_aggregate(
        ds.map_batches(daily, batch_format="pyarrow"),
        ["day"], [("cents", "sum", "cents")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    day = rows.column("day")
    cents = rows.column("cents").to_numpy(zero_copy_only=False)
    n = len(cents)
    s = int(cents.sum())
    ss = int((cents.astype(object) * cents.astype(object)).sum())
    var_num = n * ss - s * s            # n²·σ²  (exact Python int)
    flags = [1 if (n * int(x) - s) ** 2 > 4 * var_num else 0
             for x in cents]
    return ray.data.from_arrow(pa.table({
        "day": day,
        "revenue_cents": pa.array(cents),
        "is_outlier": pa.array(flags, pa.int64())}))


def view_purchase_within3_events(sf_dir: str) -> ray.data.Dataset:
    """Row-offset funnel: per user, 'view' events followed by a
    'purchase' within the next THREE events (position window, not time
    window) — vectorized lookahead over each user's ordered stream."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ty = types[order]
        is_p = ty == "purchase"
        hit = np.zeros(len(ty), bool)
        for off in (1, 2, 3):
            hit[:-off] |= is_p[off:]
        conv = (ty == "view") & hit
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "n_views": pa.array([int((ty == "view").sum())], pa.int64()),
            "n_converted_views": pa.array([int(conv.sum())], pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def embedding_power_iteration(sf_dir: str, iters: int = 3,
                              scale: int = 100) -> ray.data.Dataset:
    """Top principal direction by fixed-point power iteration: the
    64×64 integer Gram matrix A = Σ qqᵀ (e8 units) folds from batch
    partials — the ONLY data-sized pass — then v ← (scale·Av)//max|Av|
    iterates on the driver, bit-exact vs the unrolled SQL oracle.
    The iterative-ML primitive (PCA/eigenvector) on Ray Data."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])

    def gram(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column("embedding")
                     .to_numpy(zero_copy_only=False))
        q = np.rint(m.astype(np.float64) * 10_000).astype(np.int64)
        a = q.T @ q                    # 64×64 int64
        i, j = np.divmod(np.arange(a.size, dtype=np.int64), a.shape[1])
        return pa.table({"i": pa.array(i), "j": pa.array(j),
                         "a": pa.array(a.ravel())})

    agg = partial_aggregate(
        ds.map_batches(gram, batch_format="pyarrow"),
        ["i", "j"], [("a", "sum", "a")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    k = 64
    a = np.zeros((k, k), dtype=object)   # Python ints: no overflow
    a[rows.column("i").to_numpy(zero_copy_only=False),
      rows.column("j").to_numpy(zero_copy_only=False)] = \
        [int(x) for x in rows.column("a").to_numpy(zero_copy_only=False)]
    v = np.full(k, 1, dtype=object)
    for _ in range(iters):
        av = a @ v
        mx = max(int(abs(x)) for x in av)
        if mx == 0:
            break
        # floor division toward -inf, matching the SQL floor() oracle
        v = np.array([(scale * int(x)) // mx for x in av], dtype=object)
    return ray.data.from_arrow(pa.table({
        "dim": pa.array(np.arange(k, dtype=np.int64)),
        "v": pa.array([int(x) for x in v], pa.int64())}))


def top_customer_part_drilldown(sf_dir: str, n_cust: int = 5,
                                n_parts: int = 3) -> ray.data.Dataset:
    """Hierarchical drill-down: the top-5 customers by lineitem revenue,
    then each one's top-3 parts by spend.  Pass 1 ranks customers (the
    fact joins orderkey→custkey once); the tiny winner set broadcasts
    into pass 2's semi-join so the per-part ranking sees only their
    rows."""
    from ..functions.joins import shuffle_lookup_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey",
                                     "l_extendedprice"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])

    def li_partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "l_partkey": batch.column("l_partkey"),
                      "cents": pa.array(cents)})
        res = t.group_by(["l_orderkey", "l_partkey"]).aggregate(
            [("cents", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "l_partkey": res.column("l_partkey"),
                         "cents": res.column("cents_sum")})

    joined = shuffle_lookup_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_partkey", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]))

    def cust_part(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["o_custkey", "l_partkey"]).aggregate(
            [("cents", "sum")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "l_partkey": res.column("l_partkey"),
                         "cents": res.column("cents_sum")})

    per_cp = partial_aggregate(
        joined.map_batches(cust_part, batch_format="pyarrow"),
        ["o_custkey", "l_partkey"], [("cents", "sum", "cents")])

    def cust_fold(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["o_custkey"]).aggregate([("cents", "sum")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "cents": res.column("cents_sum")})

    top = partial_aggregate(
        per_cp.map_batches(cust_fold, batch_format="pyarrow"),
        ["o_custkey"], [("cents", "sum", "cents")]) \
        .sort(["cents", "o_custkey"], descending=[True, False]) \
        .limit(n_cust).take_all()
    winners = pa.array(sorted(r["o_custkey"] for r in top), pa.int64())
    wref = ray.put(winners)

    def keep_winners(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("o_custkey"),
                                     value_set=ray.get(wref)))

    kept = pa.concat_tables(list(
        per_cp.map_batches(keep_winners, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    ck = kept.column("o_custkey").to_numpy(zero_copy_only=False)
    pk = kept.column("l_partkey").to_numpy(zero_copy_only=False)
    cents = kept.column("cents").to_numpy(zero_copy_only=False)
    order = np.lexsort((pk, -cents, ck))
    ck, pk, cents = ck[order], pk[order], cents[order]
    starts = np.flatnonzero(np.r_[True, ck[1:] != ck[:-1]])
    pos = np.arange(len(ck)) - np.repeat(starts, np.diff(
        np.r_[starts, len(ck)]))
    keep = pos < n_parts
    return ray.data.from_arrow(pa.table({
        "o_custkey": pa.array(ck[keep]),
        "l_partkey": pa.array(pk[keep]),
        "cents": pa.array(cents[keep]),
        "part_rank": pa.array(pos[keep] + 1)}))


def consistent_hash_move_audit(sf_dir: str, n_old: int = 16,
                               n_new: int = 17) -> ray.data.Dataset:
    """Data-placement stability audit: how many documents move when a
    17th node joins, under modulo placement versus rendezvous (highest-
    random-weight) hashing — the shard-rebalance cost comparison.
    Rendezvous weight = md5(doc_id|node) prefix; each batch folds to
    two counters, nothing shuffles."""
    import hashlib
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])

    def audit(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        moved_mod = int((ids % n_old != ids % n_new).sum())
        moved_rdv = 0
        for d in ids:  # hashlib has no Arrow kernel; C-speed loop
            ws = [int(hashlib.md5(f"{d}|{node}".encode())
                      .hexdigest()[:15], 16) for node in range(n_new)]
            old_node = max(range(n_old), key=lambda nd: (ws[nd], nd))
            new_node = max(range(n_new), key=lambda nd: (ws[nd], nd))
            moved_rdv += old_node != new_node
        return pa.table({
            "n_docs": pa.array([len(ids)], pa.int64()),
            "moved_mod": pa.array([moved_mod], pa.int64()),
            "moved_rendezvous": pa.array([moved_rdv], pa.int64())})

    parts = pa.concat_tables(list(
        ds.map_batches(audit, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    out = {c: pa.array([int(pc.sum(parts.column(c)).as_py() or 0)],
                       pa.int64())
           for c in ("n_docs", "moved_mod", "moved_rendezvous")}
    return ray.data.from_arrow(pa.table(out))


def part_name_levenshtein_pairs(sf_dir: str, max_dist: int = 2
                                ) -> ray.data.Dataset:
    """Edit-distance band join blocked on brand: within each brand,
    count part-name pairs with Levenshtein distance ≤ 2 — the fuzzy-
    match primitive of entity resolution.  Brands are a bounded
    dimension, so each group's pair DP runs on a dimension-sized set;
    the blocking key is what keeps this off the O(N²) cliff."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_brand", "p_name"])

    def lev(a: str, b: str) -> int:
        if abs(len(a) - len(b)) > max_dist:
            return max_dist + 1
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            if min(cur) > max_dist:
                return max_dist + 1
            prev = cur
        return prev[-1]

    def per_brand(group: pa.Table) -> pa.Table:
        names = sorted(set(group.column("p_name").to_pylist()))
        n_close = 0
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                if lev(names[i], names[j]) <= max_dist:
                    n_close += 1
        return pa.table({
            "p_brand": group.column("p_brand").slice(0, 1),
            "n_names": pa.array([len(names)], pa.int64()),
            "n_close_pairs": pa.array([n_close], pa.int64())})

    return ds.groupby("p_brand").map_groups(per_brand,
                                            batch_format="pyarrow")


def lineitem_profile(sf_dir: str) -> ray.data.Dataset:
    """One-pass table profiler (ANALYZE): per column, the non-null row
    count and the exact distinct count.  Each column's values key their
    own distinct exchange; counts fold per column — the schema-stats
    operator every warehouse runs before planning."""
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_returnflag", "l_linestatus"]
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet", columns=cols)

    def explode(batch: pa.Table) -> pa.Table:
        outs = []
        for c in cols:
            col = batch.column(c)
            v = pc.cast(col, pa.string())
            t = pa.table({"col_name": pa.array([c] * len(batch),
                                             pa.string()),
                          "value": v})
            outs.append(t.group_by(["col_name", "value"]).aggregate(
                [("value", "count")]))
        merged = pa.concat_tables(outs)
        return pa.table({"col_name": merged.column("col_name"),
                         "value": merged.column("value"),
                         "n": pc.cast(merged.column("value_count"),
                                      pa.int64())})

    per_value = partial_aggregate(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["col_name", "value"], [("n", "sum", "n")])

    def fold(batch: pa.Table) -> pa.Table:
        t = pa.table({"col_name": batch.column("col_name"),
                      "n_nonnull": batch.column("n"),
                      "n_distinct": pa.array(np.ones(len(batch),
                                                     np.int64))})
        res = t.group_by(["col_name"]).aggregate(
            [("n_nonnull", "sum"), ("n_distinct", "sum")])
        return pa.table({"col_name": res.column("col_name"),
                         "n_nonnull": res.column("n_nonnull_sum"),
                         "n_distinct": res.column("n_distinct_sum")})

    return partial_aggregate(
        per_value.map_batches(fold, batch_format="pyarrow"),
        ["col_name"], [("n_nonnull", "sum", "n_nonnull"),
                     ("n_distinct", "sum", "n_distinct")])


def purchase_position_in_session(sf_dir: str, gap_seconds: int = 1800
                                 ) -> ray.data.Dataset:
    """Where in a session do purchases happen?  Global count of
    purchases and the sum of their 0-based positions within their
    session (mean position = sum/n) plus total sessions — per-user
    session folds emit 3 counters, the reduce is a 3-integer sum."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        t, ty = ts[order], types[order]
        brk = np.r_[0, np.flatnonzero(np.diff(t)
                                      > gap_seconds * 1_000_000) + 1,
                    len(t)]
        starts = brk[:-1]
        runlen = np.diff(brk)
        pos = np.arange(len(t)) - np.repeat(starts, runlen)
        is_p = ty == "purchase"
        return pa.table({
            "n_sessions": pa.array([len(starts)], pa.int64()),
            "n_purchases": pa.array([int(is_p.sum())], pa.int64()),
            "sum_position": pa.array([int(pos[is_p].sum())], pa.int64())})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    rows = pa.concat_tables(list(per.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    out = {c: pa.array([int(pc.sum(rows.column(c)).as_py() or 0)],
                       pa.int64())
           for c in ("n_sessions", "n_purchases", "sum_position")}
    return ray.data.from_arrow(pa.table(out))


def priority_lag_quantiles(sf_dir: str) -> pa.Table:
    """Fulfillment-latency SLA percentiles: exact p50/p90/p99 of the
    per-lineitem ship lag (days) for each order priority — the grouped
    histogram-refinement selection over a DERIVED column built by one
    shuffle_lookup_join."""
    from ..functions.joins import shuffle_lookup_join
    from ..functions.quantiles import grouped_exact_quantiles
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate",
                                         "o_orderpriority"])
    joined = shuffle_lookup_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_shipdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_orderpriority", pa.string())]))

    def lag(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        od = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({
            "o_orderpriority": batch.column("o_orderpriority"),
            "lag_days": pa.array((ship - od).astype(np.float64))})

    lags = joined.map_batches(lag, batch_format="pyarrow")
    return grouped_exact_quantiles(lags, "o_orderpriority", "lag_days",
                                   qs=(0.5, 0.9, 0.99))


def customer_name_key_audit(sf_dir: str) -> ray.data.Dataset:
    """Derived-field consistency audit: the numeric suffix of c_name
    must equal c_custkey ('Customer#%09d' contract).  One vectorized
    slice+cast per batch, three counters out — the cheap invariant
    check that catches bad backfills."""
    ds = read_parquet_clean(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_name"])

    def audit(batch: pa.Table) -> pa.Table:
        suffix = pc.utf8_slice_codeunits(batch.column("c_name"), 9, 99)
        parsed = pc.cast(suffix, pa.int64(), safe=False)
        okfmt = pc.starts_with(batch.column("c_name"), "Customer#")
        match = pc.and_(okfmt, pc.equal(parsed, batch.column("c_custkey")))
        n = len(batch)
        good = int(pc.sum(pc.cast(match, pa.int64())).as_py() or 0)
        return pa.table({
            "n_rows": pa.array([n], pa.int64()),
            "n_consistent": pa.array([good], pa.int64()),
            "n_mismatched": pa.array([n - good], pa.int64())})

    parts = pa.concat_tables(list(
        ds.map_batches(audit, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    out = {c: pa.array([int(pc.sum(parts.column(c)).as_py() or 0)],
                       pa.int64())
           for c in ("n_rows", "n_consistent", "n_mismatched")}
    return ray.data.from_arrow(pa.table(out))


def event_id_density_audit(sf_dir: str) -> ray.data.Dataset:
    """Surrogate-key density audit: min/max/count of event_id and the
    implied hole count (max−min+1−n) plus duplicate count — the
    sequence-integrity check, folded from four distributive
    aggregates and one distinct count."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id"])

    # distinct count needs its own keyed exchange; min/max/count fold
    def dvals(batch: pa.Table) -> pa.Table:
        dis = pc.unique(batch.column("event_id"))
        return pa.table({"event_id": dis})

    distinct = partial_aggregate(
        ds.map_batches(dvals, batch_format="pyarrow"), ["event_id"], [])

    def dcount(batch: pa.Table) -> pa.Table:
        return pa.table({"nd": pa.array([len(batch)], pa.int64())})

    dparts = pa.concat_tables(list(
        distinct.map_batches(dcount, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    n_distinct = int(pc.sum(dparts.column("nd")).as_py() or 0)

    def mmc(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id")
        return pa.table({
            "mn": pa.array([pc.min(ids).as_py()], pa.int64()),
            "mx": pa.array([pc.max(ids).as_py()], pa.int64()),
            "n": pa.array([len(ids)], pa.int64())})

    mparts = pa.concat_tables(list(
        ds.map_batches(mmc, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    mn = int(pc.min(mparts.column("mn")).as_py())
    mx = int(pc.max(mparts.column("mx")).as_py())
    n = int(pc.sum(mparts.column("n")).as_py())
    return ray.data.from_arrow(pa.table({
        "min_id": pa.array([mn], pa.int64()),
        "max_id": pa.array([mx], pa.int64()),
        "n_rows": pa.array([n], pa.int64()),
        "n_duplicates": pa.array([n - n_distinct], pa.int64()),
        "n_holes": pa.array([mx - mn + 1 - n_distinct], pa.int64())}))


def customer_status_sequence_signatures(sf_dir: str) -> ray.data.Dataset:
    """Ordered-sequence signatures: each customer's order statuses
    concatenated in (orderdate, orderkey) order form a signature
    string; count customers per signature — the behavioral-sequence
    census (set-signature's ORDERED sibling)."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_orderkey", "o_orderstatus"])

    def per_cust(group: pa.Table) -> pa.Table:
        od = group.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ok = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        st = group.column("o_orderstatus").to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, od))
        sig = "".join(st[order])
        return pa.table({"signature": pa.array([sig], pa.string()),
                         "n_customers": pa.array([1], pa.int64())})

    per = ds.groupby("o_custkey").map_groups(per_cust,
                                             batch_format="pyarrow")
    return partial_aggregate(
        per, ["signature"], [("n_customers", "sum", "n_customers")])


def customer_giant_orders(sf_dir: str, factor: int = 3
                          ) -> ray.data.Dataset:
    """Robust per-key outlier detection: orders worth more than
    ``factor`` × the CUSTOMER'S OWN lower-median order value — the
    per-entity threshold that a global cutoff can't express.  Median
    and comparison both happen inside each customer's group."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])

    def per_cust(group: pa.Table) -> pa.Table:
        cents = np.rint(group.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        med = np.sort(cents, kind="stable")[(len(cents) - 1) // 2]
        giant = int((cents > factor * med).sum())
        if giant == 0:      # inner semantics: quiet customers drop
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64()),
                             "n_giant": pa.array([], pa.int64())})
        return pa.table({
            "o_custkey": group.column("o_custkey").slice(0, 1),
            "n_orders": pa.array([len(cents)], pa.int64()),
            "n_giant": pa.array([giant], pa.int64())})

    return ds.groupby("o_custkey").map_groups(per_cust,
                                              batch_format="pyarrow")


def vocab_coverage_curve(sf_dir: str, ks=(10, 100, 1000)
                         ) -> ray.data.Dataset:
    """Tokenizer-design coverage curve: what fraction (floor ppm) of
    all token occurrences do the top-k vocabulary entries cover, at
    k ∈ {10, 100, 1000}?  Token counts partial-aggregate; only the
    top-max(k) rows (deterministic count-desc/token-asc rank) and one
    global total ever reach the driver."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def counts(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(batch.column("text"),
                                                " "))
        t = pa.table({"tok": flat,
                      "n": pa.array(np.ones(len(flat), np.int64))})
        res = t.group_by(["tok"]).aggregate([("n", "sum")])
        return pa.table({"tok": res.column("tok"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["tok"], [("n", "sum", "n")])
    top = agg.sort(["n", "tok"], descending=[True, False]) \
        .limit(max(ks)).take_all()
    totals = pa.concat_tables(list(
        agg.map_batches(
            lambda b: pa.table({"t": pa.array(
                [int(pc.sum(b.column("n")).as_py() or 0)], pa.int64())}),
            batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    total = int(pc.sum(totals.column("t")).as_py() or 0)
    head = np.array([r["n"] for r in top], np.int64)
    cum = np.cumsum(head)
    out_k, out_cov, out_ppm = [], [], []
    for k in ks:
        covered = int(cum[min(k, len(cum)) - 1]) if len(cum) else 0
        out_k.append(k)
        out_cov.append(covered)
        out_ppm.append((1_000_000 * covered) // max(total, 1))
    return ray.data.from_arrow(pa.table({
        "k": pa.array(out_k, pa.int64()),
        "covered": pa.array(out_cov, pa.int64()),
        "total": pa.array([total] * len(ks), pa.int64()),
        "coverage_ppm": pa.array(out_ppm, pa.int64())}))


def arrival_dispersion_by_type(sf_dir: str) -> ray.data.Dataset:
    """Poisson-ness probe: per event type the inter-arrival dispersion
    moments — gap count, Σgap, Σgap² and the integer variance numerator
    n·Σg² − (Σg)² (index of dispersion = that / (n·Σg)) — gaps built by
    one per-type ordered diff."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "event_id"])

    def per_type(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        g = np.diff(ts[order]).astype(object)
        n = len(g)
        sg = int(sum(g)) if n else 0
        sgg = int(sum(x * x for x in g)) if n else 0
        return pa.table({
            "event_type": group.column("event_type").slice(0, 1),
            "n_gaps": pa.array([n], pa.int64()),
            "sum_gap_us": pa.array([sg], pa.int64()),
            # exact decimal strings: Σg² exceeds 2^53 (µs gaps squared),
            # and int→float64 rounding can differ 1 ULP from DuckDB's
            # HUGEINT→DOUBLE double-rounding
            "sumsq_gap": pa.array([str(sgg)], pa.string()),
            "disp_num": pa.array([str(n * sgg - sg * sg)],
                                 pa.string())})

    return ds.groupby("event_type").map_groups(per_type,
                                               batch_format="pyarrow")


def token_burstiness_top10(sf_dir: str) -> ray.data.Dataset:
    """Burstiness census: tokens whose single-document concentration is
    highest — per token the MAX within-one-doc count and the corpus
    total, top-10 by that max.  Per-doc counts stay inside the batch
    (docs are atomic rows); only (token, max, total) partials shuffle."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def per_batch(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(len(batch)), reps)
        t = pa.table({"doc": pa.array(doc), "tok": pa.array(flat),
                      "n": pa.array(np.ones(len(flat), np.int64))})
        per_doc = t.group_by(["doc", "tok"]).aggregate([("n", "sum")])
        t2 = pa.table({"tok": per_doc.column("tok"),
                       "max_in_doc": per_doc.column("n_sum"),
                       "total": per_doc.column("n_sum")})
        res = t2.group_by(["tok"]).aggregate(
            [("max_in_doc", "max"), ("total", "sum")])
        return pa.table({"tok": res.column("tok"),
                         "max_in_doc": res.column("max_in_doc_max"),
                         "total": res.column("total_sum")})

    agg = partial_aggregate(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        ["tok"], [("max_in_doc", "max", "max_in_doc"),
                  ("total", "sum", "total")])
    return agg.sort(["max_in_doc", "tok"],
                    descending=[True, False]).limit(10)


def part_staleness_tiers(sf_dir: str, asof: str = "2001-08-01"
                         ) -> ray.data.Dataset:
    """Storage-lifecycle tiering: parts bucketed by days since their
    LAST shipment as of a pinned date — hot (<365), warm (<730), cold
    (≥730) — with part counts and lifetime revenue per tier; the
    never-ordered backlog reports as its own tier.  Per-part last-ship
    and revenue fold in one keyed exchange; parts broadcast."""
    asof_day = np.datetime64(asof, "D").astype(np.int64)
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_shipdate",
                                     "l_extendedprice"])
    all_parts = pq.read_table(f"{sf_dir}/part.parquet",
                              columns=["p_partkey"]).column(0)

    def partials(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "last_ship": batch.column("l_shipdate"),
                      "cents": pa.array(cents)})
        res = t.group_by(["l_partkey"]).aggregate(
            [("last_ship", "max"), ("cents", "sum")])
        return pa.table({"l_partkey": res.column("l_partkey"),
                         "last_ship": res.column("last_ship_max"),
                         "cents": res.column("cents_sum")})

    agg = partial_aggregate(
        li.map_batches(partials, batch_format="pyarrow"),
        ["l_partkey"], [("last_ship", "max", "last_ship"),
                        ("cents", "sum", "cents")])

    def tier(batch: pa.Table) -> pa.Table:
        last = batch.column("last_ship").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        age = asof_day - last
        t = np.where(age < 365, "hot",
                     np.where(age < 730, "warm", "cold"))
        tt = pa.table({"tier": pa.array(t),
                       "n_parts": pa.array(np.ones(len(t), np.int64)),
                       "revenue_cents": batch.column("cents")})
        res = tt.group_by(["tier"]).aggregate(
            [("n_parts", "sum"), ("revenue_cents", "sum")])
        return pa.table({"tier": res.column("tier"),
                         "n_parts": res.column("n_parts_sum"),
                         "revenue_cents": res.column(
                             "revenue_cents_sum")})

    tiers = partial_aggregate(
        agg.map_batches(tier, batch_format="pyarrow"),
        ["tier"], [("n_parts", "sum", "n_parts"),
                   ("revenue_cents", "sum", "revenue_cents")])
    rows = pa.concat_tables(list(tiers.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    # never-shipped parts: dimension minus active keys, counted via the
    # aggregated key count (bounded by the part dimension)
    keyt = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    n_never = len(all_parts) - len(keyt)
    extra = pa.table({"tier": pa.array(["never"], pa.string()),
                      "n_parts": pa.array([n_never], pa.int64()),
                      "revenue_cents": pa.array([0], pa.int64())})
    return ray.data.from_arrow(pa.concat_tables(
        [rows.select(["tier", "n_parts", "revenue_cents"]), extra]))


def daily_peak_3h_window(sf_dir: str, window_hours: int = 3
                         ) -> ray.data.Dataset:
    """Sliding-window argmax: per day, the 3-hour contiguous window
    holding the most events (earliest start wins ties).  Hourly counts
    partial-aggregate to the bounded day×24 grid; the window sweep
    folds on it."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts"])

    def hourly(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        day = ts // 86_400_000_000
        hour = (ts % 86_400_000_000) // 3_600_000_000
        t = pa.table({"day": pa.array(day), "hour": pa.array(hour),
                      "n": pa.array(np.ones(len(ts), np.int64))})
        res = t.group_by(["day", "hour"]).aggregate([("n", "sum")])
        return pa.table({"day": res.column("day"),
                         "hour": res.column("hour"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(hourly, batch_format="pyarrow"),
        ["day", "hour"], [("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    day = rows.column("day").to_numpy(zero_copy_only=False)
    hour = rows.column("hour").to_numpy(zero_copy_only=False)
    n = rows.column("n").to_numpy(zero_copy_only=False)
    days, di = np.unique(day, return_inverse=True)
    grid = np.zeros((len(days), 24), np.int64)
    grid[di, hour] = n
    k = window_hours
    sums = np.stack([grid[:, s:s + k].sum(axis=1)
                     for s in range(24 - k + 1)], axis=1)
    start = sums.argmax(axis=1)          # first max wins (earliest)
    best = sums[np.arange(len(days)), start]
    return ray.data.from_arrow(pa.table({
        "day": pa.array((days * 86_400_000_000)
                        .astype("datetime64[us]")),
        "start_hour": pa.array(start.astype(np.int64)),
        "window_events": pa.array(best)}))


def type_pair_lag_xcorr(sf_dir: str, type_a: str = "view",
                        type_b: str = "purchase", max_lag: int = 3
                        ) -> ray.data.Dataset:
    """Lead-lag detection: the raw cross-correlation dot product
    Σ_d a(d)·b(d+lag) between two event types' daily-count series for
    lag 0..3 — does activity in A anticipate B?  The daily grid is
    calendar-bounded; the lagged dots fold on it."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def daily(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("event_type"),
                        value_set=pa.array([type_a, type_b]))
        t = batch.filter(keep)
        ts = t.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        day = ts // 86_400_000_000
        tt = pa.table({"day": pa.array(day),
                       "event_type": t.column("event_type"),
                       "n": pa.array(np.ones(len(day), np.int64))})
        res = tt.group_by(["day", "event_type"]).aggregate([("n", "sum")])
        return pa.table({"day": res.column("day"),
                         "event_type": res.column("event_type"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(daily, batch_format="pyarrow"),
        ["day", "event_type"], [("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    day = rows.column("day").to_numpy(zero_copy_only=False)
    et = rows.column("event_type").to_numpy(zero_copy_only=False)
    n = rows.column("n").to_numpy(zero_copy_only=False)
    days = np.unique(day)
    full = np.arange(days.min(), days.max() + 1) if len(days) else days
    a = np.zeros(len(full), np.int64)
    b = np.zeros(len(full), np.int64)
    ia = et == type_a
    a[day[ia] - full[0] if len(full) else []] = n[ia]
    b[day[~ia] - full[0] if len(full) else []] = n[~ia]
    lags, dots = [], []
    for lag in range(max_lag + 1):
        lags.append(lag)
        dots.append(int((a[:len(a) - lag] * b[lag:]).sum())
                    if lag < len(a) else 0)
    return ray.data.from_arrow(pa.table({
        "lag": pa.array(lags, pa.int64()),
        "dot": pa.array(dots, pa.int64())}))


def brand_revenue_anova(sf_dir: str) -> ray.data.Dataset:
    """One-way ANOVA decomposition without floats: between-brand and
    within-brand sum-of-squares numerators for lineitem revenue, both
    N²-scaled so SSB_num + SSW_num = SST_num exactly.  Per-brand
    (n, Σx, Σx²) partials fold; the exact-bignum assembly runs on the
    brand-bounded table."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_extendedprice"])
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    pref = ray.put((part.column("p_partkey").combine_chunks(),
                    part.column("p_brand").combine_chunks()))

    def moments(batch: pa.Table) -> pa.Table:
        pk, pb = ray.get(pref)
        i = pc.index_in(batch.column("l_partkey"), value_set=pk)
        # whole DOLLARS, not cents: Σx² of cents would overflow int64
        # by sf0.1 (1e14 per row × 6e5 rows); dollars keep Σx² < 1e16
        dollars = np.rint(batch.column("l_extendedprice")
                          .to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        t = pa.table({"brand": pc.take(pb, i),
                      "n": pa.array(np.ones(len(dollars), np.int64)),
                      "s": pa.array(dollars),
                      "ss": pa.array(dollars * dollars)})
        res = t.group_by(["brand"]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return pa.table({"brand": res.column("brand"),
                         "n": res.column("n_sum"),
                         "s": res.column("s_sum"),
                         "ss": res.column("ss_sum")})

    agg = partial_aggregate(
        li.map_batches(moments, batch_format="pyarrow"),
        ["brand"], [("n", "sum", "n"), ("s", "sum", "s"),
                    ("ss", "sum", "ss")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    ng = [int(x) for x in rows.column("n").to_pylist()]
    sg = [int(x) for x in rows.column("s").to_pylist()]
    ssg = [int(x) for x in rows.column("ss").to_pylist()]
    n = sum(ng)
    s = sum(sg)
    # floor-mean quantization keeps BOTH engines in exact integers:
    # group mean gm_g = S_g // n_g, grand mean gm = S // N,
    # SSB* = Σ n_g·(gm_g − gm)², SST* = ΣΣx² − 2·gm·S + N·gm²
    gm = s // n if n else 0
    ssb = sum(m * (x // m - gm) ** 2 for x, m in zip(sg, ng) if m)
    sst = sum(ssg) - 2 * gm * s + n * gm * gm
    ssb_ppm = (1_000_000 * ssb) // sst if sst else 0
    return ray.data.from_arrow(pa.table({
        "n_rows": pa.array([n], pa.int64()),
        "n_brands": pa.array([len(ng)], pa.int64()),
        "ssb_ppm": pa.array([ssb_ppm], pa.int64())}))


def user_value_ewma2(sf_dir: str) -> ray.data.Dataset:
    """Stateful per-key scan with a data dependency: integer EWMA with
    α = 1/2, ewma ← (cents + ewma) // 2 over each user's ordered
    stream (floor at every step, so NO closed form exists — this is a
    true sequential scan, the recursive-CTE oracle's shape).  The
    recurrence runs inside each user's group; groups are bounded."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "value"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        cents = np.rint(group.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        order = np.lexsort((eid, ts))
        e = 0
        for c in cents[order]:       # inherent sequential dependency
            e = (int(c) + e) // 2
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "ewma_cents": pa.array([e], pa.int64()),
            "n_events": pa.array([len(cents)], pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


def revenue_growth_accounting(sf_dir: str) -> ray.data.Dataset:
    """Growth accounting (the revenue waterfall): each year-over-year
    revenue delta decomposed into NEW (customer absent prior year),
    CHURNED (absent this year), EXPANSION and CONTRACTION — per
    customer-year revenues fold per customer, contributions re-key by
    year; the identity new+expansion−contraction−churned = Δtotal holds
    exactly in cents."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_totalprice"])

    def cy(batch: pa.Table) -> pa.Table:
        year = pc.cast(pc.year(batch.column("o_orderdate")), pa.int64())
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "year": year, "cents": pa.array(cents)})
        res = t.group_by(["o_custkey", "year"]).aggregate(
            [("cents", "sum")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "year": res.column("year"),
                         "cents": res.column("cents_sum")})

    per_cy = partial_aggregate(
        ds.map_batches(cy, batch_format="pyarrow"),
        ["o_custkey", "year"], [("cents", "sum", "cents")])

    def per_cust(group: pa.Table) -> pa.Table:
        yr = group.column("year").to_numpy(zero_copy_only=False)
        cents = group.column("cents").to_numpy(zero_copy_only=False)
        order = np.argsort(yr)
        yr, cents = yr[order], cents[order]
        years, news, churns, exps, cons = [], [], [], [], []
        for i in range(len(yr)):
            # contribution into year yr[i]+1 bucket (vs prior year)
            nxt = yr[i] + 1
            j = i + 1
            cur = cents[i]
            nxt_rev = cents[j] if j < len(yr) and yr[j] == nxt else 0
            if j < len(yr) and yr[j] == nxt:
                years.append(nxt)
                news.append(0)
                churns.append(0)
                exps.append(max(nxt_rev - cur, 0))
                cons.append(max(cur - nxt_rev, 0))
            else:
                years.append(nxt)
                news.append(0)
                churns.append(cur)
                exps.append(0)
                cons.append(0)
            prv = cents[i - 1] if i > 0 and yr[i - 1] == yr[i] - 1 else None
            if prv is None:
                years.append(yr[i])
                news.append(cur)
                churns.append(0)
                exps.append(0)
                cons.append(0)
        return pa.table({"year": pa.array(years, pa.int64()),
                         "new_cents": pa.array(news, pa.int64()),
                         "churned_cents": pa.array(churns, pa.int64()),
                         "expansion_cents": pa.array(exps, pa.int64()),
                         "contraction_cents": pa.array(cons,
                                                       pa.int64())})

    per = per_cy.groupby("o_custkey").map_groups(per_cust,
                                                 batch_format="pyarrow")
    return partial_aggregate(
        per, ["year"],
        [("new_cents", "sum", "new_cents"),
         ("churned_cents", "sum", "churned_cents"),
         ("expansion_cents", "sum", "expansion_cents"),
         ("contraction_cents", "sum", "contraction_cents")])


def order_total_allocation(sf_dir: str) -> ray.data.Dataset:
    """Largest-remainder (Hamilton) allocation: each order's total
    price in cents split across its lineitems proportional to extended
    price, floor first, the k largest remainders rounding up — the
    exact-money distribution primitive (Σ allocations ≡ order total).
    Allocation runs inside order groups (bucketed); allocated cents
    aggregate per returnflag."""
    from ..functions.joins import shuffle_lookup_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber",
                                     "l_extendedprice", "l_returnflag"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_totalprice"])
    joined = shuffle_lookup_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_linenumber", pa.int32()),
                               ("l_extendedprice", pa.float64()),
                               ("l_returnflag", pa.string())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_totalprice", pa.float64())]))

    def add_bucket(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        bkt = ((ok.astype(np.uint64) * _FIB64) >> np.uint64(56)) \
            .astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt))

    def allocate(group: pa.Table) -> pa.Table:
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = group.column("l_linenumber").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = np.rint(group.column("l_extendedprice")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        total = np.rint(group.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        flag = group.column("l_returnflag").to_numpy(zero_copy_only=False)
        order = np.lexsort((ln, ok))
        ok, ln, w, total, flag = (x[order] for x in
                                  (ok, ln, w, total, flag))
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, len(ok)])
        gid = np.repeat(np.arange(len(starts)), lens)
        wsum = np.zeros(len(starts), np.int64)
        np.add.at(wsum, gid, w)
        wsum_r = wsum[gid]
        tot_r = total
        base = (tot_r * w) // wsum_r
        rem = (tot_r * w) % wsum_r
        k = tot_r[starts] - np.add.reduceat(base, starts)
        # rank remainders desc, linenumber asc within order
        rr = np.lexsort((ln, -rem, gid))
        pos = np.empty(len(rr), np.int64)
        pos[rr] = np.arange(len(rr)) - np.repeat(starts, lens)[rr]
        alloc = base + (pos < k[gid])
        t = pa.table({"l_returnflag": pa.array(flag),
                      "allocated_cents": pa.array(alloc),
                      "n_lines": pa.array(np.ones(len(alloc),
                                                  np.int64))})
        res = t.group_by(["l_returnflag"]).aggregate(
            [("allocated_cents", "sum"), ("n_lines", "sum")])
        return pa.table({"l_returnflag": res.column("l_returnflag"),
                         "allocated_cents": res.column(
                             "allocated_cents_sum"),
                         "n_lines": res.column("n_lines_sum")})

    alloc = joined.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bkt").map_groups(allocate, batch_format="pyarrow")
    return partial_aggregate(
        alloc, ["l_returnflag"],
        [("allocated_cents", "sum", "allocated_cents"),
         ("n_lines", "sum", "n_lines")])


def quality_pass_by_length_decile(sf_dir: str) -> ray.data.Dataset:
    """Calibration curve: documents bucketed into global length deciles
    (exact boundaries via distributed selection), the quality-filter
    pass rate (floor ppm) per decile — does the filter correlate with
    length?  Boundaries broadcast; bucketing and the pass predicate run
    in one vectorized pass."""
    from ..functions.quantiles import exact_quantiles
    from ..functions.text import quality_filter_batch
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text", "n_chars"])
    qs = tuple(i / 10 for i in range(1, 10))
    bounds_t = exact_quantiles(
        ds.map_batches(lambda b: pa.table({
            "n_chars": pc.cast(b.column("n_chars"), pa.float64())}),
            batch_format="pyarrow"),
        "n_chars", qs=qs)
    bounds = np.array(sorted(bounds_t.column("value").to_pylist()),
                      np.float64)
    bref = ray.put(bounds)

    def bucketed(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        nch = batch.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        decile = np.searchsorted(b, nch, side="left").astype(np.int64)
        kept = quality_filter_batch(batch.select(["doc_id", "text"]))
        passed = np.zeros(len(batch), bool)
        passed[np.isin(batch.column("doc_id")
                       .to_numpy(zero_copy_only=False),
                       kept.column("doc_id")
                       .to_numpy(zero_copy_only=False))] = True
        t = pa.table({"decile": pa.array(decile),
                      "n_docs": pa.array(np.ones(len(batch), np.int64)),
                      "n_pass": pa.array(passed.astype(np.int64))})
        res = t.group_by(["decile"]).aggregate(
            [("n_docs", "sum"), ("n_pass", "sum")])
        return pa.table({"decile": res.column("decile"),
                         "n_docs": res.column("n_docs_sum"),
                         "n_pass": res.column("n_pass_sum")})

    agg = partial_aggregate(
        ds.map_batches(bucketed, batch_format="pyarrow"),
        ["decile"], [("n_docs", "sum", "n_docs"),
                     ("n_pass", "sum", "n_pass")])

    def ppm(batch: pa.Table) -> pa.Table:
        nd = batch.column("n_docs").to_numpy(zero_copy_only=False)
        npass = batch.column("n_pass").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "pass_ppm",
            pa.array((1_000_000 * npass) // np.where(nd == 0, 1, nd)))

    return agg.map_batches(ppm, batch_format="pyarrow")


def revenue_changepoint_day(sf_dir: str) -> ray.data.Dataset:
    """CUSUM-style change-point detection: the split day d maximizing
    |S_pre·n_post − S_post·n_pre| over the daily revenue series (exact
    bignum cross-multiply — no mean, no float).  Daily sums partial-
    aggregate; the argmax sweep folds on the calendar-bounded tail."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def daily(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("o_orderdate"), unit="day")
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"day": day, "cents": pa.array(cents),
                      "n": pa.array(np.ones(len(cents), np.int64))})
        res = t.group_by(["day"]).aggregate([("cents", "sum"),
                                             ("n", "sum")])
        return pa.table({"day": res.column("day"),
                         "cents": res.column("cents_sum"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(daily, batch_format="pyarrow"),
        ["day"], [("cents", "sum", "cents"), ("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    day = rows.column("day").to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]")
    cents = rows.column("cents").to_numpy(zero_copy_only=False)
    n = rows.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(day)
    day, cents, n = day[order], cents[order], n[order]
    total_s = int(cents.sum())
    total_n = int(n.sum())
    best_day, best_score = None, -1
    s_pre, n_pre = 0, 0
    for i in range(len(day) - 1):      # split AFTER day i; bignum-exact
        s_pre += int(cents[i])
        n_pre += int(n[i])
        score = abs(s_pre * (total_n - n_pre)
                    - (total_s - s_pre) * n_pre)
        if score > best_score:
            best_score = score
            best_day = day[i]
    return ray.data.from_arrow(pa.table({
        "split_day": pa.array([best_day], pa.timestamp("us")),
        "score": pa.array([float(best_score)], pa.float64()),
        "n_days": pa.array([len(day)], pa.int64())}))


def orders_fiscal_445_counts(sf_dir: str) -> ray.data.Dataset:
    """Custom-calendar bucketing: orders rolled up on the retail 4-4-5
    calendar (13 fiscal periods of 4, 4 and 5 weeks per 52-week fiscal
    year anchored at Monday 1994-12-26) — the calendar logic every
    retail warehouse carries; pure integer week arithmetic in both
    engines.  The anchor precedes all data so the week index never
    goes negative (numpy floors, SQL truncates)."""
    epoch = np.datetime64("1994-12-26", "D").astype(np.int64)
    # period start weeks within the 52-week year: cumsum of 4,4,5 ×4
    starts = np.cumsum([0] + [4, 4, 5] * 4)[:12]

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def bucket(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        w = (d - epoch) // 7
        fy = w // 52
        wk = w % 52
        period = np.searchsorted(starts, wk, side="right")  # 1..12
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"fiscal_year": pa.array(fy),
                      "period": pa.array(period.astype(np.int64)),
                      "n_orders": pa.array(np.ones(len(d), np.int64)),
                      "cents": pa.array(cents)})
        res = t.group_by(["fiscal_year", "period"]).aggregate(
            [("n_orders", "sum"), ("cents", "sum")])
        return pa.table({"fiscal_year": res.column("fiscal_year"),
                         "period": res.column("period"),
                         "n_orders": res.column("n_orders_sum"),
                         "cents": res.column("cents_sum")})

    return partial_aggregate(
        ds.map_batches(bucket, batch_format="pyarrow"),
        ["fiscal_year", "period"], [("n_orders", "sum", "n_orders"),
                                    ("cents", "sum", "cents")])


def sampled_topk_fidelity(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Sampling-accuracy audit: does the deterministic 1/16 document
    sample reproduce the exact corpus top-k tokens?  Both top-k sets
    compute with the same partial-agg machinery; the overlap count and
    floor-ppm Jaccard quantify sample fidelity."""
    from ..functions.text import deterministic_sample_batch
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def counts(dset):
        def tok(batch: pa.Table) -> pa.Table:
            flat = pc.list_flatten(pc.split_pattern(
                batch.column("text"), " "))
            t = pa.table({"tok": flat,
                          "n": pa.array(np.ones(len(flat), np.int64))})
            res = t.group_by(["tok"]).aggregate([("n", "sum")])
            return pa.table({"tok": res.column("tok"),
                             "n": res.column("n_sum")})
        return partial_aggregate(
            dset.map_batches(tok, batch_format="pyarrow"),
            ["tok"], [("n", "sum", "n")])

    exact = counts(ds).sort(["n", "tok"], descending=[True, False]) \
        .limit(k).take_all()
    sampled = counts(ds.map_batches(deterministic_sample_batch,
                                    batch_format="pyarrow")) \
        .sort(["n", "tok"], descending=[True, False]).limit(k).take_all()
    a = {r["tok"] for r in exact}
    b = {r["tok"] for r in sampled}
    inter = len(a & b)
    union = len(a | b)
    return ray.data.from_arrow(pa.table({
        "k": pa.array([k], pa.int64()),
        "n_overlap": pa.array([inter], pa.int64()),
        "jaccard_ppm": pa.array([(1_000_000 * inter)
                                 // max(union, 1)], pa.int64())}))


def user_decayed_value(sf_dir: str) -> ray.data.Dataset:
    """Recency-decayed engagement score: Σ cents >> age_days per user,
    halving per day of age relative to the GLOBAL max event day (bit
    shift = floor ·2⁻ᵃᵍᵉ, so the score is integer-exact).  The max day
    resolves in one tiny pre-pass; scoring is one vectorized pass."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])
    mx_parts = pa.concat_tables(list(
        ds.map_batches(lambda b: pa.table({
            "mx": pa.array([pc.max(b.column("ts")).as_py()],
                           pa.timestamp("us"))}), batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    max_day = int(np.datetime64(pc.max(mx_parts.column("mx")).as_py(),
                                "us").astype("datetime64[D]")
                  .astype(np.int64))

    def score(batch: pa.Table) -> pa.Table:
        day = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        age = np.minimum(max_day - day, 62)
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"user_id": batch.column("user_id"),
                      "decayed_cents": pa.array(cents >> age),
                      "n_events": pa.array(np.ones(len(day), np.int64))})
        res = t.group_by(["user_id"]).aggregate(
            [("decayed_cents", "sum"), ("n_events", "sum")])
        return pa.table({"user_id": res.column("user_id"),
                         "decayed_cents": res.column("decayed_cents_sum"),
                         "n_events": res.column("n_events_sum")})

    return partial_aggregate(
        ds.map_batches(score, batch_format="pyarrow"),
        ["user_id"], [("decayed_cents", "sum", "decayed_cents"),
                      ("n_events", "sum", "n_events")])


def daily_revenue_kmeans2(sf_dir: str, iters: int = 3
                          ) -> ray.data.Dataset:
    """1-D 2-means clustering of daily revenue (regime detection):
    centroids start at the series min/max, 3 Lloyd iterations with
    integer floor-mean centroids and midpoint assignment — fully
    deterministic, mirrored by the unrolled SQL oracle.  Daily sums
    partial-aggregate; Lloyd runs on the calendar-bounded series."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def daily(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("o_orderdate"), unit="day")
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"day": day, "cents": pa.array(cents)})
        res = t.group_by(["day"]).aggregate([("cents", "sum")])
        return pa.table({"day": res.column("day"),
                         "cents": res.column("cents_sum")})

    agg = partial_aggregate(
        ds.map_batches(daily, batch_format="pyarrow"),
        ["day"], [("cents", "sum", "cents")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    x = np.sort(rows.column("cents").to_numpy(zero_copy_only=False))
    c_lo, c_hi = int(x[0]), int(x[-1])
    for _ in range(iters):
        # assign by midpoint: lo cluster gets v where 2v <= lo+hi
        lo_mask = 2 * x <= c_lo + c_hi
        if lo_mask.any():
            c_lo = int(x[lo_mask].sum()) // int(lo_mask.sum())
        if (~lo_mask).any():
            c_hi = int(x[~lo_mask].sum()) // int((~lo_mask).sum())
    lo_mask = 2 * x <= c_lo + c_hi
    return ray.data.from_arrow(pa.table({
        "centroid_lo": pa.array([c_lo], pa.int64()),
        "centroid_hi": pa.array([c_hi], pa.int64()),
        "n_lo": pa.array([int(lo_mask.sum())], pa.int64()),
        "n_hi": pa.array([int((~lo_mask).sum())], pa.int64())}))


def token_anagram_groups(sf_dir: str) -> ray.data.Dataset:
    """Anagram detection over the corpus vocabulary: tokens bucket by
    their sorted-letter key; keys holding ≥2 DISTINCT tokens are
    anagram groups.  Distinct tokens reduce first (vocabulary-sized),
    the letter-sort runs per unique token, and only (key, token) pairs
    shuffle."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def toks(batch: pa.Table) -> pa.Table:
        flat = pc.unique(pc.list_flatten(
            pc.split_pattern(batch.column("text"), " ")))
        return pa.table({"tok": flat})

    vocab = partial_aggregate(
        ds.map_batches(toks, batch_format="pyarrow"), ["tok"], [])

    def keyed(batch: pa.Table) -> pa.Table:
        t = batch.column("tok").to_pylist()
        keys = ["".join(sorted(w)) for w in t]
        return pa.table({"akey": pa.array(keys, pa.string()),
                         "tok": batch.column("tok")})

    per_key = partial_aggregate(
        vocab.map_batches(keyed, batch_format="pyarrow"),
        ["akey", "tok"], [])

    def fold(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["akey"]).aggregate([("tok", "count")])
        return pa.table({"akey": res.column("akey"),
                         "n_tokens": pc.cast(res.column("tok_count"),
                                             pa.int64())})

    grouped = partial_aggregate(
        per_key.map_batches(fold, batch_format="pyarrow"),
        ["akey"], [("n_tokens", "sum", "n_tokens")])
    out = grouped.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n_tokens"), 2)),
        batch_format="pyarrow")
    seed = pa.table({"akey": pa.array([], pa.string()),
                     "n_tokens": pa.array([], pa.int64())})
    return pa.concat_tables(
        [seed] + [b.select(["akey", "n_tokens"])
                  for b in out.iter_batches(batch_format="pyarrow")])


def session_handoff_matrix(sf_dir: str, gap_seconds: int = 1800
                           ) -> ray.data.Dataset:
    """Cross-session transition matrix: the LAST event type of each
    session versus the FIRST type of the user's NEXT session — what do
    people come back to?  Per-user session folds emit the handoff
    pairs; the matrix reduce is a standard partial agg."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        t, ty = ts[order], types[order]
        brk = np.r_[0, np.flatnonzero(np.diff(t)
                                      > gap_seconds * 1_000_000) + 1,
                    len(t)]
        starts, ends = brk[:-1], brk[1:] - 1
        if len(starts) < 2:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "from_type": pa.array(ty[ends[:-1]]),
            "to_type": pa.array(ty[starts[1:]]),
            "n": pa.array(np.ones(len(starts) - 1, np.int64))})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    return partial_aggregate(per, ["from_type", "to_type"],
                             [("n", "sum", "n")])


def domestic_supply_share(sf_dir: str) -> ray.data.Dataset:
    """Trade localization: per customer nation, revenue supplied from
    the SAME nation versus total (floor ppm) — the Q5 join shape
    widened to a share.  Supplier/customer nation maps broadcast; the
    fact⋈fact orderkey link is one shuffle_lookup_join of partials."""
    from ..functions.joins import shuffle_lookup_join
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    side = ray.put((sup.column("s_suppkey").combine_chunks(),
                    pc.cast(sup.column("s_nationkey").combine_chunks(),
                            pa.int64()),
                    cust.column("c_custkey").combine_chunks(),
                    pc.cast(cust.column("c_nationkey").combine_chunks(),
                            pa.int64())))
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey",
                                     "l_extendedprice"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])

    def li_partial(batch: pa.Table) -> pa.Table:
        sk, snk, _, _ = ray.get(side)
        i = pc.index_in(batch.column("l_suppkey"), value_set=sk)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "supp_nk": pc.take(snk, i),
                      "cents": pa.array(cents)})
        res = t.group_by(["l_orderkey", "supp_nk"]).aggregate(
            [("cents", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "supp_nk": res.column("supp_nk"),
                         "cents": res.column("cents_sum")})

    def ord_nat(batch: pa.Table) -> pa.Table:
        _, _, ck, cnk = ray.get(side)
        i = pc.index_in(batch.column("o_custkey"), value_set=ck)
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "cust_nk": pc.take(cnk, i)})

    joined = shuffle_lookup_join(
        li.map_batches(li_partial, batch_format="pyarrow"),
        orders.map_batches(ord_nat, batch_format="pyarrow"),
        on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("supp_nk", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("cust_nk", pa.int64())]))

    def fold(batch: pa.Table) -> pa.Table:
        dom = pc.cast(pc.equal(batch.column("supp_nk"),
                               batch.column("cust_nk")), pa.int64())
        t = pa.table({
            "nationkey": batch.column("cust_nk"),
            "domestic_cents": pc.multiply(dom, batch.column("cents")),
            "total_cents": batch.column("cents")})
        res = t.group_by(["nationkey"]).aggregate(
            [("domestic_cents", "sum"), ("total_cents", "sum")])
        return pa.table({"nationkey": res.column("nationkey"),
                         "domestic_cents": res.column(
                             "domestic_cents_sum"),
                         "total_cents": res.column("total_cents_sum")})

    agg = partial_aggregate(
        joined.map_batches(fold, batch_format="pyarrow"),
        ["nationkey"], [("domestic_cents", "sum", "domestic_cents"),
                        ("total_cents", "sum", "total_cents")])

    def ppm(batch: pa.Table) -> pa.Table:
        d = batch.column("domestic_cents").to_numpy(zero_copy_only=False)
        t = batch.column("total_cents").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "domestic_ppm",
            pa.array((1_000_000 * d) // np.where(t == 0, 1, t)))

    return agg.map_batches(ppm, batch_format="pyarrow")


def dataset_split_manifest(sf_dir: str) -> ray.data.Dataset:
    """Deterministic 80/10/10 train/val/test assignment by document-id
    hash (first md5 byte mod 10: 0-7 train, 8 val, 9 test), manifested
    per language — the reproducible-split bookkeeping every ML corpus
    needs; membership is a pure function of the id, so re-runs and
    backfills land identically."""
    import hashlib
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        b = np.fromiter(
            (int(hashlib.md5(str(d).encode()).hexdigest()[:2], 16) % 10
             for d in ids), np.int64, count=len(ids))
        split = np.where(b < 8, "train", np.where(b == 8, "val", "test"))
        t = pa.table({"lang": batch.column("lang"),
                      "split": pa.array(split),
                      "n_docs": pa.array(np.ones(len(ids), np.int64))})
        res = t.group_by(["lang", "split"]).aggregate([("n_docs", "sum")])
        return pa.table({"lang": res.column("lang"),
                         "split": res.column("split"),
                         "n_docs": res.column("n_docs_sum")})

    return partial_aggregate(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["lang", "split"], [("n_docs", "sum", "n_docs")])


def lineitem_sync_manifest(sf_dir: str, chunk_orders: int = 10_000
                           ) -> ray.data.Dataset:
    """Incremental-replication manifest: per orderkey-range chunk the
    row count, XOR row-checksum and shipdate envelope — enough for a
    consumer to detect WHICH chunks changed and re-pull only those.
    Everything folds per chunk; no global exchange of row data."""
    import hashlib
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber",
                                     "l_quantity", "l_shipdate"])

    def per_batch(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = batch.column("l_linenumber").to_numpy(zero_copy_only=False)
        q = np.rint(batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        chunk = ok // chunk_orders
        cs = np.fromiter(
            (int(hashlib.md5(f"{a}|{b}|{c}".encode()).hexdigest()[:15],
                 16) for a, b, c in zip(ok, ln, q)),
            np.int64, count=len(ok))
        t = pa.table({"chunk": pa.array(chunk),
                      "xr": pa.array(cs),
                      "n_rows": pa.array(np.ones(len(ok), np.int64)),
                      "ship": batch.column("l_shipdate")})
        # XOR folds per chunk via numpy (Arrow has no xor aggregate)
        order = np.argsort(chunk, kind="stable")
        ch = chunk[order]
        starts = np.flatnonzero(np.r_[True, ch[1:] != ch[:-1]])
        xor = np.array([np.bitwise_xor.reduce(cs[order][s:e])
                        for s, e in zip(starts, np.r_[starts[1:],
                                                      len(ch)])],
                       np.int64)
        res = t.group_by(["chunk"]).aggregate(
            [("n_rows", "sum"), ("ship", "min"), ("ship", "max")])
        # align xor to the group_by row order
        gb_chunks = res.column("chunk").to_numpy(zero_copy_only=False)
        xmap = dict(zip(ch[starts].tolist(), xor.tolist()))
        return pa.table({
            "chunk": res.column("chunk"),
            "n_rows": res.column("n_rows_sum"),
            "checksum": pa.array([xmap[int(c)] for c in gb_chunks],
                                 pa.int64()),
            "min_ship": res.column("ship_min"),
            "max_ship": res.column("ship_max")})

    per = ds.map_batches(per_batch, batch_format="pyarrow")

    def fold(group: pa.Table) -> pa.Table:
        xs = group.column("checksum").to_numpy(zero_copy_only=False)
        return pa.table({
            "chunk": group.column("chunk").slice(0, 1),
            "n_rows": pa.array([int(pc.sum(
                group.column("n_rows")).as_py())], pa.int64()),
            "checksum": pa.array([int(np.bitwise_xor.reduce(xs))],
                                 pa.int64()),
            "min_ship": pa.array([pc.min(group.column("min_ship"))
                                  .as_py()], pa.timestamp("us")),
            "max_ship": pa.array([pc.max(group.column("max_ship"))
                                  .as_py()], pa.timestamp("us"))})

    return per.groupby("chunk").map_groups(fold, batch_format="pyarrow")


def session_count_sweep(sf_dir: str, gaps_minutes=(5, 15, 30, 60)
                        ) -> ray.data.Dataset:
    """Hyperparameter sweep in ONE scan: total session counts at four
    gap thresholds simultaneously — each user's sorted gap vector
    answers every threshold with one searchsorted, so tuning the
    sessionizer costs one pass instead of four."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = np.sort(group.column("ts").to_numpy(zero_copy_only=False)
                     .astype("datetime64[us]").astype(np.int64))
        gaps = np.sort(np.diff(ts))
        out_g, out_n = [], []
        for gm in gaps_minutes:
            thr = gm * 60 * 1_000_000
            n_breaks = len(gaps) - np.searchsorted(gaps, thr,
                                                   side="right")
            out_g.append(gm)
            out_n.append(1 + int(n_breaks) if len(ts) else 0)
        return pa.table({"gap_minutes": pa.array(out_g, pa.int64()),
                         "n_sessions": pa.array(out_n, pa.int64())})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    return partial_aggregate(per, ["gap_minutes"],
                             [("n_sessions", "sum", "n_sessions")])


def customer_supplier_diversity_hist(sf_dir: str) -> ray.data.Dataset:
    """Supply-base diversity: distinct suppliers each customer has
    bought from, folded to a histogram — the fan-out profile of the
    customer⇄supplier bipartite graph.  Distinct (cust, supp) pairs
    reduce through the one fact⋈fact link."""
    from ..functions.joins import shuffle_lookup_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])

    def li_pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["l_orderkey", "l_suppkey"]) \
            .aggregate([]).select(["l_orderkey", "l_suppkey"])

    joined = shuffle_lookup_join(
        li.map_batches(li_pairs, batch_format="pyarrow"),
        orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("l_suppkey", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]))

    def cs_pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["o_custkey", "l_suppkey"]) \
            .aggregate([]).select(["o_custkey", "l_suppkey"])

    distinct = partial_aggregate(
        joined.map_batches(cs_pairs, batch_format="pyarrow"),
        ["o_custkey", "l_suppkey"], [])

    def per_cust(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["o_custkey"]).aggregate(
            [("o_custkey", "count")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "n_suppliers": pc.cast(
                             res.column("o_custkey_count"), pa.int64())})

    per = partial_aggregate(
        distinct.map_batches(per_cust, batch_format="pyarrow"),
        ["o_custkey"], [("n_suppliers", "sum", "n_suppliers")])

    def hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"n_suppliers": batch.column("n_suppliers"),
                      "n_customers": pa.array(np.ones(len(batch),
                                                      np.int64))})
        res = t.group_by(["n_suppliers"]).aggregate(
            [("n_customers", "sum")])
        return pa.table({"n_suppliers": res.column("n_suppliers"),
                         "n_customers": res.column("n_customers_sum")})

    return partial_aggregate(
        per.map_batches(hist, batch_format="pyarrow"),
        ["n_suppliers"], [("n_customers", "sum", "n_customers")])


def corpus_lang_run_count(sf_dir: str) -> ray.data.Dataset:
    """Corpus-layout homogeneity: number of maximal same-lang RUNS in
    global doc_id order, computed WITHOUT a global sort — each (id,
    lang) row re-keys to id+1 and joins its successor (the key-shift
    join), so run breaks count wherever adjacent langs differ; block
    boundaries never matter."""
    from ..functions.joins import shuffle_lookup_join
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang"])

    left = ds.map_batches(
        lambda b: pa.table({
            "nxt_id": pc.add(b.column("doc_id"), 1),
            "lang": b.column("lang")}), batch_format="pyarrow")
    right = ds.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id"),
                            "nxt_lang": b.column("lang")}),
        batch_format="pyarrow")
    joined = shuffle_lookup_join(
        left, right, on="nxt_id", right_on="doc_id",
        left_schema=pa.schema([("nxt_id", pa.int64()),
                               ("lang", pa.string())]),
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("nxt_lang", pa.string())]))

    def breaks(batch: pa.Table) -> pa.Table:
        diff = pc.cast(pc.not_equal(batch.column("lang"),
                                    batch.column("nxt_lang")),
                       pa.int64())
        return pa.table({
            "n_breaks": pa.array([int(pc.sum(diff).as_py() or 0)],
                                 pa.int64()),
            "n_adjacent": pa.array([len(batch)], pa.int64())})

    parts = pa.concat_tables(list(
        joined.map_batches(breaks, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    nb = int(pc.sum(parts.column("n_breaks")).as_py() or 0)
    na = int(pc.sum(parts.column("n_adjacent")).as_py() or 0)
    counts = pa.concat_tables(list(
        ds.map_batches(lambda b: pa.table({
            "n": pa.array([len(b)], pa.int64())}),
            batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    n_docs = int(pc.sum(counts.column("n")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_adjacent_pairs": pa.array([na], pa.int64()),
        "n_runs": pa.array([n_docs - na + nb], pa.int64())}))


def order_ship_atomicity(sf_dir: str) -> ray.data.Dataset:
    """Group-level all-equal audit: of multi-line orders, how many ship
    every line on the SAME day (atomic fulfillment)?  Per-order
    distinct-shipdate counts fold from (order, day) pair partials —
    min=max carries the all-equal predicate through the exchange."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])

    def partials(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("l_shipdate"), unit="day")
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "mn": day, "mx": day,
                      "n_lines": pa.array(np.ones(len(batch),
                                                  np.int64))})
        res = t.group_by(["l_orderkey"]).aggregate(
            [("mn", "min"), ("mx", "max"), ("n_lines", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "mn": res.column("mn_min"),
                         "mx": res.column("mx_max"),
                         "n_lines": res.column("n_lines_sum")})

    agg = partial_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["l_orderkey"], [("mn", "min", "mn"), ("mx", "max", "mx"),
                         ("n_lines", "sum", "n_lines")])

    def fold(batch: pa.Table) -> pa.Table:
        multi = pc.greater(batch.column("n_lines"), 1)
        atomic = pc.and_(multi, pc.equal(batch.column("mn"),
                                         batch.column("mx")))
        nm = int(pc.sum(pc.cast(multi, pa.int64())).as_py() or 0)
        na = int(pc.sum(pc.cast(atomic, pa.int64())).as_py() or 0)
        return pa.table({"n_multi": pa.array([nm], pa.int64()),
                         "n_atomic": pa.array([na], pa.int64())})

    parts = pa.concat_tables(list(
        agg.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    nm = int(pc.sum(parts.column("n_multi")).as_py() or 0)
    na = int(pc.sum(parts.column("n_atomic")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "n_multi": pa.array([nm], pa.int64()),
        "n_atomic": pa.array([na], pa.int64()),
        "atomic_ppm": pa.array([(1_000_000 * na) // max(nm, 1)],
                               pa.int64())}))


def purchase_attribution_models(sf_dir: str, window_hours: int = 24
                                ) -> ray.data.Dataset:
    """First-touch vs last-touch attribution: each purchase's cents
    credit the FIRST and LAST non-purchase event type in the preceding
    24 h window — two marketing models from ONE per-user vectorized
    pass (searchsorted for the window start, running last-seen for the
    touch)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type", "value"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_numpy(zero_copy_only=False)
        cents = np.rint(group.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        order = np.lexsort((eid, ts))
        t, ty, c = ts[order], types[order], cents[order]
        w = window_hours * 3_600_000_000
        is_p = ty == "purchase"
        ft, lt, amt = [], [], []
        non_p_idx = np.flatnonzero(~is_p)
        for i in np.flatnonzero(is_p):
            lo = t[i] - w
            # candidate non-purchase events in [lo, t_i) by position
            cand = non_p_idx[(non_p_idx < i)]
            cand = cand[t[cand] >= lo]
            if len(cand) == 0:
                continue
            ft.append(ty[cand[0]])
            lt.append(ty[cand[-1]])
            amt.append(int(c[i]))
        if not ft:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "first_touch_cents": pa.array([], pa.int64()),
                "last_touch_cents": pa.array([], pa.int64())})
        tt = pa.table({"event_type": pa.array(ft + lt),
                       "first_touch_cents": pa.array(
                           amt + [0] * len(lt), pa.int64()),
                       "last_touch_cents": pa.array(
                           [0] * len(ft) + amt, pa.int64())})
        res = tt.group_by(["event_type"]).aggregate(
            [("first_touch_cents", "sum"), ("last_touch_cents", "sum")])
        return pa.table({"event_type": res.column("event_type"),
                         "first_touch_cents": res.column(
                             "first_touch_cents_sum"),
                         "last_touch_cents": res.column(
                             "last_touch_cents_sum")})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    return partial_aggregate(
        per, ["event_type"],
        [("first_touch_cents", "sum", "first_touch_cents"),
         ("last_touch_cents", "sum", "last_touch_cents")])


def cumulative_unique_users(sf_dir: str) -> ray.data.Dataset:
    """Audience accumulation curve: per day the count of FIRST-EVER
    users and the running total of unique users to date — each user
    contributes exactly one (first-day) row, daily counts reduce, the
    prefix sum folds on the calendar-bounded tail."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def per_batch(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"user_id": batch.column("user_id"), "day": day})
        res = t.group_by(["user_id"]).aggregate([("day", "min")])
        return pa.table({"user_id": res.column("user_id"),
                         "first_day": res.column("day_min")})

    first = partial_aggregate(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        ["user_id"], [("first_day", "min", "first_day")])

    def daily(batch: pa.Table) -> pa.Table:
        t = pa.table({"day": batch.column("first_day"),
                      "n_new": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["day"]).aggregate([("n_new", "sum")])
        return pa.table({"day": res.column("day"),
                         "n_new": res.column("n_new_sum")})

    agg = partial_aggregate(
        first.map_batches(daily, batch_format="pyarrow"),
        ["day"], [("n_new", "sum", "n_new")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    day = rows.column("day").to_numpy(zero_copy_only=False)
    n = rows.column("n_new").to_numpy(zero_copy_only=False)
    order = np.argsort(day)
    day, n = day[order], n[order]
    return ray.data.from_arrow(pa.table({
        "day": pa.array(day),
        "n_new": pa.array(n),
        "cum_users": pa.array(np.cumsum(n))}))


def brand_return_rate_top10(sf_dir: str) -> ray.data.Dataset:
    """Return-rate leaderboard: lineitem return share (flag 'R', floor
    ppm) per part brand, top 10 by rate — the QA ranking that flags
    problem suppliers.  Brand keys broadcast; counts reduce per
    brand."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_returnflag"])
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    pref = ray.put((part.column("p_partkey").combine_chunks(),
                    part.column("p_brand").combine_chunks()))

    def counts(batch: pa.Table) -> pa.Table:
        pk, pb = ray.get(pref)
        i = pc.index_in(batch.column("l_partkey"), value_set=pk)
        ret = pc.cast(pc.equal(batch.column("l_returnflag"), "R"),
                      pa.int64())
        t = pa.table({"p_brand": pc.take(pb, i),
                      "n_lines": pa.array(np.ones(len(batch),
                                                  np.int64)),
                      "n_returned": ret})
        res = t.group_by(["p_brand"]).aggregate(
            [("n_lines", "sum"), ("n_returned", "sum")])
        return pa.table({"p_brand": res.column("p_brand"),
                         "n_lines": res.column("n_lines_sum"),
                         "n_returned": res.column("n_returned_sum")})

    agg = partial_aggregate(
        li.map_batches(counts, batch_format="pyarrow"),
        ["p_brand"], [("n_lines", "sum", "n_lines"),
                      ("n_returned", "sum", "n_returned")])

    def ppm(batch: pa.Table) -> pa.Table:
        nl = batch.column("n_lines").to_numpy(zero_copy_only=False)
        nr = batch.column("n_returned").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "return_ppm",
            pa.array((1_000_000 * nr) // np.where(nl == 0, 1, nl)))

    return agg.map_batches(ppm, batch_format="pyarrow") \
        .sort(["return_ppm", "p_brand"], descending=[True, False]) \
        .limit(10)


def join_size_bucket_estimate(sf_dir: str, n_buckets: int = 16
                              ) -> ray.data.Dataset:
    """Planner-statistics accuracy audit: the textbook bucketed
    SELF-join-size estimate Σ_b n_b²/d_b (n = rows, d = distinct keys
    per bucket, uniformity assumed) versus the EXACT lineitem⋈lineitem
    orderkey cardinality Σ_k c_k² — how wrong is a 16-bucket histogram
    when keys are skewed?  Bucket stats and per-key counts both fold
    from partials; the error reports as floor ppm."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey"])

    def key_counts(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["l_orderkey"]).aggregate([("n", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "n": res.column("n_sum")})

    per_key = partial_aggregate(
        li.map_batches(key_counts, batch_format="pyarrow"),
        ["l_orderkey"], [("n", "sum", "n")])

    def fold(batch: pa.Table) -> pa.Table:
        k = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        b = k % n_buckets
        t = pa.table({"b": pa.array(b), "nl": pa.array(n),
                      "dl": pa.array(np.ones(len(k), np.int64)),
                      "sq": pa.array(n * n)})
        res = t.group_by(["b"]).aggregate(
            [("nl", "sum"), ("dl", "sum"), ("sq", "sum")])
        return pa.table({"b": res.column("b"),
                         "nl": res.column("nl_sum"),
                         "dl": res.column("dl_sum"),
                         "sq": res.column("sq_sum")})

    bt = pa.concat_tables(list(partial_aggregate(
        per_key.map_batches(fold, batch_format="pyarrow"),
        ["b"], [("nl", "sum", "nl"), ("dl", "sum", "dl"),
                ("sq", "sum", "sq")])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    est = sum((int(nl) * int(nl)) // max(int(dl), 1)
              for nl, dl in zip(bt.column("nl").to_pylist(),
                                bt.column("dl").to_pylist()))
    exact = int(sum(bt.column("sq").to_pylist()))
    err_ppm = (1_000_000 * abs(est - exact)) // max(exact, 1)
    return ray.data.from_arrow(pa.table({
        "est_rows": pa.array([est], pa.int64()),
        "exact_rows": pa.array([exact], pa.int64()),
        "err_ppm": pa.array([err_ppm], pa.int64())}))


def customer_lorenz_curve(sf_dir: str) -> ray.data.Dataset:
    """Lorenz concentration curve: customers sorted by total revenue
    ascending, the cumulative revenue share (floor ppm) held by the
    poorest k/10 of customers for k = 1..10 — the inequality curve
    behind the Gini.  Per-customer totals reduce; the curve folds on
    the customer-bounded table."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])

    def totals(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "cents": pa.array(cents)})
        res = t.group_by(["o_custkey"]).aggregate([("cents", "sum")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "cents": res.column("cents_sum")})

    agg = partial_aggregate(
        ds.map_batches(totals, batch_format="pyarrow"),
        ["o_custkey"], [("cents", "sum", "cents")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    ck = rows.column("o_custkey").to_numpy(zero_copy_only=False)
    cents = rows.column("cents").to_numpy(zero_copy_only=False)
    order = np.lexsort((ck, cents))
    c = cents[order]
    total = int(c.sum())
    n = len(c)
    cum = np.cumsum(c)
    ks, shares = [], []
    for k in range(1, 11):
        idx = (k * n) // 10
        ks.append(k)
        shares.append((1_000_000 * int(cum[idx - 1])) // max(total, 1)
                      if idx else 0)
    return ray.data.from_arrow(pa.table({
        "decile": pa.array(ks, pa.int64()),
        "cum_share_ppm": pa.array(shares, pa.int64())}))


def order_line_concentration_hist(sf_dir: str) -> ray.data.Dataset:
    """Intra-order concentration: each order's top-line revenue share
    (floor ppm of max line over order revenue) bucketed per 100k ppm —
    the group-level ratio histogram (is an order ONE big item or many
    small ones?)."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_extendedprice"])

    def partials(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "mx": pa.array(cents), "s": pa.array(cents)})
        res = t.group_by(["l_orderkey"]).aggregate(
            [("mx", "max"), ("s", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "mx": res.column("mx_max"),
                         "s": res.column("s_sum")})

    agg = partial_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["l_orderkey"], [("mx", "max", "mx"), ("s", "sum", "s")])

    def hist(batch: pa.Table) -> pa.Table:
        mx = batch.column("mx").to_numpy(zero_copy_only=False)
        s = batch.column("s").to_numpy(zero_copy_only=False)
        ppm = (1_000_000 * mx) // np.where(s == 0, 1, s)
        bucket = ppm // 100_000
        t = pa.table({"bucket": pa.array(bucket),
                      "n_orders": pa.array(np.ones(len(mx), np.int64))})
        res = t.group_by(["bucket"]).aggregate([("n_orders", "sum")])
        return pa.table({"bucket": res.column("bucket"),
                         "n_orders": res.column("n_orders_sum")})

    return partial_aggregate(
        agg.map_batches(hist, batch_format="pyarrow"),
        ["bucket"], [("n_orders", "sum", "n_orders")])


def revenue_multiscale_variance(sf_dir: str) -> ray.data.Dataset:
    """Multi-resolution variance profile: the integer variance
    numerator n·Σx²−S² of revenue series at DAY, WEEK and MONTH grain
    from one scan (three bucketings per batch) — how much structure
    does each aggregation level smooth away?"""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def buckets(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        outs = []
        for grain in ("day", "week", "month"):
            g = pc.floor_temporal(batch.column("o_orderdate"),
                                  unit=grain)
            t = pa.table({"grain": pa.array([grain] * len(cents),
                                            pa.string()),
                          "bucket": g, "cents": pa.array(cents)})
            outs.append(t.group_by(["grain", "bucket"]).aggregate(
                [("cents", "sum")]))
        merged = pa.concat_tables(outs)
        return pa.table({"grain": merged.column("grain"),
                         "bucket": merged.column("bucket"),
                         "cents": merged.column("cents_sum")})

    agg = partial_aggregate(
        ds.map_batches(buckets, batch_format="pyarrow"),
        ["grain", "bucket"], [("cents", "sum", "cents")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    grains = rows.column("grain").to_numpy(zero_copy_only=False)
    cents = rows.column("cents").to_numpy(zero_copy_only=False)
    out_g, out_n, out_var = [], [], []
    for g in ("day", "week", "month"):
        x = cents[grains == g]
        n = len(x)
        s = int(x.sum())
        ss = sum(int(v) * int(v) for v in x)
        out_g.append(g)
        out_n.append(n)
        # exact decimal string: n·Σx²−S² exceeds 2^53, and int→float64
        # rounding differs from DuckDB's HUGEINT→DOUBLE by 1 ULP
        out_var.append(str(n * ss - s * s))
    return ray.data.from_arrow(pa.table({
        "grain": pa.array(out_g, pa.string()),
        "n_buckets": pa.array(out_n, pa.int64()),
        "var_num": pa.array(out_var, pa.string())}))


def rapid_event_share(sf_dir: str, window_seconds: int = 60
                      ) -> ray.data.Dataset:
    """Burst share: events arriving within 60 s of the user's previous
    event — the machine-traffic smell test — with count and value
    share, folded per user then globally."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "value"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        cents = np.rint(group.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        order = np.lexsort((eid, ts))
        t, c = ts[order], cents[order]
        rapid = np.zeros(len(t), bool)
        rapid[1:] = np.diff(t) <= window_seconds * 1_000_000
        return pa.table({
            "n_events": pa.array([len(t)], pa.int64()),
            "n_rapid": pa.array([int(rapid.sum())], pa.int64()),
            "rapid_cents": pa.array([int(c[rapid].sum())], pa.int64()),
            "total_cents": pa.array([int(c.sum())], pa.int64())})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    rows = pa.concat_tables(list(per.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    out = {c: pa.array([int(pc.sum(rows.column(c)).as_py() or 0)],
                       pa.int64())
           for c in ("n_events", "n_rapid", "rapid_cents",
                     "total_cents")}
    return ray.data.from_arrow(pa.table(out))


def revenue_up_down_streaks(sf_dir: str) -> ray.data.Dataset:
    """Momentum streaks: the longest runs of consecutive CALENDAR days
    with strictly increasing and strictly decreasing revenue (gap days
    break streaks) — folded on the calendar-bounded daily series."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def daily(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("o_orderdate"), unit="day")
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"day": day, "cents": pa.array(cents)})
        res = t.group_by(["day"]).aggregate([("cents", "sum")])
        return pa.table({"day": res.column("day"),
                         "cents": res.column("cents_sum")})

    agg = partial_aggregate(
        ds.map_batches(daily, batch_format="pyarrow"),
        ["day"], [("cents", "sum", "cents")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    day = rows.column("day").to_numpy(zero_copy_only=False) \
        .astype("datetime64[D]").astype(np.int64)
    cents = rows.column("cents").to_numpy(zero_copy_only=False)
    order = np.argsort(day)
    day, cents = day[order], cents[order]
    adjacent = np.diff(day) == 1
    up = adjacent & (np.diff(cents) > 0)
    down = adjacent & (np.diff(cents) < 0)

    def longest(mask: np.ndarray) -> int:
        best = cur = 0
        for m in mask:
            cur = cur + 1 if m else 0
            best = max(best, cur)
        return best

    return ray.data.from_arrow(pa.table({
        "longest_up_days": pa.array([longest(up)], pa.int64()),
        "longest_down_days": pa.array([longest(down)], pa.int64()),
        "n_days": pa.array([len(day)], pa.int64())}))


def brand_size_grid_sparsity(sf_dir: str) -> ray.data.Dataset:
    """Cross-dimension coverage audit: of the brand × size grid, how
    many combinations actually exist in the catalog (sparsity floor
    ppm)?  Distinct pairs and per-dimension distincts all reduce from
    batch partials."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_brand", "p_size"])

    def pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["p_brand", "p_size"]).aggregate([]) \
            .select(["p_brand", "p_size"])

    distinct = partial_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["p_brand", "p_size"], [])
    rows = pa.concat_tables(list(distinct.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    brands = len(set(rows.column("p_brand").to_pylist()))
    sizes = len(set(rows.column("p_size").to_pylist()))
    occupied = len(rows)
    possible = brands * sizes
    return ray.data.from_arrow(pa.table({
        "n_brands": pa.array([brands], pa.int64()),
        "n_sizes": pa.array([sizes], pa.int64()),
        "n_occupied": pa.array([occupied], pa.int64()),
        "occupancy_ppm": pa.array(
            [(1_000_000 * occupied) // max(possible, 1)], pa.int64())}))


def transition_time_matrix(sf_dir: str) -> pa.Table:
    """Transition TIMING: for every adjacent event-type pair in a
    user's stream, the exact lower-median gap (µs) and pair count —
    which handoffs are fast, which stall?  Gaps materialize per user,
    re-key by the (from, to) pair, and the grouped histogram-selection
    finds each pair's median without sorting raw gaps."""
    from ..functions.quantiles import grouped_exact_quantiles
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def gaps(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        t, ty = ts[order], types[order]
        if len(t) < 2:
            return pa.table({"pair": pa.array([], pa.string()),
                             "gap_us": pa.array([], pa.float64())})
        pair = np.char.add(np.char.add(ty[:-1].astype(str), ">"),
                           ty[1:].astype(str))
        return pa.table({"pair": pa.array(pair),
                         "gap_us": pa.array(np.diff(t)
                                            .astype(np.float64))})

    gap_ds = ds.groupby("user_id").map_groups(gaps,
                                              batch_format="pyarrow")
    return grouped_exact_quantiles(gap_ds, "pair", "gap_us", qs=(0.5,))


def hierarchy_share_report(sf_dir: str) -> ray.data.Dataset:
    """Parent-relative rollup: each nation's order revenue as floor-ppm
    of its REGION, and each region as floor-ppm of the GLOBAL total —
    the share-of-parent report a hierarchy UI renders.  Dimension maps
    broadcast; one fact pass feeds every level."""
    from ..functions.joins import shuffle_lookup_join
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name",
                                    "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    side = ray.put((cust.column("c_custkey").combine_chunks(),
                    pc.cast(cust.column("c_nationkey").combine_chunks(),
                            pa.int64())))
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])

    def per_nation(batch: pa.Table) -> pa.Table:
        ck, cnk = ray.get(side)
        i = pc.index_in(batch.column("o_custkey"), value_set=ck)
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"nationkey": pc.take(cnk, i),
                      "cents": pa.array(cents)})
        res = t.group_by(["nationkey"]).aggregate([("cents", "sum")])
        return pa.table({"nationkey": res.column("nationkey"),
                         "cents": res.column("cents_sum")})

    agg = partial_aggregate(
        orders.map_batches(per_nation, batch_format="pyarrow"),
        ["nationkey"], [("cents", "sum", "cents")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    nk = rows.column("nationkey").to_numpy(zero_copy_only=False)
    cents = rows.column("cents").to_numpy(zero_copy_only=False)
    n_nk = pc.cast(nation.column("n_nationkey"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_rk = pc.cast(nation.column("n_regionkey"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    n_names = np.asarray(nation.column("n_name").to_pylist())
    r_rk = pc.cast(region.column("r_regionkey"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    r_names = np.asarray(region.column("r_name").to_pylist())
    rk_of = dict(zip(n_nk.tolist(), n_rk.tolist()))
    nname_of = dict(zip(n_nk.tolist(), n_names.tolist()))
    rname_of = dict(zip(r_rk.tolist(), r_names.tolist()))
    region_cents = {}
    for k, c in zip(nk.tolist(), cents.tolist()):
        region_cents[rk_of[k]] = region_cents.get(rk_of[k], 0) + int(c)
    total = sum(region_cents.values())
    levels, keys, parents, vals, shares = [], [], [], [], []
    for k, c in sorted(zip(nk.tolist(), cents.tolist())):
        levels.append("nation")
        keys.append(nname_of[k])
        parents.append(rname_of[rk_of[k]])
        vals.append(int(c))
        shares.append((1_000_000 * int(c))
                      // max(region_cents[rk_of[k]], 1))
    for rk in sorted(region_cents):
        levels.append("region")
        keys.append(rname_of[rk])
        parents.append("ALL")
        vals.append(region_cents[rk])
        shares.append((1_000_000 * region_cents[rk]) // max(total, 1))
    return ray.data.from_arrow(pa.table({
        "level": pa.array(levels, pa.string()),
        "key": pa.array(keys, pa.string()),
        "parent": pa.array(parents, pa.string()),
        "cents": pa.array(vals, pa.int64()),
        "share_of_parent_ppm": pa.array(shares, pa.int64())}))


def month_end_revenue_share(sf_dir: str) -> ray.data.Dataset:
    """Calendar-edge bias: the share (floor ppm) of each year's order
    revenue booked in the LAST THREE calendar days of a month — the
    quota-stuffing audit.  Month-end membership is pure date
    arithmetic inside the batch."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def partials(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        year = pc.cast(pc.year(d), pa.int64())
        dd = d.to_numpy(zero_copy_only=False).astype("datetime64[D]")
        m = dd.astype("datetime64[M]")
        # days in month via month arithmetic (ceil_temporal is a no-op
        # on the boundary, so day-1 rows would see a 0-day month)
        dim = ((m + 1).astype("datetime64[D]")
               - m.astype("datetime64[D]")).astype(np.int64)
        dom = (dd - m.astype("datetime64[D]")).astype(np.int64) + 1
        is_end = (dom > dim - 3).astype(np.int64)
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"year": year,
                      "end_cents": pa.array(is_end * cents),
                      "total_cents": pa.array(cents)})
        res = t.group_by(["year"]).aggregate(
            [("end_cents", "sum"), ("total_cents", "sum")])
        return pa.table({"year": res.column("year"),
                         "end_cents": res.column("end_cents_sum"),
                         "total_cents": res.column("total_cents_sum")})

    agg = partial_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["year"], [("end_cents", "sum", "end_cents"),
                   ("total_cents", "sum", "total_cents")])

    def ppm(batch: pa.Table) -> pa.Table:
        e = batch.column("end_cents").to_numpy(zero_copy_only=False)
        t = batch.column("total_cents").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "month_end_ppm",
            pa.array((1_000_000 * e) // np.where(t == 0, 1, t)))

    return agg.map_batches(ppm, batch_format="pyarrow")


def user_staleness_hist(sf_dir: str) -> ray.data.Dataset:
    """Engagement staleness: per user, days since their LAST event
    relative to the global max day, folded to a histogram — the churn
    monitor's age pyramid."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def per_batch(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch.column("user_id"),
                      "last_ts": batch.column("ts")})
        res = t.group_by(["user_id"]).aggregate([("last_ts", "max")])
        return pa.table({"user_id": res.column("user_id"),
                         "last_ts": res.column("last_ts_max")})

    last = partial_aggregate(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        ["user_id"], [("last_ts", "max", "last_ts")])
    rows = pa.concat_tables(list(last.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    lt = rows.column("last_ts").to_numpy(zero_copy_only=False) \
        .astype("datetime64[D]").astype(np.int64)
    mx = int(lt.max()) if len(lt) else 0
    stale = mx - lt
    vals, counts = np.unique(stale, return_counts=True)
    return ray.data.from_arrow(pa.table({
        "days_stale": pa.array(vals.astype(np.int64)),
        "n_users": pa.array(counts.astype(np.int64))}))


def unit_price_deviation_hist(sf_dir: str) -> ray.data.Dataset:
    """Pricing reconciliation: each lineitem's deviation (floor ppm)
    of extended price from catalog retail × quantity, bucketed per
    100k ppm with FLOOR semantics on the signed value — the invoice
    audit that surfaces systematic over/under-billing.  Part prices
    broadcast; the deviation is one vectorized pass."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_quantity",
                                     "l_extendedprice"])
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_retailprice"])
    pref = ray.put((part.column("p_partkey").combine_chunks(),
                    np.rint(part.column("p_retailprice")
                            .to_numpy(zero_copy_only=False) * 100)
                    .astype(np.int64)))

    def hist(batch: pa.Table) -> pa.Table:
        pk, retail = ray.get(pref)
        i = pc.index_in(batch.column("l_partkey"), value_set=pk) \
            .to_numpy(zero_copy_only=False)
        qty = np.rint(batch.column("l_quantity")
                      .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        ext = np.rint(batch.column("l_extendedprice")
                      .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        expected = (retail[i] * qty) // 100
        dev_ppm = (1_000_000 * (ext - expected)) \
            // np.where(expected == 0, 1, expected)
        bucket = dev_ppm // 100_000          # numpy floors negatives
        t = pa.table({"bucket": pa.array(bucket),
                      "n_lines": pa.array(np.ones(len(ext), np.int64))})
        res = t.group_by(["bucket"]).aggregate([("n_lines", "sum")])
        return pa.table({"bucket": res.column("bucket"),
                         "n_lines": res.column("n_lines_sum")})

    return partial_aggregate(
        li.map_batches(hist, batch_format="pyarrow"),
        ["bucket"], [("n_lines", "sum", "n_lines")])


def brand_price_gap_hist(sf_dir: str) -> ray.data.Dataset:
    """Nearest-neighbor price-gap distribution: within each brand,
    sorted retail prices diff to their next-cheaper neighbor and the
    gaps bucket by floor(log2(cents)) — the price-ladder density probe.
    Sorting happens per brand group (bounded by the brand's catalog)."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_brand", "p_retailprice"])

    def per_brand(group: pa.Table) -> pa.Table:
        cents = np.sort(np.rint(group.column("p_retailprice")
                                .to_numpy(zero_copy_only=False) * 100)
                        .astype(np.int64))
        gaps = np.diff(cents)
        b = np.full(len(gaps), -1, np.int64)
        pos = gaps > 0
        b[pos] = np.floor(np.log2(gaps[pos])).astype(np.int64)
        t = pa.table({"bucket": pa.array(b),
                      "n_gaps": pa.array(np.ones(len(b), np.int64))})
        res = t.group_by(["bucket"]).aggregate([("n_gaps", "sum")])
        return pa.table({"bucket": res.column("bucket"),
                         "n_gaps": res.column("n_gaps_sum")})

    per = ds.groupby("p_brand").map_groups(per_brand,
                                           batch_format="pyarrow")
    return partial_aggregate(per, ["bucket"],
                             [("n_gaps", "sum", "n_gaps")])


def users_business_hours_share(sf_dir: str) -> ray.data.Dataset:
    """Behavioral segmentation: users whose MODAL activity hour (ties
    to the earliest hour) falls inside business hours 9-17 — one
    per-user argmax over the 24-bin hour histogram."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def per_user(group: pa.Table) -> pa.Table:
        h = pc.hour(group.column("ts")).to_numpy(zero_copy_only=False)
        counts = np.bincount(h, minlength=24)
        modal = int(counts.argmax())       # first max = earliest hour
        return pa.table({
            "is_business": pa.array(
                [1 if 9 <= modal <= 17 else 0], pa.int64()),
            "one": pa.array([1], pa.int64())})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    rows = pa.concat_tables(list(per.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    nb = int(pc.sum(rows.column("is_business")).as_py() or 0)
    n = int(pc.sum(rows.column("one")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "n_users": pa.array([n], pa.int64()),
        "n_business": pa.array([nb], pa.int64()),
        "business_ppm": pa.array([(1_000_000 * nb) // max(n, 1)],
                                 pa.int64())}))


def priority_habit_consistency(sf_dir: str) -> ray.data.Dataset:
    """Habit consistency: the share (floor ppm) of orders placed at
    their customer's own MODAL priority (ties to the lexicographically
    smallest priority) — mode computation and the match count both
    live inside each customer's group, so only 2 counters reduce."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderpriority"])

    def per_cust(group: pa.Table) -> pa.Table:
        pr = group.column("o_orderpriority") \
            .to_numpy(zero_copy_only=False)
        vals, counts = np.unique(pr, return_counts=True)
        modal = vals[np.lexsort((vals, -counts))[0]]
        return pa.table({
            "n_orders": pa.array([len(pr)], pa.int64()),
            "n_matching": pa.array([int((pr == modal).sum())],
                                   pa.int64())})

    per = ds.groupby("o_custkey").map_groups(per_cust,
                                             batch_format="pyarrow")
    rows = pa.concat_tables(list(per.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    no = int(pc.sum(rows.column("n_orders")).as_py() or 0)
    nm = int(pc.sum(rows.column("n_matching")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "n_orders": pa.array([no], pa.int64()),
        "n_matching": pa.array([nm], pa.int64()),
        "consistency_ppm": pa.array([(1_000_000 * nm) // max(no, 1)],
                                    pa.int64())}))


def customer_rank_spearman_d2(sf_dir: str) -> ray.data.Dataset:
    """Rank agreement between two customer metrics: revenue rank vs
    order-count rank, as the Spearman numerator Σd² (n for the
    denominator) — do big spenders also order most often?  Both
    metrics fold per customer; ranking runs on the customer-bounded
    table with deterministic (metric desc, custkey) ties."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])

    def partials(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "cents": pa.array(cents),
                      "n": pa.array(np.ones(len(cents), np.int64))})
        res = t.group_by(["o_custkey"]).aggregate(
            [("cents", "sum"), ("n", "sum")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "cents": res.column("cents_sum"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["o_custkey"], [("cents", "sum", "cents"), ("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    ck = rows.column("o_custkey").to_numpy(zero_copy_only=False)
    cents = rows.column("cents").to_numpy(zero_copy_only=False)
    n = rows.column("n").to_numpy(zero_copy_only=False)
    r1 = np.empty(len(ck), np.int64)
    r1[np.lexsort((ck, -cents))] = np.arange(1, len(ck) + 1)
    r2 = np.empty(len(ck), np.int64)
    r2[np.lexsort((ck, -n))] = np.arange(1, len(ck) + 1)
    d = r1 - r2
    return ray.data.from_arrow(pa.table({
        "n_customers": pa.array([len(ck)], pa.int64()),
        "sum_d2": pa.array([int((d * d).sum())], pa.int64())}))


def activation_gap_median_days(sf_dir: str) -> pa.Table:
    """Activation velocity: the exact lower-median days between each
    customer's FIRST and SECOND order (customers with ≥2 orders) —
    second-smallest minus smallest per group, then the distributed
    selection finds the global median."""
    from ..functions.quantiles import exact_quantiles
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_orderkey"])

    def per_cust(group: pa.Table) -> pa.Table:
        od = group.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ok = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        if len(od) < 2:
            return pa.table({"gap_days": pa.array([], pa.float64())})
        order = np.lexsort((ok, od))
        d = od[order].astype("datetime64[us]").astype("datetime64[D]") \
            .astype(np.int64)
        return pa.table({"gap_days": pa.array(
            [float(d[1] - d[0])], pa.float64())})

    gaps = ds.groupby("o_custkey").map_groups(per_cust,
                                              batch_format="pyarrow")
    return exact_quantiles(gaps, "gap_days", qs=(0.5,))


def orderkey_fragmentation(sf_dir: str) -> ray.data.Dataset:
    """Keyspace fragmentation: how many contiguity FRAGMENTS does the
    orderkey space hold?  A key starts a gap when key+1 is absent (and
    it isn't the max) — detected with the key-shift anti-join, so no
    global sort; total missing follows from min/max/count."""
    from ..functions.joins import shuffle_lookup_join
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey"])

    left = ds.map_batches(
        lambda b: pa.table({"probe": pc.add(b.column("o_orderkey"), 1),
                            "k": b.column("o_orderkey")}),
        batch_format="pyarrow")
    right = ds.map_batches(
        lambda b: pa.table({"o_orderkey": b.column("o_orderkey"),
                            "hit": pa.array(np.ones(len(b), np.int8))}),
        batch_format="pyarrow")
    joined = shuffle_lookup_join(
        left, right, on="probe", right_on="o_orderkey",
        left_schema=pa.schema([("probe", pa.int64()),
                               ("k", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("hit", pa.int8())]),
        how="left")

    def fold(batch: pa.Table) -> pa.Table:
        miss = pc.is_null(batch.column("hit"))
        return pa.table({
            "n_boundaries": pa.array(
                [int(pc.sum(pc.cast(miss, pa.int64())).as_py() or 0)],
                pa.int64()),
            "mn": pa.array([pc.min(batch.column("k")).as_py()],
                           pa.int64()),
            "mx": pa.array([pc.max(batch.column("k")).as_py()],
                           pa.int64()),
            "n": pa.array([len(batch)], pa.int64())})

    parts = pa.concat_tables(list(
        joined.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    nb = int(pc.sum(parts.column("n_boundaries")).as_py() or 0)
    mn = int(pc.min(parts.column("mn")).as_py())
    mx = int(pc.max(parts.column("mx")).as_py())
    n = int(pc.sum(parts.column("n")).as_py() or 0)
    # the max key always probes a missing key+1: it ends the LAST
    # fragment, so fragments = boundaries (max included by design)
    return ray.data.from_arrow(pa.table({
        "n_keys": pa.array([n], pa.int64()),
        "n_fragments": pa.array([nb], pa.int64()),
        "total_missing": pa.array([mx - mn + 1 - n], pa.int64())}))


def quality_filter_ablation(sf_dir: str) -> ray.data.Dataset:
    """Filter attribution (ablation): how many documents fail the
    TOO-SHORT rule, the TOO-LONG rule, the STOPWORD-ratio rule, and
    how many pass everything — which gate does the work?  All four
    predicates evaluate in one vectorized pass."""
    from ..functions.text import STOPWORDS
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    stop_ref = ray.put(pa.array(sorted(STOPWORDS), pa.string()))

    def audit(batch: pa.Table) -> pa.Table:
        stops = ray.get(stop_ref)
        toks = pc.split_pattern(batch.column("text"), " ")
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        is_stop = pc.is_in(flat, value_set=stops) \
            .to_numpy(zero_copy_only=False)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(len(batch)), reps)
        n_stop = np.zeros(len(batch), np.int64)
        np.add.at(n_stop, doc, is_stop.astype(np.int64))
        too_short = n_tok < 10
        too_long = n_tok > 5000
        stopy = 2 * n_stop > n_tok
        passed = ~(too_short | too_long | stopy)
        return pa.table({
            "n_docs": pa.array([len(batch)], pa.int64()),
            "n_fail_short": pa.array([int(too_short.sum())], pa.int64()),
            "n_fail_long": pa.array([int(too_long.sum())], pa.int64()),
            "n_fail_stopword": pa.array([int(stopy.sum())], pa.int64()),
            "n_pass": pa.array([int(passed.sum())], pa.int64())})

    parts = pa.concat_tables(list(
        ds.map_batches(audit, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    out = {c: pa.array([int(pc.sum(parts.column(c)).as_py() or 0)],
                       pa.int64())
           for c in ("n_docs", "n_fail_short", "n_fail_long",
                     "n_fail_stopword", "n_pass")}
    return ray.data.from_arrow(pa.table(out))


def bpe_overhead_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Tokenizer-cost planning: per language the BPE-pretokenizer token
    count versus whitespace tokens, and the overhead ratio (floor ppm)
    — which languages inflate the token budget?  Both counters are one
    RE2 kernel per batch."""
    from ..functions.text import _BPE_PATTERN
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text"])

    def counters(batch: pa.Table) -> pa.Table:
        bpe = pc.cast(pc.count_substring_regex(
            batch.column("text"), _BPE_PATTERN), pa.int64())
        ws = pc.cast(pc.add(pc.count_substring(
            batch.column("text"), " "), 1), pa.int64())
        t = pa.table({"lang": batch.column("lang"),
                      "n_bpe": bpe, "n_ws": ws})
        res = t.group_by(["lang"]).aggregate(
            [("n_bpe", "sum"), ("n_ws", "sum")])
        return pa.table({"lang": res.column("lang"),
                         "n_bpe": res.column("n_bpe_sum"),
                         "n_ws": res.column("n_ws_sum")})

    agg = partial_aggregate(
        ds.map_batches(counters, batch_format="pyarrow"),
        ["lang"], [("n_bpe", "sum", "n_bpe"), ("n_ws", "sum", "n_ws")])

    def ratio(batch: pa.Table) -> pa.Table:
        b = batch.column("n_bpe").to_numpy(zero_copy_only=False)
        w = batch.column("n_ws").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "overhead_ppm",
            pa.array((1_000_000 * b) // np.where(w == 0, 1, w)))

    return agg.map_batches(ratio, batch_format="pyarrow")


def label_centroid_distance_matrix(sf_dir: str) -> ray.data.Dataset:
    """Inter-class separation: for every label pair the exact integer
    numerator ‖n_b·S_a − n_a·S_b‖² of the squared centroid distance
    (denominator (n_a·n_b)², e8 units) — does the embedding space
    separate the classes?  Per-label sums fold from batch partials;
    the bignum assembly runs on the label-bounded table."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding", "label"])

    def sums(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column("embedding")
                     .to_numpy(zero_copy_only=False))
        q = np.rint(m.astype(np.float64) * 10_000).astype(np.int64)
        lab = pc.cast(batch.column("label"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        labs, li = np.unique(lab, return_inverse=True)
        acc = np.zeros((len(labs), q.shape[1]), np.int64)
        np.add.at(acc, li, q)
        cnt = np.bincount(li, minlength=len(labs)).astype(np.int64)
        cols = {"label": pa.array(labs), "n": pa.array(cnt)}
        for j in range(q.shape[1]):
            cols[f"s_{j}"] = pa.array(acc[:, j])
        return pa.table(cols)

    agg = partial_aggregate(
        ds.map_batches(sums, batch_format="pyarrow"),
        ["label"], [("n", "sum", "n")]
        + [(f"s_{j}", "sum", f"s_{j}") for j in range(64)])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    labs = rows.column("label").to_pylist()
    n = [int(x) for x in rows.column("n").to_pylist()]
    s = [[int(rows.column(f"s_{j}")[i].as_py()) for j in range(64)]
         for i in range(len(labs))]
    order = np.argsort(labs)
    la, lb, d2, nas, nbs = [], [], [], [], []
    for ii in range(len(order)):
        for jj in range(ii + 1, len(order)):
            a, b = order[ii], order[jj]
            num = sum((n[b] * s[a][k] - n[a] * s[b][k]) ** 2
                      for k in range(64))
            la.append(labs[a])
            lb.append(labs[b])
            d2.append(float(num))
            nas.append(n[a])
            nbs.append(n[b])
    return ray.data.from_arrow(pa.table({
        "label_a": pa.array(la, pa.int64()),
        "label_b": pa.array(lb, pa.int64()),
        "d2_num": pa.array(d2, pa.float64()),
        "n_a": pa.array(nas, pa.int64()),
        "n_b": pa.array(nbs, pa.int64())}))


def user_day_density_ppm(sf_dir: str) -> ray.data.Dataset:
    """Engagement-matrix density: distinct (user, day) cells over the
    full user × day grid (floor ppm) — how close is the activity
    matrix to dense?  Three distinct counts, one scan each way."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def pairs(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"user_id": batch.column("user_id"), "day": day})
        return t.group_by(["user_id", "day"]).aggregate([]) \
            .select(["user_id", "day"])

    distinct = partial_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["user_id", "day"], [])
    rows = pa.concat_tables(list(
        distinct.map_batches(lambda b: pa.table({
            "nud": pa.array([len(b)], pa.int64()),
            "users": pa.array([b.column("user_id")
                               .to_pylist()], pa.list_(pa.int64())),
            "days": pa.array([pc.cast(b.column("day"), pa.int64())
                              .to_pylist()], pa.list_(pa.int64()))}),
            batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    nud = int(pc.sum(rows.column("nud")).as_py() or 0)
    users = set()
    days = set()
    for lst in rows.column("users").to_pylist():
        users.update(lst)
    for lst in rows.column("days").to_pylist():
        days.update(lst)
    nu, nd = len(users), len(days)
    return ray.data.from_arrow(pa.table({
        "n_user_days": pa.array([nud], pa.int64()),
        "n_users": pa.array([nu], pa.int64()),
        "n_days": pa.array([nd], pa.int64()),
        "density_ppm": pa.array([(1_000_000 * nud)
                                 // max(nu * nd, 1)], pa.int64())}))


def salted_top_user(sf_dir: str, n_salts: int = 8) -> ray.data.Dataset:
    """Hot-key salting demo: the busiest user computed through a
    SALTED two-stage aggregation — stage 1 reduces (user, salt) cells
    so no single reducer ever sees a whole hot key, stage 2 merges the
    ≤ n_salts partials per user — then the tiny argmax.  Same answer
    as the direct groupby, skew-proof exchange."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_id"])

    def stage1(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        salt = (eid % n_salts).astype(np.int64)
        t = pa.table({"user_id": pa.array(u), "salt": pa.array(salt),
                      "n": pa.array(np.ones(len(u), np.int64))})
        res = t.group_by(["user_id", "salt"]).aggregate([("n", "sum")])
        return pa.table({"user_id": res.column("user_id"),
                         "salt": res.column("salt"),
                         "n": res.column("n_sum")})

    salted = partial_aggregate(
        ds.map_batches(stage1, batch_format="pyarrow"),
        ["user_id", "salt"], [("n", "sum", "n")])

    def stage2(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["user_id"]).aggregate([("n", "sum")])
        return pa.table({"user_id": res.column("user_id"),
                         "n_events": res.column("n_sum")})

    merged = partial_aggregate(
        salted.map_batches(stage2, batch_format="pyarrow"),
        ["user_id"], [("n_events", "sum", "n_events")])
    return merged.sort(["n_events", "user_id"],
                       descending=[True, False]).limit(1)


def kmv_intersection_estimate(sf_dir: str, k: int = 64,
                              type_a: str = "view",
                              type_b: str = "purchase"
                              ) -> ray.data.Dataset:
    """Theta/KMV sketch audit with a DETERMINISTIC hash: the k-minimum-
    values sketches of two event types' user sets (md5-derived 60-bit
    keys — reproducible, mergeable) yield an intersection estimate that
    the oracle recomputes exactly; the true intersection sits beside it
    for the error read.  Per-type distinct users reduce; only k keys
    per type ever reach the driver."""
    import hashlib
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def pairs(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("event_type"),
                        value_set=pa.array([type_a, type_b]))
        t = batch.filter(keep)
        return t.group_by(["event_type", "user_id"]).aggregate([]) \
            .select(["event_type", "user_id"])

    distinct = partial_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["event_type", "user_id"], [])

    def hashed(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        h = np.fromiter(
            (int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)
             for x in u), np.int64, count=len(u))
        return pa.table({"event_type": batch.column("event_type"),
                         "h": pa.array(h)})

    rows = pa.concat_tables(list(
        distinct.map_batches(hashed, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    et = rows.column("event_type").to_numpy(zero_copy_only=False)
    h = rows.column("h").to_numpy(zero_copy_only=False)
    ha = np.sort(h[et == type_a])[:k]
    hb = np.sort(h[et == type_b])[:k]
    sa, sb = set(ha.tolist()), set(hb.tolist())
    union = np.sort(np.array(sorted(sa | sb), np.int64))[:k]
    theta = int(union[-1]) if len(union) >= k else (1 << 60)
    both = sorted(sa & sb)
    i_under = sum(1 for x in both if x <= theta)
    n_union_under = len(union)
    # KMV estimate: |A∩B| ≈ i/k_union · |union| where |union| ≈
    # (k-1)·2^60/θ ; keep it integer: est = i·(k_union−1)·2^60 //
    # (k_union·θ) (0 when the union sketch is unsaturated: exact mode)
    if len(sa | sb) <= k:
        est = i_under              # sketch holds the whole union
    else:
        est = (i_under * (n_union_under - 1) * (1 << 60)) \
            // (n_union_under * max(theta, 1))
    exact = len({int(x) for x in h[et == type_a]}
                & {int(x) for x in h[et == type_b]})
    return ray.data.from_arrow(pa.table({
        "est_intersection": pa.array([est], pa.int64()),
        "exact_intersection": pa.array([exact], pa.int64()),
        "k": pa.array([k], pa.int64())}))


def token_position_diversity(sf_dir: str, max_pos: int = 10
                             ) -> ray.data.Dataset:
    """Positional vocabulary profile: distinct tokens observed at each
    of the first 10 token positions across the corpus — do documents
    share stereotyped openings?  (position, token) pairs dedup through
    one keyed exchange."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        starts = np.r_[0, np.cumsum(reps)[:-1]]
        pos = np.arange(len(flat)) - np.repeat(starts, reps)
        keep = pos < max_pos
        t = pa.table({"pos": pa.array(pos[keep].astype(np.int64)),
                      "tok": pa.array(flat[keep])})
        return t.group_by(["pos", "tok"]).aggregate([]) \
            .select(["pos", "tok"])

    distinct = partial_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"), ["pos", "tok"],
        [])

    def fold(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["pos"]).aggregate([("pos", "count")])
        return pa.table({"pos": res.column("pos"),
                         "n_distinct_tokens": pc.cast(
                             res.column("pos_count"), pa.int64())})

    return partial_aggregate(
        distinct.map_batches(fold, batch_format="pyarrow"),
        ["pos"], [("n_distinct_tokens", "sum", "n_distinct_tokens")])


def coorder_clustering_coefficient(sf_dir: str) -> ray.data.Dataset:
    """Global clustering coefficient of the co-ordered-parts graph:
    3·triangles / open-2-paths (floor ppm) — triangles via the oriented
    edge-join on the deduped edge list, 2-paths from the degree sums;
    both bounded by the part dimension after the pair exchange."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        bkt = ((ok.astype(np.uint64) * _FIB64) >> np.uint64(56)) \
            .astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = group.column("l_partkey").to_numpy(zero_copy_only=False)
        u = np.unique(np.stack([ok, pk], axis=1), axis=0)
        ok, pk = u[:, 0], u[:, 1]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, len(ok)])
        a_all, b_all = [], []
        for ln in np.unique(lens):
            if ln < 2:
                continue
            segs = starts[lens == ln]
            mat = pk[segs[:, None] + np.arange(ln)]
            ii, jj = np.triu_indices(int(ln), k=1)
            a_all.append(mat[:, ii].ravel())
            b_all.append(mat[:, jj].ravel())
        if not a_all:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        a = np.concatenate(a_all)
        b = np.concatenate(b_all)
        t2 = pa.table({"u": pa.array(np.minimum(a, b)),
                       "v": pa.array(np.maximum(a, b))})
        return t2.group_by(["u", "v"]).aggregate([]).select(["u", "v"])

    edges_tab = pa.concat_tables(list(partial_aggregate(
        li.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bkt").map_groups(bucket_pairs,
                                   batch_format="pyarrow"),
        ["u", "v"], [])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    # part-dimension-bounded adjacency: triangles by sorted-set probe
    eu = edges_tab.column("u").to_numpy(zero_copy_only=False)
    ev = edges_tab.column("v").to_numpy(zero_copy_only=False)
    edge_set = set(zip(eu.tolist(), ev.tolist()))
    nbrs = {}
    for a, b in edge_set:
        nbrs.setdefault(a, []).append(b)
    tri = 0
    for a, lst in nbrs.items():
        lst = sorted(lst)
        for i in range(len(lst)):
            for j in range(i + 1, len(lst)):
                if (lst[i], lst[j]) in edge_set:
                    tri += 1
    deg = {}
    for a, b in edge_set:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    paths2 = sum(d * (d - 1) // 2 for d in deg.values())
    return ray.data.from_arrow(pa.table({
        "n_triangles": pa.array([tri], pa.int64()),
        "n_paths2": pa.array([paths2], pa.int64()),
        "clustering_ppm": pa.array(
            [(1_000_000 * 3 * tri) // max(paths2, 1)], pa.int64())}))


def early_value_share_hist(sf_dir: str) -> ray.data.Dataset:
    """Cohort quality signal: each user's FIRST-7-DAYS value share of
    their lifetime value (floor ppm), bucketed per 100k — does early
    behavior predict the total?  Entirely within each user's group."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cents = np.rint(group.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        cutoff = ts.min() + 7 * 86_400_000_000
        early = int(cents[ts < cutoff].sum())
        total = int(cents.sum())
        ppm = (1_000_000 * early) // max(total, 1)
        return pa.table({
            "bucket": pa.array([ppm // 100_000], pa.int64()),
            "n_users": pa.array([1], pa.int64())})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    return partial_aggregate(per, ["bucket"],
                             [("n_users", "sum", "n_users")])


def popularity_rec_hit_at10(sf_dir: str, k: int = 10
                            ) -> ray.data.Dataset:
    """Leave-last-order-out recommender evaluation: popularity ranks
    train on every NON-last order, and a customer scores a hit when
    their held-out last order contains any top-k popular part — the
    deterministic hit@k protocol.  Last-order ids resolve per customer;
    popularity folds from the train split; the tiny top-k broadcasts
    into the evaluation pass."""
    from ..functions.joins import shuffle_lookup_join
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey",
                                         "o_orderdate"])
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def last_orders(group: pa.Table) -> pa.Table:
        od = group.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ok = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        pick = np.lexsort((-ok, -od))[0]   # latest date, max orderkey
        n = len(ok)
        return pa.table({
            "o_orderkey": pa.array([int(ok[pick])], pa.int64()),
            "is_eval": pa.array([1 if n >= 2 else 0], pa.int64())})

    last = pa.concat_tables(list(
        orders.groupby("o_custkey")
        .map_groups(last_orders, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    eval_keys = pa.array(sorted(
        last.filter(pc.equal(last.column("is_eval"), 1))
        .column("o_orderkey").to_pylist()), pa.int64())
    all_last = pa.array(sorted(last.column("o_orderkey").to_pylist()),
                        pa.int64())
    lref = ray.put((all_last, eval_keys))

    def train_counts(batch: pa.Table) -> pa.Table:
        alast, _ = ray.get(lref)
        keep = pc.invert(pc.is_in(batch.column("l_orderkey"),
                                  value_set=alast))
        t = batch.filter(keep)
        tt = pa.table({"l_partkey": t.column("l_partkey"),
                       "n": pa.array(np.ones(len(t), np.int64))})
        res = tt.group_by(["l_partkey"]).aggregate([("n", "sum")])
        return pa.table({"l_partkey": res.column("l_partkey"),
                         "n": res.column("n_sum")})

    pop = partial_aggregate(
        li.map_batches(train_counts, batch_format="pyarrow"),
        ["l_partkey"], [("n", "sum", "n")]) \
        .sort(["n", "l_partkey"], descending=[True, False]) \
        .limit(k).take_all()
    top = pa.array(sorted(r["l_partkey"] for r in pop), pa.int64())
    tref = ray.put(top)

    def hits(batch: pa.Table) -> pa.Table:
        _, ekeys = ray.get(lref)
        topk = ray.get(tref)
        keep = pc.is_in(batch.column("l_orderkey"), value_set=ekeys)
        t = batch.filter(keep)
        hit = pc.is_in(t.column("l_partkey"), value_set=topk)
        tt = pa.table({"l_orderkey": t.column("l_orderkey"),
                       "hit": pc.cast(hit, pa.int64())})
        res = tt.group_by(["l_orderkey"]).aggregate([("hit", "max")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "hit": res.column("hit_max")})

    per_order = partial_aggregate(
        li.map_batches(hits, batch_format="pyarrow"),
        ["l_orderkey"], [("hit", "max", "hit")])
    rows = pa.concat_tables(list(per_order.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    n_eval = len(rows)
    n_hits = int(pc.sum(rows.column("hit")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "n_eval_customers": pa.array([n_eval], pa.int64()),
        "n_hits": pa.array([n_hits], pa.int64()),
        "hit_ppm": pa.array([(1_000_000 * n_hits) // max(n_eval, 1)],
                            pa.int64())}))


def order_rolling_rank_counts(sf_dir: str, window: int = 5
                              ) -> ray.data.Dataset:
    """Rolling rank: each order's value rank among the customer's
    trailing 5 orders (1 = highest), folded to a rank histogram —
    'is the latest order their biggest recently?'  One vectorized
    window sweep per customer group."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderkey",
                                     "o_orderdate", "o_totalprice"])

    def per_cust(group: pa.Table) -> pa.Table:
        od = group.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        ok = group.column("o_orderkey").to_numpy(zero_copy_only=False)
        cents = np.rint(group.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        order = np.lexsort((ok, od))
        c = cents[order]
        ranks = np.empty(len(c), np.int64)
        for i in range(len(c)):
            lo = max(0, i - window + 1)
            w = c[lo:i + 1]
            ranks[i] = 1 + int((w > c[i]).sum())
        t = pa.table({"rank": pa.array(ranks),
                      "n_orders": pa.array(np.ones(len(c), np.int64))})
        res = t.group_by(["rank"]).aggregate([("n_orders", "sum")])
        return pa.table({"rank": res.column("rank"),
                         "n_orders": res.column("n_orders_sum")})

    per = ds.groupby("o_custkey").map_groups(per_cust,
                                             batch_format="pyarrow")
    return partial_aggregate(per, ["rank"],
                             [("n_orders", "sum", "n_orders")])


def hourly_hotuser_share_hist(sf_dir: str) -> ray.data.Dataset:
    """Windowed skew monitor: per hour the busiest user's event share
    (floor ppm), folded to a share histogram (buckets per 100k) — the
    multi-tenant fairness gauge.  (hour, user) counts reduce; per-hour
    argmax runs on the hour-bounded grid."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def counts(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        t = pa.table({"hour": hour,
                      "user_id": batch.column("user_id"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["hour", "user_id"]).aggregate([("n", "sum")])
        return pa.table({"hour": res.column("hour"),
                         "user_id": res.column("user_id"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["hour", "user_id"], [("n", "sum", "n")])

    def per_hour(group: pa.Table) -> pa.Table:
        n = group.column("n").to_numpy(zero_copy_only=False)
        share = (1_000_000 * int(n.max())) // int(n.sum())
        return pa.table({
            "bucket": pa.array([share // 100_000], pa.int64()),
            "n_hours": pa.array([1], pa.int64())})

    per = agg.groupby("hour").map_groups(per_hour,
                                         batch_format="pyarrow")
    return partial_aggregate(per, ["bucket"],
                             [("n_hours", "sum", "n_hours")])


def doc_half_jaccard_hist(sf_dir: str) -> ray.data.Dataset:
    """Intra-document self-similarity: Jaccard (floor ppm) between the
    token SETS of each document's first and second half, bucketed per
    100k — repetitive boilerplate scores high.  Documents are atomic
    per batch, so the set algebra is one vectorized group_by."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def per_batch(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        starts = np.r_[0, np.cumsum(reps)[:-1]]
        pos = np.arange(len(flat)) - np.repeat(starts, reps)
        doc = np.repeat(np.arange(len(batch)), reps)
        half = (pos >= np.repeat(reps // 2, reps)).astype(np.int8)
        t = pa.table({"doc": pa.array(doc), "tok": pa.array(flat),
                      "in_a": pa.array((half == 0).astype(np.int64)),
                      "in_b": pa.array((half == 1).astype(np.int64))})
        res = t.group_by(["doc", "tok"]).aggregate(
            [("in_a", "max"), ("in_b", "max")])
        da = res.column("doc").to_numpy(zero_copy_only=False)
        ia = res.column("in_a_max").to_numpy(zero_copy_only=False)
        ib = res.column("in_b_max").to_numpy(zero_copy_only=False)
        inter = np.zeros(len(batch), np.int64)
        union = np.zeros(len(batch), np.int64)
        np.add.at(inter, da, (ia & ib).astype(np.int64))
        np.add.at(union, da, np.ones(len(da), np.int64))
        ppm = (1_000_000 * inter) // np.where(union == 0, 1, union)
        t2 = pa.table({"bucket": pa.array(ppm // 100_000),
                       "n_docs": pa.array(np.ones(len(batch),
                                                  np.int64))})
        res2 = t2.group_by(["bucket"]).aggregate([("n_docs", "sum")])
        return pa.table({"bucket": res2.column("bucket"),
                         "n_docs": res2.column("n_docs_sum")})

    return partial_aggregate(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        ["bucket"], [("n_docs", "sum", "n_docs")])


def zorder_locality_audit(sf_dir: str, shift: int = 30
                          ) -> ray.data.Dataset:
    """Z-order (Morton) layout audit: orders keyed by the bit-
    interleave of (custkey, days-since-epoch) and chunked on the
    z-prefix; per chunk the day-span and key-span show how well a
    z-sort would co-locate BOTH dimensions (the multi-column
    clustering question Z-ordering answers).  The interleave is 20+20
    vectorized bit ops; chunk envelopes partial-aggregate."""
    epoch = np.datetime64("1995-01-01", "D").astype(np.int64)
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate"])

    def z(batch: pa.Table) -> pa.Table:
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        day = (batch.column("o_orderdate")
               .to_numpy(zero_copy_only=False).astype("datetime64[D]")
               .astype(np.int64) - epoch)
        zv = np.zeros(len(ck), np.int64)
        for i in range(20):
            zv |= ((day >> i) & 1) << (2 * i)
            zv |= ((ck >> i) & 1) << (2 * i + 1)
        chunk = zv >> shift
        t = pa.table({"chunk": pa.array(chunk),
                      "dmn": pa.array(day), "dmx": pa.array(day),
                      "kmn": pa.array(ck), "kmx": pa.array(ck),
                      "n": pa.array(np.ones(len(ck), np.int64))})
        res = t.group_by(["chunk"]).aggregate(
            [("dmn", "min"), ("dmx", "max"), ("kmn", "min"),
             ("kmx", "max"), ("n", "sum")])
        return pa.table({"chunk": res.column("chunk"),
                         "dmn": res.column("dmn_min"),
                         "dmx": res.column("dmx_max"),
                         "kmn": res.column("kmn_min"),
                         "kmx": res.column("kmx_max"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(z, batch_format="pyarrow"),
        ["chunk"], [("dmn", "min", "dmn"), ("dmx", "max", "dmx"),
                    ("kmn", "min", "kmn"), ("kmx", "max", "kmx"),
                    ("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    dspan = (rows.column("dmx").to_numpy(zero_copy_only=False)
             - rows.column("dmn").to_numpy(zero_copy_only=False))
    kspan = (rows.column("kmx").to_numpy(zero_copy_only=False)
             - rows.column("kmn").to_numpy(zero_copy_only=False))
    return ray.data.from_arrow(pa.table({
        "n_chunks": pa.array([len(rows)], pa.int64()),
        "sum_day_span": pa.array([int(dspan.sum())], pa.int64()),
        "sum_key_span": pa.array([int(kspan.sum())], pa.int64()),
        "n_rows": pa.array([int(pc.sum(rows.column("n")).as_py())],
                           pa.int64())}))


def lang_hapax_tail_mass(sf_dir: str) -> ray.data.Dataset:
    """Long-tail mass per language: the share (floor ppm) of token
    OCCURRENCES carried by hapax legomena (corpus-frequency-1 tokens
    within the language) — the vocabulary-pruning cost gauge."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lang = pc.take(batch.column("lang"),
                       pa.array(np.repeat(np.arange(len(batch)), reps)))
        t = pa.table({"lang": lang, "tok": flat,
                      "n": pa.array(np.ones(len(flat), np.int64))})
        res = t.group_by(["lang", "tok"]).aggregate([("n", "sum")])
        return pa.table({"lang": res.column("lang"),
                         "tok": res.column("tok"),
                         "n": res.column("n_sum")})

    per_tok = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["lang", "tok"], [("n", "sum", "n")])

    def fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        t = pa.table({"lang": batch.column("lang"),
                      "total": pa.array(n),
                      "hapax": pa.array((n == 1).astype(np.int64))})
        res = t.group_by(["lang"]).aggregate(
            [("total", "sum"), ("hapax", "sum")])
        return pa.table({"lang": res.column("lang"),
                         "total": res.column("total_sum"),
                         "hapax": res.column("hapax_sum")})

    agg = partial_aggregate(
        per_tok.map_batches(fold, batch_format="pyarrow"),
        ["lang"], [("total", "sum", "total"),
                   ("hapax", "sum", "hapax")])

    def ppm(batch: pa.Table) -> pa.Table:
        t = batch.column("total").to_numpy(zero_copy_only=False)
        h = batch.column("hapax").to_numpy(zero_copy_only=False)
        return pa.table({
            "lang": batch.column("lang"),
            "n_occurrences": pa.array(t),
            "n_hapax": pa.array(h),
            "tail_ppm": pa.array((1_000_000 * h)
                                 // np.where(t == 0, 1, t))})

    return agg.map_batches(ppm, batch_format="pyarrow")


def value_split_retention(sf_dir: str, window_days: int = 30
                          ) -> ray.data.Dataset:
    """Value-stratified retention: users split at the lower-median
    lifetime value; each half's share (floor ppm) still active in the
    final 30 days — do valuable users stick?  Per-user totals and
    last-seen fold in one pass; the median splits on the user-bounded
    table."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def per_batch(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"user_id": batch.column("user_id"),
                      "cents": pa.array(cents),
                      "last_ts": batch.column("ts")})
        res = t.group_by(["user_id"]).aggregate(
            [("cents", "sum"), ("last_ts", "max")])
        return pa.table({"user_id": res.column("user_id"),
                         "cents": res.column("cents_sum"),
                         "last_ts": res.column("last_ts_max")})

    agg = partial_aggregate(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        ["user_id"], [("cents", "sum", "cents"),
                      ("last_ts", "max", "last_ts")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    cents = rows.column("cents").to_numpy(zero_copy_only=False)
    last = rows.column("last_ts").to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    med = int(np.sort(cents)[(len(cents) - 1) // 2])
    cutoff = int(last.max()) - window_days * 86_400_000_000
    hi = cents > med
    active = last >= cutoff
    out_rows = []
    for name, mask in (("high", hi), ("low", ~hi)):
        n = int(mask.sum())
        ret = int((mask & active).sum())
        out_rows.append((name, n, ret,
                         (1_000_000 * ret) // max(n, 1)))
    return ray.data.from_arrow(pa.table({
        "segment": pa.array([r[0] for r in out_rows], pa.string()),
        "n_users": pa.array([r[1] for r in out_rows], pa.int64()),
        "n_retained": pa.array([r[2] for r in out_rows], pa.int64()),
        "retention_ppm": pa.array([r[3] for r in out_rows],
                                  pa.int64())}))


def priority_multiline_share(sf_dir: str) -> ray.data.Dataset:
    """Order complexity by priority: share (floor ppm) of each
    priority's orders with MORE THAN ONE lineitem — per-order line
    counts join the order side through one shuffle_lookup_join."""
    from ..functions.joins import shuffle_lookup_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey",
                                         "o_orderpriority"])

    def counts(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "nl": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["l_orderkey"]).aggregate([("nl", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "nl": res.column("nl_sum")})

    per_order = partial_aggregate(
        li.map_batches(counts, batch_format="pyarrow"),
        ["l_orderkey"], [("nl", "sum", "nl")])
    joined = shuffle_lookup_join(
        per_order, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("nl", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderpriority", pa.string())]))

    def fold(batch: pa.Table) -> pa.Table:
        multi = pc.cast(pc.greater(batch.column("nl"), 1), pa.int64())
        t = pa.table({"priority": batch.column("o_orderpriority"),
                      "n_orders": pa.array(np.ones(len(batch),
                                                   np.int64)),
                      "n_multi": multi})
        res = t.group_by(["priority"]).aggregate(
            [("n_orders", "sum"), ("n_multi", "sum")])
        return pa.table({"priority": res.column("priority"),
                         "n_orders": res.column("n_orders_sum"),
                         "n_multi": res.column("n_multi_sum")})

    agg = partial_aggregate(
        joined.map_batches(fold, batch_format="pyarrow"),
        ["priority"], [("n_orders", "sum", "n_orders"),
                       ("n_multi", "sum", "n_multi")])

    def ppm(batch: pa.Table) -> pa.Table:
        no = batch.column("n_orders").to_numpy(zero_copy_only=False)
        nm = batch.column("n_multi").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "multi_ppm",
            pa.array((1_000_000 * nm) // np.where(no == 0, 1, no)))

    return agg.map_batches(ppm, batch_format="pyarrow")


def props_k_value_cov(sf_dir: str) -> ray.data.Dataset:
    """Semi-structured × metric covariance: per event type the integer
    covariance numerator n·Σkv − Σk·Σv between the JSON field ``k``
    (extracted with one RE2 kernel) and the event value in cents —
    does the payload field track the metric?"""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value", "props"])

    def moments(batch: pa.Table) -> pa.Table:
        ks = pc.extract_regex(batch.column("props"),
                              r'"k": (?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ks, "k"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"event_type": batch.column("event_type"),
                      "n": pa.array(np.ones(len(k), np.int64)),
                      "sk": pa.array(k), "sv": pa.array(cents),
                      "skv": pa.array(k * cents)})
        res = t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("sk", "sum"), ("sv", "sum"),
             ("skv", "sum")])
        return pa.table({"event_type": res.column("event_type"),
                         "n": res.column("n_sum"),
                         "sk": res.column("sk_sum"),
                         "sv": res.column("sv_sum"),
                         "skv": res.column("skv_sum")})

    agg = partial_aggregate(
        ds.map_batches(moments, batch_format="pyarrow"),
        ["event_type"], [("n", "sum", "n"), ("sk", "sum", "sk"),
                         ("sv", "sum", "sv"), ("skv", "sum", "skv")])

    def fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        sk = batch.column("sk").to_numpy(zero_copy_only=False)
        sv = batch.column("sv").to_numpy(zero_copy_only=False)
        skv = batch.column("skv").to_numpy(zero_copy_only=False)
        return pa.table({"event_type": batch.column("event_type"),
                         "n": pa.array(n),
                         "cov_num": pa.array(
                             (n * skv - sk * sv).astype(np.float64))})

    return agg.map_batches(fold, batch_format="pyarrow")


def same_day_repeat_buyers(sf_dir: str) -> ray.data.Dataset:
    """Intra-day repeat intensity: customers placing ≥2 orders the
    SAME day, and how many such customer-days — the urgency/fraud
    smell.  (customer, day) counts reduce; the threshold folds."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate"])

    def pairs(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("o_orderdate"), unit="day")
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "day": day,
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["o_custkey", "day"]).aggregate([("n", "sum")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "day": res.column("day"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["o_custkey", "day"], [("n", "sum", "n")])

    def fold(batch: pa.Table) -> pa.Table:
        rep = pc.greater_equal(batch.column("n"), 2)
        t = batch.filter(rep)
        custs = pc.unique(t.column("o_custkey"))
        return pa.table({
            "repeat_days": pa.array([len(t)], pa.int64()),
            "custs": pa.array([custs.to_pylist()],
                              pa.list_(pa.int64()))})

    parts = pa.concat_tables(list(
        agg.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    n_days = int(pc.sum(parts.column("repeat_days")).as_py() or 0)
    custs = set()
    for lst in parts.column("custs").to_pylist():
        custs.update(lst)
    return ray.data.from_arrow(pa.table({
        "n_repeat_customer_days": pa.array([n_days], pa.int64()),
        "n_repeat_customers": pa.array([len(custs)], pa.int64())}))


def repdigit_value_audit(sf_dir: str) -> ray.data.Dataset:
    """Fabricated-amount audit: event values whose cents are a
    REPDIGIT (7, 77, 777, …) per event type — repeated-digit amounts
    over-index in invented numbers.  RE2 has no backreferences, so the
    bounded repdigit SET (9 digits × 15 lengths) broadcasts and one
    is_in kernel classifies."""
    reps = [int(str(d) * ln) for d in range(1, 10)
            for ln in range(1, 16)]
    rep_arr = pa.array(sorted(reps), pa.int64())
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def audit(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        is_rep = pc.is_in(pa.array(cents), value_set=rep_arr)
        t = pa.table({"event_type": batch.column("event_type"),
                      "n_events": pa.array(np.ones(len(cents),
                                                   np.int64)),
                      "n_repdigit": pc.cast(is_rep, pa.int64())})
        res = t.group_by(["event_type"]).aggregate(
            [("n_events", "sum"), ("n_repdigit", "sum")])
        return pa.table({"event_type": res.column("event_type"),
                         "n_events": res.column("n_events_sum"),
                         "n_repdigit": res.column("n_repdigit_sum")})

    return partial_aggregate(
        ds.map_batches(audit, batch_format="pyarrow"),
        ["event_type"], [("n_events", "sum", "n_events"),
                         ("n_repdigit", "sum", "n_repdigit")])


def alert_2of3_low_days(sf_dir: str) -> ray.data.Dataset:
    """Windowed alert rule: days where at least 2 of the trailing 3
    calendar days ran below the global daily mean (n·x < S integer
    cross-multiply — no division) — the m-of-n alerting primitive,
    evaluated on the calendar-bounded daily series."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def daily(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("o_orderdate"), unit="day")
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"day": day, "cents": pa.array(cents)})
        res = t.group_by(["day"]).aggregate([("cents", "sum")])
        return pa.table({"day": res.column("day"),
                         "cents": res.column("cents_sum")})

    agg = partial_aggregate(
        ds.map_batches(daily, batch_format="pyarrow"),
        ["day"], [("cents", "sum", "cents")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    day = rows.column("day").to_numpy(zero_copy_only=False) \
        .astype("datetime64[D]").astype(np.int64)
    cents = rows.column("cents").to_numpy(zero_copy_only=False)
    order = np.argsort(day)
    day, cents = day[order], cents[order]
    n = len(cents)
    s = int(cents.sum())
    low = (cents.astype(object) * n < s).astype(bool)
    # trailing window over CALENDAR positions (gap days count as
    # not-low): dense series via searchsorted membership
    alerts = 0
    for i in range(n):
        cnt = 0
        for back in range(3):
            j = np.searchsorted(day, day[i] - back)
            if j < n and day[j] == day[i] - back and low[j]:
                cnt += 1
        alerts += cnt >= 2
    return ray.data.from_arrow(pa.table({
        "n_days": pa.array([n], pa.int64()),
        "n_low_days": pa.array([int(low.sum())], pa.int64()),
        "n_alert_days": pa.array([alerts], pa.int64())}))


def boilerplate_prefix_docs(sf_dir: str, k_tokens: int = 3,
                            min_group: int = 5) -> ray.data.Dataset:
    """Boilerplate detection by prefix blocking: documents whose first
    3 tokens match ≥5 OTHER docs' opening (template smell), counted
    per source.  The prefix key is one slice per batch; group sizes
    reduce keyed on the prefix, then re-join the (prefix → big) set by
    broadcast."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def keyed(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        pref = pc.binary_join(pc.list_slice(toks, 0, k_tokens), " ")
        t = pa.table({"prefix": pref,
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["prefix"]).aggregate([("n", "sum")])
        return pa.table({"prefix": res.column("prefix"),
                         "n": res.column("n_sum")})

    counts = partial_aggregate(
        ds.map_batches(keyed, batch_format="pyarrow"),
        ["prefix"], [("n", "sum", "n")])
    seed = pa.table({"prefix": pa.array([], pa.string())})
    big_tab = pa.concat_tables([seed] + list(
        counts.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("n"),
                                                min_group))
            .select(["prefix"]), batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    big_ref = ray.put(big_tab.column("prefix").combine_chunks())

    def flag(batch: pa.Table) -> pa.Table:
        big = ray.get(big_ref)
        toks = pc.split_pattern(batch.column("text"), " ")
        pref = pc.binary_join(pc.list_slice(toks, 0, k_tokens), " ")
        hit = pc.cast(pc.is_in(pref, value_set=big), pa.int64())
        t = pa.table({"source": batch.column("source"),
                      "n_docs": pa.array(np.ones(len(batch),
                                                 np.int64)),
                      "n_flagged": hit})
        res = t.group_by(["source"]).aggregate(
            [("n_docs", "sum"), ("n_flagged", "sum")])
        return pa.table({"source": res.column("source"),
                         "n_docs": res.column("n_docs_sum"),
                         "n_flagged": res.column("n_flagged_sum")})

    return partial_aggregate(
        ds.map_batches(flag, batch_format="pyarrow"),
        ["source"], [("n_docs", "sum", "n_docs"),
                     ("n_flagged", "sum", "n_flagged")])


def segment_staleness_matrix(sf_dir: str) -> ray.data.Dataset:
    """Churn-risk matrix: customers cross-classified by market segment
    and order-recency tier (hot <365 d, warm <730 d, cold otherwise,
    relative to the global max order date) — segment dim broadcasts;
    per-customer last-order dates reduce."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    cref = ray.put((cust.column("c_custkey").combine_chunks(),
                    cust.column("c_mktsegment").combine_chunks()))
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate"])

    def last(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "last_o": batch.column("o_orderdate")})
        res = t.group_by(["o_custkey"]).aggregate([("last_o", "max")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "last_o": res.column("last_o_max")})

    agg = partial_aggregate(
        ds.map_batches(last, batch_format="pyarrow"),
        ["o_custkey"], [("last_o", "max", "last_o")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    lo = rows.column("last_o").to_numpy(zero_copy_only=False) \
        .astype("datetime64[D]").astype(np.int64)
    mx = int(lo.max()) if len(lo) else 0
    age = mx - lo
    tier = np.where(age < 365, "hot",
                    np.where(age < 730, "warm", "cold"))
    ck, seg = ray.get(cref)
    i = pc.index_in(rows.column("o_custkey"), value_set=ck)
    segs = pc.take(seg, i).to_numpy(zero_copy_only=False)
    t = pa.table({"segment": pa.array(segs), "tier": pa.array(tier),
                  "n_customers": pa.array(np.ones(len(lo), np.int64))})
    res = t.group_by(["segment", "tier"]).aggregate(
        [("n_customers", "sum")])
    return ray.data.from_arrow(pa.table({
        "segment": res.column("segment"),
        "tier": res.column("tier"),
        "n_customers": pc.cast(res.column("n_customers_sum"),
                               pa.int64())}))


def coorder_largest_component(sf_dir: str) -> ray.data.Dataset:
    """Connected-component census of the co-ordered-parts graph: node
    and edge counts, number of components, and the largest component's
    size — union-find over the dimension-bounded deduped edge list
    (the pair exchange is the only data-sized step)."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        bkt = ((ok.astype(np.uint64) * _FIB64) >> np.uint64(56)) \
            .astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = group.column("l_partkey").to_numpy(zero_copy_only=False)
        u = np.unique(np.stack([ok, pk], axis=1), axis=0)
        ok, pk = u[:, 0], u[:, 1]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, len(ok)])
        a_all, b_all = [], []
        for ln in np.unique(lens):
            if ln < 2:
                continue
            segs = starts[lens == ln]
            mat = pk[segs[:, None] + np.arange(ln)]
            ii, jj = np.triu_indices(int(ln), k=1)
            a_all.append(mat[:, ii].ravel())
            b_all.append(mat[:, jj].ravel())
        if not a_all:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        a = np.concatenate(a_all)
        b = np.concatenate(b_all)
        t2 = pa.table({"u": pa.array(np.minimum(a, b)),
                       "v": pa.array(np.maximum(a, b))})
        return t2.group_by(["u", "v"]).aggregate([]).select(["u", "v"])

    edges = pa.concat_tables(list(partial_aggregate(
        li.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bkt").map_groups(bucket_pairs,
                                   batch_format="pyarrow"),
        ["u", "v"], [])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    eu = edges.column("u").to_pylist()
    ev = edges.column("v").to_pylist()
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(eu, ev):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    sizes = {}
    for node in parent:
        r = find(node)
        sizes[r] = sizes.get(r, 0) + 1
    return ray.data.from_arrow(pa.table({
        "n_nodes": pa.array([len(parent)], pa.int64()),
        "n_edges": pa.array([len(eu)], pa.int64()),
        "n_components": pa.array([len(sizes)], pa.int64()),
        "lcc_size": pa.array([max(sizes.values()) if sizes else 0],
                             pa.int64())}))


def core_vocab_mass_ppm(sf_dir: str) -> ray.data.Dataset:
    """Core-vocabulary mass: the share (floor ppm) of ALL token
    occurrences carried by tokens present in EVERY language — how much
    of the corpus is cross-lingual 'core'?  Per-(token, lang) distinct
    counts and per-token totals reduce; the lang-count filter folds."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text"])
    n_langs = len(pc.unique(pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["lang"]).column(0)))

    def counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lang = pc.take(batch.column("lang"),
                       pa.array(np.repeat(np.arange(len(batch)), reps)))
        t = pa.table({"tok": flat, "lang": lang,
                      "n": pa.array(np.ones(len(flat), np.int64))})
        res = t.group_by(["tok", "lang"]).aggregate([("n", "sum")])
        return pa.table({"tok": res.column("tok"),
                         "lang": res.column("lang"),
                         "n": res.column("n_sum")})

    per_tl = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["tok", "lang"], [("n", "sum", "n")])

    def per_tok(batch: pa.Table) -> pa.Table:
        t = pa.table({"tok": batch.column("tok"),
                      "n": batch.column("n"),
                      "nl": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["tok"]).aggregate([("n", "sum"),
                                             ("nl", "sum")])
        return pa.table({"tok": res.column("tok"),
                         "n": res.column("n_sum"),
                         "nl": res.column("nl_sum")})

    agg = partial_aggregate(
        per_tl.map_batches(per_tok, batch_format="pyarrow"),
        ["tok"], [("n", "sum", "n"), ("nl", "sum", "nl")])

    def fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        nl = batch.column("nl").to_numpy(zero_copy_only=False)
        core = nl == n_langs
        return pa.table({
            "total": pa.array([int(n.sum())], pa.int64()),
            "core": pa.array([int(n[core].sum())], pa.int64()),
            "n_core_tokens": pa.array([int(core.sum())], pa.int64())})

    parts = pa.concat_tables(list(
        agg.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    total = int(pc.sum(parts.column("total")).as_py() or 0)
    core = int(pc.sum(parts.column("core")).as_py() or 0)
    nct = int(pc.sum(parts.column("n_core_tokens")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "n_occurrences": pa.array([total], pa.int64()),
        "core_occurrences": pa.array([core], pa.int64()),
        "n_core_tokens": pa.array([nct], pa.int64()),
        "core_mass_ppm": pa.array([(1_000_000 * core)
                                   // max(total, 1)], pa.int64())}))


def duplicate_order_suspects(sf_dir: str) -> ray.data.Dataset:
    """Double-submission audit: groups of orders sharing (customer,
    date, total cents) with ≥2 members — the business-key duplicate
    check that surrogate keys hide.  Group sizes reduce keyed on the
    composite; only suspect groups fold."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_totalprice"])

    def keyed(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "day": pc.floor_temporal(
                          batch.column("o_orderdate"), unit="day"),
                      "cents": pa.array(cents),
                      "n": pa.array(np.ones(len(cents), np.int64))})
        res = t.group_by(["o_custkey", "day", "cents"]).aggregate(
            [("n", "sum")])
        return pa.table({"o_custkey": res.column("o_custkey"),
                         "day": res.column("day"),
                         "cents": res.column("cents"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(keyed, batch_format="pyarrow"),
        ["o_custkey", "day", "cents"], [("n", "sum", "n")])

    def fold(batch: pa.Table) -> pa.Table:
        sus = batch.filter(pc.greater_equal(batch.column("n"), 2))
        n = sus.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_suspect_groups": pa.array([len(sus)], pa.int64()),
            "n_suspect_orders": pa.array([int(n.sum())], pa.int64())})

    parts = pa.concat_tables(list(
        agg.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    return ray.data.from_arrow(pa.table({
        "n_suspect_groups": pa.array([int(pc.sum(
            parts.column("n_suspect_groups")).as_py() or 0)],
            pa.int64()),
        "n_suspect_orders": pa.array([int(pc.sum(
            parts.column("n_suspect_orders")).as_py() or 0)],
            pa.int64())}))


def monetization_by_activity_decile(sf_dir: str) -> ray.data.Dataset:
    """Engagement→monetization curve: users ranked into activity
    deciles by event count (deterministic rank ties on user id), each
    decile's purchase share of events (floor ppm) — does usage convert?
    Per-user counters reduce; ranking folds on the user-bounded
    table."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def per_user(batch: pa.Table) -> pa.Table:
        p = pc.cast(pc.equal(batch.column("event_type"), "purchase"),
                    pa.int64())
        t = pa.table({"user_id": batch.column("user_id"),
                      "n_events": pa.array(np.ones(len(batch),
                                                   np.int64)),
                      "n_purch": p})
        res = t.group_by(["user_id"]).aggregate(
            [("n_events", "sum"), ("n_purch", "sum")])
        return pa.table({"user_id": res.column("user_id"),
                         "n_events": res.column("n_events_sum"),
                         "n_purch": res.column("n_purch_sum")})

    agg = partial_aggregate(
        ds.map_batches(per_user, batch_format="pyarrow"),
        ["user_id"], [("n_events", "sum", "n_events"),
                      ("n_purch", "sum", "n_purch")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    uid = rows.column("user_id").to_numpy(zero_copy_only=False)
    ne = rows.column("n_events").to_numpy(zero_copy_only=False)
    np_ = rows.column("n_purch").to_numpy(zero_copy_only=False)
    rank = np.empty(len(uid), np.int64)
    rank[np.lexsort((uid, ne))] = np.arange(len(uid))
    decile = (10 * rank) // max(len(uid), 1)
    t = pa.table({"decile": pa.array(decile),
                  "n_events": pa.array(ne), "n_purch": pa.array(np_)})
    res = t.group_by(["decile"]).aggregate(
        [("n_events", "sum"), ("n_purch", "sum")])
    e = res.column("n_events_sum").to_numpy(zero_copy_only=False)
    p = res.column("n_purch_sum").to_numpy(zero_copy_only=False)
    return ray.data.from_arrow(pa.table({
        "decile": res.column("decile"),
        "n_events": pa.array(e), "n_purchases": pa.array(p),
        "purchase_ppm": pa.array((1_000_000 * p)
                                 // np.where(e == 0, 1, e))}))


def bigram_holdout_coverage(sf_dir: str) -> ray.data.Dataset:
    """LM-style generalization probe: the 1/16 held-out docs' bigram
    coverage by the training split's bigram vocabulary (floor ppm of
    distinct test bigrams seen in train) — sampled split by the
    deterministic doc-id hash, bigram sets deduped through keyed
    exchanges."""
    import hashlib
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def bigrams(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        test = np.fromiter(
            (hashlib.md5(str(d).encode()).hexdigest()[0] == "0"
             for d in ids), bool, count=len(ids))
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(len(batch)), reps)
        same = doc[1:] == doc[:-1]
        bg = np.char.add(np.char.add(flat[:-1][same].astype(str), " "),
                         flat[1:][same].astype(str))
        is_test = np.repeat(test, reps)[:-1][same]
        t = pa.table({"bigram": pa.array(bg),
                      "in_train": pa.array(
                          (~is_test).astype(np.int64)),
                      "in_test": pa.array(is_test.astype(np.int64))})
        res = t.group_by(["bigram"]).aggregate(
            [("in_train", "max"), ("in_test", "max")])
        return pa.table({"bigram": res.column("bigram"),
                         "in_train": res.column("in_train_max"),
                         "in_test": res.column("in_test_max")})

    agg = partial_aggregate(
        ds.map_batches(bigrams, batch_format="pyarrow"),
        ["bigram"], [("in_train", "max", "in_train"),
                     ("in_test", "max", "in_test")])

    def fold(batch: pa.Table) -> pa.Table:
        tr = batch.column("in_train").to_numpy(zero_copy_only=False)
        te = batch.column("in_test").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_test_bigrams": pa.array([int(te.sum())], pa.int64()),
            "n_seen": pa.array([int((te & tr).sum())], pa.int64())})

    parts = pa.concat_tables(list(
        agg.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    nt = int(pc.sum(parts.column("n_test_bigrams")).as_py() or 0)
    ns = int(pc.sum(parts.column("n_seen")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "n_test_bigrams": pa.array([nt], pa.int64()),
        "n_seen": pa.array([ns], pa.int64()),
        "coverage_ppm": pa.array([(1_000_000 * ns) // max(nt, 1)],
                                 pa.int64())}))


def error_rate_churn_matrix(sf_dir: str, stale_days: int = 30
                            ) -> ray.data.Dataset:
    """Risk matrix: users cross-classified by error-event share decile
    (0-10, per 100k ppm) and staleness (>30 days since last event vs
    active) — do bad experiences precede churn?  Per-user counters
    reduce; the matrix folds on the user-bounded table."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def per_user(batch: pa.Table) -> pa.Table:
        err = pc.cast(pc.equal(batch.column("event_type"), "error"),
                      pa.int64())
        t = pa.table({"user_id": batch.column("user_id"),
                      "n": pa.array(np.ones(len(batch), np.int64)),
                      "n_err": err, "last_ts": batch.column("ts")})
        res = t.group_by(["user_id"]).aggregate(
            [("n", "sum"), ("n_err", "sum"), ("last_ts", "max")])
        return pa.table({"user_id": res.column("user_id"),
                         "n": res.column("n_sum"),
                         "n_err": res.column("n_err_sum"),
                         "last_ts": res.column("last_ts_max")})

    agg = partial_aggregate(
        ds.map_batches(per_user, batch_format="pyarrow"),
        ["user_id"], [("n", "sum", "n"), ("n_err", "sum", "n_err"),
                      ("last_ts", "max", "last_ts")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    n = rows.column("n").to_numpy(zero_copy_only=False)
    ne = rows.column("n_err").to_numpy(zero_copy_only=False)
    last = rows.column("last_ts").to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    cutoff = int(last.max()) - stale_days * 86_400_000_000
    bucket = ((1_000_000 * ne) // np.where(n == 0, 1, n)) // 100_000
    stale = np.where(last < cutoff, "stale", "active")
    t = pa.table({"err_bucket": pa.array(bucket),
                  "status": pa.array(stale),
                  "n_users": pa.array(np.ones(len(n), np.int64))})
    res = t.group_by(["err_bucket", "status"]).aggregate(
        [("n_users", "sum")])
    return ray.data.from_arrow(pa.table({
        "err_bucket": res.column("err_bucket"),
        "status": res.column("status"),
        "n_users": pc.cast(res.column("n_users_sum"), pa.int64())}))


def monthly_value_p90(sf_dir: str) -> pa.Table:
    """Quantile tracking over time: the exact p90 of order value per
    calendar month — the SLA-style percentile time series, computed by
    the grouped histogram-refinement selection (month keys are
    calendar-bounded; no per-month sort of raw values)."""
    from ..functions.quantiles import grouped_exact_quantiles
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        m = pc.floor_temporal(batch.column("o_orderdate"), unit="month")
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.float64)
        return pa.table({"month": pc.strftime(m, format="%Y-%m"),
                         "cents": pa.array(cents)})

    keyed = ds.map_batches(prep, batch_format="pyarrow")
    return grouped_exact_quantiles(keyed, "month", "cents", qs=(0.9,))


def intermittent_parts(sf_dir: str) -> ray.data.Dataset:
    """Intermittent-demand census: (part, year) gaps where the part
    sold the year BEFORE and the year AFTER but not that year — the
    101 pattern inventory planners flag.  Distinct (part, year)
    presence reduces; the neighbor test is a per-part vectorized
    membership check."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_shipdate"])

    def pairs(batch: pa.Table) -> pa.Table:
        year = pc.cast(pc.year(batch.column("l_shipdate")), pa.int64())
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "year": year})
        return t.group_by(["l_partkey", "year"]).aggregate([]) \
            .select(["l_partkey", "year"])

    distinct = partial_aggregate(
        li.map_batches(pairs, batch_format="pyarrow"),
        ["l_partkey", "year"], [])

    def per_part(group: pa.Table) -> pa.Table:
        y = np.sort(group.column("year").to_numpy(zero_copy_only=False))
        present = set(y.tolist())
        holes = sum(1 for yy in range(int(y.min()), int(y.max()) + 1)
                    if yy not in present
                    and (yy - 1) in present and (yy + 1) in present)
        if holes == 0:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "n_holes": pa.array([], pa.int64())})
        return pa.table({
            "l_partkey": group.column("l_partkey").slice(0, 1),
            "n_holes": pa.array([holes], pa.int64())})

    per = distinct.groupby("l_partkey").map_groups(
        per_part, batch_format="pyarrow")
    rows = pa.concat_tables(
        [pa.table({"l_partkey": pa.array([], pa.int64()),
                   "n_holes": pa.array([], pa.int64())})]
        + list(per.iter_batches(batch_format="pyarrow",
                                batch_size=None)))
    nh = rows.column("n_holes").to_numpy(zero_copy_only=False)
    return ray.data.from_arrow(pa.table({
        "n_intermittent_parts": pa.array([len(rows)], pa.int64()),
        "n_gap_years": pa.array([int(nh.sum()) if len(nh) else 0],
                                pa.int64())}))


def customer_top2_gap_hist(sf_dir: str) -> ray.data.Dataset:
    """Runner-up gap: for customers with ≥2 orders, the cents gap
    between their top and second order values, bucketed by
    floor(log2(gap)) (-1 for ties) — the auction-style dominance
    metric, one partial top-2 per group."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])

    def per_cust(group: pa.Table) -> pa.Table:
        cents = np.sort(np.rint(group.column("o_totalprice")
                                .to_numpy(zero_copy_only=False) * 100)
                        .astype(np.int64))
        if len(cents) < 2:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n_customers": pa.array([], pa.int64())})
        gap = int(cents[-1] - cents[-2])
        b = int(np.floor(np.log2(gap))) if gap > 0 else -1
        return pa.table({"bucket": pa.array([b], pa.int64()),
                         "n_customers": pa.array([1], pa.int64())})

    per = ds.groupby("o_custkey").map_groups(per_cust,
                                             batch_format="pyarrow")
    return partial_aggregate(per, ["bucket"],
                             [("n_customers", "sum", "n_customers")])


def price_fd_violations(sf_dir: str) -> ray.data.Dataset:
    """Functional-dependency mining: does (brand, size) determine
    retail price?  Count the determinant groups and those holding >1
    distinct price — the schema-inference primitive.  Distinct
    triples reduce, then per-group distinct counts fold."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_brand", "p_size",
                                     "p_retailprice"])

    def triples(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("p_retailprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"p_brand": batch.column("p_brand"),
                      "p_size": pc.cast(batch.column("p_size"),
                                        pa.int64()),
                      "cents": pa.array(cents)})
        return t.group_by(["p_brand", "p_size", "cents"]) \
            .aggregate([]).select(["p_brand", "p_size", "cents"])

    distinct = partial_aggregate(
        ds.map_batches(triples, batch_format="pyarrow"),
        ["p_brand", "p_size", "cents"], [])

    def per_group(batch: pa.Table) -> pa.Table:
        res = batch.group_by(["p_brand", "p_size"]).aggregate(
            [("cents", "count")])
        return pa.table({"p_brand": res.column("p_brand"),
                         "p_size": res.column("p_size"),
                         "n_prices": pc.cast(res.column("cents_count"),
                                             pa.int64())})

    per = partial_aggregate(
        distinct.map_batches(per_group, batch_format="pyarrow"),
        ["p_brand", "p_size"], [("n_prices", "sum", "n_prices")])

    def fold(batch: pa.Table) -> pa.Table:
        viol = pc.greater(batch.column("n_prices"), 1)
        return pa.table({
            "n_groups": pa.array([len(batch)], pa.int64()),
            "n_violating": pa.array(
                [int(pc.sum(pc.cast(viol, pa.int64())).as_py() or 0)],
                pa.int64())})

    parts = pa.concat_tables(list(
        per.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    return ray.data.from_arrow(pa.table({
        "n_groups": pa.array([int(pc.sum(
            parts.column("n_groups")).as_py() or 0)], pa.int64()),
        "n_violating": pa.array([int(pc.sum(
            parts.column("n_violating")).as_py() or 0)], pa.int64())}))


def worst_5day_window(sf_dir: str, window: int = 5) -> ray.data.Dataset:
    """Drawdown detection: the contiguous 5-calendar-day window with
    the LOWEST total revenue (gap days count as zero; earliest start
    wins ties) — the sliding-min dual of the peak finder, swept over
    the dense calendar-bounded series."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def daily(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("o_orderdate"), unit="day")
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"day": day, "cents": pa.array(cents)})
        res = t.group_by(["day"]).aggregate([("cents", "sum")])
        return pa.table({"day": res.column("day"),
                         "cents": res.column("cents_sum")})

    agg = partial_aggregate(
        ds.map_batches(daily, batch_format="pyarrow"),
        ["day"], [("cents", "sum", "cents")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    day = rows.column("day").to_numpy(zero_copy_only=False) \
        .astype("datetime64[D]").astype(np.int64)
    cents = rows.column("cents").to_numpy(zero_copy_only=False)
    order = np.argsort(day)
    day, cents = day[order], cents[order]
    full = np.arange(day[0], day[-1] + 1)
    dense = np.zeros(len(full), np.int64)
    dense[np.searchsorted(full, day)] = cents
    if len(full) < window:
        sums = np.array([dense.sum()])
        starts = np.array([full[0]])
    else:
        cs = np.r_[0, np.cumsum(dense)]
        sums = cs[window:] - cs[:-window]
        starts = full[:len(sums)]
    i = int(np.argmin(sums))         # first min = earliest start
    return ray.data.from_arrow(pa.table({
        "start_day": pa.array([starts[i].astype("datetime64[D]")
                               .astype("datetime64[us]")],
                              pa.timestamp("us")),
        "window_cents": pa.array([int(sums[i])], pa.int64())}))


def snapshot_staleness_by_type(sf_dir: str) -> ray.data.Dataset:
    """Freshness SLO accounting: if a consumer snapshot refreshes at
    each midnight, how stale is every event when first served?  Per
    type the total and max (next-midnight − ts) lag in µs — pure
    vectorized date arithmetic."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"])

    def lag(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        nxt_mid = (ts // 86_400_000_000 + 1) * 86_400_000_000
        d = nxt_mid - ts
        t = pa.table({"event_type": batch.column("event_type"),
                      "n": pa.array(np.ones(len(d), np.int64)),
                      "total_lag_us": pa.array(d),
                      "max_lag_us": pa.array(d)})
        res = t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("total_lag_us", "sum"),
             ("max_lag_us", "max")])
        return pa.table({"event_type": res.column("event_type"),
                         "n": res.column("n_sum"),
                         "total_lag_us": res.column("total_lag_us_sum"),
                         "max_lag_us": res.column("max_lag_us_max")})

    return partial_aggregate(
        ds.map_batches(lag, batch_format="pyarrow"),
        ["event_type"], [("n", "sum", "n"),
                         ("total_lag_us", "sum", "total_lag_us"),
                         ("max_lag_us", "max", "max_lag_us")])


def premium_sku_counts(sf_dir: str) -> ray.data.Dataset:
    """Premium-tier census: per brand, parts priced strictly above the
    brand's own lower-p90 price — the robust 'top decile of our own
    catalog' tiering, computed inside each brand group (brand catalogs
    are dimension-bounded)."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_brand", "p_retailprice"])

    def per_brand(group: pa.Table) -> pa.Table:
        cents = np.rint(group.column("p_retailprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        # quantile_disc rank = ceil(n·q) − 1
        idx = -((-9 * len(cents)) // 10) - 1
        p90 = np.sort(cents, kind="stable")[idx]
        return pa.table({
            "p_brand": group.column("p_brand").slice(0, 1),
            "n_parts": pa.array([len(cents)], pa.int64()),
            "n_premium": pa.array([int((cents > p90).sum())],
                                  pa.int64()),
            "p90_cents": pa.array([int(p90)], pa.int64())})

    return ds.groupby("p_brand").map_groups(per_brand,
                                            batch_format="pyarrow")


def nation_median_of_customer_medians(sf_dir: str) -> ray.data.Dataset:
    """Nested robust center: per nation, the lower-median of its
    customers' OWN median order values — the two-level statistic that
    resists both whale customers and whale orders.  Inner medians run
    per customer group; the outer median folds per nation (both
    dimensions bounded)."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cref = ray.put((cust.column("c_custkey").combine_chunks(),
                    pc.cast(cust.column("c_nationkey").combine_chunks(),
                            pa.int64())))
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])

    def per_cust(group: pa.Table) -> pa.Table:
        cents = np.sort(np.rint(group.column("o_totalprice")
                                .to_numpy(zero_copy_only=False) * 100)
                        .astype(np.int64))
        med = int(cents[(len(cents) - 1) // 2])
        return pa.table({
            "o_custkey": group.column("o_custkey").slice(0, 1),
            "med_cents": pa.array([med], pa.int64())})

    per = ds.groupby("o_custkey").map_groups(per_cust,
                                             batch_format="pyarrow")
    rows = pa.concat_tables(list(per.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    ck, cnk = ray.get(cref)
    i = pc.index_in(rows.column("o_custkey"), value_set=ck)
    nat = pc.take(cnk, i).to_numpy(zero_copy_only=False)
    med = rows.column("med_cents").to_numpy(zero_copy_only=False)
    nats = np.unique(nat)
    out_n, out_m, out_c = [], [], []
    for n in nats:
        vals = np.sort(med[nat == n])
        out_n.append(int(n))
        out_m.append(int(vals[(len(vals) - 1) // 2]))
        out_c.append(len(vals))
    return ray.data.from_arrow(pa.table({
        "nationkey": pa.array(out_n, pa.int64()),
        "median_of_medians_cents": pa.array(out_m, pa.int64()),
        "n_customers": pa.array(out_c, pa.int64())}))


def frequent_part_triples(sf_dir: str, min_support: int = 2,
                          n: int = 5) -> ray.data.Dataset:
    """Frequent 3-itemsets (the Apriori step beyond pairs): part
    triples co-ordered in ≥2 orders, top-5 by support — triple
    generation stays inside order groups (bucketed), supports reduce
    keyed on the triple."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        bkt = ((ok.astype(np.uint64) * _FIB64) >> np.uint64(56)) \
            .astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt))

    def bucket_triples(group: pa.Table) -> pa.Table:
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = group.column("l_partkey").to_numpy(zero_copy_only=False)
        u = np.unique(np.stack([ok, pk], axis=1), axis=0)
        ok, pk = u[:, 0], u[:, 1]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, len(ok)])
        a_all, b_all, c_all = [], [], []
        from itertools import combinations
        for ln in np.unique(lens):
            if ln < 3:
                continue
            segs = starts[lens == ln]
            mat = np.sort(pk[segs[:, None] + np.arange(ln)], axis=1)
            idx = np.array(list(combinations(range(int(ln)), 3)))
            a_all.append(mat[:, idx[:, 0]].ravel())
            b_all.append(mat[:, idx[:, 1]].ravel())
            c_all.append(mat[:, idx[:, 2]].ravel())
        if not a_all:
            return pa.table({"pa_": pa.array([], pa.int64()),
                             "pb_": pa.array([], pa.int64()),
                             "pc_": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64())})
        t = pa.table({"pa_": pa.array(np.concatenate(a_all)),
                      "pb_": pa.array(np.concatenate(b_all)),
                      "pc_": pa.array(np.concatenate(c_all)),
                      "one": pa.array(np.ones(
                          sum(len(x) for x in a_all), np.int64))})
        res = t.group_by(["pa_", "pb_", "pc_"]).aggregate(
            [("one", "sum")])
        return pa.table({"pa_": res.column("pa_"),
                         "pb_": res.column("pb_"),
                         "pc_": res.column("pc_"),
                         "n_orders": res.column("one_sum")})

    triples = partial_aggregate(
        li.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bkt").map_groups(bucket_triples,
                                   batch_format="pyarrow"),
        ["pa_", "pb_", "pc_"], [("n_orders", "sum", "n_orders")])
    freq = triples.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n_orders"),
                                            min_support)),
        batch_format="pyarrow")
    seed = pa.table({"pa_": pa.array([], pa.int64()),
                     "pb_": pa.array([], pa.int64()),
                     "pc_": pa.array([], pa.int64()),
                     "n_orders": pa.array([], pa.int64())})
    tab = pa.concat_tables([seed] + list(freq.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    df = tab.to_pandas().sort_values(
        ["n_orders", "pa_", "pb_", "pc_"],
        ascending=[False, True, True, True]).head(n)
    return ray.data.from_arrow(pa.Table.from_pandas(
        df.rename(columns={"pa_": "part_a", "pb_": "part_b",
                           "pc_": "part_c"}), preserve_index=False))


def user_value_temporal_spearman(sf_dir: str,
                                 split: str = "2024-01-16"
                                 ) -> ray.data.Dataset:
    """Predictive-stability probe: users ranked by value BEFORE the
    split date versus AFTER it — the Spearman numerator Σd² says
    whether past value predicts future value.  Only users active in
    both halves rank."""
    cut = np.datetime64(split, "us").astype(np.int64)
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        before = ts < cut
        t = pa.table({"user_id": batch.column("user_id"),
                      "c_before": pa.array(np.where(before, cents, 0)),
                      "c_after": pa.array(np.where(before, 0, cents)),
                      "n_before": pa.array(before.astype(np.int64)),
                      "n_after": pa.array((~before).astype(np.int64))})
        res = t.group_by(["user_id"]).aggregate(
            [("c_before", "sum"), ("c_after", "sum"),
             ("n_before", "sum"), ("n_after", "sum")])
        return pa.table({"user_id": res.column("user_id"),
                         "c_before": res.column("c_before_sum"),
                         "c_after": res.column("c_after_sum"),
                         "n_before": res.column("n_before_sum"),
                         "n_after": res.column("n_after_sum")})

    agg = partial_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["user_id"], [("c_before", "sum", "c_before"),
                      ("c_after", "sum", "c_after"),
                      ("n_before", "sum", "n_before"),
                      ("n_after", "sum", "n_after")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    nb = rows.column("n_before").to_numpy(zero_copy_only=False)
    na = rows.column("n_after").to_numpy(zero_copy_only=False)
    keep = (nb > 0) & (na > 0)
    uid = rows.column("user_id").to_numpy(zero_copy_only=False)[keep]
    cb = rows.column("c_before").to_numpy(zero_copy_only=False)[keep]
    ca = rows.column("c_after").to_numpy(zero_copy_only=False)[keep]
    r1 = np.empty(len(uid), np.int64)
    r1[np.lexsort((uid, -cb))] = np.arange(1, len(uid) + 1)
    r2 = np.empty(len(uid), np.int64)
    r2[np.lexsort((uid, -ca))] = np.arange(1, len(uid) + 1)
    d = r1 - r2
    return ray.data.from_arrow(pa.table({
        "n_users": pa.array([len(uid)], pa.int64()),
        "sum_d2": pa.array([int((d * d).sum())], pa.int64())}))


def stream_outage_audit(sf_dir: str, gap_minutes: int = 60
                        ) -> ray.data.Dataset:
    """Pipeline-outage detector: silent gaps in the MERGED event stream
    at minute grain — count of silences longer than an hour and the
    longest silence.  Distinct active minutes reduce; the gap sweep
    folds on that calendar-bounded list."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts"])

    def minutes(batch: pa.Table) -> pa.Table:
        m = pc.floor_temporal(batch.column("ts"), unit="minute")
        return pa.table({"minute": pc.unique(m)})

    distinct = partial_aggregate(
        ds.map_batches(minutes, batch_format="pyarrow"), ["minute"], [])
    rows = pa.concat_tables(list(distinct.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    m = np.sort(rows.column("minute").to_numpy(zero_copy_only=False)
                .astype("datetime64[m]").astype(np.int64))
    gaps = np.diff(m) - 1            # silent minutes between actives
    big = gaps[gaps >= gap_minutes]
    return ray.data.from_arrow(pa.table({
        "n_active_minutes": pa.array([len(m)], pa.int64()),
        "n_outages": pa.array([len(big)], pa.int64()),
        "longest_gap_minutes": pa.array(
            [int(gaps.max()) if len(gaps) else 0], pa.int64())}))


def purchase_hazard_table(sf_dir: str, max_k: int = 7
                          ) -> ray.data.Dataset:
    """Discrete survival/hazard table for repurchase: gaps between a
    user's consecutive purchases (floor days); for k = 1..7, how many
    gaps were AT RISK at day k (≥ k−1) and how many converted that day
    (in [k−1, k)) — the retention-curve denominator/numerator pairs.
    Gap histograms reduce; the at-risk cumulative folds."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def gaps(group: pa.Table) -> pa.Table:
        keep = pc.equal(group.column("event_type"), "purchase")
        g = group.filter(keep)
        if len(g) < 2:
            return pa.table({"gap_days": pa.array([], pa.int64())})
        ts = g.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        d = np.diff(ts[order]) // 86_400_000_000
        return pa.table({"gap_days": pa.array(d)})

    gap_ds = ds.groupby("user_id").map_groups(gaps,
                                              batch_format="pyarrow")

    def hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"gap_days": batch.column("gap_days"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["gap_days"]).aggregate([("n", "sum")])
        return pa.table({"gap_days": res.column("gap_days"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        gap_ds.map_batches(hist, batch_format="pyarrow"),
        ["gap_days"], [("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    gd = rows.column("gap_days").to_numpy(zero_copy_only=False)
    n = rows.column("n").to_numpy(zero_copy_only=False)
    total = int(n.sum())
    ks, at_risk, events = [], [], []
    for k in range(1, max_k + 1):
        ks.append(k)
        at_risk.append(int(n[gd >= k - 1].sum()))
        events.append(int(n[gd == k - 1].sum()))
    return ray.data.from_arrow(pa.table({
        "k_days": pa.array(ks, pa.int64()),
        "n_at_risk": pa.array(at_risk, pa.int64()),
        "n_events": pa.array(events, pa.int64()),
        "n_gaps_total": pa.array([total] * max_k, pa.int64())}))


def score_calibration_lift(sf_dir: str, split: str = "2024-01-21"
                           ) -> ray.data.Dataset:
    """Feature-calibration lift table: users scored by FIRST-20-DAYS
    value, bucketed into score deciles, and each decile's FUTURE value
    (after the split) reported — does the feature rank the future?
    Both windows fold in one pass; ranking runs on the user-bounded
    table."""
    cut = np.datetime64(split, "us").astype(np.int64)
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "value"])

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        before = ts < cut
        t = pa.table({"user_id": batch.column("user_id"),
                      "score": pa.array(np.where(before, cents, 0)),
                      "future": pa.array(np.where(before, 0, cents))})
        res = t.group_by(["user_id"]).aggregate(
            [("score", "sum"), ("future", "sum")])
        return pa.table({"user_id": res.column("user_id"),
                         "score": res.column("score_sum"),
                         "future": res.column("future_sum")})

    agg = partial_aggregate(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["user_id"], [("score", "sum", "score"),
                      ("future", "sum", "future")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    uid = rows.column("user_id").to_numpy(zero_copy_only=False)
    sc = rows.column("score").to_numpy(zero_copy_only=False)
    fu = rows.column("future").to_numpy(zero_copy_only=False)
    rank = np.empty(len(uid), np.int64)
    rank[np.lexsort((uid, sc))] = np.arange(len(uid))
    decile = (10 * rank) // max(len(uid), 1)
    t = pa.table({"decile": pa.array(decile),
                  "n_users": pa.array(np.ones(len(uid), np.int64)),
                  "future_cents": pa.array(fu)})
    res = t.group_by(["decile"]).aggregate(
        [("n_users", "sum"), ("future_cents", "sum")])
    return ray.data.from_arrow(pa.table({
        "decile": res.column("decile"),
        "n_users": pc.cast(res.column("n_users_sum"), pa.int64()),
        "future_cents": pc.cast(res.column("future_cents_sum"),
                                pa.int64())}))


def unattributed_purchase_share(sf_dir: str, window_hours: int = 24
                                ) -> ray.data.Dataset:
    """Organic-purchase share: purchases with NO non-purchase event in
    the user's preceding 24 h (nothing to attribute) — the complement
    of the attribution models, floor ppm."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        t, ty = ts[order], types[order]
        w = window_hours * 3_600_000_000
        is_p = ty == "purchase"
        non_p_idx = np.flatnonzero(~is_p)
        n_un = 0
        for i in np.flatnonzero(is_p):
            cand = non_p_idx[non_p_idx < i]
            if len(cand) == 0 or t[cand[-1]] < t[i] - w:
                n_un += 1
        return pa.table({
            "n_purchases": pa.array([int(is_p.sum())], pa.int64()),
            "n_unattributed": pa.array([n_un], pa.int64())})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    rows = pa.concat_tables(list(per.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    np_ = int(pc.sum(rows.column("n_purchases")).as_py() or 0)
    nu = int(pc.sum(rows.column("n_unattributed")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "n_purchases": pa.array([np_], pa.int64()),
        "n_unattributed": pa.array([nu], pa.int64()),
        "unattributed_ppm": pa.array([(1_000_000 * nu) // max(np_, 1)],
                                     pa.int64())}))


def nation_dow_mix_l1(sf_dir: str) -> ray.data.Dataset:
    """Segment-divergence profile: each nation's order day-of-week mix
    versus the GLOBAL mix, as the scale-free L1 numerator
    Σ_d |n_nation(d)·T_global − n_global(d)·T_nation| — which markets
    march to a different weekly drum?  The nation×dow grid is doubly
    bounded; the divergence folds on it."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cref = ray.put((cust.column("c_custkey").combine_chunks(),
                    pc.cast(cust.column("c_nationkey").combine_chunks(),
                            pa.int64())))
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate"])

    def cells(batch: pa.Table) -> pa.Table:
        ck, cnk = ray.get(cref)
        i = pc.index_in(batch.column("o_custkey"), value_set=ck)
        dow = pc.cast(pc.day_of_week(batch.column("o_orderdate"),
                                     count_from_zero=False,
                                     week_start=1), pa.int64())
        t = pa.table({"nationkey": pc.take(cnk, i), "dow": dow,
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["nationkey", "dow"]).aggregate([("n", "sum")])
        return pa.table({"nationkey": res.column("nationkey"),
                         "dow": res.column("dow"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["nationkey", "dow"], [("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    nk = rows.column("nationkey").to_numpy(zero_copy_only=False)
    dow = rows.column("dow").to_numpy(zero_copy_only=False)
    n = rows.column("n").to_numpy(zero_copy_only=False)
    nats, ni = np.unique(nk, return_inverse=True)
    grid = np.zeros((len(nats), 7), np.int64)
    grid[ni, dow - 1] = n
    gl = grid.sum(axis=0)
    tg = int(gl.sum())
    tn = grid.sum(axis=1)
    l1 = np.abs(grid * tg - gl[None, :] * tn[:, None]).sum(axis=1)
    return ray.data.from_arrow(pa.table({
        "nationkey": pa.array(nats),
        "n_orders": pa.array(tn),
        "l1_num": pa.array(l1.astype(np.float64))}))


def session_3step_funnel(sf_dir: str, gap_seconds: int = 1800
                         ) -> ray.data.Dataset:
    """Strict ordered 3-step funnel inside sessions: view → later click
    → later purchase, all within one 30-min-gap session — the
    subsequence-exists test, swept per session with three first-index
    scans."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        t, ty = ts[order], types[order]
        brk = np.r_[0, np.flatnonzero(np.diff(t)
                                      > gap_seconds * 1_000_000) + 1,
                    len(t)]
        n_sessions = len(brk) - 1
        n_view = n_full = 0
        for s, e in zip(brk[:-1], brk[1:]):
            seg = ty[s:e]
            vi = np.flatnonzero(seg == "view")
            if len(vi) == 0:
                continue
            n_view += 1
            ci = np.flatnonzero(seg[vi[0] + 1:] == "click")
            if len(ci) == 0:
                continue
            pi = np.flatnonzero(seg[vi[0] + 1 + ci[0] + 1:]
                                == "purchase")
            if len(pi):
                n_full += 1
        return pa.table({
            "n_sessions": pa.array([n_sessions], pa.int64()),
            "n_view_sessions": pa.array([n_view], pa.int64()),
            "n_full_funnel": pa.array([n_full], pa.int64())})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    rows = pa.concat_tables(list(per.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    out = {c: pa.array([int(pc.sum(rows.column(c)).as_py() or 0)],
                       pa.int64())
           for c in ("n_sessions", "n_view_sessions", "n_full_funnel")}
    return ray.data.from_arrow(pa.table(out))


def corpus_simpson_index(sf_dir: str) -> ray.data.Dataset:
    """Simpson diversity of the corpus vocabulary without floats: the
    collision numerator Σ f_tok² alongside total occurrences (the
    repeat-draw probability is Σf²/T²) — the lexical-diversity dual of
    entropy, exactly mergeable."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def counts(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(batch.column("text"),
                                                " "))
        t = pa.table({"tok": flat,
                      "n": pa.array(np.ones(len(flat), np.int64))})
        res = t.group_by(["tok"]).aggregate([("n", "sum")])
        return pa.table({"tok": res.column("tok"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["tok"], [("n", "sum", "n")])

    def fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            "total": pa.array([int(n.sum())], pa.int64()),
            "sum_f2": pa.array([int((n * n).sum())], pa.int64()),
            "n_types": pa.array([len(n)], pa.int64())})

    parts = pa.concat_tables(list(
        agg.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    return ray.data.from_arrow(pa.table({
        "n_occurrences": pa.array([int(pc.sum(
            parts.column("total")).as_py() or 0)], pa.int64()),
        "sum_f2": pa.array([int(pc.sum(
            parts.column("sum_f2")).as_py() or 0)], pa.int64()),
        "n_types": pa.array([int(pc.sum(
            parts.column("n_types")).as_py() or 0)], pa.int64())}))


def supplier_share_movers(sf_dir: str, split_year: int = 1998,
                          n: int = 10) -> ray.data.Dataset:
    """Market-share movers: each supplier's revenue share (floor ppm)
    before vs from the split year, top-10 by absolute share delta —
    the competitive-shift leaderboard.  Era partials reduce per
    supplier; shares and the delta rank fold on the supplier-bounded
    table."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_suppkey", "l_shipdate",
                                     "l_extendedprice"])

    def partials(batch: pa.Table) -> pa.Table:
        year = pc.year(batch.column("l_shipdate")) \
            .to_numpy(zero_copy_only=False)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        before = year < split_year
        t = pa.table({"l_suppkey": batch.column("l_suppkey"),
                      "cb": pa.array(np.where(before, cents, 0)),
                      "ca": pa.array(np.where(before, 0, cents))})
        res = t.group_by(["l_suppkey"]).aggregate(
            [("cb", "sum"), ("ca", "sum")])
        return pa.table({"l_suppkey": res.column("l_suppkey"),
                         "cb": res.column("cb_sum"),
                         "ca": res.column("ca_sum")})

    agg = partial_aggregate(
        li.map_batches(partials, batch_format="pyarrow"),
        ["l_suppkey"], [("cb", "sum", "cb"), ("ca", "sum", "ca")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    sk = rows.column("l_suppkey").to_numpy(zero_copy_only=False)
    cb = rows.column("cb").to_numpy(zero_copy_only=False)
    ca = rows.column("ca").to_numpy(zero_copy_only=False)
    tb, ta = int(cb.sum()), int(ca.sum())
    sb = (1_000_000 * cb) // max(tb, 1)
    sa = (1_000_000 * ca) // max(ta, 1)
    delta = sa - sb
    order = np.lexsort((sk, -np.abs(delta)))[:n]
    return ray.data.from_arrow(pa.table({
        "l_suppkey": pa.array(sk[order]),
        "share_before_ppm": pa.array(sb[order]),
        "share_after_ppm": pa.array(sa[order]),
        "delta_ppm": pa.array(delta[order])}))


def popular_part_antipairs(sf_dir: str, k: int = 20
                           ) -> ray.data.Dataset:
    """Negative association mining: among the top-20 most-ordered
    parts, the pairs that NEVER co-occur in an order (substitute
    suspects).  The head set broadcasts; co-order pairs restricted to
    it reduce; the complement folds on the k²-bounded grid."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def counts(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["l_partkey"]).aggregate([("n", "sum")])
        return pa.table({"l_partkey": res.column("l_partkey"),
                         "n": res.column("n_sum")})

    top = partial_aggregate(
        li.map_batches(counts, batch_format="pyarrow"),
        ["l_partkey"], [("n", "sum", "n")]) \
        .sort(["n", "l_partkey"], descending=[True, False]) \
        .limit(k).take_all()
    head = pa.array(sorted(r["l_partkey"] for r in top), pa.int64())
    href = ray.put(head)

    def pairs(group: pa.Table) -> pa.Table:
        hd = ray.get(href)
        keep = pc.is_in(group.column("l_partkey"), value_set=hd)
        g = group.filter(keep)
        ok = g.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = g.column("l_partkey").to_numpy(zero_copy_only=False)
        u = np.unique(np.stack([ok, pk], axis=1), axis=0)
        ok, pk = u[:, 0], u[:, 1]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, len(ok)])
        a_all, b_all = [], []
        for ln in np.unique(lens):
            if ln < 2:
                continue
            segs = starts[lens == ln]
            mat = pk[segs[:, None] + np.arange(ln)]
            ii, jj = np.triu_indices(int(ln), k=1)
            a_all.append(mat[:, ii].ravel())
            b_all.append(mat[:, jj].ravel())
        if not a_all:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        a = np.concatenate(a_all)
        b = np.concatenate(b_all)
        t2 = pa.table({"u": pa.array(np.minimum(a, b)),
                       "v": pa.array(np.maximum(a, b))})
        return t2.group_by(["u", "v"]).aggregate([]).select(["u", "v"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        bkt = ((ok.astype(np.uint64) * _FIB64) >> np.uint64(56)) \
            .astype(np.int64)
        return batch.append_column("bkt", pa.array(bkt))

    seen_tab = pa.concat_tables(
        [pa.table({"u": pa.array([], pa.int64()),
                   "v": pa.array([], pa.int64())})]
        + list(partial_aggregate(
            li.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bkt").map_groups(pairs, batch_format="pyarrow"),
            ["u", "v"], [])
            .iter_batches(batch_format="pyarrow", batch_size=None)))
    seen = set(zip(seen_tab.column("u").to_pylist(),
                   seen_tab.column("v").to_pylist()))
    hd = sorted(head.to_pylist())
    ua, va = [], []
    for i in range(len(hd)):
        for j in range(i + 1, len(hd)):
            if (hd[i], hd[j]) not in seen:
                ua.append(hd[i])
                va.append(hd[j])
    return ray.data.from_arrow(pa.table({
        "part_a": pa.array(ua, pa.int64()),
        "part_b": pa.array(va, pa.int64())}))


def discount_ladder(sf_dir: str) -> ray.data.Dataset:
    """Volume-discount ladder detection: the MODAL discount (cents,
    ties low) per quantity bracket of 10 — does pricing step with
    volume?  (bracket, discount) counts reduce; the per-bracket argmax
    folds on the bounded grid."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_discount"])

    def cells(batch: pa.Table) -> pa.Table:
        q = np.rint(batch.column("l_quantity")
                    .to_numpy(zero_copy_only=False)).astype(np.int64)
        d = np.rint(batch.column("l_discount")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"bracket": pa.array(q // 10),
                      "disc_cents": pa.array(d),
                      "n": pa.array(np.ones(len(q), np.int64))})
        res = t.group_by(["bracket", "disc_cents"]).aggregate(
            [("n", "sum")])
        return pa.table({"bracket": res.column("bracket"),
                         "disc_cents": res.column("disc_cents"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["bracket", "disc_cents"], [("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    br = rows.column("bracket").to_numpy(zero_copy_only=False)
    dc = rows.column("disc_cents").to_numpy(zero_copy_only=False)
    n = rows.column("n").to_numpy(zero_copy_only=False)
    order = np.lexsort((dc, -n, br))
    brs, first = np.unique(br[order], return_index=True)
    pick = order[first]
    return ray.data.from_arrow(pa.table({
        "bracket": pa.array(br[pick]),
        "modal_discount_cents": pa.array(dc[pick]),
        "n_lines": pa.array(n[pick])}))


def lang_length_mix_l1(sf_dir: str) -> ray.data.Dataset:
    """Per-language length-profile divergence: each lang's log2 doc-
    length histogram versus the global profile, as the scale-free L1
    numerator — do languages write short or long here?"""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])

    def cells(batch: pa.Table) -> pa.Table:
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        b = np.full(len(nc), -1, np.int64)
        pos = nc > 0
        b[pos] = np.floor(np.log2(nc[pos])).astype(np.int64)
        t = pa.table({"lang": batch.column("lang"),
                      "bucket": pa.array(b),
                      "n": pa.array(np.ones(len(nc), np.int64))})
        res = t.group_by(["lang", "bucket"]).aggregate([("n", "sum")])
        return pa.table({"lang": res.column("lang"),
                         "bucket": res.column("bucket"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["lang", "bucket"], [("n", "sum", "n")])
    rows = pa.concat_tables(list(agg.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    lang = rows.column("lang").to_numpy(zero_copy_only=False)
    bkt = rows.column("bucket").to_numpy(zero_copy_only=False)
    n = rows.column("n").to_numpy(zero_copy_only=False)
    langs, li = np.unique(lang, return_inverse=True)
    bkts, bi = np.unique(bkt, return_inverse=True)
    grid = np.zeros((len(langs), len(bkts)), np.int64)
    grid[li, bi] = n
    gl = grid.sum(axis=0)
    tg = int(gl.sum())
    tl = grid.sum(axis=1)
    l1 = np.abs(grid * tg - gl[None, :] * tl[:, None]).sum(axis=1)
    return ray.data.from_arrow(pa.table({
        "lang": pa.array(langs),
        "n_docs": pa.array(tl),
        "l1_num": pa.array(l1.astype(np.float64))}))


def first_event_purchase_share(sf_dir: str) -> ray.data.Dataset:
    """Cold-purchaser census: users whose FIRST-EVER event is already a
    purchase (no onboarding journey), as count and floor ppm — per-user
    argmin by (ts, event_id) folds inside groups."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_numpy(zero_copy_only=False)
        first = types[np.lexsort((eid, ts))[0]]
        return pa.table({
            "is_cold": pa.array([1 if first == "purchase" else 0],
                                pa.int64()),
            "one": pa.array([1], pa.int64())})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    rows = pa.concat_tables(list(per.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    n = int(pc.sum(rows.column("one")).as_py() or 0)
    c = int(pc.sum(rows.column("is_cold")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "n_users": pa.array([n], pa.int64()),
        "n_cold_purchasers": pa.array([c], pa.int64()),
        "cold_ppm": pa.array([(1_000_000 * c) // max(n, 1)],
                             pa.int64())}))


def part_reorder_gap_hist(sf_dir: str) -> ray.data.Dataset:
    """Demand periodicity: per part the gaps between consecutive ship
    DAYS (distinct days, sorted inside the part group), folded to a
    global log2-day histogram — the reorder-interval profile inventory
    models start from."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_shipdate"])

    def per_part(group: pa.Table) -> pa.Table:
        d = np.unique(group.column("l_shipdate")
                      .to_numpy(zero_copy_only=False)
                      .astype("datetime64[D]").astype(np.int64))
        if len(d) < 2:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n_gaps": pa.array([], pa.int64())})
        gaps = np.diff(d)
        b = np.floor(np.log2(gaps)).astype(np.int64)
        t = pa.table({"bucket": pa.array(b),
                      "n_gaps": pa.array(np.ones(len(b), np.int64))})
        res = t.group_by(["bucket"]).aggregate([("n_gaps", "sum")])
        return pa.table({"bucket": res.column("bucket"),
                         "n_gaps": res.column("n_gaps_sum")})

    per = ds.groupby("l_partkey").map_groups(per_part,
                                             batch_format="pyarrow")
    return partial_aggregate(per, ["bucket"],
                             [("n_gaps", "sum", "n_gaps")])


def token_lifetime_hist(sf_dir: str) -> ray.data.Dataset:
    """Term-drift probe: each token's LIFETIME (max doc_id − min doc_id
    over its occurrences) folded to a log2 histogram (-1 for single-doc
    tokens) — ephemeral versus evergreen vocabulary in corpus order."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def spans(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        flat = pc.list_flatten(toks)
        reps = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(batch.column("doc_id")
                        .to_numpy(zero_copy_only=False), reps)
        t = pa.table({"tok": flat, "mn": pa.array(ids),
                      "mx": pa.array(ids)})
        res = t.group_by(["tok"]).aggregate([("mn", "min"),
                                             ("mx", "max")])
        return pa.table({"tok": res.column("tok"),
                         "mn": res.column("mn_min"),
                         "mx": res.column("mx_max")})

    agg = partial_aggregate(
        ds.map_batches(spans, batch_format="pyarrow"),
        ["tok"], [("mn", "min", "mn"), ("mx", "max", "mx")])

    def hist(batch: pa.Table) -> pa.Table:
        life = (batch.column("mx").to_numpy(zero_copy_only=False)
                - batch.column("mn").to_numpy(zero_copy_only=False))
        b = np.full(len(life), -1, np.int64)
        pos = life > 0
        b[pos] = np.floor(np.log2(life[pos])).astype(np.int64)
        t = pa.table({"bucket": pa.array(b),
                      "n_tokens": pa.array(np.ones(len(b), np.int64))})
        res = t.group_by(["bucket"]).aggregate([("n_tokens", "sum")])
        return pa.table({"bucket": res.column("bucket"),
                         "n_tokens": res.column("n_tokens_sum")})

    return partial_aggregate(
        agg.map_batches(hist, batch_format="pyarrow"),
        ["bucket"], [("n_tokens", "sum", "n_tokens")])


def value_nextgap_cov(sf_dir: str) -> ray.data.Dataset:
    """Lagged cross-covariance inside keys: does a BIG event precede a
    LONG pause?  Per user, pairs (value cents, gap to next event µs)
    contribute to the global integer numerator n·Σxy − Σx·Σy — one
    vectorized LEAD per group, three counters out."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "value"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        cents = np.rint(group.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        order = np.lexsort((eid, ts))
        t, c = ts[order], cents[order]
        if len(t) < 2:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "sx": pa.array([0], pa.int64()),
                             "sy": pa.array([0], pa.int64()),
                             "sxy": pa.array([0], pa.int64())})
        x = c[:-1]
        y = np.diff(t)
        # per-group sums stay well inside int64; the global reduce
        # sums int64 exactly and casts to double ONCE at the end
        return pa.table({
            "n": pa.array([len(t) - 1], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64())})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    rows = pa.concat_tables(list(per.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    n = int(pc.sum(rows.column("n")).as_py() or 0)
    sx = int(pc.sum(rows.column("sx")).as_py() or 0)
    sy = int(pc.sum(rows.column("sy")).as_py() or 0)
    sxy = int(pc.sum(rows.column("sxy")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "n_pairs": pa.array([n], pa.int64()),
        # exact decimal string: n·Σxy−ΣxΣy exceeds 2^53; int→float64
        # differs 1 ULP from DuckDB's HUGEINT→DOUBLE double-rounding
        "cov_num": pa.array([str(n * sxy - sx * sy)], pa.string())}))


def nation_entity_balance(sf_dir: str) -> ray.data.Dataset:
    """Dimension balance: customers versus suppliers per nation with
    the customer share (floor ppm) — the market-structure readout of
    the two entity tables joined on the conformed nation dimension."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_nationkey"])
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_nationkey"])
    cn = pc.cast(cust.column("c_nationkey"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    sn = pc.cast(supp.column("s_nationkey"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    nats = np.unique(np.r_[cn, sn])
    ncu = np.zeros(len(nats), np.int64)
    nsu = np.zeros(len(nats), np.int64)
    np.add.at(ncu, np.searchsorted(nats, cn), 1)
    np.add.at(nsu, np.searchsorted(nats, sn), 1)
    tot = ncu + nsu
    return ray.data.from_arrow(pa.table({
        "nationkey": pa.array(nats),
        "n_customers": pa.array(ncu),
        "n_suppliers": pa.array(nsu),
        "customer_ppm": pa.array((1_000_000 * ncu)
                                 // np.where(tot == 0, 1, tot))}))


def session_position_type_matrix(sf_dir: str, gap_seconds: int = 1800
                                 ) -> ray.data.Dataset:
    """Position-class profile: event types cross-tabulated by their
    role in the session — FIRST, LAST (multi-event sessions), SOLO, or
    MIDDLE — where do purchases sit in a visit?  Per-user session folds
    emit (class, type) counters."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        t, ty = ts[order], types[order]
        brk = np.r_[0, np.flatnonzero(np.diff(t)
                                      > gap_seconds * 1_000_000) + 1,
                    len(t)]
        starts, ends = brk[:-1], brk[1:] - 1
        runlen = np.diff(brk)
        cls = np.full(len(t), "middle", dtype=object)
        solo = runlen == 1
        cls[starts[solo]] = "solo"
        cls[starts[~solo]] = "first"
        cls[ends[~solo]] = "last"
        tt = pa.table({"position": pa.array(cls.astype(str)),
                       "event_type": pa.array(ty),
                       "n": pa.array(np.ones(len(t), np.int64))})
        res = tt.group_by(["position", "event_type"]).aggregate(
            [("n", "sum")])
        return pa.table({"position": res.column("position"),
                         "event_type": res.column("event_type"),
                         "n": res.column("n_sum")})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    return partial_aggregate(per, ["position", "event_type"],
                             [("n", "sum", "n")])


def brand_activation_rate(sf_dir: str) -> ray.data.Dataset:
    """Catalog activation: per brand, parts that have EVER shipped
    versus catalog size (floor ppm) — the assortment-efficiency
    readout.  The ordered-part key set reduces once and broadcasts
    into the dimension pass."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey"])

    def keys(batch: pa.Table) -> pa.Table:
        return pa.table({"l_partkey": pc.unique(
            batch.column("l_partkey"))})

    active_tab = pa.concat_tables(list(partial_aggregate(
        li.map_batches(keys, batch_format="pyarrow"),
        ["l_partkey"], [])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    active = ray.put(active_tab.column("l_partkey").combine_chunks())
    part = read_parquet_clean(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_brand"])

    def fold(batch: pa.Table) -> pa.Table:
        act = pc.cast(pc.is_in(batch.column("p_partkey"),
                               value_set=ray.get(active)), pa.int64())
        t = pa.table({"p_brand": batch.column("p_brand"),
                      "n_parts": pa.array(np.ones(len(batch),
                                                  np.int64)),
                      "n_active": act})
        res = t.group_by(["p_brand"]).aggregate(
            [("n_parts", "sum"), ("n_active", "sum")])
        return pa.table({"p_brand": res.column("p_brand"),
                         "n_parts": res.column("n_parts_sum"),
                         "n_active": res.column("n_active_sum")})

    agg = partial_aggregate(
        part.map_batches(fold, batch_format="pyarrow"),
        ["p_brand"], [("n_parts", "sum", "n_parts"),
                      ("n_active", "sum", "n_active")])

    def ppm(batch: pa.Table) -> pa.Table:
        np_ = batch.column("n_parts").to_numpy(zero_copy_only=False)
        na = batch.column("n_active").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "activation_ppm",
            pa.array((1_000_000 * na) // np.where(np_ == 0, 1, np_)))

    return agg.map_batches(ppm, batch_format="pyarrow")


def value_granularity_audit(sf_dir: str) -> ray.data.Dataset:
    """Value-quantization audit: how many DISTINCT cent amounts do
    events use, over what range (coverage floor ppm of the span) —
    coarse quantization betrays synthetic or rounded feeds."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["value"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.rint(batch.column("value")
                    .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.table({"c": pa.array(np.unique(c))})

    distinct = partial_aggregate(
        ds.map_batches(cents, batch_format="pyarrow"), ["c"], [])
    rows = pa.concat_tables(list(distinct.iter_batches(
        batch_format="pyarrow", batch_size=None)))
    c = rows.column("c").to_numpy(zero_copy_only=False)
    nd = len(c)
    mn, mx = (int(c.min()), int(c.max())) if nd else (0, 0)
    span = mx - mn + 1 if nd else 1
    return ray.data.from_arrow(pa.table({
        "n_distinct_cents": pa.array([nd], pa.int64()),
        "min_cents": pa.array([mn], pa.int64()),
        "max_cents": pa.array([mx], pa.int64()),
        "coverage_ppm": pa.array([(1_000_000 * nd) // span],
                                 pa.int64())}))


def session_size_hist(sf_dir: str, gap_seconds: int = 1800
                      ) -> ray.data.Dataset:
    """Session-length (event-count) histogram: how many sessions hold
    1, 2, 3… events — the visit-depth distribution, folded from
    per-user session runs."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def per_user(group: pa.Table) -> pa.Table:
        ts = np.sort(group.column("ts").to_numpy(zero_copy_only=False)
                     .astype("datetime64[us]").astype(np.int64))
        brk = np.r_[0, np.flatnonzero(np.diff(ts)
                                      > gap_seconds * 1_000_000) + 1,
                    len(ts)]
        sizes = np.diff(brk)
        t = pa.table({"session_events": pa.array(sizes),
                      "n_sessions": pa.array(np.ones(len(sizes),
                                                     np.int64))})
        res = t.group_by(["session_events"]).aggregate(
            [("n_sessions", "sum")])
        return pa.table({"session_events": res.column("session_events"),
                         "n_sessions": res.column("n_sessions_sum")})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    return partial_aggregate(per, ["session_events"],
                             [("n_sessions", "sum", "n_sessions")])


def order_dup_part_lines(sf_dir: str) -> ray.data.Dataset:
    """Intra-order duplicate-part audit: orders listing the SAME part
    on multiple lines (should they have been merged?) — per-order
    line-vs-distinct counts fold from (order, part) partials."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "l_partkey": batch.column("l_partkey"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["l_orderkey", "l_partkey"]).aggregate(
            [("n", "sum")])
        return pa.table({"l_orderkey": res.column("l_orderkey"),
                         "l_partkey": res.column("l_partkey"),
                         "n": res.column("n_sum")})

    agg = partial_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["l_orderkey", "l_partkey"], [("n", "sum", "n")])

    def fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        dup = n > 1
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_dup_pairs": pa.array([int(dup.sum())], pa.int64()),
            "n_extra_lines": pa.array([int((n[dup] - 1).sum())],
                                      pa.int64()),
            "orders": pa.array([np.unique(ok[dup]).tolist()],
                               pa.list_(pa.int64()))})

    parts = pa.concat_tables(list(
        agg.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    orders = set()
    for lst in parts.column("orders").to_pylist():
        orders.update(lst)
    return ray.data.from_arrow(pa.table({
        "n_dup_pairs": pa.array([int(pc.sum(
            parts.column("n_dup_pairs")).as_py() or 0)], pa.int64()),
        "n_extra_lines": pa.array([int(pc.sum(
            parts.column("n_extra_lines")).as_py() or 0)], pa.int64()),
        "n_orders_affected": pa.array([len(orders)], pa.int64())}))


def customer_kanonymity_audit(sf_dir: str, k: int = 5,
                              band_width: float = 1000.0
                              ) -> ray.data.Dataset:
    """Privacy k-anonymity audit over quasi-identifiers (nation,
    mktsegment, acctbal band): how many QI groups fall below k members,
    how many customers sit in those re-identifiable groups, and the
    anonymity floor (smallest group).  Group counts fold from per-batch
    partials; the audit row folds from ≤256 bucket partials."""
    ds = read_parquet_clean(f"{sf_dir}/customer.parquet",
                            columns=["c_nationkey", "c_mktsegment",
                                     "c_acctbal"])

    def qi(batch: pa.Table) -> pa.Table:
        band = np.floor(batch.column("c_acctbal")
                        .to_numpy(zero_copy_only=False) / band_width) \
            .astype(np.int64)
        t = pa.table({
            "nk": pc.cast(batch.column("c_nationkey"), pa.int64()),
            "seg": batch.column("c_mktsegment"),
            "band": pa.array(band),
            "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["nk", "seg", "band"]).aggregate([("n", "sum")])
        return pa.table({"nk": res.column("nk"),
                         "seg": res.column("seg"),
                         "band": res.column("band"),
                         "n": res.column("n_sum")})

    groups = partial_aggregate(ds.map_batches(qi, batch_format="pyarrow"),
                               ["nk", "seg", "band"],
                               [("n", "sum", "n")])

    def fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        if len(n) == 0:          # empty partial must not poison the min
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("n_groups", "n_risky_groups",
                                       "n_risky_customers",
                                       "min_group_size")})
        risky = n < k
        return pa.table({
            "n_groups": pa.array([len(n)], pa.int64()),
            "n_risky_groups": pa.array([int(risky.sum())], pa.int64()),
            "n_risky_customers": pa.array([int(n[risky].sum())],
                                          pa.int64()),
            "min_group_size": pa.array(
                [int(n.min()) if len(n) else 0], pa.int64())})

    parts = pa.concat_tables(list(
        groups.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    mins = parts.column("min_group_size").to_numpy(zero_copy_only=False)
    return ray.data.from_arrow(pa.table({
        "n_groups": pa.array([int(pc.sum(
            parts.column("n_groups")).as_py() or 0)], pa.int64()),
        "n_risky_groups": pa.array([int(pc.sum(
            parts.column("n_risky_groups")).as_py() or 0)], pa.int64()),
        "n_risky_customers": pa.array([int(pc.sum(
            parts.column("n_risky_customers")).as_py() or 0)],
            pa.int64()),
        "min_group_size": pa.array(
            [int(mins.min()) if len(mins) else 0], pa.int64())}))


def price_percentile_ranks(sf_dir: str,
                           thresholds_cents: tuple =
                           (2_500_000, 5_000_000, 7_500_000, 10_000_000)
                           ) -> ray.data.Dataset:
    """CDF probes: the percentile rank (floor ppm) of fixed price
    thresholds in the lineitem extended-price distribution — the
    inverse of a quantile query, answerable with pure counting (no
    sort, no sketch).  Per-batch counts per threshold fold through one
    tiny exchange."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_extendedprice"])
    thr = np.asarray(sorted(thresholds_cents), np.int64)

    def counts(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        # one searchsorted gives all cumulative counts at once
        le = np.searchsorted(np.sort(cents), thr, side="right") \
            .astype(np.int64)
        return pa.table({
            "threshold_cents": pa.array(thr),
            "n_le": pa.array(le),
            "n_total": pa.array(np.full(len(thr), len(cents), np.int64))})

    agg = partial_aggregate(ds.map_batches(counts, batch_format="pyarrow"),
                            ["threshold_cents"],
                            [("n_le", "sum", "n_le"),
                             ("n_total", "sum", "n_total")])

    def ppm(batch: pa.Table) -> pa.Table:
        le = batch.column("n_le").to_numpy(zero_copy_only=False)
        tot = batch.column("n_total").to_numpy(zero_copy_only=False)
        return pa.table({
            "threshold_cents": batch.column("threshold_cents"),
            "n_le": batch.column("n_le"),
            "pctile_ppm": pa.array(
                (1_000_000 * le) // np.maximum(tot, 1), pa.int64())})

    return agg.map_batches(ppm, batch_format="pyarrow")


def event_type_trigrams(sf_dir: str, n: int = 20) -> ray.data.Dataset:
    """Top consecutive event-type trigrams across per-user timelines
    (behavioral motifs one step past the handoff/pair matrices).  The
    exchange groups 256-way coarse user buckets; inside a bucket one
    sort + shifted-compare masks off user boundaries, so trigram
    counting is fully vectorized regardless of user cardinality."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__ub",
                                   bucket_ids(batch, ["user_id"]))

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.take(pc.sort_indices(
            group, sort_keys=[("user_id", "ascending"),
                              ("ts", "ascending"),
                              ("event_id", "ascending")]))
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        if len(u) < 3:
            return pa.table({"t1": pa.array([], pa.string()),
                             "t2": pa.array([], pa.string()),
                             "t3": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        valid = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        tt = pa.table({"t1": pa.array(ty[:-2][valid], pa.string()),
                       "t2": pa.array(ty[1:-1][valid], pa.string()),
                       "t3": pa.array(ty[2:][valid], pa.string()),
                       "n": pa.array(np.ones(int(valid.sum()),
                                             np.int64))})
        res = tt.group_by(["t1", "t2", "t3"]).aggregate([("n", "sum")])
        return pa.table({"t1": res.column("t1"), "t2": res.column("t2"),
                         "t3": res.column("t3"),
                         "n": res.column("n_sum")})

    per = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("__ub").map_groups(per_bucket,
                                       batch_format="pyarrow"))
    agg = partial_aggregate(per, ["t1", "t2", "t3"],
                            [("n", "sum", "n")])
    return agg.sort(["n", "t1", "t2", "t3"],
                    descending=[True, False, False, False]).limit(n)


def order_priority_escalation(sf_dir: str) -> ray.data.Dataset:
    """Priority drift audit: across each customer's consecutive orders
    (date then key order), how often does priority escalate toward
    urgent (rank drops), de-escalate, or hold — plus how many customers
    ever escalate.  Coarse customer buckets keep the sequence fold
    vectorized; bucket partials sum to one audit row."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_orderkey", "o_orderpriority"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__ub",
                                   bucket_ids(batch, ["o_custkey"]))

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.take(pc.sort_indices(
            group, sort_keys=[("o_custkey", "ascending"),
                              ("o_orderdate", "ascending"),
                              ("o_orderkey", "ascending")]))
        cust = t.column("o_custkey").to_numpy(zero_copy_only=False)
        rank = pc.cast(pc.utf8_slice_codeunits(
            t.column("o_orderpriority"), 0, 1), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        same_cust = cust[1:] == cust[:-1]
        esc = same_cust & (rank[1:] < rank[:-1])
        return pa.table({
            "n_pairs": pa.array([int(same_cust.sum())], pa.int64()),
            "n_escalations": pa.array([int(esc.sum())], pa.int64()),
            "n_deescalations": pa.array(
                [int((same_cust & (rank[1:] > rank[:-1])).sum())],
                pa.int64()),
            "n_escalating_customers": pa.array(
                [len(np.unique(cust[1:][esc]))], pa.int64())})

    parts = pa.concat_tables(list(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__ub").map_groups(per_bucket, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    out = {}
    for col in ("n_pairs", "n_escalations", "n_deescalations",
                "n_escalating_customers"):
        out[col] = pa.array([int(pc.sum(parts.column(col)).as_py() or 0)],
                            pa.int64())
    return ray.data.from_arrow(pa.table(out))

def nation_segment_lift(sf_dir: str) -> ray.data.Dataset:
    """Market-basket lift of each (nation, mktsegment) cell against
    independence: lift_ppm = 1e6·n·N / (n_nation·n_segment), floor
    division so the value is exact.  One partial-agg exchange produces
    the ≤(nations×segments) cell table; margins fold driver-side from
    that bounded aggregate (≤125 rows), never from raw customers."""
    ds = read_parquet_clean(f"{sf_dir}/customer.parquet",
                            columns=["c_nationkey", "c_mktsegment"])

    def cell(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "nk": pc.cast(batch.column("c_nationkey"), pa.int64()),
            "seg": batch.column("c_mktsegment"),
            "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["nk", "seg"]).aggregate([("n", "sum")])
        return pa.table({"nk": res.column("nk"),
                         "seg": res.column("seg"),
                         "n": res.column("n_sum")})

    cells = pa.concat_tables(list(
        partial_aggregate(ds.map_batches(cell, batch_format="pyarrow"),
                          ["nk", "seg"], [("n", "sum", "n")])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    nk = cells.column("nk").to_numpy(zero_copy_only=False)
    seg = np.asarray(cells.column("seg").to_pylist(), dtype=object)
    n = cells.column("n").to_numpy(zero_copy_only=False)
    total = int(n.sum())
    n_nation = {}
    for k, v in zip(nk, n):
        n_nation[int(k)] = n_nation.get(int(k), 0) + int(v)
    n_seg = {}
    for s, v in zip(seg, n):
        n_seg[s] = n_seg.get(s, 0) + int(v)
    lift = np.array([(1_000_000 * int(v) * total)
                     // (n_nation[int(k)] * n_seg[s])
                     for k, s, v in zip(nk, seg, n)], np.int64)
    order = np.lexsort((seg.astype(str), nk))
    return ray.data.from_arrow(pa.table({
        "c_nationkey": pa.array(nk[order], pa.int64()),
        "c_mktsegment": pa.array(list(seg[order]), pa.string()),
        "n_customers": pa.array(n[order], pa.int64()),
        "lift_ppm": pa.array(lift[order])}))


def customer_part_diversity_hist(sf_dir: str) -> ray.data.Dataset:
    """Histogram of per-customer distinct-part breadth: how many
    customers ever bought exactly k distinct parts.  The lineitem→orders
    key resolution is a distributed hash join (both sides too big to
    broadcast at 100 TB); (cust, part) pairs dedupe through one
    partial-agg exchange, per-customer counts through a second, the
    histogram through a third — every exchange carries aggregates."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    from ..functions.joins import hash_join
    joined = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def pair(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "cust": pc.cast(batch.column("o_custkey"), pa.int64()),
            "part": pc.cast(batch.column("l_partkey"), pa.int64()),
            "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["cust", "part"]).aggregate([("n", "sum")])
        return pa.table({"cust": res.column("cust"),
                         "part": res.column("part"),
                         "n": res.column("n_sum")})

    pairs = partial_aggregate(joined.map_batches(pair,
                                                 batch_format="pyarrow"),
                              ["cust", "part"], [("n", "sum", "n")])

    def per_cust(batch: pa.Table) -> pa.Table:
        t = pa.table({"cust": batch.column("cust"),
                      "k": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["cust"]).aggregate([("k", "sum")])
        return pa.table({"cust": res.column("cust"),
                         "k": res.column("k_sum")})

    counts = partial_aggregate(pairs.map_batches(per_cust,
                                                 batch_format="pyarrow"),
                               ["cust"], [("k", "sum", "k")])

    def hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"n_parts": batch.column("k"),
                      "n_customers": pa.array(
                          np.ones(len(batch), np.int64))})
        res = t.group_by(["n_parts"]).aggregate([("n_customers", "sum")])
        return pa.table({"n_parts": res.column("n_parts"),
                         "n_customers": res.column("n_customers_sum")})

    agg = partial_aggregate(counts.map_batches(hist,
                                               batch_format="pyarrow"),
                            ["n_parts"], [("n_customers", "sum",
                                           "n_customers")])
    return agg.sort("n_parts")


def user_first_last_matrix(sf_dir: str) -> ray.data.Dataset:
    """Entry/exit behavior matrix: per user the FIRST and LAST event
    type of their whole timeline (ts then event_id order), counted into
    a (first_type, last_type) matrix.  Users hash into 256 coarse
    buckets; inside a bucket one sort + boundary masks pick both
    endpoints vectorized, and only the tiny matrix leaves the stage."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__ub",
                                   bucket_ids(batch, ["user_id"]))

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.take(pc.sort_indices(
            group, sort_keys=[("user_id", "ascending"),
                              ("ts", "ascending"),
                              ("event_id", "ascending")]))
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        if len(u) == 0:
            return pa.table({"first_type": pa.array([], pa.string()),
                             "last_type": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64())})
        first = np.r_[True, u[1:] != u[:-1]]
        last = np.r_[u[1:] != u[:-1], True]
        tt = pa.table({"first_type": pa.array(ty[first], pa.string()),
                       "last_type": pa.array(ty[last], pa.string()),
                       "n_users": pa.array(
                           np.ones(int(first.sum()), np.int64))})
        res = tt.group_by(["first_type", "last_type"]) \
            .aggregate([("n_users", "sum")])
        return pa.table({"first_type": res.column("first_type"),
                         "last_type": res.column("last_type"),
                         "n_users": res.column("n_users_sum")})

    per = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("__ub").map_groups(per_bucket,
                                       batch_format="pyarrow"))
    agg = partial_aggregate(per, ["first_type", "last_type"],
                            [("n_users", "sum", "n_users")])
    return agg.sort(["first_type", "last_type"])


def token_df_hist(sf_dir: str) -> ray.data.Dataset:
    """IR document-frequency histogram: for each df value k, how many
    vocabulary tokens appear in exactly k documents.  Per-doc distinct
    tokens emit (token, 1) partials (whitespace split, matching the
    corpus tokenizer), token dfs fold through the coarse-bucket
    exchange, and the df histogram folds through a second tiny one."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def per_doc(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        doc_ids = batch.column("doc_id")
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pa.table({
            "doc": pa.array(np.repeat(
                doc_ids.to_numpy(zero_copy_only=False), n_tok)),
            "token": pc.list_flatten(toks)})
        # distinct (doc, token) within the batch == within the doc
        res = flat.group_by(["doc", "token"]).aggregate([("doc", "count")])
        t = pa.table({"token": res.column("token"),
                      "df": pa.array(np.ones(len(res), np.int64))})
        out = t.group_by(["token"]).aggregate([("df", "sum")])
        return pa.table({"token": out.column("token"),
                         "df": out.column("df_sum")})

    dfs = partial_aggregate(ds.map_batches(per_doc,
                                           batch_format="pyarrow"),
                            ["token"], [("df", "sum", "df")])

    def hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"df": batch.column("df"),
                      "n_tokens": pa.array(np.ones(len(batch),
                                                   np.int64))})
        res = t.group_by(["df"]).aggregate([("n_tokens", "sum")])
        return pa.table({"df": res.column("df"),
                         "n_tokens": res.column("n_tokens_sum")})

    agg = partial_aggregate(dfs.map_batches(hist, batch_format="pyarrow"),
                            ["df"], [("n_tokens", "sum", "n_tokens")])
    return agg.sort("df")


def supplier_part_jaccard_topk(sf_dir: str, k: int = 10
                               ) -> ray.data.Dataset:
    """Top-k supplier pairs by part-catalog Jaccard overlap (ppm, floor
    div — exact).  Distinct (part, supplier) pairs fold through one
    exchange; pair generation groups 256 coarse part buckets and emits
    each part's supplier pairs with one numpy triu per run (per-part
    supplier degree is schema-bounded, so no quadratic risk); catalog
    sizes are a supplier-cardinality aggregate, broadcast into the
    scoring stage — never joined."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey"])

    def distinct(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "part": pc.cast(batch.column("l_partkey"), pa.int64()),
            "supp": pc.cast(batch.column("l_suppkey"), pa.int64()),
            "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["part", "supp"]).aggregate([("n", "max")])
        return pa.table({"part": res.column("part"),
                         "supp": res.column("supp"),
                         "n": res.column("n_max")})

    pairs_ds = partial_aggregate(
        ds.map_batches(distinct, batch_format="pyarrow"),
        ["part", "supp"], [("n", "max", "n")])

    def sizes(batch: pa.Table) -> pa.Table:
        t = pa.table({"supp": batch.column("supp"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["supp"]).aggregate([("n", "sum")])
        return pa.table({"supp": res.column("supp"),
                         "n": res.column("n_sum")})

    size_tbl = pa.concat_tables(list(
        partial_aggregate(pairs_ds.map_batches(sizes,
                                               batch_format="pyarrow"),
                          ["supp"], [("n", "sum", "n")])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    size_ref = ray.put(dict(
        zip(size_tbl.column("supp").to_pylist(),
            size_tbl.column("n").to_pylist())))

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__pb2",
                                   bucket_ids(batch, ["part"]))

    def gen_pairs(group: pa.Table) -> pa.Table:
        t = group.sort_by([("part", "ascending"), ("supp", "ascending")])
        part = t.column("part").to_numpy(zero_copy_only=False)
        supp = t.column("supp").to_numpy(zero_copy_only=False)
        if len(part) == 0:
            return pa.table({"s1": pa.array([], pa.int64()),
                             "s2": pa.array([], pa.int64()),
                             "shared": pa.array([], pa.int64())})
        change = np.flatnonzero(part[1:] != part[:-1])
        starts = np.r_[0, change + 1]
        ends = np.r_[change + 1, len(part)]
        a, b = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            iu, ju = np.triu_indices(n, 1)
            a.append(supp[s:e][iu])
            b.append(supp[s:e][ju])
        if not a:
            return pa.table({"s1": pa.array([], pa.int64()),
                             "s2": pa.array([], pa.int64()),
                             "shared": pa.array([], pa.int64())})
        tt = pa.table({"s1": pa.array(np.concatenate(a)),
                       "s2": pa.array(np.concatenate(b)),
                       "shared": pa.array(
                           np.ones(sum(len(x) for x in a), np.int64))})
        res = tt.group_by(["s1", "s2"]).aggregate([("shared", "sum")])
        return pa.table({"s1": res.column("s1"), "s2": res.column("s2"),
                         "shared": res.column("shared_sum")})

    shared = partial_aggregate(
        pairs_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__pb2").map_groups(gen_pairs, batch_format="pyarrow"),
        ["s1", "s2"], [("shared", "sum", "shared")])

    def score(batch: pa.Table) -> pa.Table:
        sz = ray.get(size_ref)
        s1 = batch.column("s1").to_numpy(zero_copy_only=False)
        s2 = batch.column("s2").to_numpy(zero_copy_only=False)
        sh = batch.column("shared").to_numpy(zero_copy_only=False)
        n1 = np.array([sz[int(x)] for x in s1], np.int64)
        n2 = np.array([sz[int(x)] for x in s2], np.int64)
        return batch.append_column("jaccard_ppm", pa.array(
            (1_000_000 * sh) // (n1 + n2 - sh)))

    return (shared.map_batches(score, batch_format="pyarrow")
            .sort(["jaccard_ppm", "s1", "s2"],
                  descending=[True, False, False]).limit(k))


def embedding_signbucket_hist(sf_dir: str, n_dims: int = 8
                              ) -> ray.data.Dataset:
    """SimHash-bucket balance audit: hash every vector into one of 2^d
    buckets by the sign pattern of its first d dimensions and histogram
    the occupancy — the skew diagnostic for any sign-LSH ANN layout
    (hot buckets → hot partitions).  Per-batch bincount partials fold
    through one ≤2^d-row exchange."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"])
    weights = (1 << np.arange(n_dims)).astype(np.int64)

    def per_batch(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column("embedding")
                     .to_numpy(zero_copy_only=False))[:, :n_dims]
        bucket = ((m > 0).astype(np.int64) * weights).sum(axis=1)
        counts = np.bincount(bucket, minlength=1 << n_dims)
        nz = np.flatnonzero(counts)
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "n_vectors": pa.array(counts[nz])})

    agg = partial_aggregate(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        ["bucket"], [("n_vectors", "sum", "n_vectors")])
    return agg.sort("bucket")


def sentence_len_hist(sf_dir: str) -> ray.data.Dataset:
    """Corpus sentence-length histogram: split every document on '. ',
    count whitespace tokens per sentence, histogram the lengths — the
    chunking-size profile a context-window packer needs.  All splitting
    is Arrow-kernel (two nested split_pattern), partials fold through
    one tiny exchange."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def per_batch(batch: pa.Table) -> pa.Table:
        sents = pc.list_flatten(
            pc.split_pattern(batch.column("text"), ". "))
        lens = pc.list_value_length(pc.split_pattern(sents, " ")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"sentence_tokens": pa.array(lens),
                      "n_sentences": pa.array(
                          np.ones(len(lens), np.int64))})
        res = t.group_by(["sentence_tokens"]) \
            .aggregate([("n_sentences", "sum")])
        return pa.table({
            "sentence_tokens": res.column("sentence_tokens"),
            "n_sentences": res.column("n_sentences_sum")})

    agg = partial_aggregate(
        ds.map_batches(per_batch, batch_format="pyarrow"),
        ["sentence_tokens"], [("n_sentences", "sum", "n_sentences")])
    return agg.sort("sentence_tokens")


def daily_type_mix_l1(sf_dir: str) -> pa.Table:
    """Day-over-day event-type mix churn: the L1 distance (ppm, exact
    integer cross-multiplication) between each observed day's type
    distribution and the previous observed day's — the drift monitor
    for a type-routing layer.  The fact scan folds to a bounded
    (day × type) table through one exchange; the window over that
    aggregate computes on the driver."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"day": day, "event_type": batch.column("event_type"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["day", "event_type"]).aggregate([("n", "sum")])
        return pa.table({"day": res.column("day"),
                         "event_type": res.column("event_type"),
                         "n": res.column("n_sum")})

    cells = pa.concat_tables(list(
        partial_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                          ["day", "event_type"], [("n", "sum", "n")])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    day = cells.column("day").to_numpy(zero_copy_only=False)
    typ = np.asarray(cells.column("event_type").to_pylist(), dtype=object)
    n = cells.column("n").to_numpy(zero_copy_only=False)
    days = np.sort(np.unique(day))
    types = sorted(set(typ))
    tidx = {t: i for i, t in enumerate(types)}
    didx = {d: i for i, d in enumerate(days)}
    mat = np.zeros((len(days), len(types)), np.int64)
    for d, t, v in zip(day, typ, n):
        mat[didx[d], tidx[t]] = v
    tot = mat.sum(axis=1)
    out_day, out_ppm = [], []
    for i in range(1, len(days)):
        num = np.abs(mat[i] * tot[i - 1] - mat[i - 1] * tot[i]).sum()
        out_day.append(days[i])
        out_ppm.append(int(1_000_000 * int(num)
                           // (int(tot[i]) * int(tot[i - 1]))))
    return pa.table({
        "day": pa.array(list(out_day), pa.timestamp("us")),
        "l1_ppm": pa.array(out_ppm, pa.int64())})


def customer_rrf_top10(sf_dir: str, rrf_k: int = 60,
                       cand: int = 1000) -> ray.data.Dataset:
    """Reciprocal-rank fusion of two customer rankings — by revenue and
    by order count — the retrieval-style list-merge (score =
    Σ 1e6 // (60 + rank), integer so exact).  Per-customer aggregates
    fold through one exchange; each ranking's top-``cand`` comes back
    via a distributed sort+limit, and because any customer outside both
    top-1000 lists scores < 2·1e6/1061 < the 10th candidate's floor
    (≥ 1e6/1070), fusing the 2000 candidates on the driver is provably
    exact, never a heuristic."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"cust": pc.cast(batch.column("o_custkey"),
                                      pa.int64()),
                      "cents": pa.array(cents),
                      "n_orders": pa.array(np.ones(len(batch),
                                                   np.int64))})
        res = t.group_by(["cust"]).aggregate([("cents", "sum"),
                                              ("n_orders", "sum")])
        return pa.table({"cust": res.column("cust"),
                         "cents": res.column("cents_sum"),
                         "n_orders": res.column("n_orders_sum")})

    agg = partial_aggregate(ds.map_batches(partial,
                                           batch_format="pyarrow"),
                            ["cust"], [("cents", "sum", "cents"),
                                       ("n_orders", "sum", "n_orders")])
    by_rev = agg.sort(["cents", "cust"],
                      descending=[True, False]).limit(cand).take_all()
    by_cnt = agg.sort(["n_orders", "cust"],
                      descending=[True, False]).limit(cand).take_all()
    score: dict[int, int] = {}
    for rows in (by_rev, by_cnt):
        for r, row in enumerate(rows, start=1):
            c = int(row["cust"])
            score[c] = score.get(c, 0) + 1_000_000 // (rrf_k + r)
    top = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return ray.data.from_arrow(pa.table({
        "o_custkey": pa.array([c for c, _ in top], pa.int64()),
        "rrf_score": pa.array([s for _, s in top], pa.int64())}))


def coorder_kcore_peel(sf_dir: str, k: int = 3,
                       rounds: int = 2) -> ray.data.Dataset:
    """Iterative k-core peel over the part co-order graph (edge = two
    parts sharing an order): each round drops nodes with degree < k and
    the edges touching them, reporting (round, n_nodes, n_edges) — the
    standard community-mining preprocessor.  Edges dedupe through a
    pair exchange (per-order numpy triu, order width schema-bounded);
    each peel broadcasts only the survivor NODE set (dimension-scale,
    ≪ edges) into a pc.is_in filter — edges never reshuffle."""
    from ..functions.joins import broadcast_semi_join
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = pa.table({"okey": pc.cast(batch.column("l_orderkey"),
                                      pa.int64()),
                      "part": pc.cast(batch.column("l_partkey"),
                                      pa.int64())})
        return t.append_column("__ob", bucket_ids(t, ["okey"]))

    def gen_edges(group: pa.Table) -> pa.Table:
        t = group.sort_by([("okey", "ascending"), ("part", "ascending")])
        okey = t.column("okey").to_numpy(zero_copy_only=False)
        part = t.column("part").to_numpy(zero_copy_only=False)
        if len(okey) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        change = np.flatnonzero(okey[1:] != okey[:-1])
        starts = np.r_[0, change + 1]
        ends = np.r_[change + 1, len(okey)]
        aa, bb = [], []
        for s, e in zip(starts, ends):
            ids = np.unique(part[s:e])
            n = len(ids)
            if n < 2:
                continue
            iu, ju = np.triu_indices(n, 1)
            aa.append(ids[iu])
            bb.append(ids[ju])
        if not aa:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        tt = pa.table({"a": pa.array(np.concatenate(aa)),
                       "b": pa.array(np.concatenate(bb)),
                       "n": pa.array(np.ones(sum(len(x) for x in aa),
                                             np.int64))})
        res = tt.group_by(["a", "b"]).aggregate([("n", "max")])
        return pa.table({"a": res.column("a"), "b": res.column("b"),
                         "n": res.column("n_max")})

    edges = partial_aggregate(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__ob").map_groups(gen_edges, batch_format="pyarrow"),
        ["a", "b"], [("n", "max", "n")]).materialize()

    def degrees(batch: pa.Table) -> pa.Table:
        node = pa.concat_arrays([
            batch.column("a").combine_chunks(),
            batch.column("b").combine_chunks()])
        t = pa.table({"node": node,
                      "deg": pa.array(np.ones(len(node), np.int64))})
        res = t.group_by(["node"]).aggregate([("deg", "sum")])
        return pa.table({"node": res.column("node"),
                         "deg": res.column("deg_sum")})

    out_round, out_nodes, out_edges = [], [], []
    for rnd in range(1, rounds + 1):
        deg = partial_aggregate(
            edges.map_batches(degrees, batch_format="pyarrow"),
            ["node"], [("deg", "sum", "deg")])
        keep = [r["node"] for r in deg.take_all() if r["deg"] >= k]
        edges = broadcast_semi_join(
            broadcast_semi_join(edges, keep, "a"), keep, "b") \
            .materialize()
        out_round.append(rnd)
        out_nodes.append(len(keep))
        out_edges.append(edges.count())
    return ray.data.from_arrow(pa.table({
        "round": pa.array(out_round, pa.int64()),
        "n_nodes": pa.array(out_nodes, pa.int64()),
        "n_edges": pa.array(out_edges, pa.int64())}))


def order_fulfill_30d_share_by_month(sf_dir: str, sla_days: int = 30
                                     ) -> ray.data.Dataset:
    """Fulfillment SLA by order month: the share (ppm) of orders whose
    LAST line shipped within ``sla_days`` of the order date.  Lineitem
    resolves order dates through a distributed hash join; the per-order
    max-lag folds through an order-key exchange carrying one row per
    order; months fold through a second, month-sized one."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate"])
    from ..functions.joins import hash_join
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey")

    def per_order(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate") \
            .to_numpy(zero_copy_only=False).astype("datetime64[us]")
        odate = batch.column("o_orderdate") \
            .to_numpy(zero_copy_only=False).astype("datetime64[us]")
        lag = ((ship - odate).astype("timedelta64[us]").astype(np.int64)
               // 86_400_000_000)
        month = pc.floor_temporal(batch.column("o_orderdate"),
                                  unit="month")
        t = pa.table({"okey": pc.cast(batch.column("l_orderkey"),
                                      pa.int64()),
                      "month": month, "lag": pa.array(lag)})
        res = t.group_by(["okey", "month"]).aggregate([("lag", "max")])
        return pa.table({"okey": res.column("okey"),
                         "month": res.column("month"),
                         "lag": res.column("lag_max")})

    per = partial_aggregate(joined.map_batches(per_order,
                                               batch_format="pyarrow"),
                            ["okey", "month"], [("lag", "max", "lag")])

    def per_month(batch: pa.Table) -> pa.Table:
        lag = batch.column("lag").to_numpy(zero_copy_only=False)
        t = pa.table({
            "month": batch.column("month"),
            "n_orders": pa.array(np.ones(len(batch), np.int64)),
            "n_ok": pa.array((lag <= sla_days).astype(np.int64))})
        res = t.group_by(["month"]).aggregate([("n_orders", "sum"),
                                               ("n_ok", "sum")])
        return pa.table({"month": res.column("month"),
                         "n_orders": res.column("n_orders_sum"),
                         "n_ok": res.column("n_ok_sum")})

    agg = partial_aggregate(per.map_batches(per_month,
                                            batch_format="pyarrow"),
                            ["month"], [("n_orders", "sum", "n_orders"),
                                        ("n_ok", "sum", "n_ok")])

    def share(batch: pa.Table) -> pa.Table:
        n = batch.column("n_orders").to_numpy(zero_copy_only=False)
        ok = batch.column("n_ok").to_numpy(zero_copy_only=False)
        return batch.append_column("ok_ppm", pa.array(
            (1_000_000 * ok) // np.maximum(n, 1)))

    return agg.map_batches(share, batch_format="pyarrow").sort("month")


def supplier_leadtime_variance_topk(sf_dir: str, k: int = 10
                                    ) -> ray.data.Dataset:
    """Supplier reliability screen: the 10 suppliers with the most
    ERRATIC lead time (order date → ship date), ranked by the exact
    integer variance numerator n·Σx²−(Σx)².  Moments are distributive
    (one partial-agg exchange over the supplier-cardinality aggregate);
    the numerator is emitted as an exact decimal STRING because at
    fleet scale n·Σx² exceeds both int64 and the 2^53 DOUBLE mantissa
    (the HUGEINT→DOUBLE rounding hazard)."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey",
                                     "l_shipdate"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate"])
    from ..functions.joins import hash_join
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey")

    def moments(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate") \
            .to_numpy(zero_copy_only=False).astype("datetime64[us]")
        odate = batch.column("o_orderdate") \
            .to_numpy(zero_copy_only=False).astype("datetime64[us]")
        x = ((ship - odate).astype("timedelta64[us]").astype(np.int64)
             // 86_400_000_000)
        t = pa.table({"supp": pc.cast(batch.column("l_suppkey"),
                                      pa.int64()),
                      "n": pa.array(np.ones(len(batch), np.int64)),
                      "s": pa.array(x), "ss": pa.array(x * x)})
        res = t.group_by(["supp"]).aggregate([("n", "sum"), ("s", "sum"),
                                              ("ss", "sum")])
        return pa.table({"supp": res.column("supp"),
                         "n": res.column("n_sum"),
                         "s": res.column("s_sum"),
                         "ss": res.column("ss_sum")})

    agg = pa.concat_tables(list(
        partial_aggregate(joined.map_batches(moments,
                                             batch_format="pyarrow"),
                          ["supp"], [("n", "sum", "n"), ("s", "sum", "s"),
                                     ("ss", "sum", "ss")])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    rows = sorted(
        ((int(n) * int(ss) - int(s) * int(s), int(supp), int(n))
         for supp, n, s, ss in zip(agg.column("supp").to_pylist(),
                                   agg.column("n").to_pylist(),
                                   agg.column("s").to_pylist(),
                                   agg.column("ss").to_pylist())),
        key=lambda r: (-r[0], r[1]))[:k]
    return ray.data.from_arrow(pa.table({
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        "n_lines": pa.array([r[2] for r in rows], pa.int64()),
        "var_num": pa.array([str(r[0]) for r in rows], pa.string())}))


def q4_late_order_share(sf_dir: str, grace_days: int = 60
                        ) -> ray.data.Dataset:
    """TPC-H Q4 adapted to this schema (no commit/receipt dates): for
    orders placed in 1995Q1, how many per priority had at least one
    line shipped more than ``grace_days`` after the order date — the
    EXISTS-semi-join shape.  The order scan prunes to the quarter
    BEFORE the hash join; the per-order ANY folds as a max through one
    order-key exchange, priorities through a tiny second."""
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate",
                                         "o_orderpriority"])

    def prune(batch: pa.Table) -> pa.Table:
        d = batch.column("o_orderdate")
        lo = np.datetime64("1995-01-01", "us").item()
        hi = np.datetime64("1995-04-01", "us").item()
        keep = pc.and_(pc.greater_equal(d, pa.scalar(lo)),
                       pc.less(d, pa.scalar(hi)))
        return batch.filter(keep)

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])
    from ..functions.joins import hash_join
    joined = hash_join(orders.map_batches(prune, batch_format="pyarrow"),
                       li, on="o_orderkey", right_on="l_orderkey")

    def per_order(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate") \
            .to_numpy(zero_copy_only=False).astype("datetime64[us]")
        odate = batch.column("o_orderdate") \
            .to_numpy(zero_copy_only=False).astype("datetime64[us]")
        lag = ((ship - odate).astype("timedelta64[us]").astype(np.int64)
               // 86_400_000_000)
        t = pa.table({"okey": pc.cast(batch.column("o_orderkey"),
                                      pa.int64()),
                      "prio": batch.column("o_orderpriority"),
                      "late": pa.array((lag > grace_days)
                                       .astype(np.int64))})
        res = t.group_by(["okey", "prio"]).aggregate([("late", "max")])
        return pa.table({"okey": res.column("okey"),
                         "prio": res.column("prio"),
                         "late": res.column("late_max")})

    per = partial_aggregate(joined.map_batches(per_order,
                                               batch_format="pyarrow"),
                            ["okey", "prio"], [("late", "max", "late")])

    def per_prio(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_orderpriority": batch.column("prio"),
                      "n_late_orders": batch.column("late")})
        res = t.group_by(["o_orderpriority"]) \
            .aggregate([("n_late_orders", "sum")])
        return pa.table({
            "o_orderpriority": res.column("o_orderpriority"),
            "n_late_orders": res.column("n_late_orders_sum")})

    return partial_aggregate(
        per.map_batches(per_prio, batch_format="pyarrow"),
        ["o_orderpriority"],
        [("n_late_orders", "sum", "n_late_orders")]) \
        .sort("o_orderpriority")


def q22_sales_opportunity(sf_dir: str,
                          cutoff: str = "2000-01-01") -> ray.data.Dataset:
    """TPC-H Q22 adapted: per nation, the count and total balance
    (cents) of LAPSED customers — balance above the positive-balance
    mean, no order since ``cutoff``.  The mean test is the exact
    integer cross-multiplication bal·n_pos > Σ_pos; lapsed-ness is a
    shuffle anti-join against the distinct recent-order custkeys
    (recency filter pushed below the key projection) — neither side
    ever lands on the driver."""
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey",
                                       "c_acctbal"])

    def moments(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("c_acctbal")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        pos = cents > 0
        return pa.table({"one": pa.array([1], pa.int64()),
                         "n_pos": pa.array([int(pos.sum())], pa.int64()),
                         "sum_pos": pa.array([int(cents[pos].sum())],
                                             pa.int64())})

    mom = pa.concat_tables(list(
        partial_aggregate(cust.map_batches(moments,
                                           batch_format="pyarrow"),
                          ["one"], [("n_pos", "sum", "n_pos"),
                                    ("sum_pos", "sum", "sum_pos")])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    n_pos = int(mom.column("n_pos")[0].as_py())
    sum_pos = int(mom.column("sum_pos")[0].as_py())

    def above_avg(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("c_acctbal")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        keep = cents * n_pos > sum_pos
        out = batch.filter(pa.array(keep))
        return out.append_column("bal_cents", pa.array(
            np.rint(out.column("c_acctbal")
                    .to_numpy(zero_copy_only=False) * 100)
            .astype(np.int64)))

    rich = cust.map_batches(above_avg, batch_format="pyarrow")
    cut = np.datetime64(cutoff, "us").item()

    def recent_keys(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(b.column("o_orderdate"), pa.scalar(cut))
        return pa.table({"c_custkey": pc.unique(pc.cast(
            b.column("o_custkey").filter(keep), pa.int64()))})

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_orderdate"]) \
        .map_batches(recent_keys, batch_format="pyarrow")
    from ..functions.joins import shuffle_anti_join
    never = shuffle_anti_join(
        rich.map_batches(lambda b: b.set_column(
            b.schema.get_field_index("c_custkey"), "c_custkey",
            pc.cast(b.column("c_custkey"), pa.int64())),
            batch_format="pyarrow"),
        orders, "c_custkey")

    def per_nation(batch: pa.Table) -> pa.Table:
        t = pa.table({"c_nationkey": pc.cast(batch.column("c_nationkey"),
                                             pa.int64()),
                      "n_custs": pa.array(np.ones(len(batch), np.int64)),
                      "total_cents": batch.column("bal_cents")})
        res = t.group_by(["c_nationkey"]).aggregate(
            [("n_custs", "sum"), ("total_cents", "sum")])
        return pa.table({"c_nationkey": res.column("c_nationkey"),
                         "n_custs": res.column("n_custs_sum"),
                         "total_cents": res.column("total_cents_sum")})

    return partial_aggregate(
        never.map_batches(per_nation, batch_format="pyarrow"),
        ["c_nationkey"], [("n_custs", "sum", "n_custs"),
                          ("total_cents", "sum", "total_cents")]) \
        .sort("c_nationkey")


def supplier_customer_concentration_hist(sf_dir: str) -> ray.data.Dataset:
    """Concentration-risk screen: per supplier, the revenue share (ppm)
    of its single largest customer, histogrammed by share decile.  The
    (supplier, customer) revenue matrix folds through one exchange;
    per-supplier top-1 and total are BOTH distributive over it (max and
    sum), so no sort and no per-supplier state anywhere."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey",
                                     "l_extendedprice"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    from ..functions.joins import hash_join
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey")

    def pair_rev(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"supp": pc.cast(batch.column("l_suppkey"),
                                      pa.int64()),
                      "cust": pc.cast(batch.column("o_custkey"),
                                      pa.int64()),
                      "cents": pa.array(cents)})
        res = t.group_by(["supp", "cust"]).aggregate([("cents", "sum")])
        return pa.table({"supp": res.column("supp"),
                         "cust": res.column("cust"),
                         "cents": res.column("cents_sum")})

    pair = partial_aggregate(joined.map_batches(pair_rev,
                                                batch_format="pyarrow"),
                             ["supp", "cust"], [("cents", "sum",
                                                 "cents")])

    def per_supp(batch: pa.Table) -> pa.Table:
        t = pa.table({"supp": batch.column("supp"),
                      "top": batch.column("cents"),
                      "total": batch.column("cents")})
        res = t.group_by(["supp"]).aggregate([("top", "max"),
                                              ("total", "sum")])
        return pa.table({"supp": res.column("supp"),
                         "top": res.column("top_max"),
                         "total": res.column("total_sum")})

    supp = partial_aggregate(pair.map_batches(per_supp,
                                              batch_format="pyarrow"),
                             ["supp"], [("top", "max", "top"),
                                        ("total", "sum", "total")])

    def hist(batch: pa.Table) -> pa.Table:
        top = batch.column("top").to_numpy(zero_copy_only=False)
        tot = batch.column("total").to_numpy(zero_copy_only=False)
        dec = (1_000_000 * top // np.maximum(tot, 1)) // 100_000
        t = pa.table({"share_decile": pa.array(dec.astype(np.int64)),
                      "n_suppliers": pa.array(np.ones(len(batch),
                                                      np.int64))})
        res = t.group_by(["share_decile"]) \
            .aggregate([("n_suppliers", "sum")])
        return pa.table({"share_decile": res.column("share_decile"),
                         "n_suppliers": res.column("n_suppliers_sum")})

    return partial_aggregate(
        supp.map_batches(hist, batch_format="pyarrow"),
        ["share_decile"], [("n_suppliers", "sum", "n_suppliers")]) \
        .sort("share_decile")


def daily_count_autocorr(sf_dir: str, lags: tuple = (1, 7)) -> pa.Table:
    """Calendar autocorrelation probe of the daily event-count series:
    for each lag L, the exact integer correlation NUMERATOR
    n'·Σxy − Σx·Σy over all observed day pairs (d, d−L) — the
    weekly-seasonality detector.  The fact scan folds to one bounded
    row per day; the lag joins run over that aggregate on the driver,
    and the numerator ships as a decimal string (it exceeds 2^53 at
    fleet scale)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        t = pa.table({"day": day,
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["day"]).aggregate([("n", "sum")])
        return pa.table({"day": res.column("day"),
                         "n": res.column("n_sum")})

    cells = pa.concat_tables(list(
        partial_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                          ["day"], [("n", "sum", "n")])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    day = cells.column("day").to_numpy(zero_copy_only=False) \
        .astype("datetime64[D]")
    n = cells.column("n").to_numpy(zero_copy_only=False)
    counts = dict(zip(day.astype(np.int64).tolist(), n.tolist()))
    out_lag, out_pairs, out_num = [], [], []
    for lag in lags:
        xs, ys = [], []
        for d, x in counts.items():
            if d - lag in counts:
                xs.append(int(x))
                ys.append(int(counts[d - lag]))
        m = len(xs)
        num = (m * sum(a * b for a, b in zip(xs, ys))
               - sum(xs) * sum(ys))
        out_lag.append(int(lag))
        out_pairs.append(m)
        out_num.append(str(num))
    return pa.table({"lag_days": pa.array(out_lag, pa.int64()),
                     "n_pairs": pa.array(out_pairs, pa.int64()),
                     "corr_num": pa.array(out_num, pa.string())})


def region_trade_matrix(sf_dir: str) -> ray.data.Dataset:
    """Region-to-region trade flow (TPC-H Q5/Q7 generalized): revenue
    cents for every (customer region, supplier region) cell.  The two
    fact-side key resolutions (order→customer, line→order) are
    distributed hash joins; nation→region and supplier→nation are
    broadcast dictionaries (dimension tables, ray.put once); the final
    exchange carries ≤ regions² partial rows."""
    from ..functions.joins import hash_join
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    rname = dict(zip(region.column("r_regionkey").to_pylist(),
                     region.column("r_name").to_pylist()))
    nat2reg = {int(k): rname[int(r)] for k, r in
               zip(nation.column("n_nationkey").to_pylist(),
                   nation.column("n_regionkey").to_pylist())}
    supplier = pq.read_table(f"{sf_dir}/supplier.parquet",
                             columns=["s_suppkey", "s_nationkey"])
    supp2reg_ref = ray.put({int(s): nat2reg[int(n)] for s, n in
                            zip(supplier.column("s_suppkey").to_pylist(),
                                supplier.column("s_nationkey")
                                .to_pylist())})
    nat2reg_ref = ray.put(nat2reg)

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey",
                                     "l_extendedprice"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])
    oc = hash_join(orders, cust, on="o_custkey", right_on="c_custkey")
    joined = hash_join(li, oc, on="l_orderkey", right_on="o_orderkey")

    def cell(batch: pa.Table) -> pa.Table:
        s2r = ray.get(supp2reg_ref)
        n2r = ray.get(nat2reg_ref)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        cr = [n2r[int(n)] for n in
              batch.column("c_nationkey").to_pylist()]
        sr = [s2r[int(s)] for s in
              batch.column("l_suppkey").to_pylist()]
        t = pa.table({"cust_region": pa.array(cr, pa.string()),
                      "supp_region": pa.array(sr, pa.string()),
                      "revenue_cents": pa.array(cents)})
        res = t.group_by(["cust_region", "supp_region"]) \
            .aggregate([("revenue_cents", "sum")])
        return pa.table({
            "cust_region": res.column("cust_region"),
            "supp_region": res.column("supp_region"),
            "revenue_cents": res.column("revenue_cents_sum")})

    return partial_aggregate(
        joined.map_batches(cell, batch_format="pyarrow"),
        ["cust_region", "supp_region"],
        [("revenue_cents", "sum", "revenue_cents")]) \
        .sort(["cust_region", "supp_region"])


def part_supplier_price_spread_hist(sf_dir: str) -> ray.data.Dataset:
    """Price-dispersion audit: per part, the spread between its most
    and least expensive supplier's integer unit price (Σcents // Σqty
    per (part, supplier) — exact), histogrammed into log2 buckets.
    The (part, supplier) moments fold through one exchange; per-part
    max/min are distributive over it; the histogram is tiny."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey",
                                     "l_extendedprice", "l_quantity"])

    def pair(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        qty = np.rint(batch.column("l_quantity")
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        t = pa.table({"part": pc.cast(batch.column("l_partkey"),
                                      pa.int64()),
                      "supp": pc.cast(batch.column("l_suppkey"),
                                      pa.int64()),
                      "cents": pa.array(cents), "qty": pa.array(qty)})
        res = t.group_by(["part", "supp"]).aggregate(
            [("cents", "sum"), ("qty", "sum")])
        return pa.table({"part": res.column("part"),
                         "supp": res.column("supp"),
                         "cents": res.column("cents_sum"),
                         "qty": res.column("qty_sum")})

    pairs = partial_aggregate(
        ds.map_batches(pair, batch_format="pyarrow"),
        ["part", "supp"], [("cents", "sum", "cents"),
                           ("qty", "sum", "qty")])

    def per_part(batch: pa.Table) -> pa.Table:
        cents = batch.column("cents").to_numpy(zero_copy_only=False)
        qty = batch.column("qty").to_numpy(zero_copy_only=False)
        unit = cents // np.maximum(qty, 1)
        t = pa.table({"part": batch.column("part"),
                      "u_max": pa.array(unit), "u_min": pa.array(unit)})
        res = t.group_by(["part"]).aggregate([("u_max", "max"),
                                              ("u_min", "min")])
        return pa.table({"part": res.column("part"),
                         "u_max": res.column("u_max_max"),
                         "u_min": res.column("u_min_min")})

    per = partial_aggregate(pairs.map_batches(per_part,
                                              batch_format="pyarrow"),
                            ["part"], [("u_max", "max", "u_max"),
                                       ("u_min", "min", "u_min")])

    def hist(batch: pa.Table) -> pa.Table:
        spread = (batch.column("u_max").to_numpy(zero_copy_only=False)
                  - batch.column("u_min").to_numpy(zero_copy_only=False))
        b = np.full(len(spread), -1, np.int64)
        pos = spread > 0
        b[pos] = np.floor(np.log2(spread[pos])).astype(np.int64)
        t = pa.table({"spread_log2": pa.array(b),
                      "n_parts": pa.array(np.ones(len(b), np.int64))})
        res = t.group_by(["spread_log2"]).aggregate([("n_parts", "sum")])
        return pa.table({"spread_log2": res.column("spread_log2"),
                         "n_parts": res.column("n_parts_sum")})

    return partial_aggregate(
        per.map_batches(hist, batch_format="pyarrow"),
        ["spread_log2"], [("n_parts", "sum", "n_parts")]) \
        .sort("spread_log2")


def first_line_dominance_ppm(sf_dir: str) -> ray.data.Dataset:
    """Order-composition audit: among multi-line orders, how often is
    line 1 the single most expensive line (price ties count) — a probe
    of whether 'first item in the basket is the anchor purchase'.  The
    per-order fold carries three distributive stats (max price, line-1
    price via −1-sentinel max, line count); one audit row leaves."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber",
                                     "l_extendedprice"])

    def per_order(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        ln = batch.column("l_linenumber") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        p1 = np.where(ln == 1, cents, -1)
        t = pa.table({"okey": pc.cast(batch.column("l_orderkey"),
                                      pa.int64()),
                      "pmax": pa.array(cents), "p1": pa.array(p1),
                      "n_lines": pa.array(np.ones(len(batch),
                                                  np.int64))})
        res = t.group_by(["okey"]).aggregate(
            [("pmax", "max"), ("p1", "max"), ("n_lines", "sum")])
        return pa.table({"okey": res.column("okey"),
                         "pmax": res.column("pmax_max"),
                         "p1": res.column("p1_max"),
                         "n_lines": res.column("n_lines_sum")})

    per = partial_aggregate(
        ds.map_batches(per_order, batch_format="pyarrow"),
        ["okey"], [("pmax", "max", "pmax"), ("p1", "max", "p1"),
                   ("n_lines", "sum", "n_lines")])

    def fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n_lines").to_numpy(zero_copy_only=False)
        pmax = batch.column("pmax").to_numpy(zero_copy_only=False)
        p1 = batch.column("p1").to_numpy(zero_copy_only=False)
        multi = n >= 2
        dom = multi & (p1 == pmax)
        return pa.table({
            "n_multi": pa.array([int(multi.sum())], pa.int64()),
            "n_dominant": pa.array([int(dom.sum())], pa.int64())})

    parts = pa.concat_tables(list(
        per.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    n_multi = int(pc.sum(parts.column("n_multi")).as_py() or 0)
    n_dom = int(pc.sum(parts.column("n_dominant")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "n_multi": pa.array([n_multi], pa.int64()),
        "n_dominant": pa.array([n_dom], pa.int64()),
        "dominance_ppm": pa.array(
            [1_000_000 * n_dom // max(n_multi, 1)], pa.int64())}))


def source_ttr_ppm(sf_dir: str) -> ray.data.Dataset:
    """Corpus-level type-token ratio per source (ppm, floor div —
    exact): the vocabulary-richness signal that separates boilerplate
    feeds from organic text.  (source, token) occurrence counts fold
    through one coarse exchange; the per-source distinct/total fold is
    a second aggregate over the already-aggregated vocabulary, never
    over raw occurrences."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def surface(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = np.repeat(np.asarray(batch.column("source").to_pylist(),
                                   dtype=object), n_tok)
        t = pa.table({"source": pa.array(list(src), pa.string()),
                      "token": pc.list_flatten(toks),
                      "n": pa.array(np.ones(int(n_tok.sum()),
                                            np.int64))})
        res = t.group_by(["source", "token"]).aggregate([("n", "sum")])
        return pa.table({"source": res.column("source"),
                         "token": res.column("token"),
                         "n": res.column("n_sum")})

    vocab = partial_aggregate(ds.map_batches(surface,
                                             batch_format="pyarrow"),
                              ["source", "token"], [("n", "sum", "n")])

    def per_source(batch: pa.Table) -> pa.Table:
        t = pa.table({"source": batch.column("source"),
                      "n_types": pa.array(np.ones(len(batch),
                                                  np.int64)),
                      "n_tokens": batch.column("n")})
        res = t.group_by(["source"]).aggregate(
            [("n_types", "sum"), ("n_tokens", "sum")])
        return pa.table({"source": res.column("source"),
                         "n_types": res.column("n_types_sum"),
                         "n_tokens": res.column("n_tokens_sum")})

    agg = partial_aggregate(vocab.map_batches(per_source,
                                              batch_format="pyarrow"),
                            ["source"], [("n_types", "sum", "n_types"),
                                         ("n_tokens", "sum",
                                          "n_tokens")])

    def ttr(batch: pa.Table) -> pa.Table:
        ty = batch.column("n_types").to_numpy(zero_copy_only=False)
        to = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        return batch.append_column("ttr_ppm", pa.array(
            (1_000_000 * ty) // np.maximum(to, 1)))

    return agg.map_batches(ttr, batch_format="pyarrow").sort("source")


def distinct_users_multigrain(sf_dir: str) -> ray.data.Dataset:
    """Distinct users at day, ISO-week and month grain in one pass —
    the re-aggregation hazard demo: COUNT DISTINCT is NOT distributive
    across grains, so each grain dedupes its own (bucket, user) pairs
    through the exchange (pairs, never raw events) before the bounded
    count fold."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id"])

    def pairs(batch: pa.Table) -> pa.Table:
        parts = []
        for grain in ("day", "week", "month"):
            b = pc.floor_temporal(batch.column("ts"), unit=grain)
            t = pa.table({"grain": pa.array([grain] * len(batch),
                                            pa.string()),
                          "bucket": b,
                          "user_id": pc.cast(batch.column("user_id"),
                                             pa.int64()),
                          "n": pa.array(np.ones(len(batch), np.int64))})
            res = t.group_by(["grain", "bucket", "user_id"]) \
                .aggregate([("n", "max")])
            parts.append(pa.table({
                "grain": res.column("grain"),
                "bucket": res.column("bucket"),
                "user_id": res.column("user_id"),
                "n": res.column("n_max")}))
        return pa.concat_tables(parts)

    dedup = partial_aggregate(ds.map_batches(pairs,
                                             batch_format="pyarrow"),
                              ["grain", "bucket", "user_id"],
                              [("n", "max", "n")])

    def count_users(batch: pa.Table) -> pa.Table:
        t = pa.table({"grain": batch.column("grain"),
                      "bucket": batch.column("bucket"),
                      "n_users": pa.array(np.ones(len(batch),
                                                  np.int64))})
        res = t.group_by(["grain", "bucket"]) \
            .aggregate([("n_users", "sum")])
        return pa.table({"grain": res.column("grain"),
                         "bucket": res.column("bucket"),
                         "n_users": res.column("n_users_sum")})

    return partial_aggregate(
        dedup.map_batches(count_users, batch_format="pyarrow"),
        ["grain", "bucket"], [("n_users", "sum", "n_users")]) \
        .sort(["grain", "bucket"])


def user_modal_type_churn(sf_dir: str,
                          split: str = "2024-01-16") -> ray.data.Dataset:
    """Behavioral-drift matrix: each user's modal event type BEFORE the
    split date versus AFTER it (ties → lexicographically smaller type),
    counted into a (before, after) matrix over users active in both
    halves.  (user, half, type) counts fold through one exchange; the
    per-user modal argmax folds inside coarse user buckets, vectorized
    per bucket."""
    cut = np.datetime64(split, "us").item()
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id", "event_type"])

    def counts(batch: pa.Table) -> pa.Table:
        half = pc.if_else(pc.less(batch.column("ts"), pa.scalar(cut)),
                          pa.scalar(0, pa.int64()),
                          pa.scalar(1, pa.int64()))
        t = pa.table({"user_id": pc.cast(batch.column("user_id"),
                                         pa.int64()),
                      "half": half,
                      "event_type": batch.column("event_type"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["user_id", "half", "event_type"]) \
            .aggregate([("n", "sum")])
        return pa.table({"user_id": res.column("user_id"),
                         "half": res.column("half"),
                         "event_type": res.column("event_type"),
                         "n": res.column("n_sum")})

    cells = partial_aggregate(ds.map_batches(counts,
                                             batch_format="pyarrow"),
                              ["user_id", "half", "event_type"],
                              [("n", "sum", "n")])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__ub",
                                   bucket_ids(batch, ["user_id"]))

    def per_bucket(group: pa.Table) -> pa.Table:
        # modal type per (user, half): sort by count desc, type asc,
        # take the first row of each (user, half) run
        t = group.take(pc.sort_indices(
            group, sort_keys=[("user_id", "ascending"),
                              ("half", "ascending"),
                              ("n", "descending"),
                              ("event_type", "ascending")]))
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        h = t.column("half").to_numpy(zero_copy_only=False)
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        if len(u) == 0:
            return pa.table({"before_type": pa.array([], pa.string()),
                             "after_type": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64())})
        first = np.r_[True, (u[1:] != u[:-1]) | (h[1:] != h[:-1])]
        mu, mh, mt = u[first], h[first], ty[first]
        # users with both halves appear as consecutive (h=0, h=1) rows
        both = (mu[:-1] == mu[1:]) & (mh[:-1] == 0) & (mh[1:] == 1) \
            if len(mu) > 1 else np.array([], bool)
        b = mt[:-1][both] if len(mu) > 1 else np.array([], object)
        a = mt[1:][both] if len(mu) > 1 else np.array([], object)
        tt = pa.table({"before_type": pa.array(list(b), pa.string()),
                       "after_type": pa.array(list(a), pa.string()),
                       "n_users": pa.array(np.ones(len(b), np.int64))})
        res = tt.group_by(["before_type", "after_type"]) \
            .aggregate([("n_users", "sum")])
        return pa.table({"before_type": res.column("before_type"),
                         "after_type": res.column("after_type"),
                         "n_users": res.column("n_users_sum")})

    per = (cells.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("__ub").map_groups(per_bucket,
                                       batch_format="pyarrow"))
    return partial_aggregate(per, ["before_type", "after_type"],
                             [("n_users", "sum", "n_users")]) \
        .sort(["before_type", "after_type"])


def label_inertia_moments(sf_dir: str) -> pa.Table:
    """Cluster-quality moments per embedding label: n and the exact
    k-means inertia NUMERATOR n·Σ‖q‖² − ‖Σq‖² at e4 quantization
    (denominator n) — the within-cluster scatter without ever forming
    a float centroid.  Per-dim sums and squared-norm sums fold through
    one (label, dim) exchange; the Python-int driver fold emits the
    numerator as a decimal string (it exceeds int64 at fleet scale)."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding", "label"])

    def per_batch(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column("embedding")
                     .to_numpy(zero_copy_only=False))
        q = np.rint(m.astype(np.float64) * 10_000).astype(np.int64)
        lab_type = batch.column("label").type
        labels = np.asarray(batch.column("label").to_pylist(),
                            dtype=object)
        parts = []
        for lab in sorted(set(labels)):
            rows = q[labels == lab]
            d = q.shape[1]
            parts.append(pa.table({
                "label": pa.array([lab] * d, lab_type),
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "s": pa.array(rows.sum(axis=0)),
                "ss": pa.array((rows * rows).sum(axis=0)),
                "n": pa.array(([len(rows)] + [0] * (d - 1)),
                              type=pa.int64())}))
        return pa.concat_tables(parts)

    agg = pa.concat_tables(list(
        partial_aggregate(ds.map_batches(per_batch,
                                         batch_format="pyarrow"),
                          ["label", "dim"],
                          [("s", "sum", "s"), ("ss", "sum", "ss"),
                           ("n", "sum", "n")])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    out: dict = {}
    for lab, s, ss, n in zip(agg.column("label").to_pylist(),
                             agg.column("s").to_pylist(),
                             agg.column("ss").to_pylist(),
                             agg.column("n").to_pylist()):
        st = out.setdefault(lab, [0, 0, 0])  # n, sumsq, csq
        st[0] += int(n)
        st[1] += int(ss)
        st[2] += int(s) * int(s)
    labs = sorted(out)
    return pa.table({
        "label": pa.array(labs, agg.column("label").type),
        "n_vectors": pa.array([out[l][0] for l in labs], pa.int64()),
        "inertia_num": pa.array(
            [str(out[l][0] * out[l][1] - out[l][2]) for l in labs],
            pa.string())})


def event_dow_value_share(sf_dir: str) -> ray.data.Dataset:
    """Revenue weight by ISO weekday: event count, value cents and each
    weekday's ppm share of total value — the volume-vs-value calendar
    skew check.  Seven partial rows per batch; shares divide the tiny
    final table on the driver side of one exchange."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])

    def cells(batch: pa.Table) -> pa.Table:
        dow = pc.cast(pc.add(pc.day_of_week(batch.column("ts")), 1),
                      pa.int64())
        cents = np.rint(batch.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"isodow": dow,
                      "n_events": pa.array(np.ones(len(batch),
                                                   np.int64)),
                      "value_cents": pa.array(cents)})
        res = t.group_by(["isodow"]).aggregate(
            [("n_events", "sum"), ("value_cents", "sum")])
        return pa.table({"isodow": res.column("isodow"),
                         "n_events": res.column("n_events_sum"),
                         "value_cents": res.column("value_cents_sum")})

    rows = pa.concat_tables(list(
        partial_aggregate(ds.map_batches(cells, batch_format="pyarrow"),
                          ["isodow"], [("n_events", "sum", "n_events"),
                                       ("value_cents", "sum",
                                        "value_cents")])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    order = np.argsort(rows.column("isodow").to_numpy(
        zero_copy_only=False))
    rows = rows.take(pa.array(order, pa.int64()))
    v = rows.column("value_cents").to_numpy(zero_copy_only=False)
    total = max(int(v.sum()), 1)
    return ray.data.from_arrow(rows.append_column(
        "value_share_ppm",
        pa.array([1_000_000 * int(x) // total for x in v], pa.int64())))


def monthly_new_customer_revenue_share(sf_dir: str) -> ray.data.Dataset:
    """Growth accounting at the revenue grain: each month's order value
    (cents) split into first-month-customer revenue vs repeat revenue,
    with the new share in ppm.  The (customer, month) aggregate folds
    through one exchange; inside coarse customer buckets the sorted
    first-row-per-run IS the customer's first month, so new/repeat
    splits vectorized with no second pass over facts."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_totalprice"])

    def cm(batch: pa.Table) -> pa.Table:
        month = pc.floor_temporal(batch.column("o_orderdate"),
                                  unit="month")
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"cust": pc.cast(batch.column("o_custkey"),
                                      pa.int64()),
                      "month": month, "cents": pa.array(cents)})
        res = t.group_by(["cust", "month"]).aggregate([("cents", "sum")])
        return pa.table({"cust": res.column("cust"),
                         "month": res.column("month"),
                         "cents": res.column("cents_sum")})

    agg = partial_aggregate(ds.map_batches(cm, batch_format="pyarrow"),
                            ["cust", "month"], [("cents", "sum",
                                                 "cents")])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__ub", bucket_ids(batch, ["cust"]))

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.take(pc.sort_indices(
            group, sort_keys=[("cust", "ascending"),
                              ("month", "ascending")]))
        c = t.column("cust").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        if len(c) == 0:
            return pa.table({"month": pa.array([], pa.timestamp("us")),
                             "new_cents": pa.array([], pa.int64()),
                             "repeat_cents": pa.array([], pa.int64())})
        first = np.r_[True, c[1:] != c[:-1]]
        tt = pa.table({
            "month": t.column("month"),
            "new_cents": pa.array(np.where(first, cents, 0)),
            "repeat_cents": pa.array(np.where(first, 0, cents))})
        res = tt.group_by(["month"]).aggregate(
            [("new_cents", "sum"), ("repeat_cents", "sum")])
        return pa.table({"month": res.column("month"),
                         "new_cents": res.column("new_cents_sum"),
                         "repeat_cents":
                             res.column("repeat_cents_sum")})

    per = (agg.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("__ub").map_groups(per_bucket,
                                       batch_format="pyarrow"))
    out = partial_aggregate(per, ["month"],
                            [("new_cents", "sum", "new_cents"),
                             ("repeat_cents", "sum", "repeat_cents")])

    def share(batch: pa.Table) -> pa.Table:
        nw = batch.column("new_cents").to_numpy(zero_copy_only=False)
        rp = batch.column("repeat_cents").to_numpy(zero_copy_only=False)
        return batch.append_column("new_share_ppm", pa.array(
            (1_000_000 * nw) // np.maximum(nw + rp, 1)))

    return out.map_batches(share, batch_format="pyarrow").sort("month")


def orderkey_range_partition_plan(sf_dir: str,
                                  n_partitions: int = 16) -> pa.Table:
    """Range-partitioner planning: 15 exact equi-depth boundary keys of
    o_orderkey (quantile_disc rank semantics via the multi-pass
    histogram-narrowing selector — no global sort) plus the exact row
    count landing in each partition from one counting pass with the
    boundaries broadcast.  This is the plan a sort/range-shuffle would
    ship to every mapper."""
    from ..functions.quantiles import exact_quantiles
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey"])
    qs = tuple(i / n_partitions for i in range(1, n_partitions))
    qt = exact_quantiles(ds, "o_orderkey", qs=qs)
    bounds = np.array(qt.column("value").to_pylist(), np.int64)

    def counts(batch: pa.Table) -> pa.Table:
        v = np.sort(batch.column("o_orderkey")
                    .to_numpy(zero_copy_only=False).astype(np.int64))
        cum = np.searchsorted(v, bounds, side="right").astype(np.int64)
        per = np.diff(np.r_[0, cum, len(v)])
        return pa.table({
            "bucket_id": pa.array(np.arange(1, n_partitions + 1,
                                            dtype=np.int64)),
            "n_rows": pa.array(per),
            "mx": pa.array(np.full(n_partitions,
                                   int(v.max()) if len(v) else -1,
                                   np.int64))})

    rows = pa.concat_tables(list(
        partial_aggregate(ds.map_batches(counts, batch_format="pyarrow"),
                          ["bucket_id"], [("n_rows", "sum", "n_rows"),
                                          ("mx", "max", "mx")])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    order = np.argsort(rows.column("bucket_id")
                       .to_numpy(zero_copy_only=False))
    rows = rows.take(pa.array(order, pa.int64()))
    global_max = int(pc.max(rows.column("mx")).as_py())
    upper = np.r_[bounds, global_max]
    return pa.table({
        "bucket_id": rows.column("bucket_id"),
        "upper_key": pa.array(upper, pa.int64()),
        "n_rows": rows.column("n_rows")})


def part_margin_below_retail(sf_dir: str) -> ray.data.Dataset:
    """Margin-leak audit by brand: lines whose realized integer unit
    price (Σcents // qty per line) undercuts the part's retail price,
    counted and shared (ppm) per brand.  The fact-side key resolution
    is a distributed hash join against the part dimension; brand
    partials fold through one tiny exchange."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_extendedprice",
                                     "l_quantity"])
    part = read_parquet_clean(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_brand",
                                       "p_retailprice"])
    from ..functions.joins import hash_join
    joined = hash_join(li, part, on="l_partkey", right_on="p_partkey")

    def per_brand(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        qty = np.rint(batch.column("l_quantity")
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        retail = np.rint(batch.column("p_retailprice")
                         .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        below = (cents // np.maximum(qty, 1)) < retail
        t = pa.table({"p_brand": batch.column("p_brand"),
                      "n_lines": pa.array(np.ones(len(batch),
                                                  np.int64)),
                      "n_below": pa.array(below.astype(np.int64))})
        res = t.group_by(["p_brand"]).aggregate(
            [("n_lines", "sum"), ("n_below", "sum")])
        return pa.table({"p_brand": res.column("p_brand"),
                         "n_lines": res.column("n_lines_sum"),
                         "n_below": res.column("n_below_sum")})

    agg = partial_aggregate(joined.map_batches(per_brand,
                                               batch_format="pyarrow"),
                            ["p_brand"], [("n_lines", "sum", "n_lines"),
                                          ("n_below", "sum",
                                           "n_below")])

    def share(batch: pa.Table) -> pa.Table:
        n = batch.column("n_lines").to_numpy(zero_copy_only=False)
        b = batch.column("n_below").to_numpy(zero_copy_only=False)
        return batch.append_column("below_ppm", pa.array(
            (1_000_000 * b) // np.maximum(n, 1)))

    return agg.map_batches(share, batch_format="pyarrow") \
        .sort("p_brand")


def second_order_within30_ppm(sf_dir: str, window_days: int = 30
                              ) -> ray.data.Dataset:
    """Activation-velocity audit: among customers with ≥2 orders, the
    share (ppm) whose SECOND order landed within ``window_days`` of the
    first.  The exchange groups coarse customer buckets over
    (customer, date, key) rows; one in-bucket sort exposes each
    customer's first two orders as the first two rows of its run —
    second-order statistics without per-customer state."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate",
                                     "o_orderkey"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__ub",
                                   bucket_ids(batch, ["o_custkey"]))

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.take(pc.sort_indices(
            group, sort_keys=[("o_custkey", "ascending"),
                              ("o_orderdate", "ascending"),
                              ("o_orderkey", "ascending")]))
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        d = t.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        if len(c) < 2:
            return pa.table({"n_multi": pa.array([0], pa.int64()),
                             "n_within": pa.array([0], pa.int64())})
        first = np.r_[True, c[1:] != c[:-1]]
        second = np.r_[False, first[:-1]] & np.r_[False, c[1:] == c[:-1]]
        gap_days = np.full(len(c), -1, np.int64)
        gap_days[1:] = ((d[1:] - d[:-1])
                        .astype("timedelta64[us]").astype(np.int64)
                        // 86_400_000_000)
        n_multi = int(second.sum())
        n_within = int((second & (gap_days <= window_days)).sum())
        return pa.table({"n_multi": pa.array([n_multi], pa.int64()),
                         "n_within": pa.array([n_within], pa.int64())})

    parts = pa.concat_tables(list(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__ub").map_groups(per_bucket, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    n_multi = int(pc.sum(parts.column("n_multi")).as_py() or 0)
    n_within = int(pc.sum(parts.column("n_within")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "n_multi": pa.array([n_multi], pa.int64()),
        "n_within": pa.array([n_within], pa.int64()),
        "within_ppm": pa.array([1_000_000 * n_within
                                // max(n_multi, 1)], pa.int64())}))


def stopword_share_by_source(sf_dir: str) -> ray.data.Dataset:
    """Quality-signal grain check: per source, total tokens, stopword
    tokens (the engine's 7-word function list) and the stopword share
    in ppm — the fluency/boilerplate split across feeds.  One
    vectorized is_in per batch, seven partial rows per batch through
    the exchange."""
    from ..functions.text import STOPWORDS
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["source", "text"])

    def per_batch(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        is_stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS))) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(np.asarray(batch.column("source").to_pylist(),
                                   dtype=object), n_tok)
        t = pa.table({"source": pa.array(list(src), pa.string()),
                      "n_tokens": pa.array(np.ones(int(n_tok.sum()),
                                                   np.int64)),
                      "n_stopwords": pa.array(is_stop)})
        res = t.group_by(["source"]).aggregate(
            [("n_tokens", "sum"), ("n_stopwords", "sum")])
        return pa.table({"source": res.column("source"),
                         "n_tokens": res.column("n_tokens_sum"),
                         "n_stopwords": res.column("n_stopwords_sum")})

    agg = partial_aggregate(ds.map_batches(per_batch,
                                           batch_format="pyarrow"),
                            ["source"], [("n_tokens", "sum", "n_tokens"),
                                         ("n_stopwords", "sum",
                                          "n_stopwords")])

    def share(batch: pa.Table) -> pa.Table:
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        s = batch.column("n_stopwords").to_numpy(zero_copy_only=False)
        return batch.append_column("stopword_ppm", pa.array(
            (1_000_000 * s) // np.maximum(n, 1)))

    return agg.map_batches(share, batch_format="pyarrow").sort("source")


def dup_shingles_topk(sf_dir: str, n: int = 16,
                      k: int = 20) -> ray.data.Dataset:
    """Boilerplate detector at shingle grain: the 16-token windows
    appearing in TWO OR MORE distinct documents, ranked by document
    frequency — the shared-template signal exact doc-level dedup
    misses, and the exact counterpart of what MinHash bands only
    approximate.  Per-doc distinct shingles emit (shingle, 1)
    partials; doc frequencies fold through the coarse-bucket exchange;
    only the ≥2 tail sorts."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def per_doc(batch: pa.Table) -> pa.Table:
        shingles: list[str] = []
        for text in batch.column("text").to_pylist():
            toks = text.split(" ")
            if len(toks) < n:
                continue
            seen = {" ".join(toks[i:i + n])
                    for i in range(len(toks) - n + 1)}
            shingles.extend(seen)
        t = pa.table({"shingle": pa.array(shingles, pa.string()),
                      "df": pa.array(np.ones(len(shingles), np.int64))})
        res = t.group_by(["shingle"]).aggregate([("df", "sum")])
        return pa.table({"shingle": res.column("shingle"),
                         "df": res.column("df_sum")})

    dfs = partial_aggregate(ds.map_batches(per_doc,
                                           batch_format="pyarrow"),
                            ["shingle"], [("df", "sum", "df")])

    def dup_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("df"),
                                             pa.scalar(2)))

    return (dfs.map_batches(dup_only, batch_format="pyarrow")
            .sort(["df", "shingle"], descending=[True, False])
            .limit(k))


def brand_size_price_inversions(sf_dir: str) -> ray.data.Dataset:
    """Pricing-lattice monotonicity audit: within each brand, order the
    sizes by their CHEAPEST retail price (cents) and count adjacent
    size pairs where the larger size is the cheaper one — catalog
    entries that violate 'bigger costs more'.  The (brand, size) min
    folds through one exchange; adjacent comparison runs vectorized
    inside coarse brand buckets."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_brand", "p_size",
                                     "p_retailprice"])

    def bs_min(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("p_retailprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"brand": batch.column("p_brand"),
                      "size": pc.cast(batch.column("p_size"),
                                      pa.int64()),
                      "min_cents": pa.array(cents)})
        res = t.group_by(["brand", "size"]).aggregate(
            [("min_cents", "min")])
        return pa.table({"brand": res.column("brand"),
                         "size": res.column("size"),
                         "min_cents": res.column("min_cents_min")})

    agg = partial_aggregate(ds.map_batches(bs_min,
                                           batch_format="pyarrow"),
                            ["brand", "size"],
                            [("min_cents", "min", "min_cents")])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__bb", bucket_ids(batch, ["brand"]))

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.take(pc.sort_indices(
            group, sort_keys=[("brand", "ascending"),
                              ("size", "ascending")]))
        b = np.asarray(t.column("brand").to_pylist(), dtype=object)
        m = t.column("min_cents").to_numpy(zero_copy_only=False)
        if len(b) < 2:
            return pa.table({"brand": pa.array([], pa.string()),
                             "n_pairs": pa.array([], pa.int64()),
                             "n_inversions": pa.array([], pa.int64())})
        same = b[1:] == b[:-1]
        inv = same & (m[1:] < m[:-1])
        tt = pa.table({"brand": pa.array(list(b[1:][same]), pa.string()),
                       "n_pairs": pa.array(np.ones(int(same.sum()),
                                                   np.int64)),
                       "n_inversions": pa.array(
                           inv[same].astype(np.int64))})
        res = tt.group_by(["brand"]).aggregate(
            [("n_pairs", "sum"), ("n_inversions", "sum")])
        return pa.table({"brand": res.column("brand"),
                         "n_pairs": res.column("n_pairs_sum"),
                         "n_inversions":
                             res.column("n_inversions_sum")})

    per = (agg.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("__bb").map_groups(per_bucket,
                                       batch_format="pyarrow"))
    return partial_aggregate(per, ["brand"],
                             [("n_pairs", "sum", "n_pairs"),
                              ("n_inversions", "sum", "n_inversions")]) \
        .sort("brand")


def region_parttype_lift(sf_dir: str) -> ray.data.Dataset:
    """Product-mix geography: revenue lift (ppm, exact floor div) of
    each (customer region, part type) cell against independence — does
    a region over-index on a product family?  Two fact-side hash joins
    resolve customer and part attributes; nation→region broadcasts;
    margins fold driver-side from the bounded (regions × types) cell
    table."""
    from ..functions.joins import hash_join
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"])
    rname = dict(zip(region.column("r_regionkey").to_pylist(),
                     region.column("r_name").to_pylist()))
    nat2reg_ref = ray.put({int(k): rname[int(r)] for k, r in
                           zip(nation.column("n_nationkey").to_pylist(),
                               nation.column("n_regionkey")
                               .to_pylist())})

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey",
                                     "l_extendedprice"])
    part = read_parquet_clean(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_type"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])
    oc = hash_join(orders, cust, on="o_custkey", right_on="c_custkey")
    lp = hash_join(li, part, on="l_partkey", right_on="p_partkey")
    joined = hash_join(lp, oc, on="l_orderkey", right_on="o_orderkey")

    def cell(batch: pa.Table) -> pa.Table:
        n2r = ray.get(nat2reg_ref)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        reg = [n2r[int(n)] for n in
               batch.column("c_nationkey").to_pylist()]
        t = pa.table({"cust_region": pa.array(reg, pa.string()),
                      "p_type": batch.column("p_type"),
                      "cents": pa.array(cents)})
        res = t.group_by(["cust_region", "p_type"]) \
            .aggregate([("cents", "sum")])
        return pa.table({"cust_region": res.column("cust_region"),
                         "p_type": res.column("p_type"),
                         "cents": res.column("cents_sum")})

    cells = pa.concat_tables(list(
        partial_aggregate(joined.map_batches(cell,
                                             batch_format="pyarrow"),
                          ["cust_region", "p_type"],
                          [("cents", "sum", "cents")])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    reg = np.asarray(cells.column("cust_region").to_pylist(),
                     dtype=object)
    typ = np.asarray(cells.column("p_type").to_pylist(), dtype=object)
    c = cells.column("cents").to_numpy(zero_copy_only=False)
    total = int(c.sum())
    by_reg: dict = {}
    by_typ: dict = {}
    for r, t_, v in zip(reg, typ, c):
        by_reg[r] = by_reg.get(r, 0) + int(v)
        by_typ[t_] = by_typ.get(t_, 0) + int(v)
    lift = np.array([(1_000_000 * int(v) * total)
                     // (by_reg[r] * by_typ[t_])
                     for r, t_, v in zip(reg, typ, c)], np.int64)
    order = np.lexsort((typ.astype(str), reg.astype(str)))
    return ray.data.from_arrow(pa.table({
        "cust_region": pa.array(list(reg[order]), pa.string()),
        "p_type": pa.array(list(typ[order]), pa.string()),
        "revenue_cents": pa.array(c[order]),
        "lift_ppm": pa.array(lift[order])}))


def segment_basket_size_matrix(sf_dir: str, cap: int = 8
                               ) -> ray.data.Dataset:
    """Basket-size mix by market segment: order counts per
    (mktsegment, line-count bucket capped at ``cap``) — do segments
    shop differently?  The lineitem scan ships ONLY its key column
    into the orders⋈customer join; (order, segment) line counts fold
    through one exchange and the per-order count buckets fold through
    a second — join first, aggregate after, so no aggregate output
    ever re-enters a join."""
    from ..functions.joins import hash_join
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])
    oseg = hash_join(orders, cust, on="o_custkey", right_on="c_custkey")
    joined = hash_join(li, oseg, on="l_orderkey", right_on="o_orderkey")

    def per_order(batch: pa.Table) -> pa.Table:
        t = pa.table({"okey": pc.cast(batch.column("l_orderkey"),
                                      pa.int64()),
                      "c_mktsegment": batch.column("c_mktsegment"),
                      "n_lines": pa.array(np.ones(len(batch),
                                                  np.int64))})
        res = t.group_by(["okey", "c_mktsegment"]) \
            .aggregate([("n_lines", "sum")])
        return pa.table({"okey": res.column("okey"),
                         "c_mktsegment": res.column("c_mktsegment"),
                         "n_lines": res.column("n_lines_sum")})

    lines = partial_aggregate(joined.map_batches(per_order,
                                                 batch_format="pyarrow"),
                              ["okey", "c_mktsegment"],
                              [("n_lines", "sum", "n_lines")])

    def cells(batch: pa.Table) -> pa.Table:
        n = np.minimum(batch.column("n_lines")
                       .to_numpy(zero_copy_only=False), cap)
        t = pa.table({"c_mktsegment": batch.column("c_mktsegment"),
                      "lines_bucket": pa.array(n.astype(np.int64)),
                      "n_orders": pa.array(np.ones(len(batch),
                                                   np.int64))})
        res = t.group_by(["c_mktsegment", "lines_bucket"]) \
            .aggregate([("n_orders", "sum")])
        return pa.table({"c_mktsegment": res.column("c_mktsegment"),
                         "lines_bucket": res.column("lines_bucket"),
                         "n_orders": res.column("n_orders_sum")})

    return partial_aggregate(
        lines.map_batches(cells, batch_format="pyarrow"),
        ["c_mktsegment", "lines_bucket"],
        [("n_orders", "sum", "n_orders")]) \
        .sort(["c_mktsegment", "lines_bucket"])


def session_size_duration_cov(sf_dir: str, gap_seconds: int = 1800
                              ) -> pa.Table:
    """Does a longer session mean more events?  The exact integer
    covariance NUMERATOR n·Σxy − Σx·Σy between per-session event count
    and duration (µs), over gap-based sessions — a sessionizer and a
    two-variable moment fold composed in one pipeline.  Sessions split
    inside coarse user buckets (one sort per bucket); only four moment
    partials per bucket cross the final exchange; the numerator ships
    as a decimal string (it exceeds int64 at fleet scale)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__ub",
                                   bucket_ids(batch, ["user_id"]))

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.take(pc.sort_indices(
            group, sort_keys=[("user_id", "ascending"),
                              ("ts", "ascending")]))
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        if len(u) == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("n_sessions", "sx", "sy", "sxy")})
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap = np.r_[np.int64(0), ts[1:] - ts[:-1]]
        new_sess = new_user | (gap > gap_seconds * 1_000_000)
        sid = np.cumsum(new_sess) - 1
        n_sess = int(sid[-1]) + 1
        counts = np.bincount(sid, minlength=n_sess)
        starts = np.r_[0, np.cumsum(counts)[:-1]]
        ends = np.cumsum(counts) - 1
        dur = ts[ends] - ts[starts]
        x = counts.astype(np.int64)
        return pa.table({
            "n_sessions": pa.array([n_sess], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(dur.sum())], pa.int64()),
            "sxy": pa.array([int((x * dur).sum())], pa.int64())})

    parts = pa.concat_tables(list(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__ub").map_groups(per_bucket, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    n = int(pc.sum(parts.column("n_sessions")).as_py() or 0)
    sx = int(pc.sum(parts.column("sx")).as_py() or 0)
    sy = int(pc.sum(parts.column("sy")).as_py() or 0)
    sxy = sum(int(v) for v in parts.column("sxy").to_pylist())
    return pa.table({
        "n_sessions": pa.array([n], pa.int64()),
        "sum_events": pa.array([sx], pa.int64()),
        "sum_duration_us": pa.array([sy], pa.int64()),
        "cov_num": pa.array([str(n * sxy - sx * sy)], pa.string())})


def doc_max_token_run_topk(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Degenerate-repetition screen: the documents with the LONGEST
    run of one token repeated back-to-back (top-k by run length, then
    doc id) — the stuck-generator / copy-paste artifact detector.
    Runs resolve vectorized per batch (one boundary diff over the
    flattened token stream, doc boundaries masked); only (doc, max
    run) pairs reach the top-k sort."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def per_doc(batch: pa.Table) -> pa.Table:
        id_type = batch.column("doc_id").type
        ids, runs = [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            toks = np.asarray(text.split(" "), dtype=object)
            if len(toks) == 0:
                continue
            change = np.flatnonzero(toks[1:] != toks[:-1])
            bounds = np.r_[-1, change, len(toks) - 1]
            ids.append(did)
            runs.append(int(np.diff(bounds).max()))
        return pa.table({"doc_id": pa.array(ids, id_type),
                         "max_run": pa.array(runs, pa.int64())})

    return (ds.map_batches(per_doc, batch_format="pyarrow")
            .sort(["max_run", "doc_id"], descending=[True, False])
            .limit(k))


def doc_pack_plan_by_bucket(sf_dir: str, capacity: int = 4096,
                            n_buckets: int = 16) -> ray.data.Dataset:
    """Output-file packing plan: docs hash to ``doc_id %% n_buckets``
    writer buckets; within a bucket a greedy sequential fill (doc-id
    order, close the file when the next doc would overflow
    ``capacity`` tokens) yields the file count and total tokens per
    bucket — the write-side sizing pass a resumable Parquet sink runs
    before committing a layout.  The greedy scan is inherently
    sequential PER BUCKET, so it parallelizes across buckets and
    touches only (doc, token-count) pairs, never text."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])

    def counts(batch: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(
            pc.split_pattern(batch.column("text"), " "))
        did = pc.cast(batch.column("doc_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(did % n_buckets, pa.int64()),
            "doc_id": pa.array(did),
            "n_tokens": pc.cast(n_tok, pa.int64())})

    def pack(group: pa.Table) -> pa.Table:
        t = group.sort_by([("doc_id", "ascending")])
        toks = t.column("n_tokens").to_numpy(zero_copy_only=False)
        bucket = int(t.column("bucket")[0].as_py()) if len(t) else -1
        n_files, fill = 0, 0
        for x in toks:
            x = int(x)
            if n_files == 0 or fill + x > capacity:
                n_files += 1
                fill = 0
            fill += x
        return pa.table({
            "bucket": pa.array([bucket], pa.int64()),
            "n_docs": pa.array([len(t)], pa.int64()),
            "n_files": pa.array([n_files], pa.int64()),
            "total_tokens": pa.array([int(toks.sum()) if len(t) else 0],
                                     pa.int64())})

    return (ds.map_batches(counts, batch_format="pyarrow")
            .groupby("bucket").map_groups(pack, batch_format="pyarrow")
            .sort("bucket"))


def q6_grid_sweep(sf_dir: str) -> ray.data.Dataset:
    """Multi-query fusion: TPC-H Q6's filter-aggregate evaluated for a
    3×3 grid of (max discount band, max quantity) parameters in ONE
    scan — nine boolean masks per batch instead of nine passes, the
    way a parameter sweep should run at 100 TB.  Revenue is the exact
    integer cents·discount-percent product (denominator 10⁴)."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_discount",
                                     "l_extendedprice"])
    disc_bands = (3, 5, 7)      # discount percent centers ±1
    qty_caps = (24, 35, 50)

    def cells(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        disc = np.rint(batch.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        qty = np.rint(batch.column("l_quantity")
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        rev = cents * disc
        ds_, qs_, ns, rs = [], [], [], []
        for d in disc_bands:
            dm = (disc >= d - 1) & (disc <= d + 1)
            for q in qty_caps:
                m = dm & (qty < q)
                ds_.append(d)
                qs_.append(q)
                ns.append(int(m.sum()))
                rs.append(int(rev[m].sum()))
        return pa.table({"disc_pct": pa.array(ds_, pa.int64()),
                         "qty_cap": pa.array(qs_, pa.int64()),
                         "n_lines": pa.array(ns, pa.int64()),
                         "revenue_e4": pa.array(rs, pa.int64())})

    return partial_aggregate(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["disc_pct", "qty_cap"],
        [("n_lines", "sum", "n_lines"),
         ("revenue_e4", "sum", "revenue_e4")]) \
        .sort(["disc_pct", "qty_cap"])


def orderkey_date_sortedness(sf_dir: str,
                             bucket_shift: int = 12) -> ray.data.Dataset:
    """Physical-layout audit: if orders were laid out in key order,
    how often would the date column go BACKWARDS between adjacent
    keys?  Adjacency is evaluated within okey >> 12 range buckets
    (cross-bucket seams excluded, deterministically), so each bucket
    sorts independently — the zone-map/clustering health metric for a
    date-pruned scan."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_orderdate"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        okey = pc.cast(batch.column("o_orderkey"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "rb": pa.array(okey >> bucket_shift, pa.int64()),
            "okey": pa.array(okey),
            "odate": batch.column("o_orderdate")})

    def per_bucket(group: pa.Table) -> pa.Table:
        t = group.sort_by([("okey", "ascending")])
        d = t.column("odate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]")
        n_pairs = max(len(d) - 1, 0)
        inv = int((d[1:] < d[:-1]).sum()) if len(d) > 1 else 0
        return pa.table({"n_pairs": pa.array([n_pairs], pa.int64()),
                         "n_inversions": pa.array([inv], pa.int64())})

    parts = pa.concat_tables(list(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("rb").map_groups(per_bucket, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    n_pairs = int(pc.sum(parts.column("n_pairs")).as_py() or 0)
    inv = int(pc.sum(parts.column("n_inversions")).as_py() or 0)
    return ray.data.from_arrow(pa.table({
        "n_pairs": pa.array([n_pairs], pa.int64()),
        "n_inversions": pa.array([inv], pa.int64()),
        "inversion_ppm": pa.array(
            [1_000_000 * inv // max(n_pairs, 1)], pa.int64())}))


def props_k_quartiles_by_type(sf_dir: str) -> ray.data.Dataset:
    """Grouped exact quartiles of the JSON ``props.k`` field per event
    type (quantile_disc rank semantics) — semi-structured extraction
    composed with grouped selection.  k is small-domain, so (type, k)
    counts fold through one tiny exchange and the quartile ranks read
    off the cumulative counts; no sort of raw rows anywhere."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "props"])

    def counts(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"),
                             r'"k":\s*(?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        keep = pc.is_valid(k)
        t = pa.table({"event_type":
                          batch.column("event_type").filter(keep),
                      "k": k.filter(keep),
                      "n": pa.array(np.ones(int(pc.sum(
                          pc.cast(keep, pa.int64())).as_py() or 0),
                          np.int64))})
        res = t.group_by(["event_type", "k"]).aggregate([("n", "sum")])
        return pa.table({"event_type": res.column("event_type"),
                         "k": res.column("k"), "n": res.column("n_sum")})

    cells = pa.concat_tables(list(
        partial_aggregate(ds.map_batches(counts, batch_format="pyarrow"),
                          ["event_type", "k"], [("n", "sum", "n")])
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    import math
    by_type: dict = {}
    for ty, k, n in zip(cells.column("event_type").to_pylist(),
                        cells.column("k").to_pylist(),
                        cells.column("n").to_pylist()):
        by_type.setdefault(ty, []).append((int(k), int(n)))
    rows = {"event_type": [], "k_p25": [], "k_p50": [], "k_p75": []}
    for ty in sorted(by_type):
        kn = sorted(by_type[ty])
        total = sum(n for _, n in kn)
        qs = []
        for q in (0.25, 0.5, 0.75):
            rank = max(1, math.ceil(q * total))
            cum = 0
            for k, n in kn:
                cum += n
                if cum >= rank:
                    qs.append(k)
                    break
        rows["event_type"].append(ty)
        rows["k_p25"].append(qs[0])
        rows["k_p50"].append(qs[1])
        rows["k_p75"].append(qs[2])
    return ray.data.from_arrow(pa.table({
        "event_type": pa.array(rows["event_type"], pa.string()),
        "k_p25": pa.array(rows["k_p25"], pa.int64()),
        "k_p50": pa.array(rows["k_p50"], pa.int64()),
        "k_p75": pa.array(rows["k_p75"], pa.int64())}))


def users_active_all_weeks(sf_dir: str) -> ray.data.Dataset:
    """Full-coverage cohort: the count of users active in EVERY ISO
    week the stream spans — the relational-division shape (x/∀).
    Distinct (user, week) pairs dedupe through one exchange; per-user
    week counts fold through a second; the global week count is a tiny
    broadcast comparison, never a join."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id"])

    def pairs(batch: pa.Table) -> pa.Table:
        wk = pc.floor_temporal(batch.column("ts"), unit="week")
        t = pa.table({"user_id": pc.cast(batch.column("user_id"),
                                         pa.int64()),
                      "week": wk,
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["user_id", "week"]).aggregate([("n", "max")])
        return pa.table({"user_id": res.column("user_id"),
                         "week": res.column("week"),
                         "n": res.column("n_max")})

    dedup = partial_aggregate(ds.map_batches(pairs,
                                             batch_format="pyarrow"),
                              ["user_id", "week"], [("n", "max", "n")])

    def week_set(batch: pa.Table) -> pa.Table:
        t = pa.table({"week": batch.column("week"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["week"]).aggregate([("n", "max")])
        return pa.table({"week": res.column("week"),
                         "n": res.column("n_max")})

    n_weeks = partial_aggregate(
        dedup.map_batches(week_set, batch_format="pyarrow"),
        ["week"], [("n", "max", "n")]).count()

    def per_user(batch: pa.Table) -> pa.Table:
        t = pa.table({"user_id": batch.column("user_id"),
                      "n_weeks": pa.array(np.ones(len(batch),
                                                  np.int64))})
        res = t.group_by(["user_id"]).aggregate([("n_weeks", "sum")])
        return pa.table({"user_id": res.column("user_id"),
                         "n_weeks": res.column("n_weeks_sum")})

    users = partial_aggregate(dedup.map_batches(per_user,
                                                batch_format="pyarrow"),
                              ["user_id"], [("n_weeks", "sum",
                                             "n_weeks")])

    def full_cover(batch: pa.Table) -> pa.Table:
        full = pc.equal(batch.column("n_weeks"), pa.scalar(n_weeks))
        return pa.table({
            "n_users_total": pa.array([len(batch)], pa.int64()),
            "n_users_full": pa.array(
                [int(pc.sum(pc.cast(full, pa.int64())).as_py() or 0)],
                pa.int64())})

    parts = pa.concat_tables(list(
        users.map_batches(full_cover, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    return ray.data.from_arrow(pa.table({
        "n_weeks": pa.array([n_weeks], pa.int64()),
        "n_users_total": pa.array(
            [int(pc.sum(parts.column("n_users_total")).as_py() or 0)],
            pa.int64()),
        "n_users_full": pa.array(
            [int(pc.sum(parts.column("n_users_full")).as_py() or 0)],
            pa.int64())}))


def daily_whale_share_hist(sf_dir: str) -> ray.data.Dataset:
    """Daily whale dependence: per calendar day the share (ppm) of
    revenue carried by the single largest order, histogrammed by
    decile — how often one buyer IS the day.  Per-day max and sum are
    both distributive, so one bounded day-table exchange feeds the
    decile fold."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def per_day(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("o_orderdate"), unit="day")
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"day": day, "mx": pa.array(cents),
                      "total": pa.array(cents)})
        res = t.group_by(["day"]).aggregate([("mx", "max"),
                                             ("total", "sum")])
        return pa.table({"day": res.column("day"),
                         "mx": res.column("mx_max"),
                         "total": res.column("total_sum")})

    days = partial_aggregate(ds.map_batches(per_day,
                                            batch_format="pyarrow"),
                             ["day"], [("mx", "max", "mx"),
                                       ("total", "sum", "total")])

    def hist(batch: pa.Table) -> pa.Table:
        mx = batch.column("mx").to_numpy(zero_copy_only=False)
        tot = batch.column("total").to_numpy(zero_copy_only=False)
        dec = (1_000_000 * mx // np.maximum(tot, 1)) // 100_000
        t = pa.table({"share_decile": pa.array(dec.astype(np.int64)),
                      "n_days": pa.array(np.ones(len(batch),
                                                 np.int64))})
        res = t.group_by(["share_decile"]).aggregate([("n_days", "sum")])
        return pa.table({"share_decile": res.column("share_decile"),
                         "n_days": res.column("n_days_sum")})

    return partial_aggregate(
        days.map_batches(hist, batch_format="pyarrow"),
        ["share_decile"], [("n_days", "sum", "n_days")]) \
        .sort("share_decile")


def single_supplier_order_ppm(sf_dir: str) -> ray.data.Dataset:
    """Fulfillment-consolidation audit: among multi-line orders, the
    share (ppm) sourced ENTIRELY from one supplier.  Per-order
    distinct-supplier counts fold as (min, max, count) distributive
    stats through one order-key exchange — min==max detects the single
    supplier without ever materializing the supplier set."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_suppkey"])

    def per_order(batch: pa.Table) -> pa.Table:
        t = pa.table({"okey": pc.cast(batch.column("l_orderkey"),
                                      pa.int64()),
                      "smin": pc.cast(batch.column("l_suppkey"),
                                      pa.int64()),
                      "smax": pc.cast(batch.column("l_suppkey"),
                                      pa.int64()),
                      "n_lines": pa.array(np.ones(len(batch),
                                                  np.int64))})
        res = t.group_by(["okey"]).aggregate(
            [("smin", "min"), ("smax", "max"), ("n_lines", "sum")])
        return pa.table({"okey": res.column("okey"),
                         "smin": res.column("smin_min"),
                         "smax": res.column("smax_max"),
                         "n_lines": res.column("n_lines_sum")})

    per = partial_aggregate(
        ds.map_batches(per_order, batch_format="pyarrow"),
        ["okey"], [("smin", "min", "smin"), ("smax", "max", "smax"),
                   ("n_lines", "sum", "n_lines")])

    def fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n_lines").to_numpy(zero_copy_only=False)
        single = (batch.column("smin").to_numpy(zero_copy_only=False)
                  == batch.column("smax")
                  .to_numpy(zero_copy_only=False))
        multi = n >= 2
        return pa.table({
            "n_multi": pa.array([int(multi.sum())], pa.int64()),
            "n_single_supplier": pa.array(
                [int((multi & single).sum())], pa.int64())})

    parts = pa.concat_tables(list(
        per.map_batches(fold, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    n_multi = int(pc.sum(parts.column("n_multi")).as_py() or 0)
    n_single = int(pc.sum(parts.column("n_single_supplier")).as_py()
                   or 0)
    return ray.data.from_arrow(pa.table({
        "n_multi": pa.array([n_multi], pa.int64()),
        "n_single_supplier": pa.array([n_single], pa.int64()),
        "single_ppm": pa.array([1_000_000 * n_single
                                // max(n_multi, 1)], pa.int64())}))


def customer_tenure_years_hist(sf_dir: str) -> ray.data.Dataset:
    """Relationship-length mix: per customer the span in whole years
    between first and last order, histogrammed — the book-of-business
    age profile.  First/last are distributive min/max through one
    customer-key exchange; the year arithmetic and histogram fold the
    bounded aggregate."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate"])

    def per_cust(batch: pa.Table) -> pa.Table:
        t = pa.table({"cust": pc.cast(batch.column("o_custkey"),
                                      pa.int64()),
                      "first": batch.column("o_orderdate"),
                      "last": batch.column("o_orderdate")})
        res = t.group_by(["cust"]).aggregate([("first", "min"),
                                              ("last", "max")])
        return pa.table({"cust": res.column("cust"),
                         "first": res.column("first_min"),
                         "last": res.column("last_max")})

    per = partial_aggregate(
        ds.map_batches(per_cust, batch_format="pyarrow"),
        ["cust"], [("first", "min", "first"), ("last", "max", "last")])

    def hist(batch: pa.Table) -> pa.Table:
        f = pc.year(batch.column("first")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        l = pc.year(batch.column("last")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = pa.table({"tenure_years": pa.array(l - f),
                      "n_customers": pa.array(np.ones(len(batch),
                                                      np.int64))})
        res = t.group_by(["tenure_years"]) \
            .aggregate([("n_customers", "sum")])
        return pa.table({"tenure_years": res.column("tenure_years"),
                         "n_customers": res.column("n_customers_sum")})

    return partial_aggregate(
        per.map_batches(hist, batch_format="pyarrow"),
        ["tenure_years"], [("n_customers", "sum", "n_customers")]) \
        .sort("tenure_years")


def lapsed_customers_sweep(sf_dir: str,
                           asof: str = "2001-08-01") -> ray.data.Dataset:
    """Churn-definition sweep: how many ordering customers count as
    lapsed at 30/90/180/365 days of silence before ``asof`` — four
    anti-join cardinalities from ONE pass, because only the per
    customer MAX order date (distributive) is needed, never a join.
    The threshold comparison fans the bounded aggregate into the four
    window rows."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate"])
    asof_us = np.datetime64(asof, "us").astype(np.int64)
    windows = (30, 90, 180, 365)

    def per_cust(batch: pa.Table) -> pa.Table:
        t = pa.table({"cust": pc.cast(batch.column("o_custkey"),
                                      pa.int64()),
                      "last": batch.column("o_orderdate")})
        res = t.group_by(["cust"]).aggregate([("last", "max")])
        return pa.table({"cust": res.column("cust"),
                         "last": res.column("last_max")})

    per = partial_aggregate(
        ds.map_batches(per_cust, batch_format="pyarrow"),
        ["cust"], [("last", "max", "last")])

    def fold(batch: pa.Table) -> pa.Table:
        last = batch.column("last").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        silent_days = (asof_us - last) // 86_400_000_000
        return pa.table({
            "window_days": pa.array(list(windows), pa.int64()),
            "n_total": pa.array([len(batch)] * len(windows),
                                pa.int64()),
            "n_lapsed": pa.array([int((silent_days > w).sum())
                                  for w in windows], pa.int64())})

    return partial_aggregate(
        per.map_batches(fold, batch_format="pyarrow"),
        ["window_days"], [("n_total", "sum", "n_total"),
                          ("n_lapsed", "sum", "n_lapsed")]) \
        .sort("window_days")


def part_name_token_set_dups(sf_dir: str) -> ray.data.Dataset:
    """Entity-resolution probe on the part catalog: names that collide
    as SORTED TOKEN SETS ('green steel small' == 'small green steel'),
    the word-order-insensitive duplicate class exact matching misses.
    The canonical key builds per batch (split → sort → rejoin);
    key counts fold through one exchange; only colliding keys
    survive."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_name"])

    def canon(batch: pa.Table) -> pa.Table:
        keys = [" ".join(sorted(set(nm.split(" "))))
                for nm in batch.column("p_name").to_pylist()]
        t = pa.table({"token_set_key": pa.array(keys, pa.string()),
                      "n_parts": pa.array(np.ones(len(keys),
                                                  np.int64))})
        res = t.group_by(["token_set_key"]) \
            .aggregate([("n_parts", "sum")])
        return pa.table({"token_set_key": res.column("token_set_key"),
                         "n_parts": res.column("n_parts_sum")})

    agg = partial_aggregate(ds.map_batches(canon,
                                           batch_format="pyarrow"),
                            ["token_set_key"],
                            [("n_parts", "sum", "n_parts")])

    def dups(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("n_parts"),
                                             pa.scalar(2)))

    return (agg.map_batches(dups, batch_format="pyarrow")
            .sort(["n_parts", "token_set_key"],
                  descending=[True, False]))


def coorder_edge_weight_hist(sf_dir: str) -> ray.data.Dataset:
    """Co-order graph weight profile: how many part pairs co-occur in
    exactly w orders, for each weight w — the edge-pruning threshold
    chart for any co-occurrence graph build.  Per-order pairs generate
    inside coarse order buckets (numpy triu per run, order width
    schema-bounded); pair weights fold through one exchange; the
    weight histogram through a tiny second."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = pa.table({"okey": pc.cast(batch.column("l_orderkey"),
                                      pa.int64()),
                      "part": pc.cast(batch.column("l_partkey"),
                                      pa.int64())})
        return t.append_column("__ob", bucket_ids(t, ["okey"]))

    def gen_pairs(group: pa.Table) -> pa.Table:
        t = group.sort_by([("okey", "ascending"), ("part", "ascending")])
        okey = t.column("okey").to_numpy(zero_copy_only=False)
        part = t.column("part").to_numpy(zero_copy_only=False)
        if len(okey) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        change = np.flatnonzero(okey[1:] != okey[:-1])
        starts = np.r_[0, change + 1]
        ends = np.r_[change + 1, len(okey)]
        aa, bb = [], []
        for s, e in zip(starts, ends):
            ids = np.unique(part[s:e])
            if len(ids) < 2:
                continue
            iu, ju = np.triu_indices(len(ids), 1)
            aa.append(ids[iu])
            bb.append(ids[ju])
        if not aa:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        tt = pa.table({"a": pa.array(np.concatenate(aa)),
                       "b": pa.array(np.concatenate(bb)),
                       "w": pa.array(np.ones(sum(len(x) for x in aa),
                                             np.int64))})
        res = tt.group_by(["a", "b"]).aggregate([("w", "sum")])
        return pa.table({"a": res.column("a"), "b": res.column("b"),
                         "w": res.column("w_sum")})

    edges = partial_aggregate(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__ob").map_groups(gen_pairs, batch_format="pyarrow"),
        ["a", "b"], [("w", "sum", "w")])

    def hist(batch: pa.Table) -> pa.Table:
        t = pa.table({"weight": batch.column("w"),
                      "n_edges": pa.array(np.ones(len(batch),
                                                  np.int64))})
        res = t.group_by(["weight"]).aggregate([("n_edges", "sum")])
        return pa.table({"weight": res.column("weight"),
                         "n_edges": res.column("n_edges_sum")})

    return partial_aggregate(
        edges.map_batches(hist, batch_format="pyarrow"),
        ["weight"], [("n_edges", "sum", "n_edges")]).sort("weight")


def order_ship_month_matrix(sf_dir: str) -> ray.data.Dataset:
    """Bitemporal migration matrix: order counts by (order month,
    FIRST-ship month) — where does each booking month's work actually
    land?  The per-order first ship date is a distributive min through
    the join exchange; the bounded month matrix folds after."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_shipdate"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate"])
    from ..functions.joins import hash_join
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey")

    def per_order(batch: pa.Table) -> pa.Table:
        om = pc.floor_temporal(batch.column("o_orderdate"),
                               unit="month")
        t = pa.table({"okey": pc.cast(batch.column("l_orderkey"),
                                      pa.int64()),
                      "order_month": om,
                      "first_ship": batch.column("l_shipdate")})
        res = t.group_by(["okey", "order_month"]) \
            .aggregate([("first_ship", "min")])
        return pa.table({"okey": res.column("okey"),
                         "order_month": res.column("order_month"),
                         "first_ship": res.column("first_ship_min")})

    per = partial_aggregate(
        joined.map_batches(per_order, batch_format="pyarrow"),
        ["okey", "order_month"], [("first_ship", "min", "first_ship")])

    def cells(batch: pa.Table) -> pa.Table:
        sm = pc.floor_temporal(batch.column("first_ship"), unit="month")
        t = pa.table({"order_month": batch.column("order_month"),
                      "ship_month": sm,
                      "n_orders": pa.array(np.ones(len(batch),
                                                   np.int64))})
        res = t.group_by(["order_month", "ship_month"]) \
            .aggregate([("n_orders", "sum")])
        return pa.table({"order_month": res.column("order_month"),
                         "ship_month": res.column("ship_month"),
                         "n_orders": res.column("n_orders_sum")})

    return partial_aggregate(
        per.map_batches(cells, batch_format="pyarrow"),
        ["order_month", "ship_month"],
        [("n_orders", "sum", "n_orders")]) \
        .sort(["order_month", "ship_month"])


def customer_quarter_density_hist(sf_dir: str) -> ray.data.Dataset:
    """Engagement-density mix: per customer the ppm ratio of quarters
    WITH an order to quarters SPANNED (first → last), histogrammed by
    decile — steady buyers versus sporadic ones.  Distinct
    (customer, quarter) pairs dedupe through one exchange; per
    customer active/span counts are distributive over it (count, min,
    max); the decile fold is tiny."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate"])

    def pairs(batch: pa.Table) -> pa.Table:
        y = pc.year(batch.column("o_orderdate")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        m = pc.month(batch.column("o_orderdate")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        q = y * 4 + (m - 1) // 3
        t = pa.table({"cust": pc.cast(batch.column("o_custkey"),
                                      pa.int64()),
                      "quarter": pa.array(q),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["cust", "quarter"]).aggregate([("n", "max")])
        return pa.table({"cust": res.column("cust"),
                         "quarter": res.column("quarter"),
                         "n": res.column("n_max")})

    dedup = partial_aggregate(ds.map_batches(pairs,
                                             batch_format="pyarrow"),
                              ["cust", "quarter"], [("n", "max", "n")])

    def per_cust(batch: pa.Table) -> pa.Table:
        t = pa.table({"cust": batch.column("cust"),
                      "active": pa.array(np.ones(len(batch),
                                                 np.int64)),
                      "qmin": batch.column("quarter"),
                      "qmax": batch.column("quarter")})
        res = t.group_by(["cust"]).aggregate(
            [("active", "sum"), ("qmin", "min"), ("qmax", "max")])
        return pa.table({"cust": res.column("cust"),
                         "active": res.column("active_sum"),
                         "qmin": res.column("qmin_min"),
                         "qmax": res.column("qmax_max")})

    per = partial_aggregate(
        dedup.map_batches(per_cust, batch_format="pyarrow"),
        ["cust"], [("active", "sum", "active"),
                   ("qmin", "min", "qmin"), ("qmax", "max", "qmax")])

    def hist(batch: pa.Table) -> pa.Table:
        a = batch.column("active").to_numpy(zero_copy_only=False)
        span = (batch.column("qmax").to_numpy(zero_copy_only=False)
                - batch.column("qmin").to_numpy(zero_copy_only=False)
                + 1)
        dec = (1_000_000 * a // span) // 100_000
        t = pa.table({"density_decile": pa.array(dec.astype(np.int64)),
                      "n_customers": pa.array(np.ones(len(batch),
                                                      np.int64))})
        res = t.group_by(["density_decile"]) \
            .aggregate([("n_customers", "sum")])
        return pa.table({"density_decile": res.column("density_decile"),
                         "n_customers": res.column("n_customers_sum")})

    return partial_aggregate(
        per.map_batches(hist, batch_format="pyarrow"),
        ["density_decile"], [("n_customers", "sum", "n_customers")]) \
        .sort("density_decile")


def parts_ordered_all_years(sf_dir: str) -> ray.data.Dataset:
    """Relational division on the product axis: parts shipped in EVERY
    year the table covers — the evergreen catalog, the complement of
    seasonal/retired SKUs.  Distinct (part, year) pairs dedupe through
    one exchange and materialize (parts x years, tiny vs lineitem);
    the year universe folds from that same materialized aggregate (no
    second corpus scan); per-part year counts fold through a second
    small exchange and parts matching |years| survive."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_shipdate"])

    def pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({"part": pc.cast(batch.column("l_partkey"),
                                      pa.int64()),
                      "y": pc.cast(pc.year(batch.column("l_shipdate")),
                                   pa.int64()),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["part", "y"]).aggregate([("n", "max")])
        return pa.table({"part": res.column("part"),
                         "y": res.column("y"),
                         "n": res.column("n_max")})

    dedup = partial_aggregate(ds.map_batches(pairs,
                                             batch_format="pyarrow"),
                              ["part", "y"], [("n", "max", "n")]) \
        .materialize()

    years = set()
    for b in dedup.select_columns(["y"]).iter_batches(
            batch_format="pyarrow"):
        years.update(b.column("y").to_pylist())
    ny = len(years)

    per_part = partial_aggregate(dedup, ["part"],
                                 [("n", "sum", "n_years")])

    def full(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.equal(batch.column("n_years"),
                                     pa.scalar(ny)))
        return pa.table({"p_partkey": keep.column("part")})

    return per_part.map_batches(full, batch_format="pyarrow") \
        .sort("p_partkey")


def purchase_nearest_view_gap_hist(sf_dir: str,
                                   bucket_s: int = 60
                                   ) -> ray.data.Dataset:
    """Bidirectional nearest-in-time join: for each distinct purchase
    instant per user, the |gap| to the CLOSEST view by the same user —
    either side, not just the preceding one — histogrammed by minute.
    Events shuffle once on a coarse user bucket; inside each group the
    per-user view array answers every purchase via one searchsorted
    (sorted-merge nearest, no pair blowup); minute counts fold
    through a tiny exchange."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_in(batch.column("event_type"),
                                  value_set=pa.array(["view",
                                                      "purchase"])))
        us = b.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        t = pa.table({"user": pc.cast(b.column("user_id"), pa.int64()),
                      "kind": b.column("event_type"),
                      "us": pa.array(us)})
        return t.append_column("__ub", bucket_ids(t, ["user"]))

    def nearest(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user", "ascending"), ("us", "ascending")])
        user = t.column("user").to_numpy(zero_copy_only=False)
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        empty = pa.table({"gap_minutes": pa.array([], pa.int64()),
                          "n_purchases": pa.array([], pa.int64())})
        if len(user) == 0:
            return empty
        change = np.flatnonzero(user[1:] != user[:-1])
        starts = np.r_[0, change + 1]
        ends = np.r_[change + 1, len(user)]
        gaps = []
        for s, e in zip(starts, ends):
            isview = kind[s:e] == "view"
            views = us[s:e][isview]
            purch = np.unique(us[s:e][~isview])
            if len(views) == 0 or len(purch) == 0:
                continue
            idx = np.searchsorted(views, purch)
            lo = views[np.maximum(idx - 1, 0)]
            hi = views[np.minimum(idx, len(views) - 1)]
            gaps.append(np.minimum(np.abs(purch - lo),
                                   np.abs(purch - hi)))
        if not gaps:
            return empty
        mins = np.concatenate(gaps) // (bucket_s * 1_000_000)
        t2 = pa.table({"gap_minutes": pa.array(mins.astype(np.int64)),
                       "n_purchases": pa.array(
                           np.ones(len(mins), np.int64))})
        res = t2.group_by(["gap_minutes"]) \
            .aggregate([("n_purchases", "sum")])
        return pa.table({"gap_minutes": res.column("gap_minutes"),
                         "n_purchases": res.column("n_purchases_sum")})

    grouped = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__ub").map_groups(nearest, batch_format="pyarrow")
    return partial_aggregate(grouped, ["gap_minutes"],
                             [("n_purchases", "sum", "n_purchases")]) \
        .sort("gap_minutes")


def part_price_runnerup_gap_hist(sf_dir: str,
                                 bucket_cents: int = 10_000
                                 ) -> ray.data.Dataset:
    """Second-price auction gap: per part with >= 2 supplier offers
    (offer = that supplier's cheapest extended price), the runner-up
    minus cheapest offer, histogrammed in $100 buckets — how
    contestable is each part's supply?  Per-(part, supplier) min
    folds through one exchange; the top-2 selection per part runs
    fully vectorized inside coarse part buckets (segment firsts on a
    sorted run, no per-part dispatch)."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_suppkey",
                                     "l_extendedprice"])

    def offers(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"part": pc.cast(batch.column("l_partkey"),
                                      pa.int64()),
                      "supp": pc.cast(batch.column("l_suppkey"),
                                      pa.int64()),
                      "cents": pa.array(cents)})
        res = t.group_by(["part", "supp"]).aggregate([("cents", "min")])
        return pa.table({"part": res.column("part"),
                         "supp": res.column("supp"),
                         "cents": res.column("cents_min")})

    per_offer = partial_aggregate(
        ds.map_batches(offers, batch_format="pyarrow"),
        ["part", "supp"], [("cents", "min", "cents")])

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__ob", bucket_ids(batch, ["part"]))

    def top2_gap(group: pa.Table) -> pa.Table:
        t = group.sort_by([("part", "ascending"),
                           ("cents", "ascending")])
        part = t.column("part").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        empty = pa.table({"gap_bucket": pa.array([], pa.int64()),
                          "n_parts": pa.array([], pa.int64())})
        if len(part) == 0:
            return empty
        change = np.flatnonzero(part[1:] != part[:-1])
        starts = np.r_[0, change + 1]
        lens = np.diff(np.r_[starts, len(part)])
        s2 = starts[lens >= 2]
        if len(s2) == 0:
            return empty
        gap = (cents[s2 + 1] - cents[s2]) // bucket_cents
        t2 = pa.table({"gap_bucket": pa.array(gap.astype(np.int64)),
                       "n_parts": pa.array(np.ones(len(gap),
                                                   np.int64))})
        res = t2.group_by(["gap_bucket"]).aggregate([("n_parts",
                                                      "sum")])
        return pa.table({"gap_bucket": res.column("gap_bucket"),
                         "n_parts": res.column("n_parts_sum")})

    grouped = per_offer.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__ob").map_groups(top2_gap, batch_format="pyarrow")
    return partial_aggregate(grouped, ["gap_bucket"],
                             [("n_parts", "sum", "n_parts")]) \
        .sort("gap_bucket")


def nation_acctbal_profile(sf_dir: str) -> pa.Table:
    """Two-sided balance-sheet profile per nation: customer-side and
    supplier-side account-balance sums (exact cents) and entity
    counts, for EVERY nation including one-sided ones — the
    receivables-vs-payables skew table.  Both fact sides fold to
    <= |nation| rows via partial aggregation; the driver merges the
    two bounded aggregates and decorates names from the tiny dim."""
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_nationkey", "c_acctbal"])
    supp = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                              columns=["s_nationkey", "s_acctbal"])

    def side(key: str, bal: str):
        def conv(batch: pa.Table) -> pa.Table:
            cents = np.rint(batch.column(bal)
                            .to_numpy(zero_copy_only=False) * 100) \
                .astype(np.int64)
            return pa.table({"nk": pc.cast(batch.column(key),
                                           pa.int64()),
                             "cents": pa.array(cents),
                             "one": pa.array(np.ones(len(batch),
                                                     np.int64))})
        return conv

    c_agg = partial_aggregate(
        cust.map_batches(side("c_nationkey", "c_acctbal"),
                         batch_format="pyarrow"),
        ["nk"], [("cents", "sum", "s"), ("one", "sum", "n")]).take_all()
    s_agg = partial_aggregate(
        supp.map_batches(side("s_nationkey", "s_acctbal"),
                         batch_format="pyarrow"),
        ["nk"], [("cents", "sum", "s"), ("one", "sum", "n")]).take_all()

    cmap = {r["nk"]: (r["s"], r["n"]) for r in c_agg}
    smap = {r["nk"]: (r["s"], r["n"]) for r in s_agg}
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    rows = sorted(zip(nation.column("n_name").to_pylist(),
                      nation.column("n_nationkey").to_pylist()))
    return pa.table({
        "n_name": pa.array([nm for nm, _ in rows]),
        "cust_sum_cents": pa.array(
            [cmap.get(nk, (0, 0))[0] for _, nk in rows], pa.int64()),
        "n_cust": pa.array(
            [cmap.get(nk, (0, 0))[1] for _, nk in rows], pa.int64()),
        "supp_sum_cents": pa.array(
            [smap.get(nk, (0, 0))[0] for _, nk in rows], pa.int64()),
        "n_supp": pa.array(
            [smap.get(nk, (0, 0))[1] for _, nk in rows], pa.int64()),
    })


def nearest_centroid_confusion(sf_dir: str) -> ray.data.Dataset:
    """Exact nearest-centroid classifier confusion matrix over the
    embedding labels — the separability scorecard for the cluster
    structure, with NO float comparisons anywhere: vectors quantize at
    e4, centroids at e8 via offset floor division, distances are pure
    int64 matmuls, so the argmin (tie → smaller label) is bit-stable.
    Two passes by construction (fit then score): per-(label, dim)
    sums fold through one exchange and the 10x64 centroid matrix
    broadcasts into the scoring scan; confusion cells fold through a
    tiny second exchange."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding", "label"])

    def moments(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column("embedding")
                     .to_numpy(zero_copy_only=False))
        q = np.rint(m.astype(np.float64) * 10_000).astype(np.int64)
        labels = batch.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        parts = []
        for lab in np.unique(labels):
            rows = q[labels == lab]
            d = q.shape[1]
            parts.append(pa.table({
                "label": pa.array(np.full(d, lab, np.int64)),
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "s": pa.array(rows.sum(axis=0)),
                "n": pa.array(np.full(d, len(rows), np.int64))}))
        return pa.concat_tables(parts)

    cs = partial_aggregate(ds.map_batches(moments,
                                          batch_format="pyarrow"),
                           ["label", "dim"],
                           [("s", "sum", "s"), ("n", "sum", "n")]) \
        .take_all()  # bounded: |labels| x 64 rows
    labs = sorted({r["label"] for r in cs})
    ndim = max(r["dim"] for r in cs) + 1
    cent = np.zeros((len(labs), ndim), np.int64)
    pos = {lab: i for i, lab in enumerate(labs)}
    for r in cs:
        # offset keeps the dividend positive so // floors identically
        # in Python and DuckDB (both truncate-on-positive)
        cent[pos[r["label"]], r["dim"]] = (
            (10_000 * int(r["s"]) + 10 ** 9 * int(r["n"]))
            // int(r["n"]) - 10 ** 9)
    lab_arr = np.asarray(labs, np.int64)
    cnorm = (cent.astype(object) * cent.astype(object)).sum(axis=1) \
        .astype(np.int64)

    def score(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column("embedding")
                     .to_numpy(zero_copy_only=False))
        a = (np.rint(m.astype(np.float64) * 10_000)
             .astype(np.int64)) * 10_000
        true = batch.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # ||a||^2 is constant per row: argmin needs only -2aC^T + ||C||^2
        dist = cnorm[None, :] - 2 * (a @ cent.T)
        pred = lab_arr[np.argmin(dist, axis=1)]
        t = pa.table({"true_label": pa.array(true),
                      "pred_label": pa.array(pred),
                      "n_vectors": pa.array(np.ones(len(true),
                                                    np.int64))})
        res = t.group_by(["true_label", "pred_label"]) \
            .aggregate([("n_vectors", "sum")])
        return pa.table({"true_label": res.column("true_label"),
                         "pred_label": res.column("pred_label"),
                         "n_vectors": res.column("n_vectors_sum")})

    return partial_aggregate(
        ds.map_batches(score, batch_format="pyarrow"),
        ["true_label", "pred_label"],
        [("n_vectors", "sum", "n_vectors")]) \
        .sort(["true_label", "pred_label"])


def customer_brand_loyalty_hist(sf_dir: str) -> ray.data.Dataset:
    """Brand-loyalty mix: per customer, the ppm share of their
    lineitems in their MODAL brand, histogrammed by decile — how
    concentrated is each buyer's brand wallet?  Lineitem joins orders
    through the hash exchange; brand resolves from a broadcast part
    dim; (customer, brand) counts fold once, the per-customer
    (total, max) fold is distributive, the decile fold tiny."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    from ..functions.joins import broadcast_lookup_join, hash_join
    joined = hash_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey")
    joined = broadcast_lookup_join(
        joined, dict(zip(part.column("p_partkey").to_pylist(),
                         part.column("p_brand").to_pylist())),
        "l_partkey", "brand")

    def cust_brand(batch: pa.Table) -> pa.Table:
        t = pa.table({"cust": pc.cast(batch.column("o_custkey"),
                                      pa.int64()),
                      "brand": batch.column("brand"),
                      "n": pa.array(np.ones(len(batch), np.int64))})
        res = t.group_by(["cust", "brand"]).aggregate([("n", "sum")])
        return pa.table({"cust": res.column("cust"),
                         "brand": res.column("brand"),
                         "n": res.column("n_sum")})

    cb = partial_aggregate(
        joined.map_batches(cust_brand, batch_format="pyarrow"),
        ["cust", "brand"], [("n", "sum", "n")])

    def per_cust(batch: pa.Table) -> pa.Table:
        t = pa.table({"cust": batch.column("cust"),
                      "total": batch.column("n"),
                      "mx": batch.column("n")})
        res = t.group_by(["cust"]).aggregate([("total", "sum"),
                                              ("mx", "max")])
        return pa.table({"cust": res.column("cust"),
                         "total": res.column("total_sum"),
                         "mx": res.column("mx_max")})

    per = partial_aggregate(
        cb.map_batches(per_cust, batch_format="pyarrow"),
        ["cust"], [("total", "sum", "total"), ("mx", "max", "mx")])

    def hist(batch: pa.Table) -> pa.Table:
        total = batch.column("total").to_numpy(zero_copy_only=False)
        mx = batch.column("mx").to_numpy(zero_copy_only=False)
        dec = (1_000_000 * mx // total) // 100_000
        t = pa.table({"loyalty_decile": pa.array(dec.astype(np.int64)),
                      "n_customers": pa.array(np.ones(len(batch),
                                                      np.int64))})
        res = t.group_by(["loyalty_decile"]) \
            .aggregate([("n_customers", "sum")])
        return pa.table({"loyalty_decile": res.column("loyalty_decile"),
                         "n_customers": res.column("n_customers_sum")})

    return partial_aggregate(
        per.map_batches(hist, batch_format="pyarrow"),
        ["loyalty_decile"], [("n_customers", "sum", "n_customers")]) \
        .sort("loyalty_decile")


def token_suffix_diversity(sf_dir: str, k: int = 20
                           ) -> ray.data.Dataset:
    """Morphology probe: group the vocabulary by 3-char suffix and
    rank suffixes by how many distinct token TYPES share them (with
    total occurrences alongside) — where a stemmer would fold hardest.
    Distinct (suffix, token) pairs with counts fold through one
    vocabulary-bounded exchange; per-suffix type/occurrence counts
    are distributive over it; top-k sorts the tiny result."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def pairs(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(batch.column("text"),
                                                " "))
        long_enough = pc.greater_equal(pc.utf8_length(flat),
                                       pa.scalar(3))
        toks = flat.filter(long_enough)
        suf = pc.utf8_slice_codeunits(toks, start=-3)
        t = pa.table({"suffix": suf, "tok": toks,
                      "occ": pa.array(np.ones(len(toks), np.int64))})
        res = t.group_by(["suffix", "tok"]).aggregate([("occ", "sum")])
        return pa.table({"suffix": res.column("suffix"),
                         "tok": res.column("tok"),
                         "occ": res.column("occ_sum")})

    st = partial_aggregate(ds.map_batches(pairs,
                                          batch_format="pyarrow"),
                           ["suffix", "tok"], [("occ", "sum", "occ")])

    def per_suffix(batch: pa.Table) -> pa.Table:
        t = pa.table({"suffix": batch.column("suffix"),
                      "n_types": pa.array(np.ones(len(batch),
                                                  np.int64)),
                      "n_occurrences": batch.column("occ")})
        res = t.group_by(["suffix"]).aggregate(
            [("n_types", "sum"), ("n_occurrences", "sum")])
        return pa.table({"suffix": res.column("suffix"),
                         "n_types": res.column("n_types_sum"),
                         "n_occurrences":
                             res.column("n_occurrences_sum")})

    agg = partial_aggregate(
        st.map_batches(per_suffix, batch_format="pyarrow"),
        ["suffix"], [("n_types", "sum", "n_types"),
                     ("n_occurrences", "sum", "n_occurrences")])
    return agg.sort(["n_types", "suffix"],
                    descending=[True, False]).limit(k)


def signbucket_label_purity(sf_dir: str, n_dims: int = 8
                            ) -> ray.data.Dataset:
    """Sign-LSH bucket purity: for every occupied 2^d sign bucket
    (same bit layout as embedding_signbucket_hist), total vectors,
    the largest single-label count, and the distinct-label count —
    do LSH partitions align with semantic labels?  All three
    per-bucket stats are distributive over one (bucket, label)
    exchange."""
    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding", "label"])
    weights = (1 << np.arange(n_dims)).astype(np.int64)

    def per_batch(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column("embedding")
                     .to_numpy(zero_copy_only=False))[:, :n_dims]
        bucket = ((m > 0).astype(np.int64) * weights).sum(axis=1)
        t = pa.table({"bucket": pa.array(bucket),
                      "label": pc.cast(batch.column("label"),
                                       pa.int64()),
                      "n": pa.array(np.ones(len(bucket), np.int64))})
        res = t.group_by(["bucket", "label"]).aggregate([("n", "sum")])
        return pa.table({"bucket": res.column("bucket"),
                         "label": res.column("label"),
                         "n": res.column("n_sum")})

    bl = partial_aggregate(ds.map_batches(per_batch,
                                          batch_format="pyarrow"),
                           ["bucket", "label"], [("n", "sum", "n")])

    def per_bucket(batch: pa.Table) -> pa.Table:
        t = pa.table({"bucket": batch.column("bucket"),
                      "n_vectors": batch.column("n"),
                      "max_label_n": batch.column("n"),
                      "n_labels": pa.array(np.ones(len(batch),
                                                   np.int64))})
        res = t.group_by(["bucket"]).aggregate(
            [("n_vectors", "sum"), ("max_label_n", "max"),
             ("n_labels", "sum")])
        return pa.table({"bucket": res.column("bucket"),
                         "n_vectors": res.column("n_vectors_sum"),
                         "max_label_n": res.column("max_label_n_max"),
                         "n_labels": res.column("n_labels_sum")})

    return partial_aggregate(
        bl.map_batches(per_bucket, batch_format="pyarrow"),
        ["bucket"], [("n_vectors", "sum", "n_vectors"),
                     ("max_label_n", "max", "max_label_n"),
                     ("n_labels", "sum", "n_labels")]).sort("bucket")


def quantity_mannwhitney_u2(sf_dir: str, flag_a: str = "R",
                            flag_b: str = "N") -> pa.Table:
    """Exact Mann-Whitney rank test between two returnflag populations
    on l_quantity, reported as the DOUBLED U statistic (2U = 2*wins +
    ties) so ties never leave integers — the nonparametric
    did-the-distribution-shift test next to the KS probe.  The
    quantity domain is small, so per-(flag, qty) histograms fold
    through one tiny exchange and the closed-form pair count runs on
    the driver with Python ints."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_quantity"])

    def hist(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_in(batch.column("l_returnflag"),
                                  value_set=pa.array([flag_a,
                                                      flag_b])))
        t = pa.table({"flag": b.column("l_returnflag"),
                      "qty": pc.cast(pc.round(b.column("l_quantity")),
                                     pa.int64()),
                      "n": pa.array(np.ones(len(b), np.int64))})
        res = t.group_by(["flag", "qty"]).aggregate([("n", "sum")])
        return pa.table({"flag": res.column("flag"),
                         "qty": res.column("qty"),
                         "n": res.column("n_sum")})

    rows = partial_aggregate(ds.map_batches(hist,
                                            batch_format="pyarrow"),
                             ["flag", "qty"],
                             [("n", "sum", "n")]).take_all()
    ha: dict[int, int] = {}
    hb: dict[int, int] = {}
    for r in rows:
        (ha if r["flag"] == flag_a else hb)[int(r["qty"])] = int(r["n"])
    vals = sorted(set(ha) | set(hb))
    u2 = 0
    cum_b = 0
    for v in vals:
        a_n, b_n = ha.get(v, 0), hb.get(v, 0)
        u2 += a_n * (2 * cum_b + b_n)   # 2*wins over smaller + ties
        cum_b += b_n
    return pa.table({"u2": pa.array([str(u2)], pa.string()),
                     "n_a": pa.array([sum(ha.values())], pa.int64()),
                     "n_b": pa.array([sum(hb.values())], pa.int64())})


def brand_discount_subsidy_ppm(sf_dir: str) -> pa.Table:
    """Promo-subsidy leaderboard: per brand the ppm of gross extended
    price given away as discount, with exact integer math throughout
    (cents x discount-percent products are integral because both
    factors carry two decimals).  Gross/subsidy sums fold per brand
    through one exchange; the driver divides <=|brand| Python bigints
    (the sums outrun int64 at fleet scale, so they travel as their
    own partials and the ppm is computed last)."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_extendedprice",
                                     "l_discount"])
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    from ..functions.joins import broadcast_lookup_join
    li = broadcast_lookup_join(
        li, dict(zip(part.column("p_partkey").to_pylist(),
                     part.column("p_brand").to_pylist())),
        "l_partkey", "brand")

    def sums(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        d100 = np.rint(batch.column("l_discount")
                       .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"brand": batch.column("brand"),
                      "gross": pa.array(cents),
                      "subsidy_e4": pa.array(cents * d100)})
        res = t.group_by(["brand"]).aggregate(
            [("gross", "sum"), ("subsidy_e4", "sum")])
        return pa.table({"brand": res.column("brand"),
                         "gross": res.column("gross_sum"),
                         "subsidy_e4": res.column("subsidy_e4_sum")})

    rows = partial_aggregate(li.map_batches(sums,
                                            batch_format="pyarrow"),
                             ["brand"],
                             [("gross", "sum", "gross"),
                              ("subsidy_e4", "sum", "subsidy_e4")]) \
        .take_all()  # bounded: |brand| rows
    rows.sort(key=lambda r: r["brand"])
    ppm = [1_000_000 * int(r["subsidy_e4"]) // (100 * int(r["gross"]))
           for r in rows]
    return pa.table({
        "p_brand": pa.array([r["brand"] for r in rows], pa.string()),
        "subsidy_ppm": pa.array(ppm, pa.int64())})


def event_arrival_lateness_hist(sf_dir: str,
                                n_chunks: int = 4096
                                ) -> ray.data.Dataset:
    """Watermark-lateness profile: treating event_id as arrival order,
    how far behind the running max timestamp does each event arrive,
    in minutes — the out-of-orderness histogram that sizes streaming
    watermarks.  A distributed prefix-max: a key-range stats pass
    fixes ~n_chunks contiguous id chunks, per-chunk max timestamps
    fold small and prefix-combine on the driver (bounded by
    n_chunks), and the scoring scan seeds each chunk's running max
    with its prefix — three streaming column scans, no
    materialization of the fact table."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts"])

    def id_stats(batch: pa.Table) -> pa.Table:
        return pa.table({"k": pa.array([0], pa.int64()),
                         "lo": pa.array(
                             [pc.min(batch.column("event_id")).as_py()],
                             pa.int64()),
                         "hi": pa.array(
                             [pc.max(batch.column("event_id")).as_py()],
                             pa.int64())})

    st = partial_aggregate(ds.map_batches(id_stats,
                                          batch_format="pyarrow"),
                           ["k"], [("lo", "min", "lo"),
                                   ("hi", "max", "hi")]).take_all()[0]
    lo, hi = int(st["lo"]), int(st["hi"])
    width = max(1, (hi - lo + n_chunks) // n_chunks)

    def chunk_max(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_numpy(zero_copy_only=False)
        us = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        chunk = (ids - lo) // width
        t = pa.table({"chunk": pa.array(chunk.astype(np.int64)),
                      "mx": pa.array(us)})
        res = t.group_by(["chunk"]).aggregate([("mx", "max")])
        return pa.table({"chunk": res.column("chunk"),
                         "mx": res.column("mx_max")})

    cm = partial_aggregate(ds.map_batches(chunk_max,
                                          batch_format="pyarrow"),
                           ["chunk"], [("mx", "max", "mx")]).take_all()
    cm.sort(key=lambda r: r["chunk"])
    prefix: dict[int, int] = {}
    run = None
    for r in cm:
        prefix[int(r["chunk"])] = run if run is not None \
            else -(1 << 62)
        run = max(run, int(r["mx"])) if run is not None \
            else int(r["mx"])
    pref_ref = ray.put(prefix)

    def add_chunk(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_numpy(zero_copy_only=False)
        us = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        chunk = ((ids - lo) // width).astype(np.int64)
        return pa.table({"chunk": pa.array(chunk),
                         "id": pa.array(ids.astype(np.int64)),
                         "us": pa.array(us)})

    def lateness(group: pa.Table) -> pa.Table:
        t = group.sort_by([("id", "ascending")])
        empty = pa.table({"lateness_minutes": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64())})
        if len(t) == 0:
            return empty
        us = t.column("us").to_numpy(zero_copy_only=False)
        seed = ray.get(pref_ref)[int(t.column("chunk")[0].as_py())]
        runmax = np.maximum.accumulate(us)
        prevmax = np.empty_like(runmax)
        prevmax[0] = seed
        prevmax[1:] = runmax[:-1]
        prevmax = np.maximum(prevmax, seed)
        late = np.maximum(prevmax - us, 0) // 60_000_000
        t2 = pa.table({"lateness_minutes": pa.array(
                           late.astype(np.int64)),
                       "n_events": pa.array(np.ones(len(late),
                                                    np.int64))})
        res = t2.group_by(["lateness_minutes"]) \
            .aggregate([("n_events", "sum")])
        return pa.table({"lateness_minutes":
                             res.column("lateness_minutes"),
                         "n_events": res.column("n_events_sum")})

    grouped = ds.map_batches(add_chunk, batch_format="pyarrow") \
        .groupby("chunk").map_groups(lateness, batch_format="pyarrow")
    return partial_aggregate(grouped, ["lateness_minutes"],
                             [("n_events", "sum", "n_events")]) \
        .sort("lateness_minutes")


def customer_acctbal_sign_by_segment(sf_dir: str) -> ray.data.Dataset:
    """Credit-risk mix: customer counts by (market segment, account
    balance sign) — how much of each segment is underwater?  One
    bounded (segment x {-1,0,1}) partial fold."""
    ds = read_parquet_clean(f"{sf_dir}/customer.parquet",
                            columns=["c_mktsegment", "c_acctbal"])

    def cells(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("c_acctbal")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"c_mktsegment": batch.column("c_mktsegment"),
                      "bal_sign": pa.array(np.sign(cents)),
                      "n_customers": pa.array(np.ones(len(batch),
                                                      np.int64))})
        res = t.group_by(["c_mktsegment", "bal_sign"]) \
            .aggregate([("n_customers", "sum")])
        return pa.table({"c_mktsegment": res.column("c_mktsegment"),
                         "bal_sign": res.column("bal_sign"),
                         "n_customers": res.column("n_customers_sum")})

    return partial_aggregate(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["c_mktsegment", "bal_sign"],
        [("n_customers", "sum", "n_customers")]) \
        .sort(["c_mktsegment", "bal_sign"])


def purchase_priorviews_cov(sf_dir: str) -> pa.Table:
    """Engagement-to-spend link: over all purchases, the exact
    covariance NUMERATOR n*Sxy - Sx*Sy between each purchase's count
    of strictly-earlier views by the same user and its value in cents
    (denominator n^2) — does browsing predict basket size?  Events
    shuffle once on a coarse user bucket; prior-view counts come from
    one searchsorted per user segment; four scalar partials fold and
    the driver emits the numerator as a decimal string (it outruns
    int64 at fleet scale)."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts",
                                     "value"])

    def prep(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_in(batch.column("event_type"),
                                  value_set=pa.array(["view",
                                                      "purchase"])))
        us = b.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cents = np.rint(b.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"user": pc.cast(b.column("user_id"), pa.int64()),
                      "kind": b.column("event_type"),
                      "us": pa.array(us), "cents": pa.array(cents)})
        return t.append_column("__ub", bucket_ids(t, ["user"]))

    def sums(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user", "ascending"), ("us", "ascending")])
        user = t.column("user").to_numpy(zero_copy_only=False)
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        cols = ["n", "sx", "sy", "sxy"]
        if len(user) == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        change = np.flatnonzero(user[1:] != user[:-1])
        starts = np.r_[0, change + 1]
        ends = np.r_[change + 1, len(user)]
        n = sx = sy = sxy = 0
        for s, e in zip(starts, ends):
            isview = kind[s:e] == "view"
            views = us[s:e][isview]
            p_us = us[s:e][~isview]
            p_cents = cents[s:e][~isview]
            if len(p_us) == 0:
                continue
            x = np.searchsorted(views, p_us, side="left")
            n += len(p_us)
            sx += int(x.sum())
            sy += int(p_cents.sum())
            sxy += int((x * p_cents).sum())
        return pa.table({"n": pa.array([n], pa.int64()),
                         "sx": pa.array([sx], pa.int64()),
                         "sy": pa.array([sy], pa.int64()),
                         "sxy": pa.array([sxy], pa.int64())})

    grouped = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__ub").map_groups(sums, batch_format="pyarrow")
    n = sx = sy = sxy = 0
    for b in grouped.iter_batches(batch_format="pyarrow"):
        n += int(pc.sum(b.column("n")).as_py() or 0)
        sx += int(pc.sum(b.column("sx")).as_py() or 0)
        sy += int(pc.sum(b.column("sy")).as_py() or 0)
        sxy += int(pc.sum(b.column("sxy")).as_py() or 0)
    return pa.table({"n_purchases": pa.array([n], pa.int64()),
                     "cov_num": pa.array([str(n * sxy - sx * sy)],
                                         pa.string())})


def brand_size_rollup(sf_dir: str) -> ray.data.Dataset:
    """Hierarchical ROLLUP over (brand) and (brand, size): part counts
    and retail cents at both grains in ONE pass — the multi-grain
    materialization a reporting layer pre-computes (CUBE's cheaper
    sibling; size -1 marks the brand subtotal rows).  Each batch
    emits partials for both grains; one exchange folds them all."""
    ds = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_brand", "p_size",
                                     "p_retailprice"])

    def grains(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("p_retailprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        base = pa.table({"p_brand": batch.column("p_brand"),
                         "p_size": pc.cast(batch.column("p_size"),
                                           pa.int64()),
                         "n_parts": pa.array(np.ones(len(batch),
                                                     np.int64)),
                         "retail_cents": pa.array(cents)})
        lvl2 = base.group_by(["p_brand", "p_size"]).aggregate(
            [("n_parts", "sum"), ("retail_cents", "sum")])
        lvl1 = base.group_by(["p_brand"]).aggregate(
            [("n_parts", "sum"), ("retail_cents", "sum")])
        out2 = pa.table({
            "lvl": pa.array(np.full(len(lvl2), 2, np.int64)),
            "p_brand": lvl2.column("p_brand"),
            "p_size": lvl2.column("p_size"),
            "n_parts": lvl2.column("n_parts_sum"),
            "retail_cents": lvl2.column("retail_cents_sum")})
        out1 = pa.table({
            "lvl": pa.array(np.full(len(lvl1), 1, np.int64)),
            "p_brand": lvl1.column("p_brand"),
            "p_size": pa.array(np.full(len(lvl1), -1, np.int64)),
            "n_parts": lvl1.column("n_parts_sum"),
            "retail_cents": lvl1.column("retail_cents_sum")})
        return pa.concat_tables([out1, out2])

    return partial_aggregate(
        ds.map_batches(grains, batch_format="pyarrow"),
        ["lvl", "p_brand", "p_size"],
        [("n_parts", "sum", "n_parts"),
         ("retail_cents", "sum", "retail_cents")]) \
        .sort(["lvl", "p_brand", "p_size"])


def error_recovery_minutes_hist(sf_dir: str) -> ray.data.Dataset:
    """Incident-recovery profile: for every distinct error instant per
    user, minutes until that user's next NON-error event (strictly
    later; unrecovered errors drop) — the user-visible outage-healing
    histogram.  One coarse user-bucket shuffle; per user segment a
    single searchsorted maps every error to its recovery event;
    minute counts fold tiny."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        t = pa.table({"user": pc.cast(batch.column("user_id"),
                                      pa.int64()),
                      "is_err": pc.equal(batch.column("event_type"),
                                         pa.scalar("error")),
                      "us": pa.array(us)})
        return t.append_column("__ub", bucket_ids(t, ["user"]))

    def recover(group: pa.Table) -> pa.Table:
        t = group.sort_by([("user", "ascending"), ("us", "ascending")])
        user = t.column("user").to_numpy(zero_copy_only=False)
        is_err = t.column("is_err").to_numpy(zero_copy_only=False)
        us = t.column("us").to_numpy(zero_copy_only=False)
        empty = pa.table({"recovery_minutes": pa.array([], pa.int64()),
                          "n_errors": pa.array([], pa.int64())})
        if len(user) == 0:
            return empty
        change = np.flatnonzero(user[1:] != user[:-1])
        starts = np.r_[0, change + 1]
        ends = np.r_[change + 1, len(user)]
        gaps = []
        for s, e in zip(starts, ends):
            errs = np.unique(us[s:e][is_err[s:e]])
            ok = us[s:e][~is_err[s:e]]
            if len(errs) == 0 or len(ok) == 0:
                continue
            idx = np.searchsorted(ok, errs, side="right")
            hit = idx < len(ok)
            if hit.any():
                gaps.append(ok[idx[hit]] - errs[hit])
        if not gaps:
            return empty
        mins = np.concatenate(gaps) // 60_000_000
        t2 = pa.table({"recovery_minutes": pa.array(
                           mins.astype(np.int64)),
                       "n_errors": pa.array(np.ones(len(mins),
                                                    np.int64))})
        res = t2.group_by(["recovery_minutes"]) \
            .aggregate([("n_errors", "sum")])
        return pa.table({"recovery_minutes":
                             res.column("recovery_minutes"),
                         "n_errors": res.column("n_errors_sum")})

    grouped = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__ub").map_groups(recover, batch_format="pyarrow")
    return partial_aggregate(grouped, ["recovery_minutes"],
                             [("n_errors", "sum", "n_errors")]) \
        .sort("recovery_minutes")


def linenumber_quantity_profile(sf_dir: str) -> ray.data.Dataset:
    """Order-position profile: per line position 1..7, line count,
    total quantity and total extended price cents — do earlier lines
    carry the bigger items?  A bounded 7-row partial fold."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_linenumber", "l_quantity",
                                     "l_extendedprice"])

    def cells(batch: pa.Table) -> pa.Table:
        qty = np.rint(batch.column("l_quantity")
                      .to_numpy(zero_copy_only=False)).astype(np.int64)
        cents = np.rint(batch.column("l_extendedprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"l_linenumber": pc.cast(
                          batch.column("l_linenumber"), pa.int64()),
                      "n_lines": pa.array(np.ones(len(batch),
                                                  np.int64)),
                      "qty_sum": pa.array(qty),
                      "price_cents": pa.array(cents)})
        res = t.group_by(["l_linenumber"]).aggregate(
            [("n_lines", "sum"), ("qty_sum", "sum"),
             ("price_cents", "sum")])
        return pa.table({"l_linenumber": res.column("l_linenumber"),
                         "n_lines": res.column("n_lines_sum"),
                         "qty_sum": res.column("qty_sum_sum"),
                         "price_cents": res.column("price_cents_sum")})

    return partial_aggregate(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["l_linenumber"],
        [("n_lines", "sum", "n_lines"), ("qty_sum", "sum", "qty_sum"),
         ("price_cents", "sum", "price_cents")]).sort("l_linenumber")


def fingerprint_density_hist(sf_dir: str, k: int = 3, w: int = 4,
                             mod: int = 97) -> ray.data.Dataset:
    """Winnowing-style fingerprint selection density: hash every
    k-token gram with a position-weighted codepoint checksum mod 97,
    keep a gram iff its hash is <= the minimum of the w-1 preceding
    hashes (rightmost-window-min sampling, the selection rule document
    fingerprinters like winnowing build on), and histogram docs by the
    per-doc selected-share decile.  Flat uniform selection clusters
    near 1/w; repetitive or skew-hash corpora drift — a cheap corpus
    fingerprintability probe.  Embarrassingly parallel per doc (one
    vectorized checksum + sliding-min per doc); only the <=11-row
    decile table folds."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])
    big = np.int64(1) << np.int64(62)

    def per_doc(batch: pa.Table) -> pa.Table:
        deciles = []
        for text in batch.column("text").to_pylist():
            toks = text.split(" ")
            if len(toks) < k:
                continue
            grams = [" ".join(toks[i:i + k])
                     for i in range(len(toks) - k + 1)]
            lens = np.fromiter((len(g) for g in grams), np.int64,
                               len(grams))
            cps = np.frombuffer("".join(grams).encode("utf-32-le"),
                                np.uint32).astype(np.int64)
            starts = np.r_[0, np.cumsum(lens)[:-1]]
            pos = np.arange(len(cps)) + 1 - np.repeat(starts, lens)
            h = np.add.reduceat(cps * pos, starts) % mod
            pm = np.full(len(h), big)
            for d in range(1, w):
                if d < len(h):
                    pm[d:] = np.minimum(pm[d:], h[:-d])
            n_sel = 1 + int(np.count_nonzero(h[1:] <= pm[1:]))
            deciles.append((1000 * n_sel // len(h)) // 100)
        t = pa.table({"density_decile": pa.array(
                          np.asarray(deciles, np.int64)),
                      "n_docs": pa.array(np.ones(len(deciles),
                                                 np.int64))})
        res = t.group_by(["density_decile"]).aggregate(
            [("n_docs", "sum")])
        return pa.table({"density_decile": res.column("density_decile"),
                         "n_docs": res.column("n_docs_sum")})

    return partial_aggregate(
        ds.map_batches(per_doc, batch_format="pyarrow"),
        ["density_decile"], [("n_docs", "sum", "n_docs")]) \
        .sort("density_decile")


def first_order_ltv_cov(sf_dir: str) -> pa.Table:
    """Acquisition-value link: exact covariance NUMERATOR
    n*Sxy - Sx*Sy (denominator n^2) between each customer's FIRST
    order value in cents (earliest o_orderdate, orderkey tie-break)
    and their lifetime spend in cents — does the first basket predict
    the relationship?  One coarse custkey-bucket exchange; per
    customer segment the first/sum come from one reduceat; the
    cross-moment folds as exact decimal strings because cents^2 sums
    outrun int64 at fleet scale."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderkey",
                                     "o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"cust": pc.cast(batch.column("o_custkey"),
                                      pa.int64()),
                      "okey": pc.cast(batch.column("o_orderkey"),
                                      pa.int64()),
                      "odate": pc.cast(batch.column("o_orderdate"),
                                       pa.int64()),
                      "cents": pa.array(cents)})
        return t.append_column("__ub", bucket_ids(t, ["cust"]))

    def sums(group: pa.Table) -> pa.Table:
        t = group.sort_by([("cust", "ascending"),
                           ("odate", "ascending"),
                           ("okey", "ascending")])
        cust = t.column("cust").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        if len(cust) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.int64()),
                             "sy": pa.array([], pa.int64()),
                             "sxy": pa.array([], pa.string())})
        change = np.flatnonzero(cust[1:] != cust[:-1])
        starts = np.r_[0, change + 1]
        x = cents[starts]
        y = np.add.reduceat(cents, starts)
        sxy = sum(int(a) * int(b) for a, b in zip(x.tolist(),
                                                  y.tolist()))
        return pa.table({"n": pa.array([len(starts)], pa.int64()),
                         "sx": pa.array([int(x.sum())], pa.int64()),
                         "sy": pa.array([int(y.sum())], pa.int64()),
                         "sxy": pa.array([str(sxy)], pa.string())})

    grouped = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__ub").map_groups(sums, batch_format="pyarrow")
    n = sx = sy = sxy = 0
    for b in grouped.iter_batches(batch_format="pyarrow"):
        n += int(pc.sum(b.column("n")).as_py() or 0)
        sx += int(pc.sum(b.column("sx")).as_py() or 0)
        sy += int(pc.sum(b.column("sy")).as_py() or 0)
        sxy += sum(int(s) for s in b.column("sxy").to_pylist())
    return pa.table({"n_customers": pa.array([n], pa.int64()),
                     "cov_num": pa.array([str(n * sxy - sx * sy)],
                                         pa.string())})


def user_spend_spread_hist(sf_dir: str) -> ray.data.Dataset:
    """Spend-volatility profile: per repeat purchaser (>=2 purchases,
    max purchase > 0), the relative spread (max-min)*1e6 // max in
    ppm, bucketed to deciles — how uniform are basket sizes per user?
    The per-user (min, max, count) fold is a distributive
    partial-aggregate; the decile histogram folds again, so no raw
    purchase row ever crosses an exchange."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("event_type"),
                                  pa.scalar("purchase")))
        cents = np.rint(b.column("value")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.table({"user": pc.cast(b.column("user_id"),
                                         pa.int64()),
                         "mn": pa.array(cents), "mx": pa.array(cents),
                         "n": pa.array(np.ones(len(b), np.int64))})

    per_user = partial_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"), ["user"],
        [("mn", "min", "mn"), ("mx", "max", "mx"),
         ("n", "sum", "n")])

    def decile(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(batch.column("n"),
                                        pa.scalar(2)),
                       pc.greater(batch.column("mx"), pa.scalar(0)))
        b = batch.filter(keep)
        mn = b.column("mn").to_numpy(zero_copy_only=False)
        mx = b.column("mx").to_numpy(zero_copy_only=False)
        dec = (mx - mn) * 1_000_000 // mx // 100_000
        return pa.table({"spread_decile": pa.array(dec),
                         "n_users": pa.array(np.ones(len(b),
                                                     np.int64))})

    return partial_aggregate(
        per_user.map_batches(decile, batch_format="pyarrow"),
        ["spread_decile"], [("n_users", "sum", "n_users")]) \
        .sort("spread_decile")


def doc_prefix_dup_hist(sf_dir: str, n: int = 8) -> ray.data.Dataset:
    """Template-intro detector: group documents by their first n=8
    tokens and histogram the sizes of groups with >=2 docs — shared
    openings that doc-level exact dedup misses and MinHash only
    scores.  The prefix extraction is pure Arrow kernels (split,
    list_slice, binary_join); prefix doc-counts fold through the
    coarse-bucket exchange and only the tiny >=2 tail folds again."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def pref(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        keep = pc.greater_equal(pc.list_value_length(toks),
                                pa.scalar(n))
        first = pc.list_slice(toks.filter(keep), 0, n)
        prefix = pc.binary_join(first, " ")
        t = pa.table({"prefix": prefix,
                      "n_docs": pa.array(np.ones(len(prefix),
                                                 np.int64))})
        res = t.group_by(["prefix"]).aggregate([("n_docs", "sum")])
        return pa.table({"prefix": res.column("prefix"),
                         "n_docs": res.column("n_docs_sum")})

    groups = partial_aggregate(
        ds.map_batches(pref, batch_format="pyarrow"), ["prefix"],
        [("n_docs", "sum", "n_docs")])

    def sizes(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater_equal(batch.column("n_docs"),
                                          pa.scalar(2)))
        return pa.table({"group_size": b.column("n_docs"),
                         "n_groups": pa.array(np.ones(len(b),
                                                      np.int64))})

    return partial_aggregate(
        groups.map_batches(sizes, batch_format="pyarrow"),
        ["group_size"], [("n_groups", "sum", "n_groups")]) \
        .sort("group_size")


def nation_acctbal_mad(sf_dir: str) -> pa.Table:
    """Dispersion audit without a mean: per nation, the exact
    ordered-pair sum of |acctbal_i - acctbal_j| cents over all
    customer pairs (the Gini numerator; denominator n^2 for the mean
    absolute difference) — robust to this column's negative balances
    where a Gini ratio is not.  Distinct (nation, cents) counts fold
    through one exchange, so the O(n^2) pairwise sum collapses to one
    sorted prefix-sum scan per nation; emitted as decimal strings
    because cents * n^2 outruns int64 at fleet scale."""
    ds = read_parquet_clean(f"{sf_dir}/customer.parquet",
                            columns=["c_nationkey", "c_acctbal"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("c_acctbal")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        return pa.table({"nk": pc.cast(batch.column("c_nationkey"),
                                       pa.int64()),
                         "cents": pa.array(cents),
                         "n": pa.array(np.ones(len(batch), np.int64))})

    counts = partial_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["nk", "cents"], [("n", "sum", "n")])

    def mad(group: pa.Table) -> pa.Table:
        t = group.sort_by([("cents", "ascending")])
        v = t.column("cents").to_numpy(zero_copy_only=False).tolist()
        c = t.column("n").to_numpy(zero_copy_only=False).tolist()
        total = acc = cum_n = cum_s = 0
        for vk, ck in zip(v, c):
            acc += ck * (vk * cum_n - cum_s)
            cum_n += ck
            cum_s += ck * vk
            total += ck
        nk = t.column("nk")[0].as_py()
        return pa.table({"nk": pa.array([nk], pa.int64()),
                         "n_customers": pa.array([total], pa.int64()),
                         "mad_num": pa.array([str(2 * acc)],
                                             pa.string())})

    per_nation = counts.groupby("nk").map_groups(
        mad, batch_format="pyarrow")

    nations = pq.read_table(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey", "n_name"])
    names = dict(zip(nations.column("n_nationkey").to_pylist(),
                     nations.column("n_name").to_pylist()))
    name_ref = ray.put(names)

    def attach(batch: pa.Table) -> pa.Table:
        lut = ray.get(name_ref)
        nm = [lut[k] for k in batch.column("nk").to_pylist()]
        return pa.table({"n_name": pa.array(nm, pa.string()),
                         "n_customers": batch.column("n_customers"),
                         "mad_num": batch.column("mad_num")})

    return per_nation.map_batches(attach, batch_format="pyarrow") \
        .sort("n_name")


def daily_revenue_streak_hist(sf_dir: str) -> pa.Table:
    """Momentum microstructure: histogram of maximal strictly-
    increasing streak lengths over the day-ordered daily revenue
    series (observed days only) — how long does growth persist before
    a down day?  The unbounded orders table folds to one bounded
    daily-cents row per day; the gaps-and-islands pass runs on that
    tiny series at the driver."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"day": pa.array(us // 86_400_000_000),
                      "rev": pa.array(cents)})
        res = t.group_by(["day"]).aggregate([("rev", "sum")])
        return pa.table({"day": res.column("day"),
                         "rev": res.column("rev_sum")})

    daily = partial_aggregate(ds.map_batches(prep,
                                             batch_format="pyarrow"),
                              ["day"], [("rev", "sum", "rev")])
    days, revs = [], []
    for b in daily.iter_batches(batch_format="pyarrow"):
        days.append(b.column("day").to_numpy(zero_copy_only=False))
        revs.append(b.column("rev").to_numpy(zero_copy_only=False))
    day = np.concatenate(days) if days else np.array([], np.int64)
    rev = np.concatenate(revs) if revs else np.array([], np.int64)
    order = np.argsort(day)
    rev = rev[order]
    if len(rev) == 0:
        return pa.table({"streak_len": pa.array([], pa.int64()),
                         "n_streaks": pa.array([], pa.int64())})
    brk = np.r_[True, rev[1:] <= rev[:-1]]
    starts = np.flatnonzero(brk)
    lens = np.diff(np.r_[starts, len(rev)])
    ln, cnt = np.unique(lens, return_counts=True)
    return pa.table({"streak_len": pa.array(ln.astype(np.int64)),
                     "n_streaks": pa.array(cnt.astype(np.int64))})


def customer_spend_halves_matrix(sf_dir: str) -> ray.data.Dataset:
    """Lifecycle trend without floats: per repeat customer, compare
    the LAST floor(n/2) orders' spend against the FIRST floor(n/2)
    (middle order of odd counts sits out) and label up/down/flat;
    count labels per market segment — are segments growing or
    fading?  Join-first plan (the map_groups-into-join hazard,
    functions/joins.py:86-93): orders hash-join customer on the key,
    the segment rides along into the per-customer cumsum fold, and
    only the 15-cell matrix folds after."""
    from ..functions.joins import hash_join

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_orderkey",
                                         "o_orderdate",
                                         "o_totalprice"])
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])
    joined = hash_join(orders, cust, on="o_custkey",
                       right_on="c_custkey")

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch.column("o_totalprice")
                        .to_numpy(zero_copy_only=False) * 100) \
            .astype(np.int64)
        t = pa.table({"cust": pc.cast(batch.column("o_custkey"),
                                      pa.int64()),
                      "okey": pc.cast(batch.column("o_orderkey"),
                                      pa.int64()),
                      "odate": pc.cast(batch.column("o_orderdate"),
                                       pa.int64()),
                      "seg": batch.column("c_mktsegment"),
                      "cents": pa.array(cents)})
        return t.append_column("__ub", bucket_ids(t, ["cust"]))

    def halves(group: pa.Table) -> pa.Table:
        t = group.sort_by([("cust", "ascending"),
                           ("odate", "ascending"),
                           ("okey", "ascending")])
        cust = t.column("cust").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        empty = pa.table({"c_mktsegment": pa.array([], pa.string()),
                          "trend": pa.array([], pa.string()),
                          "n_customers": pa.array([], pa.int64())})
        if len(cust) == 0:
            return empty
        change = np.flatnonzero(cust[1:] != cust[:-1])
        starts = np.r_[0, change + 1]
        ends = np.r_[change + 1, len(cust)]
        n = ends - starts
        keep = n >= 2
        if not keep.any():
            return empty
        s, e, half = starts[keep], ends[keep], (n[keep] // 2)
        cum = np.cumsum(cents)
        first = cum[s + half - 1] - np.where(s > 0, cum[s - 1], 0)
        second = cum[e - 1] - cum[e - 1 - half]
        trend = np.where(second > first, "up",
                         np.where(second < first, "down", "flat"))
        seg = t.column("seg").take(pa.array(s)).combine_chunks()
        res = pa.table({"c_mktsegment": seg,
                        "trend": pa.array(trend),
                        "n_customers": pa.array(np.ones(len(s),
                                                        np.int64))}) \
            .group_by(["c_mktsegment", "trend"]) \
            .aggregate([("n_customers", "sum")])
        return pa.table({"c_mktsegment": res.column("c_mktsegment"),
                         "trend": res.column("trend"),
                         "n_customers": res.column("n_customers_sum")})

    cells = joined.map_batches(prep, batch_format="pyarrow") \
        .groupby("__ub").map_groups(halves, batch_format="pyarrow")
    return partial_aggregate(
        cells, ["c_mktsegment", "trend"],
        [("n_customers", "sum", "n_customers")]) \
        .sort(["c_mktsegment", "trend"])


def bigram_asymmetry_topk(sf_dir: str, min_support: int = 20,
                          k: int = 20) -> ray.data.Dataset:
    """Word-order preference mining: for each unordered token pair
    {a, b} with enough total adjacencies, how lopsided is the 'a b'
    vs 'b a' direction — the collocation-order signal ('hash table'
    vs 'table hash').  Ordered bigrams build fully vectorized (the
    top_bigrams kernel), fold to unordered pairs with directional
    partial counts through one exchange, and only the tiny >=support
    tail sorts."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column("text"), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        m = len(flat)
        empty = pa.table({"tok_a": pa.array([], pa.string()),
                          "tok_b": pa.array([], pa.string()),
                          "n_ab": pa.array([], pa.int64()),
                          "n_ba": pa.array([], pa.int64())})
        if m < 2:
            return empty
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        valid = np.ones(m - 1, dtype=bool)
        ends = offsets[1:] - 1
        ends = ends[(ends >= 0) & (ends < m - 1)]
        valid[ends] = False
        sel = pa.array(valid)
        left = flat.slice(0, m - 1).filter(sel)
        right = flat.slice(1, m - 1).filter(sel)
        neq = pc.not_equal(left, right)
        left, right = left.filter(neq), right.filter(neq)
        if len(left) == 0:
            return empty
        swap = pc.greater(left, right)
        lo = pc.if_else(swap, right, left)
        hi = pc.if_else(swap, left, right)
        one = np.ones(len(lo), np.int64)
        fwd = pc.if_else(swap, pa.array(np.zeros(len(lo), np.int64)),
                         pa.array(one))
        rev = pc.if_else(swap, pa.array(one),
                         pa.array(np.zeros(len(lo), np.int64)))
        t = pa.table({"tok_a": lo, "tok_b": hi, "n_ab": fwd,
                      "n_ba": rev})
        res = t.group_by(["tok_a", "tok_b"]).aggregate(
            [("n_ab", "sum"), ("n_ba", "sum")])
        return pa.table({"tok_a": res.column("tok_a"),
                         "tok_b": res.column("tok_b"),
                         "n_ab": res.column("n_ab_sum"),
                         "n_ba": res.column("n_ba_sum")})

    pairs = partial_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["tok_a", "tok_b"],
        [("n_ab", "sum", "n_ab"), ("n_ba", "sum", "n_ba")])

    def tail(batch: pa.Table) -> pa.Table:
        ab = batch.column("n_ab").to_numpy(zero_copy_only=False)
        ba = batch.column("n_ba").to_numpy(zero_copy_only=False)
        keep = (ab + ba) >= min_support
        b = batch.filter(pa.array(keep))
        asym = np.abs(ab[keep] - ba[keep])
        return b.append_column("asym", pa.array(asym.astype(np.int64)))

    return pairs.map_batches(tail, batch_format="pyarrow") \
        .sort(["asym", "tok_a", "tok_b"],
              descending=[True, False, False]).limit(k)
