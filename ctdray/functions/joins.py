"""Join primitives the reference lacks (SURVEY.md §2.11) as Ray-Data-first
operators.

Two physical strategies, chosen by the small side's size:

  broadcast_*   the small side is ``ray.put`` ONCE and read inside every
                map_batches task — zero shuffle of the big side.  Right when
                the small side fits comfortably in the object store
                (dimension tables, dup-id sets in the thousands/millions).

  shuffle_anti_join
                both sides hash-partition on the key via ``groupby`` — the
                big side shuffles once, the key side is tiny.  Right when
                the key set is too large to broadcast (billion-row dup sets
                at 10^12-doc scale).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def broadcast_semi_join(ds: ray.data.Dataset, keys, key_col: str,
                        anti: bool = False) -> ray.data.Dataset:
    """Keep rows whose ``key_col`` is (anti: is not) in ``keys``.
    ``keys`` may be a python iterable or a small Dataset of one column.
    The key set ships as an Arrow array (``ray.put`` once) and the per-batch
    membership test is a single ``pc.is_in`` kernel — no Python row loop."""
    if isinstance(keys, ray.data.Dataset):
        keys = [r[key_col] for r in keys.take_all()]
    keys = list(dict.fromkeys(keys))
    if not keys:
        # empty key set: semi-join keeps nothing, anti-join keeps everything
        if anti:
            return ds
        return ds.map_batches(lambda b: b.slice(0, 0), batch_format="pyarrow")
    key_ref = ray.put(pa.array(keys))

    def fn(batch: pa.Table) -> pa.Table:
        value_set = ray.get(key_ref)
        mask = pc.is_in(batch.column(key_col), value_set=value_set)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def broadcast_anti_join(ds: ray.data.Dataset, keys,
                        key_col: str) -> ray.data.Dataset:
    return broadcast_semi_join(ds, keys, key_col, anti=True)


def broadcast_lookup_join(ds: ray.data.Dataset, lookup: dict, key_col: str,
                          value_col: str,
                          default=None) -> ray.data.Dataset:
    """Equi-join against a broadcast dict: adds ``value_col`` looked up from
    ``key_col`` (the dimension-table pattern in pipelines.analytics).
    Vectorized as Arrow dictionary lookup: ``pc.index_in`` against the key
    array, misses routed to a trailing default slot, one ``pc.take``."""
    keys_arr = pa.array(list(lookup.keys()))
    vals_arr = pa.array(list(lookup.values()) + [default])
    side_ref = ray.put((keys_arr, vals_arr))

    def fn(batch: pa.Table) -> pa.Table:
        keys_a, vals_a = ray.get(side_ref)
        idx = pc.index_in(batch.column(key_col), value_set=keys_a)
        idx = pc.fill_null(idx, len(keys_a))      # miss → default slot
        return batch.append_column(value_col, pc.take(vals_a, idx))

    return ds.map_batches(fn, batch_format="pyarrow")


def hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
              on: str, right_on: str | None = None,
              join_type: str = "inner",
              num_partitions: int | None = None) -> ray.data.Dataset:
    """Distributed hash join via Ray Data's native ``Dataset.join`` (both
    sides hash-partition on the key).  Use when BOTH sides are too large to
    broadcast; otherwise prefer :func:`broadcast_lookup_join` (no shuffle of
    the big side).

    Caveat (Ray 2.49): feeding a ``groupby().map_groups`` output straight
    into a join fails with ``No match ... for key field reference`` — the
    sort-based groupby emits schema-less EMPTY blocks that break the join's
    field resolution.  Either join FIRST and aggregate after (preferred:
    the join then carries raw keys, not aggregates), or launder the
    aggregate through ``.repartition(n)`` before joining."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(4, cpus // 2)
    return left.join(right, join_type=join_type,
                     num_partitions=num_partitions,
                     on=(on,),
                     right_on=(right_on,) if right_on else None)


def shuffle_lookup_join(left: ray.data.Dataset, right: ray.data.Dataset,
                        on: str, right_on: str | None = None,
                        left_schema=None, right_schema=None,
                        how: str = "inner") -> ray.data.Dataset:
    """Equi-join where ``right`` has AT MOST ONE row per key (the
    fact⋈dimension shape when the dimension is too big to broadcast):
    both sides hash-partition on the key via ``groupby`` (union + padded
    typed-null columns), each group stamps its right row's values onto its
    left rows.  Use when Ray's native ``Dataset.join`` chokes — its 2.49
    hash-shuffle builds schema-less empty partitions from a filtered
    side's empty blocks and pyarrow rejects them — or when chaining joins.
    Column names must not collide across sides (except the key).

    ``how="left"`` keeps unmatched left rows with NULL right-side values
    (LEFT OUTER); ``how="inner"`` drops them."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    left_outer = how == "left"
    right_on = right_on or on
    # explicit schemas override Ray's inference (a filtered read whose
    # first blocks are empty reports schema None)
    lsch = left_schema if left_schema is not None \
        else left.schema(fetch_if_missing=True)
    rsch = right_schema if right_schema is not None \
        else right.schema(fetch_if_missing=True)
    l_types = dict(zip(lsch.names, lsch.types))
    r_types = dict(zip(rsch.names, rsch.types))
    r_vals = [c for c in rsch.names if c != right_on]
    overlap = (set(lsch.names) - {on}) & set(r_vals)
    if overlap:
        raise ValueError(f"column collision across join sides: {overlap}")
    KEY, SIDE, BUCKET = "__jk", "__left", "__jb"
    key_type = dict(zip(lsch.names, lsch.types))[on]
    int_key = pa.types.is_integer(key_type)

    def bucket_of(keys):
        # integer keys: Fibonacci-hash buckets (top 8 bits → 256) — the
        # exchange groups by BUCKET and each group merges VECTORIZED
        # (searchsorted), instead of one Python map_groups call per
        # distinct key
        k = keys.to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.array(((k * np.uint64(0x9E3779B97F4A7C15))
                         >> np.uint64(56)).astype(np.int32))

    def pad_left(b: pa.Table) -> pa.Table:
        cols = {KEY: b.column(on)}
        if int_key:
            cols[BUCKET] = bucket_of(b.column(on))
        for c in lsch.names:
            cols[c] = b.column(c)
        for c in r_vals:
            cols[c] = pa.nulls(len(b), r_types[c])
        cols[SIDE] = pa.array(np.ones(len(b), dtype=bool))
        return pa.table(cols)

    def pad_right(b: pa.Table) -> pa.Table:
        ck = b.column(right_on).cast(key_type)
        cols = {KEY: ck}
        if int_key:
            cols[BUCKET] = bucket_of(ck)
        for c in lsch.names:
            cols[c] = pa.nulls(len(b), l_types[c])
        for c in r_vals:
            cols[c] = b.column(c)
        cols[SIDE] = pa.array(np.zeros(len(b), dtype=bool))
        return pa.table(cols)

    def stamp_bucket(group: pa.Table) -> pa.Table:
        is_left = group.column(SIDE).to_numpy(zero_copy_only=False)
        keys = group.column(KEY).to_numpy(zero_copy_only=False)
        lefts = group.filter(pa.array(is_left))
        rights = group.filter(pa.array(~is_left))
        drop = [KEY, SIDE] + ([BUCKET] if BUCKET in group.column_names else [])
        if len(lefts) == 0:
            return lefts.slice(0, 0).drop_columns(drop)
        if len(rights) == 0:
            # left outer: unmatched rows keep their padded NULL right values
            return (lefts if left_outer else lefts.slice(0, 0)) \
                .drop_columns(drop)
        rkeys = keys[~is_left]
        order = np.argsort(rkeys, kind="stable")
        rkeys_s = rkeys[order]
        lkeys = keys[is_left]
        idx = np.searchsorted(rkeys_s, lkeys)
        idx_c = np.clip(idx, 0, len(rkeys_s) - 1)
        matched = rkeys_s[idx_c] == lkeys
        if left_outer:
            out = lefts.drop_columns(drop)
            # null indices propagate nulls through pc.take
            take = pa.array(order[idx_c].astype(np.int64), mask=~matched)
        else:
            out = lefts.filter(pa.array(matched)).drop_columns(drop)
            take = pa.array(order[idx_c[matched]])
        for c in r_vals:
            out = out.set_column(out.column_names.index(c), c,
                                 pc.take(rights.column(c), take))
        return out

    def stamp_key(group: pa.Table) -> pa.Table:
        is_left = group.column(SIDE)
        ri = pc.index(is_left, False).as_py()
        lefts = group.filter(is_left)
        if ri < 0 or len(lefts) == 0:          # no match for this key
            if left_outer and len(lefts):      # keep padded-NULL right values
                return lefts.drop_columns([KEY, SIDE])
            return lefts.slice(0, 0).drop_columns([KEY, SIDE])
        out = lefts.drop_columns([KEY, SIDE])
        for c in r_vals:
            v = group.column(c)[ri].as_py()
            out = out.set_column(out.column_names.index(c), c,
                                 pa.array([v] * len(out), r_types[c]))
        return out

    both = (left.map_batches(pad_left, batch_format="pyarrow")
            .union(right.map_batches(pad_right, batch_format="pyarrow")))
    if int_key:
        return both.groupby(BUCKET).map_groups(stamp_bucket,
                                               batch_format="pyarrow")
    return both.groupby(KEY).map_groups(stamp_key, batch_format="pyarrow")


def shuffle_anti_join(ds: ray.data.Dataset, keys_ds: ray.data.Dataset,
                      key_col: str) -> ray.data.Dataset:
    """Anti-join by hash-partitioning both sides on ``key_col``: the big side
    shuffles once; no driver-side materialization of either side.  ``keys_ds``
    needs only the key column."""
    marker = "__aj_marker"

    # Carry full rows for the data side; key rows carry only the marker.
    def mark_data(batch: pa.Table) -> pa.Table:
        return batch.append_column(marker, pa.array(
            np.zeros(len(batch), dtype=np.int8)))

    def mark_keys(batch: pa.Table) -> pa.Table:
        out = batch.select([key_col])
        return out.append_column(marker, pa.array(
            np.ones(len(batch), dtype=np.int8)))

    data = ds.map_batches(mark_data, batch_format="pyarrow")
    keys = keys_ds.map_batches(mark_keys, batch_format="pyarrow")

    def drop_marked(group: pa.Table) -> pa.Table:
        flags = group.column(marker).to_numpy(zero_copy_only=False)
        keep = group.filter(pa.array(flags == 0))
        if flags.max() == 1:        # key present → anti-join drops the group
            keep = keep.slice(0, 0)
        return keep.drop_columns([marker])

    # union requires identical schemas: pad the key side with nulls for every
    # data column (types captured driver-side once).
    sch = ds.schema()
    col_types = dict(zip(sch.names, sch.types))

    def pad_keys(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {}
        for name, typ in col_types.items():
            if name == key_col:
                cols[name] = batch.column(key_col)
            else:
                cols[name] = pa.nulls(n, typ)
        cols[marker] = batch.column(marker)
        return pa.table(cols)

    keys = keys.map_batches(pad_keys, batch_format="pyarrow")
    both = data.union(keys)
    return both.groupby(key_col).map_groups(drop_marked, batch_format="pyarrow")
