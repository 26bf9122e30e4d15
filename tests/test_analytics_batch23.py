"""Batch 23: type signatures, above-group-median counts, keep-longest
dedup policy, point-in-time snapshot."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_type_signature_groups(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_type_signature
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array([_ts("2024-01-01")] * 5, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 3], pa.int64()),
        "event_type": pa.array(["view", "cart", "view", "cart",
                                "cart"]),
        "value": pa.array([0.0] * 5),
    }), str(tmp_path / "events.parquet"))
    out = user_type_signature(str(tmp_path)).to_pandas()
    got = dict(zip(out.signature, out.n_users))
    assert got == {"cart,view": 1, "cart": 2}


def test_above_group_median(ray_session, tmp_path):
    from ctdray.pipelines.analytics import orders_above_group_median
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(5), pa.int64()),
        "o_custkey": pa.array([1] * 5, pa.int64()),
        "o_orderpriority": pa.array(["5-LOW"] * 5),
        # quantile_disc(0.5) of [10,20,30,40,50] = 30; above: 40, 50
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0, 50.0]),
    }), str(tmp_path / "orders.parquet"))
    out = orders_above_group_median(str(tmp_path)).to_pandas()
    assert out.median_cents[0] == 3000
    assert out.n_above[0] == 2 and out.n_total[0] == 5


def test_keep_longest_policy(ray_session, tmp_path):
    from ctdray.pipelines.analytics import dedup_keep_longest
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        # 0 and 2 identical (tie -> keep 0); 1 unique; 3 unique
        "text": pa.array(["same text", "short", "same text", "other"]),
        "n_chars": pa.array([9, 5, 9, 5], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = dedup_keep_longest(str(tmp_path)).to_pandas()
    assert sorted(out.doc_id) == [0, 1, 3]


def test_asof_snapshot(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_status_asof
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([7, 7, 7, 8], pa.int64()),
        # cust 7: order 2 is latest before asof; order 3 after asof
        "o_orderdate": pa.array(
            [_ts("1995-01-01"), _ts("1995-05-01"), _ts("1995-12-01"),
             _ts("1996-01-01")], pa.timestamp("us")),
        "o_orderstatus": pa.array(["F", "O", "P", "O"]),
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0]),
    }), str(tmp_path / "orders.parquet"))
    out = customer_status_asof(str(tmp_path)).to_pandas()
    # cust 8's only order is after the as-of date -> absent
    assert list(out.o_custkey) == [7]
    assert out.o_orderkey[0] == 2 and out.o_orderstatus[0] == "O"
    assert out.price_cents[0] == 2000
