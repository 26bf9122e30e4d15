"""Batch 58: name-key audit, id density audit, status sequence
signatures, giant orders."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_customer_name_key_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_name_key_audit
    pq.write_table(pa.table({
        "c_custkey": pa.array([0, 1, 2], pa.int64()),
        "c_name": pa.array(["Customer#000000000",
                            "Customer#000000009",    # wrong suffix
                            "Customer#000000002"]),
    }), str(tmp_path / "customer.parquet"))
    out = customer_name_key_audit(str(tmp_path)).to_pandas()
    assert out.n_rows[0] == 3
    assert out.n_consistent[0] == 2
    assert out.n_mismatched[0] == 1


def test_event_id_density_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import event_id_density_audit
    # ids 1,2,2,5 -> dup 1 ; holes: range 1..5 has 5 slots, 3 distinct
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 2, 5], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = event_id_density_audit(str(tmp_path)).to_pandas()
    assert out.min_id[0] == 1 and out.max_id[0] == 5
    assert out.n_duplicates[0] == 1
    assert out.n_holes[0] == 2            # 3 and 4 missing


def test_customer_status_sequence_signatures(ray_session, tmp_path):
    from ctdray.pipelines.analytics import (
        customer_status_sequence_signatures)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([_ts("2024-01-02"), _ts("2024-01-01"),
                                 _ts("2024-01-01"), _ts("2024-01-01")],
                                pa.timestamp("us")),
        # cust 1 ordered by date: F (jan1) then O (jan2) -> "FO"
        "o_orderstatus": pa.array(["O", "F", "P", "P"]),
    }), str(tmp_path / "orders.parquet"))
    out = customer_status_sequence_signatures(str(tmp_path)) \
        .to_pandas().set_index("signature")
    assert out.loc["FO"].n_customers == 1
    assert out.loc["P"].n_customers == 2


def test_customer_giant_orders(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_giant_orders
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(5), pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        # cust 1: 100,100,1000 -> median 100, giant if > 300 -> one
        # cust 2: 50,60 -> median (lower) 50, giant if > 150 -> none
        "o_totalprice": pa.array([100.0, 100.0, 1000.0, 50.0, 60.0]),
    }), str(tmp_path / "orders.parquet"))
    out = customer_giant_orders(str(tmp_path)).to_pandas()
    assert list(out.o_custkey) == [1]
    assert list(out.n_giant) == [1]
    assert list(out.n_orders) == [3]
