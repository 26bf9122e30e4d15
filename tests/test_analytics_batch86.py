"""Batch 86: k-anonymity audit, price percentile ranks, event-type
trigrams, order priority escalation."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_customer_kanonymity_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_kanonymity_audit
    # QI groups: (0,A,0) x6 (safe), (0,A,1) x2 (risky), (1,B,0) x1 (risky)
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(9), pa.int64()),
        "c_name": pa.array([f"c{i}" for i in range(9)]),
        "c_nationkey": pa.array([0] * 8 + [1], pa.int32()),
        "c_acctbal": pa.array([500.0] * 6 + [1500.0] * 2 + [500.0]),
        "c_mktsegment": pa.array(["A"] * 8 + ["B"]),
    }), str(tmp_path / "customer.parquet"))
    out = customer_kanonymity_audit(str(tmp_path), k=5).to_pandas()
    assert out.n_groups[0] == 3
    assert out.n_risky_groups[0] == 2
    assert out.n_risky_customers[0] == 3
    assert out.min_group_size[0] == 1


def test_price_percentile_ranks(ray_session, tmp_path):
    from ctdray.pipelines.analytics import price_percentile_ranks
    # prices (cents): 100, 200, 300, 400 -> P(<=250)=2/4, P(<=400)=4/4
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(4), pa.int64()),
        "l_extendedprice": pa.array([1.0, 2.0, 3.0, 4.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = price_percentile_ranks(
        str(tmp_path), thresholds_cents=(250, 400)).to_pandas() \
        .set_index("threshold_cents")
    assert out.loc[250].n_le == 2
    assert out.loc[250].pctile_ppm == 500_000
    assert out.loc[400].n_le == 4
    assert out.loc[400].pctile_ppm == 1_000_000


def test_event_type_trigrams(ray_session, tmp_path):
    from ctdray.pipelines.analytics import event_type_trigrams
    # user 1: a b a b -> (a,b,a), (b,a,b); user 2: a b (no trigram)
    pq.write_table(pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array([_ts(f"2024-01-01T00:0{i}") for i in range(4)]
                       + [_ts("2024-01-01T01:00"),
                          _ts("2024-01-01T01:01")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "b", "a", "b"]),
        "value": pa.array([0.0] * 6),
    }), str(tmp_path / "events.parquet"))
    out = event_type_trigrams(str(tmp_path)).to_pandas()
    assert len(out) == 2
    rows = {(r.t1, r.t2, r.t3): r.n for r in out.itertuples()}
    assert rows[("a", "b", "a")] == 1
    assert rows[("b", "a", "b")] == 1


def test_order_priority_escalation(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_priority_escalation
    # cust 1: 3-MEDIUM -> 1-URGENT (escalation) -> 5-LOW (de-escalation)
    # cust 2: 2-HIGH -> 2-HIGH (hold)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(5), pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "o_orderdate": pa.array(
            [_ts(f"2024-01-0{i}") for i in range(1, 6)],
            pa.timestamp("us")),
        "o_orderpriority": pa.array(
            ["3-MEDIUM", "1-URGENT", "5-LOW", "2-HIGH", "2-HIGH"]),
    }), str(tmp_path / "orders.parquet"))
    out = order_priority_escalation(str(tmp_path)).to_pandas()
    assert out.n_pairs[0] == 3
    assert out.n_escalations[0] == 1
    assert out.n_deescalations[0] == 1
    assert out.n_escalating_customers[0] == 1
