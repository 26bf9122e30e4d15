"""Batch 84: token lifetime, value-gap covariance, entity balance,
position-class matrix."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_token_lifetime_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_lifetime_hist
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 4], pa.int64()),
        # "a" spans docs 0..4 (lifetime 4 -> bucket 2); "b" single doc
        "text": pa.array(["a b", "a"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_lifetime_hist(str(tmp_path)).to_pandas() \
        .set_index("bucket").sort_index()
    assert out.loc[-1].n_tokens == 1
    assert out.loc[2].n_tokens == 1


def test_value_nextgap_cov(ray_session, tmp_path):
    from ctdray.pipelines.analytics import value_nextgap_cov
    # pairs: (100 cents, 10s), (300 cents, 30s) for user 1
    pq.write_table(pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00:00"),
                        _ts("2024-01-01T00:00:10"),
                        _ts("2024-01-01T00:00:40")], pa.timestamp("us")),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": pa.array(["x"] * 3),
        "value": pa.array([1.0, 3.0, 9.0]),
    }), str(tmp_path / "events.parquet"))
    out = value_nextgap_cov(str(tmp_path)).to_pandas()
    # n=2, sx=400, sy=4e7, sxy=100*1e7+300*3e7=1e10
    # cov = 2*1e10 - 400*4e7 = 2e10 - 1.6e10 = 4e9
    assert out.n_pairs[0] == 2
    assert out.cov_num[0] == '4000000000'


def test_nation_entity_balance(ray_session, tmp_path):
    from ctdray.pipelines.analytics import nation_entity_balance
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([0, 0, 1], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10], pa.int64()),
        "s_nationkey": pa.array([0], pa.int32()),
    }), str(tmp_path / "supplier.parquet"))
    out = nation_entity_balance(str(tmp_path)).to_pandas() \
        .set_index("nationkey")
    assert out.loc[0].n_customers == 2
    assert out.loc[0].n_suppliers == 1
    assert out.loc[0].customer_ppm == 666_666
    assert out.loc[1].customer_ppm == 1_000_000


def test_session_position_type_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import session_position_type_matrix
    # session A: view click purchase; session B: solo error
    rows = [("view", "2024-01-01T00:00"), ("click", "2024-01-01T00:05"),
            ("purchase", "2024-01-01T00:10"),
            ("error", "2024-01-01T05:00")]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(t) for _, t in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([t for t, _ in rows]),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = session_position_type_matrix(str(tmp_path)).to_pandas() \
        .set_index(["position", "event_type"])
    assert out.loc[("first", "view")].n == 1
    assert out.loc[("middle", "click")].n == 1
    assert out.loc[("last", "purchase")].n == 1
    assert out.loc[("solo", "error")].n == 1
