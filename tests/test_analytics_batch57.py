"""Batch 57: Levenshtein band join, table profiler, purchase position,
grouped lag quantiles."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_part_name_levenshtein_pairs(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_name_levenshtein_pairs
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(4), pa.int64()),
        # B1: "bolt" vs "bolts" dist 1 (close); "washer" far from both
        "p_name": pa.array(["bolt", "bolts", "washer", "nut"]),
        "p_brand": pa.array(["B1", "B1", "B1", "B2"]),
    }), str(tmp_path / "part.parquet"))
    out = part_name_levenshtein_pairs(str(tmp_path)).to_pandas() \
        .set_index("p_brand")
    assert out.loc["B1"].n_names == 3
    assert out.loc["B1"].n_close_pairs == 1
    assert out.loc["B2"].n_close_pairs == 0


def test_lineitem_profile(ray_session, tmp_path):
    from ctdray.pipelines.analytics import lineitem_profile
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_partkey": pa.array([10, 11, 10], pa.int64()),
        "l_suppkey": pa.array([5, 5, 5], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1], pa.int32()),
        "l_returnflag": pa.array(["A", "R", "A"]),
        "l_linestatus": pa.array(["O", "O", "F"]),
    }), str(tmp_path / "lineitem.parquet"))
    out = lineitem_profile(str(tmp_path)).to_pandas() \
        .set_index("col_name")
    assert out.loc["l_orderkey"].n_distinct == 2
    assert out.loc["l_suppkey"].n_distinct == 1
    assert out.loc["l_returnflag"].n_nonnull == 3


def test_purchase_position_in_session(ray_session, tmp_path):
    from ctdray.pipelines.analytics import purchase_position_in_session
    # one session: view(0) purchase(1) purchase(2); second session:
    # purchase(0)
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00"), _ts("2024-01-01T00:05"),
                        _ts("2024-01-01T00:10"), _ts("2024-01-01T05:00")],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * 4, pa.int64()),
        "event_type": pa.array(["view", "purchase", "purchase",
                                "purchase"]),
        "value": pa.array([0.0] * 4),
    }), str(tmp_path / "events.parquet"))
    out = purchase_position_in_session(str(tmp_path)).to_pandas()
    assert out.n_sessions[0] == 2
    assert out.n_purchases[0] == 3
    assert out.sum_position[0] == 3     # 1 + 2 + 0


def test_priority_lag_quantiles(ray_session, tmp_path):
    from ctdray.pipelines.analytics import priority_lag_quantiles
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_orderdate": pa.array([_ts("2024-01-01")], pa.timestamp("us")),
        "o_orderpriority": pa.array(["P1"]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1], pa.int64()),
        "l_shipdate": pa.array([_ts("2024-01-02"), _ts("2024-01-05"),
                                _ts("2024-01-11")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = priority_lag_quantiles(str(tmp_path)).to_pandas() \
        .set_index("q")
    assert out.loc[0.5].value == 4.0     # lower median of {1,4,10}
    assert out.loc[0.99].value == 10.0
