"""Batch 145: bullwhip ratio, association rules, rich club,
EWMA crossovers."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_bullwhip_variance_ratio(ray_session, tmp_path):
    from ctdray.pipelines.analytics import bullwhip_variance_ratio
    pq.write_table(pa.table({
        "o_orderdate": pa.array(
            [_ts("2024-01-01T00:00")] + [_ts("2024-01-02T00:00")]
            * 3, pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_shipdate": pa.array(
            [_ts("2024-01-01T00:00")] * 2
            + [_ts("2024-01-03T00:00")] * 4, pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = bullwhip_variance_ratio(str(tmp_path)).to_pandas()
    # o=[1,3,0] var 14; l=[2,0,4] var 24
    assert list(map(tuple, out.values)) == [(3, 14, 24, 1714285)]


def test_assoc_rule_confidence_top5(ray_session, tmp_path):
    from ctdray.pipelines.analytics import assoc_rule_confidence_top5
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
        "l_partkey": pa.array([1, 2, 1, 2, 1, 3], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = assoc_rule_confidence_top5(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (2, 1, 2, 2, 1000000), (1, 2, 2, 3, 666666)]


def test_richclub_top8_coefficient(ray_session, tmp_path):
    from ctdray.pipelines.analytics import richclub_top8_coefficient
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 3, 4, 4], pa.int64()),
        "l_partkey": pa.array([1, 2, 1, 3, 2, 3, 4, 5], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = richclub_top8_coefficient(str(tmp_path)).to_pandas()
    # 5 nodes, 4 edges, all nodes are "hubs": 4/10 edges
    assert list(map(tuple, out.values)) == [(5, 1, 4, 10, 400000)]


def test_ewma_crossover_signal_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        ewma_crossover_signal_census
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts("2024-01-01T00:00"),
                                 _ts("2024-01-03T00:00")],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 3.0]),
    }), str(tmp_path / "orders.parquet"))
    out = ewma_crossover_signal_census(str(tmp_path)).to_pandas()
    # v=[100,0,300]: signs 0,-1,+1 -> 2 crossings; f=175 s=113
    assert list(map(tuple, out.values)) == [(3, 2, 175, 113)]
