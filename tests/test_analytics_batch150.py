"""Batch 150: ISO week rollover, Laplace rank flips, Simpson probe,
Friday-13th lift."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_iso_week_rollover_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import iso_week_rollover_census
    pq.write_table(pa.table({
        "o_orderdate": pa.array(
            [_ts("2021-01-01T00:00"),     # ISO (2020, 53), mismatch
             _ts("2024-12-30T00:00"),     # ISO (2025, 1), mismatch
             _ts("2024-06-05T00:00")],    # ISO (2024, 23)
            pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = iso_week_rollover_census(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        (2020, 1, 1, 1), (2024, 1, 1, 0), (2025, 1, 1, 1)]


def test_laplace_smoothing_rank_flips(ray_session, tmp_path):
    from ctdray.pipelines.analytics import laplace_smoothing_rank_flips
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["A", "B"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1] + [2] * 10, pa.int64()),
        "l_returnflag": pa.array(["R"] + ["R"] * 9 + ["N"]),
    }), str(tmp_path / "lineitem.parquet"))
    out = laplace_smoothing_rank_flips(str(tmp_path)).to_pandas()
    # raw 1/1 > 9/10 but smoothed 2/3 < 10/12 -> one flip
    assert list(map(tuple, out.values)) == [(2, 1, 1, 0)]


def test_size_price_simpson_probe(ray_session, tmp_path):
    from ctdray.pipelines.analytics import size_price_simpson_probe
    pq.write_table(pa.table({
        "p_brand": pa.array(["A", "A", "B", "B"]),
        "p_size": pa.array([1, 3, 1, 2], pa.int32()),
        "p_retailprice": pa.array([1.0, 4.0, 5.0, 4.0]),
    }), str(tmp_path / "part.parquet"))
    out = size_price_simpson_probe(str(tmp_path)).to_pandas()
    # pooled cov > 0 but brand B trends down -> 1 agree, 1 disagree
    assert list(map(tuple, out.values)) == [(1, 2, 1, 1, 0)]


def test_friday13_order_lift(ray_session, tmp_path):
    from ctdray.pipelines.analytics import friday13_order_lift
    pq.write_table(pa.table({
        "o_orderdate": pa.array(
            [_ts("2023-10-13T08:00"), _ts("2023-10-13T09:00"),
             _ts("2023-10-10T00:00"), _ts("2023-10-14T00:00")],
            pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = friday13_order_lift(str(tmp_path)).to_pandas()
    # grid 10-10..10-14 (5 days), one F13 day carrying 2 of 4 orders
    assert list(map(tuple, out.values)) == [(5, 1, 2, 4, 2500000)]
