"""Batch 108: cross-stream daily covariance, centroid margins,
nation supplier HHI, purchase dow-hour heatmap."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_events_orders_daily_cov(ray_session, tmp_path):
    from ctdray.pipelines.analytics import events_orders_daily_cov
    # day1: 2 events, 1 order; day2: 1 event, 0 orders;
    # day3: 0 events, 2 orders
    # n=3, sx=3, sy=3, sxy=2 -> cov = 3*2 - 9 = -3
    pq.write_table(pa.table({
        "ts": pa.array([_ts("2024-01-01T01:00:00"),
                        _ts("2024-01-01T02:00:00"),
                        _ts("2024-01-02T01:00:00")],
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts("2024-01-01"), _ts("2024-01-03"),
                                 _ts("2024-01-03")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = events_orders_daily_cov(str(tmp_path)).to_pandas()
    assert out.n_days[0] == 3
    assert out.cov_num[0] == "-3"


def test_centroid_margin_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import centroid_margin_hist
    # two tight clusters along dim 0: centroids at +/-1; vectors sit
    # exactly on their centroid -> d1=0, d2=4e16 -> margin 100%
    emb = [[1.0] + [0.0] * 63, [1.0] + [0.0] * 63,
           [-1.0] + [0.0] * 63, [-1.0] + [0.0] * 63]
    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
        "embedding": pa.array(emb, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1, 1], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = centroid_margin_hist(str(tmp_path)).to_pandas()
    assert out.margin_pct.tolist() == [100]
    assert out.n_vectors.tolist() == [4]


def test_nation_supplier_hhi(ray_session, tmp_path):
    from ctdray.pipelines.analytics import nation_supplier_hhi_ppm
    # nation 0: suppliers with revenue 300 and 100 cents ->
    # hhi = 1e6*(90000+10000)//160000 = 625000
    # nation 1: single supplier -> 1e6
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([2.0, 1.0, 1.0, 5.0]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([0, 0, 1], pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["ALPHA", "BETA"]),
    }), str(tmp_path / "nation.parquet"))
    out = nation_supplier_hhi_ppm(str(tmp_path)).to_pandas() \
        .set_index("n_name")
    assert out.loc["ALPHA"].n_suppliers == 2
    assert out.loc["ALPHA"].hhi_ppm == 625000
    assert out.loc["BETA"].hhi_ppm == 1000000


def test_purchase_dow_hour_heatmap(ray_session, tmp_path):
    from ctdray.pipelines.analytics import purchase_dow_hour_heatmap
    # 2024-01-01 is a Monday -> dow formula: epoch day 19723,
    # (19723+4)%7 = 1
    pq.write_table(pa.table({
        "event_type": pa.array(["purchase", "purchase", "view"]),
        "ts": pa.array([_ts("2024-01-01T09:30:00"),
                        _ts("2024-01-01T09:45:00"),
                        _ts("2024-01-01T09:50:00")],
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = purchase_dow_hour_heatmap(str(tmp_path)).to_pandas()
    assert out.dow.tolist() == [1]
    assert out.hour.tolist() == [9]
    assert out.n_purchases.tolist() == [2]
