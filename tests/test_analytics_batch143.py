"""Batch 143: centroid drift, order sprees, PATRICIA census,
hour-of-week cosine."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_streaming_centroid_drift(ray_session, tmp_path):
    from ctdray.pipelines.analytics import streaming_centroid_drift
    emb = [[i * 0.001, 0.0, -i * 0.001, 0.001] for i in range(10)]
    pq.write_table(pa.table({
        "vec_id": pa.array(list(range(10)), pa.int64()),
        "embedding": pa.array(emb, pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = streaming_centroid_drift(str(tmp_path)).to_pandas()
    exp = [(8, 8, 28, 0, -28, 8)] + [
        (c, 10, 45, 0, -45, 10) for c in (16, 32, 64, 128, 256,
                                          512)]
    assert list(map(tuple, out.values)) == exp


def test_customer_order_spree_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_order_spree_census
    dates = ["2024-01-01", "2024-01-05", "2024-01-20", "2024-01-25",
             "2024-01-01"]
    custs = [1, 1, 1, 1, 2]
    pq.write_table(pa.table({
        "o_custkey": pa.array(custs, pa.int64()),
        "o_orderdate": pa.array([_ts(f"{d}T00:00") for d in dates],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = customer_order_spree_census(str(tmp_path)).to_pandas()
    # cust1: sprees of 2 and 2; cust2: spree of 1
    assert list(map(tuple, out.values)) == [(1, 1), (2, 2)]


def test_patricia_compression_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import patricia_compression_census
    pq.write_table(pa.table({
        "p_name": pa.array(["ab", "ac", "xyyy", "xyyy"]),
    }), str(tmp_path / "part.parquet"))
    out = patricia_compression_census(str(tmp_path)).to_pandas()
    # prefixes a,ab,ac,x,xy,xyy,xyyy; patricia a + 3 names
    assert list(map(tuple, out.values)) == [(3, 7, 4, 3)]


def test_type_hourweek_cosine_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import type_hourweek_cosine_matrix
    t1 = _ts("2024-01-01T05:00")
    t2 = _ts("2024-01-02T05:00")
    pq.write_table(pa.table({
        "ts": pa.array([t1, t1, t1, t2], pa.timestamp("us")),
        "event_type": pa.array(["x", "x", "y", "y"]),
    }), str(tmp_path / "events.parquet"))
    out = type_hourweek_cosine_matrix(str(tmp_path)).to_pandas()
    # x={h:2}, y={h:1, h':1}: dot 2, cos^2 = 4/8
    assert list(map(tuple, out.values)) == [("x", "y", 2, 500000)]
