"""Batch 138: JL distortion census, Luhn check digits,
Zipf-Mandelbrot shift fit, dominant-type runs."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_jl_projection_distortion_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import \
        jl_projection_distortion_census
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.001, 0.002, 0.003, 0.004],
                               [0.001, 0.0, 0.0, 0.0]],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = jl_projection_distortion_census(str(tmp_path)).to_pandas()
    # diff [0,2,3,4]: d2o=29, d2p=60, e=-56 -> sgn -1, 6 bits
    assert list(map(tuple, out.values)) == [(-1, 6, 1)]


def test_luhn_checksum_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import luhn_checksum_census
    pq.write_table(pa.table({
        "o_orderkey": pa.array([0, 18, 5, 18], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = luhn_checksum_census(str(tmp_path)).to_pandas()
    # 0->cd0; 18: 2*8-9+1=8 -> cd2; 5: 2*5-9=1 -> cd9
    assert sorted(map(tuple, out.values)) == [
        (0, 1), (2, 1), (9, 1)]


def test_zipf_mandelbrot_shift_fit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import zipf_mandelbrot_shift_fit
    pq.write_table(pa.table({
        "text": pa.array(["a a a a b b c"]),
    }), str(tmp_path / "documents.parquet"))
    out = zipf_mandelbrot_shift_fit(str(tmp_path)).to_pandas()
    # counts 4,2,1 -> err(b) = 2b + (1+b) = 3b+1, best b=0
    assert list(map(tuple, out.values)) == [
        (b, 3 * b + 1, 1 if b == 0 else 0) for b in range(9)]


def test_dominant_type_run_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import dominant_type_run_census
    days = (["2024-01-01"] * 3 + ["2024-01-02"]
            + ["2024-01-03"] * 3 + ["2024-01-04"])
    types = ["a", "a", "b", "a", "b", "b", "a", "a"]
    pq.write_table(pa.table({
        "ts": pa.array([_ts(f"{d}T00:00") for d in days],
                       pa.timestamp("us")),
        "event_type": pa.array(types),
    }), str(tmp_path / "events.parquet"))
    out = dominant_type_run_census(str(tmp_path)).to_pandas()
    # dominant sequence a,a,b,a
    assert list(map(tuple, out.values)) == [
        ("a", 3, 2, 2), ("b", 1, 1, 1)]
