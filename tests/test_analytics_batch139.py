"""Batch 139: burst DP, UUIDv7 id plan, pinball decile audit,
dict sample coverage."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_kleinberg_burst_dp_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import kleinberg_burst_dp_audit
    counts = {"2024-01-01": 10, "2024-01-02": 10, "2024-01-03": 20,
              "2024-01-04": 21, "2024-01-05": 10}
    ts = []
    for d, n in counts.items():
        ts.extend([_ts(f"{d}T00:00")] * n)
    pq.write_table(pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))
    out = kleinberg_burst_dp_audit(str(tmp_path),
                                   switch_cost=5).to_pandas()
    # mu0=10, mu1=20; optimal path 00110 at cost 11
    assert list(map(tuple, out.values)) == [(5, 11, 2, 2)]


def test_uuidv7_id_plan_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import uuidv7_id_plan_audit
    t0 = _ts("2024-01-01T00:00:00.000")
    t1 = _ts("2024-01-01T00:00:00.001")
    pq.write_table(pa.table({
        "ts": pa.array([t0, t0, t0, t1], pa.timestamp("us")),
        "event_id": pa.array([1, 1, 2, 1], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = uuidv7_id_plan_audit(str(tmp_path)).to_pandas()
    # duplicate (ms, event_id) pair collides once
    assert list(map(tuple, out.values)) == [(4, 3, 1, 2)]


def test_pinball_loss_decile_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import pinball_loss_decile_audit
    days = [f"2024-01-{d:02d}" for d in range(1, 11)]
    pq.write_table(pa.table({
        "o_orderdate": pa.array([_ts(f"{d}T00:00") for d in days],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([(i + 1) * 1.0
                                  for i in range(10)]),
    }), str(tmp_path / "orders.parquet"))
    out = pinball_loss_decile_audit(str(tmp_path)).to_pandas()
    exp = [(k, k * 100, 450 * (10 - k) * (11 - k) + 50 * k * (k - 1),
            1 if k == 9 else 0) for k in range(1, 10)]
    assert list(map(tuple, out.values)) == exp


def test_zstd_dict_sample_coverage(ray_session, tmp_path):
    from ctdray.pipelines.analytics import zstd_dict_sample_coverage
    # md5("1")[:2]%2==0 (in sample); md5("19")[:2]=31%2==1 (out)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 19], pa.int64()),
        "text": pa.array(["abcd", "bcdx"]),
    }), str(tmp_path / "documents.parquet"))
    out = zstd_dict_sample_coverage(str(tmp_path), gram=3,
                                    rate=2).to_pandas()
    # sample grams {abc,bcd}; occurrences abc,bcd,bcd,cdx -> 3/4
    assert list(map(tuple, out.values)) == [(2, 1, 2, 4, 750000)]
