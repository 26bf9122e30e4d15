"""Batch 59: vocab coverage curve, arrival dispersion, burstiness,
staleness tiers."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_vocab_coverage_curve(ray_session, tmp_path):
    from ctdray.pipelines.analytics import vocab_coverage_curve
    # counts: a=5, b=3, c=1, d=1 -> k=1 covers 5/10; k=2 covers 8/10
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a a a b b c", "a a b d"]),
    }), str(tmp_path / "documents.parquet"))
    out = vocab_coverage_curve(str(tmp_path), ks=(1, 2)).to_pandas() \
        .set_index("k")
    assert out.loc[1].covered == 5
    assert out.loc[1].coverage_ppm == 500_000
    assert out.loc[2].covered == 8
    assert out.loc[2].total == 10


def test_arrival_dispersion_by_type(ray_session, tmp_path):
    from ctdray.pipelines.analytics import arrival_dispersion_by_type
    # type a at t=0s,10s,30s -> gaps 10s,20s (us): n=2,
    # sum=3e7, sumsq=1e14+4e14=5e14, disp = 2*5e14 - 9e14 = 1e14
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([_ts("2024-01-01T00:00:00"),
                        _ts("2024-01-01T00:00:10"),
                        _ts("2024-01-01T00:00:30")], pa.timestamp("us")),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": pa.array(["a"] * 3),
        "value": pa.array([0.0] * 3),
    }), str(tmp_path / "events.parquet"))
    out = arrival_dispersion_by_type(str(tmp_path)).to_pandas()
    assert out.n_gaps[0] == 2
    assert out.sum_gap_us[0] == 30_000_000
    assert out.sumsq_gap[0] == '500000000000000'
    assert out.disp_num[0] == '100000000000000'


def test_token_burstiness_top10(ray_session, tmp_path):
    from ctdray.pipelines.analytics import token_burstiness_top10
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        # "z" appears 3x in doc0 (bursty); "a" 1x in each doc
        "text": pa.array(["z z z a", "a b"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_burstiness_top10(str(tmp_path)).to_pandas()
    assert out.tok[0] == "z"
    assert out.max_in_doc[0] == 3
    assert out.total[0] == 3
    arow = out[out.tok == "a"].iloc[0]
    assert arow.max_in_doc == 1 and arow.total == 2


def test_part_staleness_tiers(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_staleness_tiers
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64())}),
        str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        # part 1 shipped 2001-07 (hot); part 2 shipped 1998 (cold);
        # part 3 never shipped
        "l_partkey": pa.array([1, 2], pa.int64()),
        "l_shipdate": pa.array([_ts("2001-07-01"), _ts("1998-01-01")],
                               pa.timestamp("us")),
        "l_extendedprice": pa.array([10.0, 20.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = part_staleness_tiers(str(tmp_path)).to_pandas() \
        .set_index("tier")
    assert out.loc["hot"].n_parts == 1
    assert out.loc["cold"].revenue_cents == 2000
    assert out.loc["never"].n_parts == 1
