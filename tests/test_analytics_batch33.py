"""Batch 33: median quadrants, TTR, value milestone, part-name
bigrams."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_quadrants(ray_session, tmp_path):
    from ctdray.pipelines.analytics import supplier_quadrant_counts
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
        # bal medians: disc median of [10,20,30,40] = 20
        "s_acctbal": pa.array([0.10, 0.20, 0.30, 0.40]),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        # revenues: s1=4.0, s2=3.0, s3=2.0, s4=1.0 -> median disc = 2.0
        # (cents [100,200,300,400] -> median 200)
        "l_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_extendedprice": pa.array([4.0, 3.0, 2.0, 1.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = supplier_quadrant_counts(str(tmp_path)).to_pandas()
    got = dict(zip(out.quadrant, out.n_suppliers))
    # s1: bal 10<=20 low, rev 400>200 high -> lb_hr
    # s2: bal 20<=20 low, rev 300>200 high -> lb_hr
    # s3: bal 30>20 high, rev 200<=200 low -> hb_lr
    # s4: bal 40>20 high, rev 100 low -> hb_lr
    assert got == {"lb_hr": 2, "hb_lr": 2}


def test_ttr(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_ttr_ppm
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a b a b"]),
    }), str(tmp_path / "documents.parquet"))
    out = doc_ttr_ppm(str(tmp_path)).to_pandas()
    assert (out.n_tokens[0], out.n_distinct[0],
            out.ttr_ppm[0]) == (4, 2, 500_000)


def test_milestone_first_crossing(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_value_milestone
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([_ts(f"2024-01-01T0{i}:00") for i in range(4)],
                       pa.timestamp("us")),
        # u1: 60 + 50 -> crosses 100 at event 2; u2 never
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["x"] * 4),
        "value": pa.array([60.0, 50.0, 10.0, 5.0]),
    }), str(tmp_path / "events.parquet"))
    out = user_value_milestone(str(tmp_path)).to_pandas()
    assert list(out.user_id) == [1]
    assert (out.event_id[0], out.n_events_to_milestone[0],
            out.cum_cents[0]) == (2, 2, 11_000)


def test_part_bigrams(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_name_bigram_topk
    pq.write_table(pa.table({
        "p_name": pa.array(["red shiny bolt", "red shiny nut"]),
    }), str(tmp_path / "part.parquet"))
    out = part_name_bigram_topk(str(tmp_path), n=3).to_pandas()
    assert list(out.bigram)[0] == "red shiny"
    assert list(out.n)[0] == 2
