"""Batch 83: discount ladder, lang length L1, cold purchasers, reorder
gaps."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_discount_ladder(ray_session, tmp_path):
    from ctdray.pipelines.analytics import discount_ladder
    pq.write_table(pa.table({
        # bracket 0 (qty<10): discounts 5,5,3 -> modal 5
        "l_quantity": pa.array([1.0, 2.0, 3.0, 15.0]),
        "l_discount": pa.array([0.05, 0.05, 0.03, 0.10]),
    }), str(tmp_path / "lineitem.parquet"))
    out = discount_ladder(str(tmp_path)).to_pandas() \
        .set_index("bracket").sort_index()
    assert out.loc[0].modal_discount_cents == 5
    assert out.loc[0].n_lines == 2
    assert out.loc[1].modal_discount_cents == 10


def test_lang_length_mix_l1(ray_session, tmp_path):
    from ctdray.pipelines.analytics import lang_length_mix_l1
    pq.write_table(pa.table({
        "doc_id": pa.array(range(2), pa.int64()),
        "text": pa.array(["xx", "yyyy"]),
        "lang": pa.array(["en", "de"]),
        # buckets: log2(2)=1 ; log2(4)=2
        "n_chars": pa.array([2, 4], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = lang_length_mix_l1(str(tmp_path)).to_pandas() \
        .set_index("lang")
    # en grid [1,0]; gl [1,1]; tg=2, tl=1 -> |2-1| + |0-1| = 2
    assert out.loc["en"].l1_num == 2.0
    assert out.loc["de"].l1_num == 2.0


def test_first_event_purchase_share(ray_session, tmp_path):
    from ctdray.pipelines.analytics import first_event_purchase_share
    rows = [(1, "purchase", "2024-01-01T00:00"),
            (1, "view", "2024-01-01T01:00"),
            (2, "view", "2024-01-01T00:00")]
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([_ts(t) for _, _e, t in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "event_type": pa.array([e for _, e, _ in rows]),
        "value": pa.array([0.0] * len(rows)),
    }), str(tmp_path / "events.parquet"))
    out = first_event_purchase_share(str(tmp_path)).to_pandas()
    assert out.n_users[0] == 2
    assert out.n_cold_purchasers[0] == 1
    assert out.cold_ppm[0] == 500_000


def test_part_reorder_gap_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_reorder_gap_hist
    # part 1 ships on days 1, 2, 6 -> gaps 1 (bucket 0), 4 (bucket 2)
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1], pa.int64()),
        "l_shipdate": pa.array([_ts("2024-01-01"), _ts("2024-01-02"),
                                _ts("2024-01-06")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = part_reorder_gap_hist(str(tmp_path)).to_pandas() \
        .set_index("bucket").sort_index()
    assert out.loc[0].n_gaps == 1
    assert out.loc[2].n_gaps == 1
