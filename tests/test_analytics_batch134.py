"""Batch 134: B+tree bulk-load plan, external-sort pass plan,
multi-pattern match census, secretary-rule audit."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_btree_bulkload_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import btree_bulkload_plan
    # counts: k1x3 k2x2 k3x5 k4x1 -> starts [0,3,5,10], leaf_cap 4:
    # 3 leaves, interior starts 3/5/10 hit leaves 0/1/2 -> all mixed
    keys = [1] * 3 + [2] * 2 + [3] * 5 + [4]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(keys, pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = btree_bulkload_plan(str(tmp_path), leaf_cap=4,
                              fanout=2).to_pandas()
    assert list(map(tuple, out.values)) == [(11, 4, 3, 3, 0, 2, 2, 3)]


def test_external_sort_pass_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import external_sort_pass_plan
    flags = ["A"] * 5 + ["B"] * 2 + ["C"]
    pq.write_table(pa.table({
        "l_returnflag": pa.array(flags),
    }), str(tmp_path / "lineitem.parquet"))
    out = external_sort_pass_plan(str(tmp_path), run_rows=2,
                                  fan_in=2).to_pandas()
    # A: 3 runs -> 2 -> 1 (2 passes, io 15); B/C: 1 run, 0 passes
    assert list(map(tuple, out.values)) == [
        ("A", 5, 3, 2, 15), ("B", 2, 1, 0, 2), ("C", 1, 1, 0, 1)]


def test_multi_pattern_match_census(ray_session, tmp_path):
    from ctdray.pipelines.analytics import multi_pattern_match_census
    pq.write_table(pa.table({
        "lang": pa.array(["en", "en", "fr"]),
        "text": pa.array(["the cat and the dog", "nothing here",
                          "ingestion station"]),
    }), str(tmp_path / "documents.parquet"))
    out = multi_pattern_match_census(str(tmp_path)).to_pandas()
    got = sorted(map(tuple, out.values))
    assert got == sorted([
        ("en", "the", 2, 1), ("en", "and", 1, 1),
        ("en", "tion", 0, 0), ("en", "ing", 1, 1),
        ("fr", "the", 0, 0), ("fr", "and", 0, 0),
        ("fr", "tion", 2, 1), ("fr", "ing", 1, 1)])


def test_secretary_rule_audit(ray_session, tmp_path):
    from ctdray.pipelines.analytics import secretary_rule_audit
    # Jan md5 arrival: 05,03,06,04,02,01; k=2 observes 10,50 then
    # 20(no) 60(pick rank4, true max).  Feb arrival: 02,03,01; k=1
    # observes 90, nothing beats it -> fallthrough rank3, not max.
    jan = {"05": 10.0, "03": 50.0, "06": 20.0, "04": 60.0,
           "02": 30.0, "01": 40.0}
    feb = {"02": 90.0, "03": 20.0, "01": 30.0}
    dates, prices = [], []
    for d, v in jan.items():
        dates.append(_ts(f"2024-01-{d}T00:00"))
        prices.append(v)
    for d, v in feb.items():
        dates.append(_ts(f"2024-02-{d}T00:00"))
        prices.append(v)
    pq.write_table(pa.table({
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
        "o_totalprice": pa.array(prices),
    }), str(tmp_path / "orders.parquet"))
    out = secretary_rule_audit(str(tmp_path)).to_pandas()
    assert list(map(tuple, out.values)) == [
        ("2024-01", 6, 2, 4, 1, 1), ("2024-02", 3, 1, 3, 0, 0)]
