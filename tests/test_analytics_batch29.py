"""Batch 29: peak hour argmax, ABC classification, exact trimmed sum,
first-month cohorts."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_peak_hour_tiebreak(ray_session, tmp_path):
    from ctdray.pipelines.analytics import events_peak_hour_per_type
    pq.write_table(pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        # view: hours 3, 3, 5 -> peak 3; cart: hours 5, ties none
        "ts": pa.array([_ts("2024-01-01T03:00"), _ts("2024-01-01T03:30"),
                        _ts("2024-01-01T05:00"),
                        _ts("2024-01-02T05:00")], pa.timestamp("us")),
        "user_id": pa.array([0] * 4, pa.int64()),
        "event_type": pa.array(["view", "view", "view", "cart"]),
        "value": pa.array([0.0] * 4),
    }), str(tmp_path / "events.parquet"))
    out = events_peak_hour_per_type(str(tmp_path)).to_pandas() \
        .set_index("event_type")
    assert out.loc["view"].peak_hour == 3
    assert out.loc["view"].n_events == 2
    assert out.loc["cart"].peak_hour == 5


def test_abc_classes(ray_session, tmp_path):
    from ctdray.pipelines.analytics import revenue_abc_classification
    pq.write_table(pa.table({
        # revenues: 70, 20, 6, 4 -> cum shares 70%, 90%, 96%, 100%
        # A: part1 (<=80%); B: part2 (<=95%); C: parts 3,4
        "l_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_extendedprice": pa.array([70.0, 20.0, 6.0, 4.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = revenue_abc_classification(str(tmp_path)).to_pandas() \
        .set_index("abc_class")
    assert list(out.n_parts) == [1, 1, 2]
    assert list(out.revenue_cents) == [7000, 2000, 1000]


def test_trimmed_sum_boundary_dups(ray_session, tmp_path):
    from ctdray.pipelines.analytics import trimmed_price_sum
    # 20 rows, k = 1: drop one min and one max BY RANK; duplicates at
    # both boundaries exercise the partial-inclusion arithmetic
    vals = [1.0, 1.0] + [float(i) for i in range(2, 18)] + [99.0, 99.0]
    pq.write_table(pa.table({
        "l_extendedprice": pa.array(vals),
    }), str(tmp_path / "lineitem.parquet"))
    out = trimmed_price_sum(str(tmp_path)).to_pandas()
    want = int(round((sum(sorted(vals)[1:-1])) * 100))
    assert out.sum_trimmed_cents[0] == want
    assert out.n_trimmed[0] == 18 and out.k_each_side[0] == 1


def test_first_month_cohort(ray_session, tmp_path):
    from ctdray.pipelines.analytics import supplier_first_month_cohort
    pq.write_table(pa.table({
        # supp 1 first ships Jan (Jan+Mar rows); supp 2 first Feb
        "l_suppkey": pa.array([1, 1, 2], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-03-10"), _ts("1995-01-05"),
                                _ts("1995-02-20")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = supplier_first_month_cohort(str(tmp_path)).to_pandas() \
        .sort_values("cohort_month").reset_index(drop=True)
    assert list(out.n_suppliers) == [1, 1]
    assert out.cohort_month[0] == np.datetime64("1995-01-01", "us")
