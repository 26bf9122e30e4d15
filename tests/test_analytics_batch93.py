"""Batch 93: monthly new-customer revenue share, orderkey range
partition plan, part margin-below-retail audit, second-order velocity."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_monthly_new_customer_revenue_share(ray_session, tmp_path):
    from ctdray.pipelines.analytics import (
        monthly_new_customer_revenue_share)
    # cust 1: Jan 100c (new), Feb 200c (repeat)
    # cust 2: Feb 300c (new)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("2024-01-05"), _ts("2024-02-05"),
                                 _ts("2024-02-10")], pa.timestamp("us")),
        "o_totalprice": pa.array([1.0, 2.0, 3.0]),
    }), str(tmp_path / "orders.parquet"))
    out = monthly_new_customer_revenue_share(str(tmp_path)).to_pandas()
    jan, feb = out.iloc[0], out.iloc[1]
    assert jan.new_cents == 100 and jan.repeat_cents == 0
    assert jan.new_share_ppm == 1_000_000
    assert feb.new_cents == 300 and feb.repeat_cents == 200
    assert feb.new_share_ppm == 600_000


def test_orderkey_range_partition_plan(ray_session, tmp_path):
    from ctdray.pipelines.analytics import orderkey_range_partition_plan
    # keys 1..16 into 4 partitions -> boundaries 4, 8, 12; 4 rows each
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(1, 17), pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = orderkey_range_partition_plan(str(tmp_path),
                                        n_partitions=4).to_pandas()
    assert list(out.bucket_id) == [1, 2, 3, 4]
    assert list(out.upper_key) == [4, 8, 12, 16]
    assert list(out.n_rows) == [4, 4, 4, 4]


def test_part_margin_below_retail(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_margin_below_retail
    # brand B1 part 1 retail 200c: line unit 150 (below), line unit 250
    # brand B2 part 2 retail 100c: line unit 100 (not below)
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["B1", "B2"]),
        "p_retailprice": pa.array([2.0, 1.0]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([3.0, 5.0, 2.0]),
        "l_quantity": pa.array([2.0, 2.0, 2.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = part_margin_below_retail(str(tmp_path)).to_pandas() \
        .set_index("p_brand")
    assert out.loc["B1"].n_lines == 2
    assert out.loc["B1"].n_below == 1
    assert out.loc["B1"].below_ppm == 500_000
    assert out.loc["B2"].n_below == 0


def test_second_order_within30_ppm(ray_session, tmp_path):
    from ctdray.pipelines.analytics import second_order_within30_ppm
    # cust 1: orders 10 days apart -> within; cust 2: 60 days -> not;
    # cust 3: single order -> excluded
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "o_orderdate": pa.array(
            [_ts("2024-01-01"), _ts("2024-01-11"), _ts("2024-01-01"),
             _ts("2024-03-01"), _ts("2024-01-01")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = second_order_within30_ppm(str(tmp_path)).to_pandas()
    assert out.n_multi[0] == 2
    assert out.n_within[0] == 1
    assert out.within_ppm[0] == 500_000
