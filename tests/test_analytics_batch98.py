"""Batch 98: part-name token-set duplicates, co-order edge-weight
histogram, order/ship month matrix, customer quarter density."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_part_name_token_set_dups(ray_session, tmp_path):
    from ctdray.pipelines.analytics import part_name_token_set_dups
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_name": pa.array(["green steel small", "small green steel",
                            "red brass"]),
    }), str(tmp_path / "part.parquet"))
    out = part_name_token_set_dups(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out.token_set_key[0] == "green small steel"
    assert out.n_parts[0] == 2


def test_coorder_edge_weight_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import coorder_edge_weight_hist
    # (1,2) co-occur in orders 1 and 2 -> weight 2
    # (1,3) only in order 1 -> weight 1; (2,3) only in order 1 -> 1
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([1, 2, 3, 1, 2], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    out = coorder_edge_weight_hist(str(tmp_path)).to_pandas() \
        .set_index("weight")
    assert out.loc[1].n_edges == 2
    assert out.loc[2].n_edges == 1


def test_order_ship_month_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import order_ship_month_matrix
    # order 1 (Jan): first ship Feb (lines Feb, Mar)
    # order 2 (Jan): first ship Jan
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("2024-01-05"), _ts("2024-01-20")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_shipdate": pa.array([_ts("2024-03-01"), _ts("2024-02-10"),
                                _ts("2024-01-25")], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = order_ship_month_matrix(str(tmp_path)).to_pandas()
    rows = {(str(r.order_month)[:7], str(r.ship_month)[:7]): r.n_orders
            for r in out.itertuples()}
    assert rows == {("2024-01", "2024-02"): 1, ("2024-01", "2024-01"): 1}


def test_customer_quarter_density_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_quarter_density_hist
    # cust 1: Q1 and Q3 2024 -> active 2 / span 3 -> 666666 -> dec 6
    # cust 2: Q1 only -> 1000000 -> dec 10
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderdate": pa.array([_ts("2024-02-01"), _ts("2024-08-01"),
                                 _ts("2024-01-15")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    out = customer_quarter_density_hist(str(tmp_path)).to_pandas() \
        .set_index("density_decile")
    assert out.loc[6].n_customers == 1
    assert out.loc[10].n_customers == 1
