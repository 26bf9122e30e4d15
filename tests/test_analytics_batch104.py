"""Batch 104: nation acctbal MAD, revenue streaks, spend-halves
trend matrix, bigram order asymmetry."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_nation_acctbal_mad(ray_session, tmp_path):
    from ctdray.pipelines.analytics import nation_acctbal_mad
    # nation 0: balances 1.00, 3.00, 3.00 -> ordered-pair sum =
    #   2*(|100-300| + |100-300| + |300-300|) = 800
    pq.write_table(pa.table({
        "c_nationkey": pa.array([0, 0, 0, 1], pa.int64()),
        "c_acctbal": pa.array([1.0, 3.0, 3.0, -5.0]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["ALPHA", "BETA"]),
    }), str(tmp_path / "nation.parquet"))
    out = nation_acctbal_mad(str(tmp_path)).to_pandas() \
        .set_index("n_name")
    assert out.loc["ALPHA"].n_customers == 3
    assert out.loc["ALPHA"].mad_num == "800"
    assert out.loc["BETA"].mad_num == "0"


def test_daily_revenue_streak_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import daily_revenue_streak_hist
    # daily revenue: 10, 20, 30, 5, 7 -> streaks [3, 2]
    days = ["1995-01-01", "1995-01-02", "1995-01-03", "1995-01-05",
            "1995-01-09"]
    ts = pa.array([_ts(d) for d in days], pa.timestamp("us"))
    pq.write_table(pa.table({
        "o_orderdate": ts,
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 5.0, 7.0]),
    }), str(tmp_path / "orders.parquet"))
    out = daily_revenue_streak_hist(str(tmp_path)).to_pandas()
    assert out.streak_len.tolist() == [2, 3]
    assert out.n_streaks.tolist() == [1, 1]


def test_customer_spend_halves_matrix(ray_session, tmp_path):
    from ctdray.pipelines.analytics import customer_spend_halves_matrix
    # cust 1 (3 orders 100, 999, 200): halves compare 100 vs 200 -> up
    #   (middle order sits out)
    # cust 2 (2 orders 50, 50) -> flat; cust 3 single order -> dropped
    ts = pa.array([_ts(f"1995-01-0{d}") for d in
                   [1, 2, 3, 1, 2, 1]], pa.timestamp("us"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "o_orderkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "o_orderdate": ts,
        "o_totalprice": pa.array([100.0, 999.0, 200.0, 50.0, 50.0,
                                  10.0]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_mktsegment": pa.array(["SEG_A", "SEG_A", "SEG_B"]),
    }), str(tmp_path / "customer.parquet"))
    out = customer_spend_halves_matrix(str(tmp_path)).to_pandas()
    cells = {(r.c_mktsegment, r.trend): r.n_customers
             for r in out.itertuples()}
    assert cells == {("SEG_A", "flat"): 1, ("SEG_A", "up"): 1}


def test_bigram_asymmetry_topk(ray_session, tmp_path):
    from ctdray.pipelines.analytics import bigram_asymmetry_topk
    # "a b" x3, "b a" x1 -> pair (a,b): n_ab=3, n_ba=1, asym=2
    # "c c" self-pair excluded
    pq.write_table(pa.table({"text": pa.array([
        "a b x a b y a b",
        "b a z c c",
    ])}), str(tmp_path / "documents.parquet"))
    out = bigram_asymmetry_topk(str(tmp_path), min_support=2,
                                k=10).to_pandas()
    row = out[(out.tok_a == "a") & (out.tok_b == "b")].iloc[0]
    assert (row.n_ab, row.n_ba, row.asym) == (3, 1, 2)
    assert not ((out.tok_a == "c") & (out.tok_b == "c")).any()
