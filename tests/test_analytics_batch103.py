"""Batch 103: winnowing-style fingerprint density, first-order LTV
covariance, spend-spread histogram, prefix-dup histogram."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_fingerprint_density_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import fingerprint_density_hist
    # doc "a b c d": grams "a b c", "b c d".
    # h("a b c") = (1*97+2*32+3*98+4*32+5*99) % 97 = 1078 % 97 = 11
    # h("b c d") = (1*98+2*32+3*99+4*32+5*100) % 97 = 1087 % 97 = 20
    # gram 1 always selected; gram 2: 20 <= 11 is false -> 1/2
    # density = (1000*1//2)//100 = 5
    # doc "x" has < 3 tokens -> dropped
    pq.write_table(pa.table({
        "text": pa.array(["a b c d", "x"]),
    }), str(tmp_path / "documents.parquet"))
    out = fingerprint_density_hist(str(tmp_path)).to_pandas()
    assert out.density_decile.tolist() == [5]
    assert out.n_docs.tolist() == [1]


def test_fingerprint_density_matches_bruteforce(ray_session, tmp_path):
    from ctdray.pipelines.analytics import fingerprint_density_hist
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [" ".join(rng.choice(words, size=rng.integers(3, 40)))
             for _ in range(50)]
    pq.write_table(pa.table({"text": pa.array(texts)}),
                   str(tmp_path / "documents.parquet"))

    def brute(text, k=3, w=4, mod=97):
        toks = text.split(" ")
        grams = [" ".join(toks[i:i + k])
                 for i in range(len(toks) - k + 1)]
        h = [sum((i + 1) * ord(c) for i, c in enumerate(g)) % mod
             for g in grams]
        sel = 0
        for p in range(len(h)):
            prev = h[max(0, p - (w - 1)):p]
            if not prev or h[p] <= min(prev):
                sel += 1
        return (1000 * sel // len(h)) // 100

    import collections
    exp = collections.Counter(brute(t) for t in texts)
    out = fingerprint_density_hist(str(tmp_path)).to_pandas()
    got = dict(zip(out.density_decile, out.n_docs))
    assert got == dict(exp)


def test_first_order_ltv_cov(ray_session, tmp_path):
    from ctdray.pipelines.analytics import first_order_ltv_cov
    # cust 1: orders (day2, 300), (day1, 100) -> x=10000, y=40000
    # cust 2: order (day1, 50) -> x=5000, y=5000
    # n=2, sx=15000, sy=45000, sxy=10000*40000+5000*5000=425000000
    # cov_num = 2*425000000 - 15000*45000 = 175000000
    ts = pa.array([np.datetime64("1995-01-02", "us").item(),
                   np.datetime64("1995-01-01", "us").item(),
                   np.datetime64("1995-01-01", "us").item()],
                  pa.timestamp("us"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderkey": pa.array([11, 12, 21], pa.int64()),
        "o_orderdate": ts,
        "o_totalprice": pa.array([300.0, 100.0, 50.0]),
    }), str(tmp_path / "orders.parquet"))
    out = first_order_ltv_cov(str(tmp_path)).to_pandas()
    assert out.n_customers[0] == 2
    assert out.cov_num[0] == "175000000"


def test_first_order_ltv_cov_orderkey_tiebreak(ray_session, tmp_path):
    from ctdray.pipelines.analytics import first_order_ltv_cov
    # same date: orderkey 5 (200) is first, not orderkey 9 (100)
    ts = pa.array([np.datetime64("1995-01-01", "us").item()] * 2,
                  pa.timestamp("us"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1], pa.int64()),
        "o_orderkey": pa.array([9, 5], pa.int64()),
        "o_orderdate": ts,
        "o_totalprice": pa.array([100.0, 200.0]),
    }), str(tmp_path / "orders.parquet"))
    out = first_order_ltv_cov(str(tmp_path)).to_pandas()
    # n=1, x=20000, y=30000 -> cov = 1*6e8 - 2e4*3e4 = 0
    assert out.cov_num[0] == "0"


def test_user_spend_spread_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_spend_spread_hist
    # user 1: purchases 1.00, 4.00 -> spread (400-100)*1e6//400 =
    #   750000 -> decile 7
    # user 2: single purchase -> dropped
    # user 3: purchases 2.00, 2.00 -> spread 0 -> decile 0
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 2, 3, 3], pa.int64()),
        "event_type": pa.array(["purchase"] * 5),
        "value": pa.array([1.0, 4.0, 9.0, 2.0, 2.0]),
    }), str(tmp_path / "events.parquet"))
    out = user_spend_spread_hist(str(tmp_path)).to_pandas()
    assert out.spread_decile.tolist() == [0, 7]
    assert out.n_users.tolist() == [1, 1]


def test_doc_prefix_dup_hist(ray_session, tmp_path):
    from ctdray.pipelines.analytics import doc_prefix_dup_hist
    base = "a b c d e f g h"
    pq.write_table(pa.table({"text": pa.array([
        base + " tail one",
        base + " tail two",
        base,
        "z y x w v u t s different",
        "short doc",
    ])}), str(tmp_path / "documents.parquet"))
    out = doc_prefix_dup_hist(str(tmp_path)).to_pandas()
    # the 8-token prefix `base` appears 3x; the z-prefix once; short
    # doc dropped -> one group of size 3
    assert out.group_size.tolist() == [3]
    assert out.n_groups.tolist() == [1]
