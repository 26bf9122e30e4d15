"""Round-2 late additions: bigram counts, TF-IDF-shaped term ranking,
ROLLUP re-aggregation, HLL sketch, stratified sampling, incremental dedup.

Each operator also carries a value-exact DuckDB oracle in
``__ray_entry__.oracle_sql`` — these tests pin the semantics on tiny
hand-built inputs plus the sketch-accuracy property the SQL cannot express.
"""
import hashlib

import numpy as np
import pyarrow as pa
import pytest


def _docs(texts, langs=None):
    n = len(texts)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs or ["eng"] * n, pa.string()),
    })


def test_bigram_masking_never_crosses_documents(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import top_bigrams

    # "b c" would be a bigram only if doc boundaries leaked
    pq.write_table(_docs(["a b", "c a b", "x"]),
                   str(tmp_path / "documents.parquet"))
    out = top_bigrams(str(tmp_path)).to_pandas()
    got = dict(zip(out.bigram, out.n_occurrences))
    assert got == {"a b": 2, "c a": 1}


def test_doc_top_terms_rank_order(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import doc_top_terms

    # doc0: 'z' tf=2 beats others; 'rare' (df=1) beats 'common' (df=2) at
    # equal tf; term asc breaks the final tie.
    pq.write_table(_docs(["z z rare common", "common other words here"]),
                   str(tmp_path / "documents.parquet"))
    out = doc_top_terms(str(tmp_path), k=3).to_pandas()
    d0 = out[out.doc_id == 0].sort_values("rnk")
    assert list(d0.term) == ["z", "rare", "common"]
    assert list(d0.tf) == [2, 1, 1]
    assert list(d0.df) == [1, 1, 2]


def test_events_rollup_levels_consistent(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import events_rollup

    ts = pa.array(np.array(["2024-01-01T05:00", "2024-01-01T06:00",
                            "2024-01-02T05:00"], dtype="datetime64[us]"))
    pq.write_table(pa.table({"ts": ts,
                             "event_type": pa.array(["a", "b", "a"])}),
                   str(tmp_path / "events.parquet"))
    out = events_rollup(str(tmp_path)).to_pandas()
    total = out[(out.grp_day == "ALL") & (out.grp_type == "ALL")]
    assert list(total.n_events) == [3]
    day1 = out[(out.grp_day == "2024-01-01") & (out.grp_type == "ALL")]
    assert list(day1.n_events) == [2]
    finest = out[(out.grp_day != "ALL") & (out.grp_type != "ALL")]
    assert finest.n_events.sum() == 3 and len(finest) == 3


def test_hll_registers_and_estimate(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import (_hash60_str, daily_users_hll,
                                            hll_estimate)

    rng = np.random.default_rng(7)
    n_users = 400
    users = rng.integers(0, n_users, size=4000)
    ts = np.full(len(users), np.datetime64("2024-03-05T12:00", "us"))
    pq.write_table(pa.table({"ts": pa.array(ts),
                             "user_id": pa.array(users, pa.int64())}),
                   str(tmp_path / "events.parquet"))
    out = daily_users_hll(str(tmp_path)).to_pandas()
    # registers match a direct per-user computation
    regs = np.zeros(64, dtype=np.int64)
    for u in np.unique(users):
        h = _hash60_str(str(u))
        w = h // 64
        rho = 55 if w == 0 else (w & -w).bit_length()
        regs[h % 64] = max(regs[h % 64], rho)
    got = np.zeros(64, dtype=np.int64)
    got[out.register.to_numpy()] = out.max_rho.to_numpy()
    assert np.array_equal(got, regs)
    exact = len(np.unique(users))
    est = hll_estimate(got)
    assert abs(est - exact) / exact < 0.3   # m=64 → ~13% typical error


def test_stratified_sample_matches_hash_rank(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import docs_stratified_sample

    n = 40
    langs = ["eng" if i % 2 else "ja" for i in range(n)]
    pq.write_table(_docs([f"text {i}" for i in range(n)], langs),
                   str(tmp_path / "documents.parquet"))
    out = docs_stratified_sample(str(tmp_path), per_stratum=3).to_pandas()
    assert len(out) == 6
    for lang in ("eng", "ja"):
        ids = [i for i in range(n) if langs[i] == lang]
        want = sorted(ids, key=lambda d: (hashlib.md5(
            str(d).encode()).hexdigest(), d))[:3]
        got = list(out[out.lang == lang].sort_values("rnk").doc_id)
        assert got == want


def test_incremental_dedup_rules(ray_session):
    import ray.data as rd

    from ctdray.functions.dedup import incremental_dedup

    # snapshot rows (is_new=0): "seen" ; delta: one re-admit attempt of
    # "seen", an intra-delta dup pair, and a fresh doc
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["seen", "seen", "dup", "dup", "fresh"]),
        "is_new": pa.array([0, 1, 1, 1, 1], pa.int32()),
    })
    out = incremental_dedup(rd.from_arrow(tbl)).to_pandas()
    assert sorted(out.doc_id) == [2, 4]   # min-id dup survivor + fresh only


def test_grouped_exact_quantiles_vs_numpy(ray_session):
    import ray.data as rd

    from ctdray.functions.quantiles import grouped_exact_quantiles

    rng = np.random.default_rng(3)
    keys = rng.choice(["a", "b", "c"], size=5000)
    vals = rng.normal(100, 25, size=5000)
    tbl = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    out = grouped_exact_quantiles(rd.from_arrow(tbl), "k", "v",
                                  qs=(0.25, 0.5, 0.95),
                                  collect_cap=200).to_pandas()
    for k in ("a", "b", "c"):
        gv = np.sort(vals[keys == k])
        n = len(gv)
        for q in (0.25, 0.5, 0.95):
            want = gv[max(1, int(np.ceil(q * n))) - 1]  # quantile_disc
            got = out[(out.k == k) & (out.q == q)].value.iloc[0]
            assert got == want, (k, q)


def test_countmin_registers_and_point_query(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import (_hash60_str, countmin_point_query,
                                            token_countmin)

    texts = ["apple banana apple", "banana cherry", "apple"]
    pq.write_table(_docs(texts), str(tmp_path / "documents.parquet"))
    out = token_countmin(str(tmp_path)).to_pandas()
    # register table matches a direct computation
    want: dict = {}
    for t in " ".join(texts).split(" "):
        for d in range(4):
            key = (d, _hash60_str(f"{d}:{t}") % 256)
            want[key] = want.get(key, 0) + 1
    got = {(int(r.depth), int(r.slot)): int(r.n) for r in out.itertuples()}
    assert got == want
    # point-query guarantee: estimate >= truth, exact absent collisions
    assert countmin_point_query(out, "apple") >= 3
    assert countmin_point_query(out, "cherry") >= 1


def test_set_difference_and_pivot(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import (events_daily_pivot,
                                            viewers_not_purchasers)

    ts = pa.array(np.array(["2024-01-01T05:00"] * 5 + ["2024-01-02T05:00"],
                           dtype="datetime64[us]"))
    # u1: view only; u2: view+purchase; u3: purchase only; u4: click only
    tbl = pa.table({
        "ts": ts,
        "user_id": pa.array([1, 2, 2, 3, 4, 1], pa.int64()),
        "event_type": pa.array(["view", "view", "purchase", "purchase",
                                "click", "view"]),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = viewers_not_purchasers(str(tmp_path)).to_pandas()
    # day-1: u1 views without purchasing; u2 purchases too; day-2: u1 again
    assert sorted(out.user_id) == [1, 1]
    assert len(out[out.user_id == 1].day.unique()) == 2
    piv = events_daily_pivot(str(tmp_path)).to_pandas().set_index("day")
    assert piv.loc["2024-01-01", "n_view"] == 2
    assert piv.loc["2024-01-01", "n_purchase"] == 2
    assert piv.loc["2024-01-01", "n_click"] == 1
    assert piv.loc["2024-01-02", "n_view"] == 1
    assert piv.loc["2024-01-01", "n_error"] == 0


def test_dedup_clusters_transitive_chain(ray_session):
    import ray.data as rd

    from ctdray.functions.dedup import dedup_clusters

    # Chain A~B~C where A and C are dissimilar enough that only transitive
    # closure puts them in one cluster; D is a singleton.
    base = "w%d " * 12
    a = " ".join(f"w{i}" for i in range(12))
    b = " ".join(f"w{i}" for i in range(1, 13))      # high overlap with a
    c = " ".join(f"w{i}" for i in range(2, 14))      # high overlap with b
    d = "totally different text with nothing shared at all here now ok"
    tbl = pa.table({"doc_id": pa.array([10, 11, 12, 13], pa.int64()),
                    "text": pa.array([a, b, c, d])})
    out = (dedup_clusters(rd.from_arrow(tbl), threshold=0.5)
           .to_pandas().sort_values("doc_id"))
    assert list(out.cluster_id) == [10, 10, 10, 13]
    # both execution paths must label identically: driver_pairs_limit=0
    # forces the distributed BSP route on the same graph
    out_bsp = (dedup_clusters(rd.from_arrow(tbl), threshold=0.5,
                              driver_pairs_limit=0)
               .to_pandas().sort_values("doc_id"))
    assert list(out_bsp.cluster_id) == [10, 10, 10, 13]
    # broadcast_label_limit=0 forces the shuffle_lookup_join label attach
    # (the >limit route where labels never land on the driver) — same labels
    out_big = (dedup_clusters(rd.from_arrow(tbl), threshold=0.5,
                              driver_pairs_limit=0, broadcast_label_limit=0)
               .to_pandas().sort_values("doc_id"))
    assert list(out_big.cluster_id) == [10, 10, 10, 13]


def test_orders_cube_levels_consistent(ray_session):
    import pyarrow.parquet as pq
    import pandas as pd
    from ctdray.pipelines.analytics import orders_cube

    df = orders_cube("/root/testdata/sf0.001").to_pandas()
    total = int(df[(df.grp_year == "ALL")
                   & (df.grp_priority == "ALL")].n_orders.iloc[0])
    by_year = df[(df.grp_year != "ALL") & (df.grp_priority == "ALL")]
    by_prio = df[(df.grp_year == "ALL") & (df.grp_priority != "ALL")]
    fine = df[(df.grp_year != "ALL") & (df.grp_priority != "ALL")]
    assert by_year.n_orders.sum() == total
    assert by_prio.n_orders.sum() == total
    assert fine.n_orders.sum() == total
    assert len(df) == len(fine) + len(by_year) + len(by_prio) + 1


def test_cohort_retention_hand_case(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq
    from ctdray.pipelines.analytics import cohort_retention

    # user 1 signs up week of 2024-01-01 (Mon), active weeks 0 and 2;
    # user 2 signs up week of 2024-01-08, active week 0 only;
    # user 3 never signs up -> excluded
    rows = [
        (1, "2024-01-03", "signup"), (1, "2024-01-04", "view"),
        (1, "2024-01-17", "click"),  # week offset 2
        (2, "2024-01-09", "signup"), (2, "2024-01-10", "purchase"),
        (3, "2024-01-03", "view"),
        (1, "2023-12-25", "view"),   # active BEFORE signup week -> ignored
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    df["ts"] = pd.to_datetime(df.ts)
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["value"] = 0.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    got = cohort_retention(str(tmp_path)).to_pandas() \
        .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    assert list(got.week_offset) == [0, 2, 0]
    assert list(got.n_users) == [1, 1, 1]
    assert got.cohort_week.iloc[0] == pd.Timestamp("2024-01-01")
    assert got.cohort_week.iloc[2] == pd.Timestamp("2024-01-08")


def test_lang_char_trigrams_known_counts(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq
    from ctdray.pipelines.analytics import lang_char_trigrams

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["aaaa", "ab", "xaaax"], pa.string()),
        "lang": pa.array(["l1", "l1", "l2"], pa.string()),
        "source": pa.array(["s"] * 3), 
        "n_chars": pa.array([4, 2, 5], pa.int64()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = lang_char_trigrams(str(tmp_path)).to_pandas() \
        .sort_values(["lang", "rnk"]).reset_index(drop=True)
    l1 = got[got.lang == "l1"]
    # "aaaa" -> aaa x2; "ab" too short -> nothing
    assert list(l1.tri) == ["aaa"] and list(l1.n) == [2]
    l2 = got[got.lang == "l2"]
    # "xaaax" -> xaa, aaa, aax (each once), rank ties broken tri ASC
    assert list(l2.tri) == ["aaa", "aax", "xaa"]
    assert list(l2.n) == [1, 1, 1]


def test_user_best_event_ties_and_partials(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq
    from ctdray.pipelines.analytics import user_best_event

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 9, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n), unit="s"),
        "event_type": "view",
        # quantized values force ties -> event_id tie-break must engage
        "value": np.round(rng.normal(size=n), 1),
        "props": "{}",
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    got = user_best_event(str(tmp_path)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    exp = (df.sort_values(["value", "event_id"],
                          ascending=[False, True])
             .groupby("user_id", as_index=False).first()
             .sort_values("user_id").reset_index(drop=True))
    assert list(got.user_id) == list(exp.user_id)
    assert list(got.event_id) == list(exp.event_id)
    assert np.allclose(got.best_value, exp.value)


def test_events_json_k_stats_drops_unparseable(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq
    from ctdray.pipelines.analytics import events_json_k_stats

    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "user_id": np.zeros(4, dtype=np.int64),
        "ts": pd.to_datetime([0, 1, 2, 3], unit="s"),
        "event_type": ["a", "a", "a", "b"],
        "value": np.zeros(4),
        "props": ['{"k": 5}', '{"k": 11}', 'junk', '{"k": 2}'],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    got = events_json_k_stats(str(tmp_path)).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    assert list(got.n_events) == [2, 1]
    assert list(got.sum_k) == [16, 2]
    assert list(got.min_k) == [5, 2] and list(got.max_k) == [11, 2]


def test_frequent_token_pairs_hand_case(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq
    from ctdray.pipelines.analytics import frequent_token_pairs

    texts = ["a b c", "a c", "b a", "c a b", "a a b"]   # dup 'a a' once
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["eng"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})
    pq.write_table(docs, tmp_path / "documents.parquet")
    got = frequent_token_pairs(str(tmp_path), min_support=2).to_pandas() \
        .sort_values(["ta", "tb"]).reset_index(drop=True)
    # co-doc counts: (a,b)=4, (a,c)=3, (b,c)=2  (distinct per doc)
    assert list(zip(got.ta, got.tb, got.n)) == [
        ("a", "b", 4), ("a", "c", 3), ("b", "c", 2)]


def test_order_status_transitions_hand_case(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq
    from ctdray.pipelines.analytics import order_status_transitions

    df = pd.DataFrame({
        "o_orderkey": np.array([1, 2, 3, 4, 5, 6], dtype=np.int64),
        "o_custkey": np.array([7, 7, 7, 8, 8, 9], dtype=np.int64),
        "o_orderdate": pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-01-02",
             "2024-02-01", "2024-02-02", "2024-03-01"]),
        "o_orderstatus": ["O", "F", "P", "O", "O", "F"],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "orders.parquet")
    got = order_status_transitions(str(tmp_path)).to_pandas() \
        .sort_values(["from_status", "to_status"]).reset_index(drop=True)
    # cust 7: O->F (key 2 before 3 on tied date), F->P; cust 8: O->O
    assert list(zip(got.from_status, got.to_status, got.n)) == [
        ("F", "P", 1), ("O", "F", 1), ("O", "O", 1)]


def test_local_supplier_volume_broadcast_matches_shuffle(ray_session):
    """Q5's adaptive join: the size-probe broadcast path and the over-cap
    shuffle fallback must produce identical results (the fallback is the
    100-TB path, so it needs coverage even though the bench always takes
    the broadcast branch at test scale)."""
    import pyarrow as pa

    from ctdray.pipelines.analytics import local_supplier_volume

    sf = "/root/testdata/sf0.001"

    def collect(ds):
        return pa.concat_tables(
            ds.iter_batches(batch_format="pyarrow")).sort_by("n_name")

    bcast = collect(local_supplier_volume(sf))
    shuf = collect(local_supplier_volume(sf, broadcast_cap=0))
    assert bcast.num_rows > 0
    assert bcast.equals(shuf)


def test_repetition_stats_hand_case(ray_session):
    from ctdray.functions.text import repetition_stats_batch

    b = _docs(["a b a a c", "x", "y y", "p q r s"])
    out = repetition_stats_batch(b).to_pydict()
    assert out["n_tokens"] == [5, 1, 2, 4]
    assert out["n_distinct"] == [3, 1, 1, 4]
    assert out["top_count"] == [3, 1, 2, 1]


def test_small_qty_part_revenue_hand_case(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import small_qty_part_revenue

    # part 1 (Brand#1): qtys [1, 10, 10, 10] → sum=31 cnt=4; keep rows with
    # 5·q·4 < 31 ⟺ q ≤ 1 → only the qty-1 row ($2.00).  part 2 is another
    # brand and must not contribute even though its qty qualifies anywhere.
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#2"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "l_quantity": pa.array([1.0, 10.0, 10.0, 10.0, 1.0]),
        "l_extendedprice": pa.array([2.0, 5.0, 5.0, 5.0, 9.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = small_qty_part_revenue(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert int(out.revenue_cents.iloc[0]) == 200
    assert int(out.n_rows.iloc[0]) == 1


def test_bm25_scoring_order_and_saturation(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import bm25_top_docs

    # doc0 has 'join' twice in 4 tokens; doc1 once in 2 tokens (shorter →
    # less length penalty); doc2 has no query terms (filtered out); doc3
    # spams 'join' — saturation caps its advantage but it still ranks first.
    pq.write_table(_docs([
        "join join x y", "join z", "nothing here at all",
        "join join join join join join join join"]),
        str(tmp_path / "documents.parquet"))
    out = bm25_top_docs(str(tmp_path), terms=("join",), k=10).to_pandas()
    assert list(out.doc_id) != []
    assert 2 not in set(out.doc_id)
    assert out.score.is_monotonic_decreasing
    assert out.doc_id.iloc[0] == 3  # highest tf wins even saturated


def test_user_value_trend_known_slope(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import user_value_trend

    # user 7: y cents = [100, 200, 300] at x days = [0, 1, 2] → exact
    # slope 100 cents/day: num/den = 100.  user 8: constant → num 0.
    ts = pa.array(np.array(["2024-01-01T01:00", "2024-01-02T01:00",
                            "2024-01-03T01:00", "2024-01-01T09:00",
                            "2024-01-05T09:00"], dtype="datetime64[us]"))
    pq.write_table(pa.table({
        "user_id": pa.array([7, 7, 7, 8, 8], pa.int64()),
        "ts": ts,
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 4.0]),
    }), str(tmp_path / "events.parquet"))
    out = user_value_trend(str(tmp_path)).to_pandas().set_index("user_id")
    assert int(out.loc[7, "trend_num"]) / int(out.loc[7, "trend_den"]) == 100.0
    assert int(out.loc[8, "trend_num"]) == 0
    assert int(out.loc[7, "n_events"]) == 3


def test_normalize_batch_hand_case(ray_session):
    from ctdray.functions.text import normalize_batch

    b = _docs(["  Hello,  WORLD! 42 ", "a--b"])
    out = normalize_batch(b).to_pydict()
    assert out["text_norm"] == ["hello world 42", "ab"]
    assert out["n_chars_norm"] == [14, 2]


def test_views_purchases_full_outer_semantics(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import views_purchases_full

    ts = pa.array(np.array(["2024-01-01T05:00", "2024-01-01T06:00",
                            "2024-01-02T05:00", "2024-01-02T06:00"],
                           dtype="datetime64[us]"))
    pq.write_table(pa.table({
        "ts": ts,
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["view", "purchase", "view", "purchase"]),
    }), str(tmp_path / "events.parquet"))
    out = views_purchases_full(str(tmp_path)).to_pandas()
    out["day"] = out.day.astype("datetime64[us]").dt.day
    rows = {(r.day, r.user_id): (r.n_views, r.n_purchases)
            for r in out.itertuples()}
    # day1/user1 both sides; day2/user1 view-only; day2/user2 purchase-only
    assert rows == {(1, 1): (1, 1), (2, 1): (1, 0), (2, 2): (0, 1)}


def test_daily_revenue_moving7_gap_exact(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import daily_revenue_moving7

    # days 0, 5, 8: window at day 8 covers [2..8] → includes day 5 only
    dt = pa.array(np.array(["2024-01-01", "2024-01-06", "2024-01-09"],
                           dtype="datetime64[us]"))
    pq.write_table(pa.table({
        "o_orderdate": dt,
        "o_totalprice": pa.array([1.0, 2.0, 4.0]),
    }), str(tmp_path / "orders.parquet"))
    out = daily_revenue_moving7(str(tmp_path)).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    assert list(out.moving7_cents) == [100, 300, 600]  # [d0], [d0,d5], [d5,d8]


def test_global_event_rank_matches_lexsort(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import global_event_rank

    rng = np.random.default_rng(7)
    n = 500
    ts = (np.datetime64("2024-01-01", "us")
          + rng.integers(0, 10 * 86400 * 10**6, n).astype("timedelta64[us]"))
    # force ts collisions so the event_id tiebreak matters
    ts[100:200] = ts[0]
    eid = rng.permutation(n).astype(np.int64)
    pq.write_table(pa.table({"ts": pa.array(ts), "event_id": pa.array(eid)}),
                   str(tmp_path / "events.parquet"))
    out = global_event_rank(str(tmp_path)).to_pandas()
    order = np.lexsort((eid, ts.astype(np.int64)))
    expect = np.empty(n, np.int64)
    expect[order] = 1 + np.arange(n)
    got = out.set_index("event_id").rnk
    assert (got.loc[eid].to_numpy() == expect).all()


def test_user_top_event_type_tiebreak(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import user_top_event_type

    # user 1: 'b' ×2 beats 'a' ×1; user 2: tie 1-1 → 'a' wins (type asc)
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "b", "b", "a"]),
    }), str(tmp_path / "events.parquet"))
    out = user_top_event_type(str(tmp_path)).to_pandas() \
        .set_index("user_id")
    assert out.loc[1, "top_type"] == "b" and out.loc[1, "n"] == 2
    assert out.loc[2, "top_type"] == "a" and out.loc[2, "n"] == 1


def test_heavy_hitters_exact_with_tiny_top(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import heavy_hitter_tokens

    # per_batch_top=2 forces candidate truncation; 'x' (6) and 'y' (5)
    # are the only tokens with count >= 4
    texts = ["x x x y y z", "x x x y y y w", "q r s"]
    pq.write_table(pa.table({"text": pa.array(texts)}),
                   str(tmp_path / "documents.parquet"))
    out = heavy_hitter_tokens(str(tmp_path), threshold=4,
                              per_batch_top=2).to_pandas()
    got = dict(zip(out.token, out.n))
    assert got == {"x": 6, "y": 5}


def test_price_quartile_volumes_small(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import price_quartile_volumes

    # 8 values; quantile_disc boundaries at ranks ceil(q*8): 2nd, 4th, 6th
    vals = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0]
    pq.write_table(pa.table({"l_extendedprice": pa.array(vals)}),
                   str(tmp_path / "lineitem.parquet"))
    out = price_quartile_volumes(str(tmp_path)).to_pandas() \
        .set_index("bucket").sort_index()
    # boundaries 20/40/60 → buckets: {10,20}=0, {30,40}=1, {50,60}=2, {70,80}=3
    assert list(out.n_rows) == [2, 2, 2, 2]
    assert list(out.sum_cents) == [3000, 7000, 11000, 15000]


def test_session_duration_stats_hand_case(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import session_duration_stats

    # user 5: events at 0s, 600s, then 4000s gap → 2 sessions of
    # durations 600s and 0s
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = pa.array([base, base + np.timedelta64(600, "s"),
                   base + np.timedelta64(4600, "s")])
    pq.write_table(pa.table({
        "user_id": pa.array([5, 5, 5], pa.int64()), "ts": ts,
    }), str(tmp_path / "events.parquet"))
    out = session_duration_stats(str(tmp_path)).to_pandas() \
        .set_index("user_id")
    assert int(out.loc[5, "n_sessions"]) == 2
    assert int(out.loc[5, "total_dur_us"]) == 600 * 10**6
    assert int(out.loc[5, "longest_dur_us"]) == 600 * 10**6


def test_token_offset_packing_chunk_boundaries(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import token_offset_packing

    # token counts 3, 4, 2, 5 in doc_id order; chunk size 6:
    # starts 0, 3, 7, 9 → chunks 0, 0, 1, 1.  id_bucket=2 forces the
    # distributed prefix across two buckets.
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a b c", "d e f g", "h i", "j k l m n"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_offset_packing(str(tmp_path), chunk_tokens=6,
                               id_bucket=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out.start_tok) == [0, 3, 7, 9]
    assert list(out.chunk_id) == [0, 0, 1, 1]
    assert list(out.n_tokens) == [3, 4, 2, 5]


def test_decontaminate_counts_window_multiplicity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import decontaminate_5gram

    ev = "a b c d e f"                   # eval windows: abcde, bcdef
    clean = "z y x w v u t"
    dup = "a b c d e q a b c d e"        # window 'a b c d e' appears twice
    short = "a b"                        # < k tokens → zero windows
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 10, 11, 12], pa.int64()),
        "text": pa.array([ev, clean, dup, short]),
    }), str(tmp_path / "documents.parquet"))
    out = decontaminate_5gram(str(tmp_path), eval_ids_below=10) \
        .to_pandas().set_index("doc_id")
    assert 0 not in out.index            # eval docs excluded from output
    assert int(out.loc[10, "n_matches"]) == 0
    assert int(out.loc[11, "n_matches"]) == 2   # multiplicity counted
    assert int(out.loc[12, "n_matches"]) == 0


def test_user_outlier_events_hand_case(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import user_outlier_events

    # user 1: values [1, 1, 10] → mean 4; only 10 > 12? no (10*3=30 !> 36).
    # With k=2: 10 > 8 → outlier.  user 2: constant → none.
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "value": pa.array([1.0, 1.0, 10.0, 5.0, 5.0]),
    }), str(tmp_path / "events.parquet"))
    out3 = user_outlier_events(str(tmp_path), k_times_mean=3).to_pandas()
    assert len(out3) == 0
    out2 = user_outlier_events(str(tmp_path), k_times_mean=2).to_pandas()
    assert list(out2.event_id) == [3] and list(out2.cents) == [1000]


def test_rolling_wau_window_semantics(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import rolling_7d_active_users

    # user 1 active day 0; user 2 active day 3.  WAU(day 3) = 2 (both in
    # window), WAU(day 7) = 1 (day 0 aged out), WAU(day 9) = 1.
    ts = pa.array(np.array(["2024-01-01T10:00", "2024-01-04T10:00"],
                           dtype="datetime64[us]"))
    pq.write_table(pa.table({
        "ts": ts, "user_id": pa.array([1, 2], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = rolling_7d_active_users(str(tmp_path)).to_pandas()
    out["d"] = out.day.astype("datetime64[us]").dt.day
    got = dict(zip(out.d, out.wau))
    assert got[4] == 2          # Jan 4: both users within 7 days
    assert got[8] == 1          # Jan 8: only user 2 remains
    assert got[10] == 1 and 11 not in got  # window ends Jan 10


def test_users_per_event_type_exact_distinct(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import users_per_event_type

    # user 1 appears twice under 'view' (must count once); 3 distinct
    # viewers, 1 purchaser
    pq.write_table(pa.table({
        "event_type": pa.array(["view", "view", "view", "view", "purchase"]),
        "user_id": pa.array([1, 1, 2, 3, 1], pa.int64()),
    }), str(tmp_path / "events.parquet"))
    out = users_per_event_type(str(tmp_path)).to_pandas() \
        .set_index("event_type")
    assert int(out.loc["view", "n_users"]) == 3
    assert int(out.loc["purchase", "n_users"]) == 1


def test_token_typo_pairs_all_edit_kinds(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import token_typo_pairs

    # cat~cut (substitution), cat~cart (insertion), cat~at (deletion);
    # dog is isolated; cat~cat never pairs with itself
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["cat cut cart", "at dog cat"]),
    }), str(tmp_path / "documents.parquet"))
    out = token_typo_pairs(str(tmp_path)).to_pandas()
    got = set(zip(out.ta, out.tb))
    assert ("cat", "cut") in got
    assert ("cart", "cat") in got
    assert ("at", "cat") in got
    assert not any("dog" in p for pair in got for p in pair)
    # exactness: no distance-2 pair (cut~cart is distance 2)
    assert ("cart", "cut") not in got


def test_nation_share_ppm_sums_near_million(ray_session):
    from ctdray.pipelines.analytics import nation_revenue_share_ppm

    out = nation_revenue_share_ppm("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 25
    total = out.revenue_cents.sum()
    # floor-division shares: sum ≤ 10^6, within 25 ulps
    assert 10**6 - 25 <= out.share_ppm.sum() <= 10**6
    # exact recompute of one row
    r = out.iloc[0]
    assert r.share_ppm == r.revenue_cents * 10**6 // total


def test_region_priority_matrix_zero_fill(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import region_priority_matrix

    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int64()),
        "r_name": pa.array(["EAST", "WEST"])}),
        str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_regionkey": pa.array([0], pa.int64())}),
        str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_nationkey": pa.array([0], pa.int64())}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"])}),
        str(tmp_path / "orders.parquet"))
    out = region_priority_matrix(str(tmp_path)).to_pandas()
    # full 2×2 grid: WEST rows exist with zero counts
    assert len(out) == 4
    got = {(r.r_name, r.priority): r.n_orders for r in out.itertuples()}
    assert got[("EAST", "1-URGENT")] == 1
    assert got[("WEST", "1-URGENT")] == 0
    assert got[("WEST", "2-HIGH")] == 0


def test_selfjoin_cardinality_identity(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import selfjoin_cardinality_by_part

    # counts per key: {1: 3, 2: 1} → Σc² = 9 + 1 = 10
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 2], pa.int64())}),
        str(tmp_path / "lineitem.parquet"))
    out = selfjoin_cardinality_by_part(str(tmp_path)).to_pandas()
    assert int(out.join_rows.iloc[0]) == 10
    assert int(out.n_keys.iloc[0]) == 2


def test_source_quality_stats_sums(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import source_quality_stats

    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["the cat", "a dog runs", "xyz"]),
        "source": pa.array(["web", "web", "books"]),
    }), str(tmp_path / "documents.parquet"))
    out = source_quality_stats(str(tmp_path)).to_pandas() \
        .set_index("source")
    assert int(out.loc["web", "n_docs"]) == 2
    assert int(out.loc["web", "total_tokens"]) == 5
    assert int(out.loc["web", "total_stopwords"]) == 2   # 'the', 'a'
    assert int(out.loc["books", "total_chars"]) == 3


def test_lineitem_orphans_detects_and_zero(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import lineitem_orphans

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 9], pa.int64())}),
        str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64())}),
        str(tmp_path / "orders.parquet"))
    out = lineitem_orphans(str(tmp_path)).to_pandas()
    assert int(out.n_orphans.iloc[0]) == 1   # key 9 has no parent
    # clean case reports an explicit zero, never an empty frame
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2], pa.int64())}),
        str(tmp_path / "lineitem.parquet"))
    out0 = lineitem_orphans(str(tmp_path)).to_pandas()
    assert len(out0) == 1 and int(out0.n_orphans.iloc[0]) == 0


def test_daily_dense_spine_has_gap_days(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import daily_order_counts_dense

    dt = pa.array(np.array(["2024-01-01", "2024-01-01", "2024-01-04"],
                           dtype="datetime64[us]"))
    pq.write_table(pa.table({"o_orderdate": dt}),
                   str(tmp_path / "orders.parquet"))
    out = daily_order_counts_dense(str(tmp_path)).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    assert len(out) == 4                       # Jan 1..4 inclusive
    assert list(out.n_orders) == [2, 0, 0, 1]  # gap days zero-filled


def test_part_metrics_unpivot_shape(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import part_metrics_unpivot

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_size": pa.array([5, 9], pa.int32()),
        "p_retailprice": pa.array([1.5, 2.25]),
    }), str(tmp_path / "part.parquet"))
    out = part_metrics_unpivot(str(tmp_path)).to_pandas()
    got = {(r.p_partkey, r.metric): r.value for r in out.itertuples()}
    assert got == {(1, "size"): 5, (2, "size"): 9,
                   (1, "retail_cents"): 150, (2, "retail_cents"): 225}


def test_user_path_prefixes_order_and_truncation(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import user_path_prefixes

    ts = pa.array(np.array(["2024-01-01T01:00", "2024-01-01T02:00",
                            "2024-01-01T03:00", "2024-01-01T04:00",
                            "2024-01-02T01:00"], dtype="datetime64[us]"))
    # user 1: view>click>buy (4th event truncated); user 2: view only
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": ts,
        "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "event_type": pa.array(["view", "click", "buy", "view", "view"]),
    }), str(tmp_path / "events.parquet"))
    out = user_path_prefixes(str(tmp_path)).to_pandas()
    got = dict(zip(out.path, out.n_users))
    assert got == {"view>click>buy": 1, "view": 1}
