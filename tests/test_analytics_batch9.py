"""Q3 top-k revenue join, Q4-style late-ship EXISTS, LAG-window event
throttle, and blocklist scrubbing — tiny hand-built inputs pin the exact
semantics the DuckDB oracles verify at driver scale."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(s):
    return np.datetime64(s, "us").item()


def test_q3_shipping_priority_revenue_and_order(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q3_shipping_priority
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_mktsegment": pa.array(["BUILDING", "AUTOMOBILE"]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        # order 11 is past the cutoff -> excluded; 12 wrong segment
        "o_orderdate": pa.array([_ts("1995-01-01"), _ts("1995-04-01"),
                                 _ts("1995-01-01")], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 11, 12], pa.int64()),
        "l_extendedprice": pa.array([10.0, 20.0, 5.0, 7.0]),
        "l_discount": pa.array([0.10, 0.0, 0.0, 0.0]),
        # first line shipped before the cutoff -> its revenue is excluded
        "l_shipdate": pa.array([_ts("1995-01-02"), _ts("1995-06-01"),
                                _ts("1995-06-01"), _ts("1995-06-01")],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = q3_shipping_priority(str(tmp_path)).to_pandas()
    assert list(out.l_orderkey) == [10]
    # 20.00 at 0% discount = 2000 cents * 100
    assert list(out.revenue_cp) == [200000]
    assert list(out.o_orderpriority) == ["1-URGENT"]


def test_late_ship_priority_counts_exists_semantics(ray_session, tmp_path):
    from ctdray.pipelines.analytics import late_ship_priority_counts
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([_ts("1995-01-01")] * 3, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "2-HIGH"]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # order 1: one on-time + one late line (EXISTS -> counted once)
        # order 2: exactly at the 90-day boundary (not > ) -> not late
        # order 3: late
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-01-15"), _ts("1995-06-01"),
                                _ts("1995-04-01"), _ts("1995-12-31")],
                               pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    out = late_ship_priority_counts(str(tmp_path)).to_pandas()
    got = dict(zip(out.o_orderpriority, out.n_late_orders))
    assert got == {"1-URGENT": 1, "2-HIGH": 1}


def test_event_dedup_60s_lag_not_chain(ray_session, tmp_path):
    from ctdray.pipelines.analytics import event_dedup_60s
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        # e2 30s after e1 (same type) -> dropped; e3 30s after e2 but
        # LAG vs raw previous row (e2) -> dropped too (NOT the greedy
        # chain, which would keep e3 at 60s after the kept e1);
        # e4 is another type -> kept; e5 70s after e3 -> kept
        "ts": pa.array([_ts("2024-01-01T00:00:00"),
                        _ts("2024-01-01T00:00:30"),
                        _ts("2024-01-01T00:01:00"),
                        _ts("2024-01-01T00:01:01"),
                        _ts("2024-01-01T00:02:10")], pa.timestamp("us")),
        "user_id": pa.array([7] * 5, pa.int64()),
        "event_type": pa.array(["view", "view", "view", "click", "view"]),
    }), str(tmp_path / "events.parquet"))
    out = event_dedup_60s(str(tmp_path)).to_pandas()
    assert sorted(out.event_id) == [1, 4, 5]


def test_blocklist_scrub_word_boundaries(ray_session):
    from ctdray.functions.text import blocklist_scrub_batch
    out = blocklist_scrub_batch(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["customer spark customers sparkle",
                          "no hits here"]),
    }))
    assert out.column("text_scrubbed").to_pylist() == [
        "<SCRUBBED> <SCRUBBED> customers sparkle", "no hits here"]
    assert out.column("n_scrubbed").to_pylist() == [2, 0]


def test_user_value_quartiles_ntile_semantics(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_value_quartiles
    # 6 rows, k=4 -> NTILE sizes [2,2,1,1] (first n%k buckets get the
    # extra row); ranked by (value, event_id)
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([9] * 6, pa.int64()),
        "value": pa.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0]),
    }), str(tmp_path / "events.parquet"))
    out = user_value_quartiles(str(tmp_path)).to_pandas() \
        .sort_values("event_id")
    assert list(out.quartile) == [1, 1, 2, 2, 3, 4]


def test_user_value_quartiles_fewer_rows_than_buckets(ray_session, tmp_path):
    from ctdray.pipelines.analytics import user_value_quartiles
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([9, 9], pa.int64()),
        "value": pa.array([5.0, 1.0]),
    }), str(tmp_path / "events.parquet"))
    out = user_value_quartiles(str(tmp_path)).to_pandas() \
        .sort_values("event_id")
    # rank order is by value: event 2 (value 1.0) is bucket 1
    assert list(out.quartile) == [2, 1]


def test_major_parts_threshold_is_strict(ray_session, tmp_path):
    from ctdray.pipelines.analytics import major_parts_by_revenue
    # part 1: 900.00, part 2: 100.00 -> shares 900000 / 100000 ppm
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2], pa.int64()),
        "l_extendedprice": pa.array([900.0, 100.0]),
        "l_discount": pa.array([0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = major_parts_by_revenue(str(tmp_path),
                                 threshold_ppm=100_000).to_pandas()
    assert list(out.l_partkey) == [1]      # part 2 == threshold -> excluded
    assert list(out.revenue_cp) == [9_000_000]


def test_embedding_norm_stats_exact_integers(ray_session, tmp_path):
    from ctdray.pipelines.analytics import embedding_norm_stats_by_label
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.5, -0.5], [1.0, 0.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([3, 3], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = embedding_norm_stats_by_label(str(tmp_path)).to_pandas()
    assert list(out.label) == [3]
    assert list(out.n_vectors) == [2]
    # norms: 5000^2*2 = 50e6 ; 10000^2 = 100e6
    assert list(out.norm2_min) == [50_000_000]
    assert list(out.norm2_max) == [100_000_000]
    assert list(out.norm2_sum) == [150_000_000]


def test_idle_customers_counts_only_orderless(ray_session, tmp_path):
    from ctdray.pipelines.analytics import idle_customers_by_nation
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["ALGERIA", "BRAZIL"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([0, 0, 1], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    out = idle_customers_by_nation(str(tmp_path)).to_pandas()
    got = dict(zip(out.n_name, out.n_idle_customers))
    assert got == {"ALGERIA": 1, "BRAZIL": 1}


def test_event_type_jaccard_exact_counts(ray_session, tmp_path):
    from ctdray.pipelines.analytics import event_type_jaccard
    # users: 1 {a,b}, 2 {a}, 3 {a,b}, 4 {c} -> (a,b): 2/3; c co-occurs
    # with nothing so no (a,c)/(b,c) rows (matches the inner-join oracle)
    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 3, 3, 4], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "a", "a", "b", "c"]),
    }), str(tmp_path / "events.parquet"))
    out = event_type_jaccard(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.type_a, r.type_b, r.n_a, r.n_b, r.n_both) == ("a", "b", 3, 2, 2)
    assert r.jaccard_ppm == 2 * 1_000_000 // 3


def test_q19_disjunction_boundaries(ray_session, tmp_path):
    from ctdray.pipelines.analytics import q19_disjunctive_revenue
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#2", "Brand#9"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        # B1 qty 10 -> in; B1 qty 11 -> out; B2 qty 10 -> in (overlap
        # boundary belongs to both clauses); B9 any -> out
        "l_partkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_quantity": pa.array([10.0, 11.0, 10.0, 5.0]),
        "l_extendedprice": pa.array([100.0, 100.0, 50.0, 70.0]),
        "l_discount": pa.array([0.0, 0.0, 0.10, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = q19_disjunctive_revenue(str(tmp_path)).to_pandas()
    assert out.n_lines[0] == 2
    assert out.revenue_cp[0] == 100_00 * 100 + 50_00 * 90


def test_docs_with_hapax_finds_unique_token_owners(ray_session, tmp_path):
    from ctdray.pipelines.analytics import docs_with_hapax
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["common words here xylophone",
                          "common words here",
                          "common zebra zebra"]),   # in-doc repeat is
    }), str(tmp_path / "documents.parquet"))       # still corpus-unique
    out = docs_with_hapax(str(tmp_path)).to_pandas()
    assert sorted(out.doc_id) == [0, 2]


def test_doc_length_deciles_matches_ntile(ray_session, tmp_path):
    import duckdb
    from ctdray.pipelines.analytics import doc_length_deciles
    n = 23
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "n_chars": pa.array([(7 * i) % 5 + 100 * (i % 3) for i in range(n)],
                            pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = doc_length_deciles(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT doc_id, CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) "
        "AS BIGINT) AS decile FROM tbl ORDER BY doc_id").df()
    assert list(out.decile) == list(exp.decile)


def test_docs_weighted_sample_monotone_in_weight(ray_session, tmp_path):
    import hashlib
    from ctdray.pipelines.analytics import docs_weighted_sample
    n = 200
    chars = [(i * 37) % 997 + 1 for i in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "n_chars": pa.array(chars, pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = docs_weighted_sample(str(tmp_path)).to_pandas()
    kept = set(out.doc_id)
    mx = max(chars)
    for d in range(n):
        h = int(hashlib.md5(str(d).encode()).hexdigest()[:12], 16)
        assert (d in kept) == (h * mx < chars[d] << 48)
    # the max-weight doc keeps with probability ~1 (h < 2^48 always)
    assert chars.index(mx) in kept
