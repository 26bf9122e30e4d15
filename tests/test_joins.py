"""Join primitives: broadcast semi/anti/lookup + shuffle anti-join."""
import pyarrow as pa
import pytest


@pytest.fixture
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": list(range(8)),
        "text": [f"t{i}" for i in range(8)],
    }))


def test_broadcast_semi_and_anti(docs_ds):
    from ctdray.functions.joins import broadcast_anti_join, broadcast_semi_join

    kept = broadcast_semi_join(docs_ds, [1, 3, 5], "doc_id").to_pandas()
    assert sorted(kept.doc_id) == [1, 3, 5]
    dropped = broadcast_anti_join(docs_ds, [1, 3, 5], "doc_id").to_pandas()
    assert sorted(dropped.doc_id) == [0, 2, 4, 6, 7]


def test_broadcast_lookup_join(docs_ds):
    from ctdray.functions.joins import broadcast_lookup_join

    out = broadcast_lookup_join(docs_ds, {0: "a", 2: "b"}, "doc_id", "tag",
                                default="?").to_pandas()
    m = dict(zip(out.doc_id, out.tag))
    assert m[0] == "a" and m[2] == "b" and m[1] == "?"


def test_shuffle_anti_join_matches_broadcast(docs_ds, ray_session):
    import ray.data as rd

    from ctdray.functions.joins import broadcast_anti_join, shuffle_anti_join

    keys = rd.from_arrow(pa.table({"doc_id": [0, 4, 7, 99]}))
    got = shuffle_anti_join(docs_ds, keys, "doc_id").to_pandas()
    exp = broadcast_anti_join(docs_ds, [0, 4, 7, 99], "doc_id").to_pandas()
    assert sorted(got.doc_id) == sorted(exp.doc_id) == [1, 2, 3, 5, 6]
    assert sorted(got.columns) == sorted(exp.columns)


def test_minhash_shuffle_strategy_equivalent(ray_session):
    import ray.data as rd

    from ctdray.functions.dedup import minhash_lsh_dedup

    texts = ["alpha beta gamma delta epsilon zeta eta theta"] * 3 + \
            ["one two three four five six seven eight nine ten"] * 2 + \
            ["completely different words entirely unrelated content here now"]
    tbl = pa.table({"doc_id": list(range(6)), "text": texts})
    a = minhash_lsh_dedup(rd.from_arrow(tbl)).to_pandas()
    b = minhash_lsh_dedup(rd.from_arrow(tbl), anti_join="shuffle").to_pandas()
    assert sorted(a.doc_id) == sorted(b.doc_id) == [0, 3, 5]


def test_shuffle_lookup_join_inner_semantics(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ctdray.functions.joins import shuffle_lookup_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 3], pa.int64()),
        "x": pa.array(["a", "b", "c", "d"])}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([1, 2, 9], pa.int64()),
        "v": pa.array([10, 20, 90], pa.int64())}))
    out = shuffle_lookup_join(left, right, on="k", right_on="rk") \
        .to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
    # inner: k=3 dropped (no right), rk=9 dropped (no left)
    assert list(out.k) == [1, 1, 2]
    assert list(out.v) == [10, 10, 20]
    assert list(out.x) == ["a", "b", "c"]


def test_shuffle_lookup_join_left_outer_int_and_string_keys(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ctdray.functions.joins import shuffle_lookup_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 3], pa.int64()),
        "x": pa.array(["a", "b", "c", "d"])}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([1, 2, 9], pa.int64()),
        "v": pa.array([10, 20, 90], pa.int64())}))
    out = shuffle_lookup_join(left, right, on="k", right_on="rk",
                              how="left") \
        .to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
    # left outer: every left row survives; k=3 carries NULL v
    assert list(out.k) == [1, 1, 2, 3]
    assert list(out.v[:3]) == [10, 10, 20] and np.isnan(out.v[3])

    sleft = rd.from_arrow(pa.table({
        "k": pa.array(["p", "q", "r"]),
        "x": pa.array([1, 2, 3], pa.int64())}))
    sright = rd.from_arrow(pa.table({
        "k": pa.array(["p", "z"]),
        "v": pa.array([7, 9], pa.int64())}))
    sout = shuffle_lookup_join(sleft, sright, on="k", how="left") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(sout.k) == ["p", "q", "r"]
    assert sout.v[0] == 7 and np.isnan(sout.v[1]) and np.isnan(sout.v[2])


def test_bloom_filter_no_false_negatives(ray_session):
    import numpy as np

    from ctdray.pipelines.analytics import bloom_probe, build_bloom_bits

    rng = np.random.default_rng(7)
    members = rng.integers(0, 1 << 40, size=500).astype(np.int64)
    others = rng.integers(1 << 41, 1 << 42, size=5000).astype(np.int64)
    bits = build_bloom_bits(members, m_bits=1 << 17, k=5)
    assert bloom_probe(members, bits, 1 << 17, 5).all()   # zero false negatives
    fp = bloom_probe(others, bits, 1 << 17, 5).mean()
    assert fp < 0.01                                      # 16 KiB, 500 keys


def test_user_record_events_matches_pandas_cummax(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ctdray.pipelines.analytics import user_record_events

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 7, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n), unit="s"),
        "event_type": "view",
        "value": rng.normal(size=n),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    got = user_record_events(str(tmp_path)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    exp_rows = []
    for _, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        rec = g[g.value > g.value.cummax().shift(1, fill_value=-np.inf)]
        exp_rows.append(rec)
    exp = pd.concat(exp_rows).sort_values("event_id").reset_index(drop=True)
    assert list(got.event_id) == list(exp.event_id)
    assert np.allclose(got.value, exp.value)
