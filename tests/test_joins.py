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
