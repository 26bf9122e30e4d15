"""frequent_chunk_scrub — C4/CCNet-style cross-document boilerplate rewrite:
broadcast and shuffle paths vs a brute-force oracle, edge cases pinned."""
import pyarrow as pa
import pytest

from ctdray.functions.dedup import frequent_chunk_scrub

DOCS = [
    # "a b c" appears in 4 docs (hot at max_df=2, k=3); tails vary.
    (1, "a b c x y z tail1 tail2"),          # chunk0 hot, chunk1 kept, 2 tail
    (2, "a b c a b c q"),                    # SAME hot chunk twice + 1 tail
    (3, "p q r a b c"),                      # kept then hot, no tail
    (4, "a b c"),                            # exactly one hot chunk → ''
    (5, "x y"),                              # shorter than one chunk
    (6, "m n o p q r s"),                    # nothing hot
]


def brute(docs, k=3, max_df=2):
    from collections import Counter
    df = Counter()
    for _, t in docs:
        toks = t.split(" ")
        for c in {" ".join(toks[i * k:(i + 1) * k])
                  for i in range(len(toks) // k)}:
            df[c] += 1
    hot = {c for c, n in df.items() if n > max_df}
    out = {}
    for did, t in docs:
        toks = t.split(" ")
        nc = len(toks) // k
        kept, rm = [], 0
        for i in range(nc):
            seg = toks[i * k:(i + 1) * k]
            if " ".join(seg) in hot:
                rm += 1
            else:
                kept.extend(seg)
        kept.extend(toks[nc * k:])
        out[did] = (" ".join(kept), nc, rm)
    return out


@pytest.mark.parametrize("hot_limit", [1_000_000, 0])
def test_chunk_scrub_matches_brute(ray_session, hot_limit):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                    "text": pa.array([t for _, t in DOCS], pa.string())})
    got = frequent_chunk_scrub(rd.from_arrow(tbl), chunk_tokens=3, max_df=2,
                               broadcast_hot_limit=hot_limit).to_pandas()
    exp = brute(DOCS)
    assert len(got) == len(DOCS)
    for r in got.itertuples():
        e_text, e_nc, e_rm = exp[r.doc_id]
        assert (r.text, r.n_chunks, r.n_removed) == (e_text, e_nc, e_rm), \
            f"doc {r.doc_id}"
    # pinned edge semantics
    by_id = {r.doc_id: r for r in got.itertuples()}
    assert by_id[2].n_removed == 2          # every OCCURRENCE removed
    assert by_id[4].text == ""              # fully-hot doc → empty string
    assert by_id[5].text == "x y" and by_id[5].n_chunks == 0   # sub-chunk doc
    assert by_id[6].n_removed == 0


def test_chunk_scrub_no_hot_chunks(ray_session):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a b c d", "e f g h"], pa.string())})
    got = frequent_chunk_scrub(rd.from_arrow(tbl), chunk_tokens=2,
                               max_df=2).to_pandas().sort_values("doc_id")
    assert list(got.text) == ["a b c d", "e f g h"]
    assert list(got.n_removed) == [0, 0]
