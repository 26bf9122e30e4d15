"""Text analysis kernels: tokenization counts, quality stats, language ID,
document fingerprinting.

All kernels are Arrow-vectorized (pyarrow.compute) except cryptographic
hashing, which loops over Python strings but spends its time in C (hashlib).
Each has an exact ANSI-SQL equivalent used as the DuckDB oracle in
``__ray_entry__.oracle_sql`` — integer-valued outputs throughout so the
driver's value-hash comparison is rounding-free.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Stopword list for quality scoring / language ID; mirrored verbatim in the
# SQL oracles — keep the two in sync.
STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


def _tokens(batch: pa.Table) -> pa.ChunkedArray:
    """Whitespace tokenization with single-space semantics — identical to
    DuckDB ``string_split(text, ' ')`` (empty pieces preserved)."""
    return pc.split_pattern(batch.column("text"), " ")


def token_count_batch(batch: pa.Table) -> pa.Table:
    """Whitespace token count per doc — Arrow split_whitespace +
    list_value_length, zero Python-loop."""
    toks = _tokens(batch)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
    })


def text_stats_batch(batch: pa.Table) -> pa.Table:
    """Quality-scoring components, all integers:
      n_chars            = length(text)
      n_tokens           = count of single-space-split pieces
      total_token_chars  = n_chars - (n_tokens - 1)   [single-space joins]
      stopword_count     = tokens ∈ STOPWORDS
    Downstream quality filters combine these (avg token length =
    total_token_chars/n_tokens, stopword ratio = stopword_count/n_tokens).
    """
    text = batch.column("text")
    toks = _tokens(batch)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
    flat = pc.list_flatten(toks)
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS))
    # per-row stopword count via segmented sum over parent indices
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    stop_np = is_stop.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.zeros(len(batch), dtype=np.int64)
    np.add.at(counts, parents, stop_np)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "total_token_chars": pc.subtract(n_chars, pc.subtract(n_tokens, pa.scalar(1, pa.int64()))),
        "stopword_count": pa.array(counts, pa.int64()),
    })


def md5_fingerprint(texts) -> list[str]:
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprint = md5 of the raw text (DuckDB ``md5(text)``)."""
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(md5_fingerprint(batch.column("text").to_pylist()),
                                pa.string()),
    })


def token_set_key(text: str) -> str:
    """Order/multiplicity-insensitive fingerprint: sorted unique tokens joined
    by one space (DuckDB: ``array_to_string(list_sort(list_distinct(
    string_split(text,' '))), ' ')``)."""
    return " ".join(sorted(set(text.split(" "))))


_CJK_LO, _CJK_HI = 0x3040, 0x30FF  # kana; plus unified ideographs below
_HAN_LO, _HAN_HI = 0x4E00, 0x9FFF


def langid_one(text: str) -> str:
    """N-gram-free heuristic language ID (the engine's stand-in for a fasttext
    stage; prod swaps the actor for a real model — same plumbing):
      ja      if >10% of chars are kana/ideographs,
      eng     if stopwords make up ≥20% of tokens,
      unknown otherwise.
    The eng/unknown branch is SQL-expressible and oracle-checked; the ja
    branch never fires on the ASCII testdata (unit-tested separately)."""
    if text:
        cjk = sum(1 for ch in text if _CJK_LO <= ord(ch) <= _CJK_HI
                  or _HAN_LO <= ord(ch) <= _HAN_HI)
        if cjk * 10 > len(text):
            return "ja"
    toks = text.split(" ")
    stop = sum(1 for t in toks if t in STOPWORDS)
    return "eng" if stop * 5 >= len(toks) else "unknown"


def quality_filter_batch(batch: pa.Table, min_tokens: int = 10,
                         max_tokens: int = 5000,
                         max_stopword_ratio: float = 0.5) -> pa.Table:
    """Curation filter: keep documents with a sane token count and a
    stopword ratio under the cap (the classic quality gate composed from
    :func:`text_stats_batch`'s integer components — 5·stopword_count ≤
    ... strictly, ``stopword_count·denominator`` compared in integers so the
    ratio test is rounding-free and SQL-exact)."""
    from fractions import Fraction

    stats = text_stats_batch(batch)
    n_tokens = stats.column("n_tokens").to_numpy(zero_copy_only=False)
    stop = stats.column("stopword_count").to_numpy(zero_copy_only=False)
    # stop/n_tokens <= r  ⟺  stop*denom <= num*n_tokens with integer
    # arithmetic when r is a ratio of small ints (0.5 → 2*stop <= n_tokens)
    r = Fraction(max_stopword_ratio).limit_denominator(1_000_000)
    keep = (n_tokens >= min_tokens) & (n_tokens <= max_tokens) \
        & (r.denominator * stop <= r.numerator * n_tokens)
    return batch.filter(pa.array(keep))


def deterministic_sample_batch(batch: pa.Table, rate_hex_prefix: str = "0",
                               key_col: str = "doc_id") -> pa.Table:
    """Reproducible cluster-wide sampling: keep rows whose md5(key) starts
    with ``rate_hex_prefix`` (one hex char → a 1/16 sample).  Hash-based so
    every worker, every re-run, and the SQL oracle agree exactly — the
    sampling primitive a training pipeline uses for held-out splits."""
    keys = [str(k) for k in batch.column(key_col).to_pylist()]
    mask = [hashlib.md5(k.encode()).hexdigest().startswith(rate_hex_prefix)
            for k in keys]
    return batch.filter(pa.array(mask, pa.bool_()))


_FP_K, _FP_BASE, _FP_MOD = 4, 65536, 32768


def rolling_fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Rabin–Karp-style document fingerprint (winnowing-lite, Schleimer et
    al. 2003 family): per-token 15-bit hashes (first 4 md5 hex chars mod
    2^15 — SQL-replicable), polynomial-combined over a sliding window of 4
    tokens (base 2^16 keeps every window value under 2^63), then the doc
    keeps its MINIMUM window value plus the window count.  Vectorized:
    unique-token hashing + numpy sliding windows.  Docs shorter than the
    window use one window over the available tokens."""
    from numpy.lib.stride_tricks import sliding_window_view

    ids, texts = batch.column("doc_id"), batch.column("text").to_pylist()
    cache: dict[str, int] = {}

    def th(tok: str) -> int:
        v = cache.get(tok)
        if v is None:
            v = cache[tok] = int(
                hashlib.md5(tok.encode()).hexdigest()[:4], 16) % _FP_MOD
        return v

    fp_min = np.zeros(len(texts), dtype=np.int64)
    n_windows = np.zeros(len(texts), dtype=np.int64)
    weights = _FP_BASE ** np.arange(_FP_K - 1, -1, -1, dtype=np.int64)
    for i, text in enumerate(texts):
        toks = text.split(" ")
        hs = np.fromiter((th(t) for t in toks), dtype=np.int64,
                         count=len(toks))
        if len(hs) >= _FP_K:
            ws = sliding_window_view(hs, _FP_K) @ weights
        else:
            w = _FP_BASE ** np.arange(len(hs) - 1, -1, -1, dtype=np.int64)
            ws = np.array([hs @ w], dtype=np.int64)
        fp_min[i] = ws.min()
        n_windows[i] = len(ws)
    return pa.table({"doc_id": ids,
                     "fp_min": pa.array(fp_min, pa.int64()),
                     "n_windows": pa.array(n_windows, pa.int64())})


def langid_codes(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized language ID over a text column — row-for-row identical
    to :func:`langid_one` (pinned by pytest) but built from Arrow/RE2
    kernels and one segmented numpy sum, no Python loop:

      ja      count_substring_regex over the kana/ideograph ranges,
              compared against utf8_length (the >10%-of-chars vote)
      eng     split on single spaces (empties preserved, matching
              ``str.split(' ')``), stopword membership via ``is_in``,
              per-doc sums via np.add.at on list_parent_indices
      unknown otherwise
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
    cjk = pc.count_substring_regex(
        texts, pattern=("[\\x{%04X}-\\x{%04X}\\x{%04X}-\\x{%04X}]"
                        % (_CJK_LO, _CJK_HI, _HAN_LO, _HAN_HI))
    ).to_numpy(zero_copy_only=False)
    toks = pc.split_pattern(texts, " ")
    n_toks = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    stops = np.zeros(len(texts), dtype=np.int64)
    np.add.at(stops, parents, is_stop)
    ja = cjk * 10 > n_chars
    eng = stops * 5 >= n_toks
    out = np.where(ja, "ja", np.where(eng, "eng", "unknown"))
    return pa.array(out.tolist(), pa.string())


def langid_batch(batch: pa.Table) -> pa.Table:
    """Language-ID per doc: charset + stopword-ratio heuristic (see
    langid_one) — the fasttext-stage stand-in with identical plumbing."""
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "lang_pred": langid_codes(batch.column("text")),
    })


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021, table A1), all
    integers so the SQL oracle hashes exactly:
      n_tokens    = total tokens
      n_distinct  = distinct tokens
      top_count   = occurrences of the most frequent token
    Downstream filters threshold top_count/n_tokens (mode-token fraction)
    and n_distinct/n_tokens (type-token ratio).  Fully vectorized: one
    Arrow explode + (doc, token) group_by per batch, then segmented
    max/count in numpy — no Python loop over docs or tokens."""
    toks = _tokens(batch)
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
    parents = pc.list_parent_indices(toks)
    pairs = pa.table({"i": parents, "tok": pc.list_flatten(toks)})
    per_tok = pairs.group_by(["i", "tok"]).aggregate([("tok", "count")])
    i = per_tok.column("i").to_numpy(zero_copy_only=False)
    c = per_tok.column("tok_count").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_distinct = np.zeros(len(batch), dtype=np.int64)
    top_count = np.zeros(len(batch), dtype=np.int64)
    np.add.at(n_distinct, i, 1)
    np.maximum.at(top_count, i, c)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": n_tokens,
        "n_distinct": pa.array(n_distinct),
        "top_count": pa.array(top_count),
    })


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Canonical text normalization for training corpora: lowercase,
    strip non-[a-z0-9 ] chars, collapse space runs, trim.  All Arrow RE2
    kernels — zero Python per row; the DuckDB oracle uses the same RE2
    patterns so outputs hash identically."""
    low = pc.utf8_lower(batch.column("text"))
    s = pc.replace_substring_regex(low, "[^a-z0-9 ]", "")
    s = pc.replace_substring_regex(s, " +", " ")
    s = pc.utf8_trim(s, " ")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text_norm": s,
        "n_chars_norm": pc.cast(pc.utf8_length(s), pa.int64()),
    })


_BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """GPT-2-style pre-tokenizer count: runs of letters, runs of digits,
    and runs of other non-space symbols each count as one token (the
    regex split BPE applies before merges).  One Arrow RE2 kernel per
    batch (``count_substring_regex``); the DuckDB oracle uses the same
    RE2 pattern via ``regexp_extract_all``."""
    n = pc.count_substring_regex(batch.column("text"), _BPE_PATTERN)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_bpe_tokens": pc.cast(n, pa.int64()),
    })


_SCRUB_PATTERN = r"\b(customer|spark|secret)\b"
_SCRUB_TOKEN = "<SCRUBBED>"


def blocklist_scrub_batch(batch: pa.Table) -> pa.Table:
    """Blocklist term scrubbing (the PII-redaction shape on this
    synthetic corpus): every word-bounded blocklist hit is replaced with
    a sentinel and counted.  Two Arrow RE2 kernels per batch
    (``count_substring_regex`` + ``replace_substring_regex``), zero
    Python per row; DuckDB's regexp functions are RE2 too, so the oracle
    (``regexp_replace(..., 'g')`` / ``regexp_extract_all``) hashes
    identically."""
    txt = batch.column("text")
    n = pc.count_substring_regex(txt, _SCRUB_PATTERN)
    scrubbed = pc.replace_substring_regex(txt, _SCRUB_PATTERN, _SCRUB_TOKEN)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text_scrubbed": scrubbed,
        "n_scrubbed": pc.cast(n, pa.int64()),
    })
