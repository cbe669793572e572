"""Text analysis over a documents table: token counting, quality metrics,
language ID, fingerprinting.

All stages are vectorized ``map_batches`` transforms over Arrow batches;
regexes are compiled once per actor/task via module-level caching.  The
token regex is deliberately simple (``[A-Za-z0-9_]+``) so the DuckDB oracle
(`regexp_extract_all(text, '[A-Za-z0-9_]+')`) computes the identical count.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[A-Za-z0-9_]+"
PUNCT_RE = r"[.,!?;:]"

# tiny per-language stopword lists for the n-gram/stopword language heuristic
_LANG_STOPS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich"},
    "fr": {"le", "la", "et", "les", "des", "est", "pas", "que", "une", "pour"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "por", "con"},
}


def token_count_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Adds `n_tokens` (regex word count) and `n_chars` (codepoints)."""
    # count_substring_regex counts non-overlapping matches — exactly the
    # length of regexp_extract_all in DuckDB
    n_tok = pc.count_substring_regex(batch[col], TOKEN_RE)
    n_chars = pc.utf8_length(batch[col])
    out = batch.append_column("n_tokens", n_tok.cast(pa.int64()))
    return out.append_column("n_chars_m", n_chars.cast(pa.int64()))


def quality_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality metrics: token/punct/digit counts and ratios."""
    s = batch[col]
    n_chars = pc.utf8_length(s).cast(pa.int64())
    n_tok = pc.count_substring_regex(s, TOKEN_RE).cast(pa.int64())
    n_punct = pc.count_substring_regex(s, PUNCT_RE).cast(pa.int64())
    n_digit = pc.count_substring_regex(s, r"[0-9]").cast(pa.int64())
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    punct_ratio = pc.divide(n_punct.cast(pa.float64()), denom.cast(pa.float64()))
    digit_ratio = pc.divide(n_digit.cast(pa.float64()), denom.cast(pa.float64()))
    out = batch
    for name, arr in [
        ("n_chars_m", n_chars),
        ("n_tokens", n_tok),
        ("n_punct", n_punct),
        ("punct_ratio", punct_ratio),
        ("digit_ratio", digit_ratio),
    ]:
        out = out.append_column(name, arr)
    return out


class LangId:
    """Stopword + script heuristic language ID — a stateful actor stage
    (stopword value-sets built once per actor in __init__).

    Fully vectorized: words come from ONE split_pattern_regex over the
    lowered text (same token sequence as `[a-zA-Z]+` findall), the <=200-
    word window is a cumulative-count mask, and per-language hits are one
    `pc.is_in` + `np.bincount` per language — no per-row Python.  The
    scoring rule is bit-identical to the per-row heuristic the DuckDB
    oracle reconstructs: strict-> tie-break in sorted(lang) order,
    best_hits >= 1, cjk*2 >= max(1, len//8) -> zh, empty/no-words ->
    unknown."""

    MAX_WORDS = 200
    _CJK_RE = r"[一-鿿぀-ヿ가-힯]"

    def __init__(self):
        self.langs = sorted(_LANG_STOPS)
        self.stop_sets = {
            lang: pa.array(sorted(_LANG_STOPS[lang]), pa.string()) for lang in self.langs
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch["text"]
        n = batch.num_rows
        if n == 0:
            return batch.append_column("lang_pred", pa.array([], pa.string()))
        n_chars = pc.fill_null(pc.utf8_length(s), 0).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cjk = pc.fill_null(pc.count_substring_regex(s, self._CJK_RE), 0).cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)

        words = pc.split_pattern_regex(
            pc.utf8_lower(s), "[^a-z]+"
        ).combine_chunks()
        offs = words.offsets.to_numpy().astype(np.int64)
        offs = offs - offs[0]
        flat = words.flatten()
        lens = np.diff(offs)
        row_id = np.repeat(np.arange(n, dtype=np.int64), lens)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
        n_words = np.bincount(row_id[nonempty], minlength=n)
        # position of each nonempty token among its row's nonempty tokens
        cum = np.cumsum(nonempty)
        before_row = np.zeros(n, dtype=np.int64)
        has = lens > 0
        before_row[has] = cum[offs[:-1][has]] - nonempty[offs[:-1][has]]
        pos = cum - 1 - before_row[row_id]
        eligible = nonempty & (pos < self.MAX_WORDS)

        hits = np.zeros((len(self.langs), n), dtype=np.int64)
        for i, lang in enumerate(self.langs):
            inset = (
                pc.is_in(flat, value_set=self.stop_sets[lang])
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
            m = eligible & inset
            if m.any():
                hits[i] = np.bincount(row_id[m], minlength=n)

        best_idx = np.argmax(hits, axis=0)  # first max = sorted-order tie-break
        best_hits = hits[best_idx, np.arange(n)]
        labels = np.array(self.langs, dtype=object)[best_idx]
        labels[(best_hits < 1) | (n_words == 0)] = "unknown"
        labels[cjk * 2 >= np.maximum(1, n_chars // 8)] = "zh"
        is_null = pc.is_null(s).to_numpy(zero_copy_only=False).astype(bool)
        labels[is_null | (n_chars == 0)] = "unknown"
        return batch.append_column("lang_pred", pa.array(labels, type=pa.string()))


_WS_RE = re.compile(r"\s+")


def fingerprint_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Document fingerprint: md5 of whitespace-normalized, lowercased text.

    md5 (not a python hash) so the DuckDB oracle
    ``md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))`` reproduces it.
    """
    lowered = pc.utf8_lower(batch[col])
    norm = pc.replace_substring_regex(lowered, r"\s+", " ")
    fps = [
        hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
        for t in norm.to_pylist()
    ]
    return batch.append_column("fingerprint", pa.array(fps, type=pa.string()))


def winnow_fingerprints_batch(
    batch: pa.Table, col: str = "text", k: int = 3, w: int = 4
) -> pa.Table:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    public literature): per doc, the DISTINCT minima of a w-wide sliding
    window over the k-gram rolling hash sequence — the local-sampling
    fingerprint that guarantees any shared run of >= w+k-1 tokens between
    two documents shares a fingerprint.  Emits (doc_id, fp) rows.

    Gram hash = little-endian u64 of md5(gram string), md5 computed once
    per UNIQUE gram per batch; window minima via one vectorized
    sliding_window_view pass over the flat hash array (cross-doc windows
    computed then discarded — same idiom as the shingle machinery).
    Docs with < k tokens hash one gram of all their tokens; empty docs
    hash the \\x01 sentinel — so every doc has >= 1 fingerprint.  fp is
    the int64 bit-view of the u64 hash (native through Arrow/DuckDB).
    """
    from .dedup import _md5_u64, _segmented_arange, _split_tokens_arrow

    if batch.num_rows == 0:  # Ray emits empty blocks; d[first] would IndexError
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "fp": pa.array([], pa.int64())}
        )
    # the SHARED simple-lower tokenizer (not Python str.lower(), which
    # full-case-folds U+0130-class chars and diverges from the SQL
    # oracle's lower()) — see _split_tokens_arrow's docstring
    flat_toks, toffs = _split_tokens_arrow(batch[col])
    tl = flat_toks.to_pylist()
    grams_per_doc = []
    for i in range(batch.num_rows):
        toks = tl[toffs[i] : toffs[i + 1]]
        if not toks:
            grams = ["\x01"]
        elif len(toks) < k:
            grams = [" ".join(toks)]
        else:
            grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        grams_per_doc.append(grams)
    counts = np.array([len(g) for g in grams_per_doc], dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(counts)])
    flat = [g for gs in grams_per_doc for g in gs]
    uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
    h = np.array([_md5_u64(u) for u in uniq], dtype=np.uint64)[inv]

    ids = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    nw = np.where(counts >= w, counts - w + 1, 1)
    fp = np.empty(int(nw.sum()), dtype=np.uint64)
    fp_off = np.concatenate([[0], np.cumsum(nw)])

    if len(h) >= w:
        sw = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
        big = counts >= w
        if big.any():
            nwin = nw[big]
            src = np.repeat(offs[:-1][big], nwin) + _segmented_arange(nwin)
            dst = np.repeat(fp_off[:-1][big], nwin) + _segmented_arange(nwin)
            fp[dst] = sw[src]
    small = counts < w
    if small.any():
        # one window over the whole (short) doc: per-segment min
        seg_min = np.minimum.reduceat(h, offs[:-1])
        fp[fp_off[:-1][small]] = seg_min[small]

    # distinct (doc, fp) pairs, vectorized
    doc_of = np.repeat(ids, nw)
    order = np.lexsort((fp, doc_of))
    d, f = doc_of[order], fp[order]
    first = np.concatenate([[True], (d[1:] != d[:-1]) | (f[1:] != f[:-1])])
    return pa.table(
        {
            "doc_id": pa.array(d[first], pa.int64()),
            "fp": pa.array(f[first].view(np.int64), pa.int64()),
        }
    )


# PII patterns, RE2 syntax shared verbatim with the DuckDB oracle (both
# engines are RE2, so match semantics are identical by construction)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9][0-9 ]{4,}[0-9]"


def pii_scrub_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """PII redaction: emails -> <EMAIL>, IPv4 -> <IP>, +phone -> <PHONE>,
    applied in that fixed order (counts taken against the text each
    pattern actually sees, so engine and oracle agree even when patterns
    could overlap).  All Arrow RE2 kernels; replacement tokens contain no
    digits/@ so later patterns cannot match inside earlier redactions.
    Appends clean_text, n_email, n_ip, n_phone."""
    s = batch[col]
    n_email = pc.count_substring_regex(s, EMAIL_RE).cast(pa.int64())
    s1 = pc.replace_substring_regex(s, EMAIL_RE, "<EMAIL>")
    n_ip = pc.count_substring_regex(s1, IPV4_RE).cast(pa.int64())
    s2 = pc.replace_substring_regex(s1, IPV4_RE, "<IP>")
    n_phone = pc.count_substring_regex(s2, PHONE_RE).cast(pa.int64())
    s3 = pc.replace_substring_regex(s2, PHONE_RE, "<PHONE>")
    out = batch
    for name, arr in [
        ("clean_text", s3),
        ("n_email", n_email),
        ("n_ip", n_ip),
        ("n_phone", n_phone),
    ]:
        out = out.append_column(name, arr)
    return out


def repetition_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style repetition metrics per document: top2_frac_u6 = share
    of bigram slots taken by the single most frequent bigram, dup3_frac_u6
    = share of trigram slots whose trigram occurs more than once (both u6
    integers, round-even — the repo's float<->oracle convention).

    Vectorized: tokens int-coded once per batch (np.unique), n-grams are
    adjacent id tuples counted with one lexsort + run-length pass per
    order (no gram strings are ever built), per-doc max/sum via reduceat
    over doc-grouped runs.  Appends n_tok, top2_frac_u6, dup3_frac_u6."""
    from .corpus import _tokens_flat

    n = batch.num_rows
    flat, offs = _tokens_flat(batch[col])
    counts = np.diff(offs)
    if len(flat):
        _, tid = np.unique(flat, return_inverse=True)
    else:
        tid = np.zeros(0, dtype=np.int64)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], counts)

    def gram_runs(order_n: int):
        """(doc, run_count) pairs for adjacent `order_n`-gram runs (the
        shared corpus._kgram_window/_kgram_runs machinery)."""
        from .corpus import _kgram_runs, _kgram_window

        if len(flat) < order_n:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        key_of, cols = _kgram_window(tid, offs, order_n)
        if not len(key_of):
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        d, _, cnt = _kgram_runs(key_of, cols)
        return d, cnt

    def per_doc(gd, cnt, reduce_fn):
        out = np.zeros(n, dtype=np.int64)
        if len(gd):
            doc_first = np.concatenate([[True], gd[1:] != gd[:-1]])
            starts = np.nonzero(doc_first)[0]
            out[gd[doc_first]] = reduce_fn(cnt, starts)
        return out

    g2d, g2c = gram_runs(2)
    top2 = per_doc(g2d, g2c, np.maximum.reduceat)
    n2 = np.maximum(counts - 1, 0)
    g3d, g3c = gram_runs(3)
    dup3 = per_doc(g3d, np.where(g3c > 1, g3c, 0), np.add.reduceat)
    n3 = np.maximum(counts - 2, 0)

    top2_u6 = np.round(1e6 * top2 / np.maximum(n2, 1)).astype(np.int64)
    dup3_u6 = np.round(1e6 * dup3 / np.maximum(n3, 1)).astype(np.int64)
    out = batch
    for name, arr in [
        ("n_tok", pa.array(counts, pa.int64())),
        ("top2_frac_u6", pa.array(top2_u6, pa.int64())),
        ("dup3_frac_u6", pa.array(dup3_u6, pa.int64())),
    ]:
        out = out.append_column(name, arr)
    return out


def c4_quality_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """C4/Gopher-style structural quality filters per document (the rule
    family every web-corpus cleaning pass applies before model training):

    - ``mean_wlen_u6``: mean token length * 1e6 (C4 keeps ~3..10 chars)
    - ``sym_ratio_u6``: '{', '}', '#' chars per text char * 1e6 (code /
      markup boilerplate signal)
    - ``ellipsis_u6``: '...' occurrences per token * 1e6
    - ``keep``: the composite verdict (3.0 <= mean_wlen <= 10.0, symbol
      ratio < 0.01, ellipsis rate < 0.2, and >= 5 tokens)

    Vectorized end-to-end: tokens via the shared `_split_tokens_arrow`
    (one split_pattern_regex), per-doc length sums via np.add.reduceat,
    char counts via pc.count_substring(_regex); u6 integerization is
    round-even, matching the DuckDB oracle bit-for-bit."""
    from .dedup import _split_tokens_arrow

    n = batch.num_rows
    flat, offs = _split_tokens_arrow(batch[col])
    counts = np.diff(offs)
    tok_chars = np.zeros(n, dtype=np.int64)
    if len(flat):
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        nz = counts > 0
        tok_chars[nz] = np.add.reduceat(lens, offs[:-1][nz])
    n_chars = (
        pc.fill_null(pc.utf8_length(batch[col]), 0)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    syms = (
        pc.fill_null(pc.count_substring_regex(batch[col], "[{}#]"), 0)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    ellipsis = (
        pc.fill_null(pc.count_substring(batch[col], "..."), 0)
        .cast(pa.int64())
        .to_numpy(zero_copy_only=False)
    )
    mean_wlen_u6 = np.round(1e6 * tok_chars / np.maximum(counts, 1)).astype(np.int64)
    sym_u6 = np.round(1e6 * syms / np.maximum(n_chars, 1)).astype(np.int64)
    ell_u6 = np.round(1e6 * ellipsis / np.maximum(counts, 1)).astype(np.int64)
    keep = (
        (mean_wlen_u6 >= 3_000_000)
        & (mean_wlen_u6 <= 10_000_000)
        & (sym_u6 < 10_000)
        & (ell_u6 < 200_000)
        & (counts >= 5)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tok": pa.array(counts, pa.int64()),
            "mean_wlen_u6": pa.array(mean_wlen_u6, pa.int64()),
            "sym_ratio_u6": pa.array(sym_u6, pa.int64()),
            "ellipsis_u6": pa.array(ell_u6, pa.int64()),
            "keep": pa.array(keep),
        }
    )


def simhash64(tokens: "list[str]") -> int:
    """64-bit SimHash over token md5s (deterministic across processes)."""
    if not tokens:
        return 0
    v = np.zeros(64, dtype=np.int64)
    for t in tokens:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
        bits = (h >> np.arange(64)) & 1
        v += 2 * bits.astype(np.int64) - 1
    out = 0
    for i in range(64):
        if v[i] > 0:
            out |= 1 << i
    return out


STOPWORD_RE = r"\b(the|and|of|a|to|in|is|it)\b"
# GPT2-flavoured pre-tokenizer shape (contractions, letter runs, digit
# runs, punctuation runs) restricted to RE2 syntax so the DuckDB oracle
# computes the identical count
BPE_ISH_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_stats_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Stopword counts/ratio + BPE-ish token count (brief: whitespace + a
    BPE-ish regex; stopword ratio for quality scoring)."""
    s = batch[col]
    n_tok = pc.count_substring_regex(s, TOKEN_RE).cast(pa.int64())
    n_stop = pc.count_substring_regex(pc.utf8_lower(s), STOPWORD_RE).cast(pa.int64())
    n_bpe = pc.count_substring_regex(s, BPE_ISH_RE).cast(pa.int64())
    n_ws = pc.list_value_length(pc.split_pattern_regex(s, r"\s+")).cast(pa.int64())
    denom = pc.max_element_wise(n_tok, pa.scalar(1, pa.int64()))
    ratio = pc.divide(n_stop.cast(pa.float64()), denom.cast(pa.float64()))
    out = batch
    for name, arr in [
        ("n_tokens", n_tok),
        ("n_stopwords", n_stop),
        ("stop_ratio", ratio),
        ("n_tokens_bpe", n_bpe),
        ("n_tokens_ws", n_ws),
    ]:
        out = out.append_column(name, arr)
    return out


# ---------------------------------------------------------------------------
# corpus-frequency char-bigram LM proxy (the KenLM-style quality-filter shape)


def _char_bigram_codes(arr) -> "tuple[np.ndarray, np.ndarray]":
    """(bigram codes concatenated across docs, per-doc bigram counts) for
    an Arrow string array, fully vectorized over the raw UTF-8 buffers
    (the test corpora are ASCII, so byte bigrams == char bigrams — the
    property the SQL oracle relies on; non-ASCII corpora still score
    consistently, just on byte rather than codepoint pairs)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    b = arr.cast(pa.large_binary())
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    # raw buffers (this pyarrow's LargeBinaryArray has no .offsets accessor):
    # buffers = [validity, int64 offsets, data]; offsets are absolute into
    # the shared data buffer, shifted by the array's own offset
    obuf, data = b.buffers()[1], b.buffers()[2]
    offs = np.frombuffer(obuf, np.int64)[b.offset : b.offset + len(b) + 1]
    values = (
        np.frombuffer(data, np.uint8) if data is not None else np.empty(0, np.uint8)
    )
    starts, ends = offs[:-1], offs[1:]
    counts = np.maximum(ends - starts - 1, 0)
    from .dedup import _segmented_arange

    pos = np.repeat(starts, counts) + _segmented_arange(counts)
    codes = values[pos].astype(np.int32) * 256 + values[pos + 1]
    return codes, counts


def bigram_count_partial(batch: pa.Table, col: str = "text") -> pa.Table:
    """Pass 1 (train): one block's corpus-wide char-bigram counts as
    (code, n) pairs — mergeable partials, <= 65536 rows per block no
    matter the block size."""
    codes, _ = _char_bigram_codes(batch[col])
    cnt = np.bincount(codes, minlength=65536).astype(np.int64)
    nz = np.flatnonzero(cnt)
    return pa.table(
        {"code": pa.array(nz.astype(np.int32)), "n": pa.array(cnt[nz])}
    )


class BigramLmScore:
    """Pass 2 (score): instance-shipped task stage holding the broadcast
    'model' (the 65536-entry corpus count table, ~512 KB — object-store
    cached once per node).  Per doc: score = sum of the corpus counts of
    its bigrams, computed exactly in int64 via a prefix-sum gather (no
    per-doc loop).  Swapping the count table for KenLM logprobs gives the
    classic perplexity filter with the identical dataflow."""

    def __init__(self, model: np.ndarray, col: str = "text"):
        self.model = model.astype(np.int64)
        self.col = col

    def __call__(self, t: pa.Table) -> pa.Table:
        codes, counts = _char_bigram_codes(t[self.col])
        vals = self.model[codes]
        cs = np.concatenate([[0], np.cumsum(vals)])
        ends = np.cumsum(counts)
        scores = cs[ends] - cs[ends - counts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": pa.array(counts.astype(np.int64)),
                "bigram_score": pa.array(scores.astype(np.int64)),
            }
        )


def bigram_lm_scores(ds_docs, col: str = "text"):
    """Two-pass corpus LM-proxy scoring: train (distributed bigram counts,
    driver merge of <=65536-row partials) then score (broadcast model,
    stateless tasks).  100-TB shape: pass 1's shuffle-free partials are
    bounded by 65536 rows/block; the model is one ray.put-style closure
    broadcast; pass 2 streams."""
    parts = ds_docs.map_batches(
        lambda t: bigram_count_partial(t, col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    ).to_pandas()
    model = np.zeros(65536, np.int64)
    if len(parts):
        np.add.at(model, parts["code"].to_numpy(np.int32), parts["n"].to_numpy(np.int64))
    return ds_docs.map_batches(
        BigramLmScore(model, col=col), batch_format="pyarrow", zero_copy_batch=True
    )


def keyword_topk(ds, terms, k: int = 20) -> pa.Table:
    """Integer-exact keyword retrieval: per-document score = total
    non-overlapping occurrences of each query term as a substring of
    lower(text); global top-k by (score DESC, doc_id).  The lexical
    baseline of the retrieval family (the embedding side is ann_topk) —
    BM25's tf/idf weights are floats whose libm provenance can't be
    pinned across engines, so the oracle-checked contract is the raw
    integer term-frequency sum.

    Scale shape: one streaming pass; each block emits at most k thin
    (doc_id, score) rows — the driver finish sorts k x blocks rows,
    nothing wide shuffles, text never leaves the block task.
    """
    terms = [t.lower() for t in terms]

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        low = pc.utf8_lower(t["text"])
        s = np.zeros(t.num_rows, np.int64)
        for term in terms:
            s += (
                pc.count_substring(low, term)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        top = np.lexsort((ids, -s))[:k]
        return pa.table({"doc_id": pa.array(ids[top]), "score": pa.array(s[top])})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    ids = np.array([r["doc_id"] for r in parts], np.int64)
    s = np.array([r["score"] for r in parts], np.int64)
    top = np.lexsort((ids, -s))[:k]
    return pa.table({"doc_id": pa.array(ids[top]), "score": pa.array(s[top])})


def normalize_text_batch(t: pa.Table) -> pa.Table:
    """Canonical text normalization for corpus prep: lowercase, collapse
    every whitespace run to one space, trim.  All Arrow C kernels (RE2
    regex — the same engine DuckDB's regexp_replace binds, so the oracle
    is exact); null text stays null."""
    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(t["text"]), r"\s+", " "),
        " ",
    )
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "norm_text": norm,
            "n_chars": pc.fill_null(pc.utf8_length(norm), 0).cast(pa.int64()),
        }
    )


def chunk_batch(t: pa.Table, chunk_size: int = 200, step: int = 150) -> pa.Table:
    """Overlapping document chunking (the RAG / embedding-prep step):
    chunk i covers code points [i*step, i*step+chunk_size); a document
    emits ceil(len/step) chunks (none for empty/null text).  Vectorized
    as one scalar-offset slice kernel per chunk INDEX (bounded by
    max-doc-len/step, not rows), never a per-document loop."""
    lens = (
        pc.fill_null(pc.utf8_length(t["text"]), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    counts = -(-lens // step)  # ceil; 0 for empty
    out = []
    i = 0
    while (counts > i).any():
        mask = pa.array(counts > i)
        out.append(
            pa.table(
                {
                    "doc_id": t["doc_id"].filter(mask),
                    "chunk_idx": pa.array(
                        np.full(int((counts > i).sum()), i, np.int64)
                    ),
                    "chunk": pc.utf8_slice_codeunits(
                        t["text"], start=i * step, stop=i * step + chunk_size
                    ).filter(mask),
                }
            )
        )
        i += 1
    if not out:
        return pa.table(
            {
                "doc_id": pa.array([], t["doc_id"].type),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.string()),
            }
        )
    return pa.concat_tables(out, promote_options="default")


def classifier_weights(dim: int = 512, salt: str = "w") -> np.ndarray:
    """Deterministic md5-derived linear weights in [-1000, 1000] — the
    SQL-replayable stand-in for a trained fastText weight vector:
    ``w[b] = md5_u64(f"{salt}:{b}") % 2001 - 1000``."""
    from .dedup import _md5_u64

    return np.array(
        [int(_md5_u64(f"{salt}:{b}") % 2001) - 1000 for b in range(dim)],
        dtype=np.int64,
    )


class QualityClassifier:
    """fastText-style linear quality classifier as an instance-shipped
    task stage — the classifier-based corpus filter of CCNet / LLaMA-style
    data prep (Wenzek et al. 2020, arXiv:1911.00359: a linear
    bag-of-hashed-ngrams model scores every document; low scorers drop).
    The reference connector has no model-scoring stage at all
    (transforms are per-cell string ops, `transformer/README.md`); this is
    the beyond-reference scoring shape: model rides the task closure
    (object-store cached once per node, never per batch), scoring is one
    vectorized gather + segmented sum per batch.

    Features are the engine-wide token identity — the shared
    ``[a-z0-9_]+`` tokenizer hashed md5-u64 (`_token_hashes_flat`) —
    bucketed ``h % dim``; ``score = sum over tokens (with multiplicity)
    of weights[bucket]`` in exact int64; ``keep = score >= 0``.  The
    default weights are `classifier_weights` (md5-derived, so a DuckDB
    oracle replays scores bit-for-bit); swapping in real trained fastText
    weights changes nothing about the dataflow.

    100-TB shape: stateless streaming pass, text never leaves the block,
    the model is dim x 8 B in the shipped instance.  |w| <= 1000 bounds
    |score| <= 1000 * tokens(doc), so int64 is exact for any document
    under ~9e15 tokens.
    """

    def __init__(self, dim: int = 512, salt: str = "w", col: str = "text",
                 id_col: str = "doc_id", weights: "np.ndarray | None" = None):
        self.dim = np.uint64(dim)
        self.weights = (
            weights.astype(np.int64) if weights is not None
            else classifier_weights(dim, salt)
        )
        if len(self.weights) != dim:
            raise ValueError(f"weights must have dim={dim} entries")
        self.col = col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from .dedup import _token_hashes_flat

        h, offs = _token_hashes_flat(t[self.col])
        vals = self.weights[(h % self.dim).astype(np.int64)]
        cs = np.concatenate([[0], np.cumsum(vals)])
        scores = (cs[offs[1:]] - cs[offs[:-1]]).astype(np.int64)
        return pa.table(
            {
                "doc_id": t[self.id_col],
                "clf_score": pa.array(scores),
                "keep": pa.array(scores >= 0),
            }
        )
