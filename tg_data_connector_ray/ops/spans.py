"""Cross-document duplicated-SPAN detection and removal (exact, fixed
window size) — the substring-level dedup of the training-data literature
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better", public paper): whole-document dedup (ops/dedup.py) misses the
boilerplate CASE — licence headers, navigation chrome, quoted replies —
where only a SPAN of a document repeats across the corpus.  The paper
builds one giant suffix array; a suffix array does not distribute.  This
module uses the standard k-gram reformulation, which is EXACT for every
repeated run of >= k tokens (a run of L >= k shared tokens shares all
L-k+1 of its k-grams; merging adjacent duplicated windows reconstructs
the maximal span):

1. PASS A (thin sketch): ``map_batches`` over documents emits per-block
   DISTINCT ``(gh, dmin, dmax, owner)`` partials — one row per distinct
   k-token-window hash per block, carrying the block-local min/max
   doc_id and min (doc_id, pos) pack.  Window STRINGS and positions
   never enter the exchange: the shuffle is <= 32 B per distinct gram
   per block no matter how long the documents are.  A coarse-bucket
   ``grouped_arrow_aggregate`` folds the partials to a global
   ``gh -> (dmin, dmax, owner)``; a gram is cross-document duplicated
   iff ``dmin < dmax`` (exactly >= 2 distinct doc_ids).
2. The duplicated-gram index (8 B hash + 8 B owner per DUP gram only)
   is pulled to the driver under an explicit byte bound and rides to
   pass-B tasks in the task closure (broadcast once via the object
   store — the BroadcastLookup idiom).  Corpora whose dup-gram set
   exceeds the bound raise with the measured size instead of silently
   OOMing the driver; the knob is per-call.
3. PASS B re-reads documents, recomputes each doc's window hashes with
   the SAME md5-once-per-unique-gram vectorization as winnowing, tests
   them against the broadcast sorted array with one ``np.searchsorted``,
   and merges duplicated positions into maximal spans with segmented
   numpy (gaps-and-islands: a new span starts when the gap between
   consecutive duplicated positions exceeds k) — no per-window Python
   in the merge, no shuffle at all in pass B.

Window hash = little-endian u64 of md5(gram string) (`_md5_u64`), the
same SQL-replayable hash as winnow fingerprints — the DuckDB oracle
computes the identical value from ``md5(gram)`` hex, so engine and
oracle agree bit-for-bit by construction, even on (negligible) 64-bit
collisions.  Tokenization is the shared `_split_tokens_arrow` (Arrow
simple-lower + ``[a-z0-9_]+``), identical to the oracles'
``regexp_extract_all(lower(text), '[a-z0-9_]+')``.

At 100 TB: pass A's exchange carries distinct grams per block (sub-
linear in text by Heaps' law for natural corpora, ~tokens in the worst
case) at 32 B/row — around 3% of the text bytes; the dup-gram index is
proportional to the BOILERPLATE vocabulary, not the corpus (the bound
makes the assumption explicit and loud); pass B is embarrassingly
parallel.  Reference repo has no analogue (this layer is beyond
TG-Data-Connector's scope; see SURVEY.md §2 additions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _i64, _md5_u64, _split_tokens_arrow

# driver-side dup-gram index bound: 16 B per duplicated gram -> 64M dup
# grams at the default.  Explicit and per-call, same contract as
# relational.MAX_BROADCAST_BYTES.
MAX_DUP_INDEX_BYTES = 256 << 20


def _window_hashes(texts, k: int):
    """All docs' k-token-window hashes as one flat uint64 array (doc
    order, position order within doc) + per-doc window counts + the
    tokenization it came from (flat token list, per-doc offsets).

    Docs with < k tokens have no k-window and contribute 0 rows — the
    span semantics only speak about runs of >= k tokens.  md5 runs once
    per UNIQUE gram in the batch (the winnow idiom); the gram string is
    the ' '-join of the window's tokens, exactly DuckDB's
    ``array_to_string(toks[i:i+k-1], ' ')``."""
    flat_toks, toffs = _split_tokens_arrow(texts)
    tl = flat_toks.to_pylist()
    n = len(toffs) - 1
    grams_per_doc: "list[list[str]]" = []
    for i in range(n):
        toks = tl[toffs[i] : toffs[i + 1]]
        if len(toks) < k:
            grams_per_doc.append([])
        else:
            grams_per_doc.append(
                [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
            )
    counts = np.array([len(g) for g in grams_per_doc], dtype=np.int64)
    flat = [g for gs in grams_per_doc for g in gs]
    if not flat:
        return np.empty(0, np.uint64), counts, tl, toffs
    # md5 straight over every window, no md5-once-per-unique pass: unlike
    # winnow's k=3 shingles, k=8 windows rarely repeat within a block
    # (measured ~95% unique at the bench tier), so np.unique on object
    # strings costs as much as the md5 it would save
    h = np.fromiter(
        (_md5_u64(g) for g in flat), dtype=np.uint64, count=len(flat)
    )
    return h, counts, tl, toffs


def dup_gram_partials_batch(
    batch: pa.Table, col: str = "text", k: int = 8
) -> pa.Table:
    """One block's distinct-gram partial: (gh, dmin, dmax, owner) per
    distinct window hash in the block.  ``owner`` is the min pack
    ``doc_id * 2**32 + pos`` (pos 0-based within doc) — the gram's
    block-local canonical first occurrence; global min over partials is
    the global canonical occurrence.  int64 bit-views throughout so the
    values ride natively through Arrow/DuckDB."""
    empty = pa.table(
        {
            "gh": pa.array([], pa.int64()),
            "dmin": pa.array([], pa.int64()),
            "dmax": pa.array([], pa.int64()),
            "owner": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    h, counts, _, _ = _window_hashes(batch[col], k)
    if not len(h):
        return empty
    ids = _i64(batch["doc_id"])
    if ids.min() < 0 or ids.max() >= (1 << 31):
        raise ValueError("dup-span pack requires 0 <= doc_id < 2**31")
    doc_of = np.repeat(ids, counts)
    pos_of = np.arange(len(h), dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    pack = doc_of * np.int64(1 << 32) + pos_of
    order = np.lexsort((pack, h))
    hs, ds_, ps = h[order], doc_of[order], pack[order]
    first = np.concatenate([[True], hs[1:] != hs[:-1]])
    starts = np.flatnonzero(first)
    return pa.table(
        {
            "gh": pa.array(hs[starts].view(np.int64), pa.int64()),
            "dmin": pa.array(np.minimum.reduceat(ds_, starts), pa.int64()),
            "dmax": pa.array(np.maximum.reduceat(ds_, starts), pa.int64()),
            # ps is the lexsort tiebreaker: within a gh run it is sorted,
            # so the run head IS the block-local min pack
            "owner": pa.array(ps[starts], pa.int64()),
        }
    )


def dup_gram_index(
    ds,
    col: str = "text",
    k: int = 8,
    max_index_bytes: int = MAX_DUP_INDEX_BYTES,
    n_coarse: int = 64,
) -> "tuple[np.ndarray, np.ndarray]":
    """PASS A: the corpus's cross-document duplicated-gram index —
    (sorted uint64 hash array, owner pack aligned to it).  Thin partials
    -> coarse-bucket fold -> dmin<dmax filter; only DUPLICATED grams
    reach the driver, under ``max_index_bytes``."""
    from ..pipelines.relational import grouped_arrow_aggregate

    parts = ds.map_batches(
        lambda t: dup_gram_partials_batch(t, col, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = grouped_arrow_aggregate(
        parts,
        "gh",
        [("dmin", "min"), ("dmax", "max"), ("owner", "min")],
        n_coarse=n_coarse,
    )
    _empty = pa.table(
        {"gh": pa.array([], pa.int64()), "owner": pa.array([], pa.int64())}
    )

    def _dup_only(t: pa.Table) -> pa.Table:
        # grouped_arrow_aggregate yields ZERO-SCHEMA blocks for empty
        # groups (documented caveat) — emit the typed empty instead
        if "gh" not in t.column_names or t.num_rows == 0:
            return _empty
        import pyarrow.compute as pc

        return t.filter(pc.less(t["dmin"], t["dmax"])).select(["gh", "owner"])

    dup = agg.map_batches(_dup_only, batch_format="pyarrow").materialize()
    est = dup.count() * 16
    if est > max_index_bytes:
        raise ValueError(
            f"dup-gram index would be ~{est} B (> {max_index_bytes} B bound); "
            "raise max_index_bytes on a driver with headroom, or raise k — "
            "the index is proportional to the corpus's repeated boilerplate"
        )
    chunks = [
        b for b in dup.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    tbl = pa.concat_tables(chunks) if chunks else _empty
    gh = tbl["gh"].combine_chunks().to_numpy(zero_copy_only=False).view(np.uint64)
    owner = tbl["owner"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(gh)
    return gh[order], owner[order]


def _merge_spans(
    sel_doc: np.ndarray, sel_pos: np.ndarray, k: int
) -> "tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]":
    """Gaps-and-islands merge of duplicated window positions (sorted by
    (doc, pos)) into maximal spans.  Windows [p, p+k-1] and [p', p'+k-1]
    merge iff p' - p <= k (overlap or touch).  Returns per-span
    (doc, first_pos, last_pos, n_windows)."""
    if not len(sel_doc):
        z = np.empty(0, np.int64)
        return z, z, z, z
    new_span = np.concatenate(
        [[True], (sel_doc[1:] != sel_doc[:-1]) | (sel_pos[1:] - sel_pos[:-1] > k)]
    )
    starts = np.flatnonzero(new_span)
    ends = np.concatenate([starts[1:], [len(sel_doc)]]) - 1
    return sel_doc[starts], sel_pos[starts], sel_pos[ends], ends - starts + 1


class DupSpanStats:
    """PASS B scorer (instance-shipped): per doc, the merged maximal
    cross-document duplicated spans — (doc_id, n_dup_windows,
    n_dup_spans, dup_tokens, max_span_tokens).  Docs with no duplicated
    window emit nothing (thin output).  The sorted dup-hash array rides
    in the task closure, broadcast once via the object store."""

    def __init__(self, dup_sorted: np.ndarray, k: int, col: str = "text"):
        self.dup = dup_sorted
        self.k = k
        self.col = col

    _EMPTY = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_dup_windows": pa.array([], pa.int64()),
            "n_dup_spans": pa.array([], pa.int64()),
            "dup_tokens": pa.array([], pa.int64()),
            "max_span_tokens": pa.array([], pa.int64()),
        }
    )

    def _mark(self, batch: pa.Table):
        """Window hashes + (doc_of, pos_of, dup mask) for every window
        in the batch, plus the tokenization they came from."""
        h, counts, tl, toffs = _window_hashes(batch[self.col], self.k)
        ids = _i64(batch["doc_id"])
        doc_of = np.repeat(ids, counts)
        pos_of = np.arange(len(h), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        if len(self.dup) and len(h):
            idx = np.searchsorted(self.dup, h)
            idx[idx == len(self.dup)] = 0
            isdup = self.dup[idx] == h
        else:
            isdup = np.zeros(len(h), dtype=bool)
        return h, doc_of, pos_of, isdup, tl, toffs

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._EMPTY
        _, doc_of, pos_of, isdup, _, _ = self._mark(batch)
        sel_doc, sel_pos = doc_of[isdup], pos_of[isdup]
        s_doc, s_first, s_last, s_nwin = _merge_spans(sel_doc, sel_pos, self.k)
        if not len(s_doc):
            return self._EMPTY
        span_len = s_last - s_first + self.k
        dstarts = np.flatnonzero(
            np.concatenate([[True], s_doc[1:] != s_doc[:-1]])
        )
        return pa.table(
            {
                "doc_id": pa.array(s_doc[dstarts], pa.int64()),
                "n_dup_windows": pa.array(
                    np.add.reduceat(s_nwin, dstarts), pa.int64()
                ),
                "n_dup_spans": pa.array(
                    np.diff(np.append(dstarts, len(s_doc))), pa.int64()
                ),
                "dup_tokens": pa.array(
                    np.add.reduceat(span_len, dstarts), pa.int64()
                ),
                "max_span_tokens": pa.array(
                    np.maximum.reduceat(span_len, dstarts), pa.int64()
                ),
            }
        )


class DupSpanStripper(DupSpanStats):
    """PASS B remover (instance-shipped): drop every token covered by a
    REMOVABLE duplicated window — one whose gram is cross-document
    duplicated AND whose (doc_id, pos) is not the gram's global
    canonical first occurrence (min doc_id*2**32+pos).  Exactly one
    copy of each duplicated run survives (the canonical one — unless a
    DIFFERENT overlapping removable window covers its tokens, which is
    the documented tie-break).  Output: (doc_id, clean_text,
    n_removed_tokens) with clean_text the ' '-join of surviving tokens
    of the tokenized view — removal operates on tokens, original
    inter-token whitespace is not preserved (same contract as the
    paper's tokenized corpus)."""

    def __init__(self, dup_sorted, owner_pack, k, col="text"):
        super().__init__(dup_sorted, k, col)
        self.owner = owner_pack

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "clean_text": pa.array([], pa.string()),
                    "n_removed_tokens": pa.array([], pa.int64()),
                }
            )
        h, doc_of, pos_of, isdup, tl, toffs = self._mark(batch)
        if isdup.any():
            idx = np.searchsorted(self.dup, h[isdup])
            pack = doc_of[isdup] * np.int64(1 << 32) + pos_of[isdup]
            removable = self.owner[idx] != pack
        else:
            removable = np.zeros(0, dtype=bool)
        sel_doc = doc_of[isdup][removable]
        sel_pos = pos_of[isdup][removable]
        s_doc, s_first, s_last, _ = _merge_spans(sel_doc, sel_pos, self.k)

        # covered-token mask over the flat token array via the delta trick
        id_to_row = {int(d): i for i, d in enumerate(_i64(batch["doc_id"]))}
        delta = np.zeros(toffs[-1] + 1, dtype=np.int64)
        for d, f, last in zip(s_doc, s_first, s_last):
            base = toffs[id_to_row[int(d)]]
            delta[base + f] += 1
            delta[base + last + self.k] -= 1
        covered = np.cumsum(delta[:-1]) > 0
        texts, removed = [], []
        for i in range(batch.num_rows):
            lo, hi = toffs[i], toffs[i + 1]
            keep = ~covered[lo:hi]
            texts.append(" ".join(t for t, kp in zip(tl[lo:hi], keep) if kp))
            removed.append(int(hi - lo - keep.sum()))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": pa.array(texts, pa.string()),
                "n_removed_tokens": pa.array(removed, pa.int64()),
            }
        )


def dup_span_stats(
    ds, col: str = "text", k: int = 8, max_index_bytes: int = MAX_DUP_INDEX_BYTES
):
    """Cross-document duplicated-span statistics per document.  Two
    executions of ``ds`` (pass A sketch + pass B scan) — pass a bare
    read or materialize upstream pipelines, same contract as
    heavy_hitters."""
    dup, _ = dup_gram_index(ds, col, k, max_index_bytes)
    return ds.map_batches(
        DupSpanStats(dup, k, col), batch_format="pyarrow", zero_copy_batch=True
    )


def strip_dup_spans(
    ds, col: str = "text", k: int = 8, max_index_bytes: int = MAX_DUP_INDEX_BYTES
):
    """Remove all-but-the-canonical copy of every cross-document
    duplicated run of >= k tokens.  Returns (doc_id, clean_text,
    n_removed_tokens) for EVERY input doc."""
    dup, owner = dup_gram_index(ds, col, k, max_index_bytes)
    return ds.map_batches(
        DupSpanStripper(dup, owner, k, col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
