"""Deterministic synthetic fixtures per FIXTURES.md (F1-F6).

The reference repo ships zero tests (SURVEY.md §5), so conformance runs
against these seeded generators.  Key property: the CDC event log is
generated *backwards from the final table* — replaying the log from empty
state, applying events per ``(conv_id, turn_idx)`` in increasing ``lsn``
(I = full-row insert/replace, U = set non-null columns, D = delete;
duplicate LSNs applied once), converges EXACTLY to the ``transcripts``
table.  That makes the base table itself the golden answer, independent of
any reducer implementation; ``golden.py`` provides a second, deliberately
naive oracle.

Everything is vectorized numpy + arrow; no wall-clock, no process-salted
hashing; seed defaults to 42.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# 2026-01-01T00:00:00Z in microseconds since epoch (fixed, no wall clock).
BASE_TS_US = 1_767_225_600_000_000

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

CDC_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_TOOLS = np.array(["search", "code", "browse"])

# Corpus word bank: includes unicode (CJK + emoji), CSV-hostile tokens
# (embedded newline, comma, double-quote) and the literal nullFormat
# sentinel \N, per FIXTURES.md F1.
_WORD_BANK = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
    "consequat duis aute irure reprehenderit voluptate velit esse cillum "
    "fugiat nulla pariatur excepteur sint occaecat cupidatat non proident "
    "sunt culpa qui officia deserunt mollit anim id est laborum "
    "数据 流式 处理 引擎 对话 轮次 🙂 🚀 émigré naïve Ω≈ç "
    'comma, "quoted" new\nline \\N tab\tend '
).split(" ")


def _make_corpus(rng: np.random.Generator, n_words: int = 60_000) -> str:
    idx = rng.integers(0, len(_WORD_BANK), size=n_words)
    return " ".join(_WORD_BANK[i] for i in idx)


def _slice_texts(
    corpus: str, rng: np.random.Generator, n: int, mean_chars: int = 200
) -> list:
    """n random corpus slices; lognormal char lengths, 1% empty, 0.1% huge."""
    clen = len(corpus)
    lengths = np.exp(rng.normal(np.log(mean_chars), 0.9, size=n)).astype(np.int64)
    lengths = np.clip(lengths, 1, 32_768)
    lengths[rng.random(n) < 0.01] = 0  # empty strings
    big = rng.random(n) < 0.001
    lengths[big] = rng.integers(20_000, 32_768, size=int(big.sum()))
    offs = rng.integers(0, max(1, clen - 33_000), size=n)
    return [corpus[o : o + l] for o, l in zip(offs.tolist(), lengths.tolist())]


def _segmented_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] without a Python loop."""
    total = int(counts.sum())
    ends = np.cumsum(counts)
    starts = ends - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


@dataclass
class FixtureSpec:
    n_convs: int = 200
    seed: int = 42
    n_files: int = 8
    # fraction of final keys that get a delete-then-reinsert history
    resurrect_frac: float = 0.02
    # extra keys (per conv, appended turns) that end deleted
    delete_key_frac: float = 0.08
    dup_frac: float = 0.01  # exact duplicate LSNs re-delivered
    disorder_frac: float = 0.02  # out-of-order rows within a file
    schema_evolution: bool = False  # F3: early files omit `tool`, int16/dict
    hot_convs: int = 0  # F4: this many conv_ids get `hot_factor`x edits
    hot_factor: int = 50
    mean_u_edits: float = 0.45  # mean extra U edits per surviving key
    # chunked generation offsets (write_fixture_chunked): shift conv ids and
    # LSNs so independently generated chunks never collide
    conv_offset: int = 0
    lsn_offset: int = 0


@dataclass
class Fixture:
    transcripts: pa.Table
    event_files: list  # list[pa.Table] in append (≈ LSN) order
    spec: FixtureSpec
    stats: dict = field(default_factory=dict)


def make_fixture(spec: FixtureSpec) -> Fixture:
    rng = np.random.default_rng(spec.seed)
    corpus = _make_corpus(rng)

    # ---- F1: final transcripts table -------------------------------------
    n_convs = spec.n_convs
    nt = np.clip(
        np.exp(rng.normal(np.log(8), 0.8, size=n_convs)).astype(np.int64), 1, 200
    )
    if spec.hot_convs:
        # hot conversations get a floor on turn count so their configured
        # event share is stable regardless of the lognormal draw
        nt[n_convs - spec.hot_convs :] = np.maximum(nt[n_convs - spec.hot_convs :], 10)
    # hot convs take the HIGHEST indices: "conv_hot*" sorts after every
    # "conv0..." name ('_' > digits), so generation order == (conv_id,
    # turn_idx) sort order and no >2GB sort_by/take is ever needed
    conv_names = np.array(
        [f"conv{i + spec.conv_offset:08d}" for i in range(n_convs)], dtype=object
    )
    for h in range(spec.hot_convs):
        conv_names[n_convs - spec.hot_convs + h] = f"conv_hot{h + spec.conv_offset:08d}"

    n_final = int(nt.sum())
    f_conv = np.repeat(np.arange(n_convs), nt)  # conv index per final key
    f_turn = _segmented_arange(nt).astype(np.int32)

    role = np.where(f_turn % 2 == 0, "user", "assistant").astype(object)
    r = rng.random(n_final)
    role[r < 0.04] = "system"
    role[(r >= 0.04) & (r < 0.08)] = "tool"
    tool = np.full(n_final, None, dtype=object)
    tool_mask = role == "tool"
    tool[tool_mask] = _TOOLS[rng.integers(0, 3, size=int(tool_mask.sum()))]

    f_text = np.array(_slice_texts(corpus, rng, n_final), dtype=object)
    conv_off = rng.integers(0, 30 * 24 * 3600, size=n_convs) * 1_000_000
    f_ts = BASE_TS_US + conv_off[f_conv] + f_turn.astype(np.int64) * 60_000_000

    transcripts = pa.table(
        {
            "conv_id": pa.array(conv_names[f_conv], type=pa.string()),
            "turn_idx": pa.array(f_turn, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(f_text, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(f_ts, type=pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )

    # ---- F2: event history per key ---------------------------------------
    # Three key kinds, each laid out key-contiguous in pos order:
    #   A: surviving keys, plain history: I, U*u   (last event carries finals)
    #   C: surviving keys, resurrection:  I, D, I(final)
    #   B: doomed keys (appended turns):  I, U*u, D
    u_edits = rng.geometric(1.0 / (1.0 + spec.mean_u_edits), size=n_final) - 1
    if spec.hot_convs:
        hot_final = f_conv >= n_convs - spec.hot_convs
        u_edits[hot_final] = u_edits[hot_final] * spec.hot_factor + spec.hot_factor

    is_c = rng.random(n_final) < spec.resurrect_frac
    a_idx = np.nonzero(~is_c)[0]
    c_idx = np.nonzero(is_c)[0]

    # doomed keys: appended turns on a sample of convs
    n_doom_convs = max(1, int(n_convs * spec.delete_key_frac * 2))
    doom_conv = rng.choice(n_convs, size=n_doom_convs, replace=True)
    doom_extra = rng.integers(1, 3, size=n_doom_convs)
    b_conv = np.repeat(doom_conv, doom_extra)
    # appended turn indices: n_turns .. n_turns+extra-1 per sampled conv
    b_turn = (nt[b_conv] + _segmented_arange(doom_extra)).astype(np.int32)
    # dedupe (a conv sampled twice would collide turn indices): keep first
    _, uniq_pos = np.unique(
        b_conv.astype(np.int64) * 1_000_000 + b_turn, return_index=True
    )
    b_conv, b_turn = b_conv[np.sort(uniq_pos)], b_turn[np.sort(uniq_pos)]
    n_b = len(b_conv)
    b_u = rng.geometric(1.0 / (1.0 + spec.mean_u_edits), size=n_b) - 1

    # per-key event counts, concatenated layout [A, C, B]
    m_a = 1 + u_edits[a_idx]
    m_c = np.full(len(c_idx), 3, dtype=np.int64)
    m_b = 2 + b_u
    m_all = np.concatenate([m_a, m_c, m_b])
    n_events = int(m_all.sum())
    key_id = np.repeat(np.arange(len(m_all)), m_all)
    pos = _segmented_arange(m_all)
    m_rep = np.repeat(m_all, m_all)

    # key attribute lookup tables (concatenated [A, C, B] order)
    k_conv = np.concatenate([f_conv[a_idx], f_conv[c_idx], b_conv])
    k_turn = np.concatenate([f_turn[a_idx], f_turn[c_idx], b_turn]).astype(np.int32)
    n_a, n_c = len(a_idx), len(c_idx)
    kind = np.repeat(
        np.concatenate(
            [np.zeros(n_a, np.int8), np.ones(n_c, np.int8), np.full(n_b, 2, np.int8)]
        ),
        m_all,
    )

    # ops
    op = np.full(n_events, "U", dtype=object)
    op[pos == 0] = "I"
    op[(kind == 1) & (pos == 1)] = "D"
    op[(kind == 1) & (pos == 2)] = "I"
    op[(kind == 2) & (pos == m_rep - 1)] = "D"
    is_final = pos == m_rep - 1  # last event of each key

    # payloads
    e_conv = conv_names[k_conv[key_id]]
    e_turn = k_turn[key_id]
    text = np.array(_slice_texts(corpus, rng, n_events), dtype=object)
    e_role = np.full(n_events, None, dtype=object)
    e_tool = np.full(n_events, None, dtype=object)

    # final values per key (A and C survive; B keys' finals are irrelevant)
    fin_role = np.concatenate([role[a_idx], role[c_idx], np.full(n_b, "user", object)])
    fin_text = np.concatenate([f_text[a_idx], f_text[c_idx], np.full(n_b, "", object)])
    fin_tool = np.concatenate([tool[a_idx], tool[c_idx], np.full(n_b, None, object)])
    fin_ts = np.concatenate(
        [f_ts[a_idx], f_ts[c_idx], BASE_TS_US + rng.integers(0, 10**6, n_b)]
    )

    ins = op == "I"
    e_role[ins] = fin_role[key_id[ins]]  # every I carries the (final) role
    e_tool[ins] = fin_tool[key_id[ins]]
    # some non-final U's also set role (to the same final value, so the
    # converged state still equals `transcripts`)
    u_setrole = (op == "U") & (rng.random(n_events) < 0.25)
    e_role[u_setrole] = fin_role[key_id[u_setrole]]
    # last event of surviving keys carries the final payload
    fin_mask = is_final & (kind != 2)
    text[fin_mask] = fin_text[key_id[fin_mask]]
    deletes = op == "D"
    text[deletes] = None

    # ---- interleave: per-key increasing positions, random global order ----
    u = rng.random(n_events)
    sorted_by_key = np.lexsort((u, key_id))
    u_assigned = u[sorted_by_key]  # per-key ascending runs, aligned with layout
    emit_order = np.argsort(u_assigned, kind="stable")  # global emit sequence
    lsn_seq = (
        np.cumsum(1 + rng.poisson(0.3, size=n_events)).astype(np.int64)
        + spec.lsn_offset
    )
    lsn = np.empty(n_events, dtype=np.int64)
    lsn[emit_order] = lsn_seq

    # event time: monotone-ish in lsn, except finals carry the table ts
    e_ts = BASE_TS_US - 86_400_000_000 + lsn * 1_000
    e_ts[fin_mask] = fin_ts[key_id[fin_mask]]

    # ---- file layout: emit order, + disorder + duplicates -----------------
    order = emit_order.copy()
    n_swap = min(int(n_events * spec.disorder_frac), n_events // 2 - 1)
    if n_swap > 0:
        # swap disjoint adjacent pairs (2k, 2k+1) so `order` stays a permutation
        si = rng.choice(n_events // 2 - 1, size=n_swap, replace=False) * 2
        tmp = order[si].copy()
        order[si] = order[si + 1]
        order[si + 1] = tmp
    n_dup = int(n_events * spec.dup_frac)
    dup_rows = rng.choice(order, size=n_dup, replace=False) if n_dup else np.array([], np.int64)
    insert_at = rng.integers(0, len(order), size=n_dup)
    order = np.insert(order, np.sort(insert_at), dup_rows[np.argsort(insert_at, kind="stable")])

    def take(a):
        return a[order]

    full_tbl = pa.table(
        {
            "lsn": pa.array(take(lsn), type=pa.int64()),
            "op": pa.array(take(op), type=pa.string()),
            "conv_id": pa.array(take(e_conv), type=pa.string()),
            "turn_idx": pa.array(take(e_turn), type=pa.int32()),
            "role": pa.array(take(e_role), type=pa.string()),
            "text": pa.array(take(text), type=pa.string()),
            "tool": pa.array(take(e_tool), type=pa.string()),
            "ts": pa.array(take(e_ts), type=pa.timestamp("us")),
        },
        schema=CDC_SCHEMA,
    )

    # schema evolution (F3) interacts with file split: early files lack
    # `tool`.  Keys whose tool-carrying event would land early get a late
    # trailing U that re-sets tool (generated above implicitly by I carrying
    # tool; here we instead append explicit late U's for all tool!=null keys
    # when evolution is on, so convergence is preserved).
    files = []
    total = full_tbl.num_rows
    bounds = [int(total * i / spec.n_files) for i in range(spec.n_files + 1)]
    for i in range(spec.n_files):
        part = full_tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        if spec.schema_evolution:
            if i < int(spec.n_files * 0.4):
                part = part.drop_columns(["tool"])
            if i < int(spec.n_files * 0.3):
                cols = {name: part[name] for name in part.column_names}
                cols["turn_idx"] = part["turn_idx"].cast(pa.int16())
                cols["role"] = part["role"].cast(pa.dictionary(pa.int32(), pa.string()))
                part = pa.table(cols)
        files.append(part)

    if spec.schema_evolution:
        # trailing fix-up file: re-assert tool for every surviving key with a
        # non-null tool, at LSNs beyond everything emitted so far.
        surv = np.nonzero(fin_tool[: n_a + n_c] != None)[0]  # noqa: E711
        if len(surv):
            base_lsn = int(lsn.max()) + 10
            fix = pa.table(
                {
                    "lsn": pa.array(base_lsn + np.arange(len(surv)), type=pa.int64()),
                    "op": pa.array(["U"] * len(surv), type=pa.string()),
                    "conv_id": pa.array(conv_names[k_conv[surv]], type=pa.string()),
                    "turn_idx": pa.array(k_turn[surv], type=pa.int32()),
                    "role": pa.array([None] * len(surv), type=pa.string()),
                    "text": pa.array(fin_text[surv], type=pa.string()),
                    "tool": pa.array(fin_tool[surv], type=pa.string()),
                    "ts": pa.array(fin_ts[surv], type=pa.timestamp("us")),
                },
                schema=CDC_SCHEMA,
            )
            files.append(fix)

    stats = {
        "n_convs": n_convs,
        "n_final_rows": n_final,
        "n_events": n_events,
        "n_dups": n_dup,
        "n_deleted_keys": n_b,
        "op_mix": {
            "I": int((op == "I").sum()),
            "U": int((op == "U").sum()),
            "D": int((op == "D").sum()),
        },
    }
    return Fixture(transcripts=transcripts, event_files=files, spec=spec, stats=stats)


def make_dirty_log(seed: int = 42, n_clean: int = 50) -> pa.Table:
    """F5: dirty/edge corpus. `ts` is a STRING column (some non-castable)."""
    rng = np.random.default_rng(seed)
    corpus = _make_corpus(rng, 2000)
    rows = {
        "lsn": [], "op": [], "conv_id": [], "turn_idx": [],
        "role": [], "text": [], "tool": [], "ts": [],
    }
    lsn = 1

    def add(op, conv, turn, text, ts, role="user", tool=None):
        nonlocal lsn
        rows["lsn"].append(lsn); lsn += 3
        rows["op"].append(op); rows["conv_id"].append(conv)
        rows["turn_idx"].append(turn); rows["role"].append(role)
        rows["text"].append(text); rows["tool"].append(tool); rows["ts"].append(ts)

    for i in range(n_clean):
        add("I", f"conv{i:08d}", 0, corpus[: 50 + i], "2026-01-01 00:00:01")
    add("X", "conv00000001", 1, "bad op", "2026-01-01 00:00:02")          # bad op
    add("I", "conv00000002", -5, "neg turn", "2026-01-01 00:00:03")       # neg turn_idx
    add("I", None, 0, "null conv", "2026-01-01 00:00:04")                 # null key
    add("I", "conv00000003", 1, "\\N", "2026-01-01 00:00:05")             # nullFormat
    add("I", "conv00000004", 1, "bad ts", "not-a-timestamp")              # bad ts
    add("U", "conv00000005", None, "null turn", "2026-01-01 00:00:06")    # null turn

    return pa.table(
        {
            "lsn": pa.array(rows["lsn"], type=pa.int64()),
            "op": pa.array(rows["op"], type=pa.string()),
            "conv_id": pa.array(rows["conv_id"], type=pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], type=pa.int32()),
            "role": pa.array(rows["role"], type=pa.string()),
            "text": pa.array(rows["text"], type=pa.string()),
            "tool": pa.array(rows["tool"], type=pa.string()),
            "ts": pa.array(rows["ts"], type=pa.string()),
        }
    )


TIERS = {
    "t1": FixtureSpec(n_convs=200, n_files=6),
    "t2": FixtureSpec(n_convs=5000, n_files=16),
    "t2evo": FixtureSpec(n_convs=2000, n_files=10, schema_evolution=True, seed=43),
    "t2skew": FixtureSpec(n_convs=2000, n_files=10, hot_convs=1, hot_factor=500, seed=44),
    "bench": FixtureSpec(n_convs=250_000, n_files=64, seed=42),
    "benchskew": FixtureSpec(n_convs=100_000, n_files=64, hot_convs=4, hot_factor=5000, seed=45),
}


def write_fixture(root: str, tier: str, spec: FixtureSpec | None = None) -> dict:
    """Materialize a fixture tier under `root/tier/` (cached; deterministic).

    Layout: transcripts.parquet + cdc_log/evt-NNNN.parquet.  Returns paths.
    """
    import dataclasses
    import json

    spec = spec or TIERS[tier]
    d = os.path.join(root, tier)
    done = os.path.join(d, "_DONE")
    out = {
        "dir": d,
        "transcripts": os.path.join(d, "transcripts.parquet"),
        "cdc_log": os.path.join(d, "cdc_log"),
    }
    spec_json = json.dumps(dataclasses.asdict(spec), sort_keys=True)
    if os.path.exists(done):
        # the cache is sound only if the REQUESTED spec generated it —
        # a tier name encodes n_convs but nothing else (n_files, seed,
        # edit rates); silently returning a mismatched layout would make
        # benchmarks measure the wrong fixture
        with open(done) as f:
            cached = f.read().strip()
        # legacy markers contain just "ok" (pre-guard generations):
        # provenance unknown, accept as before
        if cached not in ("", "ok") and cached != spec_json:
            raise ValueError(
                f"fixture tier {tier!r} at {d} was generated with a "
                f"different spec:\n  cached:    {cached}\n  requested: "
                f"{spec_json}\nUse a new tier name or delete the dir."
            )
        return out
    if spec.n_convs > CHUNK_CONVS:
        if spec.hot_convs:
            raise ValueError(
                "tiers above CHUNK_CONVS must use chunked generation, which "
                "does not support hot_convs (the monolithic generator holds "
                "~86 GB at 3M convs — refusing the silent OOM path)"
            )
        return write_fixture_chunked(root, tier, spec)
    shutil.rmtree(d, ignore_errors=True)  # stale/interrupted generation
    os.makedirs(os.path.join(d, "cdc_log"), exist_ok=True)
    fx = make_fixture(spec)
    pq.write_table(fx.transcripts, out["transcripts"])
    for i, t in enumerate(fx.event_files):
        pq.write_table(t, os.path.join(d, "cdc_log", f"evt-{i:04d}.parquet"))
    import json

    with open(os.path.join(d, "stats.json"), "w") as f:
        json.dump(fx.stats, f, indent=1)
    with open(done, "w") as f:
        f.write(spec_json)
    return out


# above this many conversations, write_fixture generates in chunks: the
# monolithic generator holds every event as Python objects (~86 GB RSS
# measured at 3M convs) — chunking bounds memory at one chunk's worth
CHUNK_CONVS = 1_000_000


def write_envelope_log(
    root: str, tier: str, spec: FixtureSpec | None = None
) -> str:
    """Render a fixture tier's event log as a Debezium-style envelope
    ndjson stream (`<tier>/envelope_log/evt-NNNN.jsonl`, one shard per
    Parquet shard, row order preserved) and return the directory.

    Faithful to the wire shape `sources/envelope.py` reads: c/u carry a
    sparse `after` image (null = column untouched), d carries the
    delete's payload under `before` with `after` null, the log position
    rides `source.lsn`, `ts_ms` is the emit time in millis.  The
    rendering is lossless w.r.t. the internal event schema, so an
    envelope replay converges to the same final table as the Parquet
    log (the merge-contract oracle is shared).  Cached next to the tier
    (fixture generation is deterministic, so the marker is enough)."""
    import json

    fx = write_fixture(root, tier, spec)
    d = os.path.join(fx["dir"], "envelope_log")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    op_code = {"I": "c", "U": "u", "D": "d"}
    for f in sorted(os.listdir(fx["cdc_log"])):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(fx["cdc_log"], f))
        t = t.set_column(
            t.column_names.index("ts"), "ts", t["ts"].cast(pa.int64())
        )
        out_path = os.path.join(d, f.replace(".parquet", ".jsonl"))
        with open(out_path, "w") as out:
            for r in t.to_pylist():
                img = {
                    "conv_id": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    "role": r["role"],
                    "text": r["text"],
                    "tool": r["tool"],
                    "ts_us": r["ts"],
                }
                is_d = r["op"] == "D"
                env = {
                    "op": op_code[r["op"]],
                    "ts_ms": (r["lsn"] or 0) // 1000,
                    "before": img if is_d else None,
                    "after": None if is_d else img,
                    "source": {"lsn": r["lsn"]},
                }
                out.write(json.dumps(env) + "\n")
    with open(done, "w") as f:
        f.write("ok\n")
    return d


def write_fixture_chunked(
    root: str, tier: str, spec: FixtureSpec, chunk_convs: int = 500_000
) -> dict:
    """Chunked fixture materialization for large tiers: conversations are
    generated in independent chunks (disjoint conv-id and LSN ranges via
    FixtureSpec.conv_offset / lsn_offset; chunk seed = seed + chunk), each
    chunk's events written as its own log files and its transcripts
    appended as row groups of ONE transcripts.parquet.  Keys never span
    chunks, so every CDC merge-contract property of the monolithic
    generator holds chunk-locally and therefore globally; chunk LSN
    ranges are disjoint and ascending (a backfill arrival order — the
    fold is order-insensitive by LSN, and per-file disorder still
    exercises the out-of-order path)."""
    from dataclasses import replace as dc_replace

    d = os.path.join(root, tier)
    done = os.path.join(d, "_DONE")
    out = {
        "dir": d,
        "transcripts": os.path.join(d, "transcripts.parquet"),
        "cdc_log": os.path.join(d, "cdc_log"),
    }
    if os.path.exists(done):
        return out
    # no _DONE marker: anything here is a stale/interrupted generation
    # (possibly with a different filename pattern) — wipe it, or the
    # directory-listing readers would replay a mixed log
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(out["cdc_log"], exist_ok=True)
    if spec.hot_convs:
        raise ValueError("chunked generation does not support hot_convs tiers")

    n_chunks = (spec.n_convs + chunk_convs - 1) // chunk_convs
    # distribute spec.n_files across chunks (first `extra` chunks get one
    # more) so the TOTAL file count honors the spec's layout
    base_files, extra = divmod(max(spec.n_files, n_chunks), n_chunks)
    lsn_offset = 0
    stats = {"n_convs": 0, "n_events": 0, "n_files": 0}
    writer = pq.ParquetWriter(out["transcripts"], TRANSCRIPT_SCHEMA)
    try:
        fidx = 0
        for c in range(n_chunks):
            n = min(chunk_convs, spec.n_convs - c * chunk_convs)
            sub = dc_replace(
                spec,
                n_convs=n,
                n_files=base_files + (1 if c < extra else 0),
                seed=spec.seed + c,
                conv_offset=c * chunk_convs,
                lsn_offset=lsn_offset,
            )
            fx = make_fixture(sub)
            writer.write_table(fx.transcripts)
            max_lsn = lsn_offset
            for t in fx.event_files:
                pq.write_table(t, os.path.join(out["cdc_log"], f"evt-{fidx:05d}.parquet"))
                fidx += 1
                m = pa.compute.max(t["lsn"]).as_py()
                if m is not None:
                    max_lsn = max(max_lsn, int(m))
            lsn_offset = max_lsn + 1
            stats["n_convs"] += n
            stats["n_events"] += sum(t.num_rows for t in fx.event_files)
            stats["n_files"] = fidx
            del fx
    finally:
        writer.close()
    import json

    with open(os.path.join(d, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    import dataclasses as _dc
    import json as _json

    with open(done, "w") as f:
        f.write(_json.dumps(_dc.asdict(spec), sort_keys=True))
    return out


def write_snapshot(root: str, tier: str) -> str:
    """A deterministic bootstrap snapshot for `apply_cdc(snapshot_path=...)`.

    Derived from the tier's final transcripts (so the key domain overlaps
    the log): even-turn rows with drifted text/tool — any logged key must
    end at the LOG's value, since snapshot rows replay as lsn=0 full
    inserts under every later event — plus snapshot-only keys at
    turn_idx+100000 that no log event touches (they must survive
    verbatim).  Rows with null text are excluded (an insert with no
    payload is dirty by the normalize contract).  Idempotent, atomic.
    """
    import pyarrow.compute as pc

    from .util import atomic_write_parquet

    fx = write_fixture(root, tier)
    path = os.path.join(fx["dir"], "snapshot.parquet")
    if os.path.exists(path):
        return path
    t = pq.read_table(fx["transcripts"])
    t = t.filter(pc.is_valid(t["text"]))
    even = t.filter(pc.equal(pc.bit_wise_and(t["turn_idx"], 1), 0))
    drift = even.set_column(
        even.schema.get_field_index("text"),
        "text",
        pc.binary_join_element_wise("snap-drift: ", even["text"], ""),
    ).set_column(
        even.schema.get_field_index("tool"),
        "tool",
        pa.nulls(even.num_rows, type=pa.string()),
    )
    extra_src = t.slice(0, min(500, t.num_rows))
    extra = extra_src.set_column(
        extra_src.schema.get_field_index("turn_idx"),
        "turn_idx",
        pc.add(extra_src["turn_idx"], pa.scalar(100000, type=pa.int32())).cast(
            pa.int32()
        ),
    ).set_column(
        extra_src.schema.get_field_index("text"),
        "text",
        pc.binary_join_element_wise("snap-only: ", extra_src["text"], ""),
    )
    atomic_write_parquet(path, pa.concat_tables([drift, extra]))
    return path


def write_dirty_fixture(root: str) -> dict:
    """Materialize the F5 dirty/edge corpus as a one-file CDC log tier
    (`root/t5dirty/cdc_log/`); cached + deterministic like write_fixture."""
    d = os.path.join(root, "t5dirty")
    done = os.path.join(d, "_DONE")
    out = {"dir": d, "cdc_log": os.path.join(d, "cdc_log")}
    if os.path.exists(done):
        return out
    os.makedirs(out["cdc_log"], exist_ok=True)
    pq.write_table(make_dirty_log(), os.path.join(out["cdc_log"], "evt-0000.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return out
