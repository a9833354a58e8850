"""Posting-list segment encode/decode (vectorized, Arrow-batch friendly).

This is the from-scratch replacement for the index layer the reference
delegates to Lucene (SURVEY.md §2.12).  A *segment row* holds one term's
postings for one shard-range of docIDs:

    (term, salt, shard_min, shard_max, df, cttf,
     docs_bytes, tfs_bytes, pos_bytes,
     blk_last[], blk_n[], blk_max_tf[], blk_min_norm[],
     blk_doc_off[], blk_tf_off[], blk_pos_off[])

- docIDs are delta-encoded VByte with the delta chain RESTARTING at every
  128-entry block (first value of a block is the absolute docID), so rows
  from disjoint docID ranges can be merged by pure byte concatenation —
  no re-encode in the salted term-merge shuffle.
- term frequencies are plain VByte, aligned with entries.
- positions (for phrase-within-turn) are VByte gaps restarting per entry;
  entry position counts == tf, so no extra length stream.
- per block: last docID, entry count, max tf and min norm-byte — the
  block-max metadata that block-max WAND uses for skipping (upper-bound
  score = score(max_tf, min_norm) since BM25 is monotone up in tf and
  down in doc length).

All encode/decode paths are numpy-vectorized; the only Python loops are
per-term / per-block (amortized over posting entries).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions import varint
from ..functions.analysis import (
    MAX_TOKEN_LENGTH,
    TOKEN_RE,
    TRUNCATE_BYTES,
    tokenize,
    truncate_big_field,
)

BLOCK = 128

SEGMENT_SCHEMA = (
    "term string, salt int, shard_min int, shard_max int, df long, cttf long, "
    "docs_bytes binary, tfs_bytes binary, pos_bytes binary, "
    "blk_first array<long>, blk_last array<long>, blk_n array<int>, blk_max_tf array<int>, "
    "blk_min_norm array<int>, blk_doc_off array<long>, blk_tf_off array<long>, "
    "blk_pos_off array<long>, "
    # per-block pareto-optimal (tf, norm) impact pairs (flattened +
    # per-block counts): score(max_tf, min_norm) pairs the best tf with
    # the best norm of DIFFERENT docs and is hopelessly loose on hot
    # terms (measured: bound 0.305 vs 0.247 best achieved -> zero block
    # skipping); the pareto front bounds by max over real co-occurring
    # pairs for ANY avgdl, the same idea as Lucene's per-block impacts
    "blk_pareto_n array<int>, blk_pareto_tf array<long>, blk_pareto_norm array<int>"
)

_LONG_RUN_RE = r"[A-Za-z0-9_]{" + str(MAX_TOKEN_LENGTH + 1) + ",}"


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized frozen analyzer over a pandas Series -> Series of lists.

    Must agree token-for-token with analysis.tokenize (tested).  Slow-path
    Python fallback only for the rare rows with >32,766-byte text,
    >255-char runs, or non-ASCII bytes: the fast path lowercases BEFORE
    findall, and a few non-ASCII chars lower() into ASCII ('İ' -> 'i' +
    combining dot, 'K' -> 'k'), which would mint tokens the frozen
    findall-then-lower tokenizer never emits.
    """
    s = texts.fillna("")
    byte_len = s.str.encode("utf-8").str.len()
    hard = (
        (byte_len > TRUNCATE_BYTES)
        | (byte_len != s.str.len())  # any non-ASCII byte
        | s.str.contains(_LONG_RUN_RE, regex=True)
    )
    out = s.str.lower().str.findall(TOKEN_RE)
    if hard.any():
        out = out.copy()
        out[hard] = s[hard].map(tokenize)
    return out


def doc_lengths(token_lists: pd.Series) -> np.ndarray:
    return token_lists.str.len().to_numpy(dtype=np.int64)


def token_counts(texts: pd.Series) -> np.ndarray:
    """Doc lengths without materializing token lists: a regex COUNT pass for
    ordinary rows (≈2× cheaper than findall), the exact tokenizer only for
    the rare truncation/255-char rows.  Must equal len(tokenize(text))."""
    s = texts.fillna("")
    byte_len = s.str.encode("utf-8").str.len()
    hard = (byte_len > TRUNCATE_BYTES) | s.str.contains(_LONG_RUN_RE, regex=True)
    out = s.str.count(TOKEN_RE).to_numpy(dtype=np.int64)
    if hard.any():
        idx = np.nonzero(hard.to_numpy())[0]
        vals = s.iloc[idx].map(lambda t: len(tokenize(t)))
        out[idx] = vals.to_numpy(dtype=np.int64)
    return out


def explode_entries(docids: np.ndarray, token_lists: pd.Series, with_codes: bool = False):
    """(docid, term, pos) arrays from per-doc token lists, grouped by term
    (docid/pos order preserved within each term).

    Terms are factorized to int codes and the sort runs on the codes —
    an object-string argsort over the position stream costs ~3x the whole
    rest of the encode.  Term groups come out in first-appearance order,
    not lexicographic, which nothing downstream depends on.

    ``with_codes=True`` additionally returns the sorted int code array so
    the caller's term-boundary detection can compare ints instead of
    object strings (r6: the object != pass cost ~0.1 s per sf1 shard)."""
    from itertools import chain

    lens = token_lists.str.len().to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        empty = (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=object),
            np.empty(0, dtype=np.int64),
        )
        return empty + (np.empty(0, dtype=np.int64),) if with_codes else empty
    ent_doc = np.repeat(np.asarray(docids, dtype=np.int64), lens)
    flat = np.fromiter(chain.from_iterable(token_lists.to_numpy()), dtype=object, count=total)
    offsets = np.repeat(np.cumsum(lens) - lens, lens)
    ent_pos = np.arange(total, dtype=np.int64) - offsets
    codes, _ = pd.factorize(flat, use_na_sentinel=False)
    order = np.argsort(codes, kind="stable")
    if with_codes:
        return ent_doc[order], flat[order], ent_pos[order], codes[order]
    return ent_doc[order], flat[order], ent_pos[order]


def _split_runs(arr: np.ndarray, pts) -> list:
    """np.split minus its per-piece swapaxes overhead: the assembly below
    makes ~8k-piece splits 11 times per sf1 shard and np.split's
    array_split path cost ~0.5 s of the 2 s encode (r6, profiled).
    Pieces are views, exactly as np.split returns."""
    out = []
    prev = 0
    for p in pts:
        out.append(arr[prev:p])
        prev = p
    out.append(arr[prev:])
    return out


def encode_shard_postings(
    shard: int,
    docids: np.ndarray,
    norm_bytes: np.ndarray,
    token_lists: pd.Series,
    positions: bool,
    n_salts: int,
) -> pd.DataFrame:
    """One shard's docs -> segment rows, one per term (SEGMENT_SCHEMA).

    ``docids`` must be ascending (contiguity not required); ``norm_bytes``
    aligned with docids.

    Whole-shard vectorized: the entire entry stream is VByte-encoded with
    ONE call per stream (docid gaps restart at block boundaries, so each
    term's bytes are a contiguous slice of the shared buffer) and block
    metadata comes from ``np.maximum/minimum.reduceat`` — the per-term
    Python work is just slicing (a per-term numpy-encode loop measured
    4.1s/shard at sf0.5; this path ~0.3s)."""
    ent_doc, ent_term, ent_pos, ent_code = explode_entries(
        docids, token_lists, with_codes=True
    )
    cols = [c.split()[0] for c in SEGMENT_SCHEMA.split(", ")]
    if not ent_doc.size:
        return pd.DataFrame([], columns=cols)

    # norm byte per entry docid (docids ascending -> searchsorted map)
    did = np.asarray(docids, dtype=np.int64)
    nb = np.asarray(norm_bytes, dtype=np.uint8)
    ent_norm = nb[np.searchsorted(did, ent_doc)]

    # (term, docid) entry boundaries over the position-level stream
    # (int code compares — the object-string != pass cost ~0.1 s/shard)
    term_change = np.empty(ent_term.shape, dtype=bool)
    term_change[0] = True
    term_change[1:] = ent_code[1:] != ent_code[:-1]
    key_change = term_change.copy()
    key_change[1:] |= ent_doc[1:] != ent_doc[:-1]
    e_start = np.nonzero(key_change)[0]          # entry -> first ent row
    e_end = np.append(e_start[1:], ent_term.size)
    e_tf = (e_end - e_start).astype(np.int64)
    e_doc = ent_doc[e_start]
    e_norm = ent_norm[e_start]

    # per-term entry ranges
    t_first_ent = np.nonzero(term_change)[0]
    t_start = np.searchsorted(e_start, t_first_ent)  # entry index
    t_sizes = np.append(t_start[1:], e_start.size) - t_start
    terms = ent_term[t_first_ent]

    return assemble_segment_rows(
        shard, n_salts, terms, t_sizes, e_doc, e_tf, e_norm,
        ent_pos if positions else None, positions,
    )


def assemble_segment_rows(
    shard: int,
    n_salts: int,
    terms: np.ndarray,
    t_sizes: np.ndarray,
    e_doc: np.ndarray,
    e_tf: np.ndarray,
    e_norm: np.ndarray,
    pos_flat: np.ndarray | None,
    positions: bool,
) -> pd.DataFrame:
    """Entry streams -> one segment row per term (SEGMENT_SCHEMA).

    The assembly half of ``encode_shard_postings``, factored out (r6) so
    expunge can rebuild partials by DECODING the existing postings and
    re-assembling the surviving entries — no re-tokenize, no docs-text
    shuffle.  Inputs are ENTRY-level, grouped by term (``t_sizes`` entries
    per term, docids ascending within each term); ``pos_flat`` is the
    position-level stream aligned with entries (positions of entry i are
    ``pos_flat[cum_tf[i]:cum_tf[i+1]]``), required when ``positions``.
    Output is byte-identical to the tokenize path for the same entries
    (identity-tested)."""
    cols = [c.split()[0] for c in SEGMENT_SCHEMA.split(", ")]
    n_entries = e_doc.size
    if not n_entries:
        return pd.DataFrame([], columns=cols)
    t_start = np.cumsum(t_sizes) - t_sizes
    t_end = np.cumsum(t_sizes)

    # block starts: every 128th entry within each term (entry indices)
    in_term = np.arange(n_entries, dtype=np.int64) - np.repeat(t_start, t_sizes)
    blk_start = np.nonzero(in_term % BLOCK == 0)[0]
    blk_bounds = np.append(blk_start, n_entries)
    blk_n_all = np.diff(blk_bounds)
    blk_first_all = e_doc[blk_start]  # exact block firsts: pruning planners
    # and WAND read them from metadata instead of conservative lower bounds
    blk_last_all = e_doc[blk_bounds[1:] - 1]
    blk_max_tf_all = np.maximum.reduceat(e_tf, blk_start)
    blk_min_norm_all = np.minimum.reduceat(e_norm, blk_start)
    # block index range per term
    t_blk_start = np.searchsorted(blk_start, t_start)
    t_blk_end = np.append(t_blk_start[1:], blk_start.size)

    # pareto (tf, norm) impact pairs per block, fully vectorized: sort
    # entries by (block, norm asc, tf desc); an entry is pareto iff its tf
    # beats the running max of smaller-norm entries in the same block
    # (segmented running max via the block-offset trick)
    bidx = np.repeat(np.arange(blk_start.size, dtype=np.int64), blk_n_all)
    ordp = np.lexsort((-e_tf, e_norm, bidx))
    bt, bn, pb = e_tf[ordp], e_norm[ordp], bidx[ordp]
    LARGE = np.int64(1) << 40  # > any tf
    shifted = bt + pb * LARGE
    cm = np.maximum.accumulate(shifted)
    prev = np.empty_like(cm)
    prev[0] = np.iinfo(np.int64).min
    prev[1:] = cm[:-1]
    blk_first_ent = np.empty(pb.shape, dtype=bool)
    blk_first_ent[0] = True
    blk_first_ent[1:] = pb[1:] != pb[:-1]
    keep_p = blk_first_ent | (shifted > prev)
    p_tf_all = bt[keep_p]
    p_norm_all = bn[keep_p]
    p_counts = np.bincount(pb[keep_p], minlength=blk_start.size).astype(np.int64)
    p_off = np.concatenate(([0], np.cumsum(p_counts)))

    # docid gaps restart absolute at every block start — one encode call
    # (widths computed once, shared between encode and the offset cumsums)
    dgap = np.empty(n_entries, dtype=np.int64)
    dgap[1:] = e_doc[1:] - e_doc[:-1]
    dgap[blk_start] = e_doc[blk_start]
    dlens = varint.encoded_lengths(dgap)
    dbuf = varint.encode(dgap, dlens)
    dcum = np.concatenate(([0], np.cumsum(dlens)))

    tlens = varint.encoded_lengths(e_tf)
    tbuf = varint.encode(e_tf, tlens)
    tcum = np.concatenate(([0], np.cumsum(tlens)))

    if positions:
        e_start_pos = np.cumsum(e_tf) - e_tf   # position-level entry starts
        e_end_pos = np.cumsum(e_tf)
        pos_gap = np.empty(pos_flat.shape, dtype=np.int64)
        pos_gap[1:] = pos_flat[1:] - pos_flat[:-1]
        pos_gap[e_start_pos] = pos_flat[e_start_pos]
        plens = varint.encoded_lengths(pos_gap)
        pbuf = varint.encode(pos_gap, plens)
        pcum_ent = np.concatenate(([0], np.cumsum(plens)))
        # byte offset of each ENTRY's positions = offset of its first ent row
        p_entry_off = pcum_ent[e_start_pos]
        p_entry_end = pcum_ent[e_end_pos]
    # cttf per term = sum of tfs over the term's entries
    cttf_all = np.add.reduceat(e_tf, t_start)

    # ---- assemble one row per term, column-at-a-time (a per-term dict
    # loop + DataFrame(list-of-dicts) measured ~2x the whole encode)
    dview, tview = memoryview(dbuf), memoryview(tbuf)
    n_terms = terms.size
    t_nblocks = t_blk_end - t_blk_start
    d0s = dcum[t_start]  # per-term byte bases
    t0s = tcum[t_start]
    d1s = dcum[t_end]
    t1s = tcum[t_end]
    base_per_block_d = np.repeat(d0s, t_nblocks)
    base_per_block_t = np.repeat(t0s, t_nblocks)
    split_pts = t_blk_start[1:]
    data = {
        "term": [str(t) for t in terms],
        "salt": np.full(n_terms, shard % n_salts, dtype=np.int64),
        "shard_min": np.full(n_terms, shard, dtype=np.int64),
        "shard_max": np.full(n_terms, shard, dtype=np.int64),
        "df": t_sizes.astype(np.int64),
        "cttf": cttf_all.astype(np.int64),
        "docs_bytes": [bytes(dview[a:b]) for a, b in zip(d0s, d1s)],
        "tfs_bytes": [bytes(tview[a:b]) for a, b in zip(t0s, t1s)],
        "blk_first": _split_runs(blk_first_all, split_pts),
        "blk_last": _split_runs(blk_last_all, split_pts),
        "blk_n": _split_runs(blk_n_all, split_pts),
        "blk_max_tf": _split_runs(blk_max_tf_all, split_pts),
        "blk_min_norm": _split_runs(blk_min_norm_all, split_pts),
        "blk_doc_off": _split_runs(dcum[blk_start] - base_per_block_d, split_pts),
        "blk_tf_off": _split_runs(tcum[blk_start] - base_per_block_t, split_pts),
        "blk_pareto_n": _split_runs(p_counts, split_pts),
        "blk_pareto_tf": _split_runs(p_tf_all, p_off[t_blk_start[1:]]),
        "blk_pareto_norm": _split_runs(p_norm_all, p_off[t_blk_start[1:]]),
    }
    if positions:
        pview = memoryview(pbuf)
        p0s = p_entry_off[t_start]
        p1s = p_entry_end[t_end - 1]
        data["pos_bytes"] = [bytes(pview[a:b]) for a, b in zip(p0s, p1s)]
        data["blk_pos_off"] = _split_runs(
            p_entry_off[blk_start] - np.repeat(p0s, t_nblocks), split_pts
        )
    else:
        data["pos_bytes"] = [b""] * n_terms
        data["blk_pos_off"] = _split_runs(
            np.zeros(blk_start.size, dtype=np.int64), split_pts
        )
    return pd.DataFrame(data, columns=cols)


def split_rows_by_shard(
    pdf: pd.DataFrame, shard_size: int, with_pos: bool
) -> pd.DataFrame:
    """Split merged segment rows into per-SHARD sub-rows by byte slicing
    at block boundaries (no decode).

    The salted merge concatenates a (term, salt) group's per-shard
    encodings into ONE row whose ``shard_min`` is only the FIRST covered
    shard — so hash-partitioning rows on shard_min does NOT co-locate
    all terms' evidence for a docid unless every query term covers every
    shard (r5 bug: wide rare-term expansions lost docs whose clause
    evidence straddled partitions).  Blocks never cross shards (they are
    built per shard and the merge concatenates whole block tables), and
    delta chains restart absolute at every block boundary, so a row
    slices exactly into per-shard sub-rows: contiguous block runs with
    rebased byte offsets.  After this pass ``shard_min`` IS the shard id
    and the repartition key is sound for any term/shard coverage.

    Cost: one pass over the given rows' compressed bytes (memoryview
    slicing); single-shard rows pass through unsliced.  Output carries
    exactly the input columns — columns outside the sliced set (e.g.
    ``bucket``) are copied from the parent row onto every sub-row.
    QuerySession runs this ONCE at pin time so warm queries pay no
    per-query split; the cold path splits just its query terms' rows.
    """
    cols = list(pdf.columns)
    sliced = {
        "shard_min", "docs_bytes", "tfs_bytes", "pos_bytes",
        "blk_n", "blk_first", "blk_last",
        "blk_doc_off", "blk_tf_off", "blk_pos_off",
    }
    extra = [c for c in cols if c not in sliced]
    out: dict[str, list] = {c: [] for c in cols}
    for row in pdf.to_dict("records"):
        bf = np.asarray(row["blk_first"], dtype=np.int64)
        if bf.size == 0:
            for c in cols:
                out[c].append(row[c])
            continue
        g = bf // shard_size
        if g[0] == g[-1]:
            row["shard_min"] = int(g[0])
            for c in cols:
                out[c].append(row[c])
            continue
        cut = np.nonzero(np.diff(g))[0] + 1
        starts = np.concatenate(([0], cut))
        ends = np.concatenate((cut, [g.size]))
        bl = np.asarray(row["blk_last"], dtype=np.int64)
        bn = np.asarray(row["blk_n"], dtype=np.int64)
        doff = np.asarray(row["blk_doc_off"], dtype=np.int64)
        toff = np.asarray(row["blk_tf_off"], dtype=np.int64)
        d_ends = np.append(doff[1:], len(row["docs_bytes"]))
        t_ends = np.append(toff[1:], len(row["tfs_bytes"]))
        if with_pos:
            poff = np.asarray(row["blk_pos_off"], dtype=np.int64)
            p_ends = np.append(poff[1:], len(row["pos_bytes"]))
        dview = memoryview(row["docs_bytes"])
        tview = memoryview(row["tfs_bytes"])
        pview = memoryview(row["pos_bytes"]) if with_pos else None
        for i0, i1 in zip(starts, ends):
            sub = {
                "shard_min": int(g[i0]),
                "docs_bytes": bytes(dview[doff[i0] : d_ends[i1 - 1]]),
                "tfs_bytes": bytes(tview[toff[i0] : t_ends[i1 - 1]]),
                "blk_n": bn[i0:i1],
                "blk_first": bf[i0:i1],
                "blk_last": bl[i0:i1],
                "blk_doc_off": doff[i0:i1] - doff[i0],
                "blk_tf_off": toff[i0:i1] - toff[i0],
            }
            if with_pos:
                sub["pos_bytes"] = bytes(pview[poff[i0] : p_ends[i1 - 1]])
                sub["blk_pos_off"] = poff[i0:i1] - poff[i0]
            else:
                # positions=False indexes still carry the (empty) pos
                # columns; a multi-shard row must emit them on every
                # sub-row or the output loop KeyErrors (ADVICE r5).
                # pos_bytes is b'' and blk_pos_off all-zero per block.
                if "pos_bytes" in out:
                    sub["pos_bytes"] = row["pos_bytes"]
                if "blk_pos_off" in out:
                    sub["blk_pos_off"] = np.zeros(i1 - i0, dtype=np.int64)
            for c in extra:
                sub[c] = row[c]
            for c in cols:
                out[c].append(sub[c])
    return pd.DataFrame(out, columns=cols)


def first_docid(docs_bytes: bytes) -> int:
    """Absolute first docID of a segment row (delta chains restart at block
    boundaries, so the first VByte value is the absolute docID)."""
    x, shift = 0, 0
    for byte in docs_bytes:
        x |= (byte & 0x7F) << shift
        if not (byte & 0x80):
            return x
        shift += 7
    return x


def first_docids(docs_bytes: pd.Series) -> np.ndarray:
    return np.fromiter(
        (first_docid(b) for b in docs_bytes), dtype=np.int64, count=len(docs_bytes)
    )


def merge_rows(rows: pd.DataFrame) -> dict:
    """Merge same-(term,salt) segment rows from disjoint shard ranges by
    byte concatenation + offset shift (the 'final' stage of the salted
    term shuffle).  Rows are sorted by (shard_min, first docid) — the
    docid tiebreak keeps the output deterministic when incremental appends
    put two disjoint docid ranges into the same boundary shard id."""
    rows = rows.assign(_fd=first_docids(rows["docs_bytes"])).sort_values(
        ["shard_min", "_fd"], kind="mergesort"
    )
    d_lens = rows["docs_bytes"].str.len().to_numpy()
    t_lens = rows["tfs_bytes"].str.len().to_numpy()
    p_lens = rows["pos_bytes"].str.len().to_numpy()
    d_base = np.cumsum(d_lens) - d_lens
    t_base = np.cumsum(t_lens) - t_lens
    p_base = np.cumsum(p_lens) - p_lens

    def shift(col: str, base: np.ndarray) -> list:
        out = []
        for i, arr in enumerate(rows[col]):
            out.extend(int(x) + int(base[i]) for x in arr)
        return out

    def cat(col: str) -> list:
        out = []
        for arr in rows[col]:
            out.extend(int(x) for x in arr)
        return out

    return {
        "term": rows["term"].iloc[0],
        "salt": int(rows["salt"].iloc[0]),
        "shard_min": int(rows["shard_min"].min()),
        "shard_max": int(rows["shard_max"].max()),
        "df": int(rows["df"].sum()),
        "cttf": int(rows["cttf"].sum()),
        "docs_bytes": b"".join(rows["docs_bytes"]),
        "tfs_bytes": b"".join(rows["tfs_bytes"]),
        "pos_bytes": b"".join(rows["pos_bytes"]),
        "blk_first": cat("blk_first"),
        "blk_last": cat("blk_last"),
        "blk_n": cat("blk_n"),
        "blk_max_tf": cat("blk_max_tf"),
        "blk_min_norm": cat("blk_min_norm"),
        "blk_doc_off": shift("blk_doc_off", d_base),
        "blk_tf_off": shift("blk_tf_off", t_base),
        "blk_pos_off": shift("blk_pos_off", p_base),
        "blk_pareto_n": cat("blk_pareto_n"),
        "blk_pareto_tf": cat("blk_pareto_tf"),
        "blk_pareto_norm": cat("blk_pareto_norm"),
    }


def merge_partition(pdf: pd.DataFrame, max_bytes: int | None = None) -> pd.DataFrame:
    """Vectorized multi-group merge: same result as merge_rows() applied to
    every (term, salt) group of ``pdf``, but one pandas/numpy pass over the
    whole partition (no per-group Arrow round-trips).  Sort includes the
    first-docid tiebreak (see merge_rows) for determinism under
    incremental boundary-shard collisions.

    ``max_bytes`` (r5, the 10^12-turn row-width knob — SCALE.md §8):
    cap the concatenation so one (term, salt) group emits a ROW PER
    shard-RUN of ~max_bytes of docs_bytes instead of one unbounded row —
    a hot term's merged row otherwise grows with corpus/n_salts and must
    fit task memory.  Runs split at input-row (= shard) boundaries, so
    every reader works unchanged: decode concatenates a term's rows, the
    query-time shard split and the planner treat rows independently.
    Grouping by the exclusive running sum's max_bytes window is
    deterministic for a given sorted input."""
    pdf = (
        pdf.assign(_fd=first_docids(pdf["docs_bytes"]))
        .sort_values(["term", "salt", "shard_min", "_fd"], kind="mergesort")
        .drop(columns="_fd")
        .reset_index(drop=True)
    )
    n = len(pdf)
    new_group = (
        (pdf["term"] != pdf["term"].shift()) | (pdf["salt"] != pdf["salt"].shift())
    ).to_numpy()
    if max_bytes:
        base_gid = np.cumsum(new_group) - 1
        dlens = pdf["docs_bytes"].str.len().to_numpy(dtype=np.int64)
        c = np.cumsum(dlens)
        excl = c - dlens
        gfirst = np.nonzero(new_group)[0]
        gcounts = np.diff(np.append(gfirst, n))
        excl_in_group = excl - np.repeat(excl[gfirst], gcounts)
        window = excl_in_group // int(max_bytes)
        new_group = new_group | np.concatenate(([True], window[1:] != window[:-1]))
    gid = np.cumsum(new_group) - 1
    first = np.nonzero(np.diff(gid, prepend=-1))[0]
    counts = np.diff(np.append(first, n))
    g = pdf.groupby(gid, sort=False)

    out: dict[str, object] = {
        "term": pdf["term"].to_numpy()[first],
        "salt": pdf["salt"].to_numpy()[first],
        "shard_min": g["shard_min"].min().to_numpy(),
        "shard_max": g["shard_max"].max().to_numpy(),
        "df": g["df"].sum().to_numpy(),
        "cttf": g["cttf"].sum().to_numpy(),
    }
    # bytes per group = contiguous slice of the whole-column concatenation
    # (rows are sorted by group) — one join + memoryview slices instead of
    # a per-group Python lambda
    for col in ("docs_bytes", "tfs_bytes", "pos_bytes"):
        vals = pdf[col].to_numpy()
        lens = np.fromiter((len(b) for b in vals), dtype=np.int64, count=n)
        ends = np.cumsum(lens)
        grp_end = ends[np.append(first[1:] - 1, n - 1)]
        grp_start = np.concatenate(([0], grp_end[:-1]))
        full = memoryview(b"".join(vals))
        out[col] = [bytes(full[int(a) : int(b)]) for a, b in zip(grp_start, grp_end)]

    def split_by_group(flat: np.ndarray, per_row_lens: np.ndarray) -> list:
        per_group = np.zeros(first.size, dtype=np.int64)
        np.add.at(per_group, gid, per_row_lens)
        return np.split(flat, np.cumsum(per_group)[:-1])

    for col in ("blk_first", "blk_last", "blk_n", "blk_max_tf", "blk_min_norm",
                "blk_pareto_n", "blk_pareto_tf", "blk_pareto_norm"):
        arrs = [np.asarray(a, dtype=np.int64) for a in pdf[col]]
        lens = np.array([a.size for a in arrs], dtype=np.int64)
        flat = np.concatenate(arrs) if arrs else np.empty(0, np.int64)
        out[col] = split_by_group(flat, lens)

    for col, bcol in (("blk_doc_off", "docs_bytes"), ("blk_tf_off", "tfs_bytes"), ("blk_pos_off", "pos_bytes")):
        blens = pdf[bcol].str.len().to_numpy(dtype=np.int64)
        c = np.cumsum(blens)
        group_start_base = (c - blens)[first]
        base = (c - blens) - np.repeat(group_start_base, counts)  # within-group excl. cumsum
        arrs = [np.asarray(a, dtype=np.int64) for a in pdf[col]]
        lens = np.array([a.size for a in arrs], dtype=np.int64)
        flat = np.concatenate(arrs) if arrs else np.empty(0, np.int64)
        shifted = flat + np.repeat(base, lens)
        out[col] = split_by_group(shifted, lens)

    return pd.DataFrame(out, columns=[c.split()[0] for c in SEGMENT_SCHEMA.split(", ")])


# ---- decode -----------------------------------------------------------------

def decode_docs_tfs_blocks(row, keep: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode only the blocks selected by boolean mask ``keep`` — legal
    because delta chains restart absolute at every block boundary, so
    dropping whole blocks never breaks the cumsum.  This is the unit of
    block-max pruning in the distributed query path."""
    if keep.all():
        return decode_docs_tfs(row)
    blk_n = np.asarray(row["blk_n"], dtype=np.int64)
    if not keep.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    doff = np.asarray(row["blk_doc_off"], dtype=np.int64)
    toff = np.asarray(row["blk_tf_off"], dtype=np.int64)
    d_ends = np.append(doff[1:], len(row["docs_bytes"]))
    t_ends = np.append(toff[1:], len(row["tfs_bytes"]))
    idx = np.nonzero(keep)[0]
    dbuf = b"".join(row["docs_bytes"][doff[i] : d_ends[i]] for i in idx)
    tbuf = b"".join(row["tfs_bytes"][toff[i] : t_ends[i]] for i in idx)
    gaps = varint.decode(dbuf).astype(np.int64)
    tfs = varint.decode(tbuf).astype(np.int64)
    docids = _segmented_cumsum(gaps, blk_n[keep])
    return docids, tfs


def decode_docs_tfs(row) -> tuple[np.ndarray, np.ndarray]:
    """Full-row decode -> (docids int64, tfs int64), ascending docids."""
    gaps = varint.decode(row["docs_bytes"]).astype(np.int64)
    tfs = varint.decode(row["tfs_bytes"]).astype(np.int64)
    blk_n = np.asarray(row["blk_n"], dtype=np.int64)
    docids = _segmented_cumsum(gaps, blk_n)
    return docids, tfs


def decode_positions_blocks(row, keep: np.ndarray, kept_tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Positions for a block-pruned row: pos gaps restart per entry and
    blocks are entry-aligned, so kept blocks' pos byte slices concatenate
    into a valid stream whose entry lengths are the kept tfs."""
    if keep.all():
        return decode_positions(row, kept_tfs)
    poff = np.asarray(row["blk_pos_off"], dtype=np.int64)
    p_ends = np.append(poff[1:], len(row["pos_bytes"]))
    idx = np.nonzero(keep)[0]
    pbuf = b"".join(row["pos_bytes"][poff[i] : p_ends[i]] for i in idx)
    pgaps = varint.decode(pbuf).astype(np.int64)
    off = np.concatenate(([0], np.cumsum(kept_tfs)))
    pos = _segmented_cumsum(pgaps, kept_tfs)
    return pos, off


def decode_positions(row, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-> (flat positions int64, entry offsets int64[n+1]); positions of
    entry i are flat[off[i]:off[i+1]] (ascending within entry)."""
    pgaps = varint.decode(row["pos_bytes"]).astype(np.int64)
    off = np.concatenate(([0], np.cumsum(tfs)))
    pos = _segmented_cumsum(pgaps, tfs)
    return pos, off


def _segmented_cumsum(vals: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Cumsum restarting at each segment (first value absolute)."""
    if vals.size == 0:
        return vals
    seg_lens = seg_lens[seg_lens > 0]
    c = np.cumsum(vals)
    starts = np.cumsum(seg_lens) - seg_lens
    base = np.zeros(starts.size, dtype=np.int64)
    base[1:] = c[starts[1:] - 1]
    return c - np.repeat(base, seg_lens)
