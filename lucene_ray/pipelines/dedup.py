"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All four follow the same distributed shape, designed for 100 TB inputs:

1. a stateless ``map_batches`` pass derives per-doc keys (fingerprint /
   shingle hashes / minhash bands / simhash bands) — pure streaming;
2. ONE ``groupby`` on a bounded hash-bucket key co-locates potential
   duplicates (never the raw key: bucket count is fixed, so group count —
   and per-group Python overhead — is O(buckets), not O(keys));
3. candidate pairs stay a **Dataset**: they are deduplicated by a second
   bounded-bucket groupby, joined back to per-doc signatures with the
   partitioned ``hash_join``, and verified **vectorized inside the plan**.
   Nothing corpus-sized — and no candidate set — is ever materialized on
   the driver; only the final verified pair table (tiny by construction)
   leaves the plan.

Determinism: every hash is content-derived (md5 / keyed siphash via
``pandas.util.hash_array`` / crc32), never Python ``hash``; the MinHash
permutations come from a fixed-seed generator — re-runs and retries are
byte-stable (SURVEY.md §7.5.7).
"""

from __future__ import annotations

import hashlib
import re
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import crc32_array
from ..functions.rounding import round_half_away

_TOKEN_RE = re.compile(r"[a-z0-9]+")

#: pandas.util.hash_array key (keyed siphash, stable across processes and
#: pandas versions) — must be exactly 16 bytes
_HASH_KEY = "lucene_ray_dedup"

#: 64-bit odd multiplier (splitmix64 / golden-ratio constant) for key mixing
_GOLD = np.uint64(0x9E3779B97F4A7C15)

PAIRS_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
)

_PAIR_KEY_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("key", pa.uint64()), ("_bucket", pa.int32())]
)


def _hash_strings_u64(values: Sequence[str]) -> np.ndarray:
    """Vectorized deterministic 64-bit string hash (keyed siphash)."""
    if len(values) == 0:
        return np.empty(0, dtype=np.uint64)
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=False)


# ---------------------------------------------------------------------------
# Exact dedup (reference analogue: updateDocument-by-unique-term,
# core/.../index/IndexWriter.java:1845 — last write wins there; we keep the
# smallest doc_id, i.e. the earliest row, like dedup_exact_by_url)
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Keep the smallest ``id_col`` per identical ``text_col`` (md5 key).

    -> Dataset(doc_id, fingerprint) of surviving rows.
    """

    def fingerprint_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        fps = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
        bucket = crc32_array(fps) % num_buckets
        return pa.table(
            {
                "doc_id": batch.column(id_col),
                "fingerprint": pa.array(fps, pa.string()),
                "_bucket": pa.array(bucket.astype(np.int32)),
            }
        )

    def first_per_fp(group: pa.Table) -> pa.Table:
        g = group.group_by("fingerprint").aggregate([("doc_id", "min")])
        return pa.table(
            {
                "doc_id": g.column("doc_id_min").cast(pa.int64()),
                "fingerprint": g.column("fingerprint"),
            }
        )

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(fingerprint_batch, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(first_per_fp, batch_format="pyarrow")
    )


def fingerprint_dedup(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "en_nostem_simple",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Token-set (fingerprint) dedup: :func:`exact_dedup` keyed on the
    FingerprintFilter output (analysis/common/.../miscellaneous/
    FingerprintFilter.java — the Solr/OpenRefine fingerprint dedup key):
    two docs collapse when their SORTED UNIQUE analyzed token sets are
    equal, regardless of word order, repetition, case or stopwords.
    Empty streams key as ``''``. Same bounded-bucket plan as
    :func:`exact_dedup` (bucketed groupby on the key hash, min doc wins).

    -> Dataset(doc_id, fingerprint) of surviving rows.
    """
    from ..functions.analysis import make_analyzer

    def fingerprint_batch(batch: pa.Table) -> pa.Table:
        an = make_analyzer(f"fingerprint:{analyzer}")
        texts = batch.column(text_col).to_pylist()
        fps = []
        for t in texts:
            toks = an.analyze(t or "")
            fps.append(toks[0] if toks else "")
        bucket = crc32_array(fps) % num_buckets
        return pa.table(
            {
                "doc_id": batch.column(id_col),
                "fingerprint": pa.array(fps, pa.string()),
                "_bucket": pa.array(bucket.astype(np.int32)),
            }
        )

    def first_per_fp(group: pa.Table) -> pa.Table:
        g = group.group_by("fingerprint").aggregate([("doc_id", "min")])
        return pa.table(
            {
                "doc_id": g.column("doc_id_min").cast(pa.int64()),
                "fingerprint": g.column("fingerprint"),
            }
        )

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(fingerprint_batch, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(first_per_fp, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Word-shingle machinery shared by jaccard / minhash
# ---------------------------------------------------------------------------


def shingle_strings(text: str, k: int = 3) -> List[str]:
    toks = _TOKEN_RE.findall((text or "").lower())
    if len(toks) < k:
        return []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _doc_shingle_flat(
    batch: pa.Table, k: int
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """-> (doc_ids_nonempty, counts_per_doc, flat distinct shingles)."""
    out_docs: List[int] = []
    counts: List[int] = []
    flat: List[str] = []
    for did, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        sh = set(shingle_strings(text, k))
        if not sh:
            continue
        out_docs.append(did)
        counts.append(len(sh))
        flat.extend(sh)
    return (
        np.asarray(out_docs, dtype=np.int64),
        np.asarray(counts, dtype=np.int64),
        flat,
    )


def _shingle_hash_rows(batch: pa.Table, k: int, num_buckets: int) -> pa.Table:
    """(doc_id, text) -> distinct (doc_id, key=hash64(shingle), _bucket)."""
    docs, counts, flat = _doc_shingle_flat(batch, k)
    h = _hash_strings_u64(flat)
    doc_rep = np.repeat(docs, counts)
    bucket = (h % np.uint64(num_buckets)).astype(np.int32)
    return pa.table(
        {
            "doc_id": pa.array(doc_rep),
            "key": pa.array(h, pa.uint64()),
            "_bucket": pa.array(bucket),
        },
        schema=_PAIR_KEY_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Dataset-native candidate pair machinery
# ---------------------------------------------------------------------------


def _concat_aranges(counts: np.ndarray) -> np.ndarray:
    """[arange(c) for c in counts] concatenated, fully vectorized."""
    if len(counts) == 0:
        return np.empty(0, dtype=np.int64)
    cs = np.cumsum(counts)
    total = int(cs[-1])
    if total == 0:
        return np.empty(0, dtype=np.int64)
    return np.arange(total, dtype=np.int64) - np.repeat(cs - counts, counts)


def _pairs_in_group(
    group: pa.Table,
    df_min: int,
    df_max: int,
    value_col: Optional[str] = None,
) -> pa.Table:
    """All within-key doc pairs for keys shared by df_min..df_max docs.

    Vectorized: one sort by (key, doc_id), run-length key slicing, and the
    standard repeat/arange construction of all O(df^2) pairs per qualifying
    run — no per-key Python loop. ``df_max`` bounds the per-key blowup
    exactly like the heavy-term split bounds posting groups. docs are
    ascending within a run, so doc_a < doc_b by construction.

    ``value_col`` (optional) carries a per-doc payload through as
    ``val_a`` / ``val_b`` (used by simhash verification).
    """
    cols = {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    if value_col is not None:
        cols["val_a"] = pa.array([], pa.uint64())
        cols["val_b"] = pa.array([], pa.uint64())
    empty = pa.table(cols)
    n = len(group)
    if n == 0:
        return empty
    g = group.sort_by([("key", "ascending"), ("doc_id", "ascending")])
    keys = g.column("key").to_numpy()
    docs = g.column("doc_id").to_numpy()
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(change)
    lengths = np.diff(np.append(starts, n))
    ok = (lengths >= max(df_min, 2)) & (lengths <= df_max)
    starts, lengths = starts[ok], lengths[ok]
    if len(starts) == 0:
        return empty
    # per kept element: its run start and local position 0..len-1
    elem_start = np.repeat(starts, lengths)
    local = _concat_aranges(lengths)
    gidx = elem_start + local  # global row of each kept element
    # element at local pos p pairs (as doc_b) with its p predecessors
    b_idx = np.repeat(gidx, local)
    a_idx = np.repeat(elem_start, local) + _concat_aranges(local)
    a = docs[a_idx].astype(np.int64)
    b = docs[b_idx].astype(np.int64)
    # in-group dedupe: near-dup docs share MANY keys, so the same pair is
    # emitted once per shared key — collapsing here (one lexsort) keeps the
    # downstream pair shuffle proportional to distinct pairs, not shared
    # keys (measured 45x blowup on a 0.8-threshold corpus without it)
    if len(a) > 1:
        order = np.lexsort((b, a))
        a, b, a_idx = a[order], b[order], a_idx[order]
        keep = np.empty(len(a), dtype=bool)
        keep[0] = True
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b, a_idx = a[keep], b[keep], a_idx[keep]
        b_idx = b_idx[order][keep]
    out = {
        "doc_a": pa.array(a),
        "doc_b": pa.array(b),
    }
    if value_col is not None:
        vals = g.column(value_col).to_numpy()
        out["val_a"] = pa.array(vals[a_idx], pa.uint64())
        out["val_b"] = pa.array(vals[b_idx], pa.uint64())
    return pa.table(out)


def _dedup_pairs_ds(
    pair_ds: "ray.data.Dataset", num_buckets: int
) -> "ray.data.Dataset":
    """Distinct (doc_a, doc_b) rows, computed in-plan: re-bucket by a pair
    hash (bounded key space), then one vectorized lexsort-dedupe per group.
    Extra columns ride along (their values are equal for equal pairs)."""

    def rebucket(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.uint64)
        b = batch.column("doc_b").to_numpy().astype(np.uint64)
        h = ((a * _GOLD) ^ b) % np.uint64(num_buckets)
        return batch.append_column("_pbucket", pa.array(h.astype(np.int32)))

    def uniq(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return group.drop_columns(["_pbucket"])
        a = group.column("doc_a").to_numpy()
        b = group.column("doc_b").to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.empty(n, dtype=bool)
        keep[0] = True
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        taken = group.take(pa.array(order[keep]))
        return taken.drop_columns(["_pbucket"])

    return (
        pair_ds.map_batches(rebucket, batch_format="pyarrow")
        .groupby("_pbucket")
        .map_groups(uniq, batch_format="pyarrow")
    )


def candidate_pairs_ds(
    keyed: "ray.data.Dataset",
    df_min: int,
    df_max: int,
    num_buckets: int,
    dedupe: bool = True,
) -> "ray.data.Dataset":
    """(doc_id, key, _bucket) rows -> Dataset(doc_a, doc_b) of doc pairs
    sharing >=1 key with df_min..df_max holders. Entirely in-plan.
    ``dedupe=False`` skips the distinct pass (one less shuffle) when the
    consumer dedupes anyway — the Jaccard verifier does, in the same
    groupby that gathers each pair's signatures."""

    def pairs_fn(group: pa.Table) -> pa.Table:
        return _pairs_in_group(group, df_min, df_max)

    raw = keyed.groupby("_bucket").map_groups(pairs_fn, batch_format="pyarrow")
    return _dedup_pairs_ds(raw, num_buckets) if dedupe else raw


# ---------------------------------------------------------------------------
# Exact Jaccard verification, Dataset-native
# ---------------------------------------------------------------------------


def _shingle_sig_batch(batch: pa.Table, k: int) -> pa.Table:
    """Task-pool wrapper (cheap init — see _minhash_batch)."""
    return ShingleSigStage(k)(batch)


class ShingleSigStage:
    """(doc_id, text) -> (doc_id, sig: binary) — each doc's distinct shingle
    set as sorted 64-bit hashes packed little-endian into one binary value
    (binary, not list<uint64>: Arrow's hash join can't carry list payload
    columns). 64-bit keyed siphash makes a cross-shingle collision (which
    could perturb one intersection count by 1) a ~2^-64-per-pair event —
    negligible against the exact-string oracle."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs, counts, flat = _doc_shingle_flat(batch, self.k)
        h = _hash_strings_u64(flat)
        nd = len(docs)
        if nd == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "sig": pa.array([], pa.binary()),
                }
            )
        doc_idx = np.repeat(np.arange(nd, dtype=np.int64), counts)
        order = np.lexsort((h, doc_idx))
        hs, ds_ = h[order], doc_idx[order]
        keep = np.empty(len(hs), dtype=bool)
        keep[0] = True
        keep[1:] = (ds_[1:] != ds_[:-1]) | (hs[1:] != hs[:-1])
        hs, ds_ = hs[keep], ds_[keep]
        new_counts = np.bincount(ds_, minlength=nd)
        offsets = (
            np.concatenate(([0], np.cumsum(new_counts))) * 8
        ).astype(np.int32)
        sig = pa.BinaryArray.from_buffers(
            pa.binary(),
            nd,
            [
                None,
                pa.py_buffer(offsets.tobytes()),
                pa.py_buffer(np.ascontiguousarray(hs, dtype="<u8").tobytes()),
            ],
        )
        return pa.table({"doc_id": pa.array(docs), "sig": sig})


def _binary_u64_matrix(col) -> Tuple[np.ndarray, np.ndarray]:
    """binary column of packed uint64 runs -> (flat values in row order,
    per-row element counts). Buffer-level gather — no per-row Python."""
    la = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(la)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    bufs = la.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[la.offset : la.offset + n + 1]
    nbytes = len(bufs[2])
    data = np.frombuffer(bufs[2], dtype=np.uint64, count=nbytes // 8)
    lens = ((offs[1:] - offs[:-1]) // 8).astype(np.int64)
    starts = (offs[:-1] // 8).astype(np.int64)
    idx = np.repeat(starts, lens) + _concat_aranges(lens)
    return data[idx], lens


def _jaccard_verify_batch(batch: pa.Table, threshold: float) -> pa.Table:
    """(doc_a, doc_b, sig_a, sig_b) -> verified (doc_a, doc_b, jaccard).

    Fully vectorized across pairs: both signature lists are flattened with a
    pair-id column, sorted by (pair, value); adjacent duplicates within a
    pair are exactly the intersection elements (each side is internally
    unique), counted with one bincount. Threshold applies to the UNROUNDED
    jaccard (matching the SQL oracle); the output value is rounded."""
    npairs = len(batch)
    if npairs == 0:
        return PAIRS_SCHEMA.empty_table()
    va, na = _binary_u64_matrix(batch.column("sig_a"))
    vb, nb = _binary_u64_matrix(batch.column("sig_b"))
    pid = np.concatenate(
        [
            np.repeat(np.arange(npairs, dtype=np.int64), na),
            np.repeat(np.arange(npairs, dtype=np.int64), nb),
        ]
    )
    vals = np.concatenate([va, vb])
    order = np.lexsort((vals, pid))
    pid, vals = pid[order], vals[order]
    dup = np.zeros(len(vals), dtype=bool)
    dup[1:] = (pid[1:] == pid[:-1]) & (vals[1:] == vals[:-1])
    inter = np.bincount(pid[dup], minlength=npairs).astype(np.float64)
    union = na.astype(np.float64) + nb.astype(np.float64) - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        j = np.where(union > 0, inter / np.maximum(union, 1.0), 0.0)
    keep = j >= threshold
    return pa.table(
        {
            "doc_a": batch.column("doc_a").to_numpy()[keep],
            "doc_b": batch.column("doc_b").to_numpy()[keep],
            "jaccard": pa.array(round_half_away(j[keep], 4), pa.float64()),
        },
        schema=PAIRS_SCHEMA,
    )


_GATHER_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("slot", pa.int8()),  # 0 = doc_a side, 1 = doc_b side, -1 = sig row
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("sig", pa.binary()),
        ("_dbucket", pa.int32()),
    ]
)

_ATTACH_SCHEMA = pa.schema(
    [
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("slot", pa.int8()),
        ("sig", pa.binary()),
        ("_pbucket", pa.int32()),
    ]
)


def _jaccard_verify_ds(
    ds: "ray.data.Dataset",
    pairs_ds: "ray.data.Dataset",
    k: int,
    threshold: float,
    num_buckets: int,
) -> "ray.data.Dataset":
    """Exact-Jaccard verification in TWO shuffles, signatures computed and
    shuffled exactly once: candidate pairs explode into one row per member
    doc, union with the per-doc signature rows, a doc-hash groupby attaches
    each row's signature, and a pair-hash groupby deduplicates candidates
    and verifies them vectorized. (A pairs⋈sigs double hash_join would
    re-execute the signature pipeline per join and add two more all-to-all
    rounds.) Pairs may arrive duplicated (cross-band collisions) — the
    verify group dedupes them for free in its own shuffle."""
    sigs = ds.select_columns(["doc_id", "text"]).map_batches(
        _shingle_sig_batch, batch_format="pyarrow", fn_kwargs={"k": k}
    )

    def explode_pairs(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy()
        b = batch.column("doc_b").to_numpy()
        n = len(a)
        doc = np.concatenate([a, b])
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "slot": pa.array(
                    np.concatenate(
                        [np.zeros(n, np.int8), np.ones(n, np.int8)]
                    )
                ),
                "doc_a": pa.array(np.concatenate([a, a])),
                "doc_b": pa.array(np.concatenate([b, b])),
                "sig": pa.nulls(2 * n, pa.binary()),
                "_dbucket": pa.array(
                    (
                        (doc.astype(np.uint64) * _GOLD)
                        % np.uint64(num_buckets)
                    ).astype(np.int32)
                ),
            },
            schema=_GATHER_SCHEMA,
        )

    def tag_sigs(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        n = len(doc)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "slot": pa.array(np.full(n, -1, np.int8)),
                "doc_a": pa.array(np.zeros(n, np.int64)),
                "doc_b": pa.array(np.zeros(n, np.int64)),
                "sig": batch.column("sig"),
                "_dbucket": pa.array(
                    (
                        (doc.astype(np.uint64) * _GOLD)
                        % np.uint64(num_buckets)
                    ).astype(np.int32)
                ),
            },
            schema=_GATHER_SCHEMA,
        )

    def attach(group: pa.Table) -> pa.Table:
        slots = group.column("slot").to_numpy()
        is_sig = slots == -1
        pair_tbl = group.filter(pa.array(~is_sig))
        if len(pair_tbl) == 0:
            return _ATTACH_SCHEMA.empty_table()
        sig_tbl = group.filter(pa.array(is_sig))
        sdocs = sig_tbl.column("doc_id").to_numpy()
        order = np.argsort(sdocs, kind="stable")
        sdocs_s = sdocs[order]
        pdocs = pair_tbl.column("doc_id").to_numpy()
        if len(sdocs_s):
            pos = np.minimum(
                np.searchsorted(sdocs_s, pdocs), len(sdocs_s) - 1
            )
            found = sdocs_s[pos] == pdocs
            sig_col = sig_tbl.column("sig").take(pa.array(order[pos]))
            sig_col = pc.if_else(
                pa.array(found), sig_col.combine_chunks(), pa.scalar(b"", pa.binary())
            )
        else:
            sig_col = pa.array([b""] * len(pair_tbl), pa.binary())
        a = pair_tbl.column("doc_a").to_numpy()
        b = pair_tbl.column("doc_b").to_numpy()
        pbucket = (
            ((a.astype(np.uint64) * _GOLD) ^ b.astype(np.uint64))
            % np.uint64(num_buckets)
        ).astype(np.int32)
        return pa.table(
            {
                "doc_a": pair_tbl.column("doc_a"),
                "doc_b": pair_tbl.column("doc_b"),
                "slot": pair_tbl.column("slot"),
                "sig": sig_col,
                "_pbucket": pa.array(pbucket),
            },
            schema=_ATTACH_SCHEMA,
        )

    def verify_group(group: pa.Table) -> pa.Table:
        n = len(group)
        if n == 0:
            return PAIRS_SCHEMA.empty_table()
        a = group.column("doc_a").to_numpy()
        b = group.column("doc_b").to_numpy()
        s = group.column("slot").to_numpy()
        order = np.lexsort((s, b, a))
        a, b, s = a[order], b[order], s[order]
        keep = np.empty(n, dtype=bool)
        keep[0] = True
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (s[1:] != s[:-1])
        taken = group.take(pa.array(order[keep]))
        s_k = s[keep]
        half_a = taken.filter(pa.array(s_k == 0))
        half_b = taken.filter(pa.array(s_k == 1))
        # after dedupe every pair has exactly one row per slot, both sorted
        # by (doc_a, doc_b) — sides align row-for-row
        batch = pa.table(
            {
                "doc_a": half_a.column("doc_a"),
                "doc_b": half_a.column("doc_b"),
                "sig_a": half_a.column("sig"),
                "sig_b": half_b.column("sig"),
            }
        )
        return _jaccard_verify_batch(batch, threshold)

    gathered = (
        pairs_ds.map_batches(explode_pairs, batch_format="pyarrow")
        .union(sigs.map_batches(tag_sigs, batch_format="pyarrow"))
        .groupby("_dbucket")
        .map_groups(attach, batch_format="pyarrow")
    )
    return gathered.groupby("_pbucket").map_groups(
        verify_group, batch_format="pyarrow"
    )


def _collect_pairs_table(
    out_ds: "ray.data.Dataset", sort_cols, schema: pa.Schema
) -> pa.Table:
    """Materialize the FINAL verified pair set (tiny by construction) as a
    sorted Arrow table — the only point where results leave the plan."""
    rows = out_ds.take_all()
    if not rows:
        return schema.empty_table()
    tbl = pa.Table.from_pylist(rows, schema=schema)
    return tbl.sort_by([(c, "ascending") for c in sort_cols])


def jaccard_neardup_pairs_ds(
    ds: "ray.data.Dataset",
    k: int = 3,
    df_max: int = 10,
    threshold: float = 0.8,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Near-dup pairs by exact word-``k``-gram Jaccard, fully in-plan.

    Candidates = doc pairs sharing >=1 *rare* shingle (2 <= df <= df_max —
    common shingles prove nothing and would blow up quadratically); each
    candidate is verified with the exact Jaccard over full shingle-hash
    signatures via a distributed pairs⋈signatures join.
    -> Dataset(doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    keyed = ds.select_columns(["doc_id", "text"]).map_batches(
        _shingle_hash_rows,
        batch_format="pyarrow",
        fn_kwargs={"k": k, "num_buckets": num_buckets},
    )
    # dedupe BEFORE the signature gather: pair rows are 16 bytes, attach
    # rows carry signatures — the small extra shuffle is far cheaper than
    # exploding duplicated pairs through the two gather shuffles
    pairs = candidate_pairs_ds(keyed, 2, df_max, num_buckets, dedupe=True)
    return _jaccard_verify_ds(ds, pairs, k, threshold, num_buckets)


def jaccard_neardup_pairs(
    ds: "ray.data.Dataset",
    k: int = 3,
    df_max: int = 10,
    threshold: float = 0.8,
    num_buckets: int = 64,
) -> pa.Table:
    """:func:`jaccard_neardup_pairs_ds` collected to a sorted Arrow table."""
    return _collect_pairs_table(
        jaccard_neardup_pairs_ds(ds, k, df_max, threshold, num_buckets),
        ["doc_a", "doc_b"],
        PAIRS_SCHEMA,
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE31 = (1 << 31) - 1


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE31, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: List[str], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of universal hashes (a*h + b) mod 2^31-1, fully
    vectorized in uint64 (31-bit operands can't overflow the products)."""
    if not shingles:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    h = _hash_strings_u64(shingles) & np.uint64(_MERSENNE31)
    m = (h[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE31)
    return m.min(axis=0)


def _minhash_batch(
    batch: pa.Table, k: int, num_perm: int, bands: int, num_buckets: int
) -> pa.Table:
    """Task-pool wrapper: MinHash setup (fixed-seed permutation params) is
    trivially cheap, so a plain function avoids actor-pool startup — the
    stateful-actor rule applies to EXPENSIVE init only (ray_guide)."""
    return MinHashStage(k, num_perm, bands, num_buckets)(batch)


class MinHashStage:
    """Per batch the signature matrix is computed for ALL docs at once —
    one universal hash per permutation over the batch's flat shingle rows
    and a ``np.minimum.reduceat`` per doc (no per-doc Python loop or
    matmul)."""

    def __init__(self, k: int, num_perm: int, bands: int, num_buckets: int):
        self.k = k
        self.a, self.b = _minhash_params(num_perm)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs, counts, flat = _doc_shingle_flat(batch, self.k)
        nd = len(docs)
        if nd == 0:
            return _PAIR_KEY_SCHEMA.empty_table()
        h = _hash_strings_u64(flat) & np.uint64(_MERSENNE31)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        sig = np.empty((self.num_perm, nd), dtype=np.uint64)
        for p in range(self.num_perm):
            v = (h * self.a[p] + self.b[p]) % np.uint64(_MERSENNE31)
            sig[p] = np.minimum.reduceat(v, starts)
        # band key: salted polynomial mix of the band's rows (lossless
        # equality up to a ~2^-64 mixing collision; verification is exact)
        keys = np.empty((self.bands, nd), dtype=np.uint64)
        for band in range(self.bands):
            acc = np.full(nd, np.uint64(band + 1), dtype=np.uint64)
            for r in range(band * self.rows, (band + 1) * self.rows):
                acc = acc * _GOLD + sig[r]
            keys[band] = acc
        out_doc = np.tile(docs, self.bands)
        out_key = keys.reshape(-1)
        bucket = (out_key % np.uint64(self.num_buckets)).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(out_doc),
                "key": pa.array(out_key, pa.uint64()),
                "_bucket": pa.array(bucket),
            },
            schema=_PAIR_KEY_SCHEMA,
        )


def minhash_neardup_pairs_ds(
    ds: "ray.data.Dataset",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    num_buckets: int = 64,
    max_band_df: int = 50,
) -> "ray.data.Dataset":
    """MinHash+LSH candidate generation, exact-Jaccard verification, in-plan.

    shingle -> 64-perm minhash -> 16 bands x 4 rows; docs colliding in any
    band become candidates (P[collide] = 1-(1-j^4)^16, ~0.99 at j=0.8);
    verification makes the output exact: (doc_a, doc_b, jaccard>=threshold),
    identical to :func:`jaccard_neardup_pairs` whenever LSH recall holds.
    """
    banded = ds.select_columns(["doc_id", "text"]).map_batches(
        _minhash_batch,
        batch_format="pyarrow",
        fn_kwargs={
            "k": k, "num_perm": num_perm, "bands": bands,
            "num_buckets": num_buckets,
        },
    )
    pairs = candidate_pairs_ds(banded, 2, max_band_df, num_buckets, dedupe=True)
    return _jaccard_verify_ds(ds, pairs, k, threshold, num_buckets)


def minhash_neardup_pairs(
    ds: "ray.data.Dataset",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    num_buckets: int = 64,
    max_band_df: int = 50,
) -> pa.Table:
    """:func:`minhash_neardup_pairs_ds` collected to a sorted Arrow table."""
    return _collect_pairs_table(
        minhash_neardup_pairs_ds(
            ds, k, num_perm, bands, threshold, num_buckets, max_band_df
        ),
        ["doc_a", "doc_b"],
        PAIRS_SCHEMA,
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(tokens: List[str]) -> int:
    """Charikar simhash over the token multiset (weight = tf)."""
    if not tokens:
        return 0
    uniq = {}
    for t in tokens:
        uniq[t] = uniq.get(t, 0) + 1
    h = _hash_strings_u64(list(uniq.keys()))
    w = np.fromiter(uniq.values(), dtype=np.float64, count=len(uniq))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.float64
    )
    acc = ((2.0 * bits - 1.0) * w[:, None]).sum(axis=0)
    return int(
        np.bitwise_or.reduce(
            (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount."""
    if hasattr(np, "bitwise_count"):  # numpy >= 2.0
        return np.bitwise_count(x).astype(np.int64)
    out = np.zeros(len(x), dtype=np.int64)
    x = x.copy()
    for _ in range(64):
        out += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return out


def _simhash_batch(batch: pa.Table, hamming_max: int, num_buckets: int) -> pa.Table:
    """Task-pool wrapper (cheap init — see _minhash_batch)."""
    return SimHashStage(hamming_max, num_buckets)(batch)


class SimHashStage:
    """(doc_id, text) -> one (doc_id, key, sim, _bucket) row per band.

    Batch-vectorized simhash: per-(doc, token) tf weights once, then 64
    ``np.add.reduceat`` passes (one per bit) over the flat rows — no
    per-doc Python loop. Pigeonhole banding: the 64-bit simhash is cut
    into hamming_max+1 bands; any pair within distance h agrees on >=1
    band (reference-free standard construction, Charikar 2002 / Manku
    et al. 2007)."""

    def __init__(self, hamming_max: int, num_buckets: int):
        self.n_bands = hamming_max + 1
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs_out: List[int] = []
        counts: List[int] = []
        flat: List[str] = []
        weights: List[int] = []
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = _TOKEN_RE.findall((text or "").lower())
            if not toks:
                continue
            uniq = {}
            for t in toks:
                uniq[t] = uniq.get(t, 0) + 1
            docs_out.append(did)
            counts.append(len(uniq))
            flat.extend(uniq.keys())
            weights.extend(uniq.values())
        nd = len(docs_out)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "key": pa.array([], pa.uint64()),
                "sim": pa.array([], pa.uint64()),
                "_bucket": pa.array([], pa.int32()),
            }
        )
        if nd == 0:
            return empty
        docs = np.asarray(docs_out, dtype=np.int64)
        cnt = np.asarray(counts, dtype=np.int64)
        w = np.asarray(weights, dtype=np.float64)
        h = _hash_strings_u64(flat)
        starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        wtot = np.add.reduceat(w, starts)
        sim = np.zeros(nd, dtype=np.uint64)
        for j in range(64):
            bit = ((h >> np.uint64(j)) & np.uint64(1)).astype(np.float64)
            s1 = np.add.reduceat(w * bit, starts)
            # sign of sum((2b-1)w) = 2*s1 - wtot
            sim |= (2.0 * s1 > wtot).astype(np.uint64) << np.uint64(j)
        # band rows
        width = 64 // self.n_bands
        out_doc = np.tile(docs, self.n_bands)
        out_sim = np.tile(sim, self.n_bands)
        keys = np.empty((self.n_bands, nd), dtype=np.uint64)
        for band in range(self.n_bands):
            lo = band * width
            hi = 64 if band == self.n_bands - 1 else lo + width
            chunk = (sim >> np.uint64(lo)) & (
                (np.uint64(1) << np.uint64(hi - lo)) - np.uint64(1)
                if hi - lo < 64
                else np.uint64(0xFFFFFFFFFFFFFFFF)
            )
            salt = np.uint64(
                ((band + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            )
            keys[band] = salt ^ (chunk * _GOLD + chunk)
        out_key = keys.reshape(-1)
        bucket = (out_key % np.uint64(self.num_buckets)).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(out_doc),
                "key": pa.array(out_key, pa.uint64()),
                "sim": pa.array(out_sim, pa.uint64()),
                "_bucket": pa.array(bucket),
            }
        )


def simhash_neardup_pairs_ds(
    ds: "ray.data.Dataset",
    hamming_max: int = 3,
    num_buckets: int = 64,
    max_band_df: int = 50,
) -> "ray.data.Dataset":
    """Near-dup pairs with simhash Hamming distance <= hamming_max, in-plan.

    Band collisions generate candidates (with each doc's simhash riding
    along), the popcount verification happens vectorized inside the plan,
    and the verified pairs are distinct-ed by a bounded-bucket groupby.
    -> Dataset(doc_a, doc_b, hamming)."""
    banded = ds.select_columns(["doc_id", "text"]).map_batches(
        _simhash_batch,
        batch_format="pyarrow",
        fn_kwargs={"hamming_max": hamming_max, "num_buckets": num_buckets},
    )

    def pairs_fn(group: pa.Table) -> pa.Table:
        return _pairs_in_group(group, 2, max_band_df, value_col="sim")

    cand = banded.groupby("_bucket").map_groups(pairs_fn, batch_format="pyarrow")

    def verify(batch: pa.Table) -> pa.Table:
        sa = batch.column("val_a").to_numpy().astype(np.uint64)
        sb = batch.column("val_b").to_numpy().astype(np.uint64)
        ham = _popcount64(sa ^ sb)
        keep = ham <= hamming_max
        return pa.table(
            {
                "doc_a": batch.column("doc_a").to_numpy()[keep],
                "doc_b": batch.column("doc_b").to_numpy()[keep],
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    verified = cand.map_batches(verify, batch_format="pyarrow")
    return _dedup_pairs_ds(verified, num_buckets)


def simhash_neardup_pairs(
    ds: "ray.data.Dataset",
    hamming_max: int = 3,
    num_buckets: int = 64,
    max_band_df: int = 50,
) -> pa.Table:
    """:func:`simhash_neardup_pairs_ds` collected to a sorted Arrow table."""
    return _collect_pairs_table(
        simhash_neardup_pairs_ds(ds, hamming_max, num_buckets, max_band_df),
        ["doc_a", "doc_b"],
        pa.schema(
            [
                ("doc_a", pa.int64()),
                ("doc_b", pa.int64()),
                ("hamming", pa.int64()),
            ]
        ),
    )


def keep_list_from_pairs(all_ids: np.ndarray, pairs: pa.Table) -> np.ndarray:
    """Greedy keep-first dedup: drop any doc that near-dups a smaller id."""
    drop = set(pairs.column("doc_b").to_pylist())
    mask = ~np.isin(all_ids, np.asarray(sorted(drop), dtype=np.int64))
    return all_ids[mask]


# ---------------------------------------------------------------------------
# Connected components over near-dup pairs (dedup clustering)
# ---------------------------------------------------------------------------

CLUSTERS_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("cluster_id", pa.int64())]
)


def connected_components_ds(
    pairs: "ray.data.Dataset",
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 30,
) -> "ray.data.Dataset":
    """Connected components over an undirected pair Dataset by min-label
    propagation -> Dataset(doc_id, cluster_id) for every doc that appears
    in at least one pair; cluster_id = the smallest doc_id reachable
    (docs with no duplicate pair are implicitly their own singleton and
    are NOT emitted).

    Distributed shape (nothing driver-side, no joins): each round is two
    bounded groupbys —

    1. ``groupby(node)`` over edges ∪ current labels: the group for node
       ``a`` holds its label row and its adjacency rows; re-emit the
       label to every neighbor (and to ``a`` itself);
    2. ``groupby(node).min(label)`` combines the received candidates
       into the new label (Ray pre-aggregates the min inside blocks
       before the shuffle).

    Labels only ever decrease, so the SUM of all labels is strictly
    monotone and constant exactly at the fixed point — the convergence
    test is a cheap aggregate, not a change-join. Rounds needed = graph
    diameter (web dup clusters are tiny and shallow; ``max_iters`` is a
    guard, raised on overrun). Per-round state (one row per implicated
    doc) is materialized in the OBJECT STORE between rounds — the
    standard iterative-algorithm checkpoint, never on the driver.
    """
    def sym_edges(batch: pa.Table) -> pa.Table:
        a = batch.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": np.concatenate([a, b]),
                "val": np.concatenate([b, a]),
                # tag 0 = label row, 1 = edge row (label sorts first)
                "tag": np.ones(len(a) * 2, dtype=np.int8),
            }
        )

    edges = pairs.map_batches(sym_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(CLUSTERS_SCHEMA.empty_table())

    def spread(group: pa.Table) -> pa.Table:
        node = group.column("node").to_numpy(zero_copy_only=False)
        val = group.column("val").to_numpy(zero_copy_only=False)
        tag = group.column("tag").to_numpy(zero_copy_only=False)
        # per node: label = min(node, its tag-0 rows); groups arrive
        # sorted by the groupby key, so segment boundaries are run ends
        uniq, starts = np.unique(node, return_index=True)
        ends = np.append(starts[1:], len(node))
        out_nodes: List[np.ndarray] = []
        out_labels: List[np.ndarray] = []
        for u, s, e in zip(uniq.tolist(), starts.tolist(), ends.tolist()):
            seg_tag = tag[s:e]
            seg_val = val[s:e]
            lab = seg_val[seg_tag == 0]
            label = min(int(lab.min()), u) if len(lab) else u
            nbrs = seg_val[seg_tag == 1]
            out_nodes.append(nbrs)
            out_labels.append(np.full(len(nbrs), label, dtype=np.int64))
            out_nodes.append(np.array([u], dtype=np.int64))
            out_labels.append(np.array([label], dtype=np.int64))
        return pa.table(
            {
                "node": np.concatenate(out_nodes),
                "label": np.concatenate(out_labels),
            }
        )

    labels = None
    prev_sum = None
    for _ in range(max_iters):
        if labels is None:
            u = edges
        else:

            def as_label_rows(batch: pa.Table) -> pa.Table:
                """Current labels re-enter the round twice: as label rows
                (tag 0) AND as symmetric pointer EDGES node<->label
                (tag 1, self-pointers dropped). The pointer edges are the
                pointer-doubling shortcut: labels hop through labels, so
                convergence is O(log diameter) rounds instead of
                O(diameter) — a 10^6-long dup chain converges in ~20
                rounds, not 10^6 (hash-to-min, Rastogi et al. 2012)."""
                node = batch.column("node").to_numpy(zero_copy_only=False)
                lab = batch.column("label").to_numpy(zero_copy_only=False)
                ptr = lab != node
                pn, pl = node[ptr], lab[ptr]
                return pa.table(
                    {
                        "node": np.concatenate([node, pn, pl]),
                        "val": np.concatenate([lab, pl, pn]),
                        "tag": np.concatenate(
                            [
                                np.zeros(len(node), dtype=np.int8),
                                np.ones(len(pn) * 2, dtype=np.int8),
                            ]
                        ),
                    }
                )

            u = edges.union(
                labels.map_batches(as_label_rows, batch_format="pyarrow")
            )
        cand = u.groupby("node").map_groups(spread, batch_format="pyarrow")
        labels = (
            cand.groupby("node")
            .min("label")
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b.column("node"),
                        "label": b.column("min(label)"),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cur_sum = labels.sum("label")
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_iters} rounds"
        )
    return labels.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("node"), "cluster_id": b.column("label")}
        ),
        batch_format="pyarrow",
    )


def dedup_clusters_ds(
    ds: "ray.data.Dataset",
    k: int = 3,
    df_max: int = 10,
    threshold: float = 0.8,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Near-dup CLUSTERS as a Dataset (doc_id, cluster_id) — the 100-TB
    path: verified Jaccard pairs -> in-plan connected components; consume
    with ``write_parquet`` (or join against the corpus to drop
    non-keepers). cluster_id = min doc_id of the component (the canonical
    keeper); a doc keeps itself iff doc_id == cluster_id."""
    pairs = jaccard_neardup_pairs_ds(ds, k, df_max, threshold, num_buckets)
    return connected_components_ds(pairs)


def dedup_clusters(
    ds: "ray.data.Dataset",
    k: int = 3,
    df_max: int = 10,
    threshold: float = 0.8,
    num_buckets: int = 64,
) -> pa.Table:
    """Small-result convenience wrapper over :func:`dedup_clusters_ds`:
    the cluster table (ONLY docs that belong to some near-dup component —
    tiny relative to the corpus) gathered and doc-sorted for the oracle
    entry. At scale, call dedup_clusters_ds and write_parquet instead."""
    rows = dedup_clusters_ds(ds, k, df_max, threshold, num_buckets).take_all()
    if not rows:
        return CLUSTERS_SCHEMA.empty_table()
    tbl = pa.Table.from_pylist(rows, schema=CLUSTERS_SCHEMA)
    return tbl.sort_by([("doc_id", "ascending")])
