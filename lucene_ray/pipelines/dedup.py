"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

All four follow the same distributed shape, designed for 100 TB inputs:

1. a stateless ``map_batches`` pass derives per-doc keys (fingerprint /
   shingles / minhash bands / simhash bands) — pure streaming, no shuffle;
2. ONE ``groupby`` on a bounded hash-bucket key co-locates potential
   duplicates (never the raw key: bucket count is fixed, so group count —
   and per-group Python overhead — is O(buckets), not O(keys));
3. candidate pairs are verified exactly; only near-dup *candidates* (a tiny
   fraction of the corpus by construction) ever leave the distributed plan.

Determinism: every hash is content-derived (md5 / blake2b / crc32), never
Python ``hash``; the MinHash permutations come from a fixed-seed generator —
re-runs and retries are byte-stable (SURVEY.md §7.5.7).
"""

from __future__ import annotations

import hashlib
import itertools
import re
from typing import Dict, Iterable, List, Sequence, Set, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import crc32_array
from ..functions.rounding import round_half_away

_TOKEN_RE = re.compile(r"[a-z0-9]+")

PAIRS_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
)


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


# ---------------------------------------------------------------------------
# Word-shingle machinery shared by jaccard / minhash
# ---------------------------------------------------------------------------


def shingle_strings(text: str, k: int = 3) -> List[str]:
    toks = _TOKEN_RE.findall((text or "").lower())
    if len(toks) < k:
        return []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _shingle_rows(batch: pa.Table, k: int, num_buckets: int) -> pa.Table:
    """(doc_id, text) -> distinct (doc_id, shingle, _bucket) rows."""
    out_doc: List[int] = []
    out_sh: List[str] = []
    for did, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        for s in set(shingle_strings(text, k)):
            out_doc.append(did)
            out_sh.append(s)
    bucket = crc32_array(out_sh) % num_buckets if out_sh else np.empty(0, np.int64)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "shingle": pa.array(out_sh, pa.string()),
            "_bucket": pa.array(bucket.astype(np.int32)),
        }
    )


def _pairs_table(pairs: Iterable[Tuple[int, int]]) -> pa.Table:
    a, b = [], []
    for da, db in pairs:
        a.append(da)
        b.append(db)
    return pa.table({"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())})


def _candidate_pairs_by_key(
    keyed: "ray.data.Dataset", key_col: str, df_min: int, df_max: int
) -> List[Tuple[int, int]]:
    """groupby(_bucket) -> within-bucket vectorized grouping by ``key_col``;
    keys shared by df_min..df_max docs emit all doc pairs. Returns the
    deduplicated pair list (driver-side: candidates are small by design —
    ``df_max`` bounds the per-key blowup exactly like the heavy-term split
    bounds posting groups)."""

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        g = group.group_by(key_col).aggregate([("doc_id", "list")])
        pairs: Set[Tuple[int, int]] = set()
        for docs in g.column("doc_id_list").to_pylist():
            if df_min <= len(docs) <= df_max:
                for da, db in itertools.combinations(sorted(set(docs)), 2):
                    pairs.add((da, db))
        return _pairs_table(sorted(pairs))

    pair_ds = keyed.groupby("_bucket").map_groups(
        pairs_in_bucket, batch_format="pyarrow"
    )
    seen: Set[Tuple[int, int]] = set()
    for batch in pair_ds.iter_batches(batch_format="pyarrow"):
        seen.update(
            zip(batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist())
        )
    return sorted(seen)


def _exact_jaccard_for_pairs(
    ds: "ray.data.Dataset",
    pairs: Sequence[Tuple[int, int]],
    k: int,
) -> pa.Table:
    """Exact shingle-set Jaccard for candidate pairs: the shingle sets of
    only the implicated docs are gathered (broadcast doc-id filter pushed
    into the scan), then compared on the driver."""
    if not pairs:
        return PAIRS_SCHEMA.empty_table()
    docs_needed = sorted({d for p in pairs for d in p})
    needed_ref = ray.put(np.asarray(docs_needed, dtype=np.int64))

    def collect_sets(batch: pa.Table) -> pa.Table:
        needed = ray.get(needed_ref)
        ids = batch.column("doc_id").to_numpy()
        mask = np.isin(ids, needed)
        sub = batch.filter(pa.array(mask))
        out_doc, out_sh = [], []
        for did, text in zip(
            sub.column("doc_id").to_pylist(), sub.column("text").to_pylist()
        ):
            out_doc.append(did)
            out_sh.append(list(set(shingle_strings(text, k))))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "shingles": pa.array(out_sh, pa.list_(pa.string())),
            }
        )

    sets: Dict[int, Set[str]] = {}
    for batch in (
        ds.select_columns(["doc_id", "text"])
        .map_batches(collect_sets, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for did, sh in zip(
            batch.column("doc_id").to_pylist(), batch.column("shingles").to_pylist()
        ):
            sets[did] = set(sh)
    rows_a, rows_b, rows_j = [], [], []
    for da, db in pairs:
        sa, sb = sets.get(da, set()), sets.get(db, set())
        union = len(sa | sb)
        j = (len(sa & sb) / union) if union else 0.0
        rows_a.append(da)
        rows_b.append(db)
        rows_j.append(float(round_half_away(j, 4)))
    return pa.table(
        {
            "doc_a": pa.array(rows_a, pa.int64()),
            "doc_b": pa.array(rows_b, pa.int64()),
            "jaccard": pa.array(rows_j, pa.float64()),
        }
    )


def jaccard_neardup_pairs(
    ds: "ray.data.Dataset",
    k: int = 3,
    df_max: int = 10,
    threshold: float = 0.8,
    num_buckets: int = 64,
) -> pa.Table:
    """Near-dup pairs by exact word-``k``-gram Jaccard.

    Candidates = doc pairs sharing >=1 *rare* shingle (2 <= df <= df_max —
    common shingles prove nothing and would blow up quadratically); each
    candidate is verified with the exact Jaccard over full shingle sets.
    -> Arrow table (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    sh = ds.select_columns(["doc_id", "text"]).map_batches(
        _shingle_rows, batch_format="pyarrow", fn_kwargs={"k": k, "num_buckets": num_buckets}
    )
    pairs = _candidate_pairs_by_key(sh, "shingle", 2, df_max)
    verified = _exact_jaccard_for_pairs(ds, pairs, k)
    keep = pc.greater_equal(verified.column("jaccard"), threshold)
    out = verified.filter(keep)
    return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE31 = (1 << 31) - 1


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE31, size=num_perm, dtype=np.uint64)
    return a, b


def _hash64(values: List[str]) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(v.encode(), digest_size=8).digest(), "big")
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


def minhash_signature(shingles: List[str], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm minima of universal hashes (a*h + b) mod 2^31-1, fully
    vectorized in uint64 (31-bit operands can't overflow the products)."""
    if not shingles:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    h = _hash64(shingles) & np.uint64(_MERSENNE31)
    # (n_shingles, num_perm) matrix of (a*h+b) mod p, min along shingles
    m = (h[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE31)
    return m.min(axis=0)


class MinHashStage:
    """Actor stage: permutation params generated once per worker."""

    def __init__(self, k: int, num_perm: int, bands: int, num_buckets: int):
        self.k = k
        self.a, self.b = _minhash_params(num_perm)
        self.bands = bands
        self.rows = num_perm // bands
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_doc: List[int] = []
        out_key: List[str] = []
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sh = list(set(shingle_strings(text, self.k)))
            if not sh:
                continue
            sig = minhash_signature(sh, self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows : (band + 1) * self.rows]
                out_doc.append(did)
                out_key.append(f"{band}:{chunk.tobytes().hex()}")
        bucket = (
            crc32_array(out_key) % self.num_buckets if out_key else np.empty(0, np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band_key": pa.array(out_key, pa.string()),
                "_bucket": pa.array(bucket.astype(np.int32)),
            }
        )


def minhash_neardup_pairs(
    ds: "ray.data.Dataset",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    num_buckets: int = 64,
    max_band_df: int = 50,
) -> pa.Table:
    """MinHash+LSH candidate generation, exact-Jaccard verification.

    shingle -> 64-perm minhash -> 16 bands x 4 rows; docs colliding in any
    band become candidates (P[collide] = 1-(1-j^4)^16, ~0.99 at j=0.8);
    verification makes the output exact: (doc_a, doc_b, jaccard>=threshold),
    identical to :func:`jaccard_neardup_pairs` whenever LSH recall holds.
    """
    banded = ds.select_columns(["doc_id", "text"]).map_batches(
        MinHashStage,
        fn_constructor_args=(k, num_perm, bands, num_buckets),
        batch_format="pyarrow",
        concurrency=4,
    )
    pairs = _candidate_pairs_by_key(banded, "band_key", 2, max_band_df)
    verified = _exact_jaccard_for_pairs(ds, pairs, k)
    out = verified.filter(pc.greater_equal(verified.column("jaccard"), threshold))
    return out.sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(tokens: List[str]) -> int:
    """Charikar simhash over the token multiset (weight = tf)."""
    if not tokens:
        return 0
    uniq: Dict[str, int] = {}
    for t in tokens:
        uniq[t] = uniq.get(t, 0) + 1
    h = _hash64(list(uniq.keys()))
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


class SimHashStage:
    def __init__(self, hamming_max: int, num_buckets: int):
        self.n_bands = hamming_max + 1  # pigeonhole: <=h bits differ =>
        self.num_buckets = num_buckets  # some band of h+1 is identical

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_doc: List[int] = []
        out_key: List[str] = []
        out_sim: List[int] = []
        width = 64 // self.n_bands
        for did, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = _TOKEN_RE.findall((text or "").lower())
            if not toks:
                continue
            sh = simhash64(toks)
            for band in range(self.n_bands):
                lo = band * width
                hi = 64 if band == self.n_bands - 1 else lo + width
                chunk = (sh >> lo) & ((1 << (hi - lo)) - 1)
                out_doc.append(did)
                out_key.append(f"{band}:{chunk:x}")
                out_sim.append(sh)
        bucket = (
            crc32_array(out_key) % self.num_buckets if out_key else np.empty(0, np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "band_key": pa.array(out_key, pa.string()),
                "simhash": pa.array(out_sim, pa.uint64()),
                "_bucket": pa.array(bucket.astype(np.int32)),
            }
        )


def simhash_neardup_pairs(
    ds: "ray.data.Dataset",
    hamming_max: int = 3,
    num_buckets: int = 64,
    max_band_df: int = 50,
) -> pa.Table:
    """Near-dup pairs with simhash Hamming distance <= hamming_max.

    Pigeonhole blocking: the 64-bit simhash is cut into hamming_max+1 bands;
    any pair within distance h agrees on at least one band, so candidates =
    band collisions, verified by popcount. -> (doc_a, doc_b, hamming).
    """
    banded = ds.select_columns(["doc_id", "text"]).map_batches(
        SimHashStage,
        fn_constructor_args=(hamming_max, num_buckets),
        batch_format="pyarrow",
        concurrency=4,
    )

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        g = group.group_by("band_key").aggregate(
            [("doc_id", "list"), ("simhash", "list")]
        )
        a_out, b_out, ha, hb = [], [], [], []
        for docs, hashes in zip(
            g.column("doc_id_list").to_pylist(), g.column("simhash_list").to_pylist()
        ):
            if 2 <= len(docs) <= max_band_df:
                items = sorted(set(zip(docs, hashes)))
                for (da, sa), (db, sb) in itertools.combinations(items, 2):
                    a_out.append(da)
                    b_out.append(db)
                    ha.append(sa)
                    hb.append(sb)
        return pa.table(
            {
                "doc_a": pa.array(a_out, pa.int64()),
                "doc_b": pa.array(b_out, pa.int64()),
                "sim_a": pa.array(ha, pa.uint64()),
                "sim_b": pa.array(hb, pa.uint64()),
            }
        )

    cand = banded.groupby("_bucket").map_groups(pairs_in_bucket, batch_format="pyarrow")
    rows: Dict[Tuple[int, int], int] = {}
    for batch in cand.iter_batches(batch_format="pyarrow"):
        da = batch.column("doc_a").to_numpy()
        db = batch.column("doc_b").to_numpy()
        xa = batch.column("sim_a").to_numpy()
        xb = batch.column("sim_b").to_numpy()
        ham = np.zeros(len(da), dtype=np.int64)
        x = xa ^ xb
        for _ in range(64):  # vectorized popcount
            ham += (x & 1).astype(np.int64)
            x >>= np.uint64(1)
        for i in range(len(da)):
            if ham[i] <= hamming_max:
                rows[(int(da[i]), int(db[i]))] = int(ham[i])
    out = sorted((p, h) for p, h in rows.items())
    return pa.table(
        {
            "doc_a": pa.array([p[0] for p, h in out], pa.int64()),
            "doc_b": pa.array([p[1] for p, h in out], pa.int64()),
            "hamming": pa.array([h for p, h in out], pa.int64()),
        }
    )


def keep_list_from_pairs(all_ids: np.ndarray, pairs: pa.Table) -> np.ndarray:
    """Greedy keep-first dedup: drop any doc that near-dups a smaller id."""
    drop = set(pairs.column("doc_b").to_pylist())
    mask = ~np.isin(all_ids, np.asarray(sorted(drop), dtype=np.int64))
    return all_ids[mask]
