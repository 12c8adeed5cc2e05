"""check_index: whole-index integrity validation.

Reference analogue: ``CheckIndex`` (core/.../index/CheckIndex.java) —
validates postings against the term dictionary's stats, docID ordering, and
impact (block-max) consistency across every segment, plus the manifest's
cross-segment totals. Run it after a build (or a resume) before publishing
an index to searchers.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from .reader import IndexReader
from .segment import SEGMENT_DIR, read_manifest


class IndexCorruptError(AssertionError):
    pass


def check_index(index_dir: str, raise_on_error: bool = True) -> Dict:
    """Validate every segment of ``index_dir``.

    Checks (per term-bucket posting list):
      * decoded df == term-dict doc_freq; sum tf == total_tf; max tf == max_tf
      * docIDs strictly ascending within and across a term's buckets
      * block skip data (first/last doc) matches decoded block contents
      * impact frontiers dominate their blocks: for every block, each
        (tf, key) pair is <= some frontier pair in tf with key no larger
        (the competitive-frontier upper-bound property that block-max
        pruning relies on)
    Plus manifest totals == sum over segments.
    """
    reader = IndexReader(index_dir)
    manifest = read_manifest(index_dir)
    errors: List[str] = []
    n_terms = 0
    n_postings = 0
    sum_tf = 0

    for term in reader.all_terms():
        n_terms += 1
        df_dict, ttf_dict = reader.term_stats(term)
        parts = reader.postings(term)
        prev_doc = -1
        df = ttf = 0
        maxtf = 0
        for tp in parts:
            docs, tfs, keys = tp.decode_all()
            df += len(docs)
            ttf += int(tfs.sum())
            maxtf = max(maxtf, int(tfs.max()) if len(tfs) else 0)
            if len(docs):
                if int(docs[0]) <= prev_doc:
                    errors.append(f"{term}: docIDs not ascending across buckets")
                if np.any(np.diff(docs) <= 0):
                    errors.append(f"{term}: docIDs not strictly ascending")
                prev_doc = int(docs[-1])
            # block skip + impact checks
            for b in range(tp.n_blocks):
                bd, bt, bk = tp.decode_block(b)
                if len(bd) == 0:
                    errors.append(f"{term}: empty block {b}")
                    continue
                if int(bd[0]) != int(tp.first_docs[b]) or int(bd[-1]) != int(
                    tp.last_docs[b]
                ):
                    errors.append(f"{term}: skip data mismatch in block {b}")
                ftf, fkey = tp.frontier_tfs[b], tp.frontier_keys[b]
                if len(ftf) == 0:
                    errors.append(f"{term}: block {b} has no impacts")
                    continue
                # dominance: every (tf, key) has a frontier pair with
                # frontier_tf >= tf and frontier_key <= key
                for tf_v, k_v in zip(bt.tolist(), bk.tolist()):
                    if not np.any((ftf >= tf_v) & (fkey <= k_v)):
                        errors.append(
                            f"{term}: impact frontier does not dominate "
                            f"(tf={tf_v}, key={k_v}) in block {b}"
                        )
                        break
        if df != df_dict or ttf != ttf_dict:
            errors.append(
                f"{term}: stats mismatch dict=({df_dict},{ttf_dict}) "
                f"decoded=({df},{ttf})"
            )
        n_postings += df
        sum_tf += ttf

    if n_postings != manifest["num_postings"]:
        errors.append(
            f"manifest num_postings={manifest['num_postings']} != decoded {n_postings}"
        )
    if sum_tf != manifest["sum_total_tf"]:
        errors.append(
            f"manifest sum_total_tf={manifest['sum_total_tf']} != decoded {sum_tf}"
        )
    seg_dir = os.path.join(index_dir, SEGMENT_DIR)
    import zlib

    for seg in manifest["segments"]:
        base = os.path.join(seg_dir, f"seg-{seg['gpart']:05d}")
        for suffix in (".post", ".terms.parquet"):
            if not os.path.exists(base + suffix):
                errors.append(f"missing segment file {base + suffix}")
        # per-file CRC32 (CodecUtil header/footer checksum analogue,
        # codecs/CodecUtil.java) — recorded at encode time
        for suffix, key in ((".post", "post_crc32"), (".pos", "pos_crc32"),
                            (".off", "off_crc32"), (".pay", "pay_crc32")):
            want = int(seg.get(key, -1))
            if want < 0:
                continue
            path = base + suffix
            if not os.path.exists(path):
                errors.append(f"missing {path} (crc recorded)")
                continue
            with open(path, "rb") as f:
                got = zlib.crc32(f.read())
            if got != want:
                errors.append(
                    f"{path}: crc32 mismatch (recorded {want}, file {got})"
                )

    # --- sidecar checks (round-2 formats) -------------------------------
    # positions stream: per-term position count == totalTermFreq, positions
    # strictly ascending within each doc (the span/phrase matchers' invariant)
    if getattr(reader, "has_positions", False):
        for term in reader.all_terms():
            docs, tfs, flat = reader.term_positions(term)
            if len(flat) != int(tfs.sum()):
                errors.append(
                    f"positions[{term}]: {len(flat)} positions != sum tf "
                    f"{int(tfs.sum())}"
                )
                continue
            if len(flat) > 1:
                run = np.repeat(np.arange(len(docs)), tfs)
                same = run[1:] == run[:-1]
                if np.any(np.diff(flat.astype(np.int64))[same] <= 0):
                    errors.append(
                        f"positions[{term}]: not strictly ascending in doc"
                    )

    # offsets stream (round 3): one (start, end) pair per occurrence —
    # pair count == totalTermFreq, start <= end per pair, starts
    # non-decreasing within each doc (surface tokens are in text order)
    if getattr(reader, "has_offsets", False):
        for term in reader.all_terms():
            docs, tfs, flat = reader.term_offsets(term)
            if len(flat) != 2 * int(tfs.sum()):
                errors.append(
                    f"offsets[{term}]: {len(flat)} ints != 2 * sum tf "
                    f"{int(tfs.sum())}"
                )
                continue
            starts = flat[0::2].astype(np.int64)
            ends = flat[1::2].astype(np.int64)
            ok = (starts <= ends) | (starts < 0)  # (-1,-1) = span unknown
            if not np.all(ok):
                errors.append(f"offsets[{term}]: start > end")
            if len(starts) > 1:
                run = np.repeat(np.arange(len(docs)), tfs)
                same = run[1:] == run[:-1]
                both_known = (starts[1:] >= 0) & (starts[:-1] >= 0)
                if np.any(np.diff(starts)[same & both_known] < 0):
                    errors.append(
                        f"offsets[{term}]: starts not non-decreasing in doc"
                    )

    # payloads stream (round 4): one float32 per occurrence — count ==
    # totalTermFreq, values finite-or-NaN only (NaN = token carried no
    # payload; infinities would mean a corrupted encode)
    if getattr(reader, "has_payloads", False):
        for term in reader.all_terms():
            docs, tfs, flat = reader.term_payloads(term)
            if len(flat) != int(tfs.sum()):
                errors.append(
                    f"payloads[{term}]: {len(flat)} payloads != sum tf "
                    f"{int(tfs.sum())}"
                )
                continue
            if np.any(np.isinf(flat)):
                errors.append(f"payloads[{term}]: non-finite payload value")

    # doc-values sidecars: one row per doc, unique sorted doc ids; under an
    # index_sort marker the sort field's doc-ordered values must be
    # non-decreasing (the sorted-index layout invariant)
    from .docvalues import DOCVALUES_DIR, DocValues

    dv_root = os.path.join(index_dir, DOCVALUES_DIR)
    dv_fields = (
        sorted(os.listdir(dv_root)) if os.path.isdir(dv_root) else []
    )
    for field in dv_fields:
        try:
            dv = DocValues(index_dir, field)
        except FileNotFoundError:
            continue
        ids = dv.doc_sorted_ids
        if len(ids) > 1 and np.any(np.diff(ids) <= 0):
            errors.append(f"docvalues[{field}]: duplicate or unsorted doc ids")
    # doc-values UPDATE overlays (upd-<gen>-<crc> files): generations
    # must be contiguous from 1 (a gap means a lost update generation)
    # and each file's name-embedded CRC must match its content — the
    # same tamper discipline as the postings CRCs
    import glob as _glob
    import zlib as _zlib

    import pyarrow.parquet as _pq

    for field in dv_fields:
        upds = sorted(
            _glob.glob(os.path.join(dv_root, field, "upd-*.parquet"))
        )
        gens = []
        for f in upds:
            base = os.path.basename(f)[: -len(".parquet")]
            try:
                _, gen_s, crc_s = base.split("-")
                gens.append(int(gen_s))
            except ValueError:
                errors.append(
                    f"docvalues[{field}]: malformed overlay name {base}"
                )
                continue
            t = _pq.read_table(f)
            ids = t.column("doc_id").to_numpy().astype(np.int64)
            vals = t.column("value").to_numpy().astype(np.int64)
            crc = _zlib.crc32(ids.tobytes()) ^ _zlib.crc32(vals.tobytes())
            if f"{crc:08x}" != crc_s:
                errors.append(
                    f"docvalues[{field}]: overlay {base} CRC mismatch"
                )
        if gens and sorted(gens) != list(range(1, len(gens) + 1)):
            errors.append(
                f"docvalues[{field}]: overlay generations not contiguous"
            )
    # string (SORTED) doc-values sidecars: unique sorted doc ids, ords
    # inside the dictionary, dictionary sorted+unique
    from .docvalues import DOCVALUES_STR_DIR, StrDocValues

    sdv_root = os.path.join(index_dir, DOCVALUES_STR_DIR)
    sdv_fields = (
        sorted(os.listdir(sdv_root)) if os.path.isdir(sdv_root) else []
    )
    for field in sdv_fields:
        try:
            sdv = StrDocValues(index_dir, field)
        except FileNotFoundError:
            continue
        ids = sdv.doc_sorted_ids
        if len(ids) > 1 and np.any(np.diff(ids) <= 0):
            errors.append(
                f"docvalues-str[{field}]: duplicate or unsorted doc ids"
            )
        if len(sdv.doc_sorted_ords) and (
            int(sdv.doc_sorted_ords.min()) < 0
            or int(sdv.doc_sorted_ords.max()) >= len(sdv.dictionary)
        ):
            errors.append(
                f"docvalues-str[{field}]: ordinal outside the dictionary"
            )
        d = sdv.dictionary
        if len(d) > 1 and not all(d[i] < d[i + 1] for i in range(len(d) - 1)):
            errors.append(
                f"docvalues-str[{field}]: dictionary not sorted-unique"
            )

    sort_meta = os.path.join(index_dir, "index_sort.json")
    if os.path.exists(sort_meta):
        import json

        with open(sort_meta) as f:
            sfield = json.load(f).get("field")
        if sfield in dv_fields:
            vals = DocValues(index_dir, sfield).doc_sorted_vals
            if len(vals) > 1 and np.any(np.diff(vals) < 0):
                errors.append(
                    f"index_sort[{sfield}]: doc order violates field order"
                )
        else:
            errors.append(
                f"index_sort marker references missing doc values {sfield!r}"
            )

    # term-vectors sidecar: file-name doc ranges must cover file contents
    # (the point-lookup reader prunes files by that range), tf >= 1
    from .termvectors import TERMVECTORS_DIR

    tv_dir = os.path.join(index_dir, TERMVECTORS_DIR)
    if os.path.isdir(tv_dir):
        import glob as _glob

        import pyarrow.parquet as pq

        for f in sorted(_glob.glob(os.path.join(tv_dir, "*.parquet"))):
            lo, hi = (int(x) for x in os.path.basename(f)[3:].split("-")[:2])
            t = pq.read_table(f, columns=["doc_id", "tf"])
            d = t.column("doc_id").to_numpy()
            if len(d) and (int(d.min()) < lo or int(d.max()) > hi):
                errors.append(f"termvectors {f}: docs outside named range")
            tf_col = t.column("tf").to_numpy()
            if len(tf_col) and int(tf_col.min()) < 1:
                errors.append(f"termvectors {f}: tf < 1")

    # indexed-shapes sidecar (state/shapes.py): per-file name ranges must
    # cover contents, stored bboxes must equal the vertex extremes (the
    # prune pass trusts them), vertex lists must be (lat, lon) pairs
    from .shapes import SHAPES_DIR

    sh_root = os.path.join(index_dir, SHAPES_DIR)
    if os.path.isdir(sh_root):
        import glob as _glob

        import pyarrow.parquet as pq

        for f in sorted(
            _glob.glob(os.path.join(sh_root, "*", "*.parquet"))
        ):
            lo, hi = (int(x) for x in os.path.basename(f)[3:].split("-")[:2])
            t = pq.read_table(f)
            d = t.column("doc_id").to_numpy()
            if len(d) and (int(d.min()) < lo or int(d.max()) > hi):
                errors.append(f"shapes {f}: docs outside named range")
            verts = t.column("verts").combine_chunks()
            offs = verts.offsets.to_numpy()
            vals = verts.flatten().to_numpy()
            for j in range(len(d)):
                seg = vals[offs[j]:offs[j + 1]]
                if len(seg) < 4 or len(seg) % 2:
                    errors.append(
                        f"shapes {f}: doc {d[j]} malformed vertex list"
                    )
                    continue
                if (
                    int(seg[0::2].min()) != t.column("min_lat")[j].as_py()
                    or int(seg[0::2].max()) != t.column("max_lat")[j].as_py()
                    or int(seg[1::2].min()) != t.column("min_lon")[j].as_py()
                    or int(seg[1::2].max()) != t.column("max_lon")[j].as_py()
                ):
                    errors.append(
                        f"shapes {f}: doc {d[j]} bbox != vertex extremes"
                    )

    report = {
        "index_dir": index_dir,
        "num_terms": n_terms,
        "num_postings": n_postings,
        "sum_total_tf": sum_tf,
        "num_segments": len(manifest["segments"]),
        "errors": errors,
        "ok": not errors,
    }
    if errors and raise_on_error:
        raise IndexCorruptError("; ".join(errors[:10]))
    return report
