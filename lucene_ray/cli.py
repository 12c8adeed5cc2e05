"""``ray job submit`` entry points: build / search / check / compact.

The north-rule deployment path — on a cluster the driver submits

    ray job submit --working-dir . -- \\
        python -m lucene_ray.cli build \\
        --input s3://corpus/docs/*.parquet --out /shared/index \\
        --partitions 512 --heavy-df 50000 --positions

and the job connects to the running cluster (``ray.init(address="auto")``)
instead of starting a local one. Every subcommand is resumable: ``build``
re-runs skip completed segments via their checkpoint fingerprints
(pipelines/build.py), so a preempted job is re-submitted as-is. Locally
(no cluster) the same commands run against an auto-started Ray.

Guarded init only — the library itself NEVER calls ray.init (the test
fixture, bench.py and this CLI own their sessions).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init():
    import os

    import ray

    if ray.is_initialized():
        return
    # inside a cluster (ray job submit sets RAY_ADDRESS) attach to it;
    # otherwise start a local session
    if os.environ.get("RAY_ADDRESS") not in (None, "", "local"):
        ray.init(address="auto")
    else:
        ray.init(address="local", include_dashboard=False)


def _cmd_build(args) -> int:
    import ray.data

    from .pipelines.build import IndexConfig, build_index

    _init()
    cfg = IndexConfig(
        analyzer=args.analyzer,
        norm_kind=args.norm_kind,
        num_partitions=args.partitions,
        heavy_df_threshold=args.heavy_df,
        positions=args.positions,
        offsets=args.offsets,
        payloads=args.payloads,
        text_col=args.text_col,
        id_col=args.id_col,
    )
    ds = ray.data.read_parquet(
        args.input, columns=[args.id_col, args.text_col]
    )
    manifest = build_index(ds, args.out, cfg)
    print(
        json.dumps(
            {
                "out": args.out,
                "doc_count": manifest["doc_count"],
                "num_postings": manifest["num_postings"],
                "build_sec": manifest["build_sec"],
                "docs_per_sec": manifest["docs_per_sec"],
                "segments": len(manifest["segments"]),
                "resumed_segments": sum(
                    1 for s in manifest["segments"] if s.get("resumed")
                ),
            }
        )
    )
    return 0


def _cmd_search(args) -> int:
    from .functions.analysis import make_analyzer
    from .functions.query import parse_query, score_blockmax
    from .pipelines.search import get_reader

    _init()
    reader = get_reader(args.index)
    an = make_analyzer(reader.analyzer_name)
    for q in args.query:
        docs, scores = score_blockmax(reader, parse_query(q, an), args.k)
        print(
            json.dumps(
                {
                    "query": q,
                    "hits": [
                        {"doc_id": int(d), "score": float(s)}
                        for d, s in zip(docs, scores)
                    ],
                }
            )
        )
    return 0


def _cmd_check(args) -> int:
    from .state.checkindex import check_index

    _init()
    report = check_index(args.index)
    print(json.dumps({"errors": report["errors"],
                      "num_postings": report.get("num_postings")}))
    return 0 if not report["errors"] else 1


def _cmd_compact(args) -> int:
    from .pipelines.merge import compact_shards

    _init()
    manifest = compact_shards(args.shards, args.out)
    print(json.dumps({"out": args.out,
                      "doc_count": manifest["doc_count"],
                      "num_postings": manifest["num_postings"]}))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m lucene_ray.cli")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index from parquet")
    b.add_argument("--input", required=True, nargs="+",
                   help="parquet path(s)/glob(s) of the web-pages table")
    b.add_argument("--out", required=True)
    b.add_argument("--partitions", type=int, default=32)
    b.add_argument("--analyzer", default="standard_en")
    b.add_argument("--norm-kind", default="byte4",
                   choices=["byte4", "exact"])
    b.add_argument("--heavy-df", type=int, default=50_000,
                   help="term-frequency skew split threshold")
    b.add_argument("--positions", action="store_true")
    b.add_argument("--offsets", action="store_true")
    b.add_argument("--payloads", action="store_true")
    b.add_argument("--text-col", default="text")
    b.add_argument("--id-col", default="doc_id")
    b.set_defaults(fn=_cmd_build)

    s = sub.add_parser("search", help="BM25 top-k against a built index")
    s.add_argument("--index", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("query", nargs="+")
    s.set_defaults(fn=_cmd_search)

    c = sub.add_parser("check", help="CheckIndex validation")
    c.add_argument("--index", required=True)
    c.set_defaults(fn=_cmd_check)

    m = sub.add_parser("compact", help="merge shards into one index")
    m.add_argument("--shards", required=True, nargs="+")
    m.add_argument("--out", required=True)
    m.set_defaults(fn=_cmd_compact)

    args = ap.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
