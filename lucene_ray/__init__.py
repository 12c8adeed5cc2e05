"""lucene_ray — a Ray-Data-native inverted-index build + BM25 query engine.

Built from scratch on ray.data.Dataset / pyarrow / numpy with the query and
data-processing capabilities of the reference (Apache Lucene mirror at
/root/reference): analysis chains (tokenize -> possessive -> lowercase ->
stopword -> Porter stem), distributed posting-list construction with
FOR/PForDelta compression + skip/block-max (impact) metadata, and query-time
top-k BM25 with block-max pruning over term/boolean queries.

Layout
------
functions/  pure kernels: smallfloat, porter, tokenizer, analysis chain,
            bm25 scorers, FOR/PFor codec, impact frontiers, hashing
stages/     map_batches stage classes (analyzer actor, query exec actor,
            dedup / ann / text-stat stages, multimodal plumbing)
sources/    parquet readers, segment store (postings blobs), manifest I/O,
            deterministic web_pages fixture generator
pipelines/  build (index construction), search (query driver),
            distributed_search (sharded two-phase search), incremental
            (append batches as shards), merge (shard compaction), dedup,
            knn, textops, events (windows/sessionize), stats, multimodal,
            oracle (brute force)
state/      index state: segment reader/writer, sharded reader,
            check_index validation, manifests
"""

__version__ = "0.1.0"
