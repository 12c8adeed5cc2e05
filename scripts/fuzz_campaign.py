"""Extended engine-vs-oracle fuzz campaign (run from anywhere):
6 fresh corpora (varied seed / size / zipf skew / norm kind / partition
count) x flat booleans hash-exact vs the brute-force oracle at 4 k values
+ random complex classic-syntax strings + random SimpleQueryParser strings
with the pruned executor asserted identical to the exhaustive path.
One full run = ~2,300 checks in ~3 min at 16 cpus; bump n= / ranges for
longer soaks. Exists so future rounds can soak-test executor changes
beyond the fixed-trial fuzz in tests/."""
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
# Ray workers import lucene_ray too: surface the repo on their path and
# start them from it (local mode inherits the driver env + cwd)
os.environ["PYTHONPATH"] = (
    REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
)
os.chdir(REPO)
import numpy as np
import ray

ray.init(address="local", num_cpus=16, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from test_engine_oracle import (WORDS, analyzed, build_from_lists,
                                make_corpus, random_queries)
from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import (parse_query, score_blockmax,
                                        score_exhaustive)
from lucene_ray.functions.simple_parser import parse_simple_query
from lucene_ray.pipelines.build import IndexConfig
from lucene_ray.pipelines.oracle import OracleIndex
from lucene_ray.state.reader import IndexReader

an = make_analyzer("standard_en")


def rand_classic(rng):
    parts = []
    for _ in range(int(rng.integers(1, 5))):
        kind = int(rng.integers(0, 8))
        w = lambda: str(rng.choice(WORDS))
        if kind == 0:
            parts.append(w())
        elif kind == 1:
            parts.append("+" + w())
        elif kind == 2:
            parts.append("-" + w())
        elif kind == 3:
            parts.append(f'"{w()} {w()}"')
        elif kind == 4:
            parts.append(f'"{w()} {w()}"~{int(rng.integers(0, 4))}')
        elif kind == 5:
            parts.append(w()[:3] + "*")
        elif kind == 6:
            parts.append(w() + "~1")
        else:
            parts.append(f"({w()} {w()})")
    return " ".join(parts)


def rand_simple(rng):
    parts = []
    for _ in range(int(rng.integers(1, 5))):
        kind = int(rng.integers(0, 7))
        w = lambda: str(rng.choice(WORDS))
        if kind == 0:
            parts.append(w())
        elif kind == 1:
            parts.append("-" + w())
        elif kind == 2:
            parts.append(f'"{w()} {w()}"')
        elif kind == 3:
            parts.append(f'"{w()} {w()}"~{int(rng.integers(0, 4))}')
        elif kind == 4:
            parts.append(w()[:3] + "*")
        elif kind == 5:
            parts.append(w() + "~1")
        else:
            parts.append(f"({w()} | {w()})")
        parts.append(str(rng.choice([" ", " ", " ", "|", "+"])))
    return "".join(parts[:-1])


total_flat = total_complex = total_simple = 0
for ci, (seed, n_docs, zipf, norm) in enumerate([
    (101, 300, 1.0, "byte4"), (102, 500, 1.3, "exact"),
    (103, 800, 1.8, "byte4"), (104, 350, 2.0, "exact"),
    (105, 600, 1.1, "exact"), (106, 450, 1.5, "byte4"),
]):
    doc_ids, texts = make_corpus(n_docs=n_docs, seed=seed, zipf=zipf)
    out = tempfile.mkdtemp()
    build_from_lists(out, doc_ids, texts, IndexConfig(
        num_partitions=int(3 + ci % 4), norm_kind=norm,
        heavy_df_threshold=50, sample_rate=1.0, positions=True,
    ))
    oracle = OracleIndex(doc_ids, texts, norm_kind=norm)
    reader = IndexReader(out)
    rng = np.random.default_rng(seed * 7)
    for q in analyzed(random_queries(rng, n=60), an):
        for k in (1, 5, 37, 200):
            od, osc = oracle.topk(q, k)
            bd, bsc = score_blockmax(reader, q, k)
            assert np.array_equal(od, bd), (seed, q, k)
            assert np.array_equal(osc, bsc), (seed, q, k)
            total_flat += 1
    for _ in range(40):
        text = rand_classic(rng)
        try:
            q = parse_query(text, an)
        except ValueError:
            continue
        for k in (3, 25):
            ed, esc = score_exhaustive(reader, q, k)
            bd, bsc = score_blockmax(reader, q, k)
            assert np.array_equal(ed, bd), (seed, text, k, ed, bd)
            assert np.array_equal(esc, bsc), (seed, text, k)
            total_complex += 1
    for _ in range(30):
        text = rand_simple(rng)
        q = parse_simple_query(text, an, default_operator="must")
        for k in (3, 25):
            ed, esc = score_exhaustive(reader, q, k)
            bd, bsc = score_blockmax(reader, q, k)
            assert np.array_equal(ed, bd), (seed, text, k)
            assert np.array_equal(esc, bsc), (seed, text, k)
            total_simple += 1
    print(f"corpus {ci} (seed={seed} n={n_docs} zipf={zipf} norm={norm}): ok")

print(f"CAMPAIGN OK flat={total_flat} complex={total_complex} simple={total_simple}")
ray.shutdown()
