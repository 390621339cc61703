"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init``/``ray.shutdown`` here or in the library.

Implemented pipelines (SURVEY.md §2 + training-data operators):
- inverted-index build products (vocabulary / doc_lens / postings)
- BM25 and TF-IDF top-k (rank-level vs a float64 DuckDB oracle;
  exact ties break by doc_id in both engines — see kernel.py)
- dedup: exact, n-gram Jaccard, MinHash-LSH with join-based exact
  verification (both against the exact-Jaccard SQL oracle), SimHash
  (md5-based, bit-exact SQL oracle), embedding near-dup (distributed
  block-pair exact, SQL oracle)
- ANN cosine top-k: brute-force and LSH-with-exact-rerank (both
  against the brute-force SQL oracle; the LSH query runs at
  recall-1.0 parameters, verified deterministic)
- text analysis: quality stats, BPE-ish token counts, language-ID
  heuristic, per-source token totals, winnowing fingerprints
  (rolling-hash SQL oracle)
- events: tumbling-window aggregate (integer-cents exact)
- multimodal: payload plumbing + stubbed decode features (rows-only)
- round 4: boolean retrieval, positional phrase/proximity search,
  wildcard prefix scans, KWIC snippets, offline index merge
  (merged_postings shares the whole-corpus postings oracle),
  tombstone-masked BM25 (deleted_bm25_topk), token-budget mixture
  sampling, large-large shuffle hash join (order_priority_join);
  extended search surface: fuzzy term~d (bit-parallel Levenshtein),
  spell suggestion, regex term queries (RE2 both sides), faceted
  counts, more-like-this, stateless search_after pagination, field
  collapsing, BM25F weighted fields, hybrid sparse+dense fusion,
  per-term score explanation (value-exact), integer-exact Lloyd
  k-means over embeddings, Lucene-style query strings (boolean
  structure over term/phrase/prefix/fuzzy/field leaves, query_string),
  function_score exp decay (decay_topk), sort-by-field retrieval
  (sort_by_field), bucket ranking by max BM25 (grouped_topk),
  per-doc term vectors (term_vectors)
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

import numpy as np

TOPK_QUERIES = {
    "q1": "table scan join",
    "q2": "window batch stream",
    "q3": "hash merge filter",
    "q4": "customer order part",
    "q5": "spark big data",
}
POSTING_TERMS = ["table", "scan", "window", "dup", "customer"]
BOOLEAN_QUERIES = {
    "b1": {"must": ["table scan"], "must_not": ["spark"]},
    "b2": {"should": ["window stream"], "must_not": ["customer"]},
    "b3": {"must": ["hash"], "should": ["merge filter join"]},
}
MSM_QUERIES = {  # Lucene minimum_should_match semantics
    "m1": {"should": ["merge filter join"], "minimum_should_match": 2},
    "m2": {
        "must": ["hash"],
        "should": ["merge filter join"],
        "minimum_should_match": 1,
    },
    "m3": {
        "should": ["window stream"],
        "must_not": ["customer"],
        "minimum_should_match": 2,
    },
}
PHRASE_QUERIES = {
    "p1": "table scan",
    "p2": "batch batch",  # overlapping-occurrence stress
    "p3": "big data",
    "p4": "key order sort",
}
PROXIMITY_QUERIES = {
    "x1": ("hash", "join", 3),
    "x2": ("window", "stream", 2),
    "x3": ("data", "data", 4),  # same-term: self-pairs excluded
}
# two-phase rescoring: (query_text, proximity term pair, window);
# final = bm25 + RESCORE_BOOST * ln(1 + n_pairs) over the top
# RESCORE_FIRST_N BM25 candidates (search/rescore.py)
RESCORE_QUERIES = {
    "r1": ("table scan join", "hash", "join", 3),
    "r2": ("window batch stream", "window", "stream", 2),
}
RESCORE_FIRST_N = 50
RESCORE_BOOST = 0.5
PREFIX_QUERIES = {"w1": "s", "w2": "c", "w3": "qu"}
# (term, max_edit_distance); expansions exercise 1-term, multi-term
# and empty sets over the sf vocabulary ("par"~2 -> {a, part, spark})
FUZZY_QUERIES = {
    "f1": ("tabel", 2),
    "f2": ("scam", 1),
    "f3": ("par", 2),
    "f4": ("jion", 2),
    "f5": ("zzzzz", 1),
}
RANGE_FACET_EDGES = [0, 200, 400, 600, 800, 10_000]
SIGTERMS_TOPK = 10
SIGTERMS_MIN_DF_FG = 2
COLLAPSE_FIELD = "lang"
COLLAPSE_PER_VALUE = 2
COLLAPSE_CUTOFF = 6
HYBRID_PAIRS = {"q1": 0, "q2": 1, "q3": 2, "q4": 3, "q5": 4}
HYBRID_WEIGHTS = (0.7, 0.3)  # (sparse BM25, dense cosine)
ENC_DIM = 64  # hybrid_encoded_topk: HashingEncoder(md5) dimensions
ENC_SEED = 7
REGEX_QUERIES = {
    "r1": "s.*n",  # scan
    "r2": "[bc].*",  # batch/big/column/customer
    "r3": "qu(ery|een)",
    "r4": "zz+",  # no match -> no rows
}
WILDCARD_QUERIES = {
    "w1": "*usto*",   # infix, trigram-accelerated
    "w2": "s?an*",    # '?' + short runs -> full-scan fallback
    "w3": "*dow*",    # infix
    "w4": "tab*",     # prefix with a 3-byte literal run
    "w5": "*zzqqj*",  # absent trigram -> no rows
}
LM_MU = 2000.0
MLT_DOC_IDS = [0, 7, 42]
MLT_TERMS = 5
FACET_QUERIES = {"fc1": "table scan join", "fc2": "spark big data"}
PERC_QUERIES = {
    "p1": {"must": ["table scan"]},
    "p2": {"should": ["window stream"], "must_not": ["customer"]},
    "p3": {"must": ["hash"], "should": ["merge"]},  # should never gates a must
}
FACET_FIELDS = ["lang", "source"]
SUGGEST_QUERIES = {
    "s1": "tabel",
    "s2": "scann",
    "s3": "quary",
    "s4": "window",  # exact vocabulary hit -> itself at distance 0
    "s5": "zzzzz",  # no candidate within distance 2 -> no row
}
SUGGEST_MAX_DIST = 2
BM25F_WEIGHTS = {"title": 3, "body": 1}  # positive ints (exactness)
BM25F_TITLE_TOKENS = 5  # field split: first 5 tokens = title, rest = body
DIS_MAX_TIE = 0.3  # dis_max tie_breaker: best field + 0.3 * others
PHRASE_SUGGEST_QUERIES = {  # q_id -> misspelled two-word phrase
    "p1": ("tabl", "hashh"),
    "p2": ("window", "bach"),
    "p3": ("hashh", "mergee"),
}
BOOSTING_QUERIES = {  # q_id -> (positive_text, negative_text)
    "n1": ("table scan join", "spark"),
    "n2": ("window batch stream", "customer order"),
    "n3": ("hash merge filter", "table"),
}
NEGATIVE_BOOST = 0.4
KMEANS_K = 8
KMEANS_ITERS = 2
KMEANS_SCALE = 1024  # power of two: the quantizing multiply is exact
SEMDEDUP_TE4 = 4000  # cosine threshold 0.40 (drops ~5% of sf embeddings)
SEMDEDUP_SCALE = 64  # power of two; dim*scale^2 within the int64 bound
MIXTURE_WEIGHTS = {"src0": 0.3, "src1": 0.2, "src2": 0.1, "src3": 0.4}
MIXTURE_BUDGET = 3000
DELETED_DOC_IDS = [3, 7, 23, 99, 154, 200, 201, 202]
# Lucene-style query strings (search/querystring.py): boolean structure
# over term/phrase/prefix/fuzzy/metadata-field leaves; oracle arms in
# oracle_sql() mirror each string's candidate set + scoring terms.
QS_QUERIES = {
    "qs1": "table AND (scan OR join) AND NOT spark",
    "qs2": '"big data" AND window',
    "qs3": "qu* AND tabel~1",
    "qs4": "customer OR (merge AND NOT hash)",
    "qs5": "n_chars:[200 TO 600] AND merge AND filter",
    "qs6": "scan^3 OR join^0.5",  # query-time boosts scale the addends
    "qs7": "vector AND fast",  # 'vector' expands via QS_SYNONYMS
}
# query-time synonym map (ES synonym-filter model: each matched term
# scored with its own stats); keys chosen disjoint from qs1-qs6 terms
QS_SYNONYMS = {"vector": ["row", "column"]}
CUTOFF = 10
ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_K = 10
# function_score exp decay on a numeric field (search/decay.py):
# multiplier = DECAY_RATE ** (|n_chars - origin| / scale)
DECAY_FIELD = "n_chars"
DECAY_ORIGIN = 400.0
DECAY_SCALE = 150.0
DECAY_RATE = 0.5
SORT_FIELD = "n_chars"  # sort-by-field retrieval (search/fieldsort.py)
GROUP_FIELD = "source"  # bucket ranking by max BM25 (search/groupscore.py)
TERMVEC_DOC_IDS = [3, 17, 54, 128, 311]  # _termvectors subset

_STOPS_SQL = "('the','a','an','and','or','of','to','in','is','it','that','this','for','on','with','as','at','by','be','are')"
_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


def _docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _events(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))


def _embeddings(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _index(sf_dir: str):
    from retriv_ray.pipelines.documents import ORACLE_BM25, documents_index

    return documents_index(sf_dir, ORACLE_BM25)


# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents (full
    preprocessing chain) and stream the reference-style query batch
    through the actor-pool scorer."""
    from retriv_ray.pipelines.documents import documents_index
    from retriv_ray.config import SparseConfig

    sf_dir = "/root/testdata/sf0.001"
    r = documents_index(sf_dir, SparseConfig(score_dtype="float32"))
    queries = [{"id": q_id, "text": text} for q_id, text in TOPK_QUERIES.items()]
    return r.msearch_ds(queries, cutoff=CUTOFF, concurrency=2)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_vocabulary(sf_dir: str):
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    r = _index(sf_dir)
    parts = sorted(glob.glob(os.path.join(r.index_dir, "terms", "*.parquet")))
    return pa.concat_tables([pq.read_table(p) for p in parts]).sort_by("term")


def _q_doc_lens(sf_dir: str):
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id

    r = _index(sf_dir)
    ids = np.arange(r.index.doc_count, dtype=np.int64)
    convs, _ = r.index.to_original_ids(ids)
    return pa.Table.from_arrays(
        [
            pa.array(conv_to_doc_id(convs)),
            pa.array(r.index.doc_lens.astype(np.int64)),
        ],
        names=["doc_id", "doc_len"],
    )


def _q_postings(sf_dir: str):
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id

    r = _index(sf_dir)
    t_out, d_out, f_out = [], [], []
    for term in POSTING_TERMS:
        d, f = r.index.get_postings(term)
        convs, _ = r.index.to_original_ids(d)
        orig = conv_to_doc_id(convs)
        t_out.extend([term] * len(d))
        d_out.extend(orig.tolist())
        f_out.extend(f.astype(np.int64).tolist())
    return pa.Table.from_arrays(
        [
            pa.array(t_out, type=pa.string()),
            pa.array(d_out, type=pa.int64()),
            pa.array(f_out, type=pa.int64()),
        ],
        names=["term", "doc_id", "tf"],
    )


def _q_bm25_topk(sf_dir: str):
    from retriv_ray.pipelines.documents import topk_table

    return topk_table(_index(sf_dir), TOPK_QUERIES, CUTOFF)


def _rank_eval_per_query(sf_dir: str):
    """Shared body of rank_eval and its bootstrap: per-query exact
    integer metrics over the BM25 run vs deterministic qrels."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from retriv_ray.eval import rank_eval_ds
    from retriv_ray.pipelines.documents import topk_table

    run = ray.data.from_arrow(topk_table(_index(sf_dir), TOPK_QUERIES, CUTOFF))
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    qitems = sorted(TOPK_QUERIES.items())

    def to_qrels(batch: pa.Table) -> pa.Table:
        split = pc.split_pattern_regex(
            pc.cast(batch.column("text"), pa.string()), r"\s+"
        )
        flat = pc.list_flatten(split).combine_chunks()
        parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy()
        out_q, out_d, out_r = [], [], []
        for q_id, text in qitems:
            rel = np.zeros(batch.num_rows, dtype=np.int64)
            for t in sorted(set(text.split())):
                m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
                pres = np.zeros(batch.num_rows, dtype=bool)
                pres[parent[m]] = True
                rel += pres
            keep = rel >= 2
            out_q.extend([q_id] * int(keep.sum()))
            out_d.append(ids[keep])
            out_r.append(rel[keep])
        return pa.Table.from_arrays(
            [
                pa.array(out_q, type=pa.string()),
                pa.array(np.concatenate(out_d) if out_d else []),
                pa.array(np.concatenate(out_r) if out_r else []),
            ],
            names=["q_id", "doc_id", "rel"],
        )

    qrels = docs.map_batches(to_qrels, batch_format="pyarrow")
    return rank_eval_ds(run, qrels, k=CUTOFF)


def _q_rank_eval(sf_dir: str):
    """Distributed rank evaluation (retriv_ray/eval.py:rank_eval_ds):
    per-query MRR / nDCG@k / recall@k as exact integers over the BM25
    run vs deterministic qrels (rel = count of distinct query terms
    in the doc, kept when >= 2) — one q_id-keyed co-group, order-free
    integer DCG terms."""
    return _rank_eval_per_query(sf_dir)


def _q_deleted_bm25_topk(sf_dir: str):
    """Tombstone-masked serving: delete a handful of conversations,
    search with the ORIGINAL corpus statistics (Lucene deleted-docs
    semantics — df/avgdl unchanged until compaction), ranks recompute
    among survivors. Oracle: full-stats BM25 with the deleted doc_ids
    filtered from the ranked output."""
    import shutil as _sh

    from retriv_ray.index.tombstones import delete_conversations
    from retriv_ray.pipelines.documents import (
        CACHE_ROOT,
        ORACLE_BM25,
        topk_table,
    )
    from retriv_ray.search.searcher import RaySparseRetriever

    base = _index(sf_dir)
    key = hashlib.sha1(
        f"tomb|{os.path.abspath(sf_dir)}|{DELETED_DOC_IDS}".encode()
    ).hexdigest()[:16]
    tomb_dir = os.path.join(CACHE_ROOT, f"tomb_{key}")
    if not os.path.exists(os.path.join(tomb_dir, "manifest.json")):
        _sh.copytree(base.index_dir, tomb_dir, dirs_exist_ok=True)
        delete_conversations(
            tomb_dir, [f"d{i:012d}" for i in DELETED_DOC_IDS]
        )
    r = RaySparseRetriever(tomb_dir, ORACLE_BM25)
    return topk_table(r, TOPK_QUERIES, CUTOFF)


def _q_pruned_bm25_topk(sf_dir: str):
    """Block-max pruned (MaxScore-style) BM25 serving: same result
    contract as bm25_topk (shared oracle), scored through the
    score-safe pruned path (use_block_max=True)."""
    from retriv_ray.config import SparseConfig
    from retriv_ray.pipelines.documents import documents_index, topk_table

    cfg = SparseConfig(
        model="bm25", tokenizer="whitespace", stemmer=None, stopwords=None,
        score_dtype="float64", use_block_max=True,
    )
    return topk_table(documents_index(sf_dir, cfg), TOPK_QUERIES, CUTOFF)


def _q_bm25_and_topk(sf_dir: str):
    """Conjunctive (operator=AND) BM25: only docs containing EVERY
    query term are candidates (reference sparse_retriever.py search
    operator parameter; kernel intersect path SO-ops)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id

    r = _index(sf_dir)
    out_q, out_r, out_d = [], [], []
    for q_id, text in TOPK_QUERIES.items():
        res = r.search(text, cutoff=CUTOFF, operator="AND")
        docs = conv_to_doc_id([c for c, _t in res.keys()])
        out_q.extend([q_id] * len(docs))
        out_r.extend(range(1, len(docs) + 1))
        out_d.extend(docs.tolist())
    return pa.Table.from_arrays(
        [
            pa.array(out_q, type=pa.string()),
            pa.array(out_r, type=pa.int64()),
            pa.array(out_d, type=pa.int64()),
        ],
        names=["q_id", "rank", "doc_id"],
    )


def _q_merged_postings(sf_dir: str):
    """Incremental-ingest path: index the first and second halves of
    the corpus separately, merge_indexes them (Lucene-style segment
    append — A-only shards copied verbatim, the boundary shard + all
    B shards decoded/rebased/re-encoded by the build's canonical
    reduce), and read the POSTING_TERMS postings from the merged
    index. Oracle: the same SQL as ``postings`` over the whole corpus
    — the merge must be indistinguishable from a full build."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from retriv_ray.index.build import build_index
    from retriv_ray.index.merge import merge_indexes
    from retriv_ray.pipelines.documents import (
        CACHE_ROOT,
        ORACLE_BM25,
        conv_to_doc_id,
        documents_as_transcripts,
    )
    from retriv_ray.search.searcher import RaySparseRetriever

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    ).fetchone()[0]
    half = n_docs // 2
    key = hashlib.sha1(
        f"merged|{os.path.abspath(sf_dir)}|{half}|{sorted(ORACLE_BM25.to_json().items())}".encode()
    ).hexdigest()[:16]
    merged_dir = os.path.join(CACHE_ROOT, f"merged_{key}")
    if not os.path.exists(os.path.join(merged_dir, "manifest.json")):
        def _half(keep_lo: bool):
            def fn(batch: "pa.Table") -> "pa.Table":
                ids = conv_to_doc_id(batch.column("conv_id").to_pylist())
                m = ids < half if keep_lo else ids >= half
                return batch.take(pa.array(np.flatnonzero(m), type=pa.int64()))

            return fn

        ds = documents_as_transcripts(sf_dir)
        lo = ds.map_batches(_half(True), batch_format="pyarrow")
        hi = ds.map_batches(_half(False), batch_format="pyarrow")
        dir_a = os.path.join(CACHE_ROOT, f"merged_{key}_a")
        dir_b = os.path.join(CACHE_ROOT, f"merged_{key}_b")
        build_index(lo, dir_a, ORACLE_BM25, num_parts=4)
        build_index(hi, dir_b, ORACLE_BM25, num_parts=4)
        merge_indexes(dir_a, dir_b, merged_dir)
    r = RaySparseRetriever(merged_dir, ORACLE_BM25)
    t_out, d_out, f_out = [], [], []
    for term in POSTING_TERMS:
        d, f = r.index.get_postings(term)
        convs, _ = r.index.to_original_ids(d)
        orig = conv_to_doc_id(convs)
        t_out.extend([term] * len(d))
        d_out.extend(orig.tolist())
        f_out.extend(f.astype(np.int64).tolist())
    return pa.Table.from_arrays(
        [
            pa.array(t_out, type=pa.string()),
            pa.array(d_out, type=pa.int64()),
            pa.array(f_out, type=pa.int64()),
        ],
        names=["term", "doc_id", "tf"],
    )


def _q_boolean_search(sf_dir: str):
    """must/should/must_not boolean retrieval over the real posting
    lists (part-routed segment reads + sorted-set merges)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id
    from retriv_ray.search.boolean import boolean_search_table

    t = boolean_search_table(_index(sf_dir), BOOLEAN_QUERIES)
    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [t.column("q_id"), pa.array(docs, type=pa.int64()), t.column("n_should")],
        names=["q_id", "doc_id", "n_should"],
    )


def _q_boolean_msm(sf_dir: str):
    """Boolean retrieval with Lucene minimum_should_match: at least k
    distinct should-terms per doc, composing with must / must_not."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id
    from retriv_ray.search.boolean import boolean_search_table

    t = boolean_search_table(_index(sf_dir), MSM_QUERIES)
    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [t.column("q_id"), pa.array(docs, type=pa.int64()), t.column("n_should")],
        names=["q_id", "doc_id", "n_should"],
    )


def _docs_as_conversation_turns(sf_dir: str):
    """documents -> transcript shape (conv_id:int64 = doc_id,
    turn_idx, role, text): 5-token spans as turns, role derived
    deterministically from the span content (md5 % 3 < 2 -> 'user')
    so role runs are irregular — leading assistants, repeated users —
    and the conversation ops' latest-user logic is really exercised.
    The oracle rebuilds the identical turns in SQL."""
    import pyarrow as pa
    import ray.data

    from retriv_ray.ops.dedup import _md5_low64

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def to_turns(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        conv, tix, role, text = [], [], [], []
        for d, t in zip(ids.tolist(), batch.column("text").to_pylist()):
            toks = (t or "").split()
            for k, i in enumerate(range(0, len(toks), 5)):
                line = " ".join(toks[i : i + 5])
                conv.append(d)
                tix.append(k)
                role.append(
                    "user" if _md5_low64(line) % 3 < 2 else "assistant"
                )
                text.append(line)
        return pa.Table.from_arrays(
            [
                pa.array(np.asarray(conv, dtype=np.int64)),
                pa.array(np.asarray(tix, dtype=np.int64)),
                pa.array(role, type=pa.string()),
                pa.array(text, type=pa.string()),
            ],
            names=["conv_id", "turn_idx", "role", "text"],
        )

    return ds.map_batches(to_turns, batch_format="pyarrow")


def _q_rank_eval_bootstrap(sf_dir: str):
    """Bootstrap confidence evidence for the rank metrics
    (eval.py rank_eval_bootstrap_ds): 20 deterministic md5-weighted
    resamples over the per-query rank_eval rows — integer-exact
    weighted sums per resample, CI widths are client-side ratios."""
    from retriv_ray.eval import rank_eval_bootstrap_ds

    return rank_eval_bootstrap_ds(_rank_eval_per_query(sf_dir), n_boot=20)


def _q_response_pairs(sf_dir: str):
    """Instruction-tuning pair extraction: every assistant turn joins
    the LATEST user turn before it in the same conversation
    (ops/conversations.py:response_pairs — one conv-keyed shuffle,
    vectorized latest-user scan per group)."""
    from retriv_ray.ops.conversations import response_pairs

    return response_pairs(_docs_as_conversation_turns(sf_dir)).sort(
        ["conv_id", "assistant_turn_idx"]
    )


def _q_bpe_train(sf_dir: str):
    """Distributed BPE merge-rule training (ops/prep.py bpe_train):
    iterative global pair-count argmax, deterministic ties. The
    iterative-algorithm family member — not SQL-expressible as one
    query (like the stemmer chain), so the driver records rows-only
    and the exact semantics are pinned by the in-memory-reference
    differential test (tests/test_prep_ops.py)."""
    from retriv_ray.ops.prep import bpe_train

    return bpe_train(_docs(sf_dir), n_merges=8)


def _q_sft_spans(sf_dir: str):
    """SFT loss-mask spans (ops/conversations.py sft_spans): per-turn
    whitespace-token offsets in the conversation's concatenated stream
    + learn flag on assistant turns — one conv-keyed shuffle,
    vectorized per-group prefix sums."""
    from retriv_ray.ops.conversations import sft_spans

    return sft_spans(_docs_as_conversation_turns(sf_dir))


def _q_conversation_filter(sf_dir: str):
    """Dialog-level quality gate: keep conversations by turn count,
    token budget and role balance — integer counts only, one
    combiner-first conv-keyed shuffle; the corpus text never moves
    (ops/conversations.py:conversation_filter)."""
    from retriv_ray.ops.conversations import conversation_filter

    return conversation_filter(
        _docs_as_conversation_turns(sf_dir),
        min_turns=4,
        max_turns=50,
        min_tokens=25,
        require_both_roles=True,
    )


def _q_conversation_windows(sf_dir: str):
    """Context assembly: overlapping 3-turn windows at stride 2 per
    conversation, short conversations kept whole
    (ops/conversations.py:conversation_windows)."""
    from retriv_ray.ops.conversations import conversation_windows

    return conversation_windows(
        _docs_as_conversation_turns(sf_dir), n_turns=3, stride=2
    ).sort(["conv_id", "window_idx"])


def _q_bigram_lm(sf_dir: str):
    """Corpus bigram-LM log-probability per doc (CCNet-style quality
    signal): each bigram position contributes the quantized
    conditional floor(1e4*ln(c12/c1x)) — integer-exact end to end
    (ops/textstats.py:bigram_lm_stats; two co-group joins, no
    vocabulary broadcast)."""
    from retriv_ray.ops.textstats import bigram_lm_stats

    return bigram_lm_stats(_docs(sf_dir)).sort("doc_id")


def _q_substring_dedup(sf_dir: str):
    """ExactSubstr-style dedup (Lee et al. 2021), token-aligned at
    window=8: duplicated 8-token spans are cut from every non-first
    occurrence, overlapping cuts merge, fully-covered docs drop
    (ops/dedup.py:exact_substring_dedup; span identity = the
    doc_fingerprint polynomial hash, so the oracle reproduces it
    HUGEINT-exactly)."""
    from retriv_ray.ops.dedup import exact_substring_dedup

    return exact_substring_dedup(_docs(sf_dir), window=8).sort("doc_id")


def _q_facet_stats(sf_dir: str):
    """ES stats sub-aggregation: per-lang integer stats (count / sum /
    min / max of n_chars) over each facet query's matching set
    (search/facets.py:facet_stats; one sorted-set probe per facet
    value, stats additive across doc-range shards)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import ensure_documents_metadata
    from retriv_ray.search.facets import facet_stats

    r = _index(sf_dir)
    ensure_documents_metadata(sf_dir, r)
    parts = []
    for q_id, text in FACET_QUERIES.items():
        t = facet_stats(r, text, "lang", "n_chars")
        parts.append(
            t.add_column(
                0, "q_id", pa.array([q_id] * t.num_rows, type=pa.string())
            )
        )
    return pa.concat_tables(parts)


def _q_percolate(sf_dir: str):
    """Percolation (reverse search): registered boolean queries match
    a streamed document set — zero-shuffle map_batches, one Arrow
    is_in/index_in pass + numpy presence-matrix algebra per batch
    (search/percolate.py)."""
    return percolate_queries(sf_dir)


def percolate_queries(sf_dir: str):
    import ray.data

    from retriv_ray.search.percolate import percolate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return percolate(ds, PERC_QUERIES)


def _q_line_dedup(sf_dir: str):
    """C4-style line-level dedup (global first occurrence of every
    distinct line wins; docs re-emit with surviving lines in order,
    fully-duplicated docs drop). Input lines are synthesized
    deterministically as 5-token spans of each document so the
    corpus actually contains cross-doc duplicate lines; the oracle
    builds the identical spans in SQL (ops/dedup.py:dedup_lines —
    the text crosses exactly one shuffle; line identity moves as
    28-byte (sha1, packed) rows)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.ops.dedup import dedup_lines

    def to_lines(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out = []
        for t in texts:
            toks = (t or "").split()
            out.append(
                "\n".join(
                    " ".join(toks[i : i + 5]) for i in range(0, len(toks), 5)
                )
            )
        return pa.Table.from_arrays(
            [
                pc.cast(batch.column("doc_id"), pa.int64()),
                pa.array(out, type=pa.string()),
            ],
            names=["doc_id", "text"],
        )

    lines_ds = _docs(sf_dir).map_batches(to_lines, batch_format="pyarrow")
    return dedup_lines(lines_ds).sort("doc_id")


def _q_query_string(sf_dir: str):
    """Lucene-style query-string retrieval: one string combining
    boolean structure with term / phrase / prefix / fuzzy /
    metadata-field leaves, scored as BM25 over the candidate set
    (search/querystring.py; every leaf resolves through the engine's
    part-routed postings / term-dictionary / positional / metadata
    structures)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import (
        conv_to_doc_id,
        documents_positional_index,
        ensure_documents_metadata,
    )
    from retriv_ray.search.querystring import query_string_table

    r = _index(sf_dir)
    ensure_documents_metadata(sf_dir, r)
    px = documents_positional_index(sf_dir)
    t = query_string_table(
        r, QS_QUERIES, CUTOFF, positional=px, synonyms=QS_SYNONYMS
    )
    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [t.column("q_id"), t.column("rank"), pa.array(docs, type=pa.int64())],
        names=["q_id", "rank", "doc_id"],
    )


def _q_phrase_search(sf_dir: str):
    """Exact consecutive-phrase retrieval over the positional index
    (per-doc position postings, delta-varint encoded; overlapping
    occurrences counted)."""
    import pyarrow as pa

    from retriv_ray.index.positional import phrase_msearch_ds
    from retriv_ray.pipelines.documents import (
        conv_to_doc_id,
        documents_positional_index,
    )

    px = documents_positional_index(sf_dir)  # build-or-load cache
    ds = phrase_msearch_ds(
        px.index_dir,
        [{"id": q, "text": t} for q, t in PHRASE_QUERIES.items()],
        concurrency=2,
    )
    t = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [t.column("q_id"), pa.array(docs, type=pa.int64()), t.column("n_occ")],
        names=["q_id", "doc_id", "n_occ"],
    )


def _q_phrase_bm25_topk(sf_dir: str):
    """Ranked phrase retrieval: phrase-as-pseudo-term BM25 (tf =
    positional occurrence count, df = matching docs), doc-length
    stats from the sibling main index — the two index products
    composing."""
    import pyarrow as pa

    from retriv_ray.index.positional import phrase_bm25_table
    from retriv_ray.pipelines.documents import (
        conv_to_doc_id,
        documents_positional_index,
    )

    t = phrase_bm25_table(
        documents_positional_index(sf_dir),
        _index(sf_dir).index,
        PHRASE_QUERIES,
        cutoff=CUTOFF,
    )
    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [t.column("q_id"), t.column("rank"), pa.array(docs, type=pa.int64())],
        names=["q_id", "rank", "doc_id"],
    )


def _q_proximity_search(sf_dir: str):
    """Within-window co-occurrence retrieval over the positional
    index (|pos_a - pos_b| <= w pair counts; self-pairs excluded when
    the terms coincide)."""
    import pyarrow as pa

    from retriv_ray.index.positional import proximity_table
    from retriv_ray.pipelines.documents import (
        conv_to_doc_id,
        documents_positional_index,
    )

    t = proximity_table(documents_positional_index(sf_dir), PROXIMITY_QUERIES)
    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [t.column("q_id"), pa.array(docs, type=pa.int64()), t.column("n_pairs")],
        names=["q_id", "doc_id", "n_pairs"],
    )


def _q_rescore_topk(sf_dir: str):
    """Two-phase ranking (Lucene rescorer pattern): BM25
    top-RESCORE_FIRST_N candidates, then a proximity boost
    (+ boost * ln(1 + within-window pair count) from the positional
    index) reranks the window to the final cutoff
    (search/rescore.py)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import (
        conv_to_doc_id,
        documents_positional_index,
    )
    from retriv_ray.search.rescore import rescore_topk

    t = rescore_topk(
        _index(sf_dir),
        documents_positional_index(sf_dir),
        RESCORE_QUERIES,
        first_n=RESCORE_FIRST_N,
        boost=RESCORE_BOOST,
        cutoff=CUTOFF,
    )
    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [t.column("q_id"), t.column("rank"), pa.array(docs, type=pa.int64())],
        names=["q_id", "rank", "doc_id"],
    )


def _q_prefix_search(sf_dir: str):
    """Wildcard ``pre*`` retrieval: term-dictionary range scan (two
    searchsorted probes per sorted part file) -> part-routed postings
    fetch -> per-doc distinct-term counts."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id
    from retriv_ray.search.prefix import prefix_search_table

    t = prefix_search_table(_index(sf_dir), PREFIX_QUERIES)
    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [t.column("q_id"), pa.array(docs, type=pa.int64()), t.column("n_terms")],
        names=["q_id", "doc_id", "n_terms"],
    )


def _q_fuzzy_search(sf_dir: str):
    """Fuzzy ``term~d`` retrieval: vectorized bit-parallel Levenshtein
    scan of the sorted term dictionary (length-prefiltered, Myers
    uint64 lanes across the whole candidate set) -> disjunctive BM25
    over the expanded terms. Runs the BATCH SERVING path
    (fuzzy_msearch_ds: expansion inside worker-cached retrievers)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id
    from retriv_ray.search.fuzzy import fuzzy_msearch_ds

    qs = [
        {"id": q, "term": t, "max_dist": d}
        for q, (t, d) in FUZZY_QUERIES.items()
    ]
    t = (
        fuzzy_msearch_ds(_index(sf_dir), qs, cutoff=CUTOFF, concurrency=2)
        .to_pandas()
        .sort_values(["q_id", "rank"])
    )
    docs = conv_to_doc_id(t["conv_id"].tolist())
    return pa.Table.from_arrays(
        [
            pa.array(t["q_id"], type=pa.string()),
            pa.array(t["rank"].astype("int64")),
            pa.array(docs, type=pa.int64()),
        ],
        names=["q_id", "rank", "doc_id"],
    )


def _q_autocomplete(sf_dir: str):
    """Search-box autocomplete: top-k vocabulary completions of each
    prefix by (df desc, term) — sorted-part bracket scans, dfs read
    in place (search/prefix.py complete)."""
    import pyarrow as pa

    from retriv_ray.search.prefix import complete

    stats = _index(sf_dir).index.term_df
    q_col, t_col, d_col = [], [], []
    for q_id in sorted(PREFIX_QUERIES):
        for term, df in complete(stats, PREFIX_QUERIES[q_id], k=5):
            q_col.append(q_id)
            t_col.append(term)
            d_col.append(df)
    return pa.Table.from_arrays(
        [
            pa.array(q_col, type=pa.string()),
            pa.array(t_col, type=pa.string()),
            pa.array(np.asarray(d_col, dtype=np.int64)),
        ],
        names=["q_id", "term", "df"],
    )


def _q_spell_suggest(sf_dir: str):
    """'Did you mean': closest vocabulary term per probe — smallest
    edit distance, then highest df, then lexicographic (the fuzzy
    expansion machinery reporting (term, dist, df) triples)."""
    import pyarrow as pa

    from retriv_ray.search.fuzzy import suggest_term

    stats = _index(sf_dir).index.term_df
    q_col, s_col, d_col, f_col = [], [], [], []
    for q_id in sorted(SUGGEST_QUERIES):
        hit = suggest_term(stats, SUGGEST_QUERIES[q_id], SUGGEST_MAX_DIST)
        if hit is None:
            continue
        t, d, df = hit
        q_col.append(q_id)
        s_col.append(t)
        d_col.append(d)
        f_col.append(df)
    return pa.Table.from_arrays(
        [
            pa.array(q_col, type=pa.string()),
            pa.array(s_col, type=pa.string()),
            pa.array(np.asarray(d_col, dtype=np.int64)),
            pa.array(np.asarray(f_col, dtype=np.int64)),
        ],
        names=["q_id", "suggestion", "dist", "df"],
    )


def _q_snippets(sf_dir: str):
    """KWIC highlight snippets for each query's top-k BM25 hits: one
    streaming pass over the corpus (broadcast semi-join on the tiny
    top-k set), fixed token window around the first query-term
    occurrence."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import (
        conv_to_doc_id,
        documents_as_transcripts,
    )
    from retriv_ray.search.snippets import kwic_snippets

    t = kwic_snippets(
        _index(sf_dir),
        documents_as_transcripts(sf_dir),
        TOPK_QUERIES,
        cutoff=CUTOFF,
    )
    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [
            t.column("q_id"),
            t.column("rank"),
            pa.array(docs, type=pa.int64()),
            t.column("snippet"),
        ],
        names=["q_id", "rank", "doc_id", "snippet"],
    )


def _q_bm25_topk_sharded(sf_dir: str):
    """Same result contract as bm25_topk (same oracle SQL), served by
    the per-doc-shard scorer fan-out/merge layout — small shard_docs
    so the sf corpus spans several doc shards and the exactness of the
    per-shard top-k merge is oracle-checked."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.index.build import build_index
    from retriv_ray.pipelines.documents import (
        CACHE_ROOT,
        ORACLE_BM25,
        conv_to_doc_id,
        documents_as_transcripts,
    )
    from retriv_ray.search.sharded import ShardedSearcher

    # key covers the build inputs (parameters + config), not just the
    # source path — changing num_parts/shard_docs/ORACLE_BM25 in a
    # later round must not silently reuse a stale cached index
    key = hashlib.sha1(
        f"sharded|{os.path.abspath(sf_dir)}|np=3|sd=2048|"
        f"{sorted(ORACLE_BM25.to_json().items())}".encode()
    ).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"sharded-{key}")
    if not os.path.exists(os.path.join(index_dir, "manifest.json")):
        build_index(
            documents_as_transcripts(sf_dir), index_dir, ORACLE_BM25,
            num_parts=3, shard_docs=2048,
        )
    sh = ShardedSearcher(index_dir, ORACLE_BM25, shards_per_scorer=1)
    try:
        tbl = sh.msearch(
            [{"id": q, "text": t} for q, t in TOPK_QUERIES.items()],
            cutoff=CUTOFF,
        )
    finally:
        sh.close()
    return pa.Table.from_arrays(
        [
            tbl.column("q_id"),
            pc.cast(tbl.column("rank"), pa.int64()),
            pa.array(conv_to_doc_id(tbl.column("conv_id").to_pylist())),
        ],
        names=["q_id", "rank", "doc_id"],
    )


def _q_filtered_bm25_sharded(sf_dir: str):
    """Same result contract (and oracle SQL) as filtered_bm25_topk,
    served through the per-doc-shard grid: each shard actor evaluates
    the filter DSL against its shard-sliced MetadataIndex (local ids)
    and the driver merge stays k x shards x queries rows."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import (
        conv_to_doc_id,
        ensure_documents_metadata,
    )
    from retriv_ray.search.searcher import RaySparseRetriever
    from retriv_ray.search.sharded import ShardedSearcher

    _q_bm25_topk_sharded(sf_dir)  # ensures the sharded index exists
    from retriv_ray.pipelines.documents import CACHE_ROOT, ORACLE_BM25

    key = hashlib.sha1(
        f"sharded|{os.path.abspath(sf_dir)}|np=3|sd=2048|"
        f"{sorted(ORACLE_BM25.to_json().items())}".encode()
    ).hexdigest()[:16]
    index_dir = os.path.join(CACHE_ROOT, f"sharded-{key}")
    ensure_documents_metadata(
        sf_dir, RaySparseRetriever(index_dir, ORACLE_BM25)
    )
    sh = ShardedSearcher(index_dir, ORACLE_BM25, shards_per_scorer=1)
    try:
        tbl = sh.msearch(
            [dict(qd, id=q) for q, (qd, _sql) in FILTERED_QUERIES.items()],
            cutoff=CUTOFF,
        )
    finally:
        sh.close()
    return pa.Table.from_arrays(
        [
            tbl.column("q_id"),
            pa.array(tbl.column("rank").to_numpy().astype("int64")),
            pa.array(conv_to_doc_id(tbl.column("conv_id").to_pylist())),
        ],
        names=["q_id", "rank", "doc_id"],
    )


def _q_tfidf_topk(sf_dir: str):
    from retriv_ray.pipelines.documents import (
        ORACLE_TFIDF,
        documents_index,
        topk_table,
    )

    return topk_table(documents_index(sf_dir, ORACLE_TFIDF), TOPK_QUERIES, CUTOFF)


def _q_dedup_exact(sf_dir: str):
    from retriv_ray.ops.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def _q_ngram_jaccard(sf_dir: str):
    from retriv_ray.ops.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir), n=3, threshold=0.5)


def _q_minhash_lsh(sf_dir: str):
    """Banded-LSH candidates + join-based exact verification. LSH
    candidate recall is 1.0 on this corpus at (num_perm=64, bands=16)
    — verified against the exact operator — so the output equals
    ngram_jaccard_pairs and shares its SQL oracle."""
    from retriv_ray.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir), n=3, threshold=0.5, join_partitions=8)


def _q_simhash(sf_dir: str):
    from retriv_ray.ops.dedup import simhash64

    return simhash64(_docs(sf_dir))


def _ann_queries(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = t.column("vec_id").to_numpy()
    mask = np.isin(ids, ANN_QUERY_IDS)
    vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v, m in zip(t.column("embedding").to_pylist(), mask) if m]
    )
    return ids[mask], vecs


def _q_ann_cosine(sf_dir: str):
    import ray.data

    from retriv_ray.ops.ann import cosine_topk_bruteforce

    q_ids, q_vecs = _ann_queries(sf_dir)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return cosine_topk_bruteforce(ds, q_ids, q_vecs, k=ANN_K)


def _q_mmr_rerank(sf_dir: str):
    """MMR diversified rerank (ops/ann.py mmr_rerank): greedy
    lam*rel - (1-lam)*max-sim-to-selected over the top-20 cosine pool,
    k=8 — candidate generation distributed, per-query greedy inside
    map_groups over pool-sized groups. The oracle is the library's
    own unrolled-greedy SQL (mmr_rerank_sql), generated from the same
    constants."""
    import ray.data

    from retriv_ray.ops.ann import mmr_rerank

    q_ids, q_vecs = _ann_queries(sf_dir)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return mmr_rerank(ds, q_ids, q_vecs, k=8, pool=20, lam=0.5)


def _q_ann_filtered(sf_dir: str):
    """ES knn with filter, PRE-filter semantics (ops/ann.py
    cosine_topk_filtered): exact top-k among the vectors whose label
    is even — the predicate runs map-side per batch before any
    scoring, adding zero shuffles."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from retriv_ray.ops.ann import cosine_topk_filtered

    q_ids, q_vecs = _ann_queries(sf_dir)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))

    def even_label(batch):
        return pc.equal(
            pc.bit_wise_and(pc.cast(batch.column("label"), pa.int64()), 1), 0
        )

    return cosine_topk_filtered(
        ds, q_ids, q_vecs, even_label, k=ANN_K, exclude_self=True
    )


def _q_ann_lsh(sf_dir: str):
    """Hyperplane-LSH candidates + exact re-rank. At (n_tables=48,
    n_bits=4) candidate recall is empirically 1.0 at BOTH test scales
    (sf0.001 and sf0.01; 32 tables sufficed at sf0.01 but missed one
    neighbor at sf0.001 — deterministic seed), so the output equals
    brute-force top-k and shares its SQL oracle; production
    parameters trade recall for candidate volume."""
    import ray.data

    from retriv_ray.ops.ann import cosine_topk_lsh

    q_ids, q_vecs = _ann_queries(sf_dir)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return cosine_topk_lsh(ds, q_ids, q_vecs, k=ANN_K, n_tables=48, n_bits=4)


def _q_dedup_filter(sf_dir: str):
    """Cleaned-corpus materialization: documents minus the b-side of
    every n-gram-Jaccard near-dup pair (distributed anti-join)."""
    from retriv_ray.ops.dedup import dedup_filter, ngram_jaccard_pairs

    docs = _docs(sf_dir)
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    return dedup_filter(docs, pairs).select_columns(["doc_id"])


def _q_ann_ivf(sf_dir: str):
    """IVF cell-pruned cosine with nprobe == n_centroids (exhaustive
    probing): exercises the whole IVF machinery — k-means training,
    centroid broadcast, per-batch cell assignment + pruning — while
    remaining exactly equal to brute-force, so it shares the SQL
    oracle. Production sets nprobe << n_centroids (recall-tested in
    tests/test_ann_ivf.py)."""
    import ray.data

    from retriv_ray.ops.ann import cosine_topk_ivf

    q_ids, q_vecs = _ann_queries(sf_dir)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return cosine_topk_ivf(
        ds, q_ids, q_vecs, k=ANN_K, n_centroids=16, nprobe=16
    )


def _q_ann_pq(sf_dir: str):
    """Product-quantization cosine (Jegou 2011): driver-trained
    per-subspace codebooks, per-batch ADC lookup-table scoring, exact
    re-rank of the top ``rerank`` ADC candidates. With rerank
    comfortably above k the exact re-rank restores brute-force
    results on this corpus (asymmetric-distance recall pinned in
    tests/test_ann_ivf.py), so the query shares the brute-force SQL
    oracle like the LSH/IVF paths."""
    import ray.data

    from retriv_ray.ops.ann import cosine_topk_pq

    q_ids, q_vecs = _ann_queries(sf_dir)
    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return cosine_topk_pq(
        ds, q_ids, q_vecs, k=ANN_K, m_sub=8, ks=16, rerank=200
    )


def _q_embedding_near_dup(sf_dir: str):
    import ray.data

    from retriv_ray.ops.dedup import embedding_near_dup

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = embedding_near_dup(ds, threshold=0.4)
    return out.select_columns(["vec_id_a", "vec_id_b"])


def _q_quality(sf_dir: str):
    from retriv_ray.ops.textstats import quality_stats

    return quality_stats(_docs(sf_dir))


def _q_bpe_tokens(sf_dir: str):
    from retriv_ray.ops.textstats import bpe_token_count

    return bpe_token_count(_docs(sf_dir))


def _q_langid(sf_dir: str):
    from retriv_ray.ops.textstats import language_id

    return language_id(_docs(sf_dir))


def _q_tokens_by_source(sf_dir: str):
    from retriv_ray.ops.textstats import token_counts_by

    return token_counts_by(_docs(sf_dir), "source")


def _q_fingerprint(sf_dir: str):
    from retriv_ray.ops.textstats import doc_fingerprint

    return doc_fingerprint(_docs(sf_dir))


def _q_events_hourly(sf_dir: str):
    from retriv_ray.ops.windows import tumbling_window

    return tumbling_window(_events(sf_dir), every="hour")


def _q_events_hopping(sf_dir: str):
    from retriv_ray.ops.windows import hopping_window

    return hopping_window(_events(sf_dir), window_s=3600, hop_s=1800)


def _q_sessionize(sf_dir: str):
    from retriv_ray.ops.windows import sessionize

    # day-salted split-and-stitch path (identical output to unsalted;
    # exercises the hot-key-safe shape in the oracle gate)
    return sessionize(_events(sf_dir), gap_seconds=1800, salt_seconds=86400)


def _q_asof_join(sf_dir: str):
    from retriv_ray.ops.joins import asof_join

    ev = _events(sf_dir)
    # day-bucket-salted path (identical output to unsalted; exercises
    # the hot-key-safe replication shape in the oracle gate)
    return asof_join(
        ev.filter(expr="event_type == 'click'"),
        ev.filter(expr="event_type == 'purchase'"),
        tolerance_s=7 * 86400,
        bucket_s=86400,
    )


def _q_range_join(sf_dir: str):
    from retriv_ray.ops.joins import range_join

    ev = _events(sf_dir)
    return range_join(
        ev.filter(expr="event_type != 'purchase'"),
        ev.filter(expr="event_type == 'purchase'"),
        window_s=3600,
        bucket_s=900,
    )


def _q_clean_text(sf_dir: str):
    from retriv_ray.ops.prep import clean_text

    return clean_text(_docs(sf_dir))


def _q_approx_topk(sf_dir: str):
    """Heavy hitters with explicit error bounds (ops/sketch.py
    approx_topk): per-block exact counts, only the capacity-heaviest
    values enter the exchange, truncation loss carried as a bound
    column. The driver runs it with capacity >= any block's distinct
    count, where the contract guarantees exact GROUP BY equality and
    all-zero bounds (the capped behavior is pinned by tests)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.ops.sketch import approx_topk

    def toks(batch: pa.Table) -> pa.Table:
        split = pc.split_pattern_regex(
            pc.cast(batch.column("text"), pa.string()), r"\s+"
        )
        flat = pc.list_flatten(split)
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.Table.from_arrays([flat], names=["term"])

    tok_ds = _docs(sf_dir).map_batches(toks, batch_format="pyarrow")
    return approx_topk(tok_ds, "term", k=15, capacity=100_000)


def _q_resumable_write(sf_dir: str):
    """Resumable partitioned sink driven end-to-end: clean_text's
    output lands in fixed md5-key-hash buckets written atomically with
    _DONE markers (ops/io.py) — a re-run (including the driver calling
    this twice) skips every completed bucket and reads back identical
    rows. Oracle: the clean_text SQL (the sink must be lossless)."""
    from retriv_ray.ops.io import read_resumable, resumable_write_parquet
    from retriv_ray.ops.prep import clean_text

    p = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.sha1(
        f"{os.path.abspath(p)}|{os.path.getmtime(p)}|{os.path.getsize(p)}".encode()
    ).hexdigest()[:12]
    out = os.path.join("/tmp", f"retriv_ray_sink_{key}")
    resumable_write_parquet(clean_text(_docs(sf_dir)), out, "doc_id", n_buckets=16)
    return read_resumable(out)


def _q_split_by_hash(sf_dir: str):
    from retriv_ray.ops.prep import split_by_hash

    return split_by_hash(_docs(sf_dir)).select_columns(["doc_id", "split"])


def _q_chunk_documents(sf_dir: str):
    from retriv_ray.ops.prep import chunk_documents

    return chunk_documents(_docs(sf_dir), max_tokens=64, stride=48)


def _q_topk_per_group(sf_dir: str):
    from retriv_ray.ops.prep import topk_per_group

    return topk_per_group(_docs(sf_dir), k=5)


def _q_pack_token_stream(sf_dir: str):
    from retriv_ray.ops.prep import pack_token_stream

    return pack_token_stream(_docs(sf_dir), budget=256)


def _q_multimodal(sf_dir: str):
    from retriv_ray.ops.multimodal import attach_payload, image_features

    return image_features(attach_payload(_docs(sf_dir)), concurrency=2)


def _q_mixture_sample(sf_dir: str):
    """Token-budget mixture sampling: per-source md5-ordered running
    token sums cut at floor(weight x budget); bucketed distributed
    prefix sum (driver holds sources x buckets rows only)."""
    from retriv_ray.ops.mixing import mixture_sample

    return mixture_sample(
        _docs(sf_dir), MIXTURE_WEIGHTS, MIXTURE_BUDGET, n_buckets=8
    )


def _q_stratified_sample(sf_dir: str):
    from retriv_ray.ops.prep import stratified_sample

    return stratified_sample(_docs(sf_dir), n=7)


def _q_contamination_check(sf_dir: str):
    import os

    import pyarrow.parquet as _pq

    from retriv_ray.ops.textstats import contamination_check

    t = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    bench = {
        " ".join((r or "").split()[:8])
        for d, r in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
        if d < 5 and len((r or "").split()) >= 8
    }
    return contamination_check(_docs(sf_dir), bench, n=8)


def _q_duplicate_windows(sf_dir: str):
    from retriv_ray.ops.dedup import duplicate_window_stats

    return duplicate_window_stats(_docs(sf_dir), window=8, stride=4)


def _q_dedup_clusters(sf_dir: str):
    from retriv_ray.ops.dedup import dedup_clusters

    return dedup_clusters(_docs(sf_dir))


def _q_cluster_dedup(sf_dir: str):
    """Transitively deduplicated corpus: only each connected
    component's minimum-id doc survives (ops/dedup.py:
    cluster_dedup_filter over dedup_clusters — chains collapse even
    without direct pairs; distributed anti-join, no driver set)."""
    from retriv_ray.ops.dedup import cluster_dedup_filter, dedup_clusters

    clusters = dedup_clusters(_docs(sf_dir))
    return cluster_dedup_filter(_docs(sf_dir), clusters).sort("doc_id")


def _q_length_quantiles(sf_dir: str):
    from retriv_ray.ops.textstats import length_quantiles

    return length_quantiles(_docs(sf_dir))


def _q_tfidf_keywords(sf_dir: str):
    from retriv_ray.ops.textstats import tfidf_keywords

    return tfidf_keywords(_docs(sf_dir), k=5)


def _q_rolling_events(sf_dir: str):
    from retriv_ray.ops.windows import rolling_event_stats

    return rolling_event_stats(_events(sf_dir), window_rows=5)


def _q_funnel(sf_dir: str):
    from retriv_ray.ops.windows import funnel_stages

    return funnel_stages(_events(sf_dir))


def _q_rollup_counts(sf_dir: str):
    from retriv_ray.ops.windows import rollup_counts

    return rollup_counts(_docs(sf_dir), keys=("lang", "source"))


def _q_quantile_filter(sf_dir: str):
    from retriv_ray.ops.textstats import quantile_filter

    return quantile_filter(_docs(sf_dir), q_lo=0.125, q_hi=0.875).select_columns(
        ["doc_id", "n_chars", "lang"]
    )


def _q_customers_without_orders(sf_dir: str):
    # anti join restricted to URGENT orders so the result is non-empty
    # on the synthetic tables (every customer has SOME order); runs
    # the bloom-bypass path — left rows missing the right-key bloom
    # skip the exchange, false positives fall through to the exact
    # shuffle anti join (ops/relational.py bloom_anti_join)
    import ray.data

    from retriv_ray.ops.relational import bloom_anti_join

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"],
    ).filter(expr="o_orderpriority == '1-URGENT'")
    return bloom_anti_join(
        ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name", "c_mktsegment"],
        ),
        orders,
        on="c_custkey",
        right_on="o_custkey",
    )


def _q_retention_cohorts(sf_dir: str):
    from retriv_ray.ops.windows import retention_cohorts

    return retention_cohorts(_events(sf_dir))


def _q_rolling_time_events(sf_dir: str):
    from retriv_ray.ops.windows import rolling_time_stats

    return rolling_time_stats(_events(sf_dir), window_seconds=3600)


def _q_composite_agg(sf_dir: str):
    """ES composite aggregation: TWO cursor pages of 40 buckets over
    (event_type, user_id) — the map-side cursor filter + per-block
    first-size combiner bound the exchange at size x blocks rows per
    page (ops/relational.py:composite_agg). Concatenating the pages
    must equal the oracle's first 80 buckets, which proves the cursor
    hand-off is exact."""
    import pyarrow as pa

    from retriv_ray.ops.relational import composite_agg

    ev = _events(sf_dir)
    p1, after = composite_agg(
        ev, ["event_type", "user_id"], size=40, value_col="value"
    )
    p2, _ = composite_agg(
        ev, ["event_type", "user_id"], size=40, after=after,
        value_col="value",
    )
    return pa.concat_tables([p1, p2])


def _q_distinct_users_daily(sf_dir: str):
    from retriv_ray.ops.windows import distinct_users_daily

    return distinct_users_daily(_events(sf_dir))


def _q_approx_distinct(sf_dir: str):
    """HyperLogLog distinct users per event type — the 100 TB path
    for cardinality (exchange moves <= 2^p register rows per key per
    block, merge = max). Integer-exact HLL contract, so the DuckDB
    twin reproduces the estimate bit for bit (ops/sketch.py)."""
    from retriv_ray.ops.sketch import approx_distinct

    return approx_distinct(
        _events(sf_dir), key_col="event_type", value_col="user_id", p=8
    )


def _q_group_percentiles(sf_dir: str):
    """ES percentiles aggregation, exact (ops/textstats.py
    group_percentiles): per-(event_type) quantile_disc of value-cents.
    One groupby((group, value)).count moves only (group, distinct
    value, count) triples; the rank-select runs inside
    groupby(group).map_groups — distributed across groups, nothing on
    the driver. Binary-fraction qs make ceil(q*n) exact in IEEE double
    on both engines."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.ops.textstats import group_percentiles

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(batch.column("value"), 100)), pa.int64())
        return pa.Table.from_arrays(
            [batch.column("event_type"), c], names=["event_type", "cents"]
        )

    ds = _events(sf_dir).map_batches(cents, batch_format="pyarrow")
    return group_percentiles(ds, "event_type", "cents")


def _q_parse_json(sf_dir: str):
    """Flat-JSON field extraction (ops/prep.py parse_json_fields):
    events.props -> typed int64 column k via ONE compiled RE2 kernel
    per field, zero shuffle. The oracle re-parses with DuckDB's real
    JSON parser (json_extract), cross-checking the regex shortcut
    against full-JSON semantics on every driver run."""
    from retriv_ray.ops.prep import parse_json_fields

    out = parse_json_fields(_events(sf_dir), col="props", int_fields=["k"])
    return out.select_columns(["event_id", "k"]).sort("event_id")


def _q_date_histogram_pipeline(sf_dir: str):
    """ES calendar-interval date_histogram + pipeline aggs
    (ops/windows.py date_histogram_pipeline): month buckets via
    floor_temporal (= SQL date_trunc boundaries), then
    cumulative_sum / derivative / trailing moving sum inside
    groupby(key).map_groups over the already-aggregated bucket rows.
    Integer-exact throughout (value cents)."""
    from retriv_ray.ops.windows import date_histogram_pipeline

    return date_histogram_pipeline(_events(sf_dir), unit="week", moving=3)


def _q_windowed_percentiles(sf_dir: str):
    """Windowed percentiles (group_percentiles with a composite
    (event_type, day) key): the SLO-latency shape — exact per-bucket
    quantile_disc over value cents, one distinct-value-histogram
    exchange, rank-select distributed across (key, window) groups."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.ops.textstats import group_percentiles

    def prep(batch: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.cast(pc.floor_temporal(batch.column("ts"), unit="day"), pa.int64()),
            pa.scalar(1_000_000, type=pa.int64()),
        )
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100)), pa.int64())
        return pa.Table.from_arrays(
            [batch.column("event_type"), day, cents],
            names=["event_type", "day_s", "cents"],
        )

    ds = _events(sf_dir).map_batches(prep, batch_format="pyarrow")
    return group_percentiles(
        ds, ["event_type", "day_s"], "cents", qs=(0.5, 0.875)
    )


def _q_pivot_counts(sf_dir: str):
    """Crosstab (SQL PIVOT ... IN): per-user event-type count columns
    (ops/relational.py pivot_counts). One vectorized flat bincount per
    batch builds the whole g x (v+1) partial matrix, so the single
    exchange moves per-block partial pivot rows, never events."""
    from retriv_ray.ops.relational import pivot_counts

    return pivot_counts(
        _events(sf_dir), "user_id", "event_type",
        ["click", "purchase", "signup"],
    )


def _q_incremental_agg(sf_dir: str):
    """Incrementally-maintained aggregate (ops/io.py
    incremental_sum_agg): events split once into per-user-bucket
    shards in /tmp, then the running (event_type, n, cents) state is
    folded in TWO calls — first half, then all shards — exercising
    the delta-merge path; a third call with no new files returns the
    persisted state untouched. Oracle: the full GROUP BY over events
    (the incremental result must equal the from-scratch rebuild)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    from retriv_ray.ops.io import incremental_sum_agg

    src = os.path.join(sf_dir, "events.parquet")
    key = hashlib.sha1(
        f"{os.path.abspath(src)}|{os.path.getmtime(src)}".encode()
    ).hexdigest()[:12]
    shard_dir = os.path.join("/tmp", f"retriv_ray_evshards_{key}")
    if not os.path.exists(os.path.join(shard_dir, "_DONE")):
        os.makedirs(shard_dir, exist_ok=True)
        t = _pq.read_table(src, columns=["event_type", "user_id", "value"])
        cents = pc.cast(pc.round(pc.multiply(t.column("value"), 100)), pa.int64())
        t = pa.Table.from_arrays(
            [t.column("event_type"), t.column("user_id"),
             pa.array(np.ones(t.num_rows, dtype=np.int64)), cents],
            names=["event_type", "user_id", "n", "cents"],
        )
        bucket = pc.bit_wise_and(t.column("user_id"), 3)
        for i in range(4):
            shard = t.filter(pc.equal(bucket, i)).drop_columns(["user_id"])
            _pq.write_table(shard, os.path.join(shard_dir, f"shard-{i}.parquet"))
        open(os.path.join(shard_dir, "_DONE"), "w").close()
    shards = sorted(
        os.path.join(shard_dir, f)
        for f in os.listdir(shard_dir)
        if f.endswith(".parquet")
    )
    state = os.path.join(shard_dir, "state")
    if os.path.exists(state):
        import shutil as _sh

        _sh.rmtree(state)  # fresh two-step fold each driver run
    incremental_sum_agg(shards[:2], state, ["event_type"], ["n", "cents"])
    return incremental_sum_agg(shards, state, ["event_type"], ["n", "cents"])


def _q_orc_roundtrip(sf_dir: str):
    """Beyond-reference source format: documents converted once to a
    multi-stripe ORC file in /tmp, read back through the per-stripe
    task fan-out reader (sources/formats.py read_orc), column-pruned
    at the format layer. Oracle reads the same rows from the parquet
    view — the reader must be lossless."""
    import pyarrow.parquet as _pq

    from retriv_ray.sources.formats import read_orc, write_orc

    src = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.sha1(
        f"{os.path.abspath(src)}|{os.path.getmtime(src)}".encode()
    ).hexdigest()[:12]
    dst = os.path.join("/tmp", f"retriv_ray_docs_{key}.orc")
    if not os.path.exists(dst):
        tmp = f"{dst}.{os.getpid()}.tmp"  # per-process: concurrent
        # driver runs must not interleave writes before the rename
        write_orc(
            _pq.read_table(src), tmp, stripe_size=256 * 1024
        )  # small stripes -> exercises the per-stripe fan-out
        os.replace(tmp, dst)
    return read_orc(dst, columns=["doc_id", "lang", "n_chars"]).sort("doc_id")


def _q_top_metrics(sf_dir: str):
    """ES top_metrics aggregation (ops/relational.py top_metrics):
    per event_type, the event at the latest ts (ties by smallest
    event_id) with its value-cents — one best-row-per-group combiner
    per block, the exchange moves one row per (block, group)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.ops.relational import top_metrics

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100)), pa.int64())
        return pa.Table.from_arrays(
            [batch.column("event_type"), ts_us, batch.column("event_id"), cents],
            names=["event_type", "ts_us", "event_id", "cents"],
        )

    ds = _events(sf_dir).map_batches(prep, batch_format="pyarrow")
    return top_metrics(ds, "event_type", "ts_us", "event_id", ["cents"])


def _q_population_drift(sf_dir: str):
    """PSI drift between two deterministic event slices (ops/windows.py
    population_drift): even vs odd event_ids' value-cents bucketed at
    2500, Laplace-smoothed shares, floor-quantized PSI terms — the
    training-data drift monitor, integer-exact end to end."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.ops.windows import population_drift

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(batch.column("value"), 100)), pa.int64())
        return pa.Table.from_arrays(
            [batch.column("event_id"), c], names=["event_id", "cents"]
        )

    ev = _events(sf_dir).map_batches(cents, batch_format="pyarrow")
    even = ev.filter(lambda r: r["event_id"] % 2 == 0)
    odd = ev.filter(lambda r: r["event_id"] % 2 == 1)
    return population_drift(even, odd, "cents", 2500)


def _q_dataset_diff(sf_dir: str):
    """Snapshot delta (ops/relational.py dataset_diff): the corpus
    diffed against a deterministically-derived next version (every
    17th doc removed, every 13th edited, every 23rd cloned to a new
    id). Map-side md5 digests mean the exchange ships ~24 B/row;
    one groupby(id) of plain aggregates classifies
    added/removed/changed."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.ops.relational import dataset_diff

    old = _docs(sf_dir).select_columns(["doc_id", "text"])

    def evolve(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        text = pc.cast(batch.column("text"), pa.string())
        changed = pa.array(
            ["CHANGED" if i % 13 == 0 else t
             for i, t in zip(ids, text.to_pylist())],
            type=pa.string(),
        )
        kept = pa.Table.from_arrays(
            [batch.column("doc_id"), changed], names=["doc_id", "text"]
        ).filter(pa.array(ids % 17 != 0))
        clones = pa.Table.from_arrays(
            [
                pa.array(ids[ids % 23 == 0] + 1_000_000),
                text.filter(pa.array(ids % 23 == 0)),
            ],
            names=["doc_id", "text"],
        )
        return pa.concat_tables([kept, clones])

    new = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        evolve, batch_format="pyarrow"
    )
    return dataset_diff(old, new, "doc_id", ["text"])


def _q_corr_stats(sf_dir: str):
    """ES matrix_stats between two metrics (ops/relational.py
    corr_stats): value-cents x the JSON-extracted props.k per
    event_type, as integer-exact sufficient statistics (n, sums,
    squares, cross products) — correlation is driver arithmetic,
    the exchange stays integer-only. Composes parse_json_fields
    (RE2 extraction) with the combiner-first stats pass."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.ops.prep import parse_json_fields
    from retriv_ray.ops.relational import corr_stats

    ds = parse_json_fields(_events(sf_dir), col="props", int_fields=["k"])

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(batch.column("value"), 100)), pa.int64())
        return pa.Table.from_arrays(
            [batch.column("event_type"), c, batch.column("k")],
            names=["event_type", "cents", "k"],
        )

    return corr_stats(
        ds.map_batches(cents, batch_format="pyarrow"),
        "event_type", "cents", "k",
    )


def _q_percentile_ranks(sf_dir: str):
    """ES percentile_ranks (inverse percentiles), exact and integer-
    only (ops/textstats.py percentile_ranks): per event_type, how many
    value-cents are <= each probe — returned as two exact integers
    (n_le, n) so the hash check needs no float tolerance."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.ops.textstats import percentile_ranks

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(batch.column("value"), 100)), pa.int64())
        return pa.Table.from_arrays(
            [batch.column("event_type"), c], names=["event_type", "cents"]
        )

    ds = _events(sf_dir).map_batches(cents, batch_format="pyarrow")
    return percentile_ranks(
        ds, "event_type", "cents", [1000, 5000, 10000, 15000]
    )


def _q_phrase_suggest(sf_dir: str):
    """ES phrase suggester (ops/textstats.py phrase_suggest): corpus
    bigrams within edit distance 1 per word of the misspelled phrase,
    ranked count desc / distance asc — candidates are real
    co-occurrences (collate=true by construction). Map-side banded
    Levenshtein over distinct bigrams; no table broadcast."""
    from retriv_ray.ops.textstats import phrase_suggest

    return phrase_suggest(
        _docs(sf_dir), PHRASE_SUGGEST_QUERIES, max_dist=1, topn=3
    )


def _q_filters_agg(sf_dir: str):
    """ES filters aggregation with other_bucket (ops/textstats.py
    filters_agg): non-exclusive named token filters + the _other_
    bucket of documents matching none."""
    from retriv_ray.ops.textstats import filters_agg

    return filters_agg(
        _docs(sf_dir), {"tbl": "table", "scn": "scan", "win": "window"}
    )


def _q_rank_feature_topk(sf_dir: str):
    """ES rank_feature query (search/bm25f.py rank_feature_topk):
    BM25 + boost * saturation(n_chars, pivot=500) — a static
    document-quality signal folded into relevance; features attach
    in-group during one tag-union doc-keyed shuffle."""
    from retriv_ray.search.bm25f import rank_feature_topk

    return rank_feature_topk(
        _docs(sf_dir).select_columns(["doc_id", "text", "n_chars"]),
        TOPK_QUERIES,
        feature_col="n_chars",
        pivot=500.0,
        boost=2.0,
        cutoff=CUTOFF,
    ).select_columns(["q_id", "rank", "doc_id"])


def _q_adjacency_matrix(sf_dir: str):
    """ES adjacency_matrix aggregation (ops/textstats.py
    adjacency_matrix): doc counts per named token filter and per
    pairwise intersection, one vectorized membership pass per batch,
    O(filters^2) tiny partial rows per block."""
    from retriv_ray.ops.textstats import adjacency_matrix

    return adjacency_matrix(
        _docs(sf_dir), {"tbl": "table", "scn": "scan", "win": "window"}
    )


def _q_rare_terms(sf_dir: str):
    """ES rare_terms aggregation, exact (ops/textstats.py rare_terms):
    the corpus' long-tail tokens with total count <= 100, via one
    combiner-first groupby(term).sum and a schema-preserving
    post-filter (the synthetic vocabulary is closed, so the rare tail
    is the deliberately-rare marker token)."""
    from retriv_ray.ops.textstats import rare_terms

    return rare_terms(_docs(sf_dir), max_count=100)


def _q_approx_count(sf_dir: str):
    """Count-min sketch point counts (ops/sketch.py approx_count):
    the 100 TB path for "how often does THIS value occur" — the
    exchange moves <= d*w counter rows per block through one
    groupby((row, cell)).sum, merge = +. Deliberately narrow w=64 so
    hash collisions are exercised at sf0.01; the DuckDB twin is
    generated from the same md5 + affine-row-hash constants, so every
    (possibly overcounted) estimate matches bit for bit."""
    from retriv_ray.ops.sketch import approx_count

    probes = [str(u) for u in range(20)] + ["999999999"]
    return approx_count(_events(sf_dir), "user_id", probes, d=4, w=64)


def _q_group_centroids(sf_dir: str):
    from retriv_ray.ops.ann import group_centroids

    return group_centroids(_embeddings(sf_dir))


def _q_bm25f_topk(sf_dir: str):
    """Weighted multi-field BM25 (BM25F): documents split into a
    title field (first N tokens, weight 3) and body (rest, weight 1);
    integer weighted tf/dl aggregates, distributed candidate join,
    combiner-first top-k (search/bm25f.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.search.bm25f import bm25f_topk

    def to_fields(batch: pa.Table) -> pa.Table:
        col = pc.utf8_trim_whitespace(pc.cast(batch.column("text"), pa.string()))
        split = pc.split_pattern_regex(col, r"\s+")
        title = pc.binary_join(
            pc.list_slice(split, 0, BM25F_TITLE_TOKENS), " "
        )
        body = pc.binary_join(pc.list_slice(split, BM25F_TITLE_TOKENS), " ")
        n = batch.num_rows
        ids = batch.column("doc_id")
        names = ["doc_id", "field", "text"]
        return pa.concat_tables(
            [
                pa.Table.from_arrays(
                    [ids, pa.array(["title"] * n, type=pa.string()), title],
                    names=names,
                ),
                pa.Table.from_arrays(
                    [ids, pa.array(["body"] * n, type=pa.string()), body],
                    names=names,
                ),
            ]
        )

    fields = _docs(sf_dir).map_batches(to_fields, batch_format="pyarrow")
    return bm25f_topk(
        fields, TOPK_QUERIES, BM25F_WEIGHTS, cutoff=CUTOFF
    ).select_columns(["q_id", "rank", "doc_id"])


def _q_dis_max_topk(sf_dir: str):
    """ES dis_max / multi_match best_fields (search/bm25f.py
    dis_max_topk): title and body scored as independent per-field
    BM25 subqueries (per-field df/N/avgdl — Lucene field statistics),
    combined as best + tie_breaker * others. Rank-only output; ties
    by ascending doc_id."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.search.bm25f import dis_max_topk

    def to_fields(batch: pa.Table) -> pa.Table:
        col = pc.utf8_trim_whitespace(pc.cast(batch.column("text"), pa.string()))
        split = pc.split_pattern_regex(col, r"\s+")
        title = pc.binary_join(
            pc.list_slice(split, 0, BM25F_TITLE_TOKENS), " "
        )
        body = pc.binary_join(pc.list_slice(split, BM25F_TITLE_TOKENS), " ")
        n = batch.num_rows
        ids = batch.column("doc_id")
        names = ["doc_id", "field", "text"]
        return pa.concat_tables(
            [
                pa.Table.from_arrays(
                    [ids, pa.array(["title"] * n, type=pa.string()), title],
                    names=names,
                ),
                pa.Table.from_arrays(
                    [ids, pa.array(["body"] * n, type=pa.string()), body],
                    names=names,
                ),
            ]
        )

    fields = _docs(sf_dir).map_batches(to_fields, batch_format="pyarrow")
    return dis_max_topk(
        fields, TOPK_QUERIES, ["title", "body"], tie_breaker=DIS_MAX_TIE,
        cutoff=CUTOFF,
    ).select_columns(["q_id", "rank", "doc_id"])


def _q_ltr_features(sf_dir: str):
    """LTR feature extraction (search/bm25f.py ltr_features): per
    (q_id, doc) candidate the bm25_e4 / tf_sum / n_matched / dl
    feature vector — the offline feature dump an LTR trainer
    consumes; one scoring pipeline with a wider aggregate."""
    from retriv_ray.search.bm25f import ltr_features

    return ltr_features(
        _docs(sf_dir).select_columns(["doc_id", "text"]), TOPK_QUERIES
    )


def _q_bm25plus_topk(sf_dir: str):
    """BM25+ (Lv & Zhai 2011) ranking (search/bm25f.py bm25f_scores
    delta=1.0): the lower-bounded tf normalization that stops long
    documents containing a query term from scoring below documents
    lacking it — the classic BM25 long-doc fix, as a single-field
    scoring pass."""
    from retriv_ray.ops.prep import topk_per_group
    from retriv_ray.search.bm25f import _with_pseudo_field, bm25f_scores

    scores = bm25f_scores(
        _with_pseudo_field(_docs(sf_dir).select_columns(["doc_id", "text"])),
        TOPK_QUERIES,
        {"t": 1},
        delta=1.0,
    )
    return topk_per_group(
        scores, k=CUTOFF, key_col="q_id", score_col="score", id_col="doc_id"
    ).select_columns(["q_id", "rank", "doc_id"])


def _q_numeric_histogram(sf_dir: str):
    """ES histogram aggregation (ops/windows.py numeric_histogram):
    fixed-interval value-cents buckets per event_type with count and
    exact integer sum — the tumbling-window combiner on a value
    axis."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.ops.windows import numeric_histogram

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(batch.column("value"), 100)), pa.int64())
        return pa.Table.from_arrays(
            [batch.column("event_type"), c], names=["event_type", "cents"]
        )

    ds = _events(sf_dir).map_batches(cents, batch_format="pyarrow")
    return numeric_histogram(ds, "cents", 2500, key_col="event_type")


def _q_max_passage_topk(sf_dir: str):
    """Max-passage (MaxP) document retrieval (search/bm25f.py
    max_passage_topk): BM25 over 64/48 sliding-window chunks with
    passage-level statistics, documents ranked by their best passage.
    Reuses ops/prep.py chunk_documents for the chunking (same
    parameters as the chunk_documents oracle)."""
    from retriv_ray.ops.prep import chunk_documents
    from retriv_ray.search.bm25f import max_passage_topk

    chunks = chunk_documents(
        _docs(sf_dir).select_columns(["doc_id", "text"]),
        max_tokens=64,
        stride=48,
    )
    return max_passage_topk(
        chunks, TOPK_QUERIES, cutoff=CUTOFF
    ).select_columns(["q_id", "rank", "doc_id"])


def _q_boosting_topk(sf_dir: str):
    """ES boosting compound query (search/bm25f.py boosting_topk):
    positive BM25 scores, docs matching any negative term demoted by
    negative_boost (not excluded). One scoring pass + one map-side
    neg-flag pass + one (q_id, doc) combine exchange."""
    from retriv_ray.search.bm25f import boosting_topk

    return boosting_topk(
        _docs(sf_dir).select_columns(["doc_id", "text"]),
        BOOSTING_QUERIES,
        negative_boost=NEGATIVE_BOOST,
        cutoff=CUTOFF,
    ).select_columns(["q_id", "rank", "doc_id"])


def _q_kmeans_assign(sf_dir: str):
    """Integer-exact Lloyd k-means (seeded from the k smallest
    vec_ids, 2 rounds): quantize-then-int64 arithmetic makes the
    assignment bit-identical under any partitioning and SQL-checkable
    (ops/cluster.py)."""
    from retriv_ray.ops.cluster import kmeans_assign

    return kmeans_assign(
        _embeddings(sf_dir), k=KMEANS_K, iters=KMEANS_ITERS, scale=KMEANS_SCALE
    )


def _q_knn_join(sf_dir: str):
    """kNN self-join (the kNN-graph primitive): every vector's top-5
    cosine neighbors via block-pair tasks over object-store refs —
    each pair computed once, both directions emitted, groupby merge
    (ops/ann.py knn_join)."""
    from retriv_ray.ops.ann import knn_join

    return knn_join(_embeddings(sf_dir), k=5, block_rows=128)


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup: integer-exact k-means clustering, then within each
    cluster drop every vector with a >= 0.40-cosine smaller-id
    neighbor — the cosine test runs fully in int64 cross-multiplied
    form so the kept set is bit-identical in SQL (ops/cluster.py)."""
    from retriv_ray.ops.cluster import semantic_dedup

    return semantic_dedup(
        _embeddings(sf_dir),
        k=KMEANS_K,
        iters=KMEANS_ITERS,
        threshold_e4=SEMDEDUP_TE4,
        scale=SEMDEDUP_SCALE,
    )


def _q_star_revenue(sf_dir: str):
    import ray.data

    from retriv_ray.ops.relational import star_revenue_topk

    return star_revenue_topk(
        ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet")),
        ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet")),
        ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet")),
        segment="BUILDING",
        order_before="1998-01-01",
        ship_after="1998-01-01",
        k=10,
    )


def _q_order_priority_join(sf_dir: str):
    """Large-large shuffle hash join probe (orders x lineitem on
    orderkey, both sides pruned to key + one column pre-shuffle),
    TPC-H Q4-shaped priority rollup; integer-cents exact."""
    import ray.data

    from retriv_ray.ops.relational import order_priority_stats

    return order_priority_stats(
        ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet")),
        ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet")),
        "1995-01-01",
        "1996-07-01",
    )


def _q_orders_by_nation(sf_dir: str):
    import ray.data

    from retriv_ray.ops.relational import orders_by_nation

    return orders_by_nation(
        ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet")),
        ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet")),
        ray.data.read_parquet(os.path.join(sf_dir, "nation.parquet")),
        ray.data.read_parquet(os.path.join(sf_dir, "region.parquet")),
    )


def _q_profile_columns(sf_dir: str):
    from retriv_ray.ops.textstats import profile_columns

    return profile_columns(
        _docs(sf_dir), cols=["doc_id", "lang", "source", "n_chars"]
    )


def _q_pmi_collocations(sf_dir: str):
    from retriv_ray.ops.textstats import pmi_collocations

    return pmi_collocations(_docs(sf_dir), k=20, min_count=5)


def _q_gopher_filter(sf_dir: str):
    from retriv_ray.ops.textstats import gopher_filter

    return gopher_filter(_docs(sf_dir))


def _q_weighted_sample(sf_dir: str):
    from retriv_ray.ops.prep import weighted_sample

    return weighted_sample(_docs(sf_dir), k=50, weight_col="n_chars")


def _q_jaccard_join(sf_dir: str):
    import pyarrow.compute as _pc

    from retriv_ray.ops.dedup import jaccard_join

    def parity(p):
        def fn(t):
            return t.filter(
                _pc.equal(_pc.bit_wise_and(t.column("doc_id"), 1), p)
            )
        return fn

    docs = _docs(sf_dir)
    left = docs.map_batches(parity(0), batch_format="pyarrow")
    right = docs.map_batches(parity(1), batch_format="pyarrow")
    return jaccard_join(left, right, n=3, threshold=0.5)


def _q_token_rarity(sf_dir: str):
    from retriv_ray.ops.textstats import token_rarity

    return token_rarity(_docs(sf_dir))


def _q_pii_scrub(sf_dir: str):
    from retriv_ray.ops.scrub import pattern_scrub

    # events.props is the one testdata column with digit content, so
    # the number pattern exercises real matches while the email/ipv4
    # paths verify true zeros
    return pattern_scrub(_events(sf_dir), text_col="props", id_col="event_id")


def _q_repetition_stats(sf_dir: str):
    from retriv_ray.ops.textstats import repetition_stats

    return repetition_stats(_docs(sf_dir))


def _q_top_ngrams(sf_dir: str):
    from retriv_ray.ops.textstats import top_ngrams

    return top_ngrams(_docs(sf_dir), n=2, k=20)


FILTERED_QUERIES = {
    "q1": ({"text": "table scan join", "where": {"lang": "en"}},
           "d.lang = 'en'"),
    "q2": ({"text": "window batch stream", "where_not": {"lang": "en"}},
           "d.lang <> 'en'"),
    "q3": ({"text": "hash merge filter", "where": {"n_chars": ("between", (200, 800))}},
           "d.n_chars BETWEEN 200 AND 800"),
    "q4": ({"text": "customer order part", "where": {"lang": "en", "n_chars": ("gte", 300)}},
           "d.lang = 'en' AND d.n_chars >= 300"),
}
FUSION_WEIGHTS = (0.6, 0.4)
RRF_K = 60  # the Cormack 2009 default


def _q_filtered_bm25(sf_dir: str):
    """BM25 restricted by metadata filters (AdvancedRetriever DSL,
    reference advanced_retriever.py:503-576): global stats, filtered
    candidates."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import (
        conv_to_doc_id,
        ensure_documents_metadata,
    )

    r = _index(sf_dir)
    ensure_documents_metadata(sf_dir, r)
    out_q, out_r, out_d = [], [], []
    for q_id, (query, _sql) in FILTERED_QUERIES.items():
        res = r.search(dict(query), cutoff=CUTOFF)
        docs = conv_to_doc_id([c for c, _ in res.keys()])
        out_q.extend([q_id] * len(docs))
        out_r.extend(range(1, len(docs) + 1))
        out_d.extend(docs.tolist())
    return pa.Table.from_arrays(
        [
            pa.array(out_q, type=pa.string()),
            pa.array(out_r, type=pa.int64()),
            pa.array(out_d, type=pa.int64()),
        ],
        names=["q_id", "rank", "doc_id"],
    )


def _q_range_facets(sf_dir: str):
    """Histogram facet: matching-doc counts per numeric bucket of
    n_chars (search/facets.py range_facets)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import ensure_documents_metadata
    from retriv_ray.search.facets import range_facets

    r = _index(sf_dir)
    ensure_documents_metadata(sf_dir, r)
    parts = []
    for q_id in sorted(FACET_QUERIES):
        t = range_facets(r, FACET_QUERIES[q_id], "n_chars", RANGE_FACET_EDGES)
        parts.append(
            t.add_column(
                0, "q_id", pa.array([q_id] * t.num_rows, type=pa.string())
            )
        )
    return pa.concat_tables(parts)


def _q_significant_terms(sf_dir: str):
    """ES significant_terms: vocabulary terms overrepresented in each
    query's matching set, integer-exact quantized lift
    (search/facets.py significant_terms)."""
    import pyarrow as pa

    from retriv_ray.search.facets import significant_terms

    r = _index(sf_dir)
    parts = []
    for q_id in sorted(FACET_QUERIES):
        t = significant_terms(
            r, FACET_QUERIES[q_id], SIGTERMS_TOPK, SIGTERMS_MIN_DF_FG
        )
        parts.append(
            t.add_column(
                0, "q_id", pa.array([q_id] * t.num_rows, type=pa.string())
            )
        )
    return pa.concat_tables(parts)


def _q_index_stats(sf_dir: str):
    """Corpus/index profile: doc count, vocabulary size, postings
    rows (sum df) and collection frequency (sum cf) straight from the
    index products."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    r = _index(sf_dir)
    parts = [
        pq.read_table(p, columns=["df", "cf"])
        for p in sorted(glob.glob(os.path.join(r.index_dir, "terms", "*.parquet")))
    ]
    t = pa.concat_tables(parts)
    import pyarrow.compute as pc

    return pa.Table.from_arrays(
        [
            pa.array([int(r.index.doc_count)], type=pa.int64()),
            pa.array([t.num_rows], type=pa.int64()),
            pa.array([pc.sum(t.column("df")).as_py()], type=pa.int64()),
            pa.array([pc.sum(t.column("cf")).as_py()], type=pa.int64()),
        ],
        names=["doc_count", "vocab_size", "postings_rows", "total_tf"],
    )


def _q_collapse_topk(sf_dir: str):
    """Elasticsearch field collapsing: the BM25 ranking keeps at most
    N hits per metadata value (result diversification), re-ranked
    (search/collapse.py)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import (
        conv_to_doc_id,
        ensure_documents_metadata,
    )
    from retriv_ray.search.collapse import collapse_queries

    r = _index(sf_dir)
    ensure_documents_metadata(sf_dir, r)
    t = collapse_queries(
        r,
        TOPK_QUERIES,
        COLLAPSE_FIELD,
        per_value=COLLAPSE_PER_VALUE,
        cutoff=COLLAPSE_CUTOFF,
    )
    convs, _turns = r.index.to_original_ids(t.column("doc_id").to_numpy())
    return pa.Table.from_arrays(
        [
            t.column("q_id"),
            t.column("rank"),
            pa.array(conv_to_doc_id(convs), type=pa.int64()),
            t.column("value"),
        ],
        names=["q_id", "rank", "doc_id", "value"],
    )


def _q_hybrid_topk(sf_dir: str):
    """Hybrid sparse+dense retrieval: each query pairs BM25 text
    scores with cosine similarities of a query embedding (vec_id ==
    doc_id row space); both runs min-max normalize within their
    top-CUTOFF pools and fuse through the same merger operator as
    fusion_topk."""
    import numpy as _np
    import pyarrow as pa
    import ray.data

    from retriv_ray.merger import fuse_runs_ds
    from retriv_ray.ops.ann import cosine_topk_bruteforce
    from retriv_ray.pipelines.documents import conv_to_doc_id

    r = _index(sf_dir)
    rows = []
    for q_id, vec in HYBRID_PAIRS.items():
        res = r.search(TOPK_QUERIES[q_id], cutoff=CUTOFF)
        docs = conv_to_doc_id([c for c, _ in res.keys()])
        for d, s in zip(docs.tolist(), res.values()):
            rows.append(
                {"run_idx": 0, "q_id": q_id, "doc_id": str(d), "score": float(s)}
            )
    q_ids, q_vecs = _ann_queries(sf_dir)
    dense = cosine_topk_bruteforce(
        _embeddings(sf_dir),
        q_ids,
        q_vecs,
        k=CUTOFF,
        exclude_self=False,
        return_sims=True,
    ).to_pandas()
    vec_to_q = {v: q for q, v in HYBRID_PAIRS.items()}
    for _i, row in dense.iterrows():
        rows.append(
            {
                "run_idx": 1,
                "q_id": vec_to_q[int(row["q_vec_id"])],
                "doc_id": str(int(row["vec_id"])),
                "score": float(row["sim"]),
            }
        )
    fused = fuse_runs_ds(
        ray.data.from_items(rows),
        norm="min-max",
        weights=list(HYBRID_WEIGHTS),
        cutoff=CUTOFF,
    )
    t = fused.to_pandas()
    return pa.Table.from_arrays(
        [
            pa.array(t["q_id"], type=pa.string()),
            pa.array(t["rank"].astype("int64")),
            pa.array(t["doc_id"].astype("int64")),
        ],
        names=["q_id", "rank", "doc_id"],
    )


def _q_hybrid_encoded_topk(sf_dir: str):
    """Hybrid retrieval through the REAL encode path: documents run
    through DenseRetriever.index_dataset (actor-pool HashingEncoder
    in md5 mode — every hash/bucket/sign step SQL-reproducible via
    md5_number_lower — streamed embedding shards), queries encode at
    search time, dense cosine fuses min-max-weighted with sparse
    BM25. Unlike hybrid_topk (which reads precomputed embeddings)
    this exercises encode -> persist -> load -> search end-to-end."""
    import pyarrow as pa
    import ray.data

    from retriv_ray.dense import DenseRetriever, HashingEncoder
    from retriv_ray.merger import fuse_runs_ds
    from retriv_ray.pipelines.documents import conv_to_doc_id

    tag = os.path.basename(os.path.normpath(sf_dir))
    dr = DenseRetriever(
        index_name=f"hybenc-{tag}",
        encoder=HashingEncoder(dim=ENC_DIM, seed=ENC_SEED, hash="md5"),
        use_ann=False,
    )
    dr.index_dataset(_docs(sf_dir), id_col="doc_id", text_col="text")

    rows = []
    r = _index(sf_dir)
    for q_id, qtext in TOPK_QUERIES.items():
        res = r.search(qtext, cutoff=CUTOFF)
        docs = conv_to_doc_id([c for c, _ in res.keys()])
        for d, s in zip(docs.tolist(), res.values()):
            rows.append(
                {"run_idx": 0, "q_id": q_id, "doc_id": str(d), "score": float(s)}
            )
        dres = dr.search(qtext, return_docs=False, cutoff=CUTOFF)
        for d, s in dres.items():
            rows.append(
                {"run_idx": 1, "q_id": q_id, "doc_id": str(d), "score": float(s)}
            )
    fused = fuse_runs_ds(
        ray.data.from_items(rows),
        norm="min-max",
        weights=list(HYBRID_WEIGHTS),
        cutoff=CUTOFF,
    )
    t = fused.to_pandas()
    return pa.Table.from_arrays(
        [
            pa.array(t["q_id"], type=pa.string()),
            pa.array(t["rank"].astype("int64")),
            pa.array(t["doc_id"].astype("int64")),
        ],
        names=["q_id", "rank", "doc_id"],
    )


def _q_explain_top1(sf_dir: str):
    """Lucene-style score explanation for each query's rank-1 doc:
    per-term (tf, df, quantized BM25 contribution) rows
    (search/explain.py; floor(1e6 x) integer contract)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id
    from retriv_ray.search.explain import explain_queries

    r = _index(sf_dir)
    t = explain_queries(r, TOPK_QUERIES)
    internal = t.column("doc_id").to_numpy()
    convs, _turns = r.index.to_original_ids(internal)
    return pa.Table.from_arrays(
        [
            t.column("q_id"),
            pa.array(conv_to_doc_id(convs), type=pa.int64()),
            t.column("term"),
            t.column("tf"),
            t.column("df"),
            t.column("score_e6"),
        ],
        names=["q_id", "doc_id", "term", "tf", "df", "score_e6"],
    )


def _q_regex_search(sf_dir: str):
    """Lucene RegexpQuery: vocabulary matched with RE2
    (pc.match_substring_regex, anchored — same engine+dialect as the
    DuckDB oracle's regexp_full_match), then per-doc distinct
    matching-term counts (search/regex.py)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id
    from retriv_ray.search.regex import regex_search_table

    t = regex_search_table(_index(sf_dir), REGEX_QUERIES)
    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [t.column("q_id"), pa.array(docs, type=pa.int64()), t.column("n_terms")],
        names=["q_id", "doc_id", "n_terms"],
    )


def _q_resharded_postings(sf_dir: str):
    """Fleet-resize path: reshard the 4-part documents index to 6
    term-hash parts WITHOUT touching the corpus (pure metadata row
    move, index/reshard.py) and read POSTING_TERMS postings from the
    resharded index. Oracle: the same SQL as ``postings`` — the
    reshard must be indistinguishable from a full build at 6 parts
    (segment files are byte-identical by test)."""
    import pyarrow as pa

    from retriv_ray.index.reshard import reshard_index
    from retriv_ray.pipelines.documents import (
        CACHE_ROOT,
        ORACLE_BM25,
        conv_to_doc_id,
        documents_index,
    )
    from retriv_ray.search.searcher import RaySparseRetriever

    src = _index(sf_dir)  # cached 4-part build
    key = hashlib.sha1(
        f"reshard6|{src.index_dir}".encode()
    ).hexdigest()[:16]
    out_dir = os.path.join(CACHE_ROOT, f"resharded_{key}")
    if not os.path.exists(os.path.join(out_dir, "manifest.json")):
        reshard_index(src.index_dir, out_dir, 6)
    r = RaySparseRetriever(out_dir, ORACLE_BM25)
    t_out, d_out, f_out = [], [], []
    for term in POSTING_TERMS:
        d, f = r.index.get_postings(term)
        convs, _ = r.index.to_original_ids(d)
        orig = conv_to_doc_id(convs)
        t_out.extend([term] * len(d))
        d_out.extend(orig.tolist())
        f_out.extend(f.astype(np.int64).tolist())
    return pa.Table.from_arrays(
        [
            pa.array(t_out, type=pa.string()),
            pa.array(d_out, type=pa.int64()),
            pa.array(f_out, type=pa.int64()),
        ],
        names=["term", "doc_id", "tf"],
    )


def _q_federated_global_topk(sf_dir: str):
    """dfs_query_then_fetch federation: TWO independent indexes
    (documents split by doc_id % 2) score with MERGED global stats —
    the oracle is the unchanged single-corpus BM25 SQL, proving
    cross-index global-stats serving is exactly single-index
    semantics (search/federated.py)."""
    from retriv_ray.pipelines.documents import (
        ORACLE_BM25,
        documents_split_indexes,
    )
    from retriv_ray.search.federated import federated_msearch

    parts = documents_split_indexes(sf_dir, ORACLE_BM25, 2)
    t = federated_msearch(parts, TOPK_QUERIES, CUTOFF, mode="global")
    return _fed_to_docids(t)


def _q_federated_local_topk(sf_dir: str):
    """query_then_fetch federation (the ES default): each split index
    scores with its OWN df/doc_count/avgdl; the oracle recomputes
    per-corpus stats with corpus = doc_id % 2."""
    from retriv_ray.pipelines.documents import (
        ORACLE_BM25,
        documents_split_indexes,
    )
    from retriv_ray.search.federated import federated_msearch

    parts = documents_split_indexes(sf_dir, ORACLE_BM25, 2)
    t = federated_msearch(parts, TOPK_QUERIES, CUTOFF, mode="local")
    return _fed_to_docids(t)


def _fed_to_docids(t):
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id

    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [
            t.column("q_id"),
            t.column("rank"),
            pa.array(docs, type=pa.int64()),
        ],
        names=["q_id", "rank", "doc_id"],
    )


def _q_wildcard_search(sf_dir: str):
    """Lucene WildcardQuery over a vocabulary trigram index: literal
    runs >= 3 bytes intersect trigram posting lists, candidates are
    RE2-verified, then per-doc distinct matching-term counts
    (search/wildcard.py). Oracle = LIKE with the same whole-term
    semantics."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id
    from retriv_ray.search.wildcard import wildcard_search_table

    t = wildcard_search_table(_index(sf_dir), WILDCARD_QUERIES)
    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [t.column("q_id"), pa.array(docs, type=pa.int64()), t.column("n_terms")],
        names=["q_id", "doc_id", "n_terms"],
    )


def _q_lm_dirichlet_topk(sf_dir: str):
    """LM-Dirichlet query likelihood (Zhai-Lafferty; Lucene
    LMDirichletSimilarity) over the same index — every ln() term
    floor-quantized to 1e-6 BEFORE summation so the int64 total is
    order-free and the SQL twin reproduces it exactly
    (search/lm.py)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id
    from retriv_ray.search.lm import lm_dirichlet_table

    t = lm_dirichlet_table(_index(sf_dir), TOPK_QUERIES, CUTOFF, LM_MU)
    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [
            t.column("q_id"),
            t.column("rank"),
            pa.array(docs, type=pa.int64()),
            t.column("score_e6"),
        ],
        names=["q_id", "rank", "doc_id", "score_e6"],
    )


def _q_search_after(sf_dir: str):
    """Cursor pagination: page 2 of each BM25 ranking fetched
    statelessly via the (score, doc_id) cursor of page 1's last hit
    (search/pagination.py) — ranks CUTOFF+1..2*CUTOFF."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id
    from retriv_ray.search.pagination import search_after_table

    r = _index(sf_dir)
    parts = []
    for q_id, text in TOPK_QUERIES.items():
        p1 = search_after_table(r, text, q_id, page_size=CUTOFF)
        if p1.num_rows == 0:
            continue
        cursor = (
            p1.column("score")[-1].as_py(),
            p1.column("doc_id")[-1].as_py(),
        )
        p2 = search_after_table(r, text, q_id, page_size=CUTOFF, cursor=cursor)
        docs = conv_to_doc_id(p2.column("conv_id").to_pylist())
        parts.append(
            pa.Table.from_arrays(
                [
                    p2.column("q_id"),
                    p2.column("rank"),
                    pa.array(docs, type=pa.int64()),
                ],
                names=["q_id", "rank", "doc_id"],
            )
        )
    return pa.concat_tables(parts)


def _q_more_like_this(sf_dir: str):
    """Similar-document retrieval: the source doc's top quantized
    TF-IDF terms (index df stats, tfidf_keywords contract) run as a
    disjunctive BM25 query, source excluded (search/mlt.py)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    from retriv_ray.search.mlt import more_like_this

    r = _index(sf_dir)
    src = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).filter(pc.is_in(pc.field("doc_id"), pa.array(MLT_DOC_IDS)))
    texts = dict(
        zip(src.column("doc_id").to_pylist(), src.column("text").to_pylist())
    )
    parts = []
    for d in MLT_DOC_IDS:
        t = more_like_this(
            r, texts[d], exclude_doc=d, top_terms=MLT_TERMS, cutoff=CUTOFF
        )
        parts.append(
            pa.Table.from_arrays(
                [
                    pa.array([f"m{d}"] * t.num_rows, type=pa.string()),
                    t.column("rank"),
                    t.column("doc_id"),
                ],
                names=["q_id", "rank", "doc_id"],
            )
        )
    return pa.concat_tables(parts)


def _q_top_hits(sf_dir: str):
    """ES top_hits sub-aggregation: per-lang top-3 BM25 hits for each
    facet query — one kernel run per bucket through the subset path,
    never a corpus pass (search/facets.py:top_hits)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import (
        conv_to_doc_id,
        ensure_documents_metadata,
    )
    from retriv_ray.search.facets import top_hits

    r = _index(sf_dir)
    ensure_documents_metadata(sf_dir, r)
    parts = []
    for q_id in sorted(FACET_QUERIES):
        t = top_hits(r, FACET_QUERIES[q_id], "lang", n=3)
        docs = conv_to_doc_id(t.column("conv_id").to_pylist())
        parts.append(
            pa.Table.from_arrays(
                [
                    pa.array([q_id] * t.num_rows, type=pa.string()),
                    t.column("value"),
                    t.column("rank"),
                    pa.array(docs, type=pa.int64()),
                ],
                names=["q_id", "lang", "rank", "doc_id"],
            )
        )
    return pa.concat_tables(parts)


def _q_facet_counts(sf_dir: str):
    """Elasticsearch-style terms aggregation: per facet-field value
    counts over each query's matching set (union of query-term
    postings ∩ metadata postings via sorted-set probes,
    search/facets.py)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import ensure_documents_metadata
    from retriv_ray.search.facets import facet_counts

    r = _index(sf_dir)
    ensure_documents_metadata(sf_dir, r)
    parts = []
    for q_id in sorted(FACET_QUERIES):
        t = facet_counts(r, FACET_QUERIES[q_id], FACET_FIELDS)
        parts.append(
            t.add_column(
                0, "q_id", pa.array([q_id] * t.num_rows, type=pa.string())
            )
        )
    return pa.concat_tables(parts)


def _q_fusion_topk(sf_dir: str):
    """Weighted min-max fusion of the BM25 and TF-IDF runs (reference
    merger/merger.py:18-49) via the Ray-Data fusion operator."""
    import ray.data
    import pyarrow as pa
    import pyarrow.compute as pc

    from retriv_ray.merger import fuse_runs_ds
    from retriv_ray.pipelines.documents import (
        ORACLE_TFIDF,
        conv_to_doc_id,
        documents_index,
    )

    rows = []
    for run_idx, r in enumerate(
        [_index(sf_dir), documents_index(sf_dir, ORACLE_TFIDF)]
    ):
        for q_id, text in TOPK_QUERIES.items():
            res = r.search(text, cutoff=CUTOFF)
            docs = conv_to_doc_id([c for c, _ in res.keys()])
            for d, s in zip(docs.tolist(), res.values()):
                rows.append(
                    {
                        "run_idx": run_idx,
                        "q_id": q_id,
                        "doc_id": str(d),
                        "score": float(s),
                    }
                )
    fused = fuse_runs_ds(
        ray.data.from_items(rows),
        norm="min-max",
        weights=list(FUSION_WEIGHTS),
        cutoff=CUTOFF,
    )
    t = fused.to_pandas()
    return pa.Table.from_arrays(
        [
            pa.array(t["q_id"], type=pa.string()),
            pa.array(t["rank"].astype("int64")),
            pa.array(t["doc_id"].astype("int64")),
        ],
        names=["q_id", "rank", "doc_id"],
    )


def _q_hard_negatives(sf_dir: str):
    """DPR-style hard-negative mining: per query, the top BM25 hits
    excluding the known positive (here: the query's own top-1),
    renumbered 1..n (search/negatives.py). Oracle: the bm25 ranking's
    rows 2..n+1 with rank shifted down by one."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import conv_to_doc_id
    from retriv_ray.search.negatives import mine_hard_negatives

    r = _index(sf_dir)
    pairs = {}
    for q_id, text in TOPK_QUERIES.items():
        res = r.search(text, cutoff=1)
        conv, turn = next(iter(res.keys()))
        pairs[q_id] = (text, (conv, int(turn)))
    t = mine_hard_negatives(r, pairs, n_negatives=CUTOFF)
    docs = conv_to_doc_id(t.column("conv_id").to_pylist())
    return pa.Table.from_arrays(
        [t.column("q_id"), t.column("rank"), pa.array(docs, type=pa.int64())],
        names=["q_id", "rank", "doc_id"],
    )


def _q_rrf_topk(sf_dir: str):
    """Reciprocal-rank fusion (Cormack 2009) of the BM25 and TF-IDF
    runs: each run contributes floor(1e6/(60+rank)) per doc, summed —
    integer-exact, so the oracle hash covers the fused SCORES too.
    Doc ids are zero-padded in the runs so the operator's string
    tie-order equals the oracle's numeric order
    (merger/__init__.py:rrf_fuse_ds)."""
    import ray.data
    import pyarrow as pa

    from retriv_ray.merger import rrf_fuse_ds
    from retriv_ray.pipelines.documents import (
        ORACLE_TFIDF,
        conv_to_doc_id,
        documents_index,
    )

    rows = []
    for run_idx, r in enumerate(
        [_index(sf_dir), documents_index(sf_dir, ORACLE_TFIDF)]
    ):
        for q_id, text in TOPK_QUERIES.items():
            res = r.search(text, cutoff=CUTOFF)
            docs = conv_to_doc_id([c for c, _ in res.keys()])
            for d, s in zip(docs.tolist(), res.values()):
                rows.append(
                    {
                        "run_idx": run_idx,
                        "q_id": q_id,
                        "doc_id": f"{d:012d}",
                        "score": float(s),
                    }
                )
    fused = rrf_fuse_ds(ray.data.from_items(rows), k=RRF_K, cutoff=CUTOFF)
    t = fused.to_pandas()
    return pa.Table.from_arrays(
        [
            pa.array(t["q_id"], type=pa.string()),
            pa.array(t["rank"].astype("int64")),
            pa.array(t["doc_id"].astype("int64")),
            pa.array(t["score_e6"].astype("int64")),
        ],
        names=["q_id", "rank", "doc_id", "score_e6"],
    )


def _q_bm25_full_chain(sf_dir: str):
    """Default retriv preprocessing (stemmer+stopwords, float32) —
    not SQL-expressible; rows-only check, parity pinned by the golden
    tests instead."""
    from retriv_ray.config import SparseConfig
    from retriv_ray.pipelines.documents import documents_index, topk_table

    r = documents_index(sf_dir, SparseConfig(score_dtype="float32"))
    return topk_table(r, TOPK_QUERIES, CUTOFF)


def _q_decay_topk(sf_dir: str):
    """function_score exp decay (search/decay.py): every matching
    doc's BM25 score is multiplied by
    DECAY_RATE ** (|n_chars - origin| / scale) before the top-k cut
    (ES function_score semantics, not a window rescorer)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import (
        conv_to_doc_id,
        ensure_documents_metadata,
    )
    from retriv_ray.search.decay import decay_queries

    r = _index(sf_dir)
    ensure_documents_metadata(sf_dir, r)
    t = decay_queries(
        r, TOPK_QUERIES, DECAY_FIELD, DECAY_ORIGIN, DECAY_SCALE,
        DECAY_RATE, cutoff=CUTOFF,
    )
    convs, _ = r.index.to_original_ids(t.column("doc_id").to_numpy())
    return pa.Table.from_arrays(
        [
            t.column("q_id"),
            t.column("rank"),
            pa.array(conv_to_doc_id(convs), type=pa.int64()),
        ],
        names=["q_id", "rank", "doc_id"],
    )


def _q_sort_by_field(sf_dir: str):
    """ES sort: the query's matching set ordered by n_chars desc
    (doc_id tie-break) instead of relevance (search/fieldsort.py)."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import (
        conv_to_doc_id,
        ensure_documents_metadata,
    )
    from retriv_ray.search.fieldsort import sort_queries

    r = _index(sf_dir)
    ensure_documents_metadata(sf_dir, r)
    t = sort_queries(r, TOPK_QUERIES, SORT_FIELD, cutoff=CUTOFF)
    convs, _ = r.index.to_original_ids(t.column("doc_id").to_numpy())
    return pa.Table.from_arrays(
        [
            t.column("q_id"),
            t.column("rank"),
            pa.array(conv_to_doc_id(convs), type=pa.int64()),
            pa.array(
                t.column("value").to_numpy().astype("int64"), type=pa.int64()
            ),
        ],
        names=["q_id", "rank", "doc_id", "value"],
    )


def _q_grouped_topk(sf_dir: str):
    """Bucket ranking by aggregated relevance (search/groupscore.py):
    sources ranked by the max BM25 score of their docs; each bucket
    reports its best (score desc, doc_id) document."""
    import pyarrow as pa

    from retriv_ray.pipelines.documents import (
        conv_to_doc_id,
        ensure_documents_metadata,
    )
    from retriv_ray.search.groupscore import grouped_queries

    r = _index(sf_dir)
    ensure_documents_metadata(sf_dir, r)
    t = grouped_queries(r, TOPK_QUERIES, GROUP_FIELD, "max", cutoff=CUTOFF)
    convs, _ = r.index.to_original_ids(t.column("doc_id").to_numpy())
    return pa.Table.from_arrays(
        [
            t.column("q_id"),
            t.column("rank"),
            t.column("value"),
            pa.array(conv_to_doc_id(convs), type=pa.int64()),
        ],
        names=["q_id", "rank", "value", "doc_id"],
    )


def _q_term_vectors(sf_dir: str):
    """ES _termvectors (search/termvectors.py): per-doc (term, tf, df)
    for a requested doc subset — a streaming actor-pool tokenize +
    lazy TermStats df probe, never touching posting lists."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from retriv_ray.pipelines.documents import conv_to_doc_id
    from retriv_ray.search.termvectors import term_vectors_ds

    r = _index(sf_dir)
    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).filter(expr=f"doc_id in {TERMVEC_DOC_IDS}")

    def to_turns(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return pa.Table.from_arrays(
            [
                pa.array([f"d{i:012d}" for i in ids], type=pa.string()),
                pa.array(np.zeros(len(ids), dtype=np.int32)),
                batch.column("text"),
            ],
            names=["conv_id", "turn_idx", "text"],
        )

    tv = term_vectors_ds(r, docs.map_batches(to_turns, batch_format="pyarrow"))
    t = pa.Table.from_pandas(tv.to_pandas())  # bounded: subset docs only
    doc_ids = conv_to_doc_id(t.column("conv_id").to_pylist())
    out = pa.Table.from_arrays(
        [
            pa.array(doc_ids, type=pa.int64()),
            pc.cast(t.column("term"), pa.string()),
            pc.cast(t.column("tf"), pa.int64()),
            pc.cast(t.column("df"), pa.int64()),
        ],
        names=["doc_id", "term", "tf", "df"],
    )
    return out.sort_by([("doc_id", "ascending"), ("term", "ascending")])


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "vocabulary": _q_vocabulary,
        "doc_lens": _q_doc_lens,
        "postings": _q_postings,
        "merged_postings": _q_merged_postings,
        "resharded_postings": _q_resharded_postings,
        "deleted_bm25_topk": _q_deleted_bm25_topk,
        "pruned_bm25_topk": _q_pruned_bm25_topk,
        "bm25_and_topk": _q_bm25_and_topk,
        "bm25_topk": _q_bm25_topk,
        "rank_eval": _q_rank_eval,
        "rank_eval_bootstrap": _q_rank_eval_bootstrap,
        "bm25_topk_sharded": _q_bm25_topk_sharded,
        "boolean_search": _q_boolean_search,
        "boolean_msm": _q_boolean_msm,
        "query_string": _q_query_string,
        "line_dedup": _q_line_dedup,
        "facet_stats": _q_facet_stats,
        "percolate": _q_percolate,
        "substring_dedup": _q_substring_dedup,
        "response_pairs": _q_response_pairs,
        "sft_spans": _q_sft_spans,
        "bpe_train": _q_bpe_train,
        "conversation_windows": _q_conversation_windows,
        "conversation_filter": _q_conversation_filter,
        "bigram_lm": _q_bigram_lm,
        "phrase_search": _q_phrase_search,
        "phrase_bm25_topk": _q_phrase_bm25_topk,
        "proximity_search": _q_proximity_search,
        "rescore_topk": _q_rescore_topk,
        "prefix_search": _q_prefix_search,
        "fuzzy_search": _q_fuzzy_search,
        "spell_suggest": _q_spell_suggest,
        "autocomplete": _q_autocomplete,
        "facet_counts": _q_facet_counts,
        "top_hits": _q_top_hits,
        "more_like_this": _q_more_like_this,
        "search_after": _q_search_after,
        "regex_search": _q_regex_search,
        "wildcard_search": _q_wildcard_search,
        "lm_dirichlet_topk": _q_lm_dirichlet_topk,
        "federated_global_topk": _q_federated_global_topk,
        "federated_local_topk": _q_federated_local_topk,
        "explain_top1": _q_explain_top1,
        "hybrid_topk": _q_hybrid_topk,
        "hybrid_encoded_topk": _q_hybrid_encoded_topk,
        "collapse_topk": _q_collapse_topk,
        "decay_topk": _q_decay_topk,
        "sort_by_field": _q_sort_by_field,
        "grouped_topk": _q_grouped_topk,
        "term_vectors": _q_term_vectors,
        "range_facets": _q_range_facets,
        "significant_terms": _q_significant_terms,
        "index_stats": _q_index_stats,
        "snippets": _q_snippets,
        "tfidf_topk": _q_tfidf_topk,
        "filtered_bm25_topk": _q_filtered_bm25,
        "filtered_bm25_topk_sharded": _q_filtered_bm25_sharded,
        "fusion_topk": _q_fusion_topk,
        "rrf_topk": _q_rrf_topk,
        "hard_negatives": _q_hard_negatives,
        "bm25_full_chain": _q_bm25_full_chain,
        "dedup_exact": _q_dedup_exact,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "minhash_lsh_pairs": _q_minhash_lsh,
        "simhash": _q_simhash,
        "ann_cosine_topk": _q_ann_cosine,
        "ann_filtered_topk": _q_ann_filtered,
        "mmr_rerank": _q_mmr_rerank,
        "ann_lsh_topk": _q_ann_lsh,
        "ann_ivf_topk": _q_ann_ivf,
        "ann_pq_topk": _q_ann_pq,
        "embedding_near_dup": _q_embedding_near_dup,
        "quality_stats": _q_quality,
        "bpe_token_count": _q_bpe_tokens,
        "language_id": _q_langid,
        "tokens_by_source": _q_tokens_by_source,
        "doc_fingerprint": _q_fingerprint,
        "events_hourly": _q_events_hourly,
        "sessionize": _q_sessionize,
        "events_hopping": _q_events_hopping,
        "asof_join": _q_asof_join,
        "range_join": _q_range_join,
        "multimodal_features": _q_multimodal,
        "dedup_filter": _q_dedup_filter,
        "clean_text": _q_clean_text,
        "resumable_write": _q_resumable_write,
        "approx_topk": _q_approx_topk,
        "split_by_hash": _q_split_by_hash,
        "chunk_documents": _q_chunk_documents,
        "pack_token_stream": _q_pack_token_stream,
        "topk_per_group": _q_topk_per_group,
        "pii_scrub": _q_pii_scrub,
        "repetition_stats": _q_repetition_stats,
        "top_ngrams": _q_top_ngrams,
        "stratified_sample": _q_stratified_sample,
        "mixture_sample": _q_mixture_sample,
        "contamination_check": _q_contamination_check,
        "token_rarity": _q_token_rarity,
        "duplicate_windows": _q_duplicate_windows,
        "dedup_clusters": _q_dedup_clusters,
        "cluster_dedup_filter": _q_cluster_dedup,
        "length_quantiles": _q_length_quantiles,
        "tfidf_keywords": _q_tfidf_keywords,
        "rolling_events": _q_rolling_events,
        "jaccard_join": _q_jaccard_join,
        "weighted_sample": _q_weighted_sample,
        "gopher_filter": _q_gopher_filter,
        "pmi_collocations": _q_pmi_collocations,
        "profile_columns": _q_profile_columns,
        "group_centroids": _q_group_centroids,
        "kmeans_assign": _q_kmeans_assign,
        "semantic_dedup": _q_semantic_dedup,
        "knn_join": _q_knn_join,
        "bm25f_topk": _q_bm25f_topk,
        "dis_max_topk": _q_dis_max_topk,
        "boosting_topk": _q_boosting_topk,
        "max_passage_topk": _q_max_passage_topk,
        "bm25plus_topk": _q_bm25plus_topk,
        "ltr_features": _q_ltr_features,
        "numeric_histogram": _q_numeric_histogram,
        "star_revenue_topk": _q_star_revenue,
        "orders_by_nation": _q_orders_by_nation,
        "rollup_counts": _q_rollup_counts,
        "funnel_stages": _q_funnel,
        "retention_cohorts": _q_retention_cohorts,
        "rolling_time_events": _q_rolling_time_events,
        "distinct_users_daily": _q_distinct_users_daily,
        "composite_agg": _q_composite_agg,
        "approx_distinct": _q_approx_distinct,
        "approx_count": _q_approx_count,
        "group_percentiles": _q_group_percentiles,
        "windowed_percentiles": _q_windowed_percentiles,
        "pivot_counts": _q_pivot_counts,
        "corr_stats": _q_corr_stats,
        "dataset_diff": _q_dataset_diff,
        "population_drift": _q_population_drift,
        "top_metrics": _q_top_metrics,
        "orc_roundtrip": _q_orc_roundtrip,
        "incremental_agg": _q_incremental_agg,
        "percentile_ranks": _q_percentile_ranks,
        "rare_terms": _q_rare_terms,
        "adjacency_matrix": _q_adjacency_matrix,
        "filters_agg": _q_filters_agg,
        "phrase_suggest": _q_phrase_suggest,
        "rank_feature_topk": _q_rank_feature_topk,
        "date_histogram_pipeline": _q_date_histogram_pipeline,
        "parse_json": _q_parse_json,
        "quantile_filter": _q_quantile_filter,
        "customers_without_orders": _q_customers_without_orders,
        "order_priority_join": _q_order_priority_join,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB, same parquet tables as views)
# ---------------------------------------------------------------------------

_Q_VALUES = " , ".join(
    f"('{q_id}', '{text}')" for q_id, text in TOPK_QUERIES.items()
)
_RESCORE_VALUES = " , ".join(
    f"('{q}', '{t}', '{a}', '{bt}', {w})"
    for q, (t, a, bt, w) in sorted(RESCORE_QUERIES.items())
)
_QTERMS = (
    "qterms AS (SELECT q_id, unnest(string_split(qtext, ' ')) AS term "
    f"FROM (VALUES {_Q_VALUES}) AS q(q_id, qtext))"
)
_BASE_CTES = f"""
docs AS (SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks FROM documents),
toks AS (SELECT doc_id, unnest(toks) AS term FROM docs),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM docs),
stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                 (SELECT sum(len(toks)) FROM docs)::DOUBLE
                 / (SELECT count(*) FROM documents)::DOUBLE AS avgdl)
"""

_MARKER_SQL = {
    "de": "('der','die','und','nicht','das','ist')",
    "en": "('the','and','of','to','is','a')",
    "es": "('el','la','los','que','y','de')",
    "fr": "('le','la','les','et','est','une')",
}
_LANG_COUNTS = ", ".join(
    f"len(list_filter(toks, x -> x IN {m})) AS c_{l}" for l, m in _MARKER_SQL.items()
)

_BPE_RE_SQL = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r\\f\\v]"

# winnowing fingerprint oracle constants (must match ops/textstats.py:
# base 1000003 mod 2^61-1, window 8, md5_number_lower token hashes)
_WINNOW_P = (1 << 61) - 1
_WINNOW_PW_VALUES = " , ".join(
    f"({off}, {pow(1000003, 7 - off, _WINNOW_P)})" for off in range(8)
)

_ANN_TOPK_SQL = """
    WITH q AS (
      SELECT vec_id AS q_vec_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id IN (0,1,2,3,4)),
    sims AS (
      SELECT q.q_vec_id, e.vec_id,
             list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS sim
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_vec_id)
    SELECT q_vec_id, rank, vec_id FROM (
      SELECT q_vec_id, vec_id,
        row_number() OVER (PARTITION BY q_vec_id ORDER BY sim DESC, vec_id) AS rank
      FROM sims)
    WHERE rank <= 10 ORDER BY q_vec_id, rank
"""

_NGRAM_JACCARD_SQL = f"""
    WITH docs AS (SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS t FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM docs, unnest(generate_series(1, len(t) - 2)) AS u(i)
      WHERE len(t) >= 3),
    sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM grams GROUP BY doc_id),
    inter AS (
      SELECT g1.doc_id AS a, g2.doc_id AS b, count(*)::DOUBLE AS i
      FROM grams g1 JOIN grams g2 ON g1.g = g2.g AND g1.doc_id < g2.doc_id
      GROUP BY g1.doc_id, g2.doc_id)
    SELECT a AS doc_id_a, b AS doc_id_b,
           floor(10000 * i / (sa.sz + sb.sz - i))::BIGINT AS jaccard_e4
    FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
    WHERE i / (sa.sz + sb.sz - i) >= 0.5
"""


def oracle_sql() -> dict[str, str]:
    k1, b = 1.2, 0.75
    _filter_cases = " OR ".join(
        f"(s.q_id = '{q}' AND {cond})" for q, (_qd, cond) in FILTERED_QUERIES.items()
    )
    _fq_values = " , ".join(
        f"('{q}', '{qd['text']}')" for q, (qd, _c) in FILTERED_QUERIES.items()
    )
    _fqterms = (
        "qterms AS (SELECT q_id, unnest(string_split(qtext, ' ')) AS term "
        f"FROM (VALUES {_fq_values}) AS q(q_id, qtext))"
    )
    wa, wb = FUSION_WEIGHTS
    _fuzzy_values = " , ".join(
        f"('{q}', '{t}', {d})" for q, (t, d) in FUZZY_QUERIES.items()
    )
    _prefix_pairs = " , ".join(
        f"('{q}', '{p}')" for q, p in PREFIX_QUERIES.items()
    )
    _suggest_values = " , ".join(
        f"('{q}', '{t}')" for q, t in SUGGEST_QUERIES.items()
    )
    _mlt_values = " , ".join(f"('m{d}', {d})" for d in MLT_DOC_IDS)
    _hybrid_values = " , ".join(
        f"('{q}', {v})" for q, v in HYBRID_PAIRS.items()
    )
    _topk_qtext_values = " , ".join(
        f"('{q}', '{t}')" for q, t in TOPK_QUERIES.items()
    )
    hws, hwd = HYBRID_WEIGHTS
    _regex_values = " , ".join(
        f"('{q}', '{p}')" for q, p in REGEX_QUERIES.items()
    )
    from retriv_ray.search.wildcard import wildcard_to_like

    _wildcard_values = " , ".join(
        f"('{q}', '{wildcard_to_like(p)}')"
        for q, p in WILDCARD_QUERIES.items()
    )
    _facet_values = " , ".join(
        f"('{q}', '{t}')" for q, t in FACET_QUERIES.items()
    )
    _range_values = " , ".join(
        f"({lo}, {hi})"
        for lo, hi in zip(RANGE_FACET_EDGES[:-1], RANGE_FACET_EDGES[1:])
    )
    _facet_arms = " UNION ALL ".join(
        f"""SELECT m.q_id, '{f}' AS field, d.{f}::VARCHAR AS value,
                   count(*)::BIGINT AS n_docs
            FROM matching m JOIN documents d ON d.doc_id = m.doc_id
            GROUP BY m.q_id, d.{f}"""
        for f in FACET_FIELDS
    )
    out = {
        "filtered_bm25_topk": f"""
            WITH {_BASE_CTES}, {_fqterms},
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q
              JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s
              GROUP BY q.q_id, tf.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT s.q_id, s.doc_id,
                row_number() OVER (PARTITION BY s.q_id ORDER BY s.score DESC, s.doc_id) AS rank
              FROM scores s JOIN documents d ON d.doc_id = s.doc_id
              WHERE {_filter_cases})
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "fusion_topk": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            bm AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s GROUP BY q.q_id, tf.doc_id),
            ti AS (
              SELECT q.q_id, tf.doc_id,
                sum( (tf.tf / dl.dl) * (ln((1 + s.n) / (1 + df.df)) + 1) ) AS score
              FROM qterms q JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s GROUP BY q.q_id, tf.doc_id),
            bmc AS (SELECT * FROM (
              SELECT q_id, doc_id, score,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rnk
              FROM bm) WHERE rnk <= {CUTOFF}),
            tic AS (SELECT * FROM (
              SELECT q_id, doc_id, score,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rnk
              FROM ti) WHERE rnk <= {CUTOFF}),
            bmn AS (SELECT q_id, doc_id,
              (score - min(score) OVER (PARTITION BY q_id))
              / greatest(max(score) OVER (PARTITION BY q_id)
                         - min(score) OVER (PARTITION BY q_id), 1e-9) AS ns
              FROM bmc),
            tin AS (SELECT q_id, doc_id,
              (score - min(score) OVER (PARTITION BY q_id))
              / greatest(max(score) OVER (PARTITION BY q_id)
                         - min(score) OVER (PARTITION BY q_id), 1e-9) AS ns
              FROM tic),
            fused AS (
              SELECT coalesce(b.q_id, t.q_id) AS q_id,
                     coalesce(b.doc_id, t.doc_id) AS doc_id,
                     coalesce({wa} * b.ns, 0) + coalesce({wb} * t.ns, 0) AS fs
              FROM bmn b FULL OUTER JOIN tin t
              ON b.q_id = t.q_id AND b.doc_id = t.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY fs DESC, doc_id) AS rank
              FROM fused)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        # RRF: per-run ranks (score DESC, doc_id) to depth CUTOFF, each
        # contributing the integer 1e6 // (k + rank); sums and ties are
        # exact, so the hash covers score_e6 values, not just ranks
        "rrf_topk": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            bm AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s GROUP BY q.q_id, tf.doc_id),
            ti AS (
              SELECT q.q_id, tf.doc_id,
                sum( (tf.tf / dl.dl) * (ln((1 + s.n) / (1 + df.df)) + 1) ) AS score
              FROM qterms q JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s GROUP BY q.q_id, tf.doc_id),
            bmc AS (SELECT * FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rnk
              FROM bm) WHERE rnk <= {CUTOFF}),
            tic AS (SELECT * FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rnk
              FROM ti) WHERE rnk <= {CUTOFF}),
            fused AS (
              SELECT coalesce(b.q_id, t.q_id) AS q_id,
                     coalesce(b.doc_id, t.doc_id) AS doc_id,
                     coalesce(1000000 // (60 + b.rnk), 0)
                     + coalesce(1000000 // (60 + t.rnk), 0) AS score_e6
              FROM bmc b FULL OUTER JOIN tic t
              ON b.q_id = t.q_id AND b.doc_id = t.doc_id)
            SELECT q_id, rank, doc_id, score_e6 FROM (
              SELECT q_id, doc_id, score_e6,
                row_number() OVER (PARTITION BY q_id ORDER BY score_e6 DESC, doc_id) AS rank
              FROM fused)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "prefix_search": f"""
            WITH {_BASE_CTES},
            w1 AS (SELECT 'w1' AS q_id, doc_id, count(DISTINCT term)::BIGINT AS n_terms
                   FROM tf WHERE term LIKE 's%' GROUP BY doc_id),
            w2 AS (SELECT 'w2' AS q_id, doc_id, count(DISTINCT term)::BIGINT AS n_terms
                   FROM tf WHERE term LIKE 'c%' GROUP BY doc_id),
            w3 AS (SELECT 'w3' AS q_id, doc_id, count(DISTINCT term)::BIGINT AS n_terms
                   FROM tf WHERE term LIKE 'qu%' GROUP BY doc_id)
            SELECT q_id, doc_id, n_terms FROM (
              SELECT * FROM w1 UNION ALL SELECT * FROM w2 UNION ALL SELECT * FROM w3)
            ORDER BY q_id, doc_id
        """,
        "fuzzy_search": f"""
            WITH {_BASE_CTES},
            fq(q_id, qterm, d) AS (VALUES {_fuzzy_values}),
            exp AS (
              SELECT DISTINCT fq.q_id, df.term
              FROM fq JOIN df ON levenshtein(df.term, fq.qterm) <= fq.d),
            scores AS (
              SELECT e.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM exp e
              JOIN tf ON tf.term = e.term
              JOIN df ON df.term = e.term
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s
              GROUP BY e.q_id, tf.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
              FROM scores)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "range_facets": f"""
            WITH {_BASE_CTES},
            fcq AS (SELECT q_id, unnest(string_split(qtext, ' ')) AS term
                    FROM (VALUES {_facet_values}) AS q(q_id, qtext)),
            matching AS (
              SELECT DISTINCT q.q_id, tf.doc_id
              FROM fcq q JOIN tf ON tf.term = q.term),
            bk(lo, hi) AS (VALUES {_range_values})
            SELECT m.q_id, bk.lo::DOUBLE AS lo, bk.hi::DOUBLE AS hi,
                   count(*)::BIGINT AS n_docs
            FROM matching m
            JOIN documents d ON d.doc_id = m.doc_id
            JOIN bk ON d.n_chars >= bk.lo AND d.n_chars < bk.hi
            GROUP BY m.q_id, bk.lo, bk.hi
            ORDER BY q_id, lo
        """,
        "significant_terms": f"""
            WITH {_BASE_CTES},
            fcq AS (SELECT q_id, unnest(string_split(qtext, ' ')) AS term
                    FROM (VALUES {_facet_values}) AS q(q_id, qtext)),
            matching AS (
              SELECT DISTINCT q.q_id, tf.doc_id
              FROM fcq q JOIN tf ON tf.term = q.term),
            nfg AS (SELECT q_id, count(*)::BIGINT AS n_fg
                    FROM matching GROUP BY q_id),
            fg AS (
              SELECT m.q_id, t.term, count(*)::BIGINT AS df_fg
              FROM matching m JOIN tf t ON t.doc_id = m.doc_id
              GROUP BY m.q_id, t.term),
            scored AS (
              SELECT fg.q_id, fg.term, fg.df_fg, df.df::BIGINT AS df,
                (10000 * fg.df_fg * s.n::BIGINT)
                  // (df.df::BIGINT * nfg.n_fg) AS lift_e4
              FROM fg
              JOIN df ON df.term = fg.term
              JOIN nfg ON nfg.q_id = fg.q_id
              CROSS JOIN stats s
              WHERE fg.df_fg >= {SIGTERMS_MIN_DF_FG})
            SELECT q_id, term, df_fg, df, lift_e4 FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_id
                ORDER BY lift_e4 DESC, df_fg DESC, term) AS rn
              FROM scored)
            WHERE rn <= {SIGTERMS_TOPK} ORDER BY q_id, term
        """,
        "index_stats": f"""
            WITH {_BASE_CTES}
            SELECT
              (SELECT count(*) FROM documents)::BIGINT AS doc_count,
              (SELECT count(*) FROM df)::BIGINT AS vocab_size,
              (SELECT count(*) FROM tf)::BIGINT AS postings_rows,
              (SELECT sum(tf) FROM tf)::BIGINT AS total_tf
        """,
        "collapse_topk": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s GROUP BY q.q_id, tf.doc_id),
            ranked AS (
              SELECT sc.q_id, sc.doc_id, d.{COLLAPSE_FIELD}::VARCHAR AS value,
                row_number() OVER (PARTITION BY sc.q_id
                                   ORDER BY sc.score DESC, sc.doc_id) AS r
              FROM scores sc JOIN documents d ON d.doc_id = sc.doc_id),
            grp AS (
              SELECT *, row_number() OVER (PARTITION BY q_id, value ORDER BY r)
                AS vr
              FROM ranked)
            SELECT q_id, rank, doc_id, value FROM (
              SELECT q_id, doc_id, value,
                row_number() OVER (PARTITION BY q_id ORDER BY r) AS rank
              FROM grp WHERE vr <= {COLLAPSE_PER_VALUE})
            WHERE rank <= {COLLAPSE_CUTOFF} ORDER BY q_id, rank
        """,
        "decay_topk": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s GROUP BY q.q_id, tf.doc_id),
            dec AS (
              SELECT sc.q_id, sc.doc_id,
                sc.score * pow({DECAY_RATE},
                              abs(d.n_chars - {DECAY_ORIGIN}) / {DECAY_SCALE})
                  AS fs
              FROM scores sc JOIN documents d ON d.doc_id = sc.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY fs DESC, doc_id) AS rank
              FROM dec)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "sort_by_field": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            cand AS (
              SELECT DISTINCT q.q_id, tf.doc_id
              FROM qterms q JOIN tf ON tf.term = q.term)
            SELECT q_id, rank, doc_id, value FROM (
              SELECT c.q_id, c.doc_id, d.n_chars::BIGINT AS value,
                row_number() OVER (PARTITION BY c.q_id
                                   ORDER BY d.n_chars DESC, c.doc_id) AS rank
              FROM cand c JOIN documents d ON d.doc_id = c.doc_id)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "grouped_topk": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s GROUP BY q.q_id, tf.doc_id),
            ranked AS (
              SELECT sc.q_id, d.{GROUP_FIELD}::VARCHAR AS value, sc.doc_id,
                sc.score,
                row_number() OVER (PARTITION BY sc.q_id, d.{GROUP_FIELD}
                                   ORDER BY sc.score DESC, sc.doc_id) AS vr
              FROM scores sc JOIN documents d ON d.doc_id = sc.doc_id)
            SELECT q_id, rank, value, doc_id FROM (
              SELECT q_id, value, doc_id,
                row_number() OVER (PARTITION BY q_id
                                   ORDER BY score DESC, value) AS rank
              FROM ranked WHERE vr = 1)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "term_vectors": f"""
            WITH {_BASE_CTES}
            SELECT tf.doc_id, tf.term, tf.tf::BIGINT AS tf, df.df::BIGINT AS df
            FROM tf JOIN df ON df.term = tf.term
            WHERE tf.doc_id IN ({", ".join(str(i) for i in TERMVEC_DOC_IDS)})
            ORDER BY tf.doc_id, tf.term
        """,
        "hybrid_topk": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            bm AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s GROUP BY q.q_id, tf.doc_id),
            hp(q_id, qvec) AS (VALUES {_hybrid_values}),
            sims AS (
              SELECT h.q_id, e.vec_id AS doc_id,
                     list_cosine_similarity(
                       qe.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS score
              FROM hp h JOIN embeddings qe ON qe.vec_id = h.qvec
              CROSS JOIN embeddings e),
            bmc AS (SELECT * FROM (
              SELECT q_id, doc_id, score,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rnk
              FROM bm) WHERE rnk <= {CUTOFF}),
            dnc AS (SELECT * FROM (
              SELECT q_id, doc_id, score,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rnk
              FROM sims) WHERE rnk <= {CUTOFF}),
            bmn AS (SELECT q_id, doc_id,
              (score - min(score) OVER (PARTITION BY q_id))
              / greatest(max(score) OVER (PARTITION BY q_id)
                         - min(score) OVER (PARTITION BY q_id), 1e-9) AS ns
              FROM bmc),
            dnn AS (SELECT q_id, doc_id,
              (score - min(score) OVER (PARTITION BY q_id))
              / greatest(max(score) OVER (PARTITION BY q_id)
                         - min(score) OVER (PARTITION BY q_id), 1e-9) AS ns
              FROM dnc),
            fused AS (
              SELECT coalesce(b.q_id, d.q_id) AS q_id,
                     coalesce(b.doc_id, d.doc_id) AS doc_id,
                     coalesce({hws} * b.ns, 0) + coalesce({hwd} * d.ns, 0) AS fs
              FROM bmn b FULL OUTER JOIN dnn d
              ON b.q_id = d.q_id AND b.doc_id = d.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY fs DESC, doc_id) AS rank
              FROM fused)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        # hybrid through the real encode path: the HashingEncoder(md5)
        # arithmetic — lower+split, md5_number_lower('seed:'||tok),
        # bucket h % dim, sign bit 63, L2-normalized cosine == raw
        # dot/(|q||d|) — reproduced term-for-term; fusion identical to
        # hybrid_topk's min-max weighted sum
        "hybrid_encoded_topk": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            bm AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s GROUP BY q.q_id, tf.doc_id),
            etoks AS (
              SELECT doc_id,
                     unnest(list_filter(
                       string_split_regex(lower(text), '\\s+'),
                       x -> x <> '')) AS tok
              FROM documents),
            dv AS (
              SELECT doc_id,
                     (md5_number_lower('{ENC_SEED}:' || tok)
                       % {ENC_DIM})::BIGINT AS bkt,
                     sum(CASE WHEN ((md5_number_lower('{ENC_SEED}:' || tok)
                           >> 63) & 1) = 1 THEN 1.0 ELSE -1.0 END) AS v
              FROM etoks GROUP BY 1, 2),
            dn AS (SELECT doc_id, sqrt(sum(v * v)) AS nn FROM dv GROUP BY doc_id),
            qtoks AS (
              SELECT q_id,
                     unnest(list_filter(
                       string_split_regex(lower(qtext), '\\s+'),
                       x -> x <> '')) AS tok
              FROM (VALUES {_topk_qtext_values}) AS q(q_id, qtext)),
            qv AS (
              SELECT q_id,
                     (md5_number_lower('{ENC_SEED}:' || tok)
                       % {ENC_DIM})::BIGINT AS bkt,
                     sum(CASE WHEN ((md5_number_lower('{ENC_SEED}:' || tok)
                           >> 63) & 1) = 1 THEN 1.0 ELSE -1.0 END) AS v
              FROM qtoks GROUP BY 1, 2),
            qn AS (SELECT q_id, sqrt(sum(v * v)) AS nn FROM qv GROUP BY q_id),
            dots AS (
              SELECT qv.q_id, dv.doc_id, sum(qv.v * dv.v) AS dot
              FROM qv JOIN dv ON dv.bkt = qv.bkt GROUP BY 1, 2),
            sims AS (
              SELECT q.q_id, d.doc_id,
                     coalesce(t.dot / (q.nn * dn.nn), 0.0) AS score
              FROM (SELECT doc_id FROM documents) d
              CROSS JOIN qn q
              LEFT JOIN dn ON dn.doc_id = d.doc_id
              LEFT JOIN dots t ON t.q_id = q.q_id AND t.doc_id = d.doc_id),
            bmc AS (SELECT * FROM (
              SELECT q_id, doc_id, score,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rnk
              FROM bm) WHERE rnk <= {CUTOFF}),
            dnc AS (SELECT * FROM (
              SELECT q_id, doc_id, score,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rnk
              FROM sims) WHERE rnk <= {CUTOFF}),
            bmn AS (SELECT q_id, doc_id,
              (score - min(score) OVER (PARTITION BY q_id))
              / greatest(max(score) OVER (PARTITION BY q_id)
                         - min(score) OVER (PARTITION BY q_id), 1e-9) AS ns
              FROM bmc),
            dnn AS (SELECT q_id, doc_id,
              (score - min(score) OVER (PARTITION BY q_id))
              / greatest(max(score) OVER (PARTITION BY q_id)
                         - min(score) OVER (PARTITION BY q_id), 1e-9) AS ns
              FROM dnc),
            fused AS (
              SELECT coalesce(b.q_id, d.q_id) AS q_id,
                     coalesce(b.doc_id, d.doc_id) AS doc_id,
                     coalesce({hws} * b.ns, 0) + coalesce({hwd} * d.ns, 0) AS fs
              FROM bmn b FULL OUTER JOIN dnn d
              ON b.q_id = d.q_id AND b.doc_id = d.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY fs DESC, doc_id) AS rank
              FROM fused)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "explain_top1": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            -- the engine's relative_doc_lens divides by a
            -- float32-cast avgdl (searcher.py LoadedIndex), so the
            -- value-exact quantization must mirror that cast
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) )
                  AS score
              FROM qterms q
              JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s
              GROUP BY q.q_id, tf.doc_id),
            top1 AS (
              SELECT q_id, doc_id FROM (
                SELECT q_id, doc_id,
                  row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id)
                    AS rank
                FROM scores) WHERE rank = 1)
            SELECT t1.q_id, t1.doc_id, tf.term,
                   tf.tf::BIGINT AS tf, df.df::BIGINT AS df,
                   floor(1000000
                     * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * (tf.tf * ({k1} + 1)
                        / (tf.tf + {k1} * (1 - {b} + {b}
                           * (dl.dl / (s.avgdl::FLOAT4::DOUBLE))))))::BIGINT
                     AS score_e6
            FROM top1 t1
            JOIN qterms q ON q.q_id = t1.q_id
            JOIN tf ON tf.doc_id = t1.doc_id AND tf.term = q.term
            JOIN df ON df.term = q.term
            JOIN dl ON dl.doc_id = t1.doc_id
            CROSS JOIN stats s
            ORDER BY t1.q_id, tf.term
        """,
        "regex_search": f"""
            WITH {_BASE_CTES},
            rx(q_id, pat) AS (VALUES {_regex_values})
            SELECT rx.q_id, tf.doc_id,
                   count(DISTINCT tf.term)::BIGINT AS n_terms
            FROM rx JOIN tf ON regexp_full_match(tf.term, rx.pat)
            GROUP BY rx.q_id, tf.doc_id
            ORDER BY q_id, doc_id
        """,
        # federated global stats == single-corpus semantics: the
        # oracle is literally the bm25_topk SQL
        "federated_global_topk": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q
              JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s
              GROUP BY q.q_id, tf.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
              FROM scores)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "federated_local_topk": f"""
            WITH {_QTERMS},
            d2 AS (SELECT doc_id, doc_id % 2 AS corp,
                          list_filter({_TOKS}, x -> x <> '') AS toks
                   FROM documents),
            toks AS (SELECT corp, doc_id, unnest(toks) AS term FROM d2),
            tf AS (SELECT corp, doc_id, term, count(*)::DOUBLE AS tf
                   FROM toks GROUP BY 1, 2, 3),
            df AS (SELECT corp, term, count(*)::DOUBLE AS df
                   FROM tf GROUP BY 1, 2),
            dl AS (SELECT corp, doc_id, len(toks)::DOUBLE AS dl FROM d2),
            stats AS (SELECT corp, count(*)::DOUBLE AS n,
                             sum(len(toks))::DOUBLE / count(*)::DOUBLE
                               AS avgdl
                      FROM d2 GROUP BY corp),
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q
              JOIN tf ON tf.term = q.term
              JOIN df ON df.corp = tf.corp AND df.term = q.term
              JOIN dl ON dl.corp = tf.corp AND dl.doc_id = tf.doc_id
              JOIN stats s ON s.corp = tf.corp
              GROUP BY q.q_id, tf.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
              FROM scores)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "wildcard_search": f"""
            WITH {_BASE_CTES},
            wc(q_id, pat) AS (VALUES {_wildcard_values})
            SELECT wc.q_id, tf.doc_id,
                   count(DISTINCT tf.term)::BIGINT AS n_terms
            FROM wc JOIN tf ON tf.term LIKE wc.pat ESCAPE '!'
            GROUP BY wc.q_id, tf.doc_id
            ORDER BY q_id, doc_id
        """,
        "lm_dirichlet_topk": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            cf AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tf GROUP BY term),
            tot AS (SELECT sum(dl)::DOUBLE AS total FROM dl),
            nq AS (SELECT q.q_id, count(*)::BIGINT AS nq
                   FROM qterms q JOIN df ON df.term = q.term
                   GROUP BY q.q_id),
            per_term AS (
              SELECT q.q_id, tf.doc_id,
                     floor(1000000 * ln(1 + tf.tf
                       / ({LM_MU} * (cf.cf / t.total))))::BIGINT AS c
              FROM qterms q
              JOIN tf ON tf.term = q.term
              JOIN cf ON cf.term = q.term
              CROSS JOIN tot t),
            scores AS (
              SELECT p.q_id, p.doc_id,
                     (sum(p.c)
                      + n.nq * floor(1000000
                          * ln({LM_MU} / (dl.dl + {LM_MU})))::BIGINT
                     )::BIGINT AS score_e6
              FROM per_term p
              JOIN dl ON dl.doc_id = p.doc_id
              JOIN nq n ON n.q_id = p.q_id
              GROUP BY p.q_id, p.doc_id, n.nq, dl.dl)
            SELECT q_id, rank, doc_id, score_e6 FROM (
              SELECT q_id, doc_id, score_e6,
                row_number() OVER (PARTITION BY q_id
                                   ORDER BY score_e6 DESC, doc_id) AS rank
              FROM scores)
            WHERE rank <= {CUTOFF}
            ORDER BY q_id, rank
        """,
        "search_after": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) )
                  AS score
              FROM qterms q
              JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s
              GROUP BY q.q_id, tf.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id)
                  AS rank
              FROM scores)
            WHERE rank BETWEEN {CUTOFF} + 1 AND 2 * {CUTOFF}
            ORDER BY q_id, rank
        """,
        "more_like_this": f"""
            WITH {_BASE_CTES},
            src(q_id, src_id) AS (VALUES {_mlt_values}),
            kw AS (
              SELECT s.q_id, s.src_id, tf.term,
                     floor(10000 * tf.tf * ln(st.n / df.df))::BIGINT AS w
              FROM src s JOIN tf ON tf.doc_id = s.src_id
              JOIN df ON df.term = tf.term CROSS JOIN stats st),
            topterms AS (SELECT q_id, src_id, term FROM (
              SELECT q_id, src_id, term,
                row_number() OVER (PARTITION BY q_id ORDER BY w DESC, term)
                  AS rn
              FROM kw) WHERE rn <= {MLT_TERMS}),
            scores AS (
              SELECT t.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) )
                  AS score
              FROM topterms t
              JOIN tf ON tf.term = t.term AND tf.doc_id <> t.src_id
              JOIN df ON df.term = t.term
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s
              GROUP BY t.q_id, tf.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id)
                  AS rank
              FROM scores)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "facet_counts": f"""
            WITH {_BASE_CTES},
            fcq AS (SELECT q_id, unnest(string_split(qtext, ' ')) AS term
                    FROM (VALUES {_facet_values}) AS q(q_id, qtext)),
            matching AS (
              SELECT DISTINCT q.q_id, tf.doc_id
              FROM fcq q JOIN tf ON tf.term = q.term)
            SELECT q_id, field, value, n_docs FROM ({_facet_arms})
            ORDER BY q_id, field, value
        """,
        # ES top_hits: per (query, lang bucket) top-3 by BM25; rank
        # only (float64 both sides, ties -> doc_id asc)
        "top_hits": f"""
            WITH {_BASE_CTES},
            fcq AS (SELECT q_id, unnest(string_split(qtext, ' ')) AS term
                    FROM (VALUES {_facet_values}) AS q(q_id, qtext)),
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) )
                  AS score
              FROM fcq q
              JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s
              GROUP BY q.q_id, tf.doc_id)
            SELECT q_id, lang, rank, doc_id FROM (
              SELECT sc.q_id, d.lang::VARCHAR AS lang, sc.doc_id,
                row_number() OVER (PARTITION BY sc.q_id, d.lang
                                   ORDER BY sc.score DESC, sc.doc_id) AS rank
              FROM scores sc JOIN documents d ON d.doc_id = sc.doc_id)
            WHERE rank <= 3 ORDER BY q_id, lang, rank
        """,
        "autocomplete": f"""
            WITH {_BASE_CTES},
            pq(q_id, pre) AS (VALUES {_prefix_pairs})
            SELECT q_id, term, df FROM (
              SELECT pq.q_id, df.term, df.df::BIGINT AS df,
                row_number() OVER (PARTITION BY pq.q_id
                                   ORDER BY df.df DESC, df.term) AS rn
              FROM pq JOIN df ON df.term LIKE pq.pre || '%')
            WHERE rn <= 5 ORDER BY q_id, term
        """,
        "spell_suggest": f"""
            WITH {_BASE_CTES},
            sq(q_id, qterm) AS (VALUES {_suggest_values}),
            cand AS (
              SELECT sq.q_id, df.term,
                     levenshtein(df.term, sq.qterm)::BIGINT AS dist,
                     df.df::BIGINT AS df
              FROM sq JOIN df
                ON levenshtein(df.term, sq.qterm) <= {SUGGEST_MAX_DIST})
            SELECT q_id, term AS suggestion, dist, df FROM (
              SELECT *, row_number() OVER (
                PARTITION BY q_id ORDER BY dist, df DESC, term) AS rn
              FROM cand)
            WHERE rn = 1 ORDER BY q_id
        """,
        "snippets": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q
              JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s
              GROUP BY q.q_id, tf.doc_id),
            ranked AS (
              SELECT q_id, doc_id, rank FROM (
                SELECT q_id, doc_id,
                  row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
                FROM scores)
              WHERE rank <= {CUTOFF}),
            firstpos AS (
              SELECT r.q_id, r.rank, r.doc_id,
                (SELECT min(list_position(d.toks, q.term)) FROM qterms q
                 WHERE q.q_id = r.q_id) AS p
              FROM ranked r JOIN docs d ON d.doc_id = r.doc_id)
            SELECT f.q_id, f.rank, f.doc_id,
              array_to_string(array_slice(d.toks, greatest(f.p - 2, 1), f.p + 2), ' ') AS snippet
            FROM firstpos f JOIN docs d ON d.doc_id = f.doc_id
            ORDER BY q_id, rank
        """,
        "phrase_search": f"""
            WITH {_BASE_CTES},
            pos AS (SELECT doc_id, unnest(toks) AS term,
                           unnest(range(len(toks))) AS pos FROM docs),
            p1 AS (
              SELECT 'p1' AS q_id, a.doc_id, count(*)::BIGINT AS n_occ
              FROM pos a JOIN pos b
                ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = 'scan'
              WHERE a.term = 'table' GROUP BY a.doc_id),
            p2 AS (
              SELECT 'p2' AS q_id, a.doc_id, count(*)::BIGINT AS n_occ
              FROM pos a JOIN pos b
                ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = 'batch'
              WHERE a.term = 'batch' GROUP BY a.doc_id),
            p3 AS (
              SELECT 'p3' AS q_id, a.doc_id, count(*)::BIGINT AS n_occ
              FROM pos a JOIN pos b
                ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = 'data'
              WHERE a.term = 'big' GROUP BY a.doc_id),
            p4 AS (
              SELECT 'p4' AS q_id, a.doc_id, count(*)::BIGINT AS n_occ
              FROM pos a
              JOIN pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = 'order'
              JOIN pos c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2 AND c.term = 'sort'
              WHERE a.term = 'key' GROUP BY a.doc_id)
            SELECT q_id, doc_id, n_occ FROM (
              SELECT * FROM p1 UNION ALL SELECT * FROM p2
              UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4)
            ORDER BY q_id, doc_id
        """,
        "phrase_bm25_topk": f"""
            WITH {_BASE_CTES},
            pos AS (SELECT doc_id, unnest(toks) AS term,
                           unnest(range(len(toks))) AS pos FROM docs),
            p1 AS (
              SELECT 'p1' AS q_id, a.doc_id, count(*)::BIGINT AS n_occ
              FROM pos a JOIN pos b
                ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = 'scan'
              WHERE a.term = 'table' GROUP BY a.doc_id),
            p2 AS (
              SELECT 'p2' AS q_id, a.doc_id, count(*)::BIGINT AS n_occ
              FROM pos a JOIN pos b
                ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = 'batch'
              WHERE a.term = 'batch' GROUP BY a.doc_id),
            p3 AS (
              SELECT 'p3' AS q_id, a.doc_id, count(*)::BIGINT AS n_occ
              FROM pos a JOIN pos b
                ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = 'data'
              WHERE a.term = 'big' GROUP BY a.doc_id),
            p4 AS (
              SELECT 'p4' AS q_id, a.doc_id, count(*)::BIGINT AS n_occ
              FROM pos a
              JOIN pos b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = 'order'
              JOIN pos c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2 AND c.term = 'sort'
              WHERE a.term = 'key' GROUP BY a.doc_id),
            matches AS (
              SELECT * FROM p1 UNION ALL SELECT * FROM p2
              UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4),
            pdf AS (SELECT q_id, count(*)::DOUBLE AS df FROM matches GROUP BY q_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT m.q_id, m.doc_id,
                row_number() OVER (PARTITION BY m.q_id ORDER BY
                  ln(1 + (s.n - p.df + 0.5) / (p.df + 0.5))
                  * m.n_occ * ({k1} + 1)
                  / (m.n_occ + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) DESC,
                  m.doc_id) AS rank
              FROM matches m
              JOIN pdf p ON p.q_id = m.q_id
              JOIN dl ON dl.doc_id = m.doc_id
              CROSS JOIN stats s)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "proximity_search": f"""
            WITH {_BASE_CTES},
            pos AS (SELECT doc_id, unnest(toks) AS term,
                           unnest(range(len(toks))) AS pos FROM docs),
            x1 AS (
              SELECT 'x1' AS q_id, a.doc_id, count(*)::BIGINT AS n_pairs
              FROM pos a JOIN pos b
                ON b.doc_id = a.doc_id AND b.term = 'join'
               AND b.pos BETWEEN a.pos - 3 AND a.pos + 3
              WHERE a.term = 'hash' GROUP BY a.doc_id),
            x2 AS (
              SELECT 'x2' AS q_id, a.doc_id, count(*)::BIGINT AS n_pairs
              FROM pos a JOIN pos b
                ON b.doc_id = a.doc_id AND b.term = 'stream'
               AND b.pos BETWEEN a.pos - 2 AND a.pos + 2
              WHERE a.term = 'window' GROUP BY a.doc_id),
            x3 AS (
              SELECT 'x3' AS q_id, a.doc_id, count(*)::BIGINT AS n_pairs
              FROM pos a JOIN pos b
                ON b.doc_id = a.doc_id AND b.term = 'data'
               AND b.pos BETWEEN a.pos - 4 AND a.pos + 4 AND b.pos <> a.pos
              WHERE a.term = 'data' GROUP BY a.doc_id)
            SELECT q_id, doc_id, n_pairs FROM (
              SELECT * FROM x1 UNION ALL SELECT * FROM x2 UNION ALL SELECT * FROM x3)
            ORDER BY q_id, doc_id
        """,
        # two-phase rescore: BM25 top-FIRST_N candidate window, then
        # fscore = bm25 + boost * ln(1 + proximity pair count); ranks
        # only (float64 both sides, ties -> doc_id asc)
        "rescore_topk": f"""
            WITH {_BASE_CTES},
            rq(q_id, qtext, ta, tb, w) AS (VALUES {_RESCORE_VALUES}),
            rqt AS (SELECT q_id, unnest(string_split(qtext, ' ')) AS term
                    FROM rq),
            bm25 AS (
              SELECT qt.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) )
                  AS score
              FROM rqt qt
              JOIN tf ON tf.term = qt.term
              JOIN df ON df.term = qt.term
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s
              GROUP BY qt.q_id, tf.doc_id),
            cand AS (SELECT q_id, doc_id, score FROM (
              SELECT q_id, doc_id, score,
                row_number() OVER (PARTITION BY q_id
                                   ORDER BY score DESC, doc_id) AS rn
              FROM bm25) WHERE rn <= {RESCORE_FIRST_N}),
            pos AS (SELECT doc_id, unnest(toks) AS term,
                           unnest(range(len(toks))) AS pos FROM docs),
            prox AS (
              SELECT rq.q_id, a.doc_id, count(*)::BIGINT AS n_pairs
              FROM rq
              JOIN pos a ON a.term = rq.ta
              JOIN pos b ON b.doc_id = a.doc_id AND b.term = rq.tb
               AND b.pos BETWEEN a.pos - rq.w AND a.pos + rq.w
              GROUP BY rq.q_id, a.doc_id),
            final AS (
              SELECT c.q_id, c.doc_id,
                c.score + {RESCORE_BOOST}
                          * ln(1 + coalesce(p.n_pairs, 0)) AS fscore
              FROM cand c
              LEFT JOIN prox p ON p.q_id = c.q_id AND p.doc_id = c.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id
                                   ORDER BY fscore DESC, doc_id) AS rank
              FROM final)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "boolean_search": f"""
            WITH {_BASE_CTES},
            b1 AS (
              SELECT 'b1' AS q_id, d.doc_id, 0::BIGINT AS n_should
              FROM documents d
              WHERE EXISTS (SELECT 1 FROM tf WHERE doc_id = d.doc_id AND term = 'table')
                AND EXISTS (SELECT 1 FROM tf WHERE doc_id = d.doc_id AND term = 'scan')
                AND NOT EXISTS (SELECT 1 FROM tf WHERE doc_id = d.doc_id AND term = 'spark')),
            b2 AS (
              SELECT 'b2' AS q_id, d.doc_id,
                (SELECT count(DISTINCT term) FROM tf
                 WHERE doc_id = d.doc_id AND term IN ('window','stream'))::BIGINT AS n_should
              FROM documents d
              WHERE EXISTS (SELECT 1 FROM tf
                            WHERE doc_id = d.doc_id AND term IN ('window','stream'))
                AND NOT EXISTS (SELECT 1 FROM tf WHERE doc_id = d.doc_id AND term = 'customer')),
            b3 AS (
              SELECT 'b3' AS q_id, d.doc_id,
                (SELECT count(DISTINCT term) FROM tf
                 WHERE doc_id = d.doc_id AND term IN ('merge','filter','join'))::BIGINT AS n_should
              FROM documents d
              WHERE EXISTS (SELECT 1 FROM tf WHERE doc_id = d.doc_id AND term = 'hash'))
            SELECT q_id, doc_id, n_should
            FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2 UNION ALL SELECT * FROM b3)
            ORDER BY q_id, doc_id
        """,
        "boolean_msm": f"""
            WITH {_BASE_CTES},
            m1 AS (
              SELECT 'm1' AS q_id, d.doc_id,
                (SELECT count(DISTINCT term) FROM tf
                 WHERE doc_id = d.doc_id AND term IN ('merge','filter','join'))::BIGINT AS n_should
              FROM documents d
              WHERE (SELECT count(DISTINCT term) FROM tf
                     WHERE doc_id = d.doc_id AND term IN ('merge','filter','join')) >= 2),
            m2 AS (
              SELECT 'm2' AS q_id, d.doc_id,
                (SELECT count(DISTINCT term) FROM tf
                 WHERE doc_id = d.doc_id AND term IN ('merge','filter','join'))::BIGINT AS n_should
              FROM documents d
              WHERE EXISTS (SELECT 1 FROM tf WHERE doc_id = d.doc_id AND term = 'hash')
                AND (SELECT count(DISTINCT term) FROM tf
                     WHERE doc_id = d.doc_id AND term IN ('merge','filter','join')) >= 1),
            m3 AS (
              SELECT 'm3' AS q_id, d.doc_id,
                (SELECT count(DISTINCT term) FROM tf
                 WHERE doc_id = d.doc_id AND term IN ('window','stream'))::BIGINT AS n_should
              FROM documents d
              WHERE (SELECT count(DISTINCT term) FROM tf
                     WHERE doc_id = d.doc_id AND term IN ('window','stream')) >= 2
                AND NOT EXISTS (SELECT 1 FROM tf WHERE doc_id = d.doc_id AND term = 'customer'))
            SELECT q_id, doc_id, n_should
            FROM (SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3)
            ORDER BY q_id, doc_id
        """,
        "facet_stats": f"""
            WITH {_BASE_CTES},
            fcq AS (SELECT q_id, unnest(string_split(qtext, ' ')) AS term
                    FROM (VALUES {_facet_values}) AS q(q_id, qtext)),
            matching AS (
              SELECT DISTINCT q.q_id, tf.doc_id
              FROM fcq q JOIN tf ON tf.term = q.term)
            SELECT m.q_id, d.lang AS value, count(*)::BIGINT AS n_docs,
                   sum(d.n_chars)::BIGINT AS sum_v,
                   min(d.n_chars)::BIGINT AS min_v,
                   max(d.n_chars)::BIGINT AS max_v
            FROM matching m JOIN documents d ON d.doc_id = m.doc_id
            GROUP BY m.q_id, d.lang ORDER BY q_id, value
        """,
        "percolate": f"""
            WITH {_BASE_CTES}
            SELECT doc_id, q_id FROM (
              SELECT d.doc_id, 'p1' AS q_id FROM docs d
              WHERE list_contains(d.toks, 'table')
                AND list_contains(d.toks, 'scan')
              UNION ALL
              SELECT d.doc_id, 'p2' FROM docs d
              WHERE (list_contains(d.toks, 'window')
                     OR list_contains(d.toks, 'stream'))
                AND NOT list_contains(d.toks, 'customer')
              UNION ALL
              SELECT d.doc_id, 'p3' FROM docs d
              WHERE list_contains(d.toks, 'hash'))
            ORDER BY doc_id, q_id
        """,
        # line_dedup: lines = 5-token spans; the globally first
        # (doc_id, line_idx) occurrence of each distinct line survives,
        # docs rebuild from surviving lines, empty docs drop (GROUP BY)
        "line_dedup": f"""
            WITH {_BASE_CTES},
            pos AS (SELECT doc_id, unnest(toks) AS term,
                           unnest(range(len(toks))) AS pos FROM docs),
            lines AS (SELECT doc_id, pos // 5 AS line_idx,
                             string_agg(term, ' ' ORDER BY pos) AS line
                      FROM pos GROUP BY doc_id, pos // 5),
            keep AS (SELECT doc_id, line_idx, line,
                       row_number() OVER (PARTITION BY line
                                          ORDER BY doc_id, line_idx) AS rn
                     FROM lines)
            SELECT doc_id, string_agg(line, chr(10) ORDER BY line_idx) AS text
            FROM keep WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id
        """,
        # query_string semantics: per query, a candidate CTE mirrors the
        # boolean structure (phrase via consecutive positions, prefix /
        # fuzzy via vocabulary predicates, fields via the documents
        # columns) and the score sums BM25 over the positive scoring
        # terms restricted to the candidates (strict-positive top-k).
        "query_string": f"""
            WITH {_BASE_CTES},
            pos AS (SELECT doc_id, unnest(toks) AS term,
                           unnest(range(len(toks))) AS pos FROM docs),
            c1 AS (SELECT doc_id FROM docs
                   WHERE list_contains(toks, 'table')
                     AND (list_contains(toks, 'scan') OR list_contains(toks, 'join'))
                     AND NOT list_contains(toks, 'spark')),
            c2 AS (SELECT d.doc_id FROM docs d
                   WHERE list_contains(d.toks, 'window')
                     AND EXISTS (SELECT 1 FROM pos a JOIN pos b
                                 ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                                    AND b.term = 'data'
                                 WHERE a.term = 'big' AND a.doc_id = d.doc_id)),
            c3 AS (SELECT d.doc_id FROM docs d
                   WHERE EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id
                                 AND tf.term LIKE 'qu%')
                     AND EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = d.doc_id
                                 AND levenshtein(tf.term, 'tabel') <= 1)),
            c4 AS (SELECT doc_id FROM docs
                   WHERE list_contains(toks, 'customer')
                      OR (list_contains(toks, 'merge')
                          AND NOT list_contains(toks, 'hash'))),
            c5 AS (SELECT dd.doc_id FROM docs dd
                   JOIN documents d ON d.doc_id = dd.doc_id
                   WHERE d.n_chars BETWEEN 200 AND 600
                     AND list_contains(dd.toks, 'merge')
                     AND list_contains(dd.toks, 'filter')),
            c6 AS (SELECT doc_id FROM docs
                   WHERE list_contains(toks, 'scan')
                      OR list_contains(toks, 'join')),
            c7 AS (SELECT doc_id FROM docs
                   WHERE (list_contains(toks, 'vector')
                          OR list_contains(toks, 'row')
                          OR list_contains(toks, 'column'))
                     AND list_contains(toks, 'fast')),
            s1 AS (SELECT 'qs1' AS q_id, tf.doc_id,
                     sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                          * tf.tf * ({k1} + 1)
                          / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
                   FROM tf JOIN df ON df.term = tf.term
                   JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
                   WHERE tf.doc_id IN (SELECT doc_id FROM c1)
                     AND tf.term IN ('table', 'scan', 'join')
                   GROUP BY tf.doc_id),
            s2 AS (SELECT 'qs2' AS q_id, tf.doc_id,
                     sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                          * tf.tf * ({k1} + 1)
                          / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
                   FROM tf JOIN df ON df.term = tf.term
                   JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
                   WHERE tf.doc_id IN (SELECT doc_id FROM c2)
                     AND tf.term IN ('big', 'data', 'window')
                   GROUP BY tf.doc_id),
            s3 AS (SELECT 'qs3' AS q_id, tf.doc_id,
                     sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                          * tf.tf * ({k1} + 1)
                          / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
                   FROM tf JOIN df ON df.term = tf.term
                   JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
                   WHERE tf.doc_id IN (SELECT doc_id FROM c3)
                     AND (tf.term LIKE 'qu%' OR levenshtein(tf.term, 'tabel') <= 1)
                   GROUP BY tf.doc_id),
            s4 AS (SELECT 'qs4' AS q_id, tf.doc_id,
                     sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                          * tf.tf * ({k1} + 1)
                          / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
                   FROM tf JOIN df ON df.term = tf.term
                   JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
                   WHERE tf.doc_id IN (SELECT doc_id FROM c4)
                     AND tf.term IN ('customer', 'merge')
                   GROUP BY tf.doc_id),
            s5 AS (SELECT 'qs5' AS q_id, tf.doc_id,
                     sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                          * tf.tf * ({k1} + 1)
                          / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
                   FROM tf JOIN df ON df.term = tf.term
                   JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
                   WHERE tf.doc_id IN (SELECT doc_id FROM c5)
                     AND tf.term IN ('merge', 'filter')
                   GROUP BY tf.doc_id),
            s6 AS (SELECT 'qs6' AS q_id, tf.doc_id,
                     sum( (CASE tf.term WHEN 'scan' THEN 3.0 ELSE 0.5 END)
                          * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                          * tf.tf * ({k1} + 1)
                          / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
                   FROM tf JOIN df ON df.term = tf.term
                   JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
                   WHERE tf.doc_id IN (SELECT doc_id FROM c6)
                     AND tf.term IN ('scan', 'join')
                   GROUP BY tf.doc_id),
            s7 AS (SELECT 'qs7' AS q_id, tf.doc_id,
                     sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                          * tf.tf * ({k1} + 1)
                          / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
                   FROM tf JOIN df ON df.term = tf.term
                   JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
                   WHERE tf.doc_id IN (SELECT doc_id FROM c7)
                     AND tf.term IN ('vector', 'row', 'column', 'fast')
                   GROUP BY tf.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
              FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
                    UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
                    UNION ALL SELECT * FROM s5 UNION ALL SELECT * FROM s6
                    UNION ALL SELECT * FROM s7))
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "vocabulary": f"""
            WITH {_BASE_CTES}
            SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
            FROM tf GROUP BY term ORDER BY term
        """,
        "doc_lens": f"""
            WITH {_BASE_CTES}
            SELECT doc_id, dl::BIGINT AS doc_len FROM dl ORDER BY doc_id
        """,
        "postings": f"""
            WITH {_BASE_CTES}
            SELECT term, doc_id, tf::BIGINT AS tf FROM tf
            WHERE term IN ('table','scan','window','dup','customer')
            ORDER BY term, doc_id
        """,
        "bm25_topk": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q
              JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s
              GROUP BY q.q_id, tf.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
              FROM scores)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        # rank_eval: exact-integer MRR / nDCG@k / recall@k of the bm25
        # run vs qrels (rel = distinct query terms present, >= 2);
        # per-hit DCG terms are floor(1e9 * (2^rel-1)/log2(rank+1))
        # integers so the sums are order-free in BOTH engines
        "rank_eval": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q
              JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s
              GROUP BY q.q_id, tf.doc_id),
            run AS (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id)
                  AS rank
              FROM scores),
            qrels AS (
              SELECT q.q_id, tf.doc_id, count(DISTINCT tf.term)::BIGINT AS rel
              FROM qterms q JOIN tf ON tf.term = q.term
              GROUP BY q.q_id, tf.doc_id
              HAVING count(DISTINCT tf.term) >= 2),
            joined AS (
              SELECT r.q_id, r.rank, coalesce(qr.rel, 0) AS rel
              FROM run r
              LEFT JOIN qrels qr ON qr.q_id = r.q_id AND qr.doc_id = r.doc_id
              WHERE r.rank <= {CUTOFF}),
            hits AS (
              SELECT q_id, min(rank) AS fr, count(*)::BIGINT AS nhit,
                sum(floor(1000000000 * (pow(2, rel) - 1)
                          / log2(rank + 1)))::BIGINT AS dcg
              FROM joined WHERE rel > 0 GROUP BY q_id),
            nrel AS (SELECT q_id, count(*)::BIGINT AS n_rel FROM qrels GROUP BY q_id),
            ideal AS (
              SELECT q_id,
                sum(floor(1000000000 * (pow(2, rel) - 1)
                          / log2(pos + 1)))::BIGINT AS idcg
              FROM (SELECT q_id, rel,
                      row_number() OVER (PARTITION BY q_id ORDER BY rel DESC)
                        AS pos
                    FROM qrels)
              WHERE pos <= {CUTOFF} GROUP BY q_id)
            SELECT n.q_id,
              coalesce(1000000 // h.fr, 0)::BIGINT AS rr_e6,
              (CASE WHEN coalesce(i.idcg, 0) > 0
                    THEN (coalesce(h.dcg, 0) * 1000000) // i.idcg
                    ELSE 0 END)::BIGINT AS ndcg_e6,
              ((coalesce(h.nhit, 0) * 1000000) // n.n_rel)::BIGINT AS recall_e6,
              n.n_rel
            FROM nrel n
            LEFT JOIN hits h ON h.q_id = n.q_id
            LEFT JOIN ideal i ON i.q_id = n.q_id
            ORDER BY n.q_id
        """,
        # hard_negatives: the bm25 ranking's rows 2..CUTOFF+1 (top-1 is
        # the designated positive), rank renumbered down by one
        "hard_negatives": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
              FROM qterms q
              JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s
              GROUP BY q.q_id, tf.doc_id)
            SELECT q_id, (rank - 1)::BIGINT AS rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
              FROM scores)
            WHERE rank BETWEEN 2 AND {CUTOFF} + 1 ORDER BY q_id, rank
        """,
        "tfidf_topk": f"""
            WITH {_BASE_CTES}, {_QTERMS},
            scores AS (
              SELECT q.q_id, tf.doc_id,
                sum( (tf.tf / dl.dl) * (ln((1 + s.n) / (1 + df.df)) + 1) ) AS score
              FROM qterms q
              JOIN tf ON tf.term = q.term
              JOIN df ON df.term = q.term
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats s
              GROUP BY q.q_id, tf.doc_id)
            SELECT q_id, rank, doc_id FROM (
              SELECT q_id, doc_id,
                row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
              FROM scores)
            WHERE rank <= {CUTOFF} ORDER BY q_id, rank
        """,
        "dedup_exact": """
            SELECT min(doc_id)::BIGINT AS doc_id FROM documents GROUP BY text
        """,
        "ngram_jaccard_pairs": _NGRAM_JACCARD_SQL,
        # minhash_lsh_pairs verifies candidates with EXACT jaccard, and
        # LSH recall is 1.0 on this corpus (checked against the exact
        # operator), so its output equals ngram_jaccard_pairs.
        "minhash_lsh_pairs": _NGRAM_JACCARD_SQL,
        "simhash": f"""
            WITH docs AS (SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks FROM documents),
            tok AS (SELECT doc_id, unnest(toks) AS w FROM docs),
            bits AS (
              SELECT doc_id, bb.b,
                     sum(CASE WHEN (md5_number_lower(w) >> bb.b) & 1 = 1
                         THEN 1 ELSE -1 END) AS vote
              FROM tok, (SELECT unnest(generate_series(0,63)) AS b) bb
              GROUP BY doc_id, bb.b),
            fp AS (
              SELECT doc_id,
                     sum(CASE WHEN vote >= 0 THEN (1::HUGEINT << b)
                         ELSE 0::HUGEINT END) AS ufp
              FROM bits GROUP BY doc_id)
            SELECT d.doc_id,
              (CASE WHEN coalesce(f.ufp,0) >= 9223372036854775808::HUGEINT
                    THEN coalesce(f.ufp,0) - 18446744073709551616::HUGEINT
                    ELSE coalesce(f.ufp,0) END)::BIGINT AS simhash,
              ((coalesce(f.ufp,0) >> 0) & 65535)::BIGINT AS band0,
              ((coalesce(f.ufp,0) >> 16) & 65535)::BIGINT AS band1,
              ((coalesce(f.ufp,0) >> 32) & 65535)::BIGINT AS band2,
              ((coalesce(f.ufp,0) >> 48) & 65535)::BIGINT AS band3
            FROM docs d LEFT JOIN fp f ON f.doc_id = d.doc_id ORDER BY d.doc_id
        """,
        "doc_fingerprint": f"""
            WITH docs AS (SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks FROM documents),
            tok AS (SELECT doc_id, len(toks) AS L, u.i,
                           (md5_number_lower(toks[u.i]) % {_WINNOW_P}) AS v
                    FROM docs, unnest(generate_series(1, len(toks))) u(i)),
            pw(off, p8) AS (VALUES {_WINNOW_PW_VALUES}),
            wh AS (SELECT a.doc_id, a.i,
                     (sum((b.v::HUGEINT * pw.p8::HUGEINT) % {_WINNOW_P}) % {_WINNOW_P}) AS h
                   FROM tok a JOIN tok b ON b.doc_id = a.doc_id
                                        AND b.i BETWEEN a.i AND a.i + 7
                   JOIN pw ON pw.off = b.i - a.i
                   WHERE a.i + 7 <= a.L
                   GROUP BY a.doc_id, a.i),
            agg AS (SELECT doc_id, min(h) AS fp, count(*) AS ng FROM wh GROUP BY doc_id)
            SELECT d.doc_id, coalesce(agg.fp, 0)::BIGINT AS fingerprint,
                   coalesce(agg.ng, 0)::BIGINT AS n_grams
            FROM docs d LEFT JOIN agg ON agg.doc_id = d.doc_id ORDER BY d.doc_id
        """,
        "bigram_lm": f"""
            WITH {_BASE_CTES},
            pos AS (SELECT doc_id, unnest(toks) AS term,
                           unnest(range(len(toks))) AS pos FROM docs),
            bg AS (SELECT a.doc_id, a.term AS w1, b.term AS w2
                   FROM pos a JOIN pos b
                     ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
            c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12
                    FROM bg GROUP BY w1, w2),
            c1 AS (SELECT w1, sum(c12)::BIGINT AS c1x FROM c12 GROUP BY w1),
            per AS (SELECT g.doc_id,
                      floor(1e4 * ln(c.c12::DOUBLE / c1.c1x::DOUBLE))::BIGINT AS lp
                    FROM bg g
                    JOIN c12 c ON c.w1 = g.w1 AND c.w2 = g.w2
                    JOIN c1 ON c1.w1 = g.w1)
            SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                   sum(lp)::BIGINT AS sum_logp_e4
            FROM per GROUP BY doc_id ORDER BY doc_id
        """,
        # conversation ops share the synthesized transcript shape:
        # turns = 5-token spans, role = md5(line) % 3 < 2 -> user
        "sft_spans": f"""
            WITH {_BASE_CTES},
            pos AS (SELECT doc_id, unnest(toks) AS term,
                           unnest(range(len(toks))) AS pos FROM docs),
            lines AS (SELECT doc_id AS conv_id, pos // 5 AS turn_idx,
                             string_agg(term, ' ' ORDER BY pos) AS text
                      FROM pos GROUP BY doc_id, pos // 5),
            turns AS (SELECT conv_id, turn_idx,
                             CASE WHEN md5_number_lower(text) % 3 < 2
                                  THEN 'user' ELSE 'assistant' END AS role,
                             text
                      FROM lines),
            sp AS (SELECT conv_id, turn_idx, role,
                     len(string_split(text, ' '))::BIGINT AS n_tokens,
                     coalesce(sum(len(string_split(text, ' ')))
                       OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0)::BIGINT
                       AS tok_start
                   FROM turns)
            SELECT conv_id, turn_idx::BIGINT AS turn_idx, role, n_tokens,
                   tok_start, (tok_start + n_tokens)::BIGINT AS tok_end,
                   (role = 'assistant')::BIGINT AS learn
            FROM sp ORDER BY conv_id, turn_idx
        """,
        "response_pairs": f"""
            WITH {_BASE_CTES},
            pos AS (SELECT doc_id, unnest(toks) AS term,
                           unnest(range(len(toks))) AS pos FROM docs),
            lines AS (SELECT doc_id AS conv_id, pos // 5 AS turn_idx,
                             string_agg(term, ' ' ORDER BY pos) AS text
                      FROM pos GROUP BY doc_id, pos // 5),
            turns AS (SELECT conv_id, turn_idx,
                             CASE WHEN md5_number_lower(text) % 3 < 2
                                  THEN 'user' ELSE 'assistant' END AS role,
                             text
                      FROM lines),
            lu AS (SELECT conv_id, turn_idx, role, text,
                     max(CASE WHEN role = 'user' THEN turn_idx END)
                       OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS user_turn_idx
                   FROM turns)
            SELECT a.conv_id, a.user_turn_idx::BIGINT AS user_turn_idx,
                   a.turn_idx::BIGINT AS assistant_turn_idx,
                   u.text AS user_text, a.text AS assistant_text
            FROM lu a JOIN turns u ON u.conv_id = a.conv_id
                                  AND u.turn_idx = a.user_turn_idx
            WHERE a.role = 'assistant' AND a.user_turn_idx IS NOT NULL
            ORDER BY a.conv_id, assistant_turn_idx
        """,
        # dialog quality gate: same deterministic turn derivation,
        # integer counts only, filter thresholds inline
        "conversation_filter": f"""
            WITH {_BASE_CTES},
            pos AS (SELECT doc_id, unnest(toks) AS term,
                           unnest(range(len(toks))) AS pos FROM docs),
            lines AS (SELECT doc_id AS conv_id, pos // 5 AS turn_idx,
                             string_agg(term, ' ' ORDER BY pos) AS text
                      FROM pos GROUP BY doc_id, pos // 5),
            turns AS (SELECT conv_id, turn_idx,
                             CASE WHEN md5_number_lower(text) % 3 < 2
                                  THEN 'user' ELSE 'assistant' END AS role,
                             text
                      FROM lines),
            cstats AS (
              SELECT conv_id,
                count(*)::BIGINT AS n_turns,
                sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT
                  AS n_user_turns,
                sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT
                  AS n_assistant_turns,
                sum(len(string_split(text, ' ')))::BIGINT AS total_tokens
              FROM turns GROUP BY conv_id)
            SELECT conv_id, n_turns, n_user_turns, n_assistant_turns,
                   total_tokens
            FROM cstats
            WHERE n_turns BETWEEN 4 AND 50 AND total_tokens >= 25
              AND n_user_turns > 0 AND n_assistant_turns > 0
            ORDER BY conv_id
        """,
        "conversation_windows": f"""
            WITH {_BASE_CTES},
            pos AS (SELECT doc_id, unnest(toks) AS term,
                           unnest(range(len(toks))) AS pos FROM docs),
            lines AS (SELECT doc_id AS conv_id, pos // 5 AS turn_idx,
                             string_agg(term, ' ' ORDER BY pos) AS text
                      FROM pos GROUP BY doc_id, pos // 5),
            cnt AS (SELECT conv_id, count(*) AS L FROM lines GROUP BY conv_id),
            win AS (SELECT c.conv_id, u.k AS window_idx, 2 * u.k AS s
                    FROM cnt c, unnest(generate_series(0, (c.L - 3) // 2)) u(k)
                    WHERE c.L >= 3),
            agg AS (SELECT w.conv_id, w.window_idx::BIGINT AS window_idx,
                           w.s::BIGINT AS start_turn_idx, 3::BIGINT AS n_in_window,
                           string_agg(t.text, chr(10) ORDER BY t.turn_idx) AS text
                    FROM win w JOIN lines t ON t.conv_id = w.conv_id
                                           AND t.turn_idx BETWEEN w.s AND w.s + 2
                    GROUP BY w.conv_id, w.window_idx, w.s),
            short AS (SELECT c.conv_id, 0::BIGINT AS window_idx,
                             0::BIGINT AS start_turn_idx, c.L::BIGINT AS n_in_window,
                             (SELECT string_agg(t.text, chr(10) ORDER BY t.turn_idx)
                              FROM lines t WHERE t.conv_id = c.conv_id) AS text
                      FROM cnt c WHERE c.L < 3)
            SELECT * FROM (SELECT * FROM agg UNION ALL SELECT * FROM short)
            ORDER BY conv_id, window_idx
        """,
        # substring_dedup: window hashes exactly as doc_fingerprint's
        # wh CTE; the first (doc_id, i) occurrence of each hash keeps,
        # later occurrences cut tokens [i, i+8) from their doc
        "substring_dedup": f"""
            WITH docs AS (SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks FROM documents),
            tok AS (SELECT doc_id, len(toks) AS L, u.i,
                           (md5_number_lower(toks[u.i]) % {_WINNOW_P}) AS v,
                           toks[u.i] AS t
                    FROM docs, unnest(generate_series(1, len(toks))) u(i)),
            pw(off, p8) AS (VALUES {_WINNOW_PW_VALUES}),
            wh AS (SELECT a.doc_id, a.i,
                     (sum((b.v::HUGEINT * pw.p8::HUGEINT) % {_WINNOW_P}) % {_WINNOW_P}) AS h
                   FROM tok a JOIN tok b ON b.doc_id = a.doc_id
                                        AND b.i BETWEEN a.i AND a.i + 7
                   JOIN pw ON pw.off = b.i - a.i
                   WHERE a.i + 7 <= a.L
                   GROUP BY a.doc_id, a.i),
            ranked AS (SELECT doc_id, i,
                         row_number() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn
                       FROM wh),
            rem AS (SELECT doc_id, i FROM ranked WHERE rn > 1),
            kept AS (SELECT k.doc_id, k.i, k.t FROM tok k
                     WHERE NOT EXISTS (SELECT 1 FROM rem r
                                       WHERE r.doc_id = k.doc_id
                                         AND k.i BETWEEN r.i AND r.i + 7))
            SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS text
            FROM kept GROUP BY doc_id ORDER BY doc_id
        """,
        "mmr_rerank": __import__(
            "retriv_ray.ops.ann", fromlist=["mmr_rerank_sql"]
        ).mmr_rerank_sql("embeddings", [0, 1, 2, 3, 4], k=8, pool=20, lam=0.5),
        "ann_cosine_topk": _ANN_TOPK_SQL,
        # knn with filter (pre-filter): exact top-k among even labels
        "ann_filtered_topk": """
    WITH q AS (
      SELECT vec_id AS q_vec_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id IN (0,1,2,3,4)),
    sims AS (
      SELECT q.q_vec_id, e.vec_id,
             list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS sim
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.q_vec_id AND e.label % 2 = 0)
    SELECT q_vec_id, rank, vec_id FROM (
      SELECT q_vec_id, vec_id,
        row_number() OVER (PARTITION BY q_vec_id ORDER BY sim DESC, vec_id) AS rank
      FROM sims)
    WHERE rank <= 10 ORDER BY q_vec_id, rank
    """,
        # ann_lsh_topk re-ranks candidates with exact cosine, and the
        # driver query's (n_tables=48, n_bits=4) gives candidate recall
        # 1.0 at both test scales (deterministic seed, checked against
        # the brute-force operator) — so its output equals brute-force.
        "ann_lsh_topk": _ANN_TOPK_SQL,
        # ann_ivf_topk probes every centroid (nprobe == n_centroids),
        # which is provably exhaustive -> equals brute-force.
        "ann_ivf_topk": _ANN_TOPK_SQL,
        # ann_pq_topk re-ranks the top-200 ADC candidates per batch by
        # exact cosine (k=10, batches cover the corpus), which restores
        # brute-force results on this corpus -> shares the oracle.
        "ann_pq_topk": _ANN_TOPK_SQL,
        "embedding_near_dup": """
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
            ORDER BY vec_id_a, vec_id_b
        """,
        "quality_stats": f"""
            WITH docs AS (SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks FROM documents)
            SELECT doc_id,
              len(toks)::BIGINT AS n_tokens,
              len(list_distinct(toks))::BIGINT AS n_unique,
              coalesce(list_max(list_transform(toks, x -> length(x))), 0)::BIGINT AS longest_token_len,
              len(list_filter(toks, x -> x IN {_STOPS_SQL}))::BIGINT AS stop_hits
            FROM docs ORDER BY doc_id
        """,
        "bpe_token_count": f"""
            SELECT doc_id,
              len(regexp_extract_all(text, '{_BPE_RE_SQL}'))::BIGINT AS bpe_tokens
            FROM documents ORDER BY doc_id
        """,
        "language_id": f"""
            WITH docs AS (SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks FROM documents),
            cnt AS (SELECT doc_id, {_LANG_COUNTS} FROM docs)
            SELECT doc_id,
              CASE WHEN greatest(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
                   WHEN c_de = greatest(c_de, c_en, c_es, c_fr) THEN 'de'
                   WHEN c_en = greatest(c_de, c_en, c_es, c_fr) THEN 'en'
                   WHEN c_es = greatest(c_de, c_en, c_es, c_fr) THEN 'es'
                   ELSE 'fr' END AS pred_lang
            FROM cnt ORDER BY doc_id
        """,
        "tokens_by_source": f"""
            WITH docs AS (SELECT source, list_filter({_TOKS}, x -> x <> '') AS toks FROM documents)
            SELECT source, sum(len(toks))::BIGINT AS total_tokens,
                   count(*)::BIGINT AS n_docs
            FROM docs GROUP BY source ORDER BY source
        """,
        "sessionize": """
            WITH lagged AS (
              SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 1800 SECONDS
                     THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            grp AS (
              SELECT user_id, ts,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS g
              FROM lagged)
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*)::BIGINT AS n_events
            FROM grp GROUP BY user_id, g
            ORDER BY user_id, session_start
        """,
        "events_hourly": """
            SELECT event_type, epoch(date_trunc('hour', ts))::BIGINT AS window_start_s,
                   count(*)::BIGINT AS n_events,
                   sum(round(value * 100)::BIGINT)::BIGINT AS value_cents
            FROM events GROUP BY event_type, date_trunc('hour', ts)
            ORDER BY event_type, window_start_s
        """,
        # hopping (overlapping) windows: 1h window, 30min hop — each
        # event expands to its window/hop covering starts
        "events_hopping": """
            SELECT event_type, ws AS window_start_s,
                   count(*)::BIGINT AS n_events,
                   sum(cents)::BIGINT AS value_cents
            FROM (
              SELECT event_type, round(value * 100)::BIGINT AS cents,
                     unnest(generate_series(
                       ((epoch_us(ts) // 1000000 // 1800) * 1800 - 1800)::BIGINT,
                       ((epoch_us(ts) // 1000000 // 1800) * 1800)::BIGINT,
                       1800)) AS ws
              FROM events)
            GROUP BY event_type, ws
            ORDER BY event_type, ws
        """,
    }
    # sharded serving must reproduce the monolithic result exactly —
    # same oracle as bm25_topk
    out["bm25_topk_sharded"] = out["bm25_topk"]
    # the block-max pruned scorer must be score-safe (exact): same oracle
    out["pruned_bm25_topk"] = out["bm25_topk"]
    # merged half+half index must reproduce the whole-corpus postings
    out["merged_postings"] = out["postings"]
    out["resharded_postings"] = out["postings"]
    # conjunctive (AND) BM25: only docs containing every query term
    out["bm25_and_topk"] = f"""
        WITH {_BASE_CTES}, {_QTERMS},
        qn AS (SELECT q_id, count(DISTINCT term) AS n FROM qterms GROUP BY q_id),
        scores AS (
          SELECT q.q_id, tf.doc_id,
            sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({k1} + 1)
                 / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
          FROM qterms q
          JOIN tf ON tf.term = q.term
          JOIN df ON df.term = q.term
          JOIN dl ON dl.doc_id = tf.doc_id
          JOIN qn ON qn.q_id = q.q_id
          CROSS JOIN stats s
          GROUP BY q.q_id, tf.doc_id
          HAVING count(DISTINCT q.term) = max(qn.n))
        SELECT q_id, rank, doc_id FROM (
          SELECT q_id, doc_id,
            row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
          FROM scores)
        WHERE rank <= {CUTOFF} ORDER BY q_id, rank
    """
    # tombstone-masked top-k: FULL-corpus stats, deleted ids filtered
    # from the ranked output (Lucene deleted-docs semantics)
    _del_ids = ", ".join(str(i) for i in DELETED_DOC_IDS)
    out["deleted_bm25_topk"] = f"""
        WITH {_BASE_CTES}, {_QTERMS},
        scores AS (
          SELECT q.q_id, tf.doc_id,
            sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({k1} + 1)
                 / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
          FROM qterms q
          JOIN tf ON tf.term = q.term
          JOIN df ON df.term = q.term
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats s
          GROUP BY q.q_id, tf.doc_id)
        SELECT q_id, rank, doc_id FROM (
          SELECT q_id, doc_id,
            row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rank
          FROM scores WHERE doc_id NOT IN ({_del_ids}))
        WHERE rank <= {CUTOFF} ORDER BY q_id, rank
    """
    out["filtered_bm25_topk_sharded"] = out["filtered_bm25_topk"]
    # prep ops (ops/prep.py): the Python side uses pyarrow RE2 regex
    # kernels / md5 low-8-bytes — the same RE2 dialect and
    # md5_number_lower DuckDB exposes, so these are exact oracles.
    out["clean_text"] = r"""
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                   coalesce(text, ''),
                   'https?://\S+', ' ', 'g'),
                   '\S+@\S+\.\S+', ' ', 'g'),
                   '[\x00-\x08\x0b-\x1f\x7f]', ' ', 'g'),
                   '\s+', ' ', 'g')) AS clean
        FROM documents ORDER BY doc_id
    """
    # the resumable sink must be lossless: reading the bucketed
    # layout back equals the transform it persisted
    out["resumable_write"] = out["clean_text"]
    # heavy hitters at oracle capacity == exact GROUP BY, zero bounds
    out["approx_topk"] = f"""
        WITH {_BASE_CTES}
        SELECT term, count(*)::BIGINT AS est_count,
               0::BIGINT AS max_undercount
        FROM toks GROUP BY term
        ORDER BY est_count DESC, term LIMIT 15
    """
    out["dedup_filter"] = f"""
        WITH pairs AS ({_NGRAM_JACCARD_SQL})
        SELECT d.doc_id FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id_b FROM pairs)
        ORDER BY d.doc_id
    """
    out["split_by_hash"] = """
        SELECT doc_id,
               CASE WHEN b < 90 THEN 'train'
                    WHEN b < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS b
              FROM documents)
        ORDER BY doc_id
    """
    out["chunk_documents"] = f"""
        WITH toks AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS t
          FROM documents),
        s AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
        starts AS (
          SELECT doc_id, t, n, unnest(generate_series(1, n, 48)) AS i
          FROM s)
        SELECT doc_id, (i - 1) // 48 AS chunk_idx,
               array_to_string(t[i : least(i + 63, n)], ' ') AS chunk,
               len(t[i : least(i + 63, n)])::BIGINT AS n_tokens
        FROM starts
        WHERE i = 1 OR (i - 1 - 48 + 64) < n
        ORDER BY doc_id, chunk_idx
    """
    out["pack_token_stream"] = f"""
        WITH docs AS (
          SELECT doc_id,
                 len(list_filter({_TOKS}, x -> x <> '')) AS n
          FROM documents),
        cum AS (
          SELECT doc_id, n,
                 coalesce(sum(n) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS base
          FROM docs),
        spans AS (
          SELECT doc_id, n, base,
                 unnest(generate_series((base // 256)::BIGINT,
                                        ((base + n - 1) // 256)::BIGINT)) AS seq_id
          FROM cum WHERE n > 0)
        SELECT seq_id::BIGINT AS seq_id, doc_id,
               greatest(0, seq_id * 256 - base)::BIGINT AS tok_start,
               least(n, (seq_id + 1) * 256 - base)::BIGINT AS tok_end
        FROM spans ORDER BY seq_id, doc_id
    """
    out["topk_per_group"] = """
        SELECT source, rank, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id) AS rank
          FROM documents)
        WHERE rank <= 5 ORDER BY source, rank
    """
    # tie rule pinned on both sides: greatest (ts, id) at-or-before,
    # within the 7-day tolerance (ops/joins.py asof_join)
    out["asof_join"] = """
        WITH l AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type = 'click'),
             r AS (SELECT user_id, event_id, ts, value FROM events
                   WHERE event_type = 'purchase')
        SELECT key, event_id, ts, anchor_id, anchor_ts, anchor_val FROM (
          SELECT l.user_id AS key, l.event_id AS event_id, l.ts AS ts,
                 r.event_id AS anchor_id, r.ts AS anchor_ts,
                 r.value AS anchor_val,
                 row_number() OVER (PARTITION BY l.event_id
                                    ORDER BY r.ts DESC, r.event_id DESC) AS rn
          FROM l JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
                       AND r.ts > l.ts - INTERVAL 7 DAY
        ) WHERE rn = 1
    """
    # epoch_us floor-division (not date_diff, which counts boundary
    # crossings) so delta_s matches the engine's integer-us floor
    out["range_join"] = """
        WITH l AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type <> 'purchase'),
             r AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type = 'purchase')
        SELECT l.user_id AS key, l.event_id AS event_id,
               r.event_id AS anchor_id,
               (epoch_us(l.ts) - epoch_us(r.ts)) // 1000000 AS delta_s
        FROM l JOIN r ON l.user_id = r.user_id
                     AND l.ts >= r.ts AND l.ts < r.ts + INTERVAL 1 HOUR
    """
    # same RE2 patterns, same leftmost non-overlapping scan, same
    # replacement order as ops/scrub.py DEFAULT_PATTERNS
    out["pii_scrub"] = r"""
        SELECT event_id,
          len(regexp_extract_all(props,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
            AS n_email,
          len(regexp_extract_all(props,
              '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ipv4,
          len(regexp_extract_all(props, '\d+'))::BIGINT AS n_number,
          regexp_replace(
            regexp_replace(
              regexp_replace(props,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                '<EMAIL>', 'g'),
              '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV>', 'g'),
            '\d+', '<NUMBER>', 'g') AS redacted
        FROM events ORDER BY event_id
    """
    out["repetition_stats"] = f"""
        WITH docs AS (SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks
                      FROM documents),
        g AS (SELECT doc_id,
          list_transform(range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i+1]) AS g2,
          list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
            AS g3
          FROM docs)
        SELECT doc_id,
          len(g2)::BIGINT AS n_2grams,
          (len(g2) - len(list_distinct(g2)))::BIGINT AS dup_2grams,
          len(g3)::BIGINT AS n_3grams,
          (len(g3) - len(list_distinct(g3)))::BIGINT AS dup_3grams
        FROM g ORDER BY doc_id
    """
    out["top_ngrams"] = f"""
        WITH docs AS (SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks
                      FROM documents),
        g AS (SELECT unnest(list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1])) AS gram
              FROM docs)
        SELECT gram, count(*)::BIGINT AS cnt FROM g
        GROUP BY gram ORDER BY cnt DESC, gram LIMIT 20
    """
    # rank key = md5 low-64 of "{seed}:{id}" (the repo-wide DuckDB
    # md5_number_lower convention), ties by id — ops/prep.py
    _mix_budgets = " , ".join(
        f"('{s}', {int(w * MIXTURE_BUDGET)})" for s, w in MIXTURE_WEIGHTS.items()
    )
    _mix_srcs = ", ".join(f"'{s}'" for s in MIXTURE_WEIGHTS)
    out["mixture_sample"] = f"""
        WITH tok AS (
          SELECT doc_id, source,
            len(list_filter({_TOKS}, x -> x <> ''))::BIGINT AS n,
            md5_number_lower('0:' || doc_id::VARCHAR) AS rank
          FROM documents WHERE source IN ({_mix_srcs})),
        cum AS (
          SELECT doc_id, source, n,
            sum(n) OVER (PARTITION BY source ORDER BY rank, doc_id
                         ROWS UNBOUNDED PRECEDING) AS running
          FROM tok),
        budgets(source, budget) AS (VALUES {_mix_budgets})
        SELECT c.doc_id, c.source, c.n AS n_tokens
        FROM cum c JOIN budgets b ON b.source = c.source
        WHERE c.running <= b.budget ORDER BY doc_id
    """
    out["stratified_sample"] = """
        SELECT source, doc_id FROM (
          SELECT source, doc_id,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5_number_lower('0:' || doc_id::VARCHAR),
                            doc_id) AS rn
          FROM documents) WHERE rn <= 7 ORDER BY source, doc_id
    """
    # benchmark = each doc_id<5 doc's first 8 tokens; 8-gram collision
    # counts are integer-exact (ops/textstats.py contamination_check)
    out["contamination_check"] = f"""
        WITH toks AS (SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS t
                      FROM documents),
        bench AS (SELECT DISTINCT array_to_string(t[1:8], ' ') AS gram
                  FROM toks WHERE doc_id < 5 AND len(t) >= 8),
        grams AS (SELECT doc_id, array_to_string(t[i : i+7], ' ') AS gram
                  FROM toks, unnest(generate_series(1, len(t) - 7)) AS g(i)
                  WHERE len(t) >= 8)
        SELECT g.doc_id, count(*)::BIGINT AS n_grams,
               sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                 AS n_contaminated
        FROM grams g LEFT JOIN bench b ON g.gram = b.gram
        GROUP BY g.doc_id ORDER BY g.doc_id
    """
    # windowed exact-substring duplication (ops/dedup.py
    # duplicate_window_stats; window=8 stride=4); the oracle groups by
    # the VERBATIM window text, so an md5 collision would surface here
    out["duplicate_windows"] = f"""
        WITH toks AS (SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS t
                      FROM documents),
        w AS (SELECT doc_id, array_to_string(t[i : i+7], ' ') AS gram
              FROM toks, unnest(generate_series(1, len(t) - 7, 4)) AS g(i)
              WHERE len(t) >= 8),
        c AS (SELECT gram, count(*)::BIGINT AS n FROM w GROUP BY gram)
        SELECT w.doc_id, count(*)::BIGINT AS n_windows,
               sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_windows
        FROM w JOIN c ON w.gram = c.gram
        GROUP BY w.doc_id ORDER BY w.doc_id
    """
    # per-position corpus-frequency stats (ops/textstats.py token_rarity)
    out["token_rarity"] = f"""
        WITH toks AS (SELECT doc_id,
                             unnest(list_filter({_TOKS}, x -> x <> '')) AS tok
                      FROM documents),
        counts AS (SELECT tok, count(*)::BIGINT AS cnt FROM toks GROUP BY tok)
        SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
               sum(c.cnt)::BIGINT AS sum_cnt, min(c.cnt)::BIGINT AS min_cnt
        FROM toks t JOIN counts c ON t.tok = c.tok
        GROUP BY t.doc_id ORDER BY t.doc_id
    """
    # transitive duplicate clusters over two blocking keys
    # (ops/dedup.py dedup_clusters: bipartite min-label propagation;
    # oracle spreads labels along shared-key edges with a recursive
    # CTE — cluster id = min doc_id per connected component)
    out["dedup_clusters"] = """
        WITH RECURSIVE memb AS (
          SELECT doc_id, 'a#' || lang || '#' ||
                 CAST(n_chars // 8 AS VARCHAR) AS k FROM documents
          UNION ALL
          SELECT doc_id, 'b#' || source || '#' ||
                 CAST(n_chars // 12 AS VARCHAR) AS k FROM documents
        ), edges AS (
          SELECT a.doc_id AS src, b.doc_id AS dst
          FROM memb a JOIN memb b ON a.k = b.k
        ), cc AS (
          SELECT doc_id, doc_id AS label FROM documents
          UNION
          SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.doc_id = e.src
        )
        SELECT doc_id, MIN(label) AS cluster_id FROM cc
        GROUP BY doc_id ORDER BY doc_id
    """
    # transitively deduplicated corpus: cluster canonical (min label)
    # survives; same recursive CTE as dedup_clusters
    out["cluster_dedup_filter"] = """
        WITH RECURSIVE memb AS (
          SELECT doc_id, 'a#' || lang || '#' ||
                 CAST(n_chars // 8 AS VARCHAR) AS k FROM documents
          UNION ALL
          SELECT doc_id, 'b#' || source || '#' ||
                 CAST(n_chars // 12 AS VARCHAR) AS k FROM documents
        ), edges AS (
          SELECT a.doc_id AS src, b.doc_id AS dst
          FROM memb a JOIN memb b ON a.k = b.k
        ), cc AS (
          SELECT doc_id, doc_id AS label FROM documents
          UNION
          SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.doc_id = e.src
        ), canon AS (
          SELECT doc_id, MIN(label) AS cluster_id FROM cc GROUP BY doc_id)
        SELECT d.* FROM documents d
        JOIN canon c ON c.doc_id = d.doc_id
        WHERE c.cluster_id = d.doc_id ORDER BY d.doc_id
    """
    # exact histogram-based quantiles (ops/textstats.py
    # length_quantiles; binary-fraction q keeps ceil(q*n) float-exact)
    out["length_quantiles"] = " UNION ALL ".join(
        f"SELECT CAST({q} AS DOUBLE) AS q, "
        f"quantile_disc(n_chars, {q}) AS value FROM documents"
        for q in (0.25, 0.5, 0.75, 0.875, 0.96875)
    )
    # per-doc top-k TF-IDF keywords (ops/textstats.py tfidf_keywords;
    # score quantized to floor(1e4 * tf * ln(N/df)) so the hash check
    # covers values, and ordering (score_e4 DESC, term ASC) is
    # integer-deterministic on both sides)
    out["tfidf_keywords"] = f"""
        WITH toks AS (SELECT doc_id,
                             unnest(list_filter({_TOKS}, x -> x <> '')) AS term
                      FROM documents),
        tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
               FROM toks GROUP BY doc_id, term),
        df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
        n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 floor(10000.0 * tf.tf::DOUBLE
                       * ln(n.n / df.df::DOUBLE))::BIGINT AS score_e4
          FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
        SELECT doc_id, rank, term, tf, df, score_e4 FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score_e4 DESC, term) AS rank
          FROM scored)
        WHERE rank <= 5 ORDER BY doc_id, rank
    """
    # trailing-5-row per-user window aggregates (ops/windows.py
    # rolling_event_stats; floor-cents quantization is rounding-mode
    # independent, integer sums are order-exact)
    out["rolling_events"] = """
        WITH e AS (SELECT event_id, user_id, ts,
                          floor(value * 100)::BIGINT AS cents FROM events)
        SELECT event_id, user_id,
               count(*) OVER w::BIGINT AS n_window,
               sum(cents) OVER w::BIGINT AS sum_cents,
               max(cents) OVER w::BIGINT AS max_cents
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """
    # cross-dataset fuzzy join (ops/dedup.py jaccard_join) — left =
    # even doc_ids, right = odd; same distinct-3-gram Jaccard as
    # ngram_jaccard_pairs but only cross-side pairs survive
    out["jaccard_join"] = f"""
        WITH docs AS (SELECT doc_id,
                             list_filter({_TOKS}, x -> x <> '') AS t
                      FROM documents),
        grams AS (
          SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
          FROM docs, unnest(generate_series(1, len(t) - 2)) AS u(i)
          WHERE len(t) >= 3),
        sizes AS (SELECT doc_id, count(*)::DOUBLE AS sz FROM grams GROUP BY doc_id),
        inter AS (
          SELECT g1.doc_id AS a, g2.doc_id AS b, count(*)::DOUBLE AS i
          FROM grams g1 JOIN grams g2 ON g1.g = g2.g
          WHERE g1.doc_id % 2 = 0 AND g2.doc_id % 2 = 1
          GROUP BY g1.doc_id, g2.doc_id)
        SELECT a AS left_id, b AS right_id,
               floor(10000 * i / (sa.sz + sb.sz - i))::BIGINT AS jaccard_e4
        FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
        WHERE i / (sa.sz + sb.sz - i) >= 0.5
    """
    # Efraimidis-Spirakis weighted sample (ops/prep.py weighted_sample)
    # — key = ln(u)/w with the repo-wide md5_number_lower uniform;
    # only (id, integer weight) are output, float key never hashed
    out["weighted_sample"] = """
        SELECT doc_id, w FROM (
          SELECT doc_id, n_chars AS w,
                 row_number() OVER (ORDER BY
                   ln((md5_number_lower('0:' || doc_id::VARCHAR)::DOUBLE + 1)
                      / 18446744073709551616.0) / n_chars DESC,
                   doc_id) AS rn
          FROM documents WHERE n_chars > 0)
        WHERE rn <= 50 ORDER BY doc_id
    """
    # Gopher/C4 composite quality filter (ops/textstats.py
    # gopher_filter) — integer cross-multiplied rules, no float math
    out["gopher_filter"] = f"""
        WITH t AS (SELECT doc_id,
                          list_filter({_TOKS}, x -> x <> '') AS toks
                   FROM documents),
        s AS (SELECT doc_id, len(toks)::BIGINT AS n,
                     list_sum(list_transform(toks, x -> len(x)))::BIGINT AS sum_len,
                     len(list_filter(toks, x -> x IN
                       ('the','a','an','and','or','of','to','in','is','it',
                        'that','this','for','on','with','as','at','by','be',
                        'are')))::BIGINT AS stop_hits,
                     CASE WHEN len(toks) >= 3 THEN (len(toks)-2)::BIGINT
                          ELSE 0 END AS n3,
                     CASE WHEN len(toks) >= 3 THEN
                       ((len(toks)-2) - len(list_distinct(list_transform(
                          generate_series(1, len(toks)-2),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                        ))))::BIGINT
                          ELSE 0 END AS d3
              FROM t)
        SELECT doc_id, n AS n_tokens FROM s
        WHERE n BETWEEN 20 AND 10000
          AND sum_len >= 3 * n AND sum_len <= 10 * n
          AND stop_hits >= 2
          AND 20 * d3 <= n3
        ORDER BY doc_id
    """
    # top-k bigram collocations by quantized PMI (ops/textstats.py
    # pmi_collocations; position counts N1/N2, left-assoc double math
    # mirrored exactly, floor(1e4*ln) kills last-ulp libm differences)
    out["pmi_collocations"] = f"""
        WITH t AS (SELECT doc_id,
                          list_filter({_TOKS}, x -> x <> '') AS toks
                   FROM documents),
        uni AS (SELECT unnest(toks) AS w FROM t),
        c1 AS (SELECT w, count(*)::BIGINT AS c FROM uni GROUP BY w),
        big AS (SELECT toks[i] AS x, toks[i+1] AS y
                FROM t, unnest(generate_series(1, len(toks)-1)) AS u(i)
                WHERE len(toks) >= 2),
        c2 AS (SELECT x, y, count(*)::BIGINT AS cxy FROM big
               GROUP BY x, y HAVING count(*) >= 5),
        n1 AS (SELECT sum(c)::DOUBLE AS v FROM c1),
        n2 AS (SELECT count(*)::DOUBLE AS v FROM big),
        scored AS (
          SELECT c2.x || ' ' || c2.y AS gram, c2.cxy AS cnt,
                 floor(10000 * ln((c2.cxy::DOUBLE * n1.v * n1.v)
                                  / (n2.v * cx.c * cy.c)))::BIGINT AS pmi_e4
          FROM c2 JOIN c1 cx ON c2.x = cx.w JOIN c1 cy ON c2.y = cy.w
          CROSS JOIN n1 CROSS JOIN n2)
        SELECT gram, cnt, pmi_e4 FROM (
          SELECT *, row_number() OVER (ORDER BY pmi_e4 DESC, gram) AS rn
          FROM scored)
        WHERE rn <= 20 ORDER BY rn
    """
    # per-column validation profile (ops/textstats.py profile_columns)
    # — int/string columns only (float stringification differs)
    out["profile_columns"] = " UNION ALL ".join(
        f"""SELECT '{c}' AS col, count(*)::BIGINT AS n,
               (count(*) - count({c}))::BIGINT AS n_null,
               count(DISTINCT {c})::BIGINT AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_v,
               CAST(max({c}) AS VARCHAR) AS max_v
            FROM documents"""
        for c in ("doc_id", "lang", "source", "n_chars")
    )
    # per-label embedding centroid numerators, quantize-then-sum so
    # the int64 sums are order-exact (ops/ann.py group_centroids)
    out["group_centroids"] = """
        SELECT label::BIGINT AS label, u.i::BIGINT AS dim,
               count(*)::BIGINT AS n,
               sum(floor(1000000 * embedding[u.i]::DOUBLE))::BIGINT AS sum_e6
        FROM embeddings,
             unnest(generate_series(1, len(embedding))) AS u(i)
        GROUP BY label, u.i ORDER BY label, dim
    """
    # BM25F (search/bm25f.py): weighted pseudo-document tf/dl with
    # integer field weights, doc-level idf, rank-only compare
    _w_values = " , ".join(
        f"('{f}', {w})" for f, w in BM25F_WEIGHTS.items()
    )
    _tt = BM25F_TITLE_TOKENS
    out["bm25f_topk"] = f"""
        WITH docs AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks
          FROM documents),
        fields AS (
          SELECT doc_id, 'title' AS field,
                 array_slice(toks, 1, least({_tt}, len(toks))) AS ftoks
          FROM docs
          UNION ALL
          SELECT doc_id, 'body',
                 CASE WHEN len(toks) > {_tt}
                      THEN array_slice(toks, {_tt} + 1, len(toks))
                      ELSE [] END
          FROM docs),
        w(field, wt) AS (VALUES {_w_values}),
        toks2 AS (SELECT doc_id, field, unnest(ftoks) AS term FROM fields),
        wtf AS (
          SELECT t.doc_id, t.term, sum(w.wt)::BIGINT AS wtf
          FROM toks2 t JOIN w ON w.field = t.field
          GROUP BY t.doc_id, t.term),
        wdl AS (
          SELECT f.doc_id, sum(w.wt * len(f.ftoks))::BIGINT AS wdl
          FROM fields f JOIN w ON w.field = f.field
          GROUP BY f.doc_id),
        fdf AS (SELECT term, count(*)::DOUBLE AS df FROM wtf GROUP BY term),
        stats AS (
          SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                 (SELECT sum(wdl) FROM wdl)::DOUBLE
                 / (SELECT count(*) FROM wdl)::DOUBLE AS avgwdl),
        {_QTERMS},
        scores AS (
          SELECT q.q_id, wtf.doc_id,
            sum( ln(1 + (s.n - fdf.df + 0.5) / (fdf.df + 0.5))
                 * wtf.wtf::DOUBLE * ({k1} + 1)
                 / (wtf.wtf::DOUBLE
                    + {k1} * (1 - {b} + {b} * wdl.wdl::DOUBLE / s.avgwdl)) )
              AS score
          FROM qterms q
          JOIN wtf ON wtf.term = q.term
          JOIN fdf ON fdf.term = q.term
          JOIN wdl ON wdl.doc_id = wtf.doc_id
          CROSS JOIN stats s
          GROUP BY q.q_id, wtf.doc_id)
        SELECT q_id, rank, doc_id FROM (
          SELECT q_id, doc_id,
            row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id)
              AS rank
          FROM scores)
        WHERE rank <= {CUTOFF} ORDER BY q_id, rank
    """
    # LTR features: per-term floor-quantized bm25 contributions summed
    # as integers (order-free aggregate — matches bm25f.py contribs'
    # per-term np.floor(1e4 * idf * (tf*(k1+1)/(tf+denom))) exactly)
    out["ltr_features"] = f"""
        WITH {_BASE_CTES}, {_QTERMS},
        feats AS (
          SELECT q.q_id, tf.doc_id,
            sum( floor(1e4 * ( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                 * (tf.tf * ({k1} + 1)
                    / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)))
               ))::BIGINT )::BIGINT
              AS bm25_e4,
            sum(tf.tf)::BIGINT AS tf_sum,
            count(DISTINCT q.term)::BIGINT AS n_matched,
            max(dl.dl)::BIGINT AS dl
          FROM qterms q
          JOIN tf ON tf.term = q.term
          JOIN df ON df.term = q.term
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats s
          GROUP BY q.q_id, tf.doc_id)
        SELECT q_id, doc_id, bm25_e4, tf_sum, n_matched, dl
        FROM feats ORDER BY q_id, doc_id
    """
    # BM25+: classic formula + delta lower bound per matching term
    out["bm25plus_topk"] = f"""
        WITH {_BASE_CTES}, {_QTERMS},
        scores AS (
          SELECT q.q_id, tf.doc_id,
            sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                 * ( tf.tf * ({k1} + 1)
                     / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl))
                     + 1.0 ) ) AS score
          FROM qterms q
          JOIN tf ON tf.term = q.term
          JOIN df ON df.term = q.term
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats s
          GROUP BY q.q_id, tf.doc_id)
        SELECT q_id, rank, doc_id FROM (
          SELECT q_id, doc_id,
            row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id)
              AS rank
          FROM scores)
        WHERE rank <= {CUTOFF} ORDER BY q_id, rank
    """
    # numeric histogram: fixed-interval buckets, floor toward -inf
    out["numeric_histogram"] = """
        SELECT event_type,
               (floor(round(value * 100)::BIGINT / 2500.0)::BIGINT * 2500)
                 AS bucket,
               count(*)::BIGINT AS n,
               sum(round(value * 100)::BIGINT)::BIGINT AS value_sum
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """
    # MaxP: BM25 over 64/48 chunks, doc score = best passage
    out["max_passage_topk"] = f"""
        WITH toksrc AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS t
          FROM documents),
        sdocs AS (SELECT doc_id, t, len(t) AS n FROM toksrc WHERE len(t) > 0),
        starts AS (
          SELECT doc_id, t, n, unnest(generate_series(1, n, 48)) AS i
          FROM sdocs),
        chunks AS (
          SELECT doc_id, (i - 1) // 48 AS chunk_idx,
                 t[i : least(i + 63, n)] AS ctoks
          FROM starts
          WHERE i = 1 OR (i - 1 - 48 + 64) < n),
        ctok AS (SELECT doc_id, chunk_idx, unnest(ctoks) AS term FROM chunks),
        ctf AS (SELECT doc_id, chunk_idx, term, count(*)::DOUBLE AS tf
                FROM ctok GROUP BY 1, 2, 3),
        cdf AS (SELECT term, count(*)::DOUBLE AS df FROM ctf GROUP BY term),
        cdl AS (SELECT doc_id, chunk_idx, len(ctoks)::DOUBLE AS dl FROM chunks),
        cstats AS (
          SELECT (SELECT count(*) FROM chunks)::DOUBLE AS n,
                 (SELECT sum(dl) FROM cdl)::DOUBLE
                 / (SELECT count(*) FROM chunks)::DOUBLE AS avgdl),
        {_QTERMS},
        pscores AS (
          SELECT q.q_id, tf.doc_id, tf.chunk_idx,
            sum( ln(1 + (s.n - cdf.df + 0.5) / (cdf.df + 0.5))
                 * tf.tf * ({k1} + 1)
                 / (tf.tf + {k1} * (1 - {b} + {b} * cdl.dl / s.avgdl)) )
              AS score
          FROM qterms q
          JOIN ctf tf ON tf.term = q.term
          JOIN cdf ON cdf.term = q.term
          JOIN cdl ON cdl.doc_id = tf.doc_id AND cdl.chunk_idx = tf.chunk_idx
          CROSS JOIN cstats s
          GROUP BY 1, 2, 3),
        dscores AS (
          SELECT q_id, doc_id, max(score) AS score
          FROM pscores GROUP BY 1, 2)
        SELECT q_id, rank, doc_id FROM (
          SELECT q_id, doc_id,
            row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id)
              AS rank
          FROM dscores)
        WHERE rank <= {CUTOFF} ORDER BY q_id, rank
    """
    # boosting query: positive BM25, negative matches demoted by nb
    _bq_pos = " , ".join(
        f"('{q}', '{p_}')" for q, (p_, _n) in BOOSTING_QUERIES.items()
    )
    _bq_neg = " , ".join(
        f"('{q}', '{n_}')" for q, (_p, n_) in BOOSTING_QUERIES.items()
    )
    out["boosting_topk"] = f"""
        WITH {_BASE_CTES},
        qterms AS (SELECT q_id, unnest(string_split(qtext, ' ')) AS term
                   FROM (VALUES {_bq_pos}) AS q(q_id, qtext)),
        negterms AS (SELECT q_id, unnest(string_split(qtext, ' ')) AS term
                     FROM (VALUES {_bq_neg}) AS q(q_id, qtext)),
        negdocs AS (
          SELECT DISTINCT n.q_id, t.doc_id
          FROM negterms n JOIN tf t ON t.term = n.term),
        scores AS (
          SELECT q.q_id, tf.doc_id,
            sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({k1} + 1)
                 / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
          FROM qterms q
          JOIN tf ON tf.term = q.term
          JOIN df ON df.term = q.term
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats s
          GROUP BY q.q_id, tf.doc_id),
        boosted AS (
          SELECT s.q_id, s.doc_id,
                 s.score * CASE WHEN nd.doc_id IS NULL
                                THEN 1.0 ELSE {NEGATIVE_BOOST} END AS score
          FROM scores s
          LEFT JOIN negdocs nd
            ON nd.q_id = s.q_id AND nd.doc_id = s.doc_id)
        SELECT q_id, rank, doc_id FROM (
          SELECT q_id, doc_id,
            row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id)
              AS rank
          FROM boosted)
        WHERE rank <= {CUTOFF} ORDER BY q_id, rank
    """
    # dis_max / best_fields: per-field BM25 subqueries (field-local
    # N/avgdl/df), combined best + tie_breaker * others
    out["dis_max_topk"] = f"""
        WITH docs AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks
          FROM documents),
        fields AS (
          SELECT doc_id, 'title' AS field,
                 array_slice(toks, 1, least({_tt}, len(toks))) AS ftoks
          FROM docs
          UNION ALL
          SELECT doc_id, 'body',
                 CASE WHEN len(toks) > {_tt}
                      THEN array_slice(toks, {_tt} + 1, len(toks))
                      ELSE [] END
          FROM docs),
        dl AS (SELECT doc_id, field, len(ftoks)::BIGINT AS dl FROM fields),
        toks2 AS (SELECT doc_id, field, unnest(ftoks) AS term FROM fields),
        tf AS (
          SELECT doc_id, field, term, count(*)::BIGINT AS tf
          FROM toks2 GROUP BY 1, 2, 3),
        fstats AS (
          SELECT field, count(*)::DOUBLE AS n,
                 sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl
          FROM dl GROUP BY field),
        fdf AS (
          SELECT field, term, count(*)::DOUBLE AS df
          FROM tf GROUP BY 1, 2),
        {_QTERMS},
        fscores AS (
          SELECT q.q_id, tf.doc_id, tf.field,
            sum( ln(1 + (s.n - fdf.df + 0.5) / (fdf.df + 0.5))
                 * tf.tf::DOUBLE * ({k1} + 1)
                 / (tf.tf::DOUBLE
                    + {k1} * (1 - {b} + {b} * dl.dl::DOUBLE / s.avgdl)) )
              AS score
          FROM qterms q
          JOIN tf ON tf.term = q.term
          JOIN fdf ON fdf.term = q.term AND fdf.field = tf.field
          JOIN dl ON dl.doc_id = tf.doc_id AND dl.field = tf.field
          JOIN fstats s ON s.field = tf.field
          GROUP BY 1, 2, 3),
        comb AS (
          SELECT q_id, doc_id,
                 max(score) + {DIS_MAX_TIE} * (sum(score) - max(score))
                   AS score
          FROM fscores GROUP BY 1, 2)
        SELECT q_id, rank, doc_id FROM (
          SELECT q_id, doc_id,
            row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id)
              AS rank
          FROM comb)
        WHERE rank <= {CUTOFF} ORDER BY q_id, rank
    """
    # integer-exact Lloyd k-means, mirrors ops/cluster.py: quantized
    # int64 distances, ties -> lowest seed id, centroid update by
    # exact floor division (the %-normalized numerator is divisible,
    # so the double division is exact), empty clusters keep their
    # previous centroid
    out["kmeans_assign"] = f"""
        WITH qv AS (
          SELECT vec_id, u.i AS dim,
                 floor({KMEANS_SCALE} * embedding[u.i]::DOUBLE)::BIGINT AS q
          FROM embeddings,
               unnest(generate_series(1, len(embedding))) AS u(i)),
        seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {KMEANS_K}),
        c0 AS (SELECT vec_id AS c_id, dim, q AS c FROM qv
               WHERE vec_id IN (SELECT vec_id FROM seeds)),
        a1 AS (
          SELECT qv.vec_id, c0.c_id,
                 sum((qv.q - c0.c) * (qv.q - c0.c))::BIGINT AS d2
          FROM qv JOIN c0 ON c0.dim = qv.dim
          GROUP BY qv.vec_id, c0.c_id),
        asg1 AS (
          SELECT vec_id, c_id FROM (
            SELECT vec_id, c_id,
              row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_id) AS rn
            FROM a1) WHERE rn = 1),
        sums1 AS (
          SELECT g.c_id, qv.dim, sum(qv.q)::BIGINT AS s, count(*)::BIGINT AS n
          FROM asg1 g JOIN qv ON qv.vec_id = g.vec_id
          GROUP BY g.c_id, qv.dim),
        c1 AS (
          SELECT c0.c_id, c0.dim,
            coalesce(((s.s - ((s.s % s.n) + s.n) % s.n) / s.n)::BIGINT, c0.c) AS c
          FROM c0 LEFT JOIN sums1 s ON s.c_id = c0.c_id AND s.dim = c0.dim),
        a2 AS (
          SELECT qv.vec_id, c1.c_id,
                 sum((qv.q - c1.c) * (qv.q - c1.c))::BIGINT AS d2
          FROM qv JOIN c1 ON c1.dim = qv.dim
          GROUP BY qv.vec_id, c1.c_id)
        SELECT vec_id, c_id AS cluster, d2 FROM (
          SELECT vec_id, c_id, d2,
            row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_id) AS rn
          FROM a2) WHERE rn = 1 ORDER BY vec_id
    """
    # kNN self-join: full O(n^2) cosine in SQL, rank-only compare
    # (float64 both sides, ties -> neighbor id asc, self excluded)
    out["knn_join"] = """
        WITH sims AS (
          SELECT a.vec_id AS q, b.vec_id AS v,
                 list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]) AS sim
          FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id)
        SELECT q AS vec_id, rank, v AS nbr_id FROM (
          SELECT q, v,
            row_number() OVER (PARTITION BY q ORDER BY sim DESC, v) AS rank
          FROM sims)
        WHERE rank <= 5 ORDER BY vec_id, rank
    """
    # SemDeDup: the same 2-round integer k-means CTE at the dedup
    # quantization scale, then a NOT EXISTS over the in-cluster
    # integer cross-multiplied cosine test (HUGEINT: dot^2 * 1e8 vs
    # te4^2 * |a|^2 * |b|^2 — mirrors ops/cluster.py semantic_dedup
    # bit for bit, no float anywhere)
    out["semantic_dedup"] = f"""
        WITH qv AS (
          SELECT vec_id, u.i AS dim,
                 floor({SEMDEDUP_SCALE} * embedding[u.i]::DOUBLE)::BIGINT AS q
          FROM embeddings,
               unnest(generate_series(1, len(embedding))) AS u(i)),
        seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {KMEANS_K}),
        c0 AS (SELECT vec_id AS c_id, dim, q AS c FROM qv
               WHERE vec_id IN (SELECT vec_id FROM seeds)),
        a1 AS (
          SELECT qv.vec_id, c0.c_id,
                 sum((qv.q - c0.c) * (qv.q - c0.c))::BIGINT AS d2
          FROM qv JOIN c0 ON c0.dim = qv.dim
          GROUP BY qv.vec_id, c0.c_id),
        asg1 AS (
          SELECT vec_id, c_id FROM (
            SELECT vec_id, c_id,
              row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_id) AS rn
            FROM a1) WHERE rn = 1),
        sums1 AS (
          SELECT g.c_id, qv.dim, sum(qv.q)::BIGINT AS s, count(*)::BIGINT AS n
          FROM asg1 g JOIN qv ON qv.vec_id = g.vec_id
          GROUP BY g.c_id, qv.dim),
        c1 AS (
          SELECT c0.c_id, c0.dim,
            coalesce(((s.s - ((s.s % s.n) + s.n) % s.n) / s.n)::BIGINT, c0.c) AS c
          FROM c0 LEFT JOIN sums1 s ON s.c_id = c0.c_id AND s.dim = c0.dim),
        a2 AS (
          SELECT qv.vec_id, c1.c_id,
                 sum((qv.q - c1.c) * (qv.q - c1.c))::BIGINT AS d2
          FROM qv JOIN c1 ON c1.dim = qv.dim
          GROUP BY qv.vec_id, c1.c_id),
        asg AS (
          SELECT vec_id, c_id AS cluster FROM (
            SELECT vec_id, c_id,
              row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_id) AS rn
            FROM a2) WHERE rn = 1),
        norms AS (
          SELECT vec_id, sum(q * q)::BIGINT AS nn FROM qv GROUP BY vec_id),
        dups AS (
          SELECT DISTINCT x.vec_id
          FROM asg x JOIN asg y
            ON y.cluster = x.cluster AND y.vec_id < x.vec_id
          JOIN norms na ON na.vec_id = x.vec_id
          JOIN norms nb ON nb.vec_id = y.vec_id
          JOIN (
            SELECT p.vec_id AS a, r.vec_id AS b,
                   sum(p.q * r.q)::BIGINT AS dot
            FROM qv p JOIN qv r ON r.dim = p.dim AND r.vec_id < p.vec_id
            GROUP BY p.vec_id, r.vec_id) d
            ON d.a = x.vec_id AND d.b = y.vec_id
          WHERE d.dot > 0
            AND d.dot::HUGEINT * d.dot * 100000000 >=
                {SEMDEDUP_TE4}::HUGEINT * {SEMDEDUP_TE4} * na.nn * nb.nn)
        SELECT vec_id, cluster FROM asg
        WHERE vec_id NOT IN (SELECT vec_id FROM dups)
        ORDER BY vec_id
    """
    # GROUP BY ROLLUP parity with '<all>' sentinels for rolled-up
    # positions (ops/windows.py rollup_counts)
    out["rollup_counts"] = """
        SELECT coalesce(lang, '<all>') AS lang,
               coalesce(source, '<all>') AS source,
               count(*)::BIGINT AS n,
               sum(n_chars)::BIGINT AS value_sum
        FROM documents
        GROUP BY ROLLUP(lang, source)
        ORDER BY lang, source
    """
    # TPC-H-Q3-shaped star join (ops/relational.py star_revenue_topk):
    # integer-cents revenue so the sum is order-exact under any
    # partitioning; params mirror _q_star_revenue
    out["star_revenue_topk"] = """
        WITH rev AS (
          SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
                 sum(round(l.l_extendedprice * 100)::BIGINT
                     * (100 - round(l.l_discount * 100)::BIGINT))::BIGINT
                   AS revenue_cents
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_mktsegment = 'BUILDING'
            AND o.o_orderdate < TIMESTAMP '1998-01-01'
            AND l.l_shipdate > TIMESTAMP '1998-01-01'
          GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority)
        SELECT l_orderkey, o_orderdate, o_orderpriority, revenue_cents
        FROM rev ORDER BY revenue_cents DESC, l_orderkey LIMIT 10
    """
    # snowflake rollup (ops/relational.py orders_by_nation): the
    # region<-nation<-customer chain collapses into one broadcast
    out["orders_by_nation"] = """
        SELECT r.r_name AS r_name, n.n_name AS n_name,
               count(*)::BIGINT AS n_orders,
               sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS total_cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
        ORDER BY r_name, n_name
    """
    # greedy-min funnel (ops/windows.py funnel_stages): stage k
    # anchors at its earliest event strictly after stage k-1's anchor
    out["funnel_stages"] = """
        WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
               WHERE e.event_type = 'click' GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
               WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        u AS (SELECT DISTINCT user_id FROM events)
        SELECT u.user_id,
               ((s1.t IS NOT NULL)::INT + (s2.t IS NOT NULL)::INT
                + (s3.t IS NOT NULL)::INT)::BIGINT AS stages_completed
        FROM u LEFT JOIN s1 ON u.user_id = s1.user_id
               LEFT JOIN s2 ON u.user_id = s2.user_id
               LEFT JOIN s3 ON u.user_id = s3.user_id
        ORDER BY u.user_id
    """
    # cohort retention matrix (ops/windows.py retention_cohorts):
    # all-integer (epoch-day seconds, day offsets, user counts)
    out["retention_cohorts"] = """
        WITH d AS (SELECT DISTINCT user_id,
                          epoch(date_trunc('day', ts))::BIGINT AS day_s
                   FROM events),
        f AS (SELECT user_id, min(day_s) AS first_s FROM d GROUP BY user_id)
        SELECT f.first_s AS cohort_day_s,
               (d.day_s - f.first_s) // 86400 AS offset_days,
               count(*)::BIGINT AS n_users
        FROM d JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    # trailing-1h time window (ops/windows.py rolling_time_stats):
    # RANGE peer-group semantics, floor-cents integers
    out["rolling_time_events"] = """
        WITH e AS (SELECT event_id, user_id, ts,
                          floor(value * 100)::BIGINT AS cents FROM events)
        SELECT event_id, user_id,
               count(*) OVER w::BIGINT AS n_window,
               sum(cents) OVER w::BIGINT AS sum_cents
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 3600 SECONDS PRECEDING
                     AND CURRENT ROW)
        ORDER BY event_id
    """
    # exact grouped COUNT(DISTINCT) (ops/windows.py
    # distinct_users_daily): combiner-deduped triples, one shuffle
    out["composite_agg"] = """
        WITH b AS (
          SELECT event_type::VARCHAR AS event_type,
                 user_id::VARCHAR AS user_id,
                 count(*)::BIGINT AS n,
                 sum(CAST(floor(value * 100) AS BIGINT))::BIGINT
                   AS value_cents
          FROM events GROUP BY 1, 2)
        SELECT event_type, user_id, n, value_cents FROM b
        ORDER BY event_type, user_id LIMIT 80
    """
    out["distinct_users_daily"] = """
        SELECT event_type, epoch(date_trunc('day', ts))::BIGINT AS day_s,
               count(DISTINCT user_id)::BIGINT AS n_users
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """
    # HyperLogLog distinct estimate (ops/sketch.py): the SQL twin is
    # generated by the library itself so op and oracle share ONE spec
    from retriv_ray.ops.sketch import approx_distinct_sql

    out["approx_distinct"] = approx_distinct_sql(
        "events", "event_type", "user_id", p=8
    )
    # count-min sketch point counts: SQL twin generated from the same
    # constants as the Ray op (one spec, two engines)
    from retriv_ray.ops.sketch import approx_count_sql

    # flat-JSON field extraction: oracle uses the REAL json parser
    out["parse_json"] = """
        SELECT event_id, json_extract(props, '$.k')::BIGINT AS k
        FROM events ORDER BY event_id
    """
    # calendar date_histogram + ES pipeline aggs via window functions
    out["date_histogram_pipeline"] = """
        WITH h AS (
          SELECT event_type,
                 epoch(date_trunc('week', ts))::BIGINT AS window_start_s,
                 count(*)::BIGINT AS n_events,
                 sum(round(value * 100)::BIGINT)::BIGINT AS value_cents
          FROM events GROUP BY 1, 2)
        SELECT event_type, window_start_s, n_events, value_cents,
               sum(value_cents) OVER w::BIGINT AS cum_cents,
               (value_cents - lag(value_cents) OVER w)::BIGINT AS delta_cents,
               sum(value_cents) OVER (
                 PARTITION BY event_type ORDER BY window_start_s
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)::BIGINT AS moving_cents
        FROM h
        WINDOW w AS (PARTITION BY event_type ORDER BY window_start_s)
        ORDER BY event_type, window_start_s
    """
    # incremental aggregate == from-scratch rebuild
    out["incremental_agg"] = """
        SELECT event_type, count(*)::BIGINT AS n,
               sum(round(value * 100)::BIGINT)::BIGINT AS cents
        FROM events GROUP BY event_type ORDER BY event_type
    """
    # ORC round-trip: the reader must be lossless vs the parquet view
    out["orc_roundtrip"] = """
        SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id
    """
    # top_metrics: per-group row at max sort value, deterministic ties
    out["top_metrics"] = """
        SELECT event_type, ts_us, event_id, cents FROM (
          SELECT event_type, epoch_us(ts)::BIGINT AS ts_us, event_id,
                 round(value * 100)::BIGINT AS cents,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY ts DESC, event_id) AS rn
          FROM events)
        WHERE rn = 1 ORDER BY event_type
    """
    # PSI drift: same smoothing + floor-quantized terms in SQL
    out["population_drift"] = """
        WITH e AS (
          SELECT event_id, round(value * 100)::BIGINT AS cents FROM events),
        h AS (
          SELECT (floor(cents / 2500.0)::BIGINT * 2500) AS bucket,
                 count(*) FILTER (event_id % 2 = 0)::BIGINT AS n_a,
                 count(*) FILTER (event_id % 2 = 1)::BIGINT AS n_b
          FROM e GROUP BY 1),
        t AS (SELECT count(*)::DOUBLE AS k, sum(n_a)::DOUBLE AS ta,
                     sum(n_b)::DOUBLE AS tb FROM h)
        SELECT h.bucket, h.n_a, h.n_b,
               floor(1e9 * ((h.n_a + 0.5) / (t.ta + 0.5 * t.k)
                            - (h.n_b + 0.5) / (t.tb + 0.5 * t.k))
                         * ln(((h.n_a + 0.5) / (t.ta + 0.5 * t.k))
                              / ((h.n_b + 0.5) / (t.tb + 0.5 * t.k))))::BIGINT
                 AS psi_term_e9
        FROM h CROSS JOIN t ORDER BY h.bucket
    """
    # snapshot diff: full outer join over the same derived version
    out["dataset_diff"] = """
        WITH old AS (SELECT doc_id, text FROM documents),
        new AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 0 THEN 'CHANGED' ELSE text END AS text
          FROM documents WHERE doc_id % 17 <> 0
          UNION ALL
          SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 23 = 0)
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.doc_id IS NULL THEN 'added'
                    ELSE 'changed' END AS status
        FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
        WHERE n.doc_id IS NULL OR o.doc_id IS NULL OR o.text <> n.text
        ORDER BY doc_id
    """
    # matrix_stats: integer-exact sufficient statistics per group
    out["corr_stats"] = """
        WITH e AS (
          SELECT event_type,
                 round(value * 100)::BIGINT AS x,
                 json_extract(props, '$.k')::BIGINT AS y
          FROM events)
        SELECT event_type, count(*)::BIGINT AS n,
               sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y,
               sum(x * x)::BIGINT AS sum_xx, sum(y * y)::BIGINT AS sum_yy,
               sum(x * y)::BIGINT AS sum_xy
        FROM e GROUP BY event_type ORDER BY event_type
    """
    # percentile_ranks: exact integer (n_le, n) per probe per group
    out["percentile_ranks"] = """
        WITH e AS (
          SELECT event_type, round(value * 100)::BIGINT AS cents
          FROM events),
        p(probe) AS (VALUES (1000), (5000), (10000), (15000))
        SELECT e.event_type, p.probe::BIGINT AS probe,
               count(*) FILTER (e.cents <= p.probe)::BIGINT AS n_le,
               count(*)::BIGINT AS n
        FROM e CROSS JOIN p
        GROUP BY e.event_type, p.probe
        ORDER BY e.event_type, p.probe
    """
    # phrase suggester: real-bigram candidates, count/distance rank
    out["phrase_suggest"] = f"""
        WITH docs AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks
          FROM documents),
        pos AS (SELECT doc_id, unnest(toks) AS term,
                       unnest(range(len(toks))) AS pos FROM docs),
        bg AS (SELECT a.term AS w1, b.term AS w2
               FROM pos a JOIN pos b
                 ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
        c12 AS (SELECT w1, w2, count(*)::BIGINT AS c12
                FROM bg GROUP BY w1, w2),
        q(q_id, a, b) AS (VALUES ('p1', 'tabl', 'hashh') , ('p2', 'window', 'bach') , ('p3', 'hashh', 'mergee')),
        cand AS (
          SELECT q.q_id, c.w1, c.w2, c.c12,
                 (levenshtein(c.w1, q.a) + levenshtein(c.w2, q.b))::BIGINT
                   AS dist
          FROM q JOIN c12 c
            ON levenshtein(c.w1, q.a) <= 1 AND levenshtein(c.w2, q.b) <= 1)
        SELECT q_id, rank, w1, w2, c12, dist FROM (
          SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY c12 DESC, dist, w1, w2) AS rank
          FROM cand)
        WHERE rank <= 3 ORDER BY q_id, rank
    """
    # filters agg: non-exclusive buckets + _other_
    out["filters_agg"] = f"""
        WITH docs AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks
          FROM documents),
        m AS (SELECT doc_id,
                     list_contains(toks, 'table') AS tbl,
                     list_contains(toks, 'scan') AS scn,
                     list_contains(toks, 'window') AS win
              FROM docs)
        SELECT key, doc_count FROM (
          SELECT '_other_' AS key,
                 count(*) FILTER (NOT (tbl OR scn OR win))::BIGINT AS doc_count
          FROM m
          UNION ALL SELECT 'scn', count(*) FILTER (scn)::BIGINT FROM m
          UNION ALL SELECT 'tbl', count(*) FILTER (tbl)::BIGINT FROM m
          UNION ALL SELECT 'win', count(*) FILTER (win)::BIGINT FROM m)
        ORDER BY key
    """
    # rank_feature: BM25 + boost * x/(x+pivot) static signal
    out["rank_feature_topk"] = f"""
        WITH {_BASE_CTES}, {_QTERMS},
        scores AS (
          SELECT q.q_id, tf.doc_id,
            sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({k1} + 1)
                 / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl)) ) AS score
          FROM qterms q
          JOIN tf ON tf.term = q.term
          JOIN df ON df.term = q.term
          JOIN dl ON dl.doc_id = tf.doc_id
          CROSS JOIN stats s
          GROUP BY q.q_id, tf.doc_id),
        boosted AS (
          SELECT sc.q_id, sc.doc_id,
                 sc.score + 2.0 * (d.n_chars::DOUBLE
                                   / (d.n_chars::DOUBLE + 500.0)) AS score
          FROM scores sc JOIN documents d ON d.doc_id = sc.doc_id)
        SELECT q_id, rank, doc_id FROM (
          SELECT q_id, doc_id,
            row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id)
              AS rank
          FROM boosted)
        WHERE rank <= {CUTOFF} ORDER BY q_id, rank
    """
    # adjacency_matrix: filter and pairwise-intersection doc counts
    out["adjacency_matrix"] = f"""
        WITH docs AS (
          SELECT doc_id, list_filter({_TOKS}, x -> x <> '') AS toks
          FROM documents),
        m AS (SELECT doc_id,
                     list_contains(toks, 'table') AS tbl,
                     list_contains(toks, 'scan') AS scn,
                     list_contains(toks, 'window') AS win
              FROM docs)
        SELECT key, doc_count FROM (
          SELECT 'tbl' AS key, count(*) FILTER (tbl)::BIGINT AS doc_count FROM m
          UNION ALL SELECT 'scn', count(*) FILTER (scn)::BIGINT FROM m
          UNION ALL SELECT 'win', count(*) FILTER (win)::BIGINT FROM m
          UNION ALL SELECT 'scn&tbl', count(*) FILTER (scn AND tbl)::BIGINT FROM m
          UNION ALL SELECT 'scn&win', count(*) FILTER (scn AND win)::BIGINT FROM m
          UNION ALL SELECT 'tbl&win', count(*) FILTER (tbl AND win)::BIGINT FROM m)
        ORDER BY key
    """
    # rare_terms: exact long-tail tokens (total count <= 2)
    out["rare_terms"] = f"""
        WITH {_BASE_CTES}
        SELECT term, count(*)::BIGINT AS n
        FROM toks GROUP BY term HAVING count(*) <= 100 ORDER BY term
    """
    # crosstab: static pivot-value list, conditional counts
    out["pivot_counts"] = """
        SELECT user_id,
               count(*) FILTER (event_type = 'click')::BIGINT AS n_click,
               count(*) FILTER (event_type = 'purchase')::BIGINT AS n_purchase,
               count(*) FILTER (event_type = 'signup')::BIGINT AS n_signup,
               count(*)::BIGINT AS n_total
        FROM events GROUP BY user_id ORDER BY user_id
    """
    # windowed percentiles: composite (key, day) quantile_disc
    out["windowed_percentiles"] = """
        SELECT event_type, epoch(date_trunc('day', ts))::BIGINT AS day_s, 0.5 AS q, quantile_disc(round(value*100)::BIGINT, 0.5)::BIGINT AS value FROM events GROUP BY 1, 2\n          UNION ALL SELECT event_type, epoch(date_trunc('day', ts))::BIGINT AS day_s, 0.875 AS q, quantile_disc(round(value*100)::BIGINT, 0.875)::BIGINT AS value FROM events GROUP BY 1, 2
        ORDER BY event_type, day_s, q
    """
    # ES percentiles agg: per-group exact quantile_disc over cents
    out["group_percentiles"] = """
        SELECT event_type, 0.25 AS q, quantile_disc(round(value*100)::BIGINT, 0.25)::BIGINT AS value FROM events GROUP BY event_type\n          UNION ALL SELECT event_type, 0.5 AS q, quantile_disc(round(value*100)::BIGINT, 0.5)::BIGINT AS value FROM events GROUP BY event_type\n          UNION ALL SELECT event_type, 0.75 AS q, quantile_disc(round(value*100)::BIGINT, 0.75)::BIGINT AS value FROM events GROUP BY event_type\n          UNION ALL SELECT event_type, 0.875 AS q, quantile_disc(round(value*100)::BIGINT, 0.875)::BIGINT AS value FROM events GROUP BY event_type
        ORDER BY event_type, q
    """
    out["approx_count"] = approx_count_sql(
        "events", "user_id",
        [str(u) for u in range(20)] + ["999999999"], d=4, w=64,
    )
    # quantile outlier trim (ops/textstats.py quantile_filter):
    # cutoffs via the exact histogram rank-select, binary-fraction q
    out["quantile_filter"] = """
        SELECT doc_id, n_chars, lang FROM documents
        WHERE n_chars >= (SELECT quantile_disc(n_chars, 0.125) FROM documents)
          AND n_chars <= (SELECT quantile_disc(n_chars, 0.875) FROM documents)
        ORDER BY doc_id
    """
    # distributed anti join (ops/relational.py shuffle_anti_join):
    # right side combiner-deduped to distinct keys before the shuffle
    out["order_priority_join"] = """
        SELECT o.o_orderpriority,
               count(*)::BIGINT AS n_lines,
               sum(round(l.l_extendedprice * 100))::BIGINT AS sum_cents
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE CAST(o.o_orderdate AS VARCHAR) >= '1995-01-01'
          AND CAST(o.o_orderdate AS VARCHAR) < '1996-07-01'
        GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """
    out["customers_without_orders"] = """
        SELECT c_custkey, c_name, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
    """
    # bootstrap rank evaluation: wrap the per-query rank_eval SQL in
    # deterministic md5 resample weights (mean-1 integer surrogate of
    # the multinomial bootstrap; b = 0..19)
    _re_sql = out["rank_eval"].replace("ORDER BY n.q_id", "")
    out["rank_eval_bootstrap"] = f"""
        WITH per AS ({_re_sql}),
        bs(b) AS (SELECT unnest(generate_series(0, 19))),
        w AS (
          SELECT bs.b, per.q_id,
                 (md5_number_lower(per.q_id || '|' || bs.b) % 3)::BIGINT
                   AS wt,
                 per.rr_e6, per.ndcg_e6, per.recall_e6
          FROM per CROSS JOIN bs)
        SELECT b::BIGINT AS b, sum(wt)::BIGINT AS w_n,
               sum(wt * rr_e6)::BIGINT AS w_rr_e6,
               sum(wt * ndcg_e6)::BIGINT AS w_ndcg_e6,
               sum(wt * recall_e6)::BIGINT AS w_recall_e6
        FROM w GROUP BY b ORDER BY b
    """
    return out
