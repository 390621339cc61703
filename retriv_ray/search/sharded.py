"""Per-doc-shard query serving — the 10^9+-doc msearch layout.

The monolithic ``RaySparseRetriever`` loads the whole index into every
scorer; this module implements the sharded layout sketched in
searcher.py's header: scorer actors each own a contiguous run of doc
shards (their segments seg-S-* and doc_lens/shard-S slice only — the
per-doc arrays in one actor are sized to its slice, not the corpus),
queries fan out over all shard actors, and per-shard top-k results
merge exactly. Exactness: BM25/TF-IDF scores are per-doc independent
given the GLOBAL statistics (doc_count, avg_doc_len, per-term df from
the terms table), which every shard view loads — so the global top-k
is contained in the union of per-shard top-k, and the merge re-sorts
with the same deterministic (-score, doc_id) order as the monolithic
kernel (K2/K3), preserving the strict-positive semantics (K1).

Reference parity: result sets equal ``RaySparseRetriever.msearch_ds``
(pinned by tests/test_sharded.py); the reference itself has no sharded
serving (its index is a single in-RAM CSR, build_inverted_index.py).
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from retriv_ray.config import SparseConfig
from retriv_ray.index import manifest as mf


class _ShardScorer:
    """One actor's state: a shard-range-restricted index view, loaded
    once in ``__init__`` (the actor-pool stateful-stage pattern)."""

    def __init__(self, index_dir: str, cfg_json: dict, shard_range):
        from retriv_ray.search.searcher import RaySparseRetriever

        self.r = RaySparseRetriever(
            index_dir, SparseConfig.from_json(cfg_json),
            shard_range=tuple(shard_range),
        )
        self.doc_base = self.r.index.doc_base

    def score(self, ids: List[str], texts: List, cutoff: int):
        """Per-query local top-``cutoff`` over this shard slice.
        ``texts`` entries are plain strings OR reference-style query
        dicts carrying the filter DSL (where / where_not / bare field
        filters) — filters evaluate inside the actor against its
        shard-sliced MetadataIndex (local ids), so filtered serving
        never ships corpus-sized id sets. Returns compact numpy
        columns (q_idx, conv_id, turn_idx, score, global doc_id) —
        the driver-side merge is k × shards × queries rows, never
        corpus-sized."""
        r = self.r
        q_idx: List[np.ndarray] = []
        docs: List[np.ndarray] = []
        scores: List[np.ndarray] = []
        nocut: List[int] = []
        for i, text in enumerate(texts):
            subset = None
            was_dict = isinstance(text, dict)
            if was_dict:
                subset = r.metadata.subset_for_query(text)
                text = text.get("text", "")
            terms = r.query_terms(text or "")
            if not terms:
                if not was_dict:
                    continue
                # reference filters-only semantics: every (filtered)
                # doc with score 1.0 and NO cutoff
                # (advanced_retriever.py:564-570) — flagged so the
                # driver merge skips its rank cutoff for this query
                d = (
                    np.arange(r.index.local_count, dtype=np.int64)
                    if subset is None
                    else np.asarray(subset, dtype=np.int64)
                )
                s = np.ones(len(d), dtype=np.float64)
                nocut.append(i)
            else:
                d, s = r._score(terms, cutoff, subset=subset)
            q_idx.append(np.full(len(d), i, dtype=np.int32))
            docs.append(d)
            scores.append(s.astype(np.float64))
        if not docs:
            e = np.empty(0)
            return (
                e.astype(np.int32), np.empty(0, object),
                e.astype(np.int32), e.astype(np.float64), e.astype(np.int64),
                np.empty(0, np.int32),
            )
        d_local = np.concatenate(docs)
        convs, turns = self.r.index.to_original_ids(d_local)
        return (
            np.concatenate(q_idx),
            convs,
            turns,
            np.concatenate(scores),
            d_local + self.doc_base,
            np.asarray(nocut, dtype=np.int32),
        )


def _merge_chunk(
    ids: Sequence[str],
    cutoff: int,
    results: Sequence[Tuple],
) -> pa.Table:
    """Exact merge of per-shard top-k results for ONE contiguous query
    chunk. ``results`` are :meth:`_ShardScorer.score` tuples whose
    q_idx entries are chunk-local; the output rows are ordered by
    (q_idx, -score, doc_id) with per-query rank <= ``cutoff`` — i.e.
    exactly the slice of the global merge covering this chunk, so
    concatenating chunk tables in chunk order reproduces the
    monolithic ordering bit-for-bit (chunks are contiguous query
    ranges)."""
    parts = []
    nocut: set = set()
    for res in results:
        if len(res[0]) == 0 and len(res[5]) == 0:
            continue
        parts.append(res[:5])
        nocut.update(res[5].tolist())
    if not parts:
        parts = [
            (
                np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int32), np.empty(0, np.float64),
                np.empty(0, np.int64),
            )
        ]
    q_idx = np.concatenate([p[0] for p in parts])
    convs = np.concatenate([p[1] for p in parts])
    turns = np.concatenate([p[2] for p in parts])
    scores = np.concatenate([p[3] for p in parts])
    docs = np.concatenate([p[4] for p in parts])
    # deterministic (q, -score, doc_id) — identical tie-breaks to
    # the monolithic kernel's top-k ordering
    order = np.lexsort((docs, -scores, q_idx))
    q_s, sc_s, dc_s = q_idx[order], scores[order], docs[order]
    cv_s, tn_s = convs[order], turns[order]
    # per-query rank, then keep rank <= cutoff
    if len(q_s):
        brk = np.empty(len(q_s), dtype=bool)
        brk[0] = True
        brk[1:] = q_s[1:] != q_s[:-1]
        group_start = np.maximum.accumulate(
            np.where(brk, np.arange(len(q_s)), 0)
        )
        rank = np.arange(len(q_s)) - group_start + 1
        keep = rank <= cutoff
        if nocut:
            # filters-only queries return ALL their (filtered)
            # docs, per reference semantics — no rank cutoff
            keep |= np.isin(q_s, np.asarray(sorted(nocut)))
    else:
        rank = np.empty(0, dtype=np.int64)
        keep = np.empty(0, dtype=bool)
    id_arr = np.asarray(ids, dtype=object)
    return pa.Table.from_arrays(
        [
            pa.array(id_arr[q_s[keep]], type=pa.string()),
            pa.array(rank[keep].astype(np.int32)),
            pa.array(cv_s[keep], type=pa.string()),
            pa.array(tn_s[keep].astype(np.int32)),
            pa.array(sc_s[keep]),
            pa.array(dc_s[keep]),
        ],
        names=["q_id", "rank", "conv_id", "turn_idx", "score", "doc_id"],
    )


class _ChunkMerger:
    """Reduce-layer actor: merges all shards' results for one query
    chunk off-driver. Ray ships the scorers' output objects straight
    from the scorer workers to this actor (the driver only passes
    ObjectRefs), so per-msearch driver traffic drops from
    shards x queries x k candidate rows to queries x k merged rows."""

    def merge(self, ids: Sequence[str], cutoff: int, *results) -> pa.Table:
        return _merge_chunk(ids, cutoff, results)


class ShardedSearcher:
    """Fan-out/merge msearch over per-doc-shard scorer actors.

    ``shards_per_scorer`` groups contiguous shards per actor (1 = one
    actor per 4M-doc shard at the default ``shard_docs``); at cluster
    scale each actor holds only its slice's doc arrays + segment
    cache, so total serving memory is corpus-proportional across the
    fleet instead of per-replica."""

    def __init__(
        self,
        index_dir: str,
        cfg: Optional[SparseConfig] = None,
        shards_per_scorer: int = 1,
        num_cpus: float = 1,
        num_replicas: int = 1,
        num_mergers: Optional[int] = None,
    ):
        """``num_replicas`` actors per shard group (the production
        shard × replica grid): within a shard, query batches split
        across replicas, so per-shard throughput scales with replicas
        while each replica still holds only its shard slice.

        ``num_mergers`` sizes the reduce layer (default
        ``max(2, num_replicas)``; 0 = merge on the driver, the
        pre-tree fallback). Mergers are stateless, so the pool is
        shared across msearch calls."""
        import ray

        self.index_dir = index_dir
        man = mf.IndexManifest.load(index_dir)
        self.cfg = cfg or SparseConfig.from_json(man.config)
        shards = sorted(
            {
                int(f.split("-")[1])
                for f in os.listdir(os.path.join(index_dir, "segments"))
                if f.endswith(".parquet")
            }
        )
        if not shards:
            raise ValueError(f"no segments under {index_dir}")
        groups = [
            shards[i : i + shards_per_scorer]
            for i in range(0, len(shards), shards_per_scorer)
        ]
        actor = ray.remote(num_cpus=num_cpus)(_ShardScorer)
        cfg_json = self.cfg.to_json()
        self._actors = [
            [
                actor.remote(index_dir, cfg_json, (g[0], g[-1]))
                for _ in range(max(1, num_replicas))
            ]
            for g in groups
        ]
        self.num_scorers = len(self._actors)
        self.num_replicas = max(1, num_replicas)
        if num_mergers is None:
            num_mergers = max(2, self.num_replicas)
        merger = ray.remote(num_cpus=1)(_ChunkMerger)
        self._mergers = [merger.remote() for _ in range(num_mergers)]
        # Persistent actors hold their num_cpus while idle; an
        # over-subscribed fleet never finishes scheduling and msearch
        # blocks forever. Warn loudly up front instead.
        want = self.num_scorers * self.num_replicas * num_cpus + num_mergers
        have = ray.cluster_resources().get("CPU", 0)
        if want > have:
            warnings.warn(
                f"ShardedSearcher requests {want} actor CPUs "
                f"({self.num_scorers} shard groups x {self.num_replicas} "
                f"replicas x {num_cpus} + {num_mergers} mergers) but the "
                f"cluster has {have}; actors will not all schedule and "
                "msearch may block. Release other pools "
                "(RaySparseRetriever.close_pool()) or shrink the grid.",
                stacklevel=2,
            )

    def msearch(
        self,
        queries: Sequence[Dict],
        cutoff: int = 100,
        query_chunks: Optional[int] = None,
    ) -> pa.Table:
        """Same output shape as ``RaySparseRetriever.msearch_ds``
        batches: (q_id, rank, conv_id, turn_idx, score, doc_id).

        Queries split into contiguous chunks (``query_chunks``,
        default one per replica); every shard group scores each chunk
        (on replica ``chunk % num_replicas``) and a reduce actor
        merges that chunk's per-shard top-k — the tree merge. The
        driver only collects the already-cut merged tables; chunk
        contiguity makes their concatenation bit-identical to a
        single global merge."""
        import ray

        ids = [str(q["id"]) for q in queries]
        # queries carrying filter keys ship as dicts (sans id) so each
        # shard actor evaluates the DSL against its local metadata
        texts = [
            {k: v for k, v in q.items() if k != "id"}
            if len(q.keys() - {"id", "text"}) > 0
            else q.get("text", "")
            for q in queries
        ]
        n_chunks = max(1, min(len(queries), query_chunks or self.num_replicas))
        chunk_idx = np.array_split(np.arange(len(queries)), n_chunks)
        merged_futs = []
        driver_chunks: List[Tuple[List[str], List]] = []
        for c, sel in enumerate(chunk_idx):
            if len(sel) == 0:
                continue
            ids_c = [ids[i] for i in sel]
            texts_c = [texts[i] for i in sel]
            score_futs = [
                group[c % self.num_replicas].score.remote(ids_c, texts_c, cutoff)
                for group in self._actors
            ]
            if self._mergers:
                merged_futs.append(
                    self._mergers[c % len(self._mergers)].merge.remote(
                        ids_c, cutoff, *score_futs
                    )
                )
            else:
                driver_chunks.append((ids_c, score_futs))
        if self._mergers:
            tables = ray.get(merged_futs)
        else:
            tables = [
                _merge_chunk(ids_c, cutoff, ray.get(futs))
                for ids_c, futs in driver_chunks
            ]
        if not tables:
            return _merge_chunk([], cutoff, [])
        if len(tables) == 1:
            return tables[0]
        return pa.concat_tables(tables).combine_chunks()

    def close(self) -> None:
        import ray

        for group in self._actors:
            for a in group:
                ray.kill(a)
        self._actors = []
        for m in self._mergers:
            ray.kill(m)
        self._mergers = []
