"""BM25F — weighted multi-field BM25 — as a streaming Dataset op.

Simplified BM25F (Robertson/Zaragoza): per-field term frequencies and
field lengths fold into one weighted pseudo-document BEFORE
saturation —

    wtf(t,d)  = sum_f w_f * tf(t,f,d)
    wdl(d)    = sum_f w_f * len(f,d)
    score(q,d)= sum_t idf(t) * wtf*(k1+1) / (wtf + k1*(1-b+b*wdl/avgwdl))

with doc-level idf (df = docs containing t in ANY field, the same
``ln(1 + (N-df+0.5)/(df+0.5))`` shape as the main BM25 kernel).
Integer field weights keep every aggregate (wtf, wdl, sum-wdl) exact
int64 under any partitioning; floats appear only in the final
per-(query, doc) scoring sum.

Input is a Dataset of (doc_id, field, text) rows — one row per field
per document. Shuffle shape: one streaming tokenize pass per
aggregate with per-batch combiners (the exchange moves (doc, term,
wtf) partials filtered to QUERY terms only, and (doc, wdl) pairs —
never raw tokens), a tag-union-groupby hash join of candidates
against doc lengths (the ops/joins.py side-tagging pattern: one key
shuffle, robust to Ray's empty aggregate blocks), and the existing
combiner-first ``topk_per_group`` for the cutoff. Query-term idfs
travel as a tiny broadcast dict; the driver never holds per-doc
state.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from retriv_ray.ops.prep import topk_per_group


def _flat_tokens(batch: pa.Table, text_col: str):
    """(parent_row_idx, token) for all non-empty whitespace tokens,
    vectorized (no per-row Python split)."""
    col = pc.utf8_trim_whitespace(
        pc.cast(batch.column(text_col), pa.string())
    )
    split = pc.split_pattern_regex(col, r"\s+")
    flat = pc.list_flatten(split).combine_chunks()
    parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return parent[keep], flat.filter(pa.array(keep))


def _row_weights(batch: pa.Table, field_col: str, weights: Dict[str, int]):
    fields = batch.column(field_col).to_pylist()
    try:
        return np.array([weights[f] for f in fields], dtype=np.int64)
    except KeyError as e:
        raise ValueError(f"unknown field {e.args[0]!r} in {field_col}")


def _with_pseudo_field(ds, field_col: str = "field", name: str = "t"):
    """Append a constant pseudo-field column so single-field callers
    (boosting, rank_feature, BM25+) can reuse the BM25F scoring body."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            field_col, pa.array([name] * batch.num_rows, type=pa.string())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def bm25f_scores(
    ds_fields,
    queries: Dict[str, str],
    field_weights: Dict[str, int],
    k1: float = 1.2,
    b: float = 0.75,
    doc_col: str = "doc_id",
    field_col: str = "field",
    text_col: str = "text",
    delta: float = 0.0,
    features: bool = False,
):
    """Full (q_id, doc_id, score) BM25F score Dataset over a
    (doc_id, field, text) dataset — the scoring body shared by
    :func:`bm25f_topk` and :func:`dis_max_topk`. Weights must be
    positive integers (exactness contract above). Collection stats
    (N, avgwdl, df) are computed over the rows given, so restricting
    ``ds_fields`` to ONE field yields that field's own BM25 — exactly
    the per-field subquery statistics Lucene uses. ``delta`` adds the
    BM25+ lower-bound term (Lv & Zhai 2011) to every matching term's
    normalized tf — 0.0 (default) is classic BM25. With
    ``features=True`` the result carries the LTR feature set per
    (q_id, doc): bm25_e4 (per-term contributions floor-quantized
    x1e4 to int64 BEFORE the distributed sum, so the aggregate is an
    order-free integer sum — the repo's integer-only-exchange
    exactness convention), tf_sum, n_matched (distinct matched
    terms) and dl — same pipeline, wider aggregate."""
    from ray.data.aggregate import Sum

    for f, w in field_weights.items():
        if not isinstance(w, (int, np.integer)) or w <= 0:
            raise ValueError(f"field weight {f}={w!r} must be a positive int")
    _sch = ds_fields.schema()  # Ray schema wrapper: .names / .types
    feature_fields = [
        ("tf_sum", pa.int64()),
        ("n_matched", pa.int64()),
        ("dl", pa.int64()),
    ]

    def _empty_scores(doc_type_):
        import ray.data as _rd

        fields = [
            ("q_id", pa.string()),
            (doc_col, doc_type_),
        ] + (
            [("bm25_e4", pa.int64())] + feature_fields
            if features
            else [("score", pa.float64())]
        )
        return _rd.from_arrow(pa.schema(fields).empty_table())

    if _sch is None:  # zero-block input: schema unknowable
        return _empty_scores(pa.int64())
    doc_type = dict(zip(_sch.names, _sch.types))[doc_col]
    qterm_lists = {q: queries[q].split() for q in queries}
    qterms = sorted({t for ts in qterm_lists.values() for t in ts})
    if not qterms:
        raise ValueError("no query terms")
    qterm_arr = pa.array(qterms, type=pa.string())

    # -- weighted doc lengths: (doc_id, wdl) int64, one row per doc --
    def wdl_partial(batch: pa.Table) -> pa.Table:
        parent, _flat = _flat_tokens(batch, text_col)
        w = _row_weights(batch, field_col, field_weights)
        per_row = np.bincount(parent, minlength=batch.num_rows).astype(
            np.int64
        )
        docs = batch.column(doc_col).to_numpy()
        order = np.argsort(docs, kind="stable")
        d_s = docs[order]
        v_s = (per_row * w)[order]
        starts = np.flatnonzero(
            np.concatenate(([True], d_s[1:] != d_s[:-1]))
        )
        sums = np.add.reduceat(v_s, starts) if len(v_s) else v_s
        return pa.Table.from_arrays(
            [pa.array(d_s[starts]), pa.array(sums.astype(np.int64))],
            names=[doc_col, "wdl"],
        )

    wdl_ds = (
        ds_fields.map_batches(wdl_partial, batch_format="pyarrow")
        .groupby(doc_col)
        .aggregate(Sum("wdl", alias_name="wdl"))
        .materialize()  # reused by the stats action AND the join probe
    )
    n_docs = wdl_ds.count()
    if n_docs == 0:
        # empty corpus / field restricted to zero rows: no scores
        # (dis_max over a field no document carries must contribute
        # nothing, not divide by zero) — feature columns included so
        # features-mode callers keep their schema
        return _empty_scores(doc_type)
    sum_wdl = wdl_ds.sum("wdl")
    avgwdl = float(sum_wdl) / float(n_docs)

    # -- weighted tf of QUERY terms: (doc_id, term, wtf) int64 --------
    def tf_partial(batch: pa.Table) -> pa.Table:
        parent, flat = _flat_tokens(batch, text_col)
        mask = pc.is_in(flat, value_set=qterm_arr).to_numpy(
            zero_copy_only=False
        )
        parent = parent[mask]
        if not len(parent):
            return pa.Table.from_arrays(
                [
                    pa.array([], type=batch.schema.field(doc_col).type),
                    pa.array([], type=pa.string()),
                    pa.array([], type=pa.int64()),
                ],
                names=[doc_col, "term", "wtf"],
            )
        terms = flat.filter(pa.array(mask)).dictionary_encode()
        codes = terms.indices.to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        docs = batch.column(doc_col).to_numpy()[parent]
        w = _row_weights(batch, field_col, field_weights)[parent]
        order = np.lexsort((codes, docs))
        d_s, c_s, w_s = docs[order], codes[order], w[order]
        starts = np.flatnonzero(
            np.concatenate(
                ([True], (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1]))
            )
        )
        sums = np.add.reduceat(w_s, starts)
        dict_vals = terms.dictionary
        return pa.Table.from_arrays(
            [
                pa.array(d_s[starts]),
                dict_vals.take(pa.array(c_s[starts])),
                pa.array(sums.astype(np.int64)),
            ],
            names=[doc_col, "term", "wtf"],
        )

    tf_ds = (
        ds_fields.map_batches(tf_partial, batch_format="pyarrow")
        .groupby([doc_col, "term"])
        .aggregate(Sum("wtf", alias_name="wtf"))
        .materialize()  # reused: df gather + scoring probe
    )

    # doc-level df per query term — bounded by |qterms| rows
    idf: Dict[str, float] = {}
    for row in tf_ds.groupby("term").count().take_all():
        df = float(row["count()"])
        idf[row["term"]] = float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))

    # -- score: attach each candidate doc's wdl, expand, sum ---------
    # tag-union-groupby join (the ops/joins.py pattern) rather than
    # the native hash join: one key shuffle, and — unlike the native
    # join operator — indifferent to the zero-column empty blocks
    # Ray's hash aggregate emits for empty partitions
    union_schema = pa.schema(
        [
            (doc_col, doc_type),
            ("term", pa.string()),
            ("x", pa.int64()),
            ("side", pa.int8()),
        ]
    )
    cand_schema = pa.schema(
        [
            (doc_col, doc_type),
            ("term", pa.string()),
            ("wtf", pa.int64()),
            ("wdl", pa.int64()),
        ]
    )

    def tag_tf(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column(doc_col),
                batch.column("term"),
                pc.cast(batch.column("wtf"), pa.int64()),
                pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            ],
            names=union_schema.names,
        )

    def tag_wdl(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column(doc_col),
                pa.nulls(batch.num_rows, type=pa.string()),
                pc.cast(batch.column("wdl"), pa.int64()),
                pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            ],
            names=union_schema.names,
        )

    def attach(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        tf_mask = side == 0
        if not tf_mask.any():
            return cand_schema.empty_table()  # doc without query terms
        wdl_val = int(x[side == 1][0])
        keep = pa.array(np.flatnonzero(tf_mask))
        n = len(keep)
        return pa.Table.from_arrays(
            [
                group.column(doc_col).take(keep),
                group.column("term").take(keep),
                pa.array(x[tf_mask]),
                pa.array(np.full(n, wdl_val, dtype=np.int64)),
            ],
            names=cand_schema.names,
        )

    cand = (
        tf_ds.map_batches(tag_tf, batch_format="pyarrow")
        .union(wdl_ds.map_batches(tag_wdl, batch_format="pyarrow"))
        .groupby(doc_col)
        .map_groups(attach, batch_format="pyarrow")
    )
    term_to_qids: Dict[str, List[str]] = {}
    for q, ts in qterm_lists.items():
        for t in set(ts):
            term_to_qids.setdefault(t, []).append(q)

    def contribs(batch: pa.Table) -> pa.Table:
        docs = batch.column(doc_col).to_numpy()
        wtf = batch.column("wtf").to_numpy().astype(np.float64)
        wdl = batch.column("wdl").to_numpy().astype(np.float64)
        denom_len = k1 * (1.0 - b + b * wdl / avgwdl)
        # delta > 0 = BM25+ (Lv & Zhai 2011): a lower bound on the
        # tf-normalization term so long documents containing a query
        # term are never scored below any document lacking it
        base = wtf * (k1 + 1.0) / (wtf + denom_len) + delta
        term_arr = batch.column("term")
        # expand per (distinct term -> queries containing it): the
        # loop is |qterms| x |queries| wide, the row work is vectorized
        out_q: List[pa.Array] = []
        out_d: List[np.ndarray] = []
        out_c: List[np.ndarray] = []
        out_tf: List[np.ndarray] = []
        out_dl: List[np.ndarray] = []
        wtf_i = batch.column("wtf").to_numpy()
        wdl_i = batch.column("wdl").to_numpy()
        for t, qids in term_to_qids.items():
            mask = pc.equal(term_arr, t).to_numpy(zero_copy_only=False)
            if not mask.any():
                continue
            d_m, c_m = docs[mask], idf[t] * base[mask]
            if features:
                # floor-quantize each per-term contribution to int64
                # BEFORE the sum: the distributed aggregate becomes an
                # order-free integer sum (Ray's reduction order can't
                # flip the hash) — oracle SQL floors per term too
                c_m = np.floor(1e4 * c_m).astype(np.int64)
            for q in qids:
                out_q.append(pa.array([q] * len(d_m), type=pa.string()))
                out_d.append(d_m)
                out_c.append(c_m)
                if features:
                    out_tf.append(wtf_i[mask])
                    out_dl.append(wdl_i[mask])
        names = ["q_id", doc_col, "contrib_e4" if features else "contrib"] + (
            ["tf", "dl"] if features else []
        )
        if not out_d:
            cols = [
                pa.array([], type=pa.string()),
                pa.array([], type=batch.schema.field(doc_col).type),
                pa.array(
                    [], type=pa.int64() if features else pa.float64()
                ),
            ] + ([pa.array([], type=pa.int64())] * 2 if features else [])
            return pa.Table.from_arrays(cols, names=names)
        cols = [
            pa.concat_arrays(out_q),
            pa.array(np.concatenate(out_d)),
            pa.array(np.concatenate(out_c)),
        ]
        if features:
            cols.append(pa.array(np.concatenate(out_tf).astype(np.int64)))
            cols.append(pa.array(np.concatenate(out_dl).astype(np.int64)))
        return pa.Table.from_arrays(cols, names=names)

    contrib_ds = cand.map_batches(contribs, batch_format="pyarrow")
    if not features:
        return contrib_ds.groupby(["q_id", doc_col]).aggregate(
            Sum("contrib", alias_name="score")
        )
    from ray.data.aggregate import Count, Max

    return contrib_ds.groupby(["q_id", doc_col]).aggregate(
        Sum("contrib_e4", alias_name="bm25_e4"),
        Sum("tf", alias_name="tf_sum"),
        Count(alias_name="n_matched"),
        Max("dl", alias_name="dl"),
    )


def bm25f_topk(
    ds_fields,
    queries: Dict[str, str],
    field_weights: Dict[str, int],
    k1: float = 1.2,
    b: float = 0.75,
    cutoff: int = 10,
    doc_col: str = "doc_id",
    field_col: str = "field",
    text_col: str = "text",
):
    """(q_id, rank, doc_id, score) — BM25F top-``cutoff`` per query
    over a (doc_id, field, text) dataset. Weights must be positive
    integers (exactness contract above)."""
    scores = bm25f_scores(
        ds_fields,
        queries,
        field_weights,
        k1=k1,
        b=b,
        doc_col=doc_col,
        field_col=field_col,
        text_col=text_col,
    )
    return topk_per_group(
        scores, k=cutoff, key_col="q_id", score_col="score", id_col=doc_col
    )


def dis_max_topk(
    ds_fields,
    queries: Dict[str, str],
    fields,
    tie_breaker: float = 0.3,
    k1: float = 1.2,
    b: float = 0.75,
    cutoff: int = 10,
    doc_col: str = "doc_id",
    field_col: str = "field",
    text_col: str = "text",
):
    """ES ``dis_max`` / ``multi_match type=best_fields``: each field is
    scored as its OWN BM25 subquery (per-field df, per-field doc count
    and average length — Lucene's per-field statistics, reference
    semantics of the ``dis_max`` compound query), then per (query,
    doc):

        score = best_field + tie_breaker * (sum_of_others)

    Scale plan: one :func:`bm25f_scores` pipeline per field (a small
    fixed list) over a map-side filtered view — each moves only ITS
    field's (doc, query-term) partials; the combine is a single
    groupby((q_id, doc)) of per-field score rows with max/sum
    aggregates, never a per-doc gather. Returns (q_id, rank, doc_id,
    score) top-``cutoff``, ties broken by ascending doc_id."""
    import pyarrow.compute as _pc

    from ray.data.aggregate import Max, Sum as _Sum

    fields = list(fields)
    if not fields:
        raise ValueError("fields must be non-empty")
    per_field = []
    for f in fields:

        def only(batch: pa.Table, _f=f) -> pa.Table:
            return batch.filter(
                _pc.equal(_pc.cast(batch.column(field_col), pa.string()), _f)
            )

        per_field.append(
            bm25f_scores(
                ds_fields.map_batches(only, batch_format="pyarrow"),
                queries,
                {f: 1},
                k1=k1,
                b=b,
                doc_col=doc_col,
                field_col=field_col,
                text_col=text_col,
            )
        )
    allf = per_field[0]
    for other in per_field[1:]:
        allf = allf.union(other)
    agg = allf.groupby(["q_id", doc_col]).aggregate(
        Max("score", alias_name="best"),
        _Sum("score", alias_name="total"),
    )

    def combine(batch: pa.Table) -> pa.Table:
        best = batch.column("best").to_numpy(zero_copy_only=False)
        total = batch.column("total").to_numpy(zero_copy_only=False)
        score = best + tie_breaker * (total - best)
        return pa.Table.from_arrays(
            [
                batch.column("q_id"),
                batch.column(doc_col),
                pa.array(score, type=pa.float64()),
            ],
            names=["q_id", doc_col, "score"],
        )

    scores = agg.map_batches(combine, batch_format="pyarrow")
    return topk_per_group(
        scores, k=cutoff, key_col="q_id", score_col="score", id_col=doc_col
    )


def boosting_topk(
    ds_docs,
    queries: Dict[str, tuple],
    negative_boost: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    cutoff: int = 10,
    doc_col: str = "doc_id",
    text_col: str = "text",
):
    """ES ``boosting`` compound query: documents are scored by the
    POSITIVE query's BM25; any document that also matches the NEGATIVE
    query (contains any of its terms) keeps its position list but has
    its score multiplied by ``negative_boost`` (0 < nb < 1 demotes
    without excluding — the difference from ``must_not``).

    ``queries`` maps q_id -> (positive_text, negative_text).

    Scale plan: one :func:`bm25f_scores` pass for the positive scores
    (single pseudo-field, so plain BM25), one map-side tokenize pass
    filtered to the union of NEGATIVE terms producing distinct
    (q_id, doc_id, flag) rows, then a single groupby((q_id, doc))
    combine of score rows and flag rows — Sum(score) + Max(flag) —
    so the demotion costs one small exchange, never a doc gather.
    Returns (q_id, rank, doc_id, score) top-``cutoff``, ties by
    ascending doc_id."""
    from ray.data.aggregate import Max, Sum

    if not 0 <= negative_boost <= 1:
        raise ValueError("negative_boost must be in [0, 1]")
    pos_q = {q: p for q, (p, _n) in queries.items()}
    neg_terms_by_q = {q: sorted(set(n.split())) for q, (_p, n) in queries.items()}
    all_neg = sorted({t for ts in neg_terms_by_q.values() for t in ts})
    neg_arr = pa.array(all_neg, type=pa.string())
    term_to_qids: Dict[str, List[str]] = {}
    for q, ts in neg_terms_by_q.items():
        for t in ts:
            term_to_qids.setdefault(t, []).append(q)

    pos = bm25f_scores(
        _with_pseudo_field(ds_docs),
        pos_q,
        {"t": 1},
        k1=k1,
        b=b,
        doc_col=doc_col,
        field_col="field",
        text_col=text_col,
    )
    _sch = ds_docs.schema()
    doc_type = dict(zip(_sch.names, _sch.types))[doc_col]
    flag_schema = pa.schema(
        [
            ("q_id", pa.string()),
            (doc_col, doc_type),
            ("score", pa.float64()),
            ("neg", pa.int8()),
        ]
    )

    def neg_flags(batch: pa.Table) -> pa.Table:
        parent, flat = _flat_tokens(batch, text_col)
        mask = pc.is_in(flat, value_set=neg_arr).to_numpy(zero_copy_only=False)
        if not mask.any():
            return flag_schema.empty_table()
        parent = parent[mask]
        terms = flat.filter(pa.array(mask))
        docs = batch.column(doc_col).to_numpy()[parent]
        out_q, out_d = [], []
        for t, qids in term_to_qids.items():
            tmask = pc.equal(terms, t).to_numpy(zero_copy_only=False)
            if not tmask.any():
                continue
            d = np.unique(docs[tmask])
            for q in qids:
                out_q.append(pa.array([q] * len(d), type=pa.string()))
                out_d.append(d)
        if not out_d:
            return flag_schema.empty_table()
        n = sum(len(d) for d in out_d)
        return pa.Table.from_arrays(
            [
                pa.concat_arrays(out_q),
                pa.array(np.concatenate(out_d)),
                pa.array(np.zeros(n, dtype=np.float64)),
                pa.array(np.ones(n, dtype=np.int8)),
            ],
            names=flag_schema.names,
        )

    def tag_pos(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("q_id"),
                batch.column(doc_col),
                pc.cast(batch.column("score"), pa.float64()),
                pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            ],
            names=flag_schema.names,
        )

    unioned = pos.map_batches(tag_pos, batch_format="pyarrow").union(
        ds_docs.map_batches(neg_flags, batch_format="pyarrow")
    )
    agg = unioned.groupby(["q_id", doc_col]).aggregate(
        Sum("score", alias_name="score"),
        Max("neg", alias_name="neg"),
    )

    def combine(batch: pa.Table) -> pa.Table:
        score = batch.column("score").to_numpy(zero_copy_only=False)
        neg = batch.column("neg").to_numpy(zero_copy_only=False)
        out = np.where(neg > 0, score * negative_boost, score)
        keep = score > 0  # flag-only rows (doc matches neg, not pos)
        return pa.Table.from_arrays(
            [
                batch.column("q_id").filter(pa.array(keep)),
                batch.column(doc_col).filter(pa.array(keep)),
                pa.array(out[keep], type=pa.float64()),
            ],
            names=["q_id", doc_col, "score"],
        )

    scores = agg.map_batches(combine, batch_format="pyarrow")
    return topk_per_group(
        scores, k=cutoff, key_col="q_id", score_col="score", id_col=doc_col
    )


def max_passage_topk(
    ds_chunks,
    queries: Dict[str, str],
    k1: float = 1.2,
    b: float = 0.75,
    cutoff: int = 10,
    doc_col: str = "doc_id",
    chunk_col: str = "chunk_idx",
    text_col: str = "chunk",
    chunk_bits: int = 20,
):
    """Max-passage document retrieval (the long-document staple:
    score passages, a document ranks by its BEST passage — the
    BERT-era 'MaxP' aggregation, also ES nested `score_mode: max`):
    BM25 over the chunk corpus (passage-level N/avgdl/df), then per
    (query, doc) the max passage score, ties by ascending doc id.

    Scale plan: passages are independent rows, so scoring reuses the
    full :func:`bm25f_scores` distributed pipeline unchanged (passage
    id = doc_id << chunk_bits | chunk_idx, one int64 — contract:
    chunk_idx < 2^chunk_bits, doc_id < 2^(63-chunk_bits)); the rollup
    is ONE groupby((q_id, doc)).max over candidate scores. Returns
    (q_id, rank, doc_id, score)."""
    from ray.data.aggregate import Max

    mask = (1 << chunk_bits) - 1

    def to_passages(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(doc_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ci = pc.cast(batch.column(chunk_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if len(ci) and (
            ci.min() < 0
            or ids.min() < 0
            or ci.max() > mask
            or ids.max() >= (1 << (63 - chunk_bits))
        ):
            raise ValueError("doc_id/chunk_idx outside the packed passage-id range")
        pid = (ids << chunk_bits) | ci
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                pa.array(pid),
                pa.array(["t"] * n, type=pa.string()),
                pc.cast(batch.column(text_col), pa.string()),
            ],
            names=["pid", "field", "text"],
        )

    passages = ds_chunks.map_batches(to_passages, batch_format="pyarrow")
    scores = bm25f_scores(
        passages,
        queries,
        {"t": 1},
        k1=k1,
        b=b,
        doc_col="pid",
        field_col="field",
        text_col="text",
    )

    def to_doc(batch: pa.Table) -> pa.Table:
        pid = batch.column("pid").to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                batch.column("q_id"),
                pa.array(pid >> chunk_bits),
                pc.cast(batch.column("score"), pa.float64()),
            ],
            names=["q_id", doc_col, "score"],
        )

    doc_scores = (
        scores.map_batches(to_doc, batch_format="pyarrow")
        .groupby(["q_id", doc_col])
        .aggregate(Max("score", alias_name="score"))
    )
    return topk_per_group(
        doc_scores, k=cutoff, key_col="q_id", score_col="score", id_col=doc_col
    )


def rank_feature_topk(
    ds_docs,
    queries: Dict[str, str],
    feature_col: str,
    pivot: float,
    boost: float = 1.0,
    k1: float = 1.2,
    b: float = 0.75,
    cutoff: int = 10,
    doc_col: str = "doc_id",
    text_col: str = "text",
):
    """ES ``rank_feature`` query combined with a text match: final
    score = BM25(text) + boost * saturation(feature) where
    ``saturation(x) = x / (x + pivot)`` (the ES default function) —
    static document-quality signals (pagerank, freshness, length)
    folded into relevance at query time.

    Scale plan: one :func:`bm25f_scores` pass for the text scores;
    the feature column rides a second map-side pass emitting
    (doc, feature) rows for ALL docs, combined with the score rows in
    ONE tag-union groupby(doc) (features attach in-group; docs with
    no text match drop — rank_feature only boosts, it does not
    recall). Returns (q_id, rank, doc_id, score), ties by ascending
    doc_id."""

    pos = bm25f_scores(
        _with_pseudo_field(ds_docs),
        queries,
        {"t": 1},
        k1=k1,
        b=b,
        doc_col=doc_col,
        field_col="field",
        text_col=text_col,
    )
    _sch = ds_docs.schema()
    doc_type = dict(zip(_sch.names, _sch.types))[doc_col]
    union_schema = pa.schema(
        [
            (doc_col, doc_type),
            ("q_id", pa.string()),
            ("x", pa.float64()),
            ("side", pa.int8()),
        ]
    )

    def tag_scores(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column(doc_col),
                batch.column("q_id"),
                pc.cast(batch.column("score"), pa.float64()),
                pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            ],
            names=union_schema.names,
        )

    def tag_features(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column(doc_col),
                pa.nulls(batch.num_rows, type=pa.string()),
                pc.cast(batch.column(feature_col), pa.float64()),
                pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            ],
            names=union_schema.names,
        )

    def combine(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        srows = np.flatnonzero(side == 0)
        frows = np.flatnonzero(side == 1)
        if not len(srows):
            return pa.schema(
                [
                    ("q_id", pa.string()),
                    (doc_col, group.schema.field(doc_col).type),
                    ("score", pa.float64()),
                ]
            ).empty_table()
        feat = float(x[frows[0]]) if len(frows) else 0.0
        sat = feat / (feat + pivot) if feat > 0 else 0.0
        keep = pa.array(srows)
        return pa.Table.from_arrays(
            [
                group.column("q_id").take(keep),
                group.column(doc_col).take(keep),
                pa.array(x[srows] + boost * sat, type=pa.float64()),
            ],
            names=["q_id", doc_col, "score"],
        )

    scores = (
        pos.map_batches(tag_scores, batch_format="pyarrow")
        .union(
            ds_docs.select_columns([doc_col, feature_col]).map_batches(
                tag_features, batch_format="pyarrow"
            )
        )
        .groupby(doc_col)
        .map_groups(combine, batch_format="pyarrow")
    )
    return topk_per_group(
        scores, k=cutoff, key_col="q_id", score_col="score", id_col=doc_col
    )


def ltr_features(
    ds_docs,
    queries: Dict[str, str],
    k1: float = 1.2,
    b: float = 0.75,
    doc_col: str = "doc_id",
    text_col: str = "text",
):
    """Learning-to-rank training-feature extraction: per (q_id, doc)
    candidate, the classic LTR feature vector — bm25_e4 (each
    per-term BM25 contribution floor-quantized x1e4 to int64, then
    summed, so the distributed aggregate is an order-free integer
    sum and the output is run-to-run deterministic under any block
    partitioning), tf_sum (total matched-term frequency), n_matched
    (distinct query terms present) and dl (doc length) — the offline
    feature-dump every LTR pipeline (ES LTR plugin, Solr LTR) starts
    from.

    Same distributed pipeline as BM25 scoring (one wider aggregate);
    returns a Dataset sorted by (q_id, doc)."""
    import pyarrow.compute as _pc

    feats = bm25f_scores(
        _with_pseudo_field(ds_docs),
        queries,
        {"t": 1},
        k1=k1,
        b=b,
        doc_col=doc_col,
        field_col="field",
        text_col=text_col,
        features=True,
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                batch.column("q_id"),
                batch.column(doc_col),
                _pc.cast(batch.column("bm25_e4"), pa.int64()),
                _pc.cast(batch.column("tf_sum"), pa.int64()),
                _pc.cast(batch.column("n_matched"), pa.int64()),
                _pc.cast(batch.column("dl"), pa.int64()),
            ],
            names=["q_id", doc_col, "bm25_e4", "tf_sum", "n_matched", "dl"],
        )

    return feats.map_batches(finish, batch_format="pyarrow").sort(
        ["q_id", doc_col]
    )
