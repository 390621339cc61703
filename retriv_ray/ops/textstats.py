"""Text-analysis operators for training-data pipelines.

Per-batch map operators (no shuffle except the final aggregates);
outputs are integer-exact where they feed a SQL oracle.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# deterministic marker sets for the language-ID heuristic (argmax of
# marker hits; ties -> lexicographically smallest language code). The
# sets intentionally include very common tokens so the heuristic is
# exercised on any corpus.
LANG_MARKERS: Dict[str, List[str]] = {
    "de": ["der", "die", "und", "nicht", "das", "ist"],
    "en": ["the", "and", "of", "to", "is", "a"],
    "es": ["el", "la", "los", "que", "y", "de"],
    "fr": ["le", "la", "les", "et", "est", "une"],
}

# a BPE-ish token splitter: words / numbers / single punctuation
BPE_RE = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]")

_STOP = frozenset(
    "the a an and or of to in is it that this for on with as at by be are".split()
)


def quality_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, n_tokens, n_unique, longest_token_len, stop_hits) —
    integer-exact quality signals (length, repetition, stopword
    density numerator)."""

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n_tok = np.empty(len(texts), dtype=np.int64)
        n_uni = np.empty(len(texts), dtype=np.int64)
        longest = np.empty(len(texts), dtype=np.int64)
        stop_hits = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            n_tok[i] = len(toks)
            n_uni[i] = len(set(toks))
            longest[i] = max((len(w) for w in toks), default=0)
            stop_hits[i] = sum(1 for w in toks if w in _STOP)
        return pa.Table.from_arrays(
            [
                batch.column(id_col),
                pa.array(n_tok),
                pa.array(n_uni),
                pa.array(longest),
                pa.array(stop_hits),
            ],
            names=[id_col, "n_tokens", "n_unique", "longest_token_len", "stop_hits"],
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def token_counts_by(ds, group_col: str, text_col: str = "text"):
    """Tokens + docs per group: pre-aggregated inside map_batches (one
    row per group per batch), then a tiny groupby — the
    combiner-before-shuffle pattern."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # token count per row == number of \S+ runs in RE2 semantics
        # (fully pyarrow.compute, no row loop). NOTE: RE2's \s is
        # [ \t\n\r\f] — it excludes \x0b and Unicode whitespace — so
        # on text containing those, counts diverge from the
        # str.split()-based ops (quality_stats, chunk_documents,
        # pack_token_stream). RE2 is kept here because it is the
        # exact dialect DuckDB shares, making the op SQL-checkable.
        ntok = pc.cast(
            pc.fill_null(
                pc.count_substring_regex(batch.column(text_col), r"\S+"), 0
            ),
            pa.int64(),
        )
        t = pa.Table.from_arrays(
            [batch.column(group_col), ntok], names=[group_col, "tok"]
        )
        g = pa.TableGroupBy(t, group_col).aggregate(
            [("tok", "sum"), ("tok", "count")]
        )
        return g.rename_columns([group_col, "tok", "doc"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("tok"), Sum("doc"))
    )
    return out.rename_columns(
        {"sum(tok)": "total_tokens", "sum(doc)": "n_docs"}
    )


def language_id(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Marker-word language heuristic: pred = argmax_lang |tokens ∩
    markers(lang)| counted WITH multiplicity; all-zero -> 'und'; ties
    -> smallest code. Deterministic and SQL-expressible."""
    langs = sorted(LANG_MARKERS)
    marker_sets = {l: frozenset(LANG_MARKERS[l]) for l in langs}

    def lid(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        preds = []
        for t in texts:
            toks = (t or "").split()
            best, best_n = "und", 0
            for l in langs:
                m = marker_sets[l]
                n = sum(1 for w in toks if w in m)
                if n > best_n:
                    best, best_n = l, n
            preds.append(best)
        return pa.Table.from_arrays(
            [batch.column(id_col), pa.array(preds, type=pa.string())],
            names=[id_col, "pred_lang"],
        )

    return ds.map_batches(lid, batch_format="pyarrow")


def bpe_token_count(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Token counts under the BPE-ish regex (words|numbers|punct) —
    the 'how many LLM tokens is this corpus' estimator."""

    def cnt(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n = np.fromiter(
            (len(BPE_RE.findall(t or "")) for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        return pa.Table.from_arrays(
            [batch.column(id_col), pa.array(n)], names=[id_col, "bpe_tokens"]
        )

    return ds.map_batches(cnt, batch_format="pyarrow")


def doc_fingerprint(
    ds,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Winnowing-style fingerprint: polynomial rolling hash (base
    1000003 mod 2^61-1) over the token stream, windowed minimum ->
    (id, fingerprint int64, n_grams). Deterministic; docs sharing a
    fingerprint share at least one ``window``-gram. Token hashes are
    md5 low 8 bytes (= DuckDB ``md5_number_lower``) so the whole
    fingerprint is reproducible by a SQL oracle."""
    P = np.uint64((1 << 61) - 1)
    BASE = np.uint64(1000003)

    def fp(batch: pa.Table) -> pa.Table:
        from retriv_ray.ops.dedup import _md5_low64_many

        texts = batch.column(text_col).to_pylist()
        fps = np.empty(len(texts), dtype=np.int64)
        n_grams = np.empty(len(texts), dtype=np.int64)
        p, base = int(P), int(BASE)
        top = pow(base, window, p)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if len(toks) < window:
                fps[i] = 0
                n_grams[i] = 0
                continue
            # one md5 per distinct token (memoized in dedup) instead of
            # one hashlib call per occurrence; % p on the uint64 array
            vals = (_md5_low64_many(toks) % np.uint64(p)).tolist()
            h = 0
            best = p
            count = 0
            for j, x in enumerate(vals):
                h = (h * base + x) % p
                if j >= window:
                    h = (h - vals[j - window] * top) % p
                if j >= window - 1:
                    count += 1
                    if h < best:
                        best = h
            fps[i] = best
            n_grams[i] = count
        return pa.Table.from_arrays(
            [batch.column(id_col), pa.array(fps), pa.array(n_grams)],
            names=[id_col, "fingerprint", "n_grams"],
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Intra-document repetition signals (the Gopher/RefinedWeb-style
    quality rules): per doc, the count of whitespace 2-grams/3-grams
    and how many of them are duplicates (count minus distinct).
    Integer-exact, so the SQL oracle (list_transform + list_distinct
    over the same token split) reproduces every value. Per-batch map,
    no shuffle — holds at 100 TB."""

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n2 = np.empty(len(texts), dtype=np.int64)
        d2 = np.empty(len(texts), dtype=np.int64)
        n3 = np.empty(len(texts), dtype=np.int64)
        d3 = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            L = len(toks)
            if L >= 2:
                g2 = [" ".join(toks[j : j + 2]) for j in range(L - 1)]
                n2[i] = len(g2)
                d2[i] = len(g2) - len(set(g2))
            else:
                n2[i] = d2[i] = 0
            if L >= 3:
                g3 = [" ".join(toks[j : j + 3]) for j in range(L - 2)]
                n3[i] = len(g3)
                d3[i] = len(g3) - len(set(g3))
            else:
                n3[i] = d3[i] = 0
        return pa.Table.from_arrays(
            [
                batch.column(id_col),
                pa.array(n2),
                pa.array(d2),
                pa.array(n3),
                pa.array(d3),
            ],
            names=[id_col, "n_2grams", "dup_2grams", "n_3grams", "dup_3grams"],
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def top_ngrams(ds, n: int = 2, k: int = 20, text_col: str = "text"):
    """Corpus-wide top-k n-grams — the classic MapReduce word count
    with a combiner: each batch emits one (gram, cnt) row per distinct
    gram (Counter combiner), the groupby shuffle moves only those
    partials, and after the global sum each output block keeps its
    local top-k (exact: post-groupby every gram appears exactly once),
    so the driver merges at most k rows per block. Deterministic
    order: (cnt DESC, gram ASC) — the SQL oracle's ORDER BY."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            toks = (t or "").split()
            for j in range(len(toks) - n + 1):
                c[" ".join(toks[j : j + n])] += 1
        return pa.Table.from_arrays(
            [
                pa.array(list(c.keys()), type=pa.string()),
                pa.array(list(c.values()), type=pa.int64()),
            ],
            names=["gram", "cnt"],
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = np.lexsort(
            (
                np.asarray(batch.column("gram").to_pylist(), dtype=object),
                -batch.column("cnt").to_numpy(),
            )
        )[:k]
        return batch.take(np.sort(idx))

    parts = agg.map_batches(local_topk, batch_format="pyarrow").take_all()
    grams = np.asarray([r["gram"] for r in parts], dtype=object)
    cnts = np.asarray([r["cnt"] for r in parts], dtype=np.int64)
    order = np.lexsort((grams, -cnts))[:k]
    return pa.Table.from_arrays(
        [pa.array(grams[order], type=pa.string()), pa.array(cnts[order])],
        names=["gram", "cnt"],
    )


def contamination_check(
    ds,
    benchmark_grams,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Benchmark decontamination (the GPT-3/PaLM-style n-gram collision
    check): per document, the number of whitespace ``n``-gram positions
    and how many of them collide with ``benchmark_grams`` (an iterable
    of n-gram strings from the held-out eval sets). Documents with
    fewer than ``n`` tokens emit no row (they cannot collide).

    Scale: the benchmark set is the SMALL side — it is ``ray.put``
    once and read per worker from the object store (never re-shipped
    per batch, never a shuffle); the documents stream through one
    map_batches. Integer-exact, so the SQL oracle reproduces every
    value."""
    import ray

    bench_ref = ray.put(frozenset(benchmark_grams))

    def check(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = batch.column(id_col)
        texts = batch.column(text_col).to_pylist()
        out_id, out_n, out_hit = [], [], []
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if len(toks) < n:
                continue
            grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
            out_id.append(ids[i].as_py())
            out_n.append(len(grams))
            out_hit.append(sum(1 for g in grams if g in bench))
        return pa.Table.from_arrays(
            [
                pa.array(out_id, type=ids.type),
                pa.array(out_n, type=pa.int64()),
                pa.array(out_hit, type=pa.int64()),
            ],
            names=[id_col, "n_grams", "n_contaminated"],
        )

    return ds.map_batches(check, batch_format="pyarrow")


def token_rarity(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document corpus-frequency stats of its tokens — the
    unigram-LM quality signal, kept integer-exact so the SQL oracle
    pins every value: (doc_id, n_tokens, sum_cnt, min_cnt) where cnt
    is each token's corpus-wide occurrence count, summed per token
    POSITION (sum over distinct tokens of tf * cnt). A mean corpus
    log-probability is a trivial client-side map of these integers.
    Documents with zero tokens emit no row.

    Scale plan (no vocabulary broadcast — the 10^9-term path):
    pass 1 is the word-count shuffle with a per-batch Counter combiner;
    pass 2 re-emits per-doc (token, tf) partials and co-groups them
    with the counts by token (union + groupby — a hash join), then a
    doc-keyed aggregate produces the three stats."""
    from collections import Counter

    from ray.data.aggregate import Min, Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update((t or "").split())
        return pa.Table.from_arrays(
            [
                pa.array(list(c.keys()), type=pa.string()),
                pa.array(list(c.values()), type=pa.int64()),
            ],
            names=["tok", "v"],
        )

    def doc_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        out_t, out_d, out_tf = [], [], []
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            c = Counter((t or "").split())
            out_t.extend(c.keys())
            out_d.extend([int(ids[i])] * len(c))
            out_tf.extend(c.values())
        return pa.Table.from_arrays(
            [
                pa.array(out_t, type=pa.string()),
                pa.array(out_d, type=pa.int64()),
                pa.array(out_tf, type=pa.int64()),
            ],
            names=["tok", id_col, "v"],
        )

    counts = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("v", alias_name="cnt"))
    )

    def attach_cnt(group: pa.Table) -> pa.Table:
        # one co-group per token: the count row (id = -1) carries the
        # global cnt; every doc row contributes (doc, tf, tf*cnt, cnt)
        ids = group.column(id_col).to_numpy()
        vs = group.column("v").to_numpy()
        is_cnt = ids == -1
        cnt = int(vs[is_cnt].sum())
        d, tf = ids[~is_cnt], vs[~is_cnt]
        return pa.Table.from_arrays(
            [
                pa.array(d),
                pa.array(tf),
                pa.array(tf * cnt),
                pa.array(np.full(len(d), cnt, dtype=np.int64)),
            ],
            names=[id_col, "tf", "tfcnt", "cnt"],
        )

    tagged_counts = counts.map_batches(
        lambda t: pa.Table.from_arrays(
            [
                t.column("tok"),
                pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                t.column("cnt"),
            ],
            names=["tok", id_col, "v"],
        ),
        batch_format="pyarrow",
    )
    joined = (
        ds.map_batches(doc_partial, batch_format="pyarrow")
        .union(tagged_counts)
        .groupby("tok")
        .map_groups(attach_cnt, batch_format="pyarrow")
    )
    return joined.groupby(id_col).aggregate(
        Sum("tf", alias_name="n_tokens"),
        Sum("tfcnt", alias_name="sum_cnt"),
        Min("cnt", alias_name="min_cnt"),
    )


def bigram_lm_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document corpus bigram-LM log-probability — the CCNet-style
    LM quality signal one level up from :func:`token_rarity`'s
    unigrams: (doc_id, n_bigrams, sum_logp_e4) where each bigram
    position (w1, w2) contributes ``floor(1e4 * ln(c12 / c1x))`` with
    c12 = corpus count of the bigram and c1x = corpus count of
    bigrams starting with w1 (a properly normalized conditional,
    sum_w2 P(w2|w1) = 1). Quantizing BEFORE the per-doc sum keeps
    every emitted value integer-exact under any partitioning; mean
    log-prob / perplexity are client-side maps of the two integers.
    Docs with fewer than 2 tokens emit no row.

    Scale plan (no vocabulary broadcast): pass 1 Counter-combiner
    bigram counts + a tiny first-token rollup; pass 2 re-emits
    per-doc (bigram, tf) partials and hash-joins counts back via two
    co-groups (bigram-keyed, then first-token-keyed); final doc-keyed
    aggregate. Same shuffle family as token_rarity / pmi_collocations
    (ln-quantization parity with DuckDB proven by the PMI oracle)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    SEP = "\x1f"  # token strings are whitespace-split, so \x1f is safe

    def bigrams(toks):
        return (
            SEP.join(p) for p in zip(toks, toks[1:])
        )

    def count_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update(bigrams((t or "").split()))
        return pa.Table.from_arrays(
            [
                pa.array(list(c.keys()), type=pa.string()),
                pa.array(list(c.values()), type=pa.int64()),
            ],
            names=["bg", "v"],
        )

    c12 = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("bg")
        .aggregate(Sum("v", alias_name="c12"))
    )

    def first_tok(batch: pa.Table) -> pa.Table:
        w1 = pc.split_pattern(
            pc.cast(batch.column("bg"), pa.string()), SEP
        )
        return pa.Table.from_arrays(
            [pc.list_element(w1, 0), batch.column("c12")],
            names=["w1", "v"],
        )

    c1 = (
        c12.map_batches(first_tok, batch_format="pyarrow")
        .groupby("w1")
        .aggregate(Sum("v", alias_name="c1x"))
    )

    def doc_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        out_b, out_d, out_tf = [], [], []
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            c = Counter(bigrams((t or "").split()))
            out_b.extend(c.keys())
            out_d.extend([int(ids[i])] * len(c))
            out_tf.extend(c.values())
        return pa.Table.from_arrays(
            [
                pa.array(out_b, type=pa.string()),
                pa.array(np.asarray(out_d, dtype=np.int64)),
                pa.array(np.asarray(out_tf, dtype=np.int64)),
            ],
            names=["bg", id_col, "v"],
        )

    def attach_c12(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy()
        vs = group.column("v").to_numpy()
        is_cnt = ids == -1
        cnt = int(vs[is_cnt].sum())
        keep = ~is_cnt
        bg = group.column("bg")[0].as_py()
        w1 = bg.split(SEP, 1)[0]
        n = int(keep.sum())
        return pa.Table.from_arrays(
            [
                pa.array([w1] * n, type=pa.string()),
                pa.array(ids[keep]),
                pa.array(vs[keep]),
                pa.array(np.full(n, cnt, dtype=np.int64)),
            ],
            names=["w1", id_col, "tf", "c12"],
        )

    tagged_c12 = c12.map_batches(
        lambda t: pa.Table.from_arrays(
            [
                t.column("bg"),
                pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                t.column("c12"),
            ],
            names=["bg", id_col, "v"],
        ),
        batch_format="pyarrow",
    )
    with_c12 = (
        ds.map_batches(doc_partial, batch_format="pyarrow")
        .union(tagged_c12)
        .groupby("bg")
        .map_groups(attach_c12, batch_format="pyarrow")
    )

    def attach_c1x(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy()
        is_cnt = ids == -1
        c1x = int(group.column("tf").to_numpy()[is_cnt].sum())
        keep = ~is_cnt
        tf = group.column("tf").to_numpy()[keep]
        cc = group.column("c12").to_numpy()[keep]
        lp = np.floor(
            1e4 * np.log(cc.astype(np.float64) / float(c1x))
        ).astype(np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(ids[keep]),
                pa.array(tf),
                pa.array(tf * lp),
            ],
            names=[id_col, "tf", "tflp"],
        )

    tagged_c1 = c1.map_batches(
        lambda t: pa.Table.from_arrays(
            [
                t.column("w1"),
                pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                t.column("c1x"),
                pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            ],
            names=["w1", id_col, "tf", "c12"],
        ),
        batch_format="pyarrow",
    )
    scored = (
        with_c12.union(tagged_c1)
        .groupby("w1")
        .map_groups(attach_c1x, batch_format="pyarrow")
    )
    return scored.groupby(id_col).aggregate(
        Sum("tf", alias_name="n_bigrams"),
        Sum("tflp", alias_name="sum_logp_e4"),
    )


def length_quantiles(
    ds,
    col: str = "n_chars",
    qs=(0.25, 0.5, 0.75, 0.875, 0.96875),
):
    """EXACT quantiles of an integer column via a value histogram:
    ``groupby(col).count()`` shuffles only (distinct_value, count)
    pairs — never the rows — and the quantile selection runs over the
    sorted histogram, whose size is bounded by the column's distinct
    cardinality (document lengths: thousands of values at any corpus
    size; this is the scale path — a rank-select over 10^12 rows
    costs one combiner-friendly groupby). For unbounded-cardinality
    columns use a bucketed two-pass instead.

    Matches DuckDB ``quantile_disc``: index = max(0, ceil(q*n) - 1)
    over the ascending values. The default ``qs`` are binary
    fractions (k/2^m), so ``q*n`` is EXACT in IEEE double on both
    sides of the comparison — no float-boundary off-by-one against
    the SQL oracle.

    Returns a pyarrow Table ``(q: double, value: int64)``.
    """
    import math

    hist = ds.groupby(col).count()
    rows = hist.sort(col).take_all()  # bounded by distinct values
    values = [r[col] for r in rows]
    counts = [r["count()"] for r in rows]
    n = sum(counts)
    out_q, out_v = [], []
    for q in qs:
        idx = max(0, math.ceil(q * n) - 1)
        cum = 0
        val = values[-1] if values else None
        for v, c in zip(values, counts):
            cum += c
            if cum > idx:
                val = v
                break
        out_q.append(float(q))
        out_v.append(val)
    return pa.Table.from_arrays(
        [pa.array(out_q, type=pa.float64()),
         pa.array(out_v, type=pa.int64())],
        names=["q", "value"],
    )


def group_percentiles(
    ds,
    group_col,
    value_col: str,
    qs=(0.25, 0.5, 0.75, 0.875),
):
    """ES ``percentiles`` aggregation (per-group EXACT quantiles of an
    integer column), reference semantics from the ``aggs: {percentiles}``
    surface of search engines; quantile math matches DuckDB
    ``quantile_disc`` exactly; ``group_col`` may be one column or a
    list (composite keys — e.g. (service, day) for windowed latency
    percentiles) (index = max(0, ceil(q*n) - 1) over the
    ascending values; default ``qs`` are binary fractions so q*n is
    exact in IEEE double on both engines).

    Scale plan (the per-group twin of :func:`length_quantiles`): ONE
    ``groupby((group, value)).count()`` moves only (group, distinct
    value, count) triples — never the rows — then
    ``groupby(group).map_groups`` rank-selects inside each group, so
    the selection is distributed across groups and no histogram ever
    lands on the driver. Each group's state is bounded by its distinct
    value count (for quantized metrics like integer cents: thousands,
    at any corpus size).

    Returns a Dataset (group, q: double, value: int64) sorted by
    (group, q).
    """
    import math

    group_cols = [group_col] if isinstance(group_col, str) else list(group_col)
    hist = ds.groupby(group_cols + [value_col]).count()
    qs = [float(q) for q in qs]

    def select(group: pa.Table) -> pa.Table:
        vals = group.column(value_col).to_numpy(zero_copy_only=False)
        cnts = group.column("count()").to_numpy(zero_copy_only=False)
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        idx = np.array(
            [max(0, math.ceil(q * n) - 1) for q in qs], dtype=np.int64
        )
        pos = np.searchsorted(cum, idx, side="right")
        cols = []
        for g in group_cols:
            key = group.column(g)[0]
            cols.append(
                pa.array(
                    [key.as_py()] * len(qs), type=group.schema.field(g).type
                )
            )
        cols.append(pa.array(qs, type=pa.float64()))
        cols.append(pa.array(vals[pos].astype(np.int64), type=pa.int64()))
        return pa.Table.from_arrays(cols, names=group_cols + ["q", "value"])

    return (
        hist.groupby(group_cols)
        .map_groups(select, batch_format="pyarrow")
        .sort(group_cols + ["q"])
    )


def tfidf_keywords(
    ds,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: Optional[int] = None,
):
    """Per-document keyword extraction: the top-``k`` whitespace
    tokens by TF-IDF, ``score = tf * ln(N / df)`` with ``df`` = number
    of documents containing the token and ``N`` = total document
    count. Returns (doc_id, rank, term, tf, df, score_e4) where
    ``score_e4 = floor(10000 * score)`` — the score is quantized to an
    integer so the SQL oracle hash-checks ranking AND values without
    float-formatting ambiguity (exact real-value score ties, e.g.
    ``2*ln(N/df) == ln(N/df**2 * N)`` families, land on the same
    integer regardless of last-ulp libm differences; ordering is
    (score_e4 DESC, term ASC), fully integer-deterministic).
    Zero-token documents emit no rows.

    Scale plan: one tokenize map emits per-doc distinct (token,
    doc_id, tf) rows (per-doc Counter — tf is exact, one row per
    distinct term per doc); ONE hash shuffle groups them by token,
    and ``df`` is just the group size, so the idf attaches in-group
    with no vocabulary broadcast and no second pass (cf.
    ``token_rarity``); a second hash shuffle groups the scored rows
    by document for the vectorized local top-k. Hot-token groups are
    the known skew (df can approach N for stopword-like tokens): at
    the 100-TB target pre-drop tokens whose partial-df bound exceeds
    ``max_df`` — they rank near zero anyway (idf <= ln(1/frac)) —
    the same cap strategy as ``ngram_jaccard_pairs``'s
    ``max_shingle_df``.
    """
    from collections import Counter

    N = int(n_docs if n_docs is not None else ds.count())
    lnN = float(np.log(N))  # noqa: F841  (documented: idf = ln(N/df))

    def doc_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        out_t: list = []
        out_d: list = []
        out_tf: list = []
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            c = Counter((t or "").split())
            out_t.extend(c.keys())
            out_d.extend([int(ids[i])] * len(c))
            out_tf.extend(c.values())
        return pa.Table.from_arrays(
            [
                pa.array(out_t, type=pa.string()),
                pa.array(out_d, type=pa.int64()),
                pa.array(out_tf, type=pa.int64()),
            ],
            names=["term", id_col, "tf"],
        )

    def attach_df(group: pa.Table) -> pa.Table:
        # df = number of docs containing this token = group size
        # (doc_partial emits one row per distinct (term, doc))
        n = group.num_rows
        return group.append_column(
            "df", pa.array(np.full(n, n, dtype=np.int64))
        )

    def local_topk(group: pa.Table) -> pa.Table:
        tf = group.column("tf").to_numpy().astype(np.float64)
        df = group.column("df").to_numpy().astype(np.float64)
        score_e4 = np.floor(10000.0 * tf * np.log(N / df)).astype(np.int64)
        terms = np.asarray(group.column("term").to_pylist(), dtype=object)
        order = np.lexsort((terms, -score_e4))[:k]
        n = len(order)
        return pa.Table.from_arrays(
            [
                group.column(id_col).take(order),
                pa.array(np.arange(1, n + 1, dtype=np.int64)),
                pa.array(terms[order], type=pa.string()),
                group.column("tf").take(order),
                group.column("df").take(order),
                pa.array(score_e4[order]),
            ],
            names=[id_col, "rank", "term", "tf", "df", "score_e4"],
        )

    return (
        ds.map_batches(doc_partial, batch_format="pyarrow")
        .groupby("term")
        .map_groups(attach_df, batch_format="pyarrow")
        .groupby(id_col)
        .map_groups(local_topk, batch_format="pyarrow")
    )


def gopher_filter(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 10_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_stop_hits: int = 2,
    max_dup_3gram_x20: int = 1,
):
    """Gopher/C4-style composite quality filter: keep a document iff
    ALL rules hold —

    - ``min_tokens <= n_tokens <= max_tokens``
    - mean word length in [min, max], tested as the integer
      cross-multiplication ``min*n <= sum_len`` and
      ``sum_len <= max*n`` (no float division anywhere)
    - at least ``min_stop_hits`` common-stopword occurrences
      (the C4 "real prose" rule)
    - duplicate-3-gram fraction <= max_dup_3gram_x20/20
      (default 1/20 = 5%), tested as ``20*dup3 <= x20*n3``

    Returns kept (doc_id, n_tokens). All rules are integer-exact, so
    the SQL oracle reproduces the kept set verbatim. ONE per-batch
    map, zero shuffle — the filter is embarrassingly parallel at any
    corpus size; feed its output to ``dedup_filter``-style anti-joins
    to materialize the cleaned corpus.
    """

    def keep(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ok = np.zeros(len(texts), dtype=bool)
        n_tok = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            n = len(toks)
            n_tok[i] = n
            if n < min_tokens or n > max_tokens:
                continue
            sum_len = sum(len(w) for w in toks)
            if sum_len < min_mean_word_len * n or sum_len > max_mean_word_len * n:
                continue
            stop_hits = sum(1 for w in toks if w in _STOP)
            if stop_hits < min_stop_hits:
                continue
            if n >= 3:
                g3 = [" ".join(toks[j : j + 3]) for j in range(n - 2)]
                n3 = len(g3)
                d3 = n3 - len(set(g3))
                if 20 * d3 > max_dup_3gram_x20 * n3:
                    continue
            ok[i] = True
        sel = pa.array(np.flatnonzero(ok), type=pa.int64())
        return pa.Table.from_arrays(
            [
                batch.column(id_col).take(sel),
                pa.array(n_tok[np.flatnonzero(ok)]),
            ],
            names=[id_col, "n_tokens"],
        )

    return ds.map_batches(keep, batch_format="pyarrow")


def pmi_collocations(
    ds,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
):
    """Corpus-wide top-``k`` bigram collocations by pointwise mutual
    information: ``pmi = ln((cxy/N2) / ((cx/N1)*(cy/N1)))`` with
    position counts (N1 = total tokens, N2 = total bigrams), quantized
    to ``pmi_e4 = floor(10000 * pmi)`` — equal count-tuples give
    bit-identical doubles on both engines, so ordering
    (pmi_e4 DESC, gram ASC) is deterministic against the SQL oracle.
    Returns (gram, cnt, pmi_e4), cnt >= min_count.

    Scale plan: unigram and bigram Counter-combiner counts (the
    word-count shape — shuffles move one row per distinct gram per
    batch); ``cx``/``cy`` attach via two count-keyed co-group joins
    (union + groupby, as in ``token_rarity`` — no vocabulary
    broadcast); the ``min_count`` filter runs BEFORE the joins so rare
    bigrams (the Zipf tail, most of the volume) never shuffle twice;
    the final top-k is a per-block partial followed by one tiny
    reduce. Driver holds scalars (N1, N2) and k rows.
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    def uni_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update((t or "").split())
        return pa.Table.from_arrays(
            [
                pa.array(list(c.keys()), type=pa.string()),
                pa.array(list(c.values()), type=pa.int64()),
            ],
            names=["w", "c"],
        )

    def bi_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            toks = (t or "").split()
            for j in range(len(toks) - 1):
                c[(toks[j], toks[j + 1])] += 1
        xs = [x for x, _ in c.keys()]
        ys = [y for _, y in c.keys()]
        return pa.Table.from_arrays(
            [
                pa.array(xs, type=pa.string()),
                pa.array(ys, type=pa.string()),
                pa.array(list(c.values()), type=pa.int64()),
            ],
            names=["x", "y", "cxy"],
        )

    uni = (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )
    bi = (
        ds.map_batches(bi_partial, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Sum("cxy", alias_name="cxy"))
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("cxy"), min_count)),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n1 = float(uni.sum("c") or 0)
    n2_ds = ds.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                pa.array(
                    [
                        sum(
                            max(len((t or "").split()) - 1, 0)
                            for t in b.column(text_col).to_pylist()
                        )
                    ],
                    type=pa.int64(),
                )
            ],
            names=["n2"],
        ),
        batch_format="pyarrow",
    )
    n2 = float(n2_ds.sum("n2") or 0)

    # attach cx then cy: two co-group joins over a UNIFORM row shape
    # (key, other, cxy, cuni, carried) — cxy == -1 tags unigram-count
    # rows, carried ferries cx through the second join
    def tag_uni(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_arrays(
            [
                t.column("w"),
                pa.array([""] * n, type=pa.string()),
                pa.array(np.full(n, -1, dtype=np.int64)),
                t.column("c"),
                pa.array(np.zeros(n, dtype=np.int64)),
            ],
            names=["key", "other", "cxy", "cuni", "carried"],
        )

    def attach(group: pa.Table) -> pa.Table:
        cxy = group.column("cxy").to_numpy()
        is_uni = cxy == -1
        cside = int(group.column("cuni").to_numpy()[is_uni].sum())
        keep = pa.array(np.flatnonzero(~is_uni), type=pa.int64())
        g = group.take(keep)
        # re-key by "other" for the next stage and move the attached
        # count into carried2; carried keeps the previous attachment
        return pa.Table.from_arrays(
            [
                g.column("other"),
                g.column("key"),
                g.column("cxy"),
                pa.array(np.zeros(g.num_rows, dtype=np.int64)),
                pa.array(np.full(g.num_rows, cside, dtype=np.int64)),
                g.column("carried"),
            ],
            names=["key", "other", "cxy", "cuni", "carried", "prev"],
        )

    def drop_prev(t: pa.Table) -> pa.Table:
        return t.drop_columns(["prev"]) if "prev" in t.column_names else t

    bi_rows = bi.map_batches(
        lambda t: pa.Table.from_arrays(
            [
                t.column("x"),
                t.column("y"),
                t.column("cxy"),
                pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            ],
            names=["key", "other", "cxy", "cuni", "carried"],
        ),
        batch_format="pyarrow",
    )
    uni_rows = uni.map_batches(tag_uni, batch_format="pyarrow")
    # stage 1: key = x -> attach cx (lands in carried), re-keyed by y
    staged = (
        bi_rows.union(uni_rows)
        .groupby("key")
        .map_groups(attach, batch_format="pyarrow")
        .map_batches(drop_prev, batch_format="pyarrow")
    )
    # stage 2: key = y -> attach cy (carried2), cx rides in carried...
    # after attach: key=x again, carried=cy, prev=cx
    with_both = (
        staged.union(uni_rows)
        .groupby("key")
        .map_groups(attach, batch_format="pyarrow")
    )

    def score(batch: pa.Table) -> pa.Table:
        # rows: key=x, other=y, cxy, carried=cy, prev=cx
        empty = pa.Table.from_arrays(
            [
                pa.array([], type=pa.string()),
                pa.array([], type=pa.int64()),
                pa.array([], type=pa.int64()),
            ],
            names=["gram", "cnt", "pmi_e4"],
        )
        if batch.num_rows == 0:
            return empty
        x = batch.column("key").to_pylist()
        y = batch.column("other").to_pylist()
        cxy = batch.column("cxy").to_numpy().astype(np.float64)
        cy = batch.column("carried").to_numpy().astype(np.float64)
        cx = batch.column("prev").to_numpy().astype(np.float64)
        pmi = np.floor(
            10000.0 * np.log((cxy * n1 * n1) / (n2 * cx * cy))
        ).astype(np.int64)
        grams = np.asarray([f"{a} {b}" for a, b in zip(x, y)], dtype=object)
        order = np.sort(np.lexsort((grams, -pmi))[:k])
        return pa.Table.from_arrays(
            [
                pa.array(grams[order], type=pa.string()),
                pa.array(cxy[order].astype(np.int64)),
                pa.array(pmi[order]),
            ],
            names=["gram", "cnt", "pmi_e4"],
        )

    parts = with_both.map_batches(score, batch_format="pyarrow").take_all()
    grams = np.asarray([r["gram"] for r in parts], dtype=object)
    cnts = np.asarray([r["cnt"] for r in parts], dtype=np.int64)
    pmis = np.asarray([r["pmi_e4"] for r in parts], dtype=np.int64)
    order = np.lexsort((grams, -pmis))[:k]
    return pa.Table.from_arrays(
        [
            pa.array(grams[order], type=pa.string()),
            pa.array(cnts[order]),
            pa.array(pmis[order]),
        ],
        names=["gram", "cnt", "pmi_e4"],
    )


def profile_columns(ds, cols: List[str]):
    """Data-validation profile: one row per column with
    (col, n, n_null, n_distinct, min_v, max_v) — min/max rendered as
    strings so the output schema is type-uniform. n_distinct counts
    non-null values (SQL ``count(DISTINCT c)`` semantics). Intended
    for int/string columns: float stringification is
    engine-dependent, so keep floats out of oracle-checked profiles.

    Scale plan: row/null totals for ALL columns come from ONE
    per-batch counting pass (two tiny rows per batch); per column, the
    distinct/min/max stats reduce over a combiner-friendly
    ``groupby(col).count()`` histogram whose input is pre-filtered to
    non-null (Ray groupby keys must be comparable; SQL DISTINCT
    ignores nulls anyway) — the histogram is never gathered.
    """
    from ray.data.aggregate import Count, Max, Min

    def counts(batch: pa.Table) -> pa.Table:
        arrs = [pa.array([batch.num_rows] * len(cols), type=pa.int64())]
        nulls = [batch.column(c).null_count for c in cols]
        return pa.Table.from_arrays(
            [
                pa.array(list(cols), type=pa.string()),
                arrs[0],
                pa.array(nulls, type=pa.int64()),
            ],
            names=["col", "n", "n_null"],
        )

    from ray.data.aggregate import Sum

    totals = {
        r["col"]: (int(r["sum(n)"] or 0), int(r["sum(n_null)"] or 0))
        for r in (
            ds.map_batches(counts, batch_format="pyarrow")
            .groupby("col")
            .aggregate(Sum("n"), Sum("n_null"))
            .take_all()  # bounded: one row per profiled column
        )
    }

    out_rows = []
    for c in cols:
        hist = (
            ds.map_batches(
                lambda t, _c=c: t.filter(pc.is_valid(t.column(_c))),
                batch_format="pyarrow",
            )
            .groupby(c)
            .count()
        )
        agg = hist.aggregate(Count(), Min(c), Max(c))
        # an empty input dataset produces no count rows at all
        n, n_null = totals.get(c, (0, 0))
        out_rows.append(
            {
                "col": c,
                "n": n,
                "n_null": n_null,
                "n_distinct": int(agg["count()"] or 0),
                "min_v": "" if agg[f"min({c})"] is None else str(agg[f"min({c})"]),
                "max_v": "" if agg[f"max({c})"] is None else str(agg[f"max({c})"]),
            }
        )
    return pa.Table.from_pylist(
        out_rows,
        schema=pa.schema(
            [
                ("col", pa.string()),
                ("n", pa.int64()),
                ("n_null", pa.int64()),
                ("n_distinct", pa.int64()),
                ("min_v", pa.string()),
                ("max_v", pa.string()),
            ]
        ),
    )


def quantile_filter(
    ds,
    col: str = "n_chars",
    q_lo: float = 0.125,
    q_hi: float = 0.875,
):
    """Outlier trim: keep rows whose ``col`` lies between the corpus's
    EXACT ``q_lo`` and ``q_hi`` quantiles (inclusive) — the standard
    "drop the freakishly short/long documents" curation step, with the
    cutoffs computed from the data instead of hand-tuned constants.

    Scale shape: pass 1 is :func:`length_quantiles`'s value-histogram
    rank-select (the shuffle moves (distinct_value, count) pairs, never
    rows; the driver holds only the histogram, bounded by the column's
    distinct cardinality); the two integer thresholds then ride into a
    zero-shuffle ``map_batches`` filter closure. The corpus streams
    through both passes — nothing row-scale is ever materialized.
    Quantile rule matches DuckDB ``quantile_disc`` exactly (use
    binary-fraction q so ``q*n`` is float-exact, see length_quantiles).
    """
    t = length_quantiles(ds, col=col, qs=(q_lo, q_hi))
    lo, hi = t.column("value").to_pylist()

    def keep(batch: pa.Table) -> pa.Table:
        c = batch.column(col)
        return batch.filter(
            pc.and_(
                pc.greater_equal(c, pa.scalar(lo, type=pa.int64())),
                pc.less_equal(c, pa.scalar(hi, type=pa.int64())),
            )
        )

    return ds.map_batches(keep, batch_format="pyarrow")


def percentile_ranks(
    ds,
    group_col: str,
    value_col: str,
    probes,
):
    """ES ``percentile_ranks`` aggregation (the inverse of
    :func:`group_percentiles`), EXACT and integer-only: for each group
    and each probe value, how many of the group's values are <= the
    probe. Returns (group, probe: int64, n_le: int64, n: int64) — the
    rank fraction is n_le / n, left as two exact integers so the
    oracle hash-checks without float tolerance.

    Same scale plan as group_percentiles: the exchange moves (group,
    distinct value, count) triples once; the per-group cumulative
    lookup runs inside groupby(group).map_groups.
    """
    probes = [int(v) for v in probes]
    probe_arr = np.array(sorted(probes), dtype=np.int64)

    hist = ds.groupby([group_col, value_col]).count()

    def lookup(group: pa.Table) -> pa.Table:
        vals = group.column(value_col).to_numpy(zero_copy_only=False)
        cnts = group.column("count()").to_numpy(zero_copy_only=False)
        order = np.argsort(vals, kind="stable")
        vals, cnts = vals[order], cnts[order]
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        pos = np.searchsorted(vals, probe_arr, side="right")
        n_le = np.where(pos > 0, cum[pos - 1], 0).astype(np.int64)
        key = group.column(group_col)[0]
        return pa.Table.from_arrays(
            [
                pa.array(
                    [key.as_py()] * len(probe_arr),
                    type=group.schema.field(group_col).type,
                ),
                pa.array(probe_arr, type=pa.int64()),
                pa.array(n_le, type=pa.int64()),
                pa.array(np.full(len(probe_arr), n, dtype=np.int64)),
            ],
            names=[group_col, "probe", "n_le", "n"],
        )

    return (
        hist.groupby(group_col)
        .map_groups(lookup, batch_format="pyarrow")
        .sort([group_col, "probe"])
    )


def rare_terms(
    ds,
    max_count: int = 2,
    text_col: str = "text",
):
    """ES ``rare_terms`` aggregation: the whitespace tokens whose
    TOTAL corpus count is <= ``max_count``, with their counts —
    the long-tail complement of :func:`top_ngrams`. Exact (not the
    ES CuckooFilter approximation): one combiner-first
    ``groupby(term).sum`` over per-batch partial counts, then a
    map-side filter; the exchange moves (distinct term, count) pairs
    per block, the output is the rare tail itself (bounded in
    practice by the corpus' hapax set — at web scale, route the
    output straight to a sink rather than the driver).

    Returns (term, n) sorted by (term).
    """
    import pyarrow as _pa

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        col = pc.utf8_trim_whitespace(pc.cast(batch.column(text_col), pa.string()))
        split = pc.split_pattern_regex(pc.fill_null(col, ""), r"\s+")
        flat = pc.list_flatten(split)
        flat = flat.filter(pc.not_equal(flat, ""))
        t = pa.Table.from_arrays([flat], names=["term"])
        g = pa.TableGroupBy(t, "term").aggregate([("term", "count")])
        return g.rename_columns(["term", "n"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
    )

    def keep(batch: pa.Table) -> pa.Table:
        # map-side post-filter (schema-preserving on empty blocks);
        # NOT applied to partials — rarity is a GLOBAL property
        return batch.filter(pc.less_equal(batch.column("n"), max_count))

    return counts.map_batches(keep, batch_format="pyarrow").sort("term")


def adjacency_matrix(
    ds,
    filters: Dict[str, str],
    text_col: str = "text",
):
    """ES ``adjacency_matrix`` aggregation: document counts for each
    named filter and each pairwise intersection. Filters here are
    whitespace-token containment predicates (``name -> token``); keys
    are the ES convention ``name`` and ``nameA&nameB`` (names sorted).
    Zero-count buckets are kept so the output schema/rows are static.

    Scale plan: each batch evaluates every filter as ONE vectorized
    token-membership pass (flat tokens + parent indices — no per-doc
    Python), forms the boolean matrix [n_docs, n_filters], and emits
    one partial count row per key; the exchange moves
    O(blocks x filters^2) tiny rows into a groupby(key).sum.
    """
    from ray.data.aggregate import Sum

    names = sorted(filters)
    keys = list(names) + [
        f"{a}&{b}" for i, a in enumerate(names) for b in names[i + 1 :]
    ]
    # token -> EVERY filter sharing that value (index_in would bind
    # only the first duplicate)
    _tok_to_idxs: Dict[str, list] = {}
    for j, nm in enumerate(names):
        _tok_to_idxs.setdefault(filters[nm], []).append(j)

    def partial(batch: pa.Table) -> pa.Table:
        col = pc.utf8_trim_whitespace(
            pc.cast(pc.fill_null(batch.column(text_col), ""), pa.string())
        )
        split = pc.split_pattern_regex(col, r"\s+")
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        m = np.zeros((n, len(names)), dtype=bool)
        for tok, idxs in _tok_to_idxs.items():
            mask = pc.equal(flat, tok).to_numpy(zero_copy_only=False)
            if mask.any():
                for j in idxs:
                    m[parent[mask], j] = True
        counts = []
        for i in range(len(names)):
            counts.append(int(m[:, i].sum()))
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                counts.append(int((m[:, i] & m[:, j]).sum()))
        return pa.Table.from_arrays(
            [
                pa.array(keys, type=pa.string()),
                pa.array(counts, type=pa.int64()),
            ],
            names=["key", "doc_count"],
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("doc_count", alias_name="doc_count"))
        .sort("key")
    )


def filters_agg(
    ds,
    filters: Dict[str, str],
    text_col: str = "text",
    other_bucket: bool = True,
):
    """ES ``filters`` aggregation: doc counts per named token filter
    plus (optionally) the ``_other_`` bucket — documents matching NO
    filter (ES ``other_bucket: true``). Buckets are NOT exclusive:
    a doc matching two filters counts in both, exactly like ES.

    Same shape as :func:`adjacency_matrix` minus the pair terms: one
    vectorized membership pass per batch, O(filters) partial rows per
    block, one tiny groupby(key).sum.
    """
    from ray.data.aggregate import Sum

    names = sorted(filters)
    _tok_to_idxs: Dict[str, list] = {}
    for j, nm in enumerate(names):
        _tok_to_idxs.setdefault(filters[nm], []).append(j)
    keys = list(names) + (["_other_"] if other_bucket else [])

    def partial(batch: pa.Table) -> pa.Table:
        col = pc.utf8_trim_whitespace(
            pc.cast(pc.fill_null(batch.column(text_col), ""), pa.string())
        )
        split = pc.split_pattern_regex(col, r"\s+")
        flat = pc.list_flatten(split)
        parent = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        m = np.zeros((batch.num_rows, len(names)), dtype=bool)
        for tok, idxs in _tok_to_idxs.items():
            mask = pc.equal(flat, tok).to_numpy(zero_copy_only=False)
            if mask.any():
                for j in idxs:
                    m[parent[mask], j] = True
        counts = [int(m[:, i].sum()) for i in range(len(names))]
        if other_bucket:
            counts.append(int((~m.any(axis=1)).sum()))
        return pa.Table.from_arrays(
            [pa.array(keys, type=pa.string()),
             pa.array(counts, type=pa.int64())],
            names=["key", "doc_count"],
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("doc_count", alias_name="doc_count"))
        .sort("key")
    )


def _lev(a: str, b: str, cap: int) -> int:
    """Classic Levenshtein (DuckDB ``levenshtein`` parity — no
    transpositions), early-exit above ``cap`` via the band bound.
    Scalar sibling of search/fuzzy.py's byte-matrix
    ``_levenshtein_batch`` (the vocabulary-scan shape); the
    cross-parity property test in tests/test_properties_round4.py
    binds both to DuckDB, so a change to either diverges loudly."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        best = i
        for j, cb in enumerate(b, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            best = min(best, v)
        if best > cap:
            return cap + 1
        prev = cur
    return prev[-1]


def phrase_suggest(
    ds,
    phrases: Dict[str, Tuple[str, str]] | Dict[str, tuple],
    max_dist: int = 1,
    topn: int = 3,
    text_col: str = "text",
):
    """ES *phrase suggester* ("did you mean", phrase-level): for each
    two-word query, the corpus bigrams whose words are each within
    ``max_dist`` edits of the query words, ranked by bigram count
    desc, then total edit distance asc, then (w1, w2) lexicographic —
    candidates are REAL co-occurrences, so unlike per-term suggestion
    the correction is guaranteed to be a phrase the corpus actually
    contains (the ES collate=true behavior by construction).

    Returns (q_id, rank, w1, w2, c12, dist), top-``topn`` per query.

    Scale plan: bigram counts are the combiner-first Counter pass
    (one groupby(bg).sum — the :func:`bigram_lm_stats` family);
    candidate matching runs MAP-SIDE over distinct-bigram rows (a
    length-pruned banded Levenshtein per (bigram, query) — queries
    are few, bigrams per block bounded), and only matches enter the
    final tiny per-query top-n. No vocabulary or bigram table is ever
    broadcast or gathered."""
    from collections import Counter

    from ray.data.aggregate import Sum

    SEP = "\x1f"
    qitems = [(q, str(a), str(b)) for q, (a, b) in sorted(phrases.items())]

    def count_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            toks = (t or "").split()
            c.update(SEP.join(p) for p in zip(toks, toks[1:]))
        return pa.Table.from_arrays(
            [
                pa.array(list(c.keys()), type=pa.string()),
                pa.array(list(c.values()), type=pa.int64()),
            ],
            names=["bg", "v"],
        )

    c12 = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("bg")
        .aggregate(Sum("v", alias_name="c12"))
    )

    out_schema = pa.schema(
        [
            ("q_id", pa.string()),
            ("w1", pa.string()),
            ("w2", pa.string()),
            ("c12", pa.int64()),
            ("dist", pa.int64()),
        ]
    )

    def match(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "bg" not in batch.schema.names:
            return out_schema.empty_table()
        bgs = batch.column("bg").to_pylist()
        cnt = batch.column("c12").to_pylist()
        rows = []
        for bg, c in zip(bgs, cnt):
            w1, _, w2 = bg.partition(SEP)
            for q, a, b in qitems:
                d1 = _lev(w1, a, max_dist)
                if d1 > max_dist:
                    continue
                d2 = _lev(w2, b, max_dist)
                if d2 > max_dist:
                    continue
                rows.append((q, w1, w2, int(c), d1 + d2))
        if not rows:
            return out_schema.empty_table()
        qs, w1s, w2s, cs, ds_ = zip(*rows)
        return pa.Table.from_arrays(
            [
                pa.array(qs, type=pa.string()),
                pa.array(w1s, type=pa.string()),
                pa.array(w2s, type=pa.string()),
                pa.array(cs, type=pa.int64()),
                pa.array(ds_, type=pa.int64()),
            ],
            names=out_schema.names,
        )

    cands = c12.map_batches(match, batch_format="pyarrow")

    def rank(group: pa.Table) -> pa.Table:
        c = group.column("c12").to_numpy(zero_copy_only=False)
        d = group.column("dist").to_numpy(zero_copy_only=False)
        w1 = np.asarray(group.column("w1").to_pylist(), dtype=object)
        w2 = np.asarray(group.column("w2").to_pylist(), dtype=object)
        order = np.lexsort((w2, w1, d, -c))[:topn]
        take = pa.array(order)
        return group.take(take).append_column(
            "rank", pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        )

    return (
        cands.groupby("q_id")
        .map_groups(rank, batch_format="pyarrow")
        .sort(["q_id", "rank"])
        .select_columns(["q_id", "rank", "w1", "w2", "c12", "dist"])
    )
