"""BM25F weighted multi-field scoring (search/bm25f.py)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.search.bm25f import bm25f_topk

ROWS = [
    (0, "title", "spark fast"),
    (0, "body", "spark query engine spark"),
    (1, "title", "slow scan"),
    (1, "body", "table scan join query"),
    (2, "title", "query planner"),
    (2, "body", "fast fast fast join"),
    (3, "title", ""),
    (3, "body", "spark table"),
]
WEIGHTS = {"title": 3, "body": 1}
K1, B = 1.2, 0.75


def _ref_scores(queries):
    """Driver-side float reference of the simplified BM25F formula."""
    wtf, wdl = {}, {}
    for doc, field, text in ROWS:
        w = WEIGHTS[field]
        toks = text.split()
        wdl[doc] = wdl.get(doc, 0) + w * len(toks)
        for t in toks:
            wtf[(doc, t)] = wtf.get((doc, t), 0) + w
    n = len(wdl)
    avgwdl = sum(wdl.values()) / n
    df = {}
    for (_d, t) in wtf:
        df[t] = df.get(t, 0) + 1
    out = {}
    for q_id, text in queries.items():
        sc = {}
        for t in text.split():
            if t not in df:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            for d in wdl:
                f = wtf.get((d, t))
                if not f:
                    continue
                sc[d] = sc.get(d, 0.0) + idf * f * (K1 + 1) / (
                    f + K1 * (1 - B + B * wdl[d] / avgwdl)
                )
        out[q_id] = sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))
    return out


def _ds(blocks):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in ROWS], type=pa.int64()),
            "field": [r[1] for r in ROWS],
            "text": [r[2] for r in ROWS],
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


QUERIES = {"q1": "spark query", "q2": "fast join scan", "q3": "zzz"}


@pytest.mark.parametrize("blocks", [1, 4])
def test_bm25f_matches_reference(ray_session, blocks):
    out = (
        bm25f_topk(_ds(blocks), QUERIES, WEIGHTS, k1=K1, b=B, cutoff=10)
        .to_pandas()
        .sort_values(["q_id", "rank"])
    )
    ref = _ref_scores(QUERIES)
    for q_id, want in ref.items():
        got = out[out.q_id == q_id]
        assert list(got["doc_id"]) == [d for d, _ in want]
        np.testing.assert_allclose(
            got["score"].to_numpy(), [s for _, s in want], rtol=1e-12
        )
    assert (out[out.q_id == "q3"]).empty  # unseen term -> no rows


def test_bm25f_title_weight_changes_ranking(ray_session):
    # doc 0 has 'spark' twice in body + once in title; with weight 1:1
    # vs 3:1 the title hit must matter three times as much
    flat = bm25f_topk(
        _ds(2), {"q": "spark"}, {"title": 1, "body": 1}, cutoff=10,
            ).to_pandas()
    weighted = bm25f_topk(
        _ds(2), {"q": "spark"}, WEIGHTS, cutoff=10
    ).to_pandas()
    assert set(flat["doc_id"]) == set(weighted["doc_id"]) == {0, 3}
    # weighted tf for doc 0: 3*1 + 1*2 = 5 vs flat 3
    assert weighted.iloc[0]["score"] > flat.iloc[0]["score"]


def test_bm25f_rejects_bad_weights(ray_session):
    with pytest.raises(ValueError):
        bm25f_topk(_ds(1), {"q": "spark"}, {"title": 1.5, "body": 1})
    with pytest.raises(ValueError):
        bm25f_topk(_ds(1), {"q": "spark"}, {"title": 0, "body": 1})
    with pytest.raises(ValueError):
        bm25f_topk(_ds(1), {"q": ""}, WEIGHTS)


def test_bm25f_unknown_field_raises(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "field": ["abstract"],
            "text": ["spark"],
        }
    )
    with pytest.raises(Exception):
        bm25f_topk(
            ray.data.from_arrow(t), {"q": "spark"}, WEIGHTS,
                    ).to_pandas()


def test_dis_max_reduces_to_single_field_bm25(ray_session):
    """With one field, dis_max == that field's BM25 ranking; with two
    fields and tie_breaker=0, only the best field decides."""
    import pyarrow as pa
    import ray.data

    from retriv_ray.search.bm25f import bm25f_topk, dis_max_topk

    rows = [
        {"doc_id": 0, "field": "title", "text": "apple pie"},
        {"doc_id": 0, "field": "body", "text": "a long body about apples and apple"},
        {"doc_id": 1, "field": "title", "text": "banana split"},
        {"doc_id": 1, "field": "body", "text": "apple apple apple short"},
        {"doc_id": 2, "field": "title", "text": "apple apple"},
        {"doc_id": 2, "field": "body", "text": "nothing relevant here at all"},
    ]
    ds = ray.data.from_items(rows)
    q = {"q0": "apple"}

    one = dis_max_topk(ds, q, ["title"], tie_breaker=0.7, cutoff=5).to_pandas()
    ref = bm25f_topk(
        ds.filter(lambda r: r["field"] == "title"), q, {"title": 1}, cutoff=5
    ).to_pandas()
    assert list(one["doc_id"]) == list(ref["doc_id"])
    assert list(one["rank"]) == list(ref["rank"])

    both = dis_max_topk(
        ds, q, ["title", "body"], tie_breaker=0.0, cutoff=5
    ).to_pandas()
    assert set(both["doc_id"]) == {0, 1, 2}
    # tie_breaker>0 strictly increases multi-field matchers' scores
    tb = dis_max_topk(
        ds, q, ["title", "body"], tie_breaker=0.5, cutoff=5
    ).to_pandas()
    s0 = dict(zip(both["doc_id"], both["score"]))
    s5 = dict(zip(tb["doc_id"], tb["score"]))
    assert s5[0] > s0[0]  # doc 0 matches in both fields
    assert s5[1] == s0[1]  # doc 1 matches body only


def test_boosting_demotes_without_excluding(ray_session):
    """Negative matches stay in the result, demoted by nb; nb=1 is a
    no-op; nb=0 sinks them to the bottom (score 0 still listed)."""
    import ray.data

    from retriv_ray.search.bm25f import boosting_topk

    rows = [
        {"doc_id": 0, "text": "apple pie recipe"},
        {"doc_id": 1, "text": "apple iphone store"},
        {"doc_id": 2, "text": "apple orchard farm"},
        {"doc_id": 3, "text": "banana bread"},
    ]
    ds = ray.data.from_items(rows)
    q = {"q0": ("apple", "iphone store")}

    noop = boosting_topk(ds, q, negative_boost=1.0, cutoff=10).to_pandas()
    demo = boosting_topk(ds, q, negative_boost=0.1, cutoff=10).to_pandas()
    assert set(noop["doc_id"]) == {0, 1, 2}  # doc 3 never matches
    assert set(demo["doc_id"]) == {0, 1, 2}  # doc 1 demoted, not dropped
    s_noop = dict(zip(noop["doc_id"], noop["score"]))
    s_demo = dict(zip(demo["doc_id"], demo["score"]))
    assert s_demo[1] < s_demo[0] and s_demo[1] < s_demo[2]
    assert abs(s_demo[1] - 0.1 * s_noop[1]) < 1e-12
    assert s_demo[0] == s_noop[0]  # non-matching docs untouched


def test_max_passage_scores_at_passage_level(ray_session):
    """Scoring is passage-level, not doc-level: doc 1's best chunk
    (tf=3 in a 6-token tail passage) beats doc 0's (tf=4 in a full
    16-token window) because BM25 length normalization applies to the
    CHUNK — the short dense tail passage wins, which a doc-level BM25
    over the concatenated text cannot reproduce."""
    import ray.data

    from retriv_ray.ops.prep import chunk_documents
    from retriv_ray.search.bm25f import max_passage_topk

    filler = " ".join(f"x{i}" for i in range(60))
    rows = [
        # doc 0: 4 apples filling the tail of a full 16-token window
        {"doc_id": 0, "text": filler + " apple apple apple apple"},
        # doc 1: 3 apples in a SHORT 6-token tail chunk (dl boost)
        {"doc_id": 1, "text": "apple " + " ".join(f"y{i}" for i in range(50))
                              + " apple apple apple"},
        {"doc_id": 2, "text": "nothing here"},
    ]
    ds = ray.data.from_items(rows)
    chunks = chunk_documents(ds, max_tokens=16, stride=16)
    out = max_passage_topk(chunks, {"q": "apple"}, cutoff=3).to_pandas()
    assert list(out["doc_id"]) == [1, 0]  # short dense passage wins
    assert 2 not in set(out["doc_id"])


def test_dis_max_tolerates_empty_field(ray_session):
    """A field no row carries contributes nothing (no divide-by-zero);
    result equals the populated field's BM25."""
    import ray.data

    from retriv_ray.search.bm25f import dis_max_topk

    rows = [
        {"doc_id": 0, "field": "title", "text": "apple pie"},
        {"doc_id": 1, "field": "title", "text": "banana apple"},
    ]
    ds = ray.data.from_items(rows)
    q = {"q0": "apple"}
    both = dis_max_topk(ds, q, ["title", "missing"], cutoff=5).to_pandas()
    only = dis_max_topk(ds, q, ["title"], cutoff=5).to_pandas()
    assert list(both["doc_id"]) == list(only["doc_id"])
    assert list(both["score"]) == list(only["score"])


def test_rank_feature_boost_reorders(ray_session):
    """Equal-BM25 docs order by the saturated feature; zero/absent
    features add nothing; non-matching docs are not recalled."""
    import ray.data

    from retriv_ray.search.bm25f import rank_feature_topk

    rows = [
        {"doc_id": 0, "text": "apple pie", "feat": 0},
        {"doc_id": 1, "text": "apple tart", "feat": 900},
        {"doc_id": 2, "text": "banana", "feat": 99999},
    ]
    ds = ray.data.from_items(rows)
    out = rank_feature_topk(
        ds, {"q": "apple"}, feature_col="feat", pivot=100.0, boost=5.0
    ).to_pandas()
    assert list(out["doc_id"]) == [1, 0]  # same BM25, feature decides
    assert 2 not in set(out["doc_id"])  # boost does not recall
    s = dict(zip(out["doc_id"], out["score"]))
    assert abs((s[1] - s[0]) - 5.0 * (900 / 1000)) < 1e-9


def test_bm25plus_delta_rewards_any_match(ray_session):
    """With delta, a long doc containing the term stays above docs
    lacking it, and every matching doc gains idf*delta per term vs
    classic BM25."""
    import ray.data

    from retriv_ray.ops.prep import topk_per_group
    from retriv_ray.search.bm25f import bm25f_scores

    def with_field(b):
        import pyarrow as pa

        return b.append_column(
            "field", pa.array(["t"] * b.num_rows, type=pa.string())
        )

    long_tail = " ".join(f"z{i}" for i in range(200))
    rows = [
        {"doc_id": 0, "text": "apple " + long_tail},  # long matcher
        {"doc_id": 1, "text": "apple pie"},           # short matcher
        {"doc_id": 2, "text": "no match here"},
    ]
    ds = ray.data.from_items(rows).map_batches(with_field, batch_format="pyarrow")
    q = {"q": "apple"}
    classic = bm25f_scores(ds, q, {"t": 1}).to_pandas().set_index("doc_id")
    plus = bm25f_scores(ds, q, {"t": 1}, delta=1.0).to_pandas().set_index("doc_id")
    assert set(plus.index) == {0, 1}  # delta never recalls non-matchers
    # uplift = idf * delta, identical for both matchers
    up0 = plus.loc[0, "score"] - classic.loc[0, "score"]
    up1 = plus.loc[1, "score"] - classic.loc[1, "score"]
    assert up0 > 0 and abs(up0 - up1) < 1e-12


def test_ltr_features_integer_semantics(ray_session):
    """tf_sum / n_matched / dl are exact integers; a doc matching two
    query terms reports n_matched=2; dl is the doc token count."""
    import ray.data

    from retriv_ray.search.bm25f import ltr_features

    rows = [
        {"doc_id": 0, "text": "apple banana apple cherry"},
        {"doc_id": 1, "text": "apple pie"},
        {"doc_id": 2, "text": "nothing"},
    ]
    ds = ray.data.from_items(rows)
    out = ltr_features(ds, {"q": "apple banana"}).to_pandas()
    f0 = out[out.doc_id == 0].iloc[0]
    assert (f0["tf_sum"], f0["n_matched"], f0["dl"]) == (3, 2, 4)
    f1 = out[out.doc_id == 1].iloc[0]
    assert (f1["tf_sum"], f1["n_matched"], f1["dl"]) == (1, 1, 2)
    assert 2 not in set(out["doc_id"])
