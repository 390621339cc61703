"""Empty- and null-input sweep over the round-4 operator additions:
every op must return an empty (or degenerate-correct) result, never
crash — the bug class that zero-column empty blocks and null keys
produce in vectorized partials."""

import pyarrow as pa
import pytest


def _empty(schema):
    import ray.data

    return ray.data.from_arrow(schema.empty_table())


SC_GV = pa.schema([("g", pa.string()), ("v", pa.int64())])
SC_TEXT = pa.schema([("text", pa.string())])


@pytest.mark.parametrize(
    "name",
    [
        "group_percentiles",
        "percentile_ranks",
        "rare_terms",
        "adjacency_matrix",
        "filters_agg",
        "numeric_histogram",
        "bpe_train",
    ],
)
def test_new_ops_tolerate_empty_input(ray_session, name):
    from retriv_ray.ops import textstats, windows
    from retriv_ray.ops.prep import bpe_train

    if name == "group_percentiles":
        out = textstats.group_percentiles(_empty(SC_GV), "g", "v")
        assert out.count() == 0
    elif name == "percentile_ranks":
        out = textstats.percentile_ranks(_empty(SC_GV), "g", "v", [1])
        assert out.count() == 0
    elif name == "rare_terms":
        assert textstats.rare_terms(_empty(SC_TEXT)).count() == 0
    elif name == "adjacency_matrix":
        assert textstats.adjacency_matrix(_empty(SC_TEXT), {"A": "a"}).count() == 0
    elif name == "filters_agg":
        assert textstats.filters_agg(_empty(SC_TEXT), {"A": "a"}).count() == 0
    elif name == "numeric_histogram":
        assert windows.numeric_histogram(_empty(SC_GV), "v", 10).count() == 0
    elif name == "bpe_train":
        assert bpe_train(_empty(SC_TEXT), n_merges=2).num_rows == 0


def test_dataset_diff_one_side_empty(ray_session):
    import ray.data

    from retriv_ray.ops.relational import dataset_diff

    sc = pa.schema([("id", pa.int64()), ("text", pa.string())])
    old = ray.data.from_arrow(pa.table({"id": [1], "text": ["a"]}))
    out = dataset_diff(old, _empty(sc), "id", ["text"]).to_pandas()
    assert list(out["status"]) == ["removed"]
    out2 = dataset_diff(_empty(sc), old, "id", ["text"]).to_pandas()
    assert list(out2["status"]) == ["added"]


def test_bm25f_family_tolerates_empty_corpus(ray_session):
    """Every bm25f-based wrapper returns a typed empty result over a
    zero-row corpus (zero-block schema included)."""
    import ray.data

    from retriv_ray.ops.prep import chunk_documents
    from retriv_ray.search.bm25f import (
        boosting_topk,
        dis_max_topk,
        ltr_features,
        max_passage_topk,
        rank_feature_topk,
    )

    sc = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("feat", pa.int64())]
    )
    ds = _empty(sc)
    q = {"q": "apple"}
    assert ltr_features(ds, q).count() == 0
    assert rank_feature_topk(ds, q, feature_col="feat", pivot=10.0).count() == 0
    assert boosting_topk(ds, {"q": ("apple", "bad")}).count() == 0
    fields = pa.schema(
        [("doc_id", pa.int64()), ("field", pa.string()), ("text", pa.string())]
    )
    assert dis_max_topk(_empty(fields), q, ["title"]).count() == 0
    chunks = chunk_documents(ds)
    assert max_passage_topk(chunks, q).count() == 0


def test_numeric_histogram_nulls_dropped(ray_session):
    import ray.data

    from retriv_ray.ops.windows import numeric_histogram

    t = pa.table(
        {
            "g": ["a", None, "a", "a"],
            "v": pa.array([5, 7, None, 12], type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    out = numeric_histogram(ds, "v", 10, key_col="g").to_pandas()
    got = {(g, int(b)): (int(n), int(s)) for g, b, n, s in
           zip(out["g"], out["bucket"], out["n"], out["value_sum"])}
    assert got == {("a", 0): (1, 5), ("a", 10): (1, 12)}
