"""Fusion parity with the reference Merger semantics
(reference tests/merger/merger_test.py:47-80 and
score_normalization_test.py) plus dict-vs-Dataset equivalence."""

from math import isclose

import numpy as np
import pytest

from retriv_ray.merger import (
    Merger,
    fuse_runs_ds,
    max_norm,
    min_max_norm,
    sum_norm,
)

RUN_A = {
    "q1": {"d1": 2.0, "d2": 0.7, "d3": 0.5},
    "q2": {"d1": 1.0, "d2": 0.7, "d3": 0.5},
}
RUN_B = {
    "q1": {"d3": 2.0, "d1": 0.7},
    "q2": {"d1": 1.0, "d2": 0.7, "d3": 0.5},
}


def test_min_max_norm_golden():
    n = min_max_norm(RUN_A)
    assert isclose(n["q1"]["d1"], 1.0)
    assert isclose(n["q1"]["d2"], (0.7 - 0.5) / 1.5)
    assert isclose(n["q1"]["d3"], 0.0)


def test_max_norm_golden():
    n = max_norm(RUN_A)
    assert isclose(n["q1"]["d1"], 1.0)
    assert isclose(n["q1"]["d2"], 0.35)
    assert isclose(n["q1"]["d3"], 0.25)


def test_sum_norm_golden():
    n = sum_norm(RUN_A)
    den = (2.0 + 0.7 + 0.5) - 0.5 * 3
    assert isclose(n["q1"]["d1"], 1.5 / den)
    assert isclose(n["q1"]["d2"], 0.2 / den)
    assert isclose(n["q1"]["d3"], 0.0)


def test_fuse_reference_semantics():
    merger = Merger()
    fused = merger.fuse([RUN_A["q1"], RUN_B["q1"]])
    na, nb = min_max_norm(RUN_A), min_max_norm(RUN_B)
    assert isclose(fused["d1"], na["q1"]["d1"] + nb["q1"]["d1"])
    assert isclose(fused["d2"], na["q1"]["d2"])
    assert isclose(fused["d3"], na["q1"]["d3"] + nb["q1"]["d3"])


def test_mfuse_order_and_cutoff():
    fused = Merger().mfuse([RUN_A, RUN_B], cutoff=2)
    assert list(fused["q1"]) == sorted(
        Merger().mfuse([RUN_A, RUN_B])["q1"], key=lambda d: (
            -Merger().mfuse([RUN_A, RUN_B])["q1"][d], d)
    )[:2]
    assert all(len(r) <= 2 for r in fused.values())


def test_weights():
    fused = Merger(weights=[0.7, 0.3]).mfuse([RUN_A, RUN_B])
    na, nb = min_max_norm(RUN_A), min_max_norm(RUN_B)
    assert isclose(
        fused["q2"]["d2"], 0.7 * na["q2"]["d2"] + 0.3 * nb["q2"]["d2"]
    )


def test_autotune_picks_better_weighting():
    qrels = {"q1": {"d3": 1}, "q2": {"d1": 1}}
    m = Merger()
    cfg = m.autotune(qrels, [RUN_A, RUN_B], metric="ndcg", step=0.25)
    assert cfg["score"] > 0
    assert m.params is not None and len(m.params["weights"]) == 2


@pytest.mark.parametrize("norm", ["min-max", "max", "sum"])
def test_fuse_runs_ds_matches_dict_path(ray_session, norm):
    import ray.data

    rows = []
    for idx, run in enumerate([RUN_A, RUN_B]):
        for q_id, results in run.items():
            for doc_id, score in results.items():
                rows.append(
                    {"run_idx": idx, "q_id": q_id, "doc_id": doc_id, "score": score}
                )
    ds = ray.data.from_items(rows)
    got = fuse_runs_ds(ds, norm=norm, weights=[0.6, 0.4], cutoff=10).take_all()
    want = Merger(norm=norm, weights=[0.6, 0.4]).mfuse([RUN_A, RUN_B], cutoff=10)
    got_by_q = {}
    for r in got:
        got_by_q.setdefault(r["q_id"], []).append(r)
    for q_id, expected in want.items():
        rows_q = sorted(got_by_q[q_id], key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows_q] == list(expected)
        for r in rows_q:
            assert isclose(r["score"], expected[r["doc_id"]], rel_tol=1e-12)


# -- reciprocal-rank fusion ---------------------------------------------------


def test_rrf_fuse_hand_computed():
    from retriv_ray.merger import RRF_SCALE, rrf_fuse

    # q1: run A ranks d1,d2,d3; run B ranks d3,d1
    fused = rrf_fuse([RUN_A["q1"], RUN_B["q1"]], k=60, cutoff=10)
    want = {
        "d1": RRF_SCALE // 61 + RRF_SCALE // 62,
        "d2": RRF_SCALE // 62,
        "d3": RRF_SCALE // 63 + RRF_SCALE // 61,
    }
    assert fused == dict(sorted(want.items(), key=lambda kv: (-kv[1], kv[0])))
    assert list(fused) == ["d1", "d3", "d2"]


def test_rrf_fuse_score_ties_break_by_doc_id():
    from retriv_ray.merger import rrf_fuse

    # two docs each rank 1 in exactly one run -> equal score
    fused = rrf_fuse([{"dz": 5.0}, {"da": 5.0}], k=60)
    assert list(fused) == ["da", "dz"]


def test_rrf_fuse_ds_matches_dict_path(ray_session):
    import ray.data

    from retriv_ray.merger import rrf_fuse, rrf_fuse_ds

    rows = []
    for idx, run in enumerate([RUN_A, RUN_B]):
        for q_id, results in run.items():
            for doc_id, score in results.items():
                rows.append(
                    {"run_idx": idx, "q_id": q_id, "doc_id": doc_id, "score": score}
                )
    got = rrf_fuse_ds(ray.data.from_items(rows), k=60, cutoff=10).take_all()
    got_by_q = {}
    for r in got:
        got_by_q.setdefault(r["q_id"], []).append(r)
    for q_id in ("q1", "q2"):
        want = rrf_fuse([RUN_A[q_id], RUN_B[q_id]], k=60, cutoff=10)
        rows_q = sorted(got_by_q[q_id], key=lambda r: r["rank"])
        assert [r["doc_id"] for r in rows_q] == list(want)
        assert [r["score_e6"] for r in rows_q] == list(want.values())


# -- distributed rank_eval_ds ------------------------------------------------


def _re_tables():
    import pyarrow as pa

    run = pa.table(
        {
            "q_id": ["a"] * 4 + ["b"] * 3,
            "rank": [1, 2, 3, 4, 1, 2, 3],
            "doc_id": [10, 11, 12, 13, 20, 21, 22],
        }
    )
    qrels = pa.table(
        {
            "q_id": ["a", "a", "a", "b", "c"],
            "doc_id": [11, 13, 99, 20, 30],
            "rel": [2, 1, 3, 1, 2],
        }
    )
    return run, qrels


@pytest.mark.parametrize("blocks", [1, 3])
def test_rank_eval_ds_exact_values(ray_session, blocks):
    import math

    import ray.data

    from retriv_ray.eval import rank_eval_ds

    run, qrels = _re_tables()
    out = (
        rank_eval_ds(
            ray.data.from_arrow(run).repartition(blocks),
            ray.data.from_arrow(qrels).repartition(blocks),
            k=3,
        )
        .to_pandas().sort_values("q_id").set_index("q_id")
    )
    # q a: hits at rank 2 (rel 2); rank-4 hit is outside k=3
    t = lambda rel, pos: math.floor(1e9 * (2**rel - 1) / math.log2(pos + 1))
    dcg_a = t(2, 2)
    idcg_a = t(3, 1) + t(2, 2) + t(1, 3)
    assert out.loc["a", "rr_e6"] == 10**6 // 2
    assert out.loc["a", "ndcg_e6"] == dcg_a * 10**6 // idcg_a
    assert out.loc["a", "recall_e6"] == 10**6 // 3
    assert out.loc["a", "n_rel"] == 3
    # q b: perfect hit at rank 1 of the single relevant doc
    assert out.loc["b", "rr_e6"] == 10**6
    assert out.loc["b", "ndcg_e6"] == 10**6
    assert out.loc["b", "recall_e6"] == 10**6
    # q c: qrels-only query -> all-zero metrics, still present
    assert out.loc["c", "rr_e6"] == 0 and out.loc["c", "recall_e6"] == 0
    assert set(out.index) == {"a", "b", "c"}


def test_rank_eval_ds_matches_driver_eval(ray_session):
    import ray.data

    from retriv_ray.eval import evaluate, rank_eval_ds

    run, qrels = _re_tables()
    out = rank_eval_ds(
        ray.data.from_arrow(run), ray.data.from_arrow(qrels), k=3
    ).to_pandas()
    run_d = {}
    for q, r, d in zip(run["q_id"].to_pylist(), run["rank"].to_pylist(), run["doc_id"].to_pylist()):
        run_d.setdefault(q, {})[str(d)] = 1000.0 - r
    qrels_d = {}
    for q, d, g in zip(qrels["q_id"].to_pylist(), qrels["doc_id"].to_pylist(), qrels["rel"].to_pylist()):
        qrels_d.setdefault(q, {})[str(d)] = g
    mrr_ds = out["rr_e6"].sum() / 1e6 / len(out)
    mrr_drv = evaluate(qrels_d, run_d, "mrr@3")
    assert abs(mrr_ds - mrr_drv) < 1e-5
