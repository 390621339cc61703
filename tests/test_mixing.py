"""mixture_sample vs a single-process oracle, across bucket counts
and partition layouts (the selection must be partition-independent)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from retriv_ray.ops.mixing import mixture_sample


def _md5(v, seed=0):
    return int.from_bytes(
        hashlib.md5(f"{seed}:{v}".encode()).digest()[8:16], "little"
    )


def _brute(rows, weights, budget):
    out = []
    for src, w in weights.items():
        b = int(np.floor(w * budget))
        docs = sorted(
            (r for r in rows if r["source"] == src),
            key=lambda r: (_md5(r["doc_id"]), r["doc_id"]),
        )
        run = 0
        for r in docs:
            run += r["n"]
            if run <= b:
                out.append((r["doc_id"], src, r["n"]))
    return sorted(out)


def _rows(n=200, n_src=4, seed=7):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        nt = int(rng.randint(1, 40))
        rows.append(
            {
                "doc_id": i,
                "source": f"s{i % n_src}",
                "n": nt,
                "text": " ".join(f"t{j}" for j in range(nt)),
            }
        )
    return rows


@pytest.mark.parametrize("n_buckets", [1, 4, 64])
@pytest.mark.parametrize("blocks", [1, 7])
def test_mixture_matches_brute(ray_session, n_buckets, blocks):
    import ray.data

    rows = _rows()
    weights = {"s0": 0.4, "s1": 0.3, "s2": 0.2}  # s3 dropped
    budget = 900
    tbl = pa.table(
        {
            "doc_id": [r["doc_id"] for r in rows],
            "source": [r["source"] for r in rows],
            "text": [r["text"] for r in rows],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(blocks)
    got = mixture_sample(ds, weights, budget, n_buckets=n_buckets).to_pandas()
    got_rows = sorted(
        zip(got["doc_id"], got["source"], got["n_tokens"])
    )
    got_rows = [(int(a), b, int(c)) for a, b, c in got_rows]
    assert got_rows == _brute(rows, weights, budget)
    assert all(s != "s3" for _, s, _ in got_rows)


def test_mixture_budget_respected(ray_session):
    import ray.data

    rows = _rows(100, 2)
    weights = {"s0": 0.5, "s1": 0.5}
    budget = 300
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [r["doc_id"] for r in rows],
                "source": [r["source"] for r in rows],
                "text": [r["text"] for r in rows],
            }
        )
    )
    got = mixture_sample(ds, weights, budget, n_buckets=4).to_pandas()
    per_src = got.groupby("source")["n_tokens"].sum()
    for s in weights:
        assert per_src.get(s, 0) <= 150


def test_mixture_empty_weights(ray_session):
    import ray.data

    rows = _rows(20, 2)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": [r["doc_id"] for r in rows],
                "source": [r["source"] for r in rows],
                "text": [r["text"] for r in rows],
            }
        )
    )
    got = mixture_sample(ds, {"nope": 1.0}, 100, n_buckets=2)
    assert got.count() == 0
