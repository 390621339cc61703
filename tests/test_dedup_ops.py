"""Dedup-family scale-path tests: join-based MinHash verification,
block-pair distributed exact near-dup (including the cross-block
id-ordering case), LSH-bucketed near-dup recall, and the hot-shingle
cap."""

import numpy as np
import pytest

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
DOCS = [
    {"doc_id": 0, "text": BASE},
    {"doc_id": 1, "text": BASE},  # exact dup of 0
    {"doc_id": 2, "text": BASE.replace("lazy", "sleepy")},  # near-dup of 0
    {"doc_id": 3, "text": "completely different words about compilers and parsers here now"},
    {"doc_id": 4, "text": "another unrelated document mentioning databases indexes and transactions"},
]


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_items(DOCS)


def _pairs(df):
    if len(df) == 0:
        return set()
    return set(zip(df["doc_id_a"].tolist(), df["doc_id_b"].tolist()))


def test_minhash_join_verify_equals_exact(docs_ds):
    from retriv_ray.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(docs_ds, n=3, threshold=0.3).to_pandas()
    mh = minhash_lsh_pairs(
        docs_ds, n=3, threshold=0.3, join_partitions=2
    ).to_pandas()
    # verification is exact, so minhash output ⊆ exact; on this corpus
    # (identical + one-word-off dups) banded LSH recall is 1.0 -> equal
    assert _pairs(mh) == _pairs(exact)
    assert (0, 1) in _pairs(mh)
    j_mh = dict(zip(zip(mh["doc_id_a"], mh["doc_id_b"]), mh["jaccard_e4"]))
    assert j_mh[(0, 1)] == 10000  # identical docs -> jaccard 1.0 exactly


def test_ngram_hot_shingle_cap_is_subset(docs_ds):
    from retriv_ray.ops.dedup import ngram_jaccard_pairs

    full = _pairs(ngram_jaccard_pairs(docs_ds, n=3, threshold=0.3).to_pandas())
    capped = _pairs(
        ngram_jaccard_pairs(
            docs_ds, n=3, threshold=0.3, max_shingle_df=2
        ).to_pandas()
    )
    assert capped <= full


def _vec_items(seed=3, n=12, d=8):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    m[5] = m[0] + 0.01 * rng.standard_normal(d)  # near-dup pair (0, 5)
    m[9] = -m[2]  # anti-correlated, never a near-dup
    # shuffled ids: id order != row order, so block-pair tasks see
    # unordered ids (regression for the cross-block min/max normalize)
    ids = rng.permutation(n)
    return [
        {"vec_id": int(ids[i]), "embedding": m[i].tolist()} for i in range(n)
    ], {int(ids[i]): m[i] for i in range(n)}


def _brute_pairs(by_id, thr):
    out = set()
    for a in by_id:
        for b in by_id:
            if a < b:
                va, vb = by_id[a], by_id[b]
                sim = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
                if sim >= thr:
                    out.add((a, b))
    return out

def test_embedding_near_dup_exact_block_pairs(ray_session):
    import ray.data

    from retriv_ray.ops.dedup import embedding_near_dup

    items, by_id = _vec_items()
    ds = ray.data.from_items(items)
    got = embedding_near_dup(
        ds, threshold=0.8, method="exact", block_rows=3
    ).to_pandas()
    want = _brute_pairs(by_id, 0.8)
    assert set(zip(got["vec_id_a"], got["vec_id_b"])) == want
    assert len(got) == len(set(zip(got["vec_id_a"], got["vec_id_b"])))  # no dups


def test_embedding_near_dup_lsh_subset_finds_identicals(ray_session):
    import ray.data

    from retriv_ray.ops.dedup import embedding_near_dup

    items, by_id = _vec_items()
    ds = ray.data.from_items(items)
    exact = _brute_pairs(by_id, 0.8)
    lsh = embedding_near_dup(
        ds, threshold=0.8, method="lsh", n_tables=16, n_bits=4
    ).to_pandas()
    lsh_pairs = set(zip(lsh["vec_id_a"], lsh["vec_id_b"]))
    assert lsh_pairs <= exact
    # the engineered near-identical pair (rows 0 and 5, whatever ids
    # they were shuffled to) lands in the same bucket in essentially
    # every table -> must be found
    pair = tuple(sorted([items[0]["vec_id"], items[5]["vec_id"]]))
    assert pair in lsh_pairs


def test_dedup_filter_keeps_lowest_id(docs_ds):
    from retriv_ray.ops.dedup import dedup_filter, ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs_ds, n=3, threshold=0.3)
    kept = sorted(
        r["doc_id"] for r in dedup_filter(docs_ds, pairs).take_all()
    )
    # docs 1 (exact dup of 0) and 2 (near-dup of 0) dropped; 0 kept as
    # the lowest-id representative
    assert kept == [0, 3, 4]


def test_ngram_default_cap_survives_100k_df_shingle(ray_session):
    """One shingle shared by 10^5 docs would fan out ~5*10^9 pairs
    uncapped; the DEFAULT max_shingle_df must drop that group (loudly)
    while genuine near-dups elsewhere still pair up."""
    import pyarrow as pa
    import ray.data

    from retriv_ray.ops.dedup import ngram_jaccard_pairs

    n_hot = 100_000
    hot = "boilerplate footer sentence"  # 3 tokens -> exactly 1 shingle
    ids = list(range(n_hot)) + [n_hot, n_hot + 1]
    texts = [hot] * n_hot + [
        "unique alpha beta gamma delta payload",
        "unique alpha beta gamma delta payload",
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})
    ).repartition(8)
    got = _pairs(ngram_jaccard_pairs(ds, n=3, threshold=0.5).to_pandas())
    # the hot-shingle group emits nothing; the true dup pair survives
    assert got == {(n_hot, n_hot + 1)}


def test_duplicate_window_stats(ray_session):
    """Windowed exact-substring duplication (Lee et al. 2022 style):
    shared verbatim windows are flagged corpus-wide; short docs drop."""
    import ray.data

    from retriv_ray.ops.dedup import duplicate_window_stats

    shared = "one two three four"  # a 4-token window shared verbatim
    docs = [
        {"doc_id": 0, "text": shared + " unique tail aaa bbb"},
        {"doc_id": 1, "text": shared + " other words ccc ddd"},
        {"doc_id": 2, "text": "completely different text with no overlap at all"},
        {"doc_id": 3, "text": "shorty"},  # < window -> no row
    ]
    out = (
        duplicate_window_stats(ray.data.from_items(docs), window=4, stride=4)
        .to_pandas()
        .set_index("doc_id")
    )
    assert 3 not in out.index
    assert out.loc[0, "n_windows"] == 2 and out.loc[0, "dup_windows"] == 1
    assert out.loc[1, "n_windows"] == 2 and out.loc[1, "dup_windows"] == 1
    assert out.loc[2, "dup_windows"] == 0


def test_connected_components_multi_hop(ray_session):
    """A 3-hop chain through shared keys must collapse to one cluster
    (pairwise dedup would miss the 1-4 link), and disjoint keys must
    stay separate."""
    import ray.data

    from retriv_ray.ops.dedup import connected_components

    # component A: 1-2 share k1, 2-3 share k2, 3-4 share k3 (chain)
    # component B: 5-6 share k4; singleton: 7
    memb = ray.data.from_items(
        [
            {"doc_id": 1, "k": "k1"}, {"doc_id": 2, "k": "k1"},
            {"doc_id": 2, "k": "k2"}, {"doc_id": 3, "k": "k2"},
            {"doc_id": 3, "k": "k3"}, {"doc_id": 4, "k": "k3"},
            {"doc_id": 5, "k": "k4"}, {"doc_id": 6, "k": "k4"},
            {"doc_id": 7, "k": "k5"},
        ]
    )
    out = connected_components(memb).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}


def test_dedup_clusters_matches_recursive_sql(ray_session):
    """Label propagation == recursive-CTE min-label spread."""
    import duckdb
    import ray.data

    from retriv_ray.ops.dedup import dedup_clusters

    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = (
        dedup_clusters(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet')"
    )
    exp = con.execute(
        """
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
    ).df()
    assert list(out["doc_id"]) == list(exp["doc_id"])
    assert list(out["cluster_id"]) == list(exp["cluster_id"])


def test_jaccard_join_cross_side_only(ray_session):
    import ray.data

    from retriv_ray.ops.dedup import jaccard_join

    # left 0 == left 1 (within-side dup: must NOT pair);
    # left 0 ~ right 10 (cross-side near-dup: must pair);
    # right 11 unrelated
    left = ray.data.from_items(
        [
            {"doc_id": 0, "text": BASE},
            {"doc_id": 1, "text": BASE},
        ]
    )
    right = ray.data.from_items(
        [
            {"doc_id": 10, "text": BASE.replace("lazy", "sleepy")},
            {"doc_id": 11, "text": "nothing shared with anything else at all ever"},
        ]
    )
    df = jaccard_join(left, right, n=3, threshold=0.3).to_pandas()
    got = set(zip(df["left_id"].tolist(), df["right_id"].tolist()))
    assert got == {(0, 10), (1, 10)}
    # identical texts across sides score exactly 10000
    full = jaccard_join(
        ray.data.from_items([{"doc_id": 0, "text": BASE}]),
        ray.data.from_items([{"doc_id": 5, "text": BASE}]),
        threshold=0.99,
    ).to_pandas()
    assert full.iloc[0]["jaccard_e4"] == 10000


def test_jaccard_join_hot_cap_drops_group(ray_session):
    import ray.data

    from retriv_ray.ops.dedup import jaccard_join

    left = ray.data.from_items([{"doc_id": i, "text": BASE} for i in range(4)])
    right = ray.data.from_items(
        [{"doc_id": 100 + i, "text": BASE} for i in range(4)]
    )
    # every shingle has df=8 > cap=4 -> all groups dropped -> no pairs
    df = jaccard_join(left, right, threshold=0.1, max_shingle_df=4).to_pandas()
    assert len(df) == 0


# -- C4-style line-level dedup ----------------------------------------------

LINE_DOCS = {
    0: "alpha beta\ngamma delta\nshared one",
    1: "shared one\nunique here\nalpha beta",  # two cross-doc dup lines lose
    2: "totally fresh\ntotally fresh\nlast line",  # within-doc dup: idx 1 loses
    3: "shared one\nalpha beta",  # every line loses -> doc dropped
    4: "",  # one empty line, globally first -> survives as ""
    5: "",  # empty-line dup -> doc dropped
}


def _brute_line_dedup(docs, sep="\n"):
    seen, out = set(), {}
    for d in sorted(docs):
        kept = []
        for line in docs[d].split(sep):
            if line not in seen:
                seen.add(line)
                kept.append(line)
        if kept:
            out[d] = sep.join(kept)
    return out


def test_dedup_lines_matches_brute_force(ray_session):
    import ray.data

    from retriv_ray.ops.dedup import dedup_lines

    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in LINE_DOCS.items()]
    )
    got = {r["doc_id"]: r["text"] for r in dedup_lines(ds).take_all()}
    assert got == _brute_line_dedup(LINE_DOCS)


def test_dedup_lines_partition_independent(ray_session):
    import ray.data

    from retriv_ray.ops.dedup import dedup_lines

    items = [{"doc_id": d, "text": t} for d, t in LINE_DOCS.items()]
    a = {
        r["doc_id"]: r["text"]
        for r in dedup_lines(ray.data.from_items(items).repartition(1)).take_all()
    }
    b = {
        r["doc_id"]: r["text"]
        for r in dedup_lines(ray.data.from_items(items).repartition(5)).take_all()
    }
    assert a == b == _brute_line_dedup(LINE_DOCS)


def test_dedup_lines_no_duplicates_is_identity(ray_session):
    import ray.data

    from retriv_ray.ops.dedup import dedup_lines

    docs = {7: "one two\nthree four", 8: "five six\nseven eight"}
    ds = ray.data.from_items([{"doc_id": d, "text": t} for d, t in docs.items()])
    got = {r["doc_id"]: r["text"] for r in dedup_lines(ds).take_all()}
    assert got == docs


# -- ExactSubstr-style substring dedup ---------------------------------------

SUB_DOCS = {
    0: "a b c d e",
    1: "x a b c y",  # shares (a b c) with doc0 -> middle cut -> "x y"
    2: "a b c d e",  # every window duplicated -> fully covered -> dropped
    3: "a b",  # shorter than the window -> untouched
    4: "p q r s a b c d t",  # two overlapping cut sources merge
    5: "unique tokens only here now",
}


def _brute_substr(docs, W):
    occ = {}
    for d in sorted(docs):
        toks = docs[d].split()
        for s in range(len(toks) - W + 1):
            occ.setdefault(tuple(toks[s : s + W]), []).append((d, s))
    rem = {}
    for lst in occ.values():
        for d, s in lst[1:]:
            rem.setdefault(d, []).append(s)
    out = {}
    for d in sorted(docs):
        toks = docs[d].split()
        cov = [False] * len(toks)
        for s in rem.get(d, []):
            for i in range(s, min(s + W, len(toks))):
                cov[i] = True
        kept = [t for t, c in zip(toks, cov) if not c]
        if kept:
            out[d] = " ".join(kept)
    return out


def test_exact_substring_dedup_matches_brute_force(ray_session):
    import ray.data

    from retriv_ray.ops.dedup import exact_substring_dedup

    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in SUB_DOCS.items()]
    )
    got = {
        r["doc_id"]: r["text"]
        for r in exact_substring_dedup(ds, window=3).take_all()
    }
    want = _brute_substr(SUB_DOCS, 3)
    assert got == want
    assert 2 not in got and got[1] == "x y" and got[3] == "a b"


def test_exact_substring_dedup_partition_independent(ray_session):
    import ray.data

    from retriv_ray.ops.dedup import exact_substring_dedup

    items = [{"doc_id": d, "text": t} for d, t in SUB_DOCS.items()]
    a = {
        r["doc_id"]: r["text"]
        for r in exact_substring_dedup(
            ray.data.from_items(items).repartition(1), window=3
        ).take_all()
    }
    b = {
        r["doc_id"]: r["text"]
        for r in exact_substring_dedup(
            ray.data.from_items(items).repartition(5), window=3
        ).take_all()
    }
    assert a == b == _brute_substr(SUB_DOCS, 3)


def test_cluster_dedup_filter_keeps_canonical_only(ray_session):
    import ray.data

    from retriv_ray.ops.dedup import cluster_dedup_filter

    corpus = ray.data.from_items(
        [{"doc_id": i, "text": f"t{i}"} for i in range(6)]
    )
    # transitive chain 0~1~2 (0-2 never paired directly), pair 4~5
    clusters = ray.data.from_items(
        [
            {"doc_id": 0, "cluster_id": 0},
            {"doc_id": 1, "cluster_id": 0},
            {"doc_id": 2, "cluster_id": 0},
            {"doc_id": 3, "cluster_id": 3},
            {"doc_id": 4, "cluster_id": 4},
            {"doc_id": 5, "cluster_id": 4},
        ]
    )
    got = sorted(
        r["doc_id"]
        for r in cluster_dedup_filter(corpus, clusters).take_all()
    )
    assert got == [0, 3, 4]
