"""Prep-op tests: cleaning edge cases, split determinism/ratios,
chunk window/overlap math (SQL-oracle parity is covered by the driver
gate; these pin the operator semantics directly)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data

    rows = [
        {"doc_id": 0, "text": "see https://example.com/x?q=1 and mail a@b.co now"},
        {"doc_id": 1, "text": "  spaced\tout\n\ntext  "},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": None},
        {"doc_id": 4, "text": " ".join(f"t{i}" for i in range(100))},
    ]
    return ray.data.from_items(rows)


def test_clean_text(docs):
    from retriv_ray.ops.prep import clean_text

    out = {
        r["doc_id"]: r["clean"]
        for r in clean_text(docs).take_all()
    }
    assert out[0] == "see and mail now"
    assert out[1] == "spaced out text"
    assert out[2] == "" and out[3] == ""


def test_split_by_hash_deterministic_and_ratioed(ray_session):
    import ray.data

    from retriv_ray.ops.prep import split_by_hash

    ds = ray.data.from_items([{"doc_id": i} for i in range(5000)])
    a = split_by_hash(ds).to_pandas().sort_values("doc_id")
    b = split_by_hash(ds.repartition(7)).to_pandas().sort_values("doc_id")
    # partitioning-independent
    assert a["split"].tolist() == b["split"].tolist()
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.90) < 0.02
    assert abs(frac["val"] - 0.05) < 0.01
    assert abs(frac["test"] - 0.05) < 0.01


def test_chunk_documents_windows(docs):
    from retriv_ray.ops.prep import chunk_documents

    df = chunk_documents(docs, max_tokens=64, stride=48).to_pandas()
    # only doc 4 has 100 tokens; docs 2/3 empty -> no rows
    assert set(df.doc_id) == {0, 1, 4}
    d4 = df[df.doc_id == 4].sort_values("chunk_idx")
    # starts 0 and 48: window 0 covers t0..t63, window 1 covers t48..t99
    assert d4.chunk_idx.tolist() == [0, 1]
    assert d4.n_tokens.tolist() == [64, 52]
    c0, c1 = d4.chunk.tolist()
    assert c0.startswith("t0 ") and c0.endswith(" t63")
    assert c1.startswith("t48 ") and c1.endswith(" t99")
    # overlap region shared
    assert "t50" in c0 and "t50" in c1


def test_chunk_documents_no_overlap(ray_session):
    import ray.data

    from retriv_ray.ops.prep import chunk_documents

    ds = ray.data.from_items(
        [{"doc_id": 0, "text": " ".join(f"w{i}" for i in range(10))}]
    )
    df = chunk_documents(ds, max_tokens=4).to_pandas().sort_values("chunk_idx")
    assert df.n_tokens.tolist() == [4, 4, 2]
    assert df.chunk.tolist()[2] == "w8 w9"


def test_pack_token_stream(ray_session):
    import pandas as pd
    import ray.data

    from retriv_ray.ops.prep import pack_token_stream

    # doc lengths 5, 0, 7, 3, 10 -> stream of 25 tokens, budget 8:
    # seq0 = [0,8): d0[0:5], d2[0:3]; seq1 = [8,16): d2[3:7], d3[0:3],
    # d4[0:1]; seq2 = [16,24): d4[1:9]; seq3 = [24,25): d4[9:10]
    lens = {0: 5, 1: 0, 3: 7, 5: 3, 9: 10}
    rows = [
        {"doc_id": k, "text": " ".join(f"x{k}_{i}" for i in range(v))}
        for k, v in lens.items()
    ]
    ds = ray.data.from_items(rows).repartition(3)
    df = (
        pack_token_stream(ds, budget=8)
        .to_pandas()
        .sort_values(["seq_id", "doc_id"])
        .reset_index(drop=True)
    )
    expect = pd.DataFrame(
        [
            (0, 0, 0, 5),
            (0, 3, 0, 3),
            (1, 3, 3, 7),
            (1, 5, 0, 3),
            (1, 9, 0, 1),
            (2, 9, 1, 9),
            (3, 9, 9, 10),
        ],
        columns=["seq_id", "doc_id", "tok_start", "tok_end"],
    )
    pd.testing.assert_frame_equal(df, expect, check_dtype=False)
    # every sequence except the last is exactly full
    sizes = df.assign(sz=df.tok_end - df.tok_start).groupby("seq_id")["sz"].sum()
    assert sizes.tolist() == [8, 8, 8, 1]


def test_topk_per_group(ray_session):
    import ray.data

    from retriv_ray.ops.prep import topk_per_group

    rows = []
    for g in ("a", "b"):
        for i in range(10):
            rows.append({"source": g, "doc_id": i + (100 if g == "b" else 0),
                         "n_chars": (i * 7) % 10})
    ds = ray.data.from_items(rows).repartition(4)
    df = (
        topk_per_group(ds, k=3)
        .to_pandas()
        .sort_values(["source", "rank"])
        .reset_index(drop=True)
    )
    # group a scores: i*7%10 -> 9 at i=7, 8 at i=4, 7 at i=1 (desc, id asc tie-break)
    assert df[df.source == "a"].doc_id.tolist() == [7, 4, 1]
    assert df[df.source == "b"].doc_id.tolist() == [107, 104, 101]
    assert df["rank"].tolist() == [1, 2, 3, 1, 2, 3]


def test_pack_token_stream_distributed_prefix_sum(ray_session):
    """A tiny driver_merge_limit forces the bucketed distributed
    prefix-sum; output must be row-identical to the driver path."""
    import ray.data

    from retriv_ray.ops.prep import pack_token_stream

    rng_lens = [(i * 7 + 3) % 13 for i in range(60)]  # includes zeros
    rows = [
        {"doc_id": 1000 + 3 * i, "text": " ".join(f"w{i}_{j}" for j in range(v))}
        for i, v in enumerate(rng_lens)
    ]
    ds = ray.data.from_items(rows).repartition(7)
    key = ["seq_id", "doc_id"]
    small = (
        pack_token_stream(ds, budget=16)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    dist = (
        pack_token_stream(ds, budget=16, driver_merge_limit=10)
        .to_pandas().sort_values(key).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(dist, small, check_dtype=False)
    sizes = dist.assign(sz=dist.tok_end - dist.tok_start).groupby("seq_id")["sz"].sum()
    assert set(sizes.tolist()[:-1]) == {16}


def test_stratified_sample_deterministic_and_partition_independent(ray_session):
    import hashlib

    import ray

    from retriv_ray.ops.prep import stratified_sample

    items = [
        {"doc_id": i, "source": f"s{i % 3}"} for i in range(60)
    ]
    one = ray.data.from_items(items, override_num_blocks=1)
    many = ray.data.from_items(items, override_num_blocks=7)
    r1 = sorted(
        stratified_sample(one, n=4).take_all(),
        key=lambda r: (r["source"], r["doc_id"]),
    )
    r2 = sorted(
        stratified_sample(many, n=4).take_all(),
        key=lambda r: (r["source"], r["doc_id"]),
    )
    assert r1 == r2
    # quota respected per group
    from collections import Counter

    c = Counter(r["source"] for r in r1)
    assert all(v == 4 for v in c.values()) and len(c) == 3
    # matches a direct computation of the md5 rank rule
    def h(i):
        return int.from_bytes(
            hashlib.md5(f"0:{i}".encode()).digest()[8:16], "little"
        )

    for g in ["s0", "s1", "s2"]:
        ids = [i for i in range(60) if f"s{i % 3}" == g]
        want = sorted(sorted(ids, key=lambda i: (h(i), i))[:4])
        got = [r["doc_id"] for r in r1 if r["source"] == g]
        assert got == want

    # a different seed picks a different sample
    r3 = stratified_sample(one, n=4, seed=1).take_all()
    assert sorted(r["doc_id"] for r in r3) != sorted(r["doc_id"] for r in r1)


def test_topk_and_stratified_accept_null_group_keys(ray_session):
    """ADVICE r3: dictionary_encode leaves null indices for null keys;
    the vectorized partials must not raise ArrowInvalid. Null-key rows
    are dropped (documented contract — Ray's groupby shuffle cannot
    range-partition null-mixed string keys)."""
    import pyarrow as pa
    import ray.data

    from retriv_ray.ops.prep import stratified_sample, topk_per_group

    tbl = pa.table(
        {
            "source": pa.array(["a", "a", None, None, "b", None], type=pa.string()),
            "n_chars": pa.array([5, 9, 1, 7, 3, 4], type=pa.int64()),
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    top = topk_per_group(ds, k=1).to_pandas()
    assert not top.source.isna().any()
    assert set(top[top.source == "a"].doc_id) == {2}
    assert set(top[top.source == "b"].doc_id) == {5}

    samp = stratified_sample(ds, n=2, key_col="source", id_col="doc_id").to_pandas()
    assert not samp.source.isna().any()
    assert set(samp[samp.source == "a"].doc_id) == {1, 2}


def test_length_quantiles_exact(ray_session):
    """Histogram rank-select matches quantile_disc semantics
    (index = ceil(q*n) - 1) on a known multiset."""
    import ray.data

    from retriv_ray.ops.textstats import length_quantiles

    # 10 values 1..10, each once
    ds = ray.data.from_items([{"n_chars": i} for i in range(1, 11)])
    t = length_quantiles(ds, qs=(0.25, 0.5, 0.75)).to_pandas()
    assert list(t["q"]) == [0.25, 0.5, 0.75]
    assert list(t["value"]) == [3, 5, 8]  # duckdb quantile_disc parity
    # skewed multiset: 1 x9, 100 x1
    ds2 = ray.data.from_items(
        [{"n_chars": 1}] * 9 + [{"n_chars": 100}]
    )
    t2 = length_quantiles(ds2, qs=(0.5, 0.96875)).to_pandas()
    assert list(t2["value"]) == [1, 100]


@pytest.mark.parametrize("nparts", [1, 6])
def test_weighted_sample_matches_sql_and_partitioning(ray_session, nparts):
    """A-ES key parity with DuckDB + partition independence + zero
    weights excluded."""
    import duckdb
    import pandas as pd
    import ray.data

    from retriv_ray.ops.prep import weighted_sample

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "n_chars": rng.integers(0, 500, 200).astype(np.int64),
        }
    )
    df.loc[0:4, "n_chars"] = 0  # never sampled
    got = (
        weighted_sample(
            ray.data.from_pandas(df).repartition(nparts), k=20
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        """
        SELECT doc_id, w FROM (
          SELECT doc_id, n_chars AS w,
                 row_number() OVER (ORDER BY
                   ln((md5_number_lower('0:' || doc_id::VARCHAR)::DOUBLE + 1)
                      / 18446744073709551616.0) / n_chars DESC,
                   doc_id) AS rn
          FROM documents WHERE n_chars > 0)
        WHERE rn <= 20 ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want)
    assert not set(got["doc_id"]) & {0, 1, 2, 3, 4}


def test_weighted_sample_seed_changes_sample(ray_session):
    import pandas as pd
    import ray.data

    from retriv_ray.ops.prep import weighted_sample

    df = pd.DataFrame(
        {"doc_id": np.arange(100, dtype=np.int64),
         "n_chars": np.full(100, 10, dtype=np.int64)}
    )
    ds = ray.data.from_pandas(df)
    a = set(weighted_sample(ds, k=10, seed=0).to_pandas()["doc_id"])
    b = set(weighted_sample(ds, k=10, seed=1).to_pandas()["doc_id"])
    assert a != b and len(a) == len(b) == 10


def test_quantile_filter_matches_quantile_disc(ray_session):
    import duckdb
    import pandas as pd
    import ray.data

    from retriv_ray.ops.textstats import quantile_filter

    rng = np.random.default_rng(33)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(1000, dtype=np.int64),
            "n_chars": rng.integers(5, 3000, 1000).astype(np.int64),
        }
    )
    got = (
        quantile_filter(
            ray.data.from_pandas(df).repartition(7), q_lo=0.125, q_hi=0.875
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        """
        SELECT doc_id, n_chars FROM documents
        WHERE n_chars >= (SELECT quantile_disc(n_chars, 0.125) FROM documents)
          AND n_chars <= (SELECT quantile_disc(n_chars, 0.875) FROM documents)
        ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False
    )


def test_group_percentiles_duckdb_parity_and_partitioning(ray_session):
    """Per-group rank-select == DuckDB quantile_disc per group, and
    the result is independent of input partitioning."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from retriv_ray.ops.textstats import group_percentiles

    rng = np.random.default_rng(11)
    g = rng.choice(["a", "b", "c"], 500)
    v = rng.integers(0, 40, 500)
    t = pa.table({"g": g, "v": v.astype(np.int64)})
    con = duckdb.connect()
    con.register("t", t)
    qs = (0.25, 0.5, 0.875)
    want = con.execute(
        " UNION ALL ".join(
            f"SELECT g, {q} AS q, quantile_disc(v, {q})::BIGINT AS value"
            " FROM t GROUP BY g"
            for q in qs
        )
        + " ORDER BY g, q"
    ).df()
    for nparts in (1, 7):
        ds = ray.data.from_arrow(t).repartition(nparts)
        got = group_percentiles(ds, "g", "v", qs=qs).to_pandas()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )


def test_group_percentiles_single_row_groups(ray_session):
    """n=1 groups: every quantile selects the one value."""
    import ray.data

    from retriv_ray.ops.textstats import group_percentiles

    ds = ray.data.from_items([{"g": "x", "v": 7}, {"g": "y", "v": 3}])
    out = group_percentiles(ds, "g", "v", qs=(0.25, 0.875)).to_pandas()
    assert list(out["value"]) == [7, 7, 3, 3]


def test_parse_json_fields_types_and_nulls(ray_session):
    """int/str extraction, absent keys -> null, non-object rows -> null."""
    import ray.data

    from retriv_ray.ops.prep import parse_json_fields

    rows = [
        {"i": 0, "props": '{"k": 87, "tag": "a b"}'},
        {"i": 1, "props": '{"k": -3}'},
        {"i": 2, "props": '{"tag": ""}'},
        {"i": 3, "props": "not json"},
        {"i": 4, "props": None},
    ]
    ds = ray.data.from_items(rows)
    out = (
        parse_json_fields(ds, col="props", int_fields=["k"], str_fields=["tag"])
        .sort("i")
        .to_pandas()
    )
    ks = out["k"].astype("Int64")
    assert list(ks[:2]) == [87, -3] and ks[2:].isna().all()
    tags = list(out["tag"])
    assert tags[0] == "a b" and tags[2] == ""
    assert tags[1] is None and tags[3] is None and tags[4] is None


def test_percentile_ranks_boundaries(ray_session):
    """Probes below/at/above the data range give 0 / exact / n."""
    import ray.data

    from retriv_ray.ops.textstats import percentile_ranks

    rows = [{"g": "x", "v": v} for v in [1, 2, 2, 5, 9]]
    ds = ray.data.from_items(rows).repartition(3)
    out = percentile_ranks(ds, "g", "v", [0, 2, 9, 100]).to_pandas()
    assert list(out["probe"]) == [0, 2, 9, 100]
    assert list(out["n_le"]) == [0, 3, 5, 5]
    assert list(out["n"]) == [5, 5, 5, 5]


def test_rare_terms_global_threshold(ray_session):
    """Rarity is global: a term frequent across blocks is excluded
    even when rare within every single block."""
    import ray.data

    from retriv_ray.ops.textstats import rare_terms

    rows = [{"text": "common unique%d" % i} for i in range(6)]
    ds = ray.data.from_items(rows).repartition(6)  # 'common' once/block
    out = rare_terms(ds, max_count=2).to_pandas()
    assert "common" not in set(out["term"])  # global count 6 > 2
    assert set(out["term"]) == {"unique%d" % i for i in range(6)}
    assert (out["n"] == 1).all()


def test_adjacency_matrix_pairs_and_statics(ray_session):
    """Pairwise intersections counted once per doc (repeated tokens
    don't double-count); zero buckets retained; partition-independent."""
    import ray.data

    from retriv_ray.ops.textstats import adjacency_matrix

    rows = [
        {"text": "a b"},
        {"text": "a a b c"},
        {"text": "c"},
        {"text": "d"},
    ]
    for nparts in (1, 4):
        ds = ray.data.from_items(rows).repartition(nparts)
        out = adjacency_matrix(ds, {"A": "a", "B": "b", "C": "c"}).to_pandas()
        got = dict(zip(out["key"], out["doc_count"]))
        assert got == {
            "A": 2, "B": 2, "C": 2,
            "A&B": 2, "A&C": 1, "B&C": 1,
        }


def test_filters_agg_other_bucket(ray_session):
    """Non-exclusive buckets; _other_ counts docs matching none."""
    import ray.data

    from retriv_ray.ops.textstats import filters_agg

    rows = [{"text": "a b"}, {"text": "a"}, {"text": "z"}, {"text": ""}]
    ds = ray.data.from_items(rows).repartition(2)
    out = filters_agg(ds, {"A": "a", "B": "b"}).to_pandas()
    got = dict(zip(out["key"], out["doc_count"]))
    assert got == {"A": 2, "B": 1, "_other_": 2}
    no_other = filters_agg(ds, {"A": "a"}, other_bucket=False).to_pandas()
    assert list(no_other["key"]) == ["A"]


def _bpe_reference(words, n_merges):
    """In-memory reference BPE (count desc, then lexicographic)."""
    from collections import Counter

    wc = Counter(words)
    seqs = {w: list(w) for w in wc}
    rules = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, c in wc.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        rules.append((best, pairs[best]))
        for w in seqs:
            s, i, out = seqs[w], 0, []
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return rules


def test_bpe_train_matches_reference(ray_session):
    """Distributed merges == in-memory reference, any partitioning."""
    import ray.data

    from retriv_ray.ops.prep import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "low newer low",
    ]
    words = [w for t in texts for w in t.split()]
    want = _bpe_reference(words, 6)
    for nparts in (1, 3):
        ds = ray.data.from_items([{"text": t} for t in texts]).repartition(nparts)
        got = bpe_train(ds, n_merges=6).to_pandas()
        got_rules = [
            ((l, r), int(c))
            for l, r, c in zip(got["left"], got["right"], got["pair_count"])
        ]
        assert got_rules == want


def test_parse_json_fields_escapes_metacharacters(ray_session):
    """Field names with regex metacharacters match literally."""
    import ray.data

    from retriv_ray.ops.prep import parse_json_fields

    rows = [
        {"i": 0, "props": '{"a.b": 5, "aXb": 9}'},
    ]
    out = (
        parse_json_fields(
            ray.data.from_items(rows), col="props", int_fields=["a.b"]
        )
        .to_pandas()
    )
    assert list(out["a.b"]) == [5]  # matched "a.b", not "aXb"


def test_phrase_suggest_collated_and_ranked(ray_session):
    """Candidates must be real corpus bigrams; rank = count desc,
    then distance, then lexicographic; per-word distance cap."""
    import duckdb
    import ray.data

    from retriv_ray.ops.textstats import phrase_suggest

    rows = [
        {"text": "big data big data big date"},
        {"text": "bag data pig dat"},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    out = phrase_suggest(ds, {"q": ("bg", "data")}, max_dist=1, topn=5).to_pandas()
    # 'big data' (c=2) above 'bag data' (c=1) and 'big date' (c=1)
    assert list(zip(out["w1"], out["w2"]))[0] == ("big", "data")
    assert set(zip(out["w1"], out["w2"])) == {
        ("big", "data"), ("bag", "data"), ("big", "date"),
    }  # 'pig dat' excluded: 'pig' is 2 edits from 'bg'
    # DuckDB levenshtein parity on the dist column
    con = duckdb.connect()
    for w1, w2, d in zip(out["w1"], out["w2"], out["dist"]):
        want = con.execute(
            "SELECT levenshtein(?, 'bg') + levenshtein(?, 'data')", [w1, w2]
        ).fetchone()[0]
        assert int(d) == want


def test_group_percentiles_composite_key(ray_session):
    """Composite (g1, g2) keys partition independently of layout."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from retriv_ray.ops.textstats import group_percentiles

    rng = np.random.default_rng(13)
    t = pa.table(
        {
            "g1": rng.choice(["a", "b"], 400),
            "g2": rng.integers(0, 3, 400).astype(np.int64),
            "v": rng.integers(0, 30, 400).astype(np.int64),
        }
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT g1, g2, 0.5 AS q, quantile_disc(v, 0.5)::BIGINT AS value"
        " FROM t GROUP BY 1, 2 ORDER BY g1, g2, q"
    ).df()
    for nparts in (1, 5):
        ds = ray.data.from_arrow(t).repartition(nparts)
        got = group_percentiles(ds, ["g1", "g2"], "v", qs=(0.5,)).to_pandas()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )


def test_filters_agg_duplicate_token_values(ray_session):
    """Two filters sharing one token value both count every match."""
    import ray.data

    from retriv_ray.ops.textstats import adjacency_matrix, filters_agg

    ds = ray.data.from_items([{"text": "scan it"}, {"text": "other"}])
    out = filters_agg(ds, {"a1": "scan", "a2": "scan"}).to_pandas()
    got = dict(zip(out["key"], out["doc_count"]))
    assert got == {"a1": 1, "a2": 1, "_other_": 1}
    adj = adjacency_matrix(ds, {"a1": "scan", "a2": "scan"}).to_pandas()
    gadj = dict(zip(adj["key"], adj["doc_count"]))
    assert gadj == {"a1": 1, "a2": 1, "a1&a2": 1}


def test_bpe_train_rounds_fallback_matches_mem(ray_session):
    """driver_word_limit=0 forces the distributed per-round path over
    the word table; it must learn the identical rule sequence."""
    import ray.data

    from retriv_ray.ops.prep import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "low newer low",
    ]
    ds = ray.data.from_items([{"text": t} for t in texts]).repartition(2)
    mem = bpe_train(ds, n_merges=6).to_pandas()
    rounds = bpe_train(ds, n_merges=6, driver_word_limit=0).to_pandas()
    assert mem.equals(rounds)


def test_bpe_train_heap_handles_count_decreases(ray_session):
    """A pair whose count DROPS below a rival's after a merge must not
    win on its stale heap entry (lazy-discard correctness)."""
    import ray.data

    from retriv_ray.ops.prep import bpe_train

    # 'ab' dominates round 1; merging it destroys most 'bc' pairs, so
    # round 2's winner must be re-evaluated from fresh counts
    texts = ["abc abc abc abd abd bc"]
    ds = ray.data.from_items([{"text": t} for t in texts])
    mem = bpe_train(ds, n_merges=3).to_pandas()
    rounds = bpe_train(ds, n_merges=3, driver_word_limit=0).to_pandas()
    assert mem.equals(rounds)
