"""PII scrub + intra-doc repetition + corpus n-gram ops — hand-computed
expectations (the SQL-oracle twin runs in scripts/check_oracles.py)."""

import pyarrow as pa
import pytest


@pytest.fixture()
def ray_mod(ray_session):
    import ray

    return ray


def _sorted_rows(ds, key):
    rows = ds.take_all() if hasattr(ds, "take_all") else ds.to_pylist()
    return sorted(rows, key=lambda r: r[key])


def test_pattern_scrub_counts_and_redaction(ray_mod):
    from retriv_ray.ops.scrub import pattern_scrub

    ds = ray_mod.data.from_items(
        [
            {"doc_id": 0, "text": "mail a@b.co or c.d+x@e-f.org now"},
            {"doc_id": 1, "text": "host 10.0.0.1 port 8080"},
            {"doc_id": 2, "text": "no pii here"},
            {"doc_id": 3, "text": ""},
        ]
    )
    rows = _sorted_rows(pattern_scrub(ds), "doc_id")
    assert [r["n_email"] for r in rows] == [2, 0, 0, 0]
    assert [r["n_ipv4"] for r in rows] == [0, 1, 0, 0]
    # row 1: the ip is consumed by the ipv4 replacement before the
    # number pass, so only "8080" remains a number match in redaction,
    # but the COUNT of \d+ runs on the original text (4 runs in the ip
    # + the port)
    assert rows[1]["n_number"] == 5
    assert rows[0]["redacted"] == "mail <EMAIL> or <EMAIL> now"
    assert rows[1]["redacted"] == "host <IPV> port <NUMBER>"
    assert rows[2]["redacted"] == "no pii here"


def test_pattern_scrub_custom_patterns_no_redact(ray_mod):
    from retriv_ray.ops.scrub import pattern_scrub

    ds = ray_mod.data.from_items([{"doc_id": 7, "text": "x y x"}])
    rows = pattern_scrub(
        ds, patterns={"x_runs": r"x+"}, redact=False
    ).take_all()
    assert rows == [{"doc_id": 7, "n_x_runs": 2}]


def test_repetition_stats_hand_counts(ray_mod):
    from retriv_ray.ops.textstats import repetition_stats

    ds = ray_mod.data.from_items(
        [
            # 2-grams: "a b","b a","a b" -> 3 total, 1 dup
            # 3-grams: "a b a","b a b" -> 2 total, 0 dup
            {"doc_id": 0, "text": "a b a b"},
            {"doc_id": 1, "text": "x x x x x"},  # g2: 4 tot 3 dup; g3: 3 tot 2 dup
            {"doc_id": 2, "text": "one"},
            {"doc_id": 3, "text": ""},
        ]
    )
    rows = _sorted_rows(repetition_stats(ds), "doc_id")
    got = [
        (r["n_2grams"], r["dup_2grams"], r["n_3grams"], r["dup_3grams"])
        for r in rows
    ]
    assert got == [(3, 1, 2, 0), (4, 3, 3, 2), (0, 0, 0, 0), (0, 0, 0, 0)]


def test_top_ngrams_exact_order_and_ties(ray_mod):
    from retriv_ray.ops.textstats import top_ngrams

    ds = ray_mod.data.from_items(
        [
            {"doc_id": 0, "text": "a b a b c"},
            {"doc_id": 1, "text": "a b z z"},
        ]
    )
    tbl = top_ngrams(ds, n=2, k=3)
    assert isinstance(tbl, pa.Table)
    rows = tbl.to_pylist()
    # counts: "a b"=3, "b a"=1, "b c"=1, "b z"=1, "z z"=1
    # ties broken by gram ASC
    assert rows == [
        {"gram": "a b", "cnt": 3},
        {"gram": "b a", "cnt": 1},
        {"gram": "b c", "cnt": 1},
    ]


def test_contamination_check(ray_session):
    import ray.data

    from retriv_ray.ops.textstats import contamination_check

    docs = [
        {"doc_id": 0, "text": "a b c d e f g h tail words here"},  # bench doc
        {"doc_id": 1, "text": "x a b c d e f g h y"},  # contains the bench gram
        {"doc_id": 2, "text": "clean text with eight tokens or more today"},
        {"doc_id": 3, "text": "too short"},  # < 8 tokens -> no row
    ]
    bench = {" ".join(docs[0]["text"].split()[:8])}
    out = contamination_check(
        ray.data.from_items(docs), bench, n=8
    ).to_pandas().set_index("doc_id")
    assert 3 not in out.index
    assert out.loc[0, "n_contaminated"] == 1  # its own first gram
    assert out.loc[1, "n_contaminated"] == 1 and out.loc[1, "n_grams"] == 3
    assert out.loc[2, "n_contaminated"] == 0


def test_token_rarity(ray_session):
    import ray.data

    from retriv_ray.ops.textstats import token_rarity

    docs = [
        {"doc_id": 0, "text": "a a b"},
        {"doc_id": 1, "text": "a c"},
        {"doc_id": 2, "text": ""},  # no tokens -> no row
    ]
    # corpus counts: a=3, b=1, c=1
    out = token_rarity(ray.data.from_items(docs)).to_pandas().set_index("doc_id")
    assert 2 not in out.index
    assert out.loc[0, "n_tokens"] == 3 and out.loc[0, "sum_cnt"] == 2 * 3 + 1
    assert out.loc[0, "min_cnt"] == 1
    assert out.loc[1, "n_tokens"] == 2 and out.loc[1, "sum_cnt"] == 4


def test_gopher_filter_each_rule(ray_session):
    """One doc violating each rule, one passing all."""
    import ray.data

    from retriv_ray.ops.textstats import gopher_filter

    good = "the quick brown fox jumps over the lazy dog and runs to " \
           "the river bank with great speed while birds watch from " \
           "tall trees near the water line today"  # 30 toks, stops, no dups
    docs = [
        {"doc_id": 0, "text": good},
        {"doc_id": 1, "text": "too short for the rule"},  # < 20 tokens
        {"doc_id": 2, "text": " ".join(["ab"] * 30)},  # mean len 2 < 3 (and dups)
        {"doc_id": 3, "text": " ".join(
            f"w{i}xxxx" for i in range(30))},  # zero stop hits
        {"doc_id": 4, "text": "the and " + " ".join(
            ["one two three"] * 10)},  # dup 3-grams >> 5%
    ]
    got = gopher_filter(ray.data.from_items(docs)).to_pandas()
    assert list(got["doc_id"]) == [0]
    assert got.iloc[0]["n_tokens"] == len(good.split())


# -- bigram LM stats ----------------------------------------------------------


def test_bigram_lm_stats_matches_brute_force(ray_session):
    import math

    import numpy as np
    import ray.data

    from retriv_ray.ops.textstats import bigram_lm_stats

    docs = {
        0: "a b a b c",
        1: "a b c d",
        2: "x",  # < 2 tokens -> no row
        3: "c d c d",
    }
    ds = ray.data.from_items(
        [{"doc_id": d, "text": t} for d, t in docs.items()]
    )
    # brute force
    from collections import Counter

    c12, c1 = Counter(), Counter()
    for t in docs.values():
        toks = t.split()
        for p in zip(toks, toks[1:]):
            c12[p] += 1
            c1[p[0]] += 1
    want = {}
    for d, t in docs.items():
        toks = t.split()
        if len(toks) < 2:
            continue
        n, s = 0, 0
        for p in zip(toks, toks[1:]):
            n += 1
            s += int(np.floor(1e4 * np.log(c12[p] / c1[p[0]])))
        want[d] = (n, s)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_logp_e4"])
        for r in bigram_lm_stats(ds).take_all()
    }
    assert got == want
    # sanity: conditional probabilities <= 1 -> non-positive log sums
    assert all(s <= 0 for _n, s in got.values())
