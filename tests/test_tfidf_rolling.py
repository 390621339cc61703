"""tfidf_keywords + rolling_event_stats: hand-oracle parity,
partition independence, and edge cases (empty text, single-row keys,
score_e4 exact-tie determinism)."""

import duckdb
import numpy as np
import pandas as pd
import pytest


# ---------------------------------------------------------------------------
# tfidf_keywords
# ---------------------------------------------------------------------------


def _mk_docs():
    # doc 3 is empty (must emit no rows); 'zeta' appears in every
    # non-empty doc (df=3 of N=4)
    return pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "alpha alpha beta zeta",
                "beta gamma zeta",
                "alpha delta delta delta zeta",
                "",
            ],
        }
    )


def _tfidf_oracle(df, k):
    con = duckdb.connect()
    con.register("documents", df)
    return con.execute(
        f"""
        WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                      FROM documents WHERE text <> ''),
        tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
               FROM toks GROUP BY doc_id, term),
        df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
        n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        scored AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                          floor(10000.0 * tf.tf::DOUBLE
                                * ln(n.n / df.df::DOUBLE))::BIGINT AS score_e4
                   FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
        SELECT doc_id, rank, term, tf, df, score_e4 FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score_e4 DESC, term) AS rank
          FROM scored)
        WHERE rank <= {k} ORDER BY doc_id, rank
        """
    ).df()


@pytest.mark.parametrize("nparts", [1, 4])
def test_tfidf_keywords_matches_oracle(ray_session, nparts):
    import ray.data

    from retriv_ray.ops.textstats import tfidf_keywords

    df = _mk_docs()
    ds = ray.data.from_pandas(df).repartition(nparts)
    got = (
        tfidf_keywords(ds, k=3)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    want = _tfidf_oracle(df, 3)
    pd.testing.assert_frame_equal(
        got[["doc_id", "rank", "term", "tf", "df", "score_e4"]].astype(
            {"rank": "int64"}
        ),
        want.astype({"rank": "int64"}),
    )
    # doc 3 (empty) emits nothing; zeta has df=3 of N=4 docs ->
    # score_e4 = floor(1e4 * ln(4/3)) = 2876 everywhere (tf=1)
    assert 3 not in set(got["doc_id"])
    assert (got.loc[got["term"] == "zeta", "score_e4"] == 2876).all()


def test_tfidf_exact_tie_is_term_ordered(ray_session):
    # 'aaa' and 'bbb' have identical (tf, df) -> identical score; rank
    # must break by term ascending, deterministically
    import ray.data

    from retriv_ray.ops.textstats import tfidf_keywords

    df = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["bbb aaa", "ccc"]}
    )
    got = (
        tfidf_keywords(ray.data.from_pandas(df), k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
    )
    d0 = got[got["doc_id"] == 0]
    assert list(d0["term"]) == ["aaa", "bbb"]
    assert list(d0["rank"]) == [1, 2]


# ---------------------------------------------------------------------------
# rolling_event_stats
# ---------------------------------------------------------------------------


def _mk_events():
    rng = np.random.default_rng(11)
    n = 400
    base = np.datetime64("2025-06-01T00:00:00", "us")
    ts = base + rng.integers(0, 86_400, n).astype("timedelta64[s]")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            # duplicate timestamps per user to exercise the id tie-break
            "user_id": rng.integers(0, 7, n).astype(np.int64),
            "value": np.round(rng.normal(50, 20, n), 4),
        }
    )
    df.loc[1, "ts"] = df.loc[0, "ts"]
    df.loc[1, "user_id"] = df.loc[0, "user_id"]
    return df


@pytest.mark.parametrize("nparts", [1, 5])
def test_rolling_matches_sql_window(ray_session, nparts):
    import ray.data

    from retriv_ray.ops.windows import rolling_event_stats

    df = _mk_events()
    got = (
        rolling_event_stats(
            ray.data.from_pandas(df).repartition(nparts), window_rows=5
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute(
        """
        WITH e AS (SELECT event_id, user_id, ts,
                          floor(value * 100)::BIGINT AS cents FROM events)
        SELECT event_id, user_id,
               count(*) OVER w::BIGINT AS n_window,
               sum(cents) OVER w::BIGINT AS sum_cents,
               max(cents) OVER w::BIGINT AS max_cents
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "n_window", "sum_cents", "max_cents"]],
        want,
    )


def test_rolling_single_event_key(ray_session):
    import ray.data

    from retriv_ray.ops.windows import rolling_event_stats

    df = pd.DataFrame(
        {
            "event_id": [7],
            "ts": [pd.Timestamp("2025-01-01")],
            "user_id": [1],
            "value": [12.345],
        }
    )
    got = rolling_event_stats(ray.data.from_pandas(df)).to_pandas()
    assert got.iloc[0]["n_window"] == 1
    assert got.iloc[0]["sum_cents"] == 1234  # floor(1234.5)
    assert got.iloc[0]["max_cents"] == 1234


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nparts", [1, 4])
def test_pmi_collocations_hand_case(ray_session, nparts):
    """'hong kong' always co-occurs (high PMI); 'the cat' shares 'the'
    with many contexts (low PMI). Values checked against the closed
    form pmi = ln((cxy/N2) / ((cx/N1)*(cy/N1)))."""
    import ray.data

    from retriv_ray.ops.textstats import pmi_collocations

    docs = (
        [{"doc_id": i, "text": "hong kong is big"} for i in range(5)]
        + [{"doc_id": 10 + i, "text": "the cat sat"} for i in range(5)]
        + [{"doc_id": 20 + i, "text": "the dog ran"} for i in range(5)]
    )
    t = pmi_collocations(
        ray.data.from_items(docs).repartition(nparts), k=10, min_count=5
    )
    df = t.to_pandas()
    n1 = 5 * 4 + 5 * 3 + 5 * 3  # unigram positions (docs of 4/3/3 toks)
    n2 = 5 * 3 + 5 * 2 + 5 * 2  # bigram positions
    pmi_hk = np.floor(10000 * np.log((5.0 * n1 * n1) / (n2 * 5.0 * 5.0)))
    pmi_thecat = np.floor(10000 * np.log((5.0 * n1 * n1) / (n2 * 10.0 * 5.0)))
    by = dict(zip(df["gram"], df["pmi_e4"]))
    assert by["hong kong"] == int(pmi_hk)
    assert by["the cat"] == int(pmi_thecat)
    assert by["hong kong"] > by["the cat"]
    # ranking: pmi desc
    assert list(df["pmi_e4"]) == sorted(df["pmi_e4"], reverse=True)
    assert (df["cnt"] >= 5).all()


def test_profile_columns_nulls_and_distinct(ray_session):
    import ray.data

    from retriv_ray.ops.textstats import profile_columns

    df = pd.DataFrame(
        {
            "a": pd.array([1, 2, 2, None, 5], dtype="Int64"),
            "b": ["x", "y", "x", "x", None],
        }
    )
    t = profile_columns(ray.data.from_pandas(df), cols=["a", "b"]).to_pandas()
    ra = t[t["col"] == "a"].iloc[0]
    rb = t[t["col"] == "b"].iloc[0]
    assert (ra["n"], ra["n_null"], ra["n_distinct"]) == (5, 1, 3)
    assert (ra["min_v"], ra["max_v"]) == ("1", "5")
    assert (rb["n"], rb["n_null"], rb["n_distinct"]) == (5, 1, 2)
    assert (rb["min_v"], rb["max_v"]) == ("x", "y")
