"""Windowing-op tests: salted split-and-stitch sessionize equals the
unsalted path AND the SQL oracle, including a pathological hot key
whose events span many salt buckets (verdict round-1 item 8)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

GAP = 1800
SALT = 3600  # 1h buckets -> the 3-day hot key spans ~72 buckets


def _mk_events():
    rng = np.random.default_rng(7)
    rows = []
    base = np.datetime64("2025-06-01T00:00:00", "us")
    # hot key 1: 5000 events over 3 days, gaps mostly < GAP with
    # occasional session breaks; many events sit exactly on bucket
    # boundaries' neighborhoods
    t = base
    for i in range(5000):
        step = int(rng.choice([30, 300, 900, 2400], p=[0.5, 0.3, 0.15, 0.05]))
        t = t + np.timedelta64(step, "s")
        rows.append((1, t))
    # normal keys
    for uid in (2, 3):
        t = base
        for i in range(50):
            t = t + np.timedelta64(int(rng.integers(60, 4000)), "s")
            rows.append((uid, t))
    # key with a single event, and one whose session spans an empty
    # bucket (gap 2500s > SALT would break... keep gap < GAP but > one
    # bucket is impossible with SALT=3600>GAP; instead exercise
    # boundary-straddling: events at bucket edges)
    edge = np.datetime64("2025-06-05T00:59:59", "us")
    rows.append((4, edge))
    rows.append((4, edge + np.timedelta64(2, "s")))  # crosses 01:00 bucket line
    rows.append((5, base))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    return df.sample(frac=1.0, random_state=3).reset_index(drop=True)  # unsorted


@pytest.fixture(scope="module")
def events(ray_session):
    import ray.data

    df = _mk_events()
    return df, ray.data.from_pandas(df).repartition(8)


def _oracle(df):
    con = duckdb.connect()
    con.register("events", df)
    out = con.execute(f"""
        WITH lagged AS (
          SELECT user_id, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL {GAP} SECONDS
                 THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        grp AS (
          SELECT user_id, ts,
            sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS g
          FROM lagged)
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               count(*)::BIGINT AS n_events
        FROM grp GROUP BY user_id, g
        ORDER BY user_id, session_start
    """).df()
    con.close()
    return out


def _norm(df):
    return (
        df.sort_values(["user_id", "session_start"])
        .reset_index(drop=True)[["user_id", "session_start", "session_end", "n_events"]]
    )


def test_salted_equals_unsalted_and_oracle(events):
    from retriv_ray.ops.windows import sessionize

    df, ds = events
    oracle = _norm(_oracle(df))
    unsalted = _norm(sessionize(ds, gap_seconds=GAP).to_pandas())
    salted = _norm(sessionize(ds, gap_seconds=GAP, salt_seconds=SALT).to_pandas())
    pd.testing.assert_frame_equal(unsalted, oracle, check_dtype=False)
    pd.testing.assert_frame_equal(salted, oracle, check_dtype=False)
    # the hot key really spans many buckets and stitching really merged
    hot = salted[salted.user_id == 1]
    span_s = (hot.session_end.max() - hot.session_start.min()).total_seconds()
    assert span_s > 20 * SALT
    assert (hot.n_events.sum()) == 5000


def test_salted_day_buckets(events):
    from retriv_ray.ops.windows import sessionize

    df, ds = events
    oracle = _norm(_oracle(df))
    salted = _norm(sessionize(ds, gap_seconds=GAP, salt_seconds=86400).to_pandas())
    pd.testing.assert_frame_equal(salted, oracle, check_dtype=False)


def test_hopping_window_covers_and_sums(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from retriv_ray.ops.windows import hopping_window

    base = np.datetime64("2025-06-01T00:15:00", "us")
    rows = [
        {"event_type": "a", "ts": base, "value": 1.0},                      # 00:15
        {"event_type": "a", "ts": base + np.timedelta64(2400, "s"), "value": 2.0},  # 00:55
        {"event_type": "b", "ts": base + np.timedelta64(3000, "s"), "value": 4.0},  # 01:05
    ]
    ds = ray.data.from_items(rows).repartition(2)
    df = (
        hopping_window(ds, window_s=3600, hop_s=1800)
        .to_pandas()
        .sort_values(["event_type", "window_start_s"])
        .reset_index(drop=True)
    )
    e = int(base.astype("datetime64[s]").astype(np.int64)) - 900  # 00:00 epoch s
    # event 00:15 -> windows starting 23:30, 00:00; 00:55 -> 00:00, 00:30;
    # b at 01:05 -> 00:30, 01:00
    expect = pd.DataFrame(
        [
            ("a", e - 1800, 1, 100),
            ("a", e, 2, 300),
            ("a", e + 1800, 1, 200),
            ("b", e + 1800, 1, 400),
            ("b", e + 3600, 1, 400),
        ],
        columns=["event_type", "window_start_s", "n_events", "value_cents"],
    )
    pd.testing.assert_frame_equal(df, expect, check_dtype=False)


@pytest.mark.parametrize("nparts", [1, 4])
def test_rollup_counts_matches_sql_rollup(ray_session, nparts):
    import duckdb
    import ray.data

    from retriv_ray.ops.windows import rollup_counts

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "lang": rng.choice(["en", "de", "fr"], 100),
            "source": rng.choice(["web", "pdf"], 100),
            "n_chars": rng.integers(1, 1000, 100).astype(np.int64),
        }
    )
    got = (
        rollup_counts(ray.data.from_pandas(df).repartition(nparts))
        .to_pandas()
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        """
        SELECT coalesce(lang, '<all>') AS lang,
               coalesce(source, '<all>') AS source,
               count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS value_sum
        FROM documents GROUP BY ROLLUP(lang, source)
        ORDER BY lang, source
        """
    ).df()
    pd.testing.assert_frame_equal(got, want)
    # grand total present exactly once
    assert (
        (got["lang"] == "<all>") & (got["source"] == "<all>")
    ).sum() == 1


@pytest.mark.parametrize("nparts", [1, 4])
def test_funnel_stages_greedy_min(ray_session, nparts):
    """Hand funnel: user 1 completes all 3 in order; user 2 clicks
    BEFORE viewing (click must not count); user 3 views only; user 4
    has only unrelated events (0 stages but present)."""
    import ray.data

    from retriv_ray.ops.windows import funnel_stages

    T = pd.Timestamp
    rows = [
        (1, "view", T("2025-01-01 00:00")),
        (1, "click", T("2025-01-01 01:00")),
        (1, "purchase", T("2025-01-01 02:00")),
        (2, "click", T("2025-01-01 00:00")),
        (2, "view", T("2025-01-01 01:00")),
        (3, "view", T("2025-01-01 00:00")),
        (4, "error", T("2025-01-01 00:00")),
        # user 5: click at the SAME instant as view -> strict > fails
        (5, "view", T("2025-01-01 00:00")),
        (5, "click", T("2025-01-01 00:00")),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    got = (
        funnel_stages(ray.data.from_pandas(df).repartition(nparts))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert dict(zip(got["user_id"], got["stages_completed"])) == {
        1: 3, 2: 1, 3: 1, 4: 0, 5: 1,
    }


def _mk_value_events(n=400, seed=11):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2025-03-01T00:00:00", "us")
    ts = base + np.cumsum(rng.integers(1, 7200, n)).astype("timedelta64[s]")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(1, 12, n).astype(np.int64),
            "event_type": rng.choice(["view", "click", "purchase"], n),
            "ts": ts.astype("datetime64[us]"),
            "value": np.round(rng.uniform(0, 50, n), 2),
        }
    )
    # ts-peer pairs inside one user exercise the RANGE peer-group rule
    df.loc[1, ["user_id", "ts"]] = [df.loc[0, "user_id"], df.loc[0, "ts"]]
    return df.sample(frac=1.0, random_state=5).reset_index(drop=True)


@pytest.mark.parametrize("nparts", [1, 7])
def test_retention_cohorts_matches_sql(ray_session, nparts):
    import ray.data

    from retriv_ray.ops.windows import retention_cohorts

    df = _mk_value_events()
    got = (
        retention_cohorts(ray.data.from_pandas(df).repartition(nparts))
        .to_pandas()
        .sort_values(["cohort_day_s", "offset_days"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute(
        """
        WITH d AS (SELECT DISTINCT user_id,
                          epoch(date_trunc('day', ts))::BIGINT AS day_s
                   FROM events),
        f AS (SELECT user_id, min(day_s) AS first_s FROM d GROUP BY user_id)
        SELECT f.first_s AS cohort_day_s,
               (d.day_s - f.first_s) // 86400 AS offset_days,
               count(*)::BIGINT AS n_users
        FROM d JOIN f USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False
    )


@pytest.mark.parametrize("nparts", [1, 7])
def test_rolling_time_stats_matches_sql_range_window(ray_session, nparts):
    import ray.data

    from retriv_ray.ops.windows import rolling_time_stats

    df = _mk_value_events()
    got = (
        rolling_time_stats(
            ray.data.from_pandas(df).repartition(nparts), window_seconds=3600
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
               sum(cents) OVER w::BIGINT AS sum_cents
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 3600 SECONDS PRECEDING
                     AND CURRENT ROW)
        ORDER BY event_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "n_window", "sum_cents"]].astype("int64"),
        want.astype("int64"),
        check_dtype=False,
    )


@pytest.mark.parametrize("nparts", [1, 7])
def test_distinct_users_daily_matches_sql(ray_session, nparts):
    import ray.data

    from retriv_ray.ops.windows import distinct_users_daily

    df = _mk_value_events()
    got = (
        distinct_users_daily(ray.data.from_pandas(df).repartition(nparts))
        .to_pandas()
        .sort_values(["event_type", "day_s"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute(
        """
        SELECT event_type, epoch(date_trunc('day', ts))::BIGINT AS day_s,
               count(DISTINCT user_id)::BIGINT AS n_users
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    assert list(got["event_type"]) == list(want["event_type"])
    pd.testing.assert_frame_equal(
        got[["day_s", "n_users"]].astype("int64"),
        want[["day_s", "n_users"]].astype("int64"),
        check_dtype=False,
    )


def test_date_histogram_pipeline_gaps_and_partitioning(ray_session):
    """Derivative diffs the previous PRESENT bucket (gap semantics),
    first bucket per key is null, moving sum is trailing-3, and the
    result is partition-independent."""
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from retriv_ray.ops.windows import date_histogram_pipeline

    # key 'a': months 1, 2, 4 (gap at 3) with cents 100, 250, 400
    def t(m, d=1):
        return dt.datetime(2024, m, d)

    rows = [
        {"event_type": "a", "ts": t(1), "value": 1.00},
        {"event_type": "a", "ts": t(2, 5), "value": 2.50},
        {"event_type": "a", "ts": t(4, 9), "value": 4.00},
        {"event_type": "b", "ts": t(1), "value": 9.99},
    ]
    for nparts in (1, 4):
        ds = ray.data.from_items(rows).repartition(nparts)
        out = date_histogram_pipeline(ds, unit="month").to_pandas()
        a = out[out.event_type == "a"]
        assert list(a["value_cents"]) == [100, 250, 400]
        assert list(a["cum_cents"]) == [100, 350, 750]
        d = a["delta_cents"].tolist()
        assert d[0] is None or d[0] != d[0]  # null first
        assert d[1:] == [150, 150]  # month-4 bucket diffs month-2 (gap)
        assert list(a["moving_cents"]) == [100, 350, 750]
        b = out[out.event_type == "b"]
        assert list(b["value_cents"]) == [999]
        assert b["delta_cents"].isna().all()


def test_numeric_histogram_negative_floor_and_partitioning(ray_session):
    """Negative values bucket toward -infinity (floor, ES semantics);
    empty buckets omitted; partition-independent."""
    import ray.data

    from retriv_ray.ops.windows import numeric_histogram

    rows = [{"v": x} for x in [-5, -1, 0, 3, 9, 10, 25]]
    for nparts in (1, 4):
        ds = ray.data.from_items(rows).repartition(nparts)
        out = numeric_histogram(ds, "v", 10).to_pandas()
        got = {int(b): (int(n), int(s)) for b, n, s in
               zip(out["bucket"], out["n"], out["value_sum"])}
        assert got == {-10: (2, -6), 0: (3, 12), 10: (1, 10), 20: (1, 25)}


def test_rank_eval_bootstrap_weights_and_partitioning(ray_session):
    """Deterministic md5 weights (mean ~1); resample sums equal the
    direct weighted sums; partition-independent."""
    import hashlib

    import ray.data

    from retriv_ray.eval import rank_eval_bootstrap_ds

    rows = [
        {"q_id": f"q{i}", "rr_e6": 1000000 // (i + 1),
         "ndcg_e6": 900000 - i, "recall_e6": 500000 + i}
        for i in range(9)
    ]
    def w(q, b):
        return int.from_bytes(
            hashlib.md5(f"{q}|{b}".encode()).digest()[8:16], "little"
        ) % 3

    for nparts in (1, 4):
        ds = ray.data.from_items(rows).repartition(nparts)
        out = rank_eval_bootstrap_ds(ds, n_boot=5).to_pandas()
        assert list(out["b"]) == [0, 1, 2, 3, 4]
        for b in range(5):
            row = out[out.b == b].iloc[0]
            assert row["w_n"] == sum(w(r["q_id"], b) for r in rows)
            assert row["w_rr_e6"] == sum(
                w(r["q_id"], b) * r["rr_e6"] for r in rows
            )


def test_population_drift_identical_and_shifted(ray_session):
    """Identical populations give ~zero PSI terms; a shifted one gives
    positive total PSI; partition-independent."""
    import pyarrow as pa
    import ray.data

    from retriv_ray.ops.windows import population_drift

    rng = np.random.default_rng(9)
    a = pa.table({"v": rng.integers(0, 100, 2000).astype(np.int64)})
    same = population_drift(
        ray.data.from_arrow(a).repartition(3),
        ray.data.from_arrow(a).repartition(2),
        "v",
        10,
    ).to_pandas()
    # identical counts: pa == pb, every term is floor(0) or floor(-0)
    assert (same["psi_term_e9"].abs() <= 1).all()
    shifted = pa.table({"v": (a.column("v").to_numpy() + 50).astype(np.int64)})
    drift = population_drift(
        ray.data.from_arrow(a), ray.data.from_arrow(shifted), "v", 10
    ).to_pandas()
    assert drift["psi_term_e9"].sum() > 100_000_000  # PSI >> 0.1
    assert (drift["n_a"] + drift["n_b"] > 0).all()
