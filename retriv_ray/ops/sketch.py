"""Mergeable sketches — the 100 TB path for cardinality statistics.

Exact per-key distinct counts (``ops.windows.distinct_users_daily``)
shuffle every (key, value) pair; at 10^12 rows that is the corpus.
A HyperLogLog sketch (Flajolet et al. 2007) replaces the exchange
with <= m register rows per key per block and merges by ``max`` —
associative, commutative, idempotent, so ANY partitioning gives the
same registers.

Determinism contract (what makes the driver SQL oracle possible):
every step is integer-exact and pinned to the repo-wide hash
convention —

    h    = md5 low-8-bytes little-endian of str(value)   (= DuckDB
           ``md5_number_lower``)
    reg  = h % m                 (m = 2^p registers)
    w    = (h >> p) & (2^32 - 1) (32 bits above the index)
    rho  = 33 - bit_length(w)    (w = 0 -> 33)
    M[reg] = max rho

    S    = sum over ALL m registers of 2^(33 - M[reg])   (exact int;
           empty registers have M = 0 and contribute 2^33)
    raw_e2   = (alpha_e6 * m^2 * 2^33) // (10^4 * S)     (floor(100*E))
    alpha_e6 = floor(10^6 * 0.7213 / (1 + 1.079 / m))

with the standard small-range correction: if any register is empty
(V > 0) and raw_e2 <= 250*m, the estimate is linear counting
``floor(100 * m * ln(m / V))`` instead (one libm ``ln`` of a ratio of
integers — the same float64-parity assumption the BM25 oracles rely
on). No large-range correction (64-bit hash space; collisions are
negligible below ~10^12 distinct values). Relative error of standard
HLL is ~1.04/sqrt(m): p=8 -> ~6.5%, p=12 -> ~1.6%.

Shuffle shape: ONE groupby(key) whose input is per-batch partial
registers — at most min(m, batch-distinct) rows per (key, batch) —
and whose per-group fold touches <= m rows. The driver holds nothing.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from retriv_ray.ops.dedup import _md5_low64_many


def _alpha_e6(m: int) -> int:
    return int(math.floor(1e6 * 0.7213 / (1.0 + 1.079 / m)))


def _rho32(h: np.ndarray, p: int) -> np.ndarray:
    """rho = 33 - bit_length((h >> p) & 0xFFFFFFFF), vectorized.
    w < 2^32 is exact in float64, so frexp gives bit_length directly."""
    w = (h >> np.uint64(p)) & np.uint64(0xFFFFFFFF)
    bl = np.zeros(len(w), dtype=np.int64)
    nz = w != 0
    # frexp: w = frac * 2^exp with frac in [0.5, 1) -> exp == bit_length
    bl[nz] = np.frexp(w[nz].astype(np.float64))[1]
    return 33 - bl


def approx_distinct(
    ds,
    key_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 8,
):
    """Per-key approximate distinct count: (key_col, distinct_e2)
    where ``distinct_e2 = floor(100 * estimate)`` under the exact
    integer HLL contract in the module docstring. One groupby(key)
    shuffle of partial (key, reg, rho) registers."""
    if not (4 <= p <= 16):
        raise ValueError(f"p={p} out of range [4, 16]")
    m = 1 << p
    a_e6 = _alpha_e6(m)

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        vals = batch.column(value_col).to_pylist()
        h = _md5_low64_many([str(v) for v in vals])
        reg = (h % np.uint64(m)).astype(np.int64)
        rho = _rho32(h, p)
        kcodes = pa.array(keys).dictionary_encode()
        kc = kcodes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # max rho per (key, reg): lexsort then run-length reduce
        order = np.lexsort((-rho, reg, kc))
        kc_s, reg_s, rho_s = kc[order], reg[order], rho[order]
        first = np.concatenate(
            ([True], (kc_s[1:] != kc_s[:-1]) | (reg_s[1:] != reg_s[:-1]))
        ) if len(kc_s) else np.empty(0, dtype=bool)
        idx = np.flatnonzero(first)
        dict_vals = kcodes.dictionary
        return pa.Table.from_arrays(
            [
                dict_vals.take(pa.array(kc_s[idx])),
                pa.array(reg_s[idx]),
                pa.array(rho_s[idx]),
            ],
            names=[key_col, "reg", "rho"],
        )

    def fold(group: pa.Table) -> pa.Table:
        reg = group.column("reg").to_numpy()
        rho = group.column("rho").to_numpy()
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, reg, rho)
        v = int((regs == 0).sum())
        # exact integers (python int: numerator exceeds int64)
        s = int(np.sum(np.int64(1) << (33 - regs)))
        raw_e2 = (a_e6 * m * m * (1 << 33)) // (10**4 * s)
        if v > 0 and raw_e2 <= 250 * m:
            est_e2 = int(math.floor(100.0 * m * math.log(m / v)))
        else:
            est_e2 = int(raw_e2)
        return pa.Table.from_arrays(
            [
                group.column(key_col).slice(0, 1),
                pa.array([est_e2], type=pa.int64()),
            ],
            names=[key_col, "distinct_e2"],
        )

    return (
        ds.select_columns([key_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(fold, batch_format="pyarrow")
    )


def approx_distinct_sql(
    table: str, key_col: str, value_col: str, p: int = 8
) -> str:
    """The DuckDB twin of :func:`approx_distinct` — same integer HLL
    contract, HUGEINT for the one product that exceeds int64. Kept
    beside the op so the two specs can't drift apart."""
    m = 1 << p
    a_e6 = _alpha_e6(m)
    return f"""
        WITH h AS (
          SELECT {key_col} AS k,
                 md5_number_lower({value_col}::VARCHAR)::HUGEINT AS h
          FROM {table}),
        regs AS (
          SELECT k, (h % {m})::BIGINT AS reg,
                 max(CASE WHEN ((h // {m}) % 4294967296) = 0 THEN 33
                     ELSE 33 - length(format('{{:b}}',
                          ((h // {m}) % 4294967296)::BIGINT)) END) AS rho
          FROM h GROUP BY k, reg),
        agg AS (
          SELECT k,
                 sum((1::BIGINT << (33 - rho))::HUGEINT) AS s_used,
                 count(*) AS n_regs
          FROM regs GROUP BY k),
        fin AS (
          SELECT k,
                 s_used + ({m} - n_regs)::HUGEINT * (1::BIGINT << 33) AS s,
                 {m} - n_regs AS v
          FROM agg),
        est AS (
          SELECT k, v,
                 ({a_e6}::HUGEINT * {m} * {m} * (1::BIGINT << 33))
                   // (10000::HUGEINT * s) AS raw_e2
          FROM fin)
        SELECT k AS {key_col},
               CASE WHEN v > 0 AND raw_e2 <= {250 * m}
                    THEN floor(100.0 * {m} * ln({m}.0 / v))::BIGINT
                    ELSE raw_e2::BIGINT END AS distinct_e2
        FROM est ORDER BY {key_col}
    """


def approx_topk(
    ds,
    col: str,
    k: int = 10,
    capacity: int = 4096,
    weight_col: str = None,
):
    """Approximate heavy hitters with an EXPLICIT error bound: the
    top-``k`` values of ``col`` by (weighted) count, where each block
    contributes only its ``capacity`` locally-heaviest values to the
    exchange — the Misra-Gries/SpaceSaving bound made distributed.
    Exact ``top_ngrams``-style counting ships EVERY distinct value
    once per block; at 10^12 rows with a Zipf tail that is the
    shuffle. This op caps the exchange at ``capacity`` rows per block
    and carries the truncation loss as data:

    returns (value, est_count, max_undercount) — ``est_count`` is the
    sum of the value's SURVIVING per-block counts (never an
    overcount), and ``max_undercount`` is the sum over blocks of the
    largest count that block dropped, i.e. a per-value bound on how
    much ``est_count`` can be below the true count (the standard MG
    merge bound). ``est_count + max_undercount >= true >= est_count``.
    With ``capacity`` >= any block's distinct-value count nothing is
    dropped, every bound is 0 and the result equals the exact GROUP
    BY — which is what the driver oracle pins; the capped behavior is
    pinned by tests.

    Shuffle shape: per-block exact count (np.unique) -> local
    top-``capacity`` by (count desc, value asc) + ONE sentinel row
    carrying the block's drop bound -> a single groupby(value) sum ->
    top-``k`` by (est desc, value asc) plus the global bound folded
    from the sentinels. The output is deterministic for a fixed
    blocking; est/bounds depend on blocking only through WHICH rows
    were dropped (document the blocking when reporting bounds).
    """
    import pyarrow.compute as pc

    if k < 1 or capacity < 1:
        raise ValueError("k and capacity must be >= 1")
    SENTINEL = "\x00__mg_dropped__"

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        if weight_col is not None:
            w = batch.column(weight_col).to_numpy().astype(np.int64)
        else:
            w = np.ones(len(vals), dtype=np.int64)
        enc = pa.array(vals, type=pa.string()).dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.bincount(codes, weights=w, minlength=len(enc.dictionary)).astype(
            np.int64
        )
        uniq = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        order = np.lexsort((uniq, -counts))
        keep, drop = order[:capacity], order[capacity:]
        out_v = uniq[keep].tolist()
        out_c = counts[keep]
        out_b = np.zeros(len(keep), dtype=np.int64)
        if len(drop):
            # one sentinel row: the block's worst-case per-value loss
            out_v.append(SENTINEL)
            out_c = np.append(out_c, 0)
            out_b = np.append(out_b, counts[drop].max())
        return pa.Table.from_arrays(
            [
                pa.array(out_v, type=pa.string()),
                pa.array(out_c),
                pa.array(out_b),
            ],
            names=[col, "est_count", "bound"],
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(col)
        .aggregate(
            Sum("est_count", alias_name="est_count"),
            Sum("bound", alias_name="bound"),
        )
        .materialize()  # reused: sentinel probe + ranking
    )
    sent = agg.map_batches(
        lambda t: t.filter(pc.equal(t.column(col), SENTINEL)),
        batch_format="pyarrow",
    ).take_all()  # bounded: at most one sentinel row survives the groupby
    global_bound = int(sent[0]["bound"]) if sent else 0

    def topk(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.not_equal(batch.column(col), SENTINEL))
        vals = np.asarray(batch.column(col).to_pylist(), dtype=object)
        est = batch.column("est_count").to_numpy()
        order = np.lexsort((vals, -est))[: k]
        return pa.Table.from_arrays(
            [
                pa.array(vals[order].tolist(), type=pa.string()),
                pa.array(est[order]),
                pa.array(np.full(len(order), global_bound, dtype=np.int64)),
            ],
            names=[col, "est_count", "max_undercount"],
        )

    # per-block partial top-k bounds the final exchange; the global
    # ranking needs all survivors together for the cut, so the final
    # top-k runs over the (capacity x blocks)-bounded aggregate
    return (
        agg.map_batches(topk, batch_format="pyarrow")
        .sort(["est_count", col], descending=[True, False])
        .limit(k)
    )


# -- count-min sketch --------------------------------------------------------

# fixed odd 32-bit row constants (Carter-Wegman style derivation from
# ONE md5 per value: row hash j = (h * A[j] + B[j]) mod 2^64, then
# % w). One md5 + d integer ops per row beats d md5 calls, and the
# wrap-around is exact in BOTH engines (numpy uint64 wraps mod 2^64;
# DuckDB computes in HUGEINT and takes % 2^64 explicitly).
_CMS_A = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F,
          0x165667B1, 0xD3A2646D)
_CMS_B = (0x5BD1E995, 0x1B873593, 0xCC9E2D51, 0xE6546B64,
          0x85EBCA6B, 0xC2B2AE35)
_U64 = 1 << 64


def approx_count(ds, value_col: str, probes, d: int = 4, w: int = 1024):
    """Count-min sketch (Cormode & Muthukrishnan 2005) point-count
    estimates for the ``probes``: (value, est) with the one-sided
    guarantee ``true <= est <= true + overcount`` (E[overcount] <=
    N/w per row, min over d rows). Returns a pa.Table ordered by
    value.

    The 100 TB path for "how often does THIS value occur" when the
    full GROUP BY is too wide: the exchange moves at most d*w counter
    rows per block (d, w fixed — e.g. 4x4096 = 16k rows) through ONE
    groupby((row, cell)).sum, and counters merge by + under any
    partitioning. Integer-exact end to end — one md5 per value (the
    repo hash convention) and d affine row hashes mod 2^64 — so the
    DuckDB twin (:func:`approx_count_sql`, generated from the same
    constants) reproduces every estimate bit for bit.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from retriv_ray.ops.dedup import _md5_low64_many

    if d > len(_CMS_A):
        raise ValueError(f"d <= {len(_CMS_A)} supported")

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], type=pa.int64())] * 3,
            names=["row", "cell", "c"],
        )
        if batch.num_rows == 0:
            return empty
        col = pc.cast(batch.column(value_col), pa.string())
        if col.null_count:  # null values dropped (twin contract: the
            col = col.drop_null()  # SQL side filters IS NOT NULL)
        if len(col) == 0:
            return empty
        h = _md5_low64_many(col.to_pylist())
        rows, cells, counts = [], [], []
        for j in range(d):
            hj = (h * np.uint64(_CMS_A[j]) + np.uint64(_CMS_B[j])) % np.uint64(
                w
            )
            cell, c = np.unique(hj, return_counts=True)
            rows.append(np.full(len(cell), j, dtype=np.int64))
            cells.append(cell.astype(np.int64))
            counts.append(c.astype(np.int64))
        return pa.Table.from_arrays(
            [
                pa.array(np.concatenate(rows)),
                pa.array(np.concatenate(cells)),
                pa.array(np.concatenate(counts)),
            ],
            names=["row", "cell", "c"],
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["row", "cell"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    table = {}
    if "row" in agg.columns:  # an all-empty input aggregates to a
        # zero-column frame; every estimate is then 0 (SQL twin:
        # empty cells CTE -> coalesce(c, 0))
        for r, cl, c in zip(agg["row"], agg["cell"], agg["c"]):
            table[(int(r), int(cl))] = int(c)
    out_v, out_e = [], []
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        for v in sorted({str(p) for p in probes}):  # dedup: SQL GROUPs
            hv = _md5_low64_many([str(v)])[0]
            est = min(
                table.get(
                    (
                        j,
                        int(
                            (hv * np.uint64(_CMS_A[j]) + np.uint64(_CMS_B[j]))
                            % np.uint64(w)
                        ),
                    ),
                    0,
                )
                for j in range(d)
            )
            out_v.append(str(v))
            out_e.append(est)
    return pa.Table.from_arrays(
        [
            pa.array(out_v, type=pa.string()),
            pa.array(out_e, type=pa.int64()),
        ],
        names=["value", "est"],
    )


def approx_count_sql(
    table: str, value_col: str, probes, d: int = 4, w: int = 1024
) -> str:
    """The DuckDB twin of :func:`approx_count` — same md5 + affine row
    hashes, same min-over-rows, generated from the same constants.
    Probe strings are arbitrary user values: embedded single quotes
    are SQL-escaped (doubled) when building the VALUES list."""
    probe_values = " , ".join(
        "('" + v.replace("'", "''") + "')"
        for v in sorted({str(p) for p in probes})
    )
    rows_j = " , ".join(f"({j})" for j in range(d))

    def cell_expr(src: str) -> str:
        return (
            f"(((md5_number_lower({src})::HUGEINT * "
            f"CASE r.j {' '.join(f'WHEN {j} THEN {_CMS_A[j]}' for j in range(d))} END"
            f" + CASE r.j {' '.join(f'WHEN {j} THEN {_CMS_B[j]}' for j in range(d))} END)"
            f" % {_U64}::HUGEINT) % {w})::BIGINT"
        )

    return f"""
        WITH rows_(j) AS (VALUES {rows_j}),
        cells AS (
          SELECT r.j AS row_, {cell_expr(f"t.{value_col}::VARCHAR")} AS cell,
                 count(*)::BIGINT AS c
          FROM {table} t CROSS JOIN rows_ r
          WHERE t.{value_col} IS NOT NULL
          GROUP BY 1, 2),
        probes(v) AS (VALUES {probe_values}),
        lookups AS (
          SELECT p.v, r.j AS row_, {cell_expr("p.v")} AS cell
          FROM probes p CROSS JOIN rows_ r)
        SELECT l.v AS value, min(coalesce(c.c, 0))::BIGINT AS est
        FROM lookups l LEFT JOIN cells c
          ON c.row_ = l.row_ AND c.cell = l.cell
        GROUP BY l.v ORDER BY l.v
    """
