"""Relational join primitives for the analytics side of the engine.

Ray Data 2.49 ships a shuffle hash join (``Dataset.join``) — correct
for fact-x-fact joins, but an all-to-all exchange of BOTH sides. The
classic warehouse pattern for star/snowflake schemas is different:
dimension tables are orders of magnitude smaller than fact tables, so
the dimension side should be built ONCE, broadcast via the object
store, and probed map-side inside every fact batch — zero shuffle,
zero fact-row movement.

- :func:`broadcast_join` — map-side hash join of a Dataset against a
  small build side (``ray.put`` once, zero-copy ``ray.get`` per task,
  Acero ``pa.Table.join`` per batch — vectorized C++, no Python row
  loop). Supports inner / left outer / left semi / left anti. A loud
  row-count guard refuses build sides past ``broadcast_limit`` and
  points at the shuffle join instead of silently OOM-ing workers.
- :func:`star_revenue_topk` — the composed TPC-H-Q3-shaped pipeline:
  broadcast semi-join of the mid fact against a filtered dimension,
  shuffle join of the big fact against the reduced mid fact, exact
  integer-cents revenue aggregation, tiny top-k. The shape a 100-TB
  star query should compile to: the only all-to-all is the
  fact-x-fact join, and it runs AFTER both sides were pruned.

Money math: TPC-H prices/discounts have exactly 2 decimals, so
``revenue = extendedprice * (1 - discount)`` is computed as
``round(price*100) * (100 - round(discount*100))`` in int64 —
order-independent under any partitioning, and the DuckDB oracle can
pin bit-equal sums with the same expression.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from retriv_ray.ops._safejoin import arrow_schema, safe_join

_JOIN_TYPES = {
    "inner": "inner",
    "left": "left outer",
    "semi": "left semi",
    "anti": "left anti",
}


def _as_small_table(small, columns: Optional[Sequence[str]], limit: int) -> pa.Table:
    """Normalize the build side to one combined Arrow table, enforcing
    the broadcast size guard BEFORE gathering blocks to the driver."""
    import ray

    if isinstance(small, pa.Table):
        t = small
    elif hasattr(small, "to_arrow_refs"):  # ray.data.Dataset
        if columns is not None:
            small = small.select_columns(list(columns))
        small = small.materialize()  # one execution: count + gather
        n = small.count()
        if n > limit:
            raise ValueError(
                f"broadcast_join build side has {n} rows > broadcast_limit="
                f"{limit}; a side this large must go through the shuffle "
                "hash join (Dataset.join) instead of a driver broadcast"
            )
        parts = ray.get(list(small.to_arrow_refs()))
        live = [p for p in parts if p.num_rows]
        if live:
            t = pa.concat_tables(live, promote_options="default")
        elif parts:
            t = parts[0]
        else:
            raise ValueError("broadcast_join build side is empty (no blocks)")
    else:  # pandas
        t = pa.Table.from_pandas(small, preserve_index=False)
    if columns is not None:
        t = t.select([c for c in columns if c in t.column_names])
    if t.num_rows > limit:
        raise ValueError(
            f"broadcast_join build side has {t.num_rows} rows > "
            f"broadcast_limit={limit}; use the shuffle hash join"
        )
    return t.combine_chunks()


def broadcast_join(
    ds,
    small,
    on: Union[str, Sequence[str]],
    right_on: Union[str, Sequence[str], None] = None,
    how: str = "inner",
    right_columns: Optional[Sequence[str]] = None,
    broadcast_limit: int = 5_000_000,
):
    """Map-side hash join of ``ds`` (the probe / fact side, streamed)
    against ``small`` (the build / dimension side, broadcast whole).

    ``small`` may be a Ray Dataset, a pyarrow Table, or a pandas
    DataFrame; it is projected to ``right_columns`` (always including
    the key), shipped to the object store ONCE via ``ray.put``, and
    probed zero-copy inside every batch with Acero's hash join
    (``pa.Table.join``) — the fact side never shuffles and never
    leaves its blocks. ``how`` is one of inner / left / semi / anti
    (semi and anti return probe-side columns only).

    Scale contract: build side must fit in one object-store object on
    every node (the ``broadcast_limit`` guard, default 5M rows). Rows
    within an output block may be reordered relative to the input
    block (hash-join output order); downstream sorts/aggregations in
    this engine never rely on block-internal order.
    """
    import ray

    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_JOIN_TYPES)}")
    join_type = _JOIN_TYPES[how]
    keys = [on] if isinstance(on, str) else list(on)
    rkeys = (
        keys
        if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )
    if right_columns is not None:
        right_columns = list(dict.fromkeys(list(rkeys) + list(right_columns)))
    small_t = _as_small_table(small, right_columns, broadcast_limit)
    overlap = (set(small_t.column_names) - set(rkeys)) & set(ds.schema().names)
    if overlap and how in ("inner", "left"):
        raise ValueError(
            f"non-key columns {sorted(overlap)} exist on both sides; "
            "project one side (right_columns=...) or rename first"
        )
    small_ref = ray.put(small_t)

    def probe(batch: pa.Table) -> pa.Table:
        build = ray.get(small_ref)
        return batch.join(
            build,
            keys=keys,
            right_keys=rkeys,
            join_type=join_type,
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """2-decimal currency column -> exact int64 cents (round-half-away
    matches DuckDB's ``round()``)."""
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def star_revenue_topk(
    lineitem,
    orders,
    customer,
    segment: str = "BUILDING",
    order_before: str = "1995-03-15",
    ship_after: str = "1995-03-15",
    k: int = 10,
):
    """TPC-H Q3 shape over the test star schema: top-``k`` open orders
    of one market segment by exact integer revenue.

    Pipeline (the 100-TB plan, stage by stage):
    1. ``customer`` filtered to ``segment`` and projected to its key —
       a dimension: broadcast.
    2. ``orders`` filtered by date map-side, then broadcast SEMI join
       against the customer keys — no orders row moves, losers drop
       before the expensive join.
    3. ``lineitem`` filtered by ship date and projected to
       (l_orderkey, revenue_cents) — 16 bytes/row into the join.
    4. the one all-to-all: shuffle hash join of the pruned lineitem
       against the pruned orders on orderkey (both sides are now the
       small fraction that survives their filters).
    5. exact int64 groupby-sum, then a k-row sort on the aggregate
       (group count is bounded by surviving orders).

    Returns (l_orderkey, o_orderdate, o_orderpriority,
    revenue_cents) sorted by (-revenue_cents, l_orderkey), k rows.
    """
    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 4))
    cutoff_order = np.datetime64(order_before, "us").astype("int64")
    cutoff_ship = np.datetime64(ship_after, "us").astype("int64")

    def cust_filter(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("c_mktsegment"), pa.scalar(segment))
        return batch.filter(keep).select(["c_custkey"])

    cust_keys = customer.select_columns(
        ["c_custkey", "c_mktsegment"]
    ).map_batches(cust_filter, batch_format="pyarrow")

    def order_filter(batch: pa.Table) -> pa.Table:
        # carry the date as int64 epoch-micros through join/sort: Ray's
        # join/aggregate round-trips timestamps through numpy and
        # degrades timestamp[us] -> [s]; int64 survives bit-exact
        ts = pc.cast(batch.column("o_orderdate"), pa.int64())
        batch = batch.set_column(
            batch.schema.get_field_index("o_orderdate"), "o_orderdate", ts
        )
        return batch.filter(pc.less(ts, pa.scalar(cutoff_order)))

    orders_pruned = broadcast_join(
        orders.select_columns(
            ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
        ).map_batches(order_filter, batch_format="pyarrow"),
        cust_keys,
        on="o_custkey",
        right_on="c_custkey",
        how="semi",
    ).select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"])

    def line_project(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("l_shipdate"), pa.int64())
        keep = batch.filter(pc.greater(ts, pa.scalar(cutoff_ship)))
        price_c = _cents(keep.column("l_extendedprice"))
        disc_c = _cents(keep.column("l_discount"))
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        return pa.Table.from_arrays(
            [keep.column("l_orderkey"), rev],
            names=["l_orderkey", "revenue_cents"],
        )

    line_pruned = lineitem.select_columns(
        ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
    ).map_batches(line_project, batch_format="pyarrow")

    # safe_join: a segment/date filter matching nothing empties a side
    joined = safe_join(
        line_pruned,
        orders_pruned.repartition(max(4, n_cpus)),
        join_type="inner",
        num_partitions=max(4, n_cpus),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("revenue_cents", pa.int64())]
        ),
        right_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.int64()),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )

    from ray.data.aggregate import Sum

    agg = (
        joined.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )

    def to_sortable(batch: pa.Table) -> pa.Table:
        # sort key as a column: Ray's sort takes columns, not exprs
        return batch.append_column(
            "neg_rev", pc.negate(batch.column("revenue_cents"))
        )

    def finalize(batch: pa.Table) -> pa.Table:
        batch = batch.drop_columns(["neg_rev"])
        i = batch.schema.get_field_index("o_orderdate")
        return batch.set_column(
            i,
            "o_orderdate",
            pc.cast(batch.column("o_orderdate"), pa.timestamp("us")),
        )

    top = (
        agg.map_batches(to_sortable, batch_format="pyarrow")
        .sort(["neg_rev", "l_orderkey"])
        .limit(k)
        .map_batches(finalize, batch_format="pyarrow")
    )
    return top


def orders_by_nation(orders, customer, nation, region):
    """Snowflake rollup: order count + exact total cents per
    (region name, nation name). The dimension chain
    region <- nation <- customer collapses into ONE broadcast lookup
    (customer is the largest dimension; nation/region join into it on
    the driver side of the broadcast, at dimension size), then the
    fact table aggregates map-side combiner-first — the only shuffle
    is the final tiny groupby over (r_name, n_name) partials.
    """
    import ray

    dim = broadcast_join(
        customer.select_columns(["c_custkey", "c_nationkey"]),
        broadcast_join(
            nation,
            region,
            on="n_regionkey",
            right_on="r_regionkey",
            how="inner",
            right_columns=["r_name"],
        ),
        on="c_nationkey",
        right_on="n_nationkey",
        right_columns=["n_name", "r_name"],
        how="inner",
    ).select_columns(["c_custkey", "n_name", "r_name"])

    fact = broadcast_join(
        orders.select_columns(["o_custkey", "o_totalprice"]),
        dim,
        on="o_custkey",
        right_on="c_custkey",
        how="inner",
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("o_totalprice"))
        t = pa.Table.from_arrays(
            [batch.column("r_name"), batch.column("n_name"), cents],
            names=["r_name", "n_name", "cents"],
        )
        g = pa.TableGroupBy(t, ["r_name", "n_name"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return pa.Table.from_arrays(
            [
                g.column("r_name"),
                g.column("n_name"),
                pc.cast(g.column("cents_count"), pa.int64()),
                g.column("cents_sum"),
            ],
            names=["r_name", "n_name", "n_orders", "total_cents"],
        )

    from ray.data.aggregate import Sum

    return (
        fact.map_batches(partial, batch_format="pyarrow")
        .groupby(["r_name", "n_name"])
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )


def shuffle_anti_join(
    left,
    right,
    on: Union[str, Sequence[str]],
    right_on: Union[str, Sequence[str], None] = None,
    num_partitions: Optional[int] = None,
):
    """Distributed LEFT ANTI join for two LARGE sides: rows of
    ``left`` whose key appears nowhere in ``right`` (the "customers
    with no orders" / "docs with no label" shape). When the right side
    fits in one broadcast object, use ``broadcast_join(how='anti')``
    instead — this is the shuffle path for when it doesn't.

    Scale shape: the right side is reduced to per-batch DISTINCT keys
    + a marker column BEFORE the exchange (a combiner: a key occurring
    k times in a batch ships once), then ONE shuffle hash join
    (left outer) + a null-marker filter. Cross-batch duplicate keys
    are harmless: they only multiply MATCHED left rows, all of which
    are dropped; unmatched rows join to null exactly once.
    """
    import ray

    keys = [on] if isinstance(on, str) else list(on)
    rkeys = (
        keys
        if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )
    n_cpus = int(ray.cluster_resources().get("CPU", 4))
    nparts = num_partitions or max(4, n_cpus)

    def distinct_keys(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays([batch.column(c) for c in rkeys], names=rkeys)
        g = pa.TableGroupBy(t, rkeys).aggregate([])
        return g.append_column(
            "_matched", pa.array(np.ones(g.num_rows, dtype=np.int8))
        )

    marked = right.map_batches(distinct_keys, batch_format="pyarrow").repartition(
        nparts
    )
    # marked's schema is the right side's key fields + the int8 marker
    # — statically derivable from the right schema, keeping safe_join's
    # empty-side padding lazy (an empty right side means "keep every
    # left row", which the padded left_outer + null filter produces)
    r_schema = arrow_schema(right)
    marked_schema = pa.schema(
        [(k, r_schema.field(k).type) for k in rkeys]
        + [("_matched", pa.int8())]
    )
    joined = safe_join(
        left,
        marked,
        join_type="left_outer",
        num_partitions=nparts,
        on=tuple(keys),
        right_on=tuple(rkeys),
        right_schema=marked_schema,
    )

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.is_null(batch.column("_matched")))
        drop = ["_matched"] + [
            c for c in rkeys if c not in keys and c in out.column_names
        ]
        return out.drop_columns([c for c in drop if c in out.column_names])

    return joined.map_batches(keep_unmatched, batch_format="pyarrow")


def hash_join(
    left,
    right,
    on: Sequence[str],
    right_on: Optional[Sequence[str]] = None,
    join_type: str = "inner",
    num_partitions: int = 32,
    left_cols: Optional[Sequence[str]] = None,
    right_cols: Optional[Sequence[str]] = None,
    left_schema: Optional[pa.Schema] = None,
    right_schema: Optional[pa.Schema] = None,
):
    """Large-large distributed equi-join: both sides hash-partition on
    the key (Ray Data's native shuffle hash join — the idiomatic path
    when neither side fits a broadcast). The win over calling
    ``Dataset.join`` directly is the PRUNE-FIRST contract: both sides
    project to key + needed columns BEFORE the shuffle, so the
    all-to-all moves only what the probe consumes (the same rule the
    temporal joins in ops/joins.py apply — 33-byte rows, not whole
    tables). Hot keys: output rows per key are |L_k| x |R_k|; for
    skewed many-to-many keys prefer a pre-aggregation or the salted
    patterns in ops/joins.py — this wrapper is the general-purpose
    path, and the aggregator layout is Ray's own.

    ``left_schema``/``right_schema`` are the PRE-projection schemas;
    pass them when a side is derived (map_batches over a filter): a
    derived side that comes up empty has no schema metadata at all,
    which safe_join's sentinel padding needs."""
    keys = list(on)
    rkeys = list(right_on) if right_on is not None else keys
    if left_cols is not None:
        lnames = list(dict.fromkeys(keys + list(left_cols)))
        left = left.select_columns(lnames)
        if left_schema is not None:
            left_schema = pa.schema(
                [(n, left_schema.field(n).type) for n in lnames]
            )
    if right_cols is not None:
        rnames = list(dict.fromkeys(rkeys + list(right_cols)))
        right = right.select_columns(rnames)
        if right_schema is not None:
            right_schema = pa.schema(
                [(n, right_schema.field(n).type) for n in rnames]
            )
    # safe_join: an empty side (e.g. a date filter that matches no
    # rows) must yield the correct empty/outer result, not a crash
    return safe_join(
        left,
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=tuple(keys),
        right_on=tuple(rkeys),
        left_schema=left_schema,
        right_schema=right_schema,
    )


def order_priority_stats(orders, lineitem, date_lo: str, date_hi: str):
    """TPC-H Q4-shaped probe of the large-large hash join: orders in a
    date window join their lineitems on orderkey; per order priority,
    count joined rows and sum integer-cents extendedprice. The join's
    shuffle moves only (key, priority) x (key, price) projections."""
    import pyarrow.compute as _pc

    def order_filter(batch: pa.Table) -> pa.Table:
        d = _pc.cast(batch.column("o_orderdate"), pa.string())
        m = _pc.and_(
            _pc.greater_equal(d, date_lo), _pc.less(d, date_hi)
        )
        return batch.filter(m)

    left = orders.map_batches(order_filter, batch_format="pyarrow")
    # static schemas: the filtered left side is derived, so when the
    # date window matches nothing it has no schema metadata of its own
    o_schema = arrow_schema(orders)
    l_schema = arrow_schema(lineitem)
    joined = hash_join(
        left,
        lineitem,
        on=["o_orderkey"],
        right_on=["l_orderkey"],
        num_partitions=16,
        left_cols=["o_orderpriority"],
        right_cols=["l_extendedprice"],
        left_schema=o_schema,
        right_schema=l_schema,
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [
                batch.column("o_orderpriority"),
                _cents(batch.column("l_extendedprice")),
            ],
            names=["o_orderpriority", "cents"],
        )
        g = pa.TableGroupBy(t, "o_orderpriority").aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return g.rename_columns(["o_orderpriority", "cents", "n"])

    from ray.data.aggregate import Sum

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("cents"), Sum("n"))
        .map_batches(
            lambda b: pa.Table.from_arrays(
                [
                    b.column("o_orderpriority"),
                    pc.cast(b.column("sum(n)"), pa.int64()),
                    pc.cast(b.column("sum(cents)"), pa.int64()),
                ],
                names=["o_orderpriority", "n_lines", "sum_cents"],
            ),
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# bloom-filter map-side pruning for anti joins
# ---------------------------------------------------------------------------


def _bloom_indices(h1: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """[n, k] bit indices via double hashing (Kirsch-Mitzenmacher):
    idx_i = (h1 + i * h2) % m with h2 derived from h1 by a fixed
    odd-constant mix — one md5 per value total."""
    h2 = (h1 * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def _bloom_words_from_keys(keys, m_bits: int, k: int) -> np.ndarray:
    from retriv_ray.ops.dedup import _md5_low64_many

    words = np.zeros(m_bits // 64 + 1, dtype=np.uint64)
    if len(keys):
        h1 = _md5_low64_many([str(v) for v in keys])
        idx = _bloom_indices(h1, m_bits, k).reshape(-1)
        np.bitwise_or.at(
            words, idx // 64, np.uint64(1) << (idx % 64).astype(np.uint64)
        )
    return words


def build_bloom(ds, col: str, m_bits: int = 1 << 22, k: int = 4):
    """Bloom filter of a Dataset column as an object-store ref of a
    packed uint64 bit array. Per-block partial filters are OR-merged
    in a binary task tree, so the driver never holds more than the
    final filter and merge depth is log2(blocks) — the shape that
    still works when the filter is gigabytes and blocks are thousands.
    """
    import ray

    @ray.remote(num_cpus=1)
    def partial(t: pa.Table) -> np.ndarray:
        return _bloom_words_from_keys(t.column(col).to_pylist(), m_bits, k)

    @ray.remote(num_cpus=1)
    def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.bitwise_or(a, b)

    refs = [partial.remote(r) for r in ds.materialize().to_arrow_refs()]
    if not refs:
        return ray.put(np.zeros(m_bits // 64 + 1, dtype=np.uint64))
    while len(refs) > 1:
        nxt = [
            merge.remote(refs[i], refs[i + 1])
            for i in range(0, len(refs) - 1, 2)
        ]
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    return refs[0]


def bloom_anti_join(
    left,
    right,
    on: str,
    right_on: Optional[str] = None,
    m_bits: int = 1 << 22,
    k: int = 4,
    num_partitions: Optional[int] = None,
):
    """LEFT ANTI join with a bloom-filter map-side bypass: left rows
    whose key misses a bloom filter of the right keys are DEFINITELY
    unmatched (no false negatives) and ship straight to the output —
    they never enter the exchange. Only the maybe-matched rows (true
    matches + the ~0.6%-per-4-hash false positives at 10 bits/key) go
    through the exact :func:`shuffle_anti_join`.

    Result-identical to ``shuffle_anti_join(left, right, on)`` under
    any filter size (false positives are re-checked exactly); the
    filter only changes how many left rows pay the shuffle. For the
    decontamination / dedup-filter shape (drop set << corpus) that is
    almost all of them. Size ``m_bits`` at ~10 bits per distinct right
    key; the filter broadcasts once via the object store.
    """
    rkey = right_on or on
    bref = build_bloom(right, rkey, m_bits=m_bits, k=k)

    def split(batch: pa.Table, want_hit: bool) -> pa.Table:
        import ray

        from retriv_ray.ops.dedup import _md5_low64_many

        words = ray.get(bref)
        vals = batch.column(on).to_pylist()
        if not vals:
            return batch
        h1 = _md5_low64_many([str(v) for v in vals])
        idx = _bloom_indices(h1, m_bits, k)
        bits = (words[idx // 64] >> (idx % 64).astype(np.uint64)) & np.uint64(1)
        hit = bits.all(axis=1)
        return batch.filter(pa.array(hit if want_hit else ~hit))

    definite = left.map_batches(
        lambda b: split(b, want_hit=False), batch_format="pyarrow"
    )
    maybe = left.map_batches(
        lambda b: split(b, want_hit=True), batch_format="pyarrow"
    )
    checked = shuffle_anti_join(
        maybe, right, on, right_on=rkey, num_partitions=num_partitions
    )
    return definite.union(checked)


def composite_agg(
    ds,
    sources,
    size: int = 100,
    after=None,
    value_col=None,
):
    """One page of an ES ``composite`` aggregation: the first ``size``
    buckets of GROUP BY ``sources`` in ascending composite-key order,
    strictly AFTER the ``after`` cursor (a tuple of key values from
    the previous page's last bucket, or None for page one). Returns
    ``(page_table, next_after)`` — feed ``next_after`` back in to
    stream the next page; None when the key space is exhausted.

    This is the resumable aggregation for huge-cardinality group-bys
    (ES's replacement for deep terms-agg pagination): a consumer pages
    through billions of buckets with O(size) driver memory per page.

    Scale plan (why this beats re-running a full groupby per page):
    the cursor filter applies MAP-SIDE before any exchange, so page N
    moves only rows with key > cursor; each block then pre-aggregates
    and keeps only its LOCAL first ``size`` buckets — correct because
    bucket membership in the page is decided by KEY ORDER, not by
    counts: a key among the global first ``size`` is among every
    block's local first ``size``, so no partial count for a surviving
    bucket is ever dropped (unlike count-ordered terms aggs, which is
    what `approx_topk` is for). The exchange is bounded at
    size x num_blocks pre-aggregated rows regardless of input size.

    ``value_col`` (optional, double) adds ``value_cents`` =
    sum(floor(value * 100)) — floor, not round, so the int64 sum is
    tie-free and order-free for the SQL oracle. Key columns are cast
    to string with NULL -> '' (documented sentinel; ES orders nulls
    first too).
    """
    from ray.data.aggregate import Sum

    sources = list(sources)
    aft = list(after) if after is not None else None
    metric_cols = ["n"] + (["value_cents"] if value_col else [])

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], type=pa.string()) for _ in sources]
            + [pa.array([], type=pa.int64()) for _ in metric_cols],
            names=sources + metric_cols,
        )
        if batch.num_rows == 0:
            return empty
        keys = [
            pc.fill_null(pc.cast(batch.column(k), pa.string()), "")
            for k in sources
        ]
        if aft is not None:
            # vectorized strict tuple compare: key > after
            gt = pc.greater(keys[0], aft[0])
            eq = pc.equal(keys[0], aft[0])
            for k_arr, a in zip(keys[1:], aft[1:]):
                gt = pc.or_(gt, pc.and_(eq, pc.greater(k_arr, a)))
                eq = pc.and_(eq, pc.equal(k_arr, a))
            sel = gt
        else:
            sel = None
        cols = keys
        names = list(sources)
        aggs = [([], "count_all")]
        if value_col:
            cols = cols + [
                pc.cast(
                    pc.floor(pc.multiply(batch.column(value_col), 100.0)),
                    pa.int64(),
                )
            ]
            names = names + ["v"]
            aggs = [("v", "count"), ("v", "sum")]
        t = pa.Table.from_arrays(cols, names=names)
        if sel is not None:
            t = t.filter(sel)
        if t.num_rows == 0:
            return empty
        grouped = pa.TableGroupBy(t, sources).aggregate(aggs)
        grouped = grouped.rename_columns(sources + metric_cols)
        order = pc.sort_indices(
            grouped, sort_keys=[(k, "ascending") for k in sources]
        )
        return grouped.take(order[:size]).select(sources + metric_cols)

    page = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(sources)
        .aggregate(*[Sum(c, alias_name=c) for c in metric_cols])
        .sort(sources)
        .limit(size)
    )
    df = page.to_pandas()
    if df.empty:  # Ray drops the schema on an all-empty aggregate
        tbl = pa.Table.from_arrays(
            [pa.array([], type=pa.string()) for _ in sources]
            + [pa.array([], type=pa.int64()) for _ in metric_cols],
            names=sources + metric_cols,
        )
    else:
        tbl = pa.Table.from_pandas(df, preserve_index=False).select(
            sources + metric_cols
        )
    next_after = (
        tuple(tbl.column(k)[-1].as_py() for k in sources)
        if tbl.num_rows == size
        else None
    )
    return tbl, next_after


def pivot_counts(
    ds,
    row_col: str,
    pivot_col: str,
    values: Sequence[str],
):
    """Crosstab / SQL ``PIVOT ... IN (values)``: one output row per
    ``row_col`` key with an int64 ``n_<value>`` count column per
    listed pivot value plus ``n_total`` (all rows for that key, listed
    or not). The pivot value list is explicit — like SQL's ``IN``
    clause — so the output schema is static regardless of data.

    Scale plan: each batch bincounts its (row key, pivot code) pairs
    into one dense g x (v+1) matrix (one vectorized pass, codes from
    ``dictionary_encode`` + ``pc.index_in``), so the single exchange
    moves per-block PARTIAL pivot rows — bounded by distinct keys per
    block x a fixed column count — and a ``groupby(row_col).sum``
    over the already-wide columns finishes. No per-value pass, no
    per-value shuffle.
    """
    from ray.data.aggregate import Sum

    values = list(values)
    nv = len(values)
    val_arr = pa.array(values, type=pa.string())
    names = [row_col] + [f"n_{v}" for v in values] + ["n_total"]

    def partial(batch: pa.Table) -> pa.Table:
        key = batch.column(row_col)
        if key.null_count:  # null keys dropped (documented contract)
            batch = batch.filter(pc.is_valid(key))
        if batch.num_rows == 0:
            key_t = batch.schema.field(row_col).type
            return pa.Table.from_arrays(
                [pa.array([], type=key_t)]
                + [pa.array([], type=pa.int64())] * (nv + 1),
                names=names,
            )
        keys = batch.column(row_col).combine_chunks()
        enc = keys.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        g = len(enc.dictionary)
        pcode = pc.index_in(
            pc.cast(batch.column(pivot_col), pa.string()), value_set=val_arr
        )
        pcode = pc.fill_null(pcode, nv).to_numpy(zero_copy_only=False).astype(np.int64)
        # one flat bincount: cell = key_code * (nv + 1) + pivot_code;
        # the trailing per-key column catches unlisted values so
        # n_total = row count without a second pass
        flat = np.bincount(
            codes * (nv + 1) + pcode, minlength=g * (nv + 1)
        ).reshape(g, nv + 1)
        cols = [enc.dictionary]
        for j in range(nv):
            cols.append(pa.array(flat[:, j], type=pa.int64()))
        cols.append(pa.array(flat.sum(axis=1), type=pa.int64()))
        return pa.Table.from_arrays(cols, names=names)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(row_col)
        .aggregate(*[Sum(c, alias_name=c) for c in names[1:]])
        .sort(row_col)
    )


def corr_stats(
    ds,
    group_col: str,
    x_col: str,
    y_col: str,
):
    """ES ``matrix_stats`` aggregation between two int64 metrics, as
    INTEGER-EXACT sufficient statistics per group: (group, n, sum_x,
    sum_y, sum_xx, sum_yy, sum_xy). Covariance / Pearson correlation
    are pure driver-side arithmetic over these seven numbers —
    keeping the distributed exchange integer-only means the oracle
    hash-checks every moment exactly, with no float-order tolerance.

    Scale plan: one per-batch combiner (sorted-codes ``reduceat`` over
    the five products, one pass) then ``groupby(group).sum`` — the
    exchange moves one row per (block, group). Caveat: int64 product
    sums hold to ~1e18; at extreme row counts x metric scale, move to
    128-bit accumulation (DuckDB's HUGEINT path already is).
    """
    from ray.data.aggregate import Sum

    names = [group_col, "n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]

    def partial(batch: pa.Table) -> pa.Table:
        key_t = batch.schema.field(group_col).type
        key = batch.column(group_col)
        if key.null_count:  # null keys dropped (documented contract)
            batch = batch.filter(pc.is_valid(key))
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=key_t)]
                + [pa.array([], type=pa.int64())] * 6,
                names=names,
            )
        keys = batch.column(group_col).combine_chunks()
        enc = keys.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        x = pc.cast(batch.column(x_col), pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(batch.column(y_col), pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(codes, kind="stable")
        c_s = codes[order]
        starts = np.flatnonzero(np.concatenate(([True], c_s[1:] != c_s[:-1])))
        cols = [enc.dictionary.take(pa.array(c_s[starts]))]
        ones = np.ones(len(c_s), dtype=np.int64)
        for v in (ones, x[order], y[order], x[order] * x[order],
                  y[order] * y[order], x[order] * y[order]):
            cols.append(
                pa.array(np.add.reduceat(v, starts).astype(np.int64))
            )
        return pa.Table.from_arrays(cols, names=names)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(*[Sum(c, alias_name=c) for c in names[1:]])
        .sort(group_col)
    )


def dataset_diff(
    old_ds,
    new_ds,
    id_col: str,
    compare_cols: Sequence[str],
):
    """Snapshot delta between two corpus versions: one row per id
    whose presence or content changed — ``status`` in
    ('added', 'removed', 'changed'); unchanged ids produce nothing.
    Content identity is the md5 of the ``compare_cols`` values,
    computed MAP-SIDE, so the exchange moves (id, 8-byte digest,
    side) triples — never the payload: diffing two 100 TB snapshots
    ships ~24 B/row through ONE groupby(id) of plain aggregates
    (count / side-sum / digest min+max decide the status without a
    join or a map_groups). Returns (id, status) sorted by id.

    Contract: ids are unique within each snapshot (the corpus
    primary key)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from retriv_ray.ops.dedup import _md5_low64_many

    def tagged(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            key_t = batch.schema.field(id_col).type
            if batch.num_rows == 0:
                return pa.Table.from_arrays(
                    [
                        pa.array([], type=key_t),
                        pa.array([], type=pa.int64()),
                        pa.array([], type=pa.int64()),
                    ],
                    names=[id_col, "h", "side"],
                )
            # length-prefix each value so separators inside values
            # (or a value equal to the null sentinel) cannot alias a
            # different column split to the same digest
            cols = []
            for c in compare_cols:
                sc = pc.cast(batch.column(c), pa.string())
                lp = pc.binary_join_element_wise(
                    pc.cast(pc.fill_null(pc.utf8_length(sc), -1), pa.string()),
                    pc.fill_null(sc, ""),
                    ":",
                )
                cols.append(lp)
            joined = cols[0]
            for c in cols[1:]:
                joined = pc.binary_join_element_wise(joined, c, "|")
            h = _md5_low64_many(joined.to_pylist()).view(np.int64)
            return pa.Table.from_arrays(
                [
                    batch.column(id_col),
                    pa.array(h),
                    pa.array(np.full(batch.num_rows, side, dtype=np.int64)),
                ],
                names=[id_col, "h", "side"],
            )

        return fn

    unioned = old_ds.map_batches(tagged(0), batch_format="pyarrow").union(
        new_ds.map_batches(tagged(1), batch_format="pyarrow")
    )
    agg = unioned.groupby(id_col).aggregate(
        Count(alias_name="n"),
        Sum("side", alias_name="side_sum"),
        Min("h", alias_name="h_min"),
        Max("h", alias_name="h_max"),
    )

    def classify(batch: pa.Table) -> pa.Table:
        key_t = batch.schema.field(id_col).type
        if batch.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=key_t), pa.array([], type=pa.string())],
                names=[id_col, "status"],
            )
        n = batch.column("n").to_numpy(zero_copy_only=False)
        side_sum = batch.column("side_sum").to_numpy(zero_copy_only=False)
        changed = (
            batch.column("h_min").to_numpy(zero_copy_only=False)
            != batch.column("h_max").to_numpy(zero_copy_only=False)
        )
        status = np.where(
            n == 1,
            np.where(side_sum == 0, "removed", "added"),
            np.where(changed, "changed", ""),
        )
        keep = status != ""
        return pa.Table.from_arrays(
            [
                batch.column(id_col).filter(pa.array(keep)),
                pa.array(status[keep], type=pa.string()),
            ],
            names=[id_col, "status"],
        )

    return agg.map_batches(classify, batch_format="pyarrow").sort(id_col)


def top_metrics(
    ds,
    group_col: str,
    sort_col: str,
    id_col: str,
    metric_cols: Sequence[str],
):
    """ES ``top_metrics`` aggregation: per group, the metric values on
    the row with the LARGEST ``sort_col`` (ties broken by smallest
    ``id_col`` — deterministic, unlike ES's arbitrary tie). All
    columns must be int64-castable (the engine's integer-exactness
    convention).

    Scale plan: each batch keeps ONE best row per group present (a
    single lexsort + first-of-group pass), so the exchange moves one
    row per (block, group); a final per-group pass over those
    partials picks the global winner. argmax is associative under
    the (sort desc, id asc) order, so the two-level reduction equals
    a global sort — no row stream ever reaches the driver.
    """
    metric_cols = list(metric_cols)
    names = [group_col, sort_col, id_col] + metric_cols

    def best_per_group(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows and group_col in tbl.schema.names:
            key = tbl.column(group_col)
            if key.null_count:  # null keys dropped (documented contract)
                tbl = tbl.filter(pc.is_valid(key))
        if tbl.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], type=tbl.schema.field(group_col).type)]
                + [pa.array([], type=pa.int64())] * (len(names) - 1),
                names=names,
            )
        keys = tbl.column(group_col).combine_chunks()
        enc = keys.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sort_v = pc.cast(tbl.column(sort_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ids = pc.cast(tbl.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((ids, -sort_v, codes))
        c_s = codes[order]
        firsts = order[
            np.flatnonzero(np.concatenate(([True], c_s[1:] != c_s[:-1])))
        ]
        take = pa.array(firsts)
        cols = [keys.take(take)] + [
            pc.cast(tbl.column(c).take(take), pa.int64())
            for c in names[1:]
        ]
        return pa.Table.from_arrays(cols, names=names)

    partials = ds.map_batches(best_per_group, batch_format="pyarrow")
    return (
        partials.groupby(group_col)
        .map_groups(best_per_group, batch_format="pyarrow")
        .sort(group_col)
    )
