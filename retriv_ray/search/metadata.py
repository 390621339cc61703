"""Metadata filters — the AdvancedRetriever surface over Ray Data.

Replicates the reference filter DSL and semantics
(retriv/experimental/advanced_retriever.py:358-501, docs/filters.md):
field kinds {id, number, bool, keyword, keywords}, clauses
{must, must not} (user-facing: ``where`` / ``where_not``), numeric
operators {eq, gt, gte, lt, lte, between}, keywords operators
{and, or}; multiple filters always combine by intersection
(advanced_retriever.py:483-487). Unknown keyword values raise, as the
reference does (advanced_retriever.py:378-382).

Build: :func:`build_metadata` runs a column-pruned ``map_batches``
pass over the source that assigns doc_ids from the index's broadcast
conv-offset table and writes ``metadata/part-*.parquet`` aligned to
internal doc ids. Query: :class:`MetadataIndex` loads those parts
once per process, keeps number/bool fields as dense arrays and
keyword(s) fields as value -> sorted-int32-id postings — the same
shapes the reference builds in RAM (advanced_retriever.py:222-267),
here reloadable per serving actor. At 10^12 docs this sits sharded
next to doc_lens (same doc-range sharding): ``MetadataIndex`` takes
the same ``shard_range`` as ``LoadedIndex`` and filters evaluate
inside each shard actor (search.sharded), pinned by
tests/test_sharded.py::test_sharded_filtered_equals_monolithic and
the ``filtered_bm25_topk_sharded`` driver oracle.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from retriv_ray.index import manifest as mf

KINDS = {"id", "number", "bool", "keyword", "keywords"}
CLAUSES = ("must", "must not")
OPERATORS = ("eq", "gt", "gte", "lt", "lte", "between", "and", "or")


def build_metadata(source, index_dir: str, schema: Dict[str, str]) -> None:
    """Write doc_id-aligned metadata parquet for the declared fields.

    ``schema`` maps field name -> kind; fields must exist as columns
    in the source (``ts`` timestamps are stored as int64 epoch-us
    numbers). Runs as one pruned read + map_batches pass reusing the
    index's conv_offsets for doc_id assignment.
    """
    import ray
    import ray.data

    bad = {k: v for k, v in schema.items() if v not in KINDS}
    if bad:
        raise ValueError(f"unsupported kinds: {bad}")
    fields = list(schema)
    import os as _os

    from retriv_ray.index.build import read_conv_offsets

    # same dual-mode consumption as the index builds: a sharded-layout
    # id_map ships as a bucketed handle (map-side hash join inside
    # assign — no whole-map broadcast); the single-parquet layout is
    # below the broadcast limit by construction and ships whole
    if _os.path.exists(
        _os.path.join(index_dir, "id_map", "conv_offsets.parquet")
    ):
        im = read_conv_offsets(index_dir)
        convs = np.asarray(im.column("conv_id").to_pylist(), dtype=object)
        bases = im.column("base").to_numpy()
        ref = ray.put((convs, bases))
    else:
        from retriv_ray.index.build import sharded_handle_from_slices

        ref, _dc = sharded_handle_from_slices(index_dir)

    cols = sorted(set(fields) | {"conv_id", "turn_idx"})
    if isinstance(source, (str, list)):
        ds = ray.data.read_parquet(source, columns=cols)
    else:
        ds = source.select_columns(cols)

    from retriv_ray.index.build import ConvMapResolver

    def assign(batch: pa.Table) -> pa.Table:
        res = getattr(assign, "_res", None)
        if res is None:
            res = assign._res = ConvMapResolver(ref)
        conv = np.asarray(batch.column("conv_id").to_pylist(), dtype=object)
        turn = batch.column("turn_idx").to_numpy().astype(np.int64)
        doc_ids = res.doc_bases(conv) + turn
        arrays = [pa.array(doc_ids, type=pa.int64())]
        names = ["doc_id"]
        for f in fields:
            col = batch.column(f)
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.int64())
            arrays.append(col)
            names.append(f)
        return pa.Table.from_arrays(arrays, names=names)

    out_dir = os.path.join(index_dir, "metadata")
    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(out_dir)
    mf.atomic_write_text(
        os.path.join(out_dir, "schema.json"), json.dumps(schema)
    )


class MetadataIndex:
    """Per-process filter evaluator over the metadata parquet.

    ``shard_range=(s0, s1)`` (inclusive, same contract as
    ``LoadedIndex``) restricts the view to a contiguous run of doc
    shards: only that slice's rows are kept and all returned doc ids
    are LOCAL (global - doc_base), so the filter DSL composes with
    per-doc-shard serving (``search.sharded``) — each shard actor's
    metadata memory is sized to its slice, not the corpus."""

    def __init__(self, index_dir: str, shard_range=None):
        out_dir = os.path.join(index_dir, "metadata")
        with open(os.path.join(out_dir, "schema.json")) as f:
            self.schema: Dict[str, str] = json.load(f)
        parts = sorted(
            os.path.join(out_dir, p)
            for p in os.listdir(out_dir)
            if p.endswith(".parquet")
        )
        self.doc_base = 0
        if shard_range is not None:
            import pyarrow.compute as pc

            man = mf.IndexManifest.load(index_dir)
            salt_docs = getattr(man, "salt_docs", 0) or man.doc_count
            s0, s1 = shard_range
            self.doc_base = s0 * salt_docs
            hi = min((s1 + 1) * salt_docs, man.doc_count)
            # row-group doc_id stats prune the read to this slice's
            # files/groups BEFORE any bytes load (files aren't doc-
            # ordered, but per-group min/max bounds don't need order);
            # the exact filter below finishes the job
            tabs = []
            schema_arrow = None
            for p in parts:
                f = pq.ParquetFile(p)
                schema_arrow = schema_arrow or f.schema_arrow
                try:
                    ci = f.schema_arrow.get_field_index("doc_id")
                except Exception:
                    ci = 0
                for rg in range(f.metadata.num_row_groups):
                    st = f.metadata.row_group(rg).column(ci).statistics
                    if (
                        st is None
                        or st.min is None
                        or (st.max >= self.doc_base and st.min < hi)
                    ):
                        tabs.append(f.read_row_group(rg))
            t = (
                pa.concat_tables(tabs)
                if tabs
                else schema_arrow.empty_table()
            )
            col = t.column("doc_id")
            t = t.filter(
                pc.and_(
                    pc.greater_equal(col, self.doc_base), pc.less(col, hi)
                )
            )
        else:
            t = pa.concat_tables([pq.read_table(p) for p in parts])
        ids_np = t.column("doc_id").to_numpy() - self.doc_base
        order = np.argsort(ids_np, kind="stable")
        self.doc_count = t.num_rows
        self.doc_ids = np.arange(self.doc_count, dtype=np.int64)
        self.values: Dict[str, Any] = {}
        self.postings: Dict[str, Dict[Any, np.ndarray]] = {}
        for field, kind in self.schema.items():
            col = t.column(field)
            if kind == "number":
                self.values[field] = col.to_numpy(zero_copy_only=False)[order]
            elif kind == "bool":
                arr = col.to_numpy(zero_copy_only=False)[order]
                self.postings[field] = {
                    True: np.flatnonzero(arr).astype(np.int64),
                    False: np.flatnonzero(~arr).astype(np.int64),
                }
            elif kind in ("keyword", "id"):
                vals = np.asarray(col.to_pylist(), dtype=object)[order]
                self.postings[field] = _invert(vals)
            elif kind == "keywords":
                lists = col.to_pylist()
                inv: Dict[Any, List[int]] = {}
                for i_sorted, i_orig in enumerate(order):
                    for v in lists[i_orig] or ():
                        inv.setdefault(v, []).append(i_sorted)
                self.postings[field] = {
                    v: np.asarray(ids, dtype=np.int64) for v, ids in inv.items()
                }

    # -- reference filter_doc_ids (advanced_retriever.py:358-479) -----
    def filter_doc_ids(
        self,
        field: str,
        clause: str,
        value: Any = None,
        operator: Optional[str] = None,
        raise_error: bool = True,
    ) -> np.ndarray:
        if clause not in CLAUSES:
            raise ValueError(f"Clause must be one of {list(CLAUSES)}")
        if operator is not None and operator not in OPERATORS:
            raise ValueError(f"Operator must be one of {list(OPERATORS)}")
        if field not in self.schema:
            raise ValueError(f"Field `{field}` not in schema")
        kind = self.schema[field]

        def get_value(v):
            if raise_error and v not in self.postings[field]:
                raise ValueError(
                    f"No document has value `{v}` in field `{field}`."
                )
            return self.postings[field].get(v, np.array([], dtype=np.int64))

        if kind in ("id", "keyword"):
            if clause == "must":
                if isinstance(value, list):
                    return _union([get_value(v) for v in value])
                return get_value(value)
            wanted = set(value if isinstance(value, list) else [value])
            ids = [v for k, v in self.postings[field].items() if k not in wanted]
            return _union(ids)
        if kind == "bool":
            return self.postings[field][value if clause == "must" else not value]
        if kind == "keywords":
            if isinstance(value, list):
                sets = [get_value(v) for v in value]
                combined = (
                    _intersect(sets) if operator == "and" else _union(sets)
                    if operator == "or"
                    else None
                )
                if combined is None:
                    raise ValueError(
                        f"Operator `{operator}` not supported for keywords field"
                    )
            else:
                combined = get_value(value)
            if clause == "must":
                return combined
            return np.setdiff1d(self.doc_ids, combined, assume_unique=True)
        if kind == "number":
            data = self.values[field]
            if operator == "eq":
                mask = data == value
            elif operator == "gt":
                mask = data > value
            elif operator == "gte":
                mask = data >= value
            elif operator == "lt":
                mask = data < value
            elif operator == "lte":
                mask = data <= value
            elif operator == "between":
                mask = (data >= value[0]) & (data <= value[1])
            else:
                raise ValueError("Operator not supported for numeric field")
            return self.doc_ids[mask if clause == "must" else ~mask]
        raise ValueError(f"Field {field} of type {kind} not supported")

    def get_filtered_doc_ids(self, filters: List[Dict]) -> np.ndarray:
        if len(filters) == 1:
            return self.filter_doc_ids(**filters[0])
        sets = [self.filter_doc_ids(**f) for f in filters]
        return _intersect(sets)

    def format_filters(self, filters: Dict, clause: str = "must") -> List[Dict]:
        out = []
        for field, value in filters.items():
            kind = self.schema.get(field)
            if kind in {"id", "bool", "keyword"}:
                out.append(dict(field=field, clause=clause, value=value))
            elif kind in {"number", "keywords"}:
                out.append(
                    dict(field=field, clause=clause, value=value[1], operator=value[0])
                )
            else:
                raise ValueError(f"Field `{field}` not in schema")
        return out

    def subset_for_query(self, query: Dict) -> Optional[np.ndarray]:
        """Reference search() query-dict handling
        (advanced_retriever.py:503-531): ``where`` / ``where_not``
        keys plus bare field filters; returns None when unfiltered."""
        must = self.format_filters(query.get("where", {}))
        must_not = self.format_filters(query.get("where_not", {}), "must not")
        single = {
            k: v
            for k, v in query.items()
            if k not in {"text", "id", "where", "where_not"}
        }
        filters = must + must_not + self.format_filters(single)
        if not filters:
            return None
        return self.get_filtered_doc_ids(filters)


def _invert(vals: np.ndarray) -> Dict[Any, np.ndarray]:
    uniq, inverse = np.unique(vals, return_inverse=True)
    order = np.argsort(inverse, kind="stable")
    bounds = np.searchsorted(inverse[order], np.arange(len(uniq)))
    bounds = np.append(bounds, len(inverse))
    return {
        uniq[i]: np.sort(order[bounds[i] : bounds[i + 1]]).astype(np.int64)
        for i in range(len(uniq))
    }


def _union(arrays: List[np.ndarray]) -> np.ndarray:
    if not arrays:
        return np.array([], dtype=np.int64)
    if len(arrays) == 1:
        return arrays[0]
    return np.unique(np.concatenate(arrays))


def _intersect(arrays: List[np.ndarray]) -> np.ndarray:
    out = arrays[0]
    for a in arrays[1:]:
        out = np.intersect1d(out, a, assume_unique=True)
    return out
