"""Extra columnar source formats: ORC and Feather/Arrow-IPC readers.

Ray Data (this version) ships parquet/CSV/JSON readers but no ORC or
Feather source; these fill the gap with the same task-fan-out shape
the engine's parquet paths use — ONE remote task per file unit
returning an Arrow table ref, assembled via ``from_arrow_refs`` so
blocks land in the object store worker-side, never on the driver.

Scale plan: ORC splits to one task per STRIPE when a file has more
than one (stripes are ORC's parallel unit, like parquet row groups);
Feather splits per record-batch range. Column pruning pushes into the
format reader (`columns=`), matching the engine's prune-at-the-read
rule. 100 TB inputs arrive as many files — the unit list stays
O(files + stripes) metadata on the driver, the bytes move straight
from storage to the worker reading them.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import pyarrow as pa


def _list_files(source, suffixes) -> List[str]:
    if isinstance(source, (list, tuple)):
        return [str(p) for p in source]
    if os.path.isdir(source):
        return sorted(
            os.path.join(source, f)
            for f in os.listdir(source)
            if f.endswith(tuple(suffixes))
        )
    return [source]


def read_orc(source, columns: Optional[Sequence[str]] = None):
    """ORC file/dir/list -> Dataset, one task per stripe (per file
    when single-stripe). Column pruning via ``columns``."""
    import pyarrow.orc as orc
    import ray
    import ray.data

    files = _list_files(source, (".orc",))
    if not files:
        raise FileNotFoundError(f"no .orc files under {source!r}")
    units = []  # (path, stripe_idx | None)
    for p in files:
        f = orc.ORCFile(p)
        if f.nstripes > 1:
            units.extend((p, i) for i in range(f.nstripes))
        else:
            units.append((p, None))

    @ray.remote(num_cpus=1)
    def _read(path: str, stripe) -> pa.Table:
        import pyarrow.orc as _orc

        f = _orc.ORCFile(path)
        if stripe is None:
            return f.read(columns=list(columns) if columns else None)
        t = f.read_stripe(stripe, columns=list(columns) if columns else None)
        if isinstance(t, pa.RecordBatch):
            t = pa.Table.from_batches([t])
        return t

    return ray.data.from_arrow_refs([_read.remote(p, i) for p, i in units])


def read_feather(source, columns: Optional[Sequence[str]] = None):
    """Feather / Arrow-IPC file/dir/list -> Dataset, one task per
    file (IPC files memory-map; batch ranges split large files)."""
    import ray
    import ray.data

    files = _list_files(source, (".feather", ".arrow", ".ipc"))
    if not files:
        raise FileNotFoundError(f"no feather files under {source!r}")

    @ray.remote(num_cpus=1)
    def _read(path: str) -> pa.Table:
        import pyarrow.feather as feather

        return feather.read_table(
            path, columns=list(columns) if columns else None
        )

    return ray.data.from_arrow_refs([_read.remote(p) for p in files])


def write_orc(table: pa.Table, path: str, stripe_size: int = 64 * 1024 * 1024):
    """Single-file ORC writer (test/fixture utility; production sinks
    stay parquet — see ops/io.py resumable sink)."""
    import pyarrow.orc as orc

    orc.write_table(table, path, stripe_size=stripe_size)
