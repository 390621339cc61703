"""ORC / Feather source reader tests: per-stripe fan-out, column
pruning, losslessness vs the in-memory original."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def table():
    rng = np.random.default_rng(3)
    return pa.table(
        {
            "id": pa.array(np.arange(5000), type=pa.int64()),
            "v": pa.array(rng.integers(0, 100, 5000), type=pa.int64()),
            "s": pa.array([f"row{i}" for i in range(5000)]),
        }
    )


def test_read_orc_multi_stripe_lossless(ray_session, tmp_path, table):
    import pyarrow.orc as orc

    from retriv_ray.sources.formats import read_orc, write_orc

    p = str(tmp_path / "t.orc")
    write_orc(table, p, stripe_size=16 * 1024)  # force several stripes
    assert orc.ORCFile(p).nstripes > 1
    got = read_orc(p).sort("id").to_pandas()
    assert list(got["id"]) == list(range(5000))
    assert list(got["v"]) == table.column("v").to_pylist()
    pruned = read_orc(p, columns=["id"]).sort("id").to_pandas()
    assert list(pruned.columns) == ["id"]


def test_read_feather_dir(ray_session, tmp_path, table):
    import pyarrow.feather as feather

    from retriv_ray.sources.formats import read_feather

    for i in range(3):
        feather.write_feather(
            table.slice(i * 1000, 1000), str(tmp_path / f"part{i}.feather")
        )
    got = read_feather(str(tmp_path)).sort("id").to_pandas()
    assert list(got["id"]) == list(range(3000))


def test_read_orc_missing(ray_session, tmp_path):
    from retriv_ray.sources.formats import read_orc

    with pytest.raises(FileNotFoundError):
        read_orc(str(tmp_path))
