"""file-per-task reader: column pruning, path tagging, big-file block split."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from schemasaurus_ray.sources.io import read_parquet_tasks, read_table


@pytest.fixture(scope="module")
def files(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("io")
    for s in range(3):
        t = pa.table({
            "k": pa.array([f"{s}-{i}" for i in range(1000)], pa.string()),
            "v": pa.array(range(1000), pa.int64()),
            "w": pa.array([1.5] * 1000, pa.float64()),
        })
        pq.write_table(t, str(d / f"f{s}.parquet"))
    return sorted(str(d / f"f{s}.parquet") for s in range(3))


def test_read_all(files):
    ds = read_parquet_tasks(files)
    assert ds.count() == 3000
    assert set(ds.schema().names) == {"k", "v", "w"}


def test_column_pruning_and_paths(files):
    ds = read_parquet_tasks(files, columns=["k"], include_paths=True)
    tbl = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))
    # include_paths carries BOTH lineage columns: source path + EACH ROW's
    # offset within its file (any batch's first row is then a retry-stable,
    # batching-independent batch identity for sinks)
    assert set(tbl.column_names) == {"k", "path", "row_start"}
    assert set(tbl.column("path").to_pylist()) == set(files)
    per_file = tbl.group_by("path").aggregate([("row_start", "list")])
    for offs in per_file.column("row_start_list").to_pylist():
        assert sorted(offs) == list(range(1000))  # per-row offsets 0..n-1


def test_block_split_for_big_files(files):
    """The reader's generator yields ≤target-sized slices (Ray may merge
    them back up to DataContext.target_max_block_size downstream — the
    split matters for files larger than that). Rows must round-trip."""
    ds = read_parquet_tasks(files, target_block_bytes=8_192)
    blocks = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    assert sum(b.num_rows for b in blocks) == 3000
    assert set(pa.concat_tables(blocks).column("k").to_pylist()) == {
        f"{s}-{i}" for s in range(3) for i in range(1000)
    }


def test_read_table_lance_gated(tmp_path):
    with pytest.raises(ImportError):
        read_table(str(tmp_path / "x.lance"))
