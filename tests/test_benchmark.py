"""Benchmark harness tests: registry parsing, rep protocol, CSV output
format, plot-tool round-trip (reference: src/benchmark/benchmark.cc and
plot_benchmark.py)."""

import io
import numpy as np
import pytest

from ndzip_tpu import benchmark as bm
from ndzip_tpu import plot_benchmark as pb


@pytest.fixture
def registry(tmp_path):
    rng = np.random.default_rng(0)
    d1 = np.sin(np.arange(4096 * 3 + 5, dtype=np.float32) * 1e-3)
    d1.tofile(tmp_path / "a.f32")
    d2 = rng.standard_normal((70, 66)).astype(np.float64)
    d2.tofile(tmp_path / "b.f64")
    meta = tmp_path / "meta.csv"
    meta.write_text("a.f32;float;12293\nb.f64;double;70 66\n")
    return meta


def test_registry_parse(registry):
    sets = bm.read_dataset_registry(registry)
    assert [d.name for d in sets] == ["a.f32", "b.f64"]
    assert sets[0].dtype == np.float32 and sets[0].shape == (12293,)
    assert sets[1].dtype == np.float64 and sets[1].shape == (70, 66)
    data = sets[1].load()
    assert data.shape == (70, 66)


def test_registry_rejects_bad_lines(tmp_path):
    meta = tmp_path / "meta.csv"
    meta.write_text("a.f32;float\n")
    with pytest.raises(ValueError):
        bm.read_dataset_registry(meta)
    meta.write_text("a.f32;quad;16\n")
    with pytest.raises(ValueError):
        bm.read_dataset_registry(meta)


def test_rep_protocol_counts():
    calls = []
    times = bm._rep_loop(lambda: calls.append(1), min_time=0.0,
                         min_reps=3, max_reps=10, trash_cache=False)
    # warm-up + min_reps timed reps
    assert len(times) == 3 and len(calls) == 4

    times = bm._rep_loop(lambda: None, min_time=1e9, min_reps=1,
                         max_reps=5, trash_cache=False)
    assert len(times) == 5  # max_reps cap


def test_benchmark_file_round_trips_and_formats(registry):
    sets = bm.read_dataset_registry(registry)
    algos = {k: v for k, v in bm.default_algorithms().items()
             if k in ("memcpy", "deflate", "ndzip-golden")}
    out = io.StringIO()
    for ds in sets:
        bm.benchmark_file(ds, algos, [1], min_time=0.0, min_reps=1,
                          max_reps=2, out=out)
    rows = out.getvalue().strip().splitlines()
    # memcpy + deflate x2 tunables + golden, per dataset
    assert len(rows) == 8
    cols = rows[0].split(";")
    assert cols[0] == "a.f32" and cols[1] == "float" and cols[2] == "1"


def test_plot_tool_reads_harness_output(registry, tmp_path):
    sets = bm.read_dataset_registry(registry)
    algos = {k: v for k, v in bm.default_algorithms().items()
             if k in ("memcpy", "ndzip-golden")}
    out = io.StringIO()
    out.write(bm.CSV_HEADER + "\n")
    for ds in sets:
        bm.benchmark_file(ds, algos, [1], min_time=0.0, min_reps=2,
                          max_reps=3, out=out)
    out.seek(0)
    rows = pb.read_rows(out)
    assert len(rows) == 4
    assert all(len(r.comp_times) >= 2 for r in rows)
    table = pb.summarize(rows)
    assert len(table) == 2
    golden = [t for t in table if t[0].startswith("ndzip-golden")][0]
    assert 0.0 < golden[2] < 1.0  # compression ratio
    buf = io.StringIO()
    pb.print_table(table, out=buf)
    assert "ndzip-golden" in buf.getvalue()


def test_synthetic_generator(tmp_path):
    sets = bm.make_synthetic(tmp_path / "s")
    assert len(sets) == 3
    # files exist and sizes match metadata
    for ds in sets:
        n = int(np.prod(ds.shape))
        assert ds.path.stat().st_size == n * ds.dtype.itemsize
