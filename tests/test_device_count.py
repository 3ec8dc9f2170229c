"""Device counting (kernels/count_jax.py) == host np.lexsort grouping."""

import numpy as np

from metamdbg_tpu.count import kminmers
from metamdbg_tpu.kernels.count_jax import count_unique_rows_device


def _host_count(rows):
    order = kminmers.sort_rows_lex(rows)
    s = rows[order]
    new_group = np.empty(s.shape[0], dtype=bool)
    new_group[0] = True
    np.not_equal(s[1:], s[:-1]).any(axis=1, out=new_group[1:])
    starts = np.flatnonzero(new_group)
    counts = np.diff(np.append(starts, s.shape[0])).astype(np.uint32)
    return s[starts], counts


def test_device_count_matches_host():
    rng = np.random.default_rng(7)
    for (n, k, vocab) in [(1, 4, 10), (1000, 4, 50), (5000, 7, 9),
                          (4096, 5, 2**30)]:
        rows = rng.integers(0, vocab, size=(n, k)).astype(np.uint32)
        hu, hc = _host_count(rows)
        du, dc = count_unique_rows_device(rows)
        assert np.array_equal(hu, du)
        assert np.array_equal(hc, dc)


def test_count_unique_rows_dispatch_parity(monkeypatch):
    """The production entry point gives identical results above and below
    the device-dispatch threshold."""
    rng = np.random.default_rng(3)
    rows = rng.integers(0, 13, size=(70000, 4)).astype(np.uint32)
    monkeypatch.setattr(kminmers, "_DEVICE_COUNT_MIN_ROWS", 1 << 62)
    hu, hc = kminmers.count_unique_rows(rows)
    monkeypatch.setattr(kminmers, "_DEVICE_COUNT_MIN_ROWS", 1)
    du, dc = kminmers.count_unique_rows(rows)
    assert np.array_equal(hu, du)
    assert np.array_equal(hc, dc)


def test_bounded_count_matches_monolithic():
    """The memory-bounded chunked first pass (triggered when the window
    table would exceed the CreateMdbg.cpp:223-226-style bound) must return
    the exact dict the monolithic path returns — solid, rescued, all."""
    rng = np.random.default_rng(11)
    reads = []
    for _ in range(300):
        n = int(rng.integers(4, 60))
        # small vocab so abundances >1 and rescue reads both occur
        reads.append(rng.integers(0, 500, size=n).astype(np.uint32))

    mono = kminmers.count_kminmers(reads, 4, max_table_bytes=1 << 40)
    bounded = kminmers.count_kminmers(reads, 4, max_table_bytes=1024)
    for key in ("solid_rows", "solid_counts", "rescued_rows",
                "all_rows", "all_counts"):
        assert np.array_equal(mono[key], bounded[key]), key
