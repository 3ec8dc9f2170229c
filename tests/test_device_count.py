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


def test_rescue_vectorized_matches_loop():
    """Vectorized RescueKminmerFunctor vs a direct per-read transcription
    (empty reads, all-weak reads, even/odd window counts, high-abundance
    reads that must NOT be rescued)."""
    rng = np.random.default_rng(21)
    reads = []
    for i in range(200):
        n = int(rng.integers(0, 30))
        vocab = 40 if i % 3 else 100000  # mix solid-rich and weak-only reads
        reads.append(rng.integers(0, vocab, size=n).astype(np.uint32))
    k = 4
    rows, read_ids, _, offsets = kminmers.batch_extract_kminmers(reads, k)
    uniq, counts = kminmers.count_unique_rows(rows)
    solid = counts > 1
    solid_rows, solid_counts = uniq[solid], counts[solid]

    got = kminmers._rescue(rows, read_ids, offsets, solid_rows,
                           solid_counts, k)

    # direct transcription of CreateMdbg.hpp:4579-4637
    abundances, hit = kminmers._lookup_rows(
        rows, solid_rows, solid_counts.astype(np.uint32), 1)
    rescued = []
    for r in range(offsets.shape[0] - 1):
        a, b = offsets[r], offsets[r + 1]
        if a == b:
            continue
        isin = hit[a:b]
        if not isin.any():
            continue
        s = np.sort(abundances[a:b])
        n = s.shape[0]
        if n % 2 == 0:
            med = ((int(s[n // 2 - 1]) + int(s[n // 2])) & 0xFFFFFFFF) // 2
        else:
            med = int(s[n // 2])
        if np.float64(np.float32(med) * np.float32(0.1)) > 1:
            continue
        weak = rows[a:b][~isin]
        if weak.shape[0]:
            rescued.append(weak)
    if rescued:
        want, _ = kminmers.count_unique_rows(np.concatenate(rescued))
    else:
        want = np.zeros((0, k), np.uint32)
    assert np.array_equal(got, want)
    assert got.shape[0] > 0  # the dataset must actually exercise rescue
