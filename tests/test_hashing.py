"""Bit-exactness tests for MurmurHash3 (host numpy and device u32-pair paths).

The oracle is an independent scalar Python implementation of
MurmurHash3_x64_128 written directly from the algorithm (matching
src/utils/MurmurHash3.cpp:246-405), using arbitrary-precision ints masked to
64 bits — a different arithmetic path from both production implementations.
"""

import numpy as np
import pytest

from metamdbg_tpu.utils import hashing

M64 = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(k):
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & M64
    k ^= k >> 33
    return k


def scalar_murmur128(data: bytes, seed: int):
    """Scalar MurmurHash3_x64_128; returns (h1, h2)."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed
    nblocks = len(data) // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[16 * i: 16 * i + 8], "little")
        k2 = int.from_bytes(data[16 * i + 8: 16 * i + 16], "little")
        k1 = (k1 * c1) & M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & M64
        h1 = (h1 * 5 + 0x52DCE729) & M64
        k2 = (k2 * c2) & M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & M64
        h2 = (h2 * 5 + 0x38495AB5) & M64

    tail = data[nblocks * 16:]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * c2) & M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & M64
        h2 ^= k2
    if len(tail) > 0:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * c1) & M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & M64
        h1 ^= k1

    h1 ^= len(data)
    h2 ^= len(data)
    h1 = (h1 + h2) & M64
    h2 = (h2 + h1) & M64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & M64
    h2 = (h2 + h1) & M64
    return h1, h2


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


def test_murmur64_u64key_matches_scalar(rng):
    keys = rng.integers(0, 1 << 64, size=512, dtype=np.uint64)
    keys[:4] = [0, 1, M64, 0x123456789ABCDEF0]
    got = hashing.murmur64_u64key(keys, seed=42)
    for k, g in zip(keys.tolist(), got.tolist()):
        h1, _ = scalar_murmur128(int(k).to_bytes(8, "little"), seed=42)
        assert g == h1, hex(k)


def test_murmur128_u32rows_matches_scalar(rng):
    for k in [1, 2, 3, 4, 5, 7, 8, 9, 16]:
        rows = rng.integers(0, 1 << 32, size=(64, k), dtype=np.uint32)
        h1, h2 = hashing.murmur128_u32rows(rows, seed=0)
        for i in range(rows.shape[0]):
            data = rows[i].tobytes()  # little-endian u32s
            e1, e2 = scalar_murmur128(data, seed=0)
            assert (int(h1[i]), int(h2[i])) == (e1, e2), f"k={k} row={i}"


def test_selection_threshold_semantics(rng):
    # double(h) < density*2^64 must agree with the exact integer threshold.
    from metamdbg_tpu.utils import u64pair

    for density in [0.005, 0.025, 0.5, 1e-9]:
        t = u64pair._exact_u64_threshold(density)
        bound = np.float64(np.float32(density)) * np.float64(np.uint64(M64))
        hs = rng.integers(0, 1 << 64, size=4096, dtype=np.uint64)
        # include values straddling the threshold
        edge = np.array([max(0, t - 1), t % (1 << 64), (t + 1) % (1 << 64)], dtype=np.uint64)
        hs = np.concatenate([hs, edge])
        ref = hs.astype(np.float64) < bound
        got = hs < np.uint64(min(t, M64)) if t <= M64 else np.ones_like(hs, bool)
        np.testing.assert_array_equal(got, ref)


def test_u64pair_murmur_matches_numpy(rng):
    import jax.numpy as jnp

    from metamdbg_tpu.utils import u64pair

    keys = rng.integers(0, 1 << 64, size=257, dtype=np.uint64)
    expected = hashing.murmur64_u64key(keys, seed=42)
    klo = jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    khi = jnp.asarray((keys >> np.uint64(32)).astype(np.uint32))
    glo, ghi = u64pair.murmur64_u64key(klo, khi, seed=42)
    got = np.asarray(glo).astype(np.uint64) | (np.asarray(ghi).astype(np.uint64) << np.uint64(32))
    np.testing.assert_array_equal(got, expected)


def test_u64pair_murmur128_matches_numpy(rng):
    import jax.numpy as jnp

    from metamdbg_tpu.utils import u64pair

    for k in [4, 21]:
        rows = rng.integers(0, 1 << 32, size=(33, k), dtype=np.uint32)
        e1, e2 = hashing.murmur128_u32rows(rows, seed=0)
        h1lo, h1hi, h2lo, h2hi = u64pair.murmur128_u32rows(jnp.asarray(rows), seed=0)
        g1 = np.asarray(h1lo).astype(np.uint64) | (np.asarray(h1hi).astype(np.uint64) << np.uint64(32))
        g2 = np.asarray(h2lo).astype(np.uint64) | (np.asarray(h2hi).astype(np.uint64) << np.uint64(32))
        np.testing.assert_array_equal(g1, e1)
        np.testing.assert_array_equal(g2, e2)


def test_u64pair_select_mask_matches_host(rng):
    import jax.numpy as jnp

    from metamdbg_tpu.utils import u64pair

    keys = rng.integers(0, 1 << 64, size=8192, dtype=np.uint64)
    expected = hashing.minimizer_is_selected(keys, 0.005)
    h = hashing.murmur64_u64key(keys, seed=42)
    hlo = jnp.asarray((h & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hhi = jnp.asarray((h >> np.uint64(32)).astype(np.uint32))
    got = np.asarray(u64pair.minimizer_select_mask(hlo, hhi, 0.005))
    np.testing.assert_array_equal(got, expected)


def test_scalar_murmur_matches_vectorized():
    from metamdbg_tpu.utils.hashing import (murmur128_u32row_scalar,
                                            murmur128_u32rows)
    rng = np.random.default_rng(11)
    for k in (1, 2, 3, 4, 5, 7, 8, 13, 40, 121):
        rows = rng.integers(0, 2**32, size=(5, k), dtype=np.uint64).astype(np.uint32)
        h1, h2 = murmur128_u32rows(rows)
        for i in range(rows.shape[0]):
            s1, s2 = murmur128_u32row_scalar(rows[i].tolist())
            assert (s1, s2) == (int(h1[i]), int(h2[i]))


def test_native_window_hash_matches_numpy():
    """Fused native normalize+murmur window sweep vs the numpy oracle
    (normalize_rows + murmur128_u32rows), incl. palindromic windows and
    every tail length k%4."""
    from metamdbg_tpu.count.kminmers import normalize_rows
    from metamdbg_tpu.sketch import native_sketch
    from metamdbg_tpu.utils.hashing import murmur128_u32rows

    assert native_sketch.available()
    rng = np.random.default_rng(41)
    for w in (2, 3, 4, 5, 7, 8, 21, 50, 101):
        cat = rng.integers(0, 50, 4000).astype(np.uint32)  # dup-heavy
        starts = rng.integers(0, cat.shape[0] - w, 500).astype(np.int64)
        # add palindromic windows
        for s in starts[:5].tolist():
            cat[s:s + w] = cat[s:s + w][::-1].copy() if w % 2 == 0 else \
                np.concatenate([cat[s:s + w // 2],
                                cat[s:s + w // 2 + 1][::-1]])[:w]
        h1, h2 = native_sketch.window_hash_batch(cat, starts, w)
        wins = np.stack([cat[s:s + w] for s in starts.tolist()])
        norm, _ = normalize_rows(wins)
        e1, e2 = murmur128_u32rows(norm)
        assert np.array_equal(h1, e1), w
        assert np.array_equal(h2, e2), w


def test_u64pair_murmur_u32key_specialization(rng):
    """murmur64_u32key (the sketch kernels' hot path, u32 canonical value)
    must be bit-exact vs the generic pair version with keyhi=0."""
    import jax.numpy as jnp

    from metamdbg_tpu.utils import u64pair
    k = jnp.asarray(rng.integers(0, 1 << 30, size=2048).astype(np.uint32))
    glo, ghi = u64pair.murmur64_u64key(k, jnp.zeros_like(k), seed=42)
    slo, shi = u64pair.murmur64_u32key(k, seed=42)
    assert np.array_equal(np.asarray(glo), np.asarray(slo))
    assert np.array_equal(np.asarray(ghi), np.asarray(shi))
