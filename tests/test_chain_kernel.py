"""Device batched chain DP == host chain_dp (scores, parents, best index)."""

import numpy as np

from metamdbg_tpu.correction.chainer import chain_dp
from metamdbg_tpu.kernels.chain_jax import chain_dp_device


def test_device_chain_matches_host():
    rng = np.random.default_rng(9)
    P, A = 40, 96
    band = 62
    ref_pos = np.zeros((P, A), np.int64)
    q_pos = np.zeros((P, A), np.int64)
    is_rev = np.zeros((P, A), bool)
    n_anchors = rng.integers(3, A + 1, P)
    for p in range(P):
        n = n_anchors[p]
        # collinear-ish anchors with noise, sorted by (ref, query)
        base = np.sort(rng.integers(0, 6000, n))
        ref_pos[p, :n] = base
        direction = rng.random() < 0.5
        qb = base + rng.integers(-40, 40, n)
        if direction:
            q_pos[p, :n] = qb
        else:
            q_pos[p, :n] = 6000 - qb
            is_rev[p, :n] = True
        # some random noise anchors
        k = rng.integers(0, n // 3 + 1)
        idx = rng.integers(0, n, k)
        q_pos[p, idx] = rng.integers(0, 6000, k)
        order = np.lexsort((q_pos[p, :n], ref_pos[p, :n]))
        ref_pos[p, :n] = ref_pos[p, :n][order]
        q_pos[p, :n] = q_pos[p, :n][order]
        is_rev[p, :n] = is_rev[p, :n][order]

    d_scores, d_parents, d_best = chain_dp_device(ref_pos, q_pos, is_rev,
                                                  n_anchors, band)
    for p in range(P):
        n = int(n_anchors[p])
        h_scores, h_parents, h_best = chain_dp(
            ref_pos[p, :n], q_pos[p, :n], is_rev[p, :n], band)
        assert np.array_equal(h_scores, d_scores[p, :n]), p
        assert np.array_equal(h_parents, d_parents[p, :n].astype(np.int64)), p
        assert int(h_best) == int(d_best[p]), p


def test_native_corr_chain_matches_numpy(monkeypatch):
    """native/sketch.cpp chain_corr_batch vs the numpy oracle across
    dense/sparse/reverse/degenerate anchor sets."""
    import os

    from metamdbg_tpu.correction import chainer
    from metamdbg_tpu.sketch import native_sketch

    if not native_sketch.available():
        import pytest
        pytest.fail("native sketch library must build in this environment")

    rng = np.random.default_rng(17)
    for trial in range(200):
        n = int(rng.integers(1, 120))
        rp = np.sort(rng.integers(0, 8000, n)).astype(np.int64)
        qp = rng.integers(0, 8000, n).astype(np.int64)
        if trial % 3 == 0:  # correlated anchors: realistic chains
            qp = rp + rng.integers(-60, 60, n)
        rv = (rng.random(n) < (0.5 if trial % 2 else 0.0))
        band = int(rng.integers(1, 40))

        monkeypatch.setenv("METAMDBG_TPU_HOST_CHAIN", "1")
        s1, p1, b1 = chainer.chain_dp(rp, qp, rv, band)
        monkeypatch.delenv("METAMDBG_TPU_HOST_CHAIN")
        s2, p2, b2 = chainer.chain_dp(rp, qp, rv, band)

        assert b1 == b2, trial
        assert np.array_equal(s1, s2), trial
        assert np.array_equal(p1, p2), trial


def test_collect_anchors_vectorized_matches_dict():
    """Vectorized anchor gather vs the reference's dict-of-occurrences
    transcription (duplicate minimizers on both sides)."""
    import dataclasses

    from metamdbg_tpu.correction import chainer

    @dataclasses.dataclass
    class R:
        minimizers: np.ndarray
        positions: np.ndarray
        directions: np.ndarray

    rng = np.random.default_rng(9)
    for _ in range(100):
        nr, nq = int(rng.integers(0, 60)), int(rng.integers(0, 60))
        vocab = 30  # heavy duplication
        ref = R(rng.integers(0, vocab, nr).astype(np.uint32),
                np.sort(rng.integers(0, 5000, nr)).astype(np.uint32),
                rng.integers(0, 2, nr).astype(np.uint8))
        q = R(rng.integers(0, vocab, nq).astype(np.uint32),
              np.sort(rng.integers(0, 5000, nq)).astype(np.uint32),
              rng.integers(0, 2, nq).astype(np.uint8))

        got = chainer.collect_anchors(ref, q)

        ref_map = {}
        for i in range(nr):
            ref_map.setdefault(int(ref.minimizers[i]), []).append(
                (int(ref.positions[i]), i, bool(ref.directions[i])))
        rp, qp, rv, ri, qi = [], [], [], [], []
        for i in range(nq):
            for (pos, idx, rev) in ref_map.get(int(q.minimizers[i]), []):
                rp.append(pos)
                qp.append(int(q.positions[i]))
                rv.append(rev != bool(q.directions[i]))
                ri.append(idx)
                qi.append(i)
        want = (np.asarray(rp, np.int64), np.asarray(qp, np.int64),
                np.asarray(rv, bool), np.asarray(ri, np.int64),
                np.asarray(qi, np.int64))
        for g, w in zip(got, want):
            assert np.array_equal(g, w)
