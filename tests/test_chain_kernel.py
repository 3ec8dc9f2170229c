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
