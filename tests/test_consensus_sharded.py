"""Mesh-sharded consensus voting == single-device voting (8-device CPU mesh)."""

import numpy as np
import pytest


def _case(rng, n_frags, nw=4, lb=500, lf=640):
    backbones = rng.integers(0, 4, size=(nw, lb)).astype(np.uint8)
    frags = np.full((n_frags, lf), 4, np.uint8)
    lens = np.zeros(n_frags, np.int64)
    offs = np.zeros(n_frags, np.int64)
    wins = rng.integers(0, nw, n_frags).astype(np.int64)
    for i in range(n_frags):
        w = wins[i]
        start = int(rng.integers(-10, 40))
        src0 = max(0, start)
        piece = backbones[w][src0:src0 + int(rng.integers(150, 600))].copy()
        nerr = rng.binomial(piece.shape[0], 0.03)
        pos = rng.integers(0, max(piece.shape[0], 1), nerr)
        piece[pos] = (piece[pos] + rng.integers(1, 4, nerr).astype(np.uint8)) % 4
        frags[i, :piece.shape[0]] = piece
        lens[i] = piece.shape[0]
        offs[i] = start
    return frags, lens, backbones, wins, offs


def test_sharded_matches_single_device():
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from metamdbg_tpu.kernels.consensus_jax import vote_fragments_device
    from metamdbg_tpu.parallel.consensus_sharded import vote_fragments_sharded

    rng = np.random.default_rng(3)
    frags, lens, backbones, wins, offs = _case(rng, n_frags=37)  # not a multiple of 8
    v1, ins1 = vote_fragments_device(frags, lens, backbones, wins, offs)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    v2, ins2 = vote_fragments_sharded(mesh, frags, lens, backbones, wins, offs)
    assert np.array_equal(v1, v2)
    assert ins1 == ins2
