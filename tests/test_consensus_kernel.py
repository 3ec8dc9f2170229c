"""Device (JAX) consensus aligner == host (numpy) consensus aligner,
bit-for-bit on scores and alignment transcripts."""

import numpy as np

from metamdbg_tpu.basespace import consensus as host
from metamdbg_tpu.kernels import consensus_jax as dev


def _random_case(rng, n_windows=3, n_frags=24, lb=500, lf=620):
    backbones = rng.integers(0, 4, size=(n_windows, lb)).astype(np.uint8)
    frags = np.full((n_frags, lf), 4, np.uint8)
    lens = np.zeros(n_frags, np.int64)
    offs = np.zeros(n_frags, np.int64)
    wins = rng.integers(0, n_windows, n_frags).astype(np.int64)
    for i in range(n_frags):
        w = wins[i]
        start = int(rng.integers(-20, 60))
        length = int(rng.integers(120, lf))
        src0 = max(0, start)
        piece = backbones[w][src0:src0 + length].copy()
        # mutate ~3% subs + occasional indels
        nerr = rng.binomial(piece.shape[0], 0.03)
        pos = rng.integers(0, max(piece.shape[0], 1), nerr)
        piece[pos] = (piece[pos] + rng.integers(1, 4, nerr).astype(np.uint8)) % 4
        if rng.random() < 0.5 and piece.shape[0] > 50:
            cut = int(rng.integers(10, 40))
            piece = np.delete(piece, slice(cut, cut + int(rng.integers(1, 6))))
        frags[i, :piece.shape[0]] = piece
        lens[i] = piece.shape[0]
        offs[i] = start
    return frags, lens, backbones, wins, offs


def test_device_matches_host():
    rng = np.random.default_rng(5)
    for trial in range(3):
        frags, lens, backbones, wins, offs = _random_case(rng)
        lb = backbones.shape[1]

        d_score, d_of, d_ob = dev.align_fragments_device(
            frags, lens, backbones, wins, offs)

        for i in range(frags.shape[0]):
            bb = backbones[wins[i]]
            h_score, h_tb, h_ei, h_ek = host.banded_align_batch(
                frags[i:i + 1], lens[i:i + 1], bb, offs[i:i + 1])
            h_of, h_ob = host.backtrack_batch(h_tb, h_ei, h_ek,
                                              offs[i:i + 1], lb)
            assert int(d_score[i]) == int(h_score[0]), (trial, i)
            ds = d_of[i][d_of[i] > -2]
            hs = h_of[0][h_of[0] > -2]
            assert np.array_equal(ds, hs), (trial, i)
            ds = d_ob[i][d_ob[i] > -2]
            hs = h_ob[0][h_ob[0] > -2]
            assert np.array_equal(ds, hs), (trial, i)


def test_device_votes_match_host():
    """Device align+vote tables == host pileup tables -> identical consensus."""
    from metamdbg_tpu.basespace.consensus import (consensus_from_votes,
                                                  window_consensus, _BASES)
    from metamdbg_tpu.kernels.consensus_jax import vote_fragments_device

    rng = np.random.default_rng(11)
    lb = 500
    backbones = rng.integers(0, 4, size=(4, lb)).astype(np.uint8)
    draft_windows = [_BASES[b] for b in backbones]
    lf = 640
    n_frags = 40
    frags_codes = np.full((n_frags, lf), 4, np.uint8)
    lens = np.zeros(n_frags, np.int64)
    offs = np.zeros(n_frags, np.int64)
    wins = rng.integers(0, 4, n_frags).astype(np.int64)
    per_window: dict = {w: ([], []) for w in range(4)}
    for i in range(n_frags):
        w = int(wins[i])
        start = int(rng.integers(-15, 30))
        src0 = max(0, start)
        piece = backbones[w][src0:src0 + int(rng.integers(200, 600))].copy()
        nerr = rng.binomial(piece.shape[0], 0.04)
        pos = rng.integers(0, max(piece.shape[0], 1), nerr)
        piece[pos] = (piece[pos] + rng.integers(1, 4, nerr).astype(np.uint8)) % 4
        if piece.shape[0] > 60:
            cut = int(rng.integers(5, 50))
            piece = np.insert(piece, cut, rng.integers(0, 4, 2).astype(np.uint8))
        frags_codes[i, :piece.shape[0]] = piece
        lens[i] = piece.shape[0]
        offs[i] = start
        per_window[w][0].append(_BASES[piece])
        per_window[w][1].append(start)

    votes, ins = vote_fragments_device(frags_codes, lens, backbones, wins, offs)
    for w in range(4):
        per_col = [dict() for _ in range(lb + 1)]
        for (col, s), cnt in ins[w].items():
            per_col[col][s] = per_col[col].get(s, 0) + cnt
        dev_out, dev_depth, dev_cols = consensus_from_votes(
            draft_windows[w], votes[w], per_col)
        host_out, host_depth, host_cols = window_consensus(
            draft_windows[w], per_window[w][0], per_window[w][1])
        assert np.array_equal(dev_out, host_out), w
        assert dev_depth == host_depth, w
        assert np.array_equal(dev_cols, host_cols), w
