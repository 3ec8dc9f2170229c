"""Device (JAX/XLA) batched anchor-chaining DP.

The correction subsystem's hot loop (ReadMapper / MinimizerChainer banded
chaining, src/readSelection/ReadMapper.hpp:887-1230) batched over MANY
(read, target) anchor lists at once: a lax.scan over anchor index with a
rolling band window, bit-identical to correction/chainer.chain_dp
(f32 scores, descending-j tie-break, same gap/direction constraints).

Shapes: anchors padded to (P, A); band window materialized per step as a
static-width slice of left-padded arrays (the re-based-lanes trick from the
consensus kernel).
"""

import functools

import numpy as np

from ..correction.chainer import CHAIN_MAX_DIST, CHAIN_MAX_GAP, CHAIN_W


@functools.lru_cache(maxsize=None)
def _get_jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


@functools.lru_cache(maxsize=None)
def _chainer(a_max: int, band: int):
    jax, jnp = _get_jax()

    def run(ref_pos, q_pos, is_rev, n_anchors):
        P = ref_pos.shape[0]
        B = band
        NEGF = jnp.float32(-3.0e38)

        # left-pad by B so the window [i-B, i) is a static-width slice
        def pad(x, fill):
            return jnp.pad(x, ((0, 0), (B, 0)), constant_values=fill)

        rp = pad(ref_pos.astype(jnp.int32), -(1 << 30))
        qp = pad(q_pos.astype(jnp.int32), -(1 << 30))
        rv = pad(is_rev.astype(jnp.int32), 2)   # 2 never equals 0/1

        def step(carry, i):
            scores_pad, parents = carry
            # window of the B predecessors of anchor i (padded coords i..i+B)
            w_rp = jax.lax.dynamic_slice_in_dim(rp, i, B, axis=1)
            w_qp = jax.lax.dynamic_slice_in_dim(qp, i, B, axis=1)
            w_rv = jax.lax.dynamic_slice_in_dim(rv, i, B, axis=1)
            w_sc = jax.lax.dynamic_slice_in_dim(scores_pad, i, B, axis=1)
            rp_i = rp[:, i + B][:, None]
            qp_i = qp[:, i + B][:, None]
            rv_i = rv[:, i + B][:, None]

            d_r = rp_i - w_rp
            d_q = jnp.where(rv_i == 1, w_qp - qp_i, qp_i - w_qp)
            gap = jnp.abs(d_r - d_q)
            ok = (w_rv == rv_i)
            ok &= (w_rp != rp_i) & (w_qp != qp_i)
            ok &= (d_q <= CHAIN_MAX_DIST) & (d_r <= CHAIN_MAX_DIST)
            ok &= d_r > 0
            ok &= gap <= CHAIN_MAX_GAP
            ok &= jnp.where(rv_i == 1, ~(qp_i > w_qp), ~(qp_i < w_qp))
            # window slot t corresponds to anchor j = i - B + t; only real
            # predecessors (j >= 0, i.e. padded slot content valid) count —
            # the pad fill makes d_r huge, so `ok` is already False there.
            cand = w_sc + (CHAIN_W - gap.astype(jnp.float32))
            cand = jnp.where(ok, cand, NEGF)
            # descending-j scan with strict > == pick the LAST maximum
            rev_cand = cand[:, ::-1]
            t_rev = jnp.argmax(rev_cand, axis=1)
            best = rev_cand[jnp.arange(P), t_rev]
            best_j = (i - 1 - t_rev).astype(jnp.int32)
            take = best > jnp.float32(0.0)
            new_score = jnp.where(take, best, CHAIN_W)
            new_parent = jnp.where(take, best_j, jnp.int32(-1))
            # anchors beyond n_anchors keep score 0 (never selected)
            valid_i = i < n_anchors
            new_score = jnp.where(valid_i, new_score, jnp.float32(0.0))
            new_parent = jnp.where(valid_i, new_parent, jnp.int32(-1))
            scores_pad = jax.lax.dynamic_update_slice_in_dim(
                scores_pad, new_score[:, None], i + B, axis=1)
            parents = jax.lax.dynamic_update_slice_in_dim(
                parents, new_parent[:, None], i, axis=1)
            return (scores_pad, parents), None

        scores_pad0 = jnp.zeros((P, a_max + B), jnp.float32)
        parents0 = jnp.full((P, a_max), -1, jnp.int32)
        (scores_pad, parents), _ = jax.lax.scan(
            step, (scores_pad0, parents0),
            jnp.arange(a_max, dtype=jnp.int32))
        scores = scores_pad[:, B:]
        # best index: strict > scanning ascending == FIRST maximum, but only
        # among valid anchors with score > 0
        valid = (jnp.arange(a_max)[None, :] < n_anchors[:, None])
        masked = jnp.where(valid, scores, jnp.float32(0.0))
        best_index = jnp.argmax(masked, axis=1).astype(jnp.int32)
        best_score = masked[jnp.arange(P), best_index]
        best_index = jnp.where(best_score > 0, best_index, jnp.int32(-1))
        return scores, parents, best_index

    return _get_jax()[0].jit(run)


def chain_dp_device(ref_pos: np.ndarray, q_pos: np.ndarray,
                    is_rev: np.ndarray, n_anchors: np.ndarray,
                    band: int):
    """Batched chain DP. Inputs (P, A) padded arrays + (P,) lengths.
    Returns (scores (P,A) f32, parents (P,A) i32, best_index (P,) i32),
    matching correction.chainer.chain_dp per row exactly."""
    P, A = ref_pos.shape
    fn = _chainer(int(A), int(band))
    jnp = _get_jax()[1]
    scores, parents, best = fn(jnp.asarray(ref_pos), jnp.asarray(q_pos),
                               jnp.asarray(is_rev),
                               jnp.asarray(n_anchors))
    return np.asarray(scores), np.asarray(parents), np.asarray(best)


# -- ReadVsContigMapper variant (basespace/contig_mapper.py) ----------------
#
# Same banded DP shape as _chainer but with the contig mapper's constraint
# set (src/toBasespace/ReadVsContigMapper.hpp:820-866): band 10, w 20,
# gap cap 100, minimizer-space span cap d_r <= d_r_max (the host's
# `d_r * avg_dist > 5000` with exact f64 product semantics folded into an
# integer bound), and base-space spacing caps of 5000 via per-anchor query
# bp positions.

@functools.lru_cache(maxsize=None)
def _chainer_contig(a_max: int, band: int, d_r_max: int, w: float,
                    max_gap: int, bp_cap: int):
    jax, jnp = _get_jax()

    def run(ref_pos, q_pos, q_bp, is_rev, n_anchors):
        P = ref_pos.shape[0]
        B = band
        NEGF = jnp.float32(-3.0e38)
        W = jnp.float32(w)

        def pad(x, fill):
            return jnp.pad(x, ((0, 0), (B, 0)), constant_values=fill)

        rp = pad(ref_pos.astype(jnp.int32), -(1 << 30))
        qp = pad(q_pos.astype(jnp.int32), -(1 << 30))
        qb = pad(q_bp.astype(jnp.int32), 1 << 30)
        rv = pad(is_rev.astype(jnp.int32), 2)

        def step(carry, i):
            scores_pad, parents = carry
            w_rp = jax.lax.dynamic_slice_in_dim(rp, i, B, axis=1)
            w_qp = jax.lax.dynamic_slice_in_dim(qp, i, B, axis=1)
            w_qb = jax.lax.dynamic_slice_in_dim(qb, i, B, axis=1)
            w_rv = jax.lax.dynamic_slice_in_dim(rv, i, B, axis=1)
            w_sc = jax.lax.dynamic_slice_in_dim(scores_pad, i, B, axis=1)
            rp_i = rp[:, i + B][:, None]
            qp_i = qp[:, i + B][:, None]
            qb_i = qb[:, i + B][:, None]
            rv_i = rv[:, i + B][:, None]

            d_r = rp_i - w_rp
            d_q = jnp.where(rv_i == 1, w_qp - qp_i, qp_i - w_qp)
            gap = jnp.abs(d_r - d_q)
            ok = (w_rv == rv_i)
            ok &= (w_rp != rp_i) & (w_qp != qp_i)
            ok &= (d_r <= d_r_max) & (d_r > 0)
            ok &= gap <= max_gap
            d_bp = jnp.where(rv_i == 1, w_qb - qb_i, qb_i - w_qb)
            ok &= d_bp <= bp_cap
            ok &= jnp.where(rv_i == 1, ~(qp_i > w_qp), ~(qp_i < w_qp))
            cand = w_sc + (W - gap.astype(jnp.float32))
            cand = jnp.where(ok, cand, NEGF)
            rev_cand = cand[:, ::-1]
            t_rev = jnp.argmax(rev_cand, axis=1)
            best = rev_cand[jnp.arange(P), t_rev]
            best_j = (i - 1 - t_rev).astype(jnp.int32)
            take = best > jnp.float32(0.0)
            new_score = jnp.where(take, best, W)
            new_parent = jnp.where(take, best_j, jnp.int32(-1))
            valid_i = i < n_anchors
            new_score = jnp.where(valid_i, new_score, jnp.float32(0.0))
            new_parent = jnp.where(valid_i, new_parent, jnp.int32(-1))
            scores_pad = jax.lax.dynamic_update_slice_in_dim(
                scores_pad, new_score[:, None], i + B, axis=1)
            parents = jax.lax.dynamic_update_slice_in_dim(
                parents, new_parent[:, None], i, axis=1)
            return (scores_pad, parents), None

        scores_pad0 = jnp.zeros((P, a_max + B), jnp.float32)
        parents0 = jnp.full((P, a_max), -1, jnp.int32)
        (scores_pad, parents), _ = jax.lax.scan(
            step, (scores_pad0, parents0),
            jnp.arange(a_max, dtype=jnp.int32))
        scores = scores_pad[:, B:]
        valid = (jnp.arange(a_max)[None, :] < n_anchors[:, None])
        masked = jnp.where(valid, scores, jnp.float32(0.0))
        best_index = jnp.argmax(masked, axis=1).astype(jnp.int32)
        best_score = masked[jnp.arange(P), best_index]
        best_index = jnp.where(best_score > 0, best_index, jnp.int32(-1))
        return scores, parents, best_index

    return _get_jax()[0].jit(run)


def chain_contig_device(ref_pos, q_pos, q_bp, is_rev, n_anchors, band: int,
                        d_r_max: int, w: float, max_gap: int, bp_cap: int):
    """Batched ReadVsContigMapper chain DP over (P, A) padded anchor groups.
    Returns (scores f32, parents i32, best_index i32), bit-identical per row
    to basespace/contig_mapper._chain."""
    P, A = ref_pos.shape
    fn = _chainer_contig(int(A), int(band), int(d_r_max), float(w),
                         int(max_gap), int(bp_cap))
    jnp = _get_jax()[1]
    scores, parents, best = fn(jnp.asarray(ref_pos), jnp.asarray(q_pos),
                               jnp.asarray(q_bp), jnp.asarray(is_rev),
                               jnp.asarray(n_anchors))
    return np.asarray(scores), np.asarray(parents), np.asarray(best)
