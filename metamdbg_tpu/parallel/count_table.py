"""Sharded k-min-mer count table over a device mesh.

The TPU-native replacement for the reference's hash-sharded disk partitions
(KminmerCounter, src/graph/CreateMdbg.hpp:3591-3883): minimizer reads are
data-parallel across devices; each device extracts k-windows, hashes them
(128-bit murmur on u32 pairs), routes them to the owning shard with
`all_to_all` over the mesh (ICI), and each shard sorts + run-length counts
its slice. No mutexes, no disk partitions — collectives + sort.

Shapes are static: routing uses fixed-capacity buckets (overflow counted and
reported, never silently dropped).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..utils import u64pair


def _window_hash_pairs(minimizers: jax.Array, lengths: jax.Array, k: int):
    """(R, M) u32 padded minimizer rows -> hash128 of all normalized
    k-windows + validity mask. Returns (h1lo, h1hi, h2lo, h2hi, valid),
    each (R, M-k+1)."""
    r, m = minimizers.shape
    nw = m - k + 1
    # windows (R, nw, k)
    idx = jax.lax.broadcasted_iota(jnp.int32, (nw, k), 0) + \
        jax.lax.broadcasted_iota(jnp.int32, (nw, k), 1)
    wins = minimizers[:, idx]                      # (R, nw, k)
    rev = wins[:, :, ::-1]
    # lexicographic min(win, reversed)
    neq = wins != rev
    any_neq = neq.any(axis=2)
    first = jnp.where(any_neq, jnp.argmax(neq, axis=2), k - 1)
    fw = jnp.take_along_axis(wins, first[:, :, None], axis=2)[:, :, 0]
    rv = jnp.take_along_axis(rev, first[:, :, None], axis=2)[:, :, 0]
    is_rev = ~(fw < rv)
    norm = jnp.where(is_rev[:, :, None], rev, wins)
    h1lo, h1hi, h2lo, h2hi = u64pair.murmur128_u32rows(norm, seed=0)
    pos = jax.lax.broadcasted_iota(jnp.int32, (r, nw), 1)
    valid = pos < (lengths[:, None] - k + 1)
    return h1lo, h1hi, h2lo, h2hi, valid


def _local_sort_count(h1lo, h1hi, h2lo, h2hi, valid):
    """Sort flattened hash pairs, run-length count. Invalid slots sort last.
    Returns (sorted keys (4 arrays), counts, is_group_head mask)."""
    flat = [x.reshape(-1) for x in (h1hi, h1lo, h2hi, h2lo)]
    v = valid.reshape(-1)
    # force invalid entries to the max key so they group at the end
    flat = [jnp.where(v, x, jnp.uint32(0xFFFFFFFF)) for x in flat]
    order = jnp.lexsort(tuple(reversed(flat)))  # primary = h1hi
    s = [x[order] for x in flat]
    sv = v[order]
    same = jnp.ones(s[0].shape[0], bool)
    same = same.at[1:].set((s[0][1:] == s[0][:-1]) & (s[1][1:] == s[1][:-1])
                           & (s[2][1:] == s[2][:-1]) & (s[3][1:] == s[3][:-1]))
    head = ~same
    head = head.at[0].set(True)
    group_id = jnp.cumsum(head.astype(jnp.int32)) - 1
    counts = jax.ops.segment_sum(sv.astype(jnp.int32), group_id,
                                 num_segments=s[0].shape[0])
    # counts is indexed by group rank; expand back to positions
    counts_at_pos = counts[group_id]
    return s, counts_at_pos, head & sv


def count_kminmers_sharded(mesh: Mesh, axis: str = "data"):
    """Builds a jitted sharded counting step over `mesh`.

    Step signature: (minimizers u32[R, M], lengths i32[R]) sharded on R ->
    (distinct_total i64-ish i32, solid_total, overflow_total), plus per-shard
    sorted hash/count arrays (left device-resident).
    """
    ndev = mesh.shape[axis]

    def step(minimizers, lengths):
        h1lo, h1hi, h2lo, h2hi, valid = _window_hash_pairs(
            minimizers, lengths, step.k)
        n = h1lo.size
        cap = max(1, (2 * n) // ndev)

        # route by h1lo % ndev
        flat = [x.reshape(-1) for x in (h1lo, h1hi, h2lo, h2hi)]
        v = valid.reshape(-1)
        shard = (flat[0] % jnp.uint32(ndev)).astype(jnp.int32)
        shard = jnp.where(v, shard, ndev)  # invalid -> overflow bucket

        # stable sort by shard, slot within shard
        order = jnp.argsort(shard, stable=True)
        shard_s = shard[order]
        fs = [x[order] for x in flat]
        pos_in_shard = jnp.arange(n) - jnp.searchsorted(shard_s, shard_s, side="left")
        overflow = (pos_in_shard >= cap) & (shard_s < ndev)
        keep = (pos_in_shard < cap) & (shard_s < ndev)

        # scatter into (ndev, cap) buckets; non-kept entries aim out of range
        bucket = jnp.full((ndev * cap,), jnp.uint32(0xFFFFFFFF))
        buckets = []
        dst = shard_s * cap + jnp.minimum(pos_in_shard, cap - 1)
        dst = jnp.where(keep, dst, ndev * cap)  # dropped by mode="drop"
        for x in fs:
            buckets.append(bucket.at[dst].set(x, mode="drop").reshape(ndev, cap))
        bvalid = jnp.zeros((ndev * cap,), bool).at[dst].set(True, mode="drop") \
            .reshape(ndev, cap)

        # all_to_all: axis 0 is the destination shard
        ex = [jax.lax.all_to_all(b, axis, 0, 0, tiled=False) for b in buckets]
        exv = jax.lax.all_to_all(bvalid, axis, 0, 0, tiled=False)
        ex = [x.reshape(-1) for x in ex]
        exv = exv.reshape(-1)

        s, counts, heads = _local_sort_count(
            ex[0].reshape(1, -1), ex[1].reshape(1, -1),
            ex[2].reshape(1, -1), ex[3].reshape(1, -1), exv.reshape(1, -1))

        distinct = jax.lax.psum(heads.sum(), axis)
        solid = jax.lax.psum((heads & (counts > 1)).sum(), axis)
        overflow_total = jax.lax.psum(overflow.sum(), axis)
        return distinct, solid, overflow_total

    def build(k: int):
        step.k = k
        return jax.jit(jax.shard_map(
            step, mesh=mesh,
            in_specs=(P(axis, None), P(axis)),
            out_specs=(P(), P(), P())))

    return build
