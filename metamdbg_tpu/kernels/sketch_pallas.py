"""EXPERIMENTAL Pallas TPU kernel for batch minimizer sketching.

Status (round 1): NOT used by production paths. The XLA-fused jnp kernel in
kernels/sketch.py is the production sketcher (~1.15 Gbases/s on v5e, bit-
exact vs host). This Pallas version reached 1.30 Gbases/s at block_rows=32
but two issues block adoption:
  1. overlapping unaligned column slices of a VMEM value (the naive
     ``base[:, j:j+w] << shift`` accumulation) miscompile on the current
     Mosaic version — bits of some shifted contributions are dropped;
  2. the pltpu.roll rewrite avoids (1) but the remote-compile service in
     this environment rejects it (HTTP 500 in tpu_compile_helper).
Revisit in round 2 with a scratch-buffer formulation.

Design: grid over read blocks; full read length per block so k-mer windows
never cross block boundaries; in-kernel 2048-column slabs bound live u32
intermediates under the VMEM budget; 64-bit murmur math as (lo, hi) u32
pairs (utils/u64pair.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import u64pair


CHUNK = 2048  # columns per in-kernel slab (bounds live u32 intermediates)


def _sketch_kernel(codes_ref, values_ref, selected_ref, dirs_ref,
                   *, l, threshold):
    rows, L = codes_ref.shape
    nk = L - l + 1
    tlo, thi = u64pair.split(threshold)
    codes_all = codes_ref[...].astype(jnp.uint32)

    for c in range(0, nk, CHUNK):
        w = min(CHUNK, nk - c)
        codes = codes_all[:, c:c + w + l - 1]
        is_bad = codes >= 4
        base = jnp.where(is_bad, 0, codes)
        comp = base ^ 2

        # build via roll + full-width accumulate (overlapping unaligned
        # slices of VMEM values miscompile on some Mosaic versions)
        W = codes.shape[1]
        fwd_f = jnp.zeros((rows, W), jnp.uint32)
        rev_f = jnp.zeros((rows, W), jnp.uint32)
        inv_f = jnp.zeros((rows, W), jnp.bool_)
        b_roll, c_roll, i_roll = base, comp, is_bad
        for j in range(l):
            fwd_f = fwd_f | (b_roll << (2 * (l - 1 - j)))
            rev_f = rev_f | (c_roll << (2 * j))
            inv_f = inv_f | i_roll
            if j + 1 < l:
                b_roll = pltpu.roll(b_roll, W - 1, 1)
                c_roll = pltpu.roll(c_roll, W - 1, 1)
                i_roll = pltpu.roll(i_roll, W - 1, 1)
        fwd = fwd_f[:, :w]
        rev = rev_f[:, :w]
        invalid = inv_f[:, :w]

        choice_rev = ~(fwd < rev)
        values = jnp.where(choice_rev, rev, fwd)

        hlo, hhi = u64pair.murmur64_u64key(values, jnp.zeros_like(values),
                                           seed=42)
        selected = u64pair.lt(hlo, hhi, tlo, thi) & ~invalid

        values_ref[:, c:c + w] = values
        selected_ref[:, c:c + w] = selected
        dirs_ref[:, c:c + w] = choice_rev.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("l", "density", "block_rows"))
def sketch_batch_pallas(codes: jax.Array, lengths: jax.Array, l: int,
                        density: float, block_rows: int = 8):
    """Same contract as kernels.sketch.sketch_batch, Pallas-fused."""
    n, L = codes.shape
    nk = L - l + 1
    threshold = u64pair._exact_u64_threshold(density)
    grid = (pl.cdiv(n, block_rows),)

    kernel = functools.partial(_sketch_kernel, l=l, threshold=threshold)
    values, selected, dirs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, nk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, nk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, nk), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, nk), jnp.uint32),
            jax.ShapeDtypeStruct((n, nk), jnp.bool_),
            jax.ShapeDtypeStruct((n, nk), jnp.uint8),
        ],
    )(codes)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, nk), 1)
    trim = (pos >= 1) & (pos < (lengths.astype(jnp.int32)[:, None] - l))
    selected = selected & trim
    return {"values": values, "selected": selected, "directions": dirs}
