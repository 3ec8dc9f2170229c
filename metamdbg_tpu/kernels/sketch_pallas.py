"""Pallas TPU kernel for batch minimizer sketching.

The Pallas twin of kernels/sketch.py:sketch_batch (rolling canonical
l-mers + bit-exact MurmurHash3 threshold selection, reference semantics
from src/Commons.hpp:1325-1446 / MurmurHash3.cpp:246-322): one fused VMEM
kernel per row block instead of XLA's fusion choices.

Formulation notes (round-1/round-3 Mosaic findings, all probed on v5e):
- accumulating the l-mer integer via overlapping unaligned column slices
  (``base[:, j:j+nk] << shift``) MISCOMPILES at l=15 on current Mosaic —
  contributions from some offsets are silently dropped (bits 18-21 zeroed
  at l=15 while an l=4 probe passes);
- ``pltpu.roll`` on a *bool* plane crashes the remote compile helper
  (HTTP 500); rolling the raw u32 code plane once per tap and deriving
  bad/base/comp per tap compiles and is bit-exact — that is this kernel;
- a log-doubling build (F_{a+b}[t] = F_a[t] << 2b | F_b[t+a], 6 rolls
  instead of 14) is also bit-exact but no faster (2.96 vs 2.88 Gbases/s):
  the kernel is VPU-op bound, not roll bound.

Measured (v5e, 256x16384 u8 batch, l=15, density 0.005, block_rows=8):
2.83-2.88 Gbases/s, bit-identical to kernels/sketch.py:sketch_batch.
The XLA-fused kernel does 3.4-3.5 Gbases/s on the same shapes, so it
REMAINS the production sketcher; this kernel is kept as the measured
Pallas alternative (and the documented Mosaic ceiling), pinned by
tests/test_device_sketch.py::test_pallas_matches_xla (interpret mode on
the CPU CI mesh; compiled on TPU).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import u64pair


def _sketch_kernel(codes_ref, values_ref, selected_ref, dirs_ref,
                   *, l, threshold):
    rows, L = codes_ref.shape
    nk = L - l + 1
    tlo, thi = u64pair.split(threshold)

    c = codes_ref[...].astype(jnp.uint32)

    # full-width accumulate over ONE lane-rolled u32 plane; column t of the
    # j-th rolled plane holds code[t + j]. bad/base/comp are derived per
    # tap: pltpu.roll on a bool plane crashes the Mosaic compile helper
    # (probed), and one u32 roll per tap is cheaper than three anyway.
    fwd = jnp.zeros((rows, L), jnp.uint32)
    rev = jnp.zeros((rows, L), jnp.uint32)
    invalid = jnp.zeros((rows, L), jnp.bool_)
    c_plane = c
    for j in range(l):
        bad_j = c_plane >= 4
        base_j = jnp.where(bad_j, 0, c_plane)
        comp_j = base_j ^ 2  # A<->T C<->G in (ascii>>1)&3 encoding
        fwd = fwd | (base_j << (2 * (l - 1 - j)))
        rev = rev | (comp_j << (2 * j))
        invalid = invalid | bad_j
        if j + 1 < l:
            c_plane = pltpu.roll(c_plane, L - 1, 1)

    choice_rev = ~(fwd < rev)
    values = jnp.where(choice_rev, rev, fwd)

    hlo, hhi = u64pair.murmur64_u64key(values, jnp.zeros_like(values),
                                       seed=42)
    selected = u64pair.lt(hlo, hhi, tlo, thi) & ~invalid

    values_ref[...] = values[:, :nk]
    selected_ref[...] = selected[:, :nk]
    dirs_ref[...] = choice_rev[:, :nk].astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("l", "density", "block_rows",
                                    "interpret"))
def sketch_batch_pallas(codes: jax.Array, lengths: jax.Array, l: int,
                        density: float, block_rows: int = 8,
                        interpret: bool = False):
    """Same contract as kernels.sketch.sketch_batch, Pallas-fused.

    interpret=True runs the Pallas interpreter (CPU CI parity testing)."""
    n, L = codes.shape
    nk = L - l + 1
    threshold = u64pair._exact_u64_threshold(density)
    grid = (pl.cdiv(n, block_rows),)

    kernel = functools.partial(_sketch_kernel, l=l, threshold=threshold)
    values, selected, dirs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
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
