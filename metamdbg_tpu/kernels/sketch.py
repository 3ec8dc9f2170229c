"""Device (TPU) batch sketching: reads -> minimizer masks, fully in JAX.

This is the device twin of sketch/{kmers,minimizers}.py: identical math
(bit-exact canonical k-mers and MurmurHash3 threshold selection) expressed
over padded batches of base codes, jit-compiled for TPU. 64-bit values are
(lo, hi) uint32 pairs throughout (utils/u64pair.py) so everything maps onto
the VPU without 64-bit integer emulation.

Layout: a batch is (codes u8[N, L], length i32[N]) with padding after each
read's length. All positions compute; masks make padding inert. The
selection mask + values + directions come back; compaction into per-read
minimizer lists happens host-side (cheap: ~density * bases elements).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import u64pair


def encode_reads(seqs: list, pad_to: int | None = None):
    """Host helper: ascii reads -> (codes u8[N, L], lengths i32[N])."""
    n = len(seqs)
    if pad_to is None:
        pad_to = max((len(s) for s in seqs), default=0)
    codes = np.zeros((n, pad_to), np.uint8)
    lengths = np.zeros(n, np.int32)
    for i, s in enumerate(seqs):
        b = np.frombuffer(s, np.uint8) if isinstance(s, (bytes, bytearray)) \
            else np.asarray(s, np.uint8)
        codes[i, :b.shape[0]] = (b >> 1) & 3
        # bad-char flag folded into code 4 (forces window invalid)
        bad = ((b >> 3) & 1).astype(bool)
        codes[i, :b.shape[0]][bad] = 4
        lengths[i] = b.shape[0]
    return codes, lengths


@functools.partial(jax.jit, static_argnames=("l", "density"))
def sketch_batch(codes: jax.Array, lengths: jax.Array, l: int, density: float):
    """Minimizer selection over a padded batch.

    codes: u8[N, L] base codes (0..3; >=4 marks bad/invalid bases)
    Returns dict of u32[N, L-l+1] canonical kmer values (truncated to u32,
    valid for l <= 16), bool select mask, u8 directions.
    """
    n, L = codes.shape
    nk = L - l + 1
    c = codes.astype(jnp.uint32)
    is_bad = c >= 4
    base = jnp.where(is_bad, 0, c)
    comp = base ^ 2  # A<->T C<->G in (ascii>>1)&3 encoding

    fwd = jnp.zeros((n, nk), jnp.uint32)
    rev = jnp.zeros((n, nk), jnp.uint32)
    invalid = jnp.zeros((n, nk), bool)
    for j in range(l):
        fwd = fwd | (base[:, j:j + nk] << (2 * (l - 1 - j)))
        rev = rev | (comp[:, j:j + nk] << (2 * j))
        invalid = invalid | is_bad[:, j:j + nk]

    choice_rev = ~(fwd < rev)                      # ties -> reverse
    values = jnp.where(choice_rev, rev, fwd)
    directions = choice_rev.astype(jnp.uint8)

    # murmur64(value zero-extended to u64, seed 42) < density threshold
    hlo, hhi = u64pair.murmur64_u64key(values, jnp.zeros_like(values), seed=42)
    selected = u64pair.minimizer_select_mask(hlo, hhi, density)

    pos = jax.lax.broadcasted_iota(jnp.int32, (n, nk), 1)
    in_read = pos < (lengths[:, None] - l + 1)
    trim = (pos >= 1) & (pos < (lengths[:, None] - l))   # _trimBps = 1
    selected = selected & ~invalid & in_read & trim

    return {"values": values, "selected": selected, "directions": directions}


def extract_minimizers(result, lengths) -> list:
    """Host-side compaction of a sketch_batch result into per-read arrays."""
    values = np.asarray(result["values"])
    selected = np.asarray(result["selected"])
    directions = np.asarray(result["directions"])
    out = []
    for i in range(values.shape[0]):
        pos = np.flatnonzero(selected[i])
        out.append((values[i, pos].astype(np.uint32), pos.astype(np.uint32),
                    directions[i, pos]))
    return out
