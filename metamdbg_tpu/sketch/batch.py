"""Batched (device) minimizer sketching for the production pipeline.

This drives kernels/sketch.py — the TPU twin of sketch/minimizers.py — over
padded, length-bucketed batches of reads, so the `asm` pipeline's hottest
scan (per-base canonical k-mer + MurmurHash3 threshold selection,
src/readSelection/ReadSelection.hpp:637-1372) runs on device instead of one
read at a time on host. Outputs are bit-identical to the host path
(tests/test_device_sketch.py, tests/test_parity_readselection.py).

Batching: reads are grouped by RLE length padded to the next power of two
(>= 256) and each bucket is padded to a fixed row count, so only a handful
of static shapes are ever compiled. Results are re-emitted in input order.
"""

import numpy as np

from ..constants import MINIMIZER_DTYPE

# target elements per device batch (rows * padded_len)
_TARGET_ELEMS = 1 << 22
_MIN_LEN = 256


def _pad_len(n: int) -> int:
    p = _MIN_LEN
    while p < n:
        p <<= 1
    return p


class BatchSketcher:
    """Sketches many reads at once on the default JAX device.

    Parameters mirror sketch/minimizers.select_minimizers; `repetitive` is a
    sorted u32 blacklist applied host-side after compaction (the selected
    set is ~density * bases, so the filter is cheap).
    """

    def __init__(self, l: int, density: float,
                 repetitive: np.ndarray | None = None):
        self.l = l
        self.density = float(density)
        self.repetitive = repetitive if repetitive is not None and \
            repetitive.size else None

    def sketch_many(self, codes_list, bad_list):
        """codes_list: list of u8 base-code arrays (RLE'd); bad_list: bool
        arrays marking non-ACGT bases. Returns a list of
        (minimizers u32, positions u32, directions u8), in input order."""
        from ..kernels import sketch as dsketch

        n = len(codes_list)
        out = [None] * n

        # bucket by padded length
        buckets: dict = {}
        for i, codes in enumerate(codes_list):
            buckets.setdefault(_pad_len(codes.shape[0]), []).append(i)

        for L, idxs in sorted(buckets.items()):
            rows = max(1, min(len(idxs), _TARGET_ELEMS // L))
            for s in range(0, len(idxs), rows):
                chunk = idxs[s: s + rows]
                cod = np.full((rows, L), 4, np.uint8)   # pad = bad base
                lens = np.zeros(rows, np.int32)
                for r, i in enumerate(chunk):
                    c = codes_list[i]
                    m = c.shape[0]
                    cod[r, :m] = np.where(bad_list[i], 4, c)
                    lens[r] = m
                res = dsketch.sketch_batch(cod, lens, self.l, self.density)
                values = np.asarray(res["values"])
                selected = np.asarray(res["selected"])
                directions = np.asarray(res["directions"])
                for r, i in enumerate(chunk):
                    pos = np.flatnonzero(selected[r])
                    vals = values[r, pos].astype(MINIMIZER_DTYPE)
                    dirs = directions[r, pos]
                    if self.repetitive is not None and vals.size:
                        j = np.searchsorted(self.repetitive, vals)
                        j = np.minimum(j, self.repetitive.size - 1)
                        keep = self.repetitive[j] != vals
                        vals, pos, dirs = vals[keep], pos[keep], dirs[keep]
                    out[i] = (vals, pos.astype(np.uint32), dirs)
        return out


def device_available() -> bool:
    """True when a JAX backend is importable (TPU or CPU). Unavailability
    is reported through the device-fallback policy (loud, or fatal under
    METAMDBG_TPU_REQUIRE_DEVICE)."""
    try:
        import jax  # noqa: F401
        return True
    except Exception as exc:
        from ..utils.devpolicy import device_fallback
        device_fallback("batch sketching", exc)
        return False
