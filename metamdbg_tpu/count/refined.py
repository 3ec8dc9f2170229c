"""Refined abundances for the k -> k+1 re-count (second multi-k pass).

Mirrors CreateMdbg::loadRefinedAbundances (src/graph/CreateMdbg.cpp:3401-3709)
and KminmerCounter::getRefinedAbundance (src/graph/CreateMdbg.hpp:3933-4005):

- start from the previous pass's solid abundances (hash128 -> count,
  abundance 1 entries skipped);
- per previous unitig with a refined (contig-level) abundance: all its
  constituent prev-k k-min-mers get the refined value (or 0 when refined==1,
  which marks them weak);
- a new (k+1)-min-mer's abundance = min over its constituent prev-k
  k-min-mers; any miss or 0 constituent -> 1 (-> dropped as non-solid).
"""

import numpy as np

from ..count.kminmers import normalize_rows
from ..utils.hashing import murmur128_u32rows


class RefinedAbundanceIndex:
    """hash128 -> abundance lookup backed by sorted arrays."""

    def __init__(self, keys: np.ndarray, values: np.ndarray):
        order = np.lexsort((keys[:, 1], keys[:, 0]))
        self.keys = keys[order]
        self.values = values[order]

    @classmethod
    def build(cls, prev_abundance_keys, prev_abundance_counts,
              prev_unitig_nodes, refined_abundances: dict, k_prev: int):
        """prev_abundance_*: from kminmerData_abundance_prev.txt;
        prev_unitig_nodes: list of (seq, unitigIndex) from
        unitigGraph_prev.nodes.bin; refined_abundances: unitigName -> u32."""
        table: dict = {}
        for key, cnt in zip(map(tuple, prev_abundance_keys.tolist()),
                            prev_abundance_counts.tolist()):
            if cnt == 1:
                continue
            table[key] = cnt
        for seq, idx in prev_unitig_nodes:
            name = idx // 2
            if name not in refined_abundances:
                continue
            ab = refined_abundances[name]
            wins = np.lib.stride_tricks.sliding_window_view(
                np.asarray(seq, np.uint32), k_prev)
            norm, _ = normalize_rows(wins)
            h1, h2 = murmur128_u32rows(norm)
            for key in zip(h1.tolist(), h2.tolist()):
                if ab == 1:
                    if key in table:       # modify_if: only existing entries
                        table[key] = 0
                else:
                    table[key] = ab
        if not table:
            return cls(np.zeros((0, 2), np.uint64), np.zeros(0, np.uint32))
        keys = np.array(list(table.keys()), dtype=np.uint64)
        values = np.array(list(table.values()), dtype=np.uint32)
        return cls(keys, values)

    def lookup(self, keys: np.ndarray):
        """Returns (values, found) for (N,2) u64 query keys.

        Vectorized two-level search: length-1 first-key runs (everything
        but 128-bit hash collisions) resolve with one compare; longer runs
        keep the scan. The per-key Python loop here was the k5 refined
        re-count's dominant cost at metagenome scale."""
        n_q = keys.shape[0]
        if self.keys.shape[0] == 0 or n_q == 0:
            return np.zeros(n_q, np.uint32), np.zeros(n_q, bool)
        k0 = self.keys[:, 0]
        k1 = self.keys[:, 1]
        lo = np.searchsorted(k0, keys[:, 0], side="left")
        hi = np.searchsorted(k0, keys[:, 0], side="right")
        out = np.zeros(n_q, np.uint32)
        found = np.zeros(n_q, bool)
        seg1 = hi - lo == 1
        if seg1.any():
            i1 = np.flatnonzero(seg1)
            ok = k1[lo[i1]] == keys[i1, 1]
            sel = i1[ok]
            out[sel] = self.values[lo[i1][ok]]
            found[sel] = True
        for i in np.flatnonzero(hi - lo > 1).tolist():
            for j in range(lo[i], hi[i]):
                if k1[j] == keys[i, 1]:
                    out[i] = self.values[j]
                    found[i] = True
                    break
        return out, found

    def refined_abundance_rows(self, rows: np.ndarray, k_prev: int):
        """getRefinedAbundance for each (N, k) row: min over constituent
        prev-k normalized windows; miss or 0 -> 1."""
        n, k = rows.shape
        nw = k - k_prev + 1
        # all windows of all rows at once
        wins = np.lib.stride_tricks.sliding_window_view(rows, (1, k_prev))
        wins = wins.reshape(n * nw, k_prev)
        norm, _ = normalize_rows(wins)
        h1, h2 = murmur128_u32rows(norm)
        keys = np.stack([h1, h2], axis=1)
        vals, found = self.lookup(keys)
        vals = vals.reshape(n, nw)
        found = found.reshape(n, nw)
        bad = (~found) | (vals == 0)
        # exact semantics: if any constituent missing or 0 -> 1
        vals_masked = np.where(bad, np.uint32(0xFFFFFFFF), vals)
        result = vals_masked.min(axis=1)
        result = np.where(bad.any(axis=1), np.uint32(1), result)
        return result
