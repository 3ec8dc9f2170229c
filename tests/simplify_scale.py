"""Synthetic FilterGraph generator + scale driver for the progressive
abundance filter (ProgressiveAbundanceFilter.hpp at metagenome scale).

Builds a deterministic random unitig graph with backbone chains, bubbles,
tips and low-abundance noise so the superbubble/tip/cutoff machinery all
fire; used by tests/test_simplify_scale.py and as a standalone A/B timing
driver: python tests/simplify_scale.py [n_segments] [out_dir]
"""

import os

import numpy as np

from metamdbg_tpu.graph.filter_graph import FilterGraph, FilterNode, rc
from metamdbg_tpu.graph.simplify import ProgressiveAbundanceFilter


def build_synthetic_filter_graph(n_segments: int = 5000, seed: int = 7,
                                 k: int = 4) -> FilterGraph:
    rng = np.random.default_rng(seed)
    g = FilterGraph(k=k, spacing_mean=20.0, kminmer_length=80.0)

    def new_node(mean_ab: float) -> int:
        name = len(g.unitigs)
        nbmin = int(rng.integers(k, 40))
        node = FilterNode(name, nbmin)
        n_ab = max(1, nbmin - k + 1)
        vals = np.maximum(1, rng.poisson(mean_ab, n_ab)).astype(np.uint32)
        node.abundances = np.sort(vals)
        node.abundance = node.compute_median()
        if node.abundance == 0:
            node.abundance = np.float32(1.0)
        g.unitigs.append(node)
        return name

    def add_edge(a: int, b: int):
        """Oriented edge a->b plus its reverse-complement mirror."""
        sa = g.unitigs[a // 2].succ_rev if a % 2 else g.unitigs[a // 2].succ_fwd
        if b not in sa:
            sa.append(b)
        rb = rc(b)
        sb = (g.unitigs[rb // 2].succ_rev if rb % 2
              else g.unitigs[rb // 2].succ_fwd)
        if rc(a) not in sb:
            sb.append(rc(a))

    prev = new_node(30.0)
    for _ in range(n_segments):
        r = rng.random()
        if r < 0.25:
            # bubble: branch -> {path_a, path_b} -> exit
            branch = new_node(30.0)
            add_edge(2 * prev, 2 * branch)
            exit_n = new_node(30.0)
            for mean in (28.0, 4.0):
                path_len = int(rng.integers(1, 3))
                cur = branch
                for _ in range(path_len):
                    mid = new_node(mean)
                    add_edge(2 * cur, 2 * mid)
                    cur = mid
                add_edge(2 * cur, 2 * exit_n)
            prev = exit_n
        elif r < 0.45:
            # tip hanging off the backbone
            nxt = new_node(30.0)
            add_edge(2 * prev, 2 * nxt)
            tip = new_node(2.0)
            add_edge(2 * prev, 2 * tip)
            prev = nxt
        elif r < 0.55:
            # low-abundance noise node bridging into the backbone
            nxt = new_node(30.0)
            add_edge(2 * prev, 2 * nxt)
            noise = new_node(1.5)
            add_edge(2 * noise, 2 * nxt)
            prev = nxt
        else:
            nxt = new_node(30.0)
            add_edge(2 * prev, 2 * nxt)
            prev = nxt

    for node in g.unitigs:
        node.succ_fwd.sort()
        node.succ_rev.sort()
    return g


def run_filter(g: FilterGraph, out_dir: str) -> ProgressiveAbundanceFilter:
    os.makedirs(os.path.join(out_dir, "filter"), exist_ok=True)
    f = ProgressiveAbundanceFilter(g, out_dir)
    f.execute()
    return f


if __name__ == "__main__":
    import hashlib
    import sys
    import time

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/simplify_scale"
    g = build_synthetic_filter_graph(n)
    n_unitigs = len(g.unitigs)
    t0 = time.perf_counter()
    f = run_filter(g, out)
    dt = time.perf_counter() - t0
    h = hashlib.sha256()
    for i in range(f.cutoff_index):
        with open(os.path.join(out, "filter", f"unitigs_{i}.bin"), "rb") as fh:
            h.update(fh.read())
    print(f"unitigs={n_unitigs} cutoffs={f.cutoff_index} "
          f"wall={dt:.2f}s sha256={h.hexdigest()[:16]}")
