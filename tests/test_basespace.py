"""Unit tests for the rebuilt base-space subsystem: native POA engine,
anchor-overlap engine, tiling validity rules, and the polisher's window
machinery."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

import datagen
from metamdbg_tpu.basespace import overlap, poa_native, polisher, tiling


def _noisy(rng, seq, sub=0.0, ins=0.0, dele=0.0):
    return datagen.mutate(seq.copy(), rng, sub, ins, dele)


# -- native POA ----------------------------------------------------------------

def test_poa_consensus_corrects_all_error_types():
    rng = np.random.default_rng(0)
    backbone = datagen.random_genome(500, seed=3).tobytes()
    truth = backbone
    # noisy backbone, clean-ish fragments: consensus must recover truth
    frags = []
    for i in range(10):
        f = _noisy(rng, np.frombuffer(truth, np.uint8), 0.01, 0.005, 0.005)
        frags.append((f.tobytes(), None, 0, 499))
    noisy_bb = _noisy(rng, np.frombuffer(truth, np.uint8),
                      0.02, 0.01, 0.01).tobytes()
    (cons, cov), = poa_native.polish_windows([(noisy_bb, frags)], n_threads=1)
    trimmed = polisher.trim_consensus(cons, cov, len(frags),
                                      is_last_window=False)
    assert trimmed in truth
    assert len(trimmed) >= 490


def test_poa_quality_weighting():
    bb = b"ACGTACGTTTGACCA"
    low = (b"ACGTACTTTTGACCA", b"#" * 15)   # qual 2
    high = (b"ACGTACGTTTGACCA", b"I" * 15)  # qual 40
    (cons, _), = poa_native.polish_windows(
        [(bb, [(low[0], low[1], 0, 14), (low[0], low[1], 0, 14),
               (high[0], high[1], 0, 14)])], n_threads=1)
    # one high-quality vote (40) outweighs two low-quality votes (2+2)
    assert cons == b"ACGTACGTTTGACCA"


def test_poa_subgraph_partial_fragment():
    bb = datagen.random_genome(500, seed=7).tobytes()
    mut = bytearray(bb)
    mut[100] = ord("A") if mut[100] != ord("A") else ord("C")
    frags = [(bytes(mut[50:300]), None, 50, 299) for _ in range(5)]
    (cons, _), = poa_native.polish_windows([(bb, frags)], n_threads=1)
    assert cons[100:101] == bytes(mut[100:101])
    assert len(cons) >= 240  # coverage region survives


# -- overlap engine ------------------------------------------------------------

def test_overlap_pair_bounds_and_identity():
    rng = np.random.default_rng(5)
    g = datagen.random_genome(30000, seed=5)
    r1 = _noisy(rng, g[:12000], 0.01, 0.005, 0.005)
    r2 = _noisy(rng, g[8000:20000], 0.01, 0.005, 0.005)
    b = overlap.overlap_pair(overlap.sketch(r1), r1.shape[0],
                             overlap.sketch(r2), r2.shape[0])[0]
    assert not b.is_reversed
    assert abs(b.ref_start - 8000) < 150 and b.ref_end > 11800
    assert b.query_start < 150 and abs(b.query_end - 4000) < 200
    assert 0.90 < b.identity <= 1.0


def test_overlap_junction_anchor_exact():
    """The chain's terminal anchor is an exact 15-mer on both sequences —
    the seam the stitcher cuts at."""
    rng = np.random.default_rng(6)
    g = datagen.random_genome(20000, seed=6)
    r1 = _noisy(rng, g[:12000], 0.01)
    r2 = _noisy(rng, g[7000:], 0.01)
    b = overlap.overlap_pair(overlap.sketch(r1), r1.shape[0],
                             overlap.sketch(r2), r2.shape[0])[0]
    assert bytes(r1[b.ref_end - 15:b.ref_end]) == \
        bytes(r2[b.query_end - 15:b.query_end])


def test_is_valid_overlap_alignment_rules():
    def bounds(qs, qe, rs, re, ql, rl, rev=False):
        return overlap.Bounds(qs, qe, rs, re, ql, rl, rev, 1000, 0.99)
    # proper dovetail: read1 suffix overlaps read2 prefix
    assert tiling.is_valid_overlap_alignment(
        bounds(10, 4000, 6000, 9990, 10000, 10000), True)
    # reversed rejected
    assert not tiling.is_valid_overlap_alignment(
        bounds(10, 4000, 6000, 9990, 10000, 10000, rev=True), True)
    # contained query rejected
    assert not tiling.is_valid_overlap_alignment(
        bounds(50, 3950, 5000, 9000, 4000, 10000), True)
    # huge hang rejected with maxhang check, accepted without
    b = bounds(600, 4000, 6000, 9400, 10000, 10000)
    assert not tiling.is_valid_overlap_alignment(b, True)
    assert tiling.is_valid_overlap_alignment(b, False)
    # short overlap rejected
    assert not tiling.is_valid_overlap_alignment(
        bounds(10, 300, 9700, 9990, 10000, 10000), True)


def test_subsample_mapped_reads_caps_depth():
    als = [tiling.Mapping((i, 0, 0, 100, 10, 90, 0, 50 + i, 0, 100, 100))
           for i in range(40)]
    als.sort(key=lambda a: (a.contig_start, a.contig_end, a.read_index))
    selected = tiling.subsample_mapped_reads(0, als, 10)
    assert 10 <= len(selected) <= 12


def test_chimeric_detection():
    cov = np.ones(1000, np.int64) * 20
    cov[400:700] = 0
    cov_map = np.ones(1000, np.int64)
    assert tiling.is_chimeric(cov, cov_map, 30.0, 10)
    assert not tiling.is_chimeric(np.ones(1000, np.int64) * 20, cov_map,
                                  30.0, 10)


# -- polisher window machinery -------------------------------------------------

def test_find_breaking_points_exact_boundaries():
    g = datagen.random_genome(2000, seed=9)
    read = g[200:1700].copy()
    s = overlap.sketch(read)
    idx = overlap.SeqIndex()
    idx.add(0, g)
    idx.build()
    b = overlap.map_sketched(idx, *s, read.shape[0], min_span=500)[0]
    al = polisher.Alignment(0, 7, b.query_start, b.query_end, b.ref_start,
                            b.ref_end, 1.0, read.shape[0], g.shape[0],
                            b.anchors)
    frags = list(polisher.find_breaking_points(al, read, None, g))
    assert frags
    for (wid, ps, pe, frag, _) in frags[1:-1]:
        # interior fragments span their whole window exactly
        assert ps == 0 and pe == 499
        assert frag == g[wid * 500:(wid + 1) * 500].tobytes()


def test_index_window_eviction():
    full = datagen.random_genome(500, seed=1).tobytes()
    short = full[:300]
    windows = []
    for i in range(polisher.MAX_WINDOW_COPIES - 1):
        windows.append(polisher.Window(full, None, 0, 499, 0.95))
    polisher.index_window(windows, polisher.Window(short, None, 0, 299, 0.99))
    assert len(windows) == polisher.MAX_WINDOW_COPIES - 1
    # a full-length window evicts the incomplete one
    polisher.index_window(windows, polisher.Window(full, None, 0, 499, 0.97))
    assert all(len(w.seq) == 500 for w in windows)


def test_trim_consensus_keeps_covered_core():
    seq = b"A" * 500
    cov = np.full(500, 20, np.uint32)
    cov[:5] = 1
    cov[-3:] = 1
    out = polisher.trim_consensus(seq, cov, 20, is_last_window=False)
    assert out == b"A" * 492


def test_native_chain_matches_python():
    """native chain_batch must reproduce contig_mapper._chain exactly."""
    from metamdbg_tpu.basespace import contig_mapper as cm
    from metamdbg_tpu.sketch import native_sketch
    assert native_sketch.available()
    rng = np.random.default_rng(9)
    groups, expected = [], []
    avg_dist = 200.0
    for _ in range(200):
        n = int(rng.integers(2, 120))
        ref = np.sort(rng.integers(0, 400, n)).astype(np.int64)
        q = rng.integers(0, 300, n).astype(np.int64)
        rev = rng.random(n) < 0.3
        pos_bp = np.sort(rng.integers(0, 60000, 301)).astype(np.int64)
        order = np.lexsort((q, ref))
        ref, q, rev = ref[order], q[order], rev[order]
        chained = cm._chain((ref, q, rev), pos_bp, avg_dist)
        expected.append(chained[1] if chained else None)
        groups.append((ref, q, pos_bp[q], rev))
    best_idx, parents = native_sketch.chain_batch_native(
        groups, avg_dist, cm.CHAIN_BAND, float(cm.CHAIN_W), 100, 5000)
    for gi in range(len(groups)):
        b = int(best_idx[gi])
        interval = None
        if b >= 0:
            interval = []
            idx = b
            while idx != -1:
                interval.append(idx)
                idx = int(parents[gi][idx])
            interval.reverse()
            if len(interval) < 2:
                interval = None
        assert interval == expected[gi], gi


def test_find_breaking_points_vs_exact_nw_indel_rich():
    """Window cuts from the anchor-walk engine vs exact edit-distance
    traceback (the edlib role, ContigPolisher.hpp:1514-1795) on an
    indel-rich fragment (1% ins + 1% del + 2% subs): every interior
    window's read-position boundaries must land within a few bases of the
    exact-alignment crossing points (VERDICT r2 weak #4)."""
    rng = np.random.default_rng(23)
    g = datagen.random_genome(3000, seed=24)
    # mutate g[200:2700] into a read: 1% del, 1% ins, 2% subs
    src = g[200:2700]
    alpha = np.frombuffer(b"ACGT", np.uint8)
    read = []
    for b in src:
        r = rng.random()
        if r < 0.01:
            continue
        if r < 0.02:
            read.append(alpha[rng.integers(0, 4)])
            read.append(b)
        elif r < 0.04:
            read.append(alpha[(np.where(alpha == b)[0][0] + 1) % 4])
        else:
            read.append(b)
    read = np.asarray(read, np.uint8)

    s = overlap.sketch(read)
    idx = overlap.SeqIndex()
    idx.add(0, g)
    idx.build()
    hits = overlap.map_sketched(idx, *s, read.shape[0], min_span=500)
    assert hits
    b0 = hits[0]
    al = polisher.Alignment(0, 7, b0.query_start, b0.query_end, b0.ref_start,
                            b0.ref_end, 0.96, read.shape[0], g.shape[0],
                            b0.anchors)
    frags = list(polisher.find_breaking_points(al, read, None, g))
    assert len(frags) >= 3

    # exact edit-distance alignment of read[q0:q1] vs contig[t0:t1]
    q0, q1 = al.read_start, al.read_end
    t0, t1 = al.contig_start, al.contig_end
    a = read[q0:q1]
    bb = g[t0:t1]
    n, m = a.shape[0], bb.shape[0]
    dp = np.zeros((n + 1, m + 1), np.int32)
    dp[0] = np.arange(m + 1)
    dp[:, 0] = np.arange(n + 1)
    for i in range(1, n + 1):
        sub = (a[i - 1] != bb).astype(np.int32)
        row = dp[i]
        prev = dp[i - 1]
        row[1:] = np.minimum(prev[:-1] + sub, prev[1:] + 1)
        # left-gap closure (sequential; small m)
        for j in range(1, m + 1):
            if row[j - 1] + 1 < row[j]:
                row[j] = row[j - 1] + 1
    # traceback: read position matched at each contig position
    t_to_q = np.full(m + 1, -1, np.int64)
    i, j = n, m
    while i > 0 and j > 0:
        if dp[i, j] == dp[i - 1, j - 1] + (1 if a[i - 1] != bb[j - 1] else 0):
            t_to_q[j] = i - 1
            i, j = i - 1, j - 1
        elif dp[i, j] == dp[i - 1, j] + 1:
            i -= 1
        else:
            j -= 1

    checked = 0
    for (wid, ps, pe, frag, _q) in frags[1:-1]:
        w_start_abs = wid * 500
        w_end_abs = w_start_abs + 499
        # exact read positions of the window edges
        j_lo, j_hi = w_start_abs - t0, w_end_abs - t0
        if 0 < j_lo <= m and t_to_q[j_lo] >= 0 and \
                0 < j_hi <= m and t_to_q[j_hi] >= 0:
            exact_len = t_to_q[j_hi] - t_to_q[j_lo] + 1
            assert abs(len(frag) - exact_len) <= 12, (wid, len(frag),
                                                      exact_len)
            checked += 1
    assert checked >= 2
