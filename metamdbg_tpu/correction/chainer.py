"""Minimizer-space anchor chaining with full edit transcript.

Mirrors MinimizerChainer::computeChainingAlignment
(src/readSelection/MinimizerChainer.hpp:114-705): anchors between one
reference read and one query read are chained with a banded DP
(w=20, caps d<=5000, gap<=100, band = maxChainingBand), and the best chain is
expanded into a match/mismatch/indel transcript over minimizer indexes,
then gap-normalized (MinimizerChainer.hpp:1015-1095).

The DP scores are float32 on purpose: the reference accumulates `float`
scores and the argmax must tie-break identically.
"""

import dataclasses
import os

import numpy as np

CHAIN_W = np.float32(20.0)          # MinimizerChainer.hpp:741
CHAIN_MAX_DIST = 5000               # MinimizerChainer.hpp:913
CHAIN_MAX_GAP = 100                 # MinimizerChainer.hpp:924


@dataclasses.dataclass
class AlignmentResult:
    """AlignmentResult2 (MinimizerChainer.hpp:7-72)."""
    is_query_reversed: bool = False
    chaining_score: float = 0.0
    nb_matches: int = 0
    nb_missmatches: int = 0
    nb_deletions: int = 0
    nb_insertions: int = 0
    identity: float = 0.0
    overhang_start: int = 0
    overhang_end: int = 0
    align_length: int = 0
    alignments: list = dataclasses.field(default_factory=list)
    reference_start: int = 0
    reference_end: int = 0
    query_start: int = 0
    query_end: int = 0
    reference_start_index: int = 0
    reference_end_index: int = 0


NONE = -1  # the reference uses (u_int32_t)-1 gap markers; we keep -1 ints


def chain_dp(ref_pos, query_pos, is_rev, max_band: int):
    """Banded chaining DP (MinimizerChainer.hpp:735-961 chainAnchors +
    argmaxPosition). Returns (scores f32, parents i64, best_index).

    Anchors must already be in the reference's post-sort order.

    Dispatches to the native C++ twin (native/sketch.cpp chain_corr_batch,
    bit-identical — tests/test_chain_kernel.py) when built; this numpy
    implementation is the oracle and the fallback. The per-pair Python DP
    was half the ONT correction stage's wall time.
    """
    n = ref_pos.shape[0]
    if n and not os.environ.get("METAMDBG_TPU_HOST_CHAIN"):
        from ..sketch import native_sketch
        r = native_sketch.chain_corr_single(
            ref_pos, query_pos, is_rev, max_band, float(CHAIN_W),
            CHAIN_MAX_DIST, CHAIN_MAX_GAP)
        if r is not None:
            return r
    scores = np.zeros(n, np.float32)
    parents = np.full(n, -1, np.int64)
    rp = ref_pos.astype(np.int64)
    qp = query_pos.astype(np.int64)
    for i in range(n):
        j0 = max(0, i - max_band)
        best_score = np.float32(0.0)
        best_prev = i
        if i > j0:
            rj = rp[j0:i]
            qj = qp[j0:i]
            d_r = rp[i] - rj
            d_q = np.where(is_rev[i], qj - qp[i], qp[i] - qj)
            gap = np.abs(d_r - d_q)
            ok = (is_rev[j0:i] == is_rev[i])
            ok &= (rj != rp[i]) & (qj != qp[i])
            ok &= (d_q <= CHAIN_MAX_DIST) & (d_r <= CHAIN_MAX_DIST)
            ok &= d_r > 0
            ok &= gap <= CHAIN_MAX_GAP
            if is_rev[i]:
                ok &= ~(qp[i] > qj)
            else:
                ok &= ~(qp[i] < qj)
            if ok.any():
                cand = scores[j0:i] + (CHAIN_W - gap.astype(np.float32))
                cand = np.where(ok, cand, np.float32(-np.inf))
                # reference scans j descending and takes strict >, so the
                # winner among ties is the LARGEST j
                rev = cand[::-1]
                k = int(np.argmax(rev))
                if rev[k] > np.float32(0.0):
                    best_score = rev[k]
                    best_prev = i - 1 - k
        if best_prev != i:
            scores[i] = best_score
            parents[i] = best_prev
        else:
            scores[i] = CHAIN_W
            parents[i] = -1

    best_index = -1
    max_score = np.float32(0.0)
    for i in range(n):  # strict >, first wins (hpp:810-817)
        if scores[i] > max_score:
            max_score = scores[i]
            best_index = i
    return scores, parents, best_index


def backtrack(parents, best_index):
    interval = []
    idx = best_index
    while idx != -1:
        interval.append(idx)
        idx = parents[idx]
    interval.reverse()
    return interval


def compute_chaining_alignment(anchors, reference, query, max_band: int,
                               minimizer_size: int,
                               need_alignments: bool = True) -> AlignmentResult:
    """anchors: (refPos, queryPos, isRev, refIdx, queryIdx) arrays in the
    reference's gather order (query index asc, ref positions asc).

    reference/query: objects with .minimizers, .positions, .read_length.

    need_alignments=False skips building + normalizing the per-position
    alignment list (filterAlignments only consumes the counts, overhangs
    and identity — the list was throwaway work for 2/3 of the calls);
    counts come from one vectorized pass over the chain interval, and
    `result.alignments` is set to True (a successful chain always yields a
    non-empty alignment: the final match pair is unconditionally appended
    and never erased by normalization).
    """
    result = AlignmentResult()
    ref_pos, query_pos, is_rev, ref_idx, query_idx = anchors
    n = ref_pos.shape[0]
    if n < 3:
        return result

    # std::sort by (referencePosition, queryPosition) (hpp:154-159); stable
    # lexsort on the gather order resolves ties the same way in practice
    order = np.lexsort((query_pos, ref_pos))
    ref_pos = ref_pos[order]
    query_pos = query_pos[order]
    is_rev = is_rev[order]
    ref_idx = ref_idx[order]
    query_idx = query_idx[order]

    scores, parents, best_index = chain_dp(ref_pos, query_pos, is_rev, max_band)
    if best_index < 0:
        return result
    interval = backtrack(parents, best_index)
    if len(interval) <= 3:  # hpp:268 (needs >= 4 anchors)
        return result
    max_score = scores[best_index]

    first = interval[0]
    last = interval[-1]
    f_ri, f_qi = int(ref_idx[first]), int(query_idx[first])
    l_ri, l_qi = int(ref_idx[last]), int(query_idx[last])
    is_query_reversed = f_qi > l_qi

    ref_mins = reference.minimizers
    q_mins = query.minimizers
    ref_mpos = reference.positions
    q_mpos = query.positions
    reference_length = int(reference.read_length)
    query_length = int(query.read_length)

    def _pos(arr, i):
        # the reference indexes vectors with possibly -1 (UB read); clamp to 0
        # which matches the common benign case and keeps us in bounds
        return int(arr[max(i, 0)])

    if is_query_reversed:
        overhang_start = min(_pos(ref_mpos, f_ri), query_length - _pos(q_mpos, f_qi - 1))
        nb_start_mm = min(f_ri, len(q_mins) - f_qi - 1)
    else:
        overhang_start = min(_pos(ref_mpos, f_ri), _pos(q_mpos, f_qi))
        nb_start_mm = min(f_ri, f_qi)

    if is_query_reversed:
        overhang_end = min(reference_length - _pos(ref_mpos, l_ri - 1), _pos(q_mpos, l_qi))
        nb_end_mm = min(len(ref_mins) - l_ri - 1, l_qi)
    else:
        overhang_end = min(reference_length - _pos(ref_mpos, l_ri - 1),
                           query_length - _pos(q_mpos, l_qi - 1))
        nb_end_mm = min(len(ref_mins) - l_ri - 1, len(q_mins) - l_qi - 1)

    if not need_alignments:
        # one vectorized pass over the chain interval; arithmetic kept raw
        # (no clamping) to mirror the loop's count accumulation exactly,
        # including the reference's negative-gap quirk
        iv = np.asarray(interval, np.int64)
        cur_v, nxt_v = iv[:-1], iv[1:]
        ref_gap_v = ref_idx[nxt_v] - ref_idx[cur_v] - 1
        if is_query_reversed:
            q_gap_v = query_idx[cur_v] - query_idx[nxt_v] - 1
        else:
            q_gap_v = query_idx[nxt_v] - query_idx[cur_v] - 1
        mm_v = np.minimum(ref_gap_v, q_gap_v)
        gt = ref_gap_v > q_gap_v
        nb_matches = len(interval)
        nb_missmatches = int(nb_start_mm + nb_end_mm + mm_v.sum())
        nb_deletions = int(np.where(gt, ref_gap_v - mm_v, 0).sum())
        nb_insertions = int(np.where(gt, 0, q_gap_v - mm_v).sum())
        align_start = int(ref_pos[iv[0]])
        align_end = int(ref_pos[iv[-1]])
        return _finish_result(result, nb_matches, nb_missmatches,
                              nb_deletions, nb_insertions, minimizer_size,
                              is_query_reversed, max_score, overhang_start,
                              overhang_end, align_start, align_end,
                              ref_pos, query_pos, first, last, f_ri, l_ri,
                              True)

    alignments = []
    nb_matches = 0
    nb_missmatches = 0
    nb_insertions = 0
    nb_deletions = 0
    qstep = -1 if is_query_reversed else 1

    rpos = f_ri - nb_start_mm
    qpos = f_qi + (nb_start_mm if is_query_reversed else -nb_start_mm)
    for _ in range(nb_start_mm):
        alignments.append((rpos, qpos))
        nb_missmatches += 1
        rpos += 1
        qpos += qstep

    align_start = -1
    align_end = -1
    for t in range(len(interval) - 1):
        cur = interval[t]
        nxt = interval[t + 1]
        ref_gap = int(ref_idx[nxt]) - int(ref_idx[cur]) - 1
        if is_query_reversed:
            q_gap = int(query_idx[cur]) - int(query_idx[nxt]) - 1
        else:
            q_gap = int(query_idx[nxt]) - int(query_idx[cur]) - 1
        mm = min(ref_gap, q_gap)
        ins = dele = 0
        if ref_gap > q_gap:
            dele = ref_gap - mm
        else:
            ins = q_gap - mm

        alignments.append((rpos, qpos))   # the match at cur
        rpos += 1
        qpos += qstep
        nb_matches += 1
        if align_start == -1:
            align_start = int(ref_pos[cur])
        align_end = int(ref_pos[nxt])

        nb_missmatches += mm
        nb_deletions += dele
        nb_insertions += ins
        for _ in range(mm):
            alignments.append((rpos, NONE))
            rpos += 1
        for _ in range(dele):
            alignments.append((rpos, NONE))
            rpos += 1
        for _ in range(mm):
            alignments.append((NONE, qpos))
            qpos += qstep
        for _ in range(ins):
            alignments.append((NONE, qpos))
            qpos += qstep

    alignments.append((rpos, qpos))       # final match
    rpos += 1
    qpos += qstep
    nb_matches += 1
    for _ in range(nb_end_mm):
        alignments.append((rpos, qpos))
        rpos += 1
        qpos += qstep
        nb_missmatches += 1

    return _finish_result(result, nb_matches, nb_missmatches, nb_deletions,
                          nb_insertions, minimizer_size, is_query_reversed,
                          max_score, overhang_start, overhang_end,
                          align_start, align_end, ref_pos, query_pos,
                          first, last, f_ri, l_ri,
                          normalize_alignment(alignments, ref_mins, q_mins))


def _finish_result(result, nb_matches, nb_missmatches, nb_deletions,
                   nb_insertions, minimizer_size, is_query_reversed,
                   max_score, overhang_start, overhang_end, align_start,
                   align_end, ref_pos, query_pos, first, last, f_ri, l_ri,
                   alignments):
    reference_size = nb_matches + nb_missmatches + nb_deletions
    query_size = nb_matches + nb_missmatches + nb_insertions
    nb_seeds = min(reference_size, query_size)
    if nb_matches == nb_seeds:
        divergence = 0.0
    elif nb_matches == 0:
        divergence = 1.0
    else:
        divergence = 1.0 - pow(nb_matches / nb_seeds, 1.0 / minimizer_size)

    result.is_query_reversed = bool(is_query_reversed)
    result.chaining_score = float(max_score)
    result.nb_matches = nb_matches
    result.nb_missmatches = nb_missmatches
    result.nb_deletions = nb_deletions
    result.nb_insertions = nb_insertions
    result.identity = float(np.float32(1.0 - divergence))
    result.overhang_start = int(overhang_start)
    result.overhang_end = int(overhang_end)
    result.align_length = (align_end - align_start) if align_start != -1 else 0
    result.reference_start = int(ref_pos[first])
    result.reference_end = int(ref_pos[last])
    result.reference_start_index = f_ri
    result.reference_end_index = l_ri
    if is_query_reversed:
        result.query_start = int(query_pos[last])
        result.query_end = int(query_pos[first])
    else:
        result.query_start = int(query_pos[first])
        result.query_end = int(query_pos[last])
    result.alignments = alignments
    return result


def normalize_alignment(alignments, ref_mins, q_mins):
    """Pull gap-adjacent equal minimizers into matches
    (MinimizerChainer.hpp:1015-1095). In-place list transformation with the
    reference's exact (index-skipping) erase semantics."""
    aln = list(alignments)
    i = 0
    while i < len(aln):
        r, q = aln[i]
        if r == NONE:
            j = _next_with_ref(aln, i)
            if j != -1:
                rp = aln[j][0]
                if ref_mins[rp] == q_mins[q]:
                    aln[i] = (rp, q)
                    aln[j] = (NONE, aln[j][1])
                if aln[j][0] == NONE and aln[j][1] == NONE:
                    del aln[j]
        elif q == NONE:
            j = _next_with_query(aln, i)
            if j != -1:
                qp = aln[j][1]
                if ref_mins[r] == q_mins[qp]:
                    aln[i] = (r, qp)
                    aln[j] = (aln[j][0], NONE)
                if aln[j][0] == NONE and aln[j][1] == NONE:
                    del aln[j]
        i += 1
    return aln


def _next_with_ref(aln, i):
    for j in range(i, len(aln)):
        if aln[j][0] != NONE:
            return j
    return -1


def _next_with_query(aln, i):
    for j in range(i, len(aln)):
        if aln[j][1] != NONE:
            return j
    return -1


def collect_anchors(reference, query):
    """Per-minimizer anchors of query vs a reference position map
    (ReadCorrection.hpp:5006-5069): for each query minimizer present in the
    reference, one anchor per reference occurrence, gathered in
    (query index asc, reference occurrence asc) order.

    Vectorized: a stable argsort of the reference minimizers plays the
    hash map — equal keys keep reference-index order, so the flattened
    (query-major) gather reproduces the dict-of-occurrence-lists order
    exactly (pinned by tests/test_chain_kernel.py)."""
    rm = np.asarray(reference.minimizers)
    qm = np.asarray(query.minimizers)
    if rm.shape[0] == 0 or qm.shape[0] == 0:
        z = np.zeros(0, np.int64)
        return z, z.copy(), np.zeros(0, bool), z.copy(), z.copy()
    order = np.argsort(rm, kind="stable").astype(np.int64)
    rm_s = rm[order]
    lo = np.searchsorted(rm_s, qm, side="left")
    hi = np.searchsorted(rm_s, qm, side="right")
    cnt = hi - lo
    tot = int(cnt.sum())
    if tot == 0:
        z = np.zeros(0, np.int64)
        return z, z.copy(), np.zeros(0, bool), z.copy(), z.copy()
    qsel = np.repeat(np.arange(qm.shape[0], dtype=np.int64), cnt)
    starts = np.cumsum(cnt) - cnt
    intra = np.arange(tot, dtype=np.int64) - np.repeat(starts, cnt)
    ridx = order[np.repeat(lo, cnt) + intra]
    ref_pos = np.asarray(reference.positions, np.int64)[ridx]
    query_pos = np.asarray(query.positions, np.int64)[qsel]
    is_rev = (np.asarray(reference.directions)[ridx].astype(bool)
              != np.asarray(query.directions)[qsel].astype(bool))
    return ref_pos, query_pos, is_rev, ridx, qsel
