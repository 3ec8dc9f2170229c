"""Draft-contig polishing by hierarchical minimizer-anchored segment voting.

The role of ContigPolisher (src/toBasespace/ContigPolisher.hpp: racon-style
windowed POA with minimap2+edlib+spoa) re-expressed around the method's own
primitive: minimizers are exact (RLE-space) 15-mer matches between the draft
and every read, so the draft decomposes into inter-anchor segments whose
true sequence can be taken by majority vote over all reads spanning the
anchor pair. Reads with an error inside an anchor simply don't vote there —
the same quality-weighting effect as the reference's POA windows.

Two levels:
1. segments between assembly-density anchors (~250 bp) voted as whole
   strings — unambiguous when segments are short;
2. segments without a clear majority (long segments where every read copy
   carries an error) are re-voted internally with high-density anchors
   (superset of the assembly minimizers, same hash function), confining
   each read's contribution to the level-1 anchor pair it matched.

Ties prefer the draft's own segment, then the lexicographically smallest
(deterministic). A Pallas banded-alignment consensus kernel is the planned
upgrade for the remaining error classes (errors inside anchor 15-mers).
"""

import numpy as np

from .reconstruct import _read_sketch, _revcomp

FINE_DENSITY = 0.05


def polish_contig(draft: np.ndarray, read_alignments, read_seqs, l: int,
                  density: float, use_hpc: bool, repetitive=None,
                  max_votes: int = 50):
    """draft: uint8 bases; read_alignments: ReadMapping2 tuples for this
    contig; read_seqs: readIndex -> uint8 bases. Returns polished bases."""
    vals, pos = _read_sketch(draft, l, density, use_hpc, repetitive)
    k = vals.shape[0]
    if k < 2:
        return draft

    segment_votes: list = [dict() for _ in range(k - 1)]
    last_span_votes: dict = {}

    draft_vals = vals.tolist()
    draft_pos = pos.tolist()

    n_votes = 0
    for al in read_alignments:
        if n_votes >= max_votes * k:
            break
        read_idx, is_rev = al[0], bool(al[6])
        seq = read_seqs.get(read_idx)
        if seq is None:
            continue
        if is_rev:
            seq = _revcomp(seq)
        rvals, rpos = _read_sketch(seq, l, density, use_hpc, repetitive)
        r_map: dict = {}
        for v, p in zip(rvals.tolist(), rpos.tolist()):
            r_map.setdefault(v, []).append(p)

        # restrict to the aligned anchor range (alignment coords are pair
        # indices of the minimizer-space contig ~= draft anchor indices)
        lo = max(0, al[4] - 5)
        hi = min(k - 1, al[5] + 5)
        for i in range(lo, hi):
            ps1 = r_map.get(draft_vals[i])
            ps2 = r_map.get(draft_vals[i + 1])
            if not ps1 or not ps2:
                continue
            expected = draft_pos[i + 1] - draft_pos[i]
            best = None
            for p1 in ps1:
                for p2 in ps2:
                    if p2 <= p1:
                        continue
                    dev = abs((p2 - p1) - expected)
                    if best is None or dev < best[0]:
                        best = (dev, p1, p2)
            if best is None or best[0] > max(50, expected // 2):
                continue
            seg = bytes(seq[best[1]:best[2]])
            segment_votes[i][seg] = segment_votes[i].get(seg, 0) + 1
            n_votes += 1
        if hi >= k - 1:
            ps = r_map.get(draft_vals[k - 1])
            if ps:
                seg = bytes(seq[ps[0]:ps[0] + l])
                if len(seg) == l:
                    last_span_votes[seg] = last_span_votes.get(seg, 0) + 1

    # assemble polished sequence
    pieces = [bytes(draft[:draft_pos[0]])]
    for i in range(k - 1):
        draft_seg = bytes(draft[draft_pos[i]:draft_pos[i + 1]])
        pieces.append(_consensus_segment(segment_votes[i], draft_seg, l,
                                         use_hpc, repetitive))
    draft_last = bytes(draft[draft_pos[-1]:draft_pos[-1] + l])
    pieces.append(_majority(last_span_votes, draft_last))
    pieces.append(bytes(draft[draft_pos[-1] + l:]))
    return np.frombuffer(b"".join(pieces), np.uint8)


def _majority(votes: dict, draft_seg: bytes) -> bytes:
    if not votes:
        return draft_seg
    best_count = max(votes.values())
    candidates = [s for s, c in votes.items() if c == best_count]
    if draft_seg in candidates:
        return draft_seg
    return min(candidates)


def _consensus_segment(votes: dict, draft_seg: bytes, l: int, use_hpc: bool,
                       repetitive) -> bytes:
    if not votes:
        return draft_seg
    total = sum(votes.values())
    best_count = max(votes.values())
    if best_count * 2 > total or total < 3:
        return _majority(votes, draft_seg)
    # weak majority (long segment: every copy differs) -> fine-grained vote
    return _vote_segment_fine(draft_seg, votes, l, use_hpc, repetitive)


def _vote_segment_fine(draft_seg: bytes, votes: dict, l: int, use_hpc: bool,
                       repetitive) -> bytes:
    """Consensus of the voted copies using anchors supported by a majority of
    the copies themselves (the erroneous draft only breaks ties)."""
    copies = []   # (value -> single position map, bytes, weight)
    total_weight = 0
    for seg_bytes, count in votes.items():
        seq = np.frombuffer(seg_bytes, np.uint8)
        rvals, rpos = _read_sketch(seq, l, FINE_DENSITY, use_hpc, repetitive)
        occur: dict = {}
        for v, p in zip(rvals.tolist(), rpos.tolist()):
            occur.setdefault(v, []).append(p)
        vmap = {v: ps[0] for v, ps in occur.items() if len(ps) == 1}
        copies.append((vmap, seg_bytes, count))
        total_weight += count

    # consensus anchors: unique values present in > half the copies
    support: dict = {}
    pos_sum: dict = {}
    for vmap, _, w in copies:
        for v, p in vmap.items():
            support[v] = support.get(v, 0) + w
            pos_sum[v] = pos_sum.get(v, 0) + p * w
    anchors = [(pos_sum[v] / support[v], v) for v, s in support.items()
               if s * 2 > total_weight]
    anchors.sort()
    # enforce increasing with minimal spacing
    sel = []
    for mp, v in anchors:
        if not sel or mp - sel[-1][0] >= 5:
            sel.append((mp, v))
    if len(sel) < 2:
        return _majority(votes, draft_seg)
    anchor_vals = [v for _, v in sel]

    # vote head, inter-anchor subsegments, tail
    head_votes: dict = {}
    tail_votes: dict = {}
    sub_votes = [dict() for _ in range(len(anchor_vals) - 1)]
    for vmap, seg_bytes, w in copies:
        if anchor_vals[0] in vmap:
            head = seg_bytes[:vmap[anchor_vals[0]]]
            head_votes[head] = head_votes.get(head, 0) + w
        if anchor_vals[-1] in vmap:
            tail = seg_bytes[vmap[anchor_vals[-1]]:]
            tail_votes[tail] = tail_votes.get(tail, 0) + w
        for i in range(len(anchor_vals) - 1):
            v1, v2 = anchor_vals[i], anchor_vals[i + 1]
            if v1 in vmap and v2 in vmap and vmap[v2] > vmap[v1]:
                sub = seg_bytes[vmap[v1]:vmap[v2]]
                sub_votes[i][sub] = sub_votes[i].get(sub, 0) + w

    pieces = [_majority(head_votes, b"")]
    for i in range(len(anchor_vals) - 1):
        pieces.append(_majority(sub_votes[i], b""))
    pieces.append(_majority(tail_votes, b""))
    out = b"".join(pieces)
    return out if out else _majority(votes, draft_seg)
