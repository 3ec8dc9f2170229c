"""Draft-contig polishing: anchor coordinate maps + windowed pileup consensus.

Plays the role of ContigPolisher (src/toBasespace/ContigPolisher.hpp): the
draft is split into 500 bp windows; each mapped read contributes one
fragment per window, cut by a piecewise-linear draft->read coordinate map
built from shared fine-density minimizer anchors; fragments are consensus'd
by the batched banded-alignment pileup in consensus.py (the spoa/edlib
replacement). Window coverage doubles as the honest per-contig coverage
estimate reported in contig headers.
"""

import os

import numpy as np

from .consensus import MAX_FRAGS, WINDOW, window_consensus
from .reconstruct import _read_sketch, _revcomp

FINE_DENSITY = 0.05
MARGIN = 12
DEVICE_FRAG_LEN = 640   # fixed device bucket (fragment pad length)

# the device consensus path is the default (the host numpy DP is ~20x
# slower); METAMDBG_DEVICE_CONSENSUS=0 forces the host path
_DEVICE_STATE: dict = {}


def _device_enabled() -> bool:
    if "on" not in _DEVICE_STATE:
        _DEVICE_STATE["on"] = \
            os.environ.get("METAMDBG_DEVICE_CONSENSUS", "1") != "0"
    return _DEVICE_STATE["on"]


def _device_vote_windows(draft, frags, offsets, n_windows):
    """Batch ALL full-size windows' fragments into one device align+vote
    call (kernels/consensus_jax.py) — only the tiny vote tables and sparse
    insertion events leave the device. The ragged tail window falls back to
    the host path. Returns {window: (votes (LB,5), ins per-col dicts)}."""
    from .consensus import _CODE
    from ..kernels.consensus_jax import vote_fragments_device

    n = draft.shape[0]
    rows = []
    for w in range(n_windows):
        w0, w1 = w * WINDOW, min((w + 1) * WINDOW, n)
        if w1 - w0 != WINDOW:
            continue  # host path handles the tail window
        for (f, o) in zip(frags[w], offsets[w]):
            rows.append((w, f[:DEVICE_FRAG_LEN], o))
    if not rows:
        return {}
    N = len(rows)
    codes = np.full((N, DEVICE_FRAG_LEN), 4, np.uint8)
    lens = np.zeros(N, np.int64)
    offs = np.zeros(N, np.int64)
    wins = np.zeros(N, np.int64)
    win_ids = sorted(set(r[0] for r in rows))
    win_pos = {w: i for i, w in enumerate(win_ids)}
    backbones = np.zeros((len(win_ids), WINDOW), np.uint8)
    for w in win_ids:
        backbones[win_pos[w]] = _CODE[draft[w * WINDOW:(w + 1) * WINDOW]]
    for i, (w, f, o) in enumerate(rows):
        codes[i, :f.shape[0]] = _CODE[f]
        lens[i] = f.shape[0]
        offs[i] = o
        wins[i] = win_pos[w]

    votes, ins = vote_fragments_device(codes, lens, backbones, wins, offs)
    out = {}
    for w in win_ids:
        wi = win_pos[w]
        per_col: list = [dict() for _ in range(WINDOW + 1)]
        for (col, s), cnt in ins[wi].items():
            if 0 <= col <= WINDOW:
                d = per_col[col]
                d[s] = d.get(s, 0) + cnt
        out[w] = (votes[wi], per_col)
    return out


def _unique_map(vals, pos):
    occur: dict = {}
    for v, p in zip(vals.tolist(), pos.tolist()):
        occur.setdefault(v, []).append(p)
    return {v: ps[0] for v, ps in occur.items() if len(ps) == 1}


def _anchor_chain(draft_map, rvals, rpos):
    """Monotone (draft_pos, read_pos) anchor chain for one read: shared
    unique fine anchors filtered to the dominant diagonal."""
    read_map = _unique_map(rvals, rpos)
    pairs = []
    for v, rp in read_map.items():
        dp = draft_map.get(v)
        if dp is not None:
            pairs.append((dp, rp))
    if len(pairs) < 3:
        return None
    pairs.sort()
    offs = np.asarray([rp - dp for dp, rp in pairs], np.int64)
    med = np.median(offs)
    keep = np.abs(offs - med) < 600
    pairs = [p for p, k in zip(pairs, keep.tolist()) if k]
    if len(pairs) < 3:
        return None
    # enforce strictly increasing read positions
    out = []
    last_rp = -1
    for dp, rp in pairs:
        if rp > last_rp:
            out.append((dp, rp))
            last_rp = rp
    return out if len(out) >= 3 else None


def _interp(chain, dp):
    """Read position for draft position dp by linear interpolation."""
    dps = chain[0]
    rps = chain[1]
    i = np.searchsorted(dps, dp)
    if i == 0:
        return rps[0] - (dps[0] - dp)
    if i >= dps.shape[0]:
        return rps[-1] + (dp - dps[-1])
    d0, d1 = dps[i - 1], dps[i]
    r0, r1 = rps[i - 1], rps[i]
    if d1 == d0:
        return r0
    return r0 + (dp - d0) * (r1 - r0) // (d1 - d0)


def polish_contig(draft: np.ndarray, read_alignments, read_seqs, l: int,
                  density: float, use_hpc: bool, repetitive=None,
                  min_end_depth: int | None = None):
    """Returns (polished bases, window coverage median).

    min_end_depth: pileup depth below which contig ENDS are trimmed
    (default 2 for accurate reads, 3 for noisy reads whose depth<3
    consensus stays near raw-read accuracy)."""
    if min_end_depth is None:
        min_end_depth = 2 if use_hpc else 3
    n = draft.shape[0]
    if n < 100:
        return draft, 0.0
    dvals, dpos = _read_sketch(draft, l, FINE_DENSITY, use_hpc, repetitive)
    draft_map = _unique_map(dvals, dpos)

    n_windows = (n + WINDOW - 1) // WINDOW
    frags: list = [[] for _ in range(n_windows)]
    offsets: list = [[] for _ in range(n_windows)]

    for al in read_alignments:
        read_idx, is_rev = al[0], bool(al[6])
        seq = read_seqs.get(read_idx)
        if seq is None:
            continue
        if is_rev:
            seq = _revcomp(seq)
        rvals, rpos = _read_sketch(seq, l, FINE_DENSITY, use_hpc, repetitive)
        chain = _anchor_chain(draft_map, rvals, rpos)
        if chain is None:
            continue
        dps = np.asarray([c[0] for c in chain], np.int64)
        rps = np.asarray([c[1] for c in chain], np.int64)
        ch = (dps, rps)
        d_lo, d_hi = int(dps[0]), int(dps[-1])
        w_first = max(0, (d_lo + WINDOW - 1) // WINDOW - 1)
        w_last = min(n_windows - 1, d_hi // WINDOW)
        for w in range(w_first, w_last + 1):
            if len(frags[w]) >= MAX_FRAGS:
                continue
            w0, w1 = w * WINDOW, min((w + 1) * WINDOW, n)
            # clamp to the read's anchored draft range (partial coverage of
            # a window still votes on the covered columns)
            c0 = max(w0, d_lo)
            c1 = min(w1, d_hi)
            if c1 - c0 < 100:
                continue
            r0 = _interp(ch, c0) - MARGIN
            r1 = _interp(ch, c1) + MARGIN
            r0 = max(0, int(r0))
            r1 = min(seq.shape[0], int(r1))
            if r1 - r0 < (c1 - c0) // 2:
                continue
            frags[w].append(seq[r0:r1])
            offsets[w].append(int((c0 - w0) + (r0 - _interp(ch, c0))))

    device_votes = None
    if _device_enabled():
        try:
            device_votes = _device_vote_windows(draft, frags, offsets,
                                                n_windows)
        except Exception:  # no usable accelerator/backend: host fallback
            _DEVICE_STATE["on"] = False
            device_votes = None

    pieces = []
    depths = []
    col_depths = []
    for w in range(n_windows):
        w0, w1 = w * WINDOW, min((w + 1) * WINDOW, n)
        if device_votes is not None and w in device_votes:
            from .consensus import consensus_from_votes
            votes_w, ins_w = device_votes[w]
            cons, depth, cols = consensus_from_votes(draft[w0:w1], votes_w,
                                                     ins_w)
        else:
            cons, depth, cols = window_consensus(draft[w0:w1], frags[w],
                                                 offsets[w])
        depths.append(depth)
        pieces.append(cons)
        col_depths.append(cols)
    out = np.concatenate(pieces)
    cols = np.concatenate(col_depths)
    # coverage-trim the contig ends (the reference trims its POA consensus
    # to the covered region, ContigPolisher.hpp:2587-2704)
    covered = np.flatnonzero(cols >= min_end_depth)
    if covered.shape[0] == 0:
        return out[:0], 0.0
    out = out[covered[0]: covered[-1] + 1]
    coverage = float(np.median(np.asarray(depths))) if depths else 0.0
    return out, coverage
