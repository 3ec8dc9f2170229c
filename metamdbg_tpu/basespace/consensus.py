"""Windowed pileup consensus: the polishing engine.

Plays the role of the reference's ContigPolisher (minimap2 + edlib + spoa,
src/toBasespace/ContigPolisher.hpp:134-137,1514-1520,2587-2704) re-designed
as a *batched banded overlap alignment + column pileup*:

- the draft contig is split into fixed windows (500 bp);
- every mapped read contributes one fragment per window (cut by the read's
  anchor-derived coordinate map, with margins);
- all fragments of a window are banded-aligned against the draft window in
  one vectorized DP (rows swept together across fragments — the TPU-friendly
  regular shape; scores 3/-5/-4 like spoa's engine), with FREE leading and
  trailing gaps on both sequences (overlap semantics: staggered fragments
  must not vote deletions over columns they never covered);
- per-column votes (base / deletion, plus insertion strings keyed by column)
  produce the consensus; columns without majority support keep the draft.

This is the racon recipe with the alignment expressed as a dense regular
batch instead of per-pair SIMD — the shape that maps onto the MXU/VPU.
"""

import numpy as np

MATCH = np.int32(3)
MISMATCH = np.int32(-5)
GAP = np.int32(-4)
NEG = np.int32(-(1 << 28))

WINDOW = 500          # ContigPolisher.hpp:134
MAX_FRAGS = 100       # ContigPolisher.hpp:136 (fragments per window)
BAND = 64             # half-band around the anchor diagonal

# base codes for voting: A C G T -> 0..3
_CODE = np.full(256, 255, np.uint8)
for _i, _b in enumerate(b"ACGT"):
    _CODE[_b] = _i
    _CODE[_b + 32] = _i
_BASES = np.frombuffer(b"ACGT", np.uint8)

# traceback codes
TB_DIAG, TB_UP, TB_LEFT, TB_START = 0, 1, 2, 3


def banded_align_batch(frags: np.ndarray, frag_lens: np.ndarray,
                       backbone: np.ndarray, offsets: np.ndarray):
    """Banded overlap alignment of F fragments against one backbone.

    frags: (F, Lf) u8 base codes (padded); frag_lens: (F,); backbone: (Lb,)
    u8 codes; offsets: (F,) expected backbone position of each fragment's
    first base (the band is centered on diagonal j = i + offset). Leading /
    trailing gaps on either sequence are free and unreported.

    Returns (best_score (F,), tb (F,Lf+1,W) u8, end_i (F,), end_k (F,)).
    """
    F, Lf = frags.shape
    Lb = backbone.shape[0]
    W = 2 * BAND + 1
    ar = np.arange(W)[None, :]

    score = np.full((F, W), NEG, np.int32)
    tb = np.full((F, Lf + 1, W), TB_START, np.uint8)

    j0 = offsets[:, None] - BAND + ar
    valid0 = (j0 >= 0) & (j0 <= Lb)
    score[valid0] = 0  # free leading backbone gap

    gap_k = GAP * np.arange(W, dtype=np.int32)
    best_score = np.full(F, NEG, np.int64)
    best_i = np.zeros(F, np.int64)
    best_k = np.zeros(F, np.int64)

    for i in range(1, Lf + 1):
        rows = frag_lens >= i
        j = offsets[:, None] + (i - BAND) + ar
        jv = (j >= 0) & (j <= Lb)
        bcol = np.clip(j - 1, 0, Lb - 1)
        bb = backbone[bcol]
        fb = frags[:, i - 1][:, None]
        sub = np.where(bb == fb, MATCH, MISMATCH).astype(np.int32)
        diag = score + np.where((j >= 1) & jv, sub, NEG // 2)
        up = np.concatenate([score[:, 1:], np.full((F, 1), NEG, np.int32)],
                            axis=1) + GAP
        new = np.maximum(diag, up)
        choice = np.where(diag >= up, np.uint8(TB_DIAG), np.uint8(TB_UP))
        # free leading fragment gap: restart at j == 0
        at_j0 = jv & (j == 0)
        restart = at_j0 & (new < 0)
        new = np.where(restart, np.int32(0), new)
        choice = np.where(restart, np.uint8(TB_START), choice)
        # left: new[k] = max(new[k], new[k-1] + GAP) via affine cummax
        c = new - gap_k[None, :]
        cm = np.maximum.accumulate(c, axis=1)
        lefted = cm + gap_k[None, :]
        choice = np.where(lefted > new, np.uint8(TB_LEFT), choice)
        new = lefted
        new[~jv] = NEG
        choice[~jv] = TB_START
        score = np.where(rows[:, None], new, score)
        tb[rows, i, :] = choice[rows]

        # track the j == Lb column (free trailing fragment gap)
        k_lb = Lb - (offsets + (i - BAND))
        kv = rows & (k_lb >= 0) & (k_lb < W)
        k_c = np.clip(k_lb, 0, W - 1)
        cand = np.where(kv, score[np.arange(F), k_c], NEG)
        better = cand > best_score
        best_score = np.where(better, cand, best_score)
        best_i = np.where(better, i, best_i)
        best_k = np.where(better, k_c, best_k)

    # free trailing backbone gap: max over each fragment's own last row
    j_last = offsets[:, None] + (frag_lens[:, None] - BAND) + ar
    jlv = (j_last >= 0) & (j_last <= Lb)
    last_row = np.where(jlv, score, NEG)
    k_row = last_row.argmax(axis=1)
    row_best = last_row[np.arange(F), k_row]
    better = row_best > best_score
    best_score = np.where(better, row_best, best_score)
    best_i = np.where(better, frag_lens, best_i)
    best_k = np.where(better, k_row, best_k)

    return best_score, tb, best_i, best_k


def backtrack_batch(tb: np.ndarray, end_i: np.ndarray, end_k: np.ndarray,
                    offsets: np.ndarray, Lb: int):
    """Vectorized backtrack over all fragments at once, from each fragment's
    best end cell to its free start. Ops arrays hold -1 for gaps, -2 for
    padding (before start / after end)."""
    F, Lsteps, W = tb.shape
    i = end_i.copy()
    k = end_k.copy()
    alive = np.ones(F, bool)
    max_steps = Lsteps + Lb + 2 * BAND
    ops_f = np.full((F, max_steps), -2, np.int32)
    ops_b = np.full((F, max_steps), -2, np.int32)
    rng = np.arange(F)
    step = 0
    while alive.any() and step < max_steps:
        j = i + offsets - BAND + k
        t = tb[rng, np.clip(i, 0, Lsteps - 1), np.clip(k, 0, W - 1)]
        stop = alive & ((t == TB_START) | (i <= 0) | (j <= 0))
        alive &= ~stop
        cur = alive
        is_diag = cur & (t == TB_DIAG)
        is_up = cur & (t == TB_UP)
        is_left = cur & (t == TB_LEFT)
        ops_f[:, step] = np.where(is_diag | is_up, i - 1, -1)
        ops_b[:, step] = np.where(is_diag | is_left, j - 1, -1)
        ops_f[:, step][~cur] = -2
        ops_b[:, step][~cur] = -2
        i = np.where(is_diag | is_up, i - 1, i)
        k = np.where(is_up, k + 1, k)
        k = np.where(is_left, k - 1, k)
        oob = alive & ((k < 0) | (k >= W))
        alive &= ~oob
        step += 1
    return ops_f[:, :step], ops_b[:, :step]


def window_consensus(draft_window: np.ndarray, frags: list,
                     frag_offsets: list, min_depth: int = 2):
    """Consensus of one window. draft_window: u8 bases; frags: list of u8
    base arrays; frag_offsets: expected window position of each fragment's
    first base. Returns (consensus u8 bases, mean aligned depth)."""
    backbone = _CODE[draft_window]
    Lb = backbone.shape[0]
    if not frags:
        return draft_window, 0.0, np.zeros(Lb, np.int32)
    F = len(frags)
    Lf = max(f.shape[0] for f in frags)
    codes = np.full((F, Lf), 4, np.uint8)
    lens = np.zeros(F, np.int64)
    offs = np.zeros(F, np.int64)
    for i, (f, o) in enumerate(zip(frags, frag_offsets)):
        codes[i, :f.shape[0]] = _CODE[f]
        lens[i] = f.shape[0]
        offs[i] = o

    scores, tb, end_i, end_k = banded_align_batch(codes, lens, backbone, offs)
    ops_f, ops_b = backtrack_batch(tb, end_i, end_k, offs, Lb)
    return pileup_vote(draft_window, codes, scores, ops_f, ops_b,
                       min_depth=min_depth)


def pileup_vote(draft_window: np.ndarray, codes: np.ndarray,
                scores: np.ndarray, ops_f: np.ndarray, ops_b: np.ndarray,
                min_depth: int = 2):
    """Column pileup + consensus from alignment transcripts (host or device).

    codes: (F, Lf) u8 fragment base codes; ops in reverse alignment order
    with -1 gaps / -2 padding (banded_align_batch / align_fragments_device).
    Returns (consensus u8, mean depth, per-output-base depth).
    """
    backbone = _CODE[draft_window]
    Lb = backbone.shape[0]
    F = codes.shape[0]
    keep = scores > 0
    votes = np.zeros((Lb, 5), np.int32)
    ins_votes: list[dict] = [dict() for _ in range(Lb + 1)]
    for f in range(F):
        if not keep[f]:
            continue
        of = ops_f[f]
        ob = ops_b[f]
        sel = of > -2
        of = of[sel][::-1]
        ob = ob[sel][::-1]
        # trim terminal indel runs: vote only between first/last diagonal op
        diag_idx = np.flatnonzero((of >= 0) & (ob >= 0))
        if diag_idx.shape[0] == 0:
            continue
        lo, hi = diag_idx[0], diag_idx[-1]
        pending = []
        for x, y in zip(of[lo:hi + 1].tolist(), ob[lo:hi + 1].tolist()):
            if y == -1:
                pending.append(x)
                continue
            if pending:
                d = ins_votes[y]
                s = bytes(codes[f, pending].tolist())
                d[s] = d.get(s, 0) + 1
                pending = []
            if x == -1:
                votes[y, 4] += 1
            else:
                c = codes[f, x]
                if c < 4:
                    votes[y, c] += 1

    return consensus_from_votes(draft_window, votes, ins_votes, min_depth)


def consensus_from_votes(draft_window: np.ndarray, votes: np.ndarray,
                         ins_votes: list, min_depth: int = 2):
    """Assemble the consensus from the vote tables (host or device source).

    votes: (Lb, 5) counts (A C G T DEL); ins_votes: per-column dicts of
    insertion-string counts. Returns (consensus u8, mean depth,
    per-output-base depth)."""
    backbone = _CODE[draft_window]
    Lb = backbone.shape[0]
    depth = votes.sum(axis=1)
    best = votes.argmax(axis=1)
    rngb = np.arange(Lb)
    best_count = votes[rngb, best]
    draft_count = np.where(backbone < 4,
                           votes[rngb, np.minimum(backbone, 3)], 0)
    use_alt = (depth >= min_depth) & (best_count > draft_count) \
        & (best_count * 2 > depth)

    out = []
    out_depth = []
    for j in range(Lb):
        ins = ins_votes[j] if j < len(ins_votes) else None
        if ins and depth[j] >= min_depth:
            n_ins = sum(ins.values())
            if n_ins * 2 > depth[j]:
                s, _ = max(ins.items(), key=lambda kv: (kv[1], kv[0]))
                piece = _BASES[np.frombuffer(s, np.uint8)]
                out.append(piece)
                out_depth.append(np.full(piece.shape[0], depth[j], np.int32))
        if use_alt[j]:
            if best[j] == 4:
                continue  # deletion wins
            out.append(_BASES[best[j]:best[j] + 1])
        else:
            out.append(draft_window[j:j + 1])
        out_depth.append(depth[j:j + 1].astype(np.int32))
    mean_depth = float(depth.mean()) if Lb else 0.0
    if out:
        return np.concatenate(out), mean_depth, np.concatenate(out_depth)
    return draft_window, mean_depth, np.zeros(Lb, np.int32)
