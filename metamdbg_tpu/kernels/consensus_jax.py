"""Device (JAX/XLA) path of the windowed consensus alignment.

Mirrors basespace/consensus.py's banded overlap alignment + backtrack with
identical semantics (tested bit-for-bit in tests/test_consensus_kernel.py),
expressed as one jitted program over padded batches:

- all fragments of MANY windows are aligned in a single lax.scan over
  fragment rows: state = (N, W) score lanes, output = per-row traceback
  planes — a dense, regular shape that XLA tiles onto the VPU;
- per-fragment backbones are gathered from a (NW, LB) window array by a
  fragment->window index, so one call covers a whole contig (or a batch of
  contigs);
- the backtrack is a second lax.scan over alignment steps, vectorized over
  fragments (pure gathers + masked updates).

The host path (numpy) remains the small-input fallback; pileup voting and
insertion consensus stay on the host (ragged string keys, trivial cost).
"""

import functools

import numpy as np

from ..basespace.consensus import BAND, GAP, MATCH, MISMATCH, NEG

W = 2 * BAND + 1
TB_DIAG, TB_UP, TB_LEFT, TB_START = 0, 1, 2, 3


@functools.lru_cache(maxsize=None)
def _get_jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


@functools.lru_cache(maxsize=None)
def _aligner(lf: int, lb: int):
    """Jitted aligner for fragment-length bucket lf, backbone width lb."""
    jax, jnp = _get_jax()

    def align(frags, frag_lens, backbones, win_of_frag, offsets):
        N = frags.shape[0]
        ar = jnp.arange(W, dtype=jnp.int32)[None, :]
        offs = offsets[:, None].astype(jnp.int32)

        j0 = offs - BAND + ar
        score0 = jnp.where((j0 >= 0) & (j0 <= lb), jnp.int32(0),
                           jnp.int32(NEG))
        gap_k = jnp.int32(GAP) * jnp.arange(W, dtype=jnp.int32)

        bb_of_frag = backbones[win_of_frag]  # (N, lb)
        # Re-base each fragment's backbone ONCE so the per-row window is a
        # cheap static-width slice along axis 1 (the per-row per-fragment
        # gather was 30x the cost of the rest of the DP).
        # bbg[f, t] = backbone[offs[f] - BAND + t - 1] (255 out of range);
        # row i needs backbone[j-1], j = offs + i - BAND + k  ->  t = i+k-? :
        # bbg[:, (i-1) : (i-1)+W].
        PAD = W + BAND + 4
        span = lf + W
        bb_pad = jnp.pad(bb_of_frag, ((0, 0), (PAD, PAD + span)),
                         constant_values=255)
        # fragments whose offset would clip the re-based slice can't align
        # anyway (band fully outside the backbone); zero their lengths
        frag_ok = (offsets >= BAND - PAD) & (offsets <= lb + BAND)
        frag_lens = jnp.where(frag_ok, frag_lens, 0)
        base = jnp.clip(offsets.astype(jnp.int32) - BAND + PAD,
                        0, bb_pad.shape[1] - span)

        def rebase(bb_row, start):
            return jax.lax.dynamic_slice(bb_row, (start,), (span,))

        bbg = jax.vmap(rebase)(bb_pad, base)   # (N, lf + W)

        def row(carry, i):
            score, best_score, best_i, best_k = carry
            rows = frag_lens >= i
            j = offs + (i - BAND) + ar
            jv = (j >= 0) & (j <= lb)
            bb = jax.lax.dynamic_slice_in_dim(bbg, i - 1, W, axis=1)
            fb = frags[:, i - 1][:, None]
            sub = jnp.where(bb == fb, jnp.int32(MATCH), jnp.int32(MISMATCH))
            diag = score + jnp.where((j >= 1) & jv, sub, jnp.int32(NEG // 2))
            up = jnp.concatenate(
                [score[:, 1:], jnp.full((N, 1), NEG, jnp.int32)],
                axis=1) + jnp.int32(GAP)
            new = jnp.maximum(diag, up)
            choice = jnp.where(diag >= up, jnp.uint8(TB_DIAG),
                               jnp.uint8(TB_UP))
            restart = jv & (j == 0) & (new < 0)
            new = jnp.where(restart, jnp.int32(0), new)
            choice = jnp.where(restart, jnp.uint8(TB_START), choice)
            c = new - gap_k[None, :]
            cm = jax.lax.associative_scan(jnp.maximum, c, axis=1)
            lefted = cm + gap_k[None, :]
            choice = jnp.where(lefted > new, jnp.uint8(TB_LEFT), choice)
            new = lefted
            new = jnp.where(jv, new, jnp.int32(NEG))
            choice = jnp.where(jv, choice, jnp.uint8(TB_START))
            score = jnp.where(rows[:, None], new, score)
            tb_row = jnp.where(rows[:, None], choice, jnp.uint8(TB_START))

            k_lb = (lb - (offsets + (i - BAND))).astype(jnp.int32)
            kv = rows & (k_lb >= 0) & (k_lb < W)
            k_c = jnp.clip(k_lb, 0, W - 1)
            onehot = (jnp.arange(W, dtype=jnp.int32)[None, :] == k_c[:, None])
            picked = jnp.where(onehot, score, jnp.int32(NEG)).max(axis=1)
            cand = jnp.where(kv, picked, jnp.int32(NEG))
            better = cand.astype(jnp.int32) > best_score
            best_score = jnp.where(better, cand.astype(jnp.int32), best_score)
            best_i = jnp.where(better, i, best_i)
            best_k = jnp.where(better, k_c.astype(jnp.int32), best_k)
            return (score, best_score, best_i, best_k), tb_row

        # derive the carry inits from an input so their sharding "varying"
        # status matches the loop outputs under shard_map
        zero_n = (frag_lens * 0).astype(jnp.int32)
        init = (score0, zero_n + jnp.int32(NEG), zero_n, zero_n)
        (score, best_score, best_i, best_k), tb_rows = jax.lax.scan(
            row, init, jnp.arange(1, lf + 1, dtype=jnp.int32))
        # tb: (lf+1, N, W), row 0 all TB_START
        tb = jnp.concatenate(
            [jnp.full((1, N, W), TB_START, jnp.uint8), tb_rows], axis=0)

        j_last = offs + (frag_lens[:, None] - BAND) + ar
        jlv = (j_last >= 0) & (j_last <= lb)
        last_row = jnp.where(jlv, score, jnp.int32(NEG))
        k_row = last_row.argmax(axis=1)
        row_best = last_row[jnp.arange(N), k_row].astype(jnp.int32)
        better = row_best > best_score
        best_score = jnp.where(better, row_best, best_score)
        best_i = jnp.where(better, frag_lens.astype(jnp.int32), best_i)
        best_k = jnp.where(better, k_row.astype(jnp.int32), best_k)

        return best_score, tb, best_i, best_k

    def backtrack(tb, end_i, end_k, offsets):
        N = tb.shape[1]
        max_steps = tb.shape[0] + 2 * BAND + 384  # covers <=30% gap content
        rng = jnp.arange(N)

        def step(carry, _):
            i, k, alive = carry
            j = i + offsets - BAND + k
            t = tb[jnp.clip(i, 0, tb.shape[0] - 1), rng,
                   jnp.clip(k, 0, W - 1)]
            stop = alive & ((t == TB_START) | (i <= 0) | (j <= 0))
            alive2 = alive & ~stop
            is_diag = alive2 & (t == TB_DIAG)
            is_up = alive2 & (t == TB_UP)
            is_left = alive2 & (t == TB_LEFT)
            of = jnp.where(is_diag | is_up, i - 1, -1)
            ob = jnp.where(is_diag | is_left, j - 1, -1)
            of = jnp.where(alive2, of, -2)
            ob = jnp.where(alive2, ob, -2)
            i = jnp.where(is_diag | is_up, i - 1, i)
            k = jnp.where(is_up, k + 1, k)
            k = jnp.where(is_left, k - 1, k)
            alive2 = alive2 & (k >= 0) & (k < W)
            return (i, k, alive2), (of.astype(jnp.int32),
                                    ob.astype(jnp.int32))

        init = (end_i.astype(jnp.int32), end_k.astype(jnp.int32),
                (end_i * 0 == 0))  # varying-consistent all-True
        _, (ops_f, ops_b) = jax.lax.scan(step, init, None, length=max_steps)
        return ops_f.T, ops_b.T   # (N, steps)

    def run(frags, frag_lens, backbones, win_of_frag, offsets):
        best_score, tb, best_i, best_k = align(frags, frag_lens, backbones,
                                               win_of_frag, offsets)
        ops_f, ops_b = backtrack(tb, best_i, best_k, offsets)
        return best_score, ops_f, ops_b

    return _get_jax()[0].jit(run)


def align_fragments_device(frags: np.ndarray, frag_lens: np.ndarray,
                           backbones: np.ndarray, win_of_frag: np.ndarray,
                           offsets: np.ndarray):
    """Batched device alignment. frags (N, Lf) u8 codes padded with 4;
    backbones (NW, LB) u8 codes; returns (scores (N,), ops_f, ops_b) as
    numpy, semantics identical to the host consensus path."""
    N, lf = frags.shape
    lb = backbones.shape[1]
    fn = _aligner(int(lf), int(lb))
    jnp = _get_jax()[1]
    score, ops_f, ops_b = fn(jnp.asarray(frags), jnp.asarray(frag_lens),
                             jnp.asarray(backbones),
                             jnp.asarray(win_of_frag),
                             jnp.asarray(offsets))
    return (np.asarray(score), np.asarray(ops_f), np.asarray(ops_b))


MAX_INS_EVENTS = 64   # per-fragment cap on transferred insertion events


@functools.lru_cache(maxsize=None)
def _voter(lf: int, lb: int, nw: int):
    """Jitted align + backtrack + ON-DEVICE pileup voting. Only the small
    vote tables and sparse insertion events cross the host boundary — the
    (N, steps) transcripts never leave the device."""
    jax, jnp = _get_jax()
    aligner = _aligner(lf, lb)

    def run(frags, frag_lens, backbones, win_of_frag, offsets):
        best_score, ops_f, ops_b = aligner(frags, frag_lens, backbones,
                                           win_of_frag, offsets)
        N, steps = ops_f.shape
        keep = best_score > 0

        diag = (ops_f >= 0) & (ops_b >= 0)
        any_diag = diag.any(axis=1)
        idx = jnp.arange(steps, dtype=jnp.int32)[None, :]
        first_diag = jnp.where(diag, idx, steps).min(axis=1)
        last_diag = jnp.where(diag, idx, -1).max(axis=1)
        in_range = (idx >= first_diag[:, None]) & (idx <= last_diag[:, None])
        valid = in_range & (ops_f > -2) & keep[:, None] & any_diag[:, None]

        # column votes: match/mismatch (code of frag base) or deletion (4)
        is_col = valid & (ops_b >= 0)
        code = jnp.where(
            ops_f >= 0,
            jnp.take_along_axis(frags, jnp.clip(ops_f, 0, lf - 1), axis=1)
            .astype(jnp.int32), 4)
        code = jnp.clip(code, 0, 4)
        win = win_of_frag[:, None].astype(jnp.int32)
        flat = (win * lb + jnp.clip(ops_b, 0, lb - 1)) * 5 + code
        votes = jnp.zeros((nw * lb * 5,), jnp.int32)
        votes = votes.at[jnp.where(is_col, flat, nw * lb * 5)].add(
            1, mode="drop")
        votes = votes.reshape(nw, lb, 5)

        # insertion events: attach column = last ob>=0 seen EARLIER in the
        # (reverse-order) step stream
        ob_valid = ops_b >= 0

        def last_valid(a, b):
            av, ax = a
            bv, bx = b
            return (av | bv, jnp.where(bv, bx, ax))

        lv = jax.lax.associative_scan(
            last_valid, (ob_valid, ops_b), axis=1)
        attach = lv[1]  # last valid ob at or before this step
        is_ins = valid & (ops_b == -1)
        # per-fragment compaction to MAX_INS_EVENTS events (sorted by step);
        # top_k on the negated key beats a full argsort of (N, steps)
        key = jnp.where(is_ins, idx, steps + 1)
        _, order = jax.lax.top_k(-key, MAX_INS_EVENTS)
        ev_step = jnp.take_along_axis(key, order, axis=1)
        ev_ok = ev_step <= steps
        ev_attach = jnp.take_along_axis(attach, order, axis=1)
        ev_fpos = jnp.take_along_axis(ops_f, order, axis=1)
        ev_attach = jnp.where(ev_ok, ev_attach, -1)
        ev_fpos = jnp.where(ev_ok, ev_fpos, -1)
        ev_step = jnp.where(ev_ok, ev_step, -1)
        return votes, ev_step.astype(jnp.int16), \
            ev_attach.astype(jnp.int16), ev_fpos.astype(jnp.int16)

    return _get_jax()[0].jit(run)


def vote_fragments_device(frags: np.ndarray, frag_lens: np.ndarray,
                          backbones: np.ndarray, win_of_frag: np.ndarray,
                          offsets: np.ndarray):
    """Device align + vote. Returns (votes (NW,LB,5) i32, insertion event
    dicts per window: {col: {bytes: count}}), matching the host
    pileup_vote's vote/ins_votes tables exactly."""
    N, lf = frags.shape
    nw, lb = backbones.shape
    fn = _voter(int(lf), int(lb), int(nw))
    jnp = _get_jax()[1]
    votes, ev_step, ev_attach, ev_fpos = fn(
        jnp.asarray(frags), jnp.asarray(frag_lens), jnp.asarray(backbones),
        jnp.asarray(win_of_frag), jnp.asarray(offsets))
    votes = np.asarray(votes)
    ins_votes = decode_insertion_events(frags, win_of_frag,
                                        np.asarray(ev_step),
                                        np.asarray(ev_attach),
                                        np.asarray(ev_fpos), nw)
    return votes, ins_votes


def decode_insertion_events(frags, win_of_frag, ev_step, ev_attach, ev_fpos,
                            nw: int):
    """Host decode of sparse insertion events into per-window
    {(attach_col, string): count} dicts. Events are in reverse alignment
    order (ascending step); forward runs group by consecutive positions."""
    ins_votes: list = [dict() for _ in range(nw)]
    for f in range(ev_step.shape[0]):
        ok = ev_step[f] >= 0
        if not ok.any():
            continue
        steps_f = ev_step[f][ok]
        attach_f = ev_attach[f][ok]
        fpos_f = ev_fpos[f][ok]
        w = int(win_of_frag[f])
        order = np.argsort(-steps_f, kind="stable")
        runs = []
        cur = None  # [attach_col, [frag positions], last_pos]
        for t in order.tolist():
            a, p = int(attach_f[t]), int(fpos_f[t])
            if cur is not None and a == cur[0] and p == cur[2] + 1:
                cur[1].append(p)
                cur[2] = p
            else:
                if cur is not None:
                    runs.append((cur[0], cur[1]))
                cur = [a, [p], p]
        if cur is not None:
            runs.append((cur[0], cur[1]))
        d = ins_votes[w]
        for (a, ps) in runs:
            s = bytes(frags[f, ps].tolist())
            key = (a, s)
            d[key] = d.get(key, 0) + 1
    return ins_votes
