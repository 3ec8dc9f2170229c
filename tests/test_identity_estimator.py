"""Property tests for the overlap/identity engine (VERDICT r2 weak #5):
the seed-survival identity estimator must be accurate near the decision
thresholds the pipeline applies to it (0.9 polish inclusion, 0.96 ONT
derep), for substitution-only and indel-containing error profiles."""

import numpy as np

import datagen
from metamdbg_tpu.basespace import overlap


def _mutated_pair(n, sub_rate, ins_rate, del_rate, seed):
    rng = np.random.default_rng(seed)
    a = datagen.random_genome(n, seed=seed + 1)
    b = datagen.mutate(a.copy(), rng, sub_rate, ins_rate, del_rate)
    return a, b


def _estimate_identity(a, b):
    idx = overlap.SeqIndex()
    idx.add(0, a)
    idx.build()
    hits = overlap.map_seq(idx, b)
    if not hits:
        return None
    best = max(hits, key=lambda h: h.nb_matches)
    return best.identity


def test_identity_estimator_accuracy_substitutions():
    """Error within +-0.02 across 1-10% substitution rates (n=8 each)."""
    for rate in (0.01, 0.02, 0.04, 0.06, 0.10):
        true_id = 1.0 - rate
        errs = []
        for rep in range(8):
            a, b = _mutated_pair(20_000, rate, 0.0, 0.0, 100 * rep + int(rate * 1e4))
            est = _estimate_identity(a, b)
            assert est is not None, (rate, rep)
            errs.append(est - true_id)
        bias = float(np.mean(errs))
        spread = float(np.max(np.abs(errs)))
        assert abs(bias) < 0.015, (rate, bias)
        assert spread < 0.03, (rate, spread)


def test_identity_estimator_accuracy_indels():
    """ONT-like mixes (subs + single-base indels): estimator must stay
    within +-0.03 of the total per-base error rate."""
    for sub, ind in ((0.01, 0.005), (0.02, 0.01), (0.04, 0.02)):
        true_id = 1.0 - (sub + 2 * ind)  # ins + del each at rate `ind`
        errs = []
        for rep in range(8):
            a, b = _mutated_pair(20_000, sub, ind, ind, 500 * rep + int(sub * 1e4))
            est = _estimate_identity(a, b)
            assert est is not None, (sub, ind, rep)
            errs.append(est - true_id)
        bias = float(np.mean(errs))
        assert abs(bias) < 0.03, (sub, ind, bias, errs)


def test_threshold_discrimination_at_090():
    """The polish-inclusion threshold (0.9, ToBasespace2.hpp:100-104)
    must separate 0.93-identity pairs (accept) from 0.85 (reject)."""
    accept, reject = 0, 0
    for rep in range(10):
        a, b = _mutated_pair(15_000, 0.07, 0.0, 0.0, 900 + rep)
        est = _estimate_identity(a, b)
        if est is not None and est >= 0.9:
            accept += 1
        a, b = _mutated_pair(15_000, 0.15, 0.0, 0.0, 950 + rep)
        est = _estimate_identity(a, b)
        if est is not None and est >= 0.9:
            reject += 1
    assert accept >= 9, accept
    assert reject <= 1, reject


def test_threshold_discrimination_at_096():
    """ONT derep threshold (0.96): 0.98-identity accepted, 0.93 rejected."""
    accept, reject = 0, 0
    for rep in range(10):
        a, b = _mutated_pair(15_000, 0.02, 0.0, 0.0, 1900 + rep)
        est = _estimate_identity(a, b)
        if est is not None and est >= 0.96:
            accept += 1
        a, b = _mutated_pair(15_000, 0.07, 0.0, 0.0, 1950 + rep)
        est = _estimate_identity(a, b)
        if est is not None and est >= 0.96:
            reject += 1
    assert accept >= 9, accept
    assert reject <= 1, reject


def test_window_cut_dp_no_silent_drop():
    """_nw_back/_nw_fwd must handle boundary spans beyond the old 250 bp
    cap (indel-rich ONT windows) instead of silently dropping the fragment
    (VERDICT r2 weak #4), and the cut must land near the true position."""
    from metamdbg_tpu.basespace import polisher
    rng = np.random.default_rng(3)
    contig = datagen.random_genome(2000, seed=4)
    # read = contig with ~4% single-base deletions: q/t drift apart
    keep = rng.random(2000) >= 0.04
    read = contig[keep]
    # anchor at contig position 700, boundary at 300: span 400 (> old cap)
    t_hi = 700
    q_hi = int(keep[:t_hi].sum())
    t_stop = 300
    q = polisher._nw_back(read, contig, q_hi, t_hi, t_stop)
    assert q is not None, "span > 250 must no longer be dropped"
    true_q = int(keep[:t_stop].sum())
    assert abs(q - true_q) <= 5, (q, true_q)

    q2 = polisher._nw_fwd(read, contig, int(keep[:200].sum()), 200, 650)
    assert q2 is not None
    assert abs(q2 - int(keep[:650].sum())) <= 5


def test_completion_table_matches_bfs():
    """Bitset-closure completion table vs the exact per-edge BFS on random
    POA graphs (branch nodes, merged edges, in/out-of-reference heads)."""
    from metamdbg_tpu.correction import poa

    rng = np.random.default_rng(51)
    for trial in range(30):
        n = int(rng.integers(5, 60))
        mins = rng.integers(0, 30, n).astype(np.uint32)
        quals = rng.integers(1, 40, n).astype(np.uint8)
        g = poa.PoaGraph(mins, quals)
        # random extra alignments to create branch nodes + merged edges
        for _ in range(int(rng.integers(1, 6))):
            aln = []
            r = 0
            while r < n:
                p = rng.random()
                if p < 0.1:
                    aln.append((-1, int(rng.integers(0, n))))  # insertion
                elif p < 0.2:
                    aln.append((r, -1))                        # deletion
                    r += 1
                else:
                    aln.append((r, int(rng.integers(0, n))))
                    r += 1
            q_mins = rng.integers(0, 30, n).astype(np.uint32)
            q_quals = rng.integers(1, 40, n).astype(np.uint8)
            g.add_alignment(aln, mins, q_mins, q_quals)

        ref_set = set(int(m) for m in mins[: n // 2])
        table = poa._CompletionTable(g, ref_set)
        checked = 0
        for node in g.nodes:
            for e in node.successors:
                want = poa.successor_completion(e, ref_set)
                got = table.completion(e, ref_set)
                assert got == want, (trial, want, got)
                checked += 1
        assert checked > 0
