"""Native overlap/mapping engine (native/overlap.cpp) vs the numpy oracle
(basespace/overlap.map_sketched_numpy): identical chains — coordinates,
matches, identity, tid, strand, anchors — across error rates, strands,
multi-target indexes, and the exclusion knobs."""

import numpy as np
import pytest

import datagen
from metamdbg_tpu.basespace import overlap, overlap_native


def _bounds_key(b):
    return (b.query_start, b.query_end, b.ref_start, b.ref_end,
            b.query_length, b.ref_length, b.is_reversed, b.nb_matches,
            b.identity, b.tid, b.anchors[0].tolist(), b.anchors[1].tolist())


def _compare(index, q_seq, **kw):
    q_vals, q_pos, q_dirs = overlap.sketch(np.asarray(q_seq, np.uint8))
    qlen = int(np.asarray(q_seq).shape[0])
    native = overlap.map_sketched(index, q_vals, q_pos, q_dirs, qlen, **kw)
    oracle = overlap.map_sketched_numpy(index, q_vals, q_pos, q_dirs, qlen,
                                        **kw)
    assert [_bounds_key(b) for b in native] == \
        [_bounds_key(b) for b in oracle]
    return native


@pytest.mark.parametrize("seed,error", [(3, 0.0), (5, 0.03), (7, 0.10)])
def test_map_matches_oracle(seed, error):
    assert overlap_native.available()
    rng = np.random.default_rng(seed)
    index = overlap.SeqIndex()
    genomes = []
    for tid in range(3):
        g = datagen.random_genome(12_000 + 500 * tid, seed=seed + tid,
                                  circular=False)
        genomes.append(g)
        index.add(tid, g)
    index.build()

    n_hits = 0
    for qi in range(12):
        tid = int(rng.integers(0, 3))
        g = genomes[tid]
        start = int(rng.integers(0, max(1, g.shape[0] - 4000)))
        frag = g[start:start + 4000].copy()
        if error:
            pos = rng.random(frag.shape[0]) < error
            frag[pos] = datagen.BASES[rng.integers(0, 4, int(pos.sum()))]
        if qi % 2:
            frag = datagen._revcomp(frag)
        n_hits += len(_compare(index, frag))
    assert n_hits > 0


def test_exclusion_knobs_match_oracle():
    assert overlap_native.available()
    g = datagen.random_genome(15_000, seed=31, circular=False)
    index = overlap.SeqIndex()
    index.add(0, g)
    index.add(1, g[:9000])
    index.build()
    _compare(index, g[2000:8000], exclude_tid=0)
    # self-map with the diagonal excluded (compute_self_overlap's setting)
    idx2 = overlap.SeqIndex()
    tandem = np.concatenate([g[:6000], g[:6000]])
    idx2.add(0, tandem)
    idx2.build()
    _compare(idx2, tandem, exclude_self_diag=True, max_occ=64)


def test_overlap_pair_path_matches_oracle(monkeypatch):
    assert overlap_native.available()
    g = datagen.random_genome(20_000, seed=41, circular=False)
    r1 = g[:12_000]
    r2 = g[8_000:]
    s1 = overlap.sketch(r1)
    s2 = overlap.sketch(r2)
    native = overlap.overlap_pair(s1, r1.shape[0], s2, r2.shape[0])
    monkeypatch.setattr(overlap_native, "available", lambda: False)
    oracle = overlap.overlap_pair(s1, r1.shape[0], s2, r2.shape[0])
    assert [_bounds_key(b) for b in native] == \
        [_bounds_key(b) for b in oracle]
    assert len(native) > 0
