"""Native window-cutting engine (native/window_cut.cpp) and native batch
read-vs-contig mapping (native/overlap.cpp) vs the pure-Python oracles:
identical polished contigs through polish_pass on error-laden synthetic
data."""

import numpy as np
import pytest

import datagen
from metamdbg_tpu.basespace import overlap_native, polisher, \
    window_cut_native


def _mk_inputs(seed, n_contigs=2, contig_len=8000, coverage=12,
               error_rate=0.05, with_qual=True):
    contigs = {}
    headers = {}
    reads = []
    ridx = 0
    for cid in range(n_contigs):
        genome = datagen.random_genome(contig_len, seed=seed + cid,
                                       circular=False)
        contigs[cid] = genome
        headers[cid] = (cid, False)
        for (_h, seq, qual) in datagen.sample_reads(
                genome, coverage, 2500, error_rate=error_rate,
                seed=seed + 100 + cid, circular=False):
            seq = np.asarray(seq, np.uint8)
            if not with_qual:
                qual = None
            reads.append((ridx, seq, qual))
            ridx += 1
    return contigs, headers, reads


def _digest(contigs_out):
    return {cid: (bytes(seq[:50].tobytes()), int(seq.shape[0]),
                  int(seq.astype(np.int64).sum()))
            for cid, seq in contigs_out.items()}


@pytest.mark.parametrize("seed,error_rate,with_qual", [
    (5, 0.05, True),
    (9, 0.10, True),   # indel-dense: exercises the NW fallback paths
    (13, 0.03, False),
])
def test_polish_pass_native_matches_oracle(monkeypatch, seed, error_rate,
                                           with_qual):
    assert window_cut_native.available()
    contigs, headers, reads = _mk_inputs(seed, error_rate=error_rate,
                                         with_qual=with_qual)

    c_native, h_native, cov_native, _, ch_native = polisher.polish_pass(
        dict(contigs), dict(headers), reads, min_contig_length=100,
        min_contig_coverage=1.0, final_headers=False, n_threads=2)

    monkeypatch.setattr(window_cut_native, "window_cut_batch",
                        lambda *a, **k: None)
    monkeypatch.setattr(overlap_native, "available", lambda: False)
    c_oracle, h_oracle, cov_oracle, _, ch_oracle = polisher.polish_pass(
        dict(contigs), dict(headers), reads, min_contig_length=100,
        min_contig_coverage=1.0, final_headers=False, n_threads=2)

    assert _digest(c_native) == _digest(c_oracle)
    assert h_native == h_oracle
    assert cov_native == cov_oracle
    assert ch_native == ch_oracle
    assert len(c_native) > 0  # the case must actually polish something
