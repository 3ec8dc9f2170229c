"""Native host-IO library vs the pure-Python parser."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import datagen
from metamdbg_tpu.io import fastq, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_matches_python(tmp_path):
    fq = str(tmp_path / "reads.fastq.gz")
    datagen.make_test_fastq(fq, genome_len=20_000, coverage=4,
                            mean_length=3000, seed=13)
    py_reads = list(fastq.iter_reads(fq))

    native_reads = []
    for seqs, quals, lengths, has_qual in native.iter_read_batches(
            fq, max_reads=7, max_bases=100_000):
        off = 0
        for L, hq in zip(lengths.tolist(), has_qual.tolist()):
            native_reads.append((seqs[off:off + L], quals[off:off + L], hq))
            off += L

    assert len(native_reads) == len(py_reads)
    for (ns, nq, hq), pr in zip(native_reads, py_reads):
        np.testing.assert_array_equal(ns, pr.seq)
        assert hq == 1
        np.testing.assert_array_equal(nq, pr.qual)


def test_native_fasta(tmp_path):
    fa = str(tmp_path / "seqs.fasta")
    with open(fa, "w") as f:
        f.write(">a\nACGTACGT\nACGT\n>b desc\nTTTT\n")
    out = []
    for seqs, quals, lengths, has_qual in native.iter_read_batches(fa):
        off = 0
        for L, hq in zip(lengths.tolist(), has_qual.tolist()):
            out.append((bytes(seqs[off:off + L]), hq))
            off += L
    assert out == [(b"ACGTACGTACGT", 0), (b"TTTT", 0)]
