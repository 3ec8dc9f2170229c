"""Native correction engine (native/poa_correct.cpp) vs the pure-Python
oracle (correction/{chainer,poa,aligner}.py): byte-identical
read_data_corrected.txt on error-laden synthetic read sets.

The reference-binary byte parity lives in tests/test_parity_correction.py;
this A/B pins the native twin against the oracle on wider settings (more
reads, denser errors, 2 threads) without needing the oracle binary.
"""

import os

import pytest

import datagen
from metamdbg_tpu.correction import poa_native, stage
from metamdbg_tpu.io import records
from metamdbg_tpu.sketch import read_selection


def _params(ont: bool):
    if ont:
        return records.Parameters(
            minimizer_size=15, kminmer_size=4, density_assembly=0.005,
            kminmer_size_first=4, kminmer_size_prev=4, kminmer_size_last=17,
            mean_read_length=0, density_correction=0.025,
            use_homopolymer_compression=False, data_type=1)
    return records.Parameters(
        minimizer_size=13, kminmer_size=4, density_assembly=0.005,
        kminmer_size_first=4, kminmer_size_prev=4, kminmer_size_last=17,
        mean_read_length=0, density_correction=0.025,
        use_homopolymer_compression=True, data_type=0)


def _run_both(tmp_path, monkeypatch, genome_len, coverage, mean_len,
              error_rate, seed, ont=True, n_threads=1):
    assert poa_native.available(), "native poa_correct must build"
    work_dir = os.path.join(str(tmp_path), "work")
    os.makedirs(work_dir)
    fq = os.path.join(str(tmp_path), "reads.fastq.gz")
    genome = datagen.random_genome(genome_len, seed=seed)
    datagen.write_fastq(fq, datagen.sample_reads(
        genome, coverage, mean_len, error_rate=error_rate, seed=seed + 1))

    params = _params(ont)
    with open(os.path.join(work_dir, "input.txt"), "w") as f:
        f.write(fq + "\n")
    read_selection.run_read_selection([fq], work_dir, params,
                                      skip_correction=False)

    out = os.path.join(work_dir, "read_data_corrected.txt")
    stage.run_read_correction(work_dir, params, min_identity=0.96,
                              min_overlap_length=1000, n_threads=n_threads)
    native_bytes = open(out, "rb").read()

    monkeypatch.setattr(poa_native, "available", lambda: False)
    stage.run_read_correction(work_dir, params, min_identity=0.96,
                              min_overlap_length=1000, n_threads=n_threads)
    oracle_bytes = open(out, "rb").read()
    assert native_bytes == oracle_bytes
    assert len(native_bytes) > 0


def test_native_matches_oracle_ont_dense_errors(tmp_path, monkeypatch):
    _run_both(tmp_path, monkeypatch, genome_len=50_000, coverage=20,
              mean_len=5000, error_rate=0.06, seed=7, ont=True)


def test_native_matches_oracle_ont_threads(tmp_path, monkeypatch):
    _run_both(tmp_path, monkeypatch, genome_len=40_000, coverage=12,
              mean_len=3000, error_rate=0.04, seed=19, ont=True, n_threads=2)


def test_native_matches_oracle_hifi(tmp_path, monkeypatch):
    _run_both(tmp_path, monkeypatch, genome_len=40_000, coverage=15,
              mean_len=8000, error_rate=0.01, seed=23, ont=False)
