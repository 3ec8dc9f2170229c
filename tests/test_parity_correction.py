"""Golden parity of the ONT read-correction subsystem vs the reference binary.

Runs `metaMDBG readSelection` (ONT settings) + `metaMDBG readCorrection
--threads 1` next to metamdbg_tpu's correction stage on synthetic error-laden
read sets and byte-compares `read_data_corrected.txt`.
"""

import os
import shutil

import numpy as np
import pytest

import datagen
import refharness
from metamdbg_tpu.correction import stage
from metamdbg_tpu.io import records

# Auto-builds the oracle binary (or fails loudly) — parity suites must
# never silently skip (see refharness.require_reference).
refharness.require_reference()


def _ont_params():
    return records.Parameters(
        minimizer_size=15, kminmer_size=4, density_assembly=0.005,
        kminmer_size_first=4, kminmer_size_prev=4, kminmer_size_last=17,
        mean_read_length=0, density_correction=0.025,
        use_homopolymer_compression=False, data_type=1)


def _run_case(tmp_path, genome_len, coverage, mean_len, error_rate, seed):
    ref_dir = os.path.join(tmp_path, "ref")
    my_dir = os.path.join(tmp_path, "mine")
    os.makedirs(ref_dir)
    os.makedirs(my_dir)
    fq = os.path.join(tmp_path, "reads.fastq.gz")
    genome = datagen.random_genome(genome_len, seed=seed)
    datagen.write_fastq(fq, datagen.sample_reads(
        genome, coverage, mean_len, error_rate=error_rate, seed=seed + 1))

    params = _ont_params()
    refharness.setup_tmpdir(ref_dir, [fq], params)
    refharness.run_read_selection(ref_dir, skip_correction=False, threads=1)
    refharness.run_read_correction(ref_dir, threads=1)

    for f in ("read_data_init.txt", "read_stats.txt", "parameters.gz",
              "input.txt", "repetitiveMinimizers.bin"):
        shutil.copy(os.path.join(ref_dir, f), os.path.join(my_dir, f))
    stage.run_read_correction(my_dir, params, min_identity=0.96,
                              min_overlap_length=1000)

    ref_bytes = open(os.path.join(ref_dir, "read_data_corrected.txt"), "rb").read()
    my_bytes = open(os.path.join(my_dir, "read_data_corrected.txt"), "rb").read()
    assert my_bytes == ref_bytes

    # the multiprocess correction pool must be byte-identical too
    stage.run_read_correction(my_dir, params, min_identity=0.96,
                              min_overlap_length=1000, n_threads=2)
    par_bytes = open(os.path.join(my_dir, "read_data_corrected.txt"), "rb").read()
    assert par_bytes == ref_bytes


def test_correction_parity_small(tmp_path):
    _run_case(str(tmp_path), genome_len=60_000, coverage=15, mean_len=6000,
              error_rate=0.03, seed=3)


def test_correction_parity_low_coverage_short_reads(tmp_path):
    # short reads exercise the too-short / uncorrected paths; higher error
    # rate exercises mismatch/insertion branch nodes in the POA DAG
    _run_case(str(tmp_path), genome_len=40_000, coverage=8, mean_len=2500,
              error_rate=0.05, seed=11)
