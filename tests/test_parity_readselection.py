"""Golden parity: stage 1 (readSelection) vs the reference binary.

Byte-compares read_data_init.txt, read_stats.txt and read_data_corrected.txt
produced by the reference `metaMDBG readSelection` and by
metamdbg_tpu.sketch.read_selection on identical synthetic HiFi reads.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))

import datagen
import refharness
from metamdbg_tpu.io import records
from metamdbg_tpu.sketch import read_selection

# Auto-builds the oracle binary (or fails loudly) — parity suites must
# never silently skip (see refharness.require_reference).
refharness.require_reference()


def _params_hifi():
    return records.Parameters(
        minimizer_size=15, kminmer_size=4, density_assembly=0.005,
        kminmer_size_first=4, minimizer_spacing_mean=1 / 0.005,
        kminmer_length_mean=(1 / 0.005) * 3,
        kminmer_overlap_mean=(1 / 0.005) * 2,
        kminmer_size_prev=4, kminmer_size_last=0, mean_read_length=0,
        density_correction=0.025, use_homopolymer_compression=True,
        data_type=0, snpmer_size=21)


@pytest.fixture(scope="module")
def synthetic_fastq(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    path = str(d / "reads.fastq.gz")
    datagen.make_test_fastq(path, genome_len=50_000, coverage=10,
                            mean_length=8000, error_rate=0.001, seed=7)
    return path


@pytest.fixture(scope="module")
def ref_outputs(synthetic_fastq, tmp_path_factory):
    tmp_dir = str(tmp_path_factory.mktemp("ref"))
    refharness.setup_tmpdir(tmp_dir, [synthetic_fastq], _params_hifi())
    refharness.run_read_selection(tmp_dir, skip_correction=True)
    return tmp_dir


@pytest.fixture(scope="module")
def our_outputs(synthetic_fastq, tmp_path_factory):
    tmp_dir = str(tmp_path_factory.mktemp("ours"))
    os.makedirs(tmp_dir, exist_ok=True)
    read_selection.run_read_selection([synthetic_fastq], tmp_dir, _params_hifi(),
                                      min_read_quality=0.0, skip_correction=True)
    return tmp_dir


def _file_bytes(d, name):
    with open(os.path.join(d, name), "rb") as f:
        return f.read()


def test_read_data_init_parity(ref_outputs, our_outputs):
    ref = _file_bytes(ref_outputs, "read_data_init.txt")
    ours = _file_bytes(our_outputs, "read_data_init.txt")
    assert len(ref) == len(ours)
    assert ref == ours


def test_read_stats_parity(ref_outputs, our_outputs):
    ref = records.ReadStats.load(os.path.join(ref_outputs, "read_stats.txt"))
    ours = records.ReadStats.load(os.path.join(our_outputs, "read_stats.txt"))
    assert ref == ours
    assert _file_bytes(ref_outputs, "read_stats.txt") == _file_bytes(our_outputs, "read_stats.txt")


def test_read_data_corrected_parity(ref_outputs, our_outputs):
    assert (_file_bytes(ref_outputs, "read_data_corrected.txt")
            == _file_bytes(our_outputs, "read_data_corrected.txt"))
