"""Golden parity: stage `contig` (simplification + contig extraction) and
`toMinspace` at k=4 vs the reference binary (single-threaded)."""

import glob
import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import datagen
import refharness
from metamdbg_tpu.graph import contigs, stage
from metamdbg_tpu.io import records
from metamdbg_tpu.sketch import read_selection

# Auto-builds the oracle binary (or fails loudly) — parity suites must
# never silently skip (see refharness.require_reference).
refharness.require_reference()

K = 4


def _params():
    spacing = 1 / np.float32(0.005)
    return records.Parameters(
        minimizer_size=15, kminmer_size=K, density_assembly=0.005,
        kminmer_size_first=K, minimizer_spacing_mean=float(spacing),
        kminmer_length_mean=float(spacing * (K - 1)),
        kminmer_overlap_mean=float(spacing * (K - 2)),
        kminmer_size_prev=K, kminmer_size_last=80, mean_read_length=8000,
        density_correction=0.025, use_homopolymer_compression=True,
        data_type=0, snpmer_size=21)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    fq = str(d / "reads.fastq.gz")
    # repeats + errors to exercise bubbles/tips/cutoffs
    rng = np.random.default_rng(21)
    g1 = datagen.random_genome(70_000, seed=21)
    genome = np.concatenate([g1, g1[5000:9000], g1[40000:44000]])
    datagen.write_fastq(fq, datagen.sample_reads(genome, 20, 8000,
                                                 error_rate=0.005, seed=22))

    ref_dir = str(tmp_path_factory.mktemp("ref"))
    refharness.setup_tmpdir(ref_dir, [fq], _params())
    os.makedirs(os.path.join(ref_dir, "filter"))
    os.makedirs(os.path.join(ref_dir, "smallContigs"), exist_ok=True)
    refharness.run_read_selection(ref_dir, threads=1)
    refharness.run_graph(ref_dir, first_pass=True, min_abundance=0, threads=1)
    refharness.run_contig(ref_dir, threads=1)
    refharness.run_to_minspace(ref_dir, os.path.join(ref_dir, "contigs.nodepath"),
                               os.path.join(ref_dir, "unitig_data.txt"), threads=1)

    our_dir = str(tmp_path_factory.mktemp("ours"))
    read_selection.run_read_selection([fq], our_dir, _params(),
                                      skip_correction=True)
    stage.run_graph_first_pass(our_dir, K, min_abundance=0)
    contigs.run_contig_stage(our_dir, _params())
    contigs.run_to_minspace(our_dir, os.path.join(our_dir, "contigs.nodepath"),
                            os.path.join(our_dir, "unitig_data.txt"),
                            os.path.join(our_dir, "unitigGraph.nodes.bin"),
                            _params())
    return ref_dir, our_dir


def _bytes(d, name):
    with open(os.path.join(d, name), "rb") as f:
        return f.read()


def test_filter_dumps_parity(dirs):
    ref_dir, our_dir = dirs
    ref_files = sorted(glob.glob(os.path.join(ref_dir, "filter", "unitigs_*.bin")))
    our_files = sorted(glob.glob(os.path.join(our_dir, "filter", "unitigs_*.bin")))
    assert [os.path.basename(p) for p in ref_files] == \
           [os.path.basename(p) for p in our_files]
    for rf, of in zip(ref_files, our_files):
        with open(rf, "rb") as f:
            ref = f.read()
        with open(of, "rb") as f:
            ours = f.read()
        assert ref == ours, os.path.basename(rf)


def test_contigs_nodepath_parity(dirs):
    ref_dir, our_dir = dirs
    assert _bytes(ref_dir, "contigs.nodepath") == _bytes(our_dir, "contigs.nodepath")


def test_unitig_data_parity(dirs):
    ref_dir, our_dir = dirs
    assert _bytes(ref_dir, "unitig_data.txt") == _bytes(our_dir, "unitig_data.txt")


def test_refined_abundances_parity(dirs):
    ref_dir, our_dir = dirs

    def load(d):
        data = _bytes(d, "unitigGraph.nodes.refined_abundances.bin")
        return set(struct.iter_unpack("<II", data))

    assert load(ref_dir) == load(our_dir)
