"""Golden parity: stage `graph --firstpass` (k=4) vs the reference binary.

Oracles:
- kminmerData_min.txt: multiset of k-min-mer rows (reference write order is
  thread-nondeterministic);
- kminmerData_abundance.txt: set of (hash128, count) pairs (rescue may write
  duplicates in the reference — compared as sets);
- unitigGraph.nodes.bin: byte-identical (deterministically renamed);
- unitigGraph.edges.successors.bin: per-oriented-unitig successor sets;
- unitigGraph.nodes.abundances.bin and stats.bin: byte-identical.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import datagen
import refharness
from metamdbg_tpu.graph import gio, stage
from metamdbg_tpu.io import records
from metamdbg_tpu.sketch import read_selection

# Auto-builds the oracle binary (or fails loudly) — parity suites must
# never silently skip (see refharness.require_reference).
refharness.require_reference()

K = 4


def _params_hifi():
    return records.Parameters(
        minimizer_size=15, kminmer_size=K, density_assembly=0.005,
        kminmer_size_first=K, minimizer_spacing_mean=1 / 0.005,
        kminmer_length_mean=(1 / 0.005) * (K - 1),
        kminmer_overlap_mean=(1 / 0.005) * (K - 2),
        kminmer_size_prev=K, kminmer_size_last=80, mean_read_length=8000,
        density_correction=0.025, use_homopolymer_compression=True,
        data_type=0, snpmer_size=21)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    fq = str(d / "reads.fastq.gz")
    datagen.make_test_fastq(fq, genome_len=60_000, coverage=12,
                            mean_length=8000, error_rate=0.001, seed=11)

    ref_dir = str(tmp_path_factory.mktemp("ref"))
    refharness.setup_tmpdir(ref_dir, [fq], _params_hifi())
    refharness.run_read_selection(ref_dir, threads=1)
    refharness.run_graph(ref_dir, first_pass=True, min_abundance=0)

    our_dir = str(tmp_path_factory.mktemp("ours"))
    read_selection.run_read_selection([fq], our_dir, _params_hifi(),
                                      skip_correction=True)
    stage.run_graph_first_pass(our_dir, K, min_abundance=0)
    return ref_dir, our_dir


def test_kminmer_rows_parity(dirs):
    ref_dir, our_dir = dirs
    ref = gio.read_kminmer_rows(os.path.join(ref_dir, "kminmerData_min.txt"), K)
    ours = gio.read_kminmer_rows(os.path.join(our_dir, "kminmerData_min.txt"), K)
    # reference may contain duplicate rescued rows; ours is deduplicated
    ref_set = set(map(bytes, (ref[i].tobytes() for i in range(ref.shape[0]))))
    our_set = set(map(bytes, (ours[i].tobytes() for i in range(ours.shape[0]))))
    assert ref_set == our_set


def test_kminmer_abundance_parity(dirs):
    ref_dir, our_dir = dirs
    rk, rc = gio.read_kminmer_abundances(os.path.join(ref_dir, "kminmerData_abundance.txt"))
    ok, oc = gio.read_kminmer_abundances(os.path.join(our_dir, "kminmerData_abundance.txt"))
    ref_set = set(zip(map(tuple, rk.tolist()), rc.tolist()))
    our_set = set(zip(map(tuple, ok.tolist()), oc.tolist()))
    assert ref_set == our_set


def test_unitig_nodes_parity(dirs):
    ref_dir, our_dir = dirs
    ref = open(os.path.join(ref_dir, "unitigGraph.nodes.bin"), "rb").read()
    ours = open(os.path.join(our_dir, "unitigGraph.nodes.bin"), "rb").read()
    if ref != ours:
        rn = gio.read_unitig_nodes(os.path.join(ref_dir, "unitigGraph.nodes.bin"))
        on = gio.read_unitig_nodes(os.path.join(our_dir, "unitigGraph.nodes.bin"))
        assert len(rn) == len(on), (len(rn), len(on))
        for i, ((rs, ri), (os_, oi)) in enumerate(zip(rn, on)):
            assert ri == oi and np.array_equal(rs, os_), f"unitig {i} differs"
    assert ref == ours


def test_unitig_edges_parity(dirs):
    ref_dir, our_dir = dirs
    ref = gio.read_unitig_edges(os.path.join(ref_dir, "unitigGraph.edges.successors.bin"))
    ours = gio.read_unitig_edges(os.path.join(our_dir, "unitigGraph.edges.successors.bin"))
    assert set(ref.keys()) == set(ours.keys())
    for idx in sorted(ref):
        np.testing.assert_array_equal(ref[idx], ours[idx], err_msg=f"oriented unitig {idx}")


def test_unitig_abundances_parity(dirs):
    ref_dir, our_dir = dirs
    ref = open(os.path.join(ref_dir, "unitigGraph.nodes.abundances.bin"), "rb").read()
    ours = open(os.path.join(our_dir, "unitigGraph.nodes.abundances.bin"), "rb").read()
    assert ref == ours


def test_unitig_stats_parity(dirs):
    ref_dir, our_dir = dirs
    assert (gio.read_unitig_stats(os.path.join(ref_dir, "unitigGraph.stats.bin"))
            == gio.read_unitig_stats(os.path.join(our_dir, "unitigGraph.stats.bin")))
