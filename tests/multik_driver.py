"""Chained multi-k parity driver: runs reference and metamdbg_tpu side by side
pass after pass, byte-comparing artifacts at every step. Used by
tests/test_parity_multik.py and standalone debugging."""

import glob
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
import refharness
from metamdbg_tpu.graph import contigs, gio, multiplex, stage
from metamdbg_tpu.io import records
from metamdbg_tpu.sketch import read_selection


def make_params(k, prevk, first_k=4, last_k=80, density=0.005,
                platform="hifi"):
    spacing = 1 / np.float32(density)
    return records.Parameters(
        minimizer_size=15, kminmer_size=k, density_assembly=density,
        kminmer_size_first=first_k, minimizer_spacing_mean=float(spacing),
        kminmer_length_mean=float(spacing * (k - 1)),
        kminmer_overlap_mean=float(spacing * (k - 2)),
        kminmer_size_prev=prevk, kminmer_size_last=last_k,
        mean_read_length=8000, density_correction=0.025,
        use_homopolymer_compression=(platform == "hifi"),
        data_type=0 if platform == "hifi" else 1, snpmer_size=21)


def compare_pass(ref_dir, our_dir, k, check_filter=True):
    """Returns list of (artifact, status) mismatches (empty = full parity)."""
    problems = []

    def cmp_bytes(name):
        with open(os.path.join(ref_dir, name), "rb") as f:
            a = f.read()
        with open(os.path.join(our_dir, name), "rb") as f:
            b = f.read()
        if a != b:
            problems.append((name, f"bytes differ ({len(a)} vs {len(b)})"))

    for name in ("unitigGraph.nodes.bin", "unitigGraph.nodes.abundances.bin",
                 "unitigGraph.stats.bin", "contigs.nodepath", "unitig_data.txt"):
        cmp_bytes(name)
    sc = f"smallContigs/smallContigs_k{k}.bin"
    if os.path.exists(os.path.join(ref_dir, sc)):
        cmp_bytes(sc)

    rk, rc_ = gio.read_kminmer_abundances(os.path.join(ref_dir, "kminmerData_abundance.txt"))
    ok, oc = gio.read_kminmer_abundances(os.path.join(our_dir, "kminmerData_abundance.txt"))
    if (set(zip(map(tuple, rk.tolist()), rc_.tolist()))
            != set(zip(map(tuple, ok.tolist()), oc.tolist()))):
        problems.append(("kminmerData_abundance.txt", f"sets differ ({len(rk)} vs {len(ok)})"))

    def load_refined(d):
        with open(os.path.join(d, "unitigGraph.nodes.refined_abundances.bin"), "rb") as f:
            return set(struct.iter_unpack("<II", f.read()))
    if load_refined(ref_dir) != load_refined(our_dir):
        problems.append(("refined_abundances", "sets differ"))

    if check_filter:
        ref_files = sorted(glob.glob(os.path.join(ref_dir, "filter", "unitigs_*.bin")))
        for rf in ref_files:
            of = os.path.join(our_dir, "filter", os.path.basename(rf))
            with open(rf, "rb") as f:
                a = f.read()
            if not os.path.exists(of) or open(of, "rb").read() != a:
                problems.append((os.path.basename(rf), "filter dump differs"))
    return problems


def run_final_stages(ref_dir, our_dir, first_k, last_k, log=print):
    """Final pass: contig_data_init.txt + derepSmall + removeOverlaps +
    removeRepeats on both sides; byte-compare the outputs."""
    from metamdbg_tpu.basespace import postprocess

    p = make_params(last_k, last_k - 1, first_k=first_k, last_k=last_k)

    refharness.run_to_minspace(ref_dir, os.path.join(ref_dir, "contigs.nodepath"),
                               os.path.join(ref_dir, "contig_data_init.txt"),
                               threads=1)
    refharness.run_derep_small(ref_dir, first_k, last_k, threads=1)
    refharness.run_remove_overlaps(ref_dir, threads=1)
    refharness.run_remove_repeats(ref_dir, threads=1)

    contigs.run_to_minspace(our_dir, os.path.join(our_dir, "contigs.nodepath"),
                            os.path.join(our_dir, "contig_data_init.txt"),
                            os.path.join(our_dir, "unitigGraph.nodes.bin"), p)
    postprocess.run_derep_small(our_dir, p, first_k, last_k)
    postprocess.run_remove_overlaps(our_dir, p)
    postprocess.run_remove_repeats(our_dir, p)

    ok = True
    for name in ("contig_data_init.txt", "contig_data_init_small.txt",
                 "contig_data_init_small.txt.nooverlaps",
                 "contig_data_init_small.txt.norepeats"):
        with open(os.path.join(ref_dir, name), "rb") as f:
            a = f.read()
        with open(os.path.join(our_dir, name), "rb") as f:
            b = f.read()
        if a == b:
            log(f"final: {name}: parity OK ({len(a)} bytes)")
        else:
            log(f"final: {name}: DIVERGED ({len(a)} vs {len(b)})")
            ok = False
    return ok


def run_chain(fastq, ref_dir, our_dir, first_k=4, last_k=10, stop_on_diff=True,
              log=print, platform="hifi"):
    os.makedirs(os.path.join(ref_dir, "filter"), exist_ok=True)
    os.makedirs(os.path.join(ref_dir, "smallContigs"), exist_ok=True)
    os.makedirs(our_dir, exist_ok=True)

    p = make_params(first_k, first_k, first_k=first_k, last_k=last_k,
                    platform=platform)
    refharness.setup_tmpdir(ref_dir, [fastq], p)
    if platform == "hifi":
        refharness.run_read_selection(ref_dir, threads=1)
        read_selection.run_read_selection([fastq], our_dir, p,
                                          skip_correction=True)
    else:
        from metamdbg_tpu.correction import stage as correction_stage
        refharness.run_read_selection(ref_dir, skip_correction=False, threads=1)
        refharness.run_read_correction(ref_dir, threads=1)
        read_selection.run_read_selection([fastq], our_dir, p)
        with open(os.path.join(our_dir, "input.txt"), "w") as f:
            f.write(os.path.abspath(fastq) + "\n")
        correction_stage.run_read_correction(our_dir, p)
        a = open(os.path.join(ref_dir, "read_data_corrected.txt"), "rb").read()
        b = open(os.path.join(our_dir, "read_data_corrected.txt"), "rb").read()
        if a != b:
            log("read_data_corrected.txt: DIVERGED")
            return False, first_k - 1
        log("read_data_corrected.txt: parity OK")

    all_ok = True
    for k in range(first_k, last_k + 1):
        prevk = max(first_k, k - 1)
        p = make_params(k, prevk, first_k=first_k, last_k=last_k,
                        platform=platform)
        p.save(os.path.join(ref_dir, "parameters.gz"))
        p.save(os.path.join(our_dir, "parameters.gz"))

        refharness.run_graph(ref_dir, first_pass=(k == first_k),
                             min_abundance=0, threads=1)
        refharness.run_contig(ref_dir, threads=1)
        refharness.run_to_minspace(ref_dir,
                                   os.path.join(ref_dir, "contigs.nodepath"),
                                   os.path.join(ref_dir, "unitig_data.txt"),
                                   threads=1)

        if k == first_k:
            stage.run_graph_first_pass(our_dir, k, min_abundance=0)
        elif k == first_k + 1:
            stage.run_graph_second_pass(our_dir, k, p)
        else:
            multiplex.run_graph_multiplex_pass(our_dir, k, p)
        contigs.run_contig_stage(our_dir, p)
        contigs.run_to_minspace(our_dir,
                                os.path.join(our_dir, "contigs.nodepath"),
                                os.path.join(our_dir, "unitig_data.txt"),
                                os.path.join(our_dir, "unitigGraph.nodes.bin"), p)

        problems = compare_pass(ref_dir, our_dir, k)
        if problems:
            all_ok = False
            log(f"k={k}: DIVERGED: " + "; ".join(f"{n}: {s}" for n, s in problems))
            if stop_on_diff:
                return False, k
        else:
            log(f"k={k}: parity OK")
    return all_ok, last_k
