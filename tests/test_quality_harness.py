"""Slow end-to-end quality harness: OUR final contigs.fasta.gz vs the
REFERENCE binary's, on (a) a 4 Mb isolate at 50x HiFi (test_201/test_562
scale) and (b) a synthetic metagenome (5 genomes, uneven 5-80x coverage,
shared mutated repeat family), HiFi and ONT. QUAST-class metrics (k-mer
genome fraction, error events/100kb, misassembly proxy, #contigs, N50)
must be >= the reference's. Numbers land in scratch/QUALITY.json for
BENCH. Opt-in: pytest -m slow tests/test_quality_harness.py
(VERDICT r2 missing #3)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import datagen
import quality
import refharness

pytestmark = pytest.mark.slow

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
SCRATCH = os.path.join(ROOT, "scratch")


def _run_ours(reads, out_dir, platform):
    flag = "--in-hifi" if platform == "hifi" else "--in-ont"
    subprocess.run([sys.executable, "-m", "metamdbg_tpu", "asm", "--out-dir",
                    out_dir, flag, reads, "--threads",
                    str(os.cpu_count() or 2)],
                   check=True, cwd=ROOT, capture_output=True, timeout=3000)
    return os.path.join(out_dir, "contigs.fasta.gz")


def _run_ref(reads, out_dir, platform):
    refharness.require_reference()
    flag = "--in-hifi" if platform == "hifi" else "--in-ont"
    subprocess.run([refharness.REF_BIN, "asm", "--out-dir", out_dir, flag,
                    reads, "--threads", str(os.cpu_count() or 2)],
                   check=True, capture_output=True, timeout=3000)
    return os.path.join(out_dir, "contigs.fasta.gz")


def _record(name, ours, ref):
    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, "QUALITY.json")
    data = {}
    if os.path.exists(path):
        data = json.load(open(path))
    data[name] = {"ours": ours, "reference": ref}
    json.dump(data, open(path, "w"), indent=1)


def _assert_not_worse(ours, ref):
    assert ours["genome_fraction"] >= ref["genome_fraction"] - 0.002, \
        (ours, ref)
    # tight bound (VERDICT r3 next-#5): at most the reference's error rate
    # plus 0.05/100kb of slack (1-2 events at these scales)
    assert ours["error_events_per_100kb"] <= \
        ref["error_events_per_100kb"] + 0.05, (ours, ref)
    assert ours["misassembly_switches"] <= ref["misassembly_switches"], \
        (ours, ref)
    assert ours["n_contigs"] <= ref["n_contigs"] + 2, (ours, ref)


def test_isolate_4mb_hifi(tmp_path):
    genome = datagen.random_genome(4_000_000, seed=31)
    reads = str(tmp_path / "reads.fastq.gz")
    datagen.write_fastq(reads, datagen.sample_reads(
        genome, 50, 10_000, 0.001, seed=32))

    ours = quality.assembly_metrics(
        quality.load_fasta_gz(_run_ours(reads, str(tmp_path / "ours"),
                                        "hifi")), [genome])
    ref = quality.assembly_metrics(
        quality.load_fasta_gz(_run_ref(reads, str(tmp_path / "ref"),
                                       "hifi")), [genome])
    _record("isolate_4mb_hifi_50x", ours, ref)
    _assert_not_worse(ours, ref)
    assert ours["genome_fraction"] > 0.999
    assert ours["misassembly_switches"] == 0


def test_metagenome_hifi(tmp_path):
    genomes = datagen.make_metagenome()
    coverages = [5, 12, 25, 50, 80]
    reads = str(tmp_path / "meta.fastq.gz")
    datagen.write_fastq(reads, datagen.metagenome_reads(
        genomes, coverages, error_rate=0.001))

    ours = quality.assembly_metrics(
        quality.load_fasta_gz(_run_ours(reads, str(tmp_path / "ours"),
                                        "hifi")), genomes)
    ref = quality.assembly_metrics(
        quality.load_fasta_gz(_run_ref(reads, str(tmp_path / "ref"),
                                       "hifi")), genomes)
    _record("metagenome_hifi_5g_uneven", ours, ref)
    _assert_not_worse(ours, ref)


def test_metagenome_ont(tmp_path):
    """ONT error profile (subs + indels, no HPC, correction path)."""
    genomes = datagen.make_metagenome(n_genomes=3,
                                      sizes=[500_000, 700_000, 900_000],
                                      seed=40)
    coverages = [15, 35, 60]
    reads = str(tmp_path / "ont.fastq.gz")
    datagen.write_fastq(reads, datagen.metagenome_reads(
        genomes, coverages, error_rate=0.01, ins_rate=0.004, del_rate=0.004,
        mean_quality=20, seed=41))

    ours = quality.assembly_metrics(
        quality.load_fasta_gz(_run_ours(reads, str(tmp_path / "ours"),
                                        "ont")), genomes)
    ref = quality.assembly_metrics(
        quality.load_fasta_gz(_run_ref(reads, str(tmp_path / "ref"),
                                       "ont")), genomes)
    _record("metagenome_ont_3g_uneven", ours, ref)
    _assert_not_worse(ours, ref)
