"""End-to-end CLI test: synthetic HiFi metagenome -> full-length circular
contigs."""

import gzip
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

import datagen
from metamdbg_tpu.__main__ import main


def _read_contigs(path):
    headers, seqs, cur = [], [], []
    with gzip.open(path, "rt") as f:
        for line in f:
            if line.startswith(">"):
                headers.append(line.strip()[1:])
                if cur:
                    seqs.append("".join(cur))
                    cur = []
            else:
                cur.append(line.strip())
    if cur:
        seqs.append("".join(cur))
    return headers, seqs


def test_asm_single_circular_genome(tmp_path):
    fq = str(tmp_path / "reads.fastq.gz")
    genome = datagen.make_test_fastq(fq, genome_len=80_000, coverage=20,
                                     mean_length=8000, error_rate=0.002,
                                     seed=9)
    out = str(tmp_path / "out")
    main(["asm", "--out-dir", out, "--in-hifi", fq])

    headers, seqs = _read_contigs(os.path.join(out, "contigs.fasta.gz"))
    assert len(seqs) == 1
    assert "circular=yes" in headers[0]
    # full-length recovery (within the circular-trim margin)
    assert abs(len(seqs[0]) - genome.shape[0]) < 2000

    # polished accuracy: the contig is an EXACT substring of the (doubled,
    # for rotation) genome — error-free assembly
    g = genome.tobytes().decode()
    gg = g + g
    contig = seqs[0]
    rc = contig.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    assert contig in gg or rc in gg


def test_asm_ont_single_circular_genome(tmp_path):
    """ONT path end-to-end (correction + tiling + POA polish): error-free
    contig from 1.2%-error reads with indels."""
    fq = str(tmp_path / "reads.fastq.gz")
    genome = datagen.random_genome(70_000, seed=31)
    datagen.write_fastq(fq, datagen.sample_reads(
        genome, coverage=35, mean_length=8000, error_rate=0.005,
        ins_rate=0.0035, del_rate=0.0035, seed=32, mean_quality=22))
    out = str(tmp_path / "out")
    main(["asm", "--out-dir", out, "--in-ont", fq])

    headers, seqs = _read_contigs(os.path.join(out, "contigs.fasta.gz"))
    assert len(seqs) == 1
    assert "circular=yes" in headers[0]
    assert abs(len(seqs[0]) - genome.shape[0]) < 2000
    g = genome.tobytes().decode()
    gg = g + g
    contig = seqs[0]
    rc = contig.translate(str.maketrans("ACGT", "TGCA"))[::-1]
    assert contig in gg or rc in gg


def test_asm_resume_from_checkpoints(tmp_path):
    fq = str(tmp_path / "reads.fastq.gz")
    datagen.make_test_fastq(fq, genome_len=40_000, coverage=15,
                            mean_length=6000, error_rate=0.002, seed=10)
    out = str(tmp_path / "out")
    main(["asm", "--out-dir", out, "--in-hifi", fq, "--max-k", "8"])
    first = _read_contigs(os.path.join(out, "contigs.fasta.gz"))
    # delete the final artifact and resume: checkpointed stages are skipped
    os.remove(os.path.join(out, "contigs.fasta.gz"))
    os.remove(os.path.join(out, "tmp", "checkpoints", "toBasespace.checkpoint"))
    main(["asm", "--out-dir", out, "--in-hifi", fq, "--max-k", "8"])
    second = _read_contigs(os.path.join(out, "contigs.fasta.gz"))
    assert first == second


def test_gfa_and_map_subcommands(tmp_path):
    """gfa export + map coloring on a finished assembly."""
    fq = str(tmp_path / "reads.fastq.gz")
    genome = datagen.make_test_fastq(fq, genome_len=40_000, coverage=15,
                                     mean_length=6000, error_rate=0.002,
                                     seed=21)
    out = str(tmp_path / "out")
    main(["asm", "--out-dir", out, "--in-hifi", fq])

    from metamdbg_tpu.pipeline.gfa import available_ks
    ks = available_ks(os.path.join(out, "tmp"))
    assert ks, "no pass_k snapshots saved"
    k = ks[0]
    main(["gfa", out, str(k)])
    gfa_path = os.path.join(out, f"assemblyGraph_k{k}.gfa")
    assert os.path.exists(gfa_path)
    seg_lines = [ln for ln in open(gfa_path) if ln.startswith("S\t")]
    assert seg_lines
    # at least one segment carries a real sequence
    assert any(set(ln.split("\t")[2]) <= set("ACGT") and len(ln.split("\t")[2]) > 50
               for ln in seg_lines)

    ref_fa = str(tmp_path / "ref.fasta")
    with open(ref_fa, "w") as f:
        f.write(">genome\n" + genome.tobytes().decode() + "\n")
    main(["map", out, str(k), "--references", ref_fa])
    color_csv = os.path.join(out, f"assemblyGraph_k{k}.contigColor.csv")
    lines = open(color_csv).read().splitlines()
    assert lines[0] == "Name,Color"
    assert len(lines) > 1, "no unitigs colored by the reference"
    named = set(ln.split(",")[0] for ln in lines[1:])
    seg_names = set(ln.split("\t")[1] for ln in seg_lines)
    assert named <= seg_names
