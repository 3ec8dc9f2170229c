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
    # keep tmp on the first run (like an interrupted run would): resume
    # needs the inter-stage artifacts that end-of-run cleanup removes
    os.environ["METAMDBG_TPU_KEEP_TMP"] = "1"
    try:
        main(["asm", "--out-dir", out, "--in-hifi", fq, "--max-k", "8"])
        first = _read_contigs(os.path.join(out, "contigs.fasta.gz"))
        # delete the final artifact and resume: checkpointed stages are
        # skipped
        os.remove(os.path.join(out, "contigs.fasta.gz"))
        os.remove(os.path.join(out, "tmp", "checkpoints",
                               "toBasespace.checkpoint"))
        main(["asm", "--out-dir", out, "--in-hifi", fq, "--max-k", "8"])
        second = _read_contigs(os.path.join(out, "contigs.fasta.gz"))
        assert first == second
    finally:
        os.environ.pop("METAMDBG_TPU_KEEP_TMP", None)


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
    # GenerateGfa surface: noseq graph, L-line base overlaps, contig path
    noseq_path = os.path.join(out, f"assemblyGraph_k{k}.noseq.gfa")
    assert os.path.exists(noseq_path)
    noseq_segs = [ln for ln in open(noseq_path) if ln.startswith("S\t")]
    assert len(noseq_segs) == len(seg_lines)
    assert all(ln.split("\t")[2] == "*" for ln in noseq_segs)
    link_lines = [ln for ln in open(gfa_path) if ln.startswith("L\t")]
    assert all(ln.rstrip().split("\t")[5].endswith("M") for ln in link_lines)
    cpath = os.path.join(out, f"assemblyGraph_k{k}_contigPath.tsv")
    cnames = os.path.join(out, f"assemblyGraph_k{k}_contigNames.csv")
    assert os.path.exists(cpath) and os.path.exists(cnames)
    cpath_lines = open(cpath).read().splitlines()
    assert cpath_lines and all(ln.startswith("ctg") for ln in cpath_lines)
    seg_names = set(ln.split("\t")[1] for ln in seg_lines)
    for ln in cpath_lines:
        assert set(ln.split("\t")[1:]) <= seg_names
    assert open(cnames).readline() == "Name,ContigName\n"

    # --coverage: recompute dp from k=4 k-min-mer abundances
    main(["gfa", out, str(k), "--coverage"])
    cov_segs = [ln for ln in open(gfa_path) if ln.startswith("S\t")]
    assert all("dp:i:" in ln for ln in cov_segs)

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


def test_asm_all_assembly_graph(tmp_path):
    """--all-assembly-graph snapshots the graph at every pass
    (AssemblyPipeline.hpp:492,834,1274-1280)."""
    fq = str(tmp_path / "reads.fastq.gz")
    datagen.make_test_fastq(fq, genome_len=30_000, coverage=15,
                            mean_length=6000, error_rate=0.001, seed=33)
    out = str(tmp_path / "out")
    main(["asm", "--out-dir", out, "--in-hifi", fq, "--max-k", "8",
          "--all-assembly-graph"])
    from metamdbg_tpu.pipeline.gfa import available_ks
    ks = available_ks(os.path.join(out, "tmp"))
    assert ks == [5, 6, 7, 8]
