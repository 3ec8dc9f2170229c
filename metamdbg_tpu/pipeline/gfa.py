"""`gfa` subcommand: export assembly graphs saved during multi-k passes.

Mirrors GenerateGfa (src/graph/GenerateGfa.hpp:134-230) + ToBasespaceGfa
(unitig base sequences rebuilt from the original reads): with k=0, lists the
available checkpoints (k -> approx bp: 1/density*(k-1)+l); otherwise writes
`<out>` as a GFA whose S lines carry reconstructed unitig sequences.
"""

import logging
import os

import numpy as np

log = logging.getLogger("metamdbg_tpu")


def available_ks(tmp_dir: str) -> list:
    out = []
    for name in sorted(os.listdir(tmp_dir)):
        if name.startswith("pass_k") and \
                os.path.exists(os.path.join(tmp_dir, name, "assembly_graph.gfa")):
            out.append(int(name[len("pass_k"):]))
    return sorted(out)


def run_gfa(out_dir: str, k: int, output_path: str | None = None):
    from ..io import records
    from ..basespace import postprocess, reconstruct, tiling

    tmp_dir = os.path.join(out_dir, "tmp")
    ks = available_ks(tmp_dir)
    params = records.Parameters.load(os.path.join(tmp_dir, "parameters.gz"))
    if k == 0:
        print("Available assembly graphs (k -> approx k-min-mer span in bp):")
        for kk in ks:
            bp = int(1 / np.float32(params.density_assembly) * (kk - 1)
                     + params.minimizer_size)
            print(f"  k={kk}\t~{bp} bp")
        return ks

    if k not in ks:
        raise SystemExit(f"no assembly graph saved for k={k}; available: {ks}")

    pass_dir = os.path.join(tmp_dir, f"pass_k{k}")
    gfa_in = os.path.join(pass_dir, "assembly_graph.gfa")
    unitigs_file = os.path.join(pass_dir, "assembly_graph.gfa.unitigs")
    params = records.Parameters.load(os.path.join(pass_dir, "parameters.gz"))

    # map reads to the unitig minimizer sequences and rebuild base sequences
    aln_file = os.path.join(tmp_dir, "gfaAlignments.bin")
    postprocess.run_read_vs_contig_mapper(
        os.path.join(tmp_dir, "read_data_init.txt"), unitigs_file, aln_file)

    with open(os.path.join(tmp_dir, "input.txt")) as f:
        read_paths = [line.strip() for line in f if line.strip()]

    unitig_records = list(records.read_read_data(unitigs_file,
                                                 with_quality=False))
    per_unitig: dict = {i: [] for i in range(len(unitig_records))}
    needed = set()
    for al in postprocess.read_alignments(aln_file):
        per_unitig[al[1]].append(tiling.Mapping(al))
        needed.add(al[0])

    from ..io import fastq
    read_seqs = {}
    for read in fastq.iter_reads(read_paths):
        if read.index in needed:
            read_seqs[read.index] = read.seq

    avg_dist = float(1.0 / np.float32(params.density_assembly))
    sequences = {}
    for i, rec in enumerate(unitig_records):
        sequences[i] = reconstruct.reconstruct_unpolished(
            rec.minimizers, rec.is_circular, per_unitig[i], read_seqs,
            avg_dist)
    os.remove(aln_file)

    if output_path is None:
        output_path = os.path.join(out_dir, f"assemblyGraph_k{k}.gfa")
    with open(gfa_in) as fin, open(output_path, "w") as fout:
        s_index = 0
        for line in fin:
            if line.startswith("S\t"):
                fields = line.rstrip("\n").split("\t")
                seq = sequences.get(s_index)
                if seq is not None:
                    fields[2] = bytes(seq).decode()
                    fields[3] = f"LN:i:{len(seq)}"
                fout.write("\t".join(fields) + "\n")
                s_index += 1
            else:
                fout.write(line)
    log.info("Assembly graph written: %s", output_path)
    return output_path
