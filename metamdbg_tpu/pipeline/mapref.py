"""`map` subcommand: color an exported assembly graph by reference genomes.

Plays the role of MappingContigToGraph (src/mapping/MappingContigToGraph.hpp:
104-360, the `map` dev tool): reference genome sequences are sketched at the
pass's parameters, each graph unitig is assigned the reference owning the
majority of its k-min-mers, and a Bandage-style `contigColor.csv`
(Name,Color) plus `contigName.csv` (Name,ReferenceName) are written next to
the graph.
"""

import logging
import os

import numpy as np

log = logging.getLogger("metamdbg_tpu")

PALETTE = ["#e6194b", "#3cb44b", "#4363d8", "#f58231", "#911eb4", "#46f0f0",
           "#f032e6", "#bcf60c", "#fabebe", "#008080", "#e6beff", "#9a6324",
           "#fffac8", "#800000", "#aaffc3", "#808000", "#ffd8b1", "#000075"]


def run_map(out_dir: str, k: int, reference_paths, output_prefix=None):
    from ..count.kminmers import extract_kminmers
    from ..io import fastq, records
    from ..io.records import load_repetitive_minimizers
    from ..sketch import kmers as _kmers
    from ..sketch import minimizers as _minimizers
    from ..sketch import rle as _rle
    from .gfa import available_ks

    tmp_dir = os.path.join(out_dir, "tmp")
    ks = available_ks(tmp_dir)
    if k not in ks:
        raise SystemExit(f"no assembly graph saved for k={k}; available: {ks}")
    pass_dir = os.path.join(tmp_dir, f"pass_k{k}")
    params = records.Parameters.load(os.path.join(pass_dir, "parameters.gz"))
    repetitive = np.sort(load_repetitive_minimizers(
        os.path.join(tmp_dir, "repetitiveMinimizers.bin")))
    if repetitive.size == 0:
        repetitive = None

    # reference k-min-mers -> reference index (ties: first reference)
    kminmer_to_ref: dict = {}
    ref_names = []
    for path in reference_paths:
        for read in fastq.iter_reads([path]):
            name = f"{os.path.basename(path)}:{read.index}"
            ref_index = len(ref_names)
            ref_names.append(name)
            seq_rle, _ = _rle.rle_encode(read.seq,
                                         params.use_homopolymer_compression)
            codes, bad = _kmers.base_codes(seq_rle)
            mins, _, _ = _minimizers.select_minimizers(
                codes, bad, params.minimizer_size, params.density_assembly,
                repetitive)
            rows, _ = extract_kminmers(mins, params.kminmer_size)
            for key in map(tuple, rows.tolist()):
                kminmer_to_ref.setdefault(key, ref_index)

    # unitig minimizer paths of the saved graph; the .unitigs records are in
    # the same order as the GFA's S lines, whose names we reuse
    unitigs_file = os.path.join(pass_dir, "assembly_graph.gfa.unitigs")
    from ..io import gfa as gfa_io
    seg_names = [s.name for s in gfa_io.iter_segments(
        os.path.join(pass_dir, "assembly_graph.gfa"))]
    if output_prefix is None:
        output_prefix = os.path.join(out_dir, f"assemblyGraph_k{k}")
    color_path = output_prefix + ".contigColor.csv"
    name_path = output_prefix + ".contigName.csv"
    n_colored = 0
    with open(color_path, "w") as cf, open(name_path, "w") as nf:
        cf.write("Name,Color\n")
        nf.write("Name,ReferenceName\n")
        for i, rec in enumerate(records.read_read_data(unitigs_file,
                                                       with_quality=False)):
            rows, _ = extract_kminmers(rec.minimizers, params.kminmer_size)
            counts: dict = {}
            for key in map(tuple, rows.tolist()):
                ref = kminmer_to_ref.get(key)
                if ref is not None:
                    counts[ref] = counts.get(ref, 0) + 1
            if not counts:
                continue
            best_ref = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            if counts[best_ref] * 2 <= max(rows.shape[0], 1):
                continue  # majority required
            seg = seg_names[i] if i < len(seg_names) else f"utg{i}"
            cf.write(f"{seg},{PALETTE[best_ref % len(PALETTE)]}\n")
            nf.write(f"{seg},{ref_names[best_ref]}\n")
            n_colored += 1
    log.info("map: %d unitigs colored -> %s", n_colored, color_path)
    return color_path, name_path
