"""`gfa` subcommand: export assembly graphs saved during multi-k passes.

Mirrors GenerateGfa (src/graph/GenerateGfa.hpp:134-230,414-560,653-786,883-1010)
+ ToBasespaceGfa (unitig base sequences rebuilt from the original reads):

- ``k=0``: list available checkpoints (k -> approx bp: 1/density*(k-1)+l);
- else write ``assemblyGraph_k<k>.gfa`` (S lines carry reconstructed unitig
  sequences, dp coverage; L lines carry base-space overlap sizes computed
  from the unitig sequence minimizers, GenerateGfa.hpp:395-406,540-580),
  ``assemblyGraph_k<k>.noseq.gfa`` (S sequences replaced by ``*``),
  ``assemblyGraph_k<k>_contigPath.tsv`` + ``_contigNames.csv`` (final contigs
  mapped onto the graph's unitigs, GenerateGfa.hpp:653-786 — v1.4 generates
  the contig path unconditionally, GenerateGfa.hpp:105-108);
- ``--coverage``: recompute unitig dp from k=4 k-min-mer abundances
  (GenerateGfa.hpp:883-1010).
"""

import logging
import os

import numpy as np

log = logging.getLogger("metamdbg_tpu")


def available_ks(tmp_dir: str) -> list:
    """getAvailableKValues (GenerateGfa.hpp:237-267): pass_k dirs holding an
    assembly_graph.gfa.unitigs file."""
    out = []
    for name in sorted(os.listdir(tmp_dir)):
        if name.startswith("pass_k") and os.path.exists(
                os.path.join(tmp_dir, name, "assembly_graph.gfa.unitigs")):
            out.append(int(name[len("pass_k"):]))
    return sorted(out)


def _unitig_minimizers(seq: np.ndarray, params, repetitive):
    """LoadUnitigsFunctor (GenerateGfa.hpp:358-420): RLE + minimizer parse
    with _trimBps=0; returns (minimizers, rle positions of each minimizer's
    original start, rle_positions array)."""
    from ..sketch import kmers, minimizers, rle

    rle_seq, rle_pos = rle.rle_encode(np.asarray(seq, np.uint8),
                                      params.use_homopolymer_compression)
    codes, bad = kmers.base_codes(rle_seq)
    mins, pos, _ = minimizers.select_minimizers(
        codes, bad, params.minimizer_size, params.density_assembly,
        repetitive=repetitive, trim=0)
    return mins, pos, rle_pos


def _unitig_overlaps(seq, params, repetitive):
    """Base-space overlap spans of a unitig's two ends
    (GenerateGfa.hpp:395-406)."""
    k = params.kminmer_size
    mins, pos, rle_pos = _unitig_minimizers(seq, params, repetitive)
    if mins.shape[0] < k:
        return 0, 0
    ovl_plus = int(len(seq)) - int(rle_pos[int(pos[mins.shape[0] - k + 1])])
    ovl_minus = int(rle_pos[int(pos[k - 2]) + params.minimizer_size])
    return ovl_plus, ovl_minus


def _recomputed_coverages(tmp_dir: str, unitig_records) -> list:
    """computeUnitigCoverage (GenerateGfa.hpp:883-1010): mean k=4 k-min-mer
    abundance per unitig, missing k-min-mers counted as 1."""
    from ..count.kminmers import extract_kminmers
    from ..utils.hashing import kminmer_hash128

    table: dict = {}
    path = os.path.join(tmp_dir, "kminmerData_abundance_init.txt")
    with open(path, "rb") as f:
        data = f.read()
    rec = np.frombuffer(data, dtype=np.dtype([("lo", "<u8"), ("hi", "<u8"),
                                              ("count", "<u4")]))
    for lo, hi, count in rec:
        if count <= 1:
            continue
        table[(int(hi), int(lo))] = int(count)

    coverages = []
    for r in unitig_records:
        windows, _ = extract_kminmers(np.asarray(r.minimizers, np.uint32), 4)
        if windows.shape[0] == 0:
            coverages.append(1.0)
            continue
        hashes = kminmer_hash128(windows)
        total = 0.0
        for h1, h2 in hashes:
            total += table.get((int(h1), int(h2)), 1)
        coverages.append(total / windows.shape[0])
    return coverages


def _generate_contig_path(tmp_dir: str, out_prefix: str, params,
                          unitig_records, utg_names: list):
    """generateContigPath (GenerateGfa.hpp:653-786): walk each final contig's
    k-min-mers, map to graph unitigs (named per the GFA S line at the same
    position, _unitigOrderRev GenerateGfa.hpp:489), dedupe consecutive
    repeats."""
    from ..count.kminmers import extract_kminmers
    from ..io import records

    contig_data = os.path.join(tmp_dir, "contig_data_final.bin")
    if not os.path.exists(contig_data):
        log.info("Can't find contig data at location: %s", contig_data)
        log.info("Skip contig path")
        return None

    k = params.kminmer_size
    vec_to_unitig: dict = {}
    for i, rec in enumerate(unitig_records):
        windows, _ = extract_kminmers(np.asarray(rec.minimizers, np.uint32), k)
        for row in windows:
            vec_to_unitig[row.tobytes()] = i

    path_file = out_prefix + "_contigPath.tsv"
    name_file = out_prefix + "_contigNames.csv"
    with open(path_file, "w") as pf, open(name_file, "w") as nf:
        nf.write("Name,ContigName\n")
        for ci, rec in enumerate(
                records.read_read_data(contig_data, with_quality=False)):
            windows, _ = extract_kminmers(np.asarray(rec.minimizers,
                                                     np.uint32), k)
            prev = None
            path = []
            for row in windows:
                u = vec_to_unitig.get(row.tobytes())
                if u is None:
                    continue
                if u != prev:
                    prev = u
                    path.append(u)
            if not path:
                continue
            pf.write(f"ctg{ci}")
            for u in path:
                pf.write(f"\t{utg_names[u]}")
                nf.write(f"{utg_names[u]},ctg{ci}\n")
            pf.write("\n")
    return path_file, name_file


def _generate_read_path(tmp_dir: str, out_prefix: str, params,
                        unitig_records, utg_names: list):
    """Path of each read through the assembly graph
    (GenerateGfa::generateReadPath, GenerateGfa.hpp:796-876 — dormant in
    the reference v1.4 binary, implemented working here): walk each read's
    k-min-mers, map to graph unitigs, dedupe consecutive repeats."""
    from ..count.kminmers import extract_kminmers
    from ..io import records

    read_data = os.path.join(tmp_dir, "read_data_init.txt")
    if not os.path.exists(read_data):
        log.info("Can't find read data at location: %s", read_data)
        log.info("Skip read path")
        return None

    k = params.kminmer_size
    vec_to_unitig: dict = {}
    for i, rec in enumerate(unitig_records):
        windows, _ = extract_kminmers(np.asarray(rec.minimizers, np.uint32), k)
        for row in windows:
            vec_to_unitig[row.tobytes()] = i

    path_file = out_prefix + "_readPath.tsv"
    with open(path_file, "w") as pf:
        for rec in records.read_read_data(read_data, with_quality=True):
            windows, _ = extract_kminmers(np.asarray(rec.minimizers,
                                                     np.uint32), k)
            prev = None
            path = []
            for row in windows:
                u = vec_to_unitig.get(row.tobytes())
                if u is None:
                    continue
                if u != prev:
                    prev = u
                    path.append(u)
            if not path:
                continue
            pf.write(f"read{rec.index}")
            for u in path:
                pf.write(f"\t{utg_names[u]}")
            pf.write("\n")
    return path_file


def run_gfa(out_dir: str, k: int, output_path: str | None = None,
            recompute_coverage: bool = False, read_path: bool = False):
    from ..io import records
    from ..io.records import load_repetitive_minimizers
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
    repetitive = np.sort(load_repetitive_minimizers(
        os.path.join(tmp_dir, "repetitiveMinimizers.bin")))
    if repetitive.size == 0:
        repetitive = None

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
    for read in fastq.iter_reads(read_paths, need_headers=False):
        if read.index in needed:
            read_seqs[read.index] = read.seq

    avg_dist = float(1.0 / np.float32(params.density_assembly))
    sequences = {}
    overlaps = {}
    for i, rec in enumerate(unitig_records):
        seq = reconstruct.reconstruct_unpolished(
            rec.minimizers, rec.is_circular, per_unitig[i], read_seqs,
            avg_dist)
        sequences[i] = seq
        overlaps[i] = (_unitig_overlaps(seq, params, repetitive)
                       if seq is not None else (0, 0))
    os.remove(aln_file)

    coverages = (_recomputed_coverages(tmp_dir, unitig_records)
                 if recompute_coverage else None)

    if output_path is None:
        out_prefix = os.path.join(out_dir, f"assemblyGraph_k{k}")
        output_path = out_prefix + ".gfa"
    else:
        out_prefix = output_path[:-4] if output_path.endswith(".gfa") \
            else output_path
    noseq_path = out_prefix + ".noseq.gfa"

    # order index (S-line position) per utg name, as _unitigOrder
    # (GenerateGfa.hpp:484-490)
    from ..io import gfa as gfa_io
    utg_order: dict = {s.name: i
                       for i, s in enumerate(gfa_io.iter_segments(gfa_in))}

    # two passes like the reference: all S lines, then all L lines
    # (GenerateGfa.hpp:444-500 then 502-585); dp uses C++ to_string(float)
    # formatting (6 fixed decimals)
    with open(gfa_in) as fin, open(output_path, "w") as fout, \
            open(noseq_path, "w") as fnoseq:
        s_index = 0
        for line in fin:
            fields = line.rstrip("\n").split("\t")
            if fields[0] != "S":
                continue
            if coverages is not None:
                cov = float(coverages[s_index])
            else:
                cov = float(fields[4][5:])  # strip "dp:i:"
            seq = sequences.get(s_index)
            if seq is not None:
                seq_str = bytes(seq).decode()
                fout.write(f"S\t{fields[1]}\t{seq_str}\t"
                           f"LN:i:{len(seq_str)}\tdp:i:{cov:.6f}\n")
            else:
                fout.write("\t".join(fields[:4]) + f"\tdp:i:{cov:.6f}\n")
            fnoseq.write(f"S\t{fields[1]}\t*\t{fields[3]}\tdp:i:{cov:.6f}\n")
            s_index += 1
        fin.seek(0)
        for line in fin:
            fields = line.rstrip("\n").split("\t")
            if fields[0] != "L":
                continue
            oi_from = utg_order[fields[1]]
            oi_to = utg_order[fields[3]]
            plus_f, minus_f = overlaps.get(oi_from, (0, 0))
            plus_t, minus_t = overlaps.get(oi_to, (0, 0))
            ovl = plus_f if fields[2] == "+" else minus_f
            ovl = min(ovl, minus_t if fields[4] == "+" else plus_t)
            out_line = "\t".join(fields[:5]) + f"\t{ovl}M\n"
            fout.write(out_line)
            fnoseq.write(out_line)

    utg_names = [name for name, _ in
                 sorted(utg_order.items(), key=lambda kv: kv[1])]
    paths = _generate_contig_path(tmp_dir, out_prefix, params, unitig_records,
                                  utg_names)
    rpath = _generate_read_path(tmp_dir, out_prefix, params, unitig_records,
                                utg_names) if read_path else None

    log.info("Assembly graph: %s", output_path)
    log.info("Assembly graph (without sequences): %s", noseq_path)
    if paths:
        log.info("Contig path: %s", paths[0])
    if rpath:
        log.info("Read path: %s", rpath)
    log.info("Done!")
    return output_path
