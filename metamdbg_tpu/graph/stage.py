"""Stage `graph` (first pass): minimizer reads -> counted k-min-mers ->
compacted unitig graph, mirroring `metaMDBG graph --firstpass`
(src/graph/CreateMdbg.cpp:168-598)."""

import os
import shutil

import numpy as np

from ..count.kminmers import count_kminmers
from ..io import records
from . import gio, mdbg


def load_minimizer_reads(path: str):
    """Minimizer arrays from a read_data_corrected.txt-format file."""
    return [r.minimizers for r in records.read_read_data(path, with_quality=False)]


def run_graph_second_pass(out_dir: str, k: int, params: records.Parameters):
    """`metaMDBG graph` at k == firstK+1 (src/graph/CreateMdbg.cpp:386-416):
    full re-count over reads + previous contigs with refined abundances;
    no rescue.

    Mesh note (r4 decision): unlike the first pass, this stage gets no
    mesh path on purpose. Its abundances come from the refined-abundance
    index join, NOT from window counts, and its artifacts need the unique
    ROWS materialized host-side either way — a sharded count table here
    would compute counts nobody consumes. The mesh-capable stages are
    first-pass counting (count_kminmers_mesh) and the correction mapper's
    pair-table join (parallel/pair_join.py)."""
    import struct

    from ..count import refined as refined_mod
    from ..count.kminmers import batch_extract_kminmers, count_unique_rows

    reads = load_minimizer_reads(os.path.join(out_dir, "read_data_corrected.txt"))
    contigs = load_minimizer_reads(os.path.join(out_dir, "unitig_data.txt"))

    prev_keys, prev_counts = gio.read_kminmer_abundances(
        os.path.join(out_dir, "kminmerData_abundance_prev.txt"))
    prev_nodes = gio.read_unitig_nodes(
        os.path.join(out_dir, "unitigGraph_prev.nodes.bin"))
    refined_abundances = {}
    with open(os.path.join(out_dir, "unitigGraph.nodes.refined_abundances.bin"),
              "rb") as f:
        data = f.read()
    for name, ab in struct.iter_unpack("<II", data):
        refined_abundances[name] = ab
    index = refined_mod.RefinedAbundanceIndex.build(
        prev_keys, prev_counts, prev_nodes, refined_abundances, k - 1)

    rows, _, _, _ = batch_extract_kminmers(reads + contigs, k)
    uniq, _ = count_unique_rows(rows)
    abundances = index.refined_abundance_rows(uniq, k - 1)
    solid = abundances > 1
    all_rows = uniq[solid]
    all_counts = abundances[solid]

    gio.write_kminmer_rows(os.path.join(out_dir, "kminmerData_min.txt"), all_rows)
    gio.write_kminmer_abundances(os.path.join(out_dir, "kminmerData_abundance.txt"),
                                 all_rows, all_counts)
    shutil.copyfile(
        os.path.join(out_dir, "kminmerData_abundance.txt"),
        os.path.join(out_dir, f"kminmerData_abundance_init_k{k}.txt"))

    graph = mdbg.build_unitig_graph(all_rows, k)
    mdbg.compute_unitig_abundances(graph, all_rows, all_counts)

    gio.write_unitig_nodes(os.path.join(out_dir, "unitigGraph.nodes.bin"),
                           graph.sequences)
    gio.write_unitig_edges(os.path.join(out_dir, "unitigGraph.edges.successors.bin"),
                           graph.successors)
    gio.write_unitig_abundances(
        os.path.join(out_dir, "unitigGraph.nodes.abundances.bin"),
        graph.abundances)
    gio.write_unitig_stats(os.path.join(out_dir, "unitigGraph.stats.bin"),
                           graph.n_unitigs, graph.n_edges())
    open(os.path.join(out_dir, "smallContigs", f"smallContigs_k{k}.bin"),
         "wb").close()
    return graph


def run_graph_first_pass(out_dir: str, k: int, min_abundance: int = 0,
                         reads=None, mesh=None):
    """Returns the UnitigGraph; writes all stage artifacts into out_dir.

    With `mesh` (a >=2-device jax Mesh), first-pass counting runs the
    sharded count table (parallel/count_table.py, all_to_all hash routing);
    artifacts are byte-identical to the single-device path
    (tests/test_mesh_first_pass.py). This is the entry point
    `dryrun_multichip` exercises."""
    if reads is None:
        reads = load_minimizer_reads(os.path.join(out_dir, "read_data_corrected.txt"))

    if mesh is not None and mesh.devices.size > 1:
        from ..count.kminmers import count_kminmers_mesh
        counts = count_kminmers_mesh(mesh, reads, k, min_abundance)
    else:
        counts = count_kminmers(reads, k, min_abundance)

    gio.write_kminmer_rows(os.path.join(out_dir, "kminmerData_min.txt"),
                           counts["all_rows"])
    gio.write_kminmer_abundances(os.path.join(out_dir, "kminmerData_abundance.txt"),
                                 counts["all_rows"], counts["all_counts"])
    shutil.copyfile(os.path.join(out_dir, "kminmerData_abundance.txt"),
                    os.path.join(out_dir, "kminmerData_abundance_init.txt"))

    graph = mdbg.build_unitig_graph(counts["all_rows"], k)
    mdbg.compute_unitig_abundances(graph, counts["solid_rows"],
                                   counts["solid_counts"])

    gio.write_unitig_nodes(os.path.join(out_dir, "unitigGraph.nodes.bin"),
                           graph.sequences)
    gio.write_unitig_edges(os.path.join(out_dir, "unitigGraph.edges.successors.bin"),
                           graph.successors)
    gio.write_unitig_abundances(
        os.path.join(out_dir, "unitigGraph.nodes.abundances.bin"),
        graph.abundances)
    gio.write_unitig_stats(os.path.join(out_dir, "unitigGraph.stats.bin"),
                           graph.n_unitigs, graph.n_edges())

    os.makedirs(os.path.join(out_dir, "smallContigs"), exist_ok=True)
    open(os.path.join(out_dir, "smallContigs", f"smallContigs_k{k}.bin"),
         "wb").close()
    return graph
