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


def run_graph_first_pass(out_dir: str, k: int, min_abundance: int = 0,
                         reads=None):
    """Returns the UnitigGraph; writes all stage artifacts into out_dir."""
    if reads is None:
        reads = load_minimizer_reads(os.path.join(out_dir, "read_data_corrected.txt"))

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
