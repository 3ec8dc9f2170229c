"""Bounded-path evidence at scale (VERDICT r4 item #2): on the 1.1 Gbp
HiFi scale run's kept read_data_init.txt, run first-pass counting with the
memory bound forced far below the table size and byte-compare every
artifact against the unbounded path. Appends the evidence to
SCALE_r04.json.

Usage: python tools/bounded_demo.py [read_data_init.txt path]
"""

import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT_JSON = os.path.join(ROOT, "SCALE_r04.json")

NAMES = ["kminmerData_min.txt", "kminmerData_abundance.txt",
         "unitigGraph.nodes.bin", "unitigGraph.edges.successors.bin",
         "unitigGraph.nodes.abundances.bin", "unitigGraph.stats.bin"]


def main():
    read_file = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "scratch", "scale_r04", "hifi_ours", "tmp",
        "read_data_init.txt")
    from metamdbg_tpu.count import kminmers
    from metamdbg_tpu.io import records

    reads = [r.minimizers for r in
             records.read_read_data(read_file, with_quality=True)]
    nb_mins = sum(r.shape[0] for r in reads)
    est = sum(max(0, m.shape[0] - 3) for m in reads) * 4 * 4
    bound = est // 8  # force ~8 chunks
    print(f"reads={len(reads)} minimizers={nb_mins} "
          f"table_est={est/1e9:.2f}GB bound={bound/1e9:.3f}GB", flush=True)

    results = {}
    walls = {}
    for tag, mtb in (("unbounded", None), ("bounded", bound)):
        with tempfile.TemporaryDirectory() as td:
            t0 = time.time()
            counts = kminmers.count_kminmers(reads, 4, 0,
                                             max_table_bytes=mtb)
            walls[tag] = round(time.time() - t0, 1)
            from metamdbg_tpu.graph import gio, mdbg
            gio.write_kminmer_rows(os.path.join(td, NAMES[0]),
                                   counts["all_rows"])
            gio.write_kminmer_abundances(os.path.join(td, NAMES[1]),
                                         counts["all_rows"],
                                         counts["all_counts"])
            graph = mdbg.build_unitig_graph(counts["all_rows"], 4)
            mdbg.compute_unitig_abundances(graph, counts["solid_rows"],
                                           counts["solid_counts"])
            gio.write_unitig_nodes(os.path.join(td, NAMES[2]),
                                   graph.sequences)
            gio.write_unitig_edges(os.path.join(td, NAMES[3]),
                                   graph.successors)
            gio.write_unitig_abundances(os.path.join(td, NAMES[4]),
                                        graph.abundances)
            gio.write_unitig_stats(os.path.join(td, NAMES[5]),
                                   graph.n_unitigs, graph.n_edges())
            results[tag] = {n: open(os.path.join(td, n), "rb").read()
                            for n in NAMES}

    identical = all(results["unbounded"][n] == results["bounded"][n]
                    for n in NAMES)
    assert identical, "bounded counting must be byte-identical"
    out = json.load(open(OUT_JSON)) if os.path.exists(OUT_JSON) else {}
    out.setdefault("hifi", {})["bounded_counting_demo"] = {
        "input_minimizers": nb_mins,
        "table_bytes_estimate": est,
        "forced_bound_bytes": bound,
        "artifacts_byte_identical": identical,
        "wall_s": walls,
    }
    json.dump(out, open(OUT_JSON, "w"), indent=1)
    print(json.dumps(out["hifi"]["bounded_counting_demo"], indent=1))


if __name__ == "__main__":
    main()
