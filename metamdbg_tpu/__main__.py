"""CLI: ``python -m metamdbg_tpu asm --out-dir DIR --in-hifi reads.fastq.gz``.

Mirrors the reference's `metaMDBG asm` interface
(src/pipeline/AssemblyPipeline.hpp:100-137).
"""

import argparse
import logging
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="metamdbg_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    asm = sub.add_parser("asm", help="assemble long reads")
    asm.add_argument("--out-dir", "-o", required=True)
    asm.add_argument("--in-hifi", nargs="+", default=None,
                     help="PacBio HiFi read filename(s)")
    asm.add_argument("--in-ont", nargs="+", default=None,
                     help="Nanopore R10.4+ read filename(s)")
    asm.add_argument("--threads", "-t", type=int, default=1)
    asm.add_argument("--min-read-quality", type=float, default=0.0)
    asm.add_argument("--min-contig-length", type=int, default=50)
    asm.add_argument("--min-contig-coverage", type=float, default=1)
    asm.add_argument("--k-min-size", type=int, default=15, dest="minimizer_size")
    asm.add_argument("--density-assembly", type=float, default=0.005)
    asm.add_argument("--density-correction", type=float, default=0.025)
    asm.add_argument("--max-k", type=int, default=0)
    asm.add_argument("--min-abundance", type=int, default=0)
    asm.add_argument("--max-bubble-length", type=int, default=50000)
    asm.add_argument("--max-tip-length", type=int, default=50000)
    asm.add_argument("--skip-correction", action="store_true")
    asm.add_argument("--all-assembly-graph", action="store_true",
                     help="generate assembly graph at each multi-k iteration"
                          " (higher disk usage)")

    gfa = sub.add_parser("gfa", help="export assembly graphs")
    gfa.add_argument("out_dir", help="assembly output dir (with tmp/)")
    gfa.add_argument("k", type=int, nargs="?", default=0,
                     help="k of the graph to export (0 = list available)")
    gfa.add_argument("--output", default=None)
    gfa.add_argument("--coverage", action="store_true",
                     help="recompute unitig coverage")
    gfa.add_argument("--readpath", action="store_true",
                     help="generate path of reads in the assembly graph")

    mp = sub.add_parser("map", help="color an assembly graph by references")
    mp.add_argument("out_dir", help="assembly output dir (with tmp/)")
    mp.add_argument("k", type=int, help="k of the saved graph to color")
    mp.add_argument("--references", nargs="+", required=True,
                    help="reference genome fasta file(s)")
    mp.add_argument("--output-prefix", default=None)

    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    if args.command == "asm":
        if bool(args.in_hifi) == bool(args.in_ont):
            parser.error("choose exactly one of --in-hifi / --in-ont")
        import os
        from metamdbg_tpu.pipeline.asm import Pipeline
        reads = args.in_hifi or args.in_ont
        missing = [r for r in reads if not os.path.isfile(r)]
        if missing:
            parser.error("read file not found: " + ", ".join(missing))
        platform = "hifi" if args.in_hifi else "ont"
        Pipeline(args.out_dir, reads, platform=platform,
                 min_read_quality=args.min_read_quality, max_k=args.max_k,
                 min_abundance=args.min_abundance,
                 max_bubble_length=args.max_bubble_length,
                 max_tip_length=args.max_tip_length,
                 minimizer_size=args.minimizer_size,
                 density_assembly=args.density_assembly,
                 density_correction=args.density_correction,
                 min_contig_length=args.min_contig_length,
                 min_contig_coverage=args.min_contig_coverage,
                 skip_correction=args.skip_correction,
                 all_assembly_graph=args.all_assembly_graph,
                 n_threads=args.threads).run()
        from metamdbg_tpu.utils import devwarm
        if devwarm.claim_pending() or devwarm.shadows_pending():
            # the background device claim blocks inside the PJRT client and
            # cannot be joined; interpreter teardown would abort in the
            # native wait ("FATAL: exception not rethrown"). All outputs
            # are flushed — exit the process directly.
            logging.shutdown()
            sys.stdout.flush()
            sys.stderr.flush()
            os._exit(0)
    elif args.command == "gfa":
        from metamdbg_tpu.pipeline.gfa import run_gfa
        run_gfa(args.out_dir, args.k, args.output,
                recompute_coverage=args.coverage, read_path=args.readpath)
    elif args.command == "map":
        from metamdbg_tpu.pipeline.mapref import run_map
        run_map(args.out_dir, args.k, args.references, args.output_prefix)
    return 0


if __name__ == "__main__":
    sys.exit(main())
