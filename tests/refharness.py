"""Harness to run the reference binary's subcommands for golden-parity tests.

The reference is built out-of-tree at .refbuild/src/build/bin/metaMDBG
(gitignored). Each stage subcommand is driven exactly as the reference's own
orchestrator drives it (src/pipeline/AssemblyPipeline.hpp:733-991).
"""

import os
import subprocess

REF_BIN = os.path.join(os.path.dirname(__file__), os.pardir,
                       ".refbuild", "src", "build", "bin", "metaMDBG")


def ref_available() -> bool:
    return os.path.exists(REF_BIN)


def setup_tmpdir(tmp_dir: str, fastq_paths, params) -> None:
    """Create tmp dir with input.txt + parameters.gz as the orchestrator would."""
    os.makedirs(tmp_dir, exist_ok=True)
    with open(os.path.join(tmp_dir, "input.txt"), "w") as f:
        for p in fastq_paths:
            f.write(os.path.abspath(p) + "\n")
    params.save(os.path.join(tmp_dir, "parameters.gz"))


def run_read_selection(tmp_dir: str, min_read_quality: float = 0.0,
                       skip_correction: bool = True, threads: int = 1):
    """`metaMDBG readSelection` (AssemblyPipeline.hpp:733-737)."""
    cmd = [REF_BIN, "readSelection", tmp_dir,
           os.path.join(tmp_dir, "read_data_init.txt"),
           os.path.join(tmp_dir, "input.txt"),
           "--threads", str(threads),
           "--min-read-quality", str(min_read_quality)]
    if skip_correction:
        cmd.append("--skip-correction")
    subprocess.run(cmd, check=True, capture_output=True)


def run_graph(tmp_dir: str, first_pass: bool, min_abundance: int = 0,
              threads: int = 2):
    """`metaMDBG graph` (AssemblyPipeline.hpp:763-791)."""
    cmd = [REF_BIN, "graph", tmp_dir, "--threads", str(threads)]
    if first_pass:
        cmd += ["--min-abundance", str(min_abundance), "--firstpass"]
    subprocess.run(cmd, check=True, capture_output=True)


def run_contig(tmp_dir: str, threads: int = 2, final: bool = False,
               max_bubble: int = 50000, max_tip: int = 50000,
               gen_graph: bool = False):
    """`metaMDBG contig` (AssemblyPipeline.hpp:794-829)."""
    cmd = [REF_BIN, "contig", tmp_dir, "--threads", str(threads),
           "--max-bubble-length", str(max_bubble),
           "--max-tip-length", str(max_tip)]
    if gen_graph:
        cmd.append("--gen-graph")
    if final:
        cmd.append("--final")
    subprocess.run(cmd, check=True, capture_output=True)


def run_to_minspace(tmp_dir: str, nodepath: str, output: str, threads: int = 2):
    """`metaMDBG toMinspace` (AssemblyPipeline.hpp:841-864)."""
    cmd = [REF_BIN, "toMinspace", tmp_dir, nodepath, output,
           os.path.join(tmp_dir, "unitigGraph.nodes.bin"),
           "--threads", str(threads)]
    subprocess.run(cmd, check=True, capture_output=True)


def run_asm(out_dir: str, fastq_paths, platform: str = "hifi", threads: int = 2,
            extra=()):
    """Full `metaMDBG asm` pipeline."""
    flag = "--in-hifi" if platform == "hifi" else "--in-ont"
    cmd = [REF_BIN, "asm", "--out-dir", out_dir, flag, *map(str, fastq_paths),
           "--threads", str(threads), *extra]
    subprocess.run(cmd, check=True, capture_output=True)


def run_derep_small(tmp_dir: str, first_k: int, last_k: int, threads: int = 1):
    """`metaMDBG derepSmall` (AssemblyPipeline.hpp:882-896)."""
    cmd = [REF_BIN, "derepSmall", tmp_dir, "--threads", str(threads),
           "--first-k", str(first_k), "--last-k", str(last_k)]
    subprocess.run(cmd, check=True, capture_output=True)


def run_remove_overlaps(tmp_dir: str, threads: int = 1):
    cmd = [REF_BIN, "removeOverlaps", tmp_dir, "--threads", str(threads)]
    subprocess.run(cmd, check=True, capture_output=True)


def run_remove_repeats(tmp_dir: str, threads: int = 1):
    cmd = [REF_BIN, "removeRepeats", tmp_dir, "--threads", str(threads)]
    subprocess.run(cmd, check=True, capture_output=True)


def run_read_correction(tmp_dir: str, min_identity: float = 0.96,
                        min_overlap: int = 1000, threads: int = 1):
    """`metaMDBG readCorrection` (AssemblyPipeline.hpp:742-762). threads=1
    makes the corrected-record order deterministic."""
    cmd = [REF_BIN, "readCorrection", tmp_dir,
           "--min-identity", str(min_identity),
           "--min-overlap-length", str(min_overlap),
           "--threads", str(threads)]
    subprocess.run(cmd, check=True, capture_output=True)
