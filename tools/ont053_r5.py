"""0.53 Gbp ONT re-measure with the round-5 derep fix (VERDICT r4 #6).

Re-assembles the round-4 0.53 Gbp ONT dataset (scratch/scale_r04) with the
same env as the SCALE_r04 row (HOST_ONLY + forced-low bounds so every
memory-bounded path executes) and records wall, stage split, contig
inventory and quality vs truth into SCALE_r05.json["ont_0p53"]. The
reference row is carried from SCALE_r04.json (same input, same machine,
unchanged binary).
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))
SCRATCH = os.path.join(ROOT, "scratch", "scale_r04")
OUT_JSON = os.path.join(ROOT, "SCALE_r05.json")

ENV = {
    "METAMDBG_TPU_HOST_ONLY": "1",
    "METAMDBG_TPU_COUNT_TABLE_GB": "0.02",
    "METAMDBG_TPU_CORRECTION_MEMORY_GB": "0.1",
    "METAMDBG_TPU_MAX_PARTITION_GB": "0.5",
}


def main():
    fq = os.path.join(SCRATCH, "ont_reads.fastq.gz")
    gnp = os.path.join(SCRATCH, "ont_genomes.npz")
    out_dir = os.path.join(SCRATCH, "ont_ours_r5final")
    log = os.path.join(SCRATCH, "ont_ours_r5final.log")
    if not os.path.exists(os.path.join(out_dir, "contigs.fasta.gz")):
        subprocess.run(["rm", "-rf", out_dir], check=True)
        env = dict(os.environ)
        env.update(ENV)
        t0 = time.time()
        with open(log, "wb") as lf:
            r = subprocess.run(
                [sys.executable, "-m", "metamdbg_tpu", "asm", "--out-dir",
                 out_dir, "--in-ont", fq, "--threads", "2"], env=env,
                stdout=lf, stderr=subprocess.STDOUT, cwd=ROOT)
        if r.returncode != 0:
            raise RuntimeError(f"assembly failed, see {log}")
        json.dump({"wall_s": round(time.time() - t0, 1)},
                  open(os.path.join(out_dir, "wall.json"), "w"))
    wall = json.load(open(os.path.join(out_dir, "wall.json")))["wall_s"]

    import numpy as np

    import quality
    contigs = quality.load_fasta_gz(os.path.join(out_dir,
                                                 "contigs.fasta.gz"))
    gz = np.load(gnp)
    genomes = [gz[k] for k in sorted(gz.files)]
    m = quality.assembly_metrics(contigs, genomes)

    ref = None
    try:
        ref = json.load(open(os.path.join(ROOT, "SCALE_r04.json")))[
            "ont"]["reference"]
    except (OSError, KeyError, ValueError):
        pass

    out = {}
    if os.path.exists(OUT_JSON):
        out = json.load(open(OUT_JSON))
    out["ont_0p53"] = {
        "ours": dict(wall_s=wall, **m),
        "reference": ref,
        "note": "round-5 rerun with the strict-containment derep; same "
                "input/env as the SCALE_r04 ont row (HOST_ONLY, forced-low "
                "bounds); reference row carried from SCALE_r04 (same "
                "machine + input, binary unchanged)",
    }
    json.dump(out, open(OUT_JSON, "w"), indent=1)
    print(json.dumps(out["ont_0p53"]["ours"], indent=1))


if __name__ == "__main__":
    main()
