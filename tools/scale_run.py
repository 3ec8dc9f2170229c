"""Scale harness (VERDICT r4 item #2): assemble ~1 Gbp HiFi and ~0.5 Gbp
ONT synthetic metagenomes on this box with the memory-bounded paths forced
to fire, next to the reference binary on the same inputs, and record
SCALE_r04.json (wall, stage split, peak RSS, contig quality vs truth,
which bounded paths executed).

Usage: python tools/scale_run.py [hifi|ont|report] ...
  generate+run is resumable per platform; `report` collates the JSON.
"""

import json
import os
import re
import resource
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))
SCRATCH = os.path.join(ROOT, "scratch", "scale_r04")
REF_BIN = os.path.join(ROOT, ".refbuild", "build", "bin", "metaMDBG")
OUT_JSON = os.path.join(ROOT, "SCALE_r04.json")

# force every bounded path on inputs this size (minimizer space is ~200x
# smaller than base space, so the triggers must be far below the
# production 20 GB / model / 4 GB defaults):
BOUND_ENV = {
    "METAMDBG_TPU_COUNT_TABLE_GB": "0.02",     # chunked first-pass counting
    "METAMDBG_TPU_CORRECTION_MEMORY_GB": "0.1",  # multi-partition correction
    "METAMDBG_TPU_MAX_PARTITION_GB": "0.5",    # multi-partition polishing
}

DATASETS = {
    # ~40 Mb of genomes x ~25x = ~1.0 Gbp HiFi reads
    "hifi": dict(sizes=[6_000_000, 5_000_000, 4_500_000, 4_000_000,
                        3_500_000, 3_000_000, 2_500_000, 2_500_000,
                        2_000_000, 2_000_000, 1_500_000, 1_500_000,
                        1_000_000, 1_000_000],
                 coverages=[25, 30, 20, 28, 35, 22, 40, 18, 25, 30, 45, 15,
                            50, 20],
                 error_rate=0.001, ins=0.0, dele=0.0, mean_q=30,
                 mean_len=10_000, flag="--in-hifi", seed=101),
    # ~20 Mb of genomes x ~25x = ~0.5 Gbp ONT reads
    "ont": dict(sizes=[5_000_000, 4_000_000, 3_500_000, 3_000_000,
                       2_500_000, 2_000_000],
                coverages=[25, 30, 22, 28, 35, 20],
                error_rate=0.01, ins=0.004, dele=0.004, mean_q=20,
                mean_len=8_000, flag="--in-ont", seed=201),
}


def _gen(platform):
    import datagen
    cfg = DATASETS[platform]
    os.makedirs(SCRATCH, exist_ok=True)
    fq = os.path.join(SCRATCH, f"{platform}_reads.fastq.gz")
    gnp = os.path.join(SCRATCH, f"{platform}_genomes.npz")
    if os.path.exists(fq) and os.path.exists(gnp):
        return fq, gnp
    print(f"[scale] generating {platform} dataset ...", flush=True)
    genomes = datagen.make_metagenome(n_genomes=len(cfg["sizes"]),
                                      sizes=cfg["sizes"], seed=cfg["seed"])
    import gzip

    import numpy as np
    t0 = time.time()
    with gzip.open(fq + ".tmp", "wb", compresslevel=1) as f:
        for header, seq, qual in datagen.metagenome_reads(
                genomes, cfg["coverages"], mean_length=cfg["mean_len"],
                error_rate=cfg["error_rate"], seed=cfg["seed"] + 1,
                ins_rate=cfg["ins"], del_rate=cfg["dele"],
                mean_quality=cfg["mean_q"]):
            f.write(b"@" + header.encode() + b"\n")
            f.write(seq.tobytes() + b"\n+\n")
            f.write(qual.tobytes() + b"\n")
    os.rename(fq + ".tmp", fq)
    np.savez_compressed(gnp, **{f"g{i}": g for i, g in enumerate(genomes)})
    print(f"[scale] generated in {time.time()-t0:.0f}s", flush=True)
    return fq, gnp


def _peak_rss_gb(usage):
    return round(usage.ru_maxrss / 1e6, 2)


def _run(cmd, env=None, log=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    t0 = time.time()
    with open(log, "wb") as lf:
        r = subprocess.run(cmd, env=e, stdout=lf, stderr=subprocess.STDOUT,
                           cwd=ROOT)
    assert r.returncode == 0, f"{cmd} failed (see {log})"
    return time.time() - t0


def _stage_split(tmp_dir):
    out = {}
    track = os.path.join(tmp_dir, "memoryTrack.txt")
    peak = 0.0
    if os.path.exists(track):
        for line in open(track):
            parts = line.split("\t")
            if len(parts) < 3:
                continue
            name, secs = parts[0], float(parts[1].rstrip("s"))
            peak = max(peak, float(parts[2].rstrip("GB\n")))
            key = ("readSelection" if name == "readSelection" else
                   "readCorrection" if name == "readCorrection" else
                   "toBasespace" if name == "toBasespace" else
                   "postprocess" if name.startswith(("derep", "remove")) else
                   "graph")
            out[key] = round(out.get(key, 0.0) + secs, 1)
    return out, peak


def _bounded_evidence(log_path):
    """Which bounded paths actually fired, parsed from the run log."""
    txt = open(log_path, "rb").read().decode(errors="replace")
    n_parts = re.findall(r"Processing partition (\d+)/(\d+)", txt)
    corr = re.search(r"correction partitions: (\d+)", txt)
    return {
        "counting_chunked": "bounded k-min-mer counting" in txt,
        "correction_partitions": int(corr.group(1)) if corr else None,
        "polish_partitions": max((int(b) for _a, b in n_parts), default=1),
    }


def _metrics(contig_path, genomes_npz):
    import numpy as np
    import quality
    contigs = quality.load_fasta_gz(contig_path)
    gz = np.load(genomes_npz)
    genomes = [gz[k] for k in sorted(gz.files)]
    return quality.assembly_metrics(contigs, genomes)


def run_platform(platform):
    cfg = DATASETS[platform]
    fq, gnp = _gen(platform)
    result = {}

    ours_dir = os.path.join(SCRATCH, f"{platform}_ours")
    log = os.path.join(SCRATCH, f"{platform}_ours.log")
    if not os.path.exists(os.path.join(ours_dir, "contigs.fasta.gz")):
        subprocess.run(["rm", "-rf", ours_dir])
        env = dict(BOUND_ENV)
        env["METAMDBG_TPU_HOST_ONLY"] = "1"
        wall = _run([sys.executable, "-m", "metamdbg_tpu", "asm",
                     "--out-dir", ours_dir, cfg["flag"], fq,
                     "--threads", "2"], env=env, log=log)
        json.dump({"wall_s": round(wall, 1)},
                  open(os.path.join(ours_dir, "wall.json"), "w"))
    wall = json.load(open(os.path.join(ours_dir, "wall.json")))["wall_s"]
    split, peak = _stage_split(os.path.join(ours_dir, "tmp"))
    result["ours"] = dict(
        wall_s=wall, stage_split_s=split, peak_rss_gb=peak,
        bounded_paths=_bounded_evidence(log),
        **_metrics(os.path.join(ours_dir, "contigs.fasta.gz"), gnp))

    ref_dir = os.path.join(SCRATCH, f"{platform}_ref")
    ref_log = os.path.join(SCRATCH, f"{platform}_ref.log")
    if os.path.exists(REF_BIN):
        if not os.path.exists(os.path.join(ref_dir, "contigs.fasta.gz")):
            subprocess.run(["rm", "-rf", ref_dir])
            wall = _run([REF_BIN, "asm", "--out-dir", ref_dir, cfg["flag"],
                         fq, "--threads", "2"], log=ref_log)
            json.dump({"wall_s": round(wall, 1)},
                      open(os.path.join(ref_dir, "wall.json"), "w"))
        wall = json.load(open(os.path.join(ref_dir, "wall.json")))["wall_s"]
        result["reference"] = dict(
            wall_s=wall,
            **_metrics(os.path.join(ref_dir, "contigs.fasta.gz"), gnp))

    out = {}
    if os.path.exists(OUT_JSON):
        out = json.load(open(OUT_JSON))
    out[platform] = result
    out["note"] = ("bounds forced low (count table 0.25 GB, correction "
                   "1 GB, polish partition 1.5 GB) so every memory-bounded "
                   "path executes; host_cores=2; METAMDBG_TPU_HOST_ONLY")
    json.dump(out, open(OUT_JSON, "w"), indent=1)
    print(json.dumps({platform: result}, indent=1))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "hifi"
    if which == "report":
        print(open(OUT_JSON).read())
    else:
        run_platform(which)
