"""10 Gbp scale harness (VERDICT r4 item #4).

Assembles a ~10.1 Gbp synthetic HiFi metagenome (30 genomes, 2-20 Mbp,
uneven 15-45x coverage) with the DEFAULT environment: no forced memory
bounds (the natural triggers decide), device-auto routing (the calibrated
policy decides). Records wall, stage split, peak RSS, device telemetry,
which bounded paths fired naturally, and contig quality vs the known
truth genomes.

The reference binary's wall at this scale (~4.7 h extrapolated from its
measured 1.69 ks/Gbp rate at 1.106 Gbp on this same 2-core box,
SCALE_r04.json) does not fit the round's clean-measurement window next to
our own run; `ref` can still be run explicitly when there is time. The
published reference envelope for real data is 18-103 Gbp at 1-8 h on 32
cores (/root/reference/results/perf.tsv:2-25).

Usage: python tools/scale10_run.py [gen|ours|ref|report]
"""

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tests"))
SCRATCH = os.path.join(ROOT, "scratch", "scale10")
REF_BIN = os.path.join(ROOT, ".refbuild", "build", "bin", "metaMDBG")
OUT_JSON = os.path.join(ROOT, "SCALE_r05.json")

# 30 genomes, 361 Mbp total; coverages tuned so sum(size*cov) ~= 10.14 Gbp
SIZES = [20, 18, 17, 16, 15, 15, 14, 14, 13, 13, 12, 12, 12, 11, 11,
         11, 10, 10, 10, 10, 9, 9, 9, 8, 8, 8, 7, 7, 6, 6]
SIZES = [s * 1_000_000 for s in SIZES]
COVERAGES = [26, 32, 23, 37, 30, 19, 42, 25, 34, 21, 48, 28, 16, 32, 23,
             40, 30, 19, 36, 25, 44, 21, 32, 28, 38, 17, 47, 25, 34, 30]
MEAN_LEN = 10_000
ERROR_RATE = 0.001
SEED = 501


def _paths():
    os.makedirs(SCRATCH, exist_ok=True)
    return (os.path.join(SCRATCH, "hifi10_reads.fastq.gz"),
            os.path.join(SCRATCH, "hifi10_genomes.npz"))


def gen():
    import gzip

    import numpy as np

    import datagen
    fq, gnp = _paths()
    if os.path.exists(fq) and os.path.exists(gnp):
        print("[scale10] dataset exists", flush=True)
        return fq, gnp
    total = sum(s * c for s, c in zip(SIZES, COVERAGES))
    print(f"[scale10] generating {total/1e9:.2f} Gbp ...", flush=True)
    genomes = datagen.make_metagenome(n_genomes=len(SIZES), sizes=SIZES,
                                      seed=SEED)
    t0 = time.time()
    written = 0
    with gzip.open(fq + ".tmp", "wb", compresslevel=1) as f:
        for header, seq, qual in datagen.metagenome_reads(
                genomes, COVERAGES, mean_length=MEAN_LEN,
                error_rate=ERROR_RATE, seed=SEED + 1, mean_quality=30):
            f.write(b"@" + header.encode() + b"\n")
            f.write(seq.tobytes() + b"\n+\n")
            f.write(qual.tobytes() + b"\n")
            written += seq.shape[0]
            if written % 500_000_000 < MEAN_LEN:
                print(f"[scale10] {written/1e9:.1f} Gbp "
                      f"({time.time()-t0:.0f}s)", flush=True)
    os.rename(fq + ".tmp", fq)
    np.savez_compressed(gnp, **{f"g{i:02d}": g
                                for i, g in enumerate(genomes)})
    print(f"[scale10] generated {written/1e9:.2f} Gbp in "
          f"{time.time()-t0:.0f}s", flush=True)
    return fq, gnp


def _run(cmd, env=None, log=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    t0 = time.time()
    with open(log, "wb") as lf:
        r = subprocess.run(cmd, env=e, stdout=lf, stderr=subprocess.STDOUT,
                           cwd=ROOT)
    if r.returncode != 0:
        raise RuntimeError(f"{cmd} failed (see {log})")
    return time.time() - t0


def _stage_split(tmp_dir):
    out = {}
    peak = 0.0
    track = os.path.join(tmp_dir, "memoryTrack.txt")
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


def ours():
    fq, gnp = gen()
    out_dir = os.path.join(SCRATCH, "ours")
    log = os.path.join(SCRATCH, "ours.log")
    seg_path = os.path.join(SCRATCH, "segments.json")
    if not os.path.exists(os.path.join(out_dir, "contigs.fasta.gz")):
        wall = _run([sys.executable, "-m", "metamdbg_tpu", "asm",
                     "--out-dir", out_dir, "--in-hifi", fq,
                     "--threads", "2"], env={}, log=log)
        segs = []
        if os.path.exists(seg_path):
            segs = json.load(open(seg_path))
        segs.append(round(wall, 1))
        json.dump(segs, open(seg_path, "w"))
        json.dump({"wall_s": round(sum(segs), 1), "segments_s": segs},
                  open(os.path.join(out_dir, "wall.json"), "w"))
    wj = json.load(open(os.path.join(out_dir, "wall.json")))
    wall = wj["wall_s"]
    split, peak = _stage_split(os.path.join(out_dir, "tmp"))
    dev = None
    try:
        dev = json.load(open(os.path.join(out_dir, "tmp", "device.json")))
    except (OSError, ValueError):
        pass
    total = sum(s * c for s, c in zip(SIZES, COVERAGES))
    result = dict(
        input_gbp=round(total / 1e9, 3), wall_s=wall,
        wall_segments_s=wj.get("segments_s"), stage_split_s=split,
        peak_rss_gb=peak, bounded_paths=_bounded_evidence(log),
        device_policy=dev, env="default (device-auto, natural bounds)",
        host_cores=os.cpu_count() or 1)
    print("[scale10] computing quality vs truth ...", flush=True)
    result.update(_metrics(os.path.join(out_dir, "contigs.fasta.gz"), gnp))
    _save("ours", result)
    # the reference binary was not run at this scale: two >4 h runs do not
    # fit one round's clean-measurement window on this box. Its wall is
    # extrapolated from its measured same-box 1.106 Gbp rate; quality is
    # judged against the synthetic truth genomes instead.
    _save("reference_extrapolated", {
        "wall_s": round(1859.8 / 1.106 * (total / 1e9), 0),
        "basis": "SCALE_r04 hifi reference: 1859.8 s / 1.106 Gbp on this "
                 "2-core box, scaled linearly to the input size",
        "published_envelope": "18-103 Gbp at 1-8 h on 32 cores "
                              "(reference results/perf.tsv)",
    })
    print(json.dumps(result, indent=1))


def ref():
    fq, gnp = gen()
    out_dir = os.path.join(SCRATCH, "ref")
    log = os.path.join(SCRATCH, "ref.log")
    if not os.path.exists(os.path.join(out_dir, "contigs.fasta.gz")):
        wall = _run([REF_BIN, "asm", "--out-dir", out_dir, "--in-hifi", fq,
                     "--threads", "2"], log=log)
        json.dump({"wall_s": round(wall, 1)},
                  open(os.path.join(out_dir, "wall.json"), "w"))
    wall = json.load(open(os.path.join(out_dir, "wall.json")))["wall_s"]
    result = dict(wall_s=wall)
    result.update(_metrics(os.path.join(out_dir, "contigs.fasta.gz"), gnp))
    _save("reference", result)
    print(json.dumps(result, indent=1))


def _save(key, result):
    out = {}
    if os.path.exists(OUT_JSON):
        out = json.load(open(OUT_JSON))
    section = out.setdefault("hifi_10gbp", {})
    section[key] = result
    json.dump(out, open(OUT_JSON, "w"), indent=1)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ours"
    if which == "gen":
        gen()
    elif which == "ours":
        ours()
    elif which == "ref":
        ref()
    elif which == "report":
        print(open(OUT_JSON).read())
