"""Device-auto vs host-only A/B on the mid-size oracles (VERDICT r4 #1/#3).

Runs the 12 Mb HiFi (285 Mbp reads) and 86 Mbp ONT sets end-to-end twice
— default env (device-auto, calibrated routing) and
METAMDBG_TPU_HOST_ONLY=1 — sequentially on an otherwise idle box, and
records walls + device.json routing provenance into SCALE_r05.json under
"mode_ab". The round-4 failure this guards: the device-enabled default
path must never lose to host-only beyond noise (the calibrated gates
settle on whichever side measures faster; through this box's ~30 MB/s
relay that is host for base-space stages — the JSON shows the gates'
actual decisions).

Usage: python tools/scale_modes.py [hifi12|ont86|all]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_JSON = os.path.join(ROOT, "SCALE_r05.json")

DATASETS = {
    "hifi12": dict(reads=os.path.join(ROOT, "scratch", "scale12",
                                      "reads.fastq.gz"),
                   flag="--in-hifi"),
    "ont86": dict(reads=os.path.join(ROOT, "scratch", "ont3",
                                     "ont.fastq.gz"),
                  flag="--in-ont"),
}


def _run(tag, reads, flag, host_only):
    out_dir = os.path.join(ROOT, "scratch", "modeab",
                           f"{tag}_{'host' if host_only else 'auto'}")
    subprocess.run(["rm", "-rf", out_dir], check=True)
    env = dict(os.environ)
    env.pop("METAMDBG_TPU_HOST_ONLY", None)
    if host_only:
        env["METAMDBG_TPU_HOST_ONLY"] = "1"
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "metamdbg_tpu", "asm", "--out-dir", out_dir,
         flag, reads, "--threads", "2"], env=env, cwd=ROOT,
        capture_output=True)
    if r.returncode != 0:
        raise RuntimeError(r.stderr.decode(errors="replace")[-2000:])
    wall = round(time.time() - t0, 1)
    dev = None
    try:
        dev = json.load(open(os.path.join(out_dir, "tmp", "device.json")))
    except (OSError, ValueError):
        pass
    import gzip
    contigs = gzip.open(os.path.join(out_dir, "contigs.fasta.gz"),
                        "rb").read()
    return wall, dev, hash(contigs)


def run_set(tag):
    cfg = DATASETS[tag]
    wall_auto, dev_auto, h_auto = _run(tag, cfg["reads"], cfg["flag"],
                                       host_only=False)
    wall_host, dev_host, h_host = _run(tag, cfg["reads"], cfg["flag"],
                                       host_only=True)
    result = {
        "device_auto_wall_s": wall_auto,
        "host_only_wall_s": wall_host,
        "auto_vs_host": round(wall_host / wall_auto, 3),
        "outputs_identical": h_auto == h_host,
        "device_policy": dev_auto,
    }
    out = {}
    if os.path.exists(OUT_JSON):
        out = json.load(open(OUT_JSON))
    out.setdefault("mode_ab", {})[tag] = result
    json.dump(out, open(OUT_JSON, "w"), indent=1)
    print(json.dumps({tag: result}, indent=1))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for tag in (DATASETS if which == "all" else [which]):
        run_set(tag)
