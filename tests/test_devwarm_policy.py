"""Device-routing policy (utils/devwarm).

VERDICT r4 #1: the one-shot dispatch probe let a relay that congested
*after* startup crawl for nine minutes (BENCH_r04: ONT 538.5 s vs 13.9 s).
The policy now re-probes on a TTL, demotes mid-stage with backoff,
recovers when the tunnel clears, and calibrates per-context host/device
routing from measured batch walls. These tests pin each property, and the
end-to-end test injects congestion mid-run (METAMDBG_TPU_TEST_CONGEST_AT)
and requires the pipeline to fall back and still produce byte-identical
output."""

import logging
import time

import pytest

from metamdbg_tpu.utils import devwarm


@pytest.fixture
def reset_devwarm(monkeypatch):
    """Isolate each test from devwarm's module-level state."""
    monkeypatch.setattr(devwarm, "_ctx", {})
    monkeypatch.setattr(devwarm, "_healthy", False)
    monkeypatch.setattr(devwarm, "_next_probe_t", 0.0)
    monkeypatch.setattr(devwarm, "_backoff", 0.0)
    monkeypatch.setattr(devwarm, "_n_probes", 0)
    monkeypatch.setattr(devwarm, "_n_demotions", 0)
    monkeypatch.setattr(devwarm, "_n_recoveries", 0)
    monkeypatch.setattr(devwarm, "_last_roundtrip", None)
    monkeypatch.setattr(devwarm, "_failed", None)
    monkeypatch.delenv("METAMDBG_TPU_HOST_ONLY", raising=False)
    monkeypatch.delenv("METAMDBG_TPU_REQUIRE_DEVICE", raising=False)
    monkeypatch.delenv("METAMDBG_TPU_MAX_DISPATCH_S", raising=False)
    monkeypatch.delenv("METAMDBG_TPU_TEST_CONGEST_AT", raising=False)
    monkeypatch.setattr(devwarm, "device_ready",
                        lambda wait=False, timeout=None: True)
    return monkeypatch


def _fake_probe(monkeypatch, values):
    """Each _probe_roundtrip() call pops the next value (last repeats)."""
    seq = list(values)

    def probe():
        return seq.pop(0) if len(seq) > 1 else seq[0]

    monkeypatch.setattr(devwarm, "_probe_roundtrip", probe)


def test_fast_roundtrip_keeps_device(reset_devwarm):
    _fake_probe(reset_devwarm, [0.004])
    assert devwarm.use_device("t-ctx") is True
    assert devwarm.telemetry()["healthy"] is True


def test_slow_roundtrip_falls_back_and_warns_once(reset_devwarm, caplog):
    _fake_probe(reset_devwarm, [0.004, 3.2])
    with caplog.at_level(logging.WARNING, logger="metamdbg_tpu"):
        assert devwarm.use_device("t-ctx") is True   # healthy probe
        devwarm._next_probe_t = 0.0                  # TTL expires
        assert devwarm.use_device("t-ctx") is False  # congested -> demote
        assert devwarm.use_device("t-ctx") is False  # backoff: no re-probe
    assert sum("congested tunnel" in r.message for r in caplog.records) == 1
    tel = devwarm.telemetry()
    assert tel["demotions"] == 1 and tel["healthy"] is False


def test_recovery_after_congestion_clears(reset_devwarm, caplog):
    _fake_probe(reset_devwarm, [3.2, 0.004])
    assert devwarm.use_device("t-ctx") is False
    devwarm._next_probe_t = 0.0  # backoff expires, tunnel now clear
    with caplog.at_level(logging.INFO, logger="metamdbg_tpu"):
        assert devwarm.use_device("t-ctx") is True
    assert devwarm.telemetry()["recoveries"] == 1


def test_mid_stage_demotion_bounded_by_ttl(reset_devwarm):
    """A probe that passes at claim time must NOT be trusted forever: once
    the TTL passes, a now-congested relay demotes on the next consult."""
    times = iter([0.004, 5.0, 5.0, 5.0])
    reset_devwarm.setattr(devwarm, "_probe_roundtrip",
                          lambda: next(times))
    reset_devwarm.setenv("METAMDBG_TPU_PROBE_TTL_S", "0.05")
    assert devwarm.use_device("t-ctx") is True
    time.sleep(0.06)
    assert devwarm.use_device("t-ctx") is False


def test_require_device_overrides_slow_gate(reset_devwarm):
    _fake_probe(reset_devwarm, [3.2])
    reset_devwarm.setenv("METAMDBG_TPU_REQUIRE_DEVICE", "1")
    assert devwarm.use_device("t-ctx") is True
    with devwarm.gate("t-ctx", 100) as g:
        assert g.device is True


def test_host_only_never_probes(reset_devwarm):
    def boom():
        raise AssertionError("probe must not run under HOST_ONLY")

    reset_devwarm.setattr(devwarm, "_probe_roundtrip", boom)
    reset_devwarm.setenv("METAMDBG_TPU_HOST_ONLY", "1")
    assert devwarm.use_device("t-ctx") is False
    with devwarm.gate("t-ctx", 100) as g:
        assert g.device is False


def test_env_bound_override(reset_devwarm):
    _fake_probe(reset_devwarm, [0.5])
    reset_devwarm.setenv("METAMDBG_TPU_MAX_DISPATCH_S", "1.0")
    assert devwarm.use_device("t-ctx") is True


def test_gate_calibrates_then_picks_faster_mode(reset_devwarm):
    _fake_probe(reset_devwarm, [0.004])
    modes = []
    # device batches measure 10x slower per item than host batches
    for _ in range(devwarm._CAL_BATCHES * 2):
        with devwarm.gate("cal-ctx", 1000) as g:
            modes.append(g.device)
            time.sleep(0.01 if g.device else 0.001)
    # calibration interleaved both modes
    assert any(modes) and not all(modes)
    # steady state: host wins (device is 10x slower)
    decisions = []
    for _ in range(8):
        with devwarm.gate("cal-ctx", 1000) as g:
            decisions.append(g.device)
            time.sleep(0.01 if g.device else 0.001)
    assert not any(decisions)
    tel = devwarm.telemetry()["contexts"]["cal-ctx"]
    assert tel["host_batches"] > tel["device_batches"]


def test_gate_prefers_device_when_measured_faster(reset_devwarm):
    _fake_probe(reset_devwarm, [0.004])
    for _ in range(devwarm._CAL_BATCHES * 2):
        with devwarm.gate("dev-ctx", 1000) as g:
            time.sleep(0.001 if g.device else 0.01)
    decisions = []
    for _ in range(8):
        with devwarm.gate("dev-ctx", 1000) as g:
            decisions.append(g.device)
            time.sleep(0.001 if g.device else 0.01)
    assert all(decisions)


def test_gate_explores_losing_mode(reset_devwarm):
    _fake_probe(reset_devwarm, [0.004])
    for _ in range(devwarm._CAL_BATCHES * 2):
        with devwarm.gate("ex-ctx", 1000) as g:
            time.sleep(0.004 if g.device else 0.001)
    seen_device = 0
    for _ in range(devwarm._EXPLORE_EVERY + 2):
        with devwarm.gate("ex-ctx", 1000) as g:
            seen_device += g.device
            time.sleep(0.004 if g.device else 0.001)
    assert seen_device >= 1  # the loser is re-tried periodically


def test_forced_congestion_mid_run_falls_back_end_to_end(tmp_path):
    """VERDICT r4 #1 'Done' criterion: inject relay congestion MID-RUN and
    require (a) the policy to demote the device while stages are running,
    (b) the assembly to complete without crawling, and (c) the output to be
    byte-identical to a pure host run (the twins are bit-identical, so the
    fallback is free)."""
    import gzip
    import os
    import subprocess
    import sys
    import time as _time

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import datagen

    reads = tmp_path / "reads.fastq.gz"
    genome = datagen.random_genome(400_000, seed=31)
    datagen.write_fastq(str(reads), datagen.sample_reads(
        genome, 22, 9_000, 0.001, seed=32))

    def run(tag, extra_env):
        out = tmp_path / tag
        env = dict(os.environ)
        env.pop("METAMDBG_TPU_REQUIRE_DEVICE", None)
        env.pop("METAMDBG_TPU_HOST_ONLY", None)
        env.update(extra_env)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        subprocess.run(
            [sys.executable, "-m", "metamdbg_tpu", "asm", "--out-dir",
             str(out), "--in-hifi", str(reads), "--threads", "2"],
            check=True, env=env, cwd=repo, capture_output=True, timeout=300)
        return out

    host_out = run("host", {"METAMDBG_TPU_HOST_ONLY": "1"})
    # congestion begins ~5 s in (after startup + claim, before the k-ladder
    # finishes); short TTL so the demotion is prompt
    t0 = _time.perf_counter()
    auto_out = run("auto", {
        "METAMDBG_TPU_TEST_CONGEST_AT": str(_time.time() + 5.0),
        "METAMDBG_TPU_PROBE_TTL_S": "0.5",
    })
    auto_wall = _time.perf_counter() - t0

    import json
    tel = json.load(open(auto_out / "tmp" / "device.json"))
    assert tel["device_mode"] == "device-auto"
    assert tel["demotions"] >= 1, f"no mid-run demotion recorded: {tel}"
    assert tel["healthy"] is False
    assert any(c["host_batches"] > 0 for c in tel["contexts"].values())
    # the run must not have crawled: a stuck-on-device run pays 1.5 s per
    # batch; bound the total generously for the 2-core CI box
    assert auto_wall < 180
    a = gzip.open(auto_out / "contigs.fasta.gz").read()
    b = gzip.open(host_out / "contigs.fasta.gz").read()
    assert a == b


def test_congestion_injection_env(reset_devwarm):
    """The test fault injector must make the real probe slow (this is what
    the e2e forced-congestion test leans on)."""
    reset_devwarm.setenv("METAMDBG_TPU_TEST_CONGEST_AT", "0")  # epoch: past
    t0 = time.perf_counter()
    rt = devwarm._probe_roundtrip()
    assert rt >= 0.5
    assert time.perf_counter() - t0 >= 1.5  # 3 roundtrips, 0.5 s each


def test_shadow_calibration_never_blocks(reset_devwarm):
    """With a shadow thunk, device calibration must run off-thread: the
    gate routes host immediately, and the (slow) device measurement lands
    in the EWMA asynchronously — so a 50 s compile can never stall the
    pipeline (observed: one blocking row-count calibration batch was 44%
    of an 86 Mbp ONT wall)."""
    _fake_probe(reset_devwarm, [0.004])
    ran = []

    def slow_shadow():
        time.sleep(0.2)   # stands in for a remote XLA compile
        ran.append(1)

    t0 = time.perf_counter()
    decisions = []
    for _ in range(6):
        with devwarm.gate("sh-ctx", 1000, shadow=slow_shadow) as g:
            decisions.append(g.device)
            time.sleep(0.001)
    fg_wall = time.perf_counter() - t0
    assert not any(decisions)          # calibration never on-thread
    assert fg_wall < 0.15              # the 0.2 s shadow did not block
    deadline = time.time() + 3
    while time.time() < deadline:
        tel = devwarm.telemetry()["contexts"].get("sh-ctx", {})
        if tel.get("device_s_per_item"):
            break
        time.sleep(0.02)
    assert devwarm.telemetry()["contexts"]["sh-ctx"]["device_batches"] >= 1
    # device EWMA is 200x worse than host -> steady state stays host
    for _ in range(4):
        with devwarm.gate("sh-ctx", 1000, shadow=slow_shadow) as g:
            assert g.device is False
            time.sleep(0.001)
