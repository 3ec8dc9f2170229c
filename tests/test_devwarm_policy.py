"""Device-gate policy: a congested tunnel (slow dispatch roundtrips) must
push the adaptive stages onto their host paths instead of letting every
per-batch readback crawl (observed: an 86 Mbp ONT run at 8% CPU blocked in
axon-relay roundtrips)."""

import logging

from metamdbg_tpu.utils import devwarm


def _force_ready(monkeypatch):
    monkeypatch.setattr(devwarm, "_failed", None)
    monkeypatch.setattr(devwarm, "_slow_logged", False)
    monkeypatch.setattr(devwarm, "device_ready",
                        lambda wait=False, timeout=None: True)


def test_fast_roundtrip_keeps_device(monkeypatch):
    _force_ready(monkeypatch)
    monkeypatch.setattr(devwarm, "_roundtrip_seconds", 0.004)
    monkeypatch.delenv("METAMDBG_TPU_HOST_ONLY", raising=False)
    monkeypatch.delenv("METAMDBG_TPU_REQUIRE_DEVICE", raising=False)
    assert devwarm.use_device("test-context") is True


def test_slow_roundtrip_falls_back_to_host(monkeypatch, caplog):
    _force_ready(monkeypatch)
    monkeypatch.setattr(devwarm, "_roundtrip_seconds", 3.2)
    monkeypatch.delenv("METAMDBG_TPU_HOST_ONLY", raising=False)
    monkeypatch.delenv("METAMDBG_TPU_REQUIRE_DEVICE", raising=False)
    with caplog.at_level(logging.WARNING, logger="metamdbg_tpu"):
        assert devwarm.use_device("test-context") is False
        # warn once, not per batch
        assert devwarm.use_device("test-context") is False
    assert sum("congested tunnel" in r.message for r in caplog.records) == 1


def test_require_device_overrides_slow_gate(monkeypatch):
    _force_ready(monkeypatch)
    monkeypatch.setattr(devwarm, "_roundtrip_seconds", 3.2)
    monkeypatch.delenv("METAMDBG_TPU_HOST_ONLY", raising=False)
    monkeypatch.setenv("METAMDBG_TPU_REQUIRE_DEVICE", "1")
    assert devwarm.use_device("test-context") is True


def test_env_bound_override(monkeypatch):
    _force_ready(monkeypatch)
    monkeypatch.setattr(devwarm, "_roundtrip_seconds", 0.5)
    monkeypatch.delenv("METAMDBG_TPU_HOST_ONLY", raising=False)
    monkeypatch.delenv("METAMDBG_TPU_REQUIRE_DEVICE", raising=False)
    monkeypatch.setenv("METAMDBG_TPU_MAX_DISPATCH_S", "1.0")
    assert devwarm.use_device("test-context") is True
