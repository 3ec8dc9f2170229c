"""Asynchronous device-claim warm-up.

On pooled-TPU deployments the first device->host materialization in a
process can block for minutes while the backend claims a chip from the
pool (observed 200-500 s through the axon relay; instant on a dedicated
chip or the CPU backend). The reference never has this problem — it is a
single-host CPU binary (src/pipeline/AssemblyPipeline.hpp) — so paying the
claim synchronously inside a stage inverts the perf story on small inputs.

Policy: `start_warmup()` claims the device on a daemon thread at pipeline
start; compute stages consult `use_device(context)` per batch and run
their bit-identical host path until the claim completes, so the claim cost
is fully overlapped with useful work. Large datasets amortize the claim
and migrate onto the device automatically; small ones never block on it.

Env knobs:
  METAMDBG_TPU_REQUIRE_DEVICE  — block until the claim completes (and fail
                                 loudly if it cannot); for tests/benches
                                 that must exercise the device path.
  METAMDBG_TPU_HOST_ONLY       — never touch a device (pure host run).
"""

import logging
import os
import threading
import time

log = logging.getLogger("metamdbg_tpu")

_lock = threading.Lock()
_thread: threading.Thread | None = None
_ready = threading.Event()
_failed: BaseException | None = None
_claim_seconds: float | None = None
_roundtrip_seconds: float | None = None
_slow_logged = False

# A healthy chip (local or well-tunneled) completes a tiny dispatch+readback
# in well under this; a congested relay takes 0.3+ s per roundtrip, which
# inverts every dispatch-bound stage (observed: an 86 Mbp ONT run crawling
# at 8% CPU, blocked in per-batch readbacks; a 1 Mb bench run at 5x its
# host-only wall with a probe that momentarily passed a looser 0.25 s
# bound). The probe takes the min of three roundtrips. Above the bound the
# adaptive gates stay on their bit-identical host paths.
_MAX_DISPATCH_SECONDS = 0.1


def configure_jax(jax=None):
    """Enable the persistent compilation cache (idempotent).

    Per-shape XLA compiles cost ~0.4-40 s depending on backend; the cache
    makes them a once-ever cost across runs. Called from the warm thread
    before the claim (so every compile issued through the adaptive gates
    happens after it) and from direct kernel users."""
    try:
        if jax is None:
            import jax
        # one cache per platform string: TPU-host compiles carry machine
        # pseudo-features (prefer-no-scatter/gather) that XLA:CPU warns
        # about (and may SIGILL on) when loaded into a pure-CPU process
        platform = (os.environ.get("JAX_PLATFORMS") or "default").replace(
            ",", "_")
        cache_dir = os.environ.get(
            "METAMDBG_TPU_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "metamdbg_tpu", f"jaxcache-{platform}"))
        os.makedirs(cache_dir, exist_ok=True)
        if jax.config.jax_compilation_cache_dir != cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.2)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as exc:  # noqa: BLE001 — cache is an optimization only
        log.debug("persistent compile cache unavailable: %s", exc)


def _warm():
    global _failed, _claim_seconds, _roundtrip_seconds
    try:
        import numpy as np

        import jax

        configure_jax(jax)
        t0 = time.perf_counter()
        x = jax.device_put(np.zeros(8, np.uint8))
        np.asarray(x)  # first readback = pool claim on tunneled backends
        _claim_seconds = time.perf_counter() - t0
        # steady-state dispatch latency (the claim cost is already paid);
        # min of three so one scheduler hiccup doesn't condemn the device,
        # while a congested relay fails all three
        best = None
        for _ in range(3):
            t1 = time.perf_counter()
            np.asarray(jax.device_put(np.zeros(8, np.uint8)) + np.uint8(1))
            dt = time.perf_counter() - t1
            best = dt if best is None else min(best, dt)
        _roundtrip_seconds = best
        if _claim_seconds > 5.0:
            log.info("device claim completed in %.1f s (overlapped)",
                     _claim_seconds)
    except BaseException as exc:  # noqa: BLE001 — recorded, surfaced later
        _failed = exc
        log.warning("device claim failed (%s: %s); host paths will be used",
                    type(exc).__name__, exc)
    finally:
        _ready.set()


def start_warmup():
    """Begin claiming the device in the background (idempotent)."""
    global _thread
    if os.environ.get("METAMDBG_TPU_HOST_ONLY"):
        return
    # multi-host runs must init jax.distributed BEFORE the claim thread
    # touches the backend (jax requires it before any XLA call)
    from ..parallel import ensure_distributed
    ensure_distributed()
    with _lock:
        if _thread is None:
            _thread = threading.Thread(target=_warm, daemon=True,
                                       name="device-claim-warmup")
            _thread.start()


def claim_pending() -> bool:
    """True while a started claim has not resolved. The warm thread blocks
    inside the PJRT client during the claim and cannot be joined; callers
    that own the process (the CLI) should `os._exit` instead of letting
    interpreter teardown abort inside the native wait."""
    return _thread is not None and not _ready.is_set()


def claim_seconds() -> float | None:
    """Observed claim latency (None until the claim completes)."""
    return _claim_seconds


def device_ready(wait: bool = False, timeout: float | None = None) -> bool:
    """True once the device is claimed and usable. Never blocks unless
    `wait`. Starts the warmup if nothing has."""
    if os.environ.get("METAMDBG_TPU_HOST_ONLY"):
        return False
    start_warmup()
    if wait:
        _ready.wait(timeout)
    return _ready.is_set() and _failed is None


def use_device(context: str) -> bool:
    """Per-batch device/host decision for a compute stage.

    Under METAMDBG_TPU_REQUIRE_DEVICE this blocks until the claim resolves
    and raises if the device is unusable; otherwise it returns immediately
    with the current readiness (host fallback is loud via devpolicy when
    the claim has *failed*, silent while it is merely still pending)."""
    if os.environ.get("METAMDBG_TPU_HOST_ONLY"):
        return False
    require = os.environ.get("METAMDBG_TPU_REQUIRE_DEVICE")
    ok = device_ready(wait=bool(require))
    if require and not ok:
        raise RuntimeError(
            f"device unavailable for {context} and "
            f"METAMDBG_TPU_REQUIRE_DEVICE is set") from _failed
    if not ok and _failed is not None:
        from .devpolicy import device_fallback
        device_fallback(context, _failed)
    if ok and not require and _roundtrip_seconds is not None:
        bound = float(os.environ.get("METAMDBG_TPU_MAX_DISPATCH_S",
                                     _MAX_DISPATCH_SECONDS))
        if _roundtrip_seconds > bound:
            global _slow_logged
            if not _slow_logged:
                _slow_logged = True
                log.warning(
                    "device dispatch roundtrip %.2f s exceeds %.2f s "
                    "(congested tunnel?); staying on host compute paths",
                    _roundtrip_seconds, bound)
            return False
    return ok
