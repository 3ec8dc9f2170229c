"""Device claim, continuous dispatch-health monitoring, and host/device
routing calibration.

On pooled-TPU deployments the first device->host materialization in a
process can block for minutes while the backend claims a chip from the
pool (observed 200-500 s through the axon relay; instant on a dedicated
chip or the CPU backend), and the relay's dispatch latency can *change
mid-run* (observed: a congested relay turning 0.5 s graph passes into
40 s ones for nine minutes). The reference never has either problem — it
is a single-host CPU binary (src/pipeline/AssemblyPipeline.hpp) — so the
design goal is: the device-enabled default path must never lose to the
pure-host path by more than the cost of a few calibration batches.

Three mechanisms:

1. **Asynchronous claim** — `start_warmup()` claims the device on a
   daemon thread at pipeline start; batches processed before the claim
   completes run their bit-identical host twins, so the claim cost is
   fully overlapped with useful work.

2. **Continuous dispatch-health probing** — a tiny dispatch+readback
   roundtrip (min of three) is re-measured whenever the cached probe is
   older than `METAMDBG_TPU_PROBE_TTL_S` (default 15 s), not once at
   claim time: a relay that congests mid-run demotes the device within
   one TTL, and a demoted device is re-probed on an exponential backoff
   (30 s doubling to 240 s) so a transient stall doesn't cost the rest of
   the run. A healthy probe is ~3 x 2-10 ms; a congested one is paid at
   most once per backoff window.

3. **Per-context rate calibration** — every adaptive compute gate has a
   bit-identical host twin, so routing is free to change per batch.
   `gate(context, items)` times each batch and keeps per-context
   seconds-per-item EWMAs for both modes; the device is chosen only while
   it is a *measured* win (with hysteresis), with a periodic exploration
   batch so a mode that got faster is re-discovered. This is what makes
   "device-enabled never loses to host-only" a property of the policy
   rather than of the tunnel's mood.

Env knobs:
  METAMDBG_TPU_REQUIRE_DEVICE   — block until the claim completes, fail
                                  loudly if it cannot, and route every
                                  gate to the device (for parity tests).
  METAMDBG_TPU_HOST_ONLY        — never touch a device (pure host run).
  METAMDBG_TPU_MAX_DISPATCH_S   — dispatch-roundtrip health bound
                                  (default 0.1 s).
  METAMDBG_TPU_PROBE_TTL_S      — health-probe max age (default 15 s).
  METAMDBG_TPU_TEST_CONGEST_AT  — test-only fault injection: a unix
                                  timestamp after which every probe
                                  roundtrip sleeps 0.5 s (looks exactly
                                  like a congested relay to the policy).
"""

import json
import logging
import os
import threading
import time

log = logging.getLogger("metamdbg_tpu")

_lock = threading.Lock()
_thread: "threading.Thread | None" = None
_ready = threading.Event()
_failed: "BaseException | None" = None
_claim_seconds: "float | None" = None

# A healthy chip (local or well-tunneled) completes a tiny dispatch+readback
# in well under this; a congested relay takes 0.3+ s per roundtrip, which
# inverts every dispatch-bound stage (observed: an 86 Mbp ONT run crawling
# at 8% CPU, blocked in per-batch readbacks; BENCH_r04's 538 s ONT run).
# The probe takes the min of three roundtrips so one scheduler hiccup (or a
# previously dispatched batch still draining) doesn't condemn the device.
_MAX_DISPATCH_SECONDS = 0.1
_PROBE_TTL_SECONDS = 15.0
_BACKOFF_INITIAL = 30.0
_BACKOFF_MAX = 240.0

# -- dispatch-health state (guarded by _health_lock) ------------------------
_health_lock = threading.Lock()
_healthy = False
_first_roundtrip: "float | None" = None
_last_roundtrip: "float | None" = None
_next_probe_t = 0.0          # monotonic deadline for the next probe
_backoff = 0.0
_n_probes = 0
_n_demotions = 0
_n_recoveries = 0

# -- per-context routing/calibration state (guarded by _ctx_lock) -----------
_ctx_lock = threading.Lock()
_ctx: dict = {}              # context -> _CtxStats

_CAL_BATCHES = 3             # observations per mode before trusting EWMAs
_EXPLORE_EVERY = 64          # re-try the losing mode every N batches
_DEVICE_WIN_MARGIN = 0.95    # device must be a measured >=5% win
_EWMA_ALPHA = 0.35


class _CtxStats:
    __slots__ = ("n_dev", "n_host", "dev_spi", "host_spi", "since_explore")

    def __init__(self):
        self.n_dev = 0
        self.n_host = 0
        self.dev_spi = None     # EWMA seconds-per-item, device batches
        self.host_spi = None
        self.since_explore = 0

    def observe(self, device: bool, items: int, seconds: float):
        spi = seconds / max(items, 1)
        if device:
            self.n_dev += 1
            self.dev_spi = spi if self.dev_spi is None else \
                (1 - _EWMA_ALPHA) * self.dev_spi + _EWMA_ALPHA * spi
        else:
            self.n_host += 1
            self.host_spi = spi if self.host_spi is None else \
                (1 - _EWMA_ALPHA) * self.host_spi + _EWMA_ALPHA * spi


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


def _dispatch_bound() -> float:
    return float(os.environ.get("METAMDBG_TPU_MAX_DISPATCH_S",
                                _MAX_DISPATCH_SECONDS))


def _probe_ttl() -> float:
    return float(os.environ.get("METAMDBG_TPU_PROBE_TTL_S",
                                _PROBE_TTL_SECONDS))


def _probe_roundtrip() -> float:
    """Min-of-3 tiny dispatch+readback wall (the claim is already paid).

    Fault injection for tests: METAMDBG_TPU_TEST_CONGEST_AT is a unix
    timestamp after which each roundtrip sleeps 0.5 s inside the timed
    section, which is indistinguishable from a congested relay."""
    import numpy as np

    import jax

    congest_at = os.environ.get("METAMDBG_TPU_TEST_CONGEST_AT")
    best = None
    for _ in range(3):
        t1 = time.perf_counter()
        if congest_at and time.time() >= float(congest_at):
            time.sleep(0.5)
        np.asarray(jax.device_put(np.zeros(8, np.uint8)) + np.uint8(1))
        dt = time.perf_counter() - t1
        best = dt if best is None else min(best, dt)
    return best


def _refresh_health(force: bool = False):
    """Re-probe dispatch health if the cached probe expired (or `force`)."""
    global _healthy, _last_roundtrip, _next_probe_t, _backoff
    global _n_probes, _n_demotions, _n_recoveries
    now = time.monotonic()
    with _health_lock:
        if not force and now < _next_probe_t:
            return
        try:
            rt = _probe_roundtrip()
        except Exception as exc:  # noqa: BLE001 — device died mid-run
            log.warning("device health probe failed (%s: %s); "
                        "routing to host paths", type(exc).__name__, exc)
            _healthy = False
            _backoff = min(max(_backoff * 2, _BACKOFF_INITIAL), _BACKOFF_MAX)
            _next_probe_t = time.monotonic() + _backoff
            return
        _n_probes += 1
        _last_roundtrip = rt
        if rt > _dispatch_bound():
            if _healthy:
                _n_demotions += 1
                log.warning(
                    "device dispatch roundtrip %.2f s exceeds %.2f s "
                    "(congested tunnel?); routing to host compute paths "
                    "and re-probing on backoff", rt, _dispatch_bound())
            _healthy = False
            _backoff = min(max(_backoff * 2, _BACKOFF_INITIAL), _BACKOFF_MAX)
            _next_probe_t = time.monotonic() + _backoff
        else:
            if not _healthy and _n_probes > 1:
                _n_recoveries += 1
                log.info("device dispatch recovered (%.1f ms roundtrip); "
                         "device routing re-enabled", rt * 1e3)
            _healthy = True
            _backoff = 0.0
            _next_probe_t = time.monotonic() + _probe_ttl()


def _warm():
    global _failed, _claim_seconds, _first_roundtrip
    try:
        import numpy as np

        import jax

        configure_jax(jax)
        t0 = time.perf_counter()
        x = jax.device_put(np.zeros(8, np.uint8))
        np.asarray(x)  # first readback = pool claim on tunneled backends
        _claim_seconds = time.perf_counter() - t0
        _refresh_health(force=True)
        _first_roundtrip = _last_roundtrip
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


def shadows_pending() -> bool:
    """True while a shadow-calibration thread is still measuring a device
    batch. Same teardown hazard as claim_pending(): the thread may be
    blocked inside PJRT and cannot be joined."""
    with _shadow_lock:
        return any(t.is_alive() for t in _shadows.values())


def claim_seconds() -> "float | None":
    """Observed claim latency (None until the claim completes)."""
    return _claim_seconds


def device_ready(wait: bool = False, timeout: "float | None" = None) -> bool:
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

    Health-gated only (no rate calibration — use `gate()` where the call
    site can report batch walls). Under METAMDBG_TPU_REQUIRE_DEVICE this
    blocks until the claim resolves and raises if the device is unusable;
    otherwise it returns the *current* health: the claim must be complete
    AND the freshest dispatch probe (re-measured on a TTL, see module
    docstring) must be under the bound."""
    if os.environ.get("METAMDBG_TPU_HOST_ONLY"):
        _count(context, False)
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
    if ok and not require:
        _refresh_health()
        ok = _healthy
    _count(context, ok)
    return ok


def _count(context: str, device: bool):
    with _ctx_lock:
        st = _ctx.get(context)
        if st is None:
            st = _ctx[context] = _CtxStats()
        if device:
            st.n_dev += 1
        else:
            st.n_host += 1


class _Gate:
    """Context manager for one calibrated batch: `.device` says where to
    run; the batch wall is recorded into the per-mode EWMA on exit."""

    __slots__ = ("context", "items", "device", "_t0")

    def __init__(self, context: str, items: int, device: bool):
        self.context = context
        self.items = items
        self.device = device
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None and self._t0 is not None:
            dt = time.perf_counter() - self._t0
            with _ctx_lock:
                st = _ctx.get(self.context)
                if st is None:
                    st = _ctx[self.context] = _CtxStats()
                st.observe(self.device, self.items, dt)
            # a device batch running far over its own EWMA (and over the
            # host's) is a congestion signal the tiny probe might not have
            # seen yet — force an immediate re-probe
            if self.device and dt > 2.0:
                st = _ctx[self.context]
                pred = (st.dev_spi or 0.0) * max(self.items, 1)
                host_pred = (st.host_spi or float("inf")) * max(self.items, 1)
                if dt > 4 * pred or dt > 4 * host_pred:
                    _refresh_health(force=True)
        return False


_shadow_lock = threading.Lock()
_shadows: dict = {}          # context -> in-flight shadow thread


def _submit_shadow(context: str, items: int, thunk):
    """Measure the device path of one batch on a daemon thread while the
    caller serves the batch from the host twin. The result is discarded —
    only the timing feeds the device EWMA. This keeps XLA shape compiles
    and slow-relay transfers OFF the pipeline's critical path: the device
    is only ever routed on the main thread once it is a *measured* win
    (observed: a single blocking row-count calibration batch cost 52 s of
    remote compile + tunnel in an 86 Mbp ONT run, 44% of the wall)."""
    with _shadow_lock:
        # one in-flight shadow GLOBALLY: shadows steal host CPU from the
        # 2-core pipeline while they wait on the tunnel, so serialize them
        if any(t.is_alive() for t in _shadows.values()):
            return
        def run():
            t0 = time.perf_counter()
            try:
                thunk()
            except Exception as exc:  # noqa: BLE001 — surfaced once
                from .devpolicy import device_fallback
                device_fallback(context, exc)
                return
            dt = time.perf_counter() - t0
            with _ctx_lock:
                st = _ctx.get(context)
                if st is None:
                    st = _ctx[context] = _CtxStats()
                st.observe(True, items, dt)
        t = threading.Thread(target=run, daemon=True,
                             name=f"shadow-cal-{context}")
        _shadows[context] = t
        t.start()


def gate(context: str, items: int, shadow=None) -> _Gate:
    """Route one batch of `items` work units for `context`.

    Returns a context manager whose `.device` attribute is the routing
    decision; run the device or the bit-identical host twin under it and
    the batch wall feeds the calibration. Policy: host until the claim
    completes or while the dispatch probe is unhealthy; then calibrate
    both modes; then the measured faster mode (device needs a >=5%
    margin), with one exploration batch of the losing mode every
    _EXPLORE_EVERY batches.

    `shadow`: optional zero-arg thunk running this batch's DEVICE path.
    When provided, device-side calibration and device-side exploration
    run as background shadows (discarded result, measured wall) instead
    of blocking the pipeline — so compiles and congested transfers can
    never slow the run down; the device is promoted to the main thread
    only after it has measured faster."""
    if os.environ.get("METAMDBG_TPU_HOST_ONLY"):
        return _Gate(context, items, False)
    if os.environ.get("METAMDBG_TPU_REQUIRE_DEVICE"):
        ok = device_ready(wait=True)
        if not ok:
            raise RuntimeError(
                f"device unavailable for {context} and "
                f"METAMDBG_TPU_REQUIRE_DEVICE is set") from _failed
        return _Gate(context, items, True)
    if not device_ready():
        if _failed is not None:
            from .devpolicy import device_fallback
            device_fallback(context, _failed)
        return _Gate(context, items, False)
    _refresh_health()
    if not _healthy:
        return _Gate(context, items, False)
    with _ctx_lock:
        st = _ctx.get(context)
        if st is None:
            st = _ctx[context] = _CtxStats()
        # calibration: interleave until both modes are MEASURED (spi set
        # by gate observations; use_device() counts the same context's
        # routing without timings, so the n_* counters alone don't prove
        # a measurement exists)
        need_host = st.n_host < _CAL_BATCHES or st.host_spi is None
        # with a shadow available, ONE device measurement is enough to
        # rank the modes (exploration shadows keep refining the EWMA);
        # blocking calibration still wants _CAL_BATCHES
        need_dev = (st.dev_spi is None if shadow is not None
                    else st.n_dev < _CAL_BATCHES or st.dev_spi is None)
        if need_host or need_dev:
            if need_host and need_dev:
                dev = st.n_dev < st.n_host  # alternate, host first
            else:
                dev = need_dev              # measure the missing side
            if dev and shadow is not None:
                _submit_shadow(context, items, shadow)
                return _Gate(context, items, False)
            return _Gate(context, items, dev)
        dev_wins = st.dev_spi < st.host_spi * _DEVICE_WIN_MARGIN
        st.since_explore += 1
        if st.since_explore >= _EXPLORE_EVERY:
            st.since_explore = 0
            if not dev_wins and shadow is not None:
                # device exploration as a background shadow
                _submit_shadow(context, items, shadow)
                return _Gate(context, items, False)
            return _Gate(context, items, not dev_wins)  # try the loser once
        return _Gate(context, items, dev_wins)


def telemetry() -> dict:
    """Routing/health snapshot for bench + run artifacts."""
    if os.environ.get("METAMDBG_TPU_HOST_ONLY"):
        mode = "host-only"
    elif os.environ.get("METAMDBG_TPU_REQUIRE_DEVICE"):
        mode = "device-required"
    else:
        mode = "device-auto"
    with _ctx_lock:
        contexts = {
            name: {
                "device_batches": st.n_dev,
                "host_batches": st.n_host,
                "device_s_per_item": st.dev_spi,
                "host_s_per_item": st.host_spi,
            }
            for name, st in sorted(_ctx.items())
        }
    with _health_lock:
        return {
            "device_mode": mode,
            "claim_seconds": _claim_seconds,
            "first_dispatch_roundtrip_s": _first_roundtrip,
            "dispatch_roundtrip_s": _last_roundtrip,
            "dispatch_bound_s": _dispatch_bound(),
            "healthy": _healthy,
            "probes": _n_probes,
            "demotions": _n_demotions,
            "recoveries": _n_recoveries,
            "contexts": contexts,
        }


def dump_telemetry(path: str):
    """Write the telemetry snapshot as JSON (best-effort)."""
    try:
        with open(path, "w") as f:
            json.dump(telemetry(), f, indent=1)
    except OSError as exc:
        log.debug("could not write device telemetry: %s", exc)
