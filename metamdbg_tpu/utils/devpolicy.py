"""Device-fallback policy (VERDICT r1 'silent device fallbacks').

A compute-path component that cannot reach its device kernel must go
through `device_fallback(context, exc)`: with METAMDBG_TPU_REQUIRE_DEVICE
set the run fails immediately; otherwise the fallback is logged loudly
once per context so a kernel regression can never hide inside a
slow-but-green run. Kernel *results* are never guarded — a failing kernel
raises.
"""

import logging
import os

log = logging.getLogger("metamdbg_tpu")
_warned: set = set()


def device_fallback(context: str, exc: BaseException):
    """Record (or refuse) a device->host fallback for `context`."""
    if os.environ.get("METAMDBG_TPU_REQUIRE_DEVICE"):
        raise RuntimeError(
            f"device kernel unavailable for {context} and "
            f"METAMDBG_TPU_REQUIRE_DEVICE is set") from exc
    if context not in _warned:
        _warned.add(context)
        log.warning("device kernel unavailable for %s (%s: %s); "
                    "falling back to host path", context,
                    type(exc).__name__, exc)
