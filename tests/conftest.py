import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs multichip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU-tunnel plugin registers itself from sitecustomize.py at
# interpreter startup (PYTHONPATH /root/.axon_site), i.e. BEFORE this
# conftest runs: jax is already imported and its config latched
# JAX_PLATFORMS=axon from the environment, so the env update above is a
# no-op for this process and first backend use dials the (flaky, slow)
# remote tunnel. Backend *initialization* is lazy, though — so here we
# deregister the axon factory and repoint the live config at cpu before
# any test touches jax.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p)
# Subprocesses (parity oracles run the reference binary only, but any
# python child would re-trigger sitecustomize) — drop the gate var too.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

# Tests must exercise the real device dispatch paths (on the CPU mesh the
# async device claim in utils/devwarm.py is instant): block on the claim
# instead of silently taking the host fallback while it is pending.
os.environ.setdefault("METAMDBG_TPU_REQUIRE_DEVICE", "1")

if "jax" in sys.modules:
    import jax
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")
    if _xb.backends_are_initialized():  # a fixture/import already hit a backend
        from jax.extend.backend import clear_backends

        clear_backends()
