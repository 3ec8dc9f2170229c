"""Device kernels (JAX/XLA). Importing this package enables the persistent
XLA compilation cache: the sketch/count/chain kernels compile once per
machine (minutes over a remote-tunnel device) and reload in milliseconds on
every later pipeline run."""

import os


def _enable_compilation_cache():
    try:
        import jax
        cache_dir = os.environ.get(
            "METAMDBG_TPU_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "jax_metamdbg"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization only
        pass


_enable_compilation_cache()
