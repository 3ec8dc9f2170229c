"""Multi-chip (mesh) production helpers.

The reference has no distributed runtime (OpenMP + disk partitions only,
SURVEY §2.11); here scale-out is a JAX device mesh: data-parallel read
batches and hash-routed sharded count tables (count_table.py).
`production_mesh()` is the single gate the pipeline uses to decide
whether a stage runs its mesh path.
"""

import logging
import os

log = logging.getLogger("metamdbg_tpu")

_DIST_INITIALIZED = False


def production_mesh(axis: str = "data"):
    """The mesh production stages should shard over, or None.

    Returns a 1-axis mesh over all visible devices when >=2 are available
    (virtual CPU devices under xla_force_host_platform_device_count count
    too — that is the multi-chip test rig). Multi-host runs initialize
    `jax.distributed` first when METAMDBG_TPU_DISTRIBUTED is set (the
    coordinator address comes from the standard JAX env vars). Never blocks
    on a pending device claim (utils/devwarm.py): single-chip pipelines
    keep their adaptive host/device paths instead.
    """
    if os.environ.get("METAMDBG_TPU_HOST_ONLY"):
        return None
    from ..utils import devwarm
    if not devwarm.device_ready():
        return None
    global _DIST_INITIALIZED
    import jax
    import numpy as np
    from jax.sharding import Mesh

    if os.environ.get("METAMDBG_TPU_DISTRIBUTED") and not _DIST_INITIALIZED:
        jax.distributed.initialize()
        _DIST_INITIALIZED = True
        log.info("jax.distributed initialized: process %d/%d",
                 jax.process_index(), jax.process_count())
    devices = jax.devices()
    if len(devices) < 2:
        return None
    return Mesh(np.array(devices), (axis,))
