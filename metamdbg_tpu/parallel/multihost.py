"""Multi-host helpers for the sharded count table (SURVEY §2.11, §7.2).

Contract for a multi-host run (METAMDBG_TPU_DISTRIBUTED=1, standard JAX
coordinator env vars): every process calls the same pipeline; inputs to
mesh stages are built from PROCESS-LOCAL data with
`global_count_input` (jax.make_array_from_process_local_data), the
all_to_all exchange runs over ICI/DCN exactly as on one host, and
globally-sharded outputs come back to every host via
`jax.experimental.multihost_utils.process_allgather`.

`process_read_range` is the per-host input partition: contiguous read
slices in file order, so host h parses only its slice of the fastq
stream (read indices stay global). Single-process, everything here is
the identity / a plain device_put — which is what the CI mesh tests
exercise; the multi-host branches follow the documented JAX APIs and are
gated behind process_count() > 1.
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def process_read_range(n_total: int):
    """Contiguous [start, stop) read-index slice owned by this process."""
    pc = jax.process_count()
    pi = jax.process_index()
    per = (n_total + pc - 1) // pc
    start = min(pi * per, n_total)
    return start, min(start + per, n_total)


def global_count_input(mesh, rows: np.ndarray, lens: np.ndarray,
                       axis: str = "data"):
    """Build the (globally sharded) count-table inputs from the full padded
    row/length arrays.

    Single-process: device_put with the mesh sharding. Multi-process: each
    process contributes only its contiguous row block (the mesh's device
    order groups each process's addressable devices contiguously, so the
    block partition matches the P(axis) layout) via
    jax.make_array_from_process_local_data — the resulting global arrays
    feed parallel.count_table unchanged while each process's device memory
    holds only its shard. Row count must be divisible by the mesh size
    (count_kminmers_mesh pads it so).
    """
    import jax.numpy as jnp
    row_sharding = NamedSharding(mesh, P(axis, None))
    len_sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        pc = jax.process_count()
        pi = jax.process_index()
        n = rows.shape[0]
        if n % pc != 0:  # RuntimeError, not assert: stripped under -O and
            # a mis-padded split would silently drop rows on the last host
            raise RuntimeError(
                f"padded rows ({n}) must divide across {pc} processes")
        per = n // pc
        local_rows = np.ascontiguousarray(rows[pi * per:(pi + 1) * per],
                                          np.uint32)
        local_lens = np.ascontiguousarray(lens[pi * per:(pi + 1) * per],
                                          np.int32)
        g_rows = jax.make_array_from_process_local_data(
            row_sharding, local_rows, rows.shape)
        g_lens = jax.make_array_from_process_local_data(
            len_sharding, local_lens, lens.shape)
        return g_rows, g_lens
    return (jax.device_put(jnp.asarray(rows, jnp.uint32), row_sharding),
            jax.device_put(jnp.asarray(lens, jnp.int32), len_sharding))


def gather_to_hosts(x):
    """Globally-sharded device array -> full numpy array on every host."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(
            x, tiled=True))
    return np.asarray(x)
