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


def global_count_input(mesh, local_rows: np.ndarray, local_lens: np.ndarray,
                       axis: str = "data"):
    """Build the (globally sharded) count-table inputs.

    Single-process: device_put with the mesh sharding. Multi-process: each
    process contributes its local block via
    jax.make_array_from_process_local_data — the resulting global arrays
    feed parallel.count_table unchanged.
    """
    import jax.numpy as jnp
    row_sharding = NamedSharding(mesh, P(axis, None))
    len_sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        rows = jax.make_array_from_process_local_data(
            row_sharding, np.asarray(local_rows, np.uint32))
        lens = jax.make_array_from_process_local_data(
            len_sharding, np.asarray(local_lens, np.int32))
        return rows, lens
    return (jax.device_put(jnp.asarray(local_rows, jnp.uint32), row_sharding),
            jax.device_put(jnp.asarray(local_lens, jnp.int32), len_sharding))


def gather_to_hosts(x):
    """Globally-sharded device array -> full numpy array on every host."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(
            x, tiled=True))
    return np.asarray(x)
