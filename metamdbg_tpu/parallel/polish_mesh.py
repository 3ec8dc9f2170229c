"""Multi-host fan-out of the windowed-POA polish stage (SURVEY §2.11).

Polish windows are independent — the reference threads the identical
per-window loop on one host (src/toBasespace/ContigPolisher.hpp:2135-2250)
— so a pod run shards the window batch round-robin across processes, each
host polishes its shard with the native engine
(basespace/poa_native.polish_windows), and the consensus/coverage results
are exchanged as fixed-size padded planes via
jax.experimental.multihost_utils.process_allgather. The output list is
re-assembled in the ORIGINAL batch order, so it is byte-identical to the
single-host path by construction (each window's POA is deterministic) —
pinned by tests/test_multihost.py::test_two_process_polish_byte_identical
and exercised on the driver's virtual mesh by __graft_entry__'s dryrun.

Single-process this is exactly poa_native.polish_windows, which is what
the CI mesh and the HOST_ONLY production path run.
"""

import numpy as np


def shard_indices(n: int, pi: int, pc: int):
    """Round-robin shard of range(n) owned by process pi of pc."""
    return list(range(pi, n, pc))


def pack_planes(res, n_max: int, w_max: int):
    """[(consensus bytes, coverages u32)] -> fixed (n_max, w_max) planes
    (consensus u8, coverage u32, lengths i64) for a collective exchange."""
    cons_plane = np.zeros((n_max, w_max), np.uint8)
    cov_plane = np.zeros((n_max, w_max), np.uint32)
    lens = np.zeros(n_max, np.int64)
    for i, (cons, covs) in enumerate(res):
        k = len(cons)
        lens[i] = k
        cons_plane[i, :k] = np.frombuffer(cons, np.uint8)
        cov = np.asarray(covs, np.uint32)
        cov_plane[i, :cov.shape[0]] = cov
    return cons_plane, cov_plane, lens


def unpack_planes(n_total: int, pc: int, all_cons, all_cov, all_lens):
    """Gathered (pc, n_max, w_max) planes -> result list in the original
    batch order (inverse of the round-robin shard)."""
    out = []
    for gi in range(n_total):
        p, j = gi % pc, gi // pc
        k = int(all_lens[p, j])
        out.append((all_cons[p, j, :k].tobytes(),
                    np.ascontiguousarray(all_cov[p, j, :k])))
    return out


def polish_windows_distributed(batch, n_threads=None):
    """Drop-in replacement for poa_native.polish_windows under
    jax.distributed: [(backbone, frags)] -> [(consensus bytes,
    coverages u32 array)] in batch order."""
    import os

    from ..basespace import poa_native
    if not os.environ.get("METAMDBG_TPU_DISTRIBUTED"):
        return poa_native.polish_windows(batch, n_threads=n_threads)
    import jax
    pc = jax.process_count()
    if pc <= 1 or not batch:
        return poa_native.polish_windows(batch, n_threads=n_threads)
    from jax.experimental import multihost_utils

    pi = jax.process_index()
    mine = [batch[i] for i in shard_indices(len(batch), pi, pc)]
    res = poa_native.polish_windows(mine, n_threads=n_threads)

    # every process must agree on the pad shape: allgather local dims first
    n_local = len(res)
    local_max = max((len(c) for c, _ in res), default=0)
    dims = np.asarray(multihost_utils.process_allgather(
        np.array([n_local, local_max], np.int64))).reshape(pc, 2)
    n_max = int(dims[:, 0].max())
    w_max = max(int(dims[:, 1].max()), 1)

    cons_plane, cov_plane, lens = pack_planes(res, n_max, w_max)
    all_cons = np.asarray(
        multihost_utils.process_allgather(cons_plane)).reshape(
            pc, n_max, w_max)
    all_cov = np.asarray(
        multihost_utils.process_allgather(cov_plane)).reshape(
            pc, n_max, w_max)
    all_lens = np.asarray(
        multihost_utils.process_allgather(lens)).reshape(pc, n_max)
    return unpack_planes(len(batch), pc, all_cons, all_cov, all_lens)
