"""Sharded pair-table join (parallel/pair_join.py) vs the host
searchsorted join: identical match lists on an 8-device CPU mesh, and
byte-identical mapper output through run_read_mapper(mesh=...)."""

import numpy as np
import pytest


def _mesh():
    import jax
    from jax.sharding import Mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(jax.devices()[:8]), ("data",))


def _host_join(tbl, queries):
    order = np.argsort(tbl, kind="stable")
    ts = tbl[order]
    lo = np.searchsorted(ts, queries, side="left")
    hi = np.searchsorted(ts, queries, side="right")
    counts = (hi - lo).astype(np.int64)
    total = int(counts.sum())
    intra = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    matches = order[np.repeat(lo, counts) + intra]
    # ascending original index within each query's run (stable sort of
    # equal keys keeps original order already)
    return counts, matches.astype(np.int64)


@pytest.mark.parametrize("seed,nt,nq,universe", [
    (3, 500, 300, 40),      # dense collisions
    (7, 4096, 1024, 100000),  # mostly unique
    (11, 37, 1000, 10),     # tiny table, heavy repeats
])
def test_join_matches_host(seed, nt, nq, universe):
    from metamdbg_tpu.parallel.pair_join import pair_join_mesh
    mesh = _mesh()
    rng = np.random.default_rng(seed)
    tbl = rng.integers(0, universe, nt).astype(np.uint64) * \
        np.uint64(0x100000001)
    queries = rng.integers(0, universe, nq).astype(np.uint64) * \
        np.uint64(0x100000001)
    hc, hm = _host_join(tbl, queries)
    mc, mm = pair_join_mesh(mesh, tbl, queries)
    assert np.array_equal(hc, mc)
    assert np.array_equal(hm, mm)


def test_mapper_mesh_byte_identical(tmp_path):
    """run_read_mapper with the mesh join writes the exact bytes of the
    host path's readAlignmentsLowDensity.bin."""
    from metamdbg_tpu.correction import mapper
    from metamdbg_tpu.io import records
    mesh = _mesh()
    rng = np.random.default_rng(5)

    reads = []
    base = rng.integers(1, 1 << 31, size=400, dtype=np.uint32)
    for i in range(60):
        start = int(rng.integers(0, 340))
        ln = int(rng.integers(15, 60))
        mins = base[start:start + ln].copy()
        if i % 4 == 0:
            mins[rng.integers(0, ln)] ^= 12345  # noise
        pos = np.sort(rng.integers(0, 20000, ln)).astype(np.uint32)
        dirs = rng.integers(0, 2, ln).astype(np.uint8)
        reads.append(records.MinimizerRead(i, mins, pos, dirs, None))

    out_host = str(tmp_path / "host.bin")
    out_mesh = str(tmp_path / "mesh.bin")
    r1 = mapper.run_read_mapper(reads, 2000, 62, alignment_path=out_host)
    r2 = mapper.run_read_mapper(reads, 2000, 62, alignment_path=out_mesh,
                                mesh=mesh)
    assert open(out_host, "rb").read() == open(out_mesh, "rb").read()
    assert set(r1.keys()) == set(r2.keys())
