"""unitigGraph.* and kminmerData.* on-disk formats (byte-compatible).

Formats (src/graph/CreateMdbg.cpp):
- kminmerData_min.txt: u32 minimizers[k] per record (MDBG::writeKminmer,
  src/Commons.hpp:4429-4446); unordered set semantics (reference writes from
  parallel threads).
- kminmerData_abundance.txt: u128 hash (LE: low u64 = h2 first) + u32 count
  (MDBG::writeKminmerAbundance, src/Commons.hpp:4463-4472).
- unitigGraph.nodes.bin: u32 len, u32 seq[len], u32 unitigIndex
  (dumpUnitigNode, CreateMdbg.cpp:2838-2842), deterministic order.
- unitigGraph.edges.successors.bin: u32 fromIndex, u32 nSucc, u32 succ[],
  u32 nPred, u32 pred[] (dumpUnitigEdge, CreateMdbg.cpp:2894-2898);
  pred list = successors of fromIndex^1.
- unitigGraph.nodes.abundances.bin: u32 unitigIndex, u32 n, u32 ab[n]
  (dumpUnitigAbundances, CreateMdbg.cpp:3370-3373).
- unitigGraph.stats.bin: u64 nbNodes, u64 nbEdges (writeUnitigGraphStat,
  CreateMdbg.cpp:988-994).
"""

import struct

import numpy as np

from ..utils.hashing import murmur128_u32rows


def write_kminmer_rows(path: str, rows: np.ndarray):
    with open(path, "wb") as f:
        f.write(np.ascontiguousarray(rows, dtype=np.uint32).tobytes())


def read_kminmer_rows(path: str, k: int) -> np.ndarray:
    with open(path, "rb") as f:
        data = np.frombuffer(f.read(), dtype=np.uint32)
    return data.reshape(-1, k)


def hash128_bytes(rows: np.ndarray) -> np.ndarray:
    """(N, 16) uint8: the __uint128_t (h1<<64)|h2 in x86 little-endian."""
    h1, h2 = murmur128_u32rows(rows)
    out = np.empty((rows.shape[0], 16), np.uint8)
    out[:, :8] = h2[:, None].view(np.uint8).reshape(-1, 8)
    out[:, 8:] = h1[:, None].view(np.uint8).reshape(-1, 8)
    return out


def write_kminmer_abundances(path: str, rows: np.ndarray, counts: np.ndarray):
    hb = hash128_bytes(rows)
    rec = np.empty((rows.shape[0], 20), np.uint8)
    rec[:, :16] = hb
    rec[:, 16:] = counts.astype(np.uint32)[:, None].view(np.uint8).reshape(-1, 4)
    with open(path, "wb") as f:
        f.write(rec.tobytes())


def read_kminmer_abundances(path: str):
    """Returns ((N,2) u64 [h1,h2] keys, u32 counts)."""
    with open(path, "rb") as f:
        raw = np.frombuffer(f.read(), dtype=np.uint8).reshape(-1, 20)
    h2 = raw[:, :8].copy().view(np.uint64).ravel()
    h1 = raw[:, 8:16].copy().view(np.uint64).ravel()
    counts = raw[:, 16:].copy().view(np.uint32).ravel()
    return np.stack([h1, h2], axis=1), counts


def write_unitig_nodes(path: str, sequences):
    with open(path, "wb") as f:
        for i, seq in enumerate(sequences):
            f.write(struct.pack("<I", seq.shape[0]))
            f.write(np.ascontiguousarray(seq, np.uint32).tobytes())
            f.write(struct.pack("<I", 2 * i))


def read_unitig_nodes(path: str):
    """Returns list of (sequence u32 array, unitigIndex)."""
    with open(path, "rb") as f:
        data = f.read()
    out = []
    off = 0
    while off < len(data):
        (n,) = struct.unpack_from("<I", data, off)
        off += 4
        seq = np.frombuffer(data, np.uint32, n, off)
        off += 4 * n
        (idx,) = struct.unpack_from("<I", data, off)
        off += 4
        out.append((seq, idx))
    return out


def write_unitig_edges(path: str, successors):
    """successors: list of 2U lists; record per unitig u: index 2u."""
    with open(path, "wb") as f:
        for u in range(len(successors) // 2):
            succ = np.asarray(successors[2 * u], np.uint32)
            pred = np.asarray(successors[2 * u + 1], np.uint32)
            f.write(struct.pack("<II", 2 * u, succ.shape[0]))
            f.write(succ.tobytes())
            f.write(struct.pack("<I", pred.shape[0]))
            f.write(pred.tobytes())


def read_unitig_edges(path: str):
    """Returns dict oriented_index -> sorted successor array (pred lists are
    folded into index^1 entries)."""
    with open(path, "rb") as f:
        data = f.read()
    out = {}
    off = 0
    while off < len(data):
        frm, ns = struct.unpack_from("<II", data, off)
        off += 8
        succ = np.frombuffer(data, np.uint32, ns, off)
        off += 4 * ns
        (npred,) = struct.unpack_from("<I", data, off)
        off += 4
        pred = np.frombuffer(data, np.uint32, npred, off)
        off += 4 * npred
        out[frm] = np.sort(succ)
        out[frm ^ 1] = np.sort(pred)
    return out


def write_unitig_abundances(path: str, abundances):
    with open(path, "wb") as f:
        for i, ab in enumerate(abundances):
            f.write(struct.pack("<II", 2 * i, ab.shape[0]))
            f.write(np.ascontiguousarray(ab, np.uint32).tobytes())


def read_unitig_abundances(path: str):
    with open(path, "rb") as f:
        data = f.read()
    out = []
    off = 0
    while off < len(data):
        idx, n = struct.unpack_from("<II", data, off)
        off += 8
        ab = np.frombuffer(data, np.uint32, n, off)
        off += 4 * n
        out.append((idx, ab))
    return out


def write_unitig_stats(path: str, nb_nodes: int, nb_edges: int):
    with open(path, "wb") as f:
        f.write(struct.pack("<QQ", nb_nodes, nb_edges))


def read_unitig_stats(path: str):
    with open(path, "rb") as f:
        return struct.unpack("<QQ", f.read(16))
