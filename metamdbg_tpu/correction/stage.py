"""Read correction stage orchestration (`readCorrection` subcommand).

Mirrors ReadCorrection::execute (src/readSelection/ReadCorrection.hpp:
1759-2151): memory model -> all-vs-all mapping -> Jaccard-BFS read
partitioning -> per-partition correction (filterAlignments +
performPoaCorrection4) -> read_data_corrected.txt ({u32 n, u8 linear,
u32 minimizers[n]} records, ReadCorrection.hpp:6367-6484).

Determinism notes:
- the reference's corrected-record order equals ascending read index within
  each partition (single-writer iteration over the partition's load order);
- partition membership is reproduced with the same Jaccard-priority BFS;
  heap ties follow (distance, insertion order), which can diverge from
  libstdc++ heap mechanics only when several neighbors share a distance in a
  multi-partition run (never in a single-partition run).
"""

import dataclasses
import logging
import os

import numpy as np

from ..constants import CONTIG_LINEAR
from ..io import fastq, records
from ..sketch import kmers as _kmers
from ..sketch import minimizers as _minimizers
from ..sketch import rle as _rle
from ..sketch.palindrome import purge_palindrome
from ..utils.hashing import minimizer_is_selected
from . import chainer, mapper, poa

log = logging.getLogger("metamdbg_tpu")

MAX_MEMORY_BASE_GB = 8.0            # ReadCorrection.hpp:1789
MEMORY_PER_MINIMIZER = 15           # ReadCorrection.hpp:1822 (8+4+1+1+1)
MINIMIZER_POSITION_BYTES = 48       # sizeof(MinimizerPosition2)*2 (hpp:1829)
MIN_READ_MINIMIZERS = mapper.MIN_READ_MINIMIZERS


@dataclasses.dataclass
class SimpleRead:
    """Minimal read view handed to the chainer/POA."""
    index: int
    minimizers: np.ndarray
    positions: np.ndarray
    directions: np.ndarray
    qualities: np.ndarray
    read_length: int

    def reverse_complement(self):
        """MinimizerRead::toReverseComplement (src/Commons.hpp:1042-1079)."""
        n = self.minimizers.shape[0]
        pos = (np.int64(self.read_length)
               - self.positions[::-1].astype(np.int64)).astype(np.uint32)
        return SimpleRead(self.index, self.minimizers[::-1].copy(), pos,
                          (1 - self.directions[::-1]).astype(np.uint8),
                          self.qualities[::-1].copy(), self.read_length)


def apply_density_threshold(read: SimpleRead, density: float) -> SimpleRead:
    """Utils::applyDensityThreshold (src/Commons.hpp:2507-2545): keep
    minimizers whose value re-hashes under the density bound."""
    keep = minimizer_is_selected(read.minimizers.astype(np.uint64), density)
    return SimpleRead(read.index, read.minimizers[keep],
                      read.positions[keep], read.directions[keep],
                      read.qualities[keep], read.read_length)


def compute_max_memory(nb_bases: int) -> int:
    """Affine RAM model (ReadCorrection.hpp:1788-1817).

    METAMDBG_TPU_CORRECTION_MEMORY_GB overrides the model so scale tests
    can force multi-partition correction on small inputs."""
    ovr = os.environ.get("METAMDBG_TPU_CORRECTION_MEMORY_GB")
    if ovr:
        return int(float(ovr) * 1_000_000_000)
    x1, y1 = np.float32(MAX_MEMORY_BASE_GB), np.float32(50.0)
    x2, y2 = np.float32(250.0), np.float32(5000.0)
    a = (y2 - y1) / (x2 - x1)
    b = y1 - a * x1
    gb_actual = np.longdouble(nb_bases) / np.longdouble(1_000_000_000)
    x3 = (np.float32(gb_actual) - b) / a
    max_gb = max(np.longdouble(x3), np.longdouble(MAX_MEMORY_BASE_GB))
    max_gb = min(max_gb, np.longdouble(900))
    return int(max_gb * np.longdouble(1_000_000_000))


def _min_qualities(qual, rle_pos, pos, l):
    """getMinQuality (ReadCorrection.hpp:2469-2487): min of the raw-space
    qualities over the INCLUSIVE span rle_pos[p] .. rle_pos[p+l-1]."""
    q = np.asarray(qual, np.uint8).astype(np.int32) - 33
    rp = rle_pos.astype(np.int64)
    p = pos.astype(np.int64)
    starts = rp[p]
    ends = rp[p + l - 1] + 1
    if starts.shape[0] == 0:
        return np.zeros(0, np.uint8)
    # pairwise reduceat: even slots reduce q[start:end); odd slots (the
    # inter-span gaps) are discarded
    qpad = np.concatenate([q, np.zeros(1, np.int32)])
    inds = np.empty(2 * starts.shape[0], np.int64)
    inds[0::2] = starts
    inds[1::2] = ends
    mins = np.minimum.reduceat(qpad, inds)[0::2]
    return mins.astype(np.uint8)


_SKETCH_BATCH_READS = 4096


def sketch_high_density_reads(input_paths, params: records.Parameters,
                              repetitive: np.ndarray):
    """Re-sketch the original reads at correction density with per-minimizer
    INCLUSIVE-end min qualities (ReadCorrection.hpp:2228-2344 ReadSelection-
    Functor + getMinQuality 2469-2487 — note the `i<=endPos` span, unlike
    ReadSelection's exclusive end).

    Reads are sketched in multi-read native batches and the quality spans
    are reduced vectorized — bit-identical to the per-read scalar path
    (the per-read dispatch + Python quality loop was ~10 s of an 86 Mbp
    ONT correction run)."""
    from ..sketch import native_sketch

    out = []
    l = params.minimizer_size
    use_batch = native_sketch.available()

    pending = []  # (index, qual|None, rle_pos, codes, bad, read_len)

    def flush():
        if not pending:
            return
        res = native_sketch.sketch_batch_native(
            [p[3] for p in pending], [p[4] for p in pending], l,
            params.density_correction, repetitive) if use_batch else None
        if res is None:
            res = [_minimizers.select_minimizers(
                p[3], p[4], l, params.density_correction, repetitive)
                for p in pending]
        for (index, qual, rle_pos, _, _, read_len), (mins, pos, dirs) in \
                zip(pending, res):
            if qual is None or qual.size == 0:
                quals = np.ones(mins.shape[0], np.uint8)
            else:
                quals = _min_qualities(qual, rle_pos, pos, l)
            out.append(SimpleRead(index, mins, pos.astype(np.uint32),
                                  dirs.astype(np.uint8), quals, read_len))
        pending.clear()

    for read in fastq.iter_reads(input_paths, need_headers=False):
        seq_rle, rle_pos = _rle.rle_encode(read.seq,
                                           params.use_homopolymer_compression)
        codes, bad = _kmers.base_codes(seq_rle)
        pending.append((read.index, read.qual, rle_pos, codes, bad,
                        read.seq.shape[0]))
        if len(pending) >= _SKETCH_BATCH_READS:
            flush()
    flush()
    return out


# -- multiprocess correction (ReadCorrection's OpenMP loop, hpp:1965-2050) --
#
# Each read's correction depends only on the immutable high-density read
# set + alignment lists, so the per-partition loop forks a worker pool:
# state is inherited copy-on-write (no pickling of the read set), workers
# use numpy + the native chain/POA code only (never the device), results
# are written back in read order in the parent (checksum and output bytes
# identical to the sequential path — tests/test_parity_correction.py covers
# n_threads=2). The pool is terminated, not joined-exited, so children
# never run inherited interpreter teardown.
_PAR: dict = {}


def _pool_correct_one(read_index: int):
    st = _PAR
    read = st["high_reads"][read_index]
    low = apply_density_threshold(read, st["params"].density_assembly)
    if low.minimizers.shape[0] < MIN_READ_MINIMIZERS:
        return read_index, read.minimizers
    return read_index, correct_read(
        read, st["align_lists"][read_index], st["high_reads"], st["params"],
        st["min_identity"], st["min_overlap_length"], st["band"])


def run_read_correction(tmp_dir: str, params: records.Parameters,
                        min_identity: float = 0.96,
                        min_overlap_length: int = 1000,
                        n_threads: int = 1, mesh=None):
    stats = records.ReadStats.load(os.path.join(tmp_dir, "read_stats.txt"))
    reads = []
    for r in records.read_read_data(
            os.path.join(tmp_dir, "read_data_init.txt"), with_quality=True):
        reads.append(SimpleRead(r.index, r.minimizers, r.positions,
                                r.directions, r.qualities, r.read_length))

    with open(os.path.join(tmp_dir, "input.txt")) as f:
        input_paths = [line.strip() for line in f if line.strip()]
    repetitive = np.sort(records.load_repetitive_minimizers(
        os.path.join(tmp_dir, "repetitiveMinimizers.bin")))

    max_memory = compute_max_memory(stats.nb_bases)
    memory_per_read = int(np.float32(np.float32(stats.mean_length)
                                     * np.float32(params.density_correction))
                          * np.float32(MEMORY_PER_MINIMIZER))
    memory_per_read = max(memory_per_read, 500)

    mem_low = np.longdouble(stats.nb_minimizers) * MINIMIZER_POSITION_BYTES
    nb_passes = np.ceil(mem_low / np.longdouble(max_memory))
    nb_passes = min(max(nb_passes, np.longdouble(1)), np.longdouble(10))
    chunk_size = int(np.longdouble(stats.nb_minimizers) / nb_passes) + 10

    band = int(np.float32(2500) * np.float32(params.density_correction))

    alignments = mapper.run_read_mapper(
        reads, chunk_size, band,
        alignment_path=os.path.join(tmp_dir, "readAlignmentsLowDensity.bin"),
        mesh=mesh)

    # ---- partitioning (ReadCorrection.hpp:1965-1994, 4519-4713) ----
    align_lists = [alignments.get(i, np.zeros(0, np.uint32)).tolist()
                   for i in range(stats.nb_reads)]
    partitions = None
    pass_no = 0
    memory_increased = int(max_memory * 0.33)
    cur_memory = max_memory
    while True:
        partitions, nb_written = partition_reads(align_lists, cur_memory,
                                                 memory_per_read)
        density = stats.nb_reads / nb_written if nb_written else 1.0
        if density > 0.15:
            break
        pass_no += 1
        cur_memory += memory_increased
        if pass_no > 10:
            break

    log.info("correction partitions: %d (max memory %.2f GB)",
             len(partitions), float(cur_memory) / 1e9)

    # ---- correction (on re-sketched correction-density reads) ----
    high_reads = sketch_high_density_reads(input_paths, params, repetitive)

    from ..utils.forkmap import fork_map

    if n_threads > 1:
        _PAR.update(high_reads=high_reads, align_lists=align_lists,
                    params=params, min_identity=min_identity,
                    min_overlap_length=min_overlap_length, band=band)

    from . import poa_native
    use_native = poa_native.available()
    native_buffers = poa_native.ReadSetBuffers(high_reads) if use_native \
        else None

    checksum = 0
    out_path = os.path.join(tmp_dir, "read_data_corrected.txt")
    with records.ReadDataWriter(out_path, with_quality=False) as writer:
        for (to_load, to_correct) in partitions:
            correct_set = set(to_correct)
            part_align = {i: align_lists[i] for i in to_correct}
            loaded = sorted(set(to_load))
            work = [ri for ri in loaded if ri in correct_set]
            if use_native:
                outs = poa_native.correct_reads_batch(
                    native_buffers, work, align_lists, params, min_identity,
                    min_overlap_length, band, max(n_threads, 1))
                for read_index, mins in zip(work, outs):
                    checksum = _write_read(writer, read_index, mins, params,
                                           checksum)
                continue
            if n_threads > 1 and len(work) > 2 * n_threads:
                for read_index, mins in fork_map(_pool_correct_one, work,
                                                 n_threads):
                    checksum = _write_read(writer, read_index, mins,
                                           params, checksum)
                continue
            for read_index in work:
                read = high_reads[read_index]
                low = apply_density_threshold(read, params.density_assembly)
                if low.minimizers.shape[0] < MIN_READ_MINIMIZERS:
                    checksum = _write_read(writer, read.index, read.minimizers,
                                           params, checksum)
                else:
                    corrected = correct_read(read, part_align.get(read_index),
                                             high_reads, params, min_identity,
                                             min_overlap_length, band)
                    checksum = _write_read(writer, read.index, corrected,
                                           params, checksum)
    # determinism oracle: the reference logs the same per-stage checksum
    # (SURVEY §4.2; src/readSelection/ReadCorrection.hpp:1982-1986 area)
    log.info("Correction checksum: %d", checksum)
    return checksum


def partition_reads(align_lists, max_memory: int, memory_per_read: int):
    """Jaccard-priority BFS partitioning (ReadCorrection.hpp:4519-4713).

    Returns (list of (reads_to_load, reads_to_correct), nb_reads_written).
    """
    import heapq

    n = len(align_lists)
    is_corrected = [False] * n
    is_visited = [False] * n
    partitions = []
    cur_load: list[int] = []
    cur_correct: list[int] = []
    nb_written = 0

    for read_index in range(n):
        if is_corrected[read_index]:
            continue
        cur_load.append(read_index)
        is_visited[read_index] = True
        heap = [(0.0, 0, read_index)]
        tick = 1
        while heap:
            _, _, cur = heapq.heappop(heap)
            if is_corrected[cur]:
                continue
            cur_correct.append(cur)
            is_corrected[cur] = True
            for nb in align_lists[cur]:
                if is_visited[nb]:
                    continue
                cur_load.append(nb)
                is_visited[nb] = True
                dist = _jaccard_distance(align_lists[cur], align_lists[nb])
                heapq.heappush(heap, (dist, tick, nb))
                tick += 1
            if len(cur_load) * memory_per_read > max_memory:
                break
        if len(cur_load) * memory_per_read > max_memory:
            nb_written += len(cur_load)
            partitions.append((cur_load, cur_correct))
            cur_load = []
            cur_correct = []
            is_visited = [False] * n

    if cur_load:
        nb_written += len(cur_load)
        partitions.append((cur_load, cur_correct))
    return partitions, nb_written


def _jaccard_distance(v1, v2):
    """computeJaccardDistance (ReadCorrection.hpp:4462-4496): sorted-list
    merge counting shared/total elements."""
    i = j = 0
    shared = 0
    elements = 0
    while i < len(v1) and j < len(v2):
        if v1[i] == v2[j]:
            shared += 1
            i += 1
            j += 1
        elif v1[i] < v2[j]:
            i += 1
        else:
            j += 1
        elements += 1
    if elements == 0:
        return 1.0
    return float(np.float32(1.0) - np.float32(shared) / np.float32(elements))


def correct_read(read: SimpleRead, aligned, reads, params,
                 min_identity: float, min_overlap_length: int, band: int):
    """correctRead (ReadCorrection.hpp:4958-5002). Returns minimizer array
    (the corrected read, or the input read when correction is not possible)
    paired implicitly with write-time density filtering."""
    if not aligned:
        return read.minimizers

    best = filter_alignments(read, aligned, reads, params, min_identity,
                             min_overlap_length, band)
    if not best:
        return read.minimizers

    ref_low = apply_density_threshold(read, params.density_assembly)
    return perform_poa_correction(ref_low, best, reads, params, band)


def filter_alignments(read, aligned, reads, params, min_identity,
                      min_overlap_length, band):
    """filterAlignments (ReadCorrection.hpp:5006-5117): chain each aligned
    query at init density, keep (query, orientation) passing the overlap /
    identity filters."""
    out = []
    min_identity = np.float32(min_identity)
    for q_index in aligned:
        query = reads[q_index]
        anchors = chainer.collect_anchors(read, query)
        if anchors[0].shape[0] == 0:
            continue
        result = chainer.compute_chaining_alignment(
            anchors, read, query, band, params.minimizer_size,
            need_alignments=False)
        if result.overhang_start > 1000 or result.overhang_end > 1000:
            continue
        if result.align_length < min_overlap_length:
            continue
        if np.float32(result.identity) < min_identity:
            continue
        if not result.alignments:
            continue
        out.append((q_index, result.is_query_reversed))
    return out


def perform_poa_correction(ref_low: SimpleRead, best, reads, params, band):
    """performPoaCorrection4 (ReadCorrection.hpp:5151-5581)."""
    graph = poa.PoaGraph(ref_low.minimizers, ref_low.qualities)
    ref_min_set = set(int(m) for m in ref_low.minimizers)

    for (q_index, is_rev) in best:
        query = reads[q_index]
        q_low = apply_density_threshold(query, params.density_assembly)
        if q_low.minimizers.shape[0] < MIN_READ_MINIMIZERS:
            continue
        if is_rev:
            q_low = q_low.reverse_complement()
        anchors = chainer.collect_anchors(ref_low, q_low)
        result = chainer.compute_chaining_alignment(
            anchors, ref_low, q_low, band, params.minimizer_size)
        graph.add_alignment(result.alignments, ref_low.minimizers,
                            q_low.minimizers, q_low.qualities)

    walked = poa.compute_path(graph, ref_min_set)
    if walked is None:
        corrected_mins = list(ref_low.minimizers)
        corrected_quals = list(ref_low.qualities)
    else:
        corrected_mins, corrected_quals = walked
    trimmed, _ = poa.trim_corrected_path(ref_low.minimizers, corrected_mins,
                                         corrected_quals)
    return np.asarray(trimmed, np.uint32)


def _write_read(writer, read_index: int, minimizers, params, checksum: int):
    """writeRead (ReadCorrection.hpp:6367-6484): density filter ->
    palindrome purge -> {n, linear, minimizers} record + checksum."""
    minimizers = np.asarray(minimizers, np.uint32)
    if minimizers.shape[0] < params.kminmer_size_first:
        return checksum
    keep = minimizer_is_selected(minimizers.astype(np.uint64),
                                 params.density_assembly)
    minimizers = minimizers[keep]
    if minimizers.shape[0] < params.kminmer_size_first:
        return checksum
    minimizers = purge_palindrome(minimizers, params.kminmer_size_first,
                                  params.kminmer_size_last)
    n = int(minimizers.shape[0])
    for m in minimizers.tolist():
        checksum = (checksum + read_index * m * n) & 0xFFFFFFFFFFFFFFFF
    writer.write(records.MinimizerRead(read_index, minimizers, None, None,
                                       None, is_circular=bool(CONTIG_LINEAR)))
    return checksum
