"""QUAST-class assembly metrics for the in-repo quality harness
(VERDICT r2 missing #3): k-mer based genome fraction, error-event rate and
a misassembly proxy, computed without external tools.

Method: canonical 31-mers (2 x 31 = 62 bits, exact u64 values via
metamdbg_tpu.sketch.kmers). A contig k-mer absent from every genome marks
an error; a RUN of absent k-mers counts as one error event (one substitution
poisons <= k consecutive k-mers). The misassembly proxy counts genome-id
switches along a contig using k-mers unique to one genome.
"""

import numpy as np

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from metamdbg_tpu.sketch import kmers as _kmers  # noqa: E402

K = 31


def _canon_kmers(seq: np.ndarray) -> np.ndarray:
    codes, bad = _kmers.base_codes(np.asarray(seq, np.uint8))
    vals, _, valid = _kmers.canonical_kmers(codes, bad, K)
    return vals, valid


def _genome_kmers(genome: np.ndarray, circular: bool = True):
    g = np.asarray(genome, np.uint8)
    if circular:
        g = np.concatenate([g, g[:K - 1]])
    vals, valid = _canon_kmers(g)
    return np.unique(vals[valid])


def _lookup(table: np.ndarray, vals: np.ndarray):
    """(hit mask, clipped insert index) of vals in a sorted table, in the
    ORIGINAL vals order. Queries are sorted first: random binary-search
    probes into a GB-scale table run ~10x slower than a monotone walk."""
    if table.shape[0] == 0 or vals.shape[0] == 0:
        return np.zeros(vals.shape[0], bool), np.zeros(vals.shape[0],
                                                       np.int64)
    o = np.argsort(vals, kind="stable")
    i_s = np.searchsorted(table, vals[o])
    i = np.empty(vals.shape[0], np.int64)
    i[o] = i_s
    i_c = np.minimum(i, table.shape[0] - 1)
    hit = table[i_c] == vals
    return hit, i_c


def assembly_metrics(contigs, genomes, circular=True):
    """contigs: list of np.uint8 sequences; genomes: list of np.uint8.

    Returns dict with: total_len, n_contigs, n50, genome_fraction (mean
    over genomes), per_genome_fraction, error_events_per_100kb,
    misassembly_switches, unaligned_fraction.
    """
    per_genome = [_genome_kmers(g, circular) for g in genomes]
    all_sorted = np.unique(np.concatenate(per_genome)) if per_genome else \
        np.zeros(0, np.uint64)

    # k-mers unique to ONE genome -> genome id (for the misassembly proxy)
    if len(per_genome) > 1:
        cat = np.concatenate(per_genome)
        gids = np.concatenate([np.full(p.shape[0], i, np.int32)
                               for i, p in enumerate(per_genome)])
        order = np.argsort(cat, kind="stable")
        cat, gids = cat[order], gids[order]
        first = np.ones(cat.shape[0], bool)
        first[1:] = cat[1:] != cat[:-1]
        counts = np.diff(np.append(np.flatnonzero(first), cat.shape[0]))
        uniq_mask = np.repeat(counts == 1, counts)
        uniq_kmers = cat[uniq_mask]
        uniq_gids = gids[uniq_mask]
    else:
        uniq_kmers = all_sorted
        uniq_gids = np.zeros(all_sorted.shape[0], np.int32)

    lengths = []
    error_events = 0
    switches = 0
    unaligned_kmers = 0
    total_kmers = 0

    contig_kmers_all = []
    for contig in contigs:
        c = np.asarray(contig, np.uint8)
        lengths.append(c.shape[0])
        vals, valid = _canon_kmers(c)
        vals = vals[valid]
        if vals.shape[0] == 0:
            continue
        total_kmers += vals.shape[0]
        hit, _ = _lookup(all_sorted, vals)
        unaligned_kmers += int((~hit).sum())
        # error events: runs of absent k-mers
        if (~hit).any():
            absent = (~hit).astype(np.int8)
            starts = int(absent[0] == 1) + int(
                ((absent[1:] == 1) & (absent[:-1] == 0)).sum())
            error_events += starts
        contig_kmers_all.append(vals[hit])
        # misassembly proxy: genome-id switches along unique k-mers
        if len(genomes) > 1:
            uhit, ui_c = _lookup(uniq_kmers, vals)
            path = uniq_gids[ui_c[uhit]]
            if path.shape[0] > 1:
                # ignore isolated flickers (< 25 consecutive k-mers) which
                # shared/homologous regions produce. Run-length encoded:
                # the old per-element loop was ~10 min of Python at the
                # 10 Gbp scale; iterating runs is equivalent (transitions
                # are all that matter) and ~1e4x fewer iterations.
                change = np.flatnonzero(np.diff(path)) + 1
                starts = np.concatenate([[0], change])
                lens = np.diff(np.append(starts, path.shape[0]))
                run_gids = path[starts]
                sw = 0
                cur_gid, cur_len = int(run_gids[0]), 0
                for g, ln in zip(run_gids.tolist(), lens.tolist()):
                    if ln >= 25 and cur_len >= 25 and g != cur_gid:
                        sw += 1
                    if ln >= 25:
                        cur_gid, cur_len = g, ln
                switches += sw

    # genome fraction: share of each genome's k-mers present in any contig
    if contig_kmers_all:
        ckm = np.unique(np.concatenate(contig_kmers_all))
    else:
        ckm = np.zeros(0, np.uint64)
    fracs = []
    for p in per_genome:
        if p.shape[0] == 0:
            fracs.append(0.0)
            continue
        i = np.searchsorted(ckm, p)
        i_c = np.minimum(i, max(ckm.shape[0] - 1, 0))
        h = (ckm[i_c] == p) if ckm.shape[0] else np.zeros(p.shape[0], bool)
        fracs.append(float(h.mean()))

    total = int(sum(lengths))
    n50 = 0
    acc = 0
    for ln in sorted(lengths, reverse=True):
        acc += ln
        if acc * 2 >= total:
            n50 = ln
            break
    return {
        "total_len": total,
        "n_contigs": len(lengths),
        "n50": n50,
        "genome_fraction": float(np.mean(fracs)) if fracs else 0.0,
        "per_genome_fraction": [round(f, 5) for f in fracs],
        "error_events_per_100kb":
            round(error_events / total * 1e5, 3) if total else 0.0,
        "misassembly_switches": switches,
        "unaligned_fraction":
            round(unaligned_kmers / total_kmers, 5) if total_kmers else 0.0,
    }


def load_fasta_gz(path: str):
    import gzip
    seqs = []
    cur = []
    with gzip.open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if line.startswith(b">"):
                if cur:
                    seqs.append(np.frombuffer(b"".join(cur), np.uint8))
                cur = []
            else:
                cur.append(line)
    if cur:
        seqs.append(np.frombuffer(b"".join(cur), np.uint8))
    return seqs
