"""Synthetic read-set generator for parity and benchmark tests.

Generates a random genome and samples long reads (HiFi-like: low error, or
ONT-like: higher error) with quality strings, written as fastq[.gz]. Used to
produce inputs on which the reference binary (.refbuild) and metamdbg_tpu are
compared stage by stage.
"""

import gzip

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome(length: int, seed: int = 0, circular: bool = True) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return BASES[rng.integers(0, 4, size=length)]


def _revcomp(seq: np.ndarray) -> np.ndarray:
    comp = np.zeros(256, dtype=np.uint8)
    comp[ord("A")] = ord("T")
    comp[ord("T")] = ord("A")
    comp[ord("C")] = ord("G")
    comp[ord("G")] = ord("C")
    return comp[seq[::-1]]


def mutate(seq: np.ndarray, rng, sub_rate: float, ins_rate: float = 0.0,
           del_rate: float = 0.0) -> np.ndarray:
    """Applies substitutions + single-base indels (ONT-like error mix)."""
    if sub_rate > 0:
        length = seq.shape[0]
        nerr = rng.binomial(length, sub_rate)
        if nerr:
            pos = rng.integers(0, length, size=nerr)
            seq[pos] = BASES[(np.searchsorted(BASES, seq[pos])
                              + rng.integers(1, 4, size=nerr)) % 4]
    if ins_rate > 0 or del_rate > 0:
        r = rng.random(seq.shape[0])
        keep = r >= del_rate
        ins = r < del_rate + ins_rate
        ins &= keep
        parts = []
        out = seq[keep]
        ins_pos = np.flatnonzero(ins[keep]) if keep.any() else np.zeros(0, int)
        if ins_pos.size:
            ins_bases = BASES[rng.integers(0, 4, size=ins_pos.size)]
            out = np.insert(out, ins_pos, ins_bases)
        seq = out
    return seq


def sample_reads(genome: np.ndarray, coverage: float, mean_length: int,
                 error_rate: float = 0.0, seed: int = 1, circular: bool = True,
                 mean_quality: int = 30, ins_rate: float = 0.0,
                 del_rate: float = 0.0):
    """Yields (header, seq_bytes, qual_bytes) tuples. `error_rate` is the
    substitution rate; ins/del rates add ONT-like single-base indels."""
    rng = np.random.default_rng(seed)
    g = genome
    n = g.shape[0]
    total = int(n * coverage)
    emitted = 0
    read_id = 0
    while emitted < total:
        length = max(200, int(rng.normal(mean_length, mean_length / 6)))
        start = int(rng.integers(0, n))
        if circular:
            idx = (start + np.arange(length)) % n
            seq = g[idx]
        else:
            length = min(length, n - start)
            seq = g[start:start + length]
        seq = mutate(seq.copy(), rng, error_rate, ins_rate, del_rate)
        if rng.random() < 0.5:
            seq = _revcomp(seq)
        qual = np.clip(rng.normal(mean_quality, 3, size=seq.shape[0]), 3,
                       60).astype(np.uint8) + 33
        yield f"read_{read_id}", seq, qual
        emitted += length
        read_id += 1


def write_fastq(path: str, reads):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wb") as f:
        for header, seq, qual in reads:
            f.write(b"@" + header.encode() + b"\n")
            f.write(seq.tobytes() + b"\n+\n")
            f.write(qual.tobytes() + b"\n")


def make_test_fastq(path: str, genome_len: int = 100_000, coverage: float = 20,
                    mean_length: int = 8000, error_rate: float = 0.001,
                    seed: int = 0):
    genome = random_genome(genome_len, seed=seed)
    write_fastq(path, sample_reads(genome, coverage, mean_length, error_rate,
                                   seed=seed + 1))
    return genome


def make_metagenome(n_genomes=5, sizes=None, repeat_len=5000, seed=20):
    """Synthetic metagenome: genomes share a mutated repeat family
    (inserted 2-3x each), mimicking inter-genome repeats. Returns list of
    genomes (np.uint8 ascii)."""
    rng = np.random.default_rng(seed)
    if sizes is None:
        sizes = [600_000, 800_000, 1_000_000, 1_200_000, 700_000][:n_genomes]
    repeat = BASES[rng.integers(0, 4, size=repeat_len)]
    genomes = []
    for i, size in enumerate(sizes):
        g = BASES[rng.integers(0, 4, size=size)]
        n_copies = int(rng.integers(2, 4))
        for _ in range(n_copies):
            rep = mutate(repeat.copy(), rng, 0.02)  # ~98% identity copies
            pos = int(rng.integers(0, size - rep.shape[0]))
            g[pos:pos + rep.shape[0]] = rep[:g[pos:pos + rep.shape[0]].shape[0]]
        genomes.append(g)
    return genomes


def metagenome_reads(genomes, coverages, mean_length=10000, error_rate=0.001,
                     seed=21, ins_rate=0.0, del_rate=0.0, mean_quality=30):
    """Yields reads from each genome at its own coverage (uneven profile)."""
    rid = 0
    for gi, (g, cov) in enumerate(zip(genomes, coverages)):
        for header, seq, qual in sample_reads(
                g, cov, mean_length, error_rate, seed=seed + gi,
                circular=True, mean_quality=mean_quality, ins_rate=ins_rate,
                del_rate=del_rate):
            yield f"g{gi}_{rid}", seq, qual
            rid += 1
