"""metamdbg_tpu — a TPU-native minimizer-space de Bruijn graph (MDBG) assembler.

A from-scratch re-design of the metaMDBG method (minimizer-space assembly of
accurate long reads, optimized for metagenomes) for TPU hardware:

- sketching, k-min-mer counting and graph construction are expressed as batched
  array programs (JAX/XLA) with Pallas kernels for the hot inner loops,
- multi-chip scale-out uses `jax.sharding` meshes with XLA collectives
  (all_to_all routing of hash-sharded count tables),
- the host runtime (fastq IO, record files, orchestration) is Python + C++.

Layout:
    utils/      bit-exact hashing, u64-as-u32-pair device math, stats
    io/         on-disk record formats (read_data, kminmerData, unitigGraph...)
    sketch/     read selection: RLE, rolling canonical k-mers, minimizers
    kernels/    Pallas TPU kernels
    count/      sharded k-min-mer counting, rescue, refined abundances
    graph/      MDBG edges, unitig compaction, simplification, contigs
    correction/ ONT read correction (minimizer-space mapping + POA)
    basespace/  contig reconstruction + polishing
    parallel/   device mesh utilities, sharded tables
    pipeline/   `asm` / `gfa` orchestrator and CLI
"""

__version__ = "0.1.0"
