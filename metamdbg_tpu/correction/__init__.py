"""ONT read-correction subsystem (L3 of the reference layer map).

Re-designs src/readSelection/{ReadCorrection,ReadMapper,MinimizerChainer,
MinimizerAligner}.hpp as batch array passes:

- mapper:   all-vs-all minimizer-pair mapping (sorted-table join + banded
            chaining DP) -> per-read aligned-read sets
- chainer:  minimizer-space anchor chaining -> edit transcript
- aligner:  overlap DP in minimizer space (trim oracle)
- poa:      quality-weighted minimizer DAG consensus
- stage:    orchestration, partitioning, read_data_corrected.txt writer
"""
