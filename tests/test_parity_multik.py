"""Golden parity: chained multi-k passes (first pass, refined re-count,
multiplex) vs the reference binary."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import datagen
import multik_driver
import refharness

# Auto-builds the oracle binary (or fails loudly) — parity suites must
# never silently skip (see refharness.require_reference).
refharness.require_reference()


def test_multik_chain_parity(tmp_path):
    g = datagen.random_genome(50_000, seed=51)
    rep = g[8000:10500]
    genome = np.concatenate([g, rep])
    fq = str(tmp_path / "reads.fastq.gz")
    datagen.write_fastq(fq, datagen.sample_reads(genome, 18, 8000,
                                                 error_rate=0.004, seed=52))
    messages = []
    ok, reached = multik_driver.run_chain(
        fq, str(tmp_path / "ref"), str(tmp_path / "ours"),
        first_k=4, last_k=8, log=messages.append)
    assert ok, "\n".join(messages)
    assert reached == 8


def test_multik_chain_parity_ont(tmp_path):
    """ONT path: readSelection (correction settings) -> readCorrection ->
    chained multi-k passes -> final post-processing, all byte-compared."""
    genome = datagen.random_genome(60_000, seed=61)
    fq = str(tmp_path / "reads.fastq.gz")
    datagen.write_fastq(fq, datagen.sample_reads(genome, 18, 6000,
                                                 error_rate=0.03, seed=62))
    messages = []
    ok, reached = multik_driver.run_chain(
        fq, str(tmp_path / "ref"), str(tmp_path / "ours"),
        first_k=4, last_k=7, log=messages.append, platform="ont")
    assert ok, "\n".join(messages)
    final_ok = multik_driver.run_final_stages(
        str(tmp_path / "ref"), str(tmp_path / "ours"), 4, 7,
        log=messages.append)
    assert final_ok, "\n".join(messages)


@pytest.mark.slow
def test_multik_chain_parity_deep_k(tmp_path):
    """k-ladder depth seen in real runs (VERDICT r2: in-repo chains stopped
    at k=8 while a 1 Mb assembly reaches k~90): chain a >=1 Mb genome with
    a repeat family through k=32, byte-comparing every pass artifact."""
    g = datagen.random_genome(1_000_000, seed=71)
    rep = g[200_000:206_000]
    genome = np.concatenate([g[:600_000], rep, g[600_000:], rep])
    fq = str(tmp_path / "reads.fastq.gz")
    datagen.write_fastq(fq, datagen.sample_reads(genome, 25, 10_000,
                                                 error_rate=0.001, seed=72))
    messages = []
    ok, reached = multik_driver.run_chain(
        fq, str(tmp_path / "ref"), str(tmp_path / "ours"),
        first_k=4, last_k=32, log=messages.append)
    assert ok, "\n".join(messages)
    assert reached == 32
