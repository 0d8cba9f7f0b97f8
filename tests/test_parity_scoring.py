"""Step-2 parity: our scorer vs the reference ClusterBWT_DA binary.

Compares the raw .res.bin / .res.pos bytes — covers the similarity matrix,
u8 counter semantics, IUPAC waterfall, normalization and encoding at once.
"""

import os
import shutil

import pytest

from lime_tpu.config import LimeConfig
from lime_tpu.pipeline import cluster_bwt, cluster_lcp

HOST = LimeConfig(executor="host")


def _read(path):
    with open(path, "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def with_clusters(dataset):
    """Ensure step-1 artifacts exist for every collection (ours == oracle's)."""
    for fasta in dataset.collections:
        cluster_lcp(fasta, dataset.num_reads, dataset.num_genomes, HOST)
    return dataset


def _compare_res(oracle, ds, fasta, ebwt_mode: int, beta=0.25):
    cfg = HOST.replace(use_ebwt=bool(ebwt_mode), beta=beta)
    oracle.cluster_bwt(fasta, ds.read_len, beta, ebwt=ebwt_mode)
    oracle_bin = _read(fasta + ".res.bin")
    oracle_pos = _read(fasta + ".res.pos")
    cluster_bwt(fasta, ds.read_len, cfg)
    assert _read(fasta + ".res.bin") == oracle_bin, "res.bin differs"
    assert _read(fasta + ".res.pos") == oracle_pos, "res.pos differs"


def test_ebwt_scoring_bit_identical(with_clusters, oracle):
    for fasta in with_clusters.collections:
        _compare_res(oracle, with_clusters, fasta, ebwt_mode=1)


def test_da_only_scoring_bit_identical(with_clusters, oracle):
    for fasta in with_clusters.collections[:2]:
        _compare_res(oracle, with_clusters, fasta, ebwt_mode=0)


def test_beta_sweep(with_clusters, oracle):
    fasta = with_clusters.collections[0]
    for beta in (0.1, 0.5):
        _compare_res(oracle, with_clusters, fasta, ebwt_mode=1, beta=beta)
    _compare_res(oracle, with_clusters, fasta, ebwt_mode=1)  # restore default


def test_text_results_match(with_clusters, oracle):
    """BIN=0 text output parity."""
    fasta = with_clusters.collections[0]
    oracle.cluster_bwt(fasta, with_clusters.read_len, 0.25, ebwt=1, bin_out=0)
    oracle_txt = _read(fasta + ".res.txt")
    cfg = HOST.replace(binary_results=False)
    cluster_bwt(fasta, with_clusters.read_len, cfg)
    assert _read(fasta + ".res.txt") == oracle_txt
    os.remove(fasta + ".res.txt")
    # regenerate binary artifacts for downstream tests
    cluster_bwt(fasta, with_clusters.read_len, HOST)
