"""Step-1 parity: our cluster scan vs the reference ClusterLCP binary."""

import os

import numpy as np

from lime_tpu.config import LimeConfig
from lime_tpu.formats.arrays import (
    aux_path_for,
    clusters_path_for,
    read_aux,
    read_clusters,
)
from lime_tpu.pipeline import cluster_lcp

HOST = LimeConfig(executor="host")


def _oracle_artifacts(oracle, ds, fasta, alpha=16, threads=1):
    """Run reference ClusterLCP and capture its artifacts."""
    oracle.cluster_lcp(fasta, ds.num_reads, ds.num_genomes, alpha, threads)
    clrs = clusters_path_for(fasta, alpha)
    aux = aux_path_for(fasta)
    p, l = read_clusters(clrs)
    meta = read_aux(aux)
    return p, l, meta


def test_clusters_bit_identical(dataset, oracle, tmp_path):
    for fasta in dataset.collections:
        op, ol, ometa = _oracle_artifacts(oracle, dataset, fasta)
        meta = cluster_lcp(fasta, dataset.num_reads, dataset.num_genomes, HOST)
        p, l = read_clusters(clusters_path_for(fasta, 16))

        assert meta == ometa
        np.testing.assert_array_equal(p, op)
        np.testing.assert_array_equal(l, ol)

        with open(aux_path_for(fasta), "rb") as f:
            ours = f.read()
        # re-run oracle to regenerate its aux (ours overwrote it)
        oracle.cluster_lcp(fasta, dataset.num_reads, dataset.num_genomes, 16, 1)
        with open(aux_path_for(fasta), "rb") as f:
            theirs = f.read()
        assert ours == theirs


def test_multithread_oracle_same_set(dataset, oracle):
    """The oracle's .clrs order is thread-dependent but the set matches ours."""
    fasta = dataset.collections[0]
    op, ol, ometa = _oracle_artifacts(oracle, dataset, fasta, threads=3)
    meta = cluster_lcp(fasta, dataset.num_reads, dataset.num_genomes, HOST)
    p, l = read_clusters(clusters_path_for(fasta, 16))
    assert meta.n_clusters == ometa.n_clusters
    assert meta.max_len == ometa.max_len
    ours = set(zip(p.tolist(), l.tolist()))
    theirs = set(zip(op.tolist(), ol.tolist()))
    assert ours == theirs


def test_alpha_sweep(dataset, oracle):
    fasta = dataset.collections[0]
    for alpha in (12, 20, 30):
        op, ol, ometa = _oracle_artifacts(oracle, dataset, fasta, alpha=alpha)
        cfg = HOST.replace(alpha=alpha)
        meta = cluster_lcp(fasta, dataset.num_reads, dataset.num_genomes, cfg)
        p, l = read_clusters(clusters_path_for(fasta, alpha))
        assert meta == ometa
        np.testing.assert_array_equal(p, op)
        np.testing.assert_array_equal(l, ol)
    # restore default-alpha artifacts for downstream fixtures
    cluster_lcp(fasta, dataset.num_reads, dataset.num_genomes, HOST)
