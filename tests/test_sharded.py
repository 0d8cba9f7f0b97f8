"""Sharded SPMD pipeline vs host pipeline on an 8-device virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lime_tpu.config import LimeConfig
from lime_tpu.constants import SYMBOL_RANK_LUT
from lime_tpu.formats.arrays import open_da, open_ebwt, open_lcp
from lime_tpu.formats.lineage import read_lineage
from lime_tpu.ops.classify_ops import classify_reads
from lime_tpu.ops.cluster_scan import find_clusters
from lime_tpu.ops.scoring import normalize_scores, score_clusters
from lime_tpu.parallel import banded_fused_step, make_mesh, make_sharded_pipeline

from .synth import make_dataset

HOST = LimeConfig(executor="host")


@pytest.fixture(scope="module")
def clean_dataset(tmp_path_factory):
    """Degenerate-free dataset (the banded path asserts pure ACGT)."""
    root = tmp_path_factory.mktemp("synth_clean")
    return make_dataset(str(root), num_pairs=128, read_len=64,
                        genome_lens=(4000, 3000), seed=11,
                        degenerate_rate=0.0)


def _host_reference(ds, window):
    """Host pipeline producing (types, taxid, sim) + per-file sims."""
    sims = []
    for fasta in ds.collections:
        lcp = np.asarray(open_lcp(fasta))
        da = np.asarray(open_da(fasta))
        ebwt = np.asarray(open_ebwt(fasta))
        p, l = find_clusters(lcp, da, ds.num_reads, 16)
        assert len(l) and l.max() <= window, "bad test data/window"
        sims.append(score_clusters(p, l, da, ebwt, ds.num_reads,
                                   ds.num_genomes, HOST))
    norm_rows = np.stack([normalize_scores(s, ds.read_len, 16) for s in sims])
    rowmax = norm_rows.max(axis=2)
    qualify = rowmax > np.float32(0.25)
    dense = np.where(qualify[:, :, None], norm_rows, 0).transpose(1, 0, 2)
    maxs = np.where(qualify, rowmax, 0).T
    lineage = read_lineage(ds.lineage_path)
    res = classify_reads(dense.astype(np.float32), maxs.astype(np.float32),
                         lineage.at_rank(1), lineage.taxids, 1,
                         np.float32(0.02), False)
    return res, sims


def _padded_inputs(ds, n_shards):
    lcps, das, syms = [], [], []
    n = len(open_lcp(ds.collections[0]))
    n_pad = -(-n // n_shards) * n_shards
    for fasta in ds.collections:
        lcp = np.zeros(n_pad, np.int32)
        da = np.zeros(n_pad, np.int32)
        sym = np.full(n_pad, -1, np.int32)
        lcp[:n] = np.asarray(open_lcp(fasta))
        da[:n] = np.asarray(open_da(fasta))
        sym[:n] = SYMBOL_RANK_LUT[np.asarray(open_ebwt(fasta))]
        lcps.append(lcp)
        das.append(da)
        syms.append(sym)
    return np.stack(lcps), np.stack(das), np.stack(syms)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4), (1, 1)])
def test_sharded_pipeline_matches_host(clean_dataset, shape):
    ds = clean_dataset
    window = 64
    host_res, _ = _host_reference(ds, window)

    n_dev = shape[0] * shape[1]
    if n_dev > len(jax.devices()):
        pytest.skip("not enough devices")
    mesh = make_mesh(n_dev, shape=shape)
    lcp, da, sym = _padded_inputs(ds, n_dev)

    lineage = read_lineage(ds.lineage_path)
    T = ds.num_genomes
    Tp = 128
    tax = np.zeros(Tp, np.uint32)
    tax[:T] = lineage.at_rank(1)
    rank_matrix = np.zeros((6, Tp), np.uint32)
    rank_matrix[:, :T] = lineage.taxids
    valid_t = np.arange(Tp) < T

    step = make_sharded_pipeline(
        mesh, num_files=4, num_reads=ds.num_reads, num_refs=Tp,
        alpha=16, window=window, read_len=ds.read_len, beta=0.25,
        tax_rank=1, assign_higher=False)
    types, taxid, sim = step(lcp, da, sym, tax, rank_matrix, valid_t,
                             jnp.float32(0.02))
    np.testing.assert_array_equal(np.asarray(types), host_res.types)
    np.testing.assert_array_equal(np.asarray(sim), host_res.sim)
    ok = np.asarray(types) != 0
    np.testing.assert_array_equal(np.asarray(taxid)[ok], host_res.taxid[ok])


def test_banded_single_device_matches_host_scoring(clean_dataset):
    ds = clean_dataset
    _, sims = _host_reference(ds, 64)
    fasta = ds.collections[0]
    lcp = np.asarray(open_lcp(fasta)).astype(np.int32)
    da = np.asarray(open_da(fasta)).astype(np.int32)
    sym = SYMBOL_RANK_LUT[np.asarray(open_ebwt(fasta))].astype(np.int32)
    out = jax.jit(banded_fused_step, static_argnums=(3, 4, 5, 6))(
        lcp, da, sym, ds.num_reads, ds.num_genomes, 16, 64)
    np.testing.assert_array_equal(np.asarray(out) % 256, sims[0])
