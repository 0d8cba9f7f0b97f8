"""Step-3 + end-to-end parity: final assignment CSV vs reference Classify."""

import os

import pytest

from lime_tpu.config import LimeConfig
from lime_tpu.pipeline import classify, cluster_bwt, cluster_lcp, run_paired

HOST = LimeConfig(executor="host")


@pytest.fixture(scope="module")
def with_results(dataset):
    """Step-1/2 artifacts for all collections (already oracle-identical)."""
    for fasta in dataset.collections:
        cluster_lcp(fasta, dataset.num_reads, dataset.num_genomes, HOST)
        cluster_bwt(fasta, dataset.read_len, HOST)
    return dataset


def _read(path):
    with open(path) as f:
        return f.read()


def _compare_csv(oracle, ds, res_prefixes, tmp_path, tax_rank, higher):
    ours = str(tmp_path / f"ours_{tax_rank}_{higher}.csv")
    theirs = str(tmp_path / f"oracle_{tax_rank}_{higher}.csv")
    oracle.classify(res_prefixes, ds.num_reads, ds.num_genomes, theirs,
                    ds.lineage_path, tax_rank, higher=higher)
    cfg = HOST.replace(tax_rank=tax_rank, assign_higher=bool(higher))
    classify(res_prefixes, ds.num_reads, ds.num_genomes, ours,
             ds.lineage_path, cfg)
    ours_txt, theirs_txt = _read(ours), _read(theirs)
    assert ours_txt == theirs_txt, _first_diff(ours_txt, theirs_txt)


def _first_diff(a, b):
    al, bl = a.splitlines(), b.splitlines()
    for i, (x, y) in enumerate(zip(al, bl)):
        if x != y:
            return f"line {i}: ours={x!r} oracle={y!r}"
    return f"line count {len(al)} vs {len(bl)}"


def test_paired_species(with_results, oracle, tmp_path):
    prefixes = [c + ".res" for c in with_results.collections]
    _compare_csv(oracle, with_results, prefixes, tmp_path, tax_rank=1, higher=0)


def test_paired_all_ranks(with_results, oracle, tmp_path):
    prefixes = [c + ".res" for c in with_results.collections]
    for rank in (0, 2, 3, 6):
        _compare_csv(oracle, with_results, prefixes, tmp_path,
                     tax_rank=rank, higher=0)


def test_paired_higher(with_results, oracle, tmp_path):
    prefixes = [c + ".res" for c in with_results.collections]
    for rank in (1, 2):
        _compare_csv(oracle, with_results, prefixes, tmp_path,
                     tax_rank=rank, higher=1)


def test_single_end(with_results, oracle, tmp_path):
    prefixes = [c + ".res" for c in with_results.single_collections]
    _compare_csv(oracle, with_results, prefixes, tmp_path, tax_rank=1, higher=0)
    _compare_csv(oracle, with_results, prefixes, tmp_path, tax_rank=1, higher=1)


def test_run_paired_end_to_end(dataset, oracle, tmp_path):
    """Full pipeline driver vs the full oracle chain."""
    theirs = str(tmp_path / "oracle_e2e.csv")
    for fasta in dataset.collections:
        oracle.cluster_lcp(fasta, dataset.num_reads, dataset.num_genomes, 16)
        oracle.cluster_bwt(fasta, dataset.read_len, 0.25)
    oracle.classify([c + ".res" for c in dataset.collections],
                    dataset.num_reads, dataset.num_genomes, theirs,
                    dataset.lineage_path, 1)

    ours = str(tmp_path / "ours_e2e.csv")
    summary = run_paired(dataset.collections, ours, dataset.num_reads,
                         dataset.num_genomes, dataset.lineage_path,
                         dataset.read_len, HOST)
    assert _read(ours) == _read(theirs)
    # sanity: positive controls classify, negatives stay unclassified
    assert summary.classified > 0.7 * dataset.num_reads
    assert summary.unclassified >= 0.05 * dataset.num_reads
