"""Row-blocked fused mode (setB2-scale memory plan) vs the host path.

Forces the blocked branch with a tiny LIME_HBM_BUDGET so the similarity
stack is processed in multiple row blocks with the packed streams
replayed from device memory — outputs must be byte-identical to the
exact host pipeline on the same index files.
"""

import os

import numpy as np
import pytest

from lime_tpu import native
from lime_tpu.config import LimeConfig
from lime_tpu.formats.arrays import write_index_arrays
from lime_tpu.pipeline import run_paired

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

NUM_READS, NUM_GENOMES, N_POS = 20_000, 50, 200_000


def _write_collection(path, rng, deg_frac=0.0):
    n = N_POS
    lcp = rng.integers(0, 2 * 16, n).astype(np.uint32)
    run_at = rng.choice(n - 40, n // 40, replace=False)
    for s in run_at:
        w = rng.integers(2, 30)
        lcp[s:s + w] = rng.integers(16, 30)
    da = np.where(rng.random(n) < 0.6,
                  rng.integers(0, NUM_READS, n),
                  rng.integers(NUM_READS, NUM_READS + NUM_GENOMES, n)
                  ).astype(np.uint32)
    ebwt = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)].copy()
    if deg_frac:
        k = int(n * deg_frac)
        ebwt[rng.choice(n, k, replace=False)] = ord("N")
    with open(path, "w") as f:
        f.write(">synthetic index only\n")
    write_index_arrays(path, ebwt, lcp, da)


@pytest.fixture(scope="module")
def blocked_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("blocked")
    rng = np.random.default_rng(99)
    cols = []
    for i, tag in enumerate(("1F", "1RC", "2F", "2RC")):
        path = str(root / f"col_{tag}.fasta")
        _write_collection(path, rng, deg_frac=0.002 if i < 2 else 0.0)
        cols.append(path)
    lineage = str(root / "LineageFile.csv")
    with open(lineage, "w") as f:
        f.write("Accession_number;Species;Genus;Family;Order;Class;"
                "Phylum\n")
        for g in range(NUM_GENOMES):
            f.write(f"ACC{g};{100 + g % 17};{200 + g % 7};{301};{401};"
                    f"{501};{601}\n")
    return root, cols, lineage


def test_blocked_matches_host(blocked_dataset, monkeypatch):
    root, cols, lineage = blocked_dataset
    host_out = str(root / "host.csv")
    run_paired(cols, host_out, NUM_READS, NUM_GENOMES, lineage, 100,
               LimeConfig(executor="host"))

    # ~a few hundred KB budget -> B == classify block (16384) -> 2 blocks
    monkeypatch.setenv("LIME_HBM_BUDGET", "1")
    blocked_out = str(root / "blocked.csv")
    run_paired(cols, blocked_out, NUM_READS, NUM_GENOMES, lineage, 100,
               LimeConfig(executor="tpu", fused=True))
    with open(host_out) as f:
        want = f.read()
    with open(blocked_out) as f:
        got = f.read()
    assert got == want


def test_blocked_single_end(blocked_dataset, monkeypatch):
    root, cols, lineage = blocked_dataset
    from lime_tpu.pipeline import run_single

    host_out = str(root / "host2.csv")
    run_single(cols[:2], host_out, NUM_READS, NUM_GENOMES, lineage, 100,
               LimeConfig(executor="host"))
    monkeypatch.setenv("LIME_HBM_BUDGET", "1")
    blocked_out = str(root / "blocked2.csv")
    run_single(cols[:2], blocked_out, NUM_READS, NUM_GENOMES, lineage,
               100, LimeConfig(executor="tpu", fused=True))
    with open(host_out) as f:
        want = f.read()
    with open(blocked_out) as f:
        got = f.read()
    assert got == want


@pytest.mark.parametrize("variant", ["wide", "ebwt0"])
def test_blocked_flag_variants(blocked_dataset, monkeypatch, variant):
    """Row-blocked mode under wide counters / document-count scoring."""
    root, cols, lineage = blocked_dataset
    kw = (dict(wide_sim=True) if variant == "wide"
          else dict(use_ebwt=False))
    host_out = str(root / f"host_{variant}.csv")
    run_paired(cols, host_out, NUM_READS, NUM_GENOMES, lineage, 100,
               LimeConfig(executor="host", **kw))
    monkeypatch.setenv("LIME_HBM_BUDGET", "1")
    blocked_out = str(root / f"blocked_{variant}.csv")
    run_paired(cols, blocked_out, NUM_READS, NUM_GENOMES, lineage, 100,
               LimeConfig(executor="tpu", fused=True, **kw))
    with open(host_out) as f:
        want = f.read()
    with open(blocked_out) as f:
        got = f.read()
    assert got == want


def test_blocked_owner_passes_match_host(tmp_path, monkeypatch):
    """Forced multi-pass streaming (LIME_STREAM_BUDGET): the planner's
    dp-slicing bounds device stream residency at ~total/n_pass while the
    owner sweeps stay byte-identical (the full-setB2 configuration,
    where four W=28 streams exceed one chip's HBM)."""
    from tests.synth import make_dataset

    from lime_tpu.config import LimeConfig
    from lime_tpu.pipeline import run_paired

    ds = make_dataset(str(tmp_path), num_pairs=400, read_len=80,
                      genome_lens=(6000, 5000, 4000), seed=41)
    host_out = tmp_path / "host.csv"
    run_paired(ds.collections, str(host_out), ds.num_reads,
               ds.num_genomes, ds.lineage_path, ds.read_len,
               LimeConfig(executor="host"))
    monkeypatch.setenv("LIME_HBM_BUDGET", "1")       # force blocked mode
    monkeypatch.setenv("LIME_STREAM_BUDGET", "65536")  # force owner passes
    monkeypatch.setenv("LIME_HOST_FRAC", "0")        # stream-only
    out = tmp_path / "blocked.csv"
    run_paired(ds.collections, str(out), ds.num_reads, ds.num_genomes,
               ds.lineage_path, ds.read_len,
               LimeConfig(executor="tpu", fused=True))
    assert out.read_text() == host_out.read_text()
