"""Oracle parity for the remaining reference flag variants.

Round-2 gap: the wide-counter build (dataTypeNumSim=1, reference
src/Tools.h:51-75 — u32 similarity counters for reads longer than 255bp)
and the BIN=0 Classify binary (text-format .res input, reference
src/Classify.cpp:126-154) were never compiled as oracles.  Both are here:
our wide_sim path and text-mode classify are asserted byte-identical
against the real binaries.
"""

import numpy as np
import pytest

from lime_tpu.config import LimeConfig
from lime_tpu.formats.fasta import reverse_complement, write_fasta
from lime_tpu.index.builder import build_index_files
from lime_tpu.pipeline import classify, cluster_bwt, cluster_lcp

HOST = LimeConfig(executor="host")


def _read(path, mode="rb"):
    with open(path, mode) as f:
        return f.read()


def _make_wide_ds(tmp_path_factory, read_len: int, name: str):
    """Paired reads over 2 genomes, sized so per-genome scores reach
    readLen+1 > 255 — the u32-counter regime."""
    root = tmp_path_factory.mktemp(name)
    rng = np.random.default_rng(37)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genomes = [rng.choice(bases, size=15000).tobytes() for _ in range(2)]
    r1, r2 = [], []
    for i in range(60):
        g = genomes[i % 2]
        s = int(rng.integers(0, len(g) - 2 * read_len - 100))
        r1.append(g[s:s + read_len])
        r2.append(reverse_complement(
            g[s + read_len + 50:s + 2 * read_len + 50]))
    cols = []
    for tag, rs in (("1F", r1),
                    ("1RC", [reverse_complement(r) for r in r1]),
                    ("2F", r2),
                    ("2RC", [reverse_complement(r) for r in r2])):
        p = str(root / f"col_{tag}.fasta")
        seqs = list(rs) + genomes
        write_fasta(p, [f"r{i}" for i in range(len(rs))] + ["G0", "G1"],
                    seqs)
        build_index_files(p, seqs)
        cols.append(p)
    lin = str(root / "lineage.csv")
    with open(lin, "w") as f:
        f.write("Accession_number;Species;Genus;Family;Order;Class;"
                "Phylum\nG0;7;8;9;10;11;12\nG1;17;18;9;10;11;12\n")
    return root, cols, lin, len(r1), read_len


@pytest.fixture(scope="module")
def wide_ds(tmp_path_factory):
    # 255bp: per-genome scores reach readLen+1 = 256 (the u8 counters
    # would wrap to 0) while the reference CLI's %hhu readLen parse stays
    # valid — see test_wide_readlen_cli_divergence for >255.
    return _make_wide_ds(tmp_path_factory, 255, "wide_oracle")


def test_wide_sim_oracle_parity(wide_ds, oracle):
    """dataTypeNumSim=1 scoring + classify vs the patched-oracle build."""
    root, cols, lin, n_reads, read_len = wide_ds
    cfg = HOST.replace(wide_sim=True)
    exercised = False
    for fasta in cols:
        cluster_lcp(fasta, n_reads, 2, cfg)
        oracle.cluster_bwt(fasta, read_len, 0.25, wide=True)
        oracle_bin = _read(fasta + ".res.bin")
        oracle_pos = _read(fasta + ".res.pos")
        cluster_bwt(fasta, read_len, cfg)
        assert _read(fasta + ".res.bin") == oracle_bin
        assert _read(fasta + ".res.pos") == oracle_pos
        # counters approach the u8 boundary (the hard cap per pair is
        # readLen+1-alpha = 240 here; >255 needs readLen > 255, covered
        # by test_wide_readlen_cli_divergence)
        sims = np.frombuffer(oracle_bin, np.float32)
        exercised |= bool((sims * np.float32(read_len + 1 - 16)).max()
                          > 230.0)
    assert exercised, "dataset never approached the u8 counter range"

    want = str(root / "oracle.csv")
    oracle.classify([c + ".res" for c in cols], n_reads, 2, want, lin, 1)
    got = str(root / "ours.csv")
    classify([c + ".res" for c in cols], n_reads, 2, got, lin, cfg)
    assert _read(got, "r") == _read(want, "r")


def test_wide_readlen_cli_divergence(tmp_path_factory, oracle):
    """Pin the reference's %hhu readLen parse against the oracle.

    The wide build's CLI still parses readLen with sscanf("%hhu")
    (reference src/ClusterBWT_DA.cpp:519-521), so readLen=300 wraps to 44
    and the norm becomes (300 mod 256) + 1 - alpha = 29 instead of 285 —
    the build breaks for the exact case it exists for (and the upper
    bytes of the uint readLen are formally uninitialized).  We do not
    reproduce it: our wide path normalizes by the true read length.  The
    raw integer similarities must still agree with the oracle's once the
    two norms are factored out.
    """
    root, cols, lin, n_reads, read_len = _make_wide_ds(
        tmp_path_factory, 300, "wide_hhu")
    fasta = cols[0]
    cfg = HOST.replace(wide_sim=True)
    cluster_lcp(fasta, n_reads, 2, cfg)
    oracle.cluster_bwt(fasta, read_len, 0.25, wide=True)
    oracle_sims = np.frombuffer(_read(fasta + ".res.bin"), np.float32)
    oracle_pos = _read(fasta + ".res.pos")
    cluster_bwt(fasta, read_len, cfg)
    our_sims = np.frombuffer(_read(fasta + ".res.bin"), np.float32)
    assert _read(fasta + ".res.pos") == oracle_pos
    norm_ref = np.float32((read_len % 256) + 1 - 16)   # the bug
    norm_true = np.float32(read_len + 1 - 16)          # our behavior
    # .res.bin interleaves float sims with uint32 list sizes/ids; compare
    # the recovered integer counters wherever either side is a plausible
    # normalized similarity (exact for counters < 2^24)
    ref_counts = np.round(oracle_sims * norm_ref)
    our_counts = np.round(our_sims * norm_true)
    plausible = (oracle_sims > 0) & (oracle_sims < 1000)
    np.testing.assert_array_equal(ref_counts[plausible],
                                  our_counts[plausible])
    # the u32 counters are genuinely exercised: scores beyond u8 range
    assert our_counts[plausible].max() > 255


def test_bin0_classify_oracle_parity(dataset, oracle):
    """Text-mode (.res.txt) classify vs the BIN=0 oracle binary."""
    ds = dataset
    cfg = HOST.replace(binary_results=False)
    for fasta in ds.collections:
        cluster_lcp(fasta, ds.num_reads, ds.num_genomes, cfg)
        cluster_bwt(fasta, ds.read_len, cfg)
    want = str(ds.root + "/bin0_oracle.csv") if isinstance(ds.root, str) \
        else str(ds.root / "bin0_oracle.csv")
    oracle.classify([c + ".res" for c in ds.collections], ds.num_reads,
                    ds.num_genomes, want, ds.lineage_path, 1, bin_in=0)
    got = want.replace("oracle", "ours")
    classify([c + ".res" for c in ds.collections], ds.num_reads,
             ds.num_genomes, got, ds.lineage_path, cfg)
    assert _read(got, "r") == _read(want, "r")
    # regenerate binary artifacts for downstream tests
    for fasta in ds.collections:
        cluster_bwt(fasta, ds.read_len, HOST)
