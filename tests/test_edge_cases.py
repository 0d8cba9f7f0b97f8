"""Edge cases: wide counters, long reads, text-results classify, empties."""

import numpy as np
import pytest

from lime_tpu.config import LimeConfig
from lime_tpu.formats.arrays import clusters_path_for, open_da, open_ebwt, read_clusters
from lime_tpu.formats.res import dense_from_bin, read_results_bin, write_results_bin
from lime_tpu.index.builder import build_index_files
from lime_tpu.formats.fasta import reverse_complement, write_fasta
from lime_tpu.ops.cluster_scan import find_clusters
from lime_tpu.ops.scoring import score_clusters
from lime_tpu.pipeline import classify, cluster_bwt, cluster_lcp, run_single

HOST = LimeConfig(executor="host")


@pytest.fixture(scope="module")
def long_read_ds(tmp_path_factory):
    """300bp reads — beyond the reference's default u8 counter limit."""
    root = tmp_path_factory.mktemp("long_reads")
    rng = np.random.default_rng(21)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = rng.choice(bases, size=20000).tobytes()
    reads = []
    for i in range(40):
        s = int(rng.integers(0, len(genome) - 300))
        reads.append(genome[s:s + 300])
    cols = []
    for tag, rs in (("F", reads),
                    ("RC", [reverse_complement(r) for r in reads])):
        p = str(root / f"col_{tag}.fasta")
        write_fasta(p, [f"r{i}" for i in range(len(rs))] + ["G0"],
                    list(rs) + [genome])
        build_index_files(p, list(rs) + [genome])
        cols.append(p)
    lin = str(root / "lineage.csv")
    with open(lin, "w") as f:
        f.write("Acc;S;G;F;O;C;P\nG0;7;8;9;10;11;12\n")
    return cols, lin


def test_wide_sim_long_reads(long_read_ds, tmp_path):
    cols, lin = long_read_ds
    cfg = HOST.replace(wide_sim=True)
    out = str(tmp_path / "wide.csv")
    s = run_single(cols, out, 40, 1, lin, 300, cfg)
    assert s.classified == 40  # perfect reads -> all classified
    # similarity counters exceeded 255: norm = 300+1-16 = 285 and nearly
    # every suffix matches (the full-read suffix's '$' BWT symbol ranks as
    # 'A' and only matches 1 in 4 genome contexts)
    for line in open(out).read().splitlines()[1:]:
        assert line.startswith("C,")
        assert float(line.split(",")[3]) >= 0.996  # %g prints 6 digits


def test_wide_sim_tpu_matches_host(long_read_ds):
    cols, _ = long_read_ds
    from lime_tpu.ops.fused_pass import score_clusters_tpu

    fasta = cols[0]
    cfg = HOST.replace(wide_sim=True)
    cluster_lcp(fasta, 40, 1, cfg)
    p, l = read_clusters(clusters_path_for(fasta, 16))
    da, eb = open_da(fasta), open_ebwt(fasta)
    sim_h = score_clusters(p, l, da, eb, 40, 1, cfg)
    sim_t = score_clusters_tpu(p, l, da, eb, 40, 1,
                               cfg.replace(executor="tpu"))
    assert sim_h.max() > 255  # the wide path is actually exercised
    np.testing.assert_array_equal(sim_h, sim_t)


def test_u8_narrow_guard(long_read_ds):
    cols, _ = long_read_ds
    with pytest.raises(ValueError, match="wide_sim"):
        cluster_bwt(cols[0], 300, HOST)


def test_text_results_classify_matches_binary(dataset, tmp_path):
    """BIN=0 classify path produces the same assignments as BIN=1."""
    for fasta in dataset.collections[:2]:
        cluster_lcp(fasta, dataset.num_reads, dataset.num_genomes, HOST)
        cluster_bwt(fasta, dataset.read_len, HOST)
        cluster_bwt(fasta, dataset.read_len,
                    HOST.replace(binary_results=False))
    prefixes = [c + ".res" for c in dataset.collections[:2]]
    out_bin = str(tmp_path / "bin.csv")
    out_txt = str(tmp_path / "txt.csv")
    classify(prefixes, dataset.num_reads, dataset.num_genomes, out_bin,
             dataset.lineage_path, HOST)
    classify(prefixes, dataset.num_reads, dataset.num_genomes, out_txt,
             dataset.lineage_path, HOST.replace(binary_results=False))
    # the text format rounds sims to 5 decimals (%.5f, like the reference's
    # BIN=0), so compare assignments (type + read + taxon), not scores
    strip = lambda txt: ["".join(l.split(",")[:3]) for l in txt.splitlines()]
    assert strip(open(out_bin).read()) == strip(open(out_txt).read())


def test_empty_results_roundtrip(tmp_path):
    """No read passes beta -> sentinel-only .bin, all-zero .pos."""
    prefix = str(tmp_path / "x.res")
    rows = np.zeros((5, 3), np.float32)
    write_results_bin(prefix, rows, beta=0.25)
    pos, recs = read_results_bin(prefix, 5)
    assert list(pos) == [0] * 5
    assert len(recs) == 1  # sentinel only
    dense, maxs = dense_from_bin(pos, recs, 5, 3)
    assert not dense.any() and not maxs.any()


def test_no_clusters(tmp_path):
    """Collections without read/genome sharing produce zero clusters."""
    lcp = np.zeros(10, np.uint32)
    da = np.arange(10, dtype=np.uint32) % 3
    p, l = find_clusters(lcp, da, 2, 16)
    assert len(p) == 0


def test_wide_db_beyond_u16_columns(tmp_path, monkeypatch):
    """Databases wider than 65536 genomes: the pair engine and coo24
    column are ineligible, so scoring runs through the host plane with
    plain COO corrections — output must match the host executor."""
    import numpy as np

    from lime_tpu import native
    from lime_tpu.config import LimeConfig
    from lime_tpu.formats.fasta import reverse_complement
    from lime_tpu.index.builder import build_index_files
    from lime_tpu.pipeline import run_paired

    if not native.available():
        import pytest

        pytest.skip("native runtime needed")
    rng = np.random.default_rng(77)
    BASE = np.frombuffer(b"ACGT", np.uint8)
    n_genomes = 65600  # just past the u16 column range
    genomes = [bytes(BASE[rng.integers(0, 4, 24)])
               for _ in range(n_genomes - 2)]
    genomes += [bytes(BASE[rng.integers(0, 4, 3000)]) for _ in range(2)]
    reads1, reads2 = [], []
    L = 60
    for i in range(40):
        g = genomes[-1 - (i % 2)]
        p = int(rng.integers(0, len(g) - 150))
        frag = g[p:p + 150]
        reads1.append(frag[:L])
        reads2.append(reverse_complement(frag[-L:]))
    cols = []
    for tag, reads in (("1F", reads1),
                       ("1RC", [reverse_complement(r) for r in reads1]),
                       ("2F", reads2),
                       ("2RC", [reverse_complement(r) for r in reads2])):
        path = str(tmp_path / f"col_{tag}.fasta")
        build_index_files(path, reads + genomes)
        cols.append(path)
    lineage = str(tmp_path / "lineage.csv")
    with open(lineage, "w") as f:
        f.write("Accession_number;Species;Genus;Family;Order;Class;"
                "Phylum\n")
        for i in range(n_genomes):
            f.write(f"A{i};{100 + i};5;4;3;2;1\n")
    a = str(tmp_path / "host.csv")
    run_paired(cols, a, len(reads1), n_genomes, lineage, L,
               LimeConfig(executor="host"))
    # force the dense host-plane branch (not the small sparse rescue)
    # so the >65536-column COO fallback actually runs
    from lime_tpu.ops import fused_pipeline as fp

    monkeypatch.setattr(fp, "_COO_POSITION_CAP", 1)
    b = str(tmp_path / "wide.csv")
    run_paired(cols, b, len(reads1), n_genomes, lineage, L,
               LimeConfig(executor="tpu", fused=True, host_frac=1.0))
    assert open(a).read() == open(b).read()


def test_fastq_trailing_blank_lines(tmp_path):
    """A trailing newline (editors, concatenation) must not be parsed as
    a record header (round-4 advisory finding)."""
    from lime_tpu.formats.fasta import read_fasta

    p = tmp_path / "r.fastq"
    p.write_bytes(b"@r1\nACGT\n+\nIIII\n\n@r2\nTTTT\n+\nIIII\n\n\n")
    names, seqs = read_fasta(str(p))
    assert names == ["r1", "r2"]
    assert seqs == [b"ACGT", b"TTTT"]


def test_external_build_rejects_low_bytes(tmp_path):
    """Sequence bytes <= '$' (0x24) would clobber the external merge's
    pinned terminator region; they must be rejected up front."""
    import pytest

    from lime_tpu import native
    from lime_tpu.index.external import build_index_files_external

    if not native.available():
        pytest.skip("native library unavailable")
    with pytest.raises(ValueError, match="0x0a"):
        build_index_files_external(str(tmp_path / "x.fasta"),
                                   [b"ACGT\nACGT", b"ACGT"])


def test_kasai_floor_fails_fast():
    """An external build whose final LCP pass cannot fit RAM must fail
    BEFORE block building (round-4 advisory finding)."""
    import pytest

    from lime_tpu.index.external import _check_kasai_floor

    with pytest.raises(MemoryError, match="Kasai"):
        _check_kasai_floor(1 << 50)
