"""CLI smoke tests: the reference-style command surface end-to-end."""

import os

import numpy as np
import pytest

from lime_tpu.cli import main
from lime_tpu.formats.arrays import read_docs
from lime_tpu.formats.fasta import read_fasta, write_fasta


def test_preprocess_and_run_paired(tmp_path, dataset, capsys):
    # reuse the synthetic reads/genomes, but drive everything via the CLI
    r1 = str(tmp_path / "reads_1.fasta")
    r2 = str(tmp_path / "reads_2.fasta")
    g = str(tmp_path / "refs.fasta")
    write_fasta(r1, [f"r{i}/1" for i in range(len(dataset.reads1))],
                dataset.reads1)
    write_fasta(r2, [f"r{i}/2" for i in range(len(dataset.reads2))],
                dataset.reads2)
    write_fasta(g, [f"G{j:03d}" for j in range(dataset.num_genomes)],
                dataset.genomes)

    out_dir = str(tmp_path / "idx")
    assert main(["preprocess", r1, g, "--reads2", r2,
                 "--out-dir", out_dir]) == 0
    cols = capsys.readouterr().out.strip().splitlines()
    assert len(cols) == 4
    assert read_docs(cols[0]) == dataset.num_reads + dataset.num_genomes

    out_csv = str(tmp_path / "out.csv")
    rc = main(["run-paired", *cols, out_csv, str(dataset.num_reads),
               str(dataset.num_genomes), dataset.lineage_path,
               str(dataset.read_len), "--executor", "host"])
    assert rc == 0
    lines = open(out_csv).read().splitlines()
    assert lines[0] == "C/U/A/H,IdSeqRead,TaxID,maxSim"
    assert len(lines) == dataset.num_reads + 1


def test_stepwise_cli(dataset, tmp_path, capsys):
    for fasta in dataset.collections[:2]:
        assert main(["cluster-lcp", fasta, str(dataset.num_reads),
                     str(dataset.num_genomes), "16", "--executor", "host"]) == 0
        assert main(["cluster-bwt", fasta, str(dataset.read_len), "0.25",
                     "--executor", "host"]) == 0
    out = str(tmp_path / "cls.csv")
    assert main(["classify", "2",
                 dataset.collections[0] + ".res",
                 dataset.collections[1] + ".res",
                 str(dataset.num_reads), str(dataset.num_genomes),
                 out, dataset.lineage_path, "1", "1",
                 "--executor", "host"]) == 0
    assert "Classification process" in capsys.readouterr().out
    assert os.path.exists(out)


def test_filter_fasta(tmp_path):
    src = str(tmp_path / "in.fasta")
    write_fasta(src, ["a", "b", "c"], [b"ACGT", b"GGGG", b"TTTT"])
    titles = str(tmp_path / "titles.txt")
    with open(titles, "w") as f:
        f.write("c\na\n")
    dst = str(tmp_path / "out.fasta")
    assert main(["filter-fasta", titles, src, dst]) == 0
    names, seqs = read_fasta(dst)
    assert names == ["a", "c"]  # order-preserving
    assert seqs == [b"ACGT", b"TTTT"]


def test_create_docs_and_gesa(tmp_path, capsys):
    fasta = str(tmp_path / "x.fasta")
    open(fasta, "w").close()
    assert main(["create-docs", fasta, "5"]) == 0
    assert read_docs(fasta) == 5

    # synthesize a tiny .gesa and convert it
    from tests.test_gesa import write_gesa  # shared helper
    write_gesa(fasta + ".3.gesa",
               [(0, 1, 0, 65), (1, 0, 4, 36), (2, 2, 2, 67)])
    assert main(["gesa-convert", fasta, "3"]) == 0
    eb = np.fromfile(fasta + ".ebwt", dtype=np.uint8)
    assert list(eb) == [65, 36, 67]


def test_cli_sharded_pair_engine(dataset, tmp_path):
    """run-sharded drives the dp-sliced pair SPMD engine by default,
    with explicit --mesh and --engine selection; both engines match the
    host pipeline byte for byte."""
    from lime_tpu import native

    if not native.available():
        pytest.skip("native planner needed")
    host_csv = str(tmp_path / "host.csv")
    assert main(["run-paired", *dataset.collections, host_csv,
                 str(dataset.num_reads), str(dataset.num_genomes),
                 dataset.lineage_path, str(dataset.read_len),
                 "--executor", "host"]) == 0
    want = open(host_csv).read()
    for extra, tag in ((["--mesh", "2x4"], "pair_2x4"),
                       (["--engine", "banded", "--mesh", "4x2"],
                        "banded_4x2")):
        out = str(tmp_path / f"{tag}.csv")
        assert main(["run-sharded", *dataset.collections, out,
                     str(dataset.num_reads), str(dataset.num_genomes),
                     dataset.lineage_path, str(dataset.read_len),
                     *extra]) == 0
        assert open(out).read() == want, tag


def test_cli_hybrid_and_hbm_knobs(dataset, tmp_path):
    """--host-frac and --hbm-budget reach the fused engine."""
    from lime_tpu import native

    if not native.available():
        pytest.skip("native planner needed")
    host_csv = str(tmp_path / "host.csv")
    assert main(["run-paired", *dataset.collections, host_csv,
                 str(dataset.num_reads), str(dataset.num_genomes),
                 dataset.lineage_path, str(dataset.read_len),
                 "--executor", "host"]) == 0
    out = str(tmp_path / "hybrid.csv")
    assert main(["run-paired", *dataset.collections, out,
                 str(dataset.num_reads), str(dataset.num_genomes),
                 dataset.lineage_path, str(dataset.read_len),
                 "--fused", "--host-frac", "1.0"]) == 0
    assert open(out).read() == open(host_csv).read()
    out2 = str(tmp_path / "blocked.csv")
    try:
        assert main(["run-paired", *dataset.collections, out2,
                     str(dataset.num_reads), str(dataset.num_genomes),
                     dataset.lineage_path, str(dataset.read_len),
                     "--fused", "--hbm-budget", "1"]) == 0
    finally:
        os.environ.pop("LIME_HBM_BUDGET", None)
    assert open(out2).read() == open(host_csv).read()
