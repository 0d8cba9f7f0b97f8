"""The reference's Datasets/ workflow, end to end on our surface.

Reference recipe (Datasets/README.md): download FASTQ samples, filter
each mate file by the published title lists (positive control = real
reads, negative control = shuffled reads that must classify U) with
filter_by_headers.pl, preprocess, run, evaluate against the
Reference_database.csv lineage (930 genomes / 17 phyla).

Here: the REAL Reference_database.csv ships in the reference checkout
and drives the lineage; reads are synthesized against genomes named by
its real accessions (refs.fasta is a stripped blob upstream).  The
pipeline consumes the FASTQ directly — like the reference's BCR does —
after the title-list filter.
"""

import os

import numpy as np
import pytest

from lime_tpu.config import LimeConfig
from lime_tpu.formats.fasta import read_fasta, reverse_complement
from lime_tpu.formats.lineage import read_lineage
from lime_tpu.pipeline import run_paired
from lime_tpu.preprocessing import preprocess
from lime_tpu.utils.filter_fasta import filter_fasta_by_titles

REF_DB = "/root/reference/Datasets/Reference_database.csv"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_DB),
                                reason="reference checkout not present")


def test_reference_database_csv_loads():
    """The real 930-genome lineage file parses with real taxids."""
    lin = read_lineage(REF_DB)
    assert lin.num_genomes == 930
    assert lin.taxids.shape == (6, 930)
    # spot values from the file itself (CP000360.1 row)
    assert int(lin.at_rank(1)[0]) == 658062   # species
    assert int(lin.at_rank(6)[0]) == 57723    # phylum
    # 17 phyla (Datasets/README.md:35)
    assert len(set(int(t) for t in lin.at_rank(6))) == 17


def test_fastq_title_filter_workflow(tmp_path):
    """FASTQ -> title filter -> preprocess -> classify -> evaluate."""
    lin = read_lineage(REF_DB)
    n_genomes = 40
    accs = [lin.names[i] for i in range(n_genomes)]
    rng = np.random.default_rng(123)
    BASE = np.frombuffer(b"ACGT", np.uint8)
    genomes = [bytes(BASE[rng.integers(0, 4, 4000)])
               for _ in range(n_genomes)]
    g_path = str(tmp_path / "refs.fasta")
    with open(g_path, "w") as f:
        for a, g in zip(accs, genomes):
            f.write(f">{a}\n{g.decode()}\n")

    # FASTQ sample: positive reads + shuffled negatives, mixed order
    L, ins = 80, 200
    titles_pos, titles_neg = [], []
    fq1, fq2 = str(tmp_path / "s_1.fq"), str(tmp_path / "s_2.fq")
    truth = {}
    with open(fq1, "w") as f1, open(fq2, "w") as f2:
        for i in range(360):
            neg = i % 6 == 5
            t = f"read{i:05d}"
            (titles_neg if neg else titles_pos).append(t)
            if neg:
                r1 = bytes(BASE[rng.integers(0, 4, L)])
                r2 = bytes(BASE[rng.integers(0, 4, L)])
            else:
                g = int(rng.integers(n_genomes))
                p = int(rng.integers(0, 4000 - ins))
                frag = genomes[g][p:p + ins]
                r1 = frag[:L]
                r2 = reverse_complement(frag[-L:])
            q = "I" * L
            f1.write(f"@{t}/1\n{r1.decode()}\n+\n{q}\n")
            f2.write(f"@{t}/2\n{r2.decode()}\n+\n{q}\n")

    # the reference's positive-control filter (title_setB2.txt analogue)
    tl = str(tmp_path / "titles_pos.txt")
    with open(tl, "w") as f:
        f.write("".join(f"{t}/1\n{t}/2\n" for t in titles_pos))
    f1p = str(tmp_path / "s_1.noRan.fq")
    f2p = str(tmp_path / "s_2.noRan.fq")
    assert filter_fasta_by_titles(tl, fq1, f1p) == len(titles_pos)
    assert filter_fasta_by_titles(tl, fq2, f2p) == len(titles_pos)

    # record per-read truth in FILTERED order (ids renumber on filter)
    names1, seqs1 = read_fasta(f1p)
    assert len(names1) == len(titles_pos)

    # lineage = the real DB rows for the genomes in play (the reference
    # requires exactly numGenomes lineage rows, src/Classify.cpp:33-89)
    lineage_csv = str(tmp_path / "lineage.csv")
    with open(REF_DB) as src, open(lineage_csv, "w") as dst:
        for i, line in enumerate(src):
            if i <= n_genomes:
                dst.write(line)

    cols = preprocess(f1p, f2p, g_path, str(tmp_path / "idx"))
    out = str(tmp_path / "out.csv")
    run_paired(cols, out, len(titles_pos), n_genomes, lineage_csv, L,
               LimeConfig(executor="tpu", fused=True, host_frac=1.0))
    lines = open(out).read().splitlines()[1:]
    assert len(lines) == len(titles_pos)
    n_c = sum(1 for ln in lines if ln.startswith("C,"))
    # positives come straight from the genomes: expect near-total C
    assert n_c >= 0.95 * len(titles_pos)

    # negative control: the shuffled reads must classify U
    tln = str(tmp_path / "titles_neg.txt")
    with open(tln, "w") as f:
        f.write("".join(f"{t}/1\n{t}/2\n" for t in titles_neg))
    f1n = str(tmp_path / "s_1.ran.fq")
    f2n = str(tmp_path / "s_2.ran.fq")
    filter_fasta_by_titles(tln, fq1, f1n)
    filter_fasta_by_titles(tln, fq2, f2n)
    cols_n = preprocess(f1n, f2n, g_path, str(tmp_path / "idx_n"))
    out_n = str(tmp_path / "out_neg.csv")
    run_paired(cols_n, out_n, len(titles_neg), n_genomes, lineage_csv,
               L, LimeConfig(executor="tpu", fused=True, host_frac=1.0))
    lines_n = open(out_n).read().splitlines()[1:]
    assert all(ln.startswith("U,") for ln in lines_n), \
        "negative-control reads must be unclassified"
