"""gesa conversion parity with the reference EGSAtoBCR layout."""

import struct

import numpy as np

from lime_tpu.formats.gesa import convert_gesa


def write_gesa(path, records):
    """records: list of (text, suff, lcp, bwt) — 13-byte packed layout."""
    with open(path, "wb") as f:
        for text, suff, lcp, bwt in records:
            f.write(struct.pack("<IIIB", text, suff, lcp, bwt))


def test_gesa_convert_feeds_pipeline(tmp_path, dataset):
    """External-memory interop: reference-convention .gesa through
    gesa-convert must drive the pipeline to the same output as directly
    written index arrays (the eGap ingestion path for collections too
    large to index in RAM, reference Preprocessing.sh:159-196)."""
    import os
    import shutil

    from lime_tpu.config import LimeConfig
    from lime_tpu.pipeline import run_paired

    direct_csv = str(tmp_path / "direct.csv")
    run_paired(dataset.collections, direct_csv, dataset.num_reads,
               dataset.num_genomes, dataset.lineage_path, dataset.read_len,
               LimeConfig(executor="host"))

    cols2 = []
    for c in dataset.collections:
        dst = str(tmp_path / os.path.basename(c))
        shutil.copy(c, dst)
        # pack the arrays into egsa's interleaved 13-byte .gesa records
        bwt = np.fromfile(c + ".ebwt", np.uint8)
        lcp = np.fromfile(c + ".lcp", np.uint32)
        da = np.fromfile(c + ".da", np.uint32)
        rec = np.zeros(len(bwt), dtype=np.dtype(
            [("text", "<u4"), ("suff", "<u4"), ("lcp", "<u4"),
             ("bwt", "u1")]))
        rec["text"], rec["lcp"], rec["bwt"] = da, lcp, bwt
        nseq = dataset.num_reads + dataset.num_genomes
        rec.tofile(f"{dst}.{nseq}.gesa")
        assert convert_gesa(dst, nseq) == len(bwt)
        cols2.append(dst)

    gesa_csv = str(tmp_path / "gesa.csv")
    run_paired(cols2, gesa_csv, dataset.num_reads, dataset.num_genomes,
               dataset.lineage_path, dataset.read_len,
               LimeConfig(executor="host"))
    with open(direct_csv) as f1, open(gesa_csv) as f2:
        assert f1.read() == f2.read()


def test_build_memory_guard():
    from lime_tpu.index.builder import _check_build_memory

    with np.testing.assert_raises(MemoryError):
        _check_build_memory(1 << 44, "native")  # ~700 TB: always too big
    _check_build_memory(1 << 10, "native")  # tiny: always fine


def test_roundtrip(tmp_path):
    fasta = str(tmp_path / "g.fasta")
    recs = [(3, 7, 0, ord("$")), (0, 1, 2, ord("A")), (1, 0, 5, ord("T")),
            (2, 9, 1, ord("N"))]
    write_gesa(fasta + ".4.gesa", recs)
    n = convert_gesa(fasta, 4)
    assert n == 4
    assert list(np.fromfile(fasta + ".ebwt", np.uint8)) == \
        [r[3] for r in recs]
    assert list(np.fromfile(fasta + ".lcp", np.uint32)) == \
        [r[2] for r in recs]
    assert list(np.fromfile(fasta + ".da", np.uint32)) == \
        [r[0] for r in recs]
