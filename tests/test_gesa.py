"""gesa conversion parity with the reference EGSAtoBCR layout."""

import struct

import numpy as np

from lime_tpu.formats.gesa import convert_gesa


def write_gesa(path, records):
    """records: list of (text, suff, lcp, bwt) — 13-byte packed layout."""
    with open(path, "wb") as f:
        for text, suff, lcp, bwt in records:
            f.write(struct.pack("<IIIB", text, suff, lcp, bwt))


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
