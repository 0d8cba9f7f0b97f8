"""Index builder correctness: brute-force multi-string suffix comparison."""

import numpy as np
import pytest

from lime_tpu.index.builder import build_index


def brute_force_index(seqs):
    """O(n^2 log n) ground truth for the merged eBWT/LCP/DA."""
    suffixes = []  # (key, doc, start)
    for d, s in enumerate(seqs):
        ext = s + b"$"
        for i in range(len(ext)):
            # Terminator sorts below nucleotides; doc index breaks $ ties.
            key = tuple(
                (0, d) if c == ord("$") else (1 + c, -1) for c in ext[i:])
            suffixes.append((key, d, i))
    suffixes.sort()
    ebwt, lcp, da = [], [], []
    prev_key = None
    for key, d, i in suffixes:
        ext = seqs[d] + b"$"
        ebwt.append(ext[i - 1] if i > 0 else ord("$"))
        if prev_key is None:
            lcp.append(0)
        else:
            common = 0
            for a, b in zip(prev_key, key):
                # real characters only; terminators never match
                if a == b and a[1] == -1:
                    common += 1
                else:
                    break
            lcp.append(common)
        da.append(d)
        prev_key = key
    return (np.array(ebwt, np.uint8), np.array(lcp, np.uint32),
            np.array(da, np.uint32))


CASES = [
    [b"ACGT"],
    [b"AAAA", b"AAA"],
    [b"ACGTACGT", b"CGTACG", b"TTTT"],
    [b"GATTACA", b"GATTACA"],  # identical documents
    [b"ACGNRY", b"NNNN", b"ACG"],
    [b"A"],
    [b"", b"AC"],  # empty document
]


@pytest.mark.parametrize("seqs", CASES, ids=range(len(CASES)))
def test_matches_bruteforce(seqs):
    ebwt, lcp, da = build_index(seqs)
    eb, lb, db = brute_force_index(seqs)
    np.testing.assert_array_equal(da, db)
    np.testing.assert_array_equal(lcp, lb)
    np.testing.assert_array_equal(ebwt, eb)


def test_random_roundtrip():
    rng = np.random.default_rng(0)
    seqs = [bytes(rng.choice(list(b"ACGT"), size=int(rng.integers(5, 60))))
            for _ in range(12)]
    ebwt, lcp, da = build_index(seqs)
    eb, lb, db = brute_force_index(seqs)
    np.testing.assert_array_equal(da, db)
    np.testing.assert_array_equal(lcp, lb)
    np.testing.assert_array_equal(ebwt, eb)


def test_row_count():
    seqs = [b"ACGT", b"GG"]
    ebwt, lcp, da = build_index(seqs)
    assert len(ebwt) == len(lcp) == len(da) == (4 + 1) + (2 + 1)


def test_symbol_content():
    ebwt, _, _ = build_index([b"ACGT", b"TTAA"])
    # one '$' per sequence (each sequence start row takes its terminator)
    assert (ebwt == ord("$")).sum() == 2
