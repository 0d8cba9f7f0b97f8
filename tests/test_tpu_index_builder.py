"""On-device prefix-doubling index builder vs the numpy builder."""

import numpy as np
import pytest

from lime_tpu.index.builder import build_index
from lime_tpu.index.tpu_builder import build_index_tpu

CASES = [
    [b"ACGT"],
    [b"AAAA", b"AAA"],
    [b"ACGTACGT", b"CGTACG", b"TTTT"],
    [b"GATTACA", b"GATTACA"],
    [b"ACGNRY", b"NNNN", b"ACG"],
]


@pytest.mark.parametrize("seqs", CASES, ids=range(len(CASES)))
def test_matches_numpy(seqs):
    eb_t, lcp_t, da_t = build_index_tpu(seqs)
    eb_p, lcp_p, da_p = build_index(seqs)
    np.testing.assert_array_equal(da_t, da_p)
    np.testing.assert_array_equal(lcp_t, lcp_p)
    np.testing.assert_array_equal(eb_t, eb_p)


def test_random():
    rng = np.random.default_rng(9)
    seqs = [bytes(rng.choice(list(b"ACGT"), size=int(rng.integers(20, 200))))
            for _ in range(30)]
    eb_t, lcp_t, da_t = build_index_tpu(seqs)
    eb_p, lcp_p, da_p = build_index(seqs)
    np.testing.assert_array_equal(da_t, da_p)
    np.testing.assert_array_equal(lcp_t, lcp_p)
    np.testing.assert_array_equal(eb_t, eb_p)
