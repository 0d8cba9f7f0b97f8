"""Native C++ SA-IS index builder vs the numpy prefix-doubling builder."""

import numpy as np
import pytest

from lime_tpu import native
from lime_tpu.index.builder import build_index

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


CASES = [
    [b"ACGT"],
    [b"AAAA", b"AAA"],
    [b"ACGTACGT", b"CGTACG", b"TTTT"],
    [b"GATTACA", b"GATTACA"],
    [b"ACGNRY", b"NNNN", b"ACG"],
    [b"", b"AC"],
]


@pytest.mark.parametrize("seqs", CASES, ids=range(len(CASES)))
def test_matches_numpy_builder(seqs):
    eb_n, lcp_n, da_n = native.build_index_native(seqs)
    eb_p, lcp_p, da_p = build_index(seqs)
    np.testing.assert_array_equal(da_n, da_p)
    np.testing.assert_array_equal(lcp_n, lcp_p)
    np.testing.assert_array_equal(eb_n, eb_p)


def test_random_large():
    rng = np.random.default_rng(5)
    seqs = [bytes(rng.choice(list(b"ACGT"), size=int(rng.integers(50, 400))))
            for _ in range(200)]
    eb_n, lcp_n, da_n = native.build_index_native(seqs)
    eb_p, lcp_p, da_p = build_index(seqs)
    np.testing.assert_array_equal(da_n, da_p)
    np.testing.assert_array_equal(lcp_n, lcp_p)
    np.testing.assert_array_equal(eb_n, eb_p)


def test_speed_sanity():
    rng = np.random.default_rng(6)
    seqs = [bytes(rng.choice(list(b"ACGT"), size=1000)) for _ in range(500)]
    import time
    t0 = time.time()
    native.build_index_native(seqs)
    assert time.time() - t0 < 10  # 0.5M chars should take well under 10s
