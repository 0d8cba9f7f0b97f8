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


def test_plan_native_matches_numpy():
    """lime_plan == the pure-numpy planning path, on an adversarial stream."""
    from lime_tpu.constants import SYMBOL_RANK_LUT
    from lime_tpu.ops.fused_pass import _DEGENERATE_BYTE

    rng = np.random.default_rng(11)
    n, num_reads, num_docs, alpha = 50000, 60, 70, 8
    lcp = rng.integers(0, alpha + 4, size=n).astype(np.uint32)
    da = rng.integers(0, num_docs, size=n).astype(np.uint32)
    ebwt = rng.choice(np.frombuffer(b"ACGTNacgt$#RYSWKM", np.uint8),
                      size=n).astype(np.uint8)
    # plant one run longer than 255 to exercise the rescue list
    lcp[1000:1400] = alpha
    lcp[0] = alpha  # position 0 must never open a cluster

    packed, doc, nc, window, bs, bl, _, _ = native.plan_native(
        lcp, da, ebwt, num_reads, alpha, SYMBOL_RANK_LUT, _DEGENERATE_BYTE,
        use_u16=True)
    packed, doc = packed[:nc], doc[:nc]

    # numpy ground truth (the fused pipeline's fallback logic)
    m = lcp >= alpha
    m[0] = False
    d = np.diff(m.view(np.int8))
    rs = np.flatnonzero(d == 1) + 1
    re_ = np.flatnonzero(d == -1) + 1
    if m[-1]:
        re_ = np.append(re_, n)
    p, lens = rs - 1, re_ - (rs - 1)
    cr = np.concatenate([[0], np.cumsum(da < num_reads, dtype=np.int64)])
    nr = cr[p + lens] - cr[p]
    mixed = (nr > 0) & (nr < lens)
    p, lens = p[mixed], lens[mixed]
    bad = lens > 255
    deg = np.flatnonzero(_DEGENERATE_BYTE[ebwt])
    ci = np.searchsorted(p, deg, side="right") - 1
    ins = (ci >= 0) & (deg < p[ci] + lens[ci])
    bad[np.unique(ci[ins])] = True
    bi = np.flatnonzero(bad)
    np.testing.assert_array_equal(p[bi], bs)
    np.testing.assert_array_equal(lens[bi], bl)
    pk, lk = p[~bad], lens[~bad]
    offs = np.concatenate([[0], np.cumsum(lk[:-1])])
    within = np.arange(int(lk.sum())) - np.repeat(offs, lk)
    gpos = np.repeat(pk, lk) + within
    np.testing.assert_array_equal(doc, da[gpos].astype(np.uint16))
    np.testing.assert_array_equal(
        packed,
        SYMBOL_RANK_LUT[ebwt[gpos]] | ((within > 0).astype(np.uint8) << 6))
    assert window == int(lk.max())


def test_plan_native_no_ebwt():
    rng = np.random.default_rng(12)
    n = 5000
    lcp = rng.integers(0, 10, size=n).astype(np.uint32)
    da = rng.integers(0, 20, size=n).astype(np.uint32)
    from lime_tpu.constants import SYMBOL_RANK_LUT
    from lime_tpu.ops.fused_pass import _DEGENERATE_BYTE
    packed, doc, nc, window, bs, bl, _, _ = native.plan_native(
        lcp, da, None, 10, 6, SYMBOL_RANK_LUT, _DEGENERATE_BYTE, use_u16=True)
    packed = packed[:nc]
    assert (packed & 15).max() == 0  # document-only: symbol ranks all zero
    assert len(bs) == 0
