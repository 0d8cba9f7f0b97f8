"""Native fused plan+score entry points (the all-host job-shop pieces).

Pins three invariants the round-5 host path relies on:

- ``plan_clusters`` emits exactly the packed planner's host-routed
  cluster set (host_num=256) — same runs, same membership filter,
  reference src/ClusterLCP.cpp:196-264;
- ``plan_score_coo`` (scan + score-core + tile aggregation) reproduces
  planner+scorer+compact byte-for-byte at the dense-plane level, across
  thread counts, for EBWT=1/EBWT=0, IUPAC degenerates and >48-row
  clusters;
- ``coo_compact(zero_after=True)`` emits the identical chain AND returns
  the plane all-zero (the fused re-zeroing replaces a separate fill).
"""

import numpy as np
import pytest

from lime_tpu import native
from lime_tpu.constants import SYMBOL_RANK_LUT, IUPAC_WATERFALL_PAIRS
from lime_tpu.ops.fused_pass import _DEGENERATE_BYTE
from lime_tpu.ops.pair_score import merge_coo_segments

DEG8 = _DEGENERATE_BYTE.astype(np.uint8)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _dense_from_chain(chain, R, G):
    out = np.zeros((R, G), np.uint8)
    if chain is None:
        return out
    base, drow, col, val = chain
    rows = base + np.cumsum(drow.astype(np.int64))
    np.add.at(out, (rows, col.astype(np.int64)), val)
    return out


def _random_index(rng, n, R, G, syms=b"ACGTNRYKM"):
    lcp = rng.integers(0, 8, n).astype(np.uint32)
    da = rng.integers(0, R + G, n).astype(np.uint32)
    ebwt = rng.choice(np.frombuffer(syms, np.uint8), n).astype(np.uint8)
    return lcp, da, ebwt


def _plane_reference(lcp, da, ebwt, R, G, alpha):
    (pk, chunks, win, rb, ds, dl, bs, bl) = native.plan_pairs_packed(
        np.ascontiguousarray(lcp, np.uint32),
        np.ascontiguousarray(da, np.uint32),
        None if ebwt is None else np.ascontiguousarray(ebwt, np.uint8),
        R, alpha, SYMBOL_RANK_LUT, DEG8, dense_min=16, num_refs=G,
        host_num=256)
    plane = np.zeros((R, G), np.uint8)
    if len(bs):
        native.score_clusters_native(
            np.asarray(bs, np.int64), np.asarray(bl, np.int64),
            np.asarray(da, np.uint32),
            None if ebwt is None else np.asarray(ebwt, np.uint8),
            R, G, SYMBOL_RANK_LUT, _DEGENERATE_BYTE,
            IUPAC_WATERFALL_PAIRS, wide=False, threads=1, out=plane)
    return plane, bs, bl


@pytest.mark.parametrize("threads", [1, 2, 3])
@pytest.mark.parametrize("use_ebwt", [True, False])
def test_plan_score_coo_matches_split_path(threads, use_ebwt):
    rng = np.random.default_rng(7)
    for trial in range(4):
        n = int(rng.integers(300, 5000))
        R = int(rng.integers(3, 60))
        G = int(rng.integers(2, 40))
        lcp, da, ebwt = _random_index(rng, n, R, G)
        eb = ebwt if use_ebwt else None
        ref, _, _ = _plane_reference(lcp, da, eb, R, G, 4)
        chain, ncl, npos = native.plan_score_coo(
            lcp, da, eb, R, G, 4, SYMBOL_RANK_LUT, DEG8,
            IUPAC_WATERFALL_PAIRS, threads=threads)
        got = _dense_from_chain(chain, R, G)
        assert np.array_equal(got, ref)


def test_plan_score_coo_long_and_degenerate_clusters():
    rng = np.random.default_rng(11)
    n, R, G = 30000, 20, 10
    lcp = np.full(n, 9, np.uint32)
    lcp[::701] = 0
    lcp[0] = 0
    da = rng.integers(0, R + G, n).astype(np.uint32)
    for syms in (b"ACGT", b"ACGTN"):
        ebwt = rng.choice(np.frombuffer(syms, np.uint8), n).astype(np.uint8)
        ref, _, _ = _plane_reference(lcp, da, ebwt, R, G, 4)
        for th in (1, 2):
            chain, _, _ = native.plan_score_coo(
                lcp, da, ebwt, R, G, 4, SYMBOL_RANK_LUT, DEG8,
                IUPAC_WATERFALL_PAIRS, threads=th)
            assert np.array_equal(_dense_from_chain(chain, R, G), ref)


def test_plan_score_coo_rejects_oversized_cluster():
    n = 70000
    lcp = np.full(n, 9, np.uint32)
    lcp[0] = 0
    da = np.zeros(n, np.uint32)
    da[1::2] = 1  # doc 0 = read, doc 1 = genome -> one giant mixed cluster
    ebwt = np.full(n, ord("A"), np.uint8)
    with pytest.raises(RuntimeError, match="-2"):
        native.plan_score_coo(lcp, da, ebwt, 1, 1, 4, SYMBOL_RANK_LUT,
                              DEG8, IUPAC_WATERFALL_PAIRS)


@pytest.mark.parametrize("threads", [1, 2, 3])
def test_plan_clusters_matches_packed_planner(threads):
    rng = np.random.default_rng(5)
    for trial in range(4):
        n = int(rng.integers(300, 5000))
        R = int(rng.integers(3, 60))
        G = int(rng.integers(2, 40))
        lcp, da, ebwt = _random_index(rng, n, R, G)
        (pk, chunks, win, rb, ds, dl, bs, bl) = native.plan_pairs_packed(
            lcp, da, ebwt, R, 4, SYMBOL_RANK_LUT, DEG8, dense_min=16,
            num_refs=G, host_num=256)
        s2, l2 = native.plan_clusters(lcp, da, R, 4, threads=threads)
        assert np.all(np.diff(s2) > 0)  # ascending, disjoint starts
        order = np.argsort(np.asarray(bs))
        assert np.array_equal(s2, np.asarray(bs)[order])
        assert np.array_equal(l2, np.asarray(bl)[order])


def test_coo_compact_zero_after_roundtrip():
    rng = np.random.default_rng(3)
    R, G = 700, 53
    plane = np.zeros((R, G), np.uint8)
    rows = rng.integers(0, R, 400)
    cols = rng.integers(0, G, 400)
    plane[rows, cols] = rng.integers(1, 255, 400).astype(np.uint8)
    keep = plane.copy()
    segs_ref = native.coo_compact(keep.copy(), R, G, wide=False,
                                  threads=2, max_drow=15)
    segs = native.coo_compact(plane, R, G, wide=False, threads=2,
                              max_drow=15, zero_after=True)
    assert not plane.any()
    c1 = merge_coo_segments(segs_ref, max_drow=15)
    c2 = merge_coo_segments(segs, max_drow=15)
    assert c1[0] == c2[0]
    for a, b in zip(c1[1:], c2[1:]):
        assert np.array_equal(a, b)


def test_coo_compact_zero_after_wide():
    rng = np.random.default_rng(4)
    R, G = 300, 41
    plane = np.zeros((R, G), np.uint32)
    rows = rng.integers(0, R, 200)
    cols = rng.integers(0, G, 200)
    plane[rows, cols] = rng.integers(1, 1 << 20, 200).astype(np.uint32)
    segs_ref = native.coo_compact(plane.copy(), R, G, wide=True,
                                  threads=2, max_drow=255)
    segs = native.coo_compact(plane, R, G, wide=True, threads=2,
                              max_drow=255, zero_after=True)
    assert not plane.any()
    c1 = merge_coo_segments(segs_ref, max_drow=255)
    c2 = merge_coo_segments(segs, max_drow=255)
    assert c1[0] == c2[0]
    for a, b in zip(c1[1:], c2[1:]):
        assert np.array_equal(a, b)
