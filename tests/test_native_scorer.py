"""Native SIMD cluster scorer vs the numpy exact path and the oracle.

The native scorer is the host half of density-routed scoring: it must carry
the reference's exact counter semantics (u8 wrap / 255 saturation / the
IUPAC waterfall with its first-block update quirk,
reference src/ClusterBWT_DA.cpp:81-252).
"""

import os

import numpy as np
import pytest

from lime_tpu import native
from lime_tpu.config import LimeConfig
from lime_tpu.constants import IUPAC_WATERFALL_PAIRS, SYMBOL_RANK_LUT
from lime_tpu.formats.arrays import write_index_arrays
from lime_tpu.formats.res import dense_from_bin, read_results_bin
from lime_tpu.ops.cluster_scan import find_clusters
from lime_tpu.ops.fused_pass import _DEGENERATE_BYTE
from lime_tpu.ops.scoring import normalize_scores, score_clusters

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _random_clusters(rng, n, num_docs):
    da = rng.integers(0, num_docs, size=n).astype(np.uint32)
    ebwt = rng.choice(
        np.frombuffer(b"ACGTACGTNRYSWKM$", dtype=np.uint8), size=n)
    starts = np.sort(rng.choice(np.arange(0, n - 700, 13), size=100,
                                replace=False)).astype(np.int64)
    lens = rng.integers(2, 40, size=100).astype(np.int64)
    lens[50] = 600  # a cluster past the banded kernel's 255 bound
    keep = np.ones(100, bool)
    end = -1
    for i in range(100):
        if starts[i] <= end:
            keep[i] = False
        else:
            end = starts[i] + lens[i]
    return starts[keep], lens[keep], da, ebwt


@pytest.mark.parametrize("wide", [False, True])
@pytest.mark.parametrize("use_ebwt", [True, False])
@pytest.mark.parametrize("threads", [1, 2])
def test_native_scorer_matches_numpy(wide, use_ebwt, threads):
    rng = np.random.default_rng(1)
    R, G = 50, 7
    starts, lens, da, ebwt = _random_clusters(rng, 20000, R + G)
    cfg = LimeConfig(executor="host", wide_sim=wide, use_ebwt=use_ebwt)
    expected = score_clusters(starts, lens, da, ebwt if use_ebwt else None,
                              R, G, cfg)
    got = native.score_clusters_native(
        starts, lens, da, ebwt if use_ebwt else None, R, G,
        SYMBOL_RANK_LUT, _DEGENERATE_BYTE, IUPAC_WATERFALL_PAIRS,
        wide=wide, threads=threads)
    np.testing.assert_array_equal(got.astype(np.int64),
                                  expected.astype(np.int64))


def test_waterfall_second_block_decrement():
    """Regression for the view-aliasing bug fixed in ops/scoring.py.

    Read leftovers {Y:1, M:1} vs genome leftover {C:1}: the reference's
    second waterfall block decrements the surviving genome counter
    (ClusterBWT_DA.cpp:163-174), so only ONE of the read's degenerates can
    match C — t must be 1, not 2.
    """
    from lime_tpu.ops.scoring import iupac_waterfall

    u = np.zeros((1, 16), np.int64)
    v = np.zeros((1, 16), np.int64)
    u[0, 5] = 1  # Y
    u[0, 9] = 1  # M
    v[0, 1] = 1  # C
    t = iupac_waterfall(u, v)
    assert t[0] == 1
    assert v[0, 1] == 0  # consumed


def test_native_scorer_matches_oracle_on_degenerate_heavy_data(
        oracle, tmp_path):
    """End-to-end .res parity on data hammering every waterfall branch."""
    rng = np.random.default_rng(9)
    R, G, n = 30, 5, 30000
    lcp = rng.integers(0, 16, size=n).astype(np.uint32)
    da = rng.integers(0, R + G, size=n).astype(np.uint32)
    ebwt = rng.choice(np.frombuffer(b"ACGTNRYSWKMBDHV", dtype=np.uint8),
                      size=n)
    pos = 10
    while pos < n - 200:
        ln = int(rng.integers(3, 60))
        lcp[pos + 1:pos + ln] = 16 + rng.integers(0, 4, size=ln - 1)
        lcp[pos + ln] = 2
        da[pos] = rng.integers(0, R)
        da[pos + 1] = R + rng.integers(0, G)
        pos += ln + int(rng.integers(3, 30))
    lcp[0] = 0
    path = str(tmp_path / "deg.fasta")
    with open(path, "w") as f:
        f.write(">p\nACGT\n")
    write_index_arrays(path, ebwt, lcp, da)

    oracle.cluster_lcp(path, R, G, 16)
    oracle.cluster_bwt(path, 100, 0.0001)
    posf, recs = read_results_bin(path + ".res", R)
    ref_dense, _ = dense_from_bin(posf, recs, R, G, 0, R)

    p, l = find_clusters(lcp, da, R, 16)
    for impl in ("numpy", "native"):
        if impl == "numpy":
            sim = score_clusters(p, l, da, ebwt, R, G,
                                 LimeConfig(executor="host"))
        else:
            sim = native.score_clusters_native(
                p, l, da, ebwt, R, G, SYMBOL_RANK_LUT, _DEGENERATE_BYTE,
                IUPAC_WATERFALL_PAIRS, threads=2)
        nr = normalize_scores(sim, 100, 16)
        q = nr.max(axis=1) > np.float32(0.0001)
        dense = np.where(q[:, None], nr, 0)
        np.testing.assert_array_equal(dense, ref_dense, err_msg=impl)
