"""Billion-position index ingest: the pipeline streams what it's given.

The reference builds setB2-scale indexes with external-memory tools (eGap
--em -m 4096, reference Preprocessing.sh:159-196) and so do we for
collections beyond the in-process builders' RAM ceiling (~40 B/position
for the native SA-IS — ~2.8G positions on a 125 GB host; see
index/builder._check_build_memory and the gesa-convert interop tests).
This test covers the part we own at that scale: the pipeline's own
stages must *stream* a >1e9-position index — memmapped planning, bounded
RSS — regardless of which tool built it.

Heavy (9 GB of scratch, ~minutes): opt in with LIME_SLOW_TESTS=1.
"""

import os

import numpy as np
import pytest

from lime_tpu import native
from lime_tpu.constants import SYMBOL_RANK_LUT
from lime_tpu.ops.fused_pass import _DEGENERATE_BYTE

pytestmark = [
    pytest.mark.skipif(not os.environ.get("LIME_SLOW_TESTS"),
                       reason="set LIME_SLOW_TESTS=1 (9 GB scratch)"),
    pytest.mark.skipif(not native.available(),
                       reason="native library unavailable"),
]

N = 1_200_000_000  # > 1e9 positions
NUM_READS = 50_000_000


def test_billion_position_plan(tmp_path):
    rng = np.random.default_rng(3)
    lcp_path = tmp_path / "big.lcp"
    da_path = tmp_path / "big.da"
    # write in 64M chunks; sparse alpha-runs so the planner does real work
    chunk = 1 << 26
    with open(lcp_path, "wb") as fl, open(da_path, "wb") as fd:
        for lo in range(0, N, chunk):
            n = min(chunk, N - lo)
            lcp = rng.integers(0, 18, n).astype(np.uint32)
            da = np.where(rng.random(n) < 0.9,
                          rng.integers(0, NUM_READS, n),
                          rng.integers(NUM_READS, NUM_READS + 930, n)
                          ).astype(np.uint32)
            lcp.tofile(fl)
            da.tofile(fd)

    lcp = np.memmap(lcp_path, dtype=np.uint32, mode="r")
    da = np.memmap(da_path, dtype=np.uint32, mode="r")
    assert len(lcp) == N

    # stream-plan in host ranges (the multi-host decomposition): peak RSS
    # stays bounded by the range size, not N
    from lime_tpu.parallel.multihost import (
        extend_range_to_cluster_boundaries,
        host_position_range,
    )

    total_rows = 0
    n_hosts = 12
    for h in range(n_hosts):
        lo, hi = host_position_range(N, n_hosts, h)
        lo, hi = extend_range_to_cluster_boundaries(lcp, lo, hi, 16)
        arrays, chunks, windows, W, den_s, den_l, bad_s, bad_l = \
            native.plan_pairs_packed(
                np.ascontiguousarray(lcp[lo:hi]),
                np.ascontiguousarray(da[lo:hi]), None, NUM_READS, 16,
                SYMBOL_RANK_LUT, _DEGENERATE_BYTE.astype(np.uint8))
        assert W == 28  # 50M reads -> the widest packed row format
        total_rows += sum(c[2] for c in chunks)
        del arrays, chunks
    assert total_rows > 0
