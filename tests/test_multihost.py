"""Per-host range planning: the straddle/offset math, host-locally.

The invariant (the reference's thread-count independence, SURVEY.md §4):
per-host planned streams concatenated in host order must equal the
whole-file plan, for any host count — including hosts whose ranges start
or end inside a cluster run.
"""

import numpy as np
import pytest

from lime_tpu import native
from lime_tpu.config import LimeConfig
from lime_tpu.constants import SYMBOL_RANK_LUT
from lime_tpu.formats.arrays import open_lcp
from lime_tpu.ops.fused_pass import _DEGENERATE_BYTE
from lime_tpu.parallel.multihost import (
    extend_range_to_cluster_boundaries,
    host_position_range,
    init_distributed,
    plan_host_range,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_host_position_range_covers_everything():
    for n in (0, 1, 17, 1000):
        for k in (1, 2, 3, 8):
            spans = [host_position_range(n, k, i) for i in range(k)]
            assert spans[0][0] == 0 and spans[-1][1] == n
            for (a, b), (c, d) in zip(spans, spans[1:]):
                assert b == c


def test_extend_range_straddle():
    lcp = np.array([0, 20, 20, 3, 20, 20, 20, 2, 0], np.uint32)
    # start inside the first run -> advance to its closing row (index 3);
    # the end sits on the second run's opening row, and the cluster's
    # p_start row (3) is ours, so the end extends to that run's close (7) —
    # the next host's skip-leading advance lands exactly there (no overlap)
    assert extend_range_to_cluster_boundaries(lcp, 1, 4, 16) == (3, 7)
    assert extend_range_to_cluster_boundaries(lcp, 4, 6, 16) == (7, 7)
    # end inside the second run -> extend to its closing row (index 7)
    assert extend_range_to_cluster_boundaries(lcp, 3, 5, 16) == (3, 7)
    # clean boundaries unchanged
    assert extend_range_to_cluster_boundaries(lcp, 3, 8, 16) == (3, 8)
    assert extend_range_to_cluster_boundaries(lcp, 0, 9, 16) == (0, 9)


@pytest.mark.parametrize("num_hosts", [1, 3, 8])
def test_per_host_plans_concatenate_to_whole_file_plan(dataset, num_hosts):
    ds = dataset
    fasta = ds.collections[0]
    lcp = open_lcp(fasta)
    from lime_tpu.formats.arrays import open_da, open_ebwt

    whole = native.plan_native(
        lcp, open_da(fasta), open_ebwt(fasta), ds.num_reads, 16,
        SYMBOL_RANK_LUT, _DEGENERATE_BYTE, use_u16=False, pad_block=1,
        pad_doc=ds.num_reads + ds.num_genomes)
    w_packed, w_doc, w_nc, w_window, w_bs, w_bl = whole[:6]

    packs, docs, bss, bls, windows = [], [], [], [], []
    prev_hi = 0
    for h in range(num_hosts):
        packed, doc, window, bs, bl, (lo, hi) = plan_host_range(
            fasta, ds.num_reads, ds.num_genomes, 16, num_hosts, h)
        assert lo == prev_hi, "ranges must tile without gap or overlap"
        prev_hi = hi
        packs.append(packed)
        docs.append(doc)
        windows.append(window)
        bss.append(bs)
        bls.append(bl)
    assert prev_hi == len(lcp)

    np.testing.assert_array_equal(np.concatenate(packs), w_packed[:w_nc])
    np.testing.assert_array_equal(np.concatenate(docs), w_doc[:w_nc])
    np.testing.assert_array_equal(np.concatenate(bss), w_bs)
    np.testing.assert_array_equal(np.concatenate(bls), w_bl)
    assert max(windows) == w_window


def test_init_distributed_single_process():
    pid, nproc = init_distributed()
    assert (pid, nproc) == (0, 1)
