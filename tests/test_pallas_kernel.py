"""Parity: Pallas banded kernel (interpret mode) vs the XLA banded pass.

The Pallas kernel runs compiled only on real TPU hardware; CI validates its
semantics in interpreter mode on small streams against the independently
tested XLA formulation (which itself is oracle-validated in
test_tpu_executor.py / test_fused_pipeline.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lime_tpu.ops.pallas_kernels import banded_pair_matrix, pack_stream
from lime_tpu.parallel.sharded import banded_partial_sim


def _rand_stream(rng, n, num_reads, num_refs, alpha, max_run):
    lcp = rng.integers(0, alpha + 6, size=n).astype(np.int32)
    lcp[0] = 0
    run = 0
    m = lcp >= alpha
    for i in range(n):
        run = run + 1 if m[i] else 0
        if run >= max_run:
            lcp[i] = 0
            run = 0
    m = lcp >= alpha
    m[0] = False
    doc = rng.integers(0, num_reads + num_refs, size=n).astype(np.int32)
    sym = rng.integers(0, 4, size=n).astype(np.int32)
    return m, doc, sym


def _sim_via_pallas(m, doc, sym, num_reads, num_refs, window, emit_ok=None):
    n = len(doc)
    emit = np.ones(n, bool) if emit_ok is None else emit_ok
    packed = pack_stream(m, emit, sym)
    v = np.asarray(banded_pair_matrix(jnp.asarray(packed), jnp.asarray(doc),
                                      jnp.int32(window), num_reads, num_refs,
                                      interpret=True))
    sim = np.zeros((num_reads + 1, v.shape[1]), np.int64)
    rows = np.where((doc < num_reads) & emit, doc, num_reads)
    np.add.at(sim, rows, v.astype(np.int64))
    return sim[:num_reads, :num_refs]


@pytest.mark.parametrize("num_refs", [6, 128, 200])
@pytest.mark.parametrize("window", [1, 7, 32])
def test_pallas_matches_xla(num_refs, window):
    rng = np.random.default_rng(window * 1000 + num_refs)
    num_reads = 300
    n = 5000
    m, doc, sym = _rand_stream(rng, n, num_reads, num_refs, 4, window)
    ref = np.asarray(banded_partial_sim(
        jnp.asarray(m), jnp.asarray(doc), jnp.asarray(sym),
        num_reads, num_refs, jnp.int32(window)))
    got = _sim_via_pallas(m, doc, sym, num_reads, num_refs, window)
    np.testing.assert_array_equal(got, ref)


def test_pallas_emit_mask():
    rng = np.random.default_rng(99)
    num_reads, num_refs, window, n = 200, 12, 9, 4096
    m, doc, sym = _rand_stream(rng, n, num_reads, num_refs, 4, window)
    emit = rng.random(n) < 0.5
    ref = np.asarray(banded_partial_sim(
        jnp.asarray(m), jnp.asarray(doc), jnp.asarray(sym),
        num_reads, num_refs, jnp.int32(window),
        emit_ok=jnp.asarray(emit)))
    got = _sim_via_pallas(m, doc, sym, num_reads, num_refs, window, emit)
    np.testing.assert_array_equal(got, ref)


def test_pallas_blocked_streaming():
    """The HBM-bounded block loop scores block-straddling clusters exactly."""
    from lime_tpu.parallel.sharded import _pallas_partial_sim

    rng = np.random.default_rng(17)
    num_reads, num_refs, window, n = 400, 10, 21, 9000
    m, doc, sym = _rand_stream(rng, n, num_reads, num_refs, 4, window)
    ref = np.asarray(banded_partial_sim(
        jnp.asarray(m), jnp.asarray(doc), jnp.asarray(sym),
        num_reads, num_refs, jnp.int32(window)))
    got = np.asarray(_pallas_partial_sim(
        jnp.asarray(m), jnp.asarray(doc.astype(np.int32)),
        jnp.asarray(sym), num_reads, num_refs, jnp.int32(window),
        jnp.ones(n, bool), block=2048, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_tile_boundary_clusters():
    """Clusters straddling the 2048-position tile boundary score exactly."""
    num_reads, num_refs, window = 50, 4, 40
    n = 2048 * 2 + 100
    m = np.zeros(n, bool)
    doc = np.full(n, num_reads + 1, np.int32)
    sym = np.zeros(n, np.int32)
    rng = np.random.default_rng(5)
    # one cluster centered on every multiple of 2048, plus a few elsewhere
    for start in (2048 - 20, 4096 - 3, 100, 3000):
        ln = 39
        m[start + 1:start + ln] = True
        doc[start:start + ln] = rng.integers(0, num_reads + num_refs, ln)
        sym[start:start + ln] = rng.integers(0, 4, ln)
    m[0] = False
    ref = np.asarray(banded_partial_sim(
        jnp.asarray(m), jnp.asarray(doc), jnp.asarray(sym),
        num_reads, num_refs, jnp.int32(window)))
    got = _sim_via_pallas(m, doc, sym, num_reads, num_refs, window)
    np.testing.assert_array_equal(got, ref)


def test_pair_hits_pallas_matches_core():
    """Pair-stream Pallas kernel vs the XLA core (read-side rows).

    The symmetric-pair formulation leaves garbage counts on genome-side
    rows (every caller scatter-drops them), so parity is asserted on
    read-side rows.  Interpret mode on CPU; the same path runs compiled
    when the bench executes this file on the real chip.
    """
    import os

    import jax

    from lime_tpu.ops.pair_score import _pair_hits_core
    from lime_tpu.ops.pallas_kernels import PAIR_TILE, pair_hits_pallas

    interpret = jax.default_backend() != "tpu" \
        or not os.environ.get("LIME_TEST_TPU")
    rng = np.random.default_rng(11)
    n = 2 * PAIR_TILE  # two tiles: copies straddle the tile boundary,
    # exercising the halo DMA/restack path (not just tile 0)
    codes = np.zeros(n, np.uint8)
    i = 0
    while i < n:
        copy_len = int(rng.integers(1, 14))
        for j in range(min(copy_len, n - i)):
            sym = rng.integers(0, 4)
            m = 0 if j == 0 else 1
            dr = 0 if (j == 0 or rng.random() < 0.5) else 1
            gs = 0 if j == 0 else int(rng.random() < 0.4)
            codes[i + j] = sym | (m << 2) | (dr << 3) | (gs << 4)
        i += copy_len
    for window in (3, 14):
        w = jnp.int32(window)
        m = jnp.asarray(((codes >> 2) & 1).astype(bool))
        dr = jnp.asarray(((codes >> 3) & 1).astype(bool))
        gs_np = ((codes >> 4) & 1).astype(bool)
        sym = jnp.asarray((codes & 3).astype(np.int8))
        ref = np.asarray(_pair_hits_core(m, dr, jnp.asarray(gs_np), sym, w))
        got = np.asarray(pair_hits_pallas(jnp.asarray(codes), w,
                                          interpret=interpret))
        assert np.array_equal(ref[~gs_np], got[~gs_np]), window


from lime_tpu.ops.pallas_kernels import (  # noqa: E402 - shared synth
    planner_shaped_stream as _planner_shaped_stream,
)


@pytest.mark.parametrize("cap", [16, 64])
def test_pair_hits_pallas_scan_matches_core(cap):
    """Log-step scan kernel vs the XLA core on planner-shaped streams.

    The scan formulation relies on the packed planner's invariants
    (genome rows at the copy tail, one genome docrun per copy, copy
    length <= the bucket cap), which every production stream satisfies
    by construction; read-side rows must match the band-pass core
    exactly, genome-side rows are scatter-dropped garbage.
    """
    import os

    import jax

    from lime_tpu.ops.pair_score import _pair_hits_core
    from lime_tpu.ops.pallas_kernels import PAIR_TILE, pair_hits_pallas

    interpret = jax.default_backend() != "tpu" \
        or not os.environ.get("LIME_TEST_TPU")
    rng = np.random.default_rng(100 + cap)
    n = 2 * PAIR_TILE
    codes = _planner_shaped_stream(rng, n, cap)
    w = jnp.int32(cap)
    m = jnp.asarray(((codes >> 2) & 1).astype(bool))
    dr = jnp.asarray(((codes >> 3) & 1).astype(bool))
    gs_np = ((codes >> 4) & 1).astype(bool)
    sym = jnp.asarray((codes & 3).astype(np.int8))
    ref = np.asarray(_pair_hits_core(m, dr, jnp.asarray(gs_np), sym, w))
    got = np.asarray(pair_hits_pallas(jnp.asarray(codes), w, cap=cap,
                                      interpret=interpret))
    assert np.array_equal(ref[~gs_np], got[~gs_np])


@pytest.mark.parametrize("cap", [16, 64])
def test_pair_hits_scan_vs_vectorized_oracle_large(cap):
    """Production-size cross-check: 8 tiles of planner-shaped stream vs
    the vectorized numpy oracle (round 4's sequential oracle capped
    these sizes; PAIR_TILE-boundary edge cases now get real coverage)."""
    import os

    import jax

    from lime_tpu.ops.pair_score import pair_hits_host
    from lime_tpu.ops.pallas_kernels import PAIR_TILE, pair_hits_pallas

    interpret = jax.default_backend() != "tpu" \
        or not os.environ.get("LIME_TEST_TPU")
    rng = np.random.default_rng(200 + cap)
    n = 8 * PAIR_TILE
    codes = _planner_shaped_stream(rng, n, cap)
    # oracle packing: bit6 = m, bit5 = dr, bit4 = gs, bits 0-3 = sym
    packed = ((codes & 3)
              | (((codes >> 3) & 1) << 5)
              | (((codes >> 4) & 1) << 4)
              | (((codes >> 2) & 1) << 6)).astype(np.uint8)
    want = pair_hits_host(packed)
    got = np.asarray(pair_hits_pallas(jnp.asarray(codes), jnp.int32(cap),
                                      cap=cap, interpret=interpret))
    gs_np = ((codes >> 4) & 1).astype(bool)
    assert np.array_equal(want[~gs_np], got[~gs_np])
