"""Sharded fused pipeline: scan + score + classify in one SPMD program.

**Banded formulation.**  With every cluster bounded by ``window`` positions
(the aux metadata's max_len, reference src/ClusterLCP.cpp:307, gives the
bound), any scoring pair (i-o, i) lies within ``o <= window``, and "same
cluster" for the pair is AND(m[k], k in (i-o, i]) where m = lcp >= alpha.
The whole step-1 + step-2 pipeline then becomes banded vector ops over the
position stream — no cluster list is ever materialized:

- occurrence index: occ[i] = sum_{o=1..window} [same-cluster & same doc &
  same symbol at distance o]
- pair scores: for each offset o, match (symbol, occ) between i and i-o and
  scatter-add 1 into the similarity matrix for (read, genome) pairs —
  the occurrence-matching identity from ops/fused_pass.py.

**SPMD layout** over a 2D (sp, dp) mesh:

- the (F, N) position arrays are range-sharded over the flattened
  (sp, dp) axes; each shard fetches a 2*window left halo from its
  predecessor with ppermute — the reference's boundary-straddle protocol
  (src/ClusterLCP.cpp:196-264) as one collective;
- each shard accumulates a partial (F, R, G) matrix for its positions;
  psum_scatter over dp hands every dp group its read-row block,
  then a psum over sp merges the position shards;
- normalization + beta gating + the 4-stage classify cascade run on the
  local row block with no further communication.

Every pair is emitted exactly once, by the shard owning its *later*
position.  Window must be <= 255 so occurrence indices stay below the
genome-counter saturation bound (reference src/ClusterBWT_DA.cpp:96).
The banded path asserts no IUPAC-degenerate symbols in the stream
(production routing sends degenerate clusters to the exact path; see
ops/fused_pass.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from ..ops.classify_tpu import cascade_core


_PAD_W = 256  # static pad width; window is a traced value <= 255


def _bwd(padded: jnp.ndarray, o) -> jnp.ndarray:
    """Element i-o of the unpadded array, given pads of ``_PAD_W``."""
    length = padded.shape[-1] - 2 * _PAD_W
    return lax.dynamic_slice_in_dim(padded, _PAD_W - o, length, axis=-1)


def _fwd(padded: jnp.ndarray, o) -> jnp.ndarray:
    """Element i+o of the unpadded array, given pads of ``_PAD_W``."""
    length = padded.shape[-1] - 2 * _PAD_W
    return lax.dynamic_slice_in_dim(padded, _PAD_W + o, length, axis=-1)


def _pad2(x, fill=0):
    return jnp.pad(x, (_PAD_W, _PAD_W), constant_values=fill)


def banded_partial_sim(m, doc, sym, num_reads: int, num_refs: int,
                       window, emit_ok: Optional[jnp.ndarray] = None,
                       impl: str = "auto", out_rows: Optional[int] = None,
                       acc_dtype=jnp.int32) -> jnp.ndarray:
    """Partial similarity matrix from one position stream.

    - ``m``: the in-run indicator lcp >= alpha, with position 0 forced False
      (the reference's skip-leading rule, src/ClusterLCP.cpp:196-202).
    - ``window``: max cluster length, traced (<= 255 so genome occurrence
      indices stay below the saturation bound, src/ClusterBWT_DA.cpp:96);
      one compiled program serves every window.
    - ``emit_ok``: positions allowed to *emit* pairs.  Every scored pair has
      exactly one read-side element, and that element emits it — so shard
      ownership and cluster routing gate read positions only.
    - ``out_rows``: when None (legacy), returns ``(num_reads, num_refs)``
      sliced exact; otherwise returns the raw padded accumulator
      ``(out_rows, g_pad)`` with the scatter drop row at index
      ``num_reads`` (rows past it stay zero) — the memory-plan shape for
      paper-scale runs, where the caller classifies blockwise and never
      materializes a sliced copy.
    - ``acc_dtype``: accumulator dtype.  ``int8`` wraps mod 256 on overflow,
      which IS the reference's unsaturated uchar SimArray semantics
      (src/ClusterBWT_DA.cpp:183) — at 1/4 the HBM of int32.

    Scatter-add is the expensive op on TPU (~50M rows/s), so the kernel
    performs exactly one: each read position accumulates a per-genome count
    vector V[i, :] across all banded offsets (the genome partner enters as
    a one-hot compare, an elementwise (L, G) op), and V is segment-summed
    by read id at the end.  The o-loops themselves are pure elementwise
    passes over the stream.
    """
    L = m.shape[-1]
    doc = doc.astype(jnp.int32)
    sym = sym.astype(jnp.int32)
    if emit_ok is None:
        emit_ok = jnp.ones(L, dtype=bool)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return _pallas_partial_sim(m, doc, sym, num_reads, num_refs, window,
                                   emit_ok, out_rows=out_rows,
                                   acc_dtype=acc_dtype)

    g_pad = (max(128, -(-num_refs // 128) * 128) if out_rows is not None
             else num_refs)
    n_rows = out_rows if out_rows is not None else num_reads + 1

    pad_m = _pad2(m)
    pad_doc = _pad2(doc, -1)
    pad_sym = _pad2(sym, -1)

    def occ_step(o, carry):
        and_c, occ = carry
        same = and_c & (doc == _bwd(pad_doc, o)) & (sym == _bwd(pad_sym, o))
        occ = occ + same.astype(jnp.int32)
        and_c = and_c & _bwd(pad_m, o)
        return and_c, occ

    _, occ = lax.fori_loop(1, window + 1, occ_step,
                           (m, jnp.zeros(L, jnp.int32)))
    pad_occ = _pad2(occ, -1)

    is_read = doc < num_reads
    g_ids = jnp.arange(g_pad, dtype=jnp.int32)[None, :]

    def pair_step(o, carry):
        and_c, V = carry
        # backward genome partner q = i - o
        db = _bwd(pad_doc, o)
        hit_b = (and_c & (sym == _bwd(pad_sym, o))
                 & (occ == _bwd(pad_occ, o)) & (db >= num_reads))
        # forward genome partner q = i + o; same-cluster over (i, i+o] is
        # the backward AND-accumulator evaluated at i+o
        and_f = _fwd(_pad2(and_c), o)
        df = _fwd(pad_doc, o)
        hit_f = (and_f & (sym == _fwd(pad_sym, o))
                 & (occ == _fwd(pad_occ, o)) & (df >= num_reads))
        V = V + (hit_b[:, None] & (db[:, None] - num_reads == g_ids)
                 ).astype(jnp.int16)
        V = V + (hit_f[:, None] & (df[:, None] - num_reads == g_ids)
                 ).astype(jnp.int16)
        and_c = and_c & _bwd(pad_m, o)
        return and_c, V

    _, V = lax.fori_loop(1, window + 1, pair_step,
                         (m, jnp.zeros((L, g_pad), jnp.int16)))

    emit = is_read & emit_ok
    rows = jnp.where(emit, doc, num_reads)  # padded drop row
    Vm = jnp.where(emit[:, None], V, 0)
    sim = _scatter_sim(Vm, rows, num_reads, n_rows=n_rows,
                       acc_dtype=acc_dtype)
    if out_rows is not None:
        return sim
    return sim[:num_reads, :num_refs]


def _scatter_sim(v, rows, num_reads: int, n_rows: Optional[int] = None,
                 acc_dtype=jnp.int32) -> jnp.ndarray:
    """Segment-sum V rows by read id into a (n_rows, G) accumulator.

    Split into independent partial scatters when the accumulator is small —
    they pipeline measurably better on this hardware — but fall back to one
    scatter when k copies of the matrix would cost real HBM (the paper-scale
    regime, where the accumulator is the dominant allocation).
    """
    L, g_pad = v.shape
    if n_rows is None:
        n_rows = num_reads + 1
    k = 8 if n_rows * g_pad <= (1 << 24) else 1
    chunk = -(-L // k)
    sim = jnp.zeros((n_rows, g_pad), acc_dtype)
    parts = [
        jnp.zeros((n_rows, g_pad), acc_dtype)
        .at[rows[i * chunk:(i + 1) * chunk], :]
        .add(v[i * chunk:(i + 1) * chunk].astype(acc_dtype))
        for i in range(k)
    ]
    for p in parts:
        sim = sim + p
    return sim


def _pallas_partial_sim(m, doc, sym, num_reads: int, num_refs: int,
                        window, emit_ok, block: Optional[int] = None,
                        interpret: bool = False,
                        out_rows: Optional[int] = None,
                        acc_dtype=jnp.int32) -> jnp.ndarray:
    """Partial similarity via the Pallas banded kernel (ops/pallas_kernels).

    Streams the position axis in HBM-bounded blocks: per block, the kernel
    emits the per-position genome-match matrix V once (VMEM-resident across
    all band offsets), then a scatter-add folds it into the similarity
    matrix.  Blocks carry a 1024-position halo of real context on both
    sides, so block boundaries never split a cluster's band (the reference's
    chunk-straddle protocol, src/ClusterLCP.cpp:196-264).
    """
    from ..ops.pallas_kernels import banded_pair_matrix, pack_stream

    L = m.shape[-1]
    g_pad = max(128, -(-num_refs // 128) * 128)
    n_rows = out_rows if out_rows is not None else num_reads + 1
    packed = pack_stream(m, emit_ok, sym)
    rows_all = jnp.where((doc < num_reads) & emit_ok, doc, num_reads)

    def finish(sim):
        if out_rows is not None:
            return sim
        return sim[:num_reads, :num_refs]

    # V block cap ~0.5 GB: (B, G_pad) int8
    B = block or min(L, max(1 << 20, (1 << 29) // g_pad))
    if L <= B:
        v = banded_pair_matrix(packed, doc, window, num_reads, num_refs,
                               interpret=interpret)
        return finish(_scatter_sim(v, rows_all, num_reads, n_rows=n_rows,
                                   acc_dtype=acc_dtype))

    halo = 1024
    n_blocks = -(-L // B)
    l_pad = n_blocks * B
    pk_p = jnp.pad(packed, (halo, l_pad - L + halo))
    dc_p = jnp.pad(doc, (halo, l_pad - L + halo),
                   constant_values=jnp.int32(-0x7FFFFFFF))
    # pad rows so the last block's tail scatters into the drop row
    rows_p = jnp.pad(rows_all, (0, l_pad - L), constant_values=num_reads)

    def body(b, sim):
        pk_e = lax.dynamic_slice(pk_p, (b * B,), (B + 2 * halo,))
        dc_e = lax.dynamic_slice(dc_p, (b * B,), (B + 2 * halo,))
        v_e = banded_pair_matrix(pk_e, dc_e, window, num_reads, num_refs,
                                 interpret=interpret)
        v = v_e[halo:halo + B]
        rows = lax.dynamic_slice(rows_p, (b * B,), (B,))
        # int8 accumulator adds wrap mod 256 — exactly the reference's
        # uchar SimArray += (src/ClusterBWT_DA.cpp:183)
        return sim + _scatter_sim(v, rows, num_reads, n_rows=n_rows,
                                  acc_dtype=acc_dtype)

    sim = lax.fori_loop(0, n_blocks, body,
                        jnp.zeros((n_rows, g_pad), acc_dtype))
    return finish(sim)


def banded_fused_step(lcp, da, sym, num_reads: int, num_refs: int,
                      alpha: int, window: int) -> jnp.ndarray:
    """Single-device fused scan+score forward step (the flagship jit)."""
    L = lcp.shape[-1]
    m = (lcp >= alpha) & (jnp.arange(L) != 0)
    return banded_partial_sim(m, da, sym, num_reads, num_refs,
                              jnp.int32(window))


def make_sharded_pipeline(mesh, num_files: int, num_reads: int,
                          num_refs: int, alpha: int, window: int,
                          read_len: int, beta: float, tax_rank: int,
                          assign_higher: bool,
                          sim_modulus: Optional[int] = 256):
    """Build the jitted SPMD pipeline step over ``mesh`` (axes sp, dp).

    Returns ``step(lcp, da, sym, tax, rank_matrix, valid_t, error)`` where
    the first three are (F, N) arrays sharded P(None, ("sp", "dp")) and the
    outputs are per-read (types, taxid, sim) sharded P("dp").
    """
    if window > 255:
        raise ValueError("window must be <= 255 (genome-counter saturation)")
    sp = mesh.shape["sp"]
    dp = mesh.shape["dp"]
    rows_local = num_reads // dp
    if num_reads % dp:
        raise ValueError("num_reads must be divisible by the dp axis size")
    halo = 2 * window
    beta_f = jnp.float32(beta)

    def shard_fn(lcp, da, sym, tax, rank_matrix, valid_t, error, norm):
        # ``norm`` is a traced argument on purpose: as a constant XLA would
        # strength-reduce x/norm to x*(1/norm), losing bit-parity with the
        # reference's float division (src/ClusterBWT_DA.cpp:404).
        sp_i = lax.axis_index("sp")
        dp_i = lax.axis_index("dp")
        shard_i = sp_i * dp + dp_i  # linear rank in position order

        def from_prev(x, size, fill=0):
            """Last ``size`` elements of the previous position shard."""
            tail = x[:, -size:]
            same_row = (lax.ppermute(
                tail, "dp", [(i, i + 1) for i in range(dp - 1)])
                if dp > 1 else jnp.zeros_like(tail))
            wrapped = (lax.ppermute(tail, "dp", [(dp - 1, 0)])
                       if dp > 1 else tail)
            prev_row = (lax.ppermute(
                wrapped, "sp", [(i, i + 1) for i in range(sp - 1)])
                if sp > 1 else jnp.zeros_like(tail))
            fill_blk = jnp.full_like(tail, fill)
            return jnp.where(dp_i > 0, same_row,
                             jnp.where(sp_i > 0, prev_row, fill_blk))

        def from_next(x, size, fill=0):
            """First ``size`` elements of the next position shard."""
            head = x[:, :size]
            same_row = (lax.ppermute(
                head, "dp", [(i + 1, i) for i in range(dp - 1)])
                if dp > 1 else jnp.zeros_like(head))
            wrapped = (lax.ppermute(head, "dp", [(0, dp - 1)])
                       if dp > 1 else head)
            next_row = (lax.ppermute(
                wrapped, "sp", [(i + 1, i) for i in range(sp - 1)])
                if sp > 1 else jnp.zeros_like(head))
            fill_blk = jnp.full_like(head, fill)
            return jnp.where(dp_i < dp - 1, same_row,
                             jnp.where(sp_i < sp - 1, next_row, fill_blk))

        def extend(x, fill=0):
            # left halo 2W (occ lookback of backward partners), right halo W
            # (forward partners + their occ lookback)
            return jnp.concatenate(
                [from_prev(x, halo, fill), x, from_next(x, window, fill)],
                axis=1)

        lcp_e = extend(lcp)
        da_e = extend(da, fill=-1)
        sym_e = extend(sym, fill=-1)

        L = lcp_e.shape[1]
        idx = jnp.arange(L)
        n_local = lcp.shape[1]
        emit_ok = (idx >= halo) & (idx < halo + n_local)
        first_ok = jnp.logical_not((shard_i == 0) & (idx == halo))

        partial = jax.vmap(
            lambda l, d, s: banded_partial_sim(
                (l >= alpha) & first_ok, d, s, num_reads, num_refs,
                jnp.int32(window), emit_ok=emit_ok)
        )(lcp_e, da_e, sym_e)  # (F, R, G) partial for this shard

        # Row-shard over dp, then merge position shards over sp.
        sims = lax.psum_scatter(partial, "dp", scatter_dimension=1,
                                tiled=True)  # (F, R/dp, G)
        sims = lax.psum(sims, "sp")

        if sim_modulus:
            sims = sims % sim_modulus
        norm_rows = sims.astype(jnp.float32) / norm
        rowmax = jnp.max(norm_rows, axis=2)  # (F, R_l)
        qualify = rowmax > beta_f
        dense = jnp.transpose(
            jnp.where(qualify[:, :, None], norm_rows, 0.0), (1, 0, 2))
        maxs = jnp.where(qualify, rowmax, 0.0).T  # (R_l, F)

        return cascade_core(dense, maxs, tax, rank_matrix, valid_t, error,
                            num_files, tax_rank, assign_higher)

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, ("sp", "dp")), P(None, ("sp", "dp")),
                  P(None, ("sp", "dp")), P(), P(), P(), P(), P()),
        out_specs=(P("dp"), P("dp"), P("dp")),
        check_vma=False,
    )
    jitted = jax.jit(mapped)
    norm = jnp.float32(np.uint32(read_len + 1 - alpha))

    def step(lcp, da, sym, tax, rank_matrix, valid_t, error):
        return jitted(lcp, da, sym, tax, rank_matrix, valid_t, error, norm)

    return step
