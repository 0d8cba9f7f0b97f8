"""Pallas TPU kernel for the banded occurrence-matching scoring pass.

This is the hot op of the whole pipeline (reference src/ClusterBWT_DA.cpp:
256-358 — there a per-cluster fseek + std::sort + histogram loop).  The
XLA formulation in :mod:`lime_tpu.parallel.sharded` carries the per-position
pair-count matrix ``V (L, G)`` through a ``fori_loop`` over band offsets, so
every offset iteration streams the full V through HBM — ``window``× more
HBM traffic than the math needs.  This kernel keeps one position tile's V
in VMEM across *all* offsets and writes it to HBM exactly once:

    HBM traffic = read the packed stream once + write V once,

independent of ``window``.

Layout: V lives as ``(G, T)`` — genomes on sublanes, positions on lanes —
so every per-offset quantity (masks, shifted partners, occurrence indices)
stays a ``(1, ext)`` row vector and the genome one-hot is a single
broadcast compare ``partner_doc (1, T) == iota (G, 1)``.  Band shifts are
``pltpu.roll`` lane rotations with a *traced* shift, so one compiled
program serves every window <= 255; rotation wrap pollutes only the first
``o`` halo lanes, which the math never reads.

V is int8 because it is provably 0/1: within one cluster the occurrence
index is unique per (document, symbol), so for a fixed read-side position
(symbol s, occurrence k) and a fixed genome g there is at most one matching
genome-side position in the entire cluster.

Stream encoding (one byte per position + one i32 doc id):

    bit 6     in-cluster run mask  m[i] = lcp[i] >= alpha  (m[0] := 0)
    bit 5     emit gate (host-routed clusters cleared; pads cleared)
    bits 0-3  symbol rank (SYMBOL_RANK_LUT; 0 when use_ebwt=False)

The grid walks position tiles; each program DMAs its tile plus a
2*W_MAX left / W_MAX right halo of raw stream from HBM (the reference's
thread-boundary straddle protocol, src/ClusterLCP.cpp:196-264, reduced to
a halo read), rebuilds occurrence indices locally, and emits the tile's V.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W_MAX = 256     # static band capacity; window <= 255 at runtime
# The math needs 2*W_MAX left halo (occ lookback of backward partners) and
# W_MAX right halo (forward partners).  Both are rounded up to 1024 so the
# per-tile DMA slices stay aligned to the VMEM tiling of every stream dtype
# (i8 tiles are 4x128 = 512 elements, i32 tiles 8x128 = 1024).
_HALO_L = 1024
_HALO_R = 1024

PACK_M_BIT = 6
PACK_EMIT_BIT = 5


def _tile_for(g_pad: int) -> int:
    """Position-tile size keeping the VMEM V tile (G, T) around ~2 MB."""
    if g_pad <= 1024:
        return 2048
    if g_pad <= 2048:
        return 1024
    return 512


def _kernel(win_ref, nread_ref, packed_hbm, doc_hbm, out_ref,
            pk_s, doc_s, v_s, sems, *, tile: int, g_pad: int,
            interpret: bool):
    w = win_ref[0, 0]
    num_reads = nread_ref[0, 0]
    i = pl.program_id(0)
    ext = tile + _HALO_L + _HALO_R
    c0 = _HALO_L  # ext index of the tile's first position

    cp_pk = pltpu.make_async_copy(
        packed_hbm.at[pl.ds(i * tile, ext)], pk_s, sems.at[0])
    cp_doc = pltpu.make_async_copy(
        doc_hbm.at[pl.ds(i * tile, ext)], doc_s, sems.at[1])
    cp_pk.start()
    cp_doc.start()
    cp_pk.wait()
    cp_doc.wait()

    pk = pk_s[:].reshape(1, ext).astype(jnp.int32)   # (1, ext)
    doc = doc_s[:].reshape(1, ext)                   # (1, ext) i32
    m32 = (pk >> PACK_M_BIT) & 1             # dynamic rotate needs 32-bit
    sym = pk & 15

    if interpret:  # np-backed interpreter lacks the TPU rotate primitive
        def rot(x, shift):
            return jnp.roll(x, shift, axis=1)
    else:
        def rot(x, shift):
            return pltpu.roll(x, shift, axis=1)

    def bwd(x, o):           # value at j - o (wrap garbage in j < o, unread)
        return rot(x, o)

    def fwd(x, o):           # value at j + o
        return rot(x, ext - o)

    def occ_step(o, carry):
        and1, occ = carry
        same = (and1 & ((doc == bwd(doc, o)) & (sym == bwd(sym, o)))
                .astype(jnp.int32))
        and1 = and1 & bwd(m32, o)
        return and1, occ + same

    _, occ = lax.fori_loop(1, w + 1, occ_step,
                           (m32, jnp.zeros((1, ext), jnp.int32)))

    v_s[:] = jnp.zeros_like(v_s)
    g_col = lax.broadcasted_iota(jnp.int32, (g_pad, 1), 0)
    sl = lambda x: x[:, c0:c0 + tile]  # noqa: E731  static center slice

    def pair_step(o, and2):
        # backward partner j = i - o: same-cluster = AND(m, (j, i]) = and2[i]
        doc_b, sym_b, occ_b = bwd(doc, o), bwd(sym, o), bwd(occ, o)
        hit_b = and2 & ((sym == sym_b) & (occ == occ_b)).astype(jnp.int32)
        # forward partner j = i + o: AND(m, (i, j]) = and2 evaluated at j
        doc_f, sym_f, occ_f = fwd(doc, o), fwd(sym, o), fwd(occ, o)
        hit_f = fwd(and2, o) & ((sym == sym_f) & (occ == occ_f)
                                ).astype(jnp.int32)
        # genome one-hot: negative (read-side) partners never match g_col
        vb = (sl(hit_b) != 0) & ((sl(doc_b) - num_reads) == g_col)  # (G, T)
        vf = (sl(hit_f) != 0) & ((sl(doc_f) - num_reads) == g_col)
        v_s[:] = v_s[:] | (vb | vf).astype(jnp.int8)
        return and2 & bwd(m32, o)

    lax.fori_loop(1, w + 1, pair_step, m32)

    emit = ((pk >> PACK_EMIT_BIT) & 1) * (doc < num_reads).astype(jnp.int32)
    out_ref[:] = v_s[:] & sl(emit).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("num_reads", "num_refs", "interpret"))
def banded_pair_matrix(packed: jnp.ndarray, doc: jnp.ndarray, window,
                       num_reads: int, num_refs: int,
                       interpret: bool = False) -> jnp.ndarray:
    """Per-position genome-match matrix ``V (n, G_pad)`` int8 (0/1 entries).

    ``packed`` u8 and ``doc`` i32 are 1D position streams (see module
    docstring for the byte layout); ``window`` is a traced i32 <= 255.
    ``V[i, g] = 1`` iff position i is an emitting read-side element whose
    (symbol, occurrence) matches genome ``g`` somewhere in its cluster.
    Rows for non-emitting positions are zero.  G_pad = num_refs rounded up
    to the 128-lane boundary; callers slice ``[:, :num_refs]`` semantics
    out of the scatter result.
    """
    n = packed.shape[0]
    g_pad = max(128, -(-num_refs // 128) * 128)
    tile = _tile_for(g_pad)
    n_pad = -(-n // tile) * tile

    pk = jnp.pad(packed, (_HALO_L, n_pad - n + _HALO_R))
    dc = jnp.pad(doc.astype(jnp.int32), (_HALO_L, n_pad - n + _HALO_R),
                 constant_values=jnp.int32(-0x7FFFFFFF))

    win = jnp.asarray(window, jnp.int32).reshape(1, 1)
    nread = jnp.asarray(num_reads, jnp.int32).reshape(1, 1)
    ext = tile + _HALO_L + _HALO_R

    v_gl = pl.pallas_call(
        functools.partial(_kernel, tile=tile, g_pad=g_pad,
                          interpret=interpret),
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((g_pad, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g_pad, n_pad), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((ext,), jnp.uint8),
            pltpu.VMEM((ext,), jnp.int32),
            pltpu.VMEM((g_pad, tile), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(win, nread, pk, dc)
    return v_gl[:, :n].T


# ---------------------------------------------------------------------------
# Pair-stream kernel: VMEM-resident band passes for the G-independent
# engine (ops/pair_score).  The XLA formulation loops band offsets with
# the chain/occ state round-tripping through HBM every offset —
# O(window) passes of traffic.  Here a tile's state lives in VMEM across
# all offsets of BOTH passes: HBM traffic = read the 1-byte codes once +
# write the int32 hits once, independent of window (measured round 3:
# the XLA loop ran at 21% of the HBM roofline by the per-offset traffic
# model; this kernel removes the model's window factor entirely).
#
# Layout: positions split into 8 sublane rows of PAIR_SUB lanes each, so
# every per-offset op is a full (8, ext) VPU tile instead of a (1, ext)
# row vector idling 7/8 sublanes.  Each row DMAs its own PAIR_HALO-lane
# halo on both sides (the only duplicated traffic, ~2x on the 1-byte
# input); band shifts are per-row pltpu.roll lane rotations with a
# traced shift, so one compiled program serves every window <= 255 —
# rotation wrap garbage stays inside the halo lanes the math never
# trusts (chain bits are 0 there: the planner opens every copy with
# m=0/dr=0, and pad bytes are 0x10 = side-only).
#
# Row codes (the unpacked 5-bit planner lanes, ops/pair_score.py):
#   bits 0-1 sym, bit 2 m (in-copy chain), bit 3 docrun, bit 4 side.
# ---------------------------------------------------------------------------

PAIR_SUB = 2048
PAIR_HALO = 512
PAIR_TILE = 8 * PAIR_SUB


def _pair_kernel(win_ref, codes_hbm, out_ref, pk_s, sems, *,
                 interpret: bool):
    w = win_ref[0, 0]
    i = pl.program_id(0)
    ext = PAIR_SUB + 2 * PAIR_HALO

    cp = pltpu.make_async_copy(
        codes_hbm.at[pl.ds(i * PAIR_TILE, PAIR_TILE + 2 * PAIR_HALO)],
        pk_s, sems)
    cp.start()
    cp.wait()

    flat = pk_s[:]
    # overlapping restack: row s covers positions [s*SUB - HALO,
    # s*SUB + SUB + HALO) of the tile — one relayout per tile, so every
    # band op below runs on full (8, ext) VPU tiles
    pk = jnp.stack([flat[s * PAIR_SUB:s * PAIR_SUB + ext]
                    for s in range(8)]).astype(jnp.int32)
    sym = pk & 3
    m32 = (pk >> 2) & 1
    dr = (pk >> 3) & 1
    gs = (pk >> 4) & 1

    if interpret:  # np-backed interpreter lacks the TPU rotate primitive
        def rot(x, shift):
            return jnp.roll(x, shift, axis=1)
    else:
        def rot(x, shift):
            return pltpu.roll(x, shift, axis=1)

    def bwd(x, o):
        return rot(x, o)

    def fwd(x, o):
        return rot(x, ext - o)

    def occ_step(o, carry):
        chain, occ = carry
        occ = occ + (chain & (sym == bwd(sym, o)).astype(jnp.int32))
        return chain & bwd(dr, o), occ

    _, occ = lax.fori_loop(1, w + 1, occ_step,
                           (dr, jnp.zeros((8, ext), jnp.int32)))

    # one fused comparison key: (occ, sym) equality in a single compare
    # (occ <= 255, sym <= 3 -> key < 1024)
    key = occ * 4 + sym

    def hit_step(o, carry):
        # Symmetric pair formulation: P[i] = 1 iff (i-o, i) lie in the
        # same copy with equal (sym, occ) — identical seen from either
        # end, so the backward hit is P & gs[i-o] and the forward hit at
        # i-o is fwd(P & gs[i], o).  Genome-side rows accumulate garbage
        # counts, but the caller's scatter drops them (flat = drop row
        # for gs rows) — 4 lane rotations per offset instead of 8.
        chain, hits = carry
        p = chain & (key == bwd(key, o)).astype(jnp.int32)
        hits = hits + (p & bwd(gs, o)) + fwd(p & gs, o)
        return chain & bwd(m32, o), hits

    _, hits = lax.fori_loop(1, w + 1, hit_step,
                            (m32, jnp.zeros((8, ext), jnp.int32)))
    out_ref[:] = hits[:, PAIR_HALO:PAIR_HALO + PAIR_SUB]


# ---------------------------------------------------------------------------
# Scan-variant pair kernel: log2(cap) segmented scans instead of O(window)
# band passes.  Exploits two structural facts of the packed pair streams:
#
# 1. a docrun never exceeds the bucket's copy-length cap, so the
#    occurrence index is a *segmented prefix count* — computable in
#    ceil(log2(cap)) Hillis-Steele steps on a byte-packed one-hot (4
#    symbols x 8-bit counts in one i32; docruns <= 255 never carry);
# 2. genome rows sit at the tail of each copy and (sym, occ) is unique
#    within a docrun, so a read row has AT MOST ONE matching genome row —
#    "count matches" degenerates to "does bit (sym, occ) appear in the
#    copy's genome-key bitmask", a backward segmented OR-scan of
#    per-symbol occurrence bitmasks, again log2(cap) steps.
#
# At cap=16 this is ~70 VPU ops/position vs ~256 for the band-pass loop.
# cap picks the static bitmask width: 16 -> 2 i32 regs (2 symbols per
# reg), 64 -> 8 regs; cap 255 keeps the band-pass kernel (32 regs of
# (8, ext) i32 would pressure VMEM, and bucket-2 rows are rare).
# ---------------------------------------------------------------------------


def _pair_kernel_scan(codes_hbm, out_ref, pk_s, sems, *, cap: int,
                      interpret: bool):
    ext = PAIR_SUB + 2 * PAIR_HALO
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        codes_hbm.at[pl.ds(i * PAIR_TILE, PAIR_TILE + 2 * PAIR_HALO)],
        pk_s, sems)
    cp.start()
    cp.wait()

    flat = pk_s[:]
    pk = jnp.stack([flat[s * PAIR_SUB:s * PAIR_SUB + ext]
                    for s in range(8)]).astype(jnp.int32)
    sym = pk & 3
    m32 = (pk >> 2) & 1
    dr = (pk >> 3) & 1
    gs = (pk >> 4) & 1

    if interpret:
        def rot(x, shift):
            return jnp.roll(x, shift, axis=1)
    else:
        def rot(x, shift):
            return pltpu.roll(x, shift, axis=1)

    LOG = max(1, (cap - 1).bit_length())
    n_bits = 16 if LOG <= 4 else 64  # bitmask width per symbol

    # occurrence index: segmented inclusive prefix count of own symbol,
    # one i32 holding 4 byte-packed counters (no cross-byte carry while
    # docruns stay <= 255 — the planner's copy cap guarantees it)
    x = jnp.where(sym == 0, 1,
                  jnp.where(sym == 1, 1 << 8,
                            jnp.where(sym == 2, 1 << 16, 1 << 24)))
    f = dr
    for k in range(LOG):
        d = 1 << k
        x = x + jnp.where(f == 1, rot(x, d), 0)
        f = f & rot(f, d)
    cnt = jnp.where(sym == 0, x & 255,
                    jnp.where(sym == 1, (x >> 8) & 255,
                              jnp.where(sym == 2, (x >> 16) & 255,
                                        (x >> 24) & 255)))
    occ = cnt - 1  # exclusive count = the band-pass kernel's occ

    # genome-key bitmasks: bit (sym, occ) set on genome rows
    if n_bits == 16:
        n_regs = 2
        base = jnp.left_shift(1, occ + ((sym & 1) << 4))
        sels = [(sym >> 1) == r for r in range(n_regs)]
        reg_of = sym >> 1
    else:
        n_regs = 8
        base = jnp.left_shift(1, occ & 31)
        sels = [(sym == (r >> 1)) & ((occ >> 5) == (r & 1))
                for r in range(n_regs)]
        reg_of = (sym << 1) | (occ >> 5)
    gs_b = gs == 1
    gm = [jnp.where(gs_b & s, base, 0) for s in sels]

    # backward segmented OR-scan over the copy (segment flag: row i+1
    # continues the copy iff its m bit is set)
    F = rot(m32, ext - 1)  # m at i+1
    d = 1
    for _ in range(LOG):
        fwd_sel = F == 1
        gm = [a | jnp.where(fwd_sel, rot(a, ext - d), 0) for a in gm]
        F = F & rot(F, ext - d)
        d <<= 1

    a_sel = gm[0]
    for r in range(1, n_regs):
        a_sel = jnp.where(reg_of == r, gm[r], a_sel)
    hits = ((a_sel & base) != 0).astype(jnp.int32)
    out_ref[:] = hits[:, PAIR_HALO:PAIR_HALO + PAIR_SUB]


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def pair_hits_pallas(codes: jnp.ndarray, window, cap: int = 255,
                     interpret: bool = False) -> jnp.ndarray:
    """Per-row genome-match counts over a pair-stream code array.

    ``codes`` is a 1-D u8 array of unpacked 5-bit row codes whose length
    is a multiple of PAIR_TILE (planner chunks are pow2 >= 65536 or 512K
    multiples, so this always holds); ``window`` a traced i32 <= 255.
    ``cap`` is the static copy-length bound of the stream's bucket
    (BUCKET_CAP in the planner): cap <= 64 selects the log-step scan
    kernel, larger caps the band-pass kernel.  Semantics identical to
    ops.pair_score._pair_hits_core on read-side rows (genome-side rows
    carry garbage that every caller's scatter drops).
    """
    n = codes.shape[0]
    padded = jnp.pad(codes, (PAIR_HALO, PAIR_HALO))
    ext = PAIR_SUB + 2 * PAIR_HALO

    if cap <= 64:
        out = pl.pallas_call(
            functools.partial(_pair_kernel_scan, cap=cap,
                              interpret=interpret),
            grid=(n // PAIR_TILE,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((8, PAIR_SUB), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n // PAIR_SUB, PAIR_SUB),
                                           jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((PAIR_TILE + 2 * PAIR_HALO,), jnp.uint8),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(padded)
        return out.reshape(n)

    win = jnp.asarray(window, jnp.int32).reshape(1, 1)
    out = pl.pallas_call(
        functools.partial(_pair_kernel, interpret=interpret),
        grid=(n // PAIR_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((8, PAIR_SUB), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // PAIR_SUB, PAIR_SUB),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((PAIR_TILE + 2 * PAIR_HALO,), jnp.uint8),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(win, padded)
    return out.reshape(n)


def planner_shaped_stream(rng, n, cap):
    """Synthesize codes with the packed planner's structural invariants:
    each copy = read rows (1+ docruns) then ONE genome docrun (gs=1);
    copy length <= cap; a copy's first row is read-side with m=0.

    The scan kernels' semantic contract is exactly this shape (see
    _pair_kernel_scan); tests and the bench use it to cross-check and
    time them on representative streams.
    """
    codes = np.zeros(n, np.uint8)
    i = 0
    while i < n:
        n_read = int(rng.integers(1, max(2, cap // 2)))
        n_gen = int(rng.integers(1, cap - n_read + 1)) if cap > n_read \
            else 1
        copy = []
        for j in range(n_read):
            sym = int(rng.integers(0, 4))
            dr = 0 if (j == 0 or rng.random() < 0.3) else 1
            copy.append(sym | (dr << 3))
        for j in range(n_gen):
            sym = int(rng.integers(0, 4))
            dr = 0 if j == 0 else 1
            copy.append(sym | (dr << 3) | (1 << 4))
        for j, c in enumerate(copy[:n - i]):
            codes[i + j] = c | ((1 << 2) if j else 0)  # m bit
        i += len(copy)
    return codes


def pack_stream(m, emit, sym):
    """Pack (m, emit, sym-rank) into the kernel's one-byte position code."""
    xp = np if isinstance(m, np.ndarray) else jnp
    return (xp.asarray(sym).astype(xp.uint8)
            | (xp.asarray(m).astype(xp.uint8) << PACK_M_BIT)
            | (xp.asarray(emit).astype(xp.uint8) << PACK_EMIT_BIT))