"""Single-dispatch-class fused pipeline: collections -> per-read assignments.

The staged path (pipeline.py) mirrors the reference's file-per-stage
architecture.  This module is the serving path: banded scan+score runs as
one device program per collection, dispatched asynchronously so the host
planning of collection i+1 and the upload of its packed stream overlap the
device compute of collection i; a final program fuses counter wrap,
normalization, beta gating and the 4-stage classify cascade.  A run costs
3-5 bytes/position of upload and a per-read-sized download.

Memory plan (paper-scale: 10^7 reads x 10^3 genomes):

- each collection's score matrix accumulates on device as ``(R_pad, G_pad)``
  int8 — R x G *bytes*, the same footprint as the reference's dense uchar
  SimArray (src/ClusterBWT_DA.cpp:606-611); int8 wraparound IS the
  reference's unsaturated uchar counter semantics (ClusterBWT_DA.cpp:183).
  ``wide_sim`` (reads > 255bp) switches to int32.
- host-rescued clusters (IUPAC-degenerate / longer than 255) produce a
  *sparse* COO correction — never a dense (F, R, G) buffer — scatter-added
  into the device matrices inside the classify program.
- the classify program walks read blocks: normalization, beta gating and
  the 4-stage cascade touch one (block, F, G_pad) float32 tile at a time,
  and only the per-read (type, taxid, sim) triplet ever comes home.

Host-side planning per collection (native C++ single pass, released GIL):

- boundary scan -> alpha-clusters with the membership filter applied
  on the fly (reference src/ClusterLCP.cpp:220);
- clusters the banded kernel cannot express (IUPAC-degenerate or longer
  than 255) are routed to the exact host scorer; everything else is
  compacted into the device stream (one packed byte + one doc id per
  position; a cluster's first row carries run-bit 0 so adjacent clusters
  never band-match each other).
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..config import LimeConfig
from ..constants import SYMBOL_RANK_LUT
from ..formats.arrays import open_da, open_ebwt, open_lcp
from ..formats.lineage import Lineage
from ..ops.classify_ops import ClassifyResult
from ..ops.classify_tpu import blockwise_cascade
from ..ops.fused_pass import _DEGENERATE_BYTE
from .. import native
from ..ops.scoring import _expand_positions, score_clusters
from ..utils.timing import PhaseTimer

_BLOCK = 1 << 20
_M_BIT = 6


def _g_pad_for(num_refs: int) -> int:
    return max(128, -(-num_refs // 128) * 128)


def _classify_block_for(num_reads: int) -> int:
    """Read-block size for the blockwise cascade (static per num_reads)."""
    from .classify_tpu import classify_block_size

    return classify_block_size(num_reads + 1)


def _r_pad_for(num_reads: int) -> int:
    from .classify_tpu import pad_rows_for

    return pad_rows_for(num_reads + 1)


@functools.partial(
    jax.jit, static_argnames=("num_reads", "num_refs", "out_rows", "wide"))
def _score_program(packed, doc, window, num_reads: int, num_refs: int,
                   out_rows: int, wide: bool):
    from ..parallel.sharded import banded_partial_sim

    m = ((packed >> _M_BIT) & 1).astype(bool)
    sym = (packed & 15).astype(jnp.int8)
    return banded_partial_sim(m, doc.astype(jnp.int32), sym,
                              num_reads, num_refs, window,
                              out_rows=out_rows,
                              acc_dtype=jnp.int32 if wide else jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("num_files", "tax_rank", "assign_higher", "is_mod",
                     "block"),
    donate_argnums=(0,))
def _classify_program(sims, crows, ccols, cvals, cfile, tax, rank_matrix,
                      valid_t, error, norm, beta, num_files: int,
                      tax_rank: int, assign_higher: bool, is_mod: bool,
                      block: int):
    """Blockwise wrap + normalize + beta-gate + cascade over (F, R_pad, G_pad).

    ``sims`` is donated: the sparse correction scatter happens in place.
    Rows past the real read count are junk (the scatter drop row and pad)
    and are discarded by the caller; genome lanes past the real count are
    masked by ``valid_t``.
    """
    if crows.shape[0]:
        # int8 add wraps mod 256 = the reference's uchar accumulate, so the
        # correction values enter pre-wrapped
        sims = sims.at[cfile, crows, ccols].add(
            cvals.astype(sims.dtype), mode="drop")
    return blockwise_cascade(sims, tax, rank_matrix, valid_t, error, norm,
                             beta, num_files, tax_rank, assign_higher,
                             is_mod, block)


def _dense_threshold_for(num_genomes: int, config: LimeConfig) -> int:
    """Genome-position threshold for TPU routing (see LimeConfig).

    The banded kernel's per-position cost is window * G_pad one-hot lanes,
    so its economics collapse past ~256 genomes (measured: a 930-genome
    workload routed to it is ~100x slower than the native scorer).  Until
    the MXU histogram-matmul path for genome-dense clusters lands, large-G
    scoring runs entirely on the native scorer and the TPU carries
    classification.
    """
    if config.dense_threshold is not None:
        return config.dense_threshold
    return 0 if _g_pad_for(num_genomes) <= 256 else (1 << 62)


def _score_small_dense(starts, lens, da, ebwt, n_r, n_g,
                       config: LimeConfig) -> np.ndarray:
    """Exact scores for a (small, remapped) cluster set — native or numpy."""
    if native.available():
        from ..constants import IUPAC_WATERFALL_PAIRS

        return native.score_clusters_native(
            starts, lens, da, ebwt, n_r, n_g, SYMBOL_RANK_LUT,
            _DEGENERATE_BYTE, IUPAC_WATERFALL_PAIRS,
            wide=config.wide_sim,
            threads=0 if ebwt is None or len(starts) > 64 else 1)
    return score_clusters(starts, lens, da, ebwt, n_r, n_g,
                          config.replace(wide_sim=True))


def _rescue_sparse(bad_start, bad_len, da, ebwt, num_reads: int,
                   num_genomes: int, config: LimeConfig):
    """Exact host scores for rescued clusters, as COO (rows, cols, vals).

    Rescued clusters touch few documents, so the exact scorer runs on a
    remapped compact collection (unique documents only) and the nonzeros
    map back to global (read, genome) coordinates — no (R, G) buffer.
    """
    cid, gpos = _expand_positions(np.asarray(bad_start, np.int64),
                                  np.asarray(bad_len, np.int64))
    docs = np.asarray(da[gpos]).astype(np.int64)
    uniq, inv = np.unique(docs, return_inverse=True)
    n_r = int((uniq < num_reads).sum())
    # documents keep their relative order, so remapped ids preserve the
    # read-block-then-genome-block convention the scorer relies on
    da_small = inv.astype(np.uint32)
    eb_small = None if ebwt is None else np.asarray(ebwt[gpos])
    offs = np.concatenate([[0], np.cumsum(np.asarray(bad_len, np.int64))])
    dense = _score_small_dense(offs[:-1], np.asarray(bad_len, np.int64),
                               da_small, eb_small, n_r, len(uniq) - n_r,
                               config)
    r_i, g_i = np.nonzero(dense)
    rows = uniq[r_i].astype(np.int32)
    cols = (uniq[n_r + g_i] - num_reads).astype(np.int32)
    vals = dense[r_i, g_i].astype(np.int64)
    if config.sim_modulus:
        vals = vals % config.sim_modulus
    return rows, cols, vals.astype(np.int32)


# COO stays cheaper than a dense (R, G) upload while the rescued clusters
# cover few positions; past this, the native scorer fills a full matrix.
_COO_POSITION_CAP = 1 << 20


def _rescue(bad_start, bad_len, da, ebwt, num_reads: int, num_genomes: int,
            config: LimeConfig):
    """Host-side exact scoring of routed clusters.

    Returns ``("coo", rows, cols, vals)`` for small rescue sets or
    ``("dense", matrix)`` (u8 with wrap / u32 wide — the reference's own
    SimArray footprint, src/ClusterBWT_DA.cpp:606-611) when density routing
    sends a large share of clusters to the host scorer.
    """
    total = int(np.asarray(bad_len, np.int64).sum())
    if (total <= _COO_POSITION_CAP and total < num_reads * num_genomes // 16
            ) or not native.available():
        return ("coo", *_rescue_sparse(bad_start, bad_len, da, ebwt,
                                       num_reads, num_genomes, config))
    from ..constants import IUPAC_WATERFALL_PAIRS

    mat = native.score_clusters_native(
        np.asarray(bad_start, np.int64), np.asarray(bad_len, np.int64),
        np.asarray(da), None if ebwt is None else np.asarray(ebwt),
        num_reads, num_genomes, SYMBOL_RANK_LUT, _DEGENERATE_BYTE,
        IUPAC_WATERFALL_PAIRS, wide=config.wide_sim, threads=0)
    return ("dense", mat)


@functools.partial(jax.jit, static_argnames=(), donate_argnums=(0,))
def _add_host_matrix(sim, host):
    """sim[:R, :G] += host on device (int add wraps like uchar counters)."""
    return sim.at[:host.shape[0], :host.shape[1]].add(
        host.astype(sim.dtype))


def run_fused(collections: Sequence[str], num_reads: int, num_genomes: int,
              lineage: Lineage, read_len: int, config: LimeConfig,
              ) -> ClassifyResult:
    """Async-pipelined classification over 2 or 4 collection indexes."""
    timer = PhaseTimer("fused_pipeline")
    F = len(collections)
    if F not in (2, 4):
        raise ValueError("fused pipeline takes 2 or 4 collections")

    use_u16 = (num_reads + num_genomes) < 0xFFFF
    r_pad = _r_pad_for(num_reads)
    block = _classify_block_for(num_reads)
    wide = bool(config.wide_sim)
    g_dense = _dense_threshold_for(num_genomes, config)
    sims_dev = []
    corr = []  # (file, rows, cols, vals) per rescued collection

    def plan(fasta):
        """Host planning for one collection (runs in a worker thread).

        The device stream is *compacted*: only positions of clusters that
        contain both a read and a genome symbol (the reference's membership
        filter, src/ClusterLCP.cpp:220) and that the banded kernel can score
        exactly survive.  Dropping a whole cluster removes its pairs in one
        stroke, and empty/one-sided clusters score zero by construction —
        so compaction shrinks uplink bytes, kernel positions and scatter
        rows alike (to ~40% of the raw stream on typical workloads) without
        changing a single emitted pair.  Cluster boundaries in the compact
        stream are encoded in the run-mask bit itself (a cluster's first
        row carries m=0), so adjacent clusters never band-match each other.
        """
        lcp = open_lcp(fasta)
        da = open_da(fasta)
        ebwt = open_ebwt(fasta) if config.use_ebwt else None
        timer.add_bytes("score", len(lcp) * (9 if config.use_ebwt else 8))

        if native.available():
            packed, doc, _nc, window, bad_start, bad_len = native.plan_native(
                lcp, da, ebwt, num_reads, config.alpha, SYMBOL_RANK_LUT,
                _DEGENERATE_BYTE, use_u16, pad_block=_BLOCK,
                pad_doc=num_reads + num_genomes, g_dense=g_dense)
        else:
            # the numpy fallback has no fast host scorer, so only clusters
            # the banded kernel cannot express route to the host
            packed, doc, window, bad_start, bad_len = _plan_python(
                lcp, da, ebwt, num_reads, num_genomes, config, use_u16)
        rescue = None
        if len(bad_start):
            rescue = lambda: _rescue(  # noqa: E731
                bad_start, bad_len, da, ebwt, num_reads, num_genomes, config)
        return packed, doc, window, rescue

    def plan_and_dispatch(fasta):
        """Plan + upload + async device dispatch, all in the worker thread —
        each collection's upload and kernel overlap the others' planning,
        and its own host rescue scoring overlaps its device compute."""
        packed, doc, window, rescue = plan(fasta)
        sim_dev = _score_program(jax.device_put(packed), jax.device_put(doc),
                                 jnp.int32(window), num_reads, num_genomes,
                                 r_pad, wide)
        return sim_dev, rescue() if rescue is not None else None

    with timer.phase("score"):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(F, 4)) as pool:
            futures = [pool.submit(plan_and_dispatch, c)
                       for c in collections]
            for fi, fut in enumerate(futures):
                sim_dev, res = fut.result()
                if res is None:
                    pass
                elif res[0] == "dense":
                    sim_dev = _add_host_matrix(sim_dev, jnp.asarray(res[1]))
                elif len(res[1]):
                    corr.append((fi, *res[1:]))
                sims_dev.append(sim_dev)

    with timer.phase("classify"):
        g_pad = _g_pad_for(num_genomes)
        tax = np.zeros(g_pad, np.uint32)
        tax[:num_genomes] = lineage.at_rank(config.tax_rank)
        rank_matrix = np.zeros((lineage.taxids.shape[0], g_pad), np.uint32)
        rank_matrix[:, :num_genomes] = lineage.taxids
        valid_t = np.arange(g_pad) < num_genomes
        norm = jnp.float32(np.uint32(read_len + 1 - config.alpha))

        if corr:
            cfile = np.concatenate(
                [np.full(len(r), fi, np.int32) for fi, r, _, _ in corr])
            crows = np.concatenate([r for _, r, _, _ in corr])
            ccols = np.concatenate([c for _, _, c, _ in corr])
            cvals = np.concatenate([v for _, _, _, v in corr])
            # bucket-pad to limit recompiles; padded entries carry an
            # out-of-range file index and scatter in 'drop' mode
            k = max(256, 1 << int(np.ceil(np.log2(len(cfile)))))
            pad = k - len(cfile)
            cfile = np.pad(cfile, (0, pad), constant_values=F)
            crows = np.pad(crows, (0, pad))
            ccols = np.pad(ccols, (0, pad))
            cvals = np.pad(cvals, (0, pad))
        else:
            cfile = np.empty(0, np.int32)
            crows = ccols = np.empty(0, np.int32)
            cvals = np.empty(0, np.int32)

        types, taxid, sim = _classify_program(
            jnp.stack(sims_dev), jnp.asarray(crows), jnp.asarray(ccols),
            jnp.asarray(cvals), jnp.asarray(cfile), jnp.asarray(tax),
            jnp.asarray(rank_matrix), jnp.asarray(valid_t),
            jnp.float32(config.error_tolerance), norm,
            jnp.float32(config.beta), F, config.tax_rank,
            config.assign_higher, not wide, block)
        result = ClassifyResult(np.asarray(types)[:num_reads],
                                np.asarray(taxid)[:num_reads],
                                np.asarray(sim)[:num_reads])
    timer.report()
    return result


def _plan_python(lcp, da, ebwt, num_reads: int, num_genomes: int,
                 config: LimeConfig, use_u16: bool):
    """Vectorized numpy fallback planner (native C++ pass unavailable)."""
    n = len(lcp)
    m = np.asarray(lcp) >= config.alpha
    m[0] = False
    window = 1
    bad_start = np.empty(0, np.int64)
    bad_len = np.empty(0, np.int64)
    d = np.diff(m.view(np.int8))
    run_starts = np.flatnonzero(d == 1) + 1
    run_ends = np.flatnonzero(d == -1) + 1
    if m[-1]:
        run_ends = np.append(run_ends, n)

    gpos = np.empty(0, np.int64)
    within0 = np.empty(0, bool)
    if len(run_starts):
        p_start = run_starts - 1  # cluster rows = run extended one left
        lens = run_ends - p_start
        # membership filter via a prefix-sum of the read-side indicator
        da_arr = np.asarray(da)
        cr = np.concatenate(
            [[0], np.cumsum(da_arr < num_reads, dtype=np.int64)])
        n_read_in = cr[p_start + lens] - cr[p_start]
        mixed = (n_read_in > 0) & (n_read_in < lens)
        p_start, lens = p_start[mixed], lens[mixed]
        if len(p_start):
            # clusters the banded kernel cannot express: longer than the
            # 255 saturation bound, or containing IUPAC-degenerate
            # symbols (the stateful leftover waterfall) — routed to the
            # exact host rescue path
            bad_c = lens > 255
            if config.use_ebwt:
                deg_pos = np.flatnonzero(
                    _DEGENERATE_BYTE[np.asarray(ebwt)])
                if len(deg_pos):
                    cidx = np.searchsorted(p_start, deg_pos,
                                           side="right") - 1
                    inside = ((cidx >= 0)
                              & (deg_pos < p_start[cidx] + lens[cidx]))
                    bad_c[np.unique(cidx[inside])] = True
            bad_idx = np.flatnonzero(bad_c)
            if len(bad_idx):
                bad_start = p_start[bad_idx]
                bad_len = lens[bad_idx]
            keep = ~bad_c
            p_start, lens = p_start[keep], lens[keep]
        if len(p_start):
            window = int(lens.max())
            total = int(lens.sum())
            offs = np.concatenate([[0], np.cumsum(lens[:-1])])
            within = (np.arange(total, dtype=np.int64)
                      - np.repeat(offs, lens))
            gpos = np.repeat(p_start, lens) + within
            within0 = within == 0

    nc = len(gpos)
    n_pad = max(_BLOCK, -(-nc // _BLOCK) * _BLOCK)
    sym_c = (SYMBOL_RANK_LUT[np.asarray(ebwt[gpos])] if config.use_ebwt
             else np.zeros(nc, np.uint8))
    mbit = np.logical_not(within0).astype(np.uint8) << _M_BIT
    packed = np.pad(sym_c | mbit, (0, n_pad - nc))
    # pad doc with an out-of-range id: never a read, never a genome
    doc = np.pad(np.asarray(da[gpos]).astype(
        np.uint16 if use_u16 else np.int32), (0, n_pad - nc),
        constant_values=num_reads + num_genomes)
    return packed, doc, window, bad_start, bad_len
