"""Single-dispatch-class fused pipeline: collections -> per-read assignments.

The staged path (pipeline.py) mirrors the reference's file-per-stage
architecture.  This module is the serving path: banded scan+score runs as
one device program per collection, dispatched asynchronously so the host
planning of collection i+1 and the upload of its packed stream overlap the
device compute of collection i; a final program fuses counter wrap,
normalization, beta gating and the 4-stage classify cascade.  A run costs
3 bytes/position of upload and a per-read-sized download.

Host-side planning per collection (cheap, vectorized numpy):

- boundary scan -> cluster list (the step-1 artifact, reused for routing);
- clusters the banded kernel cannot express (IUPAC-degenerate or longer
  than 255) are cleared from the run mask and rescored exactly on host;
  their scores enter the device program as an additive correction, which
  commutes with the mod-256 counter wrap;
- the run mask and symbol ranks pack into one byte per position
  (bit 6 = in-run, bits 0..3 = symbol rank); document ids ship as u16
  when the collection has < 65535 documents.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..config import LimeConfig
from ..constants import SYMBOL_RANK_LUT
from ..formats.arrays import open_da, open_ebwt, open_lcp
from ..formats.lineage import Lineage
from ..ops.classify_ops import ClassifyResult
from ..ops.classify_tpu import cascade_core
from ..ops.fused_pass import _DEGENERATE_BYTE
from .. import native
from ..ops.scoring import score_clusters
from ..utils.timing import PhaseTimer

_BLOCK = 1 << 20
_M_BIT = 6


@functools.partial(jax.jit, static_argnames=("num_reads", "num_refs"))
def _score_program(packed, doc, window, num_reads: int, num_refs: int):
    from ..parallel.sharded import banded_partial_sim

    m = ((packed >> _M_BIT) & 1).astype(bool)
    sym = (packed & 15).astype(jnp.int8)
    return banded_partial_sim(m, doc.astype(jnp.int32), sym,
                              num_reads, num_refs, window)


@functools.partial(
    jax.jit,
    static_argnames=("num_files", "tax_rank", "assign_higher", "sim_modulus",
                     "has_corr"))
def _classify_program(sims, corr, tax, rank_matrix, valid_t, error, norm,
                      beta, num_files: int, tax_rank: int,
                      assign_higher: bool, sim_modulus: int | None,
                      has_corr: bool):
    sims = jnp.stack(sims)  # (F, R, G) i32
    if has_corr:
        sims = sims + corr
    if sim_modulus:
        sims = sims % sim_modulus
    norm_rows = sims.astype(jnp.float32) / norm
    rowmax = jnp.max(norm_rows, axis=2)  # (F, R)
    qualify = rowmax > beta
    dense = jnp.transpose(
        jnp.where(qualify[:, :, None], norm_rows, 0.0), (1, 0, 2))
    maxs = jnp.where(qualify, rowmax, 0.0).T
    return cascade_core(dense, maxs, tax, rank_matrix, valid_t, error,
                        num_files, tax_rank, assign_higher)


def run_fused(collections: Sequence[str], num_reads: int, num_genomes: int,
              lineage: Lineage, read_len: int, config: LimeConfig,
              ) -> ClassifyResult:
    """Async-pipelined classification over 2 or 4 collection indexes."""
    timer = PhaseTimer("fused_pipeline")
    F = len(collections)
    if F not in (2, 4):
        raise ValueError("fused pipeline takes 2 or 4 collections")

    use_u16 = (num_reads + num_genomes) < 0xFFFF
    corr = np.zeros((F, num_reads, num_genomes), dtype=np.int32)
    has_corr = False
    sims_dev = []

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
        n = len(lcp)

        if native.available():
            packed, doc, _nc, window, bad_start, bad_len = native.plan_native(
                lcp, da, ebwt, num_reads, config.alpha, SYMBOL_RANK_LUT,
                _DEGENERATE_BYTE, use_u16, pad_block=_BLOCK,
                pad_doc=num_reads + num_genomes)
            rescue = None
            if len(bad_start):
                rescue = lambda: score_clusters(  # noqa: E731
                    bad_start, bad_len, da, ebwt, num_reads, num_genomes,
                    config.replace(wide_sim=True)).astype(np.int32)
            return packed, doc, window, rescue

        m = np.asarray(lcp) >= config.alpha
        m[0] = False
        window = 1
        corr_f = None
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
                # symbols (the stateful leftover waterfall) — rescored
                # exactly on host, merged additively into the device matrix
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
                    bs, bl = p_start[bad_idx], lens[bad_idx]
                    corr_f = lambda: score_clusters(  # noqa: E731
                        bs, bl, da, ebwt, num_reads, num_genomes,
                        config.replace(wide_sim=True)).astype(np.int32)
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
        return packed, doc, window, corr_f

    def plan_and_dispatch(fasta):
        """Plan + upload + async device dispatch, all in the worker thread —
        each collection's upload and kernel overlap the others' planning,
        and its own host rescue scoring overlaps its device compute."""
        packed, doc, window, rescue = plan(fasta)
        sim_dev = _score_program(jax.device_put(packed), jax.device_put(doc),
                                 jnp.int32(window), num_reads, num_genomes)
        return sim_dev, rescue() if rescue is not None else None

    with timer.phase("score"):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(F, 4)) as pool:
            futures = [pool.submit(plan_and_dispatch, c)
                       for c in collections]
            for fi, fut in enumerate(futures):
                sim_dev, corr_f = fut.result()
                if corr_f is not None:
                    has_corr = True
                    corr[fi] += corr_f
                sims_dev.append(sim_dev)

    with timer.phase("classify"):
        tax = lineage.at_rank(config.tax_rank).astype(np.uint32)
        rank_matrix = lineage.taxids.astype(np.uint32)
        norm = jnp.float32(np.uint32(read_len + 1 - config.alpha))
        if not has_corr:  # don't ship an all-zero (F, R, G) tensor
            corr = np.zeros((F, 1, 1), dtype=np.int32)
        types, taxid, sim = _classify_program(
            tuple(sims_dev), jnp.asarray(corr), jnp.asarray(tax),
            jnp.asarray(rank_matrix), jnp.asarray(np.ones(num_genomes, bool)),
            jnp.float32(config.error_tolerance), norm,
            jnp.float32(config.beta), F, config.tax_rank,
            config.assign_higher, config.sim_modulus, has_corr)
        result = ClassifyResult(np.asarray(types), np.asarray(taxid),
                                np.asarray(sim))
    timer.report()
    return result
