"""TPU executor for cluster detection and scoring (jax/XLA).

Design notes (TPU-first re-derivation, not a translation):

**Cluster detection** is a segmented scan: ``m[i] = lcp[i] >= alpha``; block
boundaries carry one bit of "previous m" state — the whole straddle protocol
of the reference (src/ClusterLCP.cpp:196-264) collapses into that carry.
Blocks of the (lcp, da) stream are compared on device; boundary compaction
runs on host over the tiny boundary masks.

**Scoring** avoids the reference's per-cluster fseek + std::sort + histogram
loops (src/ClusterBWT_DA.cpp:299-347) entirely, via an occurrence-matching
identity: with per-position occurrence index

    occ[i] = #{ j < i in the same cluster : doc[j]=doc[i], sym[j]=sym[i] }

the symbol-aware score of a (read r, genome g) pair in a cluster is exactly

    t(r,g) = #{ (i,j) : doc[i]=r, doc[j]=g, sym[i]=sym[j], occ[i]=occ[j],
                occ[j] < 255 }

because matching the k-th occurrence of (r,s) with the k-th occurrence of
(g,s) enumerates min(count_r(s), min(count_g(s), 255)) pairs per symbol —
the same sum the reference computes from histograms (the occ[j] < 255 bound
reproduces the genome-counter saturation, src/ClusterBWT_DA.cpp:96).  This
is pure integer, branch-free, and needs only O(L^2) elementwise work per
cluster — so clusters are bucketed by length, padded to (B, L) tiles, and
scored as batched (B, L, L) tensor ops feeding one scatter-add, with no
sort anywhere.

Two cluster classes take the exact host path instead (both rare):

- clusters containing IUPAC-degenerate symbols (ranks 4..14), where the
  reference's stateful leftover waterfall applies (ClusterBWT_DA.cpp:146-177);
- clusters longer than ``_MAX_TILE_LEN``.

Known (documented) divergence: the reference's *read* counters are
unsaturated uchar and would wrap at a count of exactly 256 occurrences of
one (read, symbol) in one cluster; that requires alpha <= 1 and a 255bp
single-letter read, impossible in valid configurations.  The host executor
reproduces the wrap; this path treats counts as exact.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import LimeConfig
from ..constants import SYMBOL_RANK_LUT

_MAX_TILE_LEN = 512  # clusters longer than this go to the host path
_BUCKETS = (8, 16, 32, 64, 128, 256, 512)
_TILE_BATCH = {8: 4096, 16: 2048, 32: 1024, 64: 512, 128: 128, 256: 32, 512: 8}


# ---------------------------------------------------------------------------
# Step 1 — cluster detection
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("alpha",))
def _boundary_block(lcp_blk: jnp.ndarray, da_blk: jnp.ndarray, prev_m,
                    alpha: int, num_reads: int):
    m = lcp_blk >= alpha
    prev = jnp.concatenate([prev_m[None], m[:-1]])
    starts = m & jnp.logical_not(prev)
    ends = jnp.logical_not(m) & prev
    is_read = da_blk < num_reads
    return starts, ends, is_read, m[-1]


def find_clusters_tpu(lcp: np.ndarray, da: np.ndarray, num_reads: int,
                      alpha: int, block: int = 1 << 24
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Device-assisted alpha-cluster detection over the (lcp, da) stream."""
    n = len(lcp)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    starts_l: List[np.ndarray] = []
    ends_l: List[np.ndarray] = []
    read_counts = np.zeros(0, np.int64)
    csum_parts: List[np.ndarray] = []
    # prev_m=True for the first block reproduces the reference's
    # skip-leading rule (a run touching position 0 emits no start).
    prev = jnp.asarray(True)
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        s, e, r, prev = _boundary_block(
            jnp.asarray(np.ascontiguousarray(lcp[lo:hi])),
            jnp.asarray(np.ascontiguousarray(da[lo:hi])),
            prev, alpha, num_reads)
        s, e, r = np.asarray(s), np.asarray(e), np.asarray(r)
        starts_l.append(np.flatnonzero(s) + lo)
        ends_l.append(np.flatnonzero(e) + lo)
        csum_parts.append(np.cumsum(r, dtype=np.int64))
    # Global read-indicator cumsum (prefix over blocks).
    base = 0
    for part in csum_parts:
        part += base
        base = part[-1]
    csum = np.concatenate([[0], np.concatenate(csum_parts)])

    run_starts = np.concatenate(starts_l) if starts_l else np.empty(0, np.int64)
    run_ends = np.concatenate(ends_l) if ends_l else np.empty(0, np.int64)
    # Drop an unmatched leading end (run touching position 0) and close a
    # trailing open run at n.
    if len(run_ends) and (len(run_starts) == 0 or run_ends[0] <= run_starts[0]):
        run_ends = run_ends[1:]
    if len(run_starts) > len(run_ends):
        run_ends = np.append(run_ends, n)

    p_start = run_starts - 1
    lens = run_ends - p_start
    n_reads_in = csum[run_ends] - csum[p_start]
    keep = (n_reads_in > 0) & (n_reads_in < lens)
    return p_start[keep], lens[keep]


# ---------------------------------------------------------------------------
# Step 2 — bucketed occurrence-matching scoring
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("tile_len", "num_reads", "use_ebwt"),
    donate_argnums=(0,),
)
def _score_tile(sim: jnp.ndarray, da_arr: jnp.ndarray, sym_arr: jnp.ndarray,
                starts: jnp.ndarray, lens: jnp.ndarray, tile_len: int,
                num_reads: int, use_ebwt: bool):
    """Score a (B,) batch of clusters padded to ``tile_len``.

    Returns (updated sim accumulator, per-cluster degenerate flags).
    Degenerate clusters contribute nothing here; the host rescores them.
    """
    L = tile_len
    lane = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = lane < lens[:, None]
    pos = starts[:, None] + lane
    pos = jnp.where(valid, pos, 0)
    doc = da_arr[pos].astype(jnp.int32)
    if use_ebwt:
        sym = sym_arr[pos].astype(jnp.int32)
        deg = jnp.any((sym >= 4) & (sym <= 14) & valid, axis=1)
    else:
        sym = jnp.zeros_like(doc)
        deg = jnp.zeros(doc.shape[0], dtype=bool)

    same = ((doc[:, :, None] == doc[:, None, :])
            & (sym[:, :, None] == sym[:, None, :])
            & valid[:, :, None] & valid[:, None, :])
    tri = jnp.tril(jnp.ones((L, L), dtype=bool), -1)
    occ = jnp.sum(same & tri[None], axis=2, dtype=jnp.int32)  # (B, L)

    is_read = (doc < num_reads) & valid
    is_gen = jnp.logical_not(doc < num_reads) & valid
    match = (is_read[:, :, None] & is_gen[:, None, :]
             & (sym[:, :, None] == sym[:, None, :])
             & (occ[:, :, None] == occ[:, None, :])
             & (occ[:, None, :] < 255)
             & jnp.logical_not(deg[:, None, None]))

    r_idx = jnp.where(match, doc[:, :, None], 0)
    g_idx = jnp.where(match, doc[:, None, :] - num_reads, 0)
    sim = sim.at[r_idx.reshape(-1), g_idx.reshape(-1)].add(
        match.reshape(-1).astype(jnp.int32), mode="drop")
    return sim, deg


def score_clusters_tpu(p_start: np.ndarray, lens: np.ndarray, da: np.ndarray,
                       ebwt: np.ndarray | None, num_reads: int, num_refs: int,
                       config: LimeConfig) -> np.ndarray:
    """Dense similarity matrix via the bucketed TPU kernel.

    Returns the matrix in ``config.sim_dtype`` with the reference's counter
    semantics (u8 wraps mod 256).
    """
    from .scoring import score_clusters  # host exact path for rare clusters

    p_start = np.asarray(p_start, np.int64)
    lens = np.asarray(lens, np.int64)
    sim_dev = jnp.zeros((num_reads, num_refs), dtype=jnp.int32)
    if config.use_ebwt:
        if ebwt is None:
            raise ValueError("use_ebwt=True requires the .ebwt array")
        sym_host = SYMBOL_RANK_LUT[np.asarray(ebwt)]
    else:
        sym_host = np.zeros(1, np.uint8)
    da_dev = jnp.asarray(np.asarray(da))
    sym_dev = jnp.asarray(sym_host)

    host_idx: List[np.ndarray] = [np.flatnonzero(lens > _MAX_TILE_LEN)]

    order = np.argsort(lens, kind="stable")
    sizes = lens[order]
    for bi, L in enumerate(_BUCKETS):
        lo_len = 0 if bi == 0 else _BUCKETS[bi - 1]
        sel = order[(sizes > lo_len) & (sizes <= L)]
        if len(sel) == 0:
            continue
        batch = _TILE_BATCH[L]
        for b0 in range(0, len(sel), batch):
            chunk = sel[b0:b0 + batch]
            cs = np.zeros(batch, np.int64)
            cl = np.zeros(batch, np.int64)
            cs[:len(chunk)] = p_start[chunk]
            cl[:len(chunk)] = lens[chunk]
            sim_dev, deg = _score_tile(
                sim_dev, da_dev, sym_dev,
                jnp.asarray(cs, jnp.int32), jnp.asarray(cl, jnp.int32),
                L, num_reads, config.use_ebwt)
            deg_np = np.asarray(deg)[:len(chunk)]
            if deg_np.any():
                host_idx.append(chunk[deg_np])

    sim = np.asarray(jax.device_get(sim_dev)).astype(np.int64)

    redo = np.concatenate(host_idx)
    if len(redo):
        redo.sort()
        sim_host = score_clusters(
            p_start[redo], lens[redo], np.asarray(da),
            None if ebwt is None else np.asarray(ebwt),
            num_reads, num_refs,
            config.replace(wide_sim=True))  # wide: exact int accumulation
        sim += sim_host.astype(np.int64)

    if config.sim_modulus:
        return (sim % config.sim_modulus).astype(config.sim_dtype)
    return sim.astype(config.sim_dtype)
