"""Score-result files: ``.res.bin`` / ``.res.pos`` (and ``.res.txt``).

Binary layout (reference src/ClusterBWT_DA.cpp:361-450, BIN=1):

- ``.res.bin`` is a stream of 8-byte ``pair_sim`` records ``(f32 sim,
  u32 id_ref)``.  Record 0 is a ``(0.0, 0)`` sentinel.  Each read whose
  normalized max similarity exceeds beta contributes a header record
  ``(norm_max_sim, list_size)`` followed by ``list_size`` records
  ``(norm_sim, id_ref)``, one per genome with nonzero similarity, in
  ascending genome order.
- ``.res.pos`` has one u64 per read: the record index of that read's header
  in ``.res.bin``, or 0 if the read fell below beta.

Text layout (BIN=0, src/ClusterBWT_DA.cpp:414-424): one line per read,
``maxSim\\tidRef\\tsim...`` with ``%.5f`` formatting; empty line for reads
below beta.
"""

from __future__ import annotations

from typing import List, Tuple

import os

import numpy as np

from ..constants import DT_PAIR_SIM, DT_RES_POS


def write_results_bin(res_prefix: str, norm_rows: np.ndarray,
                      beta: float) -> Tuple[int, int]:
    """Write ``<res_prefix>.bin`` / ``<res_prefix>.pos``.

    ``norm_rows`` is the dense (num_reads, num_refs) float32 matrix of
    normalized similarities.  Returns (total_records, qualifying_reads).
    """
    num_reads, _ = norm_rows.shape
    beta = np.float32(beta)

    max_sim = norm_rows.max(axis=1) if norm_rows.shape[1] else np.zeros(num_reads, np.float32)
    qualifies = max_sim > beta
    nonzero = norm_rows > 0
    list_sizes = nonzero.sum(axis=1, dtype=np.int64)

    # Record budget: sentinel + per qualifying read (1 header + list_size).
    n_qual = int(qualifies.sum())
    total = 1 + n_qual + int(list_sizes[qualifies].sum())

    recs = np.zeros(total, dtype=DT_PAIR_SIM)
    pos = np.zeros(num_reads, dtype=DT_RES_POS)

    # Header offsets: cumulative record counts over qualifying reads.
    rec_per_read = np.where(qualifies, 1 + list_sizes, 0)
    header_at = 1 + np.concatenate([[0], np.cumsum(rec_per_read[:-1])])
    pos[qualifies] = header_at[qualifies]

    q_idx = np.flatnonzero(qualifies)
    if len(q_idx):
        recs["sim"][header_at[q_idx]] = max_sim[q_idx]
        recs["id_ref"][header_at[q_idx]] = list_sizes[q_idx]
        # Entry records: flatten the nonzero structure of qualifying rows.
        rows, cols = np.nonzero(nonzero[q_idx])
        # destination index = header_at[row] + 1 + rank-within-row
        within = np.arange(len(rows)) - np.concatenate(
            [[0], np.cumsum(list_sizes[q_idx])])[rows]
        dest = header_at[q_idx][rows] + 1 + within
        recs["sim"][dest] = norm_rows[q_idx[rows], cols]
        recs["id_ref"][dest] = cols

    recs.tofile(res_prefix + ".bin")
    pos.tofile(res_prefix + ".pos")
    return total, n_qual


def write_results_txt(res_prefix: str, norm_rows: np.ndarray, beta: float) -> None:
    """BIN=0 text format (reference src/ClusterBWT_DA.cpp:414-441)."""
    beta = np.float32(beta)
    with open(res_prefix + ".txt", "w") as f:
        for row in norm_rows:
            mx = np.float32(row.max()) if row.size else np.float32(0)
            if mx > beta:
                parts = [f"{mx:.5f}"]
                for j in np.flatnonzero(row > 0):
                    parts.append(f"\t{j}\t{np.float32(row[j]):.5f}")
                f.write("".join(parts))
            f.write("\n")


def read_results_bin(res_prefix: str, num_reads: int, mmap: bool = False):
    """Load a .res.bin/.pos pair into (pos array, record array).

    ``mmap=True`` maps the record stream instead of reading it whole —
    the setB2-scale path (multi-GB .res.bin): the blockwise classify then
    faults in only each read block's record range (record offsets are
    monotone in read id — the encoder writes rows in order, reference
    src/ClusterBWT_DA.cpp:361-450).
    """
    if mmap and os.path.getsize(res_prefix + ".bin"):
        recs = np.memmap(res_prefix + ".bin", dtype=DT_PAIR_SIM, mode="r")
    else:
        recs = np.fromfile(res_prefix + ".bin", dtype=DT_PAIR_SIM)
    pos = np.fromfile(res_prefix + ".pos", dtype=DT_RES_POS)
    if len(pos) != num_reads:
        raise ValueError(
            f"{res_prefix}.pos has {len(pos)} entries, expected {num_reads}")
    return pos, recs


def read_results_txt(res_prefix: str) -> List[List[Tuple[float, int]]]:
    """Parse a .res.txt into per-read [(max, size)] + [(sim, id)] lists."""
    out: List[List[Tuple[float, int]]] = []
    with open(res_prefix + ".txt") as f:
        for line in f:
            toks = line.split()
            if not toks:
                out.append([])
                continue
            entries = [(np.float32(toks[0]), (len(toks) - 1) // 2)]
            for k in range(1, len(toks), 2):
                entries.append((np.float32(toks[k + 1]), int(toks[k])))
            out.append(entries)
    return out


def dense_from_bin(pos: np.ndarray, recs: np.ndarray, num_reads: int,
                   num_refs: int, read_lo: int = 0,
                   read_hi: int | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Reconstruct dense (block, num_refs) float32 scores + per-read max.

    Vectorized decode of the record stream for reads [read_lo, read_hi).
    Returns (dense block, header max per read); absent reads yield zeros.
    """
    if read_hi is None:
        read_hi = num_reads
    n = read_hi - read_lo
    dense = np.zeros((n, num_refs), dtype=np.float32)
    max_sim = np.zeros(n, dtype=np.float32)
    p = pos[read_lo:read_hi].astype(np.int64)
    present = np.flatnonzero(p)
    if len(present) == 0:
        return dense, max_sim
    hdr = p[present]
    max_sim[present] = recs["sim"][hdr]
    sizes = recs["id_ref"][hdr].astype(np.int64)
    # Gather all list entries at once.
    total = int(sizes.sum())
    if total:
        row_rep = np.repeat(present, sizes)
        starts = hdr + 1
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(sizes[:-1])]), sizes)
        src = np.repeat(starts, sizes) + offs
        dense[row_rep, recs["id_ref"][src]] = recs["sim"][src]
    return dense, max_sim
