"""Beyond-RAM index construction: blockwise build + external merge.

The reference builds collection indexes beyond RAM with external-memory
tools under a fixed budget (eGap ``--em -m 4096``, reference
Preprocessing.sh:159-196); lime-tpu's in-process builders are RAM-bound
(~40 B/position for the native SA-IS).  This module closes that gap
self-containedly:

1. documents are partitioned CONTIGUOUSLY into blocks whose in-RAM
   SA-IS build fits the memory budget (native.lime_build_index_block:
   ebwt/da/local-SA per block, no per-block LCP);
2. the block eBWTs merge on disk by Holt/McMillan-style interleave
   refinement (native.lime_merge_blocks): one stable LF bucket pass per
   prefix depth, terminator rows pinned to the fixed first region in
   block order.  Cross-block suffix ties resolve by block order —
   exactly the in-RAM builder's ascending terminator ranks — so the
   merged ebwt/da/sa are bit-identical to a whole-collection build.
   Pass count is bounded by the longest CROSS-BLOCK common prefix + 2,
   so the block cut should keep long near-identical documents (genome
   sets) within one block; read-only cross sections converge in
   ~read_len passes;
3. the merged LCP is one file-backed Kasai pass over (text, SA)
   (native.lime_kasai_files), with the builder's terminator semantics
   (extension never crosses a terminator).

Peak RAM: max(block SA-IS ~40 B/position * block_positions,
merge 2 B/row, Kasai 13 B/position) — all under ``mem_budget``.
"""

from __future__ import annotations

import os
import tempfile
from typing import List, Sequence

import numpy as np

from .. import native

# SA-IS temporaries per position (i64 string + SA + recursion slack)
_SAIS_BYTES_PER_POS = 40
# Kasai pass: text u8 + sa u32 + rank u32 + lcp u32
_KASAI_BYTES_PER_POS = 13


def plan_blocks(seq_lens: Sequence[int], mem_budget: int) -> List[int]:
    """Contiguous document partition: block end indexes (exclusive).

    Each block's terminator-augmented position count fits the SA-IS
    budget.  Runs of LONG documents (genome sets) are indivisible — a
    cut between near-identical genomes would blow the merge pass count
    up to their common-prefix length — so a long-document run beyond
    the budget is rejected with a clear message (the reference's eGap
    has the same single-phase memory floor).
    """
    cap_pos = max(1, (mem_budget // 2) // _SAIS_BYTES_PER_POS)
    # Long documents (genome sets) must stay within ONE block: the merge
    # pass count is bounded by the longest CROSS-BLOCK common prefix, so
    # a cut between two near-identical genomes would explode it.  Short
    # documents (reads) tie-break at their terminators within ~read_len
    # passes, so cuts between them are safe.
    long_thresh = 65536
    blocks: List[int] = []
    acc = 0
    i = 0
    n = len(seq_lens)
    while i < n:
        # group a maximal run of long documents as one indivisible unit
        j = i + 1
        if seq_lens[i] + 1 > long_thresh:
            while j < n and seq_lens[j] + 1 > long_thresh:
                j += 1
        unit = sum(int(seq_lens[k]) + 1 for k in range(i, j))
        if unit > cap_pos:
            raise MemoryError(
                f"documents [{i}, {j}) need {unit * _SAIS_BYTES_PER_POS / 1e9:.1f}"
                " GB to index as one block (long documents cannot be "
                "split across blocks without exploding the merge pass "
                "count); raise mem_budget")
        if acc and acc + unit > cap_pos:
            blocks.append(i)
            acc = 0
        acc += unit
        i = j
    blocks.append(n)
    if len(blocks) > 250:
        raise MemoryError(
            f"mem_budget would need {len(blocks)} blocks; the merge "
            "supports at most 250 — raise mem_budget to at least "
            f"{sum(int(l) + 1 for l in seq_lens) // 250 * 2 * _SAIS_BYTES_PER_POS} bytes")
    return blocks


def build_index_files_external(fasta_path: str, seqs: Sequence[bytes],
                               mem_budget: int = 4 << 30,
                               workdir: str | None = None,
                               max_passes: int = 4096,
                               max_lcp: int | None = None) -> int:
    """Write ``<fasta>.ebwt/.lcp/.da`` under a fixed memory budget.

    Bit-identical to :func:`lime_tpu.index.builder.build_index_files`
    (verified by tests/test_external_build.py); returns the number of
    merge passes (1 when the whole collection fit one block).
    """
    if not native.available():
        raise RuntimeError("external build requires the native runtime")
    lib = native._load()
    lens = [len(s) for s in seqs]
    ends = plan_blocks(lens, mem_budget)
    own_tmp = workdir is None
    if own_tmp:
        tmp = tempfile.TemporaryDirectory(
            dir=os.path.dirname(os.path.abspath(fasta_path)))
        workdir = tmp.name
    prefix = os.path.join(workdir, "xb")

    # the Kasai text: documents with one 0 byte per terminator slot
    total = sum(lens) + len(lens)
    text_path = prefix + ".text"
    with open(text_path, "wb") as f:
        for s in seqs:
            f.write(s)
            f.write(b"\0")

    block_rows, doc_base, text_base, nseqs = [], [], [], []
    start = 0
    tbase = 0
    for bi, end in enumerate(ends):
        blk = seqs[start:end]
        blens = np.asarray([len(s) for s in blk], np.int64)
        rows = int((blens + 1).sum())
        concat = np.frombuffer(b"".join(blk), np.uint8)
        ebwt = np.empty(rows, np.uint8)
        da = np.empty(rows, np.uint32)
        sa = np.empty(rows, np.uint32)
        rc = lib.lime_build_index_block(
            concat.ctypes.data, blens.ctypes.data, len(blk),
            ebwt.ctypes.data, da.ctypes.data, sa.ctypes.data)
        if rc != 0:
            raise RuntimeError(f"lime_build_index_block failed: {rc}")
        ebwt.tofile(f"{prefix}.blk{bi}.ebwt")
        da.tofile(f"{prefix}.blk{bi}.da")
        sa.tofile(f"{prefix}.blk{bi}.sa")
        block_rows.append(rows)
        doc_base.append(start)
        text_base.append(tbase)
        nseqs.append(len(blk))
        tbase += rows
        start = end
    assert tbase == total

    br = np.asarray(block_rows, np.int64)
    db = np.asarray(doc_base, np.int64)
    tb = np.asarray(text_base, np.int64)
    ns = np.asarray(nseqs, np.int64)
    passes = lib.lime_merge_blocks(
        prefix.encode(), len(ends), br.ctypes.data, db.ctypes.data,
        tb.ctypes.data, ns.ctypes.data, prefix.encode(), max_passes)
    if passes == -8:
        raise RuntimeError(
            "lime_merge_blocks did not converge within max_passes — two "
            "blocks share a common prefix longer than the pass budget "
            "(near-identical long documents split across blocks?); "
            "raise mem_budget so related documents share a block")
    if passes < 0:
        raise RuntimeError(f"lime_merge_blocks failed: {passes}")
    rc = lib.lime_kasai_files(text_path.encode(),
                              (prefix + ".sa").encode(),
                              (prefix + ".lcp").encode(), total)
    if rc != 0:
        raise RuntimeError(f"lime_kasai_files failed: {rc}")

    if max_lcp is not None:
        # the reference's --trlcp: stored LCPs cap at max_lcp (safe for
        # any alpha <= max_lcp, reference Preprocessing.sh:24-28)
        with open(prefix + ".lcp", "r+b") as f:
            while True:
                pos = f.tell()
                chunk = np.frombuffer(f.read(1 << 22), np.uint32)
                if not len(chunk):
                    break
                f.seek(pos)
                np.minimum(chunk, np.uint32(max_lcp)).tofile(f)

    os.replace(prefix + ".ebwt", fasta_path + ".ebwt")
    os.replace(prefix + ".da", fasta_path + ".da")
    os.replace(prefix + ".lcp", fasta_path + ".lcp")
    if own_tmp:
        tmp.cleanup()
    return int(passes)
