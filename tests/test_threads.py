"""`threads` in the staged host pipeline (reference OpenMP arguments).

The reference scales all three binaries with a `threads` CLI argument
(src/ClusterLCP.cpp:139-141, ClusterBWT_DA.cpp:630, Classify.cpp:474-477)
and guarantees per-read outputs independent of the thread count.  These
tests pin the same invariant on the staged host pipeline: every stage
artifact and the final CSV are byte-identical across thread counts.
"""

import hashlib
import os

import numpy as np
import pytest

from lime_tpu.config import LimeConfig
from lime_tpu.pipeline import run_paired
from tests.synth import make_dataset


@pytest.fixture(scope="module")
def small_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("threads_ds"))
    make_dataset(root, num_pairs=400, read_len=60,
                 genome_lens=(4000, 3500, 3000), seed=9)
    cols = [os.path.join(root, f"col_{t}.fasta")
            for t in ("1F", "1RC", "2F", "2RC")]
    return root, cols


def _run(root, cols, threads, tag):
    out = os.path.join(root, f"out_t{tag}.csv")
    run_paired(cols, out, 400, 3, os.path.join(root, "LineageFile.csv"),
               60, LimeConfig(executor="host", threads=threads))
    from lime_tpu.formats.arrays import aux_path_for

    arts = [open(out, "rb").read()]
    for c in cols:
        for p in (c + ".16.clrs", aux_path_for(c), c + ".res.bin",
                  c + ".res.pos"):
            arts.append(open(p, "rb").read())
    return hashlib.md5(b"".join(arts)).hexdigest()


def test_staged_host_outputs_thread_count_independent(small_ds):
    root, cols = small_ds
    h1 = _run(root, cols, 1, 1)
    h2 = _run(root, cols, 2, 2)
    h3 = _run(root, cols, 3, 3)
    assert h1 == h2 == h3


def test_classify_blocks_parallel_matches_serial(small_ds):
    """Force multiple classify blocks so the thread pool actually splits."""
    from lime_tpu.pipeline import classify

    root, cols = small_ds
    run_paired(cols, os.path.join(root, "seed.csv"), 400, 3,
               os.path.join(root, "LineageFile.csv"), 60,
               LimeConfig(executor="host", threads=1))
    res = [c + ".res" for c in cols]
    out1 = os.path.join(root, "cls1.csv")
    out2 = os.path.join(root, "cls2.csv")
    classify(res, 400, 3, out1, os.path.join(root, "LineageFile.csv"),
             LimeConfig(executor="host", threads=1), block_reads=64)
    classify(res, 400, 3, out2, os.path.join(root, "LineageFile.csv"),
             LimeConfig(executor="host", threads=3), block_reads=64)
    assert open(out1).read() == open(out2).read()
