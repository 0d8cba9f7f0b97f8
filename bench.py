"""Benchmark: TPU pipeline classification throughput vs reference C++.

Measures end-to-end reads/s of the three pipeline stages (cluster detection,
scoring, classification — index construction is shared preprocessing, as in
the reference where BCR/eGap run separately) on a synthetic paired-end
workload, against the reference binaries compiled -O2 with 1 thread on this
host (the reference publishes no numbers of its own — BASELINE.md).

Prints exactly one JSON line:
  {"metric": "classification_throughput", "value": <reads/s>,
   "unit": "reads/s", "vs_baseline": <speedup over reference C++>}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
DATA_DIR = os.path.join(ROOT, "build", "bench_data")

NUM_PAIRS = 50000
READ_LEN = 100
GENOME_LENS = (250_000, 220_000, 200_000, 180_000, 160_000, 140_000)
SEED = 123


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _dataset():
    """Build (or reuse) the benchmark dataset + indexes."""
    from tests.synth import make_dataset

    stamp = os.path.join(
        DATA_DIR, f"v2_{NUM_PAIRS}_{READ_LEN}_{len(GENOME_LENS)}_{SEED}.ok")
    meta_files_exist = os.path.exists(stamp)
    if not meta_files_exist:
        _log(f"bench: building dataset ({NUM_PAIRS} pairs, "
             f"{len(GENOME_LENS)} genomes)...")
        os.makedirs(DATA_DIR, exist_ok=True)
        t0 = time.time()
        make_dataset(DATA_DIR, num_pairs=NUM_PAIRS, read_len=READ_LEN,
                     genome_lens=GENOME_LENS, seed=SEED)
        with open(stamp, "w") as f:
            f.write("ok")
        _log(f"bench: dataset built in {time.time() - t0:.1f}s")
    from tests.synth import SynthDataset
    collections = [os.path.join(DATA_DIR, f"col_{t}.fasta")
                   for t in ("1F", "1RC", "2F", "2RC")]
    return SynthDataset(
        root=DATA_DIR, collections=collections,
        lineage_path=os.path.join(DATA_DIR, "LineageFile.csv"),
        num_reads=NUM_PAIRS, num_genomes=len(GENOME_LENS),
        read_len=READ_LEN, genomes=[], reads1=[], reads2=[])


def _run_ours(ds, config) -> float:
    from lime_tpu.pipeline import run_paired

    out = os.path.join(DATA_DIR, "bench_ours.csv")
    t0 = time.time()
    run_paired(ds.collections, out, ds.num_reads, ds.num_genomes,
               ds.lineage_path, ds.read_len, config)
    return time.time() - t0


def _run_reference(ds) -> float:
    from tests.oracle import OracleBinaries

    oracle = OracleBinaries.build()
    t0 = time.time()
    for c in ds.collections:
        oracle.cluster_lcp(c, ds.num_reads, ds.num_genomes, 16, threads=1)
    for c in ds.collections:
        oracle.cluster_bwt(c, ds.read_len, 0.25, threads=1)
    oracle.classify([c + ".res" for c in ds.collections], ds.num_reads,
                    ds.num_genomes, os.path.join(DATA_DIR, "bench_ref.csv"),
                    ds.lineage_path, 1, threads=1)
    return time.time() - t0


def main() -> None:
    import threading

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, "build", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from lime_tpu.config import LimeConfig

    # The first compile+transfer of a process pays a multi-minute device
    # bringup through the axon relay; trigger it in the background while the
    # dataset and reference baseline run on the host CPU.
    def _warm_device():
        import numpy as _np
        import jax.numpy as _jnp
        x = jax.device_put(_np.ones(8, _np.float32))
        _np.asarray(jax.jit(lambda a: a * 2.0)(x))
        _log("bench: device warm-up complete")

    warmer = threading.Thread(target=_warm_device, daemon=True)
    warmer.start()

    ds = _dataset()

    ref_t = _run_reference(ds)  # also warms the page cache
    warmer.join()

    backend = jax.default_backend()
    config = LimeConfig(executor="tpu", fused=True)
    ours_t = _run_ours(ds, config)  # warm run (compiles)

    # The host and the tunneled TPU are both noisy shared resources;
    # interleave best-of-3 measurements of each side.
    for i in range(3):
        ref_t = min(ref_t, _run_reference(ds))
        ours_t = min(ours_t, _run_ours(ds, config))
    _log(f"bench: reference C++ (1 thread): {ref_t:.2f}s "
         f"({ds.num_reads / ref_t:.0f} reads/s)")
    _log(f"bench: lime-tpu [{backend}]: {ours_t:.2f}s "
         f"({ds.num_reads / ours_t:.0f} reads/s)")

    # sanity: identical outputs
    with open(os.path.join(DATA_DIR, "bench_ours.csv")) as f:
        ours = f.read()
    with open(os.path.join(DATA_DIR, "bench_ref.csv")) as f:
        ref = f.read()
    if ours != ref:
        _log("bench: FATAL — output mismatch vs reference!")
        sys.exit(1)

    value = ds.num_reads / ours_t
    print(json.dumps({
        "metric": "classification_throughput",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round((ds.num_reads / ref_t) and value / (ds.num_reads / ref_t), 3),
    }))


if __name__ == "__main__":
    main()
