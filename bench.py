"""Benchmark: TPU pipeline classification throughput vs reference C++.

Two workloads, both synthetic (the reference publishes no numbers of its
own — BASELINE.md):

- ``example``: 50k read pairs x 6 genomes — the round-1 configuration, the
  regime where every cluster routes to the TPU banded kernel.
- ``paper``: 1M read pairs x 930 genomes (the genome count of the
  reference's simulated benchmark DB, reference Datasets/README.md:35;
  read count within 20x of setB2, README.md:137) with genus-conserved
  genome blocks.  At this genome width scoring density-routes to the
  native SIMD scorer and the TPU carries classification.

The baseline is the reference binaries compiled -O3 (matching the shipped
Makefile) with 1 thread on this host.  Any output mismatch vs the
reference is fatal.  The bench also runs the device-mode test subset on
the real chip and reports memory + achieved streaming bandwidth.

Prints exactly one JSON line; the headline metric is the paper-scale
throughput.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
DATA_DIR = os.path.join(ROOT, "build", "bench_data")
PAPER_DIR = os.path.join(ROOT, "build", "paper_data")

SEED = 123


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _example_dataset():
    """50k pairs x 6 genomes (round-1 configuration)."""
    from tests.synth import SynthDataset, make_dataset

    num_pairs, read_len = 50000, 100
    genome_lens = (250_000, 220_000, 200_000, 180_000, 160_000, 140_000)
    stamp = os.path.join(
        DATA_DIR, f"v2_{num_pairs}_{read_len}_{len(genome_lens)}_{SEED}.ok")
    if not os.path.exists(stamp):
        _log(f"bench[example]: building dataset ({num_pairs} pairs)...")
        os.makedirs(DATA_DIR, exist_ok=True)
        t0 = time.time()
        make_dataset(DATA_DIR, num_pairs=num_pairs, read_len=read_len,
                     genome_lens=genome_lens, seed=SEED)
        with open(stamp, "w") as f:
            f.write("ok")
        _log(f"bench[example]: dataset built in {time.time() - t0:.1f}s")
    collections = [os.path.join(DATA_DIR, f"col_{t}.fasta")
                   for t in ("1F", "1RC", "2F", "2RC")]
    return SynthDataset(
        root=DATA_DIR, collections=collections,
        lineage_path=os.path.join(DATA_DIR, "LineageFile.csv"),
        num_reads=num_pairs, num_genomes=len(genome_lens),
        read_len=read_len, genomes=[], reads1=[], reads2=[])


def _paper_dataset():
    """1M pairs x 930 genomes with genus-conserved blocks."""
    from tests.synth_big import BigDataset, make_big_dataset

    num_pairs, num_genomes, genome_len = 1_000_000, 930, 8000
    stamp = os.path.join(PAPER_DIR,
                         f"v1_{num_pairs}_{num_genomes}_{genome_len}.ok")
    if not os.path.exists(stamp):
        _log(f"bench[paper]: building dataset ({num_pairs} pairs x "
             f"{num_genomes} genomes; several minutes, cached)...")
        t0 = time.time()
        make_big_dataset(PAPER_DIR, num_pairs=num_pairs,
                         num_genomes=num_genomes, genome_len=genome_len,
                         seed=17)
        with open(stamp, "w") as f:
            f.write("ok")
        _log(f"bench[paper]: dataset built in {time.time() - t0:.0f}s")
    return BigDataset(
        root=PAPER_DIR,
        collections=[os.path.join(PAPER_DIR, f"col_{t}.fasta")
                     for t in ("1F", "1RC", "2F", "2RC")],
        lineage_path=os.path.join(PAPER_DIR, "LineageFile.csv"),
        num_reads=num_pairs, num_genomes=num_genomes, read_len=100,
        positions_per_collection=0)


def _run_ours(ds, config, tag) -> float:
    from lime_tpu.pipeline import run_paired
    from lime_tpu.utils.memory import MemoryProfiler

    out = os.path.join(ds.root, f"bench_ours_{tag}.csv")
    t0 = time.time()
    with MemoryProfiler(interval=0.5) as prof:
        run_paired(ds.collections, out, ds.num_reads, ds.num_genomes,
                   ds.lineage_path, ds.read_len, config)
    dt = time.time() - t0
    prof.write_csv(os.path.join(ROOT, "build", f"memprofile_{tag}.csv"))
    _log(f"bench[{tag}]: {prof.report()}")
    return dt


def _run_reference(ds, tag) -> float:
    from tests.oracle import OracleBinaries

    oracle = OracleBinaries.build()
    t0 = time.time()
    for c in ds.collections:
        oracle.cluster_lcp(c, ds.num_reads, ds.num_genomes, 16, threads=1)
    for c in ds.collections:
        oracle.cluster_bwt(c, ds.read_len, 0.25, threads=1)
    oracle.classify([c + ".res" for c in ds.collections], ds.num_reads,
                    ds.num_genomes, os.path.join(ds.root, f"bench_ref_{tag}.csv"),
                    ds.lineage_path, 1, threads=1)
    return time.time() - t0


def _check_outputs(ds, tag) -> None:
    with open(os.path.join(ds.root, f"bench_ours_{tag}.csv")) as f:
        ours = f.read()
    with open(os.path.join(ds.root, f"bench_ref_{tag}.csv")) as f:
        ref = f.read()
    if ours != ref:
        _log(f"bench[{tag}]: FATAL — output mismatch vs reference!")
        sys.exit(1)
    _log(f"bench[{tag}]: outputs bit-identical to reference")


def _bench_config(ds, config, tag, ref_runs, ours_runs):
    ref_t = _run_reference(ds, tag)
    for _ in range(ref_runs - 1):
        ref_t = min(ref_t, _run_reference(ds, tag))
    ours_t = _run_ours(ds, config, tag)  # warm (compiles)
    best = _run_ours(ds, config, tag)
    for _ in range(ours_runs - 1):
        best = min(best, _run_ours(ds, config, tag))
    _check_outputs(ds, tag)
    index_gb = sum(os.path.getsize(c + ext) for c in ds.collections
                   for ext in (".lcp", ".da", ".ebwt")) / 1e9
    res = {
        "reads_per_s": round(ds.num_reads / best, 1),
        "ref_reads_per_s": round(ds.num_reads / ref_t, 1),
        "speedup": round(ref_t / best, 2),
        "ours_s": round(best, 2),
        "ref_s": round(ref_t, 2),
        "index_stream_GBps": round(index_gb / best, 2),
        "num_reads": ds.num_reads,
        "num_genomes": ds.num_genomes,
    }
    _log(f"bench[{tag}]: ref {ref_t:.2f}s | ours {best:.2f}s | "
         f"{res['speedup']}x | {res['reads_per_s']:.0f} reads/s | "
         f"{res['index_stream_GBps']} GB/s of index streamed")
    return res


def _device_tests() -> str:
    """Run the device-mode test subset on the real chip.

    In-process (pytest.main), NOT a subprocess: the axon relay serves one
    chip claim at a time, and a second process would block on the claim
    until timeout while this process still holds the device.
    """
    import pytest

    os.environ["LIME_TEST_TPU"] = "1"
    rc = pytest.main(["tests/test_pallas_kernel.py", "-q", "--no-header",
                      "-x", "-p", "no:cacheprovider"])
    status = "passed" if rc == 0 else "FAILED"
    _log(f"bench: device tests {status} (pallas kernel subset, rc={rc})")
    if rc != 0:
        sys.exit(1)
    return f"pallas kernel device tests {status}"


def main() -> None:
    import threading

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, "build", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from lime_tpu.config import LimeConfig
    from lime_tpu.utils.memory import memory_report

    # The first compile+transfer of a process pays a multi-minute device
    # bringup through the axon relay; trigger it in the background while the
    # dataset and reference baseline run on the host CPU.
    def _warm_device():
        x = jax.device_put(np.ones(8, np.float32))
        np.asarray(jax.jit(lambda a: a * 2.0)(x))
        _log("bench: device warm-up complete")

    warmer = threading.Thread(target=_warm_device, daemon=True)
    warmer.start()

    ds_small = _example_dataset()
    ds_paper = _paper_dataset()
    warmer.join()
    backend = jax.default_backend()
    _log(f"bench: backend={backend}")

    config = LimeConfig(executor="tpu", fused=True, threads=2)
    example = _bench_config(ds_small, config, "example", ref_runs=2,
                            ours_runs=2)
    paper = _bench_config(ds_paper, config, "paper", ref_runs=1,
                          ours_runs=2)
    mem = memory_report().replace("\n", "; ")
    _log(f"bench: memory {mem}")
    device_tests = _device_tests()

    print(json.dumps({
        "metric": "paper_scale_classification_throughput",
        "value": paper["reads_per_s"],
        "unit": "reads/s",
        "vs_baseline": paper["speedup"],
        "backend": backend,
        "example": example,
        "paper": paper,
        "memory": mem,
        "device_tests": device_tests,
    }))


if __name__ == "__main__":
    main()
