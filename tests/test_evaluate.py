"""Accuracy evaluation on the synthetic dataset (known read origins)."""

from lime_tpu.config import LimeConfig
from lime_tpu.pipeline import run_paired
from lime_tpu.utils.evaluate import AccuracyReport, evaluate

HOST = LimeConfig(executor="host")


def test_synthetic_accuracy(dataset, tmp_path):
    out = str(tmp_path / "acc.csv")
    run_paired(dataset.collections, out, dataset.num_reads,
               dataset.num_genomes, dataset.lineage_path,
               dataset.read_len, HOST)
    # species taxid of genome g is 1000+g (tests/synth.py lineage layout)
    truth = {i: (None if g is None else 1000 + g)
             for i, g in enumerate(dataset.origins)}
    rep = evaluate(out, truth)
    n_neg = sum(1 for g in dataset.origins if g is None)
    n_pos = dataset.num_reads - n_neg
    assert rep.tn >= 0.95 * n_neg  # shuffled reads stay unclassified
    assert rep.sensitivity > 0.85  # planted reads recovered
    assert rep.precision > 0.95  # and to the right species
    assert 0 < rep.f1 <= 1
    assert rep.tp + rep.fp + rep.fn == n_pos + (n_neg - rep.tn)


def test_report_math():
    r = AccuracyReport(tp=8, fp=2, fn=2, tn=5)
    assert r.sensitivity == 0.8
    assert r.precision == 0.8
    assert abs(r.f1 - 0.8) < 1e-12
    assert "sensitivity=0.8000" in r.summary()


def test_memory_profiler_series():
    """Time-series sampling profiler (the malloc_count replacement)."""
    import numpy as np

    from lime_tpu.utils.memory import MemoryProfiler

    with MemoryProfiler(interval=0.01) as prof:
        _ = np.ones(1 << 22, np.uint8)
        import time

        time.sleep(0.05)
    s = prof.series()
    assert len(s) >= 2
    assert all(t2 >= t1 for (t1, _, _), (t2, _, _) in zip(s, s[1:]))
    assert all(rss > 0 for _, rss, _ in s)
    assert "host peak" in prof.report()
