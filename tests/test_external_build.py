"""Beyond-RAM index construction: blockwise build + external merge.

The reference builds its big indexes with external-memory tools under a
fixed budget (eGap --em -m 4096, reference Preprocessing.sh:159-196);
lime_tpu.index.external is the self-contained equivalent.  The memory
cap is ENFORCED with RLIMIT_AS in a subprocess — the build either stays
under the budget or dies — and the output must be bit-identical to the
in-RAM builder.

The default test runs a mid-size collection (~2.6M positions) under a
1 GB address-space cap (build budget 64 MB -> ~17 blocks).  Set
LIME_BIG_TESTS=1 for the 10^8-position / 4 GB-cap configuration of the
round-4 blueprint (several minutes).
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from lime_tpu import native
from lime_tpu.index.builder import build_index_files
from lime_tpu.index.external import plan_blocks

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime needed")

_GEN = textwrap.dedent("""
    import numpy as np
    BASE = np.frombuffer(b"ACGT", np.uint8)

    def make_seqs(num_reads, read_len, genome_lens, seed):
        rng = np.random.default_rng(seed)
        genomes = [bytes(BASE[rng.integers(0, 4, L)]) for L in genome_lens]
        reads = []
        for i in range(num_reads):
            g = genomes[i % len(genomes)]
            p = int(rng.integers(0, len(g) - read_len))
            reads.append(g[p:p + read_len])
        return reads + genomes
""")


def _run_capped_build(tmp_path, num_reads, read_len, genome_lens, seed,
                      mem_budget, rlimit_as):
    """External build in a subprocess with RLIMIT_AS enforced."""
    out = str(tmp_path / "capped.fasta")
    script = _GEN + textwrap.dedent(f"""
        import resource, sys
        resource.setrlimit(resource.RLIMIT_AS,
                           ({rlimit_as}, {rlimit_as}))
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
        from lime_tpu.index.external import build_index_files_external
        seqs = make_seqs({num_reads}, {read_len}, {tuple(genome_lens)!r},
                         {seed})
        passes = build_index_files_external(
            {out!r}, seqs, mem_budget={mem_budget})
        print("PASSES", passes)
    """)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, (res.stdout, res.stderr)
    passes = int(res.stdout.strip().split()[-1])
    return out, passes


def _reference_build(tmp_path, num_reads, read_len, genome_lens, seed):
    ns = {}
    exec(_GEN, ns)
    seqs = ns["make_seqs"](num_reads, read_len, genome_lens, seed)
    ref = str(tmp_path / "inram.fasta")
    build_index_files(ref, seqs)
    return ref, seqs


def test_external_build_bit_identical_under_cap(tmp_path):
    num_reads, read_len, genome_lens = 25_000, 90, (60_000, 45_000)
    budget = 64 << 20
    ref, seqs = _reference_build(tmp_path, num_reads, read_len,
                                 genome_lens, 5)
    ends = plan_blocks([len(s) for s in seqs], budget)
    assert len(ends) >= 3, "budget must force a real multi-block merge"
    out, passes = _run_capped_build(tmp_path, num_reads, read_len,
                                    genome_lens, 5, budget, 1 << 30)
    assert passes > 1
    for ext in (".ebwt", ".lcp", ".da"):
        with open(ref + ext, "rb") as a, open(out + ext, "rb") as b:
            assert a.read() == b.read(), ext


@pytest.mark.skipif(not os.environ.get("LIME_BIG_TESTS"),
                    reason="set LIME_BIG_TESTS=1 for the 10^8-position "
                           "4GB-cap configuration (several minutes)")
def test_external_build_100M_positions_4GB_cap(tmp_path):
    """The blueprint configuration: >= 10^8 positions under a 4 GB
    address-space cap, bit-identical to the unconstrained in-RAM build."""
    num_reads, read_len = 990_000, 100
    genome_lens = (400_000, 350_000, 300_000)
    total = num_reads * (read_len + 1) + sum(g + 1 for g in genome_lens)
    assert total >= 100_000_000
    out, passes = _run_capped_build(tmp_path, num_reads, read_len,
                                    genome_lens, 11, 3 << 30, 4 << 30)
    ref, _ = _reference_build(tmp_path, num_reads, read_len,
                              genome_lens, 11)
    assert passes > 1
    for ext in (".ebwt", ".lcp", ".da"):
        with open(ref + ext, "rb") as a, open(out + ext, "rb") as b:
            while True:
                x = a.read(1 << 24)
                y = b.read(1 << 24)
                assert x == y, ext
                if not x:
                    break
