"""Golden oracle: the reference C++ binaries, compiled from /root/reference.

The reference repo has no automated tests (SURVEY.md §4); parity testing
compiles its binaries and asserts bit-identical artifacts.  Binaries are
cached under build/oracle/ keyed by flag variant.  Nothing from the
reference tree is copied into this repository — it is compiled in place.
"""

from __future__ import annotations

import dataclasses
import os
import subprocess
from typing import Dict, Sequence

REFERENCE_SRC = os.environ.get("LIME_REFERENCE_SRC", "/root/reference/src")

# -O3 matches the reference's shipped Makefile (reference Makefile:26);
# benchmarking against anything weaker would soften the baseline.
_COMMON = ["-std=c++11", "-O3", "-fopenmp", "-w", "-DNDEBUG",
           "-DDEBUG=0", "-DM64=0", "-DOMP=1"]

# cache binaries per flag set, so flag changes force a rebuild
import hashlib  # noqa: E402

BUILD_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "build",
    "oracle_" + hashlib.sha1(" ".join(_COMMON).encode()).hexdigest()[:8])


def _variant_name(src: str, defines: Dict[str, int],
                  wide: bool = False) -> str:
    base = os.path.splitext(os.path.basename(src))[0]
    suffix = "".join(f"_{k}{v}" for k, v in sorted(defines.items()))
    return base + suffix + ("_wide" if wide else "")


def _wide_src_dir() -> str:
    """Reference sources with dataTypeNumSim flipped to 1 (u32 counters).

    The knob is a bare ``#define`` in Tools.h (reference src/Tools.h:51),
    not a -D flag, so the wide oracle compiles from a patched copy under
    build/ (never part of the repository — build/ is gitignored; the
    sources exist only as compiler input for the golden binaries).
    """
    import shutil

    dst = os.path.join(BUILD_DIR, "src_wide")
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(REFERENCE_SRC):
        if not (name.endswith(".cpp") or name.endswith(".h")):
            continue
        src_p = os.path.join(REFERENCE_SRC, name)
        dst_p = os.path.join(dst, name)
        if (os.path.exists(dst_p)
                and os.path.getmtime(dst_p) > os.path.getmtime(src_p)):
            continue
        if name == "Tools.h":
            with open(src_p) as f:
                text = f.read()
            text = text.replace("#define dataTypeNumSim 0",
                                "#define dataTypeNumSim 1")
            with open(dst_p, "w") as f:
                f.write(text)
        else:
            shutil.copy2(src_p, dst_p)
    return dst


@dataclasses.dataclass
class OracleBinaries:
    bindir: str

    @classmethod
    def build(cls) -> "OracleBinaries":
        os.makedirs(BUILD_DIR, exist_ok=True)
        targets = [
            ("ClusterLCP.cpp", {}, False),
            ("ClusterBWT_DA.cpp", {"BIN": 1, "EBWT": 1}, False),
            ("ClusterBWT_DA.cpp", {"BIN": 1, "EBWT": 0}, False),
            ("ClusterBWT_DA.cpp", {"BIN": 0, "EBWT": 1}, False),
            ("ClusterBWT_DA.cpp", {"BIN": 1, "EBWT": 1}, True),
            # SMALL=1: the full-SimArray debug dump (a bare #ifndef in
            # ClusterBWT_DA.cpp:20, so a plain -D flag works)
            ("ClusterBWT_DA.cpp", {"BIN": 1, "EBWT": 1, "SMALL": 1},
             False),
            ("Classify.cpp", {"BIN": 1, "HIGHER": 0}, False),
            ("Classify.cpp", {"BIN": 1, "HIGHER": 1}, False),
            ("Classify.cpp", {"BIN": 0, "HIGHER": 0}, False),
        ]
        for src, defines, wide in targets:
            out = os.path.join(BUILD_DIR,
                               _variant_name(src, defines, wide))
            src_dir = _wide_src_dir() if wide else REFERENCE_SRC
            src_path = os.path.join(src_dir, src)
            if (os.path.exists(out)
                    and os.path.getmtime(out) > os.path.getmtime(src_path)):
                continue
            cmd = ["g++", src_path, "-o", out, *_COMMON,
                   *[f"-D{k}={v}" for k, v in defines.items()]]
            subprocess.run(cmd, check=True, capture_output=True)
        return cls(bindir=BUILD_DIR)

    def _run(self, name: str, args: Sequence[str], cwd: str) -> str:
        proc = subprocess.run(
            [os.path.join(self.bindir, name), *map(str, args)],
            cwd=cwd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"{name} {' '.join(map(str, args))} failed:\n"
                f"{proc.stdout}\n{proc.stderr}")
        return proc.stdout

    def cluster_lcp(self, fasta: str, num_reads: int, num_genomes: int,
                    alpha: int, threads: int = 1) -> str:
        return self._run("ClusterLCP",
                         [fasta, num_reads, num_genomes, alpha, threads],
                         cwd=os.path.dirname(fasta))

    def cluster_bwt(self, fasta: str, read_len: int, beta: float,
                    threads: int = 1, ebwt: int = 1, bin_out: int = 1,
                    wide: bool = False) -> str:
        name = _variant_name("ClusterBWT_DA.cpp",
                             {"BIN": bin_out, "EBWT": ebwt}, wide)
        return self._run(name, [fasta, read_len, beta, threads],
                         cwd=os.path.dirname(fasta))

    def classify(self, res_prefixes: Sequence[str], num_reads: int,
                 num_genomes: int, output: str, lineage: str, tax_rank: int,
                 threads: int = 1, higher: int = 0,
                 bin_in: int = 1) -> str:
        name = _variant_name("Classify.cpp",
                             {"BIN": bin_in, "HIGHER": higher})
        args = [len(res_prefixes), *res_prefixes, num_reads, num_genomes,
                output, lineage, tax_rank, threads]
        return self._run(name, args, cwd=os.path.dirname(output))
