"""Classification accuracy evaluation against ground truth.

The reference evaluates accuracy externally (simulated sets with known
origins plus shuffled negative controls, Datasets/README.md:11-16; the
numbers live in the papers).  This module makes that evaluation a library
call: per-read expected taxa vs an assignment CSV.

Definitions follow the papers' convention:

- TP: read assigned (C or H) to its true taxon
- FP: read assigned to a wrong taxon (negative controls assigned anywhere
  also count as FP)
- FN: positive read left U or A
- TN: negative control left U (or A)

sensitivity = TP / (TP + FN); precision = TP / (TP + FP);
F1 = 2 * precision * sensitivity / (precision + sensitivity).
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional, Sequence


@dataclasses.dataclass
class AccuracyReport:
    tp: int = 0
    fp: int = 0
    fn: int = 0
    tn: int = 0

    @property
    def sensitivity(self) -> float:
        d = self.tp + self.fn
        return self.tp / d if d else 0.0

    @property
    def precision(self) -> float:
        d = self.tp + self.fp
        return self.tp / d if d else 0.0

    @property
    def f1(self) -> float:
        p, s = self.precision, self.sensitivity
        return 2 * p * s / (p + s) if (p + s) else 0.0

    def summary(self) -> str:
        return (f"TP={self.tp} FP={self.fp} FN={self.fn} TN={self.tn} "
                f"sensitivity={self.sensitivity:.4f} "
                f"precision={self.precision:.4f} F1={self.f1:.4f}")


def parse_assignments(csv_path: str) -> dict:
    """Read an assignment CSV -> {read_id: (type_char, taxid or None)}."""
    out = {}
    with open(csv_path) as f:
        header = f.readline()
        if not header.startswith("C/U/A/H"):
            raise ValueError(f"not an assignment CSV: {csv_path}")
        for line in f:
            t, rid, taxid, _ = line.rstrip("\n").split(",", 3)
            out[int(rid)] = (t, None if taxid == "NA" else int(taxid))
    return out


def evaluate(csv_path: str, truth: Mapping[int, Optional[int]],
             ) -> AccuracyReport:
    """Score an assignment CSV against ground truth.

    ``truth`` maps read id -> expected taxid, or None for negative
    controls.  Reads absent from ``truth`` are ignored.
    """
    assigned = parse_assignments(csv_path)
    rep = AccuracyReport()
    for rid, expected in truth.items():
        t, taxid = assigned.get(rid, ("U", None))
        positive = t in ("C", "H")
        if expected is None:
            if positive:
                rep.fp += 1
            else:
                rep.tn += 1
        elif positive:
            if taxid == expected:
                rep.tp += 1
            else:
                rep.fp += 1
        else:
            rep.fn += 1
    return rep
