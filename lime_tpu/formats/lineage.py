"""Lineage (taxonomy) CSV parsing.

Format (reference src/Classify.cpp:10-13): ';'-separated, header line::

    Accession_number;Species_TaxID;Genus_TaxID;Family_TaxID;Order_TaxID;Class_TaxID;Phylum_TaxID

One row per genome, in genome-id order.  The parser tolerates CRLF line
endings and trailing blank lines (the shipped example/LineageFile.csv has
both; the reference's atoi silently strips the '\\r').

Unlike the reference's FixRank (src/Classify.cpp:33-89) which silently skips
rows with an empty taxid at the chosen rank (desynchronizing genome ids) and
has an out-of-bounds write for rank 0 + HIGHER (src/Classify.cpp:78), we
parse the full matrix once and treat empty fields as taxid 0.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from ..constants import NUM_RANKS


@dataclasses.dataclass(frozen=True)
class Lineage:
    """Per-genome taxonomy.

    - ``names``: accession strings, genome-id order.
    - ``taxids``: (NUM_RANKS, num_genomes) u32 matrix; row r holds the
      taxid at rank r+1 (1=Species .. 6=Phylum).  Missing fields are 0.
    """

    names: List[str]
    taxids: np.ndarray

    @property
    def num_genomes(self) -> int:
        return len(self.names)

    def at_rank(self, tax_rank: int) -> np.ndarray:
        """Taxon label per genome at ``tax_rank`` (0 = genome identity).

        Rank 0 returns the genome indices themselves, matching the
        reference's TaxLevel==1 build which prints the genome index
        (src/Classify.cpp:73-76 with dataTypeSet=uint).
        """
        if tax_rank == 0:
            return np.arange(self.num_genomes, dtype=np.uint32)
        return self.taxids[tax_rank - 1]


def _parse_int(field: str) -> int:
    field = field.strip()
    if not field:
        return 0
    try:
        return int(field)
    except ValueError:
        # atoi semantics: parse the leading integer, 0 if none.
        num = ""
        for ch in field:
            if ch.isdigit() or (ch == "-" and not num):
                num += ch
            else:
                break
        return int(num) if num and num != "-" else 0


def read_lineage(path: str) -> Lineage:
    names: List[str] = []
    rows: List[List[int]] = []
    with open(path, "r", newline="") as f:
        lines = f.read().splitlines()
    if not lines:
        raise ValueError(f"empty lineage file: {path}")
    for line in lines[1:]:  # skip header
        line = line.strip()
        if not line:
            continue
        fields = line.split(";")
        if len(fields) < NUM_RANKS + 1:
            fields = fields + [""] * (NUM_RANKS + 1 - len(fields))
        names.append(fields[0].strip())
        rows.append([_parse_int(fields[r]) for r in range(1, NUM_RANKS + 1)])
    taxids = (np.asarray(rows, dtype=np.uint32).T if rows
              else np.zeros((NUM_RANKS, 0), dtype=np.uint32))
    return Lineage(names=names, taxids=taxids)
