"""Database construction (makedb): shear, sort, dedupe, serialize.

Mirrors the reference makedb branch (/root/reference/burst.c:5118-5134):
process_references with curate=2 then dump_edb (+ optional accelerator).
The compressive duplicate-guided shearing of '-d DNA' (burst.c:1859-2107)
is approximated by plain fixed-stride shearing (burst.c:2109-2141), which
preserves the optimality guarantee (identical overlap rule) but may place
shear boundaries differently; alignment results are equivalent, shear
numbering may differ.
"""
from __future__ import annotations

import numpy as np

from ..io.fasta import parse_fasta
from ..process import process_references
from . import edx


def make_db(a: dict):
    if edx.is_edx(a["ref"]):
        raise ValueError("ERROR: DBs can't make DBs.")
    rh, rs = parse_fasta(a["ref"])
    db_qlen = a["db_qlen"] if a["rebase"] else 0
    rd = process_references(
        rh, rs, max_len_q=db_qlen, thres=a["thres"],
        rebase=a["rebase"], rebase_amt=a["rebase_amt"], curate=2,
        xalpha=a["xalpha"], do_fp=a["fp"])
    shear_hdr = int(np.float32(db_qlen) / np.float32(a["thres"]))
    edx.write_edx(a["out"], rd, shear_hdr, a["rebase"],
                  do_fp=False, xalpha=a["xalpha"])
    if a.get("accel"):
        from ..accel import make_accelerator
        make_accelerator(rd, a["accel"], z=a["z"],
                         skip_ambig=a["skipambig"],
                         k=a.get("kmer", 15))
    print("Database written.")
