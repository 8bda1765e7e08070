"""Query and reference preprocessing.

Replicates the observable semantics of the reference's process_queries
(/root/reference/burst.c:2980-3223) and process_references
(/root/reference/burst.c:1837-2755, plain shearing path :2109-2141):

* queries: name truncation at whitespace, translation to 4-bit codes,
  lexicographic sort by translated sequence (strcmp order), dedup with
  an Offset map back to original rows, per-unique error budget
  ed = trunc(float32(1/THRES - 1) * len) capped at 254, optional
  reverse-complement twins;
* references: optional fixed-stride shearing with overlap ov =
  trunc(maxLenQ / THRES) and shear = max(ov, rebase_amt), length-sorted
  pods of tolerance LATENCY sorted lexicographically within, optional
  exact dedup keeping the lowest original index as representative.

Everything is kept columnar (numpy) so tiles feed the kernels directly.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .alphabet import translate, revcomp

LATENCY = 16


@dataclasses.dataclass
class QueryData:
    heads_sorted: list[bytes]        # per original row, in sorted order
    offset: np.ndarray               # [numUniq+1] -> first row of each unique
    seqs: list[np.ndarray]           # [numUniqRC] code arrays (fwd then rc)
    six: np.ndarray                  # [numUniqRC] -> base unique index
    rc: np.ndarray                   # [numUniqRC] bool
    lens: np.ndarray                 # [numUniq] true lengths
    ed: np.ndarray                   # [numUniq] error budgets
    num_uniq: int
    max_len: int
    min_len: int


def process_queries(headers, raw_seqs, thres: float, do_rc: bool,
                    incl_whitespace: bool = False,
                    xalpha: bool = False) -> QueryData:
    tot = len(headers)
    if tot == 0:
        raise ValueError("ERROR: No queries found.")
    if not incl_whitespace:
        out = []
        for h in headers:
            cut = len(h)
            for i, b in enumerate(h):
                if b == 0x20 or b == 0x09:
                    cut = i
                    break
            out.append(h[:cut])
        headers = out
    seqs = [s if xalpha else translate(s) for s in raw_seqs]
    keys = [s.tobytes() for s in seqs]
    order = sorted(range(tot), key=lambda i: keys[i])  # strcmp order
    heads_sorted = [headers[i] for i in order]

    uniq_rows = [0]
    for i in range(1, tot):
        if keys[order[i]] != keys[order[i - 1]]:
            uniq_rows.append(i)
    num_uniq = len(uniq_rows)
    offset = np.array(uniq_rows + [tot], dtype=np.int64)

    useqs = [seqs[order[r]] for r in uniq_rows]
    lens = np.array([len(s) for s in useqs], dtype=np.int64)
    req_id = np.float32(1.0) / np.float32(thres) - np.float32(1.0)
    ed = np.minimum(254, (req_id * lens.astype(np.float32))
                    .astype(np.int64)).astype(np.int64)

    six = list(range(num_uniq))
    rc = [False] * num_uniq
    all_seqs = list(useqs)
    if do_rc:
        for i in range(num_uniq):
            all_seqs.append(revcomp(useqs[i]))
            six.append(i)
            rc.append(True)
    return QueryData(
        heads_sorted=heads_sorted, offset=offset, seqs=all_seqs,
        six=np.array(six, dtype=np.int64), rc=np.array(rc, dtype=bool),
        lens=lens, ed=ed, num_uniq=num_uniq,
        max_len=int(lens.max()), min_len=int(lens.min()))


def bin_queries_for_accel(qd: QueryData, k: int, z: int,
                          do_heur: bool = False) -> np.ndarray:
    """Reorder unibins into accelerator bins: ambiguous (0), clear (1),
    super-ambiguous/ineligible (2), lexicographically sorted within each
    (burst.c:3113-3186). Mutates qd in place; returns [b0, b1] bin ends
    (accelerator handles unibins [0, b1); the full scan takes [b1, ...)).
    """
    n = len(qd.seqs)
    lens = qd.lens[qd.six].astype(np.int64)
    eds = qd.ed[qd.six].astype(np.int64)
    m_pad = int(lens.max()) if n else 1
    qmat = np.zeros((n, m_pad), dtype=np.uint8)
    for j, s in enumerate(qd.seqs):
        qmat[j, : len(s)] = s
    # note: the reference increments totN only for codes > 4+Z but
    # demotes to the ambiguous bin for any code > 4 (burst.c:3113-3176)
    n_hard = (qmat > 4 + z).sum(axis=1)
    any_ambig = (qmat > 4).any(axis=1)
    stat = np.ones(n, dtype=np.int8)
    stat[any_ambig] = 0
    stat[n_hard > 5] = 2
    inel = lens < k
    if not do_heur:
        inel |= eds >= lens // np.int64(k)
    stat[inel] = 2
    skeys = np.ascontiguousarray(qmat).view(f"S{m_pad}").ravel()
    order = np.lexsort((skeys, stat))
    qd.seqs = [qd.seqs[j] for j in order]
    qd.six = qd.six[order]
    qd.rc = qd.rc[order]
    stat = stat[order]
    b0 = int(np.searchsorted(stat, 1))
    b1 = int(np.searchsorted(stat, 2))
    return np.array([b0, b1], dtype=np.int64)


@dataclasses.dataclass
class RefData:
    heads: list[bytes]               # per unit (shear), parent header
    seqs: list[np.ndarray]           # per unit, translated codes
    lens: np.ndarray                 # [totR]
    start: np.ndarray | None         # [totR] offset into parent (REBASE)
    ix_srt: np.ndarray               # [totU] sorted+dedup position -> unit ix
    tmp_rix: np.ndarray              # [totR] sorted position -> unit ix
    dedup_ix: np.ndarray | None      # [totU+1] group starts into tmp_rix
    ref_map: np.ndarray              # [totR] unit -> dupe-suppression bin
    tot_units: int                   # number of alignment units (post-dedup)
    orig_tot: int                    # number of shears pre-dedup
    shear: int = 0                   # shear window (0 = unsheared)


def shear_refs(heads, seqs, lens, max_len_q: int, thres: float,
               rebase_amt: int):
    """Plain fixed-stride shearing (burst.c:2109-2141)."""
    ov = int(np.float32(max_len_q) / np.float32(thres))
    shear = max(ov, int(rebase_amt))
    new_h, new_s, new_len, new_start = [], [], [], []
    max_len_r = shear + ov
    for i in range(len(seqs)):
        unit = int(lens[i]) - ov
        if unit < 0:
            unit = 1
        j = 0
        while j < unit:
            ln = min(int(lens[i]) - j, max_len_r)
            new_h.append(heads[i])
            new_s.append(seqs[i][j:j + ln])
            new_len.append(ln)
            new_start.append(j)
            j += shear
        # note: a reference of length exactly ov yields unit == 0 and is
        # dropped -- the reference implementation does the same
        # (burst.c:2118-2122: only negative unit is clamped to 1)
    return new_h, new_s, np.array(new_len, np.int64), \
        np.array(new_start, np.int64), shear


def process_references(headers, raw_seqs, *, max_len_q: int = 0,
                       thres: float = 0.97, rebase: bool = False,
                       rebase_amt: int = 500, curate: int = 0,
                       xalpha: bool = False, do_fp: bool = False) -> RefData:
    seqs = [s if xalpha else translate(s) for s in raw_seqs]
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    start = None
    shear = 0
    if rebase:
        headers, seqs, lens, start, shear = shear_refs(
            headers, seqs, lens, max_len_q, thres, rebase_amt)
    tot = len(seqs)

    # Length sort, then lexicographic sort within LATENCY pods
    order = np.argsort(lens, kind="stable")
    lens_sorted = lens[order]
    keys = [seqs[i].tobytes() for i in range(tot)]
    lat = 0 if do_fp else LATENCY
    srt = list(order)
    cur_tol = int(lens_sorted[0])
    prev = 0
    bounds = []
    for i in range(1, tot):
        if int(lens_sorted[i]) > cur_tol + lat:
            cur_tol = int(lens_sorted[i])
            if i - prev > 1:
                bounds.append((prev, i))
            prev = i
    if prev < tot - 1:
        bounds.append((prev, tot))
    for a, b in bounds:
        srt[a:b] = sorted(srt[a:b], key=lambda ix: keys[ix])
    srt = np.array(srt, dtype=np.int64)

    dedup_ix = None
    tmp_rix = srt.copy()
    ix_srt = srt.copy()
    tot_units = tot
    if curate:
        groups = [0]
        for i in range(1, tot):
            if keys[srt[i]] != keys[srt[i - 1]]:
                groups.append(i)
        uix = len(groups)
        dedup_ix = np.array(groups + [tot], dtype=np.int64)
        # lowest original index becomes the group representative
        # (burst.c:2213-2220): swap it to the group's front
        for g in range(uix):
            a, b = dedup_ix[g], dedup_ix[g + 1]
            lo = a + int(np.argmin(srt[a:b]))
            if lo != a:
                srt[a], srt[lo] = srt[lo], srt[a]
        tmp_rix = srt.copy()
        ix_srt = srt[dedup_ix[:-1]].copy()
        tot_units = uix

    ref_map = np.arange(len(seqs), dtype=np.int64)  # raw-FASTA identity map
    return RefData(
        heads=headers, seqs=seqs, lens=lens, start=start,
        ix_srt=ix_srt, tmp_rix=tmp_rix, dedup_ix=dedup_ix, ref_map=ref_map,
        tot_units=tot_units, orig_tot=tot, shear=shear)
