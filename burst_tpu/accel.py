"""Accelerator (ACX): k-mer prefilter index, byte-compatible with the
reference (/root/reference/burst.c:3304-3594).

Build: for every 16-reference clump, collect the set of unique k-mers
occurring in any member (with IUPAC ambiguity expansion), and append the
clump id to each k-mer's postings list. Clumps whose ambiguity expansion
exceeds the budget go to the BadList and are always aligned.

Search ("scour"): decompose each query into its k-mers (with ambiguity
expansion for ambiguous queries), look up postings, and count per-clump
hits; a clump is a candidate iff hits > qlen - (err+1)*k (the q-gram
pigeonhole bound, burst.c:4091-4095), which preserves the optimality
guarantee. k = 15 matches the burst15 build; k = 12 matches burst12.

TPU mapping note: scour is a host-side sparse gather (numpy); the
device work stays in the batched DP kernels which receive only the
candidate pairs.
"""
from __future__ import annotations

import numpy as np

from .process import RefData

VECSZ = 16

# IUPAC code -> constituent 2-bit bases (burst.c:1372-1375 AMBIGS)
AMBIGS = {5: (0, 1, 2, 3), 6: (2, 3), 7: (0, 1), 8: (0, 2), 9: (1, 3),
          10: (1, 2), 11: (0, 3), 12: (1, 2, 3), 13: (0, 1, 2),
          14: (0, 1, 3), 15: (0, 2, 3)}

# Reference's expansion-cost tables (burst.c:3322-3325). IPOW4[3] is 61
# in the reference (a typo for 64) -- replicated for byte-compatibility.
IPOW3 = [3 ** i for i in range(16)]
IPOW4 = [1, 4, 16, 61, 256, 1024, 4096, 16384, 65536, 262144, 1048576,
         4194304, 16777216, 67108864, 268435456, 1073741824]


class Accelerator:
    def __init__(self, k: int, offsets: np.ndarray, ids: np.ndarray,
                 bad: np.ndarray, z: int):
        self.k = k
        self.offsets = offsets      # [4^k + 1] int64 CSR offsets
        self.ids = ids              # postings: clump ids (uint32)
        self.bad = bad              # BadList clump ids
        self.z = z


def _expand_words(seq: np.ndarray, j0: int, k: int, out: list):
    """DFS ambiguity expansion of the k-mer at j0 (countAmbigScour)."""
    stack = [(0, 0)]
    while stack:
        ix, w = stack.pop()
        if ix == k:
            out.append(w)
            continue
        c = int(seq[j0 + ix])
        if 1 <= c <= 4:
            stack.append((ix + 1, (w << 2) | (c - 1)))
        else:
            for b in reversed(AMBIGS.get(c, ())):
                stack.append((ix + 1, (w << 2) | b))


def _clump_words(seqs: list[np.ndarray], k: int, z: int,
                 skip_ambig: bool) -> np.ndarray:
    """Unique k-mer words of one clump, in first-discovery order."""
    seen: dict[int, None] = {}
    ambig_thresh = 4 + z    # letters above this trigger expansion
    for s in seqs:
        n = len(s)
        if n < k:
            continue
        has_ambig = bool((s > ambig_thresh).any())
        if skip_ambig or z:
            # skip windows containing the skip code(s)
            skip_code_hit = (s >= 5) if skip_ambig else (s == 5)
            j = 0
            while j + k <= n:
                w = np.nonzero(skip_code_hit[j:j + k])[0]
                if w.size:
                    j += int(w[0]) + 1
                    continue
                if has_ambig and bool((s[j:j + k] > ambig_thresh).any()):
                    tmp: list[int] = []
                    _expand_words(s, j, k, tmp)
                    for v in tmp:
                        seen.setdefault(v, None)
                else:
                    v = 0
                    for t in range(k):
                        v = (v << 2) | (int(s[j + t]) - 1)
                    seen.setdefault(v, None)
                j += 1
        elif has_ambig:
            for j in range(n - k + 1):
                tmp = []
                _expand_words(s, j, k, tmp)
                for v in tmp:
                    seen.setdefault(v, None)
        else:
            b = (s.astype(np.int64) - 1)
            win = np.lib.stride_tricks.sliding_window_view(b, k)
            pw = (4 ** np.arange(k - 1, -1, -1, dtype=np.int64))
            words = win @ pw
            for v in words:
                seen.setdefault(int(v), None)
    return np.fromiter(seen.keys(), dtype=np.int64, count=len(seen))


def _clump_is_bad(seqs: list[np.ndarray], k: int, z: int) -> bool:
    """Ambiguity-expansion budget check (burst.c:3341-3353), literal."""
    full_size = (1 << 31) - 1 if k > 14 else 1 << 24
    ipow = IPOW3 if z else IPOW4
    ambig = 4 + z
    rng = k - 1
    tsum = 0
    for s in seqs:
        n = len(s)
        if n < k:
            continue
        asum = 0
        for j in range(n):
            if j >= rng:
                tsum += ipow[asum]
                if s[j - rng] > ambig:
                    asum -= 1
            if s[j] > ambig:
                asum += 1
            if tsum >= full_size:
                return True
    return False


def build_accelerator(rd: RefData, k: int = 15, z: int = 1,
                      skip_ambig: bool = False) -> Accelerator:
    tot_rc = rd.tot_units // VECSZ + (1 if rd.tot_units % VECSZ else 0)
    n_words = 1 << (2 * k)
    counts = np.zeros(n_words, dtype=np.int64)
    per_clump_words: list[np.ndarray] = []
    bad: list[int] = []
    for c in range(tot_rc):
        begin, end = c * VECSZ, min(rd.tot_units, (c + 1) * VECSZ)
        seqs = [rd.seqs[rd.ix_srt[p]] for p in range(begin, end)]
        if not skip_ambig and _clump_is_bad(seqs, k, z):
            bad.append(c)
            per_clump_words.append(np.zeros(0, dtype=np.int64))
            continue
        words = _clump_words(seqs, k, z, skip_ambig)
        per_clump_words.append(words)
        np.add.at(counts, words, 1)
    offsets = np.zeros(n_words + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    ids = np.zeros(offsets[-1], dtype=np.uint32)
    fill = offsets[:-1].copy()
    for c, words in enumerate(per_clump_words):
        if words.size:
            ids[fill[words]] = c
            fill[words] += 1
    return Accelerator(k, offsets, ids, np.array(bad, dtype=np.uint32), z)


def make_accelerator(rd: RefData, path: str, z: int = 1,
                     skip_ambig: bool = False, k: int = 15):
    """Build and serialize (the makedb '-a' flow, burst.c:5127-5132)."""
    acc = build_accelerator(rd, k=k, z=z, skip_ambig=skip_ambig)
    tot_rc = rd.tot_units // VECSZ + (1 if rd.tot_units % VECSZ else 0)
    write_acx(path, acc, tot_rc)
    return acc


# ---------------------------------------------------------------- file io

ACC_VERSION = 0
ACC_VERSION_BIG = 1


def write_acx(path: str, acc: Accelerator, tot_rc: int):
    """Byte-compatible .acx writer (burst.c:3499-3530)."""
    big = tot_rc > 1048574
    with open(path, "wb") as f:
        vers = (1 << 7) | (int(bool(acc.z)) << 6) | \
            (ACC_VERSION_BIG if big else ACC_VERSION)
        f.write(bytes([vers]))
        f.write(np.uint32(len(acc.bad)).tobytes())
        lens = np.diff(acc.offsets).astype(np.uint32)
        f.write(lens.tobytes())
        ids = acc.ids.astype(np.uint64)
        if big:
            # 3 bytes per id
            b = np.zeros((len(ids), 3), dtype=np.uint8)
            b[:, 0] = ids & 0xFF
            b[:, 1] = (ids >> 8) & 0xFF
            b[:, 2] = (ids >> 16) & 0xFF
            # per-word order is already contiguous in CSR
            f.write(b.tobytes())
        else:
            out = bytearray()
            for w0, w1 in zip(acc.offsets[:-1], acc.offsets[1:]):
                seg = ids[w0:w1]
                for t in range(0, len(seg) - 1, 2):
                    bay = int(seg[t]) | (int(seg[t + 1]) << 20)
                    out += bay.to_bytes(5, "little")
                if len(seg) % 2:
                    out += int(seg[-1]).to_bytes(3, "little")
            f.write(bytes(out))
        f.write(acc.bad.astype(np.uint32).tobytes())


def read_acx(path: str, k: int | None = None, z_required: int = 1
             ) -> Accelerator:
    """Read a .acx (ours or the reference's; SMALL or LARGE format)."""
    with open(path, "rb") as f:
        data = f.read()
    cb = data[0]
    ver = cb & 0xF
    did_z = (cb >> 6) & 1
    if cb < 128 or ver not in (ACC_VERSION, ACC_VERSION_BIG):
        raise ValueError(f"ERROR: invalid accelerator [{cb}:{ver}]")
    if did_z and not z_required:
        raise ValueError("ERROR: Accelerator built without '-y'; "
                         "can't use '-y'")
    bad_sz = int(np.frombuffer(data, np.uint32, 1, 1)[0])
    if k is None:
        # infer k from the file size: 1 + 4 + 4*4^k + payload + badlist
        for kk in (16, 15, 14, 13, 12, 11, 10):
            hdr = 5 + 4 * (1 << (2 * kk))
            if len(data) < hdr:
                continue
            lens = np.frombuffer(data, np.uint32, 1 << (2 * kk), 5)
            total = int(lens.sum(dtype=np.int64))
            if ver == ACC_VERSION_BIG:
                need = total * 3
            else:
                need = int(((lens // 2) * 5 + (lens & 1) * 3)
                           .sum(dtype=np.int64))
            if hdr + need + 4 * bad_sz == len(data):
                k = kk
                break
        else:
            raise ValueError("cannot infer accelerator k")
    n_words = 1 << (2 * k)
    lens = np.frombuffer(data, np.uint32, n_words, 5).astype(np.int64)
    off = 5 + 4 * n_words
    offsets = np.zeros(n_words + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])
    ids = np.zeros(total, dtype=np.uint32)
    if ver == ACC_VERSION_BIG:
        raw = np.frombuffer(data, np.uint8, total * 3, off
                            ).reshape(total, 3).astype(np.uint32)
        ids = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        off += total * 3
    else:
        # vectorized SMALL decode: per word, len//2 5-byte pair records
        # then an optional 3-byte tail
        pairs = lens // 2
        odd = (lens & 1).astype(np.int64)
        blen = pairs * 5 + odd * 3
        bstart = np.zeros(n_words + 1, dtype=np.int64)
        np.cumsum(blen, out=bstart[1:])
        raw = np.frombuffer(data, np.uint8, int(bstart[-1]), off)
        off += int(bstart[-1])
        # pair records
        n_pairs = int(pairs.sum())
        if n_pairs:
            w_rep = np.repeat(np.arange(n_words), pairs)
            within = np.arange(n_pairs) - np.repeat(
                np.concatenate(([0], np.cumsum(pairs)[:-1])), pairs)
            rec = bstart[w_rep] + 5 * within
            b0 = raw[rec].astype(np.uint64)
            b1 = raw[rec + 1].astype(np.uint64)
            b2 = raw[rec + 2].astype(np.uint64)
            b3 = raw[rec + 3].astype(np.uint64)
            b4 = raw[rec + 4].astype(np.uint64)
            bay = b0 | (b1 << np.uint64(8)) | (b2 << np.uint64(16)) | \
                (b3 << np.uint64(24)) | (b4 << np.uint64(32))
            dst = offsets[w_rep] + 2 * within
            ids[dst] = (bay & np.uint64(0xFFFFF)).astype(np.uint32)
            ids[dst + 1] = ((bay >> np.uint64(20)) &
                            np.uint64(0xFFFFF)).astype(np.uint32)
        # odd tails
        ow = np.nonzero(odd)[0]
        if ow.size:
            rec = bstart[ow] + 5 * pairs[ow]
            v = (raw[rec].astype(np.uint32)
                 | (raw[rec + 1].astype(np.uint32) << 8)
                 | (raw[rec + 2].astype(np.uint32) << 16))
            ids[offsets[ow + 1] - 1] = v
    bad = np.frombuffer(data, np.uint32, bad_sz, off).copy()
    return Accelerator(k, offsets, ids, bad, int(did_z))


# ---------------------------------------------------------------- scour

def query_words(s: np.ndarray, k: int, z: int, ambiguous: bool
                ) -> np.ndarray:
    """k-mer multiset of one query (burst.c:4096-4113).

    Clear queries: every position's word (rolling pack). Ambiguous
    queries: ambiguity-expanded words, skipping N-containing windows
    when z is set.
    """
    n = len(s)
    if n < k:
        return np.zeros(0, dtype=np.int64)
    if not ambiguous:
        b = (s.astype(np.int64) - 1)
        win = np.lib.stride_tricks.sliding_window_view(b, k)
        pw = (4 ** np.arange(k - 1, -1, -1, dtype=np.int64))
        return win @ pw
    out: list[int] = []
    j = 0
    while j + k <= n:
        if z:
            w = np.nonzero(s[j:j + k] == 5)[0]
            if w.size:
                j += int(w[0]) + 1
                continue
        tmp: list[int] = []
        _expand_words(s, j, k, tmp)
        out.extend(tmp)
        j += 1
    return np.array(out, dtype=np.int64)


def scour_candidates(acc: Accelerator, words: np.ndarray, n_clumps: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Per-clump hit counts for one query('s word multiset).

    Returns (clump_ids, counts) for clumps with nonzero hits, in
    first-touch order over ascending word value (matching the
    reference's Cache order). Duplicate words contribute their
    multiplicity (burst.c postScour 'max' of per-query run lengths;
    for a single-query bunch this is the multiplicity).
    """
    if words.size == 0:
        return (np.zeros(0, np.int64),) * 2
    uw, mult = np.unique(words, return_counts=True)
    seg_len = (acc.offsets[uw + 1] - acc.offsets[uw]).astype(np.int64)
    total = int(seg_len.sum())
    if total == 0:
        return (np.zeros(0, np.int64),) * 2
    # flatten postings of all query words
    starts = acc.offsets[uw]
    base = np.repeat(starts - np.concatenate(
        ([0], np.cumsum(seg_len)[:-1])), seg_len)
    flat = base + np.arange(total)
    cl = acc.ids[flat].astype(np.int64)
    wgt = np.repeat(mult, seg_len)
    hits = np.bincount(cl, weights=wgt, minlength=n_clumps).astype(np.int64)
    np.minimum(hits, 0xFFFF, out=hits)
    # first-touch order over ascending word value, then posting order
    _, first = np.unique(cl, return_index=True)
    order = cl[np.sort(first)]
    return order, hits[order]
