// burst_host: native host-runtime kernels for the TPU-native aligner.
//
// The TPU owns the DP compute; everything around it that the reference
// implements as C+OpenMP host code (k-mer scour + candidate selection,
// burst.c:4077-4136; per-unit pigeonhole prefilter; blast6 row
// formatting, burst.c:4553-4562) is implemented here natively too.
// Loaded via ctypes (see native/__init__.py); the vectorized numpy
// implementations remain as fallback when no compiler is available.
//
// Build: g++ -O2 -fopenmp -shared -fPIC -o burst_host.so burst_host.cpp
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#else
static int omp_get_max_threads() { return 1; }
static int omp_get_thread_num() { return 0; }
#endif

namespace {

// postings lookup: dense rank table (rank[w] = index+1, 0 = absent)
// when present, else binary search over the sorted nonzero words
struct Postings {
    const uint32_t* rank; long span;
    const int64_t* nzw; long n_nz;
    const int64_t* starts; const int64_t* cnts;
    const uint32_t* ids;

    bool find(int64_t w, int64_t* s, int64_t* c) const {
        if (rank) {
            if (w >= span) return false;
            uint32_t r = rank[w];
            if (!r) return false;
            *s = starts[r - 1]; *c = cnts[r - 1];
            return true;
        }
        const int64_t* lo = std::lower_bound(nzw, nzw + n_nz, w);
        if (lo == nzw + n_nz || *lo != w) return false;
        long ix = (long)(lo - nzw);
        *s = starts[ix]; *c = cnts[ix];
        return true;
    }
};

struct Cand { int64_t hits; int64_t touch; int64_t clump; };

}  // namespace

extern "C" {

// ---------------------------------------------------------------- scour
// Bunch-level k-mer scour + candidate selection + member expansion.
// Semantics mirror engine.accel_candidates (see its docstring for the
// burst.c citations): per bunch, the union of member k-mer words in
// ascending word order, per-word weight = MAX multiplicity over
// members, postings walked in word order accumulating per-clump hits
// (saturated at 0xFFFF) with first-touch ranking; bunch candidates =
// clumps with hits > mm_bunch[g] ordered by (hits desc, first-touch
// asc); member lists = bunch candidates with hits > mm_inner[j].
//
// Results are held in process-global growable buffers between the _run
// and _fetch calls (single-threaded driver assumption).
struct ScourResult {
    std::vector<int64_t> bflat, bhits, mflat;
    std::vector<int64_t> bcnt, mcnt, ukeys;
};
static ScourResult g_scour;

// With u_ids != NULL the unit-level pigeonhole prefilter runs fused in
// the same pass (reusing each member's sorted word multiset): per clear
// member j, per-unit hit counts over the unit-granular postings, keys
// j*tot_units+u emitted (ascending) for units with hits > mm_inner[j].
long scour_run(
    const uint8_t* qmat, long qstride, const int64_t* qlens,
    long b0, long b1, long qbunch, int k,
    const int64_t* aq_off, const int64_t* aq_words,
    const int64_t* aq_mult,
    const uint32_t* rank, long span,
    const int64_t* nzw, long n_nz,
    const int64_t* starts, const int64_t* cnts, const uint32_t* ids,
    long n_clumps,
    const int64_t* mm_bunch, const int64_t* mm_inner,
    const uint32_t* u_rank, long u_span,
    const int64_t* u_nzw, long u_n_nz,
    const int64_t* u_starts, const int64_t* u_cnts,
    const uint32_t* u_ids, long tot_units,
    long threads)
{
    long n_bunches = (b1 + qbunch - 1) / qbunch;
    g_scour.bflat.clear(); g_scour.bhits.clear(); g_scour.mflat.clear();
    g_scour.bcnt.assign(n_bunches, 0);
    g_scour.mcnt.assign(b1, 0);
    g_scour.ukeys.clear();
    Postings post{rank, span, nzw, n_nz, starts, cnts, ids};
    Postings upost{u_rank, u_span, u_nzw, u_n_nz, u_starts, u_cnts,
                   u_ids};
    bool do_unit = u_ids != nullptr;

    int nt = threads > 0 ? (int)threads : omp_get_max_threads();
    std::vector<std::vector<int64_t>> t_bflat(nt), t_bhits(nt),
        t_mflat(nt), t_ukeys(nt);

#pragma omp parallel num_threads(nt)
    {
        int tid = omp_get_thread_num();
        std::vector<int32_t> hits(n_clumps, 0);
        std::vector<int32_t> uh(do_unit ? tot_units : 0, 0);
        std::vector<int64_t> utouched; utouched.reserve(256);
        std::vector<int64_t> touched; touched.reserve(1024);
        // (word, member-in-bunch<<0 | mult<<8) pairs; qbunch <= 255
        std::vector<std::pair<int64_t, int64_t>> wm; wm.reserve(512);
        std::vector<Cand> cand; cand.reserve(256);

#pragma omp for schedule(static)
        for (long g = 0; g < n_bunches; ++g) {
            long j_lo = g * qbunch;
            long j_hi = std::min(b1, j_lo + qbunch);
            wm.clear();
            for (long j = j_lo; j < j_hi; ++j) {
                int64_t mrel = j - j_lo;
                if (j < b0) {
                    // ambiguous member: precomputed unique words+mults
                    for (int64_t a = aq_off[j]; a < aq_off[j + 1]; ++a)
                        wm.emplace_back(aq_words[a],
                                        (aq_mult[a] << 8) | mrel);
                } else {
                    const uint8_t* q = qmat + j * qstride;
                    long len = qlens[j];
                    if (len < k) continue;
                    int64_t w = 0;
                    int64_t mask = ((int64_t)1 << (2 * k)) - 1;
                    for (long t = 0; t < k - 1; ++t)
                        w = (w << 2) | (int64_t)(q[t] - 1);
                    for (long t = k - 1; t < len; ++t) {
                        w = ((w << 2) | (int64_t)(q[t] - 1)) & mask;
                        wm.emplace_back(w, ((int64_t)1 << 8) | mrel);
                    }
                }
            }
            if (wm.empty()) continue;
            std::sort(wm.begin(), wm.end(),
                      [](const std::pair<int64_t, int64_t>& a,
                         const std::pair<int64_t, int64_t>& b) {
                          if (a.first != b.first) return a.first < b.first;
                          return (a.second & 0xFF) < (b.second & 0xFF);
                      });
            touched.clear();
            size_t i = 0;
            while (i < wm.size()) {
                int64_t w = wm[i].first;
                int64_t best_m = 0;
                size_t r = i;
                while (r < wm.size() && wm[r].first == w) {
                    int64_t memb = wm[r].second & 0xFF;
                    int64_t acc = 0;
                    while (r < wm.size() && wm[r].first == w &&
                           (wm[r].second & 0xFF) == memb) {
                        acc += wm[r].second >> 8;
                        ++r;
                    }
                    if (acc > best_m) best_m = acc;
                }
                i = r;
                int64_t s, c;
                if (!post.find(w, &s, &c)) continue;
                for (int64_t p = s; p < s + c; ++p) {
                    int64_t cl = ids[p];
                    if (!hits[cl]) touched.push_back(cl);
                    int64_t h = (int64_t)hits[cl] + best_m;
                    hits[cl] = (int32_t)std::min<int64_t>(h, 0xFFFF);
                }
            }
            // candidates: hits > mm_bunch, (hits desc, touch-order asc)
            int64_t thr = mm_bunch[g];
            cand.clear();
            for (size_t t = 0; t < touched.size(); ++t) {
                int64_t cl = touched[t];
                if (hits[cl] > thr)
                    cand.push_back(Cand{hits[cl], (int64_t)t, cl});
            }
            std::sort(cand.begin(), cand.end(),
                      [](const Cand& a, const Cand& b) {
                          if (a.hits != b.hits) return a.hits > b.hits;
                          return a.touch < b.touch;
                      });
            g_scour.bcnt[g] = (long)cand.size();
            for (auto& cc : cand) {
                t_bflat[tid].push_back(cc.clump);
                t_bhits[tid].push_back(cc.hits);
            }
            // member expansion
            for (long j = j_lo; j < j_hi; ++j) {
                long cnt = 0;
                for (auto& cc : cand)
                    if (cc.hits > mm_inner[j]) {
                        t_mflat[tid].push_back(cc.clump);
                        ++cnt;
                    }
                g_scour.mcnt[j] = cnt;
            }
            for (int64_t cl : touched) hits[cl] = 0;
            // fused unit-level prefilter over the same sorted multiset
            if (do_unit) {
                for (long j = std::max(j_lo, b0); j < j_hi; ++j) {
                    int64_t mrel = j - j_lo;
                    utouched.clear();
                    size_t i2 = 0;
                    while (i2 < wm.size()) {
                        int64_t w = wm[i2].first;
                        // this member's multiplicity for word w
                        int64_t m = 0;
                        size_t r = i2;
                        while (r < wm.size() && wm[r].first == w) {
                            if ((wm[r].second & 0xFF) == mrel)
                                m += wm[r].second >> 8;
                            ++r;
                        }
                        i2 = r;
                        if (!m) continue;
                        int64_t s, c;
                        if (!upost.find(w, &s, &c)) continue;
                        for (int64_t p = s; p < s + c; ++p) {
                            int64_t u = u_ids[p];
                            if (!uh[u]) utouched.push_back(u);
                            uh[u] = (int32_t)std::min<int64_t>(
                                (int64_t)uh[u] + m, 0x7FFFFFFF);
                        }
                    }
                    std::sort(utouched.begin(), utouched.end());
                    int64_t thr = mm_inner[j];
                    for (int64_t u : utouched) {
                        if (uh[u] > thr)
                            t_ukeys[tid].push_back(j * tot_units + u);
                        uh[u] = 0;
                    }
                }
            }
        }
    }
    // static scheduling gives each thread a contiguous bunch block in
    // order, so concatenating thread buffers restores global order
    for (int t = 0; t < nt; ++t) {
        g_scour.bflat.insert(g_scour.bflat.end(), t_bflat[t].begin(),
                             t_bflat[t].end());
        g_scour.bhits.insert(g_scour.bhits.end(), t_bhits[t].begin(),
                             t_bhits[t].end());
        g_scour.mflat.insert(g_scour.mflat.end(), t_mflat[t].begin(),
                             t_mflat[t].end());
        g_scour.ukeys.insert(g_scour.ukeys.end(), t_ukeys[t].begin(),
                             t_ukeys[t].end());
    }
    return 0;
}

void scour_sizes(int64_t* out3)
{
    out3[0] = (int64_t)g_scour.bflat.size();
    out3[1] = (int64_t)g_scour.mflat.size();
    out3[2] = (int64_t)g_scour.ukeys.size();
}

void scour_fetch(int64_t* bflat, int64_t* bhits, int64_t* bcnt,
                 int64_t* mflat, int64_t* mcnt, int64_t* ukeys)
{
    std::memcpy(bflat, g_scour.bflat.data(),
                g_scour.bflat.size() * sizeof(int64_t));
    std::memcpy(bhits, g_scour.bhits.data(),
                g_scour.bhits.size() * sizeof(int64_t));
    std::memcpy(bcnt, g_scour.bcnt.data(),
                g_scour.bcnt.size() * sizeof(int64_t));
    std::memcpy(mflat, g_scour.mflat.data(),
                g_scour.mflat.size() * sizeof(int64_t));
    std::memcpy(mcnt, g_scour.mcnt.data(),
                g_scour.mcnt.size() * sizeof(int64_t));
    if (ukeys)
        std::memcpy(ukeys, g_scour.ukeys.data(),
                    g_scour.ukeys.size() * sizeof(int64_t));
    std::vector<int64_t>().swap(g_scour.bflat);
    std::vector<int64_t>().swap(g_scour.bhits);
    std::vector<int64_t>().swap(g_scour.mflat);
    std::vector<int64_t>().swap(g_scour.ukeys);
}

// ------------------------------------------------- unit-level prefilter
// Per clear unibin: per-unit q-gram hit counts over the unit-granular
// postings; emit sorted keys j*tot_units + u for units passing
// hits > mm_inner[j] (sound pigeonhole at unit granularity).
static std::vector<int64_t> g_ukeys;

long unit_prefilter_run(
    const uint8_t* qmat, long qstride, const int64_t* qlens,
    long b0, long b1, int k,
    const uint32_t* rank, long span,
    const int64_t* nzw, long n_nz,
    const int64_t* starts, const int64_t* cnts, const uint32_t* ids,
    long tot_units, const int64_t* mm_inner, long threads)
{
    g_ukeys.clear();
    Postings post{rank, span, nzw, n_nz, starts, cnts, ids};
    int nt = threads > 0 ? (int)threads : omp_get_max_threads();
    std::vector<std::vector<int64_t>> t_keys(nt);

#pragma omp parallel num_threads(nt)
    {
        int tid = omp_get_thread_num();
        std::vector<int32_t> uh(tot_units, 0);
        std::vector<int64_t> touched; touched.reserve(256);
        std::vector<int64_t> words; words.reserve(512);

#pragma omp for schedule(static)
        for (long j = b0; j < b1; ++j) {
            const uint8_t* q = qmat + j * qstride;
            long len = qlens[j];
            if (len < k) continue;
            words.clear();
            int64_t w = 0;
            int64_t mask = ((int64_t)1 << (2 * k)) - 1;
            for (long t = 0; t < k - 1; ++t)
                w = (w << 2) | (int64_t)(q[t] - 1);
            for (long t = k - 1; t < len; ++t) {
                w = ((w << 2) | (int64_t)(q[t] - 1)) & mask;
                words.push_back(w);
            }
            std::sort(words.begin(), words.end());
            touched.clear();
            size_t i = 0;
            while (i < words.size()) {
                int64_t wv = words[i];
                int64_t m = 0;
                while (i < words.size() && words[i] == wv) { ++m; ++i; }
                int64_t s, c;
                if (!post.find(wv, &s, &c)) continue;
                for (int64_t p = s; p < s + c; ++p) {
                    int64_t u = ids[p];
                    if (!uh[u]) touched.push_back(u);
                    uh[u] = (int32_t)std::min<int64_t>(
                        (int64_t)uh[u] + m, 0x7FFFFFFF);
                }
            }
            std::sort(touched.begin(), touched.end());
            int64_t thr = mm_inner[j];
            for (int64_t u : touched) {
                if (uh[u] > thr)
                    t_keys[tid].push_back(j * tot_units + u);
                uh[u] = 0;
            }
        }
    }
    for (int t = 0; t < nt; ++t)
        g_ukeys.insert(g_ukeys.end(), t_keys[t].begin(), t_keys[t].end());
    return (long)g_ukeys.size();
}

void unit_prefilter_fetch(int64_t* out)
{
    std::memcpy(out, g_ukeys.data(), g_ukeys.size() * sizeof(int64_t));
    std::vector<int64_t>().swap(g_ukeys);
}

// ----------------------------------------------------------- Peq build
// Myers bit tables (kernels/myers.build_peq semantics): bit y of word w
// of plane c set iff query row y is a zero-cost match against reference
// code c, or y >= qlen (wildcard pad rows match everything, incl. 0).
// zmask[code] = 16-bit mask over c of zero-cost matches.
void build_peq16(const uint8_t* qmat, long qstride, const int64_t* qlens,
                 long B, int W, const uint16_t* zmask, uint32_t* out)
{
    long m_pad = (long)W * 32;
#pragma omp parallel for schedule(static)
    for (long b = 0; b < B; ++b) {
        const uint8_t* q = qmat + b * qstride;
        long len = qlens[b] < m_pad ? qlens[b] : m_pad;
        uint32_t* dst = out + b * 16 * W;
        for (int w = 0; w < W; ++w) {
            uint32_t cur[16] = {0};
            long y_lo = (long)w * 32;
            long y_hi = y_lo + 32;
            long y_real = len < y_hi ? (len > y_lo ? len : y_lo) : y_hi;
            for (long y = y_lo; y < y_real; ++y) {
                uint16_t m = zmask[q[y]];
                uint32_t bit = 1u << (y - y_lo);
                for (int c = 0; c < 16; ++c)
                    if (m & (1u << c)) cur[c] |= bit;
            }
            // wildcard pad rows: all planes
            if (y_real < y_hi) {
                uint32_t padbits = ~0u;
                if (y_real > y_lo)
                    padbits <<= (y_real - y_lo);
                for (int c = 0; c < 16; ++c) cur[c] |= padbits;
            }
            for (int c = 0; c < 16; ++c) dst[c * W + w] = cur[c];
        }
    }
}

// ------------------------------------------------------- b6 formatting
// One blast6 row (PRINT_MATCH, burst.c:4553-4562): tab-separated
// q, r, %f score*100, alnlen, mism, gap, 1, qlen, st, ed, totED, ix
// [, tax]. st prints the uint32 value as signed %d; the rest unsigned.
// Returns bytes written, or -(estimated bytes needed) if cap is too
// small (caller re-calls with a bigger buffer).
long b6_format(
    const char* qblob, const int64_t* qoff, const int64_t* qrow,
    const char* rblob, const int64_t* roff, const int64_t* rrow,
    const float* score, const uint32_t* al_len, const uint32_t* num_mis,
    const uint32_t* num_gap, const uint32_t* qlen,
    const int32_t* st_ix, const uint32_t* ed_ix, const uint32_t* mism,
    const int64_t* last,
    const char* tblob, const int64_t* toff, const int64_t* trow,
    long n, char* out, long cap)
{
    long pos = 0;
    for (long i = 0; i < n; ++i) {
        int64_t qr = qrow[i], rr = rrow[i];
        long ql = (long)(qoff[qr + 1] - qoff[qr]);
        long rl = (long)(roff[rr + 1] - roff[rr]);
        long tl = 0;
        if (tblob) tl = (long)(toff[trow[i] + 1] - toff[trow[i]]);
        if (pos + ql + rl + tl + 256 > cap)
            return -(pos + (n - i) * (ql + rl + tl + 256) + 256);
        std::memcpy(out + pos, qblob + qoff[qr], ql); pos += ql;
        out[pos++] = '\t';
        std::memcpy(out + pos, rblob + roff[rr], rl); pos += rl;
        out[pos++] = '\t';
        pos += std::snprintf(out + pos, cap - pos,
                             "%f\t%u\t%u\t%u\t1\t%u\t%d\t%u\t%u\t%ld",
                             (double)(score[i] * 100.0f), al_len[i],
                             num_mis[i], num_gap[i], qlen[i], st_ix[i],
                             ed_ix[i], mism[i], (long)last[i]);
        if (tblob) {
            out[pos++] = '\t';
            std::memcpy(out + pos, tblob + toff[trow[i]], tl); pos += tl;
        }
        out[pos++] = '\n';
    }
    return pos;
}

}  // extern "C"
