/* akmer94b: alignment-free k-mer distance matrices and NJ trees over a
 * linearized FASTA (aKronyMer v0.94b work-alike).
 *
 * Clean-room reimplementation of the reference's binary-only
 * embalmlets/bin/akmer94b (no source ships); every behavior below was
 * established by black-box probing and output bytes match the binary
 * on the probed surface (tests/test_tools.py):
 *   - per sequence, the k-mer set over windows 0..L-K-1 (the final
 *     window is excluded); windows containing any letter outside
 *     ACGTacgt are skipped; Density = set size, Entropy = Density/L
 *   - K: numeric argv[3] only, else round(log4(mean length)) + 1,
 *     floored at 4; the printed H is (4^K/64) >> heur_digit, min 1
 *   - the option scan is POSITIONAL: canonical order is
 *     [K] [HEUR[0-9]] [ADJ] [GLOBAL/DIRECT] [TREE]. A flag arriving
 *     at or before the position of the last accepted flag clears every
 *     OTHER flag (K survives) before being applied; an unrecognized
 *     arg (including a number outside argv[3]) clears all flags.
 *     Hence "ADJ HEUR" is raw, "TREE GLOBAL" is a matrix, and
 *     "HEUR TREE ADJ" is an adjusted glocal matrix with no heuristic.
 *     Any reset event also voids the auto-K suggestion: with no valid
 *     explicit K the run falls back to the floor K = 4, not sugg.
 *   - metrics on set sizes pa, pb, intersection I, union U, N = 4^K:
 *       raw  glocal 1 - I/min    global 1 - I/max    direct 1 - I/U
 *       ADJ  -ln((I - x)/(den - x)), x = pa*pb/N for glocal (den=min)
 *            and global (den=max); x = (pa*pb/N)*U/(pa+pb) for direct
 *            (den=U); non-positive numerator (or >10) caps at 10.0
 *   - HEUR lv d ("WARNING: Using lv %d setcov heuristic!") merges a
 *     new sequence into the FIRST earlier cluster whose sketch equals
 *     its own, where the sketch is the top H = (words >> d, min 1)
 *     words of the REVERSE-COMPLEMENT k-mer bitmap (bit rc(w) set for
 *     every k-mer w). At lv 0 that is full rc-image equality, i.e.
 *     plain set identity. The cluster keeps the first member's bits
 *     and label grows progressively:
 *     ((a:0.00000,b:0.00000):0.00000,c:0.00000)
 *   - TREE: neighbor joining in single-precision float (like the
 *     whole distance pipeline: the original binary's math is float,
 *     with __svml_logf8 for ADJ).  Selection scans the lower triangle
 *     with q = D - (r_i + r_j)/(m-2) (row sums pre-scaled by a hoisted
 *     reciprocal; the "-0.00000" branch prints pin this down) keeping
 *     ties on the LAST minimum; the joined node is written (i:bi,j:bj)
 *     with %.5f branches, fb = (dij + r2i - r2j)/2, placed in slot j,
 *     slot i back-filled from the end; the final two slots print as
 *     (A:d/2,B:d/2);  TREE exits 1 like the original (matrix exits 0).
 *     TREE with exactly 7-9 clusters prints "ERR 57" and exits 57 (a
 *     hard guard in the original, keyed on cluster count after HEUR).
 *     Known divergence: the original's AVX+OpenMP argmin resolves
 *     EXACTLY-tied q by SIMD-lane order; heavily-tied matrices (many
 *     capped or identical distances) can root the tree differently.
 *   - progress lines go to stdout; a malformed header aborts to
 *     stderr as "ERROR: head %u no '>': '<line>'" with exit 2; fewer
 *     than 2 sequences exits 1 ("Sorry, need > 1 sequence!" on stderr)
 *     right after the Avg line; no/short args print usage and exit 1
 */
#include <float.h>
#include <limits.h>
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#ifdef _OPENMP
#include <omp.h>
#else
static double omp_get_wtime(void) { return 0; }
static int omp_get_max_threads(void) { return 1; }
#endif

typedef unsigned long long u64;
typedef unsigned u32;

static char *slurp(const char *path, size_t *n) {
    FILE *fp = fopen(path, "rb");
    if (!fp) return NULL;
    size_t cap = 1 << 20, len = 0;
    char *b = malloc(cap);
    for (;;) {
        len += fread(b + len, 1, cap - len, fp);
        if (len < cap) break;
        b = realloc(b, cap <<= 1);
    }
    fclose(fp);
    b = realloc(b, len + 1);
    b[len] = 0;
    *n = len;
    return b;
}

static const signed char CODE[256] = {
    ['A'] = 1, ['C'] = 2, ['G'] = 3, ['T'] = 4,
    ['a'] = 1, ['c'] = 2, ['g'] = 3, ['t'] = 4,
};

typedef struct {
    char *label;        /* name, or progressive HEUR merge label */
    u64 *bits;          /* k-mer presence bitmap, 4^K bits          */
    u64 *rc;            /* revcomp-image bitmap (HEUR sketch)       */
    u32 pop;            /* popcount (Density)                       */
} Cls;

/* forward k-mer bitmap in *fwd, revcomp-image bitmap in *rcb */
static void seq_bits(const char *s, u32 L, int K, u64 words,
                     u64 **fwd, u64 **rcb) {
    u64 *b = calloc(words, 8), *r = calloc(words, 8);
    *fwd = b; *rcb = r;
    if ((long)L - K <= 0) return;
    u64 w = 0, rw = 0, mask = ((u64)1 << (2 * K)) - 1;
    int run = 0, rsh = 2 * (K - 1);  /* valid letters accumulated */
    for (u32 i = 0; i + 1 < L; ++i) {       /* last window skipped */
        int c = CODE[(unsigned char)s[i]];
        if (!c) { run = 0; continue; }
        w = ((w << 2) | (u64)(c - 1)) & mask;
        rw = (rw >> 2) | ((u64)(4 - c) << rsh);
        if (++run >= K && i >= (u32)K - 1) {
            b[w >> 6] |= (u64)1 << (w & 63);
            r[rw >> 6] |= (u64)1 << (rw & 63);
        }
    }
}

static u32 popcnt(const u64 *b, u64 w) {
    u64 s = 0;
    for (u64 i = 0; i < w; ++i) s += __builtin_popcountll(b[i]);
    return (u32)s;
}

static u32 inter(const u64 *a, const u64 *b, u64 w) {
    u64 s = 0;
    for (u64 i = 0; i < w; ++i) s += __builtin_popcountll(a[i] & b[i]);
    return (u32)s;
}

enum { GLOCAL, GLOBAL, DIRECT };

/* Bit-exact port of Intel SVML's __svml_logf8_e9 fast path (the
   original's ADJ distances go through it; glibc logf differs in the
   last ulp often enough to flip %.4f prints).  Constants read out of
   the reference binary's __svml_slog_data table.  Inputs here are
   always positive normals (sim in (0,1]); sub-normal/zero/negative
   inputs would take SVML's slow path but also exceed the 10.0 cap. */
static float svml_logf(float x) {
    union { float f; u32 i; } u = { x }, m;
    int t = (int)(u.i - 0x3f2aaaabu);
    int e = t >> 23;                      /* arithmetic shift */
    m.i = (u32)(t & 0x007fffff) + 0x3f2aaaabu;
    float R = m.f - 1.0f;
    static const union { u32 i; float f; } C[] = {
        { 0xbe1b6a22 }, { 0x3e2db86b }, { 0xbe289358 }, { 0x3e4afb81 },
        { 0xbe80061d }, { 0x3eaaaee7 }, { 0xbf000000 }, { 0x3f317218 },
    };
    float p = C[0].f;
    for (int k = 1; k < 7; ++k) p = p * R + C[k].f;
    return (R + R * (R * p)) + (float)e * C[7].f;
}

/* all distance math is single-precision, like the original (its
   disassembly is wall-to-wall float ops incl. __svml_logf8 calls) */
static float pair_dist(u32 pa, u32 pb, u32 I, int metric, int adj,
                       float N) {
    u32 U = pa + pb - I;
    float den = metric == GLOCAL ? (float)(pa < pb ? pa : pb)
              : metric == GLOBAL ? (float)(pa > pb ? pa : pb)
              : (float)U;
    if (!adj) return I ? 1.0f - (float)I / den : 1.0f;
    float x = (float)pa * (float)pb / N;
    if (metric == DIRECT) x *= (float)U / ((float)pa + (float)pb);
    float sim = ((float)I - x) / (den - x);
    if (!(sim > 0)) return 10.0f;   /* non-positive or NaN (0/0) */
    float d = -svml_logf(sim);
    return d > 10.0f ? 10.0f : d;
}

int main(int argc, char **argv) {
    puts("This is aKronyMer v0.94b by Gabe.");
    if (argc < 3) {
        puts("usage: aKronyMer inseqs.lin.fna output [K] [HEUR[0-9]] "
             "[ADJ] [GLOBAL/DIRECT] [TREE]");
        return 1;
    }
    /* both files open (output truncated) before anything is parsed
       or printed beyond the banner */
    size_t fn;
    char *buf = slurp(argv[1], &fn);
    if (!buf) { fprintf(stderr, "ERROR: input file I/O\n"); return 1; }
    FILE *out = fopen(argv[2], "wb");
    if (!out) { fprintf(stderr, "ERROR: output file I/O\n"); return 1; }
    /* positional scan: [K] [HEUR] [ADJ] [GLOBAL/DIRECT] [TREE];
       a flag at or before the last accepted position clears every
       other flag first; unrecognized args clear all flags; a number
       is only K at argv[3] (elsewhere it is unrecognized). */
    int K = 0, heur = 0, hshift = 0, adj = 0, metric = GLOCAL, tree = 0;
    int lastp = -1, wasreset = 0;   /* any reset kills auto-K below */
    for (int a = 3; a < argc; ++a) {
        const char *s = argv[a];
        int p = !strncmp(s, "HEUR", 4) ? 1 : !strcmp(s, "ADJ") ? 2
              : !strcmp(s, "GLOBAL") || !strcmp(s, "DIRECT") ? 3
              : !strcmp(s, "TREE") ? 4 : -1;
        if (p < 0) {
            if (a == 3 && atoi(s) > 0) { K = atoi(s); lastp = 0; }
            else { heur = hshift = adj = tree = 0; metric = GLOCAL;
                   lastp = 0; wasreset = 1; }
            continue;
        }
        if (p <= lastp)
            { heur = hshift = adj = tree = 0; metric = GLOCAL;
              wasreset = 1; }
        lastp = p;
        switch (p) {
        case 1: heur = 1;
                hshift = s[4] >= '0' && s[4] <= '9' ? s[4] - '0' : 0;
                break;
        case 2: adj = 1; break;
        case 3: metric = s[0] == 'G' ? GLOBAL : DIRECT; break;
        case 4: tree = 1; break;
        }
    }
    printf("Using %d thread(s).\n", omp_get_max_threads());
    printf("Goal: output %s %s %s\n", adj ? "adjusted" : "raw",
           metric == GLOCAL ? "glocal" :
           metric == GLOBAL ? "global" : "direct",
           tree ? "tree" : "distance matrix");
    if (heur)
        printf("WARNING: Using lv %d setcov heuristic!\n", hshift);

    /* split into lines, keeping a raw copy for error echoes */
    u32 nl = 0;
    for (size_t i = 0; i < fn; ++i) nl += buf[i] == '\n';
    nl += fn && buf[fn - 1] != '\n';
    char **line = malloc((nl + 1) * sizeof(char *));
    u32 ln = 0;
    for (char *p = buf; p < buf + fn; ) {
        line[ln++] = p;
        char *e = memchr(p, '\n', (size_t)(buf + fn - p));
        if (!e) break;
        p = e + 1;
    }
    u32 n_seq = (ln + 1) / 2;          /* a trailing header counts */
    for (u32 i = 0; i < n_seq; ++i) {
        char *p = line[2 * i];
        char *e = memchr(p, '\n', (size_t)(buf + fn - p));
        if (!e) {                      /* header lines must end in NL */
            fprintf(stderr, "ERROR: head %u no NL: '%s'\n", i, p);
            return 2;
        }
        if (p[0] != '>') {             /* echo includes the newline */
            fprintf(stderr, "ERROR: head %u no '>': '%.*s'\n", i,
                    (int)(e + 1 - p), p);
            return 2;
        }
        if (2 * i + 1 >= ln) {         /* header without a sequence */
            fprintf(stderr, "ERROR: sequence ln %u\n", i);
            return 2;
        }
    }
    /* now safe to 0-terminate lines in place */
    for (u32 i = 0; i < ln; ++i) {
        char *e = strchr(line[i], '\n');
        if (e) *e = 0;
    }
    u64 tot = 0; u32 maxL = 0;
    u32 *lens = malloc(n_seq * 4);
    for (u32 i = 0; i < n_seq; ++i) {
        lens[i] = (u32)strlen(line[2 * i + 1]);
        tot += lens[i];
        if (lens[i] > maxL) maxL = lens[i];
    }
    u32 avg = (u32)(tot / n_seq);      /* SIGFPE on empty input, like
                                          the original's integer div */
    int sugg = avg ? (int)(log((double)avg) / log(4.0) + 1.5)
                   : INT_MIN;          /* (int)(-inf) on x86 */
    printf("Avg. length: %u, max = %u. Sugg. K = %u\n",
           avg, maxL, (u32)sugg);
    if (n_seq < 2) {
        fprintf(stderr, "Sorry, need > 1 sequence!\n");
        return 1;
    }
    if (!K) K = wasreset ? 0 : sugg;   /* a reset event also voids
                                          the auto-suggestion */
    if (K < 4) K = 4;
    u64 words = ((u64)1 << (2 * K)) / 64;
    if (!words) words = 1;
    u64 H = words >> hshift;            /* sketch width, in words */
    if (!H) H = 1;
    printf("Running with K = %d [H = %llu]\n", K, H);

    double t0 = omp_get_wtime();
    Cls *cls = malloc(n_seq * sizeof(Cls));
    u32 nc = 0;
    float Nspace = powf(4.0f, (float)K);
    for (u32 i = 0; i < n_seq; ++i) {
        u64 *b, *rcb;
        seq_bits(line[2 * i + 1], lens[i], K, words, &b, &rcb);
        u32 pop = popcnt(b, words);
        printf("[%u (%u)] L = %u, Density = %u [%f], Entropy = %f\n",
               i, nc, lens[i], pop, pop / Nspace,
               (double)pop / lens[i]);
        char *name = line[2 * i] + 1;
        if (heur && !pop) {    /* k-mer-free sequences are dropped
                                  outright under the heuristic */
            free(b);
            free(rcb);
            continue;
        }
        int hit = -1;
        if (heur)       /* sketch = top H words of the rc-image map */
            for (u32 c = 0; c < nc; ++c)
                if (!memcmp(cls[c].rc + (words - H),
                            rcb + (words - H), H * 8)) { hit = (int)c;
                                                         break; }
        if (hit >= 0) {               /* cluster keeps first's bits */
            char *old = cls[hit].label;
            size_t need = strlen(old) + strlen(name) + 32;
            char *nu = malloc(need);
            snprintf(nu, need, "(%s:0.00000,%s:0.00000)", old, name);
            cls[hit].label = nu;
            free(b);
            free(rcb);
        } else {
            cls[nc].label = name;
            cls[nc].bits = b;
            cls[nc].rc = rcb;
            cls[nc].pop = pop;
            ++nc;
        }
    }
    printf("Done parsing %u (%u cls) sequences [%f]\n", n_seq, nc,
           omp_get_wtime() - t0);
    if (tree && nc >= 7 && nc <= 9) {  /* original refuses NJ on
                                          exactly 7-9 clusters */
        printf("ERR 57\n");
        return 57;
    }

    t0 = omp_get_wtime();
    float *D = malloc((size_t)nc * nc * sizeof(float));
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (u32 i = 0; i < nc; ++i)
        for (u32 j = 0; j < i; ++j) {
            float d = pair_dist(cls[i].pop, cls[j].pop,
                                inter(cls[i].bits, cls[j].bits, words),
                                metric, adj, Nspace);
            D[(size_t)i * nc + j] = D[(size_t)j * nc + i] = d;
        }

    if (!tree) {
        for (u32 i = 0; i < nc; ++i) fprintf(out, "\t%s", cls[i].label);
        fputc('\n', out);
        for (u32 i = 0; i < nc; ++i) {
            fputs(cls[i].label, out);
            for (u32 j = 0; j < i; ++j)
                fprintf(out, "\t%.4f", D[(size_t)i * nc + j]);
            fputs("\t1.000\n", out);
        }
        fclose(out);
        return 0;
    }
    printf("Calculated distance matrix [%f]\n", omp_get_wtime() - t0);

    /* Neighbor joining over slots, replicating the original's
       single-precision arithmetic: row sums pre-scaled by a hoisted
       1/(m-2) (its -0.00000 branch prints pin this down), selection
       q = D - (r2_i + r2_j) over the lower triangle keeping the LAST
       minimum, branch fb = (dij + r2_i - r2_j)/2, update
       nd = (D_ik + D_jk - dij)/2 into slot j, slot i back-filled from
       the end.  Caveat: the original's AVX/OpenMP argmin can resolve
       EXACTLY-tied q values by a lane order we do not reproduce, so
       trees over heavily-tied matrices (many capped/identical
       distances) may root differently; matrices are unaffected. */
    t0 = omp_get_wtime();
    char **lab = malloc(nc * sizeof(char *));
    for (u32 i = 0; i < nc; ++i) lab[i] = cls[i].label;
    u32 m = nc;
    float *r2 = malloc(nc * sizeof(float));
    while (m > 2) {
        float inv = 1.0f / (float)(m - 2);
        for (u32 i = 0; i < m; ++i) {
            float s = 0;
            for (u32 k = 0; k < m; ++k) s += D[(size_t)i * nc + k];
            r2[i] = s * inv;
        }
        float best = FLT_MAX; u32 bi = 1, bj = 0;
        for (u32 i = 1; i < m; ++i)
            for (u32 j = 0; j < i; ++j) {
                float q = D[(size_t)i * nc + j] - (r2[i] + r2[j]);
                if (q <= best) { best = q; bi = i; bj = j; }
            }
        float dij = D[(size_t)bi * nc + bj];
        float fb = (dij + r2[bi] - r2[bj]) / 2;
        size_t need = strlen(lab[bi]) + strlen(lab[bj]) + 40;
        char *nu = malloc(need);
        snprintf(nu, need, "(%s:%.5f,%s:%.5f)", lab[bi], fb,
                 lab[bj], dij - fb);
        for (u32 k = 0; k < m; ++k) {
            if (k == bi || k == bj) continue;
            float nd = (D[(size_t)bi * nc + k] + D[(size_t)bj * nc + k]
                        - dij) / 2;
            D[(size_t)bj * nc + k] = D[(size_t)k * nc + bj] = nd;
        }
        D[(size_t)bj * nc + bj] = 0;
        lab[bj] = nu;
        --m;                              /* back-fill slot bi */
        if (bi != m) {
            lab[bi] = lab[m];
            for (u32 k = 0; k < m; ++k) {
                D[(size_t)bi * nc + k] = D[(size_t)m * nc + k];
                D[(size_t)k * nc + bi] = D[(size_t)k * nc + m];
            }
            D[(size_t)bi * nc + bi] = 0;
        }
    }
    printf("Finished tree construction [%f]\n", omp_get_wtime() - t0);
    if (m < 2)       /* 0/1 clusters: the original prints two zero
                        branches (garbage labels when 0; we use "") */
        fprintf(out, "(%s:0.00000,%s:0.00000);\n", m ? lab[0] : "",
                m ? lab[0] : "");
    else
        fprintf(out, "(%s:%.5f,%s:%.5f);\n", lab[0], D[1] / 2,
                lab[1], D[1] / 2);
    fclose(out);
    return 1;                  /* the original exits 1 after a tree */
}
