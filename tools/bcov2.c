/* bcov2: binned reference-coverage tables (and unique-region genome
 * profiling) from BURST b6 alignments.
 *
 * Clean-room reimplementation of the reference's binary-only
 * bin/bcov2-strip ("BURSTcoverage 2 (bcov2) v2.0a"; no source ships).
 * Every behavior below was established by black-box probing and output
 * bytes match the binary on the probed surface (tests/test_tools.py):
 *
 *   usage: bcov2 in.aligns.b6 intable.txt output
 *                [BINS <X>] [ID <X>] [UNIQ] [UPROF <file.fasta>]
 *
 *   - options are consumed from the TAIL of argv, each checked once,
 *     in the order UPROF (pair) -> SPLIT (single, prints "NOT
 *     IMPLEMENTED" and is otherwise ignored) -> UNIQ (single) ->
 *     ID (pair) -> BINS (pair); so the canonical order in the usage
 *     string works, but e.g. "UNIQ BINS 50" drops UNIQ.
 *   - intable.txt lines are "<genome>\t<length>"; output rows follow
 *     table order, duplicates print as separate rows with lookups
 *     resolving to the FIRST occurrence.
 *   - nbins = ceil(length / binsize), binsize = BINS value (default
 *     100). Each b6 record with identity (col 3) >= the ID cutoff
 *     marks bins (min(s,e)-1)/bs .. (max(s,e)-1)/bs of its genome
 *     (cols 9/10) in UNSIGNED arithmetic (coordinates < 1 wrap
 *     astronomically), both endpoints clamped into [0, nbins-1]; the
 *     record is dropped iff lo > hi after clamping, so a fully-past-
 *     the-end record marks the last bin once and s<=0 contributes
 *     only when e also lands at the last bin. Average = total/nbins,
 *     Bins_Covered = distinct marked bins, Binary = covered/nbins;
 *     a 0-length genome prints "nan" for both ratios.
 *   - UNIQ appends the same four columns computed over "unique"
 *     records only: rows whose query name differs from both
 *     NEIGHBORING rows in the ID-filtered list (b6 groups a query's
 *     hits adjacently; scattered repeats count as unique), except
 *     that the LAST survivor also compares against the file's raw
 *     last record (a stale sentinel from in-place filtering; see the
 *     truth-table note above the implementation). Row format is
 *     "%s\t%llu\t%f\t%u\t%f\t%s\n" where the trailing %s is "" or
 *     the "\t..."-prefixed uniq block (hence the "\t\t" separator).
 *   - UPROF <f.fasta>: per-base coverage (bin size 1) from unique
 *     queries; the output file becomes a FASTA (in the profile
 *     fasta's record order, strict 2-line records) holding, per
 *     genome, the maximal covered runs of length >= stretch
 *     (stretch = 3*(readsize-1), readsize = BINS value or 100)
 *     joined by "NNNNN", one (unwrapped) sequence line per genome,
 *     empty if none qualify.
 *   - diagnostics go to stdout (banner, option echoes, "Max
 *     collisions" hash stats, phase timings, and ALL file-open /
 *     missing-genome errors); only "Malformatted profiling fasta"
 *     goes to stderr. Exit codes: usage 1, file errors 2, genome (in
 *     b6 or profile fasta) absent from the table 4.
 *   - divergences from the stripped binary, all on malformed input
 *     it crashes on: blank/short b6 lines (segfault), table lines
 *     without a tab (bus error), profile-fasta header without a
 *     sequence line (segfault), BINS 0 (SIGFPE) -- we exit 2 with
 *     "ERROR: Bad input file" instead. Hash-collision stats for very
 *     large tables (>>10^5 names) may differ (the binary's exact
 *     hash is unspecified; both print 0 when nothing collides).
 */
#define _POSIX_C_SOURCE 200809L
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

typedef unsigned long long u64;
typedef unsigned u32;

static double now(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

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

/* FNV-1a string hash -> open-addressing table of string indices */
typedef struct {
    const char **keys;
    u32 *vals;
    u64 mask;
    int max_probe, n_collided;
} Table;

static u64 fnv(const char *s) {
    u64 h = 1469598103934665603ULL;
    while (*s) h = (h ^ (unsigned char)*s++) * 1099511628211ULL;
    return h;
}

static Table table_new(u64 want) {
    Table t = { 0, 0, 1, 0, 0 };
    while (t.mask < want * 2 + 8) t.mask <<= 1;
    t.keys = calloc(t.mask, sizeof(char *));
    t.vals = malloc(t.mask * sizeof(u32));
    --t.mask;
    return t;
}

/* unconditional insert (duplicates stored after the original, so
   lookups keep hitting the first); tallies the probed-slot stats the
   reference prints ("Max collisions", "terms that collided") -- a
   duplicate name counts as a collision, like the binary */
static void table_add(Table *t, const char *k, u32 v) {
    u64 i = fnv(k) & t->mask;
    int probes = 0;
    while (t->keys[i]) { i = (i + 1) & t->mask; ++probes; }
    if (probes) ++t->n_collided;
    if (probes > t->max_probe) t->max_probe = probes;
    t->keys[i] = k;
    t->vals[i] = v;
}

static long table_get(const Table *t, const char *k) {
    u64 i = fnv(k) & t->mask;
    while (t->keys[i]) {
        if (!strcmp(t->keys[i], k)) return (long)t->vals[i];
        i = (i + 1) & t->mask;
    }
    return -1;
}

typedef struct {
    char *name;
    u32 len, nbins;
    u64 tot, utot;       /* bin incidences, all / unique-query */
    u32 cov, ucov;       /* distinct covered bins              */
    unsigned char *bits; /* 2 bits per bin: all | uniq<<1      */
} Gen;

static void die_badfile(void) {
    printf("ERROR: Bad input file\n");
    exit(2);
}

int main(int argc, char **argv) {
    printf("This is BURSTcoverage 2 (bcov2) v2.0a\n");
    if (argc < 4) {
        printf("Usage: bcov2 in.aligns.b6 intable.txt output [BINS <X>] "
               "[ID <X>] [UNIQ] [UPROF <file.fasta>]\n");
        return 1;
    }
    /* tail-consumed options: UPROF, SPLIT, UNIQ, ID, BINS (each once) */
    const char *uprof = NULL;
    int uniq = 0, bs = 100, has_cut = 0;
    double cutoff = 0;
    if (argc >= 6 && !strcmp(argv[argc - 2], "UPROF")) {
        uprof = argv[argc - 1];
        argc -= 2;
        printf("Profiling '%s'\n", uprof);
    }
    if (argc >= 5 && !strcmp(argv[argc - 1], "SPLIT")) {
        --argc;
        printf("Doing split by sample (NOT IMPLEMENTED)\n");
    }
    if (argc >= 5 && !strcmp(argv[argc - 1], "UNIQ")) {
        --argc;
        uniq = 1;
        printf("Considering unique queries separately, too.\n");
    }
    if (argc >= 6 && !strcmp(argv[argc - 2], "ID")) {
        cutoff = atof(argv[argc - 1]);
        has_cut = 1;
        argc -= 2;
        printf("Setting identify cutoff = %f\n", cutoff);
    }
    if (argc >= 6 && !strcmp(argv[argc - 2], "BINS")) {
        bs = atoi(argv[argc - 1]);
        argc -= 2;
    }
    int rs = bs;               /* UPROF "read size" = BINS value */
    if (uprof) bs = 1;         /* UPROF is always per-base */
    printf("Setting bin size = %d\n", bs);
    if (bs <= 0) die_badfile();   /* the binary SIGFPEs here */

    /* ---- parse the genome table ---- */
    double t0 = now();
    size_t mn;
    char *map = slurp(argv[2], &mn);
    if (!map) die_badfile();
    u32 ng = 0;
    for (size_t i = 0; i < mn; ++i) ng += map[i] == '\n';
    ng += mn && map[mn - 1] != '\n';
    if (ng >= 16777216) { printf("ERROR: Over 16M genomes not supported\n");
                          return 2; }
    Gen *g = calloc(ng ? ng : 1, sizeof(Gen));
    Table gt = table_new(ng);
    u32 n_gen = 0;
    for (char *p = map; p < map + mn; ) {
        char *e = memchr(p, '\n', (size_t)(map + mn - p));
        if (!e) e = map + mn;
        *e = 0;
        if (e > p) {
            char *tab = strchr(p, '\t');
            if (!tab) die_badfile();  /* the binary bus-errors here */
            *tab = 0;
            Gen *G = &g[n_gen];
            G->name = p;
            G->len = (u32)atoi(tab + 1);
            G->nbins = (u32)(((u64)G->len + bs - 1) / bs);
            G->bits = calloc(G->nbins / 4 + 1, 1);
            table_add(&gt, p, n_gen);
            ++n_gen;
        }
        p = e + 1;
    }
    printf("Max collisions = %d, number terms that collided = %d \n",
           gt.max_probe, gt.n_collided);
    printf("Parsed map. [%f]\n", now() - t0);

    /* ---- parse b6 ---- */
    t0 = now();
    size_t bn;
    char *b6 = slurp(argv[1], &bn);
    if (!b6) { printf("ERROR: Couldn't open b6 '%s'\n", argv[1]);
               return 2; }
    u32 n_lines = 0;
    for (size_t i = 0; i < bn; ++i) n_lines += b6[i] == '\n';
    n_lines += bn && b6[bn - 1] != '\n';
    char **lines = malloc((n_lines ? n_lines : 1) * sizeof(char *));
    u32 nl = 0;
    for (char *p = b6; p < b6 + bn; ) {
        char *e = memchr(p, '\n', (size_t)(b6 + bn - p));
        if (!e) e = b6 + bn;
        *e = 0;
        if (e > p) lines[nl++] = p;
        p = e + 1;
    }
    /* A record is "unique" iff its query name differs from both
       neighbors in the ID-FILTERED record list (b6 groups a query's
       hits on adjacent rows; scattered repeats count as unique), with
       one quirk pinned by a 24-case truth table: the LAST survivor's
       "next" neighbor is the file's raw last record -- a stale
       sentinel left by the binary's in-place filtering -- unless the
       survivor IS that record. */
    unsigned char *pass = malloc(nl ? nl : 1);
    u32 *qlen = malloc((nl ? nl : 1) * 4);
    for (u32 i = 0; i < nl; ++i) {
        char *tab = strchr(lines[i], '\t');
        if (!tab) die_badfile();  /* the binary segfaults here */
        qlen[i] = (u32)(tab - lines[i]);
        pass[i] = 1;
        if (has_cut) {
            char *t2 = strchr(tab + 1, '\t');
            if (!t2) die_badfile();
            pass[i] = atof(t2 + 1) >= cutoff;
        }
    }
    u32 *surv = malloc((nl ? nl : 1) * 4);
    u32 ns = 0;
    for (u32 i = 0; i < nl; ++i)
        if (pass[i]) surv[ns++] = i;
    unsigned char *runiq = calloc(nl ? nl : 1, 1);
    for (u32 j = 0; j < ns; ++j) {
        u32 i = surv[j];
        int same_prev = 0, same_next = 0;
        if (j > 0) {
            u32 p = surv[j - 1];
            same_prev = qlen[i] == qlen[p]
                        && !memcmp(lines[i], lines[p], qlen[i]);
        }
        u32 nx = j + 1 < ns ? surv[j + 1]
               : (i != nl - 1 ? nl - 1 : i);   /* stale sentinel */
        if (nx != i)
            same_next = qlen[i] == qlen[nx]
                        && !memcmp(lines[i], lines[nx], qlen[i]);
        runiq[i] = !same_prev && !same_next;
    }
    free(pass);
    free(surv);
    /* pass 2: coverage marks */
    u64 n_rec = 0;
    for (u32 i = 0; i < nl; ++i) {
        char *f[11];  /* cols 1..10 (0-based 0..9) */
        char *p = lines[i];
        for (int c = 0; c < 10; ++c) {
            f[c] = p;
            char *tab = strchr(p, '\t');
            if (!tab && c < 9) die_badfile();
            if (tab) { *tab = 0; p = tab + 1; } else p += strlen(p);
        }
        if (has_cut && atof(f[2]) < cutoff) continue;
        ++n_rec;
        long gi = table_get(&gt, f[1]);
        if (gi < 0) { printf("ERROR: Genome '%s' not in map.\n", f[1]);
                      return 4; }
        Gen *G = &g[gi];
        if (!G->nbins) continue;
        long s = atol(f[8]), e = atol(f[9]);
        if (s > e) { long t = s; s = e; e = t; }
        /* signed swap, then UNSIGNED bin math: (u32)(coord-1)/bs with
           coord < 1 wraps astronomically; both ends then clamp into
           [0, nbins-1] (a fully-past-the-end record marks the last
           bin once) and the record is dropped iff lo > hi -- pinned
           by single-record probes incl. zero/negative coordinates
           and UPROF position reads */
        u32 lo = (u32)(s - 1) / (u32)bs, hi = (u32)(e - 1) / (u32)bs;
        if (lo >= G->nbins) lo = G->nbins - 1;
        if (hi >= G->nbins) hi = G->nbins - 1;
        if (lo > hi) continue;
        int is_uniq = runiq[i];
        G->tot += (u64)(hi - lo + 1);
        if (is_uniq) G->utot += (u64)(hi - lo + 1);
        for (u32 b = lo; b <= hi; ++b) {
            unsigned char *byte = &G->bits[b / 4];
            int sh = 2 * (b % 4);
            if (!(*byte & (1 << sh))) { *byte |= 1 << sh; ++G->cov; }
            if (is_uniq && !(*byte & (2 << sh)))
                { *byte |= 2 << sh; ++G->ucov; }
        }
    }
    printf("Parsed b6. [%f] (%llu records)\n", now() - t0,
           (unsigned long long)n_rec);

    if (!uprof) {
        t0 = now();
        FILE *out = fopen(argv[3], "wb");
        if (!out) { printf("ERROR: Can't open output '%s'\n", argv[3]);
                    return 2; }
        fputs("#Genome\tTotal_Coverage\tAverage_Coverage\tBins_Covered"
              "\tBinary_Coverage", out);
        if (uniq)
            fputs("\tUniq_Coverage\tUniq_Avg_Coverage\tUniq_Bins_Covered"
                  "\tUniq_Binary_Coverage", out);
        fputc('\n', out);
        for (u32 i = 0; i < n_gen; ++i) {
            Gen *G = &g[i];
            /* 0-bin genomes print "nan" (positive, like the binary;
               a plain 0.0/0.0 would print x86's "-nan") */
            double nb = G->nbins ? (double)G->nbins : (double)NAN;
            double av = (double)G->tot / nb;
            double bc = (double)G->cov / nb;
            char ux[96] = "";
            if (uniq)
                snprintf(ux, sizeof ux, "\t%llu\t%f\t%u\t%f",
                         (unsigned long long)G->utot,
                         (double)G->utot / nb, G->ucov,
                         (double)G->ucov / nb);
            fprintf(out, "%s\t%llu\t%f\t%u\t%f\t%s\n", G->name,
                    (unsigned long long)G->tot, av, G->cov, bc, ux);
        }
        fclose(out);
        printf("Printed file. [%f]\n", now() - t0);
        return 0;
    }

    /* ---- UPROF: write per-genome unique-coverage segments ---- */
    t0 = now();
    FILE *out = fopen(argv[3], "wb");
    if (!out) { printf("ERROR: Can't open output '%s'\n", argv[3]);
                return 2; }
    size_t fa_n;
    char *fa = slurp(uprof, &fa_n);
    if (!fa) { printf("ERROR: Can't open fasta '%s'\n", uprof);
               return 2; }
    u32 stretch = rs > 0 ? 3u * (u32)(rs - 1) : 0;
    printf("Creating unique genomes with read size %u (stretch = %u)\n",
           (u32)rs, stretch);
    int idx = 0;
    for (char *p = fa; p < fa + fa_n; ) {
        char *e = memchr(p, '\n', (size_t)(fa + fa_n - p));
        if (!e) e = fa + fa_n;
        *e = 0;
        if (e == p) { p = e + 1; continue; }
        char *seq = e + 1;
        char *se = seq < fa + fa_n
                 ? memchr(seq, '\n', (size_t)(fa + fa_n - seq)) : NULL;
        if (p[0] != '>' || seq >= fa + fa_n) {
            fprintf(stderr, "ERROR: Malformatted profiling fasta\n");
            return 2;   /* strict 2-line records, like the binary */
        }
        if (!se) se = fa + fa_n;
        *se = 0;
        long gi = table_get(&gt, p + 1);
        if (gi < 0) { printf("ERROR: Genome '%s' not in map.\n", p + 1);
                      return 4; }
        Gen *G = &g[gi];
        u32 slen = (u32)(se - seq);
        fprintf(out, ">%s\n", p + 1);
        /* every uncovered base closes the current run (plus one final
           close at the end); runs of length >= stretch are emitted,
           "NNNNN"-separated -- with stretch 0 each close emits an
           empty segment, so an uncovered L-base genome prints L*5 Ns
           and counts L+1 segments, like the binary */
        u32 nseg = 0, run = 0, r0 = 0;
        for (u32 b = 0; b <= G->nbins; ++b) {          /* bs == 1 */
            if (b < G->nbins
                && (G->bits[b / 4] & (2 << (2 * (b % 4))))) {
                if (!run) r0 = b;
                ++run;
                continue;
            }
            if (run >= stretch) {
                if (nseg) fputs("NNNNN", out);
                u32 w = r0 < slen ? (run < slen - r0 ? run : slen - r0)
                                  : 0;
                fwrite(seq + r0, 1, w, out);
                ++nseg;
            }
            run = 0;
        }
        fputc('\n', out);
        ++idx;
        printf("[%d] Genome '%s': %u unique segments\n", idx, p + 1, nseg);
        p = se + 1;
    }
    fclose(out);
    printf("Wrote %d unique genomes [%f]\n", idx, now() - t0);
    return 0;
}
