/* bcov: per-reference coverage (total and unique) from blast6 alignments.
 *
 * Native rebuild of /root/reference/embalmlets/bcov.c with the same
 * four outputs (<prefix>{shared,unique,shared_binary,unique_binary}.txt):
 * per reference (in lexicographic order, zero-coverage refs skipped),
 * mean per-base depth, sign-flipped when the mean does not exceed
 * vf * stddev (the reference's noise heuristic), and binary
 * breadth-of-coverage fraction; optional per-sample columns (SPLIT,
 * samples = query prefixes before '_'), interval padding (PAD <X>).
 * "Unique" counts a hit only when both the previous and next b6 line
 * belong to a different query (i.e. the query has exactly one hit).
 *
 * Usage: bcov in.b6 in.table.txt OUT_PREFIX [<VAR>] [PAD <X>] [SPLIT]
 *   in.table.txt: "<refname>\t<length>" per line.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <math.h>

typedef struct { char *name; uint32_t len, *cov, *ucov; } Ref;

static int ref_cmp(const void *a, const void *b) {
    return strcmp(((const Ref *)a)->name, ((const Ref *)b)->name);
}

static Ref *ref_find(Ref *refs, long n, const char *key, size_t klen) {
    long lo = 0, hi = n - 1;
    while (lo <= hi) {
        long mid = (lo + hi) / 2;
        int c = strncmp(key, refs[mid].name, klen);
        if (!c && refs[mid].name[klen]) c = -1;
        if (!c) return refs + mid;
        if (c < 0) hi = mid - 1; else lo = mid + 1;
    }
    return 0;
}

typedef struct samp {
    char *name;
    uint64_t id;
    struct samp *lo, *hi;
} Samp;

static Samp *samp_get(Samp **root, const char *s, size_t l, uint64_t *n) {
    while (*root) {
        int c = strncmp(s, (*root)->name, l);
        if (!c && (*root)->name[l]) c = -1;
        if (!c) return *root;
        root = c > 0 ? &(*root)->hi : &(*root)->lo;
    }
    Samp *t = calloc(1, sizeof(Samp));
    t->name = malloc(l + 1);
    memcpy(t->name, s, l);
    t->name[l] = 0;
    t->id = (*n)++;
    *root = t;
    return t;
}

static void samp_collect(Samp *t, char **names) {
    if (!t) return;
    names[t->id] = t->name;
    samp_collect(t->lo, names);
    samp_collect(t->hi, names);
}

static void stats(const uint32_t *v, uint32_t L, double vf,
                  double *signed_mean, double *bfrac) {
    uint64_t tot = 0;
    uint32_t btot = 0;
    for (uint32_t k = 0; k < L; ++k) tot += v[k], btot += v[k] != 0;
    double mean = (double)tot / L, ssd = 0;
    for (uint32_t k = 0; k < L; ++k) {
        double d = (double)v[k] - mean;
        ssd += d * d;
    }
    *bfrac = (double)btot / L;
    *signed_mean = L > 1 && mean <= sqrt(vf * ssd / (L - 1)) ? -mean : mean;
}

int main(int argc, char *argv[]) {
    puts("bcov: blast6 coverage tables (burst_tpu tools)");
    if (argc < 4) {
        puts("Usage: bcov in.b6 in.table.txt OUT_PREFIX [<VAR>] [PAD <X>] "
             "[SPLIT]");
        return 1;
    }
    int do_samp = 0;
    long pad = 0;
    double vf = 1.0;
    if (argc > 4 && !strcmp(argv[argc - 1], "SPLIT")) --argc, do_samp = 1;
    if (argc > 5 && !strcmp(argv[argc - 2], "PAD"))
        pad = atol(argv[argc - 1]), argc -= 2, printf("Padding %ld bp\n", pad);
    if (argc > 4) vf = atof(argv[argc - 1]);

    FILE *map = fopen(argv[2], "rb");
    FILE *b6 = fopen(argv[1], "rb");
    char fn[4096];
    snprintf(fn, sizeof fn, "%sshared.txt", argv[3]);
    FILE *outs = fopen(fn, "wb");
    snprintf(fn, sizeof fn, "%sunique.txt", argv[3]);
    FILE *outu = fopen(fn, "wb");
    snprintf(fn, sizeof fn, "%sshared_binary.txt", argv[3]);
    FILE *outbs = fopen(fn, "wb");
    snprintf(fn, sizeof fn, "%sunique_binary.txt", argv[3]);
    FILE *outbu = fopen(fn, "wb");
    if (!map || !b6 || !outs || !outu || !outbs || !outbu) {
        puts("I/O ERROR. Check filenames.");
        return 2;
    }

    long n_refs = 0, cap = 1024;
    Ref *refs = malloc(cap * sizeof(*refs));
    char *line = malloc(1 << 20);
    while (fgets(line, 1 << 20, map)) {
        char *tab = strchr(line, '\t');
        if (!tab) { printf("ERROR: map [%ld]\n", n_refs + 1); return 1; }
        if (n_refs == cap) refs = realloc(refs, (cap *= 2) * sizeof(*refs));
        refs[n_refs].name = malloc(tab - line + 1);
        memcpy(refs[n_refs].name, line, tab - line);
        refs[n_refs].name[tab - line] = 0;
        refs[n_refs].len = (uint32_t)atol(tab + 1);
        ++n_refs;
    }
    printf("Parsed %ld records in map\n", n_refs);
    qsort(refs, n_refs, sizeof(*refs), ref_cmp);
    for (long i = 0; i < n_refs; ++i) {
        refs[i].cov = calloc(refs[i].len + 1, sizeof(uint32_t));
        refs[i].ucov = calloc(refs[i].len + 1, sizeof(uint32_t));
    }

    /* per-sample coverage grids, allocated lazily */
    Samp *samp_root = 0;
    uint64_t n_samp = 0;
    uint32_t ***scov = 0, ***sucov = 0;
    uint64_t scap = 0;

    char *prev_q = malloc(1 << 16);
    char *cur_q = malloc(1 << 16);
    prev_q[0] = cur_q[0] = 0;
    
    /* one-line lookahead to decide uniqueness of the current line */
    char *cur = malloc(1 << 20), *lookahead = malloc(1 << 20);
    int have = fgets(cur, 1 << 20, b6) != 0;
    while (have) {
        int has_next = fgets(lookahead, 1 << 20, b6) != 0;
        /* parse: q, r, cols 9/10 (1-based start/end) */
        char *q0 = cur, *qe = strchr(q0, '\t');
        if (!qe) break;
        char *r0 = qe + 1, *re = strchr(r0, '\t');
        if (!re) break;
        char *p = re + 1;
        for (int tab = 2; tab < 8 && p; ++tab) p = strchr(p, '\t') + 1;
        long rs = p ? atol(p) : 0;
        p = p ? strchr(p, '\t') + 1 : 0;
        long rend = p ? atol(p) : 0;
        int next_same = 0;
        if (has_next) {
            size_t qln = qe - q0;
            next_same = !strncmp(lookahead, q0, qln) &&
                lookahead[qln] == '\t';
        }
        size_t ql = qe - q0;
        int same_as_prev = !strncmp(prev_q, q0, ql) && !prev_q[ql];
        /* a hit is "unique" iff its query matches neither neighbor,
         * i.e. the query aligned exactly once (burst.c bcov uprv/unex) */
        int unique = !same_as_prev && !next_same;

        Ref *m = ref_find(refs, n_refs, r0, re - r0);
        if (!m) {
            fprintf(stderr, "WARNING: couldn't find ref: %.*s\n",
                    (int)(re - r0), r0);
        } else {
            /* note: RC hits (start > end) cover nothing, as in the
             * reference -- coordinates are not swapped */
            long a = rs - 1 - pad, b = rend - 1 + pad;
            if (a < 0) a = 0;
            if (b >= (long)m->len) b = m->len;
            for (long s = a; s < b; ++s) ++m->cov[s];
            if (unique)
                for (long s = a; s < b; ++s) ++m->ucov[s];
            if (do_samp) {
                char *us = memchr(q0, '_', qe - q0);
                if (us) {
                    Samp *sn = samp_get(&samp_root, q0, us - q0, &n_samp);
                    if (n_samp > scap) {
                        uint64_t nc = scap ? scap * 2 : 8;
                        while (nc < n_samp) nc *= 2;
                        scov = realloc(scov, nc * sizeof(*scov));
                        sucov = realloc(sucov, nc * sizeof(*sucov));
                        memset(scov + scap, 0,
                               (nc - scap) * sizeof(*scov));
                        memset(sucov + scap, 0,
                               (nc - scap) * sizeof(*sucov));
                        scap = nc;
                    }
                    if (!scov[sn->id]) {
                        scov[sn->id] = calloc(n_refs, sizeof(uint32_t *));
                        sucov[sn->id] = calloc(n_refs, sizeof(uint32_t *));
                    }
                    long ri = m - refs;
                    if (!scov[sn->id][ri]) {
                        scov[sn->id][ri] =
                            calloc(m->len + 1, sizeof(uint32_t));
                        sucov[sn->id][ri] =
                            calloc(m->len + 1, sizeof(uint32_t));
                    }
                    for (long s = a; s < b; ++s) ++scov[sn->id][ri][s];
                    if (unique)
                        for (long s = a; s < b; ++s) ++sucov[sn->id][ri][s];
                }
            }
        }
        memcpy(prev_q, q0, ql);
        prev_q[ql] = 0;
        
        char *t = cur; cur = lookahead; lookahead = t;
        have = has_next;
    }

    char **samp_names = malloc((n_samp ? n_samp : 1) * sizeof(char *));
    samp_collect(samp_root, samp_names);
    if (do_samp) printf("%llu samples found.\n",
                        (unsigned long long)n_samp);

    FILE *outs4[4] = {outs, outu, outbs, outbu};
    for (int f = 0; f < 4; ++f) {
        fprintf(outs4[f], "#Coverage\tDataset");
        for (uint64_t j = 0; j < n_samp; ++j)
            fprintf(outs4[f], "\t%s", samp_names[j]);
        fputc('\n', outs4[f]);
    }
    for (long i = 0; i < n_refs; ++i) {
        uint64_t tot = 0;
        for (uint32_t k = 0; k < refs[i].len; ++k) tot += refs[i].cov[k];
        if (!tot) continue;
        double sm, bf;
        for (int f = 0; f < 4; ++f) fputs(refs[i].name, outs4[f]);
        stats(refs[i].cov, refs[i].len, vf, &sm, &bf);
        fprintf(outs, "\t%.4f", sm);
        fprintf(outbs, "\t%.4f", bf);
        stats(refs[i].ucov, refs[i].len, vf, &sm, &bf);
        fprintf(outu, "\t%.4f", sm);
        fprintf(outbu, "\t%.4f", bf);
        for (uint64_t j = 0; j < n_samp; ++j) {
            static uint32_t zero1[1] = {0};
            const uint32_t *c = scov && scov[j] && scov[j][i]
                ? scov[j][i] : zero1;
            const uint32_t *u = sucov && sucov[j] && sucov[j][i]
                ? sucov[j][i] : zero1;
            uint32_t L = c == zero1 ? 1 : refs[i].len;
            stats(c, L, vf, &sm, &bf);
            fprintf(outs, "\t%.4f", sm);
            fprintf(outbs, "\t%.4f", bf);
            uint32_t Lu = u == zero1 ? 1 : refs[i].len;
            stats(u, Lu, vf, &sm, &bf);
            fprintf(outu, "\t%.4f", sm);
            fprintf(outbu, "\t%.4f", bf);
        }
        for (int f = 0; f < 4; ++f) fputc('\n', outs4[f]);
    }
    return 0;
}
