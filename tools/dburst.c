/* dburst: database prep helper — emit a "<name>\t<length>" table for a
 * linearized FASTA, optionally restricted to (and ordered by) a keep
 * list, writing the kept records to a filtered FASTA.
 *
 * Clean-room reimplementation of the reference's binary-only
 * embalmlets/bin/dburst (v0.91, no source ships); the contract below
 * was established by black-box probing and the byte output matches on
 * well-formed inputs (tests/test_tools.py):
 *   - dburst in.lin.fasta out.table.txt
 *       one "<name>\t<len>" row per record in file order
 *   - dburst in.lin.fasta in.map.txt out.table.txt out.filt.fasta
 *       rows in MAP order; map column 1 is the record name; names not
 *       in the FASTA are skipped; kept records are echoed verbatim
 *   - in table-only mode the row is the full header and the sequence
 *     length; in keep-list mode the row is the map key and the
 *     record's non-newline bytes past the key (so a tab in a header
 *     pushes its remainder into the length, as the original does)
 *   - banner/progress lines go to stdout; bad argc exits 1 with usage,
 *     unopenable files exit 2, a header with no sequence line exits 1
 *   - a non-header line where a header is expected stops the scan with
 *     "WARNING: Questionable fasta formatting" (table keeps the rows
 *     seen so far)
 * Divergence from the binary, deliberately: an empty input file is
 * reported as malformatted rather than crashing, and map lookups are
 * exact-match (the binary's prefix-matching on map names with trailing
 * junk reads out of bounds and prints wrapped 64-bit lengths).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static char *slurp(FILE *fp, size_t *n) {
    size_t cap = 1 << 20, len = 0;
    char *b = malloc(cap);
    if (!b) exit(3);
    for (;;) {
        size_t got = fread(b + len, 1, cap - len, fp);
        len += got;
        if (len < cap) break;
        cap <<= 1;
        b = realloc(b, cap);
        if (!b) exit(3);
    }
    b = realloc(b, len + 1);
    b[len] = 0;
    *n = len;
    return b;
}

/* split buffer into lines in place; returns count */
static size_t lineify(char *buf, size_t n, char ***out) {
    size_t cap = 4096, cnt = 0;
    char **L = malloc(cap * sizeof *L);
    if (!L) exit(3);
    char *p = buf, *end = buf + n;
    while (p < end) {
        if (cnt == cap) {
            cap <<= 1;
            L = realloc(L, cap * sizeof *L);
            if (!L) exit(3);
        }
        L[cnt++] = p;
        char *nl = memchr(p, '\n', (size_t)(end - p));
        if (!nl) break;
        *nl = 0;
        p = nl + 1;
    }
    *out = L;
    return cnt;
}

/* record name ends at the first tab; its length contribution is every
 * byte of the record after that point (header residue + sequence) */
static size_t name_len(const char *hdr) {
    const char *t = strchr(hdr, '\t');
    return t ? (size_t)(t - hdr) : strlen(hdr);
}

typedef struct { char **hdr; char **seq; size_t n; } Recs;

static long find_rec(const Recs *r, const char *key, size_t klen) {
    for (size_t i = 0; i < r->n; ++i) {
        const char *h = r->hdr[i] + 1;
        if (name_len(h) == klen && !memcmp(h, key, klen))
            return (long)i;
    }
    return -1;
}

int main(int argc, char **argv) {
    puts("This is DataBurst (dburst) v0.91");
    if (argc != 3 && argc != 5) {
        puts("Usage: dburst in.lin.fasta [in.map.txt] out.table.txt "
             "[out.filt.fasta]");
        return 1;
    }
    const char *in_fa = argv[1];
    const char *in_map = argc == 5 ? argv[2] : NULL;
    const char *out_tab = argc == 5 ? argv[3] : argv[2];
    const char *out_fa = argc == 5 ? argv[4] : NULL;

    FILE *fi = fopen(in_fa, "rb");
    FILE *fm = in_map ? fopen(in_map, "rb") : NULL;
    FILE *ft = fopen(out_tab, "wb");
    FILE *ff = out_fa ? fopen(out_fa, "wb") : NULL;
    if (!fi || !ft || (in_map && !fm) || (out_fa && !ff)) {
        puts("I/O ERROR. Check filenames.");
        return 2;
    }

    size_t fa_n;
    char *fa = slurp(fi, &fa_n);
    fclose(fi);
    char **line;
    size_t nl = lineify(fa, fa_n, &line);
    if (!nl) {
        puts("ERROR: malformatted input fasta.");
        return 1;
    }

    if (!in_map) {                     /* table of everything, file order */
        unsigned long considered = 0;
        int warn = 0;
        for (size_t i = 0; i < nl; i += 2) {
            if (line[i][0] != '>') { warn = 1; break; }
            if (i + 1 >= nl) {
                puts("ERROR: malformatted input fasta.");
                return 1;
            }
            fprintf(ft, "%s\t%lu\n", line[i] + 1,
                    (unsigned long)strlen(line[i + 1]));
            ++considered;
        }
        printf("Considered %lu records\n", considered);
        if (warn) puts("WARNING: Questionable fasta formatting");
        puts("Done.");
        fclose(ft);
        return 0;
    }

    /* keep-list mode: index headers, then walk the map */
    Recs r = { malloc(nl * sizeof(char *)), malloc(nl * sizeof(char *)), 0 };
    if (!r.hdr || !r.seq) exit(3);
    static char empty[1];
    for (size_t i = 0; i < nl; ++i) {
        if (line[i][0] != '>') continue;
        r.hdr[r.n] = line[i];
        r.seq[r.n] = (i + 1 < nl && line[i + 1][0] != '>') ? line[i + 1]
                                                           : empty;
        ++r.n;
    }
    printf("There were %lu records in the fasta.\n", (unsigned long)r.n);

    size_t map_n;
    char *mp = slurp(fm, &map_n);
    fclose(fm);
    char **mline;
    size_t mnl = lineify(mp, map_n, &mline);
    unsigned long considered = 0, written = 0, skipped = 0;
    for (size_t i = 0; i < mnl; ++i) {
        ++considered;
        size_t klen = name_len(mline[i]);
        long at = klen ? find_rec(&r, mline[i], klen) : -1;
        if (at < 0) { ++skipped; continue; }
        /* the length charges any post-name header residue (text after
         * a tab) to the record, on top of the sequence itself */
        const char *h = r.hdr[at] + 1;
        size_t len = strlen(h) - klen + strlen(r.seq[at]);
        fprintf(ft, "%.*s\t%lu\n", (int)klen, mline[i],
                (unsigned long)len);
        fprintf(ff, "%s\n%s\n", r.hdr[at], r.seq[at]);
        ++written;
    }
    printf("Considered %lu records (%lu written, %lu skipped)\n",
           considered, written, skipped);
    puts("Done.");
    fclose(ft);
    fclose(ff);
    return 0;
}
