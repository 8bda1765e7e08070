/* ripinsd: extract FASTA + taxonomy from NCBI INSDSeq/GBSeq XML.
 * Fresh implementation of the reference tool's behavior
 * (/root/reference/embalmlets/get_taxonomy_ripINSD.c): per record,
 * the primary accession, organism, taxonomy and sequence (uppercased)
 * are pulled from their GBSeq_* tags in order. Records are dropped
 * when the taxonomy has fewer than `minlev` ';' separators, or (with
 * noSp) when the binomial ends in "sp." or " bacterium". The organism
 * is split after its 2nd space (skipping "Candidatus ") into
 * "Genus species" + remainder; `cutlast` suppresses the remainder.
 *
 * Usage: ripinsd in.xml out.fasta out.tax [minlev] [cutlast] [noSp.]
 */
#define _FILE_OFFSET_BITS 64
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static char *slurp(FILE *f, size_t *sz) {
    size_t cap = 1 << 20, n = 0;
    char *buf = malloc(cap);
    size_t got;
    while ((got = fread(buf + n, 1, cap - n - 1, f)) > 0) {
        n += got;
        if (n + 1 >= cap) buf = realloc(buf, cap <<= 1);
    }
    buf[n] = 0;
    *sz = n;
    return buf;
}

static char *tagval(char **p, const char *tag, char *dst, size_t cap) {
    char *f = strstr(*p, tag);
    if (!f) return NULL;
    f += strlen(tag);
    char *e = f;
    while (*e && *e != '<') ++e;
    size_t n = (size_t)(e - f);
    if (n >= cap) n = cap - 1;
    memcpy(dst, f, n);
    dst[n] = 0;
    *p = e;
    return dst;
}

int main(int argc, char *argv[]) {
    if (argc < 4 || argc > 7) {
        puts("Usage: ripinsd in.xml out.fasta out.tax "
             "[minlev] [cutlast] [noSp.]");
        return 1;
    }
    FILE *in = fopen(argv[1], "rb"), *out = fopen(argv[2], "wb"),
         *tax = fopen(argv[3], "wb");
    int minlev = argc > 4 ? atoi(argv[4]) : 0;
    int cutlast = argc > 5 ? atoi(argv[5]) : 0;
    int noSp = argc > 6 ? atoi(argv[6]) : 0;
    if (!in || !out || !tax) { fputs("I/O error\n", stderr); return 2; }
    size_t sz;
    char *xml = slurp(in, &sz);
    fclose(in);
    char *acc = malloc(1 << 16), *name = malloc(1 << 16),
         *lin = malloc(1 << 20), *seq = malloc(sz + 1);
    char *p = xml;
    size_t ns = 0;
    for (;; ++ns) {
        if (!tagval(&p, "<GBSeq_primary-accession>", acc, 1 << 16)) {
            printf("Exiting. Parsed %zu records.\n", ns);
            break;
        }
        if (!tagval(&p, "<GBSeq_organism>", name, 1 << 16) ||
            !tagval(&p, "<GBSeq_taxonomy>", lin, 1 << 20) ||
            !tagval(&p, "<GBSeq_sequence>", seq, sz + 1)) {
            fprintf(stderr, "ERROR: incomplete record %zu.\n", ns + 1);
            return 2;
        }
        /* split organism after 2nd space, skipping "Candidatus " */
        char *start = strstr(name, "Candidatus ");
        start = start ? start + 11 : name;
        int spaces = 0, semis = 0;
        size_t s = strlen(name);
        for (char *sp = start; *sp; ++sp)
            if (*sp == ' ' && ++spaces == 2) {
                *sp = 0;
                s = (size_t)(sp - name);
                break;
            }
        for (char *sp = lin; *sp; ++sp) semis += *sp == ';';
        int is_sp = s >= 3 && name[s - 1] == '.' && name[s - 2] == 'p' &&
                    name[s - 3] == 's';
        int is_bact = s >= 10 && !strcmp(name + s - 10, " bacterium");
        if (semis < minlev || (noSp && (is_sp || is_bact))) {
            printf("WARNING: '%s' omitted (%s)\n", acc, name);
            --ns;
            continue;
        }
        if (spaces >= 2 && !cutlast)
            fprintf(tax, "%s\t%s; %s; %s\n", acc, lin, name,
                    name + s + 1);
        else
            fprintf(tax, "%s\t%s; %s\n", acc, lin, name);
        for (char *sp = seq; *sp; ++sp)
            if (*sp > 96) *sp -= 32;
        fprintf(out, ">%s\n%s\n", acc, seq);
    }
    fclose(out);
    fclose(tax);
    return 0;
}
