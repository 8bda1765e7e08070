/* a2gg_make: accession->taxonomy mapping database builder.
 *
 * Native rebuild of /root/reference/embalmlets/a2gg_make.c producing
 * the same binary format (version byte -1, charsInAcc/charsInGG/nm/nl
 * u64 header, NUL-separated sorted accessions, u32 gg line indices,
 * "UNKNOWN" + NUL-separated gg strings) so databases interoperate with
 * a2gg_parse from either toolchain.
 *
 * Usage: a2gg_make in.tid2gg in.acc2tid out.acc2gg [threads]
 *   in.acc2tid: NCBI accession2taxid (header line skipped; accession,
 *   then taxid in the 3rd column).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

typedef struct { char *key; uint32_t val; } Pair;

static int pair_cmp(const void *a, const void *b) {
    return strcmp(((const Pair *)a)->key, ((const Pair *)b)->key);
}

int main(int argc, char *argv[]) {
    if (argc < 4) {
        puts("Usage: a2gg_make in.tid2gg in.acc2tid out.acc2gg [threads]");
        return 1;
    }
    FILE *gg = fopen(argv[1], "rb"), *map = fopen(argv[2], "rb"),
         *out = fopen(argv[3], "wb");
    if (!gg || !map || !out) { puts("Can't open file(s)"); return 1; }

    size_t lnsz = 1 << 24;
    char *line = malloc(lnsz);

    /* accession -> tid pairs */
    uint64_t nm = 0, cap = 1024;
    Pair *acc = malloc(cap * sizeof(*acc));
    if (!fgets(line, lnsz, map)) { puts("Empty map"); return 1; }
    while (fgets(line, lnsz, map)) {
        char *end = strchr(line, '\t');
        if (!end) { printf("Error on map line %llu\n",
                           (unsigned long long)nm + 1); break; }
        if (nm == cap) acc = realloc(acc, (cap *= 2) * sizeof(*acc));
        acc[nm].key = malloc(end - line + 1);
        memcpy(acc[nm].key, line, end - line);
        acc[nm].key[end - line] = 0;
        char *third = strchr(end + 1, '\t');
        acc[nm].val = third ? (uint32_t)atol(third) : 0;
        ++nm;
    }
    printf("Parsed %llu accessions.\n", (unsigned long long)nm);
    qsort(acc, nm, sizeof(*acc), pair_cmp);

    /* tid -> gg-string lines */
    uint64_t nl = 0, gcap = 1024, highest = 0;
    Pair *ggs = malloc(gcap * sizeof(*ggs));
    while (fgets(line, lnsz, gg)) {
        uint32_t tid = (uint32_t)atol(line);
        char *begin = strchr(line, '\t');
        if (!begin) { printf("Error on gg line %llu\n",
                             (unsigned long long)nl + 1); break; }
        ++begin;
        char *end = strchr(begin, '\n');
        if (!end) break;
        if (nl == gcap) ggs = realloc(ggs, (gcap *= 2) * sizeof(*ggs));
        ggs[nl].val = tid;
        ggs[nl].key = malloc(end - begin + 1);
        memcpy(ggs[nl].key, begin, end - begin);
        ggs[nl].key[end - begin] = 0;
        if (tid > highest) highest = tid;
        ++nl;
    }
    printf("Parsed %llu tids [highest %llu]\n",
           (unsigned long long)nl, (unsigned long long)highest);
    uint32_t *rev = calloc(highest + 1, sizeof(*rev));
    for (uint64_t i = 0; i < nl; ++i) rev[ggs[i].val] = (uint32_t)i + 1;
    ++nl;                                 /* slot 0 = UNKNOWN */

    /* write database (identical layout to the reference tool) */
    puts("\nCreating output files...");
    uint64_t chars_acc = 0, chars_gg = 0;
    fputc(-1, out);                        /* version */
    fwrite(&chars_acc, 8, 1, out);         /* patched below */
    fwrite(&chars_gg, 8, 1, out);
    fwrite(&nm, 8, 1, out);
    fwrite(&nl, 8, 1, out);
    for (uint64_t i = 0; i < nm; ++i)
        chars_acc += fprintf(out, "%s", acc[i].key) + 1, fputc(0, out);
    for (uint64_t i = 0; i < nm; ++i) {
        uint32_t ix = acc[i].val <= highest ? rev[acc[i].val] : 0;
        fwrite(&ix, 4, 1, out);
    }
    chars_gg += fprintf(out, "UNKNOWN") + 1, fputc(0, out);
    for (uint64_t i = 0; i + 1 < nl; ++i)
        chars_gg += fprintf(out, "%s", ggs[i].key) + 1, fputc(0, out);
    rewind(out);
    fputc(-1, out);
    fwrite(&chars_acc, 8, 1, out);
    fwrite(&chars_gg, 8, 1, out);
    printf("Database written! [nm %llu, nl %llu, ACC %llu, GG %llu]\n",
           (unsigned long long)nm, (unsigned long long)nl,
           (unsigned long long)chars_acc, (unsigned long long)chars_gg);
    return 0;
}
