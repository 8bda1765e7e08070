/* a2gg_parse: annotate FASTA headers with taxonomy from an a2gg mapDB.
 *
 * Native rebuild of /root/reference/embalmlets/a2gg_parse.c: reads the
 * binary mapDB produced by a2gg_make (either toolchain), extracts the
 * accession between the start delimiter (default '>') and end delimiter
 * (default newline) of each header, and writes <prefix>.fna (the FASTA,
 * headers optionally truncated at the delimiter) plus <prefix>.tax
 * ("<name>\t<taxonomy>" rows). GUESS keeps going on unmapped
 * accessions (reusing the previous taxon); FULL keeps whole headers.
 *
 * Usage: a2gg_parse in.fasta in.mapDB outPrefix [d] [e] [FULL] [GUESS]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

static int64_t dict_find(char **dict, uint64_t n, const char *key) {
    int64_t lo = 0, hi = (int64_t)n - 1;
    while (lo <= hi) {
        int64_t mid = (lo + hi) / 2;
        int c = strcmp(key, dict[mid]);
        if (!c) return mid;
        if (c < 0) hi = mid - 1; else lo = mid + 1;
    }
    return -1;
}

int main(int argc, char *argv[]) {
    if (argc < 4) {
        puts("Usage: a2gg_parse in.fasta in.mapDB outPrefix [d] [e] "
             "[FULL] [GUESS]");
        return 1;
    }
    FILE *in = fopen(argv[1], "rb"), *map = fopen(argv[2], "rb");
    char fn[4096];
    snprintf(fn, sizeof fn, "%s.fna", argv[3]);
    FILE *out_f = fopen(fn, "wb");
    snprintf(fn, sizeof fn, "%s.tax", argv[3]);
    FILE *out_t = fopen(fn, "wb");
    if (!in || !map || !out_f || !out_t) { puts("Can't open file(s)");
                                           return 1; }
    int guess = !strcmp(argv[argc - 1], "GUESS");
    argc -= guess != 0;
    int full = !strcmp(argv[argc - 1], "FULL");
    argc -= full != 0;
    char beg_d = argc >= 5 ? *argv[4] : '>',
         end_d = argc >= 6 ? *argv[5] : '\n';
    printf("Starting after char: '%c', ending at: '%c'\n", beg_d, end_d);

    if ((char)fgetc(map) != (char)-1) {
        fputs("ERROR: Incompatible DB. Use a2gg_make\n", stderr);
        return 2;
    }
    uint64_t chars_acc, chars_gg, nm, nl;
    if (fread(&chars_acc, 8, 1, map) != 1 ||
        fread(&chars_gg, 8, 1, map) != 1 ||
        fread(&nm, 8, 1, map) != 1 || fread(&nl, 8, 1, map) != 1) {
        fputs("ERR:header\n", stderr);
        return 2;
    }
    printf("--> MapDB: nm %llu, nl %llu, ACC %llu, GG %llu\n",
           (unsigned long long)nm, (unsigned long long)nl,
           (unsigned long long)chars_acc, (unsigned long long)chars_gg);
    char *acc_dump = malloc(chars_acc), *gg_dump = malloc(chars_gg);
    char **acc = malloc(nm * sizeof(*acc)), **ggd = malloc(nl * sizeof(*ggd));
    uint32_t *acc_ln = malloc(nm * 4);
    if (!acc_dump || !gg_dump || !acc || !ggd || !acc_ln) {
        fputs("ERROR: Out of memory\n", stderr);
        return 3;
    }
    if (fread(acc_dump, 1, chars_acc, map) != chars_acc ||
        fread(acc_ln, 4, nm, map) != nm ||
        fread(gg_dump, 1, chars_gg, map) != chars_gg) {
        fputs("ERR:payload\n", stderr);
        return 2;
    }
    char *p = acc_dump;
    for (uint64_t i = 0; i < nm; ++i) { acc[i] = p; p += strlen(p) + 1; }
    p = gg_dump;
    for (uint64_t i = 0; i < nl; ++i) { ggd[i] = p; p += strlen(p) + 1; }
    puts("--> MapDB: All data read successfully.");

    printf("\nCreating output files...\n");
    size_t lnsz = 1 << 24;
    char *line = malloc(lnsz);
    const char *taxon = "UNKNOWN";
    uint64_t lnno = 0;
    while (++lnno, fgets(line, lnsz, in)) {
        char *begin = strchr(line, beg_d);
        if (!begin) {
            if (*line == '>') {
                printf("Ln %llu: *DELIM* not found\n",
                       (unsigned long long)lnno);
                if (!fgets(line, lnsz, in)) break;
                continue;
            }
            printf("End of fasta reached (ln %llu)\n",
                   (unsigned long long)lnno);
            break;
        }
        ++begin;
        char *end = strchr(begin, end_d);
        if (!end) {
            printf("Ln %llu: *END* not found\n", (unsigned long long)lnno);
            if (!fgets(line, lnsz, in)) break;
            continue;
        }
        *end = 0;
        int64_t ix = dict_find(acc, nm, begin);
        const char *found = ix >= 0 && acc_ln[ix] < nl
            ? ggd[acc_ln[ix]] : 0;
        if (!found && !guess) {
            printf("Ln %llu: '%s' *TAXON* not found\n",
                   (unsigned long long)lnno, begin);
            if (!fgets(line, lnsz, in)) break;
            continue;
        }
        if (found) taxon = found;
        else printf("Ln %llu: '%s' *TAXON* interpolation: %s\n",
                    (unsigned long long)lnno, begin, taxon);
        if (full) {
            if (end_d != '\n') {
                char *nlp = strchr(end + 1, '\n');
                if (nlp) *nlp = 0;
                fprintf(out_t, "%s%c%s\t%s\n", line + 1, end_d, end + 1,
                        taxon);
                fprintf(out_f, "%s%c%s\n", line, end_d, end + 1);
            } else {
                fprintf(out_t, "%s\t%s\n", line + 1, taxon);
                fprintf(out_f, "%s\n", line);
            }
        } else {
            fprintf(out_t, "%s\t%s\n", begin, taxon);
            if (end_d != '\n') fprintf(out_f, "%s\n", line);
            else fprintf(out_f, "%s\n", line);
        }
        if (!fgets(line, lnsz, in)) break;       /* sequence line */
        fputs(line, out_f);
    }
    return 0;
}
