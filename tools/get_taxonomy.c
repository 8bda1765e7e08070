/* get_taxonomy: scrape accession -> taxonomy strings from GenBank
 * flat files (.gbff) in a directory.
 * Fresh implementation of the reference tool's behavior
 * (/root/reference/embalmlets/get_taxonomy.c): per record, the
 * accession (VERSION line, up to the dot), the ORGANISM name
 * (continuation lines without ';' are part of a multi-line name), and
 * the indented lineage lines up to the REFERENCE/COMMENT section.
 * Output row: ACC \t lineage-lines-joined-by-space with the trailing
 * '.' turned into ';', then " Genus species; rest" when the organism
 * name has 3+ words (the split skips a leading "Candidatus "), else
 * " Name".
 *
 * Usage: gettax indir outfile.txt
 */
#define _FILE_OFFSET_BITS 64
#include <dirent.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static char *slurp(const char *path, size_t *sz) {
    FILE *f = fopen(path, "rb");
    if (!f) return NULL;
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    rewind(f);
    char *buf = malloc((size_t)n + 1);
    if (!buf || fread(buf, 1, (size_t)n, f) != (size_t)n) {
        fclose(f);
        free(buf);
        return NULL;
    }
    fclose(f);
    buf[n] = 0;
    *sz = (size_t)n;
    return buf;
}

int main(int argc, char *argv[]) {
    if (argc != 3) { puts("Usage: gettax indir outfile.txt"); return 1; }
    DIR *dir = opendir(argv[1]);
    FILE *out = fopen(argv[2], "wb");
    if (!dir || !out) { fputs("I/O error\n", stderr); return 2; }
    size_t numFiles = 0, numRec = 0;
    char path[1 << 16];
    struct dirent *file;
    while ((file = readdir(dir))) {
        if (!strstr(file->d_name, ".gbff")) continue;
        snprintf(path, sizeof path, "%s/%s", argv[1], file->d_name);
        printf("Considering '%s' ", file->d_name);
        size_t sz;
        char *dump = slurp(path, &sz);
        if (!dump) { fputs("I/O error\n", stderr); return 2; }

        unsigned recs = 0;
        char *p = dump;
        for (;;) {
            char *acc = strstr(p, "VERSION     ");
            if (!acc) break;
            acc += 12;
            char *org = strstr(acc, "  ORGANISM  ");
            if (!org) { fputs("Organism not found.\n", stderr); return 2; }
            org += 12;
            char *ending = strstr(org, "\nREFERENCE");
            if (!ending) ending = strstr(org, "\nCOMMENT");
            if (!ending) {
                fputs("Reference/comment not found.\n", stderr);
                return 2;
            }
            char *eoa = strchr(acc, '.');
            char *eol = strchr(org, '\n');
            if (!eoa || !eol) {
                fputs("Cannot find line terminator\n", stderr);
                return 2;
            }
            *eoa = 0;
            fprintf(out, "%s\t", acc);
            /* organism name: first line + continuations without ';' */
            char name[1 << 16];
            size_t nl = (size_t)(eol - org);
            memcpy(name, org, nl);
            name[nl] = 0;
            char *cur = eol + 1;
            for (;;) {
                while (*cur == ' ') ++cur;
                char *nx = strchr(cur, '\n');
                if (!nx || cur >= ending) break;
                if (memchr(cur, ';', (size_t)(nx - cur))) break;
                name[nl++] = ' ';
                memcpy(name + nl, cur, (size_t)(nx - cur));
                nl += (size_t)(nx - cur);
                name[nl] = 0;
                cur = nx + 1;
            }
            /* lineage lines joined by one space; final '.' -> ';' */
            int first = 1;
            while (cur < ending) {
                while (*cur == ' ') ++cur;
                if (cur >= ending) break;
                char *nx = strchr(cur, '\n');
                size_t len = (size_t)((nx && nx < ending ? nx : ending)
                                      - cur);
                if (!first) fputc(' ', out);
                if (cur + len >= ending && len && cur[len - 1] == '.') {
                    fwrite(cur, 1, len - 1, out);
                    fputc(';', out);
                } else {
                    fwrite(cur, 1, len, out);
                }
                first = 0;
                cur += len + 1;
            }
            /* organism name: split after the 2nd space (skipping a
             * leading "Candidatus ") into "Genus species; rest" */
            char *start = strstr(name, "Candidatus ");
            start = start ? start + 11 : name;
            int spaces = 0;
            char *sep = NULL;
            for (char *sp = start; *sp; ++sp)
                if (*sp == ' ' && ++spaces == 2) { sep = sp; break; }
            if (sep) {
                *sep = 0;
                fprintf(out, " %s; %s\n", name, sep + 1);
            } else {
                fprintf(out, " %s\n", name);
            }
            ++recs;
            p = cur;
        }
        printf(" [%u records]%s\n", recs,
               recs > 1 ? " NOTE: MULTIPLE RECORDS DETECTED" : "");
        ++numFiles;
        numRec += recs;
        free(dump);
    }
    printf("Considered all .gbff files in directory "
           "[%zu files, %zu records]\n", numFiles, numRec);
    fclose(out);
    closedir(dir);
    return 0;
}
