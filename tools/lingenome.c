#define _POSIX_C_SOURCE 200809L
/* lingenome: compile a directory of genome FASTA files into one
 * linearized FASTA, one record per genome (contigs concatenated).
 *
 * Functional rebuild of the reference's prebuilt `lingenome` utility
 * (/root/reference/bin/lingenome, no source shipped; behavior from
 * bin/README.md): each *.fna / *.fasta (optionally *.gz via gzip) in
 * the directory becomes one output record. With FILENAME the record
 * header is the file name sans extension; with HEADFIX headers are
 * sanitized to newick-safe characters. Sequences whose headers contain
 * "plasmid" can be split into a second output file.
 *
 * Usage: lingenome indir out.fasta [plasmids.fasta] [FILENAME|HEADFIX]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <dirent.h>

static FILE *open_maybe_gz(const char *path, int *is_pipe) {
    size_t n = strlen(path);
    *is_pipe = n > 3 && !strcmp(path + n - 3, ".gz");
    if (*is_pipe) {
        char cmd[8192];
        snprintf(cmd, sizeof cmd, "gzip -dc '%s'", path);
        return popen(cmd, "r");
    }
    return fopen(path, "rb");
}

static void sanitize(char *s) {
    for (; *s; ++s)
        if (strchr(" ():;,'[]", *s)) *s = '_';
}

static int ends_with(const char *s, const char *suf) {
    size_t n = strlen(s), m = strlen(suf);
    return n >= m && !strcmp(s + n - m, suf);
}

int main(int argc, char *argv[]) {
    if (argc < 3) {
        puts("Usage: lingenome indir out.fasta [plasmids.fasta] "
             "[FILENAME|HEADFIX]");
        return 1;
    }
    int by_filename = 0, headfix = 0;
    if (!strcmp(argv[argc - 1], "FILENAME")) --argc, by_filename = 1;
    else if (!strcmp(argv[argc - 1], "HEADFIX")) --argc, headfix = 1;
    FILE *out = fopen(argv[2], "wb");
    FILE *plas = argc > 3 ? fopen(argv[3], "wb") : 0;
    DIR *dir = opendir(argv[1]);
    if (!dir || !out || (argc > 3 && !plas)) { puts("I/O error");
                                               return 2; }
    /* gather + sort file names for deterministic output */
    char **files = 0;
    size_t nf = 0, cap = 0;
    struct dirent *de;
    while ((de = readdir(dir)))
        if (ends_with(de->d_name, ".fna") || ends_with(de->d_name, ".fasta")
                || ends_with(de->d_name, ".fna.gz")
                || ends_with(de->d_name, ".fasta.gz")) {
            if (nf == cap) files = realloc(files, (cap = cap ? cap * 2 : 64)
                                           * sizeof(*files));
            files[nf++] = strdup(de->d_name);
        }
    closedir(dir);
    int cmp(const void *a, const void *b) {
        return strcmp(*(char *const *)a, *(char *const *)b);
    }
    qsort(files, nf, sizeof(*files), cmp);

    size_t lnsz = 1 << 24;
    char *line = malloc(lnsz), *path = malloc(1 << 16);
    for (size_t i = 0; i < nf; ++i) {
        snprintf(path, 1 << 16, "%s/%s", argv[1], files[i]);
        int is_pipe;
        FILE *in = open_maybe_gz(path, &is_pipe);
        if (!in) { printf("skip %s\n", files[i]); continue; }
        char name[4096];
        snprintf(name, sizeof name, "%s", files[i]);
        char *dot = strstr(name, ".fna");
        if (!dot) dot = strstr(name, ".fasta");
        if (dot) *dot = 0;
        int started = 0, in_plasmid = 0, plas_started = 0;
        while (fgets(line, lnsz, in)) {
            if (*line == '>') {
                in_plasmid = plas && strstr(line, "plasmid");
                if (in_plasmid) {
                    if (!plas_started)
                        fprintf(plas, ">%s_plasmid\n", name),
                            plas_started = 1;
                    continue;
                }
                if (!started) {
                    if (by_filename) fprintf(out, ">%s\n", name);
                    else {
                        char *nl = strchr(line, '\n');
                        if (nl) *nl = 0;
                        if (headfix) sanitize(line + 1);
                        fprintf(out, "%s\n", line);
                    }
                    started = 1;
                }
                continue;   /* subsequent contigs concatenate */
            }
            char *nl = strchr(line, '\n');
            if (nl) *nl = 0;
            fputs(line, in_plasmid ? plas : out);
        }
        if (started) fputc('\n', out);
        if (plas_started) fputc('\n', plas);
        if (is_pipe) pclose(in); else fclose(in);
    }
    printf("Compiled %zu genomes\n", nf);
    return 0;
}
