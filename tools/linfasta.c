/* linfasta: join multi-line FASTA records onto single sequence lines.
 * Native rebuild of /root/reference/embalmlets/linfasta.c.
 * Usage: linfasta infile.bad.fasta outfile.good.fasta
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int main(int argc, char *argv[]) {
    if (argc != 3) {
        puts("Usage: linfasta infile.bad.fasta outfile.good.fasta");
        return 1;
    }
    FILE *in = fopen(argv[1], "rb"), *out = fopen(argv[2], "wb");
    if (!in || !out) { puts("Can't open file(s)"); return 2; }
    size_t cap = 1 << 22;
    char *line = malloc(cap);
    if (!line) { fputs("Out of memory\n", stderr); return 3; }
    if (!fgets(line, cap, in)) { puts("Empty input"); return 1; }
    fputs(line, out);                  /* first header passes through */
    while (fgets(line, cap, in)) {
        if (*line == '>') {
            fputc('\n', out);
            fputs(line, out);
        } else {
            char *nl = strchr(line, '\n');
            if (nl) *nl = 0;
            fputs(line, out);
        }
    }
    fputs("\n", out);
    return 0;
}
