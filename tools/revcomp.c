/* revcomp: reverse-complement every sequence of a linearized FASTA
 * (IUPAC-aware). Functional rebuild of the reference's prebuilt
 * `revcomp` utility (/root/reference/bin/revcomp, no source shipped).
 * Usage: revcomp in.lin.fna out.fna
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int main(int argc, char *argv[]) {
    if (argc != 3) { puts("Usage: revcomp in.lin.fna out.fna"); return 1; }
    FILE *in = fopen(argv[1], "rb"), *out = fopen(argv[2], "wb");
    if (!in || !out) { puts("Can't open file(s)"); return 2; }
    unsigned char rc[256];
    for (int i = 0; i < 256; ++i) rc[i] = (unsigned char)i;
    const char *fr = "ACGTUMRWSYKVHDBNacgtumrwsykvhdbn";
    const char *to = "TGCAAKYWSRMBDHVNtgcaakywsrmbdhvn";
    for (int i = 0; fr[i]; ++i) rc[(unsigned char)fr[i]] =
        (unsigned char)to[i];
    size_t cap = 1 << 26;
    char *line = malloc(cap);
    if (!line) { fputs("Out of memory\n", stderr); return 3; }
    while (fgets(line, cap, in)) {
        if (*line == '>') { fputs(line, out); continue; }
        size_t n = strlen(line);
        while (n && (line[n - 1] == '\n' || line[n - 1] == '\r')) --n;
        for (size_t a = 0, b = n ? n - 1 : 0; a < b; ++a, --b) {
            char c = rc[(unsigned char)line[a]];
            line[a] = rc[(unsigned char)line[b]];
            line[b] = c;
        }
        if (n & 1) line[n >> 1] = rc[(unsigned char)line[n >> 1]];
        fwrite(line, 1, n, out);
        fputc('\n', out);
    }
    return 0;
}
