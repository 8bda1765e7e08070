/* linelen: report the longest line of a file (sanity probe for
 * linearized FASTA). Native rebuild of
 * /root/reference/embalmlets/linelen.c including its "rep" mode
 * (prints line-count/rep and max length).
 * Usage: linelen file [rep]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int main(int argc, char *argv[]) {
    if (argc < 2) { puts("Usage: linelen file [rep]"); return 1; }
    size_t cap = 1 << 26;
    char *line = malloc(cap);
    FILE *f = fopen(argv[1], "r");
    if (!f || !line) { puts("Invalid file."); return 1; }
    unsigned rep = argc > 2 ? (unsigned)atoi(argv[2]) : 0;
    unsigned maxlen = 0, i = 0, mi = 0, t;
    while (fgets(line, cap, f))
        if (++i, (t = (unsigned)strlen(line)) > maxlen) mi = i, maxlen = t;
    /* the trailing newline is excluded unless the max line is the last */
    if (rep) printf("%u %u\n", i / rep, maxlen - (mi < i));
    else printf("Length of longest line: %u at line %u\n",
                maxlen - (mi < i), mi);
    return 0;
}
