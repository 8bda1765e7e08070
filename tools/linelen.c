/* linelen: print the longest line of a text file (sanity probe for
 * linearized FASTA).
 *
 * Output contract (matches /root/reference/embalmlets/linelen.c): the
 * winning line's length includes its trailing newline only when it is
 * the final line of the file; with a second "rep" argument it prints
 * "<lines/rep> <maxlen>" instead of the verbose form.
 *
 * Implementation: streaming block scan over the raw bytes rather than
 * per-line buffered reads, so memory use is constant regardless of
 * line length.
 */
#include <stdio.h>
#include <stdlib.h>

int main(int argc, char **argv) {
    if (argc < 2) { puts("Usage: linelen file [rep]"); return 1; }
    FILE *fp = fopen(argv[1], "rb");
    if (!fp) { puts("Invalid file."); return 1; }
    unsigned rep = (argc > 2) ? (unsigned)strtoul(argv[2], NULL, 10) : 0;

    enum { CHUNK = 1 << 20 };
    static char buf[CHUNK];
    unsigned best = 0;      /* longest line seen, newline included   */
    unsigned winner = 0;    /* 1-based index of the first best line  */
    unsigned nlines = 0;    /* total lines (EOF tail counts as one)  */
    unsigned cur = 0;       /* bytes accumulated on the current line */
    size_t got;
    while ((got = fread(buf, 1, CHUNK, fp)) > 0) {
        for (size_t k = 0; k < got; ++k) {
            ++cur;
            if (buf[k] != '\n') continue;
            ++nlines;
            if (cur > best) { best = cur; winner = nlines; }
            cur = 0;
        }
    }
    fclose(fp);
    if (cur > 0) { /* final line with no trailing newline */
        ++nlines;
        if (cur > best) { best = cur; winner = nlines; }
    }

    /* Exclude the newline from the reported length unless the winner
     * is the file's last line (which keeps its newline if it has one). */
    unsigned shown = best - (winner < nlines);
    if (rep) printf("%u %u\n", nlines / rep, shown);
    else printf("Length of longest line: %u at line %u\n", shown, winner);
    return 0;
}
