/* t2gg: convert an NCBI taxdump (nodes.dmp + names.dmp) into
 * greengenes-style lineage strings, one "tid<TAB>k__..;p__..;..;s__..;t__.."
 * row per taxon id.
 *
 * Output contract (matches /root/reference/embalmlets/t2gg.c):
 *   - ranks map to the eight greengenes levels k,p,c,o,f,g,s,t; both
 *     "kingdom" and "superkingdom" map to k and are re-parented to root;
 *   - direct children of the Viruses taxon (tid 10239) are promoted to
 *     phylum and grandchildren to class; children of a species become
 *     strain-level (t); the promotion pass runs sequentially in tid
 *     order so earlier promotions feed later checks;
 *   - only "scientific name" entries (the first per tid) label a level;
 *   - levels absent from a lineage are emitted as empty "x__;" slots so
 *     every row carries exactly eight levels.
 *
 * Usage: t2gg nodes.dmp names.dmp tid2gg.txt
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

#define TID_LIMIT 26000000u
#define VIRUS_TID 10239u
#define LINE_MAX_ (1 << 16)
#define DEPTH_MAX 255

/* greengenes level order; index into this is the "level cursor" */
static const char LEVELS[9] = "kpcofgst";

typedef struct {
    uint32_t parent;
    char *name;   /* scientific name, owned; NULL if never named */
    char rank;    /* one of LEVELS, or 'x' for unranked */
} Taxon;

static Taxon *tax;
static uint32_t tax_hi;   /* one past the highest tid seen in nodes.dmp */

static void die(const char *msg, int code) {
    fputs(msg, stderr);
    exit(code);
}

/* Return a pointer just past the n-th '|' of a taxdump line (fields are
 * "<val>\t|\t<val>\t|..."), or NULL if the line is too short. */
static char *field_after_bar(char *line, int n) {
    char *p = line;
    while (n--) {
        p = strchr(p, '|');
        if (!p) return NULL;
        ++p;
    }
    return p;
}

static char rank_letter(const char *rank_name) {
    static const struct { const char *name; char letter; } MAP[] = {
        {"species", 's'}, {"genus", 'g'}, {"family", 'f'},
        {"order", 'o'},   {"class", 'c'}, {"phylum", 'p'},
        {"kingdom", 'k'}, {"superkingdom", 'k'},
    };
    for (size_t i = 0; i < sizeof MAP / sizeof *MAP; ++i)
        if (!strcmp(rank_name, MAP[i].name)) return MAP[i].letter;
    return 'x';
}

static void parse_nodes(FILE *nd, char *line) {
    while (fgets(line, LINE_MAX_, nd)) {
        uint32_t tid = (uint32_t)atol(line);
        if (tid >= TID_LIMIT) continue;
        char *parent_f = field_after_bar(line, 1);
        char *rank_f = field_after_bar(line, 2);
        if (!parent_f || !rank_f) die("\nBad tree\n", 2);
        ++rank_f;                       /* skip the '\t' after '|' */
        char *rank_end = strchr(rank_f, '\t');
        if (!rank_end) die("\nBad tree\n", 2);
        *rank_end = 0;
        tax[tid].parent = (uint32_t)atol(parent_f);
        tax[tid].rank = rank_letter(rank_f);
        if (tid >= tax_hi) tax_hi = tid + 1;
    }
}

/* Sequential promotion sweep; order matters (a node re-ranked here is
 * seen re-ranked by its descendants later in the sweep). */
static void promote_ranks(void) {
    for (uint32_t i = 0; i < tax_hi; ++i) {
        uint32_t up = tax[i].parent;
        if (up == VIRUS_TID) tax[i].rank = 'p';
        else if (tax[up].parent == VIRUS_TID) tax[i].rank = 'c';
        else if (tax[up].rank == 's') tax[i].rank = 't';
        else if (tax[i].rank == 'k') tax[i].parent = 1;
    }
}

static void attach_names(FILE *nm, char *line) {
    uint32_t seen = 0;   /* tid of the previous line: first name wins */
    while (fgets(line, LINE_MAX_, nm)) {
        uint32_t tid = (uint32_t)atol(line);
        if (tid >= tax_hi || tid == seen || tax[tid].rank == 'x') {
            seen = tid;
            continue;
        }
        char *name = field_after_bar(line, 1);
        if (!name) die("\nBad names\n", 2);
        ++name;                          /* skip '\t' */
        char *name_end = strchr(name, '\t');
        if (!name_end) die("\nBad names\n", 2);
        char *class_f = strchr(name_end + 2, '|');
        if (!class_f) die("\nBad names\n", 2);
        class_f += 2;
        if (class_f[0] != 's' || class_f[1] != 'c') continue;
        seen = tid;
        size_t n = (size_t)(name_end - name);
        tax[tid].name = memcpy(malloc(n + 1), name, n);
        tax[tid].name[n] = 0;
    }
}

/* Build one lineage row into buf; returns its length. */
static size_t compose_row(uint32_t tid, char *buf) {
    /* ancestry, leaf first; root (tid 1) excluded */
    uint32_t path[DEPTH_MAX + 1];
    int depth = 0;
    for (uint32_t n = tid; n > 1 && depth < DEPTH_MAX; n = tax[n].parent)
        path[depth++] = n;

    size_t len = (size_t)sprintf(buf, "%u\t", tid);
    int cursor = 0;
    for (int d = depth - 1; d >= 0; --d) {
        const Taxon *t = &tax[path[d]];
        if (t->rank == 'x') continue;
        while (cursor < 7 && LEVELS[cursor] != t->rank) {
            buf[len++] = LEVELS[cursor++];
            buf[len++] = '_'; buf[len++] = '_'; buf[len++] = ';';
        }
        buf[len++] = LEVELS[cursor];
        buf[len++] = '_'; buf[len++] = '_';
        if (t->name) {
            size_t n = strlen(t->name);
            memcpy(buf + len, t->name, n);
            len += n;
        }
        if (cursor < 7) buf[len++] = ';';
        ++cursor;
    }
    while (cursor < 8) {
        buf[len++] = LEVELS[cursor];
        buf[len++] = '_'; buf[len++] = '_';
        if (cursor < 7) buf[len++] = ';';
        ++cursor;
    }
    buf[len++] = '\n';
    return len;
}

static void write_lineages(FILE *out) {
    char *buf = malloc(LINE_MAX_ * (DEPTH_MAX + 2));
    if (!buf) die("ERROR:OOM:ROW\n", 3);
    for (uint32_t i = 2; i < tax_hi; ++i) {
        if (!tax[i].parent) continue;
        size_t n = compose_row(i, buf);
        fwrite(buf, 1, n, out);
    }
    free(buf);
}

int main(int argc, char *argv[]) {
    if (argc != 4) { puts("Usage: t2gg nodes.dmp names.dmp tid2gg.txt");
                     return 1; }
    FILE *nd = fopen(argv[1], "rb"), *nm = fopen(argv[2], "rb"),
         *out = fopen(argv[3], "wb");
    if (!nd || !nm || !out) die("I/O error\n", 2);
    char *line = malloc(LINE_MAX_);
    tax = calloc(TID_LIMIT, sizeof(*tax));
    if (!line || !tax) die("ERROR:OOM:TREE\n", 3);

    parse_nodes(nd, line);
    fprintf(stderr, "t2gg: %u taxa loaded\n", tax_hi);
    promote_ranks();
    attach_names(nm, line);
    write_lineages(out);
    fprintf(stderr, "t2gg: lineages written\n");
    return 0;
}
