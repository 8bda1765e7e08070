/* embalmulate: blast6 alignments -> OTU table (+ optional taxonomy table).
 *
 * Native rebuild of /root/reference/embalmlets/embalmulate.c with the
 * same output layout: samples are the query-name prefixes before '_'
 * (columns in first-encounter order), rows are references (and taxa) in
 * the pre-order of an unbalanced BST built in input order -- replicated
 * here so tables are byte-comparable with the reference tool. The
 * optional GGtrim flag removes trailing empty greengenes levels
 * ("...;g__;s__" tails) from taxa before tallying.
 *
 * Usage: embalmulate in.b6 out.tsv [outTax.tsv] [GGtrim]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

typedef struct node {
    char *key;
    uint64_t id;             /* insertion order (samples) */
    uint32_t *counts;        /* per-sample counts (refs/taxa) */
    uint64_t n_alloc;
    struct node *lo, *hi;
} Node;

static Node *node_new(const char *s, size_t l) {
    Node *n = calloc(1, sizeof(Node));
    n->key = malloc(l + 1);
    memcpy(n->key, s, l);
    n->key[l] = 0;
    return n;
}

/* compare a length-bounded span against a NUL-terminated key with
 * strcmp semantics */
static int span_cmp(const char *s, size_t l, const char *key) {
    int c = strncmp(s, key, l);
    if (c) return c;
    return key[l] ? -1 : 0;
}

/* find-or-insert into an unbalanced BST; returns the node */
static Node *bst_get(Node **root, const char *s, size_t l, uint64_t *n) {
    if (!*root) {
        *root = node_new(s, l);
        (*root)->id = (*n)++;
        return *root;
    }
    Node *t = *root;
    for (;;) {
        int c = span_cmp(s, l, t->key);
        if (!c) return t;
        Node **next = c > 0 ? &t->hi : &t->lo;
        if (!*next) {
            *next = node_new(s, l);
            (*next)->id = (*n)++;
            return *next;
        }
        t = *next;
    }
}

static void bump(Node *n, uint64_t sample_ix) {
    if (sample_ix >= n->n_alloc) {
        uint64_t na = n->n_alloc ? n->n_alloc : 8;
        while (na <= sample_ix) na *= 2;
        n->counts = realloc(n->counts, na * sizeof(uint32_t));
        memset(n->counts + n->n_alloc, 0,
               (na - n->n_alloc) * sizeof(uint32_t));
        n->n_alloc = na;
    }
    n->counts[sample_ix]++;
}

static void collect_samples(Node *t, char **names) {
    if (!t) return;
    names[t->id] = t->key;
    collect_samples(t->lo, names);
    collect_samples(t->hi, names);
}

/* pre-order dump: root row first, then left subtree, then right */
static void dump_rows(Node *t, uint64_t ns, FILE *out) {
    if (!t) return;
    fprintf(out, "\n%s", t->key);
    for (uint64_t i = 0; i < ns; ++i)
        fprintf(out, "\t%u", i < t->n_alloc ? t->counts[i] : 0);
    dump_rows(t->lo, ns, out);
    dump_rows(t->hi, ns, out);
}

int main(int argc, char *argv[]) {
    if (argc < 3) {
        puts("Usage: embalmulate in.b6 out.tsv [outTax.tsv] [GGtrim]");
        return 1;
    }
    int ggtrim = 0;
    if (argc >= 4 && !strcmp(argv[argc - 1], "GGtrim")) --argc, ggtrim = 1;
    FILE *in = fopen(argv[1], "rb"), *out = fopen(argv[2], "wb");
    FILE *tax = argc > 3 ? fopen(argv[3], "wb") : 0;
    if (!in || !out || (argc > 3 && !tax)) {
        puts("Can't open file(s)");
        return 1;
    }

    Node *samp_root = 0, *ref_root = 0, *tax_root = 0;
    uint64_t ns = 0, nref = 0, ntax = 0, nrows = 0, dummy = 0;
    size_t cap = 1 << 17;
    char *line = malloc(cap);
    while (fgets(line, cap, in)) {
        /* sample = query prefix before '_' (else whole run is 1 sample) */
        char *end = line;
        while (*end && *end != '_' && *end != '\t') ++end;
        if (!*end) break;
        uint64_t six = 0;
        if (*end == '_') {
            Node *sn = bst_get(&samp_root, line, end - line, &ns);
            six = sn->id;
            ++end;
            while (*end && *end != '\t') ++end;
            if (!*end) break;
        } else {
            bst_get(&samp_root, argv[1], strlen(argv[1]), &ns);
        }
        char *rstart = end + 1, *rend = rstart;
        while (*rend && *rend != '\t') ++rend;
        if (!*rend) break;
        Node *rn = bst_get(&ref_root, rstart, rend - rstart, &nref);
        bump(rn, six);
        if (tax) {
            char *e = rend + strlen(rend) - 1;   /* strip '\n' */
            if (*e == '\n') *e = 0, --e;
            char *tstart = e;
            while (tstart > rend && *tstart != '\t') --tstart;
            ++tstart;
            char *tend = e + 1;
            if (ggtrim && tend > tstart) {
                while (tend > tstart && tend[-1] == '_') {
                    do --tend; while (tend > tstart && *tend != ';');
                    *tend = 0;
                }
            }
            Node *tn = bst_get(&tax_root, tstart, tend - tstart, &ntax);
            bump(tn, six);
        }
        ++nrows;
        (void)dummy;
    }
    free(line);
    printf("Parsed %llu reads [%llu samples, %llu taxa, %llu refs]. "
           "Collating...\n", (unsigned long long)nrows,
           (unsigned long long)ns, (unsigned long long)ntax,
           (unsigned long long)nref);

    char **names = malloc((ns ? ns : 1) * sizeof(*names));
    collect_samples(samp_root, names);
    fputs("#OTU ID", out);
    if (tax) fputs("#OTU ID", tax);
    for (uint64_t i = 0; i < ns; ++i) fprintf(out, "\t%s", names[i]);
    if (tax) for (uint64_t i = 0; i < ns; ++i) fprintf(tax, "\t%s", names[i]);
    dump_rows(ref_root, ns, out);
    if (tax) dump_rows(tax_root, ns, tax);
    return 0;
}
