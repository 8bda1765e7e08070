/* t2gg: NCBI taxdump (nodes.dmp + names.dmp) -> greengenes-style
 * "k__..;p__..;..;s__..;t__.." strings per taxon id.
 *
 * Native rebuild of /root/reference/embalmlets/t2gg.c: ranks are mapped
 * to k/p/c/o/f/g/s levels, viruses (children of tid 10239) are promoted
 * to phylum/class, children of species become strain ('t'), kingdoms
 * reparent to root, unranked nodes are skipped, and gaps are filled
 * with empty "x__;" levels. Only scientific names are used.
 *
 * Usage: t2gg nodes.dmp names.dmp tid2gg.txt
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

#define MAXTID 26000000
#define VIRUS_TID 10239

typedef struct { uint32_t parent; char *name; char rank; } TNode;

static const char *RANKS[8] = {
    "species", "genus", "family", "order", "class", "phylum",
    "kingdom", "superkingdom"};
static const char RLET[8] = {'s', 'g', 'f', 'o', 'c', 'p', 'k', 'k'};
static const char ORDER[9] = "kpcofgst";

int main(int argc, char *argv[]) {
    if (argc != 4) { puts("Usage: t2gg nodes.dmp names.dmp tid2gg.txt");
                     return 1; }
    FILE *nd = fopen(argv[1], "rb"), *nm = fopen(argv[2], "rb"),
         *out = fopen(argv[3], "wb");
    if (!nd || !nm || !out) { fputs("I/O error\n", stderr); return 2; }
    char *line = malloc(1 << 16);
    TNode *tree = calloc(MAXTID, sizeof(*tree));
    if (!line || !tree) { fputs("ERROR:OOM:TREE\n", stderr); return 3; }

    uint32_t last = 0;
    while (fgets(line, 1 << 16, nd)) {
        uint32_t ix = (uint32_t)atol(line);
        if (ix >= MAXTID) continue;
        char *bar = strchr(line, '|');
        if (!bar) { fputs("\nBad tree\n", stderr); return 2; }
        tree[ix].parent = (uint32_t)atol(bar + 1);
        char *rank = strchr(bar + 1, '|');
        if (!rank) { fputs("\nBad tree\n", stderr); return 2; }
        rank += 2;
        char *end = strchr(rank, '\t');
        if (!end) { fputs("\nBad tree\n", stderr); return 2; }
        *end = 0;
        tree[ix].rank = 'x';
        for (int i = 0; i < 8; ++i)
            if (!strcmp(rank, RANKS[i])) { tree[ix].rank = RLET[i]; break; }
        if (ix > last) last = ix;
    }
    ++last;
    fputs("Done with node parse\n", stderr);

    for (uint32_t i = 0; i < last; ++i) {
        if (tree[i].parent == VIRUS_TID) tree[i].rank = 'p';
        else if (tree[tree[i].parent].parent == VIRUS_TID)
            tree[i].rank = 'c';
        else if (tree[tree[i].parent].rank == 's') tree[i].rank = 't';
        else if (tree[i].rank == 'k') tree[i].parent = 1;
    }
    fputs("Done with taxonomizing\n", stderr);

    uint32_t prev = 0;
    while (fgets(line, 1 << 16, nm)) {
        uint32_t ix = (uint32_t)atol(line);
        if (ix >= last || ix == prev || tree[ix].rank == 'x') {
            prev = ix;
            continue;
        }
        char *begin = strchr(line, '|');
        if (!begin) { fputs("\nBad names\n", stderr); return 2; }
        begin += 2;
        char *end = strchr(begin, '\t');
        if (!end) { fputs("\nBad names\n", stderr); return 2; }
        char *cls = strchr(end + 2, '|');
        if (!cls) { fputs("\nBad names\n", stderr); return 2; }
        cls += 2;
        if (cls[0] == 's' && cls[1] == 'c') {      /* "scientific name" */
            prev = ix;
            tree[ix].name = malloc(end - begin + 1);
            memcpy(tree[ix].name, begin, end - begin);
            tree[ix].name[end - begin] = 0;
        }
    }
    fputs("Done with name assignment\n", stderr);

    uint32_t chain[256];
    for (uint32_t i = 2; i < last; ++i) {
        if (!tree[i].parent) continue;
        uint32_t node = i, lv = 0;
        while (node > 1 && lv < 255) chain[++lv] = node,
            node = tree[node].parent;
        int cur = 0;
        fprintf(out, "%u\t", i);
        for (uint32_t j = lv; j; --j) {
            TNode t = tree[chain[j]];
            if (t.rank == 'x') continue;
            for (; ORDER[cur] != t.rank && cur < 7; ++cur)
                fprintf(out, "%c__;", ORDER[cur]);
            fprintf(out, "%c__%s%s", ORDER[cur],
                    t.name ? t.name : "", cur < 7 ? ";" : "");
            ++cur;
        }
        for (; cur < 8; ++cur)
            fprintf(out, "%c__%s", ORDER[cur], cur < 7 ? ";" : "");
        fprintf(out, "\n");
    }
    fputs("Done with file writing!\n", stderr);
    return 0;
}
