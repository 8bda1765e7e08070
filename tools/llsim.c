/* llsim: short-read simulator planting an exact number of errors per read.
 *
 * Native rebuild of the reference tool (/root/reference/embalmlets/LLsim.c);
 * behaviorally identical for the same seed: same xorshift(13,7,17) stream,
 * same rejection sampling over the concatenated base space, same mutation
 * typing (0-2 substitution, 3 deletion, 4 insertion) with the reference's
 * literal adjacency re-roll condition, and the same header annotations
 * ("<head> @<pos>: <origseq> S3I17 [RC]").
 *
 * Usage: llsim input.lin.fna output.fna <numReads> <readLen> <numErrors>
 *        [seed] [RC]
 * Input must be linearized FASTA (one line per sequence).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <time.h>

static inline uint64_t rng64(uint64_t *x) {
    *x ^= *x << 13; *x ^= *x >> 7; return *x ^= *x << 17;
}

static int u32cmp(const void *a, const void *b) {
    uint32_t x = *(const uint32_t *)a, y = *(const uint32_t *)b;
    return x < y ? -1 : x > y;
}

/* valid unambiguous bases: A C G T U (case-insensitive via &31) */
static char ok31[32];

static int span_clean(const char *s, uint64_t off, uint64_t len) {
    for (uint64_t i = off; i < off + len; ++i)
        if (!ok31[s[i] & 31]) return 0;
    return 1;
}

int main(int argc, char *argv[]) {
    puts("llsim: exact-error short read simulator (burst_tpu tools)");
    if (argc < 6) {
        puts("Usage: llsim input.lin.fna output.fna <numReads> <readLen> "
             "<numErrors> [seed] [RC]");
        return 1;
    }
    long num_reads = atol(argv[3]), read_len = atol(argv[4]),
         num_e = atol(argv[5]);
    if (num_reads < 1 || read_len < 1 || num_e < 0 || num_e > read_len) {
        printf("Invalid read parameters: num %ld, len %ld, err %ld\n",
               num_reads, read_len, num_e);
        return 1;
    }
    int do_rc = argc > 6 && !strcmp(argv[argc - 1], "RC");
    if (do_rc) --argc, puts("Also simulating reverse complemented reads.");
    uint64_t seed = argc > 6 ? (uint64_t)atoll(argv[6]) : (uint64_t)time(0);
    printf("Setting random seed to %llu\n", (unsigned long long)seed);

    FILE *in = fopen(argv[1], "rb");
    if (!in) { printf("Cannot open input '%s'\n", argv[1]); return 2; }
    FILE *out = fopen(argv[2], "wb");
    if (!out) { printf("Cannot open output '%s'\n", argv[2]); return 2; }
    setvbuf(out, 0, _IOFBF, 1 << 20);

    fseek(in, 0, SEEK_END);
    uint64_t fsz = (uint64_t)ftell(in);
    rewind(in);
    if (!fsz) { puts("fasta file is empty. Exiting."); return 1; }
    char *buf = malloc(fsz + 2);
    if (!buf) { puts("ERROR: Out of memory"); return 3; }
    if (fread(buf, 1, fsz, in) != fsz) { puts("read error"); return 2; }
    if (buf[fsz - 1] != '\n') buf[fsz++] = '\n';
    buf[fsz] = 0;
    fclose(in);

    ok31['A' & 31] = ok31['C' & 31] = ok31['G' & 31] = ok31['T' & 31] =
        ok31['U' & 31] = 1;

    /* index alternating header/sequence lines */
    uint64_t cap = 1024, ns = 0, total = 0, maxlen = 0;
    char **heads = malloc(cap * sizeof(*heads));
    char **seqs = malloc(cap * sizeof(*seqs));
    uint64_t *slen = malloc(cap * sizeof(*slen));
    if (!heads || !seqs || !slen) { puts("ERROR: Out of memory"); return 3; }
    char *p = buf;
    while (*p == '>') {
        if (ns >= cap) {
            cap *= 2;
            heads = realloc(heads, cap * sizeof(*heads));
            seqs = realloc(seqs, cap * sizeof(*seqs));
            slen = realloc(slen, cap * sizeof(*slen));
            if (!heads || !seqs || !slen) { puts("OOM [2]"); return 3; }
        }
        heads[ns] = p;
        while (*p && *p != '\n') ++p;
        seqs[ns] = ++p;
        while (*p && *p != '\n') ++p;
        slen[ns] = (uint64_t)(p - seqs[ns]);
        maxlen = slen[ns] > maxlen ? slen[ns] : maxlen;
        total += slen[ns];
        ++p; ++ns;
    }
    printf("There were %llu sequences identified [max len %llu]\n",
           (unsigned long long)ns, (unsigned long long)maxlen);
    if ((long)maxlen < read_len) {
        puts("ERROR: max ref length shorter than desired query length");
        return 1;
    }
    uint64_t *offs = malloc((ns + 1) * sizeof(*offs));
    offs[0] = 0;
    for (uint64_t i = 1; i < ns; ++i) offs[i] = offs[i - 1] + slen[i - 1];
    offs[ns] = total;

    /* substitution buckets per masked base; slot 0 = insertion alphabet */
    static const char *mut[32] = {0};
    mut[0] = "ACGT";
    mut['A' & 31] = "CGT";
    mut['C' & 31] = "AGT";
    mut['G' & 31] = "ACT";
    mut['T' & 31] = "ACG";
    mut['U' & 31] = "ACG";
    char rc31[32] = {0};
    rc31['A' & 31] = 'T'; rc31['C' & 31] = 'G'; rc31['G' & 31] = 'C';
    rc31['T' & 31] = 'A'; rc31['U' & 31] = 'A';

    char *sr = calloc(2 * read_len + 1, 1);
    uint32_t *m_ix = malloc(read_len * sizeof(*m_ix));
    uint32_t *m_shf = malloc(read_len * sizeof(*m_shf));
    if (!sr || !m_ix || !m_shf) { puts("OOM [3]"); return 3; }
    for (long i = 0; i < read_len; ++i) m_shf[i] = (uint32_t)i;

    for (long i = 0; i < num_reads; ++i) {
        uint64_t r, six, off;
        do {
            r = rng64(&seed) % total;
            /* binary search: sequence containing global base r */
            uint64_t lo = 0, hi = ns - 1, mid = 0;
            while (lo <= hi) {
                mid = lo + ((hi - lo) >> 1);
                if (r > offs[mid]) lo = mid + 1;
                else if (r < offs[mid]) hi = mid - 1;
                else break;
            }
            if (offs[mid] > r) --mid;
            six = mid; off = r - offs[mid];
        } while (r + read_len >= offs[six + 1] ||
                 !span_clean(seqs[six], off, read_len));

        for (long j = 0; j < num_e; ++j)
            m_ix[j] = (uint32_t)(rng64(&seed) % (read_len - j)) + j;
        for (long j = 0; j < num_e; ++j) {       /* partial Knuth shuffle */
            uint32_t t = m_shf[j], rr = m_ix[j];
            m_shf[j] = m_shf[rr]; m_shf[rr] = t;
        }
        qsort(m_shf, num_e, sizeof(*m_shf), u32cmp);

        uint32_t qix = 0, mix = 0, ni = 0, nd = 0;
        const char *qp = seqs[six] + off;
        fwrite(heads[six], 1, (size_t)(seqs[six] - heads[six] - 1), out);
        fprintf(out, " @%u: ", (unsigned)(off + 1));
        fwrite(qp, 1, read_len, out);
        fprintf(out, " ");
        int li = 0, ld = 0;
        for (long j = 0; j < num_e; ++j) {
            char type_c;
            for (; qix + ni < m_shf[j]; ++qix) sr[mix++] = qp[qix];
            int type = (int)(rng64(&seed) % 5);
            /* reference's literal adjacency condition, C precedence and
             * all: (j && adj && type==3 && li) || (type==4 && ld) */
            if ((j && m_shf[j] == m_shf[j - 1] + 1 && (type == 3 && li))
                    || (type == 4 && ld))
                type = (int)(rng64(&seed) % 3);
            if (type < 3) {
                li = ld = 0; type_c = 'S';
                sr[mix++] = mut[qp[qix++] & 31][type];
            } else if (type == 3) {
                ld = 1; li = 0; type_c = 'D'; ++nd; ++qix;
            } else {
                li = 1; ld = 0; type_c = 'I'; ++ni;
                sr[mix++] = mut[0][rng64(&seed) % 4];
            }
            fprintf(out, "%c%u", type_c, m_shf[j]);
        }
        for (; qix < (uint32_t)read_len; ++qix) sr[mix++] = qp[qix];
        long seq_len = read_len + ni - nd;
        if (do_rc && (rng64(&seed) % 2)) {
            for (long j = 0; j < seq_len >> 1; ++j) {
                char c = rc31[sr[j] & 31];
                sr[j] = rc31[sr[seq_len - j - 1] & 31];
                sr[seq_len - j - 1] = c;
            }
            if (seq_len & 1)
                sr[seq_len >> 1] = rc31[sr[seq_len >> 1] & 31];
            fprintf(out, " [RC]");
        }
        fprintf(out, "\n");
        fwrite(sr, 1, seq_len, out);
        fprintf(out, "\n");
    }
    fclose(out);
    return 0;
}
