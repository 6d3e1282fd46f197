/* Calibration driver for the reference AVX2 SW kernel.
 * Feeds a pre-sorted binary workload (query + DB as alphabet indices),
 * packs 16-lane batches the way src/alignment_cmdline.c does, and times
 * only alignment_fill_matrices (the reference's own timing boundary). */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <omp.h>
#include "alignment.h"
#include "alignment_scoring.h"

static double now(void) {
    struct timespec ts; clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}

int main(int argc, char **argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s db.bin matrix.txt\n", argv[0]); return 1; }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { perror("db"); return 1; }
    long long n, qlen;
    fread(&n, 8, 1, f); fread(&qlen, 8, 1, f);
    int8_t *q = malloc(qlen);
    fread(q, 1, qlen, f);
    long long *lens = malloc(n * 8);
    fread(lens, 8, n, f);
    long long total = 0;
    for (long long i = 0; i < n; i++) total += lens[i];
    int8_t *seqs = malloc(total);
    fread(seqs, 1, total, f);
    fclose(f);

    int gap_open = argc > 4 ? atoi(argv[4]) : -2;
    int gap_extend = argc > 5 ? atoi(argv[5]) : -1;
    scoring_t scoring;
    scoring_init(&scoring, 1, -2, gap_open, gap_extend, 0);
    memset(scoring.swap_scores, 0, sizeof(scoring.swap_scores));
    scoring.use_match_mismatch = 0;
    FILE *m = fopen(argv[2], "r");
    if (!m) { perror("matrix"); return 1; }
    char a, b; int sc;
    while (fscanf(m, " %c %c %d", &a, &b, &sc) == 3)
        scoring_add_mutation(&scoring, a, b, sc);
    fclose(m);

    long long nb = n / 16;          /* full batches only (reference envelope) */
    int8_t **packed = malloc(nb * sizeof(int8_t *));
    size_t *lbs = malloc(nb * sizeof(size_t));
    long long off = 0, offs_i = 0;
    long long *offs = malloc(n * 8);
    for (long long i = 0; i < n; i++) { offs[i] = off; off += lens[i]; }
    for (long long g = 0; g < nb; g++) {
        size_t lb = lens[g * 16];   /* sorted desc: first is longest */
        lbs[g] = lb;
        int8_t *buf = aligned_alloc(32, lb * 16);
        memset(buf, 31, lb * 16);   /* '*' padding, like cmdline.c:448 */
        for (int lane = 0; lane < 16; lane++) {
            long long id = g * 16 + lane;
            const int8_t *s = seqs + offs[id];
            for (long long p = 0; p < lens[id]; p++) buf[p * 16 + lane] = s[p];
        }
        packed[g] = buf;
    }

    aligner_t **al = malloc(nb * sizeof(aligner_t *));
    for (long long g = 0; g < nb; g++)
        al[g] = aligner_create(NULL, NULL, NULL, NULL, q, packed[g],
                               qlen, lbs[g], 16, &scoring);

    int reps = argc > 3 ? atoi(argv[3]) : 3;
    double bestdt = 1e30;
    for (int r = 0; r < reps; r++) {
        double t0 = now();
        #pragma omp parallel for schedule(dynamic, 1)
        for (long long g = 0; g < nb; g++)
            alignment_fill_matrices(al[g]);
        double dt = now() - t0;
        if (dt < bestdt) bestdt = dt;
    }
    long long cells = 0;
    for (long long i = 0; i < nb * 16; i++) cells += lens[i] * qlen;
    /* checksum so scoring can be cross-checked and work can't be elided */
    long long sum = 0;
    for (long long g = 0; g < nb; g++)
        for (int lane = 0; lane < 16; lane++) sum += al[g]->max_scores[lane];
    printf("entries=%lld time=%.6f entries_per_s=%.0f gcups=%.3f checksum=%lld\n",
           nb * 16, bestdt, nb * 16 / bestdt, cells / bestdt / 1e9, sum);
    /* every record's score for exactness cross-checks */
    for (long long g = 0; g < nb; g++)
        for (int lane = 0; lane < 16; lane++)
            printf("score[%lld]=%d\n", g * 16 + lane,
                   (int)al[g]->max_scores[lane]);
    return 0;
}
