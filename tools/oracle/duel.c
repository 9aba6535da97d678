/* Same-process duel bench: alternates reference rans_compress_to_4x16
 * and our fqz5_rans_compress on the same buffer, pairing each timed
 * rep back-to-back so CPU clock drift (±30% on this box, minute
 * timescales) hits both sides equally.  Reports per-pair ratio
 * medians — the only stable quantity here — plus median walls.
 *
 * Build (after tools/oracle/build.sh):
 *   gcc -O2 -I/tmp/oracle -o /tmp/oracle/harness/duel \
 *       tools/oracle/duel.c /tmp/oracle/htscodecs/*.o \
 *       /tmp/oracle/bz2_stub.o -L$REPO/native -lfqz5 \
 *       -Wl,-rpath,$REPO/native -lm -lz -pthread
 *
 * Usage: duel <file> <order-int-or-hex> <pairs>
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "htscodecs/rANS_static4x16.h"

extern int64_t fqz5_rans_compress(const uint8_t*, uint32_t, int,
                                  uint8_t*, uint32_t);
extern int64_t fqz5_rans_uncompress(const uint8_t*, uint32_t, uint8_t*,
                                    uint32_t, uint32_t, int);

static double now_s(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}

static int cmp_d(const void* a, const void* b) {
    double x = *(const double*)a, y = *(const double*)b;
    return x < y ? -1 : x > y;
}
static double median(double* v, int n) {
    qsort(v, n, sizeof(double), cmp_d);
    return v[n / 2];
}

int main(int argc, char** argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: duel <file> <order> <pairs>\n");
        return 2;
    }
    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror(argv[1]); return 1; }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint8_t* data = malloc(sz);
    if (fread(data, 1, sz, f) != (size_t)sz) return 1;
    fclose(f);
    int order = (int)strtol(argv[2], NULL, 0);
    int pairs = atoi(argv[3]);
    if (pairs > 64) pairs = 64;

    uint32_t ccap = (uint32_t)(1.05 * sz) + 257 * 257 * 3 + 4096;
    uint8_t* ours_c = malloc(ccap);
    uint8_t* ref_c = NULL;
    unsigned int ref_csz = 0;
    int64_t our_csz = 0;

    double re[64], oe[64], er[64];
    /* warmup both */
    ref_c = rans_compress_to_4x16(data, (unsigned)sz, NULL, &ref_csz,
                                  order);
    our_csz = fqz5_rans_compress(data, (uint32_t)sz, order, ours_c, ccap);
    if (!ref_c || our_csz < 0) { fprintf(stderr, "enc fail\n"); return 1; }
    for (int p = 0; p < pairs; p++) {
        double t0 = now_s();
        unsigned int cl = 0;
        uint8_t* c = rans_compress_to_4x16(data, (unsigned)sz, NULL,
                                           &cl, order);
        double t1 = now_s();
        (void)fqz5_rans_compress(data, (uint32_t)sz, order, ours_c, ccap);
        double t2 = now_s();
        free(c);
        re[p] = t1 - t0;
        oe[p] = t2 - t1;
        er[p] = oe[p] / re[p];
    }
    double enc_ratio = median(er, pairs);
    double enc_ref = median(re, pairs), enc_our = median(oe, pairs);

    uint8_t* out_r = malloc(sz + 64);
    uint8_t* out_o = malloc(sz + 64);
    double rd[64], od[64], dr[64];
    unsigned int ulen = (unsigned)sz;
    if (!rans_uncompress_to_4x16(ref_c, ref_csz, out_r, &ulen))
        { fprintf(stderr, "ref dec fail\n"); return 1; }
    if (fqz5_rans_uncompress(ours_c, (uint32_t)our_csz, out_o,
                             (uint32_t)sz + 64, (uint32_t)sz, 1) != sz)
        { fprintf(stderr, "our dec fail\n"); return 1; }
    if (memcmp(out_r, data, sz) || memcmp(out_o, data, sz))
        { fprintf(stderr, "roundtrip mismatch\n"); return 1; }
    for (int p = 0; p < pairs; p++) {
        double t0 = now_s();
        ulen = (unsigned)sz;
        (void)rans_uncompress_to_4x16(ref_c, ref_csz, out_r, &ulen);
        double t1 = now_s();
        (void)fqz5_rans_uncompress(ours_c, (uint32_t)our_csz, out_o,
                                   (uint32_t)sz + 64, (uint32_t)sz, 1);
        double t2 = now_s();
        rd[p] = t1 - t0;
        od[p] = t2 - t1;
        dr[p] = od[p] / rd[p];
    }
    double dec_ratio = median(dr, pairs);
    double dec_ref = median(rd, pairs), dec_our = median(od, pairs);

    printf("{\"order\": \"%#x\", \"bytes\": %ld, "
           "\"csz_ours\": %lld, \"csz_ref\": %u, "
           "\"enc_ours_MBps\": %.1f, \"enc_ref_MBps\": %.1f, "
           "\"enc_ratio_ours_over_ref_time\": %.3f, "
           "\"dec_ours_MBps\": %.1f, \"dec_ref_MBps\": %.1f, "
           "\"dec_ratio_ours_over_ref_time\": %.3f}\n",
           order, sz, (long long)our_csz, ref_csz,
           sz / enc_our / 1e6, sz / enc_ref / 1e6, enc_ratio,
           sz / dec_our / 1e6, sz / dec_ref / 1e6, dec_ratio);
    free(data); free(ours_c); free(ref_c); free(out_r); free(out_o);
    return 0;
}
