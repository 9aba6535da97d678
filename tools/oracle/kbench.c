/* Reference-side rANS kernel micro-bench: times
 * rans_compress_to_4x16 / rans_uncompress_to_4x16 on a data file,
 * best-of-N, emitting one JSON line — the like-for-like counterpart
 * of tools/host_kernel_bench.py (our libfqz5 side).
 *
 * Build (after tools/oracle/build.sh):
 *   gcc -O2 -I/tmp/oracle -o /tmp/oracle/harness/kbench \
 *       tools/oracle/kbench.c /tmp/oracle/htscodecs/*.o \
 *       /tmp/oracle/bz2_stub.o -lm -lz -pthread
 *
 * Usage: kbench <file> <order-int-or-hex> <reps>
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "htscodecs/rANS_static4x16.h"

static double now_s(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: kbench <file> <order> <reps>\n");
        return 2;
    }
    FILE *f = fopen(argv[1], "rb");
    if (!f) { perror(argv[1]); return 1; }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    unsigned char *data = malloc(sz);
    if (fread(data, 1, sz, f) != (size_t)sz) { fclose(f); return 1; }
    fclose(f);

    int order = (int)strtol(argv[2], NULL, 0);
    int reps = atoi(argv[3]);

    unsigned int clen = 0;
    unsigned char *comp = NULL;
    double benc = 1e9;
    for (int r = 0; r < reps; r++) {
        free(comp);
        double t0 = now_s();
        comp = rans_compress_to_4x16(data, (unsigned int)sz, NULL,
                                     &clen, order);
        double dt = now_s() - t0;
        if (dt < benc) benc = dt;
        if (!comp) { fprintf(stderr, "encode failed\n"); return 1; }
    }

    unsigned int ulen = (unsigned int)sz;
    unsigned char *out = malloc(sz);
    double bdec = 1e9;
    for (int r = 0; r < reps; r++) {
        double t0 = now_s();
        unsigned char *got = rans_uncompress_to_4x16(comp, clen, out,
                                                     &ulen);
        double dt = now_s() - t0;
        if (dt < bdec) bdec = dt;
        if (!got) { fprintf(stderr, "decode failed\n"); return 1; }
    }
    if (memcmp(out, data, sz)) {
        fprintf(stderr, "roundtrip mismatch\n");
        return 1;
    }

    printf("{\"side\": \"reference\", \"order\": %d, \"bytes\": %ld, "
           "\"enc_MBps\": %.1f, \"dec_MBps\": %.1f, "
           "\"comp_bytes\": %u}\n",
           order, sz, sz / benc / 1e6, sz / bdec / 1e6, clen);
    return 0;
}
