// Host-side data-movement primitives for the vectorised FASTQ
// parser/formatter (fqzcomp5_tpu/fastq_fast.py).
//
// The reference parses with kseq's per-record C loop
// (/root/reference/kseq.h:177-218); our parser instead computes record
// ranges vectorially in numpy and materialises the SoA buffers with
// these two memcpy kernels, which replace O(total) cumsum index builds
// (3 passes over int64 indexes) with a single linear copy pass.

#include <cstdint>
#include <cstring>

extern "C" {

// Concatenate data[starts[i]:ends[i]] into out.  Returns bytes written.
int64_t fqz5_gather_ranges(const uint8_t* data, const int64_t* starts,
                           const int64_t* ends, int64_t n, uint8_t* out) {
    uint8_t* p = out;
    for (int64_t i = 0; i < n; i++) {
        int64_t len = ends[i] - starts[i];
        if (len <= 0) continue;
        memcpy(p, data + starts[i], size_t(len));
        p += len;
    }
    return p - out;
}

// Scatter consecutive src slices of lens[i] to dst + dst_starts[i].
int64_t fqz5_scatter_ranges(uint8_t* dst, const int64_t* dst_starts,
                            const uint8_t* src, const int64_t* lens,
                            int64_t n) {
    const uint8_t* p = src;
    for (int64_t i = 0; i < n; i++) {
        int64_t len = lens[i];
        if (len <= 0) continue;
        memcpy(dst + dst_starts[i], p, size_t(len));
        p += len;
    }
    return p - src;
}

}  // extern "C"
