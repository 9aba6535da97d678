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

// Rebuild per-record FREAD2 flags from a NUL-separated name buffer,
// mirroring the decode-side fallback (fqzcomp5.c:2344-2374): flag when
// the name ends "/2" or equals the last unflagged name.
// Returns records processed, or -1 if the buffer ends early.
int64_t fqz5_derive_flags(const uint8_t* name_buf, int64_t buf_len,
                          int64_t nrec, uint32_t* flags) {
    const uint8_t* p = name_buf;
    const uint8_t* end = name_buf + buf_len;
    const uint8_t* last_name = nullptr;
    for (int64_t i = 0; i < nrec; i++) {
        if (p >= end) return -1;
        size_t len = strnlen((const char*)p, size_t(end - p));
        uint32_t flag = 0;
        if (len > 1 && p[len - 1] == '2' && p[len - 2] == '/')
            flag = 128;  // FQZ_FREAD2
        else if (last_name && strcmp((const char*)p,
                                     (const char*)last_name) == 0)
            flag = 128;
        flags[i] = flag;
        if (!flag) last_name = p;
        p += len + 1;
    }
    return nrec;
}

}  // extern "C"
