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

// Single-pass clean 4-line FASTQ chunk scan, mirroring the numpy
// parse_chunk (fqzcomp5_tpu/fastq_fast.py) semantics exactly: returns
// -1 whenever the chunk needs the generic kseq-equivalent fallback
// (\r/\v/\f anywhere, malformed structure), else fills per-record
// line ranges for complete 4-line groups and the tail offset.
int64_t fqz5_parse_fastq_chunk(const uint8_t* data, int64_t size,
                               int64_t max_rec,
                               int64_t* name_s, int64_t* name_e,
                               int64_t* core_len,
                               int64_t* seq_s, int64_t* seq_e,
                               int64_t* qual_s,
                               int64_t* tail_out) {
    if (size <= 0) return -1;
    if (memchr(data, '\r', size_t(size)) ||
        memchr(data, '\v', size_t(size)) ||
        memchr(data, '\f', size_t(size)))
        return -1;

    int64_t nrec = 0;
    const uint8_t* base = data;
    const uint8_t* end = data + size;
    const uint8_t* p = data;
    while (nrec < max_rec) {
        const uint8_t* rec = p;
        // name line
        const uint8_t* nl1 = (const uint8_t*)memchr(p, '\n', size_t(end - p));
        if (!nl1) break;
        const uint8_t* sq = nl1 + 1;
        const uint8_t* nl2 = (const uint8_t*)memchr(sq, '\n',
                                                    size_t(end - sq));
        if (!nl2) break;
        const uint8_t* pl = nl2 + 1;
        const uint8_t* nl3 = (const uint8_t*)memchr(pl, '\n',
                                                    size_t(end - pl));
        if (!nl3) break;
        const uint8_t* ql = nl3 + 1;
        const uint8_t* nl4 = (const uint8_t*)memchr(ql, '\n',
                                                    size_t(end - ql));
        if (!nl4) break;
        // validations apply only to complete 4-line groups (the numpy
        // reference path checks within nfull only)
        if (*rec != '@') return -1;
        if (pl >= nl3 || *pl != '+') return -1;
        if (nl4 - ql != nl2 - sq) return -1;  // qual len != seq len

        name_s[nrec] = (rec - base) + 1;  // skip '@'
        name_e[nrec] = nl1 - base;
        // first space/tab bounds the core name
        int64_t nlen = nl1 - rec - 1;
        int64_t cl = nlen;
        for (const uint8_t* c = rec + 1; c < nl1; c++) {
            if (*c == ' ' || *c == '\t') { cl = c - rec - 1; break; }
        }
        core_len[nrec] = cl;
        seq_s[nrec] = sq - base;
        seq_e[nrec] = nl2 - base;
        qual_s[nrec] = ql - base;
        nrec++;
        p = nl4 + 1;
    }
    if (nrec == 0) return -1;
    *tail_out = p - base;
    return nrec;
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
