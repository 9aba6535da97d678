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
    size_t last_len = 0;
    for (int64_t i = 0; i < nrec; i++) {
        if (p >= end) return -1;
        // names come from decompression: a crafted final entry may
        // lack its NUL, so every compare must stay inside the buffer
        size_t len = strnlen((const char*)p, size_t(end - p));
        uint32_t flag = 0;
        if (len > 1 && p[len - 1] == '2' && p[len - 2] == '/')
            flag = 128;  // FQZ_FREAD2
        else if (last_name && len == last_len &&
                 memcmp(p, last_name, len) == 0)
            flag = 128;
        flags[i] = flag;
        if (!flag) { last_name = p; last_len = len; }
        p += len + 1;
    }
    return nrec;
}

// Name-section strategy-2 splitter/joiner (fqzcomp5.c:1408-1794
// semantics; see fqzcomp5_tpu/names.py for the mixed-comment
// deviation).  The Python per-record loops cost ~2s per 16MB of names.

// Split NUL-separated names into ID stream (NUL-separated), per-record
// flag bytes and comment stream (NUL-separated; present for every
// record when any record has a comment).  Returns nrec or -1.
int64_t fqz5_split_names(const uint8_t* in, int64_t len,
                         uint8_t* ids, int64_t* ids_len,
                         uint8_t* flags,
                         uint8_t* comments, int64_t* com_len) {
    // pass 1: any separator anywhere => comment stream exists
    bool has_com = false;
    for (int64_t i = 0; i < len; i++) {
        if (in[i] == ' ' || in[i] == '\t') { has_com = true; break; }
    }
    uint8_t* ip = ids;
    uint8_t* cp = comments;
    int64_t nrec = 0;
    int64_t i = 0;
    while (i < len) {
        const uint8_t* nul = (const uint8_t*)memchr(in + i, 0, len - i);
        int64_t j = nul ? nul - in : len;
        int64_t w1end = j, w2 = -1;
        uint8_t f = 0;
        for (int64_t k = i; k < j; k++) {
            if (in[k] == ' ' || in[k] == '\t') {
                w1end = k;
                w2 = k + 1;
                f |= 4;
                if (in[k] != ' ') f |= 8;
                break;
            }
        }
        if (w1end - i > 1 && in[w1end - 2] == '/') {
            if (in[w1end - 1] == '1') { f |= 1; w1end -= 2; }
            else if (in[w1end - 1] == '2') { f |= 3; w1end -= 2; }
        }
        flags[nrec++] = f;
        memcpy(ip, in + i, size_t(w1end - i));
        ip += w1end - i;
        *ip++ = 0;
        if (has_com) {
            if (w2 >= 0) {
                memcpy(cp, in + w2, size_t(j - w2));
                cp += j - w2;
            }
            *cp++ = 0;
        }
        i = j + 1;
    }
    *ids_len = ip - ids;
    *com_len = cp - comments;
    return nrec;
}

// Rebuild names from the three streams; fills fread2[r] with 128 where
// (f&3)==3.  Returns name_buf length or -1.
int64_t fqz5_join_names(const uint8_t* ids, int64_t ids_len,
                        const uint8_t* flags, int64_t nflags,
                        const uint8_t* comments, int64_t com_len,
                        uint8_t* out, uint32_t* fread2) {
    uint8_t* op = out;
    const uint8_t* idp = ids;
    const uint8_t* idend = ids + ids_len;
    const uint8_t* cp = comments;
    const uint8_t* cend = comments + com_len;
    int64_t r = 0;
    while (idp < idend) {
        const uint8_t* nul = (const uint8_t*)memchr(idp, 0, idend - idp);
        int64_t idlen = nul ? nul - idp : idend - idp;
        memcpy(op, idp, size_t(idlen));
        op += idlen;
        uint8_t f = r < nflags ? flags[r] : 0;
        if (f & 1) {
            *op++ = '/';
            *op++ = (f & 2) ? '2' : '1';
        }
        if (f & 4) *op++ = (f & 8) ? '\t' : ' ';
        if (com_len) {
            // one comment entry consumed per record while any remain
            if (cp <= cend) {
                const uint8_t* cn =
                    (const uint8_t*)memchr(cp, 0, cend - cp);
                int64_t cl = cn ? cn - cp : cend - cp;
                memcpy(op, cp, size_t(cl));
                op += cl;
                cp = cn ? cn + 1 : cend + 1;  // past-end stops consuming
            }
        }
        *op++ = 0;
        fread2[r] = ((f & 3) == 3) ? 128 : 0;
        r++;
        idp = nul ? nul + 1 : idend;
    }
    return op - out;
}

// Single-pass SoA builder: materialise the name/seq/qual buffers,
// record lengths and FREAD2 flags from parsed record ranges in one
// walk over the chunk (replaces four numpy gather/scatter passes in
// fastq_fast.build_batch — the kseq-loop analog, fqzcomp5.c:423-623).
// name_buf gets NUL separators and the kseq tab->space normalisation;
// qual bytes are rebased to q-33.  Returns the name_buf length.
int64_t fqz5_build_soa(const uint8_t* data, int64_t nrec,
                       const int64_t* name_s, const int64_t* name_e,
                       const int64_t* core_len,
                       const int64_t* seq_s, const int64_t* seq_e,
                       const int64_t* qual_s,
                       uint8_t* name_buf, uint8_t* seq_buf,
                       uint8_t* qual_buf, uint32_t* lens,
                       uint32_t* flags) {
    uint8_t* np_ = name_buf;
    uint8_t* sp = seq_buf;
    uint8_t* qp = qual_buf;
    const uint8_t* prev_name = nullptr;
    int64_t prev_len = 0;
    for (int64_t i = 0; i < nrec; i++) {
        int64_t nl = name_e[i] - name_s[i];
        memcpy(np_, data + name_s[i], size_t(nl));
        if (core_len[i] < nl && np_[core_len[i]] == '\t')
            np_[core_len[i]] = ' ';
        uint32_t flag = 0;
        if (nl > 1 && np_[nl - 1] == '2' && np_[nl - 2] == '/')
            flag = 128;  // FQZ_FREAD2
        else if (i && nl == prev_len &&
                 memcmp(np_, prev_name, size_t(nl)) == 0)
            flag = 128;
        prev_name = np_;
        prev_len = nl;
        np_ += nl;
        *np_++ = 0;
        int64_t L = seq_e[i] - seq_s[i];
        memcpy(sp, data + seq_s[i], size_t(L));
        sp += L;
        const uint8_t* q = data + qual_s[i];
        for (int64_t k = 0; k < L; k++) qp[k] = uint8_t(q[k] - 33);
        qp += L;
        lens[i] = uint32_t(L);
        flags[i] = flag;
    }
    return np_ - name_buf;
}

// Single-pass FASTQ text assembly (decode-side inverse of
// fqz5_build_soa; replaces a 5-pass numpy gather/scatter pipeline).
// Record: '@' name '\n' seq '\n' '+' [name] '\n' (qual+33) '\n'.
// Returns bytes written, or -1 if the name buffer is malformed.
int64_t fqz5_format_fastq(const uint8_t* names, int64_t names_len,
                          const uint8_t* seq, const uint8_t* qual,
                          const uint32_t* lens, int64_t nrec,
                          int plus_name, uint8_t* out) {
    const uint8_t* np_ = names;
    const uint8_t* nend = names + names_len;
    const uint8_t* sp = seq;
    const uint8_t* qp = qual;
    uint8_t* o = out;
    for (int64_t i = 0; i < nrec; i++) {
        const uint8_t* ne = static_cast<const uint8_t*>(
            memchr(np_, 0, size_t(nend - np_)));
        if (!ne) return -1;
        size_t nl = size_t(ne - np_);
        *o++ = '@';
        memcpy(o, np_, nl);
        o += nl;
        *o++ = '\n';
        size_t L = lens[i];
        memcpy(o, sp, L);
        o += L;
        sp += L;
        *o++ = '\n';
        *o++ = '+';
        if (plus_name) {
            memcpy(o, np_, nl);
            o += nl;
        }
        *o++ = '\n';
        for (size_t k = 0; k < L; k++) o[k] = uint8_t(qp[k] + 33);
        o += L;
        qp += L;
        *o++ = '\n';
        np_ = ne + 1;
    }
    return o - out;
}

int64_t fqz5_sum_i64(const int64_t* a, int64_t n) {
    int64_t s = 0;
    for (int64_t i = 0; i < n; i++) s += a[i];
    return s;
}

// Block-packing cut (fqzcomp5.c:470-478 accounting): scan records
// starting at `cur`, accumulating acc[i] = core_len + 1 + 2*seq_len,
// until the running total would exceed `budget`.  Returns the number
// of records taken (at least min_take) and writes their total
// accounted size to *taken_out.
int64_t fqz5_pack_cut(const int64_t* core_len, const int64_t* seq_s,
                      const int64_t* seq_e, int64_t n, int64_t cur,
                      int64_t budget, int64_t min_take,
                      int64_t* taken_out) {
    int64_t total = 0, k = 0;
    for (int64_t i = cur; i < n; i++) {
        int64_t a = core_len[i] + 1 + 2 * (seq_e[i] - seq_s[i]);
        if (k >= min_take && total + a > budget) break;
        total += a;
        k++;
        if (total > budget) break;  // budget exhausted mid-take
    }
    *taken_out = total;
    return k;
}

// Decode `count` consecutive big-endian base-128 u32 varints
// (htscodecs varint.h:267-290 semantics: at most 5 continuation bytes
// honoured per value).  Returns the new offset, or -1 on truncation.
// C replacement for the numpy-vectorised utils/varint.py walk so the
// decode CLI path stays numpy-free (cold-start: numpy is ~300ms).
int64_t fqz5_varint_get_u32_array(const uint8_t* in, int64_t in_size,
                                  int64_t off, int64_t count,
                                  uint32_t* out) {
    for (int64_t i = 0; i < count; i++) {
        uint32_t j = 0;
        int n = 5;
        do {
            if (off >= in_size) return -1;
            uint8_t c = in[off++];
            j = (j << 7) | (c & 0x7F);
            if (!(c & 0x80)) break;
        } while (n-- > 0);
        out[i] = j;
    }
    return off;
}

// Encode `count` u32 values as big-endian base-128 varints.  `out`
// needs at most 5*count bytes.  Returns bytes written.
int64_t fqz5_varint_put_u32_array(const uint32_t* vals, int64_t count,
                                  uint8_t* out) {
    uint8_t* o = out;
    for (int64_t i = 0; i < count; i++) {
        uint32_t v = vals[i];
        uint8_t tmp[5];
        int k = 0;
        tmp[k++] = uint8_t(v & 0x7F);
        v >>= 7;
        while (v) {
            tmp[k++] = uint8_t((v & 0x7F) | 0x80);
            v >>= 7;
        }
        while (k) *o++ = tmp[--k];
    }
    return o - out;
}

}  // extern "C"
