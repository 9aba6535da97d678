// Order-k nucleotide context codec ("SEQ" methods), wire-compatible
// with the reference encode_seq/decode_seq (fqzcomp5.c:1073-1406).
//
// Model: one 4-symbol adaptive model per 4^k k-mer context, driven by
// the shared range coder; a 3-state machine (upper ACGT / lower acgt /
// other) with run lengths handles case changes and ambiguity codes.
// Optional "both strands" mode shadow-updates the reverse-complement
// context after each base.  Contexts reset at record boundaries.

#include <cstdint>
#include <cstring>
#include <memory>
#include <vector>

#include "rc.h"

namespace fqz5 {
namespace {

enum State { kUpper = 0, kLower = 1, kOther = 2 };

// base codes: A/C/G/T -> 0..3, acgt -> 0x80..0x83, else 4 ('N' class)
struct Lut {
    int L[256];
    Lut() {
        for (int i = 0; i < 256; i++) L[i] = 4;
        L['A'] = 0; L['C'] = 1; L['G'] = 2; L['T'] = 3;
        L['a'] = 0x80; L['c'] = 0x81; L['g'] = 0x82; L['t'] = 0x83;
    }
};
const Lut kLut;

// Context seeds: 12-mers absent from the human genome (fqzcomp5.c:1104)
constexpr uint32_t kSeedFwd = 0x007616c7;
constexpr uint32_t kSeedRev = 0x2c6b62ff;

}  // namespace

int64_t seq_encode(const uint8_t* in, uint32_t in_size, const uint32_t* lens,
                   int nrecords, int both_strands, int ctx_size, uint8_t* out,
                   uint32_t out_cap) {
    if (out_cap < in_size + 100) return -1;
    const uint32_t msize = 1u << (2 * ctx_size);
    const uint32_t mask = msize - 1;
    const int* L = kLut.L;

    // One memset pass over a thread-cached arena: TinyModel<4> is 4
    // bytes of freq, all init to 1.  (Fresh allocation would cost a
    // kernel zeroing pass per call; the arena is reused across blocks.)
    static_assert(sizeof(TinyModel<4>) == 4, "model layout");
    static thread_local std::unique_ptr<uint8_t[]> model_mem;
    static thread_local size_t model_cap = 0;
    if (model_cap < size_t(msize) * 4) {
        // Reserve the largest context size up front: allocation is
        // virtual (pages fault in lazily, only for the prefix each
        // context order actually touches), and never reallocating
        // avoids re-faulting pages on every growth step.
        model_cap = size_t(1) << 30;  // 4^14 contexts * 4 bytes
        if (model_cap < size_t(msize) * 4) model_cap = size_t(msize) * 4;
        model_mem.reset(new uint8_t[model_cap + 64]);
    }
    // 64-align so each 16-model prefetch block is one cache line
    uint8_t* marena = reinterpret_cast<uint8_t*>(
        (reinterpret_cast<uintptr_t>(model_mem.get()) + 63) & ~uintptr_t(63));
    memset(marena, 1, size_t(msize) * 4);
    TinyModel<4>* seq_model = reinterpret_cast<TinyModel<4>*>(marena);
    TinyModel<2> state_model[3];
    AdaptiveModel<256, 16> run_len[3];
    AdaptiveModel<256, 16> literal;
    for (int i = 0; i < 3; i++) {
        state_model[i].init();
        run_len[i].init(256);
    }
    literal.init(256);

    RangeCoder rc;
    rc.start_encode(out);
    // in_size+100 is heuristic — N/run escapes on adversarial input
    // can expand past it; the guard turns that into a clean -1 (rc.h)
    rc.set_output_end(out + out_cap);

    uint32_t last = kSeedFwd & mask;
    uint32_t last2 = (kSeedRev >> (32 - 2 * ctx_size)) & mask;
    State state = kUpper;
    int nseq = 0;
    int64_t seq_len = nseq < nrecords ? int64_t(lens[nseq++]) : 0;

    for (uint32_t i = 0; i < in_size;) {
        // length of run staying in the current symbol class
        uint32_t j = i;
        switch (state) {
            case kUpper:
                while (j < in_size && L[in[j]] < 4) j++;
                break;
            case kLower:
                while (j < in_size && L[in[j]] >= 0x80) j++;
                break;
            case kOther:
                while (j < in_size && L[in[j]] == 4) j++;
                break;
        }
        uint32_t run = j - i;
        uint32_t r2 = run;
        for (;;) {
            run_len[state].encode(rc, uint16_t(r2 < 255 ? r2 : 255));
            if (r2 >= 255)
                r2 -= 255;
            else
                break;
        }

        if (state == kUpper || state == kLower) {
            for (uint32_t k = 0; k < run; k++) {
                uint8_t b = uint8_t(L[in[i + k]] & 3);
                seq_model[last].encode(rc, b);
                last = ((last << 2) + b) & mask;
                // The walk is DRAM-latency bound (the model array is
                // 4^k * 4 bytes); a 1-ahead prefetch cannot hide the
                // miss.  Bases are known ahead on encode, so prefetch
                // the EXACT context 3 iterations out (the reference's
                // scheme, fqzcomp5.c:1176-1183).
                uint32_t nb = i + k + 3 < in_size
                    ? uint32_t(L[in[i + k + 1]] & 3) * 16 +
                      uint32_t(L[in[i + k + 2]] & 3) * 4 +
                      uint32_t(L[in[i + k + 3]] & 3)
                    : 0;
                __builtin_prefetch(
                    &seq_model[(((last << 6) & mask) + nb) & mask]);
                if (both_strands) {
                    int b2 = last2 & 3;
                    last2 = last2 / 4 + ((3 - b) << (2 * ctx_size - 2));
                    seq_model[last2].update(b2);
                    // exact bottom-strand context 3 ahead
                    // (fqzcomp5.c:1192-1198: "~25% speed gain")
                    uint32_t r3 = i + k + 3 < in_size
                        ? uint32_t(L[in[i + k + 1]] & 3) +
                          uint32_t(L[in[i + k + 2]] & 3) * 4 +
                          uint32_t(L[in[i + k + 3]] & 3) * 16
                        : 0;
                    __builtin_prefetch(
                        &seq_model[((last2 >> 6) +
                                    ((0x3f - r3)
                                     << (2 * ctx_size - 6))) & mask]);
                }
                if (--seq_len == 0 && i + k + 1 < in_size) {
                    if (nseq >= nrecords) return -1;
                    seq_len = int64_t(lens[nseq++]);
                    last = kSeedFwd & mask;
                    last2 = (kSeedRev >> (32 - 2 * ctx_size)) & mask;
                }
            }
        } else {
            for (uint32_t k = 0; k < run; k++) {
                literal.encode(rc, in[i + k]);
                if (--seq_len == 0 && i + k + 1 < in_size) {
                    if (nseq >= nrecords) return -1;
                    seq_len = int64_t(lens[nseq++]);
                    last = kSeedFwd & mask;
                    last2 = (kSeedRev >> (32 - 2 * ctx_size)) & mask;
                }
            }
        }

        i += run;
        if (i >= in_size) break;

        // transition to the next class
        int code = L[in[i]];
        if (code < 4) {
            state_model[state].encode(rc, 0);
            state = kUpper;
        } else if (code >= 0x80) {
            state_model[state].encode(rc, state == kOther);
            state = kLower;
        } else {
            state_model[state].encode(rc, 1);
            state = kOther;
        }
    }

    rc.finish_encode();
    if (rc.error()) return -1;  // output exceeded the heuristic cap
    return int64_t(rc.out_size());
}

int64_t seq_decode(const uint8_t* in, uint32_t in_size, const uint32_t* lens,
                   int nrecords, int both_strands, int ctx_size, uint8_t* out,
                   uint32_t out_size) {
    const uint32_t msize = 1u << (2 * ctx_size);
    const uint32_t mask = msize - 1;

    // One memset pass over a thread-cached arena: TinyModel<4> is 4
    // bytes of freq, all init to 1.  (Fresh allocation would cost a
    // kernel zeroing pass per call; the arena is reused across blocks.)
    static_assert(sizeof(TinyModel<4>) == 4, "model layout");
    static thread_local std::unique_ptr<uint8_t[]> model_mem;
    static thread_local size_t model_cap = 0;
    if (model_cap < size_t(msize) * 4) {
        // Reserve the largest context size up front: allocation is
        // virtual (pages fault in lazily, only for the prefix each
        // context order actually touches), and never reallocating
        // avoids re-faulting pages on every growth step.
        model_cap = size_t(1) << 30;  // 4^14 contexts * 4 bytes
        if (model_cap < size_t(msize) * 4) model_cap = size_t(msize) * 4;
        model_mem.reset(new uint8_t[model_cap + 64]);
    }
    // 64-align so each 16-model prefetch block is one cache line
    uint8_t* marena = reinterpret_cast<uint8_t*>(
        (reinterpret_cast<uintptr_t>(model_mem.get()) + 63) & ~uintptr_t(63));
    memset(marena, 1, size_t(msize) * 4);
    TinyModel<4>* seq_model = reinterpret_cast<TinyModel<4>*>(marena);
    TinyModel<2> state_model[3];
    AdaptiveModel<256, 16> run_len[3];
    AdaptiveModel<256, 16> literal;
    for (int i = 0; i < 3; i++) {
        state_model[i].init();
        run_len[i].init(256);
    }
    literal.init(256);

    RangeCoder rc;
    rc.start_decode(in, in + in_size);

    uint32_t last = kSeedFwd & mask;
    uint32_t last2 = (kSeedRev >> (32 - 2 * ctx_size)) & mask;
    State state = kUpper;
    int nseq = 0;
    int64_t seq_len = nseq < nrecords ? int64_t(lens[nseq++]) : 0;

    int zero_runs = 0;  // corrupt-stream progress guard
    for (uint32_t i = 0; i < out_size;) {
        uint32_t run = 0, r2;
        do {
            r2 = run_len[state].decode(rc);
            run += r2;
            // a valid stream's run never exceeds the remaining output
            // (corrupt data at coder exhaustion can loop on 255s)
            if (run > out_size) return -1;
        } while (r2 == 255);
        if (i + run > out_size) run = out_size - i;
        // zero-length runs are legal only as the opening prelude; a
        // corrupt stream cycling the state machine without emitting
        // output would otherwise never terminate
        if (run == 0) {
            if (++zero_runs > 2) return -1;
        } else {
            zero_runs = 0;
        }

        if (state == kUpper || state == kLower) {
            const char* bases = state == kLower ? "acgt" : "ACGT";
            for (uint32_t k = 0; k < run; k++) {
                uint8_t b = uint8_t(seq_model[last].decode(rc));
                last = ((last << 2) + b) & mask;
                // Bases are unknown ahead on decode; prefetch the
                // 2-ahead candidate block instead — all 16 possible
                // contexts span 16*4 = 64 bytes, one cache line
                // (reference scheme, fqzcomp5.c:1339-1343).
                __builtin_prefetch(&seq_model[(last << 4) & mask]);
                out[i + k] = uint8_t(bases[b]);
                if (both_strands) {
                    int b2 = last2 & 3;
                    last2 = last2 / 4 + ((3 - b) << (2 * ctx_size - 2));
                    seq_model[last2].update(b2);
                }
                if (--seq_len == 0 && i + k + 1 < out_size) {
                    if (nseq >= nrecords) return -1;
                    seq_len = int64_t(lens[nseq++]);
                    last = kSeedFwd & mask;
                    last2 = (kSeedRev >> (32 - 2 * ctx_size)) & mask;
                }
            }
        } else {
            for (uint32_t k = 0; k < run; k++) {
                out[i + k] = uint8_t(literal.decode(rc));
                if (--seq_len == 0 && i + k + 1 < out_size) {
                    if (nseq >= nrecords) return -1;
                    seq_len = int64_t(lens[nseq++]);
                    last = kSeedFwd & mask;
                    last2 = (kSeedRev >> (32 - 2 * ctx_size)) & mask;
                }
            }
        }

        i += run;
        if (i >= out_size) break;

        int nstate = state_model[state].decode(rc);
        switch (state) {
            case kUpper: state = nstate ? kOther : kLower; break;
            case kLower: state = nstate ? kOther : kUpper; break;
            case kOther: state = nstate ? kLower : kUpper; break;
        }
    }
    return out_size;
}

}  // namespace fqz5

extern "C" {
int64_t fqz5_seq_encode(const uint8_t* in, uint32_t in_size,
                        const uint32_t* lens, int nrecords, int both_strands,
                        int ctx_size, uint8_t* out, uint32_t out_cap) {
    return fqz5::seq_encode(in, in_size, lens, nrecords, both_strands,
                            ctx_size, out, out_cap);
}
int64_t fqz5_seq_decode(const uint8_t* in, uint32_t in_size,
                        const uint32_t* lens, int nrecords, int both_strands,
                        int ctx_size, uint8_t* out, uint32_t out_size) {
    return fqz5::seq_decode(in, in_size, lens, nrecords, both_strands,
                            ctx_size, out, out_size);
}
}
