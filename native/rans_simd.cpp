// AVX2 cores for the 32-state rANS Nx16 decoder hot loops.
//
// Same wire format and state walk as the scalar templates in rans.cpp
// (32 interleaved states, 16-bit renormalisation); the SIMD mapping
// puts 8 states in each of four YMM registers.  Renormalisation uses a
// startup-generated 256-entry permutation LUT: the 8-bit "needs a
// word" mask spreads the next popcount(mask) stream words across the
// needing lanes in lane order.
//
// The wrappers only run the full-group main loops; callers keep the
// scalar table parsing, state init and tail handling, so byte
// behaviour is identical to the scalar templates.

#include <cstdint>
#include <cstring>
#include <cstdlib>

extern "C" int fqz5_have_avx2();

#if defined(__AVX2__)
#include <immintrin.h>

namespace {

constexpr uint32_t kRansL = 1u << 15;

struct PermLut {
    alignas(32) uint32_t idx[256][8];
    PermLut() {
        for (int m = 0; m < 256; m++) {
            int k = 0;
            for (int lane = 0; lane < 8; lane++)
                idx[m][lane] = (m >> lane) & 1 ? uint32_t(k++) : 0u;
        }
    }
};
const PermLut kPerm;

inline __m256i renorm8(__m256i R, const uint8_t*& ptr,
                       const uint8_t* limit) {
    const __m256i vL = _mm256_set1_epi32(int(kRansL));
    __m256i ge = _mm256_cmpeq_epi32(_mm256_max_epu32(R, vL), R);
    __m256i need = _mm256_xor_si256(ge, _mm256_set1_epi32(-1));
    int m8 = _mm256_movemask_ps(_mm256_castsi256_ps(need));
    if (!m8) return R;
    if (ptr + 16 > limit) {  // near stream end: scalar bound checks
        alignas(32) uint32_t r[8];
        _mm256_store_si256((__m256i*)r, R);
        for (int z = 0; z < 8; z++) {
            if (r[z] < kRansL && ptr + 1 < limit) {
                r[z] = (r[z] << 16) |
                       (uint32_t(ptr[0]) | (uint32_t(ptr[1]) << 8));
                ptr += 2;
            }
        }
        return _mm256_load_si256((const __m256i*)r);
    }
    __m128i w16 = _mm_loadu_si128((const __m128i*)ptr);
    __m256i w32 = _mm256_cvtepu16_epi32(w16);
    __m256i pidx = _mm256_load_si256((const __m256i*)kPerm.idx[m8]);
    __m256i words = _mm256_permutevar8x32_epi32(w32, pidx);
    __m256i shifted = _mm256_or_si256(_mm256_slli_epi32(R, 16), words);
    R = _mm256_blendv_epi8(R, shifted, need);
    ptr += 2 * __builtin_popcount(unsigned(m8));
    return R;
}

// Branch-free renorm for the windowed fast path: the caller
// guarantees 16 readable bytes at ptr (sliding overflow window), so
// there is no early-out branch and no bound check — the reference
// AVX2 core's structure (rANS_static32x16pr_avx2.c:586-614), which
// measured ~5% faster than the branching form on mixed-density
// renorm patterns (round 5).
inline __m256i renorm8_fast(__m256i R, const uint8_t*& ptr) {
    // 2-op unsigned compare (ref's _mm256_cmplt_epu32_imm)
    __m256i need = _mm256_cmpgt_epi32(
        _mm256_set1_epi32(int(kRansL - 0x80000000u)),
        _mm256_xor_si256(R, _mm256_set1_epi32(int(0x80000000u))));
    int m8 = _mm256_movemask_ps(_mm256_castsi256_ps(need));
    __m128i w16 = _mm_loadu_si128((const __m128i*)ptr);
    __m256i w32 = _mm256_cvtepu16_epi32(w16);
    __m256i pidx = _mm256_load_si256((const __m256i*)kPerm.idx[m8]);
    __m256i words = _mm256_permutevar8x32_epi32(w32, pidx);
    __m256i shifted = _mm256_or_si256(_mm256_slli_epi32(R, 16), words);
    R = _mm256_blendv_epi8(R, shifted, need);
    ptr += 2 * __builtin_popcount(unsigned(m8));
    return R;
}

// Sliding 128-byte overflow window: while >=64 real bytes remain the
// walk reads the stream directly; near the end it switches into a
// zero-padded local window so the inner loop never bound-checks
// (reference overflow[] scheme).  One iteration consumes <= 64 bytes.
struct StreamWin {
    const uint8_t* cp;
    const uint8_t* limit;
    alignas(32) uint8_t win[128];
    const uint8_t* real_at_win0 = nullptr;  // real pos of win[0]
    bool ovf = false;

    StreamWin(const uint8_t* c, const uint8_t* l) : cp(c), limit(l) {}

    inline void ensure64() {
        if (!ovf) {
            if (limit - cp >= 64) return;
            size_t rem = size_t(limit - cp);
            memcpy(win, cp, rem);
            memset(win + rem, 0, sizeof win - rem);
            real_at_win0 = cp;
            cp = win;
            ovf = true;
        } else if (cp > win + 64) {
            size_t used = size_t(cp - win);
            memmove(win, cp, sizeof win - used);
            memset(win + sizeof win - used, 0, used);
            real_at_win0 += used;
            cp = win;
        }
    }

    const uint8_t* real_cp() const {
        if (!ovf) return cp;
        const uint8_t* r = real_at_win0 + (cp - win);
        return r < limit ? r : limit;  // zeros consumed: clamp (the
        // scalar tail then sees an exhausted stream; valid streams
        // never reach the zero pad)
    }
};

// 32 decoded symbols (4 groups' low bytes) -> out, in lane order
// (ref's packus_epi32/permute4x64/packus_epi16 trick).
inline void pack32_low_bytes(__m256i S0, __m256i S1, __m256i S2,
                             __m256i S3, uint8_t* out) {
    const __m256i vff = _mm256_set1_epi32(0xFF);
    __m256i a = _mm256_packus_epi32(_mm256_and_si256(S0, vff),
                                    _mm256_and_si256(S1, vff));
    __m256i b = _mm256_packus_epi32(_mm256_and_si256(S2, vff),
                                    _mm256_and_si256(S3, vff));
    a = _mm256_permute4x64_epi64(a, 0xd8);
    b = _mm256_permute4x64_epi64(b, 0xd8);
    __m256i c = _mm256_packus_epi16(a, b);
    c = _mm256_permute4x64_epi64(c, 0xd8);
    _mm256_storeu_si256((__m256i*)out, c);
}

// Emulated gather: hardware vpgatherdd is microcoded on every CPU
// carrying the Downfall mitigation (this image's Ice Lake-class Xeon
// included) and runs ~5-10x slower than scalar loads.  The index
// vector spills through a volatile array (stops the autovectorizer
// from fusing the loads back into a gather) and the lanes rebuild via
// two independent insert chains.  Reference default does the same
// (rANS_static32x16pr_avx2.c USE_GATHER off).
inline __m256i gather8(const uint32_t* tab, __m256i idx) {
    volatile uint32_t c[8] __attribute__((aligned(32)));
    _mm256_store_si256((__m256i*)(uint32_t*)c, idx);
    // four independent 2-lane builders + a merge tree: depth 3 with
    // 4-wide ILP (two serial 4-deep insert chains cost ~3% of the
    // whole decode walk; this is the reference's emulation shape)
    uint32_t b1 = tab[c[1]], b3 = tab[c[3]];
    uint32_t b5 = tab[c[5]], b7 = tab[c[7]];
    __m128i x0 = _mm_cvtsi32_si128(int(tab[c[0]]));
    __m128i x1 = _mm_cvtsi32_si128(int(tab[c[2]]));
    __m128i x2 = _mm_cvtsi32_si128(int(tab[c[4]]));
    __m128i x3 = _mm_cvtsi32_si128(int(tab[c[6]]));
    x0 = _mm_insert_epi32(x0, int(b1), 1);
    x1 = _mm_insert_epi32(x1, int(b3), 1);
    x2 = _mm_insert_epi32(x2, int(b5), 1);
    x3 = _mm_insert_epi32(x3, int(b7), 1);
    __m128i x01 = _mm_unpacklo_epi64(x0, x1);
    __m128i x23 = _mm_unpacklo_epi64(x2, x3);
    return _mm256_inserti128_si256(_mm256_castsi128_si256(x01), x23,
                                   1);
}

inline void pack8_low_bytes(__m256i S, uint8_t* dst) {
    __m256i b = _mm256_shuffle_epi8(
        S, _mm256_setr_epi8(0, 4, 8, 12, -1, -1, -1, -1, -1, -1, -1, -1,
                            -1, -1, -1, -1, 0, 4, 8, 12, -1, -1, -1, -1,
                            -1, -1, -1, -1, -1, -1, -1, -1));
    uint32_t lo = uint32_t(_mm256_extract_epi32(b, 0));
    uint32_t hi = uint32_t(_mm256_extract_epi32(b, 4));
    memcpy(dst, &lo, 4);
    memcpy(dst + 4, &hi, 4);
}

}  // namespace

extern "C" {

int fqz5_have_avx2() { return __builtin_cpu_supports("avx2") ? 1 : 0; }

// Order-0 main loop over full 32-symbol groups.  Updates *cp_io and R.
void fqz5_simd_dec_o0_32(const uint32_t* s3, int shift,
                         const uint8_t** cp_io, const uint8_t* limit,
                         uint32_t* Rs, uint8_t* out, uint32_t main_sz) {
    StreamWin w(*cp_io, limit);
    const uint32_t mask = (1u << shift) - 1;
    const __m256i vmask = _mm256_set1_epi32(int(mask));
    __m256i R[4];
    for (int g = 0; g < 4; g++)
        R[g] = _mm256_loadu_si256((const __m256i*)(Rs + 8 * g));

    for (uint32_t i = 0; i < main_sz; i += 32) {
        w.ensure64();  // the only bound handling per iteration
        // issue the four gathers back-to-back so their latency
        // overlaps; the state update + renorm of groups 0/1 runs
        // while 2/3's gathers are still in flight
        __m256i S[4];
        for (int g = 0; g < 4; g++)
            S[g] = gather8(s3, _mm256_and_si256(R[g], vmask));
        for (int g = 0; g < 4; g++) {
            __m256i f = _mm256_srli_epi32(S[g], shift + 8);
            __m256i b = _mm256_and_si256(_mm256_srli_epi32(S[g], 8),
                                         vmask);
            __m256i q = _mm256_srli_epi32(R[g], shift);
            R[g] = _mm256_add_epi32(_mm256_mullo_epi32(f, q), b);
            R[g] = renorm8_fast(R[g], w.cp);
        }
        pack32_low_bytes(S[0], S[1], S[2], S[3], out + i);
    }
    for (int g = 0; g < 4; g++)
        _mm256_storeu_si256((__m256i*)(Rs + 8 * g), R[g]);
    *cp_io = w.real_cp();
}

// Order-1 main loop: isz steps over 32 lanes, writing a transposed
// (isz x 32) buffer the caller must provide (tbuf), plus final last[].
void fqz5_simd_dec_o1_32(const uint32_t* s3o1, int shift,
                         const uint8_t** cp_io,
                         const uint8_t* limit, uint32_t* Rs,
                         uint8_t* lastv, uint8_t* tbuf, uint32_t isz) {
    // s3o1[(last << shift) + m] = ((f-1) << 20) | (start << 8) | sym:
    // ONE gather per lane per symbol (the two-table version gathered
    // sym and (f,start) separately; gathers dominate this loop)
    StreamWin w(*cp_io, limit);
    const uint32_t mask = (1u << shift) - 1;
    const __m256i vmask = _mm256_set1_epi32(int(mask));
    const __m256i vff = _mm256_set1_epi32(0xFF);
    const __m256i v12 = _mm256_set1_epi32(0xFFF);
    const __m256i v1 = _mm256_set1_epi32(1);
    __m256i R[4], last[4];
    for (int g = 0; g < 4; g++) {
        R[g] = _mm256_loadu_si256((const __m256i*)(Rs + 8 * g));
        alignas(32) uint32_t l32[8];
        for (int z = 0; z < 8; z++) l32[z] = lastv[8 * g + z];
        last[g] = _mm256_load_si256((const __m256i*)l32);
    }

    for (uint32_t i = 0; i < isz; i++) {
        w.ensure64();
        uint8_t* trow = tbuf + size_t(i) * 32;
        __m256i m[4], sv[4];
        for (int g = 0; g < 4; g++) {
            m[g] = _mm256_and_si256(R[g], vmask);
            __m256i sidx = _mm256_add_epi32(
                _mm256_slli_epi32(last[g], shift), m[g]);
            sv[g] = gather8(s3o1, sidx);
        }
        for (int g = 0; g < 4; g++) {
            __m256i c = _mm256_and_si256(sv[g], vff);
            __m256i f = _mm256_add_epi32(
                _mm256_srli_epi32(sv[g], 20), v1);
            __m256i st = _mm256_and_si256(_mm256_srli_epi32(sv[g], 8),
                                          v12);
            __m256i q = _mm256_srli_epi32(R[g], shift);
            R[g] = _mm256_sub_epi32(
                _mm256_add_epi32(_mm256_mullo_epi32(f, q), m[g]), st);
            last[g] = c;
            R[g] = renorm8_fast(R[g], w.cp);
        }
        pack32_low_bytes(sv[0], sv[1], sv[2], sv[3], trow);
    }
    for (int g = 0; g < 4; g++) {
        _mm256_storeu_si256((__m256i*)(Rs + 8 * g), R[g]);
        alignas(32) uint32_t l32[8];
        _mm256_store_si256((__m256i*)l32, last[g]);
        for (int z = 0; z < 8; z++) lastv[8 * g + z] = uint8_t(l32[z]);
    }
    *cp_io = w.real_cp();
}

}  // extern "C"

#else  // !__AVX2__

extern "C" {
int fqz5_have_avx2() { return 0; }
void fqz5_simd_dec_o0_32(const uint32_t*, int, const uint8_t**,
                         const uint8_t*, uint32_t*, uint8_t*, uint32_t) {}
void fqz5_simd_dec_o1_32(const uint32_t*, int,
                         const uint8_t**, const uint8_t*, uint32_t*,
                         uint8_t*, uint8_t*, uint32_t) {}
}

#endif

#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VL__)

namespace {

inline __m512i renorm16(__m512i R, const uint8_t*& ptr,
                        const uint8_t* limit) {
    const __m512i vL = _mm512_set1_epi32(int(kRansL));
    __mmask16 need = _mm512_cmplt_epu32_mask(R, vL);
    if (!need) return R;
    if (ptr + 32 > limit) {
        alignas(64) uint32_t r[16];
        _mm512_store_si512(r, R);
        for (int z = 0; z < 16; z++) {
            if (r[z] < kRansL && ptr + 1 < limit) {
                r[z] = (r[z] << 16) |
                       (uint32_t(ptr[0]) | (uint32_t(ptr[1]) << 8));
                ptr += 2;
            }
        }
        return _mm512_load_si512(r);
    }
    __m256i w16 = _mm256_loadu_si256((const __m256i*)ptr);
    __m512i w32 = _mm512_cvtepu16_epi32(w16);
    // spread the next popcount(need) words to the needing lanes in order
    __m512i words = _mm512_maskz_expand_epi32(need, w32);
    __m512i shifted = _mm512_or_si512(_mm512_slli_epi32(R, 16), words);
    R = _mm512_mask_mov_epi32(R, need, shifted);
    ptr += 2 * __builtin_popcount(unsigned(need));
    return R;
}

inline void pack16_low_bytes(__m512i S, uint8_t* dst) {
    __m128i b = _mm512_cvtepi32_epi8(S);
    _mm_storeu_si128((__m128i*)dst, b);
}

// Emulated 16-lane gather (see gather8 above: post-Downfall microcode
// makes vpgatherdd ~5-10x slower than scalar loads).  Four independent
// 4-insert chains keep the port-5 pressure spread.
inline __m512i gather16(const uint32_t* tab, __m512i idx) {
    volatile uint32_t c[16] __attribute__((aligned(64)));
    _mm512_store_si512((void*)(uint32_t*)c, idx);
    __m128i q0 = _mm_cvtsi32_si128(int(tab[c[0]]));
    __m128i q1 = _mm_cvtsi32_si128(int(tab[c[4]]));
    __m128i q2 = _mm_cvtsi32_si128(int(tab[c[8]]));
    __m128i q3 = _mm_cvtsi32_si128(int(tab[c[12]]));
    q0 = _mm_insert_epi32(q0, int(tab[c[1]]), 1);
    q1 = _mm_insert_epi32(q1, int(tab[c[5]]), 1);
    q2 = _mm_insert_epi32(q2, int(tab[c[9]]), 1);
    q3 = _mm_insert_epi32(q3, int(tab[c[13]]), 1);
    q0 = _mm_insert_epi32(q0, int(tab[c[2]]), 2);
    q1 = _mm_insert_epi32(q1, int(tab[c[6]]), 2);
    q2 = _mm_insert_epi32(q2, int(tab[c[10]]), 2);
    q3 = _mm_insert_epi32(q3, int(tab[c[14]]), 2);
    q0 = _mm_insert_epi32(q0, int(tab[c[3]]), 3);
    q1 = _mm_insert_epi32(q1, int(tab[c[7]]), 3);
    q2 = _mm_insert_epi32(q2, int(tab[c[11]]), 3);
    q3 = _mm_insert_epi32(q3, int(tab[c[15]]), 3);
    __m512i r = _mm512_castsi128_si512(q0);
    r = _mm512_inserti32x4(r, q1, 1);
    r = _mm512_inserti32x4(r, q2, 2);
    r = _mm512_inserti32x4(r, q3, 3);
    return r;
}

// Same, over a byte base with unaligned 32-bit loads (encode's strided
// input fetch).
inline __m512i gather16_bytes(const uint8_t* base, __m512i idx) {
    volatile uint32_t c[16] __attribute__((aligned(64)));
    _mm512_store_si512((void*)(uint32_t*)c, idx);
    alignas(64) uint32_t v[16];
    for (int k = 0; k < 16; k++) {
        uint32_t w;
        memcpy(&w, base + c[k], 4);
        v[k] = w;
    }
    return _mm512_load_si512(v);
}

}  // namespace

extern "C" int fqz5_have_avx512() {
    if (getenv("FQZ5_NO_AVX512")) return 0;
    return (__builtin_cpu_supports("avx512f") &&
            __builtin_cpu_supports("avx512bw") &&
            __builtin_cpu_supports("avx512vl"))
               ? 1
               : 0;
}

extern "C" void fqz5_simd512_dec_o0_32(const uint32_t* s3, int shift,
                                       const uint8_t** cp_io,
                                       const uint8_t* limit, uint32_t* Rs,
                                       uint8_t* out, uint32_t main_sz) {
    const uint8_t* cp = *cp_io;
    const uint32_t mask = (1u << shift) - 1;
    const __m512i vmask = _mm512_set1_epi32(int(mask));
    __m512i R[2];
    for (int g = 0; g < 2; g++)
        R[g] = _mm512_loadu_si512(Rs + 16 * g);

    // Software-pipelined: each iteration issues the NEXT iteration's
    // two gathers right after the state updates, so their latency
    // overlaps the renorm and output packing of the current one
    // (reference avx512 core does the same, :371-440).
    if (main_sz) {
        const __m512i vL = _mm512_set1_epi32(int(kRansL));
        __m512i S0 = _mm512_i32gather_epi32(
            _mm512_and_si512(R[0], vmask), (const int*)s3, 4);
        __m512i S1 = _mm512_i32gather_epi32(
            _mm512_and_si512(R[1], vmask), (const int*)s3, 4);
        for (uint32_t i = 0;;) {
            __m512i f0 = _mm512_srli_epi32(S0, shift + 8);
            __m512i f1 = _mm512_srli_epi32(S1, shift + 8);
            __m512i b0 = _mm512_and_si512(_mm512_srli_epi32(S0, 8),
                                          vmask);
            __m512i b1 = _mm512_and_si512(_mm512_srli_epi32(S1, 8),
                                          vmask);
            if (cp + 64 <= limit) {
                // renorm words for group 0 load BEFORE the multiply
                // chain completes; one bound check covers both groups
                // (each consumes <= 32 bytes)
                __m256i wa = _mm256_loadu_si256((const __m256i*)cp);
                R[0] = _mm512_add_epi32(
                    _mm512_mullo_epi32(_mm512_srli_epi32(R[0], shift),
                                       f0),
                    b0);
                R[1] = _mm512_add_epi32(
                    _mm512_mullo_epi32(_mm512_srli_epi32(R[1], shift),
                                       f1),
                    b1);
                __mmask16 n0 = _mm512_cmplt_epu32_mask(R[0], vL);
                __m512i v0 = _mm512_maskz_expand_epi32(
                    n0, _mm512_cvtepu16_epi32(wa));
                R[0] = _mm512_mask_mov_epi32(
                    R[0], n0,
                    _mm512_or_si512(_mm512_slli_epi32(R[0], 16), v0));
                cp += 2 * __builtin_popcount(unsigned(n0));
                __m256i wb = _mm256_loadu_si256((const __m256i*)cp);
                __mmask16 n1 = _mm512_cmplt_epu32_mask(R[1], vL);
                __m512i v1 = _mm512_maskz_expand_epi32(
                    n1, _mm512_cvtepu16_epi32(wb));
                R[1] = _mm512_mask_mov_epi32(
                    R[1], n1,
                    _mm512_or_si512(_mm512_slli_epi32(R[1], 16), v1));
                cp += 2 * __builtin_popcount(unsigned(n1));
            } else {
                R[0] = _mm512_add_epi32(
                    _mm512_mullo_epi32(_mm512_srli_epi32(R[0], shift),
                                       f0),
                    b0);
                R[1] = _mm512_add_epi32(
                    _mm512_mullo_epi32(_mm512_srli_epi32(R[1], shift),
                                       f1),
                    b1);
                R[0] = renorm16(R[0], cp, limit);
                R[1] = renorm16(R[1], cp, limit);
            }
            __m512i So0 = S0, So1 = S1;
            uint32_t inext = i + 32;
            if (inext < main_sz) {
                S0 = _mm512_i32gather_epi32(
                    _mm512_and_si512(R[0], vmask), (const int*)s3, 4);
                S1 = _mm512_i32gather_epi32(
                    _mm512_and_si512(R[1], vmask), (const int*)s3, 4);
            }
            pack16_low_bytes(So0, out + i);
            pack16_low_bytes(So1, out + i + 16);
            i = inext;
            if (i >= main_sz) break;
        }
    }
    for (int g = 0; g < 2; g++) _mm512_storeu_si512(Rs + 16 * g, R[g]);
    *cp_io = cp;
}

extern "C" void fqz5_simd512_dec_o1_32(const uint32_t* s3o1,
                                       int shift,
                                       const uint8_t** cp_io,
                                       const uint8_t* limit, uint32_t* Rs,
                                       uint8_t* lastv, uint8_t* tbuf,
                                       uint32_t isz) {
    // merged (f-1)<<20|start<<8|sym table: one gather per lane/symbol
    const uint8_t* cp = *cp_io;
    const uint32_t mask = (1u << shift) - 1;
    const __m512i vmask = _mm512_set1_epi32(int(mask));
    const __m512i vff = _mm512_set1_epi32(0xFF);
    const __m512i v12 = _mm512_set1_epi32(0xFFF);
    const __m512i v1 = _mm512_set1_epi32(1);
    __m512i R[2], last[2];
    for (int g = 0; g < 2; g++) {
        R[g] = _mm512_loadu_si512(Rs + 16 * g);
        alignas(64) uint32_t l32[16];
        for (int z = 0; z < 16; z++) l32[z] = lastv[16 * g + z];
        last[g] = _mm512_load_si512(l32);
    }

    for (uint32_t i = 0; i < isz; i++) {
        uint8_t* trow = tbuf + size_t(i) * 32;
        __m512i m[2], sv[2];
        for (int g = 0; g < 2; g++) {
            m[g] = _mm512_and_si512(R[g], vmask);
            __m512i sidx = _mm512_add_epi32(
                _mm512_slli_epi32(last[g], shift), m[g]);
            sv[g] = _mm512_i32gather_epi32(sidx, (const int*)s3o1, 4);
        }
        for (int g = 0; g < 2; g++) {
            __m512i c = _mm512_and_si512(sv[g], vff);
            pack16_low_bytes(c, trow + 16 * g);
            __m512i f = _mm512_add_epi32(
                _mm512_srli_epi32(sv[g], 20), v1);
            __m512i st = _mm512_and_si512(_mm512_srli_epi32(sv[g], 8),
                                          v12);
            __m512i q = _mm512_srli_epi32(R[g], shift);
            R[g] = _mm512_sub_epi32(
                _mm512_add_epi32(_mm512_mullo_epi32(f, q), m[g]), st);
            last[g] = c;
        }
        if (cp + 64 <= limit) {
            // unchecked renorms, words preloaded (see the O0 loop)
            const __m512i vL = _mm512_set1_epi32(int(kRansL));
            __m256i wa = _mm256_loadu_si256((const __m256i*)cp);
            __mmask16 n0 = _mm512_cmplt_epu32_mask(R[0], vL);
            __m512i v0 = _mm512_maskz_expand_epi32(
                n0, _mm512_cvtepu16_epi32(wa));
            R[0] = _mm512_mask_mov_epi32(
                R[0], n0,
                _mm512_or_si512(_mm512_slli_epi32(R[0], 16), v0));
            cp += 2 * __builtin_popcount(unsigned(n0));
            __m256i wb = _mm256_loadu_si256((const __m256i*)cp);
            __mmask16 n1 = _mm512_cmplt_epu32_mask(R[1], vL);
            __m512i vv1 = _mm512_maskz_expand_epi32(
                n1, _mm512_cvtepu16_epi32(wb));
            R[1] = _mm512_mask_mov_epi32(
                R[1], n1,
                _mm512_or_si512(_mm512_slli_epi32(R[1], 16), vv1));
            cp += 2 * __builtin_popcount(unsigned(n1));
        } else {
            for (int g = 0; g < 2; g++) R[g] = renorm16(R[g], cp, limit);
        }
    }
    for (int g = 0; g < 2; g++) {
        _mm512_storeu_si512(Rs + 16 * g, R[g]);
        alignas(64) uint32_t l32[16];
        _mm512_store_si512(l32, last[g]);
        for (int z = 0; z < 16; z++) lastv[16 * g + z] = uint8_t(l32[z]);
    }
    *cp_io = cp;
}

#else

extern "C" int fqz5_have_avx512() { return 0; }
extern "C" void fqz5_simd512_dec_o0_32(const uint32_t*, int,
                                       const uint8_t**, const uint8_t*,
                                       uint32_t*, uint8_t*, uint32_t) {}
extern "C" void fqz5_simd512_dec_o1_32(const uint32_t*,
                                       int, const uint8_t**,
                                       const uint8_t*, uint32_t*,
                                       uint8_t*, uint8_t*, uint32_t) {}

#endif  // AVX512

// ---------------------------------------------------------------------
// AVX-512 encode cores.  SoA symbol tables (x_max, rcp, bias,
// cmpl|rcp_shift<<16) are built by the caller; renormalisation emits
// u16 words via compress + masked narrow store, walking groups high-z
// first so the descending byte order matches the scalar encoder.

#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VL__)

namespace {

inline __m512i mulhi32(__m512i a, __m512i b) {
    __m512i even = _mm512_mul_epu32(a, b);
    __m512i odd = _mm512_mul_epu32(_mm512_srli_epi64(a, 32),
                                   _mm512_srli_epi64(b, 32));
    // hi bits: even-lane results sit in odd 32-bit slots of `even`
    return _mm512_mask_blend_epi32(
        0xAAAA, _mm512_srli_epi64(even, 32), odd);
}

// one 16-lane encode step: renorm emit + state update
inline __m512i enc16(__m512i x, __m512i xmax, __m512i rcp, __m512i bias,
                     __m512i cmpl_rsh, uint8_t*& ptr) {
    __mmask16 emit = _mm512_cmpgt_epu32_mask(x, xmax);
    if (emit) {
        int cnt = __builtin_popcount(unsigned(emit));
        __m512i w = _mm512_and_si512(x, _mm512_set1_epi32(0xFFFF));
        __m512i packed = _mm512_maskz_compress_epi32(emit, w);
        __m256i w16 = _mm512_cvtepi32_epi16(packed);
        ptr -= 2 * cnt;
        _mm256_mask_storeu_epi16(ptr, __mmask16((1u << cnt) - 1), w16);
        x = _mm512_mask_srli_epi32(x, emit, x, 16);
    }
    __m512i rsh = _mm512_srli_epi32(cmpl_rsh, 16);
    __m512i cmpl = _mm512_and_si512(cmpl_rsh,
                                    _mm512_set1_epi32(0xFFFF));
    __m512i q = _mm512_srlv_epi32(mulhi32(x, rcp), rsh);
    return _mm512_add_epi32(
        _mm512_add_epi32(x, bias), _mm512_mullo_epi32(q, cmpl));
}

}  // namespace

extern "C" {

// Order-0: consume in[0..main_sz) walking groups of 32 backwards.
// soa: 4 arrays of nsym u32.  Rs updated in place; *ptr_io moves down.
void fqz5_simd512_enc_o0_32(const uint8_t* in, uint32_t main_sz,
                            const uint32_t* xmax, const uint32_t* rcp,
                            const uint32_t* bias, const uint32_t* crs,
                            uint32_t* Rs, uint8_t** ptr_io) {
    uint8_t* ptr = *ptr_io;
    __m512i R[2];
    for (int g = 0; g < 2; g++) R[g] = _mm512_loadu_si512(Rs + 16 * g);

    for (int64_t i = int64_t(main_sz) - 32; i >= 0; i -= 32) {
        // z = 31..16 emit first (higher addresses), then 15..0
        for (int g = 1; g >= 0; g--) {
            __m128i sb = _mm_loadu_si128(
                (const __m128i*)(in + i + 16 * g));
            __m512i sym = _mm512_cvtepu8_epi32(sb);
            __m512i xm = _mm512_i32gather_epi32(sym, (const int*)xmax, 4);
            __m512i rc = _mm512_i32gather_epi32(sym, (const int*)rcp, 4);
            __m512i bi = _mm512_i32gather_epi32(sym, (const int*)bias, 4);
            __m512i cr = _mm512_i32gather_epi32(sym, (const int*)crs, 4);
            R[g] = enc16(R[g], xm, rc, bi, cr, ptr);
        }
    }
    for (int g = 0; g < 2; g++) _mm512_storeu_si512(Rs + 16 * g, R[g]);
    *ptr_io = ptr;
}

// Order-1: lanes read their strided chunk bytes (in[z*isz + i]) via
// gathers, so no input transpose is needed; lanes carry their own
// `last` (seeded by the caller, which may have run the top columns
// scalar to keep the gathers' 3-byte dword overread inside the input
// buffer).  Walks columns i = i_start down to 0.  Tables are flat
// (ctx*256 + sym) SoA.
//
// Hardware vpgatherdd throughout: unlike the decode walks (where the
// loop-carried state->table dependency made manual pipelined gathers
// win), the encode's gathers are independent across columns, so the
// HW gather's throughput dominates (measured 3.3x: 213 -> 706 MB/s on
// tokenised-name data, 181 -> 543 MB/s on 40-symbol quality data).
void fqz5_simd512_enc_o1_32(const uint8_t* in, uint32_t isz,
                            int64_t i_start, const uint8_t* lastN,
                            const uint32_t* xmax, const uint32_t* rcp,
                            const uint32_t* bias, const uint32_t* crs,
                            uint32_t* Rs, uint8_t** ptr_io) {
    uint8_t* ptr = *ptr_io;
    const __m512i vff = _mm512_set1_epi32(0xFF);
    __m512i zoff[2];
    for (int g = 0; g < 2; g++) {
        alignas(64) uint32_t zo[16];
        for (int z = 0; z < 16; z++)
            zo[z] = uint32_t((16 * g + z) * isz);
        zoff[g] = _mm512_load_si512(zo);
    }
    // dword gathers read up to 3 bytes past in[idx]; the caller picks
    // i_start so that 31*isz + i_start + 3 < in_size, running any
    // higher columns through the scalar walk first
    auto gather_bytes = [&](int64_t i, int g) {
        __m512i idx = _mm512_add_epi32(zoff[g],
                                       _mm512_set1_epi32(int(i)));
        __m512i v = _mm512_i32gather_epi32(idx, (const int*)in, 1);
        return _mm512_and_si512(v, vff);
    };
    __m512i R[2], last[2];
    for (int g = 0; g < 2; g++) {
        R[g] = _mm512_loadu_si512(Rs + 16 * g);
        alignas(64) uint32_t l32[16];
        for (int z = 0; z < 16; z++)
            l32[z] = lastN[16 * g + z];
        last[g] = _mm512_load_si512(l32);
    }

    for (int64_t i = i_start; i >= 0; i--) {
        for (int g = 1; g >= 0; g--) {
            __m512i ctx = gather_bytes(i, g);
            __m512i flat = _mm512_add_epi32(
                _mm512_slli_epi32(ctx, 8), last[g]);
            __m512i xm = _mm512_i32gather_epi32(flat, (const int*)xmax, 4);
            __m512i rc = _mm512_i32gather_epi32(flat, (const int*)rcp, 4);
            __m512i bi = _mm512_i32gather_epi32(flat, (const int*)bias, 4);
            __m512i cr = _mm512_i32gather_epi32(flat, (const int*)crs, 4);
            R[g] = enc16(R[g], xm, rc, bi, cr, ptr);
            last[g] = ctx;
        }
    }
    // final step: ctx 0, symbol = last
    for (int g = 1; g >= 0; g--) {
        __m512i flat = last[g];
        __m512i xm = _mm512_i32gather_epi32(flat, (const int*)xmax, 4);
        __m512i rc = _mm512_i32gather_epi32(flat, (const int*)rcp, 4);
        __m512i bi = _mm512_i32gather_epi32(flat, (const int*)bias, 4);
        __m512i cr = _mm512_i32gather_epi32(flat, (const int*)crs, 4);
        R[g] = enc16(R[g], xm, rc, bi, cr, ptr);
    }
    for (int g = 0; g < 2; g++) _mm512_storeu_si512(Rs + 16 * g, R[g]);
    *ptr_io = ptr;
}

}  // extern "C"

#else

extern "C" {
void fqz5_simd512_enc_o0_32(const uint8_t*, uint32_t, const uint32_t*,
                            const uint32_t*, const uint32_t*,
                            const uint32_t*, uint32_t*, uint8_t**) {}
void fqz5_simd512_enc_o1_32(const uint8_t*, uint32_t, int64_t,
                            const uint8_t*, const uint32_t*,
                            const uint32_t*, const uint32_t*,
                            const uint32_t*, uint32_t*, uint8_t**) {}
}

#endif
