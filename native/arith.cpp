// Adaptive arithmetic (range-coder) byte codec, wire-compatible with
// htscodecs/arith_dynamic.c.  Orders 0/1 over SIMPLE_MODEL(256), with
// optional RLE mode (runs coded in a 258-context model, MAX_RUN 4),
// PACK transform, STRIPE and CAT.  Used by the tok3 name tokenizer's
// use_arith mode and general-purpose sections.
//
// X_EXT (external bzip2, arith_dynamic.c:961-975 encode / :1226-1231
// decode) is implemented via runtime dlopen of libbz2 (this image ships
// the shared library but no headers, so the two stable BZ2_bzBuffToBuff*
// entry points are declared locally).  When the library is absent, or
// under FQZ5_NO_BZ2=1, encode of an X_EXT request fails and decode of an
// X_EXT stream fails — exactly the reference built without HAVE_LIBBZ2.

#include <dlfcn.h>
#include <stdlib.h>

#include <cstdint>
#include <cstring>
#include <vector>

#include "rc.h"

namespace fqz5 {
namespace arith {
namespace {

constexpr int kPack = 0x80;
constexpr int kRle = 0x40;
constexpr int kCat = 0x20;
constexpr int kNosz = 0x10;
constexpr int kStripe = 0x08;
constexpr int kExt = 0x04;
constexpr int kMaxRun = 4;

// ---- libbz2 via dlopen (prototypes per bzlib.h; ABI stable since 1.0) --
typedef int (*bz_buff_compress_fn)(char* dest, unsigned* destLen,
                                   char* source, unsigned sourceLen,
                                   int blockSize100k, int verbosity,
                                   int workFactor);
typedef int (*bz_buff_decompress_fn)(char* dest, unsigned* destLen,
                                     char* source, unsigned sourceLen,
                                     int small, int verbosity);

struct Bz2Lib {
    bz_buff_compress_fn compress = nullptr;
    bz_buff_decompress_fn decompress = nullptr;
    Bz2Lib() {
        const char* off = getenv("FQZ5_NO_BZ2");
        if (off && *off && *off != '0') return;
        void* h = nullptr;
        for (const char* name :
             {"libbz2.so.1.0", "libbz2.so.1", "libbz2.so"}) {
            h = dlopen(name, RTLD_NOW | RTLD_GLOBAL);
            if (h) break;
        }
        if (!h) return;
        compress = reinterpret_cast<bz_buff_compress_fn>(
            dlsym(h, "BZ2_bzBuffToBuffCompress"));
        decompress = reinterpret_cast<bz_buff_decompress_fn>(
            dlsym(h, "BZ2_bzBuffToBuffDecompress"));
        if (!compress || !decompress) compress = nullptr, decompress = nullptr;
    }
};

const Bz2Lib& bz2() {
    static Bz2Lib lib;  // C++11 magic static: thread-safe one-time init
    return lib;
}

int put_uv(uint8_t* cp, uint32_t v) {
    uint8_t tmp[8];
    int n = 0;
    tmp[n++] = v & 0x7f;
    while (v >>= 7) tmp[n++] = uint8_t(v & 0x7f) | 0x80;
    for (int i = 0; i < n; i++) cp[i] = tmp[n - 1 - i];
    return n;
}
int get_uv(const uint8_t* cp, const uint8_t* end, uint32_t* v) {
    uint32_t j = 0;
    int n = 5;
    const uint8_t* op = cp;
    uint8_t c;
    do {
        if (cp >= end) return 0;
        c = *cp++;
        j = (j << 7) | (c & 0x7f);
    } while ((c & 0x80) && n-- > 0);
    *v = j;
    return int(cp - op);
}

bool pack_bytes(const uint8_t* in, uint32_t len, std::vector<uint8_t>& meta,
                std::vector<uint8_t>& packed) {
    int p[256] = {0};
    for (uint32_t i = 0; i < len; i++) p[in[i]] = 1;
    int n = 0;
    meta.assign(1, 0);
    for (int i = 0; i < 256; i++)
        if (p[i]) {
            p[i] = n++;
            meta.push_back(uint8_t(i));
        }
    meta[0] = uint8_t(n);
    if (n > 16) return false;
    int vpb = n > 4 ? 2 : n > 2 ? 4 : n > 1 ? 8 : 0;
    packed.clear();
    switch (vpb) {
        case 2: {
            uint32_t i = 0;
            for (; i < (len & ~1u); i += 2)
                packed.push_back(uint8_t(p[in[i]] | (p[in[i + 1]] << 4)));
            if (len & 1) packed.push_back(uint8_t(p[in[len - 1]]));
            break;
        }
        case 4: {
            uint32_t i = 0;
            for (; i + 4 <= len; i += 4)
                packed.push_back(uint8_t(p[in[i]] | (p[in[i + 1]] << 2) |
                                         (p[in[i + 2]] << 4) |
                                         (p[in[i + 3]] << 6)));
            if (i < len) {
                uint8_t b = 0;
                int x = 0;
                for (; i < len; i++, x += 2) b |= p[in[i]] << x;
                packed.push_back(b);
            }
            break;
        }
        case 8: {
            uint32_t i = 0;
            for (; i + 8 <= len; i += 8) {
                uint8_t b = 0;
                for (int k = 0; k < 8; k++) b |= p[in[i + k]] << k;
                packed.push_back(b);
            }
            if (i < len) {
                uint8_t b = 0;
                int x = 0;
                for (; i < len; i++, x++) b |= p[in[i]] << x;
                packed.push_back(b);
            }
            break;
        }
        case 0:
            break;
    }
    return true;
}

int unpack_meta(const uint8_t* data, uint32_t data_len, uint8_t* map,
                int* nsym) {
    if (data_len == 0) return 0;
    unsigned n = data[0];
    if (n == 0) n = 256;
    if (n <= 1)
        *nsym = 0;
    else if (n <= 2)
        *nsym = 8;
    else if (n <= 4)
        *nsym = 4;
    else if (n <= 16)
        *nsym = 2;
    else {
        *nsym = 1;
        return 1;
    }
    if (data_len <= 1) return 0;
    unsigned j = 1, c = 0;
    do {
        map[c++] = data[j++];
    } while (c < n && j < data_len);
    return c < n ? 0 : int(j);
}

bool unpack_bytes(const uint8_t* data, uint32_t len, uint8_t* out,
                  uint64_t out_len, int nsym, const uint8_t* map) {
    if (nsym == 1) {
        memcpy(out, data, len);
        return true;
    }
    uint64_t i = 0, j = 0;
    switch (nsym) {
        case 8:
            if ((out_len + 7) / 8 > len) return false;
            for (; i + 8 <= out_len; i += 8) {
                uint8_t c = data[j++];
                for (int k = 0; k < 8; k++) out[i + k] = map[(c >> k) & 1];
            }
            if (i < out_len) {
                uint8_t c = data[j++];
                for (; i < out_len; i++, c >>= 1) out[i] = map[c & 1];
            }
            return true;
        case 4:
            if ((out_len + 3) / 4 > len) return false;
            for (; i + 4 <= out_len; i += 4) {
                uint8_t c = data[j++];
                out[i] = map[c & 3];
                out[i + 1] = map[(c >> 2) & 3];
                out[i + 2] = map[(c >> 4) & 3];
                out[i + 3] = map[(c >> 6) & 3];
            }
            if (i < out_len) {
                uint8_t c = data[j++];
                for (; i < out_len; i++, c >>= 2) out[i] = map[c & 3];
            }
            return true;
        case 2:
            if ((out_len + 1) / 2 > len) return false;
            for (; i + 2 <= out_len; i += 2) {
                uint8_t c = data[j++];
                out[i] = map[c & 15];
                out[i + 1] = map[(c >> 4) & 15];
            }
            if (i < out_len) out[i] = map[data[j] & 15];
            return true;
        case 0:
            memset(out, map[0], out_len);
            return true;
    }
    return false;
}

// ---- order-0/1 adaptive coders (cores; [max_sym u8][rc bytes]) -------

uint8_t max_sym_of(const uint8_t* in, uint32_t n) {
    unsigned m = 0;
    for (uint32_t i = 0; i < n; i++)
        if (m < in[i]) m = in[i];
    return uint8_t(m + 1);  // 256 wraps to 0
}

// Encoders return false when the adaptive coder would overflow the
// 1.05x heuristic bound (reference: RC_ShiftLowCheck err -> NULL).
bool enc_o0(const uint8_t* in, uint32_t in_size, std::vector<uint8_t>& out) {
    uint8_t m = max_sym_of(in, in_size);
    out.resize(size_t(1.05 * in_size) + 257 * 3 + 64);
    out[0] = m;
    AdaptiveModel<256> model;
    model.init(m ? m : 256);
    RangeCoder rc;
    rc.start_encode(out.data() + 1);
    rc.set_output_end(out.data() + out.size());
    for (uint32_t i = 0; i < in_size; i++) model.encode(rc, in[i]);
    rc.finish_encode();
    if (rc.error()) return false;
    out.resize(1 + rc.out_size());
    return true;
}

bool dec_o0(const uint8_t* in, uint32_t in_size, uint8_t* out,
            uint32_t out_sz) {
    if (!in_size) return false;
    unsigned m = in[0] ? in[0] : 256;
    AdaptiveModel<256> model;
    model.init(m);
    RangeCoder rc;
    rc.start_decode(in + 1, in + in_size);
    for (uint32_t i = 0; i < out_sz; i++)
        out[i] = uint8_t(model.decode(rc));
    return !rc.error();
}

bool enc_o1(const uint8_t* in, uint32_t in_size, std::vector<uint8_t>& out) {
    uint8_t m = max_sym_of(in, in_size);
    out.resize(size_t(1.05 * in_size) + 257 * 3 + 64);
    out[0] = m;
    std::vector<AdaptiveModel<256>> model(256);
    for (int i = 0; i < 256; i++) model[i].init(m ? m : 256);
    RangeCoder rc;
    rc.start_encode(out.data() + 1);
    rc.set_output_end(out.data() + out.size());
    uint8_t last = 0;
    for (uint32_t i = 0; i < in_size; i++) {
        model[last].encode(rc, in[i]);
        last = in[i];
    }
    rc.finish_encode();
    if (rc.error()) return false;
    out.resize(1 + rc.out_size());
    return true;
}

bool dec_o1(const uint8_t* in, uint32_t in_size, uint8_t* out,
            uint32_t out_sz) {
    if (!in_size) return false;
    unsigned m = in[0] ? in[0] : 256;
    std::vector<AdaptiveModel<256>> model(256);
    for (int i = 0; i < 256; i++) model[i].init(m);
    RangeCoder rc;
    rc.start_decode(in + 1, in + in_size);
    uint8_t last = 0;
    for (uint32_t i = 0; i < out_sz; i++) {
        out[i] = uint8_t(model[last].decode(rc));
        last = out[i];
    }
    return !rc.error();
}

// RLE variants: literal in byte model (O0/O1), runs in a 258-context
// model of 4 symbols with escape-style continuation.
template <bool kO1>
bool enc_rle(const uint8_t* in, uint32_t in_size, std::vector<uint8_t>& out) {
    uint8_t m = max_sym_of(in, in_size);
    out.resize(size_t(1.05 * in_size) + 257 * 3 + 64);
    out[0] = m;
    std::vector<AdaptiveModel<256>> byte_model(kO1 ? 256 : 1);
    for (auto& bm : byte_model) bm.init(m ? m : 256);
    std::vector<AdaptiveModel<258>> run_model(258);
    for (auto& rm : run_model) rm.init(kMaxRun);

    RangeCoder rc;
    rc.start_encode(out.data() + 1);
    rc.set_output_end(out.data() + out.size());
    uint8_t last = 0;
    for (uint32_t i = 0; i < in_size;) {
        byte_model[kO1 ? last : 0].encode(rc, in[i]);
        int run = 0;
        last = in[i++];
        while (i < in_size && in[i] == last) run++, i++;
        int rctx = last;
        do {
            int c = run < kMaxRun ? run : kMaxRun - 1;
            run_model[rctx].encode(rc, uint16_t(c));
            run -= c;
            if (rctx == last)
                rctx = 256;
            else
                rctx += (rctx < 257);
            if (c == kMaxRun - 1 && run == 0)
                run_model[rctx].encode(rc, 0);
        } while (run);
    }
    rc.finish_encode();
    if (rc.error()) return false;
    out.resize(1 + rc.out_size());
    return true;
}

template <bool kO1>
bool dec_rle(const uint8_t* in, uint32_t in_size, uint8_t* out,
             uint32_t out_sz) {
    if (!in_size) return false;
    unsigned m = in[0] ? in[0] : 256;
    std::vector<AdaptiveModel<256>> byte_model(kO1 ? 256 : 1);
    for (auto& bm : byte_model) bm.init(m);
    std::vector<AdaptiveModel<258>> run_model(258);
    for (auto& rm : run_model) rm.init(kMaxRun);

    RangeCoder rc;
    rc.start_decode(in + 1, in + in_size);
    uint8_t last = 0;
    for (uint32_t i = 0; i < out_sz; i++) {
        out[i] = uint8_t(byte_model[kO1 ? last : 0].decode(rc));
        last = out[i];
        int run = 0, r = 0, rctx = last;
        do {
            r = run_model[rctx].decode(rc);
            if (rctx == last)
                rctx = 256;
            else
                rctx += (rctx < 257);
            run += r;
        } while (r == kMaxRun - 1 && run < int(out_sz));
        while (run-- && i + 1 < out_sz) out[++i] = last;
    }
    return !rc.error();
}

}  // namespace

// ---- framing ---------------------------------------------------------

std::vector<uint8_t> compress(const uint8_t* in, uint32_t in_size,
                              int order);

namespace {
std::vector<uint8_t> compress_core(const uint8_t* in, uint32_t in_size,
                                   int order_in) {
    std::vector<uint8_t> out;
    int order = order_in;
    if (in_size <= 20) order &= ~kStripe;

    if (order & kCat) {
        out.push_back(kCat);
        uint8_t vbuf[8];
        int nb = put_uv(vbuf, in_size);
        out.insert(out.end(), vbuf, vbuf + nb);
        out.insert(out.end(), in, in + in_size);
        return out;
    }

    if (order & kStripe) {
        int N = (order >> 8) & 0xff;
        if (N == 0) N = 4;
        if (uint32_t(N) > in_size) N = in_size;

        std::vector<uint8_t> transposed(in_size);
        uint32_t part_len[256], idx[256];
        for (int i = 0; i < N; i++) {
            part_len[i] = in_size / N + ((in_size % N) > uint32_t(i));
            idx[i] = i ? idx[i - 1] + part_len[i - 1] : 0;
        }
        {
            uint32_t i = 0, x = 0;
            for (; i + N <= in_size; i += N, x++)
                for (int j = 0; j < N; j++) transposed[idx[j] + x] = in[i + j];
            for (int j = 0; i + j < in_size; j++)
                transposed[idx[j] + x] = in[i + j];
        }

        std::vector<uint8_t> hdr;
        hdr.push_back(uint8_t(order & ~kNosz));
        uint8_t vbuf[8];
        int nb = put_uv(vbuf, in_size);
        hdr.insert(hdr.end(), vbuf, vbuf + nb);
        hdr.push_back(uint8_t(N));

        // per-stripe method menus (arith_dynamic.c:820-826)
        const int menus[4][4] = {
            {1, 64, 0, -1}, {1, 0, -1, -1}, {1, 128, -1, -1}, {1, 128, -1, -1}};
        std::vector<uint8_t> body;
        for (int i = 0; i < N; i++) {
            const int* menu = menus[i < 3 ? i : 3];
            std::vector<uint8_t> best;
            bool have = false;
            for (int j = 0; j < 4 && menu[j] >= 0; j++) {
                if ((order & 3) == 0 && (menu[j] & 1)) continue;
                std::vector<uint8_t> sub = compress_core(
                    transposed.data() + idx[i], part_len[i], menu[j] | kNosz);
                if (!sub.empty() && (!have || sub.size() < best.size())) {
                    best = std::move(sub);
                    have = true;
                }
            }
            if (!have) return {};
            nb = put_uv(vbuf, uint32_t(best.size()));
            hdr.insert(hdr.end(), vbuf, vbuf + nb);
            body.insert(body.end(), best.begin(), best.end());
        }
        out = std::move(hdr);
        out.insert(out.end(), body.begin(), body.end());
        return out;
    }

    // External codec (bzip2): fail the method when the library is
    // unavailable, exactly like the reference built without HAVE_LIBBZ2
    // (arith_dynamic.c:967-970 returns NULL -> callers skip/abort).
    int do_ext = order & kExt;
    if (do_ext && !bz2().compress) return {};

    int do_pack = order & kPack;
    int do_rle = order & kRle;
    int no_size = order & kNosz;

    uint8_t order_byte = uint8_t(order & 0xff);
    std::vector<uint8_t> meta;
    uint8_t vbuf[8];
    int nb;
    if (!no_size) {
        nb = put_uv(vbuf, in_size);
        meta.insert(meta.end(), vbuf, vbuf + nb);
    }

    std::vector<uint8_t> packed_store;
    const uint8_t* cur = in;
    uint32_t cur_size = in_size;

    if (do_pack && in_size) {
        std::vector<uint8_t> pmeta;
        if (!pack_bytes(cur, cur_size, pmeta, packed_store)) {
            order_byte &= ~kPack;
            do_pack = 0;
        } else {
            meta.insert(meta.end(), pmeta.begin(), pmeta.end());
            cur = packed_store.data();
            cur_size = uint32_t(packed_store.size());
            nb = put_uv(vbuf, cur_size);
            meta.insert(meta.end(), vbuf, vbuf + nb);
        }
    } else if (do_pack) {
        order_byte &= ~kPack;
        do_pack = 0;
    }

    if (do_rle && !cur_size) {
        order_byte &= ~kRle;
        do_rle = 0;
    }

    int o01 = order & 3;
    if (o01 && cur_size < 8) {
        order_byte &= ~3;
        o01 = 0;
    }

    std::vector<uint8_t> payload;
    bool ok;
    if (do_ext) {
        // bzip2, blockSize100k=9 workFactor=30 (arith_dynamic.c:963-964).
        // Capacity mirrors the reference's arith_compress_bound headroom
        // (1.05x + constants), which exceeds bz2's 1.01x + 600 worst
        // case; a failed/oversized result forces the X_CAT path below
        // just as the reference's `*out_size = in_size` does (:965).
        unsigned cap = cur_size + cur_size / 20 + 800;
        payload.resize(cap);
        unsigned dlen = cap;
        if (0 == bz2().compress(reinterpret_cast<char*>(payload.data()),
                                &dlen,
                                reinterpret_cast<char*>(
                                    const_cast<uint8_t*>(cur)),
                                cur_size, 9, 0, 30))
            payload.resize(dlen);
        else
            payload.resize(cur_size);  // force CAT below
        ok = true;
    } else if (do_rle) {
        ok = o01 == 1 ? enc_rle<true>(cur, cur_size, payload)
                      : enc_rle<false>(cur, cur_size, payload);
    } else {
        ok = o01 == 1 ? enc_o1(cur, cur_size, payload)
                      : enc_o0(cur, cur_size, payload);
    }
    if (!ok) return {};  // coder overflow past bound (reference: NULL)

    if (payload.size() >= cur_size) {
        order_byte &= ~(3 | kExt);
        order_byte |= kCat | no_size;
        payload.assign(cur, cur + cur_size);
    }

    out.push_back(order_byte);
    out.insert(out.end(), meta.begin(), meta.end());
    out.insert(out.end(), payload.begin(), payload.end());
    return out;
}
}  // namespace

std::vector<uint8_t> compress(const uint8_t* in, uint32_t in_size,
                              int order) {
    return compress_core(in, in_size, order);
}

bool uncompress(const uint8_t* in, uint32_t in_size,
                std::vector<uint8_t>& out, uint32_t out_hint,
                bool know_size) {
    if (in_size == 0) return false;
    const uint8_t* in_end = in + in_size;

    if (*in & kStripe) {
        uint32_t c_meta_len = 1, ulen;
        int n = get_uv(in + c_meta_len, in_end, &ulen);
        if (!n) return false;
        c_meta_len += n;
        if (c_meta_len >= in_size) return false;
        unsigned N = in[c_meta_len++];
        if (N < 1) return false;
        if (know_size && ulen != out_hint) return false;

        uint32_t clenN[256], ulenN[256], idxN[256];
        uint64_t clen_tot = 0;
        for (unsigned i = 0; i < N; i++) {
            ulenN[i] = ulen / N + ((ulen % N) > i);
            idxN[i] = i ? idxN[i - 1] + ulenN[i - 1] : 0;
            n = get_uv(in + c_meta_len, in_end, &clenN[i]);
            if (!n) return false;
            c_meta_len += n;
            clen_tot += clenN[i];
            if (c_meta_len > in_size || clenN[i] > in_size || clenN[i] < 1)
                return false;
        }
        if (c_meta_len + clen_tot > in_size) return false;

        std::vector<uint8_t> outN(ulen);
        for (unsigned i = 0; i < N; i++) {
            std::vector<uint8_t> sub;
            if (!uncompress(in + c_meta_len, in_size - c_meta_len, sub,
                            ulenN[i], true) ||
                sub.size() != ulenN[i])
                return false;
            memcpy(outN.data() + idxN[i], sub.data(), ulenN[i]);
            c_meta_len += clenN[i];
        }
        out.resize(ulen);
        uint32_t j = 0;
        uint32_t pos[256];
        memcpy(pos, idxN, sizeof(pos));
        while (j + N <= ulen)
            for (unsigned k = 0; k < N; k++) out[j++] = outN[pos[k]++];
        for (unsigned k = 0; j < ulen; k++) out[j++] = outN[pos[k]++];
        return true;
    }

    int order = *in++;
    in_size--;
    int do_pack = order & kPack;
    int do_rle = order & kRle;
    int do_cat = order & kCat;
    int no_size = order & kNosz;
    int do_ext = order & kExt;
    order &= 3;

    uint32_t osz;
    if (!no_size) {
        int n = get_uv(in, in_end, &osz);
        if (!n) return false;
        in += n;
        in_size -= n;
    } else {
        if (!know_size) return false;
        osz = out_hint;
    }

    uint32_t tmp1_size = osz;
    uint8_t map[16] = {0};
    int npacked_sym = 0;
    uint64_t unpacked_sz = 0;
    if (do_pack) {
        int used = unpack_meta(in, in_size, map, &npacked_sym);
        if (used == 0) return false;
        unpacked_sz = osz;
        in += used;
        in_size -= used;
        uint32_t psz;
        int n = get_uv(in, in_end, &psz);
        if (!n) return false;
        in += n;
        in_size -= n;
        if (psz > tmp1_size) return false;
        tmp1_size = psz;
    }

    std::vector<uint8_t> tmp1(tmp1_size);
    if (in_size) {
        if (do_cat) {
            if (tmp1_size > in_size) return false;
            memcpy(tmp1.data(), in, tmp1_size);
        } else if (do_ext) {
            if (!bz2().decompress) return false;  // no libbz2: reference err
            unsigned dlen = tmp1_size;
            if (0 != bz2().decompress(
                         reinterpret_cast<char*>(tmp1.data()), &dlen,
                         reinterpret_cast<char*>(const_cast<uint8_t*>(in)),
                         in_size, 0, 0))
                return false;
            tmp1_size = dlen;  // reference passes &tmp1_size through (:1226)
        } else if (do_rle) {
            bool ok = order == 1
                          ? dec_rle<true>(in, in_size, tmp1.data(), tmp1_size)
                          : dec_rle<false>(in, in_size, tmp1.data(),
                                           tmp1_size);
            if (!ok) return false;
        } else {
            bool ok = order == 1
                          ? dec_o1(in, in_size, tmp1.data(), tmp1_size)
                          : dec_o0(in, in_size, tmp1.data(), tmp1_size);
            if (!ok) return false;
        }
    } else {
        tmp1_size = 0;
        tmp1.clear();
    }

    if (do_pack) {
        if (npacked_sym == 1) unpacked_sz = tmp1_size;
        out.resize(unpacked_sz);
        if (!unpack_bytes(tmp1.data(), tmp1_size, out.data(), unpacked_sz,
                          npacked_sym, map))
            return false;
        return true;
    }
    out = std::move(tmp1);
    out.resize(tmp1_size);
    return true;
}

}  // namespace arith
}  // namespace fqz5

extern "C" {
int64_t fqz5_arith_compress(const uint8_t* in, uint32_t in_size, int order,
                            uint8_t* out, uint32_t out_cap) {
    std::vector<uint8_t> v = fqz5::arith::compress(in, in_size, order);
    if (v.empty()) return -1;
    if (v.size() > out_cap) return -1;
    memcpy(out, v.data(), v.size());
    return int64_t(v.size());
}
int64_t fqz5_arith_uncompress(const uint8_t* in, uint32_t in_size,
                              uint8_t* out, uint32_t out_cap) {
    std::vector<uint8_t> v;
    if (!fqz5::arith::uncompress(in, in_size, v, 0, false)) return -1;
    if (v.size() > out_cap) return -1;
    memcpy(out, v.data(), v.size());
    return int64_t(v.size());
}
}
