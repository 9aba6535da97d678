// LZP: hash-predicted long-match elimination pre-transform.
// Wire-compatible with the reference lzp16e.c (HASH_LEN=16, MIN_LEN=3,
// escape symbol 233/234, 1- or 2-byte match lengths capped at 65535).

#include <cstdint>
#include <cstring>
#include <vector>

namespace fqz5 {
namespace {

constexpr int kHashLen = 16;
constexpr int kHashSize = 1 << kHashLen;
constexpr int kMinLen = 3;
constexpr uint8_t kEsc = 233;

inline int next_hash(int h, uint8_t c) {
    uint32_t u = uint32_t(h);
    return int((((u * 0x8ca6b53u) << 4) + ((u << 5) * 17u) ^ c) &
               (kHashSize - 1));
}

int run_len(const uint8_t* in, int i, int in_len, const uint8_t* m) {
    int avail = in_len - i;
    in += i;
    if (avail < kMinLen || memcmp(in, m, kMinLen)) return 0;
    int ml = kMinLen;
    while (ml < avail && in[ml] == m[ml]) ml++;
    return ml;
}

}  // namespace

int64_t lzp_encode(const uint8_t* in, uint32_t in_len, uint8_t* out,
                   uint32_t out_cap) {
    std::vector<int> ht(kHashSize, 0);
    int64_t o = 0;
    int h = 0;
    // worst case expansion: every byte is escape + explicit zero match
    if (out_cap < in_len * 3u / 2u + 64) {
        // caller must supply 2x buffer like the reference does
    }
    for (int64_t i = 0; i < int64_t(in_len); i++) {
        if (ht[h] > 0) {
            int ml = run_len(in, int(i), int(in_len), &in[ht[h]]);
            if (ml > 65535) ml = 65535;
            if (ml >= kMinLen) {
                if (ml <= 255) {
                    out[o++] = kEsc;
                    out[o++] = uint8_t(ml);
                } else {
                    out[o++] = kEsc + 1;
                    out[o++] = uint8_t(ml >> 8);
                    out[o++] = uint8_t(ml);
                }
                do {
                    ht[h] = int(i);
                    h = next_hash(h, in[i]);
                    i++;
                } while (--ml > 0);
                i--;
            } else {
                if (in[i] == kEsc || in[i] == kEsc + 1) {
                    out[o++] = kEsc;
                    out[o++] = 0;
                }
                out[o++] = in[i];
                ht[h] = int(i);
                h = next_hash(h, in[i]);
            }
        } else {
            out[o++] = in[i];
            ht[h] = int(i);
            h = next_hash(h, in[i]);
        }
        if (uint64_t(o) + 4 > out_cap) return -1;
    }
    return o;
}

int64_t lzp_decode(const uint8_t* in, uint32_t in_len, uint8_t* out,
                   uint32_t out_cap) {
    std::vector<int> ht(kHashSize, 0);
    int64_t j = 0;
    int h = 0;
    for (int64_t i = 0; i < int64_t(in_len); i++) {
        if (ht[h] > 0) {
            int is_match = in[i++];
            int ml = 0;
            if (is_match == kEsc) {
                ml = in[i++];
            } else if (is_match == kEsc + 1) {
                ml = in[i++] << 8;
                ml += in[i++];
            }
            if (ml) {
                if (j + ml > out_cap) return -1;
                // overlapping forward copy semantics
                for (int z = 0; z < ml; z++) out[j + z] = out[ht[h] + z];
                do {
                    ht[h] = int(j);
                    h = next_hash(h, out[j]);
                    j++;
                } while (--ml > 0);
                i--;
            } else {
                i -= (is_match != kEsc && is_match != kEsc + 1);
                if (i >= in_len || j >= out_cap) return -1;
                out[j] = in[i];
                ht[h] = int(j++);
                h = next_hash(h, in[i]);
            }
        } else {
            if (j >= out_cap) return -1;
            out[j] = in[i];
            ht[h] = int(j++);
            h = next_hash(h, in[i]);
        }
    }
    return j;
}

}  // namespace fqz5

extern "C" {
int64_t fqz5_lzp(const uint8_t* in, uint32_t in_len, uint8_t* out,
                 uint32_t out_cap) {
    return fqz5::lzp_encode(in, in_len, out, out_cap);
}
int64_t fqz5_unlzp(const uint8_t* in, uint32_t in_len, uint8_t* out,
                   uint32_t out_cap) {
    return fqz5::lzp_decode(in, in_len, out, out_cap);
}
}
