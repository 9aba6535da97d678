// Structure-aware read-name tokenizer ("tok3"), wire-compatible with
// htscodecs/tokenise_name3.c (tok3_encode_names / tok3_decode_names).
//
// Names are tokenised into per-(position,type) streams -- alphabetic
// runs, digit runs (with/without leading zeros), single chars, deltas
// and matches against a previous similar name found via a prefix trie.
// Each stream is entropy-coded (rANS Nx16 or arith) with a per-level
// method menu, duplicate streams deduplicated, and the lot serialized
// with a 9-byte header.
//
// Encoder heuristics replicated from the reference: PacBio / IonTorrent
// / ONT-uuid4 name-shape detection and Illumina trim-to-4-colons prefix
// anchoring (tokenise_name3.c:600-644).

#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include "arith.h"
#include "rans.h"

namespace fqz5 {
namespace tok3 {
namespace {

constexpr int kMaxTokens = 128;
constexpr int kMaxTBlocks = kMaxTokens << 4;

enum NameType {
    N_ERR = -1, N_TYPE = 0, N_ALPHA, N_CHAR, N_DIGITS0, N_DZLEN, N_DUP,
    N_DIFF, N_DIGITS, N_DDELTA, N_DDELTA0, N_MATCH, N_NOP, N_END, N_ALL,
};

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

struct Desc {
    std::vector<uint8_t> buf;
    size_t pos = 0;  // decode cursor
    int dup_from = -1;
};

struct TokInfo {
    int type = 0;
    int ival = 0;
    int sval = 0;  // str offset (ALPHA) or digit length (DIGITS0)
};

struct LastCtx {
    int name_off = -1;  // offset of name within the block / output
    int name_len = 0;
    int tok_off = 0;    // range into Ctx::tok_arena
    int tok_cnt = 0;
};

// Trie keyed on (node, char).  Node payload is the last line number to
// visit it (updated during the search pass, per reference semantics:
// creation sets it, searches update it).
//
// Nodes live in one contiguous pool with first-child/next-sibling
// links (the reference's pooled trie shape, tokenise_name3.c:477-523,
// minus its 1KB nodes): per-char walks scan a short sibling list of
// nodes allocated in prefix-creation order, which keeps the hot path
// inside a few cache lines.  (A flat hash map and unordered_map both
// lose here — every probe is a random miss across a table that grows
// with the block.)
struct Trie {
    struct Node {
        int32_t first = -1;   // first child
        int32_t sib = -1;     // next sibling
        int32_t n = 0;        // last line number to visit (payload)
        uint8_t c = 0;
    };
    std::vector<Node> pool;

    Trie() { pool.push_back(Node()); }

    int child(int node, uint8_t c) const {
        for (int x = pool[node].first; x >= 0; x = pool[x].sib)
            if (pool[x].c == c) return x;
        return -1;
    }
    int add_child(int node, uint8_t c, int n) {
        int idx = int(pool.size());
        Node nd;
        nd.c = c;
        nd.n = n;
        nd.sib = pool[node].first;
        pool.push_back(nd);
        pool[node].first = idx;
        return idx;
    }
    int32_t& node_n(int idx) { return pool[idx].n; }
    int32_t node_n(int idx) const { return pool[idx].n; }
};

struct Ctx {
    std::vector<Desc> desc;
    std::vector<LastCtx> lc;
    // all names' token records, appended once per name (names share
    // ranges on DUP).  One flat arena instead of a 128-entry vector
    // per record: the per-name assign/shrink was ~25% of encode time
    // and held ~1.5KB of capacity per record for the whole block.
    std::vector<TokInfo> tok_arena;
    int counter = 0;
    int max_tok = 1;
    int max_names = 0;
    Trie trie;
    int token_dcount[kMaxTokens] = {0};
    int token_icount[kMaxTokens] = {0};

    explicit Ctx(int nreads) {
        desc.resize(kMaxTBlocks);
        max_names = nreads + 1;
        lc.resize(max_names);
        tok_arena.reserve(size_t(max_names) * 4);
    }
    const TokInfo* tok_at(const LastCtx& p, int k) const {
        return k < p.tok_cnt ? &tok_arena[p.tok_off + k] : nullptr;
    }
    void tok_commit(LastCtx& cur, const TokInfo* tmp, int cnt) {
        cur.tok_off = int(tok_arena.size());
        cur.tok_cnt = cnt;
        tok_arena.insert(tok_arena.end(), tmp, tmp + cnt);
    }
};

bool build_trie(Ctx& ctx, const uint8_t* data, size_t len, int n) {
    int t = 0;
    for (size_t i = 0; i < len; i++) {
        uint8_t c = data[i];
        if (c & 0x80) return false;  // 7-bit ASCII only
        c &= 127;
        int x = ctx.trie.child(t, c);
        if (x < 0) x = ctx.trie.add_child(t, c, n);
        t = x;
    }
    return true;
}

// Returns pnum (or <0) and fills exact/is_fixed/fixed_len.
int search_trie(Ctx& ctx, const uint8_t* data, size_t len, int n, int* exact,
                int* is_fixed, int* fixed_len) {
    int from = -1, p3 = -1;
    *exact = 0;
    *fixed_len = 0;
    *is_fixed = 0;

    // Name-shape detection (encoder-only heuristics)
    size_t prefix_len;
    const uint8_t* d = (len && data[0] == '@') ? data + 1 : data;
    size_t l = (len && data[0] == '@') ? len - 1 : len;
    int f = (len && data[0] == '>') ? 1 : 0;
    if (l > 70 && d[f + 0] == 'm' && d[7] == '_' && d[f + 14] == '_' &&
        d[f + 61] == '/') {
        prefix_len = 60;  // PacBio
        *is_fixed = 0;
    } else if (l == 17 && d[f + 5] == ':' && d[f + 11] == ':') {
        prefix_len = 6;  // IonTorrent
        *fixed_len = 6;
        *is_fixed = 1;
    } else if (l >= 36 && d[f + 8] == '-' && d[f + 13] == '-' &&
               d[f + 18] == '-' && d[f + 23] == '-' &&
               isxdigit(d[f + 0]) && isxdigit(d[f + 7]) &&
               isxdigit(d[f + 9]) && isxdigit(d[f + 12]) &&
               isxdigit(d[f + 14]) && isxdigit(d[f + 17]) &&
               isxdigit(d[f + 19]) && isxdigit(d[f + 22]) &&
               isxdigit(d[f + 24]) && isxdigit(d[f + 35])) {
        prefix_len = 36;  // ONT uuid4
        *fixed_len = 36;
        *is_fixed = 1;
    } else {
        // Illumina: trim back to the lane:tile:x:y colon block
        size_t i = 0;
        int colons = 0;
        for (; i < len && data[i] > ' '; i++)
            ;
        while (i > 0 && colons < 4)
            if (data[--i] == ':') colons++;
        if (colons == 4) {
            *fixed_len = int(i + 1);
            prefix_len = i + 1;
            *is_fixed = 1;
        } else {
            prefix_len = size_t(-1);
            *is_fixed = 0;
        }
    }

    int from_punct = from;
    int t = 0;
    for (size_t i = 0; i < len;) {
        uint8_t c = data[i++];
        if (c & 0x80) return -1;
        c &= 127;
        int x = ctx.trie.child(t, c);
        if (x < 0) return -1;  // cannot happen post build
        t = x;
        from = ctx.trie.node_n(t);
        if ((ispunct(c) || isspace(c)) && ctx.trie.node_n(t) != n)
            from_punct = ctx.trie.node_n(t);
        if (i == prefix_len) p3 = ctx.trie.node_n(t);
        ctx.trie.node_n(t) = n;
    }

    *exact = (n != from) && len;
    return *exact ? from : (p3 != -1 ? p3 : from_punct);
}

// ---- token stream emission -------------------------------------------

bool grow_tok(Ctx& ctx, int ntok) {
    if (ntok >= ctx.max_tok) {
        if (ctx.max_tok >= kMaxTokens) return false;
        ctx.max_tok = ntok + 1;
    }
    return true;
}

void emit_type(Ctx& ctx, int ntok, int type) {
    ctx.desc[ntok << 4].buf.push_back(uint8_t(type));
}
void emit_int(Ctx& ctx, int ntok, int type, uint32_t v) {
    emit_type(ctx, ntok, type);
    Desc& d = ctx.desc[(ntok << 4) | type];
    d.buf.push_back(uint8_t(v));
    d.buf.push_back(uint8_t(v >> 8));
    d.buf.push_back(uint8_t(v >> 16));
    d.buf.push_back(uint8_t(v >> 24));
}
void emit_int1(Ctx& ctx, int ntok, int type, uint32_t v) {
    emit_type(ctx, ntok, type);
    ctx.desc[(ntok << 4) | type].buf.push_back(uint8_t(v));
}
void emit_int1_raw(Ctx& ctx, int ntok, int type, uint32_t v) {
    ctx.desc[(ntok << 4) | type].buf.push_back(uint8_t(v));
}
void emit_alpha(Ctx& ctx, int ntok, const uint8_t* s, int len) {
    emit_type(ctx, ntok, N_ALPHA);
    Desc& d = ctx.desc[(ntok << 4) | N_ALPHA];
    d.buf.insert(d.buf.end(), s, s + len);
    d.buf.push_back(0);
}
void emit_char(Ctx& ctx, int ntok, uint8_t c) {
    emit_type(ctx, ntok, N_CHAR);
    ctx.desc[(ntok << 4) | N_CHAR].buf.push_back(c);
}

bool encode_name(Ctx& ctx, const uint8_t* blk, int off, int len, int mode) {
    const uint8_t* name = blk + off;
    int exact, is_fixed, fixed_len;
    int cnum = ctx.counter++;
    int pnum =
        search_trie(ctx, name, len, cnum, &exact, &is_fixed, &fixed_len);
    if (pnum < 0) pnum = cnum ? cnum - 1 : 0;

    LastCtx& cur = ctx.lc[cnum];
    const LastCtx& prev = ctx.lc[pnum];

    if (exact && len == prev.name_len) {
        emit_int(ctx, 0, N_DUP, uint32_t(cnum - pnum));
        cur.name_off = off;
        cur.name_len = len;
        cur.tok_off = prev.tok_off;   // share the arena range
        cur.tok_cnt = prev.tok_cnt;
        return true;
    }

    emit_int(ctx, 0, N_DIFF, uint32_t(cnum - pnum));
    TokInfo toks[kMaxTokens];   // scratch; committed to the arena at end
    toks[0] = TokInfo();
    int ntok = 1;
    int i;

    auto prev_tok = [&](int k) -> const TokInfo* {
        return pnum < cnum ? ctx.tok_at(prev, k) : nullptr;
    };

    if (fixed_len == 36) {
        // ONT uuid4: 36 per-char tokens
        if (!grow_tok(ctx, 37)) return false;
        if (ctx.max_tok < 38) ctx.max_tok = 38;
        for (i = 0; i < 36; i++, ntok++) {
            emit_char(ctx, ntok, name[i]);
            toks[ntok].ival = name[i];
            toks[ntok].type = N_CHAR;
        }
        is_fixed = 0;
        i = 36;
    } else if (is_fixed) {
        if (!grow_tok(ctx, ntok)) return false;
        const TokInfo* pt = prev_tok(ntok);
        if (pt && pt->type == N_ALPHA && pt->ival == fixed_len &&
            memcmp(name, blk + prev.name_off, fixed_len) == 0) {
            emit_type(ctx, ntok, N_MATCH);
        } else {
            emit_alpha(ctx, ntok, name, fixed_len);
        }
        toks[ntok].ival = fixed_len;
        toks[ntok].sval = 0;
        toks[ntok].type = N_ALPHA;
        ntok++;
        i = fixed_len;
    } else {
        i = 0;
    }

    for (; i < len; i++) {
        if (!grow_tok(ctx, ntok)) return false;
        const TokInfo* pt = prev_tok(ntok);

        if (isalpha(name[i])) {
            int s = i + 1;
            while (s < len && (isalpha(name[s]) || ispunct(name[s]))) s++;
            if (s - i == 1) goto n_char;

            if (pt && pt->type == N_ALPHA) {
                if (s - i == pt->ival &&
                    memcmp(&name[i], blk + prev.name_off + pt->sval,
                           s - i) == 0) {
                    emit_type(ctx, ntok, N_MATCH);
                } else {
                    emit_alpha(ctx, ntok, &name[i], s - i);
                }
            } else {
                emit_alpha(ctx, ntok, &name[i], s - i);
            }
            toks[ntok].ival = s - i;
            toks[ntok].sval = i;
            toks[ntok].type = N_ALPHA;
            i = s - 1;
        } else if (name[i] == '0') {
        digits0: {
            uint32_t s = i, v = 0;
            while (s < uint32_t(len) && isdigit(name[s]) &&
                   s - uint32_t(i) < 9) {
                v = v * 10 + name[s] - '0';
                s++;
            }
            pt = prev_tok(ntok);
            if (pt && pt->type == N_DIGITS0) {
                int d = int(v) - pt->ival;
                if (d == 0 && pt->sval == int(s) - i) {
                    emit_type(ctx, ntok, N_MATCH);
                } else if (mode == 1 && d < 256 && d >= 0 &&
                           pt->sval == int(s) - i) {
                    emit_int1(ctx, ntok, N_DDELTA0, uint32_t(d));
                } else {
                    emit_int1_raw(ctx, ntok, N_DZLEN, s - i);
                    emit_int(ctx, ntok, N_DIGITS0, v);
                }
            } else {
                emit_int1_raw(ctx, ntok, N_DZLEN, s - i);
                emit_int(ctx, ntok, N_DIGITS0, v);
            }
            toks[ntok].sval = int(s) - i;  // digit length
            toks[ntok].ival = int(v);
            toks[ntok].type = N_DIGITS0;
            i = int(s) - 1;
        }
        } else if (isdigit(name[i])) {
            uint32_t s = i, v = 0;
            while (s < uint32_t(len) && isdigit(name[s]) &&
                   s - uint32_t(i) < 9) {
                v = v * 10 + name[s] - '0';
                s++;
            }
            if (pt && pt->type == N_DIGITS0 && pt->sval == int(s) - i)
                goto digits0;

            if (pt && pt->type == N_DIGITS) {
                int d = int(v) - pt->ival;
                if (d == 0) {
                    emit_type(ctx, ntok, N_MATCH);
                } else if (mode == 1 && d < 256 && d >= 0 &&
                           (5 + ctx.token_dcount[ntok]) >
                               ctx.token_icount[ntok]) {
                    emit_int1(ctx, ntok, N_DDELTA, uint32_t(d));
                    ctx.token_dcount[ntok]++;
                } else {
                    emit_int(ctx, ntok, N_DIGITS, v);
                    ctx.token_icount[ntok]++;
                }
            } else {
                emit_int(ctx, ntok, N_DIGITS, v);
            }
            toks[ntok].ival = int(v);
            toks[ntok].type = N_DIGITS;
            i = int(s) - 1;
        } else {
        n_char:
            if (pt && pt->type == N_CHAR) {
                if (name[i] == pt->ival) {
                    emit_type(ctx, ntok, N_MATCH);
                } else {
                    emit_char(ctx, ntok, name[i]);
                }
            } else {
                emit_char(ctx, ntok, name[i]);
            }
            toks[ntok].ival = name[i];
            toks[ntok].type = N_CHAR;
        }
        ntok++;
    }

    if (!grow_tok(ctx, ntok)) return false;
    emit_type(ctx, ntok, N_END);

    cur.name_off = off;
    cur.name_len = len;
    toks[ntok] = TokInfo();   // the N_END slot stays default (as the
    // reference's calloc'd last token array)
    ctx.tok_commit(cur, toks, ntok + 1);
    return true;
}

// ---- per-stream entropy coding ----------------------------------------

// rANS / arith method menus per level (tokenise_name3.c:1282-1362).
// First element is the count.
const int kMethods[5][N_ALL][7] = {
    {   // level 1
        {1, 128}, {1, 129}, {1, 0}, {1, 8}, {1, 0}, {1, 8}, {1, 8},
        {1, 8}, {1, 0}, {1, 128}, {1, 0}, {1, 0}, {1, 0},
    },
    {   // level 3
        {2, 192, 0}, {2, 129, 1}, {1, 0}, {2, 136, 0}, {1, 0}, {1, 200},
        {1, 136}, {1, 200}, {1, 0}, {1, 128}, {1, 0}, {1, 0}, {1, 0},
    },
    {   // level 5
        {2, 192, 0}, {4, 1, 128, 0, 129}, {1, 0}, {2, 200, 0}, {1, 0},
        {1, 200}, {2, 192, 200}, {2, 132, 201}, {1, 0}, {1, 128}, {1, 0},
        {1, 0}, {1, 0},
    },
    {   // level 7
        {3, 193, 0, 1}, {5, 128, 1, 128, 0, 129}, {2, 1, 0}, {2, 200, 0},
        {1, 0}, {1, 201}, {2, 192, 200}, {2, 132, 201}, {1, 0}, {1, 128},
        {1, 0}, {1, 0}, {1, 0},
    },
    {   // level 9
        {6, 192, 0, 1, 65, 193, 132}, {4, 132, 1, 0, 129}, {3, 1, 0, 192},
        {4, 201, 0, 192, 64}, {3, 0, 128, 1}, {1, 201}, {3, 192, 201, 65},
        {6, 132, 201, 1, 192, 129, 193}, {3, 1, 0, 192}, {3, 192, 1, 0},
        {1, 0}, {1, 0}, {1, 0},
    },
};

bool entropy_encode(const std::vector<uint8_t>& in, int type, int level,
                    int use_arith, std::vector<uint8_t>& out) {
    level = (level - 1) / 2;
    if (level < 0) level = 0;
    if (level > 4) level = 4;

    std::vector<uint8_t> best;
    bool have = false;
    const int* meth = kMethods[level][type];
    int count = meth[0];
    for (int m = 1; m <= count; m++) {
        int method = meth[m];
        if (use_arith && level == 1 && type == N_DIGITS) method = 201;
        if (!use_arith && (method & 4)) method &= ~4;
        if (in.size() % 4 != 0 && (method & 8)) continue;

        std::vector<uint8_t> enc =
            use_arith
                ? arith::compress(in.data(), uint32_t(in.size()), method)
                : rans_compress(in.data(), uint32_t(in.size()), method);
        if (enc.empty()) return false;
        uint8_t hdr[8];
        int nb = put_uv(hdr, uint32_t(enc.size()));
        std::vector<uint8_t> framed(hdr, hdr + nb);
        framed.insert(framed.end(), enc.begin(), enc.end());
        if (!have || framed.size() < best.size()) {
            best = std::move(framed);
            have = true;
        }
    }
    if (!have) return false;
    out = std::move(best);
    return true;
}

int64_t entropy_decode(int use_arith, const uint8_t* in, uint64_t in_len,
                       std::vector<uint8_t>& out) {
    uint32_t clen;
    int nb = get_uv(in, in + in_len, &clen);
    if (!nb) return -1;
    bool ok = use_arith
                  ? arith::uncompress(in + nb, uint32_t(in_len - nb), out)
                  : rans_uncompress(in + nb, uint32_t(in_len - nb), out);
    if (!ok) return -1;
    return int64_t(clen) + nb;
}

// peek at the stored uncompressed size of a framed stream
int64_t framed_usize(const uint8_t* in, uint64_t in_len) {
    uint32_t clen, ulen;
    int nb = get_uv(in, in + in_len, &clen);
    if (!nb) return -1;
    if (!get_uv(in + nb + 1, in + in_len, &ulen)) return -1;
    return ulen;
}

// ---- decode side -------------------------------------------------------

int decode_token_type(Ctx& ctx, int ntok) {
    Desc& d = ctx.desc[ntok << 4];
    if (d.pos >= d.buf.size()) return -1;
    return d.buf[d.pos++];
}
bool decode_token_int(Ctx& ctx, int ntok, int type, uint32_t* v) {
    Desc& d = ctx.desc[(ntok << 4) | type];
    if (d.pos + 4 > d.buf.size()) return false;
    const uint8_t* cp = d.buf.data() + d.pos;
    *v = cp[0] | (cp[1] << 8) | (cp[2] << 16) | (uint32_t(cp[3]) << 24);
    d.pos += 4;
    return true;
}
bool decode_token_int1(Ctx& ctx, int ntok, int type, uint32_t* v) {
    Desc& d = ctx.desc[(ntok << 4) | type];
    if (d.pos >= d.buf.size()) return false;
    *v = d.buf[d.pos++];
    return true;
}
int decode_token_alpha(Ctx& ctx, int ntok, uint8_t* str, int max_len) {
    Desc& d = ctx.desc[(ntok << 4) | N_ALPHA];
    if (d.pos >= d.buf.size()) return -1;
    int len = 0;
    uint8_t c;
    do {
        c = d.buf[d.pos++];
        str[len++] = c;
    } while (c && len < max_len && d.pos < d.buf.size());
    return len - 1;
}
bool decode_token_char(Ctx& ctx, int ntok, uint8_t* c) {
    Desc& d = ctx.desc[(ntok << 4) | N_CHAR];
    if (d.pos >= d.buf.size()) return false;
    *c = d.buf[d.pos++];
    return true;
}

int append_u32_fixed(uint8_t* cp, uint32_t v, uint8_t l) {
    static const uint32_t pw[10] = {1, 10, 100, 1000, 10000, 100000,
                                    1000000, 10000000, 100000000, 1000000000};
    for (int k = l - 1; k >= 0; k--) {
        cp[(l - 1) - k] = uint8_t(v / pw[k] + '0');
        v %= pw[k];
    }
    return l;
}

int append_u32_var(uint8_t* cp, uint32_t v) {
    char tmp[12];
    int n = 0;
    if (!v) return 0;  // reference emits nothing for value 0
    while (v) {
        tmp[n++] = char(v % 10 + '0');
        v /= 10;
    }
    for (int k = 0; k < n; k++) cp[k] = uint8_t(tmp[n - 1 - k]);
    return n;
}

// Returns bytes written to name (including trailing NUL), 0 when the
// stream is exhausted, -1 on error.
int decode_name(Ctx& ctx, std::vector<uint8_t>& out, size_t out_off,
                size_t cap) {
    int t0 = decode_token_type(ctx, 0);
    uint32_t dist;
    int cnum = ctx.counter++;
    if (cnum >= ctx.max_names) return -1;
    if (t0 < 0 || t0 >= ctx.max_tok * 16) return 0;
    if (!decode_token_int(ctx, 0, t0, &dist) || dist > uint32_t(cnum))
        return -1;
    int pnum = cnum - int(dist);
    if (pnum < 0) pnum = 0;

    uint8_t* name = out.data() + out_off;
    size_t name_len = cap - out_off;

    if (t0 == N_DUP) {
        if (pnum == cnum) return -1;
        const LastCtx& prev = ctx.lc[pnum];
        if (size_t(prev.name_len) + 1 >= name_len) return -1;
        memcpy(name, out.data() + prev.name_off, prev.name_len);
        name[prev.name_len] = 0;
        ctx.lc[cnum].name_off = int(out_off);
        ctx.lc[cnum].name_len = prev.name_len;
        ctx.lc[cnum].tok_off = prev.tok_off;   // share the arena range
        ctx.lc[cnum].tok_cnt = prev.tok_cnt;
        return prev.name_len + 1;
    }

    LastCtx& cur = ctx.lc[cnum];
    TokInfo toks[kMaxTokens];   // scratch; committed to the arena at end
    toks[0] = TokInfo();
    int len = 0;

    for (int ntok = 1; ntok < kMaxTokens && ntok < ctx.max_tok; ntok++) {
        uint32_t v, vl;
        int tok = decode_token_type(ctx, ntok);
        const LastCtx& prev = ctx.lc[pnum];

        switch (tok) {
            case N_CHAR: {
                if (size_t(len) + 1 >= name_len) return -1;
                uint8_t c;
                if (!decode_token_char(ctx, ntok, &c)) return -1;
                name[len] = c;
                toks[ntok].type = N_CHAR;
                toks[ntok].ival = name[len++];
                break;
            }
            case N_ALPHA: {
                int len2 = decode_token_alpha(ctx, ntok, &name[len],
                                              int(name_len) - len);
                if (len2 < 0) return -1;
                toks[ntok].type = N_ALPHA;
                toks[ntok].sval = len;
                toks[ntok].ival = len2;
                len += len2;
                break;
            }
            case N_DIGITS0:
                if (!decode_token_int1(ctx, ntok, N_DZLEN, &vl)) return -1;
                if (!decode_token_int(ctx, ntok, N_DIGITS0, &v)) return -1;
                if (size_t(len) + 20 + vl >= name_len) return -1;
                len += append_u32_fixed(&name[len], v, uint8_t(vl));
                toks[ntok].type = N_DIGITS0;
                toks[ntok].ival = int(v);
                toks[ntok].sval = int(vl);
                break;
            case N_DDELTA0: {
                const TokInfo* pk = ctx.tok_at(prev, ntok);
                if (!pk) return -1;
                if (!decode_token_int1(ctx, ntok, N_DDELTA0, &v)) return -1;
                v += pk->ival;
                if (size_t(len) + pk->sval + 1 >= name_len)
                    return -1;
                len += append_u32_fixed(&name[len], v,
                                        uint8_t(pk->sval));
                toks[ntok].type = N_DIGITS0;
                toks[ntok].ival = int(v);
                toks[ntok].sval = pk->sval;
                break;
            }
            case N_DIGITS:
                if (!decode_token_int(ctx, ntok, N_DIGITS, &v)) return -1;
                if (size_t(len) + 20 >= name_len) return -1;
                len += append_u32_var(&name[len], v);
                toks[ntok].type = N_DIGITS;
                toks[ntok].ival = int(v);
                break;
            case N_DDELTA: {
                const TokInfo* pk = ctx.tok_at(prev, ntok);
                if (!pk) return -1;
                if (!decode_token_int1(ctx, ntok, N_DDELTA, &v)) return -1;
                v += pk->ival;
                if (size_t(len) + 20 >= name_len) return -1;
                len += append_u32_var(&name[len], v);
                toks[ntok].type = N_DIGITS;
                toks[ntok].ival = int(v);
                break;
            }
            case N_NOP:
                toks[ntok].type = N_NOP;
                break;
            case N_MATCH: {
                const TokInfo* pk = ctx.tok_at(prev, ntok);
                if (!pk) return -1;
                switch (pk->type) {
                    case N_CHAR:
                        if (size_t(len) + 1 >= name_len) return -1;
                        name[len] = uint8_t(pk->ival);
                        toks[ntok].type = N_CHAR;
                        toks[ntok].ival = name[len++];
                        break;
                    case N_ALPHA:
                        if (pk->ival < 0 ||
                            size_t(len) + pk->ival >= name_len)
                            return -1;
                        memcpy(&name[len],
                               out.data() + prev.name_off +
                                   pk->sval,
                               pk->ival);
                        toks[ntok].type = N_ALPHA;
                        toks[ntok].sval = len;
                        toks[ntok].ival = pk->ival;
                        len += pk->ival;
                        break;
                    case N_DIGITS:
                        if (size_t(len) + 20 >= name_len) return -1;
                        len += append_u32_var(&name[len],
                                              uint32_t(pk->ival));
                        toks[ntok].type = N_DIGITS;
                        toks[ntok].ival = pk->ival;
                        break;
                    case N_DIGITS0:
                        if (size_t(len) + pk->sval >= name_len)
                            return -1;
                        len += append_u32_fixed(
                            &name[len], uint32_t(pk->ival),
                            uint8_t(pk->sval));
                        toks[ntok].type = N_DIGITS0;
                        toks[ntok].ival = pk->ival;
                        toks[ntok].sval = pk->sval;
                        break;
                    default:
                        return -1;
                }
                break;
            }
            default:  // includes elided N_END
            case N_END:
                if (size_t(len) + 1 >= name_len) return -1;
                name[len++] = 0;
                toks[ntok].type = N_END;
                cur.name_off = int(out_off);
                cur.name_len = len - 1;
                ctx.tok_commit(cur, toks, ntok + 1);
                return len;
        }
    }
    return -1;
}

}  // namespace

std::vector<uint8_t> encode_names(const uint8_t* blk, int len, int level,
                                  int use_arith, int* last_start_p) {
    if (len < 0) return {};

    int nreads = 0;
    for (int i = 0; i < len; i++)
        if (blk[i] <= '\n') nreads++;

    Ctx ctx(nreads);
    // each inserted char adds at most one node, so len+1 is an exact
    // upper bound: one reserve removes every pool realloc copy (the
    // doublings were ~20% of encode time; reserved-but-unfaulted pages
    // are free on this side of the copy)
    ctx.trie.pool.reserve(size_t(len) + 16);

    // pass 1: trie over whole block
    int last_start = 0, ctr = 0;
    {
        int i = 0, j = 0;
        for (; i < len; j = ++i) {
            while (i < len && blk[i] > '\n') i++;
            if (i >= len) break;
            last_start = i + 1;
            if (!build_trie(ctx, &blk[j], i - j, ctr++)) return {};
        }
    }
    if (last_start_p) *last_start_p = last_start;

    // pass 2: tokenize each name
    {
        int i = 0, j = 0;
        for (; i < len; j = ++i) {
            while (i < len && int8_t(blk[i]) >= ' ') i++;
            if (i >= len) break;
            if (blk[i] != '\0' && blk[i] != '\n') return {};  // 7-bit only
            if (!encode_name(ctx, blk, j, i - j, 1)) return {};
        }
    }

    // Drop all-MATCH type streams (regenerable on decode)
    for (int i = 0; i < ctx.max_tok * 16; i += 16) {
        Desc& d = ctx.desc[i];
        if (d.buf.empty()) continue;
        size_t z = 1;
        while (z < d.buf.size() && d.buf[z] == N_MATCH) z++;
        if (z == d.buf.size()) {
            bool other = false;
            for (int k = 1; k < 16; k++)
                if (!ctx.desc[i + k].buf.empty()) {
                    other = true;
                    break;
                }
            if (other) d.buf.clear();
        }
    }

    // entropy-code each stream, then dedup identical compressed blocks
    std::vector<std::vector<uint8_t>> enc(ctx.max_tok * 16);
    std::vector<int> dup_from(ctx.max_tok * 16, -1);
    for (int i = 0; i < ctx.max_tok * 16; i++) {
        if (ctx.desc[i].buf.empty()) continue;
        if (!entropy_encode(ctx.desc[i].buf, i & 0xf, level, use_arith,
                            enc[i]))
            return {};
        for (int j = 0; j < i; j++) {
            if (enc[j].empty()) continue;
            if (enc[i].size() != enc[j].size() || enc[i].size() <= 4)
                continue;
            if (enc[i] == enc[j]) {
                dup_from[i] = j;
                break;
            }
        }
    }

    // serialize
    std::vector<uint8_t> out;
    out.push_back(uint8_t(last_start));
    out.push_back(uint8_t(last_start >> 8));
    out.push_back(uint8_t(last_start >> 16));
    out.push_back(uint8_t(last_start >> 24));
    out.push_back(uint8_t(nreads));
    out.push_back(uint8_t(nreads >> 8));
    out.push_back(uint8_t(nreads >> 16));
    out.push_back(uint8_t(nreads >> 24));
    out.push_back(uint8_t(use_arith));
    int last_tnum = -1;
    for (int i = 0; i < ctx.max_tok * 16; i++) {
        if (ctx.desc[i].buf.empty()) continue;
        uint8_t ttype8 = uint8_t(i & 15);
        if ((i >> 4) != last_tnum) {
            ttype8 |= 128;
            last_tnum = i >> 4;
        }
        if (dup_from[i] >= 0) {
            out.push_back(ttype8 | 64);
            out.push_back(uint8_t(dup_from[i] >> 4));
            out.push_back(uint8_t(dup_from[i] & 15));
        } else {
            out.push_back(ttype8);
            out.insert(out.end(), enc[i].begin(), enc[i].end());
        }
    }
    return out;
}

std::vector<uint8_t> decode_names(const uint8_t* in, uint32_t sz) {
    if (sz < 9) return {};
    int64_t ulen = in[0] | (in[1] << 8) | (in[2] << 16) |
                   (uint32_t(in[3]) << 24);
    int nreads = in[4] | (in[5] << 8) | (in[6] << 16) |
                 (int(uint32_t(in[7]) << 24));
    int use_arith = in[8];
    if (ulen < 0 || nreads < 0) return {};

    Ctx ctx(nreads);
    uint32_t o = 9;
    int tnum = -1;
    while (o < sz) {
        uint8_t ttype = in[o++];
        if (ttype & 64) {
            if (o + 2 > sz) return {};
            int j = in[o++] << 4;
            j += in[o++];
            if (ttype & 128) {
                tnum++;
                if (tnum >= kMaxTokens) return {};
                ctx.max_tok = tnum + 1;
            }
            if ((ttype & 15) != 0 && (ttype & 128)) {
                if (tnum < 0) return {};
                Desc& t = ctx.desc[tnum << 4];
                t.buf.assign(size_t(nreads), N_MATCH);
                if (nreads) t.buf[0] = ttype & 15;
                t.pos = 0;
            }
            if (tnum < 0) return {};
            int i = (tnum << 4) | (ttype & 15);
            if (j >= i) return {};
            if (ctx.desc[j].buf.empty()) return {};
            ctx.desc[i].buf = ctx.desc[j].buf;
            ctx.desc[i].pos = 0;
            continue;
        }

        if (ttype & 128) {
            tnum++;
            if (tnum >= kMaxTokens) return {};
            ctx.max_tok = tnum + 1;
        }
        if ((ttype & 15) != 0 && (ttype & 128)) {
            if (tnum < 0) return {};
            Desc& t = ctx.desc[tnum << 4];
            t.buf.assign(size_t(nreads), N_MATCH);
            if (nreads) t.buf[0] = ttype & 15;
            t.pos = 0;
        }
        if (tnum < 0) return {};

        int64_t expect = framed_usize(&in[o], sz - o);
        if (expect < 0) return {};
        int i = (tnum << 4) | (ttype & 15);
        if (i >= kMaxTBlocks) return {};
        std::vector<uint8_t> data;
        int64_t clen = entropy_decode(use_arith, &in[o], sz - o, data);
        if (clen < 0 || int64_t(data.size()) != expect) return {};
        ctx.desc[i].buf = std::move(data);
        ctx.desc[i].pos = 0;
        o += uint32_t(clen);
    }

    size_t cap = size_t(ulen) + 1024;
    std::vector<uint8_t> out(cap);
    size_t out_sz = 0;
    int ret;
    while ((ret = decode_name(ctx, out, out_sz, cap)) > 0) out_sz += ret;
    if (ret < 0) return {};
    out.resize(out_sz);
    return out;
}

}  // namespace tok3
}  // namespace fqz5

extern "C" {
int64_t fqz5_tok3_encode(const uint8_t* blk, uint32_t len, int level,
                         int use_arith, uint8_t* out, uint32_t out_cap) {
    std::vector<uint8_t> v =
        fqz5::tok3::encode_names(blk, int(len), level, use_arith, nullptr);
    if (v.empty()) return -1;
    if (v.size() > out_cap) return -1;
    memcpy(out, v.data(), v.size());
    return int64_t(v.size());
}
int64_t fqz5_tok3_decode(const uint8_t* in, uint32_t sz, uint8_t* out,
                         uint32_t out_cap) {
    std::vector<uint8_t> v = fqz5::tok3::decode_names(in, sz);
    if (v.empty() && sz > 9) {
        // empty output is only legal for empty input blocks
        return -1;
    }
    if (v.size() > out_cap) return -1;
    memcpy(out, v.data(), v.size());
    return int64_t(v.size());
}
}
