// FQZ adaptive-context quality codec, wire-compatible with
// htscodecs/fqzcomp_qual.c (fqz_compress / fqz_decompress, FQZ_VERS 5).
//
// Per quality symbol the codec selects one of 65536 adaptive models via
// a context mixing: recent quality history, position in read, running
// delta, read-1/read-2 + average-quality selector, and optionally the
// nucleotide context.  Parameter picking (strategy tables, auto-tuned
// selector/read2 splits, qmap/ptab/dtab derivation) mirrors the
// reference exactly since the chosen parameters are serialized into the
// stream header.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#include "rc.h"

namespace fqz5 {
namespace {

constexpr int kVers = 5;          // FQZ_VERS
constexpr int kCtxBits = 16;
constexpr int kCtxSize = 1 << kCtxBits;
constexpr int kQMax = 96;

// gflags
constexpr int kGMultiParam = 1;
constexpr int kGHaveSTab = 2;
constexpr int kGDoRev = 4;
constexpr int kGUseSeq = 8;
// pflags
constexpr int kPDedup = 2;
constexpr int kPLen = 4;
constexpr int kPSel = 8;
constexpr int kPQmap = 16;
constexpr int kPPtab = 32;
constexpr int kPDtab = 64;
constexpr int kPQtab = 128;

constexpr int kFReverse = 16;   // FQZ_FREVERSE
constexpr int kFRead2 = 128;    // FQZ_FREAD2

constexpr int kIntMax = std::numeric_limits<int>::max();

struct Param {
    uint16_t context = 0;
    unsigned pflags = 0;
    unsigned do_sel = 0, do_dedup = 0, store_qmap = 0, fixed_len = 0;
    uint8_t use_qtab = 0, use_dtab = 0, use_ptab = 0;
    unsigned qbits = 0, qloc = 0;
    unsigned pbits = 0, ploc = 0;
    unsigned dbits = 0, dloc = 0;
    unsigned sbits = 0, sloc = 0;
    unsigned bbits = 0, bloc = 0, boff = 0;
    int max_sym = 0, nsym = 0, max_sel = 0;
    unsigned qmap[256] = {0};
    unsigned qtab[256] = {0};
    unsigned ptab[1024] = {0};
    unsigned dtab[256] = {0};
    int qshift = 0, pshift = 0, dshift = 0, sshift = 0;
    unsigned qmask = 0;
    int do_r2 = 0, do_qa = 0;
};

struct GParams {
    int vers = kVers;
    unsigned gflags = 0;
    int nparam = 1;
    int max_sel = 0;
    unsigned stab[256] = {0};
    int max_sym = 0;
    std::vector<Param> p;
};

// Strategy presets (fqzcomp_qual.c:204-218):
//  qb qs pb ps db ds ql sl pl dl r2 qa bb bl bo
const int kStratOpts[][15] = {
    {10, 5, 4, -1, 2, 1, 0, 14, 10, 14, 0, -1, 0, 0, 0},
    {8, 5, 7, 0, 0, 0, 0, 14, 8, 14, 1, -1, 0, 0, 0},
    {12, 6, 0, 0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0},
    {6, 6, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 10, 6, 3},
    {8, 5, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 8, 8, 2},
    {0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0},
};
constexpr int kNStrats = sizeof(kStratOpts) / sizeof(*kStratOpts);

// Double run-length encoding of small monotonic tables
// (fqzcomp_qual.c store_array/read_array).
int store_array(uint8_t* out, const unsigned* array, int size) {
    uint8_t tmp[2048];
    int i = 0, j = 0, k = 0;
    for (; i < size; j++) {
        int run_len = i;
        while (i < size && int(array[i]) == j) i++;
        run_len = i - run_len;
        int r;
        do {
            r = run_len < 255 ? run_len : 255;
            tmp[k++] = uint8_t(r);
            run_len -= r;
        } while (r == 255);
    }
    while (i < size) {
        tmp[k++] = 0;
        j++;
        i++;  // unreachable in practice; mirror reference shape
    }

    int last = -1;
    int o = 0;
    for (j = 0; j < k; o++) {
        out[o] = tmp[j++];
        if (out[o] == last) {
            int n = j;
            while (j < k && tmp[j] == last) j++;
            out[++o] = uint8_t(j - n);
        } else {
            last = out[o];
        }
    }
    return o;
}

int read_array(const uint8_t* in, size_t in_size, unsigned* array, int size) {
    uint8_t R[1024];
    int i, j, z, last = -1;
    size = size < 1024 ? size : 1024;

    for (i = j = z = 0; z < size && i < int(in_size); i++) {
        int run = in[i];
        R[j++] = uint8_t(run);
        z += run;
        if (run == last) {
            if (i + 1 >= int(in_size)) return -1;
            int copy = in[++i];
            z += run * copy;
            while (copy-- && z <= size && j < 1024) R[j++] = uint8_t(run);
        }
        if (j >= 1024) return -1;
        last = run;
    }
    int nb = i;

    int R_max = j;
    for (i = j = z = 0; j < size; i++) {
        int run_len = 0;
        int run_part;
        if (z >= R_max) return -1;
        do {
            run_part = R[z++];
            run_len += run_part;
        } while (run_part == 255 && z < R_max);
        if (run_part == 255) return -1;
        while (run_len && j < size) run_len--, array[j++] = i;
    }
    return nb;
}

struct Slice {
    int num_records;
    const uint32_t* len;
    uint32_t* flags;      // mutable: selector bits live in the top 16
    const uint8_t* seq;   // concatenated bases or nullptr
};

struct QState {
    unsigned qctx = 0;
    unsigned p = 0;
    unsigned delta = 0;
    unsigned prevq = 0;
    unsigned s = 0;
    unsigned first_len = 1;
    unsigned seq = 0;
};

struct Models {
    std::vector<AdaptiveModel<kQMax>> qual;
    AdaptiveModel<256> len[4];
    AdaptiveModel<2> revcomp;
    AdaptiveModel<256> sel;
    AdaptiveModel<2> dup;

    // Returns false when the alphabet exceeds the 96-symbol quality
    // models.  The reference writes past its model array here
    // (c_simple_model.h _init with max_sym > NSYM — heap corruption);
    // we decline instead, which the method-trial layer treats as
    // "codec unavailable" (fqzcomp5.c handles NULL codec returns the
    // same way).
    bool init(const GParams& gp) {
        if (gp.max_sym + 1 > 96 + 1) return false;
        qual.resize(kCtxSize);
        for (int i = 0; i < kCtxSize; i++) qual[i].init(gp.max_sym + 1);
        for (int i = 0; i < 4; i++) len[i].init(256);
        revcomp.init(2);
        dup.init(2);
        if (gp.max_sel > 0) sel.init(gp.max_sel + 1);
        return true;
    }
};

// A/a=0 C/c=1 G/g=2 T/t/U/u=3, rest 0 (fqzcomp_qual.c:1019-1024)
struct BaseLut {
    int L[256] = {0};
    BaseLut() {
        L['C'] = L['c'] = 1;
        L['G'] = L['g'] = 2;
        L['T'] = L['t'] = 3;
        L['U'] = L['u'] = 3;
    }
};
const BaseLut kBase;
#define kBaseLut kBase.L

inline unsigned update_ctx(const Param& pm, QState& st, int q, int base) {
    unsigned last = 0;
    st.qctx = (st.qctx << pm.qshift) + pm.qtab[q];
    last += (st.qctx & pm.qmask) << pm.qloc;
    last += pm.ptab[st.p < 1023 ? st.p : 1023];      // pre-shifted by ploc
    last += pm.dtab[st.delta < 255 ? st.delta : 255]; // pre-shifted by dloc
    st.seq = ((st.seq << 2) | unsigned(base)) & ((1u << pm.bbits) - 1);
    last += st.seq << pm.bloc;
    last += st.s << pm.sloc;
    st.delta += (st.prevq != unsigned(q));
    st.prevq = q;
    st.p--;
    return last & (kCtxSize - 1);
}

// Quality statistics + auto-tuning (fqzcomp_qual.c fqz_qual_stats).
void qual_stats(Slice* s, const uint8_t* in, size_t in_size, Param* pm,
                uint32_t qhist[256]) {
    constexpr int NP = 128;
    std::vector<uint32_t> qhistb(NP * 256, 0);
    std::vector<uint32_t> qhist1(NP * 256, 0);
    std::vector<uint32_t> qhist2(NP * 256, 0);
    std::vector<uint64_t> t1(NP, 0), t2(NP, 0);
    std::vector<uint32_t> avg(2560, 0);

    int dir = 0;
    size_t last_len = 0;
    int do_dedup = 0;
    size_t rec = 0, i, j = 0;
    int num_rec = 0;

    int max_sel = 0;
    int has_r2 = 0;
    for (rec = 0; rec < size_t(s->num_records); rec++) {
        num_rec++;
        if (max_sel < int(s->flags[rec] >> 16))
            max_sel = int(s->flags[rec] >> 16);
        if (s->flags[rec] & kFRead2) has_r2 = 1;
    }

    std::vector<int> avg_qual(s->num_records + 1, 0);
    rec = i = 0;
    while (i < in_size) {
        if (rec < size_t(s->num_records)) {
            j = s->len[rec];
            dir = (s->flags[rec] & kFRead2) ? 1 : 0;
            if (i > 0 && j == last_len &&
                !memcmp(in + i - last_len, in + i, j))
                do_dedup++;
        } else {
            j = in_size - i;
            dir = 0;
        }
        last_len = j;

        uint32_t* qh = dir ? qhist2.data() : qhist1.data();
        uint64_t* th = dir ? t2.data() : t1.data();

        uint32_t tot = 0;
        for (; i < in_size && j > 0; i++, j--) {
            tot += in[i];
            qhist[in[i]]++;
            qhistb[(j & (NP - 1)) * 256 + in[i]]++;
            qh[(j & (NP - 1)) * 256 + in[i]]++;
            th[j & (NP - 1)]++;
        }
        tot = last_len ? uint32_t(tot * 10.0 / last_len + .5) : 0;
        if (rec < avg_qual.size()) avg_qual[rec] = tot;
        avg[tot < 2559 ? tot : 2559]++;
        rec++;
    }
    pm->do_dedup = ((rec + 1) / (do_dedup + 1) < 500);

    last_len = 0;
    pm->max_sym = pm->nsym = 0;
    for (int x = 0; x < 256; x++)
        if (qhist[x]) pm->max_sym = x, pm->nsym++;

    // Does binning by average record quality pay for its selector bits?
    if (pm->do_qa != 0) {
        double qf0 = pm->nsym > 8 ? 0.2 : 0.05;
        double qf1 = pm->nsym > 8 ? 0.5 : 0.22;
        double qf2 = pm->nsym > 8 ? 0.8 : 0.60;

        int total = 0;
        size_t x = 0;
        while (x < 2560) {
            total += avg[x];
            if (total > qf0 * num_rec) break;
            avg[x++] = 0;
        }
        while (x < 2560) {
            total += avg[x];
            if (total > qf1 * num_rec) break;
            avg[x++] = 1;
        }
        while (x < 2560) {
            total += avg[x];
            if (total > qf2 * num_rec) break;
            avg[x++] = 2;
        }
        while (x < 2560) avg[x++] = 3;

        std::vector<int> qbin4(4 * NP * 256, 0), qbin2(2 * NP * 256, 0),
            qbin1(NP * 256, 0);
        std::vector<int> qcnt4(4 * NP, 0), qcnt2(2 * NP, 0), qcnt1(NP, 0);
        i = 0;
        rec = 0;
        while (i < in_size) {
            if (rec < size_t(s->num_records))
                j = s->len[rec];
            else
                j = in_size - i;
            last_len = j;
            uint32_t tot2 = rec < avg_qual.size() ? avg_qual[rec] : 0;
            int qb4 = avg[tot2 < 2559 ? tot2 : 2559];
            int qb2 = qb4 / 2;
            for (; i < in_size && j > 0; i++, j--) {
                int px = int(j & (NP - 1));
                qbin4[(qb4 * NP + px) * 256 + in[i]]++;
                qcnt4[qb4 * NP + px]++;
                qbin2[(qb2 * NP + px) * 256 + in[i]]++;
                qcnt2[qb2 * NP + px]++;
                qbin1[px * 256 + in[i]]++;
                qcnt1[px]++;
            }
            rec++;
        }

        double e1 = 0, e2 = 0, e4 = 0;
        for (int p = 0; p < NP; p++) {
            for (int c = 0; c < 256; c++) {
                if (qbin1[p * 256 + c])
                    e1 += qbin1[p * 256 + c] *
                          log(qbin1[p * 256 + c] / double(qcnt1[p]));
                for (int b = 0; b < 2; b++)
                    if (qbin2[(b * NP + p) * 256 + c])
                        e2 += qbin2[(b * NP + p) * 256 + c] *
                              log(qbin2[(b * NP + p) * 256 + c] /
                                  double(qcnt2[b * NP + p]));
                for (int b = 0; b < 4; b++)
                    if (qbin4[(b * NP + p) * 256 + c])
                        e4 += qbin4[(b * NP + p) * 256 + c] *
                              log(qbin4[(b * NP + p) * 256 + c] /
                                  double(qcnt4[b * NP + p]));
            }
        }
        e1 /= -log(2) / 8;
        e2 /= -log(2) / 8;
        e4 /= -log(2) / 8;

        double qm = pm->do_qa > 0 ? 1 : 0.98;
        if ((pm->do_qa == -1 || pm->do_qa >= 4) &&
            e4 + s->num_records / 4 < e2 * qm + s->num_records / 8 &&
            e4 + s->num_records / 4 < e1 * qm) {
            for (int r = 0; r < s->num_records; r++)
                s->flags[r] |= avg[avg_qual[r] < 2559 ? avg_qual[r] : 2559]
                               << 16;
            pm->do_sel = 1;
            max_sel = 3;
        } else if ((pm->do_qa == -1 || pm->do_qa >= 2) &&
                   e2 + s->num_records / 8 < e1 * qm) {
            for (int r = 0; r < s->num_records; r++)
                s->flags[r] |=
                    (avg[avg_qual[r] < 2559 ? avg_qual[r] : 2559] >> 1) << 16;
            pm->do_sel = 1;
            max_sel = 1;
        }

        if (pm->do_qa == -1) {
            if (pm->pbits > 0 && pm->dbits > 0) {
                pm->sloc = pm->dloc - 1;
                pm->pbits--;
                pm->dbits--;
                pm->dloc++;
            } else if (pm->dbits >= 2) {
                pm->sloc = pm->dloc;
                pm->dbits -= 2;
                pm->dloc += 2;
            } else if (pm->qbits >= 2) {
                pm->qbits -= 2;
                pm->ploc -= 2;
                pm->sloc = 16 - 2 - pm->do_r2;
                if (pm->qbits == 6 && pm->qshift == 5) pm->qbits--;
            }
            pm->do_qa = 4;
        }
    }

    // Does splitting READ1/READ2 pay off?
    if (has_r2 || pm->do_r2) {
        double e1 = 0, e2 = 0;
        for (int p = 0; p < NP; p++) {
            if (!t1[p] || !t2[p]) continue;
            for (int c = 0; c < 256; c++) {
                if (!qhistb[p * 256 + c]) continue;
                e1 -= qhistb[p * 256 + c] *
                      log(qhistb[p * 256 + c] / double(t1[p] + t2[p]));
                if (qhist1[p * 256 + c])
                    e2 -= qhist1[p * 256 + c] *
                          log(qhist1[p * 256 + c] / double(t1[p]));
                if (qhist2[p * 256 + c])
                    e2 -= qhist2[p * 256 + c] *
                          log(qhist2[p * 256 + c] / double(t2[p]));
            }
        }
        e1 /= log(2) * 8;
        e2 /= log(2) * 8;
        double qm = pm->do_r2 > 0 ? 1 : 0.95;
        if (e2 + (8 + s->num_records / 8) < e1 * qm) {
            for (int r = 0; r < s->num_records; r++) {
                int sel = int(s->flags[r] >> 16);
                s->flags[r] = (s->flags[r] & 0xffff) |
                              ((s->flags[r] & kFRead2) ? ((sel * 2) + 1) << 16
                                                       : ((sel * 2) + 0) << 16);
                if (max_sel < int(s->flags[r] >> 16))
                    max_sel = int(s->flags[r] >> 16);
            }
        }
    }

    if (max_sel > 0) {
        pm->do_sel = 1;
        pm->max_sel = max_sel;
    }
}

int store_parameters1(const GParams& gp, const Param& pm, uint8_t* comp) {
    int ci = 0;
    comp[ci++] = uint8_t(pm.context);
    comp[ci++] = uint8_t(pm.context >> 8);
    comp[ci++] = uint8_t(pm.pflags);
    comp[ci++] = uint8_t(pm.max_sym);
    comp[ci++] = uint8_t((pm.qbits << 4) | pm.qshift);
    comp[ci++] = uint8_t((pm.qloc << 4) | pm.sloc);
    comp[ci++] = uint8_t((pm.ploc << 4) | pm.dloc);
    if (gp.gflags & kGUseSeq) {
        comp[ci++] = uint8_t((pm.bbits << 4) | pm.bloc);
        comp[ci++] = uint8_t(pm.boff << 4);
    }
    if (pm.store_qmap) {
        for (int i = 0; i < 256; i++)
            if (pm.qmap[i] != unsigned(kIntMax)) comp[ci++] = uint8_t(i);
    }
    if (pm.qbits && pm.use_qtab) ci += store_array(comp + ci, pm.qtab, 256);
    if (pm.pbits && pm.use_ptab) ci += store_array(comp + ci, pm.ptab, 1024);
    if (pm.dbits && pm.use_dtab) ci += store_array(comp + ci, pm.dtab, 256);
    return ci;
}

int store_parameters(const GParams& gp, uint8_t* comp) {
    int ci = 0;
    comp[ci++] = uint8_t(gp.vers);
    comp[ci++] = uint8_t(gp.gflags);
    if (gp.gflags & kGMultiParam) comp[ci++] = uint8_t(gp.nparam);
    if (gp.gflags & kGHaveSTab) {
        comp[ci++] = uint8_t(gp.max_sel);
        ci += store_array(comp + ci, gp.stab, 256);
    }
    for (int i = 0; i < gp.nparam; i++)
        ci += store_parameters1(gp, gp.p[i], comp + ci);
    return ci;
}

int pick_parameters(GParams* gp, int vers, int strat, Slice* s,
                    const uint8_t* in, size_t in_size) {
    int dsqr[] = {
        0, 1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3,
        4, 4, 4, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5, 5, 5, 5,
        5, 5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6,
        6, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    };
    constexpr int kDsqrN = sizeof(dsqr) / sizeof(*dsqr);
    uint32_t qhist[256] = {0};

    if (strat >= kNStrats) strat = kNStrats - 1;

    *gp = GParams();
    gp->vers = kVers;
    gp->p.resize(1);
    gp->nparam = 1;
    gp->max_sel = 0;
    Param* pm = &gp->p[0];

    pm->qbits = kStratOpts[strat][0];
    pm->qshift = kStratOpts[strat][1];
    pm->pbits = kStratOpts[strat][2];
    pm->pshift = kStratOpts[strat][3];
    pm->dbits = kStratOpts[strat][4];
    pm->dshift = kStratOpts[strat][5];
    pm->qloc = kStratOpts[strat][6];
    pm->sloc = kStratOpts[strat][7];
    pm->ploc = kStratOpts[strat][8];
    pm->dloc = kStratOpts[strat][9];
    pm->bbits = kStratOpts[strat][12];
    pm->bloc = kStratOpts[strat][13];
    pm->boff = kStratOpts[strat][14];

    if (vers == 3 && pm->bbits == 0) gp->gflags |= kGDoRev;

    pm->do_r2 = kStratOpts[strat][10];
    pm->do_qa = kStratOpts[strat][11];

    // clamp oversized / undersized length arrays (reference behaviour;
    // our caller always passes consistent data so this is a no-op)

    qual_stats(s, in, in_size, pm, qhist);

    pm->store_qmap = (pm->nsym <= 8 && pm->nsym * 2 < pm->max_sym);

    uint32_t first_len = s->num_records ? s->len[0] : 0;
    int fi = 1;
    for (; fi < s->num_records; fi++)
        if (s->len[fi] != first_len) break;
    pm->fixed_len = (fi == s->num_records);
    pm->use_qtab = 0;

    if (strat < kNStrats - 1) {
        if (pm->pshift < 0)
            pm->pshift = std::max(
                0, int(log(double(s->len[0]) / (1 << pm->pbits)) / log(2) + .5));
        if (pm->nsym <= 4) {
            pm->qshift = 2;
            if (in_size < 5000000) {
                pm->pbits = 2;
                pm->pshift = 5;
            }
        } else if (pm->nsym <= 8) {
            pm->qbits = pm->qbits < 9 ? pm->qbits : 9;
            pm->qshift = 3;
            if (in_size < 5000000) pm->qbits = 6;
        }
        if (in_size < 300000) {
            pm->qbits = pm->qshift;
            pm->dbits = 2;
        }
    }

    for (int i = 0; i < kDsqrN; i++)
        if (dsqr[i] > (1 << pm->dbits) - 1) dsqr[i] = (1 << pm->dbits) - 1;

    if (pm->store_qmap) {
        int j = 0;
        for (int i = 0; i < 256; i++)
            pm->qmap[i] = qhist[i] ? unsigned(j++) : unsigned(kIntMax);
        pm->max_sym = pm->nsym;
    } else {
        pm->nsym = 255;
        for (int i = 0; i < 256; i++) pm->qmap[i] = i;
    }
    if (gp->max_sym < pm->max_sym) gp->max_sym = pm->max_sym;

    if (pm->qbits) {
        for (int i = 0; i < 256; i++) pm->qtab[i] = i;
    }

    // HiFi special-case: dominant '~' quality with the PacBio strategy
    if (qhist['~' - '!'] * 2 > in_size && strat == 3) {
        pm->use_qtab = 1;
        int n = 0;
        for (int i = 0; i < 256; i++) {
            if (i == '~' - '!')
                n++;
            else if (i == '~' - '!' + 1 || i % 16 == 0)
                n++;
            pm->qtab[i] = n;
        }
        pm->qbits = 9;
        pm->qshift = 3;
        pm->bbits = 6;
        pm->bloc = 9;
        pm->boff = 2;
    }

    pm->qmask = (1u << pm->qbits) - 1;

    if (pm->pbits) {
        for (int i = 0; i < 1024; i++) {
            int v = i >> pm->pshift;
            int cap = (1 << pm->pbits) - 1;
            pm->ptab[i] = v < cap ? v : cap;
        }
    }
    if (pm->dbits) {
        for (int i = 0; i < 256; i++) {
            int idx = i >> pm->dshift;
            if (idx > kDsqrN - 1) idx = kDsqrN - 1;
            pm->dtab[i] = dsqr[idx];
        }
    }

    pm->use_ptab = (pm->pbits > 0);
    pm->use_dtab = (pm->dbits > 0);

    pm->pflags = (pm->use_qtab ? kPQtab : 0) | (pm->use_dtab ? kPDtab : 0) |
                 (pm->use_ptab ? kPPtab : 0) | (pm->do_sel ? kPSel : 0) |
                 (pm->fixed_len ? kPLen : 0) | (pm->do_dedup ? kPDedup : 0) |
                 (pm->store_qmap ? kPQmap : 0);

    gp->max_sel = 0;
    if (pm->do_sel) {
        gp->max_sel = 1;
        gp->gflags |= kGHaveSTab;
    }
    if (gp->max_sel) {
        int mx = 0;
        for (int i = 0; i < s->num_records; i++)
            if (mx < int(s->flags[i] >> 16)) mx = int(s->flags[i] >> 16);
        gp->max_sel = mx;
    }
    return 0;
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

}  // namespace

int64_t fqz_compress_impl(const uint8_t* in, size_t in_size, Slice* s,
                          int strat, uint8_t* out, size_t out_cap) {
    GParams gp;
    if (pick_parameters(&gp, 4, strat, s, in, in_size) < 0) return -1;

    if (!s->seq) {
        for (int j = 0; j < gp.nparam; j++)
            gp.p[j].bbits = gp.p[j].bloc = 0;
        gp.gflags &= ~kGUseSeq;
    } else {
        for (int j = 0; j < gp.nparam; j++)
            if (gp.p[j].bbits) gp.gflags |= kGUseSeq;
    }

    size_t need = size_t(in_size * 1.1) + 100000;
    if (out_cap < need) return -1;

    int comp_idx = put_uv(out, uint32_t(in_size));
    comp_idx += store_parameters(gp, out + comp_idx);

    // fold the loc shifts into the tables for the hot loop
    for (int j = 0; j < gp.nparam; j++) {
        Param& pm = gp.p[j];
        for (int i = 0; i < 1024; i++) pm.ptab[i] <<= pm.ploc;
        for (int i = 0; i < 256; i++) pm.dtab[i] <<= pm.dloc;
    }

    Models model;
    if (!model.init(gp)) return -1;

    RangeCoder rc;
    rc.start_encode(out + comp_idx);
    // the 1.1x cap is heuristic — adversarial qualities can expand
    // past it; the guard turns that into a clean -1 (rc.h)
    rc.set_output_end(out + out_cap);

    // per-record sequence offsets
    std::vector<size_t> seq_off;
    if (s->seq) {
        seq_off.resize(s->num_records);
        size_t off = 0;
        for (int r = 0; r < s->num_records; r++) {
            seq_off[r] = off;
            off += s->len[r];
        }
    }

    QState st;
    Param* pm = &gp.p[0];
    unsigned last = 0;
    size_t last_len = 0;
    int64_t rec = 0;
    const uint8_t* seqp = nullptr;
    const uint8_t* seq_end = nullptr;

    for (size_t i = 0; i < in_size; i++) {
        if (st.p == 0) {
            if (pm->do_sel || (gp.gflags & kGMultiParam)) {
                st.s = rec < s->num_records ? s->flags[rec] >> 16 : 0;
                model.sel.encode(rc, uint16_t(st.s));
            } else {
                st.s = 0;
            }
            int x = (gp.gflags & kGHaveSTab) ? int(gp.stab[st.s]) : int(st.s);
            pm = &gp.p[x];

            unsigned len = s->len[rec];
            if (!pm->fixed_len || st.first_len) {
                model.len[0].encode(rc, uint16_t(len & 0xff));
                model.len[1].encode(rc, uint16_t((len >> 8) & 0xff));
                model.len[2].encode(rc, uint16_t((len >> 16) & 0xff));
                model.len[3].encode(rc, uint16_t((len >> 24) & 0xff));
                st.first_len = 0;
            }

            st.p = len;
            st.delta = 0;
            st.qctx = 0;
            st.prevq = 0;

            if (s->seq) {
                seqp = s->seq + seq_off[rec] + pm->boff;
                seq_end = s->seq + seq_off[rec] + len;
                st.seq = 0;
                for (unsigned b = 0; b < pm->boff; b++)
                    st.seq = (st.seq << 2) |
                             unsigned(kBaseLut[s->seq[seq_off[rec] + b]]);
            } else {
                seqp = seq_end = nullptr;
                st.seq = 0;
            }

            rec++;
            last = pm->context;

            if (pm->do_dedup) {
                if (i && len == last_len &&
                    !memcmp(in + i - last_len, in + i, len)) {
                    model.dup.encode(rc, 1);
                    i += len - 1;
                    st.p = 0;
                    continue;
                }
                model.dup.encode(rc, 0);
                last_len = len;
            }
        }

        uint8_t q = in[i];
        uint8_t qm = uint8_t(pm->qmap[q]);
        int base = (seqp && seqp < seq_end) ? kBaseLut[*seqp++] : 0;
        model.qual[last].encode(rc, qm);
        last = update_ctx(*pm, st, qm, base);
        __builtin_prefetch(&model.qual[last]);
    }

    rc.finish_encode();

    for (int r = 0; r < s->num_records; r++) s->flags[r] &= 0xffff;

    if (rc.error()) return -1;  // output exceeded the heuristic cap
    return comp_idx + int64_t(rc.out_size());
}

namespace {

int read_parameters1(const GParams& gp, Param* pm, const uint8_t* in,
                     size_t in_size) {
    int ii = 0;
    *pm = Param();
    if (in_size < 7) return -1;

    pm->context = uint16_t(in[ii] + (in[ii + 1] << 8));
    ii += 2;
    pm->pflags = in[ii++];
    pm->use_qtab = (pm->pflags & kPQtab) != 0;
    pm->use_dtab = (pm->pflags & kPDtab) != 0;
    pm->use_ptab = (pm->pflags & kPPtab) != 0;
    pm->do_sel = (pm->pflags & kPSel) != 0;
    pm->fixed_len = (pm->pflags & kPLen) != 0;
    pm->do_dedup = (pm->pflags & kPDedup) != 0;
    pm->store_qmap = (pm->pflags & kPQmap) != 0;
    pm->max_sym = in[ii++];

    pm->qbits = in[ii] >> 4;
    pm->qmask = (1u << pm->qbits) - 1;
    pm->qshift = in[ii++] & 15;
    pm->qloc = in[ii] >> 4;
    pm->sloc = in[ii++] & 15;
    pm->ploc = in[ii] >> 4;
    pm->dloc = in[ii++] & 15;

    if (gp.gflags & kGUseSeq) {
        pm->bbits = in[ii] >> 4;
        pm->bloc = in[ii++] & 15;
        pm->boff = in[ii++] >> 4;
    }

    if (pm->store_qmap) {
        for (int i = 0; i < 256; i++) pm->qmap[i] = unsigned(kIntMax);
        if (size_t(ii + pm->max_sym) > in_size) return -1;
        for (int i = 0; i < pm->max_sym; i++) pm->qmap[i] = in[ii++];
    } else {
        for (int i = 0; i < 256; i++) pm->qmap[i] = i;
    }

    if (pm->qbits) {
        if (pm->use_qtab) {
            int used = read_array(in + ii, in_size - ii, pm->qtab, 256);
            if (used < 0) return -1;
            ii += used;
        } else {
            for (int i = 0; i < 256; i++) pm->qtab[i] = i;
        }
    }
    if (pm->use_ptab) {
        int used = read_array(in + ii, in_size - ii, pm->ptab, 1024);
        if (used < 0) return -1;
        ii += used;
    } else {
        for (int i = 0; i < 1024; i++) pm->ptab[i] = 0;
    }
    if (pm->use_dtab) {
        int used = read_array(in + ii, in_size - ii, pm->dtab, 256);
        if (used < 0) return -1;
        ii += used;
    } else {
        for (int i = 0; i < 256; i++) pm->dtab[i] = 0;
    }
    return ii;
}

int read_parameters(GParams* gp, const uint8_t* in, size_t in_size) {
    int ii = 0;
    if (in_size < 10) return -1;
    gp->vers = in[ii++];
    if (gp->vers != kVers) return -1;
    gp->gflags = in[ii++];
    gp->nparam = (gp->gflags & kGMultiParam) ? in[ii++] : 1;
    if (gp->nparam <= 0) return -1;
    gp->max_sel = gp->nparam > 1 ? gp->nparam : 0;

    if (gp->gflags & kGHaveSTab) {
        gp->max_sel = in[ii++];
        int used = read_array(in + ii, in_size - ii, gp->stab, 256);
        if (used < 0) return -1;
        ii += used;
    } else {
        int i = 0;
        for (; i < gp->nparam; i++) gp->stab[i] = i;
        for (; i < 256; i++) gp->stab[i] = gp->nparam - 1;
    }

    gp->p.resize(gp->nparam);
    gp->max_sym = 0;
    for (int i = 0; i < gp->nparam; i++) {
        int e = read_parameters1(*gp, &gp->p[i], in + ii, in_size - ii);
        if (e < 0) return -1;
        if (gp->p[i].do_sel && gp->max_sel == 0) return -1;
        ii += e;
        if (gp->max_sym < gp->p[i].max_sym) gp->max_sym = gp->p[i].max_sym;
    }
    return ii;
}

}  // namespace

// seq: concatenated decoded bases (or nullptr); seq_lens: per-record
// lengths used to index seq (the FQZ stream itself codes quality
// lengths, which must agree for USE_SEQ streams).
// Pass-1 introspection for the device decomposition
// (docs/DEVICE_ADAPTIVE_CODECS.md): runs parameter picking and the
// exact per-byte context walk of fqz_compress_impl, but instead of
// range-coding it records each quality byte's (context, mapped
// symbol) and serializes the tables the device walk needs.
int64_t fqz_dump_ctx_impl(const uint8_t* in, size_t in_size, Slice* s,
                          int strat, uint32_t* ctx_out, uint8_t* qm_out,
                          uint32_t* par_out, size_t par_cap,
                          uint32_t* sel_out) {
    GParams gp;
    if (pick_parameters(&gp, 4, strat, s, in, in_size) < 0) return -1;
    if (!s->seq) {
        for (int j = 0; j < gp.nparam; j++)
            gp.p[j].bbits = gp.p[j].bloc = 0;   // no-seq path
        gp.gflags &= ~kGUseSeq;
    } else {
        for (int j = 0; j < gp.nparam; j++)
            if (gp.p[j].bbits) gp.gflags |= kGUseSeq;
    }

    for (int j = 0; j < gp.nparam; j++) {
        Param& pm = gp.p[j];
        for (int i = 0; i < 1024; i++) pm.ptab[i] <<= pm.ploc;
        for (int i = 0; i < 256; i++) pm.dtab[i] <<= pm.dloc;
    }

    // serialize: header + stab + per-param tables
    size_t need = 4 + 256 + size_t(gp.nparam) * (13 + 256 + 256 + 1024
                                                 + 256);
    if (par_cap < need) return -1;
    uint32_t* pp = par_out;
    *pp++ = uint32_t(gp.nparam);
    *pp++ = uint32_t(gp.gflags);
    *pp++ = uint32_t(gp.max_sel);
    *pp++ = uint32_t(gp.max_sym);
    for (int i = 0; i < 256; i++) *pp++ = gp.stab[i];
    for (int j = 0; j < gp.nparam; j++) {
        Param& pm = gp.p[j];
        *pp++ = uint32_t(pm.qshift);
        *pp++ = uint32_t(pm.qmask);
        *pp++ = uint32_t(pm.qloc);
        *pp++ = uint32_t(pm.sloc);
        *pp++ = uint32_t(pm.context);
        *pp++ = uint32_t(pm.do_sel);
        *pp++ = uint32_t(pm.do_dedup);
        *pp++ = uint32_t(pm.fixed_len);
        *pp++ = uint32_t(pm.do_qa);
        *pp++ = uint32_t(pm.do_r2);
        *pp++ = uint32_t(pm.bbits);
        *pp++ = uint32_t(pm.bloc);
        *pp++ = uint32_t(pm.boff);
        for (int i = 0; i < 256; i++) *pp++ = pm.qmap[i];
        for (int i = 0; i < 256; i++) *pp++ = pm.qtab[i];
        for (int i = 0; i < 1024; i++) *pp++ = pm.ptab[i];
        for (int i = 0; i < 256; i++) *pp++ = pm.dtab[i];
    }

    std::vector<size_t> seq_off;
    if (s->seq) {
        seq_off.resize(s->num_records);
        size_t off = 0;
        for (int r = 0; r < s->num_records; r++) {
            seq_off[r] = off;
            off += s->len[r];
        }
    }

    QState st;
    Param* pm = &gp.p[0];
    unsigned last = 0;
    size_t last_len = 0;
    int64_t rec = 0;
    const uint8_t* seqp = nullptr;
    const uint8_t* seq_end = nullptr;

    for (size_t i = 0; i < in_size; i++) {
        if (st.p == 0) {
            if (pm->do_sel || (gp.gflags & kGMultiParam)) {
                st.s = rec < s->num_records ? s->flags[rec] >> 16 : 0;
            } else {
                st.s = 0;
            }
            int x = (gp.gflags & kGHaveSTab) ? int(gp.stab[st.s])
                                             : int(st.s);
            pm = &gp.p[x];

            unsigned len = s->len[rec];
            if (!pm->fixed_len || st.first_len) st.first_len = 0;

            st.p = len;
            st.delta = 0;
            st.qctx = 0;
            st.prevq = 0;

            if (s->seq) {
                seqp = s->seq + seq_off[rec] + pm->boff;
                seq_end = s->seq + seq_off[rec] + len;
                st.seq = 0;
                for (unsigned b = 0; b < pm->boff; b++)
                    st.seq = (st.seq << 2) |
                             unsigned(kBaseLut[s->seq[seq_off[rec] + b]]);
            } else {
                seqp = seq_end = nullptr;
                st.seq = 0;
            }

            rec++;
            last = pm->context;

            if (pm->do_dedup) {
                if (i && len == last_len &&
                    !memcmp(in + i - last_len, in + i, len)) {
                    for (unsigned k = 0; k < len; k++) {
                        ctx_out[i + k] = 0xFFFFFFFFu;
                        qm_out[i + k] = 0;
                    }
                    i += len - 1;
                    st.p = 0;
                    continue;
                }
                last_len = len;
            }
        }

        uint8_t q = in[i];
        uint8_t qm = uint8_t(pm->qmap[q]);
        int base = (seqp && seqp < seq_end) ? kBaseLut[*seqp++] : 0;
        ctx_out[i] = last;
        qm_out[i] = qm;
        last = update_ctx(*pm, st, qm, base);
    }
    for (int r = 0; r < s->num_records; r++) {
        if (sel_out) sel_out[r] = s->flags[r] >> 16;
        s->flags[r] &= 0xffff;
    }
    return int64_t(pp - par_out);
}

// Parameter picking + header serialization WITHOUT the encode walk:
// the host half of the device encode path (ops/fqz_device_encode.py
// produces the range-coder payload; header + payload is the full
// native stream).  Emits the wire header (put_uv(in_size) +
// store_parameters) and the same parameter blob as fqz_dump_ctx_impl.
int64_t fqz_prepare_impl(const uint8_t* in, size_t in_size, Slice* s,
                         int strat, uint8_t* hdr_out, size_t hdr_cap,
                         uint32_t* hdr_len_out, uint32_t* par_out,
                         size_t par_cap, uint32_t* sel_out) {
    GParams gp;
    if (pick_parameters(&gp, 4, strat, s, in, in_size) < 0) return -1;

    if (!s->seq) {
        for (int j = 0; j < gp.nparam; j++)
            gp.p[j].bbits = gp.p[j].bloc = 0;
        gp.gflags &= ~kGUseSeq;
    } else {
        for (int j = 0; j < gp.nparam; j++)
            if (gp.p[j].bbits) gp.gflags |= kGUseSeq;
    }

    if (hdr_cap < 4096) return -1;
    int hdr = put_uv(hdr_out, uint32_t(in_size));
    hdr += store_parameters(gp, hdr_out + hdr);
    *hdr_len_out = uint32_t(hdr);

    for (int j = 0; j < gp.nparam; j++) {
        Param& pm = gp.p[j];
        for (int i = 0; i < 1024; i++) pm.ptab[i] <<= pm.ploc;
        for (int i = 0; i < 256; i++) pm.dtab[i] <<= pm.dloc;
    }

    size_t need = 4 + 256 + size_t(gp.nparam) * (13 + 256 + 256 + 1024
                                                 + 256);
    if (par_cap < need) return -1;
    uint32_t* pp = par_out;
    *pp++ = uint32_t(gp.nparam);
    *pp++ = uint32_t(gp.gflags);
    *pp++ = uint32_t(gp.max_sel);
    *pp++ = uint32_t(gp.max_sym);
    for (int i = 0; i < 256; i++) *pp++ = gp.stab[i];
    for (int j = 0; j < gp.nparam; j++) {
        Param& pm = gp.p[j];
        *pp++ = uint32_t(pm.qshift);
        *pp++ = uint32_t(pm.qmask);
        *pp++ = uint32_t(pm.qloc);
        *pp++ = uint32_t(pm.sloc);
        *pp++ = uint32_t(pm.context);
        *pp++ = uint32_t(pm.do_sel);
        *pp++ = uint32_t(pm.do_dedup);
        *pp++ = uint32_t(pm.fixed_len);
        *pp++ = uint32_t(pm.do_qa);
        *pp++ = uint32_t(pm.do_r2);
        *pp++ = uint32_t(pm.bbits);
        *pp++ = uint32_t(pm.bloc);
        *pp++ = uint32_t(pm.boff);
        for (int i = 0; i < 256; i++) *pp++ = pm.qmap[i];
        for (int i = 0; i < 256; i++) *pp++ = pm.qtab[i];
        for (int i = 0; i < 1024; i++) *pp++ = pm.ptab[i];
        for (int i = 0; i < 256; i++) *pp++ = pm.dtab[i];
    }

    for (int r = 0; r < s->num_records; r++) {
        if (sel_out) sel_out[r] = s->flags[r] >> 16;
        s->flags[r] &= 0xffff;
    }
    return int64_t(pp - par_out);
}

int64_t fqz_decompress_impl(const uint8_t* in, size_t in_size, uint8_t* out,
                            size_t out_cap, const uint8_t* seq) {
    uint32_t len = 0;
    int in_idx = get_uv(in, in + in_size, &len);
    if (!in_idx) return -1;
    if (out_cap < len) return -1;

    GParams gp;
    int used = read_parameters(&gp, in + in_idx, in_size - in_idx);
    if (used < 0) return -1;
    in_idx += used;

    for (int i = 0; i < gp.nparam; i++) {
        Param& pm = gp.p[i];
        for (int j = 0; j < 1024; j++) pm.ptab[j] <<= pm.ploc;
        for (int j = 0; j < 256; j++) pm.dtab[j] <<= pm.dloc;
    }

    Models model;
    if (!model.init(gp)) return -1;

    RangeCoder rc;
    rc.start_decode(in + in_idx, in + in_size);

    QState st;
    st.first_len = 1;
    unsigned last = 0;
    unsigned last_len_v = 0;
    int x = 0;
    Param* pm = &gp.p[x];
    int64_t rec = 0;
    const uint8_t* seqp = nullptr;
    const uint8_t* seq_end = nullptr;
    size_t seq_pos = 0;
    std::vector<uint8_t> rev_a;
    std::vector<uint32_t> len_a;

    for (size_t i = 0; i < len; i++) {
        if (st.p == 0) {
            if (pm->do_sel || (gp.gflags & kGMultiParam)) {
                st.s = model.sel.decode(rc);
            } else {
                st.s = 0;
            }
            x = (gp.gflags & kGHaveSTab)
                    ? int(gp.stab[st.s < 255 ? st.s : 255])
                    : int(st.s);
            if (x >= gp.nparam) return -1;
            pm = &gp.p[x];

            unsigned rlen = last_len_v;
            if (!pm->fixed_len || st.first_len) {
                rlen = model.len[0].decode(rc);
                rlen |= unsigned(model.len[1].decode(rc)) << 8;
                rlen |= unsigned(model.len[2].decode(rc)) << 16;
                rlen |= unsigned(model.len[3].decode(rc)) << 24;
                st.first_len = 0;
                last_len_v = rlen;
            }
            if (rlen > len - i || rlen == 0) return -1;

            if (gp.gflags & kGDoRev) {
                rev_a.push_back(uint8_t(model.revcomp.decode(rc)));
                len_a.push_back(rlen);
            }

            if (pm->do_dedup) {
                if (model.dup.decode(rc)) {
                    if (rlen > i) return -1;
                    memcpy(out + i, out + i - rlen, rlen);
                    i += rlen - 1;
                    st.p = 0;
                    if (seq) seq_pos += rlen;
                    rec++;
                    continue;
                }
            }

            st.p = rlen;
            st.delta = 0;
            st.prevq = 0;
            st.qctx = 0;

            if (seq) {
                seqp = seq + seq_pos + pm->boff;
                seq_end = seq + seq_pos + rlen;
                st.seq = 0;
                for (unsigned b = 0; b < pm->boff; b++)
                    st.seq = (st.seq << 2) | unsigned(kBaseLut[seq[seq_pos + b]]);
                seq_pos += rlen;
            } else {
                seqp = seq_end = nullptr;
                st.seq = 0;
            }

            rec++;
            last = pm->context;
        }

        uint8_t Q = uint8_t(model.qual[last].decode(rc));
        uint8_t q = uint8_t(pm->qmap[Q]);
        out[i] = q;
        int base = (seqp && seqp < seq_end) ? kBaseLut[*seqp++] : 0;
        last = update_ctx(*pm, st, Q, base);
        __builtin_prefetch(&model.qual[last]);
    }

    if (gp.gflags & kGDoRev) {
        size_t i = 0;
        for (size_t r = 0; r < rev_a.size() && i < len; i += len_a[r++]) {
            if (!rev_a[r]) continue;
            for (size_t I = 0, J = len_a[r] - 1; I < J; I++, J--) {
                uint8_t c = out[i + I];
                out[i + I] = out[i + J];
                out[i + J] = c;
            }
        }
    }
    return len;
}

}  // namespace fqz5

extern "C" {
// flags array is modified in-place during stats gathering and restored
// (selector bits cleared) before return, matching the reference.
int64_t fqz5_fqz_compress(const uint8_t* in, uint64_t in_size,
                          const uint32_t* lens, uint32_t* flags,
                          const uint8_t* seq, int num_records, int strat,
                          uint8_t* out, uint64_t out_cap) {
    fqz5::Slice s;
    s.num_records = num_records;
    s.len = lens;
    s.flags = flags;
    s.seq = seq;
    return fqz5::fqz_compress_impl(in, in_size, &s, strat, out, out_cap);
}

int64_t fqz5_fqz_decompress(const uint8_t* in, uint64_t in_size, uint8_t* out,
                            uint64_t out_cap, const uint8_t* seq) {
    return fqz5::fqz_decompress_impl(in, in_size, out, out_cap, seq);
}

int64_t fqz5_fqz_dump_ctx(const uint8_t* in, uint64_t in_size,
                          const uint32_t* lens, uint32_t* flags,
                          int num_records, int strat, uint32_t* ctx_out,
                          uint8_t* qm_out, uint32_t* par_out,
                          uint64_t par_cap, uint32_t* sel_out,
                          const uint8_t* seq) {
    fqz5::Slice s;
    s.num_records = num_records;
    s.len = lens;
    s.flags = flags;
    s.seq = seq;
    return fqz5::fqz_dump_ctx_impl(in, in_size, &s, strat, ctx_out,
                                   qm_out, par_out, par_cap, sel_out);
}

int64_t fqz5_fqz_prepare(const uint8_t* in, uint64_t in_size,
                         const uint32_t* lens, uint32_t* flags,
                         int num_records, int strat, const uint8_t* seq,
                         uint8_t* hdr_out, uint64_t hdr_cap,
                         uint32_t* hdr_len_out, uint32_t* par_out,
                         uint64_t par_cap, uint32_t* sel_out) {
    fqz5::Slice s;
    s.num_records = num_records;
    s.len = lens;
    s.flags = flags;
    s.seq = seq;
    return fqz5::fqz_prepare_impl(in, in_size, &s, strat, hdr_out,
                                  hdr_cap, hdr_len_out, par_out,
                                  par_cap, sel_out);
}
}
