// Range coder and adaptive frequency models for fqzcomp5-tpu.
//
// Bit-exact with the reference coders (htscodecs/c_range_coder.h,
// c_simple_model.h, c_small_model.h): a 32-bit carry-counting range
// coder (Subbotin/Shelwien lineage) plus two adaptive model shapes --
// a u16-frequency model with approximate sort-by-frequency, and a tiny
// u8-frequency direct-indexed model.  The byte streams these produce
// are part of the FQZ5 file format, so every detail (carry handling,
// renormalisation threshold, bubble reordering, normalisation timing)
// is load-bearing.
#ifndef FQZ5_RC_H
#define FQZ5_RC_H

#include <cstdint>
#include <cstring>

namespace fqz5 {

class RangeCoder {
  public:
    static constexpr uint32_t kTop = 1u << 24;
    static constexpr uint32_t kThresh = 255u * kTop;

    // ---- encoding ----
    void start_encode(uint8_t* out) {
        out_start_ = out_ = out;
        out_end_ = nullptr;
        range_ = 0xFFFFFFFFu;
        low_ = 0;
        ff_num_ = 0;
        carry_ = 0;
        cache_ = 0;
        err_ = false;
    }

    // Optional encode-side overflow guard (reference
    // c_range_coder.h:RC_SetOutputEnd / RC_ShiftLowCheck): with an end
    // set, shift_low stops writing and flags error() instead of
    // running past the buffer.  Adaptive coders have no hard 1.05x
    // bound — adversarial input can expand ~2x — so every encoder
    // whose cap is heuristic must set this.
    void set_output_end(uint8_t* end) { out_end_ = end; }

    void encode(uint32_t cum, uint32_t freq, uint32_t tot) {
        uint32_t old_low = low_;
        range_ /= tot;
        low_ += cum * range_;
        range_ *= freq;
        carry_ += low_ < old_low;
        while (range_ < kTop) {
            range_ <<= 8;
            shift_low();
        }
    }

    void finish_encode() {
        for (int i = 0; i < 5; i++) shift_low();
    }

    size_t out_size() const { return size_t(out_ - out_start_); }

    // ---- decoding ----
    void start_decode(const uint8_t* in, const uint8_t* in_end) {
        in_ = in;
        in_end_ = in_end;
        range_ = 0xFFFFFFFFu;
        code_ = 0;
        err_ = false;
        if (in_ + 5 > in_end_) {
            in_ = in_end_;
            err_ = true;
            return;
        }
        for (int i = 0; i < 5; i++) code_ = (code_ << 8) | *in_++;
    }

    uint32_t get_freq(uint32_t tot) {
        if (!tot || range_ < tot) return 0;
        range_ /= tot;
        return code_ / range_;
    }

    void decode(uint32_t cum, uint32_t freq, uint32_t /*tot*/) {
        code_ -= cum * range_;
        range_ *= freq;
        while (range_ < kTop) {
            if (in_ >= in_end_) {
                err_ = true;
                return;
            }
            code_ = (code_ << 8) | *in_++;
            range_ <<= 8;
        }
    }

    size_t in_consumed(const uint8_t* in_begin) const {
        return size_t(in_ - in_begin);
    }
    bool error() const { return err_; }

  private:
    void shift_low() {
        if (low_ < kThresh || carry_) {
            if (out_end_ && ff_num_ >= size_t(out_end_ - out_)) {
                // pending 1+ff_num_ bytes would cross the end: stop
                // writing (caller checks error()); mirrors
                // RC_ShiftLowCheck
                err_ = true;
                low_ <<= 8;
                return;
            }
            *out_++ = uint8_t(cache_ + carry_);
            while (ff_num_) {
                *out_++ = uint8_t(carry_ - 1);
                ff_num_--;
            }
            cache_ = low_ >> 24;
            carry_ = 0;
        } else {
            ff_num_++;
        }
        low_ <<= 8;
    }

    uint32_t low_ = 0, code_ = 0, range_ = 0;
    uint32_t ff_num_ = 0, cache_ = 0, carry_ = 0;
    uint8_t* out_ = nullptr;
    uint8_t* out_start_ = nullptr;
    uint8_t* out_end_ = nullptr;
    const uint8_t* in_ = nullptr;
    const uint8_t* in_end_ = nullptr;
    bool err_ = false;
};

// Adaptive model with u16 frequencies kept approximately sorted.
// Template params: NSYM = alphabet capacity, STEP = adaption increment
// (reference uses STEP 16 generally, 8 for the seq literal models).
template <int NSYM, int STEP = 16>
class AdaptiveModel {
  public:
    static constexpr uint32_t kMaxFreq = (1u << 16) - 17;
    struct SymFreq { uint16_t sym, freq; };

    void init(int max_sym) {
        tot_ = max_sym;
        // a_[0] is a sentinel (freq 0xFFFF): the bubble step's
        // p[-1] compare never swaps into it, so the hot paths carry
        // no i>0 guard.  a_[NSYM+2] is a terminal (freq 0xFFFF) that
        // stops the decode scan on corrupt input, so the scan body is
        // a single compare per step (reference layout,
        // c_simple_model.h sentinel/terminal).
        a_[0].sym = 0;
        a_[0].freq = 0xFFFF;
        SymFreq* F = a_ + 1;
        for (int i = 0; i < max_sym; i++) {
            F[i].sym = uint16_t(i);
            F[i].freq = 1;
        }
        for (int i = max_sym; i <= NSYM; i++) {
            F[i].sym = uint16_t(i);
            F[i].freq = 0;  // F[NSYM].freq==0 terminates normalize
        }
        a_[NSYM + 2].sym = 0;
        a_[NSYM + 2].freq = 0xFFFF;
    }

    void encode(RangeCoder& rc, uint16_t s) {
        SymFreq* p = a_ + 1;
        uint32_t acc = 0;
        while (p->sym != s) acc += p++->freq;
        rc.encode(acc, p->freq, tot_);
        bump(p);
    }

    // encode() minus the coder: dump the triple (test oracle for the
    // vectorised model-evolution kernel)
    void encode_dump(uint16_t s, uint32_t* cum, uint32_t* freq,
                     uint32_t* tot) {
        SymFreq* p = a_ + 1;
        uint32_t acc = 0;
        while (p->sym != s) acc += p++->freq;
        *cum = acc;
        *freq = p->freq;
        *tot = tot_;
        bump(p);
    }

    uint16_t decode(RangeCoder& rc) {
        uint32_t f = rc.get_freq(tot_);
        if (f > kMaxFreq) return 0;
        SymFreq* p = a_ + 1;
        uint32_t acc = 0;
        while ((acc += p->freq) <= f) p++;  // terminal bounds the scan
        if (p > a_ + 1 + NSYM) return 0;    // corrupt input
        acc -= p->freq;
        rc.decode(acc, p->freq, tot_);
        return bump(p);
    }

  private:
    // Adapt and keep the array approximately frequency-sorted by one
    // bubble step; the reordering is observable coded state.
    uint16_t bump(SymFreq* p) {
        p->freq += STEP;
        tot_ += STEP;
        if (tot_ > kMaxFreq) normalize();
        // p[-1] may be the sentinel; its 0xFFFF freq blocks the swap
        // (a real freq never reaches it: normalize runs first).
        if (p[0].freq > p[-1].freq) {
            SymFreq t = p[0];
            p[0] = p[-1];
            p[-1] = t;
            return t.sym;
        }
        return p->sym;
    }

    void normalize() {
        tot_ = 0;
        for (SymFreq* p = a_ + 1; p->freq; p++) {
            p->freq -= p->freq >> 1;
            tot_ += p->freq;
        }
    }

    // interleaved (sym, freq) pairs: the find scan touches ONE cache
    // stream per model — with 65536 x ~400B fqz models the lookup is
    // cache-miss bound, and the split-array layout paid two
    uint32_t tot_ = 0;
    // [0]=sentinel, [1..NSYM+1]=F (+1: zero terminator for
    // normalize), [NSYM+2]=terminal
    SymFreq a_[NSYM + 3] = {};
};

// Tiny direct-indexed model with u8 frequencies (reference
// c_small_model.h).  STEP is 1; MAX_FREQ 256-STEP.
template <int NSYM>
class TinyModel {
  public:
    static constexpr int kStep = 1;
    static constexpr int kMaxFreq = 256 - kStep;

    void init() {
        for (int i = 0; i < NSYM; i++) freq_[i] = 1;
    }

    void encode(RangeCoder& rc, int s) {
        uint32_t tot = 0, acc = 0;
        for (int i = 0; i < NSYM; i++) tot += freq_[i];
        for (int i = 0; i < s; i++) acc += freq_[i];
        rc.encode(acc, freq_[s], tot);
        freq_[s] += kStep;
        if (tot >= kMaxFreq) normalize();
    }

    // Adapt without coding (the both-strands sequence trick).
    void update(int s) {
        uint32_t tot = 0;
        for (int i = 0; i < NSYM; i++) tot += freq_[i];
        freq_[s] += kStep;
        if (tot >= kMaxFreq) normalize();
    }

    // encode() minus the coder: dump the triple (test oracle for the
    // vectorised tiny-model evolution kernel)
    void encode_dump(int s, uint32_t* cum, uint32_t* freq,
                     uint32_t* tot) {
        uint32_t t = 0, acc = 0;
        for (int i = 0; i < NSYM; i++) t += freq_[i];
        for (int i = 0; i < s; i++) acc += freq_[i];
        *cum = acc;
        *freq = freq_[s];
        *tot = t;
        freq_[s] += kStep;
        if (t >= kMaxFreq) normalize();
    }

    int decode(RangeCoder& rc) {
        uint32_t tot = 0;
        for (int i = 0; i < NSYM; i++) tot += freq_[i];
        uint32_t f = rc.get_freq(tot);
        // corrupt input can hand back f >= tot; clamping keeps the
        // scan (and the freq_[s] adapt write) inside the table — the
        // callers' progress guards then terminate the stream.  Valid
        // streams never hit this (sum(freq_) == tot > f always).
        if (f >= tot) f = tot - 1;
        int s = 0;
        uint32_t acc = 0;
        while ((acc += freq_[s]) <= f) s++;
        acc -= freq_[s];
        rc.decode(acc, freq_[s], tot);
        freq_[s] += kStep;
        if (tot >= kMaxFreq) normalize();
        return s;
    }

  private:
    void normalize() {
        for (int i = 0; i < NSYM; i++) freq_[i] -= freq_[i] >> 1;
    }
    uint8_t freq_[NSYM];
};

}  // namespace fqz5

#endif  // FQZ5_RC_H
