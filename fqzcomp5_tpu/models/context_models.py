"""Golden Python implementations of the adaptive coding models.

Semantics match native/rc.h (and thus the reference coders) exactly:
- RangeCoder: 32-bit carry-counting range coder (c_range_coder.h)
- AdaptiveModel: u16 freqs, approx sort-by-frequency (c_simple_model.h)
- TinyModel: u8 freqs, direct indexed, update-without-encode
  (c_small_model.h)

These are intentionally simple and slow; they exist to pin down the
coded-state semantics independently of the C++ (tests cross-check the
two) and to prototype batched device formulations.
"""

from __future__ import annotations

TOP = 1 << 24
THRESH = 255 * TOP
M32 = 0xFFFFFFFF


class RangeCoder:
    def __init__(self):
        self.low = 0
        self.range = M32
        self.code = 0
        self.ff_num = 0
        self.cache = 0
        self.carry = 0
        self.out = bytearray()
        self.inp = b""
        self.pos = 0

    # -- encode --
    def start_encode(self):
        self.low = 0
        self.range = M32
        self.ff_num = self.carry = self.cache = 0
        self.out = bytearray()

    def _shift_low(self):
        if self.low < THRESH or self.carry:
            self.out.append((self.cache + self.carry) & 0xFF)
            while self.ff_num:
                self.out.append((self.carry - 1) & 0xFF)
                self.ff_num -= 1
            self.cache = self.low >> 24
            self.carry = 0
        else:
            self.ff_num += 1
        self.low = (self.low << 8) & M32

    def encode(self, cum: int, freq: int, tot: int):
        old = self.low
        self.range //= tot
        self.low = (self.low + cum * self.range) & M32
        self.range = (self.range * freq) & M32
        if self.low < old:
            self.carry += 1
        while self.range < TOP:
            self.range = (self.range << 8) & M32
            self._shift_low()

    def finish_encode(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)

    # -- decode --
    def start_decode(self, data: bytes):
        self.inp = data
        self.range = M32
        # five bytes shift into a 32-bit register; high bits fall off
        self.code = int.from_bytes(data[:5], "big") & M32
        self.pos = 5

    def get_freq(self, tot: int) -> int:
        if not tot or self.range < tot:
            return 0
        self.range //= tot
        return self.code // self.range

    def decode(self, cum: int, freq: int):
        self.code = (self.code - cum * self.range) & M32
        self.range = (self.range * freq) & M32
        while self.range < TOP:
            b = self.inp[self.pos] if self.pos < len(self.inp) else 0
            self.pos += 1
            self.code = ((self.code << 8) | b) & M32
            self.range = (self.range << 8) & M32


class AdaptiveModel:
    """u16-frequency model with approximate frequency sorting."""

    MAX_FREQ = (1 << 16) - 17

    def __init__(self, nsym: int, max_sym: int, step: int = 16):
        self.step = step
        self.freq = [1] * max_sym + [0] * (nsym - max_sym)
        self.sym = list(range(nsym))
        self.tot = max_sym

    def _bump(self, i: int) -> int:
        self.freq[i] += self.step
        self.tot += self.step
        if self.tot > self.MAX_FREQ:
            self.tot = 0
            for k in range(len(self.freq)):
                if not self.freq[k]:
                    break
                self.freq[k] -= self.freq[k] >> 1
                self.tot += self.freq[k]
        if i > 0 and self.freq[i] > self.freq[i - 1]:
            self.freq[i], self.freq[i - 1] = self.freq[i - 1], self.freq[i]
            s = self.sym[i]
            self.sym[i], self.sym[i - 1] = self.sym[i - 1], s
            return s
        return self.sym[i]

    def encode(self, rc: RangeCoder, s: int):
        acc = 0
        i = 0
        while self.sym[i] != s:
            acc += self.freq[i]
            i += 1
        rc.encode(acc, self.freq[i], self.tot)
        self._bump(i)

    def decode(self, rc: RangeCoder) -> int:
        f = rc.get_freq(self.tot)
        acc = 0
        i = 0
        while acc + self.freq[i] <= f:
            acc += self.freq[i]
            i += 1
        rc.decode(acc, self.freq[i])
        return self._bump(i)


class TinyModel:
    """u8-frequency direct-indexed model (STEP 1, MAX_FREQ 255)."""

    def __init__(self, nsym: int):
        self.freq = [1] * nsym

    def encode(self, rc: RangeCoder, s: int):
        tot = sum(self.freq)
        acc = sum(self.freq[:s])
        rc.encode(acc, self.freq[s], tot)
        self.freq[s] += 1
        if tot >= 255:
            self.freq = [f - (f >> 1) for f in self.freq]

    def update(self, s: int):
        tot = sum(self.freq)
        self.freq[s] += 1
        if tot >= 255:
            self.freq = [f - (f >> 1) for f in self.freq]

    def decode(self, rc: RangeCoder) -> int:
        tot = sum(self.freq)
        f = rc.get_freq(tot)
        acc = 0
        s = 0
        while acc + self.freq[s] <= f:
            acc += self.freq[s]
            s += 1
        rc.decode(acc, self.freq[s])
        self.freq[s] += 1
        if tot >= 255:
            self.freq = [x - (x >> 1) for x in self.freq]
        return s


# FQZ quality-model strategy presets (fqzcomp_qual.c:204-218); the
# native engine consumes its own copy — this one is the documented,
# introspectable form.
FQZ_STRATEGIES = [
    # qbits qshift pbits pshift dbits dshift qloc sloc ploc dloc r2 qa bb bl bo
    dict(name="basic", qbits=10, qshift=5, pbits=4, pshift=-1, dbits=2,
         dshift=1, qloc=0, sloc=14, ploc=10, dloc=14, do_r2=0, do_qa=-1,
         bbits=0, bloc=0, boff=0),
    dict(name="hiseq", qbits=8, qshift=5, pbits=7, pshift=0, dbits=0,
         dshift=0, qloc=0, sloc=14, ploc=8, dloc=14, do_r2=1, do_qa=-1,
         bbits=0, bloc=0, boff=0),
    dict(name="iontorrent", qbits=12, qshift=6, pbits=0, pshift=0, dbits=0,
         dshift=0, qloc=0, sloc=12, ploc=0, dloc=0, do_r2=0, do_qa=0,
         bbits=0, bloc=0, boff=0),
    dict(name="pacbio-ont", qbits=6, qshift=6, pbits=0, pshift=0, dbits=0,
         dshift=0, qloc=0, sloc=0, ploc=0, dloc=0, do_r2=0, do_qa=0,
         bbits=10, bloc=6, boff=3),
    dict(name="ultima", qbits=8, qshift=5, pbits=0, pshift=0, dbits=0,
         dshift=0, qloc=0, sloc=0, ploc=0, dloc=0, do_r2=0, do_qa=0,
         bbits=8, bloc=8, boff=2),
]
