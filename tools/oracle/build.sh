#!/bin/sh
# Build the reference fqzcomp5 binary + codec_oracle parity harness into
# /tmp/oracle (dev-only; tests skip gracefully when absent).
#
# The fqzcomp5 BINARY is built exactly as the reference Makefile does
# (HAVE_LIBBZ2 never defined -> the arith X_EXT path errors), with the
# unresolved -lbz2 link replaced by a stub since this image has no
# libbz2.so dev symlink.  The codec_oracle HARNESS additionally gets an
# arith_dynamic.o compiled with -DHAVE_LIBBZ2 against the runtime
# libbz2.so.1.0, so codec-level X_EXT parity (upstream htscodecs'
# full-featured build) is testable too.
set -e
REF=${REF:-/root/reference}
DST=/tmp/oracle
HERE=$(dirname "$0")

mkdir -p "$DST"
cp -r "$REF"/* "$DST"/
cat > "$DST/bz2_stub.c" <<'EOF'
int BZ2_bzBuffToBuffCompress(char*d,unsigned*dl,char*s,unsigned sl,int a,int b,int c){(void)d;(void)dl;(void)s;(void)sl;(void)a;(void)b;(void)c;return -1;}
int BZ2_bzBuffToBuffDecompress(char*d,unsigned*dl,char*s,unsigned sl,int a,int b){(void)d;(void)dl;(void)s;(void)sl;(void)a;(void)b;return -1;}
EOF
gcc -O2 -c "$DST/bz2_stub.c" -o "$DST/bz2_stub.o"
sed -i 's/-lbz2/bz2_stub.o/' "$DST/Makefile"
make -C "$DST" -j"$(nproc)" >/dev/null

# Real-bz2 arith_dynamic for the codec harness (minimal bzlib.h: the two
# BZ2_bzBuffToBuff* entry points have a stable ABI; no headers on image).
BZ2_RUNTIME=$(ldconfig -p | awk '/libbz2\.so/{print $NF; exit}')
mkdir -p "$DST/harness"
if [ -n "$BZ2_RUNTIME" ]; then
    mkdir -p "$DST/bz2inc"
    cat > "$DST/bz2inc/bzlib.h" <<'EOF'
#define BZ_OK 0
int BZ2_bzBuffToBuffCompress(char* dest, unsigned* destLen, char* source,
                             unsigned sourceLen, int blockSize100k,
                             int verbosity, int workFactor);
int BZ2_bzBuffToBuffDecompress(char* dest, unsigned* destLen, char* source,
                               unsigned sourceLen, int small, int verbosity);
EOF
    gcc -O2 -DHAVE_LIBBZ2 -I"$DST/bz2inc" -I"$DST" \
        -c "$DST/htscodecs/arith_dynamic.c" \
        -o "$DST/harness/arith_dynamic_bz2.o"
    HARNESS_ARITH="$DST/harness/arith_dynamic_bz2.o $BZ2_RUNTIME"
    HARNESS_OBJS=$(ls "$DST"/htscodecs/*.o | grep -v arith_dynamic.o)
else
    HARNESS_ARITH="$DST/bz2_stub.o"
    HARNESS_OBJS=$(ls "$DST"/htscodecs/*.o)
fi

# shellcheck disable=SC2086
gcc -O2 -I"$DST" -o "$DST/harness/codec_oracle" \
    "$HERE/codec_oracle.c" \
    $HARNESS_OBJS $HARNESS_ARITH "$DST/lzp16e.o" -lm -lz -pthread
# shellcheck disable=SC2086
gcc -O2 -I"$DST" -o "$DST/harness/kbench" \
    "$HERE/kbench.c" \
    $HARNESS_OBJS $HARNESS_ARITH -lm -lz -pthread
# same-process paired bench (reference objects + our libfqz5): the only
# drift-immune kernel comparison on clock-throttled boxes
REPO=$(dirname "$(dirname "$HERE")")
if [ -f "$REPO/native/libfqz5.so" ]; then
    # shellcheck disable=SC2086
    gcc -O2 -I"$DST" -o "$DST/harness/duel" \
        "$HERE/duel.c" \
        $HARNESS_OBJS $HARNESS_ARITH \
        -L"$REPO/native" -lfqz5 -Wl,-rpath,"$REPO/native" -lm -lz -pthread
fi
echo "oracle ready: $DST/fqzcomp5  $DST/harness/codec_oracle  $DST/harness/kbench  $DST/harness/duel"
