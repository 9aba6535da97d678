#!/bin/sh
# Build the reference fqzcomp5 binary + codec_oracle parity harness into
# /tmp/oracle (dev-only; tests skip gracefully when absent).
#
# The image has no libbz2, so the (unreached) arith X_EXT path is stubbed.
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

mkdir -p "$DST/harness"
gcc -O2 -I"$DST" -o "$DST/harness/codec_oracle" \
    "$HERE/codec_oracle.c" \
    "$DST"/htscodecs/*.o "$DST/lzp16e.o" "$DST/bz2_stub.o" -lm -lz -pthread
gcc -O2 -I"$DST" -o "$DST/harness/kbench" \
    "$HERE/kbench.c" \
    "$DST"/htscodecs/*.o "$DST/bz2_stub.o" -lm -lz -pthread
echo "oracle ready: $DST/fqzcomp5  $DST/harness/codec_oracle  $DST/harness/kbench"
