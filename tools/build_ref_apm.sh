#!/bin/bash
# Builds the unmodified reference AudioProcessing into /tmp/refapm/libapm.so
# for use as a development-time conformance oracle (tools/ref_apm.py).
# Nothing from the reference tree enters this repository; the library is a
# build artifact under /tmp.
set -e
SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
R=/root/reference/webrtc
TF=/opt/venv/lib/python3.12/site-packages/tensorflow/include
TFD=/opt/venv/lib/python3.12/site-packages/tensorflow
OUT=/tmp/refapm
mkdir -p $OUT/obj
cd $OUT

if [ ! -f srcs.txt ]; then
  find $R/modules/audio_processing -name "*.cc" \
    | grep -vE "avx2|neon|mips|_unittest|test|mock|rust_audio" > srcs.txt
  find $R/common_audio -name "*.cc" -o -name "*.c" \
    | grep -vE "avx2|neon|mips|sse|_unittest|test|mock" >> srcs.txt
  find $R/rtc_base $R/system_wrappers $R/api -name "*.cc" \
    | grep -vE "_unittest|test|mock|gunit" >> srcs.txt
  find $R/experiments -name "*.cc" 2>/dev/null >> srcs.txt || true
  find $R/common_audio/third_party $R/modules/third_party $R/third_party \
    -name "*.c" -o -name "*.cc" 2>/dev/null \
    | grep -vE "avx2|neon|mips|sse2|_unittest|test" >> srcs.txt
  find $R/modules/audio_coding -name "*.c" -o -name "*.cc" \
    | grep -v test >> srcs.txt
  sort -u srcs.txt \
    | grep -vE "audio_processing_builder_impl|warn_current_thread_is_deadlocked|compute_interpolated_gain_curve|system_wrappers/source/denormal_disabler" \
    > s && mv s srcs.txt
fi

FLAGS="-O2 -fPIC -DNDEBUG -DWEBRTC_POSIX -DWEBRTC_APM_DEBUG_DUMP=1 -DWEBRTC_LINUX -D_GNU_SOURCE -I/root/reference -I$R -I$TF -w -pthread"
while read src; do
  obj="obj/$(echo $src | md5sum | cut -d' ' -f1).o"
  [ -f "$obj" ] && continue
  case "$src" in
    *.c) gcc $FLAGS -std=c11 -c "$src" -o "$obj" ;;
    *)   g++ $FLAGS -std=c++20 -c "$src" -o "$obj" ;;
  esac
done < srcs.txt
# SIMD TUs the runtime dispatcher needs.
for f in $R/common_audio/resampler/sinc_resampler_sse.cc \
         $R/common_audio/fir_filter_sse.cc \
         $R/common_audio/third_party/ooura/fft_size_128/ooura_fft_sse2.cc; do
  obj="obj/$(echo $f | md5sum | cut -d' ' -f1).o"
  [ -f "$obj" ] || g++ $FLAGS -msse2 -std=c++20 -c "$f" -o "$obj"
done
for f in $(find $R -name "*avx2*.cc" | grep -v test); do
  obj="obj/$(echo $f | md5sum | cut -d' ' -f1).o"
  [ -f "$obj" ] || g++ $FLAGS -mavx2 -mfma -std=c++20 -c "$f" -o "$obj"
done
g++ $FLAGS -std=c++20 -c "$SCRIPT_DIR/apm_c.cc" -o obj/apm_c.o
g++ -shared -o libapm.so obj/*.o -pthread -L$TFD -l:libtensorflow_framework.so.2 -Wl,-rpath,$TFD
echo "built $OUT/libapm.so"
