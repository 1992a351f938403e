#!/bin/bash
# Build the C parity-golden generator and (re)generate tests/goldens/.
#
# The generator compiles the REFERENCE's own GUI-free kernels:
#   - /root/reference/src/algos/statistics.c   (whole TU, shim headers)
#   - /root/reference/src/algos/quantize.c     (whole TU)
#   - /root/reference/src/algos/demosaicing.c  (whole TU)
#   - verbatim line-range extractions (into the untracked gen/ dir) of
#     core/utils.c round/quicksort functions and stacking.c's clipping
#     helpers + per-pixel rejection switch.
# Only the emitted golden binaries are committed; no reference source is.
set -euo pipefail
cd "$(dirname "$0")"

REF=${REF:-/root/reference/src}
OUT=${OUT:-../tests/goldens}
mkdir -p gen build "$OUT"
# stale objects from older script revisions must not leak into the
# gen_goldens link (build/*.o glob below)
rm -f build/*.o

# --- verbatim extractions (line ranges are stable: the reference is read-only)
sed -n '60,91p'    "$REF/core/utils.c"        > gen/utils_round.inc
sed -n '478,533p'  "$REF/core/utils.c"        > gen/utils_qsort.inc
sed -n '1130,1187p' "$REF/stacking/stacking.c" > gen/stack_clippers.inc
sed -n '1656,1793p' "$REF/stacking/stacking.c" > gen/stack_reject.inc
# gui/histogram.c GUI-free math: shadowsClipping/targetBackground constants,
# apply_mtf_to_fits, MTF, findMidtonesBalance
sed -n '33,34p'    "$REF/gui/histogram.c"      > gen/histo_mtf.inc
sed -n '537,564p'  "$REF/gui/histogram.c"     >> gen/histo_mtf.inc
sed -n '595,608p'  "$REF/gui/histogram.c"     >> gen/histo_mtf.inc
sed -n '684,740p'  "$REF/gui/histogram.c"     >> gen/histo_mtf.inc
# the real histogram builders statistics()/entropy() call (previously
# re-stated in support.c; verbatim is a stronger anchor)
sed -n '111,150p'  "$REF/gui/histogram.c"      > gen/histo_build.inc
# the real normalized-value helper + its min/max scan (previously a
# support.c re-statement)
sed -n '220,251p'  "$REF/io/single_image.c"     > gen/minmax.inc
sed -n '454,459p'  "$REF/core/utils.c"         >> gen/minmax.inc
# photometry.c minus its includes and trailing GTK callback: hampel family,
# robustmean, phot_alloc, magnitude/error model, getPhotometryData
sed -n '31,323p'   "$REF/algos/photometry.c"   > gen/photometry.inc
# colors.c GUI-free math: the 8 colorspace conversions, the
# enhance_saturation and scnr per-pixel workers (GTK idle/log calls are
# no-op'd by shim macros), background_neutralize
sed -n '45,284p'   "$REF/algos/colors.c"       > gen/colors.inc
sed -n '399,470p'  "$REF/algos/colors.c"      >> gen/colors.inc
sed -n '488,548p'  "$REF/algos/colors.c"      >> gen/colors.inc
sed -n '623,656p'  "$REF/algos/colors.c"      >> gen/colors.inc
# cosmetic_correction.c core: median5x5/average3x3 fixers,
# count/find_deviant_pixels, cosmeticCorrOnePoint/OneLine, cosmeticCorrection
sed -n '34,294p'   "$REF/algos/cosmetic_correction.c" > gen/cosmetic.inc
# core/siril.c image ops (GUI-free blocks): MAX_ITER/EPSILON constants,
# soper, imoper, addmax, fdiv, entropy, loglut, contrast, fill, off,
# get_wavelet_layers, fmul_layer, BandingEngine, backgroundnoise
sed -n '60,61p'     "$REF/core/siril.c"  > gen/imops.inc
sed -n '65,103p'    "$REF/core/siril.c" >> gen/imops.inc
sed -n '112,145p'   "$REF/core/siril.c" >> gen/imops.inc
sed -n '150,187p'   "$REF/core/siril.c" >> gen/imops.inc
sed -n '229,249p'   "$REF/core/siril.c" >> gen/imops.inc
sed -n '252,275p'   "$REF/core/siril.c" >> gen/imops.inc
sed -n '570,594p'   "$REF/core/siril.c" >> gen/imops.inc
sed -n '596,616p'   "$REF/core/siril.c" >> gen/imops.inc
sed -n '618,634p'   "$REF/core/siril.c" >> gen/imops.inc
sed -n '665,694p'   "$REF/core/siril.c" >> gen/imops.inc
# shift(): the reference declares `fits tmpfit;` on the stack and then
# reallocs tmpfit.data — uninitialized-pointer UB that happens to work
# in the GTK app's memory layout. Zero-initialize it (the only
# non-verbatim byte in any extraction; behavior = the reference intent).
sed -n '479,510p'   "$REF/core/siril.c" | sed 's/fits tmpfit;/fits tmpfit = { 0 };/' >> gen/imops.inc
sed -n '696,719p'   "$REF/core/siril.c" >> gen/imops.inc
sed -n '1173,1192p' "$REF/core/siril.c" >> gen/imops.inc
sed -n '1285,1336p' "$REF/core/siril.c" >> gen/imops.inc
sed -n '1448,1459p' "$REF/core/siril.c" >> gen/imops.inc
sed -n '1529,1615p' "$REF/core/siril.c" >> gen/imops.inc
sed -n '1626,1715p' "$REF/core/siril.c" >> gen/imops.inc
# gradient.c background extraction: NPARAM constants + C() macro, poly_1..4,
# buildBoxesAutomatically, computeBackground, extractBackgroundAuto,
# clearSamples (the GTK bkgExtractBackground wrapper is re-stated in the
# harness with explicit parameters)
sed -n '34,186p'  "$REF/algos/gradient.c"  > gen/gradient.inc
sed -n '188,333p' "$REF/algos/gradient.c" >> gen/gradient.inc
sed -n '378,383p' "$REF/algos/gradient.c" >> gen/gradient.inc
# the FITS row flip ser.c's full-frame reads call (image_format_fits.c)
sed -n '1143,1161p' "$REF/io/image_format_fits.c" > gen/fits_flip.inc
# the 8/24/48-bit buffer->fits converters import_pnm_to_fits calls
sed -n '1065,1139p' "$REF/io/image_format_fits.c" > gen/rgbconv.inc
# sequence helpers the compiled seqfile.c links against
sed -n '99,109p'   "$REF/core/utils.c"    > gen/seq_helpers.inc
sed -n '814,827p'  "$REF/io/sequence.c"  >> gen/seq_helpers.inc
# star_finder.c: Compute_threshold, is_star, peaker, compare/sort_stars,
# FWHM_average (skip GTK get_structure and the GUI add/remove_star block)
sed -n '37,78p'   "$REF/algos/star_finder.c"  > gen/starfind.inc
sed -n '94,255p'  "$REF/algos/star_finder.c" >> gen/starfind.inc
sed -n '336,367p' "$REF/algos/star_finder.c" >> gen/starfind.inc
# register_shift_dft bookkeeping (driven with precomputed correlation
# surfaces — FFTW not needed): the registration_args struct,
# normalizeQualityData, the q_min/q_max/q_index tracking block, and the
# correlation-peak argmax + wraparound decode
sed -n '8,9p'     "$REF/registration/registration.h"  > gen/dftreg_args.inc
sed -n '12,32p'   "$REF/registration/registration.h" >> gen/dftreg_args.inc
sed -n '163,176p' "$REF/registration/registration.c"  > gen/dftreg_norm.inc
sed -n '317,324p' "$REF/registration/registration.c"  > gen/dftreg_qmax.inc
sed -n '337,354p' "$REF/registration/registration.c"  > gen/dftreg_peak.inc

# sanity: the extractions start/end where we think they do
grep -q '^int round_to_int' gen/utils_round.inc
grep -q '^void quicksort_d' gen/utils_qsort.inc
grep -q 'percentile_clipping' gen/stack_clippers.inc
grep -q 'remove_pixel' gen/stack_clippers.inc
head -1 gen/stack_reject.inc | grep -q 'int N = nb_frames'
tail -3 gen/stack_reject.inc | grep -q 'sum += data->stack\[frame\]'
head -1 gen/minmax.inc | grep -q '^int image_find_minmax'
grep -q '^WORD get_normalized_value' gen/minmax.inc
tail -1 gen/minmax.inc | grep -q '^}'
head -1 gen/histo_build.inc | grep -q 'computeHisto(fits'
grep -q 'computeHisto_Selection' gen/histo_build.inc
tail -1 gen/histo_build.inc | grep -q '^}'
head -1 gen/histo_mtf.inc | grep -q 'shadowsClipping'
grep -q '^double MTF' gen/histo_mtf.inc
grep -q '^double findMidtonesBalance' gen/histo_mtf.inc
tail -1 gen/histo_mtf.inc | grep -q '^}'
head -1 gen/photometry.inc | grep -q 'hampel_a'
grep -q 'robustmean' gen/photometry.inc
tail -1 gen/photometry.inc | grep -q '^}'
head -1 gen/colors.inc | grep -q '^void hsl_to_rgb'
grep -q '^gpointer enhance_saturation' gen/colors.inc
grep -q '^gpointer scnr' gen/colors.inc
grep -q '^static void background_neutralize' gen/colors.inc
tail -1 gen/colors.inc | grep -q '^}'
head -1 gen/cosmetic.inc | grep -q '^static WORD getMedian5x5'
grep -q '^int cosmeticCorrection' gen/cosmetic.inc
tail -1 gen/cosmetic.inc | grep -q '^}'
head -1 gen/gradient.inc | grep -q '^#define NPARAM_POLY4 15'
grep -q '^static int buildBoxesAutomatically' gen/gradient.inc
grep -q '^static gsl_matrix \*computeBackground' gen/gradient.inc
grep -q '^static int extractBackgroundAuto' gen/gradient.inc
tail -1 gen/gradient.inc | grep -q '^}'
head -1 gen/seq_helpers.inc | grep -q '^gboolean ends_with'
grep -q '^void initialize_sequence' gen/seq_helpers.inc
tail -1 gen/seq_helpers.inc | grep -q '^}'
head -1 gen/fits_flip.inc | grep -q '^void fits_flip_top_to_bottom'
tail -1 gen/fits_flip.inc | grep -q '^}'
head -1 gen/rgbconv.inc | grep -q '^void rgb24bit_to_fits48bit'
grep -q '^void rgb8bit_to_fits16bit' gen/rgbconv.inc
grep -q '^void rgb48bit_to_fits48bit' gen/rgbconv.inc
tail -1 gen/rgbconv.inc | grep -q '^}'
grep -q '^static WORD Compute_threshold' gen/starfind.inc
grep -q '^fitted_PSF \*\*peaker' gen/starfind.inc
grep -q '^void sort_stars' gen/starfind.inc
tail -1 gen/starfind.inc | grep -q '^}'
grep -q '^struct registration_args {' gen/dftreg_args.inc
tail -1 gen/dftreg_args.inc | grep -q '^};'
head -1 gen/dftreg_norm.inc | grep -q '^static void normalizeQualityData'
tail -1 gen/dftreg_norm.inc | grep -q '^}'
grep -q 'double qual = current_regdata' gen/dftreg_qmax.inc
grep -q 'int shift = 0;' gen/dftreg_peak.inc
tail -1 gen/dftreg_peak.inc | grep -q 'shifty = shifty;'
head -1 gen/imops.inc | grep -q '^#define MAX_ITER 15'
grep -q '^int threshlo' gen/imops.inc
grep -q '^int shift' gen/imops.inc
grep -q '^int soper' gen/imops.inc
grep -q '^int imoper' gen/imops.inc
grep -q '^double entropy' gen/imops.inc
grep -q '^int get_wavelet_layers' gen/imops.inc
grep -q '^int BandingEngine' gen/imops.inc
grep -q '^int backgroundnoise' gen/imops.inc
tail -1 gen/imops.inc | grep -q '^}'

# -fcommon: Def_Wavelet.h:70-78 defines a global VARIABLE (mallat_plan_des)
# in the header, one tentative definition per TU — 1993-era C that modern
# gcc's -fno-common default rejects at link time.
# -Werror=implicit-function-declaration: an implicitly-declared function
# returning double is read from the WRONG REGISTER (int EAX) — this bit
# us once with gsl_matrix_max feeding ASLR-dependent garbage into the
# PSF fit's initial amplitude; never again.
CFLAGS="-O2 -fno-fast-math -ffp-contract=off -fcommon -Werror=implicit-function-declaration -I shim -I $REF -I ."
gcc $CFLAGS -c "$REF/algos/statistics.c"  -o build/statistics.o
gcc $CFLAGS -c "$REF/algos/quantize.c"    -o build/quantize.o
gcc $CFLAGS -c "$REF/algos/demosaicing.c" -o build/demosaicing.o
gcc $CFLAGS -c "$REF/algos/quality.c"     -o build/quality.o
gcc $CFLAGS -c "$REF/algos/pave.c"        -o build/pave.o
gcc $CFLAGS -c "$REF/algos/transform.c"   -o build/transform.o
gcc $CFLAGS -c "$REF/algos/reconstr.c"    -o build/reconstr.o
gcc $CFLAGS -c "$REF/algos/io_wave.c"     -o build/io_wave.o
# HAVE_GSL_2: selects the reference's GSL>=2 covariance path (PSF.c:383)
gcc $CFLAGS -DHAVE_GSL_1=0 -DHAVE_GSL_2=1 -c "$REF/algos/PSF.c" -o build/PSF.o
# star matching (atpmatch): pure C except the final cvCalculH, which the
# harness stubs to capture the matched pairs (shim/opencv/opencv.h)
gcc $CFLAGS -DHAVE_OPENCV=1 -c "$REF/registration/matching/misc.c"     -o build/match_misc.o
gcc $CFLAGS -DHAVE_OPENCV=1 -c "$REF/registration/matching/atpmatch.c" -o build/atpmatch.o
gcc $CFLAGS -DHAVE_OPENCV=1 -c "$REF/registration/matching/match.c"    -o build/match.o
# SER container I/O (pure POSIX; needs the flip + debayer already built)
gcc $CFLAGS -c "$REF/io/ser.c" -o build/ser.o
# internal image formats (BMP/PNM/PIC readers, BMP/PPM/PGM writers) —
# pure libc TU, compiled whole
gcc $CFLAGS -c "$REF/io/image_formats_internal.c" -o build/formats.o
gcc $CFLAGS -c "$REF/io/seqfile.c" -o build/seqfile.o
gcc $CFLAGS -c minigsl.c  -o build/minigsl.o
gcc $CFLAGS -c support.c  -o build/support.o
gcc $CFLAGS -c harness.c  -o build/harness.o
# suite-23 objects belong to the separate libav-linked harness_mp4
# binary; a stale copy in build/ must not leak into this link
rm -f build/mp4_output*.o
gcc build/*.o -lm -o build/gen_goldens

./build/gen_goldens "$OUT"
ls -la "$OUT"

# --- suite 20: the bundled OpenCV-2 RANSAC findHomography, verbatim
# (fundam.cpp homography path + modelest.cpp RANSAC machinery + the
# CvLevMarq refine solver from calibration.cpp) against the cvcore shim
# (shim/opencv/cvcore.hpp: exact MWC RNG; symmetric Jacobi eigen/SVD)
FH=$REF/opencv/findHomography
sed -n '51,81p'   "$FH/_modelest.h"    > gen/modelest_decl.inc
sed -n '376,410p' "$FH/calib3d.hpp"    > gen/levmarq_decl.inc
sed -n '54,361p'  "$FH/modelest.cpp"   > gen/modelest_body.inc
sed -n '61,300p'  "$FH/calibration.cpp" > gen/levmarq_body.inc
sed -n '48,291p'  "$FH/fundam.cpp"     > gen/fundam_homography.inc
grep -q 'runRANSAC' gen/modelest_body.inc
grep -q 'cvFindHomography' gen/fundam_homography.inc
grep -q 'CvLevMarq::step' gen/levmarq_body.inc
g++ -O2 -std=c++14 -fno-fast-math -ffp-contract=off -I. \
    harness_homography.cpp -o build/harness_homography
./build/harness_homography "$OUT/c_homography.bin"

# --- suite 21: the bundled ECC aligner, whole TU verbatim, against the
# mini cv::Mat shim (shim/opencv2/core/core.hpp) — Evangelidis-Psarakis
# iteration incl. the saturating 16->8-bit convert and translation mode
g++ -O2 -std=c++14 -fno-fast-math -ffp-contract=off -I shim -I "$REF" \
    -DHAVE_OPENCV=1 harness_ecc.cpp "$REF/opencv/ecc/ecc.cpp" \
    -o build/harness_ecc
./build/harness_ecc "$OUT/c_ecc.bin"

# --- suite 22: the REAL distro OpenCV (the library the reference links
# for resize/warpPerspective/warpAffine — opencv.cpp:89,153,262) as the
# anchor for siriltpu's geometric samplers, all interpolation values
# 0-4. Skipped gracefully when OpenCV dev files are absent.
if pkg-config --exists opencv4 2>/dev/null; then
  g++ -O2 -std=c++14 $(pkg-config --cflags opencv4) harness_cvgeom.cpp \
      -o build/harness_cvgeom -lopencv_core -lopencv_imgproc
  ./build/harness_cvgeom "$OUT/c_cvgeom.bin"
else
  echo "suite 22 skipped: opencv4 dev files not found"
fi

# --- suite 23: the reference's OWN MP4/WEBM exporter (io/mp4_output.c)
# compiled whole-TU against the system libavformat/libavcodec. Two
# writes through oc->oformat are mechanically no-op'd (gen/ patch): the
# muxer struct is const in ffmpeg 5 and writing it segfaults; the
# behavioral delta (WEBM stays VP9 instead of the Opera-12 VP8 force)
# is documented in tests/test_mp4_goldens.py. Skipped without libav.
if [ -f /usr/include/x86_64-linux-gnu/libavformat/avformat.h ]; then
  sed -e 's|video_st->fmt->audio_codec = AV_CODEC_ID_NONE;|/* ffmpeg5: oformat is const, write removed by harness */;|' \
      -e 's|video_st->fmt->video_codec = AV_CODEC_ID_VP8;|/* ffmpeg5: const muxer, VP8 force removed - golden keeps VP9 */;|' \
      "$REF/io/mp4_output.c" > gen/mp4_output_ff5.c
  gcc -O2 -fno-fast-math -fcommon -I shim -I "$REF" -I . -DHAVE_FFMPEG=1 \
      -c gen/mp4_output_ff5.c -o build/mp4_output.o 2>/dev/null
  gcc -O2 -fcommon -I shim -I "$REF" -I . harness_mp4.c build/mp4_output.o \
      -lavformat -lavcodec -lavutil -lswscale -lswresample -lm \
      -o build/harness_mp4 2>/dev/null
  ./build/harness_mp4 "$OUT/c_mp4.bin" >/dev/null
  echo "c_mp4.bin written"
else
  echo "suite 23 skipped: libav dev headers not found"
fi
