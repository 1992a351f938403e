// Decoder for Panasonic RW2 compressed sensor data (the classic
// 12-bit scheme). Replaces the libraw dependency of the reference's
// readraw_in_cfa (src/io/image_formats_libraries.c:830) for Panasonic
// bodies; bitstream layout per the public dcraw/libraw documentation
// of panasonic_load_raw / pana_bits.
//
// Stream model: the file carries 0x4000-byte blocks whose first
// `load_flags` bytes (0x2008 for RW2) are stored LAST; bits are
// consumed from a countdown position with 16-byte-group swizzling
// (byte = pos>>3 ^ 0x3ff0) and little-endian in-window packing.
// Pixels come in groups of 14 per column run: two interleaved lanes
// (even/odd columns) each carry a running predictor updated by 8-bit
// deltas scaled by a 2-bit shift code read every third pixel, with an
// 8+4-bit absolute re-seed whenever a lane's predictor is inactive.

#include <cstdint>
#include <cstring>

namespace {

struct PanaBits {
  const uint8_t *p, *end;
  int load_flags;
  uint8_t buf[0x4001];  // +1: the 16-bit window may touch buf[0x4000]
  int vbits = 0;

  void fill(uint8_t *dst, int n) {
    long have = end - p;
    int take = have < n ? (int)have : n;
    std::memcpy(dst, p, take);
    if (take < n) std::memset(dst + take, 0, n - take);
    p += take;
  }
  unsigned get(int nbits) {
    if (!nbits) return vbits = 0;
    if (!vbits) {
      fill(buf + load_flags, 0x4000 - load_flags);
      fill(buf, load_flags);
      buf[0x4000] = 0;
    }
    vbits = (vbits - nbits) & 0x1ffff;
    int byte = (vbits >> 3) ^ 0x3ff0;
    return ((buf[byte] | (buf[byte + 1] << 8)) >> (vbits & 7)) &
           ((1u << nbits) - 1);
  }
};

}  // namespace

extern "C" int panasonic_decompress(const uint8_t *data, long len, int rows,
                                    int cols, int load_flags,
                                    uint16_t *out /* rows*cols */) {
  if (rows <= 0 || cols < 2 || load_flags < 0 || load_flags >= 0x4000)
    return 1;
  PanaBits pb{data, data + len, load_flags};
  pb.get(0);
  int sh = 0, pred[2], nonz[2];
  for (int row = 0; row < rows; row++) {
    uint16_t *orow = out + (long)row * cols;
    for (int col = 0; col < cols; col++) {
      int i = col % 14;
      if (i == 0) pred[0] = pred[1] = nonz[0] = nonz[1] = 0;
      if (i % 3 == 2) sh = 4 >> (3 - (int)pb.get(2));
      if (nonz[i & 1]) {
        int j = (int)pb.get(8);
        if (j) {
          if ((pred[i & 1] -= 0x80 << sh) < 0 || sh == 4)
            pred[i & 1] &= ~(-1 << sh);
          pred[i & 1] += j << sh;
        }
      } else if ((nonz[i & 1] = (int)pb.get(8)) != 0 || i > 11) {
        pred[i & 1] = nonz[i & 1] << 4 | (int)pb.get(4);
      }
      orow[col] = (uint16_t)pred[col & 1];
    }
  }
  return 0;
}
