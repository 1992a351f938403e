// Decoder for Olympus ORF compressed sensor data. Replaces the libraw
// dependency of the reference's readraw_in_cfa
// (src/io/image_formats_libraries.c:830) for Olympus bodies; bitstream
// layout per the public dcraw/libraw documentation of
// olympus_load_raw.
//
// Stream model (MSB-first, no stuffing; the stored strip begins 7
// bytes before the bitstream): each pixel carries a 3-bit field (sign
// bit + 2 low bits), a unary-coded "high" part (n leading zeros then a
// one; 12 zeros escape to an explicit (16-nbits)-bit field halved),
// and nbits residual bits, where nbits derives from per-column-parity
// carry state. The reconstruction adds a smoothed carry and a
// gradient-adaptive spatial predictor over the pixels two rows/columns
// back (same CFA plane).

#include <cstdint>
#include <cstdlib>

namespace {

struct BitReader {
  const uint8_t *p, *end;
  uint32_t acc = 0;
  int n = 0;
  inline uint32_t get(int nb) {
    if (nb <= 0) return 0;
    while (n < nb) {
      acc = (acc << 8) | (p < end ? *p++ : 0);
      n += 8;
    }
    uint32_t v = (acc >> (n - nb)) & ((1u << nb) - 1);
    n -= nb;
    return v;
  }
  // unary high part: leading zeros up to 11 then a consumed one-bit;
  // 12 zeros -> 12 (the escape), matching the 4096-entry table the
  // format defines
  inline int high12() {
    for (int z = 0; z < 12; z++)
      if (get(1)) return z;
    return 12;
  }
};

}  // namespace

extern "C" int olympus_decompress(const uint8_t *data, long len, int rows,
                                  int cols, uint16_t *out) {
  if (rows <= 0 || cols < 2) return 1;
  BitReader br{data, data + len};
  for (int row = 0; row < rows; row++) {
    int acarry[2][3] = {{0, 0, 0}, {0, 0, 0}};
    uint16_t *orow = out + (long)row * cols;
    for (int col = 0; col < cols; col++) {
      int *carry = acarry[col & 1];
      int i = 2 * (carry[2] < 3);
      int nbits;
      for (nbits = 2 + i; (uint16_t)carry[0] >> (nbits + i); nbits++) {
      }
      uint32_t three = br.get(3);
      int low = three & 3;
      int sign = (three & 4) ? -1 : 0;
      int high = br.high12();
      if (high == 12) high = (int)br.get(16 - nbits) >> 1;
      carry[0] = (high << nbits) | (int)br.get(nbits);
      int diff = (carry[0] ^ sign) + carry[1];
      carry[1] = (diff * 3 + carry[1]) >> 5;
      carry[2] = carry[0] > 16 ? 0 : carry[2] + 1;
      int pred;
      if (row < 2 && col < 2)
        pred = 0;
      else if (row < 2)
        pred = orow[col - 2];
      else if (col < 2)
        pred = out[(long)(row - 2) * cols + col];
      else {
        int w = orow[col - 2];
        int n_ = out[(long)(row - 2) * cols + col];
        int nw = out[(long)(row - 2) * cols + col - 2];
        if ((w < nw && nw < n_) || (n_ < nw && nw < w)) {
          if (abs(w - nw) > 32 || abs(n_ - nw) > 32)
            pred = w + n_ - nw;
          else
            pred = (w + n_) >> 1;
        } else {
          pred = abs(w - nw) > abs(n_ - nw) ? w : n_;
        }
      }
      orow[col] = (uint16_t)(pred + ((diff << 2) | low));
    }
  }
  return 0;
}
