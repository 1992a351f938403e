// Huffman/differential decoder for Nikon NEF compressed sensor data
// (TIFF compression 34713, both the "lossy type 2" and "lossless"
// flavors). This replaces the libraw dependency of the reference's
// readraw_in_cfa (src/io/image_formats_libraries.c:830) for Nikon
// bodies; the bitstream layout follows the publicly documented dcraw/
// libraw description of the format.
//
// Stream model: an MSB-first bitstream with no byte stuffing. Each
// pixel is one Huffman code whose leaf value packs (low nibble) the
// residual bit length and (high nibble) a left-shift used by the
// quantized post-"split" trees, followed by (len - shl) residual bits.
// The residual is sign-extended JPEG-style and accumulated into a
// per-column-pair horizontal predictor; the first two columns of each
// row re-seed from per-row-parity vertical predictors.

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {

struct BitReader {
  const uint8_t *p, *end;
  uint32_t acc = 0;
  int n = 0;
  // Past-EOF reads yield zero bits (the format pads the final codes).
  inline uint32_t peek(int nb) {
    while (n < nb) {
      acc = (acc << 8) | (p < end ? *p++ : 0);
      n += 8;
    }
    return (acc >> (n - nb)) & ((1u << nb) - 1);
  }
  inline void consume(int nb) { n -= nb; }
  inline uint32_t get(int nb) {
    if (nb <= 0) return 0;
    uint32_t v = peek(nb);
    consume(nb);
    return v;
  }
};

// Format-defined Huffman tables, selected by (version, bit depth,
// before/after the mid-frame "split"): first 16 bytes = counts of
// codes with lengths 1..16, then the leaf values.
static const uint8_t kTree[6][32] = {
    // 12-bit lossy
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,
     5, 4, 3, 6, 2, 7, 1, 0, 8, 9, 11, 10, 12},
    // 12-bit lossy after the split (quantized high categories)
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,
     0x39, 0x5a, 0x38, 0x27, 0x16, 5, 4, 3, 2, 1, 0, 11, 12, 12},
    // 12-bit lossless
    {0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12},
    // 14-bit lossy
    {0, 1, 4, 3, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,
     5, 6, 4, 7, 8, 3, 9, 2, 1, 0, 10, 11, 12, 13, 14},
    // 14-bit lossy after the split
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0,
     8, 0x5c, 0x4b, 0x3a, 0x29, 7, 6, 5, 4, 3, 2, 1, 0, 13, 14},
    // 14-bit lossless
    {0, 1, 4, 2, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0,
     7, 6, 8, 5, 9, 4, 10, 3, 11, 12, 2, 0, 1, 13, 14}};

struct Huff {
  int maxlen = 0;
  std::vector<uint16_t> lut;  // peek(maxlen) -> len<<8 | leaf value
  void build(const uint8_t *spec) {
    const uint8_t *counts = spec;  // counts[l-1] = #codes of length l
    const uint8_t *vals = spec + 16;
    maxlen = 16;
    while (maxlen && !counts[maxlen - 1]) maxlen--;
    lut.assign(size_t(1) << maxlen, 0);
    size_t h = 0;
    for (int len = 1; len <= maxlen; len++)
      for (int i = 0; i < counts[len - 1]; i++, vals++)
        for (size_t j = 0; j < (size_t(1) << (maxlen - len)); j++)
          if (h < lut.size()) lut[h++] = uint16_t(len << 8 | *vals);
  }
};

}  // namespace

extern "C" int nikon_decompress(const uint8_t *data, long len, int rows,
                                int cols, int tree, int split_row,
                                const int16_t *vpred_in /*[4]*/,
                                int16_t *out /* rows*cols */) {
  if (tree < 0 || tree > 5 || rows <= 0 || cols < 2) return 1;
  Huff huff;
  huff.build(kTree[tree]);
  BitReader br{data, data + len};
  int16_t vpred[2][2] = {{vpred_in[0], vpred_in[1]},
                         {vpred_in[2], vpred_in[3]}};
  int16_t hpred[2] = {0, 0};
  for (int row = 0; row < rows; row++) {
    if (split_row > 0 && row == split_row) {
      if (tree + 1 > 5) return 2;
      huff.build(kTree[tree + 1]);  // switch to the quantized tree
    }
    int16_t *orow = out + (long)row * cols;
    for (int col = 0; col < cols; col++) {
      uint16_t e = huff.lut[br.peek(huff.maxlen)];
      br.consume(e >> 8);
      int leaf = e & 0xff, nbits = leaf & 15, shl = leaf >> 4;
      int diff = 0;
      if (nbits) {
        int raw = (((int)br.get(nbits - shl) << 1) + 1) << shl >> 1;
        diff = raw;
        if ((raw & (1 << (nbits - 1))) == 0)
          diff = raw - ((1 << nbits) - (shl ? 0 : 1));
      }
      if (col < 2)
        hpred[col] = vpred[row & 1][col] = int16_t(vpred[row & 1][col] + diff);
      else
        hpred[col & 1] = int16_t(hpred[col & 1] + diff);
      orow[col] = hpred[col & 1];
    }
  }
  return 0;
}
