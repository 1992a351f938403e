// Huffman/differential decoder for Pentax PEF compressed sensor data
// (TIFF compression 65535). Replaces the libraw dependency of the
// reference's readraw_in_cfa (src/io/image_formats_libraries.c:830)
// for Pentax bodies; bitstream layout per the public dcraw/libraw
// documentation of pentax_load_raw.
//
// The MakerNote's tag-0x220 blob supplies the Huffman table as
// (12-bit start code, code length) pairs, one per residual category
// (the leaf value IS the table position). The stream is MSB-first
// with no stuffing; residuals use plain JPEG sign extension (length
// 16 is the -32768 escape) and feed the same predictor scheme as
// Nikon: per-column-pair horizontal predictors re-seeded from
// per-row-parity vertical predictors (here initialized to zero).

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {

struct BitReader {
  const uint8_t *p, *end;
  uint32_t acc = 0;
  int n = 0;
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

}  // namespace

extern "C" int pentax_decompress(const uint8_t *data, long len, int rows,
                                 int cols, const uint16_t *starts,
                                 const uint8_t *lens, int dep,
                                 int16_t *out /* rows*cols */) {
  if (rows <= 0 || cols < 2 || dep <= 0 || dep > 16) return 1;
  // 12-bit lookup: entries [start .. start + 4096>>len - 1] -> len,cat
  std::vector<uint16_t> lut(4096, 0);
  for (int c = 0; c < dep; c++) {
    int ln = lens[c];
    if (ln < 1 || ln > 12) return 1;
    uint32_t span = 4096u >> ln;
    uint32_t s = starts[c];
    if (s + span > 4096) return 1;
    for (uint32_t j = 0; j < span; j++)
      lut[s + j] = uint16_t(ln << 8 | c);
  }
  BitReader br{data, data + len};
  int16_t vpred[2][2] = {{0, 0}, {0, 0}};
  int16_t hpred[2] = {0, 0};
  for (int row = 0; row < rows; row++) {
    int16_t *orow = out + (long)row * cols;
    for (int col = 0; col < cols; col++) {
      uint16_t e = lut[br.peek(12)];
      if (!e) return 2;  // hole in the code table: corrupt stream
      br.consume(e >> 8);
      int cat = e & 0xff;
      int diff;
      if (cat == 16) {
        diff = -32768;  // the JPEG escape category
      } else {
        diff = (int)br.get(cat);
        if (cat && (diff & (1 << (cat - 1))) == 0)
          diff -= (1 << cat) - 1;
      }
      if (col < 2)
        hpred[col] = vpred[row & 1][col] =
            int16_t(vpred[row & 1][col] + diff);
      else
        hpred[col & 1] = int16_t(hpred[col & 1] + diff);
      orow[col] = hpred[col & 1];
    }
  }
  return 0;
}
