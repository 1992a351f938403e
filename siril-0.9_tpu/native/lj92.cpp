// Lossless JPEG (ITU T.81, 1992, SOF3) decoder for compressed DNG tiles.
//
// Scope: what DNG writers actually emit (DNG spec 1.4 §"Compression"):
// SOF3 frames, 2-16 bit precision, 1-4 components interleaved per line,
// predictors 1-7, optional point transform, optional restart intervals,
// 0xFF00 byte stuffing. This replaces the lossless-JPEG half of libraw
// for DNG input (reference: src/io/image_formats_libraries.c readraw
// paths delegate to libraw; this environment has neither libraw nor
// rawpy, so siriltpu carries its own native decoder).
//
// Exposed C ABI (ctypes):
//   lj92_decode(data, len, out, out_cap, &width, &height, &ncomp, &bits)
// Output layout: row-major, components interleaved:
//   out[(y*W + x)*ncomp + c].  Returns 0 on success, negative on error.

#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
    const uint8_t* p;
    const uint8_t* end;
    uint64_t acc = 0;   // right-aligned bit accumulator
    int nbits = 0;
    bool hit_marker = false;  // stop at any non-stuffing marker

    BitReader(const uint8_t* data, const uint8_t* e) : p(data), end(e) {}

    // fetch next byte of entropy data, handling 0xFF00 stuffing
    inline int next_byte() {
        if (p >= end) return -1;
        uint8_t b = *p++;
        if (b == 0xFF) {
            if (p >= end) return -1;
            uint8_t m = *p;
            if (m == 0x00) { ++p; return 0xFF; }
            // a real marker (RSTn / EOI): unconsume and flag
            --p;
            hit_marker = true;
            return -1;
        }
        return b;
    }

    // top up the accumulator; exhausted stream pads with zero bits
    // (T.81 F.2.2.5: trailing scan bits are padding)
    inline void fill(int need) {
        while (nbits < need) {
            int b = next_byte();
            if (b < 0) b = 0;
            acc = (acc << 8) | (uint64_t)b;
            nbits += 8;
        }
    }

    inline int peek(int k) {
        fill(k);
        return (int)((acc >> (nbits - k)) & ((1u << k) - 1));
    }

    inline void consume(int k) { nbits -= k; }

    inline int bits(int n) {
        if (!n) return 0;
        int v = peek(n);
        nbits -= n;
        return v;
    }

    // drop every buffered bit (restart intervals are byte-aligned and
    // anything buffered past the align point is padding before the RST)
    void restart_flush() { nbits = 0; acc = 0; }
};

// canonical Huffman per T.81 F.16 with a fast 8-bit prefix table
struct Huff {
    int32_t mincode[17];
    int32_t maxcode[17];
    int32_t valptr[17];
    uint8_t vals[256];
    uint8_t fast_sym[256];
    uint8_t fast_len[256];  // 0 = code longer than 8 bits
    bool present = false;

    void build(const uint8_t counts[16], const uint8_t* values, int nvals) {
        int code = 0, k = 0;
        std::memset(fast_len, 0, sizeof(fast_len));
        if (nvals > 256) nvals = 256;
        std::memcpy(vals, values, nvals);
        for (int l = 1; l <= 16; ++l) {
            valptr[l] = k;
            mincode[l] = code;
            for (int i = 0; i < counts[l - 1]; ++i, ++code, ++k) {
                if (l <= 8 && k < nvals) {
                    int lo = code << (8 - l), n = 1 << (8 - l);
                    for (int j = 0; j < n; ++j) {
                        fast_sym[lo + j] = vals[k];
                        fast_len[lo + j] = (uint8_t)l;
                    }
                }
            }
            maxcode[l] = counts[l - 1] ? code - 1 : -1;
            code <<= 1;
        }
        present = true;
    }

    inline int decode(BitReader& br) const {
        int pk = br.peek(8);
        int fl = fast_len[pk];
        if (fl) {
            br.consume(fl);
            return fast_sym[pk];
        }
        int c16 = br.peek(16);
        for (int l = 9; l <= 16; ++l) {
            int c = c16 >> (16 - l);
            if (maxcode[l] >= 0 && c <= maxcode[l]) {
                br.consume(l);
                return vals[valptr[l] + c - mincode[l]];
            }
        }
        return -1;  // invalid code
    }
};

inline int extend(int v, int ssss) {
    // T.81 F.12 EXTEND: map magnitude-category bits to signed diff
    if (ssss == 0) return 0;
    if (v < (1 << (ssss - 1))) return v - (1 << ssss) + 1;
    return v;
}

inline uint16_t rd16(const uint8_t* p) {
    return (uint16_t)((p[0] << 8) | p[1]);
}

}  // namespace

extern "C" int lj92_decode(const uint8_t* data, long len, uint16_t* out,
                           long out_cap, int* o_width, int* o_height,
                           int* o_ncomp, int* o_bits) {
    const uint8_t* p = data;
    const uint8_t* end = data + len;
    if (len < 4 || p[0] != 0xFF || p[1] != 0xD8) return -1;  // no SOI
    p += 2;

    Huff tables[4];
    int precision = 0, H = 0, W = 0, Nf = 0;
    int comp_table[4] = {0, 0, 0, 0};
    int predictor = 1, pt = 0, restart_interval = 0;
    bool have_sof = false;
    const uint8_t* scan = nullptr;

    while (p + 4 <= end) {
        if (p[0] != 0xFF) return -2;  // marker desync
        uint8_t m = p[1];
        p += 2;
        if (m == 0xD9) break;  // EOI before SOS: empty
        int seglen = (p + 2 <= end) ? ((p[0] << 8) | p[1]) : -1;
        if (seglen < 2 || p + seglen > end) return -3;
        const uint8_t* seg = p + 2;
        if (m == 0xC3) {  // SOF3: lossless sequential
            precision = seg[0];
            H = rd16(seg + 1);
            W = rd16(seg + 3);
            Nf = seg[5];
            if (Nf < 1 || Nf > 4 || precision < 2 || precision > 16)
                return -4;
            for (int c = 0; c < Nf; ++c) {
                // seg[6+3c]=Cid, [7+3c]=HV (must be 1x1 for lossless DNG)
                if (seg[7 + 3 * c] != 0x11) return -5;
            }
            have_sof = true;
        } else if ((m >= 0xC0 && m <= 0xCF) && m != 0xC4 && m != 0xC8 &&
                   m != 0xCC && m != 0xC3) {
            return -6;  // a lossy SOF: not lossless JPEG
        } else if (m == 0xC4) {  // DHT
            const uint8_t* q = seg;
            while (q + 17 <= seg + seglen - 2) {
                int tc = q[0] >> 4, th = q[0] & 15;
                if (tc != 0 || th > 3) return -7;
                int nv = 0;
                for (int i = 0; i < 16; ++i) nv += q[1 + i];
                if (q + 17 + nv > seg + seglen - 2) return -7;
                tables[th].build(q + 1, q + 17, nv);
                q += 17 + nv;
            }
        } else if (m == 0xDD) {  // DRI
            restart_interval = rd16(seg);
        } else if (m == 0xDA) {  // SOS
            if (!have_sof) return -8;
            int Ns = seg[0];
            if (Ns != Nf) return -8;
            for (int c = 0; c < Ns; ++c)
                comp_table[c] = seg[2 + 2 * c] >> 4;
            predictor = seg[1 + 2 * Ns];      // Ss
            pt = seg[3 + 2 * Ns] & 15;        // Al = point transform
            if (predictor < 1 || predictor > 7) return -9;
            scan = p + seglen;
            break;
        }
        // APPn, COM, DQT etc.: skip
        p += seglen;
    }
    if (!scan) return -10;
    for (int c = 0; c < Nf; ++c)
        if (!tables[comp_table[c]].present) return -7;

    long total = (long)H * W * Nf;
    if (out_cap < total) return -11;
    *o_width = W;
    *o_height = H;
    *o_ncomp = Nf;
    *o_bits = precision;

    const int default_val = 1 << (precision - pt - 1);
    BitReader br(scan, end);
    long idx = 0;
    int mcu_in_interval = 0;
    bool fresh = true;  // start of image or just after restart

    for (int y = 0; y < H; ++y) {
        for (int x = 0; x < W; ++x) {
            if (restart_interval && mcu_in_interval == restart_interval) {
                // byte-align, consume RSTn, reset DC prediction state
                br.restart_flush();
                br.hit_marker = false;
                if (br.p + 2 <= br.end && br.p[0] == 0xFF &&
                    br.p[1] >= 0xD0 && br.p[1] <= 0xD7)
                    br.p += 2;
                mcu_in_interval = 0;
                fresh = true;
            }
            for (int c = 0; c < Nf; ++c) {
                int ssss = tables[comp_table[c]].decode(br);
                if (ssss < 0) return -12;
                int diff;
                if (ssss == 16) {
                    diff = 32768;
                } else {
                    int v = ssss ? br.bits(ssss) : 0;
                    if (v < 0) return -12;
                    diff = extend(v, ssss);
                }
                int px;
                if (fresh) {
                    px = default_val;  // T.81 H.1.2.2 first sample
                } else if (x == 0) {
                    px = out[idx - (long)W * Nf];  // Rb of previous row
                } else if (y == 0) {
                    px = out[idx - Nf];  // Ra
                } else {
                    int ra = out[idx - Nf];
                    int rb = out[idx - (long)W * Nf];
                    int rc = out[idx - (long)W * Nf - Nf];
                    switch (predictor) {
                        case 1: px = ra; break;
                        case 2: px = rb; break;
                        case 3: px = rc; break;
                        case 4: px = ra + rb - rc; break;
                        case 5: px = ra + ((rb - rc) >> 1); break;
                        case 6: px = rb + ((ra - rc) >> 1); break;
                        default: px = (ra + rb) >> 1; break;
                    }
                }
                out[idx++] = (uint16_t)((px + diff) & 0xFFFF);
            }
            fresh = false;
            ++mcu_in_interval;
        }
        // after the first sample of row 0, x==0 of later rows uses Rb —
        // handled above; 'fresh' only re-arms at restart markers
    }
    if (pt) {
        for (long i = 0; i < total; ++i)
            out[i] = (uint16_t)(out[i] << pt);
    }
    return 0;
}
