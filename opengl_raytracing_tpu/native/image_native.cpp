// Native image-codec hot paths (the stb_image-equivalent layer's only
// slow parts once zlib handles entropy coding).
// (reference: src/render/stb_image_impl.cpp — the reference vendors
// stb_image in C; here the python codecs in utils/image.py call these
// via ctypes and fall back to numpy when the library is unavailable.)
//
// png_unfilter: PNG scanline defilter (filters 0-4, 8-bit samples).
// hdr_unrle:    Radiance .hdr new-style RLE scanline decode to RGBE.

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// raw: h * (1 + w*c) bytes of (filter_byte, filtered_row) pairs.
// out: h * w * c bytes, unfiltered.  Returns 0 on success, <0 on a bad
// filter type (matching the python codec's ValueError).
int png_unfilter(const uint8_t* raw, int64_t h, int64_t w, int64_t c,
                 uint8_t* out) {
    const int64_t stride = w * c;
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t ftype = raw[y * (stride + 1)];
        const uint8_t* row = raw + y * (stride + 1) + 1;
        uint8_t* cur = out + y * stride;
        const uint8_t* prev = y > 0 ? out + (y - 1) * stride : nullptr;
        switch (ftype) {
            case 0:
                std::memcpy(cur, row, stride);
                break;
            case 1:  // Sub
                for (int64_t x = 0; x < stride; ++x) {
                    const int left = x >= c ? cur[x - c] : 0;
                    cur[x] = (uint8_t)(row[x] + left);
                }
                break;
            case 2:  // Up
                for (int64_t x = 0; x < stride; ++x) {
                    const int up = prev ? prev[x] : 0;
                    cur[x] = (uint8_t)(row[x] + up);
                }
                break;
            case 3:  // Average
                for (int64_t x = 0; x < stride; ++x) {
                    const int left = x >= c ? cur[x - c] : 0;
                    const int up = prev ? prev[x] : 0;
                    cur[x] = (uint8_t)(row[x] + ((left + up) >> 1));
                }
                break;
            case 4:  // Paeth
                for (int64_t x = 0; x < stride; ++x) {
                    const int a = x >= c ? cur[x - c] : 0;
                    const int b = prev ? prev[x] : 0;
                    const int cc = (prev && x >= c) ? prev[x - c] : 0;
                    const int p = a + b - cc;
                    const int pa = std::abs(p - a);
                    const int pb = std::abs(p - b);
                    const int pc = std::abs(p - cc);
                    const int pred = (pa <= pb && pa <= pc) ? a
                                     : (pb <= pc ? b : cc);
                    cur[x] = (uint8_t)(row[x] + pred);
                }
                break;
            default:
                return -(int)ftype;
        }
    }
    return 0;
}

// Radiance .hdr new-style RLE: decode `h` scanlines of width `w` from
// `data[pos..n)` into rgbe_out [h*w*4].  Each scanline starts with the
// 4-byte header 0x02 0x02 hi lo (length == w) followed by 4 RLE-coded
// component planes.  Old-style (unencoded) scanlines are handled too.
// Returns the final read position, or <0 on malformed input.
int64_t hdr_unrle(const uint8_t* data, int64_t n, int64_t pos,
                  int64_t h, int64_t w, uint8_t* rgbe_out) {
    for (int64_t y = 0; y < h; ++y) {
        uint8_t* line = rgbe_out + y * w * 4;
        if (pos + 4 > n) return -1;
        if (w >= 8 && w < 32768 && data[pos] == 2 && data[pos + 1] == 2
            && ((int64_t)data[pos + 2] << 8 | data[pos + 3]) == w) {
            pos += 4;
            for (int comp = 0; comp < 4; ++comp) {
                int64_t x = 0;
                while (x < w) {
                    if (pos >= n) return -2;
                    int count = data[pos++];
                    if (count > 128) {  // run
                        count -= 128;
                        if (pos >= n || x + count > w) return -3;
                        const uint8_t v = data[pos++];
                        for (int k = 0; k < count; ++k)
                            line[(x + k) * 4 + comp] = v;
                    } else {            // literal
                        if (pos + count > n || x + count > w) return -4;
                        for (int k = 0; k < count; ++k)
                            line[(x + k) * 4 + comp] = data[pos + k];
                        pos += count;
                    }
                    x += count;
                }
            }
        } else {
            // old-style flat scanline: w RGBE quads
            if (pos + w * 4 > n) return -5;
            std::memcpy(line, data + pos, w * 4);
            pos += w * 4;
        }
    }
    return pos;
}

}  // extern "C"
