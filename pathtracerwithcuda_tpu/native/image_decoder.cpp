// Native BMP + TGA decoder — the host-runtime analog of the reference's
// FreeImage-based Others/image_loader.cpp (it decodes the res/texture BMP
// cube maps and the sponza TGA textures).  Formats covered match what the
// reference assets actually use:
//   * BMP: uncompressed 24/32-bit, bottom-up or top-down rows
//     (Others/image_loader.cpp:97-173 decodes the same subset by hand)
//   * TGA: type 2 (uncompressed true-color) and type 10 (RLE true-color),
//     24/32-bit, both origin bits
// Output contract (shared with utils/image_io.load_image_rgb): float32 RGB
// in [0, 1], row 0 = visual top.
//
// Handle-based C ABI like the other ptc_* entry points (bvh_builder.cpp):
// load → query dimensions → fill caller-allocated buffer → free.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

struct Image {
    int width = 0;
    int height = 0;
    std::vector<float> rgb;  // h*w*3, row 0 = top
};

bool read_file(const char* path, std::vector<uint8_t>& out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (n <= 0) { std::fclose(f); return false; }
    out.resize(static_cast<size_t>(n));
    size_t got = std::fread(out.data(), 1, out.size(), f);
    std::fclose(f);
    return got == out.size();
}

uint32_t le32(const uint8_t* p) {
    return p[0] | (p[1] << 8u) | (p[2] << 16u) | (uint32_t(p[3]) << 24u);
}
uint16_t le16(const uint8_t* p) { return uint16_t(p[0] | (p[1] << 8u)); }

Image* decode_bmp(const std::vector<uint8_t>& d) {
    if (d.size() < 54 || d[0] != 'B' || d[1] != 'M') return nullptr;
    uint32_t pixel_offset = le32(&d[10]);
    int32_t width = int32_t(le32(&d[18]));
    int32_t height_raw = int32_t(le32(&d[22]));
    uint16_t bpp = le16(&d[28]);
    uint32_t compression = le32(&d[30]);
    if (width <= 0 || height_raw == 0) return nullptr;
    // INT32_MIN has no positive negation (signed-overflow UB below)
    if (height_raw == std::numeric_limits<int32_t>::min()) return nullptr;
    if ((bpp != 24 && bpp != 32) || compression != 0) return nullptr;
    bool bottom_up = height_raw > 0;
    int height = bottom_up ? height_raw : -height_raw;
    // plausibility cap keeps row_size*height from wrapping 64-bit below
    if (width > (1 << 20) || height > (1 << 20)) return nullptr;
    int channels = bpp / 8;
    size_t row_size = (size_t(width) * channels + 3u) & ~3u;
    if (d.size() < pixel_offset + row_size * size_t(height)) return nullptr;

    auto* img = new Image();
    img->width = width;
    img->height = height;
    img->rgb.resize(size_t(height) * width * 3);
    constexpr float k = 1.0f / 255.0f;
    for (int y = 0; y < height; ++y) {
        const uint8_t* row = d.data() + pixel_offset + size_t(y) * row_size;
        int out_y = bottom_up ? (height - 1 - y) : y;  // BGR, maybe bottom-up
        float* out = img->rgb.data() + size_t(out_y) * width * 3;
        for (int x = 0; x < width; ++x) {
            const uint8_t* px = row + size_t(x) * channels;
            out[x * 3 + 0] = px[2] * k;
            out[x * 3 + 1] = px[1] * k;
            out[x * 3 + 2] = px[0] * k;
        }
    }
    return img;
}

Image* decode_tga(const std::vector<uint8_t>& d) {
    if (d.size() < 18) return nullptr;
    uint8_t id_len = d[0];
    uint8_t cmap_type = d[1];
    uint8_t img_type = d[2];
    if (cmap_type != 0) return nullptr;
    bool rle = img_type == 10 || img_type == 11;
    bool gray = img_type == 3 || img_type == 11;  // spec maps ship as type 3
    if (img_type != 2 && !rle && !gray) return nullptr;
    int width = le16(&d[12]);
    int height = le16(&d[14]);
    uint8_t bpp = d[16];
    bool top_left = (d[17] & 0x20) != 0;  // origin bit 5: 1 = top-left rows
    if (width <= 0 || height <= 0) return nullptr;
    if (gray ? bpp != 8 : (bpp != 24 && bpp != 32)) return nullptr;
    int channels = bpp / 8;
    size_t off = 18 + id_len;
    size_t total = size_t(width) * height;

    // Validate claimed dimensions against the actual file size BEFORE
    // allocating (a malformed 16-bit header can otherwise claim ~17 GB):
    // non-RLE needs the full pixel payload present; RLE best-case packs
    // `channels+1` bytes per 128 pixels, so the file bounds the output.
    if (!rle) {
        if (d.size() < off || d.size() - off < total * size_t(channels))
            return nullptr;
    } else {
        if (d.size() < off) return nullptr;
        size_t max_pixels = (d.size() - off) * 128u / (size_t(channels) + 1u);
        if (total > max_pixels) return nullptr;
    }

    std::vector<uint8_t> pixels(total * channels);
    if (!rle) {
        std::memcpy(pixels.data(), d.data() + off, pixels.size());
    } else {  // RLE packets: 1 header byte + (1 or n) pixels
        size_t pi = 0, si = off;
        while (pi < pixels.size()) {
            if (si >= d.size()) return nullptr;
            uint8_t h = d[si++];
            int count = (h & 0x7F) + 1;
            if (h & 0x80) {  // run packet: one pixel repeated
                if (si + channels > d.size()) return nullptr;
                for (int r = 0; r < count && pi < pixels.size(); ++r) {
                    std::memcpy(&pixels[pi], &d[si], channels);
                    pi += channels;
                }
                si += channels;
            } else {  // raw packet: count literal pixels
                size_t bytes = size_t(count) * channels;
                if (si + bytes > d.size() || pi + bytes > pixels.size())
                    return nullptr;
                std::memcpy(&pixels[pi], &d[si], bytes);
                pi += bytes;
                si += bytes;
            }
        }
    }

    auto* img = new Image();
    img->width = width;
    img->height = height;
    img->rgb.resize(total * 3);
    constexpr float k = 1.0f / 255.0f;
    for (int y = 0; y < height; ++y) {
        int out_y = top_left ? y : (height - 1 - y);  // TGA default bottom-up
        const uint8_t* row = pixels.data() + size_t(y) * width * channels;
        float* out = img->rgb.data() + size_t(out_y) * width * 3;
        for (int x = 0; x < width; ++x) {
            const uint8_t* px = row + size_t(x) * channels;  // BGR(A) or gray
            if (gray) {
                float v = px[0] * k;
                out[x * 3 + 0] = v;
                out[x * 3 + 1] = v;
                out[x * 3 + 2] = v;
            } else {
                out[x * 3 + 0] = px[2] * k;
                out[x * 3 + 1] = px[1] * k;
                out[x * 3 + 2] = px[0] * k;
            }
        }
    }
    return img;
}

bool has_suffix(const std::string& s, const char* suf) {
    std::string t(suf);
    if (s.size() < t.size()) return false;
    for (size_t i = 0; i < t.size(); ++i) {
        char c = char(std::tolower(s[s.size() - t.size() + i]));
        if (c != t[i]) return false;
    }
    return true;
}

}  // namespace

extern "C" {

void* ptc_img_load(const char* path) {
    // No exception may cross the extern "C"/ctypes boundary (UB → terminate);
    // any decode failure — including bad_alloc on a hostile header that
    // slipped past the size checks — degrades to nullptr (Python falls back
    // to PIL).
    try {
        std::vector<uint8_t> data;
        if (!read_file(path, data)) return nullptr;
        std::string p(path);
        if (has_suffix(p, ".bmp")) return decode_bmp(data);
        if (has_suffix(p, ".tga")) return decode_tga(data);
        // sniff: BMP magic, else try TGA
        if (data.size() > 2 && data[0] == 'B' && data[1] == 'M')
            return decode_bmp(data);
        return decode_tga(data);
    } catch (...) {
        return nullptr;
    }
}

int32_t ptc_img_width(void* h) { return static_cast<Image*>(h)->width; }
int32_t ptc_img_height(void* h) { return static_cast<Image*>(h)->height; }

void ptc_img_fill(void* h, void* out_rgb) {
    auto* img = static_cast<Image*>(h);
    std::memcpy(out_rgb, img->rgb.data(), img->rgb.size() * sizeof(float));
}

void ptc_img_free(void* h) { delete static_cast<Image*>(h); }

}  // extern "C"
