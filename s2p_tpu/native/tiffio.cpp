// Native TIFF window reader: the runtime IO core.
//
// The reference pipeline's C layer links iio (universal image IO,
// SURVEY.md 2.3) and every worker re-reads image windows from disk
// (initialization.py:300-311, sift.py:96-110).  This library provides the
// same capability natively for the TPU pipeline: memory-mapped TIFF
// parsing and windowed decode of strip- or tile-organized rasters
// (uncompressed / deflate / packbits, horizontal-difference predictor),
// touching only the chunks that intersect the requested window.
//
// Exposed as a C ABI consumed through ctypes (s2p_tpu/geo/geotiff_native.py).
//
// Build: g++ -O3 -shared -fPIC tiffio.cpp -o libtiffio.so -lz

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

#include <vector>

namespace {

struct Reader {
    const uint8_t* data = nullptr;
    size_t size = 0;
    int fd = -1;
    bool little = true;
    bool big_tiff = false;

    uint64_t width = 0, height = 0;
    uint32_t spp = 1, bps = 8, sample_format = 1;
    uint32_t compression = 1, predictor = 1, planar = 1;
    uint64_t rows_per_strip = 0, tile_w = 0, tile_h = 0;
    std::vector<uint64_t> chunk_offsets;
    std::vector<uint64_t> chunk_counts;

    ~Reader() {
        if (data) munmap(const_cast<uint8_t*>(data), size);
        if (fd >= 0) close(fd);
    }

    uint64_t rd(const uint8_t* p, int n) const {
        uint64_t v = 0;
        if (little) {
            for (int i = n - 1; i >= 0; --i) v = (v << 8) | p[i];
        } else {
            for (int i = 0; i < n; ++i) v = (v << 8) | p[i];
        }
        return v;
    }
};

int type_size(uint16_t t) {
    switch (t) {
        case 1: case 2: case 6: case 7: return 1;
        case 3: case 8: return 2;
        case 4: case 9: case 11: return 4;
        case 5: case 10: case 12: case 16: case 17: return 8;
        default: return 0;
    }
}

bool parse(Reader& r) {
    const uint8_t* d = r.data;
    if (r.size < 16) return false;
    if (d[0] == 'I' && d[1] == 'I') r.little = true;
    else if (d[0] == 'M' && d[1] == 'M') r.little = false;
    else return false;
    uint64_t magic = r.rd(d + 2, 2);
    uint64_t ifd;
    if (magic == 43) {
        r.big_tiff = true;
        ifd = r.rd(d + 8, 8);
    } else if (magic == 42) {
        ifd = r.rd(d + 4, 4);
    } else {
        return false;
    }

    const int esz = r.big_tiff ? 20 : 12;
    uint64_t n = r.big_tiff ? r.rd(d + ifd, 8) : r.rd(d + ifd, 2);
    const uint8_t* e0 = d + ifd + (r.big_tiff ? 8 : 2);

    auto values = [&](const uint8_t* e, std::vector<uint64_t>& out) {
        uint16_t typ = (uint16_t)r.rd(e + 2, 2);
        uint64_t cnt = r.big_tiff ? r.rd(e + 4, 8) : r.rd(e + 4, 4);
        int ts = type_size(typ);
        if (!ts) return;
        uint64_t total = cnt * ts;
        uint64_t inline_cap = r.big_tiff ? 8 : 4;
        const uint8_t* p;
        if (total <= inline_cap) {
            p = e + (r.big_tiff ? 12 : 8);
        } else {
            uint64_t off = r.big_tiff ? r.rd(e + 12, 8) : r.rd(e + 8, 4);
            if (off + total > r.size) return;
            p = d + off;
        }
        out.resize(cnt);
        for (uint64_t i = 0; i < cnt; ++i) out[i] = r.rd(p + i * ts, ts);
    };

    for (uint64_t i = 0; i < n; ++i) {
        const uint8_t* e = e0 + i * esz;
        uint16_t tag = (uint16_t)r.rd(e, 2);
        std::vector<uint64_t> v;
        switch (tag) {
            case 256: values(e, v); if (!v.empty()) r.width = v[0]; break;
            case 257: values(e, v); if (!v.empty()) r.height = v[0]; break;
            case 258: values(e, v); if (!v.empty()) r.bps = (uint32_t)v[0]; break;
            case 259: values(e, v); if (!v.empty()) r.compression = (uint32_t)v[0]; break;
            case 273: values(e, r.chunk_offsets); break;
            case 277: values(e, v); if (!v.empty()) r.spp = (uint32_t)v[0]; break;
            case 278: values(e, v); if (!v.empty()) r.rows_per_strip = v[0]; break;
            case 279: values(e, r.chunk_counts); break;
            case 284: values(e, v); if (!v.empty()) r.planar = (uint32_t)v[0]; break;
            case 317: values(e, v); if (!v.empty()) r.predictor = (uint32_t)v[0]; break;
            case 322: values(e, v); if (!v.empty()) r.tile_w = v[0]; break;
            case 323: values(e, v); if (!v.empty()) r.tile_h = v[0]; break;
            case 324: values(e, r.chunk_offsets); break;
            case 325: values(e, r.chunk_counts); break;
            case 339: values(e, v); if (!v.empty()) r.sample_format = (uint32_t)v[0]; break;
            default: break;
        }
    }
    if (!r.width || !r.height || r.chunk_offsets.empty()) return false;
    if (!r.tile_w && !r.rows_per_strip) r.rows_per_strip = r.height;
    return true;
}

bool decompress(const Reader& r, const uint8_t* src, size_t src_len,
                uint8_t* dst, size_t dst_len) {
    if (r.compression == 1) {
        memcpy(dst, src, src_len < dst_len ? src_len : dst_len);
        return true;
    }
    if (r.compression == 8 || r.compression == 32946) {
        uLongf out_len = dst_len;
        return uncompress(dst, &out_len, src, src_len) == Z_OK;
    }
    if (r.compression == 32773) {  // packbits
        size_t si = 0, di = 0;
        while (si < src_len && di < dst_len) {
            int8_t b = (int8_t)src[si++];
            if (b >= 0) {
                size_t cnt = (size_t)b + 1;
                if (si + cnt > src_len) cnt = src_len - si;
                if (di + cnt > dst_len) cnt = dst_len - di;
                memcpy(dst + di, src + si, cnt);
                si += cnt; di += cnt;
            } else if (b != -128) {
                size_t cnt = (size_t)(1 - b);
                if (di + cnt > dst_len) cnt = dst_len - di;
                memset(dst + di, src[si], cnt);
                ++si; di += cnt;
            }
        }
        return true;
    }
    return false;
}

void unpredict_rows(const Reader& r, uint8_t* buf, uint64_t rows,
                    uint64_t row_px) {
    if (r.predictor != 2) return;
    const int bytes = r.bps / 8;
    const uint64_t stride = row_px * r.spp;
    for (uint64_t y = 0; y < rows; ++y) {
        uint8_t* row = buf + y * stride * bytes;
        if (bytes == 1) {
            for (uint64_t i = r.spp; i < stride; ++i) row[i] += row[i - r.spp];
        } else if (bytes == 2) {
            uint16_t* p = (uint16_t*)row;
            for (uint64_t i = r.spp; i < stride; ++i) p[i] += p[i - r.spp];
        } else if (bytes == 4) {
            uint32_t* p = (uint32_t*)row;
            for (uint64_t i = r.spp; i < stride; ++i) p[i] += p[i - r.spp];
        }
    }
}

}  // namespace

extern "C" {

// Opaque handle API
void* tiff_open(const char* path) {
    Reader* r = new Reader();
    r->fd = open(path, O_RDONLY);
    if (r->fd < 0) { delete r; return nullptr; }
    struct stat st;
    if (fstat(r->fd, &st) != 0) { delete r; return nullptr; }
    r->size = st.st_size;
    r->data = (const uint8_t*)mmap(nullptr, r->size, PROT_READ, MAP_PRIVATE,
                                   r->fd, 0);
    if (r->data == MAP_FAILED) { r->data = nullptr; delete r; return nullptr; }
    if (!parse(*r)) { delete r; return nullptr; }
    return r;
}

void tiff_close(void* h) { delete (Reader*)h; }

// info: [width, height, spp, bps, sample_format, compression, tiled]
int tiff_info(void* h, int64_t* out) {
    Reader* r = (Reader*)h;
    if (!r) return -1;
    out[0] = (int64_t)r->width;
    out[1] = (int64_t)r->height;
    out[2] = r->spp;
    out[3] = r->bps;
    out[4] = r->sample_format;
    out[5] = r->compression;
    out[6] = r->tile_w ? 1 : 0;
    return 0;
}

// Read a window [x, x+w) x [y, y+h) into out (row-major, interleaved spp,
// native sample type).  Out-of-image area is zero-filled.
int tiff_read_window(void* h, int64_t x, int64_t y, int64_t w, int64_t hgt,
                     uint8_t* out) {
    Reader* r = (Reader*)h;
    if (!r) return -1;
    if (r->planar != 1) return -2;
    const int bytes = r->bps / 8;
    const uint64_t px_sz = (uint64_t)bytes * r->spp;
    memset(out, 0, (size_t)w * hgt * px_sz);

    const uint64_t cw = r->tile_w ? r->tile_w : r->width;
    const uint64_t ch = r->tile_w ? r->tile_h : r->rows_per_strip;
    const uint64_t ncx = (r->width + cw - 1) / cw;
    const uint64_t ncy = (r->height + ch - 1) / ch;

    int64_t cx0 = x < 0 ? 0 : x / (int64_t)cw;
    int64_t cy0 = y < 0 ? 0 : y / (int64_t)ch;
    int64_t cx1 = (x + w - 1) / (int64_t)cw;
    int64_t cy1 = (y + hgt - 1) / (int64_t)ch;
    if (cx1 >= (int64_t)ncx) cx1 = ncx - 1;
    if (cy1 >= (int64_t)ncy) cy1 = ncy - 1;

    std::vector<uint8_t> buf(cw * ch * px_sz);
    for (int64_t cy = cy0; cy <= cy1; ++cy) {
        for (int64_t cx = cx0; cx <= cx1; ++cx) {
            uint64_t idx = (uint64_t)cy * (r->tile_w ? ncx : 1)
                           + (r->tile_w ? (uint64_t)cx : 0);
            if (!r->tile_w) idx = (uint64_t)cy;
            if (idx >= r->chunk_offsets.size()) continue;
            uint64_t off = r->chunk_offsets[idx];
            uint64_t cnt = idx < r->chunk_counts.size() ? r->chunk_counts[idx]
                                                       : 0;
            if (off + cnt > r->size) continue;
            // rows actually present in this chunk
            uint64_t rows = ch;
            if (!r->tile_w && (uint64_t)(cy + 1) * ch > r->height)
                rows = r->height - cy * ch;
            uint64_t row_px = r->tile_w ? cw : r->width;
            size_t want = (size_t)rows * row_px * px_sz;
            if (!decompress(*r, r->data + off, cnt, buf.data(), want))
                return -3;
            unpredict_rows(*r, buf.data(), rows, row_px);

            // copy the intersection into out
            int64_t gy0 = cy * ch, gx0 = r->tile_w ? cx * cw : 0;
            int64_t iy0 = y > gy0 ? y : gy0;
            int64_t ix0 = x > gx0 ? x : gx0;
            int64_t iy1 = (y + hgt) < (gy0 + (int64_t)rows) ? (y + hgt)
                                                            : gy0 + rows;
            int64_t ix1 = (x + w) < (gx0 + (int64_t)row_px) ? (x + w)
                                                            : gx0 + row_px;
            if ((int64_t)(gx0 + row_px) > (int64_t)r->width)
                ix1 = (x + w) < (int64_t)r->width ? (x + w) : r->width;
            for (int64_t yy = iy0; yy < iy1; ++yy) {
                const uint8_t* srow = buf.data()
                    + ((yy - gy0) * row_px + (ix0 - gx0)) * px_sz;
                uint8_t* drow = out + ((yy - y) * w + (ix0 - x)) * px_sz;
                memcpy(drow, srow, (size_t)(ix1 - ix0) * px_sz);
            }
        }
    }
    return 0;
}

}  // extern "C"
