// Native host-side input pipeline for stereoformer_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the
// host-side work that must keep a chip (or a pod slice) fed: PFM
// disparity decode and the fused crop + /255 + ImageNet-normalize sample
// assembly, multi-threaded across a batch.  (The reference's only native
// code is the CUDA DCNv2 extension, replaced by ops/deform.py +
// ops/pallas; its input pipeline was torch DataLoader workers —
// trainer_DLC_GRU.py:79-82.)
//
// Exposed as a plain C ABI consumed via ctypes (stereoformer_tpu/data/
// native.py); every function returns 0 on success, negative on error.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <atomic>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

bool host_is_little_endian() {
  const uint16_t x = 1;
  return *reinterpret_cast<const uint8_t*>(&x) == 1;
}

void byteswap_f32(float* data, size_t n) {
  auto* p = reinterpret_cast<uint32_t*>(data);
  for (size_t i = 0; i < n; ++i) {
    uint32_t v = p[i];
    p[i] = ((v & 0xFF000000u) >> 24) | ((v & 0x00FF0000u) >> 8) |
           ((v & 0x0000FF00u) << 8) | ((v & 0x000000FFu) << 24);
  }
}

// Read one whitespace-terminated token, skipping leading whitespace.
bool read_token(FILE* f, char* buf, size_t cap) {
  int c;
  do {
    c = fgetc(f);
    if (c == EOF) return false;
  } while (c == ' ' || c == '\n' || c == '\r' || c == '\t');
  size_t i = 0;
  while (c != EOF && c != ' ' && c != '\n' && c != '\r' && c != '\t') {
    if (i + 1 < cap) buf[i++] = static_cast<char>(c);
    c = fgetc(f);
  }
  buf[i] = 0;
  return i > 0;
}

struct PfmHeader {
  int width = 0, height = 0, channels = 0;
  float scale = 0.f;
  long data_offset = 0;
};

int parse_pfm_header(FILE* f, PfmHeader* h) {
  char tok[64];
  if (!read_token(f, tok, sizeof tok)) return -2;
  if (strcmp(tok, "PF") == 0) h->channels = 3;
  else if (strcmp(tok, "Pf") == 0) h->channels = 1;
  else return -3;
  if (!read_token(f, tok, sizeof tok)) return -4;
  h->width = atoi(tok);
  if (!read_token(f, tok, sizeof tok)) return -5;
  h->height = atoi(tok);
  if (!read_token(f, tok, sizeof tok)) return -6;
  h->scale = static_cast<float>(atof(tok));
  if (h->width <= 0 || h->height <= 0) return -7;
  h->data_offset = ftell(f);
  return 0;
}

}  // namespace

extern "C" {

// Query PFM dimensions: out_dims = {height, width, channels}.
int sf_pfm_dims(const char* path, int32_t* out_dims) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  PfmHeader h;
  int rc = parse_pfm_header(f, &h);
  fclose(f);
  if (rc) return rc;
  out_dims[0] = h.height;
  out_dims[1] = h.width;
  out_dims[2] = h.channels;
  return 0;
}

// Decode a PFM into out[H*W*C] (row 0 = TOP row, i.e. already flipud'd —
// file stores bottom-up, utils/file_io.py:34-69 semantics).
int sf_read_pfm(const char* path, float* out, int64_t capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  PfmHeader h;
  int rc = parse_pfm_header(f, &h);
  if (rc) { fclose(f); return rc; }
  const int64_t row_elems = static_cast<int64_t>(h.width) * h.channels;
  const int64_t total = row_elems * h.height;
  if (total > capacity) { fclose(f); return -8; }
  const bool file_le = h.scale < 0.f;
  // read rows bottom-up into top-down output
  for (int r = 0; r < h.height; ++r) {
    float* dst = out + row_elems * (h.height - 1 - r);
    if (fread(dst, sizeof(float), row_elems, f) !=
        static_cast<size_t>(row_elems)) {
      fclose(f);
      return -9;
    }
  }
  fclose(f);
  if (file_le != host_is_little_endian()) byteswap_f32(out, total);
  return 0;
}

// Fused crop + (optional /255) + per-channel normalize:
//   out[y, x, c] = (img[oy+y, ox+x, c] * pre_scale - mean[c]) / stdv[c]
// img: H x W x C float32 row-major.
int sf_crop_normalize(const float* img, int32_t H, int32_t W, int32_t C,
                      int32_t oy, int32_t ox, int32_t ch, int32_t cw,
                      float pre_scale, const float* mean, const float* stdv,
                      float* out) {
  if (oy < 0 || ox < 0 || oy + ch > H || ox + cw > W) return -1;
  std::vector<float> inv(C);
  for (int c = 0; c < C; ++c) inv[c] = 1.f / stdv[c];
  for (int y = 0; y < ch; ++y) {
    const float* src = img + (static_cast<int64_t>(oy + y) * W + ox) * C;
    float* dst = out + static_cast<int64_t>(y) * cw * C;
    for (int x = 0; x < cw; ++x) {
      for (int c = 0; c < C; ++c) {
        dst[x * C + c] = (src[x * C + c] * pre_scale - mean[c]) * inv[c];
      }
    }
  }
  return 0;
}

// Batch PFM decode across threads: paths is n concatenated
// NUL-terminated strings; each output slot has `capacity` floats.
// results[i] receives the per-file return code.
int sf_read_pfm_batch(const char* paths, int32_t n, float* out,
                      int64_t capacity, int32_t* results,
                      int32_t num_threads) {
  std::vector<const char*> ptrs(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    ptrs[i] = p;
    p += strlen(p) + 1;
  }
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> workers;
  std::atomic<int> counter(0);
  for (int t = 0; t < num_threads; ++t) {
    workers.emplace_back([&]() {
      for (;;) {
        int i = counter.fetch_add(1);
        if (i >= n) break;
        results[i] = sf_read_pfm(ptrs[i], out + capacity * i, capacity);
      }
    });
  }
  for (auto& w : workers) w.join();
  for (int i = 0; i < n; ++i)
    if (results[i]) return results[i];
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// PNG decode (8-bit, non-interlaced; gray / RGB / gray+alpha / RGBA).
//
// The pipeline's measured floor after the fused transform is PNG decode
// (BENCHMARKS "input pipeline": 12.8 ms/image through PIL at 540x960).
// This is a lean zlib-inflate + unfilter decoder with no mode
// conversions, CRC checks or allocations beyond the inflate buffer.
// Palette (colortype 3), 16-bit and interlaced images return -20
// ("unsupported") and the Python side falls back to PIL
// (stereoformer_tpu/data/native.py: read_img_auto).
// ---------------------------------------------------------------------------

static inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

namespace {

struct PngInfo {
  int32_t w = 0, h = 0, channels = 0, bitdepth = 8;
  // concatenated IDAT payload
  std::vector<uint8_t> idat;
};

// parse = false: stop after IHDR (dims only).
int parse_png(const char* path, PngInfo* info, bool want_data) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz < 45) { fclose(f); return -2; }
  std::vector<uint8_t> buf;
  if (want_data) {
    buf.resize(sz);
    if (fread(buf.data(), 1, sz, f) != size_t(sz)) { fclose(f); return -3; }
    fclose(f);
  } else {
    buf.resize(64 < sz ? 64 : sz);
    if (fread(buf.data(), 1, buf.size(), f) != buf.size()) {
      fclose(f);
      return -3;
    }
    fclose(f);
  }
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (memcmp(buf.data(), sig, 8) != 0) return -4;
  size_t off = 8;
  bool have_ihdr = false;
  while (off + 8 <= buf.size()) {
    uint32_t len = be32(&buf[off]);
    const uint8_t* type = &buf[off + 4];
    const uint8_t* data = &buf[off + 8];
    if (!want_data || off + 12 + len > buf.size()) {
      // dims-only read may not have the whole chunk in the 64-byte head
      if (!memcmp(type, "IHDR", 4) && off + 8 + 13 <= buf.size()) {
        // fallthrough to IHDR handling below
      } else if (!want_data) {
        return have_ihdr ? 0 : -5;
      } else {
        return -5;
      }
    }
    if (!memcmp(type, "IHDR", 4)) {
      if (len != 13) return -5;
      uint32_t w32 = be32(data), h32 = be32(data + 4);
      // Bounds: reject dims that overflow int32 and decompression-bomb
      // sized images (h*w*channels capped at 2^31 below, channels<=4 so
      // 2^29 pixels) — return -20 so callers fall back to PIL, which has
      // its own bomb guard.
      if (w32 == 0 || h32 == 0 || w32 > 0x7fffffffu || h32 > 0x7fffffffu ||
          uint64_t(w32) * uint64_t(h32) > (uint64_t(1) << 29)) {
        return -20;
      }
      info->w = int32_t(w32);
      info->h = int32_t(h32);
      int bitdepth = data[8], colortype = data[9];
      int interlace = data[12];
      if (interlace != 0) return -20;
      // 16-bit: single-channel gray only (the KITTI disparity format)
      if (bitdepth == 16 && colortype != 0) return -20;
      if (bitdepth != 8 && bitdepth != 16) return -20;
      info->bitdepth = bitdepth;
      switch (colortype) {
        case 0: info->channels = 1; break;
        case 2: info->channels = 3; break;
        case 4: info->channels = 2; break;
        case 6: info->channels = 4; break;
        default: return -20;  // palette / unknown -> PIL fallback
      }
      have_ihdr = true;
      if (!want_data) return 0;
    } else if (!memcmp(type, "IDAT", 4)) {
      info->idat.insert(info->idat.end(), data, data + len);
    } else if (!memcmp(type, "IEND", 4)) {
      break;
    }
    off += 12 + size_t(len);
  }
  if (!have_ihdr) return -5;
  if (want_data && info->idat.empty()) return -6;
  return 0;
}

static inline uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

// Undo PNG scanline filters (bytewise, bpp bytes per pixel): raw holds
// h x (1 + stride) filtered rows, out receives h x stride image bytes.
int unfilter_scanlines(const uint8_t* raw, uint8_t* out, int64_t h,
                       int64_t stride, int bpp) {
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t filter = raw[size_t(y) * (stride + 1)];
    const uint8_t* src = raw + size_t(y) * (stride + 1) + 1;
    uint8_t* dst = out + y * stride;
    const uint8_t* up = y ? out + (y - 1) * stride : nullptr;
    switch (filter) {
      case 0:
        memcpy(dst, src, size_t(stride));
        break;
      case 1:
        for (int64_t x = 0; x < stride; ++x)
          dst[x] = uint8_t(src[x] + (x >= bpp ? dst[x - bpp] : 0));
        break;
      case 2:
        if (up)
          for (int64_t x = 0; x < stride; ++x) dst[x] = uint8_t(src[x] + up[x]);
        else
          memcpy(dst, src, size_t(stride));
        break;
      case 3:
        for (int64_t x = 0; x < stride; ++x) {
          int a = x >= bpp ? dst[x - bpp] : 0;
          int b = up ? up[x] : 0;
          dst[x] = uint8_t(src[x] + ((a + b) >> 1));
        }
        break;
      case 4:
        for (int64_t x = 0; x < stride; ++x) {
          int a = x >= bpp ? dst[x - bpp] : 0;
          int b = up ? up[x] : 0;
          int cc = (up && x >= bpp) ? up[x - bpp] : 0;
          dst[x] = uint8_t(src[x] + paeth(a, b, cc));
        }
        break;
      default:
        return -10;
    }
  }
  return 0;
}

// Concatenated-IDAT -> unfiltered image bytes.
int inflate_and_unfilter(const std::vector<uint8_t>& idat, uint8_t* out,
                         int64_t h, int64_t stride, int bpp) {
  std::vector<uint8_t> raw(size_t(h) * (stride + 1));
  z_stream zs;
  memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return -8;
  zs.next_in = const_cast<uint8_t*>(idat.data());
  zs.avail_in = uInt(idat.size());
  zs.next_out = raw.data();
  zs.avail_out = uInt(raw.size());
  int zrc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (zrc != Z_STREAM_END || zs.total_out != raw.size()) return -9;
  return unfilter_scanlines(raw.data(), out, h, stride, bpp);
}

}  // namespace

extern "C" {

// dims[3] <- {h, w, channels}.  -20 = valid PNG but unsupported layout
// (caller should fall back to PIL).
int sf_png_dims(const char* path, int32_t* dims) {
  PngInfo info;
  int rc = parse_png(path, &info, /*want_data=*/false);
  if (rc) return rc;
  dims[0] = info.h;
  dims[1] = info.w;
  dims[2] = info.channels;
  dims[3] = info.bitdepth;
  return 0;
}

// out: h*w*channels bytes, scanline order, native channel count.
int sf_read_png(const char* path, uint8_t* out, int64_t capacity) {
  PngInfo info;
  int rc = parse_png(path, &info, /*want_data=*/true);
  if (rc) return rc;
  if (info.bitdepth != 8) return -20;
  const int64_t w = info.w, h = info.h, c = info.channels;
  if (capacity < h * w * c) return -7;
  return inflate_and_unfilter(info.idat, out, h, w * c, int(c));
}


// 16-bit grayscale PNG (the KITTI disparity encoding: uint16 / 256.0).
// out: h*w uint16 in host byte order.
int sf_read_png_u16(const char* path, uint16_t* out, int64_t capacity) {
  PngInfo info;
  int rc = parse_png(path, &info, /*want_data=*/true);
  if (rc) return rc;
  if (info.bitdepth != 16 || info.channels != 1) return -20;
  const int64_t w = info.w, h = info.h;
  if (capacity < h * w) return -7;
  // filters operate on bytes with bpp = 2; big-endian sample assembly
  std::vector<uint8_t> img(size_t(h) * w * 2);
  rc = inflate_and_unfilter(info.idat, img.data(), h, w * 2, 2);
  if (rc) return rc;
  for (int64_t i = 0; i < h * w; ++i)
    out[i] = uint16_t((uint16_t(img[2 * i]) << 8) | img[2 * i + 1]);
  return 0;
}

}  // extern "C"
