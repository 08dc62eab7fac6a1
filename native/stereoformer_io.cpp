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
