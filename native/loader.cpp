// lavender-tpu native data plane: TSV seek + base64 + JPEG decode + resize.
//
// Replaces the CPU-bound Python data path (reference: utils/tsv_file.py seek
// + dataset.py str2img cv2 decode + visbackbone/video_transform.py resize /
// crop) with an mmap'd reader and a parallel clip decoder, exposed through a
// plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC loader.cpp -o liblvt.so -ljpeg -lpthread
//
// Output frames are uint8 RGB [S, S, 3]; normalization happens on-device
// (lavender_tpu/data/transforms.py device_normalize) so host->device traffic
// stays uint8.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

#include <jpeglib.h>

namespace {

// ---------- base64 ----------

static int8_t B64_LUT[256];
static bool b64_init_done = false;

void b64_init() {
  if (b64_init_done) return;
  for (int i = 0; i < 256; i++) B64_LUT[i] = -1;
  const char* a = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
  for (int i = 0; i < 64; i++) B64_LUT[(uint8_t)a[i]] = (int8_t)i;
  b64_init_done = true;
}

// decode [src, src+len) into out; returns decoded size or -1
long b64_decode(const char* src, long len, uint8_t* out) {
  long o = 0;
  uint32_t acc = 0;
  int nbits = 0;
  for (long i = 0; i < len; i++) {
    char c = src[i];
    if (c == '=' || c == '\n' || c == '\r') continue;
    int8_t v = B64_LUT[(uint8_t)c];
    if (v < 0) return -1;
    acc = (acc << 6) | (uint32_t)v;
    nbits += 6;
    if (nbits >= 8) {
      nbits -= 8;
      out[o++] = (uint8_t)((acc >> nbits) & 0xFF);
    }
  }
  return o;
}

// ---------- jpeg ----------

struct JErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jerr_exit(j_common_ptr cinfo) {
  JErr* e = (JErr*)cinfo->err;
  longjmp(e->jb, 1);
}

// decode JPEG bytes to RGB; caller frees *out with free()
bool jpeg_decode(const uint8_t* data, long size, uint8_t** out, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jerr_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, (unsigned long)size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  // 4-byte RGBX pixels (Pillow's internal RGB layout): the resize MAC
  // loops vectorize 4-wide, which is where Pillow's resample speed
  // comes from.  libjpeg-turbo emits RGBX directly; plain libjpeg
  // falls back to RGB + row expand.
#ifdef JCS_EXT_RGBX
  cinfo.out_color_space = JCS_EXT_RGBX;
  const bool direct_rgbx = true;
#else
  cinfo.out_color_space = JCS_RGB;
  const bool direct_rgbx = false;
#endif
  jpeg_start_decompress(&cinfo);
  *w = (int)cinfo.output_width;
  *h = (int)cinfo.output_height;
  uint8_t* buf = (uint8_t*)malloc((size_t)(*w) * (*h) * 4);
  if (!buf) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  std::vector<uint8_t> rowbuf;
  if (!direct_rgbx) rowbuf.resize((size_t)(*w) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* dst = buf + (size_t)cinfo.output_scanline * (*w) * 4;
    if (direct_rgbx) {
      jpeg_read_scanlines(&cinfo, &dst, 1);
    } else {
      uint8_t* row = rowbuf.data();
      jpeg_read_scanlines(&cinfo, &row, 1);
      for (int x = 0; x < *w; x++) {
        dst[4 * x + 0] = row[3 * x + 0];
        dst[4 * x + 1] = row[3 * x + 1];
        dst[4 * x + 2] = row[3 * x + 2];
        dst[4 * x + 3] = 0;
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out = buf;
  return true;
}

// ---------- resize (bilinear, uint8 RGB) ----------

// BIT-EXACT Pillow Image.BILINEAR resampling (Resample.c): triangle filter
// whose support widens to the scale factor when downscaling, coefficients
// quantized to int32 at PRECISION_BITS, horizontal-then-vertical passes
// with the INTERMEDIATE clipped to uint8 per pass (exactly like Pillow's
// ImagingResampleHorizontal_8bpc / Vertical_8bpc).  The Python data path
// (transforms.resize_shorter) is PIL, so exactness here makes the native
// plane frame-for-frame identical to it (asserted by test_e2e_parity /
// test_native).
static const int PRECISION_BITS = 32 - 8 - 2;

struct FilterWeights {
  std::vector<int> bounds;    // [out] first source index
  std::vector<int> counts;    // [out] number of taps
  std::vector<int> weights;   // [out * max_taps] fixed-point coeffs
  int max_taps = 0;
};

FilterWeights triangle_weights(int in_size, int out_size) {
  FilterWeights fw;
  double scale = (double)in_size / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;  // bilinear radius = 1
  int max_taps = (int)std::ceil(support) * 2 + 1;
  fw.max_taps = max_taps;
  fw.bounds.resize(out_size);
  fw.counts.resize(out_size);
  fw.weights.assign((size_t)out_size * max_taps, 0);
  std::vector<double> wbuf(max_taps);
  for (int i = 0; i < out_size; i++) {
    double center = (i + 0.5) * scale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double sum = 0.0;
    for (int j = xmin; j < xmax; j++) {
      double w = (j + 0.5 - center) / filterscale;
      w = w < 0 ? 1.0 + w : 1.0 - w;  // triangle
      if (w < 0) w = 0;
      wbuf[j - xmin] = w;
      sum += w;
    }
    for (int j = 0; j < xmax - xmin; j++) {
      double v = sum > 0 ? wbuf[j] / sum : wbuf[j];
      // Pillow normalize_coeffs_8bpc rounding
      v *= (double)(1 << PRECISION_BITS);
      fw.weights[(size_t)i * max_taps + j] =
          v < 0 ? (int)(v - 0.5) : (int)(v + 0.5);
    }
    fw.bounds[i] = xmin;
    fw.counts[i] = xmax - xmin;
  }
  return fw;
}

// int32 accumulation is safe exactly like Pillow's 8bpc path: the
// normalized coefficients sum to 1 << PRECISION_BITS (2^22), so
// |acc| <= 255 * 2^22 + 2^21 < 2^31.  int32 (vs int64) keeps the MAC
// loops SIMD-vectorizable — measured 4x on the 1-core host.
static inline uint8_t clip8(int32_t ss) {
  ss >>= PRECISION_BITS;
  return (uint8_t)(ss < 0 ? 0 : (ss > 255 ? 255 : ss));
}

// 4-channel (RGBX) resize: per-pixel int32 accumulator vector of width
// 4 — the j-loop body is a contiguous 4-byte load + 4 MACs, which the
// compiler vectorizes (this is Pillow's own layout trick; its "RGB"
// images are stored 4 bytes/pixel).
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
                     int dh) {
  FilterWeights fx = triangle_weights(sw, dw);
  FilterWeights fy = triangle_weights(sh, dh);
  const int32_t half = 1 << (PRECISION_BITS - 1);
  // horizontal pass -> uint8 temp [sh, dw, 4] (Pillow clips per pass)
  std::vector<uint8_t> tmp((size_t)sh * dw * 4);
  for (int y = 0; y < sh; y++) {
    const uint8_t* row = src + (size_t)y * sw * 4;
    for (int x = 0; x < dw; x++) {
      const int* w = &fx.weights[(size_t)x * fx.max_taps];
      int x0 = fx.bounds[x], n = fx.counts[x];
      int32_t acc[4] = {half, half, half, half};
      for (int j = 0; j < n; j++) {
        const uint8_t* p = row + (size_t)(x0 + j) * 4;
        for (int c = 0; c < 4; c++) acc[c] += w[j] * p[c];
      }
      uint8_t* o = &tmp[((size_t)y * dw + x) * 4];
      for (int c = 0; c < 4; c++) o[c] = clip8(acc[c]);
    }
  }
  // vertical pass on the clipped intermediate -> uint8 out
  for (int y = 0; y < dh; y++) {
    const int* w = &fy.weights[(size_t)y * fy.max_taps];
    int y0 = fy.bounds[y], n = fy.counts[y];
    for (int x = 0; x < dw; x++) {
      int32_t acc[4] = {half, half, half, half};
      for (int j = 0; j < n; j++) {
        const uint8_t* p = &tmp[((size_t)(y0 + j) * dw + x) * 4];
        for (int c = 0; c < 4; c++) acc[c] += w[j] * p[c];
      }
      uint8_t* o = dst + ((size_t)y * dw + x) * 4;
      for (int c = 0; c < 4; c++) o[c] = clip8(acc[c]);
    }
  }
}

// Python round() parity (round-half-even): round(num/den), num>=0, den>0.
// transforms.resize_shorter uses int(round(size*w/h)) and center_crop uses
// int(round((d)/2.0)) — both are banker's rounding, NOT round-half-up
// ((d+1)/2 was a real 1-pixel crop shift for d % 4 == 1, caught by
// test_e2e_parity once the native plane went default-on).
static long round_half_even_div(long num, long den) {
  long q = num / den, r = num % den;
  if (2 * r > den) return q + 1;
  if (2 * r < den) return q;
  return (q % 2 == 0) ? q : q + 1;
}

// resize shorter side to `size`, then crop to size x size
// crop_mode: 0 = center, 1 = random (top/left from rng)
// input: RGBX 4-byte pixels (jpeg_decode); output: tightly packed RGB
bool frame_to_square(const uint8_t* rgb, int w, int h, int size, int crop_mode,
                     uint32_t rng, uint8_t* out) {
  int nw, nh;
  if (h <= w) {
    nh = size;
    nw = (int)round_half_even_div(2L * size * w, 2L * h);
    if (nw < 1) nw = 1;
  } else {
    nw = size;
    nh = (int)round_half_even_div(2L * size * h, 2L * w);
    if (nh < 1) nh = 1;
  }
  std::vector<uint8_t> resized;
  const uint8_t* rs;
  if (nw == w && nh == h) {
    rs = rgb;  // transforms.resize_shorter skips the no-op resize
  } else {
    resized.resize((size_t)nw * nh * 4);
    resize_bilinear(rgb, w, h, resized.data(), nw, nh);
    rs = resized.data();
  }
  int max_top = nh - size, max_left = nw - size;
  if (max_top < 0) max_top = 0;
  if (max_left < 0) max_left = 0;
  int top, left;
  if (crop_mode == 1) {
    top = max_top > 0 ? (int)(rng % (uint32_t)(max_top + 1)) : 0;
    left = max_left > 0 ? (int)((rng >> 16) % (uint32_t)(max_left + 1)) : 0;
  } else {
    top = (int)round_half_even_div(2L * max_top, 4L);   // round(d/2.0)
    left = (int)round_half_even_div(2L * max_left, 4L);
  }
  for (int y = 0; y < size; y++) {
    const uint8_t* src_row = rs + ((size_t)(y + top) * nw + left) * 4;
    uint8_t* dst_row = out + (size_t)y * size * 3;
    for (int x = 0; x < size; x++) {
      dst_row[3 * x + 0] = src_row[4 * x + 0];
      dst_row[3 * x + 1] = src_row[4 * x + 1];
      dst_row[3 * x + 2] = src_row[4 * x + 2];
    }
  }
  return true;
}

// ---------- TSV handle ----------

struct TsvHandle {
  int fd = -1;
  const char* data = nullptr;
  size_t size = 0;
};

struct Field {
  const char* ptr;
  long len;
};

// split a row starting at `offset` into tab fields (up to max_fields)
int split_row(const TsvHandle* t, long offset, Field* fields, int max_fields) {
  if (offset < 0 || (size_t)offset >= t->size) return -1;
  const char* p = t->data + offset;
  const char* end = t->data + t->size;
  int n = 0;
  const char* start = p;
  while (p < end && *p != '\n') {
    if (*p == '\t') {
      if (n < max_fields) fields[n] = {start, p - start};
      n++;
      start = p + 1;
    }
    p++;
  }
  if (n < max_fields) fields[n] = {start, p - start};
  n++;
  return n;
}

uint32_t xorshift(uint32_t x) {
  x ^= x << 13;
  x ^= x >> 17;
  x ^= x << 5;
  return x;
}

}  // namespace

extern "C" {

void* lvt_tsv_open(const char* path) {
  b64_init();
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  void* m = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (m == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  TsvHandle* h = new TsvHandle();
  h->fd = fd;
  h->data = (const char*)m;
  h->size = (size_t)st.st_size;
  return h;
}

void lvt_tsv_close(void* handle) {
  TsvHandle* h = (TsvHandle*)handle;
  if (!h) return;
  munmap((void*)h->data, h->size);
  close(h->fd);
  delete h;
}

// number of tab-separated fields in the row at `offset` (for temporal
// sampling: frames = fields - meta_cols)
int lvt_row_num_fields(void* handle, long offset) {
  Field fields[1];
  TsvHandle* h = (TsvHandle*)handle;
  if (offset < 0 || (size_t)offset >= h->size) return -1;
  const char* p = h->data + offset;
  const char* end = h->data + h->size;
  int n = 1;
  while (p < end && *p != '\n') {
    if (*p == '\t') n++;
    p++;
  }
  return n;
}

// Decode one clip: selected frame columns of the row at `offset`.
// frame_cols: absolute field indices of the frames to decode.
// out: uint8 [n_frames, size, size, 3].  Returns 0 on success.
int lvt_decode_clip(void* handle, long offset, const int* frame_cols,
                    int n_frames, int size, int crop_mode, uint32_t seed,
                    uint8_t* out) {
  TsvHandle* h = (TsvHandle*)handle;
  const int MAXF = 512;
  Field fields[MAXF];
  int nf = split_row(h, offset, fields, MAXF);
  if (nf < 0) return -1;
  // same crop window for all frames of the clip (vid_* transforms)
  uint32_t rng = xorshift(seed ? seed : 0x9E3779B9u);
  std::vector<uint8_t> b64buf;
  for (int i = 0; i < n_frames; i++) {
    int col = frame_cols[i];
    if (col < 0 || col >= nf || col >= MAXF) return -2;
    const Field& f = fields[col];
    b64buf.resize((size_t)(f.len * 3 / 4 + 8));
    long raw = b64_decode(f.ptr, f.len, b64buf.data());
    if (raw <= 0) return -3;
    uint8_t* rgb = nullptr;
    int w = 0, hh = 0;
    if (!jpeg_decode(b64buf.data(), raw, &rgb, &w, &hh)) return -4;
    bool ok = frame_to_square(rgb, w, hh, size, crop_mode, rng,
                              out + (size_t)i * size * size * 3);
    free(rgb);
    if (!ok) return -5;
  }
  return 0;
}

// Batched parallel decode: n_clips rows, each with n_frames frames.
// offsets: [n_clips]; frame_cols: [n_clips * n_frames];
// out: [n_clips, n_frames, size, size, 3].  Returns 0 iff all succeed.
int lvt_decode_batch(void* handle, const long* offsets, const int* frame_cols,
                     int n_clips, int n_frames, int size, int crop_mode,
                     uint32_t seed, int n_threads, uint8_t* out) {
  std::atomic<int> next(0), err(0);
  size_t clip_bytes = (size_t)n_frames * size * size * 3;
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n_clips) return;
      int r = lvt_decode_clip(handle, offsets[i], frame_cols + (size_t)i * n_frames,
                              n_frames, size, crop_mode,
                              seed ? seed + (uint32_t)i * 2654435761u : 0,
                              out + (size_t)i * clip_bytes);
      if (r != 0) err.store(r);
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; t++) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return err.load();
}

}  // extern "C"
