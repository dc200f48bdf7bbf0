// oetr_tpu native data service: threaded JPEG decode + image preparation.
//
// The reference's data path is per-pair Python/cv2 (SURVEY.md §2.8); this
// library feeds the TPU with fixed-shape batches prepared by a C++ thread
// pool: decode (libjpeg) -> aspect-preserving resize -> pad-to-canvas +
// OETR-pass copy + scale bookkeeping, matching the semantics of
// oetr_tpu/data/images.py::prepare_image bit-for-bit modulo resampling
// kernel (bilinear here, cv2 INTER_AREA there).
//
// C ABI (ctypes-friendly); all outputs are caller-allocated.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode a JPEG buffer into an RGB u8 image. Returns 0 on success.
int decode_jpeg(const unsigned char* data, long size, std::vector<unsigned char>* out,
                int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*h) * (*w) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out->data() +
        static_cast<size_t>(cinfo.output_scanline) * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// float32 RGB -> float32 RGB resize. Column index/weight tables are
// precomputed so the inner loop is a fused horizontal lerp over
// contiguous rows (vectorizable by -O3).
void resize_bilinear_f(const float* __restrict in, int h, int w,
                       float* __restrict out, int oh, int ow) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  std::vector<int> x0s(ow), x1s(ow);
  std::vector<float> wxs(ow);
  for (int x = 0; x < ow; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int x0 = std::max(0, std::min(w - 1, static_cast<int>(std::floor(fx))));
    x0s[x] = x0;
    x1s[x] = std::min(w - 1, x0 + 1);
    wxs[x] = std::max(0.0f, std::min(1.0f, fx - x0));
  }
  std::vector<float> row(static_cast<size_t>(ow) * 3);
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, std::min(h - 1, static_cast<int>(std::floor(fy))));
    int y1 = std::min(h - 1, y0 + 1);
    float wy = std::max(0.0f, std::min(1.0f, fy - y0));
    const float* r0 = in + static_cast<size_t>(y0) * w * 3;
    const float* r1 = in + static_cast<size_t>(y1) * w * 3;
    float* o = out + static_cast<size_t>(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      const float wx = wxs[x];
      const float* a0 = r0 + x0s[x] * 3;
      const float* a1 = r0 + x1s[x] * 3;
      const float* b0 = r1 + x0s[x] * 3;
      const float* b1 = r1 + x1s[x] * 3;
      for (int c = 0; c < 3; ++c) {
        float top = a0[c] + wx * (a1[c] - a0[c]);
        float bot = b0[c] + wx * (b1[c] - b0[c]);
        o[x * 3 + c] = top + wy * (bot - top);
      }
    }
    (void)row;
  }
}

int prepare_from_rgb(const std::vector<unsigned char>& rgb, int h0, int w0,
                     int canvas_h, int canvas_w, int oetr_h, int oetr_w,
                     int resize_max, float* canvas, int* valid_hw,
                     float* oetr_img, float* oetr_scale,
                     float* scale_to_orig) {
  // Work copy as float.
  int h = h0, w = w0;
  std::vector<float> work(static_cast<size_t>(h) * w * 3);
  for (size_t i = 0; i < work.size(); ++i) work[i] = rgb[i] / 255.0f;
  float sx = 1.0f, sy = 1.0f;

  if (resize_max > 0 && std::max(h, w) > resize_max) {
    float r = static_cast<float>(resize_max) / std::max(h, w);
    int nh = static_cast<int>(std::lround(h * r));
    int nw = static_cast<int>(std::lround(w * r));
    std::vector<float> tmp(static_cast<size_t>(nh) * nw * 3);
    resize_bilinear_f(work.data(), h, w, tmp.data(), nh, nw);
    work.swap(tmp);
    sx = static_cast<float>(w0) / nw;
    sy = static_cast<float>(h0) / nh;
    h = nh;
    w = nw;
  }
  float fit = std::min({static_cast<float>(canvas_w) / w,
                        static_cast<float>(canvas_h) / h, 1.0f});
  if (fit < 1.0f) {
    int nh = static_cast<int>(h * fit);
    int nw = static_cast<int>(w * fit);
    std::vector<float> tmp(static_cast<size_t>(nh) * nw * 3);
    resize_bilinear_f(work.data(), h, w, tmp.data(), nh, nw);
    work.swap(tmp);
    sx /= fit;
    sy /= fit;
    h = nh;
    w = nw;
  }
  std::memset(canvas, 0, static_cast<size_t>(canvas_h) * canvas_w * 3 *
                              sizeof(float));
  for (int y = 0; y < h; ++y)
    std::memcpy(canvas + static_cast<size_t>(y) * canvas_w * 3,
                work.data() + static_cast<size_t>(y) * w * 3,
                static_cast<size_t>(w) * 3 * sizeof(float));
  valid_hw[0] = h;
  valid_hw[1] = w;
  resize_bilinear_f(work.data(), h, w, oetr_img, oetr_h, oetr_w);
  oetr_scale[0] = static_cast<float>(w) / oetr_w;
  oetr_scale[1] = static_cast<float>(h) / oetr_h;
  scale_to_orig[0] = sx;
  scale_to_orig[1] = sy;
  return 0;
}

int prepare_one(const char* path, int canvas_h, int canvas_w, int oetr_h,
                int oetr_w, int resize_max, float* canvas, int* valid_hw,
                float* oetr_img, float* oetr_scale, float* scale_to_orig) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> buf(size);
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return 1;
  }
  std::fclose(f);
  std::vector<unsigned char> rgb;
  int h, w;
  if (decode_jpeg(buf.data(), size, &rgb, &h, &w)) return 2;
  return prepare_from_rgb(rgb, h, w, canvas_h, canvas_w, oetr_h, oetr_w,
                          resize_max, canvas, valid_hw, oetr_img, oetr_scale,
                          scale_to_orig);
}

}  // namespace

extern "C" {

// Decode header only: fills h, w. Returns 0 on success.
int ods_jpeg_shape(const unsigned char* data, long size, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode a JPEG buffer into caller-allocated RGB u8 [h*w*3].
int ods_decode_jpeg(const unsigned char* data, long size, unsigned char* out,
                    int h, int w) {
  std::vector<unsigned char> rgb;
  int dh, dw;
  if (decode_jpeg(data, size, &rgb, &dh, &dw)) return 1;
  if (dh != h || dw != w) return 2;
  std::memcpy(out, rgb.data(), rgb.size());
  return 0;
}

// Prepare a single image file (see prepare_from_rgb).
int ods_prepare_image(const char* path, int canvas_h, int canvas_w,
                      int oetr_h, int oetr_w, int resize_max, float* canvas,
                      int* valid_hw, float* oetr_img, float* oetr_scale,
                      float* scale_to_orig) {
  return prepare_one(path, canvas_h, canvas_w, oetr_h, oetr_w, resize_max,
                     canvas, valid_hw, oetr_img, oetr_scale, scale_to_orig);
}

// Prepare a batch of image files with a thread pool. paths: n
// NUL-terminated strings concatenated. Outputs are contiguous batches.
// Returns the number of failures.
int ods_prepare_batch(const char* paths, int n, int canvas_h, int canvas_w,
                      int oetr_h, int oetr_w, int resize_max, int n_threads,
                      float* canvases, int* valid_hws, float* oetr_imgs,
                      float* oetr_scales, float* scale_to_origs) {
  std::vector<const char*> ptrs(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    ptrs[i] = p;
    p += std::strlen(p) + 1;
  }
  if (n_threads <= 0)
    // Oversubscribe: decode is partially IO-bound and per-image latency
    // hides behind the pool even on few cores.
    n_threads = std::max(4u, 2 * std::thread::hardware_concurrency());
  std::atomic<int> next(0), failures(0);
  const size_t canvas_sz = static_cast<size_t>(canvas_h) * canvas_w * 3;
  const size_t oetr_sz = static_cast<size_t>(oetr_h) * oetr_w * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = prepare_one(ptrs[i], canvas_h, canvas_w, oetr_h, oetr_w,
                           resize_max, canvases + i * canvas_sz,
                           valid_hws + i * 2, oetr_imgs + i * oetr_sz,
                           oetr_scales + i * 2, scale_to_origs + i * 2);
      if (rc != 0) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int nt = std::min(n_threads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
