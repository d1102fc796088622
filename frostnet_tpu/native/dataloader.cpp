// Native data loader: threaded JPEG decode + augment + normalize.
//
// TPU-native equivalent of torch's DataLoader worker pool (the reference's
// host-side data path, SURVEY.md §2.6 last row): N worker threads decode
// JPEGs with libjpeg, apply train augmentation (random resized crop + hflip)
// or eval resize+center-crop, normalize to NHWC float32, and publish whole
// batches into a bounded ring the Python side drains via ctypes. Keeping the
// decode in C++ threads sidesteps the GIL so the TPU step never waits on
// input.
//
// C ABI:
//   void* fndl_create(const char** paths, const int* labels, long n,
//                     int batch, int out_hw, int threads, int train,
//                     unsigned seed, int queue_depth,
//                     const float* mean, const float* std, int out_uint8);
//   int   fndl_next(void* h, void* images, int* labels);  // 1 ok, 0 end
//   void  fndl_destroy(void* h);
//   long  fndl_batches_per_epoch(void* h);
//
// out_uint8=1 emits raw resized uint8 RGB (4x smaller host->device
// transfers; mean/std normalization then runs on-device, fused into the
// jitted step) — the TPU-native layout. out_uint8=0 keeps normalized f32.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode a JPEG file to RGB8. Returns false on failure.
bool decode_jpeg(const std::string& path, std::vector<unsigned char>& rgb,
                 int* w, int* h) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb.resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear sample from an RGB8 crop region into out_hw x out_hw RGB:
// normalized float32 (u8_out=nullptr) or raw uint8 (u8_out set).
void resample_normalize(const unsigned char* src, int sw, int sh,
                        float x0, float y0, float cw, float ch, bool hflip,
                        int out_hw, const float* mean, const float* stdv,
                        float* dst, unsigned char* u8_out) {
  for (int oy = 0; oy < out_hw; ++oy) {
    float sy = y0 + (oy + 0.5f) * ch / out_hw - 0.5f;
    if (sy < 0) sy = 0;
    if (sy > sh - 1) sy = static_cast<float>(sh - 1);
    int iy = static_cast<int>(sy);
    int iy1 = iy + 1 < sh ? iy + 1 : sh - 1;
    float fy = sy - iy;
    for (int ox = 0; ox < out_hw; ++ox) {
      int oxx = hflip ? (out_hw - 1 - ox) : ox;
      float sx = x0 + (oxx + 0.5f) * cw / out_hw - 0.5f;
      if (sx < 0) sx = 0;
      if (sx > sw - 1) sx = static_cast<float>(sw - 1);
      int ix = static_cast<int>(sx);
      int ix1 = ix + 1 < sw ? ix + 1 : sw - 1;
      float fx = sx - ix;
      const unsigned char* p00 = src + (static_cast<size_t>(iy) * sw + ix) * 3;
      const unsigned char* p01 = src + (static_cast<size_t>(iy) * sw + ix1) * 3;
      const unsigned char* p10 = src + (static_cast<size_t>(iy1) * sw + ix) * 3;
      const unsigned char* p11 = src + (static_cast<size_t>(iy1) * sw + ix1) * 3;
      size_t off = (static_cast<size_t>(oy) * out_hw + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - fy) * ((1 - fx) * p00[c] + fx * p01[c]) +
                  fy * ((1 - fx) * p10[c] + fx * p11[c]);
        if (u8_out) {
          float r = v + 0.5f;
          u8_out[off + c] = static_cast<unsigned char>(
              r < 0 ? 0 : (r > 255 ? 255 : r));
        } else {
          dst[off + c] = (v / 255.0f - mean[c]) / stdv[c];
        }
      }
    }
  }
}

struct Batch {
  std::vector<unsigned char> images;  // raw bytes: f32 or u8 elements
  std::vector<int> labels;
};

struct Loader {
  std::vector<std::string> paths;
  std::vector<int> labels;
  int batch, out_hw, threads, queue_depth;
  bool train;
  bool out_uint8 = false;
  unsigned seed;
  float mean[3], stdv[3];

  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_put, cv_get;
  std::queue<Batch> ready;
  std::atomic<long> next_batch{0};
  long delivered = 0;  // batches handed to the consumer; guarded by mu
  long total_batches = 0;
  std::atomic<bool> stop{false};
  std::vector<long> order;

  void worker_main(int wid) {
    std::mt19937 rng(seed * 9176 + wid);
    std::uniform_real_distribution<float> u01(0.f, 1.f);
    while (!stop.load()) {
      long b = next_batch.fetch_add(1);
      if (b >= total_batches) break;
      Batch out;
      const size_t px = static_cast<size_t>(out_hw) * out_hw * 3;
      const size_t elt = out_uint8 ? 1 : sizeof(float);
      out.images.resize(static_cast<size_t>(batch) * px * elt);
      out.labels.resize(batch);
      for (int i = 0; i < batch; ++i) {
        long idx = order[(b * batch + i) % static_cast<long>(paths.size())];
        out.labels[i] = labels[idx];
        std::vector<unsigned char> rgb;
        int w = 0, h = 0;
        unsigned char* raw = out.images.data() + static_cast<size_t>(i) * px * elt;
        float* dst_f = out_uint8 ? nullptr : reinterpret_cast<float*>(raw);
        unsigned char* dst_u8 = out_uint8 ? raw : nullptr;
        if (!decode_jpeg(paths[idx], rgb, &w, &h) || w < 2 || h < 2) {
          std::memset(raw, 0, px * elt);
          continue;
        }
        if (train) {
          float scale = 0.7f + 0.3f * u01(rng);  // RandomResizedCrop-style
          float cw = w * scale, ch = h * scale;
          float x0 = u01(rng) * (w - cw);
          float y0 = u01(rng) * (h - ch);
          bool flip = u01(rng) < 0.5f;
          resample_normalize(rgb.data(), w, h, x0, y0, cw, ch, flip,
                             out_hw, mean, stdv, dst_f, dst_u8);
        } else {
          float side = static_cast<float>(w < h ? w : h) / 1.14f;  // resize+center crop
          float x0 = (w - side) / 2, y0 = (h - side) / 2;
          resample_normalize(rgb.data(), w, h, x0, y0, side, side, false,
                             out_hw, mean, stdv, dst_f, dst_u8);
        }
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_put.wait(lk, [&] { return static_cast<int>(ready.size()) < queue_depth || stop.load(); });
      if (stop.load()) break;
      ready.push(std::move(out));
      cv_get.notify_one();
    }
    std::unique_lock<std::mutex> lk(mu);
    cv_get.notify_all();
  }
};

}  // namespace

extern "C" {

void* fndl_create(const char** paths, const int* labels, long n, int batch,
                  int out_hw, int threads, int train, unsigned seed,
                  int queue_depth, const float* mean, const float* stdv,
                  int out_uint8) {
  auto* l = new Loader();
  l->out_uint8 = out_uint8 != 0;
  l->paths.reserve(n);
  l->labels.assign(labels, labels + n);
  for (long i = 0; i < n; ++i) l->paths.emplace_back(paths[i]);
  l->batch = batch;
  l->out_hw = out_hw;
  l->threads = threads;
  l->train = train != 0;
  l->seed = seed;
  l->queue_depth = queue_depth;
  std::memcpy(l->mean, mean, sizeof(float) * 3);
  std::memcpy(l->stdv, stdv, sizeof(float) * 3);
  l->total_batches = n / batch;
  l->order.resize(n);
  for (long i = 0; i < n; ++i) l->order[i] = i;
  if (l->train) {
    std::mt19937_64 rng(seed);
    std::shuffle(l->order.begin(), l->order.end(), rng);
  }
  for (int t = 0; t < threads; ++t)
    l->workers.emplace_back(&Loader::worker_main, l, t);
  return l;
}

long fndl_batches_per_epoch(void* h) {
  return static_cast<Loader*>(h)->total_batches;
}

int fndl_next(void* h, void* images, int* labels_out) {
  auto* l = static_cast<Loader*>(h);
  std::unique_lock<std::mutex> lk(l->mu);
  // End-of-epoch = all batches DELIVERED, not all batches CLAIMED: workers
  // bump next_batch when they claim work, before decoding/pushing it, so a
  // claimed-based predicate can fire with batches still in flight and drop
  // them (observed as a flaky short epoch under CPU contention).
  l->cv_get.wait(lk, [&] {
    return !l->ready.empty() || l->delivered >= l->total_batches ||
           l->stop.load();
  });
  if (l->ready.empty()) return 0;
  Batch b = std::move(l->ready.front());
  l->ready.pop();
  ++l->delivered;
  l->cv_put.notify_one();
  lk.unlock();
  std::memcpy(images, b.images.data(), b.images.size());
  std::memcpy(labels_out, b.labels.data(), b.labels.size() * sizeof(int));
  return 1;
}

void fndl_destroy(void* h) {
  auto* l = static_cast<Loader*>(h);
  l->stop.store(true);
  l->cv_put.notify_all();
  l->cv_get.notify_all();
  for (auto& t : l->workers) t.join();
  delete l;
}

}  // extern "C"
