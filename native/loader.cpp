// Native training-data loader: multi-threaded image decode + random crop +
// batch assembly, entirely outside the Python GIL.
//
// The reference feeds training from torch DataLoader worker *processes*
// running cv2 + numpy per sample (/root/reference/dataset.py:64-143,
// config.py:91).  Here the host-side hot path is a C++ thread pool that
// decodes PNG/JPEG files and writes uint8 RGB crops straight into the
// caller-provided batch buffer (which Python hands to jax.device_put) —
// no per-sample Python objects, no extra copies.
//
// C ABI (consumed by real_esrgan_tpu/data/native_loader.py via ctypes):
//   loader_create(num_threads) -> handle
//   loader_set_cache_budget(handle, bytes)       decoded-image RAM cache
//   loader_decode_crop_batch(handle, paths, n, crop, seed, out) -> 0 | -index-1
//   loader_cache_stats(handle, &entries, &bytes)
//   loader_destroy(handle)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <csetjmp>
#include <cstdio>
#include <functional>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include <png.h>
#include <jpeglib.h>

namespace {

// ---------------------------------------------------------------------------
// decoding
// ---------------------------------------------------------------------------

struct Image {
  int h = 0, w = 0;            // decoded size
  std::vector<uint8_t> rgb;    // h*w*3
};

bool decode_png(const char* path, Image* img) {
  png_image png;
  std::memset(&png, 0, sizeof(png));
  png.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&png, path)) return false;
  png.format = PNG_FORMAT_RGB;
  img->h = static_cast<int>(png.height);
  img->w = static_cast<int>(png.width);
  img->rgb.resize(PNG_IMAGE_SIZE(png));
  if (!png_image_finish_read(&png, nullptr, img->rgb.data(), 0, nullptr)) {
    png_image_free(&png);
    return false;
  }
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(const char* path, Image* img) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->h = static_cast<int>(cinfo.output_height);
  img->w = static_cast<int>(cinfo.output_width);
  img->rgb.resize(static_cast<size_t>(img->h) * img->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img->rgb.data()
        + static_cast<size_t>(cinfo.output_scanline) * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);
  return true;
}

bool has_suffix(const std::string& s, const char* suf) {
  std::string lower(s);
  for (auto& c : lower) c = static_cast<char>(std::tolower(c));
  std::string t(suf);
  return lower.size() >= t.size() &&
         lower.compare(lower.size() - t.size(), t.size(), t) == 0;
}

bool decode_any(const char* path, Image* img) {
  std::string p(path);
  if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg"))
    return decode_jpeg(path, img);
  if (has_suffix(p, ".png")) return decode_png(path, img);
  return decode_png(path, img) || decode_jpeg(path, img);
}

// reflect-101 index fold (matches cv2.BORDER_REFLECT_101 used by the
// Python fallback loader for too-small images)
inline int reflect101(int i, int n) {
  if (n == 1) return 0;
  while (i < 0 || i >= n) {
    if (i < 0) i = -i;
    if (i >= n) i = 2 * n - 2 - i;
  }
  return i;
}

void random_crop_into(const Image& img, int crop, uint64_t seed,
                      uint8_t* out) {
  std::mt19937_64 rng(seed);
  const int h = img.h, w = img.w;
  int top = 0, left = 0;
  if (h > crop) top = static_cast<int>(rng() % static_cast<uint64_t>(h - crop + 1));
  if (w > crop) left = static_cast<int>(rng() % static_cast<uint64_t>(w - crop + 1));
  for (int y = 0; y < crop; ++y) {
    const int sy = reflect101(top + y, h);
    if (left + crop <= w) {  // contiguous row fast path
      std::memcpy(out + static_cast<size_t>(y) * crop * 3,
                  img.rgb.data() + (static_cast<size_t>(sy) * w + left) * 3,
                  static_cast<size_t>(crop) * 3);
    } else {
      for (int x = 0; x < crop; ++x) {
        const int sx = reflect101(left + x, w);
        std::memcpy(out + (static_cast<size_t>(y) * crop + x) * 3,
                    img.rgb.data() + (static_cast<size_t>(sy) * w + sx) * 3, 3);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// persistent thread pool
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i)
      threads_.emplace_back([this] { worker(); });
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }

  void run(int n_tasks, const std::function<void(int)>& fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      fn_ = &fn;
      next_ = 0;
      total_ = n_tasks;
      done_ = 0;
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return done_ == total_; });
    fn_ = nullptr;
  }

 private:
  void worker() {
    for (;;) {
      const std::function<void(int)>* fn;
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || (fn_ && next_ < total_); });
        if (stop_) return;
        fn = fn_;
        idx = next_++;
      }
      (*fn)(idx);
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (++done_ == total_) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> threads_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  const std::function<void(int)>* fn_ = nullptr;
  int next_ = 0, total_ = 0, done_ = 0;
  bool stop_;
};

// ---------------------------------------------------------------------------
// decoded-image RAM cache
// ---------------------------------------------------------------------------
//
// Epoch loops re-decode the same files every pass; training sets of prepared
// crops are small (450 InEnv10 images ~= 216 MB decoded), so caching decoded
// RGB eliminates the decode cost from every epoch after the first.  First-fit
// with no eviction: deterministic, and a dataset larger than the budget still
// gets its head cached while the tail decodes as before.

class ImageCache {
 public:
  std::shared_ptr<const Image> get(const std::string& path) {
    std::lock_guard<std::mutex> lk(mu_);
    auto it = map_.find(path);
    return it == map_.end() ? nullptr : it->second;
  }

  void put(const std::string& path, const std::shared_ptr<const Image>& img) {
    const uint64_t sz = img->rgb.size() + path.size() + 64;
    std::lock_guard<std::mutex> lk(mu_);
    if (map_.count(path) || used_ + sz > budget_) return;
    used_ += sz;
    map_.emplace(path, img);
  }

  void set_budget(uint64_t bytes) {
    std::lock_guard<std::mutex> lk(mu_);
    budget_ = bytes;
  }

  void stats(uint64_t* entries, uint64_t* bytes) {
    std::lock_guard<std::mutex> lk(mu_);
    *entries = map_.size();
    *bytes = used_;
  }

 private:
  std::mutex mu_;
  uint64_t budget_ = 0, used_ = 0;
  std::unordered_map<std::string, std::shared_ptr<const Image>> map_;
};

struct Loader {
  Pool pool;
  ImageCache cache;
  explicit Loader(int n) : pool(n) {}
};

}  // namespace

extern "C" {

void* loader_create(int num_threads) {
  return new Loader(num_threads > 0 ? num_threads : 4);
}

void loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

void loader_set_cache_budget(void* handle, uint64_t bytes) {
  static_cast<Loader*>(handle)->cache.set_budget(bytes);
}

void loader_cache_stats(void* handle, uint64_t* entries, uint64_t* bytes) {
  static_cast<Loader*>(handle)->cache.stats(entries, bytes);
}

// Decode n files, random-crop each to (crop, crop, 3) uint8 RGB, write into
// out (n * crop * crop * 3 bytes).  Returns 0 on success, -(index+1) of the
// first failed file otherwise.
int loader_decode_crop_batch(void* handle, const char** paths, int n,
                             int crop, uint64_t seed, uint8_t* out) {
  auto* loader = static_cast<Loader*>(handle);
  std::atomic<int> failed(0);
  std::function<void(int)> task = [&](int i) {
    std::shared_ptr<const Image> img = loader->cache.get(paths[i]);
    if (!img) {
      auto fresh = std::make_shared<Image>();
      if (!decode_any(paths[i], fresh.get()) || fresh->h == 0 ||
          fresh->w == 0) {
        int expected = 0;
        failed.compare_exchange_strong(expected, -(i + 1));
        return;
      }
      img = fresh;
      loader->cache.put(paths[i], img);
    }
    random_crop_into(*img, crop, seed * 0x9E3779B97F4A7C15ULL + i,
                     out + static_cast<size_t>(i) * crop * crop * 3);
  };
  loader->pool.run(n, task);
  return failed.load();
}

}  // extern "C"
