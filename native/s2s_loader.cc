// s2s_loader — native tile decode + resize batch loader.
//
// TPU-native replacement for the host hot loop the reference runs in torch
// DataLoader worker *processes* (cv2.imread + resize per tile,
// /root/reference/src/data/paired_data_module.py:162-211). Here one extern-C
// call decodes and resizes a whole batch of tiles into a caller-provided
// contiguous uint8 buffer using an internal C++ thread pool — no Python
// object churn, no GIL (ctypes releases it for the duration of the call),
// one memcpy-free handoff to the device feed.
//
// Formats: PNG (libpng), JPEG (libjpeg). Resize: bilinear or nearest
// (nearest for masks keeps class ids exact). Grayscale decodes replicate to
// RGB unless channels==1 is requested.
//
// Build: make -C native   (produces libs2s_loader.so; loaded via ctypes by
// stain2stain_tpu/data/native.py)

#include <cstddef>
#include <cstdio>

// jpeglib.h needs size_t/FILE declared first (it does not include headers).
#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> data;  // H*W*C
  int h = 0, w = 0, c = 0;
};

// ----------------------------------------------------------------- PNG decode
bool decode_png(const uint8_t* buf, size_t len, Image* out) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) return false;
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, len)) return false;
  image.format = PNG_FORMAT_RGB;
  out->h = image.height;
  out->w = image.width;
  out->c = 3;
  out->data.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, out->data.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

// ---------------------------------------------------------------- JPEG decode
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(const uint8_t* buf, size_t len, Image* out) {
  if (len < 3 || buf[0] != 0xFF || buf[1] != 0xD8) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = 3;
  out->data.resize(size_t(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (len <= 0) {
    std::fclose(f);
    return false;
  }
  out->resize(len);
  size_t got = std::fread(out->data(), 1, len, f);
  std::fclose(f);
  return got == size_t(len);
}

bool decode_file(const char* path, Image* out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return false;
  if (decode_png(buf.data(), buf.size(), out)) return true;
  return decode_jpeg(buf.data(), buf.size(), out);
}

// --------------------------------------------------------------------- resize
// dst: size x size x out_c. Bilinear for images, nearest for masks.
void resize_into(const Image& img, uint8_t* dst, int size, int out_c, bool nearest) {
  const int src_c = img.c;
  const float sy = float(img.h) / size;
  const float sx = float(img.w) / size;
  for (int y = 0; y < size; ++y) {
    for (int x = 0; x < size; ++x) {
      uint8_t* px = dst + (size_t(y) * size + x) * out_c;
      if (nearest || (img.h == size && img.w == size)) {
        int iy = std::min(int(y * sy), img.h - 1);
        int ix = std::min(int(x * sx), img.w - 1);
        const uint8_t* sp = img.data.data() + (size_t(iy) * img.w + ix) * src_c;
        for (int ch = 0; ch < out_c; ++ch) px[ch] = sp[std::min(ch, src_c - 1)];
      } else {
        // bilinear with half-pixel centers (cv2 INTER_LINEAR convention)
        float fy = (y + 0.5f) * sy - 0.5f;
        float fx = (x + 0.5f) * sx - 0.5f;
        fy = std::max(0.0f, std::min(fy, float(img.h - 1)));
        fx = std::max(0.0f, std::min(fx, float(img.w - 1)));
        int y0 = int(fy), x0 = int(fx);
        int y1 = std::min(y0 + 1, img.h - 1), x1 = std::min(x0 + 1, img.w - 1);
        float wy = fy - y0, wx = fx - x0;
        for (int ch = 0; ch < out_c; ++ch) {
          int sc = std::min(ch, src_c - 1);
          float v00 = img.data[(size_t(y0) * img.w + x0) * src_c + sc];
          float v01 = img.data[(size_t(y0) * img.w + x1) * src_c + sc];
          float v10 = img.data[(size_t(y1) * img.w + x0) * src_c + sc];
          float v11 = img.data[(size_t(y1) * img.w + x1) * src_c + sc];
          float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                    v10 * wy * (1 - wx) + v11 * wy * wx;
          px[ch] = uint8_t(v + 0.5f);
        }
      }
    }
  }
}

// ---------------------------------------------------------------- thread pool
class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~Pool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

Pool* pool(int n_threads) {
  static Pool* p = new Pool(n_threads > 0 ? n_threads : int(std::thread::hardware_concurrency()));
  return p;
}

}  // namespace

extern "C" {

// Decode + resize a batch of image files into out[n, size, size, channels]
// (uint8, contiguous). paths: array of n C strings. nearest: 0/1.
// Returns the number of successfully decoded images; failed slots are zeroed.
int s2s_decode_batch(const char** paths, int n, uint8_t* out, int size,
                     int channels, int nearest, int n_threads) {
  std::atomic<int> ok{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  Pool* p = pool(n_threads);
  const size_t stride = size_t(size) * size * channels;
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      Image img;
      uint8_t* dst = out + size_t(i) * stride;
      if (decode_file(paths[i], &img)) {
        resize_into(img, dst, size, channels, nearest != 0);
        ok.fetch_add(1);
      } else {
        std::memset(dst, 0, stride);
      }
      if (done.fetch_add(1) + 1 == n) {
        std::unique_lock<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return ok.load();
}

// Single-image probe: returns 1 on success and writes (h, w) into dims.
int s2s_probe(const char* path, int* dims) {
  Image img;
  if (!decode_file(path, &img)) return 0;
  dims[0] = img.h;
  dims[1] = img.w;
  return 1;
}

}  // extern "C"
