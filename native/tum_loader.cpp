// Native TUM RGB-D dataset loader: PNG decode + prefetch thread pool.
//
// Replaces the reference driver's synchronous per-frame cv::imread +
// cvtColor + convertTo (test/src/test.cpp:75-83, src/tracking.cpp:
// 96-118) with a C++ loader that decodes and preprocesses frames on
// background threads while the device computes — the host-side "data
// loader" role of the framework.  Python binds via ctypes
// (ydorbslam_tpu/io/native_loader.py).
//
// Scope: non-interlaced 8-bit grayscale/RGB/RGBA PNGs (TUM rgb) and
// 16-bit grayscale PNGs (TUM depth).  Output is SENSOR-NATIVE: uint8
// grayscale (Rec.601 luma, matching cv::cvtColor BGR2GRAY) and raw
// uint16 depth -- the device applies 1/DepthMapFactor
// (src/tracking.cpp:108-114 analog lives in slam/pipeline.py).  This
// matches ydorbslam_tpu.io.TumRgbdDataset exactly and ships 3x less
// host->device data than float32.
//
// Build: g++ -O3 -shared -fPIC tum_loader.cpp -o libtumloader.so -lz -lpthread

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int width = 0, height = 0, channels = 0, bit_depth = 0;
  std::vector<uint8_t> data;  // raw, big-endian 16-bit if bit_depth==16
};

uint32_t read_be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool decode_png(const std::string& path, Image& out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                           std::istreambuf_iterator<char>());
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (buf.size() < 8 || std::memcmp(buf.data(), sig, 8) != 0) return false;

  size_t pos = 8;
  std::vector<uint8_t> idat;
  int color_type = -1, interlace = 0;
  while (pos + 8 <= buf.size()) {
    uint32_t len = read_be32(&buf[pos]);
    std::string type(reinterpret_cast<char*>(&buf[pos + 4]), 4);
    const uint8_t* payload = &buf[pos + 8];
    if (pos + 12 + len > buf.size()) return false;
    if (type == "IHDR") {
      out.width = read_be32(payload);
      out.height = read_be32(payload + 4);
      out.bit_depth = payload[8];
      color_type = payload[9];
      interlace = payload[12];
      if (interlace != 0) return false;  // interlaced PNGs unsupported
      switch (color_type) {
        case 0: out.channels = 1; break;
        case 2: out.channels = 3; break;
        case 4: out.channels = 2; break;
        case 6: out.channels = 4; break;
        default: return false;  // palette unsupported
      }
      if (out.bit_depth != 8 && out.bit_depth != 16) return false;
    } else if (type == "IDAT") {
      idat.insert(idat.end(), payload, payload + len);
    } else if (type == "IEND") {
      break;
    }
    pos += 12 + len;
  }
  if (out.width <= 0 || out.height <= 0 || idat.empty()) return false;

  const int bpp = out.channels * (out.bit_depth / 8);
  const size_t stride = size_t(out.width) * bpp;
  std::vector<uint8_t> raw((stride + 1) * out.height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    return false;
  }
  // Un-filter scanlines in place into `data`.
  out.data.assign(stride * out.height, 0);
  const uint8_t* prev = nullptr;
  for (int y = 0; y < out.height; ++y) {
    const uint8_t* src = &raw[size_t(y) * (stride + 1)];
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = &out.data[size_t(y) * stride];
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
      int b = prev ? prev[x] : 0;
      int c = (prev && x >= size_t(bpp)) ? prev[x - bpp] : 0;
      int v = src[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = uint8_t(v);
    }
    prev = dst;
  }
  return true;
}

void to_gray_u8(const Image& im, uint8_t* out) {
  const int n = im.width * im.height;
  if (im.channels == 1 && im.bit_depth == 8) {
    std::memcpy(out, im.data.data(), size_t(n));
  } else if (im.bit_depth == 8) {
    const int c = im.channels;
    for (int i = 0; i < n; ++i) {
      const uint8_t* p = &im.data[size_t(i) * c];
      // PNG stores RGB; Rec.601 luma (cv::cvtColor RGB2GRAY weights).
      float g = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
      out[i] = uint8_t(g + 0.5f);
    }
  } else {  // 16-bit gray: keep the high byte (scale, not clip)
    for (int i = 0; i < n; ++i) {
      uint16_t v = (uint16_t(im.data[2 * i]) << 8) | im.data[2 * i + 1];
      out[i] = uint8_t(v >> 8);
    }
  }
}

void to_depth_u16(const Image& im, uint16_t* out) {
  const int n = im.width * im.height;
  if (im.bit_depth == 16) {
    for (int i = 0; i < n; ++i) {
      out[i] = (uint16_t(im.data[2 * i]) << 8) | im.data[2 * i + 1];
    }
  } else {
    for (int i = 0; i < n; ++i) out[i] = im.data[i];
  }
}

struct Frame {
  double timestamp = 0;
  std::vector<uint8_t> gray;
  std::vector<uint16_t> depth;
  int width = 0, height = 0;
  bool ok = false;
};

struct Loader {
  std::string dir;
  float depth_factor = 5000.0f;  // retained for API compat; depth ships raw
  int lookahead = 4;
  std::vector<double> timestamps;
  std::vector<std::string> rgb_paths, depth_paths;

  std::deque<Frame> queue;
  std::mutex mu;
  std::condition_variable cv_has, cv_space;
  std::thread worker;
  std::atomic<bool> stop{false};
  size_t next_decode = 0;
  size_t in_flight = 0;  // frames grabbed by the worker, not yet queued

  void run() {
    while (!stop) {
      size_t idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop || (queue.size() < size_t(lookahead) &&
                          next_decode < timestamps.size());
        });
        if (stop || next_decode >= timestamps.size()) {
          if (next_decode >= timestamps.size()) return;
          continue;
        }
        idx = next_decode++;
        ++in_flight;
      }
      Frame fr;
      fr.timestamp = timestamps[idx];
      Image rgb, dep;
      fr.ok = decode_png(dir + "/" + rgb_paths[idx], rgb) &&
              decode_png(dir + "/" + depth_paths[idx], dep);
      if (fr.ok) {
        fr.width = rgb.width;
        fr.height = rgb.height;
        fr.gray.resize(size_t(rgb.width) * rgb.height);
        fr.depth.resize(size_t(dep.width) * dep.height);
        to_gray_u8(rgb, fr.gray.data());
        to_depth_u16(dep, fr.depth.data());
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        queue.push_back(std::move(fr));
        --in_flight;
      }
      cv_has.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* tum_loader_open(const char* sequence_dir, const char* assoc_path,
                      float depth_map_factor, int lookahead) {
  auto* L = new Loader;
  L->dir = sequence_dir;
  L->depth_factor = depth_map_factor;
  L->lookahead = lookahead > 0 ? lookahead : 4;
  std::ifstream f(assoc_path);
  if (!f) {
    delete L;
    return nullptr;
  }
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    double t_rgb, t_depth;
    std::string rgb, depth;
    if (ss >> t_rgb >> rgb >> t_depth >> depth) {
      L->timestamps.push_back(t_rgb);
      L->rgb_paths.push_back(rgb);
      L->depth_paths.push_back(depth);
    }
  }
  L->worker = std::thread([L] { L->run(); });
  return L;
}

int tum_loader_size(void* handle) {
  return int(static_cast<Loader*>(handle)->timestamps.size());
}

// Fills gray (uint8) / depth (raw uint16), width*height each.
// Returns 1 on success, 0 at end of sequence or decode failure.
int tum_loader_next(void* handle, double* timestamp, uint8_t* gray,
                    uint16_t* depth, int* width, int* height) {
  auto* L = static_cast<Loader*>(handle);
  Frame fr;
  {
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_has.wait(lk, [&] {
      // EOF only when everything dispatched AND delivered: a frame can
      // be mid-decode (grabbed but not yet queued).
      return L->stop || !L->queue.empty() ||
             (L->next_decode >= L->timestamps.size() && L->in_flight == 0);
    });
    if (L->queue.empty()) return 0;
    fr = std::move(L->queue.front());
    L->queue.pop_front();
  }
  L->cv_space.notify_one();
  if (!fr.ok) return 0;
  *timestamp = fr.timestamp;
  *width = fr.width;
  *height = fr.height;
  std::memcpy(gray, fr.gray.data(), fr.gray.size());
  std::memcpy(depth, fr.depth.data(), fr.depth.size() * sizeof(uint16_t));
  return 1;
}

void tum_loader_close(void* handle) {
  auto* L = static_cast<Loader*>(handle);
  L->stop = true;
  L->cv_space.notify_all();
  L->cv_has.notify_all();
  if (L->worker.joinable()) L->worker.join();
  delete L;
}

// Standalone single-image decode helpers (KITTI loaders reuse these).
int decode_png_gray_u8(const char* path, uint8_t* out, int max_pixels,
                       int* width, int* height) {
  Image im;
  if (!decode_png(path, im)) return 0;
  if (im.width * im.height > max_pixels) return 0;
  to_gray_u8(im, out);
  *width = im.width;
  *height = im.height;
  return 1;
}

int decode_png_depth_u16(const char* path, uint16_t* out, int max_pixels,
                         int* width, int* height) {
  Image im;
  if (!decode_png(path, im)) return 0;
  if (im.width * im.height > max_pixels) return 0;
  to_depth_u16(im, out);
  *width = im.width;
  *height = im.height;
  return 1;
}

}  // extern "C"
