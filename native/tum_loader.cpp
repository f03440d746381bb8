// Native TUM RGB-D sequence loader: PNG decode + prefetch ring buffer.
//
// The reference's runtime is native C++ (its driver decodes PNGs with OpenCV
// on the tracking thread, rgbd_tum.cc:118-119, stalling tracking on IO).
// Here the equivalent runtime component is a small C++ library that decodes
// ahead of the tracker on a background thread into a bounded ring buffer, so
// host IO overlaps device compute. Python binds via ctypes (no pybind11 in
// this image).
//
// Supports the PNG subset TUM sequences use: 8-bit RGB/RGBA/gray and 16-bit
// grayscale depth, non-interlaced, zlib-compressed (decoded with zlib).
//
// Build: native/build.sh  ->  native/libtumloader.so

#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  uint32_t width = 0, height = 0;
  uint8_t channels = 0;   // 1, 3 or 4
  uint8_t bit_depth = 0;  // 8 or 16
  std::vector<uint8_t> data;  // unfiltered scanlines, big-endian for 16-bit
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool decode_png(const std::string& path, Image* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::vector<uint8_t> buf((std::istreambuf_iterator<char>(f)),
                           std::istreambuf_iterator<char>());
  if (buf.size() < 8 || std::memcmp(buf.data(), "\x89PNG\r\n\x1a\n", 8) != 0)
    return false;
  size_t pos = 8;
  std::vector<uint8_t> idat;
  uint8_t color_type = 0;
  while (pos + 8 <= buf.size()) {
    uint32_t len = be32(&buf[pos]);
    std::string type(reinterpret_cast<char*>(&buf[pos + 4]), 4);
    const uint8_t* payload = &buf[pos + 8];
    if (type == "IHDR") {
      out->width = be32(payload);
      out->height = be32(payload + 4);
      out->bit_depth = payload[8];
      color_type = payload[9];
      if (payload[12] != 0) return false;  // interlaced unsupported
      out->channels = (color_type == 2) ? 3 : (color_type == 6) ? 4
                      : (color_type == 4) ? 2 : 1;
    } else if (type == "IDAT") {
      idat.insert(idat.end(), payload, payload + len);
    } else if (type == "IEND") {
      break;
    }
    pos += 12 + len;
  }
  if (out->width == 0 || (out->bit_depth != 8 && out->bit_depth != 16))
    return false;

  const size_t bpp = out->channels * (out->bit_depth / 8);
  const size_t stride = out->width * bpp;
  std::vector<uint8_t> raw((stride + 1) * out->height);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
    return false;

  out->data.assign(stride * out->height, 0);
  std::vector<uint8_t> prev(stride, 0);
  for (uint32_t y = 0; y < out->height; ++y) {
    const uint8_t* src = &raw[(stride + 1) * y];
    uint8_t filter = src[0];
    uint8_t* dst = &out->data[stride * y];
    for (size_t x = 0; x < stride; ++x) {
      int a = (x >= bpp) ? dst[x - bpp] : 0;
      int b = prev[x];
      int c = (x >= bpp) ? prev[x - bpp] : 0;
      int v = src[1 + x];
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
    std::memcpy(prev.data(), dst, stride);
  }
  return true;
}

struct Frame {
  double timestamp = 0.0;
  std::vector<uint8_t> rgb;    // H*W*3 raw 8-bit
  std::vector<uint16_t> depth; // H*W raw sensor units
  bool ok = false;
};

struct Loader {
  std::string dir;
  double depth_scale = 1.0 / 5000.0;
  uint32_t width = 0, height = 0;
  std::vector<std::pair<double, std::pair<std::string, std::string>>> assoc;
  // ring buffer
  std::vector<Frame> ring;
  size_t cap = 8;
  std::atomic<size_t> head{0};  // produced
  size_t tail = 0;              // consumed
  std::mutex mu;
  std::condition_variable cv_prod, cv_cons;
  std::thread worker;
  std::atomic<bool> stop{false};

  void produce() {
    for (size_t i = 0; i < assoc.size() && !stop; ++i) {
      Frame fr;
      fr.timestamp = assoc[i].first;
      Image rgb_img, depth_img;
      bool ok = decode_png(dir + "/" + assoc[i].second.first, &rgb_img) &&
                decode_png(dir + "/" + assoc[i].second.second, &depth_img);
      if (ok) {
        width = rgb_img.width;
        height = rgb_img.height;
        size_t n = size_t(rgb_img.width) * rgb_img.height;
        fr.rgb.resize(n * 3);
        for (size_t p = 0; p < n; ++p) {
          if (rgb_img.channels >= 3) {
            fr.rgb[p * 3 + 0] = rgb_img.data[p * rgb_img.channels + 0];
            fr.rgb[p * 3 + 1] = rgb_img.data[p * rgb_img.channels + 1];
            fr.rgb[p * 3 + 2] = rgb_img.data[p * rgb_img.channels + 2];
          } else {
            uint8_t g = rgb_img.data[p * rgb_img.channels];
            fr.rgb[p * 3 + 0] = fr.rgb[p * 3 + 1] = fr.rgb[p * 3 + 2] = g;
          }
        }
        size_t nd = size_t(depth_img.width) * depth_img.height;
        fr.depth.resize(nd);
        if (depth_img.bit_depth == 16) {
          for (size_t p = 0; p < nd; ++p)
            fr.depth[p] = (uint16_t(depth_img.data[p * 2]) << 8) |
                          depth_img.data[p * 2 + 1];
        } else {
          for (size_t p = 0; p < nd; ++p)
            fr.depth[p] = depth_img.data[p];
        }
        fr.ok = true;
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_prod.wait(lk, [&] { return head - tail < cap || stop; });
      if (stop) return;
      ring[head % cap] = std::move(fr);
      ++head;
      cv_cons.notify_one();
    }
  }
};

}  // namespace

extern "C" {

void* tum_loader_open(const char* dir, const char* assoc_path,
                      double depth_map_factor) {
  auto* L = new Loader();
  L->dir = dir;
  L->depth_scale = 1.0 / depth_map_factor;
  std::ifstream f(assoc_path);
  if (!f) { delete L; return nullptr; }
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    double t1, t2;
    std::string rgb, depth;
    if (ss >> t1 >> rgb >> t2 >> depth)
      L->assoc.push_back({t1, {rgb, depth}});
  }
  L->ring.resize(L->cap);
  L->worker = std::thread([L] { L->produce(); });
  return L;
}

long tum_loader_len(void* h) {
  return h ? long(static_cast<Loader*>(h)->assoc.size()) : -1;
}

// Blocks until the next prefetched frame is ready; returns 0 on success,
// 1 on end-of-sequence, 2 on decode failure.
int tum_loader_next(void* h, float* rgb_out, float* depth_out,
                    double* ts_out, long rgb_capacity, long depth_capacity) {
  auto* L = static_cast<Loader*>(h);
  if (L->tail >= L->assoc.size()) return 1;
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_cons.wait(lk, [&] { return L->head > L->tail; });
  Frame& fr = L->ring[L->tail % L->cap];
  int rc = 2;
  if (fr.ok && long(fr.rgb.size()) <= rgb_capacity &&
      long(fr.depth.size()) <= depth_capacity) {
    for (size_t p = 0; p < fr.rgb.size(); ++p) rgb_out[p] = fr.rgb[p];
    for (size_t p = 0; p < fr.depth.size(); ++p)
      depth_out[p] = float(fr.depth[p]) * float(L->depth_scale);
    *ts_out = fr.timestamp;
    rc = 0;
  }
  ++L->tail;
  L->cv_prod.notify_one();
  return rc;
}

// Raw variant: 8-bit RGB + 16-bit depth in sensor units (no host-side float
// conversion — the device converts after a 4x-smaller upload).
int tum_loader_next_raw(void* h, uint8_t* rgb_out, uint16_t* depth_out,
                        double* ts_out, long rgb_capacity,
                        long depth_capacity) {
  auto* L = static_cast<Loader*>(h);
  if (L->tail >= L->assoc.size()) return 1;
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_cons.wait(lk, [&] { return L->head > L->tail; });
  Frame& fr = L->ring[L->tail % L->cap];
  int rc = 2;
  if (fr.ok && long(fr.rgb.size()) <= rgb_capacity &&
      long(fr.depth.size()) <= depth_capacity) {
    std::memcpy(rgb_out, fr.rgb.data(), fr.rgb.size());
    std::memcpy(depth_out, fr.depth.data(),
                fr.depth.size() * sizeof(uint16_t));
    *ts_out = fr.timestamp;
    rc = 0;
  }
  ++L->tail;
  L->cv_prod.notify_one();
  return rc;
}

void tum_loader_close(void* h) {
  auto* L = static_cast<Loader*>(h);
  if (!L) return;
  L->stop = true;
  L->cv_prod.notify_all();
  if (L->worker.joinable()) L->worker.join();
  delete L;
}

}  // extern "C"
