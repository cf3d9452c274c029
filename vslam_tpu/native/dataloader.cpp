// Native data runtime: TUM RGB-D sequence decoding + prefetch ring.
//
// The reference decodes frames with cv::imread on the SLAM thread
// (/root/reference/src/Frame.cpp:19-54, src/main.cpp:1097-1104), which
// serializes PNG inflation with tracking. Here decoding is a standalone
// C++ runtime: libpng decode of 8-bit RGB and 16-bit depth PNGs, TUM
// association parsing, and a pthread worker pool filling a ring of
// pre-decoded frames so the Python/JAX feed (vslam_tpu.data.loader) only
// memcpys device-bound batches. Exposed as a plain C ABI for ctypes.
//
// Build: make -C vslam_tpu/native  (g++ -O3 -shared -lpng -lz -lpthread)

#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <mutex>
#include <queue>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct FrameEntry {
  double timestamp;
  std::string rgb_path;
  std::string depth_path;  // empty = none
};

struct DecodedFrame {
  int index = -1;
  double timestamp = 0.0;
  std::vector<uint8_t> rgb;     // H*W*3
  std::vector<uint16_t> depth;  // H*W (raw units; /5000 on device)
  int width = 0, height = 0;
  bool ok = false;
};

// ---------------------------------------------------------------------------
// PNG decoding
// ---------------------------------------------------------------------------

bool decode_png(const std::string& path, std::vector<uint8_t>* rgb8,
                std::vector<uint16_t>* gray16, int* w, int* h) {
  FILE* fp = fopen(path.c_str(), "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);
  *w = (int)width;
  *h = (int)height;

  if (rgb8) {
    // Normalize to 8-bit RGB.
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
      png_set_expand_gray_1_2_4_to_8(png);
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    png_set_strip_alpha(png);
    png_read_update_info(png, info);

    rgb8->resize((size_t)width * height * 3);
    std::vector<png_bytep> rows(height);
    for (png_uint_32 y = 0; y < height; y++)
      rows[y] = rgb8->data() + (size_t)y * width * 3;
    png_read_image(png, rows.data());
  } else if (gray16) {
    // 16-bit grayscale depth (TUM stores big-endian 16-bit PNG).
    if (bit_depth < 16) png_set_expand_gray_1_2_4_to_8(png);
    if (color_type != PNG_COLOR_TYPE_GRAY) {
      // Unexpected; fail gracefully.
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(fp);
      return false;
    }
    png_set_swap(png);  // PNG is big-endian; host is little-endian
    png_read_update_info(png, info);
    gray16->resize((size_t)width * height);
    // 8-bit rows are 1 byte/pixel after expansion: lay them out contiguously
    // (byte stride = width) so the in-place widening below reads the right
    // bytes; 16-bit rows use the natural uint16 stride.
    const bool eight_bit = bit_depth < 16;
    std::vector<png_bytep> rows(height);
    for (png_uint_32 y = 0; y < height; y++)
      rows[y] = eight_bit
                    ? reinterpret_cast<png_bytep>(gray16->data()) +
                          (size_t)y * width
                    : reinterpret_cast<png_bytep>(gray16->data() +
                                                  (size_t)y * width);
    png_read_image(png, rows.data());
    if (eight_bit) {
      // Promote 8-bit to 16 in place, back-to-front (dest byte 2i never
      // clobbers an unread src byte j<i).
      const uint8_t* src = reinterpret_cast<uint8_t*>(gray16->data());
      for (long i = (long)width * height - 1; i >= 0; i--)
        (*gray16)[i] = src[i];
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

// ---------------------------------------------------------------------------
// TUM parsing (mirrors src/main.cpp:42-244)
// ---------------------------------------------------------------------------

bool starts_with_hash(const std::string& s) {
  for (char c : s) {
    if (c == '#') return true;
    if (!isspace((unsigned char)c)) return false;
  }
  return true;
}

std::vector<std::pair<double, std::string>> parse_list_file(
    const std::string& path) {
  std::vector<std::pair<double, std::string>> out;
  std::ifstream f(path);
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || starts_with_hash(line)) continue;
    std::istringstream iss(line);
    double ts;
    std::string name;
    if (iss >> ts >> name) out.push_back({ts, name});
  }
  return out;
}

struct Sequence {
  std::string root;
  std::vector<FrameEntry> frames;

  // Prefetch machinery
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_ready;
  std::queue<int> todo;
  std::vector<DecodedFrame> ring;
  std::vector<std::atomic<int>> *slot_state = nullptr;  // unused simple impl
  std::atomic<bool> stop{false};
  // decoded results keyed by frame index
  std::vector<DecodedFrame> done;
  std::atomic<size_t> done_count{0};
};

void load_sequence_entries(Sequence* seq) {
  const std::string root = seq->root;
  std::ifstream assoc(root + "/associations.txt");
  if (assoc.is_open()) {
    std::string line;
    while (std::getline(assoc, line)) {
      if (line.empty() || starts_with_hash(line)) continue;
      std::istringstream iss(line);
      double t1, t2;
      std::string p1, p2;
      if (iss >> t1 >> p1 >> t2 >> p2) {
        FrameEntry e;
        if (p1.find("rgb") != std::string::npos) {
          e.timestamp = t1;
          e.rgb_path = root + "/" + p1;
          e.depth_path = root + "/" + p2;
        } else {
          e.timestamp = t2;
          e.rgb_path = root + "/" + p2;
          e.depth_path = root + "/" + p1;
        }
        seq->frames.push_back(e);
      }
    }
    return;
  }
  auto rgb = parse_list_file(root + "/rgb.txt");
  auto depth = parse_list_file(root + "/depth.txt");
  for (auto& [ts, name] : rgb) {
    FrameEntry e;
    e.timestamp = ts;
    e.rgb_path = root + "/" + name;
    // nearest depth within 20 ms (main.cpp:68-85)
    double best = 0.02;
    for (auto& [dts, dname] : depth) {
      double d = std::fabs(dts - ts);
      if (d <= best) {
        best = d;
        e.depth_path = root + "/" + dname;
      }
    }
    seq->frames.push_back(e);
  }
}

void worker_loop(Sequence* seq) {
  for (;;) {
    int idx;
    {
      std::unique_lock<std::mutex> lk(seq->mu);
      if (seq->stop) return;
      if (seq->todo.empty()) {
        lk.unlock();
        std::this_thread::sleep_for(std::chrono::milliseconds(1));
        if (seq->stop) return;
        continue;
      }
      idx = seq->todo.front();
      seq->todo.pop();
    }
    DecodedFrame df;
    df.index = idx;
    const FrameEntry& e = seq->frames[idx];
    df.timestamp = e.timestamp;
    int w = 0, h = 0;
    df.ok = decode_png(e.rgb_path, &df.rgb, nullptr, &w, &h);
    df.width = w;
    df.height = h;
    if (!e.depth_path.empty()) {
      int dw, dh;
      decode_png(e.depth_path, nullptr, &df.depth, &dw, &dh);
    }
    {
      std::lock_guard<std::mutex> lk(seq->mu);
      seq->done[idx] = std::move(df);
      seq->done_count++;
    }
    seq->cv_ready.notify_all();
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void* vt_open_sequence(const char* root) {
  auto* seq = new Sequence();
  seq->root = root;
  load_sequence_entries(seq);
  seq->done.resize(seq->frames.size());
  return seq;
}

int vt_seq_len(void* handle) {
  return (int)static_cast<Sequence*>(handle)->frames.size();
}

double vt_timestamp(void* handle, int idx) {
  auto* seq = static_cast<Sequence*>(handle);
  if (idx < 0 || idx >= (int)seq->frames.size()) return -1.0;
  return seq->frames[idx].timestamp;
}

int vt_has_depth(void* handle, int idx) {
  auto* seq = static_cast<Sequence*>(handle);
  return !seq->frames[idx].depth_path.empty();
}

// Synchronous decode of one frame into caller buffers (RGB uint8 HxWx3,
// depth uint16 HxW raw units). Returns 1 on success.
int vt_get_frame(void* handle, int idx, uint8_t* rgb_out, uint16_t* depth_out,
                 int* w_out, int* h_out, double* ts_out) {
  auto* seq = static_cast<Sequence*>(handle);
  if (idx < 0 || idx >= (int)seq->frames.size()) return 0;
  const FrameEntry& e = seq->frames[idx];
  std::vector<uint8_t> rgb;
  std::vector<uint16_t> depth;
  int w = 0, h = 0;
  if (!decode_png(e.rgb_path, &rgb, nullptr, &w, &h)) return 0;
  if (rgb_out) memcpy(rgb_out, rgb.data(), rgb.size());
  if (depth_out) {
    if (!e.depth_path.empty()) {
      int dw, dh;
      if (decode_png(e.depth_path, nullptr, &depth, &dw, &dh))
        memcpy(depth_out, depth.data(), depth.size() * 2);
      else
        memset(depth_out, 0, (size_t)w * h * 2);
    } else {
      memset(depth_out, 0, (size_t)w * h * 2);
    }
  }
  *w_out = w;
  *h_out = h;
  if (ts_out) *ts_out = e.timestamp;
  return 1;
}

// Start background prefetch of frames [start, start+step, ...] with
// `n_workers` decode threads.
void vt_prefetch(void* handle, int start, int step, int count, int n_workers) {
  auto* seq = static_cast<Sequence*>(handle);
  {
    std::lock_guard<std::mutex> lk(seq->mu);
    for (int i = 0; i < count; i++) {
      int idx = start + i * step;
      if (idx < (int)seq->frames.size()) seq->todo.push(idx);
    }
  }
  int nw = std::max(1, n_workers);
  for (int i = (int)seq->workers.size(); i < nw; i++)
    seq->workers.emplace_back(worker_loop, seq);
}

// Blocking fetch of a prefetched frame (falls back to sync decode if it
// was never queued).
int vt_fetch(void* handle, int idx, uint8_t* rgb_out, uint16_t* depth_out,
             int* w_out, int* h_out, double* ts_out) {
  auto* seq = static_cast<Sequence*>(handle);
  if (idx < 0 || idx >= (int)seq->frames.size()) return 0;
  {
    std::unique_lock<std::mutex> lk(seq->mu);
    seq->cv_ready.wait_for(lk, std::chrono::seconds(10), [&] {
      return seq->done[idx].index == idx || seq->workers.empty();
    });
    DecodedFrame& df = seq->done[idx];
    if (df.index == idx && df.ok) {
      if (rgb_out) memcpy(rgb_out, df.rgb.data(), df.rgb.size());
      if (depth_out) {
        if (!df.depth.empty())
          memcpy(depth_out, df.depth.data(), df.depth.size() * 2);
        else
          memset(depth_out, 0, (size_t)df.width * df.height * 2);
      }
      *w_out = df.width;
      *h_out = df.height;
      if (ts_out) *ts_out = df.timestamp;
      // Free ring memory once consumed.
      df.rgb.clear();
      df.rgb.shrink_to_fit();
      df.depth.clear();
      df.depth.shrink_to_fit();
      return 1;
    }
  }
  return vt_get_frame(handle, idx, rgb_out, depth_out, w_out, h_out, ts_out);
}

void vt_close(void* handle) {
  auto* seq = static_cast<Sequence*>(handle);
  seq->stop = true;
  for (auto& t : seq->workers) t.join();
  delete seq;
}

}  // extern "C"
