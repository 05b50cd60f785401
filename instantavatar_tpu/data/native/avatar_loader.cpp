// Native data engine: threaded PNG/npy decode, in-RAM sequence cache, and
// patch sampling — the host input pipeline for avatar training.
//
// Role parity: the reference feeds its GPU from 8 torch dataloader worker
// processes doing cv2 decode + numpy patch sampling
// (/root/reference/instant_avatar/datasets/peoplesnapshot.py:164-195,
// utils/sampler.py). On TPU the whole step budget is a few milliseconds,
// so the input pipeline is implemented natively: decode every frame once
// into a resident cache (thread pool, libpng), then serve
// mask-composited patch batches with C loops at negligible cost.
//
// Plain C ABI (driven from Python via ctypes — no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC avatar_loader.cpp
//        -o libavatar_loader.so -lpng -lpthread

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<float> rgb;   // H*W*3 in [0,1]
  std::vector<float> mask;  // H*W in [0,1]
  int height = 0;
  int width = 0;
};

struct Sequence {
  int height = 0;
  int width = 0;
  std::vector<Frame> frames;
};

// ---------------------------------------------------------------- PNG I/O

bool read_png_rgb(const char* path, std::vector<float>* out, int* h,
                  int* w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                             nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 width = png_get_image_width(png, info);
  png_uint_32 height = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  std::vector<uint8_t> row(width * 3);
  out->resize(size_t(width) * height * 3);
  for (png_uint_32 y = 0; y < height; y++) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out->data() + size_t(y) * width * 3;
    // emit BGR to match the cv2.imread convention the datasets use
    for (png_uint_32 x = 0; x < width; x++)
      for (int k = 0; k < 3; k++)
        dst[x * 3 + k] = row[x * 3 + (2 - k)] * (1.0f / 255.0f);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  *h = int(height);
  *w = int(width);
  return true;
}

// ------------------------------------------------------------- npy masks

// Minimal .npy reader for 2-D float32/float64/uint8/bool arrays.
bool read_npy_2d(const char* path, std::vector<float>* out, int* h,
                 int* w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  char magic[6];
  if (std::fread(magic, 1, 6, fp) != 6 ||
      std::memcmp(magic, "\x93NUMPY", 6) != 0) {
    std::fclose(fp);
    return false;
  }
  uint8_t ver[2];
  if (std::fread(ver, 1, 2, fp) != 2) { std::fclose(fp); return false; }
  uint32_t hlen = 0;
  if (ver[0] == 1) {
    uint16_t l;
    if (std::fread(&l, 2, 1, fp) != 1) { std::fclose(fp); return false; }
    hlen = l;
  } else {
    if (std::fread(&hlen, 4, 1, fp) != 1) { std::fclose(fp); return false; }
  }
  std::string header(hlen, '\0');
  if (std::fread(header.data(), 1, hlen, fp) != hlen) {
    std::fclose(fp);
    return false;
  }
  auto find_shape = [&](int* a, int* b) {
    size_t p = header.find("'shape':");
    if (p == std::string::npos) return false;
    p = header.find('(', p);
    return std::sscanf(header.c_str() + p, "(%d, %d)", a, b) == 2;
  };
  if (!find_shape(h, w)) { std::fclose(fp); return false; }
  size_t n = size_t(*h) * size_t(*w);
  out->resize(n);
  if (header.find("<f4") != std::string::npos) {
    std::vector<float> buf(n);
    if (std::fread(buf.data(), 4, n, fp) != n) { std::fclose(fp); return false; }
    std::memcpy(out->data(), buf.data(), n * 4);
  } else if (header.find("<f8") != std::string::npos) {
    std::vector<double> buf(n);
    if (std::fread(buf.data(), 8, n, fp) != n) { std::fclose(fp); return false; }
    for (size_t i = 0; i < n; i++) (*out)[i] = float(buf[i]);
  } else if (header.find("|u1") != std::string::npos ||
             header.find("|b1") != std::string::npos) {
    std::vector<uint8_t> buf(n);
    if (std::fread(buf.data(), 1, n, fp) != n) { std::fclose(fp); return false; }
    // PeopleSnapshot masks are 0/1 uint8; grayscale pngs-as-npy use 0/255
    uint8_t mx = 0;
    for (size_t i = 0; i < n; i++) mx = buf[i] > mx ? buf[i] : mx;
    float scale = mx > 1 ? 1.0f / 255.0f : 1.0f;
    for (size_t i = 0; i < n; i++) (*out)[i] = buf[i] * scale;
  } else {
    std::fclose(fp);
    return false;
  }
  std::fclose(fp);
  return true;
}

// --------------------------------------------------------------- resize

// Box-filter downscale by an integer factor (matches cv2.resize area-ish
// behavior closely enough for training data).
void downscale(const std::vector<float>& src, int h, int w, int c, int f,
               std::vector<float>* dst, int* oh, int* ow) {
  if (f <= 1) {
    *dst = src;
    *oh = h;
    *ow = w;
    return;
  }
  int H = h / f, W = w / f;
  dst->assign(size_t(H) * W * c, 0.0f);
  float inv = 1.0f / float(f * f);
  for (int y = 0; y < H; y++)
    for (int x = 0; x < W; x++)
      for (int k = 0; k < c; k++) {
        float acc = 0.0f;
        for (int dy = 0; dy < f; dy++)
          for (int dx = 0; dx < f; dx++)
            acc += src[((size_t(y) * f + dy) * w + (size_t(x) * f + dx)) * c
                       + k];
        (*dst)[(size_t(y) * W + x) * c + k] = acc * inv;
      }
  *oh = H;
  *ow = W;
}

}  // namespace

extern "C" {

// Load a sequence into RAM with a thread pool. paths are ;-separated.
// Returns an opaque handle (0 on failure).
void* avatar_load_sequence(const char* image_paths, const char* mask_paths,
                           int n_frames, int downscale_f, int n_threads) {
  auto split = [](const char* s) {
    std::vector<std::string> out;
    std::string cur;
    for (const char* p = s; *p; p++) {
      if (*p == ';') {
        out.push_back(cur);
        cur.clear();
      } else {
        cur += *p;
      }
    }
    if (!cur.empty()) out.push_back(cur);
    return out;
  };
  std::vector<std::string> imgs = split(image_paths);
  std::vector<std::string> msks = split(mask_paths);
  if (int(imgs.size()) < n_frames || int(msks.size()) < n_frames)
    return nullptr;

  auto* seq = new Sequence();
  seq->frames.resize(n_frames);
  std::atomic<int> next(0);
  std::atomic<bool> ok(true);

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_frames || !ok.load()) return;
      std::vector<float> rgb, mask;
      int h = 0, w = 0, mh = 0, mw = 0;
      if (!read_png_rgb(imgs[i].c_str(), &rgb, &h, &w)) {
        ok = false;
        return;
      }
      bool m_ok = msks[i].size() > 4 &&
                  msks[i].compare(msks[i].size() - 4, 4, ".npy") == 0
                      ? read_npy_2d(msks[i].c_str(), &mask, &mh, &mw)
                      : false;
      if (!m_ok) {  // png mask fallback: read as rgb, take channel 0
        std::vector<float> mrgb;
        if (!read_png_rgb(msks[i].c_str(), &mrgb, &mh, &mw)) {
          ok = false;
          return;
        }
        mask.resize(size_t(mh) * mw);
        for (size_t p = 0; p < mask.size(); p++) mask[p] = mrgb[p * 3];
      }
      if (mh != h || mw != w) {
        ok = false;
        return;
      }
      Frame& f = seq->frames[i];
      int oh, ow;
      downscale(rgb, h, w, 3, downscale_f, &f.rgb, &oh, &ow);
      downscale(mask, h, w, 1, downscale_f, &f.mask, &oh, &ow);
      f.height = oh;
      f.width = ow;
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; t++) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  if (!ok.load()) {
    delete seq;
    return nullptr;
  }
  // samplers index every frame with the sequence-level H*W — reject
  // sequences with mixed frame dimensions instead of reading OOB
  seq->height = seq->frames.empty() ? 0 : seq->frames[0].height;
  seq->width = seq->frames.empty() ? 0 : seq->frames[0].width;
  for (const Frame& f : seq->frames) {
    if (f.height != seq->height || f.width != seq->width) {
      delete seq;
      return nullptr;
    }
  }
  return seq;
}

int avatar_seq_height(void* handle) {
  return static_cast<Sequence*>(handle)->height;
}
int avatar_seq_width(void* handle) {
  return static_cast<Sequence*>(handle)->width;
}

// Sample P patches of size S from frame `idx`: composite over a random
// background, pick patch centers inside the (optionally dilated) mask with
// probability ratio_mask else uniform. Fills rgb (P*S*S*3), alpha (P*S*S),
// bg (P*S*S*3), and patch corner coords (P*2, row/col) for ray lookup.
// Returns 0 on success.
int avatar_sample_patches(void* handle, int idx, int n_patches,
                          int patch_size, float ratio_mask, int dilate,
                          uint64_t seed, float* rgb_out, float* alpha_out,
                          float* bg_out, int32_t* coords_out) {
  auto* seq = static_cast<Sequence*>(handle);
  if (idx < 0 || idx >= int(seq->frames.size())) return 1;
  const Frame& f = seq->frames[idx];
  const int H = seq->height, W = seq->width, S = patch_size;
  if (S > H || S > W) return 2;
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<float> unif(0.0f, 1.0f);

  // collect valid centers (mask > 0, optionally dilated) with the patch
  // fully inside the image
  std::vector<int> centers;
  const int o = S / 2;
  bool use_mask = unif(rng) < ratio_mask;
  if (use_mask) {
    int r = dilate > 0 ? dilate : 0;
    for (int y = o; y < H - o; y++)
      for (int x = o; x < W - o; x++) {
        bool on = f.mask[size_t(y) * W + x] > 0.0f;
        if (!on && r > 0) {
          for (int dy = -r; dy <= r && !on; dy++)
            for (int dx = -r; dx <= r && !on; dx++) {
              int yy = y + dy, xx = x + dx;
              if (yy >= 0 && yy < H && xx >= 0 && xx < W)
                on = f.mask[size_t(yy) * W + xx] > 0.0f;
            }
        }
        if (on) centers.push_back(y * W + x);
      }
  }
  std::uniform_int_distribution<int> rand_y(0, H - S - 1);
  std::uniform_int_distribution<int> rand_x(0, W - S - 1);

  for (int p = 0; p < n_patches; p++) {
    int y0, x0;
    if (use_mask && !centers.empty()) {
      int c = centers[std::uniform_int_distribution<size_t>(
          0, centers.size() - 1)(rng)];
      y0 = c / W - o;
      x0 = c % W - o;
    } else {
      y0 = rand_y(rng);
      x0 = rand_x(rng);
    }
    coords_out[p * 2 + 0] = y0;
    coords_out[p * 2 + 1] = x0;
    for (int y = 0; y < S; y++)
      for (int x = 0; x < S; x++) {
        size_t src = size_t(y0 + y) * W + (x0 + x);
        size_t dst = (size_t(p) * S + y) * S + x;
        float m = f.mask[src];
        alpha_out[dst] = m;
        for (int k = 0; k < 3; k++) {
          float bgv = unif(rng);
          float img = f.rgb[src * 3 + k];
          bg_out[dst * 3 + k] = bgv;
          rgb_out[dst * 3 + k] = img * m + (1.0f - m) * bgv;
        }
      }
  }
  return 0;
}

// Full-frame composite over white (val/test path). rgb/alpha sized H*W.
int avatar_full_frame(void* handle, int idx, float* rgb_out,
                      float* alpha_out) {
  auto* seq = static_cast<Sequence*>(handle);
  if (idx < 0 || idx >= int(seq->frames.size())) return 1;
  const Frame& f = seq->frames[idx];
  size_t n = size_t(seq->height) * seq->width;
  for (size_t p = 0; p < n; p++) {
    float m = f.mask[p];
    alpha_out[p] = m;
    for (int k = 0; k < 3; k++)
      rgb_out[p * 3 + k] = f.rgb[p * 3 + k] * m + (1.0f - m);
  }
  return 0;
}

void avatar_free_sequence(void* handle) {
  delete static_cast<Sequence*>(handle);
}

}  // extern "C"
