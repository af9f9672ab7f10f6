// Native host-side post-processing kernels.
//
// The reference JIT-compiles these hot loops with numba
// (tiseg/datasets/utils/center_calculation.py:7-55,
//  tiseg/models/utils/postprocess.py:130-160). Here they are real C++
// compiled ahead of time (g++ -O3) and bound via ctypes — used on the eval
// host path when the TPU-resident versions are not applicable.
//
// Build: python -m tiseg_tpu.native.build   (or `make -C tiseg_tpu/native`)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <utility>
#include <vector>

extern "C" {

// 8-neighborhood offsets, index 1..8 (0 = none), matching the direction
// class convention used across the framework.
static const int DIRX[9] = {0, 0, -1, -1, -1, 0, 1, 1, 1};
static const int DIRY[9] = {0, -1, -1, 0, 1, 1, 1, 0, -1};

// Bounded wave re-expansion of labeled seeds into a foreground mask.
// pred: int32 [h*w] labeled seeds, modified in place.
// fore: uint8 [h*w] foreground mask.
// time: max wave count (expansion runs time-1 waves).
void align_foreground(int32_t* pred, const uint8_t* fore, int h, int w, int time) {
  std::vector<std::pair<int, int>> q, nq;
  q.reserve(static_cast<size_t>(h) * w / 8);
  for (int i = 0; i < h; ++i)
    for (int j = 0; j < w; ++j)
      if (pred[i * w + j] > 0) q.emplace_back(i, j);

  for (int iter = 1; iter < time && !q.empty(); ++iter) {
    nq.clear();
    for (const auto& p : q) {
      const int x = p.first, y = p.second;
      const int32_t lab = pred[x * w + y];
      for (int k = 1; k <= 8; ++k) {
        const int nx = x + DIRX[k], ny = y + DIRY[k];
        if (nx >= 0 && nx < h && ny >= 0 && ny < w && pred[nx * w + ny] == 0 && fore[nx * w + ny] > 0) {
          pred[nx * w + ny] = lab;
          nq.emplace_back(nx, ny);
        }
      }
    }
    q.swap(nq);
  }
}

// FCOS-style centerness center point (binary ray search over 8 directions,
// fixed 24 halvings of [0, 1e6] — identical arithmetic to the vectorized
// numpy twin in tiseg_tpu/datasets/utils/center.py).
void calculate_centerpoint(const uint8_t* mask, int h, int w, int32_t* out_yx) {
  static const double SIN[8] = {
      std::sin(0.0),        std::sin(M_PI / 4),     std::sin(M_PI / 2),     std::sin(3 * M_PI / 4),
      std::sin(M_PI),       std::sin(5 * M_PI / 4), std::sin(3 * M_PI / 2), std::sin(7 * M_PI / 4)};
  static const double COS[8] = {
      std::cos(0.0),        std::cos(M_PI / 4),     std::cos(M_PI / 2),     std::cos(3 * M_PI / 4),
      std::cos(M_PI),       std::cos(5 * M_PI / 4), std::cos(3 * M_PI / 2), std::cos(7 * M_PI / 4)};

  double best = -1.0;
  int bx = -1, by = -1;
  for (int i = 0; i < h; ++i) {
    for (int j = 0; j < w; ++j) {
      if (mask[i * w + j] == 0) continue;
      double maxd = 0.0, mind = 1e7;
      for (int k = 0; k < 8; ++k) {
        double lo = 0.0, hi = 1e6;
        for (int it = 0; it < 24; ++it) {
          const double mid = 0.5 * (lo + hi);
          // round-half-to-even like numpy rint
          const long px = std::lrint(i + SIN[k] * mid);
          const long py = std::lrint(j + COS[k] * mid);
          if (px >= 0 && px < h && py >= 0 && py < w && mask[px * w + py] > 0)
            lo = mid;
          else
            hi = mid;
        }
        if (hi > maxd) maxd = hi;
        if (lo < mind) mind = lo;
      }
      const double c = mind / maxd;
      if (c > best) {
        best = c;
        bx = i;
        by = j;
      }
    }
  }
  out_yx[0] = bx;
  out_yx[1] = by;
}

// Connected components, 8-connectivity, raster-scan numbering (BFS).
// mask: uint8 [h*w]; out: int32 [h*w]. Returns number of components.
int32_t label_cc8(const uint8_t* mask, int h, int w, int32_t* out) {
  std::memset(out, 0, sizeof(int32_t) * static_cast<size_t>(h) * w);
  int32_t cur = 0;
  std::vector<std::pair<int, int>> stack;
  for (int i = 0; i < h; ++i) {
    for (int j = 0; j < w; ++j) {
      if (mask[i * w + j] == 0 || out[i * w + j] != 0) continue;
      ++cur;
      stack.clear();
      stack.emplace_back(i, j);
      out[i * w + j] = cur;
      while (!stack.empty()) {
        const auto p = stack.back();
        stack.pop_back();
        for (int k = 1; k <= 8; ++k) {
          const int nx = p.first + DIRX[k], ny = p.second + DIRY[k];
          if (nx >= 0 && nx < h && ny >= 0 && ny < w && mask[nx * w + ny] > 0 && out[nx * w + ny] == 0) {
            out[nx * w + ny] = cur;
            stack.emplace_back(nx, ny);
          }
        }
      }
    }
  }
  return cur;
}

}  // extern "C"
