// Native host-side point-cloud utilities.
//
// C++ replacement for the reference's external `libPointUtil` CUDA/C++
// extension (SURVEY.md §2.3) that the host data pipeline depends on:
// grid downsampling, radius search, k-NN, local covariance features and
// Gaussian probability interpolation.  Exposed through a plain C ABI and
// loaded from Python with ctypes (pointcloudsegmentation_tpu/data/native.py).
//
// Design: a uniform hash grid over the cloud (cell = radius) gives O(N)
// radius queries; all entry points are multithreaded with std::thread.
#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Grid {
  float cell;
  float minx, miny, minz;
  int nx, ny, nz;
  std::vector<int> cell_start;   // size nx*ny*nz+1
  std::vector<int> order;        // point ids sorted by cell

  void build(const float* xyz, int n, float cell_size) {
    cell = cell_size;
    minx = miny = minz = 1e30f;
    float maxx = -1e30f, maxy = -1e30f, maxz = -1e30f;
    for (int i = 0; i < n; ++i) {
      minx = std::min(minx, xyz[3 * i]);
      miny = std::min(miny, xyz[3 * i + 1]);
      minz = std::min(minz, xyz[3 * i + 2]);
      maxx = std::max(maxx, xyz[3 * i]);
      maxy = std::max(maxy, xyz[3 * i + 1]);
      maxz = std::max(maxz, xyz[3 * i + 2]);
    }
    nx = std::max(1, (int)((maxx - minx) / cell) + 1);
    ny = std::max(1, (int)((maxy - miny) / cell) + 1);
    nz = std::max(1, (int)((maxz - minz) / cell) + 1);
    // guard against absurd grids on degenerate clouds
    const long long total = (long long)nx * ny * nz;
    if (total > (long long)64 * n + 64) {
      // coarsen until the table is O(n)
      double scale = std::cbrt((double)total / (64.0 * n + 64.0));
      cell *= (float)scale;
      nx = std::max(1, (int)((maxx - minx) / cell) + 1);
      ny = std::max(1, (int)((maxy - miny) / cell) + 1);
      nz = std::max(1, (int)((maxz - minz) / cell) + 1);
    }
    std::vector<int> cnt((size_t)nx * ny * nz + 1, 0);
    std::vector<int> cid(n);
    for (int i = 0; i < n; ++i) {
      cid[i] = cell_id(xyz + 3 * i);
      cnt[cid[i] + 1]++;
    }
    for (size_t c = 1; c < cnt.size(); ++c) cnt[c] += cnt[c - 1];
    cell_start = cnt;
    order.resize(n);
    std::vector<int> cursor(cell_start.begin(), cell_start.end() - 1);
    for (int i = 0; i < n; ++i) order[cursor[cid[i]]++] = i;
  }

  inline int clampi(int v, int lo, int hi) const {
    return v < lo ? lo : (v > hi ? hi : v);
  }
  inline int cell_id(const float* p) const {
    int cx = clampi((int)((p[0] - minx) / cell), 0, nx - 1);
    int cy = clampi((int)((p[1] - miny) / cell), 0, ny - 1);
    int cz = clampi((int)((p[2] - minz) / cell), 0, nz - 1);
    return (cx * ny + cy) * nz + cz;
  }

  template <typename F>
  void for_neighbors(const float* xyz, const float* q, float radius,
                     F&& fn) const {
    const float r2 = radius * radius;
    int cx0 = clampi((int)((q[0] - radius - minx) / cell), 0, nx - 1);
    int cx1 = clampi((int)((q[0] + radius - minx) / cell), 0, nx - 1);
    int cy0 = clampi((int)((q[1] - radius - miny) / cell), 0, ny - 1);
    int cy1 = clampi((int)((q[1] + radius - miny) / cell), 0, ny - 1);
    int cz0 = clampi((int)((q[2] - radius - minz) / cell), 0, nz - 1);
    int cz1 = clampi((int)((q[2] + radius - minz) / cell), 0, nz - 1);
    for (int cx = cx0; cx <= cx1; ++cx)
      for (int cy = cy0; cy <= cy1; ++cy)
        for (int cz = cz0; cz <= cz1; ++cz) {
          int c = (cx * ny + cy) * nz + cz;
          for (int s = cell_start[c]; s < cell_start[c + 1]; ++s) {
            int j = order[s];
            float dx = xyz[3 * j] - q[0];
            float dy = xyz[3 * j + 1] - q[1];
            float dz = xyz[3 * j + 2] - q[2];
            float d2 = dx * dx + dy * dy + dz * dz;
            if (d2 <= r2) fn(j, d2);
          }
        }
  }
};

void parallel_for(int n, const std::function<void(int, int)>& body) {
  int nt = std::max(1u, std::thread::hardware_concurrency());
  nt = std::min(nt, std::max(1, n / 256));
  if (nt <= 1) {
    body(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int b = t * chunk, e = std::min(n, b + chunk);
    if (b < e) ts.emplace_back(body, b, e);
  }
  for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// One representative (lowest original index) point per occupied voxel.
// out_idx must hold n ints; returns the number kept.
int pcs_grid_downsample(const float* xyz, int n, float stride,
                        int* out_idx) {
  float minx = 1e30f, miny = 1e30f, minz = 1e30f;
  for (int i = 0; i < n; ++i) {
    minx = std::min(minx, xyz[3 * i]);
    miny = std::min(miny, xyz[3 * i + 1]);
    minz = std::min(minz, xyz[3 * i + 2]);
  }
  std::unordered_map<uint64_t, int> seen;
  seen.reserve(n * 2);
  int kept = 0;
  for (int i = 0; i < n; ++i) {
    uint64_t cx = (uint64_t)((xyz[3 * i] - minx) / stride);
    uint64_t cy = (uint64_t)((xyz[3 * i + 1] - miny) / stride);
    uint64_t cz = (uint64_t)((xyz[3 * i + 2] - minz) / stride);
    uint64_t key = (cx * 1000003ull + cy) * 1000003ull + cz;
    if (seen.emplace(key, i).second) out_idx[kept++] = i;
  }
  std::sort(out_idx, out_idx + kept);
  return kept;
}

// Fixed-K radius neighbors of query points within the support cloud.
// idx: [nq*k] (self/first index padded), cnt: [nq].
void pcs_radius_neighbors(const float* xyz, int n, const float* query,
                          int nq, float radius, int k, int* idx, int* cnt) {
  Grid g;
  g.build(xyz, n, radius);
  parallel_for(nq, [&](int b, int e) {
    std::vector<std::pair<float, int>> heap;
    for (int i = b; i < e; ++i) {
      heap.clear();
      g.for_neighbors(xyz, query + 3 * i, radius, [&](int j, float d2) {
        if ((int)heap.size() < k) {
          heap.emplace_back(d2, j);
          std::push_heap(heap.begin(), heap.end());
        } else if (d2 < heap.front().first) {
          std::pop_heap(heap.begin(), heap.end());
          heap.back() = {d2, j};
          std::push_heap(heap.begin(), heap.end());
        }
      });
      std::sort_heap(heap.begin(), heap.end());
      cnt[i] = (int)heap.size();
      for (int s = 0; s < k; ++s)
        idx[(size_t)i * k + s] =
            s < (int)heap.size() ? heap[s].second : (heap.empty() ? 0 : heap[0].second);
    }
  });
}

// k nearest support points per query (expanding-ring grid search).
void pcs_knn(const float* support, int ns, const float* query, int nq,
             int k, float cell_hint, int* idx, float* d2out) {
  Grid g;
  g.build(support, ns, cell_hint > 0 ? cell_hint : 0.5f);
  parallel_for(nq, [&](int b, int e) {
    std::vector<std::pair<float, int>> heap;
    for (int i = b; i < e; ++i) {
      heap.clear();
      float r = g.cell;
      // grow the search radius until k found (cap at grid diameter)
      for (int it = 0; it < 40; ++it) {
        heap.clear();
        g.for_neighbors(support, query + 3 * i, r, [&](int j, float d2) {
          if ((int)heap.size() < k) {
            heap.emplace_back(d2, j);
            std::push_heap(heap.begin(), heap.end());
          } else if (d2 < heap.front().first) {
            std::pop_heap(heap.begin(), heap.end());
            heap.back() = {d2, j};
            std::push_heap(heap.begin(), heap.end());
          }
        });
        if ((int)heap.size() >= k || r > 1e6f) break;
        r *= 2.0f;
      }
      std::sort_heap(heap.begin(), heap.end());
      for (int s = 0; s < k; ++s) {
        if (s < (int)heap.size()) {
          idx[(size_t)i * k + s] = heap[s].second;
          d2out[(size_t)i * k + s] = heap[s].first;
        } else {
          idx[(size_t)i * k + s] = heap.empty() ? 0 : heap[0].second;
          d2out[(size_t)i * k + s] = heap.empty() ? 0.f : heap[0].first;
        }
      }
    }
  });
}

// Trace-normalized 3x3 covariance of each query's radius neighborhood.
void pcs_compute_covars(const float* xyz, int n, const int* query_idx,
                        int nq, float radius, float* out9) {
  Grid g;
  g.build(xyz, n, radius);
  parallel_for(nq, [&](int b, int e) {
    for (int i = b; i < e; ++i) {
      const float* q = xyz + 3 * query_idx[i];
      double sum[3] = {0, 0, 0};
      double sq[9] = {0};
      int cnt = 0;
      g.for_neighbors(xyz, q, radius, [&](int j, float) {
        const float* p = xyz + 3 * j;
        for (int a = 0; a < 3; ++a) sum[a] += p[a];
        for (int a = 0; a < 3; ++a)
          for (int c = 0; c < 3; ++c) sq[a * 3 + c] += (double)p[a] * p[c];
        ++cnt;
      });
      float* o = out9 + 9 * i;
      if (cnt < 2) {
        std::memset(o, 0, 9 * sizeof(float));
        continue;
      }
      double tr = 0;
      double cov[9];
      for (int a = 0; a < 3; ++a)
        for (int c = 0; c < 3; ++c) {
          cov[a * 3 + c] = sq[a * 3 + c] / cnt -
                           (sum[a] / cnt) * (sum[c] / cnt);
        }
      tr = cov[0] + cov[4] + cov[8];
      for (int s = 0; s < 9; ++s) o[s] = (float)(cov[s] / (tr + 1e-6));
    }
  });
}

// Gaussian k-NN probability interpolation
// (libPointUtil.interpolateProbsGPU, interpolate.py:140).
void pcs_interpolate_probs(const float* sxyz, const float* sprobs, int ns,
                           int nc, const float* qxyz, int nq, int k,
                           float ratio, float cell_hint, float* out) {
  std::vector<int> idx((size_t)nq * k);
  std::vector<float> d2((size_t)nq * k);
  pcs_knn(sxyz, ns, qxyz, nq, k, cell_hint, idx.data(), d2.data());
  parallel_for(nq, [&](int b, int e) {
    for (int i = b; i < e; ++i) {
      const float* drow = d2.data() + (size_t)i * k;
      const int* irow = idx.data() + (size_t)i * k;
      float dmin = 1e30f;
      for (int s = 0; s < k; ++s) dmin = std::min(dmin, drow[s]);
      float wsum = 0;
      float* o = out + (size_t)i * nc;
      std::memset(o, 0, nc * sizeof(float));
      for (int s = 0; s < k; ++s) {
        float w = std::exp(-(drow[s] - dmin) * ratio);
        wsum += w;
        const float* p = sprobs + (size_t)irow[s] * nc;
        for (int c = 0; c < nc; ++c) o[c] += w * p[c];
      }
      if (wsum > 0)
        for (int c = 0; c < nc; ++c) o[c] /= wsum;
    }
  });
}

}  // extern "C"
