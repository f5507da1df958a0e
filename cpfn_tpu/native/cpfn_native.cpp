// cpfn_native — C++ host library for the genuinely sequential host-side
// algorithms of the CPFN pipeline. TPU-native counterpart of the reference's
// native layer: where the reference used CUDA kernels for device ops (those
// became XLA/Pallas programs) and numba-JIT'd Python for host loops
// (`Utils/merging_utils.py:17-33`, `Preprocessing/preprocessing_sampling_lowres.py:14-42`)
// plus scipy's Hungarian inside the train step
// (`SPFN/losses_implementation.py:11-30`), this library provides:
//
//   - lsa_minimize_batch: batched rectangular linear sum assignment
//     (Jonker-Volgenant style shortest augmenting paths, O(R^2 C) per
//     element), called from JAX via pure_callback once per train step.
//   - heuristic_merge_solver: the greedy cross-scale primitive merging
//     (union the highest-similarity primitive pair whose patch sets don't
//     overlap, repeat).
//   - fps / fps_per_label: host farthest-point sampling for the offline
//     preprocessing CLIs (euclidean-distance variant with per-label seeding).
//
// Exposed via a plain C ABI; loaded with ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC -o libcpfn_native.so cpfn_native.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Linear sum assignment (minimization), rectangular R <= C.
// Shortest-augmenting-path algorithm with dual potentials.
// cost: R x C row-major (double). out_cols[i] = assigned column of row i.
// ---------------------------------------------------------------------------
static void lsa_single(const double* cost, int R, int C, int* out_cols) {
  const double INF = std::numeric_limits<double>::infinity();
  // 1-based potentials over rows/cols; p[j] = row assigned to column j.
  std::vector<double> u(R + 1, 0.0), v(C + 1, 0.0);
  std::vector<int> p(C + 1, 0), way(C + 1, 0);
  for (int i = 1; i <= R; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(C + 1, INF);
    std::vector<char> used(C + 1, 0);
    do {
      used[j0] = 1;
      int i0 = p[j0], j1 = 0;
      double delta = INF;
      for (int j = 1; j <= C; ++j) {
        if (used[j]) continue;
        double cur = cost[(i0 - 1) * C + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) {
          minv[j] = cur;
          way[j] = j0;
        }
        if (minv[j] < delta) {
          delta = minv[j];
          j1 = j;
        }
      }
      for (int j = 0; j <= C; ++j) {
        if (used[j]) {
          u[p[j]] += delta;
          v[j] -= delta;
        } else {
          minv[j] -= delta;
        }
      }
      j0 = j1;
    } while (p[j0] != 0);
    do {
      int j1 = way[j0];
      p[j0] = p[j1];
      j0 = j1;
    } while (j0);
  }
  for (int j = 1; j <= C; ++j) {
    if (p[j] > 0) out_cols[p[j] - 1] = j - 1;
  }
}

// cost: B x R x C (f32). n_rows[b] rows are active for element b. Unused
// rows of out_cols are zero (the reference leaves them 0,
// losses_implementation.py:18,30).
void lsa_minimize_batch(const float* cost, const int32_t* n_rows, int B,
                        int R, int C, int32_t* out_cols) {
  std::vector<double> buf;
  for (int b = 0; b < B; ++b) {
    int r = n_rows[b];
    if (r <= 0) {
      std::memset(out_cols + b * R, 0, sizeof(int32_t) * R);
      continue;
    }
    if (r > C) r = C;
    buf.assign(cost + (size_t)b * R * C, cost + (size_t)b * R * C + r * C);
    std::vector<int> cols(r, 0);
    lsa_single(buf.data(), r, C, cols.data());
    for (int i = 0; i < R; ++i)
      out_cols[b * R + i] = (i < r) ? cols[i] : 0;
  }
}

// ---------------------------------------------------------------------------
// Greedy cross-scale merging. Mirrors merging_utils.run_heuristic_solver:
//   n = nb_patches * max_label_per_patch + max_label_per_object primitives;
//   repeatedly union the pair (i, j) with the largest similarity whose merged
//   segments share no source patch; then drop primitives whose diagonal
//   similarity < threshold (giving each a fresh negative label drawn from the
//   reference's tiled replacement table, which can alias across patches —
//   semantics preserved); finally relabel contiguously.
// out_labels: n int64 cluster ids in [0, n_clusters).
// ---------------------------------------------------------------------------
void heuristic_merge_solver(const double* similarity, int n, int nb_patches,
                            int max_label_per_patch, int max_label_per_object,
                            double threshold, int64_t* out_labels) {
  struct Pair {
    int i, j;
    double w;
    bool alive;
  };
  std::vector<Pair> pairs;
  for (int i = 0; i < n; ++i)
    for (int j = i + 1; j < n; ++j)
      if (similarity[(size_t)i * n + j] > threshold)
        pairs.push_back({i, j, similarity[(size_t)i * n + j], true});

  const int P = nb_patches + 1;  // one-hot patch dimension (+1 = global)
  std::vector<int64_t> segment(n);
  for (int i = 0; i < n; ++i) segment[i] = i;
  // patch membership count vectors per primitive row
  std::vector<double> patch_vec((size_t)n * P, 0.0);
  for (int k = 0; k < n; ++k) {
    int pid = (k < nb_patches * max_label_per_patch)
                  ? k / max_label_per_patch
                  : nb_patches;
    patch_vec[(size_t)k * P + pid] = 1.0;
  }

  size_t alive_count = pairs.size();
  while (alive_count > 0) {
    // argmax over alive pairs
    double best = -std::numeric_limits<double>::infinity();
    size_t bi = 0;
    for (size_t t = 0; t < pairs.size(); ++t)
      if (pairs[t].alive && pairs[t].w > best) {
        best = pairs[t].w;
        bi = t;
      }
    int a = pairs[bi].i, b = pairs[bi].j;
    int64_t sa = segment[a], sb = segment[b];
    for (int k = 0; k < n; ++k)
      if (segment[k] == sb) segment[k] = sa;
    // accumulate patch vectors over the merged segment
    std::vector<double> acc(P, 0.0);
    for (int k = 0; k < n; ++k)
      if (segment[k] == sa)
        for (int q = 0; q < P; ++q) acc[q] += patch_vec[(size_t)k * P + q];
    for (int k = 0; k < n; ++k)
      if (segment[k] == sa)
        std::copy(acc.begin(), acc.end(), patch_vec.begin() + (size_t)k * P);
    // drop pairs whose endpoints now share a patch
    for (auto& pr : pairs) {
      if (!pr.alive) continue;
      double dot = 0.0;
      for (int q = 0; q < P; ++q)
        dot += patch_vec[(size_t)pr.i * P + q] * patch_vec[(size_t)pr.j * P + q];
      if (dot != 0.0) {
        pr.alive = false;
        --alive_count;
      }
    }
  }

  // replacement labels for primitives with empty diagonal similarity
  std::vector<int64_t> labels(segment);
  for (int k = 0; k < n; ++k) {
    if (similarity[(size_t)k * n + k] < threshold) {
      if (k < nb_patches * max_label_per_patch)
        labels[k] = -(int64_t)max_label_per_patch + (k % max_label_per_patch);
      else
        labels[k] = -(int64_t)max_label_per_object +
                    (k - nb_patches * max_label_per_patch);
    }
  }
  // contiguous relabel (np.unique return_inverse)
  std::vector<int64_t> sorted(labels);
  std::sort(sorted.begin(), sorted.end());
  sorted.erase(std::unique(sorted.begin(), sorted.end()), sorted.end());
  for (int k = 0; k < n; ++k) {
    out_labels[k] =
        std::lower_bound(sorted.begin(), sorted.end(), labels[k]) -
        sorted.begin();
  }
}

// ---------------------------------------------------------------------------
// Host farthest point sampling (preprocessing). Euclidean-distance variant:
// min-distance buffer initialised to 1e6, seed points zeroed, selection
// starts at the argmax of the buffer. Mirrors the reference's numba kernels.
// ---------------------------------------------------------------------------
void fps_host(const float* points, int n, const int32_t* seed_idx, int n_seed,
              int m, int32_t* out) {
  std::vector<double> mind(n, 1e6);
  for (int s = 0; s < n_seed; ++s) mind[seed_idx[s]] = 0.0;
  int idx = (int)(std::max_element(mind.begin(), mind.end()) - mind.begin());
  for (int i = 0; i < m; ++i) {
    out[i] = idx;
    const float* p = points + (size_t)idx * 3;
    for (int k = 0; k < n; ++k) {
      const float* q = points + (size_t)k * 3;
      double dx = q[0] - p[0], dy = q[1] - p[1], dz = q[2] - p[2];
      double d = std::sqrt(dx * dx + dy * dy + dz * dz);
      if (d < mind[k]) mind[k] = d;
    }
    idx = (int)(std::max_element(mind.begin(), mind.end()) - mind.begin());
  }
}

// One guaranteed sample per ground-truth label: pick the farthest point,
// zero out its whole label, repeat for each unique label.
void fps_per_label_host(const float* points, const int32_t* labels, int n,
                        int n_unique, int32_t start, int32_t* out) {
  std::vector<double> mind(n, 1e6);
  int idx = start;
  for (int i = 0; i < n_unique; ++i) {
    int32_t lab = labels[idx];
    out[i] = idx;
    const float* p = points + (size_t)idx * 3;
    for (int k = 0; k < n; ++k) {
      const float* q = points + (size_t)k * 3;
      double dx = q[0] - p[0], dy = q[1] - p[1], dz = q[2] - p[2];
      double d = std::sqrt(dx * dx + dy * dy + dz * dz);
      if (d < mind[k]) mind[k] = d;
    }
    for (int k = 0; k < n; ++k)
      if (labels[k] == lab) mind[k] = 0.0;
    idx = (int)(std::max_element(mind.begin(), mind.end()) - mind.begin());
  }
}

}  // extern "C"
