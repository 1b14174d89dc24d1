// Native geometry core for the data factory.
//
// The reference delegates hidden-line removal to the OCCT C++ CAD kernel
// (`dataset/data_utils.py:63-101`). Our projection model for axis-aligned
// box compounds (see plankassembly_tpu/factory/projection.py) reduces HLR to
// arrangement noding + midpoint depth tests; this file is the C++
// implementation of that inner loop (the Python fallback in projection.py
// has identical semantics — parity-tested in tests/test_native.py).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: tools/build_native.py (g++ -O2 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Seg {
  double ax, ay, bx, by;
};

inline bool almost_eq(double a, double b) { return a == b; }

}  // namespace

extern "C" {

// Node an axis-aligned segment arrangement and classify visibility.
//
// segs:      (n_segs, 4) [ax, ay, bx, by], each axis-aligned, pre-rounded.
// depths:    (n_segs,) oriented near-depth per segment (smaller = nearer).
// rects:     (n_rects, 4) silhouette rectangles [umin, vmin, umax, vmax].
// rect_near: (n_rects,) near depth per rectangle.
// out_segs:  (max_out, 4) atomic sub-segments.
// out_hidden:(max_out,) 1 if occluded at the midpoint.
//
// Returns the number of atomic segments written, or -1 on overflow /
// non-axis-aligned input.
int pa_node_classify(const double* segs_in, int n_segs, const double* depths,
                     const double* rects, int n_rects,
                     const double* rect_near, double* out_segs,
                     uint8_t* out_hidden, int max_out) {
  std::vector<Seg> segs(n_segs);
  for (int i = 0; i < n_segs; ++i) {
    segs[i] = {segs_in[4 * i], segs_in[4 * i + 1], segs_in[4 * i + 2],
               segs_in[4 * i + 3]};
  }

  // endpoint pool for interior-endpoint splits
  std::vector<double> ex(2 * n_segs), ey(2 * n_segs);
  for (int i = 0; i < n_segs; ++i) {
    ex[2 * i] = segs[i].ax;
    ey[2 * i] = segs[i].ay;
    ex[2 * i + 1] = segs[i].bx;
    ey[2 * i + 1] = segs[i].by;
  }

  int count = 0;
  std::vector<double> cuts;
  cuts.reserve(64);

  for (int i = 0; i < n_segs; ++i) {
    const Seg& s = segs[i];
    const bool vertical = almost_eq(s.ax, s.bx);
    const bool horizontal = almost_eq(s.ay, s.by);
    if (!vertical && !horizontal) return -1;

    cuts.clear();
    if (vertical) {
      const double x = s.ax;
      const double y0 = std::min(s.ay, s.by), y1 = std::max(s.ay, s.by);
      cuts.push_back(y0);
      cuts.push_back(y1);
      for (int j = 0; j < n_segs; ++j) {
        const Seg& o = segs[j];
        if (almost_eq(o.ay, o.by)) {  // horizontal: possible crossing
          const double ox0 = std::min(o.ax, o.bx), ox1 = std::max(o.ax, o.bx);
          if (ox0 < x && x < ox1 && y0 < o.ay && o.ay < y1)
            cuts.push_back(o.ay);
        }
      }
      for (int e = 0; e < 2 * n_segs; ++e) {
        if (almost_eq(ex[e], x) && y0 < ey[e] && ey[e] < y1)
          cuts.push_back(ey[e]);
      }
      std::sort(cuts.begin(), cuts.end());
      cuts.erase(std::unique(cuts.begin(), cuts.end()), cuts.end());
      for (size_t k = 0; k + 1 < cuts.size(); ++k) {
        if (count >= max_out) return -1;
        out_segs[4 * count] = x;
        out_segs[4 * count + 1] = cuts[k];
        out_segs[4 * count + 2] = x;
        out_segs[4 * count + 3] = cuts[k + 1];
        // midpoint occlusion test
        const double mx = x, my = (cuts[k] + cuts[k + 1]) / 2.0;
        uint8_t hid = 0;
        for (int r = 0; r < n_rects; ++r) {
          if (mx > rects[4 * r] && mx < rects[4 * r + 2] &&
              my > rects[4 * r + 1] && my < rects[4 * r + 3] &&
              rect_near[r] < depths[i]) {
            hid = 1;
            break;
          }
        }
        out_hidden[count] = hid;
        ++count;
      }
    } else {
      const double y = s.ay;
      const double x0 = std::min(s.ax, s.bx), x1 = std::max(s.ax, s.bx);
      cuts.push_back(x0);
      cuts.push_back(x1);
      for (int j = 0; j < n_segs; ++j) {
        const Seg& o = segs[j];
        if (almost_eq(o.ax, o.bx)) {  // vertical: possible crossing
          const double oy0 = std::min(o.ay, o.by), oy1 = std::max(o.ay, o.by);
          if (oy0 < y && y < oy1 && x0 < o.ax && o.ax < x1)
            cuts.push_back(o.ax);
        }
      }
      for (int e = 0; e < 2 * n_segs; ++e) {
        if (almost_eq(ey[e], y) && x0 < ex[e] && ex[e] < x1)
          cuts.push_back(ex[e]);
      }
      std::sort(cuts.begin(), cuts.end());
      cuts.erase(std::unique(cuts.begin(), cuts.end()), cuts.end());
      for (size_t k = 0; k + 1 < cuts.size(); ++k) {
        if (count >= max_out) return -1;
        out_segs[4 * count] = cuts[k];
        out_segs[4 * count + 1] = y;
        out_segs[4 * count + 2] = cuts[k + 1];
        out_segs[4 * count + 3] = y;
        const double mx = (cuts[k] + cuts[k + 1]) / 2.0, my = y;
        uint8_t hid = 0;
        for (int r = 0; r < n_rects; ++r) {
          if (mx > rects[4 * r] && mx < rects[4 * r + 2] &&
              my > rects[4 * r + 1] && my < rects[4 * r + 3] &&
              rect_near[r] < depths[i]) {
            hid = 1;
            break;
          }
        }
        out_hidden[count] = hid;
        ++count;
      }
    }
  }
  return count;
}

// Longest-first collinear cover dedupe (visible lines first), mirroring
// `remove_overlapping_lines` (`dataset/data_utils.py:179-205`).
//
// segs: (n, 4); types: (n,); out_keep: (n,) 1 = kept. Returns kept count.
int pa_dedupe_covers(const double* segs, const int32_t* types, int n,
                     uint8_t* out_keep) {
  std::vector<int> order(n);
  std::vector<double> len(n);
  for (int i = 0; i < n; ++i) {
    const double dx = segs[4 * i + 2] - segs[4 * i];
    const double dy = segs[4 * i + 3] - segs[4 * i + 1];
    len[i] = std::sqrt(dx * dx + dy * dy);
    order[i] = i;
  }
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    if (types[a] != types[b]) return types[a] < types[b];
    return len[a] > len[b];
  });

  std::vector<int> kept;
  kept.reserve(n);
  std::fill(out_keep, out_keep + n, 0);
  const double tol = 1e-12;
  for (int oi : order) {
    if (len[oi] <= 0) continue;
    bool covered = false;
    const double bx0 = std::min(segs[4 * oi], segs[4 * oi + 2]);
    const double bx1 = std::max(segs[4 * oi], segs[4 * oi + 2]);
    const double by0 = std::min(segs[4 * oi + 1], segs[4 * oi + 3]);
    const double by1 = std::max(segs[4 * oi + 1], segs[4 * oi + 3]);
    const bool b_vert = almost_eq(segs[4 * oi], segs[4 * oi + 2]);
    for (int ki : kept) {
      const bool k_vert = almost_eq(segs[4 * ki], segs[4 * ki + 2]);
      if (b_vert && k_vert && almost_eq(segs[4 * oi], segs[4 * ki])) {
        const double ky0 = std::min(segs[4 * ki + 1], segs[4 * ki + 3]);
        const double ky1 = std::max(segs[4 * ki + 1], segs[4 * ki + 3]);
        if (by0 >= ky0 - tol && by1 <= ky1 + tol) {
          covered = true;
          break;
        }
      } else if (!b_vert && !k_vert &&
                 almost_eq(segs[4 * oi + 1], segs[4 * ki + 1])) {
        const double kx0 = std::min(segs[4 * ki], segs[4 * ki + 2]);
        const double kx1 = std::max(segs[4 * ki], segs[4 * ki + 2]);
        if (bx0 >= kx0 - tol && bx1 <= kx1 + tol) {
          covered = true;
          break;
        }
      }
    }
    if (!covered) {
      kept.push_back(oi);
      out_keep[oi] = 1;
    }
  }
  return static_cast<int>(kept.size());
}

// Supersampled polyline rasterizer (raster/ViT modality input).
//
// Mirrors plankassembly_tpu/data/raster.py::rasterize_lines exactly: sample
// each segment at n = max(2, ceil(len * scale * 2)) points via linspace,
// splat max(intensity) at int-cast pixel coords on a supersample*size grid,
// then max-pool down. Parity-tested in tests/test_native.py.
//
// pts:        (total_pts, 2) concatenated polyline vertices
// offsets:    (n_lines + 1,) vertex ranges per polyline
// intensities:(n_lines,)
// out:        (size, size) float32, caller-zeroed
int pa_rasterize(const double* pts, const int32_t* offsets, int n_lines,
                 const double* intensities, int size, int supersample,
                 double world_extent, float* out) {
  const int ss = size * supersample;
  std::vector<float> img(static_cast<size_t>(ss) * ss, 0.0f);
  const double scale = ss / (2.0 * world_extent);

  for (int li = 0; li < n_lines; ++li) {
    const float inten = static_cast<float>(intensities[li]);
    for (int32_t v = offsets[li]; v + 1 < offsets[li + 1]; ++v) {
      const double px = pts[2 * v], py = pts[2 * v + 1];
      const double qx = pts[2 * v + 2], qy = pts[2 * v + 3];
      const double len = std::hypot(qx - px, qy - py);
      const int n = std::max(2, static_cast<int>(std::ceil(len * scale * 2)));
      for (int i = 0; i < n; ++i) {
        const double t = static_cast<double>(i) / (n - 1);
        const double x = px + t * (qx - px);
        const double y = py + t * (qy - py);
        int xi = static_cast<int>((x + world_extent) * scale);
        int yi = static_cast<int>((y + world_extent) * scale);
        xi = std::min(std::max(xi, 0), ss - 1);
        yi = std::min(std::max(yi, 0), ss - 1);
        float& cell = img[static_cast<size_t>(yi) * ss + xi];
        cell = std::max(cell, inten);
      }
    }
  }

  // max-pool supersample x supersample -> size x size
  for (int r = 0; r < size; ++r) {
    for (int c = 0; c < size; ++c) {
      float m = 0.0f;
      for (int dr = 0; dr < supersample; ++dr) {
        const size_t row = static_cast<size_t>(r * supersample + dr) * ss;
        for (int dc = 0; dc < supersample; ++dc) {
          m = std::max(m, img[row + c * supersample + dc]);
        }
      }
      out[static_cast<size_t>(r) * size + c] = m;
    }
  }
  return 0;
}

}  // extern "C"
