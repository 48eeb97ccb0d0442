// Native host runtime: detection-graph builder, window splitter, raster
// window cropper.
//
// These are the host-side data-pipeline hot paths of the framework — the
// TPU-native equivalents of the pieces the reference delegates to native
// third-party code (torch_scatter's C++ scatter for graph assembly,
// rasterio/GDAL's C window reads, SatCam.get_windowed_image's padded crop).
// The estimation compute path stays in XLA; this library feeds it.
//
// Exposed via a C ABI for ctypes (no pybind11 in the image).  Semantics
// mirror vinsat_tpu/estimation/ingest.py exactly; tests cross-check both.

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Build the knot list + obs->knot index from sorted detection frames.
//   frames:      [m] detection frame numbers (sorted ascending)
//   m:           number of detections
//   stride:      filler-knot stride in frames (1000)
//   orbit_len:   total frames in the arc
//   ii_out:      [m] obs -> knot index (output)
//   knots_out:   [capacity] knot frame numbers (output)
//   capacity:    size of knots_out
// Returns number of knots, or -1 if capacity was insufficient.
int64_t vt_build_graph(const int64_t* frames, int64_t m, int64_t stride,
                       int64_t orbit_len, int64_t* ii_out,
                       int64_t* knots_out, int64_t capacity) {
  if (m == 0) return 0;
  int64_t n = 0;
  int64_t filler = frames[0] / stride + 1;
  int64_t det_knots = 0;  // unique detection frames seen
  int64_t i = 0;
  while (i < m) {
    int64_t t = frames[i];
    while (filler * stride < t) {
      if (n >= capacity) return -1;
      knots_out[n++] = filler * stride;
      ++filler;
    }
    if (filler * stride == t) ++filler;
    if (n >= capacity) return -1;
    knots_out[n] = t;
    while (i < m && frames[i] == t) {
      ii_out[i] = n;
      ++i;
    }
    ++n;
    ++det_knots;
  }
  int64_t last_det = frames[m - 1];
  if (last_det < orbit_len) {
    int64_t limit = (orbit_len / stride) * stride + 1;
    while (filler * stride < limit) {
      if (n >= capacity) return -1;
      knots_out[n++] = filler * stride;
      ++filler;
    }
  }
  (void)det_knots;
  return n;
}

// Window splitting (identify_next_batch_new semantics, od_pipe.py:898-905):
// the contiguous counter accumulates across the scan.
//   ii:        [m] obs -> knot index
//   knot_t:    [n] knot frame numbers
//   wins_out:  [3*max_wins] rows of (t_final, i_final, seq_end)
// Returns number of windows.
int64_t vt_split_windows(const int64_t* ii, int64_t m, const int64_t* knot_t,
                         int64_t n, int64_t contiguous_gap,
                         int64_t split_gap, int64_t min_contiguous,
                         int64_t* wins_out, int64_t max_wins) {
  (void)n;
  int64_t w = 0;
  int64_t i = 0;
  while (true) {
    int64_t contiguous = 0;
    bool found = false;
    for (int64_t j = i + 1; j < m; ++j) {
      int64_t gap = knot_t[ii[j]] - knot_t[ii[j - 1]];
      if (gap < contiguous_gap) ++contiguous;
      if (gap > split_gap && contiguous > min_contiguous) {
        if (w >= max_wins) return -1;
        wins_out[3 * w + 0] = ii[j - 1] + 1;
        wins_out[3 * w + 1] = j;
        wins_out[3 * w + 2] = 0;
        ++w;
        i = j;
        found = true;
        break;
      }
    }
    if (!found) {
      if (w >= max_wins) return -1;
      wins_out[3 * w + 0] = ii[m - 1] + 1;
      wins_out[3 * w + 1] = m;
      wins_out[3 * w + 2] = 1;
      return w + 1;
    }
  }
}

// Zero-padded window crop (get_windowed_image, SatCam.py:318-361):
// copies data[y0:y0+oh, x0:x0+ow, :] into out, zero-filling out-of-bounds.
void vt_crop_window(const uint8_t* data, int64_t h, int64_t w, int64_t c,
                    int64_t y0, int64_t x0, int64_t oh, int64_t ow,
                    uint8_t* out) {
  std::memset(out, 0, static_cast<size_t>(oh * ow * c));
  int64_t ys = std::max<int64_t>(0, y0);
  int64_t ye = std::min<int64_t>(h, y0 + oh);
  int64_t xs = std::max<int64_t>(0, x0);
  int64_t xe = std::min<int64_t>(w, x0 + ow);
  if (ys >= ye || xs >= xe) return;
  int64_t row_bytes = (xe - xs) * c;
  for (int64_t y = ys; y < ye; ++y) {
    const uint8_t* src = data + (y * w + xs) * c;
    uint8_t* dst = out + ((y - y0) * ow + (xs - x0)) * c;
    std::memcpy(dst, src, static_cast<size_t>(row_bytes));
  }
}

// Gating + compaction counts (remove_elems, od_pipe.py:253-288): given a
// keep mask over observations, mark knots that survive (have >=1 kept obs
// or sit on the stride) and re-index ii.  Outputs:
//   keep_knot_out: [n] 0/1
//   ii_new_out:    [m_kept] re-indexed obs->knot (caller pre-filters ii by
//                  mask order; m_kept = number of 1s in mask)
// Returns number of kept knots.
int64_t vt_compact_graph(const int64_t* ii, const uint8_t* mask, int64_t m,
                         const int64_t* knot_t, int64_t n, int64_t stride,
                         uint8_t* keep_knot_out, int64_t* ii_new_out) {
  for (int64_t k = 0; k < n; ++k)
    keep_knot_out[k] = (knot_t[k] % stride == 0) ? 1 : 0;
  for (int64_t j = 0; j < m; ++j)
    if (mask[j]) keep_knot_out[ii[j]] = 1;
  // prefix map old knot -> new index
  int64_t* newidx = new int64_t[n];
  int64_t kept = 0;
  for (int64_t k = 0; k < n; ++k) {
    newidx[k] = kept;
    kept += keep_knot_out[k];
  }
  int64_t idx = 0;
  for (int64_t j = 0; j < m; ++j) {
    if (!mask[j]) continue;
    ii_new_out[idx++] = newidx[ii[j]];
  }
  delete[] newidx;
  return kept;
}

}  // extern "C"
