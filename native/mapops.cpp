// Native host-side map-table operations for MultiCol-SLAM TPU.
//
// The reference implements its map as pointer graphs guarded by mutexes
// (cMultiKeyFrame::UpdateConnections, cMapPoint observation multimaps); our
// map is flat arrays and these scans are the host-side hot loops of the
// bookkeeping layer (covisibility counting, observation counting, keyframe
// redundancy). Pure C ABI over raw buffers (ctypes binding, no pybind11) so
// the Python shell stays dependency-free. All functions are reentrant and
// operate on the caller's arrays; BAD_ID = -1 marks empty slots.
//
// Build: g++ -O3 -march=native -shared -fPIC mapops.cpp -o libmapops.so

#include <cstdint>
#include <cstring>
#include <unordered_set>
#include <vector>

extern "C" {

// counts[j] = number of map points shared between keyframe k and keyframe j
// (the covisibility weights, cMultiKeyFrame.cpp:412-500).
void covisibility_counts(const int32_t* kf_point,  // [K, F]
                         const uint8_t* kf_valid,  // [K]
                         int64_t K, int64_t F, int64_t k,
                         int32_t* counts /* [K] out */) {
  std::unordered_set<int32_t> pts;
  const int32_t* row_k = kf_point + k * F;
  for (int64_t f = 0; f < F; ++f)
    if (row_k[f] >= 0) pts.insert(row_k[f]);
  for (int64_t j = 0; j < K; ++j) {
    counts[j] = 0;
    if (j == k || !kf_valid[j]) continue;
    const int32_t* row = kf_point + j * F;
    int32_t c = 0;
    for (int64_t f = 0; f < F; ++f)
      if (row[f] >= 0 && pts.count(row[f])) ++c;
    counts[j] = c;
  }
}

// Bitmap variant: a hash probe per table cell dominated the scan on large
// maps (this runs 10+ times per tracked frame via the local-map assembly);
// the caller passes the point-id capacity P for a dense membership bitmap.
void covisibility_counts2(const int32_t* kf_point, const uint8_t* kf_valid,
                          int64_t K, int64_t F, int64_t k, int64_t P,
                          int32_t* counts /* [K] out */) {
  std::vector<uint8_t> mask((size_t)P, 0);
  const int32_t* row_k = kf_point + k * F;
  for (int64_t f = 0; f < F; ++f) {
    int32_t p = row_k[f];
    if (p >= 0 && p < P) mask[p] = 1;
  }
  for (int64_t j = 0; j < K; ++j) {
    counts[j] = 0;
    if (j == k || !kf_valid[j]) continue;
    const int32_t* row = kf_point + j * F;
    int32_t c = 0;
    for (int64_t f = 0; f < F; ++f) {
      int32_t p = row[f];
      if (p >= 0 && p < P && mask[p]) ++c;
    }
    counts[j] = c;
  }
}

// n_obs[i] = number of (keyframe, feature) slots observing pt_ids[i].
void count_observations(const int32_t* kf_point, const uint8_t* kf_valid,
                        int64_t K, int64_t F,
                        const int32_t* pt_ids, int64_t n_pts,
                        int32_t* n_obs /* [n_pts] out */) {
  // map point id -> position (ids are arbitrary; use a flat lookup when
  // dense enough, else hash)
  int32_t max_id = -1;
  for (int64_t i = 0; i < n_pts; ++i)
    if (pt_ids[i] > max_id) max_id = pt_ids[i];
  std::vector<int32_t> lut((size_t)max_id + 1, -1);
  for (int64_t i = 0; i < n_pts; ++i) lut[pt_ids[i]] = (int32_t)i;
  std::memset(n_obs, 0, sizeof(int32_t) * (size_t)n_pts);
  for (int64_t j = 0; j < K; ++j) {
    if (!kf_valid[j]) continue;
    const int32_t* row = kf_point + j * F;
    for (int64_t f = 0; f < F; ++f) {
      int32_t p = row[f];
      if (p >= 0 && p <= max_id && lut[p] >= 0) ++n_obs[lut[p]];
    }
  }
}

// For keyframe culling (cLocalMapping.cpp:520-597): for every feature slot
// of keyframe j with a map point, count how many OTHER keyframes observe
// the same point at octave <= level+1. redundant[f] receives that count
// (0 for empty slots).
void redundancy_counts(const int32_t* kf_point, const int32_t* kf_octave,
                       const uint8_t* kf_valid, int64_t K, int64_t F,
                       int64_t j, int32_t* redundant /* [F] out */) {
  const int32_t* row_j = kf_point + j * F;
  const int32_t* oct_j = kf_octave + j * F;
  std::memset(redundant, 0, sizeof(int32_t) * (size_t)F);
  // invert: point id -> feature slot in j (points can appear in multiple
  // slots of j — multi-camera observations; count for each)
  for (int64_t k = 0; k < K; ++k) {
    if (k == j || !kf_valid[k]) continue;
    const int32_t* row = kf_point + k * F;
    const int32_t* oct = kf_octave + k * F;
    for (int64_t f = 0; f < F; ++f) {
      int32_t p = row[f];
      if (p < 0) continue;
      // scan j's slots for the same point (rare hit; inner scan bounded by
      // the few duplicate observations) — precompute per-call hash instead
      for (int64_t g = 0; g < F; ++g) {
        if (row_j[g] == p && oct[f] <= oct_j[g] + 1) ++redundant[g];
      }
    }
  }
}

// Fast variant of redundancy_counts using a lookup table (id -> slot list).
void redundancy_counts_fast(const int32_t* kf_point, const int32_t* kf_octave,
                            const uint8_t* kf_valid, int64_t K, int64_t F,
                            int64_t j, int32_t* redundant) {
  const int32_t* row_j = kf_point + j * F;
  const int32_t* oct_j = kf_octave + j * F;
  std::memset(redundant, 0, sizeof(int32_t) * (size_t)F);
  int32_t max_id = -1;
  for (int64_t g = 0; g < F; ++g)
    if (row_j[g] > max_id) max_id = row_j[g];
  if (max_id < 0) return;
  // head/next linked lists over slots sharing a point
  std::vector<int32_t> head((size_t)max_id + 1, -1), next((size_t)F, -1);
  for (int64_t g = 0; g < F; ++g) {
    int32_t p = row_j[g];
    if (p >= 0) { next[g] = head[p]; head[p] = (int32_t)g; }
  }
  for (int64_t k = 0; k < K; ++k) {
    if (k == j || !kf_valid[k]) continue;
    const int32_t* row = kf_point + k * F;
    const int32_t* oct = kf_octave + k * F;
    for (int64_t f = 0; f < F; ++f) {
      int32_t p = row[f];
      if (p < 0 || p > max_id || head[p] < 0) continue;
      for (int32_t g = head[p]; g >= 0; g = next[g])
        if (oct[f] <= oct_j[g] + 1) ++redundant[g];
    }
  }
}

// votes[j] = number of feature slots of keyframe j whose point id is flagged
// in seed_mask (the tracker's per-frame local-map vote,
// cTracking.cpp:961-1130 UpdateReferenceKeyFrames). One linear pass over the
// table: the numpy np.isin equivalent re-hashes the seed set per call and
// dominated host time on large maps.
void vote_counts(const int32_t* kf_point, const uint8_t* kf_valid,
                 int64_t K, int64_t F,
                 const uint8_t* seed_mask, int64_t P,
                 int32_t* votes /* [K] out */) {
  for (int64_t j = 0; j < K; ++j) {
    votes[j] = 0;
    if (!kf_valid[j]) continue;
    const int32_t* row = kf_point + j * F;
    int32_t c = 0;
    for (int64_t f = 0; f < F; ++f) {
      int32_t p = row[f];
      if (p >= 0 && p < P && seed_mask[p]) ++c;
    }
    votes[j] = c;
  }
}

// Every (keyframe, feature) slot whose point id is flagged in mask: the
// batched observation gather behind update_point_stats_many / orphan
// re-homing. Writes up to max_out hits into (out_k, out_f, out_p); returns
// the TOTAL hit count (callers size max_out from the incremental pt_nobs
// counts and re-invoke with a larger buffer if it ever undershoots).
int64_t find_slots(const int32_t* kf_point, const uint8_t* kf_valid,
                   int64_t K, int64_t F,
                   const uint8_t* mask, int64_t P,
                   int32_t* out_k, int32_t* out_f, int32_t* out_p,
                   int64_t max_out) {
  int64_t n = 0;
  for (int64_t j = 0; j < K; ++j) {
    if (!kf_valid[j]) continue;
    const int32_t* row = kf_point + j * F;
    for (int64_t f = 0; f < F; ++f) {
      int32_t p = row[f];
      if (p >= 0 && p < P && mask[p]) {
        if (n < max_out) {
          out_k[n] = (int32_t)j;
          out_f[n] = (int32_t)f;
          out_p[n] = p;
        }
        ++n;
      }
    }
  }
  return n;
}

}  // extern "C"
