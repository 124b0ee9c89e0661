// Native pack pass: COO -> tiled 8xBK block-sparse format.
//
// C++ re-implementation of the preprocessing hot loop, the TPU-native
// equivalent of the reference's C++ host preprocessing stack
// (window tiler / PE assigner src/sparse_helper.h:345-403, OoO scheduler
// src/sparse_helper.h:292-342, edge encoder src/sparse_helper.h:406-473).
// Produces bit-identical output to the NumPy pack() in format/pack.py,
// ~20x faster on large matrices (single pass + one sort instead of
// lexsort + fancy indexing + ufunc.at).
//
// Build: make -C sextans_tpu/runtime   (g++ -O3 -shared -fPIC)
// ABI: plain C functions, consumed via ctypes (runtime/native.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Plan {
  // parameters
  int64_t nnz = 0;
  int32_t tile_m = 0, window_k = 0, block_k = 0, group_blocks = 0;
  int32_t interleave = 1;
  int32_t mode = 0;     // 0 = VPU 8xBK blocks, 1 = MXU BKx128 slabs
  int64_t n_mtiles = 0, n_kwins = 0;
  int32_t tmq = 0;      // stripes (VPU) or 128-row slabs (MXU) per tile
  int64_t bpw = 0;      // block columns per window
  // derived per-edge (sorted)
  std::vector<int64_t> order;     // edge permutation, sorted by block key
  std::vector<uint64_t> keys;     // sorted block key per edge
  // per-block
  int64_t nb = 0;
  std::vector<int64_t> blk_first;   // first edge index (into order) per block
  std::vector<int32_t> b_mt, b_kw, b_q, b_c;
  // schedule
  std::vector<int64_t> sched;       // block permutation
  std::vector<int64_t> dst_group, dst_slot;
  int64_t njobs = 0;
  int64_t ngroups = 0;              // incl. empty-mtile pad groups
  int64_t ngroups_real = 0;
  std::vector<int32_t> missing_mtiles;
};

inline uint64_t edge_key(int32_t row, int32_t col, const Plan& p) {
  const int64_t mt = row / p.tile_m;
  const int64_t kw = col / p.window_k;
  const int64_t q = (row >> (p.mode ? 7 : 3)) - mt * p.tmq;
  const int64_t bcl = (col % p.window_k) / p.block_k;
  return (((static_cast<uint64_t>(mt) * p.n_kwins + kw) * p.tmq + q) * p.bpw) +
         bcl;
}

// LSD radix sort of `idx` by `key[idx]`, 11 bits per pass, only over the
// significant bits of max_key. ~4x faster than std::sort at 20M+ edges.
void radix_sort_by_key(std::vector<int64_t>& idx,
                       const std::vector<uint64_t>& key, uint64_t max_key) {
  constexpr int BITS = 11;
  constexpr size_t BUCKETS = size_t{1} << BITS;
  int total_bits = 1;
  while ((max_key >> total_bits) != 0) ++total_bits;
  const int passes = (total_bits + BITS - 1) / BITS;

  const size_t n = idx.size();
  std::vector<int64_t> tmp(n);
  std::vector<size_t> count(BUCKETS);
  int64_t* src = idx.data();
  int64_t* dst = tmp.data();
  for (int pass = 0; pass < passes; ++pass) {
    const int shift = pass * BITS;
    std::fill(count.begin(), count.end(), 0);
    for (size_t i = 0; i < n; ++i)
      ++count[(key[src[i]] >> shift) & (BUCKETS - 1)];
    size_t sum = 0;
    for (size_t b = 0; b < BUCKETS; ++b) {
      const size_t c = count[b];
      count[b] = sum;
      sum += c;
    }
    for (size_t i = 0; i < n; ++i)
      dst[count[(key[src[i]] >> shift) & (BUCKETS - 1)]++] = src[i];
    std::swap(src, dst);
  }
  if (src != idx.data()) std::copy(src, src + n, idx.data());
}

}  // namespace

extern "C" {

// Phase 1: sort edges, identify blocks/jobs, build the schedule.
// mode 0 = VPU 8xBK blocks; mode 1 = MXU BKx128 dense slabs (no interleave,
// 128-row slab granularity). Returns an opaque handle (nullptr on error).
static void* pack_plan_impl(int64_t nnz, const int32_t* rows,
                            const int32_t* cols, int64_t m, int64_t k,
                            int32_t tile_m, int32_t window_k, int32_t block_k,
                            int32_t group_blocks, int32_t interleave,
                            int32_t mode) {
  if (tile_m <= 0 || tile_m % 8 != 0 || block_k <= 0 ||
      window_k % block_k != 0 || group_blocks <= 0)
    return nullptr;
  if (mode == 1 && (tile_m % 128 != 0 || block_k % 8 != 0)) return nullptr;
  Plan* p = new Plan();
  p->nnz = nnz;
  p->tile_m = tile_m;
  p->window_k = window_k;
  p->block_k = block_k;
  p->group_blocks = group_blocks;
  p->interleave = mode == 1 ? 0 : interleave;
  p->mode = mode;
  p->tmq = tile_m / (mode ? 128 : 8);
  p->bpw = window_k / block_k;
  p->n_mtiles = std::max<int64_t>(1, (m + tile_m - 1) / tile_m);
  p->n_kwins = std::max<int64_t>(1, (k + window_k - 1) / window_k);

  // --- sort edges by block key (stable not required: equal keys = same block)
  p->order.resize(nnz);
  std::vector<uint64_t> key(nnz);
  uint64_t max_key = 0;
  for (int64_t i = 0; i < nnz; ++i) {
    key[i] = edge_key(rows[i], cols[i], *p);
    if (key[i] > max_key) max_key = key[i];
    p->order[i] = i;
  }
  if (nnz >= (int64_t{1} << 20)) {
    // LSD radix sort is stable by construction.
    radix_sort_by_key(p->order, key, max_key);
  } else {
    // stable_sort so duplicate COO coordinates are summed into their block
    // slot in input order — bit-identical to NumPy's stable lexsort +
    // np.add.at on every path.
    std::stable_sort(p->order.begin(), p->order.end(),
                     [&key](int64_t a, int64_t b) { return key[a] < key[b]; });
  }
  p->keys.resize(nnz);
  for (int64_t i = 0; i < nnz; ++i) p->keys[i] = key[p->order[i]];

  // --- identify blocks (runs of equal key) ---
  const uint64_t job_div = p->tmq * p->bpw;  // key/job_div = (mt, kw) job id
  std::vector<int64_t>& bf = p->blk_first;
  for (int64_t i = 0; i < nnz; ++i)
    if (i == 0 || p->keys[i] != p->keys[i - 1]) bf.push_back(i);
  p->nb = static_cast<int64_t>(bf.size());
  const int64_t nb = p->nb;
  p->b_mt.resize(nb);
  p->b_kw.resize(nb);
  p->b_q.resize(nb);
  p->b_c.resize(nb);
  std::vector<int64_t> job_of(nb);
  for (int64_t bidx = 0; bidx < nb; ++bidx) {
    const uint64_t kk = p->keys[bf[bidx]];
    const uint64_t job = kk / job_div;
    const uint64_t within = kk % job_div;
    job_of[bidx] = static_cast<int64_t>(job);
    p->b_mt[bidx] = static_cast<int32_t>(job / p->n_kwins);
    p->b_kw[bidx] = static_cast<int32_t>(job % p->n_kwins);
    p->b_q[bidx] = static_cast<int32_t>(within / p->bpw);
    p->b_c[bidx] = static_cast<int32_t>((within % p->bpw) * p->block_k);
  }

  // --- jobs (runs of equal job id) ---
  std::vector<int64_t> job_start;  // block index where each job starts
  for (int64_t bidx = 0; bidx < nb; ++bidx)
    if (bidx == 0 || job_of[bidx] != job_of[bidx - 1]) job_start.push_back(bidx);
  job_start.push_back(nb);
  p->njobs = static_cast<int64_t>(job_start.size()) - 1;

  // --- schedule: round-robin across stripes inside each job ---
  p->sched.resize(nb);
  if (p->interleave) {
    std::vector<int64_t> run_start;  // per-stripe runs inside a job
    for (int64_t j = 0; j < p->njobs; ++j) {
      const int64_t lo = job_start[j], hi = job_start[j + 1];
      run_start.clear();
      for (int64_t bidx = lo; bidx < hi; ++bidx)
        if (bidx == lo || p->b_q[bidx] != p->b_q[bidx - 1])
          run_start.push_back(bidx);
      run_start.push_back(hi);
      const int64_t nruns = static_cast<int64_t>(run_start.size()) - 1;
      // emit rank r of every stripe run, round-robin
      int64_t out = lo;
      std::vector<int64_t> cursor(nruns);
      for (int64_t r = 0; r < nruns; ++r) cursor[r] = run_start[r];
      int64_t active = nruns;
      while (active > 0) {
        int64_t next_active = 0;
        for (int64_t r = 0; r < nruns; ++r) {
          if (cursor[r] < run_start[r + 1]) {
            p->sched[out++] = cursor[r]++;
            if (cursor[r] < run_start[r + 1]) ++next_active;
          }
        }
        active = next_active;
      }
    }
  } else {
    for (int64_t bidx = 0; bidx < nb; ++bidx) p->sched[bidx] = bidx;
  }

  // --- group assignment (pad each job to a multiple of group_blocks) ---
  const int64_t G = p->group_blocks;
  p->dst_group.resize(nb);
  p->dst_slot.resize(nb);
  int64_t grp = 0;
  for (int64_t j = 0; j < p->njobs; ++j) {
    const int64_t lo = job_start[j], hi = job_start[j + 1];
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t pos = i - lo;
      p->dst_group[i] = grp + pos / G;
      p->dst_slot[i] = pos % G;
    }
    grp += (hi - lo + G - 1) / G;
  }
  p->ngroups_real = grp;

  // --- empty m-tiles need an epilogue group ---
  std::vector<char> present(p->n_mtiles, 0);
  for (int64_t bidx = 0; bidx < nb; ++bidx) present[p->b_mt[bidx]] = 1;
  for (int64_t t = 0; t < p->n_mtiles; ++t)
    if (!present[t]) p->missing_mtiles.push_back(static_cast<int32_t>(t));
  p->ngroups = p->ngroups_real + static_cast<int64_t>(p->missing_mtiles.size());

  return p;
}

void* sx_pack_plan(int64_t nnz, const int32_t* rows, const int32_t* cols,
                   int64_t m, int64_t k, int32_t tile_m, int32_t window_k,
                   int32_t block_k, int32_t group_blocks, int32_t interleave) {
  return pack_plan_impl(nnz, rows, cols, m, k, tile_m, window_k, block_k,
                        group_blocks, interleave, /*mode=*/0);
}

void* sx_pack_plan_mxu(int64_t nnz, const int32_t* rows, const int32_t* cols,
                       int64_t m, int64_t k, int32_t tile_m, int32_t window_k,
                       int32_t block_k, int32_t group_blocks) {
  return pack_plan_impl(nnz, rows, cols, m, k, tile_m, window_k, block_k,
                        group_blocks, /*interleave=*/0, /*mode=*/1);
}

int64_t sx_plan_nblocks(void* h) { return static_cast<Plan*>(h)->nb; }
int64_t sx_plan_ngroups(void* h) { return static_cast<Plan*>(h)->ngroups; }
int64_t sx_plan_njobs(void* h) { return static_cast<Plan*>(h)->njobs; }
int64_t sx_plan_nempty(void* h) {
  return static_cast<int64_t>(static_cast<Plan*>(h)->missing_mtiles.size());
}

// Phase 2: fill caller-allocated output arrays.
//   vp:          (ngroups, 8, G*bk) float32, zero-initialized by caller
//   qrow, bcol:  (ngroups, G) int32, zero-initialized
//   group_mtile: (ngroups+1,) int32
//   group_kwin:  (ngroups,) int32, zero-initialized
void sx_pack_fill(void* h, const int32_t* rows, const int32_t* cols,
                  const float* vals, float* vp, int32_t* qrow, int32_t* bcol,
                  int32_t* group_mtile, int32_t* group_kwin) {
  Plan* p = static_cast<Plan*>(h);
  const int64_t G = p->group_blocks, bk = p->block_k;
  const int64_t lane_w = G * bk;          // lanes per vp group-row
  const int64_t vp_group_sz = 8 * lane_w;  // floats per vp group

  // scheduled position of each block
  std::vector<int64_t> dstg_of_block(p->nb), dsts_of_block(p->nb);
  for (int64_t i = 0; i < p->nb; ++i) {
    dstg_of_block[p->sched[i]] = p->dst_group[i];
    dsts_of_block[p->sched[i]] = p->dst_slot[i];
  }

  // per-block metadata + group steering
  for (int64_t bidx = 0; bidx < p->nb; ++bidx) {
    const int64_t g = dstg_of_block[bidx], s = dsts_of_block[bidx];
    qrow[g * G + s] = p->b_q[bidx];
    bcol[g * G + s] = p->b_c[bidx];
    group_mtile[g] = p->b_mt[bidx];
    group_kwin[g] = p->b_kw[bidx];
  }
  // edge values, accumulated per block (duplicate coordinates sum)
  for (int64_t b = 0; b < p->nb; ++b) {
    const int64_t lo = p->blk_first[b];
    const int64_t hi = (b + 1 < p->nb) ? p->blk_first[b + 1] : p->nnz;
    const int64_t g = dstg_of_block[b], s = dsts_of_block[b];
    float* dst = vp + g * vp_group_sz;
    const int64_t lane0 = s * bk;
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t e = p->order[i];
      const int32_t r = rows[e] & 7;
      const int32_t j = cols[e] % p->block_k;
      dst[r * lane_w + lane0 + j] += vals[e];
    }
  }

  // empty-mtile epilogue groups + sentinel
  for (size_t i = 0; i < p->missing_mtiles.size(); ++i)
    group_mtile[p->ngroups_real + static_cast<int64_t>(i)] =
        p->missing_mtiles[i];
  group_mtile[p->ngroups] = -1;
}

// Phase 2 (MXU dense-slab format): fill caller-allocated outputs.
//   vp:          (ngroups, G*bk, 128) float32, zero-initialized by caller
//   qm, bcol:    (ngroups, G) int32, zero-initialized
//   group_mtile: (ngroups+1,) int32; group_kwin: (ngroups,) int32
void sx_pack_fill_mxu(void* h, const int32_t* rows, const int32_t* cols,
                      const float* vals, float* vp, int32_t* qm, int32_t* bcol,
                      int32_t* group_mtile, int32_t* group_kwin) {
  Plan* p = static_cast<Plan*>(h);
  const int64_t G = p->group_blocks, bk = p->block_k;
  const int64_t vp_group_sz = G * bk * 128;

  for (int64_t bidx = 0; bidx < p->nb; ++bidx) {
    // sched is identity in MXU mode: dst arrays index blocks directly
    const int64_t g = p->dst_group[bidx], s = p->dst_slot[bidx];
    qm[g * G + s] = p->b_q[bidx];
    bcol[g * G + s] = p->b_c[bidx];
    group_mtile[g] = p->b_mt[bidx];
    group_kwin[g] = p->b_kw[bidx];
  }
  for (int64_t b = 0; b < p->nb; ++b) {
    const int64_t lo = p->blk_first[b];
    const int64_t hi = (b + 1 < p->nb) ? p->blk_first[b + 1] : p->nnz;
    const int64_t g = p->dst_group[b], s = p->dst_slot[b];
    float* dst = vp + g * vp_group_sz + s * bk * 128;
    for (int64_t i = lo; i < hi; ++i) {
      const int64_t e = p->order[i];
      const int32_t kk = cols[e] % p->block_k;
      const int32_t mm = rows[e] & 127;
      dst[static_cast<int64_t>(kk) * 128 + mm] += vals[e];
    }
  }
  for (size_t i = 0; i < p->missing_mtiles.size(); ++i)
    group_mtile[p->ngroups_real + static_cast<int64_t>(i)] =
        p->missing_mtiles[i];
  group_mtile[p->ngroups] = -1;
}

void sx_pack_free(void* h) { delete static_cast<Plan*>(h); }

}  // extern "C"

// ---------------------------------------------------------------------------
// Edge-stream pack (format/pack_edge.py twin): one record per nonzero,
// CSR-sorted within (M-tile, K-window) jobs, row runs padded to edge_lanes
// multiples, jobs padded to edge_chunk multiples. Bit-identical arrays to
// the NumPy pack_edge (tests/test_native_edge.py).

namespace {

struct EdgePlan {
  int64_t nnz = 0;
  int32_t tile_m = 0, window_k = 0, E = 0, L = 0;
  int64_t n_mtiles = 0, n_kwins = 0;
  std::vector<int64_t> order;   // edges sorted by (mt, kw, row, col), stable
  std::vector<int64_t> dst;     // flat slot per sorted edge
  std::vector<uint8_t> real_end;  // row_end flag per sorted edge
  int64_t n_chunks = 0;           // real chunks (before empty-mtile pads)
  int64_t n_jobs = 0;
  std::vector<int32_t> chunk_mt, chunk_kw;  // per real chunk
  std::vector<int32_t> missing_mtiles;
  // pad slots (run padding): flat slot, row_local, is_final
  std::vector<int64_t> pad_dst;
  std::vector<int32_t> pad_row;
  std::vector<uint8_t> pad_final;
};

}  // namespace

extern "C" {

void* sx_pack_plan_edge(int64_t nnz, const int32_t* rows, const int32_t* cols,
                        int64_t m, int64_t k, int32_t tile_m, int32_t window_k,
                        int32_t edge_chunk, int32_t edge_lanes) {
  if (tile_m <= 0 || window_k <= 0 || edge_chunk <= 0 || edge_lanes <= 0 ||
      edge_chunk % edge_lanes != 0 || tile_m > (1 << 14) ||
      window_k > (1 << 15))
    return nullptr;
  EdgePlan* p = new EdgePlan();
  p->nnz = nnz;
  p->tile_m = tile_m;
  p->window_k = window_k;
  p->E = edge_chunk;
  p->L = edge_lanes;
  p->n_mtiles = std::max<int64_t>(1, (m + tile_m - 1) / tile_m);
  p->n_kwins = std::max<int64_t>(1, (k + window_k - 1) / window_k);

  // sort by (mt, kw, row_local, col_local) == (mt, kw, row, col)
  p->order.resize(nnz);
  std::vector<uint64_t> key(nnz);
  uint64_t max_key = 0;
  const uint64_t tmwk = static_cast<uint64_t>(tile_m) * window_k;
  for (int64_t i = 0; i < nnz; ++i) {
    const uint64_t mt = static_cast<uint64_t>(rows[i]) / tile_m;
    const uint64_t kw = static_cast<uint64_t>(cols[i]) / window_k;
    const uint64_t rl = static_cast<uint64_t>(rows[i]) % tile_m;
    const uint64_t cl = static_cast<uint64_t>(cols[i]) % window_k;
    key[i] = ((mt * p->n_kwins + kw) * tile_m + rl) * window_k + cl;
    if (key[i] > max_key) max_key = key[i];
    p->order[i] = i;
  }
  if (nnz >= (int64_t{1} << 20)) {
    radix_sort_by_key(p->order, key, max_key);
  } else {
    std::stable_sort(p->order.begin(), p->order.end(),
                     [&key](int64_t a, int64_t b) { return key[a] < key[b]; });
  }

  // runs and jobs over the sorted stream; assign destinations in one pass
  const int64_t E = p->E, L = p->L;
  const uint64_t job_div = tmwk;  // key / job_div = job id, and
                                  // (key / window_k) identifies (job, row)
  int64_t chunk_base = 0;   // first chunk of the current job
  int64_t off_in_job = 0;   // padded offset inside the current job
  uint64_t cur_job = ~uint64_t{0};
  uint64_t cur_rowkey = ~uint64_t{0};
  int64_t run_len = 0;      // edges so far in the current run
  int32_t run_row = 0;
  p->dst.resize(nnz);
  p->real_end.assign(nnz, 0);
  if (nnz > 0) p->n_jobs = 0;

  auto close_run = [&](int64_t sorted_end_idx) {
    // pad the finished run to a multiple of L; mark real_end on its last
    // edge iff no padding was needed
    if (run_len == 0) return;
    const int64_t padded = ((run_len + L - 1) / L) * L;
    const int64_t npad = padded - run_len;
    if (npad == 0) {
      p->real_end[sorted_end_idx - 1] = 1;
    } else {
      for (int64_t t = 0; t < npad; ++t) {
        p->pad_dst.push_back(chunk_base * E + off_in_job + run_len + t);
        p->pad_row.push_back(run_row);
        p->pad_final.push_back(t == npad - 1 ? 1 : 0);
      }
    }
    off_in_job += padded;
    run_len = 0;
  };
  auto close_job = [&]() {
    const int64_t jchunks = (off_in_job + E - 1) / E;
    chunk_base += jchunks;
    off_in_job = 0;
  };

  for (int64_t i = 0; i < nnz; ++i) {
    const uint64_t kk = key[p->order[i]];
    const uint64_t job = kk / job_div;
    const uint64_t rowkey = kk / window_k;  // (job, row_local)
    if (job != cur_job) {
      close_run(i);
      if (cur_job != ~uint64_t{0}) close_job();
      cur_job = job;
      cur_rowkey = ~uint64_t{0};
      ++p->n_jobs;
      // record the job -> chunk steering lazily per chunk below
    }
    if (rowkey != cur_rowkey) {
      close_run(i);
      cur_rowkey = rowkey;
      run_row = static_cast<int32_t>((kk / window_k) % tile_m);
    }
    p->dst[i] = chunk_base * E + off_in_job + run_len;
    ++run_len;
  }
  close_run(nnz);
  if (cur_job != ~uint64_t{0}) close_job();
  p->n_chunks = chunk_base;

  // chunk steering: replay job boundaries (second cheap pass over blocks)
  p->chunk_mt.resize(p->n_chunks);
  p->chunk_kw.resize(p->n_chunks);
  {
    int64_t cb = 0, oij = 0, rl2 = 0;
    uint64_t cj = ~uint64_t{0}, crk = ~uint64_t{0};
    auto flush_job = [&](uint64_t job) {
      const int64_t jchunks = (oij + E - 1) / E;
      const int32_t mt = static_cast<int32_t>(job / p->n_kwins);
      const int32_t kw = static_cast<int32_t>(job % p->n_kwins);
      for (int64_t c = 0; c < jchunks; ++c) {
        p->chunk_mt[cb + c] = mt;
        p->chunk_kw[cb + c] = kw;
      }
      cb += jchunks;
      oij = 0;
    };
    for (int64_t i = 0; i < nnz; ++i) {
      const uint64_t kk = key[p->order[i]];
      const uint64_t job = kk / job_div;
      const uint64_t rowkey = kk / window_k;
      if (job != cj) {
        if (rl2) { oij += ((rl2 + L - 1) / L) * L; rl2 = 0; }
        if (cj != ~uint64_t{0}) flush_job(cj);
        cj = job;
        crk = ~uint64_t{0};
      }
      if (rowkey != crk) {
        if (rl2) { oij += ((rl2 + L - 1) / L) * L; rl2 = 0; }
        crk = rowkey;
      }
      ++rl2;
    }
    if (rl2) oij += ((rl2 + L - 1) / L) * L;
    if (cj != ~uint64_t{0}) flush_job(cj);
  }

  // empty m-tiles get an all-padding epilogue chunk each
  std::vector<char> present(p->n_mtiles, 0);
  for (int64_t c = 0; c < p->n_chunks; ++c) present[p->chunk_mt[c]] = 1;
  for (int64_t t = 0; t < p->n_mtiles; ++t)
    if (!present[t]) p->missing_mtiles.push_back(static_cast<int32_t>(t));
  return p;
}

int64_t sx_edge_nchunks(void* h) {
  EdgePlan* p = static_cast<EdgePlan*>(h);
  return p->n_chunks + static_cast<int64_t>(p->missing_mtiles.size());
}
int64_t sx_edge_njobs(void* h) { return static_cast<EdgePlan*>(h)->n_jobs; }
int64_t sx_edge_nempty(void* h) {
  return static_cast<int64_t>(static_cast<EdgePlan*>(h)->missing_mtiles.size());
}

// Phase 2: fill caller-allocated arrays.
//   vals_out: (n_total, 1, E) float32, zero-initialized
//   meta:     (n_total, 1, E) int32 (initialized here: pad bit everywhere)
//   chunk_mtile: (n_total+1,) int32; chunk_kwin: (n_total,) int32, zeroed
void sx_pack_fill_edge(void* h, const int32_t* rows, const int32_t* cols,
                       const float* vals, float* vals_out, int32_t* meta,
                       int32_t* chunk_mtile, int32_t* chunk_kwin) {
  EdgePlan* p = static_cast<EdgePlan*>(h);
  const int64_t E = p->E;
  const int64_t n_total =
      p->n_chunks + static_cast<int64_t>(p->missing_mtiles.size());
  // every slot starts as padding (bit 0)
  for (int64_t i = 0; i < n_total * E; ++i) meta[i] = 1;

  for (int64_t i = 0; i < p->nnz; ++i) {
    const int64_t e = p->order[i];
    const int32_t rl = rows[e] % p->tile_m;
    const int32_t cl = cols[e] % p->window_k;
    meta[p->dst[i]] =
        (rl << 17) | (cl << 2) | (p->real_end[i] ? 2 : 0);
    vals_out[p->dst[i]] = vals[e];
  }
  for (size_t i = 0; i < p->pad_dst.size(); ++i)
    meta[p->pad_dst[i]] =
        (p->pad_row[i] << 17) | (p->pad_final[i] ? 2 : 0) | 1;
  // chunk-end forced flush — REAL chunks only (the NumPy pass sets
  // flat_m[E-1::E] |= 2 before appending the empty-mtile epilogue chunks)
  for (int64_t c = 0; c < p->n_chunks; ++c) meta[c * E + E - 1] |= 2;

  for (int64_t c = 0; c < p->n_chunks; ++c) {
    chunk_mtile[c] = p->chunk_mt[c];
    chunk_kwin[c] = p->chunk_kw[c];
  }
  for (size_t i = 0; i < p->missing_mtiles.size(); ++i)
    chunk_mtile[p->n_chunks + static_cast<int64_t>(i)] = p->missing_mtiles[i];
  chunk_mtile[n_total] = -1;
}

void sx_pack_free_edge(void* h) { delete static_cast<EdgePlan*>(h); }

}  // extern "C"
