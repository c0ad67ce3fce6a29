// Native batch assembler — the host-side hot path of the input pipeline.
//
// The reference's per-step feed construction was its known bottleneck
// (hundreds of Python SparseTensorValue objects per batch,
// kgcn/feed.py:112-126).  Our Python Batcher replaced that with NumPy
// concatenation; this C++ implementation removes the remaining per-graph
// Python/NumPy overhead: one call packs a whole batch's COO edge lists into
// the padded [C, E] device layout and pads node features, parallelised over
// adjacency channels with std::thread.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency); the Python
// wrapper (kgcn_tpu/native/__init__.py) falls back to NumPy when the shared
// library has not been built.  Build: `make -C kgcn_tpu/native`.

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Pack per-graph COO edges into the padded [C, E] batch layout.
//
// Inputs are flattened over (graph, channel):
//   rows/cols/vals:  concatenated edge arrays for all (g, c) blocks
//   block_len[g*C+c]: number of edges in block (g, c)
//   block_off[g*C+c]: offset of block (g, c) in rows/cols/vals
// Outputs (preallocated by caller, zero-filled here):
//   senders/receivers: int32 [C * edge_budget]
//   weights:           float [C * edge_budget]
//   n_edge:            int32 [C]
// Node index of graph g is offset by g * max_nodes (global flat ids).
// Returns 0 on success, -1 if any channel exceeds edge_budget.
int pack_edges(const int32_t* rows, const int32_t* cols, const float* vals,
               const int64_t* block_off, const int64_t* block_len,
               int64_t n_graph, int64_t n_channel, int64_t max_nodes,
               int64_t edge_budget, int32_t* senders, int32_t* receivers,
               float* weights, int32_t* n_edge) {
  std::vector<int> rc(n_channel, 0);
  auto pack_channel = [&](int64_t c) {
    int32_t* s = senders + c * edge_budget;
    int32_t* r = receivers + c * edge_budget;
    float* w = weights + c * edge_budget;
    std::memset(s, 0, sizeof(int32_t) * edge_budget);
    std::memset(r, 0, sizeof(int32_t) * edge_budget);
    std::memset(w, 0, sizeof(float) * edge_budget);
    int64_t off = 0;
    for (int64_t g = 0; g < n_graph; ++g) {
      const int64_t b = g * n_channel + c;
      const int64_t len = block_len[b];
      if (off + len > edge_budget) {
        rc[c] = -1;
        return;
      }
      const int32_t* br = rows + block_off[b];
      const int32_t* bc = cols + block_off[b];
      const float* bv = vals + block_off[b];
      const int32_t base = static_cast<int32_t>(g * max_nodes);
      for (int64_t e = 0; e < len; ++e) {
        // bounds check mirrors the Python path (graph/batch.py): an index
        // >= max_nodes offset into graph g+1's block would silently
        // aggregate across graph boundaries
        if (br[e] < 0 || br[e] >= max_nodes || bc[e] < 0 ||
            bc[e] >= max_nodes) {
          rc[c] = -2;
          return;
        }
        r[off + e] = br[e] + base;  // receiver = row (A·X convention)
        s[off + e] = bc[e] + base;  // sender   = col
        w[off + e] = bv[e];
      }
      off += len;
    }
    n_edge[c] = static_cast<int32_t>(off);
  };

  if (n_channel > 1) {
    std::vector<std::thread> threads;
    threads.reserve(n_channel);
    for (int64_t c = 0; c < n_channel; ++c)
      threads.emplace_back(pack_channel, c);
    for (auto& t : threads) t.join();
  } else if (n_channel == 1) {
    pack_channel(0);
  }
  for (int64_t c = 0; c < n_channel; ++c)
    if (rc[c] != 0) return rc[c];  // -1 budget overflow, -2 index OOR
  return 0;
}

// Gather + pad node features: features[idx[g]] -> out[g, :rows_per_graph].
//   features: float [total_graphs, rows, feat]
//   idx:      int64 [n_pick]
//   out:      float [batch_graphs, rows, feat]  (batch_graphs >= n_pick;
//             tail graphs left zeroed)
void gather_pad_features(const float* features, const int64_t* idx,
                         int64_t n_pick, int64_t batch_graphs, int64_t rows,
                         int64_t feat, float* out) {
  const int64_t stride = rows * feat;
  std::memset(out, 0, sizeof(float) * batch_graphs * stride);
  const unsigned n_threads =
      std::min<unsigned>(std::thread::hardware_concurrency(),
                         static_cast<unsigned>(n_pick > 0 ? n_pick : 1));
  if (n_pick <= 0) return;
  auto worker = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i)
      std::memcpy(out + i * stride, features + idx[i] * stride,
                  sizeof(float) * stride);
  };
  if (n_threads <= 1 || n_pick < 64) {
    worker(0, n_pick);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (n_pick + n_threads - 1) / n_threads;
  for (unsigned t = 0; t < n_threads; ++t) {
    const int64_t b = t * chunk;
    const int64_t e = std::min<int64_t>(b + chunk, n_pick);
    if (b >= e) break;
    threads.emplace_back(worker, b, e);
  }
  for (auto& t : threads) t.join();
}

// crc32c (Castagnoli) — used by the native tfrecord reader path.
namespace {
struct Crc32cTable {
  uint32_t t[256];
  Crc32cTable() {
    for (uint32_t n = 0; n < 256; ++n) {
      uint32_t c = n;
      for (int k = 0; k < 8; ++k)
        c = (c & 1) ? 0x82F63B78u ^ (c >> 1) : c >> 1;
      t[n] = c;
    }
  }
};
}  // namespace

uint32_t crc32c_native(const uint8_t* data, int64_t len) {
  // C++11 magic static: thread-safe one-time init (ctypes releases the GIL,
  // so concurrent callers are real; a bare check-then-write table raced)
  static const Crc32cTable table;
  uint32_t crc = 0xFFFFFFFFu;
  for (int64_t i = 0; i < len; ++i)
    crc = table.t[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

}  // extern "C"
