// Native data-pipeline primitives for snnimageclassification_tpu.
//
// The reference feeds the GPU from torch DataLoader worker *processes*
// doing per-sample Python/numpy spike encoding (datasets.py:143-151).
// Here spike encoding lives on the TPU, so the host's only jobs are bulk
// dataset parsing and batch assembly -- implemented natively:
//
//   * dataio_read_idx / dataio_idx_info: IDX (MNIST wire format) parsing,
//     plain or gzip (zlib), single pass, no Python-level byte shuffling.
//   * dataio_gather_f32 / dataio_gather_i32: multithreaded row gather for
//     shuffled batch assembly (index -> contiguous batch buffer).
//
// Exposed through ctypes (data/native_loader.py); the Python numpy path
// remains as a fallback when the shared library isn't built.
//
// Build: make -C native  (produces libdataio.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr int kMaxDims = 8;

// Read an entire file (gzip-transparent: zlib's gz* reads plain files too).
bool read_all(const char* path, std::vector<uint8_t>& out) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return false;
  constexpr size_t kChunk = 1 << 20;
  size_t size = 0;
  while (true) {
    out.resize(size + kChunk);
    int n = gzread(f, out.data() + size, kChunk);
    if (n < 0) {
      gzclose(f);
      return false;
    }
    size += static_cast<size_t>(n);
    if (n == 0) break;
  }
  out.resize(size);
  gzclose(f);
  return true;
}

int dtype_size(int code) {
  switch (code) {
    case 0x08: case 0x09: return 1;  // u8 / i8
    case 0x0B: return 2;             // i16
    case 0x0C: case 0x0D: return 4;  // i32 / f32
    case 0x0E: return 8;             // f64
    default: return 0;
  }
}

}  // namespace

extern "C" {

// Parse the IDX header: fills dims[ndim], returns the dtype code, or a
// negative errno-style value on failure.
int dataio_idx_info(const char* path, int64_t* dims, int* ndim) {
  std::vector<uint8_t> buf;
  if (!read_all(path, buf) || buf.size() < 4) return -1;
  if (buf[0] != 0 || buf[1] != 0) return -2;
  int code = buf[2];
  int nd = buf[3];
  if (dtype_size(code) == 0 || nd <= 0 || nd > kMaxDims) return -3;
  if (buf.size() < 4 + 4 * static_cast<size_t>(nd)) return -4;
  for (int i = 0; i < nd; ++i) {
    const uint8_t* p = buf.data() + 4 + 4 * i;
    dims[i] = (int64_t(p[0]) << 24) | (int64_t(p[1]) << 16) |
              (int64_t(p[2]) << 8) | int64_t(p[3]);
  }
  *ndim = nd;
  return code;
}

// Read the IDX payload into `out` (caller-allocated, native byte order).
// Returns the number of elements read, or negative on failure.
int64_t dataio_read_idx(const char* path, void* out, int64_t capacity_bytes) {
  std::vector<uint8_t> buf;
  if (!read_all(path, buf) || buf.size() < 4) return -1;
  if (buf[0] != 0 || buf[1] != 0) return -2;
  int code = buf[2];
  int nd = buf[3];
  int esize = dtype_size(code);
  if (esize == 0 || nd <= 0 || nd > kMaxDims) return -3;
  size_t header = 4 + 4 * static_cast<size_t>(nd);
  if (buf.size() < header) return -4;
  int64_t count = 1;
  for (int i = 0; i < nd; ++i) {
    const uint8_t* p = buf.data() + 4 + 4 * i;
    count *= (int64_t(p[0]) << 24) | (int64_t(p[1]) << 16) |
             (int64_t(p[2]) << 8) | int64_t(p[3]);
  }
  int64_t bytes = count * esize;
  if (bytes > capacity_bytes ||
      buf.size() - header < static_cast<size_t>(bytes))
    return -5;
  const uint8_t* src = buf.data() + header;
  uint8_t* dst = static_cast<uint8_t*>(out);
  if (esize == 1) {
    std::memcpy(dst, src, bytes);
  } else {
    // IDX is big-endian; swap to host (little-endian on all targets here).
    for (int64_t i = 0; i < count; ++i) {
      for (int b = 0; b < esize; ++b) dst[i * esize + b] = src[i * esize + (esize - 1 - b)];
    }
  }
  return count;
}

// Parallel row gather: dst[i] = src[idx[i]] for rows of `row_elems`
// float32 elements.  Used for shuffled batch assembly.
void dataio_gather_f32(const float* src, const int64_t* idx, int64_t n_rows,
                       int64_t row_elems, float* dst) {
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int n_threads = hw > 1 ? (hw < 16 ? hw : 16) : 1;
  if (n_rows < 256) n_threads = 1;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(dst + i * row_elems, src + idx[i] * row_elems,
                  sizeof(float) * static_cast<size_t>(row_elems));
    }
  };
  if (n_threads == 1) {
    worker(0, n_rows);
    return;
  }
  std::vector<std::thread> threads;
  int64_t per = (n_rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * per;
    int64_t hi = lo + per < n_rows ? lo + per : n_rows;
    if (lo >= hi) break;
    threads.emplace_back(worker, lo, hi);
  }
  for (auto& th : threads) th.join();
}

void dataio_gather_i32(const int32_t* src, const int64_t* idx, int64_t n_rows,
                       int64_t row_elems, int32_t* dst) {
  for (int64_t i = 0; i < n_rows; ++i) {
    std::memcpy(dst + i * row_elems, src + idx[i] * row_elems,
                sizeof(int32_t) * static_cast<size_t>(row_elems));
  }
}

}  // extern "C"
