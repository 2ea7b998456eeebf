// Native point-cloud runtime ops.
//
// The host-side fusion/export path handles millions of points per sequence
// (per-chunk clouds -> voxel fusion -> merged PLY; the reference delegated
// this to Open3D's C++ and random subsampling, da3_streaming.py:664-695).
// These are the hot host ops, implemented natively and exposed over a C ABI
// for ctypes:
//
//   - voxel_downsample: average points/colors per occupied voxel
//   - write_ply / read_ply header probe: zero-copy binary PLY I/O
//
// Build: g++ -O3 -march=native -shared -fPIC pointcloud.cpp -o libda3pc.so

#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>
#include <string>

extern "C" {

// Voxel-grid downsample with per-voxel averaging.
// pts [n*3] float32, cols [n*3] uint8 (may be null).
// out_pts / out_cols must have capacity for n points.
// Returns the number of output voxels (<= n), or -1 on error.
int64_t voxel_downsample(const float* pts, const uint8_t* cols, int64_t n,
                         float voxel, float* out_pts, uint8_t* out_cols) {
  if (n <= 0 || voxel <= 0.f) return -1;
  struct Acc {
    double x = 0, y = 0, z = 0;
    double r = 0, g = 0, b = 0;
    int64_t count = 0;
  };
  std::unordered_map<uint64_t, Acc> grid;
  grid.reserve(static_cast<size_t>(n / 4 + 16));

  const double inv = 1.0 / voxel;
  for (int64_t i = 0; i < n; ++i) {
    const float x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    // 21-bit signed voxel coords packed into one 64-bit key
    const int64_t vx = static_cast<int64_t>(std::floor(x * inv)) & 0x1FFFFF;
    const int64_t vy = static_cast<int64_t>(std::floor(y * inv)) & 0x1FFFFF;
    const int64_t vz = static_cast<int64_t>(std::floor(z * inv)) & 0x1FFFFF;
    const uint64_t key = (static_cast<uint64_t>(vx) << 42) |
                         (static_cast<uint64_t>(vy) << 21) |
                         static_cast<uint64_t>(vz);
    Acc& a = grid[key];
    a.x += x; a.y += y; a.z += z;
    if (cols) {
      a.r += cols[3 * i]; a.g += cols[3 * i + 1]; a.b += cols[3 * i + 2];
    }
    a.count++;
  }

  int64_t m = 0;
  for (const auto& kv : grid) {
    const Acc& a = kv.second;
    const double c = static_cast<double>(a.count);
    out_pts[3 * m] = static_cast<float>(a.x / c);
    out_pts[3 * m + 1] = static_cast<float>(a.y / c);
    out_pts[3 * m + 2] = static_cast<float>(a.z / c);
    if (cols && out_cols) {
      out_cols[3 * m] = static_cast<uint8_t>(a.r / c + 0.5);
      out_cols[3 * m + 1] = static_cast<uint8_t>(a.g / c + 0.5);
      out_cols[3 * m + 2] = static_cast<uint8_t>(a.b / c + 0.5);
    }
    ++m;
  }
  return m;
}

// Binary little-endian PLY writer (xyz f32 [+ rgb u8]).  Returns 0 on
// success.  Streams straight from the caller's buffers - no Python-side
// interleaving copy.
int write_ply(const char* path, const float* pts, const uint8_t* cols,
              int64_t n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::string header = "ply\nformat binary_little_endian 1.0\n";
  header += "element vertex " + std::to_string(n) + "\n";
  header += "property float x\nproperty float y\nproperty float z\n";
  if (cols)
    header += "property uchar red\nproperty uchar green\nproperty uchar blue\n";
  header += "end_header\n";
  std::fwrite(header.data(), 1, header.size(), f);

  if (!cols) {
    std::fwrite(pts, sizeof(float), static_cast<size_t>(3 * n), f);
  } else {
    // interleave in 64k-point chunks to stay cache-friendly
    const int64_t CHUNK = 65536;
    std::vector<uint8_t> buf(static_cast<size_t>(CHUNK) * 15);
    for (int64_t start = 0; start < n; start += CHUNK) {
      const int64_t cnt = (n - start < CHUNK) ? (n - start) : CHUNK;
      uint8_t* p = buf.data();
      for (int64_t i = 0; i < cnt; ++i) {
        std::memcpy(p, pts + 3 * (start + i), 12);
        std::memcpy(p + 12, cols + 3 * (start + i), 3);
        p += 15;
      }
      std::fwrite(buf.data(), 1, static_cast<size_t>(cnt) * 15, f);
    }
  }
  std::fclose(f);
  return 0;
}

// Read the vertex data of a binary PLY written by write_ply.
// First call with pts == nullptr to get the point count and has_color flag
// (packed: count * 2 + has_color); then call again with buffers.
int64_t read_ply(const char* path, float* pts, uint8_t* cols) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char line[512];
  int64_t n = -1;
  bool has_color = false, binary = false;
  while (std::fgets(line, sizeof(line), f)) {
    if (std::strncmp(line, "format binary_little_endian", 27) == 0) binary = true;
    if (std::sscanf(line, "element vertex %" SCNd64, &n) == 1) {}
    if (std::strstr(line, "property uchar red")) has_color = true;
    if (std::strncmp(line, "end_header", 10) == 0) break;
  }
  if (n < 0 || !binary) { std::fclose(f); return -1; }
  if (!pts) { std::fclose(f); return n * 2 + (has_color ? 1 : 0); }

  if (!has_color) {
    size_t got = std::fread(pts, sizeof(float), static_cast<size_t>(3 * n), f);
    std::fclose(f);
    return (got == static_cast<size_t>(3 * n)) ? n : -1;
  }
  const int64_t CHUNK = 65536;
  std::vector<uint8_t> buf(static_cast<size_t>(CHUNK) * 15);
  for (int64_t start = 0; start < n; start += CHUNK) {
    const int64_t cnt = (n - start < CHUNK) ? (n - start) : CHUNK;
    if (std::fread(buf.data(), 1, static_cast<size_t>(cnt) * 15, f) !=
        static_cast<size_t>(cnt) * 15) { std::fclose(f); return -1; }
    const uint8_t* p = buf.data();
    for (int64_t i = 0; i < cnt; ++i) {
      std::memcpy(pts + 3 * (start + i), p, 12);
      if (cols) std::memcpy(cols + 3 * (start + i), p + 12, 3);
      p += 15;
    }
  }
  std::fclose(f);
  return n;
}

}  // extern "C"
