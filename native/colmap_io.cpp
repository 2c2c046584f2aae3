// Fast COLMAP binary sparse-model parsers.
//
// points3D.bin holds variable-length records (xyz f64, rgb u8, error f64,
// then a track list) — at Mip-NeRF360 scale that's millions of records whose
// per-record struct.unpack in Python dominates scene-load time
// (gaussiansplat_tpu/data/colmap.py keeps the numpy path as the fallback).
// images.bin likewise mixes NUL-terminated names with 2D point lists.
//
// C ABI (all return 0/negative on failure):
//   colmap_points_count(path)                    -> int64 n (walks records)
//   colmap_read_points3d(path, xyz f32[n*3], rgb f32[n*3]) -> int64 n read
//   colmap_images_count(path)                    -> int64 n
//   colmap_read_images(path, quat f64[n*4], t f64[n*3], cam_id i32[n],
//                      names char[n*256])        -> int64 n read
//
// All files are little-endian (COLMAP writes them so); this parser assumes a
// little-endian host, as does the numpy fallback.

#include <cstdint>
#include <cstring>
#include <string>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Map {
  int fd = -1;
  const uint8_t* p = nullptr;
  size_t size = 0;
  bool ok() const { return p != nullptr; }
  ~Map() {
    if (p) munmap((void*)p, size);
    if (fd >= 0) ::close(fd);
  }
};

bool map_file(const char* path, Map* m) {
  m->fd = ::open(path, O_RDONLY);
  if (m->fd < 0) return false;
  struct stat st;
  if (fstat(m->fd, &st) != 0 || st.st_size <= 0) return false;
  m->size = (size_t)st.st_size;
  void* mm = mmap(nullptr, m->size, PROT_READ, MAP_PRIVATE, m->fd, 0);
  if (mm == MAP_FAILED) { m->p = nullptr; return false; }
  m->p = (const uint8_t*)mm;
  return true;
}

template <typename T>
bool rd(const uint8_t* base, size_t size, size_t* off, T* out) {
  if (*off + sizeof(T) > size) return false;
  std::memcpy(out, base + *off, sizeof(T));
  *off += sizeof(T);
  return true;
}

// Walk one points3D record; returns false on truncation.
bool skip_point(const uint8_t* p, size_t size, size_t* off,
                double* xyz, uint8_t* rgb) {
  uint64_t id;
  if (!rd(p, size, off, &id)) return false;
  for (int i = 0; i < 3; ++i)
    if (!rd(p, size, off, &xyz[i])) return false;
  for (int i = 0; i < 3; ++i)
    if (!rd(p, size, off, &rgb[i])) return false;
  double err;
  if (!rd(p, size, off, &err)) return false;
  uint64_t track_len;
  if (!rd(p, size, off, &track_len)) return false;
  size_t skip = (size_t)track_len * 8;  // (image_id i32, point2d_idx i32)
  if (*off + skip > size) return false;
  *off += skip;
  return true;
}

}  // namespace

extern "C" {

int64_t colmap_points_count(const char* path) {
  Map m;
  if (!map_file(path, &m)) return -1;
  size_t off = 0;
  uint64_t n;
  if (!rd(m.p, m.size, &off, &n)) return -1;
  return (int64_t)n;
}

// xyz/rgb must hold 3*n floats each (n from colmap_points_count).
int64_t colmap_read_points3d(const char* path, float* xyz, float* rgb) {
  Map m;
  if (!map_file(path, &m)) return -1;
  size_t off = 0;
  uint64_t n;
  if (!rd(m.p, m.size, &off, &n)) return -1;
  for (uint64_t i = 0; i < n; ++i) {
    double p3[3];
    uint8_t c3[3];
    if (!skip_point(m.p, m.size, &off, p3, c3)) return (int64_t)i;
    xyz[i * 3 + 0] = (float)p3[0];
    xyz[i * 3 + 1] = (float)p3[1];
    xyz[i * 3 + 2] = (float)p3[2];
    rgb[i * 3 + 0] = (float)c3[0] / 255.f;
    rgb[i * 3 + 1] = (float)c3[1] / 255.f;
    rgb[i * 3 + 2] = (float)c3[2] / 255.f;
  }
  return (int64_t)n;
}

int64_t colmap_images_count(const char* path) {
  Map m;
  if (!map_file(path, &m)) return -1;
  size_t off = 0;
  uint64_t n;
  if (!rd(m.p, m.size, &off, &n)) return -1;
  return (int64_t)n;
}

// quat: n*4 f64 (wxyz), t: n*3 f64, cam_id: n i32, names: n*256 chars
// (NUL-padded; names longer than 255 bytes are truncated).
int64_t colmap_read_images(const char* path, double* quat, double* t,
                           int32_t* cam_id, char* names) {
  Map m;
  if (!map_file(path, &m)) return -1;
  size_t off = 0;
  uint64_t n;
  if (!rd(m.p, m.size, &off, &n)) return -1;
  for (uint64_t i = 0; i < n; ++i) {
    int32_t img_id;
    if (!rd(m.p, m.size, &off, &img_id)) return (int64_t)i;
    for (int k = 0; k < 4; ++k)
      if (!rd(m.p, m.size, &off, &quat[i * 4 + k])) return (int64_t)i;
    for (int k = 0; k < 3; ++k)
      if (!rd(m.p, m.size, &off, &t[i * 3 + k])) return (int64_t)i;
    if (!rd(m.p, m.size, &off, &cam_id[i])) return (int64_t)i;
    char* dst = names + i * 256;
    size_t w = 0;
    while (off < m.size) {
      uint8_t c = m.p[off++];
      if (c == 0) break;
      if (w < 255) dst[w++] = (char)c;
    }
    dst[w] = 0;
    uint64_t n2d;
    if (!rd(m.p, m.size, &off, &n2d)) return (int64_t)i;
    size_t skip = (size_t)n2d * 24;  // (x f64, y f64, point3d_id i64)
    if (off + skip > m.size) return (int64_t)i;
    off += skip;
  }
  return (int64_t)n;
}

}  // extern "C"
