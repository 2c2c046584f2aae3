// Fast INRIA-3DGS PLY vertex parser.
//
// The data layer's native fast path (loaded from Python via ctypes — see
// gaussiansplat_tpu/data/native_loader.py). A 3DGS checkpoint PLY is a
// single binary_little_endian `vertex` element with ~62 float properties
// (reference reader: splat.jl:54-66); at 3M+ gaussians that is ~700MB whose
// de-interleave (array-of-structs -> per-field columns) is worth doing with
// mmap + multithreaded strided copies instead of numpy's single-threaded
// itemize path.
//
// C ABI:
//   ply_open(path)                      -> handle (0 on failure)
//   ply_vertex_count(h)                 -> int64 rows
//   ply_field_count(h)                  -> int32 fields
//   ply_field_name(h, i)                -> const char*
//   ply_read_columns_f32(h, out, nthreads)
//       fills out[field][row] (a single contiguous f32 buffer of
//       field_count * vertex_count), converting any property dtype to f32.
//   ply_close(h)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

enum class PType { F32, F64, U8, I8, U16, I16, U32, I32 };

size_t psize(PType t) {
  switch (t) {
    case PType::F64: return 8;
    case PType::F32: case PType::U32: case PType::I32: return 4;
    case PType::U16: case PType::I16: return 2;
    default: return 1;
  }
}

struct Ply {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_size = 0;
  size_t data_off = 0;
  int64_t count = 0;
  size_t stride = 0;
  std::vector<std::string> names;
  std::vector<PType> types;
  std::vector<size_t> offsets;
};

bool parse_type(const std::string& s, PType* out) {
  if (s == "float" || s == "float32") *out = PType::F32;
  else if (s == "double" || s == "float64") *out = PType::F64;
  else if (s == "uchar" || s == "uint8") *out = PType::U8;
  else if (s == "char" || s == "int8") *out = PType::I8;
  else if (s == "ushort" || s == "uint16") *out = PType::U16;
  else if (s == "short" || s == "int16") *out = PType::I16;
  else if (s == "uint" || s == "uint32") *out = PType::U32;
  else if (s == "int" || s == "int32") *out = PType::I32;
  else return false;
  return true;
}

float load_as_f32(const uint8_t* p, PType t) {
  switch (t) {
    case PType::F32: { float v; std::memcpy(&v, p, 4); return v; }
    case PType::F64: { double v; std::memcpy(&v, p, 8); return (float)v; }
    case PType::U8: return (float)*p;
    case PType::I8: return (float)*(const int8_t*)p;
    case PType::U16: { uint16_t v; std::memcpy(&v, p, 2); return (float)v; }
    case PType::I16: { int16_t v; std::memcpy(&v, p, 2); return (float)v; }
    case PType::U32: { uint32_t v; std::memcpy(&v, p, 4); return (float)v; }
    case PType::I32: { int32_t v; std::memcpy(&v, p, 4); return (float)v; }
  }
  return 0.f;
}

}  // namespace

extern "C" {

void* ply_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto ply = new Ply();
  char line[512];
  bool in_vertex = false;
  bool binary = false;
  size_t header_end = 0;
  // Parse the ASCII header with stdio, then mmap for the payload.
  if (!std::fgets(line, sizeof line, f) || std::strncmp(line, "ply", 3) != 0) {
    std::fclose(f); delete ply; return nullptr;
  }
  while (std::fgets(line, sizeof line, f)) {
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s.rfind("format", 0) == 0) {
      binary = s.find("binary_little_endian") != std::string::npos;
    } else if (s.rfind("element", 0) == 0) {
      char name[128]; long long cnt = 0;
      if (std::sscanf(s.c_str(), "element %127s %lld", name, &cnt) == 2) {
        in_vertex = std::strcmp(name, "vertex") == 0;
        if (in_vertex) ply->count = cnt;
      }
    } else if (s.rfind("property", 0) == 0 && in_vertex) {
      char type[64], name[128];
      if (std::sscanf(s.c_str(), "property %63s %127s", type, name) == 2) {
        PType t;
        if (std::strcmp(type, "list") == 0 || !parse_type(type, &t)) {
          std::fclose(f); delete ply; return nullptr;
        }
        ply->names.emplace_back(name);
        ply->types.push_back(t);
        ply->offsets.push_back(ply->stride);
        ply->stride += psize(t);
      }
    } else if (s == "end_header") {
      header_end = (size_t)std::ftell(f);
      break;
    }
  }
  std::fclose(f);
  if (!binary || ply->count <= 0 || header_end == 0) { delete ply; return nullptr; }

  ply->fd = ::open(path, O_RDONLY);
  if (ply->fd < 0) { delete ply; return nullptr; }
  struct stat st;
  if (fstat(ply->fd, &st) != 0) { ::close(ply->fd); delete ply; return nullptr; }
  ply->map_size = (size_t)st.st_size;
  void* m = mmap(nullptr, ply->map_size, PROT_READ, MAP_PRIVATE, ply->fd, 0);
  if (m == MAP_FAILED) { ::close(ply->fd); delete ply; return nullptr; }
  ply->map = (const uint8_t*)m;
  ply->data_off = header_end;
  if (ply->data_off + ply->stride * (size_t)ply->count > ply->map_size) {
    munmap(m, ply->map_size); ::close(ply->fd); delete ply; return nullptr;
  }
  return ply;
}

int64_t ply_vertex_count(void* h) { return ((Ply*)h)->count; }
int32_t ply_field_count(void* h) { return (int32_t)((Ply*)h)->names.size(); }
const char* ply_field_name(void* h, int32_t i) {
  auto* p = (Ply*)h;
  if (i < 0 || (size_t)i >= p->names.size()) return nullptr;
  return p->names[(size_t)i].c_str();
}

// out: [field_count * count] f32, field-major.
void ply_read_columns_f32(void* h, float* out, int32_t nthreads) {
  auto* p = (Ply*)h;
  const int64_t n = p->count;
  const size_t nf = p->names.size();
  const uint8_t* base = p->map + p->data_off;
  if (nthreads < 1) nthreads = (int32_t)std::thread::hardware_concurrency();
  if (nthreads < 1) nthreads = 1;

  auto work = [&](int64_t r0, int64_t r1) {
    for (size_t fi = 0; fi < nf; ++fi) {
      const size_t off = p->offsets[fi];
      const PType t = p->types[fi];
      float* col = out + (int64_t)fi * n;
      if (t == PType::F32) {
        const uint8_t* src = base + r0 * p->stride + off;
        for (int64_t r = r0; r < r1; ++r, src += p->stride)
          std::memcpy(&col[r], src, 4);
      } else {
        const uint8_t* src = base + r0 * p->stride + off;
        for (int64_t r = r0; r < r1; ++r, src += p->stride)
          col[r] = load_as_f32(src, t);
      }
    }
  };

  std::vector<std::thread> threads;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int32_t i = 0; i < nthreads; ++i) {
    int64_t r0 = (int64_t)i * chunk;
    int64_t r1 = std::min<int64_t>(n, r0 + chunk);
    if (r0 >= r1) break;
    threads.emplace_back(work, r0, r1);
  }
  for (auto& t : threads) t.join();
}

void ply_close(void* h) {
  auto* p = (Ply*)h;
  if (p->map) munmap((void*)p->map, p->map_size);
  if (p->fd >= 0) ::close(p->fd);
  delete p;
}

}  // extern "C"
