// Native OBJ loader with (v, vn, vt)-keyed vertex deduplication.
//
// The runtime equivalent of the reference's C++ asset layer (tinyobjloader parse +
// dedup hash map, reference: source/main.cpp:916-1045), built as a small C-ABI
// shared library bound from Python via ctypes (models/native.py).  Semantics match
// models/obj.py:load_obj_python exactly — the test suite asserts bit-equality:
//   * indices are 1-based, negative = relative to current attribute count;
//   * dedup key is the exact (position, normal, uv) index triple;
//   * missing normal/uv produce zeros;
//   * polygon faces triangulate as fans (tinyobjloader default).
//
// Single-pass, zero-dependency parser; ~20x faster than the Python loader on
// large meshes.

#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Key {
  int64_t v, n, t;
  bool operator==(const Key& o) const { return v == o.v && n == o.n && t == o.t; }
};

struct KeyHash {
  // splitmix64-style mixing (same spirit as the reference's MurmurHash3
  // finalizer at main.cpp:960-972, written independently).
  static uint64_t mix(uint64_t x) {
    x ^= x >> 30;
    x *= 0xbf58476d1ce4e5b9ULL;
    x ^= x >> 27;
    x *= 0x94d049bb133111ebULL;
    x ^= x >> 31;
    return x;
  }
  size_t operator()(const Key& k) const {
    uint64_t h = mix((uint64_t)k.v + 0x9e3779b97f4a7c15ULL);
    h = mix(h ^ (uint64_t)k.n);
    h = mix(h ^ (uint64_t)k.t);
    return (size_t)h;
  }
};

struct Loader {
  std::vector<float> positions;  // out, 3 per vertex
  std::vector<float> normals;    // out, 3 per vertex
  std::vector<float> uvs;        // out, 2 per vertex
  std::vector<uint32_t> indices;
  std::string error;
};

// In-line whitespace, matching Python str.split()'s ASCII set minus '\n'
// (lines are split first): space, \t, \r, \v, \f, and the ASCII separator
// block \x1c-\x1f, all of which str.isspace() treats as split points.  The
// remaining divergence is multi-byte Unicode whitespace (e.g. U+00A0), which
// no real OBJ contains and which the parity contract excludes.
inline bool is_ws(char c) {
  return c == ' ' || c == '\t' || c == '\r' || c == '\v' || c == '\f' ||
         (c >= '\x1c' && c <= '\x1f');
}

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && is_ws(*p)) ++p;
  return p;
}

inline const char* next_token(const char* p, const char* end) {
  while (p < end && !is_ws(*p) && *p != '\n') ++p;
  return p;
}

int64_t resolve(long raw, size_t count) {
  if (raw > 0) return raw - 1;
  if (raw < 0) return (int64_t)count + raw;
  return -1;
}

// Integer parse that, unlike strtol, never skips whitespace and never reads
// past `end` — a malformed token must fail loudly here, not stall the loop or
// steal digits from the next token/line (the Python loader's strict index
// grammar raises the matching ValueError in models/obj.py).  Magnitudes
// SATURATE instead of overflowing (signed overflow is UB, and a wrapped value
// could resolve to a real vertex where Python's arbitrary-precision int stays
// out of range and emits zeros) — the saturated value is equally out of range
// for any real pool, so both loaders agree.
bool parse_long(const char*& p, const char* end, long& out) {
  const char* s = p;
  bool neg = false;
  if (s < end && (*s == '-' || *s == '+')) {
    neg = (*s == '-');
    ++s;
  }
  if (s >= end || *s < '0' || *s > '9') return false;
  // Saturation threshold: once v >= kCap further digits are ignored, and
  // kCap * 10 + 9 still fits a long, so the multiply below never overflows.
  const long kCap = 1L << 55;
  long v = 0;
  while (s < end && *s >= '0' && *s <= '9') {
    if (v < kCap) v = v * 10 + (*s - '0');
    ++s;
  }
  p = s;
  out = neg ? -v : v;
  return true;
}

// Float parse bounded to the current line via from_chars: locale-independent
// and hex-float-free (strtof accepts C99 "0x1p3" and honors LC_NUMERIC — both
// off the Python loader's grammar), and it never reads past `line_end`, so an
// attribute line with too few numbers cannot silently consume the next line's
// data.  A leading '+' is consumed manually (from_chars rejects it; the
// Python grammar and the reference's parser accept it).
bool read_floats(const char*& q, const char* line_end, std::vector<float>& out,
                 int n) {
  for (int i = 0; i < n; ++i) {
    q = skip_ws(q, line_end);
    if (q >= line_end) return false;
    const char* s = q;
    if (*s == '+') ++s;
    float v;
    auto r = std::from_chars(s, line_end, v);
    if (r.ec != std::errc() || r.ptr == s) return false;
    out.push_back(v);
    q = r.ptr;
  }
  return true;
}

}  // namespace

extern "C" {

void* objloader_load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string data;
  data.resize((size_t)size);
  if (size > 0 && fread(&data[0], 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    return nullptr;
  }
  fclose(f);

  auto* L = new Loader();
  std::vector<float> vx, vn, vt;  // raw attribute pools
  std::unordered_map<Key, uint32_t, KeyHash> dedup;
  std::vector<uint32_t> face;  // scratch per face

  const char* p = data.data();
  const char* end = p + data.size();
  while (p < end) {
    p = skip_ws(p, end);
    const char* line_end = p;
    while (line_end < end && *line_end != '\n') ++line_end;

    if (p < line_end && *p != '#') {
      if (p[0] == 'v' && (p + 1 < line_end) &&
          is_ws(p[1])) {
        const char* q = p + 1;
        if (!read_floats(q, line_end, vx, 3)) {
          L->error = "malformed vertex line";
          return L;
        }
      } else if (p[0] == 'v' && p[1] == 'n' &&
                 (p + 2 < line_end) && is_ws(p[2])) {
        const char* q = p + 2;
        if (!read_floats(q, line_end, vn, 3)) {
          L->error = "malformed normal line";
          return L;
        }
      } else if (p[0] == 'v' && p[1] == 't' &&
                 (p + 2 < line_end) && is_ws(p[2])) {
        const char* q = p + 2;
        if (!read_floats(q, line_end, vt, 2)) {
          L->error = "malformed uv line";
          return L;
        }
      } else if (p[0] == 'f' && (p + 1 < line_end) &&
                 is_ws(p[1])) {
        face.clear();
        const char* q = p + 1;
        while (true) {
          q = skip_ws(q, line_end);
          if (q >= line_end) break;
          // Parse v[/vt[/vn]] exactly as Python's token.split("/") + int():
          // each '/'-delimited field must be a complete integer (fields 2-3
          // may be empty; extra fields are ignored, as split() leaves them
          // unconverted).  Any other content is a loud parse error.
          const char* tok_end = next_token(q, line_end);
          long raw[3] = {0, 0, 0};  // raw 0 resolves to the -1 "absent" slot
          bool bad = false;
          const char* fs = q;
          for (int fi = 0; fi < 3; ++fi) {
            const char* fe = fs;
            while (fe < tok_end && *fe != '/') ++fe;
            if (fe > fs) {
              const char* t = fs;
              if (!parse_long(t, fe, raw[fi]) || t != fe) {
                bad = true;
                break;
              }
            } else if (fi == 0) {
              bad = true;  // empty vertex field: Python int("") raises
              break;
            }
            if (fe >= tok_end) break;
            fs = fe + 1;
          }
          if (bad) {
            L->error = "malformed face token";
            return L;
          }
          q = tok_end;
          long vi_raw = raw[0], ti_raw = raw[1], ni_raw = raw[2];
          Key key{resolve(vi_raw, vx.size() / 3),
                  resolve(ni_raw, vn.size() / 3),
                  resolve(ti_raw, vt.size() / 2)};
          auto it = dedup.find(key);
          uint32_t idx;
          if (it != dedup.end()) {
            idx = it->second;
          } else {
            idx = (uint32_t)(L->positions.size() / 3);
            dedup.emplace(key, idx);
            if (key.v >= 0 && (size_t)(3 * key.v + 2) < vx.size()) {
              L->positions.push_back(vx[3 * key.v]);
              L->positions.push_back(vx[3 * key.v + 1]);
              L->positions.push_back(vx[3 * key.v + 2]);
            } else {
              L->positions.insert(L->positions.end(), {0.f, 0.f, 0.f});
            }
            if (key.n >= 0 && (size_t)(3 * key.n + 2) < vn.size()) {
              L->normals.push_back(vn[3 * key.n]);
              L->normals.push_back(vn[3 * key.n + 1]);
              L->normals.push_back(vn[3 * key.n + 2]);
            } else {
              L->normals.insert(L->normals.end(), {0.f, 0.f, 0.f});
            }
            if (key.t >= 0 && (size_t)(2 * key.t + 1) < vt.size()) {
              L->uvs.push_back(vt[2 * key.t]);
              L->uvs.push_back(vt[2 * key.t + 1]);
            } else {
              L->uvs.insert(L->uvs.end(), {0.f, 0.f});
            }
          }
          face.push_back(idx);
        }
        // Fan triangulation.
        for (size_t k = 1; k + 1 < face.size(); ++k) {
          L->indices.push_back(face[0]);
          L->indices.push_back(face[k]);
          L->indices.push_back(face[k + 1]);
        }
      }
    }
    p = line_end + 1;
  }

  if (L->positions.empty()) {
    L->error = "failed to read obj file: no vertices";
  }
  return L;
}

int64_t objloader_num_vertices(void* h) {
  return (int64_t)(((Loader*)h)->positions.size() / 3);
}

int64_t objloader_num_indices(void* h) {
  return (int64_t)((Loader*)h)->indices.size();
}

const char* objloader_error(void* h) {
  Loader* L = (Loader*)h;
  return L->error.empty() ? nullptr : L->error.c_str();
}

void objloader_copy_out(void* h, void* pos, void* nrm, void* uv, void* idx) {
  Loader* L = (Loader*)h;
  memcpy(pos, L->positions.data(), L->positions.size() * sizeof(float));
  memcpy(nrm, L->normals.data(), L->normals.size() * sizeof(float));
  memcpy(uv, L->uvs.data(), L->uvs.size() * sizeof(float));
  memcpy(idx, L->indices.data(), L->indices.size() * sizeof(uint32_t));
}

void objloader_free(void* h) { delete (Loader*)h; }

}  // extern "C"
