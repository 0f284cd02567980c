// Native OBJ geometry parser.
//
// Replaces tinyobjloader (used by the reference through the git-ignored
// `common/obj_loader.h`, VKT/ray_tracing__before/hello_vulkan.cpp:25,193).
// Parses v/vn/vt/f records, fan-triangulates polygons, deduplicates
// (pos, uv, normal) corners, and tracks per-face `usemtl` slots (first-use
// order). MTL *content* is parsed on the Python side — this handles the
// geometry volume.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct ObjData {
  std::vector<float> positions;   // packed, deduped (3 per vertex)
  std::vector<float> normals;     // 3 per vertex (0 if absent)
  std::vector<uint8_t> has_normal;
  std::vector<float> uvs;         // 2 per vertex
  std::vector<int32_t> indices;   // 3 per tri
  std::vector<int32_t> mat_index; // per tri, slot into usemtl first-use order
  std::string mtl_names;          // '\n'-joined usemtl names, first-use order
  std::string mtllib;             // last mtllib path seen
};

ObjData* g_obj = nullptr;

inline const char* skip_ws(const char* p) {
  while (*p == ' ' || *p == '\t') ++p;
  return p;
}

// Collision-free (vi, ti, ni) -> corner key: non-overlapping 21-bit fields.
// Returns -1 when any index exceeds 21 bits (>2M positions/texcoords/
// normals); the caller then fails the parse and the Python loader takes
// over. (The previous XOR pack overlapped fields and could silently alias
// distinct corners on meshes with >1M texcoords/normals.)
inline int64_t key_of(int vi, int ti, int ni) {
  const int64_t LIM = int64_t(1) << 21;
  int64_t a = vi, b = int64_t(ti) + 1, c = int64_t(ni) + 1;
  if (a < 0 || a >= LIM || b < 0 || b >= LIM || c < 0 || c >= LIM) return -1;
  return (a << 42) | (b << 21) | c;
}

}  // namespace

extern "C" {

// Parse an OBJ file. Returns 0 on success.
int trt_obj_parse(const char* path) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return 1;

  delete g_obj;
  g_obj = new ObjData();

  std::vector<float> vpos, vnrm, vuv;
  std::unordered_map<int64_t, int32_t> cache;
  std::unordered_map<std::string, int32_t> mat_slots;
  std::vector<std::string> mat_order;
  int cur_mat = -1;

  char line[4096];
  std::vector<int32_t> face;
  while (std::fgets(line, sizeof(line), f)) {
    const char* p = skip_ws(line);
    if (p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
      float x, y, z;
      if (std::sscanf(p + 2, "%f %f %f", &x, &y, &z) == 3) {
        vpos.push_back(x);
        vpos.push_back(y);
        vpos.push_back(z);
      }
    } else if (p[0] == 'v' && p[1] == 'n') {
      float x, y, z;
      if (std::sscanf(p + 2, "%f %f %f", &x, &y, &z) == 3) {
        vnrm.push_back(x);
        vnrm.push_back(y);
        vnrm.push_back(z);
      }
    } else if (p[0] == 'v' && p[1] == 't') {
      float u = 0, v = 0;
      if (std::sscanf(p + 2, "%f %f", &u, &v) >= 1) {
        vuv.push_back(u);
        vuv.push_back(v);
      }
    } else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      face.clear();
      const char* q = p + 1;
      while (true) {
        q = skip_ws(q);
        if (*q == '\0' || *q == '\n' || *q == '\r') break;
        int vi = 0, ti = 0, ni = 0;
        // formats: v, v/t, v//n, v/t/n (also negative indices)
        char* end;
        vi = static_cast<int>(std::strtol(q, &end, 10));
        q = end;
        if (*q == '/') {
          ++q;
          if (*q != '/') {
            ti = static_cast<int>(std::strtol(q, &end, 10));
            q = end;
          }
          if (*q == '/') {
            ++q;
            ni = static_cast<int>(std::strtol(q, &end, 10));
            q = end;
          }
        }
        int nv = static_cast<int>(vpos.size() / 3);
        int nt = static_cast<int>(vuv.size() / 2);
        int nn = static_cast<int>(vnrm.size() / 3);
        int V = vi > 0 ? vi - 1 : (vi < 0 ? nv + vi : -1);
        int T = ti > 0 ? ti - 1 : (ti < 0 ? nt + ti : -1);
        int N = ni > 0 ? ni - 1 : (ni < 0 ? nn + ni : -1);
        if (V < 0 || V >= nv) continue;

        int64_t key = key_of(V, T, N);
        if (key < 0) {  // index beyond the 21-bit pack: let Python handle it
          std::fclose(f);
          delete g_obj;
          g_obj = nullptr;
          return 2;
        }
        auto it = cache.find(key);
        int32_t packed;
        if (it != cache.end()) {
          packed = it->second;
        } else {
          packed = static_cast<int32_t>(g_obj->positions.size() / 3);
          g_obj->positions.insert(g_obj->positions.end(), &vpos[V * 3],
                                  &vpos[V * 3] + 3);
          if (N >= 0 && N < nn) {
            g_obj->normals.insert(g_obj->normals.end(), &vnrm[N * 3],
                                  &vnrm[N * 3] + 3);
            g_obj->has_normal.push_back(1);
          } else {
            g_obj->normals.insert(g_obj->normals.end(), {0.f, 0.f, 0.f});
            g_obj->has_normal.push_back(0);
          }
          if (T >= 0 && T < nt) {
            g_obj->uvs.insert(g_obj->uvs.end(), &vuv[T * 2], &vuv[T * 2] + 2);
          } else {
            g_obj->uvs.insert(g_obj->uvs.end(), {0.f, 0.f});
          }
          cache.emplace(key, packed);
        }
        face.push_back(packed);
      }
      for (size_t k = 1; k + 1 < face.size(); ++k) {
        g_obj->indices.push_back(face[0]);
        g_obj->indices.push_back(face[k]);
        g_obj->indices.push_back(face[k + 1]);
        g_obj->mat_index.push_back(cur_mat);
      }
    } else if (!std::strncmp(p, "usemtl", 6)) {
      std::string name(skip_ws(p + 6));
      while (!name.empty() && (name.back() == '\n' || name.back() == '\r' ||
                               name.back() == ' '))
        name.pop_back();
      auto it = mat_slots.find(name);
      if (it == mat_slots.end()) {
        cur_mat = static_cast<int32_t>(mat_order.size());
        mat_slots.emplace(name, cur_mat);
        mat_order.push_back(name);
      } else {
        cur_mat = it->second;
      }
    } else if (!std::strncmp(p, "mtllib", 6)) {
      std::string name(skip_ws(p + 6));
      while (!name.empty() && (name.back() == '\n' || name.back() == '\r' ||
                               name.back() == ' '))
        name.pop_back();
      g_obj->mtllib = name;
    }
  }
  std::fclose(f);

  for (size_t i = 0; i < mat_order.size(); ++i) {
    if (i) g_obj->mtl_names += '\n';
    g_obj->mtl_names += mat_order[i];
  }
  return 0;
}

int64_t trt_obj_num_vertices() { return g_obj ? g_obj->positions.size() / 3 : -1; }
int64_t trt_obj_num_triangles() { return g_obj ? g_obj->indices.size() / 3 : -1; }

// Copy out geometry arrays; buffers must hold the counts above.
int trt_obj_get(float* pos, float* nrm, uint8_t* has_nrm, float* uv,
                int32_t* idx, int32_t* mat_idx) {
  if (!g_obj) return -1;
  std::memcpy(pos, g_obj->positions.data(),
              g_obj->positions.size() * sizeof(float));
  std::memcpy(nrm, g_obj->normals.data(),
              g_obj->normals.size() * sizeof(float));
  std::memcpy(has_nrm, g_obj->has_normal.data(), g_obj->has_normal.size());
  std::memcpy(uv, g_obj->uvs.data(), g_obj->uvs.size() * sizeof(float));
  std::memcpy(idx, g_obj->indices.data(),
              g_obj->indices.size() * sizeof(int32_t));
  std::memcpy(mat_idx, g_obj->mat_index.data(),
              g_obj->mat_index.size() * sizeof(int32_t));
  return 0;
}

// '\n'-joined usemtl names (first-use order); returns total length.
int64_t trt_obj_mtl_names(char* buf, int64_t cap) {
  if (!g_obj) return -1;
  int64_t n = static_cast<int64_t>(g_obj->mtl_names.size());
  if (buf && cap >= n) std::memcpy(buf, g_obj->mtl_names.data(), n);
  return n;
}

int64_t trt_obj_mtllib(char* buf, int64_t cap) {
  if (!g_obj) return -1;
  int64_t n = static_cast<int64_t>(g_obj->mtllib.size());
  if (buf && cap >= n) std::memcpy(buf, g_obj->mtllib.data(), n);
  return n;
}

void trt_obj_free() {
  delete g_obj;
  g_obj = nullptr;
}

}  // extern "C"
