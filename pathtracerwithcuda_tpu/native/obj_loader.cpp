// Fast OBJ parser — native path for scene loads.
//
// Same semantics as the Python fallback (scene/obj_loader.py): shapes split
// on g/o lines (tinyobj-style, as the reference uses per-group materials —
// reference Core/triangle_mesh.cpp), fan triangulation, v/vt/vn index forms
// incl. negatives, missing normals filled with the face normal.
//
// C ABI for ctypes; handle-based.

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Corner {
  int64_t v, t, n;
};

struct Shape {
  std::string name;
  std::vector<Corner> corners;  // 3 per triangle
};

struct ObjFile {
  std::vector<float> pos, nrm, tex;  // flat xyz / xyz / uv
  std::vector<Shape> shapes;
};

static int64_t fix_index(int64_t i, int64_t count) {
  return i > 0 ? i - 1 : count + i;
}

// parse one face token "v", "v/t", "v//n", "v/t/n"
static Corner parse_corner(const char* tok, const ObjFile& f) {
  Corner c{-1, -1, -1};
  char* end;
  c.v = fix_index(strtol(tok, &end, 10), (int64_t)f.pos.size() / 3);
  if (*end == '/') {
    ++end;
    if (*end != '/' && *end != '\0') {
      c.t = fix_index(strtol(end, &end, 10), (int64_t)f.tex.size() / 2);
    }
    if (*end == '/') {
      ++end;
      if (*end != '\0') {
        c.n = fix_index(strtol(end, &end, 10), (int64_t)f.nrm.size() / 3);
      }
    }
  }
  return c;
}

}  // namespace

extern "C" {

void* ptc_obj_load(const char* path) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return nullptr;
  auto* f = new ObjFile();
  f->shapes.emplace_back();

  char line[8192];
  std::vector<Corner> corners;
  while (std::fgets(line, sizeof(line), fp)) {
    char* s = line;
    while (*s == ' ' || *s == '\t') ++s;
    if (s[0] == 'v' && s[1] == ' ') {
      float x, y, z;
      if (std::sscanf(s + 2, "%f %f %f", &x, &y, &z) == 3) {
        f->pos.push_back(x);
        f->pos.push_back(y);
        f->pos.push_back(z);
      }
    } else if (s[0] == 'v' && s[1] == 'n' && s[2] == ' ') {
      float x, y, z;
      if (std::sscanf(s + 3, "%f %f %f", &x, &y, &z) == 3) {
        f->nrm.push_back(x);
        f->nrm.push_back(y);
        f->nrm.push_back(z);
      }
    } else if (s[0] == 'v' && s[1] == 't' && s[2] == ' ') {
      float u, v;
      if (std::sscanf(s + 3, "%f %f", &u, &v) == 2) {
        f->tex.push_back(u);
        f->tex.push_back(v);
      }
    } else if ((s[0] == 'g' || s[0] == 'o') &&
               (s[1] == ' ' || s[1] == '\n' || s[1] == '\r' || s[1] == '\0')) {
      // new shape once the current one has faces (tinyobj semantics)
      if (!f->shapes.back().corners.empty()) f->shapes.emplace_back();
      char* e = s + 1;
      while (*e == ' ') ++e;
      char* end = e + std::strcspn(e, "\r\n");
      f->shapes.back().name.assign(e, end);
    } else if (s[0] == 'f' && (s[1] == ' ' || s[1] == '\t')) {
      corners.clear();
      char* tok = std::strtok(s + 2, " \t\r\n");
      while (tok) {
        corners.push_back(parse_corner(tok, *f));
        tok = std::strtok(nullptr, " \t\r\n");
      }
      auto& out = f->shapes.back().corners;
      for (size_t k = 1; k + 1 < corners.size(); ++k) {  // fan triangulation
        out.push_back(corners[0]);
        out.push_back(corners[k]);
        out.push_back(corners[k + 1]);
      }
    }
  }
  std::fclose(fp);
  // drop a trailing empty shape
  while (f->shapes.size() > 1 && f->shapes.back().corners.empty())
    f->shapes.pop_back();
  if (f->shapes.size() == 1 && f->shapes[0].corners.empty()) {
    delete f;
    return nullptr;
  }
  return f;
}

int32_t ptc_obj_num_shapes(void* h) {
  return h ? (int32_t)((ObjFile*)h)->shapes.size() : 0;
}

int64_t ptc_obj_shape_tris(void* h, int32_t s) {
  return (int64_t)((ObjFile*)h)->shapes[s].corners.size() / 3;
}

void ptc_obj_shape_name(void* h, int32_t s, char* buf, int32_t n) {
  const std::string& name = ((ObjFile*)h)->shapes[s].name;
  std::snprintf(buf, n, "%s", name.c_str());
}

// fill (T,3,3) vertices, (T,3,3) normals, (T,3,2) uvs for shape s
void ptc_obj_fill(void* h, int32_t s, float* v, float* nrm, float* uv) {
  auto* f = (ObjFile*)h;
  const auto& corners = f->shapes[s].corners;
  int64_t t = (int64_t)corners.size() / 3;
  for (int64_t i = 0; i < t; ++i) {
    float fx[3][3];
    for (int j = 0; j < 3; ++j) {
      const Corner& c = corners[i * 3 + j];
      const float* p = &f->pos[3 * c.v];
      fx[j][0] = p[0];
      fx[j][1] = p[1];
      fx[j][2] = p[2];
      std::memcpy(v + (i * 3 + j) * 3, p, 3 * sizeof(float));
      if (c.t >= 0) {
        std::memcpy(uv + (i * 3 + j) * 2, &f->tex[2 * c.t], 2 * sizeof(float));
      } else {
        uv[(i * 3 + j) * 2] = 0.0f;
        uv[(i * 3 + j) * 2 + 1] = 0.0f;
      }
    }
    // face normal for any corner lacking one
    float e1[3] = {fx[1][0] - fx[0][0], fx[1][1] - fx[0][1], fx[1][2] - fx[0][2]};
    float e2[3] = {fx[2][0] - fx[0][0], fx[2][1] - fx[0][1], fx[2][2] - fx[0][2]};
    float fn[3] = {e1[1] * e2[2] - e1[2] * e2[1], e1[2] * e2[0] - e1[0] * e2[2],
                   e1[0] * e2[1] - e1[1] * e2[0]};
    float len = std::sqrt(fn[0] * fn[0] + fn[1] * fn[1] + fn[2] * fn[2]);
    if (len > 1e-20f) {
      fn[0] /= len;
      fn[1] /= len;
      fn[2] /= len;
    }
    for (int j = 0; j < 3; ++j) {
      const Corner& c = corners[i * 3 + j];
      if (c.n >= 0) {
        std::memcpy(nrm + (i * 3 + j) * 3, &f->nrm[3 * c.n], 3 * sizeof(float));
      } else {
        std::memcpy(nrm + (i * 3 + j) * 3, fn, 3 * sizeof(float));
      }
    }
  }
}

void ptc_obj_free(void* h) { delete (ObjFile*)h; }
}
