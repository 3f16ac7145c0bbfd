// Native marching-tetrahedra isosurface extractor.
//
// C++ core for levelsetpy_tpu/viz: extracts the phi == level surface of a
// dense 3-D scalar field by splitting each cell into 6 tetrahedra around the
// main diagonal (same decomposition and case logic as the vectorized numpy
// implementation in viz/marching.py, which doubles as its test oracle).
// Emits a deduplicated vertex buffer (one vertex per crossing edge, linearly
// interpolated) and an index buffer of triangles.
//
// Exposed as a flat C ABI for ctypes (no pybind11 in this image):
//   marching_tet(phi, nx, ny, nz, level, spacing, origin,
//                &verts, &n_verts, &faces, &n_faces) -> 0 on success
//   marching_tet_free(verts, faces)
//
// Build: scripts/build_native.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// Corner offsets of a cell, bit order (x, y, z) — matches marching.py.
const int kCorners[8][3] = {
    {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
    {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1},
};

// Six tetrahedra around the main diagonal c0-c6.
const int kTets[6][4] = {
    {0, 1, 2, 6}, {0, 2, 3, 6}, {0, 3, 7, 6},
    {0, 7, 4, 6}, {0, 4, 5, 6}, {0, 5, 1, 6},
};

struct EdgeKey {
  int64_t a, b;
  bool operator==(const EdgeKey& o) const { return a == o.a && b == o.b; }
};

struct EdgeKeyHash {
  size_t operator()(const EdgeKey& k) const {
    uint64_t h = static_cast<uint64_t>(k.a) * 1000003u ^
                 static_cast<uint64_t>(k.b) * 2654435761u;
    return static_cast<size_t>(h ^ (h >> 29));
  }
};

}  // namespace

extern "C" {

int marching_tet(const double* phi, int64_t nx, int64_t ny, int64_t nz,
                 double level, const double* spacing, const double* origin,
                 double** out_verts, int64_t* out_n_verts,
                 int64_t** out_faces, int64_t* out_n_faces) {
  if (nx < 2 || ny < 2 || nz < 2) {
    *out_verts = nullptr;
    *out_faces = nullptr;
    *out_n_verts = 0;
    *out_n_faces = 0;
    return 0;
  }
  const int64_t syz = ny * nz;
  auto flat = [&](int64_t i, int64_t j, int64_t k) {
    return i * syz + j * nz + k;
  };

  std::vector<double> verts;
  std::vector<int64_t> faces;
  std::unordered_map<EdgeKey, int64_t, EdgeKeyHash> edge_to_vertex;
  verts.reserve(1 << 16);
  faces.reserve(1 << 16);

  // One vertex per crossing edge, keyed by the sorted endpoint pair.
  auto vertex_on_edge = [&](int64_t fa_idx, int64_t fb_idx) -> int64_t {
    EdgeKey key{fa_idx < fb_idx ? fa_idx : fb_idx,
                fa_idx < fb_idx ? fb_idx : fa_idx};
    auto it = edge_to_vertex.find(key);
    if (it != edge_to_vertex.end()) return it->second;
    const double fa = phi[fa_idx], fb = phi[fb_idx];
    double t = (fb != fa) ? (level - fa) / (fb - fa) : 0.5;
    if (t < 0) t = 0;
    if (t > 1) t = 1;
    const int64_t ai = fa_idx / syz, aj = (fa_idx / nz) % ny, ak = fa_idx % nz;
    const int64_t bi = fb_idx / syz, bj = (fb_idx / nz) % ny, bk = fb_idx % nz;
    const double px = origin[0] + spacing[0] * (ai + t * (bi - ai));
    const double py = origin[1] + spacing[1] * (aj + t * (bj - aj));
    const double pz = origin[2] + spacing[2] * (ak + t * (bk - ak));
    const int64_t id = static_cast<int64_t>(verts.size() / 3);
    verts.push_back(px);
    verts.push_back(py);
    verts.push_back(pz);
    edge_to_vertex.emplace(key, id);
    return id;
  };

  int64_t corner_flat[8];
  double corner_val[8];
  for (int64_t i = 0; i + 1 < nx; ++i) {
    for (int64_t j = 0; j + 1 < ny; ++j) {
      for (int64_t k = 0; k + 1 < nz; ++k) {
        for (int c = 0; c < 8; ++c) {
          corner_flat[c] =
              flat(i + kCorners[c][0], j + kCorners[c][1], k + kCorners[c][2]);
          corner_val[c] = phi[corner_flat[c]];
        }
        for (int t = 0; t < 6; ++t) {
          int64_t vf[4];
          double vv[4];
          int mask = 0;
          for (int c = 0; c < 4; ++c) {
            vf[c] = corner_flat[kTets[t][c]];
            vv[c] = corner_val[kTets[t][c]];
            if (vv[c] < level) mask |= 1 << c;
          }
          if (mask == 0 || mask == 15) continue;
          int ins[4], outs[4], n_in = 0, n_out = 0;
          for (int c = 0; c < 4; ++c) {
            if (mask & (1 << c)) {
              ins[n_in++] = c;
            } else {
              outs[n_out++] = c;
            }
          }
          auto emit = [&](int e0a, int e0b, int e1a, int e1b, int e2a,
                          int e2b) {
            const int64_t v0 = vertex_on_edge(vf[e0a], vf[e0b]);
            const int64_t v1 = vertex_on_edge(vf[e1a], vf[e1b]);
            const int64_t v2 = vertex_on_edge(vf[e2a], vf[e2b]);
            if (v0 == v1 || v1 == v2 || v0 == v2) return;  // degenerate
            faces.push_back(v0);
            faces.push_back(v1);
            faces.push_back(v2);
          };
          if (n_in == 1) {
            emit(ins[0], outs[0], ins[0], outs[1], ins[0], outs[2]);
          } else if (n_in == 3) {
            emit(outs[0], ins[0], outs[0], ins[1], outs[0], ins[2]);
          } else {  // two inside: quad (ac, ad, bd, bc) -> two triangles
            const int a = ins[0], b = ins[1], c = outs[0], d = outs[1];
            emit(a, c, a, d, b, d);
            emit(a, c, b, d, b, c);
          }
        }
      }
    }
  }

  *out_n_verts = static_cast<int64_t>(verts.size() / 3);
  *out_n_faces = static_cast<int64_t>(faces.size() / 3);
  double* vbuf =
      static_cast<double*>(std::malloc(verts.size() * sizeof(double)));
  int64_t* fbuf =
      static_cast<int64_t*>(std::malloc(faces.size() * sizeof(int64_t)));
  if ((!vbuf && !verts.empty()) || (!fbuf && !faces.empty())) {
    std::free(vbuf);
    std::free(fbuf);
    return 1;
  }
  if (!verts.empty()) std::memcpy(vbuf, verts.data(), verts.size() * 8);
  if (!faces.empty()) std::memcpy(fbuf, faces.data(), faces.size() * 8);
  *out_verts = vbuf;
  *out_faces = fbuf;
  return 0;
}

void marching_tet_free(double* verts, int64_t* faces) {
  std::free(verts);
  std::free(faces);
}

}  // extern "C"
