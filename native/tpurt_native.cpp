// tpurt native host runtime (SURVEY.md §2.1 C5/C6 loaders, C3' present,
// §3.3 build_acceleration_structures host orchestration).
//
// The reference implements its host tier in native code (Rust + ash,
// SURVEY.md §0 "What the reference is"); this file is the rebuild's native
// tier for the host-side hot paths that stay off the TPU:
//   * Wavefront OBJ geometry parsing (the ~70k-tri bunny and larger —
//     Python line parsing is the slow path),
//   * PNG encoding of the readback framebuffer (zlib),
//   * median-split BVH topology build over leaf AABBs (the packet-BVH
//     host build step; iterative, no recursion).
// Exposed as a plain C ABI consumed by ctypes (tpurt/utils/native.py).
// Python reference implementations remain the fallback and the
// differential-testing twin (tests/unit/test_native.py).
//
// Build: g++ -O2 -shared -fPIC tpurt_native.cpp -o libtpurt_native.so -lz

#include <zlib.h>

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PNG encoder (8-bit RGB, filter 0) — the headless "present" (C3').
// Returns 0 on success.
// ---------------------------------------------------------------------------
static void put_be32(std::vector<unsigned char>& v, uint32_t x) {
  v.push_back((x >> 24) & 0xFF);
  v.push_back((x >> 16) & 0xFF);
  v.push_back((x >> 8) & 0xFF);
  v.push_back(x & 0xFF);
}

static void put_chunk(FILE* f, const char tag[4],
                      const unsigned char* data, size_t n) {
  unsigned char len[4] = {(unsigned char)((n >> 24) & 0xFF),
                          (unsigned char)((n >> 16) & 0xFF),
                          (unsigned char)((n >> 8) & 0xFF),
                          (unsigned char)(n & 0xFF)};
  fwrite(len, 1, 4, f);
  fwrite(tag, 1, 4, f);
  if (n) fwrite(data, 1, n, f);
  uLong crc = crc32(0L, Z_NULL, 0);
  crc = crc32(crc, (const Bytef*)tag, 4);
  if (n) crc = crc32(crc, data, (uInt)n);
  unsigned char c[4] = {(unsigned char)((crc >> 24) & 0xFF),
                        (unsigned char)((crc >> 16) & 0xFF),
                        (unsigned char)((crc >> 8) & 0xFF),
                        (unsigned char)(crc & 0xFF)};
  fwrite(c, 1, 4, f);
}

int tpurt_png_write(const char* path, int32_t width, int32_t height,
                    const unsigned char* rgb) {
  const size_t stride = (size_t)width * 3;
  std::vector<unsigned char> raw((stride + 1) * height);
  for (int y = 0; y < height; ++y) {
    raw[(stride + 1) * y] = 0;  // filter: none
    memcpy(&raw[(stride + 1) * y + 1], rgb + stride * y, stride);
  }
  uLongf bound = compressBound((uLong)raw.size());
  std::vector<unsigned char> comp(bound);
  if (compress2(comp.data(), &bound, raw.data(), (uLong)raw.size(), 6) !=
      Z_OK)
    return 1;

  FILE* f = fopen(path, "wb");
  if (!f) return 2;
  static const unsigned char sig[8] = {0x89, 'P', 'N', 'G',
                                       '\r', '\n', 0x1A, '\n'};
  fwrite(sig, 1, 8, f);
  std::vector<unsigned char> ihdr;
  put_be32(ihdr, (uint32_t)width);
  put_be32(ihdr, (uint32_t)height);
  ihdr.push_back(8);   // bit depth
  ihdr.push_back(2);   // color type RGB
  ihdr.push_back(0);   // compression
  ihdr.push_back(0);   // filter
  ihdr.push_back(0);   // interlace
  put_chunk(f, "IHDR", ihdr.data(), ihdr.size());
  put_chunk(f, "IDAT", comp.data(), bound);
  put_chunk(f, "IEND", nullptr, 0);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// OBJ geometry parser (C5). Two-call protocol:
//   pass 1 (counts_only=1): fills n_verts/n_normals/n_tris.
//   pass 2: fills caller-allocated buffers.
// Faces: v, v//vn, v/vt/vn forms, negative indices, polygon fan.
// face_mat: index of the active `usemtl` in order of first use (-1 before
// any usemtl). mtl_names: the usemtl name table, '\n'-joined into a
// caller buffer (cap bytes) on pass 2; Python maps names → materials.
// Returns 0 on success.
// ---------------------------------------------------------------------------
int tpurt_obj_parse(const char* path, int counts_only, int32_t* n_verts,
                    int32_t* n_normals, int32_t* n_tris, float* verts,
                    float* normals, int32_t* tri_v, int32_t* tri_n,
                    int32_t* face_mat, char* mtl_names, int32_t names_cap,
                    char* mtllib, int32_t mtllib_cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return 2;

  std::vector<std::string> mats;
  int cur_mat = -1;
  int32_t nv = 0, nn = 0, nt = 0;
  std::string mtllib_name;

  char line[8192];
  while (fgets(line, sizeof line, f)) {
    char* s = line;
    while (*s == ' ' || *s == '\t') ++s;
    if (s[0] == 'v' && (s[1] == ' ' || s[1] == '\t')) {
      if (!counts_only) {
        float x, y, z;
        if (sscanf(s + 2, "%f %f %f", &x, &y, &z) == 3) {
          verts[nv * 3 + 0] = x;
          verts[nv * 3 + 1] = y;
          verts[nv * 3 + 2] = z;
        }
      }
      ++nv;
    } else if (s[0] == 'v' && s[1] == 'n' &&
               (s[2] == ' ' || s[2] == '\t')) {
      if (!counts_only) {
        float x, y, z;
        if (sscanf(s + 3, "%f %f %f", &x, &y, &z) == 3) {
          normals[nn * 3 + 0] = x;
          normals[nn * 3 + 1] = y;
          normals[nn * 3 + 2] = z;
        }
      }
      ++nn;
    } else if (s[0] == 'f' && (s[1] == ' ' || s[1] == '\t')) {
      // parse corner refs: vi[/vti][/vni] or vi//vni
      int32_t vi[64], ni[64];
      int k = 0;
      char* p = s + 2;
      while (*p && k < 64) {
        while (*p == ' ' || *p == '\t') ++p;
        if (!*p || *p == '\n' || *p == '\r' || *p == '#') break;
        long v = strtol(p, &p, 10);
        long n = 0;
        bool has_n = false;
        if (*p == '/') {
          ++p;
          if (*p == '/') {
            ++p;
            n = strtol(p, &p, 10);
            has_n = true;
          } else {
            strtol(p, &p, 10);  // vt, ignored
            if (*p == '/') {
              ++p;
              n = strtol(p, &p, 10);
              has_n = true;
            }
          }
        }
        vi[k] = (int32_t)(v > 0 ? v - 1 : nv + v);
        ni[k] = has_n ? (int32_t)(n > 0 ? n - 1 : nn + n) : -1;
        ++k;
      }
      for (int c = 2; c < k; ++c) {
        if (!counts_only) {
          tri_v[nt * 3 + 0] = vi[0];
          tri_v[nt * 3 + 1] = vi[c - 1];
          tri_v[nt * 3 + 2] = vi[c];
          tri_n[nt * 3 + 0] = ni[0];
          tri_n[nt * 3 + 1] = ni[c - 1];
          tri_n[nt * 3 + 2] = ni[c];
          face_mat[nt] = cur_mat;
        }
        ++nt;
      }
    } else if (!strncmp(s, "usemtl", 6)) {
      char name[1024];
      if (sscanf(s + 6, "%1023s", name) == 1) {
        auto it = std::find(mats.begin(), mats.end(), std::string(name));
        if (it == mats.end()) {
          mats.push_back(name);
          cur_mat = (int)mats.size() - 1;
        } else {
          cur_mat = (int)(it - mats.begin());
        }
      }
    } else if (!strncmp(s, "mtllib", 6)) {
      char name[1024];
      if (sscanf(s + 6, "%1023s", name) == 1) mtllib_name = name;
    }
  }
  fclose(f);

  *n_verts = nv;
  *n_normals = nn;
  *n_tris = nt;
  if (!counts_only) {
    std::string joined;
    for (size_t i = 0; i < mats.size(); ++i) {
      if (i) joined += '\n';
      joined += mats[i];
    }
    if (mtl_names && names_cap > 0) {
      strncpy(mtl_names, joined.c_str(), names_cap - 1);
      mtl_names[names_cap - 1] = 0;
    }
    if (mtllib && mtllib_cap > 0) {
      strncpy(mtllib, mtllib_name.c_str(), mtllib_cap - 1);
      mtllib[mtllib_cap - 1] = 0;
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Median-split BVH topology over item AABBs (the packet-BVH host build,
// SURVEY.md §3.3). Preorder with skip links; iterative (explicit stack).
// Outputs sized 2n-1. `first` = item id for leaves (count==1), 0 internal.
// Returns node count.
// ---------------------------------------------------------------------------
int32_t tpurt_bvh_build(int32_t n, const float* bmin, const float* bmax,
                        float* out_bmin, float* out_bmax, int32_t* out_first,
                        int32_t* out_count, int32_t* out_skip) {
  std::vector<float> cx(n), cy(n), cz(n);
  for (int i = 0; i < n; ++i) {
    cx[i] = 0.5f * (bmin[i * 3 + 0] + bmax[i * 3 + 0]);
    cy[i] = 0.5f * (bmin[i * 3 + 1] + bmax[i * 3 + 1]);
    cz[i] = 0.5f * (bmin[i * 3 + 2] + bmax[i * 3 + 2]);
  }
  std::vector<int32_t> idx(n);
  for (int i = 0; i < n; ++i) idx[i] = i;

  struct Task {
    int lo, hi;     // range in idx
    int parent;     // node id of parent (-1 root), for sizes
  };
  int32_t n_nodes = 0;
  std::vector<int32_t> parent_of;
  std::vector<Task> stack;
  stack.push_back({0, n, -1});
  // Emit preorder: a worklist stack gives DFS order with right child pushed
  // first so left pops first (preorder = self, left, right).
  while (!stack.empty()) {
    Task t = stack.back();
    stack.pop_back();
    int me = n_nodes++;
    parent_of.push_back(t.parent);
    float bx = 3.4e38f, by = 3.4e38f, bz = 3.4e38f;
    float Bx = -3.4e38f, By = -3.4e38f, Bz = -3.4e38f;
    float cminx = 3.4e38f, cminy = 3.4e38f, cminz = 3.4e38f;
    float cmaxx = -3.4e38f, cmaxy = -3.4e38f, cmaxz = -3.4e38f;
    for (int k = t.lo; k < t.hi; ++k) {
      int i = idx[k];
      bx = std::min(bx, bmin[i * 3 + 0]);
      by = std::min(by, bmin[i * 3 + 1]);
      bz = std::min(bz, bmin[i * 3 + 2]);
      Bx = std::max(Bx, bmax[i * 3 + 0]);
      By = std::max(By, bmax[i * 3 + 1]);
      Bz = std::max(Bz, bmax[i * 3 + 2]);
      cminx = std::min(cminx, cx[i]);
      cmaxx = std::max(cmaxx, cx[i]);
      cminy = std::min(cminy, cy[i]);
      cmaxy = std::max(cmaxy, cy[i]);
      cminz = std::min(cminz, cz[i]);
      cmaxz = std::max(cmaxz, cz[i]);
    }
    out_bmin[me * 3 + 0] = bx;
    out_bmin[me * 3 + 1] = by;
    out_bmin[me * 3 + 2] = bz;
    out_bmax[me * 3 + 0] = Bx;
    out_bmax[me * 3 + 1] = By;
    out_bmax[me * 3 + 2] = Bz;
    if (t.hi - t.lo == 1) {
      out_first[me] = idx[t.lo];
      out_count[me] = 1;
      continue;
    }
    out_first[me] = 0;
    out_count[me] = 0;
    float ex = cmaxx - cminx, ey = cmaxy - cminy, ez = cmaxz - cminz;
    const float* key = (ex >= ey && ex >= ez) ? cx.data()
                       : (ey >= ez)           ? cy.data()
                                              : cz.data();
    int mid = t.lo + (t.hi - t.lo) / 2;
    std::nth_element(idx.begin() + t.lo, idx.begin() + mid,
                     idx.begin() + t.hi,
                     [key](int a, int b) { return key[a] < key[b]; });
    stack.push_back({mid, t.hi, me});   // right (popped second)
    stack.push_back({t.lo, mid, me});   // left (popped first)
  }
  // skip links: preorder rank + subtree size; sizes by reverse scan
  std::vector<int32_t> sizes(n_nodes, 1);
  for (int i = n_nodes - 1; i >= 0; --i)
    if (parent_of[i] >= 0) sizes[parent_of[i]] += sizes[i];
  for (int i = 0; i < n_nodes; ++i) out_skip[i] = i + sizes[i];
  return n_nodes;
}

}  // extern "C"
