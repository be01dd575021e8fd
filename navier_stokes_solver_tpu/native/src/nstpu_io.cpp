// Native (C++) IO runtime for the TPU Navier-Stokes framework.
//
// Plays the role the reference's native libraries play for IO: deal.II's
// DataOut::write_vtu_with_pvtu_record (NSSolver.cpp:789-793), GridOut
// ::write_msh (NSSolver.cpp:108-110) and GridIn::read_msh
// (NSSolver.cpp:155-161) are all C++; this module provides the same
// services for the host side of the TPU framework.  Exposed as a plain C
// ABI consumed through ctypes (no pybind11 in the image).
//
// Build: see ../build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// base64 (VTU appended/inline binary encoding)
// ---------------------------------------------------------------------------

const char B64[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

void b64_encode(const uint8_t* data, size_t n, std::string& out) {
  out.reserve(out.size() + ((n + 2) / 3) * 4);
  size_t i = 0;
  for (; i + 3 <= n; i += 3) {
    uint32_t v = (data[i] << 16) | (data[i + 1] << 8) | data[i + 2];
    out.push_back(B64[(v >> 18) & 63]);
    out.push_back(B64[(v >> 12) & 63]);
    out.push_back(B64[(v >> 6) & 63]);
    out.push_back(B64[v & 63]);
  }
  if (i + 1 == n) {
    uint32_t v = data[i] << 16;
    out.push_back(B64[(v >> 18) & 63]);
    out.push_back(B64[(v >> 12) & 63]);
    out.push_back('=');
    out.push_back('=');
  } else if (i + 2 == n) {
    uint32_t v = (data[i] << 16) | (data[i + 1] << 8);
    out.push_back(B64[(v >> 18) & 63]);
    out.push_back(B64[(v >> 12) & 63]);
    out.push_back(B64[(v >> 6) & 63]);
    out.push_back('=');
  }
}

// VTU "binary" format: base64( <u32 byte count> <payload> )
void b64_block(const void* data, size_t nbytes, std::string& out) {
  std::vector<uint8_t> buf(4 + nbytes);
  uint32_t header = static_cast<uint32_t>(nbytes);
  std::memcpy(buf.data(), &header, 4);
  std::memcpy(buf.data() + 4, data, nbytes);
  b64_encode(buf.data(), buf.size(), out);
}

void data_array(std::string& s, const char* dtype, const char* name,
                int ncomp, const void* data, size_t nbytes) {
  s += "<DataArray type=\"";
  s += dtype;
  s += "\"";
  if (name) {
    s += " Name=\"";
    s += name;
    s += "\"";
  }
  if (ncomp > 1) {
    char tmp[64];
    std::snprintf(tmp, sizeof tmp, " NumberOfComponents=\"%d\"", ncomp);
    s += tmp;
  }
  s += " format=\"binary\">";
  b64_block(data, nbytes, s);
  s += "</DataArray>\n";
}

}  // namespace

extern "C" {

// Write a single-piece UnstructuredGrid VTU file with velocity/pressure
// point data and a per-cell partitioning field.  Returns 0 on success.
int nstpu_write_vtu(const char* path,
                    const double* points,   // [n_pts * 3]
                    int64_t n_pts,
                    const int32_t* conn,    // [n_cells * 4] quad corners
                    int64_t n_cells,
                    const double* velocity, // [n_pts * 3]
                    const double* pressure, // [n_pts]
                    const double* partitioning /* [n_cells] */) {
  std::string s;
  s.reserve(static_cast<size_t>(n_pts) * 48 + static_cast<size_t>(n_cells) * 8 +
            4096);
  char tmp[160];
  s += "<?xml version=\"1.0\"?>\n";
  s += "<VTKFile type=\"UnstructuredGrid\" version=\"0.1\" "
       "byte_order=\"LittleEndian\">\n<UnstructuredGrid>\n";
  std::snprintf(tmp, sizeof tmp,
                "<Piece NumberOfPoints=\"%lld\" NumberOfCells=\"%lld\">\n",
                static_cast<long long>(n_pts), static_cast<long long>(n_cells));
  s += tmp;

  s += "<Points>\n";
  data_array(s, "Float64", nullptr, 3, points, sizeof(double) * 3 * n_pts);
  s += "</Points>\n<Cells>\n";
  data_array(s, "Int32", "connectivity", 1, conn, sizeof(int32_t) * 4 * n_cells);
  std::vector<int32_t> offsets(n_cells);
  for (int64_t i = 0; i < n_cells; ++i) offsets[i] = 4 * (i + 1);
  data_array(s, "Int32", "offsets", 1, offsets.data(),
             sizeof(int32_t) * n_cells);
  std::vector<uint8_t> types(n_cells, 9);  // VTK_QUAD
  data_array(s, "UInt8", "types", 1, types.data(), n_cells);
  s += "</Cells>\n<PointData Vectors=\"velocity\">\n";
  data_array(s, "Float64", "velocity", 3, velocity,
             sizeof(double) * 3 * n_pts);
  data_array(s, "Float64", "pressure", 1, pressure, sizeof(double) * n_pts);
  s += "</PointData>\n<CellData>\n";
  data_array(s, "Float64", "partitioning", 1, partitioning,
             sizeof(double) * n_cells);
  s += "</CellData>\n</Piece>\n</UnstructuredGrid>\n</VTKFile>\n";

  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  size_t written = std::fwrite(s.data(), 1, s.size(), f);
  std::fclose(f);
  return written == s.size() ? 0 : 2;
}

// ---------------------------------------------------------------------------
// gmsh MSH2 parser (GridIn::read_msh equivalent, NSSolver.cpp:155-161)
// ---------------------------------------------------------------------------
//
// Two-phase protocol for ctypes:
//   1. nstpu_msh_open(path) -> handle (parses the whole file), or 0 on error
//   2. nstpu_msh_counts(handle, &n_nodes, &n_tri, &n_quad, &n_edges)
//   3. nstpu_msh_fill(handle, nodes_xy, tri, tri_tag, quad, quad_tag,
//                     edges, edge_tag)   (0-based connectivity)
//   4. nstpu_msh_close(handle)

struct MshData {
  std::vector<double> nodes_xy;     // [n_nodes * 2]
  std::vector<int64_t> node_ids;    // original 1-based gmsh ids
  std::vector<int32_t> tri;         // [n_tri * 3]
  std::vector<int32_t> tri_tag;     // physical tag
  std::vector<int32_t> quad;        // [n_quad * 4]
  std::vector<int32_t> quad_tag;
  std::vector<int32_t> edges;       // [n_edges * 2]
  std::vector<int32_t> edge_tag;
};

void* nstpu_msh_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto* d = new MshData();
  char line[512];
  std::vector<int64_t> id_map;  // gmsh id -> 0-based index (dense remap)
  // First pass: nodes
  bool ok = true;
  while (std::fgets(line, sizeof line, f)) {
    if (std::strncmp(line, "$Nodes", 6) == 0) {
      long long n = 0;
      if (!std::fgets(line, sizeof line, f) ||
          std::sscanf(line, "%lld", &n) != 1) {
        ok = false;
        break;
      }
      d->nodes_xy.reserve(2 * n);
      d->node_ids.reserve(n);
      for (long long i = 0; i < n; ++i) {
        long long id;
        double x, y, z;
        if (!std::fgets(line, sizeof line, f) ||
            std::sscanf(line, "%lld %lf %lf %lf", &id, &x, &y, &z) != 4) {
          ok = false;
          break;
        }
        d->node_ids.push_back(id);
        d->nodes_xy.push_back(x);
        d->nodes_xy.push_back(y);
      }
    } else if (std::strncmp(line, "$Elements", 9) == 0) {
      // build the id map lazily (ids may be sparse)
      int64_t max_id = 0;
      for (int64_t id : d->node_ids) max_id = id > max_id ? id : max_id;
      id_map.assign(max_id + 1, -1);
      for (size_t i = 0; i < d->node_ids.size(); ++i)
        id_map[d->node_ids[i]] = static_cast<int64_t>(i);

      long long n = 0;
      if (!std::fgets(line, sizeof line, f) ||
          std::sscanf(line, "%lld", &n) != 1) {
        ok = false;
        break;
      }
      for (long long i = 0; i < n && ok; ++i) {
        if (!std::fgets(line, sizeof line, f)) {
          ok = false;
          break;
        }
        long long eid;
        int etype, ntags;
        int pos = 0;
        if (std::sscanf(line, "%lld %d %d%n", &eid, &etype, &ntags, &pos) < 3) {
          ok = false;
          break;
        }
        const char* p = line + pos;
        int tag = 0;
        for (int t = 0; t < ntags; ++t) {
          int v, adv;
          if (std::sscanf(p, "%d%n", &v, &adv) != 1) {
            ok = false;
            break;
          }
          if (t == 0) tag = v;  // physical tag
          p += adv;
        }
        int nv = etype == 1 ? 2 : etype == 2 ? 3 : etype == 3 ? 4 : 0;
        if (nv == 0) continue;  // skip points/higher order
        int32_t v[4];
        for (int k = 0; k < nv; ++k) {
          long long gid;
          int adv;
          if (std::sscanf(p, "%lld%n", &gid, &adv) != 1 || gid < 0 ||
              gid >= static_cast<long long>(id_map.size()) ||
              id_map[gid] < 0) {
            ok = false;
            break;
          }
          v[k] = static_cast<int32_t>(id_map[gid]);
          p += adv;
        }
        if (!ok) break;
        if (etype == 1) {
          d->edges.insert(d->edges.end(), v, v + 2);
          d->edge_tag.push_back(tag);
        } else if (etype == 2) {
          d->tri.insert(d->tri.end(), v, v + 3);
          d->tri_tag.push_back(tag);
        } else {
          d->quad.insert(d->quad.end(), v, v + 4);
          d->quad_tag.push_back(tag);
        }
      }
    }
  }
  std::fclose(f);
  if (!ok) {
    delete d;
    return nullptr;
  }
  return d;
}

void nstpu_msh_counts(void* handle, int64_t* n_nodes, int64_t* n_tri,
                      int64_t* n_quad, int64_t* n_edges) {
  auto* d = static_cast<MshData*>(handle);
  *n_nodes = static_cast<int64_t>(d->node_ids.size());
  *n_tri = static_cast<int64_t>(d->tri_tag.size());
  *n_quad = static_cast<int64_t>(d->quad_tag.size());
  *n_edges = static_cast<int64_t>(d->edge_tag.size());
}

void nstpu_msh_fill(void* handle, double* nodes_xy, int32_t* tri,
                    int32_t* tri_tag, int32_t* quad, int32_t* quad_tag,
                    int32_t* edges, int32_t* edge_tag) {
  auto* d = static_cast<MshData*>(handle);
  std::memcpy(nodes_xy, d->nodes_xy.data(),
              d->nodes_xy.size() * sizeof(double));
  std::memcpy(tri, d->tri.data(), d->tri.size() * sizeof(int32_t));
  std::memcpy(tri_tag, d->tri_tag.data(), d->tri_tag.size() * sizeof(int32_t));
  std::memcpy(quad, d->quad.data(), d->quad.size() * sizeof(int32_t));
  std::memcpy(quad_tag, d->quad_tag.data(),
              d->quad_tag.size() * sizeof(int32_t));
  std::memcpy(edges, d->edges.data(), d->edges.size() * sizeof(int32_t));
  std::memcpy(edge_tag, d->edge_tag.data(),
              d->edge_tag.size() * sizeof(int32_t));
}

void nstpu_msh_close(void* handle) { delete static_cast<MshData*>(handle); }

}  // extern "C"
