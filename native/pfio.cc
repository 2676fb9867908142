// pfio: native I/O runtime for pfhubbenchmarks_tpu.
//
// TPU-native replacement for the reference's native I/O dependencies (the
// DOLFIN C++ VTK/PVD writer and HDF5 layer it relies on for field output,
// dolfin/bench2.py:178-182, b1.py:115-118). Fields on the structured grid
// map onto VTK ImageData (.vti): vertex values as PointData, crossed-grid
// cell-center values as CellData — no unstructured connectivity needed.
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (pfhubbenchmarks_tpu/io/vti.py); a pure-Python fallback produces
// byte-identical files when the shared library isn't built.
//
// Build: make -C native   (g++ -O2 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Append one appended-data block: uint64 byte count then raw payload.
void append_block(std::string* out, const void* data, uint64_t nbytes) {
  out->append(reinterpret_cast<const char*>(&nbytes), sizeof(nbytes));
  out->append(reinterpret_cast<const char*>(data), nbytes);
}

}  // namespace

extern "C" {

// Write a VTK ImageData file.
//   extent: nx, ny, nz cell counts (nz = 0 for 2D)
//   origin/spacing: grid geometry
//   point data: n_point_fields arrays of (nx+1)*(ny+1)*(nz+1) doubles
//   cell data:  n_cell_fields arrays of nx*ny*max(nz,1) doubles
// Returns 0 on success, nonzero errno-style code on failure.
int pfio_write_vti(const char* path, int nx, int ny, int nz, double ox,
                   double oy, double oz, double sx, double sy, double sz,
                   int n_point_fields, const char** point_names,
                   const double** point_data, int n_cell_fields,
                   const char** cell_names, const double** cell_data) {
  const int pnz = nz > 0 ? nz : 0;
  const uint64_t npts =
      uint64_t(nx + 1) * uint64_t(ny + 1) * uint64_t(pnz + 1);
  const uint64_t ncells = uint64_t(nx) * uint64_t(ny) * uint64_t(nz > 0 ? nz : 1);

  std::string xml;
  char buf[512];
  xml += "<?xml version=\"1.0\"?>\n";
  xml +=
      "<VTKFile type=\"ImageData\" version=\"1.0\" "
      "byte_order=\"LittleEndian\" header_type=\"UInt64\">\n";
  snprintf(buf, sizeof(buf),
           "  <ImageData WholeExtent=\"0 %d 0 %d 0 %d\" Origin=\"%.17g %.17g "
           "%.17g\" Spacing=\"%.17g %.17g %.17g\">\n",
           nx, ny, pnz, ox, oy, oz, sx, sy, sz);
  xml += buf;
  snprintf(buf, sizeof(buf), "    <Piece Extent=\"0 %d 0 %d 0 %d\">\n", nx, ny,
           pnz);
  xml += buf;

  uint64_t offset = 0;
  std::string appended;
  xml += "      <PointData>\n";
  for (int f = 0; f < n_point_fields; ++f) {
    snprintf(buf, sizeof(buf),
             "        <DataArray type=\"Float64\" Name=\"%s\" "
             "format=\"appended\" offset=\"%llu\"/>\n",
             point_names[f], (unsigned long long)offset);
    xml += buf;
    const uint64_t nbytes = npts * sizeof(double);
    append_block(&appended, point_data[f], nbytes);
    offset += sizeof(uint64_t) + nbytes;
  }
  xml += "      </PointData>\n";
  xml += "      <CellData>\n";
  for (int f = 0; f < n_cell_fields; ++f) {
    snprintf(buf, sizeof(buf),
             "        <DataArray type=\"Float64\" Name=\"%s\" "
             "format=\"appended\" offset=\"%llu\"/>\n",
             cell_names[f], (unsigned long long)offset);
    xml += buf;
    const uint64_t nbytes = ncells * sizeof(double);
    append_block(&appended, cell_data[f], nbytes);
    offset += sizeof(uint64_t) + nbytes;
  }
  xml += "      </CellData>\n";
  xml += "    </Piece>\n  </ImageData>\n";
  xml += "  <AppendedData encoding=\"raw\">\n_";

  FILE* fp = fopen(path, "wb");
  if (!fp) return 1;
  if (fwrite(xml.data(), 1, xml.size(), fp) != xml.size()) {
    fclose(fp);
    return 2;
  }
  if (!appended.empty() &&
      fwrite(appended.data(), 1, appended.size(), fp) != appended.size()) {
    fclose(fp);
    return 2;
  }
  const char* tail = "\n  </AppendedData>\n</VTKFile>\n";
  fwrite(tail, 1, strlen(tail), fp);
  return fclose(fp) == 0 ? 0 : 3;
}

// Append one CSV row (time-series observables) — the benchmark_output sink.
int pfio_append_csv(const char* path, const double* row, int n,
                    const char* header_if_new) {
  FILE* probe = fopen(path, "rb");
  const bool is_new = probe == nullptr;
  if (probe) fclose(probe);
  FILE* fp = fopen(path, "ab");
  if (!fp) return 1;
  if (is_new && header_if_new && header_if_new[0]) {
    fprintf(fp, "%s\n", header_if_new);
  }
  for (int i = 0; i < n; ++i) {
    fprintf(fp, i + 1 < n ? "%1.10f," : "%1.10f", row[i]);
  }
  fprintf(fp, "\n");
  return fclose(fp) == 0 ? 0 : 3;
}

}  // extern "C"
