// itermvs_io — native IO runtime for itermvs_tpu.
//
// Fast paths for the host-side data plumbing around the TPU compute
// path: PFM decode/encode (the depth/confidence on-disk seam) and
// binary-PLY point-cloud assembly (fusion output). Exposed via the
// CPython C API; Python callers fall back to the pure-NumPy codecs in
// itermvs_tpu/io when this module is absent.
//
// Formats match itermvs_tpu/io/pfm.py and io/ply.py byte-for-byte
// (and therefore the reference implementation's datasets/data_io.py
// and eval.py PLY output).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct FileCloser {
  FILE* f;
  ~FileCloser() {
    if (f) fclose(f);
  }
};

// Read one whitespace-terminated token.
bool ReadToken(FILE* f, std::string* out) {
  out->clear();
  int c;
  while ((c = fgetc(f)) != EOF && (c == ' ' || c == '\n' || c == '\r' || c == '\t')) {
  }
  if (c == EOF) return false;
  do {
    out->push_back(static_cast<char>(c));
    c = fgetc(f);
  } while (c != EOF && c != ' ' && c != '\n' && c != '\r' && c != '\t');
  return true;
}

PyObject* ReadPfm(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  FILE* f = fopen(path, "rb");
  if (!f) {
    PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path);
    return nullptr;
  }
  FileCloser closer{f};

  std::string header, ws, hs, ss;
  if (!ReadToken(f, &header) || !ReadToken(f, &ws) || !ReadToken(f, &hs) ||
      !ReadToken(f, &ss)) {
    PyErr_Format(PyExc_ValueError, "%s: truncated PFM header", path);
    return nullptr;
  }
  int channels;
  if (header == "PF") {
    channels = 3;
  } else if (header == "Pf") {
    channels = 1;
  } else {
    PyErr_Format(PyExc_ValueError, "%s: not a PFM file", path);
    return nullptr;
  }
  // Skip the single whitespace after the scale line.
  long width = strtol(ws.c_str(), nullptr, 10);
  long height = strtol(hs.c_str(), nullptr, 10);
  double scale = strtod(ss.c_str(), nullptr);
  bool little_endian = scale < 0;
  if (scale < 0) scale = -scale;
  if (width <= 0 || height <= 0 || width > (1 << 20) || height > (1 << 20)) {
    PyErr_Format(PyExc_ValueError, "%s: bad PFM dims %ldx%ld", path, width, height);
    return nullptr;
  }

  const size_t count = static_cast<size_t>(width) * height * channels;
  std::vector<float> data(count);
  size_t got;
  Py_BEGIN_ALLOW_THREADS
  got = fread(data.data(), sizeof(float), count, f);
  Py_END_ALLOW_THREADS
  if (got != count) {
    PyErr_Format(PyExc_ValueError, "%s: truncated PFM payload", path);
    return nullptr;
  }

  // Byte-swap if the file endianness differs from host (assume LE host).
  if (!little_endian) {
    uint32_t* raw = reinterpret_cast<uint32_t*>(data.data());
    for (size_t i = 0; i < count; ++i) {
      raw[i] = __builtin_bswap32(raw[i]);
    }
  }

  // Flip rows (PFM stores bottom-up) into a fresh bytes object.
  PyObject* bytes = PyBytes_FromStringAndSize(nullptr, count * sizeof(float));
  if (!bytes) return nullptr;
  float* dst = reinterpret_cast<float*>(PyBytes_AS_STRING(bytes));
  const size_t row = static_cast<size_t>(width) * channels;
  Py_BEGIN_ALLOW_THREADS
  for (long y = 0; y < height; ++y) {
    memcpy(dst + static_cast<size_t>(y) * row,
           data.data() + static_cast<size_t>(height - 1 - y) * row,
           row * sizeof(float));
  }
  Py_END_ALLOW_THREADS

  return Py_BuildValue("(Nllld)", bytes, height, width, (long)channels, scale);
}

PyObject* WritePfm(PyObject*, PyObject* args) {
  const char* path;
  Py_buffer buf;
  long height, width, channels;
  double scale;
  if (!PyArg_ParseTuple(args, "sy*llld", &path, &buf, &height, &width,
                        &channels, &scale)) {
    return nullptr;
  }
  if (static_cast<size_t>(buf.len) !=
      static_cast<size_t>(height) * width * channels * sizeof(float)) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "buffer size mismatch");
    return nullptr;
  }

  FILE* f = fopen(path, "wb");
  if (!f) {
    PyBuffer_Release(&buf);
    PyErr_Format(PyExc_OSError, "cannot open %s for writing", path);
    return nullptr;
  }
  FileCloser closer{f};

  bool ok = true;
  Py_BEGIN_ALLOW_THREADS
  fprintf(f, "%s\n%ld %ld\n%f\n", channels == 3 ? "PF" : "Pf", width, height,
          -scale);  // negative scale = little endian
  const float* src = static_cast<const float*>(buf.buf);
  const size_t row = static_cast<size_t>(width) * channels;
  for (long y = height - 1; y >= 0 && ok; --y) {
    ok = fwrite(src + static_cast<size_t>(y) * row, sizeof(float), row, f) == row;
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  if (!ok) {
    PyErr_Format(PyExc_OSError, "short write to %s", path);
    return nullptr;
  }
  Py_RETURN_NONE;
}

PyObject* WritePly(PyObject*, PyObject* args) {
  // write_ply(path, xyz_f32_buffer, rgb_u8_buffer, n)
  const char* path;
  Py_buffer xyz, rgb;
  long n;
  if (!PyArg_ParseTuple(args, "sy*y*l", &path, &xyz, &rgb, &n)) return nullptr;
  if (static_cast<size_t>(xyz.len) != static_cast<size_t>(n) * 3 * sizeof(float) ||
      static_cast<size_t>(rgb.len) != static_cast<size_t>(n) * 3) {
    PyBuffer_Release(&xyz);
    PyBuffer_Release(&rgb);
    PyErr_SetString(PyExc_ValueError, "buffer size mismatch");
    return nullptr;
  }

  FILE* f = fopen(path, "wb");
  if (!f) {
    PyBuffer_Release(&xyz);
    PyBuffer_Release(&rgb);
    PyErr_Format(PyExc_OSError, "cannot open %s for writing", path);
    return nullptr;
  }
  FileCloser closer{f};

  bool ok = true;
  Py_BEGIN_ALLOW_THREADS
  fprintf(f,
          "ply\nformat binary_little_endian 1.0\nelement vertex %ld\n"
          "property float x\nproperty float y\nproperty float z\n"
          "property uchar red\nproperty uchar green\nproperty uchar blue\n"
          "end_header\n",
          n);
  const float* p = static_cast<const float*>(xyz.buf);
  const uint8_t* c = static_cast<const uint8_t*>(rgb.buf);
  // Interleave into 15-byte records through a buffered writer.
  std::vector<char> rec(static_cast<size_t>(n) * 15);
  for (long i = 0; i < n; ++i) {
    memcpy(&rec[i * 15], p + i * 3, 12);
    memcpy(&rec[i * 15 + 12], c + i * 3, 3);
  }
  ok = fwrite(rec.data(), 1, rec.size(), f) == rec.size();
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&xyz);
  PyBuffer_Release(&rgb);
  if (!ok) {
    PyErr_Format(PyExc_OSError, "short write to %s", path);
    return nullptr;
  }
  Py_RETURN_NONE;
}

PyMethodDef kMethods[] = {
    {"read_pfm_raw", ReadPfm, METH_VARARGS,
     "read_pfm_raw(path) -> (bytes, height, width, scale); row-flipped "
     "float32 payload, channels inferred by caller from len"},
    {"write_pfm_raw", WritePfm, METH_VARARGS,
     "write_pfm_raw(path, f32_buffer, h, w, channels, scale)"},
    {"write_ply_raw", WritePly, METH_VARARGS,
     "write_ply_raw(path, xyz_f32, rgb_u8, n)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "itermvs_io",
                       "native IO runtime for itermvs_tpu", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit_itermvs_io() { return PyModule_Create(&kModule); }
