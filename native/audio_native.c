/* Native audio kernels for the data pipeline.
 *
 * The reference does per-item decode + µ-law in Python/numpy through an
 * ffmpeg subprocess per __getitem__ (reference dataset.py:100-110, 324-347).
 * Our loader already amortises decode via the window cache (data/cache.py);
 * this extension provides batch assembly as a C kernel so the single
 * data-loader core keeps a TPU fed:
 *
 *   - gather_windows: assemble a [N, W] float32 batch from an arena of
 *     decoded audio given (offset, length) spans — one memcpy per row plus
 *     zero tail-padding, no Python per-row overhead, GIL released. This is
 *     the kernel the production loader uses (data/cache.py::read_windows).
 *   - pcm16_to_f32, ulaw_encode / ulaw_decode (µ = 255): available for
 *     pipelines that bypass the cache; the in-repo audio_io path does these
 *     in vectorised numpy and only the tests exercise the C versions.
 *
 * Built as a plain CPython extension (no pybind11): see native/setup.py.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <math.h>
#include <stdint.h>
#include <string.h>

#define MU 255.0f

static PyObject *pcm16_to_f32(PyObject *self, PyObject *args) {
  Py_buffer in;
  if (!PyArg_ParseTuple(args, "y*", &in)) return NULL;
  Py_ssize_t n = in.len / 2;
  PyObject *out = PyBytes_FromStringAndSize(NULL, n * 4);
  if (!out) {
    PyBuffer_Release(&in);
    return NULL;
  }
  const int16_t *src = (const int16_t *)in.buf;
  float *dst = (float *)PyBytes_AS_STRING(out);
  const float scale = 1.0f / 32768.0f;
  for (Py_ssize_t i = 0; i < n; i++) dst[i] = src[i] * scale;
  PyBuffer_Release(&in);
  return out;
}

static PyObject *ulaw_encode(PyObject *self, PyObject *args) {
  Py_buffer in;
  if (!PyArg_ParseTuple(args, "y*", &in)) return NULL;
  Py_ssize_t n = in.len / 4;
  PyObject *out = PyBytes_FromStringAndSize(NULL, n * 4);
  if (!out) {
    PyBuffer_Release(&in);
    return NULL;
  }
  const float *src = (const float *)in.buf;
  float *dst = (float *)PyBytes_AS_STRING(out);
  const float denom = logf(1.0f + MU);
  for (Py_ssize_t i = 0; i < n; i++) {
    float x = src[i];
    float sign = x < 0.0f ? -1.0f : 1.0f;
    dst[i] = sign * logf(1.0f + MU * fabsf(x)) / denom;
  }
  PyBuffer_Release(&in);
  return out;
}

static PyObject *ulaw_decode(PyObject *self, PyObject *args) {
  Py_buffer in;
  if (!PyArg_ParseTuple(args, "y*", &in)) return NULL;
  Py_ssize_t n = in.len / 4;
  PyObject *out = PyBytes_FromStringAndSize(NULL, n * 4);
  if (!out) {
    PyBuffer_Release(&in);
    return NULL;
  }
  const float *src = (const float *)in.buf;
  float *dst = (float *)PyBytes_AS_STRING(out);
  for (Py_ssize_t i = 0; i < n; i++) {
    float x = src[i];
    float sign = x < 0.0f ? -1.0f : 1.0f;
    dst[i] = sign * (1.0f / MU) * (powf(1.0f + MU, fabsf(x)) - 1.0f);
  }
  PyBuffer_Release(&in);
  return out;
}

/* gather_windows(arena_buffer, starts_bytes, avail_bytes, window) -> bytes
 *
 * arena: float32 buffer (e.g. a numpy memmap); starts/avail are int64
 * arrays (as bytes) of per-row start offsets (in samples) and available
 * sample counts; window is the output row width. Rows shorter than the
 * window are zero-padded.
 */
static PyObject *gather_windows(PyObject *self, PyObject *args) {
  Py_buffer arena, starts, avail;
  Py_ssize_t window;
  if (!PyArg_ParseTuple(args, "y*y*y*n", &arena, &starts, &avail, &window))
    return NULL;
  Py_ssize_t rows = starts.len / 8;
  if (avail.len / 8 != rows) {
    PyBuffer_Release(&arena);
    PyBuffer_Release(&starts);
    PyBuffer_Release(&avail);
    PyErr_SetString(PyExc_ValueError, "starts/avail length mismatch");
    return NULL;
  }
  PyObject *out = PyBytes_FromStringAndSize(NULL, rows * window * 4);
  if (!out) {
    PyBuffer_Release(&arena);
    PyBuffer_Release(&starts);
    PyBuffer_Release(&avail);
    return NULL;
  }
  const float *src = (const float *)arena.buf;
  Py_ssize_t arena_len = arena.len / 4;
  const int64_t *start_v = (const int64_t *)starts.buf;
  const int64_t *avail_v = (const int64_t *)avail.buf;
  float *dst = (float *)PyBytes_AS_STRING(out);

  /* Validate every row first, so the copy loop below can run without the
   * GIL (no Python API calls inside). */
  for (Py_ssize_t r = 0; r < rows; r++) {
    int64_t s = start_v[r];
    int64_t n = avail_v[r];
    if (n > window) n = window;
    /* Overflow-safe: `s + n > arena_len` could wrap for huge (corrupt)
     * int64 inputs and pass the check. */
    if (s < 0 || n < 0 || s > arena_len || n > arena_len - s) {
      PyBuffer_Release(&arena);
      PyBuffer_Release(&starts);
      PyBuffer_Release(&avail);
      Py_DECREF(out);
      PyErr_SetString(PyExc_ValueError, "window out of arena bounds");
      return NULL;
    }
  }
  /* The arena is usually a disk-backed memmap: cold pages fault during the
   * memcpy. Holding the GIL here would serialize every loader worker (and
   * the consumer) behind that blocking I/O. */
  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t r = 0; r < rows; r++) {
    int64_t s = start_v[r];
    int64_t n = avail_v[r];
    if (n > window) n = window;
    memcpy(dst + r * window, src + s, n * 4);
    if (n < window) memset(dst + r * window + n, 0, (window - n) * 4);
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&arena);
  PyBuffer_Release(&starts);
  PyBuffer_Release(&avail);
  return out;
}

static PyMethodDef Methods[] = {
    {"pcm16_to_f32", pcm16_to_f32, METH_VARARGS,
     "s16le bytes -> f32le bytes in [-1, 1]"},
    {"ulaw_encode", ulaw_encode, METH_VARARGS,
     "f32le bytes -> µ-law companded f32le bytes"},
    {"ulaw_decode", ulaw_decode, METH_VARARGS,
     "µ-law f32le bytes -> linear f32le bytes"},
    {"gather_windows", gather_windows, METH_VARARGS,
     "batch window gather from a float32 arena"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_audio_native",
    "Native audio kernels for the vq_voice_swap_tpu data pipeline.", -1,
    Methods,
};

PyMODINIT_FUNC PyInit__audio_native(void) {
  return PyModule_Create(&moduledef);
}
