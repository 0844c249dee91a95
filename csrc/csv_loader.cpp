// Fast CSV -> float32 loader (native data-path tier).
//
// The reference's data layer leans on Rust's csv crate + serde
// (neuronika-data/src/lib.rs:197-300). This is the C++ equivalent for the
// hot path: a single pass over a memory buffer with branch-light float
// parsing, multi-threaded over row chunks, emitting one contiguous f32
// matrix. The Python wrapper (neuronika_tpu/data/_native.py) exposes it as
// `load_csv(path, delimiter, has_headers) -> np.ndarray[rows, cols]` and
// the DataLoader uses it transparently when built, falling back to the
// pure-Python parser otherwise.
//
// Build: python setup.py build_ext --inplace   (CPython C API only; no
// pybind11 — see repo docs.)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct ParseResult {
    std::vector<float> values;
    Py_ssize_t rows = 0;
    Py_ssize_t cols = 0;
    std::string error;
};

// Split the buffer into per-thread chunks on row boundaries and parse.
void parse_rows(const char* begin, const char* end, char delim,
                std::vector<float>* out, Py_ssize_t cols,
                std::string* error) {
    const char* p = begin;
    while (p < end) {
        const char* line_end = static_cast<const char*>(
            memchr(p, '\n', static_cast<size_t>(end - p)));
        if (line_end == nullptr) line_end = end;
        if (line_end > p) {  // skip empty lines
            Py_ssize_t field = 0;
            const char* f = p;
            while (f <= line_end && field < cols) {
                char* next = nullptr;
                float v = strtof(f, &next);
                if (next == f) {
                    *error = "non-numeric field in CSV";
                    return;
                }
                out->push_back(v);
                ++field;
                f = next;
                while (f < line_end && (*f == delim || *f == ' ' || *f == '\r'))
                    ++f;
            }
            if (field != cols) {
                *error = "ragged CSV row";
                return;
            }
        }
        p = line_end + 1;
    }
}

Py_ssize_t count_cols(const char* p, const char* end, char delim) {
    Py_ssize_t cols = 1;
    while (p < end && *p != '\n') {
        if (*p == delim) ++cols;
        ++p;
    }
    return cols;
}

ParseResult parse_buffer(const char* data, size_t size, char delim,
                         bool has_headers) {
    ParseResult res;
    const char* p = data;
    const char* end = data + size;
    if (has_headers) {
        const char* nl = static_cast<const char*>(memchr(p, '\n', size));
        p = (nl == nullptr) ? end : nl + 1;
    }
    if (p >= end) return res;
    res.cols = count_cols(p, end, delim);

    // chunk on row boundaries
    unsigned n_threads = std::thread::hardware_concurrency();
    if (n_threads == 0) n_threads = 1;
    size_t remaining = static_cast<size_t>(end - p);
    if (remaining < (1u << 16)) n_threads = 1;

    std::vector<const char*> starts{p};
    for (unsigned t = 1; t < n_threads; ++t) {
        const char* guess = p + remaining * t / n_threads;
        const char* nl = static_cast<const char*>(
            memchr(guess, '\n', static_cast<size_t>(end - guess)));
        starts.push_back(nl == nullptr ? end : nl + 1);
    }
    starts.push_back(end);

    std::vector<std::vector<float>> chunks(n_threads);
    std::vector<std::string> errors(n_threads);
    std::vector<std::thread> workers;
    for (unsigned t = 0; t < n_threads; ++t) {
        workers.emplace_back(parse_rows, starts[t], starts[t + 1], delim,
                             &chunks[t], res.cols, &errors[t]);
    }
    for (auto& w : workers) w.join();
    for (auto& e : errors) {
        if (!e.empty()) {
            res.error = e;
            return res;
        }
    }
    size_t total = 0;
    for (auto& c : chunks) total += c.size();
    res.values.reserve(total);
    for (auto& c : chunks)
        res.values.insert(res.values.end(), c.begin(), c.end());
    res.rows = static_cast<Py_ssize_t>(res.values.size()) / res.cols;
    return res;
}

PyObject* load_csv_bytes(PyObject*, PyObject* args) {
    const char* path;
    const char* delim_s;
    int has_headers;
    if (!PyArg_ParseTuple(args, "ssp", &path, &delim_s, &has_headers))
        return nullptr;
    char delim = delim_s[0] ? delim_s[0] : ',';

    FILE* f = fopen(path, "rb");
    if (f == nullptr) {
        PyErr_SetString(PyExc_FileNotFoundError, path);
        return nullptr;
    }
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::string buf(static_cast<size_t>(size), '\0');
    size_t got = fread(buf.data(), 1, static_cast<size_t>(size), f);
    fclose(f);
    buf.resize(got);

    ParseResult res;
    Py_BEGIN_ALLOW_THREADS
    res = parse_buffer(buf.data(), buf.size(), delim, has_headers != 0);
    Py_END_ALLOW_THREADS

    if (!res.error.empty()) {
        PyErr_SetString(PyExc_ValueError, res.error.c_str());
        return nullptr;
    }
    PyObject* bytes = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(res.values.data()),
        static_cast<Py_ssize_t>(res.values.size() * sizeof(float)));
    if (bytes == nullptr) return nullptr;
    return Py_BuildValue("(Nnn)", bytes, res.rows, res.cols);
}

PyMethodDef methods[] = {
    {"load_csv_bytes", load_csv_bytes, METH_VARARGS,
     "Parse a CSV file into raw float32 bytes: (bytes, rows, cols)."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_native_ext",
    "Native CSV fast path for neuronika-tpu's data loader.", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__native_ext(void) { return PyModule_Create(&module); }
