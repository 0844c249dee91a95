// Byte-level BPE encode hot loop (native text tier).
//
// The reference has no text pipeline; this is the C++ fast path behind
// neuronika_tpu/data/tokenizer.py's BpeTokenizer.encode. Same contract
// as the pure-Python encoder (its tests assert byte-for-byte parity):
//   * pretokenize " ?\S+|\s+" (spaces attach to the following word),
//   * per word, repeatedly merge the lowest-rank adjacent pair,
//   * merge i in the table produces id 256 + i.
//
// encode(data: bytes, merges: bytes) -> list[int]
//   `merges` is packed little-endian int32 (a, b) pairs in rank order
//   (BpeTokenizer._merge_blob()).
//
// Build: python setup.py build_ext --inplace (CPython C API, no
// pybind11 — see repo docs).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstddef>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

inline uint64_t pair_key(int32_t a, int32_t b) {
    return (static_cast<uint64_t>(static_cast<uint32_t>(a)) << 32) |
           static_cast<uint32_t>(b);
}

// Merge one pretoken in place. Words are short (tens of bytes), so the
// O(n^2) scan-for-best-pair loop beats heap bookkeeping in practice.
void encode_word(std::vector<int32_t>& ids,
                 const std::unordered_map<uint64_t, int32_t>& ranks,
                 std::vector<int32_t>& out) {
    while (ids.size() > 1) {
        int32_t best_rank = INT32_MAX;
        size_t best_i = 0;
        for (size_t i = 0; i + 1 < ids.size(); ++i) {
            auto it = ranks.find(pair_key(ids[i], ids[i + 1]));
            if (it != ranks.end() && it->second < best_rank) {
                best_rank = it->second;
                best_i = i;
            }
        }
        if (best_rank == INT32_MAX) break;
        ids[best_i] = 256 + best_rank;
        ids.erase(ids.begin() + static_cast<ptrdiff_t>(best_i) + 1);
    }
    out.insert(out.end(), ids.begin(), ids.end());
}

inline bool is_space(unsigned char c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
           c == '\v';
}

PyObject* encode(PyObject* /*self*/, PyObject* args) {
    const char* data;
    Py_ssize_t n;
    const char* mdata;
    Py_ssize_t mn;
    if (!PyArg_ParseTuple(args, "y#y#", &data, &n, &mdata, &mn)) {
        return nullptr;
    }
    if (mn % 8 != 0) {
        PyErr_SetString(PyExc_ValueError,
                        "merge blob must be packed int32 pairs");
        return nullptr;
    }

    std::unordered_map<uint64_t, int32_t> ranks;
    ranks.reserve(static_cast<size_t>(mn / 8) * 2);
    for (Py_ssize_t i = 0; i < mn / 8; ++i) {
        int32_t a, b;
        std::memcpy(&a, mdata + i * 8, 4);
        std::memcpy(&b, mdata + i * 8 + 4, 4);
        ranks.emplace(pair_key(a, b), static_cast<int32_t>(i));
    }

    std::vector<int32_t> out;
    out.reserve(static_cast<size_t>(n));
    std::vector<int32_t> word;
    Py_BEGIN_ALLOW_THREADS
    // Pretokenize " ?\S+|\s+(?!\S)" (GPT-2 semantics): a single space
    // attaches to the FOLLOWING word; a whitespace run leaves its last
    // space to that word when one follows.
    const unsigned char* p = reinterpret_cast<const unsigned char*>(data);
    Py_ssize_t i = 0;
    while (i < n) {
        Py_ssize_t j;
        if (!is_space(p[i])) {                       // \S+ (no space)
            j = i;
            while (j < n && !is_space(p[j])) ++j;
        } else if (p[i] == ' ' && i + 1 < n && !is_space(p[i + 1])) {
            j = i + 1;                               // " " + \S+
            while (j < n && !is_space(p[j])) ++j;
        } else {                                     // \s+(?!\S)
            j = i;
            while (j < n && is_space(p[j])) ++j;
            // a run followed by a word leaves its LAST whitespace char
            // to be reprocessed (regex backtracking): ' ' joins the word
            // via " ?\S+", any other is emitted alone next iteration. A
            // single-char run followed by a word is emitted as-is.
            if (j < n && j - i >= 2) --j;
        }
        word.assign(p + i, p + j);
        encode_word(word, ranks, out);
        i = j;
    }
    Py_END_ALLOW_THREADS

    PyObject* list = PyList_New(static_cast<Py_ssize_t>(out.size()));
    if (list == nullptr) return nullptr;
    for (size_t k = 0; k < out.size(); ++k) {
        PyObject* v = PyLong_FromLong(out[k]);
        if (v == nullptr) {
            Py_DECREF(list);
            return nullptr;
        }
        PyList_SET_ITEM(list, static_cast<Py_ssize_t>(k), v);
    }
    return list;
}

PyMethodDef methods[] = {
    {"encode", encode, METH_VARARGS,
     "encode(data: bytes, merges: bytes) -> list[int]"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_native_bpe",
    "Byte-level BPE encode fast path", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__native_bpe(void) {
    return PyModule_Create(&moduledef);
}
