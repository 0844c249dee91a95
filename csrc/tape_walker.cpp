// Native tape walker: DFS + topological ordering + structural signature.
//
// The reference's graph runtime is native Rust (History BTreeMap walks,
// neuronika-variable/src/history.rs). Here the per-forward() Python cost is
// the ancestor walk and the structural-signature build in
// _engine/executor.py (_plan/_signature); this extension performs both in
// one C pass over the Node graph. The Python implementation remains the
// fallback and the behavioural oracle (tests assert identical output).
//
// Returns (tape: list[Node], leaves: list[Node], sig: tuple) — `sig` is
// hashable and equals the Python _signature() output.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Interned {
    PyObject* id;
    PyObject* op;
    PyObject* fn;
    PyObject* parents;
    PyObject* extra;
    PyObject* differentiable;
    PyObject* grad_alive;
    PyObject* rng;
    PyObject* status;
    PyObject* shape;
    PyObject* dtype;
    PyObject* value;
};

bool init_interned(Interned* s) {
    s->id = PyUnicode_InternFromString("id");
    s->op = PyUnicode_InternFromString("op");
    s->fn = PyUnicode_InternFromString("fn");
    s->parents = PyUnicode_InternFromString("parents");
    s->extra = PyUnicode_InternFromString("extra");
    s->differentiable = PyUnicode_InternFromString("differentiable");
    s->grad_alive = PyUnicode_InternFromString("grad_alive");
    s->rng = PyUnicode_InternFromString("rng");
    s->status = PyUnicode_InternFromString("status");
    s->shape = PyUnicode_InternFromString("shape");
    s->dtype = PyUnicode_InternFromString("dtype");
    s->value = PyUnicode_InternFromString("value");
    return s->id && s->op && s->fn && s->parents && s->extra &&
           s->differentiable && s->grad_alive && s->rng && s->status &&
           s->shape && s->dtype && s->value;
}

Interned S;

long node_id(PyObject* node) {
    PyObject* v = PyObject_GetAttr(node, S.id);
    if (v == nullptr) return -1;
    long out = PyLong_AsLong(v);
    Py_DECREF(v);
    return out;
}

// plan_and_sign(root) -> (tape, leaves, sig)
PyObject* plan_and_sign(PyObject*, PyObject* args) {
    PyObject* root;
    if (!PyArg_ParseTuple(args, "O", &root)) return nullptr;

    // ---- DFS over parents, collecting op nodes ------------------------
    std::vector<PyObject*> stack{root};
    Py_INCREF(root);
    std::unordered_set<long> seen{node_id(root)};
    std::vector<std::pair<long, PyObject*>> ops;  // owned refs

    while (!stack.empty()) {
        PyObject* n = stack.back();
        stack.pop_back();

        PyObject* fn = PyObject_GetAttr(n, S.fn);
        if (fn == nullptr) { Py_DECREF(n); goto fail; }
        bool is_leaf = (fn == Py_None);
        Py_DECREF(fn);
        if (!is_leaf) {
            ops.emplace_back(node_id(n), n);  // keep the ref
        }
        {
            PyObject* parents = PyObject_GetAttr(n, S.parents);
            if (parents == nullptr) { if (is_leaf) Py_DECREF(n); goto fail; }
            Py_ssize_t np = PyTuple_GET_SIZE(parents);
            for (Py_ssize_t i = 0; i < np; ++i) {
                PyObject* p = PyTuple_GET_ITEM(parents, i);
                long pid = node_id(p);
                if (seen.insert(pid).second) {
                    Py_INCREF(p);
                    stack.push_back(p);
                }
            }
            Py_DECREF(parents);
        }
        if (is_leaf) Py_DECREF(n);
    }

    {
        std::sort(ops.begin(), ops.end(),
                  [](auto& a, auto& b) { return a.first < b.first; });

        PyObject* tape = PyList_New(ops.size());
        if (!tape) goto fail;
        for (size_t i = 0; i < ops.size(); ++i) {
            Py_INCREF(ops[i].second);
            PyList_SET_ITEM(tape, i, ops[i].second);
        }

        // ---- leaves in first-use order + position map ------------------
        std::unordered_map<long, PyObject*> pos;  // id -> ("L"/"N", idx) tuple
        std::unordered_set<long> in_tape;
        for (auto& kv : ops) in_tape.insert(kv.first);

        PyObject* leaves = PyList_New(0);
        PyObject* entries = PyTuple_New(ops.size());
        PyObject* leaf_sigs = PyList_New(0);
        if (!leaves || !entries || !leaf_sigs) {
            Py_XDECREF(tape); Py_XDECREF(leaves); Py_XDECREF(entries);
            Py_XDECREF(leaf_sigs);
            goto fail;
        }

        bool ok = true;
        for (size_t i = 0; ok && i < ops.size(); ++i) {
            PyObject* n = ops[i].second;
            PyObject* parents = PyObject_GetAttr(n, S.parents);
            if (!parents) { ok = false; break; }
            Py_ssize_t np = PyTuple_GET_SIZE(parents);
            PyObject* pslots = PyTuple_New(np);
            for (Py_ssize_t j = 0; ok && j < np; ++j) {
                PyObject* p = PyTuple_GET_ITEM(parents, j);
                long pid = node_id(p);
                auto it = pos.find(pid);
                if (it == pos.end()) {
                    if (in_tape.count(pid)) {
                        // op parent appearing later is impossible (ids are
                        // monotone), but guard anyway
                        ok = false; break;
                    }
                    // new leaf
                    Py_ssize_t lidx = PyList_GET_SIZE(leaves);
                    PyList_Append(leaves, p);
                    PyObject* t = Py_BuildValue("(sn)", "L", lidx);
                    pos[pid] = t;
                    // leaf sig entry: (shape, str(dtype), differentiable)
                    PyObject* shape = PyObject_GetAttr(p, S.shape);
                    PyObject* dtype = PyObject_GetAttr(p, S.dtype);
                    PyObject* dstr = dtype ? PyObject_Str(dtype) : nullptr;
                    PyObject* diff = PyObject_GetAttr(p, S.differentiable);
                    if (shape && dstr && diff) {
                        PyObject* e = PyTuple_Pack(3, shape, dstr, diff);
                        PyList_Append(leaf_sigs, e);
                        Py_DECREF(e);
                    } else ok = false;
                    Py_XDECREF(shape); Py_XDECREF(dtype);
                    Py_XDECREF(dstr); Py_XDECREF(diff);
                }
                if (ok) {
                    PyObject* t = pos[pid];
                    Py_INCREF(t);
                    PyTuple_SET_ITEM(pslots, j, t);
                }
            }
            Py_DECREF(parents);
            if (!ok) { Py_DECREF(pslots); break; }

            PyObject* op = PyObject_GetAttr(n, S.op);
            PyObject* extra = PyObject_GetAttr(n, S.extra);
            PyObject* diff = PyObject_GetAttr(n, S.differentiable);
            PyObject* alive = PyObject_GetAttr(n, S.grad_alive);
            PyObject* rng = PyObject_GetAttr(n, S.rng);
            PyObject* status = PyObject_GetAttr(n, S.status);
            PyObject* status_val = nullptr;
            if (status == Py_None) {
                status_val = Py_None;
                Py_INCREF(Py_None);
            } else if (status) {
                PyObject* raw = PyObject_GetAttr(status, S.value);
                status_val = raw ? PyBool_FromLong(PyObject_IsTrue(raw)) : nullptr;
                Py_XDECREF(raw);
            }
            if (op && extra && diff && alive && rng && status_val) {
                PyObject* e = PyTuple_Pack(7, op, extra, pslots, diff,
                                           alive, rng, status_val);
                PyTuple_SET_ITEM(entries, i, e);  // steals e
            } else ok = false;
            Py_XDECREF(op); Py_XDECREF(extra); Py_XDECREF(diff);
            Py_XDECREF(alive); Py_XDECREF(rng); Py_XDECREF(status);
            Py_XDECREF(status_val);
            Py_DECREF(pslots);
            // record this op node's position for children
            PyObject* t = Py_BuildValue("(sn)", "N", (Py_ssize_t)i);
            pos[ops[i].first] = t;
        }

        for (auto& kv : pos) Py_DECREF(kv.second);
        for (auto& kv : ops) Py_DECREF(kv.second);
        ops.clear();

        if (!ok) {
            Py_DECREF(tape); Py_DECREF(leaves); Py_DECREF(entries);
            Py_DECREF(leaf_sigs);
            if (!PyErr_Occurred())
                PyErr_SetString(PyExc_RuntimeError, "tape walk failed");
            return nullptr;
        }

        PyObject* leaf_sig_t = PyList_AsTuple(leaf_sigs);
        Py_DECREF(leaf_sigs);
        PyObject* sig = PyTuple_Pack(2, entries, leaf_sig_t);
        Py_DECREF(entries);
        Py_DECREF(leaf_sig_t);
        PyObject* out = PyTuple_Pack(3, tape, leaves, sig);
        Py_DECREF(tape);
        Py_DECREF(leaves);
        Py_DECREF(sig);
        return out;
    }

fail:
    for (auto& kv : ops) Py_DECREF(kv.second);
    while (!stack.empty()) { Py_DECREF(stack.back()); stack.pop_back(); }
    if (!PyErr_Occurred())
        PyErr_SetString(PyExc_RuntimeError, "tape walk failed");
    return nullptr;
}

PyMethodDef methods[] = {
    {"plan_and_sign", plan_and_sign, METH_VARARGS,
     "DFS + topo sort + structural signature for a Node graph."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_native_tape",
    "Native tape walker for neuronika-tpu's executor.", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__native_tape(void) {
    if (!init_interned(&S)) return nullptr;
    return PyModule_Create(&module);
}
