// clp_c_api.cpp — C API implementation embedding CPython.
//
// The reference exposes its solver to C through Clp_C_Interface.cpp (an
// opaque handle + flat functions); here the same surface drives the
// clp_tpu Python package through the CPython embedding API. Build with
// native/Makefile (links libpython); exercised end-to-end by
// tests/test_capi.py which compiles and runs a C client.

#include "ClpTpu_C_Interface.h"

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <vector>

namespace {

std::once_flag g_init_once;
bool g_initialized = false;
bool g_we_own_interp = false;

struct Handle {
  PyObject *model;  // clp_tpu.Model instance
};

PyObject *import_attr(const char *mod, const char *attr) {
  PyObject *m = PyImport_ImportModule(mod);
  if (!m) return nullptr;
  PyObject *a = PyObject_GetAttrString(m, attr);
  Py_DECREF(m);
  return a;
}

bool report_if_error() {
  if (PyErr_Occurred()) {
    PyErr_Print();
    return true;
  }
  return false;
}

class Gil {
 public:
  Gil() : state_(PyGILState_Ensure()) {}
  ~Gil() { PyGILState_Release(state_); }

 private:
  PyGILState_STATE state_;
};

PyObject *np_array_1d(const double *data, long long n) {
  // Build a Python list (avoids a NumPy C-API dependency in this shim; the
  // copies happen once per model load, not per iteration).
  PyObject *lst = PyList_New(n);
  for (long long i = 0; i < n; ++i)
    PyList_SET_ITEM(lst, i, PyFloat_FromDouble(data[i]));
  return lst;
}

PyObject *np_array_1d_or(const double *data, long long n, double dflt) {
  // Like np_array_1d but accepts NULL rim pointers with a fill default
  // (reference: Clp_loadProblem accepts NULL collb/colub/obj/rowlb/rowub,
  // Clp_C_Interface.cpp loadProblem defaults).
  if (data) return np_array_1d(data, n);
  PyObject *lst = PyList_New(n);
  for (long long i = 0; i < n; ++i)
    PyList_SET_ITEM(lst, i, PyFloat_FromDouble(dflt));
  return lst;
}

int copy_out(PyObject *seq_obj, double *out, int len) {
  if (!seq_obj || seq_obj == Py_None) return -1;
  PyObject *fast = PySequence_Fast(seq_obj, "expected a sequence");
  if (!fast) return -1;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  int count = static_cast<int>(n < len ? n : len);
  for (int i = 0; i < count; ++i) {
    out[i] = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(fast, i));
  }
  Py_DECREF(fast);
  return count;
}

int solve_with(Handle *h, const char *method) {
  Gil gil;
  PyObject *r = PyObject_CallMethod(h->model, method, nullptr);
  if (!r) {
    report_if_error();
    return -1;
  }
  Py_DECREF(r);
  return ClpTpu_status(h);
}

}  // namespace

extern "C" {

int ClpTpu_initialize(void) {
  std::call_once(g_init_once, [] {
    if (!Py_IsInitialized()) {
      Py_InitializeEx(0);
      g_we_own_interp = true;
    }
    Gil gil;
    // make sure the repo root is importable when running from a build tree
    PyRun_SimpleString(
        "import sys, os\n"
        "root = os.environ.get('CLPTPU_ROOT')\n"
        "if root and root not in sys.path: sys.path.insert(0, root)\n");
    PyObject *mod = PyImport_ImportModule("clp_tpu");
    if (!mod) {
      PyErr_Print();
      return;
    }
    Py_DECREF(mod);
    g_initialized = true;
  });
  return g_initialized ? 0 : 1;
}

void ClpTpu_finalize(void) {
  // Embedded JAX runtimes do not tear down cleanly mid-process; keep the
  // interpreter alive for the process lifetime (matches common practice).
}

ClpTpuModel *ClpTpu_newModel(void) {
  if (ClpTpu_initialize() != 0) return nullptr;
  Gil gil;
  PyObject *cls = import_attr("clp_tpu", "Model");
  if (!cls) {
    report_if_error();
    return nullptr;
  }
  PyObject *obj = PyObject_CallObject(cls, nullptr);
  Py_DECREF(cls);
  if (!obj) {
    report_if_error();
    return nullptr;
  }
  Handle *h = new Handle{obj};
  return h;
}

void ClpTpu_deleteModel(ClpTpuModel *model) {
  if (!model) return;
  Handle *h = static_cast<Handle *>(model);
  Gil gil;
  Py_XDECREF(h->model);
  delete h;
}

int ClpTpu_loadProblem(ClpTpuModel *model, int numcols, int numrows,
                       const long long *start, const int *index,
                       const double *value, const double *collb,
                       const double *colub, const double *obj,
                       const double *rowlb, const double *rowub) {
  Handle *h = static_cast<Handle *>(model);
  Gil gil;
  long long nnz = start[numcols];
  PyObject *scipy = PyImport_ImportModule("scipy.sparse");
  if (!scipy) {
    report_if_error();
    return 1;
  }
  PyObject *csc = PyObject_GetAttrString(scipy, "csc_matrix");
  Py_DECREF(scipy);

  PyObject *data = np_array_1d(value, nnz);
  PyObject *indices = PyList_New(nnz);
  for (long long i = 0; i < nnz; ++i)
    PyList_SET_ITEM(indices, i, PyLong_FromLong(index[i]));
  PyObject *indptr = PyList_New(numcols + 1);
  for (int j = 0; j <= numcols; ++j)
    PyList_SET_ITEM(indptr, j, PyLong_FromLongLong(start[j]));
  PyObject *triple = PyTuple_Pack(3, data, indices, indptr);
  PyObject *shape = Py_BuildValue("(ii)", numrows, numcols);
  PyObject *args = PyTuple_Pack(1, triple);
  PyObject *kw = Py_BuildValue("{s:O}", "shape", shape);
  PyObject *A = PyObject_Call(csc, args, kw);
  Py_DECREF(csc);
  Py_DECREF(data);
  Py_DECREF(indices);
  Py_DECREF(indptr);
  Py_DECREF(triple);
  Py_DECREF(shape);
  Py_DECREF(args);
  Py_DECREF(kw);
  if (!A) {
    report_if_error();
    return 1;
  }
  // NULL rim pointers take the reference's defaults (Clp_loadProblem):
  // collb=0, colub=+inf, obj=0, rowlb=-inf, rowub=+inf
  PyObject *cl = np_array_1d_or(collb, numcols, 0.0);
  PyObject *cu = np_array_1d_or(colub, numcols, 1e30);
  PyObject *ob = np_array_1d_or(obj, numcols, 0.0);
  PyObject *rl = np_array_1d_or(rowlb, numrows, -1e30);
  PyObject *ru = np_array_1d_or(rowub, numrows, 1e30);
  PyObject *r = PyObject_CallMethod(h->model, "load_problem", "OOOOOO", A, cl,
                                    cu, ob, rl, ru);
  Py_DECREF(A);
  Py_DECREF(cl);
  Py_DECREF(cu);
  Py_DECREF(ob);
  Py_DECREF(rl);
  Py_DECREF(ru);
  if (!r) {
    report_if_error();
    return 1;
  }
  Py_DECREF(r);
  return 0;
}

int ClpTpu_readMps(ClpTpuModel *model, const char *filename) {
  Handle *h = static_cast<Handle *>(model);
  Gil gil;
  PyObject *r = PyObject_CallMethod(h->model, "read_mps", "s", filename);
  if (!r) {
    report_if_error();
    return -1;
  }
  long rc = PyLong_AsLong(r);
  Py_DECREF(r);
  return static_cast<int>(rc);
}

int ClpTpu_writeMps(ClpTpuModel *model, const char *filename) {
  Handle *h = static_cast<Handle *>(model);
  Gil gil;
  PyObject *r = PyObject_CallMethod(h->model, "write_mps", "s", filename);
  if (!r) {
    report_if_error();
    return -1;
  }
  long rc = PyLong_AsLong(r);
  Py_DECREF(r);
  return static_cast<int>(rc);
}

void ClpTpu_setObjSense(ClpTpuModel *model, double sense) {
  Handle *h = static_cast<Handle *>(model);
  Gil gil;
  PyObject *v = PyFloat_FromDouble(sense);
  PyObject_SetAttrString(h->model, "optimization_direction", v);
  Py_DECREF(v);
}

void ClpTpu_setLogLevel(ClpTpuModel *model, int level) {
  Handle *h = static_cast<Handle *>(model);
  Gil gil;
  PyObject *v = PyLong_FromLong(level);
  PyObject_SetAttrString(h->model, "log_level", v);
  Py_DECREF(v);
}

int ClpTpu_initialSolve(ClpTpuModel *model) {
  return solve_with(static_cast<Handle *>(model), "initial_solve");
}
int ClpTpu_dual(ClpTpuModel *model) {
  return solve_with(static_cast<Handle *>(model), "dual");
}
int ClpTpu_primal(ClpTpuModel *model) {
  return solve_with(static_cast<Handle *>(model), "primal");
}
int ClpTpu_barrier(ClpTpuModel *model) {
  return solve_with(static_cast<Handle *>(model), "barrier");
}

int ClpTpu_status(ClpTpuModel *model) {
  Handle *h = static_cast<Handle *>(model);
  Gil gil;
  PyObject *sol = PyObject_GetAttrString(h->model, "solution");
  if (!sol) return 4;
  PyObject *st = PyObject_GetAttrString(sol, "status");
  Py_DECREF(sol);
  if (!st) return 4;
  PyObject *v = PyObject_GetAttrString(st, "value");
  long rc = v ? PyLong_AsLong(v) : PyLong_AsLong(st);
  Py_XDECREF(v);
  Py_DECREF(st);
  PyErr_Clear();
  return static_cast<int>(rc);
}

double ClpTpu_objectiveValue(ClpTpuModel *model) {
  Handle *h = static_cast<Handle *>(model);
  Gil gil;
  PyObject *r = PyObject_CallMethod(h->model, "objective_value", nullptr);
  if (!r) {
    report_if_error();
    return 0.0;
  }
  double v = PyFloat_AsDouble(r);
  Py_DECREF(r);
  return v;
}

int ClpTpu_numberRows(ClpTpuModel *model) {
  Handle *h = static_cast<Handle *>(model);
  Gil gil;
  PyObject *r = PyObject_GetAttrString(h->model, "num_rows");
  long v = r ? PyLong_AsLong(r) : -1;
  Py_XDECREF(r);
  return static_cast<int>(v);
}

int ClpTpu_numberColumns(ClpTpuModel *model) {
  Handle *h = static_cast<Handle *>(model);
  Gil gil;
  PyObject *r = PyObject_GetAttrString(h->model, "num_cols");
  long v = r ? PyLong_AsLong(r) : -1;
  Py_XDECREF(r);
  return static_cast<int>(v);
}

int ClpTpu_numberIterations(ClpTpuModel *model) {
  Handle *h = static_cast<Handle *>(model);
  Gil gil;
  PyObject *sol = PyObject_GetAttrString(h->model, "solution");
  if (!sol) return -1;
  PyObject *it = PyObject_GetAttrString(sol, "iterations");
  Py_DECREF(sol);
  long v = it ? PyLong_AsLong(it) : -1;
  Py_XDECREF(it);
  return static_cast<int>(v);
}

static int copy_solution_field(ClpTpuModel *model, const char *method,
                               double *out, int len) {
  Handle *h = static_cast<Handle *>(model);
  Gil gil;
  PyObject *r = PyObject_CallMethod(h->model, method, nullptr);
  if (!r) {
    report_if_error();
    return -1;
  }
  PyObject *lst = PyObject_CallMethod(r, "tolist", nullptr);
  Py_DECREF(r);
  int rc = copy_out(lst ? lst : Py_None, out, len);
  Py_XDECREF(lst);
  PyErr_Clear();
  return rc;
}

int ClpTpu_primalColumnSolution(ClpTpuModel *model, double *out, int len) {
  return copy_solution_field(model, "primal_column_solution", out, len);
}
int ClpTpu_dualRowSolution(ClpTpuModel *model, double *out, int len) {
  return copy_solution_field(model, "dual_row_solution", out, len);
}
int ClpTpu_reducedCosts(ClpTpuModel *model, double *out, int len) {
  return copy_solution_field(model, "dual_column_solution", out, len);
}
int ClpTpu_rowActivity(ClpTpuModel *model, double *out, int len) {
  return copy_solution_field(model, "primal_row_solution", out, len);
}

}  // extern "C"
