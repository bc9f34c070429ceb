/* ClpTpu_C_Interface.h — C API for the clp_tpu solver.
 *
 * Mirrors the shape of the reference's C interface (Clp_C_Interface.h:
 * opaque model handle + "C++ analogue minus prefix" naming) so existing
 * language bindings can port with minimal changes. The implementation
 * (clp_c_api.cpp) embeds CPython and drives the clp_tpu package; call
 * ClpTpu_initialize() once per process before anything else.
 */
#ifndef CLPTPU_C_INTERFACE_H
#define CLPTPU_C_INTERFACE_H

#ifdef __cplusplus
extern "C" {
#endif

typedef void ClpTpuModel;

/* process-wide init/teardown of the embedded runtime (idempotent) */
int ClpTpu_initialize(void);
void ClpTpu_finalize(void);

ClpTpuModel *ClpTpu_newModel(void);
void ClpTpu_deleteModel(ClpTpuModel *model);

/* problem building: column-major sparse (CSC) like Clp_loadProblem */
int ClpTpu_loadProblem(ClpTpuModel *model, int numcols, int numrows,
                       const long long *start, const int *index,
                       const double *value, const double *collb,
                       const double *colub, const double *obj,
                       const double *rowlb, const double *rowub);
int ClpTpu_readMps(ClpTpuModel *model, const char *filename);
int ClpTpu_writeMps(ClpTpuModel *model, const char *filename);

void ClpTpu_setObjSense(ClpTpuModel *model, double sense); /* 1 min, -1 max */
void ClpTpu_setLogLevel(ClpTpuModel *model, int level);

/* solves */
int ClpTpu_initialSolve(ClpTpuModel *model);
int ClpTpu_dual(ClpTpuModel *model);
int ClpTpu_primal(ClpTpuModel *model);
int ClpTpu_barrier(ClpTpuModel *model);

/* status: 0 optimal, 1 primal infeasible, 2 dual infeasible, 3 stopped,
 * 4 errors, 5 user stopped (same codes as the reference) */
int ClpTpu_status(ClpTpuModel *model);
double ClpTpu_objectiveValue(ClpTpuModel *model);
int ClpTpu_numberRows(ClpTpuModel *model);
int ClpTpu_numberColumns(ClpTpuModel *model);
int ClpTpu_numberIterations(ClpTpuModel *model);

/* solution accessors copy into caller-provided buffers */
int ClpTpu_primalColumnSolution(ClpTpuModel *model, double *out, int len);
int ClpTpu_dualRowSolution(ClpTpuModel *model, double *out, int len);
int ClpTpu_reducedCosts(ClpTpuModel *model, double *out, int len);
int ClpTpu_rowActivity(ClpTpuModel *model, double *out, int len);

#ifdef __cplusplus
}
#endif
#endif /* CLPTPU_C_INTERFACE_H */
