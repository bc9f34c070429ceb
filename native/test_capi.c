/* End-to-end C API test: build a tiny LP in pure C, solve, check results.
 * Problem: max 2a+3b s.t. a+b<=4, a+3b<=6, a,b>=0 -> a=3, b=1, obj 9.
 * Compiled and run by tests/test_capi.py. */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

#include "ClpTpu_C_Interface.h"

int main(void) {
  if (ClpTpu_initialize() != 0) {
    fprintf(stderr, "init failed\n");
    return 2;
  }
  ClpTpuModel *m = ClpTpu_newModel();
  if (!m) {
    fprintf(stderr, "newModel failed\n");
    return 2;
  }
  /* CSC for [[1,1],[1,3]] */
  long long start[3] = {0, 2, 4};
  int index[4] = {0, 1, 0, 1};
  double value[4] = {1.0, 1.0, 1.0, 3.0};
  double collb[2] = {0.0, 0.0};
  double colub[2] = {1e30, 1e30};
  double obj[2] = {2.0, 3.0};
  double rowlb[2] = {-1e30, -1e30};
  double rowub[2] = {4.0, 6.0};
  if (ClpTpu_loadProblem(m, 2, 2, start, index, value, collb, colub, obj,
                         rowlb, rowub) != 0) {
    fprintf(stderr, "loadProblem failed\n");
    return 2;
  }
  ClpTpu_setObjSense(m, -1.0); /* maximize */
  int st = ClpTpu_dual(m);
  double ov = ClpTpu_objectiveValue(m);
  double x[2] = {0, 0}, y[2] = {0, 0};
  ClpTpu_primalColumnSolution(m, x, 2);
  ClpTpu_dualRowSolution(m, y, 2);
  printf("status=%d obj=%.9f x=[%.6f %.6f] rows=%d cols=%d iters=%d\n", st, ov,
         x[0], x[1], ClpTpu_numberRows(m), ClpTpu_numberColumns(m),
         ClpTpu_numberIterations(m));
  int ok = st == 0 && fabs(ov - 9.0) < 1e-7 && fabs(x[0] - 3.0) < 1e-7 &&
           fabs(x[1] - 1.0) < 1e-7;
  ClpTpu_deleteModel(m);
  if (!ok) {
    fprintf(stderr, "WRONG ANSWER\n");
    return 1;
  }

  /* NULL rim pointers must take Clp defaults (collb=0, colub=+inf, obj=0,
   * rowlb=-inf, rowub=+inf) instead of segfaulting. */
  ClpTpuModel *m2 = ClpTpu_newModel();
  if (!m2) return 2;
  if (ClpTpu_loadProblem(m2, 2, 2, start, index, value, NULL, NULL, NULL,
                         NULL, rowub) != 0) {
    fprintf(stderr, "NULL-rim loadProblem failed\n");
    return 2;
  }
  int st2 = ClpTpu_dual(m2); /* zero objective: any feasible point, obj 0 */
  double ov2 = ClpTpu_objectiveValue(m2);
  ClpTpu_deleteModel(m2);
  if (st2 != 0 || fabs(ov2) > 1e-9) {
    fprintf(stderr, "NULL-rim WRONG ANSWER status=%d obj=%g\n", st2, ov2);
    return 1;
  }

  printf("C API test OK\n");
  return 0;
}
