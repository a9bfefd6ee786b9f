// Embedding-API end-to-end check (thesis_example_cpp_interface.cpp analog):
// load a reference golden dataset, solve with TdunesSolver through the C++
// API, and verify the solution against the embedded optimum and the KKT
// bar the reference's own unit tests use (random_qp.c:249-254: 1e-12).
//
// Usage: treeqp_cpp_demo <dataset.json>   (exit 0 on pass)

#include <cstdio>
#include <cmath>

#include "treeqp_cpp.hpp"

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s dataset.json\n", argv[0]);
    return 2;
  }
  treeqp::TreeQp qp = treeqp::TreeQp::FromJsonFile(argv[1]);

  treeqp::TdunesSolver solver;
  solver.SetOption("maxit", 200);
  solver.SetOption("stationarityTolerance", 1e-12);

  treeqp::TreeQpOut out;
  int rc = solver.Solve(qp, &out);
  if (rc != 0) {
    std::fprintf(stderr, "solve failed rc=%d status=%d\n", rc, out.status);
    return 1;
  }

  double max_err = 0.0;
  for (int i = 0; i < qp.NumNodes(); ++i) {
    const auto& nd = qp.node(i);
    for (size_t k = 0; k < nd.xopt.size(); ++k)
      max_err = std::fmax(max_err, std::fabs(nd.xopt[k] - out.nodes[i].x[k]));
    for (size_t k = 0; k < nd.uopt.size(); ++k)
      max_err = std::fmax(max_err, std::fabs(nd.uopt[k] - out.nodes[i].u[k]));
  }
  std::printf("iter=%d status=%d kkt=%.3e max_err_vs_xopt=%.3e time=%.1fms\n",
              out.num_iter, out.status, out.kkt, max_err,
              1e3 * out.cpu_time);
  if (out.status != 0) return 1;
  if (out.kkt > 1e-10) return 1;
  if (max_err > 1e-8) return 1;
  return 0;
}
