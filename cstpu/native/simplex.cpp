// Dense two-phase revised simplex for standard-form LPs:
//     min c'x  s.t.  Ax = b, x >= 0
//
// Native-runtime component of the cstpu framework: the reference package
// reaches COIN-OR Clp (C++) through JuMP for equality-constrained basis
// pursuit (/root/reference/src/basispursuit.jl:7,13). cstpu's production
// path is the XLA-native ADMM solver (cstpu/models/basis_pursuit.py); this
// exact solver serves the same role Clp did — vertex-exact solutions with
// exact zeros — for host-side solves and as a conformance oracle for the
// first-order path. Zero dependencies; built with `make` or on first
// import via cstpu.native.
//
// Implementation notes:
//   * Phase 1 with artificial variables (rows sign-flipped so b >= 0),
//     Phase 2 with the original costs.
//   * Dantzig pricing with a Bland's-rule fallback after a stall budget,
//     guaranteeing termination without cycling.
//   * The basis system is re-solved each iteration by dense Gaussian
//     elimination with partial pivoting — O(n^3) per iteration is
//     negligible at the sizes this path serves (n = #measurements).

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// Solve M x = rhs (n x n, row-major), Gaussian elimination w/ partial pivot.
// Returns false if singular to working precision.
bool dense_solve(int n, const double* M, const double* rhs, double* x,
                 std::vector<double>& work) {
  work.resize(static_cast<size_t>(n) * (n + 1));
  double* a = work.data();
  for (int i = 0; i < n; ++i) {
    std::memcpy(a + static_cast<size_t>(i) * (n + 1), M + static_cast<size_t>(i) * n,
                sizeof(double) * n);
    a[static_cast<size_t>(i) * (n + 1) + n] = rhs[i];
  }
  const int stride = n + 1;
  for (int col = 0; col < n; ++col) {
    int piv = col;
    double best = std::fabs(a[static_cast<size_t>(col) * stride + col]);
    for (int r = col + 1; r < n; ++r) {
      double v = std::fabs(a[static_cast<size_t>(r) * stride + col]);
      if (v > best) { best = v; piv = r; }
    }
    if (best < 1e-13) return false;
    if (piv != col) {
      for (int j = col; j <= n; ++j)
        std::swap(a[static_cast<size_t>(col) * stride + j],
                  a[static_cast<size_t>(piv) * stride + j]);
    }
    const double d = a[static_cast<size_t>(col) * stride + col];
    for (int r = col + 1; r < n; ++r) {
      const double f = a[static_cast<size_t>(r) * stride + col] / d;
      if (f == 0.0) continue;
      for (int j = col; j <= n; ++j)
        a[static_cast<size_t>(r) * stride + j] -=
            f * a[static_cast<size_t>(col) * stride + j];
    }
  }
  for (int r = n - 1; r >= 0; --r) {
    double s = a[static_cast<size_t>(r) * stride + n];
    for (int j = r + 1; j < n; ++j)
      s -= a[static_cast<size_t>(r) * stride + j] * x[j];
    x[r] = s / a[static_cast<size_t>(r) * stride + r];
  }
  return true;
}

struct Tableau {
  int n;                       // rows (constraints)
  int N;                       // columns (variables incl. artificials)
  std::vector<double> A;       // n x N row-major
  std::vector<double> b;       // n
  std::vector<double> c;       // N
  std::vector<int> basis;      // n basic column indices
  std::vector<double> xB;      // basic values
  std::vector<double> Bmat, y, u, work;

  void column(int j, std::vector<double>& out) const {
    out.resize(n);
    for (int i = 0; i < n; ++i) out[i] = A[static_cast<size_t>(i) * N + j];
  }

  bool refresh() {  // recompute basic solution xB = B^-1 b
    Bmat.resize(static_cast<size_t>(n) * n);
    for (int i = 0; i < n; ++i)
      for (int r = 0; r < n; ++r)
        Bmat[static_cast<size_t>(r) * n + i] =
            A[static_cast<size_t>(r) * N + basis[i]];
    xB.resize(n);
    return dense_solve(n, Bmat.data(), b.data(), xB.data(), work);
  }

  // returns: 0 optimal, 2 unbounded, 3 iter limit, 4 singular
  int iterate(int max_iter, double tol) {
    std::vector<double> cB(n), aj(n), Bt(static_cast<size_t>(n) * n);
    int stall = 0;
    for (int it = 0; it < max_iter; ++it) {
      if (!refresh()) return 4;
      for (int i = 0; i < n; ++i) cB[i] = c[basis[i]];
      // y solves B' y = cB
      for (int r = 0; r < n; ++r)
        for (int s = 0; s < n; ++s)
          Bt[static_cast<size_t>(r) * n + s] = Bmat[static_cast<size_t>(s) * n + r];
      y.resize(n);
      if (!dense_solve(n, Bt.data(), cB.data(), y.data(), work)) return 4;

      // pricing: Dantzig normally; Bland after a stall budget
      const bool bland = stall > 2 * n + 20;
      int enter = -1;
      double best_red = -tol;
      std::vector<char> is_basic(static_cast<size_t>(N), 0);
      for (int i = 0; i < n; ++i) is_basic[basis[i]] = 1;
      for (int j = 0; j < N; ++j) {
        if (is_basic[j]) continue;
        double red = c[j];
        for (int i = 0; i < n; ++i) red -= y[i] * A[static_cast<size_t>(i) * N + j];
        if (red < best_red) {
          enter = j;
          if (bland) break;  // first improving index
          best_red = red;
        }
      }
      if (enter < 0) return 0;  // optimal

      column(enter, aj);
      u.resize(n);
      if (!dense_solve(n, Bmat.data(), aj.data(), u.data(), work)) return 4;

      // ratio test (Bland tie-break: smallest basis column index)
      int leave = -1;
      double best_ratio = 0.0;
      for (int i = 0; i < n; ++i) {
        if (u[i] > tol) {
          double ratio = xB[i] / u[i];
          if (leave < 0 || ratio < best_ratio - 1e-12 ||
              (std::fabs(ratio - best_ratio) <= 1e-12 &&
               basis[i] < basis[leave])) {
            leave = i;
            best_ratio = ratio;
          }
        }
      }
      if (leave < 0) return 2;  // unbounded
      if (best_ratio <= tol) ++stall; else stall = 0;
      basis[leave] = enter;
    }
    return 3;
  }
};

}  // namespace

extern "C" {

// min c'x s.t. Ax = b, x >= 0.  A row-major n x N.
// Returns 0 optimal, 1 infeasible, 2 unbounded, 3 iteration limit,
// 4 numerical failure.
int cstpu_simplex_solve(int n, int N, const double* A_in, const double* b_in,
                        const double* c_in, double* x_out, double* obj_out,
                        int max_iter, double tol) {
  if (n <= 0 || N <= 0) return 4;
  if (max_iter <= 0) max_iter = 50 * (n + N);
  if (tol <= 0) tol = 1e-9;

  Tableau T;
  T.n = n;
  T.N = N + n;  // + artificials
  T.A.assign(static_cast<size_t>(n) * T.N, 0.0);
  T.b.resize(n);
  for (int i = 0; i < n; ++i) {
    const double s = (b_in[i] < 0) ? -1.0 : 1.0;  // make b >= 0
    T.b[i] = s * b_in[i];
    for (int j = 0; j < N; ++j)
      T.A[static_cast<size_t>(i) * T.N + j] = s * A_in[static_cast<size_t>(i) * N + j];
    T.A[static_cast<size_t>(i) * T.N + N + i] = 1.0;  // artificial
  }

  // Phase 1: minimize sum of artificials
  T.c.assign(T.N, 0.0);
  for (int i = 0; i < n; ++i) T.c[N + i] = 1.0;
  T.basis.resize(n);
  for (int i = 0; i < n; ++i) T.basis[i] = N + i;
  int rc = T.iterate(max_iter, tol);
  if (rc != 0) return rc == 2 ? 4 : rc;  // phase-1 can't be unbounded
  if (!T.refresh()) return 4;
  double art = 0.0;
  for (int i = 0; i < n; ++i)
    if (T.basis[i] >= N) art += std::fabs(T.xB[i]);
  if (art > 1e-7) return 1;  // infeasible

  // Drive any zero-level artificials out of the basis when possible.
  for (int i = 0; i < n; ++i) {
    if (T.basis[i] < N) continue;
    std::vector<double> aj(n), u(n);
    int replacement = -1;
    for (int j = 0; j < N; ++j) {
      bool basic = false;
      for (int r = 0; r < n; ++r)
        if (T.basis[r] == j) { basic = true; break; }
      if (basic) continue;
      T.column(j, aj);
      if (!dense_solve(n, T.Bmat.data(), aj.data(), u.data(), T.work)) continue;
      if (std::fabs(u[i]) > 1e-7) { replacement = j; break; }
    }
    if (replacement >= 0) {
      T.basis[i] = replacement;
      if (!T.refresh()) return 4;
    }
  }

  // Phase 2: original costs (artificials pinned by +inf-ish cost)
  T.c.assign(T.N, 0.0);
  for (int j = 0; j < N; ++j) T.c[j] = c_in[j];
  for (int i = 0; i < n; ++i) T.c[N + i] = 1e30;
  rc = T.iterate(max_iter, tol);
  if (rc != 0 && rc != 3) return rc;
  if (!T.refresh()) return 4;

  std::fill(x_out, x_out + N, 0.0);
  double obj = 0.0;
  for (int i = 0; i < n; ++i) {
    if (T.basis[i] < N) {
      const double v = (std::fabs(T.xB[i]) < 1e-12) ? 0.0 : T.xB[i];
      x_out[T.basis[i]] = v;
      obj += c_in[T.basis[i]] * v;
    }
  }
  if (obj_out) *obj_out = obj;
  return rc;
}

}  // extern "C"
