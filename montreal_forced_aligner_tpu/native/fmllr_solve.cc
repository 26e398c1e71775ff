// Batched per-speaker fMLLR row-sweep solver (host-side hot loop).
//
// Port of ops/transforms.py:solve_fmllr_batched (Kaldi
// ComputeFmllrMatrixDiagGmmFull row optimization: per sweep, each row d of
// the (D, D+1) transform maximizes  beta*log|cof_d . w| - 1/2 w G_d w + w K_d
// via the quadratic in alpha along the cofactor direction, with
// Sherman-Morrison maintenance of A^-1 / det(A)).  numpy spends ~0.3 ms of
// dispatch overhead per row step (1600 steps per solve at D=40); this C++
// version runs the same double-precision math in microseconds per step and
// threads over speakers.  Python keeps the numpy implementation as the
// always-available fallback; a parity test pins the two together.

#include <cmath>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Invert n x n matrix M (row-major) into out, returning det(M).
// Gauss-Jordan with partial pivoting; returns 0.0 determinant on
// singularity (caller treats that row update as degenerate).
double invert(const double* M, int n, double* out, std::vector<double>& work) {
  work.resize(static_cast<size_t>(n) * 2 * n);
  double* a = work.data();
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < n; ++j) {
      a[i * 2 * n + j] = M[i * n + j];
      a[i * 2 * n + n + j] = (i == j) ? 1.0 : 0.0;
    }
  }
  double det = 1.0;
  for (int col = 0; col < n; ++col) {
    int piv = col;
    double best = std::fabs(a[col * 2 * n + col]);
    for (int r = col + 1; r < n; ++r) {
      double v = std::fabs(a[r * 2 * n + col]);
      if (v > best) { best = v; piv = r; }
    }
    if (best == 0.0) return 0.0;
    if (piv != col) {
      for (int j = 0; j < 2 * n; ++j)
        std::swap(a[piv * 2 * n + j], a[col * 2 * n + j]);
      det = -det;
    }
    double p = a[col * 2 * n + col];
    det *= p;
    double inv_p = 1.0 / p;
    for (int j = 0; j < 2 * n; ++j) a[col * 2 * n + j] *= inv_p;
    for (int r = 0; r < n; ++r) {
      if (r == col) continue;
      double f = a[r * 2 * n + col];
      if (f == 0.0) continue;
      for (int j = 0; j < 2 * n; ++j)
        a[r * 2 * n + j] -= f * a[col * 2 * n + j];
    }
  }
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) out[i * n + j] = a[i * 2 * n + n + j];
  return det;
}

void solve_one(const double* K,      // (D, E)
               const double* G,      // (D, E, E)
               double beta,
               double* W,            // (D, E) in/out (starts identity|0)
               int D, int num_iters) {
  const int E = D + 1;
  std::vector<double> work;
  // inv_G[d] = inv(G_d + 1e-6 I)
  std::vector<double> invG(static_cast<size_t>(D) * E * E);
  std::vector<double> Greg(static_cast<size_t>(E) * E);
  for (int d = 0; d < D; ++d) {
    std::memcpy(Greg.data(), G + static_cast<size_t>(d) * E * E,
                sizeof(double) * E * E);
    for (int i = 0; i < E; ++i) Greg[i * E + i] += 1e-6;
    invert(Greg.data(), E, invG.data() + static_cast<size_t>(d) * E * E,
           work);
  }
  std::vector<double> A(static_cast<size_t>(D) * D);
  std::vector<double> invA(static_cast<size_t>(D) * D);
  std::vector<double> c(E), cG(E), w1(E), w2(E), oldrow(E), delta(D),
      rowv(D), colv(D);
  for (int sweep = 0; sweep < num_iters; ++sweep) {
    // exact recompute at the top of each sweep caps SM drift
    for (int i = 0; i < D; ++i)
      for (int j = 0; j < D; ++j) A[i * D + j] = W[i * E + j];
    double detA = invert(A.data(), D, invA.data(), work);
    if (detA == 0.0) return;  // degenerate transform; keep current W
    double max_delta = 0.0, max_w = 0.0;
    for (int d = 0; d < D; ++d) {
      const double* Kd = K + static_cast<size_t>(d) * E;
      const double* iGd = invG.data() + static_cast<size_t>(d) * E * E;
      const double* Gd = G + static_cast<size_t>(d) * E * E;
      // cofactor row: c[j] = detA * invA[j][d] (column d of invA)
      for (int j = 0; j < D; ++j) c[j] = detA * invA[j * D + d];
      c[D] = 0.0;
      // cG = c . iGd ; a = cG . c ; b = cG . Kd
      double a = 0.0, b = 0.0;
      for (int f = 0; f < E; ++f) {
        double acc = 0.0;
        for (int e = 0; e < E; ++e) acc += c[e] * iGd[e * E + f];
        cG[f] = acc;
        a += acc * c[f];
        b += acc * Kd[f];
      }
      double disc = b * b + 4.0 * a * beta;
      bool ok = (a > 0.0) && (disc >= 0.0);
      if (ok) {
        double sq = std::sqrt(disc);
        double alpha1 = (-b + sq) / (2.0 * a);
        double alpha2 = (-b - sq) / (2.0 * a);
        auto make_row = [&](double alpha, double* w) {
          for (int f = 0; f < E; ++f) {
            double acc = 0.0;
            for (int e = 0; e < E; ++e)
              acc += (Kd[e] + alpha * c[e]) * iGd[e * E + f];
            w[f] = acc;
          }
        };
        auto objf = [&](const double* w) {
          double lin = 0.0, quad = 0.0, kk = 0.0;
          for (int e = 0; e < E; ++e) {
            lin += w[e] * c[e];
            kk += w[e] * Kd[e];
            double acc = 0.0;
            for (int f = 0; f < E; ++f) acc += Gd[e * E + f] * w[f];
            quad += w[e] * acc;
          }
          double al = std::fabs(lin);
          if (al < 1e-20) al = 1e-20;
          return beta * std::log(al) - 0.5 * quad + kk;
        };
        make_row(alpha1, w1.data());
        make_row(alpha2, w2.data());
        const double* wn = (objf(w1.data()) >= objf(w2.data()))
                               ? w1.data() : w2.data();
        double* Wd = W + static_cast<size_t>(d) * E;
        for (int e = 0; e < E; ++e) oldrow[e] = Wd[e];
        // Sherman-Morrison update of invA/detA for the changed row
        double factor = 1.0;
        for (int j = 0; j < D; ++j) {
          delta[j] = wn[j] - oldrow[j];
          factor += delta[j] * invA[j * D + d];
        }
        if (std::fabs(factor) < 1e-12) {
          // degenerate SM factor: apply the row and recompute A^-1/det
          // exactly (mirrors the numpy fallback)
          for (int e = 0; e < E; ++e) Wd[e] = wn[e];
          for (int i = 0; i < D; ++i)
            for (int j = 0; j < D; ++j) A[i * D + j] = W[i * E + j];
          detA = invert(A.data(), D, invA.data(), work);
          if (detA == 0.0) {
            for (int e = 0; e < E; ++e) Wd[e] = oldrow[e];
            for (int i = 0; i < D; ++i)
              for (int j = 0; j < D; ++j) A[i * D + j] = W[i * E + j];
            detA = invert(A.data(), D, invA.data(), work);
          }
          for (int e = 0; e < E; ++e) {
            double dv = std::fabs(Wd[e] - oldrow[e]);
            if (dv > max_delta) max_delta = dv;
            double av = std::fabs(Wd[e]);
            if (av > max_w) max_w = av;
          }
          continue;
        }
        for (int e = 0; e < E; ++e) Wd[e] = wn[e];
        for (int j = 0; j < D; ++j) colv[j] = invA[j * D + d];
        for (int e2 = 0; e2 < D; ++e2) {
          double acc = 0.0;
          for (int j = 0; j < D; ++j) acc += delta[j] * invA[j * D + e2];
          rowv[e2] = acc;
        }
        double inv_f = 1.0 / factor;
        for (int i = 0; i < D; ++i) {
          double ci = colv[i] * inv_f;
          if (ci == 0.0) continue;
          double* row = invA.data() + static_cast<size_t>(i) * D;
          for (int j = 0; j < D; ++j) row[j] -= ci * rowv[j];
        }
        detA *= factor;
        for (int e = 0; e < E; ++e) {
          double dv = std::fabs(Wd[e] - oldrow[e]);
          if (dv > max_delta) max_delta = dv;
          double av = std::fabs(Wd[e]);
          if (av > max_w) max_w = av;
        }
      }
    }
    if (max_delta < 1e-7 * (1.0 + max_w)) break;
  }
}

}  // namespace

extern "C" {

// K: (S, D, E)  G: (S, D, E, E)  beta: (S)  W: (S, D, E) in/out.
// W must arrive initialized to [I | 0] per speaker; rows of speakers with
// any failure are left as-is. Returns 0.
int fmllr_solve_batched(const double* K, const double* G, const double* beta,
                        double* W, long long S, long long D, int num_iters,
                        int num_threads) {
  const long long E = D + 1;
  if (num_threads < 1) num_threads = 1;
  auto run_range = [&](long long lo, long long hi) {
    for (long long s = lo; s < hi; ++s) {
      solve_one(K + s * D * E, G + s * D * E * E, beta[s], W + s * D * E,
                static_cast<int>(D), num_iters);
    }
  };
  if (num_threads == 1 || S <= 1) {
    run_range(0, S);
    return 0;
  }
  std::vector<std::thread> threads;
  long long per = (S + num_threads - 1) / num_threads;
  for (long long lo = 0; lo < S; lo += per) {
    long long hi = lo + per < S ? lo + per : S;
    threads.emplace_back(run_range, lo, hi);
  }
  for (auto& t : threads) t.join();
  return 0;
}

}  // extern "C"
