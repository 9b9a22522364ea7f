// CPU baseline microbenchmark for the reference UCG-LD pair hot loop.
//
// Measures single-core atom-steps/s of the dominant compute of
// `pair_style table_ucgld` (scenario 4: UCG-UCG pairs), re-implemented
// fresh from the semantics at
// /root/reference/UCG/pair_table_ucgld.cpp:184-541 (half neighbor list,
// newton on, LINEAR r^2-binned tables, lambda-mixed 4-table energy/force,
// lambda-force tallies to both i and j, pseudolikelihood softmax-score
// tallies at the partner's discrete state).  This is the per-rank work a
// 64-core MPI LAMMPS run performs; the extrapolation to 64 cores is
// documented in BASELINE.md.
//
// System matches the repo's headline bench fluid (__graft_entry__._build_sim):
// rho = 0.6, cutoff = 2.5, skin = 0.4 (list cutoff 2.9), cosine-well
// tables, all atoms 2-state UCG.  N defaults to 16384 = the per-rank atom
// count of a 1M-bead run on 64 ranks (charitable: warm-cache regime).
//
// Build:  g++ -O3 -march=native -o cpu_baseline cpu_baseline.cpp
// Run:    ./cpu_baseline [N] [steps]
// Output: one JSON line with atom_steps_per_sec (single core).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <random>
#include <vector>

struct Table {            // LINEAR mode, binned in r^2 (compute_table analogue)
  std::vector<double> rsq, e, de, f, df;
  double innersq, invdelta;
  int n;
};

static Table make_table(double eps, double cut, int n) {
  // cosine well e(r) = eps*(1 + cos(pi r / rc)), f = -de/dr (matches the
  // repo bench tables); bin uniformly in r^2 like LAMMPS LINEAR mode
  Table t;
  t.n = n;
  double inner = 1e-1;            // table inner bound (r)
  t.innersq = inner * inner;
  double cutsq = cut * cut;
  double delta = (cutsq - t.innersq) / (n - 1);
  t.invdelta = 1.0 / delta;
  t.rsq.resize(n); t.e.resize(n); t.f.resize(n);
  for (int i = 0; i < n; i++) {
    double rsq = t.innersq + delta * i;
    double r = std::sqrt(rsq);
    t.rsq[i] = rsq;
    t.e[i] = eps * (1.0 + std::cos(M_PI * r / cut));
    // f array stores F/r (LAMMPS convention: fpair multiplies del)
    t.f[i] = eps * M_PI / cut * std::sin(M_PI * r / cut) / r;
  }
  t.de.resize(n); t.df.resize(n);
  for (int i = 0; i < n - 1; i++) {
    t.de[i] = t.e[i + 1] - t.e[i];
    t.df[i] = t.f[i + 1] - t.f[i];
  }
  t.de[n - 1] = t.df[n - 1] = 0.0;
  return t;
}

int main(int argc, char** argv) {
  const int N = argc > 1 ? std::atoi(argv[1]) : 16384;
  const int steps = argc > 2 ? std::atoi(argv[2]) : 200;
  const double rho = 0.6, cutoff = 2.5, skin = 0.4;
  const double rc = cutoff + skin, cutsq = cutoff * cutoff;
  const double kT = 1.0;
  const double L = std::cbrt(N / rho);
  const int tablength = 1200;

  // 4 state-combination tables (00, 01, 10, 11) like the bench deck
  Table tabs[4] = {make_table(1.0, cutoff, tablength),
                   make_table(0.6, cutoff, tablength),
                   make_table(0.6, cutoff, tablength),
                   make_table(0.25, cutoff, tablength)};

  // random fluid configuration + per-atom UCG state
  std::mt19937_64 rng(12345);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  std::vector<double> x(3 * N), ucgl(N);
  std::vector<int> state(N);
  for (int i = 0; i < N; i++) {
    for (int d = 0; d < 3; d++) x[3 * i + d] = uni(rng) * L;
    ucgl[i] = uni(rng);
    state[i] = uni(rng) < 0.5 ? 0 : 1;
  }

  // half neighbor list (i < j by cell ordering) via cell bins at rc
  int m = std::max(3, (int)(L / rc));
  double cellw = L / m;
  std::vector<std::vector<int>> cells(m * m * m);
  auto cidx = [&](double v) { int c = (int)(v / cellw); return c >= m ? m - 1 : c; };
  for (int i = 0; i < N; i++)
    cells[(cidx(x[3 * i]) * m + cidx(x[3 * i + 1])) * m + cidx(x[3 * i + 2])].push_back(i);
  std::vector<int> nstart(N + 1, 0), nbr;
  double rcsq = rc * rc;
  for (int i = 0; i < N; i++) {
    int ci = cidx(x[3 * i]), cj = cidx(x[3 * i + 1]), ck = cidx(x[3 * i + 2]);
    for (int di = -1; di <= 1; di++)
      for (int dj = -1; dj <= 1; dj++)
        for (int dk = -1; dk <= 1; dk++) {
          int c = (((ci + di + m) % m) * m + (cj + dj + m) % m) * m + (ck + dk + m) % m;
          for (int j : cells[c]) {
            if (j <= i) continue;          // half list
            double dx = x[3 * i] - x[3 * j], dy = x[3 * i + 1] - x[3 * j + 1],
                   dz = x[3 * i + 2] - x[3 * j + 2];
            dx -= L * std::round(dx / L); dy -= L * std::round(dy / L);
            dz -= L * std::round(dz / L);
            if (dx * dx + dy * dy + dz * dz < rcsq) nbr.push_back(j);
          }
        }
    nstart[i + 1] = (int)nbr.size();
  }
  double nbrs_per_atom = (double)nbr.size() / N;

  // minimum-image displacement vectors precomputed? No — LAMMPS stores ghost
  // coordinates, so the inner loop does plain subtractions.  Emulate with a
  // shifted-coordinate table per neighbor entry (the ghost-atom analogue).
  std::vector<double> jx(3 * nbr.size());
  for (int i = 0; i < N; i++)
    for (int k = nstart[i]; k < nstart[i + 1]; k++) {
      int j = nbr[k];
      for (int d = 0; d < 3; d++) {
        double del = x[3 * i + d] - x[3 * j + d];
        double shift = L * std::round(del / L);
        jx[3 * k + d] = x[3 * j + d] - shift;   // image of j nearest to i
      }
    }

  std::vector<double> f(3 * N), ucgf(N), sc0(N), sc1(N);

  auto t0 = std::chrono::steady_clock::now();
  double esum_keep = 0.0;
  for (int s = 0; s < steps; s++) {
    std::fill(f.begin(), f.end(), 0.0);
    std::fill(ucgf.begin(), ucgf.end(), 0.0);
    std::fill(sc0.begin(), sc0.end(), 0.0);
    std::fill(sc1.begin(), sc1.end(), 0.0);
    for (int i = 0; i < N; i++) {
      const double xi = x[3 * i], yi = x[3 * i + 1], zi = x[3 * i + 2];
      const double ldi = ucgl[i];
      const int istate = state[i];
      double fxi = 0, fyi = 0, fzi = 0, ufi = 0, s0i = 0, s1i = 0;
      for (int k = nstart[i]; k < nstart[i + 1]; k++) {
        const int j = nbr[k];
        const double dx = xi - jx[3 * k], dy = yi - jx[3 * k + 1],
                     dz = zi - jx[3 * k + 2];
        const double rsq = dx * dx + dy * dy + dz * dz;
        if (rsq >= cutsq) continue;
        const double ldj = ucgl[j];
        const int jstate = state[j];
        double u[4], fp[4];
        for (int c = 0; c < 4; c++) {          // 4 state combos, LINEAR eval
          const Table& tb = tabs[c];
          int it = (int)((rsq - tb.innersq) * tb.invdelta);
          if (it < 0) it = 0;
          if (it >= tb.n - 1) it = tb.n - 2;
          double fraction = (rsq - tb.rsq[it]) * tb.invdelta;
          fp[c] = tb.f[it] + fraction * tb.df[it];
          u[c] = tb.e[it] + fraction * tb.de[it];
        }
        const double mi = 1.0 - ldi, mj = 1.0 - ldj;
        const double fpair = mi * mj * fp[0] + mi * ldj * fp[1] +
                             ldi * mj * fp[2] + ldi * ldj * fp[3];
        // lambda-forces to both sides (half list, newton on)
        ufi -= ldj * (u[3] - u[1]) + mj * (u[2] - u[0]);
        ucgf[j] -= ldi * (u[3] - u[2]) + mi * (u[1] - u[0]);
        // pseudolikelihood scores at the partner's discrete state
        const double ui0 = jstate ? u[1] : u[0];   // si=0, sj=jstate
        const double ui1 = jstate ? u[3] : u[2];   // si=1
        s0i -= ui0 / kT;
        s1i -= ui1 / kT;
        const double uj0 = istate ? u[2] : u[0];   // sj=0, si=istate
        const double uj1 = istate ? u[3] : u[1];
        sc0[j] -= uj0 / kT;
        sc1[j] -= uj1 / kT;
        fxi += dx * fpair; fyi += dy * fpair; fzi += dz * fpair;
        f[3 * j] -= dx * fpair; f[3 * j + 1] -= dy * fpair; f[3 * j + 2] -= dz * fpair;
      }
      f[3 * i] += fxi; f[3 * i + 1] += fyi; f[3 * i + 2] += fzi;
      ucgf[i] += ufi; sc0[i] += s0i; sc1[i] += s1i;
    }
    esum_keep += f[0] + ucgf[0] + sc0[0];       // defeat dead-code elimination
  }
  auto t1 = std::chrono::steady_clock::now();
  double wall = std::chrono::duration<double>(t1 - t0).count();
  double asps = (double)N * steps / wall;
  std::printf("{\"n_atoms\": %d, \"steps\": %d, \"wall_s\": %.3f, "
              "\"half_nbrs_per_atom\": %.1f, \"atom_steps_per_sec_1core\": %.4g, "
              "\"checksum\": %.6g}\n",
              N, steps, wall, nbrs_per_atom, asps, esum_keep);
  return 0;
}
