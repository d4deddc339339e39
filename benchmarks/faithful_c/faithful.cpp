// Faithful compiled stand-in for the reference's serial C++ hot loops,
// used by configs 1/2 as the "vs_faithful_c" baseline (the real package is
// not installable here — no network). Semantics mirror:
//  - learning/parameters/mle_LinearGaussianCPD.hpp:12-69: closed-form
//    0/1/2-parent ladder (means/covariances -> beta, residual variance
//    with the n - k - 1 denominator), single-threaded double precision.
//  - mle_DiscreteFactor.cpp:5-42 + BIC: stride-indexed contingency counts,
//    log count ratios, BIC penalty.
// Build: g++ -O3 -march=native -shared -fPIC faithful.cpp -o libfaithful.so
// NOT a copy of the reference: written from the published formulas.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <ctime>

namespace {

double now_s() {
    timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

// xorshift64* + Box-Muller for the sampling stage
struct Rng {
    uint64_t s;
    explicit Rng(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ULL) {}
    uint64_t next() {
        s ^= s >> 12;
        s ^= s << 25;
        s ^= s >> 27;
        return s * 0x2545F4914F6CDD1DULL;
    }
    double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
    double normal() {
        double u1 = uniform(), u2 = uniform();
        if (u1 < 1e-300) u1 = 1e-300;
        return std::sqrt(-2.0 * std::log(u1)) *
               std::cos(2.0 * M_PI * u2);
    }
};

constexpr double LOG_2PI = 1.8378770664093454836;

struct LG {
    double beta0, beta1, beta2, var;
};

// 0-parent fit: mean + unbiased variance (n - 1 denominator)
LG fit0(const double* y, int n) {
    double s = 0.0;
    for (int i = 0; i < n; ++i) s += y[i];
    double mean = s / n;
    double sse = 0.0;
    for (int i = 0; i < n; ++i) {
        double r = y[i] - mean;
        sse += r * r;
    }
    return {mean, 0.0, 0.0, sse / (n - 1)};
}

// 1-parent closed form (mle_LinearGaussianCPD.hpp one-parent branch)
LG fit1(const double* y, const double* x, int n) {
    double sx = 0, sy = 0;
    for (int i = 0; i < n; ++i) { sx += x[i]; sy += y[i]; }
    double mx = sx / n, my = sy / n;
    double cxx = 0, cxy = 0;
    for (int i = 0; i < n; ++i) {
        cxx += (x[i] - mx) * (x[i] - mx);
        cxy += (x[i] - mx) * (y[i] - my);
    }
    double b1 = cxy / cxx;
    double b0 = my - b1 * mx;
    double sse = 0.0;
    for (int i = 0; i < n; ++i) {
        double r = y[i] - b0 - b1 * x[i];
        sse += r * r;
    }
    return {b0, b1, 0.0, sse / (n - 2)};
}

// 2-parent closed form: explicit 2x2 normal-equation inverse
LG fit2(const double* y, const double* x1, const double* x2, int n) {
    double sx1 = 0, sx2 = 0, sy = 0;
    for (int i = 0; i < n; ++i) { sx1 += x1[i]; sx2 += x2[i]; sy += y[i]; }
    double m1 = sx1 / n, m2 = sx2 / n, my = sy / n;
    double c11 = 0, c12 = 0, c22 = 0, c1y = 0, c2y = 0;
    for (int i = 0; i < n; ++i) {
        double d1 = x1[i] - m1, d2 = x2[i] - m2, dy = y[i] - my;
        c11 += d1 * d1;
        c12 += d1 * d2;
        c22 += d2 * d2;
        c1y += d1 * dy;
        c2y += d2 * dy;
    }
    double det = c11 * c22 - c12 * c12;
    double b1 = (c22 * c1y - c12 * c2y) / det;
    double b2 = (c11 * c2y - c12 * c1y) / det;
    double b0 = my - b1 * m1 - b2 * m2;
    double sse = 0.0;
    for (int i = 0; i < n; ++i) {
        double r = y[i] - b0 - b1 * x1[i] - b2 * x2[i];
        sse += r * r;
    }
    return {b0, b1, b2, sse / (n - 3)};
}

double slogl0(const double* y, int n, const LG& p) {
    double inv = 1.0 / p.var, total = 0.0;
    double c = -0.5 * (LOG_2PI + std::log(p.var));
    for (int i = 0; i < n; ++i) {
        double r = y[i] - p.beta0;
        total += c - 0.5 * r * r * inv;
    }
    return total;
}

double slogl1(const double* y, const double* x, int n, const LG& p) {
    double inv = 1.0 / p.var, total = 0.0;
    double c = -0.5 * (LOG_2PI + std::log(p.var));
    for (int i = 0; i < n; ++i) {
        double r = y[i] - p.beta0 - p.beta1 * x[i];
        total += c - 0.5 * r * r * inv;
    }
    return total;
}

double slogl2(const double* y, const double* x1, const double* x2, int n,
              const LG& p) {
    double inv = 1.0 / p.var, total = 0.0;
    double c = -0.5 * (LOG_2PI + std::log(p.var));
    for (int i = 0; i < n; ++i) {
        double r = y[i] - p.beta0 - p.beta1 * x1[i] - p.beta2 * x2[i];
        total += c - 0.5 * r * r * inv;
    }
    return total;
}

}  // namespace

extern "C" {

// config-1 pipeline: fit the README network a, b<-a, c<-a, d<-(b,c),
// slogl over the data, ancestral-sample 100 rows. Returns elapsed seconds
// for `reps` full pipelines; *out_slogl receives the last slogl (so the
// caller can validate against its own implementation).
double fb_lg_pipeline(const double* a, const double* b, const double* c,
                      const double* d, int n, int reps, double* out_slogl) {
    double t0 = now_s();
    volatile double sink = 0.0;
    double total = 0.0;
    for (int r = 0; r < reps; ++r) {
        LG pa = fit0(a, n);
        LG pb = fit1(b, a, n);
        LG pc = fit1(c, a, n);
        LG pd = fit2(d, b, c, n);
        total = slogl0(a, n, pa) + slogl1(b, a, n, pb) +
                slogl1(c, a, n, pc) + slogl2(d, b, c, n, pd);
        // ancestral sampling, 100 rows
        Rng rng(12345 + r);
        double sa[100], sb[100], sc[100], sd[100];
        double sda = std::sqrt(pa.var), sdb = std::sqrt(pb.var);
        double sdc = std::sqrt(pc.var), sdd = std::sqrt(pd.var);
        for (int i = 0; i < 100; ++i) {
            sa[i] = pa.beta0 + sda * rng.normal();
            sb[i] = pb.beta0 + pb.beta1 * sa[i] + sdb * rng.normal();
            sc[i] = pc.beta0 + pc.beta1 * sa[i] + sdc * rng.normal();
            sd[i] = pd.beta0 + pd.beta1 * sb[i] + pd.beta2 * sc[i] +
                    sdd * rng.normal();
        }
        sink += sd[0];
    }
    *out_slogl = total;
    (void)sink;
    return now_s() - t0;
}

// config-2 family scoring: BIC local scores of 1-parent discrete families
// over `card`-ary codes (stride counting exactly as mle_DiscreteFactor +
// the BIC log-ratio). Scores `n_fams` families cycling over (v, p) pairs.
// Returns elapsed seconds; *out_last receives the last score.
double fb_discrete_bic(const int32_t* codes, int n, int d, int card,
                       int n_fams, double* out_last) {
    double t0 = now_s();
    double last = 0.0;
    int done = 0;
    const int C = card * card;
    double* joint = new double[C];
    while (done < n_fams) {
        for (int v = 0; v < d && done < n_fams; ++v) {
            for (int p = 0; p < d && done < n_fams; ++p) {
                if (p == v) continue;
                const int32_t* cv = codes + (int64_t)v * n;
                const int32_t* cp = codes + (int64_t)p * n;
                std::memset(joint, 0, C * sizeof(double));
                for (int i = 0; i < n; ++i)
                    joint[cv[i] + card * cp[i]] += 1.0;
                double ll = 0.0;
                for (int pc = 0; pc < card; ++pc) {
                    double tot = 0.0;
                    for (int k = 0; k < card; ++k)
                        tot += joint[k + card * pc];
                    if (tot == 0.0) continue;
                    double lt = std::log(tot);
                    for (int k = 0; k < card; ++k) {
                        double cnt = joint[k + card * pc];
                        if (cnt > 0.0) ll += cnt * (std::log(cnt) - lt);
                    }
                }
                last = ll - 0.5 * std::log((double)n) *
                                (double)(card - 1) * card;
                ++done;
            }
        }
    }
    delete[] joint;
    *out_last = last;
    return now_s() - t0;
}

}  // extern "C"
