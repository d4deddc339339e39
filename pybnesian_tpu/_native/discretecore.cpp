// Native discrete-family scoring core.
//
// The reference counts contingency tables in C++ (discrete_indices.cpp
// joint_counts, mle_DiscreteFactor.cpp:5-42) and scores BIC/BDe from them
// (scores/bic.cpp:66-97). This is the TPU-native build's equivalent native
// tier: hill-climbing batches of small discrete families finish faster in
// one compiled pass over the cached codes than either a per-family numpy
// pipeline (allocation-bound) or a remote device dispatch (~25 ms round
// trip). Large batches still go to the device scatter-count kernel
// (ops/discrete.py) — this kernel is the small/medium tier of the same
// adaptive dispatch.
//
// Families are independent, so batches ≥ 8 families split across two
// hardware threads (the counting pass is memory-stream-bound; the host
// gives near-linear scaling to its core count).
//
// Codes layout: one int32 array per column, -1 marks null; rows with a
// null in any family column are dropped (pairwise deletion, matching
// data/dataframe.py semantics).
//
// Build: g++ -O3 -march=native -pthread -shared -fPIC discretecore.cpp -o
//        libdiscretecore.so   (auto-built on first use, like graphcore)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

void bic_range(const int32_t* codes, int64_t n, const int64_t* cards,
               const int32_t* fam_var, const int32_t* fam_parents,
               int32_t f_begin, int32_t f_end, int32_t maxp,
               int64_t max_configs, double* out) {
    std::vector<int64_t> counts;
    std::vector<const int32_t*> col(1 + maxp);
    std::vector<int64_t> stride(1 + maxp);
    for (int f = f_begin; f < f_end; ++f) {
        const int32_t v = fam_var[f];
        int nv = 1;
        col[0] = codes + (int64_t)v * n;
        stride[0] = 1;
        int64_t config_space = cards[v];
        const int64_t k = cards[v];
        for (int j = 0; j < maxp; ++j) {
            const int32_t p = fam_parents[(int64_t)f * maxp + j];
            if (p < 0) break;
            col[nv] = codes + (int64_t)p * n;
            stride[nv] = config_space;
            config_space *= cards[p];
            ++nv;
        }
        if (config_space > max_configs) {
            out[f] = NAN;
            continue;
        }
        counts.assign(config_space, 0);
        int64_t total = 0;
        if (nv == 1) {
            const int32_t* c0 = col[0];
            for (int64_t i = 0; i < n; ++i) {
                const int32_t a = c0[i];
                if (a >= 0) { ++counts[a]; ++total; }
            }
        } else if (nv == 2) {
            const int32_t* c0 = col[0];
            const int32_t* c1 = col[1];
            const int64_t s1 = stride[1];
            for (int64_t i = 0; i < n; ++i) {
                const int32_t a = c0[i], b = c1[i];
                if ((a | b) >= 0) { ++counts[a + s1 * b]; ++total; }
            }
        } else if (nv == 3) {
            const int32_t* c0 = col[0];
            const int32_t* c1 = col[1];
            const int32_t* c2 = col[2];
            const int64_t s1 = stride[1], s2 = stride[2];
            for (int64_t i = 0; i < n; ++i) {
                const int32_t a = c0[i], b = c1[i], c = c2[i];
                if ((a | b | c) >= 0) {
                    ++counts[a + s1 * b + s2 * c];
                    ++total;
                }
            }
        } else {
            for (int64_t i = 0; i < n; ++i) {
                int64_t idx = 0;
                bool ok = true;
                for (int j = 0; j < nv; ++j) {
                    const int32_t cij = col[j][i];
                    if (cij < 0) { ok = false; break; }
                    idx += stride[j] * cij;
                }
                if (ok) { ++counts[idx]; ++total; }
            }
        }
        if (total == 0) {
            // every row null in some family column: route to the caller's
            // fallback tier (which raises, like the host path's log(0))
            out[f] = NAN;
            continue;
        }
        // ll = sum n_ijk * (log n_ijk - log n_ij); penalty over the FULL
        // parent-config space (scores/bic.cpp:66-97)
        const int64_t npc = config_space / k;
        double ll = 0.0;
        for (int64_t pc = 0; pc < npc; ++pc) {
            int64_t tot = 0;
            const int64_t* row = counts.data() + pc * k;
            for (int64_t j = 0; j < k; ++j) tot += row[j];
            if (tot == 0) continue;
            const double lt = std::log((double)tot);
            for (int64_t j = 0; j < k; ++j) {
                if (row[j] > 0)
                    ll += (double)row[j] * (std::log((double)row[j]) - lt);
            }
        }
        out[f] = ll - std::log((double)total) * 0.5 * (double)(k - 1)
                          * (double)npc;
    }
}

}  // namespace

extern "C" {

// BIC local scores for F discrete families.
//  codes:       (ncols, n) row-major int32 block (column i at codes+i*n)
//  cards:       (ncols,) int64 cardinalities
//  fam_var:     (F,) column index of the child
//  fam_parents: (F, maxp) column indices, -1 padding
//  out:         (F,) scores; NaN when the config space exceeds max_configs
//               (caller falls back to another tier)
void dc_bic_batch(const int32_t* codes, int64_t n, int32_t ncols,
                  const int64_t* cards, const int32_t* fam_var,
                  const int32_t* fam_parents, int32_t F, int32_t maxp,
                  int64_t max_configs, double* out) {
    (void)ncols;
    unsigned hw = std::thread::hardware_concurrency();
    if (hw >= 2 && F >= 8 && (int64_t)F * n >= 200000) {
        const int32_t mid = F / 2;
        std::thread t1(bic_range, codes, n, cards, fam_var, fam_parents,
                       0, mid, maxp, max_configs, out);
        bic_range(codes, n, cards, fam_var, fam_parents, mid, F, maxp,
                  max_configs, out);
        t1.join();
    } else {
        bic_range(codes, n, cards, fam_var, fam_parents, 0, F, maxp,
                  max_configs, out);
    }
}

}  // extern "C"
