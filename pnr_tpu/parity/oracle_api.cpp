// Thin extern-"C" shim over the reference implementation, compiled AT TEST
// TIME against the read-only sources under /root/reference/pnr-vaa3d (the
// sources are never copied into this repo). Its sole purpose is to act as a
// numerical oracle: parity tests call the actual compiled reference C++ and
// compare pnr_tpu outputs against it, and the benchmark measures the real
// single-thread C++ wall-clock baseline (BASELINE.md).
//
// Wrapped surfaces (reference file:line):
//   Frangi::frangi3d        frangi.cpp:152   (multi-scale vesselness)
//   Frangi::imgaussian      frangi.cpp:647   (separable 3-D Gaussian)
//   Frangi::hessian3d       frangi.cpp:291
//   Frangi::imerode/imdilate frangi.cpp:879/971/1110
//   SeedExtractor::extractSeeds seed.cpp:556 (MaximumFinder per z-slice)
//   Tracker ctor tables     tracker.cpp:79-527 (priors, codebook, offsets)
//   Tracker::zncc2/znccBBB  tracker.cpp:1881-1964
//   Tracker::getdirection   tracker.cpp:751
//   maxentropy/otsu/intermodes_th toolbox.cpp:657/596/528

#include "frangi.h"
#include "node.h"
#include "seed.h"
#include "toolbox.h"
#include "tracker.h"

#include <algorithm>
#include <cstring>
#include <vector>

extern "C" {

void ref_frangi3d(const unsigned char* I, int w, int h, int l,
                  const float* sigs, int nsigs, float zdist, float alpha,
                  float beta, float C, float beta1, float beta2, float* J,
                  float* jminmax, unsigned char* Vx, unsigned char* Vy,
                  unsigned char* Vz) {
    std::vector<float> s(sigs, sigs + nsigs);
    Frangi f(s, zdist, alpha, beta, C, beta1, beta2);
    float jmin = 0.f, jmax = 0.f;
    f.frangi3d(const_cast<unsigned char*>(I), w, h, l, J, jmin, jmax, Vx, Vy,
               Vz);
    jminmax[0] = jmin;
    jminmax[1] = jmax;
}

void ref_frangi2d(const unsigned char* I, int w, int h, int l,
                  const float* sigs, int nsigs, float zdist, float alpha,
                  float beta, float C, float beta1, float beta2, float* J,
                  float* jminmax, unsigned char* Vx, unsigned char* Vy,
                  unsigned char* Vz) {
    std::vector<float> s(sigs, sigs + nsigs);
    Frangi f(s, zdist, alpha, beta, C, beta1, beta2);
    float jmin = 0.f, jmax = 0.f;
    f.frangi2d(const_cast<unsigned char*>(I), w, h, l, J, jmin, jmax, Vx, Vy,
               Vz);
    jminmax[0] = jmin;
    jminmax[1] = jmax;
}

void ref_imgaussian3d(const unsigned char* I, int w, int h, int l, float sig,
                      float zdist, float* F) {
    Frangi::imgaussian(const_cast<unsigned char*>(I), w, h, l, sig, zdist, F);
}

void ref_hessian3d(const unsigned char* I, int w, int h, int l, float sig,
                   float zdist, float* Dzz, float* Dyy, float* Dyz,
                   float* Dxx, float* Dxy, float* Dxz) {
    std::vector<float> s(1, sig);
    Frangi f(s, zdist, 0.5f, 0.5f, 500.f, 0.5f, 15.f);
    f.hessian3d(const_cast<unsigned char*>(I), w, h, l, sig, zdist, Dzz, Dyy,
                Dyz, Dxx, Dxy, Dxz);
}

void ref_imerode_xy(const unsigned char* I, int w, int h, int l, float rad,
                    unsigned char* E) {
    Frangi::imerode(const_cast<unsigned char*>(I), w, h, l, rad, E);
}

void ref_imerode_xyz(const unsigned char* I, int w, int h, int l, float rad,
                     float zdist, unsigned char* E) {
    Frangi::imerode(const_cast<unsigned char*>(I), w, h, l, rad, zdist, E);
}

void ref_imdilate_xy(unsigned char* I, int w, int h, int l, float rad) {
    Frangi::imdilate(I, w, h, l, rad);
}

long ref_extract_seeds(double tolerance, const unsigned char* J8, int w,
                       int h, int l, const unsigned char* Vx,
                       const unsigned char* Vy, const unsigned char* Vz,
                       float* out, long max_out) {
    std::vector<seed> seeds;
    SeedExtractor::extractSeeds(tolerance, const_cast<unsigned char*>(J8), w,
                                h, l, const_cast<unsigned char*>(Vx),
                                const_cast<unsigned char*>(Vy),
                                const_cast<unsigned char*>(Vz), seeds);
    long n = (long)seeds.size();
    long m = n < max_out ? n : max_out;
    for (long i = 0; i < m; ++i) {
        out[i * 8 + 0] = seeds[i].x;
        out[i * 8 + 1] = seeds[i].y;
        out[i * 8 + 2] = seeds[i].z;
        out[i * 8 + 3] = seeds[i].vx;
        out[i * 8 + 4] = seeds[i].vy;
        out[i * 8 + 5] = seeds[i].vz;
        out[i * 8 + 6] = seeds[i].score;
        out[i * 8 + 7] = seeds[i].corr;
    }
    return n;
}

unsigned char ref_maxentropy_th(const unsigned char* I, long n) {
    return maxentropy_th(const_cast<unsigned char*>(I), n);
}
unsigned char ref_otsu_th(const unsigned char* I, long n) {
    return otsu_th(const_cast<unsigned char*>(I), n);
}
unsigned char ref_intermodes_th(const unsigned char* I, long n) {
    return intermodes_th(const_cast<unsigned char*>(I), n);
}

void* ref_tracker_new(const float* sigs, int nsigs, int step, int npcles,
                      int niter, float kappa, int is2d, float znccth,
                      float Kc, float neff_ratio, float zdist,
                      int nodespervol) {
    std::vector<float> s(sigs, sigs + nsigs);
    return new Tracker(s, step, npcles, niter, kappa, is2d != 0, znccth, Kc,
                       neff_ratio, zdist, nodespervol);
}

void ref_tracker_free(void* t) { delete (Tracker*)t; }

int ref_tracker_sz(void* t) { return ((Tracker*)t)->sz; }
int ref_tracker_ndir(void* t) { return ((Tracker*)t)->ndir; }

// Flattened copies of every prior/codebook table the ctor precomputes
// (tracker.cpp:376-527): p (sz,3) offset cloud, u (sz,3) unit offsets,
// w0/w0_cws (sz,) isotropic prior + cumsum, w/w_cws (ndir,sz) directional
// priors + cumsums, v (ndir,3) direction codebook, d/d0 (sz,) distances.
void ref_tracker_tables(void* th, float* p, float* u, float* w0,
                        float* w0_cws, float* w, float* w_cws, float* v,
                        float* d, float* d0) {
    Tracker* t = (Tracker*)th;
    int sz = t->sz, nd = t->ndir;
    for (int i = 0; i < sz; ++i) {
        for (int k = 0; k < 3; ++k) {
            p[i * 3 + k] = t->p[i][k];
            u[i * 3 + k] = t->u[i][k];
        }
        w0[i] = t->w0[i];
        w0_cws[i] = t->w0_cws[i];
        d[i] = t->d[i];
        d0[i] = t->d0[i];
    }
    for (int vi = 0; vi < nd; ++vi) {
        for (int i = 0; i < sz; ++i) {
            w[vi * sz + i] = t->w[vi][i];
            w_cws[vi * sz + i] = t->w_cws[vi][i];
        }
        for (int k = 0; k < 3; ++k) v[vi * 3 + k] = t->v[vi][k];
    }
}

float ref_tracker_zncc(void* t, float x, float y, float z, float vx,
                       float vy, float vz, const unsigned char* img, int w,
                       int h, int l, float* sig_out) {
    X_est xe(x, y, z, vx, vy, vz, 0.f, 0.f);
    float sg = 0.f;
    float c = ((Tracker*)t)->zncc2(xe, const_cast<unsigned char*>(img), w, h,
                                   l, sg);
    *sig_out = sg;
    return c;
}

int ref_tracker_getdirection(void* t, float vx, float vy, float vz) {
    return ((Tracker*)t)->getdirection(vx, vy, vz);
}

float ref_tracker_interp(void* t, float x, float y, float z,
                         const unsigned char* img, int w, int h, int l) {
    return ((Tracker*)t)->interp(x, y, z, const_cast<unsigned char*>(img), w,
                                 h, l);
}

double ref_bessi0(double x) { return Tracker::bessi0(x); }

static int clampi_(int x, int lo, int hi) {
    return x < lo ? lo : (x > hi ? hi : x);
}

// End-to-end reference trace driver replicating the seed-selection and
// seed-loop logic of reconstruction_func (Advantra_plugin.cpp:2558-2710)
// over the compiled reference Tracker: znccBBB seed filter + corr-desc
// sort (:2558-2586), trace-density maps + the ioff neighbour table
// (:2602-2650, reproduced VERBATIM including the vol==19 block's y
// clamps against N — the width — which the pnr_tpu rebuild fixes and
// documents), then trackPos/trackNeg per surviving seed under the
// MAX_TRACE_COUNT cap (:2658-2710). Returns the traced node list and
// its adjacency so the rebuild's tracer can be scored against the real
// reference end to end (RNG differs by construction: the reference
// re-seeds srand(time(NULL)) per iteration, tracker.cpp:1003,1098).
//
// nodes_out rows: x, y, z, vx, vy, vz, corr, sig, type (incl. the
// dummy node 0). Returns the node count, or -1 on overflow.
long ref_trace_all(void* th, const unsigned char* img, int w, int h, int l,
                   const float* seeds_raw, long nseeds, float znccth,
                   int nodepervol, int nh_vol, int max_trace_count,
                   float* nodes_out, long max_nodes, int* edges_out,
                   long max_edges, long* edge_count) {
    Tracker* t = (Tracker*)th;
    t->verbose = false;
    long size = (long)w * h * l;

    // seed filter (soma-free path) + corr sort
    std::vector<seed> kept;
    float dummy_sig = 0.f;
    for (long i = 0; i < nseeds; ++i) {
        const float* s = seeds_raw + i * 8;
        seed sd(s[0], s[1], s[2], s[3], s[4], s[5], s[6], s[7]);
        sd.corr = t->znccBBB(sd.x, sd.y, sd.z, sd.vx, sd.vy, sd.vz,
                             const_cast<unsigned char*>(img), w, h, l,
                             dummy_sig);
        if (sd.corr >= znccth) kept.push_back(sd);
    }
    std::sort(kept.begin(), kept.end(),
              [](const seed& a, const seed& b) { return a.corr > b.corr; });

    // neighbourhood index table (Advantra_plugin.cpp:2602-2650 verbatim)
    int N = w, M = h, P = l;
    std::vector<long> ioff_flat((nh_vol > 1) ? size * (nh_vol - 1) : 0);
    std::vector<long*> ioff(size, (long*)0);
    for (long i = 0; i < size; ++i) {
        int x = i % N;
        int z = i / (N * M);
        int y = i / N - z * M;
        if (nh_vol == 1) continue;
        long* o = &ioff_flat[i * (nh_vol - 1)];
        ioff[i] = o;
        o[0] = (long)(z * N * M + y * N + clampi_(x - 1, 0, N - 1));
        o[1] = (long)(z * N * M + y * N + clampi_(x + 1, 0, N - 1));
        o[2] = (long)(z * N * M + clampi_(y - 1, 0, M - 1) * N + x);
        o[3] = (long)(z * N * M + clampi_(y + 1, 0, M - 1) * N + x);
        if (nh_vol >= 9) {
            o[4] = (long)(z * N * M + clampi_(y - 1, 0, M - 1) * N + clampi_(x - 1, 0, N - 1));
            o[5] = (long)(z * N * M + clampi_(y - 1, 0, M - 1) * N + clampi_(x + 1, 0, N - 1));
            o[6] = (long)(z * N * M + clampi_(y + 1, 0, M - 1) * N + clampi_(x - 1, 0, N - 1));
            o[7] = (long)(z * N * M + clampi_(y + 1, 0, M - 1) * N + clampi_(x + 1, 0, N - 1));
        }
        if (nh_vol >= 11) {
            o[8] = (long)(clampi_(z - 1, 0, P - 1) * N * M + y * N + x);
            o[9] = (long)(clampi_(z + 1, 0, P - 1) * N * M + y * N + x);
        }
        if (nh_vol >= 19) {  // y clamped by N-1 here in the reference
            o[10] = (long)(clampi_(z - 1, 0, P - 1) * N * M + y * N + clampi_(x - 1, 0, N - 1));
            o[11] = (long)(clampi_(z - 1, 0, P - 1) * N * M + y * N + clampi_(x + 1, 0, N - 1));
            o[12] = (long)(clampi_(z - 1, 0, P - 1) * N * M + clampi_(y - 1, 0, N - 1) * N + x);
            o[13] = (long)(clampi_(z - 1, 0, P - 1) * N * M + clampi_(y + 1, 0, N - 1) * N + x);
            o[14] = (long)(clampi_(z + 1, 0, P - 1) * N * M + y * N + clampi_(x - 1, 0, N - 1));
            o[15] = (long)(clampi_(z + 1, 0, P - 1) * N * M + y * N + clampi_(x + 1, 0, N - 1));
            o[16] = (long)(clampi_(z + 1, 0, P - 1) * N * M + clampi_(y - 1, 0, N - 1) * N + x);
            o[17] = (long)(clampi_(z + 1, 0, P - 1) * N * M + clampi_(y + 1, 0, N - 1) * N + x);
        }
        if (nh_vol == 27) {
            o[18] = (long)(clampi_(z - 1, 0, P - 1) * N * M + clampi_(y - 1, 0, M - 1) * N + clampi_(x - 1, 0, N - 1));
            o[19] = (long)(clampi_(z - 1, 0, P - 1) * N * M + clampi_(y - 1, 0, M - 1) * N + clampi_(x + 1, 0, N - 1));
            o[20] = (long)(clampi_(z - 1, 0, P - 1) * N * M + clampi_(y + 1, 0, M - 1) * N + clampi_(x - 1, 0, N - 1));
            o[21] = (long)(clampi_(z - 1, 0, P - 1) * N * M + clampi_(y + 1, 0, M - 1) * N + clampi_(x + 1, 0, N - 1));
            o[22] = (long)(clampi_(z + 1, 0, P - 1) * N * M + clampi_(y - 1, 0, M - 1) * N + clampi_(x - 1, 0, N - 1));
            o[23] = (long)(clampi_(z + 1, 0, P - 1) * N * M + clampi_(y - 1, 0, M - 1) * N + clampi_(x + 1, 0, N - 1));
            o[24] = (long)(clampi_(z + 1, 0, P - 1) * N * M + clampi_(y + 1, 0, M - 1) * N + clampi_(x - 1, 0, N - 1));
            o[25] = (long)(clampi_(z + 1, 0, P - 1) * N * M + clampi_(y + 1, 0, M - 1) * N + clampi_(x + 1, 0, N - 1));
        }
    }

    std::vector<int> smap(size, 0);
    std::vector<unsigned char> npervol(size, 0);
    std::vector<int> nidx(size, 0);
    std::vector<Node> n0;
    n0.push_back(Node());  // dummy node 0 (Advantra_plugin.cpp:2416-2419)

    int trace_count = 0;
    for (long i = 0; i < (long)kept.size(); ++i) {
        long si = (long)((int)round(kept[i].z)) * N * M +
                  (long)((int)round(kept[i].y)) * N + (int)round(kept[i].x);
        if ((int)npervol[si] < nodepervol) {
            trace_count++;
            t->trackPos(kept[i], const_cast<unsigned char*>(img), n0, w, h, l,
                        smap.data(), npervol.data(), nh_vol, ioff.data(),
                        nidx.data());
            t->trackNeg(kept[i], const_cast<unsigned char*>(img), n0, w, h, l,
                        smap.data(), npervol.data(), nh_vol, ioff.data(),
                        nidx.data());
            if (trace_count > max_trace_count) break;
        }
    }

    long nn = (long)n0.size();
    if (nn > max_nodes) return -1;
    long ne = 0;
    for (long i = 0; i < nn; ++i) {
        nodes_out[i * 9 + 0] = n0[i].x;
        nodes_out[i * 9 + 1] = n0[i].y;
        nodes_out[i * 9 + 2] = n0[i].z;
        nodes_out[i * 9 + 3] = n0[i].vx;
        nodes_out[i * 9 + 4] = n0[i].vy;
        nodes_out[i * 9 + 5] = n0[i].vz;
        nodes_out[i * 9 + 6] = n0[i].corr;
        nodes_out[i * 9 + 7] = n0[i].sig;
        nodes_out[i * 9 + 8] = (float)n0[i].type;
        for (size_t j = 0; j < n0[i].nbr.size(); ++j) {
            if (ne >= max_edges) return -1;
            edges_out[ne * 2 + 0] = (int)i;
            edges_out[ne * 2 + 1] = n0[i].nbr[j];
            ne++;
        }
    }
    *edge_count = ne;
    return nn;
}

}  // extern "C"
