// Native scene-generation kernels for comd-tpu.
//
// The deterministic per-atom RNG streams (lcg61 / gasdev / mkSeed semantics,
// reference: src-mpi/random.c:22-75) must be evaluated for every atom at
// init.  The vectorized-numpy fallback (comd_tpu/rng.py) is exact but slow
// past ~10M atoms because of the rejection-loop bookkeeping; this C++
// implementation generates Boltzmann momenta and uniform displacements at
// memory speed, bit-identical to the Python path (same operations in the
// same order, all in IEEE double).
//
// Exposed via a plain C ABI and loaded with ctypes (no pybind11 dependency).

#include <cmath>
#include <cstdint>

namespace {

constexpr uint64_t kMod = 2305843009213693951ULL;  // 2^61 - 1
constexpr uint64_t kMult = 437799614237992725ULL;
constexpr double kConvert = 1.0 / 2305843009213693951.0;

inline double lcg61(uint64_t& seed) {
  seed *= kMult;     // wraps mod 2^64, as in the reference C
  seed %= kMod;
  return static_cast<double>(seed) * kConvert;
}

inline uint64_t mk_seed(uint32_t id, uint32_t call_site) {
  uint32_t s1 = id * 2654435761u;
  uint32_t s2 = (id + call_site) * 2654435761u;
  uint64_t seed = 0x100000000ULL * s1 + s2;
  for (int i = 0; i < 10; ++i) lcg61(seed);
  return seed;
}

inline double gasdev(uint64_t& seed) {
  double v1, v2, rsq;
  do {
    v1 = 2.0 * lcg61(seed) - 1.0;
    v2 = 2.0 * lcg61(seed) - 1.0;
    rsq = v1 * v1 + v2 * v2;
  } while (rsq >= 1.0 || rsq == 0.0);
  return v2 * std::sqrt(-2.0 * std::log(rsq) / rsq);
}

}  // namespace

extern "C" {

// out[n*3]: three sequential gasdev draws per gid (px, py, pz order,
// reference setTemperature initAtoms.c:172-175).
void comd_gasdev3(const int64_t* gid, int64_t n, uint32_t call_site,
                  double* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    uint64_t seed = mk_seed(static_cast<uint32_t>(gid[i]), call_site);
    out[i * 3 + 0] = gasdev(seed);
    out[i * 3 + 1] = gasdev(seed);
    out[i * 3 + 2] = gasdev(seed);
  }
}

// out[n*3]: three sequential uniforms per gid (randomDisplacements,
// initAtoms.c:210-213).
void comd_uniform3(const int64_t* gid, int64_t n, uint32_t call_site,
                   double* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    uint64_t seed = mk_seed(static_cast<uint32_t>(gid[i]), call_site);
    out[i * 3 + 0] = lcg61(seed);
    out[i * 3 + 1] = lcg61(seed);
    out[i * 3 + 2] = lcg61(seed);
  }
}

// FCC lattice generation (createFccLattice, initAtoms.c:81-124): fills
// positions r[n*3] and gids for atoms inside [local_min, local_max).
// Returns the number of atoms written (call with r=nullptr to count).
int64_t comd_fcc_lattice(int64_t nx, int64_t ny, int64_t nz, double lat,
                         const double* local_min, const double* local_max,
                         double* r, int64_t* gid) {
  static const double basis[4][3] = {{0.25, 0.25, 0.25},
                                     {0.25, 0.75, 0.75},
                                     {0.75, 0.25, 0.75},
                                     {0.75, 0.75, 0.25}};
  int64_t begin[3], end[3];
  for (int a = 0; a < 3; ++a) {
    begin[a] = static_cast<int64_t>(std::floor(local_min[a] / lat));
    end[a] = static_cast<int64_t>(std::ceil(local_max[a] / lat));
  }
  int64_t count = 0;
  for (int64_t ix = begin[0]; ix < end[0]; ++ix)
    for (int64_t iy = begin[1]; iy < end[1]; ++iy)
      for (int64_t iz = begin[2]; iz < end[2]; ++iz)
        for (int ib = 0; ib < 4; ++ib) {
          double rx = (ix + basis[ib][0]) * lat;
          double ry = (iy + basis[ib][1]) * lat;
          double rz = (iz + basis[ib][2]) * lat;
          if (rx < local_min[0] || rx >= local_max[0]) continue;
          if (ry < local_min[1] || ry >= local_max[1]) continue;
          if (rz < local_min[2] || rz >= local_max[2]) continue;
          if (r != nullptr) {
            r[count * 3 + 0] = rx;
            r[count * 3 + 1] = ry;
            r[count * 3 + 2] = rz;
            gid[count] = ib + 4 * (iz + nz * (iy + ny * ix));
          }
          ++count;
        }
  return count;
}

}  // extern "C"
