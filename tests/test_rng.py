"""RNG bit-exactness vs. an independent big-int implementation of the
reference generators (src-mpi/random.c:22-75)."""
import numpy as np

from comd_tpu import rng

M61 = 2305843009213693951
MULT = 437799614237992725


def lcg61_py(seed: int):
    seed = (seed * MULT) % (1 << 64)  # C uint64_t wrap
    seed %= M61
    return seed / M61, seed


def mk_seed_py(gid: int, call_site: int) -> int:
    s1 = (gid * 2654435761) % (1 << 32)
    s2 = ((gid + call_site) * 2654435761) % (1 << 32)
    seed = 0x100000000 * s1 + s2
    for _ in range(10):
        _, seed = lcg61_py(seed)
    return seed


def test_lcg61_matches_bigint():
    seeds = np.array([1, 12345, M61 - 2, 2**63 + 11], dtype=np.uint64)
    vals, new = rng.lcg61(seeds)
    for i, s in enumerate([1, 12345, M61 - 2, 2**63 + 11]):
        v, ns = lcg61_py(s)
        assert int(new[i]) == ns
        assert vals[i] == v


def test_mk_seed_matches_bigint():
    gids = np.array([0, 1, 7, 123456, 2**31], dtype=np.uint64)
    got = rng.mk_seed(gids, 123)
    for i, g in enumerate([0, 1, 7, 123456, 2**31]):
        assert int(got[i]) == mk_seed_py(g % (1 << 32), 123)


def gasdev_py(seed: int):
    import math
    while True:
        u1, seed = lcg61_py(seed)
        u2, seed = lcg61_py(seed)
        v1 = 2.0 * u1 - 1.0
        v2 = 2.0 * u2 - 1.0
        rsq = v1 * v1 + v2 * v2
        if not (rsq >= 1.0 or rsq == 0.0):
            return v2 * math.sqrt(-2.0 * math.log(rsq) / rsq), seed


def test_gasdev_matches_scalar_loop():
    gids = np.arange(100, dtype=np.uint64)
    seeds = rng.mk_seed(gids, 123)
    got, new_seeds = rng.gasdev(seeds)
    for i in range(100):
        want, ns = gasdev_py(int(seeds[i]))
        assert got[i] == want
        assert int(new_seeds[i]) == ns


def test_gasdev_sequence():
    """Three sequential draws reproduce setTemperature's px,py,pz order."""
    gids = np.array([42], dtype=np.uint64)
    seq = rng.gasdev_n(gids, 123, 3)
    seed = int(rng.mk_seed(gids, 123)[0])
    for k in range(3):
        want, seed = gasdev_py(seed)
        assert seq[k, 0] == want


def test_gasdev_moments():
    gids = np.arange(20000, dtype=np.uint64)
    vals = rng.gasdev_n(gids, 123, 1)[0]
    assert abs(vals.mean()) < 0.02
    assert abs(vals.std() - 1.0) < 0.02
