"""Chunked-scan utilities (ops/scan.py): semantics vs numpy / jnp.nonzero.

These exist because XLA's TPU lowering of long 1-D scans stages the whole
operand in scoped VMEM and fails to compile at ~300k int64 elements
(tools/r5_logs/overlap32_nl.log.2); the utilities must be bit-identical to
the single-op versions they replace.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comd_tpu.ops import scan


@pytest.mark.parametrize("n", [1, 127, 128, 129, 1000, 4096])
@pytest.mark.parametrize("chunk", [64, 128, 1000])
def test_cumsum_matches_numpy(n, chunk):
    rng = np.random.default_rng(n * 1000 + chunk)
    x = rng.integers(-50, 50, size=n).astype(np.int32)
    got = np.asarray(scan.cumsum_i32(jnp.asarray(x), chunk=chunk))
    np.testing.assert_array_equal(got, np.cumsum(x).astype(np.int32))


@pytest.mark.parametrize("n", [1, 129, 1000, 4096])
@pytest.mark.parametrize("chunk", [64, 1000])
def test_cummax_matches_numpy(n, chunk):
    rng = np.random.default_rng(n * 7 + chunk)
    x = rng.integers(-1000, 1000, size=n).astype(np.int32)
    got = np.asarray(scan.cummax_i32(jnp.asarray(x), chunk=chunk))
    np.testing.assert_array_equal(got, np.maximum.accumulate(x))


@pytest.mark.parametrize("density", [0.0, 0.1, 0.9, 1.0])
@pytest.mark.parametrize("chunk", [64, 100000])
def test_compact_indices_matches_nonzero(density, chunk):
    rng = np.random.default_rng(int(density * 10) + chunk)
    mask = rng.random(size=1500) < density
    size = 640
    idx, count = scan.compact_indices(jnp.asarray(mask), size, chunk=chunk)
    want = jnp.nonzero(jnp.asarray(mask), size=size, fill_value=0)[0]
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want))
    assert int(count) == int(mask.sum())   # TOTAL count, even beyond size


def test_compact_indices_under_jit():
    mask = jnp.asarray(np.random.default_rng(3).random(300) < 0.5)
    f = jax.jit(lambda m: scan.compact_indices(m, 256, chunk=64))
    idx, count = f(mask)
    want = jnp.nonzero(mask, size=256, fill_value=0)[0]
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want))


@pytest.mark.parametrize("chunk", [64, 100000])
def test_run_rank(chunk):
    rng = np.random.default_rng(11)
    ids = np.sort(rng.integers(0, 40, size=1000).astype(np.int32))
    got = np.asarray(scan.run_rank(jnp.asarray(ids), chunk=chunk))
    want = np.zeros_like(ids)
    for i in range(1, len(ids)):
        want[i] = want[i - 1] + 1 if ids[i] == ids[i - 1] else 0
    np.testing.assert_array_equal(got, want)


def test_no_monolithic_scan_in_tpu_lowering():
    """The whole point: at lengths past the chunk, every reduce_window in
    the TPU lowering must stay chunk-sized, and no large tensor may promote
    to int64 (the two scoped-VMEM killers; jnp.cumsum only becomes a
    reduce_window on the TPU lowering path, hence the platform export)."""
    import re

    from jax import export

    n, chunk = 300_000, scan.SCAN_CHUNK
    mask = jnp.zeros((n,), jnp.bool_)

    def f(m):
        idx, cnt = scan.compact_indices(m, 1024)
        return idx, cnt, scan.cummax_i32(m.astype(jnp.int32))

    txt = export.export(jax.jit(f), platforms=("tpu",))(mask).mlir_module()
    dims = [int(d) for d in re.findall(
        r"window_dimensions = array<i64: (\d+)>", txt)]
    assert dims, "expected reduce_window ops in the TPU lowering"
    assert max(dims) <= chunk, f"monolithic scan survived: {max(dims)}"
    big_i64 = [int(d) for d in re.findall(r"tensor<(\d+)xi64>", txt)
               if int(d) > 128]
    assert not big_i64, f"large int64 tensors in lowering: {big_i64[:5]}"
