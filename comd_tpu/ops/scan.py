"""Scoped-VMEM-safe 1-D scans and mask compaction for TPU.

XLA lowers a 1-D cumulative reduction to a single ``reduce_window`` whose
TPU emitter stages the whole (padded) operand in scoped VMEM (16 MB on
v5e).  Long scans therefore fail to *compile*: the sharded-NL program at
32^3/A=32 requested 19.09M for the i64 cumsum inside ``jnp.nonzero``
(tools/r5_logs/overlap32_nl.log.2 — "It should not be possible to run out
of scoped vmem - please file a bug against XLA").  Two aggravators:

* with jax_enable_x64 on (we need f64 energy accumulation), ``jnp.nonzero``
  and bool ``jnp.cumsum`` promote to int64, doubling the footprint; int64
  is further split into (hi, lo) u32 pairs on TPU — the failing op is a
  variadic ``reduce-window(u32[2,128], u32[2,128])``;
* reshaping to 2-D does not help: a row-wise scan is still ONE
  reduce_window over the whole array.

The fix is to emit a *separate* reduce_window per fixed-size chunk with a
scalar carry between chunks (a static Python loop — chunk count is known
at trace time).  Each op's scoped footprint is then bounded by the chunk,
independent of the array length.  The carry chain serializes the chunks,
which is irrelevant here: every caller is on a rebucket/rebuild path that
amortizes over O(20-65) steps.

Reference analog: the GPU scan utilities (src-mpi/gpu_scan.h) that back
stream compaction in the redistribute/neighbor-list kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

#: per-chunk element cap.  A 64k i32 chunk costs ~1 MB per staged buffer in
#: scoped VMEM — an order of magnitude under the 16 MB v5e limit even with
#: XLA's double-buffering and neighbor-fusion overheads.
SCAN_CHUNK = 65536


def _chunked(op_cumulative, combine, x, chunk):
    (n,) = x.shape
    if n <= chunk:
        return op_cumulative(x)
    parts = []
    carry = None
    for start in range(0, n, chunk):
        seg = op_cumulative(x[start:min(start + chunk, n)])
        if carry is not None:
            seg = combine(seg, carry)
        carry = seg[-1]
        parts.append(seg)
    return jnp.concatenate(parts)


def cumsum_i32(x, *, chunk: int = SCAN_CHUNK):
    """Inclusive 1-D cumsum in int32, chunked to bound scoped VMEM."""
    x = x.astype(jnp.int32)
    return _chunked(jnp.cumsum, jnp.add, x, chunk)


def cummax_i32(x, *, chunk: int = SCAN_CHUNK):
    """Inclusive 1-D cummax in int32, chunked to bound scoped VMEM."""
    x = x.astype(jnp.int32)
    return _chunked(jax.lax.cummax, jnp.maximum, x, chunk)


def compact_indices(mask, size: int, *, chunk: int = SCAN_CHUNK):
    """First-``size`` indices where ``mask`` is True, in ascending order.

    Drop-in for ``jnp.nonzero(mask, size=size, fill_value=0)[0]`` (int32)
    without its int64 full-length cumsum: positions come from cumsum_i32
    and land by scatter.  Returns ``(idx [size] int32, count int32)`` where
    ``count`` is the TOTAL number of True elements (callers compare it to
    ``size`` for overflow detection).
    """
    (n,) = mask.shape
    pos = cumsum_i32(mask, chunk=chunk) - 1
    count = pos[-1] + 1
    dest = jnp.where(mask, pos, jnp.int32(size))  # False / beyond-cap: drop
    ar = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    idx = jnp.zeros((size,), jnp.int32).at[dest].set(ar, mode="drop")
    return idx, count


def run_rank(sorted_ids, *, chunk: int = SCAN_CHUNK):
    """Rank of each element within its run of equal (sorted) ids.

    ``rank[i] = i - first_index_of_run(sorted_ids[i])`` via a chunked
    cummax over the run-start positions.
    """
    (n,) = sorted_ids.shape
    ar = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    is_start = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_ids[1:] != sorted_ids[:-1]])
    run_start = cummax_i32(jnp.where(is_start, ar, 0), chunk=chunk)
    return ar - run_start
