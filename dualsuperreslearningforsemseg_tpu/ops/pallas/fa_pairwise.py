"""Pallas TPU kernel: blocked all-pairs L1 reduction for the FA loss.

The reference materializes every (S1 element, S2 element) pair via
repeat_interleave/repeat — an O(N²) tensor in HBM for N similarity entries
(/root/reference/models/losses/FALoss.py:26-33).  This kernel computes

    out[r] = Σ_{i,j} |a[r, i] - b[r, j]|          (per batch*channel row r)

by streaming j-tiles of ``b`` through VMEM against the row's full ``a`` —
the (N, TJ) difference tile lives only in registers/VMEM and is reduced
immediately, exactly how flash-attention blocks QKᵀ.  HBM traffic is O(N)
per row instead of O(N²).

The backward pass uses the sign structure of |·|:

    d/da[r,i] = Σ_j sign(a[r,i] - b[r,j])
    d/db[r,j] = -Σ_i sign(a[r,i] - b[r,j])

computed by a second blocked kernel, wired through jax.custom_vjp.

Rows are processed in tiles of 8 (f32 sublane height); N must be a multiple
of 128 (lane width) — callers pad.  ``losses.fa.fa_loss`` uses the closed
form (sort + prefix sums) by default; this kernel is the TPU fast path and
is validated against it in tests (interpret mode on CPU, compiled on TPU).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 8
_J_TILE = 128
# i-axis tile: bounds the in-flight (ROW_TILE, TI, TJ) f32 pair tile at
# 512 KB regardless of N.  Without it the tile's i extent was the FULL N —
# 8*N*128*4 bytes, i.e. VMEM exhaustion right in the large-N regime
# (N >= 2048) for which losses/fa.py auto-selects this kernel over the
# dense path.  Same divisibility guarantee as the j axis (N % 128 == 0).
_I_TILE = 128


def _fwd_kernel(a_ref, b_ref, out_ref):
    # NB: every intermediate stays rank >= 2 — Mosaic's vector layouts reject
    # rank-1 values (layout.h "arr.size() >= layout_rank" check).
    n = a_ref.shape[1]

    def body(jt, acc):                # acc: (ROW_TILE, TJ)
        bt = b_ref[:, pl.ds(jt * _J_TILE, _J_TILE)]          # (ROW_TILE, TJ)

        def ibody(it, acc2):
            at = a_ref[:, pl.ds(it * _I_TILE, _I_TILE)]      # (ROW_TILE, TI)
            diff = jnp.abs(at[:, :, None] - bt[:, None, :])  # (ROW_TILE, TI, TJ)
            return acc2 + jnp.sum(diff, axis=1)

        return jax.lax.fori_loop(0, n // _I_TILE, ibody, acc)

    acc = jax.lax.fori_loop(0, n // _J_TILE, body,
                            jnp.zeros((_ROW_TILE, _J_TILE), jnp.float32))
    out_ref[:] = jnp.broadcast_to(jnp.sum(acc, axis=1, keepdims=True),
                                  (_ROW_TILE, 128))


def _bwd_kernel(a_ref, b_ref, da_ref, db_ref):
    n = a_ref.shape[1]

    # Both gradients accumulate in-place across the tile loops.
    da_ref[:] = jnp.zeros_like(da_ref)
    db_ref[:] = jnp.zeros_like(db_ref)

    def body(jt, _):
        jd = pl.ds(jt * _J_TILE, _J_TILE)
        bt = b_ref[:, jd]                                    # (ROW_TILE, TJ)

        def ibody(it, _2):
            idx = pl.ds(it * _I_TILE, _I_TILE)
            at = a_ref[:, idx]                               # (ROW_TILE, TI)
            s = jnp.sign(at[:, :, None] - bt[:, None, :])    # (ROW_TILE, TI, TJ)
            da_ref[:, idx] = da_ref[:, idx] + jnp.sum(s, axis=2)
            db_ref[:, jd] = db_ref[:, jd] - jnp.sum(s, axis=1)
            return 0

        return jax.lax.fori_loop(0, n // _I_TILE, ibody, 0)

    jax.lax.fori_loop(0, n // _J_TILE, body, 0)


def _pad_rows(x):
    rows = x.shape[0]
    pad = (-rows) % _ROW_TILE
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    return x, rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fa_allpairs_abs_sum_rows(a, b, interpret=False):
    """Σ_{i,j}|a[r,i]-b[r,j]| per row; a, b: (R, N) f32, N % 128 == 0."""
    return _fwd_impl(a, b, interpret)


def _fwd_impl(a, b, interpret):
    if a.shape[1] % _J_TILE:
        # The j-loop walks N // _J_TILE full tiles: a ragged N would drop
        # tail columns from the sum and leave db's tail columns as
        # uninitialized VMEM in the backward — silent corruption, so refuse.
        raise ValueError("fa_allpairs_abs_sum_rows requires N % {} == 0, "
                         "got {}".format(_J_TILE, a.shape[1]))
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a, rows = _pad_rows(a)
    b, _ = _pad_rows(b)
    n = a.shape[1]
    grid = (a.shape[0] // _ROW_TILE,)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROW_TILE, n), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, n), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_TILE, 128), lambda r: (r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a.shape[0], 128), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=2 * a.shape[0] * n * n,
                                      bytes_accessed=8 * a.shape[0] * n,
                                      transcendentals=0),
        interpret=interpret,
    )(a, b)
    return out[:rows, 0]


def _vjp_fwd(a, b, interpret):
    return _fwd_impl(a, b, interpret), (a, b)


def _vjp_bwd(interpret, residuals, g):
    a, b = residuals
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    af, rows = _pad_rows(af)
    bf, _ = _pad_rows(bf)
    n = af.shape[1]
    grid = (af.shape[0] // _ROW_TILE,)
    da, db = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROW_TILE, n), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, n), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_ROW_TILE, n), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_TILE, n), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((af.shape[0], n), jnp.float32),
                   jax.ShapeDtypeStruct((af.shape[0], n), jnp.float32)],
        cost_estimate=pl.CostEstimate(flops=4 * af.shape[0] * n * n,
                                      bytes_accessed=16 * af.shape[0] * n,
                                      transcendentals=0),
        interpret=interpret,
    )(af, bf)
    gcol = g[:, None]
    return ((da[:rows] * gcol).astype(a.dtype),
            (db[:rows] * gcol).astype(b.dtype))


fa_allpairs_abs_sum_rows.defvjp(_vjp_fwd, _vjp_bwd)


def fa_allpairs_abs_mean_pallas(a_rows, b_rows, interpret=False):
    """mean_{i,j}|a-b| per row, then mean over rows — the FA reduction."""
    n = a_rows.shape[1]
    pad = (-n) % _J_TILE
    if pad:
        # Padding would corrupt the all-pairs sum; callers must supply
        # N % 128 == 0 (true for the model's 16x16 similarity = 256).
        raise ValueError("fa_allpairs pallas kernel requires N % 128 == 0, got {}".format(n))
    sums = fa_allpairs_abs_sum_rows(a_rows, b_rows, interpret)
    return jnp.mean(sums) / (n * n)
