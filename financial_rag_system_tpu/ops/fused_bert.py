"""Fused encoder-block Pallas kernels: keep activations in VMEM.

The rerank stage — ~84% of the fused serving batch — is TRAFFIC-bound,
not MXU-bound, on this hardware (scripts/tpu_probes.py --probe
rerankprof at the 480x112 serving shape): isolated FFN-shaped matmuls
run at ~peak, but the XLA layer graph round-trips every intermediate
through HBM — the (R, 1536) FFN activation alone is 330 MB f32 each way
per layer — and the per-token layernorms/gelu add whole extra passes.
These kernels collapse an encoder block's elementwise chain into single
VMEM-resident ops:

- :func:`fused_ffn_ln`:   y = LN(x + gelu(x @ w_in + b_in) @ w_out + b_out)
- :func:`fused_resid_ln`: y = LN(x + ctx @ w_o + b_o)

Each reads its row block once from HBM, runs both matmuls on the MXU
(bf16 operands, f32 accumulation), applies bias/gelu/residual/layernorm
on the VPU while everything is in VMEM, and writes the block once.
Weights ride as whole-array VMEM operands (same block at every grid
step, so Mosaic keeps them resident).  Attention is NOT fused here — the
flash-attention kernel (jax.experimental.pallas.ops.tpu) already keeps
score matrices out of HBM; models/bert.py composes the three.

Replaces: the torch layer stack inside the reference's CrossEncoder
(reference main.py:86-90) — there the framework's eager kernels pay the
same HBM round-trips; this is the TPU-native answer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row-block height: multiples of 8 sublanes; 512 divides the serving
# pair batches (480*112 rows = 105 blocks) and keeps the block's f32
# intermediate (512, 1536) at 3 MiB of VMEM
BLOCK_R = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ffn_ln_kernel(
    x_ref, w_in_ref, b_in_ref, w_out_ref, b_out_ref, s_ref, b_ref, eps_ref,
    y_ref,
):
    x = x_ref[:].astype(jnp.float32)
    up = (
        jnp.dot(
            x.astype(jnp.bfloat16), w_in_ref[:],
            preferred_element_type=jnp.float32,
        )
        + b_in_ref[:]
    )
    up = jax.nn.gelu(up, approximate=True)
    out = (
        jnp.dot(
            up.astype(jnp.bfloat16), w_out_ref[:],
            preferred_element_type=jnp.float32,
        )
        + b_out_ref[:]
    )
    res = x + out
    mu = jnp.mean(res, axis=-1, keepdims=True)
    var = jnp.mean((res - mu) ** 2, axis=-1, keepdims=True)
    y_ref[:] = (res - mu) * jax.lax.rsqrt(var + eps_ref[0]) * s_ref[:] + b_ref[:]


def _qkv_kernel(
    x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    q_ref, k_ref, v_ref,
):
    x = x_ref[:].astype(jnp.bfloat16)
    q_ref[:] = (
        jnp.dot(x, wq_ref[:], preferred_element_type=jnp.float32) + bq_ref[:]
    )
    k_ref[:] = (
        jnp.dot(x, wk_ref[:], preferred_element_type=jnp.float32) + bk_ref[:]
    )
    v_ref[:] = (
        jnp.dot(x, wv_ref[:], preferred_element_type=jnp.float32) + bv_ref[:]
    )


def _resid_ln_kernel(
    x_ref, ctx_ref, w_ref, b_ref, s_ref, lb_ref, eps_ref, y_ref
):
    x = x_ref[:].astype(jnp.float32)
    out = (
        jnp.dot(
            ctx_ref[:].astype(jnp.bfloat16), w_ref[:],
            preferred_element_type=jnp.float32,
        )
        + b_ref[:]
    )
    res = x + out
    mu = jnp.mean(res, axis=-1, keepdims=True)
    var = jnp.mean((res - mu) ** 2, axis=-1, keepdims=True)
    y_ref[:] = (res - mu) * jax.lax.rsqrt(var + eps_ref[0]) * s_ref[:] + lb_ref[:]


def _row_padded(x: jax.Array, block: int) -> tuple[jax.Array, int]:
    r = x.shape[0]
    rp = _round_up(r, block)
    if rp != r:
        x = jnp.pad(x, ((0, rp - r), (0, 0)))
    return x, r


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def fused_ffn_ln(
    x: jax.Array,       # (R, H)
    w_in: jax.Array,    # (H, I)
    b_in: jax.Array,    # (I,)
    w_out: jax.Array,   # (I, H)
    b_out: jax.Array,   # (H,)
    ln_scale: jax.Array,  # (H,)
    ln_bias: jax.Array,   # (H,)
    eps: float | jax.Array,
    *,
    interpret: bool = False,
    block: int = BLOCK_R,
) -> jax.Array:
    """LN(x + gelu(x @ w_in + b_in) @ w_out + b_out) — one HBM pass."""
    xp, r = _row_padded(x, block)
    rp, h = xp.shape
    i = w_in.shape[1]
    grid = (rp // block,)
    y = pl.pallas_call(
        _ffn_ln_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, h), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, i), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((i, h), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, h), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, h), jnp.float32),
        interpret=interpret,
    )(
        xp,
        w_in.astype(jnp.bfloat16),
        b_in.reshape(1, i).astype(jnp.float32),
        w_out.astype(jnp.bfloat16),
        b_out.reshape(1, h).astype(jnp.float32),
        ln_scale.reshape(1, h).astype(jnp.float32),
        ln_bias.reshape(1, h).astype(jnp.float32),
        jnp.asarray([eps], jnp.float32),
    )
    return y[:r]


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def fused_qkv(
    x: jax.Array,   # (R, H)
    wq: jax.Array, bq: jax.Array,
    wk: jax.Array, bk: jax.Array,
    wv: jax.Array, bv: jax.Array,
    *,
    interpret: bool = False,
    block: int = BLOCK_R,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """q, k, v = x @ w{q,k,v} + b{q,k,v} with ONE read of x per block —
    the three separate XLA projections each re-read the activations."""
    xp, r = _row_padded(x, block)
    rp, h = xp.shape
    grid = (rp // block,)
    w_spec = pl.BlockSpec((h, h), lambda g: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, h), lambda g: (0, 0), memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((block, h), lambda g: (g, 0),
                          memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((rp, h), jnp.float32)
    q, k, v = pl.pallas_call(
        _qkv_kernel,
        grid=grid,
        in_specs=[r_spec, w_spec, b_spec, w_spec, b_spec, w_spec, b_spec],
        out_specs=(r_spec, r_spec, r_spec),
        out_shape=(out, out, out),
        interpret=interpret,
    )(
        xp,
        wq.astype(jnp.bfloat16), bq.reshape(1, h).astype(jnp.float32),
        wk.astype(jnp.bfloat16), bk.reshape(1, h).astype(jnp.float32),
        wv.astype(jnp.bfloat16), bv.reshape(1, h).astype(jnp.float32),
    )
    return q[:r], k[:r], v[:r]


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def fused_resid_ln(
    x: jax.Array,       # (R, H) residual input
    ctx: jax.Array,     # (R, H) projection input
    w: jax.Array,       # (H, H)
    b: jax.Array,       # (H,)
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    eps: float | jax.Array,
    *,
    interpret: bool = False,
    block: int = BLOCK_R,
) -> jax.Array:
    """LN(x + ctx @ w + b) — the attention-output half-block."""
    xp, r = _row_padded(x, block)
    cp, _ = _row_padded(ctx, block)
    rp, h = xp.shape
    grid = (rp // block,)
    y = pl.pallas_call(
        _resid_ln_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, h), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, h), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, h), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, h), jnp.float32),
        interpret=interpret,
    )(
        xp,
        cp,
        w.astype(jnp.bfloat16),
        b.reshape(1, h).astype(jnp.float32),
        ln_scale.reshape(1, h).astype(jnp.float32),
        ln_bias.reshape(1, h).astype(jnp.float32),
        jnp.asarray([eps], jnp.float32),
    )
    return y[:r]
