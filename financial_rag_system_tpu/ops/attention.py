"""Pallas encoder self-attention for short-sequence, small-head BERTs.

The cross-encoder rerank — ~96% of a fused serving batch's FLOPs — is
ATTENTION-TRAFFIC bound at realistic chunk lengths on this hardware
(scripts/tpu_probes.py --probe rerankprof at 480 pairs x 400 tokens, the
1000-char-chunk serving shape): XLA materializes the per-layer
(480, 12, 400, 400) f32 score tensor in HBM — ~3.7 GiB written + re-read
around the softmax per layer — and the ablation prices it at 149 ms of
the 200 ms forward, while the attention math itself is only ~0.7 TFLOP
(~4 ms of MXU).  jax's bundled flash-attention kernel is tuned for LLM
shapes (head_dim >= 128, long sequences) and measures 2x WORSE here: it
pads head_dim 32 up to 128 lanes and serializes a (batch*head) grid.

This kernel is shaped for the other corner of the design space — many
independent short pairs, 12 heads of 32 lanes:

- grid over PAIRS; one program owns one pair's whole attention, so
  q/k/v (12 x 512 x 32 bf16 = 0.4 MiB each) and the per-head (512, 512)
  f32 score block all live in VMEM — scores NEVER touch HBM;
- heads run in an in-kernel fori_loop, sliced on the SUBLANE axis
  (layout (B, H*S, D)) — no lane-granularity relayouts;
- softmax is a plain full-row max/exp/sum in f32 (S <= 512: no online
  rescaling needed), and the 1/sum divide is applied AFTER the
  probs @ V matmul, on the (S, 32) context instead of the (S, S) probs;
- key padding is one additive (1, S) bias row broadcast into the
  logits, exactly the naive path's -1e9 semantics (pad QUERY rows
  compute a uniform softmax over pad keys; nothing downstream reads
  them — same contract as models/bert.py's einsum path).

Replaces: torch scaled_dot_product_attention inside the reference's
CrossEncoder/SentenceTransformer stacks (reference main.py:84-90).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(bias_ref, q_ref, kt_ref, v_ref, o_ref, *, heads: int,
                 sp: int, d: int):
    """One pair: loop heads, full-row softmax in VMEM.

    Block shapes: bias (1, 1, sp) f32; q/v (1, heads*sp, d) bf16;
    kt (1, heads*d, sp) bf16 — K arrives PRE-TRANSPOSED so the QK^T dot
    is a standard sublane contraction (a lanes-vs-lanes dot_general here
    cost a Mosaic relayout of K per head per pair — measured 1.2x
    slower); o (1, heads*sp, d) bf16.  Head h owns sublane rows
    [h*sp, (h+1)*sp) of q/v/o and [h*d, (h+1)*d) of kt.
    """
    bias = bias_ref[0, :, :]  # (1, Sk) broadcasts over Sq

    def head(h, _):
        q = q_ref[0, pl.ds(h * sp, sp), :]   # (sp, d) bf16, pre-scaled
        kt = kt_ref[0, pl.ds(h * d, d), :]   # (d, sp) bf16
        v = v_ref[0, pl.ds(h * sp, sp), :]
        lg = jnp.dot(
            q, kt, preferred_element_type=jnp.float32
        ) + bias                                   # (Sq, Sk) f32, VMEM-only
        m = jnp.max(lg, axis=-1, keepdims=True)
        p = jnp.exp(lg - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        ctx = jnp.dot(
            p.astype(jnp.bfloat16), v, preferred_element_type=jnp.float32
        )                                          # (Sq, d)
        o_ref[0, pl.ds(h * sp, sp), :] = (ctx / s).astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, heads, head, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def encoder_self_attention(
    q: jax.Array,                 # (B, S, H, D) any float dtype
    k: jax.Array,                 # (B, S, H, D)
    v: jax.Array,                 # (B, S, H, D)
    attention_mask: jax.Array,    # (B, S) int/bool — key validity
    inv_sqrt: float,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, S, H*D) f32 context, numerically matching the naive
    einsum path (bf16 operands, f32 accumulation and softmax)."""
    b, s, h, d = q.shape
    sp = _round_up(s, 128)  # lane tiles of the (Sq, Sk) score block

    # fold the softmax scale into q in f32, THEN cast: one multiply on
    # the small (B,S,H,D) tensor instead of the (B,H,S,S) logits
    q = (q.astype(jnp.float32) * inv_sqrt).astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)

    def to_hsd(x):  # (B, S, H, D) -> (B, H*Sp, D), head-major sublanes
        x = jnp.transpose(x, (0, 2, 1, 3))  # (B, H, S, D)
        if sp != s:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, sp - s), (0, 0)))
        return x.reshape(b, h * sp, d)

    qh, vh = to_hsd(q), to_hsd(v)
    kt = jnp.transpose(k.astype(jnp.bfloat16), (0, 2, 3, 1))  # (B,H,D,S)
    if sp != s:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (0, sp - s)))
    kt = kt.reshape(b, h * d, sp)
    bias = jnp.where(attention_mask > 0, 0.0, jnp.float32(-1e9))
    if sp != s:
        bias = jnp.pad(bias, ((0, 0), (0, sp - s)),
                       constant_values=jnp.float32(-1e9))
    bias = bias.reshape(b, 1, sp)  # (1, sp) trailing block = array dims

    out = pl.pallas_call(
        functools.partial(_attn_kernel, heads=h, sp=sp, d=d),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, sp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * d, sp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * sp, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * sp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * sp, d), jnp.bfloat16),
        interpret=interpret,
    )(bias.astype(jnp.float32), qh, kt, vh)

    out = out.reshape(b, h, sp, d)[:, :, :s, :]      # unpad
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(
        b, s, h * d).astype(jnp.float32)
