"""Functional BERT encoder — the forward pass behind both serving models.

TPU-native replacement for the torch forwards inside
``SentenceTransformer("BAAI/bge-small-en-v1.5")`` and
``CrossEncoder("cross-encoder/ms-marco-MiniLM-L-6-v2")`` (reference
main.py:80-90): pure-functional JAX with parameters as a pytree, layers
folded through ``lax.scan`` over stacked per-layer weights (one traced
layer body regardless of depth), bf16 matmuls accumulating in f32 on
the MXU, layernorm/softmax in f32 on the VPU.  Static bucketed shapes
keep every variant a single compiled program.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden: int = 384
    layers: int = 12
    heads: int = 12
    intermediate: int = 1536
    max_positions: int = 512
    type_vocab: int = 2
    ln_eps: float = 1e-12
    # heads attached on top of the encoder
    with_pooler: bool = False
    num_labels: int = 0  # >0 => classification head (cross-encoder)
    # serving truncation hint: the sequence length the weights were
    # TRAINED at (sentence_bert_config.json, models/hf_export.py) when it
    # is shorter than max_positions — positions past it are random init
    # on first-party trained checkpoints, so inference must not use them.
    # None = no hint (real HF checkpoints: every position is trained).
    max_seq_length: int | None = None


# BAAI/bge-small-en-v1.5 — 12-layer BERT-small, CLS pooling, dim 384
BGE_SMALL = BertConfig(layers=12, with_pooler=True)
# cross-encoder/ms-marco-MiniLM-L-6-v2 — 6 layers, single-logit classifier
MINILM_L6_CROSS = BertConfig(layers=6, with_pooler=True, num_labels=1)


def _dense_init(key, shape, scale=0.02):
    return scale * jax.random.normal(key, shape, jnp.float32)


def init_params(key: jax.Array, cfg: BertConfig) -> dict:
    """Random-init parameter pytree (layer weights stacked on axis 0)."""
    keys = iter(jax.random.split(key, 64))
    h, i, l = cfg.hidden, cfg.intermediate, cfg.layers
    p = {
        "embeddings": {
            "word": _dense_init(next(keys), (cfg.vocab_size, h)),
            "position": _dense_init(next(keys), (cfg.max_positions, h)),
            "type": _dense_init(next(keys), (cfg.type_vocab, h)),
            "ln_scale": jnp.ones((h,), jnp.float32),
            "ln_bias": jnp.zeros((h,), jnp.float32),
        },
        "layers": {
            "q_w": _dense_init(next(keys), (l, h, h)),
            "q_b": jnp.zeros((l, h)),
            "k_w": _dense_init(next(keys), (l, h, h)),
            "k_b": jnp.zeros((l, h)),
            "v_w": _dense_init(next(keys), (l, h, h)),
            "v_b": jnp.zeros((l, h)),
            "o_w": _dense_init(next(keys), (l, h, h)),
            "o_b": jnp.zeros((l, h)),
            "attn_ln_scale": jnp.ones((l, h)),
            "attn_ln_bias": jnp.zeros((l, h)),
            "in_w": _dense_init(next(keys), (l, h, i)),
            "in_b": jnp.zeros((l, i)),
            "out_w": _dense_init(next(keys), (l, i, h)),
            "out_b": jnp.zeros((l, h)),
            "mlp_ln_scale": jnp.ones((l, h)),
            "mlp_ln_bias": jnp.zeros((l, h)),
        },
    }
    if cfg.with_pooler:
        p["pooler"] = {
            "w": _dense_init(next(keys), (h, h)),
            "b": jnp.zeros((h,)),
        }
    if cfg.num_labels:
        p["classifier"] = {
            "w": _dense_init(next(keys), (h, cfg.num_labels)),
            "b": jnp.zeros((cfg.num_labels,)),
        }
    return p


def _flash_enabled(seq: int, heads: int) -> bool:
    """Opt-IN (RAG_TPU_FLASH=1) Pallas TPU flash-attention path.

    Measured on the v5e (scripts/tpu_probes.py --probe flash + a block
    sweep): at this model family's head_dim of 32 the flash kernel is
    ~10-30% SLOWER than XLA's materialized softmax for the 512x256 rerank
    batch (best tuned blocks 38.7 vs 35.5 ms wall; attention is only
    ~2.5 ms device of the ~70 ms rerank forward — the stage is dense-
    matmul/activation bound, not softmax-traffic bound, and the kernel
    pads 32-lane heads to 128).  The path stays for long-sequence or
    wide-head configs where it wins; default off.  Additional gates
    (checked at trace time): TPU backend only, seq a multiple of the
    128-lane block.
    """
    import os

    if os.environ.get("RAG_TPU_FLASH", "0") in ("0", "false", ""):
        return False
    if seq < 128 or seq % 128 != 0:
        return False
    try:
        import jax as _jax

        if _jax.devices()[0].platform != "tpu":
            return False
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa: F401

        return True
    except Exception:  # pragma: no cover — kernel unavailable
        return False


def _pair_attn_enabled(seq: int, head_dim: int) -> bool:
    """First-party Pallas pair-attention kernel (ops/attention.py).

    Default AUTO: on TPU, engage when the sequence is long enough that
    XLA's materialized (B, H, S, S) f32 scores dominate the forward —
    measured crossover on the v5e at the 480-pair rerank shape: seq 400
    runs 199 ms with XLA's graph vs ~50 ms with the kernel, while at
    seq 112 XLA's fusion already hides the small score tensor.  The
    bundled flash kernel is 2x WORSE at both shapes (pads head_dim 32
    to 128 lanes) — see --probe rerankprof.  RAG_TPU_PAIR_ATTN=1 forces
    the kernel at every length, =0 disables it.
    """
    import os

    mode = os.environ.get("RAG_TPU_PAIR_ATTN", "auto").lower()
    if mode in ("0", "false", "off"):
        return False
    if head_dim > 128:
        return False
    try:
        import jax as _jax

        if _jax.devices()[0].platform != "tpu":
            return False
    except Exception:  # pragma: no cover — backend not initialized
        return False
    if mode == "auto":
        return seq >= 256
    return True


def _flash_attention(q, k, v, attention_mask, inv_sqrt):
    """(B, S, H, hd) inputs -> (B, S, H*hd) context via the fused kernel.

    Padding is masked with SegmentIds (pad tokens get segment 0, real
    tokens 1 — only same-segment positions attend), matching the additive
    -1e9 bias of the naive path for every REAL query position; pad query
    rows attend among themselves, and nothing downstream reads them.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, seq, nh, hd = q.shape
    seg = attention_mask.astype(jnp.int32)
    bs = BlockSizes(
        block_q=min(128, seq), block_k_major=min(128, seq),
        block_k=min(128, seq), block_b=1,
    )
    ctx = flash_attention(
        q.transpose(0, 2, 1, 3).astype(jnp.bfloat16),
        k.transpose(0, 2, 1, 3).astype(jnp.bfloat16),
        v.transpose(0, 2, 1, 3).astype(jnp.bfloat16),
        segment_ids=SegmentIds(seg, seg),
        sm_scale=inv_sqrt,
        block_sizes=bs,
    )
    return ctx.transpose(0, 2, 1, 3).reshape(b, seq, nh * hd).astype(jnp.float32)


def _fused_block_enabled(params_layers: dict) -> bool:
    """Gate for the VMEM-fused encoder-block kernels (ops/fused_bert.py).

    Default OFF — a MEASURED NEGATIVE on the v5e at the 480x112 serving
    shape (interleaved on-chip A/B, --probe rerankprof arms, logits
    agreeing to 8e-4): XLA graph 13.45 ms device (45.8% MFU) vs
    fused-block 30.53 ms (20.2%).  The hand kernels do eliminate the HBM
    round trips the profile attributed (the (R, 4H) FFN activation never
    leaves VMEM), but they also serialize each block into grid steps
    Mosaic can't overlap, while XLA's fusion pipeline already hides most
    of that traffic behind the MXU at these shapes.  Kept as an explicit
    opt-in (RAG_TPU_FUSED_BLOCK=1) for re-pricing on other topologies.
    Construction-time gates, same policy as every use_pallas flag:
    compiled Pallas doesn't lower on CPU; the int8-PTQ weight path keeps
    the XLA graph (its per-channel dequant isn't plumbed through the
    kernels); a forced exact-erf GELU keeps the XLA graph too (the
    kernel bakes the tanh approximation TPU serving already defaults to).
    """
    import os

    if os.environ.get("RAG_TPU_FUSED_BLOCK", "auto").lower() not in (
        "1", "true"
    ):
        return False
    if os.environ.get("RAG_TPU_FAST_GELU", "auto").lower() in ("0", "false"):
        return False
    if any(k.endswith(_SCALE_SUFFIX) for k in params_layers):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover — uninitialized backend
        return False


def _act_dtype():
    """Inter-op activation dtype for the encoder stack (trace-time).

    Storing inter-op activations as bf16 (matmul ACCUMULATION stays f32
    on the MXU, layernorm/softmax math stays f32 on the VPU) halves
    activation HBM footprint/traffic.  MEASURED NEGATIVE for speed on
    the v5e at serving shapes (512x128 rerank batch: 28.1 ms f32-act vs
    29.3 ms bf16-act scanned device time; the stage is MXU+VPU bound,
    not activation-traffic bound, and the extra casts cost more than the
    traffic they save) — so the default stays f32 and bf16 is an
    explicit opt-in (RAG_TPU_BF16_ACT=1) for memory-constrained
    deployments (e.g. sharing HBM with a multi-GiB corpus).
    """
    import os

    v = os.environ.get("RAG_TPU_BF16_ACT", "auto").lower()
    if v in ("1", "true"):
        return jnp.bfloat16
    return jnp.float32


def _gelu(x: jax.Array) -> jax.Array:
    """GELU with a platform-honest cost/accuracy trade.

    HF BERT (BGE-small, MiniLM) uses the exact erf GELU; ported-weight
    parity tests require it on CPU.  On the v5e VPU the erf polynomial
    costs ~6.5 ms of the ~28 ms rerank forward (scanned A/B at 512x128;
    tanh-approx measured identical to relu, i.e. ~free), and the tanh
    form differs from erf by <1e-3 of activation scale — so TPU serving
    defaults to tanh-approx.  RAG_TPU_FAST_GELU=0 forces exact erf
    everywhere, =1 forces tanh everywhere.
    """
    import os

    v = os.environ.get("RAG_TPU_FAST_GELU", "auto").lower()
    if v in ("0", "false"):
        return jax.nn.gelu(x, approximate=False)
    if v in ("1", "true"):
        return jax.nn.gelu(x, approximate=True)
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover — uninitialized backend
        on_tpu = False
    return jax.nn.gelu(x, approximate=on_tpu)


def _ln(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _matmul(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """bf16 x bf16 -> f32 on the MXU."""
    y = jnp.dot(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return y + b


# --- int8 post-training quantization (opt-in serving path) -----------------

_QUANT_WEIGHTS = ("q_w", "k_w", "v_w", "o_w", "in_w", "out_w")
_SCALE_SUFFIX = "__scale"


def quantize_params(params: dict) -> dict:
    """Per-output-channel symmetric int8 PTQ of the six encoder matmul
    weight stacks (the ~97% of rerank FLOPs).  Returns a params pytree
    whose ``layers`` hold int8 weights plus ``<name>__scale`` arrays of
    shape (L, 1, out); :func:`encode` detects the scales at trace time
    and switches those matmuls to weight-only int8 (bf16 matmul of the
    int8-cast weights, per-channel dequant folded into the output) —
    4x less weight HBM footprint/traffic at unchanged matmul throughput.
    Embeddings, layernorms, attention score/context matmuls, pooler and
    classifier stay bf16/f32 — they are a rounding error of the FLOPs
    and carry the accuracy-sensitive small reductions.

    Measured negative result (scripts/tpu_probes.py --probe int8rerank,
    v5e): full dynamic-quant int8 x int8 -> int32 on the MXU is 0.88x
    the f32 forward at the serving shape (480x128 pairs) — the
    per-token abs-max/round/clip activation passes cost ~6 ms of VPU +
    HBM time against a ~11.5 ms device-side forward, more than the 2x
    int8 MXU peak returns.  Weight-only keeps the memory win (the point
    of the flag: sharing HBM with multi-GiB corpora) without that tax.

    Replaces: the reference serves f32 torch models with no quantized
    path (main.py:80-90); this is the TPU-native inference-efficiency
    twin of its int8-less stack, opt-in via RAG_TPU_INT8_RERANK.
    """
    out = {k: v for k, v in params.items() if k != "layers"}
    lp = dict(params["layers"])
    for name in _QUANT_WEIGHTS:
        w = jnp.asarray(lp[name], jnp.float32)  # (L, in, out)
        s = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0  # (L, 1, out)
        s = jnp.maximum(s, 1e-8)
        lp[name] = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        lp[name + _SCALE_SUFFIX] = s.astype(jnp.float32)
    out["layers"] = lp
    return out


def _matmul_q(
    x: jax.Array, w_q: jax.Array, s: jax.Array, b: jax.Array
) -> jax.Array:
    """Weight-only int8 matmul: the int8 weights upcast to bf16 inside
    the matmul read (XLA fuses the convert), run at full bf16 MXU
    throughput, and the per-output-channel scale folds into the output —
    no activation-quantization passes (see the measured negative result
    in :func:`quantize_params`)."""
    y = jnp.dot(
        x.astype(jnp.bfloat16),
        w_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return y * s + b


def encode(
    params: dict,
    input_ids: jax.Array,  # (B, L) int32
    token_type_ids: jax.Array,  # (B, L) int32
    attention_mask: jax.Array,  # (B, L) int32/bool
    cfg: BertConfig,
) -> jax.Array:
    """Returns final hidden states (B, L, H) float32."""
    emb = params["embeddings"]
    act = _act_dtype()
    b, seq = input_ids.shape
    h = (
        emb["word"][input_ids]
        + emb["position"][:seq][None, :, :]
        + emb["type"][token_type_ids]
    )
    h = _ln(h, emb["ln_scale"], emb["ln_bias"], cfg.ln_eps).astype(act)

    nh, hd = cfg.heads, cfg.hidden // cfg.heads
    neg = jnp.float32(-1e9)
    bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)  # (B,1,1,L)
    inv_sqrt = 1.0 / (hd**0.5)
    use_pair_attn = _pair_attn_enabled(seq, hd)
    use_flash = _flash_enabled(seq, nh)
    use_fused_block = _fused_block_enabled(params["layers"])

    def layer(hidden, lp):
        # NOTE separate Q/K/V projections are deliberate: a fused
        # concat-weights QKV matmul measured 30% SLOWER on the v5e for
        # the 512x128 rerank batch (interleaved A/B, 69.9 vs 53.9 ms
        # wall) — the (B, S, 3, H, hd) intermediate and its slices cost
        # more than the two extra activation reads they save, and XLA
        # already schedules the three matmuls back-to-back.
        def proj(h_, name):
            # int8-PTQ params (quantize_params) carry per-channel scales;
            # key presence is static at trace time, so each variant is
            # its own compiled program
            sk = name + _SCALE_SUFFIX
            bias = lp[name[:-1] + "b"]
            if sk in lp:
                return _matmul_q(h_, lp[name], lp[sk], bias)
            return _matmul(h_, lp[name], bias)

        if use_fused_block:
            from financial_rag_system_tpu.ops.fused_bert import fused_qkv

            qf, kf, vf = fused_qkv(
                hidden.reshape(b * seq, cfg.hidden),
                lp["q_w"], lp["q_b"], lp["k_w"], lp["k_b"],
                lp["v_w"], lp["v_b"],
            )
            q = qf.astype(act).reshape(b, seq, nh, hd)
            k = kf.astype(act).reshape(b, seq, nh, hd)
            v = vf.astype(act).reshape(b, seq, nh, hd)
        else:
            q = proj(hidden, "q_w").astype(act).reshape(b, seq, nh, hd)
            k = proj(hidden, "k_w").astype(act).reshape(b, seq, nh, hd)
            v = proj(hidden, "v_w").astype(act).reshape(b, seq, nh, hd)
        if use_pair_attn:
            from financial_rag_system_tpu.ops.attention import (
                encoder_self_attention,
            )

            ctx = encoder_self_attention(q, k, v, attention_mask, inv_sqrt)
        elif use_flash:
            ctx = _flash_attention(q, k, v, attention_mask, inv_sqrt)
        else:
            logits = (
                jnp.einsum(
                    "bqhd,bkhd->bhqk",
                    q.astype(jnp.bfloat16),
                    k.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                * inv_sqrt
                + bias
            )
            probs = jax.nn.softmax(logits, axis=-1)
            ctx = jnp.einsum(
                "bhqk,bkhd->bqhd",
                probs.astype(jnp.bfloat16),
                v.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).reshape(b, seq, cfg.hidden)
        if use_fused_block:
            # VMEM-fused o-proj+LN and FFN+LN (ops/fused_bert.py): the
            # block's intermediates — including the (R, 4H) FFN
            # activation — never touch HBM
            from financial_rag_system_tpu.ops.fused_bert import (
                fused_ffn_ln,
                fused_resid_ln,
            )

            h2 = fused_resid_ln(
                hidden.reshape(b * seq, cfg.hidden),
                ctx.reshape(b * seq, cfg.hidden),
                lp["o_w"], lp["o_b"],
                lp["attn_ln_scale"], lp["attn_ln_bias"], cfg.ln_eps,
            )
            h2 = fused_ffn_ln(
                h2, lp["in_w"], lp["in_b"], lp["out_w"], lp["out_b"],
                lp["mlp_ln_scale"], lp["mlp_ln_bias"], cfg.ln_eps,
            )
            return h2.reshape(b, seq, cfg.hidden).astype(act), None
        attn_out = proj(ctx, "o_w").astype(act)
        hidden = _ln(
            hidden + attn_out, lp["attn_ln_scale"], lp["attn_ln_bias"], cfg.ln_eps
        ).astype(act)
        # GELU flavor is platform-gated (_gelu): exact erf for CPU
        # weight parity, tanh-approx on TPU (erf costs ~6.5 ms of the
        # rerank forward on the VPU, measured)
        mlp = proj(
            _gelu(proj(hidden, "in_w").astype(act)), "out_w"
        ).astype(act)
        hidden = _ln(
            hidden + mlp, lp["mlp_ln_scale"], lp["mlp_ln_bias"], cfg.ln_eps
        ).astype(act)
        return hidden, None

    import os

    # RAG_TPU_SCAN_UNROLL=N unrolls the layer scan (trace-time knob):
    # with the pair-attention custom call inside the loop, XLA's layout
    # assignment around the scan body is pinned per-trip; unrolling lets
    # it specialize per layer.  Default 1 (rolled) — A/B arm.
    unroll = max(1, int(os.environ.get("RAG_TPU_SCAN_UNROLL", "1")))
    h, _ = jax.lax.scan(layer, h, params["layers"],
                        unroll=min(unroll, cfg.layers))
    return h.astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg",))
def embed_cls(params, input_ids, token_type_ids, attention_mask, cfg: BertConfig):
    """CLS-pooled, L2-normalized sentence embedding (BGE convention)."""
    h = encode(params, input_ids, token_type_ids, attention_mask, cfg)
    cls = h[:, 0, :]
    return cls / jnp.linalg.norm(cls, axis=-1, keepdims=True).clip(1e-12)


@partial(jax.jit, static_argnames=("cfg",))
def embed_mean(params, input_ids, token_type_ids, attention_mask, cfg: BertConfig):
    """Mean-pooled, L2-normalized embedding (MiniLM bi-encoder convention)."""
    h = encode(params, input_ids, token_type_ids, attention_mask, cfg)
    m = attention_mask[:, :, None].astype(jnp.float32)
    mean = jnp.sum(h * m, axis=1) / jnp.sum(m, axis=1).clip(1e-9)
    return mean / jnp.linalg.norm(mean, axis=-1, keepdims=True).clip(1e-12)


@partial(jax.jit, static_argnames=("cfg",))
def cross_score(params, input_ids, token_type_ids, attention_mask, cfg: BertConfig):
    """Cross-encoder relevance logit per pair (B,) — MiniLM rerank head."""
    h = encode(params, input_ids, token_type_ids, attention_mask, cfg)
    cls = h[:, 0, :]
    pooled = jnp.tanh(_matmul(cls, params["pooler"]["w"], params["pooler"]["b"]))
    logits = _matmul(pooled, params["classifier"]["w"], params["classifier"]["b"])
    return logits[:, 0]
