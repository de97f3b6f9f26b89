"""Cross-encoder -> bi-encoder knowledge distillation (Margin-MSE).

The reference serves a PRETRAINED distilled retriever: BGE-small's own
training recipe distills cross-encoder judgments into the dense tower
(reference main.py:84 picks the finished artifact off the shelf).  With
no egress this module reproduces the technique itself: after the two
first-party trainers run (train/contrastive.py, train/cross_encoder.py),
the trained cross-encoder becomes the TEACHER and the bi-encoder learns
to match its pairwise score *margins* (Margin-MSE, Hofstaetter et al.
2020): for each (query, positive, negative) triple the student's
``(cos(q,p) - cos(q,n)) / temperature`` regresses onto the teacher's
``logit(q,p) - logit(q,n)``.

Margins — not absolute scores — are the right target here for the same
reason measured in the hard-negative A/B (README "explicit hard
negatives hurt the bi-encoder"): on bait triples the geometry cannot
push the near-duplicate negative far away without wrecking the topical
clustering, but it CAN order the pair correctly by a small margin, and
the margin objective is indifferent to where on the sphere the pair
sits.  The teacher read both texts jointly, so its margin carries
token-interaction evidence InfoNCE labels never see.

Supervision reuses the leak-checked triple makers
(data/synthetic.py make_train_triples / make_filler_triples) — the eval
queries are never seen and the paraphrase overlap budget is enforced by
tests/test_hard_eval.py, same discipline as both base trainers.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from financial_rag_system_tpu.models import bert
from financial_rag_system_tpu.models.tokenizer import Tokenizer, pad_batch
from financial_rag_system_tpu.train.contrastive import _embed


def teacher_margins(
    ce_params: dict,
    ce_cfg: bert.BertConfig,
    triples: list[tuple[str, str, str]],
    *,
    tokenizer: Tokenizer | None = None,
    max_len: int = 128,
    batch_size: int = 64,
) -> np.ndarray:
    """Teacher logit margins ``score(q,pos) - score(q,neg)``, one pass.

    Scored once up front (the teacher is frozen), so the student loop
    pays zero cross-encoder FLOPs per step.
    """
    tok = tokenizer or Tokenizer()
    score = jax.jit(
        lambda ids, types, mask: bert.cross_score(
            ce_params, ids, types, mask, ce_cfg
        )
    )
    out = np.zeros(len(triples), np.float32)
    for s in range(0, len(triples), batch_size):
        chunk = triples[s : s + batch_size]
        pos_encs = [tok.encode_pair(q, p, max_len) for q, p, _ in chunk]
        neg_encs = [tok.encode_pair(q, n, max_len) for q, _, n in chunk]
        p_logits = score(*map(jnp.asarray, pad_batch(pos_encs)))
        n_logits = score(*map(jnp.asarray, pad_batch(neg_encs)))
        m = np.asarray(p_logits - n_logits, np.float32)
        out[s : s + len(chunk)] = m[: len(chunk)]
    return out


def make_distill_step(
    cfg: bert.BertConfig,
    optimizer: optax.GradientTransformation,
    *,
    temperature: float = 0.05,
):
    """jitted step(params, opt_state, q_batch, p_batch, n_batch, margins).

    Margin-MSE: the student margin ``(cos(q,p) - cos(q,n))/temperature``
    regresses onto the teacher's logit margin.  ``temperature`` maps the
    cosine range onto the teacher's logit scale — the same 0.05 the
    InfoNCE stage used keeps the two objectives' gradient scales
    commensurate.
    """

    def loss_fn(params, q_batch, p_batch, n_batch, margins):
        qv = _embed(params, *q_batch, cfg)
        pv = _embed(params, *p_batch, cfg)
        nv = _embed(params, *n_batch, cfg)
        s_pos = jnp.sum(qv * pv, axis=-1) / temperature
        s_neg = jnp.sum(qv * nv, axis=-1) / temperature
        return jnp.mean((s_pos - s_neg - margins) ** 2)

    def step(params, opt_state, q_batch, p_batch, n_batch, margins):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, q_batch, p_batch, n_batch, margins
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step)


def distill(
    params: dict,
    cfg: bert.BertConfig,
    ce_params: dict,
    ce_cfg: bert.BertConfig,
    triples: list[tuple[str, str, str]],
    *,
    tokenizer: Tokenizer | None = None,
    steps: int = 100,
    batch_size: int = 32,
    lr: float = 1e-5,
    temperature: float = 0.05,
    max_len: int = 64,
    teacher_max_len: int = 128,
    seed: int = 0,
) -> tuple[dict, list[float]]:
    """Distill the trained cross-encoder into the (already-trained)
    bi-encoder over (query, positive, negative) text triples.

    Runs as a short low-lr refinement phase AFTER InfoNCE training —
    the teacher's margins reorder hard pairs without disturbing the
    topical geometry the contrastive stage built.  Returns
    (refined params, per-step losses).
    """
    tok = tokenizer or Tokenizer()
    margins = teacher_margins(
        ce_params, ce_cfg, triples, tokenizer=tok, max_len=teacher_max_len
    )
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    opt_state = optimizer.init(params)
    step_fn = make_distill_step(cfg, optimizer, temperature=temperature)
    rng = np.random.default_rng(seed)
    losses: list[float] = []
    done = 0
    while done < steps:
        order = rng.permutation(len(triples))
        for s in range(0, len(triples) - batch_size + 1, batch_size):
            if done >= steps:
                break
            idx = order[s : s + batch_size]
            chunk = [triples[i] for i in idx]
            # trim batch-bucket pad rows so margins stay row-aligned
            q_b = tuple(
                a[: len(chunk)]
                for a in pad_batch([tok.encode(t[0], max_len) for t in chunk])
            )
            p_b = tuple(
                a[: len(chunk)]
                for a in pad_batch([tok.encode(t[1], max_len) for t in chunk])
            )
            n_b = tuple(
                a[: len(chunk)]
                for a in pad_batch([tok.encode(t[2], max_len) for t in chunk])
            )
            m = jnp.asarray(margins[idx])
            params, opt_state, loss = step_fn(
                params, opt_state,
                tuple(jnp.asarray(a) for a in q_b),
                tuple(jnp.asarray(a) for a in p_b),
                tuple(jnp.asarray(a) for a in n_b),
                m,
            )
            losses.append(float(loss))
            done += 1
    return params, losses
