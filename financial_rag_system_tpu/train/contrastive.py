"""Contrastive fine-tuning of the bi-encoder on the serving query log.

The reference stores every (query, answer) in its cache table and calls
it out as future fine-tuning data (reference README.md:41) but never
builds the trainer.  This module does: InfoNCE over (query, positive
chunk) pairs with in-batch negatives, data-parallel across the mesh's
``data`` axis with cross-device negatives — each device embeds its local
micro-batch, ``all_gather``s the document embeddings so every query sees
the full global negative pool, and gradients ``pmean`` before a
replicated optax update.  Collectives are explicit via ``shard_map``,
so the same step runs on the 8-virtual-device CPU mesh in tests and a
TPU pod slice unchanged.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from financial_rag_system_tpu.models import bert
from financial_rag_system_tpu.models.tokenizer import Tokenizer, pad_batch
from financial_rag_system_tpu.parallel.mesh import AXIS_DATA


def _embed(params: dict, ids, types, mask, cfg: bert.BertConfig) -> jax.Array:
    """CLS-pooled normalized embedding (non-jitted; traced inside the step)."""
    h = bert.encode(params, ids, types, mask, cfg)
    cls = h[:, 0, :]
    return cls / jnp.linalg.norm(cls, axis=-1, keepdims=True).clip(1e-12)


def info_nce_loss(
    params: dict,
    q_batch: tuple[jax.Array, jax.Array, jax.Array],
    d_batch: tuple[jax.Array, jax.Array, jax.Array],
    cfg: bert.BertConfig,
    temperature: float,
    axis_name: str | None,
    n_batch: tuple[jax.Array, jax.Array, jax.Array] | None = None,
    neg_weight: float = 1.0,
) -> jax.Array:
    """Symmetric InfoNCE with (cross-device) in-batch negatives.

    ``n_batch`` optionally carries one EXPLICIT hard negative per pair
    (e.g. the intent's lexical bait chunk, data/synthetic.py
    make_train_triples): hard negatives are embedded with the same tower
    and appended to the candidate pool, so each query contrasts against
    the global in-batch positives PLUS every mined negative.
    ``neg_weight`` (w<=1) discounts the mined negatives' denominator
    mass by adding log(w) to their logits — full-strength bait repulsion
    can overwhelm the paraphrase->topic alignment signal when the
    negatives are topical near-duplicates of the positives.
    """
    qv = _embed(params, *q_batch, cfg)  # (b, H)
    dv = _embed(params, *d_batch, cfg)  # (b, H)
    nv = _embed(params, *n_batch, cfg) if n_batch is not None else None
    if axis_name is not None:
        all_d = jax.lax.all_gather(dv, axis_name, axis=0, tiled=True)  # (B, H)
        base = jax.lax.axis_index(axis_name) * qv.shape[0]
        if nv is not None:
            nv = jax.lax.all_gather(nv, axis_name, axis=0, tiled=True)
    else:
        all_d, base = dv, 0
    logits = qv @ all_d.T / temperature  # (b, B)
    if nv is not None:
        n_logits = qv @ nv.T / temperature + jnp.log(neg_weight)
        logits = jnp.concatenate([logits, n_logits], axis=1)
    labels = base + jnp.arange(qv.shape[0])
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_train_step(
    mesh: Mesh | None,
    cfg: bert.BertConfig,
    optimizer: optax.GradientTransformation,
    *,
    temperature: float = 0.05,
    hard_negatives: bool = False,
    neg_weight: float = 1.0,
):
    """Returns jitted step(params, opt_state, q_batch, d_batch[, n_batch]).

    With a mesh, batches must be sharded along the ``data`` axis (leading
    dim divisible by its size); without one, the step is single-device.
    With ``hard_negatives`` the step takes a third ``n_batch`` of
    explicit per-pair negatives (see :func:`info_nce_loss`).
    """

    if mesh is None:
        def step(params, opt_state, q_batch, d_batch, n_batch=None):
            loss, grads = jax.value_and_grad(info_nce_loss)(
                params, q_batch, d_batch, cfg, temperature, None, n_batch,
                neg_weight,
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return jax.jit(step)

    def local_loss_and_grad(params, qi, qt, qm, di, dt, dm, *neg):
        n_batch = tuple(neg) if neg else None
        loss, grads = jax.value_and_grad(info_nce_loss)(
            params, (qi, qt, qm), (di, dt, dm), cfg, temperature, AXIS_DATA,
            n_batch, neg_weight,
        )
        return (
            jax.lax.pmean(loss, AXIS_DATA),
            jax.lax.pmean(grads, AXIS_DATA),
        )

    n_in = 9 if hard_negatives else 6
    sharded = jax.shard_map(
        local_loss_and_grad,
        mesh=mesh,
        in_specs=(P(),) + (P(AXIS_DATA),) * n_in,
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(params, opt_state, q_batch, d_batch, n_batch=None):
        extra = tuple(n_batch) if n_batch is not None else ()
        loss, grads = sharded(params, *q_batch, *d_batch, *extra)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step)


def tokenize_pairs(
    tokenizer: Tokenizer,
    pairs: list[tuple[str, ...]],
    *,
    max_len: int = 64,
) -> tuple[tuple[np.ndarray, ...], ...]:
    """(query, positive[, negative]) tuples -> padded batch arrays.

    Returns (q_batch, d_batch) for 2-tuples and (q_batch, d_batch,
    n_batch) for 3-tuples (hard-negative triples).
    """
    q_encs = [tokenizer.encode(p[0], max_len) for p in pairs]
    d_encs = [tokenizer.encode(p[1], max_len) for p in pairs]
    out = [pad_batch(q_encs), pad_batch(d_encs)]
    if pairs and len(pairs[0]) > 2:
        out.append(pad_batch([tokenizer.encode(p[2], max_len) for p in pairs]))
    return tuple(out)


def pairs_from_cache(
    cache, index, embedder, *, limit: int = 4096, min_rating: int = 0
):
    """Training pairs from the serving log: cached query -> its top chunk.

    This is the closed loop the reference README sketches: production
    queries (with cached answers) become supervision for the retriever.
    The feedback store gates it: a query whose net user rating
    (sum of ±1 ``user_feedback`` rows for its hash) falls below
    ``min_rating`` is excluded — a downvoted answer means the retrieval
    that produced it is NOT trustworthy supervision, so the default
    (0) keeps unrated and net-positive queries and drops net-negative
    ones.  ``min_rating=1`` trains on explicitly-approved traffic only.
    """
    pairs: list[tuple[str, str]] = []
    for query, _answer, net in cache.export_rated_pairs(limit):
        if net < min_rating:
            continue
        vec = embedder.encode([query])
        hits = index.search(vec, k=1)[0]
        if hits:
            pairs.append((query, hits[0]["text"]))
    return pairs


def train(
    params: dict,
    cfg: bert.BertConfig,
    pairs: list[tuple[str, ...]],
    *,
    mesh: Mesh | None = None,
    tokenizer: Tokenizer | None = None,
    epochs: int = 1,
    batch_size: int = 32,
    lr: float = 2e-5,
    temperature: float = 0.05,
    neg_weight: float = 1.0,
    seed: int = 0,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 100,
) -> tuple[dict, list[float]]:
    """Simple epoch loop with optional orbax checkpoint/resume.

    ``pairs`` items are (query, positive) or (query, positive, negative)
    — 3-tuples train with explicit hard negatives in the InfoNCE pool
    (data/synthetic.py make_train_triples supplies the bait chunks).
    Returns (trained params, per-step losses).  With ``checkpoint_dir``,
    training resumes from the latest saved step and saves every
    ``checkpoint_every`` steps plus once at the end.
    """
    tok = tokenizer or Tokenizer()
    # same rationale as train_cross_encoder: clip so the trajectory is
    # robust to shuffle order / supervision-size changes
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    opt_state = optimizer.init(params)
    step_count = 0
    if checkpoint_dir:
        from financial_rag_system_tpu.train.checkpoint import restore_state

        restored = restore_state(
            checkpoint_dir, target={"params": params, "opt_state": opt_state}
        )
        if restored is not None:
            step_count, state = restored
            params, opt_state = state["params"], state["opt_state"]
    with_negs = bool(pairs) and len(pairs[0]) > 2
    step_fn = make_train_step(
        mesh, cfg, optimizer, temperature=temperature,
        hard_negatives=with_negs, neg_weight=neg_weight,
    )

    def maybe_save(force: bool = False) -> None:
        if checkpoint_dir and (force or step_count % checkpoint_every == 0):
            from financial_rag_system_tpu.train.checkpoint import save_state

            save_state(
                checkpoint_dir, step_count,
                {"params": params, "opt_state": opt_state},
            )

    n_dev = mesh.shape[AXIS_DATA] if mesh is not None else 1
    bs = max(batch_size, n_dev) // n_dev * n_dev  # divisible micro-batching
    rng = np.random.default_rng(seed)
    losses: list[float] = []
    for _ in range(epochs):
        order = rng.permutation(len(pairs))
        for s in range(0, len(pairs) - bs + 1, bs):
            chunk = [pairs[i] for i in order[s : s + bs]]
            batches = tokenize_pairs(tok, chunk)
            if mesh is not None:
                shard = NamedSharding(mesh, P(AXIS_DATA))
                batches = tuple(
                    tuple(jax.device_put(jnp.asarray(a), shard) for a in b)
                    for b in batches
                )
            else:
                batches = tuple(
                    tuple(jnp.asarray(a) for a in b) for b in batches
                )
            params, opt_state, loss = step_fn(params, opt_state, *batches)
            losses.append(float(loss))
            step_count += 1
            maybe_save()
    maybe_save(force=True)
    return params, losses
