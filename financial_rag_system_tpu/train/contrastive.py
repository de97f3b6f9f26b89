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
) -> jax.Array:
    """Symmetric InfoNCE with (cross-device) in-batch negatives."""
    qv = _embed(params, *q_batch, cfg)  # (b, H)
    dv = _embed(params, *d_batch, cfg)  # (b, H)
    if axis_name is not None:
        all_d = jax.lax.all_gather(dv, axis_name, axis=0, tiled=True)  # (B, H)
        base = jax.lax.axis_index(axis_name) * qv.shape[0]
    else:
        all_d, base = dv, 0
    logits = qv @ all_d.T / temperature  # (b, B)
    labels = base + jnp.arange(qv.shape[0])
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_train_step(
    mesh: Mesh | None,
    cfg: bert.BertConfig,
    optimizer: optax.GradientTransformation,
    *,
    temperature: float = 0.05,
):
    """Returns jitted step(params, opt_state, q_batch, d_batch) -> (p, s, loss).

    With a mesh, batches must be sharded along the ``data`` axis (leading
    dim divisible by its size); without one, the step is single-device.
    """

    if mesh is None:
        def step(params, opt_state, q_batch, d_batch):
            loss, grads = jax.value_and_grad(info_nce_loss)(
                params, q_batch, d_batch, cfg, temperature, None
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return jax.jit(step)

    def local_loss_and_grad(params, qi, qt, qm, di, dt, dm):
        loss, grads = jax.value_and_grad(info_nce_loss)(
            params, (qi, qt, qm), (di, dt, dm), cfg, temperature, AXIS_DATA
        )
        return (
            jax.lax.pmean(loss, AXIS_DATA),
            jax.lax.pmean(grads, AXIS_DATA),
        )

    sharded = jax.shard_map(
        local_loss_and_grad,
        mesh=mesh,
        in_specs=(
            P(),
            P(AXIS_DATA), P(AXIS_DATA), P(AXIS_DATA),
            P(AXIS_DATA), P(AXIS_DATA), P(AXIS_DATA),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(params, opt_state, q_batch, d_batch):
        loss, grads = sharded(params, *q_batch, *d_batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step)


def tokenize_pairs(
    tokenizer: Tokenizer,
    pairs: list[tuple[str, str]],
    *,
    max_len: int = 64,
) -> tuple[tuple[np.ndarray, ...], tuple[np.ndarray, ...]]:
    """(query, positive) pairs -> padded (q_batch, d_batch) arrays."""
    q_encs = [tokenizer.encode(q, max_len) for q, _ in pairs]
    d_encs = [tokenizer.encode(d, max_len) for _, d in pairs]
    return pad_batch(q_encs), pad_batch(d_encs)


def pairs_from_cache(cache, index, embedder, *, limit: int = 4096):
    """Training pairs from the serving log: cached query -> its top chunk.

    This is the closed loop the reference README sketches: production
    queries (with cached answers) become supervision for the retriever.
    """
    pairs: list[tuple[str, str]] = []
    for query, _answer in cache.export_pairs(limit):
        vec = embedder.encode([query])
        hits = index.search(vec, k=1)[0]
        if hits:
            pairs.append((query, hits[0]["text"]))
    return pairs


def train(
    params: dict,
    cfg: bert.BertConfig,
    pairs: list[tuple[str, str]],
    *,
    mesh: Mesh | None = None,
    tokenizer: Tokenizer | None = None,
    epochs: int = 1,
    batch_size: int = 32,
    lr: float = 2e-5,
    temperature: float = 0.05,
    seed: int = 0,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 100,
) -> tuple[dict, list[float]]:
    """Simple epoch loop with optional orbax checkpoint/resume.

    Returns (trained params, per-step losses).  With ``checkpoint_dir``,
    training resumes from the latest saved step and saves every
    ``checkpoint_every`` steps plus once at the end.
    """
    tok = tokenizer or Tokenizer()
    optimizer = optax.adamw(lr)
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
    step_fn = make_train_step(mesh, cfg, optimizer, temperature=temperature)

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
            q_batch, d_batch = tokenize_pairs(tok, chunk)
            if mesh is not None:
                shard = NamedSharding(mesh, P(AXIS_DATA))
                q_batch = tuple(jax.device_put(jnp.asarray(a), shard) for a in q_batch)
                d_batch = tuple(jax.device_put(jnp.asarray(a), shard) for a in d_batch)
            else:
                q_batch = tuple(jnp.asarray(a) for a in q_batch)
                d_batch = tuple(jnp.asarray(a) for a in d_batch)
            params, opt_state, loss = step_fn(params, opt_state, q_batch, d_batch)
            losses.append(float(loss))
            step_count += 1
            maybe_save()
    maybe_save(force=True)
    return params, losses
