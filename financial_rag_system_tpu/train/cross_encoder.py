"""Cross-encoder (reranker) fine-tuning: pointwise BCE over labeled pairs.

The reference's second stage is a pretrained ms-marco MiniLM cross
encoder (reference main.py:86-90).  With no model egress, this module
trains the same ARCHITECTURE from random init on first-party
supervision: for every (ticker, intent, paraphrase) the intent's
positive chunk is a 1-label pair and the intent's lexical BAIT chunks —
written to share the query's surface words while never containing the
scoring keywords (data/synthetic.py HARD_INTENTS) — are hard 0-label
negatives, plus seeded filler distractors.  The eval queries
(make_hard_set) are never seen; hard-mode rerank lift is
generalization, same leak discipline as the bi-encoder trainer
(train/contrastive.py, tests/test_hard_eval.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from financial_rag_system_tpu.models import bert
from financial_rag_system_tpu.models.tokenizer import Tokenizer, pad_batch


def make_cross_examples(
    tickers: list[str] | None = None,
    *,
    fillers_per_intent: int = 2,
    seed: int = 0,
    chunk_chars: int | None = None,
) -> list[tuple[str, str, float]]:
    """(query, chunk, label) triples from the paraphrase supervision.

    ``chunk_chars`` pads every chunk with the corpus builders' boilerplate
    (data/synthetic.py expand_chunk) so the reranker trains at the pair
    lengths it will score at serving time."""
    import random

    from financial_rag_system_tpu.data.synthetic import (
        _COMPANY,
        _TICKERS,
        _distractor,
        expand_chunk,
        AAPL_TOPICS,
        EASY_TRAIN_PARAPHRASES,
        HARD_INTENTS,
        TRAIN_PARAPHRASES,
    )

    rng = random.Random(seed)
    tickers = tickers or _TICKERS
    ex = lambda s: expand_chunk(s, chunk_chars)  # noqa: E731
    out: list[tuple[str, str, float]] = []
    for t in tickers:
        company = _COMPANY[t]
        for intent in HARD_INTENTS:
            pos = ex(intent["positive"].format(company=company))
            baits = [ex(b.format(company=company)) for b in intent["baits"]]
            for q in TRAIN_PARAPHRASES[intent["name"]]:
                query = q.format(company=company)
                out.append((query, pos, 1.0))
                for b in baits:
                    out.append((query, b, 0.0))
                for j in range(fillers_per_intent):
                    out.append(
                        (query,
                         ex(_distractor(rng, t, rng.randrange(1 << 30))),
                         0.0)
                    )
        # easy golden-set domains: positive = the parity-topic paragraph,
        # negatives = fillers AND the other topics' paragraphs (the easy
        # corpus's natural confusables) — same leak discipline, checked
        # by tests/test_hard_eval.py::test_easy_train_paraphrases_no_leakage
        for name, qs in EASY_TRAIN_PARAPHRASES.items():
            pos = ex(AAPL_TOPICS[name])
            others = [ex(v) for k, v in AAPL_TOPICS.items() if k != name]
            for q in qs:
                query = q.format(company=company)
                out.append((query, pos, 1.0))
                out.append((query, rng.choice(others), 0.0))
                out.append(
                    (query,
                     ex(_distractor(rng, t, rng.randrange(1 << 30))), 0.0)
                )
    return out


def make_cross_step(cfg: bert.BertConfig, optimizer, *, pos_weight: float = 1.0):
    """jitted step(params, opt_state, ids, types, mask, labels).

    ``pos_weight`` rebalances the heavy negative skew (each positive pair
    ships with several bait + filler negatives) so the model can't sit at
    the base rate."""

    def loss_fn(params, ids, types, mask, labels):
        logits = bert.cross_score(params, ids, types, mask, cfg)
        per = optax.sigmoid_binary_cross_entropy(logits, labels)
        w = jnp.where(labels > 0.5, pos_weight, 1.0)
        return jnp.sum(per * w) / jnp.sum(w)

    def step(params, opt_state, ids, types, mask, labels):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, ids, types, mask, labels
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(step)


def train_cross_encoder(
    params: dict,
    cfg: bert.BertConfig,
    examples: list[tuple[str, str, float]],
    *,
    tokenizer: Tokenizer | None = None,
    epochs: int = 1,
    batch_size: int = 32,
    lr: float = 5e-5,
    max_len: int = 128,
    seed: int = 0,
) -> tuple[dict, list[float]]:
    """Returns (trained params, per-step losses)."""
    tok = tokenizer or Tokenizer()
    # global-norm clipping: at this lr the pointwise BCE run is
    # trajectory-sensitive — an unlucky shuffle order can diverge
    # (measured: loss 0.69 -> 0.84 on one supervision size, 0.69 -> 0.15
    # on another); clipping makes convergence order-insensitive
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(lr))
    opt_state = optimizer.init(params)
    n_pos = sum(1 for _, _, lbl in examples if lbl > 0.5) or 1
    pos_weight = max(1.0, (len(examples) - n_pos) / n_pos)
    step_fn = make_cross_step(cfg, optimizer, pos_weight=pos_weight)
    rng = np.random.default_rng(seed)
    losses: list[float] = []
    for _ in range(epochs):
        order = rng.permutation(len(examples))
        for s in range(0, len(examples) - batch_size + 1, batch_size):
            chunk = [examples[i] for i in order[s : s + batch_size]]
            encs = [tok.encode_pair(q, d, max_len) for q, d, _ in chunk]
            ids, types, mask = pad_batch(encs)
            labels = np.zeros(ids.shape[0], np.float32)
            labels[: len(chunk)] = [lbl for _, _, lbl in chunk]
            params, opt_state, loss = step_fn(
                params, opt_state, jnp.asarray(ids), jnp.asarray(types),
                jnp.asarray(mask), jnp.asarray(labels),
            )
            losses.append(float(loss))
    return params, losses
