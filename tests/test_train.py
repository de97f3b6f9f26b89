"""Contrastive trainer: loss decreases; mesh step matches single-device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from financial_rag_system_tpu.models import bert
from financial_rag_system_tpu.models.tokenizer import Tokenizer
from financial_rag_system_tpu.parallel.mesh import create_mesh
from financial_rag_system_tpu.train.contrastive import (
    make_train_step,
    tokenize_pairs,
    train,
)

TINY = bert.BertConfig(
    vocab_size=512, hidden=32, layers=2, heads=2, intermediate=64,
    max_positions=64,
)

PAIRS = [
    ("apple revenue quarter", "apple reported quarterly revenue of 90 billion"),
    ("microsoft cloud growth", "microsoft azure cloud grew 24 percent"),
    ("tesla vehicle deliveries", "tesla delivered 400 thousand vehicles"),
    ("nvidia data center", "nvidia data center revenue tripled"),
    ("google ad sales", "google advertising sales were strong"),
    ("amazon retail margin", "amazon retail operating margin improved"),
    ("meta user count", "meta daily active users increased"),
    ("jpm interest income", "jpmorgan net interest income rose"),
] * 2


def _norm_ids(pairs):
    # remap hash ids into the tiny vocab for a fast test model
    tok = Tokenizer()
    q_b, d_b = tokenize_pairs(tok, pairs, max_len=16)
    q_b = (q_b[0] % 512, q_b[1], q_b[2])
    d_b = (d_b[0] % 512, d_b[1], d_b[2])
    return q_b, d_b


def test_loss_decreases_single_device():
    params = bert.init_params(jax.random.PRNGKey(0), TINY)
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(None, TINY, optimizer)
    q_b, d_b = _norm_ids(PAIRS)
    q_b = tuple(jnp.asarray(a) for a in q_b)
    d_b = tuple(jnp.asarray(a) for a in d_b)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, q_b, d_b)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_mesh_step_matches_single_device():
    mesh = create_mesh("data:8,corpus:1")
    params = bert.init_params(jax.random.PRNGKey(0), TINY)
    optimizer = optax.adamw(1e-3)

    q_b, d_b = _norm_ids(PAIRS)  # batch 16, divisible by 8
    q_j = tuple(jnp.asarray(a) for a in q_b)
    d_j = tuple(jnp.asarray(a) for a in d_b)

    s_single = make_train_step(None, TINY, optimizer)
    s_mesh = make_train_step(mesh, TINY, optimizer)

    p1, o1 = params, optimizer.init(params)
    p2, o2 = params, optimizer.init(params)
    for _ in range(3):
        p1, o1, l1 = s_single(p1, o1, q_j, d_j)
        p2, o2, l2 = s_mesh(p2, o2, q_j, d_j)
        # cross-device in-batch negatives reconstruct the same global loss
        np.testing.assert_allclose(float(l1), float(l2), rtol=2e-3, atol=2e-3)
    # params track closely; bf16 reduction-order noise through AdamW means
    # bitwise equality is not expected
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        a, b = np.asarray(a), np.asarray(b)
        assert np.max(np.abs(a - b)) < 5e-2
        # direction agreement for leaves with real magnitude (near-zero
        # bias vectors have meaningless cosine)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na > 0.5 and nb > 0.5:
            assert (a.ravel() @ b.ravel()) / (na * nb) > 0.995


def test_train_helper_runs():
    params = bert.init_params(jax.random.PRNGKey(0), TINY)
    # hash ids exceed tiny vocab; use full-size ids with a full vocab model
    cfg = bert.BertConfig(
        vocab_size=30522, hidden=32, layers=1, heads=2, intermediate=64,
        max_positions=64,
    )
    params = bert.init_params(jax.random.PRNGKey(0), cfg)
    trained, losses = train(
        params, cfg, PAIRS, epochs=2, batch_size=8, lr=1e-3
    )
    assert len(losses) == 4
    assert losses[-1] < losses[0]


def test_checkpoint_resume(tmp_path):
    from financial_rag_system_tpu.train.checkpoint import latest_step

    cfg = bert.BertConfig(
        vocab_size=30522, hidden=32, layers=1, heads=2, intermediate=64,
        max_positions=64,
    )
    params = bert.init_params(jax.random.PRNGKey(0), cfg)
    ck = str(tmp_path / "ckpt")
    p1, losses1 = train(
        params, cfg, PAIRS, epochs=1, batch_size=8, lr=1e-3,
        checkpoint_dir=ck, checkpoint_every=1,
    )
    assert latest_step(ck) == len(losses1)
    # resume: picks up the latest step's params (loss continues dropping)
    p2, losses2 = train(
        params, cfg, PAIRS, epochs=1, batch_size=8, lr=1e-3,
        checkpoint_dir=ck, checkpoint_every=1000,
    )
    assert losses2[0] < losses1[0] + 0.1  # resumed from trained state
    assert latest_step(ck) >= len(losses1)


TRIPLES = [
    (q, d, PAIRS[(i + 3) % len(PAIRS)][1]) for i, (q, d) in enumerate(PAIRS)
]


def _norm_triple_ids(triples):
    tok = Tokenizer()
    q_b, d_b, n_b = tokenize_pairs(tok, triples, max_len=16)
    f = lambda b: (b[0] % 512, b[1], b[2])
    return f(q_b), f(d_b), f(n_b)


def test_hard_negative_loss_decreases_and_separates():
    params = bert.init_params(jax.random.PRNGKey(0), TINY)
    optimizer = optax.adamw(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(None, TINY, optimizer, hard_negatives=True)
    q_b, d_b, n_b = _norm_triple_ids(TRIPLES)
    q_b, d_b, n_b = (tuple(jnp.asarray(a) for a in b) for b in (q_b, d_b, n_b))
    losses = []
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, q_b, d_b, n_b)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # after training, each query scores its positive above its explicit
    # hard negative (the whole point of the triple supervision)
    from financial_rag_system_tpu.train.contrastive import _embed

    qv = np.asarray(_embed(params, *q_b, TINY))
    dv = np.asarray(_embed(params, *d_b, TINY))
    nv = np.asarray(_embed(params, *n_b, TINY))
    pos = (qv * dv).sum(-1)
    neg = (qv * nv).sum(-1)
    assert (pos > neg).mean() >= 0.9


def test_mesh_triples_step_matches_single_device():
    mesh = create_mesh("data:8,corpus:1")
    params = bert.init_params(jax.random.PRNGKey(0), TINY)
    optimizer = optax.adamw(1e-3)
    q_b, d_b, n_b = _norm_triple_ids(TRIPLES)  # batch 16, divisible by 8
    q_j, d_j, n_j = (tuple(jnp.asarray(a) for a in b) for b in (q_b, d_b, n_b))

    s_single = make_train_step(None, TINY, optimizer, hard_negatives=True)
    s_mesh = make_train_step(mesh, TINY, optimizer, hard_negatives=True)
    p1, o1 = params, optimizer.init(params)
    p2, o2 = params, optimizer.init(params)
    for _ in range(3):
        p1, o1, l1 = s_single(p1, o1, q_j, d_j, n_j)
        p2, o2, l2 = s_mesh(p2, o2, q_j, d_j, n_j)
        # gathered negatives reconstruct the same global candidate pool
        np.testing.assert_allclose(float(l1), float(l2), rtol=2e-3, atol=2e-3)


def test_train_helper_accepts_triples():
    cfg = bert.BertConfig(
        vocab_size=30522, hidden=32, layers=1, heads=2, intermediate=64,
        max_positions=64,
    )
    params = bert.init_params(jax.random.PRNGKey(0), cfg)
    trained, losses = train(
        params, cfg, TRIPLES, epochs=2, batch_size=8, lr=1e-3
    )
    assert len(losses) == 4
    assert losses[-1] < losses[0]


def test_pairs_from_cache_closed_loop(tmp_path):
    """The serve->log->train loop the reference only sketches
    (reference README.md:41): cached production queries become
    (query, retrieved-top-chunk) supervision for the retriever."""
    from financial_rag_system_tpu.index.flat import FlatIndex
    from financial_rag_system_tpu.models.embedder import HashEmbedder
    from financial_rag_system_tpu.serving.cache import CacheDB
    from financial_rag_system_tpu.train.contrastive import pairs_from_cache

    emb = HashEmbedder()
    index = FlatIndex(dim=emb.dim, capacity=128, tile=128, use_pallas=False)
    texts = [
        "revenue grew twelve percent on services strength",
        "litigation reserves increased after the consent decree",
    ]
    index.upsert(
        ["a", "b"], emb.encode(texts), texts,
        [{"ticker": "AAPL", "document_type": "10-K"}] * 2,
    )
    db = CacheDB(str(tmp_path / "c.db"))
    db.save("h1", "AAPL", "how fast did revenue grow", "cached answer 1")
    db.save("h2", "AAPL", "what legal reserves exist", "cached answer 2")
    pairs = pairs_from_cache(db, index, emb)
    assert len(pairs) == 2
    by_q = dict(pairs)
    # each logged query pairs with its own top retrieved chunk
    assert by_q["how fast did revenue grow"] == texts[0]
    assert by_q["what legal reserves exist"] == texts[1]

    # feedback gates the loop: a net-downvoted answer means the
    # retrieval that produced it is not trustworthy supervision
    db.add_feedback("h2", -1)
    assert [q for q, _ in pairs_from_cache(db, index, emb)] == [
        "how fast did revenue grow"
    ]
    # an upvote restores it to net 0 (kept by the default min_rating=0)
    db.add_feedback("h2", 1)
    assert len(pairs_from_cache(db, index, emb)) == 2
    # min_rating=1 keeps explicitly-approved traffic only
    db.add_feedback("h1", 1)
    assert [q for q, _ in pairs_from_cache(db, index, emb, min_rating=1)] == [
        "how fast did revenue grow"
    ]
    rated = {q: net for q, _r, net in db.export_rated_pairs()}
    assert rated == {
        "how fast did revenue grow": 1, "what legal reserves exist": 0,
    }
    db.close()


def test_distill_margins_move_toward_teacher():
    """Margin-MSE distillation: the student's pairwise margins move
    toward the teacher's, and the loss decreases."""
    from financial_rag_system_tpu.train.distill import (
        distill,
        teacher_margins,
    )

    # full hash-vocab ids (distill tokenizes internally, no remap hook)
    cfg = bert.BertConfig(
        vocab_size=30522, hidden=32, layers=2, heads=2, intermediate=64,
        max_positions=64,
    )
    ce_cfg = bert.BertConfig(
        vocab_size=30522, hidden=32, layers=2, heads=2, intermediate=64,
        max_positions=64, with_pooler=True, num_labels=1,
    )
    rng = jax.random.PRNGKey(0)
    bi = bert.init_params(rng, cfg)
    ce = bert.init_params(jax.random.PRNGKey(1), ce_cfg)
    triples = [
        (q, p, PAIRS[(i + 3) % len(PAIRS)][1])
        for i, (q, p) in enumerate(PAIRS)
    ]
    tok = Tokenizer()
    m = teacher_margins(ce, ce_cfg, triples, tokenizer=tok, max_len=32)
    assert m.shape == (len(triples),)
    assert np.all(np.isfinite(m))
    out, losses = distill(
        bi, cfg, ce, ce_cfg, triples,
        tokenizer=tok, steps=12, batch_size=8, lr=1e-3,
        max_len=16, teacher_max_len=32,
    )
    assert losses[-1] < losses[0]
    # params actually moved
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(bi), jax.tree_util.tree_leaves(out)
        )
    )
    assert moved
