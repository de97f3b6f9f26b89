"""Sharded fused two-stage query equals the single-device fused program."""

import numpy as np

import jax
import jax.numpy as jnp

from financial_rag_system_tpu.models import bert
from financial_rag_system_tpu.ops.fused_query import (
    fused_two_stage,
    make_sharded_fused_query,
)
from financial_rag_system_tpu.parallel.mesh import create_mesh

TINY_EMBED = bert.BertConfig(
    vocab_size=2048, hidden=32, layers=1, heads=2, intermediate=64,
    max_positions=64, with_pooler=True,
)
TINY_CROSS = bert.BertConfig(
    vocab_size=2048, hidden=32, layers=1, heads=2, intermediate=64,
    max_positions=128, with_pooler=True, num_labels=1,
)


def test_sharded_fused_matches_single():
    mesh = create_mesh()  # 8 devices on corpus
    k, tile, b, lq, dlen, d = 7, 64, 4, 16, 32, 32
    n = 8 * tile * 2  # 2 tiles per shard

    rng = np.random.default_rng(0)
    ep = bert.init_params(jax.random.PRNGKey(0), TINY_EMBED)
    rp = bert.init_params(jax.random.PRNGKey(1), TINY_CROSS)
    q_ids = jnp.asarray(rng.integers(103, 2000, (b, lq)), jnp.int32)
    q_types = jnp.zeros_like(q_ids)
    q_mask = jnp.ones_like(q_ids)
    qf = jnp.asarray(
        np.stack([rng.integers(0, 3, b), np.full(b, -1)], axis=1), jnp.int32
    )
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb_j = jnp.asarray(emb)
    codes = jnp.asarray(
        np.stack([rng.integers(0, 3, n), rng.integers(0, 2, n)]), jnp.int32
    )
    dtok = jnp.asarray(rng.integers(103, 2000, (n, dlen)), jnp.int32)
    n_valid = jnp.asarray(n - 37, jnp.int32)

    rows_1, bi_1, ce_1 = fused_two_stage(
        ep, rp, q_ids, q_types, q_mask, qf, emb_j, codes, dtok, n_valid,
        embed_cfg=TINY_EMBED, rerank_cfg=TINY_CROSS,
        k=k, tile=tile, use_pallas=False,
    )

    sharded = make_sharded_fused_query(
        mesh, TINY_EMBED, TINY_CROSS, k=k, tile=tile, use_pallas=False
    )
    rows_s, bi_s, ce_s = sharded(
        ep, rp, q_ids, q_types, q_mask, qf, emb_j, codes, dtok, n_valid
    )

    np.testing.assert_allclose(
        np.asarray(bi_s), np.asarray(bi_1), rtol=2e-3, atol=2e-3
    )
    # where bi gaps beat numeric noise, candidate sets and ce scores agree
    gap_ok = np.all(np.diff(np.asarray(bi_1), axis=1) < -5e-3, axis=1)
    np.testing.assert_array_equal(
        np.asarray(rows_s)[gap_ok], np.asarray(rows_1)[gap_ok]
    )
    np.testing.assert_allclose(
        np.asarray(ce_s)[gap_ok], np.asarray(ce_1)[gap_ok],
        rtol=2e-2, atol=2e-2,
    )
