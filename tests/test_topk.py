"""masked_topk: XLA reference vs numpy truth, and Pallas (interpret) parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from financial_rag_system_tpu.ops.topk import (
    masked_topk_pallas,
    masked_topk_xla,
)


def _make_case(rng, b=8, n=2048, d=128, n_valid=1900, n_tickers=3):
    q = rng.standard_normal((b, d)).astype(np.float32)
    c = rng.standard_normal((n, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    codes = np.stack(
        [
            rng.integers(0, n_tickers, n).astype(np.int32),
            rng.integers(0, 2, n).astype(np.int32),
        ]
    )
    codes[:, n_valid:] = -2  # padding sentinel
    qf = np.stack(
        [
            rng.integers(0, n_tickers, b).astype(np.int32),
            rng.choice([-1, 0, 1], b).astype(np.int32),  # -1 wildcard
        ],
        axis=1,
    )
    return q, c, codes, qf


def _numpy_truth(q, c, codes, qf, n_valid, k):
    scores = q @ c.T
    n = c.shape[0]
    tick_ok = (qf[:, 0:1] < 0) | (qf[:, 0:1] == codes[0][None, :])
    dt_ok = (qf[:, 1:2] < 0) | (qf[:, 1:2] == codes[1][None, :])
    valid = np.arange(n)[None, :] < n_valid
    scores = np.where(tick_ok & dt_ok & valid, scores, -np.inf)
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


@pytest.mark.parametrize("k", [5, 15])
def test_xla_matches_numpy(rng, k):
    q, c, codes, qf = _make_case(rng)
    s, i = masked_topk_xla(jnp.array(q), jnp.array(c), jnp.array(codes), jnp.array(qf), 1900, k)
    ts, ti = _numpy_truth(q, c, codes, qf, 1900, k)
    np.testing.assert_allclose(np.asarray(s), ts, rtol=1e-5, atol=1e-5)
    # indices may differ on exact ties; scores are the contract
    finite = np.isfinite(ts)
    got = np.asarray(s)
    np.testing.assert_array_equal(np.isfinite(got), finite)


def test_pallas_interpret_matches_xla(rng):
    k, tile = 15, 256
    q, c, codes, qf = _make_case(rng, b=8, n=1024, d=128, n_valid=1000)
    args = (jnp.array(q), jnp.array(c), jnp.array(codes), jnp.array(qf), 1000, k)
    s_ref, i_ref = masked_topk_xla(*args)
    s_pal, i_pal = masked_topk_pallas(*args, tile=tile, interpret=True)
    # CPU matmul precision differs slightly between interpret mode and XLA
    np.testing.assert_allclose(
        np.asarray(s_pal), np.asarray(s_ref), rtol=2e-3, atol=2e-3
    )
    # where score gaps exceed the numeric noise, indices must agree
    s_np = np.asarray(s_ref)
    no_tie = np.all(np.diff(s_np, axis=1) < -5e-3, axis=1)
    np.testing.assert_array_equal(
        np.asarray(i_pal)[no_tie], np.asarray(i_ref)[no_tie]
    )


def test_fewer_matches_than_k(rng):
    q, c, codes, qf = _make_case(rng, b=4, n=512, d=128, n_valid=512)
    # force a ticker that only 2 rows carry
    codes[0, :] = 0
    codes[0, 10] = 7
    codes[0, 20] = 7
    qf[:, 0] = 7
    qf[:, 1] = -1
    s, i = masked_topk_xla(
        jnp.array(q), jnp.array(c), jnp.array(codes), jnp.array(qf), 512, 5
    )
    s = np.asarray(s)
    assert np.all(np.isfinite(s[:, :2]))
    assert np.all(np.isneginf(s[:, 2:]))
    assert set(np.asarray(i)[:, :2].ravel()) == {10, 20}
