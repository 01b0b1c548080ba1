"""Fused pallas clue x frame attention vs the unfused flax reference path
(TorchMHA + LayerNorm applied spatially then temporally with shared
weights, models/heads.py STQIHead steps (a)-(b))."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from mcgaze_tpu.models.heads import TorchMHA
from mcgaze_tpu.ops.stqi_attention import fused_stqi_attention

B, T, Q, C, H = 3, 7, 3, 256, 8


class UnfusedRef(nn.Module):
    @nn.compact
    def __call__(self, query, t):
        n, nq, c = query.shape
        b = n // t
        attn = TorchMHA(C, H, name='attention')
        norm = nn.LayerNorm(name='attention_norm')
        x = norm(attn(query))
        x = x.reshape(b, t, nq, c).transpose(0, 2, 1, 3).reshape(b * nq, t, c)
        x = norm(attn(x))
        return x.reshape(b, nq, t, c).transpose(0, 2, 1, 3).reshape(n, nq, c)


@pytest.fixture(scope='module')
def weights():
    rng = np.random.RandomState(0)
    model = UnfusedRef()
    query = jnp.asarray(rng.randn(B * T, Q, C).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), query, T)
    return model, variables, query


def run_fused(variables, query, interpret=True):
    p = variables['params']
    return fused_stqi_attention(
        query,
        p['attention']['qkv']['kernel'], p['attention']['qkv']['bias'],
        p['attention']['out']['kernel'], p['attention']['out']['bias'],
        p['attention_norm']['scale'], p['attention_norm']['bias'],
        clip_length=T, heads=H, interpret=interpret)


def test_fused_matches_unfused(weights):
    model, variables, query = weights
    ref = model.apply(variables, query, T)
    out = run_fused(variables, query)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_stqi_head_fused_flag_same_tree_and_output():
    """STQIHead(fused_attention=True) has the identical param tree AND
    identical init values (same per-path RNG folds) as the unfused head,
    and produces the same forward output."""
    from mcgaze_tpu.models.heads import STQIHead
    rng = np.random.RandomState(4)
    roi = jnp.asarray(rng.randn(B * T * Q, 7, 7, C).astype(np.float32))
    query = jnp.asarray(rng.randn(B * T, Q, C).astype(np.float32))
    h0 = STQIHead(fused_attention=False)
    h1 = STQIHead(fused_attention=True)
    v0 = h0.init(jax.random.PRNGKey(7), roi, query, T)
    v1 = h1.init(jax.random.PRNGKey(7), roi, query, T)
    p0 = jax.tree_util.tree_leaves_with_path(v0)
    p1 = jax.tree_util.tree_leaves_with_path(v1)
    assert [jax.tree_util.keystr(p) for p, _ in p0] == \
        [jax.tree_util.keystr(p) for p, _ in p1]
    for (pa, la), (_, lb) in zip(p0, p1):
        np.testing.assert_allclose(la, lb, err_msg=jax.tree_util.keystr(pa))
    o0 = h0.apply(v0, roi, query, T)
    o1 = h1.apply(v0, roi, query, T)
    for a, b_ in zip(o0, o1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5)


def test_fused_batch_independence(weights):
    """Clips must not attend across clip boundaries: permuting other clips
    leaves clip 0's output unchanged."""
    model, variables, query = weights
    out1 = np.asarray(run_fused(variables, query))
    q2 = jnp.concatenate([query[:T], query[2 * T:], query[T:2 * T]])
    out2 = np.asarray(run_fused(variables, q2))
    np.testing.assert_allclose(out2[:T], out1[:T], atol=1e-6)
    np.testing.assert_allclose(out2[T:2 * T], out1[2 * T:], atol=1e-6)
