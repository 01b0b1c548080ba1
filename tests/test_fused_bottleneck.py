"""Fused bottleneck-chain kernel (ops/fused_bottleneck.py): parity vs the
flax Bottleneck stack (reference resnet.py semantics), gradients of the
custom_vjp wrapper, and param-tree equality of the fused vs plain ResNet.

On a real chip the kernel measured SLOWER than XLA's convs at R50 eval
shapes (64-wide ops pad to 128 MXU lanes), so it ships opt-in
(ModelConfig.backbone_impl='fused'); these tests pin its correctness.
"""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mcgaze_tpu.models.resnet import Bottleneck, ResNet
from mcgaze_tpu.ops.fused_bottleneck import (chain_reference,
                                             fold_block_params,
                                             fused_bottleneck_chain,
                                             fused_bottleneck_chain_diff)

H = W = 8
CIN, MID = 16, 8
COUT = MID * 4
N = 2


class Chain(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = Bottleneck(MID, name='b0')(x)   # has downsample (16 -> 32)
        x = Bottleneck(MID, name='b1')(x)
        return x


def _bn_fold(p, s):
    inv = p['scale'] * jax.lax.rsqrt(s['var'] + 1e-5)
    return inv, p['bias'] - s['mean'] * inv


def _setup():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, W, CIN).astype(np.float32))
    m = Chain()
    variables = m.init(jax.random.PRNGKey(0), x)
    # randomized BN stats make the folding non-trivial
    stats = jax.tree.map(lambda a: jnp.asarray(
        rng.rand(*a.shape).astype(np.float32) + 0.5), variables['stats'])
    params = jax.tree.map(lambda a: jnp.asarray(
        rng.randn(*a.shape).astype(np.float32) * 0.2), variables['params'])
    variables = {'params': params, 'stats': stats}

    weights = []
    for b in ('b0', 'b1'):
        pp, ss = params[b], stats[b]
        args = [pp['conv1']['kernel'], _bn_fold(pp['bn1'], ss['bn1']),
                pp['conv2']['kernel'], _bn_fold(pp['bn2'], ss['bn2']),
                pp['conv3']['kernel'], _bn_fold(pp['bn3'], ss['bn3'])]
        if 'downsample_conv' in pp:
            args += [pp['downsample_conv']['kernel'],
                     _bn_fold(pp['downsample_bn'], ss['downsample_bn'])]
        weights.extend(fold_block_params(*args, dtype=jnp.float32))
    return m, variables, x, tuple(weights)


def test_chain_matches_flax_blocks():
    m, variables, x, weights = _setup()
    ref = m.apply(variables, x)
    xf = x.reshape(N, H * W, CIN)
    got_ref = chain_reference(xf, weights, H, W).reshape(N, H, W, COUT)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got_ref),
                               rtol=1e-5, atol=2e-5)
    got = fused_bottleneck_chain(xf, weights, H, W,
                                 interpret=True).reshape(N, H, W, COUT)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=1e-5, atol=2e-5)


def test_diff_wrapper_grads_match_reference():
    import mcgaze_tpu.ops.fused_bottleneck as mod
    from functools import partial

    _, _, x, weights = _setup()
    xf = x.reshape(N, H * W, CIN)

    orig = mod.fused_bottleneck_chain
    mod.fused_bottleneck_chain = partial(orig, interpret=True)
    try:
        g = jax.grad(lambda xx: (fused_bottleneck_chain_diff(
            xx, weights, H, W) ** 2).sum())(xf)
    finally:
        mod.fused_bottleneck_chain = orig
    g_ref = jax.grad(lambda xx: (chain_reference(
        xx, weights, H, W) ** 2).sum())(xf)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_resnet_has_identical_param_tree():
    """backbone_impl='fused' must produce the exact same variables tree
    as the plain path (checkpoints interchange freely). eval_shape
    traces the fused path without executing pallas on CPU."""
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    plain = ResNet(26, fused_blocks=False)
    fused = ResNet(26, fused_blocks=True)
    v_plain = plain.init(jax.random.PRNGKey(0), x)
    v_fused = jax.eval_shape(fused.init, jax.random.PRNGKey(0), x)
    p1 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v_plain)
    p2 = jax.tree.map(lambda a: (a.shape, str(a.dtype)), v_fused)
    assert jax.tree_util.tree_structure(p1) == \
        jax.tree_util.tree_structure(p2)
    assert jax.tree.leaves(p1) == jax.tree.leaves(p2)
