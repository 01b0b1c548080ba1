"""MsgShifT backbone: pyramid contract, messenger-shift semantics, the
summed-kernel identity, and the temporal information path.

Reference: mmdet/models/backbones/msgshift.py (see module docstring of
mcgaze_tpu/models/msgshift.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcgaze_tpu.models.msgshift import (MsgShifT, PatchEmbed,
                                        shift_msg_tokens)


@pytest.fixture(scope='module')
def small_vars():
    m = MsgShifT()
    x = jnp.zeros((2, 64, 96, 3), jnp.float32)
    v = jax.jit(m.init, static_argnames='clip_length')(
        jax.random.PRNGKey(0), x, clip_length=1)
    # jitted apply: ONE cached XLA program per input shape instead of
    # hundreds of eager op-by-op dispatch compiles (was ~25s/test)
    fwd = jax.jit(m.apply, static_argnames='clip_length')
    return m, v, fwd


def test_pyramid_shapes_and_channels(small_vars):
    m, v, fwd = small_vars
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 96, 3),
                    jnp.float32)
    outs = fwd(v, x, clip_length=1)
    assert [o.shape for o in outs] == [
        (2, 16, 24, 64), (2, 8, 12, 128), (2, 4, 6, 320), (2, 2, 3, 512)]
    assert all(bool(jnp.isfinite(o).all()) for o in outs)


def test_shift_msg_tokens_roll_semantics():
    """Groups roll along T by their stride (msgshift.py:436-440)."""
    b, t, m, c = 2, 4, 8, 3
    msg = np.arange(b * t * m * c, dtype=np.float32).reshape(b * t, m, c)
    out = np.asarray(shift_msg_tokens(jnp.asarray(msg), t, (1, -1, 2, -2)))
    ref = msg.reshape(b, t, 4, m // 4, c)
    want = np.stack([np.roll(ref[:, :, g], s, axis=1)
                     for g, s in enumerate((1, -1, 2, -2))], axis=2)
    np.testing.assert_array_equal(out, want.reshape(b * t, m, c))


def test_patch_embed_summed_kernel_identity():
    """The messenger path through a patch embed equals running its conv
    on a constant kxk patch holding the token (msgshift.py:142's einsum
    with weight.sum((-1,-2)) is exactly that sum)."""
    pe = PatchEmbed(embed_dim=16, patch=3, stride=2, pad=1)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    msg = jnp.asarray(np.random.RandomState(0).randn(1, 2, 3), jnp.float32)
    v = pe.init(jax.random.PRNGKey(1), x, msg)
    _x, _hw, msg_out = pe.apply(v, x, msg)

    kernel = v['params']['proj']['kernel']    # (3, 3, 3, 16)
    bias = v['params']['proj']['bias']
    for ti in range(2):
        # conv(constant 3x3 patch = token) with VALID padding
        patch = jnp.broadcast_to(msg[0, ti][None, None, None, :],
                                 (1, 3, 3, 3))
        conv = jax.lax.conv_general_dilated(
            patch, kernel, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))[0, 0, 0] + bias
        # compare pre-LayerNorm: re-derive from the module's formula
        want = msg[0, ti] @ kernel.sum((0, 1)) + bias
        np.testing.assert_allclose(np.asarray(conv), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
    assert msg_out.shape == (1, 2, 16)


def test_messengers_carry_cross_frame_information(small_vars):
    """Perturbing frame 0 must change frame 1's features (the messenger
    shift is the only cross-frame path) — and must NOT leak across clips
    in the same batch."""
    m, v, fwd = small_vars
    rng = np.random.RandomState(0)
    base = rng.randn(4, 64, 96, 3).astype(np.float32)  # B=2 clips, T=2
    pert = base.copy()
    pert[0] += 1.0                                     # clip 0, frame 0
    out_a = fwd(v, jnp.asarray(base), clip_length=2)
    out_b = fwd(v, jnp.asarray(pert), clip_length=2)
    d = np.abs(np.asarray(out_a[-1]) - np.asarray(out_b[-1]))
    assert d[0].max() > 0          # the perturbed frame itself
    assert d[1].max() > 1e-6       # same clip, other frame: via messengers
    assert d[2].max() == 0         # other clip: untouched
    assert d[3].max() == 0


def test_clip_length_one_is_frame_independent(small_vars):
    """With T=1 every roll is identity: two frames processed as separate
    clips equal the same frames processed batched."""
    m, v, fwd = small_vars
    rng = np.random.RandomState(1)
    x = rng.randn(2, 64, 96, 3).astype(np.float32)
    both = fwd(v, jnp.asarray(x), clip_length=1)
    one = fwd(v, jnp.asarray(x[:1]), clip_length=1)
    np.testing.assert_allclose(np.asarray(both[-1][:1]),
                               np.asarray(one[-1]), rtol=2e-5, atol=2e-5)


def test_drop_path_eval_unchanged_and_train_active(small_vars):
    """DropPath (reference msgshift.py:408,420,581,638): rate>0 must not
    change the param tree or the deterministic (eval) forward; with
    deterministic=False + a 'droppath' RNG the forward differs and stays
    finite; rate 0 in train mode equals eval."""
    m, v, fwd = small_vars
    md = MsgShifT(drop_path_rate=0.1)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 64, 96, 3),
                    jnp.float32)

    # identical param tree: the eval variables load as-is
    vd = jax.jit(md.init, static_argnames='clip_length')(
        jax.random.PRNGKey(0), x, clip_length=1)
    assert jax.tree.structure(vd) == jax.tree.structure(v)

    base = fwd(v, x, clip_length=2)
    fwd_d = jax.jit(md.apply,
                    static_argnames=('clip_length', 'deterministic'))
    evald = fwd_d(v, x, clip_length=2, deterministic=True)
    for a, b in zip(base, evald):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    trained = jax.jit(
        md.apply, static_argnames=('clip_length', 'deterministic'))(
            v, x, clip_length=2, deterministic=False,
            rngs={'droppath': jax.random.PRNGKey(7)})
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(base, trained)]
    assert max(diffs) > 1e-3, diffs            # some branch was dropped
    assert all(np.isfinite(np.asarray(t)).all() for t in trained)

    # rate 0 in train mode is exactly eval (layer 0's ramp rate is 0
    # even at rate>0 — torch.linspace starts at 0)
    m0 = MsgShifT(drop_path_rate=0.0)
    t0 = jax.jit(m0.apply,
                 static_argnames=('clip_length', 'deterministic'))(
                     v, x, clip_length=2, deterministic=False)
    for a, b in zip(base, t0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
