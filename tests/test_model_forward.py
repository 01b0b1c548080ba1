"""End-to-end model wiring tests (tiny shapes, CPU) + head parity goldens
against torch modules (attention vs torch.nn.MultiheadAttention as consumed
through mmcv's residual wrapper in gaze_stqi_head.py:51,151)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mcgaze_tpu.models.heads import TorchMHA
from mcgaze_tpu.models.mcgaze import MCGazeModel, ModelConfig, init_model


@pytest.fixture(scope='module')
def tiny_model():
    cfg = ModelConfig(clip_length=7)
    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  image_size=(64, 64))
    # shared jitted apply: eager op-by-op dispatch of the full model cost
    # ~6s PER test on this box; the compiled version persists in the
    # compile cache across runs
    apply = jax.jit(model.apply)
    return cfg, model, variables, apply


def test_forward_shapes_and_unit_gazes(tiny_model):
    cfg, model, variables, apply = tiny_model
    n = cfg.clip_length
    imgs = jax.random.normal(jax.random.PRNGKey(1), (n, 64, 64, 3))
    whwh = jnp.tile(jnp.asarray([[64., 64., 64., 64.]]), (n, 1))
    out = apply(variables, imgs, whwh)
    assert len(out['stages']) == 4
    last = out['stages'][-1]
    assert last['cls_logits'].shape == (n, 3, 1)
    assert last['boxes'].shape == (n, 3, 4)
    for k in ('fusion', 'face', 'eyes', 'head'):
        g = np.asarray(last['gaze'][k])
        assert g.shape == (n, 3)
        np.testing.assert_allclose(np.linalg.norm(g, axis=-1), 1.0, atol=1e-5)


def test_stages_differ_and_boxes_refine(tiny_model):
    cfg, model, variables, apply = tiny_model
    n = cfg.clip_length
    imgs = jax.random.normal(jax.random.PRNGKey(2), (n, 64, 64, 3))
    whwh = jnp.tile(jnp.asarray([[64., 64., 64., 64.]]), (n, 1))
    out = apply(variables, imgs, whwh)
    b0 = np.asarray(out['stages'][0]['boxes'])
    b3 = np.asarray(out['stages'][-1]['boxes'])
    assert not np.allclose(b0, b3)


def test_mha_matches_torch():
    e, h, b, s = 32, 4, 6, 3
    torch.manual_seed(0)
    ref = torch.nn.MultiheadAttention(e, h, dropout=0.0)
    x = torch.randn(s, b, e)
    with torch.no_grad():
        out_ref, _ = ref(x, x, x)
    out_ref = (x + out_ref).permute(1, 0, 2).numpy()  # mmcv adds residual

    mod = TorchMHA(e, h)
    params = {
        'params': {
            'qkv': {
                'kernel': jnp.asarray(
                    ref.in_proj_weight.detach().numpy().T),
                'bias': jnp.asarray(ref.in_proj_bias.detach().numpy()),
            },
            'out': {
                'kernel': jnp.asarray(
                    ref.out_proj.weight.detach().numpy().T),
                'bias': jnp.asarray(ref.out_proj.bias.detach().numpy()),
            },
        }
    }
    ours = mod.apply(params, jnp.asarray(x.permute(1, 0, 2).numpy()))
    np.testing.assert_allclose(np.asarray(ours), out_ref, rtol=1e-4,
                               atol=1e-5)


def test_gradients_reach_all_stages():
    # R26 + 2 stages + slim FFN: the "every stage head gets gradient"
    # property is per-stage wiring (the stages are structurally identical
    # modules chained through stop_gradient'ed boxes), and the full-R50
    # 4-stage grad compile was ~65s of suite wall time on this 1-core box
    cfg = ModelConfig(clip_length=7, backbone_depth=26, num_stages=2,
                      stage_loss_weights=(1.0, 1.0), ffn_channels=256)
    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  image_size=(32, 32))
    n = cfg.clip_length
    imgs = jax.random.normal(jax.random.PRNGKey(3), (n, 32, 32, 3))
    whwh = jnp.tile(jnp.asarray([[32., 32., 32., 32.]]), (n, 1))

    def loss_fn(params):
        out = model.apply({'params': params, 'stats': variables['stats']},
                          imgs, whwh)
        total = 0.
        for s in out['stages']:
            total += jnp.sum(jnp.abs(s['cls_logits']))
            total += jnp.sum(jnp.abs(s['boxes'])) * 1e-3
            total += jnp.sum(jnp.abs(s['gaze']['fusion']))
        return total

    # jit the grad: eager op-by-op dispatch took ~45s on this box, and
    # the compiled version lands in the persistent cache across runs
    grads = jax.jit(jax.grad(loss_fn))(variables['params'])
    flat = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.abs(g).sum()),
                                        grads))
    # every stage head must receive gradient (the reference needed
    # find_unused_parameters=True; here all branches contribute)
    zero_frac = sum(1 for v in flat if v == 0.0) / len(flat)
    assert zero_frac < 0.05, f'{zero_frac:.2%} of params got zero grads'


def test_split_methods_match_call(tiny_model):
    """extract_features + run_heads must equal __call__ (the dedup eval
    path composes them around a frame gather)."""
    cfg, model, variables, apply = tiny_model
    n = cfg.clip_length
    imgs = jax.random.normal(jax.random.PRNGKey(5), (n, 64, 64, 3))
    whwh = jnp.tile(jnp.asarray([[64., 64., 64., 64.]]), (n, 1))
    ref = apply(variables, imgs, whwh)
    from mcgaze_tpu.models.mcgaze import MCGazeModel
    feats = jax.jit(lambda v, i: model.apply(
        v, i, method=MCGazeModel.extract_features))(variables, imgs)
    out = jax.jit(lambda v, f, w: model.apply(
        v, f, w, method=MCGazeModel.run_heads))(variables, feats, whwh)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                 ref, out)


def test_batched_clue_heads_match_unbatched(tiny_model):
    """batched_clue_heads=True must share the exact param tree and
    reproduce the per-clue Dense/LN math (one (3,C,C') bmm per layer
    instead of three Denses) at fp32 tolerance — the flag can flip on a
    loaded checkpoint."""
    import dataclasses

    cfg, model, variables, apply = tiny_model
    cfg_b = dataclasses.replace(cfg, batched_clue_heads=True)
    model_b = MCGazeModel(cfg_b)

    n = cfg.clip_length
    imgs = jax.random.normal(jax.random.PRNGKey(3), (n, 64, 64, 3))
    whwh = jnp.tile(jnp.asarray([[64., 64., 64., 64.]]), (n, 1))

    # identical param tree (incl. init values: flax derives param RNG from
    # the path, and every name/shape is unchanged)
    init_b = jax.eval_shape(model_b.init, jax.random.PRNGKey(0), imgs,
                            whwh)
    assert (jax.tree_util.tree_structure(init_b['params']) ==
            jax.tree_util.tree_structure(variables['params']))

    out_a = apply(variables, imgs, whwh)
    out_b = jax.jit(model_b.apply)(variables, imgs, whwh)
    for si, (sa, sb) in enumerate(zip(out_a['stages'], out_b['stages'])):
        np.testing.assert_allclose(np.asarray(sa['cls_logits']),
                                   np.asarray(sb['cls_logits']),
                                   atol=2e-4, err_msg=f'stage{si} cls')
        # boxes compound GEMM-reassociation noise through exp() in the
        # delta decode and the stage feedback -> relative tolerance
        np.testing.assert_allclose(np.asarray(sa['boxes']),
                                   np.asarray(sb['boxes']),
                                   rtol=2e-4, atol=2e-3,
                                   err_msg=f'stage{si} boxes')
        for k in ('fusion', 'face', 'eyes', 'head'):
            np.testing.assert_allclose(
                np.asarray(sa['gaze'][k]), np.asarray(sb['gaze'][k]),
                atol=2e-4, err_msg=f'stage{si} {k}')
