"""YOLOv5 head-detector tests: forward shapes, decode math, static NMS,
torch-name converter coverage (reference MCGaze_demo/yolo_head)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcgaze_tpu.models.yolov5 import (YoloConfig, YoloV5, convert_torch_yolo,
                                      decode_predictions, init_yolo,
                                      nms_static, postprocess)

CFG = YoloConfig(num_classes=2, img_size=128)


@pytest.fixture(scope='module')
def yolo():
    return init_yolo(CFG, jax.random.PRNGKey(0))


def test_forward_level_shapes(yolo):
    model, variables = yolo
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    maps = model.apply(variables, x)
    na, no = 3, CFG.num_classes + 5
    assert [m.shape for m in maps] == [
        (2, 16, 16, na * no), (2, 8, 8, na * no), (2, 4, 4, na * no)]


def test_decode_ranges(yolo):
    model, variables = yolo
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    preds = decode_predictions(CFG, model.apply(variables, x))
    a = (16 * 16 + 8 * 8 + 4 * 4) * 3
    assert preds.shape == (1, a, 7)
    p = np.asarray(preds[0])
    # sigmoid outputs: obj/cls in (0,1); xy within ±stride of the canvas
    assert (p[:, 4:] > 0).all() and (p[:, 4:] < 1).all()
    assert p[:, 0].min() > -16 and p[:, 0].max() < 128 + 16
    # wh bounded by 4*anchor
    assert p[:, 2].max() <= 4 * 373


def test_nms_static_suppresses_overlaps():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                        jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7], jnp.float32)
    _, ks, ki = nms_static(boxes, scores, iou_thres=0.45, max_det=3)
    ks, ki = np.asarray(ks), np.asarray(ki)
    assert ks[0] == pytest.approx(0.9)
    assert ks[np.where(ki == 1)[0][0]] == 0.0       # suppressed
    assert ks[np.where(ki == 2)[0][0]] == pytest.approx(0.7)


def test_nms_class_aware_offset_keeps_both():
    # same box, two classes: postprocess must keep both (class offset trick)
    preds = np.zeros((4, 7), np.float32)
    preds[0] = [20, 20, 10, 10, 5, 5, -5]     # pre-sigmoid? no: decoded
    # build decoded-style rows: xc yc w h obj c0 c1
    preds = np.asarray([
        [20, 20, 10, 10, 0.9, 0.99, 0.01],
        [20, 20, 10, 10, 0.9, 0.01, 0.99],
        [20, 20, 10, 10, 0.5, 0.95, 0.01],    # same class as row 0 -> dies
        [90, 90, 10, 10, 0.8, 0.9, 0.05],
    ], np.float32)
    boxes, scores, classes = postprocess(CFG, jnp.asarray(preds),
                                         conf_thres=0.25, max_det=4)
    kept = np.asarray(scores) > 0
    assert kept.sum() == 3
    assert set(np.asarray(classes)[kept].tolist()) == {0, 1}


def test_torch_converter_tree_matches_init(yolo):
    """A synthetic torch state_dict produced from the flax tree converts
    back to the exact init structure/shapes (no missing/extra leaves)."""
    torch = pytest.importorskip('torch')
    model, variables = yolo

    sd = {}

    def emit(path, leaf):
        parts = [p.key for p in path][1:]      # drop params/batch_stats
        # reverse-map flax path -> torch name
        layer = parts[0]
        idx = layer[1:] if layer.startswith('l') else layer
        rest = parts[1:]
        if layer.startswith('det'):
            tname = f'model.24.m.{layer[3:]}.' + \
                ('weight' if rest[-1] == 'kernel' else 'bias')
        else:
            mods = []
            for p in rest[:-1]:
                if p.startswith('m') and p[1:].isdigit():
                    mods.append(f'm.{p[1:]}')
                else:
                    mods.append(p)
            leafname = {'kernel': 'conv.weight', 'scale': 'bn.weight',
                        'bias': 'bn.bias', 'mean': 'bn.running_mean',
                        'var': 'bn.running_var'}
            last = rest[-1]
            if last == 'kernel':
                tname = f'model.{idx}.' + '.'.join(mods[:-1] + ['conv.weight']) \
                    if mods and mods[-1] == 'conv' else \
                    f'model.{idx}.' + '.'.join(mods + ['conv.weight'])
            else:
                base = mods[:-1] if mods and mods[-1] == 'bn' else mods
                tname = f'model.{idx}.' + '.'.join(base + [leafname[last]])
            tname = tname.replace('..', '.')
        arr = np.asarray(leaf)
        if tname.endswith('conv.weight') or tname.endswith(
                ('m.0.weight', 'm.1.weight', 'm.2.weight')):
            arr = arr.transpose(3, 2, 0, 1)    # HWIO -> OIHW
        sd[tname] = torch.from_numpy(arr.copy())

    jax.tree_util.tree_map_with_path(emit, variables)
    # Focus stem name fix: flax l0/conv/conv -> torch model.0.conv.conv
    converted = convert_torch_yolo(sd, CFG)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(converted)
    paths_a = {jax.tree_util.keystr(p): l.shape for p, l in flat_a}
    paths_b = {jax.tree_util.keystr(p): l.shape for p, l in flat_b}
    assert paths_a == paths_b
    # and values roundtrip
    ex = converted['params']['l1']['conv']['kernel']
    np.testing.assert_allclose(
        ex, variables['params']['l1']['conv']['kernel'])
