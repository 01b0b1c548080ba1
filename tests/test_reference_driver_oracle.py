"""The deepest offline parity proof: the REFERENCE's full eval driver
script (tools/test_gaze360_gaze.py) EXECUTED end-to-end — real
init_detector, real test pipeline (Compose over the executed reference
transforms), real clip slicing / threaded loading / collate / model
forward / score zeroing / overlap stitching / results-JSON assembly —
against this repo's tools/test_gaze360_gaze.py CLI, on the same
fabricated videos with the same converted checkpoint and the UNMODIFIED
reference config. The two results JSONs must match at float tolerance.

This chains model + pipeline + stitching + schema through the
reference's actual code in one artifact — the closest offline stand-in
for the env-blocked 10.74°/9.81° MAE reproduction
(reference README.md:43-46).

Randomness contract: the reference test pipeline draws a crop ratio
~U[0.68, 1) per frame (CenterCrop relative_range, unseeded, threaded);
the oracle pins np.random.rand to 0.5 → ratio 0.84 every frame, which
is exactly this repo's EvalConfig default (crop_mode='fixed',
crop_ratio=0.84).

Canvas contract (a finding MADE by building this oracle): zero-padded
pixels become NONZERO constants after FrozenBN (beta - mean*gamma/std),
so the pad-canvas size is numerically visible to content features near
the bottom/right boundary — the reference's own features depend on its
Pad-to-/32 shape (and, through collate, on the batch max shape). At the
fixture's 48x64 frames (crop 0.84 → resize → 166x224 → reference pad
192x224) a mismatched fixed 224x224 canvas shifts final gazes by up to
~0.06 and boxes by ~27 (random-init-scale weights); with the canvas
pinned to the reference pad shape the composed forward matches at
boxes 1.3e-3 / scores 3e-6 / gazes 4e-6. The oracle therefore runs our
CLI with --cfg-options eval_cfg.canvas=192,224. The shipped fixed-canvas
default is the TPU static-shape design choice; the boundary deviation it
carries is now measured and documented (PARITY.md).
"""
import json
import os
import os.path as osp
import types

import numpy as np
import pytest
import torch

from tests.test_reference_oracle import (REF, REPO, metric_lines, run_cli,
                                         unit_rows)

pytestmark = pytest.mark.filterwarnings('ignore::UserWarning')

REF_CFG = osp.join(REF, 'configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py')


@pytest.fixture(scope='module')
def workspace(tmp_path_factory):
    """Fabricated videos (12-frame stitching case + 7-frame single-clip
    case), a gaze360-layout test.json, and a shared torch checkpoint."""
    import cv2

    from tests.test_full_model_parity import scaled_reference_state_dict

    root = str(tmp_path_factory.mktemp('two_stack'))
    prefix = osp.join(root, 'frames')
    rng = np.random.RandomState(11)
    videos, annotations = [], []
    for vid, length in ((1, 12), (2, 7)):
        names = []
        for f in range(length):
            name = f'{vid:03d}/{f:05d}.png'
            p = osp.join(prefix, name)
            os.makedirs(osp.dirname(p), exist_ok=True)
            cv2.imwrite(p, rng.randint(0, 255, (48, 64, 3), np.uint8))
            names.append(name)
        videos.append(dict(id=vid, width=64, height=48, length=length,
                           file_names=names))
        annotations.append(dict(
            id=vid, video_id=vid, category_id=1,
            bboxes=[[14, 4, 32, 30]] * length,
            gaze=unit_rows(rng, length).tolist()))
    ann = osp.join(root, 'test.json')
    json.dump(dict(videos=videos, annotations=annotations,
                   categories=[dict(id=1, name='person_face')]),
              open(ann, 'w'))

    sd = scaled_reference_state_dict(np.random.RandomState(42))
    ckpt = osp.join(root, 'shared.pth')
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()},
                'meta': {'CLASSES': ('person_face',)}}, ckpt)
    return ann, prefix + '/', ckpt, root


def _run_reference_driver(workspace, monkeypatch, tmp_path):
    ann, prefix, ckpt, _ = workspace
    from tests.reference_data_shim import load_reference_eval_driver
    mod = load_reference_eval_driver()
    # pin the per-frame crop draw: ratio = 0.68 + 0.5*(1-0.68) = 0.84
    monkeypatch.setattr(np.random, 'rand',
                        lambda *shape: np.full(shape or (1,), 0.5))
    monkeypatch.chdir(tmp_path)   # the script writes ./results/
    args = types.SimpleNamespace(config=REF_CFG, checkpoint=ckpt,
                                 json=ann, root=prefix, device='cpu',
                                 cfg_options=None)
    with torch.no_grad():
        mod.main(args)
    out = [osp.join(tmp_path, 'results', f)
           for f in os.listdir(tmp_path / 'results')]
    assert len(out) == 1
    return json.load(open(out[0])), out[0]


def _run_our_driver(workspace, out_dir):
    ann, prefix, ckpt, _ = workspace
    run_cli([osp.join(REPO, 'tools/test_gaze360_gaze.py'), REF_CFG, ckpt,
             '--json', ann, '--root', prefix, '--out-dir', str(out_dir),
             '--cfg-options', 'eval_cfg.canvas=192,224'])
    files = os.listdir(out_dir)
    assert len(files) == 1
    path = osp.join(str(out_dir), files[0])
    return json.load(open(path)), path


def _assert_results_equal(ref, ours):
    assert len(ref) == len(ours)
    for rv, ov in zip(ref, ours):
        assert rv['video_id'] == ov['video_id']
        vid = rv['video_id']
        np.testing.assert_allclose(
            ov['fusion_gazes'], rv['fusion_gazes'], atol=2e-3,
            err_msg=f'video {vid} fusion_gazes')
        for clue in ('face', 'eyes', 'head'):
            np.testing.assert_allclose(
                ov[f'{clue}_gazes'], rv[f'{clue}_gazes'], atol=2e-3,
                err_msg=f'video {vid} {clue}_gazes')
            np.testing.assert_allclose(
                ov[f'{clue}_score'], rv[f'{clue}_score'], atol=2e-3,
                err_msg=f'video {vid} {clue}_score')
            for t, (rb, ob) in enumerate(zip(rv[f'{clue}_bboxes'],
                                             ov[f'{clue}_bboxes'])):
                assert (rb is None) == (ob is None), \
                    f'video {vid} {clue} frame {t}: None mismatch'
                if rb is not None:
                    np.testing.assert_allclose(
                        ob, rb, atol=5e-2,
                        err_msg=f'video {vid} {clue}_bboxes frame {t}')


def test_reference_eval_driver_matches_ours(workspace, monkeypatch,
                                            tmp_path):
    ref_results, ref_path = _run_reference_driver(workspace, monkeypatch,
                                                  tmp_path)
    our_results, our_path = _run_our_driver(workspace,
                                            tmp_path / 'ours_results')
    _assert_results_equal(ref_results, our_results)

    # cross-scoring closure: BOTH scorers consume BOTH files and agree
    ann = workspace[0]
    lines = {}
    for tag, res in (('ref', ref_path), ('ours', our_path)):
        for scorer_tag, scorer in (
                ('ref', osp.join(REF, 'tools/calculate_mae_gaze360.py')),
                ('ours', osp.join(REPO, 'tools/calculate_mae_gaze360.py'))):
            lines[(tag, scorer_tag)] = metric_lines(run_cli(
                [scorer, '--evalfile', res, '--anno', ann]))
    # same file, both scorers: byte-identical metric lines
    assert lines[('ref', 'ref')] == lines[('ref', 'ours')]
    assert lines[('ours', 'ref')] == lines[('ours', 'ours')]


@pytest.mark.slow
def test_reference_eval_driver_matches_ours_l2cs(workspace, monkeypatch,
                                                 tmp_path):
    """The l2cs setting's two-stack run: no CenterCrop (the pipeline is
    fully deterministic — Resize 448 keep_ratio only), 448 px shapes,
    and the 3-annotations-per-video scorer layout. Slow: the 448-canvas
    CPU compile is ~4x the 224 one."""
    ann, prefix, ckpt, root = workspace
    l2cs_cfg = osp.join(REF,
                        'configs/multiclue_gaze/multiclue_gaze_r50_l2cs.py')

    from tests.reference_data_shim import load_reference_eval_driver
    mod = load_reference_eval_driver()
    monkeypatch.chdir(tmp_path)
    args = types.SimpleNamespace(config=l2cs_cfg, checkpoint=ckpt,
                                 json=ann, root=prefix, device='cpu',
                                 cfg_options=None)
    with torch.no_grad():
        mod.main(args)
    out = os.listdir(tmp_path / 'results')
    assert len(out) == 1
    ref_results = json.load(open(tmp_path / 'results' / out[0]))

    out_dir = tmp_path / 'ours_l2cs'
    # 48x64 frames -> resize fit (448,448) = 448x336 -> reference Pad/32
    # = (352, 448); pin our canvas to it (the FrozenBN boundary contract)
    run_cli([osp.join(REPO, 'tools/test_gaze360_gaze.py'), l2cs_cfg, ckpt,
             '--json', ann, '--root', prefix, '--out-dir', str(out_dir),
             '--cfg-options', 'eval_cfg.canvas=352,448'])
    files = os.listdir(out_dir)
    assert len(files) == 1
    our_results = json.load(open(osp.join(str(out_dir), files[0])))
    _assert_results_equal(ref_results, our_results)
