"""Cross-execution oracles: run the REFERENCE's own pure-CPU scripts
(torch/numpy/scipy/cv2 only) on synthetic inputs and assert our CLIs
produce byte-identical metrics / pixel-identical output trees.

Unlike the torch-port goldens in test_mae.py (which could share a
misreading with the library), these execute the scripts at
/root/reference/tools/ verbatim as subprocesses.
"""
import json
import os
import os.path as osp
import re
import subprocess
import sys

import numpy as np
import pytest

REF = '/root/reference'
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not osp.isdir(osp.join(REF, 'tools')),
    reason='reference checkout not available')


def run_cli(argv, cwd=None):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    r = subprocess.run([sys.executable] + argv, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


def metric_lines(out):
    """The three '<name> mean angular ...: X.XX' lines, as printed."""
    lines = [ln.strip() for ln in out.splitlines()
             if 'mean angular' in ln]
    assert len(lines) == 3, out
    return lines


def unit_rows(rng, n):
    v = rng.randn(n, 3)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def make_gaze_videos(rng, lengths):
    """(eval_data, gt_tracks): unit predictions near diverse unit GTs.

    GT yaw spread covers all three buckets (>90, <=90, <=20 degrees);
    includes a length-1 video for the smooth_filter passthrough branch.
    """
    eval_data, gts = [], []
    for vid, n in enumerate(lengths):
        gt = unit_rows(rng, n)
        # force bucket coverage: one strongly backward, one frontal
        gt[0] = [0.0, 0.05, -1.0]          # yaw ~0 -> front-20
        if n > 2:
            gt[1] = [1.0, 0.1, 0.5]        # yaw > 90 -> 360-only
        gt /= np.linalg.norm(gt, axis=1, keepdims=True)
        pred = gt + 0.12 * rng.randn(n, 3)
        pred /= np.linalg.norm(pred, axis=1, keepdims=True)
        eval_data.append({'video_id': vid + 1, 'category_id': 1,
                          'fusion_gazes': pred.tolist()})
        gts.append(gt.tolist())
    return eval_data, gts


def test_gaze360_scorer_matches_reference_script(tmp_path):
    rng = np.random.RandomState(0)
    eval_data, gts = make_gaze_videos(rng, [9, 5, 1, 14])
    anno = {'annotations': [{'gaze': g} for g in gts]}
    ev, an = tmp_path / 'res.json', tmp_path / 'anno.json'
    ev.write_text(json.dumps(eval_data))
    an.write_text(json.dumps(anno))

    ref = metric_lines(run_cli(
        [osp.join(REF, 'tools/calculate_mae_gaze360.py'),
         '--evalfile', str(ev), '--anno', str(an)]))
    ours = metric_lines(run_cli(
        [osp.join(REPO, 'tools/calculate_mae_gaze360.py'),
         '--evalfile', str(ev), '--anno', str(an)]))
    assert ours == ref


def test_l2cs_scorer_matches_reference_script(tmp_path):
    rng = np.random.RandomState(1)
    eval_data, gts = make_gaze_videos(rng, [7, 3, 11])
    # l2cs GT lives at annotation row anno_id*3 (calculate_mae_l2cs.py)
    annotations = []
    for g in gts:
        annotations.append({'gaze': g})
        annotations.append({'gaze': [[0.0, 0.0, -1.0]]})   # dummies
        annotations.append({'gaze': [[0.0, 0.0, -1.0]]})
    anno = {'annotations': annotations}
    ev, an = tmp_path / 'res.json', tmp_path / 'anno.json'
    ev.write_text(json.dumps(eval_data))
    an.write_text(json.dumps(anno))

    ref = metric_lines(run_cli(
        [osp.join(REF, 'tools/calculate_mae_l2cs.py'),
         '--evalfile', str(ev), '--anno', str(an)]))
    ours = metric_lines(run_cli(
        [osp.join(REPO, 'tools/calculate_mae_l2cs.py'),
         '--evalfile', str(ev), '--anno', str(an)]))
    assert ours == ref


# ---------------------------------------------------------------------------
# Reorganizer oracle: fabricate a raw Gaze360 layout, run the reference
# script (path constants patched into a tmp copy — the script hard-codes
# them at :10-12 and has no CLI), and diff the output trees pixel-exactly.
# ---------------------------------------------------------------------------

def _write_jpg(path, rng, size):
    import cv2
    os.makedirs(osp.dirname(path), exist_ok=True)
    img = rng.randint(0, 255, (size[1], size[0], 3), np.uint8)
    cv2.imwrite(path, img)


def make_raw_gaze360(root, rng):
    """imgs/ + metadata.mat + train.txt/test.txt with discontinuities,
    per-group resolutions, undetectable-face rows (incl. a partial -1
    bbox, which the reference also treats as undetectable)."""
    imgs = osp.join(root, 'imgs')
    # (recording, person, frames, (W, H))
    groups = [
        ('rec_a', 1, [1, 2, 3, 4, 6, 7], (32, 24)),    # gap at 5
        ('rec_a', 2, [10, 11, 12], (28, 28)),
        ('rec_b', 1, [3, 4, 5, 6, 7], (40, 30)),
    ]
    # rows in sorted-line order; train rows first, then test rows
    # (the reference advances a forward pointer over metadata rows)
    bbox_flags = {('rec_a', 1, 3): [-1, -1, -1, -1],    # undetectable
                  ('rec_a', 1, 6): [0.2, -1, 0.4, 0.5],  # partial -1
                  ('rec_b', 1, 5): [-1, -1, -1, -1]}
    recordings = sorted({g[0] for g in groups})
    rec_id = {r: i for i, r in enumerate(recordings)}

    rows = []       # (rec_idx, person, frame, bbox)
    lines = {'train': [], 'test': []}
    for rec, person, frames, (w, h) in groups:
        for j, fr in enumerate(frames):
            rel = f'{rec}/head/{person:06d}/{fr:06d}.jpg'
            # middle frames of a run get an odd size -> exercises the
            # resize-to-first-frame path in both implementations
            size = (w + 4, h + 2) if j == 2 else (w, h)
            _write_jpg(osp.join(imgs, rel), rng, size)
            gaze = unit_rows(rng, 1)[0]
            split = 'test' if rec == 'rec_b' else 'train'
            lines[split].append(
                f'{rel} {gaze[0]:.6f} {gaze[1]:.6f} {gaze[2]:.6f}\n')
            bb = bbox_flags.get((rec, person, fr), [0.1, 0.1, 0.5, 0.6])
            rows.append((rec_id[rec], person, fr, bb, split))
    for split in ('train', 'test'):
        lines[split].sort()
        with open(osp.join(root, f'{split}.txt'), 'w') as f:
            f.writelines(lines[split])
    rows.sort(key=lambda r: (r[4] == 'test', ))  # train rows first

    import scipy.io as sio
    n = len(rows)
    rec_arr = np.empty((1, len(recordings)), object)
    for r, i in rec_id.items():
        rec_arr[0, i] = np.array([r])
    sio.savemat(osp.join(root, 'metadata.mat'), {
        'recordings': rec_arr,
        'person_face_bbox': np.array([r[3] for r in rows], np.float64),
        'split': np.array([[0] * n]),
        'recording': np.array([[r[0] for r in rows]]),
        'person_identity': np.array([[r[1] for r in rows]]),
        'frame': np.array([[r[2] for r in rows]]),
    })
    return imgs


def _png_tree(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith('.png'):
                p = osp.join(dirpath, f)
                out[osp.relpath(p, root)] = p
    return out


def test_reorganizer_matches_reference_script(tmp_path):
    import cv2
    rng = np.random.RandomState(2)
    raw = str(tmp_path / 'raw')
    os.makedirs(raw)
    imgs = make_raw_gaze360(raw, rng)

    # --- reference: patch the three hard-coded paths into a tmp copy ---
    src = open(osp.join(REF, 'tools/gaze360_img_reorganize.py')).read()
    src = re.sub(r'ori_dataset_root = ".*"',
                 f'ori_dataset_root = {imgs!r}', src)
    src = re.sub(r'meta_data_root = ".*"',
                 f'meta_data_root = {osp.join(raw, "metadata.mat")!r}', src)
    src = re.sub(r'origt = ".*"', f'origt = {raw!r}', src)
    ref_dir = tmp_path / 'refrun'
    ref_dir.mkdir()
    (ref_dir / 'reorg.py').write_text(src)
    run_cli([str(ref_dir / 'reorg.py')], cwd=str(ref_dir))

    # --- ours ---
    ours_out = str(tmp_path / 'ours')
    run_cli([osp.join(REPO, 'tools/gaze360_img_reorganize.py'),
             '--imgs', imgs, '--metadata', osp.join(raw, 'metadata.mat'),
             '--splits-dir', raw, '--out', ours_out,
             '--settings', 'gaze360', 'l2cs', '--workers', '4'])

    for setting in ('gaze360', 'l2cs'):
        for split in ('train', 'test'):
            ref_tree = _png_tree(
                str(ref_dir / 'data' / setting / f'{split}_rawframes'))
            our_tree = _png_tree(
                osp.join(ours_out, setting, f'{split}_rawframes'))
            assert set(our_tree) == set(ref_tree), (setting, split)
            assert ref_tree, (setting, split)   # non-trivial fixture
            for rel, rp in ref_tree.items():
                a = cv2.imread(rp)
                b = cv2.imread(our_tree[rel])
                assert a.shape == b.shape, (setting, split, rel)
                np.testing.assert_array_equal(a, b,
                                              err_msg=f'{setting}/{split}/{rel}')


# ---------------------------------------------------------------------------
# Results-schema handshake: the REFERENCE scorers consume a results JSON
# written by THIS repo's driver CLI (tools/test_gaze360_gaze.py, random
# init, fabricated videos) — covering the real file-level contract (None
# boxes, list nesting, per-video dict layout, the l2cs anno_id*3 row
# convention) end-to-end, not just hand-built result dicts.
# ---------------------------------------------------------------------------

def _driver_workspace(tmp_path):
    import textwrap

    from tests.test_data_and_driver import make_dataset

    root = str(tmp_path)
    ann, prefix = make_dataset(root, num_videos=2, length=12,
                               head_only_frames=(3,))
    # append a single-clip video (length == clip_length) for the
    # no-overlap stitching branch
    data = json.load(open(ann))
    names = []
    rng = np.random.RandomState(9)
    for f in range(7):
        name = f'099/{f:05d}.png'
        import cv2
        p = osp.join(prefix, name)
        os.makedirs(osp.dirname(p), exist_ok=True)
        cv2.imwrite(p, rng.randint(0, 255, (32, 32, 3), np.uint8))
        names.append(name)
    data['videos'].append(dict(id=99, width=32, height=32, length=7,
                               file_names=names))
    gaze = unit_rows(rng, 7).tolist()
    for clue_boxes in ([[20, 10, 20, 14]], [[22, 14, 16, 5]],
                       [[14, 4, 32, 30]]):
        data['annotations'].append(dict(
            id=len(data['annotations']) + 1, video_id=99, category_id=1,
            bboxes=clue_boxes * 7, gaze=gaze))
    # l2cs-style file: three (face, eyes, head) tracks per video, the
    # anno_id*3 row convention of calculate_mae_l2cs.py:110
    ann_l2cs = osp.join(root, 'test_l2cs.json')
    json.dump(data, open(ann_l2cs, 'w'))
    # gaze360-style file: ONE annotation per eval video (the converter's
    # output layout, generate_json_from_ori.py:27-60, indexed directly
    # by calculate_mae_gaze360.py:121)
    by_vid = {}
    for a in data['annotations']:
        by_vid.setdefault(a['video_id'], a)
    g360 = dict(data)
    g360['annotations'] = [
        dict(a, id=i + 1)
        for i, a in enumerate(by_vid[v['id']] for v in data['videos'])]
    json.dump(g360, open(ann, 'w'))

    cfg_path = osp.join(root, 'tiny_cfg.py')
    with open(cfg_path, 'w') as f:
        f.write(textwrap.dedent(f"""
            from mcgaze_tpu.data.dataset import DataConfig
            from mcgaze_tpu.evaluation.driver import EvalConfig
            from mcgaze_tpu.models.mcgaze import ModelConfig

            model = ModelConfig(clip_length=7, backbone_depth=26,
                                num_stages=2, stage_loss_weights=(1.0, 1.0),
                                ffn_channels=256)
            data_test = DataConfig(ann_file={ann!r}, img_prefix={prefix!r},
                                   scale=(32, 32), canvas=(32, 32))
            eval_cfg = EvalConfig(scale=(32, 32), canvas=(32, 32),
                                  clip_batch=2)
        """))
    return ann, ann_l2cs, prefix, cfg_path


def test_reference_scorers_consume_driver_results(tmp_path):
    ann, ann_l2cs, prefix, cfg = _driver_workspace(tmp_path)
    out_dir = str(tmp_path / 'results')
    run_cli([osp.join(REPO, 'tools/test_gaze360_gaze.py'), cfg,
             '--json', ann, '--root', prefix, '--out-dir', out_dir])
    res_files = os.listdir(out_dir)
    assert len(res_files) == 1
    res = osp.join(out_dir, res_files[0])

    # gaze360 scorer: reference vs ours on the driver-written file
    ref = metric_lines(run_cli(
        [osp.join(REF, 'tools/calculate_mae_gaze360.py'),
         '--evalfile', res, '--anno', ann]))
    ours = metric_lines(run_cli(
        [osp.join(REPO, 'tools/calculate_mae_gaze360.py'),
         '--evalfile', res, '--anno', ann]))
    assert ours == ref

    # l2cs scorer: GT row anno_id*3 — make_dataset emits (face, eyes,
    # head) tracks per video in order, so row v*3 is video v's track
    ref = metric_lines(run_cli(
        [osp.join(REF, 'tools/calculate_mae_l2cs.py'),
         '--evalfile', res, '--anno', ann_l2cs]))
    ours = metric_lines(run_cli(
        [osp.join(REPO, 'tools/calculate_mae_l2cs.py'),
         '--evalfile', res, '--anno', ann_l2cs]))
    assert ours == ref

    # schema spot-checks on the driver-written file itself
    results = json.load(open(res))
    assert [r['video_id'] for r in results] == [1, 2, 99]
    r0 = results[0]
    for key in ('fusion_gazes', 'face_bboxes', 'eyes_bboxes',
                'head_bboxes', 'face_gazes', 'eyes_gazes', 'head_gazes',
                'face_score', 'eyes_score', 'head_score'):
        assert key in r0, key
    assert len(r0['fusion_gazes']) == 12
    # boxes are xywh lists or None (score<0.5 zeroing), never arrays
    for b in r0['face_bboxes']:
        assert b is None or (isinstance(b, list) and len(b) == 4)
