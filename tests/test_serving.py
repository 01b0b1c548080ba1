"""Serving stack (reference surface: tools/deployment/mmdet2torchserve.py
+ mmdet_handler.py + test_torchserver.py + model_converters/
publish_model.py): micro-batcher fusion/padding, request decoding,
handler-format responses, packaging, publication, and a real HTTP
server subprocess driven end-to-end."""
import base64
import json
import os
import os.path as osp
import subprocess
import sys
import textwrap
import threading
import time

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

# mirrors tests/test_cli.py TINY_CFG shapes so XLA cache entries are shared
TINY_MODEL = dict(clip_length=7, backbone_depth=26, num_stages=2,
                  stage_loss_weights=(1.0, 1.0), ffn_channels=256)
TINY_EVAL = dict(scale=(32, 32), canvas=(32, 32), crop_ratio=0.84,
                 clip_batch=2)


def encode_jpg(img: np.ndarray) -> bytes:
    import cv2
    ok, buf = cv2.imencode('.png', cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    assert ok
    return buf.tobytes()


def rand_img(rng, h=40, w=48):
    return rng.randint(0, 255, (h, w, 3)).astype(np.uint8)


@pytest.fixture(scope='module')
def processor():
    from mcgaze_tpu.evaluation.driver import EvalConfig
    from mcgaze_tpu.evaluation.forward import (bind_forward,
                                               make_eval_forward)
    from mcgaze_tpu.evaluation.serving import (GazeRequestProcessor,
                                               ServeConfig)
    from mcgaze_tpu.models.mcgaze import ModelConfig

    model_cfg = ModelConfig(**{k: v for k, v in TINY_MODEL.items()
                               if k != 'stage_loss_weights'})
    eval_cfg = EvalConfig(**TINY_EVAL)
    _, variables, fwd, fwd_dedup = make_eval_forward(model_cfg,
                                                     eval_cfg.canvas)
    proc = GazeRequestProcessor(
        bind_forward(fwd, variables, fwd_dedup), eval_cfg,
        ServeConfig(score_thr=0.0))  # random init: keep all entries
    yield proc
    proc.close()


def test_parse_request_body_raw_and_json():
    from mcgaze_tpu.evaluation.serving import parse_request_body
    rng = np.random.RandomState(0)
    img = rand_img(rng)
    raw = encode_jpg(img)

    frames = parse_request_body(raw, 'application/octet-stream')
    assert len(frames) == 1 and frames[0].shape == img.shape
    np.testing.assert_array_equal(frames[0], img)  # png is lossless

    body = json.dumps({'frames': [base64.b64encode(raw).decode()] * 3})
    frames = parse_request_body(body.encode(), 'application/json')
    assert len(frames) == 3
    np.testing.assert_array_equal(frames[2], img)

    with pytest.raises(ValueError):
        parse_request_body(b'not an image', '')
    with pytest.raises(ValueError):
        parse_request_body(b'{"frames": []}', 'application/json')


def test_micro_batcher_fuses_and_pads():
    from mcgaze_tpu.evaluation.serving import MicroBatcher

    t = 3
    calls = []

    def fake_forward(imgs, whwh, tt):
        assert tt == t
        k = imgs.shape[0] // t
        assert k & (k - 1) == 0, f'clip count {k} not pow2-padded'
        calls.append(k)
        n = imgs.shape[0]
        # row marker = mean pixel, so routing is checkable per request
        marker = imgs.mean(axis=(1, 2, 3))
        boxes = np.tile(marker[:, None, None], (1, 3, 4))
        scores = np.tile(marker[:, None], (1, 3))
        gazes = {name: np.tile(marker[:, None], (1, 3))
                 for name in ('fusion', 'face', 'eyes', 'head')}
        return boxes, scores, gazes

    mb = MicroBatcher(fake_forward, clip_length=t, max_batch=4,
                      timeout_ms=300.0)
    try:
        results = {}

        def call(i):
            imgs = np.full((t, 4, 4, 3), float(i), np.float32)
            whwh = np.ones((t, 4), np.float32)
            results[i] = mb.submit(imgs, whwh)

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()

        for i in range(4):
            boxes, scores, gazes = results[i]
            assert boxes.shape == (t, 3, 4)
            np.testing.assert_allclose(boxes, float(i))
            np.testing.assert_allclose(gazes['fusion'], float(i))
        # 4 concurrent requests with a 300 ms window must coalesce:
        # strictly fewer launches than requests
        assert sum(calls) >= 4 and len(calls) < 4, calls

        with pytest.raises(ValueError):
            mb.submit(np.zeros((t + 1, 4, 4, 3), np.float32),
                      np.ones((t + 1, 4), np.float32))
    finally:
        mb.stop()


def test_micro_batcher_surfaces_errors():
    from mcgaze_tpu.evaluation.serving import MicroBatcher

    def broken(imgs, whwh, t):
        raise RuntimeError('device on fire')

    mb = MicroBatcher(broken, clip_length=2, max_batch=2, timeout_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match='device on fire'):
            mb.submit(np.zeros((2, 4, 4, 3), np.float32),
                      np.ones((2, 4), np.float32))
    finally:
        mb.stop()


def test_warmup_covers_burst_bucket_and_video_path():
    """warmup must compile every bucket _serve can launch: the drained
    clip count is pow2-PADDED, so a non-pow2 max_batch (6) still hits
    the 8-bucket under a full burst; and the long-request path
    (VideoGazeEvaluator) has its own per-chunk buckets."""
    from mcgaze_tpu.evaluation.driver import EvalConfig
    from mcgaze_tpu.evaluation.serving import (GazeRequestProcessor,
                                               ServeConfig)

    t, seen_k = 2, []

    def fake_forward(imgs, whwh, tt):
        seen_k.append(imgs.shape[0] // tt)
        n = imgs.shape[0]
        z = np.zeros((n, 3), np.float32)
        return (np.zeros((n, 3, 4), np.float32), z,
                {m: z for m in ('fusion', 'face', 'eyes', 'head')})

    eval_cfg = EvalConfig(scale=(16, 16), canvas=(16, 16), clip_length=t,
                          stride=1, clip_batch=4)
    proc = GazeRequestProcessor(fake_forward, eval_cfg,
                                ServeConfig(max_batch=6))
    try:
        proc.warmup()
        # micro-batch buckets first: pow2 up to NEXT pow2 of max_batch,
        # 8 included; then the video path, one synthetic video per pow2
        # clip-chunk bucket up to clip_batch (k clips -> k_pad chunk)
        assert seen_k == [1, 2, 4, 8, 1, 2, 4]
    finally:
        proc.close()


def test_stopped_batcher_fails_requests_instead_of_hanging():
    from mcgaze_tpu.evaluation.serving import MicroBatcher

    def fake_forward(imgs, whwh, tt):
        n = imgs.shape[0]
        z = np.zeros((n, 3), np.float32)
        return (np.zeros((n, 3, 4), np.float32), z, {'fusion': z})

    mb = MicroBatcher(fake_forward, clip_length=2, max_batch=2,
                      timeout_ms=1.0)
    mb.stop()
    with pytest.raises(RuntimeError):
        mb.submit(np.zeros((2, 4, 4, 3), np.float32),
                  np.ones((2, 4), np.float32))
    # a request that slipped into the queue around stop() gets failed
    # by stop()'s drain rather than waiting forever
    done = threading.Event()
    slot = {}
    mb._queue.put((np.zeros((2, 4, 4, 3), np.float32),
                   np.ones((2, 4), np.float32), done, slot))
    mb.stop()
    assert done.is_set() and isinstance(slot['error'], RuntimeError)


def test_ship_dtype_follows_forward_capability():
    """A forward that normalizes on-device (accepts_uint8) receives raw
    u8 frames (4x less H2D); a plain-f32 forward receives normalized
    f32 — mirroring EvalConfig.ship_uint8's contract."""
    from mcgaze_tpu.evaluation.driver import EvalConfig
    from mcgaze_tpu.evaluation.serving import GazeRequestProcessor

    seen = {}

    def fake_forward(imgs, whwh, t):
        seen['dtype'] = imgs.dtype
        n = imgs.shape[0]
        z = np.zeros((n, 3), np.float32)
        return (np.zeros((n, 3, 4), np.float32), z,
                {m: z for m in ('fusion', 'face', 'eyes', 'head')})

    eval_cfg = EvalConfig(scale=(16, 16), canvas=(16, 16), clip_length=2)
    frame = np.zeros((20, 20, 3), np.uint8)

    proc = GazeRequestProcessor(fake_forward, eval_cfg)
    try:
        assert not proc.ship_u8
        proc.process_frames([frame, frame])
        assert seen['dtype'] == np.float32
    finally:
        proc.close()

    fake_forward.accepts_uint8 = True
    proc = GazeRequestProcessor(fake_forward, eval_cfg)
    try:
        assert proc.ship_u8
        proc.process_frames([frame, frame])
        assert seen['dtype'] == np.uint8
    finally:
        proc.close()


def test_single_image_handler_format(processor):
    rng = np.random.RandomState(1)
    out = processor.process_image_bytes(encode_jpg(rand_img(rng)))
    assert isinstance(out, list)
    names = [e['class_name'] for e in out]
    assert names == ['face', 'eyes', 'head', 'fusion']
    for e in out[:3]:
        assert len(e['bbox']) == 4 and 0.0 <= e['score'] <= 1.0
        np.testing.assert_allclose(np.linalg.norm(e['gaze']), 1.0,
                                   rtol=1e-4)
    assert 'bbox' not in out[3] and 'score' not in out[3]
    np.testing.assert_allclose(np.linalg.norm(out[3]['gaze']), 1.0,
                               rtol=1e-4)


def test_score_threshold_filters_clues(processor):
    import dataclasses
    rng = np.random.RandomState(2)
    body = encode_jpg(rand_img(rng))
    all_entries = processor.process_image_bytes(body)
    old = processor.cfg
    processor.cfg = dataclasses.replace(old, score_thr=2.0)  # > any score
    try:
        only_fusion = processor.process_image_bytes(body)
    finally:
        processor.cfg = old
    assert len(all_entries) == 4
    assert [e['class_name'] for e in only_fusion] == ['fusion']


def test_clip_and_long_video_requests(processor):
    rng = np.random.RandomState(3)
    t = processor.eval_cfg.clip_length

    # short clip (< clip_length): per-frame lists, padded internally
    out = processor.process_frames([rand_img(rng) for _ in range(2)])
    assert len(out['frames']) == 2 and len(out['fusion_gazes']) == 2
    assert [e['class_name'] for e in out['frames'][0]] == \
        ['face', 'eyes', 'head', 'fusion']

    # longer than one clip: full stitched video path, results-JSON schema
    out = processor.process_frames([rand_img(rng)
                                    for _ in range(t + 3)])
    assert out['category_id'] == 1
    assert len(out['fusion_gazes']) == t + 3
    for clue in ('face', 'eyes', 'head'):
        assert len(out[f'{clue}_bboxes']) == t + 3
        assert len(out[f'{clue}_score']) == t + 3


def test_process_body_json_roundtrip(processor):
    rng = np.random.RandomState(4)
    raw = encode_jpg(rand_img(rng))
    b64 = base64.b64encode(raw).decode()

    flat = processor.process_body(raw, 'application/octet-stream')
    assert [e['class_name'] for e in flat] == \
        ['face', 'eyes', 'head', 'fusion']
    # response shape follows the request FORMAT, not the frame count:
    # a 1-frame JSON clip still gets the clip dict (same numbers as the
    # raw-bytes path — both pad the single frame to a full clip)
    one = processor.process_body(
        json.dumps({'frames': [b64]}).encode(), 'application/json')
    assert len(one['frames']) == 1 and len(one['fusion_gazes']) == 1
    np.testing.assert_allclose(flat[3]['gaze'], one['frames'][0][3]['gaze'],
                               atol=1e-5)

    clip = processor.process_body(
        json.dumps({'frames': [b64, b64]}).encode(), 'application/json')
    assert len(clip['frames']) == 2
    # identical frames -> identical per-frame predictions
    np.testing.assert_allclose(clip['fusion_gazes'][0],
                               clip['fusion_gazes'][1], atol=1e-5)


def _make_orbax_ckpt(tmp_path, with_train=True):
    """Fabricated params/stats checkpoint + optional _train split."""
    from mcgaze_tpu.utils.checkpoint import save_checkpoint
    tree = {'params': {'w': np.arange(6, dtype=np.float32)},
            'stats': {'bn': np.ones(3, np.float32)}}
    train = ({'opt_state': {'m': np.zeros(6, np.float32)}, 'step': 5,
              'ema_params': {'w': np.full(6, 2.0, np.float32)}}
             if with_train else None)
    return save_checkpoint(str(tmp_path), 7, tree, train_tree=train), tree


def test_package_and_resolve(tmp_path):
    sys.path.insert(0, osp.join(REPO, 'tools', 'deployment'))
    try:
        from package_model import package_model
    finally:
        sys.path.pop(0)
    from mcgaze_tpu.evaluation.serving import resolve_package

    ckpt, _ = _make_orbax_ckpt(tmp_path / 'work')
    cfg_path = tmp_path / 'cfg.py'
    cfg_path.write_text('model = None\n')
    out = str(tmp_path / 'pkgs')

    pkg = package_model(str(cfg_path), ckpt, out, model_name='tiny',
                        model_version='2.0', archive=True)
    cfg_file, ckpt_file, name = resolve_package(pkg)
    assert name == 'tiny'
    assert osp.isfile(cfg_file) and osp.isdir(ckpt_file)
    assert osp.isdir(ckpt_file + '_train')  # EMA/resume split travels
    manifest = json.load(open(osp.join(pkg, 'MANIFEST.json')))
    assert manifest['version'] == '2.0'
    assert manifest['runtime'] == 'jax-tpu'
    assert osp.isfile(osp.join(out, 'tiny.mar'))
    # non-packages resolve to None
    assert resolve_package(str(tmp_path)) is None
    # refuses silent overwrite without force
    with pytest.raises(SystemExit):
        package_model(str(cfg_path), ckpt, out, model_name='tiny')
    package_model(str(cfg_path), ckpt, out, model_name='tiny', force=True)


def test_publish_model_orbax(tmp_path):
    sys.path.insert(0, osp.join(REPO, 'tools', 'model_converters'))
    try:
        from publish_model import publish_checkpoint
    finally:
        sys.path.pop(0)
    from mcgaze_tpu.utils.checkpoint import restore_checkpoint

    ckpt, tree = _make_orbax_ckpt(tmp_path / 'work')
    final = publish_checkpoint(ckpt, str(tmp_path / 'release' / 'model'))
    assert osp.basename(final).startswith('model-')
    assert len(osp.basename(final).split('-')[-1]) == 8
    restored = restore_checkpoint(final)
    assert set(restored.keys()) == {'params', 'stats'}  # optimizer gone
    np.testing.assert_array_equal(restored['params']['w'],
                                  tree['params']['w'])

    # --ema swaps in the averaged params (EMAHook eval-swap semantics)
    final_ema = publish_checkpoint(ckpt, str(tmp_path / 'release' / 'ema'),
                                   ema=True)
    restored = restore_checkpoint(final_ema)
    np.testing.assert_array_equal(restored['params']['w'],
                                  np.full(6, 2.0, np.float32))

    # republishing restores identically (the hash names the artifact;
    # orbax embeds save timestamps, so it differs run-to-run — unlike
    # the reference's torch-file hash, which is content-deterministic)
    again = publish_checkpoint(ckpt, str(tmp_path / 'release2' / 'model'))
    np.testing.assert_array_equal(
        restore_checkpoint(again)['params']['w'], tree['params']['w'])


def test_publish_model_pth(tmp_path):
    sys.path.insert(0, osp.join(REPO, 'tools', 'model_converters'))
    try:
        from publish_model import publish_checkpoint
    finally:
        sys.path.pop(0)
    import torch

    path = str(tmp_path / 'in.pth')
    torch.save({'state_dict': {'w': torch.ones(3)},
                'optimizer': {'m': torch.zeros(3)}}, path)
    final = publish_checkpoint(path, str(tmp_path / 'out.pth'))
    assert final.endswith('.pth') and '-' in osp.basename(final)
    ckpt = torch.load(final)
    assert 'optimizer' not in ckpt and 'state_dict' in ckpt


# ------------------------------------------------------------- HTTP e2e

SERVE_CFG = textwrap.dedent("""
    from mcgaze_tpu.evaluation.driver import EvalConfig
    from mcgaze_tpu.models.mcgaze import ModelConfig

    model = ModelConfig(clip_length=7, backbone_depth=26, num_stages=2,
                        stage_loss_weights=(1.0, 1.0), ffn_channels=256)
    eval_cfg = EvalConfig(scale=(32, 32), canvas=(32, 32), crop_ratio=0.84,
                          clip_batch=2)
""")


def _free_port():
    import socket
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _http(method, port, path, body=None, content_type=None, timeout=30):
    import http.client
    conn = http.client.HTTPConnection('127.0.0.1', port, timeout=timeout)
    headers = {'Content-Type': content_type} if content_type else {}
    conn.request(method, path, body=body, headers=headers)
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


@pytest.mark.slow
def test_serve_cli_end_to_end(tmp_path, processor):
    cfg_path = tmp_path / 'serve_cfg.py'
    cfg_path.write_text(SERVE_CFG)
    port = _free_port()

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    # child output goes to a FILE, not PIPE: nobody drains a pipe while
    # the server runs, and >64 KB of compile-time warnings would block
    # the child on a stderr write forever
    log_path = tmp_path / 'server.log'
    log_f = open(log_path, 'w')
    proc = subprocess.Popen(
        [sys.executable, 'tools/deployment/serve.py', str(cfg_path),
         '--port', str(port), '--model-name', 'tinygaze',
         '--score-thr', '0.0'],
        cwd=REPO, env=env, stdout=log_f, stderr=subprocess.STDOUT)
    try:
        deadline = time.time() + 600
        last_err = None
        while time.time() < deadline:
            if proc.poll() is not None:
                pytest.fail(
                    f'server died: {log_path.read_text()[-3000:]}')
            try:
                status, data = _http('GET', port, '/ping', timeout=5)
                if status == 200 and data['status'] == 'Healthy':
                    break
            except Exception as e:  # not up yet
                last_err = e
                time.sleep(1.0)
        else:
            pytest.fail(f'server never became healthy: {last_err}')

        status, data = _http('GET', port, '/models')
        assert status == 200
        assert data['models'][0]['modelName'] == 'tinygaze'

        rng = np.random.RandomState(7)
        img = rand_img(rng)
        raw = encode_jpg(img)

        # raw-image request: handler-style flat list
        status, served = _http('POST', port, '/predictions/tinygaze', raw,
                               'application/octet-stream', timeout=120)
        assert status == 200, served
        assert [e['class_name'] for e in served] == \
            ['face', 'eyes', 'head', 'fusion']

        # parity vs the in-process model (same config -> same PRNGKey(0)
        # init), the test_torchserver.py assertion
        local = processor.process_image_bytes(raw)
        for lo, se in zip(local, served):
            assert lo['class_name'] == se['class_name']
            np.testing.assert_allclose(lo['gaze'], se['gaze'], atol=1e-4)
            if 'bbox' in lo:
                np.testing.assert_allclose(lo['bbox'], se['bbox'],
                                           rtol=1e-3, atol=1e-3)

        # clip JSON request
        b64 = base64.b64encode(raw).decode()
        body = json.dumps({'frames': [b64, b64]}).encode()
        status, clip = _http('POST', port, '/predictions/tinygaze', body,
                             'application/json', timeout=120)
        assert status == 200, clip
        assert len(clip['frames']) == 2

        # concurrent raw requests ride the micro-batcher together
        results = {}

        def post(i):
            results[i] = _http('POST', port, '/predictions/tinygaze',
                               raw, 'application/octet-stream',
                               timeout=120)

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for i in range(3):
            status, data = results[i]
            assert status == 200
            np.testing.assert_allclose(data[3]['gaze'], served[3]['gaze'],
                                       atol=1e-4)

        # wrong model name -> 404
        status, data = _http('POST', port, '/predictions/nope', raw,
                             'application/octet-stream')
        assert status == 404

        # broken payload is the client's fault -> 400, server survives
        status, data = _http('POST', port, '/predictions/tinygaze',
                             b'garbage', 'application/octet-stream')
        assert status == 400 and 'error' in data
        status, _ = _http('GET', port, '/ping')
        assert status == 200
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
        log_f.close()
