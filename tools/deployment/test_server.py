#!/usr/bin/env python
"""Server-vs-local parity check (reference surface:
tools/deployment/test_torchserver.py — run the model locally AND through
the server on the same image, assert the predictions agree).

    python tools/deployment/serve.py <config> <ckpt> --port 8080 &
    python tools/deployment/test_server.py img.jpg <config> <ckpt> \
        <model_name> --inference-addr 127.0.0.1:8080
"""
import argparse
import json
import os.path as osp
import sys
import urllib.request

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mcgaze_tpu.utils.env import setup_jax_platform  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('img', help='image file')
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('model_name', help='the model name in the server')
    p.add_argument('--inference-addr', default='127.0.0.1:8080')
    p.add_argument('--score-thr', type=float, default=0.5,
                   help='must match the serve.py --score-thr (both sides '
                        'filter before comparing, as the reference '
                        'client does at test_torchserver.py:48)')
    p.add_argument('--atol', type=float, default=1e-4)
    return p.parse_args()


def post_image(addr: str, model_name: str, img_path: str):
    url = f'http://{addr}/predictions/{model_name}'
    with open(img_path, 'rb') as f:
        req = urllib.request.Request(url, data=f.read(), method='POST')
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def main():
    setup_jax_platform()
    args = parse_args()

    from mcgaze_tpu.evaluation.serving import (GazeRequestProcessor,
                                               ServeConfig)
    from mcgaze_tpu.utils.config import load_config
    from tools.test_gaze360_gaze import build_forward

    cfg = load_config(args.config)
    forward = build_forward(cfg, args.checkpoint)
    processor = GazeRequestProcessor(
        forward, cfg.eval_cfg, ServeConfig(score_thr=args.score_thr))
    try:
        local = processor.process_image_bytes(open(args.img, 'rb').read())
    finally:
        processor.close()
    print('local result:')
    print(json.dumps(local, indent=2))

    served = post_image(args.inference_addr, args.model_name, args.img)
    print('server result:')
    print(json.dumps(served, indent=2))

    assert len(local) == len(served), \
        f'{len(local)} local entries vs {len(served)} served'
    for lo, se in zip(local, served):
        assert lo['class_name'] == se['class_name']
        for key in ('bbox', 'score', 'gaze'):
            if key in lo or key in se:
                assert np.allclose(lo[key], se[key], atol=args.atol), \
                    f"{lo['class_name']}.{key}: {lo[key]} vs {se[key]}"
    print(f'PARITY OK ({len(local)} entries, atol={args.atol})')


if __name__ == '__main__':
    main()
