#!/usr/bin/env python
"""TPU-native inference server (reference deployment surface:
tools/deployment/mmdet2torchserve.py + mmdet_handler.py — TorchServe
endpoints GET /ping, GET /models, POST /predictions/<model_name>).

Serve from a config + checkpoint, or from a package directory produced
by tools/deployment/package_model.py (the `.mar` archive analogue):

    python tools/deployment/serve.py <config> <checkpoint> [--port 8080]
    python tools/deployment/serve.py <package_dir> [--port 8080]

Concurrent requests are micro-batched into one padded device forward
(mcgaze_tpu/evaluation/serving.py) — the TPU serving pattern: static
compiled shapes, MXU utilization from batching, at most
--batch-timeout-ms of gathering per request.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mcgaze_tpu.utils.env import setup_jax_platform  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('model',
                   help='config file, or a package dir from '
                        'tools/deployment/package_model.py')
    p.add_argument('checkpoint', nargs='?', default=None,
                   help='orbax dir or torch .pth (omit for package dirs)')
    p.add_argument('--host', default='127.0.0.1')
    p.add_argument('--port', type=int, default=8080)
    p.add_argument('--model-name', default=None,
                   help='name under /predictions/ (default: package '
                        'manifest name or config stem)')
    p.add_argument('--score-thr', type=float, default=0.5)
    p.add_argument('--max-batch', type=int, default=8,
                   help='micro-batch upper bound, in clips')
    p.add_argument('--batch-timeout-ms', type=float, default=5.0)
    p.add_argument('--dtype', default=None)
    p.add_argument('--ema', action='store_true',
                   help='serve the EMA weights from <ckpt>_train')
    p.add_argument('--cfg-options', nargs='+', default=None)
    return p.parse_args()


def main():
    setup_jax_platform()
    args = parse_args()

    from mcgaze_tpu.evaluation.serving import (GazeRequestProcessor,
                                               ServeConfig, make_server,
                                               resolve_package)
    from mcgaze_tpu.utils.cfg_options import apply_overrides
    from mcgaze_tpu.utils.config import load_config
    from tools.test_gaze360_gaze import build_forward

    config_path, checkpoint, name = args.model, args.checkpoint, None
    pkg = resolve_package(args.model)
    if pkg is not None:
        config_path, pkg_ckpt, name = pkg
        checkpoint = args.checkpoint or pkg_ckpt
    name = args.model_name or name or \
        osp.splitext(osp.basename(config_path))[0]

    cfg = apply_overrides(load_config(config_path), args.cfg_options)
    forward = build_forward(cfg, checkpoint, args.dtype, ema=args.ema)
    serve_cfg = ServeConfig(model_name=name, score_thr=args.score_thr,
                            max_batch=args.max_batch,
                            batch_timeout_ms=args.batch_timeout_ms)
    processor = GazeRequestProcessor(forward, cfg.eval_cfg, serve_cfg)
    print(f'compiling single-clip shape for {name} ...', flush=True)
    processor.warmup()

    server = make_server(processor, args.host, args.port)
    print(f'serving {name} at http://{args.host}:{args.port}'
          f'/predictions/{name} (ping: /ping)', flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        processor.close()


if __name__ == '__main__':
    main()
