#!/usr/bin/env python
"""Serving benchmark: request latency (p50/p99) and sustained throughput
of the micro-batched inference engine (mcgaze_tpu/evaluation/serving.py)
under concurrent load. The reference publishes no serving numbers (its
TorchServe path is unbenchmarked); this records ours.

Two modes:
  * engine (default): clients call GazeRequestProcessor directly —
    isolates preprocess + micro-batch + device forward + format.
  * --http: clients POST PNG bytes to a live ThreadingHTTPServer on
    localhost — adds HTTP parse/serialize, the full served path.

Measured quantities per (concurrency, mode): p50/p99/mean request
latency, requests/s, and the mean micro-batch occupancy (clips per
device launch — the number that shows batching working).

Caveat for the tunnelled bench chip: every request pays one
device->host readback (~27 ms RTT through the tunnel, see bench.py
docstring); a host-attached TPU serves without it, so the latency
floor here is tunnel-bound, not device-bound. Throughput amortizes
the RTT across in-flight requests and is the meaningful number.
"""
import argparse
import json
import os.path as osp
import statistics
import sys
import threading
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('--image', type=int, default=224)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--requests', type=int, default=48,
                   help='requests per client')
    p.add_argument('--concurrency', type=int, nargs='+',
                   default=[1, 4, 8])
    p.add_argument('--max-batch', type=int, default=8)
    p.add_argument('--batch-timeout-ms', type=float, default=5.0)
    p.add_argument('--http', action='store_true')
    p.add_argument('--frames', type=int, default=1,
                   help='frames per request (1 = single image tiled '
                        'to a clip; the served unit is one clip '
                        'either way)')
    return p.parse_args()


def run_load(do_request, n_clients: int, n_requests: int):
    """n_clients threads x n_requests each -> (latencies_s, wall_s)."""
    latencies = []
    lock = threading.Lock()
    start_barrier = threading.Barrier(n_clients + 1)

    def client():
        start_barrier.wait()
        mine = []
        for _ in range(n_requests):
            t0 = time.perf_counter()
            do_request()
            mine.append(time.perf_counter() - t0)
        with lock:
            latencies.extend(mine)

    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    for t in threads:
        t.start()
    start_barrier.wait()
    wall0 = time.perf_counter()
    for t in threads:
        t.join()
    return latencies, time.perf_counter() - wall0


def main():
    args = parse_args()
    from mcgaze_tpu.utils.env import setup_jax_platform
    setup_jax_platform()

    import cv2

    from mcgaze_tpu.evaluation.driver import EvalConfig
    from mcgaze_tpu.evaluation.forward import (bind_forward,
                                               make_eval_forward)
    from mcgaze_tpu.evaluation.serving import (GazeRequestProcessor,
                                               ServeConfig, make_server)
    from mcgaze_tpu.models.mcgaze import ModelConfig

    size = (args.image, args.image)
    model_cfg = ModelConfig(dtype=args.dtype)
    eval_cfg = EvalConfig(scale=size, canvas=size)
    _, variables, fwd, fwd_dedup = make_eval_forward(model_cfg, size)
    processor = GazeRequestProcessor(
        bind_forward(fwd, variables, fwd_dedup), eval_cfg,
        ServeConfig(max_batch=args.max_batch,
                    batch_timeout_ms=args.batch_timeout_ms))
    print('compiling micro-batch buckets ...', flush=True)
    t0 = time.perf_counter()
    processor.warmup()
    print(f'warmup {time.perf_counter() - t0:.1f}s', flush=True)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (args.image, args.image, 3)).astype(np.uint8)
    ok, buf = cv2.imencode('.png', img)
    assert ok
    body = buf.tobytes()
    if args.frames > 1:
        import base64
        b64 = base64.b64encode(body).decode()
        body = json.dumps({'frames': [b64] * args.frames}).encode()

    if args.http:
        import http.client
        server = make_server(processor, '127.0.0.1', 0)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()

        def do_request():
            conn = http.client.HTTPConnection('127.0.0.1', port,
                                              timeout=120)
            conn.request('POST', f'/predictions/{processor.cfg.model_name}',
                         body=body)
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()[:200]
            json.loads(resp.read())
            conn.close()
    else:
        def do_request():
            processor.process_body(body)

    results = []
    for c in args.concurrency:
        do_request()  # shake out per-concurrency first-call effects
        # clear AFTER the warm call so the solo shake-out launch does
        # not deflate the measured micro-batch occupancy
        processor.batcher.batch_sizes.clear()
        lat, wall = run_load(do_request, c, args.requests)
        n = len(lat)
        sizes = processor.batcher.batch_sizes
        row = dict(
            concurrency=c,
            mode='http' if args.http else 'engine',
            p50_ms=round(statistics.median(lat) * 1e3, 2),
            # nearest-rank p99: index ceil(0.99 n) - 1
            p99_ms=round(sorted(lat)[min(n - 1, max(
                0, -(-99 * n // 100) - 1))] * 1e3, 2),
            mean_ms=round(statistics.mean(lat) * 1e3, 2),
            requests_per_s=round(n / wall, 2),
            mean_batch_clips=round(statistics.mean(sizes), 2)
            if sizes else None,
            launches=len(sizes),
        )
        results.append(row)
        print(json.dumps(row), flush=True)

    processor.close()
    print(json.dumps(dict(image=args.image, dtype=args.dtype,
                          frames=args.frames, results=results)))


if __name__ == '__main__':
    main()
