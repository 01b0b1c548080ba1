"""Video gaze evaluation driver.

Port of the reference eval entry (tools/test_gaze360_gaze.py:49-260), the
flow behind the published 10.74/9.81 MAE numbers:

  per video: 7-frame clips at stride 4, last clip right-aligned
  -> batched model forward (boxes rescaled back by 1/scale_factor)
  -> clip stitching: coords of boxes scoring < 0.5 zeroed; frames covered
     by two clips averaged (boxes mask-aware, gazes plain mean)
  -> per-video dict {video_id, fusion_gazes, {face,eyes,head}_{bboxes,
     gazes,score}} with xywh boxes (zero boxes -> None)

TPU-first deviations from the reference:
  * clips are BATCHED (clip_batch clips per forward, power-of-two padded
    to a handful of compiled shapes) instead of one-clip-at-a-time;
  * the test-time CenterCrop ratio defaults to deterministic (mid-range
    of the reference's per-frame uniform [0.68, 1) sample — the reference
    evals with unseeded RNG, so exact replication is impossible anyway);
    set EvalConfig.crop_mode='reference' for seeded per-frame U[0.68, 1)
    sampling matching the reference's distribution.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Tuple

import numpy as np

from ..data import transforms as T

PERSON_THRESHOLD = 0.5


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    clip_length: int = 7
    stride: int = 4
    scale: Tuple[int, int] = (224, 224)
    canvas: Tuple[int, int] = (224, 224)
    crop_ratio: Optional[float] = 0.84  # mid of reference's U[0.68, 1)
    # 'fixed': every frame cropped at crop_ratio (deterministic, the
    # default deviation documented above). 'reference': per-frame ratio
    # ~ U[crop_size, 1) from a seeded RNG — replicates the reference test
    # pipeline's unseeded per-frame sampling (transforms.py:1128-1144,
    # threaded per frame in test_gaze360_gaze.py:87-94) reproducibly.
    crop_mode: str = 'fixed'
    crop_size: float = 0.68             # reference-mode lower bound
    crop_seed: int = 0
    clip_batch: int = 8
    # Ship raw uint8 frames to the device and normalize inside the jit
    # (4x less host->device traffic; identical numerics — load() and
    # load_u8() normalize the same resized uint8 pixels, host or device
    # side). Takes effect only when the native loader with u8 support is
    # available AND the forward_fn declares accepts_uint8=True
    # (evaluation/forward.py::bind_forward does — so every tools/ CLI
    # gets it, while plain-f32 forward_fns keep normalized frames).
    # Measured: 110 vs 69.6 frames/s pipelined e2e on the 1-core bench
    # host (tools/analysis_tools/benchmark.py --e2e).
    ship_uint8: bool = True
    # Consecutive stride-4 clips share clip_length - stride frames; when
    # the forward_fn exposes a .dedup variant (evaluation/forward.py),
    # send each chunk's UNIQUE frame window + gather indices so
    # backbone+FPN run once per frame instead of once per clip slot
    # (~40% less conv work + H2D traffic, numerically exact).
    dedup_frames: bool = True


def clip_slices(video_length: int, clip_len: int, stride: int):
    """[(start, length, overlap_with_previous)] per reference :73-86."""
    if video_length <= clip_len:
        return [(0, video_length, 0)]
    clip_num = math.ceil((video_length - clip_len) / stride) + 1
    out = []
    for i in range(clip_num):
        if i != clip_num - 1:
            start = i * stride
            overlap = clip_len - stride
        else:
            start = video_length - clip_len
            rem = (video_length - clip_len) % stride
            overlap = clip_len - rem if rem else clip_len - stride
        out.append((start, clip_len, 0 if i == 0 else overlap))
    return out


def crop_ratios(cfg: EvalConfig, num_frames: int, video_id: int):
    """Per-frame crop ratios for one video, or None when cropping is off
    (crop_ratio=None — the l2cs eval setting, no CenterCrop)."""
    if cfg.crop_ratio is None:
        if cfg.crop_mode == 'reference':
            raise ValueError(
                "crop_mode='reference' with crop_ratio=None is "
                'contradictory: reference mode replicates the per-frame '
                'U[crop_size, 1) CenterCrop, but crop_ratio=None disables '
                'cropping entirely (the l2cs eval setting). Set a '
                "crop_ratio or use crop_mode='fixed'.")
        return None
    if cfg.crop_mode == 'reference':
        rng = np.random.RandomState(cfg.crop_seed + video_id)
        return (cfg.crop_size +
                rng.rand(num_frames) * (1.0 - cfg.crop_size)).tolist()
    assert cfg.crop_mode == 'fixed', cfg.crop_mode
    return [cfg.crop_ratio] * num_frames


def preprocess_frames(frames: list, cfg: EvalConfig, ratios=None):
    """frames: list of HxWx3 RGB uint8 -> (imgs (F,canvas,3), whwh (F,4),
    scale_factors (F,4))."""
    if ratios is None:
        ratios = [cfg.crop_ratio] * len(frames)
    imgs, whwh, sfs = [], [], []
    for fr, ratio in zip(frames, ratios):
        params = T.ClipParams(crop_ratio=ratio, flip=False)
        r = T.process_frame(fr, params, cfg.scale, cfg.canvas)
        imgs.append(r['img'])
        whwh.append(r['whwh'])
        sfs.append(r['scale_factor'])
    return np.stack(imgs), np.stack(whwh), np.stack(sfs)


def preprocess_frames_u8(frames: list, cfg: EvalConfig, ratios=None):
    """uint8 variant of preprocess_frames: identical crop/resize/pad
    geometry but NO host-side normalization, so frames ship to the
    device as raw u8 (4x less H2D traffic; the jitted forward
    normalizes + zeroes the pad on-device —
    evaluation/forward.py::normalize; equality proven by
    test_native_dataset.py::test_ship_uint8_eval_matches_f32)."""
    if ratios is None:
        ratios = [cfg.crop_ratio] * len(frames)
    imgs, whwh, sfs = [], [], []
    for fr, ratio in zip(frames, ratios):
        if ratio is not None:
            fr, _, _, _ = T.center_crop(fr, ratio)
        fr, _, sf = T.resize_keep_ratio(fr, cfg.scale)
        h, w = fr.shape[:2]
        imgs.append(T.pad_to_canvas(fr, cfg.canvas))
        whwh.append(np.array([w, h, w, h], np.float32))
        sfs.append(sf)
    return np.stack(imgs), np.stack(whwh), np.stack(sfs)


def pack_outputs(boxes, scores, gazes):
    """Forward outputs -> (gaze_names, flat (N, 27) device array): one
    packed array so the device->host readback is ONE transfer instead of
    six (each transfer through the tunnelled bench platform pays a
    ~27 ms RTT). Shared by the eval driver (per-video readback) and the
    serving engine (per-launch readback); _split_flat inverts it."""
    import jax.numpy as jnp
    names = tuple(sorted(gazes))
    n = boxes.shape[0]
    flat = jnp.concatenate(
        [jnp.reshape(boxes, (n, 12)).astype(jnp.float32),
         jnp.reshape(scores, (n, 3)).astype(jnp.float32)] +
        [jnp.reshape(gazes[m], (n, 3)).astype(jnp.float32)
         for m in names], axis=1)
    return names, flat


class VideoGazeEvaluator:
    """Stitches batched clip predictions into per-video tracks.

    forward_fn(imgs (K*T, H, W, 3), whwh (K*T, 4), T) ->
        (boxes (K*T, 3, 4), scores (K*T, 3), gazes dict of (K*T, 3))
    """

    def __init__(self, forward_fn: Callable, cfg: EvalConfig = EvalConfig()):
        self.forward = forward_fn
        self.cfg = cfg
        # host-time accounting per phase (seconds, cumulative) — decode
        # and put run in the producer thread, the rest in the consumer;
        # on a single-core host the cross-thread sum ~ wall time, which
        # is what localises a host-bound pipeline (benchmark.py --e2e
        # prints this breakdown)
        self.phase_seconds: dict = {}

    def _phase(self, name: str, t0: float):
        import time
        self.phase_seconds[name] = (self.phase_seconds.get(name, 0.0)
                                    + time.perf_counter() - t0)

    def _submit_clips(self, imgs, whwh, starts, length):
        """Dispatches clips [start:start+length] batched WITHOUT forcing
        the device result — jit dispatch is async, so the caller can
        submit every chunk of a video before reading any back (one
        device->host sync per video instead of per chunk; on the
        tunnelled bench platform each readback costs a ~27 ms RTT).

        The clip count is padded up to the next power of two (capped at
        clip_batch) by repeating the last clip, so XLA compiles at most
        log2(clip_batch)+1 shapes instead of one per distinct tail size.
        Measured (idle v5e-1, bf16, dedup): k=4/8/16/32 cost
        9.38/9.06/14.16/24.79 ms — below k~8 the forward is
        latency-bound, so short-tail padding is free in wall-clock, and
        pow2 beats a pad-to-clip_batch single shape everywhere (NOTES.md
        round 3 item 8).

        The per-slot outputs (boxes, scores, four gaze vectors) are
        packed into ONE (k_pad*length, 27) device array: every
        device->host transfer on the tunnelled bench platform pays a
        ~27 ms RTT, so reading 6 tiny arrays per chunk was RTT-bound
        (measured 7.0 s of an 8.2 s 448 px e2e run spent in collect);
        one packed array per VIDEO (chunks are concatenated on device in
        _run_preprocessed) makes the readback cost one RTT. Returns
        (k, k_pad, gaze_names, flat) with flat a device array.
        """
        cfg = self.cfg
        k = len(starts)
        k_pad = min(cfg.clip_batch,
                    1 if k <= 1 else 1 << (k - 1).bit_length())
        starts = list(starts) + [starts[-1]] * (k_pad - k)
        dedup = getattr(self.forward, 'dedup', None)
        if dedup is not None and cfg.dedup_frames:
            # unique-frame window: starts within a chunk ascend by at most
            # stride (clip_slices), so span is static per (k_pad, length)
            # compile shape; tail slack repeats the last frame (computed
            # but never selected)
            lo = starts[0]
            span = cfg.stride * (k_pad - 1) + length
            idx = np.minimum(np.arange(lo, lo + span), imgs.shape[0] - 1)
            sel = np.concatenate(
                [np.arange(s - lo, s - lo + length) for s in starts])
            boxes, scores, gazes = dedup(imgs[idx], sel, whwh[idx], length)
        else:
            sel = np.concatenate(
                [np.arange(s, s + length) for s in starts])
            boxes, scores, gazes = self.forward(imgs[sel], whwh[sel],
                                                length)
        names, flat = pack_outputs(boxes, scores, gazes)
        return k, k_pad, names, flat

    @staticmethod
    def _split_flat(flat, k, k_pad, names, length):
        """(k_pad*length, 27) numpy -> (boxes, scores, gazes) per-clip."""
        boxes = flat[:, :12].reshape(k_pad, length, 3, 4)[:k]
        scores = flat[:, 12:15].reshape(k_pad, length, 3)[:k]
        gazes = {m: flat[:, 15 + 3 * i:18 + 3 * i].reshape(
                     k_pad, length, 3)[:k]
                 for i, m in enumerate(names)}
        return boxes, scores, gazes

    @staticmethod
    def _collect_clips(pending, length):
        """Forces a _submit_clips result to numpy per-clip preds."""
        k, k_pad, names, flat = pending
        return VideoGazeEvaluator._split_flat(np.asarray(flat), k, k_pad,
                                              names, length)

    def _forward_clips(self, imgs, whwh, starts, length):
        """Submit + force in one call (single-chunk convenience)."""
        return self._collect_clips(
            self._submit_clips(imgs, whwh, starts, length), length)

    def _decode_video(self, paths: list, video_id: int):
        """Host half of the eval path: decode + crop/resize/normalize/pad
        the whole video in the native C++ thread pool (cv2 + the python
        pipeline when the native lib isn't built).
        Returns (imgs, whwh, sfs, num_frames)."""
        cfg = self.cfg
        native = getattr(self, '_native', None)
        if native is None:
            try:
                from ..data.native_loader import NativeClipLoader
                native = self._native = NativeClipLoader()
            except (RuntimeError, OSError):
                self._native = False
                native = False
        f = len(paths)
        crop = crop_ratios(cfg, f, video_id)
        if native is False:
            import cv2
            frames = []
            for p in paths:
                img = cv2.imread(p)
                if img is None:
                    raise FileNotFoundError(p)
                frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
            imgs, whwh, sfs = preprocess_frames(frames, cfg, crop)
            return imgs, whwh, sfs, f
        if (cfg.ship_uint8 and getattr(native, '_has_u8', False)
                and getattr(self.forward, 'accepts_uint8', False)):
            imgs, meta = native.load_u8(paths, crop, None, cfg.scale,
                                        cfg.canvas)
        else:
            imgs, meta = native.load(paths, crop, None, cfg.scale,
                                     cfg.canvas)
        new_h = meta[:, 4].astype(np.float32)
        new_w = meta[:, 5].astype(np.float32)
        whwh = np.stack([new_w, new_h, new_w, new_h], -1)
        sfs = np.stack([new_w / meta[:, 3], new_h / meta[:, 2],
                        new_w / meta[:, 3], new_h / meta[:, 2]],
                       -1).astype(np.float32)
        return imgs, whwh, sfs, f

    def run_video_from_paths(self, paths: list, video_id: int) -> dict:
        """Decode (native pool) + forward + stitch one video."""
        imgs, whwh, sfs, f = self._decode_video(paths, video_id)
        return self._run_preprocessed(imgs, whwh, sfs, f, video_id)

    def run_videos_from_paths(self, videos, prefetch: int = 4,
                              device_put: bool = True, devices=None):
        """Pipelined eval over (video_id, paths) pairs: a background
        thread decodes videos N+1..N+prefetch through the C++ pool AND
        ships each video's frames to device memory while video N's clips
        forward, so the chip never idles on host decode or H2D (the
        reference threads per-frame loading against the GPU the same way,
        tools/test_gaze360_gaze.py:87-94; round-2 VERDICT flagged the
        serial decode->forward ordering as the remaining eval
        bottleneck). With device-resident frames the per-chunk clip
        gather in _submit_clips runs on-device instead of re-copying
        overlapping windows from the host. Yields per-video result dicts
        in input order.

        prefetch=4 default: the tunnelled bench platform degrades H2D to
        ~50 MB/s (latency-serialized) after the FIRST device->host
        readback of the process — an axon transfer-mode quirk (probed:
        1.2 GB/s before any D2H, ~0.7 s per 36 MB video after, CPU-idle
        wait, not dtype/shape/thread-specific, unrecoverable). Keeping
        several decoded videos in flight keeps the transfer stream fed
        behind compute: at 448 px (8x60-frame videos) prefetch 2 -> 4
        measured 64.8 -> 86 frames/s; 6/8 plateau (85.1/82.9). Cost is
        prefetch x one video of u8 frames in host+device memory.

        Multi-device: videos round-robin over `devices` (default
        jax.local_devices()) — the single-process analogue of the
        reference's one-process-per-GPU eval (apis/test.py:81-135). Each
        video's frames are committed to its device, its clip forwards run
        there (bind_forward keeps a resident params copy per device), and
        up to len(devices) videos stay in flight so all local chips
        compute concurrently; readback forces only the oldest video's
        device. Results still yield in input order. With one device this
        reduces exactly to the round-3 submit-then-force path."""
        from .pipeline import run_pipelined

        if device_put:
            import jax
            if devices is None:
                devices = jax.local_devices()
        n_dev = len(devices) if (device_put and devices) else 1

        def produce(i, vid, paths):
            import time
            t0 = time.perf_counter()
            imgs, whwh, sfs, f = self._decode_video(paths, vid)
            self._phase('decode', t0)
            if device_put:
                import jax
                t0 = time.perf_counter()
                dev = devices[i % n_dev]
                imgs = jax.device_put(imgs, dev)  # async H2D, whole video
                whwh = jax.device_put(whwh, dev)
                self._phase('device_put', t0)
            return vid, (imgs, whwh, sfs, f)

        def submit(vid, payload):
            imgs, whwh, sfs, f = payload
            return sfs, f, self._submit_video(imgs, whwh, f)

        def finish(vid, pending):
            sfs, f, sub = pending
            return self._finish_video(sub, sfs, f, vid)

        yield from run_pipelined(videos, produce, submit, finish,
                                 prefetch=prefetch, depth=n_dev)

    def run_video(self, frames: list, video_id: int) -> dict:
        cfg = self.cfg
        f = len(frames)
        # same u8-shipping rule as the native-loader path (_decode_video):
        # raw frames + on-device normalize when the forward supports it —
        # so this path runs the SAME compiled programs as the CLI flow
        prep = (preprocess_frames_u8
                if cfg.ship_uint8 and getattr(self.forward,
                                              'accepts_uint8', False)
                else preprocess_frames)
        imgs, whwh, sfs = prep(frames, cfg, crop_ratios(cfg, f, video_id))
        return self._run_preprocessed(imgs, whwh, sfs, f, video_id)

    def _run_preprocessed(self, imgs, whwh, sfs, f, video_id) -> dict:
        return self._finish_video(self._submit_video(imgs, whwh, f),
                                  sfs, f, video_id)

    def _submit_video(self, imgs, whwh, f):
        """Dispatch every chunk of one video (async, no device sync).
        Returns the pending state _finish_video consumes — the split lets
        run_videos_from_paths keep one video in flight PER local device."""
        import time
        cfg = self.cfg
        slices = clip_slices(f, cfg.clip_length, cfg.stride)
        length = slices[0][1]
        # batched forward over all clips of the video: submit every chunk
        # (async dispatch); the force happens in _finish_video — one
        # device sync per video
        starts = [s[0] for s in slices]
        t0 = time.perf_counter()
        pending = [self._submit_clips(imgs, whwh,
                                      starts[i:i + cfg.clip_batch], length)
                   for i in range(0, len(starts), cfg.clip_batch)]
        self._phase('submit', t0)
        return pending, slices, starts, length

    def _finish_video(self, submitted, sfs, f, video_id) -> dict:
        import time
        pending, slices, starts, length = submitted
        all_boxes, all_scores, all_gazes = [], [], []
        t0 = time.perf_counter()
        if len(pending) > 1:
            # concatenate every chunk's packed output on device and read
            # the whole video back in ONE transfer (see _submit_clips on
            # the per-transfer RTT cost)
            import jax.numpy as jnp
            whole = np.asarray(jnp.concatenate([p[3] for p in pending], 0))
            row = 0
            for k, k_pad, names, _ in pending:
                nrows = k_pad * length
                b, s, g = self._split_flat(whole[row:row + nrows], k,
                                           k_pad, names, length)
                row += nrows
                all_boxes.append(b)
                all_scores.append(s)
                all_gazes.append(g)
        else:
            for p in pending:
                b, s, g = self._collect_clips(p, length)
                all_boxes.append(b)
                all_scores.append(s)
                all_gazes.append(g)
        self._phase('collect', t0)
        t0 = time.perf_counter()
        boxes = np.concatenate(all_boxes)          # (K, T, 3, 4)
        scores = np.concatenate(all_scores)        # (K, T, 3)
        gazes = {k: np.concatenate([g[k] for g in all_gazes])
                 for k in all_gazes[0]}

        # rescale boxes to pre-resize (cropped-image) coords, as the
        # reference does with rescale=True (multiclue_gaze_roi_head.py:363)
        for ki, s0 in enumerate(starts):
            boxes[ki] /= sfs[s0:s0 + length][:, None, :]

        # stitch (reference :129-206), (3, F, 5)/(3, F, 3) video tracks
        vb = np.zeros((3, f, 5), np.float32)
        vg = np.zeros((3, f, 3), np.float32)
        vf = np.zeros((1, f, 3), np.float32)
        for ki, (start, length, overlap) in enumerate(slices):
            cb = np.concatenate([boxes[ki], scores[ki][..., None]],
                                -1).transpose(1, 0, 2)     # (3, T, 5)
            mask = cb[..., -1:] < PERSON_THRESHOLD
            cb[..., :4] = np.where(mask, 0.0, cb[..., :4])
            cg = np.stack([gazes['face'][ki], gazes['eyes'][ki],
                           gazes['head'][ki]], 1).transpose(1, 0, 2)
            cf = gazes['fusion'][ki][None]                 # (1, T, 3)
            if ki == 0:
                vb[:, :length] = cb
                vg[:, :length] = cg
                vf[:, :length] = cf
                continue
            new = length - overlap
            end = start + length
            # non-overlapping tail: direct assignment
            vb[:, end - new:end] = cb[:, -new:]
            vg[:, end - new:end] = cg[:, -new:]
            vf[:, end - new:end] = cf[:, -new:]
            # overlap: average; boxes invalid in either side -> zeros
            o1 = vb[:, start:start + overlap]
            o2 = cb[:, :overlap]
            m = np.logical_or(o1[..., -1:] < PERSON_THRESHOLD,
                              o2[..., -1:] < PERSON_THRESHOLD)
            avg = (o1 + o2) / 2
            avg[..., :4] = np.where(m, 0.0, avg[..., :4])
            vb[:, start:start + overlap] = avg
            vg[:, start:start + overlap] = (
                vg[:, start:start + overlap] + cg[:, :overlap]) / 2
            vf[:, start:start + overlap] = (
                vf[:, start:start + overlap] + cf[:, :overlap]) / 2

        out = self._to_result(video_id, vb, vg, vf)
        self._phase('stitch', t0)
        return out

    @staticmethod
    def _to_result(video_id, vb, vg, vf) -> dict:
        obj = dict(video_id=video_id, category_id=1, fusion_gazes=[])
        for clue in ('face', 'eyes', 'head'):
            obj[f'{clue}_bboxes'] = []
            obj[f'{clue}_gazes'] = []
            obj[f'{clue}_score'] = []
        f = vb.shape[1]
        for t in range(f):
            obj['fusion_gazes'].append(vf[0, t].tolist())
            for qi, clue in enumerate(('face', 'eyes', 'head')):
                b = vb[qi, t, :4]
                if float(b.sum()) == 0.0:
                    obj[f'{clue}_bboxes'].append(None)
                else:
                    obj[f'{clue}_bboxes'].append(
                        [float(b[0]), float(b[1]),
                         float(b[2] - b[0]), float(b[3] - b[1])])
                obj[f'{clue}_gazes'].append(vg[qi, t].tolist())
                obj[f'{clue}_score'].append(float(vb[qi, t, 4]))
        return obj
