"""MCGaze: end-to-end video gaze estimation, TPU-native.

The full model of the reference (detector MultiClueGaze + FixedEmbeddingRPN
+ MultiClueGazeROIHead, see mmdet/models/detectors/multiclue_gaze.py and
mmdet/models/roi_heads/multiclue_gaze_roi_head.py) collapsed into ONE pure
function over static shapes:

    clip (B*T, H, W, 3) -> ResNet50 -> FPN -> 3 learned queries/boxes
      -> 4x [RoIAlign -> STQI -> delta decode -> GazeHead]

All four stages unroll at trace time (stage list is a compile-time
constant), so a single jit compiles the whole iterative refinement; the
per-stage python loops of the reference (assign/sample per frame,
multiclue_gaze_roi_head.py:237-257) do not exist here — targets are mask
arithmetic in train/targets.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry import bbox_cxcywh_to_xyxy, delta2bbox
from ..ops.roi_align import roi_align_fpn_mm
from .fpn import FPN
from .heads import GazeHead, STQIHead
from .resnet import ResNet


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    backbone_depth: int = 50
    num_stages: int = 4
    clip_length: int = 7
    num_queries: int = 3
    channels: int = 256
    ffn_channels: int = 2048
    num_heads: int = 8
    dyn_feat_channels: int = 64
    num_cls_fcs: int = 1
    num_reg_fcs: int = 3
    roi_size: int = 7
    sampling_ratio: int = 2
    strides: Tuple[int, ...] = (4, 8, 16, 32)
    finest_scale: float = 56.0
    gaze_dim: int = 3
    dtype: str = 'float32'
    # Fuse each stage's dual-layout attention (+2 LNs) into one pallas
    # kernel (ops/stqi_attention.py). Param tree is unchanged, so the flag
    # can flip on a loaded checkpoint.
    fused_attention: bool = False
    # Run the per-clue cls/reg heads and the GazeHead gaze/confidence
    # towers as ONE (3, C, C') batched GEMM per layer instead of three
    # Dense calls (models/heads.py::_batched_towers). Param tree
    # unchanged; the flag can flip on a loaded checkpoint. MEASURED
    # NEUTRAL on the eval workload (idle v5e-1, dedup batch 32, bf16:
    # 24.21 ms unbatched vs 24.10 ms batched, within host noise — the
    # heads already sit inside one XLA program, so there was no dispatch
    # overhead to remove); kept opt-in.
    batched_clue_heads: bool = False
    # RoIAlign implementation: 'mm' (one-hot XLA matmuls), 'pallas'
    # (fused per-frame VMEM kernel, ops/roi_align_pallas.py — measured
    # faster on TPU), or 'auto' (pallas on TPU, mm elsewhere). All three
    # are numerically interchangeable (tests/test_roi_align.py).
    roi_impl: str = 'auto'
    # Backbone stride-1 bottleneck chains: 'fused' runs them through the
    # pallas chain kernel (ops/fused_bottleneck.py), 'plain' keeps XLA
    # convs. Same param tree and numerics (tests/test_fused_bottleneck.py),
    # but MEASURED SLOWER than XLA's convs at R50 shapes (7.4 vs 6.8 ms on
    # layer1 at the eval batch: the 64-wide ops pad to 128 MXU lanes both
    # ways) — kept opt-in, same discipline as ops/stqi_attention.py.
    backbone_impl: str = 'plain'
    # loss weights (configs/multiclue_gaze/multiclue_gaze_r50_gaze360.py)
    loss_cls_weight: float = 2.0
    loss_bbox_weight: float = 5.0
    loss_iou_weight: float = 2.0
    loss_gaze_weight: float = 6.0
    loss_temp_weight: float = 1.0
    # per-clue gaze loss: 'arccos' (shipped configs) | 'cos' | 'pinball'
    # (reference registers all three, losses/__init__.py:21-24; dispatch
    # table ops/losses.py::GAZE_LOSSES)
    gaze_loss_type: str = 'arccos'
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    stage_loss_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


class MCGazeModel(nn.Module):
    """Forward producing per-stage predictions (train needs all stages for
    the deep-supervision losses; eval consumes stage -1).

    Split into `extract_features` (per-frame backbone+FPN) and `run_heads`
    (query stages) so the eval driver can deduplicate the overlapping
    frames of consecutive stride-4 clips: the backbone is per-frame, so
    computing the pyramid once per UNIQUE frame and gathering per clip is
    numerically exact while skipping ~40% of the dominant conv cost
    (reference recomputes every clip independently,
    tools/test_gaze360_gaze.py:87-111)."""
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = cfg.jnp_dtype
        q = cfg.num_queries
        self.backbone = ResNet(cfg.backbone_depth, dtype=dtype,
                               fused_blocks=cfg.backbone_impl == 'fused')
        self.neck = FPN(cfg.channels, len(cfg.strides), dtype=dtype)
        # FixedEmbeddingRPNHead: learned boxes in normalised cxcywh (init =
        # whole image) + learned 256-d query features (reference
        # fixed_embedding_rpn_head.py:41-53,76-94).
        self.init_proposal_bboxes = self.param(
            'init_proposal_bboxes',
            lambda _key, shape: jnp.tile(
                jnp.asarray([0.5, 0.5, 1.0, 1.0], jnp.float32), (q, 1)),
            (q, 4))
        self.init_proposal_features = self.param(
            'init_proposal_features', nn.initializers.normal(1.0),
            (q, cfg.channels))
        # tuple attributes name their entries bbox_head_0..N-1 — the same
        # tree as the previous nn.compact layout (checkpoint compatible)
        self.bbox_head = tuple(
            STQIHead(channels=cfg.channels, num_heads=cfg.num_heads,
                     ffn_channels=cfg.ffn_channels,
                     feat_channels=cfg.dyn_feat_channels,
                     roi_size=cfg.roi_size, num_queries=q,
                     num_cls_fcs=cfg.num_cls_fcs,
                     num_reg_fcs=cfg.num_reg_fcs,
                     fused_attention=cfg.fused_attention,
                     batched_clues=cfg.batched_clue_heads, dtype=dtype)
            for _ in range(cfg.num_stages))
        self.gaze_head = tuple(
            GazeHead(cfg.channels, cfg.gaze_dim,
                     batched_clues=cfg.batched_clue_heads, dtype=dtype)
            for _ in range(cfg.num_stages))

    def extract_features(self, imgs: jnp.ndarray) -> tuple:
        """(N, H, W, 3) normalised frames -> 4-level FPN pyramid."""
        return self.neck(self.backbone(imgs.astype(self.cfg.jnp_dtype)))

    def run_heads(self, feats: tuple, img_whwh: jnp.ndarray,
                  clip_length: int | None = None,
                  frame_idx: jnp.ndarray | None = None) -> dict:
        """Query stages over an extracted pyramid. feats levels and
        img_whwh share leading dim N = B*T — unless frame_idx (N,) is
        given, in which case feats hold only the UNIQUE frames (U ≤ N)
        and each slot reads pyramid frame frame_idx[slot]: the pallas
        RoIAlign consumes the mapping as a scalar-prefetch index map, so
        the duplicated pyramid never materialises in HBM (the dedup eval
        path, evaluation/forward.py::fwd_dedup)."""
        cfg = self.cfg
        t = clip_length or cfg.clip_length
        dtype = cfg.jnp_dtype
        n = img_whwh.shape[0]
        q = cfg.num_queries

        boxes = (bbox_cxcywh_to_xyxy(self.init_proposal_bboxes)[None]
                 * img_whwh[:, None, :])
        query = jnp.broadcast_to(
            self.init_proposal_features[None].astype(dtype),
            (n, q, cfg.channels))

        stages_out = []
        for stage in range(cfg.num_stages):
            # The reference feeds *detached* boxes forward between stages
            # (detach_proposal_list, multiclue_gaze_roi_head.py:134).
            rois = jax.lax.stop_gradient(boxes)
            impl = cfg.roi_impl
            if impl == 'auto':
                impl = ('pallas' if jax.default_backend() == 'tpu'
                        else 'mm')
            if impl == 'pallas' and frame_idx is not None:
                from ..ops.roi_align_pallas import \
                    roi_align_fpn_pallas_gather_diff
                roi_feat = roi_align_fpn_pallas_gather_diff(
                    feats, rois.astype(jnp.float32), frame_idx,
                    cfg.roi_size, cfg.sampling_ratio, cfg.strides,
                    cfg.finest_scale)
            elif impl == 'pallas':
                from ..ops.roi_align_pallas import roi_align_fpn_pallas_diff
                roi_feat = roi_align_fpn_pallas_diff(
                    feats, rois.astype(jnp.float32), cfg.roi_size,
                    cfg.sampling_ratio, cfg.strides, cfg.finest_scale)
            else:
                lv = (feats if frame_idx is None
                      else tuple(f[frame_idx] for f in feats))
                roi_feat = roi_align_fpn_mm(
                    lv, rois.astype(jnp.float32), out_size=cfg.roi_size,
                    sampling_ratio=cfg.sampling_ratio, strides=cfg.strides,
                    finest_scale=cfg.finest_scale)
            roi_feat = roi_feat.reshape(n * q, cfg.roi_size, cfg.roi_size,
                                        cfg.channels)
            cls_logits, deltas, obj = self.bbox_head[stage](
                roi_feat, query, t)
            boxes = delta2bbox(rois, deltas.astype(jnp.float32))
            gaze = self.gaze_head[stage](obj)
            stages_out.append(dict(
                cls_logits=cls_logits.astype(jnp.float32),
                boxes=boxes,
                gaze=jax.tree.map(lambda x: x.astype(jnp.float32), gaze),
            ))
            query = obj

        return dict(stages=stages_out)

    def __call__(self, imgs: jnp.ndarray, img_whwh: jnp.ndarray,
                 clip_length: int | None = None) -> dict:
        """imgs: (N, H, W, 3) normalised frames, N = B*T (T static).
        img_whwh: (N, 4) [w, h, w, h] of each frame's un-padded shape.

        Returns dict with 'stages': list over stages of
        dict(cls_logits (N,Q,1), boxes (N,Q,4) absolute xyxy,
             gaze: dict(fusion/face/eyes/head -> (N,3) unit vectors)).
        """
        return self.run_heads(self.extract_features(imgs), img_whwh,
                              clip_length)


def init_model(cfg: ModelConfig, rng: jax.Array, image_size=(224, 224)):
    """Initialise params/stats with dummy shapes. Returns (model, variables)."""
    model = MCGazeModel(cfg)
    h, w = image_size
    imgs = jnp.zeros((cfg.clip_length, h, w, 3), jnp.float32)
    whwh = jnp.tile(jnp.asarray([[w, h, w, h]], jnp.float32),
                    (cfg.clip_length, 1))
    # jitted init: one cacheable XLA program instead of hundreds of
    # op-by-op dispatches (~6x faster with a warm persistent cache)
    variables = jax.jit(model.init)(rng, imgs, whwh)
    return model, variables
