"""Checkpoint IO (orbax) — replaces mmcv CheckpointHook + load_checkpoint
(reference apis/train.py:164-170, apis/inference.py:46)."""
from __future__ import annotations

import os
import os.path as osp
import re
from typing import Any

import orbax.checkpoint as ocp


def save_checkpoint(work_dir: str, step: int, tree: Any,
                    max_to_keep: int | None = None,
                    train_tree: Any = None) -> str:
    """Write ckpt_<step> (model: params/stats — what eval and export
    load); optionally ckpt_<step>_train (opt_state/step/EMA — what resume
    additionally needs). The split keeps eval-side restores from reading
    the ~2x-params optimizer moments. With max_to_keep, prune older
    checkpoints (reference CheckpointHook max_keep_ckpts)."""
    path = osp.abspath(osp.join(work_dir, f'ckpt_{step}'))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    if train_tree is not None:
        ckptr.save(path + '_train', train_tree, force=True)
    ckptr.wait_until_finished()
    if max_to_keep:
        import shutil
        steps = sorted(
            int(m.group(1)) for m in
            (re.fullmatch(r'ckpt_(\d+)', n) for n in os.listdir(work_dir))
            if m)
        for s in steps[:-max_to_keep]:
            for suffix in ('', '_train'):
                shutil.rmtree(osp.join(work_dir, f'ckpt_{s}{suffix}'),
                              ignore_errors=True)
    return path


def restore_checkpoint(path: str, target: Any = None) -> Any:
    """Restore a pytree saved by save_checkpoint. With `target`, restores
    into that structure/shape skeleton; without, returns whatever the
    checkpoint holds (callers pick the subtrees they need, so an eval-only
    consumer can open a full train-state checkpoint)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(osp.abspath(path), target)


def find_latest_checkpoint(work_dir: str) -> str | None:
    """Auto-resume discovery (reference apis/train.py:199-208)."""
    if not osp.isdir(work_dir):
        return None
    best, best_step = None, -1
    for name in os.listdir(work_dir):
        m = re.fullmatch(r'ckpt_(\d+)', name)
        if m and int(m.group(1)) > best_step:
            best, best_step = osp.join(work_dir, name), int(m.group(1))
    return best
