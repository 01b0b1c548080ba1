#!/usr/bin/env python
"""Prepare a checkpoint for publication (reference surface:
tools/model_converters/publish_model.py:17-43 — strip the optimizer
state for size, then content-hash the file and rename it
`{out}-{sha256[:8]}`).

Handles both checkpoint formats this framework reads:
  * an orbax checkpoint dir from tools/train.py: publishes ONLY the
    eval split (params/stats) — the `_train` sibling (opt_state, EMA,
    step) is the optimizer state the reference deletes;
  * a torch .pth: drops the 'optimizer' key and re-saves.

    python tools/model_converters/publish_model.py work_dirs/x/ckpt_7000 \
        release/mcgaze_r50_gaze360
    -> release/mcgaze_r50_gaze360-<sha8>  (loadable by every tools/ CLI)
"""
import argparse
import hashlib
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mcgaze_tpu.utils.env import setup_jax_platform  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('in_file', help='orbax checkpoint dir or torch .pth')
    p.add_argument('out_file', help='output path (hash suffix appended)')
    p.add_argument('--ema', action='store_true',
                   help='publish the EMA weights from <in>_train as the '
                        'params (reference EMAHook eval-swap semantics)')
    return p.parse_args()


def _hash_tree(path: str) -> str:
    """sha256 over file contents in deterministic path order (the
    reference hashes the single .pth file; an orbax checkpoint is a
    directory)."""
    h = hashlib.sha256()
    if osp.isfile(path):
        with open(path, 'rb') as f:
            for chunk in iter(lambda: f.read(1 << 20), b''):
                h.update(chunk)
        return h.hexdigest()
    for root, dirs, files in sorted(os.walk(path)):
        dirs.sort()
        for name in sorted(files):
            full = osp.join(root, name)
            h.update(osp.relpath(full, path).encode())
            with open(full, 'rb') as f:
                for chunk in iter(lambda: f.read(1 << 20), b''):
                    h.update(chunk)
    return h.hexdigest()


def publish_checkpoint(in_file: str, out_file: str,
                       ema: bool = False) -> str:
    if in_file.endswith(('.pth', '.pt')):
        if ema:
            raise SystemExit('--ema applies to orbax checkpoints; torch '
                             '.pth files carry no EMA split')
        import torch
        ckpt = torch.load(in_file, map_location='cpu')
        ckpt.pop('optimizer', None)  # publish_model.py:21-22
        if not out_file.endswith('.pth'):
            out_file += '.pth'
        torch.save(ckpt, out_file)
        sha = _hash_tree(out_file)
        final = f'{out_file[:-4]}-{sha[:8]}.pth'
        os.replace(out_file, final)
    else:
        from mcgaze_tpu.utils.checkpoint import restore_checkpoint
        import orbax.checkpoint as ocp
        restored = restore_checkpoint(in_file.rstrip('/'))
        params = restored['params']
        if ema:
            train = restore_checkpoint(in_file.rstrip('/') + '_train')
            if not isinstance(train, dict) or \
                    train.get('ema_params') is None:
                raise SystemExit(f'{in_file}_train holds no ema_params — '
                                 'train with optim.ema_momentum > 0')
            params = train['ema_params']
        tree = {'params': params, 'stats': restored['stats']}
        out_file = osp.abspath(out_file.rstrip('/'))
        os.makedirs(osp.dirname(out_file), exist_ok=True)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(out_file, tree, force=True)
        ckptr.wait_until_finished()
        sha = _hash_tree(out_file)
        final = f'{out_file}-{sha[:8]}'
        if osp.exists(final):
            import shutil
            shutil.rmtree(final)
        os.replace(out_file, final)
    print(f'published {final} (sha256 {sha[:8]})')
    return final


def main():
    setup_jax_platform()
    args = parse_args()
    publish_checkpoint(args.in_file, args.out_file, args.ema)


if __name__ == '__main__':
    main()
