#!/usr/bin/env python
"""Package a model (config + checkpoint) into a self-contained serving
directory — the analogue of the reference's TorchServe archiver
(tools/deployment/mmdet2torchserve.py:15-67: config + serialized file +
handler manifest -> `{model_name}.mar`).

The package is a plain directory (`{output_folder}/{model_name}/`)
holding the config, the checkpoint (torch .pth file or orbax dir), and
MANIFEST.json; `tools/deployment/serve.py <package_dir>` serves it with
no other arguments. `--archive` additionally tars the directory to
`{model_name}.mar` for single-file distribution.
"""
import argparse
import json
import os
import os.path as osp
import shutil
import sys
import tarfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config', help='config file path')
    p.add_argument('checkpoint', help='orbax checkpoint dir or torch .pth')
    p.add_argument('--output-folder', required=True)
    p.add_argument('--model-name', default=None,
                   help='default: checkpoint basename '
                        '(mmdet2torchserve.py:57)')
    p.add_argument('--model-version', default='1.0')
    p.add_argument('--archive', action='store_true',
                   help='also write {model_name}.mar (tar of the dir)')
    p.add_argument('-f', '--force', action='store_true',
                   help='overwrite an existing package')
    return p.parse_args()


def package_model(config: str, checkpoint: str, output_folder: str,
                  model_name: str = None, model_version: str = '1.0',
                  force: bool = False, archive: bool = False) -> str:
    name = model_name or osp.splitext(osp.basename(
        checkpoint.rstrip('/')))[0]
    pkg = osp.join(output_folder, name)
    if osp.exists(pkg):
        if not force:
            raise SystemExit(f'{pkg} exists (use --force to overwrite)')
        shutil.rmtree(pkg)
    os.makedirs(pkg)

    cfg_name = 'config' + osp.splitext(config)[1]
    shutil.copy(config, osp.join(pkg, cfg_name))
    ckpt_name = osp.basename(checkpoint.rstrip('/'))
    if osp.isdir(checkpoint):
        shutil.copytree(checkpoint, osp.join(pkg, ckpt_name))
        # resume/EMA split, if present (utils/checkpoint.py
        # save_checkpoint): serving --ema needs it
        train_split = checkpoint.rstrip('/') + '_train'
        if osp.isdir(train_split):
            shutil.copytree(train_split,
                            osp.join(pkg, ckpt_name + '_train'))
    else:
        shutil.copy(checkpoint, osp.join(pkg, ckpt_name))

    manifest = dict(model_name=name, version=model_version,
                    config=cfg_name, checkpoint=ckpt_name,
                    runtime='jax-tpu',
                    created=time.strftime('%Y-%m-%dT%H:%M:%SZ',
                                          time.gmtime()))
    with open(osp.join(pkg, 'MANIFEST.json'), 'w') as f:
        json.dump(manifest, f, indent=2)

    if archive:
        mar = osp.join(output_folder, f'{name}.mar')
        with tarfile.open(mar, 'w') as tar:
            tar.add(pkg, arcname=name)
        print(f'archived {mar}')
    print(f'packaged {pkg}')
    return pkg


def main():
    args = parse_args()
    package_model(args.config, args.checkpoint, args.output_folder,
                  args.model_name, args.model_version, args.force,
                  args.archive)


if __name__ == '__main__':
    main()
