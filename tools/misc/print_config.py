#!/usr/bin/env python
"""Print the fully-resolved config (reference CLI surface:
tools/misc/print_config.py <config> [--cfg-options ...]).

Works on both native dataclass configs and unmodified reference
mmcv-style configs (utils/config.py translates the latter), so it doubles
as a quick check of what a legacy config maps onto.
"""
import argparse
import dataclasses
import os.path as osp
import pprint
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), '..', '..'))


def parse_args():
    p = argparse.ArgumentParser(description='Print the whole config')
    p.add_argument('config')
    p.add_argument('--cfg-options', nargs='+', default=None,
                   help="config overrides 'a.b=val' (reference DictAction "
                        'surface)')
    return p.parse_args()


def main():
    args = parse_args()
    from mcgaze_tpu.utils.cfg_options import apply_overrides
    from mcgaze_tpu.utils.config import load_config

    cfg = apply_overrides(load_config(args.config), args.cfg_options)
    print(f'Config (resolved from {args.config}):')
    for field in dataclasses.fields(cfg):
        val = getattr(cfg, field.name)
        if dataclasses.is_dataclass(val):
            print(f'{field.name} = {type(val).__name__}(')
            for f2 in dataclasses.fields(val):
                print(f'    {f2.name}={getattr(val, f2.name)!r},')
            print(')')
        else:
            print(f'{field.name} = {pprint.pformat(val)}')


if __name__ == '__main__':
    main()
