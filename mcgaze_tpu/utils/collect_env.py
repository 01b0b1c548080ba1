"""Environment report (reference mmdet/utils/collect_env.py analogue):
versions, devices, platform — printed at the top of training logs and by
`python -m mcgaze_tpu.utils.collect_env`."""
from __future__ import annotations

import platform
import sys


def collect_env() -> dict:
    info = {
        'python': sys.version.replace('\n', ' '),
        'platform': platform.platform(),
    }
    for mod in ('jax', 'jaxlib', 'flax', 'optax', 'orbax.checkpoint',
                'numpy', 'cv2'):
        try:
            m = __import__(mod)
            for part in mod.split('.')[1:]:
                m = getattr(m, part)
            info[mod] = getattr(m, '__version__', 'unknown')
        except ImportError:
            info[mod] = 'not installed'
    try:
        import jax
        devs = jax.devices()
        info['jax_backend'] = jax.default_backend()
        info['devices'] = f'{len(devs)} x {devs[0].device_kind}'
        info['process_count'] = jax.process_count()
    except Exception as e:                        # backend may be unreachable
        info['jax_backend'] = f'unavailable ({type(e).__name__})'
    from ..data.native_loader import native_available
    info['native_loader'] = ('built' if native_available()
                             else 'not built (python fallback)')
    return info


def main():
    for k, v in collect_env().items():
        print(f'{k}: {v}')


if __name__ == '__main__':
    main()
