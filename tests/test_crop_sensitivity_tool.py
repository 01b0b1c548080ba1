"""Smoke the crop-sensitivity analysis chain (tools/analysis_tools/
crop_sensitivity.py): dataset fabrication -> tools/train.py -> two
tools/test.py scorings per crop mode -> JSON delta line. 2 iters on tiny
data — the full measurement (1500 iters on the chip: fixed 1.25° vs
reference-mode 1.38°) is recorded in NOTES.md."""
import json
import os
import os.path as osp
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.mark.slow
def test_crop_sensitivity_chain(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env.pop('XLA_FLAGS', None)
    r = subprocess.run(
        [sys.executable, 'tools/analysis_tools/crop_sensitivity.py',
         '--work', str(tmp_path), '--iters', '2', '--videos', '2',
         '--frames', '12'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=850)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert set(line) == {'fixed_mae', 'reference_mae_mean',
                         'reference_seeds', 'delta_deg'}
    assert line['fixed_mae'] is not None
    assert len(line['reference_seeds']) == 2
