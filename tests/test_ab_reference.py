"""Smoke test for tools/ab_reference.py (the long-horizon quality A/B vs
the reference's own torch modules — VERDICT r4 #2).

Runs the full worker chain (maketree -> ref -> tpu -> report) at the
smallest useful scale: stage 1 only, 2 epochs, 8 train / 4 val frames.
Asserts both sides produce per-epoch val-mIoU records on the identical
tree and that the report lands within a loose agreement band (the sides
start from bit-identical params, so even 2 epochs keeps them within a
fraction of an mIoU point; the recorded 20-epoch run pins the real band).

~2-4 min on the CPU mesh; gated behind the slow marker with the other
multi-minute e2e suites.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_ab_reference_smoke(tmp_path):
    workdir = str(tmp_path / 'ab')
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'ab_reference.py'),
         'all', '--workdir', workdir, '--epochs', '2',
         '--train-images', '8', '--val-images', '4', '--stages', '1'],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-4000:]

    with open(os.path.join(workdir, 'ref_results.json')) as f:
        ref = json.load(f)
    with open(os.path.join(workdir, 'tpu_results.json')) as f:
        tpu = json.load(f)
    assert len(ref['1']) == 2 and len(tpu['1']) == 2
    for rows in (ref['1'], tpu['1']):
        for row in rows:
            assert 0.0 <= row['val_miou'] <= 100.0
            assert row['val_ce'] > 0.0

    # Identical starting params + identical data: epoch-1 val CE of the two
    # implementations differs only by one epoch of augmentation-draw noise.
    assert abs(ref['1'][0]['val_ce'] - tpu['1'][0]['val_ce']) < 0.15, \
        (ref['1'][0], tpu['1'][0])
    assert abs(ref['1'][0]['val_miou'] - tpu['1'][0]['val_miou']) < 2.0

    report = os.path.join(workdir, 'AB_REFERENCE.md')
    assert os.path.isfile(report)
    assert 'Stage 1' in open(report).read()
