"""Hardware-gated CLI e2e: the real `train` engine on the TPU backend.

The CPU-mesh CLI suites prove the engine logic; this suite proves the SAME
entry point runs end-to-end on actual TPU hardware — full-model compile,
fused Pallas tails, device photometric augment, C++ host warp feed — and
still LEARNS.  Gated behind DSRL_TPU_TESTS_ON_TPU=1 like the kernel parity
suites (first run compiles the tiny-shape program through the remote
tunnel, minutes cold / seconds warm cache).

Reference counterpart: the train workflow of
/root/reference/command_handlers/train_or_resume.py driven on GPU.
"""

import glob
import os
import re

import pytest

import main as cli
from dualsuperreslearningforsemseg_tpu.data import make_synthetic_cityscapes_tree

pytestmark = pytest.mark.skipif(
    os.environ.get('DSRL_TPU_TESTS_ON_TPU') != '1',
    reason='TPU hardware e2e: set DSRL_TPU_TESTS_ON_TPU=1')


@pytest.fixture(scope='module')
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp('cli_tpu_e2e')
    data_root = os.path.join(str(wd), 'datasets', 'Cityscapes', 'data')
    make_synthetic_cityscapes_tree(data_root, split='train', num_images=8,
                                   size_hw=(64, 128))
    make_synthetic_cityscapes_tree(data_root, split='val', num_images=4,
                                   size_hw=(64, 128), seed=7)
    old = os.getcwd()
    os.chdir(str(wd))
    yield str(wd)
    os.chdir(old)


def test_train_stage1_on_tpu_learns(workdir):
    cli.parse_cmdline_and_invoke_main(
        ['train', '--device', 'tpu', '--dataset', 'cityscapes', '--stage', '1',
         '--epochs', '2', '--batch-size', '2', '--val-interval', '1',
         '--checkpoint-interval', '1', '--num-workers', '2', '--yes'])
    assert os.path.isfile(os.path.join('weights', 'stage1', 'final.weights'))
    assert glob.glob(os.path.join('weights', 'stage1', 'checkpoints',
                                  '*.checkpoint'))
    stdout = open(os.path.join('logs', 'stage1', 'train', 'stdout.txt')).read()
    train_ce = [float(re.search(r"Avg\. CE: ([0-9.]+)", line).group(1))
                for line in stdout.splitlines()
                if line.startswith('Avg. CE:') and 'Accuracy' not in line]
    assert len(train_ce) == 2, stdout
    assert train_ce[1] < train_ce[0], \
        'no learning on TPU: CE {} -> {}'.format(train_ce[0], train_ce[1])
