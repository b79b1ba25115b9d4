"""`--profile` e2e: the flag must wrap the command in a jax.profiler trace
and leave a TensorBoard/Perfetto-loadable xplane artifact under
settings.PROFILING_DIR (reference counterpart: torch.autograd.profiler
wrapping in /root/reference/main.py's train path)."""

import glob
import os

import pytest

import main as cli
from dualsuperreslearningforsemseg_tpu.data import make_synthetic_cityscapes_tree


@pytest.fixture(scope='module')
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp('cli_profile')
    data_root = os.path.join(str(wd), 'datasets', 'Cityscapes', 'data')
    make_synthetic_cityscapes_tree(data_root, split='train', num_images=2,
                                   size_hw=(64, 128))
    make_synthetic_cityscapes_tree(data_root, split='val', num_images=2,
                                   size_hw=(64, 128), seed=7)
    old = os.getcwd()
    os.chdir(str(wd))
    yield str(wd)
    os.chdir(old)


def test_train_with_profile_writes_xplane_trace(workdir):
    cli.parse_cmdline_and_invoke_main(
        ['train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '1',
         '--epochs', '1', '--batch-size', '1', '--val-interval', '1',
         '--checkpoint-interval', '1', '--num-workers', '1', '--profile',
         '--yes'])
    from dualsuperreslearningforsemseg_tpu import settings
    traces = glob.glob(os.path.join(settings.PROFILING_DIR, '**',
                                    '*.xplane.pb'), recursive=True)
    assert traces, 'no xplane trace under {}'.format(settings.PROFILING_DIR)
    assert os.path.getsize(traces[0]) > 0
