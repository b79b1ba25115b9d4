"""Script-runner layer e2e: ``run_script.py`` dispatch plus both auxiliary
scripts against the synthetic Cityscapes fixture (reference counterparts:
/root/reference/run_script.py, /root/reference/scripts/
calculate_dataset_mean_std.py, show_augmented_inputs_targets.py)."""

import glob
import os

import numpy as np
import pytest

import run_script
from dualsuperreslearningforsemseg_tpu.data import make_synthetic_cityscapes_tree


@pytest.fixture(scope='module')
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp('scripts_e2e')
    data_root = os.path.join(str(wd), 'datasets', 'Cityscapes', 'data')
    make_synthetic_cityscapes_tree(data_root, split='train', num_images=4,
                                   size_hw=(64, 128))
    old = os.getcwd()
    os.chdir(str(wd))
    yield str(wd)
    os.chdir(old)


def test_help_lists_scripts(capsys):
    assert run_script.main([]) == 0
    out = capsys.readouterr().out
    assert 'calculate_dataset_mean_std' in out
    assert 'show_augmented_inputs_targets' in out


def test_unknown_script_fails(capsys):
    assert run_script.main(['no_such_script']) == 1
    assert 'no_such_script' in capsys.readouterr().out


def test_calculate_dataset_mean_std(workdir):
    from scripts import calculate_dataset_mean_std
    means, stds = calculate_dataset_mean_std(
        ['--dataset', 'cityscapes', 'train'])
    # per-image channel means averaged over the split, in [0, 1] pixel space
    assert all(0.0 < m < 1.0 for m in means), means
    assert all(0.0 < s < 1.0 for s in stds), stds
    # cross-check channel 0 against a direct two-pass computation
    from dualsuperreslearningforsemseg_tpu import settings
    entry = settings.DATASETS['cityscapes']
    ds = entry['class'](entry['path'], split='train')
    per_img = [np.asarray(ds[i][0], np.float64)[..., 0].mean() / 255.0
               for i in range(len(ds))]
    np.testing.assert_allclose(means[0], np.mean(per_img), rtol=1e-9)


def test_show_augmented_inputs_targets_writes_pngs(workdir):
    out_dir = os.path.join(workdir, 'viz_out')
    # dispatch through the runner, like `python run_script.py <name> ...`
    rc = run_script.main(['show_augmented_inputs_targets',
                          '--dataset', 'cityscapes', 'train',
                          '--limit', '2', '--output-dir', out_dir])
    assert rc == 0
    saved = glob.glob(os.path.join(out_dir, 'augmented_*.png'))
    assert len(saved) == 2, saved
    from PIL import Image
    with Image.open(saved[0]) as im:
        w, h = im.size
        assert im.mode == 'RGB'
        # side-by-side (input | colorized target) collage: twice as wide+gap
        assert w > h, (w, h)
