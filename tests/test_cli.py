"""End-to-end CLI tests on a synthetic Cityscapes fixture (tiny model input
via DSRL_TPU_MODEL_INPUT_SIZE, set in conftest before package import).

Covers the full command surface: train -> resume-train -> benchmark -> test
-> prune-weights -> inspect/edit-checkpoint -> print-model -> compile-model
-> test --compiled-model -> purge-weights-logs -> config-train validation.
"""

import glob
import json
import os
import re

import numpy as np
import pytest
from PIL import Image

import main as cli
from dualsuperreslearningforsemseg_tpu import settings
from dualsuperreslearningforsemseg_tpu.data import make_synthetic_cityscapes_tree


@pytest.fixture(scope='module')
def workdir(tmp_path_factory):
    """A self-contained working directory with synthetic Cityscapes data."""
    wd = tmp_path_factory.mktemp('cli_e2e')
    data_root = os.path.join(str(wd), 'datasets', 'Cityscapes', 'data')
    make_synthetic_cityscapes_tree(data_root, split='train', num_images=16, size_hw=(64, 128))
    make_synthetic_cityscapes_tree(data_root, split='val', num_images=16, size_hw=(64, 128), seed=7)
    old = os.getcwd()
    os.chdir(str(wd))
    yield str(wd)
    os.chdir(old)


def run_cli(*args):
    cli.parse_cmdline_and_invoke_main(list(args))


def test_train_stage1_end_to_end(workdir):
    assert settings.MODEL_INPUT_SIZE == (64, 128), \
        "conftest must set DSRL_TPU_MODEL_INPUT_SIZE=64x128 before imports"
    run_cli('train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '1',
            '--epochs', '2', '--batch-size', '1', '--val-interval', '1',
            '--checkpoint-interval', '1', '--checkpoint-history', '2',
            '--num-workers', '2', '--yes')
    assert os.path.isfile(os.path.join('weights', 'stage1', 'final.weights'))
    ckpts = glob.glob(os.path.join('weights', 'stage1', 'checkpoints', '*.checkpoint'))
    assert len(ckpts) >= 1
    assert os.path.isfile(os.path.join('logs', 'stage1', 'train', 'params.txt'))
    assert os.path.isfile(os.path.join('logs', 'stage1', 'train', 'stdout.txt'))
    # TensorBoard event files written
    assert glob.glob(os.path.join('logs', 'stage1', 'train', 'events.out.tfevents.*'))
    # The engine must actually LEARN: epoch-2 average train CE below epoch-1.
    stdout = open(os.path.join('logs', 'stage1', 'train', 'stdout.txt')).read()
    train_ce = [float(re.search(r"Avg\. CE: ([0-9.]+)", line).group(1))
                for line in stdout.splitlines()
                if line.startswith('Avg. CE:') and 'Accuracy' not in line]
    assert len(train_ce) == 2, stdout
    assert train_ce[1] < train_ce[0], \
        "train CE did not decrease across epochs: {}".format(train_ce)


def test_resume_train(workdir):
    ckpt = os.path.join('weights', 'stage1', 'checkpoints', 'epoch1.checkpoint')
    assert os.path.isfile(ckpt)
    run_cli('resume-train', '--checkpoint', ckpt, '--dataset', 'cityscapes')
    assert os.path.isfile(os.path.join('weights', 'stage1', 'final.weights'))


def test_train_stage2_cascade(workdir):
    run_cli('train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '2',
            '--epochs', '1', '--batch-size', '1', '--val-interval', '1',
            '--checkpoint-interval', '1', '--num-workers', '2', '--yes')
    assert os.path.isfile(os.path.join('weights', 'stage2', 'final.weights'))


def test_train_stage3_cascade(workdir):
    run_cli('train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '3',
            '--epochs', '1', '--batch-size', '1', '--val-interval', '1',
            '--checkpoint-interval', '1', '--num-workers', '2', '--yes')
    assert os.path.isfile(os.path.join('weights', 'stage3', 'final.weights'))


def test_benchmark(workdir, monkeypatch):
    """The benchmark command shards its eval over the full mesh; with
    batch 4 on the 8-device test mesh every batch exercises the pad/mask
    path, and the metrics must be identical to a single-device run."""
    run_cli('benchmark', '--weights', os.path.join('weights', 'stage1', 'final.weights'),
            '--dataset', 'cityscapes', 'val', '--device', 'cpu', '--batch-size', '4',
            '--num-workers', '2')
    assert os.path.isfile(os.path.join('outputs', 'benchmark.txt'))
    content_mesh = open(os.path.join('outputs', 'benchmark.txt')).read()
    assert 'mIoU %' in content_mesh and 'Cross Entropy' in content_mesh

    import importlib
    import jax
    # The commands package re-exports the benchmark *function* under the
    # submodule's name; import_module gets the module itself.
    bench_mod = importlib.import_module(
        'dualsuperreslearningforsemseg_tpu.commands.benchmark')
    from dualsuperreslearningforsemseg_tpu.parallel import make_mesh
    monkeypatch.setattr(bench_mod, 'make_mesh',
                        lambda: make_mesh(jax.devices()[:1]))
    run_cli('benchmark', '--weights', os.path.join('weights', 'stage1', 'final.weights'),
            '--dataset', 'cityscapes', 'val', '--device', 'cpu', '--batch-size', '4',
            '--num-workers', '2')
    content_single = open(os.path.join('outputs', 'benchmark.txt')).read()

    def metrics(text):
        return {m.group(1): m.group(2) for m in re.finditer(
            r'(Cross Entropy Error|mIoU %|Mean Accuracy %): ([0-9.]+)', text)}
    assert metrics(content_mesh) == metrics(content_single) != {}


def test_single_image(workdir, rng):
    img = rng.integers(0, 255, size=(64, 128, 3)).astype(np.uint8)
    Image.fromarray(img).save('sample.png')
    run_cli('test', '--image-file', 'sample.png', '--device', 'cpu',
            '--weights', os.path.join('weights', 'stage1', 'final.weights'))
    assert os.path.isfile(os.path.join('outputs', 'sample.png'))
    out = np.asarray(Image.open(os.path.join('outputs', 'sample.png')))
    oh, ow = settings.MODEL_OUTPUT_SIZE
    assert out.shape == (oh, 3 * ow, 3)  # [input | seg | overlay]


def test_dataset_split_mode(workdir):
    """`test` WITHOUT --image-file/--images-dir walks the dataset val split
    and writes [target | prediction] strips (reference test.py:74-116).
    Regression: the in-place ignore-label masking crashed on jax's
    read-only host view before commands/test.py copied the argmax."""
    run_cli('test', '--dataset', 'cityscapes', 'val', '14', '--device', 'cpu',
            '--weights', os.path.join('weights', 'stage1', 'final.weights'),
            '--no-interactive')
    out_name = os.path.join('outputs', '15.png')
    assert os.path.isfile(out_name)
    out = np.asarray(Image.open(out_name))
    oh, ow = settings.MODEL_OUTPUT_SIZE
    # two [input | seg | overlay] strips stacked target-over-prediction
    assert out.shape == (2 * oh, 3 * ow, 3)


def test_prune_weights_both_spellings(workdir):
    src = os.path.join('weights', 'stage3', 'final.weights')
    run_cli('prune-weights', '--src-weights', src, '--dest-weights', 'pruned.weights', '--yes')
    assert os.path.isfile('pruned.weights')
    from dualsuperreslearningforsemseg_tpu.checkpoint import load_checkpoint_or_weights
    pruned = load_checkpoint_or_weights('pruned.weights')
    keys = pruned['model_state_dict'].keys()
    assert not any('SISR_decoder' in k for k in keys)
    assert not any('feature_transformer' in k for k in keys)
    run_cli('purne-weights', '--src-weights', src, '--dest-weights', 'pruned2.weights', '--yes')
    assert os.path.isfile('pruned2.weights')


def test_inspect_and_edit_checkpoint(workdir, capsys):
    ckpt = sorted(glob.glob(os.path.join('weights', 'stage1', 'checkpoints', 'epoch*.checkpoint')))[0]
    run_cli('inspect-checkpoint', '--checkpoint', ckpt)
    out = capsys.readouterr().out
    assert 'epochs' in out and 'learning_rate' in out

    run_cli('edit-checkpoint', '--checkpoint', ckpt, '--key', 'description',
            '--value', 'edited-by-test', '--typeof', 'str')
    from dualsuperreslearningforsemseg_tpu.checkpoint import load_checkpoint_or_weights
    assert load_checkpoint_or_weights(ckpt)['description'] == 'edited-by-test'


def test_print_model(workdir, capsys):
    run_cli('print-model', '--stage', '1')
    out = capsys.readouterr().out
    assert 'Total training parameters' in out


def test_compile_model_and_compiled_inference(workdir, rng):
    run_cli('compile-model', '--weights', os.path.join('weights', 'stage1', 'final.weights'),
            '--output-file', 'model.stablehlo')
    assert os.path.getsize('model.stablehlo') > 1_000_000  # weights baked in

    img = rng.integers(0, 255, size=(64, 128, 3)).astype(np.uint8)
    Image.fromarray(img).save('sample2.png')
    run_cli('test', '--image-file', 'sample2.png', '--device', 'cpu',
            '--weights', 'model.stablehlo', '--compiled-model')
    assert os.path.isfile(os.path.join('outputs', 'sample2.png'))


def test_dry_run(workdir):
    run_cli('train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '1',
            '--epochs', '1', '--batch-size', '1', '--val-interval', '1',
            '--checkpoint-history', '0', '--num-workers', '1', '--dry-run',
            '--experiment-id', 'dryrun_exp', '--yes')
    assert os.path.isdir(os.path.join('experiments', 'dryrun_exp'))


def test_dry_run_stage3(workdir):
    # Stage 3 dry-run exercises the synthesized-FA path (the reference
    # computes FA on t.randn transformer placeholders in dry-run,
    # train_or_resume.py:422-423); this combination once crashed at trace
    # time on a None transformer output.
    run_cli('train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '3',
            '--epochs', '1', '--batch-size', '1', '--val-interval', '1',
            '--checkpoint-history', '0', '--num-workers', '1', '--dry-run',
            '--experiment-id', 'dryrun3_exp', '--yes')
    assert os.path.isdir(os.path.join('experiments', 'dryrun3_exp'))


def test_purge_weights_logs(workdir):
    assert os.path.isdir(os.path.join('weights', 'stage2'))
    with pytest.raises(SystemExit):
        run_cli('purge-weights-logs', '--stage', '2', '--yes')
    assert not os.path.isdir(os.path.join('weights', 'stage2'))
    assert os.path.isdir(os.path.join('weights', 'stage1'))  # untouched


def test_config_train_json_bridge(workdir, capsys):
    # Validation error path: config file must exist (ArgumentTypeError is
    # caught at top level and reported as FATAL, parity with main.py:424-426).
    run_cli('config-train', '--file', 'nonexistent.json')
    assert "No such config file" in capsys.readouterr().out


def test_cli_validation_errors(workdir, capsys):
    run_cli('train', '--dataset', 'cityscapes', '--stage', '1', '--epochs', '0',
            '--yes', '--device', 'cpu')
    assert 'FATAL' in capsys.readouterr().out

    run_cli('benchmark', '--weights', 'missing.weights', '--dataset', 'cityscapes', 'val')
    assert "No such weights file" in capsys.readouterr().out

    run_cli('test', '--image-file', 'no_such.png',
            '--weights', os.path.join('weights', 'stage1', 'final.weights'))
    assert "No such image file" in capsys.readouterr().out


def test_checkpoint_history_pruning_and_early_stop(workdir):
    """Autosave pruning keeps only `checkpoint-history` latest files
    (reference train_or_resume.py:283-290); early stopping triggers when
    train loss < val loss (`:339-344`, trivially true on random data)."""
    run_cli('train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '1',
            '--epochs', '4', '--batch-size', '1', '--val-interval', '10',
            '--checkpoint-interval', '1', '--checkpoint-history', '2',
            '--num-workers', '1', '--experiment-id', 'prune_hist', '--yes')
    ckpts = sorted(glob.glob(os.path.join('experiments', 'prune_hist', 'weights',
                                          'stage1', 'checkpoints', 'epoch*.checkpoint')))
    names = [os.path.basename(c) for c in ckpts]
    assert names == ['epoch3.checkpoint', 'epoch4.checkpoint'], names

    run_cli('train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '1',
            '--epochs', '50', '--batch-size', '1', '--val-interval', '1',
            '--checkpoint-history', '0', '--num-workers', '1',
            '--experiment-id', 'earlystop', '--early-stopping', '--yes')
    stdout = open(os.path.join('experiments', 'earlystop', 'logs', 'stage1',
                               'train', 'stdout.txt')).read()
    assert 'Early stopping was triggered' in stdout
    # final weights still written after the early stop
    assert os.path.isfile(os.path.join('experiments', 'earlystop', 'weights',
                                       'stage1', 'final.weights'))


def test_val_miou_climbs(workdir):
    """END-TO-END learning signal through the real CLI: on the learnable
    synthetic world (tile colors encode classes; val split has unseen
    layouts) six epochs must grow val mIoU and accuracy well beyond their
    epoch-1 values — the CLI-scale guard on the mIoU north star
    (/root/reference/README.md:10-16)."""
    # NB: per-device batch 1 on the virtual 8-device mesh = global batch 8,
    # i.e. 2 optimizer steps per epoch over the 16 train images.
    run_cli('train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '1',
            '--epochs', '20', '--batch-size', '1', '--val-interval', '4',
            '--learning-rate', '0.1', '--checkpoint-interval', '50',
            '--num-workers', '2', '--experiment-id', 'miou_climb', '--yes')
    stdout = open(os.path.join('experiments', 'miou_climb', 'logs', 'stage1',
                               'train', 'stdout.txt')).read()
    rows = re.findall(r"Avg\. CE: ([0-9.]+), Accuracy %: ([0-9.]+), mIoU %: ([0-9.]+)",
                      stdout)
    assert len(rows) == 5, stdout
    ce = [float(r[0]) for r in rows]
    acc = [float(r[1]) for r in rows]
    miou = [float(r[2]) for r in rows]
    assert miou[-1] > 1.3 * miou[0], "val mIoU did not climb: {}".format(miou)
    assert acc[-1] > acc[0] + 4.0, "val accuracy did not climb: {}".format(acc)
    assert ce[-1] < ce[0], "val CE did not fall: {}".format(ce)


def test_prune_weights_torch_format(workdir):
    """--torch-format must emit a .pth that real torch.load can read."""
    import torch as t
    src = os.path.join('weights', 'stage1', 'final.weights')
    if not os.path.isfile(src):
        # standalone-safe: synthesize stage-1 weights
        import jax
        import jax.numpy as jnp
        from dualsuperreslearningforsemseg_tpu.models import DSRL, state_dict
        from dualsuperreslearningforsemseg_tpu.checkpoint import save_weights
        model = DSRL(stage=1, num_classes=19)
        variables = model.init({'params': jax.random.PRNGKey(0),
                                'dropout': jax.random.PRNGKey(1)},
                               jnp.zeros((1, *settings.MODEL_INPUT_SIZE, 3)), False)
        save_weights(os.path.dirname(src), os.path.basename(src),
                     state_dict(variables), None)
    run_cli('prune-weights', '--src-weights', src,
            '--dest-weights', 'for_torch.weights', '--yes', '--torch-format')
    sd = t.load('for_torch.weights', map_location='cpu', weights_only=True)
    assert 'feature_extractor.backbone.conv1.weight' in sd
    assert tuple(sd['feature_extractor.backbone.conv1.weight'].shape) == (64, 3, 7, 7)


def test_train_primes_raw_cache(tmp_path, monkeypatch):
    """With DSRL_TPU_RAW_CACHE set, training primes the raw-pair cache in
    the background (commands/train_or_resume.py): the INFO lines appear and
    every train/val pair ends up cached by run end."""
    from dualsuperreslearningforsemseg_tpu.data import RawPairCache
    from dualsuperreslearningforsemseg_tpu.data import CityscapesDataset

    data_root = os.path.join(str(tmp_path), 'datasets', 'Cityscapes', 'data')
    make_synthetic_cityscapes_tree(data_root, split='train', num_images=4, size_hw=(64, 128))
    make_synthetic_cityscapes_tree(data_root, split='val', num_images=2, size_hw=(64, 128), seed=7)
    cache_dir = os.path.join(str(tmp_path), 'rawcache')
    monkeypatch.setenv('DSRL_TPU_RAW_CACHE', cache_dir)
    monkeypatch.chdir(str(tmp_path))

    run_cli('train', '--device', 'cpu', '--dataset', 'cityscapes', '--stage', '1',
            '--epochs', '1', '--batch-size', '1', '--val-interval', '1',
            '--checkpoint-interval', '1', '--num-workers', '1', '--yes')

    stdout = open(os.path.join('logs', 'stage1', 'train', 'stdout.txt')).read()
    assert "Priming raw pair cache for the 'train' split" in stdout
    assert "Priming raw pair cache for the 'val' split" in stdout
    cache = RawPairCache(cache_dir, (64, 128))
    for split in ('train', 'val'):
        ds = CityscapesDataset(data_root, split=split)
        assert len(ds) > 0
        for ip, sp in ds.pairs:
            assert cache.load(ip, sp) is not None, (split, ip)


def test_benchmark_with_raw_cache(workdir, tmp_path, monkeypatch):
    """benchmark with DSRL_TPU_RAW_CACHE primes and serves the decoded val
    pairs from the cache, with metrics identical to the uncached run."""
    from dualsuperreslearningforsemseg_tpu.data import RawPairCache, CityscapesDataset

    weights = os.path.join('weights', 'stage1', 'final.weights')
    assert os.path.isfile(weights), "train test must run first (module order)"
    run_cli('benchmark', '--weights', weights, '--dataset', 'cityscapes', 'val',
            '--device', 'cpu', '--batch-size', '4', '--num-workers', '2')
    uncached = open(os.path.join('outputs', 'benchmark.txt')).read()

    cache_dir = str(tmp_path / 'bench_rawcache')
    monkeypatch.setenv('DSRL_TPU_RAW_CACHE', cache_dir)
    run_cli('benchmark', '--weights', weights, '--dataset', 'cityscapes', 'val',
            '--device', 'cpu', '--batch-size', '4', '--num-workers', '2')
    cached = open(os.path.join('outputs', 'benchmark.txt')).read()

    # All val pairs cached (primed and/or stored by the run itself)...
    cache = RawPairCache(cache_dir, (64, 128))
    ds = CityscapesDataset(os.path.join('datasets', 'Cityscapes', 'data'),
                           split='val')
    assert len(ds) > 0
    for ip, sp in ds.pairs:
        assert cache.has(ip, sp), ip
    # ...and a third run served from the warm cache reports the same metrics.
    run_cli('benchmark', '--weights', weights, '--dataset', 'cityscapes', 'val',
            '--device', 'cpu', '--batch-size', '4', '--num-workers', '2')
    warm = open(os.path.join('outputs', 'benchmark.txt')).read()

    def metric_lines(text):
        return [l for l in text.splitlines()
                if 'mIoU %' in l or 'Cross Entropy' in l or 'Accuracy' in l]

    assert metric_lines(uncached) == metric_lines(cached) == metric_lines(warm)
