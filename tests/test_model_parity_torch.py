"""Numerical parity of model building blocks vs hand-built torch modules.

torchvision is not installed here, so the torch side is reconstructed
manually from the architecture (same as the reference derives it).  Weights
flow through our state-dict layer, so these tests validate conv semantics
(stride/padding/dilation), BN eval math, and the naming/transpose layer at
once.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch as t

from dualsuperreslearningforsemseg_tpu.models import Bottleneck, ASPP, state_dict


def nchw(x):
    return np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2)))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


class TorchBottleneck(t.nn.Module):
    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=False):
        super().__init__()
        width, out = planes, planes * 4
        self.conv1 = t.nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = t.nn.BatchNorm2d(width)
        self.conv2 = t.nn.Conv2d(width, width, 3, stride=stride, padding=dilation,
                                 dilation=dilation, bias=False)
        self.bn2 = t.nn.BatchNorm2d(width)
        self.conv3 = t.nn.Conv2d(width, out, 1, bias=False)
        self.bn3 = t.nn.BatchNorm2d(out)
        self.downsample = None
        if downsample:
            self.downsample = t.nn.Sequential(
                t.nn.Conv2d(inplanes, out, 1, stride=stride, bias=False),
                t.nn.BatchNorm2d(out))
        self.relu = t.nn.ReLU()

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


def _load_torch_from_sd(module, sd, prefix=''):
    tsd = {k[len(prefix):]: t.from_numpy(np.ascontiguousarray(v))
           for k, v in sd.items() if k.startswith(prefix)}
    tsd = {k.replace('downsample.0', 'downsample!0').replace('downsample.1', 'downsample!1'): v
           for k, v in tsd.items()}
    tsd = {k.replace('!', '.'): v for k, v in tsd.items()}
    missing, unexpected = module.load_state_dict(
        {k: v for k, v in tsd.items() if not k.endswith('num_batches_tracked')}, strict=False)
    assert not [m for m in missing if 'num_batches' not in m], missing


def test_bottleneck_parity_eval(rng):
    block = Bottleneck(planes=8, stride=2, dilation=2, has_downsample=True,
                       zero_init_last_bn=False)
    x = rng.standard_normal((2, 16, 16, 16), dtype=np.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    # randomize BN stats so eval-mode normalization is non-trivial
    for bn in ['bn1', 'bn2', 'bn3']:
        variables['batch_stats'][bn]['running_mean'] = jnp.asarray(
            rng.standard_normal(variables['batch_stats'][bn]['running_mean'].shape, dtype=np.float32) * 0.1)
        variables['batch_stats'][bn]['running_var'] = jnp.asarray(
            1.0 + 0.3 * rng.random(variables['batch_stats'][bn]['running_var'].shape).astype(np.float32))
    ours = np.asarray(block.apply(variables, jnp.asarray(x), False))

    ref = TorchBottleneck(16, 8, stride=2, dilation=2, downsample=True).eval()
    _load_torch_from_sd(ref, state_dict(variables))
    with t.no_grad():
        theirs = ref(t.from_numpy(nchw(x))).numpy()
    np.testing.assert_allclose(ours, nhwc(theirs), rtol=1e-4, atol=1e-4)


class TorchASPP(t.nn.Module):
    """Hand transcription of the reference ASPP architecture
    (/root/reference/models/modules/ASPP.py:4-44)."""

    def __init__(self, in_channels, out_channels, rate=1):
        super().__init__()
        params = [
            dict(kernel_size=1, padding=0, dilation=1),
            dict(kernel_size=3, padding=6 * rate, dilation=6 * rate),
            dict(kernel_size=3, padding=12 * rate, dilation=12 * rate),
            dict(kernel_size=3, padding=18 * rate, dilation=18 * rate),
            dict(kernel_size=1, padding=0, dilation=1),
            dict(kernel_size=1, padding=0, dilation=1),
        ]
        self.branches = t.nn.ModuleList()
        for i, p in enumerate(params):
            cin = 5 * out_channels if i == 5 else in_channels
            self.branches.append(t.nn.Sequential(
                t.nn.Conv2d(cin, out_channels, bias=False, **p),
                t.nn.BatchNorm2d(out_channels), t.nn.ReLU()))
        self.avg = t.nn.AdaptiveAvgPool2d((1, 1))

    def forward(self, x):
        outs = [self.branches[i](x) for i in range(4)]
        g = self.branches[4](self.avg(x))
        g = t.nn.functional.interpolate(g, size=x.shape[-2:], mode='bilinear', align_corners=True)
        outs.append(g)
        return self.branches[5](t.cat(outs, dim=1))


def test_aspp_parity_eval(rng):
    aspp = ASPP(out_channels=16, rate=1)
    x = rng.standard_normal((1, 24, 24, 32), dtype=np.float32)
    variables = aspp.init(jax.random.PRNGKey(1), jnp.asarray(x), False)
    ours = np.asarray(aspp.apply(variables, jnp.asarray(x), False))

    ref = TorchASPP(32, 16).eval()
    sd = state_dict(variables)
    tsd = {}
    for k, v in sd.items():
        if k.endswith('num_batches_tracked'):
            continue
        tsd[k] = t.from_numpy(np.ascontiguousarray(v))
    missing, unexpected = ref.load_state_dict(tsd, strict=False)
    assert not missing, missing
    with t.no_grad():
        theirs = ref(t.from_numpy(nchw(x))).numpy()
    np.testing.assert_allclose(ours, nhwc(theirs), rtol=1e-4, atol=1e-4)
