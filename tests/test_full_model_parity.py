"""FULL DSRL forward parity vs a hand-built torch replica.

The torch side reconstructs the reference architecture
(/root/reference/models/DSRL.py:14-186) from scratch (torchvision is not
installed here): ResNet backbone (shallow depth for test speed — identical
block structure), ASPP, shortcut, SSSR decoder with the bilinear x2 + two
ConvTranspose2d tail, SISR decoder with PixelShuffle, and the stride-8 FA
transformers.  Weights flow from our flax model through the state-dict layer
into the torch replica, and eval-mode outputs must match to float tolerance
— this validates every op's semantics, the module naming, and the
HWIO<->OIHW conversions in one end-to-end check.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch as t
import torch.nn.functional as F

from dualsuperreslearningforsemseg_tpu.models import DSRL, state_dict
from tests.test_model_parity_torch import TorchBottleneck

LAYERS = (1, 1, 2, 1)  # shallow but structurally faithful (dilated layer4)


class TorchBackbone(t.nn.Module):
    def __init__(self, layers=LAYERS):
        super().__init__()
        self.conv1 = t.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = t.nn.BatchNorm2d(64)
        self.relu = t.nn.ReLU()
        self.maxpool = t.nn.MaxPool2d(3, stride=2, padding=1)
        # torchvision ResNet structure (the reference's backbone base,
        # /root/reference/models/modules/backbone/ResNet101.py:13-14,67-89)
        # with replace_stride_with_dilation=[False, False, True]: layer4
        # trades its stride for dilation 2, first block keeping the previous
        # dilation (torchvision's `previous_dilation` rule).
        def make_layer(inplanes, planes, blocks, stride, dilation, prev_dilation):
            mods = [TorchBottleneck(inplanes, planes, stride=stride,
                                    dilation=prev_dilation, downsample=True)]
            for _ in range(1, blocks):
                mods.append(TorchBottleneck(planes * 4, planes, stride=1,
                                            dilation=dilation, downsample=False))
            return t.nn.Sequential(*mods)

        self.layer1 = make_layer(64, 64, layers[0], 1, 1, 1)
        self.layer2 = make_layer(256, 128, layers[1], 2, 1, 1)
        self.layer3 = make_layer(512, 256, layers[2], 2, 1, 1)
        self.layer4 = make_layer(1024, 512, layers[3], 1, 2, 1)  # dilated, stride 1

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        low = x
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return x, low


class TorchDSRL(t.nn.Module):
    def __init__(self, num_classes=19, stage=3, layers=LAYERS):
        super().__init__()
        from tests.test_model_parity_torch import TorchASPP
        self.stage = stage
        self.backbone = TorchBackbone(layers)
        self.aspp = TorchASPP(2048, 256)
        self.shortcut = t.nn.Sequential(
            t.nn.Conv2d(256, 48, 1, bias=False), t.nn.BatchNorm2d(48), t.nn.ReLU())
        self.cat_conv = t.nn.Sequential(
            t.nn.Conv2d(304, 256, 3, padding=1, bias=False), t.nn.BatchNorm2d(256),
            t.nn.ReLU(), t.nn.Dropout(0.2),
            t.nn.Conv2d(256, 256, 3, padding=1, bias=False), t.nn.BatchNorm2d(256),
            t.nn.ReLU(), t.nn.Dropout(0.2))
        self.cls_conv = t.nn.Conv2d(256, num_classes, 1, bias=True)
        self.up = t.nn.Sequential(
            t.nn.UpsamplingBilinear2d(scale_factor=2.0), t.nn.Dropout(0.2),
            t.nn.ConvTranspose2d(num_classes, num_classes, 2, stride=2, bias=False),
            t.nn.BatchNorm2d(num_classes), t.nn.ReLU(), t.nn.Dropout(0.2),
            t.nn.ConvTranspose2d(num_classes, num_classes, 2, stride=2, bias=True))
        self.sisr = t.nn.Sequential(
            t.nn.Conv2d(304, 3 * 64, 3, padding=1, bias=True), t.nn.PixelShuffle(8))
        self.sssr_ft = t.nn.Sequential(
            t.nn.Conv2d(num_classes, 1, 1, stride=8, bias=False),
            t.nn.BatchNorm2d(1), t.nn.ReLU())
        self.sisr_ft = t.nn.Sequential(
            t.nn.Conv2d(3, 1, 1, stride=8, bias=False), t.nn.BatchNorm2d(1), t.nn.ReLU())

    def forward(self, x):
        feats, low = self.backbone(x)
        a = self.aspp(feats)
        a = t.nn.UpsamplingBilinear2d(scale_factor=4.0)(a)
        s = self.shortcut(low)
        cat = t.cat([a, s], dim=1)
        y = self.cat_conv(cat)
        y = self.cls_conv(y)
        sssr = self.up(y)
        sisr = self.sisr(cat)
        return sssr, sisr, self.sssr_ft(sssr), self.sisr_ft(sisr)


# Mapping from our state-dict names to the torch replica's module names.
_PREFIX_MAP = [
    ('feature_extractor.backbone.', 'backbone.'),
    ('feature_extractor.aspp.', 'aspp.'),
    ('feature_extractor.shortcut_conv.', 'shortcut.'),
    ('SSSR_decoder.cat_conv.', 'cat_conv.'),
    ('SSSR_decoder.cls_conv.', 'cls_conv.'),
    ('SSSR_decoder.upsample16_pred.', 'up.'),
    ('SISR_decoder.', 'sisr.'),
    ('SSSR_feature_transformer.', 'sssr_ft.'),
    ('SISR_feature_transformer.', 'sisr_ft.'),
]


def test_full_model_eval_parity(rng):
    model = DSRL(stage=3, num_classes=19, backbone_layers=LAYERS)
    x = rng.standard_normal((1, 64, 128, 3), dtype=np.float32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, jnp.asarray(x), False)
    # Non-trivial BN stats everywhere so eval normalization is exercised.
    def perturb(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                perturb(v)
            elif k == 'running_mean':
                tree[k] = jnp.asarray(rng.standard_normal(v.shape, dtype=np.float32) * 0.05)
            elif k == 'running_var':
                tree[k] = jnp.asarray(1.0 + 0.2 * rng.random(v.shape).astype(np.float32))
    perturb(variables['batch_stats'])

    ours = model.apply(variables, jnp.asarray(x), False)

    ref = TorchDSRL().eval()
    sd = state_dict(variables)
    tsd = {}
    for key, value in sd.items():
        if key.endswith('num_batches_tracked'):
            continue
        for src, dst in _PREFIX_MAP:
            if key.startswith(src):
                tsd[dst + key[len(src):]] = t.from_numpy(np.ascontiguousarray(value))
                break
        else:
            raise AssertionError('unmapped key ' + key)
    missing, unexpected = ref.load_state_dict(tsd, strict=False)
    real_missing = [m for m in missing if 'num_batches' not in m]
    assert not real_missing, real_missing
    assert not unexpected, unexpected

    with t.no_grad():
        theirs = ref(t.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    names = ['SSSR', 'SISR', 'SSSR_T', 'SISR_T']
    for name, o, th in zip(names, ours, theirs):
        o = np.asarray(o)
        th = np.transpose(th.numpy(), (0, 2, 3, 1))
        assert o.shape == th.shape, (name, o.shape, th.shape)
        np.testing.assert_allclose(o, th, rtol=1e-3, atol=2e-3, err_msg=name)


def test_full_model_gradient_parity(rng):
    """Gradients of the CE loss w.r.t. shared parameters must match torch
    (eval-mode normalization so dropout/batch-stats don't inject noise) —
    exercises conv, dilated-conv, ConvTranspose, BN-affine, bilinear-resize
    and concat backwards through the whole network."""
    model = DSRL(stage=1, num_classes=19, backbone_layers=LAYERS)
    x = rng.standard_normal((1, 64, 128, 3), dtype=np.float32)
    seg = rng.integers(0, 19, size=(1, 128, 256)).astype(np.int32)
    variables = model.init({'params': jax.random.PRNGKey(0),
                            'dropout': jax.random.PRNGKey(1)}, jnp.asarray(x), False)

    from dualsuperreslearningforsemseg_tpu.losses import cross_entropy_loss

    def loss_fn(params):
        sssr = model.apply({'params': params, 'batch_stats': variables['batch_stats']},
                           jnp.asarray(x), False)[0]
        return cross_entropy_loss(sssr, jnp.asarray(seg), 255)

    our_loss, our_grads = jax.value_and_grad(loss_fn)(variables['params'])

    ref = TorchDSRL(stage=1).eval()
    sd = state_dict(variables)
    tsd = {}
    for key, value in sd.items():
        if key.endswith('num_batches_tracked'):
            continue
        for src, dst in _PREFIX_MAP:
            if key.startswith(src):
                tsd[dst + key[len(src):]] = t.from_numpy(np.ascontiguousarray(value))
                break
    ref.load_state_dict(tsd, strict=False)

    logits = ref(t.from_numpy(np.transpose(x, (0, 3, 1, 2))))[0]
    torch_loss = t.nn.CrossEntropyLoss(ignore_index=255)(logits, t.from_numpy(seg).long())
    torch_loss.backward()
    assert abs(float(our_loss) - float(torch_loss)) < 1e-5

    # Spot-check gradients across depth: first conv, a mid bottleneck conv,
    # the classifier, and the final ConvTranspose.
    checks = [
        ('feature_extractor.backbone.conv1.kernel', ref.backbone.conv1.weight, True),
        ('SSSR_decoder.cls_conv.kernel', ref.cls_conv.weight, True),
        ('SSSR_decoder.upsample16_pred.6.weight', ref.up[6].weight, False),
        ('SSSR_decoder.upsample16_pred.6.bias', ref.up[6].bias, False),
    ]
    from dualsuperreslearningforsemseg_tpu.models.state_dict import flatten_variables
    flat_grads = flatten_variables({'params': our_grads})
    for name, torch_param, is_conv in checks:
        ours = np.asarray(flat_grads[name])
        theirs = torch_param.grad.numpy()
        if is_conv:
            ours = np.transpose(ours, (3, 2, 0, 1))  # HWIO -> OIHW
        scale = max(np.abs(theirs).max(), 1e-8)
        np.testing.assert_allclose(ours / scale, theirs / scale, rtol=2e-3,
                                   atol=2e-4, err_msg=name)
