"""ResNet-101 backbone, NHWC, flax linen.

Re-designed from the architecture the reference derives from torchvision
(/root/reference/models/modules/backbone/ResNet101.py:6-104): Bottleneck
blocks [3, 4, 23, 3], ``replace_stride_with_dilation=[False, False, True]``
giving output stride 16, returning ``(layer4_out, layer1_out)`` for the
decoder skip connection.  Module names intentionally match the torch module
tree (conv1/bn1/layer{1..4}.{i}.conv{1..3}|bn{1..3}|downsample.{0,1}) so the
state-dict layer is a pure mechanical mapping and ImageNet zoo weights load
without per-layer tables.

TPU-first details: NHWC layout throughout (XLA's preferred conv layout on
TPU); all convs run in the compute dtype (bf16 under mixed precision) with
f32 parameters; BN statistics in f32.

Deliberate deviation — bn3 zero-init: the reference *intends* to zero the
last BN scale of each block (ResNet101.py:52-53), but its init loop visits
the Bottleneck before its bn3 child, so the BatchNorm2d branch overwrites
the zero back to 1.0 — reference bn3.weight ends at 1.0 (verified with
torch).  We keep the true torchvision ``zero_init_residual`` behavior
(residual blocks start as identity, which materially helps the 250-epoch
from-scratch recipe); set ``zero_init_last_bn=False`` to reproduce the
reference's effective init.  This only affects the air-gapped from-scratch
path — zoo/stage-cascade weights overwrite the init either way.
"""

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .norm import TorchBatchNorm
from .init import kaiming_normal_fan_out_conv


def _conv(features, kernel, stride=1, dilation=1, padding=0, name=None,
          dtype=jnp.float32):
    # ``dtype`` is the COMPUTE dtype and must be threaded explicitly:
    # nn.Conv's default (None) promotes the bf16 activations with the f32
    # params to an f32 convolution — traced at 21-30 TF/s on layer1 vs the
    # bf16 MXU path's 150+ (the round-3 profile's single largest finding).
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   kernel_dilation=(dilation, dilation),
                   padding=((padding, padding), (padding, padding)),
                   use_bias=False, dtype=dtype, param_dtype=jnp.float32,
                   kernel_init=kaiming_normal_fan_out_conv, name=name)


class Bottleneck(nn.Module):
    """torchvision-style bottleneck: 1x1 -> 3x3(stride, dilation) -> 1x1 (x4)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    zero_init_last_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool, freeze_bn: bool = False):
        width = self.planes
        out_ch = self.planes * self.expansion
        use_ra = (not train) or freeze_bn

        y = _conv(width, 1, name='conv1', dtype=self.dtype)(x)
        y = TorchBatchNorm(width, dtype=self.dtype, name='bn1')(y, use_ra)
        y = nn.relu(y)
        y = _conv(width, 3, stride=self.stride, dilation=self.dilation,
                  padding=self.dilation, name='conv2', dtype=self.dtype)(y)
        y = TorchBatchNorm(width, dtype=self.dtype, name='bn2')(y, use_ra)
        y = nn.relu(y)
        y = _conv(out_ch, 1, name='conv3', dtype=self.dtype)(y)
        # Reference zero-inits the last BN scale of every block
        # (ResNet101.py:52-53) so the residual path starts as identity.
        bn3_init = nn.initializers.zeros if self.zero_init_last_bn else nn.initializers.ones
        y = TorchBatchNorm(out_ch, dtype=self.dtype, weight_init=bn3_init, name='bn3')(y, use_ra)

        if self.has_downsample:
            identity = _conv(out_ch, 1, stride=self.stride, name='downsample.0',
                             dtype=self.dtype)(x)
            identity = TorchBatchNorm(out_ch, dtype=self.dtype, name='downsample.1')(identity, use_ra)
        else:
            identity = x
        return nn.relu(y + identity)


class ResNet101(nn.Module):
    """Returns (layer4_features, layer1_features) like the reference backbone."""
    layers: Sequence[int] = (3, 4, 23, 3)
    replace_stride_with_dilation: Sequence[bool] = (False, False, True)
    # False reproduces the reference's EFFECTIVE init (bn3.weight == 1.0 —
    # see the module docstring); forwarded to every block.
    zero_init_last_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, freeze_bn: bool = False):
        use_ra = (not train) or freeze_bn
        x = x.astype(self.dtype)
        # NB (round 3, measured): the 7x7/s2 stem runs the MXU at only ~12
        # TF/s (3-channel input), but the space-to-depth reformulation
        # (fold 2x2 blocks -> 12 channels, 4x4/s1 conv on a zero-padded
        # kernel) LOST end-to-end: 275 -> 260 img/s/chip — the 6-D input
        # relayout and the changed downstream layouts cost more than the
        # ~1.4 ms the conv saves.  Keep the direct form.
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=kaiming_normal_fan_out_conv, name='conv1')(x)
        x = TorchBatchNorm(64, dtype=self.dtype, name='bn1')(x, use_ra)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # Optional block rematerialization (settings.BACKBONE_REMAT): the
        # backbone traced HBM-bound (828 GB/s ~= v5e peak) with the MXU at
        # 56%, so recomputing cheap intermediates in the backward buys back
        # activation traffic with otherwise-idle FLOPs.  Mode 1 saves conv
        # outputs and recomputes the elementwise BN/relu chains
        # (dots_saveable); mode 2 saves only block boundaries.  Parameter
        # tree and numerics are unchanged (same ops, re-executed).
        # MEASURED on v5e (stage-3 train, batch 16): mode 0 = 288 img/s,
        # mode 1 = 277, mode 2 = 265 (more FLOPs, 0.285 -> 0.334 TF/img,
        # but slower) — the backward's activation re-reads stay on the
        # critical path either way, so remat only adds compute.  The knob
        # stays, default off, for larger-batch/memory-pressure settings.
        from .. import settings as _settings
        remat_mode = getattr(_settings, 'BACKBONE_REMAT', 0)
        block_cls = Bottleneck
        if remat_mode:
            import jax
            policy = (jax.checkpoint_policies.dots_saveable if remat_mode == 1
                      else jax.checkpoint_policies.nothing_saveable)
            block_cls = nn.remat(Bottleneck, static_argnums=(2, 3),
                                 policy=policy)

        inplanes, dilation = 64, 1
        low_level_features = None
        for layer_idx, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if layer_idx == 0 else 2
            dilate = False if layer_idx == 0 else self.replace_stride_with_dilation[layer_idx - 1]
            previous_dilation = dilation
            if dilate:
                dilation *= stride
                stride = 1
            for block_idx in range(blocks):
                first = block_idx == 0
                x = block_cls(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=previous_dilation if first else dilation,
                    has_downsample=first and (stride != 1 or inplanes != planes * Bottleneck.expansion),
                    zero_init_last_bn=self.zero_init_last_bn,
                    dtype=self.dtype,
                    name=f'layer{layer_idx + 1}.{block_idx}')(x, train, freeze_bn)
                if first:
                    inplanes = planes * Bottleneck.expansion
            if layer_idx == 0:
                low_level_features = x

        return x, low_level_features
