"""DSRL model: shared encoder + SSSR decoder (+ SISR branch + FA transformers).

Re-designed from the reference network definition
(/root/reference/models/DSRL.py:11-186) as NHWC flax linen modules:

* feature extractor: ResNet101 (output stride 16) -> ASPP -> bilinear x4
  (align_corners) -> concat with a 1x1+BN+ReLU shortcut of the low-level
  features -> (B, H/4, W/4, 304);
* SSSR decoder: two 3x3 Conv+BN+ReLU+Dropout(0.2) (304->256->256), a 1x1
  classifier to NUM_CLASSES, then the upsample tail: bilinear x2 + Dropout +
  ConvT(2,2)+BN+ReLU+Dropout + ConvT(2,2) for a total x8 upsample
  (-> 2x the network input size);
* stage >= 2 adds the SISR decoder: 3x3 conv to 3*8^2 channels + PixelShuffle(8);
* stage == 3 adds the two feature transformers: 1x1 conv **stride 8** -> 1
  channel + BN + ReLU feeding the FA loss.

The ConvTranspose2d(k=2, s=2) layers are custom modules whose weight is kept
in the torch IOHW layout and evaluated as one MXU matmul + block reshape
(ops/conv.py).  Module names mirror the torch Sequential indices so the
state-dict mapping is mechanical (e.g. ``SSSR_decoder.cat_conv.0.weight``,
``SSSR_decoder.upsample16_pred.2.weight``).

Stage gating is static (Python-level): each stage builds exactly the
subgraph it trains, and inactive outputs are ``None`` — under jit this means
stage-1 inference compiles zero SISR/FA code, unlike the reference's runtime
zeros placeholders (/root/reference/models/DSRL.py:172-174).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .resnet import ResNet101
from .aspp import ASPP
from .norm import TorchBatchNorm, FastDropout
from .init import (kaiming_normal_fan_out_conv, kaiming_normal_fan_out_convtranspose,
                   torch_conv_bias_init)
from ..ops.resize import resize_bilinear_matmul
from ..ops.conv import (conv_transpose_2x2_stride2,
                        conv_transpose_2x2_stride2_grouped,
                        conv_transpose_2x2_stride2_corner,
                        conv_transpose_2x2_stride2_cols,
                        pixel_shuffle, TAIL_COL_BLOCK)
from ..consts import NUM_RGB_CHANNELS


def _conv(features, kernel, stride=1, padding=0, use_bias=False, in_channels=None, name=None,
          dtype=jnp.float32):
    # ``dtype`` is the COMPUTE dtype; nn.Conv's default would promote bf16
    # activations with the f32 params into f32 convolutions (see
    # models/resnet.py::_conv — the round-3 profile finding).
    bias_init = nn.initializers.zeros
    if use_bias:
        # in_channels is what torch's default U(+/-1/sqrt(fan_in)) bias init
        # needs; a biased conv without it would silently zero-init and drift
        # the from-scratch init parity.
        assert in_channels is not None, \
            "BUG CHECK: _conv(use_bias=True) requires in_channels for the torch bias init"
        bias_init = torch_conv_bias_init(in_channels * kernel * kernel)
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((padding, padding), (padding, padding)),
                   use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32,
                   kernel_init=kaiming_normal_fan_out_conv,
                   bias_init=bias_init, name=name)


class ConvTranspose2x2(nn.Module):
    """torch.nn.ConvTranspose2d(in, out, kernel_size=2, stride=2) with the
    weight stored in torch IOHW layout, evaluated as a dense matmul.

    ``grouped=True`` (or a 5-D grouped input) keeps the output in the
    space-to-depth grouped layout — see ops/conv.py — avoiding the
    full-resolution interleave copies during training."""
    in_channels: int
    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, grouped: bool = False, corner: bool = False,
                 cols: bool = False):
        w = self.param('weight', kaiming_normal_fan_out_convtranspose,
                       (self.in_channels, self.out_channels, 2, 2), jnp.float32)
        b = None
        if self.use_bias:
            # torch ConvTranspose default-bias fan_in reads dim 1: O*kh*kw.
            b = self.param('bias', torch_conv_bias_init(self.out_channels * 4),
                           (self.out_channels,), jnp.float32)
        w = w.astype(x.dtype)
        b = None if b is None else b.astype(x.dtype)
        if cols:
            # Channel-padded-columns output (B, H, W, 4*32) for the fused
            # Pallas tail carry (ops/conv.py) — bias-free by construction.
            assert not self.use_bias, "cols layout is for the bias-free ConvT"
            return conv_transpose_2x2_stride2_cols(x, w)
        if corner:
            # Even-even output plane only (ops/conv.py): shares this module's
            # parameters with the full evaluation.
            return conv_transpose_2x2_stride2_corner(x, w, b)
        if grouped or x.ndim == 5:
            return conv_transpose_2x2_stride2_grouped(x, w, b)
        return conv_transpose_2x2_stride2(x, w, b)


class FeatureExtractor(nn.Module):
    """backbone + aspp + shortcut -> concatenated decoder features."""
    dtype: jnp.dtype = jnp.float32
    backbone_layers: tuple = None  # None -> settings.BACKBONE_LAYERS
    zero_init_last_bn: bool = True  # False -> reference's effective init (resnet.py)

    @nn.compact
    def __call__(self, x, train: bool, freeze_bn: bool = False):
        from .. import settings as _settings
        from ..parallel.spatial import pin_trunk
        layers = self.backbone_layers or tuple(_settings.BACKBONE_LAYERS)
        use_ra = (not train) or freeze_bn
        # pin_trunk: no-ops except under a spatial mesh, where the OS16
        # trunk must stay batch-sharded (parallel/spatial.py) — bracketing
        # input, backbone outputs, and ASPP output keeps GSPMD from
        # back-propagating the decoders' H-sharding into the trunk.
        backbone_features, lowlevel_features = ResNet101(
            layers=layers, zero_init_last_bn=self.zero_init_last_bn,
            dtype=self.dtype, name='backbone')(pin_trunk(x), train, freeze_bn)
        backbone_features = pin_trunk(backbone_features)
        lowlevel_features = pin_trunk(lowlevel_features)
        aspp_features = ASPP(out_channels=256, rate=1, dtype=self.dtype, name='aspp')(backbone_features, train, freeze_bn)
        h, w = aspp_features.shape[1:3]
        aspp_features = pin_trunk(aspp_features)
        aspp_features = resize_bilinear_matmul(aspp_features, (4 * h, 4 * w))
        shortcut = _conv(48, 1, name='shortcut_conv.0', dtype=self.dtype)(lowlevel_features)
        shortcut = TorchBatchNorm(48, dtype=self.dtype, name='shortcut_conv.1')(shortcut, use_ra)
        shortcut = nn.relu(shortcut)
        return jnp.concatenate([aspp_features, shortcut], axis=-1)


def _even_hw_select(y):
    """``y[:, ::2, ::2]`` as two one-hot matmuls.

    The strided slice of the (B, H, W, 4, C) grouped activation lowers to a
    TPU gather traced at 1.0 ms/step (2 GB/s effective); the selection
    matmuls run on the MXU in ~0.06 ms and their VJP is the transposed
    matmul instead of a pad-scatter (CLAUDE.md perf rule 1).  Exact: each
    output element is a single 1.0 * x product.  Accepts the 5-D grouped
    (B, H, W, 4, C) or the 4-D cols (B, H, W, 4*blk) orientation."""
    h, w = y.shape[1], y.shape[2]
    # ceil-div row counts: ``::2`` keeps (h+1)//2 rows — h//2 would drop the
    # last sample row/column whenever H or W is odd (reachable through a
    # DSRL_TPU_MODEL_INPUT_SIZE that is 2 mod 4) and silently skew the FA
    # corner feed against the reference's stride-8 conv.
    sel_h = (jnp.arange((h + 1) // 2)[:, None] * 2 ==
             jnp.arange(h)[None, :]).astype(y.dtype)
    sel_w = (jnp.arange((w + 1) // 2)[:, None] * 2 ==
             jnp.arange(w)[None, :]).astype(y.dtype)
    if y.ndim == 4:
        y = jnp.einsum('mh,bhwc->bmwc', sel_h, y)
        return jnp.einsum('nw,bmwc->bmnc', sel_w, y)
    y = jnp.einsum('mh,bhwgc->bmwgc', sel_h, y)
    return jnp.einsum('nw,bmwgc->bmngc', sel_w, y)


class SSSRDecoder(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, freeze_bn: bool = False,
                 grouped: bool = False, return_fa_corner: bool = False,
                 pre_tail: bool = False):
        """Returns the grouped/plain logits, or with ``return_fa_corner``
        a ``(logits, fa_corner)`` pair; ``pre_tail`` swaps the logits for
        the pre-final-ConvT activation (fused-tail training)."""
        use_ra = (not train) or freeze_bn
        det = not train
        y = _conv(256, 3, padding=1, name='cat_conv.0', dtype=self.dtype)(x)
        y = TorchBatchNorm(256, dtype=self.dtype, name='cat_conv.1')(y, use_ra)
        y = nn.relu(y)
        y = FastDropout(0.2, name='cat_conv.3')(y, det)
        y = _conv(256, 3, padding=1, name='cat_conv.4', dtype=self.dtype)(y)
        y = TorchBatchNorm(256, dtype=self.dtype, name='cat_conv.5')(y, use_ra)
        y = nn.relu(y)
        y = FastDropout(0.2, name='cat_conv.7')(y, det)

        y = _conv(self.num_classes, 1, use_bias=True, in_channels=256, name='cls_conv',
                  dtype=self.dtype)(y)

        h, w = y.shape[1:3]
        y = resize_bilinear_matmul(y, (2 * h, 2 * w))
        y = FastDropout(0.2, name='upsample16_pred.1')(y, det)
        convt2 = ConvTranspose2x2(self.num_classes, self.num_classes,
                                  use_bias=False, name='upsample16_pred.2')
        bn3 = TorchBatchNorm(self.num_classes, dtype=self.dtype,
                             name='upsample16_pred.3')
        convt_final = ConvTranspose2x2(self.num_classes, self.num_classes, use_bias=True,
                                       name='upsample16_pred.6')
        if pre_tail:
            # Fused-tail training mode: carry the tail in CHANNEL-PADDED
            # COLUMNS — (B, H, W, 4*32), column g*32+c is channel c of
            # first-ConvT position g (ops/conv.py::
            # conv_transpose_2x2_stride2_cols).  Identical math (the BN
            # stats pool over the same elements, per-channel across the
            # position blocks), but the trailing dim is exactly one TPU
            # lane tile, so BN/relu/dropout and the fused Pallas kernel all
            # consume the operand at its physical size — the natural
            # (..., 4, 19) orientation costs ~2.7 ms/step of boundary
            # re-layout copies at the kernel (see ops/pallas/fused_tail.py).
            # Return the post-dropout PRE-ConvT activation; the train step
            # runs the final ConvT fused with the CE loss using this
            # module's 'upsample16_pred.6' parameters, so the full-size
            # logits tensor never materializes.
            assert grouped, "pre_tail is a grouped-layout training mode"
            y = convt2(y, cols=True)
            y = bn3(y, use_ra, cols_blocks=4)
            y = nn.relu(y)
            y = FastDropout(0.2, name='upsample16_pred.5')(y, det)
            out = y
            # Group 0's real channels are columns 0:num_classes.
            corner_src = _even_hw_select(y)[..., :self.num_classes]
        else:
            # grouped=True keeps the x4 upsample in space-to-depth layout
            # (B, H, W, 16, C) — identical math, no full-res interleave
            # copies; callers ungroup only when a plain tensor is needed
            # (eval/inference).
            y = convt2(y, grouped=grouped)
            y = bn3(y, use_ra)
            y = nn.relu(y)
            # pad_lanes: draw the mask in the cols layout's padded bit
            # stream so this path stays in dropout-lockstep with pre_tail
            # (tests/test_pallas_tail.py compares the two step-for-step).
            y = FastDropout(0.2, name='upsample16_pred.5')(
                y, det, pad_lanes=TAIL_COL_BLOCK if grouped else 0)
            out = convt_final(y, grouped=grouped)
            corner_src = _even_hw_select(y)[..., 0, :] if grouped else None
        if not return_fa_corner:
            return out
        # Stride-8 sampling of the full-res logits for the FA transformer,
        # computed from the (4x smaller) pre-ConvT activation: full-res pixel
        # (8m, 8n) is this ConvT's (k=0, l=0) corner at grouped position
        # (even h, even w, group 0).  Same shared parameters, exact same
        # values as slicing `out` — but AD pads an (B,H,W,4,C) gradient here
        # instead of the (B,H,W,16,C) logits (~8 ms/step cheaper on v5e).
        assert grouped, "FA corner feed is a grouped-layout optimization"
        fa_corner = convt_final(corner_src, corner=True)
        return out, fa_corner


class SISRDecoder(nn.Module):
    """3x3 conv to 3*r^2 channels + PixelShuffle(r)
    (/root/reference/models/DSRL.py:75-84).

    ``grouped=True`` returns the PRE-shuffle conv output (B, H, W, 3*r*r)
    — channel c*r*r + i*r + j is full-res pixel (r*h+i, r*w+j) of RGB
    channel c.  The MSE loss is permutation-invariant, so training compares
    against a pixel-unshuffled target instead of materializing (and
    back-propagating through) the full-resolution interleave."""
    upscale_factor: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, grouped: bool = False):
        r = self.upscale_factor
        y = _conv(NUM_RGB_CHANNELS * r * r, 3, padding=1, use_bias=True,
                  in_channels=x.shape[-1], name='0', dtype=self.dtype)(x)
        return y if grouped else pixel_shuffle(y, r)


class FeatureTransformer(nn.Module):
    """1x1 conv with stride 8 -> 1 channel + BN + ReLU (DSRL.py:87-95).

    ``stride`` is 8 on a plain full-res map; callers holding the grouped
    layout feed the pre-selected stride-8 pixel set (see SSSRDecoder's FA
    corner feed) and pass stride=1 — the parameter shapes (and thus
    checkpoints) are identical either way."""
    dtype: jnp.dtype = jnp.float32
    stride: int = 8

    @nn.compact
    def __call__(self, x, train: bool, freeze_bn: bool = False):
        y = _conv(1, 1, stride=self.stride, name='0', dtype=self.dtype)(x)
        y = TorchBatchNorm(1, dtype=self.dtype, name='1')(y, (not train) or freeze_bn)
        return nn.relu(y)


class DSRL(nn.Module):
    """Returns (SSSR, SISR, SSSR_transformed, SISR_transformed); entries for
    branches not built at this stage are None (static stage gating)."""
    stage: int
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    backbone_layers: tuple = None  # None -> settings.BACKBONE_LAYERS
    zero_init_last_bn: bool = True  # False -> reference's effective init (resnet.py)

    @nn.compact
    def __call__(self, x, train: bool = False, freeze_bn: bool = False,
                 grouped: bool = False, pre_tail: bool = False
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray],
                            Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        assert self.stage in (1, 2, 3), \
            "BUG CHECK: Unsupported stage {0} specified in DSRL.__init__().".format(self.stage)
        # Label the forward in profiler traces, like the reference's
        # record_function scope (/root/reference/models/DSRL.py:159).
        with jax.named_scope('DSRL.forward'):
            x = x.astype(self.dtype)
            cat_features = FeatureExtractor(
                dtype=self.dtype, backbone_layers=self.backbone_layers,
                zero_init_last_bn=self.zero_init_last_bn,
                name='feature_extractor')(x, train, freeze_bn)
            want_fa_corner = grouped and self.stage > 2
            sssr_output = SSSRDecoder(self.num_classes, dtype=self.dtype, name='SSSR_decoder')(
                cat_features, train, freeze_bn, grouped,
                return_fa_corner=want_fa_corner, pre_tail=pre_tail)
            fa_corner = None
            if want_fa_corner:
                sssr_output, fa_corner = sssr_output

            sisr_output = sssr_t = sisr_t = None
            if self.stage > 1:
                sisr_decoder = SISRDecoder(dtype=self.dtype, name='SISR_decoder')
                sisr_output = sisr_decoder(cat_features, grouped)
                if self.stage > 2:
                    if grouped:
                        # fa_corner IS the stride-8 sampling of the full-res
                        # logits, computed pre-ConvT (see SSSRDecoder).
                        sssr_t = FeatureTransformer(dtype=self.dtype, stride=1,
                                                    name='SSSR_feature_transformer')(fa_corner, train, freeze_bn)
                        # stride-8 sampling of the full-res SISR RGB == the
                        # (i, j) = (0, 0) pre-shuffle channels [0, r*r, 2*r*r]
                        # — an identity that needs the transformer's stride
                        # (8) to equal the decoder's upscale factor.
                        assert sisr_decoder.upscale_factor == 8, \
                            "grouped FA feed assumes SISR upscale_factor == 8"
                        sisr_strided = sisr_output[..., ::sisr_decoder.upscale_factor ** 2]
                        sisr_t = FeatureTransformer(dtype=self.dtype, stride=1,
                                                    name='SISR_feature_transformer')(sisr_strided, train, freeze_bn)
                    else:
                        sssr_t = FeatureTransformer(dtype=self.dtype, name='SSSR_feature_transformer')(sssr_output, train, freeze_bn)
                        sisr_t = FeatureTransformer(dtype=self.dtype, name='SISR_feature_transformer')(sisr_output, train, freeze_bn)
        return sssr_output, sisr_output, sssr_t, sisr_t
