"""Parity tests of the NHWC op primitives against PyTorch (CPU) goldens."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch as t
import torch.nn.functional as F

from dualsuperreslearningforsemseg_tpu.ops import (
    resize_bilinear_align_corners, resize_nearest, avg_pool_nhwc,
    conv_transpose_2x2_stride2, pixel_shuffle,
    make_input_output_visualization)


def nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


@pytest.mark.parametrize("in_hw,out_hw", [((8, 16), (16, 32)), ((32, 64), (128, 256)),
                                          ((16, 32), (8, 16)), ((5, 7), (11, 3)),
                                          ((1, 4), (3, 4)), ((4, 4), (4, 4))])
def test_bilinear_align_corners_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw))
    theirs = F.interpolate(t.from_numpy(nchw(x)), size=out_hw, mode='bilinear',
                           align_corners=True).numpy()
    np.testing.assert_allclose(ours, nhwc(theirs), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((8, 16), (16, 32)), ((512, 1024), (256, 512)),
                                          ((7, 5), (13, 11))])
def test_nearest_matches_torch(rng, in_hw, out_hw):
    seg = rng.integers(0, 255, size=(2, *in_hw)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(seg), out_hw, spatial_axes=(-2, -1)))
    theirs = F.interpolate(t.from_numpy(seg)[:, None], size=out_hw, mode='nearest').numpy()[:, 0]
    np.testing.assert_array_equal(ours, theirs)


def test_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 17, 33, 4), dtype=np.float32)  # non-divisible -> floor
    ours = np.asarray(avg_pool_nhwc(jnp.asarray(x), 8))
    theirs = t.nn.AvgPool2d(8)(t.from_numpy(nchw(x))).numpy()
    np.testing.assert_allclose(ours, nhwc(theirs), rtol=1e-6, atol=1e-6)


def test_conv_transpose_2x2_matches_torch(rng):
    cin, cout = 19, 19
    x = rng.standard_normal((2, 8, 12, cin), dtype=np.float32)
    w = rng.standard_normal((cin, cout, 2, 2), dtype=np.float32)
    b = rng.standard_normal((cout,), dtype=np.float32)

    ours = np.asarray(conv_transpose_2x2_stride2(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    ref = t.nn.ConvTranspose2d(cin, cout, 2, stride=2, padding=0, bias=True)
    with t.no_grad():
        ref.weight.copy_(t.from_numpy(w))
        ref.bias.copy_(t.from_numpy(b))
        theirs = ref(t.from_numpy(nchw(x))).numpy()
    np.testing.assert_allclose(ours, nhwc(theirs), rtol=1e-4, atol=1e-4)


def test_pixel_shuffle_matches_torch(rng):
    r = 4
    x = rng.standard_normal((2, 3, 5, 3 * r * r), dtype=np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    theirs = t.nn.PixelShuffle(r)(t.from_numpy(nchw(x))).numpy()
    np.testing.assert_array_equal(ours, nhwc(theirs))


def test_pixel_unshuffle_matches_torch(rng):
    from dualsuperreslearningforsemseg_tpu.ops.conv import pixel_unshuffle
    r = 4
    x = rng.standard_normal((2, 3 * r, 5 * r, 3), dtype=np.float32)
    ours = np.asarray(pixel_unshuffle(jnp.asarray(x), r))
    theirs = t.nn.PixelUnshuffle(r)(t.from_numpy(nchw(x))).numpy()
    np.testing.assert_array_equal(ours, nhwc(theirs))
    # inverse of pixel_shuffle
    np.testing.assert_array_equal(np.asarray(pixel_shuffle(jnp.asarray(ours), r)), x)


def test_visualization_strip_shape_and_palette(rng):
    from dualsuperreslearningforsemseg_tpu.datasets import cityscapes as cs
    img = rng.integers(0, 255, size=(3, 16, 24)).astype(np.uint8)
    seg = rng.integers(0, 19, size=(16, 24))
    seg[0, 0] = 255  # ignore label -> black
    strip = make_input_output_visualization(img, seg, cs.CLASS_RGB_COLOR)
    assert strip.shape == (3, 16, 24 * 3)
    np.testing.assert_array_equal(strip[:, :, :24], img)          # input pane
    np.testing.assert_array_equal(strip[:, 0, 24], (0, 0, 0))     # ignore color
    cls = seg[3, 3]
    np.testing.assert_array_equal(strip[:, 3, 24 + 3], cs.CLASS_RGB_COLOR[cls])


def test_matmul_resize_matches_gather(rng):
    from dualsuperreslearningforsemseg_tpu.ops.resize import resize_bilinear_matmul
    x = rng.standard_normal((2, 16, 32, 8), dtype=np.float32)
    a = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (64, 128)))
    b = np.asarray(resize_bilinear_matmul(jnp.asarray(x), (64, 128)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # downscale path too
    a = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (7, 13)))
    b = np.asarray(resize_bilinear_matmul(jnp.asarray(x), (7, 13)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_grouped_conv_transpose_equals_plain(rng):
    """Grouped convT chain + ungroup must equal two plain convTs exactly."""
    from dualsuperreslearningforsemseg_tpu.ops.conv import (
        conv_transpose_2x2_stride2_grouped, ungroup_2x2, group_labels)
    c = 19
    x = jnp.asarray(rng.standard_normal((2, 8, 12, c), dtype=np.float32))
    w1 = jnp.asarray(rng.standard_normal((c, c, 2, 2), dtype=np.float32))
    w2 = jnp.asarray(rng.standard_normal((c, c, 2, 2), dtype=np.float32))
    b2 = jnp.asarray(rng.standard_normal((c,), dtype=np.float32))

    plain = conv_transpose_2x2_stride2(
        conv_transpose_2x2_stride2(x, w1, None), w2, b2)

    g1 = conv_transpose_2x2_stride2_grouped(x, w1, None)        # (B,8,12,4,c)
    assert g1.shape == (2, 8, 12, 4, c)
    g2 = conv_transpose_2x2_stride2_grouped(g1, w2, b2)         # (B,8,12,16,c)
    assert g2.shape == (2, 8, 12, 16, c)
    np.testing.assert_allclose(np.asarray(ungroup_2x2(g2)), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)

    # intermediate single-step grouping too
    np.testing.assert_allclose(
        np.asarray(ungroup_2x2(g1)),
        np.asarray(conv_transpose_2x2_stride2(x, w1, None)), rtol=1e-6, atol=1e-6)


def test_group_labels_matches_ungroup(rng):
    """group_labels must be the exact inverse arrangement of ungroup_2x2."""
    from dualsuperreslearningforsemseg_tpu.ops.conv import ungroup_2x2, group_labels
    seg = rng.integers(0, 19, size=(2, 32, 48)).astype(np.int32)
    grouped = group_labels(jnp.asarray(seg), 4)                 # (B,8,12,16)
    assert grouped.shape == (2, 8, 12, 16)
    # route through ungroup (needs a channel axis) and compare
    back = ungroup_2x2(grouped[..., None].astype(np.float32))[..., 0]
    np.testing.assert_array_equal(np.asarray(back).astype(np.int32), seg)


def test_conv_transpose_variants_do_not_promote_bf16_to_f32():
    """Every ConvT variant must cast the weight to the activation dtype
    before the matmul: a bf16 activation against the raw f32 parameter would
    silently promote the einsum to a full-f32 matmul (the CLAUDE.md rule-8
    hazard, ~4x MXU throughput).  Checked on the jaxpr: no dot_general may
    see an f32 operand when the activation is bf16."""
    import jax
    from dualsuperreslearningforsemseg_tpu.ops.conv import (
        conv_transpose_2x2_stride2, conv_transpose_2x2_stride2_grouped,
        conv_transpose_2x2_stride2_cols, conv_transpose_2x2_stride2_corner)

    w = jnp.zeros((19, 19, 2, 2), jnp.float32)
    x4 = jnp.zeros((1, 4, 4, 19), jnp.bfloat16)
    x5 = jnp.zeros((1, 4, 4, 4, 19), jnp.bfloat16)

    def assert_bf16_dots(fn, *args):
        jaxpr = jax.make_jaxpr(fn)(*args)
        dots = [eqn for eqn in jaxpr.jaxpr.eqns
                if eqn.primitive.name == 'dot_general']
        assert dots, "expected a matmul in {}".format(fn)
        for eqn in dots:
            for v in eqn.invars:
                assert v.aval.dtype == jnp.bfloat16, \
                    "f32 operand leaked into the matmul: {}".format(eqn)

    assert_bf16_dots(lambda x: conv_transpose_2x2_stride2(x, w), x4)
    assert_bf16_dots(lambda x: conv_transpose_2x2_stride2_grouped(x, w), x4)
    assert_bf16_dots(lambda x: conv_transpose_2x2_stride2_grouped(x, w), x5)
    assert_bf16_dots(lambda x: conv_transpose_2x2_stride2_cols(x, w), x4)
    assert_bf16_dots(lambda x: conv_transpose_2x2_stride2_corner(x, w), x4)
