"""Convolution-adjacent primitives as MXU-friendly matmuls, NHWC layout.

The reference's SSSR upsampling tail uses two ``ConvTranspose2d(kernel=2,
stride=2)`` layers (/root/reference/models/DSRL.py:55-69) and the SISR branch
ends in ``PixelShuffle(8)`` (/root/reference/models/DSRL.py:78-84).  A
kernel-2/stride-2 transposed conv writes each input pixel into a disjoint
2x2 output block, so instead of lowering to a strided transposed convolution
(poor MXU utilization) it is expressed as one dense matmul
``(B*H*W, Cin) @ (Cin, Cout*4)`` followed by a reshape — the matmul maps
straight onto the 128x128 systolic array and XLA fuses the block scatter into
the output layout.  PixelShuffle is pure reshape/transpose (zero FLOPs).
"""

import jax.numpy as jnp


def conv_transpose_2x2_stride2(x: jnp.ndarray, weight: jnp.ndarray,
                               bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Exact ``torch.nn.ConvTranspose2d(kernel_size=2, stride=2, padding=0)``.

    Args:
      x: (B, H, W, Cin) input.
      weight: (Cin, Cout, 2, 2) — torch ConvTranspose2d weight layout.
      bias: optional (Cout,).

    Returns:
      (B, 2H, 2W, Cout).
    """
    b, h, w, cin = x.shape
    cin_w, cout = weight.shape[0], weight.shape[1]
    assert cin == cin_w, "weight Cin mismatch"
    # (Cin, Cout, 2, 2) -> (Cin, 2, 2, Cout) -> (Cin, 4*Cout) so a single
    # matmul produces all four output positions of the 2x2 block at once.
    wmat = jnp.transpose(weight, (0, 2, 3, 1)).reshape(cin, 4 * cout)
    y = jnp.einsum('bhwi,io->bhwo', x, wmat,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(b, h, w, 2, 2, cout)          # (B,H,W,ki,kj,Cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))    # (B,H,ki,W,kj,Cout)
    y = y.reshape(b, 2 * h, 2 * w, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_transpose_2x2_stride2_grouped(x: jnp.ndarray, weight: jnp.ndarray,
                                       bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """ConvTranspose2d(k=2,s=2) producing GROUPED output (B, H, W, 4, Cout)
    where group index g = i*2 + j addresses output pixel (2h+i, 2w+j).

    Mathematically identical to :func:`conv_transpose_2x2_stride2` followed by
    a (2,2) space-to-depth — but it never materializes the interleaved
    full-resolution layout, whose transpose copies cost ~4 ms each per step
    at (B,512,1024,19) on v5e.  Input may itself be grouped
    ((B, H, W, G, Cin)): each group element is an independent pixel, and the
    output group axis composes as (2*i_prev + i_new) giving G*4 groups in the
    (p, q) = (2i+k, 2j+l) order expected by :func:`ungroup_2x2`.
    """
    cin, cout = weight.shape[0], weight.shape[1]
    wmat = jnp.transpose(weight, (0, 2, 3, 1)).reshape(cin, 4 * cout)
    if x.ndim == 4:
        b, h, w, _ = x.shape
        y = jnp.einsum('bhwi,io->bhwo', x, wmat,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.reshape(b, h, w, 4, cout)      # group = k*2 + l
    else:
        b, h, w, g, _ = x.shape
        y = jnp.einsum('bhwgi,io->bhwgo', x, wmat,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        # (B,H,W,G,4,C): G=(i,j) from before, 4=(k,l) new.  Compose to
        # (2i+k, 2j+l): split both, interleave as (i,k),(j,l).
        side = int(round(g ** 0.5))
        y = y.reshape(b, h, w, side, side, 2, 2, cout)        # (i,j,k,l)
        y = jnp.transpose(y, (0, 1, 2, 3, 5, 4, 6, 7))        # (i,k,j,l)
        y = y.reshape(b, h, w, (2 * side) * (2 * side), cout)  # p*2side+q
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def ungroup_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, F*F, C) grouped layout -> (B, F*H, F*W, C), where group
    index g = p*F + q addresses output pixel (F*h + p, F*w + q)."""
    b, h, w, g, c = x.shape
    f = int(round(g ** 0.5))
    x = x.reshape(b, h, w, f, f, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, f * h, f * w, c)


def group_labels(seg: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, F*H, F*W) int labels -> (B, H, W, F*F) matching the grouped-logits
    layout (group g = p*F + q <-> pixel (F*h+p, F*w+q))."""
    b, fh, fw = seg.shape
    f = factor
    h, w = fh // f, fw // f
    seg = seg.reshape(b, h, f, w, f)
    seg = jnp.transpose(seg, (0, 1, 3, 2, 4))
    return seg.reshape(b, h, w, f * f)


def pixel_shuffle(x: jnp.ndarray, upscale_factor: int) -> jnp.ndarray:
    """Exact ``torch.nn.PixelShuffle(r)`` on NHWC input.

    torch semantics (NCHW): out[b, c, r*h+i, r*w+j] = in[b, c*r^2 + i*r + j, h, w].
    NHWC: split the channel axis as (Cout, r, r) and interleave spatially.
    """
    r = int(upscale_factor)
    b, h, w, c = x.shape
    assert c % (r * r) == 0, "channels must be divisible by upscale_factor^2"
    cout = c // (r * r)
    x = x.reshape(b, h, w, cout, r, r)          # (B,H,W,Cout,i,j)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))    # (B,H,i,W,j,Cout)
    return x.reshape(b, r * h, r * w, cout)
