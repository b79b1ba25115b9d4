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
    # Cast to the activation dtype: a bf16 x against the raw f32 param would
    # silently promote the whole matmul to f32 (CLAUDE.md rule 8, ~4x MXU).
    wmat = jnp.transpose(weight, (0, 2, 3, 1)).reshape(
        cin, 4 * cout).astype(x.dtype)
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
    """ConvTranspose2d(k=2,s=2) producing GROUPED output (B, H, W, G*4, Cout).

    Mathematically identical to :func:`conv_transpose_2x2_stride2` followed by
    a (2,2) space-to-depth — but it never materializes the interleaved
    full-resolution layout, whose transpose copies cost ~4 ms each per step
    at (B,512,1024,19) on v5e.  Input may itself be grouped
    ((B, H, W, G, Cin)): each group element is an independent pixel.

    Group order is NESTED, not row-major-by-offset: stacking two of these,
    group index g = ((i*2+j)*2+k)*2+l addresses output pixel
    (4h + 2i + k, 4w + 2j + l).  Nesting keeps the composed group axis a pure
    reshape of the matmul output — the flat (p, q) = (2i+k, 2j+l) order would
    need an 8-D interleave transpose costing ~4 ms fwd + ~4 ms bwd per step
    on the (B,128,256,·,19) logits.  Group 0 is offset (0, 0) in either
    order, so stride-sampling consumers (the FA transformer slice) are
    unaffected; :func:`ungroup_2x2` and :func:`group_labels` use the same
    nesting.
    """
    cin, cout = weight.shape[0], weight.shape[1]
    # Activation-dtype cast: same silent-f32-promotion guard as the plain
    # variant above.
    wmat = jnp.transpose(weight, (0, 2, 3, 1)).reshape(
        cin, 4 * cout).astype(x.dtype)
    if x.ndim == 4:
        b, h, w, _ = x.shape
        y = jnp.einsum('bhwi,io->bhwo', x, wmat,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.reshape(b, h, w, 4, cout)      # group = k*2 + l
    else:
        b, h, w, g, _ = x.shape
        y = jnp.einsum('bhwgi,io->bhwgo', x, wmat,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.reshape(b, h, w, g * 4, cout)  # nested: g_new = g*4 + (k*2+l)
    if bias is not None:
        # NB: AD's bias gradient is a serial reduce (~2.8 ms/step at
        # (16,128,256,16,19) on v5e).  A custom-vjp dot-form gradient was
        # built and traced — it LOST: the (-1, C) reshape + column-major
        # dot operand layout cost ~9 ms/step in copies and broke CE fusion.
        y = y + bias.astype(y.dtype)
    return y


TAIL_COL_BLOCK = 32   # columns per position block in the cols layout


def conv_transpose_2x2_stride2_cols(x: jnp.ndarray, weight: jnp.ndarray,
                                    blk: int = TAIL_COL_BLOCK) -> jnp.ndarray:
    """ConvTranspose2d(k=2,s=2) emitting CHANNEL-PADDED COLUMNS:
    (B, H, W, 4*blk), where column ``g*blk + co`` holds output channel ``co``
    of 2x2 position ``g = kh*2 + kw`` and columns ``co >= Cout`` are zero.

    Same values as :func:`conv_transpose_2x2_stride2_grouped` with the
    (G, Cout) axes fused and each position padded to a ``blk``-column slot —
    but as a LAYOUT the padded trailing dim is a multiple of the TPU's
    128-lane tile, so every downstream elementwise op (BN/relu/dropout) and
    the fused Pallas tail consume it at its physical size.  The natural
    (..., G, 19) orientation pads 19 lanes to 128 in the default layout the
    Pallas operand forces — 6.7x the logical bytes, measured as ~2.7 ms/step
    of pure re-layout copies at (16,128,256,4,19) bf16 on v5e.  The zero
    padding is FREE at the producer: it lives in the weight matrix, not in a
    pad op.  Padded-column gradients are structurally zero, so AD maps dY
    back through the same (Cin, 4*blk) matrix exactly."""
    cin, cout = weight.shape[0], weight.shape[1]
    assert cout <= blk, "cols layout needs Cout <= block width"
    wt = jnp.transpose(weight, (0, 2, 3, 1)).reshape(cin, 4, cout)
    wcols = jnp.pad(wt, ((0, 0), (0, 0), (0, blk - cout))).reshape(cin, 4 * blk)
    return jnp.einsum('bhwi,io->bhwo', x, wcols.astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def conv_transpose_2x2_stride2_corner(x: jnp.ndarray, weight: jnp.ndarray,
                                      bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Only the (k=0, l=0) output position of ``ConvTranspose2d(k=2, s=2)``:
    out[h, w] = full_out[2h, 2w] = x[h, w] @ W[:, :, 0, 0] (+ b).

    A ConvT(2,2) writes each input pixel to a disjoint 2x2 block, so the
    even-even output plane depends only on the corner weight slice — this
    lets the FA transformer's stride-8 sampling of the logits be computed
    from the (4x smaller) pre-ConvT activation with the SAME shared
    parameters, exactly.  Slicing the full grouped logits instead makes AD
    pad the 19-channel gradient back to full size, which cost ~8 ms/step of
    layout copies at (16,128,256,16,19) bf16 on v5e."""
    wc = weight[:, :, 0, 0].astype(x.dtype)       # (Cin, Cout)
    y = jnp.einsum('bhwi,io->bhwo', x, wc,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def ungroup_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, G, C) nested-grouped layout -> (B, F*H, F*W, C) full
    resolution, F = sqrt(G).  Nested index (see
    :func:`conv_transpose_2x2_stride2_grouped`): G=4 -> pixel (2h+k, 2w+l)
    with g = k*2+l; G=16 -> pixel (4h+2i+k, 4w+2j+l) with
    g = ((i*2+j)*2+k)*2+l."""
    b, h, w, g, c = x.shape
    if g == 4:
        x = x.reshape(b, h, w, 2, 2, c)                  # (k, l)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))         # (b, h, k, w, l, c)
        return x.reshape(b, 2 * h, 2 * w, c)
    if g == 16:
        x = x.reshape(b, h, w, 2, 2, 2, 2, c)            # (i, j, k, l)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))   # (b, h, i, k, w, j, l, c)
        return x.reshape(b, 4 * h, 4 * w, c)
    raise ValueError("unsupported group count {}".format(g))


def group_labels(seg: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, F*H, F*W) int labels -> (B, H, W, F*F) matching the nested
    grouped-logits order of :func:`conv_transpose_2x2_stride2_grouped`."""
    b, fh, fw = seg.shape
    if factor == 4:
        h, w = fh // 4, fw // 4
        seg = seg.reshape(b, h, 2, 2, w, 2, 2)            # (h, i, k, w, j, l)
        seg = jnp.transpose(seg, (0, 1, 4, 2, 5, 3, 6))   # (b, h, w, i, j, k, l)
        return seg.reshape(b, h, w, 16)
    if factor == 2:
        h, w = fh // 2, fw // 2
        seg = seg.reshape(b, h, 2, w, 2)
        seg = jnp.transpose(seg, (0, 1, 3, 2, 4))
        return seg.reshape(b, h, w, 4)
    raise ValueError("unsupported grouping factor {}".format(factor))


def group_labels_g16_t(seg: jnp.ndarray) -> jnp.ndarray:
    """(B, 4H, 4W) labels -> (16, B*H*W) uint8 for the cols-layout fused
    tail kernel: row ``g*4 + p`` (g = first-ConvT nested group, p = final
    2x2 position — i.e. the full nested g16 index) of column (b, h, w) holds
    the label of full-res pixel (4h + 2*(g//2) + p//2, 4w + 2*(g%2) + p%2).
    uint8 so the kernel operand is 8.4 MB.  PERF: call this in its own
    little jit (or eagerly), NOT inside the train step — standalone it runs
    at memory speed (~0.05 ms), but embedded next to the pallas consumer
    XLA's layout assignment stages it through pathological relayouts
    (~7-8 ms/step measured on v5e, for every formulation tried: u8 or int32
    monolithic 7-D transpose, strided-slice + concat).  Production path:
    the C++ data plane's identical dp_labels_g16_t on host threads."""
    b, fh, fw = seg.shape
    h, w = fh // 4, fw // 4
    s = seg.astype(jnp.uint8).reshape(b, h, 2, 2, w, 2, 2)  # (b,h,i,k,w,j,l)
    s = jnp.transpose(s, (2, 5, 3, 6, 0, 1, 4))             # (i,j,k,l,b,h,w)
    return s.reshape(16, b * h * w)


def pixel_unshuffle(x: jnp.ndarray, downscale_factor: int) -> jnp.ndarray:
    """Exact ``torch.nn.PixelUnshuffle(r)`` on NHWC input — the inverse of
    :func:`pixel_shuffle`: out channel c*r*r + i*r + j holds pixel
    (r*h + i, r*w + j) of input channel c.

    Train-path use: the SISR branch keeps its conv output in pre-shuffle
    layout and the MSE TARGET is unshuffled instead — being on the no-grad
    side it needs no backward materialization (the full-res shuffle of the
    prediction cost ~2.5 ms/step at (16,512,1024,3) on v5e).  The transpose
    does materialize one ~1 ms f32 copy; un-flattened 6-D views were traced
    and do NOT remove it (the source layout makes the pre-reshape a real
    copy too)."""
    r = int(downscale_factor)
    b, rh, rw, c = x.shape
    h, w = rh // r, rw // r
    x = x.reshape(b, h, r, w, r, c)             # (h, i, w, j, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))    # (b, h, w, c, i, j)
    return x.reshape(b, h, w, c * r * r)


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
