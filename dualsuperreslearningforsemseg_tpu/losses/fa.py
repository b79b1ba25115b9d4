"""Feature-affinity (FA) loss — closed-form all-pairs L1, never materializing
the quadratic pair tensor.

Reference semantics (/root/reference/models/losses/FALoss.py:8-33), matched
bit-for-bit in f32:

1. ``AvgPool2d(8)`` subsample of both feature maps.
2. Per-(batch, channel) normalization by the **spectral norm** (largest
   singular value) over the (H, W) matrix.  NB: the reference calls
   ``torch.linalg.norm(ord=2, dim=(2,3))`` which is the matrix 2-norm, NOT
   the Frobenius norm the paper implies — we reproduce the code's actual
   behavior.
3. Column-similarity matrix ``S = Mᵀ M`` of the (h, w) map -> (w, w).
4. The reference then forms every pair (S1 element, S2 element) via
   ``repeat_interleave``/``repeat`` — an O(N²) tensor for N = w² similarity
   entries — and takes ``l1_loss`` (mean of |a_i - b_j| over all N² pairs).

Step 4 decomposes exactly: with b sorted ascending, prefix sums P and
k_i = #{j : b_j <= a_i},

    Σ_j |a_i - b_j| = a_i (2 k_i - N) + Σ_j b_j - 2 P[k_i]

so the all-pairs reduction is O(N log N) (one sort + one searchsorted)
instead of O(N²) memory — the same trick flash-attention uses to avoid
materializing QKᵀ, applied to the pairwise L1.  Gradients flow through the
sort/gather and match the sign-based subgradient of |·| almost everywhere.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.resize import avg_pool_nhwc


def _spectral_norm_hw(x: jnp.ndarray, iters: int = 60) -> jnp.ndarray:
    """Largest singular value of each (..., h, w) matrix, keepdims on (h, w).

    Computed by power iteration on G = AᵀA instead of ``jnp.linalg.svd`` —
    XLA's TPU SVD lowers to an enormous iterative routine whose compile time
    (especially under autodiff) dominates the whole train-step build.  Power
    iteration is a chain of tiny MXU matvecs; the value converges to σ₁ and
    the gradient is taken through the exact Rayleigh quotient σ = uᵀAv with
    stop-gradient singular vectors — mathematically the true SVD gradient
    (dσ/dA = u vᵀ) almost everywhere.
    """
    a = x.astype(jnp.float32)
    gram = jnp.einsum('...hi,...hj->...ij', a, a)      # (..., w, w)
    w = gram.shape[-1]
    # Deterministic, generically non-orthogonal start vector.
    v = jnp.full(gram.shape[:-2] + (w,), 1.0 / np.sqrt(w), jnp.float32)
    v = v.at[..., 0].add(0.01)

    def body(_, v):
        v = jnp.einsum('...ij,...j->...i', gram, v)
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)

    v = jax.lax.fori_loop(0, iters, body, v)
    v = jax.lax.stop_gradient(v)
    av = jnp.einsum('...hi,...i->...h', a, v)           # A v
    sigma_u = jnp.linalg.norm(av, axis=-1, keepdims=True)
    u = jax.lax.stop_gradient(av / jnp.maximum(sigma_u, 1e-30))
    sigma = jnp.einsum('...h,...hi,...i->...', u, a, v)  # uᵀ A v, grad = u vᵀ
    return jnp.maximum(sigma, 1e-30)[..., None, None]


def _column_similarity(fm_hw: jnp.ndarray) -> jnp.ndarray:
    """S = Mᵀ M for one (h, w) map -> (w, w), matching FALoss.py:11."""
    return jnp.einsum('hi,hj->ij', fm_hw, fm_hw, preferred_element_type=jnp.float32)


def _allpairs_abs_mean(a_flat: jnp.ndarray, b_flat: jnp.ndarray) -> jnp.ndarray:
    """mean_{i,j} |a_i - b_j| for 1-D a, b of length N, in O(N log N)."""
    n = a_flat.shape[0]
    bs = jnp.sort(b_flat)
    prefix = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(bs)])
    k = jnp.searchsorted(bs, a_flat, side='right')
    total = prefix[-1]
    contrib = a_flat * (2.0 * k.astype(jnp.float32) - n) + total - 2.0 * prefix[k]
    return contrib.sum() / (n * n)


def _fa_single(fm1_hw: jnp.ndarray, fm2_hw: jnp.ndarray) -> jnp.ndarray:
    """FA loss term for one (h, w) feature-map pair (one batch+channel slice)."""
    s1 = _column_similarity(fm1_hw / _spectral_norm_hw(fm1_hw))
    s2 = _column_similarity(fm2_hw / _spectral_norm_hw(fm2_hw))
    return _allpairs_abs_mean(s1.reshape(-1), s2.reshape(-1))


def fa_loss(feature_map1: jnp.ndarray, feature_map2: jnp.ndarray,
            subsample_factor: int = 8, impl: str = 'auto') -> jnp.ndarray:
    """FA loss over NHWC feature maps; scalar f32, reduction='mean'.

    impl: 'sorted' (closed form, O(N log N)), 'pallas' (blocked TPU kernel,
    O(N²/tile) with no quadratic memory), or 'auto' (pallas on TPU when the
    similarity size is lane-aligned, else sorted).
    """
    assert feature_map1.ndim == 4, \
        "BUG CHECK: Feature map inputs to fa_loss must have 4 dimensions (B, H, W, C)."
    assert feature_map1.shape == feature_map2.shape, \
        "BUG CHECK: Feature map inputs to fa_loss should be of same size."

    p1 = avg_pool_nhwc(feature_map1.astype(jnp.float32), subsample_factor)
    p2 = avg_pool_nhwc(feature_map2.astype(jnp.float32), subsample_factor)
    # (B, h, w, C) -> (B*C, h, w) slices, vmapped.
    p1 = jnp.transpose(p1, (0, 3, 1, 2)).reshape(-1, p1.shape[1], p1.shape[2])
    p2 = jnp.transpose(p2, (0, 3, 1, 2)).reshape(-1, p2.shape[1], p2.shape[2])

    n_sim = p1.shape[2] * p1.shape[2]  # similarity is (w, w) -> N = w² entries
    if impl == 'auto':
        # The N² pair tensor is tiny at production shapes (N=256 -> 65k
        # elements/slice): plain elementwise math beats any clever scheme and
        # carries zero compile risk.  The blocked pallas kernel / sorted
        # closed form take over only when the FULL pair tensor — all
        # B*C slices, f32, forward AND its same-size gradient — would
        # actually blow up memory, so the bound is on slices * N², not on
        # one slice's N² (a (16, 352, 352, 19) input keeps N² at ~3.7M but
        # carries 304 slices ≈ 4.6 GB dense).  256M f32 elements ≈ 1 GB
        # fwd + 1 GB bwd, comfortably under a v5e chip's HBM next to the
        # model state.
        if p1.shape[0] * n_sim * n_sim <= 256_000_000:
            impl = 'dense'
        else:
            # Offline-safe backend resolution (utils/backend.py): a pinned
            # 'cpu' platform never touches the (possibly wedged) TPU tunnel.
            from ..utils.backend import resolve_backend
            on_tpu = resolve_backend() == 'tpu'
            impl = 'pallas' if (on_tpu and n_sim % 128 == 0) else 'sorted'

    if impl == 'dense':

        def sim(p):
            normed = p / _spectral_norm_hw(p)
            return jnp.einsum('bhi,bhj->bij', normed, normed,
                              preferred_element_type=jnp.float32)

        s1 = sim(p1).reshape(p1.shape[0], -1)
        s2 = sim(p2).reshape(p2.shape[0], -1)
        return jnp.abs(s1[:, :, None] - s2[:, None, :]).mean()

    if impl == 'pallas':
        from ..ops.pallas import fa_allpairs_abs_mean_pallas

        def sim_rows(p):
            s = jax.vmap(lambda m: _column_similarity(m / _spectral_norm_hw(m)))(p)
            return s.reshape(s.shape[0], -1)

        return fa_allpairs_abs_mean_pallas(sim_rows(p1), sim_rows(p2))

    per_slice = jax.vmap(_fa_single)(p1, p2)
    return per_slice.mean()


def fa_loss_reference_dense(feature_map1: jnp.ndarray, feature_map2: jnp.ndarray,
                            subsample_factor: int = 8) -> jnp.ndarray:
    """O(N²) brute-force transcription of the reference reduction — used only
    as the golden model in parity tests for :func:`fa_loss`."""
    p1 = avg_pool_nhwc(feature_map1.astype(jnp.float32), subsample_factor)
    p2 = avg_pool_nhwc(feature_map2.astype(jnp.float32), subsample_factor)
    p1 = jnp.transpose(p1, (0, 3, 1, 2))
    p2 = jnp.transpose(p2, (0, 3, 1, 2))
    n1 = _spectral_norm_hw(p1)
    n2 = _spectral_norm_hw(p2)
    p1, p2 = p1 / n1, p2 / n2
    s1 = jnp.einsum('bchi,bchj->bcij', p1, p1)
    s2 = jnp.einsum('bchi,bchj->bcij', p2, p2)
    a = s1.reshape(*s1.shape[:2], -1)
    b = s2.reshape(*s2.shape[:2], -1)
    pairs = jnp.abs(a[..., :, None] - b[..., None, :])
    return pairs.mean()
