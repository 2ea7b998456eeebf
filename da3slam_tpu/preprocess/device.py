"""On-device preprocessing kernels (pure JAX, batched, fused under jit).

Behavioral port of the reference's OpenCV chain (preprocess_brightness.py:7-102,
preprocess_crop.py:4-69) re-designed for TPU: no per-image Python, no uint8
LUTs — everything is vectorised float math over ``[N, H, W, 3]`` batches so
XLA fuses the whole chain into a handful of kernels.

Differences vs OpenCV (documented, tested for behavior not bit-parity):
- CLAHE uses soft-binned tile histograms + bilinearly-interpolated tile CDFs
  (the same algorithm; OpenCV's integer LUT rounding differs at the LSB).
- LAB is the standard CIELAB (D65) with OpenCV's uint8 scaling (L·255/100,
  a/b + 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# color space
# ---------------------------------------------------------------------------

def _srgb_to_linear(c):
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c):
    c = jnp.maximum(c, 0.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1 / 2.4) - 0.055)


_RGB2XYZ = jnp.array(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]]
)
_XYZ_WHITE = jnp.array([0.950456, 1.0, 1.088754])


def _lab_f(t):
    d = 6.0 / 29.0
    return jnp.where(t > d**3, jnp.cbrt(t), t / (3 * d * d) + 4.0 / 29.0)


def _lab_f_inv(t):
    d = 6.0 / 29.0
    return jnp.where(t > d, t**3, 3 * d * d * (t - 4.0 / 29.0))


def rgb_to_lab(rgb: jax.Array) -> jax.Array:
    """uint8/float RGB ``[..., 3]`` → LAB in OpenCV uint8 scaling
    (L ∈ [0, 255], a/b centred at 128)."""
    x = rgb.astype(jnp.float32)
    if rgb.dtype == jnp.uint8:
        x = x / 255.0
    lin = _srgb_to_linear(x)
    xyz = lin @ _RGB2XYZ.T / _XYZ_WHITE
    f = _lab_f(xyz)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([L * 255.0 / 100.0, a + 128.0, b + 128.0], axis=-1)


def lab_to_rgb(lab: jax.Array) -> jax.Array:
    """Inverse of :func:`rgb_to_lab`; returns float RGB in [0, 1]."""
    L = lab[..., 0] * 100.0 / 255.0
    a = lab[..., 1] - 128.0
    b = lab[..., 2] - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_lab_f_inv(fx), _lab_f_inv(fy), _lab_f_inv(fz)], -1) * _XYZ_WHITE
    lin = xyz @ jnp.linalg.inv(_RGB2XYZ).T
    return jnp.clip(_linear_to_srgb(lin), 0.0, 1.0)


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------

def _tile_histograms(bins: jax.Array, n_bins: int) -> jax.Array:
    """Per-tile histograms of integer bin indices ``[..., P]`` → ``[..., B]``.

    Sort + vectorized binary search for the cumulative counts, then
    difference: O(P log²P) work and O(P + B) memory per tile, vs the
    one-hot formulation's O(P·B).  Measured head-to-head on a v5e the two
    are EQUAL inside preprocess_batch (165.8 vs 165.7 ms per 16×504²
    batch — XLA fuses the one-hot into its reduction, so the O(P·B)
    intermediate never hits HBM); this formulation is kept for its bounded
    memory guarantee, which holds for any tile size / bin count rather
    than relying on that fusion firing."""
    sorted_bins = jnp.sort(bins, axis=-1)
    edges = jnp.arange(n_bins, dtype=bins.dtype)

    def cdf_one(tile):
        return jnp.searchsorted(tile, edges, side="right")

    for _ in range(bins.ndim - 1):
        cdf_one = jax.vmap(cdf_one)
    cdf = cdf_one(sorted_bins)  # [..., B] cumulative counts
    return jnp.diff(cdf, prepend=0, axis=-1).astype(jnp.float32)


def clahe(
    l_channel: jax.Array,
    clip_limit: float = 2.0,
    grid_size: int = 8,
    n_bins: int = 256,
) -> jax.Array:
    """Contrast-limited adaptive histogram equalisation on an ``[H, W]``
    luminance channel in [0, 255].

    Tiles the image ``grid_size × grid_size``, clips each tile's histogram at
    ``clip_limit ×`` the uniform level (redistributing the excess), builds
    per-tile CDF lookup curves, and maps each pixel through the bilinear
    interpolation of its 4 neighbouring tile curves — the OpenCV CLAHE
    algorithm in fixed-shape tensor form.
    """
    H, W = l_channel.shape
    G = grid_size
    th, tw = H // G, W // G
    Hc, Wc = th * G, tw * G  # crop ragged edge for the histogram pass only
    x = l_channel[:Hc, :Wc].reshape(G, th, G, tw).transpose(0, 2, 1, 3).reshape(G, G, th * tw)

    bins = jnp.clip(x.astype(jnp.int32) * n_bins // 256, 0, n_bins - 1)
    hist = _tile_histograms(bins, n_bins)  # [G, G, B]

    # clip + redistribute excess uniformly
    clip = clip_limit * (th * tw) / n_bins
    excess = jnp.sum(jnp.maximum(hist - clip, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, clip) + excess / n_bins

    cdf = jnp.cumsum(hist, axis=-1)
    cdf_min = cdf[..., :1]
    denom = jnp.maximum(cdf[..., -1:] - cdf_min, 1.0)
    lut = (cdf - cdf_min) / denom * 255.0  # [G, G, B]

    # per-pixel bilinear interpolation of the 4 neighbouring tile LUTs
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    gy = jnp.clip((yy - th / 2) / th, 0.0, G - 1.0)
    gx = jnp.clip((xx - tw / 2) / tw, 0.0, G - 1.0)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, G - 1)
    x1 = jnp.minimum(x0 + 1, G - 1)
    fy = gy - y0
    fx = gx - x0

    pix_bin = jnp.clip(l_channel.astype(jnp.int32) * n_bins // 256, 0, n_bins - 1)
    v00 = lut[y0, x0, pix_bin]
    v01 = lut[y0, x1, pix_bin]
    v10 = lut[y1, x0, pix_bin]
    v11 = lut[y1, x1, pix_bin]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


# ---------------------------------------------------------------------------
# brightness normalisation (the full reference chain)
# ---------------------------------------------------------------------------

def adjust_brightness(
    image: jax.Array,
    bright_threshold: float = 230.0,
    dark_threshold: float = 30.0,
    bright_reduction: float = 0.7,
    dark_enhancement: float = 1.5,
    clip_limit: float = 2.0,
    grid_size: int = 8,
    unsharp_alpha: float = 0.3,
) -> jax.Array:
    """One frame ``[H, W, 3]`` uint8/float RGB → normalised uint8 RGB.

    The 5-step reference chain (preprocess_brightness.py:30-102):
    CLAHE on L → attenuate over-bright pixels → boost over-dark pixels →
    adaptive gamma by mean brightness → 3x3 sharpen blended at α=0.3.
    """
    lab = rgb_to_lab(image)
    L, A, B = lab[..., 0], lab[..., 1], lab[..., 2]

    l_clahe = clahe(L, clip_limit, grid_size)
    # over-bright pixels use the attenuated ORIGINAL L (reference keeps the
    # pre-CLAHE value there, preprocess_brightness.py:44-53)
    l_result = jnp.where(L > bright_threshold, jnp.clip(L * bright_reduction, 0, 255), l_clahe)
    l_result = jnp.where(L < dark_threshold, jnp.clip(l_result * dark_enhancement, 0, 255), l_result)

    mean_b = jnp.mean(l_result)
    gamma = jnp.where(mean_b < 100.0, 0.8, jnp.where(mean_b > 150.0, 1.2, 1.0))
    l_result = ((l_result / 255.0) ** gamma) * 255.0

    # 3x3 sharpen (the [[-1]*3,[-1,9,-1],[-1]*3] kernel) + α-blend
    k = jnp.array([[-1.0, -1.0, -1.0], [-1.0, 9.0, -1.0], [-1.0, -1.0, -1.0]])
    l_pad = jnp.pad(l_result, 1, mode="edge")
    sharp = jax.lax.conv_general_dilated(
        l_pad[None, :, :, None], k[:, :, None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]
    sharp = jnp.clip(sharp, 0.0, 255.0)
    l_final = (1 - unsharp_alpha) * l_result + unsharp_alpha * sharp

    out = lab_to_rgb(jnp.stack([jnp.clip(l_final, 0, 255), A, B], axis=-1))
    return jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# crop + fused batch pipeline
# ---------------------------------------------------------------------------

def crop_square(
    images: jax.Array,
    ratio: float = 0.8,
    x_offset: int = 20,
    y_offset: int = 0,
) -> jax.Array:
    """Batched ratio-square crop ``[N, H, W, 3]`` → ``[N, S, S, 3]`` with the
    reference's offset + boundary clamps (preprocess_crop.py:31-57).
    Static output shape (ratio/offsets are Python values)."""
    N, H, W, _ = images.shape
    # the reference sizes the square from the height alone; portrait inputs
    # (H*ratio > W) must clamp to the width or the slice is unsatisfiable
    S = min(int(H * ratio), W)
    left = (W - S) // 2 + x_offset
    top = int(H * (1 - ratio) / 2) + y_offset
    left = min(max(left, 0), W - S)
    top = min(max(top, 0), H - S)
    return jax.lax.dynamic_slice(images, (0, top, left, 0), (N, S, S, images.shape[3]))


@functools.partial(
    jax.jit,
    static_argnames=("crop_ratio", "x_offset", "out_hw", "grid_size", "normalize"),
)
def preprocess_batch(
    frames: jax.Array,
    crop_ratio: float = 0.8,
    x_offset: int = 20,
    out_hw: tuple[int, int] | None = None,
    grid_size: int = 8,
    normalize: bool = True,
) -> jax.Array:
    """The fused ingest pipeline: crop → brightness-normalise → resize →
    ImageNet-normalise, one compiled program over a frame batch
    (BASELINE config 2; replaces the reference's three separate
    OpenCV/PIL passes over disk)."""
    from da3slam_tpu.ops.resize import resize_normalize

    x = crop_square(frames, crop_ratio, x_offset)
    x = jax.vmap(lambda f: adjust_brightness(f, grid_size=grid_size))(x)
    if out_hw is None:
        out_hw = (x.shape[1], x.shape[2])
    if normalize:
        return resize_normalize(x, out_hw)
    xf = x.astype(jnp.float32)
    return jax.image.resize(xf, (x.shape[0], *out_hw, 3), method="bilinear").astype(jnp.uint8)
