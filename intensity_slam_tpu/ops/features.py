"""Corner detection + binary descriptors + matching on intensity images
(reference C3).

The reference runs OpenCV ORB (1000 features, 8 pyramid levels) on the
intensity image with a crop mask, BFMatcher(Hamming, crossCheck=true), sorts
matches by distance keeping the top 30% (`src/intensity_feature_tracker.cpp:
609-646`), with a 2x-feature re-detect fallback keeping 20% (`:652-692`),
and lifts pixels to 3D via the organized cloud (`:1071-1099`).

TPU design — everything is dense tensor work over the (H, W) image:

- detector: Shi-Tomasi min-eigenvalue corner response (Sobel gradients +
  box-filtered structure tensor; pure convolutions that XLA fuses), NMS by
  max-pooling, fixed-size top-K.  ORB's FAST is a CPU-friendly decision tree;
  the corner-response formulation is the vectorized equivalent with better
  repeatability.
- descriptor: oriented BRIEF-256 — per-keypoint orientation by intensity
  centroid (ORB's method), a fixed 256-pair sampling pattern rotated by the
  orientation, bits packed into 8 uint32 words.  All K descriptors sample the
  blurred image in one gather.
- matcher: full K x K Hamming matrix via XOR + population count, mutual
  nearest neighbors (= BFMatcher crossCheck), then the reference's
  sort-and-keep-top-fraction rule implemented as a rank mask (fixed shapes).

The pyramid is omitted: LiDAR intensity images have fixed metric scale per
row, so scale invariance buys nothing frame-to-frame (consecutive scans view
the scene at near-identical scale).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FeatureConfig
from . import conv2d
from .projection import ScanImage

# ---------------------------------------------------------------------------
# Fixed BRIEF sampling pattern (generated once, deterministic).
# LiDAR intensity images are short (64 rows) and wide (1024 cols, wrapping in
# azimuth), so the support is anisotropic: wide in x (no border cost — columns
# wrap), short in y (every border row is a lost detection ring).
# ---------------------------------------------------------------------------
_PATTERN_BITS = 256
_PATCH_X = 15  # half-extent in azimuth (cols)
_PATCH_Y = 6   # half-extent in elevation (rows) — vertical detection border


def _make_pattern(seed: int = 1234) -> np.ndarray:
    rng = np.random.RandomState(seed)
    pts = rng.randn(_PATTERN_BITS, 2, 2)
    pts[..., 0] = np.clip(pts[..., 0] * (_PATCH_X / 2.5), -_PATCH_X, _PATCH_X)
    pts[..., 1] = np.clip(pts[..., 1] * (_PATCH_Y / 2.5), -_PATCH_Y, _PATCH_Y)
    return pts.astype(np.float32)


_PATTERN = jnp.asarray(_make_pattern())  # (256, 2, 2) [pair, endpoint, (dx,dy)]

# elliptical offsets for the orientation centroid
_ORI_OFF = np.stack(
    np.meshgrid(np.arange(-_PATCH_X, _PATCH_X + 1),
                np.arange(-_PATCH_Y, _PATCH_Y + 1),
                indexing="xy"),
    axis=-1,
).reshape(-1, 2).astype(np.float32)
_ORI_MASK = (
    (_ORI_OFF[:, 0] / _PATCH_X) ** 2 + (_ORI_OFF[:, 1] / _PATCH_Y) ** 2 <= 1.0
).astype(np.float32)
_ORI_OFF_J = jnp.asarray(_ORI_OFF)
_ORI_MASK_J = jnp.asarray(_ORI_MASK)


class Features(NamedTuple):
    uv: jax.Array        # (K, 2) int32 — (col, row) like cv::KeyPoint.pt
    score: jax.Array     # (K,) float32 corner response
    angle: jax.Array     # (K,) float32 orientation (rad)
    desc: jax.Array      # (K, 8) uint32 — 256-bit binary descriptor
    valid: jax.Array     # (K,) bool
    xyz: jax.Array       # (K, 3) float32 lifted 3D points (sensor frame)
    xyz_valid: jax.Array # (K,) bool — valid AND non-zero 3D lookup


class Matches(NamedTuple):
    src_idx: jax.Array   # (M,) int32 into previous-frame features
    dst_idx: jax.Array   # (M,) int32 into current-frame features
    dist: jax.Array      # (M,) float32 Hamming distance
    valid: jax.Array     # (M,) bool
    num_mutual: jax.Array  # () int32 — mutual NN count before the keep-frac cut
    num_good: jax.Array    # () int32 — matches surviving all gates


def _box_blur(img: jax.Array, k: int = 5) -> jax.Array:
    """Separable box filter (BRIEF's standard smoothing): edge rows, wrapped
    columns — a banded matmul on the MXU (see ops.conv2d)."""
    return conv2d.box_filter(img, k)


def corner_response(img: jax.Array, window: int = 5) -> jax.Array:
    """Shi-Tomasi min-eigenvalue response of the structure tensor."""
    gx, gy = conv2d.sobel(img)
    # blur the 3 structure-tensor channels in one batched matmul pass
    a, b, c = conv2d.box_filter(
        jnp.stack([gx * gx, gx * gy, gy * gy]), window)
    tr2 = (a + c) * 0.5
    det = jnp.sqrt(jnp.maximum(((a - c) * 0.5) ** 2 + b * b, 0.0))
    return tr2 - det


def _maxpool2d(x: jax.Array, r: int) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (2 * r + 1, 2 * r + 1), (1, 1), "SAME"
    )


@partial(jax.jit, static_argnames=("num_features", "nms_radius"))
def detect(
    img: jax.Array,
    detect_mask: jax.Array,
    num_features: int,
    nms_radius: int = 2,
    min_score: float = 1.0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Top-K corners: returns (uv (K,2) int32, uv_sub (K,2) f32 subpixel,
    score (K,), valid (K,))."""
    H, W = img.shape
    resp_raw = corner_response(img)
    # border: descriptor support must fit vertically (azimuth wraps)
    row = jnp.arange(H)[:, None]
    border_ok = (row >= _PATCH_Y) & (row < H - _PATCH_Y)
    resp = jnp.where(detect_mask & border_ok, resp_raw, -jnp.inf)
    keep = resp >= _maxpool2d(resp, nms_radius)  # NMS
    resp = jnp.where(keep, resp, -jnp.inf)
    score, flat_idx = jax.lax.top_k(resp.reshape(-1), num_features)
    uv = jnp.stack([flat_idx % W, flat_idx // W], axis=-1).astype(jnp.int32)
    valid = score > min_score
    uv_sub = _refine_subpixel(resp_raw, uv)
    return uv, uv_sub, score, valid


def _refine_subpixel(resp: jax.Array, uv: jax.Array) -> jax.Array:
    """Quadratic sub-pixel refinement of response peaks (2x2 Newton step on
    the local quadratic model); offsets clamped to half a pixel."""
    H, W = resp.shape
    u, v = uv[:, 0], uv[:, 1]

    def at(du, dv):
        return resp[jnp.clip(v + dv, 0, H - 1), (u + du) % W]

    c = at(0, 0)
    dx = (at(1, 0) - at(-1, 0)) * 0.5
    dy = (at(0, 1) - at(0, -1)) * 0.5
    dxx = at(1, 0) + at(-1, 0) - 2 * c
    dyy = at(0, 1) + at(0, -1) - 2 * c
    dxy = (at(1, 1) - at(1, -1) - at(-1, 1) + at(-1, -1)) * 0.25
    det = dxx * dyy - dxy * dxy
    safe = jnp.abs(det) > 1e-9
    det = jnp.where(safe, det, 1.0)
    ox = -(dyy * dx - dxy * dy) / det
    oy = -(dxx * dy - dxy * dx) / det
    ok = safe & (jnp.abs(ox) <= 0.5) & (jnp.abs(oy) <= 0.5)
    ox = jnp.where(ok, ox, 0.0)
    oy = jnp.where(ok, oy, 0.0)
    return jnp.stack([u + ox, v + oy], axis=-1)


def _bilinear(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample with azimuth wrap in x and clamp in y."""
    H, W = img.shape
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx, fy = x - x0, y - y0.astype(y.dtype)
    x0m, x1m = x0 % W, (x0 + 1) % W
    v00 = img[y0, x0m]
    v01 = img[y0, x1m]
    v10 = img[y0 + 1, x0m]
    v11 = img[y0 + 1, x1m]
    return (v00 * (1 - fx) + v01 * fx) * (1 - fy) + (v10 * (1 - fx) + v11 * fx) * fy


# dense orientation-moment maps: m10 = sum_patch I*dx, m01 = sum_patch I*dy
# over a RECTANGULAR (2*PY+1) x (2*PX+1) patch — separable pairs of banded
# matmuls (ops.conv2d).  The per-keypoint gather version costs millions of
# scattered reads.

_DX_ROW = np.arange(-_PATCH_X, _PATCH_X + 1, dtype=np.float32)
_DY_COL = np.arange(-_PATCH_Y, _PATCH_Y + 1, dtype=np.float32)
_ONES_ROW = np.ones(2 * _PATCH_X + 1, np.float32)
_ONES_COL = np.ones(2 * _PATCH_Y + 1, np.float32)


@jax.jit
def describe(img: jax.Array, uv: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Oriented BRIEF-256 for K keypoints: returns (desc (K,8) uint32,
    angle (K,)).

    Orientation moments are dense convolutions (one gather per keypoint);
    descriptor sampling rounds the rotated offsets to integer pixels on the
    blurred image (OpenCV ORB does the same) — one flat gather per sample
    instead of four bilinear reads.
    """
    H, W = img.shape
    blurred = _box_blur(img, 5)
    u = uv[:, 0].astype(jnp.float32)  # col
    v = uv[:, 1].astype(jnp.float32)  # row

    m10 = conv2d.sep_filter(blurred, _ONES_COL, _DX_ROW)
    m01 = conv2d.sep_filter(blurred, _DY_COL, _ONES_ROW)
    angle = jnp.arctan2(m01[uv[:, 1], uv[:, 0]], m10[uv[:, 1], uv[:, 0]])

    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (K,)
    px = _PATTERN[None, :, :, 0]  # (1, 256, 2)
    py = _PATTERN[None, :, :, 1]
    rx = ca[:, None, None] * px - sa[:, None, None] * py + u[:, None, None]
    ry = sa[:, None, None] * px + ca[:, None, None] * py + v[:, None, None]
    xi = jnp.round(rx).astype(jnp.int32) % W
    yi = jnp.clip(jnp.round(ry).astype(jnp.int32), 0, H - 1)
    flat = yi * W + xi                         # (K, 256, 2)
    samples = blurred.reshape(-1)[flat]
    bits = (samples[:, :, 0] < samples[:, :, 1]).astype(jnp.uint32)  # (K, 256)
    # bit i of word w is sample 32*w+i: a reshape + weighted sum, no scatter
    Kk = bits.shape[0]
    shifts = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    packed = jnp.sum(bits.reshape(Kk, 8, 32) * shifts[None, None, :],
                     axis=-1, dtype=jnp.uint32)
    return packed, angle


_PATTERN_INT = np.round(_make_pattern()).astype(np.int32)  # (256, 2, 2)


@jax.jit
def describe_dense(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Unrotated BRIEF-256 computed DENSELY: each bit plane is a shifted
    comparison of the blurred image (static rolls the compiler fuses — zero
    gathers), packed into 8 uint32 planes; keypoints then read their 8 words.

    Exact for every keypoint at least _PATCH_Y rows from the top/bottom
    border (rows don't wrap; the detector already enforces that margin) —
    columns wrap like the azimuth axis does.  Returns (K, 8) uint32.
    """
    H, W = img.shape
    blur = _box_blur(img, 5)
    words = []
    for w in range(8):
        acc = jnp.zeros((H, W), jnp.uint32)
        for j in range(32):
            p = w * 32 + j
            dx1, dy1 = int(_PATTERN_INT[p, 0, 0]), int(_PATTERN_INT[p, 0, 1])
            dx2, dy2 = int(_PATTERN_INT[p, 1, 0]), int(_PATTERN_INT[p, 1, 1])
            a = jnp.roll(blur, (-dy1, -dx1), (0, 1))
            b = jnp.roll(blur, (-dy2, -dx2), (0, 1))
            acc = acc | ((a < b).astype(jnp.uint32) << jnp.uint32(j))
        words.append(acc)
    dense = jnp.stack(words, axis=-1)            # (H, W, 8)
    return dense[uv[:, 1], uv[:, 0]]


def lift_subpixel(scan: ScanImage, uv_int: jax.Array, uv_sub: jax.Array):
    """3D lift at sub-pixel positions, guarded against depth discontinuities.

    Bilinear interpolation of the xyz image is only meaningful when all four
    neighboring pixels lie on the same surface; across an occlusion boundary
    it would invent phantom points.  Guard: the 4 neighbor ranges must agree
    with the center range within 2% + 5 cm, else fall back to the integer
    pixel's point (the reference's behavior, which always uses the integer
    lookup, `intensity_feature_tracker.cpp:1082`).
    """
    H, W = scan.range.shape
    x, y = uv_sub[:, 0], uv_sub[:, 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    r_c = scan.range[uv_int[:, 1], uv_int[:, 0]]

    def rng(dy, dx):
        return scan.range[y0 + dy, (x0 + dx) % W]

    tol = 0.02 * r_c + 0.05
    same_surf = (
        (jnp.abs(rng(0, 0) - r_c) < tol) & (jnp.abs(rng(0, 1) - r_c) < tol)
        & (jnp.abs(rng(1, 0) - r_c) < tol) & (jnp.abs(rng(1, 1) - r_c) < tol)
    )
    xyz_b = jax.vmap(lambda ch: _bilinear(scan.xyz[:, :, ch], x, y),
                     out_axes=1)(jnp.arange(3))
    xyz_i = scan.xyz[uv_int[:, 1], uv_int[:, 0]]
    return jnp.where(same_surf[:, None], xyz_b, xyz_i)


def depth_stable_mask(scan: ScanImage, rel: float = 0.1,
                      abs_m: float = 0.5) -> jax.Array:
    """(H, W) bool: pixels NOT on an occlusion/depth discontinuity.

    Features on silhouette boundaries (wall-top against sky or the far
    ground behind) are viewpoint-dependent: the lifted 3-D point rides the
    ray, not the world, so a pair of such features matched across frames
    implies ZERO sensor motion — the aperture problem.  On the OS0-64
    (+-45 deg) table inside a textureless span these silhouette stair-step
    corners dominated the detector's top-K and their self-matches pulled
    the odometry solve to identity (measured: 0.4 m/frame error with 40-80
    "good" matches while the true motion was 0.4 m/frame).  A crease edge
    (wall meets ground) has CONTINUOUS range across it and survives; an
    occlusion edge has a range jump and is excluded — the same
    occlusion-edge exclusion A-LOAM applies to its picks
    (`scanRegistration.cpp` neighbor-gap checks).

    Three composable criteria, each robust to iid beam DROPOUT (isolated
    invalid pixels are sensor noise, not geometry — requiring a fully
    valid support would leave 0.95^49 = 8 % of pixels detectable at 5 %
    dropout):

    1. `bad` = a VALID pixel whose largest range difference to a VALID
       4-neighbor exceeds `abs_m + rel * range` (a genuine depth
       discontinuity).  The exclusion is DILATED by the corner-response
       support radius (sobel 1 + 5x5 structure-tensor blur 2 = 3 px): a
       discontinuity 2-3 px away still feeds the blurred structure tensor
       (measured: wall-face pixels 2 rows under a sky edge scored 49 from
       the edge's smeared gradient).
    2. support health: the fraction of INVALID pixels inside the 7x7
       response support must stay under 15 % — sky/occlusion boundaries
       are large contiguous invalid regions (a wall-top silhouette fills
       >40 % of an adjacent support), while 5 % iid dropout exceeds 15 %
       of a 49-px window with probability < 1 %.
    3. the center pixel itself is valid.
    """
    r = scan.range
    v = scan.valid

    def roll_row(a, s):
        out = jnp.roll(a, s, axis=0)
        if s > 0:
            out = out.at[:s].set(a[:s])
        else:
            out = out.at[s:].set(a[s:])
        return out

    nb = [roll_row(r, 1), roll_row(r, -1),
          jnp.roll(r, 1, axis=1), jnp.roll(r, -1, axis=1)]
    nb_v = [roll_row(v, 1), roll_row(v, -1),
            jnp.roll(v, 1, axis=1), jnp.roll(v, -1, axis=1)]
    jump = jnp.max(jnp.stack([
        jnp.where(nv, jnp.abs(r - n), 0.0) for n, nv in zip(nb, nb_v)
    ]), axis=0)
    bad = v & (jump >= abs_m + rel * r)
    near_bad = _maxpool2d(jnp.where(bad, 1.0, 0.0), 3) > 0.5
    inv_frac = conv2d.box_filter(jnp.where(v, 0.0, 1.0), 7)
    return v & ~near_bad & (inv_frac < 0.15)


def extract(scan: ScanImage, detect_mask: jax.Array, cfg: FeatureConfig,
            num_features: int | None = None) -> Features:
    """Full per-frame front-end: detect + orient + describe + 3D lift."""
    K = num_features or cfg.num_features
    uv, uv_sub, score, valid = detect(
        scan.intensity, detect_mask & depth_stable_mask(scan), K,
        cfg.nms_radius)
    if cfg.oriented:
        desc, angle = describe(scan.intensity, uv)
    else:
        desc = describe_dense(scan.intensity, uv)
        angle = jnp.zeros(K, jnp.float32)
    xyz = lift_subpixel(scan, uv, uv_sub)
    # near-zero filter (`extractPointsAndFilterZeroValue`,
    # intensity_feature_tracker.cpp:1071-1099)
    xyz_valid = valid & scan.valid[uv[:, 1], uv[:, 0]]
    return Features(uv, score, angle, desc, valid, xyz, xyz_valid)


def hamming_matrix(da: jax.Array, db: jax.Array) -> jax.Array:
    """(Ka, 8) x (Kb, 8) uint32 -> (Ka, Kb) int32 Hamming distances."""
    x = jnp.bitwise_xor(da[:, None, :], db[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("max_hamming",))
def match(
    fa_desc: jax.Array, fa_valid: jax.Array,
    fb_desc: jax.Array, fb_valid: jax.Array,
    keep_frac: jax.Array | float,
    max_hamming: int = 64,
) -> Matches:
    """Mutual-NN Hamming matching with the reference's keep-top-fraction rule.

    Mirrors BFMatcher(NORM_HAMMING, crossCheck=true) + sort + top 30%/20%
    (`intensity_feature_tracker.cpp:631-646,684-689`).  keep_frac may be a
    traced scalar so the retry path can reuse the compiled program.
    """
    BIG = jnp.int32(1 << 20)
    d = hamming_matrix(fa_desc, fb_desc)
    ok = fa_valid[:, None] & fb_valid[None, :]
    d = jnp.where(ok, d, BIG)
    best_b = jnp.argmin(d, axis=1)            # for each a: best b
    best_a = jnp.argmin(d, axis=0)            # for each b: best a
    Ka = fa_desc.shape[0]
    ia = jnp.arange(Ka)
    mutual = best_a[best_b] == ia
    dist = d[ia, best_b]
    cand = mutual & (dist < max_hamming)
    num_mutual = jnp.sum(cand)

    # sort-and-keep-top-fraction as a rank mask (static shapes)
    sort_key = jnp.where(cand, dist, BIG)
    order = jnp.argsort(sort_key)
    rank = jnp.zeros(Ka, jnp.int32).at[order].set(jnp.arange(Ka, dtype=jnp.int32))
    keep_n = jnp.ceil(num_mutual.astype(jnp.float32) * keep_frac).astype(jnp.int32)
    good = cand & (rank < keep_n)
    return Matches(
        src_idx=ia.astype(jnp.int32),
        dst_idx=best_b.astype(jnp.int32),
        dist=dist.astype(jnp.float32),
        valid=good,
        num_mutual=num_mutual.astype(jnp.int32),
        num_good=jnp.sum(good).astype(jnp.int32),
    )


@partial(jax.jit, static_argnames=("max_hamming",))
def match_retry(
    fa_desc: jax.Array, fa_valid: jax.Array,
    fb_desc: jax.Array, fb_valid: jax.Array,
    keep_frac: float,
    keep_frac_retry: jax.Array | float,
    min_good: int,
    max_hamming: int = 64,
) -> Matches:
    """`match` + the reference's failure re-detect contract in ONE matrix pass.

    The reference re-detects both frames with 2x features and keeps the top
    20% of matches when the first pass yields < 4 good matches
    (`intensity_feature_tracker.cpp:652-692`).  Here detection is already
    full-budget top-K, so the retry reduces to a looser keep fraction
    (`keep_frac_retry`, pre-scaled by the detect multiplier) — and since only
    the rank cut depends on the fraction, the K x K Hamming matrix, mutual-NN
    and ranking are computed once and the cut is selected branchlessly.
    """
    BIG = jnp.int32(1 << 20)
    d = hamming_matrix(fa_desc, fb_desc)
    ok = fa_valid[:, None] & fb_valid[None, :]
    d = jnp.where(ok, d, BIG)
    best_b = jnp.argmin(d, axis=1)
    best_a = jnp.argmin(d, axis=0)
    Ka = fa_desc.shape[0]
    ia = jnp.arange(Ka)
    mutual = best_a[best_b] == ia
    dist = d[ia, best_b]
    cand = mutual & (dist < max_hamming)
    num_mutual = jnp.sum(cand)

    sort_key = jnp.where(cand, dist, BIG)
    order = jnp.argsort(sort_key)
    rank = jnp.zeros(Ka, jnp.int32).at[order].set(jnp.arange(Ka, dtype=jnp.int32))
    nm = num_mutual.astype(jnp.float32)
    keep_n1 = jnp.ceil(nm * keep_frac).astype(jnp.int32)
    num_good1 = jnp.sum(cand & (rank < keep_n1))
    first_bad = num_good1 < min_good
    keep_n = jnp.where(
        first_bad, jnp.ceil(nm * keep_frac_retry).astype(jnp.int32), keep_n1
    )
    good = cand & (rank < keep_n)
    return Matches(
        src_idx=ia.astype(jnp.int32),
        dst_idx=best_b.astype(jnp.int32),
        dist=dist.astype(jnp.float32),
        valid=good,
        num_mutual=num_mutual.astype(jnp.int32),
        num_good=jnp.sum(good).astype(jnp.int32),
    )


def matched_points(fa: Features, fb: Features, m: Matches):
    """Gather matched 3D correspondences: (src (K,3), dst (K,3), w (K,)).

    Weight is zero unless both endpoints have valid 3D lifts — the TPU
    analogue of the reference's zero-point filtering before the Ceres solve.
    """
    src = fa.xyz[m.src_idx]
    dst = fb.xyz[m.dst_idx]
    w = (m.valid & fa.xyz_valid[m.src_idx] & fb.xyz_valid[m.dst_idx]).astype(jnp.float32)
    return src, dst, w
