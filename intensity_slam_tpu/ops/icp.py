"""Batched fixed-iteration ICP — loop-closure verification (reference C10).

Replicates the PCL ICP use in `loopClosureThread`
(`src/intensity_feature_tracker.cpp:216-316`): max correspondence distance
100, up to 100 iterations, transformation/fitness epsilons, and the fitness
score = mean squared distance of accepted correspondences
(`getFitnessScore`), gated at `icp_fitness_score` 0.5 (`spot.yaml:34`).

TPU design: clouds are fixed-capacity masked buffers (keyframe clouds are
<=2k points after voxel downsampling), so each ICP iteration is one dense
(P_src x P_tgt) distance matrix -> masked argmin -> one Umeyama-style
closed-form rigid update (weighted SVD).  A fixed iteration count keeps the
whole align inside `lax.scan`; convergence shows up as the update going to
identity, exactly like PCL's transformation-epsilon exit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import se3
from ..utils.se3 import Pose
from . import pallas_nn


class ICPResult(NamedTuple):
    pose: Pose          # T such that T(src) aligns to tgt
    fitness: jax.Array  # () mean squared distance of inlier correspondences
    # (within fitness_radius).  PCL's getFitnessScore averages over ALL
    # source points, which is only meaningful for dense full clouds; our
    # keyframe clouds are capacity-subsampled, so points in regions the
    # target subsample missed would dominate the mean.  The inlier mean +
    # the coverage fraction below carry the same accept/reject information.
    inlier_frac: jax.Array  # () fraction of source points within radius
    num_corr: jax.Array # () int32 accepted correspondences at exit
    converged: jax.Array  # () bool — last update below epsilon
    nn_idx: jax.Array   # (P,) int32 final NN index into tgt per src point
    inlier: jax.Array   # (P,) bool — src point within fitness_radius of NN


def _nn(src_w: jax.Array, src_mask, tgt: jax.Array, tgt_mask):
    # fused Pallas kernel: tiled distances + running argmin in VMEM — the
    # (P, M) matrix never materializes (ops/pallas_nn.py)
    j, dj = pallas_nn.nearest_neighbor(src_w, tgt, tgt_mask)
    dj = jnp.where(src_mask & (dj < 1e29), dj, jnp.inf)
    return j, dj


def _umeyama_step(src: jax.Array, tgt: jax.Array, w: jax.Array) -> Pose:
    """Weighted closed-form rigid alignment (Horn/Umeyama, no scale)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_t = jnp.sum(tgt * w[:, None], axis=0) / wsum
    cov = jnp.einsum("ni,nj,n->ij", tgt - mu_t, src - mu_s, w) / wsum
    U, _, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(jnp.sign(det))
    R = U @ D @ Vt
    t = mu_t - R @ mu_s
    return Pose(se3.mat_to_quat(R), t)


def icp_align(
    src: jax.Array, src_mask: jax.Array,
    tgt: jax.Array, tgt_mask: jax.Array,
    init: Pose,
    iters: int = 32,
    max_corr_dist: float = 100.0,
    fitness_radius: float = 1.0,
    eps: float = 1e-6,
) -> ICPResult:
    """Align src to tgt starting from `init`; fixed `iters` iterations."""
    max_sq = max_corr_dist * max_corr_dist

    def step(carry, _):
        pose, _ = carry
        src_w = se3.transform_points(pose, src)
        j, dj = _nn(src_w, src_mask, tgt, tgt_mask)
        acc = jnp.isfinite(dj) & (dj <= max_sq)
        # trimming: partial overlap leaves source points with no true
        # counterpart whose forced NNs bias the update — reject
        # correspondences beyond 9x the median accepted squared distance
        med = jnp.nanmedian(jnp.where(acc, dj, jnp.nan))
        trim = jnp.maximum(9.0 * med, 1e-6)
        w = (acc & (dj <= trim)).astype(jnp.float32)
        upd = _umeyama_step(src_w, tgt[j], w)
        # guard: with no correspondences keep the pose
        has = jnp.sum(w) >= 3
        new_pose = se3.compose(upd, pose)
        pose = jax.tree.map(
            lambda n, o: jnp.where(has, n, o), new_pose, pose
        )
        step_norm = jnp.linalg.norm(se3.se3_log(upd))
        return (pose, step_norm), None

    (pose, last_step), _ = jax.lax.scan(
        step, (init, jnp.asarray(jnp.inf)), None, length=iters
    )
    src_w = se3.transform_points(pose, src)
    j, dj = _nn(src_w, src_mask, tgt, tgt_mask)
    n_src = jnp.maximum(jnp.sum(src_mask), 1)
    inl = jnp.isfinite(dj) & (dj <= fitness_radius * fitness_radius)
    n_inl = jnp.sum(inl)
    fitness = jnp.where(
        n_inl > 0,
        jnp.sum(jnp.where(inl, dj, 0.0)) / jnp.maximum(n_inl, 1),
        jnp.inf,
    )
    return ICPResult(
        pose=pose,
        fitness=fitness,
        inlier_frac=n_inl / n_src,
        num_corr=n_inl.astype(jnp.int32),
        converged=last_step < eps * 10 + 1e-4,
        nn_idx=j.astype(jnp.int32),
        inlier=inl,
    )


def intensity_correlation(
    src_int: jax.Array,   # (P,) per-point intensity of the source cloud
    tgt_int: jax.Array,   # (M,) target cloud intensities
    res: ICPResult,
) -> jax.Array:
    """Pearson correlation of intensities over the converged ICP's inlier
    correspondences — the appearance half of loop verification (r5).

    A WRONG loop between self-similar places aligns geometrically (the
    fitness gate passes: local structure really does match) but pairs
    surface points from DIFFERENT physical places, so their intensity
    textures are uncorrelated; a true revisit pairs the same surfaces and
    correlates strongly even under speckle noise.  This is the
    intensity-as-signature thesis of the reference paper (arXiv:2301.09257)
    applied to loop VERIFICATION rather than odometry.

    NEUTRAL (returns 1.0) when the gate has no information to act on:
    fewer than 8 inlier pairs (the coverage gates own that case) or
    near-zero intensity variance on either side (clouds stored without
    intensity, or a genuinely texture-free scene) — absence of appearance
    evidence must not veto geometric evidence."""
    w = res.inlier.astype(jnp.float32)
    n = jnp.sum(w)
    a = src_int
    b = tgt_int[res.nn_idx]
    ma = jnp.sum(a * w) / jnp.maximum(n, 1.0)
    mb = jnp.sum(b * w) / jnp.maximum(n, 1.0)
    va = jnp.sum(w * (a - ma) ** 2)
    vb = jnp.sum(w * (b - mb) ** 2)
    cov = jnp.sum(w * (a - ma) * (b - mb))
    corr = cov / jnp.maximum(jnp.sqrt(va * vb), 1e-6)
    # informative = both sides vary by more than ~1 intensity unit RMS
    informative = (va > n) & (vb > n) & (n >= 8)
    return jnp.where(informative, corr, 1.0)
