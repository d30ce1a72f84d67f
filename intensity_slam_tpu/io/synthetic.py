"""Synthetic LiDAR world: raycast organized scans with intensity textures.

The reference is validated only against the `spot_corridor.bag` recording
(`README.md:91-100`); it ships no data generator and no tests (SURVEY §4).
This module is the bag replacement: a differentiable-free, jittable raycaster
that renders organized (H, W) Ouster-style scans (ranges + textured intensity)
of a simple world (ground plane + axis-aligned boxes) from arbitrary sensor
poses.  Ground-truth poses make ATE assertions exact.

The default world is a corridor with textured walls — the same regime the
spot_corridor sequence exercises (indoor, strong intensity texture, planar
ground).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SensorConfig
from ..utils import se3


class World(NamedTuple):
    # axis-aligned boxes: centers (B, 3), half-extents (B, 3)
    box_centers: jax.Array
    box_halves: jax.Array
    ground_z: float = 0.0
    # textureless zones (axis-aligned): world regions whose hits render at
    # CONSTANT intensity — degenerate for the intensity front-end, forcing
    # the geometric fallback (the skip chain, SURVEY §5 failure detection).
    # Zero-size arrays = no zones.
    flat_centers: jax.Array = jnp.zeros((0, 3), jnp.float32)
    flat_halves: jax.Array = jnp.zeros((0, 3), jnp.float32)
    # DYNAMIC boxes (moving objects): centers at t=0, half-extents, and
    # constant world-frame velocities.  Rendered at center + v * time, so a
    # walking person / cart sweeps through consecutive scans — geometry the
    # static-world assumption of every SLAM stage must shrug off.
    dyn_centers: jax.Array = jnp.zeros((0, 3), jnp.float32)
    dyn_halves: jax.Array = jnp.zeros((0, 3), jnp.float32)
    dyn_vel: jax.Array = jnp.zeros((0, 3), jnp.float32)
    # intensity texture tiling period along x (0 = aperiodic).  A periodic
    # texture makes physically DIFFERENT places look identical to
    # appearance-based loop detectors — the aliasing stress the reference's
    # BoW threshold (`spot.yaml:38`) exists to survive.
    texture_period: float = 0.0


class SensorNoise(NamedTuple):
    """Stochastic sensor model (the gap between raycasts and a real Ouster
    recording, `README.md:152-169`): per-beam range noise, multiplicative
    intensity speckle, and random beam dropout.  All applied per frame from
    a PRNG key; zero-valued fields disable a term."""

    range_sigma: float = 0.03         # m, 1-sigma radial noise (OS0 ~2-5 cm)
    intensity_speckle: float = 0.10   # lognormal sd of the return-strength
    # multiplier (surface micro-structure + photon noise)
    dropout_rate: float = 0.02        # per-beam probability of no return


DEFAULT_NOISE = SensorNoise()


def corridor_world() -> World:
    """A 40 m corridor along +x, 4 m wide, with wall pillars for texture
    parallax and a few boxes as obstacles."""
    walls = [
        # left / right walls (thin boxes); bottom exactly at ground z=0
        ([20.0, 2.2, 1.6], [22.0, 0.2, 1.6]),
        ([20.0, -2.2, 1.6], [22.0, 0.2, 1.6]),
        # end wall
        ([42.5, 0.0, 1.6], [0.5, 3.0, 1.6]),
        # back wall behind start
        ([-3.5, 0.0, 1.6], [0.5, 3.0, 1.6]),
    ]
    boxes = [
        ([8.0, 1.2, 0.4], [0.4, 0.4, 0.4]),
        ([15.0, -1.0, 0.6], [0.5, 0.3, 0.6]),
        ([24.0, 0.8, 0.5], [0.3, 0.5, 0.5]),
        ([31.0, -1.3, 0.4], [0.4, 0.4, 0.4]),
    ]
    all_b = walls + boxes
    return World(
        jnp.array([b[0] for b in all_b], jnp.float32),
        jnp.array([b[1] for b in all_b], jnp.float32),
        ground_z=0.0,
    )


def _ray_dirs(cfg: SensorConfig) -> jax.Array:
    """(H, W, 3) unit ray directions in sensor frame; row 0 = top ring,
    column azimuth spans [-pi, pi) matching an Ouster organized cloud.
    Vertical extent comes from cfg.fov_up/fov_down (OS0-64-exact = +-45,
    `config.os0_64_config`)."""
    H, W = cfg.image_height, cfg.image_width
    elev = jnp.deg2rad(jnp.linspace(cfg.fov_up, cfg.fov_down, H))
    azim = jnp.linspace(-jnp.pi, jnp.pi, W, endpoint=False)
    ce, se_ = jnp.cos(elev)[:, None], jnp.sin(elev)[:, None]
    ca, sa = jnp.cos(azim)[None, :], jnp.sin(azim)[None, :]
    return jnp.stack(
        [ce * ca, ce * sa, jnp.broadcast_to(se_, (H, W))], axis=-1
    )


def _hash_noise(cell: jax.Array) -> jax.Array:
    """Deterministic value noise per integer cell (..., 3) -> [0, 1).
    Makes every world cell visually distinct so descriptors don't alias —
    a repeating checkerboard would make mutual-NN matching degenerate in a
    way real LiDAR intensity never is."""
    h = jnp.sin(
        cell[..., 0] * 12.9898 + cell[..., 1] * 78.233 + cell[..., 2] * 45.164
    ) * 43758.5453
    return h - jnp.floor(h)


def _intensity_texture(p: jax.Array, normal_id: jax.Array) -> jax.Array:
    """Procedural intensity at world hit points (N..., 3): unique-per-cell
    value noise (two scales) + mild sinusoids, so corner detectors find
    dense, globally distinctive structure."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    cell_f = jnp.floor(p * 4.0)         # 0.25 m cells
    cell_c = jnp.floor(p * 1.0)         # 1 m cells
    n_f = _hash_noise(cell_f)
    n_c = _hash_noise(cell_c)
    waves = jnp.sin(x * 7.3) * jnp.sin(y * 9.1 + 1.7)
    base = 40.0 + 120.0 * n_f + 60.0 * n_c + 20.0 * waves
    # different surfaces get different albedo so edges are visible
    albedo = 1.0 + 0.15 * (normal_id.astype(jnp.float32) % 3.0)
    return jnp.clip(base * albedo, 1.0, 255.0)


def render_scan(pose: se3.Pose, world: World, cfg: SensorConfig,
                max_range: float = 120.0,
                delta: se3.Pose | None = None,
                frame_time: jax.Array | float = 0.0,
                noise: SensorNoise | None = None,
                key: jax.Array | None = None,
                return_world: bool = False
                ) -> tuple[jax.Array, ...]:
    """Render one organized scan from `pose` (sensor->world at SCAN START).

    Returns (xyz_sensor (H*W, 3), intensity (H*W,)) — points in the SENSOR
    frame, row-major, exactly the layout `project_organized` expects.
    Points with no hit (or beyond max_range) are zeroed (range 0), matching
    the reference's invalid-point convention.

    Realism extensions (all optional, default = the ideal raycaster):
    - `delta`: the sensor's motion over ONE scan period (scan-start ->
      scan-end, sensor frame).  Column c fires at intra-scan fraction
      c/W, so its rays originate from pose o delta^(c/W) — but the
      returned point is still r * dir in the COLUMN'S OWN sensor frame
      (a real driver assembles packets without motion compensation).
      This produces the true rolling-shutter distortion the
      `sensor.undistort` path (`laserOdometry.cpp:147-194` model) corrects.
    - `frame_time` + `world.dyn_*`: dynamic boxes rendered at
      center + v * frame_time.
    - `noise` + `key`: per-beam range noise, intensity speckle, dropout
      (SensorNoise).
    """
    H, W = cfg.image_height, cfg.image_width
    dirs_s = _ray_dirs(cfg)                                  # (H, W, 3)
    if delta is not None:
        # per-column firing pose: pose o delta^(c/W)
        alpha = (jnp.arange(W, dtype=jnp.float32) / W)[:, None]
        ident = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
        q_c = se3.quat_normalize(
            se3.quat_mul(pose.q[None, :], se3.slerp(ident, delta.q, alpha)))
        t_c = pose.t[None, :] + se3.quat_rotate(
            pose.q[None, :], alpha * delta.t[None, :])       # (W, 3)
        R_c = se3.quat_to_mat(q_c)                           # (W, 3, 3)
        dirs_w = jnp.einsum("wij,hwj->hwi", R_c, dirs_s)
        origin = jnp.broadcast_to(t_c[None, :, :], (H, W, 3))
    else:
        R = se3.quat_to_mat(pose.q)
        dirs_w = jnp.einsum("ij,hwj->hwi", R, dirs_s)
        origin = jnp.broadcast_to(pose.t[None, None, :], (H, W, 3))

    big = jnp.float32(1e9)

    # ground plane z = ground_z
    dz = dirs_w[..., 2]
    t_g = (world.ground_z - origin[..., 2]) / jnp.where(
        jnp.abs(dz) < 1e-6, 1e-6, dz)
    t_ground = jnp.where((t_g > 0.05) & (dz < 0), t_g, big)

    # axis-aligned boxes, slab method, vectorized over boxes (static +
    # time-advected dynamic)
    centers = world.box_centers
    halves = world.box_halves
    n_dyn = world.dyn_centers.shape[0]
    if n_dyn > 0:
        t_now = jnp.asarray(frame_time, jnp.float32)
        centers = jnp.concatenate(
            [centers, world.dyn_centers + world.dyn_vel * t_now])
        halves = jnp.concatenate([halves, world.dyn_halves])
    o = origin[:, :, None, :]                                # (H,W,1,3)
    d = dirs_w[:, :, None, :]                                # (H, W, 1, 3)
    c = centers[None, None, :, :]
    h = halves[None, None, :, :]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-6, 1e-6, d)
    t1 = (c - h - o) * inv
    t2 = (c + h - o) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)             # (H, W, B)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= tmin) & (tmax > 0.05) & (tmin > 0.05)
    t_box = jnp.where(hit, tmin, big)
    t_box_best = jnp.min(t_box, axis=-1)                     # (H, W)
    box_id = jnp.argmin(t_box, axis=-1)

    t_best = jnp.minimum(t_ground, t_box_best)
    surf_id = jnp.where(t_box_best < t_ground, box_id + 1, 0)
    valid = t_best < jnp.minimum(max_range, big * 0.5)

    p_world = origin + t_best[..., None] * dirs_w
    p_tex = p_world
    if world.texture_period > 0:
        p_tex = p_world.at[..., 0].set(
            jnp.mod(p_world[..., 0], world.texture_period))
    inten = _intensity_texture(p_tex, surf_id)
    # textureless zones: constant return inside any flat box
    if world.flat_centers.shape[0] > 0:
        rel = jnp.abs(p_world[:, :, None, :] - world.flat_centers[None, None])
        in_zone = jnp.any(
            jnp.all(rel <= world.flat_halves[None, None], axis=-1), axis=-1
        )
        inten = jnp.where(in_zone, 100.0, inten)
    # dynamic surfaces get a constant-ish albedo of their own (retro vest /
    # clothing): distinct from walls but not a feature-rich texture
    if n_dyn > 0:
        is_dyn = surf_id > world.box_centers.shape[0]
        inten = jnp.where(is_dyn, 140.0, inten)

    if noise is not None and key is not None:
        k_r, k_s, k_d = jax.random.split(key, 3)
        if noise.range_sigma > 0:
            t_best = t_best + noise.range_sigma * jax.random.normal(
                k_r, t_best.shape)
        if noise.intensity_speckle > 0:
            inten = inten * jnp.exp(
                noise.intensity_speckle
                * jax.random.normal(k_s, inten.shape))
        if noise.dropout_rate > 0:
            valid = valid & (jax.random.uniform(k_d, valid.shape)
                             >= noise.dropout_rate)

    xyz_sensor = t_best[..., None] * dirs_s
    xyz_sensor = jnp.where(valid[..., None], xyz_sensor, 0.0)
    inten = jnp.where(valid, jnp.clip(inten, 1.0, 255.0), 0.0)
    if return_world:
        # the TRUE (noise-free-ray) world hit points — ground truth for
        # testing the undistortion model against the renderer's per-column
        # firing poses
        pw = jnp.where(valid[..., None], p_world, 0.0)
        return (xyz_sensor.reshape(-1, 3), inten.reshape(-1),
                pw.reshape(-1, 3))
    return xyz_sensor.reshape(-1, 3), inten.reshape(-1)


def corridor_trajectory(num_frames: int, speed: float = 0.3,
                        yaw_rate: float = 0.0,
                        height: float = 0.8) -> se3.Pose:
    """Ground-truth poses (num_frames batch): forward motion along +x with
    optional constant yaw rate; sensor at `height` above ground."""
    i = jnp.arange(num_frames, dtype=jnp.float32)
    yaw = yaw_rate * i
    # integrate position under piecewise-constant heading
    step_yaw = yaw_rate * jnp.arange(num_frames, dtype=jnp.float32)
    dx = speed * jnp.cos(step_yaw)
    dy = speed * jnp.sin(step_yaw)
    x = jnp.concatenate([jnp.zeros(1), jnp.cumsum(dx)[:-1]])
    y = jnp.concatenate([jnp.zeros(1), jnp.cumsum(dy)[:-1]])
    q = se3.so3_exp(jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw], -1))
    t = jnp.stack([x, y, jnp.full_like(x, height)], -1)
    return se3.Pose(q, t)


def circuit_world(textureless: bool = True, dynamic: bool = False) -> World:
    """The hard-benchmark world (spot_corridor-class, VERDICT r2 item 2): a
    rectangular corridor CIRCUIT around a 32 x 22 m inner block — ~140 m per
    lap — with pillar/box clutter in the corridor, two larger "rooms"
    (alcoves) at opposite corners, and (optionally) a 12 m TEXTURELESS span
    on the far leg where intensity odometry must hand over to the geometric
    fallback.  Revisiting the start closes the loop."""
    wall_h = 1.6
    walls = [
        # outer boundary: x in [-4, 44], y in [-4, 34]
        ([20.0, -4.2, wall_h], [25.0, 0.2, wall_h]),   # south
        ([20.0, 34.2, wall_h], [25.0, 0.2, wall_h]),   # north
        ([-4.2, 15.0, wall_h], [0.2, 20.0, wall_h]),   # west
        ([44.2, 15.0, wall_h], [0.2, 20.0, wall_h]),   # east
        # inner block: [4, 36] x [4, 26] (its faces are the inner walls)
        ([20.0, 15.0, wall_h], [16.0, 11.0, wall_h]),
        # room alcove walls (recesses built from the outer wall): a room off
        # the south leg near the start and one off the north leg
        ([8.0, -7.0, wall_h], [4.0, 0.2, wall_h]),     # room 1 far wall
        ([3.8, -5.5, wall_h], [0.2, 1.5, wall_h]),     # room 1 side
        ([12.2, -5.5, wall_h], [0.2, 1.5, wall_h]),    # room 1 side
        ([30.0, 37.0, wall_h], [4.0, 0.2, wall_h]),    # room 2 far wall
        ([25.8, 35.5, wall_h], [0.2, 1.5, wall_h]),
        ([34.2, 35.5, wall_h], [0.2, 1.5, wall_h]),
    ]
    boxes = [
        ([9.0, 1.5, 0.4], [0.4, 0.4, 0.4]),
        ([18.0, -1.8, 0.6], [0.5, 0.3, 0.6]),
        ([28.0, 1.2, 0.5], [0.3, 0.5, 0.5]),
        ([41.5, 8.0, 0.4], [0.4, 0.4, 0.4]),
        ([38.5, 18.0, 0.5], [0.4, 0.3, 0.5]),
        ([33.0, 28.6, 0.5], [0.4, 0.4, 0.5]),
        ([10.0, 31.5, 0.6], [0.3, 0.4, 0.6]),
        # clutter INSIDE the textureless span: constant intensity but real
        # geometric corners, so the A-LOAM fallback can observe forward
        # motion through the degenerate stretch (a bare straight corridor
        # is unobservable along its axis for scan matching of any kind)
        ([16.0, 29.5, 0.5], [0.4, 0.4, 0.5]),
        ([20.5, 33.2, 0.6], [0.3, 0.4, 0.6]),
        ([24.0, 30.2, 0.5], [0.4, 0.3, 0.5]),
        ([1.5, 22.0, 0.4], [0.4, 0.4, 0.4]),
        ([-1.5, 10.0, 0.5], [0.3, 0.3, 0.5]),
        ([6.0, -5.8, 0.4], [0.3, 0.3, 0.4]),           # room 1 furniture
        ([31.5, 35.8, 0.4], [0.3, 0.3, 0.4]),          # room 2 furniture
    ]
    all_b = walls + boxes
    flat = (
        [([20.0, 30.0, wall_h], [6.0, 5.0, wall_h + 0.5])]  # north-leg span
        if textureless else []
    )
    # a walking "person" pacing the south corridor and a cart drifting down
    # the east leg — moving geometry every lap passes twice
    dyn = (
        [([30.0, 0.3, 0.85], [0.25, 0.25, 0.85], [-0.5, 0.0, 0.0]),
         ([40.2, 12.0, 0.6], [0.3, 0.4, 0.6], [0.0, 0.35, 0.0])]
        if dynamic else []
    )
    return World(
        jnp.array([b[0] for b in all_b], jnp.float32),
        jnp.array([b[1] for b in all_b], jnp.float32),
        ground_z=0.0,
        flat_centers=jnp.array([f[0] for f in flat], jnp.float32).reshape(-1, 3),
        flat_halves=jnp.array([f[1] for f in flat], jnp.float32).reshape(-1, 3),
        dyn_centers=jnp.array([d[0] for d in dyn], jnp.float32).reshape(-1, 3),
        dyn_halves=jnp.array([d[1] for d in dyn], jnp.float32).reshape(-1, 3),
        dyn_vel=jnp.array([d[2] for d in dyn], jnp.float32).reshape(-1, 3),
    )


def circuit_trajectory(num_frames: int, speed: float = 0.4,
                       height: float = 0.8, turn_frames: int = 10) -> se3.Pose:
    """Ground-truth circuit path: counter-clockwise laps of the corridor
    rectangle (0,0) -> (40,0) -> (40,30) -> (0,30) -> (0,0) with smooth
    quarter-turns; repeats until num_frames.  ~140 m per lap."""
    import numpy as np

    legs = [40.0, 30.0, 40.0, 30.0]
    qs, ts = [], []
    pose = se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([0.0, 0.0, height]))
    leg = 0
    dist_in_leg = 0.0
    fwd = se3.Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([speed, 0.0, 0.0]))
    while len(qs) < num_frames:
        qs.append(pose.q)
        ts.append(pose.t)
        if dist_in_leg + speed >= legs[leg % 4] and leg >= 0:
            # quarter turn over turn_frames while creeping forward
            dyaw = (np.pi / 2) / turn_frames
            for _ in range(turn_frames):
                if len(qs) >= num_frames:
                    break
                step = se3.Pose(se3.so3_exp(jnp.array([0.0, 0.0, dyaw])),
                                jnp.array([speed * 0.4, 0.0, 0.0]))
                pose = se3.compose(pose, step)
                qs.append(pose.q)
                ts.append(pose.t)
            leg += 1
            dist_in_leg = 0.0
        else:
            pose = se3.compose(pose, fwd)
            dist_in_leg += speed
    return se3.Pose(jnp.stack(qs[:num_frames]), jnp.stack(ts[:num_frames]))


def polyline_trajectory(waypoints, num_frames: int, speed: float = 0.4,
                        height: float = 0.8, yaw_smooth: int = 8) -> se3.Pose:
    """Ground-truth path along a closed 2-D polyline at `speed` m/frame,
    heading along the direction of motion (yaw smoothed over `yaw_smooth`
    frames so corners are sharp-but-trackable turns, not instant flips).
    Wraps around the waypoint list until `num_frames`."""
    import numpy as np

    wps = np.asarray(waypoints, np.float64)
    n = len(wps)
    pos, yaw = [], []
    seg, s = 0, 0.0
    while len(pos) < num_frames:
        a, b = wps[seg % n], wps[(seg + 1) % n]
        L = float(np.linalg.norm(b - a))
        if s >= L:
            s -= L
            seg += 1
            continue
        d = (b - a) / L
        pos.append(a + s * d)
        yaw.append(np.arctan2(d[1], d[0]))
        s += speed
    pos = np.asarray(pos)
    yaw = np.unwrap(np.asarray(yaw))
    if yaw_smooth > 1:
        k = np.ones(yaw_smooth) / yaw_smooth
        pad = yaw_smooth // 2
        yaw = np.convolve(np.pad(yaw, (pad, yaw_smooth - 1 - pad),
                                 mode="edge"), k, mode="valid")
    half = 0.5 * yaw
    q = np.stack([np.cos(half), np.zeros_like(half), np.zeros_like(half),
                  np.sin(half)], axis=-1)
    t = np.concatenate([pos, np.full((len(pos), 1), height)], axis=-1)
    return se3.Pose(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32))


def figure_eight_world() -> World:
    """Theta/figure-eight building: an outer rectangle with TWO inner
    blocks and a shared middle corridor (y ~ 11) that the figure-eight
    path traverses twice per cycle — early AND frequent revisits, the
    regime where loop cooldown, the plausibility pre-gate, and repeated
    PGO solves interact (VERDICT r3 weak #4)."""
    wall_h = 1.6
    walls = [
        ([20.0, -4.2, wall_h], [25.0, 0.2, wall_h]),   # outer south
        ([20.0, 26.2, wall_h], [25.0, 0.2, wall_h]),   # outer north
        ([-4.2, 11.0, wall_h], [0.2, 15.4, wall_h]),   # outer west
        ([44.2, 11.0, wall_h], [0.2, 15.4, wall_h]),   # outer east
        ([20.0, 6.0, wall_h], [16.0, 2.0, wall_h]),    # south inner block
        ([20.0, 16.0, wall_h], [16.0, 2.0, wall_h]),   # north inner block
    ]
    boxes = [
        ([8.0, 1.4, 0.4], [0.4, 0.4, 0.4]),
        ([22.0, -1.6, 0.5], [0.4, 0.3, 0.5]),
        ([34.0, 1.2, 0.5], [0.3, 0.4, 0.5]),
        ([41.6, 5.5, 0.4], [0.4, 0.4, 0.4]),
        ([12.0, 10.2, 0.5], [0.3, 0.3, 0.5]),          # middle corridor
        ([27.0, 12.0, 0.4], [0.4, 0.3, 0.4]),
        ([2.0, 17.5, 0.5], [0.3, 0.4, 0.5]),
        ([15.0, 24.4, 0.4], [0.4, 0.4, 0.4]),
        ([31.0, 20.8, 0.5], [0.3, 0.3, 0.5]),
        ([38.0, 24.0, 0.4], [0.4, 0.3, 0.4]),
    ]
    all_b = walls + boxes
    return World(
        jnp.array([b[0] for b in all_b], jnp.float32),
        jnp.array([b[1] for b in all_b], jnp.float32),
        ground_z=0.0,
    )


def figure_eight_trajectory(num_frames: int, speed: float = 0.4) -> se3.Pose:
    """Figure-eight over figure_eight_world: south loop then north loop,
    both sharing the westbound middle-corridor leg (y = 11) — the first
    revisit begins after only ~100 m and the shared leg repeats every
    cycle (~200 m)."""
    wps = [(0.0, 0.0), (40.0, 0.0), (40.0, 11.0), (0.0, 11.0),
           (0.0, 22.0), (40.0, 22.0), (40.0, 11.0), (0.0, 11.0)]
    return polyline_trajectory(wps, num_frames, speed)


def aliased_corridor_world(period: float = 10.0) -> World:
    """A long corridor whose geometry AND intensity texture repeat every
    `period` meters: every section looks like every other section to an
    appearance-based detector.  Out-and-back traversal
    (`aliased_corridor_trajectory`) makes every return frame a genuine
    revisit — while the aliasing offers a same-looking WRONG candidate
    `period` meters away.  Precision here is what the drift-envelope
    plausibility pre-gate + ICP chi2 gate must defend."""
    wall_h = 1.6
    L = 80.0
    walls = [
        ([L / 2, 2.2, wall_h], [L / 2 + 4.0, 0.2, wall_h]),
        ([L / 2, -2.2, wall_h], [L / 2 + 4.0, 0.2, wall_h]),
        ([L + 3.5, 0.0, wall_h], [0.5, 3.0, wall_h]),
        ([-3.5, 0.0, wall_h], [0.5, 3.0, wall_h]),
    ]
    boxes = []
    x0 = 5.0
    while x0 < L - 1.0:
        # IDENTICAL furniture per period: a pillar pair + an off-center box
        boxes.append(([x0, 1.5, 0.6], [0.25, 0.25, 0.6]))
        boxes.append(([x0, -1.5, 0.6], [0.25, 0.25, 0.6]))
        boxes.append(([x0 + 4.0, -0.9, 0.4], [0.35, 0.35, 0.4]))
        x0 += period
    all_b = walls + boxes
    return World(
        jnp.array([b[0] for b in all_b], jnp.float32),
        jnp.array([b[1] for b in all_b], jnp.float32),
        ground_z=0.0,
        texture_period=period,
    )


def aliased_corridor_trajectory(num_frames: int, speed: float = 0.4
                                ) -> se3.Pose:
    """Out to x = 78 and back: the whole return leg is revisits (reverse
    heading — the ScanContext shift handles the 180 deg; binary intensity
    descriptors do not, which is the point of measuring per-channel
    recall here)."""
    return polyline_trajectory([(0.0, 0.0), (78.0, 0.0)], num_frames, speed)


def render_sequence(poses: se3.Pose, world: World, cfg: SensorConfig,
                    distort: bool = False,
                    noise: SensorNoise | None = None,
                    key: jax.Array | None = None,
                    times: jax.Array | None = None):
    """vmapped renderer: returns (F, H*W, 3) xyz + (F, H*W) intensity.

    `distort=True` renders each frame with its true per-column firing poses
    (inter-frame motion as the per-scan delta); `noise`+`key` turn on the
    stochastic sensor model; `times` (F,) drives dynamic objects."""
    F = poses.q.shape[0]
    if times is None:
        times = jnp.arange(F, dtype=jnp.float32) * cfg.scan_period
    if distort:
        nxt = jax.tree.map(lambda a: jnp.roll(a, -1, axis=0), poses)
        deltas = jax.vmap(
            lambda q0, t0, q1, t1: se3.compose(
                se3.inverse(se3.Pose(q0, t0)), se3.Pose(q1, t1))
        )(poses.q, poses.t, nxt.q, nxt.t)
        # last frame reuses the previous delta (constant velocity)
        deltas = jax.tree.map(
            lambda a: a.at[-1].set(a[-2] if F > 1 else a[-1]), deltas)
    keys = (jax.random.split(key, F) if (noise is not None and key is not None)
            else None)

    def one(i):
        d = (jax.tree.map(lambda a: a[i], deltas) if distort else None)
        kk = keys[i] if keys is not None else None
        return render_scan(
            jax.tree.map(lambda a: a[i], poses), world, cfg,
            delta=d, frame_time=times[i], noise=noise, key=kk)

    return jax.vmap(one)(jnp.arange(F))
