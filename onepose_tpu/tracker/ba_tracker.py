"""Keyframe tracker with sliding-window bundle adjustment.

Behavioral spec from the reference BATracker (src/tracker/ba_tracker.py):
- Per frame: LK optical flow from the last keyframe -> PnP initial pose
  (ba_tracker.py:295-356); constant-velocity motion prediction fallback
  when flow-based pose jumps too far (ba_tracker.py:275-293, 738-750:
  flow pose accepted within 20 cm / 20 deg of the last pose, motion
  fallback bounded by a 3-strike counter).
- NN descriptor matching keyframe <-> query; matched query keypoints
  inherit the keyframe's 3D ids, gated by reprojection error below
  1.2 x median (ba_tracker.py:530-545).
- Unmatched-in-3D pairs are two-view triangulated (keyframe pose x init
  pose) and gated at 20 px reprojection in both views plus a distance
  gate (ba_tracker.py:548-584).
- Sliding-window (10 frames) BA over all window observations with the LM
  solver, 5 iterations (ba_tracker.py:358-441).
- Keyframe update every 5 frames, rejecting pose jumps > 10 cm / 10 deg
  (ba_tracker.py:128-145).

TPU-first differences:
- TrackerState is a fixed-shape pytree of ring buffers (window frames,
  point buffer) — the reference grows numpy lists and re-indexes
  (ba_tracker.py:147-235); here every step is the same XLA program.
- Flow + PnP, match + triangulate + BA are jitted subroutines; the only
  host decisions are scalar policy branches (keyframe cadence).
- Motion prediction uses angle-axis velocity instead of Euler angles
  (reference uses transforms3d euler — same small-motion behavior,
  branch-free math).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from onepose_tpu.geometry.ransac import ransac_pnp
from onepose_tpu.geometry.rotations import (
    angle_axis_to_rotmat,
    rotmat_to_angle_axis,
)
from onepose_tpu.geometry.triangulation import triangulate_two_view
from onepose_tpu.models.nn_matcher import mutual_nn_match
from onepose_tpu.ops.lm import ba_solve
from onepose_tpu.ops.optical_flow import pyramidal_lk


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    window_size: int = 10
    n_kpts: int = 512
    point_capacity: int = 4096
    kf_interval: int = 5
    ba_iters: int = 5
    nn_distance_thresh: float = 0.7
    triang_max_reproj_px: float = 20.0
    max_point_radius: float = 0.5  # object-frame distance gate
    flow_accept_cm: float = 20.0
    flow_accept_deg: float = 20.0
    kf_reject_cm: float = 10.0
    kf_reject_deg: float = 10.0
    ransac_hyp: int = 128


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrackerState:
    # Window ring buffers (axis 0 = slot).
    frame_kpts: jnp.ndarray  # [W, N, 2]
    frame_descs: jnp.ndarray  # [W, N, C]
    frame_p3d: jnp.ndarray  # [W, N] point-buffer ids (-1 = none)
    frame_mask: jnp.ndarray  # [W, N]
    cam_poses: jnp.ndarray  # [W, 6] (angle-axis, t) world->cam
    cam_intr: jnp.ndarray  # [W, 3] (f, cx, cy)
    frame_valid: jnp.ndarray  # [W]
    # Point buffer.
    points: jnp.ndarray  # [P, 3]
    point_valid: jnp.ndarray  # [P]
    n_points: jnp.ndarray  # scalar int32
    # Keyframe context.
    kf_slot: jnp.ndarray  # scalar int32
    kf_image: jnp.ndarray  # [H, W]
    kf_pose: jnp.ndarray  # [4, 4]
    # Motion history: last three poses (world->cam 4x4).
    pose_hist: jnp.ndarray  # [3, 4, 4]


def pose_to_aa(pose: jnp.ndarray) -> jnp.ndarray:
    aa = rotmat_to_angle_axis(pose[..., :3, :3])
    return jnp.concatenate([aa, pose[..., :3, 3]], axis=-1)


def aa_to_pose(cam: jnp.ndarray) -> jnp.ndarray:
    R = angle_axis_to_rotmat(cam[..., :3])
    pose = jnp.zeros(cam.shape[:-1] + (4, 4), cam.dtype)
    pose = pose.at[..., :3, :3].set(R)
    pose = pose.at[..., :3, 3].set(cam[..., 3:6])
    pose = pose.at[..., 3, 3].set(1.0)
    return pose


def pose_distance(p0: jnp.ndarray, p1: jnp.ndarray):
    """(trans cm, rot deg) between two 4x4 poses."""
    t = jnp.linalg.norm(p0[:3, 3] - p1[:3, 3]) * 100.0
    tr = jnp.clip(
        jnp.trace(p0[:3, :3] @ p1[:3, :3].T), -1.0, 3.0
    )
    r = jnp.degrees(jnp.arccos((tr - 1.0) / 2.0))
    return t, r


def motion_prediction(pose_hist: jnp.ndarray) -> jnp.ndarray:
    """Constant-velocity extrapolation from the last three poses
    (reference ba_tracker.py:275-293, angle-axis instead of Euler)."""
    aa = pose_to_aa(pose_hist)  # [3, 6]
    v = ((aa[1] - aa[0]) + (aa[2] - aa[1])) / 2.0
    return aa_to_pose(aa[2] + v)


class BATracker:
    def __init__(self, config: TrackerConfig = TrackerConfig()):
        self.cfg = config
        self._frame_count = 0
        self._use_motion_cnt = 0
        self.state: TrackerState | None = None

    # ------------------------------------------------------------------
    def initialize(
        self,
        image: jnp.ndarray,
        kpts: jnp.ndarray,
        descs: jnp.ndarray,
        mask: jnp.ndarray,
        p3d_ids: jnp.ndarray,
        points3d: jnp.ndarray,
        pose: jnp.ndarray,
        K: jnp.ndarray,
    ) -> None:
        """Start tracking from a posed frame whose keypoints carry 3D ids
        into `points3d` (e.g. the matcher's output on the first frame)."""
        cfg = self.cfg
        W, N, P = cfg.window_size, cfg.n_kpts, cfg.point_capacity
        C = descs.shape[-1]
        f = jnp.asarray(K)[0, 0]
        cx, cy = jnp.asarray(K)[0, 2], jnp.asarray(K)[1, 2]

        n_pts = min(points3d.shape[0], P)
        points = jnp.zeros((P, 3), jnp.float32).at[:n_pts].set(
            jnp.asarray(points3d, jnp.float32)[:n_pts]
        )
        point_valid = jnp.zeros((P,), bool).at[:n_pts].set(True)

        pose = jnp.asarray(pose, jnp.float32)
        self.state = TrackerState(
            frame_kpts=jnp.zeros((W, N, 2), jnp.float32)
            .at[0]
            .set(jnp.asarray(kpts, jnp.float32)[:N]),
            frame_descs=jnp.zeros((W, N, C), jnp.float32)
            .at[0]
            .set(jnp.asarray(descs, jnp.float32)[:N]),
            frame_p3d=jnp.full((W, N), -1, jnp.int32)
            .at[0]
            .set(jnp.asarray(p3d_ids, jnp.int32)[:N]),
            frame_mask=jnp.zeros((W, N), bool)
            .at[0]
            .set(jnp.asarray(mask)[:N]),
            cam_poses=jnp.zeros((W, 6), jnp.float32)
            .at[0]
            .set(pose_to_aa(pose)),
            cam_intr=jnp.zeros((W, 3), jnp.float32)
            .at[0]
            .set(jnp.stack([f, cx, cy])),
            frame_valid=jnp.zeros((W,), bool).at[0].set(True),
            points=points,
            point_valid=point_valid,
            n_points=jnp.asarray(n_pts, jnp.int32),
            kf_slot=jnp.asarray(0, jnp.int32),
            kf_image=jnp.asarray(image, jnp.float32),
            kf_pose=pose,
            pose_hist=jnp.stack([pose, pose, pose]),
        )
        self._frame_count = 1

    # ------------------------------------------------------------------
    def update_kf(
        self,
        image: jnp.ndarray,
        kpts: jnp.ndarray,
        descs: jnp.ndarray,
        mask: jnp.ndarray,
        p3d_ids: jnp.ndarray,
        pose: jnp.ndarray,
        K: jnp.ndarray,
    ) -> bool:
        """Inject a matcher-verified keyframe (reference update_kf,
        src/tracker/ba_tracker.py:128-145): rejected when the proposed
        pose jumps more than kf_reject_cm / kf_reject_deg from the last
        tracked pose. `p3d_ids` index the SAME point cloud passed to
        initialize() (the object map), so matcher matches map directly
        onto the head of the tracker's point buffer. Returns True when
        the keyframe was accepted."""
        assert self.state is not None, "call initialize() first"
        cfg = self.cfg
        pose = jnp.asarray(pose, jnp.float32)
        # Single packed accept check (one host fetch, matching track()'s
        # one-dispatch/one-fetch contract on the keyframe path too).
        if not bool(_kf_accept(self.state.pose_hist[2], pose, cfg)):
            return False

        st = self.state
        N = cfg.n_kpts
        slot = (int(st.kf_slot) + 1) % cfg.window_size
        K = jnp.asarray(K, jnp.float32)
        self.state = dataclasses.replace(
            st,
            frame_kpts=st.frame_kpts.at[slot].set(
                jnp.asarray(kpts, jnp.float32)[:N]
            ),
            frame_descs=st.frame_descs.at[slot].set(
                jnp.asarray(descs, jnp.float32)[:N]
            ),
            frame_p3d=st.frame_p3d.at[slot].set(
                jnp.asarray(p3d_ids, jnp.int32)[:N]
            ),
            frame_mask=st.frame_mask.at[slot].set(jnp.asarray(mask)[:N]),
            cam_poses=st.cam_poses.at[slot].set(pose_to_aa(pose)),
            cam_intr=st.cam_intr.at[slot].set(
                jnp.stack([K[0, 0], K[0, 2], K[1, 2]])
            ),
            frame_valid=st.frame_valid.at[slot].set(True),
            kf_slot=jnp.asarray(slot, jnp.int32),
            kf_image=jnp.asarray(image, jnp.float32),
            kf_pose=pose,
            pose_hist=jnp.concatenate(
                [st.pose_hist[1:], pose[None]], axis=0
            ),
        )
        self._frame_count += 1
        return True

    # ------------------------------------------------------------------
    def track(
        self,
        image: jnp.ndarray,
        kpts: jnp.ndarray,
        descs: jnp.ndarray,
        mask: jnp.ndarray,
        K: jnp.ndarray,
        key: jax.Array | None = None,
    ) -> dict:
        """Track one frame; returns dict(pose, pose_init, n_tracked,
        n_new_points, used_motion).

        ONE device dispatch + ONE host fetch per frame: the whole
        flow -> PnP-init -> NN-match -> triangulate -> window-BA chain is
        a single jitted program (_megastep) whose scalar diagnostics come
        back packed in one array. The reference makes several dependent
        GPU calls + host syncs per frame (src/tracker/ba_tracker.py:
        727-802, per-stage Timer table); the only host-side logic left
        here is the keyframe-cadence counter — SURVEY §7.1's "no
        per-frame host sync" principle."""
        assert self.state is not None, "call initialize() first"
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(self._frame_count)

        is_kf = (self._frame_count % cfg.kf_interval) == 0
        have_hist = self._frame_count >= 3
        self.state, packed = _megastep(
            self.state,
            jnp.asarray(image, jnp.float32),
            jnp.asarray(kpts, jnp.float32),
            jnp.asarray(descs, jnp.float32),
            jnp.asarray(mask),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(is_kf),
            jnp.asarray(have_hist),
            key,
            cfg,
        )
        self._frame_count += 1
        return self._unpack(packed)

    def _unpack(self, packed) -> dict:
        """Single host fetch of the megastep's packed diagnostics."""
        v = np.asarray(packed)  # [54]
        flow_ok = bool(v[48] > 0.5)
        if flow_ok:
            self._use_motion_cnt = 0
        else:
            self._use_motion_cnt += 1
        return {
            "pose": v[0:16].reshape(4, 4),
            "pose_init": v[16:32].reshape(4, 4),
            "pose_flow": v[32:48].reshape(4, 4),
            "flow_ok": flow_ok,
            "used_motion": not flow_ok,
            "n_tracked": int(v[50]),
            "n_new_points": int(v[51]),
            "ba_cost_initial": float(v[52]),
            "ba_cost_final": float(v[53]),
        }


# ----------------------------------------------------------------------
@partial(jax.jit, static_argnames=("cfg",))
def _kf_accept(last_pose, pose, cfg: TrackerConfig):
    """Keyframe accept predicate (reference ba_tracker.py:128-145) as one
    scalar: finite AND within the pose-jump gates."""
    t_j, r_j = pose_distance(last_pose, pose)
    return (
        jnp.isfinite(pose).all()
        & (t_j < cfg.kf_reject_cm)
        & (r_j < cfg.kf_reject_deg)
    )


def _flow_pose(st: TrackerState, image, K, key, cfg: TrackerConfig):
    """LK-track keyframe keypoints with 3D ids into the query; PnP."""
    kf = st.kf_slot
    kpts = st.frame_kpts[kf]
    has3d = (st.frame_p3d[kf] >= 0) & st.frame_mask[kf]
    new_pts, status = pyramidal_lk(st.kf_image, image, kpts)
    valid = has3d & status
    ids = jnp.maximum(st.frame_p3d[kf], 0)
    pts3d = st.points[ids]
    pnp = ransac_pnp(
        key, new_pts, pts3d, K, valid, n_hyp=cfg.ransac_hyp
    )
    return {
        "pose": pnp["pose"],
        "ok": pnp["ok"] & (pnp["num_inliers"] >= 6),
        "num_inliers": pnp["num_inliers"],
        "flow_pts": new_pts,
        "flow_valid": valid,
    }


def _track_ba_step(
    st: TrackerState, kpts, descs, mask, K, pose_init, key, cfg: TrackerConfig
):
    """Match KF<->query, inherit/extend 3D, window BA, slot insertion."""
    W, N, P = cfg.window_size, cfg.n_kpts, cfg.point_capacity
    kf = st.kf_slot

    # 1. NN match keyframe -> query.
    m = mutual_nn_match(
        st.frame_descs[kf], descs,
        st.frame_mask[kf], mask,
        distance_thresh=cfg.nn_distance_thresh,
    )
    midx = jnp.maximum(m["matches0"], 0)  # [N] query index per KF kpt
    matched = m["matches0"] >= 0

    # 2. Existing 3D: query keypoint inherits the KF 3D id, gated by
    # reprojection error under pose_init (< 1.2 x median of matched set).
    q_kpts = kpts[midx]  # [N, 2] query position per KF slot
    kf_p3d = st.frame_p3d[kf]
    has3d = matched & (kf_p3d >= 0)
    pts3d = st.points[jnp.maximum(kf_p3d, 0)]
    R_init = pose_init[:3, :3]
    t_init = pose_init[:3, 3]
    p_cam = pts3d @ R_init.T + t_init
    pix = p_cam @ K.T
    uv_hat = pix[:, :2] / jnp.maximum(jnp.abs(pix[:, 2:]), 1e-9)
    rep_err = jnp.linalg.norm(uv_hat - q_kpts, axis=-1)
    med = jnp.median(jnp.where(has3d, rep_err, jnp.nan))
    med = jnp.where(jnp.isnan(med), jnp.inf, med)
    keep3d = has3d & (rep_err < 1.2 * med)

    # 3. New points: matched pairs without 3D -> two-view triangulation.
    tri_cand = matched & (kf_p3d < 0)
    kf_pose_mat = aa_to_pose(st.cam_poses[kf])
    f_kf, cx_kf, cy_kf = (
        st.cam_intr[kf, 0], st.cam_intr[kf, 1], st.cam_intr[kf, 2],
    )
    K_kf = jnp.array(
        [[f_kf, 0.0, cx_kf], [0.0, f_kf, cy_kf], [0.0, 0.0, 1.0]]
    )
    P_kf = K_kf @ kf_pose_mat[:3, :4]
    P_q = K @ pose_init[:3, :4]
    xyz_new = triangulate_two_view(
        st.frame_kpts[kf], q_kpts, P_kf, P_q
    )  # [N, 3]
    # Gates: reprojection in both views < 20 px, object-frame radius.
    def reproj(Pm, X):
        x = jnp.concatenate([X, jnp.ones_like(X[..., :1])], -1) @ Pm.T
        return x[..., :2] / jnp.maximum(jnp.abs(x[..., 2:]), 1e-9)

    err_kf = jnp.linalg.norm(
        reproj(P_kf, xyz_new) - st.frame_kpts[kf], axis=-1
    )
    err_q = jnp.linalg.norm(reproj(P_q, xyz_new) - q_kpts, axis=-1)
    tri_ok = (
        tri_cand
        & (err_kf < cfg.triang_max_reproj_px)
        & (err_q < cfg.triang_max_reproj_px)
        & (jnp.linalg.norm(xyz_new, axis=-1) < cfg.max_point_radius)
        & jnp.all(jnp.isfinite(xyz_new), axis=-1)
    )

    # Allocate point ids for new points (prefix-sum into the buffer).
    order = jnp.cumsum(tri_ok.astype(jnp.int32)) - 1
    new_ids = st.n_points + order
    can_store = tri_ok & (new_ids < P)
    new_ids_c = jnp.where(can_store, new_ids, 0)
    points = st.points.at[new_ids_c].set(
        jnp.where(can_store[:, None], xyz_new, st.points[new_ids_c])
    )
    point_valid = st.point_valid.at[new_ids_c].set(
        st.point_valid[new_ids_c] | can_store
    )
    n_points = jnp.minimum(
        st.n_points + jnp.sum(can_store), P
    ).astype(jnp.int32)

    # 4. Query frame's per-keypoint 3D ids: scatter via the query index
    # (mutual NN makes midx unique over matched slots, so no collisions).
    src_ids = jnp.where(
        keep3d, jnp.maximum(kf_p3d, 0), jnp.where(can_store, new_ids_c, -1)
    )
    write = (keep3d | can_store) & matched
    write_idx = jnp.where(write, midx, N)  # N = out of bounds -> dropped
    q_p3d = (
        jnp.full((N,), -1, jnp.int32)
        .at[write_idx]
        .set(src_ids, mode="drop")
    )

    # 5. Insert the query frame into the window: it takes the slot of the
    # OLDEST window entry (ring buffer).
    oldest = (st.kf_slot + 1) % W
    f_q = K[0, 0]
    st2 = dataclasses.replace(
        st,
        frame_kpts=st.frame_kpts.at[oldest].set(kpts),
        frame_descs=st.frame_descs.at[oldest].set(descs),
        frame_p3d=st.frame_p3d.at[oldest].set(q_p3d),
        frame_mask=st.frame_mask.at[oldest].set(mask),
        cam_poses=st.cam_poses.at[oldest].set(pose_to_aa(pose_init)),
        cam_intr=st.cam_intr.at[oldest].set(
            jnp.stack([f_q, K[0, 2], K[1, 2]])
        ),
        frame_valid=st.frame_valid.at[oldest].set(True),
        points=points,
        point_valid=point_valid,
        n_points=n_points,
        kf_slot=oldest,
    )

    # 6. Window BA over all observations with 3D ids.
    obs_p = st2.frame_p3d.reshape(-1)  # [W*N]
    obs_mask = (
        (obs_p >= 0)
        & st2.frame_mask.reshape(-1)
        & jnp.repeat(st2.frame_valid, N)
    )
    uv = st2.frame_kpts.reshape(-1, 2)
    cam_idx = jnp.repeat(jnp.arange(W), N)
    intr = st2.cam_intr[cam_idx]
    features = jnp.concatenate([uv, intr], axis=-1)  # [W*N, 5]
    # Gauge: fix the oldest valid camera (the one right after the new
    # slot in ring order) — keeps the window anchored.
    anchor = (oldest + 1) % W
    fix = jnp.zeros((W,), jnp.float32).at[anchor].set(1.0)
    fix = jnp.where(st.frame_valid[anchor], fix, fix.at[kf].set(1.0))

    ba = ba_solve(
        st2.points,
        st2.cam_poses,
        features,
        jnp.maximum(obs_p, 0),
        cam_idx,
        obs_mask,
        point_mask=st2.point_valid,
        fix_cam_mask=fix,
        n_iters=cfg.ba_iters,
    )
    st3 = dataclasses.replace(
        st2, points=ba["points"], cam_poses=ba["cam_poses"]
    )
    pose_opt = aa_to_pose(ba["cam_poses"][oldest])

    return st3, {
        "pose_opt": pose_opt,
        "n_tracked": jnp.sum(keep3d),
        "n_new": jnp.sum(can_store),
        "cost_initial": ba["cost_initial"],
        "cost_final": ba["cost_final"],
    }


# ----------------------------------------------------------------------
@partial(jax.jit, static_argnames=("cfg",))
def _megastep(
    st: TrackerState,
    image,
    kpts,
    descs,
    mask,
    K,
    is_kf,
    have_hist,
    key,
    cfg: TrackerConfig,
):
    """The whole tracked frame as ONE XLA program: LK flow -> PnP init
    (with on-device motion-prediction fallback) -> NN match -> 3D
    inherit/triangulate -> window BA -> pose-accept policy -> conditional
    state commit. Returns (new_state, packed) where packed is a single
    [54] f32 array of diagnostics — the caller's only host fetch.

    `is_kf`/`have_hist` are traced booleans (host keyframe-cadence
    counters), so every frame reuses one compiled program."""
    flow = _flow_pose(st, image, K, key, cfg)
    pose_ftk = flow["pose"]
    last_pose = st.pose_hist[2]
    t_d, r_d = pose_distance(last_pose, pose_ftk)
    pose_mo = jnp.where(
        have_hist, motion_prediction(st.pose_hist), last_pose
    )
    flow_ok = (
        flow["ok"]
        & (t_d < cfg.flow_accept_cm)
        & (r_d < cfg.flow_accept_deg)
    )
    pose_init = jnp.where(flow_ok, pose_ftk, pose_mo)

    new_state, out = _track_ba_step(
        st, kpts, descs, mask, K, pose_init, key, cfg
    )
    pose_opt = out["pose_opt"]

    # Pose-accept policy (reference KF rejection, ba_tracker.py:128-145,
    # at 2x the keyframe gate for in-window frames).
    t_j, r_j = pose_distance(last_pose, pose_opt)
    accept = (
        jnp.isfinite(pose_opt).all()
        & (t_j < cfg.kf_reject_cm * 2)
        & (r_j < cfg.kf_reject_deg * 2)
    )
    pose_final = jnp.where(accept, pose_opt, pose_init)

    # Only accepted keyframes persist into the window/point database
    # (reference cadence every kf_interval frames, ba_tracker.py:684);
    # otherwise the window is restored — selected on device.
    commit = is_kf & accept
    committed = dataclasses.replace(
        new_state, kf_image=image, kf_pose=pose_final
    )
    sel = jax.tree.map(
        lambda a, b: jnp.where(commit, a, b), committed, st
    )
    sel = dataclasses.replace(
        sel,
        pose_hist=jnp.concatenate(
            [sel.pose_hist[1:], pose_final[None]], axis=0
        ),
    )

    packed = jnp.concatenate(
        [
            pose_final.reshape(-1),
            pose_init.reshape(-1),
            pose_ftk.reshape(-1),
            jnp.stack(
                [
                    flow_ok.astype(jnp.float32),
                    accept.astype(jnp.float32),
                    out["n_tracked"].astype(jnp.float32),
                    out["n_new"].astype(jnp.float32),
                    out["cost_initial"].astype(jnp.float32),
                    out["cost_final"].astype(jnp.float32),
                ]
            ),
        ]
    )
    return sel, packed
