"""Plain-numpy f64 reference implementation of the Chalkydri SQPnP solver.

Semantic port of /root/reference/crates/chalkydri_sqpnp/src/lib.rs used ONLY as
a test oracle (SURVEY.md section 4: "pose-parity harnesses vs. a CPU reference
implementation"). Written independently in numpy; scalar loops, early breaks
and Option-returns mirror the Rust control flow exactly so the JAX solver's
masked/fixed-shape re-design can be validated against it.
"""

from __future__ import annotations

import numpy as np

XY_STD_DEV_SCALAR = 5.0
THETA_STD_DEV_SCALAR = 2.0
MAX_TRUSTABLE_RMS = 0.1
MAX_GYRO_DELTA = 30.0
TAG_SIZE = 0.1651
CORNER_DISTANCE = TAG_SIZE / 2.0


def nearest_so3(r_vec):
    m = r_vec.reshape(3, 3, order="F")  # column-major
    u, _, vt = np.linalg.svd(m)
    rot = u @ vt
    if np.linalg.det(rot) < 0:
        u2 = u.copy()
        u2[:, 2] *= -1
        rot = u2 @ vt
    return rot.reshape(9, order="F")


def constraints_and_jacobian(r):
    c1, c2, c3 = r[0:3], r[3:6], r[6:9]
    h = np.array(
        [
            c1 @ c1 - 1.0,
            c2 @ c2 - 1.0,
            c3 @ c3 - 1.0,
            c1 @ c2,
            c1 @ c3,
            c2 @ c3,
        ]
    )
    jac = np.zeros((6, 9))
    jac[0, 0:3] = 2 * c1
    jac[1, 3:6] = 2 * c2
    jac[2, 6:9] = 2 * c3
    jac[3, 0:3] = c2
    jac[3, 3:6] = c1
    jac[4, 0:3] = c3
    jac[4, 6:9] = c1
    jac[5, 3:6] = c3
    jac[5, 6:9] = c2
    return h, jac


def solve_newton(r, omega, h, jac):
    lhs = np.zeros((15, 15))
    lhs[0:9, 0:9] = omega
    lhs[0:9, 9:15] = jac.T
    lhs[9:15, 0:9] = jac
    rhs = np.concatenate([-(omega @ r), -h])
    try:
        sol = np.linalg.solve(lhs, rhs)
    except np.linalg.LinAlgError:
        return None
    if not np.all(np.isfinite(sol)):
        return None
    return sol[0:9]


def build_linear_system(points_3d, points_2d):
    q_rr = np.zeros((9, 9))
    q_rt = np.zeros((9, 3))
    q_tt = np.zeros((3, 3))
    for p3, v in zip(points_3d, points_2d):
        sq = v @ v
        proj = np.eye(3) - np.outer(v, v) / sq
        q_tt += proj
        px, py, pz = p3[0] * proj, p3[1] * proj, p3[2] * proj
        q_rt[0:3] += px
        q_rt[3:6] += py
        q_rt[6:9] += pz
        q_rr[0:3, 0:3] += px * p3[0]
        q_rr[3:6, 3:6] += py * p3[1]
        q_rr[6:9, 6:9] += pz * p3[2]
        pxy = px * p3[1]
        q_rr[0:3, 3:6] += pxy
        q_rr[3:6, 0:3] += pxy
        pxz = px * p3[2]
        q_rr[0:3, 6:9] += pxz
        q_rr[6:9, 0:3] += pxz
        pyz = py * p3[2]
        q_rr[3:6, 6:9] += pyz
        q_rr[6:9, 3:6] += pyz
    try:
        q_tt_inv = np.linalg.inv(q_tt)
    except np.linalg.LinAlgError:
        q_tt_inv = np.zeros((3, 3))
    omega = q_rr - (q_rt @ q_tt_inv) @ q_rt.T
    return omega, q_tt_inv, q_rt


class RefSqPnP:
    def __init__(self, max_iter=15, tol_sq=1e-16):
        self.max_iter = max_iter
        self.tol_sq = tol_sq
        self.gyro_cos = 0.0
        self.gyro_sin = 0.0
        self.sign_change_error = 0.0
        self.fwd_in_cam = np.array([0.0, 0.0, 1.0])

    # -- inner optimization -------------------------------------------------

    def optimization(self, start_r, omega):
        r = start_r.copy()
        for _ in range(self.max_iter):
            h, jac = constraints_and_jacobian(r)
            delta = solve_newton(r, omega, h, jac)
            if delta is None:
                break
            r = r + delta
            if delta @ delta < self.tol_sq:
                break
        return r, r @ (omega @ r)

    def solve_rotation_candidates(self, omega):
        candidates = []
        w, v = np.linalg.eigh(omega)
        order = np.argsort(w)
        for i in order[:3]:
            e = v[:, i]
            for sign in (-1.0, 1.0):
                r_start = nearest_so3(sign * e)
                refined, energy = self.optimization(r_start, omega)
                d = self.fwd_in_cam
                fwd_x = refined[0] * d[0] + refined[1] * d[1] + refined[2] * d[2]
                fwd_y = refined[3] * d[0] + refined[4] * d[1] + refined[5] * d[2]
                dot = fwd_x * self.gyro_cos + fwd_y * self.gyro_sin
                angle_error = max(1.0 - dot, 0.0)
                energy += self.sign_change_error * angle_error
                candidates.append((refined, energy))
        candidates.sort(key=lambda c: c[1])
        return candidates

    def corner_points_from_center(self, isometries):
        s = CORNER_DISTANCE
        corners = np.array(
            [[0.0, -s, -s], [0.0, s, -s], [0.0, s, s], [0.0, -s, s]]
        )
        pts = []
        for rot, t in isometries:
            for c in corners:
                pts.append(rot @ c + t)
        return np.array(pts)

    def solve(self, isometries, points_2d):
        buffer = self.corner_points_from_center(isometries)
        if len(buffer) < 3 or len(buffer) != len(points_2d):
            return None
        centroid = buffer.mean(axis=0)
        local = buffer - centroid
        omega, q_tt_inv, q_rt = build_linear_system(local, points_2d)
        candidates = self.solve_rotation_candidates(omega)

        best = None
        best_score = np.inf
        for r_vec, penalized in candidates:
            r_mat = r_vec.reshape(3, 3, order="F")
            t_local = -(q_tt_inv @ (q_rt.T @ r_vec))
            t = t_local - r_mat @ centroid
            if not all((r_mat @ p + t)[2] > 0 for p in buffer):
                continue
            if penalized < best_score:
                best_score = penalized
                pure = r_vec @ (omega @ r_vec)
                best = (r_mat, t, pure)
        return best

    def compute_std_devs(self, pure_energy, distance, n_tags):
        n_points = n_tags * 4.0
        # pure_energy = r^T omega r can be a tiny negative number (FP noise on
        # a PSD form); the Rust code would then produce NaN std-devs via
        # sqrt(<0). Clamp at 0 — parity on the sign of FP noise is meaningless.
        rms = np.sqrt(max(pure_energy, 0.0) / n_points)
        if rms > MAX_TRUSTABLE_RMS:
            return np.array([np.finfo(np.float64).max] * 3)
        mult = 1.0 + distance / TAG_SIZE
        xy = np.clip(rms * mult / np.sqrt(n_tags) * XY_STD_DEV_SCALAR, 0.01, 10.0)
        theta = np.clip(
            (rms / TAG_SIZE) * mult / np.sqrt(n_tags) * THETA_STD_DEV_SCALAR,
            0.05,
            np.pi,
        )
        return np.array([xy, xy, theta])

    def solve_robot_pose(self, isometries, points_2d, robot_to_cam, gyro,
                         sign_change_error):
        """isometries: list of (R, t); robot_to_cam: (R, t); returns
        (rot, pos, std_devs) or None."""
        self.gyro_cos = np.cos(gyro)
        self.gyro_sin = np.sin(gyro)
        self.sign_change_error = sign_change_error
        rc_rot, rc_t = robot_to_cam
        self.fwd_in_cam = rc_rot[:, 0].copy()

        res = self.solve(isometries, points_2d)
        if res is None:
            return None
        rot_wc, t_wc, pure = res

        distance = np.linalg.norm(t_wc)
        n_tags = len(isometries)
        std_devs = self.compute_std_devs(pure, distance, n_tags)

        # t_world_robot = world_to_cam^-1 * robot_to_cam
        inv_rot = rot_wc.T
        inv_t = -inv_rot @ t_wc
        robot_rot = inv_rot @ rc_rot
        robot_pos = inv_rot @ rc_t + inv_t

        tag_centroid = np.mean([t for _, t in isometries], axis=0)

        vision_yaw = np.arctan2(robot_rot[1, 0], robot_rot[0, 0])
        delta_yaw = gyro - vision_yaw
        delta_yaw = np.mod(delta_yaw + np.pi, 2 * np.pi) - np.pi
        delta_deg = np.degrees(abs(delta_yaw))
        weight = np.clip(delta_deg / MAX_GYRO_DELTA, 0.0, 1.0)
        weight = weight * weight * (3.0 - 2.0 * weight)
        applied = delta_yaw * weight
        c, s = np.cos(applied), np.sin(applied)
        rot_z = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
        pivoted_pos = tag_centroid + rot_z @ (robot_pos - tag_centroid)
        pivoted_rot = rot_z @ robot_rot
        return pivoted_rot, pivoted_pos, std_devs


def create_solver_camera_transform(fwd_m, left_m, up_m, roll_deg, pitch_deg, yaw_deg):
    """numpy port of SqPnP::create_solver_camera_transform (lib.rs:430-461)."""
    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    nwu_rot = rz(np.radians(yaw_deg)) @ ry(np.radians(pitch_deg)) @ rx(np.radians(roll_deg))
    nwu_t = np.array([fwd_m, left_m, up_m])
    nwu_to_cv = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    # compose: robot_pose_of_cam_nwu * nwu_to_cv, then invert
    rot = nwu_rot @ nwu_to_cv
    t = nwu_t
    inv_rot = rot.T
    inv_t = -inv_rot @ t
    return inv_rot, inv_t
