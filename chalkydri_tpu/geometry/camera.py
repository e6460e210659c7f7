"""Batched camera (lens) models: OpenCVModel5 project/unproject.

Replaces the reference's external ``camera-intrinsic-model`` crate
(``/root/reference/crates/apriltags/src/lib.rs:26,256,316-321``), which supplies
``GenericModel<f64>`` / ``OpenCVModel5`` and ``unproject()`` from pixel corners
to normalized camera rays.

The model is the standard OpenCV 5-parameter model:
    fx, fy, cx, cy, k1, k2, p1, p2, k3
serialized exactly like the reference's embedded calib JSON
(``/root/reference/chalkydri.ron:29``):

    {"OpenCVModel5": {"fx": ..., "fy": ..., "cx": ..., "cy": ...,
                      "k1": ..., "k2": ..., "p1": ..., "p2": ..., "k3": ...,
                      "width": ..., "height": ...}}

All math is batched jnp; parameters are stored as a flat [..., 9] array so a
per-camera batch of models rides the leading axis of the fused pipeline.
"""

from __future__ import annotations

import json
from typing import NamedTuple

import jax
import jax.numpy as jnp

from chalkydri_tpu.utils.precision import highest_precision

# Parameter ordering inside the flat array.
PARAM_NAMES = ("fx", "fy", "cx", "cy", "k1", "k2", "p1", "p2", "k3")


class OpenCVModel5(NamedTuple):
    """OpenCV 5-distortion-coefficient pinhole model, batched.

    ``params`` is [..., 9] ordered (fx, fy, cx, cy, k1, k2, p1, p2, k3);
    ``width``/``height`` are ints (static; all cameras in a batch may differ in
    intrinsics but share the padded frame geometry).
    """

    params: jax.Array  # [..., 9]
    width: int = 0
    height: int = 0

    # -- constructors ------------------------------------------------------

    @staticmethod
    def from_dict(d: dict, dtype=jnp.float64) -> "OpenCVModel5":
        """Parse the inner dict of the calib JSON (the ``OpenCVModel5`` value)."""
        params = jnp.array([float(d[k]) for k in PARAM_NAMES], dtype=dtype)
        return OpenCVModel5(params, int(d.get("width", 0)), int(d.get("height", 0)))

    @staticmethod
    def from_json(s: str, dtype=jnp.float64) -> "OpenCVModel5":
        """Parse the reference's calib JSON string, e.g. the ``calib`` config
        value embedded in the RON graph (``chalkydri.ron:29``)."""
        outer = json.loads(s)
        if "OpenCVModel5" in outer:
            outer = outer["OpenCVModel5"]
        return OpenCVModel5.from_dict(outer, dtype=dtype)

    @staticmethod
    def zeros(dtype=jnp.float64) -> "OpenCVModel5":
        """Matches ``OpenCVModel5::zeros()`` used for the unconfigured task
        (``crates/apriltags/src/lib.rs:286``)."""
        return OpenCVModel5(jnp.zeros(9, dtype=dtype), 0, 0)

    def to_dict(self) -> dict:
        p = jax.device_get(self.params)
        d = {k: float(v) for k, v in zip(PARAM_NAMES, p)}
        d["width"] = self.width
        d["height"] = self.height
        return d

    def to_json(self) -> str:
        return json.dumps({"OpenCVModel5": self.to_dict()}, indent=2)

    # -- accessors ---------------------------------------------------------

    @property
    def fx(self):
        return self.params[..., 0]

    @property
    def fy(self):
        return self.params[..., 1]

    @property
    def cx(self):
        return self.params[..., 2]

    @property
    def cy(self):
        return self.params[..., 3]

    @property
    def dist(self):
        """(k1, k2, p1, p2, k3)."""
        return self.params[..., 4:9]

    # -- projection --------------------------------------------------------

    @highest_precision
    def distort(self, xn: jax.Array) -> jax.Array:
        """Apply radial+tangential distortion to normalized coords [..., 2]."""
        k1, k2, p1, p2, k3 = (self.dist[..., i] for i in range(5))
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xy2 = 2.0 * x * y
        xd = x * radial + p1 * xy2 + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p2 * xy2 + p1 * (r2 + 2.0 * y * y)
        return jnp.stack([xd, yd], axis=-1)

    @highest_precision
    def project(self, points_cam: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Project camera-frame 3D points [..., 3] to pixels [..., 2].

        Returns (pixels, valid) where valid requires z > 0.
        """
        z = points_cam[..., 2]
        valid = z > 1e-9
        zs = jnp.where(valid, z, 1.0)
        xn = points_cam[..., :2] / zs[..., None]
        xd = self.distort(xn)
        u = self.fx * xd[..., 0] + self.cx
        v = self.fy * xd[..., 1] + self.cy
        return jnp.stack([u, v], axis=-1), valid

    # -- unprojection ------------------------------------------------------

    @highest_precision
    def undistort(self, xd: jax.Array, iters: int = 20) -> tuple[jax.Array, jax.Array]:
        """Invert the distortion by Newton iteration on the 2x2 Jacobian.

        Returns (normalized coords [..., 2], converged mask). The reference's
        ``camera-intrinsic-model`` unproject returns ``Option`` per corner and
        the detect path drops tags whose 4 corners don't all unproject
        (``crates/apriltags/src/lib.rs:316-328``); the mask plays that role.
        """
        dtype = xd.dtype

        def body(_, xn):
            # f(xn) = distort(xn) - xd ; Newton step with analytic Jacobian.
            k1, k2, p1, p2, k3 = (self.dist[..., i] for i in range(5))
            x, y = xn[..., 0], xn[..., 1]
            r2 = x * x + y * y
            radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
            dradial_dr2 = k1 + r2 * (2.0 * k2 + 3.0 * k3 * r2)
            fx_ = x * radial + p1 * 2.0 * x * y + p2 * (r2 + 2.0 * x * x)
            fy_ = y * radial + p2 * 2.0 * x * y + p1 * (r2 + 2.0 * y * y)
            # Jacobian d(fx,fy)/d(x,y)
            j00 = radial + x * dradial_dr2 * 2.0 * x + 2.0 * p1 * y + 6.0 * p2 * x
            j01 = x * dradial_dr2 * 2.0 * y + 2.0 * p1 * x + 2.0 * p2 * y
            j10 = y * dradial_dr2 * 2.0 * x + 2.0 * p2 * y + 2.0 * p1 * x
            j11 = radial + y * dradial_dr2 * 2.0 * y + 2.0 * p2 * x + 6.0 * p1 * y
            det = j00 * j11 - j01 * j10
            det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
            rx = fx_ - xd[..., 0]
            ry = fy_ - xd[..., 1]
            dx = (j11 * rx - j01 * ry) / det
            dy = (-j10 * rx + j00 * ry) / det
            return jnp.stack([x - dx, y - dy], axis=-1)

        xn = jax.lax.fori_loop(0, iters, body, xd.astype(dtype))
        # Converged if round-trip error is tiny (in normalized units).
        err = jnp.linalg.norm(self.distort(xn) - xd, axis=-1)
        converged = err < 1e-6
        return xn, converged

    @highest_precision
    def unproject(self, pixels: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Pixels [..., 2] -> normalized camera rays [..., 3] (z = 1), mask.

        Mirrors ``GenericModel::unproject`` (corner -> ray) used at
        ``crates/apriltags/src/lib.rs:316-321``.
        """
        xd = jnp.stack(
            [
                (pixels[..., 0] - self.cx) / self.fx,
                (pixels[..., 1] - self.cy) / self.fy,
            ],
            axis=-1,
        )
        xn, converged = self.undistort(xd)
        rays = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
        return rays, converged


def stack_models(models: list[OpenCVModel5]) -> OpenCVModel5:
    """Stack per-camera models along a new leading batch axis."""
    params = jnp.stack([m.params for m in models], axis=0)
    w = max((m.width for m in models), default=0)
    h = max((m.height for m in models), default=0)
    return OpenCVModel5(params, w, h)
