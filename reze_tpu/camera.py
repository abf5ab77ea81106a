"""Arc-rotate camera (camera.ts:5-132) — math only, no input handling.

Spherical orbit around a target: ``alpha`` (azimuth), ``beta`` (polar),
``radius``, with the reference's left-handed view/projection conventions.
Input-device handling (mouse orbit/pan/zoom, camera.ts:169-357) has no
equivalent in a headless engine; the public fields and orbit/pan/zoom
*operations* are exposed instead.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .core import math3d as m3


@dataclasses.dataclass
class Camera:
    alpha: float = np.pi
    beta: float = np.pi / 2.5
    radius: float = 26.6
    target: tuple[float, float, float] = (0.0, 12.5, 0.0)
    fov: float = np.pi / 4
    aspect: float = 1.0
    near: float = 0.05
    far: float = 1000.0
    # settings (camera.ts:28-35)
    angular_sensitivity: float = 0.005
    pan_sensitivity: float = 0.0002
    wheel_precision: float = 0.01
    lower_beta_limit: float = 0.001
    upper_beta_limit: float = np.pi - 0.001

    def position(self) -> jnp.ndarray:
        t = jnp.asarray(self.target)
        sb, cb = np.sin(self.beta), np.cos(self.beta)
        sa, ca = np.sin(self.alpha), np.cos(self.alpha)
        return t + self.radius * jnp.asarray([sb * sa, cb, sb * ca])

    def view_matrix(self) -> jnp.ndarray:
        return m3.look_at_lh(
            self.position(), jnp.asarray(self.target), jnp.asarray([0.0, 1.0, 0.0])
        )

    def projection_matrix(self) -> jnp.ndarray:
        return m3.perspective_lh(
            jnp.asarray(self.fov),
            jnp.asarray(self.aspect),
            jnp.asarray(self.near),
            jnp.asarray(self.far),
        )

    def view_proj(self) -> jnp.ndarray:
        return self.projection_matrix() @ self.view_matrix()

    # --- interactive operations (functional equivalents of input handlers) ---

    def orbit(self, dx: float, dy: float) -> "Camera":
        """Mouse-drag orbit (camera.ts:188-196)."""
        alpha = self.alpha - dx * self.angular_sensitivity
        beta = float(
            np.clip(
                self.beta - dy * self.angular_sensitivity,
                self.lower_beta_limit,
                self.upper_beta_limit,
            )
        )
        return dataclasses.replace(self, alpha=alpha, beta=beta)

    def zoom(self, delta: float) -> "Camera":
        """Wheel zoom (camera.ts:207-214)."""
        radius = float(np.clip(self.radius + delta * self.wheel_precision, 0.1, self.far))
        return dataclasses.replace(self, radius=radius)

    def pan(self, dx: float, dy: float) -> "Camera":
        """Right-drag pan in camera plane (camera.ts:113-128)."""
        eye = np.asarray(self.position())
        fwd = np.asarray(self.target) - eye
        fl = np.linalg.norm(fwd)
        if fl < 1e-4:
            right, up = np.array([1.0, 0, 0]), np.array([0, 1.0, 0])
        else:
            fwd = fwd / fl
            right = np.cross([0.0, 1.0, 0.0], fwd)
            rl = np.linalg.norm(right)
            right = np.array([1.0, 0, 0]) if rl < 1e-4 else right / rl
            up = np.cross(fwd, right)
            ul = np.linalg.norm(up)
            up = np.array([0, 1.0, 0]) if ul < 1e-4 else up / ul
        dist = self.radius * self.pan_sensitivity
        target = np.asarray(self.target) + right * (-dx * dist) + up * (dy * dist)
        return dataclasses.replace(self, target=tuple(target))
