"""Cameras: view/projection matrices and orbit / first-person controls.

Parity with reference:
- `CameraTrait { view(), projection(aspect) }` — reference `src/app.rs:1236-1244`
  (`Mat4::look_at_rh` / `Mat4::perspective_rh`, i.e. glam/wgpu conventions:
  right-handed, camera looks down -Z, NDC z in [0, 1]).
- `CameraOrbitControl` — reference `src/app.rs:1208-1244`.
- First-person camera (`gs::Camera`) with pos/yaw/pitch — reference
  `src/app.rs:1247-1291` usage and `src/tab/scene.rs:1357-1458`.
- Orbit <-> first-person conversions preserving pose — reference
  `src/app.rs:1293-1327`.
- Defaults (orbit at origin, pos -Z, z 0.1..1e4, fov 60 deg, speed 1,
  sensitivity 0.5) — reference `src/app.rs:1186-1200`.

All matrix math is plain numpy (host-side, tiny); matrices are handed to the
jitted render step as (4,4) f32 arrays. Column-vector convention:
``p_clip = P @ V @ M @ p``.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

Vec3 = np.ndarray


def look_at_rh(eye: Vec3, center: Vec3, up: Vec3) -> np.ndarray:
    """Right-handed look-at view matrix (glam `Mat4::look_at_rh` semantics)."""
    eye = np.asarray(eye, np.float32)
    center = np.asarray(center, np.float32)
    up = np.asarray(up, np.float32)
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def perspective_rh(fov_y: float, aspect: float, z_near: float, z_far: float) -> np.ndarray:
    """Right-handed perspective, depth 0..1 (glam `Mat4::perspective_rh`)."""
    h = 1.0 / math.tan(0.5 * fov_y)
    w = h / aspect
    r = z_far / (z_near - z_far)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = w
    m[1, 1] = h
    m[2, 2] = r
    m[2, 3] = r * z_near
    m[3, 2] = -1.0
    return m


class CameraTrait:
    """Anything that can produce view/projection matrices.

    Mirror of the engine crate's `CameraTrait` (reference `src/app.rs:1236-1244`).
    """

    def view(self) -> np.ndarray:
        raise NotImplementedError

    def projection(self, aspect: float) -> np.ndarray:
        raise NotImplementedError

    @property
    def pos(self) -> Vec3:
        raise NotImplementedError


@dataclasses.dataclass
class CameraOrbitControl(CameraTrait):
    """Orbit camera: position orbits a target point. Ref `src/app.rs:1208-1244`."""

    target: Vec3
    _pos: Vec3
    z_near: float = 0.1
    z_far: float = 1e4
    vertical_fov: float = math.radians(60.0)

    def __init__(self, target=(0, 0, 0), pos=(0, 0, -1), z=(0.1, 1e4), vertical_fov=math.radians(60.0)):
        self.target = np.asarray(target, np.float32)
        self._pos = np.asarray(pos, np.float32)
        self.z_near, self.z_far = z
        self.vertical_fov = vertical_fov

    @property
    def pos(self) -> Vec3:
        return self._pos

    @pos.setter
    def pos(self, v) -> None:
        self._pos = np.asarray(v, np.float32)

    def view(self) -> np.ndarray:
        return look_at_rh(self._pos, self.target, np.array([0, 1, 0], np.float32))

    def projection(self, aspect: float) -> np.ndarray:
        return perspective_rh(self.vertical_fov, aspect, self.z_near, self.z_far)

    # --- interactions (reference `src/tab/scene.rs:1460-1562`) ---

    def arm(self) -> Vec3:
        return self._pos - self.target

    def orbit_by(self, d_yaw: float, d_pitch: float) -> None:
        """Rotate position around target (horizontal yaw, clamped pitch)."""
        arm = self.arm()
        r = float(np.linalg.norm(arm))
        if r == 0.0:
            return
        yaw = math.atan2(arm[0], arm[2])
        pitch = math.asin(np.clip(arm[1] / r, -1.0, 1.0))
        yaw += d_yaw
        pitch = float(np.clip(pitch + d_pitch, -math.pi / 2 + 1e-3, math.pi / 2 - 1e-3))
        self._pos = self.target + r * np.array(
            [math.cos(pitch) * math.sin(yaw), math.sin(pitch), math.cos(pitch) * math.cos(yaw)],
            np.float32,
        )

    def zoom_by(self, factor: float) -> None:
        arm = self.arm()
        r = float(np.linalg.norm(arm))
        new_r = float(np.clip(r * factor, self.z_near, self.z_far))
        if r > 0:
            self._pos = self.target + arm * (new_r / r)

    def pan_by(self, delta_world: Vec3) -> None:
        """Translate both target and position (right/up-scaled pan)."""
        d = np.asarray(delta_world, np.float32)
        self.target = self.target + d
        self._pos = self._pos + d


@dataclasses.dataclass
class CameraFirstPersonControl(CameraTrait):
    """First-person camera with yaw/pitch. Mirror of crate `gs::Camera`
    (reference `src/app.rs:1247,1293-1327`, `src/tab/scene.rs:1357-1458`)."""

    _pos: Vec3
    yaw: float = 0.0
    pitch: float = 0.0
    z_near: float = 0.1
    z_far: float = 1e4
    vertical_fov: float = math.radians(60.0)

    def __init__(self, z=(0.1, 1e4), vertical_fov=math.radians(60.0)):
        self._pos = np.zeros(3, np.float32)
        self.yaw = 0.0
        self.pitch = 0.0
        self.z_near, self.z_far = z
        self.vertical_fov = vertical_fov

    @property
    def pos(self) -> Vec3:
        return self._pos

    @pos.setter
    def pos(self, v) -> None:
        self._pos = np.asarray(v, np.float32)

    def get_forward(self) -> Vec3:
        cp = math.cos(self.pitch)
        return np.array(
            [cp * math.sin(self.yaw), math.sin(self.pitch), cp * math.cos(self.yaw)],
            np.float32,
        )

    def get_right(self) -> Vec3:
        f = self.get_forward()
        r = np.cross(f, np.array([0, 1, 0], np.float32))
        n = np.linalg.norm(r)
        return r / n if n > 0 else np.array([1, 0, 0], np.float32)

    def yaw_by(self, d: float) -> None:
        self.yaw = (self.yaw + d) % (2 * math.pi)

    def pitch_by(self, d: float) -> None:
        self.pitch = float(np.clip(self.pitch + d, -math.pi / 2 + 1e-3, math.pi / 2 - 1e-3))

    def view(self) -> np.ndarray:
        return look_at_rh(self._pos, self._pos + self.get_forward(), np.array([0, 1, 0], np.float32))

    def projection(self, aspect: float) -> np.ndarray:
        return perspective_rh(self.vertical_fov, aspect, self.z_near, self.z_far)


def to_first_person(control: CameraTrait) -> CameraFirstPersonControl:
    """Orbit -> first-person preserving pose. Ref `src/app.rs:1293-1311`."""
    if isinstance(control, CameraFirstPersonControl):
        return control
    assert isinstance(control, CameraOrbitControl)
    direction = control.target - control.pos
    direction = direction / np.linalg.norm(direction)
    fp = CameraFirstPersonControl(z=(control.z_near, control.z_far), vertical_fov=control.vertical_fov)
    fp.pos = control.pos.copy()
    fp.yaw = math.atan2(direction[0], direction[2])
    fp.pitch = math.asin(float(np.clip(direction[1], -1, 1)))
    return fp


def to_orbit(control: CameraTrait, arm_length: float) -> CameraOrbitControl:
    """First-person -> orbit with given arm length. Ref `src/app.rs:1313-1327`."""
    if isinstance(control, CameraOrbitControl):
        return control
    assert isinstance(control, CameraFirstPersonControl)
    target = control.pos + control.get_forward() * arm_length
    orbit = CameraOrbitControl(
        target=target, pos=control.pos.copy(), z=(control.z_near, control.z_far),
        vertical_fov=control.vertical_fov,
    )
    return orbit


@dataclasses.dataclass
class Camera:
    """Session camera = control + speed/sensitivity. Ref `src/app.rs:1173-1200`."""

    control: CameraTrait
    speed: float = 1.0
    sensitivity: float = 0.5

    @staticmethod
    def default() -> "Camera":
        return Camera(
            control=CameraOrbitControl(
                target=(0, 0, 0), pos=(0, 0, -1), z=(0.1, 1e4), vertical_fov=math.radians(60.0)
            )
        )
