"""FPS camera: host-side numpy math producing device-ready matrices.

Mirrors the reference camera (reference: src/io/Camera.cpp:5-73,
include/app/state.h:130): yaw/pitch Euler basis, lookAt view matrix,
perspective projection with near=0.1 far=100, default pose
(0,2,8) yaw=-90 pitch=-10 fov=60.

Matrices are plain numpy float32 in the mathematical convention
clip = M @ [p, 1]; they are uploaded once per frame as tiny [4,4] arrays.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


def normalize(v: np.ndarray) -> np.ndarray:
    return v / max(float(np.linalg.norm(v)), 1e-12)


def look_at(eye: np.ndarray, center: np.ndarray, up: np.ndarray) -> np.ndarray:
    """Right-handed lookAt (same math as glm::lookAt)."""
    f = normalize(center - eye)
    s = normalize(np.cross(f, up))
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -float(np.dot(s, eye))
    m[1, 3] = -float(np.dot(u, eye))
    m[2, 3] = float(np.dot(f, eye))
    return m


def perspective(fov_y_deg: float, aspect: float, near: float = 0.1,
                far: float = 100.0) -> np.ndarray:
    """Right-handed perspective, depth in [-1,1] (same math as glm::perspective;
    reference uses near 0.1, far 100: src/io/Camera.cpp:72)."""
    t = math.tan(math.radians(fov_y_deg) * 0.5)
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = 1.0 / (aspect * t)
    m[1, 1] = 1.0 / t
    m[2, 2] = -(far + near) / (far - near)
    m[2, 3] = -(2.0 * far * near) / (far - near)
    m[3, 2] = -1.0
    return m


@dataclasses.dataclass
class Camera:
    """FPS camera with WASD+QE movement and mouse look.

    Defaults mirror AppState's camera (reference: include/app/state.h:130).
    """

    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 2.0, 8.0], np.float32))
    yaw: float = -90.0
    pitch: float = -10.0
    fov: float = 60.0
    aspect: float = 1920.0 / 1080.0
    movement_speed: float = 2.5     # reference: src/io/Camera.cpp:11
    mouse_sensitivity: float = 0.1  # reference: src/io/Camera.cpp:37
    world_up: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 1.0, 0.0], np.float32))

    @property
    def front(self) -> np.ndarray:
        cy, sy = math.cos(math.radians(self.yaw)), math.sin(math.radians(self.yaw))
        cp, sp = math.cos(math.radians(self.pitch)), math.sin(math.radians(self.pitch))
        return normalize(np.array([cy * cp, sp, sy * cp], np.float32))

    @property
    def right(self) -> np.ndarray:
        return normalize(np.cross(self.front, self.world_up))

    @property
    def up(self) -> np.ndarray:
        return normalize(np.cross(self.right, self.front))

    def view_matrix(self) -> np.ndarray:
        return look_at(self.position.astype(np.float32),
                       self.position + self.front, self.up)

    def projection_matrix(self) -> np.ndarray:
        return perspective(self.fov, self.aspect)

    def view_projection(self) -> np.ndarray:
        return (self.projection_matrix() @ self.view_matrix()).astype(np.float32)

    def basis(self):
        """(right, up, fwd, tan_half_fov) for primary-ray generation.

        The reference derives this from the view-matrix rows
        (reference: src/render/render.cpp:67-70); row extraction of lookAt
        gives back exactly (right, up, front).
        """
        v = self.view_matrix()
        right = normalize(v[0, :3])
        up = normalize(v[1, :3])
        fwd = -normalize(v[2, :3])
        return right, up, fwd, math.tan(math.radians(self.fov) * 0.5)

    def point_at(self, target) -> None:
        """Aim the camera at a world-space point (sets yaw/pitch)."""
        d = normalize(np.asarray(target, np.float32) - self.position)
        self.pitch = math.degrees(math.asin(float(np.clip(d[1], -1, 1))))
        self.yaw = math.degrees(math.atan2(float(d[2]), float(d[0])))

    # -- input-equivalent actions (reference: src/io/Camera.cpp:18-51) --

    def move(self, forward=0.0, strafe=0.0, vertical=0.0, dt=1.0 / 60.0):
        vel = self.movement_speed * dt
        self.position = (self.position + self.front * (forward * vel)
                         + self.right * (strafe * vel)
                         + self.world_up * (vertical * vel)).astype(np.float32)

    def look(self, dx: float, dy: float):
        self.yaw += dx * self.mouse_sensitivity
        self.pitch = float(np.clip(self.pitch + dy * self.mouse_sensitivity,
                                   -89.0, 89.0))

    def zoom(self, scroll: float):
        # scroll = FOV zoom, clamped to [20, 90] (reference: src/io/input.cpp:196-206)
        self.fov = float(np.clip(self.fov - scroll, 20.0, 90.0))
