"""Orbit camera model.

Host-side mutable camera matching the reference view_camera
(Core/camera.{h,cpp}): yaw/pitch/radius orbit around a pan-able center,
thin-lens aperture + focal distance, FOV.y derived from FOV.x and aspect
(Core/camera.cpp:56-60).  Flattened per frame into the POD RenderCamera
consumed by ray generation (Core/camera.cpp:80-98).
"""

from __future__ import annotations

import math

import numpy as np

from pathtracerwithcuda_tpu.core.types import RenderCamera

TWO_PI = 2.0 * math.pi
HALF_PI = 0.5 * math.pi
MAX_APERTURE_RADIUS = 1.0  # reference Core/camera.h:11


class ViewCamera:
    def __init__(self):
        # defaults mirror view_camera::view_camera (Core/camera.cpp:3-14)
        self.center = np.zeros(3, np.float32)
        self.yaw = 0.0
        self.pitch = 0.3
        self.radius = 14.0
        self.aperture_radius = 0.0
        self.focal_distance = 14.0
        self.resolution = (640.0, 640.0)
        self.fov = [45.0, 45.0]

    # --- mutation (each clamped as the reference does, Core/camera.cpp:125-149)
    def modify_yaw(self, delta: float):
        self.yaw = (self.yaw + delta) % TWO_PI

    def modify_pitch(self, delta: float):
        self.pitch = float(np.clip(self.pitch + delta, -HALF_PI + 0.02, HALF_PI - 0.02))

    def modify_radius(self, scale: float):
        self.radius = float(np.clip(self.radius * (1.0 + scale), 0.02, 4000.0))
        self.focal_distance = float(np.clip(self.focal_distance, 0.0, self.radius))

    def modify_pan(self, x: float, y: float):
        up = np.array([0.0, 1.0, 0.0], np.float32)
        view = np.array(
            [
                -math.sin(self.yaw) * math.cos(self.pitch),
                -math.sin(self.pitch),
                -math.cos(self.yaw) * math.cos(self.pitch),
            ],
            np.float32,
        )
        horizontal = np.cross(view, up)
        horizontal /= np.linalg.norm(horizontal)
        up = np.cross(horizontal, view)
        up /= np.linalg.norm(up)
        self.center = self.center + up * y + horizontal * x

    def set_fov(self, fov_x: float):
        w, h = self.resolution
        self.fov = [
            fov_x,
            math.degrees(2.0 * math.atan(math.tan(math.radians(fov_x) * 0.5) * (h / w))),
        ]

    def set_resolution(self, width: float, height: float):
        self.resolution = (float(width), float(height))

    def set_aperture_radius(self, value: float):
        self.aperture_radius = float(np.clip(value, 0.0, MAX_APERTURE_RADIUS))

    def set_focal_distance(self, value: float):
        self.focal_distance = float(np.clip(value, 0.0, 2.0 * self.radius))

    @property
    def max_focal_distance(self) -> float:
        return 2.0 * self.radius

    # --- flatten
    def get_render_camera(self) -> RenderCamera:
        x = math.sin(self.yaw) * math.cos(self.pitch)
        y = math.sin(self.pitch)
        z = math.cos(self.yaw) * math.cos(self.pitch)
        to_camera = np.array([x, y, z], np.float32)
        eye = self.center + to_camera * self.radius
        view = -to_camera
        return RenderCamera.create(
            eye=eye,
            view=view,
            up=(0.0, 1.0, 0.0),
            width=self.resolution[0],
            height=self.resolution[1],
            fov_x_deg=self.fov[0],
            aperture_radius=self.aperture_radius,
            focal_distance=self.focal_distance,
        )
