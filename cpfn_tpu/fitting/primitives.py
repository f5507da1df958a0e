"""NumPy primitive geometry classes: construction, areas, and point samplers.

Host-side counterparts of the fitted parameters (cf. `SPFN/primitives.py`).
Used for dataset parsing (HDF5 `meta` dicts -> primitive objects), JSON export
of predictions, and as synthetic-data generators for tests and benchmarks.
"""

from __future__ import annotations

import numpy as np


def normalized(v: np.ndarray, epsilon: float = 1e-12) -> np.ndarray:
    return v / (np.linalg.norm(v) + epsilon)


def random_unit_vector(rng: np.random.RandomState, dims: int = 3) -> np.ndarray:
    return normalized(rng.randn(dims))


class Plane:
    """Finite plane patch {p : n.p = c}, bounded by x/y ranges about center."""

    @staticmethod
    def get_primitive_name() -> str:
        return "plane"

    def __init__(
        self,
        n,
        c,
        center=None,
        x_axis=None,
        y_axis=None,
        x_range=(-1.0, 1.0),
        y_range=(-1.0, 1.0),
        epsilon=1e-12,
        rng=None,
    ):
        n = np.asarray(n, dtype=float)
        if center is None:
            center = n * c
        self.n = n / (np.linalg.norm(n) + epsilon)
        self.c = float(c)
        self.center = np.asarray(center, dtype=float)
        self.x_range = list(x_range)
        self.y_range = list(y_range)
        if x_axis is None or y_axis is None:
            rng = rng or np.random
            tmp = normalized(rng.randn(3))
            self.x_axis = normalized(np.cross(tmp, self.n))
            self.y_axis = normalized(np.cross(self.n, self.x_axis))
        else:
            self.x_axis = np.asarray(x_axis, dtype=float)
            self.y_axis = np.asarray(y_axis, dtype=float)

    def get_area(self) -> float:
        return (
            (self.x_range[1] - self.x_range[0])
            * (self.y_range[1] - self.y_range[0])
            * np.linalg.norm(np.cross(self.x_axis, self.y_axis))
        )

    def distance_to(self, p) -> float:
        return abs(float(np.dot(self.n, p)) - self.c)

    def sample_points(self, n_points: int, rng=None, noise_radius: float = 0.0):
        """Returns (points [n,3], normals [n,3])."""
        rng = rng or np.random
        x = rng.uniform(*self.x_range, size=(n_points, 1))
        y = rng.uniform(*self.y_range, size=(n_points, 1))
        pts = self.center + x * self.x_axis + y * self.y_axis
        if noise_radius > 0:
            dirs = rng.randn(n_points, 3)
            dirs /= np.linalg.norm(dirs, axis=1, keepdims=True) + 1e-12
            pts = pts + rng.uniform(0, noise_radius, size=(n_points, 1)) * dirs
        normals = np.tile(self.n, (n_points, 1))
        return pts, normals


class Sphere:
    @staticmethod
    def get_primitive_name() -> str:
        return "sphere"

    def __init__(self, center, radius):
        self.center = np.asarray(center, dtype=float)
        self.radius = float(radius)

    def get_area(self) -> float:
        return 4.0 * np.pi * self.radius**2

    def sample_points(self, n_points: int, rng=None):
        rng = rng or np.random
        n = rng.randn(n_points, 3)
        n /= np.linalg.norm(n, axis=1, keepdims=True) + 1e-12
        return self.center + self.radius * n, n


class Cylinder:
    @staticmethod
    def get_primitive_name() -> str:
        return "cylinder"

    def __init__(self, center, radius, axis, height=10.0, rng=None):
        self.center = np.asarray(center, dtype=float)
        self.radius = float(radius)
        self.axis = np.asarray(axis, dtype=float)
        self.height = float(height)
        rng = rng or np.random
        tmp = normalized(rng.randn(3))
        self.x_axis = normalized(np.cross(tmp, self.axis))
        self.y_axis = normalized(np.cross(self.axis, self.x_axis))

    def get_area(self) -> float:
        return 2.0 * np.pi * self.radius * self.height

    def sample_points(self, n_points: int, rng=None):
        rng = rng or np.random
        ang = rng.uniform(0, 2 * np.pi, size=(n_points, 1))
        n = np.cos(ang) * self.x_axis + np.sin(ang) * self.y_axis
        z = rng.uniform(-self.height / 2, self.height / 2, size=(n_points, 1))
        pts = self.center + z * self.axis + self.radius * n
        return pts, n


class Cone:
    @staticmethod
    def get_primitive_name() -> str:
        return "cone"

    def __init__(self, apex, axis, half_angle, z_min=0.0, z_max=10.0):
        self.apex = np.asarray(apex, dtype=float)
        self.axis = normalized(np.asarray(axis, dtype=float))
        self.half_angle = float(half_angle)
        self.z_min = float(z_min)
        self.z_max = float(z_max)

    def get_area(self) -> float:
        # lateral surface between z_min and z_max along the axis
        s = np.tan(self.half_angle)
        r1, r2 = self.z_min * s, self.z_max * s
        slant = (self.z_max - self.z_min) / max(np.cos(self.half_angle), 1e-12)
        return np.pi * (r1 + r2) * slant

    def sample_points(self, n_points: int, rng=None):
        rng = rng or np.random
        tmp = normalized(rng.randn(3))
        x_axis = normalized(np.cross(tmp, self.axis))
        y_axis = normalized(np.cross(self.axis, x_axis))
        ang = rng.uniform(0, 2 * np.pi, size=(n_points, 1))
        radial = np.cos(ang) * x_axis + np.sin(ang) * y_axis
        z = rng.uniform(self.z_min, self.z_max, size=(n_points, 1))
        r = z * np.tan(self.half_angle)
        pts = self.apex + z * self.axis + r * radial
        # outward surface normal: cos(a)*radial - sin(a)*axis
        normals = np.cos(self.half_angle) * radial - np.sin(
            self.half_angle
        ) * self.axis
        return pts, normals


class Box:
    """Oriented box, decomposable into six plane patches."""

    def __init__(self, center, axes, halflengths):
        self.center = np.asarray(center, dtype=float)
        self.axes = [np.asarray(a, dtype=float) for a in axes]
        self.halflengths = list(halflengths)

    def get_six_planes(self):
        result = []
        for i, axis in enumerate(self.axes):
            for sgn in (-1, 1):
                n = sgn * axis
                center = self.center + self.halflengths[i] * n
                c = float(np.dot(n, center))
                j, k = (i + 1) % 3, (i + 2) % 3
                result.append(
                    Plane(
                        n,
                        c,
                        center=center,
                        x_axis=self.axes[j],
                        y_axis=self.axes[k],
                        x_range=[-self.halflengths[j], self.halflengths[j]],
                        y_range=[-self.halflengths[k], self.halflengths[k]],
                    )
                )
        return result
