"""Environment (infinite light) interface.

TPU-native equivalent of /root/reference/src/base/environment.h:36-49:
`evaluate(wi)` / `sample(p, u)` with a world rotation transform. Environments
compile their own device arrays (radiance grid + alias tables) into
arrays["environment"]; the light sampler treats the environment as a
pseudo-light with selection tag ~0u (light_sampler.h:22-26).
"""

from __future__ import annotations

import numpy as np

from ..scene.scene import SceneNode


class Environment(SceneNode):
    def __init__(self, scene, desc):
        super().__init__(scene, desc)
        self.transform = scene.load_transform(desc.node("transform"))
        self.scale = desc.float("scale", 1.0)

    @property
    def is_null(self) -> bool:
        return False

    def rotation(self, time=0.0) -> np.ndarray:
        if self.transform is None:
            return np.eye(3, dtype=np.float32)
        m = self.transform.matrix(time)[:3, :3]
        return np.asarray(m, np.float32)

    def compile(self, compiler):
        raise NotImplementedError

    def device_arrays(self) -> dict:
        return {}

    # --- device-side ---
    def evaluate(self, ctx, wi_world, swl):
        """-> {L: (..., C), pdf: (...,)} (pdf of sample() for MIS)."""
        raise NotImplementedError

    def sample(self, ctx, p, u, swl):
        """-> {wi: (..., 3), L: (..., C), pdf: (...,)}."""
        raise NotImplementedError
