"""Inverse rendering: recover material parameters from target images.

Implements the BASELINE.json config-5 workload: optimize material/texture
parameters of a full scene with pixels sharded over a device mesh and
parameter gradients psum all-reduced (the all-reduce is inserted by the
shard_map transpose of the replicated material table).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from pathtracerwithcuda_tpu.config import RenderConfig
from pathtracerwithcuda_tpu.core.types import MaterialTable, RenderCamera, SceneData
from pathtracerwithcuda_tpu.ops import rng
from pathtracerwithcuda_tpu.parallel.shard import distributed_trace


def make_train_step(scene: SceneData, camera: RenderCamera, config: RenderConfig,
                    mesh: Optional[Mesh] = None, optimizer=None,
                    learning_rate: float = 5e-2):
    """Returns (step_fn, opt_state0).

    step_fn(params: MaterialTable, opt_state, target (P,3), key, pass_index)
      -> (params, opt_state, loss)

    With a mesh, the forward/backward shard pixels over RAY_AXIS; material
    gradients are all-reduced by the shard_map transpose.  Without a mesh it
    is the plain single-device step.
    """
    optimizer = optimizer or optax.adam(learning_rate)

    # the MaterialTable carries int32 texture-id leaves; only the float
    # physical parameters are trainable
    FLOAT_FIELDS = (
        "diffuse", "emission", "specular", "roughness",
        "refraction_index", "extinction", "absorption", "reduced_scattering",
    )

    def _split(table: MaterialTable):
        return {f: getattr(table, f) for f in FLOAT_FIELDS}

    def _merge(table: MaterialTable, float_params: dict) -> MaterialTable:
        return table.replace(**float_params)

    def loss_fn(float_params, target, key):
        sc = scene.replace(materials=_merge(scene.materials, float_params))
        if mesh is not None:
            img = distributed_trace(sc, camera, config, key, mesh,
                                    differentiable=True)
        else:
            from pathtracerwithcuda_tpu.render.wavefront import trace_radiance

            img = trace_radiance(sc, camera, config, key, differentiable=True)
        return jnp.mean(jnp.square(img - target))

    _CLIPS = {
        "diffuse": (0.0, None), "emission": (0.0, None), "specular": (0.0, None),
        "roughness": (0.0, 1.0), "refraction_index": (1e-3, None),
        "extinction": (0.0, None), "absorption": (0.0, None),
        "reduced_scattering": (0.0, None),
    }

    @jax.jit
    def _step(float_params, opt_state, target, key, pass_index):
        k = rng.pass_key(key, pass_index)
        loss, grads = jax.value_and_grad(loss_fn)(float_params, target, k)
        updates, opt_state = optimizer.update(grads, opt_state, float_params)
        float_params = optax.apply_updates(float_params, updates)
        # keep physical quantities in their valid ranges
        float_params = {
            f: jnp.clip(v, *_CLIPS[f]) for f, v in float_params.items()
        }
        return float_params, opt_state, loss

    def step_fn(params: MaterialTable, opt_state, target, key, pass_index):
        float_params, opt_state, loss = _step(
            _split(params), opt_state, target, key, pass_index
        )
        return _merge(params, float_params), opt_state, loss

    return step_fn, optimizer.init(_split(scene.materials))


class InverseRenderer:
    """Convenience driver: render a target with true params, perturb, recover."""

    def __init__(self, scene: SceneData, camera: RenderCamera,
                 config: RenderConfig, mesh: Optional[Mesh] = None,
                 learning_rate: float = 5e-2, seed: int = 0):
        self.scene = scene
        self.camera = camera
        self.config = config
        self.mesh = mesh
        self.key = jax.random.PRNGKey(seed)
        self.step_fn, self.opt_state = make_train_step(
            scene, camera, config, mesh, learning_rate=learning_rate
        )

    def render_target(self, params: MaterialTable, spp: int = 4):
        sc = self.scene.replace(materials=params)
        out = jnp.zeros((self.config.pixel_count, 3), jnp.float32)
        for s in range(spp):
            k = rng.pass_key(jax.random.fold_in(self.key, 999), s)
            if self.mesh is not None:
                out = out + distributed_trace(sc, self.camera, self.config, k,
                                              self.mesh)
            else:
                from pathtracerwithcuda_tpu.render.wavefront import trace_radiance

                out = out + trace_radiance(sc, self.camera, self.config, k)
        return out / spp

    def fit(self, params: MaterialTable, target, steps: int = 50):
        losses = []
        for i in range(steps):
            params, self.opt_state, loss = self.step_fn(
                params, self.opt_state, target, self.key, i
            )
            losses.append(float(loss))
        return params, losses
