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


def init_params(scene: SceneData, trainable=("materials",)):
    """Trainable-parameter pytree for make_train_step.

    trainable=("materials",): the MaterialTable itself (back-compatible).
    Adding "texture" and/or "env" returns a dict
    {"materials": MaterialTable, "texture_data": (N,3), "env_faces": ...} —
    the north star's "material, texture, and emitter parameters" (emission
    is a material field; the environment faces are the scene's other
    emitter).
    """
    trainable = tuple(trainable)
    if trainable == ("materials",):
        return scene.materials
    p = {}
    if "materials" in trainable:
        p["materials"] = scene.materials
    if "texture" in trainable:
        p["texture_data"] = scene.textures.data
    if "env" in trainable:
        p["env_faces"] = scene.env_faces
    return p


def make_train_step(scene: SceneData, camera: RenderCamera, config: RenderConfig,
                    mesh: Optional[Mesh] = None, optimizer=None,
                    learning_rate: float = 5e-2, method: str = "scan",
                    trainable=("materials",)):
    """Returns (step_fn, opt_state0).

    step_fn(params, opt_state, target (P,3), key, pass_index)
      -> (params, opt_state, loss)

    `params` comes from init_params(scene, trainable): a MaterialTable for
    the default materials-only case, or a dict additionally carrying the
    texture atlas texels ("texture") and environment faces ("env") as
    trainable leaves.

    With a mesh, the forward/backward shard pixels over RAY_AXIS; material
    gradients are all-reduced by the shard_map transpose.  Without a mesh it
    is the plain single-device step.

    method:
      "scan"     — self-contained differentiable lax.scan; the BVH walk
                   re-runs inside the differentiated program (XLA gather
                   walk).  Mesh may include a SAMPLE_AXIS.
      "recorded" — PRODUCTION recipe: a forward-only pre-pass records
                   nearest-triangle ids through the fast Pallas host loop
                   (render.wavefront.record_tri_ids_host, per chip when
                   mesh is set), then value_and_grad runs the checkpointed
                   scan replay with tri_override — reverse mode never
                   touches a BVH walk.  Gradients are identical to "scan"
                   by construction (tests/test_grad.py,
                   tests/test_sharding.py).  Mesh must be ray-only.
    """
    optimizer = optimizer or optax.adam(learning_rate)
    if method not in ("scan", "recorded"):
        raise ValueError(f"unknown method {method!r}")
    trainable = tuple(trainable)
    as_table = trainable == ("materials",)

    # the MaterialTable carries int32 texture-id leaves; only the float
    # physical parameters are trainable
    FLOAT_FIELDS = (
        "diffuse", "emission", "specular", "roughness",
        "refraction_index", "extinction", "absorption", "reduced_scattering",
    )

    def _split(params):
        fp = {}
        mat = params if as_table else params.get("materials")
        if mat is not None:
            fp["materials"] = {f: getattr(mat, f) for f in FLOAT_FIELDS}
        if not as_table:
            for k in ("texture_data", "env_faces"):
                if k in params:
                    fp[k] = params[k]
        return fp

    def _scene_with(fp) -> SceneData:
        sc = scene
        if "materials" in fp:
            sc = sc.replace(
                materials=sc.materials.replace(**fp["materials"]))
        if "texture_data" in fp:
            sc = sc.replace(textures=sc.textures.replace(
                data=fp["texture_data"]))
        if "env_faces" in fp:
            sc = sc.replace(env_faces=fp["env_faces"])
        return sc

    def _merge_out(params, fp):
        if as_table:
            return params.replace(**fp["materials"])
        out = dict(params)
        if "materials" in fp:
            out["materials"] = params["materials"].replace(**fp["materials"])
        for k in ("texture_data", "env_faces"):
            if k in fp:
                out[k] = fp[k]
        return out

    def loss_fn(float_params, target, key, tri_ids=None):
        sc = _scene_with(float_params)
        if method == "recorded":
            from pathtracerwithcuda_tpu.render.wavefront import (
                trace_radiance_scan_tris,
                trace_radiance_scan_tris_sharded,
            )

            pixel_ids = jnp.arange(config.pixel_count, dtype=jnp.int32)
            if mesh is not None:
                img = trace_radiance_scan_tris_sharded(
                    sc, camera, config, key, pixel_ids, tri_ids, mesh)
            else:
                img = trace_radiance_scan_tris(sc, camera, config, key,
                                               pixel_ids, tri_ids)
        elif mesh is not None:
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

    @functools.partial(jax.jit, static_argnames=())
    def _step(float_params, opt_state, target, key, pass_index, tri_ids):
        k = rng.pass_key(key, pass_index)
        loss, grads = jax.value_and_grad(loss_fn)(float_params, target, k,
                                                  tri_ids)
        updates, opt_state = optimizer.update(grads, opt_state, float_params)
        float_params = optax.apply_updates(float_params, updates)
        # keep physical quantities in their valid ranges
        if "materials" in float_params:
            float_params["materials"] = {
                f: jnp.clip(v, *_CLIPS[f])
                for f, v in float_params["materials"].items()
            }
        if "texture_data" in float_params:  # LDR texel range, as loaded
            float_params["texture_data"] = jnp.clip(
                float_params["texture_data"], 0.0, 1.0)
        if "env_faces" in float_params:  # emitters: nonnegative radiance
            float_params["env_faces"] = jnp.maximum(
                float_params["env_faces"], 0.0)
        return float_params, opt_state, loss

    def step_fn(params, opt_state, target, key, pass_index):
        tri_ids = None
        fp = _split(params)
        if method == "recorded":
            from pathtracerwithcuda_tpu.render.wavefront import (
                record_tri_ids_host,
            )

            # the pre-pass advances the same trajectory as the replay (same
            # RNG keys, current params), so recording must use the params
            # being differentiated, not the build-time scene state
            sc = _scene_with(fp)
            tri_ids = record_tri_ids_host(
                sc, camera, config, rng.pass_key(key, pass_index), mesh=mesh)
        float_params, opt_state, loss = _step(
            fp, opt_state, target, key, pass_index, tri_ids
        )
        return _merge_out(params, float_params), opt_state, loss

    return step_fn, optimizer.init(_split(init_params(scene, trainable)))


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
