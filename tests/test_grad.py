"""Gradient correctness: autodiff vs finite differences, sharded vs single."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtracerwithcuda_tpu.config import RenderConfig
from pathtracerwithcuda_tpu.core.materials import builtin_materials
from pathtracerwithcuda_tpu.core.types import RenderCamera
from pathtracerwithcuda_tpu.ops import rng
from pathtracerwithcuda_tpu.parallel import make_render_mesh
from pathtracerwithcuda_tpu.parallel.shard import distributed_trace
from pathtracerwithcuda_tpu.render.wavefront import trace_radiance
from pathtracerwithcuda_tpu.scene.build import HostScene, build_scene_data


def _setup(width=12, height=12, depth=3):
    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [mats["wall_white"], mats["light"], mats["red"]]
    host.sphere_centers = np.array(
        [[0, -1001.0, 0], [0, 3.0, 0], [0, 0, 0]], np.float32
    )
    host.sphere_radii = np.array([1000.0, 1.0, 1.0], np.float32)
    host.sphere_material_ids = np.array([0, 1, 2], np.int32)
    config = RenderConfig(width=width, height=height, max_tracer_depth=depth,
                          use_sky_box=False, use_sky=True)
    scene = build_scene_data(host, config)
    cam = RenderCamera.create(
        eye=(0, 1, 8.0), view=(0, 0, -1.0), up=(0, 1, 0),
        width=width, height=height, fov_x_deg=45.0, focal_distance=8.0,
    )
    key = rng.pass_key(jax.random.PRNGKey(0), 0)
    return scene, cam, config, key


def _mean_loss(scene, cam, config, key):
    def loss(mats_table):
        r = trace_radiance(scene.replace(materials=mats_table), cam, config, key,
                           differentiable=True)
        return jnp.mean(r)

    return loss


def test_diffuse_grad_matches_finite_difference():
    scene, cam, config, key = _setup()
    loss = _mean_loss(scene, cam, config, key)
    g = jax.grad(lambda d: loss(scene.materials.replace(diffuse=d)))(
        scene.materials.diffuse
    )
    d0 = scene.materials.diffuse
    eps = 1e-3
    for idx in [(2, 0), (0, 1)]:
        fd = (
            loss(scene.materials.replace(diffuse=d0.at[idx].add(eps)))
            - loss(scene.materials.replace(diffuse=d0.at[idx].add(-eps)))
        ) / (2 * eps)
        assert np.isclose(float(fd), float(g[idx]), rtol=2e-2, atol=1e-5), (
            idx, float(fd), float(g[idx])
        )


def test_emission_grad_matches_finite_difference():
    scene, cam, config, key = _setup()
    loss = _mean_loss(scene, cam, config, key)
    g = jax.grad(lambda e: loss(scene.materials.replace(emission=e)))(
        scene.materials.emission
    )
    e0 = scene.materials.emission
    eps = 1e-2
    idx = (1, 0)  # light red channel
    fd = (
        loss(scene.materials.replace(emission=e0.at[idx].add(eps)))
        - loss(scene.materials.replace(emission=e0.at[idx].add(-eps)))
    ) / (2 * eps)
    # emission enters linearly → FD is exact up to float noise
    assert np.isclose(float(fd), float(g[idx]), rtol=1e-2, atol=1e-6)
    assert float(g[idx]) > 0


def test_env_faces_grad():
    """Pixel gradients flow into the environment map (emitter params)."""
    scene, cam, config, key = _setup()
    config = config.replace(use_sky_box=True, use_sky=False)
    faces = jnp.full((6, 4, 4, 3), 0.5, jnp.float32)
    scene = scene.replace(env_faces=faces)
    scene2 = build_scene_data  # noqa: F841  (no rebuild needed)

    def loss(f):
        r = trace_radiance(scene.replace(env_faces=f), cam, config, key,
                           differentiable=True)
        return jnp.mean(r)

    g = jax.grad(loss)(faces)
    assert float(jnp.abs(g).sum()) > 0


def test_recorded_tris_grad_matches_scan():
    """The fast fwd+bwd path (record_tri_ids_host pre-pass + checkpointed
    scan replay, VERDICT r3 #1) must produce the same value AND gradient as
    the self-contained differentiable scan that re-walks the BVH inside the
    differentiated program — traversal ids are detached either way."""
    from pathtracerwithcuda_tpu.render.wavefront import (
        record_tri_ids_host,
        trace_radiance_scan_tris,
    )
    from pathtracerwithcuda_tpu.scene.build import HostMesh
    from pathtracerwithcuda_tpu.scene.examples import torus_mesh

    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [mats["wall_white"], mats["light"], mats["red"]]
    host.sphere_centers = np.array([[0, 4.0, 0]], np.float32)
    host.sphere_radii = np.array([1.5], np.float32)
    host.sphere_material_ids = np.array([1], np.int32)
    shape = torus_mesh(seg_u=24, seg_v=12)  # BVH path
    host.meshes = [HostMesh.from_shapes([shape], [2], (0.0, 0.0, 0.0),
                                        (1.2, 1.2, 1.2), (0, 0, 0))]
    config = RenderConfig(width=12, height=10, max_tracer_depth=3,
                          use_sky_box=False, use_sky=True)
    scene = build_scene_data(host, config)
    cam = RenderCamera.create(
        eye=(0, 1, 8.0), view=(0, 0, -1.0), up=(0, 1, 0),
        width=config.width, height=config.height, fov_x_deg=45.0,
        focal_distance=8.0,
    )
    key = rng.pass_key(jax.random.PRNGKey(0), 0)
    pids = jnp.arange(config.pixel_count, dtype=jnp.int32)

    tri_ids = record_tri_ids_host(scene, cam, config, key, pids)
    assert tri_ids.shape == (config.max_tracer_depth, config.pixel_count)
    assert int((tri_ids >= 0).sum()) > 0  # the torus is actually hit

    def loss_fast(d):
        sc = scene.replace(materials=scene.materials.replace(diffuse=d))
        return jnp.mean(trace_radiance_scan_tris(sc, cam, config, key, pids,
                                                 tri_ids))

    def loss_scan(d):
        sc = scene.replace(materials=scene.materials.replace(diffuse=d))
        return jnp.mean(trace_radiance(sc, cam, config, key, pids,
                                       differentiable=True))

    v_fast, g_fast = jax.value_and_grad(loss_fast)(scene.materials.diffuse)
    v_scan, g_scan = jax.value_and_grad(loss_scan)(scene.materials.diffuse)
    assert np.isclose(float(v_fast), float(v_scan), rtol=1e-5)
    assert np.allclose(np.asarray(g_fast), np.asarray(g_scan),
                       rtol=1e-4, atol=1e-7)

    # same equivalence with Russian roulette on: the pre-pass (production
    # host loop) and the replay must consume identical STAGE_RR streams
    cfg_rr = config.replace(russian_roulette=True, rr_start_depth=1)
    tri_rr = record_tri_ids_host(scene, cam, cfg_rr, key, pids)

    def loss_fast_rr(d):
        sc = scene.replace(materials=scene.materials.replace(diffuse=d))
        return jnp.mean(trace_radiance_scan_tris(sc, cam, cfg_rr, key, pids,
                                                 tri_rr))

    def loss_scan_rr(d):
        sc = scene.replace(materials=scene.materials.replace(diffuse=d))
        return jnp.mean(trace_radiance(sc, cam, cfg_rr, key, pids,
                                       differentiable=True))

    v_f, g_f = jax.value_and_grad(loss_fast_rr)(scene.materials.diffuse)
    v_s, g_s = jax.value_and_grad(loss_scan_rr)(scene.materials.diffuse)
    assert np.isclose(float(v_f), float(v_s), rtol=1e-4)
    assert np.allclose(np.asarray(g_f), np.asarray(g_s),
                       rtol=1e-3, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_grad_matches_single():
    scene, cam, config, key = _setup(width=16, height=8)
    mesh = make_render_mesh(8)

    def loss_single(d):
        r = trace_radiance(scene.replace(materials=scene.materials.replace(diffuse=d)),
                           cam, config, key, differentiable=True)
        return jnp.mean(r)

    def loss_sharded(d):
        r = distributed_trace(
            scene.replace(materials=scene.materials.replace(diffuse=d)),
            cam, config, key, mesh, differentiable=True,
        )
        return jnp.mean(r)

    g1 = np.asarray(jax.grad(loss_single)(scene.materials.diffuse))
    g8 = np.asarray(jax.grad(loss_sharded)(scene.materials.diffuse))
    assert np.allclose(g1, g8, rtol=1e-5, atol=1e-7)


def test_inverse_rendering_recovers_diffuse():
    """Config-5 class smoke test: recover a perturbed diffuse color.

    Deterministic variant: target and every optimization step use the same
    sample key, so the only residual is the parameter error (the stochastic
    multi-key path is exercised by the flagship demo in apps/)."""
    from pathtracerwithcuda_tpu.diff.inverse import make_train_step
    from pathtracerwithcuda_tpu.render.wavefront import trace_radiance

    scene, cam, config, key = _setup(width=10, height=10, depth=2)
    true_params = scene.materials
    target = trace_radiance(scene, cam, config, rng.pass_key(key, 0))

    step_fn, opt_state = make_train_step(scene, cam, config, learning_rate=0.05)
    params = true_params.replace(
        diffuse=true_params.diffuse.at[2].set(jnp.asarray([0.2, 0.8, 0.2]))
    )
    losses = []
    for _ in range(60):
        params, opt_state, loss = step_fn(params, opt_state, target, key, 0)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])
    assert np.allclose(
        np.asarray(params.diffuse[2]), np.asarray(true_params.diffuse[2]), atol=0.15
    )


def test_texture_and_env_recovery_train_step():
    """North-star 'material, texture, and emitter parameters' (VERDICT r4
    next #6): make_train_step(trainable=("materials","texture","env"))
    optimizes texture atlas texels — a perturbed checker block moves back
    toward the true texels — and env faces stay valid trainable leaves."""
    from pathtracerwithcuda_tpu.core.types import RenderCamera
    from pathtracerwithcuda_tpu.diff.inverse import init_params, make_train_step
    from pathtracerwithcuda_tpu.scene.build import HostMesh
    from pathtracerwithcuda_tpu.scene.examples import (
        _quad,
        checker_texture,
        gradient_env,
    )

    mats = builtin_materials()
    host = HostScene.empty()
    floor = dict(mats["wall_white"])
    floor["diffuse_texture_id"] = 0
    host.materials = [floor, mats["light"]]
    host.meshes = [HostMesh.from_shapes([_quad(0.0, 6.0)], [0],
                                        (0, 0, 0), (1, 1, 1), (0, 0, 0))]
    host.sphere_centers = np.array([[0.0, 6.0, 0.0]], np.float32)
    host.sphere_radii = np.array([2.0], np.float32)
    host.sphere_material_ids = np.array([1], np.int32)
    host.textures = [checker_texture(16)]
    host.env_faces = gradient_env(8)
    config = RenderConfig(width=24, height=24, max_tracer_depth=2,
                          use_sky_box=True, use_sky=False)
    scene = build_scene_data(host, config)
    cam = RenderCamera.create(
        eye=(0, 4.0, 7.0), view=(0, -0.45, -0.89), up=(0, 1, 0),
        width=24, height=24, fov_x_deg=45.0, focal_distance=8.0,
    )
    key = jax.random.PRNGKey(3)
    target = trace_radiance(scene, cam, config, rng.pass_key(key, 0))

    # texture-only training isolates texel recovery (training materials
    # jointly lets the optimizer compensate a texel block with a global
    # diffuse shift — unidentifiable in a 40-step test)
    true_params = init_params(scene, ("texture",))
    true_tex = np.asarray(true_params["texture_data"])

    # perturb a block of texels (rows 40:120 of the 16x16 checker)
    perturbed = dict(true_params)
    perturbed["texture_data"] = true_params["texture_data"].at[40:120].set(
        jnp.asarray([0.15, 0.65, 0.15]))
    err0 = float(np.abs(np.asarray(perturbed["texture_data"]) - true_tex).mean())

    step_fn, opt_state = make_train_step(
        scene, cam, config, learning_rate=0.08, trainable=("texture",))
    params = perturbed
    losses = []
    for i in range(40):
        params, opt_state, loss = step_fn(params, opt_state, target, key, 0)
        losses.append(float(loss))
    err1 = float(np.abs(np.asarray(params["texture_data"]) - true_tex).mean())
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    assert err1 < err0 * 0.6, (err0, err1)
    # texel range constraint held
    tex = np.asarray(params["texture_data"])
    assert tex.min() >= 0.0 and tex.max() <= 1.0

    # the full material+texture+emitter parameter set runs a step end-to-end
    full = init_params(scene, ("materials", "texture", "env"))
    step_full, opt_full = make_train_step(
        scene, cam, config, learning_rate=0.05,
        trainable=("materials", "texture", "env"))
    full2, _, loss_full = step_full(full, opt_full, target, key, 0)
    assert np.isfinite(float(loss_full))
    assert full2["env_faces"].shape == scene.env_faces.shape
