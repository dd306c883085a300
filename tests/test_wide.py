"""8-wide BVH collapse + Pallas wide-traversal kernel (interpret mode).

Oracle: the XLA skip-link walk (ops/traversal.py), itself golden-tested
against the scalar NumPy oracle — same closest-hit contract as the
reference walk (Kernel/path_tracer_kernel.cu:85-161).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pathtracerwithcuda_tpu.ops.traversal_pallas as tp
from pathtracerwithcuda_tpu.bvh.wide import collapse_wide, validate_wide
from pathtracerwithcuda_tpu.ops import rng as rng_mod
from pathtracerwithcuda_tpu.ops.raygen import generate_rays
from pathtracerwithcuda_tpu.ops.traversal import traverse_bvh
from pathtracerwithcuda_tpu.render.wavefront import render_order
from pathtracerwithcuda_tpu.scene.build import build_scene_data
from pathtracerwithcuda_tpu.scene.examples import (
    flagship_camera,
    flagship_config,
    flagship_scene,
)


@pytest.fixture(scope="module")
def small_flagship():
    config = flagship_config(width=64, height=32, loop_mode="host")
    scene = build_scene_data(flagship_scene(seg_u=24, seg_v=20), config)
    return scene, config


def test_collapse_invariants(small_flagship):
    scene, _ = small_flagship
    nxt = np.asarray(scene.bvh_next)
    ts = np.asarray(scene.bvh_tri_start)
    tc = np.asarray(scene.bvh_tri_count)
    wide = collapse_wide(nxt, ts, tc)
    assert wide.num_wide > 0
    assert validate_wide(wide, nxt, ts, tc) == []
    # structure cache: same topology arrays -> same object
    from pathtracerwithcuda_tpu.ops.traversal_wide import wide_structure

    w1 = wide_structure(scene.bvh_next, scene.bvh_tri_start, scene.bvh_tri_count)
    w2 = wide_structure(scene.bvh_next, scene.bvh_tri_start, scene.bvh_tri_count)
    assert w1 is w2


def test_wide_kernel_matches_xla_walk(small_flagship, monkeypatch):
    scene, config = small_flagship
    monkeypatch.setattr(tp, "CHUNK_PACKETS", 2)
    from pathtracerwithcuda_tpu.ops.traversal_wide import traverse_bvh_wide

    camera = flagship_camera(64, 32)
    order, _ = render_order(64, 32)
    pids = jnp.asarray(order)
    key = rng_mod.pass_key(jax.random.PRNGKey(0), 0)
    u = rng_mod.raygen_uniforms(key, pids)
    o, d = generate_rays(camera, pids, u, config.use_anti_alias)

    ref_tri, ref_t = traverse_bvh(
        o, d, scene.bvh_min, scene.bvh_max, scene.bvh_next, scene.bvh_tri,
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        jnp.full((o.shape[0],), jnp.inf))
    got_tri, got_t = traverse_bvh_wide(
        o, d, scene.bvh_min, scene.bvh_max, scene.bvh_next,
        scene.bvh_tri_start, scene.bvh_tri_count,
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        leaf_k=scene.leaf_size, chains=2, interpret=True)

    np.testing.assert_array_equal(np.asarray(got_tri), np.asarray(ref_tri))
    finite = np.isfinite(np.asarray(ref_t))
    np.testing.assert_allclose(np.asarray(got_t)[finite],
                               np.asarray(ref_t)[finite], rtol=1e-5, atol=1e-5)


def test_wide_kernel_seed_bound_and_dead_lanes(small_flagship, monkeypatch):
    """Dead lanes (seed 0) return no hit; a finite seed bound prunes hits
    beyond it (the sphere-bound contract of the host loop)."""
    scene, config = small_flagship
    monkeypatch.setattr(tp, "CHUNK_PACKETS", 2)
    from pathtracerwithcuda_tpu.ops.traversal_wide import traverse_bvh_wide

    camera = flagship_camera(64, 32)
    order, _ = render_order(64, 32)
    pids = jnp.asarray(order)
    key = rng_mod.pass_key(jax.random.PRNGKey(0), 0)
    u = rng_mod.raygen_uniforms(key, pids)
    o, d = generate_rays(camera, pids, u, config.use_anti_alias)
    p = o.shape[0]

    ref_tri, ref_t = traverse_bvh(
        o, d, scene.bvh_min, scene.bvh_max, scene.bvh_next, scene.bvh_tri,
        scene.tri_v0, scene.tri_v1, scene.tri_v2, jnp.full((p,), jnp.inf))

    bound = jnp.where(jnp.arange(p) % 3 == 0, 0.0, jnp.inf)  # every 3rd dead
    got_tri, _ = traverse_bvh_wide(
        o, d, scene.bvh_min, scene.bvh_max, scene.bvh_next,
        scene.bvh_tri_start, scene.bvh_tri_count,
        scene.tri_v0, scene.tri_v1, scene.tri_v2, bound,
        leaf_k=scene.leaf_size, chains=2, interpret=True)
    got_tri = np.asarray(got_tri)
    dead = np.arange(p) % 3 == 0
    assert (got_tri[dead] == -1).all()
    np.testing.assert_array_equal(got_tri[~dead], np.asarray(ref_tri)[~dead])


def test_lbvh_rotation_rebuild_through_wide_kernel(monkeypatch):
    """The interactive-rotation path with the device builder (VERDICT r3
    weak #6): a rotation edit on an LBVH-configured session rebuilds through
    build_lbvh (K=1 Morton leaves), and the wide kernel — whose leaf-run
    packing must amortize over K=1 runs — traverses the rebuilt tree
    identically to the XLA walk.  Reference rotate→rebuild path:
    Core/triangle_mesh.cpp:335-426."""
    from pathtracerwithcuda_tpu.config import BvhBuildMethod
    from pathtracerwithcuda_tpu.ops.traversal_wide import traverse_bvh_wide
    from pathtracerwithcuda_tpu.render.session import RenderSession

    monkeypatch.setattr(tp, "CHUNK_PACKETS", 2)
    config = flagship_config(width=64, height=32, loop_mode="host",
                             bvh_build=BvhBuildMethod.LBVH)
    sess = RenderSession(flagship_scene(seg_u=24, seg_v=20), config)
    sess.set_mesh_rotate(2, (0.0, 30.0, 10.0))  # the torus
    scene = sess.scene
    assert scene.leaf_size == 1  # LBVH leaves are single triangles

    camera = flagship_camera(64, 32)
    order, _ = render_order(64, 32)
    pids = jnp.asarray(order)
    key = rng_mod.pass_key(jax.random.PRNGKey(2), 0)
    u = rng_mod.raygen_uniforms(key, pids)
    o, d = generate_rays(camera, pids, u, config.use_anti_alias)

    ref_tri, _ = traverse_bvh(
        o, d, scene.bvh_min, scene.bvh_max, scene.bvh_next, scene.bvh_tri,
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        jnp.full((o.shape[0],), jnp.inf))
    got_tri, _ = traverse_bvh_wide(
        o, d, scene.bvh_min, scene.bvh_max, scene.bvh_next,
        scene.bvh_tri_start, scene.bvh_tri_count,
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        leaf_k=scene.leaf_size, chains=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_tri), np.asarray(ref_tri))


def test_wide_kernel_after_transform_refit(monkeypatch):
    """Transform refits replace only bvh_min/max; the wide STRUCTURE cache
    must hit (topology unchanged) while the kernel tables pick up the new
    boxes — wide traversal of the refit scene must match the XLA walk."""
    from pathtracerwithcuda_tpu.ops.traversal_wide import (
        traverse_bvh_wide,
        wide_structure,
    )
    from pathtracerwithcuda_tpu.scene.build import apply_mesh_transform

    monkeypatch.setattr(tp, "CHUNK_PACKETS", 2)
    config = flagship_config(width=64, height=32, loop_mode="host")
    layouts = []
    scene = build_scene_data(flagship_scene(seg_u=24, seg_v=20), config,
                             layout_out=layouts)
    torus = layouts[2]  # the torus mesh
    s_before = wide_structure(scene.bvh_next, scene.bvh_tri_start,
                              scene.bvh_tri_count)
    scene2 = apply_mesh_transform(scene, torus, position=(0.6, 2.0, -0.4),
                                  scale=(1.3, 1.3, 1.3))
    s_after = wide_structure(scene2.bvh_next, scene2.bvh_tri_start,
                             scene2.bvh_tri_count)
    assert s_after is s_before  # topology arrays unchanged -> cache hit

    camera = flagship_camera(64, 32)
    order, _ = render_order(64, 32)
    pids = jnp.asarray(order)
    key = rng_mod.pass_key(jax.random.PRNGKey(1), 0)
    u = rng_mod.raygen_uniforms(key, pids)
    o, d = generate_rays(camera, pids, u, config.use_anti_alias)

    ref_tri, _ = traverse_bvh(
        o, d, scene2.bvh_min, scene2.bvh_max, scene2.bvh_next, scene2.bvh_tri,
        scene2.tri_v0, scene2.tri_v1, scene2.tri_v2,
        jnp.full((o.shape[0],), jnp.inf))
    got_tri, _ = traverse_bvh_wide(
        o, d, scene2.bvh_min, scene2.bvh_max, scene2.bvh_next,
        scene2.bvh_tri_start, scene2.bvh_tri_count,
        scene2.tri_v0, scene2.tri_v1, scene2.tri_v2,
        leaf_k=scene2.leaf_size, chains=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_tri), np.asarray(ref_tri))


def _many_quad_scene(n):
    """n separate single-quad meshes -> an n-root BVH forest (the reference
    builds one BVH per mesh and walks them sequentially,
    Kernel/path_tracer_kernel.cu:443-454; our concat forest keeps one root
    per mesh)."""
    from pathtracerwithcuda_tpu.core.materials import builtin_materials
    from pathtracerwithcuda_tpu.scene.build import HostMesh, HostScene
    from pathtracerwithcuda_tpu.scene.examples import torus_mesh

    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [mats["wall_white"]]
    host.meshes = [
        HostMesh.from_shapes(
            [torus_mesh(0.5, 0.2, seg_u=6, seg_v=4)], [0],
            (1.4 * (i % 3) - 1.4, 0.3 * i, 1.4 * (i // 3) - 1.4),
            (1, 1, 1), (0, 0, 0))
        for i in range(n)
    ]
    return host


@pytest.mark.parametrize("n_meshes", [9, 20])
def test_wide_many_mesh_roots_grouped(n_meshes, monkeypatch):
    """>8 mesh roots take the grouped-roots collapse (virtual slots whose
    boxes are row hulls, bvh/wide.py) — the round-4 crash path (VERDICT r4
    weak #4).  Wide traversal must match the XLA walk exactly."""
    from pathtracerwithcuda_tpu.ops.traversal_wide import traverse_bvh_wide

    monkeypatch.setattr(tp, "CHUNK_PACKETS", 2)
    config = flagship_config(width=64, height=32, loop_mode="host")
    scene = build_scene_data(_many_quad_scene(n_meshes), config)
    nxt = np.asarray(scene.bvh_next)
    roots, r = [], 0
    while r < nxt.shape[0]:
        roots.append(r)
        r = int(nxt[r])
    assert len(roots) == n_meshes
    wide = collapse_wide(nxt, np.asarray(scene.bvh_tri_start),
                         np.asarray(scene.bvh_tri_count))
    assert validate_wide(wide, nxt, scene.bvh_tri_start,
                         scene.bvh_tri_count) == []
    assert (wide.src <= -2).any()  # grouping actually happened

    camera = flagship_camera(64, 32)
    order, _ = render_order(64, 32)
    pids = jnp.asarray(order)
    key = rng_mod.pass_key(jax.random.PRNGKey(3), 0)
    u = rng_mod.raygen_uniforms(key, pids)
    o, d = generate_rays(camera, pids, u, config.use_anti_alias)

    ref_tri, _ = traverse_bvh(
        o, d, scene.bvh_min, scene.bvh_max, scene.bvh_next, scene.bvh_tri,
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        jnp.full((o.shape[0],), jnp.inf))
    got_tri, _ = traverse_bvh_wide(
        o, d, scene.bvh_min, scene.bvh_max, scene.bvh_next,
        scene.bvh_tri_start, scene.bvh_tri_count,
        scene.tri_v0, scene.tri_v1, scene.tri_v2,
        leaf_k=scene.leaf_size, chains=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_tri), np.asarray(ref_tri))


def test_wide_ok_falls_back_beyond_group_limit():
    """More roots than one grouping level covers (> arity^2): _wide_ok
    returns None (binary-kernel fallback) instead of crashing the
    production loop."""
    from pathtracerwithcuda_tpu.ops import traversal_wide as twd
    from pathtracerwithcuda_tpu.render.wavefront import _wide_ok

    config = flagship_config(width=64, height=32, loop_mode="host")
    scene = build_scene_data(_many_quad_scene(twd.ARITY**2 + 1), config)
    assert _wide_ok(scene, config) is None


def test_host_loop_renders_many_mesh_scene():
    """The production host loop renders a 9-mesh scene end-to-end (interpret
    packet kernel) and matches the fused while-loop image."""
    from pathtracerwithcuda_tpu.render import wavefront

    config = flagship_config(width=64, height=32, loop_mode="host",
                             spp_per_pass=1, max_tracer_depth=3,
                             pallas_mode="interpret")
    scene = build_scene_data(_many_quad_scene(9), config)
    camera = flagship_camera(64, 32)
    key = jax.random.PRNGKey(7)
    accum_host = wavefront.render_pass_host(
        scene, camera, config, jnp.zeros((64 * 32, 3)), 0, key)
    config_w = flagship_config(width=64, height=32, loop_mode="while",
                               spp_per_pass=1, max_tracer_depth=3,
                               pallas_mode="off")
    accum_while = wavefront.render_pass(
        scene, camera, config_w, jnp.zeros((64 * 32, 3)), 0, key)
    np.testing.assert_allclose(np.asarray(accum_host),
                               np.asarray(accum_while), rtol=2e-4, atol=2e-4)
