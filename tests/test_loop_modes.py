"""All bounce-loop compositions must produce identical radiance."""

import jax
import jax.numpy as jnp
import numpy as np

from pathtracerwithcuda_tpu.config import RenderConfig
from pathtracerwithcuda_tpu.core.materials import builtin_materials
from pathtracerwithcuda_tpu.core.types import RenderCamera
from pathtracerwithcuda_tpu.ops import rng
from pathtracerwithcuda_tpu.render.wavefront import (
    render_pass,
    render_pass_host,
    trace_radiance,
    trace_radiance_host,
)
from pathtracerwithcuda_tpu.scene.build import HostScene, build_scene_data


def _setup(loop_mode="while"):
    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [mats["wall_white"], mats["light"], mats["glass"]]
    host.sphere_centers = np.array(
        [[0, -1001.0, 0], [0, 4.0, 0], [0.5, 0, 0]], np.float32
    )
    host.sphere_radii = np.array([1000.0, 1.5, 0.8], np.float32)
    host.sphere_material_ids = np.array([0, 1, 2], np.int32)
    config = RenderConfig(width=16, height=16, max_tracer_depth=4,
                          use_sky_box=False, use_sky=True, loop_mode=loop_mode)
    scene = build_scene_data(host, config)
    cam = RenderCamera.create(
        eye=(0, 1, 8.0), view=(0, 0, -1.0), up=(0, 1, 0),
        width=16, height=16, fov_x_deg=45.0, focal_distance=8.0,
    )
    return scene, cam, config


def test_all_modes_identical():
    key = rng.pass_key(jax.random.PRNGKey(2), 0)
    ref = None
    for mode in ("while", "scan", "unroll"):
        scene, cam, config = _setup(mode)
        r = np.asarray(trace_radiance(scene, cam, config, key))
        if ref is None:
            ref = r
        else:
            assert np.allclose(ref, r, atol=1e-6), mode
    scene, cam, config = _setup("host")
    r_host = np.asarray(trace_radiance_host(scene, cam, config, key))
    assert np.allclose(ref, r_host, atol=1e-6)


def test_render_pass_host_matches():
    scene, cam, config = _setup("host")
    accum = jnp.zeros((config.pixel_count, 3), jnp.float32)
    key = jax.random.PRNGKey(2)
    a_host = np.asarray(render_pass_host(scene, cam, config, accum, 0, key))
    a_jit = np.asarray(
        render_pass(scene, cam, config.replace(loop_mode="while"), accum, 0, key)
    )
    assert np.allclose(a_host, a_jit, atol=1e-6)


def test_russian_roulette_identical_across_modes():
    """RR survival uniforms must thread identically through the fused
    while-loop AND the host loop's split + fused(bounce+repack) dispatches
    — the production SSS bench path (sss_dof_config) runs RR through the
    host loop.  Scene chosen so q = clamp(max(throughput)) sits mid-range
    (red diffuse, q≈0.87) and kills actually land."""
    mats = builtin_materials()
    host = HostScene.empty()
    host.materials = [mats["red"], mats["light"]]
    host.sphere_centers = np.array(
        [[0, -1001.0, 0], [0, 0.5, 0], [0, 5.0, 0]], np.float32)
    host.sphere_radii = np.array([1000.0, 1.0, 1.2], np.float32)
    host.sphere_material_ids = np.array([0, 0, 1], np.int32)
    key = rng.pass_key(jax.random.PRNGKey(5), 0)

    def render(loop_mode, rr_on):
        config = RenderConfig(width=48, height=32, max_tracer_depth=5,
                              use_sky_box=False, use_sky=True,
                              loop_mode=loop_mode,
                              russian_roulette=rr_on, rr_start_depth=0)
        scene = build_scene_data(host, config)
        cam = RenderCamera.create(
            eye=(0, 1, 8.0), view=(0, 0, -1.0), up=(0, 1, 0),
            width=48, height=32, fov_x_deg=45.0, focal_distance=8.0,
        )
        if loop_mode == "host":
            return (np.asarray(trace_radiance_host(scene, cam, config, key)),
                    np.asarray(trace_radiance_host(scene, cam, config, key)))
        return np.asarray(trace_radiance(scene, cam, config, key)), None

    ref, _ = render("while", True)
    base, _ = render("while", False)
    assert not np.array_equal(ref, base)  # RR actually changed the estimate
    r_host, r_host2 = render("host", True)
    # the 1/q survival scale (up to 20x) amplifies fused-vs-split float
    # noise; measured max |diff| ~4e-5 on this scene
    assert np.allclose(ref, r_host, rtol=1e-3, atol=2e-4)
    # the second host trace took the predicted-bucket (fused) loop
    np.testing.assert_array_equal(r_host, r_host2)


def test_predicted_buckets_and_overflow_recovery(monkeypatch):
    """The predicted-bucket host loop (zero per-bounce syncs) must be
    bit-identical to the synchronous loop, and a WRONG profile — live rays
    outgrowing a predicted compaction bucket would be dropped — must be
    detected from the async counts and transparently re-run synchronously."""
    from pathtracerwithcuda_tpu.render import wavefront as wf

    # tiny compaction quanta so the frame gets a real bucket ladder; the
    # frame must beat the prediction's fixed +256 headroom so a poisoned
    # profile genuinely overflows its bucket
    monkeypatch.setattr(wf, "_COMPACT_MIN", 32)
    monkeypatch.setattr(wf, "_COMPACT_ALIGN", 32)
    wf._SEG_PROFILE.clear()

    scene, _, config = _setup("host")
    config = config.replace(width=64, height=48)  # scene data is frame-size independent
    cam = RenderCamera.create(
        eye=(0, 1, 8.0), view=(0, 0, -1.0), up=(0, 1, 0),
        width=64, height=48, fov_x_deg=45.0, focal_distance=8.0,
    )
    key = rng.pass_key(jax.random.PRNGKey(3), 0)
    r_sync = np.asarray(trace_radiance_host(scene, cam, config, key))

    # second trace uses the recorded profile (predicted loop)
    prof_keys = list(wf._SEG_PROFILE)
    assert prof_keys, "sync trace must record a live-count profile"
    r_pred = np.asarray(trace_radiance_host(scene, cam, config, key))
    np.testing.assert_array_equal(r_sync, r_pred)

    # poison the profile: absurdly small predictions force buckets the live
    # wavefront overflows -> the trace must discard itself and re-run
    for k in prof_keys:
        wf._SEG_PROFILE[k] = [1] * config.max_tracer_depth
    r_over = np.asarray(trace_radiance_host(scene, cam, config, key))
    np.testing.assert_array_equal(r_sync, r_over)
    # the overflow genuinely happened: real live counts exceed the bucket a
    # pred=1 profile implies (est = 1*1.125 + 256 → ~288-lane bucket)
    assert wf._SEG_PROFILE[prof_keys[0]][0] > 512
    wf._SEG_PROFILE.clear()
