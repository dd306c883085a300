"""Inverse-rendering demo (BASELINE.json config 5).

Renders a target image of the Cornell spheres scene with the true materials,
perturbs a material, then recovers it by gradient descent on the L2 image
loss — optionally with pixels sharded over all available devices (material
gradients all-reduced by the shard_map transpose).

Usage:
  python apps/inverse_demo.py --steps 80 --width 64 --height 64 --sharded
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--sharded", action="store_true")
    ap.add_argument("--material", type=int, default=4, help="material row to perturb")
    ap.add_argument("--texture", action="store_true",
                    help="recover a perturbed checker texel block instead of "
                         "a material (north-star texture-parameter demo)")
    args = ap.parse_args(argv)

    if args.texture:
        return _texture_demo(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracerwithcuda_tpu.config import RenderConfig
    from pathtracerwithcuda_tpu.core.types import RenderCamera
    from pathtracerwithcuda_tpu.diff.inverse import make_train_step
    from pathtracerwithcuda_tpu.ops import rng
    from pathtracerwithcuda_tpu.parallel import make_render_mesh
    from pathtracerwithcuda_tpu.render.wavefront import trace_radiance
    from pathtracerwithcuda_tpu.scene.build import build_scene_data
    from pathtracerwithcuda_tpu.scene.examples import cornell_spheres_scene

    config = RenderConfig(
        width=args.width, height=args.height, max_tracer_depth=args.depth,
        use_sky_box=False, use_sky=True,
    )
    scene = build_scene_data(cornell_spheres_scene(), config)
    cam = RenderCamera.create(
        eye=(0, 1.5, 10.0), view=(0, -0.1, -1.0), up=(0, 1, 0),
        width=args.width, height=args.height, fov_x_deg=45.0,
        focal_distance=10.0,
    )
    mesh = make_render_mesh() if args.sharded else None
    if mesh is not None:
        print(f"[Info] sharding over {mesh.devices.size} devices")

    key = jax.random.PRNGKey(0)
    target = trace_radiance(scene, cam, config, rng.pass_key(key, 0))

    true = scene.materials
    mi = args.material
    perturbed = true.replace(
        diffuse=true.diffuse.at[mi].set(jnp.asarray([0.9, 0.9, 0.1])),
        roughness=true.roughness.at[mi].set(0.8),
    )
    print(f"[Info] true diffuse[{mi}]      = {np.asarray(true.diffuse[mi])}")
    print(f"[Info] perturbed diffuse[{mi}] = {np.asarray(perturbed.diffuse[mi])}")

    step_fn, opt_state = make_train_step(scene, cam, config, mesh,
                                         learning_rate=args.lr)
    params = perturbed
    for i in range(args.steps):
        params, opt_state, loss = step_fn(params, opt_state, target, key, 0)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"[Info] step {i:3d}  loss {float(loss):.6f}  "
                  f"diffuse[{mi}] {np.asarray(params.diffuse[mi]).round(3)}")

    err = float(jnp.abs(params.diffuse[mi] - true.diffuse[mi]).max())
    print(f"[Info] final |diffuse error| = {err:.4f} "
          f"({'RECOVERED' if err < 0.1 else 'not converged'})")


if __name__ == "__main__":
    main()


def _texture_demo(args):
    """Recover a perturbed checker texel block by gradient descent on the
    texture atlas (make_train_step trainable=('texture',))."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pathtracerwithcuda_tpu.config import RenderConfig
    from pathtracerwithcuda_tpu.core.materials import builtin_materials
    from pathtracerwithcuda_tpu.core.types import RenderCamera
    from pathtracerwithcuda_tpu.diff.inverse import init_params, make_train_step
    from pathtracerwithcuda_tpu.ops import rng
    from pathtracerwithcuda_tpu.parallel import make_render_mesh
    from pathtracerwithcuda_tpu.render.wavefront import trace_radiance
    from pathtracerwithcuda_tpu.scene.build import (
        HostMesh,
        HostScene,
        build_scene_data,
    )
    from pathtracerwithcuda_tpu.scene.examples import _quad, checker_texture

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
    config = RenderConfig(width=args.width, height=args.height,
                          max_tracer_depth=args.depth,
                          use_sky_box=False, use_sky=True)
    scene = build_scene_data(host, config)
    cam = RenderCamera.create(
        eye=(0, 4.0, 7.0), view=(0, -0.45, -0.89), up=(0, 1, 0),
        width=args.width, height=args.height, fov_x_deg=45.0,
        focal_distance=8.0,
    )
    mesh = make_render_mesh() if args.sharded else None
    key = jax.random.PRNGKey(0)
    target = trace_radiance(scene, cam, config, rng.pass_key(key, 0))

    true_params = init_params(scene, ("texture",))
    true_tex = np.asarray(true_params["texture_data"])
    params = dict(true_params)
    params["texture_data"] = true_params["texture_data"].at[40:120].set(
        jnp.asarray([0.15, 0.65, 0.15]))
    err0 = float(np.abs(np.asarray(params["texture_data"]) - true_tex).mean())
    print(f"[Info] perturbed texel block rows 40:120, |err0| = {err0:.4f}")

    step_fn, opt_state = make_train_step(scene, cam, config, mesh,
                                         learning_rate=args.lr,
                                         trainable=("texture",))
    for i in range(args.steps):
        params, opt_state, loss = step_fn(params, opt_state, target, key, 0)
        if i % 10 == 0 or i == args.steps - 1:
            err = float(np.abs(np.asarray(params["texture_data"]) - true_tex).mean())
            print(f"[Info] step {i:3d}  loss {float(loss):.6f}  |tex err| {err:.4f}")

    err1 = float(np.abs(np.asarray(params["texture_data"]) - true_tex).mean())
    print(f"[Info] final |texel error| = {err1:.4f} "
          f"({'RECOVERED' if err1 < err0 * 0.5 else 'partial'} vs {err0:.4f})")
