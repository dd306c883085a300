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
    args = ap.parse_args(argv)

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
