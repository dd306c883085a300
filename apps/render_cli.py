"""Headless progressive renderer CLI.

The reference's app shell (Main/window.cpp) is an interactive GLFW window;
the TPU build is headless-first: render N progressive passes, print the
telemetry the reference shows in its ImGui panel (FPS, frame time, iteration,
render time — Main/window.cpp:450-479), and write a metrics-encoded PNG.

Usage:
  python apps/render_cli.py --scene example:flagship --passes 16
  python apps/render_cli.py --scene path/to/scene.json --config path/to/config.json
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")  # repo root


def build_host_scene(spec: str):
    if spec.startswith("example:"):
        from pathtracerwithcuda_tpu.scene import examples

        name = spec.split(":", 1)[1]
        builders = {
            "flagship": examples.flagship_scene,
            "cornell": examples.cornell_spheres_scene,
            "sss_dof": examples.sss_dof_scene,
        }
        if name not in builders:
            raise SystemExit(f"unknown example {name!r}; choices: {sorted(builders)}")
        return builders[name]()
    from pathtracerwithcuda_tpu.scene.parser import load_scene_file

    return load_scene_file(spec)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="example:flagship")
    ap.add_argument("--config", default=None, help="config.json (reference schema)")
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--passes", type=int, default=16)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=".")
    ap.add_argument("--checkpoint", default=None, help="save/resume .npz path")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize() before any "
                         "JAX use (auto-detected pod env, or set "
                         "JAX_COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID)")
    args = ap.parse_args(argv)

    if args.distributed:
        import os as _os

        from pathtracerwithcuda_tpu.parallel.mesh import init_distributed

        init_distributed(
            coordinator=_os.environ.get("JAX_COORDINATOR_ADDRESS"),
            num_processes=(int(_os.environ["JAX_NUM_PROCESSES"])
                           if "JAX_NUM_PROCESSES" in _os.environ else None),
            process_id=(int(_os.environ["JAX_PROCESS_ID"])
                        if "JAX_PROCESS_ID" in _os.environ else None),
        )

    from pathtracerwithcuda_tpu.config import RenderConfig
    from pathtracerwithcuda_tpu.render.session import RenderSession
    from pathtracerwithcuda_tpu.scene.config_parser import load_config_file

    if args.config:
        config = load_config_file(args.config)
        config = config.replace(width=args.width, height=args.height)
    else:
        config = RenderConfig(
            width=args.width, height=args.height, max_tracer_depth=args.depth
        )

    host = build_host_scene(args.scene)
    if host.env_faces is None and config.use_sky_box and not config.use_sky:
        # no cube map loaded: fall back to the procedural sky instead of a
        # black background (the reference renders black here; a sensible
        # default for headless scenes without env assets)
        config = config.replace(use_sky=True)
    print(f"[Info] scene '{host.name or args.scene}': "
          f"{host.sphere_centers.shape[0]} spheres, "
          f"{sum(m.vertices.shape[0] for m in host.meshes)} triangles, "
          f"{len(host.textures)} textures")

    t0 = time.monotonic()
    sess = RenderSession(host, config, seed=args.seed)
    print(f"[Info] scene device build: {time.monotonic() - t0:.2f}s")

    if args.checkpoint:
        import os

        if os.path.exists(args.checkpoint):
            sess.load_checkpoint(args.checkpoint)
            print(f"[Info] resumed at pass {sess.pass_counter}")

    for i in range(args.passes):
        sess.render()
        if i == 0:
            print(f"[Info] first pass (incl. compile): {sess.last_frame_ms:.1f} ms")
    print(
        f"[Info] iteration {sess.pass_counter}  frame {sess.last_frame_ms:.1f} ms  "
        f"fps {sess.fps:.2f}  render time {time.monotonic() - t0:.1f}s"
    )

    if args.checkpoint:
        sess.save_checkpoint(args.checkpoint)
    path = sess.screenshot(args.out)
    print(f"[Info] wrote {path}")


if __name__ == "__main__":
    main()
