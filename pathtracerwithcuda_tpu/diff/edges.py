"""Edge-aware visibility gradients via silhouette edge sampling.

The detached-decision estimator (diff.gradients) differentiates every
continuous factor but treats visibility as fixed: d(pixel)/d(geometry) is
zero/biased through silhouette boundaries.  This module adds the boundary
term of the differentiated pixel integral (Li et al. 2018 style, specialized
to this renderer's primitives):

    dI(x)/dtheta  +=  (L_in - L_out)(x_s) * (n_hat . dx_s/dtheta)  on  x_s

where x_s runs over silhouette curves in IMAGE space.  Sphere silhouettes
are analytic circles (sampled in closed form, differentiable w.r.t. center
and radius); triangle-mesh silhouettes are the mesh edges whose adjacent
faces straddle the eye (plus boundary edges), sampled along the 3D edge and
differentiable w.r.t. the vertex arrays (and through them mesh transforms).

The estimator is exposed as a value-neutral SURROGATE scalar: its gradient
w.r.t. the scene geometry leaves is the boundary term, its value is zero.
Add it to the interior loss inside value_and_grad:

    loss = interior_loss(img) + edge_surrogate(scene, ..., dL/dimg)

Edge radiances L_in/L_out are traced with the production integrator through
rays offset +/- delta_px across the edge (render.wavefront.trace_radiance
with rays=...), occlusion-checked against the edge depth.  Pinhole cameras
only (a thin-lens aperture blurs silhouettes; the sharp-edge boundary term
does not apply).

Reference anchor: the hit selection being differentiated is the reference's
nearest-hit loop, Kernel/path_tracer_kernel.cu:431-454.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pathtracerwithcuda_tpu.config import RenderConfig
from pathtracerwithcuda_tpu.core.types import RenderCamera, SceneData
from pathtracerwithcuda_tpu.ops.linalg import cross, normalize

DEG2RAD = 0.017453292519943295


def _camera_frame(camera: RenderCamera):
    """(horizontal, vertical, x_axis, y_axis) exactly as ops.raygen builds
    them (raygen.py:generate_rays), so projection inverts ray generation."""
    distance = jnp.sqrt(jnp.sum(camera.view * camera.view))
    horizontal = normalize(cross(camera.view, camera.up))
    vertical = normalize(cross(horizontal, camera.view))
    x_axis = horizontal * (distance * jnp.tan(camera.fov[0] * 0.5 * DEG2RAD))
    y_axis = vertical * (distance * jnp.tan(-camera.fov[1] * 0.5 * DEG2RAD))
    return horizontal, vertical, x_axis, y_axis


def project_to_pixels(camera: RenderCamera, points):
    """World points (K, 3) -> continuous pixel coordinates (K, 2) (x, y),
    differentiable.  Inverts generate_rays' canvas mapping: a point on the
    canvas ray of (nx, ny) projects back to exactly those coordinates."""
    _, _, x_axis, y_axis = _camera_frame(camera)
    res_x, res_y = camera.resolution[0], camera.resolution[1]
    q = points - camera.eye
    f = q @ camera.view  # forward component (view is unit)
    f = jnp.where(jnp.abs(f) < 1e-8, 1e-8, f)
    # q ~ view + nx*x_axis + ny*y_axis; axes are orthogonal to view
    nx = (q @ x_axis) / (f * jnp.sum(x_axis * x_axis))
    ny = (q @ y_axis) / (f * jnp.sum(y_axis * y_axis))
    px = (nx + 1.0) * 0.5 * (res_x - 1.0)
    py = (ny + 1.0) * 0.5 * (res_y - 1.0)
    return jnp.stack([px, py], axis=-1)


def rays_through_pixels(camera: RenderCamera, pix):
    """Pinhole rays through continuous pixel coords (K, 2) -> (o, d)."""
    _, _, x_axis, y_axis = _camera_frame(camera)
    res_x, res_y = camera.resolution[0], camera.resolution[1]
    nx = pix[:, 0] / (res_x - 1.0) * 2.0 - 1.0
    ny = pix[:, 1] / (res_y - 1.0) * 2.0 - 1.0
    d = normalize(camera.view[None, :]
                  + nx[:, None] * x_axis[None, :]
                  + ny[:, None] * y_axis[None, :])
    o = jnp.broadcast_to(camera.eye, d.shape)
    return o, d


def sphere_silhouette_points(center, radius, eye, phis):
    """Closed-form silhouette circle of a sphere seen from `eye`:
    points p with (p-c).(p-e)=0, |p-c|=r.  (K, 3), differentiable in
    center/radius.  Degenerate (eye inside sphere) handled by the caller's
    validity mask."""
    wvec = eye - center
    dist = jnp.maximum(jnp.sqrt(jnp.sum(wvec * wvec)), 1e-8)
    w_hat = wvec / dist
    ratio = jnp.clip(radius / dist, 0.0, 0.999999)
    rho = radius * jnp.sqrt(jnp.maximum(1.0 - ratio * ratio, 1e-12))
    offset = radius * ratio  # = r^2 / dist
    # any stable basis perpendicular to w_hat
    up = jnp.where(jnp.abs(w_hat[0]) < 0.9,
                   jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]))
    u = normalize(cross(w_hat, up))
    v = cross(w_hat, u)
    circ = (jnp.cos(phis)[:, None] * u[None, :]
            + jnp.sin(phis)[:, None] * v[None, :])
    return center[None, :] + offset * w_hat[None, :] + rho * circ


def _edge_radiances(scene, camera, config, key, pix_in, pix_out, spp):
    """Trace L_in / L_out through the offset pixel coordinates (stop-grad:
    these are Monte Carlo constants of the boundary term — the scene is
    detached so reverse mode never touches the tracer's while loops)."""
    from pathtracerwithcuda_tpu.render.wavefront import trace_radiance

    scene = jax.lax.stop_gradient(scene)
    camera = jax.lax.stop_gradient(camera)
    k = pix_in.shape[0]
    o_in, d_in = rays_through_pixels(camera, pix_in)
    o_out, d_out = rays_through_pixels(camera, pix_out)
    o2 = jnp.concatenate([o_in, o_out], axis=0)
    d2 = jnp.concatenate([d_in, d_out], axis=0)
    res_x = camera.resolution[0]
    pid = (jnp.clip(jnp.round(pix_in[:, 1]), 0, camera.resolution[1] - 1)
           * res_x
           + jnp.clip(jnp.round(pix_in[:, 0]), 0, res_x - 1)).astype(jnp.int32)
    pid2 = jnp.concatenate([pid, pid], axis=0)
    rad = jnp.zeros((2 * k, 3), jnp.float32)
    for s in range(spp):
        ks = jax.random.fold_in(key, s + 7001)
        rad = rad + trace_radiance(scene, camera, config, ks, pid2,
                                   rays=(o2, d2))
    rad = rad / spp
    return rad[:k], rad[k:], (o_in, d_in), (o_out, d_out)


def sphere_edge_surrogate(scene: SceneData, camera: RenderCamera,
                          config: RenderConfig, key, d_loss_d_image, *,
                          n_phi: int = 64, delta_px: float = 0.35,
                          spp: int = 2):
    """Boundary-term surrogate for ALL spheres in the scene.

    d_loss_d_image: (P, 3) dLoss/dpixel in pixel-id (row-major) order,
    treated as constant (stop-grad).  Returns a scalar whose gradient
    w.r.t. scene.sphere_center / scene.sphere_radius is the visibility
    boundary term and whose value is 0.
    """
    from pathtracerwithcuda_tpu.render.wavefront import nearest_hit

    num = int(scene.num_spheres)
    if num == 0:
        return jnp.float32(0.0)
    dldi = jax.lax.stop_gradient(d_loss_d_image)
    res_x = camera.resolution[0]
    res_y = camera.resolution[1]
    phis = (jnp.arange(n_phi) + 0.5) / n_phi * (2.0 * jnp.pi)

    total = jnp.float32(0.0)
    for si in range(num):
        center = scene.sphere_center[si]
        radius = scene.sphere_radius[si]
        pts = sphere_silhouette_points(center, radius,
                                       jax.lax.stop_gradient(camera.eye), phis)
        s_px = project_to_pixels(camera, pts)
        s_det = jax.lax.stop_gradient(s_px)
        tau = (jnp.roll(s_det, -1, axis=0) - jnp.roll(s_det, 1, axis=0)) * 0.5
        dl = jnp.sqrt(jnp.sum(tau * tau, axis=-1))
        n_hat = jnp.stack([tau[:, 1], -tau[:, 0]], axis=-1)
        n_hat = n_hat / jnp.maximum(dl[:, None], 1e-12)
        # orient outward: away from the projected sphere center
        c_px = jax.lax.stop_gradient(
            project_to_pixels(camera, center[None, :]))[0]
        flip = jnp.sum(n_hat * (s_det - c_px[None, :]), axis=-1) < 0.0
        n_hat = jnp.where(flip[:, None], -n_hat, n_hat)

        on_screen = ((s_det[:, 0] >= 0) & (s_det[:, 0] <= res_x - 1)
                     & (s_det[:, 1] >= 0) & (s_det[:, 1] <= res_y - 1))

        pix_in = s_det - delta_px * n_hat
        pix_out = s_det + delta_px * n_hat
        l_in, l_out, rays_in, rays_out = _edge_radiances(
            scene, camera, config, key, pix_in, pix_out, spp)

        # validity: the inside ray's nearest hit must be THIS sphere and
        # the outside ray's must not (otherwise the sample is occluded or
        # numerically inside) — all stop-grad Monte Carlo gates.  The scene
        # is detached: an inf/0 primal inside the probe would otherwise turn
        # the zero cotangent into NaN in reverse mode.
        scd = jax.lax.stop_gradient(scene)
        _, in_tri, _, _, _, in_sph, in_any = nearest_hit(
            rays_in[0], rays_in[1], scd, config)
        _, out_tri, _, _, _, out_sph, out_any = nearest_hit(
            rays_out[0], rays_out[1], scd, config)
        in_ok = in_any & ~in_tri & (in_sph == si)
        out_ok = ~(out_any & ~out_tri & (out_sph == si))
        valid = on_screen & in_ok & out_ok

        pid = (jnp.clip(jnp.round(s_det[:, 1]), 0, res_y - 1) * res_x
               + jnp.clip(jnp.round(s_det[:, 0]), 0, res_x - 1)).astype(jnp.int32)
        g = jnp.sum(dldi[pid] * (l_in - l_out), axis=-1)
        w = jnp.where(valid, g * dl, 0.0)
        total = total + jnp.sum(
            jax.lax.stop_gradient(w[:, None] * n_hat) * s_px)
    return total - jax.lax.stop_gradient(total)


def _mesh_edges_host(tri_v0, tri_v1, tri_v2):
    """Host-side unique-edge extraction from the triangle soup: for every
    undirected edge, the (tri, corner) of up to two adjacent faces.
    Returns int arrays (E, 2, 2): [(tri_a, corner_a), (tri_b, corner_b)],
    tri_b == -1 for boundary edges.  Corner c spans vertices (c, (c+1)%3).
    """
    v = np.stack([np.asarray(tri_v0), np.asarray(tri_v1),
                  np.asarray(tri_v2)], axis=1)  # (T, 3, 3)
    seen: dict = {}
    for t in range(v.shape[0]):
        for c in range(3):
            a = v[t, c]
            b = v[t, (c + 1) % 3]
            key = tuple(sorted([tuple(np.round(a, 5)), tuple(np.round(b, 5))]))
            seen.setdefault(key, []).append((t, c))
    edges = []
    for adj in seen.values():
        a = adj[0]
        b = adj[1] if len(adj) > 1 else (-1, 0)
        edges.append([list(a), list(b)])
    return np.asarray(edges, np.int32)  # (E, 2, 2)


def triangle_edge_surrogate(scene: SceneData, camera: RenderCamera,
                            config: RenderConfig, key, d_loss_d_image, *,
                            samples_per_edge: int = 4, delta_px: float = 0.35,
                            spp: int = 2, edges=None):
    """Boundary-term surrogate for triangle-mesh silhouette edges.

    Silhouette edges (stop-grad test): boundary edges of front-facing
    triangles, and shared edges whose two faces straddle the eye plane.
    Gradients flow to scene.tri_v0/v1/v2 (and through scene/build transforms
    to mesh translations).  `edges` may pass a precomputed _mesh_edges_host
    result (host adjacency is O(T) python — cache it for repeated calls).
    """
    from pathtracerwithcuda_tpu.render.wavefront import nearest_hit

    if int(scene.num_triangles) == 0:
        return jnp.float32(0.0)
    if edges is None:
        edges = _mesh_edges_host(scene.tri_v0, scene.tri_v1, scene.tri_v2)
    if edges.shape[0] == 0:
        return jnp.float32(0.0)
    dldi = jax.lax.stop_gradient(d_loss_d_image)
    res_x = camera.resolution[0]
    res_y = camera.resolution[1]
    eye = jax.lax.stop_gradient(camera.eye)

    tri_a = jnp.asarray(edges[:, 0, 0])
    cor_a = jnp.asarray(edges[:, 0, 1])
    tri_b = jnp.asarray(edges[:, 1, 0])

    verts = jnp.stack([scene.tri_v0, scene.tri_v1, scene.tri_v2], axis=1)
    # edge endpoints from face A's corners (differentiable)
    va = verts[tri_a, cor_a]
    vb = verts[tri_a, (cor_a + 1) % 3]
    # opposite vertex of face A (for image-space orientation)
    vo = verts[tri_a, (cor_a + 2) % 3]

    def face_normal(t):
        e1 = verts[t, 1] - verts[t, 0]
        e2 = verts[t, 2] - verts[t, 0]
        return cross(e1, e2)

    na = jax.lax.stop_gradient(face_normal(tri_a))
    nb = jax.lax.stop_gradient(face_normal(jnp.maximum(tri_b, 0)))
    to_eye = eye[None, :] - jax.lax.stop_gradient(va)
    front_a = jnp.sum(na * to_eye, axis=-1) > 0.0
    front_b = jnp.sum(nb * to_eye, axis=-1) > 0.0
    is_boundary = tri_b < 0
    silhouette = jnp.where(is_boundary, front_a, front_a != front_b)
    # for shared silhouette edges use the FRONT face's opposite vertex
    swap = (~is_boundary) & (~front_a)
    # (faces share the edge; face B's opposite vertex is found by matching)
    # — keep face A's orientation helper and flip via the front-ness below.

    m = samples_per_edge
    ts = (jnp.arange(m) + 0.5) / m  # (m,)
    p = va[:, None, :] + ts[None, :, None] * (vb - va)[:, None, :]  # (E,m,3)
    e_count = p.shape[0]
    p_flat = p.reshape(-1, 3)
    s_px = project_to_pixels(camera, p_flat).reshape(e_count, m, 2)
    s_det = jax.lax.stop_gradient(s_px)

    # tangent along the edge in image space (projected edge direction)
    pa_px = jax.lax.stop_gradient(project_to_pixels(camera, va))
    pb_px = jax.lax.stop_gradient(project_to_pixels(camera, vb))
    tau = (pb_px - pa_px)[:, None, :] / m  # per-sample arc vector (E,1,2)
    dl = jnp.sqrt(jnp.sum(tau * tau, axis=-1))  # (E, 1)
    n_hat = jnp.stack([tau[..., 1], -tau[..., 0]], axis=-1)
    n_hat = n_hat / jnp.maximum(dl[..., None], 1e-12)
    # orient away from face A's interior (toward outside); if face A is
    # back-facing on a shared silhouette edge, outside is face A's side
    o_px = jax.lax.stop_gradient(project_to_pixels(camera, vo))
    mid = (pa_px + pb_px) * 0.5
    inward = o_px - mid  # image direction into face A
    flip = jnp.sum(n_hat[:, 0, :] * inward, axis=-1) > 0.0
    flip = jnp.where(swap, ~flip, flip)
    n_hat = jnp.where(flip[:, None, None], -n_hat, n_hat)

    sil_w = jnp.where(silhouette[:, None], 1.0, 0.0)  # (E, 1)

    s_flat = s_det.reshape(-1, 2)
    n_flat = jnp.broadcast_to(n_hat, (e_count, m, 2)).reshape(-1, 2)
    dl_flat = jnp.broadcast_to(dl, (e_count, m)).reshape(-1)
    sil_flat = jnp.broadcast_to(sil_w, (e_count, m)).reshape(-1)
    depth = jnp.sqrt(jnp.sum(
        (jax.lax.stop_gradient(p_flat) - eye[None, :]) ** 2, axis=-1))

    on_screen = ((s_flat[:, 0] >= 0) & (s_flat[:, 0] <= res_x - 1)
                 & (s_flat[:, 1] >= 0) & (s_flat[:, 1] <= res_y - 1))

    pix_in = s_flat - delta_px * n_flat
    pix_out = s_flat + delta_px * n_flat
    l_in, l_out, rays_in, rays_out = _edge_radiances(
        scene, camera, config, key, pix_in, pix_out, spp)

    # detached occlusion probes (zero-cotangent x inf-primal -> NaN guard).
    # The inside ray hits the silhouetting surface NEAR the edge depth —
    # a relative band, since the offset pixel legitimately lands at
    # depth +- slope*delta_px on an oblique surface; the outside ray must
    # have nothing in front of the edge.
    scd = jax.lax.stop_gradient(scene)
    t_in, *_rest = nearest_hit(rays_in[0], rays_in[1], scd, config)
    t_out, *_rest2 = nearest_hit(rays_out[0], rays_out[1], scd, config)
    band = 0.02 * depth + 1e-3
    in_ok = jnp.abs(t_in - depth) <= band
    out_ok = ~(t_out < depth - band)
    valid = on_screen & in_ok & out_ok & (sil_flat > 0.0)

    pid = (jnp.clip(jnp.round(s_flat[:, 1]), 0, res_y - 1) * res_x
           + jnp.clip(jnp.round(s_flat[:, 0]), 0, res_x - 1)).astype(jnp.int32)
    g = jnp.sum(dldi[pid] * (l_in - l_out), axis=-1)
    w = jnp.where(valid, g * dl_flat, 0.0)
    total = jnp.sum(jax.lax.stop_gradient(w[:, None] * n_flat)
                    * s_px.reshape(-1, 2))
    return total - jax.lax.stop_gradient(total)


def edge_surrogate(scene: SceneData, camera: RenderCamera,
                   config: RenderConfig, key, d_loss_d_image, *,
                   n_phi: int = 64, samples_per_edge: int = 4,
                   delta_px: float = 0.35, spp: int = 2, edges=None):
    """Sphere + triangle boundary terms combined (see module docstring)."""
    s = sphere_edge_surrogate(scene, camera, config, key, d_loss_d_image,
                              n_phi=n_phi, delta_px=delta_px, spp=spp)
    t = triangle_edge_surrogate(scene, camera, config, key, d_loss_d_image,
                                samples_per_edge=samples_per_edge,
                                delta_px=delta_px, spp=spp, edges=edges)
    return s + t
