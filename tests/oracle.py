"""Scalar NumPy oracle renderer.

Plays the role the reference's CPU mirror renderer plays for its CUDA kernel
(Core/path_tracer_cpu.cpp — the de-facto correctness oracle, SURVEY.md §4):
an independent, deliberately unvectorized per-pixel implementation of the
same rendering semantics.  It consumes the *same* uniform random numbers
(precomputed via ops.rng and passed in), so the wavefront renderer must match
it almost bit-for-bit.

Scope: spheres + triangles (brute force), full shading model (GGX reflection,
refraction with medium hand-off, diffuse+emission, SSS medium events,
textures, cube map / sky background), energy kill.
"""

from __future__ import annotations

import math

import numpy as np

SQRT_ONE_THIRD = 0.5773502691896258
TWO_PI = 2.0 * math.pi


def _normalize(v):
    return v / max(np.linalg.norm(v), 1e-20)


def _reflect(n, d):
    return d - 2.0 * float(np.dot(n, d)) * n


def _refract(n, d, n_in, n_out):
    i = -d
    n_dot_i = float(np.dot(n, i))
    ratio = n_in / n_out
    a = ratio * n_dot_i
    b = 1.0 - ratio * ratio * (1.0 - n_dot_i * n_dot_i)
    if b < 0.0:
        return np.zeros(3, np.float32)
    if n_dot_i > 0:
        return n * (a - math.sqrt(b)) - ratio * i
    return n * (a + math.sqrt(b)) - ratio * i


def _fresnel_dielectric(n, d, n_in, n_out, refraction_dir):
    cos_in = float(np.dot(n, -d))
    cos_out = float(np.dot(-n, refraction_dir))
    if n_in > n_out and math.acos(min(max(cos_in, -1.0), 1.0)) >= math.asin(
        min(max(n_out / n_in, -1.0), 1.0)
    ):
        return 1.0
    if np.linalg.norm(refraction_dir) <= 0.000005 or cos_out < 0:
        return 1.0
    rs = ((n_in * cos_in - n_out * cos_out) / (n_in * cos_in + n_out * cos_out)) ** 2
    rp = ((n_in * cos_out - n_out * cos_in) / (n_in * cos_out + n_out * cos_in)) ** 2
    return 0.5 * (rs + rp)


def _fresnel_conductor(n, d, ior, k):
    cos_in = float(np.dot(n, -d))
    nk2 = ior * ior + k * k
    cos2 = cos_in * cos_in
    two = 2.0 * ior * cos_in
    rs = (nk2 * cos2 - two + 1.0) / (nk2 * cos2 + two + 1.0)
    rp = (nk2 - two + cos2) / (nk2 + two + cos2)
    return 0.5 * (rs + rp)


def _frame(normal):
    if abs(normal[0]) < SQRT_ONE_THIRD:
        any_dir = np.array([1.0, 0.0, 0.0])
    elif abs(normal[1]) < SQRT_ONE_THIRD:
        any_dir = np.array([0.0, 1.0, 0.0])
    else:
        any_dir = np.array([0.0, 0.0, 1.0])
    vec_i = _normalize(np.cross(normal, any_dir))
    vec_j = np.cross(normal, vec_i)
    return vec_i, vec_j


def _cosine_hemisphere(normal, u1, u2):
    cos_t = math.sqrt(u1)
    sin_t = math.sqrt(max(1.0 - cos_t * cos_t, 0.0))
    phi = u2 * TWO_PI
    vi, vj = _frame(normal)
    return cos_t * normal + math.cos(phi) * sin_t * vi + math.sin(phi) * sin_t * vj


def _ggx_half(normal, roughness, u1, u2):
    theta = math.atan(roughness * math.sqrt(u1) / math.sqrt(max(1.0 - u1, 1e-20)))
    phi = u2 * TWO_PI
    vi, vj = _frame(normal)
    return (
        math.cos(theta) * normal
        + math.cos(phi) * math.sin(theta) * vi
        + math.sin(phi) * math.sin(theta) * vj
    )


def _ggx_g1(roughness, macro_n, micro_n, d):
    v = -d
    v_dot_n = float(np.dot(v, macro_n))
    v_dot_m = float(np.dot(v, micro_n))
    if (v_dot_m / v_dot_n) <= 0.0:
        return 0.0
    a2 = roughness * roughness
    cos2 = v_dot_n * v_dot_n
    tan2 = (1.0 - cos2) / max(cos2, 1e-20)
    return 2.0 / (1.0 + math.sqrt(1.0 + a2 * tan2))


def _sphere_dir(u1, u2):
    cos_t = u1 * 2.0 - 1.0
    sin_t = math.sqrt(max(1.0 - cos_t * cos_t, 0.0))
    phi = u2 * TWO_PI
    return np.array([cos_t, math.cos(phi) * sin_t, math.sin(phi) * sin_t])


def _sample_image(img, u, v, bilinear):
    """img: (H, W, 3), uv wrap + flip + nearest/bilinear per the reference."""
    h, w = img.shape[:2]
    u = u - math.floor(u)
    v = v - math.floor(v)
    x_real = u * (w - 1)
    y_real = (1.0 - v) * (h - 1)
    if not bilinear:
        x = int(min(max(x_real, 0.0), w - 1))
        y = int(min(max(y_real, 0.0), h - 1))
        return img[y, x].astype(np.float64)
    x0 = int(min(max(math.floor(x_real), 0.0), w - 1))
    x1 = int(min(max(math.ceil(x_real), 0.0), w - 1))
    y0 = int(min(max(math.floor(y_real), 0.0), h - 1))
    y1 = int(min(max(math.ceil(y_real), 0.0), h - 1))
    tx = x_real - math.floor(x_real)
    ty = y_real - math.floor(y_real)
    bottom = img[y0, x0] * (1 - tx) + img[y0, x1] * tx
    top = img[y1, x0] * (1 - tx) + img[y1, x1] * tx
    return (bottom * (1 - ty) + top * ty).astype(np.float64)


def _cube_uv(d):
    x, y, z = d
    ax, ay, az = abs(x), abs(y), abs(z)
    face, uc, vc, ma = 0, 0.0, 0.0, 1.0
    if x > 0 and ax >= ay and ax >= az:
        face, uc, vc, ma = 0, -z, y, ax
    if x <= 0 and ax >= ay and ax >= az:
        face, uc, vc, ma = 1, z, y, ax
    if y > 0 and ay >= ax and ay >= az:
        face, uc, vc, ma = 2, x, -z, ay
    if y <= 0 and ay >= ax and ay >= az:
        face, uc, vc, ma = 3, x, z, ay
    if z > 0 and az >= ax and az >= ay:
        face, uc, vc, ma = 4, x, y, az
    if z <= 0 and az >= ax and az >= ay:
        face, uc, vc, ma = 5, -x, y, az
    u = 0.5 * (uc / ma + 1.0)
    v = 0.5 * (vc / ma + 1.0)
    return face, u, v


def _background(scene, d, config):
    if config.use_sky_box and scene.get("env_faces") is not None:
        faces = scene["env_faces"]
        face, u, v = _cube_uv(d)
        return _sample_image(faces[face], u, v, config.use_bilinear)
    if config.use_sky:
        t = (float(np.dot(d, np.array([-0.41, 0.41, -0.82]))) + 1.0) / 2.0
        return (1.0 - t) * np.array([0.15, 0.3, 0.5]) + t * np.array([1.0, 1.0, 1.0])
    return np.zeros(3)


def generate_ray(camera, px, py, uniforms, config):
    """camera: dict with eye, view, up, resolution, fov, aperture, focal."""
    eye = np.asarray(camera["eye"], np.float64)
    view = np.asarray(camera["view"], np.float64)
    up = np.asarray(camera["up"], np.float64)
    res = camera["resolution"]
    fov = camera["fov"]
    jitter = (uniforms[0], uniforms[1]) if config.use_anti_alias else (0.0, 0.0)

    distance = np.linalg.norm(view)
    horizontal = _normalize(np.cross(view, up))
    vertical = _normalize(np.cross(horizontal, view))
    x_axis = horizontal * (distance * math.tan(math.radians(fov[0] * 0.5)))
    y_axis = vertical * (distance * math.tan(math.radians(-fov[1] * 0.5)))
    nx = ((px + jitter[0]) / (res[0] - 1.0)) * 2.0 - 1.0
    ny = ((py + jitter[1]) / (res[1] - 1.0)) * 2.0 - 1.0
    canvas = eye + view + nx * x_axis + ny * y_axis
    image_plane = eye + _normalize(canvas - eye) * camera["focal_distance"]
    if camera["aperture_radius"] > 0.00001:
        angle = uniforms[2] * TWO_PI
        r = camera["aperture_radius"] * math.sqrt(uniforms[3])
        origin = eye + math.cos(angle) * r * horizontal + math.sin(angle) * r * vertical
    else:
        origin = eye
    return origin, _normalize(image_plane - origin)


def _nearest_hit(scene, o, d):
    """Brute force over spheres and triangles.  Returns dict or None."""
    best = None
    for i in range(len(scene.get("sphere_center", []))):
        c = scene["sphere_center"][i]
        r = scene["sphere_radius"][i]
        op = c - o
        b = float(np.dot(op, d))
        delta = b * b - float(np.dot(op, op)) + r * r
        if delta < 0:
            continue
        root = math.sqrt(delta)
        t1, t2 = b - root, b + root
        if t1 < 0 and t2 < 0:
            continue
        t = min(t1, t2) if (t1 > 0 and t2 > 0) else max(t1, t2)
        if t > 0 and (best is None or t < best["t"]):
            p = o + d * t
            best = {
                "t": t, "type": "sphere", "index": i, "point": p,
                "normal": _normalize(p - c),
            }
    tris = scene.get("triangles")
    if tris is not None:
        for i in range(len(tris["v0"])):
            v0, v1, v2 = tris["v0"][i], tris["v1"][i], tris["v2"][i]
            e1, e2 = v1 - v0, v2 - v0
            p_vec = np.cross(d, e2)
            det = float(np.dot(e1, p_vec))
            if det == 0.0:
                continue
            inv = 1.0 / det
            t_vec = o - v0
            q_vec = np.cross(t_vec, e1)
            b1 = float(np.dot(t_vec, p_vec)) * inv
            b2 = float(np.dot(d, q_vec)) * inv
            t = float(np.dot(e2, q_vec)) * inv
            if b1 >= 0 and b2 >= 0 and b1 + b2 <= 1 and t > 0 and (
                best is None or t < best["t"]
            ):
                w0 = 1.0 - b1 - b2
                best = {
                    "t": t, "type": "triangle", "index": i, "point": o + d * t,
                    "normal": tris["n0"][i] * w0 + tris["n1"][i] * b1 + tris["n2"][i] * b2,
                    "uv": tris["uv0"][i] * w0 + tris["uv1"][i] * b1 + tris["uv2"][i] * b2,
                    "b1": b1, "b2": b2,
                }
    return best


def trace_pixel(scene, config, o, d, bounce_uniforms, rr_uniforms=None):
    """One pixel's radiance for one sample; bounce_uniforms: (depth, 6).

    rr_uniforms: optional (depth,) survival uniforms, consumed only when
    config.russian_roulette — replays render/wavefront.bounce_step's RR
    (survive w.p. q = clamp(max(throughput), 0.05, 1), scale by 1/q).
    """
    throughput = np.ones(3)
    radiance = np.zeros(3)

    def rr_kill(depth):
        """Apply RR in place via the returned (killed, scale)."""
        if not getattr(config, "russian_roulette", False) or rr_uniforms is None:
            return False, 1.0
        if depth < config.rr_start_depth:
            return False, 1.0
        q = min(max(float(np.max(throughput)), 0.05), 1.0)
        if rr_uniforms[depth] > q:
            return True, 1.0
        return False, 1.0 / q
    cur_abs = np.asarray(config.air_absorption_coef, np.float64)
    cur_rs = np.asarray(config.air_reduced_scattering_coef, np.float64)
    mats = scene["materials"]

    for depth in range(config.max_tracer_depth):
        u = bounce_uniforms[depth]
        hit = _nearest_hit(scene, o, d)
        min_t = hit["t"] if hit else math.inf

        # medium event
        if cur_rs[0] > 0.0 or np.linalg.norm(cur_abs) > config.sss_threshold:
            dist = -math.log(max(u[0], 1e-37)) / cur_rs[0] if cur_rs[0] > 0 else math.inf
            if dist < min_t:
                o = o + d * dist
                d = _sphere_dir(u[1], u[2])
                throughput = throughput * np.exp(-cur_abs * dist)
                if np.linalg.norm(throughput) <= config.energy_exist_threshold:
                    return radiance
                killed, scale = rr_kill(depth)
                if killed:
                    return radiance
                throughput = throughput * scale
                continue
            throughput = throughput * np.exp(-cur_abs * min(min_t, 1e30))

        if hit is None:
            radiance = radiance + throughput * _background(scene, d, config)
            return radiance

        if hit["type"] == "sphere":
            m = dict(mats[scene["sphere_material"][hit["index"]]])
        else:
            m = dict(mats[scene["triangles"]["material"][hit["index"]]])
            tex = scene.get("textures", [])
            if m["diffuse_texture_id"] != -1:
                m["diffuse"] = np.asarray(m["diffuse"]) * _sample_image(
                    tex[m["diffuse_texture_id"]], *hit["uv"], config.use_bilinear
                )
            if m["specular_texture_id"] != -1:
                m["specular"] = np.asarray(m["specular"]) * _sample_image(
                    tex[m["specular_texture_id"]], *hit["uv"], config.use_bilinear
                )

        normal = np.asarray(hit["normal"], np.float64)
        n_in = config.air_refraction_index
        n_out = m["refraction_index"]
        out_abs = np.asarray(m["absorption"], np.float64)
        out_rs = np.asarray(m["reduced_scattering"], np.float64)
        transparent = m["transparent"] > 0.5

        if float(np.dot(d, normal)) > 0:
            normal = -normal
            if transparent:
                n_in, n_out = n_out, n_in
                out_abs = np.asarray(config.air_absorption_coef, np.float64)
                out_rs = np.asarray(config.air_reduced_scattering_coef, np.float64)

        refraction_dir = _refract(normal, d, n_in, n_out)
        bias = config.vector_bias_length * normal

        if m["extinction"] == 0 or transparent:
            fr = _fresnel_dielectric(normal, d, n_in, n_out, refraction_dir)
        else:
            fr = _fresnel_conductor(normal, d, m["refraction_index"], m["extinction"])

        if u[3] < fr:
            alpha = m["roughness"] ** 1.85 * 0.238
            micro_n = _ggx_half(normal, alpha, u[4], u[5])
            micro_reflect = _reflect(micro_n, d)
            g = _ggx_g1(alpha, normal, micro_n, d) * _ggx_g1(
                alpha, normal, micro_n, micro_reflect
            )
            o = hit["point"] + bias
            d = micro_reflect
            throughput = throughput * np.asarray(m["specular"]) * g
        elif transparent:
            o = hit["point"] - bias
            d = refraction_dir
            cur_abs, cur_rs = out_abs, out_rs
            throughput = throughput * (n_out / n_in) ** 2
        else:
            radiance = radiance + throughput * np.asarray(m["emission"])
            throughput = throughput * np.asarray(m["diffuse"])
            o = hit["point"] + bias
            d = _cosine_hemisphere(normal, u[4], u[5])

        if np.linalg.norm(throughput) <= config.energy_exist_threshold:
            return radiance
        killed, scale = rr_kill(depth)
        if killed:
            return radiance
        throughput = throughput * scale
    return radiance


def render(scene, camera, config, raygen_u, bounce_u, rr_u=None):
    """Full-frame oracle render of one pass.

    raygen_u: (P, 4); bounce_u: (D, P, 6); rr_u: optional (D, P).
    Returns (P, 3) float64 radiance.
    """
    w, h = int(camera["resolution"][0]), int(camera["resolution"][1])
    out = np.zeros((w * h, 3))
    for py in range(h):
        for px in range(w):
            p = py * w + px
            o, d = generate_ray(camera, px, py, raygen_u[p], config)
            out[p] = trace_pixel(
                scene, config, o, d, bounce_u[:, p, :],
                None if rr_u is None else rr_u[:, p])
    return out
