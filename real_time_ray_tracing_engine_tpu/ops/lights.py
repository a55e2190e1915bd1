"""MIS light sampling: HittablePDF over the scene's light list.

Replaces the reference's HittablePDF (PDF.hpp:86-124) delegating to
Sphere::pdf_value/random (Sphere.cpp:145-188, solid-angle cone math) and
Plane::pdf_value/random (Plane.cpp:115-133, area sampling). Light primitives
are rows of the unified prim tables referenced by scene.light_prim; the
`active` world mask is deliberately ignored — lights are sampling targets, not
occluders (the world copy of the same geometry handles occlusion).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.vecmath import dot, normalize, onb_from_w, onb_local, safe_sqrt, T_MIN, BIG
from ..scene.flat import FlatScene
from .intersect import sphere_ts, quad_ts


def _gather_light(scene: FlatScene, l):
    """Split light prim ids (L,) into sphere/quad gathered params."""
    S = scene.sph_center.shape[0]
    prim = scene.light_prim[l]
    is_sph = prim < S
    si = jnp.clip(prim, 0, S - 1)
    qi = jnp.clip(prim - S, 0, scene.quad_corner.shape[0] - 1)
    return prim, is_sph, si, qi


def light_pdf_values(scene: FlatScene, org, dr, tm):
    """Solid-angle pdf of sampling direction dr from org toward each light.

    org/dr: (N, 3), dr unit. Returns (N, L).
    """
    L = scene.light_prim.shape[0]
    _, is_sph, si, qi = _gather_light(scene, jnp.arange(L))

    # ---- sphere lights: hit test then 1/solid-angle (Sphere.cpp:145-158)
    ts = sphere_ts(scene.sph_center[si], scene.sph_cdelta[si],
                   scene.sph_radius[si], jnp.ones_like(is_sph), org, dr, tm,
                   T_MIN, BIG)                              # (N, L)
    # component form — no (N, L, 3) intermediates (see ops/intersect.py)
    cen, cd = scene.sph_center[si], scene.sph_cdelta[si]
    tmn = tm[:, None]
    ocx = cen[None, :, 0] + tmn * cd[None, :, 0] - org[:, 0:1]
    ocy = cen[None, :, 1] + tmn * cd[None, :, 1] - org[:, 1:2]
    ocz = cen[None, :, 2] + tmn * cd[None, :, 2] - org[:, 2:3]
    dist2 = ocx * ocx + ocy * ocy + ocz * ocz               # (N, L)
    r = scene.sph_radius[si][None, :]
    ratio = jnp.clip(1.0 - r * r / jnp.maximum(dist2, 1e-12), 0.0, 1.0)
    cos_max = safe_sqrt(ratio)
    solid = 2.0 * jnp.pi * (1.0 - cos_max)
    hit_s = ts < BIG * 0.5
    # double-where: the masked branch must stay finite in fwd AND bwd
    solid_safe = jnp.where(hit_s, jnp.maximum(solid, 1e-12), 1.0)
    pdf_s = jnp.where(hit_s, 1.0 / solid_safe, 0.0)

    # ---- quad lights: hit test then dist^2/(cos*area) (Plane.cpp:115-126)
    tq = quad_ts(scene.quad_corner[qi], scene.quad_u[qi], scene.quad_v[qi],
                 scene.quad_normal[qi], scene.quad_d[qi], scene.quad_w[qi],
                 jnp.ones_like(is_sph), org, dr, T_MIN, BIG)  # (N, L)
    qn = scene.quad_normal[qi]
    cosine = jnp.abs(dr[:, 0:1] * qn[None, :, 0]
                     + dr[:, 1:2] * qn[None, :, 1]
                     + dr[:, 2:3] * qn[None, :, 2])
    # dr unit => distance = t, distance^2 = t^2. Double-where: tq is BIG
    # (1e30) in missed lanes, and BIG^2 overflows fp32 to inf, which turns
    # the backward pass into NaN even though the forward value is masked.
    hit_q = tq < BIG * 0.5
    tq_safe = jnp.where(hit_q, tq, 1.0)
    pdf_q = jnp.where(
        hit_q,
        tq_safe * tq_safe
        / jnp.maximum(cosine * scene.quad_area[qi][None, :], 1e-12),
        0.0)

    pdf = jnp.where(is_sph[None, :], pdf_s, pdf_q)
    return jnp.where(scene.light_active[None, :], pdf, 0.0)


def light_pdf_value(scene: FlatScene, org, dr, tm):
    """Uniform-average mixture over lights (HittableList::pdf_value
    HittableList.cpp:44-56). Returns (N,)."""
    pdfs = light_pdf_values(scene, org, dr, tm)
    n = max(scene.n_lights, 1)
    return jnp.sum(pdfs, axis=1) / n


def light_sample(scene: FlatScene, org, tm, u_sel, u1, u2):
    """Sample a direction toward a uniformly chosen light
    (HittableList::random HittableList.cpp:58-64). Returns unit (N, 3)."""
    n = max(scene.n_lights, 1)
    l = jnp.clip((u_sel * n).astype(jnp.int32), 0, n - 1)
    _, is_sph, si, qi = _gather_light(scene, l)

    # sphere: cone sampling via ONB toward center (Sphere.cpp:160-188)
    c_t = scene.sph_center[si] + tm[:, None] * scene.sph_cdelta[si]
    to_c = c_t - org
    dist2 = jnp.maximum(jnp.sum(to_c * to_c, axis=-1), 1e-12)
    r = scene.sph_radius[si]
    ratio = jnp.clip(1.0 - r * r / dist2, 0.0, 1.0)
    z = 1.0 + u2 * (safe_sqrt(ratio) - 1.0)
    phi = 2.0 * jnp.pi * u1
    s = safe_sqrt(1.0 - z * z)
    local = jnp.stack([jnp.cos(phi) * s, jnp.sin(phi) * s, z], axis=-1)
    bu, bv, bw = onb_from_w(to_c)
    dir_s = onb_local(bu, bv, bw, local)

    # quad: uniform area point (Plane.cpp:128-133)
    pt = (scene.quad_corner[qi] + u1[:, None] * scene.quad_u[qi]
          + u2[:, None] * scene.quad_v[qi])
    dir_q = pt - org

    d = jnp.where(is_sph[:, None], dir_s, dir_q)
    return normalize(d)
