"""Synthetic avatar sequences for hermetic tests and benchmarks.

The reference's datasets require PeopleSnapshot downloads + preprocessing;
nothing comparable ships in-repo (SURVEY §4/§6). This writes a fully valid
sequence directory (cameras.npz, images/*.png, masks/*.npy, poses.npz) from
the deterministic toy SMPL body — the *real* dataset/teardown code paths
then run end-to-end without any licensed assets.

Two GT styles:
  * ``splat`` — painter's splat of per-vertex discs (host numpy/cv2):
    fast, deterministic, but hard disc edges cap achievable PSNR ~22 dB;
  * ``capsule`` — analytic ray-traced capsule body (one capsule per bone
    from the posed joints): exact intersections, Lambertian shading with
    per-bone albedo, supersampled anti-aliased coverage. Smooth and
    view-consistent, so a trained avatar can reach high PSNR against it
    — the measurable-quality benchmark VERDICT r1 asked for.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["make_synthetic_sequence", "render_capsule_frame"]


def _splat_frame(verts: np.ndarray, colors: np.ndarray, K: np.ndarray,
                 H: int, W: int, radius: int) -> tuple[np.ndarray, np.ndarray]:
    import cv2
    img = np.zeros((H, W, 3), np.float32)
    msk = np.zeros((H, W), np.float32)
    order = np.argsort(-verts[:, 2])  # far-to-near painter's order
    for i in order:
        x, y, z = verts[i]
        if z <= 0.1:
            continue
        u = int(round(K[0, 0] * x / z + K[0, 2]))
        v = int(round(K[1, 1] * y / z + K[1, 2]))
        if 0 <= u < W and 0 <= v < H:
            c = tuple(float(ch) for ch in colors[i])
            cv2.circle(img, (u, v), radius, c, -1)
            cv2.circle(msk, (u, v), radius, 1.0, -1)
    return img, msk


def _ray_capsules(o: np.ndarray, d: np.ndarray, p0: np.ndarray,
                  p1: np.ndarray, r: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Nearest intersection of rays with a capsule set (exact, analytic).

    Args:
      o: (3,) shared ray origin; d: (R, 3) unit directions.
      p0/p1: (B, 3) capsule segment ends; r: (B,) radii.
    Returns:
      (t (R,) min hit distance, inf where none; bone (R,) int argmin).
    """
    ba = p1 - p0                                        # (B, 3)
    oa = o[None] - p0                                   # (B, 3)
    baba = np.einsum("bi,bi->b", ba, ba)                # (B,)
    baoa = np.einsum("bi,bi->b", ba, oa)
    oaoa = np.einsum("bi,bi->b", oa, oa)
    bard = d @ ba.T                                     # (R, B)
    rdoa = d @ oa.T                                     # (R, B)
    a = baba[None] - bard ** 2
    b = baba[None] * rdoa - baoa[None] * bard
    c = (baba * oaoa - baoa ** 2 - r ** 2 * baba)[None]
    h = b * b - a * c
    a = np.maximum(a, 1e-12)
    sq = np.sqrt(np.maximum(h, 0.0))
    t_cyl = (-b - sq) / a
    y = baoa[None] + t_cyl * bard                       # axial coord * baba
    cyl_ok = (h > 0) & (y > 0) & (y < baba[None]) & (t_cyl > 0)
    t = np.where(cyl_ok, t_cyl, np.inf)
    # end spheres
    for pc in (p0, p1):
        oc = o[None] - pc                               # (B, 3)
        bq = d @ oc.T                                   # (R, B)
        cq = np.einsum("bi,bi->b", oc, oc)[None] - (r ** 2)[None]
        hq = bq * bq - cq
        t_sph = -bq - np.sqrt(np.maximum(hq, 0.0))
        t = np.where((hq > 0) & (t_sph > 0), np.minimum(t, t_sph), t)
    bone = np.argmin(t, axis=1)
    return t.min(axis=1), bone


def _bone_lights(joints: np.ndarray, joints_rest: np.ndarray,
                 parents: np.ndarray, light: np.ndarray) -> np.ndarray:
    """LEGACY light attachment: minimal rotation rest-axis -> posed-axis.

    INSUFFICIENT for canonical-consistency (kept only for byte-stable
    old scenes): the minimal rotation misses any rotation component
    ABOUT the bone axis — under the sequence's global yaw, bones
    parallel to the yaw axis (spine, legs: most pixels) get R = I, so
    their lit side stays fixed in WORLD space while the body rotates.
    A pose-independent canonical field cannot represent that; measured
    r4 on the 540px capsule scene, training plateaus at 17 dB with the
    val PSNR oscillating by yaw. Pass ``bone_rots`` (the FULL kinematic
    rest->posed rotations) to render_capsule_frame instead: with
    l_b = R_b @ l0 and world normal n_w = R_b n_c, Lambert shading
    -(R_b n_c)@(R_b l0) = -n_c@l0 is EXACTLY pose-invariant."""
    bones = np.arange(1, len(parents))
    u0 = joints_rest[bones] - joints_rest[parents[bones]]
    u1 = joints[bones] - joints[parents[bones]]
    u0 = u0 / np.maximum(np.linalg.norm(u0, axis=-1, keepdims=True), 1e-9)
    u1 = u1 / np.maximum(np.linalg.norm(u1, axis=-1, keepdims=True), 1e-9)
    v = np.cross(u0, u1)
    c = np.einsum("bi,bi->b", u0, u1)
    out = np.empty((len(bones), 3))
    for i in range(len(bones)):
        s2 = float(v[i] @ v[i])
        if s2 < 1e-12:
            R = np.eye(3) if c[i] > 0 else -np.eye(3)
        else:
            vx = np.array([[0, -v[i][2], v[i][1]],
                           [v[i][2], 0, -v[i][0]],
                           [-v[i][1], v[i][0], 0]])
            R = np.eye(3) + vx + vx @ vx * ((1 - c[i]) / s2)
        out[i] = R @ light
    return out.astype(np.float32)


def _capsule_shade_jax(joints, p_idx, c_idx, albedo, lights, K,
                       H: int, W: int, ss: int, radius: float):
    """jit-compiled analog of the numpy tracer below (same math; used for
    large frames where the host loop is minutes-per-frame)."""
    import jax
    import jax.numpy as jnp

    # The capsule discriminant h = b^2 - a*c cancels ~0.56 - 0.56 down to
    # the r^2*baba ~ 1e-4 scale; TPU default-bf16 matmuls (rel err ~1e-2)
    # turn that into periodic phantom bands ("slinky" GT — the r4 quality
    # plateau). Every contraction here must run at full f32 precision.
    hi = jax.lax.Precision.HIGHEST

    u = (jnp.arange(W * ss) + 0.5) / ss - 0.5
    v = (jnp.arange(H * ss) + 0.5) / ss - 0.5
    uu, vv = jnp.meshgrid(u, v)
    d = jnp.stack([(uu - K[0, 2] + 0.5) / K[0, 0],
                   (vv - K[1, 2] + 0.5) / K[1, 1],
                   jnp.ones_like(uu)], axis=-1).reshape(-1, 3)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    p0, p1 = joints[p_idx], joints[c_idx]                   # (B, 3)
    r = jnp.full((p0.shape[0],), radius)
    ba = p1 - p0
    oa = -p0
    baba = jnp.einsum("bi,bi->b", ba, ba, precision=hi)
    baoa = jnp.einsum("bi,bi->b", ba, oa, precision=hi)
    oaoa = jnp.einsum("bi,bi->b", oa, oa, precision=hi)
    bard = jnp.einsum("ri,bi->rb", d, ba, precision=hi)
    rdoa = jnp.einsum("ri,bi->rb", d, oa, precision=hi)
    a = baba[None] - bard ** 2
    b = baba[None] * rdoa - baoa[None] * bard
    c = (baba * oaoa - baoa ** 2 - r ** 2 * baba)[None]
    h = b * b - a * c
    a = jnp.maximum(a, 1e-12)
    t_cyl = (-b - jnp.sqrt(jnp.maximum(h, 0.0))) / a
    y = baoa[None] + t_cyl * bard
    cyl_ok = (h > 0) & (y > 0) & (y < baba[None]) & (t_cyl > 0)
    t = jnp.where(cyl_ok, t_cyl, jnp.inf)
    for pc in (p0, p1):
        oc = -pc
        bq = jnp.einsum("ri,bi->rb", d, oc, precision=hi)
        cq = jnp.einsum("bi,bi->b", oc, oc, precision=hi)[None] \
            - (r ** 2)[None]
        hq = bq * bq - cq
        t_sph = -bq - jnp.sqrt(jnp.maximum(hq, 0.0))
        t = jnp.where((hq > 0) & (t_sph > 0), jnp.minimum(t, t_sph), t)
    bone = jnp.argmin(t, axis=1)
    tmin = t.min(axis=1)
    hit = jnp.isfinite(tmin)
    pa = d * jnp.where(hit, tmin, 1.0)[:, None]
    a0 = p0[bone]
    ax = p1[bone] - a0
    yy2 = (jnp.einsum("ri,ri->r", pa - a0, ax, precision=hi)
           / jnp.maximum(jnp.einsum("ri,ri->r", ax, ax, precision=hi),
                         1e-12))
    foot = a0 + jnp.clip(yy2, 0.0, 1.0)[:, None] * ax
    nrm = pa - foot
    nrm = nrm / jnp.maximum(
        jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    l_b = lights[bone]                                   # (R, 3) per-bone
    lam = 0.35 + 0.65 * jnp.maximum(
        -jnp.einsum("ri,ri->r", nrm, l_b, precision=hi), 0.0)
    img = albedo[c_idx][bone] * lam[:, None] * hit[:, None]
    img = img.reshape(H, ss, W, ss, 3).mean(axis=(1, 3))
    msk = hit.astype(jnp.float32).reshape(H, ss, W, ss).mean(axis=(1, 3))
    img = img / jnp.maximum(msk[..., None], 1e-6)
    return img * (msk[..., None] > 0), msk


def render_capsule_frame(joints: np.ndarray, parents: np.ndarray,
                         K: np.ndarray, H: int, W: int,
                         radii: np.ndarray | float = 0.06,
                         ss: int = 3, seed: int = 0,
                         use_jax: bool | None = None,
                         joints_rest: np.ndarray | None = None,
                         bone_rots: np.ndarray | None = None
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Ray-trace the posed capsule body: smooth Lambert shading +
    supersampled anti-aliased coverage.

    Args:
      joints: (J, 3) posed joints in camera coords (+z forward).
      parents: (J,) kinematic parents (bone b = segment parent->joint).
      radii: per-bone radius (B,) or scalar.
      bone_rots: (J, 3, 3) FULL rest->posed rotation per JOINT (the
        rotation part of the SMPL ``A`` transforms); bone b uses its
        parent joint's rotation — the same transform that moves the
        capsule segment — making Lambert shading exactly
        pose-invariant in canonical space (see _bone_lights).
      joints_rest: legacy minimal-rotation light attachment (pose-
        DEPENDENT under axial rotation — 17 dB training ceiling,
        measured r4); prefer bone_rots.
    Returns:
      (img (H, W, 3) UNpremultiplied body color, msk (H, W) coverage) —
      the dataset's ``img * msk + (1 - msk) * bg`` then blends edges
      exactly.
    """
    rng = np.random.RandomState(seed)
    bones = np.arange(1, len(parents))
    p0 = joints[parents[bones]].astype(np.float64)
    p1 = joints[bones].astype(np.float64)
    r = np.broadcast_to(np.asarray(radii, np.float64), bones.shape).copy()
    albedo = rng.rand(len(parents), 3) * 0.6 + 0.35     # per-BONE color
    light = np.array([0.35, -0.5, 0.79])  # traveling +z: front-lit
    light /= np.linalg.norm(light)
    if bone_rots is not None:
        # segment parent->child rigidly follows the PARENT joint's global
        # transform (batch_rigid_transform: posed_c = G_p (rest_c-rest_p))
        lights = np.einsum("bij,j->bi",
                           bone_rots[parents[bones], :3, :3],
                           light).astype(np.float32)
    elif joints_rest is not None:
        lights = _bone_lights(joints, joints_rest, parents, light)
    else:
        lights = np.broadcast_to(light, (len(bones), 3)).astype(np.float32)

    if use_jax is None:
        # the host loop costs minutes per frame from ~128px up (13 min
        # for 64 frames at 264px on a 1-core host, measured r4); the
        # jitted tracer renders the same math in seconds
        use_jax = H * W * ss * ss > 1 << 17
    if use_jax and np.isscalar(radii):
        import functools

        import jax
        import jax.numpy as jnp
        key = (H, W, ss, float(radii))
        cache = globals().setdefault("_capsule_jit_cache", {})
        if key not in cache:
            cache[key] = jax.jit(functools.partial(
                _capsule_shade_jax, H=H, W=W, ss=ss, radius=float(radii)))
        fn = cache[key]
        img, msk = fn(jnp.asarray(joints, jnp.float32),
                      np.asarray(parents[bones]), np.asarray(bones),
                      jnp.asarray(albedo, jnp.float32),
                      jnp.asarray(lights, jnp.float32),
                      jnp.asarray(K, jnp.float32))
        return np.asarray(img, np.float32), np.asarray(msk, np.float32)

    u = (np.arange(W * ss) + 0.5) / ss - 0.5
    v = (np.arange(H * ss) + 0.5) / ss - 0.5
    uu, vv = np.meshgrid(u, v)
    d = np.stack([(uu - K[0, 2] + 0.5) / K[0, 0],
                  (vv - K[1, 2] + 0.5) / K[1, 1],
                  np.ones_like(uu)], axis=-1).reshape(-1, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros(3)

    img = np.zeros((H * ss * W * ss, 3))
    hit_acc = np.zeros(H * ss * W * ss)
    chunk = 262144
    for s in range(0, d.shape[0], chunk):
        dc = d[s:s + chunk]
        t, bone = _ray_capsules(o, dc, p0, p1, r)
        hit = np.isfinite(t)
        ts = np.where(hit, t, 1.0)
        pa = dc * ts[:, None]                           # o = 0
        bb = bones[bone]
        a0, a1 = p0[bone], p1[bone]
        ax = a1 - a0
        yy2 = np.einsum("ri,ri->r", pa - a0, ax) \
            / np.maximum(np.einsum("ri,ri->r", ax, ax), 1e-12)
        foot = a0 + np.clip(yy2, 0.0, 1.0)[:, None] * ax
        nrm = pa - foot
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True),
                          1e-12)
        lam = 0.35 + 0.65 * np.maximum(
            -np.einsum("ri,ri->r", nrm, lights[bone]), 0.0)
        img[s:s + chunk] = albedo[bb] * lam[:, None] * hit[:, None]
        hit_acc[s:s + chunk] = hit

    img = img.reshape(H, ss, W, ss, 3).mean(axis=(1, 3))
    msk = hit_acc.reshape(H, ss, W, ss).mean(axis=(1, 3))
    # un-premultiply: stored color = average shaded color of COVERED
    # subsamples (dataset blending re-applies coverage)
    img = img / np.maximum(msk[..., None], 1e-6)
    return (img * (msk[..., None] > 0)).astype(np.float32), \
        msk.astype(np.float32)


def make_synthetic_sequence(root: str | Path, n_frames: int = 8,
                            H: int = 64, W: int = 64,
                            ring_size: int = 8, seed: int = 0,
                            distance: float = 3.0,
                            style: str = "splat",
                            bone_rings: int = 0) -> Path:
    """Write a synthetic sequence; returns the sequence dir.

    Camera: identity extrinsics (camera at origin, z forward), focal ~ W.
    Body: toy SMPL at (0, 0, distance), arms swinging sinusoidally.
    """
    import cv2
    from ..body import smpl_forward, toy_smpl_model

    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "masks").mkdir(parents=True, exist_ok=True)

    model = toy_smpl_model(ring_size=ring_size, seed=seed,
                           bone_rings=bone_rings)
    V = model.num_verts
    rng = np.random.RandomState(seed)
    colors = rng.rand(V, 3).astype(np.float32) * 0.7 + 0.3

    f = float(W)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float64)
    extrinsic = np.eye(4)
    np.savez(root / "cameras.npz", intrinsic=K, extrinsic=extrinsic,
             height=H, width=W)

    betas = np.zeros((1, 10), np.float32)
    body_pose = np.zeros((n_frames, 69), np.float32)
    t = np.arange(n_frames, dtype=np.float32)
    # swing shoulders (joints 16/17 -> body_pose indices 15*3..16*3)
    body_pose[:, 45 + 2] = 0.5 * np.sin(t * 0.7)       # L shoulder z
    body_pose[:, 48 + 2] = -0.5 * np.sin(t * 0.7)      # R shoulder z
    global_orient = np.zeros((n_frames, 3), np.float32)
    global_orient[:, 1] = 0.3 * np.sin(t * 0.5)        # slow yaw
    # +y is up in SMPL but image +v is down; flip via orient about z? keep
    # simple: render in camera coords directly (y down is fine for tests)
    transl = np.tile(np.array([[0.0, 0.0, distance]], np.float32),
                     (n_frames, 1))

    out = smpl_forward(model, betas, body_pose, global_orient, transl)
    verts = np.asarray(out.vertices)               # (N, V, 3)
    joints = np.asarray(out.joints)                # (N, J, 3)

    radius = max(1, int(0.06 * f / distance))
    for i in range(n_frames):
        if style == "capsule":
            img, msk = render_capsule_frame(
                joints[i], np.asarray(model.parents), K, H, W,
                radii=0.07, ss=3, seed=seed,
                bone_rots=np.asarray(out.A)[i, :, :3, :3])
        else:
            img, msk = _splat_frame(verts[i], colors, K, H, W, radius)
        # written and later read via cv2 (both BGR) — consistent round-trip
        cv2.imwrite(str(root / f"images/{i:04d}.png"),
                    (img * 255).astype(np.uint8))
        np.save(root / f"masks/{i:04d}.npy", msk)

    np.savez(root / "poses.npz", betas=betas, body_pose=body_pose,
             global_orient=global_orient, transl=transl)
    return root
