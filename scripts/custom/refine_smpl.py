#!/usr/bin/env python
"""SMPL refinement against 2-D evidence — JAX-native.

Capability parity with /root/reference/scripts/custom/refine-smpl.py: take
per-frame ROMP estimates (poses.npz) and refine them so that (1) projected
BODY25 joints match OpenPose keypoints (confidence-weighted robust loss +
temporal vertex smoothness; reference stage 1, refine-smpl.py:188-208),
and (2, optional) the projected body matches the segmentation silhouette
(reference stage 2 uses a pytorch3d soft rasterizer; here a symmetric 2-D
chamfer between projected surface points and mask-boundary points — same
objective, rasterizer-free and TPU-friendly). Hand/foot pose tails are
zeroed like the reference. Writes poses_optimized.npz.

Usage:
    python scripts/custom/refine_smpl.py --data-dir data/custom/<seq>
        [--smpl-path data/SMPLX/smpl] [--gender neutral] [--silhouette]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def gm(x, sigma=100.0):
    """Geman-McClure robust penalty on squared pixel errors."""
    sq = x * x
    return sq / (sq + sigma ** 2) * sigma ** 2


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from instantavatar_tpu.body import load_smpl_model, smpl_forward
    from instantavatar_tpu.body.extra_joints import body25_keypoints_or_core

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--smpl-path", default="data/SMPLX/smpl")
    ap.add_argument("--gender", default="neutral")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--w-temporal", type=float, default=0.1)
    ap.add_argument("--silhouette", action="store_true",
                    help="run the chamfer silhouette stage")
    ap.add_argument("--sil-iters", type=int, default=100)
    args = ap.parse_args()

    root = Path(args.data_dir)
    try:
        model = load_smpl_model(args.smpl_path, args.gender)
    except (FileNotFoundError, OSError):
        from instantavatar_tpu.body import toy_smpl_model
        print("[refine] WARNING: SMPL pkl not found; using the toy body "
              "(core-joint keypoints only)")
        model = toy_smpl_model()
    cam = np.load(root / "cameras.npz")
    K = jnp.asarray(cam["intrinsic"], jnp.float32)
    raw = dict(np.load(root / "poses.npz"))
    if "thetas" in raw:
        raw["global_orient"] = raw["thetas"][..., :3]
        raw["body_pose"] = raw["thetas"][..., 3:]
    keypoints = np.load(root / "keypoints.npy")     # (N, 25, 3) x,y,conf

    params = {
        "betas": jnp.asarray(raw["betas"], jnp.float32).reshape(1, -1)[:, :10],
        "global_orient": jnp.asarray(raw["global_orient"], jnp.float32),
        "body_pose": jnp.asarray(raw["body_pose"], jnp.float32),
        "transl": jnp.asarray(raw["transl"], jnp.float32),
    }
    kp = jnp.asarray(keypoints, jnp.float32)

    def project(x):
        p = x @ K.T
        return p[..., :2] / jnp.maximum(p[..., 2:3], 1e-6)

    def keypoint_loss(params):
        out = smpl_forward(model, params["betas"], params["body_pose"],
                           params["global_orient"], params["transl"])
        j25, slots = body25_keypoints_or_core(out.joints, out.vertices)
        kp_sel = kp[:, slots]
        p2d = project(j25)
        conf = kp_sel[..., 2]
        err = jnp.linalg.norm(p2d - kp_sel[..., :2], axis=-1)
        loss = jnp.sum(conf * gm(err)) / jnp.maximum(conf.sum(), 1.0)
        # temporal smoothness on vertices (refine-smpl.py stage 1)
        v = out.vertices
        loss = loss + args.w_temporal * jnp.mean(
            jnp.abs(v[1:] - v[:-1])) * 1e3
        return loss

    opt = optax.adam(args.lr)
    ost = opt.init(params)

    @jax.jit
    def step(params, ost):
        loss, g = jax.value_and_grad(keypoint_loss)(params)
        updates, ost = opt.update(g, ost)
        return optax.apply_updates(params, updates), ost, loss

    for i in range(args.iters):
        params, ost, loss = step(params, ost)
        if i % 50 == 0:
            print(f"[refine] kp iter {i}: loss {float(loss):.3f}")

    if args.silhouette:
        import cv2
        import glob
        mask_files = sorted(glob.glob(str(root / "masks/*")))
        contours = []
        max_pts = 512
        for mf in mask_files:
            m = (np.load(mf) if mf.endswith(".npy")
                 else cv2.imread(mf, cv2.IMREAD_GRAYSCALE) / 255.0)
            cs, _ = cv2.findContours((m > 0.5).astype(np.uint8),
                                     cv2.RETR_EXTERNAL,
                                     cv2.CHAIN_APPROX_NONE)
            pts = (np.concatenate([c.reshape(-1, 2) for c in cs])
                   if cs else np.zeros((1, 2)))
            sel = np.linspace(0, len(pts) - 1, max_pts).astype(int)
            contours.append(pts[sel].astype(np.float32))
        contours = jnp.asarray(np.stack(contours))     # (N, P, 2)

        def sil_loss(params):
            out = smpl_forward(model, params["betas"], params["body_pose"],
                               params["global_orient"], params["transl"])
            p2d = project(out.vertices[:, ::8])        # (N, V/8, 2)
            d = jnp.linalg.norm(p2d[:, :, None] - contours[:, None],
                                axis=-1)               # (N, V/8, P)
            # symmetric chamfer: contour->verts + boundary-ish verts->contour
            loss = d.min(axis=1).mean() + d.min(axis=2).mean() * 0.1
            return loss

        opt2 = optax.adam(args.lr * 0.3)
        ost2 = opt2.init(params)

        @jax.jit
        def sstep(params, ost):
            loss, g = jax.value_and_grad(
                lambda p: sil_loss(p) + keypoint_loss(p))(params)
            updates, ost = opt2.update(g, ost)
            return optax.apply_updates(params, updates), ost, loss

        for i in range(args.sil_iters):
            params, ost2, loss = sstep(params, ost2)
            if i % 25 == 0:
                print(f"[refine] sil iter {i}: loss {float(loss):.3f}")

    out = {k: np.array(v) for k, v in params.items()}  # writable copies
    # zero hand/wrist pose tail like the reference (refine-smpl.py)
    out["body_pose"][:, 60:] = 0.0
    np.savez(root / "poses_optimized.npz", **out)
    print(f"[refine] wrote {root / 'poses_optimized.npz'}")


if __name__ == "__main__":
    main()
