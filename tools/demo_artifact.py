"""End-to-end demo artifact (VERDICT r2 item 4): the closest available
stand-in for the reference demo (/root/reference/bash/run-demo.sh —
PeopleSnapshot images are not present in this environment) on the 540px
analytic capsule scene:

  1. train the flagship configuration for the demo budget (30 epochs,
     reference demo protocol);
  2. record wall-clock-to-PSNR;
  3. render a 60-frame novel-view turntable and record achieved FPS;
  4. write artifacts/demo_540px.json + .md + a val panel PNG.

Run on the real TPU:  python tools/demo_artifact.py
CPU smoke:            python tools/demo_artifact.py --tiny --size 96 --epochs 2
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from quality_bench import (BONE_RINGS, build_scene, make_flagship,
                           masked_psnr, psnr, render_val)


def turntable_batches(betas: np.ndarray, smpl_params: dict, ds,
                      n_frames: int = 60):
    """Turntable protocol (cli/novel_view.py): frame-0 body pose, camera
    fixed, global_orient spun 2*pi about y."""
    from scipy.spatial.transform import Rotation
    H, W = ds.image_shape
    n_rays = H * W
    base = {
        "rays_o": ds.rays_o.reshape(-1, 3),
        "rays_d": ds.rays_d.reshape(-1, 3),
        "ray_basis": ds.ray_basis,
        "near": np.full((n_rays,), 0.1, np.float32),
        "far": np.full((n_rays,), 10.0, np.float32),
        "bg_color": np.ones((n_rays, 3), np.float32),
        "betas": betas.reshape(-1),
        "body_pose": smpl_params["body_pose"][0],
        "transl": smpl_params["transl"][0],
    }
    for i in range(n_frames):
        angle = 2 * np.pi * i / n_frames
        orient = Rotation.from_euler("y", angle).as_rotvec() \
            .astype(np.float32)
        yield {**base, "global_orient": orient, "idx": np.int32(i)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=540)
    ap.add_argument("--train-frames", type=int, default=30)
    ap.add_argument("--val-frames", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--turn-frames", type=int, default=60)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--scene", type=str, default="/tmp/demo_scene")
    ap.add_argument("--out", type=str,
                    default=str(Path(__file__).resolve().parents[1]
                                / "artifacts"))
    args = ap.parse_args()

    from instantavatar_tpu.body import toy_smpl_model
    from instantavatar_tpu.data import AvatarDataset, PatchSampler
    from instantavatar_tpu.train.model import RenderSession

    root = Path(args.scene) / f"{args.size}px"
    if not (root / "cameras.npz").exists():
        print(json.dumps({"event": "building_scene", "size": args.size}),
              flush=True)
        build_scene(args.size, args.train_frames, args.val_frames, root)

    n_patch = max(args.rays // 1024, 1)
    train = AvatarDataset(root, "train", start=0,
                          end=args.train_frames - 1,
                          sampler=PatchSampler(
                              num_patch=n_patch, patch_size=32,
                              ratio_mask=0.9,
                              rng=np.random.default_rng(0)))
    val = AvatarDataset(root, "val", start=args.train_frames,
                        end=args.train_frames + args.val_frames - 1)
    gt = [np.asarray(val[i]["rgb"], np.float32) for i in range(len(val))]
    masks = [np.asarray(val[i]["alpha"], np.float32) > 0.5
             for i in range(len(val))]

    body = toy_smpl_model(bone_rings=BONE_RINGS)
    # reduced=True is the production single-chip train config: the
    # full-budget train program needs 30.7 GB HBM vs 15.75 GB on a v5e
    # chip (measured r4, XLA:TPU OOM at compile)
    avatar = make_flagship(body, reduced=True, tiny=args.tiny,
                           max_epochs=args.epochs,
                           steps_per_epoch=len(train))
    state = avatar.init(jax.random.PRNGKey(0),
                        train.smpl_params["betas"])

    # -- 1+2. demo-budget training, wall-clock-to-PSNR --------------------
    from instantavatar_tpu.utils.prefetch import DevicePrefetcher
    prefetcher = DevicePrefetcher(train.__getitem__)
    key = jax.random.PRNGKey(1)
    curve = []
    t0 = time.perf_counter()
    t_train = 0.0
    step = 0
    for epoch in range(args.epochs):
        for batch in prefetcher.iterate(range(len(train))):
            key, sub = jax.random.split(key)
            state, losses = avatar.step(state, batch, sub, step=step)
            step += 1
        if (epoch + 1) % 5 == 0 or epoch == args.epochs - 1:
            jax.block_until_ready(state.params)
            t_train = time.perf_counter() - t0
            imgs = render_val(avatar, state, val, args.size)
            p = float(np.mean([psnr(im, g) for im, g in zip(imgs, gt)]))
            p_in = float(np.mean([masked_psnr(im, g, m)
                                  for im, g, m in zip(imgs, gt, masks)]))
            curve.append({"epoch": epoch + 1,
                          "minutes": round(t_train / 60, 2),
                          "psnr": round(p, 2),
                          "psnr_in_mask": round(p_in, 2)})
            print(json.dumps({"event": "val", **curve[-1]}), flush=True)
            t0 = time.perf_counter() - t_train

    # -- 3. novel-view turntable FPS ---------------------------------------
    betas = np.asarray(train.smpl_params["betas"])
    sess = RenderSession()
    frames = []
    # warmup (compile + budget learning): 2 frames
    warm = list(turntable_batches(betas, train.smpl_params, val, 2))
    for out in avatar.render_frames(
            state, warm,  # numpy batches: content-keyed bake reuse
            chunk=32768, depth=2, image_shape=val.image_shape,
            session=sess, payload="u8"):
        pass
    t = time.perf_counter()
    for out in avatar.render_frames(
            state,
            turntable_batches(betas, train.smpl_params, val,
                              args.turn_frames),
            chunk=32768, depth=2, image_shape=val.image_shape,
            session=sess, payload="u8"):
        frames.append(np.asarray(out["rgb"]))
    dt = time.perf_counter() - t
    fps = args.turn_frames / dt
    print(json.dumps({"event": "turntable", "fps": round(fps, 2),
                      "frames": args.turn_frames,
                      "seconds": round(dt, 2)}), flush=True)

    # -- 4. artifacts -------------------------------------------------------
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    H, W = val.image_shape
    final = render_val(avatar, state, val, args.size)
    panel = np.concatenate(
        [np.concatenate([g.reshape(H, W, 3), im.reshape(H, W, 3)], axis=1)
         for g, im in zip(gt, final)], axis=0)
    from PIL import Image
    panel_path = out_dir / f"demo_{args.size}px_panel.png"
    Image.fromarray((np.clip(panel, 0, 1) * 255).astype(np.uint8)) \
        .save(panel_path)
    turn = np.concatenate(
        [frames[i].reshape(H, W, 3)
         for i in range(0, len(frames), max(len(frames) // 6, 1))][:6],
        axis=1)
    turn_path = out_dir / f"demo_{args.size}px_turntable.png"
    Image.fromarray((np.clip(turn, 0, 1) * 255).astype(np.uint8)) \
        .save(turn_path)

    result = {
        "protocol": f"{args.size}px capsule scene, {args.train_frames} "
                    f"train frames, {args.epochs} epochs "
                    "(reference demo budget, bash/run-demo.sh)",
        "backend": jax.default_backend(),
        "curve": curve,
        "train_minutes": curve[-1]["minutes"] if curve else None,
        "final_psnr": curve[-1]["psnr"] if curve else None,
        "novel_view_fps": round(fps, 2),
        "panel": str(panel_path.relative_to(out_dir.parent)),
        "turntable": str(turn_path.relative_to(out_dir.parent)),
    }
    (out_dir / f"demo_{args.size}px.json").write_text(
        json.dumps(result, indent=1))
    md = [f"# Demo artifact — {args.size}px capsule scene",
          "",
          f"Protocol: {result['protocol']}",
          f"Backend: {result['backend']}",
          "",
          "| epoch | minutes | PSNR | in-mask PSNR |", "|---|---|---|---|"]
    md += [f"| {c['epoch']} | {c['minutes']} | {c['psnr']} "
           f"| {c.get('psnr_in_mask', '-')} |"
           for c in curve]
    md += ["",
           f"Novel-view turntable: **{result['novel_view_fps']} FPS** "
           f"({args.turn_frames} frames, {round(dt, 2)} s)",
           "",
           f"Val panel (GT | render): `{result['panel']}`",
           f"Turntable strip: `{result['turntable']}`"]
    (out_dir / f"demo_{args.size}px.md").write_text("\n".join(md) + "\n")
    print(json.dumps({"event": "done", **result}), flush=True)


if __name__ == "__main__":
    main()
