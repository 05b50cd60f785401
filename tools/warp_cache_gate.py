"""On-device quality gate for cached-search training (VERDICT r3 item 4).

``train_warp_cache=True`` collapses the per-sample Broyden search into
the per-cell bake + one row gather per sample (39% faster step measured
on TPU r4: 198.2 -> 120.9 ms full batch). The r3 quality evidence for it
was CPU-only; this tool runs the decisive A/B ON THE TPU:

  * two identical training runs on the capsule scene (same seeds, same
    schedule) — full search vs cached search;
  * val PSNR trajectory for both + wall-clock per epoch;
  * gate: flip the default if the cached arm stays within 0.5 dB of the
    full arm at the final epoch while being meaningfully faster.

Run on the real TPU:  python tools/warp_cache_gate.py [--size 264]
Outputs JSON lines; paste the verdict into PERF.md.
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

from quality_bench import (BONE_RINGS, build_scene, make_flagship, psnr,
                           render_val)


def run_arm(name, cached, args, train, val, gt, body):
    avatar = make_flagship(body, reduced=True, tiny=args.tiny,
                           max_epochs=args.epochs,
                           steps_per_epoch=len(train),
                           train_warp_cache=cached)
    state = avatar.init(jax.random.PRNGKey(0),
                        train.smpl_params["betas"])
    from instantavatar_tpu.utils.prefetch import DevicePrefetcher
    prefetcher = DevicePrefetcher(train.__getitem__)
    key = jax.random.PRNGKey(1)
    curve = []
    step = 0
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        for batch in prefetcher.iterate(range(len(train))):
            key, sub = jax.random.split(key)
            state, losses = avatar.step(state, batch, sub, step=step)
            step += 1
        if (epoch + 1) % args.val_every == 0 or epoch == args.epochs - 1:
            jax.block_until_ready(state.params)
            t_train = time.perf_counter() - t0
            imgs = render_val(avatar, state, val, args.size)
            p = float(np.mean([psnr(im, g) for im, g in zip(imgs, gt)]))
            curve.append({"epoch": epoch + 1,
                          "minutes": round(t_train / 60, 2),
                          "psnr": round(p, 2)})
            print(json.dumps({"event": "val", "arm": name, **curve[-1]}),
                  flush=True)
            t0 = time.perf_counter() - t_train
    return curve


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=264)
    ap.add_argument("--train-frames", type=int, default=30)
    ap.add_argument("--val-frames", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--val-every", type=int, default=5)
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--scene", type=str, default="/tmp/gate_scene")
    args = ap.parse_args()

    from instantavatar_tpu.body import toy_smpl_model
    from instantavatar_tpu.data import AvatarDataset, PatchSampler

    root = Path(args.scene) / f"{args.size}px"
    if not (root / "cameras.npz").exists():
        print(json.dumps({"event": "building_scene", "size": args.size}),
              flush=True)
        build_scene(args.size, args.train_frames, args.val_frames, root)

    n_patch = max(args.rays // 1024, 1)
    mk = lambda: PatchSampler(num_patch=n_patch, patch_size=32,
                              ratio_mask=0.9,
                              rng=np.random.default_rng(0))
    val = AvatarDataset(root, "val", start=args.train_frames,
                        end=args.train_frames + args.val_frames - 1)
    gt = [np.asarray(val[i]["rgb"], np.float32) for i in range(len(val))]
    body = toy_smpl_model(bone_rings=BONE_RINGS)

    curves = {}
    for name, cached in (("full", False), ("cached", True)):
        # fresh sampler per arm -> identical patch sequences
        train = AvatarDataset(root, "train", start=0,
                              end=args.train_frames - 1, sampler=mk())
        curves[name] = run_arm(name, cached, args, train, val, gt, body)

    d_psnr = curves["cached"][-1]["psnr"] - curves["full"][-1]["psnr"]
    speedup = (curves["full"][-1]["minutes"]
               / max(curves["cached"][-1]["minutes"], 1e-9))
    print(json.dumps({
        "event": "gate",
        "final_psnr_full": curves["full"][-1]["psnr"],
        "final_psnr_cached": curves["cached"][-1]["psnr"],
        "delta_db": round(d_psnr, 2),
        "train_speedup": round(speedup, 2),
        "pass": bool(d_psnr >= -0.5),
    }), flush=True)


if __name__ == "__main__":
    main()
