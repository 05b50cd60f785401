"""Diagnose the quality plateau: WHERE does the val error live?

quality_bench r4 measured train patch loss ~5e-4 (≈33 dB on sampled
patches) while whole-frame val PSNR plateaued ~18.5 dB @540px. This
trains the same protocol at a configurable size and then decomposes the
error to localize the divergence:

  1. per-frame PSNR on TRAIN frames vs VAL frames (pose generalization);
  2. PSNR inside the GT mask vs outside (body blur vs bg floaters);
  3. the TRAIN code path (render(eval_mode=False), full pixels) vs the
     eval fused path on the same frame (eval-path mismatch);
  4. eval with the TRAINED deformer budgets vs the full-budget deformer
     (search-config mismatch).

Run: python tools/diag_quality.py [--size 264] [--epochs 30]
Outputs JSON lines.
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

from quality_bench import BONE_RINGS, build_scene, make_flagship, psnr


def masked_psnr(a, b, m):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if m.sum() < 1:
        return float("nan")
    mse = float((((a - b) ** 2).mean(-1) * m).sum() / m.sum())
    return -10.0 * float(np.log10(max(mse, 1e-12)))


def frame_report(name, img, gt, alpha_gt):
    m_in = np.asarray(alpha_gt, np.float32) > 0.5
    m_out = ~m_in
    err = np.abs(np.asarray(img) - np.asarray(gt)).max(-1)
    return {
        "frame": name,
        "psnr": round(psnr(img, gt), 2),
        "psnr_in_mask": round(masked_psnr(img, gt, m_in), 2),
        "psnr_out_mask": round(masked_psnr(img, gt, m_out), 2),
        "pct_err_gt_0.1_out": round(
            100.0 * float((err > 0.1)[m_out].mean()), 3),
        "pct_err_gt_0.1_in": round(
            100.0 * float((err > 0.1)[m_in].mean()), 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=264)
    ap.add_argument("--train-frames", type=int, default=40)
    ap.add_argument("--val-frames", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--scene", type=str, default="/tmp/diag_scene")
    ap.add_argument("--load-state", type=str, default="")
    ap.add_argument("--save-state", type=str, default="")
    ap.add_argument("--dump-dir", type=str, default="/tmp/diag_frames")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: shrink deformer/march")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from instantavatar_tpu.body import toy_smpl_model
    from instantavatar_tpu.data import AvatarDataset, PatchSampler

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
    # full-pixel view of the train frames for eval renders: split "val"
    # so GT composites over WHITE bg (the train split pastes each frame
    # over a random background, which full-frame eval renders don't see)
    train_full = AvatarDataset(root, "val", start=0,
                               end=args.train_frames - 1)

    body = toy_smpl_model(bone_rings=BONE_RINGS)
    avatar = make_flagship(body, reduced=True, tiny=args.tiny,
                           max_epochs=args.epochs,
                           steps_per_epoch=len(train))

    if args.load_state:
        import pickle
        with open(args.load_state, "rb") as f:
            state = pickle.load(f)
        state = jax.tree.map(jnp.asarray, state)
        print(json.dumps({"event": "state_loaded",
                          "path": args.load_state}), flush=True)
    else:
        state = avatar.init(jax.random.PRNGKey(0),
                            train.smpl_params["betas"])
        from instantavatar_tpu.utils.prefetch import DevicePrefetcher
        prefetcher = DevicePrefetcher(train.__getitem__)
        key = jax.random.PRNGKey(1)
        step = 0
        t0 = time.perf_counter()
        for epoch in range(args.epochs):
            for batch in prefetcher.iterate(range(len(train))):
                key, sub = jax.random.split(key)
                state, losses = avatar.step(state, batch, sub, step=step)
                step += 1
            if (epoch + 1) % 5 == 0 or epoch == args.epochs - 1:
                print(json.dumps(
                    {"event": "epoch", "epoch": epoch + 1,
                     "loss": float(losses["loss"]),
                     "loss_rgb": float(losses["mse_loss"]),
                     "minutes": round((time.perf_counter() - t0) / 60, 2)}),
                    flush=True)
        if args.save_state:
            import pickle
            with open(args.save_state, "wb") as f:
                pickle.dump(jax.tree.map(np.asarray, state), f)

    dump = Path(args.dump_dir)
    dump.mkdir(parents=True, exist_ok=True)

    def render_full(av, ds, idx, tag):
        b = {k: v for k, v in ds[idx].items() if k not in ("rgb", "alpha")}
        out = next(iter(av.render_frames(
            state, [b], chunk=32768, image_shape=(args.size, args.size))))
        img = np.asarray(out["rgb"])
        gt = np.asarray(ds[idx]["rgb"], np.float32)
        a = np.asarray(ds[idx]["alpha"], np.float32)
        rep = frame_report(tag, img, gt, a)
        import cv2
        cv2.imwrite(str(dump / f"{tag}_pred.png"),
                    (img[..., ::-1] * 255).astype(np.uint8))
        cv2.imwrite(str(dump / f"{tag}_gt.png"),
                    (gt[..., ::-1] * 255).astype(np.uint8))
        errv = (np.abs(img - gt).mean(-1) * 4).clip(0, 1)
        cv2.imwrite(str(dump / f"{tag}_err.png"),
                    (errv * 255).astype(np.uint8))
        return rep, img

    # 1+2. train vs val frames, in/out mask decomposition (full_dense eval)
    eval_full = make_flagship(body, reduced=False, tiny=args.tiny,
                              eval_sampling="dense")
    reports = []
    for idx in (0, args.train_frames // 3, 2 * args.train_frames // 3,
                args.train_frames - 1):
        rep, _ = render_full(eval_full, train_full, idx, f"train{idx}")
        reports.append(rep)
        print(json.dumps({"event": "frame", **rep}), flush=True)
    for i in range(len(val)):
        rep, _ = render_full(eval_full, val, i, f"val{i}")
        reports.append(rep)
        print(json.dumps({"event": "frame", **rep}), flush=True)

    # 3. TRAIN code path on full pixels of train frame 0 (chunked)
    b0 = train_full[0]
    H = W = args.size
    ro = jnp.asarray(b0["rays_o"]).reshape(-1, 3)
    rd = jnp.asarray(b0["rays_d"]).reshape(-1, 3)
    gt0 = np.asarray(b0["rgb"], np.float32).reshape(-1, 3)
    cano = state.deformer_cano
    fparams = state.params["field"] if isinstance(state.params, dict) \
        else state.params
    batch_t = {k: jnp.asarray(v) for k, v in b0.items()
               if k in ("betas", "body_pose", "global_orient", "transl")}
    dstate = avatar._prepare(cano, batch_t)
    chunk = 16384
    n = ro.shape[0]
    pad = (-n) % chunk
    ro_p = jnp.concatenate([ro, jnp.zeros((pad, 3))])
    rd_p = jnp.concatenate([rd, jnp.ones((pad, 3))])

    @jax.jit
    def train_path_chunk(o, d):
        bb = dict(batch_t, rays_o=o, rays_d=d,
                  near=jnp.zeros(o.shape[0]), far=jnp.full(o.shape[0], 10.0))
        out = avatar.render(fparams, state.center, state.scale, bb,
                            cano=cano, dstate=dstate, grid=state.grid,
                            eval_mode=False, noise_std=0.0,
                            bg_color=jnp.ones((o.shape[0], 3)))
        return out["rgb"]

    imgs = []
    for s in range(0, n + pad, chunk):
        imgs.append(np.asarray(train_path_chunk(ro_p[s:s + chunk],
                                                rd_p[s:s + chunk])))
    img_train_path = np.concatenate(imgs)[:n]
    a0 = np.asarray(b0["alpha"], np.float32).reshape(-1)
    rep = frame_report("train0_TRAINPATH",
                       img_train_path.reshape(H, W, 3),
                       gt0.reshape(H, W, 3), a0.reshape(H, W))
    print(json.dumps({"event": "frame", **rep}), flush=True)
    import cv2
    cv2.imwrite(str(dump / "train0_TRAINPATH_pred.png"),
                (img_train_path.reshape(H, W, 3)[..., ::-1] * 255)
                .astype(np.uint8))

    # 4. eval with the TRAINED (reduced) deformer budgets, dense sampling
    eval_reduced = make_flagship(body, reduced=True, tiny=args.tiny,
                                 eval_sampling="dense")
    rep, _ = render_full(eval_reduced, train_full, 0, "train0_reduceddef")
    print(json.dumps({"event": "frame", **rep}), flush=True)
    rep, _ = render_full(eval_reduced, val, 0, "val0_reduceddef")
    print(json.dumps({"event": "frame", **rep}), flush=True)

    print(json.dumps({"event": "done", "frames": reports}), flush=True)


if __name__ == "__main__":
    main()
