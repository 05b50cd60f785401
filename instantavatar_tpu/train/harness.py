"""Training harness — the explicit-loop replacement for PyTorch Lightning.

Covers the reference's narrow Lightning usage (SURVEY §2.1/§5): epoch loop
with one frame per step, validation every N epochs with progression
images + error heatmaps, top-k + last checkpointing keyed on val PSNR,
auto-resume from the latest checkpoint, TensorBoard scalar/image logging,
test loop writing ``test/{i}.png`` [gt|pred|errmap] triptychs and a
``results.txt`` with mean PSNR/SSIM/LPIPS (train.py:16-23, eval.py:93-118,
DNeRF.py:163-239).

Checkpointing uses orbax (whole TrainState pytree: params, optimizer
state, occupancy grid, deformer bake, step) — grids ride along exactly
like the reference's registered buffers (density_grid.py:31-32).
"""
from __future__ import annotations

import json
import shutil
import time
from pathlib import Path
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .model import AvatarModel, RenderSession, TrainState

__all__ = ["Trainer", "save_checkpoint", "restore_checkpoint",
           "latest_checkpoint"]


# -- checkpoint helpers ------------------------------------------------------

def save_checkpoint(ckpt_dir: str | Path, state: TrainState,
                    metrics: dict | None = None) -> Path:
    import orbax.checkpoint as ocp
    ckpt_dir = Path(ckpt_dir).absolute()
    step = int(state.step)
    path = ckpt_dir / f"step_{step:08d}"
    if path.exists():
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    if metrics is not None:
        (path / "metrics.json").write_text(json.dumps(metrics))
    return path


def latest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    cands = sorted(p for p in ckpt_dir.iterdir()
                   if p.is_dir() and p.name.startswith("step_"))
    return cands[-1] if cands else None


def restore_checkpoint(path: str | Path, target: TrainState) -> TrainState:
    """Restore into the structure of ``target`` (an initialized state)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), target=target)


def restore_checkpoint_raw(path: str | Path):
    """Structure-free restore (nested dicts keyed by NamedTuple fields) —
    used for cross-stage checkpoint surgery where optimizer/params
    structures differ between stages (eval.py:64-68 analog)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute())


def graft(target, raw):
    """Copy leaves from a raw-restored nested-dict pytree onto the
    structure of ``target`` (NamedTuples matched by field name)."""
    if hasattr(target, "_fields"):  # NamedTuple
        return type(target)(*(graft(getattr(target, f), raw[f])
                              for f in target._fields))
    if isinstance(target, dict):
        return {k: graft(v, raw[k]) for k, v in target.items()}
    if isinstance(target, (list, tuple)):
        return type(target)(graft(t, r) for t, r in zip(target, raw))
    import jax.numpy as jnp
    return jnp.asarray(raw)


def _to_image(x: np.ndarray) -> np.ndarray:
    return (np.clip(x, 0.0, 1.0) * 255).astype(np.uint8)


class Trainer:
    """Explicit train/val/test loops around an AvatarModel."""

    def __init__(self, avatar: AvatarModel, datamodule,
                 workdir: str | Path = ".",
                 max_epochs: int = 30,
                 check_val_every_n_epoch: int = 10,
                 log_every_n_steps: int = 50,
                 resume: bool = True,
                 seed: int = 42,
                 eval_chunk: int = 16384,
                 evaluator=None,
                 lr_schedule=None,
                 multi_step: int = 4):
        self.avatar = avatar
        self.dm = datamodule
        self.workdir = Path(workdir)
        self.ckpt_dir = self.workdir / "checkpoints"
        self.max_epochs = max_epochs
        self.check_val_every = check_val_every_n_epoch
        self.log_every = log_every_n_steps
        self.resume = resume
        self.seed = seed
        self.eval_chunk = eval_chunk
        self.evaluator = evaluator
        # K steps per dispatch (train_multi_step): each jit dispatch
        # through the remote-TPU tunnel costs ~50-100 ms on top of the
        # device step; K=4 amortizes it. 1 = per-step dispatch.
        self.multi_step = max(1, int(multi_step))
        # step -> lr, for the LearningRateMonitor-parity train/lr log
        self.lr_schedule = lr_schedule
        self._writer = None
        self.best_psnr = -np.inf
        # one render session for the whole run: val/test renders at the
        # same resolution reuse learned budget capacities across epochs
        self.render_session = RenderSession()

    @property
    def writer(self):
        if self._writer is None:
            from tensorboardX import SummaryWriter
            self._writer = SummaryWriter(str(self.workdir / "tensorboard"))
        return self._writer

    # -- fit ------------------------------------------------------------------

    def fit(self, state: TrainState | None = None) -> TrainState:
        trainset = self.dm.trainset
        steps_per_epoch = len(trainset)
        key = jax.random.PRNGKey(self.seed)

        if state is None:
            smpl0 = None
            if self.avatar.optimize_smpl or getattr(self.avatar,
                                                    "smpl_init", False):
                from .smpl_params import SMPLParams
                smpl0 = SMPLParams.from_arrays(trainset.get_smpl_params())
            # jit the init: eager dispatch through remote-TPU links is
            # ~10-50ms/op and the SNARF canonical bake has thousands of ops
            state = jax.jit(self.avatar.init)(
                jax.random.PRNGKey(self.seed),
                jnp.asarray(trainset.smpl_params["betas"]), smpl0)
        if self.resume:
            last = latest_checkpoint(self.ckpt_dir)
            if last is not None:
                state = restore_checkpoint(last, state)
                print(f"[trainer] resumed from {last}")

        # the ONLY state.step host read of the loop — after this the step
        # counter is tracked host-side (a per-step int(state.step) costs a
        # ~33 ms device sync through the remote-TPU tunnel, PERF.md)
        step = int(state.step)
        start_epoch = step // max(steps_per_epoch, 1)
        rng = np.random.default_rng(self.seed)
        t0 = time.time()
        # input pipeline: decode/sample AND device-transfer the next batch
        # on a worker thread while the device runs the current step — the
        # packed single-blob transfer collapses ~14 per-leaf tunnel round
        # trips (~10-50 ms each, PERF.md) into one (utils/prefetch.py; the
        # TPU analog of the reference's 8 dataloader workers + pinned
        # memory, peoplesnapshot.py:164-171).
        from ..utils.prefetch import DevicePrefetcher
        prefetcher = DevicePrefetcher(trainset.__getitem__)
        group = self.multi_step

        def log(losses, epoch):
            scal = {k: float(v) for k, v in losses.items()
                    if np.ndim(v) == 0}
            if self.lr_schedule is not None:
                scal["lr"] = float(self.lr_schedule(step))
            for k, v in scal.items():
                self.writer.add_scalar(f"train/{k}", v, step)
            print(f"[trainer] epoch {epoch} step {step} "
                  f"loss={scal.get('loss', float('nan')):.4f} "
                  f"({time.time() - t0:.0f}s)")

        try:
            for epoch in range(start_epoch, self.max_epochs):
                order = rng.permutation(steps_per_epoch)
                if group > 1:
                    # one key split per epoch (a per-step split is a
                    # tunnel dispatch of its own)
                    keys_ep = jax.random.split(key, steps_per_epoch + 1)
                    key, off = keys_ep[0], 0
                    for batch in prefetcher.iterate_grouped(order, group):
                        k = int(batch["idx"].shape[0])
                        state, losses = self.avatar.train_multi_step(
                            state, batch, keys_ep[1 + off:1 + off + k])
                        off += k
                        step += k
                        if step % self.log_every < k:
                            log(losses, epoch)
                else:
                    for batch in prefetcher.iterate(order):
                        key, sub = jax.random.split(key)
                        state, losses = self.avatar.step(
                            state, batch, sub, step=step)
                        step += 1
                        if step % self.log_every == 0:
                            log(losses, epoch)

                if (epoch + 1) % self.check_val_every == 0 \
                        or epoch == self.max_epochs - 1:
                    metrics = self.validate(state, epoch)
                    save_checkpoint(self.ckpt_dir, state,
                                    {"epoch": epoch, **metrics})
                    self._prune_checkpoints(keep=2)
        finally:
            prefetcher.close()
        return state

    def _prune_checkpoints(self, keep: int = 2):
        """Keep the best-val-PSNR checkpoint plus the latest (the
        reference's ModelCheckpoint save_top_k=1 + save_last,
        train.py:16-22)."""
        cands = sorted(p for p in self.ckpt_dir.iterdir()
                       if p.is_dir() and p.name.startswith("step_"))
        if len(cands) <= keep:
            return

        def psnr_of(p):
            mf = p / "metrics.json"
            try:
                return json.loads(mf.read_text()).get("psnr", -1e9)
            except Exception:
                return -1e9

        keep_set = {cands[-1], max(cands, key=psnr_of)}
        for p in cands:
            if p not in keep_set:
                shutil.rmtree(p)

    # -- validation -----------------------------------------------------------

    def validate(self, state: TrainState, epoch: int = 0) -> dict:
        """Validation pass — TB-panel parity with the reference
        (DNeRF.py:171-223): rgb loss + counter_avg/counter_max scalars on
        every val frame (rendered pipelined), plus for frame 0 the
        progression image, rgb/alpha error heatmaps (``val/errmap``) and a
        canonical-pose sanity render (``val/cano_pose`` — a deformer
        failure shows up here before it shows in metrics)."""
        if not hasattr(self.dm, "valset") or len(self.dm.valset) == 0:
            return {}
        ds = self.dm.valset
        H, W = ds.image_shape
        step = int(state.step)
        psnrs, rgb_losses, c_avg, c_max = [], [], [], []
        stash: dict[int, dict] = {}

        def batch_gen():
            for i in range(len(ds)):
                b = ds[i]
                stash[i] = {"rgb": np.asarray(b["rgb"]),
                            "alpha": np.asarray(b["alpha"])}
                if i == 0:
                    stash["b0"] = b
                yield b

        first = None
        for i, out in enumerate(self.avatar.render_frames(
                state, batch_gen(), chunk=self.eval_chunk,
                image_shape=(H, W), session=self.render_session)):
            pred = out["rgb"].reshape(H, W, 3)
            ref = stash.pop(i)
            gt = ref["rgb"].reshape(H, W, 3)
            mse = float(np.mean((pred - gt) ** 2))
            rgb_losses.append(mse)
            psnrs.append(-10 * np.log10(max(mse, 1e-12)))
            c_avg.append(float(out["counter"].mean()))
            c_max.append(float(out["counter"].max()))
            if i == 0:
                first = (pred, gt, out["alpha"].reshape(H, W),
                         ref["alpha"].reshape(H, W))

        if first is not None:
            import cv2
            pred, gt, alpha, alpha_gt = first
            err_rgb = np.sqrt(((pred - gt) ** 2).sum(-1)) / np.sqrt(3)
            err_rgb = cv2.applyColorMap(
                (np.clip(err_rgb, 0, 1) * 255).astype(np.uint8),
                cv2.COLORMAP_JET)[..., ::-1] / 255.0
            err_a = cv2.applyColorMap(
                (np.clip(np.abs(alpha - alpha_gt), 0, 1) * 255)
                .astype(np.uint8), cv2.COLORMAP_JET)[..., ::-1] / 255.0
            panel = np.concatenate([gt[..., ::-1], err_rgb, err_a], axis=1)
            self.writer.add_image("val/errmap", _to_image(panel), step,
                                  dataformats="HWC")
            prog = np.concatenate([gt, pred], axis=1)
            self.writer.add_image("val/progression",
                                  _to_image(prog[..., ::-1]), step,
                                  dataformats="HWC")
            vdir = self.workdir / "val"
            vdir.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(vdir / f"epoch_{epoch:04d}.png"),
                        _to_image(np.concatenate([gt, pred], axis=1)))

            # canonical-pose sanity render (DNeRF.py:208-222): zeroed body
            # pose with legs slightly apart, same camera/translation
            cano = dict(stash["b0"])
            bp = np.zeros_like(np.asarray(cano["body_pose"]))
            bp[..., 2], bp[..., 5] = 0.5, -0.5
            cano["body_pose"] = bp
            dist = float(np.linalg.norm(np.asarray(cano["transl"])))
            n_rays = np.asarray(cano["rays_o"]).reshape(-1, 3).shape[0]
            cano["near"] = np.full((n_rays,), dist - 1, np.float32)
            cano["far"] = np.full((n_rays,), dist + 1, np.float32)
            cano_out = self.avatar.render_frame(
                state, cano, chunk=self.eval_chunk,
                session=self.render_session)
            cano_img = cano_out["rgb"].reshape(H, W, 3)
            cpanel = np.concatenate([gt, pred, cano_img], axis=1)
            self.writer.add_image("val/cano_pose",
                                  _to_image(cpanel[..., ::-1]), step,
                                  dataformats="HWC")

        metrics = {"psnr": float(np.mean(psnrs))}
        self.writer.add_scalar("val/psnr", metrics["psnr"], step)
        self.writer.add_scalar("val/rgb_loss", float(np.mean(rgb_losses)),
                               step)
        self.writer.add_scalar("val/counter_avg", float(np.mean(c_avg)),
                               step)
        self.writer.add_scalar("val/counter_max", float(np.max(c_max)),
                               step)
        print(f"[trainer] val epoch {epoch}: psnr={metrics['psnr']:.2f} "
              f"counter_avg={np.mean(c_avg):.1f}")
        return metrics

    # -- test -------------------------------------------------------------------

    def test(self, state: TrainState, split: str = "test") -> dict:
        """Render the test split, write [gt|pred|errmap] triptychs and
        results.txt (eval.py:93-118, DNeRF.py:225-239)."""
        import cv2
        ds = getattr(self.dm, f"{split}set")
        H, W = ds.image_shape
        out_dir = self.workdir / "test"
        out_dir.mkdir(parents=True, exist_ok=True)
        if self.evaluator is None:
            from ..utils.metrics import Evaluator
            self.evaluator = Evaluator()
        agg: dict[str, list] = {}
        gts: dict[int, np.ndarray] = {}

        def batch_gen():
            for i in range(len(ds)):
                b = ds[i]
                gts[i] = np.asarray(b["rgb"])  # only depth+1 live at once
                yield b

        for i, out in enumerate(self.avatar.render_frames(
                state, batch_gen(), chunk=self.eval_chunk,
                image_shape=(H, W), session=self.render_session)):
            pred = out["rgb"].reshape(H, W, 3)
            gt = gts.pop(i).reshape(H, W, 3)
            err = np.abs(pred - gt).mean(-1, keepdims=True)
            err = np.repeat(err / max(err.max(), 1e-6), 3, axis=-1)
            trip = np.concatenate([gt, pred, err], axis=1)
            cv2.imwrite(str(out_dir / f"{i}.png"), _to_image(trip))
            m = self.evaluator(pred, gt)
            for k, v in m.items():
                agg.setdefault(k, []).append(v)
        results = {k: float(np.mean(v)) for k, v in agg.items()}
        txt = "\n".join(f"{k}: {v}" for k, v in results.items())
        if "lpips" not in results:
            reason = getattr(self.evaluator, "lpips_skip_reason", None) \
                or "no LPIPS evaluator"
            txt += f"\nlpips: SKIPPED ({reason})"
        (self.workdir / "results.txt").write_text(txt + "\n")
        print(f"[trainer] test: {results}")
        return results
