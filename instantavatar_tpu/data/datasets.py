"""Avatar video datasets — PeopleSnapshot and in-the-wild ("custom") formats.

Capability parity with /root/reference/instant_avatar/datasets/
{peoplesnapshot.py,custom.py}: ``cameras.npz`` intrinsic/extrinsic/h/w, a
precomputed per-pixel ray grid, frame range start/end/skip + downscale
(halving K), mask-composited images over random (train) or white (val/test)
backgrounds, SMPL-parameter resolution order (refine -> anim_nerf_test,
else anim_nerf_{split} -> {split}.npz -> raw poses.npz sliced), and
near/far = ||transl|| -/+ 1.

TPU-first: everything here is host-side numpy with *static shapes per
split* (train: fixed patch stacks; val/test: full H*W rays) so every batch
hits the same compiled executable. The Lightning DataModule surface is
replaced by ``AvatarDataModule`` — plain iterators with shuffling; device
transfer happens in the train loop (with async prefetch).
"""
from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import Any, Iterator

import numpy as np

from .rays import make_ray_basis, make_ray_grid, near_far_from_transl
from .samplers import EdgeSampler, PatchSampler

__all__ = ["load_smpl_param", "AvatarDataset", "AvatarDataModule"]


def load_smpl_param(path: str | Path) -> dict[str, np.ndarray]:
    """Load a pose npz; accepts either split betas/body_pose/global_orient/
    transl keys or packed ``thetas`` (N, 72) (peoplesnapshot.py:27-37)."""
    raw = dict(np.load(str(path)))
    if "thetas" in raw:
        raw["global_orient"] = raw["thetas"][..., :3]
        raw["body_pose"] = raw["thetas"][..., 3:]
    return {
        "betas": raw["betas"].astype(np.float32).reshape(1, 10),
        "body_pose": raw["body_pose"].astype(np.float32),
        "global_orient": raw["global_orient"].astype(np.float32),
        "transl": raw["transl"].astype(np.float32),
    }


def _imread_rgb(path: str) -> np.ndarray:
    import cv2
    img = cv2.imread(path)                       # BGR, matching reference
    return (img[..., :3] / 255.0).astype(np.float32)


def _load_mask(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    import cv2
    m = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    return (m / 255.0).astype(np.float32)


class AvatarDataset:
    """One split of a monocular avatar video.

    Args (mirroring the reference conf surface):
      root: sequence directory (cameras.npz, images/, masks/, poses*).
      split: train/val/test.
      start/end/skip: frame range (end inclusive).
      downscale: image downscale factor (K scaled accordingly).
      sampler: PatchSampler/EdgeSampler for train, None for full images.
      refine: load test-pose file for pose refinement (eval flow).
      fitting: ignore cached per-split pose files (fit-from-scratch flow,
        custom.py:62-79).
      near/far: optional fixed values; default ||transl|| -/+ 1.
    """

    def __init__(self, root: str | Path, split: str, *,
                 start: int = 0, end: int = 0, skip: int = 1,
                 downscale: int = 1,
                 sampler: PatchSampler | EdgeSampler | None = None,
                 refine: bool = False, fitting: bool = False,
                 near: float | None = None, far: float | None = None,
                 mask_ext: str | None = None,
                 native: bool = False,
                 bg_rng: np.random.Generator | None = None):
        root = Path(root)
        self.root = root
        self.split = split
        cam = np.load(root / "cameras.npz")
        K = cam["intrinsic"].astype(np.float64).copy()
        c2w = np.linalg.inv(cam["extrinsic"])
        H, W = int(cam["height"]), int(cam["width"])
        if downscale > 1:
            H, W = int(H / downscale), int(W / downscale)
            K[:2] /= downscale
        self.downscale = downscale
        self.image_shape = (H, W)
        self.rays_o, self.rays_d = make_ray_grid(K, c2w, H, W)
        self.ray_basis = make_ray_basis(K, c2w)

        sl = slice(start, end + 1, skip)
        self.img_lists = sorted(glob.glob(f"{root}/images/*.png"))[sl]
        if mask_ext is None:
            mask_ext = "npy" if glob.glob(f"{root}/masks/*.npy") else "png"
        self.msk_lists = sorted(glob.glob(f"{root}/masks/*.{mask_ext}"))[sl]

        self.smpl_params = self._resolve_poses(root, split, refine, fitting,
                                               sl)
        self.near, self.far = near, far
        self.sampler = sampler if split == "train" else None
        self.bg_rng = bg_rng or np.random.default_rng()

        # opt-in native data engine (C++ threaded decode + resident cache
        # + native patch sampling); PatchSampler-compatible train splits
        # and full-frame eval splits only, silent fallback otherwise
        self._native = None
        if native and downscale in (1, 2, 4, 8) \
                and (self.sampler is None
                     or isinstance(self.sampler, PatchSampler)):
            try:
                from .native_loader import NativeSequenceCache
                self._native = NativeSequenceCache(
                    self.img_lists, self.msk_lists, downscale=downscale)
                self._native_seed = int(self.bg_rng.integers(2 ** 31))
            except Exception as e:  # toolchain/libpng missing
                import warnings
                warnings.warn(f"native loader unavailable ({e}); using "
                              "the Python path", stacklevel=2)

    @staticmethod
    def _resolve_poses(root: Path, split: str, refine: bool, fitting: bool,
                       sl: slice) -> dict[str, np.ndarray]:
        if refine:
            cached = root / "poses/anim_nerf_test.npz"
        elif fitting:
            cached = None
        else:
            cached = None
            for cand in (root / f"poses/anim_nerf_{split}.npz",
                         root / f"poses/{split}.npz",
                         root / "poses_optimized.npz"):
                if cand.exists():
                    cached = cand
                    break
        if cached is not None and cached.exists():
            params = load_smpl_param(cached)
            # poses_optimized is full-length and must be range-sliced
            if cached.name == "poses_optimized.npz":
                params = {k: (v if k == "betas" else v[sl])
                          for k, v in params.items()}
            return params
        params = load_smpl_param(root / "poses.npz")
        return {k: (v if k == "betas" else v[sl]) for k, v in params.items()}

    def __len__(self) -> int:
        return len(self.img_lists)

    def get_smpl_params(self) -> dict[str, np.ndarray]:
        """Full per-frame parameter arrays (for SMPLParamEmbedding init)."""
        return {k: v.copy() for k, v in self.smpl_params.items()}

    def _getitem_native(self, idx: int) -> dict[str, Any]:
        smp = self.sampler
        if smp is not None:
            seed = self._native_seed + idx * 100003 \
                + int(self.bg_rng.integers(2 ** 20))
            rgb, alpha, bg, coords = self._native.sample_patches(
                idx, smp.n, smp.patch_size, smp.p, smp.dilate, seed)
            S = smp.patch_size
            rays_o = np.stack([self.rays_o[y:y + S, x:x + S]
                               for y, x in coords])
            rays_d = np.stack([self.rays_d[y:y + S, x:x + S]
                               for y, x in coords])
        else:
            rgb, alpha = self._native.full_frame(idx)
            rgb = rgb.reshape(-1, 3)
            alpha = alpha.reshape(-1)
            bg = np.ones_like(rgb)
            rays_o = self.rays_o.reshape(-1, 3)
            rays_d = self.rays_d.reshape(-1, 3)
        datum = {
            "rgb": rgb, "rays_o": rays_o, "rays_d": rays_d,
            "betas": self.smpl_params["betas"][0],
            "global_orient": self.smpl_params["global_orient"][idx],
            "body_pose": self.smpl_params["body_pose"][idx],
            "transl": self.smpl_params["transl"][idx],
            "alpha": alpha, "bg_color": bg, "idx": np.int32(idx),
        }
        if smp is None:
            datum["ray_basis"] = self.ray_basis
        ray_shape = rays_d.shape[:-1]
        if self.near is not None and self.far is not None:
            datum["near"] = np.full(ray_shape, self.near, np.float32)
            datum["far"] = np.full(ray_shape, self.far, np.float32)
        else:
            near, far = near_far_from_transl(self.smpl_params["transl"][idx])
            datum["near"] = np.full(ray_shape, near, np.float32)
            datum["far"] = np.full(ray_shape, far, np.float32)
        return datum

    def __getitem__(self, idx: int) -> dict[str, Any]:
        if self._native is not None:
            return self._getitem_native(idx)
        import cv2
        img = _imread_rgb(self.img_lists[idx])
        msk = _load_mask(self.msk_lists[idx])
        if self.downscale > 1:
            f = 1.0 / self.downscale
            img = cv2.resize(img, dsize=None, fx=f, fy=f)
            msk = cv2.resize(msk, dsize=None, fx=f, fy=f)

        if self.split == "train":
            bg = self.bg_rng.random(img.shape, dtype=np.float32)
        else:
            bg = np.ones_like(img)
        img = img * msk[..., None] + (1 - msk[..., None]) * bg

        if self.sampler is not None:
            msk, img, rays_o, rays_d, bg = self.sampler.sample(
                msk, img, self.rays_o, self.rays_d, bg)
        else:
            rays_o = self.rays_o.reshape(-1, 3)
            rays_d = self.rays_d.reshape(-1, 3)
            img = img.reshape(-1, 3)
            msk = msk.reshape(-1)
            bg = bg.reshape(-1, 3)

        datum = {
            "rgb": img.astype(np.float32),
            "rays_o": rays_o,
            "rays_d": rays_d,
            "betas": self.smpl_params["betas"][0],
            "global_orient": self.smpl_params["global_orient"][idx],
            "body_pose": self.smpl_params["body_pose"][idx],
            "transl": self.smpl_params["transl"][idx],
            "alpha": msk,
            "bg_color": bg,
            "idx": np.int32(idx),
        }
        if self.sampler is None:
            # full-image batches carry the pixel-grid generator so the
            # fused flat render computes per-pixel dirs instead of
            # gathering them (make_ray_basis)
            datum["ray_basis"] = self.ray_basis
        ray_shape = rays_d.shape[:-1]
        if self.near is not None and self.far is not None:
            datum["near"] = np.full(ray_shape, self.near, np.float32)
            datum["far"] = np.full(ray_shape, self.far, np.float32)
        else:
            near, far = near_far_from_transl(self.smpl_params["transl"][idx])
            datum["near"] = np.full(ray_shape, near, np.float32)
            datum["far"] = np.full(ray_shape, far, np.float32)
        return datum


class AvatarDataModule:
    """Train/val/test datasets + iterator factories (Lightning replacement).

    Built from a config node shaped like the reference's dataset confs:
    opt.dataroot, opt.{train,val,test}.{start,end,skip,downscale,...},
    opt.train.sampler (a _target_ node or an already-built sampler).
    """

    def __init__(self, opt: Any = None, **kw):
        from ..config import instantiate
        if opt is None:
            opt = kw.pop("cfg", None)
        self.opt = opt
        root = Path(opt.dataroot)
        for split in ("train", "val", "test"):
            if split not in opt:
                continue
            sopt = dict(opt[split])
            sopt.pop("num_workers", None)
            sampler = sopt.pop("sampler", None)
            if isinstance(sampler, dict):
                sampler = instantiate(sampler)
            ds = AvatarDataset(
                root, split,
                sampler=sampler,
                refine=bool(sopt.pop("refine", False)),
                fitting=bool(opt.get("fitting", False)),
                # native C++ data engine defaults ON for train splits
                # (threaded decode + resident cache + native patch
                # sampling); AvatarDataset silently keeps the Python path
                # when the toolchain/libpng or sampler shape rules it out
                native=bool(opt.get("native", split == "train")),
                **{k: v for k, v in sopt.items()
                   if k in ("start", "end", "skip", "downscale", "near",
                            "far", "mask_ext")})
            setattr(self, f"{split}set", ds)

    def train_iter(self, *, shuffle: bool = True,
                   seed: int = 0) -> Iterator[dict[str, Any]]:
        ds = self.trainset
        rng = np.random.default_rng(seed)
        while True:
            order = rng.permutation(len(ds)) if shuffle else np.arange(len(ds))
            for i in order:
                yield ds[int(i)]

    def eval_iter(self, split: str = "val") -> Iterator[dict[str, Any]]:
        ds = getattr(self, f"{split}set")
        for i in range(len(ds)):
            yield ds[i]


class MocapDataset(AvatarDataset):
    """Synthetic-mocap (SURREAL-style) variant — capability parity with
    /root/reference/instant_avatar/datasets/surreal.py. The reference's
    inline 60/30/10 mask/edge/random ray sampling (surreal.py:103-133) is
    exactly an EdgeSampler with those ratios, so this subclass defaults to
    one when no sampler is given."""

    def __init__(self, root, split, *, num_samples: int = 4096, **kw):
        if kw.get("sampler") is None and split == "train":
            kw["sampler"] = EdgeSampler(num_samples, ratio_mask=0.6,
                                        ratio_edge=0.3, kernel_size=32)
        super().__init__(root, split, **kw)
