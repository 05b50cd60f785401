"""LPIPS perceptual distance — JAX implementation of the richzhang
PerceptualSimilarity network vendored by the reference
(/root/reference/third_parties/lpips/lpips.py): input scaling layer, a
frozen VGG16/AlexNet trunk tapped after each ReLU stage, per-channel unit
normalization, learned 1x1 linear heads, spatial mean, sum over stages.

Weights: the learned 1x1 head weights are extracted from the reference's
bundled .pth files (scripts/extract_lpips_heads.py, torch-free reader) and
shipped in-repo as ``losses/weights/lpips_heads_{vgg,alex}.npz`` — heads
are always numerically exact. The VGG/alex *trunks* come from torchvision
in the reference (third_parties/lpips/pretrained_networks.py:12-30) and
cannot be downloaded here (no egress), so the trunk loads from an
``.npz``/torch ``.pth`` file when one is provided (``weights_path`` arg or
INSTANTAVATAR_LPIPS_WEIGHTS env var; torch .pth files are read without
torch via utils.torch_reader) and otherwise can fall back to a
*deterministic random-feature* trunk (``allow_random=True``) — random VGG
features are a known-usable perceptual loss for training, but they are NOT
numerically comparable to published LPIPS numbers, so the Evaluator skips
LPIPS (loudly) when a real trunk is absent. ``LPIPS.numerically_matched``
records the provenance.

Channel order: the whole pipeline carries images in cv2/BGR order like the
reference; the reference flips to RGB just before LPIPS (loss.py:28,
eval.py:95) because the ImageNet scaling layer is RGB-ordered. This module
does the flip internally (``expect_bgr=True`` default).
"""
from __future__ import annotations

import os
import warnings
from pathlib import Path
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LPIPS", "load_lpips", "vgg16_config", "alexnet_config"]

_WEIGHTS_DIR = Path(__file__).parent / "weights"

# reference scaling layer constants (lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def vgg16_config():
    """(channels, conv counts per stage). Taps after each stage's last
    ReLU: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3."""
    return {
        "stages": [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)],
        "kernel": 3,
        "tap_channels": [64, 128, 256, 512, 512],
    }


def alexnet_config():
    """AlexNet features: 5 conv taps (after each ReLU)."""
    return {
        "alex": True,
        "tap_channels": [64, 192, 384, 256, 256],
    }


class LPIPSParams(NamedTuple):
    convs: tuple            # ((w, b), ...) trunk convolutions in order
    heads: tuple            # (w_1x1 per tap,)


def _conv(x, w, b, stride=1, pad="SAME"):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _maxpool(x, size=2, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, size, size, 1),
        (1, stride, stride, 1), "VALID")


class LPIPS:
    def __init__(self, net: str = "vgg", params: LPIPSParams | None = None,
                 expect_bgr: bool = True, numerically_matched: bool = False):
        self.net = net
        self.cfg = vgg16_config() if net == "vgg" else alexnet_config()
        self.params = params
        # pipeline images are cv2/BGR; the scaling layer is RGB-ordered, so
        # flip like the reference (loss.py:28, eval.py:95)
        self.expect_bgr = expect_bgr
        # True only when trunk AND heads carry real published weights
        self.numerically_matched = numerically_matched

    # -- trunk forward ------------------------------------------------------

    def _vgg_taps(self, params: LPIPSParams, x):
        taps = []
        i = 0
        for s, (ch, n_convs) in enumerate(self.cfg["stages"]):
            for c in range(n_convs):
                w, b = params.convs[i]
                x = jax.nn.relu(_conv(x, w, b))
                i += 1
            taps.append(x)
            if s < 4:
                x = _maxpool(x)
        return taps

    def _alex_taps(self, params: LPIPSParams, x):
        (w0, b0), (w1, b1), (w2, b2), (w3, b3), (w4, b4) = params.convs
        t = []
        x = jax.nn.relu(_conv(x, w0, b0, stride=4, pad=[(2, 2), (2, 2)]))
        t.append(x)
        x = _maxpool(x, 3, 2)
        x = jax.nn.relu(_conv(x, w1, b1, pad=[(2, 2), (2, 2)]))
        t.append(x)
        x = _maxpool(x, 3, 2)
        x = jax.nn.relu(_conv(x, w2, b2))
        t.append(x)
        x = jax.nn.relu(_conv(x, w3, b3))
        t.append(x)
        x = jax.nn.relu(_conv(x, w4, b4))
        t.append(x)
        return t

    # -- distance ------------------------------------------------------------

    def __call__(self, pred, target) -> jax.Array:
        """(N, H, W, 3) images in [0, 1] -> (N,) LPIPS distances."""
        params = self.params

        def prep(img):
            if self.expect_bgr:
                img = img[..., ::-1]                    # BGR -> RGB
            img = img.astype(jnp.float32) * 2.0 - 1.0   # [-1, 1]
            return (img - _SHIFT) / _SCALE

        taps_fn = self._alex_taps if self.cfg.get("alex") else self._vgg_taps
        fp = taps_fn(params, prep(pred))
        ft = taps_fn(params, prep(target))
        total = 0.0
        for tp, tt, head in zip(fp, ft, params.heads):
            np_ = tp / jnp.maximum(
                jnp.linalg.norm(tp, axis=-1, keepdims=True), 1e-10)
            nt = tt / jnp.maximum(
                jnp.linalg.norm(tt, axis=-1, keepdims=True), 1e-10)
            diff = (np_ - nt) ** 2                      # (N, H, W, C)
            w = jnp.maximum(head, 0.0)                  # 1x1 conv weights >= 0
            dist = jnp.einsum("nhwc,c->nhw", diff, w)
            total = total + dist.mean(axis=(1, 2))
        return total


def _convert_torch_trunk(state: dict, net: str) -> tuple:
    """torchvision ``vgg16().features`` / ``alexnet().features`` state dict
    (numpy-able tensors) -> ((w HWIO, b), ...).

    TRUNK SCHEMA (for provisioning — the reference pulls these from
    torchvision, third_parties/lpips/pretrained_networks.py:12-30):
    an ``.npz`` (or torch ``.pth``, read torch-free) whose keys are the
    torchvision feature-extractor conv layers, either bare or
    ``features.``-prefixed::

        {i}.weight / {i}.bias            # or features.{i}.weight / .bias
        # torch OIHW float32; i = the torchvision features index of each
        # Conv2d (vgg16: 13 convs at 0,2,5,7,10,12,14,17,19,21,24,26,28;
        # alexnet: 5 convs at 0,3,6,8,10)

    One-liner to produce it where torchvision exists::

        import numpy as np, torchvision
        sd = torchvision.models.vgg16(weights="IMAGENET1K_V1")\\
             .features.state_dict()
        np.savez("lpips_trunk_vgg.npz",
                 **{k: v.numpy() for k, v in sd.items()})

    Drop the file at ``losses/weights/lpips_trunk_{vgg,alex}.npz`` (or
    point INSTANTAVATAR_LPIPS_WEIGHTS at it) and the eval lpips column
    activates with ``numerically_matched=True``."""
    convs = []
    idx = sorted({int(k.split(".")[0 if k[0].isdigit() else 1])
                  for k in state if k.endswith("weight")})
    for i in idx:
        for prefix in (f"{i}.", f"features.{i}."):
            if prefix + "weight" in state:
                w = np.asarray(state[prefix + "weight"], np.float32)
                b = np.asarray(state[prefix + "bias"], np.float32)
                convs.append((jnp.asarray(w.transpose(2, 3, 1, 0)),
                              jnp.asarray(b)))
                break
    return tuple(convs)


def _convert_torch_heads(state: dict) -> tuple:
    heads = []
    for i in range(5):
        w = np.asarray(state[f"lin{i}.model.1.weight"], np.float32)
        heads.append(jnp.asarray(w.reshape(-1)))        # (C,)
    return tuple(heads)


def _random_trunk(net: str, key) -> tuple:
    """Deterministic random trunk (training-loss fallback; not comparable
    to published LPIPS numbers)."""
    cfg = vgg16_config() if net == "vgg" else alexnet_config()
    convs = []
    if net == "vgg":
        c_in = 3
        for ch, n_convs in cfg["stages"]:
            for _ in range(n_convs):
                key, sub = jax.random.split(key)
                w = jax.random.normal(sub, (3, 3, c_in, ch)) \
                    * jnp.sqrt(2.0 / (9 * c_in))
                convs.append((w, jnp.zeros((ch,))))
                c_in = ch
    else:
        shapes = [(11, 11, 3, 64), (5, 5, 64, 192), (3, 3, 192, 384),
                  (3, 3, 384, 256), (3, 3, 256, 256)]
        for s in shapes:
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, s) * jnp.sqrt(2.0 / np.prod(s[:3]))
            convs.append((w, jnp.zeros((s[-1],))))
    return tuple(convs)


def _shipped_heads(net: str) -> tuple | None:
    """The exact published v0.1 head weights shipped in-repo (extracted
    from the reference's .pth bundles by scripts/extract_lpips_heads.py)."""
    path = _WEIGHTS_DIR / f"lpips_heads_{net}.npz"
    if not path.exists():
        return None
    raw = np.load(path)
    return tuple(jnp.asarray(raw[f"head{i}"], jnp.float32)
                 for i in range(5))


def load_lpips(net: str = "vgg", weights_path: str | None = None,
               allow_random: bool = False) -> LPIPS:
    """Build an LPIPS module.

    Heads: from ``weights_path`` when it has ``lin*.model.1.weight`` keys,
    else the shipped exact npz. Trunk: from ``weights_path`` (npz or torch
    .pth, read torch-free) else a deterministic random trunk when
    ``allow_random`` — otherwise raises FileNotFoundError.
    """
    cfg = vgg16_config() if net == "vgg" else alexnet_config()
    path = weights_path or os.environ.get("INSTANTAVATAR_LPIPS_WEIGHTS")
    if not path:
        # well-known drop location: provisioning a trunk file here turns
        # the lpips eval column on with numerically_matched=True, no env
        # var or code change needed (see TRUNK SCHEMA note below)
        default = _WEIGHTS_DIR / f"lpips_trunk_{net}.npz"
        if default.exists():
            path = str(default)
    convs = None
    heads = None
    real_trunk = False
    if path and os.path.exists(path):
        if path.endswith(".npz"):
            raw = dict(np.load(path, allow_pickle=True))
        else:
            from ..utils.torch_reader import load_torch_weights
            raw = load_torch_weights(path)
        convs = _convert_torch_trunk(raw, net)
        real_trunk = bool(convs)
        if not convs:
            convs = None
        try:
            heads = _convert_torch_heads(raw)
        except KeyError:
            heads = None
    if heads is None:
        heads = _shipped_heads(net)
    real_heads = heads is not None
    if heads is None:
        heads = tuple(jnp.ones((c,)) / c for c in cfg["tap_channels"])
    if convs is None:
        if not allow_random:
            raise FileNotFoundError(
                "no LPIPS trunk weights available (set "
                "INSTANTAVATAR_LPIPS_WEIGHTS to a torchvision "
                f"{net} state dict .pth/.npz, or pass weights_path; "
                "allow_random=True enables a training-only random-feature "
                "fallback)")
        warnings.warn(
            f"LPIPS({net}): no trunk weights found — using a deterministic "
            "RANDOM-feature trunk. Fine as a training loss; NOT comparable "
            "to published LPIPS numbers.", stacklevel=2)
        convs = _random_trunk(net, jax.random.PRNGKey(0))
    expected = sum(n for _, n in cfg["stages"]) if net == "vgg" else 5
    if len(convs) != expected:
        raise ValueError(
            f"LPIPS({net}): trunk has {len(convs)} convs, expected "
            f"{expected} — wrong state dict?")
    return LPIPS(net, LPIPSParams(convs=convs, heads=heads),
                 numerically_matched=real_trunk and real_heads)
