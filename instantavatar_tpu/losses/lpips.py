"""LPIPS perceptual distance — JAX implementation of the richzhang
PerceptualSimilarity network vendored by the reference
(/root/reference/third_parties/lpips/lpips.py): input scaling layer, a
frozen VGG16/AlexNet trunk tapped after each ReLU stage, per-channel unit
normalization, learned 1x1 linear heads, spatial mean, sum over stages.

Weights: this environment has no torchvision and no network egress, so the
trunk weights cannot be downloaded (SURVEY §7.3.6). The module therefore
loads weights from an ``.npz``/torch ``.pth`` file when one is provided
(``weights_path`` arg or INSTANTAVATAR_LPIPS_WEIGHTS env var; the
converter understands torchvision ``vgg16``/``alexnet`` state dicts and
lpips ``lin*.model.1.weight`` head dicts) and otherwise can fall back to a
*deterministic random-feature* trunk (``allow_random=True``) — random VGG
features are a known-usable perceptual loss for training, but they are NOT
numerically comparable to published LPIPS numbers, so the Evaluator skips
LPIPS when real weights are absent.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LPIPS", "load_lpips", "vgg16_config", "alexnet_config"]

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
    def __init__(self, net: str = "vgg", params: LPIPSParams | None = None):
        self.net = net
        self.cfg = vgg16_config() if net == "vgg" else alexnet_config()
        self.params = params

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
    (numpy-able tensors) -> ((w HWIO, b), ...)."""
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


def load_lpips(net: str = "vgg", weights_path: str | None = None,
               allow_random: bool = False) -> LPIPS:
    """Build an LPIPS module. Raises FileNotFoundError when no weights are
    available and allow_random is False."""
    cfg = vgg16_config() if net == "vgg" else alexnet_config()
    path = weights_path or os.environ.get("INSTANTAVATAR_LPIPS_WEIGHTS")
    if path and os.path.exists(path):
        if path.endswith(".npz"):
            raw = dict(np.load(path, allow_pickle=True))
        else:
            import torch
            raw = {k: v.numpy() for k, v in
                   torch.load(path, map_location="cpu").items()}
        convs = _convert_torch_trunk(raw, net)
        try:
            heads = _convert_torch_heads(raw)
        except KeyError:
            heads = tuple(jnp.ones((c,)) / c for c in cfg["tap_channels"])
    elif allow_random:
        convs = _random_trunk(net, jax.random.PRNGKey(0))
        heads = tuple(jnp.ones((c,)) / c for c in cfg["tap_channels"])
    else:
        raise FileNotFoundError(
            "no LPIPS weights available (set INSTANTAVATAR_LPIPS_WEIGHTS "
            "or pass weights_path; allow_random=True for a training-only "
            "random-feature fallback)")
    return LPIPS(net, LPIPSParams(convs=convs, heads=heads))
