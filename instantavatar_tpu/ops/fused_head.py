"""Pallas TPU kernel: fused canonical-field head.

Fuses the sigma MLP (enc -> 64 -> 16) and the color MLP (15 -> 64 -> 64
-> 3, sigmoid) into ONE kernel with all weights resident in VMEM — the
TPU counterpart of tiny-cuda-nn's FullyFusedMLP
(/root/reference/instant_avatar/models/networks/ngp.py:36-57): the
intermediate activations (M, 64)/(M, 16) never round-trip through HBM.

Used on the inference path (no custom VJP — training keeps the XLA MLPs,
whose backward XLA already fuses well). Numerical contract: bf16 compute
with fp32 accumulation, identical to models/ngp._mlp's bf16 mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_field_head"]

_TILE = 1024


def _kernel(enc_ref, w0_ref, b0_ref, w1_ref, b1_ref,
            cw0_ref, cb0_ref, cw1_ref, cb1_ref, cw2_ref, cb2_ref,
            color_ref, sigma_ref):
    x = enc_ref[:].astype(jnp.bfloat16)
    # sigma trunk: enc -> hidden -> 16 geo features
    h = jnp.dot(x, w0_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b0_ref[:]
    h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    geo = jnp.dot(h, w1_ref[:].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32) + b1_ref[:]
    sigma_ref[:] = geo[:, :1]

    # color head on geo[:, 1:16]
    c = geo[:, 1:16].astype(jnp.bfloat16)
    c = jnp.dot(c, cw0_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + cb0_ref[:]
    c = jnp.maximum(c, 0.0).astype(jnp.bfloat16)
    c = jnp.dot(c, cw1_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + cb1_ref[:]
    c = jnp.maximum(c, 0.0).astype(jnp.bfloat16)
    c = jnp.dot(c, cw2_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + cb2_ref[:]
    color_ref[:] = jax.nn.sigmoid(c)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_field_head(enc: jax.Array,
                     sigma_w: tuple, sigma_b: tuple,
                     color_w: tuple, color_b: tuple,
                     interpret: bool = False
                     ) -> tuple[jax.Array, jax.Array]:
    """(M, E) encoded features -> (color (M, 3), sigma (M,)).

    Weight shapes: sigma (E,Hs),(Hs,16); color (15,Hc),(Hc,Hc),(Hc,3).
    """
    M, E = enc.shape
    pad = (-M) % _TILE
    enc_p = jnp.pad(enc, ((0, pad), (0, 0))) if pad else enc
    Mp = M + pad

    grid = (Mp // _TILE,)
    full = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                   memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((_TILE, E), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    w0, w1 = sigma_w
    cw0, cw1, cw2 = color_w
    args = (enc_p.astype(jnp.float32),
            w0, sigma_b[0][None], w1, sigma_b[1][None],
            cw0, color_b[0][None], cw1, color_b[1][None],
            cw2, color_b[2][None])
    in_specs = [tile] + [full(*a.shape) for a in args[1:]]

    color, sigma = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, 3), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ),
        interpret=interpret,
    )(*args)
    return color[:M], sigma[:M, 0]
