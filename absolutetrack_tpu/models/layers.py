"""Primitive NN layers: NHWC convs with folded BatchNorm, ResNet blocks.

Functional style: every layer is (params_dict, x) -> y plus an
``init_*`` constructor. Weight layout is HWIO (TPU-native); BN is folded
into conv weight/bias (exact for inference-mode BN; the fold happens in
``weights.py`` when converting a torch checkpoint, and at init time BN(1,0)
with unit running stats folds to identity).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


# MXU precision for all conv/linear layers. Measured TPU-vs-CPU drift of
# the full forward with random weights: DEFAULT (1-pass bf16) ~59 mm wrist
# delta, HIGH (3-pass) ~7.9 mm, HIGHEST ~0.02 mm. Parity eval needs
# HIGHEST (the 0.5 mm budget); serving deployments that tolerate small
# drift can trade precision for ~2x conv throughput.
_conv_precision = lax.Precision.HIGHEST


def set_conv_precision(name: str) -> None:
    """Set the global conv/linear MXU precision: default|high|highest."""
    global _conv_precision
    _conv_precision = {
        "default": lax.Precision.DEFAULT,
        "high": lax.Precision.HIGH,
        "highest": lax.Precision.HIGHEST,
    }[name]


def he_normal_conv(rng, kh: int, kw: int, cin: int, cout: int) -> jnp.ndarray:
    """He-style init: normal(0, sqrt(2/n)), n = kh*kw*cout.

    Matches the reference ResNet init (backbone_resnet.py:117-123).
    """
    std = math.sqrt(2.0 / (kh * kw * cout))
    return std * jax.random.normal(rng, (kh, kw, cin, cout), jnp.float32)


def init_conv(rng, kh, kw, cin, cout) -> dict:
    return {"w": he_normal_conv(rng, kh, kw, cin, cout), "b": jnp.zeros((cout,))}


def conv2d(
    p: dict,
    x: jnp.ndarray,  # (N, H, W, C)
    stride: int = 1,
    padding: str | Sequence[Tuple[int, int]] = "SAME1",
) -> jnp.ndarray:
    """NHWC conv. ``padding='SAME1'`` means explicit 1-pixel padding for 3x3
    kernels / 0 for 1x1, replicating torch Conv2d(padding=k//2) semantics on
    even inputs with stride 2 (plain XLA 'SAME' differs there)."""
    kh, kw = p["w"].shape[:2]
    if padding == "SAME1":
        padding = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    # serving mode: activations arrive bf16; weights follow the activation
    # dtype (MXU bf16 multiply, f32 accumulate), output stays bf16
    w = p["w"].astype(x.dtype)
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_conv_precision,
    )
    return out + p["b"].astype(x.dtype)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 max pool (torch MaxPool2d(2, 2), no padding)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def init_linear(rng, cin, cout) -> dict:
    std = math.sqrt(2.0 / cout)
    return {
        "w": std * jax.random.normal(rng, (cin, cout), jnp.float32),
        "b": jnp.zeros((cout,)),
    }


def linear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    return (
        jnp.matmul(x, p["w"].astype(x.dtype), precision=_conv_precision)
        + p["b"].astype(x.dtype)
    )


# --------------------------------------------------------------------------
# ResNet BasicBlock (reference backbone_resnet.py:14-72, BN folded)
# --------------------------------------------------------------------------


def init_basic_block(rng, cin: int, cout: int, stride: int = 1) -> dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    p = {
        "conv1": init_conv(k1, 3, 3, cin, cout),
        "conv2": init_conv(k2, 3, 3, cout, cout),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = init_conv(k3, 1, 1, cin, cout)
    return p


def basic_block(p: dict, x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    out = jax.nn.relu(conv2d(p["conv1"], x, stride=stride))
    out = conv2d(p["conv2"], out)
    residual = x if "downsample" not in p else conv2d(p["downsample"], x, stride=stride)
    return jax.nn.relu(out + residual)
