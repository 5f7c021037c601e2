"""ModifiedResNet — the OpenAI-CLIP RN image tower (alternative encoder
surface; reference training/path_open_clip/modified_resnet.py:95-181).

Architecture: 3-conv stem (each 3×3, first stride-2) + avgpool; 4 stages of
anti-aliased Bottleneck blocks (stride realized as avgpool before conv3,
avgpool-prepended downsample); attention pooling head (mean-token query over
HW tokens + learned positional embedding).

BatchNorm runs in inference mode (running stats from the checkpoint). NHWC
throughout; convs via ``lax.conv_general_dilated`` with fp32 accumulation.

Param pytree (L4 stages as lists of block dicts — stage depths differ, so no
scan; RN50 is an eval-baseline tower here):
  stem: {conv1..3: {kernel [kh,kw,ci,co]}, bn1..3: {scale,bias,mean,var}}
  layer1..4: [ {conv1..3, bn1..3, downsample?: {conv, bn}} ]
  attnpool: {pos_embed [HW+1, C], q/k/v/c: {kernel,bias}}
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ModifiedResNetConfig:
    layers: Sequence[int] = (3, 4, 6, 3)  # RN50
    width: int = 64
    image_size: int = 224
    heads: int = 32
    output_dim: int = 1024
    bn_eps: float = 1e-5

    @property
    def final_channels(self) -> int:
        return self.width * 32

    @property
    def spatial(self) -> int:
        return self.image_size // 32


def conv(p: dict, x: Array, stride: int = 1, padding: str | int = 0) -> Array:
    pad = [(padding, padding)] * 2 if isinstance(padding, int) else padding
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return out.astype(x.dtype)


def batch_norm(p: dict, x: Array, eps: float) -> Array:
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (p["bias"].astype(jnp.float32)
            - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv
            ).astype(x.dtype)
    return x * scale + bias


def avg_pool(x: Array, k: int) -> Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


def bottleneck(p: dict, x: Array, stride: int, eps: float) -> Array:
    out = jax.nn.relu(batch_norm(p["bn1"], conv(p["conv1"], x), eps))
    out = jax.nn.relu(batch_norm(p["bn2"], conv(p["conv2"], out, padding=1), eps))
    if stride > 1:
        out = avg_pool(out, stride)
    out = batch_norm(p["bn3"], conv(p["conv3"], out), eps)
    identity = x
    if "downsample" in p:
        identity = x if stride == 1 else avg_pool(x, stride)
        identity = batch_norm(p["downsample"]["bn"], conv(p["downsample"]["conv"], identity), eps)
    return jax.nn.relu(out + identity)


def attention_pool(p: dict, x: Array, heads: int) -> Array:
    """Mean-token-query attention pooling (modified_resnet.py:58-94): only the
    mean token's attention output is returned, so just one query row runs."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    mean = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)  # [B, HW+1, C]
    tokens = tokens + p["pos_embed"].astype(tokens.dtype)[None]

    def proj(name, t):
        return (jnp.dot(t, p[name]["kernel"].astype(t.dtype),
                        preferred_element_type=jnp.float32)
                + p[name]["bias"].astype(jnp.float32)).astype(t.dtype)

    q = proj("q", tokens[:, :1])  # the mean token only
    k = proj("k", tokens)
    v = proj("v", tokens)
    dh = c // heads
    qh = q.reshape(b, 1, heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * dh**-0.5
    probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                     preferred_element_type=jnp.float32).astype(vh.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)[:, 0]
    return (jnp.dot(out, p["c"]["kernel"].astype(out.dtype),
                    preferred_element_type=jnp.float32)
            + p["c"]["bias"].astype(jnp.float32)).astype(out.dtype)


def forward(params: dict, x: Array, cfg: ModifiedResNetConfig,
            *, dtype: jnp.dtype = jnp.float32) -> Array:
    """[B, H, W, 3] → [B, output_dim]."""
    eps = cfg.bn_eps
    x = x.astype(dtype)
    stem = params["stem"]
    x = jax.nn.relu(batch_norm(stem["bn1"], conv(stem["conv1"], x, stride=2, padding=1), eps))
    x = jax.nn.relu(batch_norm(stem["bn2"], conv(stem["conv2"], x, padding=1), eps))
    x = jax.nn.relu(batch_norm(stem["bn3"], conv(stem["conv3"], x, padding=1), eps))
    x = avg_pool(x, 2)
    for li, blocks in enumerate([params["layer1"], params["layer2"],
                                 params["layer3"], params["layer4"]]):
        for bi, blk in enumerate(blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            x = bottleneck(blk, x, stride, eps)
    return attention_pool(params["attnpool"], x, cfg.heads)


def convert_openai_resnet(sd, cfg: ModifiedResNetConfig) -> dict:
    """OpenAI/open_clip ModifiedResNet state dict → pytree. Conv weights
    [co, ci, kh, kw] → [kh, kw, ci, co]."""
    g = lambda k: (sd[k].detach().cpu().numpy() if hasattr(sd[k], "detach")
                   else np.asarray(sd[k]))

    def cv(k):
        return {"kernel": g(k + ".weight").transpose(2, 3, 1, 0)}

    def bn(k):
        return {"scale": g(k + ".weight"), "bias": g(k + ".bias"),
                "mean": g(k + ".running_mean"), "var": g(k + ".running_var")}

    def lin(k):
        return {"kernel": g(k + ".weight").T, "bias": g(k + ".bias")}

    def block(prefix):
        out = {f"conv{i}": cv(f"{prefix}.conv{i}") for i in (1, 2, 3)}
        out.update({f"bn{i}": bn(f"{prefix}.bn{i}") for i in (1, 2, 3)})
        if f"{prefix}.downsample.0.weight" in sd:
            out["downsample"] = {"conv": cv(f"{prefix}.downsample.0"),
                                 "bn": bn(f"{prefix}.downsample.1")}
        return out

    params = {
        "stem": {
            **{f"conv{i}": cv(f"conv{i}") for i in (1, 2, 3)},
            **{f"bn{i}": bn(f"bn{i}") for i in (1, 2, 3)},
        },
        "attnpool": {
            "pos_embed": g("attnpool.positional_embedding"),
            "q": lin("attnpool.q_proj"),
            "k": lin("attnpool.k_proj"),
            "v": lin("attnpool.v_proj"),
            "c": lin("attnpool.c_proj"),
        },
    }
    for li, depth in enumerate(cfg.layers, start=1):
        params[f"layer{li}"] = [block(f"layer{li}.{bi}") for bi in range(depth)]
    return params


def init(key: jax.Array, cfg: ModifiedResNetConfig, dtype=jnp.float32) -> dict:
    """Random init (shapes per OpenAI RN; useful for tests/training-from-scratch)."""
    w = cfg.width
    # 3 stem convs + 3 convs/block (+1 downsample per stage) + attnpool —
    # a fixed 64 exhausted mid-layer on anything deeper than RN50 (RN101
    # draws ~111, RN50x64 ~200)
    n_keys = 16 + 3 * sum(cfg.layers) + 4 * len(cfg.layers)
    kiter = iter(jax.random.split(key, n_keys))

    def cv(ci, co, k=1):
        fan = ci * k * k
        return {"kernel": (jax.random.normal(next(kiter), (k, k, ci, co))
                           * fan**-0.5).astype(dtype)}

    def bn(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
                "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}

    def block(cin, planes, downsample):
        out = {
            "conv1": cv(cin, planes), "bn1": bn(planes),
            "conv2": cv(planes, planes, 3), "bn2": bn(planes),
            "conv3": cv(planes, planes * 4), "bn3": bn(planes * 4),
        }
        if downsample:
            out["downsample"] = {"conv": cv(cin, planes * 4), "bn": bn(planes * 4)}
        return out

    params = {
        "stem": {
            "conv1": cv(3, w // 2, 3), "bn1": bn(w // 2),
            "conv2": cv(w // 2, w // 2, 3), "bn2": bn(w // 2),
            "conv3": cv(w // 2, w, 3), "bn3": bn(w),
        }
    }
    cin = w
    for li, depth in enumerate(cfg.layers, start=1):
        planes = w * (2 ** (li - 1))
        blocks = []
        for bi in range(depth):
            blocks.append(block(cin, planes, downsample=(bi == 0)))
            cin = planes * 4
        params[f"layer{li}"] = blocks
    c = cfg.final_channels
    lin = lambda ci, co: {
        "kernel": (jax.random.normal(next(kiter), (ci, co)) * ci**-0.5).astype(dtype),
        "bias": jnp.zeros((co,), dtype),
    }
    params["attnpool"] = {
        "pos_embed": (jax.random.normal(next(kiter), (cfg.spatial**2 + 1, c))
                      / c**0.5).astype(dtype),
        "q": lin(c, c), "k": lin(c, c), "v": lin(c, c),
        "c": lin(c, cfg.output_dim),
    }
    return params


# ---------------------------------------------------------------------------
# Standard (torchvision-style) ResNet-50 trunk — the 'res_ssl' tower
# (reference model/res_ssl.py:5-42: lunit SSL RN50 trunk; KEP pools it with
# AvgPool2d(7) before the visual head, model/model.py:283-285,330-333)
# ---------------------------------------------------------------------------


def std_bottleneck(p: dict, x: Array, stride: int, eps: float) -> Array:
    """torchvision Bottleneck: stride on the 3×3 conv, 1×1 strided downsample."""
    out = jax.nn.relu(batch_norm(p["bn1"], conv(p["conv1"], x), eps))
    out = jax.nn.relu(
        batch_norm(p["bn2"], conv(p["conv2"], out, stride=stride, padding=1), eps)
    )
    out = batch_norm(p["bn3"], conv(p["conv3"], out), eps)
    identity = x
    if "downsample" in p:
        identity = batch_norm(
            p["downsample"]["bn"], conv(p["downsample"]["conv"], x, stride=stride), eps
        )
    return jax.nn.relu(out + identity)


def max_pool(x: Array, k: int, stride: int, padding: int) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def resnet_trunk_forward(params: dict, x: Array, *, bn_eps: float = 1e-5,
                         dtype: jnp.dtype = jnp.float32) -> Array:
    """Standard RN50 trunk: [B, H, W, 3] → [B, H/32, W/32, 2048] feature map."""
    x = x.astype(dtype)
    x = jax.nn.relu(batch_norm(params["bn1"],
                               conv(params["conv1"], x, stride=2, padding=3), bn_eps))
    x = max_pool(x, 3, 2, 1)
    for li in range(1, 5):
        for bi, blk in enumerate(params[f"layer{li}"]):
            stride = 2 if (li > 1 and bi == 0) else 1
            x = std_bottleneck(blk, x, stride, bn_eps)
    return x


def resnet_trunk_pooled(params: dict, x: Array, **kw) -> Array:
    """Trunk → global average pool → [B, 2048] (the KEP res_ssl path's
    AvgPool2d(7).squeeze on 224² inputs)."""
    feat = resnet_trunk_forward(params, x, **kw)
    return feat.mean(axis=(1, 2))


def convert_torchvision_resnet(sd, layers=(3, 4, 6, 3)) -> dict:
    """torchvision resnet50 state dict (trunk keys only) → pytree."""
    g = lambda k: (sd[k].detach().cpu().numpy() if hasattr(sd[k], "detach")
                   else np.asarray(sd[k]))

    def cv(k):
        return {"kernel": g(k + ".weight").transpose(2, 3, 1, 0)}

    def bn(k):
        return {"scale": g(k + ".weight"), "bias": g(k + ".bias"),
                "mean": g(k + ".running_mean"), "var": g(k + ".running_var")}

    def block(prefix):
        out = {f"conv{i}": cv(f"{prefix}.conv{i}") for i in (1, 2, 3)}
        out.update({f"bn{i}": bn(f"{prefix}.bn{i}") for i in (1, 2, 3)})
        if f"{prefix}.downsample.0.weight" in sd:
            out["downsample"] = {"conv": cv(f"{prefix}.downsample.0"),
                                 "bn": bn(f"{prefix}.downsample.1")}
        return out

    params = {"conv1": cv("conv1"), "bn1": bn("bn1")}
    for li, depth in enumerate(layers, start=1):
        params[f"layer{li}"] = [block(f"layer{li}.{bi}") for bi in range(depth)]
    return params
