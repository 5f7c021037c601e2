"""ModifiedResNet (OpenAI RN tower) vs a functional torch oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from keep_tpu.models import resnet
from keep_tpu.models.resnet import ModifiedResNetConfig, convert_openai_resnet

pytestmark = pytest.mark.slow  # oracle/parity tests; fast pass: -m 'not slow'

CFG = ModifiedResNetConfig(layers=(1, 1, 1, 1), width=16, image_size=64,
                           heads=4, output_dim=32)


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def torch_conv(p, x, stride=1, padding=0):
    w = t(p["kernel"]).permute(3, 2, 0, 1)  # HWIO → OIHW
    return F.conv2d(x, w, stride=stride, padding=padding)


def torch_bn(p, x, eps):
    return F.batch_norm(x, t(p["mean"]), t(p["var"]), t(p["scale"]),
                        t(p["bias"]), training=False, eps=eps)


def torch_bottleneck(p, x, stride, eps):
    out = F.relu(torch_bn(p["bn1"], torch_conv(p["conv1"], x), eps))
    out = F.relu(torch_bn(p["bn2"], torch_conv(p["conv2"], out, padding=1), eps))
    if stride > 1:
        out = F.avg_pool2d(out, stride)
    out = torch_bn(p["bn3"], torch_conv(p["conv3"], out), eps)
    identity = x
    if "downsample" in p:
        identity = F.avg_pool2d(x, stride) if stride > 1 else x
        identity = torch_bn(p["downsample"]["bn"],
                            torch_conv(p["downsample"]["conv"], identity), eps)
    return F.relu(out + identity)


def torch_attnpool(p, x, heads):
    b, c, h, w = x.shape
    tokens = x.reshape(b, c, h * w).permute(2, 0, 1)  # (HW) N C
    tokens = torch.cat([tokens.mean(0, keepdim=True), tokens], dim=0)
    tokens = tokens + t(p["pos_embed"])[:, None, :]
    out, _ = F.multi_head_attention_forward(
        query=tokens, key=tokens, value=tokens,
        embed_dim_to_check=c, num_heads=heads,
        q_proj_weight=t(p["q"]["kernel"]).T,
        k_proj_weight=t(p["k"]["kernel"]).T,
        v_proj_weight=t(p["v"]["kernel"]).T,
        in_proj_weight=None,
        in_proj_bias=torch.cat([t(p["q"]["bias"]), t(p["k"]["bias"]),
                                t(p["v"]["bias"])]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=t(p["c"]["kernel"]).T,
        out_proj_bias=t(p["c"]["bias"]),
        use_separate_proj_weight=True, training=False, need_weights=False,
    )
    return out[0]


def torch_forward(params, x_nhwc, cfg):
    x = t(x_nhwc).permute(0, 3, 1, 2)
    stem = params["stem"]
    x = F.relu(torch_bn(stem["bn1"], torch_conv(stem["conv1"], x, 2, 1), cfg.bn_eps))
    x = F.relu(torch_bn(stem["bn2"], torch_conv(stem["conv2"], x, 1, 1), cfg.bn_eps))
    x = F.relu(torch_bn(stem["bn3"], torch_conv(stem["conv3"], x, 1, 1), cfg.bn_eps))
    x = F.avg_pool2d(x, 2)
    for li in range(1, 5):
        for bi, blk in enumerate(params[f"layer{li}"]):
            stride = 2 if (li > 1 and bi == 0) else 1
            x = torch_bottleneck(blk, x, stride, cfg.bn_eps)
    return torch_attnpool(params["attnpool"], x, cfg.heads).numpy()


def randomize_bn(params, rng):
    """Non-trivial BN running stats so the BN math is actually exercised."""

    def visit(d):
        for k, v in d.items():
            if isinstance(v, dict):
                if "mean" in v:
                    v["mean"] = jnp.asarray(rng.standard_normal(v["mean"].shape) * 0.2,
                                            jnp.float32)
                    v["var"] = jnp.asarray(0.5 + rng.random(v["var"].shape),
                                           jnp.float32)
                    v["scale"] = jnp.asarray(0.5 + rng.random(v["scale"].shape),
                                             jnp.float32)
                    v["bias"] = jnp.asarray(rng.standard_normal(v["bias"].shape) * 0.1,
                                            jnp.float32)
                else:
                    visit(v)
            elif isinstance(v, list):
                for b in v:
                    visit(b)

    visit(params)
    return params


def test_resnet_matches_torch_oracle(rng):
    params = randomize_bn(resnet.init(jax.random.PRNGKey(0), CFG), rng)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_forward(params, x, CFG)
    got = np.asarray(resnet.forward(params, jnp.asarray(x), CFG))
    assert got.shape == (2, 32)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=5e-5)


def test_convert_openai_resnet_layout(rng):
    """Synthetic OpenAI-layout state dict converts and runs."""
    torch.manual_seed(0)
    sd = {}

    def add_conv(name, ci, co, k):
        sd[name + ".weight"] = torch.randn(co, ci, k, k) * 0.05

    def add_bn(name, c):
        sd[name + ".weight"] = torch.rand(c) + 0.5
        sd[name + ".bias"] = torch.randn(c) * 0.1
        sd[name + ".running_mean"] = torch.randn(c) * 0.1
        sd[name + ".running_var"] = torch.rand(c) + 0.5

    w = CFG.width
    add_conv("conv1", 3, w // 2, 3); add_bn("bn1", w // 2)
    add_conv("conv2", w // 2, w // 2, 3); add_bn("bn2", w // 2)
    add_conv("conv3", w // 2, w, 3); add_bn("bn3", w)
    cin = w
    for li, depth in enumerate(CFG.layers, start=1):
        planes = w * (2 ** (li - 1))
        for bi in range(depth):
            pre = f"layer{li}.{bi}"
            add_conv(pre + ".conv1", cin, planes, 1); add_bn(pre + ".bn1", planes)
            add_conv(pre + ".conv2", planes, planes, 3); add_bn(pre + ".bn2", planes)
            add_conv(pre + ".conv3", planes, planes * 4, 1); add_bn(pre + ".bn3", planes * 4)
            if bi == 0:
                add_conv(pre + ".downsample.0", cin, planes * 4, 1)
                add_bn(pre + ".downsample.1", planes * 4)
            cin = planes * 4
    c = CFG.final_channels
    sd["attnpool.positional_embedding"] = torch.randn(CFG.spatial**2 + 1, c) / c**0.5
    for n in ("q_proj", "k_proj", "v_proj"):
        sd[f"attnpool.{n}.weight"] = torch.randn(c, c) * 0.05
        sd[f"attnpool.{n}.bias"] = torch.zeros(c)
    sd["attnpool.c_proj.weight"] = torch.randn(CFG.output_dim, c) * 0.05
    sd["attnpool.c_proj.bias"] = torch.zeros(CFG.output_dim)

    params = convert_openai_resnet(sd, CFG)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    out = resnet.forward(jax.tree.map(jnp.asarray, params), jnp.asarray(x), CFG)
    assert out.shape == (1, CFG.output_dim)
    ref = torch_forward(jax.tree.map(np.asarray, params), x, CFG)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=5e-5)


def test_standard_trunk_matches_torch(rng):
    """Standard RN trunk (res_ssl tower) vs a functional torch oracle."""
    from keep_tpu.models.resnet import (
        convert_torchvision_resnet,
        resnet_trunk_pooled,
    )

    torch.manual_seed(1)
    layers = (1, 1, 1, 1)
    sd = {}

    def add_conv(name, ci, co, k):
        sd[name + ".weight"] = torch.randn(co, ci, k, k) * 0.05

    def add_bn(name, c):
        sd[name + ".weight"] = torch.rand(c) + 0.5
        sd[name + ".bias"] = torch.randn(c) * 0.1
        sd[name + ".running_mean"] = torch.randn(c) * 0.1
        sd[name + ".running_var"] = torch.rand(c) + 0.5

    add_conv("conv1", 3, 8, 7)
    add_bn("bn1", 8)
    cin = 8
    for li, depth in enumerate(layers, start=1):
        planes = 8 * (2 ** (li - 1))
        for bi in range(depth):
            pre = f"layer{li}.{bi}"
            add_conv(pre + ".conv1", cin, planes, 1); add_bn(pre + ".bn1", planes)
            add_conv(pre + ".conv2", planes, planes, 3); add_bn(pre + ".bn2", planes)
            add_conv(pre + ".conv3", planes, planes * 4, 1); add_bn(pre + ".bn3", planes * 4)
            if bi == 0:
                add_conv(pre + ".downsample.0", cin, planes * 4, 1)
                add_bn(pre + ".downsample.1", planes * 4)
            cin = planes * 4

    params = convert_torchvision_resnet(sd, layers)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    got = np.asarray(resnet_trunk_pooled(
        jax.tree.map(jnp.asarray, params), jnp.asarray(x)))

    # torch oracle
    xt = t(x).permute(0, 3, 1, 2)
    w = t(params["conv1"]["kernel"]).permute(3, 2, 0, 1)
    y = F.conv2d(xt, w, stride=2, padding=3)
    y = F.relu(torch_bn(params["bn1"], y, 1e-5))
    y = F.max_pool2d(y, 3, 2, 1)
    for li, depth in enumerate(layers, start=1):
        for bi in range(depth):
            p = params[f"layer{li}"][bi]
            stride = 2 if (li > 1 and bi == 0) else 1
            out = F.relu(torch_bn(p["bn1"], torch_conv(p["conv1"], y), 1e-5))
            out = F.relu(torch_bn(p["bn2"], torch_conv(p["conv2"], out, stride, 1), 1e-5))
            out = torch_bn(p["bn3"], torch_conv(p["conv3"], out), 1e-5)
            identity = y
            if "downsample" in p:
                identity = torch_bn(p["downsample"]["bn"],
                                    torch_conv(p["downsample"]["conv"], y, stride), 1e-5)
            y = F.relu(out + identity)
    ref = y.mean(dim=(2, 3)).numpy()
    assert got.shape == ref.shape == (1, 8 * 8 * 4)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=5e-5)
