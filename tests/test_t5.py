"""T5/mT5 encoder parity vs the REAL ``transformers.MT5EncoderModel`` oracle
(the mt5-* presets' text trunk; reference hf_model.py:124-126 keeps the
encoder of AutoModel('google/mt5-*'))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.models import t5

pytestmark = pytest.mark.slow  # oracle/parity tests; fast pass: -m 'not slow'

CFG = t5.T5EncoderConfig(vocab_size=100, d_model=32, d_kv=8, num_heads=4,
                         d_ff=64, num_layers=2)


@pytest.fixture(scope="module")
def oracle():
    import torch
    from transformers import MT5Config, MT5EncoderModel

    torch.manual_seed(0)
    m = MT5EncoderModel(MT5Config(
        vocab_size=100, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_layers=2, dropout_rate=0.0,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128)).eval()
    return m


def test_mt5_encoder_matches_transformers(oracle, rng):
    import torch

    params = t5.convert_hf_t5_encoder(oracle.state_dict(), CFG)
    ids = rng.integers(3, 99, size=(2, 17))
    ids[1, 11:] = 0  # ragged padding
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        ref = oracle(input_ids=torch.from_numpy(ids),
                     attention_mask=torch.from_numpy(mask)
                     ).last_hidden_state.numpy()
    got = np.asarray(t5.forward(
        jax.tree.map(jnp.asarray, params), jnp.asarray(ids), cfg=CFG
    )["last_hidden_state"])
    # only compare real (unpadded) positions — HF computes pads too but
    # they are meaningless downstream (mean pooler masks them)
    np.testing.assert_allclose(got[0], ref[0], atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(got[1, :11], ref[1, :11], atol=5e-5, rtol=5e-5)


def test_relative_position_buckets_match_hf():
    import torch
    from transformers.models.t5.modeling_t5 import T5Attention

    ours = t5.relative_position_buckets(9, 9, 32, 128)
    ctx = torch.arange(9)[:, None]
    mem = torch.arange(9)[None, :]
    ref = T5Attention._relative_position_bucket(
        mem - ctx, bidirectional=True, num_buckets=32, max_distance=128)
    np.testing.assert_array_equal(ours, ref.numpy())
    # long-range log-bucketing branch
    ours = t5.relative_position_buckets(200, 200, 32, 128)
    ctx = torch.arange(200)[:, None]
    mem = torch.arange(200)[None, :]
    ref = T5Attention._relative_position_bucket(
        mem - ctx, bidirectional=True, num_buckets=32, max_distance=128)
    np.testing.assert_array_equal(ours, ref.numpy())


def test_mt5_text_tower_through_hf_text(rng):
    from keep_tpu.models import hf_text

    cfg = hf_text.HFTextConfig(arch="mt5", trunk=CFG, output_dim=16,
                               pooler="mean", proj="mlp")
    params = hf_text.init(jax.random.PRNGKey(0), cfg)
    ids = rng.integers(3, 99, size=(2, 10))
    ids[1, 6:] = 0
    out = hf_text.forward(params, jnp.asarray(ids), cfg, normalize=True)
    assert out.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               1.0, atol=1e-5)


def test_mt5_preset_builds(rng):
    from keep_tpu import presets

    r = presets.resolve("mt5-base-ViT-B-32")
    assert r.text_cfg.trunk.d_ff == 2048
    # full mt5-base init is heavy; build a shrunken clone of the resolved
    # config to prove the wiring end-to-end
    import dataclasses

    small = dataclasses.replace(
        r.text_cfg, trunk=dataclasses.replace(
            r.text_cfg.trunk, vocab_size=64, d_model=32, num_heads=4,
            d_kv=8, d_ff=64, num_layers=2))
    from keep_tpu.models import hf_text

    params = hf_text.init(jax.random.PRNGKey(0), small)
    out = hf_text.forward(params, jnp.asarray(rng.integers(2, 63, (1, 8))),
                          small)
    assert out.shape == (1, 512)
