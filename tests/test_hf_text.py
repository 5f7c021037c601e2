"""RoBERTa-family text tower parity vs the REAL ``transformers`` oracle —
the reference's HFTextEncoder + mean pooler + mlp proj path
(hf_model.py:93-169) used by the roberta-*/xlm-roberta-* presets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.configs import BertConfig
from keep_tpu.models import hf_text

pytestmark = pytest.mark.slow  # oracle/parity tests; fast pass: -m 'not slow'

TRUNK = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=64,
                   max_position_embeddings=40, type_vocab_size=1,
                   ln_eps=1e-5, pad_token_id=1)
CFG = hf_text.HFTextConfig(arch="roberta", trunk=TRUNK, output_dim=16,
                           pooler="mean", proj="mlp")


@pytest.fixture(scope="module")
def oracle():
    import torch
    from transformers import RobertaConfig, RobertaModel

    torch.manual_seed(0)
    m = RobertaModel(RobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5), add_pooling_layer=False).eval()
    return m


def _batch(rng):
    ids = rng.integers(4, 119, size=(3, 12))
    ids[0, 8:] = 1  # ragged: pads mid-batch exercise the mask + positions
    ids[2, 5:] = 1
    return ids


def test_roberta_tower_matches_transformers(oracle, rng):
    import torch

    d, o = 32, 16
    hid = (d + o) // 2
    torch.manual_seed(1)
    proj = torch.nn.Sequential(
        torch.nn.Linear(d, hid, bias=False), torch.nn.GELU(),
        torch.nn.Linear(hid, o, bias=False)).eval()

    ids = _batch(rng)
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        h = oracle(input_ids=torch.from_numpy(ids),
                   attention_mask=torch.from_numpy(mask)).last_hidden_state
        m = torch.from_numpy(mask).unsqueeze(-1).float()
        pooled = (h * m).sum(1) / m.sum(1)  # MeanPooler, hf_model.py:46-53
        ref = proj(pooled).numpy()

    params = hf_text.convert_hf_roberta(
        oracle.state_dict(), CFG,
        proj_sd={"fc1": proj[0].weight, "fc2": proj[2].weight})
    got = np.asarray(hf_text.forward(
        jax.tree.map(jnp.asarray, params), jnp.asarray(ids), CFG))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=3e-5)


def test_roberta_position_ids():
    ids = jnp.asarray([[5, 6, 1, 1], [1, 7, 8, 9]])
    pos = np.asarray(hf_text.roberta_position_ids(ids, 1))
    # pads stay at pad_id; real tokens count up from pad_id+1 (HF
    # create_position_ids_from_input_ids counts pads inside the prefix too)
    np.testing.assert_array_equal(pos, [[2, 3, 1, 1], [1, 2, 3, 4]])


def test_init_forward_shapes(rng):
    params = hf_text.init(jax.random.PRNGKey(0), CFG)
    out = hf_text.forward(params, jnp.asarray(_batch(rng)), CFG,
                          normalize=True)
    assert out.shape == (3, 16)
    n = np.linalg.norm(np.asarray(out), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_cls_pooler_and_linear_proj(rng):
    import dataclasses

    cfg = dataclasses.replace(CFG, pooler="cls", proj="linear")
    params = hf_text.init(jax.random.PRNGKey(1), cfg)
    out = hf_text.forward(params, jnp.asarray(_batch(rng)), cfg)
    assert out.shape == (3, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_context_length_legs_and_unknown_pooler(rng):
    """context_length: mt5 has no hard max (0), roberta reserves
    pad_id+1 leading slots, bert-style uses the raw position count; an
    unknown pooler fails fast."""
    import dataclasses

    import pytest

    assert CFG.context_length == TRUNK.max_position_embeddings - \
        TRUNK.pad_token_id - 1
    bertish = dataclasses.replace(CFG, arch="bert")
    assert bertish.context_length == TRUNK.max_position_embeddings
    mt5ish = dataclasses.replace(CFG, arch="mt5")
    assert mt5ish.context_length == 0

    bad = dataclasses.replace(CFG, pooler="max")
    params = hf_text.init(jax.random.PRNGKey(2), CFG)
    with pytest.raises(ValueError, match="unknown pooler"):
        hf_text.forward(params, jnp.asarray(_batch(rng)), bad)
