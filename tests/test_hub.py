"""Local hub publishing (compat.hub ← reference push_to_hf_hub.py:40-241):
artifact layout, model-card generation format, registry wiring."""

import json
import os

import numpy as np
import pytest

from keep_tpu.compat import hub


def test_generate_readme_format():
    card = {
        "license": "apache-2.0",
        "description": "A CLIP model for pathology.",
        "details": {
            "Dataset": "OpenPath",
            "Architecture": ["ViT-L-16", "BERT-base"],
            "Training": {"epochs": 10, "batch": 128},
        },
        "usage": "```python\nmodel.encode_image(x)\n```",
        "citation": ["@article{keep2026}", "@misc{openclip}"],
    }
    text = hub.generate_readme(card, "KEEP-demo")
    # frontmatter contract (push_to_hf_hub.py:195-204)
    assert text.startswith("---\ntags:\n- clip\nlibrary_name: open_clip\n")
    assert "pipeline_tag: zero-shot-image-classification" in text
    assert "license: apache-2.0" in text
    assert "datasets:\n- openpath\n" in text  # lowercased
    assert "# Model card for KEEP-demo" in text
    # nested details rendering
    assert "- **Architecture:**\n  - ViT-L-16\n  - BERT-base" in text
    assert "- **Training:**\n  - epochs: 10\n  - batch: 128" in text
    assert text.count("```bibtex") == 2
    # default license
    assert "license: mit" in hub.generate_readme({}, "x")


def test_push_to_hub_layout(tmp_path):
    sd = {"visual.proj": np.ones((4, 2), np.float32),
          "logit_scale": np.asarray(3.2, np.float32)}
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("[PAD]\n[UNK]\nhello\n")
    repo = hub.push_to_hub(
        "acme/keep-demo", sd,
        model_config={"embed_dim": 2, "vision_cfg": {"width": 4}},
        tokenizer_files=[str(vocab)],
        model_card={"description": "demo"},
        hub_root=str(tmp_path / "hubroot"),
        register=False,
    )
    files = set(os.listdir(repo))
    assert {"open_clip_config.json", "open_clip_pytorch_model.bin",
            "weights.npz", "vocab.txt", "README.md"} <= files
    cfg = json.loads(open(os.path.join(repo, "open_clip_config.json")).read())
    assert cfg["model_cfg"]["embed_dim"] == 2
    assert cfg["preprocess_cfg"]["mean"] == [0.485, 0.456, 0.406]
    # round-trip the torch weights
    import torch

    back = torch.load(os.path.join(repo, "open_clip_pytorch_model.bin"),
                      map_location="cpu", weights_only=True)
    np.testing.assert_array_equal(back["visual.proj"].numpy(),
                                  sd["visual.proj"])
    # README is only generated when absent (has_readme semantics)
    with open(os.path.join(repo, "README.md"), "w") as f:
        f.write("CUSTOM")
    hub.push_to_hub("acme/keep-demo", sd,
                    hub_root=str(tmp_path / "hubroot"), register=False)
    assert open(os.path.join(repo, "README.md")).read() == "CUSTOM"


def test_push_registers_in_registry(tmp_path):
    from keep_tpu.compat import registry

    sd = {"w": np.zeros(3, np.float32)}
    hub.push_to_hub("acme/reg-demo", sd, hub_root=str(tmp_path / "hub"))
    path = registry.resolve("acme/reg-demo")
    assert os.path.exists(path)
    with pytest.raises(ValueError, match="owner/name"):
        hub.push_to_hub("nade", sd)


def test_safetensors_roundtrip(tmp_path):
    """safe_serialization='both' writes .safetensors + .bin; the
    safetensors file round-trips through the checkpoint reader, and
    KEEPModel.from_pretrained loads a safetensors-only model dir (the
    layout new HF releases ship)."""
    from safetensors.numpy import load_file

    sd = {"a.w": np.arange(6, dtype=np.float32).reshape(2, 3),
          "b": np.asarray(2.5, np.float32)}
    hub.save_for_hub(str(tmp_path / "repo"), sd, safe_serialization="both")
    files = set(os.listdir(tmp_path / "repo"))
    assert {"open_clip_model.safetensors", "open_clip_pytorch_model.bin"} <= files
    back = load_file(str(tmp_path / "repo" / "open_clip_model.safetensors"))
    np.testing.assert_array_equal(back["a.w"], sd["a.w"])

    from keep_tpu.compat.torch_loader import load_state_dict_file

    via_reader = load_state_dict_file(
        str(tmp_path / "repo" / "open_clip_model.safetensors"))
    np.testing.assert_array_equal(np.asarray(via_reader["a.w"]), sd["a.w"])

    # safetensors-only KEEP model dir loads through from_pretrained
    import jax

    from keep_tpu.compat.export import save_pretrained, to_keep_state_dict
    from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
    from keep_tpu.models import keep

    cfg = KEEPConfig(
        vision=ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=1,
                         num_heads=2),
        text=BertConfig(vocab_size=32, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=16),
        projection_dim=32, max_text_length=8)
    params = keep.init(jax.random.PRNGKey(0), cfg)
    d = tmp_path / "model"
    save_pretrained(str(d), params, cfg)
    from safetensors.numpy import save_file

    full = {k: np.ascontiguousarray(np.asarray(v, np.float32))
            for k, v in to_keep_state_dict(params, cfg).items()}
    save_file(full, str(d / "model.safetensors"))
    os.remove(d / "pytorch_model.bin")
    m = keep.KEEPModel.from_pretrained(str(d))
    out = m.encode_image(np.zeros((1, 16, 16, 3), np.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_download_cache_hit_and_sha_sniffing(tmp_path, monkeypatch):
    """Zero-egress legs of download_pretrained_from_url: the expected sha
    is sniffed from openaipublic/mlfoundations URL forms and a cached file
    matching it returns WITHOUT any network; a directory squatting on the
    target fails fast; resolve_to_path dispatches '://' to the downloader."""
    import hashlib

    import pytest

    from keep_tpu.compat import registry as reg

    monkeypatch.setenv("KEEP_TPU_HOME", str(tmp_path))
    cache = tmp_path / "downloads"
    cache.mkdir(parents=True)

    blob = b"weights-bytes"
    sha = hashlib.sha256(blob).hexdigest()

    # mlfoundations form: sha rides the filename suffix
    mlf = f"model-{sha[:8]}.pt"
    (cache / mlf).write_bytes(blob)
    url = f"https://huggingface.co/mlfoundations/x/resolve/{mlf}"
    assert reg.download_pretrained_from_url(url, cache_dir=str(cache)) == \
        str(cache / mlf)

    # openaipublic form: sha is the parent path segment
    (cache / "RN50.pt").write_bytes(blob)
    url2 = f"https://openaipublic.azureedge.net/clip/{sha}/RN50.pt"
    assert reg.download_pretrained_from_url(url2, cache_dir=str(cache)) == \
        str(cache / "RN50.pt")
    # and fetch() routes the URL form through the same (env-pinned) cache
    assert reg.fetch(url2) == str(cache / "RN50.pt")

    # a directory where the file should be is an explicit error
    (cache / "dir.pt").mkdir()
    with pytest.raises(RuntimeError, match="not a regular file"):
        reg.download_pretrained_from_url(
            "https://example.com/no-sha/dir.pt", cache_dir=str(cache))
