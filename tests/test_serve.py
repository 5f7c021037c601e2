"""Batching inference server (keep_tpu.serve): bucket padding, concurrent
micro-batching, HTTP endpoints, warmup — on a tiny KEEP model."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu import serve
from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
from keep_tpu.models import keep

VOCAB = "[PAD] [UNK] [CLS] [SEP] [MASK] lung tumor normal tissue image of a .".split()


@pytest.fixture(scope="module")
def core():
    cfg = KEEPConfig(
        vision=ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=1,
                         num_heads=2),
        text=BertConfig(vocab_size=len(VOCAB), hidden_size=32,
                        num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64, max_position_embeddings=32),
        projection_dim=32, max_text_length=16,
    )
    model = keep.KEEPModel(params=keep.init(jax.random.PRNGKey(0), cfg),
                           cfg=cfg)
    from keep_tpu.text.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer(vocab={w: i for i, w in enumerate(VOCAB)})
    c = serve.InferenceServer(model, tok, max_length=16, image_size=16,
                              buckets=(2, 4), max_delay_ms=20.0)
    yield c
    c.stop()


def test_bucket_selection():
    assert serve._bucket(1, (2, 4)) == 2
    assert serve._bucket(3, (2, 4)) == 4
    assert serve._bucket(9, (2, 4)) == 4  # clamped to the largest


def test_stats_bucket_hit_rates(core):
    """stats() attributes every dispatch to the compiled bucket it padded
    to — the hit-rate data the per-bucket precision policy is tuned on."""
    before = core.stats()["text"]["bucket_hits"]
    core.encode_text(["tumor ."])           # 1 -> bucket 2
    core.encode_text(["tumor ."] * 3)       # 3 -> bucket 4
    core.encode_text(["tumor ."] * 2)       # 2 -> bucket 2
    after = core.stats()["text"]["bucket_hits"]
    delta = {b: after.get(b, 0) - before.get(b, 0) for b in (2, 4)}
    assert delta == {2: 2, 4: 1}, after
    # dispatch totals and bucket attribution agree
    s = core.stats()["text"]
    assert sum(s["bucket_hits"].values()) == s["dispatches"]


def test_encode_and_similarity(core):
    out = core.encode_text(["an image of lung tumor .", "normal tissue ."])
    assert out.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-4)

    imgs = np.random.default_rng(0).integers(0, 255, (3, 20, 24, 3)).astype(np.uint8)
    emb = core.encode_image(imgs)
    assert emb.shape == (3, 32)
    sim = core.similarity(["a image of ."], imgs)
    assert sim.shape == (3, 1)

    # padding must not leak into results: 1-item call == slice of 3-item call
    one = core.encode_image(imgs[:1])
    np.testing.assert_allclose(one[0], emb[0], atol=1e-5)


def test_concurrent_requests_microbatch(core):
    """Concurrent callers coalesce into fewer device dispatches."""
    d0 = core.text_q.dispatches
    results = {}

    def call(i):
        results[i] = core.encode_text([f"image of tumor ."])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 4
    for i in range(1, 4):
        np.testing.assert_allclose(results[0], results[i], atol=1e-6)
    # 4 singleton requests, 20ms window, bucket max 4 → fewer than 4 dispatches
    assert core.text_q.dispatches - d0 < 4


def test_http_endpoints(core):
    httpd = serve.make_http_server(core, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def post(path, obj):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30) as r:
                return json.loads(r.read())

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert json.loads(r.read()) == {"ok": True}

        out = post("/encode_text", {"texts": ["lung tumor ."]})
        assert len(out["embeddings"]) == 1
        assert len(out["embeddings"][0]) == 32

        img = np.zeros((1, 16, 16, 3), np.uint8).tolist()
        out = post("/similarity", {"texts": ["normal ."], "images": img})
        assert len(out["logits"]) == 1

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["text"]["served"] >= 1
        assert stats["buckets"] == [2, 4]

        # bad route + bad payload → structured errors, server stays up
        req = urllib.request.Request(f"http://127.0.0.1:{port}/nope",
                                     data=b"{}")
        try:
            urllib.request.urlopen(req, timeout=10)
        except urllib.error.HTTPError as e:
            assert e.code == 404
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/encode_text", data=b'{"bad": 1}')
        try:
            urllib.request.urlopen(req, timeout=10)
        except urllib.error.HTTPError as e:
            assert e.code == 500
        out = post("/encode_text", {"texts": ["still alive ."]})
        assert len(out["embeddings"]) == 1
    finally:
        httpd.shutdown()


def test_warmup_compiles_buckets(core):
    d0 = core.image_q.dispatches
    core.warmup()
    assert core.image_q.dispatches - d0 == len(core.buckets)


def test_mesh_sharded_server(core):
    """mesh= shards request batches over 'dp' (params replicated); results
    match the single-device server bit-for-bit at fp32."""
    from keep_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    sharded = serve.InferenceServer(core.model, core.tokenizer,
                                    max_length=16, image_size=16,
                                    buckets=(2, 4), max_delay_ms=5.0,
                                    mesh=mesh)
    try:
        # buckets rounded up to multiples of the dp axis
        assert all(b % 8 == 0 for b in sharded.buckets), sharded.buckets
        texts = ["an image of lung tumor .", "normal tissue ."]
        a = core.encode_text(texts)
        b = sharded.encode_text(texts)
        np.testing.assert_allclose(a, b, atol=1e-5)

        imgs = np.random.default_rng(3).integers(
            0, 255, (3, 16, 16, 3)).astype(np.uint8)
        np.testing.assert_allclose(core.encode_image(imgs),
                                   sharded.encode_image(imgs), atol=1e-5)
        # the device_put really committed to the dp sharding
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        placed = jax.device_put(np.zeros((8, 4)), NamedSharding(mesh, P("dp")))
        assert len(placed.addressable_shards) == 8
    finally:
        sharded.stop()


def test_pipelined_results_route_to_right_callers(core):
    """Distinct concurrent requests get THEIR OWN results back (offset
    bookkeeping under the double-buffered launch/fetch split)."""
    texts = [f"lung tumor {'.' * (i % 3 + 1)}" for i in range(6)]
    direct = {t: core.encode_text([t])[0] for t in set(texts)}

    results = {}

    def call(i):
        results[i] = core.encode_text([texts[i]])[0]

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(6):
        np.testing.assert_allclose(results[i], direct[texts[i]], atol=1e-5,
                                   err_msg=f"request {i} got wrong result")


def test_queue_error_propagates_and_recovers(core):
    """A failing payload errors only its own waiters; the queue keeps
    serving afterwards (launch-phase failure path)."""
    with pytest.raises(Exception):
        core.image_q.submit(np.zeros((1, 7, 7, 7, 7), np.uint8))  # bad rank
    out = core.encode_text(["still serving ."])
    assert out.shape[0] == 1


def test_http_npy_binary_endpoint(core):
    """POST /encode_image_npy: raw .npy in, raw .npy out — the production
    transport (JSON int lists are ~4x bigger than uint8 .npy)."""
    import io

    httpd = serve.make_http_server(core, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        imgs = np.random.default_rng(5).integers(
            0, 255, (3, 16, 16, 3)).astype(np.uint8)
        buf = io.BytesIO()
        np.save(buf, imgs)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/encode_image_npy", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=30) as r:
            out = np.load(io.BytesIO(r.read()))
        assert out.shape == (3, 32) and out.dtype == np.float32
        np.testing.assert_allclose(out, core.encode_image(imgs), atol=1e-5)
    finally:
        httpd.shutdown()


def test_serve_main_lora_merge(tmp_path, monkeypatch, core):
    """`serve.py --lora <ckpt>`: the adapter checkpoint is merged into the
    base weights before the server is built — the served model must match
    merge_lora(base, adapters) and differ from the base."""
    from keep_tpu.compat.export import save_pretrained
    from keep_tpu.train import checkpoint as ckpt, lora

    cfg = core.model.cfg
    base = core.model.params
    model_dir = tmp_path / "model"
    save_pretrained(str(model_dir), base, cfg)
    (model_dir / "vocab.txt").write_text("\n".join(VOCAB))

    adapters = lora.init_lora(jax.random.PRNGKey(3), base, rank=2)
    # nonzero b so the merged model actually differs
    adapters = jax.tree.map(lambda x: x + 0.05, adapters)
    ck_dir = tmp_path / "ckpt"
    w = ckpt.CheckpointWriter(str(ck_dir))
    w.save(0, adapters, None, step=1)
    w.close()
    # the training CLI's config dump next to checkpoints/ — serve reads
    # alpha/rank from it when --lora-scale is not passed
    (tmp_path / "params.txt").write_text(
        json.dumps({"solver": {"lora_rank": 2, "lora_alpha": 4.0}}))

    captured = {}

    class StubServer:
        def __init__(self, model, tokenizer, **kw):
            captured["model"] = model

        def warmup(self):
            pass

        def stop(self):
            pass

    class StubHTTPD:
        server_address = ("127.0.0.1", 0)

        def serve_forever(self):
            raise KeyboardInterrupt

        def shutdown(self):
            pass

    monkeypatch.setattr(serve, "InferenceServer", StubServer)
    monkeypatch.setattr(serve, "make_http_server", lambda *a, **k: StubHTTPD())
    # no --lora-scale: resolved as alpha/rank = 4/2 = 2.0 from params.txt
    serve.main(["--model-dir", str(model_dir), "--lora", str(ck_dir)])

    served = captured["model"].params
    want = lora.merge_lora(
        keep.KEEPModel.from_pretrained(str(model_dir)).params,
        jax.tree.map(jnp.asarray, ckpt.restore(str(ck_dir))["params"]),
        scale=2.0)
    got_k = np.asarray(served["visual"]["blocks"]["attn"]["qkv"]["kernel"])
    want_k = np.asarray(want["visual"]["blocks"]["attn"]["qkv"]["kernel"])
    np.testing.assert_allclose(got_k, want_k, rtol=1e-5, atol=1e-6)
    base_k = np.asarray(base["visual"]["blocks"]["attn"]["qkv"]["kernel"])
    assert not np.allclose(got_k, base_k)


def test_oversize_requests_chunk_not_crash(core):
    """Requests (or concurrent bursts) larger than the biggest bucket must
    be served via chunking/deferral, never a negative-pad crash."""
    rng = np.random.default_rng(5)
    big = rng.integers(0, 255, (11, 16, 16, 3), dtype=np.uint8)  # > max 4
    out = core.encode_image(big)
    assert out.shape == (11, core.model.cfg.projection_dim)
    # matches the same tiles sent one at a time
    one = np.concatenate([core.encode_image(big[i:i + 1]) for i in range(11)])
    np.testing.assert_allclose(np.asarray(out), one, atol=1e-5)


def test_per_bucket_precision_policy():
    """alt_buckets routes the listed (tower, bucket) dispatches to alt_model
    — the measured per-bucket precision policy (small text buckets bf16,
    the rest int8; docs/PERF.md serving)."""
    import dataclasses

    cfg = KEEPConfig(
        vision=ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=1,
                         num_heads=2),
        text=BertConfig(vocab_size=len(VOCAB), hidden_size=32,
                        num_hidden_layers=1, num_attention_heads=2,
                        intermediate_size=64, max_position_embeddings=32),
        projection_dim=32, max_text_length=16,
    )
    base = keep.KEEPModel(params=keep.init(jax.random.PRNGKey(0), cfg),
                          cfg=cfg)
    calls = {"primary": 0, "alt": 0}

    @dataclasses.dataclass(frozen=True)
    class Tagged:
        inner: object
        tag: str

        @property
        def params(self):
            return self.inner.params

        def encode_text(self, ids, mask):
            calls[self.tag] += 1
            return self.inner.encode_text(ids, mask)

        def encode_image(self, px):
            calls[self.tag] += 1
            return self.inner.encode_image(px)

    from keep_tpu.text.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer(vocab={w: i for i, w in enumerate(VOCAB)})
    core = serve.InferenceServer(
        Tagged(base, "primary"), tok, max_length=16, image_size=16,
        buckets=(2, 4), max_delay_ms=1.0,
        alt_model=Tagged(base, "alt"), alt_buckets={"text": (2,)})
    try:
        core.encode_text(["tumor ."])             # bucket 2 -> alt
        assert calls == {"primary": 0, "alt": 1}
        core.encode_text(["tumor ."] * 3)         # bucket 4 -> primary
        assert calls == {"primary": 1, "alt": 1}
        imgs = np.zeros((1, 16, 16, 3), np.uint8)
        core.encode_image(imgs)                   # image has no alt buckets
        assert calls == {"primary": 2, "alt": 1}
        # results identical either way (same underlying weights here)
        a = core.encode_text(["tumor ."])
        b = core.encode_text(["tumor .", "normal tissue .", "a ."])[:1]
        np.testing.assert_allclose(a, b, atol=1e-5)
    finally:
        core.stop()


def test_alt_buckets_without_alt_model_rejected():
    with pytest.raises(ValueError, match="alt_model"):
        serve.InferenceServer(object(), object(), alt_buckets={"text": (1,)})


def test_alt_buckets_must_exist_in_compiled_buckets():
    """A precision-policy bucket that can never be hit (typo, or rounded
    away by the mesh path) must fail fast, not silently serve the wrong
    model."""
    with pytest.raises(ValueError, match="not in"):
        serve.InferenceServer(object(), object(), buckets=(2, 4),
                              alt_model=object(),
                              alt_buckets={"text": (3,)})


def test_alt_buckets_unknown_tower_rejected():
    """A typo'd tower name ('txt', 'images') never matches _model_for's
    lookups, silently serving the primary model — fail fast instead."""
    with pytest.raises(ValueError, match="tower 'txt' unknown"):
        serve.InferenceServer(object(), object(), buckets=(2, 4),
                              alt_model=object(),
                              alt_buckets={"txt": (2,)})


@pytest.mark.parametrize("rtt_ms,probe_meds,expect_alt", [
    # relay link + bf16 measures >10% faster at B=1 -> bf16 alt at bucket 1
    (28.0, {"int8": 69.0, "bf16": 48.0}, True),
    # relay link but int8 holds its seat (winner within the probe margin)
    (28.0, {"int8": 49.1, "bf16": 53.7}, False),
    # co-located: int8 everywhere, and the probe must never run
    (0.4, None, False),
])
def test_serve_main_precision_policy_auto(tmp_path, monkeypatch, core,
                                          rtt_ms, probe_meds, expect_alt):
    """`--int8` + the default `--precision-policy auto`: co-located serves
    int8 everywhere without probing; on a relay link a measured B=1 probe
    decides, with int8 keeping its seat inside the margin. RTT is faked via
    utils.rtt's memo and the probe via its medians so no device timing
    enters the test."""
    from keep_tpu.compat.export import save_pretrained
    from keep_tpu.quant import is_quantized
    from keep_tpu.utils import rtt as rtt_mod

    cfg = core.model.cfg
    model_dir = tmp_path / "model"
    save_pretrained(str(model_dir), core.model.params, cfg)
    (model_dir / "vocab.txt").write_text("\n".join(VOCAB))

    monkeypatch.setattr(rtt_mod, "_memo",
                        {"median_ms": rtt_ms, "p95_ms": rtt_ms,
                         "min_ms": rtt_ms, "n": 1})
    probe_calls = []

    def fake_probe(candidates, *, n=5, default=None,
                   margin=rtt_mod.PROBE_MARGIN):
        probe_calls.append(sorted(candidates))
        assert sorted(candidates) == ["bf16", "int8"]
        return rtt_mod.pick_from_medians(probe_meds, default, margin), \
            probe_meds

    monkeypatch.setattr(rtt_mod, "pick_by_probe", fake_probe)
    captured = {}

    class StubServer:
        def __init__(self, model, tokenizer, **kw):
            captured["model"] = model
            captured["alt_model"] = kw.get("alt_model")
            captured["alt_buckets"] = kw.get("alt_buckets")

        def warmup(self):
            pass

        def stop(self):
            pass

    class StubHTTPD:
        server_address = ("127.0.0.1", 0)

        def serve_forever(self):
            raise KeyboardInterrupt

    monkeypatch.setattr(serve, "InferenceServer", StubServer)
    monkeypatch.setattr(serve, "make_http_server", lambda *a, **k: StubHTTPD())

    serve.main(["--model-dir", str(model_dir), "--int8"])
    assert is_quantized(captured["model"].params)
    assert len(probe_calls) == (1 if probe_meds else 0)
    if expect_alt:
        assert captured["alt_buckets"] == {"image": (1,)}
        assert captured["alt_model"] is not None
        assert not is_quantized(captured["alt_model"].params)
    else:
        assert captured["alt_model"] is None
        assert captured["alt_buckets"] is None

    # all-int8 forces the old behavior regardless of the measured link
    serve.main(["--model-dir", str(model_dir), "--int8",
                "--precision-policy", "all-int8"])
    assert captured["alt_model"] is None
