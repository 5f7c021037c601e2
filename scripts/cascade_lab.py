"""Perf probe: coarse-to-fine cascade sweep vs the plain full sweep.

Synthetic pyramid slide (pink tissue texture + a dark region so a
prototype classifier separates two classes and the uncertainty band is
non-trivial), flagship ViT-L/16 bf16, pixels→decision end to end from
disk. Reports per-margin wall time, encode_fraction, and agreement with
the plain sweep (slide call + per-tile calls) — the numbers docs/PERF.md
"Cascade sweep" cites.

Run: `python -m scripts.cascade_lab [--tiny]` (--tiny: 32px tower on CPU,
a smoke of the harness itself, not a perf claim).
"""

import argparse
import json
import os
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp


def build_slide(path, side, dark_frac=0.25, seed=3):
    from keep_tpu.io.wsi import write_pyramid

    g = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:side, 0:side]
    base = np.broadcast_to(
        np.array([210.0, 140.0, 180.0]), (side, side, 3)).copy()
    # one solid dark block + scattered dark islands: confident tumor core,
    # confident normal field, and real boundaries for the margin band
    dark = (xx > side * (1 - dark_frac)) & (yy > side * (1 - dark_frac))
    for cy, cx, r in ((0.3, 0.6, 0.04), (0.7, 0.2, 0.03), (0.15, 0.25, 0.05)):
        dark |= ((yy - cy * side) ** 2 + (xx - cx * side) ** 2) < (r * side) ** 2
    base[dark] = [120.0, 60.0, 100.0]
    slide = np.clip(base + g.normal(0, 12, base.shape), 0, 255).astype(np.uint8)
    write_pyramid(path, slide, tile=256, compression="none", min_size=side // 8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--side", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    args = ap.parse_args()

    from bench import enable_compile_cache
    from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
    from keep_tpu.io.tiles import iter_wsi_tiles
    from keep_tpu.models import keep
    from keep_tpu.wsi.cascade import cascade_detect
    from keep_tpu.wsi.extract import extract_features
    from keep_tpu.wsi.pipelines import score_tiles

    enable_compile_cache()

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        ps = 32
        cfg = KEEPConfig(
            vision=ViTConfig(img_size=ps, patch_size=16, embed_dim=32,
                             depth=2, num_heads=2),
            text=BertConfig(vocab_size=32, hidden_size=32,
                            num_hidden_layers=1, num_attention_heads=2,
                            intermediate_size=64,
                            max_position_embeddings=32),
            projection_dim=32)
        side = args.side or 2048
        bs = args.batch_size or 32
    else:
        ps = 224
        cfg = KEEPConfig()  # ViT-L/16 + BERT-base
        side = args.side or 7168  # 32x32 = 1024 level-0 tiles
        bs = args.batch_size or 256

    model = keep.KEEPModel(
        params=keep.init(jax.random.PRNGKey(0), cfg), cfg=cfg,
        dtype=jnp.bfloat16, use_flash=jax.default_backend() == "tpu")

    tmp = tempfile.mkdtemp(prefix="cascade_lab_")
    slide = os.path.join(tmp, "slide.tif")
    build_slide(slide, side)
    print(f"slide: {side}x{side} raw pyramid at {slide} "
          f"({os.path.getsize(slide) / 1e6:.0f} MB)", flush=True)

    # Classifier: bright/dark class CENTROIDS from a prep pass over the
    # whole slide, softmax scale calibrated so typical tiles are confident
    # (|p-0.5| large) and only boundary-texture tiles land in the margin
    # band — a random-init encoder's raw cosine gaps are tiny, a trained
    # checkpoint's are not; the calibration stands in for training. The
    # prep pass is also the compile warmup; it is NOT part of any timing.
    parts0 = list(iter_wsi_tiles(slide, patch_size=ps, tissue_fraction=0.25,
                                 chunk=bs))
    tiles_all = np.concatenate([t for t, _ in parts0])
    feats_all = extract_features(model, (t for t, _ in parts0), batch_size=bs)
    del parts0
    lum = tiles_all.mean(axis=(1, 2, 3))
    bright = lum >= np.percentile(lum, 80)
    dark = lum <= np.percentile(lum, 20)
    protos = np.stack([feats_all[bright].mean(0), feats_all[dark].mean(0)],
                      axis=1)
    classifier = protos / np.linalg.norm(protos, axis=0, keepdims=True)
    gap = np.abs(feats_all @ classifier[:, 1] - feats_all @ classifier[:, 0])
    scale = float(np.clip(4.0 / max(np.median(gap), 1e-6), 1.0, 5000.0))
    del tiles_all, feats_all
    print(f"calibrated softmax scale: {scale:.1f} "
          f"(median cos gap {np.median(gap):.2e})", flush=True)

    # plain full sweep, STREAMED from disk (decode of chunk N+1 overlaps
    # the device exactly as the cascade's passes do — a pre-decoded list()
    # would hand the cascade an unfair serial-decode baseline)
    def full_sweep():
        coords_acc = []

        def gen():
            for t, c in iter_wsi_tiles(slide, patch_size=ps,
                                       tissue_fraction=0.25, chunk=bs):
                coords_acc.append(c)
                yield t

        feats = extract_features(model, gen(), batch_size=bs)
        coords = np.concatenate(coords_acc)
        probs = np.asarray(score_tiles(jnp.asarray(classifier),
                                       jnp.asarray(feats), scale=scale))
        return probs, coords

    t0 = time.time()
    probs_full, coords_full = full_sweep()
    t_full = time.time() - t0
    n = len(coords_full)

    # A random-init encoder's probability spread around any fixed threshold
    # is arbitrary, so margins are derived from the measured coarse
    # distribution itself: threshold = the median coarse tumor prob, and
    # margin(f) = the f-quantile of |p - threshold| — i.e. "refine the f
    # most-uncertain fraction of parents". On a trained checkpoint you pick
    # margin on the probability axis directly; here the quantile mapping is
    # what makes refine fractions (and hence timings) reproducible.
    res0 = cascade_detect(model, slide, classifier, patch_size=ps,
                          coarse_downsample=4, margin=0.0,
                          batch_size=bs, scale=scale)
    p_parent = res0.probs[:, 1]
    # +1e-6 dodges the exact-tie atom a degenerate (constant-output) encoder
    # puts AT the median — |p - thr| <= 0 would otherwise refine every tie
    thr = float(np.median(p_parent)) + 1e-6
    dist = np.abs(p_parent - thr)
    call_full = probs_full[:, 1] > thr

    out = {
        "n_tiles": n,
        "full_sweep_s": round(t_full, 2),
        "full_sweep_tiles_per_s": round(n / t_full, 1),
        "threshold": round(thr, 4),
        "slide_tumor_frac_full": round(float(call_full.mean()), 4),
        "margins": [],
    }
    print(json.dumps({k: v for k, v in out.items() if k != "margins"}),
          flush=True)

    for frac in (1.0, 0.25, 0.1, 0.0):
        margin = (1.0 if frac >= 1.0 else
                  0.0 if frac <= 0.0 else
                  float(np.quantile(dist, frac)))
        t0 = time.time()
        res = cascade_detect(model, slide, classifier, patch_size=ps,
                             coarse_downsample=4, margin=margin,
                             threshold=thr, batch_size=bs, scale=scale)
        dt = time.time() - t0
        assert np.array_equal(res.coords, coords_full)
        call = res.probs[:, 1] > thr
        rec = {
            "target_refine_frac": frac,
            "margin": round(margin, 5),
            "wall_s": round(dt, 2),
            "tiles_per_s": round(n / dt, 1),
            "speedup_vs_full": round(t_full / dt, 3),
            "encode_fraction": round(res.encode_fraction, 4),
            "n_coarse": res.n_coarse,
            "n_fine_encoded": res.n_fine_encoded,
            "tile_call_agreement": round(float((call == call_full).mean()), 4),
            "slide_tumor_frac": round(res.tumor_prob, 4),
        }
        out["margins"].append(rec)
        print(json.dumps(rec), flush=True)
        if frac >= 1.0:
            np.testing.assert_allclose(res.probs, probs_full, atol=2e-2)
            assert rec["tile_call_agreement"] == 1.0

    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
