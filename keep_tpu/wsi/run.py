"""Executable zero-shot WSI drivers: ``python -m keep_tpu.wsi.run <task> ...``

Mirrors the reference driver scripts (WSI_evaluation/zeroshot_detection_WSI.py,
zeroshot_segmentation_WSI.py, zeroshot_subtyping_WSI.py): load model +
prompts, build the prompt-ensemble classifier (screened or seeded-random),
sweep one slide or a cohort CSV, print metrics.
"""

from __future__ import annotations

import argparse
import json
import logging

import jax.numpy as jnp
import numpy as np


def build_ensemble(model, tokenizer, prompts, label_map, features, args):
    from keep_tpu.zeroshot import (
        build_classifiers_batched,
        prompt_select,
        random_ensemble,
    )

    encode = lambda ids, mask: model.encode_text(jnp.asarray(ids), jnp.asarray(mask))
    stack = build_classifiers_batched(
        encode, tokenizer, prompts, label_map,
        add_normal=args.add_normal, batch_size=args.text_batch_size,
        max_length=args.max_length,
        length_buckets=None if args.no_text_buckets else "auto",
    )
    if args.prompt_screening:
        logging.info("screening %d prompt classifiers...", stack.shape[0])
        return prompt_select(stack, jnp.asarray(features), topn=args.topn)
    return random_ensemble(stack, topn=args.topn)


def load_model(args, calib_pixels=None):
    import jax

    from keep_tpu.models.keep import KEEPModel
    from keep_tpu.factory import get_tokenizer

    model = KEEPModel.from_pretrained(
        args.model, dtype=jnp.bfloat16,
        use_flash=jax.default_backend() == "tpu",
    )
    tokenizer = get_tokenizer("bert", args.model)  # native fast path if built
    if getattr(args, "int8", False):
        model = model.quantize(calib_pixels=calib_pixels)
    return model, tokenizer


def _try_open_pyramid(path: str):
    """Native WSIReader when the file is a multi-level pyramid (or .svs);
    None routes to the simple whole-image PIL path."""
    if not str(path).lower().endswith((".tif", ".tiff", ".svs")):
        return None
    try:
        from keep_tpu.io.wsi import WSIReader

        reader = WSIReader(path, backend="native")
    except Exception:
        return None
    if reader.level_count > 1 or str(path).lower().endswith(".svs"):
        return reader
    reader.close()
    return None


_flat_cache: dict = {}  # one entry: the --int8 calib pass precedes the
# extract pass over the same flat image; don't decode + grid-scan it twice


def _flat_tiles(args, image_path):
    """Whole-image (PIL) tile cut for non-pyramid inputs (memoized for the
    calib-then-extract double visit)."""
    key = (image_path, args.patch_size, args.tissue_fraction)
    if _flat_cache.get("key") == key:
        return _flat_cache["value"]
    from PIL import Image

    from keep_tpu.io.tiles import cut_tiles

    Image.MAX_IMAGE_PIXELS = None
    img = np.asarray(Image.open(image_path).convert("RGB"))
    tiles, coords = cut_tiles(img, patch_size=args.patch_size,
                              tissue_fraction=args.tissue_fraction)
    logging.info("cut %d tissue tiles (%dpx) from %s", len(tiles),
                 args.patch_size, image_path)
    _flat_cache.clear()
    _flat_cache.update(key=key, value=(tiles, coords))
    return tiles, coords


def _check_wsi_level(args, pyramid, image_path):
    if not 0 <= args.wsi_level < pyramid.level_count:
        pyramid.close()
        raise SystemExit(
            f"error: --wsi-level {args.wsi_level} out of range — "
            f"{image_path} has {pyramid.level_count} level(s)")


def _slide_calib(args, image_path):
    """SmoothQuant calibration pixels from the slide's own first tiles —
    the exact preprocessing the encode path applies — or None."""
    if not (getattr(args, "int8", False) and args.int8_calib):
        return None
    from keep_tpu.ops.preprocess import preprocess

    pyramid = _try_open_pyramid(image_path)
    if pyramid is not None:
        _check_wsi_level(args, pyramid, image_path)
        from keep_tpu.io.tiles import iter_wsi_tiles

        first = next(iter_wsi_tiles(
            pyramid, patch_size=args.patch_size,
            tissue_fraction=args.tissue_fraction,
            chunk=args.int8_calib, level=args.wsi_level), None)
        pyramid.close()
        tiles = first[0] if first is not None else None
    else:
        tiles, _ = _flat_tiles(args, image_path)
        tiles = tiles[: args.int8_calib] if len(tiles) else None
    if tiles is None or not len(tiles):
        return None
    logging.info("int8 calibration on %d tiles", len(tiles))
    return preprocess(jnp.asarray(tiles))


def _extract_one(model, args, image_path, out_path, mesh) -> int:
    """One slide → one h5: streaming native-pyramid path when the file is
    a pyramid, whole-image PIL path otherwise. Returns the tile count."""
    pyramid = _try_open_pyramid(image_path)
    if pyramid is not None:
        _check_wsi_level(args, pyramid, image_path)
        from keep_tpu.wsi.extract import extract_wsi_to_h5

        logging.info("pyramidal slide %s: %d levels, level %d is %s",
                     image_path, pyramid.level_count, args.wsi_level,
                     pyramid.level_dimensions[args.wsi_level])
        pyramid.close()
        return extract_wsi_to_h5(
            model, image_path, out_path, patch_size=args.patch_size,
            tissue_fraction=args.tissue_fraction, level=args.wsi_level,
            batch_size=args.batch_size, resize=True, mesh=mesh)

    from keep_tpu.wsi.extract import extract_to_h5

    tiles, coords = _flat_tiles(args, image_path)
    extract_to_h5(model, tiles, coords, out_path,
                  batch_size=args.batch_size, resize=True, mesh=mesh)
    return len(tiles)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("task", choices=["detection", "segmentation",
                                         "subtyping", "extract"])
    parser.add_argument("--model", required=True, help="HF model dir (config.json + pytorch_model.bin + vocab.txt)")
    parser.add_argument("--prompts", help="prompt JSON (reference WSI_evaluation/prompts format; required for eval tasks)")
    parser.add_argument("--h5", help="one slide h5 (features+coords)")
    parser.add_argument("--cohort-csv", help="cohort CSV with slide_id/Diagnosis")
    parser.add_argument("--data-source", help="dir containing h5_files/ for the cohort")
    parser.add_argument("--label-map", default='{"Normal": 0, "Tumor": 1}',
                        help="JSON label→index map")
    parser.add_argument("--mask", help="segmentation GT mask (npy at level 0) or OpenSlide path")
    parser.add_argument("--mask-dir", help="cohort segmentation: dir of {slide_id}.npy level-0 masks")
    parser.add_argument("--patch-size", type=int, default=None)
    parser.add_argument("--topn", type=int, default=50)
    parser.add_argument("--no-screening", dest="prompt_screening", action="store_false")
    parser.add_argument("--text-batch-size", type=int, default=256)
    parser.add_argument("--max-length", type=int, default=256)
    parser.add_argument("--no-text-buckets", action="store_true",
                        help="pad every prompt to --max-length instead of "
                             "the measured auto bucketed-vs-flat plan "
                             "(bit-identical either way)")
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--heatmap-out", metavar="PNG",
                        help="single-slide eval tasks: also save a heatmap "
                        "at patch_size/16 px per patch (the reference's "
                        "mask-painting scale) — tumor prob*255 for "
                        "detection/segmentation, argmax class index + 1 "
                        "for subtyping")
    parser.add_argument("--int8", action="store_true",
                        help="W8A8 quantized inference (keep_tpu.quant)")
    parser.add_argument("--int8-calib", type=int, default=32, metavar="N",
                        help="extract+--int8: SmoothQuant-calibrate the "
                             "visual tower on the slide's first N tiles "
                             "(0 disables; quant.smooth_vit)")
    parser.add_argument("--image", help="extract: level-0 RGB image "
                        "(PIL-readable), or a pyramidal .tif/.svs slide — "
                        "pyramids stream through the native libtiff reader "
                        "(keep_tpu.io.wsi, no OpenSlide)")
    parser.add_argument("--wsi-level", type=int, default=0,
                        help="extract from a pyramid: pyramid level to read "
                             "tiles at (0 = full resolution)")
    parser.add_argument("--slide-dir", help="extract: directory of slides "
                        "(.svs/.tif/.png/...) — cohort mode, one h5 per "
                        "slide under --out-dir/h5_files/")
    parser.add_argument("--out-dir", help="extract --slide-dir: output root "
                        "(h5 tree ready for --data-source cohort eval)")
    parser.add_argument("--out", help="extract: output h5 path (features+coords)")
    parser.add_argument("--tissue-fraction", type=float, default=0.25)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--cascade-margin", type=float, default=None,
                        metavar="M",
                        help="detection --image: coarse-to-fine cascade — "
                             "refine only coarse tiles within M of the "
                             "decision threshold (0.5 = exact full sweep, "
                             "0 = trust the coarse pass; wsi/cascade.py)")
    parser.add_argument("--coarse-downsample", type=int, default=4,
                        help="cascade: target pyramid downsample for the "
                             "coarse pass (d^2 fewer tiles)")
    parser.add_argument("--mesh-dp", action="store_true",
                        help="extract: shard the tile axis over a 'dp' device "
                             "mesh (params replicated) — the pod-scale "
                             "feature-extraction path")
    args = parser.parse_args(argv)
    args.add_normal = args.task == "subtyping"
    if args.patch_size is None:
        args.patch_size = 224 if args.task == "segmentation" else 256

    logging.basicConfig(level=logging.INFO)

    if args.task == "extract":
        # pixels → CLAM-style h5: the feature-extraction step the reference
        # outsources to CLAM (README.md:74 'precomputed patch features')
        if args.slide_dir:
            if not args.out_dir:
                parser.error("extract --slide-dir needs --out-dir")
        elif not (args.image and args.out):
            parser.error("extract needs --image and --out "
                         "(or --slide-dir and --out-dir)")
        mesh = None
        if args.mesh_dp:
            from keep_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(axes=("dp",))
            logging.info("extraction sharded over %d devices",
                         mesh.shape["dp"])

        if args.slide_dir:
            # cohort mode: every slide in the dir → <out-dir>/h5_files/
            # <stem>.h5, the exact tree WSIDataset/--data-source consumes.
            # The model loads ONCE (int8 calibrates on the first slide).
            import glob
            import os

            exts = (".svs", ".tif", ".tiff", ".png", ".jpg", ".jpeg")
            slides = sorted(
                p for p in glob.glob(os.path.join(args.slide_dir, "*"))
                if p.lower().endswith(exts)
            )
            if not slides:
                parser.error(f"no slides ({'/'.join(exts)}) in {args.slide_dir}")
            h5_dir = os.path.join(args.out_dir, "h5_files")
            os.makedirs(h5_dir, exist_ok=True)
            model = None
            total = 0
            for path in slides:
                if model is None:
                    model, _ = load_model(
                        args, calib_pixels=_slide_calib(args, path))
                stem = os.path.splitext(os.path.basename(path))[0]
                out = os.path.join(h5_dir, stem + ".h5")
                n = _extract_one(model, args, path, out, mesh)
                # the flat-image tile cache exists only so the FIRST
                # slide's calib pass + extract share one decode — holding
                # slide k's tiles while slide k+1 decodes would double
                # peak host memory across the sweep
                _flat_cache.clear()
                logging.info("%s: %d tiles -> %s", stem, n, out)
                total += n
            print(f"wrote {total} features across {len(slides)} slides "
                  f"to {h5_dir}")
            return

        model, _ = load_model(args, calib_pixels=_slide_calib(args, args.image))
        n = _extract_one(model, args, args.image, args.out, mesh)
        print(f"wrote {n} features to {args.out}")
        return
    from keep_tpu.io.h5 import WSIDataset, read_h5_slide
    from keep_tpu.wsi import cohort as cohort_mod
    from keep_tpu.wsi.pipelines import (
        zero_shot_detection,
        zero_shot_segment,
        zero_shot_subtyping,
    )

    if not args.prompts:
        parser.error(f"{args.task} needs --prompts")
    label_map = json.loads(args.label_map)
    with open(args.prompts) as f:
        prompts = json.load(f)
    model, tokenizer = load_model(args)

    if args.task == "detection" and args.image and not args.h5:
        # coarse-to-fine cascade straight off the pyramid (wsi/cascade.py):
        # no precomputed h5 needed; prompt screening runs on the coarse
        # pass's features (the cascade re-encodes them internally — the
        # coarse pass is ~downsample^-2 of the full cost either way)
        if args.cascade_margin is None:
            parser.error("detection --image runs the cascade sweep; pass "
                         "--cascade-margin (0.5 = exact full sweep) or "
                         "extract features first (task 'extract') and use "
                         "--h5")
        from keep_tpu.io.tiles import iter_wsi_tiles
        from keep_tpu.io.wsi import open_slide
        from keep_tpu.wsi.cascade import cascade_detect
        from keep_tpu.wsi.extract import extract_features

        with open_slide(args.image) as reader:
            level = reader.best_level_for_downsample(args.coarse_downsample)
            coarse = np.concatenate([t for t, _ in iter_wsi_tiles(
                reader, patch_size=args.patch_size,
                tissue_fraction=args.tissue_fraction,
                chunk=args.batch_size, level=level)])
        screen_feats = extract_features(model, coarse, resize=True,
                                        batch_size=args.batch_size)
        classifier = build_ensemble(model, tokenizer, prompts, label_map,
                                    screen_feats, args)
        res = cascade_detect(
            model, args.image, np.asarray(classifier),
            patch_size=args.patch_size,
            coarse_downsample=args.coarse_downsample,
            margin=args.cascade_margin, threshold=args.threshold,
            tissue_fraction=args.tissue_fraction,
            batch_size=args.batch_size, resize=True)
        print(f"Tumor probability: {res.tumor_prob:.4f}")
        print(f"cascade: {res.n_coarse} coarse + {res.n_fine_encoded} fine "
              f"encodes for {res.n_fine_total} tiles "
              f"(encode fraction {res.encode_fraction:.3f}, "
              f"downsample {res.downsample}, margin {args.cascade_margin})")
        return

    if args.h5:
        features, coords = read_h5_slide(args.h5)
        classifier = build_ensemble(model, tokenizer, prompts, label_map,
                                    features, args)
        feats = jnp.asarray(features)
        if args.task == "detection":
            prob = zero_shot_detection(classifier, feats, coords,
                                       patch_size=args.patch_size,
                                       threshold=args.threshold)
            print(f"Tumor probability: {prob:.4f}")
        elif args.task == "segmentation":
            if not args.mask:
                parser.error("segmentation needs --mask (level-0 .npy array "
                             "or an OpenSlide-readable path)")
            mask = np.load(args.mask) if args.mask.endswith(".npy") else None
            kw = {"mask": mask} if mask is not None else {"mask_path": args.mask}
            auc, dice = zero_shot_segment(classifier, feats, coords,
                                          patch_size=args.patch_size, **kw)
            print(f"AUROC: {auc:.4f}  Dice: {dice:.4f}")
        else:
            label, fractions = zero_shot_subtyping(classifier, feats, coords,
                                                   patch_size=args.patch_size)
            idx_to_class = {v: k for k, v in label_map.items()}
            print(f"Predicted subtype: {idx_to_class.get(label, label)} "
                  f"(fractions {np.round(fractions, 4).tolist()})")
        if args.heatmap_out:
            from PIL import Image

            from keep_tpu.wsi.pipelines import subtype_class_map, tumor_heatmap

            if args.task == "subtyping":
                hm = subtype_class_map(classifier, feats, coords,
                                       patch_size=args.patch_size)
            else:
                # refined (overlap) for segmentation, the detection rule is
                # overlap=False — each task's own decision semantics
                hm = tumor_heatmap(classifier, feats, coords,
                                   patch_size=args.patch_size,
                                   overlap=args.task == "segmentation")
            Image.fromarray(hm).save(args.heatmap_out)
            print(f"Heatmap ({hm.shape[0]}x{hm.shape[1]}) -> "
                  f"{args.heatmap_out}")
        return

    if not (args.cohort_csv and args.data_source):
        parser.error("provide --h5 for one slide or --cohort-csv + --data-source")
    import pandas as pd

    df = pd.read_csv(args.cohort_csv)
    ds = WSIDataset(df, args.data_source, label_map=label_map)
    first = ds[0]
    classifier = build_ensemble(model, tokenizer, prompts, label_map,
                                first["features"], args)

    def slides():  # reuse the screening slide's features (no double read)
        yield first
        for i in range(1, len(ds)):
            yield ds[i]

    if args.task == "detection":
        out = cohort_mod.detection_cohort(classifier, slides(),
                                          patch_size=args.patch_size,
                                          threshold=args.threshold)
    elif args.task == "subtyping":
        out = cohort_mod.subtyping_cohort(classifier, slides(),
                                          patch_size=args.patch_size)
    else:
        if not args.mask_dir:
            parser.error("cohort segmentation needs --mask-dir "
                         "({slide_id}.npy level-0 masks)")
        import os

        provider = lambda sid: np.load(os.path.join(args.mask_dir, sid + ".npy"))
        out = cohort_mod.segmentation_cohort(classifier, slides(), provider,
                                             patch_size=args.patch_size)
    out.pop("per_slide", None)
    print(json.dumps(out, indent=2, default=float))


if __name__ == "__main__":
    main()
