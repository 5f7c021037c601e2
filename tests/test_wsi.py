"""WSI grid/refine/pipeline tests against an independent dict-based oracle
implementing the documented reference semantics (SURVEY.md §2.1 #6-#8)."""

import jax.numpy as jnp
import numpy as np
import pytest

from keep_tpu.wsi.grid import CoordGrid, refine_grid
from keep_tpu.wsi.pipelines import (
    dice_at_lowres,
    patch_labels_from_mask,
    refined_tumor_probs,
    score_tiles,
    zero_shot_detection,
    zero_shot_segment,
    zero_shot_subtyping,
)


def make_slide(rng, n=400, ps=256, holes=0.3, dup=5):
    """Random sparse coordinate grid with holes + duplicate coords."""
    side = int(np.sqrt(n / (1 - holes))) + 2
    cells = [(r, c) for r in range(side) for c in range(side)]
    rng.shuffle(cells)
    cells = cells[:n]
    coords = np.array([(c * ps, r * ps) for r, c in cells], np.int64)
    if dup:
        coords = np.concatenate([coords, coords[:dup]], axis=0)
    feats = rng.standard_normal((len(coords), 32), dtype=np.float32)
    return coords, feats


def oracle_refine(probs, coords, ps, overlap):
    """Dict-based neighbor averaging, straight from the documented rules:
    first-seen dedupe; mean over present {self, (x-ps,y-ps), (x,y-ps), (x-ps,y)}."""
    order, seen = [], {}
    for i, (x, y) in enumerate(coords):
        if (x, y) not in seen:
            seen[(x, y)] = probs[i]
            order.append((x, y))
    if not overlap:
        return np.array([seen[k] for k in order]), order
    out = []
    for x, y in order:
        neigh = [
            seen[k]
            for k in [(x - ps, y - ps), (x, y - ps), (x - ps, y), (x, y)]
            if k in seen
        ]
        out.append(np.mean(neigh, axis=0))
    return np.array(out), order


def test_grid_roundtrip(rng):
    coords, feats = make_slide(rng)
    grid = CoordGrid.from_coords(coords, 256)
    vals = rng.standard_normal((len(coords), 3), dtype=np.float32)
    g, occ = grid.scatter(vals)
    back = np.asarray(grid.gather(g))
    np.testing.assert_allclose(back, vals[grid.keep], atol=0)
    assert occ.sum() == grid.num_patches


def test_refine_matches_oracle(rng):
    ps = 224
    coords, feats = make_slide(rng, n=300, ps=ps)
    probs = rng.random((len(coords), 4), dtype=np.float32)
    grid = CoordGrid.from_coords(coords, ps)
    g, occ = grid.scatter(probs)
    got = np.asarray(grid.gather(refine_grid(g, occ)))
    ref, order = oracle_refine(probs, [tuple(c) for c in coords], ps, overlap=True)
    kept_coords = [tuple(c) for c in grid.kept_coords(coords)]
    assert kept_coords == order
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_misaligned_coords_rejected():
    with pytest.raises(ValueError, match="uniform patch_size grid"):
        CoordGrid.from_coords(np.array([[0, 0], [100, 0]]), 256)


def test_heatmap_image_paints_blocks():
    from keep_tpu.wsi.grid import heatmap_image

    vals = np.array([[0.5, 1.0], [0.0, 2.0]], np.float32)  # 2 clips to 1
    occ = np.array([[1.0, 1.0], [0.0, 1.0]], np.float32)
    img = heatmap_image(vals, occ, patch_size=256, downsample=16)
    assert img.shape == (32, 32) and img.dtype == np.uint8  # 16px per cell
    assert (img[:16, :16] == 128).all()    # 0.5 -> round(127.5)
    assert (img[:16, 16:] == 255).all()
    assert (img[16:, :16] == 0).all()      # unoccupied cell renders 0
    assert (img[16:, 16:] == 255).all()    # clipped to 1.0


def test_tumor_heatmap_end_to_end(rng):
    from keep_tpu.wsi.pipelines import tumor_heatmap

    ps = 224
    coords, feats = make_slide(rng, n=60, ps=ps)
    cls = rng.standard_normal((feats.shape[1], 2)).astype(np.float32)
    hm = tumor_heatmap(cls, jnp.asarray(feats), coords, patch_size=ps)
    grid = CoordGrid.from_coords(coords, ps)
    cell = ps // 16
    assert hm.shape == (grid.rows * cell, grid.cols * cell)
    assert hm.dtype == np.uint8
    # occupied cells carry the refined prob*255; empty cells are 0
    _, occ = grid.scatter(jnp.zeros((len(coords), 1)))
    empty = np.kron(np.asarray(occ) == 0, np.ones((cell, cell), bool))
    assert (hm[empty] == 0).all()
    probs = np.asarray(refined_tumor_probs(
        cls, jnp.asarray(feats), grid, overlap=True))
    r = (grid.cell_index // grid.cols) * cell
    c = (grid.cell_index % grid.cols) * cell
    np.testing.assert_array_equal(
        hm[r, c], np.round(np.clip(probs, 0, 1) * 255).astype(np.uint8))


def test_subtype_class_map(rng):
    from keep_tpu.wsi.pipelines import subtype_class_map

    ps = 256
    coords, feats = make_slide(rng, n=50, ps=ps)
    cls = rng.standard_normal((feats.shape[1], 4)).astype(np.float32)
    cm = subtype_class_map(cls, jnp.asarray(feats), coords, patch_size=ps)
    grid = CoordGrid.from_coords(coords, ps)
    cell = ps // 16
    assert cm.shape == (grid.rows * cell, grid.cols * cell)
    assert cm.dtype == np.uint8
    # occupied cells carry argmax+1 in 1..4; unscored cells are 0
    vals = np.unique(cm)
    assert vals.min() >= 0 and vals.max() <= 4
    probs = score_tiles(cls, jnp.asarray(feats))
    g, occ = grid.scatter(probs)
    want = (np.asarray(jnp.argmax(refine_grid(g, occ), -1)) + 1) * (
        np.asarray(occ) > 0)
    r = (grid.cell_index // grid.cols) * cell
    c = (grid.cell_index % grid.cols) * cell
    rr, cc = grid.cell_index // grid.cols, grid.cell_index % grid.cols
    np.testing.assert_array_equal(cm[r, c], want[rr, cc].astype(np.uint8))


def test_offset_aligned_coords_ok():
    g = CoordGrid.from_coords(np.array([[13, 13], [269, 13]]), 256)
    assert (g.rows, g.cols) == (1, 2)


def test_score_tiles_softmax_scale(rng):
    feats = rng.standard_normal((50, 16), dtype=np.float32)
    cls = rng.standard_normal((16, 2), dtype=np.float32)
    cls /= np.linalg.norm(cls, axis=0, keepdims=True)
    probs = np.asarray(score_tiles(jnp.asarray(cls), jnp.asarray(feats)))
    f = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    logits = f @ cls * 10
    ref = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    np.testing.assert_allclose(probs, ref, atol=1e-5)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)


def test_detection_matches_oracle(rng):
    ps = 256
    coords, feats = make_slide(rng, n=200, ps=ps)
    cls = rng.standard_normal((32, 2), dtype=np.float32)
    prob = zero_shot_detection(jnp.asarray(cls), jnp.asarray(feats), coords,
                               patch_size=ps, overlap=False)
    probs = np.asarray(score_tiles(jnp.asarray(cls), jnp.asarray(feats)))
    refined, _ = oracle_refine(probs, [tuple(c) for c in coords], ps, overlap=False)
    ref = np.mean(refined[:, 1] > 0.5)
    assert prob == pytest.approx(ref, abs=1e-6)


def test_subtyping_matches_oracle(rng):
    ps = 256
    coords, feats = make_slide(rng, n=250, ps=ps)
    n_classes = 4  # 3 subtypes + appended Normal
    cls = rng.standard_normal((32, n_classes), dtype=np.float32)
    label, fractions = zero_shot_subtyping(
        jnp.asarray(cls), jnp.asarray(feats), coords, patch_size=ps
    )
    probs = np.asarray(score_tiles(jnp.asarray(cls), jnp.asarray(feats)))
    refined, _ = oracle_refine(probs, [tuple(c) for c in coords], ps, overlap=True)
    preds = refined.argmax(1)
    ref_frac = np.array([(preds == i).mean() for i in range(n_classes)])
    np.testing.assert_allclose(fractions, ref_frac, atol=1e-6)
    assert label == int(np.argmax(ref_frac[:-1]))
    assert fractions.sum() == pytest.approx(1.0, abs=1e-6)


def test_patch_labels_from_mask():
    ps = 4
    mask = np.zeros((16, 16), np.uint8)
    mask[0:4, 0:4] = 1          # patch (0,0) fully tumor
    mask[0:4, 4:6] = 1          # patch (4,0) half tumor (8/16 → not > 0.5)
    mask[4:8, 0:3] = 1          # patch (0,4) 12/16 → tumor
    coords = np.array([[0, 0], [4, 0], [0, 4], [8, 8]])
    labels = patch_labels_from_mask(mask, coords, ps)
    np.testing.assert_array_equal(labels, [1, 0, 1, 0])


def test_segmentation_end_to_end(rng):
    """Synthetic slide where class-1 prob correlates with the mask → high AUROC."""
    ps = 224
    side = 10
    coords = np.array(
        [(c * ps, r * ps) for r in range(side) for c in range(side)], np.int64
    )
    tumor = (coords[:, 0] < 5 * ps).astype(np.float32)  # left half tumor
    # features: direction d0 for tumor, -d0 for normal + noise
    d = np.zeros(32, np.float32)
    d[0] = 1.0
    feats = np.outer(2 * tumor - 1, d) + 0.1 * rng.standard_normal((len(coords), 32))
    cls = np.stack([-d, d], axis=1)  # class1 aligned with tumor
    mask = np.zeros((side * ps, side * ps), np.uint8)
    mask[:, : 5 * ps] = 255
    auc, dice = zero_shot_segment(
        jnp.asarray(cls), jnp.asarray(feats.astype(np.float32)), coords,
        mask=mask, patch_size=ps,
    )
    assert auc > 0.99
    # neighbor refine blurs the tumor boundary column → Dice ~0.89 here
    assert dice > 0.85


def test_dice_painting_counts():
    ps, mag = 32, 16
    mask_lowres = np.zeros((8, 8), np.uint8)
    mask_lowres[0:2, 0:2] = 255  # GT covers the (0,0) patch footprint (2x2 lowres)
    coords = np.array([[0, 0], [32, 32]])
    probs = np.array([0.9, 0.1])
    dice = dice_at_lowres(probs, coords, mask_lowres, mag, ps, threshold=0.5)
    assert dice == pytest.approx(1.0)  # only the true patch painted
    probs = np.array([0.9, 0.9])
    dice = dice_at_lowres(probs, coords, mask_lowres, mag, ps, threshold=0.5)
    assert dice == pytest.approx(2 * 4 / (4 + 8))


def test_extract_features_roundtrip(rng, tmp_path):
    """Tile extraction → h5 → detection pipeline end to end on a tiny model."""
    import jax
    from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
    from keep_tpu.io.h5 import read_h5_slide
    from keep_tpu.models import keep
    from keep_tpu.wsi.extract import extract_features, extract_to_h5

    cfg = KEEPConfig(
        vision=ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=2,
                         num_heads=2),
        text=BertConfig(vocab_size=32, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=32),
        projection_dim=32,
    )
    model = keep.KEEPModel(params=keep.init(jax.random.PRNGKey(0), cfg), cfg=cfg)
    tiles = rng.integers(0, 255, (11, 32, 32, 3), dtype=np.uint8)
    feats = extract_features(model, tiles, batch_size=4)
    assert feats.shape == (11, 32)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-4)
    # tail padding must not alter real rows
    feats_b16 = extract_features(model, tiles, batch_size=16)
    np.testing.assert_allclose(feats, feats_b16, atol=1e-5)
    # pipeline depth reorders fetches only, never values (round-5 knob)
    for depth in (1, 3, 7):
        feats_d = extract_features(model, tiles, batch_size=4,
                                   pipeline_depth=depth)
        np.testing.assert_allclose(feats, feats_d, atol=1e-6)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pipeline_depth"):
        extract_features(model, tiles, batch_size=4, pipeline_depth=0)

    coords = np.array([(i * 256, 0) for i in range(11)], np.int64)
    path = str(tmp_path / "slide.h5")
    extract_to_h5(model, tiles, coords, path, batch_size=4)
    f2, c2 = read_h5_slide(path)
    np.testing.assert_allclose(f2, feats, atol=1e-6)
    cls = jnp.asarray(rng.standard_normal((32, 2), dtype=np.float32))
    prob = zero_shot_detection(cls, jnp.asarray(f2), c2, patch_size=256)
    assert 0.0 <= prob <= 1.0


def test_tile_cutting_and_full_loop(rng, tmp_path):
    """Raw synthetic slide → tissue tiles → features → detection: the loop
    the reference delegates to external CLAM tooling."""
    import jax
    from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
    from keep_tpu.io.tiles import cut_tiles, tissue_mask
    from keep_tpu.models import keep
    from keep_tpu.wsi.extract import extract_features

    # synthetic H&E-like slide: white background, one pink tissue region
    ps = 32
    slide = np.full((8 * ps, 8 * ps, 3), 250, np.uint8)
    slide[ps : 5 * ps, 2 * ps : 7 * ps] = [200, 120, 160]  # saturated tissue
    mask = tissue_mask(slide)
    assert mask[3 * ps, 4 * ps] and not mask[0, 0]

    tiles, coords = cut_tiles(slide, patch_size=ps, tissue_fraction=0.5)
    assert len(tiles) == 4 * 5  # the tissue rectangle in tile units
    assert tiles.shape[1:] == (ps, ps, 3)
    assert (coords % ps == 0).all()

    cfg = KEEPConfig(
        vision=ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                         num_heads=2),
        text=BertConfig(vocab_size=16, hidden_size=16, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=32,
                        max_position_embeddings=16),
        projection_dim=32,
    )
    model = keep.KEEPModel(params=keep.init(jax.random.PRNGKey(0), cfg), cfg=cfg)
    feats = extract_features(model, tiles, batch_size=8)
    cls = jnp.asarray(rng.standard_normal((32, 2), dtype=np.float32))
    prob = zero_shot_detection(cls, jnp.asarray(feats), coords, patch_size=ps)
    assert 0.0 <= prob <= 1.0


def test_cut_tiles_empty_slide():
    from keep_tpu.io.tiles import cut_tiles

    blank = np.full((256, 256, 3), 255, np.uint8)
    tiles, coords = cut_tiles(blank, patch_size=64)
    assert tiles.shape == (0, 64, 64, 3) and coords.shape == (0, 2)


def test_probability_heatmap(rng):
    from keep_tpu.wsi.pipelines import probability_heatmap

    ps = 224
    coords, feats = make_slide(rng, n=120, ps=ps, dup=0)
    cls = rng.standard_normal((32, 2), dtype=np.float32)
    heat, occ = probability_heatmap(jnp.asarray(cls), jnp.asarray(feats),
                                    coords, patch_size=ps)
    assert heat.shape == occ.shape
    assert occ.sum() == 120
    assert (heat[occ == 0] == 0).all()
    assert (heat[occ == 1] >= 0).all() and (heat[occ == 1] <= 1).all()


def test_extract_features_rechunks_oversize_iterable(rng):
    """User-supplied iterables with chunks larger than batch_size must be
    re-chunked to the compiled shape (not dispatched raw — fresh compile
    per odd shape, or a crash under mesh sharding)."""
    import jax
    from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig
    from keep_tpu.models import keep
    from keep_tpu.wsi.extract import extract_features

    cfg = KEEPConfig(
        vision=ViTConfig(img_size=32, patch_size=16, embed_dim=32, depth=1,
                         num_heads=2),
        text=BertConfig(vocab_size=32, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=32),
        projection_dim=32,
    )
    model = keep.KEEPModel(params=keep.init(jax.random.PRNGKey(1), cfg),
                           cfg=cfg)
    tiles = rng.integers(0, 255, (13, 32, 32, 3), dtype=np.uint8)
    ref = extract_features(model, tiles, batch_size=4)
    # one oversize chunk + one small chunk through the iterable path
    got = extract_features(model, iter([tiles[:9], tiles[9:]]), batch_size=4)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_empty_coords_clear_error():
    from keep_tpu.wsi.grid import CoordGrid

    with pytest.raises(ValueError, match="empty coords"):
        CoordGrid.from_coords(np.zeros((0, 2), np.int64), 256)


def test_wsidataset_respects_dataframe_order(tmp_path, rng):
    """Filtered/shuffled cohort dataframes must iterate POSITIONALLY
    (regression: .loc indexing crashed on filtered frames and silently
    used CSV order on shuffled ones)."""
    import h5py
    import pandas as pd

    from keep_tpu.io.h5 import WSIDataset

    d = tmp_path / "src"
    (d / "h5_files").mkdir(parents=True)  # CLAM layout
    for sid in ("s0", "s1", "s2"):
        with h5py.File(str(d / "h5_files" / f"{sid}.h5"), "w") as f:
            f.create_dataset(
                "features", data=rng.standard_normal((4, 8)).astype(np.float32))
            f.create_dataset("coords", data=np.zeros((4, 2), np.int64))
    df = pd.DataFrame({"slide_id": ["s0", "s1", "s2"],
                       "Diagnosis": ["Normal", "Tumor", "Tumor"]})
    filtered = df[df.Diagnosis == "Tumor"]  # index [1, 2]
    ds = WSIDataset(filtered, str(d), label_map={"Normal": 0, "Tumor": 1})
    assert len(ds) == 2
    assert ds[0]["slide_id"] == "s1"  # positional, not label-based
    assert ds[1]["slide_id"] == "s2"


def test_kidrare_typod_tumor_name_raises(tmp_path):
    import json as _json

    from keep_tpu.wsi.cohort import load_kidrare_labels

    p = tmp_path / "labels.json"
    p.write_text(_json.dumps({"a": "Normal", "b": "Hepatoblastoma",
                              "c": "Nephroblastoma"}))
    with pytest.raises(ValueError, match="not among"):
        load_kidrare_labels(str(p), "Nephroblastma")  # typo
    slides, lm = load_kidrare_labels(str(p), "Nephroblastoma")
    assert lm == {"Normal": 0, "Nephroblastoma": 1}
