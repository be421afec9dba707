"""Data pipeline tests with a synthetic directory-per-class dataset."""

import numpy as np
import pytest
from PIL import Image

from psd_tpu.data import AugmentConfig, DataLoader, LIMUCDataset


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("limuc") / "train"
    rng = np.random.default_rng(0)
    counts = {"Mayo_0": 8, "Mayo_1": 4, "Mayo_2": 2, "Mayo_3": 2}
    for cls, n in counts.items():
        d = root / cls
        d.mkdir(parents=True)
        for i in range(n):
            arr = rng.integers(0, 255, (300, 300, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.png")
    return root


def test_scan_and_class_mapping(dataset_dir):
    ds = LIMUCDataset(dataset_dir, image_size=64, return_clip=False)
    assert len(ds) == 16
    assert ds.class_to_idx == {"Mayo_0": 0, "Mayo_1": 1, "Mayo_2": 2, "Mayo_3": 3}
    np.testing.assert_array_equal(ds.class_counts, [8, 4, 2, 2])


def test_item_ranges_and_shapes(dataset_dir):
    ds = LIMUCDataset(dataset_dir, image_size=64, return_clip=True,
                      augment=AugmentConfig(center_crop=224))
    item = ds.load(0)
    assert item["image"].shape == (64, 64, 3)
    assert -1.0 <= item["image"].min() and item["image"].max() <= 1.0
    assert item["clip_image"].shape == (224, 224, 3)
    # CLIP normalization: values well outside [0,1]
    assert item["clip_image"].min() < -0.5


def test_clip_preprocess_matches_transformers(dataset_dir):
    """Byte parity with CLIPImageProcessor on the same [0,1] array."""
    from transformers import CLIPImageProcessor

    from PIL import Image as PILImage

    ds = LIMUCDataset(dataset_dir, image_size=224, return_clip=True)
    item = ds.load(3)
    # reproduce the loader's pre-CLIP array bit-exactly (the HF processor
    # quantizes float inputs to uint8 internally, so a 1-ulp difference in
    # the input flips rounding for some pixels)
    path, _ = ds.samples[3]
    img = PILImage.open(path).convert("RGB").resize((224, 224), PILImage.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    proc = CLIPImageProcessor(
        do_resize=True, size={"shortest_edge": 224}, do_center_crop=True,
        crop_size={"height": 224, "width": 224}, do_rescale=True,
        do_normalize=True,
        image_mean=[0.48145466, 0.4578275, 0.40821073],
        image_std=[0.26862954, 0.26130258, 0.27577711],
    )
    ref = proc(images=arr, return_tensors="np", do_rescale=False).pixel_values[0]
    np.testing.assert_allclose(
        item["clip_image"], np.transpose(ref, (1, 2, 0)), atol=1e-6
    )


def test_balanced_sampling_equalizes_classes(dataset_dir):
    ds = LIMUCDataset(dataset_dir, image_size=32, return_clip=False)
    dl = DataLoader(ds, batch_size=8, class_balanced=True, num_threads=2, seed=0)
    labels = []
    for _ in range(50):
        for batch in dl:
            labels.extend(batch["label"].tolist())
    counts = np.bincount(np.asarray(labels, int), minlength=4)
    frac = counts / counts.sum()
    # inverse-frequency sampling: each class ~25% despite 8/4/2/2 raw counts
    assert (np.abs(frac - 0.25) < 0.08).all(), frac


def test_loader_batches(dataset_dir):
    ds = LIMUCDataset(dataset_dir, image_size=32, return_clip=True)
    dl = DataLoader(ds, batch_size=4, num_threads=2)
    batches = list(dl)
    assert len(batches) == 4
    b = batches[0]
    assert b["image"].shape == (4, 32, 32, 3)
    assert b["clip_image"].shape == (4, 224, 224, 3)
    assert b["label"].shape == (4,)
