"""Smoke tests for the augment factory and evaluation sweep on tiny configs."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def limuc_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("limuc_eval")
    rng = np.random.default_rng(0)
    for split, n in [("train", 2), ("val", 2), ("test", 2)]:
        for c in range(4):
            d = root / split / f"Mayo_{c}"
            d.mkdir(parents=True)
            for i in range(n):
                Image.fromarray(
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                ).save(d / f"im{i}.png")
    return root


@pytest.mark.slow
def test_augment_factory_smoke(limuc_dir, tmp_path):
    from psd_tpu.pipelines.augment import main

    out_dir = tmp_path / "aug"
    result = main([
        "--config", "configs/tiny_smoke.yaml",
        "--data-dir", str(limuc_dir),
        "--output-dir", str(out_dir),
        "--batch-images", "2",
        "--sampling-steps", "2",
        "--image-size", "32",
        "--max-images", "2",
        "--copy-splits",
        "--dtype", "fp32",
    ])
    assert result["generated"] == 6  # 2 sources × 3 other classes
    gen = list(out_dir.glob("train/*/generated_*.bmp"))
    assert len(gen) == 6
    # native BMP writer output must round-trip through PIL
    arr = np.asarray(Image.open(gen[0]))
    assert arr.shape == (32, 32, 3) and arr.dtype == np.uint8
    # copied originals present
    assert (out_dir / "val" / "Mayo_0").exists()

    # resumability: second run finds nothing pending
    result2 = main([
        "--config", "configs/tiny_smoke.yaml",
        "--data-dir", str(limuc_dir),
        "--output-dir", str(out_dir),
        "--max-images", "2",
        "--image-size", "32",
        "--dtype", "fp32",
    ])
    assert result2["generated"] == 0


@pytest.mark.slow
def test_evaluate_sweep_smoke(limuc_dir, tmp_path):
    from psd_tpu.pipelines.evaluate import main

    out_dir = tmp_path / "eval"
    results = main([
        "--config", "configs/tiny_smoke.yaml",
        "--data-dir", str(limuc_dir),
        "--split", "test",
        "--scales", "1.0",
        "--batch-images", "2",
        "--sampling-steps", "2",
        "--image-size", "32",
        "--max-per-class", "2",
        "--num-eval-seeds", "2",
        "--output-dir", str(out_dir),
        "--dtype", "fp32",
        "--allow-random-backbones",
    ])
    assert len(results) == 1
    res = results[0]
    assert res.num_generated == 24  # 8 sources × 3 targets
    assert res.throughput_img_s > 0
    # all four classes scored with the full metric set
    for cls in ("0", "1", "2", "3"):
        m = res.per_class[cls]
        assert {"fid", "cmmd", "precision", "recall"} <= set(m)
    assert "fid" in res.overall and "fid_std" in res.overall
    assert (out_dir / "comparison.json").exists()
    with open(next(out_dir.glob("*/metrics.json"))) as f:
        saved = json.load(f)
    assert saved["scale"] == 1.0


def test_random_backbones_hard_fail():
    """Real eval runs must not silently ship random-backbone FID/IPR."""
    import jax.numpy as jnp

    from psd_tpu.core.config import load_config
    from psd_tpu.pipelines.common import build_model
    from psd_tpu.pipelines.evaluate import FeatureBank

    cfg = load_config("configs/tiny_smoke.yaml")
    model = build_model(cfg, "fp32")
    bank = FeatureBank(model, clip_params=None)
    with pytest.raises(RuntimeError, match="random"):
        bank.inception(np.zeros((2, 32, 32, 3), np.float32))


def test_pad_batch_static_shapes():
    from psd_tpu.pipelines.common import pad_batch

    a = np.arange(10, dtype=np.float32).reshape(5, 2)
    b = np.arange(5, dtype=np.float32)
    (pa, pb), n = pad_batch([a, b], 8)
    assert n == 5 and pa.shape == (8, 2) and pb.shape == (8,)
    np.testing.assert_array_equal(pa[:5], a)
    np.testing.assert_array_equal(pa[5:], np.tile(a[-1:], (3, 1)))
    # already-full chunk: untouched
    (qa,), n2 = pad_batch([a], 5)
    assert n2 == 5 and qa is a
