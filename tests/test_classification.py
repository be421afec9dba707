"""Classification metric battery + classifier pipeline smoke tests."""

import numpy as np
import pytest
from PIL import Image

from psd_tpu.metrics.classification import (
    auroc_ovr,
    classification_report,
    cohen_kappa,
    confusion_matrix,
    expected_calibration_error,
    regression_report,
)


def test_confusion_and_accuracy():
    y_true = [0, 0, 1, 1, 2, 3]
    y_pred = [0, 1, 1, 1, 2, 2]
    cm = confusion_matrix(y_true, y_pred, 4)
    assert cm[0, 0] == 1 and cm[0, 1] == 1 and cm[3, 2] == 1
    rep = classification_report(y_true, y_pred, num_classes=4)
    np.testing.assert_allclose(rep["acc_micro"], 4 / 6)


def test_qwk_perfect_and_worst():
    y = np.array([0, 1, 2, 3] * 10)
    cm = confusion_matrix(y, y, 4)
    assert cohen_kappa(cm, "quadratic") == pytest.approx(1.0)
    # reversed labels → strongly negative QWK
    cm_rev = confusion_matrix(y, 3 - y, 4)
    assert cohen_kappa(cm_rev, "quadratic") < -0.9


def test_qwk_matches_sklearn_formula():
    # hand-checked example vs the standard weighted-kappa formula
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 4, 200)
    noise = rng.integers(-1, 2, 200)
    y_pred = np.clip(y_true + noise, 0, 3)
    cm = confusion_matrix(y_true, y_pred, 4)
    qwk = cohen_kappa(cm, "quadratic")
    # independent computation
    K = 4
    idx = np.arange(K)
    w = (idx[:, None] - idx[None, :]) ** 2 / 9.0
    n = len(y_true)
    O = cm / n
    E = np.outer(cm.sum(1), cm.sum(0)) / n**2
    expected = 1 - (w * O).sum() / (w * E).sum()
    np.testing.assert_allclose(qwk, expected, rtol=1e-10)


def test_auroc_separable_and_random():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 3, 300)
    perfect = np.eye(3)[y] * 0.9 + 0.05
    assert auroc_ovr(y, perfect) == pytest.approx(1.0)
    random_probs = rng.dirichlet(np.ones(3), 300)
    assert abs(auroc_ovr(y, random_probs) - 0.5) < 0.08


def test_ece_perfectly_calibrated_zero():
    # confident & correct → low ECE
    y = np.array([0, 1] * 50)
    probs = np.eye(2)[y] * 0.999 + 0.0005
    assert expected_calibration_error(y, probs) < 0.01


def test_regression_report():
    y = np.array([0.0, 1.0, 2.0, 3.0])
    pred = np.array([0.1, 1.2, 1.8, 2.9])
    rep = regression_report(y, pred)
    assert rep["rounded_acc"] == 1.0
    assert rep["qwk"] == pytest.approx(1.0)
    assert rep["rmse"] < 0.2


@pytest.fixture(scope="module")
def cls_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("clsdata")
    rng = np.random.default_rng(0)
    for split, n, synth in [("train", 6, True), ("val", 3, False)]:
        for c in range(4):
            d = root / split / f"Mayo_{c}"
            d.mkdir(parents=True)
            for i in range(n):
                name = f"generated_im{i}.png" if synth else f"real_im{i}.png"
                Image.fromarray(
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                ).save(d / name)
                if synth:  # also drop a real file that must be filtered out
                    Image.fromarray(
                        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                    ).save(d / f"real_im{i}.png")
    return root


def test_synthetic_only_filter_and_balance(cls_dataset):
    from psd_tpu.data.classification import MESClassificationDataset

    ds = MESClassificationDataset(cls_dataset, "train", 32)
    # only generated_ files kept
    assert all("generated" in p.name for p, _ in ds.samples)
    assert (ds.class_counts == ds.class_counts[0]).all()  # balanced
    val = MESClassificationDataset(cls_dataset, "val", 32)
    assert all("real" in p.name for p, _ in val.samples)
    item = ds.load(0)
    assert item["image"].shape == (32, 32, 3)
    # ImageNet-normalized: not in [0,1]
    assert item["image"].min() < -0.5


def test_classifier_smoke_train(cls_dataset, tmp_path):
    from psd_tpu.pipelines.classify import main

    hist = main([
        "--data-dir", str(cls_dataset),
        "--backbone", "resnet18",
        "--image-size", "32",
        "--batch-size", "8",
        "--epochs", "2",
        "--max-steps-per-epoch", "2",
        "--output-dir", str(tmp_path / "cls"),
    ])
    assert len(hist) == 2
    assert "qwk" in hist[0] and "auroc" in hist[0]
    assert (tmp_path / "cls" / "best.npz").exists()


def test_regressor_smoke_train(cls_dataset, tmp_path):
    from psd_tpu.pipelines.classify import main

    hist = main([
        "--data-dir", str(cls_dataset),
        "--task", "regress",
        "--backbone", "resnet18",
        "--image-size", "32",
        "--batch-size", "8",
        "--epochs", "1",
        "--max-steps-per-epoch", "2",
        "--output-dir", str(tmp_path / "reg"),
    ])
    assert "rmse" in hist[0] and "qwk" in hist[0]
