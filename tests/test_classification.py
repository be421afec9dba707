"""Classification metric battery + classifier pipeline smoke tests."""

from pathlib import Path

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
        "--save-top-k", "1",
        "--output-dir", str(tmp_path / "cls"),
    ])
    assert len(hist) == 2
    assert "qwk" in hist[0] and "auroc" in hist[0]
    assert np.asarray(hist[0]["confusion_matrix"]).shape == (4, 4)
    out = tmp_path / "cls"
    assert (out / "best.npz").exists()
    assert (out / "last.npz").exists()
    assert (out / "best_confusion_matrix.json").exists()
    # save-top-k 1 over 2 epochs: exactly one epochNNN checkpoint kept
    assert len(list(out.glob("epoch*.npz"))) == 1


def test_classifier_grad_accumulation_smoke(cls_dataset, tmp_path):
    """--accumulate-grad-batches runs end-to-end (reference wires it into
    pl.Trainer for the classifier too, classification/train.py:250); the
    MultiSteps-wrapped optimizer must survive jit/donation and still
    produce checkpoints."""
    from psd_tpu.pipelines.classify import main

    hist = main([
        "--data-dir", str(cls_dataset),
        "--backbone", "resnet18",
        "--image-size", "32",
        "--batch-size", "4",
        "--accumulate-grad-batches", "2",
        "--epochs", "1",
        "--max-steps-per-epoch", "4",
        "--save-top-k", "1",
        "--output-dir", str(tmp_path / "cls_accum"),
    ])
    assert len(hist) == 1 and "qwk" in hist[0]
    assert (tmp_path / "cls_accum" / "last.npz").exists()


@pytest.mark.slow
def test_classifier_freeze_backbone_epochs(cls_dataset, tmp_path):
    """--freeze-backbone-epochs N: backbone params bit-identical during the
    freeze window, training after it (classification/model.py:381-393)."""
    import jax
    from psd_tpu.convert.io import load_params_npz
    from psd_tpu.pipelines.classify import main

    def run(epochs, out):
        main([
            "--data-dir", str(cls_dataset),
            "--backbone", "resnet18",
            "--image-size", "32",
            "--batch-size", "8",
            "--epochs", str(epochs),
            "--max-steps-per-epoch", "2",
            "--freeze-backbone-epochs", "1",
            "--save-top-k", "0",
            "--early-stop-patience", "0",
            "--seed", "3",
            "--output-dir", str(out),
        ])
        return load_params_npz(out / "last.npz")

    one = run(1, tmp_path / "e1")   # all of epoch 0 is frozen
    two = run(2, tmp_path / "e2")   # epoch 1 unfreezes

    def flat(tree):
        return {
            "/".join(getattr(k, "key", str(k)) for k in path): np.asarray(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    p1, p2 = flat(one["params"]), flat(two["params"])
    backbone1 = {k: v for k, v in p1.items() if not k.startswith("fc")}
    assert backbone1, "no backbone params found"
    # seeds are deterministic: epoch 0 of both runs is identical, so the
    # 1-epoch run's backbone equals the init (frozen) ...
    from psd_tpu.models.resnet import ResNet, ResNetConfig
    import jax.numpy as jnp

    model = ResNet(ResNetConfig(variant="resnet18", num_classes=4,
                                head="classify", dropout=0.2))
    rng = jax.random.PRNGKey(3)
    init = model.init({"params": rng, "dropout": rng},
                      jnp.zeros((1, 32, 32, 3)), True)
    init_flat = flat(init["params"])
    changed_during_freeze = [
        k for k, v in backbone1.items()
        if not np.array_equal(v, init_flat[k])
    ]
    assert not changed_during_freeze, changed_during_freeze[:5]
    # ... the head DID train during the freeze window ...
    fc1 = {k: v for k, v in p1.items() if k not in backbone1}
    assert any(
        not np.array_equal(v, init_flat[k]) for k, v in fc1.items()
    )
    # ... and after unfreezing, backbone params move
    assert any(
        not np.array_equal(p2[k], v) for k, v in backbone1.items()
    )


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


def test_classifier_yaml_config(cls_dataset, tmp_path):
    """--config YAML (reference schema) fills args; CLI flags override;
    the regression config's val/rmse monitor routes to the regress task
    (src/classification/train.py:100-120, configs/train_classifier*.yaml)."""
    import yaml

    from psd_tpu.pipelines.classify import apply_yaml_config, build_argparser

    cfg_path = tmp_path / "cls.yaml"
    cfg = {
        "model": {"name": "resnet34", "num_classes": 4, "dropout": 0.5,
                  "freeze_backbone_epochs": 2},
        "dataset": {"data_root": str(cls_dataset), "image_size": 48},
        "training": {"batch_size": 16, "max_epochs": 7,
                     "learning_rate": 3e-4, "optimizer": "sgd",
                     "loss_type": "focal", "label_smoothing": 0.1},
        "logging": {"save_top_k": 2, "monitor_metric": "val/qwk"},
        "early_stopping": {"patience": 5},
        "seed": 7,
    }
    cfg_path.write_text(yaml.safe_dump(cfg))

    argv = ["--config", str(cfg_path), "--epochs", "3"]  # CLI overrides yaml
    args = build_argparser().parse_args(argv)
    args = apply_yaml_config(args, argv)
    assert args.backbone == "resnet34"
    assert args.data_dir == str(cls_dataset)
    assert args.image_size == 48
    assert args.batch_size == 16
    assert args.epochs == 3  # explicit CLI flag wins over max_epochs: 7
    assert args.lr == 3e-4
    assert args.optimizer == "sgd"
    assert args.loss == "focal"
    assert args.dropout == 0.5
    assert args.freeze_backbone_epochs == 2
    assert args.save_top_k == 2
    assert args.early_stop_patience == 5
    assert args.seed == 7
    assert args.task == "classify"

    cfg["logging"]["monitor_metric"] = "val/rmse"
    cfg_path.write_text(yaml.safe_dump(cfg))
    argv = ["--config", str(cfg_path)]
    args = apply_yaml_config(build_argparser().parse_args(argv), argv)
    assert args.task == "regress"

    # the committed reference-schema configs parse through the same path
    for name in ("train_classifier.yaml", "train_classifier_regression.yaml"):
        committed = Path(__file__).resolve().parent.parent / "configs" / name
        argv = ["--config", str(committed)]
        args = apply_yaml_config(build_argparser().parse_args(argv), argv)
        assert args.num_classes == 4
        assert args.task == ("regress" if "regression" in name else "classify")


def test_classifier_yaml_config_e2e(cls_dataset, tmp_path):
    """End-to-end: classify.main driven purely by --config (+ tiny
    overrides) runs the smoke dataset."""
    import yaml

    from psd_tpu.pipelines.classify import main

    cfg_path = tmp_path / "cls.yaml"
    cfg_path.write_text(yaml.safe_dump({
        "model": {"name": "resnet18", "num_classes": 4},
        "dataset": {"data_root": str(cls_dataset), "image_size": 32},
        "training": {"batch_size": 8, "max_epochs": 1},
        "logging": {"save_top_k": 1},
        "checkpoint": {"dirpath": str(tmp_path / "out")},
    }))
    hist = main(["--config", str(cfg_path), "--max-steps-per-epoch", "2"])
    assert len(hist) == 1 and "qwk" in hist[0]
    assert (tmp_path / "out" / "best.npz").exists()
