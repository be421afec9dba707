"""Config system loads the reference YAML schema unchanged."""

import textwrap

from psd_tpu.core.config import Config, load_config


def test_defaults_match_reference_train_ip():
    cfg = Config()
    assert cfg.model.conditioning_dim == 768
    assert cfg.diffusion.beta_start == 0.00085
    assert cfg.diffusion.num_train_timesteps == 1000
    assert cfg.model.num_aoe_tokens == 16


def test_load_reference_style_yaml(tmp_path):
    y = textwrap.dedent(
        """
        defaults: [_self_]
        hydra: {output_subdir: null}
        model:
          embedding_dim: 768
          gate_init_anatomy: [0.1, 0.9]
          gate_init_disease: [0.9, 0.1]
          use_routing_gates: true
          some_future_key: 7
          ordinal_embedder:
            type: aoe
            num_classes: 4
            aoe: {delta_scale: 0.05}
        optimizer: {lr: 1e-4, betas: [0.9, 0.999]}
        training: {max_epochs: 150, precision: "16-mixed"}
        diffusion: {beta_start: 0.00085, beta_end: 0.012, num_train_timesteps: 1000}
        """
    )
    p = tmp_path / "cfg.yaml"
    p.write_text(y)
    cfg = load_config(p)
    assert cfg.model.gate_init_anatomy == (0.1, 0.9)
    assert cfg.model.gate_init_disease == (0.9, 0.1)
    assert cfg.model.ordinal_embedder.delta_scale == 0.05
    assert cfg.model.extras["some_future_key"] == 7
    assert cfg.optimizer.lr == 1e-4
    assert cfg.training.precision == "16-mixed"


def test_cli_overrides(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("optimizer: {lr: 1e-4}\n")
    cfg = load_config(p, overrides=["optimizer.lr=5e-5", "model.num_aoe_tokens=8"])
    assert cfg.optimizer.lr == 5e-5
    assert cfg.model.num_aoe_tokens == 8
