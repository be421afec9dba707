# Convenience targets (counterpart of the reference Makefile)
.PHONY: test test-all lint format train train-ip inference evaluate compare-ip bench bench-suite quality-gate

# fast tier (~8 min on 1 CPU): unit + light integration + tiny goldens;
# full coverage incl. SD-scale goldens / e2e pipelines: test-all (~36 min)
test:
	python -m pytest tests/ -x -q -m "not slow"

test-all:
	python -m pytest tests/ -x -q

train:
	python -m psd_tpu.pipelines.train --config configs/train.yaml

train-ip:
	bash scripts/run_train_ip.sh

inference:
	bash scripts/run_inference.sh

evaluate:
	bash scripts/run_evaluation.sh

compare-ip:
	bash scripts/compare_ip_checkpoints.sh

bench:
	python bench.py

# every tracked metric as a JSON artifact (headline, turbo quality table,
# progression p50, train throughput, batch sweep, VAE decode, serving
# e2e) — TPU only
bench-suite:
	bash scripts/run_bench_suite.sh

# re-gate the turbo serving points on the CURRENT weights before enabling
# them in production (docs/serving.md): per-trajectory table + the
# distribution-level FID/CMMD gate (exact vs each serving point,
# mean±std over matched repeats)
quality-gate:
	python scripts/check_stride_quality.py --train-steps 500 \
	  --out bench_out/bench_turbo_quality.json
	python scripts/check_turbo_distribution.py --train-steps 500 \
	  --out bench_out/bench_turbo_distribution.json

# is the variant ranking stable vs training length? (VERDICT r4 #4)
gate-stability:
	python scripts/check_gate_stability.py \
	  --quality bench_out/bench_turbo_quality.json \
	            bench_out/bench_turbo_quality_1500.json \
	  --distribution bench_out/bench_turbo_distribution.json \
	                 bench_out/bench_turbo_distribution_1500.json \
	  --out bench_out/gate_stability.json

lint:
	python -m ruff check psd_tpu tests || true

format:
	python -m ruff format psd_tpu tests || true
