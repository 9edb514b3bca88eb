.PHONY: test test-fast native bench tpu-checks tpu-e2e baseline clean

test:            ## full suite (CPU, 8 virtual devices; ~20 min on 1 core)
	python -m pytest tests/ -q

test-fast:       ## unit tests only (skips the slow CLI end-to-end runs)
	python -m pytest tests/ -q \
	  --ignore=tests/test_cli_e2e.py \
	  --ignore=tests/test_finetune_e2e.py \
	  --ignore=tests/test_hpo.py \
	  --ignore=tests/test_rgb_mode.py

native:          ## build the C++ runtime pieces (patch sampler, SSIM)
	$(MAKE) -C native

bench:           ## single-chip throughput benchmark (prints one JSON line)
	python bench.py

baseline:        ## (re)measure the PyTorch-CPU reference baseline
	python scripts/measure_torch_baseline.py

tpu-checks:      ## compiled Pallas kernel checks on real TPU hardware
	python tests/tpu/run_tpu_checks.py

tpu-e2e:         ## full train->eval->finetune->memory-eval journey on TPU
	python tests/tpu/run_e2e_tpu.py

clean:
	$(MAKE) -C native clean
	rm -rf .jax_cache
