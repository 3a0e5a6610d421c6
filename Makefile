# Developer entry points. The test split is documented in pytest.ini.

.PHONY: test test-all native bench bench-check dryrun accuracy bench-scaling bench-serve

test:        ## fast suite (~10 min on this container's 2 CPUs)
	python -m pytest -m "not slow" -q

test-all:    ## full suite incl. torch-oracle parity + goldens (~40 min)
	python -m pytest tests/ -q

native:      ## build the C++ data runtime
	$(MAKE) -C native

bench:       ## single-chip flagship throughput (driver metric)
	python bench.py

bench-check: ## fail if the flagship drops >5% vs the best in BENCH_HISTORY.jsonl
	python bench.py --check

dryrun:      ## multi-chip sharding compile/exec check on a virtual mesh
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

accuracy:    ## full 10-row accuracy matrix, both frameworks, 5 seeds x 81 epochs.
             ## Default: seeded synthetic data (no raw datasets in container).
             ## With DATA_ROOT=<raw Datasets/ root>: REAL data through the real
             ## offline preprocessors (the asterisk-removal run).
	python bench_accuracy.py $(if $(DATA_ROOT),--data_root $(DATA_ROOT))

bench-scaling: ## DP weak-scaling curve (virtual CPU mesh here; same command on real multi-chip)
	python bench_scaling.py

bench-serve: ## inference/serving throughput (jit steady-state + exported artifact)
	python bench_serve.py
