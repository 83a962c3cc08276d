# Convenience targets (tests force the CPU platform themselves)
.PHONY: test bench dryrun native artifacts-check prewarm
test:
	python -m pytest tests/ -q

artifacts-check:
	python tools/artifacts_check.py

bench:
	python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "import jax; jax.config.update('jax_platforms','cpu'); import __graft_entry__ as g; g.dryrun_multichip(8)"

native:
	g++ -O3 -shared -fPIC -std=c++17 -o native/libesucd.so native/esucd_native.cc -lz

prewarm:
	python tools/prewarm.py
