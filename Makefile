# Developer entry points.

.PHONY: test bench parity native train-artifact demo multichip clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

parity:
	python tools/parity_report.py

native:
	$(MAKE) -C native

train-artifact:
	python tools/train_reference_model.py

demo:
	python examples/run_pipeline_demo.py

multichip:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		python __graft_entry__.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
