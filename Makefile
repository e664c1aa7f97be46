# Dev workflow (the reference's justfile equivalent).

.PHONY: test test-fast bench native clean verify dryrun

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

native:
	$(MAKE) -C go_pocket_tts_tpu/native

bench:
	python bench.py

dryrun:
	XLA_FLAGS="--xla_force_host_platform_device_count=8" python -c \
	  "import jax; jax.config.update('jax_platforms','cpu'); \
	   import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

verify:
	python -m go_pocket_tts_tpu model verify

clean:
	$(MAKE) -C go_pocket_tts_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
