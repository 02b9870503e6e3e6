# Developer entry points.

.PHONY: test test-tpu bench health native examples clean

test:
	python -m pytest tests/ -q

# run the compute-heavy test files against real TPU hardware
test-tpu:
	DEEPSENSORNZ_TEST_BACKEND=tpu python -m pytest \
		tests/test_convnp.py tests/test_likelihoods.py tests/test_setconv.py \
		tests/test_predict.py tests/test_train.py tests/test_pipeline.py -q

bench:
	python bench.py

# one-JSON-line device/relay check (dispatch / compile / transfer legs)
health:
	python -m deepsensornz_tpu.cli.health

native:
	$(MAKE) -C native

examples:
	PYTHONPATH=. python examples/quickstart.py
	PYTHONPATH=. python examples/data_explore.py
	PYTHONPATH=. python examples/all_variables.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
