# Developer entry points (reference analog: common:Makefile).
PYTHON ?= python

.PHONY: test test-fast bench bench-smoke native entry lint clean

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -m "not slow"

bench:
	$(PYTHON) bench.py

bench-smoke:
	$(PYTHON) bench.py --smoke

native:
	$(PYTHON) setup.py build_native

entry:
	$(PYTHON) __graft_entry__.py

clean:
	rm -rf build dist *.egg-info common_tpu/native/partition_prebuilt.so
	find . -name __pycache__ -type d -exec rm -rf {} +
