# Top-level entry points.
#
#   make test        - full pytest suite (CPU f64, virtual 8-device mesh)
#   make test-fast   - suite minus the slow whole-body DDP tests
#   make runtime     - build the native C++ runtime library
#   make bench       - TPU benchmark (one JSON line on stdout)

.PHONY: test test-fast runtime bench

test: runtime
	python -m pytest tests/ -q

test-fast: runtime
	python -m pytest tests/ -q --ignore=tests/test_whole_body_ddp.py

runtime:
	$(MAKE) -C runtime

bench:
	python bench.py
