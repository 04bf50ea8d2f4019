# Top-level entry points.
#
#   make test        - full pytest suite (CPU f64, virtual 8-device mesh)
#   make test-fast   - non-slow suite, 2 pytest-xdist workers + warm
#                      persistent compile cache (the CI loop; <10 min)
#   make runtime     - build the native C++ runtime library
#   make bench       - TPU benchmark (one JSON line on stdout)

.PHONY: test test-fast runtime bench

test: runtime
	python -m pytest tests/ -q

test-fast: runtime
	python -m pytest tests/ -q -m "not slow" -n 2 --dist loadfile

runtime:
	$(MAKE) -C runtime

bench:
	python bench.py
