# Convenience targets. The native lib builds automatically on first use;
# `make native` forces it.

.PHONY: test test-fast bench baseline native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

baseline:
	python bench.py --baseline

native:
	$(MAKE) -C uasr/native

clean:
	$(MAKE) -C uasr/native clean
	rm -rf .jax_cache exp
