# Build/test entry points (reference equivalent: its Makefile selects one of
# three C++ source trees; here there is one Python/JAX implementation plus a
# small native host library).

PY ?= python

.PHONY: hostlib test test-fast bench clean

hostlib:
	g++ -O3 -march=native -shared -fPIC -std=c++17 \
	  stereovision_tpu/csrc/svtpu_host.cpp \
	  -o stereovision_tpu/hostlib/_svtpu_host.so

test:
	$(PY) -m pytest tests/ -x -q

test-fast:
	$(PY) -m pytest tests/ -x -q -m "not slow"

bench:
	$(PY) bench.py

clean:
	rm -f stereovision_tpu/hostlib/_svtpu_host.so
	find . -name __pycache__ -type d -exec rm -rf {} +
