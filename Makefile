# Build/test entry points (reference equivalent: its Makefile selects one of
# three C++ source trees; here there is one Python/JAX implementation plus a
# small native host library).

PY ?= python

.PHONY: hostlib capi test test-fast bench clean

hostlib:
	g++ -O3 -march=native -shared -fPIC -std=c++17 \
	  stereovision_tpu/csrc/svtpu_host.cpp \
	  -o stereovision_tpu/hostlib/_svtpu_host.so

# Embeddable C ABI: the reference's extern "C" generatePointCloud/clean
# surface (stereo_vision.cpp:565-623) as a CPython-embedding shared
# library (csrc/svtpu_capi.cpp).
capi:
	g++ -O3 -shared -fPIC -std=c++17 \
	  stereovision_tpu/csrc/svtpu_capi.cpp \
	  $$(python3-config --includes) \
	  -o stereovision_tpu/hostlib/libsvtpu_capi.so \
	  $$(python3-config --ldflags --embed) \
	  -Wl,-rpath,$$(python3-config --prefix)/lib

test:
	$(PY) -m pytest tests/ -x -q

test-fast:
	$(PY) -m pytest tests/ -x -q -m "not slow"

bench:
	$(PY) bench.py

clean:
	rm -f stereovision_tpu/hostlib/_svtpu_host.so \
	  stereovision_tpu/hostlib/libsvtpu_capi.so
	find . -name __pycache__ -type d -exec rm -rf {} +
