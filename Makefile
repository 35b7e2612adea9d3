# floxer-tpu build/check targets (parity with the reference's `make check`)

NATIVE_DIR := floxer_tpu/native
NATIVE_LIB := $(NATIVE_DIR)/libfloxer_native.so
NATIVE_SRCS := $(NATIVE_DIR)/sais.cpp $(NATIVE_DIR)/search.cpp $(NATIVE_DIR)/traceback.cpp $(NATIVE_DIR)/cachescan.cpp $(NATIVE_DIR)/myers_host.cpp $(NATIVE_DIR)/pextree.cpp

.PHONY: all native check bench clean

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_SRCS)
	g++ -O3 -march=native -std=c++17 -shared -fPIC $(NATIVE_SRCS) -o $@

check: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	rm -f $(NATIVE_LIB)
	find . -name __pycache__ -type d -exec rm -rf {} +
