# Convenience targets (reference makefile:1-24 analog)
.PHONY: test test-tpu bench data native clean

test:
	python -m pytest tests/ -x -q

test-tpu:
	BMT_TEST_TPU=1 python -m pytest tests/ -x -q

bench:
	python bench.py

data:
	bash data/fetch_mnist.sh
	bash data/fetch_cifar10.sh

native:
	g++ -O3 -shared -fPIC native/bm_native.cpp -o native/libbm_native.so

clean:
	rm -rf native/libbm_native.so **/__pycache__ .pytest_cache
