# winograd_tpu — top-level developer targets
# (the reference's Makefile drives nvcc for 6 CUDA kernels; here the device
# code compiles through Pallas/Mosaic at JIT time and the only native build
# is the C++ host-runtime library).

.PHONY: all native test bench datagen clean

all: native

native:
	$(MAKE) -C winograd_tpu/native

test:
	python -m pytest tests/ -x -q

bench:
	python -m winograd_tpu.bench all

datagen:
	python -m winograd_tpu.datagen --outdir data

clean:
	$(MAKE) -C winograd_tpu/native clean
	rm -rf data __pycache__ */__pycache__
