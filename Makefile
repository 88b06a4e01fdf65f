.PHONY: install test bench bench-serving serve native clean

install:
	pip install -e . --no-deps --no-build-isolation

test:
	python -m pytest tests/ -q

# contract-core tier for the inner loop (~40 s): wire format, graph IR,
# node contracts, codec, executor. Full `make test` before round close.
test-fast:
	python -m pytest tests/ -m fast -q

bench:
	python bench.py

# round-close artifact: every BASELINE compute config (vit_t16 latency,
# vit_b16 headline, vit_l16@384 maps-on/off, clip_b32 embedding) ->
# BENCH_MATRIX_r{N}.json (VERDICT r4 weak #5)
bench-matrix:
	python tools/bench_matrix.py

bench-serving:
	python bench_serving.py

# round-close artifact: production-config serving run -> SERVING_r{N}.json
# (recycling + speculation on, 3 families, 8 clients; VERDICT r3 #1a)
serving-bench:
	python tools/serving_bench_round.py

# round-close artifact: every Pallas kernel + grad twin vs its jnp
# reference ON CHIP -> KERNELS_r{N}.json (VERDICT r3 #1b)
kernel-gate:
	python tools/experiments/kernel_gate.py

# the whole round-close checklist, in dependency-safe order:
# full CPU suite -> multichip dryrun -> on-chip gates -> headline bench.
# Each on-chip step owns the TPU exclusively (run nothing else).
round-close:
	python -m pytest tests/ -q
	python __graft_entry__.py
	python tools/experiments/kernel_gate.py
	python tools/serving_bench_round.py
	python tools/bench_matrix.py
	python bench.py

serve:
	python -m interactive_vit_tpu.serving.server --port 8000 \
	    --models vit_t16,vit_b16,clip_b32,vgg16,resnet50,vit_moe_s16 --dtype bfloat16

native:
	python -m interactive_vit_tpu.runtime.build

clean:
	rm -rf build dist *.egg-info interactive_vit_tpu/runtime/_ivt_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
