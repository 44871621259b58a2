# comd-tpu build/test harness
.PHONY: test test-fast test-full native bench clean

# default tier: everything except the auto-marked `slow` modules
# (trajectory comparisons, multihost clusters, conservation runs) --
# the pre-commit-sized run.  `test-full` is the round-boundary tier.
test:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q \
	  -m "not slow"

test-fast:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q -x \
	  -k "not multidevice and not conservation"

test-full:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q

native: comd_tpu/utils/_comd_native.so

comd_tpu/utils/_comd_native.so: native/comd_init.cpp
	g++ -O3 -march=native -ffp-contract=off -fPIC -shared -fopenmp $< -o $@

bench:
	python bench.py

clean:
	rm -f comd_tpu/utils/_comd_native.so
