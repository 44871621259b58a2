# comd-tpu build/test harness
.PHONY: test test-fast native bench clean

test:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q

test-fast:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q -x \
	  -k "not multidevice and not conservation"

native: comd_tpu/utils/_comd_native.so

comd_tpu/utils/_comd_native.so: native/comd_init.cpp
	g++ -O3 -march=native -ffp-contract=off -fPIC -shared -fopenmp $< -o $@

bench:
	python bench.py

clean:
	rm -f comd_tpu/utils/_comd_native.so
