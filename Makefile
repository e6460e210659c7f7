# chalkydri-tpu top-level build/test/bench entry points
# (parity: /root/reference/Makefile + build.sh, SURVEY.md section 2.1 L9).

.PHONY: all native test bench container clean

all: native

native:
	$(MAKE) -C chalkydri_tpu/native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

container:
	podman build -f build/Containerfile -t chalkydri-tpu .

clean:
	$(MAKE) -C chalkydri_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
