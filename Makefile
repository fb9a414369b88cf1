# lavender-tpu build/test shortcuts
.PHONY: native test test-fast bench dryrun

native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 native/loader.cpp \
	  -o native/liblvt.so -ljpeg -lpthread

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_cli.py \
	  --ignore=tests/test_swin3d_golden.py

bench:
	python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python __graft_entry__.py dryrun 8
