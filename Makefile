# Build/test entry points (the reference's Makefile builds bin/smith_waterman
# and libalign.a; here the native piece is the C++ fast-IO layer and the
# "binary" is the Python CLI).

all: native

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	$(MAKE) -C native clean

.PHONY: all native test bench clean
