# Build/test entry points (the reference's Makefile builds bin/smith_waterman
# and libalign.a; here the native piece is the C++ fast-IO layer and the
# "binary" is the Python CLI).

all: native

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

# per-commit tier (<60 s); `make test` runs the full differential matrix
test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

# Tiny-shape hardware rehearsal of the FULL two-program bench path (<60 s
# warm). Run before every round's official capture so the official run is
# never the first hardware execution of a changed bench (round-2 lesson).
bench-rehearse:
	python bench.py --rehearse

clean:
	$(MAKE) -C native clean

.PHONY: all native test test-fast bench bench-rehearse clean
