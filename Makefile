# Common workflows. Tests run on a virtual 8-device CPU mesh.

.PHONY: test test-fast bench native preprocess dryrun lint

test:
	python -m pytest tests/ -q

test-fast:  # fast tier (~6 min on 1 core; see tests/README.md)
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

native:
	python -c "from ns2vc_tpu import native; print(native.build(force=True))"

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

preprocess:
	python preprocess.py --in_dir dataset
