# Common workflows. Tests run on a virtual 8-device CPU mesh.

.PHONY: test test-fast bench native preprocess dryrun lint

test:
	python -m pytest tests/ -q

test-fast:  # skip the slow full-model/trainer integration tests
	python -m pytest tests/ -q \
	  --ignore=tests/test_trainer.py \
	  --ignore=tests/test_diffusion_model.py \
	  --ignore=tests/test_infer.py \
	  --ignore=tests/test_unet.py

bench:
	python bench.py

native:
	python -c "from ns2vc_tpu import native; print(native.build(force=True))"

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

preprocess:
	python preprocess.py --in_dir dataset
