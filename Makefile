.PHONY: test native bench scaling dryrun entry clean

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C csrc

bench:
	python bench.py

scaling:
	python bench_scaling.py

entry:
	python __graft_entry__.py

dryrun:
	python -c "import __graft_entry__ as e; e.dryrun_multichip(8)"

clean:
	rm -rf exps csrc/libgraph_batcher.so
	find . -name __pycache__ -type d -prune -exec rm -rf {} +
