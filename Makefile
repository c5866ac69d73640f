# Deployment + verification targets (≙ /root/reference/Makefile recipe style).

.PHONY: zip test bench smoke clean

zip:
	python build_pyfiles.py dist

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

smoke: zip
	spark-submit --master 'local[2]' --py-files dist/idr.zip dist/idr_main.py --help

clean:
	rm -rf dist
