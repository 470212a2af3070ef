# Build/test/bench entry points.  The engine ships as a --py-files zip:
#   spark-submit --master <cluster> --py-files dist/projcl_spark.zip your_job.py

.PHONY: package test parity bench scaling

package:
	mkdir -p dist && rm -f dist/projcl_spark.zip && zip -rq dist/projcl_spark.zip projcl_spark

test:
	python -m pytest tests/ -x -q --ignore=tests/test_oracle_parity.py

parity:
	python tests/test_oracle_parity.py /root/testdata/sf0.01

bench:
	python bench.py

scaling:
	python bench.py --scaling
