"""Stage-level checkpointing with per-partition lineage + metrics (north
rule: every pipeline stage checkpoints so runs resume mid-pipeline).

The reference has no persistence at all (its "sink" is a blocking device
read-back, ``src/projcl_run.c:273-285``); this is engine-added scaffolding
for 10^12-row pipelines where any stage can die and re-running finished
stages is unaffordable.

Layout (table-format-agnostic: parquet dirs in the sandbox; pass
``table_format="iceberg"`` to target Iceberg tables via ``df.writeTo(...)``
on a cluster with the iceberg-spark runtime — ``tests/test_checkpoint.py::
test_iceberg_seam`` drives that path, skip-marked where the jar is absent):

    {root}/{run_id}/{stage}/data/        stage output (parquet)
    {root}/{run_id}/{stage}/_lineage/    per-partition rows:
        (run_id, stage, partition_id, n_rows, wall_ms, inputs, finished_at)
    {root}/{run_id}/{stage}/_OK          commit marker (atomic rename)

Resume contract: a stage re-runs iff its ``_OK`` marker is absent; finished
stages are served from their checkpoint, so a driver crash between stages
loses at most the in-flight stage.  Lineage rows are computed from the data
actually written (count per ``spark_partition_id``), not from what the
planner intended — they double as row-count audit records.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the iceberg-spark runtime jar is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class Pipeline:
    """``table_format="parquet"`` (sandbox default) checkpoints to parquet
    dirs; ``"iceberg"`` checkpoints each stage to an Iceberg table via
    ``df.writeTo(...).using("iceberg").createOrReplace()`` — requires the
    iceberg-spark runtime jar + a configured catalog (``catalog`` names it;
    stage tables land in ``{catalog}.{namespace}``).  Same stage/lineage/
    resume contract either way; ``_OK`` markers stay filesystem-side so
    resume logic is format-agnostic."""

    def __init__(self, spark: SparkSession, root: str, run_id: str,
                 table_format: str = "parquet",
                 catalog: str = "projcl", namespace: str = "checkpoints"):
        if table_format not in ("parquet", "iceberg"):
            raise ValueError(f"unknown table_format {table_format!r}")
        if table_format == "iceberg":
            if not iceberg_available(spark):
                raise RuntimeError(
                    "table_format='iceberg' needs the iceberg-spark-runtime jar "
                    "(spark.jars.packages=org.apache.iceberg:iceberg-spark-"
                    "runtime-4.0_2.13:<ver>) and a spark.sql.catalog config")
            if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is None:
                raise RuntimeError(
                    f"table_format='iceberg' needs spark.sql.catalog.{catalog} "
                    "configured (SparkCatalog/REST/Hive/JDBC) — the jar alone "
                    "is not enough")
            # Hive/REST/JDBC catalogs do not auto-create namespaces
            spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")
        self.spark = spark
        self.root = root
        self.run_id = run_id
        self.table_format = table_format
        self.catalog = catalog
        self.namespace = namespace
        self._stages: list[str] = []
        self.ran: list[str] = []      # stages executed this invocation
        self.resumed: list[str] = []  # stages served from checkpoint

    # ----------------------------------------------------------- storage ---

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, self.run_id, stage)

    def _ok(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "_OK")

    def is_done(self, stage: str) -> bool:
        return os.path.exists(self._ok(stage))

    def _table(self, path: str) -> str:
        """Map a checkpoint path to an Iceberg table identifier."""
        rel = os.path.relpath(path, self.root)
        part = rel.replace(os.sep, "_").replace(".", "_").replace("-", "_")
        return f"{self.catalog}.{self.namespace}.{part}"

    @staticmethod
    def _fs_url(path: str) -> str:
        """Parquet data must land on the same mounted filesystem the
        os-level ``_OK``/lineage checks inspect — qualify with file: so a
        cluster whose fs.defaultFS is an object store can't silently
        split the two."""
        return path if "://" in path else f"file://{path}"

    def _write(self, df: DataFrame, path: str) -> None:
        if self.table_format == "iceberg":
            df.writeTo(self._table(path)).using("iceberg").createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self._fs_url(path))

    def _read(self, path: str) -> DataFrame:
        if self.table_format == "iceberg":
            return self.spark.read.table(self._table(path))
        return self.spark.read.parquet(self._fs_url(path))

    # ------------------------------------------------------------ stages ---

    def stage(
        self,
        name: str,
        fn: Callable[..., DataFrame],
        inputs: tuple[str, ...] = (),
    ) -> DataFrame:
        """Run (or resume) one named stage.

        ``fn`` receives the checkpointed DataFrames of ``inputs`` and must
        return the stage's output DataFrame.  Output is checkpointed before
        anything downstream sees it — downstream stages therefore re-read a
        stable, re-partitionable parquet snapshot instead of recomputing the
        upstream plan (also breaks lineage for very deep plans).
        """
        if name in self._stages:
            raise ValueError(f"duplicate stage {name!r}")
        self._stages.append(name)
        data_path = os.path.join(self._dir(name), "data")
        if self.is_done(name):
            self.resumed.append(name)
            return self._read(data_path)

        t0 = time.time()
        out = fn(*[self._read(os.path.join(self._dir(i), "data")) for i in inputs])
        self._write(out, data_path)
        wall_ms = int((time.time() - t0) * 1000)

        # lineage from what was actually written
        written = self._read(data_path)
        lineage = (
            written.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("n_rows"))
            .select(
                F.lit(self.run_id).alias("run_id"),
                F.lit(name).alias("stage"),
                "partition_id",
                "n_rows",
                F.lit(wall_ms).alias("wall_ms"),
                F.lit(",".join(inputs)).alias("inputs"),
                F.current_timestamp().alias("finished_at"),
            )
        )
        self._write(lineage, os.path.join(self._dir(name), "_lineage"))
        # atomic commit: write-then-rename so a crash mid-write can never
        # leave a marker that is_done() would trust
        os.makedirs(self._dir(name), exist_ok=True)  # iceberg mode: no parquet dir
        tmp = self._ok(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"stage": name, "wall_ms": wall_ms,
                       "inputs": list(inputs)}, f)
        os.replace(tmp, self._ok(name))
        self.ran.append(name)
        return written

    # ----------------------------------------------------------- queries ---

    def lineage(self) -> DataFrame:
        """All lineage rows of this run (every committed stage)."""
        paths = [
            os.path.join(self._dir(s), "_lineage")
            for s in self._stages
            if self.is_done(s)
        ]
        if not paths:  # inspecting a run that crashed before any commit
            return self.spark.createDataFrame(
                [], "run_id string, stage string, partition_id int, "
                    "n_rows long, wall_ms int, inputs string, "
                    "finished_at timestamp")
        dfs = [self._read(p) for p in paths]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionAll(d)
        return out

    def metrics(self) -> dict:
        """Per-stage wall/row metrics from the commit markers + lineage."""
        out = {}
        for s in self._stages:
            if not self.is_done(s):
                continue
            with open(self._ok(s)) as f:
                meta = json.load(f)
            n = self._read(os.path.join(self._dir(s), "_lineage")).agg(
                F.sum("n_rows")
            ).first()[0]
            out[s] = {"wall_ms": meta["wall_ms"], "n_rows": int(n or 0),
                      "inputs": meta["inputs"]}
        return out
