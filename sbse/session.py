"""SparkSession factory tuned for the engine.

Settings chosen for 100 TB-scale behavior (AQE, skew-join handling, Arrow
batches) while remaining correct on local[N]:

- session timezone pinned UTC (event-time determinism; reference stamps
  UTC at ingest, cmd/ingestor/main.go:130),
- AQE on with skew-join splitting (hot `source` values; north_rule),
- Arrow execution on for every pandas UDF exchange.
"""

from __future__ import annotations

import os
import sys
import zipfile

from pyspark.sql import SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def get_spark(
    master: str | None = None,
    app_name: str = "sbse",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 4)
    # Workers must be able to import sbse for Arrow UDFs shipped by reference.
    pypath = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _REPO_ROOT + (os.pathsep + pypath if pypath else "")
        )
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SBSE_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    ensure_shipped(spark)
    return spark


def ensure_shipped(spark: SparkSession) -> None:
    """Ship the sbse package to executors (the --py-files story).

    Safe to call on sessions we did not create (e.g. the driver's): zips the
    package once and registers it via ``addPyFile`` so Arrow UDFs that
    reference sbse by module resolve on workers.
    """
    sc = spark.sparkContext
    if getattr(sc, "_sbse_shipped", False):
        return
    pkg_dir = os.path.join(_REPO_ROOT, "sbse")
    zpath = os.path.join("/tmp", f"sbse_pkg_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, _REPO_ROOT)
                        zf.write(full, rel)
    try:
        sc.addPyFile(zpath)
    except Exception:  # pragma: no cover - already added in this session
        pass
    if _REPO_ROOT not in sys.path:
        sys.path.insert(0, _REPO_ROOT)
    sc._sbse_shipped = True
