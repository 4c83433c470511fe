"""SparkSession factory tuned for the KG-construction workload.

Defaults mirror what we'd submit on a real cluster via
``spark-submit --py-files cow_spark.zip``: AQE on (runtime partition
coalescing + skew-join splitting), Arrow enabled for the pandas-UDF
template fallback, and a shuffle-partition count sized to the
parallelism level instead of Spark's 200 default.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def iceberg_available() -> bool:
    """True when an Iceberg Spark runtime jar is reachable.

    Checks, in order: the ``COW_SPARK_ICEBERG`` env override ("1"/"0" —
    set "1" when the jar arrives by a route we can't probe, e.g.
    ``--jars`` with a custom path), pyspark's bundled jar dir, and the
    Ivy cache that ``spark-submit --packages`` resolves into. This
    offline sandbox has none, so the quads sink falls back to bucketed
    Parquet.
    """
    import glob as _glob

    import pyspark

    override = os.environ.get("COW_SPARK_ICEBERG")
    if override is not None:
        return override not in ("", "0", "false")
    candidates = [
        os.path.join(os.path.dirname(pyspark.__file__), "jars",
                     "iceberg-spark-runtime*"),
        os.path.expanduser("~/.ivy2/jars/*iceberg-spark-runtime*"),
        os.path.expanduser("~/.ivy2.5.2/jars/*iceberg-spark-runtime*"),
        os.path.join(os.environ.get("SPARK_HOME", "/nonexistent"), "jars",
                     "iceberg-spark-runtime*"),
    ]
    return any(_glob.glob(p) for p in candidates)


def get_session(
    master: str | None = None,
    app_name: str = "cow_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    ship_package: bool = True,
    iceberg_warehouse: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    On a cluster, ``master`` comes from spark-submit; locally we default to
    ``local[$SPARK_GRAFT_CPUS]``. ``shuffle_partitions`` defaults to 2x the
    local core count (small enough to avoid tiny-task overhead at test SF,
    AQE coalesces further; on a real cluster you'd size this to ~2-3x total
    executor cores and let AQE split skewed partitions).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None and "PYSPARK_GATEWAY_PORT" in os.environ:
        # launched BY spark-submit: the JVM gateway already carries the
        # submitted --master (local-cluster/yarn/k8s). Calling
        # .master() here would stomp it back to local[N] and silently
        # run the whole "cluster" job single-JVM — leave it unset.
        pass
    elif master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N-ish tasks per shuffle; AQE coalesces small ones.
        # Under spark-submit (master unknown here) this stays the env
        # default — size it explicitly per deployment.
        n = (cpus if master is None or not master.startswith("local[")
             else _local_n(master, cpus))
        shuffle_partitions = max(2 * n, 8)

    builder = SparkSession.builder
    if master is not None:
        builder = builder.master(master)
    b = (
        builder
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("COW_SPARK_DRIVER_MEM", "8g"))
        # 128 MiB input splits: at 100 TB that's ~800k tasks — fine for a
        # 1000-executor cluster; bump per-job if files are huge.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if iceberg_warehouse is not None and iceberg_available():
        # Iceberg catalog "cow": bucketed quad tables with real partition
        # transforms (bucket(N, conv_id)) + snapshot ids for lineage (E7)
        b = (
            b.config("spark.sql.catalog.cow",
                     "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.cow.type", "hadoop")
            .config("spark.sql.catalog.cow.warehouse", iceberg_warehouse)
            .config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions."
                "IcebergSparkSessionExtensions",
            )
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    if ship_package:
        # Python workers unpickle our pandas UDFs by module reference, so
        # the package must be importable on every executor — the local
        # equivalent of `spark-submit --py-files cow_spark.zip`.
        spark.sparkContext.addPyFile(_package_zip())
    return spark


_ZIP_CACHE: dict[str, str] = {}


def _package_zip() -> str:
    """Zip the cow_spark package once per process for addPyFile."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if (z := _ZIP_CACHE.get(pkg_dir)) and os.path.exists(z):
        return z
    fd, path = tempfile.mkstemp(prefix="cow_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "cow_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    _ZIP_CACHE[pkg_dir] = path
    return path


def _local_n(master: str, default: int) -> int:
    inner = master[len("local[") : -1]
    if inner == "*":
        return os.cpu_count() or default
    try:
        return int(inner)
    except ValueError:
        return default
