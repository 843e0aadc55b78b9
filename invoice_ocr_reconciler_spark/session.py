"""SparkSession factory tuned for the extraction+reconciliation workload.

Local-mode sandbox today; the same configs scale to a multi-executor cluster
(the knobs that matter at 100 TB — AQE, Arrow batch caps, shuffle sizing —
are identical; only master/memory change under spark-submit).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow record-batch cap: html payloads are large (tens of KB each), so bound
# the rows per Arrow batch to keep executor + Python-worker memory flat.
ARROW_MAX_RECORDS_PER_BATCH = 2048

# ~128 MB of shuffle bytes per reduce task: the block size production
# submitters target so one task's hash map / sort buffer fits any
# reasonably-sized executor regardless of how few executors are running.
SHUFFLE_BLOCK_TARGET_BYTES = 128 * 1024 * 1024

# AQE's pre-coalesce partition count for the STOCK session. Shuffle
# partitioning is a DATA property, not a core-count property — the round-4
# executor rehearsal proved 2x-cores partitions put 1/8th of a corpus-sized
# hash map in one task and OOM a correctly-sized 8 GB executor
# (PLANS.md 'rehearsal-exec'). AQE can coalesce partitions but can NEVER
# split them, so the safe stock default is: start every shuffle WIDE (this
# constant) and let AQE coalesce to ~advisory-size blocks from the ACTUAL
# map-output bytes (which also handles operators whose shuffle EXPANDS past
# their input, e.g. posting-list pair generation — a static input-bytes
# estimate cannot).
#
# The width is a measured TRADE, not free headroom: at 1024, iterative
# graph queries (hits/trust_rank-class: ~dozens of tiny per-round stages,
# localCheckpoint re-materializing the wide partitioning every round)
# ran 2.3x slower at sf0.1 (best-of-5 interleaved: 4.1s -> 10.2s), while
# 256 is statistically identical to the old core-derived default on small
# shuffles AND passes the heavy-ten 8g-executor rehearsal with stock
# defaults. 256 x 128 MB ≈ 32 GB per-shuffle capacity — an order beyond
# anything this sandbox materializes; a 100-TB submitter raises it via
# spark-submit --conf (or data_bytes_hint, which raises the floor and the
# initial together) the same way it raises shuffle.partitions.
AQE_INITIAL_PARTITIONS = 256


def shuffle_partitions_for_bytes(
    input_bytes: int,
    min_parallelism: int = 8,
    target_bytes: int = SHUFFLE_BLOCK_TARGET_BYTES,
    expansion: float = 1.0,
) -> int:
    """Data-aware shuffle partition count: ~one ``target_bytes`` block per
    reduce task, never below ``min_parallelism``.

    Use this to size ``get_spark(data_bytes_hint=...)`` / explicit
    ``shuffle_partitions`` for a job whose input size is known up front
    (e.g. a backfill over N bytes of pages). ``expansion`` is the
    operator's shuffle-bytes-to-input-bytes ratio for workloads known to
    expand (pair generation, posexplode) — for unknown expansion prefer
    the stock session, whose AQE initial-partition sizing works from
    actual map-output bytes instead of estimates."""
    if input_bytes < 0:
        raise ValueError(f"input_bytes must be >= 0, got {input_bytes}")
    blocks = -(-int(input_bytes * expansion) // target_bytes)  # ceil
    return max(int(min_parallelism), blocks, 1)


def iceberg_confs(env: dict) -> dict[str, str]:
    """Iceberg catalog gate configs (empty when no jar is provided).

    Split out so the gate's config assembly is unit-testable without a
    second SparkSession (getOrCreate ignores configs once a session
    exists); the jar itself is absent in the sandbox — see PLANS.md
    'Iceberg runtime attempt'."""
    jar = env.get("SPARK_GRAFT_ICEBERG_JAR")
    if not jar:
        return {}
    return {
        "spark.jars": jar,
        "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.local.type": "hadoop",
        "spark.sql.catalog.local.warehouse": env.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/iceberg_warehouse"
        ),
    }


def get_spark(
    app_name: str = "invoice_ocr_reconciler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    executors: int | None = None,
    executor_mem_mb: int = 4096,
    data_bytes_hint: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores.

    Shuffle sizing (stock): ``spark.sql.shuffle.partitions`` floors at
    2x total cores, but every AQE-coalescible shuffle actually STARTS at
    ``AQE_INITIAL_PARTITIONS`` and is coalesced from real map-output
    bytes — data-aware by construction, so a 2-executor session running a
    corpus-sized pair join no longer concentrates the corpus into
    core-count partitions (the round-4 rehearsal OOM). Passing
    ``data_bytes_hint`` (job input bytes) sizes the floor via
    ``shuffle_partitions_for_bytes`` too; passing ``shuffle_partitions``
    explicitly pins BOTH knobs to exactly that value (tests / plan pins
    rely on an exact count).

    ``executors``: when set, use ``local-cluster[executors, cores,
    executor_mem_mb]`` — SEPARATE executor JVM processes (own GC, allocator,
    Python worker pool) instead of threads in one JVM. This is the faithful
    in-sandbox analog of an N-executor cluster and what the N-vs-4N scaling
    evidence runs on; ``cores`` then means cores PER executor.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    total = cores * (executors or 1)
    if shuffle_partitions is None:
        # stock: AQE does the real sizing (initial wide, coalesce to
        # blocks); this is only the floor + the count for exchanges AQE
        # can't touch. A data_bytes_hint raises the floor for known-big
        # jobs so even non-coalescible exchanges are data-sized.
        initial_partitions = AQE_INITIAL_PARTITIONS
        shuffle_partitions = max(2 * total, 8)
        if data_bytes_hint is not None:
            shuffle_partitions = max(
                shuffle_partitions,
                shuffle_partitions_for_bytes(data_bytes_hint),
            )
            initial_partitions = max(initial_partitions, shuffle_partitions)
    else:
        # explicit pin: the caller wants EXACTLY this many reduce tasks
        # (determinism tests, goldens) — make AQE start there as well.
        initial_partitions = shuffle_partitions

    # Python WORKERS do not inherit the driver's sys.path — a caller that
    # imported this package via sys.path manipulation from another cwd would
    # die with ModuleNotFoundError inside UDF unpickling. Export the repo
    # root on PYTHONPATH BEFORE the JVM (and its worker daemon) launches so
    # forked workers resolve the package regardless of cwd. On a real
    # cluster --py-files ships the zip instead (Makefile `package`).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + existing if existing else "")
        )

    master = (
        f"local-cluster[{executors},{cores},{executor_mem_mb}]"
        if executors
        else f"local[{cores}]"
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(initial_partitions),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Iceberg is the production catalog (hash-bucketed tables, snapshot
    # commits). The runtime jar is not shipped in this sandbox, so the gate
    # stays off unless the submitter provides it via --packages.
    for k, v in iceberg_confs(os.environ).items():
        builder = builder.config(k, v)
    if executors:
        # executor JVMs are separate processes: ship the driver's FULL
        # PYTHONPATH (repo root was prepended above; user entries like
        # extra UDF libs must survive too — local[] threads inherit the
        # env, these don't). Real clusters use --py-files instead.
        builder = builder.config(
            "spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"]
        )
        # local-cluster[E, C, M] sets the WORKER's memory budget only; the
        # executor JVM still launches with the 1g spark.executor.memory
        # default. Round-4 executor-mode rehearsal found this the hard way:
        # "8g" executors showed ~880MB peak heaps and died growing a
        # BytesToBytesMap. Pin the heap to the requested size.
        builder = builder.config("spark.executor.memory", f"{executor_mem_mb}m")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
