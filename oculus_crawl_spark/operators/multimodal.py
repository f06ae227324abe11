"""Multimodal column plumbing (image/audio/video as opaque binary).

A 100 TB training-data pipeline carries media as ``binary`` columns with
typed metadata and runs decode / feature-extract stages as Arrow-batched
``mapInPandas`` passes. This container has no image/audio libraries, so
the DECODE step is stubbed (``decode_media`` raises NotImplementedError
unless a decoder is injected), while everything Spark-side is real and
tested: the schema contract, the mapInPandas batch shape, deterministic
feature extraction from the raw bytes (md5-derived), and the driver
oracle (SQL mirror over the same md5 arithmetic).

Two execution paths, same output contract: the DEFAULT (no decoder)
fingerprint path is pure JVM expressions — octet_length/md5/conv, zero
Python crossings, plan-test-pinned — because hashing bytes never needs
an Arrow hop; ``mapInPandas`` is reserved for injected decoders, the
case that genuinely requires Python.

Feature columns per media row:
  n_bytes     — payload size
  fp_md5      — md5 hex of the payload
  f0..f3      — four uint32 features parsed from the md5 hex (stand-ins
                for a real embedding; deterministic, SQL-mirrorable)
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import read_table

MEDIA_FEATURES_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, fp_md5 string, "
    "f0 long, f1 long, f2 long, f3 long"
)


def decode_media(payload: bytes, media_type: str):
    """Decode a media payload into pixels/samples/frames.

    STUB: real decoders (PIL/ffmpeg/torchaudio) are not available in
    this environment. Inject one via ``extract_media_features(...,
    decoder=...)`` on a real cluster."""
    raise NotImplementedError(
        f"no decoder for media_type={media_type!r} in this environment"
    )


def _feature_batches(
    batches: Iterator[pd.DataFrame], decoder: Callable | None
) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        payloads = pdf["media"]
        if payloads.isna().any():
            # Same contract as the JVM path's assert: a NULL payload is
            # a corrupt input row, not a row to silently feature as NULL.
            raise ValueError("NULL media payload (doc_id="
                             f"{pdf.loc[payloads.isna(), 'doc_id'].iloc[0]})")
        if decoder is not None:
            # Real path: decode then featurize (not reachable in sandbox).
            payloads = payloads.map(lambda b: decoder(b, "image"))
        digests = payloads.map(lambda b: hashlib.md5(b).hexdigest())
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": payloads.map(len).astype("int32"),
                "fp_md5": digests,
                **{
                    f"f{i}": digests.map(
                        lambda d, i=i: int(d[8 * i : 8 * i + 8], 16)
                    ).astype("int64")
                    for i in range(4)
                },
            }
        )
        yield out


def extract_media_features(
    media_df: DataFrame, decoder: Callable | None = None
) -> DataFrame:
    """(doc_id, media_type, media:binary) -> feature table.

    ``decoder=None`` (no media libraries, or fingerprint-only runs)
    computes everything with JVM expressions — octet_length / md5 / conv
    — so the default path has ZERO Python crossings and stays inside
    whole-stage codegen (plan-test-pinned). An injected decoder switches
    to the Arrow ``mapInPandas`` pass, which is where real pixel/sample
    featurization must run."""
    if decoder is None:
        # NULL media would md5/octet_length to NULL feature rows here
        # while the Python path raises — the two paths must agree, so
        # both fail loudly (assert_true raises on the first NULL row).
        # The guard rides on EVERY output column, not just one: Catalyst
        # column pruning drops unreferenced projections, so a guard
        # attached only to fp_md5 would vanish from a
        # select("doc_id", "n_bytes") plan and NULL rows would pass
        # silently — the mapInPandas path raises regardless of which
        # columns the caller keeps (pruning cannot reach inside the
        # kernel), and the JVM path must match it.
        guard = F.assert_true(
            F.col("media").isNotNull(), F.lit("NULL media payload")
        )

        def g(col):
            # assert_true returns NULL on success and raises otherwise,
            # so this wrapper is value-transparent.
            return F.when(guard.isNull(), col)

        fp = g(F.md5("media"))
        return media_df.select(
            g(F.col("doc_id")).alias("doc_id"),
            g(F.col("media_type")).alias("media_type"),
            g(F.octet_length("media").cast("int")).alias("n_bytes"),
            fp.alias("fp_md5"),
            *[
                F.conv(F.substring(fp, 1 + 8 * i, 8), 16, 10)
                .cast("long")
                .alias(f"f{i}")
                for i in range(4)
            ],
        )
    return media_df.mapInPandas(
        lambda it: _feature_batches(it, decoder), MEDIA_FEATURES_SCHEMA
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: synthesize the binary media column deterministically
    from documents.text (utf-8 bytes) — the plumbing under test is the
    binary column + mapInPandas feature pass, not a codec."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit("text/synthetic").alias("media_type"),
        F.encode("text", "utf-8").alias("media"),
    )
    return extract_media_features(docs).orderBy("doc_id")


# The src CTE mirrors the engine's fail-loudly NULL contract (both
# engine paths raise on a NULL payload): a NULL text would otherwise
# NULL-propagate through md5/octet_length here while the engine aborts,
# and the two sides would diverge on exactly the corrupt-input case the
# contract exists for.
SQL_MEDIA_FEATURES = """
WITH src AS (
  SELECT doc_id,
         CASE WHEN text IS NULL THEN error('NULL media payload')
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       'text/synthetic' AS media_type,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       md5(text) AS fp_md5,
       ('0x' || substr(md5(text), 1, 8))::BIGINT AS f0,
       ('0x' || substr(md5(text), 9, 8))::BIGINT AS f1,
       ('0x' || substr(md5(text), 17, 8))::BIGINT AS f2,
       ('0x' || substr(md5(text), 25, 8))::BIGINT AS f3
FROM src ORDER BY doc_id
"""


QUERIES = {
    "multimodal_media_features": (q_media_features, SQL_MEDIA_FEATURES),
}
