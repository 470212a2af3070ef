"""Interleaved-span pipeline: explode → enrich → join → reassemble.

The per-row invariant the driver checks (input hint): span-sequence equality
— after any pipeline, ``array_sort(collect_list(struct(offset, kind, text,
media_ref)))`` must equal the original ``spans`` ordered by offset.  All
steps below are built-in Spark ops (no UDF), so reassembly is pure shuffle +
sort-within-group; determinism comes from sorting by the explicit ``offset``
column, never by arrival order (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_spans(docs: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → one row per span, offset preserved."""
    return docs.select(
        "doc_id",
        F.posexplode("spans").alias("pos", "span"),
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def geo_enrich(spans: DataFrame) -> DataFrame:
    """Parse 'lon,lat' payloads of geo spans into typed columns (others null)."""
    parts = F.split(F.col("text"), ",")
    is_geo = F.col("kind") == "geo"
    return spans.withColumn(
        "lon", F.when(is_geo, parts.getItem(0).cast("double"))
    ).withColumn("lat", F.when(is_geo, parts.getItem(1).cast("double")))


def reassemble(spans: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Rebuild documents from exploded spans; span order restored by offset.

    ``array_sort`` on a struct array sorts by fields in order, so ``offset``
    must lead the struct — this is what makes the result independent of
    shuffle/partition order.
    """
    span_struct = F.struct(
        F.col("offset"), F.col("kind"), F.col("text"), F.col("media_ref"),
        *[F.col(c) for c in extra_cols],
    )
    return spans.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(span_struct)).alias("spans"),
        F.count("*").alias("n_spans"),
    )


def roundtrip_check(docs: DataFrame) -> DataFrame:
    """explode → reassemble → compare against the original, per doc.

    Returns (doc_id, ok boolean); the pipeline-level oracle used by tests.
    """
    rebuilt = reassemble(explode_spans(docs))
    orig = docs.select(
        "doc_id",
        F.array_sort(
            F.transform(
                "spans",
                lambda s: F.struct(
                    s.offset.alias("offset"),
                    s.kind.alias("kind"),
                    s.text.alias("text"),
                    s.media_ref.alias("media_ref"),
                ),
            )
        ).alias("orig_spans"),
    )
    joined = orig.join(rebuilt, "doc_id", "full_outer")
    return joined.select(
        "doc_id",
        (
            F.col("orig_spans").isNotNull()
            & F.col("spans").isNotNull()
            & (F.col("orig_spans") == F.col("spans"))
        ).alias("ok"),
    )
