"""End-to-end corpus curation: one declarative composition of every stage a
training-data pipeline runs between raw web pages and a training shard.

    raw web_pages
      → quality-filter pipeline (language gate + heuristic rules + scrub,
        pipeline.run_pipeline — the reference's whole job)
      → near-duplicate clustering over the kept documents (MinHash-LSH
        candidates → exact-Jaccard verification → connected components)
      → canonical selection (cluster minimum survives)
      → optional per-language cap and deterministic sample

Everything stays one lazy DataFrame DAG except the bounded label-propagation
rounds inside duplicate_clusters. Each stage's population is countable from
the returned frame's lineage columns (keep/final_keep/drop_reason from the
gate, is_canonical from dedup), so a `curation_report` is one aggregation —
the corpus-level analog of the reference's per-job counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, pipeline, sampling


def curate(
    df: DataFrame,
    dedup_threshold: float = 0.5,
    per_lang_cap: int | None = None,
    sample_fraction: float | None = None,
    **pipeline_kwargs,
) -> DataFrame:
    """Raw input (input_hint schema) → curated rows.

    Returns ALL gate-output rows annotated with the curation lineage —
    ``is_canonical`` (survived near-dup collapse), ``canonical_url`` (the
    cluster representative), ``curated`` (final selected) — so one frame
    answers both "what is the training shard" (filter ``curated``) and
    "why was each document dropped" (drop_reason / quality_fail_reason /
    canonical_url). Near-dup runs on the FULL extracted text of KEPT
    documents only (the gate already dropped the rest), keyed by url — the
    text is CARRIED through run_pipeline (``carry_text="full"``), so the
    whole funnel pays exactly one extraction UDF pass. Full, not
    probe-bounded (r3 advice): web corpora are thick with long pages that
    share a multi-kB boilerplate/nav prefix but diverge after it — a
    prefix-bounded shingle set would merge those into one cluster and
    silently drop the non-canonical copies.
    """
    gated = pipeline.run_pipeline(df, carry_text="full", **pipeline_kwargs)

    kept_text = gated.filter(F.col("final_keep")).select(
        "url", F.col("extracted_full").alias("_text"))

    pairs = dedup.minhash_near_duplicates(
        kept_text, id_col="url", text_col="_text",
        threshold=dedup_threshold).select("id_a", "id_b")
    clusters = dedup.duplicate_clusters(
        pairs, kept_text.select(F.col("url").alias("id")))
    clusters = clusters.select(
        F.col("id").alias("url"), F.col("cluster_id").alias("canonical_url"))

    out = (gated.drop("extracted_probe", "extracted_full")
           .join(clusters, "url", "left"))
    out = out.withColumn(
        "is_canonical",
        F.col("final_keep") & (F.col("canonical_url") == F.col("url")))

    selected = F.col("is_canonical")
    if per_lang_cap is not None:
        capped = sampling.stratified_cap(
            out.filter(selected), ["language"], per_lang_cap, "url")
        out = out.join(capped.select("url", F.lit(True).alias("_in_cap")),
                       "url", "left")
        selected = selected & F.coalesce(F.col("_in_cap"), F.lit(False))
    if sample_fraction is not None:
        selected = selected & (
            sampling.hash_fraction(F.col("url"), "curate") < sample_fraction)
    out = out.withColumn("curated", selected)
    return out.drop("_in_cap") if per_lang_cap is not None else out


def curation_report(curated: DataFrame) -> DataFrame:
    """One-aggregation funnel: docs in → kept by gate+quality → canonical
    after dedup → finally curated, plus per-drop-reason counts."""
    return curated.agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.count(F.when(F.col("keep"), 1)).alias("gate_kept"),
        F.count(F.when(F.col("final_keep"), 1)).alias("quality_kept"),
        F.count(F.when(F.col("is_canonical"), 1)).alias("canonical"),
        F.count(F.when(F.col("curated"), 1)).alias("curated"),
        F.count(F.when(F.col("drop_reason") == "music_only", 1))
        .alias("dropped_music"),
        F.count(F.when(F.col("drop_reason") == "invalid_input", 1))
        .alias("dropped_invalid"),
        F.count(F.when(F.col("drop_reason") == "error", 1))
        .alias("dropped_error"),
        F.count(F.when(F.col("final_keep")
                       & ~F.coalesce(F.col("is_canonical"), F.lit(False)), 1))
        .alias("dropped_duplicate"),
    )
