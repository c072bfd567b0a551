"""M8 translation hook — a dependency-injected kept-rows transform slot.

Reference parity: ``translate.py:15-39`` loads a MarianMT model pair and
translates between the two allowed languages, raising on any other pair;
``runner.py:145-160`` applies it to a finished result only when a target
language was requested, the row is kept, not music-only, the detected
language is en/fr, and differs from the target, recording
``translated``/``target_lang``.

This environment has no translation model (the reference itself makes the
dependency optional and raises ImportError without it), so the Spark
operator is a PLUGGABLE SLOT, default off:

- ``apply_translation(df)`` with no ``target_lang`` is the identity on
  content — it only adds ``translated=false`` lineage columns, mirroring
  the reference's ``result["translated"] = False`` branch.
- With ``target_lang`` set, an injected batch translator
  ``(texts, source_lang, target_lang) -> list[str]`` runs inside an
  Arrow-batched iterator pandas UDF over EXACTLY the eligible rows'
  text (everything else passes through untouched), with the same
  poison-row capture as the scoring UDFs (D5): a failing document yields
  a NULL translation, never a dead task.
- Default ``translator`` is the identity function — the slot is real,
  the model is injectable (the reference's mock-model test pattern).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import constants as C

Translator = Callable[[list[str], str, str], list[str]]


def make_translate_udf(fn: Translator, target_lang: str):
    """Arrow-batched iterator pandas UDF wrapping a batch translator.
    Batches are sub-grouped by source language (the reference loads one
    model per direction); per-row poison capture mirrors scoring.py."""

    @F.pandas_udf("string")
    def udf(it: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for texts, langs in it:
            out = pd.Series([None] * len(texts), dtype=object)
            for src in langs.dropna().unique():
                mask = (langs == src).fillna(False)
                sub = texts[mask].fillna("").tolist()
                try:
                    res = fn(sub, str(src), target_lang)
                except Exception:
                    res = []
                    for t in sub:
                        try:
                            res.append(fn([t], str(src), target_lang)[0])
                        except Exception:
                            res.append(None)
                out[mask] = pd.Series(res, index=texts[mask].index,
                                      dtype=object)
            yield out

    return udf


def apply_translation(
    df: DataFrame,
    target_lang: str | None = None,
    translator: Translator | None = None,
    text_col: str = "scrubbed_text",
    lang_col: str = "language",
    music_only_col: str = "score_meta.music_only",
) -> DataFrame:
    """Kept-rows translation pass over a pipeline output frame.

    Eligibility replicates runner.py:145-151: target requested AND kept AND
    not music-only AND detected language in the allowed set AND different
    from the target. Ineligible rows (and every row when ``target_lang`` is
    None — the default-off mode) carry ``translated=false`` and NULL
    ``translated_text``/``target_lang``."""
    if target_lang is None:
        return (
            df.withColumn("translated", F.lit(False))
            .withColumn("target_lang", F.lit(None).cast("string"))
            .withColumn("translated_text", F.lit(None).cast("string"))
        )
    if target_lang not in C.ALLOWED_LANGS:
        raise ValueError(
            f"Translation to '{target_lang}' is not supported "
            f"(allowed: {sorted(C.ALLOWED_LANGS)})")

    eligible = (
        F.col("keep")
        & ~F.col(music_only_col)
        & F.col(lang_col).isin(*sorted(C.ALLOWED_LANGS))
        & (F.col(lang_col) != target_lang)
    )
    udf = make_translate_udf(translator or (lambda ts, s, t: ts), target_lang)
    # the UDF projection is masked to eligible rows: ineligible rows feed
    # NULL text and never reach the translator (bounded work — at corpus
    # scale most rows are already in the target language)
    masked_text = F.when(eligible, F.col(text_col))
    masked_lang = F.when(eligible, F.col(lang_col))
    return (
        df.withColumn("translated", eligible)
        .withColumn("target_lang",
                    F.when(eligible, F.lit(target_lang)).cast("string"))
        .withColumn("translated_text",
                    F.when(eligible, udf(masked_text, masked_lang))
                    .cast("string"))
    )
