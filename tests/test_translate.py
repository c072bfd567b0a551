"""M8 translation hook (reference translate.py:15-39, runner.py:145-160):
pluggable slot, default off, eligibility predicate parity."""

import pytest
from pyspark.sql import functions as F

from langid_mr_spark import fixtures, pipeline, translate


@pytest.fixture(scope="module")
def gated(spark):
    out = pipeline.run_pipeline(fixtures.corpus_df(spark, 60),
                                persist_level=None)
    return out.localCheckpoint(eager=True)


def test_default_off_is_identity(gated):
    out = translate.apply_translation(gated)
    rows = out.collect()
    assert all(r["translated"] is False and r["translated_text"] is None
               and r["target_lang"] is None for r in rows)
    # content untouched
    base = {r["url"]: r["scrubbed_text"] for r in gated.collect()}
    assert all(base[r["url"]] == r["scrubbed_text"] for r in rows)


def test_rejects_unsupported_target(gated):
    with pytest.raises(ValueError, match="not supported"):
        translate.apply_translation(gated, target_lang="de")


def test_eligibility_and_injected_translator(gated):
    def fake(texts, src, tgt):
        return [f"[{src}->{tgt}]{t}" for t in texts]

    out = translate.apply_translation(gated, target_lang="fr",
                                      translator=fake).collect()
    assert any(r["translated"] for r in out)
    for r in out:
        want = (r["keep"] and not r["score_meta"]["music_only"]
                and r["language"] in {"en", "fr"} and r["language"] != "fr")
        assert r["translated"] == want
        if want:
            assert r["target_lang"] == "fr"
            assert r["translated_text"] == f"[{r['language']}->fr]" + (
                r["scrubbed_text"] or "")
        else:
            assert r["translated_text"] is None and r["target_lang"] is None


def test_poison_translator_yields_null_not_dead_task(gated):
    def poison(texts, src, tgt):
        if any("the" in t for t in texts):
            raise RuntimeError("model exploded")
        return texts

    out = translate.apply_translation(gated, target_lang="fr",
                                      translator=poison).collect()
    # rows survive; failing documents carry NULL translations
    assert len(out) == gated.count()
    for r in out:
        if r["translated"] and "the" in (r["scrubbed_text"] or ""):
            assert r["translated_text"] is None
