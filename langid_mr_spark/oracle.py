"""Row-at-a-time pure-Python reference implementation.

This is the executable spec of the rebuilt pipeline: a direct transcription
of the reference's cascade (lang_gate.py:293-546) and worker packaging
(worker/runner.py:29-160) onto webtext. The Spark pipeline's keep/drop/label
output is scored against this oracle (BASELINE.json: F1 ≥ 0.99; scrubbed
text byte-identical). It shares the scorer (scoring.score_batch) and every
string helper (textnorm) with the Spark side, so disagreement isolates a
Spark-expression parity bug rather than a model difference.
"""

from __future__ import annotations

from typing import Any, Callable

from . import constants as C
from . import scoring, scrub, textnorm as TN

LangScorer = Callable[[str], tuple[str, float]]
PplScorer = Callable[[str], tuple[float, float]]


def gate_one(
    text: str | None,
    lang_scorer: LangScorer | None = None,
    ppl_scorer: PplScorer | None = None,
    strict_reject: bool = C.ENFR_STRICT_REJECT,
    lang_scorer2: LangScorer | None = None,
) -> dict[str, Any]:
    """detect_lang_en_fr_only (lang_gate.py:293-546), one document."""
    lang_scorer = lang_scorer or scoring.langid_one
    ppl_scorer = ppl_scorer or scoring.ppl_one
    lang_scorer2 = lang_scorer2 or lang_scorer

    probe = TN.probe(text)
    tokens = TN.tokenize_text(probe)
    tc1 = len(tokens)
    music1 = TN.is_music_only(probe)
    en1 = TN.compute_stopword_ratio(probe, C.EN_STOPWORDS)
    fr1 = TN.compute_stopword_ratio(probe, C.FR_STOPWORDS)

    # Poison capture (D5, runner.py:192-199): a throwing scorer yields an
    # error ROW, matching gate._emit_error on the Spark side.
    def _error(use_vad: bool) -> dict[str, Any]:
        return _result(C.DECISION_ERROR, "none", None, None, use_vad,
                       en1, fr1, tc1, False)

    try:
        lang1, p1_raw = lang_scorer(probe)
    except Exception:
        return _error(False)
    p1 = TN.safe_probability(p1_raw)

    # C1 — music/boilerplate-only short-circuit (lang_gate.py:340-352)
    if music1:
        return _result(C.DECISION_MUSIC_ONLY, "none", p1_raw,
                       C.METHOD_AUTODETECT, False, 0.0, 0.0, tc1, True)

    if lang1 in C.ALLOWED_LANGS:
        # C2 — high confidence + speechiness guard (lang_gate.py:354-396)
        if p1 >= C.MID_UPPER:
            if (tc1 >= C.MIN_TOKENS_FOR_SPEECH
                    and max(en1, fr1) >= C.MIN_STOPWORD_FOR_SPEECH):
                return _result(C.DECISION_HIGH_CONF, lang1, p1_raw,
                               C.METHOD_AUTODETECT, False, en1, fr1, tc1, False)
        # C3/C4 — mid-zone heuristics (lang_gate.py:398-453); reachable at
        # p ≥ MID_UPPER when the speechiness guard fired (fall-through).
        if p1 >= C.MID_LOWER and lang1 in {"en", "fr"}:
            if (lang1 == "en" and tc1 >= C.MIN_TOKENS_FOR_HEURISTIC
                    and en1 >= C.MID_EN_MIN_STOPWORD_RATIO
                    and en1 > fr1 + C.STOPWORD_MARGIN):
                return _result(C.DECISION_MID_EN, lang1, p1_raw,
                               C.METHOD_AUTODETECT, False, en1, fr1, tc1, False)
            if (lang1 == "fr" and tc1 >= C.MIN_TOKENS_FOR_HEURISTIC
                    and fr1 >= C.MID_FR_MIN_STOPWORD_RATIO
                    and fr1 > en1 + C.STOPWORD_MARGIN):
                return _result(C.DECISION_MID_FR, lang1, p1_raw,
                               C.METHOD_AUTODETECT, False, en1, fr1, tc1, False)

    # Pass 2 — VAD analog: rescore the cleaned probe (lang_gate.py:455-470)
    cleaned = TN.vad_clean(probe)
    try:
        lang2, p2_raw = lang_scorer2(cleaned)
    except Exception:
        return _error(True)
    p2 = TN.safe_probability(p2_raw)

    # C5 — VAD-pass music-only (lang_gate.py:472-488)
    if TN.is_music_only(cleaned):
        return _result(C.DECISION_MUSIC_ONLY, "none", p2_raw,
                       C.METHOD_AUTODETECT_VAD, True, 0.0, 0.0,
                       len(TN.tokenize_text(cleaned)), True)

    # C6 — VAD accept; reports FIRST-pass ratios/tc (lang_gate.py:490-511)
    if lang2 in C.ALLOWED_LANGS and p2 >= C.LANG_DETECT_MIN_PROB:
        return _result(C.DECISION_VAD_RETRY, lang2, p2_raw,
                       C.METHOD_AUTODETECT_VAD, True, en1, fr1, tc1, False)

    # C7 — strict reject (lang_gate.py:527-531; error row per SURVEY §2.5)
    if strict_reject:
        return _result(C.DECISION_STRICT_REJECT, lang1, p1_raw,
                       C.METHOD_AUTODETECT, True, en1, fr1, tc1, False)

    # C8 — fallback EN/FR scoring of the PROBE (lang_gate.py:533-546);
    # tie → "en" (Python max() first-key behavior, lang_gate.py:253).
    try:
        ppl_en, ppl_fr = ppl_scorer(probe)
    except Exception:
        return _error(True)
    chosen = "en" if ppl_en >= ppl_fr else "fr"
    return _result(C.DECISION_FALLBACK, chosen, None,
                   C.METHOD_FALLBACK, True, en1, fr1, tc1, False)


def _result(decision, language, probability, method, use_vad,
            en_ratio, fr_ratio, token_count, music_only) -> dict[str, Any]:
    """_build_gate_result analog (lang_gate.py:172-213) + derived fields."""
    prob_value = TN.safe_probability(probability)
    keep = decision in C.KEEP_DECISIONS
    if decision == C.DECISION_MUSIC_ONLY:
        drop_reason = C.DROP_MUSIC_ONLY
    elif decision == C.DECISION_STRICT_REJECT:
        drop_reason = C.DROP_NON_ENFR_STRICT
    elif decision == C.DECISION_ERROR:
        drop_reason = C.DROP_ERROR
    else:
        drop_reason = None
    out = {
        "gate_decision": decision,
        "language": language,
        "probability": None if probability is None else float(probability),
        "detection_method": method,
        "use_vad": use_vad,
        "en_ratio": en_ratio,
        "fr_ratio": fr_ratio,
        "token_count": token_count,
        "music_only": music_only,
        "mid_zone": C.MID_LOWER <= prob_value < C.MID_UPPER,
        "keep": keep,
        "drop_reason": drop_reason,
    }
    out["gate_path"] = classify_gate_path(out)
    out["pipeline_mode"] = classify_pipeline_mode(out)
    return out


def classify_gate_path(r: dict[str, Any]) -> str:
    """gate_metrics.classify_gate_path (gate_metrics.py:52-90)."""
    d = (r.get("gate_decision") or "").strip().lower()
    if r.get("music_only") or d == "no_speech_music_only":
        return C.GATE_PATH_MUSIC_ONLY
    if d == "fallback":
        return C.GATE_PATH_FALLBACK
    if d == "vad_retry":
        return C.GATE_PATH_VAD_RETRY
    if d == "accepted_mid_zone_en":
        return C.GATE_PATH_MID_ZONE_EN
    if d == "accepted_mid_zone_fr":
        return C.GATE_PATH_MID_ZONE_FR
    if d == "accepted_high_conf":
        return C.GATE_PATH_HIGH_CONF
    if r.get("mid_zone"):
        lang = (r.get("language") or "").strip().lower()
        return C.GATE_PATH_MID_ZONE_FR if lang == "fr" else C.GATE_PATH_MID_ZONE_EN
    return C.GATE_PATH_UNKNOWN


def classify_pipeline_mode(r: dict[str, Any]) -> str:
    """gate_metrics.classify_pipeline_mode (gate_metrics.py:93-129)."""
    d = (r.get("gate_decision") or "").strip().lower()
    m = (r.get("detection_method") or "").strip().lower()
    if d == "fallback":
        return C.PIPELINE_MODE_FALLBACK
    if d == "no_speech_music_only" or r.get("music_only"):
        return C.PIPELINE_MODE_MUSIC_ONLY
    if d in {"accepted_mid_zone_en", "accepted_mid_zone_fr"} or r.get("mid_zone"):
        return C.PIPELINE_MODE_MID_ZONE
    if d == "vad_retry" or r.get("use_vad") or m.startswith("vad"):
        return C.PIPELINE_MODE_VAD
    if d == "accepted_high_conf":
        return C.PIPELINE_MODE_BASE
    return C.PIPELINE_MODE_UNKNOWN


def process_one(
    url: str,
    html: bytes | None,
    text: str | None,
    lang_scorer: LangScorer | None = None,
    ppl_scorer: PplScorer | None = None,
    strict_reject: bool = C.ENFR_STRICT_REJECT,
) -> dict[str, Any]:
    """Full per-document result (worker process_one analog, runner.py:29-160):
    extract → gate → snippet-pass scrub on kept en/fr rows."""
    from . import quality as Q

    try:
        extracted = (TN.extract_text_from_html(html) if html is not None
                     else (text or ""))
    except Exception:
        # D5 parity: run_pipeline captures per-row extraction failures in
        # the UDF and folds them into drop_reason='error' rows
        # (pipeline.py extract-error fold) — the executable-spec twin must
        # emit the same row, not raise.
        r = gate_one("", lang_scorer, ppl_scorer, strict_reject)
        r.update(
            gate_decision=C.DECISION_ERROR,
            language="none",
            probability=None,
            detection_method=None,
            keep=False,
            drop_reason=C.DROP_ERROR,
            gate_path=C.GATE_PATH_UNKNOWN,
            pipeline_mode=C.PIPELINE_MODE_UNKNOWN,
        )
        r["quality_fail_reason"] = None
        r["final_keep"] = False
        r["scrubbed_text"] = ""
        r["url"] = url
        r["extracted_text"] = None
        return r
    r = gate_one(extracted, lang_scorer, ppl_scorer, strict_reject)
    # Gopher/C4-style quality rules on the full document (north_star)
    q = Q.quality_one(extracted)
    r["quality_fail_reason"] = q["quality_fail_reason"]
    r["final_keep"] = r["keep"] and q["quality_pass"]
    # Snippet pass (runner.py:92-108): only non-music en/fr rows get text;
    # snippet = first 10 whitespace words of the scrubbed snippet window.
    if not r["music_only"] and r["language"] in {"en", "fr"} and r["keep"]:
        window = TN.snippet_window(extracted)
        scrubbed = scrub.scrub_text(window)
        r["scrubbed_text"] = TN.snippet_first_words(scrubbed, 10)
    else:
        r["scrubbed_text"] = ""
    r["url"] = url
    r["extracted_text"] = extracted
    return r
