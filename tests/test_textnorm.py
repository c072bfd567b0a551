"""Unit tests for the pure-Python spec (textnorm), with golden values taken
from the reference's own tests (test_truncation.py, test_languages.py,
test_enfr_gate.py music-only parametrizations)."""

import pytest

from langid_mr_spark import constants as C
from langid_mr_spark import textnorm as TN


def test_tokenize_basic():
    assert TN.tokenize_text("Hello, World!") == ["hello", "world"]
    assert TN.tokenize_text("") == []
    assert TN.tokenize_text(None) == []


def test_tokenize_keeps_apostrophes():
    # lang_gate.py:92 — [^\w']+ keeps it's as one token
    assert TN.tokenize_text("well, it's for the one") == [
        "well", "it's", "for", "the", "one"]


def test_tokenize_unicode_words():
    assert TN.tokenize_text("réduction gratuite aujourd'hui ça là") == [
        "réduction", "gratuite", "aujourd'hui", "ça", "là"]


def test_stopword_ratio():
    assert TN.compute_stopword_ratio("the cat", C.EN_STOPWORDS) == 0.5
    assert TN.compute_stopword_ratio("", C.EN_STOPWORDS) == 0.0
    assert TN.compute_stopword_ratio("xyzzy", C.EN_STOPWORDS) == 0.0


def test_strip_outer_brackets():
    assert TN.strip_outer_brackets("[music]") == "music"
    assert TN.strip_outer_brackets("[[music]]") == "music"
    assert TN.strip_outer_brackets("[ ( music ) ]") == "music"
    assert TN.strip_outer_brackets("[music") == "[music"
    assert TN.strip_outer_brackets("[a] and [b]") == "a] and [b"
    assert TN.strip_outer_brackets("<{[(x)]}>") == "x"


@pytest.mark.parametrize("t", ["Music", "[music]", "musique",
                               "♪", "[♪]", "[♫ OUTRO MUSIC PLAYING ♫]",
                               "♬ soft music ♬", "♪ musique ♪",
                               "background music only",
                               "( background music playing )"])
def test_music_only_true(t):
    # test_enfr_gate.py:204-249
    assert TN.is_music_only(t) is True


@pytest.mark.parametrize("t", ["", None, "   ", "music outro anthony playing",
                               "the quick brown fox", "[]", "[background]",
                               "background only"])
def test_music_only_false(t):
    # lang_gate.py:147-162 — non-filler residue must be pure keywords;
    # all-filler residue is NOT music-only
    assert TN.is_music_only(t) is False


def test_safe_probability():
    assert TN.safe_probability(0.5) == 0.5
    assert TN.safe_probability("0.25") == 0.25
    assert TN.safe_probability(None) == 0.0
    assert TN.safe_probability("abc") == 0.0


def test_truncate_to_words():
    # test_truncation.py:28-36
    text = "one two three four five six seven eight nine ten eleven twelve"
    assert TN.truncate_to_words(text) == \
        "one two three four five six seven eight nine ten ..."
    assert TN.truncate_to_words("short text") == "short text"
    assert TN.truncate_to_words("") == ""


def test_snippet_first_words():
    assert TN.snippet_first_words("a  b\tc\nd e f g h i j k l") == \
        "a b c d e f g h i j"
    assert TN.snippet_first_words("one two") == "one two"


def test_iso_codes():
    # test_languages.py / models/languages.py:15-28
    assert TN.to_iso_code("en", "iso639-2b") == "eng"
    assert TN.to_iso_code("fr", "iso639-2b") == "fre"
    assert TN.to_iso_code("fr", "iso639-2t") == "fra"
    assert TN.to_iso_code("fr", "iso639-3") == "fra"
    assert TN.to_iso_code("xx", "iso639-3") == "xx"  # passthrough
    assert TN.from_iso_code("fre", "iso639-2b") == "fr"
    assert TN.from_iso_code("fra", "iso639-2t") == "fr"
    assert TN.from_iso_code("zzz", "iso639-3") is None
    assert TN.get_language_label("en") == "English"
    assert TN.get_language_label("es") == "Es"  # .title() fallback


def test_html_roundtrip():
    for t in ["plain", "a < b & c > d", "it's \"quoted\"", "héllo ♪", ""]:
        assert TN.extract_text_from_html(TN.wrap_html(t, "title")) == t


def test_vad_clean():
    assert TN.vad_clean("[nav menu] real text (aside) here") == "real text here"
    assert TN.vad_clean("♪ hello ♪") == "music hello music"
    assert TN.vad_clean(None) == ""
    assert TN.vad_clean("  a   b  ") == "a b"


def test_strip_outer_brackets_depth_bound_shared():
    """Both twins bound peeling at BRACKET_STRIP_MAX_LAYERS: at depth 8 the
    core is fully exposed; at depth 9+ one residual layer remains in BOTH
    implementations (the documented deviation from the reference's
    unbounded loop, lang_gate.py:111-119)."""
    from langid_mr_spark import constants as C

    d = C.BRACKET_STRIP_MAX_LAYERS
    exact = "[" * d + "music" + "]" * d
    assert TN.strip_outer_brackets(exact) == "music"
    over = "[" * (d + 1) + "music" + "]" * (d + 1)
    assert TN.strip_outer_brackets(over) == "[music]"
    way_over = "(" * (d + 4) + " x " + ")" * (d + 4)
    assert TN.strip_outer_brackets(way_over) == "(" * 4 + " x " + ")" * 4
