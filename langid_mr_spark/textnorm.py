"""Pure-Python text-semantics spec, shared by fixtures, the row-at-a-time
oracle, and parity tests.

These functions define the EXACT string behavior the Spark expressions in
``functions/exprs.py`` must reproduce (Java-regex vs Python-regex parity is
asserted by tests/test_exprs.py). Reference citations: tokenizer
lang_gate.py:92-99, bracket strip lang_gate.py:111-119, music-only
lang_gate.py:122-162, truncation utils.py:53-60, snippet runner.py:108.
"""

from __future__ import annotations

import re

from . import constants as C

TOKEN_SPLIT_RE = re.compile(C.TOKEN_SPLIT_PY, re.UNICODE)
_WS_RE = re.compile(r"\s+", re.UNICODE)
_MUSIC_GLYPH_RE = re.compile("[" + "".join(C.MUSIC_UNICODE_MARKERS) + "]")
# VAD analog: strip bracketed boilerplate spans before the second scoring pass
_BRACKET_SPAN_RE = re.compile(r"\[[^\]]*\]|\([^)]*\)|\{[^}]*\}|<[^>]*>")


def tokenize_text(text: str | None) -> list[str]:
    """lang_gate.py:95-99 — lowercase, split on [^\\w']+, drop empties."""
    if not text:
        return []
    return [t for t in TOKEN_SPLIT_RE.split(text.lower()) if t]


def compute_stopword_ratio(text: str | None, stopwords: frozenset[str]) -> float:
    """lang_gate.py:102-108 — fraction of tokens in the set; 0.0 on empty."""
    tokens = tokenize_text(text)
    if not tokens:
        return 0.0
    return sum(1 for t in tokens if t in stopwords) / len(tokens)


def strip_outer_brackets(text: str) -> str:
    """lang_gate.py:111-119 — peel matching outer bracket layers + strip.

    Documented deviation: the reference loops to fixpoint; this twin is
    bounded at BRACKET_STRIP_MAX_LAYERS, the SAME bound as the unrolled
    Spark expression (exprs.strip_outer_brackets), so the two twins agree
    at every nesting depth — including pathological ≥9-layer inputs, where
    both leave the residual layers in place."""
    stripped = text
    for _ in range(C.BRACKET_STRIP_MAX_LAYERS):
        if not (len(stripped) >= 2 and stripped[0] in C.BRACKET_PAIRS
                and stripped[-1] == C.BRACKET_PAIRS[stripped[0]]):
            break
        stripped = stripped[1:-1].strip()
    return stripped


def expand_music_glyphs(text: str) -> str:
    """lang_gate.py:131-134 — each unicode music marker → ' music '."""
    return _MUSIC_GLYPH_RE.sub(" music ", text)


def is_music_only(text: str | None) -> bool:
    """lang_gate.py:122-162 — webtext reading: boilerplate-only page."""
    if text is None:
        return False
    working = text.strip()
    if not working:
        return False
    working = expand_music_glyphs(working)
    working = strip_outer_brackets(working.lower())
    if not working:
        return False
    tokens = tokenize_text(working)
    if not tokens:
        return False
    kw, fillers = C.MUSIC_KEYWORDS, C.MUSIC_FILLER_TOKENS
    if not all(t in kw or t in fillers for t in tokens):
        return False
    filtered = [t for t in tokens if t not in fillers]
    if not filtered:
        return False
    # Reference's two tail branches (len<=2 all-kw; any-length all-kw) both
    # reduce to "residue is all keywords", which is implied here because
    # filtered ⊆ kw∪fillers minus fillers = kw.  Kept explicit for parity.
    return all(t in kw for t in filtered)


def safe_probability(value) -> float:
    """lang_gate.py:165-169."""
    try:
        return float(value)
    except (TypeError, ValueError):
        return 0.0


def truncate_to_words(text: str, max_words: int = 10) -> str:
    """utils.py:53-60 — whitespace-split; ellipsis only when truncated."""
    words = text.split()
    if len(words) > max_words:
        return " ".join(words[:max_words]) + " ..."
    return text


def snippet_first_words(text: str, n: int = 10) -> str:
    """runner.py:108 — first n whitespace-split words, single-space joined."""
    return " ".join(text.split()[:n])


def vad_clean(text: str | None) -> str:
    """Webtext analog of the VAD-filtered second pass (lang_gate.py:458):
    drop bracketed boilerplate spans + music glyphs, collapse whitespace."""
    if not text:
        return ""
    working = _BRACKET_SPAN_RE.sub(" ", text)
    working = expand_music_glyphs(working)
    return _WS_RE.sub(" ", working).strip()


def probe(text: str | None) -> str:
    """lang_gate.py:215-220 analog — bounded prefix of the document."""
    return (text or "")[: C.PROBE_CHARS]


def snippet_window(text: str | None) -> str:
    """runner.py:27,94-95 analog — bounded prefix for the snippet pass."""
    return (text or "")[: C.SNIPPET_CHARS]


# --- HTML round-trip (fixtures escape; extraction inverts it exactly) -------

_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;"), ("'", "&#x27;")]


def html_escape(text: str) -> str:
    for raw, esc in _ESCAPES:
        text = text.replace(raw, esc)
    return text


def html_unescape(text: str) -> str:
    for raw, esc in reversed(_ESCAPES):
        text = text.replace(esc, raw)
    return text


def wrap_html(text: str, title: str = "") -> bytes:
    """Fixture page layout (FIXTURES.md §1)."""
    return (
        f"<html><head><title>{html_escape(title)}</title></head>"
        f"<body><p>{html_escape(text)}</p></body></html>"
    ).encode("utf-8")


_P_SPAN_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)


def extract_text_from_html(html: bytes | None) -> str:
    """S4 analog (audio_io.load_audio_mono_16k): html payload → canonical
    text, byte-identical to the `text` column (input_hint invariant)."""
    if html is None:
        return ""
    decoded = html.decode("utf-8", errors="replace")
    m = _P_SPAN_RE.search(decoded)
    return html_unescape(m.group(1)) if m else ""


# --- ISO language-code mapping (models/languages.py:35-65) -------------------

def to_iso_code(canonical: str, fmt: str) -> str:
    entry = C.ISO_MAPPING.get((canonical or "").lower())
    if entry is None or fmt not in entry:
        return canonical
    return entry[fmt]


def from_iso_code(code: str, fmt: str) -> str | None:
    code = (code or "").lower()
    for lang, formats in C.ISO_MAPPING.items():
        if formats.get(fmt) == code:
            return lang
    return None


def get_language_label(canonical: str) -> str:
    low = (canonical or "").lower()
    return C.LANGUAGE_LABELS.get(low, (canonical or "").title())
