"""Semantic constants carried over from the reference.

Every threshold, lexicon, and label below defines WHAT the pipeline computes;
they are data, not code. Citations point into /root/reference (snapshot of
cisco7507/LangId-mr) so parity can be audited line by line.

The audio→webtext unit mapping (see SURVEY.md §1.2, BASELINE.json input_hint):
one audio clip ≙ one web page; the 30 s probe ≙ the first PROBE_CHARS of the
extracted text; the 15 s snippet ≙ the first SNIPPET_CHARS.
"""

from __future__ import annotations

# --- Probe / snippet work bounds -------------------------------------------
# Reference: PROBE_DURATION_S=30 @ 16 kHz (lang_gate.py:12-13), snippet 15 s
# (worker/runner.py:27).  Webtext analog: bounded character prefixes so
# per-document work stays O(1) regardless of document length.
PROBE_CHARS = 4000
SNIPPET_CHARS = 2000

# --- Stopword lexicons (lang_gate.py:15-50) --------------------------------
EN_STOPWORDS = frozenset({
    "the", "and", "to", "of", "in", "you", "your", "for", "is", "on",
    "it", "that", "with", "this", "as", "at", "be", "are", "we", "our", "us",
    "a", "an", "if", "but", "or", "so", "from", "by", "about", "into",
    "over", "up", "down", "out", "not", "no", "yes",
    "i", "me", "my", "mine", "they", "them", "their", "theirs",
    "these", "those", "here", "there", "where", "when",
    "now", "today", "only", "more", "less", "new", "save", "sale",
    "free", "off", "extra", "plus",
})

FR_STOPWORDS = frozenset({
    "le", "la", "les", "un", "une", "des", "et", "ou", "mais", "que",
    "qui", "pour", "avec", "sur", "pas", "ce", "cette", "est", "sont",
    "je", "tu", "il", "elle", "nous", "vous", "ils", "elles",
    "de", "du", "au", "aux", "en", "dans", "par", "sous", "sans",
    "plus", "moins", "ne", "ni",
    "on", "toi", "moi", "lui", "leur", "leurs",
    "ces", "ceci", "cela", "ça", "ici", "là",
    "maintenant", "aujourd'hui", "seulement", "nouveau", "nouvelle",
    "offre", "gratuit", "gratuite", "réduction", "promo", "soldes",
})

# --- Music / boilerplate-only detection (lang_gate.py:52-81) ---------------
# Webtext reading: pages whose visible text is nothing but a music/boilerplate
# marker ("[music]", "♪ musique ♪") carry no language signal and are dropped.
MUSIC_KEYWORDS = frozenset({"music", "musique"})
MUSIC_UNICODE_MARKERS = ("♪", "♫", "♩", "♬", "♭", "♯")
MUSIC_FILLER_TOKENS = frozenset({
    "background", "bg", "only", "instrumental", "ambience", "ambiance",
    "ambient", "soundtrack", "track", "outro", "intro", "playing", "play",
    "song", "soft", "theme", "jingle", "de", "du", "fond",
})
BRACKET_PAIRS = {"[": "]", "(": ")", "{": "}", "<": ">"}
# The reference strips outer bracket layers in an unbounded loop
# (lang_gate.py:111-119).  The native Spark expression unrolls a fixed number
# of layers; fixtures never exceed this and the pandas-UDF oracle matches.
BRACKET_STRIP_MAX_LAYERS = 8

# --- Gate thresholds (lang_gate.py:83-90, config.py:49-51) ------------------
MID_LOWER = 0.60
MID_UPPER = 0.79
MID_EN_MIN_STOPWORD_RATIO = 0.15
MID_FR_MIN_STOPWORD_RATIO = 0.15
STOPWORD_MARGIN = 0.05
MIN_TOKENS_FOR_HEURISTIC = 10
MIN_TOKENS_FOR_SPEECH = 6
MIN_STOPWORD_FOR_SPEECH = 0.10
LANG_DETECT_MIN_PROB = 0.60
ALLOWED_LANGS = frozenset({"en", "fr"})
ENFR_STRICT_REJECT = False

# --- Tokenizer (lang_gate.py:92) --------------------------------------------
# Python: re.compile(r"[^\w']+", re.UNICODE).  Java regex needs the (?U) flag
# for a unicode-aware \w; parity is asserted by tests/test_exprs.py.
TOKEN_SPLIT_PY = r"[^\w']+"
TOKEN_SPLIT_JAVA = r"(?U)[^\w']+"

# --- Decision labels (verbatim; lang_gate.py:346,375,418,447,482,505,540) ---
DECISION_MUSIC_ONLY = "NO_SPEECH_MUSIC_ONLY"
DECISION_HIGH_CONF = "accepted_high_conf"
DECISION_MID_EN = "accepted_mid_zone_en"
DECISION_MID_FR = "accepted_mid_zone_fr"
DECISION_VAD_RETRY = "vad_retry"
DECISION_FALLBACK = "fallback"
DECISION_STRICT_REJECT = "strict_reject"  # C7 error row (lang_gate.py:527-531)
DECISION_ERROR = "error"  # poison row: scorer threw (D5, runner.py:192-199)

KEEP_DECISIONS = frozenset({
    DECISION_HIGH_CONF, DECISION_MID_EN, DECISION_MID_FR,
    DECISION_VAD_RETRY, DECISION_FALLBACK,
})

# Detection methods (lang_gate.py:345,374,481,504,539)
METHOD_AUTODETECT = "autodetect"
METHOD_AUTODETECT_VAD = "autodetect-vad"
METHOD_FALLBACK = "fallback"

# Drop reasons (ours; SURVEY.md §2.5 keep/drop projection)
DROP_MUSIC_ONLY = "music_only"
DROP_NON_ENFR_STRICT = "non_en_fr_strict"
DROP_INVALID_INPUT = "invalid_input"
DROP_ERROR = "error"

# --- Gate-path taxonomy (gate_metrics.py:16-32) ------------------------------
GATE_PATH_HIGH_CONF = "high_conf_base"
GATE_PATH_MID_ZONE_EN = "mid_zone_en"
GATE_PATH_MID_ZONE_FR = "mid_zone_fr"
GATE_PATH_VAD_RETRY = "vad_retry"
GATE_PATH_MUSIC_ONLY = "music_only"
GATE_PATH_FALLBACK = "fallback"
GATE_PATH_UNKNOWN = "unknown"

# Pipeline modes (gate_metrics.py:37-42)
PIPELINE_MODE_BASE = "BASE"
PIPELINE_MODE_VAD = "VAD"
PIPELINE_MODE_MID_ZONE = "MID_ZONE"
PIPELINE_MODE_MUSIC_ONLY = "MUSIC_ONLY"
PIPELINE_MODE_FALLBACK = "FALLBACK"
PIPELINE_MODE_UNKNOWN = "UNKNOWN"

# --- ISO language code mapping (models/languages.py:15-33) -------------------
ISO_FORMATS = ("iso639-1", "iso639-2b", "iso639-2t", "iso639-3")
ISO_MAPPING = {
    "en": {"iso639-1": "en", "iso639-2b": "eng", "iso639-2t": "eng", "iso639-3": "eng"},
    "fr": {"iso639-1": "fr", "iso639-2b": "fre", "iso639-2t": "fra", "iso639-3": "fra"},
}
LANGUAGE_LABELS = {"en": "English", "fr": "French"}

# --- Ingest validation (config.py:39-44, utils.py:13-18) --------------------
# Webtext analog of the 100 MB upload cap: bound on len(html).
MAX_DOC_BYTES = 100 * 1024 * 1024

# --- Fallback perplexity sentinel (lang_gate.py:244-245) --------------------
EMPTY_LOGPROB_SENTINEL = -99.0

# --- Retry budget (config.py:42, runner.py:192-199) --------------------------
MAX_RETRIES = 3
