"""Column-level expression library (native Spark SQL — whole-stage codegen).

Each helper is the JVM-side twin of a function in ``langid_mr_spark.textnorm``
(the pure-Python spec); tests/test_exprs.py asserts exact parity on an
adversarial string corpus. Reference citations are on the Python twins.

Design note: everything here is built from pyspark.sql.functions so Catalyst
keeps the whole per-document heuristic stage inside WholeStageCodegen — the
only Python round-trips in the pipeline are the model-scoring UDFs
(scoring.py), mirroring the reference where the model is the only non-trivial
per-document cost (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import constants as C

# --- literals ----------------------------------------------------------------

def _lit_array(words) -> Column:
    # built lazily: Column construction requires an active SparkContext
    return F.array(*[F.lit(w) for w in sorted(words)])
_MUSIC_GLYPH_CLASS = "[" + "".join(C.MUSIC_UNICODE_MARKERS) + "]"
# Java regex needs (?U) for unicode-aware \s (Python re is unicode by default)
_WS = r"(?U)\s+"
_TRIM_RE = r"(?U)^\s+|\s+$"


def _ustrip(col: Column) -> Column:
    """Python str.strip() twin — unicode whitespace both ends."""
    return F.regexp_replace(col, _TRIM_RE, "")


# --- X1 tokenize / X2 stopword ratio ----------------------------------------

def tokenize(col: Column) -> Column:
    """array<string> of lowercase tokens (twin: textnorm.tokenize_text)."""
    return F.filter(
        F.split(F.lower(col), C.TOKEN_SPLIT_JAVA), lambda t: t != F.lit("")
    )


def token_count(tokens: Column) -> Column:
    return F.size(tokens)


def stopword_hits(tokens: Column, lang: str) -> Column:
    """A12 — count of tokens in the language's stopword set.

    Membership via ``isin`` so Catalyst compiles the 60-word set to an
    O(1)-lookup InSet instead of a linear array_contains scan per token."""
    sw = sorted(C.EN_STOPWORDS if lang == "en" else C.FR_STOPWORDS)
    return F.size(F.filter(tokens, lambda t: t.isin(*sw)))


def stopword_ratio(tokens: Column, lang: str) -> Column:
    """twin: textnorm.compute_stopword_ratio (0.0 on empty token list)."""
    n = F.size(tokens)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_hits(tokens, lang) / n.cast("double")
    )


# --- X3/X4/X5 music-only (boilerplate-only page) ------------------------------

def expand_music_glyphs(col: Column) -> Column:
    return F.regexp_replace(col, _MUSIC_GLYPH_CLASS, " music ")


def _strip_one_bracket_layer(col: Column) -> Column:
    """One peel: whole-string-anchored '<open> inner <close>' → trimmed inner.

    One regexp_replace per bracket type keeps the expression tree LINEAR in
    the number of layers (a when/otherwise formulation would reference the
    previous layer's subtree ~6×, i.e. exponential tree growth). At most one
    anchored pattern can match per application, so sequential replaces are
    equivalent to the reference's first-char dispatch."""
    out = col
    for o, c in C.BRACKET_PAIRS.items():
        out = F.regexp_replace(out, f"(?sU)^\\{o}\\s*(.*?)\\s*\\{c}$", "$1")
    return out


def strip_outer_brackets(col: Column) -> Column:
    """twin: textnorm.strip_outer_brackets, unrolled to
    BRACKET_STRIP_MAX_LAYERS layers (the reference loops unboundedly;
    fixtures stay within the unroll depth — constants.py).

    Guarded by a first-character check: for the overwhelming majority of
    documents (no leading bracket) the peel is a no-op, and CaseWhen's lazy
    branch evaluation skips all 32 regexp_replace allocations — without the
    guard every document pays ~32 intermediate-string allocations, which at
    32 threads turns into GC pressure that caps scaling."""
    out = col
    for _ in range(C.BRACKET_STRIP_MAX_LAYERS):
        out = _strip_one_bracket_layer(out)
    openers = sorted(C.BRACKET_PAIRS)
    return F.when(F.substring(col, 1, 1).isin(*openers), out).otherwise(col)


def is_music_only(col: Column) -> Column:
    """twin: textnorm.is_music_only (lang_gate.py:122-162 semantics).

    Wrapped in an exact necessary-condition guard: a music-only verdict
    requires a residue token ∈ {music, musique}, which post-glyph-expansion
    implies the raw text contains "musi" (case-insensitive) or a music
    glyph. Docs failing the guard skip the whole tokenize/HOF chain
    (CaseWhen branches evaluate lazily per row)."""
    guard = col.rlike("(?iu)musi|[" + "".join(C.MUSIC_UNICODE_MARKERS) + "]")
    return F.when(guard, _is_music_only_full(col)).otherwise(F.lit(False))


def _is_music_only_full(col: Column) -> Column:
    """r06 exactly-once rewrite — same boolean as textnorm.is_music_only
    (parity-asserted by tests/test_exprs.py), restructured because a Column
    expression cannot alias its own subtrees and lambda-bearing expressions
    are excluded from codegen subexpression elimination, so the previous
    formulation re-evaluated the bracket-strip chain (32 regexp_replace) 5×
    and the tokenizer 4× per guarded row (measured: 160 strip regexes in
    the pipeline plan; the pass-1 plan now carries ZERO).

    Two equivalence-preserving reductions, then a single-pass fold:

    1. ``strip_outer_brackets`` is dropped: it only ever removes bracket
       characters and surrounding whitespace, both of which are token
       DELIMITERS for ``tokenize`` ([^\\w']+ splits), so the token array of
       the stripped string equals that of the unstripped string; and its
       companion ``working != ""`` conjunct is subsumed — a working string
       that strips to empty has no tokens, so ``size(tokens) > 0`` already
       rejects it. (Verified: 0 mismatches over the 600k-doc bench corpus.)
    2. ``residue_all_kw`` (every non-filler token is a keyword) is implied
       by ``all_kw_or_filler`` (every token ∈ kw ∪ fillers): a token that
       is in kw ∪ fillers and not in fillers is in kw.
    3. The ``working0 != ""`` / ``working != ""`` conjuncts and the
       whitespace trim are subsumed the same way: a trimmed-empty or
       stripped-empty string has no tokens, and trimming (like lowering —
       ``tokenize`` lowers internally, and glyph expansion commutes with
       both) never changes the token array.

    What remains — non-null ∧ tokens nonempty ∧ all tokens ∈ kw∪fillers ∧
    some token ∉ fillers — folds into ONE `aggregate` pass over one
    tokenize, with a primitive (token-count, all-kw-or-filler,
    residue-count) struct as the accumulator."""
    kw_filler = sorted(C.MUSIC_KEYWORDS | C.MUSIC_FILLER_TOKENS)
    fillers = sorted(C.MUSIC_FILLER_TOKENS)
    tokens = tokenize(expand_music_glyphs(col))
    verdict = F.aggregate(
        tokens,
        F.struct(F.lit(0).alias("n"), F.lit(True).alias("allk"),
                 F.lit(0).alias("nres")),
        lambda a, t: F.struct(
            (a["n"] + 1).alias("n"),
            (a["allk"] & t.isin(*kw_filler)).alias("allk"),
            (a["nres"] + F.when(t.isin(*fillers), 0).otherwise(1))
            .alias("nres"),
        ),
        lambda a: (a["n"] > 0) & a["allk"] & (a["nres"] > 0),
    )
    return col.isNotNull() & verdict


# --- X6 safe probability ------------------------------------------------------

def safe_probability(col: Column) -> Column:
    return F.coalesce(col.try_cast("double"), F.lit(0.0))


# --- X7/X8 truncation & snippet ------------------------------------------------

def _ws_words(col: Column) -> Column:
    """Python str.split() twin: split on unicode whitespace, drop empties."""
    return F.filter(F.split(col, _WS), lambda w: w != F.lit(""))


def ws_words(col: Column) -> Column:
    """Public staging handle for the whitespace-word split (r06): data
    paths materialize this once and use ``truncate_from_words``."""
    return _ws_words(col)


def truncate_from_words(words: Column, original: Column,
                        max_words: int = 10) -> Column:
    """truncate_to_words over a pre-materialized word array (r06 staged
    form — the Column-only form splits the text twice per row)."""
    return F.when(
        F.size(words) > max_words,
        F.concat(F.array_join(F.slice(words, 1, max_words), " "),
                 F.lit(" ...")),
    ).otherwise(original)


def truncate_to_words(col: Column, max_words: int = 10) -> Column:
    """twin: textnorm.truncate_to_words (utils.py:53-60)."""
    return truncate_from_words(_ws_words(col), col, max_words)


def snippet_first_words(col: Column, n: int = 10) -> Column:
    """twin: textnorm.snippet_first_words (runner.py:108)."""
    return F.array_join(F.slice(_ws_words(col), 1, n), " ")


# --- X9 ISO code mapping --------------------------------------------------------

def to_iso_code(col: Column, fmt: str) -> Column:
    """twin: textnorm.to_iso_code — unknown codes pass through."""
    mapping = F.create_map(
        *[F.lit(x) for lang, fmts in C.ISO_MAPPING.items() for x in (lang, fmts[fmt])]
    )
    return F.coalesce(F.element_at(mapping, F.lower(col)), col)


def from_iso_code(col: Column, fmt: str) -> Column:
    """twin: textnorm.from_iso_code — NULL when not found."""
    mapping = F.create_map(
        *[F.lit(x) for lang, fmts in C.ISO_MAPPING.items() for x in (fmts[fmt], lang)]
    )
    return F.element_at(mapping, F.lower(col))


def language_label(col: Column) -> Column:
    """twin: textnorm.get_language_label — .title() fallback."""
    mapping = F.create_map(
        *[F.lit(x) for lang, lab in C.LANGUAGE_LABELS.items() for x in (lang, lab)]
    )
    return F.coalesce(F.element_at(mapping, F.lower(col)), F.initcap(col))


# --- X14 mean logprob with sentinel ----------------------------------------------

def mean_logprob(arr: Column) -> Column:
    """lang_gate.py:244-245 — mean of array; −99.0 when empty/null."""
    return F.when(
        arr.isNull() | (F.size(arr) == 0), F.lit(C.EMPTY_LOGPROB_SENTINEL)
    ).otherwise(
        F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / F.size(arr)
    )


# --- X15 argmax over {en, fr} (ties → en: Python max() insertion order) -----------

def argmax_en_fr(score_en: Column, score_fr: Column) -> Column:
    return F.when(score_en >= score_fr, F.lit("en")).otherwise(F.lit("fr"))


# --- X18 whitespace/VAD-clean normalization ---------------------------------------

def vad_clean(col: Column) -> Column:
    """twin: textnorm.vad_clean — drop bracketed spans + glyphs, collapse ws."""
    spans = r"\[[^\]]*\]|\([^)]*\)|\{[^}]*\}|<[^>]*>"
    working = F.regexp_replace(col, spans, " ")
    working = expand_music_glyphs(working)
    return _ustrip(F.regexp_replace(working, _WS, " "))


# --- X19/X20 bounded prefixes ------------------------------------------------------

def probe(col: Column) -> Column:
    return F.substring(F.coalesce(col, F.lit("")), 1, C.PROBE_CHARS)


def snippet_window(col: Column) -> Column:
    return F.substring(F.coalesce(col, F.lit("")), 1, C.SNIPPET_CHARS)
