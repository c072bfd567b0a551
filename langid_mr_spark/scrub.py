"""Regex-based PII/toxicity scrubbing (north_star / SURVEY.md §2.3 X21).

The reference's analog is the snippet/text packaging step (runner.py:85-127);
the north rule upgrades it to a PII + toxicity scrub whose output must be
byte-identical between the Spark pipeline and the pure-Python oracle.

One ordered rule table drives both implementations. Patterns use only
dialect-portable constructs (ASCII classes, fixed-width lookaround, (?i)) so
Java `regexp_replace` and Python `re.sub` agree byte-for-byte — asserted by
tests/test_scrub.py over adversarial inputs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Placeholder toxicity lexicon — the mechanism (ordered token-boundary regex
# replacement) is the deliverable; deployments swap in their own lexicon.
_TOX_WORDS = (
    "shit", "fuck", "fucking", "bitch", "bastard", "asshole",
    "merde", "putain", "connard", "salope",
)

# Ordered: emails first (their digits/dots must not feed the IP/phone rules),
# then IPs (dotted quads would otherwise half-match the phone rule), then
# phones, then the toxicity lexicon.
SCRUB_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"(?<![0-9.])(?:[0-9]{1,3}\.){3}[0-9]{1,3}(?![0-9.])", "<IP>"),
    (
        "phone",
        r"(?<![0-9])\+?[0-9]{1,3}[-. ][0-9]{3,4}[-. ][0-9]{3,4}"
        r"(?:[-. ][0-9]{2,4})?(?![0-9])",
        "<PHONE>",
    ),
    (
        "tox",
        r"(?i)(?<![A-Za-z])(?:" + "|".join(_TOX_WORDS) + r")(?![A-Za-z])",
        "<TOX>",
    ),
)

_COMPILED = [(re.compile(p), r) for _, p, r in SCRUB_RULES]


def scrub_text(text: str) -> str:
    """Pure-Python twin (oracle spec)."""
    for pat, repl in _COMPILED:
        text = pat.sub(repl, text)
    return text


def scrub_col(col: Column) -> Column:
    """Native Spark chain — stays inside WholeStageCodegen."""
    out = col
    for _, pattern, repl in SCRUB_RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out
