"""DuckDB-oracle ↔ Spark parity on the fragile corners.

Round-1 advice: the oracles' RE2 '\\w'/'\\s' are ASCII-only while Spark uses
Java (?U) classes — parity held only because the fixture corpus was pure
ASCII. The oracles now use explicit \\p{L}/\\p{Nd}/White_Space classes;
these tests pin the equivalence on accented FR text, unicode whitespace,
and the scrub guards, so a divergence fails loudly here instead of
surfacing as a silent driver-gate hash mismatch.
"""

import importlib.util
import sys
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from langid_mr_spark import scrub  # noqa: E402
from langid_mr_spark.functions import exprs as X  # noqa: E402


@pytest.fixture(scope="module")
def em():
    spec = importlib.util.spec_from_file_location(
        "entrymod", Path(__file__).resolve().parents[1] / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# accented FR, apostrophes, unicode whitespace (NBSP, EM SPACE), digits,
# underscore, mixed-case accents — the characters RE2 \w/\s get wrong
ADVERSARIAL = [
    (1, "le cinéma français est très beau aujourd'hui"),
    (2, "Ça va? Très bien — merci!"),
    (3, "mot1_mot2 naïve sœur ÉLÈVE déjà"),
    (4, "nbsp\u00a0entre les\u2003mots et\u2028lignes"),
    (5, "English text with the and of tokens"),
    (6, ""),
    (7, "   "),
    (8, "l'été où j'irai: 42 châteaux"),
]


@pytest.fixture(scope="module")
def duck(em):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", ADVERSARIAL)
    return con


def test_tokenizer_sql_matches_spark_on_accents(spark, em, duck):
    got = {
        r[0]: r[1]
        for r in duck.execute(
            f"SELECT doc_id, {em._TOKENIZE_SQL} FROM documents").fetchall()
    }
    df = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    want = {
        r["doc_id"]: r["toks"]
        for r in df.select("doc_id",
                           X.tokenize(F.col("text")).alias("toks")).collect()
    }
    assert got == want


def test_ws_split_sql_matches_spark_on_unicode_ws(spark, em, duck):
    got = {
        r[0]: r[1]
        for r in duck.execute(
            "SELECT doc_id, list_filter(regexp_split_to_array(text, "
            f"'{em._WS_RE}'), x -> x <> '') FROM documents").fetchall()
    }
    df = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    want = {
        r["doc_id"]: r["w"]
        for r in df.select(
            "doc_id", X._ws_words(F.col("text")).alias("w")).collect()
    }
    assert got == want


# strings that exercise every SCRUB_RULES guard the old hand-written oracle
# dropped: IP lookarounds (dotted version numbers), the phone third group,
# the full toxicity lexicon
SCRUB_CASES = [
    (1, "version 10.1.2.3.4 build seven"),        # guarded: NOT an IP
    (2, "host at 10.1.2.3 port"),                  # real IP
    (3, "call +1 555 0100 now"),                   # phone, 2 groups
    (4, "call 01 23 45 67 89 ok"),                 # phone w/ third group
    (5, "order #123456789 qty 4"),                 # digits, no separator hit
    (6, "quel connard ce type"),                   # FR toxicity word
    (7, "scunthorpe classic bassoon"),             # tox substrings inside words
    (8, "mail a.b+c@ex-ample.org now"),            # email
    (9, "totally clean text here"),
]


def test_scrub_detector_equals_python_twin(em, duck):
    duck.execute("CREATE OR REPLACE TABLE documents "
                 "(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO documents VALUES (?, ?)", SCRUB_CASES)
    got = dict(duck.execute(em._scrub_detector_sql()).fetchall())
    for i, text in SCRUB_CASES:
        assert got[i] == (scrub.scrub_text(text) == text), (i, text)


def test_scrub_translator_rejects_unknown_lookaround(em):
    with pytest.raises(ValueError):
        em._re2_detector(r"(?<=abc)x")


def test_top50_avg_duration_semantics(spark, em):
    """A4 parity nuances (main.py:283-312): JSON duration preferred over
    the fallback value column; empty input yields 0.0, not NULL."""
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", '{"duration": 7.5}', 1.0),
         (2, "2024-01-02 00:00:00", '{"k": 3}', 2.0)],
        "event_id long, ts string, props string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = em.top_recent_avg_duration(ev).collect()[0]
    assert got["avg_duration"] == round((7.5 + 2.0) / 2, 2)
    empty = em.top_recent_avg_duration(ev.filter(F.lit(False))).collect()[0]
    assert empty["avg_duration"] == 0.0


def test_binary_metadata_decode_contract(spark, em):
    """Round-5 fold (verdict ask #3): the REAL pixel/PCM decoders run
    under the exact driver compare — Spark decode md5s vs the
    encode-side ground-truth columns in the fixtures_mm parquet, plus
    the documents sniff half, normalized the way the driver hashes rows
    (repr per value, columns sorted by name)."""
    sf = "/root/testdata/sf0.001"
    sdf = em.queries()["binary_metadata"](spark, sf)
    srows = [r.asDict() for r in sdf.collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    cur = con.execute(em.oracle_sql()["binary_metadata"])
    cols = [d[0] for d in cur.description]
    orows = [dict(zip(cols, r)) for r in cur.fetchall()]

    def norm(rows):
        return sorted(tuple(repr(d[c]) for c in sorted(d)) for d in rows)

    assert len(srows) == len(orows)
    assert sorted(srows[0]) == sorted(orows[0])
    assert norm(srows) == norm(orows)
    # the decode half must really contain both green and poison rows
    fx = [d for d in srows if d["src"] == "fixture"]
    assert sum(1 for d in fx if d["decode_ok"] is True) == 10
    assert sum(1 for d in fx if d["decode_ok"] is False) == 4
    for d in fx:
        if d["decode_ok"] is False:  # D5: poison rows, all metrics NULL
            assert d["content_md5"] is None and d["width"] is None
            assert d["rate"] is None and d["n_frames"] is None
