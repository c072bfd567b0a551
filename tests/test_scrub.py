"""PII/toxicity scrub: Java-vs-Python byte parity + golden cases."""

from pyspark.sql import functions as F

from langid_mr_spark import scrub

CASES = [
    "contact alice@example.com for details",
    "call +1-555-0100 or 555 010 0100 now",
    "server at 192.168.0.1 and 10.0.0.255 responded",
    "a.b+c_d%e@sub.domain.co.uk mixed with text",
    "version 1.2.3.4.5 is not an ip",
    "year 2024-01-01 is a date not a phone",
    "what the shit and MERDE said Fucking loudly",
    "class shitake is not profane, nor is scrapping",
    "edge: alice@example.com,+33 123 4567,8.8.8.8",
    "",
    "no pii here at all",
    "unicode café ♪ and alice@exämple.com stays partial",
]


def test_python_golden():
    assert scrub.scrub_text("contact alice@example.com now") == \
        "contact <EMAIL> now"
    assert scrub.scrub_text("call +1-555-0100 today") == "call <PHONE> today"
    assert scrub.scrub_text("host 192.168.0.1 up") == "host <IP> up"
    assert scrub.scrub_text("oh shit SHIT Shit") == "oh <TOX> <TOX> <TOX>"
    assert scrub.scrub_text("shitake mushrooms") == "shitake mushrooms"
    assert scrub.scrub_text("1.2.3.4.5") == "1.2.3.4.5"  # not an IPv4


def test_spark_python_byte_parity(spark):
    df = spark.createDataFrame([(t,) for t in CASES], ["t"])
    got = [r["out"] for r in
           df.select(scrub.scrub_col(F.col("t")).alias("out")).collect()]
    want = [scrub.scrub_text(t) for t in CASES]
    assert got == want


def test_order_email_before_phone_and_ip():
    # an email containing digits+dots must be scrubbed as ONE email
    s = scrub.scrub_text("x 1.2.3.4@example.com y")
    assert s == "x <EMAIL> y"
