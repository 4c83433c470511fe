"""IRI encoding/validation/skolem minting (SURVEY.md P5, E2)."""

import pyspark.sql.functions as F

from cow_spark.functions.iri import (
    iri_encode,
    iri_encode_py,
    is_valid_iri,
    is_valid_iri_py,
    skolem_iri,
    skolem_iri_py,
)


def test_encode_py():
    assert iri_encode_py("http://x/a b") == "http://x/a%20b"
    assert iri_encode_py('http://x/"q"') == "http://x/%22q%22"
    assert iri_encode_py("http://x/é") == "http://x/é"  # IRIs keep unicode
    assert iri_encode_py("http://x/a|b\\c^d`e{f}g") == (
        "http://x/a%7Cb%5Cc%5Ed%60e%7Bf%7Dg"
    )
    assert iri_encode_py("http://x/a%20b") == "http://x/a%20b"  # no double-enc


def test_valid_py():
    assert is_valid_iri_py("https://example.com/x")
    assert is_valid_iri_py("urn:uuid:abc")
    assert not is_valid_iri_py("no scheme here")
    assert not is_valid_iri_py("")


def test_encode_spark_matches_py(spark):
    vals = [
        "http://x/a b",
        'http://x/"q"\n',
        "http://x/é ü",
        "http://x/{tpl}|z",
        "plain",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [
        (r.e, r.ok)
        for r in df.select(
            iri_encode(F.col("v")).alias("e"),
            is_valid_iri(iri_encode(F.col("v"))).alias("ok"),
        ).collect()
    ]
    want = [(iri_encode_py(v), is_valid_iri_py(iri_encode_py(v))) for v in vals]
    assert got == want


def test_skolem_matches_py(spark):
    df = spark.createDataFrame([("c1", 3)], "conv_id string, turn_idx int")
    for alg in ("sha1", "md5"):
        got = df.select(
            skolem_iri(
                "https://x/mention",
                F.col("conv_id"),
                F.col("turn_idx").cast("string"),
                alg=alg,
            ).alias("s")
        ).first().s
        assert got == skolem_iri_py("https://x/mention", "c1", "3", alg=alg)
