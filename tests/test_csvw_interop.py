"""Interop: run the reference's OWN example (imf_gdppc, docs/index.rst
:170-307) through the engine using its unmodified CSVW metadata format,
and check the assertion triples against the documented golden output
(docs/index.rst:400-432).

One deliberate delta vs the doc: the doc's predicate prefix
(https://iisg.amsterdam/vocab/) predates the current snapshot, which
rebases sdv from the metadata @base (csvw.py:217-223) — so predicates
here are <@base>vocab/<column>, exactly what the snapshot emits today.
"""

import pyspark.sql.functions as F

from cow_spark import oracle
from cow_spark.operators.extract import extract_quads
from cow_spark.sources.csv_source import read_csv, with_row_index
from cow_spark.spec.mapping import MappingSpec

from tests.test_extract import quad_triples

IMF_CSV = """Rank;Country;GDP_Per_Capita
1;Qatar;131,063
2;Luxembourg;104,906
3;Macau;96,832
4;Singapore;90,249
5;Brunei Darussalam;83,513
6;Kuwait;72,675
7;Ireland;72,524
8;Norway;70,645
"""

# the reference's build-mode metadata, verbatim shape (docs/index.rst:193-307,
# boilerplate dc:/dcat: keys trimmed — the engine ignores them either way)
IMF_METADATA = {
    "dialect": {"quoteChar": '"', "delimiter": ";", "encoding": "ascii"},
    "url": "imf_gdppc.csv",
    "@context": [
        "http://csvw.clariah-sdh.eculture.labs.vu.nl/csvw.json",
        {"@base": "http://example.com/resource/", "@language": "en"},
        {
            "xsd": "http://www.w3.org/2001/XMLSchema#",
            "sdv": "http://example.com/resource/vocab/",
            "sdr": "http://example.com/resource/",
        },
    ],
    "@id": "http://example.com/resource/imf_gdppc.csv",
    "tableSchema": {
        "aboutUrl": "{_row}",
        "primaryKey": "Rank",
        "columns": [
            {
                "datatype": "string",
                "@id": f"http://example.com/resource/imf_gdppc.csv/column/{c}",
                "name": c,
                "titles": [c],
            }
            for c in ["Rank", "Country", "GDP_Per_Capita"]
        ],
    },
}

XSD_STR = "http://www.w3.org/2001/XMLSchema#string"
DATA = [
    ("1", "Qatar", "131,063"),
    ("2", "Luxembourg", "104,906"),
    ("3", "Macau", "96,832"),
    ("4", "Singapore", "90,249"),
    ("5", "Brunei Darussalam", "83,513"),
    ("6", "Kuwait", "72,675"),
    ("7", "Ireland", "72,524"),
    ("8", "Norway", "70,645"),
]


def expected_golden() -> set[tuple[str, str, str]]:
    """Assertion triples transcribed from docs/index.rst:400-432 (subjects
    resource/0..7, typed xsd:string literals), predicates per the current
    snapshot's sdv rebase."""
    out = set()
    for i, (rank, country, gdp) in enumerate(DATA):
        s = f"http://example.com/resource/{i}"
        for col, v in [("Rank", rank), ("Country", country),
                       ("GDP_Per_Capita", gdp)]:
            out.add((s, f"http://example.com/resource/vocab/{col}",
                     f'"{v}"^^<{XSD_STR}>'))
    return out


def test_reference_example_golden(spark, tmp_path):
    csv_path = str(tmp_path / "imf_gdppc.csv")
    with open(csv_path, "w", encoding="ascii") as f:
        f.write(IMF_CSV)

    spec = MappingSpec.from_csvw_json(IMF_METADATA)
    assert spec.dialect["delimiter"] == ";"
    spec.validate(["Rank", "Country", "GDP_Per_Capita"])

    df = read_csv(spark, csv_path, delimiter=spec.dialect["delimiter"],
                  quotechar=spec.dialect["quoteChar"])
    df = with_row_index(df, order_by=["Rank"])  # file order == Rank order

    got = quad_triples(extract_quads(df, spec))
    golden = expected_golden()
    assert golden <= got, f"missing: {sorted(golden - got)[:4]}"
    # the only extras are the 3 column-provenance triples (csvw.py:548-549)
    extras = got - golden
    assert len(extras) == 3
    assert all(p.endswith("wasDerivedFrom") for _, p, _ in extras)

    # cross-check against the reference-semantics oracle: exact match
    rows = [dict(zip(["Rank", "Country", "GDP_Per_Capita"], r)) for r in DATA]
    want = oracle.convert_rows(rows, spec, with_row_index=True)
    assert got == want

    # precision/recall vs the documented golden (graph names excluded):
    inter = len(got & golden)
    precision = inter / len(got)
    recall = inter / len(golden)
    assert recall == 1.0 and precision >= 0.85  # prov triples cost precision
