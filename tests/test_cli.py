"""CLI round trip (cow_spark.cli ≅ src/csvw_tool.py:88-118): build a
skeleton sidecar from a CSV, convert it, and check the emitted triples
against the pure-Python reference-semantics oracle."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cow_spark.cli import main as cli_main

CSV = 'personID,surname,male\n012,"Redfield, sr.",1\n013,Vos,0\n014,,1\n'


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "people.csv"
    p.write_text(CSV)
    return str(p)


def _read_nq(path: str) -> set[str]:
    lines = set()
    for part in os.listdir(path):
        if part.startswith("part-"):
            with open(os.path.join(path, part)) as f:
                lines.update(x for x in f.read().splitlines() if x)
    return lines


def test_build_then_convert(spark, csv_file):
    cli_main(["build", csv_file, "--processes", "4"])
    meta = csv_file + "-metadata.json"
    assert os.path.exists(meta)
    spec = json.load(open(meta))
    assert spec["tableSchema"]["primaryKey"] == "personID"
    assert [c["name"] for c in spec["tableSchema"]["columns"]] == [
        "personID", "surname", "male"]

    cli_main(["convert", csv_file, "--processes", "4",
              "--timestamp", "2026-08-17T00:00"])
    out = csv_file + ".nq"
    assert os.path.exists(out)
    lines = _read_nq(out)

    base = spec["@base"]
    # row 2's empty surname is skipped (P2); everything else emits one
    # xsd:string literal per cell keyed on the global _row subject
    subjects = {l.split(" ")[0] for l in lines if "/vocab/" in l}
    assert f"<{base}/0>" in subjects and f"<{base}/2>" in subjects
    body = "\n".join(lines)
    assert '"Redfield, sr."' in body
    assert f"<{base}/2> <{base}/vocab/surname>" not in body  # empty skipped
    assert "nanopublication" in body and "hasAssertion" in body  # spine
    # graph name: {base-sans-slug}/{name}/assertion/{hash8}/{ts}
    assert "/people/assertion/" in body and "/2026-08-17T00:00>" in body


def test_build_backs_up_existing(spark, csv_file):
    cli_main(["build", csv_file])
    cli_main(["build", csv_file])
    d = os.path.dirname(csv_file)
    assert any(".bak" in f for f in os.listdir(d))


def test_convert_without_metadata_exits(spark, csv_file):
    with pytest.raises(SystemExit):
        cli_main(["convert", csv_file])


def test_unsupported_format_rejected(csv_file):
    with pytest.raises(SystemExit):  # argparse choices gate
        cli_main(["convert", csv_file, "--format", "json-ld"])


def _parse_rdf_xml(path):
    """Parse our RDF/XML output back into rendered N-Triples lines."""
    import xml.etree.ElementTree as ET

    from cow_spark.model import RDF as RDF_NS, object_term_py

    root = ET.parse(path).getroot()
    assert root.tag == f"{{{RDF_NS}}}RDF"
    out = set()
    for desc in root:
        s = desc.attrib[f"{{{RDF_NS}}}about"]
        for prop in desc:
            ns, local = prop.tag[1:].split("}", 1)
            p = ns + local
            res = prop.attrib.get(f"{{{RDF_NS}}}resource")
            if res is not None:
                term = object_term_py("iri", res, None, None)
            else:
                dt = prop.attrib.get(f"{{{RDF_NS}}}datatype")
                lang = prop.attrib.get(
                    "{http://www.w3.org/XML/1998/namespace}lang")
                term = object_term_py("lit", prop.text or "", dt, lang)
            out.add(f"<{s}> <{p}> {term} .")
    return out


def test_cli_xml_and_trix_roundtrip(spark, csv_file):
    """S8 closure: xml / pretty-xml / trix parse as well-formed XML and
    reconstruct exactly the triples the nt serialization emits."""
    import xml.etree.ElementTree as ET

    from cow_spark.model import object_term_py
    from cow_spark.sources.xmlser import TRIX_NS

    cli_main(["build", csv_file])
    ts = ["--timestamp", "2026-08-17T00:00"]
    cli_main(["convert", csv_file, "--format", "nt", *ts])
    want = _read_nq(csv_file + ".nt")

    cli_main(["convert", csv_file, "--format", "xml", *ts])
    assert _parse_rdf_xml(csv_file + ".xml") == want
    os.remove(csv_file + ".xml")
    cli_main(["convert", csv_file, "--format", "pretty-xml", *ts])
    assert _parse_rdf_xml(csv_file + ".xml") == want

    cli_main(["convert", csv_file, "--format", "trix", *ts])
    root = ET.parse(csv_file + ".trix").getroot()
    assert root.tag == f"{{{TRIX_NS}}}TriX"
    got, graphs = set(), 0
    for graph in root:
        graphs += 1
        for el in graph:
            if el.tag == f"{{{TRIX_NS}}}uri":
                continue
            s, p, o = list(el)
            if o.tag == f"{{{TRIX_NS}}}uri":
                term = object_term_py("iri", o.text or "", None, None)
            else:
                dt = o.attrib.get("datatype")
                lang = o.attrib.get(
                    "{http://www.w3.org/XML/1998/namespace}lang")
                term = object_term_py("lit", o.text or "", dt, lang)
            got.add(f"<{s.text}> <{p.text}> {term} .")
    assert got == want
    assert graphs >= 2  # default graph (spine) + named assertion graph


def test_cli_virtuoso_compat_flag(spark, csv_file):
    cli_main(["build", csv_file])
    cli_main(["convert", csv_file, "--virtuoso-compat",
              "--timestamp", "2026-08-17T00:00"])
    lines = _read_nq(csv_file + ".nq")
    assert lines and all(l.rstrip(" .").rstrip().endswith(">")
                         for l in lines)  # every quad carries a graph
    assert any("urn:uuid:" in l for l in lines)


def test_cli_n3_is_turtle_superset(spark, csv_file):
    cli_main(["build", csv_file])
    ts = ["--timestamp", "2026-08-17T00:00"]
    cli_main(["convert", csv_file, "--format", "n3", *ts])
    cli_main(["convert", csv_file, "--format", "turtle", *ts])
    assert _read_nq(csv_file + ".n3") == _read_nq(csv_file + ".ttl")


def test_rdf_xml_unsplittable_predicate_raises(spark):
    from cow_spark.sources.xmlser import split_iri

    assert split_iri("https://example.com/vocab/name") == (
        "https://example.com/vocab/", "name")
    assert split_iri("https://example.com/v#x-1.y") == (
        "https://example.com/v#", "x-1.y")
    with pytest.raises(ValueError):
        split_iri("https://example.com/vocab/")  # ends in '/'
    with pytest.raises(ValueError):
        split_iri("name")  # no namespace part


def test_cli_alternate_serializations(spark, csv_file):
    """S8 subset formats: nt/turtle = triples only, trig = graph blocks."""
    cli_main(["build", csv_file])
    for fmt, ext in [("nt", ".nt"), ("turtle", ".ttl"), ("trig", ".trig")]:
        cli_main(["convert", csv_file, "--format", fmt,
                  "--timestamp", "2026-08-17T00:00"])
        out = csv_file + ext
        assert os.path.exists(out)
        body = "\n".join(_read_nq(out))
        assert '"Redfield, sr."' in body
        if fmt in ("nt", "turtle"):
            # triples only: every line ends 'o .' with exactly 3 terms
            assert "> {" not in body
            line = next(l for l in body.splitlines() if "Redfield" in l)
            assert line.endswith(" .") and line.count("> <") == 1
        else:
            # read parts verbatim — _read_nq's set-union loses order
            raw = ""
            for part in sorted(os.listdir(out)):
                if part.startswith("part-"):
                    raw += open(os.path.join(out, part)).read()
            assert "> {" in raw
            assert raw.count("{") == raw.count("}") >= 1


def test_build_on_utf16_and_nonlatin_files(spark, tmp_path):
    """S2 beyond utf-8/latin-1: BOM'd UTF-16 must be readable (Java's
    UTF-16LE/BE don't consume a BOM; 'utf-16' does, and the reader needs
    multiLine so Hadoop's byte-level \\n split can't corrupt rows), and
    the byte-frequency heuristic must catch Cyrillic and Japanese."""
    from cow_spark.sources.csv_source import detect_encoding

    u16 = tmp_path / "u16.csv"
    u16.write_bytes("id,naam\n1,José\n2,Ångström\n".encode("utf-16"))
    assert detect_encoding(str(u16)) == "utf-16"
    cli_main(["build", str(u16)])
    spec = json.load(open(str(u16) + "-metadata.json"))
    assert spec["dialect"]["encoding"] == "utf-16"
    assert spec["tableSchema"]["columns"][0]["name"] == "id"  # no BOM prefix
    cli_main(["convert", str(u16), "--timestamp", "2026-08-17T00:00"])
    body = "\n".join(_read_nq(str(u16) + ".nq"))
    assert '"José"' in body and '"Ångström"' in body

    ru = "id,город\n1,Москва\n2,Санкт-Петербург\n3,Новосибирск\n"
    cp1251 = tmp_path / "ru1251.csv"
    cp1251.write_bytes(ru.encode("windows-1251"))
    assert detect_encoding(str(cp1251)) == "windows-1251"
    koi = tmp_path / "rukoi8.csv"
    koi.write_bytes(ru.encode("koi8-r"))
    assert detect_encoding(str(koi)) == "koi8-r"
    sjis = tmp_path / "ja.csv"
    sjis.write_bytes("id,都市\n1,東京\n2,大阪\n".encode("shift_jis"))
    assert detect_encoding(str(sjis)) == "shift_jis"

    # full round trip on the windows-1251 file
    cli_main(["build", str(cp1251)])
    cli_main(["convert", str(cp1251), "--timestamp", "2026-08-17T00:00"])
    body = "\n".join(_read_nq(str(cp1251) + ".nq"))
    assert '"Москва"' in body and '"Новосибирск"' in body


def test_build_detects_greek_hebrew_thai_codepages(spark, tmp_path):
    """S2, r3 (VERDICT 'what's missing' #3): the chardet-shaped corner
    beyond Cyrillic/Japanese — Greek iso-8859-7 (tonos bytes), Hebrew
    windows-1255 (alphabet exactly 0xE0-0xFA, no case), Thai tis-620
    (consonant mass at 0xA1-0xBF). Each detected, transcoded, and
    round-tripped through the full CLI."""
    from cow_spark.sources.csv_source import detect_encoding

    cases = [
        ("el.csv", "iso-8859-7",
         "id,πόλη\n1,Αθήνα\n2,Θεσσαλονίκη\n3,Καλημέρα κόσμε\n",
         ['"Αθήνα"', '"Καλημέρα κόσμε"']),
        ("he.csv", "windows-1255",
         "id,עיר\n1,ירושלים\n2,תל אביב\n3,שלום עולם\n",
         ['"ירושלים"', '"שלום עולם"']),
        ("th.csv", "tis-620",
         "id,เมือง\n1,กรุงเทพมหานคร\n2,เชียงใหม่\n3,สวัสดีชาวโลก\n",
         ['"กรุงเทพมหานคร"', '"สวัสดีชาวโลก"']),
        # regression: this short sample STRICTLY decodes under shift_jis
        # (tis-620 0xA1-0xDF = halfwidth katakana there) — the Japanese
        # check must demand a kana/CJK majority, not any kana/CJK
        ("th2.csv", "tis-620",
         "id,เมือง\n1,กรุงเทพมหานคร\n2,เชียงใหม่\n",
         ['"เชียงใหม่"']),
    ]
    for fname, enc, text, literals in cases:
        p = tmp_path / fname
        p.write_bytes(text.encode(enc))
        assert detect_encoding(str(p)) == enc, fname
        cli_main(["build", str(p)])
        spec = json.load(open(str(p) + "-metadata.json"))
        assert spec["dialect"]["encoding"] == enc
        cli_main(["convert", str(p), "--timestamp", "2026-08-17T00:00"])
        body = "\n".join(_read_nq(str(p) + ".nq"))
        for lit in literals:
            assert lit in body, (fname, lit)


def test_transcode_preserves_quoted_cr(spark, tmp_path):
    """The driver-side UTF-8 transcode must not let universal-newline
    mode rewrite a bare \\r inside a quoted cell (data mutation + fake
    row boundary)."""
    from cow_spark.sources.csv_source import _transcode_to_utf8, read_csv

    p = tmp_path / "cr.csv"
    p.write_bytes('id,наам\n1,"ab\rcd"\n'.encode("windows-1251"))
    tmp = _transcode_to_utf8(str(p), "windows-1251")
    assert open(tmp, "rb").read() == 'id,наам\n1,"ab\rcd"\n'.encode("utf-8")
    # quoted line breaks additionally need multiline (Hadoop's record
    # split is byte-level and quote-blind — independent of transcoding)
    rows = read_csv(spark, str(p), encoding="windows-1251",
                    multiline=True).collect()
    assert len(rows) == 1 and rows[0][1] == "ab\rcd"


def test_detect_encoding_survives_truncated_multibyte_sample(tmp_path):
    """A sample boundary cutting a shift-jis double-byte char must not
    fail the strict decode and misroute to the Cyrillic heuristic."""
    from cow_spark.sources.csv_source import detect_encoding

    data = ("id,都市\n" + "1,東京大阪названия\n" * 40).encode("shift_jis")
    p = tmp_path / "ja.csv"
    p.write_bytes(data)
    # find a sample size that ends mid double-byte char
    for n in range(20, 60):
        try:
            data[:n].decode("shift_jis")
        except UnicodeDecodeError:
            break
    assert detect_encoding(str(p), sample_bytes=n) == "shift_jis"


def test_xml_literal_cr_roundtrips_and_controls_refused(spark, tmp_path):
    """\\r in a literal must survive the XML round trip as a charref
    (parsers normalize raw \\r to \\n); ill-formed C0 controls raise."""
    import xml.etree.ElementTree as ET

    from cow_spark.sources.xmlser import write_rdf_xml

    rows = [(None, "https://example.com/s", "https://example.com/v/p",
             "lit", "a\rb\tc", None, None)]
    schema = "g string, s string, p string, o_kind string, o_lex string, o_dt string, o_lang string"
    q = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "cr.xml")
    write_rdf_xml(q, out)
    root = ET.parse(out).getroot()
    assert root[0][0].text == "a\rb\tc"

    bad = spark.createDataFrame(
        [(None, "https://example.com/s", "https://example.com/v/p",
          "lit", "x\x0by", None, None)], schema)
    with pytest.raises(Exception) as ei:
        write_rdf_xml(bad, str(tmp_path / "bad.xml"))
    assert "cannot represent" in str(ei.value)
    # the partial file must not be left behind for globs to pick up
    assert not (tmp_path / "bad.xml").exists()


# -- reference example dialects (FIXTURES.md F6: first rows, checked in) ----

BUURT = (
    "properties_name_in_uri;Dienstboden\n"
    "buurt-a;1,5\nbuurt-b;2,32\nbuurt-c;1,96\n"
)

TAFEL = (
    "ID;Ref_Reg;Family-Name;Hiscam;Marital_Status\n"
    "2294;8532;Roozen;64,41;b\n"
    "2295;;van Dijk;;w\n"
)


def test_cli_semicolon_dialect_roundtrip(spark, tmp_path):
    """buurt.csv shape: ';' delimiter, decimal-comma values preserved as
    raw lexical forms (COW never normalizes literals, csvw.py:621)."""
    p = tmp_path / "buurt.csv"
    p.write_text(BUURT)
    cli_main(["build", str(p), "--delimiter", ";"])
    cli_main(["convert", str(p), "--timestamp", "2026-08-17T00:00"])
    body = "\n".join(_read_nq(str(p) + ".nq"))
    assert '"1,5"' in body and '"2,32"' in body  # decimal comma untouched
    assert "/vocab/Dienstboden>" in body


def test_cli_empty_cells_skipped(spark, tmp_path):
    """tafelvbis.csv shape: empty cells emit no triple (P2)."""
    p = tmp_path / "tafel.csv"
    p.write_text(TAFEL)
    cli_main(["build", str(p), "--delimiter", ";"])
    cli_main(["convert", str(p), "--timestamp", "2026-08-17T00:00"])
    lines = _read_nq(str(p) + ".nq")
    row1 = [l for l in lines if l.startswith("<") and "/1>" in l.split(" ")[0]]
    preds = {l.split(" ")[1] for l in row1}
    assert not any(p.endswith("/vocab/Ref_Reg>") for p in preds)  # empty
    assert not any(p.endswith("/vocab/Hiscam>") for p in preds)   # empty
    assert any(p.endswith("/vocab/Marital_Status>") for p in preds)


def test_cli_gzip_output_roundtrip(spark, tmp_path):
    """S9: --gzip writes .nq.gz parts that decompress to the same quads."""
    import gzip as _gzip

    p = tmp_path / "z.csv"
    p.write_text("id,name\n1,Ada\n2,Bert\n")
    cli_main(["build", str(p)])
    cli_main(["convert", str(p), "--gzip",
              "--timestamp", "2026-08-17T00:00"])
    out = str(p) + ".nq.gz"
    assert os.path.exists(out)
    lines = set()
    for part in os.listdir(out):
        if part.startswith("part-") and part.endswith(".gz"):
            with _gzip.open(os.path.join(out, part), "rt") as f:
                lines.update(x for x in f.read().splitlines() if x)
    body = "\n".join(lines)
    assert '"Ada"' in body and '"Bert"' in body
    assert "/z/assertion/" in body


def test_build_autodetects_dialect(spark, tmp_path):
    """S2/S3: build without flags sniffs the delimiter (stdlib Sniffer,
    same as the reference) and detects encoding; convert then reads the
    file identically via the recorded dialect."""
    from cow_spark.sources.csv_source import detect_encoding, sniff_delimiter

    p = tmp_path / "auto.csv"
    p.write_text("naam;plaats\nJosé;Den Haag\nÅsa;Umeå\n", encoding="utf-8")
    assert sniff_delimiter(str(p)) == ";"
    assert detect_encoding(str(p)) == "utf-8"
    latin = tmp_path / "latin.csv"
    latin.write_bytes("id;naam\n1;Jos\xe9\n".encode("latin-1"))
    assert detect_encoding(str(latin)) == "iso-8859-1"

    cli_main(["build", str(p)])
    spec = json.load(open(str(p) + "-metadata.json"))
    assert spec["dialect"]["delimiter"] == ";"
    assert [c["name"] for c in spec["tableSchema"]["columns"]] == [
        "naam", "plaats"]
    cli_main(["convert", str(p), "--timestamp", "2026-08-17T00:00"])
    body = "\n".join(_read_nq(str(p) + ".nq"))
    assert '"José"' in body and '"Den Haag"' in body


def test_build_on_latin1_and_bom_files(spark, tmp_path):
    """detect_encoding must return names Spark's JVM reader accepts —
    build+convert end-to-end on latin-1 and BOM'd UTF-8 inputs."""
    l1 = tmp_path / "l1.csv"
    l1.write_bytes("id,naam\n1,José\n".encode("latin-1"))
    cli_main(["build", str(l1)])
    spec = json.load(open(str(l1) + "-metadata.json"))
    assert spec["dialect"]["encoding"] == "iso-8859-1"
    cli_main(["convert", str(l1), "--timestamp", "2026-08-17T00:00"])
    assert '"José"' in "\n".join(_read_nq(str(l1) + ".nq"))

    bom = tmp_path / "bom.csv"
    bom.write_bytes(b"\xef\xbb\xbfid,name\n1,Ada\n")
    cli_main(["build", str(bom)])
    spec = json.load(open(str(bom) + "-metadata.json"))
    assert spec["dialect"]["encoding"] == "utf-8"
    assert spec["tableSchema"]["columns"][0]["name"] == "id"  # BOM stripped
    cli_main(["convert", str(bom), "--timestamp", "2026-08-17T00:00"])
    assert '"Ada"' in "\n".join(_read_nq(str(bom) + ".nq"))


# ---------------------------------------------------------------------------
# reference example CSVs as golden smoke (VERDICT r2 #7): the reference
# repo ships three real-world files with dialect/decimal-comma quirks the
# synthetic fixtures don't cover — build → convert end-to-end, pin the
# emitted counts and a sample of quads.
# ---------------------------------------------------------------------------

REF_EXAMPLES = "/root/reference/examples"

_REF_GOLDEN = {
    # file -> (delimiter, n_nq_lines, vocab_lines, must_contain)
    "buurt.csv": (";", 26, 14, ['"1,5"', "/vocab/Dienstboden>", '"buurt-a"']),
    "cow_person_example.csv": (
        ",", 36, 24,
        ['"012"^^', '"chimney sweep"', "/vocab/occupation>"]),
    "tafelvbis.csv": (
        ";", 242, 230,
        ['"64,41"', '"Anthonius Leonardus"', "/vocab/Hiscam>",
         '"38199,00"']),
}


@pytest.mark.skipif(not os.path.isdir(REF_EXAMPLES),
                    reason="reference examples not mounted")
@pytest.mark.parametrize("fname", sorted(_REF_GOLDEN))
def test_reference_example_goldens(spark, tmp_path, fname):
    import shutil

    src = os.path.join(REF_EXAMPLES, fname)
    path = str(tmp_path / fname)
    shutil.copy(src, path)

    cli_main(["build", path, "--processes", "4"])
    delim, n_lines, n_vocab, samples = _REF_GOLDEN[fname]
    spec = json.load(open(path + "-metadata.json"))
    assert spec["dialect"]["delimiter"] == delim

    cli_main(["convert", path, "--processes", "4",
              "--timestamp", "2026-08-17T00:00"])
    lines = _read_nq(path + ".nq")
    assert len(lines) == n_lines
    body = "\n".join(lines)
    assert sum("/vocab/" in l for l in lines) == n_vocab
    for s in samples:
        assert s in body, s
    # real-world empty cells are skipped, never emitted as "" literals
    assert '""^^' not in body
    # nanopub spine present like every conversion
    assert "nanopublication" in body and "hasAssertion" in body


def test_fixed_width_source(spark, tmp_path):
    """1-based offsets, trim, blank->NULL, try_cast dirt tolerance,
    short lines, spec validation."""
    from cow_spark.sources.csv_source import (parse_fixed_width,
                                              read_fixed_width)

    p = tmp_path / "fw.txt"
    p.write_text("AB  0042x\n"
                 "CD  13  y\n"
                 "EF  zz\n"          # dirty int, short line
                 "    0007z\n")
    spec = [("code", 1, 4), ("qty", 5, 4, "int"), ("flag", 9, 1)]
    got = {tuple(r) for r in
           read_fixed_width(spark, str(p), spec).collect()}
    assert got == {("AB", 42, "x"), ("CD", 13, "y"),
                   ("EF", None, None), (None, 7, "z")}
    import pytest as _pt
    with _pt.raises(ValueError):
        parse_fixed_width(spark.read.text(str(p)), [])
    with _pt.raises(ValueError):
        parse_fixed_width(spark.read.text(str(p)), [("x", 0, 3)])
