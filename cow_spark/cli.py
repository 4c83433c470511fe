"""COW-compatible command line: ``python -m cow_spark {build,convert} file.csv``.

Mirrors the reference CLI surface (src/csvw_tool.py:88-118) so a user of
the reference can switch without relearning the workflow:

    python -m cow_spark build  data.csv [--base URI] [--delimiter ;]
    python -m cow_spark convert data.csv [--gzip] [--processes N]

``build`` infers a skeleton metadata sidecar ``<file>-metadata.json``
(all-string columns, ``{_row}`` aboutUrl, pk = first header — csvw.py:45-150),
backing up any existing sidecar with a timestamp (csvw_tool.py:35-43).
``convert`` loads ``<file>-metadata.json`` (reference-format CSVW JSON-LD
sidecars load unchanged), runs the compiled mapping and writes
``<file>.nq[.gz]`` including the nanopublication spine + provenance
(csvw.py:363-428, util/__init__.py:148-248).

Differences from the reference, by design (SURVEY.md §7):
- serializations: nquads (default) plus nt/turtle/trig/n3 as correct
  grammar subsets emitted directly from the term renderer, and
  xml/pretty-xml/trix as driver-side streaming XML (the reference
  produces every non-nquads format by re-parsing its whole .nq into an
  in-memory rdflib graph, csvw_tool.py:61-78);
- ``--processes`` selects Spark local parallelism (0 = all cores);
  ``--chunksize`` is accepted for flag parity but Spark's split planning
  supersedes fixed row chunks;
- output is a directory of part files unless ``--single-file`` (default
  for CLI use) coalesces to one part — COW writes one file.
"""

from __future__ import annotations

import argparse
import codecs
import datetime
import json
import os
import sys
from glob import glob

from . import __version__

RDF_FORMATS = ["xml", "n3", "turtle", "nt", "pretty-xml", "trix", "trig",
               "nquads"]


def _metadata_path(csv_path: str) -> str:
    """<file>-metadata.json next to the CSV (csvw.py:200-207)."""
    return csv_path + "-metadata.json"


def _utc_minute() -> str:
    return datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M")


def build_one(path: str, args) -> str:
    from .sources.csv_source import (
        detect_encoding,
        read_csv,
        sniff_delimiter,
    )
    from .spec.mapping import backup_spec, build_spec

    spark = _session(args)
    # build mode autodetects what the user didn't pin — the reference
    # runs chardet + csv.Sniffer here (csvw.py:64-82)
    encoding = args.encoding or detect_encoding(path)
    delimiter = args.delimiter or sniff_delimiter(path, encoding)
    df = read_csv(spark, path, delimiter=delimiter,
                  quotechar=args.quotechar,
                  encoding=encoding)
    name = args.dataset or os.path.splitext(os.path.basename(path))[0]
    base = args.base.rstrip("/") + "/" + name
    spec = build_spec(df.columns, base=base, url=os.path.basename(path))
    # always record the RESOLVED dialect (sniffed or given) so convert
    # reads the file the same way build did
    spec["dialect"] = {
        "delimiter": delimiter,
        "quoteChar": args.quotechar,
        "encoding": encoding,
    }
    target = _metadata_path(path)
    backed = backup_spec(target)
    if backed:
        print(f"existing metadata backed up to {backed}")
    with open(target, "w") as f:
        json.dump(spec, f, indent=2)
    print(f"wrote {target}")
    return target


def convert_one(path: str, args) -> str:
    from .operators.extract import extract_quads
    from .plans.nanopub import NanopubContext, assemble_nanopub, git_blob_sha1
    from .sources.csv_source import read_csv, with_row_index
    from .sources.sinks import write_nquads
    from .spec.mapping import MappingSpec

    meta_path = _metadata_path(path)
    if not os.path.exists(meta_path):
        print(f"No metadata file {meta_path} — run "
              f"`python -m cow_spark build {path}` first.")
        sys.exit(1)
    with open(meta_path) as f:
        obj = json.load(f)
    spec = (MappingSpec.from_csvw_json(obj) if "@context" in obj
            else MappingSpec.from_json(obj))

    # CLI dialect defaults overridden by the spec's csvw:dialect
    # (csvw.py:257-275). An explicit "quoteChar": null means quoting
    # DISABLED (CSVW), not "use the default" — map it to Spark's
    # empty-quote sentinel
    dialect = spec.dialect or {}
    delimiter = dialect.get("delimiter") or args.delimiter or ","
    if "quoteChar" in dialect:
        quotechar = dialect["quoteChar"] if dialect["quoteChar"] is not None else ""
    else:
        quotechar = args.quotechar
    encoding = dialect.get("encoding") or args.encoding or "utf-8"

    spark = _session(args)
    df = read_csv(spark, path, delimiter=delimiter, quotechar=quotechar,
                  encoding=encoding)
    if _spec_uses_row(spec) and "_row" not in df.columns:
        # the skeleton default subject key; a global index needs a pass
        # over the file (fine at CSV scale, csv_source.with_row_index).
        # A CSV column literally named _row wins, matching the reference
        # only up to its own overwrite quirk — we keep the data column.
        df = with_row_index(df)
    spec.validate(df.columns)

    quads = extract_quads(df, spec)
    name = args.dataset or os.path.splitext(os.path.basename(path))[0]
    base = spec.base.rstrip("/")
    if base.endswith("/" + name):
        # our build mode bakes the dataset slug into @base; the reference
        # mints {base}/{name}/assertion/... with name NOT in base
        # (util/__init__.py:197-208) — avoid doubling the slug
        base = base[: -len(name) - 1]
    ctx = NanopubContext(
        base=base,
        name=name,
        source_hash=git_blob_sha1(path),
        timestamp=args.timestamp or _utc_minute(),
    )
    out = assemble_nanopub(quads, ctx, source_path=path,
                           virtuoso_compat=args.virtuoso_compat)
    # same extension table as the reference (csvw.py:39-41)
    ext = {"nquads": ".nq", "nt": ".nt", "turtle": ".ttl", "trig": ".trig",
           "n3": ".n3", "xml": ".xml", "pretty-xml": ".xml",
           "trix": ".trix"}[args.format]
    target = path + ext + (".gz" if args.gzip else "")
    if args.format == "nquads":
        write_nquads(out, target, gzip=args.gzip,
                     single_file=not args.distributed)
    else:
        from .sources.sinks import write_rdf

        write_rdf(out, target, fmt=args.format, gzip=args.gzip,
                  single_file=not args.distributed)
    print(f"wrote {target}")
    return target


def _spec_uses_row(spec) -> bool:
    """True when any resolved template references the ``{_row}`` index —
    including the implicit default subject (tableSchema.aboutUrl absent
    → ``{_row}``, mapping.py), which raw-text scanning would miss."""
    templates = [spec.about_url]
    for cs in spec.columns:
        templates += [cs.about_url, cs.property_url, cs.value_url,
                      cs.value, cs.collection_url, cs.scheme_url, cs.lang]
    return any(t is not None and "_row" in t for t in templates)


def _session(args):
    from .session import get_session

    if getattr(_session, "_spark", None) is None:
        n = args.processes
        master = f"local[{n}]" if n else "local[*]"
        _session._spark = get_session(master=master,
                                      app_name="cow_spark-cli")
        _session._spark.sparkContext.setLogLevel("ERROR")
    return _session._spark


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        prog="python -m cow_spark",
        description="Spark-native CSVW schema builder and RDF converter "
                    "(COW-compatible CLI)")
    ap.add_argument("mode", choices=["convert", "build"])
    ap.add_argument("files", metavar="file", nargs="+",
                    help="CSV file(s); globs allowed")
    ap.add_argument("--dataset", type=str, default=None,
                    help="short dataset slug (default: input file name)")
    ap.add_argument("--delimiter", type=str, default=None)
    ap.add_argument("--quotechar", type=str, default='"')
    ap.add_argument("--encoding", type=str, default=None)
    ap.add_argument("--processes", type=int, default=0,
                    help="Spark local parallelism (0 = all cores)")
    ap.add_argument("--chunksize", type=int, default=5000,
                    help="accepted for reference-CLI parity; Spark split "
                         "planning supersedes fixed chunks")
    ap.add_argument("--gzip", action="store_true")
    ap.add_argument("--base", type=str, default="https://example.com/id/",
                    help="base URI for built schemas")
    ap.add_argument("--format", "-f", choices=RDF_FORMATS, default="nquads")
    ap.add_argument("--timestamp", type=str, default=None,
                    help="run timestamp for provenance URIs (default: now, "
                         "UTC minute); pin for reproducible graph names")
    ap.add_argument("--single-file", dest="distributed", action="store_false",
                    help="coalesce output to a single part (default)")
    ap.add_argument("--distributed", dest="distributed", action="store_true",
                    help="keep one output part per task")
    ap.set_defaults(distributed=False)
    ap.add_argument("--virtuoso-compat", action="store_true",
                    help="name the nanopub spine's default graph with a "
                         "deterministic urn:uuid (for stores that reject "
                         "unnamed graphs; the reference always does this, "
                         "with a random uuid)")
    ap.add_argument("--version", action="version", version=__version__)
    args = ap.parse_args(argv)

    if args.encoding:
        try:
            codecs.lookup(args.encoding)
        except LookupError:
            print("Invalid character encoding; see the Python codecs "
                  "docs for valid names.")
            sys.exit(1)

    files: list[str] = []
    for pattern in args.files:
        files += glob(pattern)
    if not files:
        print("No input files matched.")
        sys.exit(1)

    for path in files:
        if args.mode == "build":
            build_one(path, args)
        else:
            convert_one(path, args)


if __name__ == "__main__":
    main()
