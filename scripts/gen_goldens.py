"""Generate the static golden N-Quads fixtures (FIXTURES.md F3) from the
pure-Python reference-semantics oracle. Pure Python — no Spark.

Run: ``python scripts/gen_goldens.py`` (rewrites fixtures/golden/*.nq;
deterministic, so reruns are byte-identical).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cow_spark import oracle  # noqa: E402
from cow_spark.spec.mapping import MappingSpec  # noqa: E402
from cow_spark.spec.presets import (  # noqa: E402
    transcripts_default_spec,
    transcripts_full_spec,
)
from cow_spark.sources.transcripts import transcripts_rows  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures", "golden")

N_SLOTS = 800  # ~375 turns — big enough to hit every template branch

CSV_ROWS = [
    {"personID": "p1", "surname": "de Vries", "male": "1", "occupation": "smith"},
    {"personID": "p2", "surname": "", "male": "0", "occupation": "N/A"},
    {"personID": "p 3", "surname": 'q"x', "male": ".", "occupation": "mason"},
    {"personID": "p4", "surname": "Ångström\nJr", "male": "1", "occupation": "sm th"},
]

CSV_SPEC = {
    "@base": "https://example.com/id/persons",
    "url": "persons",
    "tableSchema": {
        "aboutUrl": "{_row}",
        "null": "N/A",
        "columns": [
            {"name": "personID"},
            {"name": "surname", "datatype": "string", "lang": "nl"},
            {"name": "male", "null": ["."], "datatype": "boolean"},
            {"name": "occupation", "valueUrl": "occupation/{occupation}",
             "schemeUrl": "scheme/occupations"},
        ],
    },
}


def write_golden(name: str, triples: set) -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.nq")
    lines = sorted(f"<{s}> <{p}> {o} .\n" for s, p, o in triples)
    with open(path, "w", encoding="utf-8") as f:
        f.writelines(lines)
    print(f"{path}: {len(lines)} triples")


def main() -> None:
    rows = transcripts_rows(N_SLOTS)
    for name, spec_dict in [
        ("transcripts_default", transcripts_default_spec()),
        ("transcripts_full", transcripts_full_spec()),
    ]:
        spec = MappingSpec.from_json(spec_dict)
        write_golden(name, oracle.convert_rows(rows, spec))
    spec = MappingSpec.from_json(CSV_SPEC)
    write_golden("csv_persons",
                 oracle.convert_rows(CSV_ROWS, spec, with_row_index=True))


if __name__ == "__main__":
    main()
