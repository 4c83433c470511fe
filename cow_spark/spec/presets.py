"""Canonical mapping specs for the transcripts table (FIXTURES.md F2).

``transcripts_default_spec`` ≅ the skeleton COW's build mode would emit
(all-literal columns), re-keyed on (conv_id, turn_idx) instead of the
global ``{_row}`` index — a global row number is a non-starter at 10^12
rows (SURVEY.md §1.5 P1).

``transcripts_full_spec`` exercises every mapping operator in SURVEY.md
§2.2: aboutUrl override, templated propertyUrl, valueUrl object IRIs,
virtual columns, csvw:value templates, Jinja conditionals + filters,
datatypes (integer/dateTime/anyURI), lang literals, scalar + cross-column
nulls, parseOnEmpty, collectionUrl/schemeUrl.
"""

from __future__ import annotations

DEFAULT_BASE = "https://example.com/id/transcripts"


def transcripts_default_spec(base: str = DEFAULT_BASE) -> dict:
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return {
        "@base": base,
        "url": "transcripts",
        "tableSchema": {
            "aboutUrl": "{conv_id}/turn/{turn_idx}",
            "primaryKey": "conv_id",
            "columns": [
                {
                    "name": c,
                    "@id": f"{base}/vocab/variable/{c}",
                    "datatype": "string",
                }
                for c in cols
            ],
        },
    }


def transcripts_full_spec(base: str = DEFAULT_BASE) -> dict:
    return {
        "@base": base,
        "url": "transcripts",
        "tableSchema": {
            "aboutUrl": "{conv_id}/turn/{turn_idx}",
            "primaryKey": "conv_id",
            "null": "N/A",
            "columns": [
                # typed literal (integer) with zero-pad format-spec template
                {
                    "name": "turn_idx",
                    "@id": f"{base}/vocab/variable/turn_idx",
                    "datatype": "integer",
                },
                # lang-tagged literal; empty text skipped, N/A schema-null
                {
                    "name": "text",
                    "@id": f"{base}/vocab/variable/text",
                    "datatype": "string",
                    "lang": "en",
                },
                # csvw:value template (Jinja-then-format), typed
                {
                    "name": "text",
                    "propertyUrl": f"{base}/vocab/textLength",
                    "value": "{{text|length}}",
                    "datatype": "integer",
                },
                # cell → object IRI via valueUrl; cross-column null: no
                # tool triple unless the role is 'tool'
                {
                    "name": "tool",
                    "@id": f"{base}/vocab/variable/tool",
                    "valueUrl": "tool/{tool}",
                    "nullOn": [
                        {"name": "role", "null": "user"},
                        {"name": "role", "null": "assistant"},
                    ],
                },
                # virtual column, templated propertyUrl, valueUrl + SKOS scheme
                {
                    "virtual": True,
                    "name": "role",
                    "propertyUrl": "role/{role}",
                    "valueUrl": "role-concept/{role}",
                    "schemeUrl": "scheme/roles",
                },
                # Jinja conditional valueUrl (docs/index.rst:597-611)
                {
                    "virtual": True,
                    "propertyUrl": "rdf:type",
                    "valueUrl": "{% if role == 'tool' %}tool-turn{% else %}chat-turn{% endif %}",
                },
                # Jinja filter in csvw:value (docs/index.rst:633-641)
                {
                    "virtual": True,
                    "propertyUrl": f"{base}/vocab/paddedTurn",
                    "value": "{{'%05d'|format(turn_idx|int)}}",
                },
                # anyURI literal-branch → IRI object
                {
                    "virtual": True,
                    "propertyUrl": f"{base}/vocab/convPage",
                    "value": "https://example.com/conv/{conv_id}",
                    "datatype": "anyURI",
                },
                # dateTime typed literal
                {
                    "name": "ts",
                    "@id": f"{base}/vocab/variable/ts",
                    "datatype": "dateTime",
                },
                # parseOnEmpty: empty text still emits a (typed) marker
                {
                    "name": "text",
                    "propertyUrl": f"{base}/vocab/rawText",
                    "parseOnEmpty": True,
                    "null": ["N/A"],
                },
                # SKOS collection over cities mentioned via valueUrl
                {
                    "virtual": True,
                    "name": "role",
                    "propertyUrl": f"{base}/vocab/roleMember",
                    "valueUrl": "role-concept/{role}",
                    "collectionUrl": "collection/roles",
                },
            ],
        },
    }
