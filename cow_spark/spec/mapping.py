"""Declarative JSON mapping spec — COW's CSVW tableSchema subset.

The reference loads a JSON-LD sidecar into an rdflib graph and walks it
per chunk (src/converter/csvw.py:227-232, 437-453 — it re-pickles the
whole metadata graph for every chunk!). We parse plain JSON **once on the
driver** into an immutable spec; only compiled rules ever reach executors.

Spec shape (all template strings use COW's Jinja-then-format semantics):

    {
      "@base": "https://example.com/id/dataset",
      "url": "transcripts",                      # table/file name
      "dialect": {"delimiter": ",", "quoteChar": "\"", "encoding": "utf-8"},
      "tableSchema": {
        "aboutUrl": "{conv_id}/turn/{turn_idx}", # default subject (csvw.py:474,511)
        "null": "N/A",                           # schema-level null (csvw.py:922)
        "primaryKey": "conv_id",
        "columns": [
          {"name": "text",
           "@id": "...",                         # column id → prov triple (csvw.py:548-549)
           "datatype": "string",                 # short/prefixed/absolute
           "lang": "en",                         # lang literal (csvw.py:618-619)
           "null": ["N/A"],                      # scalar or list (csvw.py:922)
           "nullOn": [{"name": "role", "null": "tool"}],  # cross-column null
                                                  # (COW's @list null form, csvw.py:476-487)
           "parseOnEmpty": true,                 # csvw:parseOnEmpty (csvw.py:919)
           "aboutUrl": "...",                    # per-column subject override (csvw.py:569-572)
           "propertyUrl": "...",                 # else sdv:<name> (csvw.py:871-894)
           "valueUrl": "...",                    # object-as-IRI (csvw.py:577-598)
           "value": "...",                       # csvw:value literal template (csvw.py:606-612)
           "virtual": true,                      # spec-only column (docs/index.rst:516)
           "collectionUrl": "...",               # SKOS collection (csvw.py:627-631)
           "schemeUrl": "..."}                   # SKOS scheme (csvw.py:633-637)
        ]
      }
    }
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from urllib.parse import urljoin

from ..model import DEFAULT_BASE, datatype_iri, namespaces_for_base
from ..functions.iri import iri_encode_py, is_valid_iri_py
from .templates import render_template_py

_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")
_PREFIXED = re.compile(r"^([A-Za-z][\w.-]*):(?!//)(.*)$", re.S)


class SpecError(ValueError):
    """Raised driver-side for an invalid mapping spec (fail fast — never
    launch a cluster job with a spec that cannot render valid IRIs;
    reference behavior: validateTerm at util/__init__.py:111-135)."""


@dataclass(frozen=True)
class ColumnSpec:
    name: str | None = None
    id: str | None = None  # "@id"
    datatype: str | None = None  # resolved IRI or None
    lang: str | None = None
    nulls: tuple[str, ...] = ()
    null_on: tuple[tuple[str, str], ...] = ()  # (other-column, null-value)
    parse_on_empty: bool = False
    about_url: str | None = None  # resolved template
    property_url: str | None = None
    value_url: str | None = None
    value: str | None = None  # csvw:value (NOT URL-resolved, docs/index.rst:587-593)
    virtual: bool = False
    collection_url: str | None = None
    scheme_url: str | None = None


@dataclass(frozen=True)
class MappingSpec:
    base: str
    url: str
    about_url: str  # schema-level default subject template (resolved)
    schema_nulls: tuple[str, ...]
    primary_key: str | None
    columns: tuple[ColumnSpec, ...]
    namespaces: dict[str, str] = field(default_factory=dict)
    dialect: dict[str, str] = field(default_factory=dict)

    # -- parsing -------------------------------------------------------------

    @staticmethod
    def from_csvw_json(obj: dict | str) -> "MappingSpec":
        """Load a *reference-format* CSVW metadata sidecar (the JSON-LD
        shape COW's build mode emits, docs/index.rst:188-307): @base and
        user prefixes live inside the ``@context`` list (the reference
        reads ``@context[1]['@base']``, csvw.py:214-223, and rebases
        sdr/sdv from it). An existing ``<file>.csv-metadata.json`` works
        here unchanged."""
        if isinstance(obj, str):
            with open(obj) as f:
                obj = json.load(f)
        ctx = obj.get("@context", [])
        base = None
        extra_ns: dict[str, str] = {}
        for entry in ctx if isinstance(ctx, list) else [ctx]:
            if isinstance(entry, dict):
                base = entry.get("@base", base)
                extra_ns.update(
                    {
                        k: v
                        for k, v in entry.items()
                        if isinstance(v, str) and not k.startswith("@")
                    }
                )
        plain = {
            "@base": base or DEFAULT_BASE,
            "url": obj.get("url", ""),
            "dialect": obj.get("dialect", {}),
            "tableSchema": obj.get("tableSchema", {}),
        }
        return MappingSpec.from_json(plain, extra_namespaces=extra_ns)

    @staticmethod
    def from_json(
        obj: dict | str, extra_namespaces: dict[str, str] | None = None
    ) -> "MappingSpec":
        if isinstance(obj, str):
            with open(obj) as f:
                obj = json.load(f)
        base = obj.get("@base", DEFAULT_BASE)
        # sdr/sdv rebase from @base ≅ csvw.py:220-223 (which concatenates
        # base+'vocab/' verbatim; we normalize the missing-slash case)
        ns = namespaces_for_base(base)
        if extra_namespaces:
            ns.update(extra_namespaces)
        ts = obj.get("tableSchema", {})

        def res(t: str | None) -> str | None:
            return None if t is None else resolve_url_template(t, base, ns)

        cols = []
        for c in ts.get("columns", []):
            raw_nulls = c.get("null", [])
            if isinstance(raw_nulls, (str, int, float)):
                raw_nulls = [raw_nulls]
            scalar_nulls, null_on = [], []
            for n in raw_nulls:
                if isinstance(n, dict):
                    null_on.append((str(n["name"]), str(n["null"])))
                else:
                    scalar_nulls.append(str(n))
            for n in c.get("nullOn", []):
                null_on.append((str(n["name"]), str(n["null"])))
            dt = c.get("datatype")
            if isinstance(dt, dict):
                # CSVW dict form: {"@id": "xsd:string"} / {"base": "string"}
                dt = dt.get("@id", dt.get("base"))
            cols.append(
                ColumnSpec(
                    name=c.get("name"),
                    id=c.get("@id"),
                    datatype=datatype_iri(dt, ns),
                    lang=c.get("lang"),
                    nulls=tuple(scalar_nulls),
                    null_on=tuple(null_on),
                    parse_on_empty=_truthy(c.get("parseOnEmpty", c.get("csvw:parseOnEmpty"))),
                    about_url=res(c.get("aboutUrl")),
                    property_url=res(c.get("propertyUrl")),
                    value_url=res(c.get("valueUrl")),
                    value=c.get("value", c.get("csvw:value")),
                    virtual=_truthy(c.get("virtual")),
                    collection_url=res(c.get("collectionUrl", c.get("csvw:collectionUrl"))),
                    scheme_url=res(c.get("schemeUrl", c.get("csvw:schemeUrl"))),
                )
            )
        schema_nulls = ts.get("null", [])
        if isinstance(schema_nulls, (str, int, float)):
            schema_nulls = [schema_nulls]
        about = ts.get("aboutUrl", "{_row}")
        return MappingSpec(
            base=base,
            url=obj.get("url", ""),
            about_url=res(about),
            schema_nulls=tuple(str(n) for n in schema_nulls),
            primary_key=ts.get("primaryKey"),
            columns=tuple(cols),
            namespaces=ns,
            dialect=obj.get("dialect", {}),
        )

    # -- validation (S6) -------------------------------------------------------

    def validate(self, headers: list[str]) -> None:
        """Render every URL template with placeholder values and check the
        result is an absolute IRI — mirrors the reference's fail-fast term
        validation (csvw.py:280-293 → util/__init__.py:111-135)."""
        row = {h: h for h in headers}
        row["_row"] = 0
        for cs in self.columns:
            if cs.name:
                row.setdefault(cs.name, cs.name)
        problems: list[str] = []
        for label, tpl in self._url_templates():
            rendered = render_template_py(tpl, row)
            if rendered is None:
                problems.append(f"{label}: template {tpl!r} failed to render")
                continue
            iri = iri_encode_py(rendered)
            if not is_valid_iri_py(iri):
                problems.append(f"{label}: {tpl!r} renders to invalid IRI {iri!r}")
        if problems:
            raise SpecError("; ".join(problems))

    def _url_templates(self):
        yield ("tableSchema.aboutUrl", self.about_url)
        for i, cs in enumerate(self.columns):
            tag = cs.name or f"columns[{i}]"
            for lbl, t in [
                ("aboutUrl", cs.about_url),
                ("propertyUrl", cs.property_url),
                ("valueUrl", cs.value_url),
                ("collectionUrl", cs.collection_url),
                ("schemeUrl", cs.scheme_url),
            ]:
                if t is not None:
                    yield (f"{tag}.{lbl}", t)


def _truthy(v) -> bool:
    return v is True or (isinstance(v, str) and v.lower() == "true")


def resolve_url_template(template: str, base: str, namespaces: dict[str, str]) -> str:
    """URL-template resolution ≅ the JSON-LD parser's IRI expansion
    (docs/index.rst:561): known ``prefix:rest`` expands against the
    namespace table, absolute IRIs pass through, everything else resolves
    against @base (RFC 3986 relative resolution, as JSON-LD does)."""
    if _ABS_IRI.match(template) or template.startswith("urn:"):
        return template
    m = _PREFIXED.match(template)
    if m and m.group(1) in namespaces:
        return namespaces[m.group(1)] + m.group(2)
    b = base if base.endswith("/") else base + "/"
    return urljoin(b, template)


def backup_spec(path: str) -> str | None:
    """S11 — timestamped rename of an existing spec before a rebuild
    (≅ csvw_tool.py:35-43). Returns the backup path, or None."""
    import datetime
    import os

    if not os.path.exists(path):
        return None
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y%m%d%H%M%S")
    backup = f"{path}.{stamp}.bak"
    os.rename(path, backup)
    return backup


def build_spec(
    headers: list[str],
    base: str = DEFAULT_BASE,
    url: str = "table",
    about_url: str | None = None,
) -> dict:
    """Skeleton-spec builder ≅ COW ``build`` mode (csvw.py:45-150): every
    column typed string, primaryKey = first header, aboutUrl = {_row}."""
    b = base.rstrip("/")
    return {
        "@base": b,
        "url": url,
        "dialect": {"delimiter": ",", "quoteChar": '"', "encoding": "utf-8"},
        "tableSchema": {
            "aboutUrl": about_url or "{_row}",
            "primaryKey": headers[0] if headers else None,
            "columns": [
                {
                    "name": h,
                    "@id": f"{b}/vocab/variable/{h}",
                    "datatype": "string",
                }
                for h in headers
            ],
        },
    }
