"""Named dimension catalog — reusable edge definitions for jx queries.

Upstream MoDevETL predeclares its dimensions once (``dimensions.py`` in the
Qb/jx ecosystem: named field + domain pairs, e.g. every Bugzilla query can
say ``edges: ["product"]`` instead of restating the field and its partition
set). This is that catalog for the Spark engine: register a dimension name
-> (value expression, domain) once, then reference it from any query's
``edges``/``groupby`` either as a bare string (``"order_month"``) or as
``{"dimension": "order_month", ...overrides}``.

Resolution rules (applied by ``QB`` before edge normalization):

- ``{"dimension": name}`` — must be registered, else ``JxError``;
  explicit ``name``/``domain`` keys on the edge override the catalog's.
- a bare-string edge or a string ``value`` that matches a registered name
  resolves through the catalog *unless* the edge already carries its own
  ``domain`` (an inline domain means the author is being explicit).
- everything else passes through untouched, so a column that happens to
  share a name with no registered dimension behaves exactly as before.
"""

from __future__ import annotations

from typing import Any


class DimensionCatalog:
    """Registry of named dimensions: name -> {value, domain}."""

    def __init__(self) -> None:
        self._dims: dict[str, dict] = {}

    def register(
        self, name: str, value: Any, domain: dict | None = None
    ) -> "DimensionCatalog":
        """Declare dimension ``name`` over field/expression ``value`` with
        an optional predeclared domain dict. Returns self for chaining."""
        self._dims[name] = {"value": value, "domain": domain}
        return self

    def get(self, name: str) -> dict | None:
        return self._dims.get(name)

    def __contains__(self, name: object) -> bool:
        return name in self._dims

    def names(self) -> list[str]:
        return sorted(self._dims)

    def edge(self, name: str, overrides: dict | None = None) -> dict:
        """Materialize the edge dict for dimension ``name``; ``overrides``
        (explicit name/domain on the referencing edge) win."""
        dim = self._dims[name]
        edge: dict = {"name": name.split(".")[-1], "value": dim["value"]}
        if dim["domain"] is not None:
            edge["domain"] = dim["domain"]
        for k, v in (overrides or {}).items():
            if k != "dimension":
                edge[k] = v
        return edge
