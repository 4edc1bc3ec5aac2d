"""Job configuration (the reference's Dashboard sheet, ``main.gs:144-158``).

The Dashboard is a key/value table naming the three tables of a mapping job
with defaults ``{source: "Source", map: "Map", output: "Output"}``.  Keys are
lower-cased and trimmed; unknown keys are ignored; values are stringified and
trimmed (``main.gs:153-154``).  Blank values fail validation
(``main.gs:160-165``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass

from spreadsheet_etl_engine_spark.errors import MissingConfigError

DEFAULTS = {"source": "Source", "map": "Map", "output": "Output"}


@dataclass(frozen=True)
class JobConfig:
    source: str = "Source"
    map: str = "Map"
    output: str = "Output"

    def validate(self) -> JobConfig:
        for key in ("source", "map", "output"):
            value = getattr(self, key)
            if not value or not str(value).strip():
                raise MissingConfigError(key)
        return self


def load_config(
    table: Sequence[Sequence[object]] | Mapping[str, object] | None = None,
) -> JobConfig:
    """Build a :class:`JobConfig` from a key/value table or dict.

    ``None`` (no Dashboard) yields the defaults (reference ``main.gs:146``).
    Rows with a falsy key are skipped; unknown keys ignored
    (``main.gs:152-154``).
    """
    cfg = dict(DEFAULTS)
    if table is None:
        items: list[tuple[object, object]] = []
    elif isinstance(table, Mapping):
        items = list(table.items())
    else:
        items = [(r[0] if len(r) > 0 else None, r[1] if len(r) > 1 else "") for r in table]
    for raw_key, raw_value in items:
        if not raw_key:
            continue
        key = str(raw_key).lower().strip()
        if key in cfg:
            cfg[key] = str(raw_value).strip()
    return JobConfig(**cfg).validate()
