"""Engine error channel.

The reference throws contextual errors for each failure mode and reports them
at the top level (reference ``main.gs:131-139``; individual raises at
``main.gs:56,62-63,162-164,168-169,178-183,215-218,268-270``).  We keep the
same taxonomy — one exception class per named failure — with rule-name
context in every message, but in English and as a proper exception hierarchy.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for every error the engine raises intentionally."""


class MissingConfigError(EngineError):
    """A required config key (source/map/output name) is missing or blank.

    Reference: ``main.gs:160-165``.
    """

    def __init__(self, key: str) -> None:
        super().__init__(f'Missing sheet name for config key "{key}".')
        self.key = key


class MissingSheetError(EngineError):
    """Source or map table not found. Reference: ``main.gs:167-170``."""


class EmptyHeadersError(EngineError):
    """Source table has no header row. Reference: ``main.gs:55-56``."""

    def __init__(self) -> None:
        super().__init__("Source table has no headers.")


class NoOutputColumnsError(EngineError):
    """Mapping declares zero output columns. Reference: ``main.gs:62-63``."""

    def __init__(self) -> None:
        super().__init__("No valid output columns found in mapping.")


class UnbalancedDelimiterError(EngineError):
    """Unbalanced ``[``/``]`` in a rule instruction.

    Reference: ``main.gs:172-184`` (O(n) counter scan; extra ``]`` and
    unclosed ``[`` are distinct messages).
    """

    def __init__(self, rule: str, kind: str) -> None:
        if kind == "extra_close":
            msg = f'Extra closing delimiter "]" in rule "{rule}".'
        else:
            msg = f'Unclosed delimiter "[" in rule "{rule}".'
        super().__init__(msg)
        self.rule = rule
        self.kind = kind


class MissingColumnError(EngineError):
    """A ``src[...]`` reference names a column absent from the source.

    Reference: ``main.gs:212-219`` (parse-time check).
    """

    def __init__(self, column: str, rule: str) -> None:
        super().__init__(f'Column "{column}" does not exist in source (rule: "{rule}").')
        self.column = column
        self.rule = rule


class InvalidOperatorError(EngineError):
    """A condition contains a run of 3+ operator chars (``===``, ``>>``...).

    Reference: ``main.gs:266-271`` (regex ``[=><!]{3,}|[><]{2,}``).  The
    reference raises this lazily, per evaluated row; we raise it at compile
    time (the expression would fail on every row anyway).
    """

    def __init__(self, operator: str, rule: str) -> None:
        super().__init__(f'Invalid operator "{operator}" in "{rule}".')
        self.operator = operator
        self.rule = rule


class ExpressionSyntaxError(EngineError):
    """A DSL v2 expression is structurally malformed (unbalanced
    parentheses, or operand text butted against a group with no
    ``&&``/``||`` between them).

    v2-only: the v1 grammar has no parentheses
    (``docs/expression-language.md:170-176``), so this error cannot
    surface from a v1 mapping.  Unlike the silently-false condition
    discipline (``main.gs:282``), structural mistakes can never be a
    row-level data issue, so they fail loud at parse time like the
    delimiter and operator guards.
    """

    def __init__(self, detail: str, rule: str) -> None:
        super().__init__(f'Invalid expression in rule "{rule}": {detail}')
        self.rule = rule
        self.detail = detail


class FormulaSyntaxError(EngineError):
    """The compiled-formula subset could not parse a ``formula:`` body."""

    def __init__(self, detail: str, rule: str) -> None:
        super().__init__(f'Invalid formula in rule "{rule}": {detail}')
        self.rule = rule
        self.detail = detail


class UnknownSelfRefError(EngineError):
    """``self[X]`` references an output column not yet defined.

    In the reference an unknown ``self[...]`` is silently left verbatim
    (substitution only replaces known refs, ``main.gs:100-104``); for the
    compiled path we surface it eagerly because the emitted formula text
    could never evaluate.
    """

    def __init__(self, column: str, rule: str) -> None:
        super().__init__(
            f'self reference "{column}" in rule "{rule}" does not name an '
            "already-produced output column."
        )
        self.column = column
        self.rule = rule


class CircularSelfRefError(EngineError):
    """Output-column formulas reference each other in a cycle.

    A1 letters bind to output columns by declaration position and may
    point FORWARD (the reference's formula text is evaluated by the
    spreadsheet against the full output grid, so ``=D2`` works from
    column A); the compiled path resolves such forward references
    topologically.  A cycle (``A2`` referencing itself, or A->B->A) is
    what the spreadsheet reports as a circular-reference error — the
    compiled path fails loud with the rules involved.
    """

    def __init__(self, rules: list[str]) -> None:
        super().__init__(
            "circular A1/self reference between output columns: "
            + ", ".join(f'"{r}"' for r in rules)
        )
        self.rules = rules
